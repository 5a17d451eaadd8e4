package de.bwaldvogel.liblinear;
import java.io.Serializable;
public class Model implements Serializable {}
