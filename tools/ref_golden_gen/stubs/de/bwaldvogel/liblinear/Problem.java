package de.bwaldvogel.liblinear;
public class Problem { public int l; public int n; public double[] y; public Feature[][] x; public double bias; }
