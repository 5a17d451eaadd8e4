package de.bwaldvogel.liblinear;
import java.io.Serializable;
public class Model implements Serializable {
    public int getNrFeature() { return 0; }
    public int getNrClass() { return 0; }
    public double[] getFeatureWeights() { return new double[0]; }
    public int[] getLabels() { return new int[0]; }
}
