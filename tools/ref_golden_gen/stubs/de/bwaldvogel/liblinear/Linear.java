package de.bwaldvogel.liblinear;
public class Linear {
    public void disableDebugOutput() {}
    public void resetRandom() {}
    public Model train(Problem prob, Parameter param) { throw new RuntimeException("stub"); }
    public double predict(Model model, Feature[] x) { throw new RuntimeException("stub"); }
    public static void disableDebugOutputStatic() {}
}
