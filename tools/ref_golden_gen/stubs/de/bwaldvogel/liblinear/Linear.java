package de.bwaldvogel.liblinear;
// Compile-only shim of the PUBLIC liblinear-java API surface the
// reference references. Static (the real API) — instance calls like
// `myLinear.get().train(...)` still compile against static members.
public class Linear {
    public static void disableDebugOutput() {}
    public static void resetRandom() {}
    public static Model train(Problem prob, Parameter param) { throw new RuntimeException("stub"); }
    public static double predict(Model model, Feature[] x) { throw new RuntimeException("stub"); }
}
