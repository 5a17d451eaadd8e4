// Compile-only stubs for the public liblinear-java API surface the
// reference's Classifier.java references. Never executed by the golden
// generator (only SFA transform paths run).
package de.bwaldvogel.liblinear;

class NotRun extends RuntimeException { NotRun() { super("liblinear stub"); } }
