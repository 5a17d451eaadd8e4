package com.carrotsearch.hppc;
import java.util.Arrays;
public class DoubleArrayList {
    private double[] buf = new double[16];
    private int n = 0;
    public void add(double v) { if (n == buf.length) buf = Arrays.copyOf(buf, n * 2); buf[n++] = v; }
    public double[] toArray() { return Arrays.copyOf(buf, n); }
    public int size() { return n; }
}
