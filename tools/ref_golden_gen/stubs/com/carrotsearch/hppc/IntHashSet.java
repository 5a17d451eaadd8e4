package com.carrotsearch.hppc;
import java.util.HashSet;
// Minimal functional stand-in (WEASEL/MUSE chi-squared survivor set).
public class IntHashSet {
    private final HashSet<Integer> s = new HashSet<>();
    public IntHashSet() {}
    public IntHashSet(int size) {}
    public boolean add(int v) { return s.add(v); }
    public boolean contains(int v) { return s.contains(v); }
    public int size() { return s.size(); }
}
