package com.carrotsearch.hppc;
import java.util.ArrayDeque;
public class IntArrayDeque {
    private final ArrayDeque<Integer> d = new ArrayDeque<>();
    public void addLast(int v) { d.addLast(v); }
    public void addFirst(int v) { d.addFirst(v); }
    public int removeFirst() { return d.removeFirst(); }
    public int removeLast() { return d.removeLast(); }
    public boolean isEmpty() { return d.isEmpty(); }
    public int size() { return d.size(); }
}
