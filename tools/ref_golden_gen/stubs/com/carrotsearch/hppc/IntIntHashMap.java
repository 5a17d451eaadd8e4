package com.carrotsearch.hppc;
import java.util.LinkedHashMap;
import java.util.Map;
// Minimal functional stand-in: insertion-ordered so dumps are deterministic.
public class IntIntHashMap {
    private final LinkedHashMap<Integer, Integer> m = new LinkedHashMap<>();
    public IntIntHashMap() {}
    public IntIntHashMap(int size) {}
    public int putOrAdd(int key, int putValue, int incrementValue) {
        Integer cur = m.get(key);
        int v = (cur == null) ? putValue : cur + incrementValue;
        m.put(key, v);
        return v;
    }
    public int get(int key) { Integer v = m.get(key); return v == null ? 0 : v; }
    public int size() { return m.size(); }
    public int[][] entries() {
        int[][] out = new int[m.size()][2];
        int i = 0;
        for (Map.Entry<Integer, Integer> e : m.entrySet()) {
            out[i][0] = e.getKey(); out[i][1] = e.getValue(); i++;
        }
        return out;
    }
}
