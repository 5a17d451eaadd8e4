package com.carrotsearch.hppc;
import java.util.HashMap;
import java.util.LinkedHashMap;
import java.util.Map;
// Minimal functional stand-in: insertion-ordered; entries() is a
// generator-side helper for inverting the WEASEL dictionary (id -> long key).
public class LongIntHashMap {
    private final LinkedHashMap<Long, Integer> m = new LinkedHashMap<>();
    public LongIntHashMap() {}
    public LongIntHashMap(int size) {}
    public int putOrAdd(long key, int putValue, int incrementValue) {
        Integer cur = m.get(key);
        int v = (cur == null) ? putValue : cur + incrementValue;
        m.put(key, v);
        return v;
    }
    public int put(long key, int value) { Integer old = m.put(key, value); return old == null ? 0 : old; }
    public int get(long key) { Integer v = m.get(key); return v == null ? 0 : v; }
    public int indexOf(long key) { return m.containsKey(key) ? keyIndex(key) : -1; }
    public int indexGet(int index) {
        int i = 0;
        for (Integer v : m.values()) { if (i++ == index) return v; }
        throw new IllegalStateException();
    }
    private int keyIndex(long key) {
        int i = 0;
        for (Long k : m.keySet()) { if (k == key) return i; i++; }
        return -1;
    }
    public boolean isEmpty() { return m.isEmpty(); }
    public int size() { return m.size(); }
    public long[][] entries() {
        long[][] out = new long[m.size()][2];
        int i = 0;
        for (Map.Entry<Long, Integer> e : m.entrySet()) { out[i][0] = e.getKey(); out[i][1] = e.getValue(); i++; }
        return out;
    }
}
