package com.carrotsearch.hppc;
import com.carrotsearch.hppc.cursors.IntCursor;
import java.util.ArrayList;
import java.util.HashMap;
import java.util.List;
// Minimal functional stand-in for the hppc API surface the reference uses.
public class ObjectIntHashMap<K> {
    private final HashMap<K, Integer> m = new HashMap<>();
    public int putOrAdd(K key, int putValue, int incrementValue) {
        Integer cur = m.get(key);
        int v = (cur == null) ? putValue : cur + incrementValue;
        m.put(key, v);
        return v;
    }
    public int get(K key) { Integer v = m.get(key); return v == null ? 0 : v; }
    public int put(K key, int value) { Integer old = m.put(key, value); return old == null ? 0 : old; }
    public int size() { return m.size(); }
    public Iterable<IntCursor> values() {
        List<IntCursor> out = new ArrayList<>();
        int i = 0;
        for (Integer v : m.values()) { IntCursor c = new IntCursor(); c.index = i++; c.value = v; out.add(c); }
        return out;
    }
}
