package com.carrotsearch.hppc;
import com.carrotsearch.hppc.cursors.IntCursor;
import java.util.ArrayList;
import java.util.HashMap;
import java.util.List;
// Minimal functional stand-in for the hppc API surface the reference uses.
// Insertion-ordered + slot-indexed so Dictionary.getWord's
// indexOf/indexGet path works and the generator can invert id -> key.
public class ObjectIntHashMap<K> {
    private final ArrayList<K> keyList = new ArrayList<>();
    private final ArrayList<Integer> valList = new ArrayList<>();
    private final HashMap<K, Integer> slot = new HashMap<>();
    public int putOrAdd(K key, int putValue, int incrementValue) {
        Integer s = slot.get(key);
        if (s == null) {
            slot.put(key, keyList.size());
            keyList.add(key); valList.add(putValue);
            return putValue;
        }
        valList.set(s, valList.get(s) + incrementValue);
        return valList.get(s);
    }
    public int get(K key) { Integer s = slot.get(key); return s == null ? 0 : valList.get(s); }
    public int put(K key, int value) {
        Integer s = slot.get(key);
        if (s == null) {
            slot.put(key, keyList.size());
            keyList.add(key); valList.add(value);
            return 0;
        }
        int old = valList.get(s); valList.set(s, value); return old;
    }
    public int indexOf(K key) { Integer s = slot.get(key); return s == null ? -1 : s; }
    public int indexGet(int index) { return valList.get(index); }
    public int size() { return keyList.size(); }
    public K keyAt(int index) { return keyList.get(index); }
    public Iterable<IntCursor> values() {
        List<IntCursor> out = new ArrayList<>();
        for (int i = 0; i < valList.size(); i++) {
            IntCursor c = new IntCursor(); c.index = i; c.value = valList.get(i); out.add(c);
        }
        return out;
    }
}
