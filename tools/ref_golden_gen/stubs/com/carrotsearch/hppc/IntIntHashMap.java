package com.carrotsearch.hppc;
import com.carrotsearch.hppc.cursors.IntIntCursor;
import java.util.ArrayList;
import java.util.HashMap;
import java.util.Iterator;
import java.util.List;
import java.util.Map;
// Minimal functional stand-in: insertion-ordered, array-backed so the
// reference's `map.values[cursor.index] = 0` write-through works
// (WEASEL/MUSE.filterChiSquared) and dumps stay deterministic.
public class IntIntHashMap implements Iterable<IntIntCursor> {
    private final HashMap<Integer, Integer> slot = new HashMap<>();
    public int[] keys = new int[8];
    public int[] values = new int[8];
    private int count = 0;
    public IntIntHashMap() {}
    public IntIntHashMap(int size) {}
    private void grow() {
        if (count == keys.length) {
            int[] k = new int[count * 2], v = new int[count * 2];
            System.arraycopy(keys, 0, k, 0, count);
            System.arraycopy(values, 0, v, 0, count);
            keys = k; values = v;
        }
    }
    public int putOrAdd(int key, int putValue, int incrementValue) {
        Integer s = slot.get(key);
        if (s == null) {
            grow();
            slot.put(key, count);
            keys[count] = key; values[count] = putValue; count++;
            return putValue;
        }
        values[s] += incrementValue;
        return values[s];
    }
    public int put(int key, int value) {
        Integer s = slot.get(key);
        if (s == null) {
            grow();
            slot.put(key, count);
            keys[count] = key; values[count] = value; count++;
            return 0;
        }
        int old = values[s]; values[s] = value; return old;
    }
    public int get(int key) { Integer s = slot.get(key); return s == null ? 0 : values[s]; }
    public int indexOf(int key) { Integer s = slot.get(key); return s == null ? -1 : s; }
    public int indexGet(int index) { return values[index]; }
    public boolean isEmpty() { return count == 0; }
    public int size() { return count; }
    public int[][] entries() {
        int[][] out = new int[count][2];
        for (int i = 0; i < count; i++) { out[i][0] = keys[i]; out[i][1] = values[i]; }
        return out;
    }
    @Override
    public Iterator<IntIntCursor> iterator() {
        List<IntIntCursor> out = new ArrayList<>(count);
        for (int i = 0; i < count; i++) {
            IntIntCursor c = new IntIntCursor();
            c.index = i; c.key = keys[i]; c.value = values[i];
            out.add(c);
        }
        return out.iterator();
    }
}
