package com.carrotsearch.hppc;
import com.carrotsearch.hppc.cursors.IntCursor;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.Iterator;
import java.util.List;
public class IntArrayList implements Iterable<IntCursor> {
    private int[] buf = new int[16];
    private int n = 0;
    public void add(int v) { if (n == buf.length) buf = Arrays.copyOf(buf, n * 2); buf[n++] = v; }
    public int get(int i) { return buf[i]; }
    public int size() { return n; }
    public int[] toArray() { return Arrays.copyOf(buf, n); }
    public Iterator<IntCursor> iterator() {
        List<IntCursor> out = new ArrayList<>();
        for (int i = 0; i < n; i++) { IntCursor c = new IntCursor(); c.index = i; c.value = buf[i]; out.add(c); }
        return out.iterator();
    }
}
