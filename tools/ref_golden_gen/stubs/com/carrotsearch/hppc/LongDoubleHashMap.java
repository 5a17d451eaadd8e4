package com.carrotsearch.hppc;
import com.carrotsearch.hppc.cursors.LongDoubleCursor;
import java.util.ArrayList;
import java.util.Iterator;
import java.util.LinkedHashMap;
import java.util.List;
import java.util.Map;
// Minimal functional stand-in (MUSE.filterChiSquared classProb).
public class LongDoubleHashMap implements Iterable<LongDoubleCursor> {
    private final LinkedHashMap<Long, Double> m = new LinkedHashMap<>();
    public LongDoubleHashMap() {}
    public LongDoubleHashMap(int size) {}
    public double putOrAdd(long key, double putValue, double incrementValue) {
        Double cur = m.get(key);
        double v = (cur == null) ? putValue : cur + incrementValue;
        m.put(key, v);
        return v;
    }
    public double get(long key) { Double v = m.get(key); return v == null ? 0d : v; }
    public int size() { return m.size(); }
    @Override
    public Iterator<LongDoubleCursor> iterator() {
        List<LongDoubleCursor> out = new ArrayList<>(m.size());
        int i = 0;
        for (Map.Entry<Long, Double> e : m.entrySet()) {
            LongDoubleCursor c = new LongDoubleCursor();
            c.index = i++; c.key = e.getKey(); c.value = e.getValue();
            out.add(c);
        }
        return out.iterator();
    }
}
