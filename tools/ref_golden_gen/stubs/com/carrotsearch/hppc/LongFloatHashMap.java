package com.carrotsearch.hppc;
import com.carrotsearch.hppc.cursors.LongFloatCursor;
import java.util.ArrayList;
import java.util.Iterator;
import java.util.LinkedHashMap;
import java.util.List;
import java.util.Map;
// Minimal functional stand-in (WEASEL.filterChiSquared classProb).
public class LongFloatHashMap implements Iterable<LongFloatCursor> {
    private final LinkedHashMap<Long, Float> m = new LinkedHashMap<>();
    public LongFloatHashMap() {}
    public LongFloatHashMap(int size) {}
    public float putOrAdd(long key, float putValue, float incrementValue) {
        Float cur = m.get(key);
        float v = (cur == null) ? putValue : cur + incrementValue;
        m.put(key, v);
        return v;
    }
    public float get(long key) { Float v = m.get(key); return v == null ? 0f : v; }
    public int size() { return m.size(); }
    @Override
    public Iterator<LongFloatCursor> iterator() {
        List<LongFloatCursor> out = new ArrayList<>(m.size());
        int i = 0;
        for (Map.Entry<Long, Float> e : m.entrySet()) {
            LongFloatCursor c = new LongFloatCursor();
            c.index = i++; c.key = e.getKey(); c.value = e.getValue();
            out.add(c);
        }
        return out.iterator();
    }
}
