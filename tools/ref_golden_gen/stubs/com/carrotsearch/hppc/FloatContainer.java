package com.carrotsearch.hppc;
import com.carrotsearch.hppc.cursors.FloatCursor;
import java.util.Iterator;
public interface FloatContainer extends Iterable<FloatCursor> {
    Iterator<FloatCursor> iterator();
    int size();
}
