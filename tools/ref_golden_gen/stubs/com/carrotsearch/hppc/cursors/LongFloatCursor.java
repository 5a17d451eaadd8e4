package com.carrotsearch.hppc.cursors;
public final class LongFloatCursor { public int index; public long key; public float value; }
