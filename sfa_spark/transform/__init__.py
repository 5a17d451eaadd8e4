"""Numpy transform kernels (MFT / SFA / word packing) + their Spark wrappers.

These are the vectorized inner loops the engine runs inside Arrow-batched
pandas UDFs — no per-row Python anywhere (BASELINE.json input_hint).
"""
