"""sfa_spark — a PySpark-native time-series rollup + downsample + retention
engine.

Brand-new engine (not a port) whose transform semantics reproduce the
reference SFA/MFT library (kevingmq/SFA, see SURVEY.md): sliding-window DFT
via the Momentary Fourier Transform recurrence, MCB equi-depth symbolic
binning, bag-of-patterns aggregation — re-expressed Spark-first over long
(key, ts, value) tables, plus the rollup/gap-fill/compression layer the
north star requires (1m/1h/1d continuous-aggregate tiers, LOCF gap-fill,
Gorilla XOR + delta-of-delta codecs inside vectorized Arrow UDFs).

Layout:
  session     — SparkSession factory (AQE, Arrow, shuffle sizing)
  generator   — deterministic Common-Crawl-style page-table generator
  extract     — html→text extraction + derived signals (text_len, lang_stability)
  rollup      — tiered continuous aggregates + LOCF gap-fill + retention
  codecs      — Gorilla XOR / delta-of-delta bitstream codecs (numpy)
  tableio     — snapshot + lineage-manifest table layer over parquet
  transform/  — MFT, SFA (MCB binning + quantization), word packing
  operators/  — bag-of-patterns/tf-idf, dedup, similarity search, text stats
"""

__version__ = "0.1.0"
