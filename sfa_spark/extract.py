"""html→text extraction + derived per-crawl signals (SURVEY.md §7.1 stage 2).

``extract_text`` is a deterministic, byte-exact extractor over the
``html: binary`` column, implemented as a vectorized pandas UDF (Arrow
batches; no per-row Python at the Spark layer — the per-string work runs
in pandas' C string engine where possible). The north-star invariant —
byte-identical extracted text per url vs the generator's ground-truth
``text`` column — is asserted in tests and exposed via
:func:`verify_extraction`.

Derived signals (the reference has none of these; they're the engine's
Common-Crawl payload per BASELINE.json):
  text_len        — length of the extracted text in characters
  lang_stability  — 1.0 if this crawl's lang equals the url's previous
                    crawl's lang (first crawl counts stable), else 0.0;
                    a ``lag`` window over (url, warc_ts)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

_OPEN, _CLOSE = "<article>", "</article>"


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Extract the article body from page bytes, deterministically.

    Grammar: the first ``<article>…</article>`` span, decoded utf-8.
    Pages without an article tag yield '' (never null — '' is a real,
    hashable value downstream).
    """
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    start = s.str.find(_OPEN)
    stop = s.str.find(_CLOSE)
    out = []
    for text, a, b in zip(s, start, stop):
        if a >= 0 and b > a:
            out.append(text[a + len(_OPEN) : b])
        else:
            out.append("")
    return pd.Series(out)


def extract_text_expr(html_col: str):
    """JVM-side extraction expression — same grammar as
    :func:`extract_text` (first ``<article>…</article>`` span, utf-8,
    '' when absent) but built from ``decode``/``instr``/``substring`` so
    the hot path never leaves whole-stage codegen (no python workers, no
    Arrow transfer). Byte-equivalence with the pandas UDF is asserted in
    tests (valid utf-8; both replace malformed sequences)."""
    txt = F.decode(F.col(html_col), "UTF-8")
    a = F.instr(txt, _OPEN)  # 1-based, 0 when absent
    b = F.instr(txt, _CLOSE)
    n = len(_OPEN)
    return F.when(
        (a > 0) & (b > a), F.substring(txt, a + n, b - a - n)
    ).otherwise(F.lit(""))


def with_signals(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, lang, …) → + extracted_text, text_len,
    lang_stability. One shuffle (window by url) shared with everything
    downstream that groups by url."""
    w = W.partitionBy("url").orderBy("warc_ts")
    return (
        pages.withColumn("extracted_text", extract_text_expr("html"))
        .withColumn("text_len", F.length("extracted_text").cast("double"))
        .withColumn("prev_lang", F.lag("lang").over(w))
        .withColumn(
            "lang_stability",
            F.when(F.col("prev_lang").isNull(), F.lit(1.0))
            .when(F.col("prev_lang") == F.col("lang"), F.lit(1.0))
            .otherwise(F.lit(0.0)),
        )
        .drop("prev_lang")
    )


def verify_extraction(pages: DataFrame) -> int:
    """Count rows where the extracted text is NOT byte-identical to the
    ground-truth ``text`` column — checks BOTH extraction paths (the
    JVM expression the pipeline runs and the pandas-UDF reference).
    Must be 0 (north-star invariant)."""
    return (
        pages.withColumn("_e_expr", extract_text_expr("html"))
        .withColumn("_e_udf", extract_text("html"))
        .filter(
            (F.encode("_e_expr", "utf-8") != F.encode("text", "utf-8"))
            | (F.encode("_e_udf", "utf-8") != F.encode("text", "utf-8"))
        )
        .count()
    )
