"""Deterministic Common-Crawl-style page-table generator (FIXTURES.md F1).

Synthesizes the engine's authoritative input shape from BASELINE.json
``input_hint``: ``(url string, warc_ts timestamp, html binary, text string,
lang string)`` — several crawls per url over a multi-day span, irregular
spacing with gaps (exercises LOCF), Zipf-skewed url popularity with a few
heavy-hitter urls holding ~30% of rows (exercises salting), and html from
which the text is *deterministically* extractable so the byte-identical
text-per-url invariant is assertable.

Everything is generated executor-side inside ``mapInPandas`` with
generators seeded by ``(seed, url_id)`` — no driver loops, deterministic
under any partitioning, parameterized by scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_VOCAB = np.array(
    "the of and to in is was for on that with as by at from this it an be "
    "are or has had have not were which their its said also more can one "
    "time data web page site news about world year people over under new "
    "work life line part form place case point group number area use way".split()
)
_LANGS = np.array(["en", "de", "fr", "es", "it"])

BASE_TS = np.datetime64("2024-03-01T00:00:00", "us")


def make_html(url: str, text: str) -> bytes:
    """The generator's page template. The extractor must invert it exactly."""
    return (
        f"<html><head><title>{url}</title>"
        f'<meta charset="utf-8"></head>'
        f"<body><nav>home | about</nav><article>{text}</article>"
        f"<footer>crawled</footer></body></html>"
    ).encode("utf-8")


def _gen_url_rows(url_id: int, seed: int, mean_crawls: int, span_days: float) -> pd.DataFrame:
    rng = np.random.default_rng((seed, url_id))
    # Zipf-ish popularity: url 0..9 are heavy hitters with many more crawls
    if url_id < 10:
        n_crawls = int(mean_crawls * 15 + rng.integers(0, mean_crawls * 5))
    else:
        n_crawls = max(2, int(rng.poisson(mean_crawls)))
    domain = f"d{url_id % 97}.example.com"
    url = f"https://{domain}/page/{url_id}"

    # irregular crawl times with gaps: exponential inter-arrival + occasional
    # long gap (x20) so LOCF has real work to do
    gaps_s = rng.exponential(span_days * 86400 / max(n_crawls, 1), size=n_crawls)
    gaps_s *= np.where(rng.random(n_crawls) < 0.05, 20.0, 1.0)
    ts = BASE_TS + np.cumsum(gaps_s * 1e6).astype("timedelta64[us]")

    # text length drifts as a seeded random walk per url
    lens = np.maximum(
        5, (120 + np.cumsum(rng.standard_normal(n_crawls) * 15)).astype(np.int64)
    )
    base_lang = _LANGS[rng.integers(0, len(_LANGS))]
    flip = rng.random(n_crawls) < 0.1  # occasional language flips
    langs = np.where(flip, _LANGS[rng.integers(0, len(_LANGS), n_crawls)], base_lang)

    texts = [
        " ".join(_VOCAB[rng.integers(0, len(_VOCAB), int(k))]) for k in lens
    ]
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": ts,
            "html": [make_html(url, t) for t in texts],
            "text": texts,
            "lang": langs,
        }
    )


def generate_pages(
    spark: SparkSession,
    n_urls: int = 200,
    mean_crawls: int = 10,
    span_days: float = 14.0,
    seed: int = 42,
) -> DataFrame:
    """The F1 page table as a DataFrame (executor-side synthesis)."""

    def gen(batches):
        for pdf in batches:
            parts = [
                _gen_url_rows(int(u), seed, mean_crawls, span_days)
                for u in pdf["url_id"]
            ]
            yield pd.concat(parts, ignore_index=True)

    ids = spark.range(n_urls).withColumnRenamed("id", "url_id")
    ids = ids.repartition(min(n_urls, spark.sparkContext.defaultParallelism))
    return ids.mapInPandas(
        gen,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )


def generate_pages_pandas(
    n_urls: int = 200, mean_crawls: int = 10, span_days: float = 14.0, seed: int = 42
) -> pd.DataFrame:
    """Same table built driver-side — the oracle for determinism tests."""
    return pd.concat(
        [_gen_url_rows(u, seed, mean_crawls, span_days) for u in range(n_urls)],
        ignore_index=True,
    )
