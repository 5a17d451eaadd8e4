"""Chunk encoding: rollup tiers → compressed blocks (binary columns).

The windowed-aggregate + Gorilla-encode stage the north rule names: after
the tier aggregation, each series' buckets are chunked and compressed into
(dod_blob, gorilla_blob) binary cells with per-block metrics. Runs inside
``applyInPandas`` per key — the encode kernels are pure numpy array ops
(sfa_spark.codecs), Arrow carries the binary out.

Scale notes: blocks are bounded (``max_block`` buckets) so a hot key's
blob can't blow past executor memory or the 2 GB bytearray cap; block
boundaries are deterministic (bucket order), so re-encoding a partition is
idempotent — the property resumability (tableio) relies on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from sfa_spark.codecs import dod_decode, dod_encode, gorilla_decode, gorilla_encode

BLOCK_SCHEMA = (
    "{key} long, block_id int, start_ts timestamp, n int, "
    "dod_blob binary, gorilla_blob binary, raw_bytes long, enc_bytes long"
)


def encode_tier_blocks(
    tier_df: DataFrame,
    key_col: str,
    value_col: str = "last",
    ts_col: str = "bucket_ts",
    max_block: int = 4096,
) -> DataFrame:
    """(key, bucket_ts, value) rows → one compressed block row per
    ``max_block`` buckets per key, with raw/encoded byte metrics."""

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        key = pdf[key_col].iloc[0]
        ts = pdf[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        rows = []
        for b, lo in enumerate(range(0, len(pdf), max_block)):
            t_chunk = ts[lo : lo + max_block]
            v_chunk = vals[lo : lo + max_block]
            dod = dod_encode(t_chunk)
            gor = gorilla_encode(v_chunk)
            rows.append(
                {
                    key_col: key,
                    "block_id": b,
                    "start_ts": pd.Timestamp(t_chunk[0], unit="us"),
                    "n": len(t_chunk),
                    "dod_blob": dod,
                    "gorilla_blob": gor,
                    "raw_bytes": 16 * len(t_chunk),
                    "enc_bytes": len(dod) + len(gor),
                }
            )
        return pd.DataFrame(rows)

    return tier_df.groupBy(key_col).applyInPandas(
        per_key, schema=BLOCK_SCHEMA.format(key=key_col)
    )


def decode_blocks(blocks_df: DataFrame, key_col: str) -> DataFrame:
    """Inverse of :func:`encode_tier_blocks` — the read path: blocks back
    to (key, bucket_ts, value) rows."""

    def per_batch(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                ts = dod_decode(bytes(row["dod_blob"]))
                vals = gorilla_decode(bytes(row["gorilla_blob"]))
                outs.append(
                    pd.DataFrame(
                        {
                            key_col: row[key_col],
                            "bucket_ts": pd.to_datetime(ts, unit="us"),
                            "value": vals,
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
                {key_col: [], "bucket_ts": [], "value": []}
            )

    return blocks_df.mapInPandas(
        per_batch, schema=f"{key_col} long, bucket_ts timestamp, value double"
    )
