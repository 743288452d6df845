"""Multimodal catalog entries (rows-only: binary payload transforms are
not expressible in DuckDB SQL; golden-tested in tests/test_multimodal.py).

Synthetic media is derived deterministically from ``documents`` (text
bytes as payload), so the entries run at any scale factor without extra
fixture tables.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from virapipe_spark.catalog import query, table


def _synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> fake video containers (VPMM, multimodal.pack_media):
    payload = utf-8 text bytes, duration scaled from n_chars."""
    from virapipe_spark import multimodal as mm

    d = table(spark, sf_dir, "documents")

    # Arrow-batched (pandas_udf), never a row UDF: the payload packer is
    # the only Python in this path and it crosses the boundary once per
    # batch (asserted in tests/test_scale_plans.py — no BatchEvalPython).
    @F.pandas_udf("binary")
    def pack(text: pd.Series, n_chars: pd.Series) -> pd.Series:
        return pd.Series(
            [
                mm.pack_media(
                    "v", t.encode(), width=64, height=48, duration_ms=int(n) * 10
                )
                for t, n in zip(text, n_chars)
            ]
        )

    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        pack("text", "n_chars").alias("data"),
        F.lit(64).alias("width"),
        F.lit(48).alias("height"),
        F.lit(0).alias("sample_rate"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )


@query("multimodal_frame_sample")  # rows-only check
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling + per-media rollup: sample a frame per
    second of fake video, then aggregate (explode is immediately
    re-aggregated — the §4.3 rule). Exercises the full multimodal
    path: binary column -> metadata filter -> mapInPandas decode ->
    explode -> aggregate."""
    from virapipe_spark import multimodal as mm

    media = _synthetic_media(spark, sf_dir)
    frames = mm.sample_frames(media, every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.countDistinct("frame_hash").alias("n_distinct_frames"),
    )
