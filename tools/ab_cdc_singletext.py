"""A/B: docs_cdc_chunk_dedup window-over-boundary-rows plan vs the
single-text-crossing rewrite.

The pre-r9 entry derived chunk spans with
``lead(g) OVER (PARTITION BY doc_id ORDER BY g)`` over boundary ROWS,
each row carrying the FULL document text — ~1 copy per 16 bytes of
text, i.e. O(len^2/16) shuffle bytes per document into the window
exchange (r8 VERDICT watch item: fine at sf0.1, a skew/volume trap for
long documents at 100 TB). The rewrite aggregates boundary offsets per
doc first (the shuffle carries only (doc_id, g) pairs, partial-
aggregated map-side into offset arrays), joins the text back ONCE per
doc, and derives each chunk's (md5, len) inside a transform lambda so
the generator output never carries text.

Protocol (SCALE.md): interleaved reps on a quiet box, warm rep
discarded, medians compared; the two variants' collected rows AND
schemas must be identical or the rewrite is rejected outright.

Verdict (sf0.1, local[32], quiet box, 7 interleaved reps after a warm
rep each): window-shape median 2.483 s, single-text median 2.641 s —
a 1.06x wall cost at this SF, accepted because the structural win is
the shuffle payload: total shuffle write 5.05 MiB -> 2.07 MiB (2.4x,
measured via the UI REST stage metrics on an instrumented run), and
that ratio is the compressed floor — at ~760 B/doc lz4 hides most of
the repetition, while the text-copy count the old plan shuffles grows
as len/16 per doc and the new plan's stays <= 1 (0 here: AQE
broadcasts the offset table, BroadcastHashJoin BuildRight, so the
text leg never exchanges at all). Rows and schema bit-identical;
promoted to the live entry (extensions.py, docs_cdc_chunk_dedup).
``window_shape`` below preserves the legacy plan so the A/B stays
reproducible.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from virapipe_spark import catalog
from virapipe_spark.queries.extensions import docs_cdc_chunk_dedup, table
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 7


def window_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r9 legacy shape: lead() over boundary rows, text on
    every row of the window exchange."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    pos = d.filter(F.length("text") >= 8).select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(2), F.length("text") - 7)).alias("g"),
    )
    bnd = pos.filter(
        F.substring(F.md5(F.expr("substr(text, g, 8)")), 1, 1) == "0"
    ).unionByName(
        d.filter(F.length("text") >= 1).select(
            "doc_id", "text", F.lit(1).alias("g")
        )
    )
    wd = W.partitionBy("doc_id").orderBy("g")
    chunk = bnd.select(
        "doc_id",
        "text",
        F.col("g").alias("s"),
        F.coalesce(F.lead("g").over(wd) - 1, F.length("text")).alias("e"),
    )
    h = chunk.select(
        F.md5(F.expr("substr(text, s, e - s + 1)")).alias("ch"),
        (F.col("e") - F.col("s") + 1).alias("clen"),
    )
    h = truncate_lineage(h, eager=False)
    t = h.agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("clen").cast("long").alias("bytes_total"),
    )
    u = (
        h.groupBy("ch")
        .agg(F.min("clen").alias("clen"))
        .agg(
            F.count("*").cast("long").alias("n_distinct"),
            F.sum("clen").cast("long").alias("bytes_unique"),
        )
    )
    return t.crossJoin(F.broadcast(u)).select(
        "n_chunks",
        "n_distinct",
        "bytes_total",
        "bytes_unique",
        F.expr("(n_chunks - n_distinct) * 1000000 div n_chunks")
        .cast("long")
        .alias("dup_chunk_ppm"),
        F.expr("(bytes_total - bytes_unique) * 1000000 div bytes_total")
        .cast("long")
        .alias("saved_bytes_ppm"),
    )


def run(fn, spark) -> float:
    t0 = time.monotonic()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    catalog.load_all()
    spark = session(app_name="ab_cdc", shuffle_partitions=32)

    old_rows = window_shape(spark, SF).collect()
    new_rows = docs_cdc_chunk_dedup(spark, SF).collect()
    old_vals = [tuple(r) for r in old_rows]
    new_vals = [tuple(r) for r in new_rows]
    print("old:", old_vals)
    print("new:", new_vals)
    if old_vals != new_vals:
        print("REJECT: values differ")
        sys.exit(1)
    old_schema = [(f.name, f.dataType.simpleString()) for f in
                  window_shape(spark, SF).schema.fields]
    new_schema = [(f.name, f.dataType.simpleString()) for f in
                  docs_cdc_chunk_dedup(spark, SF).schema.fields]
    print("schema old:", old_schema)
    print("schema new:", new_schema)
    if old_schema != new_schema:
        print("REJECT: schema differs")
        sys.exit(1)

    times = {"old": [], "new": []}
    run(window_shape, spark)  # warm
    run(docs_cdc_chunk_dedup, spark)  # warm
    for _ in range(REPS):
        times["old"].append(run(window_shape, spark))
        times["new"].append(run(docs_cdc_chunk_dedup, spark))
    for k, v in times.items():
        print(
            f"{k}: median {statistics.median(v):.3f}s "
            f"min {min(v):.3f} max {max(v):.3f} reps {[round(x,3) for x in v]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
