"""Measure the GLOBAL-window INPUT row counts for the global-order
exemption entries at two scales (round-11 verdict item 3).

The global-window sweep (tests/test_scale_plans.py) exempts 38 entries
whose unpartitioned window is argued bounded; the four 'global-order'
members are the most data-adjacent. This tool counts the ACTUAL frame
each entry's global window consumes — reconstructed from the entry's
own building blocks — at a base directory and at an N-fold synthetic
(tools/make_scale_synth.py), so the bounded-input claim is measured,
not argued. An input that scales with the data flunks the category and
gets the scale.two_phase_rank treatment.

Usage:
    python tools/measure_window_inputs.py [base_dir] [synth_dir] [name ...]
    # defaults: /root/testdata/sf0.1 /tmp/sf1.0-synth, all measures
    # dim-reading measures (abc/skyline/matching) want the
    # --scale-dims synth (/tmp/sf1.0-synthdims) as synth_dir

Prints one line per (entry, scale): entry, scale label, window-input
rows — then a summary ratio table.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from virapipe_spark.catalog import table  # noqa: E402
from virapipe_spark.session import session  # noqa: E402


def rrf_window_input(spark, sf_dir: str) -> int:
    """docs_rank_fusion_rrf: both global rank windows run over `scored`
    (docs containing one of the 3 query terms)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    n_docs = d.select(F.countDistinct("doc_id").alias("n"))
    df = toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    qterms = (
        df.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * 2 < F.col("n"))
        .orderBy(F.col("df").desc(), "term")
        .limit(3)
        .select("term", "df")
    )
    return (
        toks.join(F.broadcast(qterms), "term")
        .select("doc_id")
        .distinct()
        .count()
    )


def trigram_window_input(spark, sf_dir: str) -> int:
    """events_path_trigrams: the rank window runs over the distinct
    (e1, e2, e3) count table — claimed |event_types|^3-bounded."""
    from virapipe_spark.queries.streaming import _GAP_US
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    ordered = (
        ev.select("user_id", "event_type", us.alias("us"), "event_id")
        .withColumn("prev_us", F.lag("us").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("us") - F.col("prev_us") > _GAP_US),
                1,
            ).otherwise(0),
        )
    )
    sess = ordered.withColumn(
        "sid",
        F.sum("new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    w2 = W.partitionBy("user_id", "sid").orderBy("us", "event_id")
    tri = sess.select(
        F.lag("event_type", 2).over(w2).alias("e1"),
        F.lag("event_type", 1).over(w2).alias("e2"),
        F.col("event_type").alias("e3"),
    ).filter(F.col("e1").isNotNull())
    return tri.groupBy("e1", "e2", "e3").count().count()


def linkpred_window_input(spark, sf_dir: str) -> int:
    """graph_link_prediction: the rank window runs AFTER
    orderBy().limit(50) — k-row by construction; measured anyway."""
    from virapipe_spark.queries.relational import graph_link_prediction

    return graph_link_prediction(spark, sf_dir).count()


def matching_window_input(spark, sf_dir: str) -> int:
    """supplier_stable_matching: the two global row_number windows run
    over the supplier and part dims; the larger (supplier) is the
    honest input. NOTE: make_scale_synth copies dims verbatim, so the
    synth point is flat BY LAYOUT — but TPC-H scales supplier with SF
    (10k x SF rows), so the input is SF-linear in a real deployment."""
    return table(spark, sf_dir, "supplier").count()


def peak_concurrency_window_input(spark, sf_dir: str) -> int:
    """events_peak_concurrency: the (pre-r11) global cumsum ran over
    the distinct session boundary positions — 2 rows per session, i.e.
    it GROWS WITH DATA, not a value domain."""
    from virapipe_spark.queries.streaming import _GAP_US
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.expr("unix_micros(ts)")
    gap = t - F.lag(t).over(wu)
    marked = ev.select(
        "user_id",
        t.alias("t"),
        F.when(gap.isNull() | (gap > _GAP_US), 1).otherwise(0).alias("new_s"),
    )
    sess = marked.select(
        "user_id",
        F.sum("new_s")
        .over(
            W.partitionBy("user_id")
            .orderBy("t")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("sid"),
        "t",
    )
    iv = sess.groupBy("user_id", "sid").agg(
        F.min("t").alias("s"), F.max("t").alias("e")
    )
    return (
        iv.select(F.col("s").alias("pos"))
        .unionByName(iv.select((F.col("e") + 1).alias("pos")))
        .distinct()
        .count()
    )


def abc_window_input(spark, sf_dir: str) -> int:
    """lineitem_abc_analysis: the (pre-r11) running-total window ran
    over the per-partkey revenue table — part is SF-linear in TPC-H
    (measure against the --scale-dims synth for the honest point)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_partkey").distinct().count()


def skyline_window_input(spark, sf_dir: str) -> int:
    """parts_pareto_skyline: the (pre-r11) RANGE window ran over ALL
    parts (SF-linear); the r11 plan's prefix-max runs over DISTINCT
    price cents (the value domain). Returns parts count — the distinct
    price count is printed separately by main()."""
    return table(spark, sf_dir, "part").count()


def skyline_distinct_prices(spark, sf_dir: str) -> int:
    return (
        table(spark, sf_dir, "part")
        .select(F.round(F.col("p_retailprice") * 100).cast("long"))
        .distinct()
        .count()
    )


MEASURES = {
    "docs_rank_fusion_rrf": rrf_window_input,
    "events_path_trigrams": trigram_window_input,
    "graph_link_prediction": linkpred_window_input,
    "supplier_stable_matching": matching_window_input,
    "events_peak_concurrency": peak_concurrency_window_input,
    "lineitem_abc_analysis": abc_window_input,
    "parts_pareto_skyline": skyline_window_input,
    "parts_pareto_skyline(distinct prices — the r11 plan)": skyline_distinct_prices,
}


def main() -> None:
    args = sys.argv[1:]
    base = args[0] if args else "/root/testdata/sf0.1"
    synth = args[1] if len(args) > 1 else "/tmp/sf1.0-synth"
    only = set(args[2:])
    spark = session(app_name="window_input_audit")
    rows = []
    for name, fn in MEASURES.items():
        if only and not any(name.startswith(o) for o in only):
            continue
        a = fn(spark, base)
        b = fn(spark, synth)
        rows.append((name, a, b))
        print(f"{name}: base={a} synth={b} ratio={b / max(a, 1):.2f}")
    print()
    print("| entry | window input @sf0.1 | @10x synth | ratio |")
    print("|---|---|---|---|")
    for name, a, b in rows:
        print(f"| {name} | {a} | {b} | {b / max(a, 1):.2f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
