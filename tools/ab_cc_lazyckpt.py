"""Interleaved A/B: connected_components_doubling's per-round lineage
truncation — eager localCheckpoint (a dedicated materialization job per
round) + convergence count() vs LAZY checkpoint where the count() is
the materializing action (one job per round instead of two).

Safety: the convergence check is a FULL action (count over every
partition), so the lazy checkpoint is fully materialized and lineage
fully truncated before the next round builds on it — unlike bfs_hops'
partial isEmpty() probe, which stays eager.

Fixture: the euler-check co-purchase graph (unclipped partkey domain,
the heaviest CC-doubling caller in GATE_TIMES). Equality asserted on
the full label table first.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__  # noqa: F401
from pyspark.sql import functions as F

from virapipe_spark.catalog import table
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def cc(edges, nodes, node_col, label_col, lazy, max_rounds=50):
    sym = edges.select("a", "b").union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    sym = sym.persist()
    labels = nodes.select(node_col, F.col(node_col).alias(label_col))
    changed = -1
    for rnd in range(max_rounds):
        neigh = (
            sym.join(labels, sym["a"] == labels[node_col])
            .groupBy(F.col("b").alias(node_col))
            .agg(F.min(label_col).alias("__nmin"))
        )
        stepped = labels.join(neigh, node_col, "left").select(
            node_col,
            F.least(label_col, F.coalesce("__nmin", label_col)).alias(label_col),
            F.col(label_col).alias("__old"),
        ).persist()
        ptr = stepped.select(
            F.col(node_col).alias("__p"), F.col(label_col).alias("__plabel")
        )
        new_labels = stepped.join(
            ptr, stepped[label_col] == ptr["__p"], "left"
        ).select(
            node_col,
            F.least(
                label_col, F.coalesce("__plabel", label_col)
            ).alias(label_col),
            "__old",
        )
        new_labels = truncate_lineage(
            new_labels, eager=not lazy, reliable=True
        )
        changed = (
            new_labels.filter(F.col(label_col) != F.col("__old")).count()
        )
        stepped.unpersist()
        labels = new_labels.select(node_col, label_col)
        if changed == 0:
            break
    sym.unpersist()
    assert changed == 0
    return labels


def euler_graph(spark):
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("x"), li.alias("y")
    und = (
        a.join(
            b,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") >= 2)
        .select("a", "b")
    )
    und = truncate_lineage(und, reliable=True)
    sym = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    nodes = sym.select(F.col("a").alias("n")).distinct()
    return und, nodes


def main():
    spark = session(app_name="ab_cc_lazyckpt")
    und, nodes = euler_graph(spark)
    und = und.persist()
    und.count()
    builds = {
        "eager": lambda: cc(und, nodes, "n", "cid", lazy=False),
        "lazy": lambda: cc(und, nodes, "n", "cid", lazy=True),
    }
    a = sorted(tuple(r) for r in builds["eager"]().collect())
    n = sorted(tuple(r) for r in builds["lazy"]().collect())
    assert a == n and a, "variants differ!"
    times = {k: [] for k in builds}
    for _ in range(7):
        for k, b in builds.items():
            t0 = time.perf_counter()
            b().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, xs in times.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"cc-doubling {k}: {xs} -> median {statistics.median(xs):.3f}")


if __name__ == "__main__":
    main()
