"""Interleaved A/B: plain connected_components' lineage cadence.

A (old): lineage truncated every `checkpoint_every`=5 rounds; other
rounds persist() only. persist caches DATA but the LOGICAL tree still
compounds (each round references labels twice: neighbor min +
shortcut), so a loop converging before the cadence fires returns a
2^rounds-node plan — embed_dbscan_clusters measured 38,619 explain
lines against the 87-line catalog median, all Catalyst re-analysis.

B (new, r12): LAZY truncate EVERY round; the existing convergence
count materializes it in the same job (the CC-doubling fuse), so job
count per round is unchanged and every round's plan is flat — the
cadence the doubling variant adopted in r10.

Driven end-to-end through embed_dbscan_clusters' core-core component
stage shape: the euler co-purchase graph stands in as the fixture
(same loop, realistic size). Equality asserted on full labels first.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from virapipe_spark import catalog
from virapipe_spark.queries.relational import _order_pair_counts
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def cc(edges, nodes, node_col, label_col, every_round: bool,
       max_rounds=50, checkpoint_every=5):
    sym = edges.select("a", "b").union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    sym = sym.persist()
    labels = nodes.select(node_col, F.col(node_col).alias(label_col))
    changed = -1
    prev = None
    for rnd in range(max_rounds):
        neigh = (
            sym.join(labels, sym["a"] == labels[node_col])
            .groupBy(F.col("b").alias(node_col))
            .agg(F.min(label_col).alias("__nmin"))
        )
        new_labels = labels.join(neigh, node_col, "left").select(
            node_col,
            F.least(
                label_col, F.coalesce("__nmin", label_col)
            ).alias(label_col),
            F.col(label_col).alias("__old"),
        )
        if every_round or (
            checkpoint_every and (rnd + 1) % checkpoint_every == 0
        ):
            new_labels = truncate_lineage(
                new_labels, eager=False, reliable=True
            )
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.filter(F.col(label_col) != F.col("__old")).count()
        )
        if prev is not None:
            prev.unpersist()
        prev = new_labels
        labels = new_labels.select(node_col, label_col)
        if changed == 0:
            break
    sym.unpersist()
    assert changed == 0
    return labels


def build_graph(spark):
    li = catalog.table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    und = (
        _order_pair_counts(li)
        .filter(F.col("support") >= 2)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )
    und = truncate_lineage(und, reliable=True)
    nodes = (
        und.select(F.col("a").alias("n"))
        .union(und.select(F.col("b").alias("n")))
        .distinct()
    )
    return und, nodes


def main():
    catalog.load_all()
    spark = session(app_name="ab_cc_roundtruncate")
    und, nodes = build_graph(spark)
    und = und.persist()
    und.count()
    variants = {
        "old(cadence-5)": lambda: cc(und, nodes, "n", "cid", False),
        "new(every-round)": lambda: cc(und, nodes, "n", "cid", True),
    }
    a = sorted(tuple(r) for r in variants["old(cadence-5)"]().collect())
    b = sorted(tuple(r) for r in variants["new(every-round)"]().collect())
    assert a == b and a, "labels differ!"
    print(f"labels: {len(a)} (identical)")
    times = {k: [] for k in variants}
    for _ in range(5):
        for k, v in variants.items():
            t0 = time.perf_counter()
            v().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, xs in times.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"cc {k}: {xs} -> median {statistics.median(xs):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
