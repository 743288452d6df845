"""A/B: join_bloom_prefilter four-branch plan vs a single-pass rewrite.

The pre-r8 entry computed its five output columns from FOUR separate
aggregate branches (n_probe, n_cand, n_exact, n_exact_in_cand)
crossJoined at the end, plus an exact left-semi join — the probe leg
(distinct l_orderkey, then explode x K + md5) was planned once per
branch unless ReuseExchange happened to dedupe it. The rewrite folds
everything into ONE pass: probe positions left-join the broadcast bit
set, one groupBy(k) derives is_cand, one join against the build side
derives is_exact, and a single global aggregate emits all five columns.

Verdict (sf0.1, local[32], quiet box, 7 interleaved reps after a warm
rep each): four-branch median 3.895 s, single-pass median 1.546 s —
2.5x, with bit-identical collected rows and identical schema. The
single-pass shape was promoted to the live entry (relational.py:1869);
`four_branch` below preserves the legacy shape so the A/B stays
reproducible.

Protocol (SCALE.md): interleaved reps on a quiet box, warm rep
discarded, medians compared; the two variants' collected rows must be
IDENTICAL (same five values) or the rewrite is rejected outright.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from virapipe_spark import catalog
from virapipe_spark.queries.relational import (
    _BF_K,
    _BF_POS,
    join_bloom_prefilter,
    table,
)
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 7


def four_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r8 legacy shape: four aggregate branches + exact semi-join."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    build = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    probe = li.select(F.col("l_orderkey").alias("k")).distinct()
    js = F.explode(F.array(*[F.lit(j) for j in range(_BF_K)])).alias("j")

    def positions(df: DataFrame) -> DataFrame:
        return (
            df.select("k", js)
            .withColumn("h", F.md5(F.concat(F.col("j"), F.lit(":"), F.col("k"))))
            .withColumn("pos", F.expr(_BF_POS))
        )

    bits = positions(build).select("pos").distinct()
    cand = (
        positions(probe)
        .join(F.broadcast(bits), "pos")
        .groupBy("k")
        .agg(F.count("*").alias("nset"))
        .filter(F.col("nset") == _BF_K)
        .select("k")
    )
    exact = probe.join(build, "k", "left_semi")
    n_probe = probe.agg(F.count("*").alias("n_probe_keys"))
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    n_exact_in_cand = exact.join(cand, "k", "left_semi").agg(
        F.count("*").alias("n_exact_in_cand")
    )
    return (
        n_probe.crossJoin(n_cand)
        .crossJoin(n_exact)
        .crossJoin(n_exact_in_cand)
        .select(
            "n_probe_keys",
            "n_candidates",
            "n_exact",
            (F.col("n_candidates") - F.col("n_exact")).alias("n_false_pos"),
            (F.col("n_exact_in_cand") == F.col("n_exact")).alias(
                "no_false_negatives"
            ),
        )
    )


def run(fn, spark) -> float:
    t0 = time.monotonic()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    catalog.load_all()
    spark = session(app_name="ab_bloom", shuffle_partitions=32)

    old_rows = four_branch(spark, SF).collect()
    new_rows = join_bloom_prefilter(spark, SF).collect()
    old_vals = [tuple(r) for r in old_rows]
    new_vals = [tuple(r) for r in new_rows]
    print("old:", old_vals)
    print("new:", new_vals)
    if old_vals != new_vals:
        print("REJECT: values differ")
        sys.exit(1)
    old_schema = [(f.name, f.dataType.simpleString()) for f in
                  four_branch(spark, SF).schema.fields]
    new_schema = [(f.name, f.dataType.simpleString()) for f in
                  join_bloom_prefilter(spark, SF).schema.fields]
    print("schema old:", old_schema)
    print("schema new:", new_schema)
    if old_schema != new_schema:
        print("REJECT: schema differs")
        sys.exit(1)

    times = {"old": [], "new": []}
    run(four_branch, spark)  # warm
    run(join_bloom_prefilter, spark)  # warm
    for _ in range(REPS):
        times["old"].append(run(four_branch, spark))
        times["new"].append(run(join_bloom_prefilter, spark))
    for k, v in times.items():
        print(
            f"{k}: median {statistics.median(v):.3f}s "
            f"min {min(v):.3f} max {max(v):.3f} reps {[round(x,3) for x in v]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
