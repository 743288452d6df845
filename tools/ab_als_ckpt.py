"""Interleaved A/B: embed_als_factorize's share points — r12 persist()
vs r13 lazy localCheckpoint (extensions._als_share).

A (old, r12): vf.persist() + uf1.persist() — execution reuse via the
cache, but the LOGICAL plan re-embeds the full init/solve subtree per
consumer (1,445 printed lines; Catalyst re-analyzes each copy).

B (new, r13): _als_share = truncate_lineage(eager=False) — same
execution reuse (first action materializes the RDD once), plan
truncated to a LogicalRDD leaf at the share point (VERDICT_r12 #7:
"plan under the catalog budget", §3.3 plan truncation).

Equality asserted on the full output first; plan line counts printed
for both variants; interleaved same-session reps, median decides
(neutral-or-better is the bar — the win is plan/analysis cost).

RESULT (r13, this tool, sf0.01): NEGATIVE — persist median 7.732 s vs
lazy-ckpt 9.017 s (pairwise ~1 s slower every rep), plan lines only
1,444 -> 1,193 (the objective subtrees dominate, not the share
points). The committed _als_share stays persist(); this tool is the
negative-result record.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from virapipe_spark import catalog
from virapipe_spark.queries import extensions as ext
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_COMMITTED_SHARE = ext._als_share  # persist() since the r13 negative


def run_entry(spark, ckpt: bool):
    ext._als_share = (
        (lambda df: truncate_lineage(df, eager=False))
        if ckpt
        else (lambda df: df.persist())
    )
    try:
        return catalog.QUERIES["embed_als_factorize"](spark, SF)
    finally:
        ext._als_share = _COMMITTED_SHARE


def plan_lines(df) -> int:
    return len(
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        ).splitlines()
    )


def main():
    catalog.load_all()
    spark = session(app_name="ab_als_ckpt")
    variants = {
        "old(persist)": lambda: run_entry(spark, ckpt=False),
        "new(lazy-ckpt)": lambda: run_entry(spark, ckpt=True),
    }
    a = sorted(tuple(r) for r in variants["old(persist)"]().collect())
    b = sorted(tuple(r) for r in variants["new(lazy-ckpt)"]().collect())
    assert a == b and a, "outputs differ!"
    print(f"output rows: {len(a)} (identical)")
    for k, v in variants.items():
        print(f"plan lines {k}: {plan_lines(v())}")
    times = {k: [] for k in variants}
    for rep in range(7):
        for k, v in variants.items():
            t0 = time.perf_counter()
            v().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[k].append(dt)
            print(f"  rep {rep} {k}: {dt:.3f}s", flush=True)
    for k, xs in times.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"als {k}: {xs} -> median {statistics.median(xs):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
