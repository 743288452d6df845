"""r8 watch-item settlement: docs_bpe_pair_counts, graph_pagerank and
q21_waiting_orders read >2x their r6 figures in the r7 driver bench
(3.2x / 2.7x / 2.4x) — per the SCALE.md protocol a >1.5x driver reading
triggers (1) plan/code-diff vs the prior round's SHA and (2) this
same-session interleaved repetition run on a quiet machine.

Step (1) is already settled by git: none of the three query paths
changed between the r6 artifact commit (034d828) and r7 —
`git log -L` over docs_bpe_pair_counts / q21_waiting_orders /
graph_pagerank shows zero commits; graph.pagerank itself only gained
the truncate_lineage(reliable=True) opt-in, a no-op in any session
without a checkpoint directory (driver and bench sessions configure
none, so both rounds ran localCheckpoint).

Step (2), this script: interleave the three suspects with a
constant-work NEGATIVE CONTROL (scan_project) x REPS after a warm rep,
compare medians to the r6 driver figures. Flat suspects + flat control
=> noise, close the watch; elevated suspects + flat control => real
regression, bisect.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from virapipe_spark import catalog
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 7
#: r6 driver bench figures (BENCH_r06.json) and the r7 driver readings
#: under dispute (BENCH_r07.json).
R6 = {
    "docs_bpe_pair_counts": 0.32,
    "graph_pagerank": 2.19,
    "q21_waiting_orders": 1.23,
    "scan_project": 0.17,
}
R7 = {
    "docs_bpe_pair_counts": 1.04,
    "graph_pagerank": 5.84,
    "q21_waiting_orders": 2.97,
    "scan_project": None,
}


def main() -> None:
    catalog.load_all()
    spark = session(app_name="ab_watch_r8", shuffle_partitions=32)
    names = [
        "docs_bpe_pair_counts",
        "graph_pagerank",
        "q21_waiting_orders",
        "scan_project",
    ]
    times: dict[str, list[float]] = {n: [] for n in names}
    for n in names:  # warm rep (codegen/JIT), untimed
        catalog.QUERIES[n](spark, SF).write.format("noop").mode("overwrite").save()
    for _ in range(REPS):
        for n in names:
            t0 = time.perf_counter()
            catalog.QUERIES[n](spark, SF).write.format("noop").mode(
                "overwrite"
            ).save()
            times[n].append(time.perf_counter() - t0)
    print(f"load avg during run: {os.getloadavg()}")
    for n in names:
        med = statistics.median(times[n])
        r7 = f", r7 driver {R7[n]:.2f}s" if R7[n] else ""
        print(
            f"{n}: median {med:.3f}s over {REPS} (r6 driver {R6[n]:.2f}s, "
            f"ratio {med / R6[n]:.2f}{r7}) "
            f"all={['%.2f' % t for t in times[n]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
