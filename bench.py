"""Benchmark harness: headline catalog queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (noop sink — full execution, no
driver collect) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from virapipe_spark import catalog
from virapipe_spark.session import session

#: Queries timed by the bench — the engine's headline workload. Extend as
#: operators land; keep it representative (scan/agg/join/window/dedup/ann).
HEADLINE = [
    "q1_pricing_summary",
    "scan_project",
    "count_distinct",
    "join_inner_agg",
    "join_left_outer",
    "join_broadcast_dims",
    "window_topk_per_group",
    "group_having_band",
    "set_intersect",
    "orderby_limit",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    catalog.load_all()
    spark = session(app_name="virapipe_bench")

    names = [n for n in HEADLINE if n in catalog.QUERIES]
    # warm-up: JVM/codegen/parquet-footer caches, one tiny action
    catalog.table(spark, sf_dir, "lineitem").limit(1).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = catalog.QUERIES[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
