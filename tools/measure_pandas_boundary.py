"""Measure the Arrow/pandas boundary volume for catalog entries — the
ALLOWED_PANDAS counterpart of tools/measure_window_inputs.py (round-12
verdict item: the multimodal family's per-image-parallelism scale story
was argued from plan shape; measure the boundary instead).

Mechanism: monkeypatch ``DataFrame.mapInPandas`` so the INPUT batch
iterator is counted through Spark accumulators (batches, rows, bytes —
bytes via pandas ``memory_usage(deep=True)``, i.e. the materialized
payload size the Python worker holds per batch; the wrapped iterator
yields the same objects, so semantics are untouched). Run each named
entry with ``count()`` (full execution of the UDF stage) at a base dir
and an N-fold synthetic, and print per-entry:

    rows, batches, MB crossing, MB/batch, rows/batch

at both scales plus the ratios. The interesting properties at 100 TB:
- MB/batch bounded (an unbounded batch OOMs the Python worker; Spark
  caps rows per batch at spark.sql.execution.arrow.maxRecordsPerBatch,
  but BYTES per batch depends on payload width — this is the number
  the exemption argues about),
- batches scale ~linearly with rows (per-task parallelism holds),
- bytes/row flat (payload width independent of corpus size).

Usage:
    python tools/measure_pandas_boundary.py [base_dir] [synth_dir] name...
    # default dirs: /root/testdata/sf0.1 /tmp/sf1.0-synth
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Patch the CLASSIC implementation class: in Spark 4,
# pyspark.sql.DataFrame is the abstract parent and the classic subclass
# OVERRIDES mapInPandas, so patching the parent is a silent no-op (the
# call resolves on the subclass first — measured: wrapper never fired).
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.group import GroupedData  # noqa: E402

from virapipe_spark import catalog  # noqa: E402
from virapipe_spark.session import session  # noqa: E402

_ORIG_MAP_IN_PANDAS = DataFrame.mapInPandas
_ORIG_APPLY_IN_PANDAS = GroupedData.applyInPandas


class _Counters:
    """Fresh accumulators per measured run (accumulators are add-only)."""

    def __init__(self, sc) -> None:
        self.batches = sc.accumulator(0)
        self.rows = sc.accumulator(0)
        self.bytes = sc.accumulator(0)


_CURRENT: list[_Counters] = []  # driver-side pointer; closures bind the accs


def _patched_map_in_pandas(self, func, schema, *args, **kwargs):
    if not _CURRENT:
        return _ORIG_MAP_IN_PANDAS(self, func, schema, *args, **kwargs)
    c = _CURRENT[-1]
    b_acc, r_acc, by_acc = c.batches, c.rows, c.bytes

    def wrapped(batches):
        def counting():
            for pdf in batches:
                b_acc.add(1)
                r_acc.add(len(pdf))
                by_acc.add(int(pdf.memory_usage(deep=True, index=False).sum()))
                yield pdf

        return func(counting())

    return _ORIG_MAP_IN_PANDAS(self, wrapped, schema, *args, **kwargs)


def _patched_apply_in_pandas(self, func, schema, *args, **kwargs):
    """Count the grouped boundary too (applyInPandas receives ONE pdf
    per group, optionally with a leading key — pyspark dispatches on
    the wrapped function's ARITY, so the wrapper must mirror it)."""
    import inspect

    if not _CURRENT:
        return _ORIG_APPLY_IN_PANDAS(self, func, schema, *args, **kwargs)
    c = _CURRENT[-1]
    b_acc, r_acc, by_acc = c.batches, c.rows, c.bytes

    def _count(pdf):
        b_acc.add(1)
        r_acc.add(len(pdf))
        by_acc.add(int(pdf.memory_usage(deep=True, index=False).sum()))

    if len(inspect.getfullargspec(func).args) == 2:

        def wrapped(key, pdf):  # type: ignore[misc]
            _count(pdf)
            return func(key, pdf)

    else:

        def wrapped(pdf):  # type: ignore[misc]
            _count(pdf)
            return func(pdf)

    return _ORIG_APPLY_IN_PANDAS(self, wrapped, schema, *args, **kwargs)


def measure(spark, name: str, sf_dir: str) -> tuple[int, int, int, int]:
    """(out_rows, boundary_rows, batches, bytes) for one entry run.

    Python-worker accumulator updates arrive ASYNCHRONOUSLY after the
    action returns (they flow through the accumulator server, not the
    task result), so poll until the values hold still for a beat."""
    import time

    c = _Counters(spark.sparkContext)
    _CURRENT.append(c)
    try:
        df = catalog.QUERIES[name](spark, sf_dir)
        # noop sink, not count(): under count() Catalyst prunes every
        # output column, which lets join-elimination remove a pandas
        # stage hanging off a unique-keyed outer join (measured:
        # frame_sample's boundary never executed) — the noop write
        # materializes every column, the bench's execution contract
        df.write.mode("overwrite").format("noop").save()
        n = -1  # row count not needed; -1 marks "noop execution"
    finally:
        _CURRENT.pop()
    prev = (-1, -1, -1)
    stable = 0
    for _ in range(60):  # up to ~15 s of settling
        cur = (c.rows.value, c.batches.value, c.bytes.value)
        stable = stable + 1 if cur == prev else 0
        # zeros look "stable" before the first update lands (~2 s), so
        # require a 2 s unchanged streak, not just one repeat
        if stable >= 8:
            break
        prev = cur
        time.sleep(0.25)
    return n, c.rows.value, c.batches.value, c.bytes.value


def main() -> None:
    args = sys.argv[1:]
    base = args[0] if args else "/root/testdata/sf0.1"
    synth = args[1] if len(args) > 1 else "/tmp/sf1.0-synth"
    names = args[2:]
    catalog.load_all()
    DataFrame.mapInPandas = _patched_map_in_pandas
    GroupedData.applyInPandas = _patched_apply_in_pandas
    spark = session(app_name="pandas_boundary")
    max_rec = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )
    print(f"arrow.maxRecordsPerBatch = {max_rec}")
    print(
        "| entry | scale | rows | batches | MB | MB/batch | rows/batch |"
    )
    print("|---|---|---|---|---|---|---|")
    for name in names:
        stats = {}
        for label, d in (("base", base), ("synth", synth)):
            try:
                _n, rows, batches, nbytes = measure(spark, name, d)
            except Exception as e:  # noqa: BLE001
                msg = str(e).replace("|", "/").replace("\n", " ")[:100]
                print(f"| {name} | {label} FAILED: {msg} | | | | | |")
                stats = None
                break
            mb = nbytes / 1e6
            stats[label] = (rows, batches, mb)
            print(
                f"| {name} | {label} | {rows} | {batches} | {mb:.1f} | "
                f"{mb / batches if batches else 0:.2f} | "
                f"{rows // batches if batches else 0} |"
            )
        if stats and stats.get("base") and stats.get("synth"):
            (rb, bb, mbb), (rs, bs, mbs) = stats["base"], stats["synth"]
            print(
                f"| {name} | ratio | {rs / rb if rb else 0:.1f}x | "
                f"{bs / bb if bb else 0:.1f}x | {mbs / mbb if mbb else 0:.1f}x | "
                f"{(mbs / bs) / (mbb / bb) if bb and bs and mbb else 0:.2f}x | |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
