"""Interleaved A/B: the Python DataSource row boundary at volume.

A (old): DataSourceReader.read() yields per-row Python tuples — every
row is pickled Python->JVM individually (the pre-r12 shape, kept here
as subclasses overriding read()).

B (new, r12): read() yields ONE pyarrow.RecordBatch per split
(SPARK-48493) — the split's rows cross as four Arrow arrays.

Measured at VOLUME (default 400k synthetic reads / 80 splits — the
fixture-scale gate numbers are planning-dominated and cannot see the
boundary), via count() + a full-column noop write. Equality asserted
on the full frame hash first.
"""
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from virapipe_spark.pydatasource import (
    FastqDataSource,
    FastqReader,
    SyntheticReadsDataSource,
    SyntheticReadsReader,
    _read_stanzas,
    synth_read,
)
from virapipe_spark.session import session

N = int(os.environ.get("AB_DS_N", 400_000))
PARTS = int(os.environ.get("AB_DS_PARTS", 80))


class _RowReader(SyntheticReadsReader):
    """The pre-r12 row-at-a-time read(), verbatim."""

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield synth_read(i, self.read_len)


class RowSyntheticReadsDataSource(SyntheticReadsDataSource):
    @classmethod
    def name(cls):
        return "synthetic_reads_rows"

    def reader(self, schema):
        return _RowReader(self.options)


def frame(spark, fmt):
    return (
        spark.read.format(fmt)
        .option("n", N)
        .option("partitions", PARTS)
        .load()
    )


def digest(df):
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("read_id", "name", "bases", "quality")).alias("h"),
    ).collect()[0]


class _RowFastqReader(FastqReader):
    """The pre-r12 row-at-a-time fastq read(), verbatim (single-file
    branch; the paired branch is not exercised by this bench)."""

    def read(self, partition):
        kind = partition.value[0]
        assert kind == "single"
        split = partition.value[1]
        if split is None:
            return
        path, start, end, base = split
        for j, rec in enumerate(_read_stanzas(path, start, end)):
            yield (base + j, *rec)


class RowFastqDataSource(FastqDataSource):
    @classmethod
    def name(cls):
        return "fastq_rows"

    def reader(self, schema):
        return _RowFastqReader(self.options)


def write_fastq(n: int) -> str:
    path = os.path.join(
        tempfile.gettempdir(), f"ab_ds_arrow_{n}.fastq"
    )
    if not os.path.exists(path):
        with open(path, "w") as f:
            for i in range(n):
                _id, name, bases, qual = synth_read(i, 64)
                f.write(f"@{name}\n{bases}\n+\n{qual}\n")
    return path


def fq_digest(df):
    return df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64("rec_idx", "key", "sequence", "quality")
        ).alias("h"),
    ).collect()[0]


def main():
    spark = session(app_name="ab_datasource_arrow")
    spark.dataSource.register(SyntheticReadsDataSource)
    spark.dataSource.register(RowSyntheticReadsDataSource)
    spark.dataSource.register(FastqDataSource)
    spark.dataSource.register(RowFastqDataSource)

    # --- synthetic source (generation-bound: md5 per read dominates,
    # so this mostly shows the boundary is not a REGRESSION) ---
    a = digest(frame(spark, "synthetic_reads_rows"))
    b = digest(frame(spark, "synthetic_reads"))
    assert tuple(a) == tuple(b), "synthetic frames differ!"
    print(f"synthetic rows {a['n']}, digest equal")

    # --- fastq file source (read-bound: the boundary is the cost) ---
    fq = write_fastq(N)

    def fq_frame(fmt):
        return spark.read.format(fmt).option("split_reads", 5000).load(fq)

    fa = fq_digest(fq_frame("fastq_rows"))
    fb = fq_digest(fq_frame("fastq"))
    assert tuple(fa) == tuple(fb), "fastq frames differ!"
    print(f"fastq rows {fa['n']}, digest equal")

    suites = {
        "synthetic": {
            "old(row-tuples)": lambda: frame(spark, "synthetic_reads_rows"),
            "new(arrow-batch)": lambda: frame(spark, "synthetic_reads"),
        },
        "fastq-file": {
            "old(row-tuples)": lambda: fq_frame("fastq_rows"),
            "new(arrow-batch)": lambda: fq_frame("fastq"),
        },
    }
    for label, variants in suites.items():
        times = {k: [] for k in variants}
        for _ in range(5):
            for k, fn in variants.items():
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                times[k].append(time.perf_counter() - t0)
        for k, xs in times.items():
            xs = sorted(round(t, 3) for t in xs)
            print(
                f"{label} {k}: {xs} -> median {statistics.median(xs):.3f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
