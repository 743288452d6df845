"""Custom PYTHON DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
the connector plug-point when no JVM source exists for a system: the
source declares a schema, plans ``InputPartition``s (which drive task
parallelism exactly like file splits), and each task materializes only
its partition's rows.

The demo source generates deterministic synthetic FASTQ-shaped reads
from md5 arithmetic (the repo's cross-engine hash idiom), so tests can
pin exact content — the same derivation as the BAM round-trip fixtures.

Scale notes: partition planning is the whole story — N partitions = N
parallel tasks, and a real connector shards by the remote system's
native ranges (key ranges, topic partitions, time slices). Rows cross
the Python worker boundary row-at-a-time in this API, so for data-plane
volume prefer a JVM source or land the data as parquet first; the
Python DataSource earns its place for control-plane-ish feeds (APIs,
queues, bespoke formats) where correctness of the split logic, not
per-row throughput, dominates.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_DNA16 = "ACGTACGTACGTACGT"
_HEX = "0123456789abcdef"


def synth_read(i: int, read_len: int = 32) -> tuple[int, str, str, str]:
    """Pure-python reference for one synthetic read (shared by the
    reader and the tests): bases = md5(i) hex mapped onto ACGT
    (repeated to read_len), quality = rotating printable phred band."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    bases = "".join(_DNA16[_HEX.index(c)] for c in h)
    bases = (bases * ((read_len + 31) // 32))[:read_len]
    qual = "".join(chr(33 + ((i + j) % 40)) for j in range(read_len))
    return i, f"synth.{i}", bases, qual


class SyntheticReadsDataSource(DataSource):
    """``format("synthetic_reads")`` after
    ``spark.dataSource.register(SyntheticReadsDataSource)``; options:
    ``n`` total reads, ``partitions`` split count, ``read_len``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_reads"

    def schema(self) -> str:
        return "read_id BIGINT, name STRING, bases STRING, quality STRING"

    def reader(self, schema) -> "SyntheticReadsReader":
        return SyntheticReadsReader(self.options)


class SyntheticReadsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 100))
        self.parts = int(options.get("partitions", 4))
        self.read_len = int(options.get("read_len", 32))

    def partitions(self):
        # contiguous id ranges — the split planning a real connector
        # does against its remote system's native sharding. An empty
        # source still plans ONE empty partition: Spark requires a
        # non-empty split list (and ceil-div of n=0 would make the
        # range step 0).
        per = max(1, -(-self.n // self.parts))
        return [
            InputPartition((lo, min(lo + per, self.n)))
            for lo in range(0, max(self.n, 1), per)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield synth_read(i, self.read_len)
