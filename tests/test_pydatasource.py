"""Python DataSource API: registration, schema, partition planning,
deterministic content vs the pure-python reference — plus the FASTQ
file source's Interleave-faithful record-boundary properties at the
SPLIT level (Interleave.java:97,141)."""

from __future__ import annotations

import pytest

from virapipe_spark.pydatasource import (
    FastqDataSource,
    SyntheticReadsDataSource,
    _line_split_offsets,
    synth_read,
)


class TestPythonDataSource:
    def test_reads_match_reference_and_partitioning(self, spark):
        spark.dataSource.register(SyntheticReadsDataSource)
        df = (
            spark.read.format("synthetic_reads")
            .option("n", 50)
            .option("partitions", 4)
            .option("read_len", 48)
            .load()
        )
        assert df.schema.simpleString() == (
            "struct<read_id:bigint,name:string,bases:string,quality:string>"
        )
        rows = {r["read_id"]: r for r in df.collect()}
        assert len(rows) == 50
        for i in (0, 7, 49):
            rid, name, bases, qual = synth_read(i, 48)
            assert rows[i]["name"] == name
            assert rows[i]["bases"] == bases
            assert rows[i]["quality"] == qual
            assert len(rows[i]["bases"]) == 48

    def test_feeds_existing_operators(self, spark):
        """The source plugs straight into the quality-filter operator
        family — proving custom connectors compose with the engine."""
        from virapipe_spark.functions import avg_quality

        spark.dataSource.register(SyntheticReadsDataSource)
        df = (
            spark.read.format("synthetic_reads")
            .option("n", 40)
            .option("partitions", 2)
            .load()
        )
        out = df.select(avg_quality("quality").alias("aq")).collect()
        assert len(out) == 40
        assert all(r["aq"] > 0 for r in out)


    def test_empty_source_yields_zero_rows(self, spark):
        spark.dataSource.register(SyntheticReadsDataSource)
        df = spark.read.format("synthetic_reads").option("n", 0).load()
        assert df.count() == 0

    def test_reader_chunks_batches_to_cap(self, monkeypatch):
        """r13 (ADVICE_r12): a split yields MULTIPLE RecordBatches of at
        most _ARROW_CHUNK_ROWS rows — one batch per split held the whole
        split in memory twice, unbounded by n/partitions. Values stay
        identical and in order across the chunk boundary."""
        import virapipe_spark.pydatasource as pds
        from pyspark.sql.datasource import InputPartition

        monkeypatch.setattr(pds, "_ARROW_CHUNK_ROWS", 16)
        reader = pds.SyntheticReadsReader(
            {"n": "40", "partitions": "1", "read_len": "32"}
        )
        batches = list(reader.read(InputPartition((0, 40))))
        assert [b.num_rows for b in batches] == [16, 16, 8]
        ids = [i for b in batches for i in b.column(0).to_pylist()]
        assert ids == list(range(40))
        first = batches[0]
        rid, name, bases, qual = synth_read(5, 32)
        assert first.column(1).to_pylist()[5] == name
        assert first.column(2).to_pylist()[5] == bases


def _write_fastq_file(path, n, tag, read_len=24):
    recs = []
    for i in range(n):
        _id, _name, bases, qual = synth_read(i, read_len)
        recs.append((f"{tag}.{i}", bases, qual))
    with open(path, "w") as fh:
        for name, bases, qual in recs:
            fh.write(f"@{name}\n{bases}\n+\n{qual}\n")
    return recs


class TestFastqFileSource:
    """The record-boundary contract the reference encodes via
    NLineInputFormat splits of splitsize*4 lines (Interleave.java:97):
    for ANY split size, the union of per-split parses equals the
    whole-file parse, each split holds only whole stanzas, and paired
    reading interleaves mates in exact alternation across split
    boundaries (Interleave.java:141)."""

    @pytest.mark.parametrize("split_reads", [1, 2, 3, 7, 100])
    def test_split_invariance_single(self, spark, tmp_path, split_reads):
        n = 23  # coprime-ish with every split size above
        expect = _write_fastq_file(tmp_path / "a.fastq", n, "s")
        spark.dataSource.register(FastqDataSource)
        df = (
            spark.read.format("fastq")
            .option("split_reads", split_reads)
            .load(str(tmp_path / "a.fastq"))
        )
        # split planning: ceil(n / split_reads) partitions
        assert df.rdd.getNumPartitions() == -(-n // split_reads)
        rows = sorted(df.collect(), key=lambda r: r["rec_idx"])
        assert [(r["key"], r["sequence"], r["quality"]) for r in rows] == expect
        assert [r["rec_idx"] for r in rows] == list(range(n))

    @pytest.mark.parametrize("split_reads", [1, 3, 7])
    def test_paired_interleave_alternates(self, spark, tmp_path, split_reads):
        n = 11
        m1 = _write_fastq_file(tmp_path / "r1.fastq", n, "m/1")
        m2 = _write_fastq_file(tmp_path / "r2.fastq", n, "m/2")
        spark.dataSource.register(FastqDataSource)
        df = (
            spark.read.format("fastq")
            .option("split_reads", split_reads)
            .option("paired", str(tmp_path / "r2.fastq"))
            .load(str(tmp_path / "r1.fastq"))
        )
        rows = sorted(df.collect(), key=lambda r: r["rec_idx"])
        assert len(rows) == 2 * n
        for i in range(n):
            assert (
                rows[2 * i]["key"],
                rows[2 * i]["sequence"],
                rows[2 * i]["quality"],
            ) == m1[i]
            assert (
                rows[2 * i + 1]["key"],
                rows[2 * i + 1]["sequence"],
                rows[2 * i + 1]["quality"],
            ) == m2[i]

    def test_paired_shape_mismatch_raises(self, spark, tmp_path):
        _write_fastq_file(tmp_path / "r1.fastq", 8, "a")
        _write_fastq_file(tmp_path / "r2.fastq", 5, "b")
        spark.dataSource.register(FastqDataSource)
        # 8 vs 5 reads at split_reads=4 plans 2 splits on BOTH sides,
        # so the mismatch surfaces at the per-split record-count check
        # (executor side); 8 vs 3 would fail at planning. Both paths
        # raise with 'counts differ'.
        with pytest.raises(Exception, match="counts differ"):
            (
                spark.read.format("fastq")
                .option("split_reads", 4)
                .option("paired", str(tmp_path / "r2.fastq"))
                .load(str(tmp_path / "r1.fastq"))
                .collect()
            )
        _write_fastq_file(tmp_path / "r3.fastq", 3, "c")
        with pytest.raises(Exception, match="split counts differ"):
            (
                spark.read.format("fastq")
                .option("split_reads", 4)
                .option("paired", str(tmp_path / "r3.fastq"))
                .load(str(tmp_path / "r1.fastq"))
                .collect()
            )

    def test_directory_input_multi_file_global_ordinals(self, spark, tmp_path):
        d = tmp_path / "fqdir"
        d.mkdir()
        a = _write_fastq_file(d / "part-0", 5, "p0")
        b = _write_fastq_file(d / "part-1", 6, "p1")
        (d / "_SUCCESS").write_text("")
        spark.dataSource.register(FastqDataSource)
        df = (
            spark.read.format("fastq")
            .option("split_reads", 4)
            .load(str(d))
        )
        rows = sorted(df.collect(), key=lambda r: r["rec_idx"])
        got = [(r["key"], r["sequence"], r["quality"]) for r in rows]
        assert got == a + b  # sorted file order, cumulative rec_idx
        assert [r["rec_idx"] for r in rows] == list(range(11))

    def test_truncated_fastq_raises_at_plan_time(self, spark, tmp_path):
        """r11 review: a damaged tail (line count not a multiple of 4)
        must ERROR, not silently floor-divide the partial record away —
        the connector's error-out-over-truncate stance."""
        p = tmp_path / "trunc.fastq"
        _write_fastq_file(p, 5, "t")
        with open(p, "a") as fh:
            fh.write("@t.5\nACGT\n")  # 2 stray lines
        spark.dataSource.register(FastqDataSource)
        with pytest.raises(Exception, match="not a whole number"):
            (
                spark.read.format("fastq")
                .option("split_reads", 4)
                .load(str(p))
                .collect()
            )

    def test_gzip_input_decompresses_before_planning(self, spark, tmp_path):
        """Interleave.java:88-95 parity: .gz inputs decompress to a
        scratch copy BEFORE split planning, so records and split
        counts match the plain file exactly."""
        import gzip

        n = 9
        expect = _write_fastq_file(tmp_path / "plain.fastq", n, "g")
        with open(tmp_path / "plain.fastq", "rb") as fh:
            raw = fh.read()
        with gzip.open(tmp_path / "reads.fastq.gz", "wb") as gz:
            gz.write(raw)
        spark.dataSource.register(FastqDataSource)
        df = (
            spark.read.format("fastq")
            .option("split_reads", 4)
            .load(str(tmp_path / "reads.fastq.gz"))
        )
        assert df.rdd.getNumPartitions() == -(-n // 4)
        rows = sorted(df.collect(), key=lambda r: r["rec_idx"])
        assert [(r["key"], r["sequence"], r["quality"]) for r in rows] == expect

    def test_split_reads_must_be_positive(self):
        """ADVICE r12: split_reads=0 / negative is a domain error at
        reader construction, not a ZeroDivisionError at plan time."""
        from virapipe_spark.pydatasource import FastqReader

        for bad in (0, -3):
            with pytest.raises(ValueError, match="split_reads must be >= 1"):
                FastqReader({"path": "/nonexistent", "split_reads": str(bad)})

    def test_non_utf8_bytes_raise_named_error(self, tmp_path):
        """ADVICE r12: a latin-1 byte in a record raises a ValueError
        naming the file and split, not an opaque UnicodeDecodeError."""
        from virapipe_spark.pydatasource import _read_stanzas

        p = tmp_path / "latin.fastq"
        with open(p, "wb") as fh:
            fh.write(b"@caf\xe9.0\nACGT\n+\n!!!!\n")
        with pytest.raises(ValueError, match="non-UTF-8 bytes"):
            _read_stanzas(str(p), 0, p.stat().st_size)

    def test_gunzip_scratch_keyed_on_content_identity(self, tmp_path):
        """ADVICE r12: the scratch copy lives in a per-user 0700 dir and
        is keyed on (path, mtime, size) — replacing the source with a
        PRESERVED-OLDER mtime (cp -p semantics) still decompresses fresh
        because the key changes with mtime_ns/size."""
        import gzip
        import os
        import stat

        from virapipe_spark.pydatasource import _maybe_decompress, _scratch_root

        root = _scratch_root()
        st = os.lstat(root)
        assert stat.S_IMODE(st.st_mode) == 0o700
        if hasattr(os, "getuid"):
            assert st.st_uid == os.getuid()

        gz = tmp_path / "r.fastq.gz"
        with gzip.open(gz, "wb") as fh:
            fh.write(b"@a.0\nAAAA\n+\n!!!!\n")
        out1 = _maybe_decompress(str(gz))
        with open(out1) as fh:
            assert fh.read().startswith("@a.0")
        assert os.path.dirname(out1) == root

        # rewrite the source with DIFFERENT content but an OLDER mtime
        with gzip.open(gz, "wb") as fh:
            fh.write(b"@b.0\nCCCC\n+\n####\n")
        os.utime(gz, (0, 0))
        out2 = _maybe_decompress(str(gz))
        assert out2 != out1  # new identity -> new scratch name
        with open(out2) as fh:
            assert fh.read().startswith("@b.0")
        # and the prior identity's copy is EVICTED, not accreted (r12
        # review: without per-path eviction every source rewrite leaked
        # one decompressed copy into the scratch dir until reboot)
        assert not os.path.exists(out1)

    def test_offsets_cover_file_exactly(self, tmp_path):
        p = tmp_path / "x.fastq"
        _write_fastq_file(p, 10, "x")
        size = p.stat().st_size
        for lps in (4, 8, 12, 400):
            ranges = _line_split_offsets(str(p), lps)
            assert ranges[0][0] == 0 and ranges[-1][1] == size
            for (s1, e1, _n1), (s2, e2, _n2) in zip(ranges, ranges[1:]):
                assert e1 == s2  # contiguous, no gap/overlap
            # line counts sum to the file's 40 lines (10 stanzas)
            assert sum(n for _s, _e, n in ranges) == 40
