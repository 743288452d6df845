"""Round-trip tests for the IO layer (virapipe_spark.io, SURVEY.md §2.1-2.2)."""

from __future__ import annotations

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

from virapipe_spark import io as vio
from tests import fixtures

FASTQ_TEXT = """\
@S1:12:FCA123:1:1101:1000:2000 1:N:0:ACGTACGT
ACGTACGTAC
+
IIIIIIIIII
@S1:12:FCA123:1:1101:1000:2000 2:N:0:ACGTACGT
GTACGTACGT
+
IIIIIHHHHH
@legacy_read/1
TTGGCCAATT
+
JJJJJJJJJJ
"""

FASTA_TEXT = """\
>k141_1 flag=1 len=15
ATGAAATTTGGG
TAA
>k141_2
TTACCCAAATTTCAT
>empty_seq
>k141_3 multi word header
CCCCC
"""

BLAST_TEXT = (
    "k141_1\tCM000001.1\t95.5\t12\t1\t0\t1\t12\t500\t511\t1e-30\t120.0\n"
    "k141_3\tCM000003.1\t71.0\t4\t1\t0\t1\t4\t10\t13\t0.01\t40.0\n"
    "k141_x\tCM000009.1\tnotanumber\t\t\t\t\t\t\t\t\t\n"  # malformed -> nulls
)

SAM_TEXT = (
    "@HD\tVN:1.6\n"
    "@SQ\tSN:chr1\tLN:248956422\n"
    "r1\t0\tchr1\t100\t60\t4M\t*\t0\t0\tACGT\tIIII\n"
    "r2\t4\t*\t0\t0\t*\t*\t0\t0\tTTTT\t####\n"
    "r3\t1028\tchr1\t7\t60\t4M\t*\t0\t0\tGGCC\tJJJJ\n"
)


class TestFastq:
    @pytest.fixture(scope="class")
    def fastq_df(self, spark, tmp_path_factory):
        p = tmp_path_factory.mktemp("fastq") / "reads.fastq"
        p.write_text(FASTQ_TEXT)
        return vio.read_fastq(spark, str(p)).cache()

    def test_schema_and_rows(self, fastq_df):
        from virapipe_spark import schemas

        # names+types match READS (literal-0 columns are non-nullable,
        # which only widens on union with parquet-backed tables)
        assert [(f.name, f.dataType) for f in fastq_df.schema.fields] == [
            (f.name, f.dataType) for f in schemas.READS.fields
        ]
        assert fastq_df.count() == 3

    def test_illumina_metadata_parsed(self, fastq_df):
        r = fastq_df.filter(F.col("read") == 1).first()
        assert r["instrument"] == "S1"
        assert r["runNumber"] == 12
        assert r["flowcellId"] == "FCA123"
        assert (r["lane"], r["tile"], r["xpos"], r["ypos"]) == (1, 1101, 1000, 2000)
        assert r["filterPassed"] is True
        assert r["indexSequence"] == "ACGTACGT"
        assert r["sequence"] == "ACGTACGTAC"
        assert r["quality"] == "IIIIIIIIII"

    def test_legacy_name_nulls(self, fastq_df):
        r = fastq_df.filter(F.col("key") == "legacy_read/1").first()
        assert r is not None
        assert r["instrument"] is None and r["read"] is None

    def test_gzip_transparent(self, spark, tmp_path):
        p = tmp_path / "reads.fastq.gz"
        with gzip.open(p, "wt") as f:
            f.write(FASTQ_TEXT)
        assert vio.read_fastq(spark, str(p)).count() == 3

    def test_roundtrip(self, spark, fastq_df, tmp_path):
        out = tmp_path / "out_fastq"
        vio.write_fastq(fastq_df.select("key", "sequence", "quality"), str(out))
        back = vio.read_fastq(spark, str(out))
        orig = {(r["key"], r["sequence"], r["quality"]) for r in fastq_df.collect()}
        got = {(r["key"], r["sequence"], r["quality"]) for r in back.collect()}
        assert got == orig


class TestFasta:
    @pytest.fixture(scope="class")
    def fasta_df(self, spark, tmp_path_factory):
        p = tmp_path_factory.mktemp("fasta") / "contigs.fasta"
        p.write_text(FASTA_TEXT)
        return vio.read_fasta(spark, str(p)).cache()

    def test_parse(self, fasta_df):
        rows = {r["id"]: r["sequence"] for r in fasta_df.collect()}
        # empty_seq dropped; multi-line sequence joined; header first word only
        assert rows == {
            "k141_1": "ATGAAATTTGGGTAA",
            "k141_2": "TTACCCAAATTTCAT",
            "k141_3": "CCCCC",
        }

    def test_roundtrip(self, spark, fasta_df, tmp_path):
        out = tmp_path / "out_fasta"
        vio.write_fasta(fasta_df, str(out))
        back = vio.read_fasta(spark, str(out))
        assert {tuple(r) for r in back.collect()} == {
            tuple(r) for r in fasta_df.collect()
        }


class TestBlast:
    def test_read_blast(self, spark, tmp_path):
        p = tmp_path / "hits.tsv"
        p.write_text(BLAST_TEXT)
        df = vio.read_blast(spark, str(p))
        from virapipe_spark import schemas

        assert df.schema == schemas.BLAST_HITS
        rows = df.orderBy("qseqid").collect()
        assert len(rows) == 3
        assert rows[0]["pident"] == 95.5 and rows[0]["bitscore"] == 120.0
        # malformed row: qseqid survives, numeric fields null
        assert rows[2]["qseqid"] == "k141_x" and rows[2]["pident"] is None

    def test_write_ordered(self, spark, tmp_path):
        df = fixtures.blast_df(spark)
        out = tmp_path / "blast_out"
        vio.write_blast_tab(df, str(out))
        lines = [
            line.rstrip("\n")
            for f in glob.glob(os.path.join(out, "part-*"))
            for line in open(f)
        ]
        assert len(lines) == 3
        for line in lines:
            cols = line.split("\t")
            assert cols[0].startswith("k141_")
            assert len(cols) == 12  # documented outfmt-6 column order
        back = vio.read_blast(spark, str(out))
        assert back.count() == 3


class TestSam:
    def test_read_sam(self, spark, tmp_path):
        p = tmp_path / "aln.sam"
        p.write_text(SAM_TEXT)
        df = vio.read_sam(spark, str(p))
        from virapipe_spark import schemas

        assert [(f.name, f.dataType) for f in df.schema.fields] == [
            (f.name, f.dataType) for f in schemas.ALIGNMENTS.fields
        ]
        rows = {r["readName"]: r for r in df.collect()}
        assert len(rows) == 3  # header lines dropped
        assert rows["r1"]["readUnmapped"] is False
        assert rows["r2"]["readUnmapped"] is True
        assert rows["r3"]["duplicateRead"] is True  # 1028 = 0x400 | 0x4
        assert rows["r1"]["referenceName"] == "chr1" and rows["r1"]["start"] == 100

    def test_sam_to_fastq(self, spark):
        aln = fixtures.alignments_df(spark)
        fq = vio.sam_to_fastq(aln)
        keys = sorted(r["key"] for r in fq.collect())
        assert sum(k.endswith("/1") for k in keys) == 2
        assert sum(k.endswith("/2") for k in keys) == 2

    def test_write_sam_roundtrip(self, spark, tmp_path):
        p = tmp_path / "aln.sam"
        p.write_text(SAM_TEXT)
        df = vio.read_sam(spark, str(p))
        out = str(tmp_path / "sam_out")
        header = ["@HD\tVN:1.6", "@SQ\tSN:chr1\tLN:248956422"]
        vio.write_sam(df.repartition(2), out, header=header)
        # every part file starts with the full header (per-writer
        # injection, HDFSWriter.java:62-91)
        for part in glob.glob(os.path.join(out, "part-*")):
            lines = open(part).read().splitlines()
            assert lines[: len(header)] == header
        back = vio.read_sam(spark, out)
        orig = {tuple(r) for r in df.collect()}
        assert {tuple(r) for r in back.collect()} == orig
        # flag word rebuilt: unmapped + duplicate bits survive
        rows = {r["readName"]: r for r in back.collect()}
        assert rows["r2"]["readUnmapped"] is True
        assert rows["r3"]["duplicateRead"] is True


class TestGenericSinks:
    def test_parquet_roundtrip(self, spark, tmp_path):
        df = fixtures.contigs_df(spark)
        out = str(tmp_path / "contigs_parquet")
        vio.write_parquet(df, out)
        assert spark.read.parquet(out).count() == 4

    def test_csv_ordered(self, spark, tmp_path):
        df = fixtures.contigs_df(spark)
        out = str(tmp_path / "csv_out")
        vio.write_csv_ordered(df, out, ["sequence", "id"], sep=",")
        # higher session parallelism leaves most part files empty for a
        # 4-row frame — gather every data line instead of part-*[0]
        lines = [
            ln.strip()
            for p in sorted(glob.glob(os.path.join(out, "part-*")))
            for ln in open(p)
            if ln.strip()
        ]
        assert len(lines) == df.count()
        for line in lines:
            seq, cid = line.split(",")
            assert cid.startswith("k141_")  # pinned order: sequence first

    def test_grouped_write(self, spark, tmp_path):
        from virapipe_spark.functions import sample_id

        reads = fixtures.reads_df(spark).withColumn("sample", sample_id("key"))
        out = str(tmp_path / "grouped")
        vio.write_grouped(reads, out, "sample")
        subdirs = {d for d in os.listdir(out) if d.startswith("sample=")}
        assert subdirs == {"sample=S1", "sample=S2", "sample=S3"}
        back = spark.read.parquet(out)
        assert back.count() == 8
        # partition pruning works on the group column
        assert back.filter(F.col("sample") == "S2").count() == 2


class TestFastqBlockIndexing:
    """The DataFrame-native line index (per-block counts + block base
    offsets) must survive the two layouts that break naive indexing:
    multiple files in one glob, and a single file split into many scan
    blocks whose boundaries land mid-stanza."""

    def test_multifile_glob_and_small_blocks(self, spark, tmp_path):
        for fi in range(2):
            with open(tmp_path / f"s{fi}.fastq", "w") as f:
                for i in range(5000):
                    seq = "ACGT" * 6 + "A" * (i % 5)  # variable-length records
                    f.write(f"@F{fi}R{i:05d}\n{seq}\n+\n{'I' * len(seq)}\n")
        prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        try:
            df = vio.read_fastq(spark, str(tmp_path) + "/*.fastq")
            # enough data to guarantee many blocks per file at 64 KB
            rows = df.select("key", "sequence", "quality").collect()
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        assert len(rows) == 10_000
        seen = set()
        for r in rows:
            fi, i = int(r["key"][1]), int(r["key"][3:8])
            expect = "ACGT" * 6 + "A" * (i % 5)
            # any stanza misalignment scrambles sequence/quality pairing
            assert r["sequence"] == expect, r["key"]
            assert r["quality"] == "I" * len(expect), r["key"]
            seen.add((fi, i))
        assert len(seen) == 10_000  # no dropped or duplicated records


VCF_TEXT = """##fileformat=VCFv4.3
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2
chr1\t100\trs1\tA\tG\t50.5\tPASS\tDP=14;AF=0.5\tGT:DP\t0/1:12\t1/1:16
chr1\t200\t.\tC\tT,G\t.\tq10\tDP=7;DB\tGT\t0/0\t0/1
chr2\t5\trs9\tGTC\tG\t9.0\t.\t.\tGT\t./.\t0/0
"""


class TestVcf:
    def test_read_vcf_typed(self, spark, tmp_path):
        p = tmp_path / "v.vcf"
        p.write_text(VCF_TEXT)
        df = vio.read_vcf(spark, str(p))
        rows = {(r["chrom"], r["pos"]): r for r in df.collect()}
        assert len(rows) == 3  # meta + header lines dropped
        r1 = rows[("chr1", 100)]
        assert r1["id"] == "rs1" and r1["qual"] == 50.5 and r1["filter"] == "PASS"
        assert r1["info"] == {"DP": "14", "AF": "0.5"}
        assert r1["samples"] == ["GT:DP", "0/1:12", "1/1:16"]
        r2 = rows[("chr1", 200)]
        assert r2["id"] is None and r2["qual"] is None
        assert r2["alt"] == "T,G"  # multi-allelic stays joined
        assert r2["info"] == {"DP": "7", "DB": "true"}  # flag key
        r3 = rows[("chr2", 5)]
        assert r3["filter"] is None and r3["info"] is None

    def test_multiallelic_normalize_is_a_dataframe_op(self, spark, tmp_path):
        p = tmp_path / "v.vcf"
        p.write_text(VCF_TEXT)
        df = vio.read_vcf(spark, str(p))
        alts = (
            df.select("chrom", "pos", F.explode(F.split("alt", ",")).alias("alt"))
            .filter((F.col("chrom") == "chr1") & (F.col("pos") == 200))
        )
        assert sorted(r["alt"] for r in alts.collect()) == ["G", "T"]


GFF_TEXT = """##gff-version 3
# a comment line
chr1\thavana\tgene\t1000\t5000\t.\t+\t.\tID=gene1;Name=TP53
chr1\thavana\tmRNA\t1000\t5000\t.\t+\t.\tID=tx1;Parent=gene1
chr1\t.\texon\t1000\t1200\t44.5\t-\t0\tID=ex1;Parent=tx1
chr2\thavana\tregion\t1\t9\t.\t.\t.\t.
"""


class TestGff:
    def test_read_gff_typed(self, spark, tmp_path):
        p = tmp_path / "a.gff3"
        p.write_text(GFF_TEXT)
        df = vio.read_gff(spark, str(p))
        rows = {r["attributes"]["ID"] if r["attributes"] else None: r
                for r in df.collect()}
        assert len(rows) == 4  # directives/comments dropped
        g = rows["gene1"]
        assert (g["seqid"], g["type"], g["start"], g["end"]) == ("chr1", "gene", 1000, 5000)
        assert g["score"] is None and g["strand"] == "+" and g["phase"] is None
        assert g["attributes"] == {"ID": "gene1", "Name": "TP53"}
        ex = rows["ex1"]
        assert ex["score"] == 44.5 and ex["strand"] == "-" and ex["phase"] == 0
        r = rows[None]
        assert r["source"] == "havana" and r["attributes"] is None

    def test_parent_resolution_is_a_self_join(self, spark, tmp_path):
        p = tmp_path / "a.gff3"
        p.write_text(GFF_TEXT)
        df = vio.read_gff(spark, str(p))
        child = df.select(
            F.col("attributes")["ID"].alias("cid"),
            F.col("attributes")["Parent"].alias("pid"),
        ).filter(F.col("pid").isNotNull())
        parent = df.select(
            F.col("attributes")["ID"].alias("pid"), F.col("type").alias("ptype")
        )
        got = {r["cid"]: r["ptype"] for r in child.join(parent, "pid").collect()}
        assert got == {"tx1": "gene", "ex1": "mRNA"}


class TestDriverTableContract:
    """catalog.table() must be the single place that absorbs driver
    testdata drift (VERDICT r04: events.ts arrived re-typed and five
    queries died as scattered AnalysisExceptions)."""

    def test_retyped_column_fails_loudly(self, spark, tmp_path):
        from virapipe_spark import catalog

        # documents with n_chars re-typed to string — not a legal drift
        src = catalog.table(spark, "/root/testdata/sf0.001", "documents")
        bad = src.withColumn("n_chars", F.col("n_chars").cast("string"))
        bad.write.parquet(str(tmp_path / "documents.parquet"))
        with pytest.raises(TypeError, match="testdata drift.*n_chars.*string"):
            catalog.table(spark, str(tmp_path), "documents")

    def test_missing_column_fails_loudly(self, spark, tmp_path):
        from virapipe_spark import catalog

        src = catalog.table(spark, "/root/testdata/sf0.001", "region")
        src.drop("r_name").write.parquet(str(tmp_path / "region.parquet"))
        with pytest.raises(TypeError, match="testdata drift.*r_name.*MISSING"):
            catalog.table(spark, str(tmp_path), "region")

    def test_events_ts_flavors_normalize_to_timestamp(self, spark, tmp_path):
        """Both historical encodings of events.ts (nanos-as-bigint and
        plain timestamp[us]/NTZ) must read back as a session-zoned
        TIMESTAMP with identical values."""
        from virapipe_spark import catalog

        ntz_dir = tmp_path / "ntz"
        src = catalog.table(spark, "/root/testdata/sf0.001", "events").limit(50)
        # current driver shape: TIMESTAMP_NTZ
        src.withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(
            str(ntz_dir / "events.parquet")
        )
        got = catalog.table(spark, str(ntz_dir), "events")
        assert dict(got.dtypes)["ts"] == "timestamp"
        want = {(r["event_id"], r["ts"]) for r in src.select("event_id", "ts").collect()}
        assert {(r["event_id"], r["ts"]) for r in got.select("event_id", "ts").collect()} == want

    def test_all_driver_tables_pass_contract(self, spark, sf_dir):
        from virapipe_spark import catalog

        for t in catalog.TABLES:
            catalog.table(spark, sf_dir, t)  # raises on contract violation


BED_TEXT = """browser position chr1:1-1000
track name="demo"
# comment
chr1\t100\t200\tiv1\t960\t+
chr1\t150\t250\tiv2\t.\t-
chr2\t0\t50
chr2\t10\t20\tiv3\t5\t.
"""


class TestBed:
    def test_read_bed_typed(self, spark, tmp_path):
        p = tmp_path / "a.bed"
        p.write_text(BED_TEXT)
        df = vio.read_bed(spark, str(p))
        rows = sorted(map(tuple, df.collect()))
        assert rows == [
            ("chr1", 100, 200, "iv1", 960, "+"),
            ("chr1", 150, 250, "iv2", None, "-"),
            ("chr2", 0, 50, None, None, None),  # BED3: optional cols null
            ("chr2", 10, 20, "iv3", 5, None),  # '.' strand nulls
        ]
        assert dict(df.dtypes) == {
            "chrom": "string", "start": "bigint", "end": "bigint",
            "name": "string", "score": "int", "strand": "string",
        }

    def test_bed_feeds_interval_ops(self, spark, tmp_path):
        """The typed output plugs straight into intervals.py."""
        from virapipe_spark import intervals

        p = tmp_path / "a.bed"
        p.write_text(BED_TEXT)
        bed = vio.read_bed(spark, str(p)).select("chrom", "start", "end")
        merged = intervals.merge_overlapping(bed, "chrom", "start", "end")
        got = sorted(
            (r["chrom"], r["start"], r["end"]) for r in merged.collect()
        )
        assert got == [("chr1", 100, 250), ("chr2", 0, 50)]


class TestBam:
    """Binary BAM reader (bam.py): BGZF + record layout, cross-checked
    against the SAM text path on identical logical alignments."""

    def test_vectorized_decode_matches_per_record_twin(self):
        """The r8 numpy record decode (_decode_records) must be
        field-identical to the readable per-record path
        (_decode_records_py) on adversarial records: 1..151 bp odd/even
        sequences over the full 16-letter code, empty and multi-op
        cigars, unmapped ref_id=-1, varied name lengths, all flag
        bits."""
        import random
        import struct

        from virapipe_spark import bam as vbam

        rng = random.Random(7)
        recs = []
        for i in range(500):
            ls = rng.randint(1, 151)
            seq = "".join(
                rng.choice("ACGTN=MRSVWYHKDB") for _ in range(ls)
            )
            cig = (
                ""
                if i % 7 == 0
                else (f"{ls}M" if i % 3 else f"{ls // 2}S{ls - ls // 2}M")
            )
            recs.append(
                {
                    "read_name": f"r{'x' * (i % 30)}{i}",
                    "ref_id": -1 if i % 11 == 0 else i % 3,
                    "pos": rng.randint(0, 1 << 28),
                    "mapq": i % 255,
                    "flag": rng.choice([0, 4, 77, 141, 1024]),
                    "cigar": cig,
                    "seq": seq,
                }
            )
        data = vbam.encode_bam(
            "@HD\tVN:1.6\n", [("chr1", 1000), ("chr2", 2000)], recs
        )
        raw = vbam.bgzf_decompress(data)
        (l_text,) = struct.unpack_from("<i", raw, 4)
        pos = 8 + l_text
        (n_ref,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        for _ in range(n_ref):
            (l_name,) = struct.unpack_from("<i", raw, pos)
            pos += 8 + l_name
        offs = vbam._record_offsets(raw, pos)
        assert len(offs) == 500
        py = vbam._decode_records_py(raw, offs)
        np_ = vbam._decode_records(raw, offs)
        assert np_ == py
        # the split reader hands in a bytearray, not bytes
        assert vbam._decode_records(bytearray(raw), offs) == py
        assert vbam._decode_records(raw, []) == []

    def _records(self):
        import hashlib

        hexd = "0123456789abcdef"
        dna = "ACGTACGTACGTACGT"
        recs = []
        for i in range(30):
            seq = "".join(
                dna[hexd.index(c)]
                for c in hashlib.md5(str(i).encode()).hexdigest()
            )
            recs.append(
                {
                    "read_name": f"r{i}",
                    "ref_id": i % 3,
                    "pos": i * 11,
                    "flag": (0x4 if i % 4 == 0 else 0)
                    | (0x400 if i % 6 == 0 else 0),
                    "cigar": "32M",
                    "seq": seq,
                }
            )
        return recs

    def test_matches_sam_text_reader(self, spark, tmp_path):
        """The same alignments through (a) binary BAM and (b) SAM text
        must produce identical typed rows — the two sources must
        interchange."""
        from virapipe_spark import bam as vbam
        from virapipe_spark import io as vio

        refs = [(f"ref{i}", 5000) for i in range(3)]
        recs = self._records()
        bam_dir = tmp_path / "bam"
        bam_dir.mkdir()
        (bam_dir / "a.bam").write_bytes(
            vbam.encode_bam("@HD\tVN:1.6\n", refs, recs, block_size=512)
        )
        sam_lines = [
            "\t".join(
                [
                    r["read_name"],
                    str(r["flag"]),
                    f"ref{r['ref_id']}",
                    str(r["pos"] + 1),
                    "60",
                    r["cigar"],
                    "*",
                    "0",
                    "0",
                    r["seq"],
                    "*",
                ]
            )
            for r in recs
        ]
        sam_dir = tmp_path / "sam"
        sam_dir.mkdir()
        (sam_dir / "a.sam").write_text("@HD\tVN:1.6\n" + "\n".join(sam_lines) + "\n")

        cols = ["readName", "start", "referenceName", "length", "bases",
                "cigar", "readUnmapped", "duplicateRead"]
        got_bam = sorted(
            tuple(r) for r in vbam.read_bam(spark, str(bam_dir)).select(*cols).collect()
        )
        got_sam = sorted(
            tuple(r) for r in vio.read_sam(spark, str(sam_dir)).select(*cols).collect()
        )
        assert got_bam == got_sam and len(got_bam) == 30

    def test_multiblock_bgzf_and_eof_marker(self, tmp_path):
        from virapipe_spark import bam as vbam

        refs = [("chr1", 1000)]
        recs = self._records() * 20  # force several 512-byte BGZF members
        blob = vbam.encode_bam("@HD\n", refs, [
            {**r, "ref_id": 0} for r in recs
        ], block_size=512)
        assert blob.endswith(vbam._BGZF_EOF)
        assert blob.count(b"\x1f\x8b\x08\x04") > 2
        _t, _r, back = vbam.decode_bam(blob)
        assert len(back) == len(recs)

    def test_unmapped_record_gets_null_reference(self, spark, tmp_path):
        from virapipe_spark import bam as vbam

        recs = [
            {
                "read_name": "u0",
                "ref_id": -1,
                "pos": -1,
                "flag": 0x4,
                "cigar": "",
                "seq": "ACGT",
            }
        ]
        d = tmp_path / "b"
        d.mkdir()
        (d / "u.bam").write_bytes(vbam.encode_bam("@HD\n", [("chr1", 9)], recs))
        row = vbam.read_bam(spark, str(d)).first()
        assert row["referenceName"] is None
        assert row["readUnmapped"] is True and row["length"] == 4


class TestBamWrite:
    def test_write_bam_roundtrip_with_empty_partitions(self, spark, tmp_path):
        """write_bam: 2 rows repartitioned to 4 (2 empty partitions must
        write no shard), reference dictionary derived from data, flags
        and null-reference (unmapped, ref_id -1) round-trip through the
        binary layer."""
        from virapipe_spark import bam as vbam

        df = spark.createDataFrame(
            [
                ("a", 10, "chrX", "ACGTACGT", "8M", False, True),
                ("b", 1, None, "TTTT", "", True, False),
            ],
            "readName STRING, start INT, referenceName STRING, "
            "bases STRING, cigar STRING, readUnmapped BOOLEAN, "
            "duplicateRead BOOLEAN",
        )
        out = str(tmp_path / "bam_out")
        vbam.write_bam(df.repartition(4), out)
        import os

        shards = [f for f in os.listdir(out) if f.endswith(".bam")]
        assert 1 <= len(shards) <= 2
        got = {
            r["readName"]: r for r in vbam.read_bam(spark, out).collect()
        }
        assert got["a"]["referenceName"] == "chrX"
        assert got["a"]["start"] == 10
        assert got["a"]["bases"] == "ACGTACGT"
        assert got["a"]["cigar"] == "8M"
        assert got["a"]["duplicateRead"] and not got["a"]["readUnmapped"]
        assert got["b"]["referenceName"] is None
        assert got["b"]["readUnmapped"] and not got["b"]["duplicateRead"]
        assert got["b"]["bases"] == "TTTT"

    def test_write_bam_nulls_map_to_missing_markers(self, spark, tmp_path):
        """The reader's permissive-null rows must survive the binary
        sink: null name -> '*', null bases -> zero-length seq, null
        start -> unplaced (-1 -> reader start 0)."""
        from virapipe_spark import bam as vbam

        df = spark.createDataFrame(
            [(None, None, None, None, "", True, False)],
            "readName STRING, start INT, referenceName STRING, "
            "bases STRING, cigar STRING, readUnmapped BOOLEAN, "
            "duplicateRead BOOLEAN",
        )
        out = str(tmp_path / "bam_nulls")
        vbam.write_bam(df, out)
        rows = vbam.read_bam(spark, out).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["readName"] == "*"
        assert r["bases"] == ""
        assert r["length"] == 0
        assert r["referenceName"] is None and r["readUnmapped"]


class TestCompaction:
    def test_compact_parquet_shrinks_and_preserves(self, spark, tmp_path):
        """io.compact_parquet: fragmented table -> fewer files, byte
        budget respected (ceil(bytes/target)), rows and values intact."""
        import os

        from virapipe_spark import io as vio

        src = str(tmp_path / "frag")
        dst = str(tmp_path / "compact")
        df = spark.range(0, 5000).selectExpr(
            "id", "id % 13 AS k", "concat('v', id) AS v"
        )
        df.repartition(32).write.parquet(src)
        n_src = sum(
            1 for r, _, fs in os.walk(src) for f in fs
            if f.endswith(".parquet")
        )
        assert n_src == 32
        stats = vio.compact_parquet(spark, src, dst, target_bytes=1 << 20)
        assert stats["files_before"] == 32
        assert stats["files_after"] < 32
        import math

        assert stats["files_after"] == max(
            1, math.ceil(stats["bytes_before"] / (1 << 20))
        )
        a = sorted(map(tuple, spark.read.parquet(src).collect()))
        b = sorted(map(tuple, spark.read.parquet(dst).collect()))
        assert a == b

    def test_catalog_entry_self_checks(self, spark):
        from virapipe_spark.queries.dataflow import files_compaction

        row = files_compaction(spark, "/root/testdata/sf0.001").collect()[0]
        assert row["shrunk"] and row["rows_match"] and row["checksum_match"]
        assert row["before_rows"] == row["after_rows"] > 0
