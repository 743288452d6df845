"""BAM binary source: BGZF container + BAM record layout, pure stdlib.

Closes the read side of the reference's BAM surface with an actual
binary parser (the catalog's ``sam_scan_roundtrip`` covers the TEXT
path; until round 6 binary BAM was wholly scoped out). Both layers are
public spec (SAM/BAM specification v1, hts-specs): BGZF is a series of
gzip members whose FEXTRA ``BC`` subfield carries the compressed block
size, and the BAM payload is a little-endian record stream. Python's
stdlib handles both — ``gzip`` decodes concatenated members natively,
``zlib``/``struct`` build them — so unlike JPEG/MP3/H.264 this needs no
external library and is REAL, not stubbed.

Reference counterpart: the reference reads BAM through hadoop-bam
(DecompressInterleave.java:59-86, HDFSWriter.java:109-149); this module
replaces that dependency with ~150 lines over Spark's ``binaryFile``
source.

Write side: ``encode_bam``/``bgzf_compress`` exist and round-trip (they
build the reader's test fixtures), but the engine's production
alignment SINK remains SAM text (``io.write_sam``) per SURVEY §2.2 —
emitting indexed, spec-complete BAM (bai/csi, full tag preservation)
stays external-tool territory.

Scale notes:

- ``read_bam`` parallelizes per FILE (Spark's ``binaryFile`` model —
  one task per .bam), the right grain for alignment stores, which shard
  into many files. Sub-file splitting is what BGZF's BSIZE index
  enables; a cluster deployment that needs it adds a block-offset
  manifest and mapPartitions over (file, offset) ranges — same decode
  core.
- The decode is one Arrow-batched ``mapInPandas`` whose input rows are
  whole files; payload bytes cross the Python boundary once per file.
  ``binaryFile`` pushes ``pathGlobFilter`` down, and the driver never
  touches content bytes.
"""

from __future__ import annotations

import gzip
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

#: 4-bit sequence codes, SAM spec table (0-15).
_SEQ16 = "=ACMGRSVTWYHKDBN"
_CIGAR_OPS = "MIDNSHP=X"

#: BGZF end-of-file marker: a fixed empty member every writer appends.
_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def bgzf_compress(data: bytes, block_size: int = 60000) -> bytes:
    """Pack ``data`` into BGZF: gzip members of <= ``block_size``
    payload bytes, each carrying the spec's ``BC`` extra subfield
    (total member length - 1), terminated by the EOF marker member."""
    out = bytearray()
    for off in range(0, len(data), block_size):
        chunk = data[off : off + block_size]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        deflated = co.compress(chunk) + co.flush()
        # 12-byte gzip header + 6-byte extra (XLEN=6) + payload + crc + isize
        bsize = 12 + 6 + len(deflated) + 8
        member = (
            b"\x1f\x8b\x08\x04"          # magic, deflate, FEXTRA
            + b"\x00\x00\x00\x00"        # mtime
            + b"\x00\xff"                # XFL, OS=unknown
            + struct.pack("<H", 6)       # XLEN
            + b"BC" + struct.pack("<HH", 2, bsize - 1)
            + deflated
            + struct.pack("<II", zlib.crc32(chunk) & 0xFFFFFFFF, len(chunk))
        )
        assert len(member) == bsize
        out += member
    out += _BGZF_EOF
    return bytes(out)


def bgzf_decompress(data: bytes) -> bytes:
    """Inflate a BGZF stream. gzip-the-module decodes concatenated
    members (BGZF members are valid gzip), and the EOF marker inflates
    to zero bytes, so the whole container is one call."""
    return gzip.decompress(data)


def encode_bam(header_text: str, refs: list[tuple[str, int]],
               records: list[dict], block_size: int = 60000) -> bytes:
    """Serialize alignment records into a BGZF-wrapped BAM stream.

    ``records`` dicts carry: read_name, ref_id, pos (0-based), flag,
    mapq, cigar (string, e.g. '32M'), seq (ACGT... string). Quality is
    written as 0xFF (missing) — the text sink owns quality-bearing
    output. Tags are not emitted (reader skips them by block_size)."""
    body = bytearray(b"BAM\x01")
    text = header_text.encode()
    body += struct.pack("<i", len(text)) + text
    body += struct.pack("<i", len(refs))
    for name, l_ref in refs:
        nb = name.encode() + b"\x00"
        body += struct.pack("<i", len(nb)) + nb + struct.pack("<i", l_ref)
    for r in records:
        name = r["read_name"].encode() + b"\x00"
        cig = _encode_cigar(r["cigar"])
        seq = _encode_seq(r["seq"])
        l_seq = len(r["seq"])
        rec = (
            struct.pack(
                "<iiBBHHHiiii",
                r["ref_id"],
                r["pos"],
                len(name),
                r.get("mapq", 60),
                0,  # bin: unused by this reader
                len(cig) // 4,
                r["flag"],
                l_seq,
                -1,  # next_refID
                -1,  # next_pos
                0,  # tlen
            )
            + name
            + cig
            + seq
            + b"\xff" * l_seq  # qual missing
        )
        body += struct.pack("<i", len(rec)) + rec
    return bgzf_compress(bytes(body), block_size)


def _encode_cigar(cigar: str) -> bytes:
    out = bytearray()
    n = ""
    for ch in cigar:
        if ch.isdigit():
            n += ch
        else:
            out += struct.pack("<I", (int(n) << 4) | _CIGAR_OPS.index(ch))
            n = ""
    return bytes(out)


def _encode_seq(seq: str) -> bytes:
    codes = [_SEQ16.index(c) for c in seq]
    if len(codes) % 2:
        codes.append(0)
    return bytes((codes[i] << 4) | codes[i + 1] for i in range(0, len(codes), 2))


def decode_bam(data: bytes) -> tuple[str, list[tuple[str, int]], list[dict]]:
    """Parse a BGZF-wrapped BAM stream into (header_text, refs,
    records); records carry the fields the ``alignments`` schema needs
    (read_name, ref_id, pos, flag, cigar, seq). Trailing per-record
    tag bytes are skipped via block_size, per spec."""
    raw = bgzf_decompress(data)
    if raw[:4] != b"BAM\x01":
        raise ValueError("not a BAM stream (bad magic)")
    (l_text,) = struct.unpack_from("<i", raw, 4)
    pos = 8 + l_text
    header_text = raw[8 : pos].decode(errors="replace")
    (n_ref,) = struct.unpack_from("<i", raw, pos)
    pos += 4
    refs: list[tuple[str, int]] = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", raw, pos)
        name = raw[pos + 4 : pos + 4 + l_name - 1].decode()
        (l_ref,) = struct.unpack_from("<i", raw, pos + 4 + l_name)
        refs.append((name, l_ref))
        pos += 8 + l_name
    records: list[dict] = []
    while pos + 4 <= len(raw):
        (block_size,) = struct.unpack_from("<i", raw, pos)
        base = pos + 4
        (
            ref_id,
            rpos,
            l_read_name,
            mapq,
            _bin,
            n_cigar,
            flag,
            l_seq,
            _nref,
            _npos,
            _tlen,
        ) = struct.unpack_from("<iiBBHHHiiii", raw, base)
        p = base + 32
        read_name = raw[p : p + l_read_name - 1].decode()
        p += l_read_name
        cigar = ""
        for _ in range(n_cigar):
            (op,) = struct.unpack_from("<I", raw, p)
            cigar += f"{op >> 4}{_CIGAR_OPS[op & 0xF]}"
            p += 4
        nbytes = (l_seq + 1) // 2
        seq = "".join(
            _SEQ16[(raw[p + i // 2] >> (4 if i % 2 == 0 else 0)) & 0xF]
            for i in range(l_seq)
        )
        records.append(
            {
                "read_name": read_name,
                "ref_id": ref_id,
                "pos": rpos,
                "mapq": mapq,
                "flag": flag,
                "cigar": cigar,
                "seq": seq,
            }
        )
        pos = base + block_size
    return header_text, refs, records


def read_bam(spark: SparkSession, path: str) -> DataFrame:
    """Read BGZF-compressed binary BAM files into the ``alignments``
    schema — column-identical to ``io.read_sam`` (readName, start
    [1-based, per SAM text semantics], referenceName [resolved through
    the file's own reference dictionary], length, bases, cigar,
    readUnmapped, duplicateRead), so the two sources interchange.

    Plan: ``binaryFile`` scan (one task per file; driver sees paths
    only) -> one Arrow-batched mapInPandas decoding whole files. An
    unmapped record (ref_id == -1) gets a null referenceName, matching
    the text reader's permissive-null convention."""
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    schema = T.StructType(
        [
            T.StructField("readName", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("referenceName", T.StringType()),
            T.StructField("length", T.IntegerType()),
            T.StructField("bases", T.StringType()),
            T.StructField("cigar", T.StringType()),
            T.StructField("readUnmapped", T.BooleanType()),
            T.StructField("duplicateRead", T.BooleanType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                _text, refs, recs = decode_bam(bytes(content))
                for r in recs:
                    rows.append(
                        (
                            r["read_name"],
                            r["pos"] + 1,
                            refs[r["ref_id"]][0] if r["ref_id"] >= 0 else None,
                            len(r["seq"]),
                            r["seq"],
                            r["cigar"],
                            bool(r["flag"] & 0x4),
                            bool(r["flag"] & 0x400),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bam")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(gen, schema)


def write_bam(
    df: DataFrame,
    path: str,
    header_text: str = "@HD\tVN:1.6\tSO:unsorted\n",
    block_size: int = 60000,
) -> None:
    """Distributed BINARY BAM sink — closes the one reference feature
    SURVEY §2.2 had scoped out (HDFSWriter.java:247-315 writes BAM
    per-partition through the HDFS client; this is the same shape over
    the alignments schema): each partition serializes its rows through
    :func:`encode_bam` (BAM record layout + BGZF container) into one
    ``part-NNNNN.bam`` shard under ``path``.

    The reference dictionary is derived from the data (distinct
    referenceName with l_ref = max aligned end) in one small aggregate
    and collected — control-plane only, bounded by the number of
    references (a genome's contig list), never row data; it becomes
    both the BAM header dictionary and the name->ref_id index shipped
    to executors in the task closure.

    Scale: one aggregate shuffle keyed on referenceName, then a single
    embarrassingly-parallel pass — no shuffle, no driver row traffic;
    shard count = partition count (repartition upstream to size
    shards). Local-mode assumption shared with scratch_dir: the
    executor-side ``open()`` targets a filesystem all tasks share; on
    a real cluster this handle is the distributed-FS output stream
    (exactly the reference's HDFS FSDataOutputStream), the only line
    that changes. Quality bytes are written as missing (0xFF) per
    encode_bam — the SAM text sink owns quality-bearing output."""
    import os

    from pyspark import TaskContext
    from pyspark.sql import functions as F

    refs = sorted(
        # l_ref aggregates to NULL when a reference's rows all have
        # null start/bases — keep the reference in the dictionary with
        # the spec-minimum length 1 rather than TypeError-ing on the
        # driver (ADVICE r6).
        (r["referenceName"], int(r["l_ref"]) if r["l_ref"] is not None else 1)
        for r in df.filter(F.col("referenceName").isNotNull())
        .groupBy("referenceName")
        .agg(
            F.max(F.col("start") - 1 + F.length("bases")).alias("l_ref")
        )
        .collect()
    )
    ref_index = {name: i for i, (name, _) in enumerate(refs)}
    os.makedirs(path, exist_ok=True)

    def _write_partition(rows) -> None:
        recs = []
        for r in rows:
            # permissive-null convention, sink side: the SAM reader
            # nulls malformed fields rather than erroring; the binary
            # sink maps them to the spec's missing markers ("*" name,
            # zero-length seq, empty CIGAR) instead of crashing an
            # executor mid-shard on one bad row.
            recs.append(
                {
                    "read_name": r["readName"] or "*",
                    "ref_id": ref_index.get(r["referenceName"], -1),
                    "pos": (int(r["start"]) - 1) if r["start"] is not None else -1,
                    "flag": (0x4 if r["readUnmapped"] else 0)
                    | (0x400 if r["duplicateRead"] else 0),
                    "cigar": r["cigar"] or "",
                    "seq": r["bases"] or "",
                }
            )
        if not recs:
            return
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        blob = encode_bam(header_text, refs, recs, block_size)
        # temp-file + atomic rename: a failed/retried/speculative task
        # must never leave a truncated shard, and the LAST completed
        # attempt wins the final name (rename is atomic within a POSIX
        # dir; on a real cluster this is the FileOutputCommitter's
        # _temporary/attempt dance — same contract) (ADVICE r6).
        final = os.path.join(path, f"part-{pid:05d}.bam")
        tmp = os.path.join(
            path, f".part-{pid:05d}.attempt-{ctx.taskAttemptId()}.tmp"
        )
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, final)

    df.select(
        "readName",
        "start",
        "referenceName",
        "bases",
        "cigar",
        "readUnmapped",
        "duplicateRead",
    ).foreachPartition(_write_partition)
