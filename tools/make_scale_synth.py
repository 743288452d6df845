"""Generate a deterministic N-fold scale-up of a testdata directory.

Key-offset replication: each replica r shifts a table's PRIMARY key by
r * stride so the result has N x the rows (keys disjoint across
replicas), with no RNG anywhere. Foreign keys are offset ONLY when the
referenced table is itself replicated (l_orderkey <-> o_orderkey);
FKs into the verbatim-copied dims (l_partkey, l_suppkey, o_custkey)
are kept UN-offset so fact-to-dim joins retain every replica row —
each dim key simply owns N x the fact rows, the fixed-dims scale-up
shape. Documents get a per-replica tail token so text-similarity
entries see NEAR-duplicates across replicas (the realistic
mass-duplication regime) instead of exact copies, and n_chars is
recomputed as length(text) so the metadata stays consistent with the
perturbed text; embeddings keep their vectors (ANN entries tolerate
ties). Small dims (region/nation/customer/supplier/part) are copied
verbatim — entries reading ONLY those tables therefore have no honest
N-fold point against this layout, and dim-grouped aggregates over
facts see N x rows per group rather than N x groups.

``--scale-dims`` switches to the TPC-H-faithful layout: customer,
supplier and part replicate with the same key-offset scheme AND the
fact FKs offset to match (joins stay total, N x groups instead of
N x rows-per-group), giving dim-reading entries (window_ntile_cume,
supplier_stable_matching, the q-series dim rollups) an honest N-fold
point. region/nation stay verbatim in both modes — TPC-H fixes them
at 5/25 rows at every SF.

Used for the round-10 decade-out smoke (SCALE.md): entries run
against the output directory via catalog.QUERIES[name](spark, out).

Usage:
    python tools/make_scale_synth.py [--scale-dims] [src_dir] [out_dir] [replicas]
    # defaults: /root/testdata/sf0.1 /tmp/sf1.0-synth 10
"""

import shutil
import sys

import duckdb

DIM_TABLES = ("region", "nation", "customer", "supplier", "part")


def generate(src: str, out: str, reps: int, scale_dims: bool = False) -> None:
    con = duckdb.connect()
    rep = f"(SELECT unnest(generate_series(0, {reps - 1})) AS r)"
    # Guard every offset key against its stride BEFORE writing: TPC-H
    # keys are sparse (o_orderkey max = 6M x SF), so a source above
    # ~sf0.25 would overflow the 1.5M orderkey stride and replicas
    # would silently collide (duplicate keys, fan-out joins, wrong
    # counts). An assert turns that into an error.
    strides = {
        ("lineitem", "l_orderkey"): 1500000,
        ("orders", "o_orderkey"): 1500000,
        ("documents", "doc_id"): 100000,
        ("embeddings", "vec_id"): 100000,
        ("events", "event_id"): 1000000,
        ("events", "user_id"): 100000,
    }
    if scale_dims:
        strides.update({
            ("customer", "c_custkey"): 150000,
            ("part", "p_partkey"): 200000,
            ("supplier", "s_suppkey"): 10000,
            ("lineitem", "l_partkey"): 200000,
            ("lineitem", "l_suppkey"): 10000,
            ("orders", "o_custkey"): 150000,
        })
    for (t, key), stride in strides.items():
        mx = con.execute(
            f"SELECT max({key}) FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
        if mx is not None and mx >= stride:
            raise ValueError(
                f"{t}.{key} max {mx} >= replica stride {stride}: replicas "
                f"would collide — this source SF is too large for the "
                f"built-in strides"
            )
    dim_fk = {
        "l_partkey": "l_partkey + r * 200000 AS l_partkey",
        "l_suppkey": "l_suppkey + r * 10000 AS l_suppkey",
        "o_custkey": "o_custkey + r * 150000 AS o_custkey",
    } if scale_dims else {
        "l_partkey": "l_partkey",
        "l_suppkey": "l_suppkey",
        "o_custkey": "o_custkey",
    }
    specs = {
        "lineitem": f"""
          SELECT l_orderkey + r * 1500000 AS l_orderkey,
                 {dim_fk["l_partkey"]}, {dim_fk["l_suppkey"]},
                 l_linenumber, l_quantity, l_extendedprice, l_discount,
                 l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{src}/lineitem.parquet'), {rep}""",
        "orders": f"""
          SELECT o_orderkey + r * 1500000 AS o_orderkey,
                 {dim_fk["o_custkey"]},
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM read_parquet('{src}/orders.parquet'), {rep}""",
        "documents": f"""
          SELECT doc_id + r * 100000 AS doc_id,
                 text, lang, source,
                 length(text) AS n_chars
          FROM (
            SELECT doc_id, r,
                   CASE WHEN r = 0 THEN text
                        ELSE text || ' rep' || r || 'tok' || (doc_id % 7)
                   END AS text,
                   lang, source
            FROM read_parquet('{src}/documents.parquet'), {rep}
          )""",
        "embeddings": f"""
          SELECT vec_id + r * 100000 AS vec_id, embedding, label
          FROM read_parquet('{src}/embeddings.parquet'), {rep}""",
        "events": f"""
          SELECT event_id + r * 1000000 AS event_id, ts,
                 user_id + r * 100000 AS user_id, event_type, value, props
          FROM read_parquet('{src}/events.parquet'), {rep}""",
    }
    if scale_dims:
        # replicated dims: name-bearing columns get a replica tag so
        # replicas are distinct entities, keys offset to match the fact
        # FK offsets above; nationkeys stay in-domain (nation verbatim)
        specs["customer"] = f"""
          SELECT c_custkey + r * 150000 AS c_custkey,
                 CASE WHEN r = 0 THEN c_name
                      ELSE c_name || '#rep' || r END AS c_name,
                 c_nationkey, c_acctbal, c_mktsegment
          FROM read_parquet('{src}/customer.parquet'), {rep}"""
        specs["supplier"] = f"""
          SELECT s_suppkey + r * 10000 AS s_suppkey,
                 CASE WHEN r = 0 THEN s_name
                      ELSE s_name || '#rep' || r END AS s_name,
                 s_nationkey, s_acctbal
          FROM read_parquet('{src}/supplier.parquet'), {rep}"""
        specs["part"] = f"""
          SELECT p_partkey + r * 200000 AS p_partkey,
                 CASE WHEN r = 0 THEN p_name
                      ELSE p_name || '#rep' || r END AS p_name,
                 p_brand, p_type, p_size, p_retailprice
          FROM read_parquet('{src}/part.parquet'), {rep}"""
    for t, q in specs.items():
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)
    for t in DIM_TABLES:
        if t in specs:
            continue
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        print(t, "copied (dim — no N-fold point)")


if __name__ == "__main__":
    import os

    args = [a for a in sys.argv[1:] if a != "--scale-dims"]
    scale_dims = "--scale-dims" in sys.argv[1:]
    src = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/sf1.0-synth"
    reps = int(args[2]) if len(args) > 2 else 10
    os.makedirs(out, exist_ok=True)
    generate(src, out, reps, scale_dims=scale_dims)
