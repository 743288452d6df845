"""Generate a SKEWED variant of a testdata directory — same tables,
same row counts, hot keys injected deterministically — so skew
sensitivity can be measured separately from volume (the decade-out
smokes in make_scale_synth.py are uniform-key by construction; a 100 TB
corpus is not).

Hot-key injection (all modulo-based, no RNG, volume unchanged):

- documents: a ``hot`` fraction of docs (doc_id % 100 < pct) get ONE
  identical text — the mass-duplication regime (crawl mirrors,
  boilerplate pages). Exercises the hot md5 group in exact dedup, the
  hot band bucket in MinHash-LSH (candidate pairs grow with the square
  of the bucket), the giant component in cluster resolution, and hot
  document-frequency terms in BM25. n_chars is recomputed to stay
  consistent.
- events: the same fraction of events are reassigned to ONE user —
  the hot-entity regime (a bot account, a monitoring client).
  Exercises per-user aggregation/ranking paths.
- lineitem: the same fraction of lines are repointed at ONE part —
  the hot-join-key regime (a best-seller SKU). Exercises fact-to-dim
  joins and part-grain aggregates; the directed salted_join A/B in
  the skew smoke uses this key.
- embeddings: the same fraction of vectors become ONE vector — the
  hot-bucket regime for sign-LSH / IVF (near-duplicate embeddings of
  boilerplate text all hash to one cell).
- everything else is copied verbatim.

The hot entities are chosen as existing keys (min part key, a fixed
user id) so referential integrity is untouched.

Usage:
    python tools/make_skew_synth.py [src_dir] [out_dir] [hot_pct]
    # defaults: /root/testdata/sf0.1 /tmp/sf0.1-skew 30
"""

import os
import shutil
import sys

import duckdb

#: ~40 tokens so shingling (trigram), quality stats and BM25 see a
#: realistic document, not a degenerate one-token string.
HOT_TEXT = (
    "the quick brown fox jumps over the lazy dog while the busy crawler "
    "archives the same boilerplate page again and again across mirrors "
    "footer terms privacy contact copyright all rights reserved home "
    "about products pricing support careers blog sitemap login signup"
)

VERBATIM = ("region", "nation", "customer", "supplier", "part", "orders")


def generate(src: str, out: str, hot_pct: int) -> None:
    con = duckdb.connect()
    hot_part = con.execute(
        f"SELECT min(p_partkey) FROM read_parquet('{src}/part.parquet')"
    ).fetchone()[0]
    hot_user = con.execute(
        f"SELECT min(user_id) FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]
    specs = {
        "documents": f"""
          SELECT doc_id,
                 CASE WHEN doc_id % 100 < {hot_pct}
                      THEN '{HOT_TEXT}' ELSE text END AS text,
                 lang, source,
                 length(CASE WHEN doc_id % 100 < {hot_pct}
                             THEN '{HOT_TEXT}' ELSE text END) AS n_chars
          FROM read_parquet('{src}/documents.parquet')""",
        "events": f"""
          SELECT event_id, ts,
                 CASE WHEN event_id % 100 < {hot_pct}
                      THEN {hot_user} ELSE user_id END AS user_id,
                 event_type, value, props
          FROM read_parquet('{src}/events.parquet')""",
        "lineitem": f"""
          SELECT l_orderkey,
                 CASE WHEN l_orderkey % 100 < {hot_pct}
                      THEN {hot_part} ELSE l_partkey END AS l_partkey,
                 l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{src}/lineitem.parquet')""",
        "embeddings": f"""
          SELECT e.vec_id,
                 CASE WHEN e.vec_id % 100 < {hot_pct}
                      THEN h.embedding ELSE e.embedding END AS embedding,
                 e.label
          FROM read_parquet('{src}/embeddings.parquet') e
          CROSS JOIN (
            SELECT embedding FROM read_parquet('{src}/embeddings.parquet')
            ORDER BY vec_id LIMIT 1
          ) h""",
    }
    for t, q in specs.items():
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n, hot = con.execute(
            f"SELECT count(*), count(*) FILTER (WHERE {'doc_id' if t == 'documents' else 'event_id' if t == 'events' else 'l_orderkey' if t == 'lineitem' else 'vec_id'} % 100 < {hot_pct}) "
            f"FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: {n} rows, {hot} hot ({100 * hot / n:.0f}%)")
    for t in VERBATIM:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        print(t, "copied verbatim")


if __name__ == "__main__":
    args = sys.argv[1:]
    src = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/sf0.1-skew"
    hot_pct = int(args[2]) if len(args) > 2 else 30
    os.makedirs(out, exist_ok=True)
    generate(src, out, hot_pct)
