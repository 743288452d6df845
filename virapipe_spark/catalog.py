"""Named-query catalog: the driver-facing registry of engine operations.

Every operator from SURVEY.md §2 (plus the training-data extensions) is
registered here as a named query: a ``(spark, sf_dir) -> DataFrame``
callable, optionally paired with an equivalent ANSI-SQL oracle string
runnable by DuckDB over the same parquet tables. The driver compares the
two (row count + schema + order-insensitive value hash) at sf=0.01.

Conventions that keep the comparison honest:

- Every computed/aggregate column is aliased identically on both sides.
- Double aggregates are rounded (2-4 dp) on both sides — float sums are
  order-dependent, and Spark and DuckDB reduce in different orders.
- Top-k queries order by a unique tie-break key so the row set is
  deterministic.
- Timestamps are pinned to UTC (session.py) and compared as-is.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Parquet tables the driver provides at each scale factor.
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-provided parquet table.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    rejects by default; read it as a long (nanos) and truncate to a
    proper microsecond timestamp — the same truncation DuckDB applies.
    """
    if name == "events":
        from pyspark.sql import functions as F

        # The driver builds a bare SparkSession that never goes through
        # session.py's DEFAULT_CONF, so set the nanos conf here too — it is
        # runtime-settable and must be in place *before* the parquet read
        # or Spark raises PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB-equivalent
    SQL (omit for non-SQL-expressible ops -> rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from virapipe_spark.queries import (  # noqa: F401
        relational,
        genomics,
        dataflow,
        extensions,
        streaming,
        multimodal,
    )


#: Hash-verified by the driver in round 3 (CORRECTNESS_r03.json keys).
_VERIFIED_R03 = frozenset(
    """
    agg_cube agg_percentiles agg_pivot agg_rollup agg_string_concat
    codon_usage count_distinct dedup_distinct_rows dedup_first_per_key
    fasta_format_lines filter_avg_quality filter_lowq_count
    filter_predicate filter_regexp group_having_band join_broadcast_dims
    join_full_outer join_inner_agg join_left_anti join_left_outer
    join_left_semi join_null_safe join_salted_skew join_threshold_filter
    kmer_count_band kmer_unique_set mate_pivot normalize_digital
    orderby_limit orf_six_frame q14_promo_share q1_pricing_summary
    q3_shipping_priority q5_local_supplier_volume rename_unique
    revcomp_projection sample_group_count scan_project set_except
    set_except_all set_intersect set_union set_union_by_name
    sql_passthrough window_lag_gap window_ntile_cume window_running_sum
    window_time_range_avg window_topk_per_group window_topk_salted
    """.split()
)

#: Verified in rounds 1-2 but displaced out of round 3's 50-entry window.
_VERIFIED_EARLIER = frozenset(
    """
    coalesce_merge docs_dedup_clusters docs_exact_dedup docs_minhash_lsh
    docs_ngram_jaccard docs_quality_filter docs_simhash
    docs_simhash_neardup docs_text_stats files_listing interleave_zip
    reads_fwd_rev_split repartition_scan sam_flag_filter taxonomy_filter
    """.split()
)


def ordered_queries() -> dict[str, QueryFn]:
    """``QUERIES`` reordered so the driver's correctness window is spent
    on unproven entries first.

    The driver hash-checks only the first 50 entries of
    ``__spark_entry__.queries()`` in iteration order. Tiering: (0) never
    driver-verified in any round — including queries added this round —
    then (1) verified in r01/r02 but displaced from r03's window, then
    (2) green in r03. Registration order is preserved within a tier, so
    the composition of each round's checked set is deterministic and the
    union over rounds converges to full catalog coverage.
    """

    def tier(name: str) -> int:
        if name in _VERIFIED_R03:
            return 2
        if name in _VERIFIED_EARLIER:
            return 1
        return 0

    names = sorted(QUERIES, key=lambda n: tier(n))  # stable sort
    return {n: QUERIES[n] for n in names}
