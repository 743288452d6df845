"""The remaining TPC-H query shapes (q2, q8, q9, q11, q13, q15, q16,
q17, q20, q21) — completing the full 22-query sweep over the driver's
TPC-H-ish tables.

The driver schema is reduced (no partsupp, no commit/receipt dates, no
comments), so each query keeps the SPEC'S PLAN SHAPE — the correlated
subquery, the scalar-aggregate HAVING, the nested-IN, the
EXISTS/NOT-EXISTS pair — while adapting the predicates to the columns
that exist. Where spec queries need the part-supplier relation,
``lineitem (l_partkey, l_suppkey)`` serves as the bridge (the natural
adaptation: every observed supply pairing). Each adaptation is noted in
its docstring.

These are the decorrelation benchmarks of the relational surface: the
reference's free-SQL passthrough (SQLQueryBlast.java:95-121,
SQLQueryFastq.java:95-110) accepts arbitrary SQL of exactly these
shapes, so the engine must plan them well — Spark-first that means
rewriting every correlated subquery as an aggregate + equi-join and
every scalar subquery as a 1-row broadcast, never a per-row re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from virapipe_spark.catalog import query, table


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ), eu AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT p_partkey, p_name, s_name, n_name, unit_cost AS min_cost
    FROM part
    JOIN cost ON p_partkey = partkey
    JOIN eu ON suppkey = s_suppkey
    WHERE p_type = 'STANDARD' AND p_size <= 25
      AND unit_cost = (
        SELECT min(c2.unit_cost)
        FROM cost c2 JOIN eu e2 ON c2.suppkey = e2.s_suppkey
        WHERE c2.partkey = p_partkey
      )
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the correlated scalar-MIN subquery: for each
    qualifying part, the European supplier(s) offering it at the lowest
    unit cost. No partsupp table exists, so unit cost derives from
    observed lineitems: min(l_extendedprice / l_quantity) per
    (part, supplier) — the same correlated-min-then-equality-join plan
    as spec Q2.

    Scale: decorrelated bottom-up — one shuffle aggregates lineitem to
    the (part, supplier) cost relation; the European supplier dim is a
    ~100-row broadcast filter; a second aggregate (shuffle keyed on
    partkey alone, input already cost-sized) finds the per-part min;
    the equality join back is partkey-keyed. min() is a selection (not
    a float sum) over IEEE divisions of identical operands, so the
    double compares — and hashes — bitwise-equal cross-engine; it is
    deliberately NOT display-rounded (rounding a quotient at 4dp hit a
    multiplication-error boundary at sf0.1: 119.91625 rounded .9162 in
    Spark, .9163 in DuckDB).
    Nothing correlates per-row: the subquery runs once as an aggregate,
    exactly what a decorrelating planner produces."""
    li = table(spark, sf_dir, "lineitem")
    cost = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    eu_cost = cost.join(
        F.broadcast(eu), F.col("suppkey") == F.col("s_suppkey")
    )
    per_part_min = eu_cost.groupBy("partkey").agg(
        F.min("unit_cost").alias("min_unit_cost")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 25)
    )
    return (
        eu_cost.join(
            per_part_min,
            (eu_cost["partkey"] == per_part_min["partkey"])
            & (F.col("unit_cost") == F.col("min_unit_cost")),
        )
        .drop(per_part_min["partkey"])
        .join(p, F.col("partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.col("unit_cost").alias("min_cost"),
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_7'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's fraction of
    PROMO-part revenue sold into a region, per order year — the widest
    join tree in the suite (8 relations, two roles for nation) with a
    conditional-sum ratio on top.

    Scale: part, supplier, and both nation legs broadcast (dims);
    lineitem⋈orders is the only fact-fact shuffle, keyed on orderkey,
    with the date filter pushed to the orders scan and the part-type
    filter shrinking lineitem via the broadcast-hash probe before the
    shuffle. The share is a same-group ratio of two conditional sums —
    computed in one aggregate pass, no second scan, no self-join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = _revenue()
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    )
    return joined.groupBy(
        F.year("o_orderdate").alias("o_year")
    ).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(0.0))
            / F.sum(vol),
            4,
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           ((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             + 50) // 100) / 100.0 AS sum_profit
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): revenue on parts whose
    name matches a substring, rolled up by supplier nation x order
    year. The spec's profit subtracts ps_supplycost * l_quantity; with
    no partsupp table the measure is discounted revenue — the plan
    shape (LIKE-filtered dim driving a 5-relation join into a two-key
    rollup) is unchanged. Revenue sums in exact integer 1e-4-dollar
    units (price and discount are 2dp by data contract), because these
    nation-year groups are large enough that a float sum's reduce-order
    jitter crosses 2dp rounding boundaries cross-engine (observed:
    3042368.2849 vs ...2850). The half-up to cents also happens in
    integer arithmetic ((s+50) div 100) — engine round() on a double
    ...945 is itself rounding-mode-divergent (Java rounds the shortest
    decimal repr up, DuckDB rounds the binary value down) — leaving a
    single exact int/100.0 division for display.

    Scale: the LIKE prunes part to ~1/8 before broadcast, so the
    broadcast-hash probe discards non-matching lineitems at scan speed;
    lineitem⋈orders is the one fact shuffle (orderkey). The infix LIKE
    can't prune the parquet scan of part (no prefix) — irrelevant at
    scale, part is the small side."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (
                    F.lit(100)
                    - F.round(F.col("l_discount") * 100).cast("long")
                )
            ).alias("s4")
        )
        .select(
            "nation",
            "o_year",
            (F.expr("(s4 + 50) div 100") / F.lit(100.0)).alias("sum_profit"),
        )
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH scoped AS (
      SELECT l_partkey, l_extendedprice
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
    )
    SELECT l_partkey AS partkey, round(sum(l_extendedprice), 2) AS value
    FROM scoped
    GROUP BY l_partkey
    HAVING sum(l_extendedprice) > (
      SELECT 2.0 * sum(l_extendedprice) / count(DISTINCT l_partkey)
      FROM scoped
    )
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value within one
    region's suppliers, kept only where it exceeds a multiple of the
    GLOBAL MEAN part value — the scalar-subquery-in-HAVING pattern.
    Value is lineitem revenue (no partsupp availqty/supplycost in this
    schema), and the threshold is 2x the mean rather than the spec's
    fixed global fraction because a fixed fraction empties as the part
    population grows with scale factor (0 rows at sf0.1); the relative
    threshold keeps a stable qualifying tail at every SF — the
    scale-correct form of the same plan.

    Scale: the scoped fact is aggregated once (shuffle keyed on
    partkey, map-side partials); the global total is the SAME
    aggregate re-reduced to one row and cross-joined back — a 1-row
    broadcast, the plan a decorrelator produces. No per-row re-scan,
    no second pass over lineitem: the threshold compares partkey-level
    sums (float-stable at 2dp under the rounding convention, and the
    0.001 threshold sits far from any group's rounding boundary)."""
    li = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    scoped = li.join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("l_partkey", "l_extendedprice")
    per_part = scoped.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("l_extendedprice").alias("raw_value")
    )
    total = per_part.agg(
        (F.lit(2.0) * F.sum("raw_value") / F.count("partkey")).alias(
            "threshold"
        )
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select("partkey", F.round("raw_value", 2).alias("value"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): histogram of
    order counts per customer INCLUDING zero-order customers — the
    left-outer-join-with-residual-predicate + double aggregation
    pattern. The spec excludes orders by comment pattern; no o_comment
    exists, so the residual excludes the '5-LOW' priority class (same
    join-time — not scan-time — predicate placement: it must not drop
    customer rows).

    Scale: the filter applies to the orders side BEFORE the outer join
    (Catalyst pushes a null-tolerant residual on the preserved side's
    opposite leg to the scan); one shuffle on custkey with map-side
    count partials, then a second tiny shuffle on the ~50 distinct
    counts. count(o_orderkey) (not count(*)) makes unmatched customers
    count 0, exactly the spec's semantics."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    returning the supplier(s) whose revenue EQUALS the global max —
    the view + scalar-MAX-subquery pattern (ties must all surface,
    which is why the spec uses =max, not ORDER BY/LIMIT 1).

    Scale: the revenue view is one filtered aggregate of lineitem
    (shuffle keyed on suppkey); the scalar max re-reduces that ~10^4-row
    aggregate to 1 row and broadcasts back — never a second lineitem
    scan. The equality compares 2dp-ROUNDED revenue on both sides (the
    catalog's float-sum convention), so the cross-engine row set is
    stable; supplier joins by broadcast."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_revenue()), 2).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 500
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) bucket, EXCLUDING a supplier subset
    via NOT IN — the anti-join + multi-key COUNT DISTINCT pattern. The
    spec's exclusion keys on complaint comments; here it keys on low
    account balance (the column that exists). lineitem's
    (l_partkey, l_suppkey) is the part-supplier bridge.

    Scale: the exclusion list is a ~100-row broadcast LEFT ANTI join
    (safe NOT IN rewrite — s_suppkey is non-null by contract, so the
    NULL-semantics trap doesn't bite); part's in-list predicates push
    to its scan before the broadcast probe. COUNT DISTINCT expands to
    the standard two-level aggregate: shuffle once on
    (brand, type, size, suppkey) partials, then re-reduce — no
    distinct-within-group materialization."""
    excluded = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 500)
        .select("s_suppkey")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    li = table(spark, sf_dir, "lineitem").join(
        F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from
    lineitems whose quantity is below 20% of THAT PART'S average — the
    correlated-AVG subquery against the same fact table, reduced to a
    single scalar row (spec divides by 7 for a yearly average; kept for
    fidelity).

    Scale: decorrelated to aggregate + self-equi-join: one pass
    computes avg quantity per partkey (shuffle on partkey, partials
    map-side), then joins back to the brand-filtered lineitems on
    partkey. The per-part aggregate covers ALL parts (spec semantics:
    the average is not brand-filtered) but is only partkey-wide, and
    AQE broadcasts it when small. Quantities are small integers in
    doubles, so sum/count — and hence the 0.2*avg threshold — are
    exact cross-engine."""
    li = table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (F.avg("l_quantity") * F.lit(0.2)).alias("qty_threshold")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("l_partkey") == F.col("avg_pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@query(
    "q20_part_promotion",
    oracle="""
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 50
      )
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in one
    region who moved more than a threshold quantity of some red part
    during 1997 — the NESTED-IN pattern: an IN-subquery whose body is
    itself a grouped HAVING over a join. With no partsupp availqty,
    the spec's "excess stock" test becomes a volume threshold on the
    same (suppkey, partkey) grouping.

    Scale: inside-out — the red-part dim broadcasts into the
    date-pruned lineitem scan, the (suppkey, partkey) aggregate
    shuffles once with map-side partials, and the surviving suppkeys
    re-enter as a LEFT SEMI join (the IN rewrite) against the ~100-row
    supplier dim. Nothing here scales with more than one shuffle of
    the filtered fact."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    movers = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )


@query(
    "q21_waiting_orders",
    oracle="""
    WITH joined AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 75 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ), ord_stats AS (
      SELECT l_orderkey AS ok,
             count(DISTINCT l_suppkey) AS nsupp,
             count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS nlate
      FROM joined GROUP BY 1
    )
    SELECT s_name, n_name, count(*) AS numwait
    FROM joined
    JOIN ord_stats ON l_orderkey = ok
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE is_late = 1 AND nsupp > 1 AND nlate = 1
    GROUP BY s_name, n_name
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for
    finished orders involving MULTIPLE suppliers, count each supplier's
    late lineitems in orders where they were the ONLY late supplier —
    the EXISTS (another supplier) + NOT EXISTS (another LATE supplier)
    double-correlation. No receipt/commit dates exist, so "late" means
    shipped >75 days after the order date.

    Scale: both correlated EXISTS collapse into ONE per-order
    aggregate (distinct-supplier count, distinct-late-supplier count)
    over the already-joined fact — computed once, joined back on
    orderkey. That is strictly cheaper than the textbook plan of two
    separate self-semi/anti-joins of lineitem (three shuffles of the
    fact vs two here), and AQE handles the agg-side broadcast. The
    status filter pushes to the orders scan."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")
        ).alias("is_late"),
    )
    ord_stats = joined.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count_distinct("l_suppkey").alias("nsupp"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("nlate"),
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        joined.filter(F.col("is_late"))
        .join(ord_stats, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count("*").alias("numwait"))
    )
