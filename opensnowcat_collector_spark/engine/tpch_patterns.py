"""TPC-H pattern completion (SURVEY §2.8) — the 12 query shapes not yet
in ``relational.py``: q2/q4/q6/q8/q9/q11/q13/q15/q16/q17/q20/q21.

The synthetic schema (TESTDATA.md) has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate`` columns, so the queries that need them
are *adapted*, keeping the defining plan shape of the original:

- q2  -> groupwise-min correlated subquery (decorrelated to agg + join-back)
- q4  -> EXISTS            -> left-semi join
- q6  -> single-table selective scan-agg (literal — all columns exist)
- q8  -> two-dimension-path market share (conditional ratio per group)
- q9  -> multi-join profit rollup by nation x year
- q11 -> scalar-subquery HAVING threshold (group value vs global total)
- q13 -> left outer join with ON-clause filter + distribution re-agg
- q15 -> argmax via scalar max subquery over a derived revenue view
- q16 -> NOT IN anti-join + count-distinct rollup
- q17 -> correlated per-group average threshold (0.2 * avg)
- q20 -> nested aggregate threshold chained through semi-joins
- q21 -> EXISTS + NOT EXISTS pair on a self-joined fact

Exactness: money sums use the integer-cents discipline of
``relational._cents`` (see that module's doc).  Fractional *thresholds*
(q11's 1%, q17's 0.2x avg, q20's 30%) are rationalized to pure-integer
comparisons (e.g. ``5*qty*cnt < sum``) so the Spark and DuckDB sides
cannot disagree at a float boundary.

Scale notes (100 TB): every query keeps the big fact table on the probe
side of its joins; dimension/aggregate sides are broadcast.  The
groupwise-min/avg/argmax subqueries aggregate BEFORE joining back, so the
join-back input is |groups|, not |fact|.  q21's self-joins are
equi-joins on l_orderkey (shuffle on the same key reused across all
three legs — one exchange, AQE reuses it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _cents, register
from .tables import table


# ---------------------------------------------------------------------------
# q2 pattern — groupwise-min correlated subquery
# ---------------------------------------------------------------------------


@register(
    "q2_minprice_supplier",
    oracle="""
WITH sale AS (
  SELECT l_partkey, l_suppkey,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c
  FROM lineitem
), best AS (
  SELECT l_partkey, MIN(price_c) AS min_c FROM sale GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, s.s_name,
       CAST(sale.price_c AS DOUBLE)/100.0 AS min_price
FROM sale
JOIN best ON sale.l_partkey = best.l_partkey AND sale.price_c = best.min_c
JOIN part p ON p.p_partkey = sale.l_partkey
JOIN supplier s ON s.s_suppkey = sale.l_suppkey
WHERE p.p_size < 10 AND p.p_type = 'STANDARD'
GROUP BY 1, 2, 3, 4
ORDER BY p.p_partkey, s.s_name
LIMIT 100
""",
)
def q2_minprice_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern: for each STANDARD small part, the supplier(s)
    selling it at the minimum observed price.

    The correlated ``price = (SELECT MIN(...) WHERE same part)`` is
    decorrelated the way Catalyst would: aggregate per part first
    (|parts| rows), equi-join back on (partkey, min-cents).  The
    aggregate side scales with |part|, so it carries NO broadcast hint —
    AQE broadcasts it at test scale and falls back to sort-merge on the
    shared partkey shuffle at production scale.  Ties keep every
    witnessing supplier — identical sets on both engines because the
    min is exact integer cents."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") < 10) & (F.col("p_type") == "STANDARD")
    )
    s = table(spark, sf_dir, "supplier")
    sale = l.select(
        "l_partkey", "l_suppkey", _cents(F.col("l_extendedprice")).alias("price_c")
    )
    # groupwise-min derived FROM sale, columns renamed so the join-back is
    # not an ambiguous self-reference (fresh attribute ids on the agg side)
    best = (
        sale.groupBy("l_partkey")
        .agg(F.min("price_c").alias("min_c"))
        .select(F.col("l_partkey").alias("b_partkey"), "min_c")
    )
    return (
        sale.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey")) & (F.col("price_c") == F.col("min_c")),
        )
        .drop("b_partkey", "min_c")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            (F.col("price_c").cast("double") / 100.0).alias("min_price"),
        )
        .distinct()
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q4 pattern — EXISTS as left-semi join
# ---------------------------------------------------------------------------


@register(
    "q4_priority_exists",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 pattern (no l_commitdate in the schema: the EXISTS
    predicate is returnflag='R' instead of commit<receipt).  The EXISTS
    becomes a left-semi join — no duplication of orders no matter how
    many matching lineitems."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q6 — literal forecast-revenue scan-agg
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*10000) AS BIGINT)) AS DOUBLE)/10000.0
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (literal): the canonical fully-pushed-down selective
    scan-agg — no join, no shuffle beyond the final single-row agg.
    ``.explain`` shows all three predicates in PushedFilters and a
    2-column ReadSchema beyond the filter columns."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        (
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"), 10000)).cast("double")
            / 10000.0
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q8 pattern — market share (conditional ratio per group)
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle="""
SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                THEN CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)
                ELSE 0 END) AS DOUBLE)
         / SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT))
         AS mkt_share
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
JOIN region r    ON cn.n_regionkey = r.r_regionkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
WHERE r.r_name = 'EUROPE'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY 1
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 pattern: NATION_3 suppliers' share of EUROPE-customer
    revenue per order year.  Two independent dimension paths (customer->
    nation->region and supplier->nation) both broadcast; the fact
    shuffles once for the orders join.  Numerator and denominator are
    exact cents per group; one double division at the end."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = table(spark, sf_dir, "supplier")
    cn = n.select(
        F.col("n_nationkey").alias("cn_nationkey"), F.col("n_regionkey").alias("cn_regionkey")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("sn_name")
    )
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_nationkey"))
        .join(F.broadcast(r), F.col("cn_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("sn_name") == "NATION_3", rev).otherwise(F.lit(0))).cast(
                    "double"
                )
                / F.sum(rev)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q9 pattern — profit rollup by nation x year
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle="""
SELECT sn.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000.0
         AS sum_profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 pattern (no partsupp => profit is discounted revenue on
    the widget product line).  Part/supplier/nation broadcast; the only
    fact-fact shuffle is lineitem x orders on orderkey."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).cast(
                    "double"
                )
                / 10000.0
            ).alias("sum_profit")
        )
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# q11 pattern — scalar-subquery HAVING threshold
# ---------------------------------------------------------------------------


@register(
    "q11_important_balance",
    oracle="""
WITH value_per_supplier AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS value_c
  FROM lineitem GROUP BY l_suppkey
), total AS (
  SELECT SUM(value_c) AS total_c FROM value_per_supplier
)
SELECT v.l_suppkey AS s_suppkey, s.s_name,
       CAST(v.value_c AS DOUBLE)/10000.0 AS supplier_value
FROM value_per_supplier v
CROSS JOIN total t
JOIN supplier s ON s.s_suppkey = v.l_suppkey
WHERE 100 * v.value_c > t.total_c
ORDER BY v.value_c DESC, s_suppkey
""",
)
def q11_important_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 pattern (no partsupp => supplier lineitem revenue vs the
    global total).  The HAVING threshold ``value > 1% * total`` is the
    integer comparison ``100*value_c > total_c`` — no float boundary.
    The global total is a single-row broadcast; the supplier rollup is
    the only shuffle."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    per = l.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias(
            "value_c"
        )
    )
    total = per.agg(F.sum("value_c").alias("total_c"))
    return (
        per.crossJoin(F.broadcast(total))
        .filter(F.lit(100) * F.col("value_c") > F.col("total_c"))
        .join(F.broadcast(s), per.l_suppkey == s.s_suppkey)
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            (F.col("value_c").cast("double") / 10000.0).alias("supplier_value"),
        )
        .orderBy(F.col("supplier_value").desc(), "s_suppkey")
    )


# ---------------------------------------------------------------------------
# q13 — order-count distribution (outer join with ON-clause filter)
# ---------------------------------------------------------------------------


@register(
    "q13_order_count_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: LEFT OUTER with the filter in the ON clause (a WHERE
    would delete the zero-order customers the query exists to count),
    COUNT(col) null-skipping, then a second tiny re-aggregation of the
    distribution."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# q15 pattern — argmax via scalar max subquery
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_c AS DOUBLE)/10000.0 AS total_revenue
FROM revenue r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_c = (SELECT MAX(total_c) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the revenue view is computed once and reused for both
    the argmax scalar and the final join (Spark reuses the exchange);
    equality against MAX over exact cents keeps ties engine-identical."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    revenue = l.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias(
            "total_c"
        )
    )
    top = revenue.agg(F.max("total_c").alias("max_c"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_c") == F.col("max_c"))
        .join(F.broadcast(s), revenue.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_c").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q16 pattern — NOT IN anti-join + count-distinct rollup
# ---------------------------------------------------------------------------


@register(
    "q16_part_supplier_counts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 50
""",
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 pattern: the NOT IN subquery (suppliers in deficit) is a
    left-anti join — s_suppkey is non-nullable so the null-aware special
    case never triggers; count-distinct per (brand, type, size) expands
    to the usual two-phase distinct aggregate."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q17 pattern — correlated per-group average threshold
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH qty AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS sum_qc,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0/7.0
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN qty  q ON q.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND 5 * CAST(ROUND(l.l_quantity*100) AS BIGINT) * q.cnt < q.sum_qc
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: ``l_quantity < 0.2 * avg(l_quantity per part)``
    rationalized to the exact integer form ``5*qty_c*cnt < sum_qc``
    (multiply both sides by 5*cnt/cents) — no float average, no
    boundary divergence.  The per-part aggregate joins back once; it
    scales with |part| so the broadcast decision is left to AQE (hinting
    it would force a |part|-sized broadcast at 100 TB)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    qty = l.groupBy(F.col("l_partkey").alias("q_partkey")).agg(
        F.sum(_cents(F.col("l_quantity"))).alias("sum_qc"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(qty, l.l_partkey == F.col("q_partkey"))
        .filter(F.lit(5) * _cents(F.col("l_quantity")) * F.col("cnt") < F.col("sum_qc"))
        .agg(
            (F.sum(_cents(F.col("l_extendedprice"))).cast("double") / 100.0 / 7.0).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q20 pattern — nested aggregate threshold chained through semi-joins
# ---------------------------------------------------------------------------


@register(
    "q20_excess_supply",
    oracle="""
WITH part_total AS (
  SELECT l_partkey, SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS total_qc
  FROM lineitem GROUP BY l_partkey
), supp_part AS (
  SELECT l_suppkey, l_partkey, SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS sp_qc
  FROM lineitem GROUP BY l_suppkey, l_partkey
), heavy AS (
  SELECT DISTINCT sp.l_suppkey
  FROM supp_part sp
  JOIN part_total pt ON pt.l_partkey = sp.l_partkey
  JOIN part p ON p.p_partkey = sp.l_partkey
  WHERE p.p_name LIKE 'small%' AND 100 * sp.sp_qc > 15 * pt.total_qc
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
ORDER BY s.s_suppkey
""",
)
def q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 pattern (no partsupp => a supplier 'holds excess stock'
    of a part when it shipped >15% of that part's total volume).  The
    15% threshold is the integer comparison ``100*sp > 15*total``.  Both
    aggregates shuffle on l_partkey-prefixed keys and join on partkey —
    the per-part total scales with |part|, so no broadcast hint (AQE
    decides); the final IN is a semi-join against the tiny distinct
    supplier set."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = table(spark, sf_dir, "supplier")
    part_total = l.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum(_cents(F.col("l_quantity"))).alias("total_qc")
    )
    supp_part = l.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_cents(F.col("l_quantity"))).alias("sp_qc")
    )
    heavy = (
        supp_part.join(part_total, F.col("l_partkey") == F.col("pt_partkey"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .filter(F.lit(100) * F.col("sp_qc") > F.lit(15) * F.col("total_qc"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q21 pattern — EXISTS + NOT EXISTS pair on a self-joined fact
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_supplier",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders o   ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 pattern (returnflag='R' stands in for the missing
    receipt>commit predicate): the supplier who alone returned lines on
    a multi-supplier finalized order.  EXISTS -> left-semi with a
    non-equi suppkey clause; NOT EXISTS -> left-anti.  All three legs
    shuffle on l_orderkey, so the exchange is computed once and reused."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    l1 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    l2 = l.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(l2, (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")), "left_semi")
        .join(
            l3,
            (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")),
            "left_anti",
        )
        .join(o, F.col("ok") == o.o_orderkey)
        .join(F.broadcast(s), F.col("sk") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
