"""Canonical TPC-H query shapes ([EXT], SURVEY.md §2.4 extension):
Q1 (pricing summary), Q3 (shipping-priority top-k), Q4 (EXISTS priority
check), Q7 (volume shipping between two nations), Q10 (returned-item
reporting), Q12 (priority CASE-pivot), Q14 (promo revenue ratio),
Q18 (large-volume customers), Q19 (disjunctive mixed predicate),
Q22 (scalar-subquery + NOT EXISTS). The Q5 shape exists as
q_sql_flagship; together these cover the classic join-agg-topk plan
space every warehouse engine is judged on.

Not in the reference (no relational surface — SURVEY.md §2.4 preamble);
mandated by ``repo:BASELINE.json``'s "same query capabilities at 100 TB"
bar. Money math follows operators/relational.py:13 — exact int64
cent×pct units, one constant division at the end, so Spark and DuckDB
produce bit-identical doubles. Top-k ORDER BYs carry explicit tie-break
keys on both sides so LIMIT is deterministic cross-engine.

The synthetic tables use generated dimension values (nations are
NATION_0..NATION_24, dates span 1995..2001 — see repo:FIXTURES.md), so
the TPC-H constants are re-parameterized accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_aws_firehose_spark.operators.relational import _cents, _pct
from ex_aws_firehose_spark.registry import query
from ex_aws_firehose_spark.tables import load_table

# revenue = extendedprice * (1 - discount), carried as exact int64
# cent·pct units until one final constant division.
_REV_CD = "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"


def _revenue_cd() -> F.Column:
    return _cents("l_extendedprice") * (100 - _pct("l_discount"))


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_REV_CD}) AS BIGINT) / 10000.0 AS revenue,
           o.o_orderdate
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — shipping priority: top-10 unshipped orders of
    one market segment by outstanding revenue. Plan: both date filters
    and the segment filter push into the scans; customer (filtered to
    1/5) joins orders, then lineitem; the final ORDER BY + LIMIT runs
    as TakeOrderedAndProject — each partition keeps its local top-10
    and only 10×|partitions| rows ever reach the driver.

    100 TB shape: the pushed filters prune most of orders/lineitem at
    the scan (with date-partitioned layout, whole partitions — see
    q_layout_zonemap_audit); the group-by shuffles only surviving
    (orderkey, date) pairs, and top-k never materializes a full sort."""
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(_revenue_cd()) / 10000.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REV_CD}) AS BIGINT) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY 1, 2, 3
    """,
    tags=("tpch", "join"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — volume shipping between two trading nations by
    year, both directions. Two *differently-filtered* broadcast copies
    of the nation dim (supplier side and customer side) hang off the
    fact spine; the OR-of-pairs predicate evaluates after both joins.

    100 TB shape: nation broadcasts are free; the pair predicate is
    ~2/25² selective but can only be applied after both nation joins —
    the optimization that matters is semi-joining supplier/customer
    down to the two nations *first* (done here via the pre-filtered
    broadcast dims), which prunes the fact rows before the wide join."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-12-31 00:00:00").cast("timestamp")
    nations = ("NATION_1", "NATION_2")
    n1 = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*nations)
    )
    n2 = n1.select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("n2_name"),
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_nationkey")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(lo, hi)
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .filter(F.col("n_name") != F.col("n2_name"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.col("n2_name").alias("cust_nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((F.sum(_revenue_cd()) / 10000.0).alias("revenue"))
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REV_CD}) AS BIGINT) / 10000.0 AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item reporting: the 20 customers who
    returned the most revenue in one quarter. The quarter filter prunes
    orders at the scan, the returnflag filter prunes lineitem, nation
    broadcasts, and the top-20 is TakeOrdered with c_custkey as the
    deterministic tie-break.

    100 TB shape: group key is the customer (plus its attributes — they
    ride along functionally dependent, adding no cardinality), so the
    agg shuffle is bounded by |customers who returned that quarter|,
    not by lineitem."""
    lo = F.lit("1997-10-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(_revenue_cd()) / 10000.0).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
    )
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_price_cents,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2, 3, 4
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume customers: orders whose total
    line quantity exceeds a threshold, with the customer and order
    attributes attached. The HAVING subquery becomes an aggregate +
    left-semi join on the fact's own key: lineitem aggregates once to
    find qualifying orderkeys (a ~2%-selective set), semi-joins orders
    down, and only then do the wide joins and the re-aggregation run.

    100 TB shape: both lineitem aggregations and the semi join share
    the l_orderkey hash partitioning, so AQE reuses one exchange; the
    qualifying-key set is small enough to ride the broadcast path into
    the orders scan. Quantities sum as exact int64 (values are whole
    numbers stored as doubles — cast before summing)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty")
    )
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
        .select("l_orderkey", "sum_qty")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            _cents("o_totalprice").alias("total_price_cents"),
            "sum_qty",
        )
    )


@query(
    "q_tpch_q21",
    oracle="""
    SELECT l1.l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON l1.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY l1.l_suppkey
    """,
    tags=("tpch", "join", "subquery"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers-who-kept-orders-waiting, adapted to
    the synthetic schema (no commit/receipt dates): for finalized
    orders, count per supplier the returned lines where ANOTHER
    supplier participated in the order (EXISTS) but NO other supplier's
    line was returned (NOT EXISTS) — the sole-blame attribution query.

    The correlated EXISTS decorrelates to a left-semi join and the NOT
    EXISTS to a left-anti join, both on (orderkey, ≠suppkey); Spark
    expresses them directly as join types rather than per-row
    subqueries.

    100 TB shape: all three lineitem legs hash-partition on
    l_orderkey — one co-partitioned exchange feeds the semi, the anti,
    and the orders join (AQE reuses it); the status/returnflag filters
    cut each leg at its scan. Nothing is ever nested-loop
    re-executed per outer row, which is what makes the EXISTS pair
    viable at fact-table scale."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return waiting.groupBy("l_suppkey").agg(F.count("*").alias("numwait"))


@query(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
               AS sum_base_price,
           CAST(SUM({_REV_CD}) AS BIGINT) / 10000.0 AS sum_disc_price,
           CAST(SUM({_REV_CD}
                    * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)))
                AS BIGINT) / 1000000.0 AS sum_charge,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
               / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           (SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0)
               / CAST(COUNT(*) AS DOUBLE) AS avg_price,
           (SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) / 100.0)
               / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "agg"),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 — the pricing-summary report: one pass over lineitem,
    eight aggregates per (returnflag, linestatus). The canonical
    map-side-combine benchmark: partial aggregation collapses each scan
    partition to ≤|groups| rows (6 here) before the one tiny shuffle,
    so the exchange carries kilobytes regardless of fact size.

    Money math: every sum accumulates exact int64 cent/pct units
    (charge = cents × (100−disc) × (100+tax), scale 10⁶); averages are
    exact-int sums divided once at the end — both engines perform the
    same two exact-int→double divisions, so doubles are bit-identical.

    100 TB shape: whole-stage codegen keeps the eight aggregates in one
    operator over the scan; the shipdate predicate pushes to parquet
    row-group pruning. This plan IS the upper bound for scan-bound agg
    throughput — anything slower than Q1 per byte is leaving scan
    efficiency on the table."""
    tax_cd = _revenue_cd() * (100 + _pct("l_tax"))
    qty = F.col("l_quantity").cast("long")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    )
    cnt = F.count("*")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("sum_qty"),
        (F.sum(_cents("l_extendedprice")) / 100.0).alias("sum_base_price"),
        (F.sum(_revenue_cd()) / 10000.0).alias("sum_disc_price"),
        (F.sum(tax_cd) / 1000000.0).alias("sum_charge"),
        (F.sum(qty) / cnt.cast("double")).alias("avg_qty"),
        ((F.sum(_cents("l_extendedprice")) / 100.0) / cnt.cast("double")).alias(
            "avg_price"
        ),
        ((F.sum(_pct("l_discount")) / 100.0) / cnt.cast("double")).alias(
            "avg_disc"
        ),
        cnt.alias("count_order"),
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "subquery", "join"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — order-priority checking: how many orders of a
    quarter had at least one problem line, per priority class. The
    synthetic schema has no commit/receipt dates, so "late line"
    becomes "returned line" (l_returnflag = 'R') — the EXISTS shape is
    unchanged. Decorrelation: the correlated EXISTS is a left-semi join
    on o_orderkey; each qualifying order counts once no matter how many
    lines match.

    100 TB shape: the quarter filter prunes orders to ~1/28 at the
    scan; the semi join probes only the returned lines (~1/3 of
    lineitem, filter pushed to its scan). AQE turns the semi join
    broadcast when the pruned orders side is small; the final agg is
    5 groups — the whole query is one effective fact pass."""
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-04-01 00:00:00").cast("timestamp")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — shipping-mode priority audit: for lines
    shipped in one year, count urgent-priority vs normal-priority
    orders per class. The synthetic schema has no l_shipmode, so the
    grouping class is l_returnflag; the CASE-pivot on o_orderpriority
    is the Q12 signature and is unchanged.

    100 TB shape: the year filter prunes lineitem at the scan; the join
    carries only (l_orderkey, l_returnflag) against (o_orderkey,
    o_orderpriority) — two-column shuffles. The conditional counts are
    a pivot-free CASE aggregation, so no second pass: one join, one
    3-group agg."""
    lo = F.lit("1998-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1999-01-01 00:00:00").cast("timestamp")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_orderkey", "l_returnflag")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                 THEN {_REV_CD} ELSE 0 END) AS BIGINT)
                 / CAST(SUM({_REV_CD}) AS BIGINT) AS promo_revenue_pct,
           CAST(SUM({_REV_CD}) AS BIGINT) / 10000.0 AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 — promotion effect: what fraction of one month's
    revenue came from promo parts. Single-row global aggregate over a
    broadcast fact⋈dim join; the promo test rides as a CASE inside the
    sum, so one pass computes both numerator and denominator.

    Float determinism: both engines reduce to two exact int64 sums and
    perform the identical 100·a/b double division — no accumulation-
    order sensitivity survives to the output.

    100 TB shape: part broadcasts (it is the small dim); the month
    filter prunes lineitem to ~1/80 at the scan; the global agg's
    partial pass collapses everything executor-side, shuffling one row
    per partition."""
    lo = F.lit("1997-06-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-07-01 00:00:00").cast("timestamp")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue_cd()
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
    total = F.sum(rev)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * promo / total).alias("promo_revenue_pct"),
            (total / 10000.0).alias("total_revenue"),
        )
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT CAST(SUM({_REV_CD}) AS BIGINT) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    tags=("tpch", "join", "predicate"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 — discounted revenue under a 3-arm disjunctive
    predicate mixing dim attributes (brand, size) with fact attributes
    (quantity). The classic pushdown-splitting test: the per-table
    halves of the OR ARE derivable (brand ∈ {1,2,3} on part; quantity
    ∈ [1,50] on lineitem) and Catalyst extracts them below the join,
    while the cross-table arms evaluate after.

    100 TB shape: part broadcasts; the derived brand IN-list prunes the
    dim before broadcast, and the residual OR evaluates inside
    whole-stage codegen — no fact shuffle at all (global agg partials
    collapse per partition). The plan-evidence test asserts the pushed
    IN-list actually reaches the part scan."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    qty = F.col("l_quantity")
    arm = lambda b, smax, qlo, qhi: (
        (F.col("p_brand") == b)
        & F.col("p_size").between(1, smax)
        & qty.between(qlo, qhi)
    )
    cond = arm("Brand#1", 15, 1, 20) | arm("Brand#2", 25, 10, 30) | arm(
        "Brand#3", 50, 20, 50
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            (F.sum(_revenue_cd()) / 10000.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_tpch_q22",
    oracle="""
    WITH pos AS (
        SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
               c_custkey, c_mktsegment
        FROM customer WHERE c_acctbal > 0.0
    ),
    stats AS (
        SELECT CAST(SUM(bal_cents) AS BIGINT) AS tot,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM pos
    )
    SELECT p.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(p.bal_cents) AS BIGINT) / 100.0 AS totacctbal
    FROM pos p, stats
    WHERE p.bal_cents * stats.n > stats.tot
      AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
      )
    GROUP BY p.c_mktsegment
    """,
    tags=("tpch", "subquery", "join"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — global-sales-opportunity: customers with
    above-average positive balances who never ordered, grouped by
    segment (the synthetic schema has no phone column, so the
    country-code grouping becomes c_mktsegment; both subquery shapes —
    scalar-aggregate comparison and NOT EXISTS — are intact).

    The above-average test avoids float comparison entirely:
    bal·n > Σbal in exact int64 (cross-multiplied), so both engines
    make the identical integer decision. The NOT EXISTS is a left-anti
    join against the orders custkey set.

    100 TB shape: the scalar stats aggregate is one tiny broadcast row
    (crossJoin of a 1-row agg); the anti join shuffles only custkeys.
    Neither subquery re-executes per row — both decorrelate to joins,
    the only viable shape at fact scale."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    pos = c.select(
        _cents("c_acctbal").alias("bal_cents"), "c_custkey", "c_mktsegment"
    )
    stats = pos.agg(
        F.sum("bal_cents").alias("tot"), F.count("*").alias("n")
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        pos.crossJoin(F.broadcast(stats))
        .filter(F.col("bal_cents") * F.col("n") > F.col("tot"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_cents") / 100.0).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Round 3: the remaining ten shapes — with these, all 22 TPC-H query
# shapes are covered (Q5 = q_sql_flagship). The synthetic schema has no
# partsupp table; Q2/Q11/Q16/Q20 derive the part–supplier relation from
# DISTINCT (l_partkey, l_suppkey) with MIN/SUM offer stats — the
# decorrelation and join shapes are unchanged.
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_discount * 100) AS BIGINT))
                AS BIGINT) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
    tags=("tpch", "agg"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 — forecasting-revenue change: one filtered pass over
    lineitem, a single global sum of extendedprice×discount. The purest
    scan-bound query of the suite: no join, no group key, three
    independent pushable predicates.

    The discount band compares exact integer percent units (5..7), not
    the stored double — both engines make the identical decision on
    values like 0.07 that have no exact binary representation.

    100 TB shape: all three predicates push to parquet (row-group stats
    prune on shipdate with date-sorted layout); the global agg's
    partials collapse executor-side so the exchange carries one row per
    partition. Throughput here ≈ raw scan bandwidth — the number to
    compare every other query against."""
    l = load_table(spark, sf_dir, "lineitem")
    disc = _pct("l_discount")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & disc.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(_cents("l_extendedprice") * disc) / 10000.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_tpch_q2",
    oracle="""
    WITH offers AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS offer_cents
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    regional AS (
        SELECT o.l_partkey, o.l_suppkey, o.offer_cents,
               s.s_name, s.s_acctbal, n.n_name
        FROM offers o
        JOIN supplier s ON o.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'REGION_1'
    ),
    best AS (
        SELECT l_partkey, MIN(offer_cents) AS best_cents
        FROM regional GROUP BY l_partkey
    )
    SELECT CAST(ROUND(x.s_acctbal * 100) AS BIGINT) / 100.0 AS s_acctbal,
           x.s_name, x.n_name, p.p_partkey, p.p_name,
           x.offer_cents / 100.0 AS offer_price
    FROM regional x
    JOIN best b ON x.l_partkey = b.l_partkey AND x.offer_cents = b.best_cents
    JOIN part p ON x.l_partkey = p.p_partkey
    WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 30
    ORDER BY CAST(ROUND(x.s_acctbal * 100) AS BIGINT) DESC,
             x.n_name, x.s_name, p.p_partkey
    LIMIT 20
    """,
    tags=("tpch", "subquery", "join", "topk"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — minimum-cost supplier: for each part in a size/
    type slice, the supplier(s) in one region offering it at the
    region-wide minimum price. The correlated scalar-MIN subquery
    decorrelates to a per-part MIN aggregate joined back on
    (partkey, min_price) — the textbook argmin-per-group join.

    The part–supplier offer relation derives from lineitem (MIN
    extendedprice per (partkey, suppkey) — no partsupp table in the
    synthetic schema); every price comparison happens in exact int64
    cents, so the argmin equality is bit-deterministic cross-engine.

    100 TB shape: the offers aggregate is the one fact-scale shuffle
    (partial agg collapses it map-side); supplier/nation/region are
    broadcast; the per-part best re-join hits the already-aggregated
    (small) offer relation, and TakeOrdered bounds the output without a
    global sort."""
    l = load_table(spark, sf_dir, "lineitem")
    offers = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_cents("l_extendedprice")).alias("offer_cents")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "REGION_1"
    )
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    regional = offers.join(
        F.broadcast(dim), offers.l_suppkey == dim.s_suppkey
    )
    best = regional.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("offer_cents").alias("best_cents")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 30)
    )
    return (
        regional.join(
            best,
            (regional.l_partkey == best.b_partkey)
            & (regional.offer_cents == best.best_cents),
        )
        .join(F.broadcast(p), regional.l_partkey == p.p_partkey)
        .select(
            (_cents("s_acctbal") / 100.0).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("offer_cents") / 100.0).alias("offer_price"),
        )
        .orderBy(
            F.desc(_cents("s_acctbal")), "n_name", "s_name", "p_partkey"
        )
        .limit(20)
    )


@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {_REV_CD}
                         ELSE 0 END) AS BIGINT)
             / CAST(SUM({_REV_CD}) AS DOUBLE) AS mkt_share,
           CAST(SUM({_REV_CD}) AS BIGINT) / 10000.0 AS total_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    JOIN region r ON n2.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    WHERE r.r_name = 'REGION_2' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
    GROUP BY 1
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 — national market share: of one region's ECONOMY-part
    revenue per year, the fraction supplied by one nation. The widest
    join tree of the suite (7 tables joined to the fact spine) with the
    share computed as a CASE numerator over the same sum — one pass,
    no second aggregation.

    Both sums reduce to exact int64 before the single double division,
    so the ratio is bit-identical cross-engine.

    100 TB shape: every dimension (part filtered to 1/6, customer-side
    nation/region, supplier-side nation) broadcasts; lineitem never
    shuffles until the per-year agg (≤2 groups, collapsed map-side).
    The date filter prunes via the orders join — with a date-bucketed
    fact layout it would push to the scan."""
    lo = F.lit("1995-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-12-31 00:00:00").cast("timestamp")
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(lo, hi)
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "REGION_2"
    )
    cust_dim = (
        c.join(
            F.broadcast(
                n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            ),
            c.c_nationkey == n.n_nationkey,
        ).select("c_custkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    supp_dim = s.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = _revenue_cd()
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0)))
    total = F.sum(rev)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_dim), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_dim), l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (nat / total.cast("double")).alias("mkt_share"),
            (total / 10000.0).alias("total_revenue"),
        )
    )


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_REV_CD}
                    - CAST(l.l_quantity AS BIGINT)
                      * CAST(ROUND(p.p_retailprice * 100) AS BIGINT) * 10)
                AS BIGINT) / 10000.0 AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-type profit: for parts matching a name
    pattern, profit per supplier nation per year. Cost proxy =
    quantity × 10% of retailprice (no partsupp.ps_supplycost in the
    synthetic schema); the profit expression stays a single fused
    arithmetic over the joined row, accumulated in one exact int64 unit
    (cent·pct, scale 10⁴).

    100 TB shape: the LIKE-filtered part dim broadcasts and prunes the
    fact at the join (the selective edge of the plan); supplier/nation
    broadcast; orders joins on the fact spine only to supply the year.
    One fact-scale shuffle: the (nation, year) aggregate — ≤ 25×7
    groups, collapsed map-side."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    profit = _revenue_cd() - F.col("l_quantity").cast("long") * _cents(
        "p_retailprice"
    ) * F.lit(10)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit) / 10000.0).alias("sum_profit"))
    )


@query(
    "q_tpch_q11",
    oracle="""
    WITH stock AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_quantity AS BIGINT)
                   * CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                   AS value_cents
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
        GROUP BY l.l_partkey
    ),
    total AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS tot FROM stock)
    SELECT s.l_partkey AS p_partkey,
           CAST(s.value_cents AS BIGINT) / 100.0 AS stock_value
    FROM stock s, total t
    WHERE s.value_cents * 100 > t.tot
    ORDER BY s.value_cents DESC, s.l_partkey
    """,
    tags=("tpch", "subquery", "agg"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — important stock identification: parts whose
    inventory value held by three nations' suppliers exceeds 1% of the
    grand total. The HAVING-vs-scalar-subquery shape: per-part
    aggregate, then a 1-row global total broadcast back as the
    threshold.

    The 1% test cross-multiplies in exact int64 (value×100 > total) —
    no float threshold, both engines keep/drop identical parts.
    Inventory value derives from lineitem (qty × price per part over
    the filtered suppliers; no partsupp in the synthetic schema).

    100 TB shape: the nation filter semi-joins the fact via a broadcast
    supplier dim before the per-part agg (the only fact-scale shuffle);
    the grand total re-aggregates the already-small per-part frame and
    broadcasts one row — no second fact pass, the decorrelated form of
    Q11's scalar subquery."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2")
    )
    supp = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey")
    stock = (
        l.join(F.broadcast(supp), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_quantity").cast("long") * _cents("l_extendedprice")
            ).alias("value_cents")
        )
    )
    total = stock.agg(F.sum("value_cents").alias("tot"))
    return (
        stock.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 100 > F.col("tot"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_cents") / 100.0).alias("stock_value"),
        )
        .orderBy(F.desc("value_cents"), "l_partkey")
    )


@query(
    "q_tpch_q13",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 — customer order-count distribution: how many
    customers placed 0, 1, 2, … non-urgent orders. The join-filter
    subtlety IS the query: the priority predicate lives in the LEFT
    JOIN's ON clause, so customers with no qualifying orders survive
    with count 0 (COUNT(o_orderkey) skips the NULLs a WHERE would have
    dropped entirely).

    100 TB shape: two aggregations — per-customer (fact-scale shuffle
    on custkey, the natural orders partitioning) then the tiny count-
    of-counts. The first agg's partials collapse map-side since orders
    arrive custkey-clustered under AQE; the distribution agg handles a
    few hundred distinct counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_REV_CD}) AS BIGINT) AS total_cd
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           r.total_cd / 10000.0 AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_cd = (SELECT MAX(total_cd) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    tags=("tpch", "subquery", "agg"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 — top supplier: supplier(s) with the maximum revenue
    in one quarter. The view-plus-scalar-max shape: the per-supplier
    revenue aggregate is computed ONCE and reused for both the max and
    the equality filter (Q15's CREATE VIEW exists precisely to avoid
    recomputation — here the reused DataFrame subtree is the view, and
    Catalyst's ReusedExchange de-duplicates the shuffle).

    The max-equality compares exact int64 cent·pct units — ties (all
    max suppliers) surface identically in both engines.

    100 TB shape: one fact-scale shuffle (per-supplier agg of the
    quarter-pruned scan); the scalar max is a 1-row broadcast over the
    small agg frame. Never a second fact pass."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue_cd()).alias("total_cd")
    )
    mx = revenue.agg(F.max("total_cd").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cd") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_cd") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q16",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    ok_supp AS (
        SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0.0
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
      AND ps.l_suppkey IN (SELECT s_suppkey FROM ok_supp)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — parts/supplier relationship: how many distinct
    eligible suppliers offer each (brand, type, size) slice, excluding
    one brand, one type family, and suppliers flagged by a complaint
    filter (negative account balance stands in for the LIKE
    '%Complaints%' subquery; the synthetic schema has no s_comment).

    100 TB shape: the part–supplier relation derives from lineitem via
    DISTINCT (partkey, suppkey) — fact-scale but collapses map-side to
    near-partsupp cardinality; the negative predicates prune the
    broadcast part dim; the supplier allow-list is a broadcast semi
    join. COUNT(DISTINCT) re-shuffles only the surviving pairs at
    (brand, type, size) grain."""
    l = load_table(spark, sf_dir, "lineitem")
    ps = l.select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ok = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") >= 0.0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(ok), ps.l_suppkey == ok.s_suppkey, "left_semi")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q_tpch_q17",
    oracle="""
    WITH target AS (
        SELECT p_partkey FROM part
        WHERE p_brand = 'Brand#2' AND p_type = 'SMALL'
    ),
    stats AS (
        SELECT l.l_partkey,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem l
        JOIN target t ON l.l_partkey = t.p_partkey
        GROUP BY l.l_partkey
    )
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) / 100.0 / 7.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN stats st ON l.l_partkey = st.l_partkey
    WHERE CAST(l.l_quantity AS BIGINT) * 5 * st.cnt < st.sum_qty
    """,
    tags=("tpch", "subquery", "join"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 — small-quantity-order revenue: lines of one brand/
    type slice whose quantity is under 20% of that part's average.
    The correlated scalar-AVG subquery decorrelates to a per-part
    (sum, count) aggregate joined back to the fact — each part's
    average is computed once, not per probing row.

    The 20%-of-average test cross-multiplies to exact integers
    (qty × 5 × count < sum) — no float average is ever materialized,
    so both engines make the identical per-line decision. The final
    /7.0 is one constant division.

    100 TB shape: the brand/type filter broadcasts ~1/150 of part and
    prunes the fact at the join; the per-part stats agg and the re-join
    share the same l_partkey partitioning (one Exchange, reused); the
    global sum collapses map-side."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem")
    targeted = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    stats = targeted.groupBy(F.col("l_partkey").alias("st_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        targeted.join(stats, targeted.l_partkey == stats.st_partkey)
        .filter(
            F.col("l_quantity").cast("long") * 5 * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            (F.sum(_cents("l_extendedprice")) / 100.0 / 7.0).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_tpch_q20",
    oracle="""
    WITH small_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ),
    shipped AS (
        SELECT l.l_suppkey, l.l_partkey,
               CAST(SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                              AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                             THEN CAST(l.l_quantity AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS qty_1997,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_total
        FROM lineitem l
        JOIN small_parts sp ON l.l_partkey = sp.p_partkey
        GROUP BY l.l_suppkey, l.l_partkey
    ),
    excess AS (
        SELECT DISTINCT l_suppkey FROM shipped
        WHERE qty_1997 * 2 > qty_total
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_2', 'NATION_3')
      AND s.s_suppkey IN (SELECT l_suppkey FROM excess)
    ORDER BY s.s_name
    """,
    tags=("tpch", "subquery", "join"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — potential part promotion: suppliers in two
    nations who concentrated over half their shipments of small-pattern
    parts into one year (availqty-vs-half-of-shipped becomes
    year-share-of-total; the nested IN → IN → scalar-subquery chain is
    intact as semi-join → semi-join → per-group threshold).

    The half test cross-multiplies exact int64 (2×qty_year > total) —
    identical keep/drop both engines. Both sums come from ONE pass over
    the part-pruned fact (conditional CASE sum, not two scans).

    100 TB shape: small_parts broadcasts and prunes the fact at the
    join; the (suppkey, partkey) agg is the one fact-scale shuffle;
    excess collapses to a distinct suppkey list that broadcast-semi-
    joins the supplier dim. The original's correlated agg-per-
    (part,supp) decorrelates to exactly this plan."""
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    sp = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    shipped = (
        l.join(F.broadcast(sp), l.l_partkey == sp.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(
                    (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi),
                    qty,
                ).otherwise(F.lit(0))
            ).alias("qty_1997"),
            F.sum(qty).alias("qty_total"),
        )
    )
    excess = (
        shipped.filter(F.col("qty_1997") * 2 > F.col("qty_total"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_3")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(excess),
            s.s_suppkey == excess.l_suppkey,
            "left_semi",
        )
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_REV_CD}) AS BIGINT) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
                   AND s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    tags=("tpch", "join"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 — local supplier volume: revenue from orders where the
    customer and the supplier share a nation inside one region, over one
    order year. This is the DataFrame-API twin of q_sql_flagship (which
    submits the Q5 *shape* as raw SQL); here the distinguishing feature
    is the double-keyed nation join (customer AND supplier nationkey),
    which the original expresses as an extra equality predicate.

    100 TB shape: region→nation prune broadcasts (5→~5 nations), then
    both customer and supplier shrink via broadcast semi-pruned dims
    before touching the fact; the year filter pushes to the orders scan
    (partition prune under date layout). The only fact-scale shuffle is
    lineitem⋈orders on orderkey; the c_nationkey = s_nationkey equality
    is evaluated as a post-join filter on already-joined dims, never a
    BNLJ. Money math: exact int64 cent·pct units, one final division."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg((F.sum(_revenue_cd()) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )
