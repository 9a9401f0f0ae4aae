"""Canonical TPC-H query shapes ([EXT], SURVEY.md §2.4 extension):
Q3 (shipping-priority top-k), Q7 (volume shipping between two nations),
Q10 (returned-item reporting), Q18 (large-volume customers). Q1 and Q5
shapes already exist as q_agg_hash and q_sql_flagship; together these
cover the classic join-agg-topk plan space every warehouse engine is
judged on.

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
