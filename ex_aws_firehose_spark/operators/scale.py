"""Scale-pattern operator surface ([EXT], SURVEY.md §2.4 extension):
the composite shapes that only matter once a table stops fitting on one
machine — CDC snapshot reconciliation, mergeable exact/approximate
sketch rollups, data-layout (zone-map) auditing, fixed-point iterative
graph analytics, and an explicit bloom-prefiltered join.

Mandated by ``repo:BASELINE.json`` ("design every operator for 100 TB
scale") rather than the reference (which has no relational surface —
see SURVEY.md §2.4 preamble). Every operator is a pure DataFrame
composition except the Misra–Gries sketch, which is the canonical
"mergeable summary" shape: per-partition ``mapInPandas`` sketches merged
once — the raw data is never shuffled.

Cross-engine determinism rules (see operators/relational.py:13): money
in exact int64 cents, iterative math in scaled *integer* arithmetic
(``div``), aggregate oracles wrapped ``CAST(... AS BIGINT)`` so DuckDB's
HUGEINT widening never leaks into the driver's dtype-sensitive hash.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_aws_firehose_spark.operators.relational import _cents
from ex_aws_firehose_spark.registry import query
from ex_aws_firehose_spark.tables import load_table

# DuckDB reads the raw ns-precision event timestamps; Spark reads µs
# (see operators/relational.py EVENTS_US).
EVENTS_US = (
    "WITH events_us AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value, props FROM events)"
)


# ---------------------------------------------------------------------------
# CDC snapshot reconciliation
# ---------------------------------------------------------------------------


@query(
    "q_cdc_snapshot_diff",
    oracle="""
    WITH old_snap AS (
        SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    new_snap AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 3 = 0 THEN 100 ELSE 0 END AS cents
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.cents AS old_cents,
           n.cents AS new_cents
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR o.cents <> n.cents
    """,
    tags=("scale", "cdc"),
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff CDC: reconcile two point-in-time table images into
    an insert/update/delete changelog — the standard way to bootstrap
    CDC when the source has no log (and the inverse of
    q_upsert_compact, which folds a changelog back into an image).

    Two deterministic snapshots are derived from `orders` (key-modulo
    membership simulates deletes/inserts; a price nudge on key%3
    simulates updates), then reconciled with one full-outer join on the
    primary key and a three-way CASE. Unchanged rows are dropped
    *after* the join by a cheap column compare.

    100 TB shape: a full-outer join cannot broadcast — both snapshots
    hash-shuffle on the key once, and that is the entire cost. With
    both snapshots bucketed by key at write time (q_join_bucketed
    pattern) the diff is exchange-free. State never accumulates — this
    is the restartable batch alternative to streaming CDC."""
    o = load_table(spark, sf_dir, "orders")
    old_snap = (
        o.filter(F.col("o_orderkey") % 7 != 0)
        .select("o_orderkey", _cents("o_totalprice").alias("old_cents"))
    )
    new_snap = (
        o.filter(F.col("o_orderkey") % 5 != 0)
        .select(
            "o_orderkey",
            (
                _cents("o_totalprice")
                + F.when(F.col("o_orderkey") % 3 == 0, F.lit(100)).otherwise(0)
            ).alias("new_cents"),
        )
    )
    joined = old_snap.withColumnRenamed("o_orderkey", "old_key").join(
        new_snap.withColumnRenamed("o_orderkey", "new_key"),
        F.col("old_key") == F.col("new_key"),
        "full_outer",
    )
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("old_key").isNull(), "insert")
            .when(F.col("new_key").isNull(), "delete")
            .otherwise("update"),
        )
        .filter(
            F.col("old_key").isNull()
            | F.col("new_key").isNull()
            | (F.col("old_cents") != F.col("new_cents"))
        )
        .select(
            F.coalesce("old_key", "new_key").alias("o_orderkey"),
            "change_type",
            "old_cents",
            "new_cents",
        )
    )


# ---------------------------------------------------------------------------
# Mergeable sketch rollups
# ---------------------------------------------------------------------------


@query(
    "q_sketch_bitmap_rollup",
    oracle=EVENTS_US
    + """
    SELECT date_trunc('day', ts) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events_us GROUP BY 1
    UNION ALL
    SELECT CAST(NULL AS TIMESTAMP) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events_us
    """,
    tags=("scale", "sketch"),
)
def q_sketch_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mergeable distinct-count rollup via roaring-style bitmaps —
    the precise counterpart of q_sketch_hll_union: per-day user bitmaps
    (`bitmap_construct_agg` over `bitmap_bit_position`, bucketed every
    32 Ki ids) are OR-merged (`bitmap_or_agg`) into an all-days total
    *without touching raw events again*. Emitted as per-day rows plus a
    NULL-day grand-total row, so the oracle can recompute both grains
    from scratch — proving the merge loses nothing.

    100 TB shape: raw events aggregate once into |days|×|id-buckets|
    bitmap rows (a few KB each); every coarser grain (week / month /
    lifetime) re-aggregates those sketches, shuffling kilobytes instead
    of terabytes. This is the materialized-rollup pattern for exact
    COUNT(DISTINCT) over dense integer keys; HLL (q_sketch_hll_union)
    is the fallback when keys aren't dense integers."""
    e = load_table(spark, sf_dir, "events")
    sketch = (
        e.select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .groupBy("day", F.expr("bitmap_bucket_number(user_id)").alias("bkt"))
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
                "bm"
            )
        )
    )
    daily = sketch.groupBy("day").agg(
        F.expr("CAST(sum(bitmap_count(bm)) AS BIGINT)").alias("n_users")
    )
    total = (
        sketch.groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.expr("CAST(sum(bitmap_count(bm)) AS BIGINT)").alias("n_users"))
        .select(F.lit(None).cast("timestamp").alias("day"), "n_users")
    )
    return daily.unionByName(total)


_MG_CAPACITY = 64


def _mg_compress(counters: dict[int, int]) -> dict[int, int]:
    """Misra–Gries compression: decrement all counters by the (k+1)-th
    largest so at most k stay positive. Total undercount across all
    merges is bounded by N/(k+1) (Agarwal et al., "Mergeable
    Summaries", PODS'12)."""
    if len(counters) <= _MG_CAPACITY:
        return counters
    cut = sorted(counters.values(), reverse=True)[_MG_CAPACITY]
    return {k: v - cut for k, v in counters.items() if v > cut}


def _mg_partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    counters: dict[int, int] = {}
    for pdf in batches:
        for hk, c in pdf["hk"].value_counts().items():
            counters[int(hk)] = counters.get(int(hk), 0) + int(c)
        counters = _mg_compress(counters)
    yield pd.DataFrame(
        {
            "hk": pd.Series(list(counters), dtype="int64"),
            "cnt": pd.Series(list(counters.values()), dtype="int64"),
        }
    )


def _mg_merge(pdf: pd.DataFrame) -> pd.DataFrame:
    agg = pdf.groupby("hk")["cnt"].sum().to_dict()
    agg = _mg_compress({int(k): int(v) for k, v in agg.items()})
    return pd.DataFrame({"hk": pd.Series(sorted(agg), dtype="int64")})


@query(
    "q_sketch_heavy_hitters",
    oracle="""
    WITH keyed AS (
        SELECT CAST(FLOOR(SQRT(CAST(event_id % 10000 AS DOUBLE))) AS BIGINT)
               AS hk
        FROM events
    ),
    exact AS (
        SELECT hk, CAST(COUNT(*) AS BIGINT) AS exact_cnt
        FROM keyed GROUP BY hk
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM keyed)
    SELECT hk, exact_cnt, TRUE AS found
    FROM exact, tot WHERE exact_cnt * 65 > n_total
    """,
    tags=("scale", "sketch", "udf"),
)
def q_sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters as a mergeable per-partition sketch:
    each partition streams its rows through a capacity-64 counter map
    (`mapInPandas`, constant memory), the ≤64-row partials are merged
    once (`applyInPandas` on a single group), and the survivors form
    the candidate set. The MG guarantee — every key with true frequency
    > N/(k+1) survives any merge order — is the oracle-checked
    contract: Spark joins the candidates against exact counts and emits
    (key, exact_cnt, found) for every key above N/65; DuckDB recomputes
    that set with found=TRUE. A missed hitter would surface as
    found=false and fail the hash gate.

    The synthetic key floor(sqrt(event_id % 10000)) gives a linear-
    density 100-key domain (count(j) ∝ 2j+1) so evictions actually
    fire; real corpora (token frequencies at 100 TB) are Zipfian and
    favor this sketch even more.

    100 TB shape: the raw table never shuffles — each executor emits 64
    rows regardless of input size, the merge handles |partitions|×64
    rows on one task, and the exact-count verification (here part of
    the contract) is exactly the expensive full groupBy the sketch
    replaces in production."""
    e = load_table(spark, sf_dir, "events")
    keyed = e.select(
        F.floor(F.sqrt((F.col("event_id") % 10000).cast("double")))
        .cast("long")
        .alias("hk")
    )
    partials = keyed.mapInPandas(_mg_partial, schema="hk long, cnt long")
    cands = (
        partials.groupBy(F.lit(1).alias("g"))
        .applyInPandas(_mg_merge, schema="hk long")
        .withColumn("found", F.lit(True))
    )
    exact = keyed.groupBy("hk").agg(F.count("*").alias("exact_cnt"))
    tot = keyed.agg(F.count("*").alias("n_total"))
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("exact_cnt") * 65 > F.col("n_total"))
        .join(F.broadcast(cands), "hk", "left")
        .select(
            "hk",
            "exact_cnt",
            F.coalesce("found", F.lit(False)).alias("found"),
        )
    )


# ---------------------------------------------------------------------------
# Data-layout (zone-map) audit
# ---------------------------------------------------------------------------

_ZM_DATE_LO, _ZM_DATE_HI = "1997-01-01 00:00:00", "1997-03-31 00:00:00"
_ZM_KEY_LO, _ZM_KEY_HI = 1000, 2000


@query(
    "q_layout_zonemap_audit",
    oracle=f"""
    SELECT date_trunc('month', o_orderdate) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           (MAX(o_orderdate) < TIMESTAMP '{_ZM_DATE_LO}'
            OR MIN(o_orderdate) > TIMESTAMP '{_ZM_DATE_HI}')
               AS prunable_by_date,
           (MAX(o_orderkey) < {_ZM_KEY_LO}
            OR MIN(o_orderkey) > {_ZM_KEY_HI}) AS prunable_by_key
    FROM orders GROUP BY 1
    """,
    tags=("scale", "layout"),
)
def q_layout_zonemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / clustering-layout audit: partition the table into its
    physical-layout buckets (month of o_orderdate — the natural
    ingestion partitioning) and compute each bucket's min/max
    statistics, then evaluate which buckets a given predicate could
    skip. Two probe predicates demonstrate the payoff asymmetry: a
    3-month date range prunes every bucket outside it (date is the
    clustering key — zone maps are tight), while an o_orderkey range
    prunes ~nothing (orderkey is uncorrelated with layout — every
    bucket's [min,max] straddles the probe).

    This is exactly the min/max footer pruning parquet / Iceberg / Delta
    do per file; run as a query it audits whether the *current* layout
    serves the workload, and quantifies what re-clustering (Z-order /
    range-sort by the hot predicate column) would buy.

    100 TB shape: one hash aggregate over the scan at |buckets|
    cardinality — the audit itself is a map-side-combinable pass that
    never moves row data, so it's safe to run on the full table."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count("*").alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        (
            (F.max("o_orderdate") < F.lit(_ZM_DATE_LO).cast("timestamp"))
            | (F.min("o_orderdate") > F.lit(_ZM_DATE_HI).cast("timestamp"))
        ).alias("prunable_by_date"),
        (
            (F.max("o_orderkey") < F.lit(_ZM_KEY_LO))
            | (F.min("o_orderkey") > F.lit(_ZM_KEY_HI))
        ).alias("prunable_by_key"),
    )


# ---------------------------------------------------------------------------
# Fixed-point iterative graph analytics
# ---------------------------------------------------------------------------

_PR_SCALE = 1_000_000_000_000
_PR_ITERS = 5


def _pagerank_step_sql(prev: str) -> str:
    return f"""
    SELECT nd.node,
           ({_PR_SCALE} * 15) // (100 * nn.n)
           + (85 * COALESCE(c.s, 0)) // 100 AS rank
    FROM nodes nd CROSS JOIN nn
    LEFT JOIN (
        SELECT e.dst AS node, CAST(SUM((p.rank * e.w) // o.ow) AS BIGINT) AS s
        FROM {prev} p
        JOIN edges e ON p.node = e.src
        JOIN outw o ON o.src = e.src
        GROUP BY e.dst
    ) c ON c.node = nd.node
    """


_PR_ORACLE = (
    """
    WITH edges AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    r0 AS (SELECT node, """
    + f"{_PR_SCALE} // nn.n AS rank FROM nodes, nn),"
    + ",".join(
        f"r{i + 1} AS ({_pagerank_step_sql(f'r{i}')})" for i in range(_PR_ITERS)
    )
    + f" SELECT node, rank FROM r{_PR_ITERS}"
)


@query("q_graph_pagerank", oracle=_PR_ORACLE, tags=("scale", "graph"))
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the trade graph (customer-nation →
    supplier-nation edges, weight = co-occurring lineitems), 5 damped
    power iterations. All rank math is scaled *integer* arithmetic
    (`div` floor-division on 1e-12 rank units) so Spark and DuckDB's
    unrolled-CTE oracle agree bit-for-bit — float summation order can
    never flip a result. Dangling mass (nodes with no out-edges) is
    dropped, documented and mirrored on both sides.

    Structure: the edge list is built once with three joins (dims
    broadcast), localCheckpointed so the driver loop doesn't replay the
    build, and each iteration is one broadcast join (ranks ⋈ edges) +
    one hash aggregate on dst.

    100 TB shape: rank state is |nodes| rows and edges are |nodes|²
    max — both tiny relative to the fact table that *built* them; the
    expensive part (edge extraction) runs exactly once. For web-scale
    graphs the same loop holds with edges hash-partitioned by src and
    ranks co-partitioned, checkpointing every few iterations to cut
    lineage (here localCheckpoint demonstrates the mechanism)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = edges.join(outw, "src").localCheckpoint()

    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    nodes_n = nodes.crossJoin(F.broadcast(nodes.agg(F.count("*").alias("n"))))
    ranks = nodes_n.select("node", F.expr(f"{_PR_SCALE} div n").alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = ranks.join(F.broadcast(ew), ranks.node == ew.src).select(
            F.col("dst").alias("node"),
            F.expr("(rank * w) div ow").alias("contrib"),
        )
        sums = contrib.groupBy("node").agg(F.sum("contrib").alias("s"))
        ranks = nodes_n.join(sums, "node", "left").select(
            "node",
            (
                F.expr(f"({_PR_SCALE} * 15) div (100 * n)")
                + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
            ).alias("rank"),
        )
    return ranks


# ---------------------------------------------------------------------------
# Explicit bloom-prefiltered join
# ---------------------------------------------------------------------------

_BLOOM_M = 8192
_BLOOM_HASHES = ((2654435761, 7, 1000003), (40503, 11, 999983), (97, 101, 1000033))


def _bloom_pos(col: F.Column, a: int, b: int, p: int) -> F.Column:
    return ((col * a + b) % p) % _BLOOM_M


@query(
    "q_join_bloom_prefilter",
    oracle="""
    SELECT s.s_nationkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY 1
    """,
    tags=("scale", "join"),
)
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered selective join: revenue by European supplier
    nation, where the fact scan is prefiltered through an explicit
    3-hash bloom filter (m=8192, deterministic multiply-mod hashes)
    built from the ~1/5-selective dim key set before the real join
    runs. Each hash's occupied-position set is a tiny broadcast
    left-semi join, so fact rows missing from the dim are dropped at
    the scan with zero shuffle; blooms admit false positives but never
    false negatives, so the exact broadcast join after the prefilter
    yields the identical result the oracle computes with plain joins.

    This is a portable, engine-visible version of what Spark's runtime
    row-group/shuffle bloom filters (spark.sql.optimizer.runtime.
    bloomFilter, applied above ~10 GB creation thresholds — covered in
    tests/test_plans.py) inject automatically on real clusters.

    100 TB shape: the win is shuffle avoidance — with a 20%-selective
    dim, 80% of fact bytes never leave the scan stage. The position
    sets are O(m) regardless of fact size and ride the broadcast path;
    at larger dim cardinalities you'd raise m or switch to the built-in
    bloom_filter_agg sketch, same plan shape."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    dim = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey")
    )
    fact = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", _cents("l_extendedprice").alias("cents")
    )
    pref = fact
    for i, (a, b, p) in enumerate(_BLOOM_HASHES):
        pos = dim.select(
            _bloom_pos(F.col("s_suppkey"), a, b, p).alias(f"pos{i}")
        ).distinct()
        pref = pref.withColumn(
            f"h{i}", _bloom_pos(F.col("l_suppkey"), a, b, p)
        ).join(
            F.broadcast(pos), F.col(f"h{i}") == F.col(f"pos{i}"), "left_semi"
        )
    return (
        pref.join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(
            F.sum("cents").alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_sketch_histogram_quantile",
    oracle="""
    WITH e AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        FROM events
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
    daily AS (
        SELECT day, LEAST(cents // 1024, 63) AS bin,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM e GROUP BY 1, 2
    ),
    hist AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS nb FROM daily GROUP BY 1),
    cumh AS (
        SELECT bin, SUM(nb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
    ),
    pcts AS (SELECT * FROM (VALUES (50), (90)) AS t(p)),
    est AS (
        SELECT p, CAST(MIN(bin) * 1024 AS BIGINT) AS est_cents
        FROM pcts, cumh, tot WHERE cum * 100 >= p * n GROUP BY p
    ),
    vals AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1),
    cumv AS (
        SELECT cents,
               SUM(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum
        FROM vals
    ),
    exact AS (
        SELECT p, CAST(MIN(cents) AS BIGINT) AS exact_cents
        FROM pcts, cumv, tot WHERE cum * 100 >= p * n GROUP BY p
    )
    SELECT CAST(e1.p AS BIGINT) AS pct, e1.est_cents, e2.exact_cents,
           ((e2.exact_cents - e1.est_cents) BETWEEN 0 AND 1023) AS within_bin
    FROM est e1 JOIN exact e2 USING (p)
    """,
    tags=("scale", "sketch"),
)
def q_sketch_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-percentile rollup via fixed-bin histograms — the
    re-aggregatable answer to quantiles over pre-aggregated data:
    per-day 64-bin histograms (integer counts) sum into a range
    histogram, whose cumulative walk yields the p50/p90 bin lower edge
    as the estimate. The oracle-checked contract is the histogram
    error bound: the true order statistic (computed exactly from a
    domain-bounded value-count cumsum, same integer math both engines)
    must land inside the estimate's bin — within one 1024-cent bin
    width, by construction.

    Completes the mergeable-sketch family: HLL (q_sketch_hll_union)
    and bitmap (q_sketch_bitmap_rollup) for distincts, Misra–Gries
    (q_sketch_heavy_hitters) for frequencies, histograms for
    quantiles. Unlike percentile_approx's opaque sketch, histogram
    partials are plain (bin, count) rows — storable in any table and
    mergeable by SUM, which is what a 100 TB continuous-aggregate
    pipeline needs (percentile_approx cannot re-aggregate from stored
    state).

    100 TB shape: level-1 is one map-side-combinable agg at
    |days|×64 cardinality; every coarser range merges by SUM over
    kilobytes. The exact side's window runs at |distinct cents| ≤
    domain-bound rows (not |rows|) — and exists only to verify the
    contract; production reads the estimate."""
    e = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.date_trunc("day", "ts").alias("day"),
    )
    tot = e.agg(F.count("*").alias("n"))
    daily = e.groupBy(
        "day", F.least(F.expr("cents div 1024"), F.lit(63)).alias("bin")
    ).agg(F.count("*").alias("c"))
    hist = daily.groupBy("bin").agg(F.sum("c").alias("nb"))

    from pyspark.sql import Window

    w_bin = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumh = hist.withColumn("cum", F.sum("nb").over(w_bin))
    pcts = spark.createDataFrame([(50,), (90,)], "p int")
    est = (
        pcts.crossJoin(cumh)
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") * 100 >= F.col("p") * F.col("n"))
        .groupBy("p")
        .agg((F.min("bin") * 1024).cast("long").alias("est_cents"))
    )
    vals = e.groupBy("cents").agg(F.count("*").alias("c"))
    w_val = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumv = vals.withColumn("cum", F.sum("c").over(w_val))
    exact = (
        pcts.crossJoin(cumv)
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") * 100 >= F.col("p") * F.col("n"))
        .groupBy("p")
        .agg(F.min("cents").cast("long").alias("exact_cents"))
    )
    return (
        est.join(exact, "p")
        .select(
            F.col("p").cast("long").alias("pct"),
            "est_cents",
            "exact_cents",
            (F.col("exact_cents") - F.col("est_cents")).between(0, 1023).alias(
                "within_bin"
            ),
        )
    )


@query(
    "q_dq_constraints",
    oracle="""
    WITH checks AS (
        SELECT 'orderkey_not_null' AS constraint_name,
               CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT)
                   AS violations
        FROM orders
        UNION ALL
        SELECT 'orderkey_unique',
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'custkey_references_customer',
               CAST(COUNT(*) AS BIGINT)
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
        UNION ALL
        SELECT 'totalprice_positive_bounded',
               CAST(COUNT(*) FILTER (
                   WHERE o_totalprice <= 0 OR o_totalprice > 1000000
               ) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orderstatus_in_domain',
               CAST(COUNT(*) FILTER (
                   WHERE o_orderstatus NOT IN ('O', 'F', 'P')
               ) AS BIGINT)
        FROM orders
    )
    SELECT constraint_name, violations, violations = 0 AS passed
    FROM checks
    """,
    tags=("scale", "quality"),
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint validation (the Deequ /
    dbt-test shape): one audit emits a row per constraint — not-null,
    uniqueness, referential integrity against a dimension, numeric
    range, and categorical domain — with exact violation counts and a
    pass verdict. This is the admission gate a training-data pipeline
    runs on every landed partition before downstream jobs trust it.

    100 TB shape: the four single-table checks fuse into scans +
    map-side-combinable aggregates (conditional counts); uniqueness is
    one groupBy-free COUNT vs COUNT(DISTINCT) agg; referential
    integrity is a left-anti join that broadcasts the dimension's key
    column. Total cost ≈ one pass over the fact table. Violation ROWS
    (not just counts) route to a dead-letter table in production — the
    same pattern as q_decode_dead_letter."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("constraint_name"),
            F.coalesce(F.col("violations"), F.lit(0))
            .cast("long")
            .alias("violations"),
        )

    not_null = check(
        "orderkey_not_null",
        o.agg(
            F.count_if(F.col("o_orderkey").isNull()).alias("violations")
        ),
    )
    unique = check(
        "orderkey_unique",
        o.agg(
            (F.count("*") - F.countDistinct("o_orderkey")).alias("violations")
        ),
    )
    referential = check(
        "custkey_references_customer",
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti").agg(
            F.count("*").alias("violations")
        ),
    )
    in_range = check(
        "totalprice_positive_bounded",
        o.agg(
            F.count_if(
                (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > 1_000_000)
            ).alias("violations")
        ),
    )
    domain = check(
        "orderstatus_in_domain",
        o.agg(
            F.count_if(~F.col("o_orderstatus").isin("O", "F", "P")).alias(
                "violations"
            )
        ),
    )
    return (
        not_null.unionByName(unique)
        .unionByName(referential)
        .unionByName(in_range)
        .unionByName(domain)
        .withColumn("passed", F.col("violations") == 0)
    )


@query(
    "q_sketch_sliding_distinct",
    oracle=EVENTS_US
    + """
    , days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events_us)
    SELECT d.day,
           (SELECT CAST(COUNT(DISTINCT e.user_id) AS BIGINT)
            FROM events_us e
            WHERE date_trunc('day', e.ts)
                  BETWEEN d.day - INTERVAL 6 DAY AND d.day) AS users_7d
    FROM days d
    """,
    tags=("scale", "sketch", "window"),
)
def q_sketch_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window EXACT distinct count — trailing-7-day active
    users per day — via windowed bitmap OR-merge: the one distinct-
    count shape neither plain COUNT(DISTINCT) nor HLL rollups serve
    well (a naive per-window recount re-reads 7× the data; HLL loses
    exactness). Raw events aggregate ONCE into per-(day, id-bucket)
    bitmaps; each day's trailing window OR-merges ≤7 bitmap rows per
    bucket (RANGE-framed on day number, so calendar gaps stay
    correct); counts sum over buckets.

    The (day × bucket) spine is densified before the window — a bucket
    with no NEW users on day D must still contribute its D−3 bitmap to
    D's window, which a row-less (D, bkt) would silently drop.

    100 TB shape: the only fact-scale operation is the one bitmap
    aggregate (map-side combined); the window runs over |days|×|buckets|
    kilobyte rows. Every trailing-window width reuses the SAME stored
    sketches — this is the materialized continuous-aggregate pattern
    for sliding distincts."""
    e = load_table(spark, sf_dir, "events")
    by_day = e.select(
        F.date_trunc("day", "ts").alias("day"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "day_num"
        ),
        "user_id",
    )
    sketch = by_day.groupBy(
        "day", "day_num", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
    )
    days = by_day.select("day", "day_num").distinct()
    bkts = sketch.select("bkt").distinct()
    spine = days.crossJoin(F.broadcast(bkts))
    full = spine.join(sketch, ["day", "day_num", "bkt"], "left")
    w = (
        Window.partitionBy("bkt")
        .orderBy("day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    merged = full.withColumn("bm7", F.expr("bitmap_or_agg(bm)").over(w))
    return merged.groupBy("day").agg(
        F.sum(F.expr("bitmap_count(bm7)")).cast("long").alias("users_7d")
    )


ANOMALY_PCT = 50  # flag days deviating >50% from trailing-7-day median


@query(
    "q_dq_volume_anomaly",
    oracle=EVENTS_US
    + """
    , daily AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events_us GROUP BY 1
    ),
    scored AS (
        SELECT day, n,
               list_sort(list(n) OVER (ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) AS win
        FROM daily
    )
    SELECT day, n,
           CAST(win[(len(win) + 1) // 2] AS BIGINT) AS med7,
           CAST(ABS(n - win[(len(win) + 1) // 2]) * 100
                > 50 * win[(len(win) + 1) // 2] AS BOOLEAN) AS is_anomaly
    FROM scored WHERE len(win) > 0
    """,
    tags=("scale", "dq", "window"),
)
def q_dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline volume-anomaly audit: each day's event count compared
    to the trailing-7-day MEDIAN; days deviating more than 50% are
    flagged — the drop/spike detector every ingest pipeline runs
    before letting a day's partition promote to "published". Median
    (not mean) so a single bad day doesn't poison the baseline that
    judges the next ones.

    The median is the exact LOWER order statistic — element
    ⌈k/2⌉ of the sorted ≤7-count window, computed identically in both
    engines as a sorted-list pick (Spark bans median() with a window
    frame, and interpolated medians would reintroduce float math); the
    anomaly test cross-multiplies exact int64 (|n − med|·100 > 50·med),
    so no float threshold anywhere.

    100 TB shape: the only fact-scale work is the per-day count
    (map-side combined to |days| rows); the window runs over the tiny
    daily frame. This composes with q_sketch_sliding_distinct's spine:
    one daily-stats table serves volume, distinct, and anomaly audits
    without re-touching raw data."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    scored = daily.withColumn(
        "win", F.sort_array(F.collect_list("n").over(w))
    )
    med7 = F.element_at("win", ((F.size("win") + 1) / 2).cast("int")).cast(
        "long"
    )
    dev = F.abs(F.col("n") - med7)
    return scored.filter(F.size("win") > 0).select(
        "day",
        "n",
        med7.alias("med7"),
        (dev * 100 > ANOMALY_PCT * med7).alias("is_anomaly"),
    )


DRIFT_PERMILLE = 50  # flag columns whose null rate moved > 5 percentage points


@query(
    "q_dq_schema_drift",
    oracle=f"""
    WITH gen_a AS (
        SELECT o_totalprice, o_orderpriority FROM orders
        WHERE o_orderkey % 2 = 0
    ),
    gen_b AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN NULL
                    ELSE o_totalprice END AS o_totalprice,
               o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1
    ),
    stats AS (
        SELECT 'o_totalprice' AS col,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM gen_a) AS n_a,
               (SELECT CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT)
                FROM gen_a) AS nulls_a,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM gen_b) AS n_b,
               (SELECT CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT)
                FROM gen_b) AS nulls_b
        UNION ALL
        SELECT 'o_orderpriority',
               (SELECT COUNT(*) FROM gen_a),
               (SELECT COUNT(*) - COUNT(o_orderpriority) FROM gen_a),
               (SELECT COUNT(*) FROM gen_b),
               (SELECT COUNT(*) - COUNT(o_orderpriority) FROM gen_b)
    )
    SELECT col, n_a, nulls_a, n_b, nulls_b,
           CAST(ABS(nulls_a * n_b - nulls_b * n_a) * 1000
                > {DRIFT_PERMILLE} * n_a * n_b AS BOOLEAN) AS drifted
    FROM stats
    """,
    tags=("scale", "dq"),
)
def q_dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landing-zone drift audit: per-column null rates compared across
    two table generations (here: the even-key image vs an odd-key image
    whose o_totalprice nulls out for finished orders — the silent
    upstream change this audit exists to catch before it poisons
    downstream aggregates). A column drifts when its null rate moves
    more than 5 points.

    The rate comparison never divides: |nulls_a·n_b − nulls_b·n_a|·1000
    > 50·n_a·n_b cross-multiplies exact int64 counts, so both engines
    flag identically.

    100 TB shape: each generation contributes ONE wide aggregate
    (count + per-column null counts fused in a single pass — the same
    shape as q_profile_table); the drift compare runs on a
    columns-count-sized frame. Composes with src_schema_evolution
    (added columns back-fill NULL, which this audit surfaces as 100%
    null rate on the old generation)."""
    o = load_table(spark, sf_dir, "orders")
    gen_a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_totalprice", "o_orderpriority"
    )
    gen_b = o.filter(F.col("o_orderkey") % 2 == 1).select(
        F.when(F.col("o_orderstatus") == "F", F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderpriority",
    )

    def profile(g: DataFrame, suffix: str) -> DataFrame:
        agg = g.agg(
            F.count("*").alias("n"),
            (F.count("*") - F.count("o_totalprice")).alias("nulls_tp"),
            (F.count("*") - F.count("o_orderpriority")).alias("nulls_op"),
        )
        return agg.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("o_totalprice").alias("col"),
                        F.col("n").alias(f"n_{suffix}"),
                        F.col("nulls_tp").alias(f"nulls_{suffix}"),
                    ),
                    F.struct(
                        F.lit("o_orderpriority").alias("col"),
                        F.col("n").alias(f"n_{suffix}"),
                        F.col("nulls_op").alias(f"nulls_{suffix}"),
                    ),
                )
            ).alias("s")
        ).select("s.*")

    a = profile(gen_a, "a")
    b = profile(gen_b, "b")
    joined = a.join(b, "col")
    drift = (
        F.abs(
            F.col("nulls_a") * F.col("n_b") - F.col("nulls_b") * F.col("n_a")
        )
        * 1000
        > DRIFT_PERMILLE * F.col("n_a") * F.col("n_b")
    )
    return joined.select(
        "col", "n_a", "nulls_a", "n_b", "nulls_b", drift.alias("drifted")
    )
