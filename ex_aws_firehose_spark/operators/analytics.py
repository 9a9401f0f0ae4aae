"""Event-analytics operator surface ([EXT], SURVEY.md §2.4 extension):
cohort retention, slowly-changing-dimension (SCD2) intervalization, and
ordered funnel analysis — the workhorse composite shapes a log-delivery
pipeline's downstream consumers run over the delivered events.

All are pure DataFrame compositions (windows + joins + aggs) with
DuckDB oracles; each docstring carries the 100 TB shape analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_aws_firehose_spark.functions.text import duck_hex_hash, hex_hash
from ex_aws_firehose_spark.registry import query
from ex_aws_firehose_spark.tables import load_table

# DuckDB reads the raw ns-precision timestamps; Spark reads µs (see
# operators/relational.py EVENTS_US).
EVENTS_US = (
    "WITH events_us AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value, props FROM events)"
)


@query(
    "q_retention_cohort",
    oracle=EVENTS_US
    + """
    , firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events_us GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
        FROM events_us e JOIN firsts f USING (user_id)
    )
    SELECT cohort_day, day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity GROUP BY cohort_day, day_offset
    """,
    tags=("analytics",),
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen day, counted
    on each later active day (day offset from cohort entry). Shape: one
    agg on user_id for cohort entry (min date), broadcast-or-shuffle
    join back to activity, distinct, count. At 100 TB the firsts table
    is |users| rows — orders of magnitude smaller than events — so the
    join broadcasts per-executor and events never shuffles; the distinct
    + final agg shuffle only (user, cohort, offset) triples."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        e.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_active")
    )


@query(
    "q_scd2_intervals",
    oracle=EVENTS_US
    + """
    , ordered AS (
        SELECT user_id, event_type, ts,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events_us
    ),
    changes AS (
        SELECT user_id, event_type, ts FROM ordered
        WHERE prev_type IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
           CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                AS BOOLEAN) AS is_current
    FROM changes
    """,
    tags=("analytics",),
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) intervalization: collapse the
    per-user event_type stream into [valid_from, valid_to) change
    intervals with an is_current flag — the standard CDC→dimension
    build. Two windows over the same (user_id, ts) sort: Catalyst
    executes them in one shuffle + one sort (same partitioning/ordering
    spec). At 100 TB this is a single shuffle on user_id; the change
    filter drops consecutive duplicates before the second window sees
    them."""
    e = load_table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w_lag))
        .filter(
            ~F.col("prev_type").eqNullSafe(F.col("event_type"))
        )
        .select("user_id", "event_type", "ts")
    )
    w_lead = Window.partitionBy("user_id").orderBy("ts")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w_lead).alias("valid_to"),
        F.lead("ts").over(w_lead).isNull().alias("is_current"),
    )


@query(
    "q_sessionize_funnel",
    oracle=EVENTS_US
    + """
    , v AS (SELECT user_id, MIN(ts) AS t_view FROM events_us
            WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events_us e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t_view
            AND e.ts <= v.t_view + INTERVAL 2 HOUR
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events_us e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            AND e.ts <= c.t_click + INTERVAL 12 HOUR
          GROUP BY e.user_id)
    SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT 'click', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL
    SELECT 'purchase', CAST(COUNT(*) AS BIGINT) FROM p
    """,
    tags=("analytics",),
)
def q_sessionize_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with per-stage time bounds: first view → first
    click within 2 h → first purchase within 12 h, counted per stage.
    Each stage is an agg + join on user_id; all three stages reuse one
    hash partitioning on user_id (no re-shuffle between stages). At
    100 TB: stage frames shrink monotonically, so each later join is
    cheaper; the per-stage MIN keeps state at one row per user (the
    same bound a streaming CEP implementation would hold in its state
    store)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    # Reuse one partitioning: pre-shuffle events on user_id so every
    # stage's agg and join consume the same exchange.
    e = e.repartition("user_id")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 2 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 12 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    out = None
    for stage, df in (("view", v), ("click", c), ("purchase", p)):
        row = df.agg(F.count("*").alias("n_users")).select(
            F.lit(stage).alias("stage"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "q_timeseries_gapfill",
    oracle=EVENTS_US
    + """
    , b AS (
        SELECT event_type,
               date_trunc('hour', ts) AS hr,
               COUNT(*) AS n,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM events_us GROUP BY 1, 2
    ),
    rng AS (SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM b GROUP BY 1),
    spine AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
        FROM rng
    )
    SELECT s.event_type, s.hr AS hour,
           CAST(COALESCE(b.n, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(b.cents, 0) AS BIGINT) AS value_cents
    FROM spine s LEFT JOIN b USING (event_type, hr)
    """,
    tags=("analytics", "timeseries"),
)
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style downsample + gap-fill: events roll up to an
    hourly grain per type, then a dense hourly spine (generated from
    each type's min/max hour — no calendar table needed) left-joins the
    rollup and zero-fills silent hours. The shape behind every
    monitoring/continuous-aggregate view over the delivered stream.

    Scale: the rollup is one hash agg on (type, hour) — low cardinality,
    map-side combined; the spine is sequence+explode off the tiny
    per-type range frame and broadcast back against the rollup, so
    nothing large ever shuffles twice. Values aggregate as exact integer
    cents (float parity convention, relational.py:13)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
    )
    rng = hourly.groupBy("event_type").agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    spine = rng.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    return spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("cents", F.lit(0)).alias("value_cents"),
    )


@query(
    "q_sessionize_gap",
    oracle=EVENTS_US
    + """
    , ordered AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events_us
    ),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL 12 HOUR
                    THEN 1 ELSE 0 END AS brk
        FROM ordered
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("analytics", "session"),
)
def q_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization — the classic counterpart of the
    streaming `session_window` (q_stream_session): a new session starts
    whenever a user's inter-event gap exceeds 12 h, sessions numbered
    by a running sum of break flags, then rolled up to (start, end,
    n_events) intervals. Deterministic tie-break on (ts, event_id) in
    every window spec so both engines number identically.

    100 TB shape: lag, running sum, and the final rollup all share one
    (user_id) hash partitioning and one (ts, event_id) sort — Catalyst
    plans a single Exchange + single Sort for the whole chain; the
    session agg is map-side combinable after that. This is the
    bounded-memory alternative to collect_list-per-user sessionizers,
    which break at whale users."""
    e = load_table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = 12 * 3600 * 1_000_000
    flagged = e.withColumn(
        "brk",
        F.when(
            F.lag("ts").over(w_lag).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_lag))
                > gap_us
            ),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("brk").over(w_run))
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


@query(
    "q_sessionize_native",
    oracle=EVENTS_US
    + """
    , ordered AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events_us
    ),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts >= INTERVAL 12 HOUR
                    THEN 1 ELSE 0 END AS brk
        FROM ordered
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 12 HOUR AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("analytics", "sessionize"),
)
def q_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via the BUILT-IN batch ``session_window`` —
    the native counterpart of q_sessionize_gap's hand-rolled
    lag/running-sum chain, kept side by side because their boundary
    semantics differ and the difference matters at audit time:
    session_window merges events whose [ts, ts+gap) windows OVERLAP
    (a gap of exactly 12 h starts a NEW session — strict <), while the
    classic formulation continues on ties (breaks only when gap >
    12 h); the oracle here encodes the native >= break rule, and
    window.end is max(ts) + gap, not max(ts). Engine-wise,
    session_window plans as a dedicated SessionWindow aggregation
    (merging session state map-side) rather than two analytic windows
    + a groupBy — one Exchange either way, but no Sort-based window
    operators.

    100 TB shape: same single (user_id) exchange as the hand-rolled
    form; the native operator's session-merge is an aggregation
    (map-side combinable, spillable) instead of a per-partition sorted
    scan, which is also why it is the only form available to
    streaming."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", F.session_window("ts", "12 hours").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q_incremental_agg",
    oracle=EVENTS_US
    + """
    SELECT event_type, date_trunc('day', ts) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events_us GROUP BY 1, 2
    """,
    tags=("analytics", "incremental"),
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a distributive aggregate: the
    materialized daily rollup (rows before a cutoff) is refreshed by
    aggregating ONLY the delta (rows at/after the cutoff) and merging
    partials — COUNTs and SUMs add; the base is never rescanned. The
    oracle recomputes the rollup from scratch over all rows, proving
    merge(base_agg, delta_agg) ≡ full recompute. (Here the "stored"
    base aggregate is derived in-query for the harness; in production
    it's the previously materialized table — the merge is the operator.)

    100 TB shape: this is THE pattern that turns a daily 100 TB rescan
    into a per-batch aggregation of just new data. Works for any
    commutative-monoid aggregate (count/sum/min/max, and the mergeable
    sketches: q_sketch_hll_union, q_sketch_bitmap_rollup); avg/variance
    derive from merged power sums (q_agg_stats_moments)."""
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count("*").alias("n_events"), F.sum("cents").alias("value_cents")
        )

    base_agg = rollup(e.filter(F.col("ts") < cutoff))
    delta_agg = rollup(e.filter(F.col("ts") >= cutoff))
    return (
        base_agg.unionByName(delta_agg)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


INTERVAL_SPAN_US = 30 * 60 * 1_000_000  # each event opens a 30-min interval


@query(
    "q_interval_merge",
    oracle=EVENTS_US
    + f"""
    , iv AS (
        SELECT user_id,
               epoch_us(ts) AS s_us,
               epoch_us(ts) + {INTERVAL_SPAN_US} AS e_us
        FROM events_us
    ),
    flagged AS (
        SELECT user_id, s_us, e_us,
               CASE WHEN s_us > COALESCE(MAX(e_us) OVER (
                        PARTITION BY user_id ORDER BY s_us, e_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                    THEN 1 ELSE 0 END AS is_new
        FROM iv
    ),
    islands AS (
        SELECT user_id, s_us, e_us,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY s_us, e_us
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS span_id
        FROM flagged
    ),
    spans AS (
        SELECT user_id, span_id,
               MIN(s_us) AS span_start_us, MAX(e_us) AS span_end_us
        FROM islands GROUP BY user_id, span_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(span_end_us - span_start_us) AS BIGINT) AS covered_us,
           CAST(MAX(span_end_us - span_start_us) AS BIGINT) AS longest_us
    FROM spans GROUP BY user_id
    """,
    tags=("analytics", "window"),
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-algebra flattening: each event opens a 30-minute
    activity interval; overlapping intervals per user merge into
    maximal spans (the gaps-and-islands dual of q_sessionize_gap, which
    breaks on POINT gaps — this merges RANGES, the primitive behind
    coverage/SLA/uptime math). A span starts where an interval's start
    exceeds the running max of all previous ends; span ids are the
    running sum of those starts.

    All arithmetic in exact int64 epoch-µs — coverage durations sum
    distributively, no float time anywhere.

    100 TB shape: one Exchange on user_id serves both windows (running
    max and running sum share the same (s,e)-sorted frame) and the span
    aggregate; the per-user output is bounded by spans, not events.
    The running-max-over-preceding frame is the one window shape that
    cannot use rangeBetween — it is ROWS-framed by construction, and
    Spark evaluates it in one pass over the sorted partition."""
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.lit(INTERVAL_SPAN_US)).alias("e_us"),
    )
    w_ord = Window.partitionBy("user_id").orderBy("s_us", "e_us")
    prev_max_end = F.max("e_us").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "is_new",
        F.when(F.col("s_us") > F.coalesce(prev_max_end, F.lit(-1)), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "span_id",
        F.sum("is_new").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = islands.groupBy("user_id", "span_id").agg(
        F.min("s_us").alias("span_start_us"),
        F.max("e_us").alias("span_end_us"),
    )
    dur = F.col("span_end_us") - F.col("span_start_us")
    return spans.groupBy("user_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(dur).alias("covered_us"),
        F.max(dur).alias("longest_us"),
    )


@query(
    "q_join_temporal",
    oracle=EVENTS_US
    + """
    , ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events_us
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE prev_type IS DISTINCT FROM event_type
    ),
    dim AS (
        -- event_id tie-breaker mirrors the change-detection lag order:
        -- two state changes at one identical ts stay deterministic and
        -- identical between engines.
        SELECT user_id, event_type AS state, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM changes
    )
    SELECT d.state, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events_us e
    JOIN dim d ON e.user_id = d.user_id
              AND e.ts >= d.valid_from
              AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    GROUP BY 1, 2
    """,
    tags=("analytics", "join"),
)
def q_join_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (point-in-interval) join — "dimension as of event
    time": every event is enriched with the SCD2 state valid at its
    timestamp (the interval build is q_scd2_intervals inline). The
    standard bi-temporal warehouse shape, distinct from q_join_asof:
    as-of picks the latest row ≤ t, temporal asserts containment in
    [valid_from, valid_to) — a half-open partition of each key's
    timeline, so exactly one dim row matches per event.

    100 TB shape: the join is EQUI on user_id — the range condition
    rides as a post-join filter inside the same sort-merge/hash join,
    never a BNLJ, because the equi key carries all the selectivity.
    Fact and dim share the user_id partitioning the dim build already
    produced (one Exchange serves the SCD2 windows AND the join probe).
    Since intervals partition the timeline, the filter keeps exactly
    one of the ~|changes per user| candidates — join fan-out equals
    fact cardinality, no blow-up."""
    e = load_table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w_lag))
        .filter(~F.col("prev_type").eqNullSafe(F.col("event_type")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    # event_id tie-breaker matches the change-detection lag order, so
    # same-ts state changes assign intervals deterministically.
    w_lead = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w_lead).alias("valid_to"),
    )
    return (
        e.join(
            dim,
            (e.user_id == dim.d_user)
            & (e.ts >= dim.valid_from)
            & (dim.valid_to.isNull() | (e.ts < dim.valid_to)),
        )
        .groupBy("state", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "q_funnel_transition_matrix",
    oracle=EVENTS_US
    + """
    , seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events_us
    ),
    pairs AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    tot AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_total
        FROM pairs GROUP BY prev_type
    )
    SELECT p.prev_type, p.next_type, p.n,
           CAST(p.n * 1000000 // t.row_total AS BIGINT) AS prob_ppm
    FROM pairs p JOIN tot t ON p.prev_type = t.prev_type
    """,
    tags=("analytics", "sequence"),
)
def q_funnel_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence transition matrix: per-user event bigrams
    (lag over the (ts, event_id) order) counted into a type→type
    matrix with exact integer transition probabilities (ppm) — the
    Markov-chain view of user journeys that funnel analysis, next-step
    prediction features, and anomaly scoring all start from.

    100 TB shape: ONE exchange on user_id for the lag window (same
    partitioning every sessionize op reuses), then a tiny
    |types|² aggregate; the row-total join broadcasts. Probabilities
    are floor-divided ppm so the matrix hashes identically
    cross-engine."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        pairs.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr("n * 1000000 div row_total").alias("prob_ppm"),
        )
    )


ATTRIB_WINDOW_HOURS = 24


@query(
    "q_attribution_last_touch",
    oracle=EVENTS_US
    + f"""
    , pu AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events_us WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id, ts AS t_ts, event_id AS t_id,
               event_type AS t_type
        FROM events_us WHERE event_type IN ('click', 'view')
    ),
    j AS (
        SELECT pu.p_id, pu.cents, t.t_type, t.t_ts, t.t_id,
               ROW_NUMBER() OVER (
                   PARTITION BY pu.p_id
                   ORDER BY t.t_ts DESC NULLS LAST, t.t_id DESC NULLS LAST
               ) AS rn
        FROM pu LEFT JOIN t
          ON pu.user_id = t.user_id
         AND t.t_ts < pu.p_ts
         AND t.t_ts >= pu.p_ts - INTERVAL {ATTRIB_WINDOW_HOURS} HOUR
    )
    SELECT COALESCE(t_type, 'direct') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM j WHERE rn = 1 GROUP BY COALESCE(t_type, 'direct')
    """,
    tags=("analytics", "attribution"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent click/view inside a 24 h lookback window
    (latest (ts, event_id) wins — deterministic), unmatched purchases
    fall to 'direct'; revenue rolls up per touch type in exact cents.

    100 TB shape: the touch join is an EQUI join on user_id carrying
    the time band as an in-join filter (the q_join_temporal pattern —
    never a BNLJ); per-purchase argmax is max(struct(ts, id, type)),
    which partial-aggregates map-side, so the shuffle carries one row
    per purchase, not one per candidate touch."""
    e = load_table(spark, sf_dir, "events")
    pu = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("t_type"),
    )
    j = pu.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_HOURS} HOURS")
        ),
        "left",
    )
    best = j.groupBy("p_id", "cents").agg(
        F.max(
            F.when(
                F.col("t_ts").isNotNull(),
                F.struct("t_ts", "t_id", "t_type"),
            )
        ).alias("b")
    )
    return (
        best.select(
            F.coalesce(F.col("b.t_type"), F.lit("direct")).alias(
                "touch_type"
            ),
            "cents",
        )
        .groupBy("touch_type")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("cents").alias("attributed_cents"),
        )
    )


@query(
    "q_attribution_position",
    oracle=EVENTS_US
    + f"""
    , pu AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events_us WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id, ts AS t_ts, event_id AS t_id,
               event_type AS t_type
        FROM events_us WHERE event_type IN ('click', 'view')
    ),
    j AS (
        SELECT pu.p_id, pu.cents, t.t_type, t.t_id,
               ROW_NUMBER() OVER (PARTITION BY pu.p_id
                                  ORDER BY t.t_ts, t.t_id) AS rn,
               CAST(COUNT(t.t_id) OVER (PARTITION BY pu.p_id) AS BIGINT)
                   AS n
        FROM pu LEFT JOIN t
          ON pu.user_id = t.user_id
         AND t.t_ts < pu.p_ts
         AND t.t_ts >= pu.p_ts - INTERVAL {ATTRIB_WINDOW_HOURS} HOUR
    ),
    credited AS (
        SELECT CASE WHEN n = 0 THEN 'direct' ELSE t_type END AS touch_type,
               cents,
               CASE
                   WHEN n = 0 THEN 1000
                   WHEN n = 1 THEN 1000
                   WHEN n = 2 THEN 500
                   WHEN rn = 1 OR rn = n THEN 400
                   ELSE 200 // (n - 2)
                        + CASE WHEN rn - 1 <= 200 % (n - 2)
                               THEN 1 ELSE 0 END
               END AS permille
        FROM j
    )
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(permille) AS BIGINT) AS credit_permille,
           CAST(SUM(cents * permille) AS BIGINT) AS attributed_cpm
    FROM credited GROUP BY touch_type
    """,
    tags=("analytics", "attribution"),
)
def q_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) attribution — the multi-touch model
    between last-touch (q_attribution_last_touch) and Markov removal
    (q_attribution_markov_removal): within the same 24 h lookback, the
    FIRST and LAST touch each earn 40 % of the conversion credit and
    the middles split the remaining 20 % evenly.  Credit is exact
    integer permille — 200 div (n−2) per middle with the remainder
    dealt to the earliest middles — so every purchase's credits sum to
    exactly 1000 and the rollup is overflow-checked int64 (cents ×
    permille ≤ 1e9/purchase; safe past 1e9 purchases, then pre-divide).
    Untouched purchases credit 'direct' in full.

    100 TB shape: identical join geometry to last-touch (user_id equi
    join, time band in-join), then ONE per-purchase window pass for
    (rn, n) — no second shuffle since both window functions share the
    p_id partitioning; the rollup is a tiny hash agg on touch type."""
    e = load_table(spark, sf_dir, "events")
    pu = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("t_type"),
    )
    j = pu.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_HOURS} HOURS")
        ),
        "left",
    )
    wp = Window.partitionBy("p_id")
    rn = F.row_number().over(wp.orderBy("t_ts", "t_id"))
    n = F.count("t_id").over(wp)
    ranked = j.select(
        "p_id", "cents", "t_type", rn.alias("rn"), n.alias("n")
    )
    permille = (
        F.when(F.col("n") <= 1, 1000)
        .when(F.col("n") == 2, 500)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 400)
        .otherwise(
            F.expr("200 div (n - 2)")
            + F.when(F.col("rn") - 1 <= F.expr("200 % (n - 2)"), 1).otherwise(0)
        )
    )
    credited = ranked.select(
        F.when(F.col("n") == 0, "direct")
        .otherwise(F.col("t_type"))
        .alias("touch_type"),
        "cents",
        permille.alias("permille"),
    )
    return credited.groupBy("touch_type").agg(
        F.count("*").alias("n_touches"),
        F.sum("permille").alias("credit_permille"),
        F.sum(F.col("cents") * F.col("permille")).alias("attributed_cpm"),
    )


@query(
    "q_timeseries_changepoint",
    oracle=EVENTS_US
    + """
    , daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events_us GROUP BY event_type, CAST(ts AS DATE)
    ),
    pre AS (
        SELECT event_type, day, cents,
               CAST(SUM(cents) OVER w AS BIGINT) AS s_i,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS i,
               CAST(SUM(cents) OVER p AS BIGINT) AS s_tot,
               CAST(COUNT(*) OVER p AS BIGINT) AS n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               p AS (PARTITION BY event_type)
    ),
    scored AS (
        SELECT event_type, day, i, n, s_i, s_tot,
               CAST(s_i AS DOUBLE) * s_i / i
               + CAST(s_tot - s_i AS DOUBLE) * (s_tot - s_i) / (n - i)
               - CAST(s_tot AS DOUBLE) * s_tot / n AS r_gain
        FROM pre WHERE i < n
    ),
    best AS (
        SELECT event_type, day, i, n, s_i, s_tot, r_gain,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY r_gain DESC, day) AS rn
        FROM scored
    )
    SELECT event_type, n AS n_points, day AS split_day, r_gain,
           CAST(s_i // i AS BIGINT) AS left_mean_cents,
           CAST((s_tot - s_i) // (n - i) AS BIGINT) AS right_mean_cents
    FROM best WHERE rn = 1
    """,
    tags=("analytics", "timeseries"),
)
def q_timeseries_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection (one round of binary segmentation):
    per event type's daily revenue series, pick the split that
    maximizes the between-segment variance explained, R(i) = S_i²/i +
    (S−S_i)²/(n−i) − S²/n — the exact objective CUSUM
    (q_timeseries_cusum) only thresholds.  Prefix sums are exact int64;
    R is three IEEE ops on those integers, so even the gain DOUBLE
    hash-matches DuckDB; ties break to the earliest day.  Emits the
    split day and the exact integer segment means (floor division).

    100 TB shape: the candidate scan is ONE cumulative window over the
    per-key series (already aggregated to key×day grain — catalog-sized,
    not event-sized); recursing into segments for k changepoints
    re-runs the same window on day ranges, never re-reading events."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.round(F.col("value") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("cents"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day",
        F.sum("cents").over(wcum).alias("s_i"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("i"),
        F.sum("cents").over(wall).alias("s_tot"),
        F.count("*").over(wall).alias("n"),
    )
    r_gain = (
        F.col("s_i").cast("double") * F.col("s_i") / F.col("i")
        + (F.col("s_tot") - F.col("s_i")).cast("double")
        * (F.col("s_tot") - F.col("s_i"))
        / (F.col("n") - F.col("i"))
        - F.col("s_tot").cast("double") * F.col("s_tot") / F.col("n")
    )
    scored = pre.filter(F.col("i") < F.col("n")).select(
        "event_type", "day", "i", "n", "s_i", "s_tot",
        r_gain.alias("r_gain"),
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.desc("r_gain"), "day"
    )
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_points"),
            F.col("day").alias("split_day"),
            "r_gain",
            F.expr("s_i div i").alias("left_mean_cents"),
            F.expr("(s_tot - s_i) div (n - i)").alias("right_mean_cents"),
        )
    )


MULTI_CP_ROUNDS = 3  # binary-segmentation rounds (k = 3 candidates)
MCP_PEN = 2  # BIC-style multiplier: lambda = PEN * sigma2 * bitlength(n)


def _multi_cp_oracle() -> str:
    """Unrolled DuckDB replay of MULTI_CP_ROUNDS binary-segmentation
    rounds: each round re-runs the single-changepoint window PER
    SEGMENT, takes the globally best split per event type (gain DESC,
    earliest day), and relabels segments copy-on-write (left = seg·2,
    right = seg·2+1 — collision-free without knowing the split set).
    A penalized-cost epilogue (r12 ask #7) then chooses k per type:
    argmin over k in 0..K of cost_k + k·lambda, with exact-HUGEINT
    n·Σx²−S² cost seed and the house integer log2 in lambda."""
    parts = [
        EVENTS_US
        + """
    , daily0 AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(0 AS BIGINT) AS seg
        FROM events_us GROUP BY event_type, CAST(ts AS DATE)
    )"""
    ]
    for r in range(1, MULTI_CP_ROUNDS + 1):
        prev = f"daily{r - 1}"
        parts.append(
            f""",
    pre{r} AS (
        SELECT event_type, seg, day, cents,
               CAST(SUM(cents) OVER w AS BIGINT) AS s_i,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS i,
               CAST(SUM(cents) OVER p AS BIGINT) AS s_tot,
               CAST(COUNT(*) OVER p AS BIGINT) AS n
        FROM {prev}
        WINDOW w AS (PARTITION BY event_type, seg ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               p AS (PARTITION BY event_type, seg)
    ),
    scored{r} AS (
        SELECT event_type, seg, day, i, n, s_i, s_tot,
               CAST(s_i AS DOUBLE) * s_i / i
               + CAST(s_tot - s_i AS DOUBLE) * (s_tot - s_i) / (n - i)
               - CAST(s_tot AS DOUBLE) * s_tot / n AS r_gain
        FROM pre{r} WHERE i < n
    ),
    best{r} AS (
        SELECT * FROM (
            SELECT event_type, seg, day, i, n, s_i, s_tot, r_gain,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY r_gain DESC, day) AS rn
            FROM scored{r}
        ) WHERE rn = 1
    ),
    daily{r} AS (
        SELECT d.event_type,
               CASE WHEN d.seg = b.seg
                    THEN d.seg * 2
                         + CASE WHEN d.day <= b.day THEN 0 ELSE 1 END
                    ELSE d.seg * 2 END AS seg,
               d.day, d.cents
        FROM {prev} d LEFT JOIN best{r} b
          ON b.event_type = d.event_type
    )"""
        )
    finals = "\n        UNION ALL ".join(
        f"""SELECT event_type, CAST({r} AS BIGINT) AS round_no,
           day AS split_day, r_gain, n AS n_points,
           CAST(s_i // i AS BIGINT) AS left_mean_cents,
           CAST((s_tot - s_i) // (n - i) AS BIGINT) AS right_mean_cents
    FROM best{r}"""
        for r in range(1, MULTI_CP_ROUNDS + 1)
    )
    parts.append(
        f""",
    rounds AS ({finals}),
    st AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS HUGEINT) AS s,
               SUM(CAST(cents AS HUGEINT) * cents) AS ss
        FROM daily0 GROUP BY event_type
    ),
    pen AS (
        SELECT event_type, n,
               CAST(n * ss - s * s AS DOUBLE) / n AS cost0,
               CAST(n * ss - s * s AS DOUBLE) / n / n
                   * length(printf('%b', n)) * {MCP_PEN} AS lam
        FROM st
    ),
    cum AS (
        SELECT event_type, round_no,
               SUM(r_gain) OVER (PARTITION BY event_type ORDER BY round_no
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_gain
        FROM rounds
    ),
    allk AS (
        SELECT event_type, CAST(0 AS BIGINT) AS k, cost0 AS pcost FROM pen
        UNION ALL
        SELECT c.event_type, c.round_no AS k,
               (p.cost0 - c.cum_gain) + c.round_no * p.lam AS pcost
        FROM cum c JOIN pen p USING (event_type)
    ),
    chosen AS (
        SELECT event_type, k AS chosen_k FROM (
            SELECT event_type, k,
                   row_number() OVER (PARTITION BY event_type
                       ORDER BY pcost, k) AS rn
            FROM allk
        ) WHERE rn = 1
    )
    SELECT r.event_type, r.round_no, r.split_day, r.r_gain, r.n_points,
           r.left_mean_cents, r.right_mean_cents,
           ch.chosen_k, r.round_no <= ch.chosen_k AS accepted,
           p.lam AS penalty_lambda, p.cost0 AS cost_k0,
           (p.cost0 - c.cum_gain) + r.round_no * p.lam AS penalized_cost
    FROM rounds r
    JOIN chosen ch USING (event_type)
    JOIN pen p USING (event_type)
    JOIN cum c ON c.event_type = r.event_type
               AND c.round_no = r.round_no"""
    )
    return "".join(parts)


@query(
    "q_timeseries_multi_changepoint",
    oracle=_multi_cp_oracle(),
    tags=("analytics", "timeseries"),
)
def q_timeseries_multi_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTI-changepoint detection — q_timeseries_changepoint's binary
    segmentation recursed for ``MULTI_CP_ROUNDS`` rounds (VERDICT r11
    ask #7): round r re-runs the exact int64 prefix-sum window WITHIN
    each current segment of the per-type daily-revenue series, scores
    every candidate split by the same between-variance objective
    R(i) = S_i²/i + (S−S_i)²/(n−i) − S²/n (relative to its segment),
    and commits the single globally best split per event type (gain
    DESC, earliest-day ties). Segment labels relabel copy-on-write
    (left seg·2, right seg·2+1), so boundaries always PARTITION the
    calendar. Emits one row per (event type, round): split day, gain,
    split-segment size, and exact integer sub-segment means.

    STOP RULE (VERDICT r12 ask #7 — data-chosen round count): per
    event type, chosen_k = argmin over k in 0..K of the penalized
    cost cost_0 − Σ_{r≤k} gain_r + k·λ with the BIC-style penalty
    λ = MCP_PEN · (cost_0/n) · (⌊log₂n⌋+1), the BIT LENGTH of n
    (length(printf('%b',n)) / conv(...,2) on the two engines — one
    more than the integer log, ADVICE r13; cost seed
    n·Σx²−S² exact in DECIMAL(38,0) / HUGEINT — cents² sums wrap
    int64 in exactly the regime a stop rule matters). Rounds past
    chosen_k are still emitted, flagged accepted=false. On this
    fixture every type chooses k=0 — daily revenue is stationary
    noise (measured gains ≈ 2σ̂² vs λ ≈ 10σ̂²), the refusal a
    penalty exists to make; the law test constructs a level-shifted
    series and pins that the rule then accepts round 1 (and the
    argmin law over 0..K, recomputed from the emitted columns).

    Invariant note (pinned in tests/test_new_key_invariants.py): the
    monotone quantity across rounds is the total within-segment COST —
    every committed gain is ≥ 0 (variance decomposition), so cost_r =
    cost_{r-1} − gain_r never increases. The raw argmax gain sequence
    itself is NOT guaranteed non-increasing for binary segmentation —
    counterexample [0, 10, 0]: the best first split gains 16.7, then
    the [10, 0] child's split gains 50, because a child's gain is
    measured relative to its own segment, territory the parent's
    argmax never explored. Measured on this fixture the gain sequence
    is indeed non-monotone for several event types.

    100 TB shape: identical to the single-split key — all rounds run
    at key×day grain (catalog-sized after the one events agg, which is
    map-side combinable); each round is two windows over ≤|days| rows
    per key and a broadcast of the ≤|event types|-row split table;
    the events table is read ONCE regardless of round count; the stop
    rule adds only |event types|-row aggregates and broadcasts."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.round(F.col("value") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("cents"))
        .withColumn("seg", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    # Penalized-cost seed (r12 ask #7): exact n·Σx²−S² in DECIMAL(38,0)
    # (the house escape hatch — cents² sums can wrap int64 in exactly
    # the regime a stop rule exists for), converted to DOUBLE once in
    # a fixed expression order mirrored by the oracle's HUGEINT path.
    dec = "decimal(38,0)"
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents").cast(dec) * F.col("cents")).alias("ss"),
    )
    cost0n = (
        F.col("n").cast(dec) * F.col("ss")
        - F.col("s").cast(dec) * F.col("s").cast(dec)
    )
    bl = F.length(F.conv(F.col("n").cast("string"), 10, 2))
    pen = stats.select(
        "event_type",
        (cost0n.cast("double") / F.col("n")).alias("cost0"),
        (
            cost0n.cast("double")
            / F.col("n")
            / F.col("n")
            * bl
            * F.lit(MCP_PEN)
        ).alias("lam"),
    ).localCheckpoint()
    r_gain = (
        F.col("s_i").cast("double") * F.col("s_i") / F.col("i")
        + (F.col("s_tot") - F.col("s_i")).cast("double")
        * (F.col("s_tot") - F.col("s_i"))
        / (F.col("n") - F.col("i"))
        - F.col("s_tot").cast("double") * F.col("s_tot") / F.col("n")
    )
    outs = []
    for r in range(1, MULTI_CP_ROUNDS + 1):
        wseq = Window.partitionBy("event_type", "seg").orderBy("day")
        wcum = wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wp = Window.partitionBy("event_type", "seg")
        pre = daily.select(
            "event_type",
            "seg",
            "day",
            "cents",
            F.sum("cents").over(wcum).alias("s_i"),
            F.row_number().over(wseq).cast("long").alias("i"),
            F.sum("cents").over(wp).alias("s_tot"),
            F.count("*").over(wp).alias("n"),
        )
        scored = pre.filter(F.col("i") < F.col("n")).select(
            "event_type", "seg", "day", "i", "n", "s_i", "s_tot",
            r_gain.alias("r_gain"),
        )
        wbest = Window.partitionBy("event_type").orderBy(
            F.desc("r_gain"), "day"
        )
        best = (
            scored.withColumn("rn", F.row_number().over(wbest))
            .filter(F.col("rn") == 1)
            .localCheckpoint()
        )
        outs.append(
            best.select(
                "event_type",
                F.lit(r).cast("long").alias("round_no"),
                F.col("day").alias("split_day"),
                "r_gain",
                F.col("n").alias("n_points"),
                F.expr("s_i div i").alias("left_mean_cents"),
                F.expr("(s_tot - s_i) div (n - i)").alias(
                    "right_mean_cents"
                ),
            )
        )
        bsel = best.select(
            "event_type",
            F.col("seg").alias("bseg"),
            F.col("day").alias("bday"),
        )
        daily = (
            daily.join(F.broadcast(bsel), "event_type", "left")
            .select(
                "event_type",
                F.when(
                    F.col("seg") == F.col("bseg"),
                    F.col("seg") * 2
                    + F.when(F.col("day") <= F.col("bday"), 0).otherwise(1),
                )
                .otherwise(F.col("seg") * 2)
                .alias("seg"),
                "day",
                "cents",
            )
            .localCheckpoint()
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    # Stop rule: chosen k = argmin over k in 0..K of penalized cost
    # cost_0 − Σ_{r<=k} gain_r + k·λ (ties → smallest k). Rounds past
    # chosen_k are emitted but flagged accepted=false — the caller's
    # data-chosen round count.
    wcumr = (
        Window.partitionBy("event_type")
        .orderBy("round_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = out.select(
        "event_type",
        "round_no",
        F.sum("r_gain").over(wcumr).alias("cum_gain"),
    )
    pcost = (F.col("cost0") - F.col("cum_gain")) + F.col(
        "round_no"
    ) * F.col("lam")
    allk = (
        pen.select(
            "event_type",
            F.lit(0).cast("long").alias("k"),
            F.col("cost0").alias("pcost"),
        )
        .unionByName(
            cum.join(F.broadcast(pen), "event_type").select(
                "event_type",
                F.col("round_no").alias("k"),
                pcost.alias("pcost"),
            )
        )
    )
    wmin = Window.partitionBy("event_type").orderBy("pcost", "k")
    chosen = (
        allk.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("k").alias("chosen_k"))
    )
    return (
        out.join(F.broadcast(chosen), "event_type")
        .join(F.broadcast(pen), "event_type")
        .join(F.broadcast(cum), ["event_type", "round_no"])
        .select(
            "event_type",
            "round_no",
            "split_day",
            "r_gain",
            "n_points",
            "left_mean_cents",
            "right_mean_cents",
            "chosen_k",
            (F.col("round_no") <= F.col("chosen_k")).alias("accepted"),
            F.col("lam").alias("penalty_lambda"),
            F.col("cost0").alias("cost_k0"),
            pcost.alias("penalized_cost"),
        )
    )


@query(
    "q_regression_ols",
    oracle=EVENTS_US
    + """
    , daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events_us GROUP BY event_type, CAST(ts AS DATE)
    ),
    xy AS (
        SELECT event_type,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY day) AS BIGINT) AS x,
               cents AS y
        FROM daily
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM xy GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS varx_num,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / (n * sxx - sx * sx) AS slope,
           (sy - CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx) * sx) / n AS intercept,
           CAST(n * sxy - sx * sy AS DOUBLE)
               * (n * sxy - sx * sy)
               / ((n * sxx - sx * sx)
                  * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
    FROM s
    """,
    tags=("analytics", "timeseries"),
)
def q_regression_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key simple linear regression (trend fit): OLS of daily
    revenue on the day index per event type — slope (cents/day),
    intercept, and r² from the five classic co-moment sums, all exact
    int64 (the rolling-corr/ACF recipe) with IEEE-deterministic final
    ratios, so even the DOUBLEs hash-match DuckDB.  cov and var
    numerators are also emitted as exact integers — the form a driver
    compares against thresholds without float questions.  Int64 bound:
    the BINDING term is the r² denominator's n·Σy² ≤ n²·y_max², i.e.
    n·y_max < 3·10⁹ jointly — ~300 days at $100k/day (10⁷ cents),
    ~3000 days at $10k/day; the moment product n·Σxy ≤ n³·y_max binds
    later.  Past that, pre-center y once (subtract the integer mean)
    as documented for q_agg_gini, which shrinks Σy² to deviation
    scale.

    100 TB shape: the fit consumes the key×day aggregate (catalog-
    sized), ONE row_number window per key for the x index, then a
    map-side-combined co-moment agg — events are touched once at the
    daily rollup; per-key output is 1 row."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.round(F.col("value") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("y"))
    )
    xy = daily.select(
        "event_type",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("x"),
        "y",
    )
    s = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov.cast("double") / varx
    return s.select(
        "event_type",
        "n",
        cov.alias("cov_num"),
        varx.alias("varx_num"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
        (cov.cast("double") * cov / (varx * vary.cast("double"))).alias("r2"),
    )


AB_CHI2_X1M = 3_841_459  # 3.84 critical value (α=0.05, df=1), ×1e6


@query(
    "q_ab_srm_check",
    oracle=EVENTS_US
    + f"""
    , u AS (
        SELECT user_id,
               {duck_hex_hash("CAST(user_id AS VARCHAR)")} % 2 AS arm,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events_us GROUP BY user_id
    ),
    a AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted
        FROM u GROUP BY arm
    ),
    w AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n_users END) AS n0,
               MAX(CASE WHEN arm = 1 THEN n_users END) AS n1,
               MAX(CASE WHEN arm = 0 THEN n_converted END) AS c0,
               MAX(CASE WHEN arm = 1 THEN n_converted END) AS c1
        FROM a
    )
    SELECT n0, n1, c0, c1,
           CAST(c0 * 1000000 // n0 AS BIGINT) AS conv0_ppm,
           CAST(c1 * 1000000 // n1 AS BIGINT) AS conv1_ppm,
           CAST(CAST(n0 - n1 AS HUGEINT) * (n0 - n1) * 1000000
                // (n0 + n1) AS BIGINT) AS srm_chi2_x1m,
           CAST(CAST(n0 - n1 AS HUGEINT) * (n0 - n1) * 1000000
                // (n0 + n1) AS BIGINT) <= {AB_CHI2_X1M} AS srm_ok
    FROM w
    """,
    tags=("analytics", "experiment"),
)
def q_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment health check: users are deterministically
    assigned to two arms by the engine-portable md5-prefix hash (the
    production trick — assignment is reproducible from the id alone,
    no state), then the sample-ratio-mismatch χ² for the intended
    50/50 split is computed in exact integers ((n0−n1)²·1e6 div
    (n0+n1)) against the 3.84 α=0.05 critical value — THE guardrail
    that invalidates an experiment before anyone reads the metric.
    Per-arm conversion rates land as exact integer ppm.  Int64 bound:
    the (n0−n1)²·1e6 cross-multiply runs in DECIMAL(38)/HUGEINT (the
    q_agg_gini escape hatch) because a true gross mismatch has diff
    O(n) and diff²·1e6 wraps int64 past |diff| ≈ 3·10⁶ — precisely
    the failure the check must catch, so it must not overflow there;
    the χ² OUTPUT is ≤ n·10⁶, inside int64 to ~9·10¹² users.

    100 TB shape: one user-grain hash agg (map-side combined, the
    conversion flag folds into the same pass), then a 2-row pivot —
    assignment adds zero shuffle because the hash is computed inline
    at scan time."""
    e = load_table(spark, sf_dir, "events")
    u = (
        e.select(
            "user_id",
            (F.col("event_type") == "purchase").cast("int").alias("conv"),
        )
        .groupBy("user_id")
        .agg(F.max("conv").alias("converted"))
        .select(
            F.pmod(hex_hash(F.col("user_id").cast("string")), F.lit(2)).alias(
                "arm"
            ),
            "converted",
        )
    )
    a = u.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    w = a.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_converted"))).alias("c1"),
    )
    # The (n0-n1)² cross-multiply runs in DECIMAL(38) (the q_agg_gini
    # escape hatch): a GROSS mismatch has diff O(n), and diff²·1e6
    # wraps int64 past |diff| ≈ 3e6 — exactly the regime the check
    # exists to catch. The chi2 OUTPUT is ≤ n·1e6, back inside int64
    # to ~9e12 users.
    chi2 = F.expr(
        "CAST(CAST(n0 - n1 AS DECIMAL(38, 0)) * (n0 - n1) * 1000000"
        " div (n0 + n1) AS LONG)"
    )
    return w.select(
        "n0",
        "n1",
        "c0",
        "c1",
        F.expr("c0 * 1000000 div n0").alias("conv0_ppm"),
        F.expr("c1 * 1000000 div n1").alias("conv1_ppm"),
        chi2.alias("srm_chi2_x1m"),
        (chi2 <= AB_CHI2_X1M).alias("srm_ok"),
    )


@query(
    "q_funnel_time_to_convert",
    oracle=EVENTS_US
    + """
    , fv AS (
        SELECT user_id, MIN(ts) AS v_ts
        FROM events_us WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
        SELECT f.user_id, f.v_ts, MIN(p.ts) AS p_ts
        FROM fv f JOIN events_us p
          ON p.user_id = f.user_id
         AND p.event_type = 'purchase' AND p.ts > f.v_ts
        GROUP BY f.user_id, f.v_ts
    ),
    lat AS (
        SELECT CAST(v_ts AS DATE) AS cohort_day,
               epoch_us(p_ts) - epoch_us(v_ts) AS lat_us
        FROM fp
    )
    SELECT cohort_day,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           quantile_cont(lat_us, 0.5) AS p50_latency_us,
           quantile_cont(lat_us, 0.9) AS p90_latency_us,
           CAST(MAX(lat_us) AS BIGINT) AS max_latency_us
    FROM lat GROUP BY cohort_day
    """,
    tags=("analytics", "funnel"),
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution — the time dimension the funnel
    keys (q_sessionize_funnel, q_funnel_transition_matrix) don't
    measure: per first-view cohort day, exact interpolated p50/p90 of
    the time from a user's FIRST view to their first purchase AFTER it.
    Latency is exact integer microseconds (unix_micros ↔ epoch_us), so
    the interpolated quantiles are bit-identical cross-engine.

    100 TB shape: two user-grain min-aggregates (map-side combined on
    the same user_id shuffle) joined per user — never event×event; the
    quantile sorts only the converted-user latencies within each
    cohort-day group, catalog-scale cardinality."""
    e = load_table(spark, sf_dir, "events")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    fp = (
        fv.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts")),
        )
        .groupBy("user_id", "v_ts")
        .agg(F.min("p_ts").alias("p_ts"))
    )
    lat = fp.select(
        F.col("v_ts").cast("date").alias("cohort_day"),
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lat_us"),
    )
    return lat.groupBy("cohort_day").agg(
        F.count("*").alias("n_converted"),
        F.percentile("lat_us", F.lit(0.5)).alias("p50_latency_us"),
        F.percentile("lat_us", F.lit(0.9)).alias("p90_latency_us"),
        F.max("lat_us").alias("max_latency_us"),
    )


@query(
    "q_cohort_ltv",
    oracle=EVENTS_US
    + """
    , firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events_us GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_users
        FROM firsts GROUP BY cohort_day
    ),
    rev AS (
        SELECT f.cohort_day,
               datediff('day', f.cohort_day, CAST(e.ts AS DATE))
                   AS day_offset,
               CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM events_us e JOIN firsts f USING (user_id)
        WHERE e.event_type = 'purchase'
        GROUP BY f.cohort_day,
                 datediff('day', f.cohort_day, CAST(e.ts AS DATE))
    ),
    cum AS (
        SELECT cohort_day, day_offset, rev_cents,
               CAST(SUM(rev_cents) OVER (
                   PARTITION BY cohort_day ORDER BY day_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_rev_cents
        FROM rev
    )
    SELECT c.cohort_day, c.day_offset, s.cohort_users,
           c.rev_cents, c.cum_rev_cents,
           CAST(c.cum_rev_cents // s.cohort_users AS BIGINT)
               AS ltv_cents_per_user
    FROM cum c JOIN sizes s USING (cohort_day)
    """,
    tags=("analytics",),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve — the revenue companion of
    q_retention_cohort: per first-seen-day cohort, purchase revenue at
    each day offset plus the running cumulative and the exact per-user
    LTV (cum cents div cohort size) — the table a growth model reads
    LTV(t) asymptotes from.  All exact integer cents; one floor
    division per row.

    100 TB shape: identical geometry to retention — the |users|-row
    firsts table joins back to events broadcast-side so events never
    shuffle; revenue aggregates at (cohort, offset) grain (bounded by
    days², catalog-scale) and the cumsum window runs over that tiny
    frame, not over events."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_users")
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.sum("cents").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.select(
        "cohort_day",
        "day_offset",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("cum_rev_cents"),
    )
    return cum.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "cohort_users",
        "rev_cents",
        "cum_rev_cents",
        F.expr("cum_rev_cents div cohort_users").alias(
            "ltv_cents_per_user"
        ),
    )


# EWMA kernel: dyadic weights 2^(K-1-j) for lag j — α=1/2 smoothing
# truncated to K terms, exact in 64-bit integers in both engines.
EWMA_K = 8
EWMA_W = [1 << (EWMA_K - 1 - j) for j in range(EWMA_K)]


def _ewma_terms(col: str, j: int) -> str:
    """SQL for one weighted lag term (oracle side)."""
    w = EWMA_W[j]
    lag = col if j == 0 else f"LAG({col}, {j}) OVER uw"
    return (
        f"COALESCE({lag} * {w}, 0)",
        f"CASE WHEN {lag} IS NOT NULL THEN {w} ELSE 0 END",
    )


_EWMA_NUM = " + ".join(_ewma_terms("cents", j)[0] for j in range(EWMA_K))
_EWMA_DEN = " + ".join(_ewma_terms("cents", j)[1] for j in range(EWMA_K))


@query(
    "q_window_ewma",
    oracle=EVENTS_US
    + f"""
    , c AS (
        SELECT user_id, event_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events_us
    )
    SELECT user_id, event_id, cents,
           CAST({_EWMA_NUM} AS BIGINT) AS ewma_num,
           CAST({_EWMA_DEN} AS BIGINT) AS ewma_den,
           CAST(({_EWMA_NUM}) // ({_EWMA_DEN}) AS BIGINT) AS ewma_cents
    FROM c
    WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("analytics", "timeseries"),
)
def q_window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user — the smoothing
    primitive behind alerting baselines and trend dashboards. The
    kernel is α=1/2 truncated to 8 lags with dyadic integer weights
    (128,64,…,1), so numerator/denominator stay exact 64-bit integers
    and the ramp-up at each series head renormalizes over the weights
    actually present (no fabricated zeros before the first sample).

    100 TB shape: one hash partition on user_id + one (ts, event_id)
    sort serves all 8 lag expressions — Catalyst collapses them into a
    single Window operator, so the cost is exactly one shuffle of the
    events table regardless of kernel width. The division is integer
    `div` (exact, engine-portable), computed map-side after the
    window."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for j, w in enumerate(EWMA_W):
        lag = F.col("cents") if j == 0 else F.lag("cents", j).over(uw)
        t = F.coalesce(lag * w, F.lit(0))
        d = F.when(lag.isNotNull(), F.lit(w)).otherwise(F.lit(0))
        num = t if num is None else num + t
        den = d if den is None else den + d
    return e.select(
        "user_id",
        "event_id",
        "cents",
        num.cast("long").alias("ewma_num"),
        den.cast("long").alias("ewma_den"),
    ).withColumn("ewma_cents", F.expr("ewma_num div ewma_den"))


@query(
    "q_timeseries_mad_outliers",
    oracle=EVENTS_US
    + """
    , c AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events_us
    ),
    med AS (
        SELECT event_type,
               CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS med2
        FROM c GROUP BY event_type
    ),
    dev AS (
        SELECT c.event_type, c.cents,
               abs(2 * c.cents - m.med2) AS dev2, m.med2
        FROM c JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type,
               CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN 2 * d.dev2 > 3 * m.mad4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           MIN(d.med2) AS med2,
           MIN(m.mad4) AS mad4
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    tags=("analytics", "timeseries", "dq"),
)
def q_timeseries_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: per
    event type, flag values with |x − median| > 3·MAD — the standard
    robust alternative to z-scores (immune to the outliers it hunts).
    All comparisons run on doubled integers (med2 = 2·median,
    mad4 = 4·MAD are integral even when interpolation lands on .5), so
    the verdict `2·dev2 > 3·mad4` is exact integer arithmetic — no
    float epsilon can flip a flag between engines.

    100 TB shape: two grouped exact-percentile passes over events (the
    group key has ~5 distinct values, so each agg reduces to a handful
    of rows) with the tiny medians broadcast back — events itself never
    shuffles; both joins are map-side. Exact percentile at this group
    cardinality is a partial-agg of per-partition sorted runs, not a
    global sort."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    med = e.groupBy("event_type").agg(
        (F.percentile("cents", 0.5) * 2).cast("long").alias("med2")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "dev2", F.abs(2 * F.col("cents") - F.col("med2"))
    )
    mad = dev.groupBy("event_type").agg(
        (F.percentile("dev2", 0.5) * 2).cast("long").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(2 * F.col("dev2") > 3 * F.col("mad4"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.min("med2").alias("med2"),
            F.min("mad4").alias("mad4"),
        )
    )


# CUSUM alarm threshold: 20 global means of cumulative drift.
CUSUM_THRESHOLD_MEANS = 20


@query(
    "q_timeseries_cusum",
    oracle=EVENTS_US
    + f"""
    , c AS (
        SELECT user_id, event_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events_us
    ),
    g AS (
        SELECT CAST(SUM(cents) * 1000000 // COUNT(*) AS BIGINT) AS mean_ppm
        FROM c
    ),
    cu AS (
        SELECT c.user_id,
               SUM(c.cents * 1000000 - g.mean_ppm) OVER (
                   PARTITION BY c.user_id ORDER BY c.ts, c.event_id
               ) AS cusum
        FROM c CROSS JOIN g
    )
    SELECT cu.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(abs(cusum)) AS BIGINT) AS max_abs_cusum,
           CAST(SUM(CASE WHEN abs(cusum) >
                         {CUSUM_THRESHOLD_MEANS} * g2.mean_ppm
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_over
    FROM cu CROSS JOIN g g2
    GROUP BY cu.user_id
    """,
    tags=("analytics", "timeseries"),
)
def q_timeseries_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen: per user, the running sum of
    deviations from the global mean (exact ppm integers — cents×10⁶
    minus the integer-ppm mean), reporting the peak |CUSUM| and how
    many points exceed a drift alarm of 20 global means. A user whose
    spend level shifts mid-series accumulates drift linearly and trips
    the alarm; white noise mean-reverts. This is the classic
    sequential-detection shape (Page 1954) expressed as one window.

    100 TB shape: the global mean is a 1-row aggregate broadcast via
    crossJoin (the sanctioned scalar pattern); the cumulative sum is
    one hash partition on user_id + one (ts, event_id) sort — a single
    shuffle of events; the final per-user rollup reuses the same
    partitioning, so AQE coalesces it without a second exchange."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    g = F.broadcast(
        e.agg(
            F.expr("CAST(sum(cents) * 1000000 div count(*) AS LONG)").alias(
                "mean_ppm"
            )
        )
    )
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cu = (
        e.crossJoin(g)
        .withColumn(
            "cusum",
            F.sum(
                F.col("cents") * F.lit(1000000) - F.col("mean_ppm")
            ).over(uw),
        )
    )
    return cu.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max(F.abs("cusum")).alias("max_abs_cusum"),
        F.sum(
            F.when(
                F.abs("cusum")
                > F.lit(CUSUM_THRESHOLD_MEANS) * F.col("mean_ppm"),
                1,
            ).otherwise(0)
        ).alias("n_over"),
    )


MIN_PAIR_SUPPORT = 5


@query(
    "q_assoc_brand_pairs",
    oracle=f"""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM ob a JOIN ob b
          ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY a.brand, b.brand
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM ob)
    SELECT p.brand_a, p.brand_b, p.support,
           CAST(p.support * 1000000 // t.n_orders AS BIGINT) AS support_ppm
    FROM pairs p CROSS JOIN tot t
    WHERE p.support >= {MIN_PAIR_SUPPORT}
    """,
    tags=("analytics", "mining"),
)
def q_assoc_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining (the Apriori support-count
    step): brand pairs that appear together in the same order, with
    absolute support and support-ppm over all orders, thresholded.
    Brands (25 values) keep the output dense at every scale factor
    while the join amplification stays bounded by basket width.

    100 TB shape: the part dimension broadcasts into the lineitem scan;
    the pair self-join is an EQUI join on okey (plan-gated — never a
    product), so the blow-up is per-basket (≤ C(width,2) rows), never
    cross-order. The final agg shrinks to ≤ C(25,2) rows — a
    map-side-combine-dominated reduction. The skew lever is basket
    width: a degenerate mega-order salts on (okey, brand-range) the
    same way q_join_skew_salted does."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"),
            F.col("b.brand").alias("brand_b"),
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= MIN_PAIR_SUPPORT)
    )
    tot = F.broadcast(ob.agg(F.countDistinct("okey").alias("n_orders")))
    return pairs.crossJoin(tot).select(
        "brand_a",
        "brand_b",
        "support",
        F.expr("support * 1000000 div n_orders").alias("support_ppm"),
    )


# CEP pattern: the literal stage sequence view→click→purchase, matched
# greedily left-to-right over each user's ordered event-initial string.
CEP_PATTERN = "vcp"


@query(
    "q_cep_sequence_match",
    oracle=EVENTS_US
    + f"""
    , seq AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS s
        FROM events_us GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(s) AS BIGINT) AS n_events,
           CAST((length(s) - length(replace(s, '{CEP_PATTERN}', '')))
                // {len(CEP_PATTERN)} AS BIGINT) AS n_matches
    FROM seq
    WHERE length(s) - length(replace(s, '{CEP_PATTERN}', '')) > 0
    """,
    tags=("analytics", "cep"),
)
def q_cep_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match (the MATCH_RECOGNIZE /
    Flink-CEP shape, batch form): per user, the ordered event stream is
    collapsed to an initials string and the exact stage sequence
    view→click→purchase is counted as greedy non-overlapping substring
    matches — replace() deletes occurrences left-to-right identically
    in both engines, and the pattern's distinct letters make greedy
    equal naive counting (same identity q_bpe_merge_round relies on).

    100 TB shape: one hash partition + sort per user builds the
    sequence string (bounded by per-user event count — the same bound
    any CEP state store holds); the match itself is a map-side string
    expression. This is the batch mirror of a streaming NFA: the
    sequence string IS the serialized automaton input, and the
    windowed variant just bounds the string per session."""
    e = load_table(spark, sf_dir, "events")
    seq = (
        e.withColumn("ini", F.substring("event_type", 1, 1))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "ini"))
                ).getField("ini"),
            ).alias("s")
        )
    )
    matched = seq.select(
        "user_id",
        F.length("s").alias("n_events"),
        F.expr(
            f"(length(s) - length(replace(s, '{CEP_PATTERN}', '')))"
            f" div {len(CEP_PATTERN)}"
        ).alias("n_matches"),
    )
    return matched.filter(F.col("n_matches") > 0)


RFM_BUCKETS = 5


@query(
    "q_rfm_scores",
    oracle=EVENTS_US
    + f"""
    , base AS (
        SELECT user_id,
               MAX(ts) AS last_ts,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM events_us GROUP BY user_id
    )
    SELECT user_id, frequency, monetary_cents,
           CAST(NTILE({RFM_BUCKETS}) OVER (ORDER BY last_ts, user_id)
                AS BIGINT) AS r_score,
           CAST(NTILE({RFM_BUCKETS}) OVER (ORDER BY frequency, user_id)
                AS BIGINT) AS f_score,
           CAST(NTILE({RFM_BUCKETS}) OVER (ORDER BY monetary_cents, user_id)
                AS BIGINT) AS m_score
    FROM base
    """,
    tags=("analytics",),
)
def q_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring: per user recency (last activity), frequency
    (event count), monetary (exact cents), each quintiled 1–5 by NTILE
    over a deterministic total order (metric, user_id) — the standard
    segmentation input for retention/churn targeting. NTILE's
    equal-division semantics are identical across engines once the
    order is total, so scores are engine-exact.

    100 TB shape: one hash agg on user_id reduces events to |users|
    rows; the three NTILEs are global-order windows over that reduced
    frame — at extreme |users| each becomes a range-partitioned sort
    (Spark's Window already range-partitions a global ORDER BY), and
    an approximate-quantile bucketing is the documented fallback if
    even |users| won't sort globally."""
    e = load_table(spark, sf_dir, "events")
    base = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("frequency"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "monetary_cents"
        ),
    )
    return base.select(
        "user_id",
        "frequency",
        "monetary_cents",
        F.ntile(RFM_BUCKETS)
        .over(Window.orderBy("last_ts", "user_id"))
        .cast("long")
        .alias("r_score"),
        F.ntile(RFM_BUCKETS)
        .over(Window.orderBy("frequency", "user_id"))
        .cast("long")
        .alias("f_score"),
        F.ntile(RFM_BUCKETS)
        .over(Window.orderBy("monetary_cents", "user_id"))
        .cast("long")
        .alias("m_score"),
    )


@query(
    "q_skyline_pareto",
    oracle="""
    WITH pts AS (
        SELECT datediff('day', DATE '1992-01-01', o_orderdate) AS day_nr,
               MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_orderdate
    ),
    sky AS (
        SELECT day_nr, cents,
               MAX(cents) OVER (ORDER BY day_nr
                                RANGE BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS best_earlier
        FROM pts
    )
    SELECT CAST(day_nr AS BIGINT) AS day_nr, cents
    FROM sky
    WHERE best_earlier IS NULL OR cents > best_earlier
    """,
    tags=("analytics", "mining"),
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) — the multi-objective
    non-dominated-set operator (Börzsönyi 2001; the shape behind
    loss-vs-size model frontiers and price-vs-freshness offer
    selection): a (day, price) point survives iff no strictly-earlier
    day achieved ≥ its price. In 2-D the skyline collapses to ONE
    running max over the sort order — no pairwise dominance join at
    all: reduce to per-day maxima (only the day's best can survive),
    then keep points beating every earlier day's best via a
    strictly-preceding RANGE frame.

    100 TB shape: the per-day pre-aggregation is a map-side-combined
    hash agg that shrinks the input to |days| rows; the running max is
    one window over that tiny frame. Higher-D skylines lose the
    sort-order trick and need the grid-prune + dominance-join pattern
    (q_sim_grid_join_2d's bucketing is the building block) — the 2-D
    collapse is the documented special case worth exploiting whenever
    one dimension has a total order."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("day_nr")
    ).agg(
        F.max(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents"
        )
    )
    w = (
        Window.orderBy("day_nr")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    sky = pts.withColumn("best_earlier", F.max("cents").over(w))
    return sky.filter(
        F.col("best_earlier").isNull()
        | (F.col("cents") > F.col("best_earlier"))
    ).select(F.col("day_nr").cast("long"), "cents")


SKYLINE_GRID = 8  # ε-grid resolution per dimension for the 3-D skyline


@query(
    "q_skyline_pareto_3d",
    oracle="""
    WITH pts AS (
        SELECT datediff('day', DATE '1992-01-01', o_orderdate) AS day_nr,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS max_cents,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM orders GROUP BY o_orderdate
    )
    SELECT CAST(p.day_nr AS BIGINT) AS day_nr,
           p.n_orders, p.max_cents, p.sum_cents
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.n_orders >= p.n_orders
          AND q.max_cents >= p.max_cents
          AND q.sum_cents >= p.sum_cents
          AND (q.n_orders > p.n_orders OR q.max_cents > p.max_cents
               OR q.sum_cents > p.sum_cents)
    )
    """,
    tags=("analytics", "mining"),
)
def q_skyline_pareto_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-D skyline via ε-grid prune + cell-bucketed dominance join — the
    general-D form q_skyline_pareto's docstring points at (the 2-D
    running-max collapse needs a totally-ordered dimension; with three
    maximize-objectives per day — order count, best order, total volume
    — no sort order exists). Pipeline: (1) reduce to day grain (hash
    agg), (2) broadcast the 1-row per-dim bounds and cut each dim into
    G=8 grid cells, (3) CELL-level prune: a cell is dead if some
    non-empty cell strictly dominates it componentwise (+1 on every
    axis — any point there beats any point here), at ≤G³-row grain;
    (4) point-level dominance join only among survivors, routed through
    the (cell, dominating-cell) pair relation so the point-grain joins
    stay EQUI-joins on cell ids — the inequality predicates live only
    at cell grain. Candidates-vs-candidates is exact: a maximal point's
    cell can never be strictly dominated by a non-empty cell, and
    dominance is transitive, so every dominated candidate is dominated
    by some surviving candidate.

    100 TB shape: the day-grain reduction is the scale step (map-side
    combine to |days| rows); everything after runs at cell/candidate
    grain, where the grid bounds candidate volume to the frontier
    band's cells instead of n². The cell frames (≤ G³ rows) broadcast;
    the only point-grain shuffles hash on cell_id."""
    G = SKYLINE_GRID
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    pts = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("day_nr")
    ).agg(
        F.count("*").alias("n_orders"),
        F.max(cents).alias("max_cents"),
        F.sum(cents).alias("sum_cents"),
    )
    DIMS = ("n_orders", "max_cents", "sum_cents")
    bounds = pts.agg(
        *[F.min(d).alias(f"lo_{d}") for d in DIMS],
        *[F.max(d).alias(f"hi_{d}") for d in DIMS],
    )
    withb = pts.crossJoin(F.broadcast(bounds))
    cell_cols = [
        F.least(
            F.lit(G - 1),
            F.floor(
                (F.col(d) - F.col(f"lo_{d}"))
                * G
                / (F.col(f"hi_{d}") - F.col(f"lo_{d}") + 1)
            ),
        )
        .cast("int")
        .alias(f"c{i}")
        for i, d in enumerate(DIMS)
    ]
    pc = withb.select("day_nr", *DIMS, *cell_cols).withColumn(
        "cell_id",
        F.col("c0") * (G * G) + F.col("c1") * G + F.col("c2"),
    )
    cells = pc.select("c0", "c1", "c2", "cell_id").distinct()
    cx, cy = cells.alias("cx"), cells.alias("cy")
    dead_cells = cx.join(
        F.broadcast(cy),
        (F.col("cy.c0") >= F.col("cx.c0") + 1)
        & (F.col("cy.c1") >= F.col("cx.c1") + 1)
        & (F.col("cy.c2") >= F.col("cx.c2") + 1),
        "left_semi",
    ).select(F.col("cell_id"))
    cand = pc.join(F.broadcast(dead_cells), "cell_id", "left_anti")
    surv = cells.join(F.broadcast(dead_cells), "cell_id", "left_anti")
    sx, sy = surv.alias("sx"), surv.alias("sy")
    # (cp, cq): candidate points in cp can only be dominated by points
    # in cq (weak componentwise cell dominance, including cp == cq).
    pairs = sx.join(
        F.broadcast(sy),
        (F.col("sy.c0") >= F.col("sx.c0"))
        & (F.col("sy.c1") >= F.col("sx.c1"))
        & (F.col("sy.c2") >= F.col("sx.c2")),
    ).select(
        F.col("sx.cell_id").alias("cp_id"), F.col("sy.cell_id").alias("cq_id")
    )
    a, b = cand.alias("a"), cand.alias("b")
    dominated = (
        a.join(F.broadcast(pairs), F.col("a.cell_id") == F.col("cp_id"))
        .join(b, F.col("cq_id") == F.col("b.cell_id"))
        .filter(
            (F.col("b.n_orders") >= F.col("a.n_orders"))
            & (F.col("b.max_cents") >= F.col("a.max_cents"))
            & (F.col("b.sum_cents") >= F.col("a.sum_cents"))
            & (
                (F.col("b.n_orders") > F.col("a.n_orders"))
                | (F.col("b.max_cents") > F.col("a.max_cents"))
                | (F.col("b.sum_cents") > F.col("a.sum_cents"))
            )
        )
        .select(F.col("a.day_nr").alias("day_nr"))
    )
    return cand.join(dominated, "day_nr", "left_anti").select(
        F.col("day_nr").cast("long"), "n_orders", "max_cents", "sum_cents"
    )


# Bot screen: flag any user hitting this many events inside one minute.
# The fixture's traffic density is ~1 event/3 min/user with a max
# sliding-minute burst of 2 (measured at both SFs) — a 5/min threshold
# could never fire and the verdict column was constant-false at every
# SF. 2/min flags the ~10% of users with a genuine 2-event burst,
# validating both verdict arms; production tunes this up (5-60/min).
BOT_RATE_PER_MINUTE = 2


@query(
    "q_sessionize_bot_detect",
    oracle=EVENTS_US
    + f"""
    , r AS (
        SELECT user_id, event_id,
               COUNT(*) OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts)
                              RANGE BETWEEN 59999999 PRECEDING
                                        AND CURRENT ROW) AS n_in_minute
        FROM events_us
    )
    SELECT user_id,
           CAST(MAX(n_in_minute) AS BIGINT) AS peak_rate,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(n_in_minute) >= {BOT_RATE_PER_MINUTE} AS BOOLEAN)
               AS is_bot
    FROM r GROUP BY user_id
    """,
    tags=("analytics", "dq"),
)
def q_sessionize_bot_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst-rate abuse screen: each user's peak events-per-sliding-
    minute (event-time RANGE frame over epoch µs — exact, no bucket
    aliasing: a burst straddling a minute boundary still counts) and a
    bot verdict at the configured burst rate — the rate-limiter's
    offline twin, and the
    pre-filter a curation pipeline runs before trusting engagement
    signals.

    100 TB shape: one (user_id) hash partition + one event-time sort
    serves the sliding count AND the per-user rollup; the RANGE frame
    is streaming-friendly (Spark evaluates it with a two-pointer scan
    per partition, state = one minute of rows — the same bound the
    streaming sliding window holds). Skew lever: a single abusive user
    is by definition the hot key — cap with per-(user, hour) pre-split
    if one bot floods a partition."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-59_999_999, Window.currentRow)
    )
    r = e.withColumn("n_in_minute", F.count("*").over(w))
    return r.groupBy("user_id").agg(
        F.max("n_in_minute").alias("peak_rate"),
        F.count("*").alias("n_events"),
        (F.max("n_in_minute") >= BOT_RATE_PER_MINUTE).alias("is_bot"),
    )


@query(
    "q_events_interarrival",
    oracle=EVENTS_US
    + """
    , d AS (
        SELECT event_type,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS gap_us
        FROM events_us
    ),
    r AS (
        SELECT event_type, gap_us,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY gap_us, event_type) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM d WHERE gap_us IS NOT NULL
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_us END)
                AS BIGINT) AS p50_us,
           CAST(MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN gap_us END)
                AS BIGINT) AS p95_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM r GROUP BY event_type
    """,
    tags=("analytics", "timeseries"),
)
def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival profile per stream: nearest-rank p50/p95 and max
    of the gaps between consecutive events (µs integers; ORDER
    STATISTICS, not interpolated quantiles — a 0.95-weighted
    interpolation differs by 1 ulp between engines, an element of the
    dataset cannot) — the operational fingerprint that sizes stream
    buffers, chooses watermark delays, and exposes upstream batching
    (a p50 near zero with a fat p95 = bursty producer; the reference's
    60 s buffering shows up as a 60 s spike in exactly this
    histogram).

    100 TB shape: one (event_type) partition + (ts, event_id) sort for
    the lag, a second rank window on the gap within the same ~5-key
    partitioning, then a tiny agg — the gap column never leaves the
    partition that computed it."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = e.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("gap_us", "event_type")
    wn = Window.partitionBy("event_type")
    r = d.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return r.groupBy("event_type").agg(
        F.max("n").alias("n_gaps"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap_us"))
        ).alias("_p50_raw"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(n * 95 + 99) div 100"),
                F.col("gap_us"),
            )
        ).alias("p95_us"),
        F.max("gap_us").alias("max_gap_us"),
    ).select(
        "event_type",
        "n_gaps",
        F.col("_p50_raw").alias("p50_us"),
        "p95_us",
        "max_gap_us",
    )


# ABC revenue classification thresholds (percent of cumulative share).
ABC_A_PCT = 80
ABC_B_PCT = 95


@query(
    "q_abc_analysis",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM per_cust),
    ranked AS (
        SELECT p.o_custkey, p.cents,
               SUM(p.cents) OVER (ORDER BY p.cents DESC, p.o_custkey
                                  ROWS UNBOUNDED PRECEDING) AS cum
        FROM per_cust p
    ),
    thr AS (
        SELECT ({ABC_A_PCT} * total) // 100 AS thr_a,
               ({ABC_B_PCT} * total) // 100 AS thr_b
        FROM tot
    ),
    classed AS (
        SELECT r.o_custkey, r.cents,
               CASE WHEN r.cum <= t.thr_a THEN 'A'
                    WHEN r.cum <= t.thr_b THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked r CROSS JOIN thr t
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS class_cents
    FROM classed GROUP BY abc_class
    """,
    tags=("analytics",),
)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto revenue classification: customers sorted by spend,
    class A = the head covering 80% of cumulative revenue, B = next
    15%, C = the tail — the inventory-management classic. Boundaries
    compare the cumulative sum against PRE-DIVIDED integer thresholds
    ((pct·total) div 100, exact for integer cum) rather than
    cross-multiplying the cumulative side — cum·10⁶ overflows int64
    once total revenue passes ~9·10¹² cents, which the 4× scale probe
    actually hit (docs/SCALE.md §13 methodology); the threshold form
    is safe to total ≈ 9·10¹⁶ cents and DECIMAL(38) is the documented
    step beyond.

    100 TB shape: the per-customer rollup shrinks orders to |customers|
    rows before the one global cumulative sort (range-partitioned);
    the threshold test needs only the 1-row total broadcast alongside.
    Same global-sort caveat and quantile-bucket refinement as
    q_curate_token_budget."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents"
        )
    )
    thr = F.broadcast(
        per_cust.agg(F.sum("cents").alias("total")).select(
            F.expr(f"({ABC_A_PCT} * total) div 100").alias("thr_a"),
            F.expr(f"({ABC_B_PCT} * total) div 100").alias("thr_b"),
        )
    )
    w = (
        Window.orderBy(F.desc("cents"), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    classed = (
        per_cust.withColumn("cum", F.sum("cents").over(w))
        .crossJoin(thr)
        .select(
            "cents",
            F.when(F.col("cum") <= F.col("thr_a"), "A")
            .when(F.col("cum") <= F.col("thr_b"), "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("class_cents"),
    )


@query(
    "q_window_ohlc",
    oracle=EVENTS_US
    + """
    , c AS (
        SELECT event_type, date_trunc('hour', ts) AS hr, ts, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events_us
    )
    SELECT event_type, hr,
           CAST(COUNT(*) AS BIGINT) AS n,
           first(cents ORDER BY ts, event_id) AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           last(cents ORDER BY ts, event_id) AS close_cents
    FROM c GROUP BY event_type, hr
    """,
    tags=("analytics", "timeseries"),
)
def q_window_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) hourly candlesticks per stream — the
    canonical time-series-database downsample (TimescaleDB/InfluxDB
    continuous aggregate): first and last value by (ts, event_id)
    within the hour via min_by/max_by argmin aggregates, extremes via
    MIN/MAX, all in exact cents.

    100 TB shape: ONE map-side-combined hash agg at (type, hour) grain
    — min_by/max_by carry a (key, value) pair through the partial
    aggregation, so open/close need no sort and no window; the
    candlestick table is the mergeable rollup (§3): day candles
    re-aggregate from hour candles by the same argmin/argmax merge,
    never from raw events."""
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hr"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    order_key = F.struct("ts", "event_id")
    return c.groupBy("event_type", "hr").agg(
        F.count("*").alias("n"),
        F.min_by("cents", order_key).alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max_by("cents", order_key).alias("close_cents"),
    )


@query(
    "q_agg_gini",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
               COUNT(*) OVER () AS n,
               SUM(cents) OVER () AS total
        FROM per_cust
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(MAX(total) AS BIGINT) AS total_cents,
           CAST(CAST(2 * SUM(CAST(i AS HUGEINT) * cents)
                     - (MAX(n) + 1) * CAST(MAX(total) AS HUGEINT)
                     AS HUGEINT) * 1000000
                // (CAST(MAX(n) AS HUGEINT) * MAX(total)) AS BIGINT)
               AS gini_ppm
    FROM ranked
    """,
    tags=("analytics", "agg"),
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration in exact ppm — the
    inequality scalar that pairs with q_abc_analysis's classes
    (G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted spend):
    one number that tracks whale-dependence across releases. The rank
    products accumulate in int64, but the final ×10⁶ scalar step runs
    in DECIMAL(38)/HUGEINT on BOTH engines — the documented escape
    hatch once a cross-multiplication can't keep its bounded side
    under 2⁶³ (it overflowed int64 at sf0.1 in development, same
    failure mode the ABC 4× probe caught).

    100 TB shape: |customers| rollup first, then one global ascending
    sort for ranks (range-partitioned — the same one-sort budget as
    ABC/token-budget, shareable with them in a combined report) and a
    single scalar agg."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents"
        )
    )
    wr = Window.orderBy("cents", "o_custkey")
    wall = Window.partitionBy()
    ranked = per_cust.select(
        "cents",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wall).alias("n"),
        F.sum("cents").over(wall).alias("total"),
    )
    return ranked.agg(
        F.max("n").alias("n_customers"),
        F.max("total").alias("total_cents"),
        # The rank-product sum itself must accumulate in DECIMAL(38):
        # 2·Σ i·xᵢ brushes 2⁶³ at 16× sf0.1 already (caught by the 16×
        # sweep; the DuckDB side always summed in HUGEINT).
        F.expr(
            "CAST((2 * sum(CAST(i AS DECIMAL(38, 0)) * cents)"
            "      - (max(n) + 1) * CAST(max(total) AS DECIMAL(38, 0)))"
            " * 1000000"
            " div (CAST(max(n) AS DECIMAL(38, 0)) * max(total))"
            " AS LONG)"
        ).alias("gini_ppm"),
    )


LORENZ_BUCKETS = 10


@query(
    "q_lorenz_curve",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    deciled AS (
        SELECT cents,
               NTILE({LORENZ_BUCKETS}) OVER (ORDER BY cents, o_custkey)
                   AS decile
        FROM per_cust
    ),
    per_decile AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS decile_cents
        FROM deciled GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_customers, decile_cents,
           CAST(CAST(SUM(decile_cents) OVER (ORDER BY decile
                         ROWS UNBOUNDED PRECEDING) AS HUGEINT)
                * 1000000 // SUM(decile_cents) OVER ()
                AS BIGINT) AS cum_share_ppm
    FROM per_decile
    """,
    tags=("analytics",),
)
def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve in deciles — the distribution picture behind
    q_agg_gini's scalar and q_abc_analysis's classes (the reporting
    trio): customers deciled by spend, each decile's cumulative share
    of total revenue in exact ppm. The cumulative×10⁶ runs in
    DECIMAL(38)/HUGEINT on both engines (the running sum is the
    UNBOUNDED side — the exact overflow the 4×/16× probes taught us to
    pre-empt).

    100 TB shape: same budget as Gini — |customers| rollup, one global
    sort (NTILE), then windows over 10 rows. All three inequality
    reports share the rollup and the sort when run together."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents"
        )
    )
    deciled = per_cust.select(
        "cents",
        F.ntile(LORENZ_BUCKETS)
        .over(Window.orderBy("cents", "o_custkey"))
        .alias("decile"),
    )
    per_decile = deciled.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("decile_cents"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    return per_decile.select(
        F.col("decile").cast("long"),
        "n_customers",
        "decile_cents",
        F.expr(
            "CAST(CAST(sum(decile_cents) OVER (ORDER BY decile"
            "           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            "      AS DECIMAL(38,0)) * 1000000"
            " div sum(decile_cents) OVER () AS LONG)"
        ).alias("cum_share_ppm"),
    )


@query(
    "q_concurrency_sweep",
    oracle=EVENTS_US
    + """
    , ordered AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events_us
    ),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 12 HOUR
                    THEN 1 ELSE 0 END AS brk
        FROM ordered
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    intervals AS (
        SELECT user_id, session_id,
               MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM sess GROUP BY user_id, session_id
    ),
    points AS (
        SELECT s_start AS ts, 1 AS delta, user_id, session_id
        FROM intervals
        UNION ALL
        SELECT s_end, -1, user_id, session_id FROM intervals
    ),
    swept AS (
        SELECT ts, delta,
               SUM(delta) OVER (ORDER BY ts, delta, user_id, session_id
                                ROWS UNBOUNDED PRECEDING) AS concurrency
        FROM points
    )
    SELECT CAST(ts AS DATE) AS day,
           CAST(MAX(concurrency) AS BIGINT) AS peak_concurrency,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS sessions_started
    FROM swept GROUP BY CAST(ts AS DATE)
    """,
    tags=("analytics", "session"),
)
def q_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrency via sweep-line — the interval-overlap counting
    algorithm (capacity planning's core question: how many sessions
    are open AT ONCE?): gap sessions become ±1 boundary points, a
    running sum over the global boundary order IS the live concurrency
    curve, rolled up to per-day peaks. Ends sort before starts at an
    identical instant (delta ascending), so touching sessions don't
    double-count — the tie rule is part of the metric's definition and
    pinned identically in both engines.

    100 TB shape: the sweep needs ONE global sort of 2·|sessions|
    boundary points — orders of magnitude smaller than events (the
    sessionization reduced them); at extreme |sessions| the sweep
    range-partitions by time and carries per-partition offsets (the
    standard distributed prefix-sum), which is exactly what Spark's
    range-partitioned window already does. The same shape answers
    'peak queue depth', 'max concurrent versions', and license-seat
    questions."""
    e = load_table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w_lag).isNull()
            | (
                F.col("ts") - F.lag("ts").over(w_lag)
                > F.expr("INTERVAL 12 HOURS")
            ),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    sess = flagged.withColumn("session_id", F.sum("brk").over(w_run))
    intervals = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    points = intervals.select(
        F.col("s_start").alias("ts"),
        F.lit(1).alias("delta"),
        "user_id",
        "session_id",
    ).unionByName(
        intervals.select(
            F.col("s_end").alias("ts"),
            F.lit(-1).alias("delta"),
            "user_id",
            "session_id",
        )
    )
    w_sweep = Window.orderBy("ts", "delta", "user_id", "session_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    swept = points.withColumn("concurrency", F.sum("delta").over(w_sweep))
    return swept.groupBy(F.to_date("ts").alias("day")).agg(
        F.max("concurrency").alias("peak_concurrency"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
            "sessions_started"
        ),
    )


@query(
    "q_window_drawdown",
    oracle=EVENTS_US
    + """
    , eq AS (
        SELECT user_id, ts, event_id,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS equity
        FROM events_us
    ),
    dd AS (
        SELECT user_id, equity,
               MAX(equity) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS peak
        FROM eq
    )
    SELECT user_id,
           CAST(MAX(peak - equity) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(peak) AS BIGINT) AS peak_cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM dd GROUP BY user_id
    """,
    tags=("analytics", "window"),
)
def q_window_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user — the risk analytic behind equity
    curves, SLO error budgets, and inventory runways: accumulate each
    user's value stream into a running equity (exact cents), track the
    running peak, and report the deepest peak-to-trough drop. Two
    stacked windows + the final rollup all share ONE (user_id) hash
    partitioning and one (ts, event_id) sort — Catalyst plans a single
    Exchange and a single Sort for the whole chain (the
    q_sessionize_gap property), so the operator costs one shuffle
    regardless of how many running analytics stack on top.

    100 TB shape: running aggregates over the per-user ordering are
    the bounded-memory alternative to collect-and-scan; drawdown at
    whale-user scale is exactly why the chain must stay windowed."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    eq = e.select("user_id", "ts", "event_id", cents.alias("cents")).withColumn(
        "equity", F.sum("cents").over(w)
    )
    dd = eq.withColumn("peak", F.max("equity").over(w))
    return dd.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("equity")).alias("max_drawdown_cents"),
        F.max("peak").alias("peak_cents"),
        F.count("*").alias("n_events"),
    )


@query(
    "q_agg_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
               CAST(l_quantity AS BIGINT) AS wt
        FROM lineitem
    ),
    cum AS (
        SELECT l_returnflag, cents, wt,
               SUM(wt) OVER (PARTITION BY l_returnflag
                             ORDER BY cents, wt
                             ROWS UNBOUNDED PRECEDING) AS cumw,
               SUM(wt) OVER (PARTITION BY l_returnflag) AS total
        FROM w
    )
    SELECT l_returnflag,
           CAST(MIN(cents) AS BIGINT) AS weighted_median_cents,
           CAST(MIN(total) AS BIGINT) AS total_weight
    FROM cum
    WHERE cumw * 2 >= total
    GROUP BY l_returnflag
    """,
    tags=("relational", "agg"),
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (quantity-weighted price per return flag)
    — the estimator percentile() can't express: each row counts with
    its weight, and the median is the smallest value whose cumulative
    weight reaches half the total. All-integer (cents × quantity), so
    both engines pick the identical row; the tie order (cents, wt)
    is pinned so equal prices accumulate identically.

    100 TB shape: one window pair on the group partitioning + a
    filter-then-min — no full sort materialization beyond the
    per-group ordering the window already requires. For heavy groups
    the two-pass hash-bucket selection (q_sample_balance_classes's
    pattern) replaces the window verbatim: bucket by value range,
    locate the half-weight bucket from coarse counts, rank only that
    bucket."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_returnflag")
    cum = li.withColumn("cumw", F.sum("wt").over(wcum)).withColumn(
        "total", F.sum("wt").over(wtot)
    )
    return (
        cum.filter(F.col("cumw") * 2 >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(
            F.min("cents").alias("weighted_median_cents"),
            F.min("total").alias("total_weight"),
        )
    )


@query(
    "q_timeseries_seasonal_baseline",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day,
               dayofweek(o_orderdate) + 1 AS dow,  -- Spark: 1=Sunday
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1, 2
    ),
    seasonal AS (
        SELECT dow, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS baseline
        FROM daily GROUP BY dow
    )
    SELECT d.dow,
           s.baseline AS baseline_cents,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(ABS(d.cents - s.baseline)) AS BIGINT)
               AS max_abs_residual_cents,
           CAST(SUM(CASE WHEN ABS(d.cents - s.baseline) * 10
                              > s.baseline THEN 1 ELSE 0 END) AS BIGINT)
               AS n_anomalous_days
    FROM daily d JOIN seasonal s USING (dow)
    GROUP BY d.dow, s.baseline
    """,
    tags=("analytics", "timeseries"),
)
def q_timeseries_seasonal_baseline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seasonal-naive anomaly screen — the first decomposition every
    ops dashboard runs before anything STL-shaped: daily revenue vs
    its day-of-week baseline (the seasonal mean), flagging days whose
    residual exceeds 10% of baseline (exact integer
    cross-multiplication — no float thresholds). Reports per weekday
    the baseline, worst residual, and anomaly count; the weekday with
    structurally different traffic shows up as baseline spread, the
    incident shows up as residual.

    100 TB shape: two shrinking hash aggregates (events → days → 7
    weekdays) and a BROADCAST join of the 7-row baseline back to the
    day grain — the decomposition never touches event grain twice. The
    same shape extends to (hour-of-week, service) seasonality with the
    baseline still broadcastable."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    daily = o.groupBy(
        F.col("o_orderdate").alias("day"),
        F.dayofweek("o_orderdate").alias("dow"),
    ).agg(F.sum(cents).alias("cents"))
    seasonal = daily.groupBy("dow").agg(
        F.expr("SUM(cents) DIV COUNT(*)").alias("baseline")
    )
    j = daily.join(F.broadcast(seasonal), "dow")
    resid = F.abs(F.col("cents") - F.col("baseline"))
    return j.groupBy("dow", F.col("baseline").alias("baseline_cents")).agg(
        F.count("*").alias("n_days"),
        F.max(resid).alias("max_abs_residual_cents"),
        F.sum(
            F.when(resid * 10 > F.col("baseline"), 1).otherwise(0)
        ).alias("n_anomalous_days"),
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (bounded horizon, integer-exact)
# ---------------------------------------------------------------------------

_MK_SCALE = 1_000_000_000_000
# Per-edge transition ratios are pre-scaled to q = (cnt * 1e6) div t ONCE,
# so each chain step multiplies p (≤ _MK_SCALE = 1e12) by q (≤ 1e6): the
# int64 intermediate is bounded by 1e18 < 2^63 at ANY corpus size. The
# naive (p * cnt) div t form overflows int64 silently in Spark (non-ANSI
# wraps) once a hot edge count passes ~9.2e6 — DuckDB raises instead,
# breaking oracle parity exactly when the data gets big.
_MK_EDGE_SCALE = 1_000_000
_MK_STEPS = 6
_MK_CHANNELS = ("click", "error", "signup", "view")


def _mk_edges_cte() -> str:
    """Transition-count CTEs shared by every scenario: per user, events
    ordered by (ts, event_id), truncated at the first purchase; edges
    START->first, consecutive pairs, last->END when no conversion."""
    return (
        EVENTS_US
        + f"""
    , ranked AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events_us
    ),
    firstconv AS (
        SELECT user_id, MIN(rn) AS conv_rn FROM ranked
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    path AS (
        SELECT r.user_id, r.event_type, r.rn
        FROM ranked r LEFT JOIN firstconv f USING (user_id)
        WHERE f.conv_rn IS NULL OR r.rn <= f.conv_rn
    ),
    pairs AS (
        SELECT user_id, event_type AS src,
               COALESCE(lead(event_type) OVER (PARTITION BY user_id
                                               ORDER BY rn),
                        CASE WHEN event_type = 'purchase'
                             THEN NULL ELSE 'END' END) AS dst
        FROM path
    ),
    starts AS (
        SELECT 'START' AS src, event_type AS dst FROM path WHERE rn = 1
    ),
    edges AS MATERIALIZED (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            SELECT src, dst FROM pairs WHERE dst IS NOT NULL
            UNION ALL SELECT src, dst FROM starts
        ) GROUP BY src, dst
    ),
    tot AS (
        SELECT src, CAST(SUM(cnt) AS BIGINT) AS t FROM edges GROUP BY src
    ),
    -- MATERIALIZED: every scenario chain references eq once per step;
    -- DuckDB 1.0 would otherwise inline the whole window pipeline into
    -- each of the 30 references (measured: OOM at sf0.1)
    eq AS MATERIALIZED (
        SELECT e.src, e.dst, (e.cnt * {_MK_EDGE_SCALE}) // t.t AS q
        FROM edges e JOIN tot t USING (src)
    )
    """
    )


def _mk_chain_ctes(tag: str, removed: str | None, steps: int) -> list[str]:
    """CTE chain for one scenario: L fixed-point steps of
    p' (dst) = sum over src of (p(src) * q) DIV _MK_EDGE_SCALE, where
    q = (cnt * _MK_EDGE_SCALE) DIV tot(src) is the pre-scaled edge
    ratio (int64-overflow-safe at any scale — see _MK_EDGE_SCALE), with
    absorbing mass accumulated in 'purchase'/'END'. Removing channel c
    redirects every edge INTO c to END and drops edges out of c —
    denominators stay original (the classic removal-effect convention:
    failed mass dies, nothing renormalizes)."""
    if removed is None:
        edge_src = "SELECT src, dst, q FROM eq"
    else:
        # q keeps the ORIGINAL cnt/t ratio (removal convention: nothing
        # renormalizes), only the destination redirects.
        edge_src = f"""
            SELECT src,
                   CASE WHEN dst = '{removed}' THEN 'END' ELSE dst END AS dst,
                   q
            FROM eq WHERE src <> '{removed}'
        """
    ctes = [
        f"e_{tag} AS ({edge_src})",
        f"p_{tag}_0 AS (SELECT 'START' AS state,"
        f" CAST({_MK_SCALE} AS BIGINT) AS p)",
    ]
    for r in range(1, steps + 1):
        ctes.append(
            f"""p_{tag}_{r} AS (
        SELECT state, CAST(SUM(p) AS BIGINT) AS p FROM (
            SELECT e.dst AS state, (pp.p * e.q) // {_MK_EDGE_SCALE} AS p
            FROM p_{tag}_{r - 1} pp
            JOIN e_{tag} e ON e.src = pp.state
            WHERE pp.state NOT IN ('purchase', 'END')
            UNION ALL
            SELECT state, p FROM p_{tag}_{r - 1}
            WHERE state IN ('purchase', 'END')
        ) GROUP BY state
    )"""
        )
    return ctes


def _mk_oracle() -> str:
    ctes: list[str] = []
    ctes += _mk_chain_ctes("full", None, _MK_STEPS)
    for c in _MK_CHANNELS:
        ctes += _mk_chain_ctes(f"r_{c}", c, _MK_STEPS)
    last = f"p_full_{_MK_STEPS}"
    scen = "\n        UNION ALL\n        ".join(
        f"SELECT '{c}' AS channel, COALESCE((SELECT p FROM p_r_{c}_{_MK_STEPS}"
        f" WHERE state = 'purchase'), 0) AS p_removed"
        for c in _MK_CHANNELS
    )
    return (
        _mk_edges_cte()
        + ", "
        + ",\n    ".join(ctes)
        + f""",
    fullp AS (
        SELECT COALESCE((SELECT p FROM {last} WHERE state = 'purchase'), 0)
            AS p_full
    ),
    scen AS (
        {scen}
    )
    SELECT s.channel,
           CAST(f.p_full AS BIGINT) AS p_conv_full,
           CAST(s.p_removed AS BIGINT) AS p_conv_removed,
           CAST(f.p_full - s.p_removed AS BIGINT) AS removal_effect
    FROM scen s CROSS JOIN fullp f
    """
    )


def _mk_fixpoint_expr(steps: int = _MK_STEPS) -> str:
    """The whole bounded-horizon Markov fixpoint as ONE SQL expression
    over a per-scenario row carrying ``E`` (array of (src, dst, q)
    edge structs) and ``S`` (the sorted state universe): the state
    vector is an |S|-slot bigint array, each step a ``transform`` in
    which absorbing states ('purchase'/'END') keep their mass and every
    state adds its in-flow Σ p[src]·q div _MK_EDGE_SCALE over non-
    absorbing-source edges — exactly the old per-step broadcast-join +
    groupBy-sum (integer + is associative/commutative, so fold order
    cannot change a bit). The accumulator form (pagerank round 14)
    keeps the expression tree linear in ``steps``; per-step products
    are bounded by _MK_SCALE × _MK_EDGE_SCALE = 1e18 < 2^63 regardless
    of data size. Tested for loop-equivalence in
    tests/test_plans.py::test_markov_chain_is_single_expression."""
    return (
        f"aggregate(sequence(1, {steps}), "
        f"transform(S, st -> IF(st = 'START', cast({_MK_SCALE} as bigint), "
        "cast(0 as bigint))), "
        "(r, it) -> transform(S, (st, i) -> "
        "IF(st IN ('purchase', 'END'), element_at(r, i + 1), "
        "cast(0 as bigint)) "
        "+ aggregate("
        "filter(E, e -> e.dst = st AND NOT e.src IN ('purchase', 'END')), "
        "cast(0 as bigint), (acc, e) -> "
        "acc + (element_at(r, cast(array_position(S, e.src) as int)) * e.q) "
        f"div {_MK_EDGE_SCALE})))"
    )


@query(
    "q_attribution_markov_removal",
    oracle=_mk_oracle(),
    tags=("analytics", "attribution", "iterative"),
)
def q_attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain REMOVAL-EFFECT attribution — the data-driven
    successor to last-touch (q_attribution_last_touch): user journeys
    become a first-order Markov chain (START → touchpoints → purchase /
    END, truncated at first conversion), conversion probability is a
    bounded-horizon fixed-point (_MK_STEPS steps), and each channel's
    credit is how much conversion probability DIES when every path
    through it is cut (edges into the channel redirect to END, original
    denominators kept — the classic removal convention). All mass
    arithmetic is _MK_SCALE-scaled int64 with per-edge floor division,
    the PageRank trick, so the 5 unrolled chains (full + 4 removals)
    match DuckDB bit-for-bit.

    Shape: the transition table builds once (one window + one hash
    agg); all five what-if scenarios then run as ONE scenario-keyed
    chain — a 35-row state vector joined against a ~150-row broadcast
    edge table per step, 6 steps, one action (scenario batching, not a
    serialized per-channel loop: measured 17 s → 4 s at sf0.1, nearly
    all of which is the one-time path build). At 100 TB the
    path/window stage dominates and is one shuffle on user_id; the
    chains are constant work regardless of corpus size."""
    e = load_table(spark, sf_dir, "events")
    wrn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # conv_rn (first-purchase rank) is computed IN the ranking window
    # pass (min-when over the unbounded frame) instead of the old
    # filter→groupBy→join-back: the user-grain exchange+sort runs once,
    # and because `ranked` used to feed BOTH the join and the groupBy
    # (no CSE across branches), the whole window chain ran twice. The
    # lazy checkpoint then stops `pairs` and `starts` from re-running
    # it. Measured (sf0.1, warm): edge build 3.5 s → 1.4-2.0 s,
    # identical 25 edge rows (guide §2.4 — share one exchange).
    wall = wrn.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = e.select(
        "user_id",
        "event_type",
        F.row_number().over(wrn).alias("rn"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.row_number().over(wrn)
            )
        )
        .over(wall)
        .alias("conv_rn"),
    )
    path = ranked.filter(
        F.col("conv_rn").isNull() | (F.col("rn") <= F.col("conv_rn"))
    ).localCheckpoint(eager=False)
    wl = Window.partitionBy("user_id").orderBy("rn")
    pairs = path.select(
        F.col("event_type").alias("src"),
        F.coalesce(
            F.lead("event_type").over(wl),
            F.when(F.col("event_type") != "purchase", F.lit("END")),
        ).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    starts = path.filter(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("event_type").alias("dst")
    )
    edges = (
        pairs.unionByName(starts)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
    )
    tot = edges.groupBy("src").agg(F.sum("cnt").alias("t"))
    ew = (
        edges.join(tot, "src")
        .select(
            "src",
            "dst",
            F.expr(f"(cnt * {_MK_EDGE_SCALE}) div t").alias("q"),
        )
        .localCheckpoint()
    )

    # ALL scenarios run as ONE expression (round 14, the pagerank
    # lambda-accumulator form): the per-scenario edge set collapses to
    # one row of (E, S) arrays — ≤30 edges, ≤8 states — and the whole
    # 6-step fixpoint is a single `aggregate(sequence(1, 6), …)`
    # projection, replacing the per-step broadcast join + hash agg loop
    # (6 steps × 2 tiny scheduler-bound stages; measured warm
    # 4.7-5.7 s → see OPTIMIZATION_r14.md). The chain state is
    # CONSTANT-size at every SF — scenarios × |event types|, not users
    # — so the expression form is also the right 100 TB shape; the
    # fact-scale path/window build above is untouched.
    def scenario_edges(tag: str, removed_ch: str | None) -> DataFrame:
        if removed_ch is None:
            ec = ew
        else:
            ec = ew.filter(F.col("src") != removed_ch).withColumn(
                "dst",
                F.when(F.col("dst") == removed_ch, "END").otherwise(
                    F.col("dst")
                ),
            )
        return ec.select(F.lit(tag).alias("scenario"), "src", "dst", "q")

    scen = scenario_edges("full", None)
    for c in _MK_CHANNELS:
        scen = scen.unionByName(scenario_edges(c, c))
    sa = (
        scen.groupBy("scenario")
        .agg(F.collect_list(F.struct("src", "dst", "q")).alias("E"))
        .withColumn(
            "S",
            F.expr(
                "array_sort(array_distinct(concat("
                "transform(E, e -> e.src), transform(E, e -> e.dst), "
                "array('START', 'purchase', 'END'))))"
            ),
        )
    )
    conv = sa.select(
        "scenario",
        F.expr(
            f"element_at({_mk_fixpoint_expr()}, "
            "cast(array_position(S, 'purchase') as int))"
        ).alias("p"),
    )
    scenarios = spark.createDataFrame(
        [("full",)] + [(c,) for c in _MK_CHANNELS], "scenario string"
    )
    conv = (
        scenarios.join(conv, "scenario", "left")
        .select(
            "scenario", F.coalesce("p", F.lit(0).cast("long")).alias("p")
        )
        .localCheckpoint()
    )
    full_p = conv.filter(F.col("scenario") == "full").select(
        F.col("p").alias("p_conv_full")
    )
    return (
        conv.filter(F.col("scenario") != "full")
        .crossJoin(F.broadcast(full_p))
        .select(
            F.col("scenario").alias("channel"),
            "p_conv_full",
            F.col("p").alias("p_conv_removed"),
            (F.col("p_conv_full") - F.col("p")).alias("removal_effect"),
        )
    )


@query(
    "q_join_pit_features",
    oracle=EVENTS_US
    + """
    , tagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS is_label,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 100) AS BIGINT) END AS label_cents,
               CASE WHEN event_type = 'click'
                    THEN CAST(ROUND(value * 100) AS BIGINT) END AS click_cents,
               CASE WHEN event_type = 'view'
                    THEN CAST(ROUND(value * 100) AS BIGINT) END AS view_cents
        FROM events_us
        WHERE event_type IN ('purchase', 'click', 'view')
    ),
    filled AS (
        SELECT user_id, ts, event_id, is_label, label_cents,
               last_value(click_cents IGNORE NULLS) OVER w AS last_click_cents,
               last_value(view_cents IGNORE NULLS) OVER w AS last_view_cents
        FROM tagged
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts, is_label DESC, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, label_cents, last_click_cents, last_view_cents
    FROM filled WHERE is_label = 1
    """,
    tags=("analytics", "join"),
)
def q_join_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME feature join — the feature-store operation that
    builds a training matrix without label leakage: each label event
    (purchase) picks up, per feature stream (last click value, last
    view value), the most recent value STRICTLY before the label's
    timestamp. Both features resolve in ONE union-sort-fill pass:
    label and feature events interleave per user, `last(..,
    ignorenulls)` forward-fills each feature column, and the same-
    timestamp tie orders labels BEFORE features (is_label DESC) so an
    equal-ts feature can never leak into its own label row.

    This is N as-of joins for the price of one shuffle: at 100 TB the
    classic per-feature-table as-of join shuffles the fact table once
    PER FEATURE, while the union-fill shape shuffles everything once
    on user_id and adds one window column per feature — the reason
    production feature stores materialize PIT matrices this way."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click", "view")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    tagged = e.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("is_label"),
        F.when(F.col("event_type") == "purchase", cents).alias("label_cents"),
        F.when(F.col("event_type") == "click", cents).alias("click_cents"),
        F.when(F.col("event_type") == "view", cents).alias("view_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_label").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged.select(
        "event_id",
        "user_id",
        "is_label",
        "label_cents",
        F.last("click_cents", ignorenulls=True)
        .over(w)
        .alias("last_click_cents"),
        F.last("view_cents", ignorenulls=True)
        .over(w)
        .alias("last_view_cents"),
    )
    return filled.filter(F.col("is_label") == 1).select(
        "event_id", "user_id", "label_cents", "last_click_cents",
        "last_view_cents",
    )


@query(
    "q_timeseries_linear_interp",
    oracle=EVENTS_US
    + """
    , roll AS (
        SELECT event_type,
               CAST(date_part('epoch', date_trunc('hour', ts)) // 3600
                    AS BIGINT) AS h,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events_us GROUP BY 1, 2
    ),
    rng AS (
        SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM roll
        GROUP BY event_type
    ),
    spine AS (
        SELECT event_type, h0 + x AS h
        FROM rng, LATERAL unnest(range(0, h1 - h0 + 1)) AS u(x)
    ),
    j AS (
        SELECT s.event_type, s.h, r.cents FROM spine s
        LEFT JOIN roll r ON r.event_type = s.event_type AND r.h = s.h
    ),
    f AS (
        SELECT event_type, h, cents,
               last_value(cents IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN cents IS NOT NULL THEN h END
                          IGNORE NULLS) OVER wp AS ph,
               first_value(cents IGNORE NULLS) OVER wn AS nv,
               first_value(CASE WHEN cents IS NOT NULL THEN h END
                           IGNORE NULLS) OVER wn AS nh
        FROM j
        WINDOW wp AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h,
           CAST(CASE WHEN cents IS NOT NULL THEN cents
                     WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                          pv + (nv - pv) * (h - ph) // (nh - ph)
                END AS BIGINT) AS cents_interp,
           cents IS NULL AND pv IS NOT NULL AND nv IS NOT NULL
               AS interpolated
    FROM f
    """,
    tags=("analytics", "timeseries"),
)
def q_timeseries_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR interpolation of silent hours — the numeric companion to
    q_timeseries_gapfill's zero-fill: each missing (type, hour) bucket
    takes pv + (nv−pv)·(h−ph) ÷ (nh−ph) between its nearest observed
    neighbors (exact int64 cents; floor division), edges before the
    first / after the last observation stay NULL — the fill mode
    monitoring systems use for rate-like series where zero means
    "outage", not "no data". Both directions resolve in one window
    pair (last/first IGNORE NULLS over the dense spine).

    Scale: same spine/rollup shape as gapfill (one low-cardinality
    hash agg + broadcast spine), plus two frames of the same sorted
    window — still one exchange per type partition."""
    e = load_table(spark, sf_dir, "events")
    roll = (
        e.groupBy(
            "event_type",
            (F.unix_timestamp(F.date_trunc("hour", "ts")) / 3600)
            .cast("long")
            .alias("h"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
        )
    )
    rng = roll.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = rng.select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"),
    )
    j = spine.join(roll, ["event_type", "h"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("cents").isNotNull(), F.col("h"))
    f = j.select(
        "event_type",
        "h",
        "cents",
        F.last("cents", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("ph"),
        F.first("cents", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(wn).alias("nh"),
    )
    interp = F.when(F.col("cents").isNotNull(), F.col("cents")).when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.col("pv")
        + F.expr("(nv - pv) * (h - ph) div (nh - ph)"),
    )
    return f.select(
        "event_type",
        "h",
        interp.cast("long").alias("cents_interp"),
        (
            F.col("cents").isNull()
            & F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
        ).alias("interpolated"),
    )


# ACF lags computed per user series; MIN_ACF_PAIRS guards degenerate
# (constant / near-empty) series out of the report.
ACF_LAGS = (1, 2, 3)
MIN_ACF_PAIRS = 20


@query(
    "q_timeseries_acf",
    oracle=EVENTS_US
    + f"""
    , c AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM events_us
    ),
    lagged AS (
        SELECT user_id, x,
               {', '.join(f'LEAD(x, {k}) OVER w AS y{k}' for k in ACF_LAGS)}
        FROM c
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    pairs AS (
        {' UNION ALL '.join(
            f"SELECT user_id, CAST({k} AS BIGINT) AS lag, x, y{k} AS y "
            f"FROM lagged WHERE y{k} IS NOT NULL"
            for k in ACF_LAGS)}
    ),
    s AS (
        SELECT user_id, lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM pairs GROUP BY user_id, lag
    )
    SELECT user_id, lag, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
           END AS acf
    FROM s WHERE n >= {MIN_ACF_PAIRS}
    """,
    tags=("analytics", "timeseries"),
)
def q_timeseries_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function per user series at lags 1-3 — the
    seasonality/momentum screen (does this entity's metric correlate
    with its own recent past?) run before fitting any forecasting
    model. Each lag's ACF is the Pearson correlation of (x_t, x_{t+k})
    pairs, ENGINE-EXACT by the q_window_rolling_corr recipe: values
    quantize to int64 cents, all five co-moment sums are exact integer
    arithmetic, and only the final ratio touches floating point
    (int64→double + sqrt are IEEE-deterministic, so DuckDB reproduces
    every 6-dp value bit-for-bit). Series shorter than MIN_ACF_PAIRS
    pairs at a lag are excluded; zero-variance windows yield NULL.

    100 TB shape: ONE sort exchange partitioned by user_id computes all
    three leads in a single Window operator; the per-(user, lag) sums
    map-side-combine before their exchange, so the only fact-scale
    shuffle is the window sort — the agg exchange carries ~3 rows per
    user. Per-series int64 bound: n·|sxy| ≤ n²·x_typ² — at the
    fixture's typical |x| ~ 3·10³ cents ($30) that holds to ~10⁶
    events per user, but at the 10⁶-cent value CAP the worst case
    binds already at n ≈ 3·10³ events; pre-center per series (the
    q_agg_gini documentation pattern) before trusting longer heavy
    series.  Lags are a constant, so cost is O(data), not O(data ×
    lags)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("x"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.select(
        "user_id",
        "x",
        *[F.lead("x", k).over(w).alias(f"y{k}") for k in ACF_LAGS],
    )
    pairs = lagged.select(
        "user_id",
        "x",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.col(f"y{k}").alias("y"),
                    )
                    for k in ACF_LAGS
                ]
            )
        ).alias("p"),
    ).select(
        "user_id", F.col("p.lag").alias("lag"), "x", F.col("p.y").alias("y")
    ).filter(F.col("y").isNotNull())
    s = pairs.groupBy("user_id", "lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    acf = F.when(
        (d1 > 0) & (d2 > 0),
        F.round(
            num / (F.sqrt(d1.cast("double")) * F.sqrt(d2.cast("double"))), 6
        ),
    )
    return s.filter(F.col("n") >= MIN_ACF_PAIRS).select(
        "user_id", "lag", "n", acf.alias("acf")
    )


# ---------------------------------------------------------------------------
# Time series: LTTB downsampling (largest-triangle-three-buckets)
# ---------------------------------------------------------------------------

LTTB_BUCKETS = 30


@query(
    "q_timeseries_lttb",
    oracle=EVENTS_US
    + f"""
    , pts AS (
        SELECT event_type, event_id,
               epoch_us(ts) AS x_us,
               CAST((epoch_us(ts) - MIN(epoch_us(ts)) OVER (
                   PARTITION BY event_type)) // 1000000 AS BIGINT) AS x,
               CAST(ROUND(value * 100) AS BIGINT) AS y,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events_us
    ),
    bk AS (
        SELECT *, CAST((rn - 1) * {LTTB_BUCKETS} // n AS BIGINT) AS bucket
        FROM pts
    ),
    agg AS (
        SELECT event_type, bucket,
               CAST(SUM(x) // COUNT(*) AS BIGINT) AS ax,
               CAST(SUM(y) // COUNT(*) AS BIGINT) AS ay
        FROM bk GROUP BY event_type, bucket
    ),
    mid AS (
        SELECT b.event_type, b.bucket, b.event_id, b.x_us, b.y,
               abs((p.ax - nx.ax) * (b.y - p.ay)
                   - (p.ax - b.x) * (nx.ay - p.ay)) AS area2,
               ROW_NUMBER() OVER (
                   PARTITION BY b.event_type, b.bucket
                   ORDER BY abs((p.ax - nx.ax) * (b.y - p.ay)
                                - (p.ax - b.x) * (nx.ay - p.ay)) DESC,
                            b.event_id) AS rk
        FROM bk b
        JOIN agg p ON p.event_type = b.event_type
                  AND p.bucket = b.bucket - 1
        JOIN agg nx ON nx.event_type = b.event_type
                   AND nx.bucket = b.bucket + 1
    ),
    sel AS (
        SELECT event_type, bucket, event_id, x_us, y,
               CAST(area2 AS BIGINT) AS area2
        FROM mid WHERE rk = 1
        UNION ALL
        SELECT event_type, bucket, event_id, x_us, y,
               CAST(-1 AS BIGINT) AS area2
        FROM bk WHERE rn = 1 OR rn = n
    )
    SELECT event_type, bucket, event_id, x_us, y AS value_cents, area2
    FROM sel
    """,
    tags=("analytics", "timeseries"),
)
def q_timeseries_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling (Steinarsson 2013, "Downsampling Time Series
    for Visual Representation"): per series, partition points into
    {LTTB_BUCKETS} equal-count buckets and keep, per interior bucket,
    the point forming the LARGEST TRIANGLE with its neighbor buckets —
    the standard dashboard downsampler that preserves spikes and
    inflections a per-bucket mean would erase. This is the bucket-mean
    -anchor variant (anchors = neighbor-bucket centroids rather than
    the previously-selected point), which drops LTTB's sequential
    dependency so every bucket elects independently — the only form
    that parallelizes, and the one vis pipelines ship at scale. First
    and last points are always kept (area2 = -1 marks them), per the
    published algorithm. All arithmetic exact int64: x re-based per
    series THEN coarsened to seconds (translation-invariant areas;
    the 4x replica gate caught µs-grain areas overflowing int64 once
    a series spans decades — seconds keep the worst-case area term
    below 10^14 at century span), y in cents, area kept doubled (the
    cross product, never /2) so it stays integral.

    100 TB shape: ONE shuffle on the series key for the windows, a
    {LTTB_BUCKETS}-per-series centroid agg (map-side combined), then a
    broadcast-size join back. Output is |series|·{LTTB_BUCKETS} rows —
    the whole point of the operator: petabytes in, kilobytes out."""
    e = load_table(spark, sf_dir, "events")
    wt = Window.partitionBy("event_type")
    wo = wt.orderBy("ts", "event_id")
    pts = e.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("x_us"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(wt).alias("n"),
    ).withColumn(
        "x",
        F.expr(
            "CAST((x_us - min(x_us) OVER"
            " (PARTITION BY event_type)) div 1000000 AS LONG)"
        ),
    )
    bk = pts.withColumn(
        "bucket", F.expr(f"CAST((rn - 1) * {LTTB_BUCKETS} div n AS LONG)")
    )
    agg = bk.groupBy("event_type", "bucket").agg(
        F.expr("CAST(sum(x) div count(*) AS LONG)").alias("ax"),
        F.expr("CAST(sum(y) div count(*) AS LONG)").alias("ay"),
    )
    p = agg.select(
        "event_type",
        (F.col("bucket") + 1).alias("bucket"),
        F.col("ax").alias("axp"),
        F.col("ay").alias("ayp"),
    )
    nx = agg.select(
        "event_type",
        (F.col("bucket") - 1).alias("bucket"),
        F.col("ax").alias("axn"),
        F.col("ay").alias("ayn"),
    )
    area2 = F.abs(
        (F.col("axp") - F.col("axn")) * (F.col("y") - F.col("ayp"))
        - (F.col("axp") - F.col("x")) * (F.col("ayn") - F.col("ayp"))
    )
    wb = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("area2"), "event_id"
    )
    mid = (
        bk.join(F.broadcast(p), ["event_type", "bucket"])
        .join(F.broadcast(nx), ["event_type", "bucket"])
        .withColumn("area2", area2)
        .withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select(
            "event_type", "bucket", "event_id", "x_us", "y",
            F.col("area2").cast("long"),
        )
    )
    ends = bk.filter((F.col("rn") == 1) | (F.col("rn") == F.col("n"))).select(
        "event_type", "bucket", "event_id", "x_us", "y",
        F.lit(-1).cast("long").alias("area2"),
    )
    return mid.unionByName(ends).select(
        "event_type",
        "bucket",
        "event_id",
        "x_us",
        F.col("y").alias("value_cents"),
        "area2",
    )


# ---------------------------------------------------------------------------
# Time series: Mann-Kendall trend statistic (exact integer S / tau-a)
# ---------------------------------------------------------------------------


@query(
    "q_timeseries_mann_kendall",
    oracle=EVENTS_US
    + """
    , daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events_us GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               CASE WHEN b.cents > a.cents THEN 1
                    WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(sgn) AS BIGINT) AS s_stat,
           CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_concordant,
           CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_discordant,
           CAST(SUM(sgn) * 1000000 // COUNT(*) AS BIGINT) AS tau_a_ppm
    FROM pairs GROUP BY event_type
    """,
    tags=("analytics", "timeseries"),
)
def q_timeseries_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend statistic (Mann 1945, Kendall 1975) per
    series: S = Σ_{i<j} sign(x_j − x_i) over the daily-revenue
    sequence, with concordant/discordant counts and Kendall's τ-a in
    exact ppm — the NON-parametric trend screen (no linearity or
    normality assumed, ties handled by sign = 0) that complements the
    OLS slope (q_regression_ols) and the CUSUM/changepoint family.
    Every term is an integer sign on exact cents; S and τ are int64.

    100 TB shape: the pairwise join runs at DAY grain, AFTER the
    map-side-combined daily rollup — |days|² per series (30 days →
    435 pairs here), catalog-sized and independent of event volume;
    the event-grain table is touched exactly once. For multi-year
    windows the published O(n log n) merge-sort inversion count is
    the refinement; the day-grain quadratic is the honest cost at
    dashboard horizons."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (
        F.when(F.col("b.cents") > F.col("a.cents"), 1)
        .when(F.col("b.cents") < F.col("a.cents"), -1)
        .otherwise(0)
    )
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(F.col("a.event_type").alias("event_type"), sgn.alias("sgn"))
    return pairs.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.sum("sgn").alias("s_stat"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).alias(
            "n_concordant"
        ),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0)).alias(
            "n_discordant"
        ),
        F.expr(
            "CAST(sum(sgn) * 1000000 div count(*) AS LONG)"
        ).alias("tau_a_ppm"),
    )


# ---------------------------------------------------------------------------
# STL-additive decomposition (trend / seasonal / residual, integer-exact)
# ---------------------------------------------------------------------------


@query(
    "q_timeseries_stl_additive",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS h0,
               date_trunc('hour', MAX(ts)) AS h1
        FROM events
    ),
    spine AS (
        SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        FROM bounds
    ),
    cnt AS (
        SELECT date_trunc('hour', ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    y AS (
        SELECT spine.hr, COALESCE(cnt.y, 0) AS y
        FROM spine LEFT JOIN cnt ON cnt.hr = spine.hr
    ),
    tr AS (
        SELECT hr, y,
          LAG(y, 12) OVER w + LEAD(y, 12) OVER w
            + 2 * SUM(y) OVER (ORDER BY hr
                ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING)
            AS trend_x48
        FROM y WINDOW w AS (ORDER BY hr)
    ),
    detr AS (
        SELECT hr, y, trend_x48, 48 * y - trend_x48 AS detr48,
               EXTRACT(hour FROM hr) AS hod
        FROM tr WHERE trend_x48 IS NOT NULL
    ),
    seas AS (
        SELECT hod, CAST(COUNT(*) AS BIGINT) AS n_pts,
               CAST(SUM(detr48) AS BIGINT) AS s_sum
        FROM detr GROUP BY hod
    ),
    s48 AS (
        SELECT hod, n_pts, s_sum // n_pts AS s48 FROM seas
    ),
    ctr AS (
        SELECT CAST(SUM(s48) // 24 AS BIGINT) AS m FROM s48
    ),
    cs AS (
        SELECT hod, n_pts, s48 - m AS seasonal_x48 FROM s48, ctr
    ),
    res AS (
        SELECT d.hod, cs.n_pts, cs.seasonal_x48,
               d.detr48 - cs.seasonal_x48 AS r48, d.detr48
        FROM detr d JOIN cs ON cs.hod = d.hod
    ),
    tot AS (
        SELECT CAST(1000000 - 1000000 * SUM(ABS(r48))
                    // SUM(ABS(detr48)) AS BIGINT) AS strength_ppm
        FROM res
    )
    SELECT CAST(hod AS BIGINT) AS hod,
           n_pts,
           CAST(seasonal_x48 AS BIGINT) AS seasonal_x48,
           CAST(SUM(ABS(r48)) // n_pts AS BIGINT) AS mean_abs_resid_x48,
           strength_ppm
    FROM res, tot
    GROUP BY hod, n_pts, seasonal_x48, strength_ppm
    ORDER BY hod
    """,
    tags=("analytics", "timeseries"),
)
def q_timeseries_stl_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style ADDITIVE decomposition of the hourly event-count
    series — the full trend/seasonal/residual split that
    q_timeseries_seasonal_baseline (seasonal mean only) deliberately
    skips: trend is the textbook centered 2×24 moving average for an
    even period (½·y₋₁₂ + Σ₋₁₁..₊₁₁ + ½·y₊₁₂, carried in ×48 scale so
    it stays integral), seasonal is the per-hour-of-day mean of the
    DETRENDED series re-centered to sum ~0, and the residual is what
    remains. A seasonal-strength score 1 − Σ|resid|/Σ|detrended|
    (robust L1 form, exact ppm) rides along. The series is built on a
    DENSE hour spine (sequence/generate_series + left join) so window
    offsets are calendar-true even for silent hours — the classic
    sparse-series bug this family's gapfill key also guards.

    100 TB shape: the event scan collapses to calendar-hour grain in
    ONE map-side-combinable agg; every window after runs on the
    |hours| spine — metadata-grain work (26 years ≈ 228k rows), so
    the single-partition ORDER window is a deliberate, bounded
    choice, same class as q_timeseries_acf. Seasonal/centering
    frames are ≤24 rows, broadcast."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    cnt = e.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count("*").alias("yc")
    )
    y = spine.join(cnt, "hr", "left").select(
        "hr", F.coalesce("yc", F.lit(0)).alias("y")
    )
    w = Window.orderBy("hr")
    w_ma = Window.orderBy("hr").rowsBetween(-11, 11)
    tr = y.select(
        "hr",
        "y",
        (
            F.lag("y", 12).over(w)
            + F.lead("y", 12).over(w)
            + 2 * F.sum("y").over(w_ma)
        ).alias("trend_x48"),
    )
    detr = tr.filter(F.col("trend_x48").isNotNull()).select(
        "hr",
        "y",
        (48 * F.col("y") - F.col("trend_x48")).alias("detr48"),
        F.hour("hr").alias("hod"),
    )
    seas = detr.groupBy("hod").agg(
        F.count("*").alias("n_pts"), F.sum("detr48").alias("s_sum")
    )
    s48 = seas.select(
        "hod", "n_pts", F.expr("s_sum div n_pts").alias("s48")
    )
    ctr = F.broadcast(s48.agg(F.expr("CAST(SUM(s48) div 24 AS LONG)").alias("m")))
    cs = s48.crossJoin(ctr).select(
        "hod", "n_pts", (F.col("s48") - F.col("m")).alias("seasonal_x48")
    )
    res = detr.join(F.broadcast(cs), "hod").select(
        "hod",
        "n_pts",
        "seasonal_x48",
        (F.col("detr48") - F.col("seasonal_x48")).alias("r48"),
        "detr48",
    )
    tot = F.broadcast(
        res.agg(
            F.expr(
                "CAST(1000000 - 1000000 * SUM(ABS(r48))"
                " div SUM(ABS(detr48)) AS LONG)"
            ).alias("strength_ppm")
        )
    )
    return (
        res.crossJoin(tot)
        .groupBy("hod", "n_pts", "seasonal_x48", "strength_ppm")
        .agg(
            F.expr("CAST(SUM(ABS(r48)) div n_pts AS LONG)").alias(
                "mean_abs_resid_x48"
            )
        )
        .select(
            F.col("hod").cast("long"),
            "n_pts",
            F.col("seasonal_x48").cast("long"),
            "mean_abs_resid_x48",
            "strength_ppm",
        )
        .orderBy("hod")
    )


# ---------------------------------------------------------------------------
# Round-10 additions: rank-based A/B testing, uplift, survival analysis,
# robust/linear trend estimation, and exponential-smoothing forecasting.
# ---------------------------------------------------------------------------

_BIG_TICKET_CENTS = 20_000  # "big-ticket" purchase: value >= $200


@query(
    "q_ab_mannwhitney",
    oracle=EVENTS_US
    + """
    , um AS (
        SELECT user_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS m
        FROM events_us GROUP BY 1
    ),
    ua AS (
        SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm, m
        FROM um
    ),
    vals AS (
        SELECT m, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM ua GROUP BY m
    ),
    ranked AS (
        SELECT m, cnt, c0, c1,
               COALESCE(SUM(cnt) OVER (ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prior
        FROM vals
    ),
    agg AS (
        SELECT CAST(SUM(c0) AS BIGINT) AS n0,
               CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c0 * (2 * prior + cnt + 1)) AS BIGINT) AS r2_0,
               CAST(SUM(c1 * (2 * prior + cnt + 1)) AS BIGINT) AS r2_1
        FROM ranked
    )
    SELECT n0, n1,
           CAST(r2_0 - n0 * (n0 + 1) AS BIGINT) AS u2_ctrl,
           CAST(r2_1 - n1 * (n1 + 1) AS BIGINT) AS u2_treat,
           CAST((r2_1 - n1 * (n1 + 1)) * 1000000 // (2 * n0 * n1) AS BIGINT)
               AS auc_ppm,
           (r2_0 - n0 * (n0 + 1)) + (r2_1 - n1 * (n1 + 1)) = 2 * n0 * n1
               AS u_identity_ok
    FROM agg
    """,
    tags=("analytics", "experiment"),
)
def q_ab_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between the two hash-assigned
    experiment arms on the per-user revenue metric — the
    distribution-free companion to q_ab_srm_check for skewed revenue
    metrics where a t-test's normality assumption fails.  Ties are
    handled exactly with average ranks kept as INTEGER doubled ranks
    (2·avgrank = 2·prior + cnt + 1, always odd+even integer), so both
    engines compute identical int64 rank sums; U is recovered per arm
    and the identity U0 + U1 = n0·n1 (×2 here) is emitted as a
    self-audit column.  The effect size is the Wilcoxon AUC
    P(treat > ctrl) in exact ppm.

    Int64 bound: the doubled rank sums are ≤ N·(2N+1) (fine past 1e9
    users), but the BINDING term is the AUC numerator u2·10⁶ ≤
    2·n0·n1·10⁶ ≈ (N²/2)·10⁶ — it passes 2⁶³ near N ≈ 4·10⁶ users,
    the same boundary q_eval_auc documents; past that run per-shard
    U statistics and pool u2/n0/n1 (they add exactly across disjoint
    shards of one arm only — or use the sharded-AUC estimator).
    100 TB shape: one user-grain hash agg, then the rank table
    is |distinct metric values| rows (≤ users, typically ≪), windowed
    cumulative-count over THAT compact table, 1-row output — events
    are touched once, never globally sorted."""
    e = load_table(spark, sf_dir, "events")
    um = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("m")
    )
    ua = um.select(
        F.pmod(hex_hash(F.col("user_id").cast("string")), F.lit(2)).alias("arm"),
        "m",
    )
    vals = ua.groupBy("m").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("c1"),
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "prior", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    agg = ranked.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.sum(F.expr("c0 * (2 * prior + cnt + 1)")).alias("r2_0"),
        F.sum(F.expr("c1 * (2 * prior + cnt + 1)")).alias("r2_1"),
    )
    return agg.select(
        "n0",
        "n1",
        F.expr("r2_0 - n0 * (n0 + 1)").alias("u2_ctrl"),
        F.expr("r2_1 - n1 * (n1 + 1)").alias("u2_treat"),
        F.expr(
            "(r2_1 - n1 * (n1 + 1)) * 1000000 div (2 * n0 * n1)"
        ).alias("auc_ppm"),
        F.expr(
            "(r2_0 - n0 * (n0 + 1)) + (r2_1 - n1 * (n1 + 1)) = 2 * n0 * n1"
        ).alias("u_identity_ok"),
    )


@query(
    "q_ab_uplift_segments",
    oracle=EVENTS_US
    + """
    , conv AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase'
                         AND CAST(ROUND(value * 100) AS BIGINT) >= 10000
                        THEN 1 ELSE 0 END) AS converted
        FROM events_us GROUP BY 1
    ),
    ua AS (
        SELECT c.c_mktsegment AS segment,
               CAST(concat('0x', substr(md5(CAST(u.user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm,
               u.converted
        FROM conv u JOIN customer c ON u.user_id = c.c_custkey
    ),
    seg AS (
        SELECT segment,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
               CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
                   AS conv_treat,
               CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
                   AS conv_ctrl
        FROM ua GROUP BY 1
    )
    SELECT segment, n_treat, n_ctrl, conv_treat, conv_ctrl,
           CAST(conv_treat * 1000000 // n_treat AS BIGINT) AS conv_treat_ppm,
           CAST(conv_ctrl * 1000000 // n_ctrl AS BIGINT) AS conv_ctrl_ppm,
           CAST(conv_treat * 1000000 // n_treat
                - conv_ctrl * 1000000 // n_ctrl AS BIGINT) AS uplift_ppm
    FROM seg
    """,
    tags=("analytics", "experiment"),
)
def q_ab_uplift_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level uplift readout: the experiment's conversion lift
    (treatment − control, exact ppm, signed) per customer market
    segment — the heterogeneous-treatment-effect table every growth
    team reads after the global number, and the input to uplift-model
    targeting (treat only segments with positive lift).  Conversion is
    a ≥$100 purchase so neither arm saturates; arm assignment is the
    same portable md5 hash as q_ab_srm_check, so the two keys audit
    the SAME experiment.

    100 TB shape: user-grain conversion agg (map-side combined), then
    a broadcast join to the customer dim for the segment attribute —
    events never shuffle on a non-key; output is |segments| rows."""
    e = load_table(spark, sf_dir, "events")
    conv = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.round(F.col("value") * 100, 0).cast("long") >= 10000),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    ua = conv.join(F.broadcast(c), "user_id").select(
        "segment",
        F.pmod(hex_hash(F.col("user_id").cast("string")), F.lit(2)).alias("arm"),
        "converted",
    )
    seg = ua.groupBy("segment").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_treat"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_ctrl"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias(
            "conv_treat"
        ),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias(
            "conv_ctrl"
        ),
    )
    return seg.select(
        "segment",
        "n_treat",
        "n_ctrl",
        "conv_treat",
        "conv_ctrl",
        F.expr("conv_treat * 1000000 div n_treat").alias("conv_treat_ppm"),
        F.expr("conv_ctrl * 1000000 div n_ctrl").alias("conv_ctrl_ppm"),
        F.expr(
            "conv_treat * 1000000 div n_treat - conv_ctrl * 1000000 div n_ctrl"
        ).alias("uplift_ppm"),
    )


@query(
    "q_survival_nelson_aalen",
    oracle=EVENTS_US
    + f"""
    , u AS (
        SELECT user_id,
               MIN(CAST(ts AS DATE)) AS entry_day,
               MIN(CASE WHEN event_type = 'purchase'
                         AND CAST(ROUND(value * 100) AS BIGINT)
                             >= {_BIG_TICKET_CENTS}
                        THEN CAST(ts AS DATE) END) AS event_day,
               MAX(CAST(ts AS DATE)) AS last_day
        FROM events_us GROUP BY 1
    ),
    dur AS (
        SELECT datediff('day', entry_day,
                        COALESCE(event_day, last_day)) AS t,
               CASE WHEN event_day IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM u
    ),
    byt AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(SUM(ev) AS BIGINT) AS d_events
        FROM dur GROUP BY t
    ),
    risk AS (
        SELECT t, n_all, d_events,
               CAST((SELECT COUNT(*) FROM dur)
                   - COALESCE(SUM(n_all) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS n_risk
        FROM byt
    ),
    haz AS (
        SELECT t, n_risk, d_events, n_all - d_events AS n_censored,
               CAST(SUM(d_events * 1000000 // n_risk)
                    OVER (ORDER BY t) AS BIGINT) AS cum_hazard_ppm
        FROM risk
    )
    SELECT CAST(t AS BIGINT) AS t_day, n_risk, d_events,
           CAST(n_censored AS BIGINT) AS n_censored, cum_hazard_ppm
    FROM haz
    """,
    tags=("analytics", "survival"),
)
def q_survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator for time-to-first
    big-ticket purchase (≥$200) with right censoring at last observed
    activity — the survival-analysis primitive behind churn and
    conversion-latency dashboards.  H(t) = Σ_{s≤t} d_s/n_s over event
    times; each increment is an exact integer ppm division (d·1e6 div
    n_risk) and the cumulative sum is associative, so both engines
    agree bit-for-bit — unlike Kaplan-Meier's product form, which
    would need cross-engine float multiplication.  The risk set n(t)
    is derived from the duration histogram (N − #finished before t),
    never a per-user scan per time point.

    100 TB shape: one user-grain agg (entry/event/censor in a single
    pass), then ALL survival math runs on the |distinct durations|
    histogram — window cumsum over ≤ study-length rows.  Output is one
    row per distinct duration (event AND censor times, the classic
    life-table form), so the censoring pattern is auditable."""
    e = load_table(spark, sf_dir, "events")
    big = (
        (F.col("event_type") == "purchase")
        & (F.round(F.col("value") * 100, 0).cast("long") >= _BIG_TICKET_CENTS)
    )
    u = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("entry_day"),
        F.min(F.when(big, F.to_date("ts"))).alias("event_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    dur = u.select(
        F.datediff(
            F.coalesce("event_day", "last_day"), F.col("entry_day")
        ).alias("t"),
        F.when(F.col("event_day").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    byt = dur.groupBy("t").agg(
        F.count("*").alias("n_all"), F.sum("ev").alias("d_events")
    )
    total = dur.agg(F.count("*").alias("n_total"))
    w_prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t")
    risk = byt.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        F.col("n_total") - F.coalesce(F.sum("n_all").over(w_prior), F.lit(0)),
    )
    haz = risk.select(
        "t",
        "n_risk",
        "d_events",
        (F.col("n_all") - F.col("d_events")).alias("n_censored"),
        F.sum(F.expr("d_events * 1000000 div n_risk"))
        .over(w_cum)
        .alias("cum_hazard_ppm"),
    )
    return haz.select(
        F.col("t").cast("long").alias("t_day"),
        "n_risk",
        "d_events",
        F.col("n_censored").cast("long"),
        "cum_hazard_ppm",
    )


@query(
    "q_timeseries_theil_sen",
    oracle=EVENTS_US
    + """
    , daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events_us GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.event_type,
               CAST((b.cents - a.cents) * 1000000
                    // datediff('day', a.day, b.day) AS BIGINT) AS slope_ppm
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
    ),
    ranked AS (
        SELECT event_type, slope_ppm,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope_ppm) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
        FROM slopes
    ),
    nd AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
        GROUP BY 1
    )
    SELECT r.event_type, nd.n_days, CAST(r.n_pairs AS BIGINT) AS n_pairs,
           r.slope_ppm AS sen_slope_ppm_per_day
    FROM ranked r JOIN nd ON r.event_type = nd.event_type
    WHERE r.rn = (r.n_pairs + 1) // 2
    """,
    tags=("analytics", "timeseries"),
)
def q_timeseries_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator per event-type daily-revenue
    series: the LOWER MEDIAN of all pairwise slopes (cents/day in exact
    ppm, signed — engine-portable because Spark ``div`` and DuckDB
    ``//`` both truncate toward zero).  Breakdown point 29.3%: a third
    of the days can be corrupted (outages, backfills) before the trend
    moves, which is why it's the standard robust complement to the OLS
    slope (q_regress_ols_daily) and the Mann-Kendall direction test
    (q_timeseries_mann_kendall) — the three share one series spec.

    100 TB shape: the pair join is over the DAILY aggregate (n_days²/2
    pairs per series, bounded by the calendar not the data), computed
    per series in parallel; the raw events contribute one map-side
    combined agg."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"))
    a = daily.select(
        "event_type", F.col("day").alias("da"), F.col("cents").alias("ca")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("db"),
        F.col("cents").alias("cb"),
    )
    slopes = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("da") < F.col("db"))
    ).select(
        "event_type",
        F.expr(
            "(cb - ca) * 1000000 div datediff(db, da)"
        ).alias("slope_ppm"),
    )
    wr = Window.partitionBy("event_type").orderBy("slope_ppm")
    wc = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope_ppm",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wc).alias("n_pairs"),
    )
    nd = daily.groupBy("event_type").agg(F.count("*").alias("n_days"))
    return (
        ranked.filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .join(F.broadcast(nd), "event_type")
        .select(
            "event_type",
            "n_days",
            F.col("n_pairs").cast("long"),
            F.col("slope_ppm").alias("sen_slope_ppm_per_day"),
        )
    )


SES_K = 20  # trailing window for exponential smoothing (α = 1/2, dyadic)


@query(
    "q_timeseries_ses_forecast",
    oracle=EVENTS_US
    + f"""
    , daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events_us GROUP BY 1, 2
    ),
    tail AS (
        SELECT event_type, day, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day DESC) AS rn,
               LEAST(COUNT(*) OVER (PARTITION BY event_type),
                     {SES_K}) AS used
        FROM daily
    ),
    win AS (SELECT * FROM tail WHERE rn <= used),
    agg AS (
        SELECT event_type, CAST(MAX(used) AS BIGINT) AS n_days_used,
               CAST(SUM(cents * (CAST(1 AS BIGINT) << (used - rn)))
                    AS BIGINT) AS s_all,
               CAST(SUM(CASE WHEN rn >= 2 THEN
                        cents * (CAST(1 AS BIGINT) << (used - rn))
                        ELSE 0 END) AS BIGINT) AS s_prev,
               CAST(MAX(CASE WHEN rn = 1 THEN cents END) AS BIGINT)
                   AS last_cents,
               MAX(CASE WHEN rn = 1 THEN day END) AS last_day
        FROM win GROUP BY event_type
    )
    SELECT event_type, n_days_used, last_day, last_cents,
           CAST(s_all // ((CAST(1 AS BIGINT) << n_days_used) - 1) AS BIGINT)
               AS forecast_cents,
           CAST(ABS(s_prev // ((CAST(1 AS BIGINT) << (n_days_used - 1)) - 1)
                    - last_cents) AS BIGINT) AS backtest_abs_err_cents
    FROM agg
    """,
    tags=("analytics", "timeseries", "forecast"),
)
def q_timeseries_ses_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-exponential-smoothing one-step forecast per event-type
    daily-revenue series, in CLOSED FORM with α = 1/2 over the trailing
    K=20 days: ŷ = Σ_j y_j·2^(K−j) / (2^K − 1) (j=1 newest) — the
    dyadic weights make the geometric smoothing EXACT int64 arithmetic
    (shift-left + one division), with no recursive state and no float
    pow in either engine.  A backtest column re-runs the same form
    excluding the newest day and reports |forecast − actual| — the
    one-step validation error a forecast consumer checks before
    trusting the number.

    Int64 bound: the binding term is the weighted SUM, not the top
    weight — Σ_j y_j·2^(K−j) ≤ cents_max·(2^K − 1) ≈ cents_max·2^20,
    so overflow needs cents_max ≳ 2^63/2^20 ≈ 8.8·10^12 cents — safe
    to ~$85 B/day per series (half the bound the single 2^19 top
    weight would suggest).  100 TB shape: one map-side-combined daily agg;
    the smoothing itself touches K rows per series (window row_number
    + one grouped sum), independent of raw event count."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"))
    wd = Window.partitionBy("event_type").orderBy(F.col("day").desc())
    wc = Window.partitionBy("event_type")
    tail = daily.select(
        "event_type",
        "day",
        "cents",
        F.row_number().over(wd).alias("rn"),
        F.least(F.count("*").over(wc), F.lit(SES_K)).alias("used"),
    )
    win = tail.filter(F.col("rn") <= F.col("used"))
    agg = win.groupBy("event_type").agg(
        F.max("used").cast("long").alias("n_days_used"),
        F.sum(
            F.expr("cents * shiftleft(cast(1 as bigint), "
                   "cast(used - rn as int))")
        ).alias("s_all"),
        F.sum(
            F.expr(
                "CASE WHEN rn >= 2 THEN cents * shiftleft("
                "cast(1 as bigint), cast(used - rn as int)) ELSE 0 END"
            )
        ).alias("s_prev"),
        F.max(F.when(F.col("rn") == 1, F.col("cents"))).alias("last_cents"),
        F.max(F.when(F.col("rn") == 1, F.col("day"))).alias("last_day"),
    )
    return agg.select(
        "event_type",
        "n_days_used",
        "last_day",
        "last_cents",
        F.expr(
            "s_all div (shiftleft(cast(1 as bigint), "
            "cast(n_days_used as int)) - 1)"
        ).alias("forecast_cents"),
        F.expr(
            "abs(s_prev div (shiftleft(cast(1 as bigint), "
            "cast(n_days_used as int) - 1) - 1) - last_cents)"
        ).alias("backtest_abs_err_cents"),
    )


# Holt fold over columns (ys: double array, n: count) — the fold
# elements are (value, position) for t = 2..n, so the fold can freeze
# the backtest state exactly when it applies element n-1 (Spark arrays
# are 0-indexed; DuckDB's are 1-indexed — each side's position
# arithmetic accounts for it). Module-level so the linear-series
# exactness law (tests/test_new_key_invariants.py) drives the same
# expression the key runs.
HOLT_FOLD_EXPR = """aggregate(
    transform(slice(ys, 2, CAST(n - 1 AS INT)),
              (y, i) -> struct(y AS y, CAST(i + 2 AS BIGINT) AS p)),
    struct(ys[0] AS l, ys[1] - ys[0] AS b,
           CAST(NULL AS DOUBLE) AS fl, CAST(NULL AS DOUBLE) AS fb),
    (acc, s) -> struct(
        0.5D * s.y + 0.5D * (acc.l + acc.b) AS l,
        0.5D * ((0.5D * s.y + 0.5D * (acc.l + acc.b)) - acc.l)
            + 0.5D * acc.b AS b,
        CASE WHEN s.p = n - 1
             THEN 0.5D * s.y + 0.5D * (acc.l + acc.b)
             ELSE acc.fl END AS fl,
        CASE WHEN s.p = n - 1
             THEN 0.5D * ((0.5D * s.y + 0.5D * (acc.l + acc.b))
                          - acc.l) + 0.5D * acc.b
             ELSE acc.fb END AS fb))"""


@query(
    "q_timeseries_holt_forecast",
    oracle="""
    WITH RECURSIVE events_us AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
               event_type, value, props FROM events
    ),
    daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events_us GROUP BY event_type, CAST(ts AS DATE)
    ),
    arr AS (
        SELECT event_type,
               list(CAST(cents AS DOUBLE) ORDER BY day) AS ys,
               list(cents ORDER BY day) AS yi,
               CAST(COUNT(*) AS BIGINT) AS n,
               MAX(day) AS last_day
        FROM daily GROUP BY event_type HAVING COUNT(*) >= 3
    ),
    holt AS (
        SELECT event_type, ys, yi, n, last_day, CAST(1 AS BIGINT) AS t,
               ys[1] AS l, ys[2] - ys[1] AS b,
               CAST(NULL AS DOUBLE) AS fl, CAST(NULL AS DOUBLE) AS fb
        FROM arr
        UNION ALL
        SELECT event_type, ys, yi, n, last_day, t + 1,
               0.5 * ys[CAST(t + 1 AS INT)] + 0.5 * (l + b),
               0.5 * ((0.5 * ys[CAST(t + 1 AS INT)] + 0.5 * (l + b)) - l)
                   + 0.5 * b,
               CASE WHEN t + 1 = n - 1
                    THEN 0.5 * ys[CAST(t + 1 AS INT)] + 0.5 * (l + b)
                    ELSE fl END,
               CASE WHEN t + 1 = n - 1
                    THEN 0.5 * ((0.5 * ys[CAST(t + 1 AS INT)]
                                 + 0.5 * (l + b)) - l) + 0.5 * b
                    ELSE fb END
        FROM holt WHERE t < n
    )
    SELECT event_type, n AS n_days, last_day,
           yi[CAST(n AS INT)] AS last_cents,
           l AS level, b AS trend, l + b AS forecast_next,
           abs((fl + fb) - ys[CAST(n AS INT)]) AS backtest_abs_err
    FROM holt WHERE t = n
    """,
    tags=("analytics", "timeseries"),
)
def q_timeseries_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's LINEAR-TREND forecast (double exponential smoothing,
    α = β = 1/2) per event-type daily-revenue series — the trend
    upgrade of q_timeseries_ses_forecast, which a trending series
    systematically lags: level l_t = ½y_t + ½(l_{t−1} + b_{t−1}),
    trend b_t = ½(l_t − l_{t−1}) + ½b_{t−1}, init l₁ = y₁,
    b₁ = y₂ − y₁; one-step forecast = l_n + b_n. The recursion is a
    SEQUENTIAL LEFT FOLD over the day-ordered series with an
    identical operation order in both engines (Spark ``F.aggregate``
    over the sorted array, DuckDB recursive CTE), and every step is
    IEEE doubles built from exact integer cents with halving —
    bit-identical cross-engine, the Viterbi-DP parity pattern applied
    to floats. A backtest column freezes the fold state at n−1 and
    reports |forecast − actual| for the newest day — the
    trust-but-verify number every forecast consumer checks.

    100 TB shape: one map-side-combined daily agg; the fold runs at
    key grain over ≤|days| elements per series (catalog-sized arrays,
    never event rows); no shuffle beyond the one agg."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.round(F.col("value") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("cents"))
    )
    arr = (
        daily.groupBy("event_type")
        .agg(
            F.sort_array(F.collect_list(F.struct("day", "cents"))).alias(
                "sarr"
            ),
            F.count("*").alias("n"),
            F.max("day").alias("last_day"),
        )
        .filter(F.col("n") >= 3)
        .select(
            "event_type",
            "n",
            "last_day",
            F.expr("transform(sarr, s -> CAST(s.cents AS DOUBLE))").alias(
                "ys"
            ),
            F.expr("transform(sarr, s -> s.cents)").alias("yi"),
        )
    )
    fold = F.expr(HOLT_FOLD_EXPR)
    return arr.select(
        "event_type",
        F.col("n").alias("n_days"),
        "last_day",
        F.expr("yi[CAST(n - 1 AS INT)]").alias("last_cents"),
        fold.alias("h"),
        F.expr("ys[CAST(n - 1 AS INT)]").alias("_yn"),
    ).select(
        "event_type",
        "n_days",
        "last_day",
        "last_cents",
        F.col("h.l").alias("level"),
        F.col("h.b").alias("trend"),
        (F.col("h.l") + F.col("h.b")).alias("forecast_next"),
        F.abs((F.col("h.fl") + F.col("h.fb")) - F.col("_yn")).alias(
            "backtest_abs_err"
        ),
    )


@query(
    "q_regress_ols_daily",
    oracle=EVENTS_US
    + """
    , daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events_us GROUP BY 1, 2
    ),
    xy AS (
        SELECT event_type,
               CAST(datediff('day',
                    MIN(day) OVER (PARTITION BY event_type), day)
                    AS BIGINT) AS x,
               cents AS y
        FROM daily
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM xy GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
                AS BIGINT) AS slope_microcents_per_day,
           CAST((sy * 1000000
                 - ((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)) * sx)
                // (n * 1000000) AS BIGINT) AS intercept_cents
    FROM s
    """,
    tags=("analytics", "timeseries"),
)
def q_regress_ols_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series ordinary-least-squares trend line over the daily
    revenue series, in closed form from the five sufficient statistics
    (n, Σx, Σy, Σx², Σxy): slope = (nΣxy − ΣxΣy)/(nΣxx − Σx²) as exact
    signed micro-cents/day (both engines truncate toward zero), and
    the intercept back-solved from the SAME truncated slope so the two
    engines share every intermediate.  The sufficient statistics are
    the distributed-OLS canon — they fold associatively in one
    map-side-combined pass, which is why this form (not a solver)
    is how regression runs on a 1000-executor cluster.

    Int64 bound — the BINDING term is the micro-cents slope numerator
    cov·1e6 = slope_cents·(n⁴/12)·1e6: at ~$1k/day-scale slopes it
    passes 2⁶³ near n ≈ 180 days, and even $10/day slopes bind by
    n ≈ 575 — the n⁴ growth, not the moment product n·Σxy ≤ n³·y_max
    (safe to ~$100k/day at n=2000), is what caps the horizon.  For
    longer series re-base x to week indices (n⁴ shrinks 2400×),
    report micro-cents/week, or shard by year and POOL the five
    statistics — they add exactly.  Complements
    q_timeseries_theil_sen (robust median slope) on the same series
    spec."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"))
    wmin = Window.partitionBy("event_type")
    xy = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.min("day").over(wmin))
        .cast("long")
        .alias("x"),
        F.col("cents").alias("y"),
    )
    s = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.expr(
            "(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)"
        ).alias("slope_microcents_per_day"),
        F.expr(
            "(sy * 1000000 - ((n * sxy - sx * sy) * 1000000 div "
            "(n * sxx - sx * sx)) * sx) div (n * 1000000)"
        ).alias("intercept_cents"),
    )


@query(
    "q_agg_simpson_diversity",
    oracle="""
    WITH c AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ),
    s AS (
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_langs,
               CAST(SUM(n * (n - 1)) AS BIGINT) AS same_pairs2,
               CAST(MAX(n) AS BIGINT) AS top_n
        FROM c GROUP BY 1
    )
    SELECT source, n_docs, n_langs,
           CAST(1000000 - same_pairs2 * 1000000 // (n_docs * (n_docs - 1))
                AS BIGINT) AS simpson_ppm,
           CAST(top_n * 1000000 // n_docs AS BIGINT) AS top_share_ppm
    FROM s
    """,
    tags=("analytics", "diversity"),
)
def q_agg_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity index per corpus source over the language
    distribution — the probability two documents drawn WITHOUT
    replacement differ in language: D = 1 − Σnᵢ(nᵢ−1)/(N(N−1)).  The
    unbiased finite-sample (Hurlbert PIE) form is an exact integer
    rational, unlike Shannon entropy's transcendental log — which is
    why diversity dashboards that must reconcile across engines ship
    Simpson, not Shannon.  Emitted next to the dominant-language share
    (the concentration complement): a curation guardrail pair — a
    source whose D collapses or top-share spikes drifted monolingual.

    100 TB shape: one (source, lang) hash agg (map-side combined),
    then per-source math on the |sources|×|langs| grid — catalog
    grain, no second pass over documents."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    s = c.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count("*").alias("n_langs"),
        F.sum(F.expr("n * (n - 1)")).alias("same_pairs2"),
        F.max("n").alias("top_n"),
    )
    return s.select(
        "source",
        "n_docs",
        "n_langs",
        F.expr(
            "1000000 - same_pairs2 * 1000000 div (n_docs * (n_docs - 1))"
        ).alias("simpson_ppm"),
        F.expr("top_n * 1000000 div n_docs").alias("top_share_ppm"),
    )


_CUPED_SPLIT_DAY = "2024-01-16"  # pre-period X: days 1-15; post Y: 16-30


@query(
    "q_ab_cuped",
    oracle=EVENTS_US
    + f"""
    , u AS (
        SELECT user_id,
               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT_DAY}'
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                    // 100 AS BIGINT) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT_DAY}'
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                    // 100 AS BIGINT) AS y
        FROM events_us GROUP BY 1
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM u
    ),
    arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy
        FROM u GROUP BY 1
    ),
    k AS (
        SELECT CAST((m.n * m.sxy - m.sx * m.sy) * 1000
                    // (m.n * m.sxx - m.sx * m.sx) AS BIGINT) AS k_x1000
        FROM m
    ),
    w AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 0 THEN sx END) AS sx0,
               MAX(CASE WHEN arm = 1 THEN sx END) AS sx1,
               MAX(CASE WHEN arm = 0 THEN sy END) AS sy0,
               MAX(CASE WHEN arm = 1 THEN sy END) AS sy1
        FROM arms
    )
    SELECT w.n0, w.n1, k.k_x1000,
           CAST(w.sy1 * 1000 // w.n1 - w.sy0 * 1000 // w.n0 AS BIGINT)
               AS raw_diff_mdollar,
           CAST(w.sy1 * 1000 // w.n1 - w.sy0 * 1000 // w.n0
                - k.k_x1000 * (w.sx1 * 1000 // w.n1 - w.sx0 * 1000 // w.n0)
                  // 1000 AS BIGINT) AS cuped_diff_mdollar,
           CAST(k.k_x1000 * (w.sx1 * 1000 // w.n1 - w.sx0 * 1000 // w.n0)
                // 1000 AS BIGINT) AS pre_bias_mdollar
    FROM w, k
    """,
    tags=("analytics", "experiment"),
)
def q_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) — the control
    -variates readout modern experiment platforms apply before calling
    a winner: the post-period metric Y is adjusted by the PRE-period
    covariate X via θ = Y − k·(X − X̄), k = cov(X,Y)/var(X), removing
    the variance users brought with them into the experiment.  k is
    built from the five associative moment sums (same distributed form
    as q_regress_ols_daily) as an exact ×1000 integer; the adjusted
    treatment effect and the pre-period bias it subtracts are emitted
    in milli-dollars next to the raw difference.  Under hash
    assignment pre-period balance makes the adjustment small but
    nonzero — exactly what CUPED corrects.

    Int64 bound: n·Σxy in whole DOLLARS ×1000 — safe to ~500k users
    at these revenue scales; past that, shard users by hash into
    strata and POOL the moment sums (they add exactly).  100 TB
    shape: one user-grain agg (both period sums fold into one pass),
    then all math on one moment row and a 2-row arm pivot.  The global
    moments POOL the per-arm moment sums (round 14): `u` used to feed
    two separate aggregations (global moments + arm sums) and Spark
    does no CSE across branches, so the fact-scale user-grain pass ran
    twice; arms partition users, integer sums add exactly, so one
    per-arm pass carries everything."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.expr(
            f"CAST(sum(CASE WHEN ts < timestamp'{_CUPED_SPLIT_DAY}' "
            "THEN CAST(round(value * 100, 0) AS LONG) ELSE 0 END) "
            "div 100 AS LONG)"
        ).alias("x"),
        F.expr(
            f"CAST(sum(CASE WHEN ts >= timestamp'{_CUPED_SPLIT_DAY}' "
            "THEN CAST(round(value * 100, 0) AS LONG) ELSE 0 END) "
            "div 100 AS LONG)"
        ).alias("y"),
    ).select(
        F.pmod(hex_hash(F.col("user_id").cast("string")), F.lit(2)).alias(
            "arm"
        ),
        "x",
        "y",
    )
    arms = u.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("sx"))).alias("sx0"),
        F.max(F.when(F.col("arm") == 1, F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("arm") == 0, F.col("sy"))).alias("sy0"),
        F.max(F.when(F.col("arm") == 1, F.col("sy"))).alias("sy1"),
        # pooled global moments: Σ over the arm partition of each
        # per-arm integer sum — identical int64 values to the old
        # direct global agg over u.
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("sxy").alias("sxy"),
    ).withColumn(
        "k_x1000",
        F.expr(
            "CAST((n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx) "
            "AS LONG)"
        ),
    )
    return w.select(
        "n0",
        "n1",
        "k_x1000",
        F.expr("sy1 * 1000 div n1 - sy0 * 1000 div n0").alias(
            "raw_diff_mdollar"
        ),
        F.expr(
            "sy1 * 1000 div n1 - sy0 * 1000 div n0 "
            "- k_x1000 * (sx1 * 1000 div n1 - sx0 * 1000 div n0) div 1000"
        ).alias("cuped_diff_mdollar"),
        F.expr(
            "k_x1000 * (sx1 * 1000 div n1 - sx0 * 1000 div n0) div 1000"
        ).alias("pre_bias_mdollar"),
    )


_QTE_PS = (25, 50, 75, 90)


def _qte_oracle() -> str:
    rows = []
    for p in _QTE_PS:
        rows.append(f"""
        SELECT CAST({p} AS BIGINT) AS p_x100,
               quantile_cont(CASE WHEN arm = 0 THEN m END, {p / 100}) / 100.0
                   AS q_ctrl,
               quantile_cont(CASE WHEN arm = 1 THEN m END, {p / 100}) / 100.0
                   AS q_treat,
               quantile_cont(CASE WHEN arm = 1 THEN m END, {p / 100}) / 100.0
               - quantile_cont(CASE WHEN arm = 0 THEN m END, {p / 100}) / 100.0
                   AS qte
        FROM ua""")
    return (
        "WITH events_us AS (SELECT user_id, value FROM events), "
        """um AS (
        SELECT user_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS m
        FROM events_us GROUP BY 1
    ),
    ua AS (
        SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm, m
        FROM um
    )
    """
        + " UNION ALL ".join(rows)
    )


@query(
    "q_ab_quantile_effects",
    oracle=_qte_oracle(),
    tags=("analytics", "experiment"),
)
def q_ab_quantile_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects — the distributional readout that
    catches what the mean hides (a treatment helping the p25 while
    hurting the p90 averages to nothing): per-arm user-revenue
    quantiles at p25/50/75/90 and their differences.  Quantiles are
    type-7 linear interpolation over EXACT integer cents (the
    q_agg_percentile parity recipe — both engines interpolate the
    same int64 order statistics, then one constant division), so QTE
    subtraction is bit-deterministic.  Completes the experiment
    family: SRM guardrail → mean lift (uplift/CUPED) → rank test
    (Mann-Whitney) → THIS, the full-distribution view.

    100 TB shape: one user-grain agg, then per-arm quantiles — exact
    percentile is a sort-based agg (at real scale swap in
    approx_percentile's mergeable sketch, same output contract); 4
    rows out."""
    e = load_table(spark, sf_dir, "events")
    um = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("m")
    )
    ua = um.select(
        F.pmod(hex_hash(F.col("user_id").cast("string")), F.lit(2)).alias(
            "arm"
        ),
        "m",
    )
    parts = []
    for p in _QTE_PS:
        parts.append(
            ua.agg(
                F.lit(p).cast("long").alias("p_x100"),
                (
                    F.expr(
                        f"percentile(CASE WHEN arm = 0 THEN m END, {p / 100})"
                    )
                    / 100.0
                ).alias("q_ctrl"),
                (
                    F.expr(
                        f"percentile(CASE WHEN arm = 1 THEN m END, {p / 100})"
                    )
                    / 100.0
                ).alias("q_treat"),
                (
                    F.expr(
                        f"percentile(CASE WHEN arm = 1 THEN m END, {p / 100})"
                    )
                    / 100.0
                    - F.expr(
                        f"percentile(CASE WHEN arm = 0 THEN m END, {p / 100})"
                    )
                    / 100.0
                ).alias("qte"),
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.union(pdf)
    return out


# ---------------------------------------------------------------------------
# Exact Shapley-value attribution over 4 channels
# ---------------------------------------------------------------------------

_SHAP_CHANNELS = (("click", 1), ("view", 2), ("signup", 4), ("error", 8))
_SHAP_THR = 14  # habitual-engagement exposure: >= 14 events of the type
_SHAP_W24 = {0: 6, 1: 2, 2: 2, 3: 6}  # |S|!(3-|S|)! = 24·w(|S|)


def _shap_coalitions() -> list[tuple[str, int, int, int]]:
    """(channel, mask_without, mask_with, w24) for all 4 channels × 8
    subsets not containing the channel — Python-enumerated constants
    shared by both engines."""
    rows = []
    for name, bit in _SHAP_CHANNELS:
        for mask in range(16):
            if mask & bit:
                continue
            size = bin(mask).count("1")
            rows.append((name, mask, mask | bit, _SHAP_W24[size]))
    return rows


def _shap_oracle() -> str:
    conds = " + ".join(
        f"(CASE WHEN n_{name} >= {_SHAP_THR} THEN {bit} ELSE 0 END)"
        for name, bit in _SHAP_CHANNELS
    )
    counters = ", ".join(
        f"SUM(CASE WHEN event_type = '{name}' THEN 1 ELSE 0 END) AS n_{name}"
        for name, _ in _SHAP_CHANNELS
    )
    coal = ", ".join(
        f"('{c}', {s0}, {s1}, {w})" for c, s0, s1, w in _shap_coalitions()
    )
    return f"""
    WITH pc AS (
        SELECT user_id, {counters},
               MAX(CASE WHEN event_type = 'purchase'
                         AND CAST(ROUND(value * 100) AS BIGINT) >= 20000
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1
    ),
    masks AS (SELECT {conds} AS mask, conv FROM pc),
    v AS (
        SELECT mask, CAST(SUM(conv) * 1000000 // COUNT(*) AS BIGINT)
                   AS v_ppm
        FROM masks GROUP BY 1
    ),
    coal(channel, s0, s1, w24) AS (SELECT * FROM (VALUES {coal})),
    phi AS (
        SELECT coal.channel,
               CAST(SUM(coal.w24 * (COALESCE(v1.v_ppm, 0)
                                    - COALESCE(v0.v_ppm, 0))) AS BIGINT)
                   AS phi24
        FROM coal
        LEFT JOIN v v0 ON v0.mask = coal.s0
        LEFT JOIN v v1 ON v1.mask = coal.s1
        GROUP BY 1
    ),
    ends AS (
        SELECT CAST(COALESCE((SELECT v_ppm FROM v WHERE mask = 15), 0)
                    AS BIGINT) AS v_full_ppm,
               CAST(COALESCE((SELECT v_ppm FROM v WHERE mask = 0), 0)
                    AS BIGINT) AS v_empty_ppm
    )
    SELECT phi.channel, CAST(phi.phi24 // 24 AS BIGINT) AS phi_ppm,
           ends.v_full_ppm, ends.v_empty_ppm
    FROM phi, ends
    """


@query(
    "q_attribution_shapley",
    oracle=_shap_oracle(),
    tags=("analytics", "attribution"),
)
def q_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution — the game-theoretic credit
    split (the only one satisfying efficiency/symmetry/dummy/
    additivity) that Markov-removal approximates: with 4 channels the
    2⁴ coalition values are all estimable, so φ_c = Σ_{S∌c}
    |S|!(n−|S|−1)!/n! · (v(S∪c) − v(S)) is computed EXACTLY from the
    16-cell table.  Exposure is the habitual-engagement threshold
    (≥14 events of the type — every cell populated at test SFs, no
    window-censoring artifact); v(S) = big-ticket conversion ppm of
    users with exposure set exactly S; the 32 coalition weights
    (×24) are Python-enumerated constants shared by both engines, so
    φ is integer arithmetic end-to-end.  v(full)/v(∅) are emitted for
    the efficiency audit Σφ ≈ v(full) − v(∅) (exact in rationals;
    ≤ a few ppm truncation drift here).

    100 TB shape: one user-grain agg (4 counters + the conversion
    flag in a single pass) → a 16-row v table → a 32-row broadcast
    coalition join; attribution cost is the user agg, the game theory
    is free."""
    e = load_table(spark, sf_dir, "events")
    counters = [
        F.sum(
            F.when(F.col("event_type") == name, 1).otherwise(0)
        ).alias(f"n_{name}")
        for name, _ in _SHAP_CHANNELS
    ]
    pc = e.groupBy("user_id").agg(
        *counters,
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.round(F.col("value") * 100, 0).cast("long") >= 20000),
                1,
            ).otherwise(0)
        ).alias("conv"),
    )
    mask = None
    for name, bit in _SHAP_CHANNELS:
        term = F.when(F.col(f"n_{name}") >= _SHAP_THR, bit).otherwise(0)
        mask = term if mask is None else mask + term
    v = (
        pc.select(mask.alias("mask"), "conv")
        .groupBy("mask")
        .agg(F.expr("CAST(sum(conv) * 1000000 div count(*) AS LONG)").alias("v_ppm"))
    )
    coal = F.broadcast(
        spark.createDataFrame(
            _shap_coalitions(), "channel string, s0 int, s1 int, w24 long"
        )
    )
    v0 = v.select(F.col("mask").alias("s0"), F.col("v_ppm").alias("vp0"))
    v1 = v.select(F.col("mask").alias("s1"), F.col("v_ppm").alias("vp1"))
    phi = (
        coal.join(v0, "s0", "left")
        .join(v1, "s1", "left")
        .groupBy("channel")
        .agg(
            F.sum(
                F.col("w24")
                * (
                    F.coalesce("vp1", F.lit(0))
                    - F.coalesce("vp0", F.lit(0))
                )
            ).alias("phi24")
        )
    )
    ends = v.agg(
        F.coalesce(
            F.max(F.when(F.col("mask") == 15, F.col("v_ppm"))), F.lit(0)
        ).cast("long").alias("v_full_ppm"),
        F.coalesce(
            F.max(F.when(F.col("mask") == 0, F.col("v_ppm"))), F.lit(0)
        ).cast("long").alias("v_empty_ppm"),
    )
    return phi.crossJoin(F.broadcast(ends)).select(
        "channel",
        F.expr("phi24 div 24").alias("phi_ppm"),
        "v_full_ppm",
        "v_empty_ppm",
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR control over a battery of SRM tests
# ---------------------------------------------------------------------------

# chi2(1) upper critical values at alpha*i/m, alpha=0.05, m=6 tests,
# i = rank 1..6 (x1e6) — (Phi^-1(alpha*i/12))^2, bisection on erfc.
_BH_CRIT_X1M = (6960401, 5731139, 5023886, 4528577, 4148693, 3841459)


def _bh_oracle() -> str:
    crit = ", ".join(
        f"({i + 1}, {c})" for i, c in enumerate(_BH_CRIT_X1M)
    )
    return f"""
    WITH u AS (
        SELECT user_id,
               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm,
               user_id % 10 < 7 AS skew_arm
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    seg AS (
        SELECT c.c_mktsegment AS test_name,
               CAST(SUM(CASE WHEN u.arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
               CAST(SUM(CASE WHEN u.arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1
        FROM u JOIN customer c ON u.user_id = c.c_custkey
        GROUP BY 1
        UNION ALL
        SELECT 'CANARY_SKEW',
               CAST(SUM(CASE WHEN skew_arm THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT skew_arm THEN 1 ELSE 0 END) AS BIGINT)
        FROM u
    ),
    chi AS (
        SELECT test_name,
               CAST(CAST(n0 - n1 AS HUGEINT) * (n0 - n1) * 1000000
                    // (n0 + n1) AS BIGINT) AS chi2_x1m
        FROM seg
    ),
    ranked AS (
        SELECT test_name, chi2_x1m,
               CAST(row_number() OVER (ORDER BY chi2_x1m DESC, test_name)
                    AS BIGINT) AS rnk
        FROM chi
    ),
    crit(rnk, crit_x1m) AS (SELECT * FROM (VALUES {crit})),
    j AS (
        SELECT r.test_name, r.chi2_x1m, r.rnk,
               CAST(c.crit_x1m AS BIGINT) AS crit_x1m,
               CASE WHEN r.chi2_x1m >= c.crit_x1m THEN r.rnk END AS hit
        FROM ranked r JOIN crit c ON r.rnk = c.rnk
    ),
    kmax AS (SELECT COALESCE(MAX(hit), 0) AS k FROM j)
    SELECT j.test_name, j.chi2_x1m, j.rnk, j.crit_x1m,
           j.rnk <= kmax.k AS reject_bh,
           j.chi2_x1m >= {_BH_CRIT_X1M[0]} AS reject_bonferroni
    FROM j, kmax
    """


@query(
    "q_ab_fdr_bh",
    oracle=_bh_oracle(),
    tags=("analytics", "experiment"),
)
def q_ab_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a BATTERY of guardrail
    tests — what an experimentation platform actually runs (one SRM
    χ² per segment plus platform canaries) where per-test α would
    false-alarm constantly: tests are ranked by evidence (χ² DESC ≡
    p ASC) and the step-up rule rejects ranks ≤ max{k: p₍ₖ₎ ≤ αk/m},
    evaluated in pure integers against Python-precomputed χ²₁
    critical values at α·k/m (bisection on erfc — no distribution
    functions in either engine).  A deterministic 70/30 planted skew
    (CANARY_SKEW) fires the reject arm while the five real segments
    stay null — the canary-arm convention of this suite; Bonferroni
    (α/m) is emitted beside BH to show the power difference at the
    margin.

    Int64 bound: the (n0−n1)²·1e6 cross-multiply runs in
    DECIMAL(38)/HUGEINT (the q_ab_srm_check rationale — the canary
    arm's planted 70/30 skew is EXACTLY the diff-O(n) regime that
    wraps int64 past |diff| ≈ 3·10⁶); the χ² output is ≤ n·10⁶,
    inside int64 to ~9·10¹² users per test.

    100 TB shape: the battery is one user-grain hash agg + a
    |tests|-row rank window + a |tests|-row broadcast critical-value
    join — multiple-testing control costs nothing beyond the tests
    themselves."""
    e = load_table(spark, sf_dir, "events")
    u = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.pmod(hex_hash(F.col("user_id").cast("string")), F.lit(2)).alias(
                "arm"
            ),
            (F.col("user_id") % 10 < 7).alias("skew_arm"),
        )
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("test_name"),
    )
    # ONE pass over the user grain for both the per-segment battery
    # AND the canary (guide §1.2 — the segment branch and the canary
    # branch used to each run the full events distinct + hash; no CSE
    # across a union). The customer join goes LEFT (c_custkey is the
    # table's primary key, so ≤ 1 row per user: row count is
    # preserved); users outside the customer table land in the NULL
    # test_name bucket, which only the canary sums consume — the
    # segment rows filter it out, reproducing the old inner join.
    per_seg = (
        u.join(F.broadcast(c), "user_id", "left")
        .groupBy("test_name")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("skew_arm"), 1).otherwise(0)).alias("s0"),
            F.sum(F.when(~F.col("skew_arm"), 1).otherwise(0)).alias("s1"),
        )
        .localCheckpoint(eager=False)
    )
    seg = per_seg.filter(F.col("test_name").isNotNull()).select(
        "test_name", "n0", "n1"
    )
    canary = per_seg.agg(
        F.lit("CANARY_SKEW").alias("test_name"),
        F.sum("s0").alias("n0"),
        F.sum("s1").alias("n1"),
    )
    chi = seg.unionByName(canary).select(
        "test_name",
        F.expr(
            "CAST(CAST(n0 - n1 AS DECIMAL(38, 0)) * (n0 - n1) * 1000000"
            " div (n0 + n1) AS LONG)"
        ).alias("chi2_x1m"),
    )
    w = Window.orderBy(F.col("chi2_x1m").desc(), "test_name")
    ranked = chi.withColumn("rnk", F.row_number().over(w).cast("long"))
    crit = F.broadcast(
        spark.createDataFrame(
            [(i + 1, c) for i, c in enumerate(_BH_CRIT_X1M)],
            "rnk long, crit_x1m long",
        )
    )
    j = ranked.join(crit, "rnk").withColumn(
        "hit", F.when(F.col("chi2_x1m") >= F.col("crit_x1m"), F.col("rnk"))
    )
    kmax = j.agg(F.coalesce(F.max("hit"), F.lit(0)).alias("k"))
    return j.crossJoin(F.broadcast(kmax)).select(
        "test_name",
        "chi2_x1m",
        "rnk",
        "crit_x1m",
        (F.col("rnk") <= F.col("k")).alias("reject_bh"),
        (F.col("chi2_x1m") >= F.lit(_BH_CRIT_X1M[0])).alias(
            "reject_bonferroni"
        ),
    )


# ---------------------------------------------------------------------------
# Power analysis: required sample size across an MDE sweep
# ---------------------------------------------------------------------------

# (z_{alpha/2} + z_beta)^2 x1e6 at alpha=0.05 two-sided, power=0.8:
# (1.959964 + 0.841621)^2 = 7.848886 — fixed by the design, not the data.
_PWR_ZSUM2_X1M = 7_848_886
_PWR_MDES_PPM = (10_000, 100_000, 500_000)  # 1%, 10%, 50% absolute lift


def _power_oracle() -> str:
    rows = " UNION ALL ".join(
        f"""SELECT CAST({mde} AS BIGINT) AS mde_ppm,
               b.p_ppm,
               CAST({_PWR_ZSUM2_X1M} * 2 * b.p_ppm * (1000000 - b.p_ppm)
                    // ({mde} * CAST({mde} AS BIGINT) * 1000000) AS BIGINT)
                   AS n_required_per_arm,
               b.n_users,
               b.n_users // 2 >= {_PWR_ZSUM2_X1M} * 2 * b.p_ppm
                   * (1000000 - b.p_ppm)
                   // ({mde} * CAST({mde} AS BIGINT) * 1000000) AS powered
        FROM b"""
        for mde in _PWR_MDES_PPM
    )
    return f"""
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase'
                         AND CAST(ROUND(value * 100) AS BIGINT) >= 10000
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1
    ),
    b AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(conv) * 1000000 // COUNT(*) AS BIGINT) AS p_ppm
        FROM u
    )
    {rows}
    """


@query(
    "q_ab_power_mde_sweep",
    oracle=_power_oracle(),
    tags=("analytics", "experiment"),
)
def q_ab_power_mde_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power analysis BEFORE the experiment — the design step the rest
    of the A/B family assumes: for a sweep of minimum detectable
    effects (1%/10%/50% absolute lift), the required per-arm sample
    size n = (z_{α/2}+z_β)²·2·p(1−p)/Δ² from the measured baseline
    conversion rate, in exact integers — the z-constant is fixed by
    the design (α=0.05, power 0.8) and Python-precomputed, p(1−p) is
    an integer ppm product, and Δ² divides out in one truncated
    division.  A `powered` verdict compares available users per arm
    against the requirement: the small-MDE rows are honestly
    underpowered at test scale while the 50% row is powered — both
    verdict arms fire by construction.

    Int64 bound: z²·2·p(1−p) ≤ 7.85e6·2·2.5e11 ≈ 3.9e18 — inside
    int64 for any p; the formula is scale-free (only the baseline
    rate enters).  100 TB shape: one user-grain agg for (n, p), then
    3 rows of constant arithmetic — design costs nothing."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.round(F.col("value") * 100, 0).cast("long") >= 10000),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    b = u.agg(
        F.count("*").alias("n_users"),
        F.expr("CAST(sum(conv) * 1000000 div count(*) AS LONG)").alias(
            "p_ppm"
        ),
    )
    mdes = F.broadcast(
        spark.createDataFrame([(m,) for m in _PWR_MDES_PPM], "mde_ppm long")
    )
    return b.crossJoin(mdes).select(
        "mde_ppm",
        "p_ppm",
        F.expr(
            f"CAST({_PWR_ZSUM2_X1M} * 2 * p_ppm * (1000000 - p_ppm) "
            "div (mde_ppm * mde_ppm * 1000000) AS LONG)"
        ).alias("n_required_per_arm"),
        "n_users",
        F.expr(
            f"n_users div 2 >= {_PWR_ZSUM2_X1M} * 2 * p_ppm "
            "* (1000000 - p_ppm) div (mde_ppm * mde_ppm * 1000000)"
        ).alias("powered"),
    )
