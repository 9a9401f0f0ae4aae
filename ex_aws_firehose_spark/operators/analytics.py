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
