"""Window/event-analytics queries — Spark-native surface that *exceeds* the
reference: its parser names window functions in a dead dispatch branch but
never lexes them (parser.go:5048-5051 vs keyword table :34-55), so
ROW_NUMBER/RANK/LAG/... are unreachable there. Spark has them natively; we
expose the full set with DuckDB oracles.

Determinism: every window ORDER BY ends in a unique key; time arithmetic is
truncate-to-second-then-subtract on both engines; the events table's
nanosecond timestamps stay as integer nanos in Spark (see tables.py) and
convert losslessly where a real timestamp is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ranger_spark.queries import register
from ranger_spark.tables import (
    events_with_ts,
    load,
    ts_epoch_sec,
    ts_epoch_us,
)


@register(
    "window_topn_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(row_number() OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             ) AS INTEGER) AS rn
      FROM customer
    ) t WHERE rn <= 3
    """,
    tags=("window",),
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ROW_NUMBER — the canonical window pattern; at
    scale this is one hash-partitioned sort per group key, no global sort."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    WHERE o_custkey < 100
    """,
    tags=("window",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer (ordered frame → deterministic double
    accumulation order on both engines)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
    )


@register(
    "window_rank_family",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(rank()       OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(ntile(4)     OVER w AS INTEGER) AS quartile,
           percent_rank()    OVER w             AS pct_rank,
           cume_dist()       OVER w             AS cdist
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
    tags=("window",),
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE / PERCENT_RANK / CUME_DIST — the whole
    family the reference's parser names but can never reach."""
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cdist"),
        )
    )


@register(
    "window_lead_lag",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "events"),
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD/LAG deltas per user ordered by event time (integer-nanos
    ordering in Spark == timestamp ordering in the oracle)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            (F.col("value") - F.lag("value").over(w)).alias("delta"),
        )
    )


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
           count(*) AS cnt, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "time"),
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour aggregate — the batch shape of a streaming windowed
    agg (see ranger_spark.streaming for the readStream variant)."""
    ev = events_with_ts(spark, sf_dir)
    return ev.groupBy(
        # string-formatted bucket (see q3 note on timestamp dtype parity)
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
            "hour"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "events_sessionization",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events
    ),
    w AS (
      SELECT user_id, ts_sec,
             lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS prev
      FROM e
    ),
    f AS (
      SELECT user_id,
             CASE WHEN prev IS NULL OR ts_sec - prev > 14400 THEN 1 ELSE 0 END AS new_s
      FROM w
    )
    SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM f GROUP BY user_id
    """,
    tags=("events", "session"),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (4 h inactivity): lag → new-session flag →
    per-user session count. One shuffle on user_id; the cumulative-flag
    formulation avoids any iterative/driver-side loop."""
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_sec", ts_epoch_sec()
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    flagged = ev.select(
        "user_id",
        F.when(
            F.lag("ts_sec").over(w).isNull()
            | ((F.col("ts_sec") - F.lag("ts_sec").over(w)) > 14400),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_s").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


@register(
    "events_daily_unique",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS unique_users,
           count(*) AS cnt
    FROM events
    GROUP BY 1
    """,
    tags=("events", "distinct"),
)
def events_daily_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users: COUNT(DISTINCT) over a time bucket (two-phase
    partial-distinct aggregation at scale)."""
    ev = events_with_ts(spark, sf_dir)
    return ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("unique_users"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "window_value_family",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def window_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE over a full-partition frame
    (the last third of the reference's dead window-function list)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        )
    )


@register(
    "percentiles_by_group",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6)        AS median_qty,
           round(quantile_cont(l_extendedprice, 0.9), 6)   AS p90_price,
           quantile_disc(l_quantity, 0.25)                 AS q1_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("percentile", "agg"),
)
def percentiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_CONT / PERCENTILE_DISC (named in the reference's dead
    dispatch branch; executable here). Exact percentiles — at 100 TB the
    approx_percentile sketch is the scale path; this is the exact
    semantics both engines agree on."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90_price"),
            F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").alias(
                "q1_qty_disc"
            ),
        )
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           round(sum(o_totalprice) OVER (
             ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
           ), 2) AS nearby_sum
    FROM orders
    WHERE o_custkey < 30
    """,
    tags=("window", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) window frame — ROWS vs RANGE is exactly the
    distinction stranded in the reference's dead grammar
    (parser.go:4233); here both are executable."""
    w = (
        Window.orderBy("o_totalprice").rangeBetween(-1000, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 30)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.round(F.sum("o_totalprice").over(w), 2).alias("nearby_sum"),
        )
    )


@register(
    "token_frequencies",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(
        trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS tok
      FROM documents
    )
    SELECT tok, count(*) AS freq
    FROM toks
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 20
    """,
    tags=("text", "explode"),
)
def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical distributed word count: explode → groupBy → top-k,
    over the documents corpus (map-side combine keeps the shuffle at
    O(vocabulary))."""
    from ranger_spark.operators.text import normalize_text, tokenize

    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokenize(normalize_text(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok"))
        .limit(20)
    )


@register(
    "asof_purchase_view",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.ts_us,
           v.ts_us AS asof_ts_us, v.event_id AS asof_event_id
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts_us >= v.ts_us
    """,
    tags=("asof", "join", "events"),
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the user's most recent
    prior view (union-then-window plan, one shuffle — see
    operators/timeseries.py; a naive inequality join is O(|L|·|R|)/key)."""
    from ranger_spark.operators.timeseries import asof_join

    ev = load(spark, sf_dir, "events").withColumn(
        "ts_us", ts_epoch_us()
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_us"
    )
    return asof_join(
        p, v, on="user_id", left_ts="ts_us", right_ts="ts_us",
        right_cols=["event_id"],
    )


@register(
    "range_join_error_purchase",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events WHERE event_type = 'error'
    ),
    p AS (
      SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id AS error_id, p.event_id AS purchase_id, e.user_id,
           p.ts_sec - e.ts_sec AS delta_sec
    FROM e JOIN p
      ON e.user_id = p.user_id AND abs(e.ts_sec - p.ts_sec) <= 600
    """,
    tags=("rangejoin", "join", "events"),
)
def range_join_error_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: (error, purchase) pairs of the same user within 10
    minutes, via bucketized equi-join (operators/timeseries.py) — the
    shuffle stays hash-partitioned instead of a quadratic theta-join."""
    from ranger_spark.operators.timeseries import range_join_buckets

    ev = load(spark, sf_dir, "events").withColumn(
        "ts_sec", ts_epoch_sec()
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts_sec").alias("e_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts_sec").alias("p_ts"),
    )
    return range_join_buckets(
        e, p, on="user_id", left_ts="e_ts", right_ts="p_ts", max_distance=600
    ).select(
        "error_id",
        "purchase_id",
        "user_id",
        (F.col("p_ts") - F.col("e_ts")).alias("delta_sec"),
    )


@register(
    "rollup_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS cnt, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("rollup",),
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — subtotal hierarchy in one pass."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_type,
             abs(e.value - s.mu) / s.sigma AS az
      FROM events e JOIN stats s USING (event_type)
      WHERE s.sigma > 0
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN az > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalies,
           round(max(az), 6) AS max_abs_z
    FROM z GROUP BY event_type
    """,
    tags=("analytics", "anomaly"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier flagging — the data-quality monitor over
    an event stream: one stats aggregate broadcast back over the scan,
    one final per-type aggregate (two shuffles on a low-cardinality
    key, nothing row-wise in Python)."""
    e = load(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    # sigma=0 (a type whose values are all identical) would diverge
    # across engines (Spark double/0 -> NULL, DuckDB -> inf): such
    # groups carry no anomaly signal, drop them on both sides
    z = (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.col("sigma") > 0)
        .withColumn(
            "az", F.abs(F.col("value") - F.col("mu")) / F.col("sigma")
        )
    )
    return z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("az") > 3.0, 1).otherwise(0)).alias("n_anomalies"),
        F.round(F.max("az"), 6).alias("max_abs_z"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewers,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clickers,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchasers,
           round((SELECT count(*) FROM c) /
                 CAST((SELECT count(*) FROM v) AS DOUBLE), 6)
             AS view_to_click,
           round((SELECT count(*) FROM p) /
                 CAST((SELECT count(*) FROM c) AS DOUBLE), 6)
             AS click_to_purchase
    """,
    tags=("analytics", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → later click → later purchase):
    each stage is one filtered aggregate joined to the previous stage on
    user_id — strictly-ordered step semantics, three shuffles on the
    user key, no window over the full stream."""
    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_viewers"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clickers")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchasers")))
    )
    return counts.select(
        "n_viewers",
        "n_clickers",
        "n_purchasers",
        F.round(F.col("n_clickers") / F.col("n_viewers"), 6).alias(
            "view_to_click"
        ),
        F.round(F.col("n_purchasers") / F.col("n_clickers"), 6).alias(
            "click_to_purchase"
        ),
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_n
      FROM events e JOIN first_seen f USING (user_id)
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_size,
           CAST(count(DISTINCT CASE WHEN day_n = 1 THEN user_id END)
                AS BIGINT) AS d1,
           CAST(count(DISTINCT CASE WHEN day_n = 7 THEN user_id END)
                AS BIGINT) AS d7,
           CAST(count(DISTINCT CASE WHEN day_n = 30 THEN user_id END)
                AS BIGINT) AS d30
    FROM activity
    GROUP BY cohort_day
    """,
    tags=("analytics", "retention"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-N cohort retention: users grouped by first-seen day, with the
    count still active exactly 1/7/30 days later — one first-seen
    aggregate joined back over the stream, then one distinct-per-cohort
    aggregate. The activity set is distinct (user, day) pairs, so the
    shuffle is bounded by users × active-days, not raw events."""
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_n"
            ),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort_day").cast("string").alias("cohort_day")
    ).agg(
        F.countDistinct("user_id").alias("cohort_size"),
        F.countDistinct(F.when(F.col("day_n") == 1, F.col("user_id"))).alias("d1"),
        F.countDistinct(F.when(F.col("day_n") == 7, F.col("user_id"))).alias("d7"),
        F.countDistinct(F.when(F.col("day_n") == 30, F.col("user_id"))).alias(
            "d30"
        ),
    )


@register(
    "events_rolling_wau",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ),
    user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS uday FROM events
    )
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(count(DISTINCT CASE WHEN u.uday = d.day THEN u.user_id END)
                AS BIGINT) AS dau,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN user_days u
      ON u.uday BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
    tags=("analytics", "retention"),
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct actives per day (DAU/WAU): the event
    stream first collapses to distinct (user, day) pairs — the shuffle
    is users × active-days, not raw events — then a bounded range join
    against the (tiny, broadcast) day grid fans each user-day into at
    most 7 windows before the per-day distinct count. Distinct counts
    don't compose across window frames, so the range join IS the exact
    formulation (the sketch path at 100 TB is a per-day HLL union)."""
    e = load(spark, sf_dir, "events")
    days = e.select(F.col("ts").cast("date").alias("day")).distinct()
    user_days = e.select(
        "user_id", F.col("ts").cast("date").alias("uday")
    ).distinct()
    joined = user_days.join(
        F.broadcast(days),
        (F.col("uday") <= F.col("day"))
        & (F.col("uday") >= F.date_sub(F.col("day"), 6)),
    )
    return joined.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.countDistinct(
            F.when(F.col("uday") == F.col("day"), F.col("user_id"))
        ).alias("dau"),
        F.countDistinct("user_id").alias("wau"),
    )


@register(
    "events_rolling_wau_sketch",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ),
    user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS uday FROM events
    ),
    win AS (
      SELECT d.day,
             count(DISTINCT CASE WHEN u.uday = d.day THEN u.user_id END)
               AS dau_exact,
             count(DISTINCT u.user_id) AS wau_exact,
             approx_count_distinct(
               CASE WHEN u.uday = d.day THEN u.user_id END) AS dau_approx,
             approx_count_distinct(u.user_id) AS wau_approx
      FROM days d
      JOIN user_days u
        ON u.uday BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(dau_exact AS BIGINT) AS dau_exact,
           abs(dau_approx - dau_exact) <= 0.1 * dau_exact AS dau_ok,
           CAST(wau_exact AS BIGINT) AS wau_exact,
           abs(wau_approx - wau_exact) <= 0.1 * wau_exact AS wau_ok
    FROM win
    """,
    tags=("analytics", "retention", "sketch"),
)
def events_rolling_wau_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day actives via MERGEABLE per-day HLL sketches — the
    actual 100 TB formulation that ``events_rolling_wau``'s docstring
    records: one pass builds a tiny (day → HLL) sketch table, then each
    day's WAU is the union of ≤7 daily sketches, so the windowed stage
    touches sketches (bytes per day), never users. The exact branch
    (the same range-join as the exact twin) runs only as the
    certification cross-check; both engines compute their OWN sketches
    and the oracle compares the deterministic within-10%-of-exact
    verdict plus the hash-compared exact values (the approx_sketches
    pattern)."""
    e = load(spark, sf_dir, "events")
    days = e.select(F.col("ts").cast("date").alias("day")).distinct()
    user_days = e.select(
        "user_id", F.col("ts").cast("date").alias("uday")
    ).distinct()
    # sketch branch: per-day HLL (Datasketches), unioned over the window
    daily = user_days.groupBy("uday").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    sk7 = (
        daily.join(
            F.broadcast(days),
            (F.col("uday") <= F.col("day"))
            & (F.col("uday") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_approx"),
            F.max(
                F.when(
                    F.col("uday") == F.col("day"),
                    F.hll_sketch_estimate("sk"),
                )
            ).alias("dau_approx"),
        )
    )
    # exact cross-check branch (identical shape to events_rolling_wau)
    exact = (
        user_days.join(
            F.broadcast(days),
            (F.col("uday") <= F.col("day"))
            & (F.col("uday") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(
            F.countDistinct(
                F.when(F.col("uday") == F.col("day"), F.col("user_id"))
            ).alias("dau_exact"),
            F.countDistinct("user_id").alias("wau_exact"),
        )
    )
    tol = lambda a, x: F.abs(F.col(a) - F.col(x)) <= 0.1 * F.abs(F.col(x))  # noqa: E731
    return exact.join(sk7, "day").select(
        F.col("day").cast("string").alias("day"),
        "dau_exact",
        tol("dau_approx", "dau_exact").alias("dau_ok"),
        "wau_exact",
        tol("wau_approx", "wau_exact").alias("wau_ok"),
    )


@register(
    "events_heavy_hitters",
    oracle="""
    WITH counts AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    tot AS (SELECT sum(cnt) AS n FROM counts)
    SELECT user_id, CAST(cnt AS BIGINT) AS cnt, TRUE AS in_sketch
    FROM counts, tot
    WHERE cnt > 0.003 * n
    """,
    tags=("analytics", "sketch", "approx"),
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (users with >0.3% of all events) via Spark's
    single-pass ``freqItems`` sketch (Karp et al. / lossy counting — the
    100 TB first pass that avoids a full groupBy when only the heavy
    tail matters), then one exact count restricted to the sketch's
    candidate set. freqItems guarantees a SUPERSET of the true frequent
    items, so 'every exact heavy hitter appears in the sketch' is a
    deterministic property — the oracle computes the exact hitters and
    the hash compare fails if the sketch ever misses one."""
    e = load(spark, sf_dir, "events")
    total = e.count()  # scalar (the support denominator)
    candidates = e.freqItems(["user_id"], support=0.003).collect()[0][0]
    exact = (
        e.filter(F.col("user_id").isin([int(c) for c in candidates]))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 0.003 * total)
    )
    return exact.select(
        "user_id", "cnt", F.lit(True).alias("in_sketch")
    )


# ---------------------------------------------------------------------------
# Round-7: gap-filled interpolation and Markov transition matrix.
# ---------------------------------------------------------------------------
@register(
    "events_gap_fill_interpolate",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             round(avg(value), 6) AS v
      FROM events WHERE event_type IN ('view', 'purchase')
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.event_type, g.day
      FROM (SELECT event_type, min(day) AS lo, max(day) AS hi
            FROM daily GROUP BY 1) d,
           LATERAL (SELECT unnest(generate_series(d.lo, d.hi,
                                  INTERVAL 1 DAY)) AS day) g
    ),
    joined AS (
      SELECT grid.event_type, grid.day, daily.v,
             count(daily.v) OVER w AS seg
      FROM grid LEFT JOIN daily
        ON daily.event_type = grid.event_type AND daily.day = grid.day
      WINDOW w AS (PARTITION BY grid.event_type ORDER BY grid.day
                   ROWS UNBOUNDED PRECEDING)
    ),
    filled AS (
      SELECT event_type, day, v, seg,
             max(v) OVER (PARTITION BY event_type, seg) AS prev_v,
             CAST(day AS DATE)
               - CAST(min(day) OVER (PARTITION BY event_type, seg) AS DATE)
               AS gap_pos
      FROM joined
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
           CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed,
           round(coalesce(v, prev_v), 6) AS value_filled,
           CAST(gap_pos AS BIGINT) AS gap_pos
    FROM filled
    """,
    tags=("timeseries", "gapfill"),
)
def events_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-grid gap filling: per event type, a day spine spans
    min→max day (sequence(), not recursion — fixed granularity) and
    missing days carry the last observed daily mean forward (LOCF),
    tagged with observed flag and gap position. The forward fill is the
    classic two-window trick (running count of non-nulls segments the
    series; max within segment propagates the value) — O(rows) windows,
    no self-join, no Python. The spine is |types|×|days| rows; the fact
    table aggregates once."""
    ev = events_with_ts(spark, sf_dir).filter(
        F.col("event_type").isin("view", "purchase")
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    j = grid.join(daily, ["event_type", "day"], "left")
    wseg = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = j.withColumn("seg", F.count("v").over(wseg))
    wfill = Window.partitionBy("event_type", "seg")
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.when(F.col("v").isNotNull(), 1).otherwise(0).alias("observed"),
        F.round(
            F.coalesce(F.col("v"), F.max("v").over(wfill)), 6
        ).alias("value_filled"),
        F.datediff(
            F.col("day"), F.min("day").over(wfill)
        ).cast("bigint").alias("gap_pos"),
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS src, next_type AS dst, count(*) AS n
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT src, dst, n,
           round(n / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE), 6)
             AS p
    FROM trans
    """,
    tags=("analytics", "markov"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lead() pairs consecutive events (ts, event_id tiebreak),
    one |types|² aggregate, row-normalized to probabilities. One
    user_id shuffle for the window; the transition matrix is tiny at
    any corpus size (|types|²)."""
    ev = events_with_ts(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    trans = ordered.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    return trans.select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n")
            / F.sum("n").over(Window.partitionBy("src")).cast("double"),
            6,
        ).alias("p"),
    )


@register(
    "orders_price_histogram",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice >= 600000 THEN 11
                ELSE floor(o_totalprice / 50000.0) END AS BIGINT) AS bin,
           count(*) AS cnt,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
    tags=("analytics", "histogram"),
)
def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (12 bins of 50k, open-ended top bin) — the
    profiling primitive behind ANALYZE-style column stats. Map-only bin
    assignment + one |bins| aggregate; at 100 TB the shuffle moves 12
    rows per partition."""
    o = load(spark, sf_dir, "orders")
    bin_ = (
        F.when(F.col("o_totalprice") >= 600000, 11)
        .otherwise(F.floor(F.col("o_totalprice") / 50000.0))
        .cast("bigint")
    )
    return o.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@register(
    "events_ewma_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type, a.day,
           a.v AS day_value,
           round(0.3 * sum(b.v * pow(0.7, date_diff('day', b.day, a.day))), 6)
             AS ewma
    FROM daily a
    JOIN daily b
      ON b.event_type = a.event_type
     AND b.day <= a.day
     AND b.day > a.day - INTERVAL 60 DAY
    GROUP BY a.event_type, a.day, a.v
    """,
    tags=("events", "timeseries", "ewma"),
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue per event
    type (α=0.3, kernel truncated at 60 calendar days — weights below
    1e-9 dropped, so the recurrence becomes a bounded range self-join
    instead of an unbounded sequential scan; missing days contribute 0
    exactly as the recurrence over a gap would decay). The heavy lift is
    the first daily aggregate (one shuffle over events); the kernel join
    runs on the tiny O(days × types) table, broadcast at any corpus
    size. Daily sums snap to the 2dp value grid first so both engines
    smooth identical inputs."""
    ev = events_with_ts(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    a, b = daily.alias("a"), F.broadcast(daily).alias("b")
    return (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") <= F.col("a.day"))
            & (
                F.col("b.day")
                > F.col("a.day") - F.expr("INTERVAL 60 DAYS")
            ),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day"),
            F.col("a.v").alias("day_value"),
        )
        .agg(
            F.round(
                0.3
                * F.sum(
                    F.col("b.v")
                    * F.pow(
                        F.lit(0.7),
                        F.datediff(F.col("a.day"), F.col("b.day")),
                    )
                ),
                6,
            ).alias("ewma")
        )
    )


@register(
    "customer_rfm_scores",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY 1
    )
    SELECT custkey,
           CAST(ntile(5) OVER (ORDER BY last_order, custkey) AS INTEGER) AS r,
           CAST(ntile(5) OVER (ORDER BY frequency, custkey) AS INTEGER) AS f,
           CAST(ntile(5) OVER (ORDER BY monetary, custkey) AS INTEGER) AS m,
           frequency AS n_orders
    FROM base
    """,
    tags=("analytics", "rfm", "window"),
)
def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency/frequency/monetary quintiles per
    customer — the classic lifecycle-marketing score): one shuffle for
    the per-customer rollup, then three global ntile windows over the
    small per-customer table (row count = customers, not orders).
    Deterministic: every ntile ORDER BY ends in the unique custkey;
    monetary snaps to the 2dp money grid before ranking."""
    o = load(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    return base.select(
        "custkey",
        F.ntile(5)
        .over(Window.orderBy("last_order", "custkey"))
        .alias("r"),
        F.ntile(5)
        .over(Window.orderBy("frequency", "custkey"))
        .alias("f"),
        F.ntile(5)
        .over(Window.orderBy("monetary", "custkey"))
        .alias("m"),
        F.col("frequency").alias("n_orders"),
    )


@register(
    "events_salted_hot_key_agg",
    oracle="""
    SELECT event_type,
           CAST(count(value) AS BIGINT) AS count_value,
           round(sum(value), 2) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY event_type
    """,
    tags=("events", "skew", "salting"),
)
def events_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation over a pathologically hot key space
    (event_type has ~5 values — each key's rows land on ONE reducer in a
    naive groupBy): the two-phase (key, salt)→key salted aggregation
    spreads every hot key over `salt` reducers, and the mergeable-agg
    fold makes the result IDENTICAL to the plain GROUP BY the oracle
    runs. The exact hot-key pattern that melts a 1000-executor job."""
    from ranger_spark.operators.skew import salted_agg

    ev = load(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs=[
            ("value", "count"),
            ("value", "sum"),
            ("value", "min"),
            ("value", "max"),
        ],
        salt=8,
    )
    return out.select(
        "event_type",
        F.col("count_value").cast("bigint").alias("count_value"),
        F.round("sum_value", 2).alias("sum_value"),
        "min_value",
        "max_value",
    )


@register(
    "events_anomaly_mad",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS med
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day, d.v, m.med, abs(d.v - m.med) AS adev
      FROM daily d JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_type, dev.day, dev.v,
           round((dev.v - dev.med) / (1.4826 * mad.mad), 4) AS robust_z
    FROM dev JOIN mad USING (event_type)
    WHERE abs((dev.v - dev.med) / (1.4826 * mad.mad)) > 2
    """,
    tags=("events", "anomaly", "robust"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) daily-revenue anomaly detection — the
    outlier-resistant counterpart of events_anomaly_zscore: per-type
    median and MAD over the tiny daily table (percentile_cont matches
    DuckDB's interpolating definition), flagged where the robust z
    exceeds 2. The heavy shuffle is the first daily aggregate; the
    median tables are per-type scalars broadcast back."""
    ev = events_with_ts(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(v, 0.5)").alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("v") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    out = dev.join(F.broadcast(mad), "event_type").withColumn(
        "robust_z",
        (F.col("v") - F.col("med")) / (1.4826 * F.col("mad")),
    )
    return out.filter(F.abs("robust_z") > 2).select(
        "event_type", "day", "v", F.round("robust_z", 4).alias("robust_z")
    )


@register(
    "customer_pareto_share",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT custkey, revenue,
             sum(revenue) OVER (
               ORDER BY revenue DESC, custkey
               ROWS UNBOUNDED PRECEDING
             ) AS cum,
             sum(revenue) OVER () AS total,
             CAST(row_number() OVER (ORDER BY revenue DESC, custkey)
                  AS BIGINT) AS rnk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM rev
    )
    SELECT custkey, revenue, rnk,
           round(cum / total, 6) AS cum_share,
           round(CAST(rnk AS DOUBLE) / n, 6) AS pop_share
    FROM ranked
    WHERE cum / total <= 0.5
    """,
    tags=("analytics", "pareto", "window"),
)
def customer_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: the smallest customer set producing half the
    revenue (cumulative-share window over the per-customer rollup). One
    shuffle for the rollup; the windows run over the small per-customer
    table with a unique-key tiebreak, so ranking is engine-stable."""
    o = load(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), "custkey")
    ranked = rev.select(
        "custkey",
        "revenue",
        F.sum("revenue").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("revenue").over(
            Window.partitionBy()
        ).alias("total"),
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    return ranked.filter(F.col("cum") / F.col("total") <= 0.5).select(
        "custkey",
        "revenue",
        "rnk",
        F.round(F.col("cum") / F.col("total"), 6).alias("cum_share"),
        F.round(F.col("rnk").cast("double") / F.col("n"), 6).alias("pop_share"),
    )


@register(
    "range_partition_bounds",
    oracle="""
    WITH t AS (
      SELECT o_totalprice,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS shard
      FROM orders
    )
    SELECT CAST(shard AS INTEGER)            AS shard,
           count(*)                          AS cnt,
           round(min(o_totalprice), 2)       AS lo,
           round(max(o_totalprice), 2)       AS hi
    FROM t GROUP BY shard
    """,
    tags=("analytics", "partitioning", "window"),
)
def range_partition_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sort shard planning: exact range-partitioner boundaries for
    an 8-way total order of orders by price (the shape behind ORDER BY
    writes and sorted shard exports). ntile over a total order (unique
    o_orderkey tiebreak) is engine-stable: per-shard counts are fixed by
    N, and boundary values are identical even when a tie straddles a
    boundary. The window sorts a 2-column projection only. At cluster
    scale the planner flips to `repartitionByRange` (reservoir-sampled
    bounds, no global sort); this exact variant is the planning/verify
    tool you run on a sampled slice — reference parity: the reference
    has no distributed sort at all (single-node scan, storage.go)."""
    o = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.withColumn("shard", F.ntile(8).over(w).cast("int"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "skew_key_diagnosis",
    oracle="""
    WITH c AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    r AS (
      SELECT cnt,
             CAST(row_number() OVER (ORDER BY cnt, user_id) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n,
             sum(cnt) OVER () AS total
      FROM c
    )
    SELECT max(n)                                   AS n_keys,
           CAST(max(total) AS BIGINT)               AS total_rows,
           max(cnt)                                 AS max_cnt,
           round(CAST(max(cnt) AS DOUBLE) / max(total), 6) AS top1_share,
           max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                    THEN cnt END)                   AS p50_cnt,
           max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                    THEN cnt END)                   AS p90_cnt,
           max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                    THEN cnt END)                   AS p99_cnt
    FROM r
    """,
    tags=("analytics", "skew", "partitioning"),
)
def skew_key_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile — the diagnostic you run BEFORE picking a
    partitioning/salting strategy for a 100 TB join on user_id: key
    cardinality, hottest-key share, and discrete p50/p90/p99 of the
    per-key frequency distribution (rank-select over the tiny per-key
    rollup, so the exact quantile needs no interpolation and no global
    sort of raw rows; one user_id shuffle total). A top1_share near
    1/n_keys means hash partitioning is safe; >>1/n_keys → salt the hot
    keys (see events_salted_hot_key_agg for the fix this informs)."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("cnt", "user_id")
    r = c.select(
        "cnt",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )

    def _at(q: float):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("bigint"),
                F.col("cnt"),
            )
        )

    return r.agg(
        F.max("n").alias("n_keys"),
        F.max("total").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.max("cnt").cast("double") / F.max("total"), 6).alias(
            "top1_share"
        ),
        _at(0.5).alias("p50_cnt"),
        _at(0.9).alias("p90_cnt"),
        _at(0.99).alias("p99_cnt"),
    )


@register(
    "forecast_seasonal_naive",
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) AS INTEGER)  AS y,
             CAST(month(o_orderdate) AS INTEGER) AS mo,
             round(sum(o_totalprice), 2)         AS revenue
      FROM orders GROUP BY 1, 2
    ),
    f AS (
      SELECT y, mo, revenue,
             lag(revenue, 12) OVER (ORDER BY y, mo) AS forecast
      FROM m
    )
    SELECT y, mo, revenue, forecast,
           round(abs(revenue - forecast) / revenue, 6) AS ape
    FROM f WHERE forecast IS NOT NULL
    """,
    tags=("analytics", "timeseries", "forecast"),
)
def forecast_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each month's revenue as
    the same month last year (lag 12 over the month spine) and report the
    absolute percentage error — the baseline every fancier forecaster
    must beat, and the shape of a backtest harness at scale: one shuffle
    to the ~N_months rollup, windows over that tiny table only."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("mo"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    f = m.withColumn(
        "forecast", F.lag("revenue", 12).over(Window.orderBy("y", "mo"))
    )
    return f.filter(F.col("forecast").isNotNull()).select(
        "y",
        "mo",
        "revenue",
        "forecast",
        F.round(F.abs(F.col("revenue") - F.col("forecast")) / F.col("revenue"), 6).alias("ape"),
    )


@register(
    "orders_seasonality_decompose",
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) AS INTEGER)  AS y,
             CAST(month(o_orderdate) AS INTEGER) AS mo,
             CAST(CAST(round(sum(o_totalprice), 2) AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    t AS (
      SELECT y, mo, cents,
             sum(cents) OVER (
               ORDER BY y, mo ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING
             ) AS wsum,
             count(*) OVER (
               ORDER BY y, mo ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING
             ) AS wn
      FROM m
    )
    SELECT y, mo,
           CAST(cents AS DOUBLE) / CAST(100.0 AS DOUBLE) AS revenue,
           CAST((wsum + 6) // 12 AS DOUBLE) / CAST(100.0 AS DOUBLE) AS trend,
           round(CAST(cents AS DOUBLE) / CAST((wsum + 6) // 12 AS DOUBLE), 6)
             AS seasonal_ratio
    FROM t WHERE wn = 12
    """,
    tags=("analytics", "timeseries", "decompose"),
)
def orders_seasonality_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative decomposition step: centered 12-month
    moving-average trend over the monthly revenue spine and the
    detrended seasonal ratio (revenue/trend) — the input to a seasonal
    index and the sibling of forecast_seasonal_naive's backtest. Only
    full 12-month windows emit (count guard), so edges are exact on
    both engines. One shuffle to the month rollup; windows run over the
    ~N_months table.

    Determinism protocol (r9): monthly revenue snaps to the 2dp grid
    (true value is ON it) and converts to integer cents; the 12-month
    trend average is then exact integer math with explicit half-up
    division ((wsum + 6) div 12) — a double avg() lands mid-window
    means exactly on .xx5 and the tie resolves by engine (the r8 hash
    failure: spark 47288952.5 vs duck .51)."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("mo"),
    ).agg(
        (F.round(F.sum("o_totalprice"), 2).cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("y", "mo").rowsBetween(-6, 5)
    t = m.select(
        "y",
        "mo",
        "cents",
        F.sum("cents").over(w).alias("wsum"),
        F.count(F.lit(1)).over(w).alias("wn"),
    )
    tc = F.expr("(wsum + 6) div 12")
    return t.filter(F.col("wn") == 12).select(
        "y",
        "mo",
        (F.col("cents") / F.lit(100.0)).alias("revenue"),
        (tc / F.lit(100.0)).alias("trend"),
        F.round(
            F.col("cents").cast("double") / tc.cast("double"), 6
        ).alias("seasonal_ratio"),
    )


@register(
    "events_markov_backtest",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type, count(*) AS cnt
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    modal AS (
      SELECT prev_type, event_type AS modal_next,
             row_number() OVER (
               PARTITION BY prev_type ORDER BY cnt DESC, event_type
             ) AS rn
      FROM trans
    )
    SELECT t.prev_type,
           m.modal_next,
           CAST(sum(t.cnt) AS BIGINT) AS n_transitions,
           CAST(sum(CASE WHEN t.event_type = m.modal_next
                         THEN t.cnt ELSE 0 END) AS BIGINT) AS n_correct,
           round(sum(CASE WHEN t.event_type = m.modal_next
                          THEN t.cnt ELSE 0 END)
                 / CAST(sum(t.cnt) AS DOUBLE), 6) AS acc
    FROM trans t JOIN modal m
      ON m.prev_type = t.prev_type AND m.rn = 1
    GROUP BY t.prev_type, m.modal_next
    """,
    tags=("analytics", "markov", "eval"),
)
def events_markov_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-event baseline backtest: for each previous event type,
    predict the modal next type (deterministic lexicographic tiebreak)
    and report in-sample accuracy — the floor any sequence model must
    beat, and the eval companion to events_markov_transitions. One
    user_id shuffle builds the transition pairs; everything after runs
    on the |event_types|² table."""
    ev = events_with_ts(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mw = Window.partitionBy("prev_type").orderBy(
        F.col("cnt").desc(), "event_type"
    )
    modal = (
        trans.withColumn("rn", F.row_number().over(mw))
        .filter(F.col("rn") == 1)
        .select("prev_type", F.col("event_type").alias("modal_next"))
    )
    correct = F.when(
        F.col("event_type") == F.col("modal_next"), F.col("cnt")
    ).otherwise(0)
    return (
        trans.join(F.broadcast(modal), "prev_type")
        .groupBy("prev_type", "modal_next")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_transitions"),
            F.sum(correct).cast("bigint").alias("n_correct"),
            F.round(
                F.sum(correct) / F.sum("cnt").cast("double"), 6
            ).alias("acc"),
        )
    )


@register(
    "approx_percentile_check",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50_exact,
           abs(approx_quantile(l_extendedprice, 0.5)
               - quantile_cont(l_extendedprice, 0.5))
             <= 0.02 * quantile_cont(l_extendedprice, 0.5) AS p50_ok,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_exact,
           abs(approx_quantile(l_extendedprice, 0.99)
               - quantile_cont(l_extendedprice, 0.99))
             <= 0.02 * quantile_cont(l_extendedprice, 0.99) AS p99_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("analytics", "sketch", "percentile"),
)
def approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB quantile shape with its accuracy contract attached:
    exact interpolated percentiles next to the MERGEABLE approximate
    sketch (Spark percentile_approx / DuckDB approx_quantile — each
    engine runs its own sketch) and a deterministic within-2% verdict,
    the same tolerance-boolean oracle pattern as
    events_rolling_wau_sketch. At 100 TB the exact branch is the one to
    drop: percentile_approx partials merge map-side, exact percentile
    sorts every group."""
    li = load(spark, sf_dir, "lineitem")
    ex50 = F.expr("percentile(l_extendedprice, 0.5)")
    ex99 = F.expr("percentile(l_extendedprice, 0.99)")
    ap50 = F.expr("percentile_approx(l_extendedprice, 0.5, 10000)")
    ap99 = F.expr("percentile_approx(l_extendedprice, 0.99, 10000)")
    return li.groupBy("l_returnflag").agg(
        F.round(ex50, 4).alias("p50_exact"),
        (F.abs(ap50 - ex50) <= 0.02 * ex50).alias("p50_ok"),
        F.round(ex99, 4).alias("p99_exact"),
        (F.abs(ap99 - ex99) <= 0.02 * ex99).alias("p99_ok"),
    )


# ---------------------------------------------------------------------------
# Open-order backlog over time (interval +1/-1 cumsum)
# ---------------------------------------------------------------------------
@register(
    "orders_running_backlog",
    oracle="""
    WITH closes AS (
      SELECT l_orderkey AS ok, max(l_shipdate) AS closed_at
      FROM lineitem GROUP BY l_orderkey
    ),
    ev AS (
      SELECT date_trunc('month', o.o_orderdate) AS mon, 1 AS opened, 0 AS closed
      FROM orders o
      UNION ALL
      SELECT date_trunc('month', c.closed_at), 0, 1
      FROM orders o JOIN closes c ON c.ok = o.o_orderkey
    ),
    m AS (
      SELECT mon, CAST(sum(opened) AS BIGINT) AS opened,
             CAST(sum(closed) AS BIGINT) AS closed
      FROM ev GROUP BY mon
    )
    SELECT mon, opened, closed,
           CAST(sum(opened - closed) OVER (
             ORDER BY mon ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS backlog
    FROM m
    """,
    tags=("analytics", "window", "interval"),
)
def orders_running_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog by month — the interval-overlap count computed
    the scalable way: each order contributes +1 at open and -1 at its
    last shipment, the deltas aggregate per month (map-side combined),
    and one cumulative window over the ~80-row month series yields the
    backlog — never a per-day × per-order overlap join. The one
    data-sized shuffle is the orderkey close-date rollup; the global
    cumsum window runs on a month-bounded relation (a handful of rows at
    ANY corpus scale, so the single-partition window is safe)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    closes = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("l_shipdate").alias("closed_at")
    )
    opens = o.select(
        F.date_trunc("month", "o_orderdate").alias("mon"),
        F.lit(1).alias("opened"),
        F.lit(0).alias("closed"),
    )
    closed = (
        o.join(closes, F.col("ok") == F.col("o_orderkey"))
        .select(
            F.date_trunc("month", "closed_at").alias("mon"),
            F.lit(0).alias("opened"),
            F.lit(1).alias("closed"),
        )
    )
    m = (
        opens.unionAll(closed)
        .groupBy("mon")
        .agg(
            F.sum("opened").cast("bigint").alias("opened"),
            F.sum("closed").cast("bigint").alias("closed"),
        )
    )
    w = Window.orderBy("mon").rowsBetween(Window.unboundedPreceding, 0)
    return m.select(
        "mon",
        "opened",
        "closed",
        F.sum(F.col("opened") - F.col("closed")).over(w).cast("bigint").alias("backlog"),
    )


# ---------------------------------------------------------------------------
# User-journey trigram mining
# ---------------------------------------------------------------------------
@register(
    "events_path_trigrams",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1, t2, t3, cnt, rank FROM (
      SELECT p2 AS t1, p1 AS t2, event_type AS t3,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(row_number() OVER (
               ORDER BY count(*) DESC, p2, p1, event_type
             ) AS INTEGER) AS rank
      FROM s WHERE p2 IS NOT NULL
      GROUP BY p2, p1, event_type
    ) WHERE rank <= 15
    """,
    tags=("analytics", "sequence", "events"),
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey trigrams (sequence mining over event paths —
    the n-gram view of behavioral funnels): per user, consecutive
    event-type triples via two lags over ONE (user_id, ts) window, then
    a vocabulary²·types-bounded count. The only corpus-sized shuffle is
    the user_id window partition; the trigram space is tiny (event
    types³), so the rollup and rank are map-side dominated."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    wr = Window.orderBy(
        F.col("cnt").desc(), F.col("t1"), F.col("t2"), F.col("t3")
    )
    return (
        s.groupBy(
            F.col("p2").alias("t1"),
            F.col("p1").alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 15)
    )


# ---------------------------------------------------------------------------
# DAU/MAU stickiness per month
# ---------------------------------------------------------------------------
@register(
    "events_dau_mau_stickiness",
    oracle="""
    WITH dau AS (
      SELECT date_trunc('month', ts) AS mon, date_trunc('day', ts) AS day,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ),
    mau AS (
      SELECT date_trunc('month', ts) AS mon,
             count(DISTINCT user_id) AS mau
      FROM events GROUP BY 1
    )
    SELECT d.mon,
           round(avg(d.dau), 6) AS avg_dau,
           CAST(max(m.mau) AS BIGINT) AS mau,
           round(avg(d.dau) / max(m.mau), 6) AS stickiness
    FROM dau d JOIN mau m ON m.mon = d.mon
    GROUP BY d.mon
    """,
    tags=("analytics", "engagement", "events"),
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness (the engagement ratio product analytics runs
    daily): per month, average daily distinct users over monthly
    distinct users. Two distinct-aggregates over the same scan — at
    100 TB both become the mergeable HLL sketches of
    events_rolling_wau_sketch; here the exact form is the oracle-checked
    baseline. Shuffles are user-bounded (day and month grains)."""
    e = load(spark, sf_dir, "events")
    dau = (
        e.groupBy(
            F.date_trunc("month", "ts").alias("mon"),
            F.date_trunc("day", "ts").alias("day"),
        )
        .agg(F.countDistinct("user_id").alias("dau"))
    )
    mau = e.groupBy(F.date_trunc("month", "ts").alias("mon")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        dau.join(mau, "mon")
        .groupBy("mon")
        .agg(
            F.round(F.avg("dau"), 6).alias("avg_dau"),
            F.max("mau").cast("bigint").alias("mau"),
            F.round(F.avg("dau") / F.max("mau"), 6).alias("stickiness"),
        )
    )


@register(
    "events_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT event_type,
             count(*) AS n,
             round(avg(value), 6) AS mean_v,
             round(var_samp(value), 6) AS var_v
      FROM events
      WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    p AS (SELECT n, mean_v, var_v FROM g WHERE event_type = 'purchase'),
    c AS (SELECT n, mean_v, var_v FROM g WHERE event_type = 'click')
    SELECT p.n AS n_a, c.n AS n_b,
           p.mean_v AS mean_a, c.mean_v AS mean_b,
           round(p.mean_v - c.mean_v, 6) AS mean_diff,
           round((p.mean_v - c.mean_v)
                 / sqrt(p.var_v / p.n + c.var_v / c.n), 6) AS t_stat,
           round(pow(p.var_v / p.n + c.var_v / c.n, 2)
                 / (pow(p.var_v / p.n, 2) / (p.n - 1)
                    + pow(c.var_v / c.n, 2) / (c.n - 1)), 6) AS welch_dof
    FROM p, c
    """,
    tags=("analytics", "stats", "abtest"),
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event cohorts
    (purchase vs click values) — the A/B-test primitive. One map-side-
    combined aggregate produces (n, mean, s²) per arm; the test statistic
    and Welch–Satterthwaite dof are computed on the 2-row result, so at
    100 TB the cost is exactly one scan + one tiny shuffle regardless of
    cohort size. Means/variances snap to a 6dp grid before the statistic
    so both engines derive it from identical inputs."""
    e = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("mean_v"),
        F.round(F.var_samp("value"), 6).alias("var_v"),
    )
    p = g.where(F.col("event_type") == "purchase").select(
        F.col("n").alias("n_a"), F.col("mean_v").alias("mean_a"),
        F.col("var_v").alias("var_a"),
    )
    c = g.where(F.col("event_type") == "click").select(
        F.col("n").alias("n_b"), F.col("mean_v").alias("mean_b"),
        F.col("var_v").alias("var_b"),
    )
    se2 = F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    return p.crossJoin(c).select(
        "n_a", "n_b", "mean_a", "mean_b",
        F.round(F.col("mean_a") - F.col("mean_b"), 6).alias("mean_diff"),
        F.round((F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2), 6).alias(
            "t_stat"
        ),
        F.round(
            F.pow(se2, F.lit(2))
            / (
                F.pow(F.col("var_a") / F.col("n_a"), F.lit(2))
                / (F.col("n_a") - 1)
                + F.pow(F.col("var_b") / F.col("n_b"), F.lit(2))
                / (F.col("n_b") - 1)
            ),
            6,
        ).alias("welch_dof"),
    )


@register(
    "orders_benford_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT d, count(*) AS n FROM digits GROUP BY 1),
    tot AS (SELECT sum(n) AS total FROM obs),
    snapped AS (
      SELECT o.d, o.n, t.total,
             round(o.n / CAST(t.total AS DOUBLE), 6) AS op,
             round(log10(1.0 + 1.0 / o.d), 6) AS bp
      FROM obs o, tot t
    )
    SELECT d AS first_digit,
           n AS n_orders,
           op AS observed_p,
           bp AS benford_p,
           round(pow(op - bp, 2) / bp * total, 6) AS chi2_term
    FROM snapped
    """,
    tags=("analytics", "quality", "audit"),
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals — the classic
    anomaly/fraud screen on monetary columns. First significant digit is
    string-sliced from the integer part (identical in both engines,
    no float log tricks); the digit histogram is a 9-bucket map-side
    combine, so at 100 TB this is one scan + a 9-row reduction. Emits
    per-digit observed vs Benford expectation and the chi-square term."""
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).cast("int").alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    snapped = obs.crossJoin(F.broadcast(tot)).select(
        "d", "n", "total",
        F.round(F.col("n") / F.col("total").cast("double"), 6).alias("op"),
        F.round(F.log10(1.0 + 1.0 / F.col("d")), 6).alias("bp"),
    )
    return snapped.select(
        F.col("d").alias("first_digit"),
        F.col("n").alias("n_orders"),
        F.col("op").alias("observed_p"),
        F.col("bp").alias("benford_p"),
        F.round(
            F.pow(F.col("op") - F.col("bp"), F.lit(2))
            / F.col("bp")
            * F.col("total"),
            6,
        ).alias("chi2_term"),
    )


@register(
    "users_kaplan_meier",
    oracle="""
    WITH bounds AS (SELECT max(date_trunc('day', ts)) AS horizon FROM events),
    life AS (
      SELECT user_id,
             -- floor(days/7), NOT date_diff('week', …): DuckDB's 'week'
             -- unit counts Monday crossings, which diverges from the
             -- builder's floor(datediff/7) for mid-week spans (first
             -- seen at sf0.1: 31 users flipped a week).
             date_diff('day', min(date_trunc('day', ts)),
                       max(date_trunc('day', ts))) // 7 AS t_week,
             CASE WHEN date_diff('day', max(date_trunc('day', ts)),
                                 (SELECT horizon FROM bounds)) < 14
                  THEN 0 ELSE 1 END AS churned
      FROM events GROUP BY user_id
    ),
    tk AS (
      SELECT t_week, count(*) AS n_total,
             sum(churned) AS n_churn
      FROM life GROUP BY 1
    ),
    risk AS (
      SELECT t_week, n_total, n_churn,
             sum(n_total) OVER (ORDER BY t_week DESC) AS n_risk
      FROM tk
    )
    SELECT t_week,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(n_churn AS BIGINT) AS n_churn,
           CAST(round(CAST(round(sum(round(ln(1.0 - n_churn / CAST(n_risk AS DOUBLE)), 8))
                                   OVER (ORDER BY t_week), 8) AS DECIMAL(38,8)), 6)
                AS DOUBLE) AS log_survival
    FROM risk
    WHERE n_churn < n_risk
    """,
    tags=("analytics", "survival", "retention"),
)
def users_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier retention curve over user lifetimes (weeks from
    first to last event; users active within 14 days of the corpus
    horizon are right-censored). One user_id shuffle builds lifetimes;
    the risk-set table is O(weeks) rows, so the reverse-cumulative
    n_risk window and the log-survival cumsum are driver-cheap at any
    corpus size. The statistic is the cumulative log-survival
    Σ ln(1 − d/n) with each hazard term snapped to an 8dp grid before
    summation, making the curve bit-identical across engines (exp() of
    it is the KM estimate)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    horizon = e.agg(F.max("day").alias("horizon"))
    life = (
        e.groupBy("user_id")
        .agg(F.min("day").alias("first_day"), F.max("day").alias("last_day"))
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            (
                F.floor(F.datediff("last_day", "first_day") / 7)
            ).alias("t_week"),
            F.when(
                F.datediff("horizon", "last_day") < 14, F.lit(0)
            ).otherwise(F.lit(1)).alias("churned"),
        )
    )
    tk = life.groupBy("t_week").agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("churned").alias("n_churn")
    )
    w_desc = Window.orderBy(F.col("t_week").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = tk.withColumn("n_risk", F.sum("n_total").over(w_desc))
    w_asc = Window.orderBy("t_week").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        risk.where(F.col("n_churn") < F.col("n_risk"))
        .select(
            "t_week",
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("n_churn").cast("bigint").alias("n_churn"),
            # The summands live on the 8dp grid, so the cumsum's true
            # value does too — snap to it, then round to 6 in DECIMAL
            # (a raw round(double_sum, 6) ties at .xxxxxx50 and resolves
            # by summation order; the money_round2 convention at grid 8).
            F.round(
                F.round(
                    F.sum(
                        F.round(
                            F.log(1.0 - F.col("n_churn") / F.col("n_risk").cast("double")),
                            8,
                        )
                    ).over(w_asc),
                    8,
                ).cast("decimal(38,8)"),
                6,
            ).cast("double").alias("log_survival"),
        )
    )


@register(
    "events_attribution_credit",
    oracle="""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_id AS touch_id, event_type AS channel, ts
      FROM events WHERE event_type IN ('view', 'click')
    ),
    j AS (
      SELECT c.conv_id, t.channel, t.touch_id,
             row_number() OVER (PARTITION BY c.conv_id
                                ORDER BY t.ts, t.touch_id) AS rn_first,
             row_number() OVER (PARTITION BY c.conv_id
                                ORDER BY t.ts DESC, t.touch_id DESC) AS rn_last,
             count(*) OVER (PARTITION BY c.conv_id) AS n_touch
      FROM conv c
      JOIN touch t
        ON t.user_id = c.user_id
       AND t.ts < c.conv_ts
       AND t.ts >= c.conv_ts - INTERVAL 7 DAY
    ),
    credits AS (
      SELECT channel, 'first_touch' AS model,
             CASE WHEN rn_first = 1 THEN 1.0 ELSE 0.0 END AS credit, conv_id
      FROM j
      UNION ALL
      SELECT channel, 'last_touch',
             CASE WHEN rn_last = 1 THEN 1.0 ELSE 0.0 END, conv_id FROM j
      UNION ALL
      SELECT channel, 'linear', round(1.0 / n_touch, 8), conv_id FROM j
    )
    SELECT channel, model,
           CAST(sum(CAST(credit AS DECIMAL(28,8))) AS DOUBLE) AS total_credit,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions
    FROM credits
    GROUP BY channel, model
    """,
    tags=("analytics", "attribution", "events"),
)
def events_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution (first-touch / last-touch / linear credit
    of each purchase across the user's view/click touches in the prior
    7 days). The conversion-touch join shuffles once on user_id and is
    time-bounded (7-day band), so its width tracks per-user activity,
    not corpus size; the two row_numbers and the touch count are windows
    over the per-conversion groups of that join. Linear credit snaps to
    an 8dp grid per touch and is summed as DECIMAL(28,8) — exact,
    order-independent addition, so no cross-engine rounding tie at the
    total. Ties on touch ts break by event_id both ways."""
    e = load(spark, sf_dir, "events")
    conv = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id",
        F.col("ts").alias("conv_ts"),
    )
    touch = e.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"), "ts",
    )
    j = conv.join(
        touch,
        (conv.user_id == touch.user_id)
        & (touch.ts < conv.conv_ts)
        & (touch.ts >= conv.conv_ts - F.expr("INTERVAL 7 DAYS")),
    ).select("conv_id", "channel", "touch_id", "ts")
    wf = Window.partitionBy("conv_id").orderBy("ts", "touch_id")
    wl = Window.partitionBy("conv_id").orderBy(
        F.col("ts").desc(), F.col("touch_id").desc()
    )
    wn = Window.partitionBy("conv_id")
    j = j.select(
        "conv_id", "channel",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
        F.count(F.lit(1)).over(wn).alias("n_touch"),
    )
    credits = (
        j.select(
            "channel", F.lit("first_touch").alias("model"),
            F.when(F.col("rn_first") == 1, 1.0).otherwise(0.0).alias("credit"),
            "conv_id",
        )
        .unionAll(
            j.select(
                "channel", F.lit("last_touch").alias("model"),
                F.when(F.col("rn_last") == 1, 1.0).otherwise(0.0).alias("credit"),
                "conv_id",
            )
        )
        .unionAll(
            j.select(
                "channel", F.lit("linear").alias("model"),
                F.round(1.0 / F.col("n_touch"), 8).alias("credit"),
                "conv_id",
            )
        )
    )
    return credits.groupBy("channel", "model").agg(
        F.sum(F.col("credit").cast("decimal(28,8)"))
        .cast("double")
        .alias("total_credit"),
        F.countDistinct("conv_id").cast("bigint").alias("n_conversions"),
    )


@register(
    "forecast_holt_linear",
    oracle="""
    WITH RECURSIVE monthly AS (
      SELECT o_orderpriority AS pri,
             date_trunc('month', o_orderdate) AS mon,
             CAST(round(sum(o_totalprice), 2) AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1, 2
    ),
    idx AS (
      SELECT pri, mon, rev,
             CAST(CAST(rev AS DECIMAL(28,2)) * 100000000 AS BIGINT) AS y8,
             CAST(row_number() OVER (PARTITION BY pri ORDER BY mon)
                  AS INTEGER) AS i
      FROM monthly
    ),
    holt AS (
      SELECT pri, i, mon, rev, y8,
             y8 AS lvl8,
             CAST(0 AS BIGINT) AS trd8,
             CAST(NULL AS BIGINT) AS fit8
      FROM idx WHERE i = 1
      UNION ALL
      SELECT m.pri, m.i, m.mon, m.rev, m.y8,
             CASE WHEN 5 * m.y8 + 5 * (h.lvl8 + h.trd8) >= 0
                  THEN (5 * m.y8 + 5 * (h.lvl8 + h.trd8) + 5) // 10
                  ELSE -((-(5 * m.y8 + 5 * (h.lvl8 + h.trd8)) + 5) // 10)
             END,
             CASE WHEN 3 * ((CASE WHEN 5 * m.y8 + 5 * (h.lvl8 + h.trd8) >= 0
                                  THEN (5 * m.y8 + 5 * (h.lvl8 + h.trd8) + 5) // 10
                                  ELSE -((-(5 * m.y8 + 5 * (h.lvl8 + h.trd8)) + 5) // 10)
                             END) - h.lvl8) + 7 * h.trd8 >= 0
                  THEN (3 * ((CASE WHEN 5 * m.y8 + 5 * (h.lvl8 + h.trd8) >= 0
                                   THEN (5 * m.y8 + 5 * (h.lvl8 + h.trd8) + 5) // 10
                                   ELSE -((-(5 * m.y8 + 5 * (h.lvl8 + h.trd8)) + 5) // 10)
                              END) - h.lvl8) + 7 * h.trd8 + 5) // 10
                  ELSE -((-(3 * ((CASE WHEN 5 * m.y8 + 5 * (h.lvl8 + h.trd8) >= 0
                                       THEN (5 * m.y8 + 5 * (h.lvl8 + h.trd8) + 5) // 10
                                       ELSE -((-(5 * m.y8 + 5 * (h.lvl8 + h.trd8)) + 5) // 10)
                                  END) - h.lvl8) + 7 * h.trd8) + 5) // 10)
             END,
             h.lvl8 + h.trd8
      FROM holt h JOIN idx m ON m.pri = h.pri AND m.i = h.i + 1
    )
    SELECT pri, mon, CAST(rev AS DOUBLE) AS rev,
           CAST(lvl8 AS DOUBLE) / 100000000 AS level,
           CAST(trd8 AS DOUBLE) / 100000000 AS trend,
           CAST(fit8 AS DOUBLE) / 100000000 AS one_step_fit,
           CAST(y8 - fit8 AS DOUBLE) / 100000000 AS fit_err
    FROM holt
    """,
    tags=("analytics", "timeseries", "forecast"),
)
def forecast_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing (α=0.5, β=0.3, l₁=y₁,
    b₁=0) over monthly revenue, one independent series per order
    priority — the many-small-time-series shape: the recurrence is
    inherently sequential per series but embarrassingly parallel across
    series, so it runs as ``applyInPandas`` over priority groups with
    k-bounded state (≤ ~80 months each; a production corpus has millions
    of series, each still tiny). The heavy lift stays declarative: one
    map-combined monthly aggregate before the Arrow-batched recurrence.
    Determinism protocol (r9): the recurrence runs in exact fixed-point
    INTEGER arithmetic — monthly revenue snaps to DECIMAL(18,2) and
    scales to 1e-8 units (bigint); each level/trend update is exact at
    scale 9 (α=0.5 → ×5, β=0.3 → ×3/×7) and drops back to scale 8 via
    an explicit half-away-from-zero integer division that the
    recursive-CTE oracle replays verbatim. The previous protocol
    (Python Decimal.quantize vs DuckDB CAST(expr AS DECIMAL(30,8)))
    diverged ~1e-8 on 1,147 cells because DuckDB's 0.5·rev + 0.5·(l+t)
    overflows decimal multiply into DOUBLE before the cast — the r8
    hash failure. Integer ops can't drift and have one rounding site."""
    import pandas as pd
    from decimal import Decimal

    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2)
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    SCALE = 10**8

    def q9to8(p: int) -> int:
        # scale-9 → scale-8, ties half away from zero (≡ the oracle's
        # sign-aware (|p|+5)//10).
        return (p + 5) // 10 if p >= 0 else -((-p + 5) // 10)

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("mon").reset_index(drop=True)
        y8s = [int(Decimal(y) * SCALE) for y in pdf["rev"]]
        lvl, trd, fit = [], [], []
        for t, y8 in enumerate(y8s):
            if t == 0:
                lvl.append(y8); trd.append(0); fit.append(None)
            else:
                prev_l, prev_t = lvl[-1], trd[-1]
                f8 = prev_l + prev_t
                new_l = q9to8(5 * y8 + 5 * (prev_l + prev_t))
                new_t = q9to8(3 * (new_l - prev_l) + 7 * prev_t)
                lvl.append(new_l); trd.append(new_t); fit.append(f8)
        out = pdf[["pri", "mon"]].copy()
        # float(v) first, THEN divide — two roundings, matching the
        # oracle's CAST(x AS DOUBLE) / 1e8 exactly. A fused v / SCALE
        # (one correctly-rounded int/int division) can differ by an ulp
        # once |v| > 2^53, which sf0.1 monthly revenues reach.
        out["rev"] = [float(y) for y in pdf["rev"]]
        out["level"] = [float(v) / 1e8 for v in lvl]
        out["trend"] = [float(v) / 1e8 for v in trd]
        out["one_step_fit"] = [None if f is None else float(f) / 1e8 for f in fit]
        out["fit_err"] = [
            None if f is None else float(y8 - f) / 1e8
            for y8, f in zip(y8s, fit)
        ]
        return out

    schema = (
        "pri string, mon timestamp, rev double, level double, trend double, "
        "one_step_fit double, fit_err double"
    )
    return monthly.groupBy("pri").applyInPandas(holt, schema)


@register(
    "copurchase_triangles",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    e AS (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      ) GROUP BY 1
    ),
    o AS (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dt
      FROM e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
      SELECT count(*) AS n_tri
      FROM o o1
      JOIN o o2 ON o2.s = o1.s
              AND (o1.dt < o2.dt OR (o1.dt = o2.dt AND o1.t < o2.t))
      JOIN o o3 ON o3.s = o1.t AND o3.t = o2.t
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
           (SELECT CAST(n_tri AS BIGINT) FROM tri) AS n_triangles,
           round(3.0 * (SELECT n_tri FROM tri) /
                 (SELECT sum(d * (d - 1) / 2) FROM deg), 6)
             AS global_clustering
    """,
    tags=("analytics", "graph", "triangles"),
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the co-purchase
    graph (parts linked when bought in the same order) via the
    compact-forward algorithm: every edge is oriented from its lower-
    (degree, id) endpoint to the higher one, so each wedge is enumerated
    once from its smallest corner and per-node out-degree is bounded by
    O(√m) — the join that would blow up on hub nodes in the naive
    formulation stays skew-proof at 100 TB. Edge generation is bounded
    per order by basket size (never a part×part cross). One row out:
    counts + 3·T/W clustering."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    )
    o1 = o.select(
        F.col("s").alias("s1"), F.col("t").alias("t1"), F.col("dt").alias("dt1")
    )
    o2 = o.select(
        F.col("s").alias("s2"), F.col("t").alias("t2"), F.col("dt").alias("dt2")
    )
    o3 = o.select(F.col("s").alias("s3"), F.col("t").alias("t3"))
    wedges = o1.join(
        o2,
        (F.col("s2") == F.col("s1"))
        & (
            (F.col("dt1") < F.col("dt2"))
            | ((F.col("dt1") == F.col("dt2")) & (F.col("t1") < F.col("t2")))
        ),
    )
    tri = wedges.join(
        o3, (F.col("s3") == F.col("t1")) & (F.col("t3") == F.col("t2"))
    ).agg(F.count(F.lit(1)).alias("n_tri"))
    stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        stats.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes", "n_edges", "n_wedges",
            F.col("n_tri").cast("bigint").alias("n_triangles"),
            F.round(
                3.0 * F.col("n_tri") / F.col("n_wedges").cast("double"), 6
            ).alias("global_clustering"),
        )
    )


@register(
    "recs_item_item_cf",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_partkey AS pk
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    bounded AS (
      SELECT ck, pk FROM basket
      WHERE ck IN (SELECT ck FROM basket GROUP BY ck HAVING count(*) <= 200)
    ),
    deg AS (SELECT pk, count(*) AS d FROM bounded GROUP BY 1),
    co AS (
      SELECT a.pk AS u, b.pk AS v, count(*) AS co
      FROM bounded a JOIN bounded b ON a.ck = b.ck AND a.pk < b.pk
      GROUP BY 1, 2
    ),
    sim AS (
      SELECT u AS item, v AS nbr, co,
             round(co / (sqrt(du.d) * sqrt(dv.d)), 6) AS cos_sim
      FROM co JOIN deg du ON du.pk = co.u JOIN deg dv ON dv.pk = co.v
      UNION ALL
      SELECT v, u, co, round(co / (sqrt(du.d) * sqrt(dv.d)), 6)
      FROM co JOIN deg du ON du.pk = co.u JOIN deg dv ON dv.pk = co.v
    ),
    ranked AS (
      SELECT item, nbr, co, cos_sim,
             CAST(row_number() OVER (PARTITION BY item
                                     ORDER BY cos_sim DESC, nbr) AS INTEGER)
               AS rn
      FROM sim
    )
    SELECT item, nbr, CAST(co AS BIGINT) AS n_co_buyers, cos_sim, rn
    FROM ranked WHERE rn <= 3 AND item % 10 = 0
    """,
    tags=("analytics", "recsys", "similarity"),
)
def recs_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (top-3 neighbors per part by
    binary-cosine over co-buyer sets — the Amazon-style 'customers also
    bought' kernel). Pair generation is per-customer and quadratic in
    basket size, so hot users are capped first (≤200 distinct items —
    the standard CF skew guard; at 100 TB the cap is what keeps the
    pair count Σ basket² bounded). One shuffle for baskets, one for the
    pair counts, one |items|-bounded window for the top-k; degree table
    broadcasts. Output restricted to every 10th part so the result
    stays audit-sized; cosine snaps to 6dp before ranking (nbr-asc
    tiebreak) so both engines rank identically."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"), "o_orderkey"
    )
    l = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), F.col("l_partkey").alias("pk")
    )
    basket = o.join(l, "o_orderkey").select("ck", "pk").distinct()
    ok = basket.groupBy("ck").agg(F.count(F.lit(1)).alias("n")).where(
        F.col("n") <= 200
    )
    bounded = basket.join(ok.select("ck"), "ck")
    deg = bounded.groupBy("pk").agg(F.count(F.lit(1)).alias("d"))
    a, b = bounded.alias("a"), bounded.alias("b")
    co = (
        a.join(b, (F.col("a.ck") == F.col("b.ck")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .agg(F.count(F.lit(1)).alias("co"))
    )
    du = F.broadcast(deg.select(F.col("pk").alias("u"), F.col("d").alias("du")))
    dv = F.broadcast(deg.select(F.col("pk").alias("v"), F.col("d").alias("dv")))
    cod = co.join(du, "u").join(dv, "v")
    cs = F.round(
        F.col("co") / (F.sqrt(F.col("du")) * F.sqrt(F.col("dv"))), 6
    )
    sim = cod.select(
        F.col("u").alias("item"), F.col("v").alias("nbr"),
        "co", cs.alias("cos_sim"),
    ).unionAll(
        cod.select(
            F.col("v").alias("item"), F.col("u").alias("nbr"),
            "co", cs.alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("item").orderBy(F.col("cos_sim").desc(), "nbr")
    return (
        sim.select(
            "item", "nbr", F.col("co").cast("bigint").alias("n_co_buyers"),
            "cos_sim", F.row_number().over(w).cast("int").alias("rn"),
        )
        .where((F.col("rn") <= 3) & (F.col("item") % 10 == 0))
    )


@register(
    "parts_pareto_skyline",
    oracle="""
    WITH base AS (
      SELECT p_partkey, p_brand, p_retailprice, p_size,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    ),
    sk AS (
      SELECT p_partkey, p_brand, p_retailprice, p_size,
             min(p_size) OVER (
               PARTITION BY p_brand
               ORDER BY cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_size_cheaper
      FROM base
    )
    SELECT p_partkey, p_brand, p_retailprice,
           CAST(p_size AS BIGINT) AS p_size
    FROM sk
    WHERE best_size_cheaper IS NULL OR p_size < best_size_cheaper
    """,
    tags=("analytics", "skyline", "window"),
)
def parts_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline per brand (parts not dominated on price↓ /
    size↓): computed in ONE sorted window pass — a part survives iff no
    strictly-cheaper part in its brand has size ≤ it, i.e. its size is
    below the running min over the strictly-cheaper price range. The
    naive skyline is the O(n²) domination anti-join; the running-min
    RANGE frame makes it one brand-partitioned sort, which is the shape
    that survives 100 TB (skyline of each brand's partition, no pair
    blow-up). Equal-price ties stay mutually non-dominating via the
    strict 1-cent RANGE bound on the exact integer cents key,
    identical in both engines."""
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("cents"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    sk = (
        load(spark, sf_dir, "part")
        .withColumn(
            "cents", F.round(F.col("p_retailprice") * 100).cast("bigint")
        )
        .select(
            "p_partkey", "p_brand", "p_retailprice", "p_size",
            F.min("p_size").over(w).alias("best_size_cheaper"),
        )
    )
    return sk.where(
        F.col("best_size_cheaper").isNull()
        | (F.col("p_size") < F.col("best_size_cheaper"))
    ).select(
        "p_partkey", "p_brand", "p_retailprice",
        F.col("p_size").cast("bigint").alias("p_size"),
    )


@register(
    "orders_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(round(sum(o_totalprice), 2) AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(round(avg(rev), 6) AS DECIMAL(28,6)) AS mu,
             count(*) AS n_days
      FROM daily
    ),
    s AS (
      SELECT day, rev,
             sum(CAST(rev AS DECIMAL(28,6)) - m.mu)
               OVER (ORDER BY day) AS cusum
      FROM daily, m
    ),
    ranked AS (
      SELECT day, rev, cusum,
             row_number() OVER (ORDER BY abs(cusum) DESC, day) AS rn
      FROM s
    )
    SELECT r.day AS cp_date,
           CAST(r.rev AS DOUBLE) AS cp_day_rev,
           CAST(r.cusum AS DOUBLE) AS s_max,
           CAST(m.mu AS DOUBLE) AS mean_rev,
           CAST(m.n_days AS BIGINT) AS n_days
    FROM ranked r, m WHERE r.rn = 1
    """,
    tags=("analytics", "timeseries", "changepoint"),
)
def orders_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over daily revenue: the argmax of
    |Σ(yₜ − ȳ)| locates the most likely mean shift (Page's statistic,
    the standard first-pass monitor for metric regressions). All
    arithmetic is exact DECIMAL — daily revenue on the 2dp grid, the
    mean snapped to 6dp, the cumulative sum exact — so the argmax
    (earliest-day tiebreak) is engine-identical with no float drift.
    Scale: one date-grain aggregate (map-side combined), then one
    window over the O(days) series — the cumsum never touches row-level
    data. A second pass on each side of the cut (binary segmentation)
    reuses the same plan."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.round(F.sum("o_totalprice"), 2)
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    m = daily.agg(
        F.round(F.avg("rev"), 6).cast("decimal(28,6)").alias("mu"),
        F.count(F.lit(1)).alias("n_days"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    s = daily.crossJoin(F.broadcast(m)).withColumn(
        "cusum",
        F.sum(F.col("rev").cast("decimal(28,6)") - F.col("mu")).over(w),
    )
    wr = Window.orderBy(F.abs(F.col("cusum")).desc(), F.col("day"))
    return (
        s.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            F.col("day").alias("cp_date"),
            F.col("rev").cast("double").alias("cp_day_rev"),
            F.col("cusum").cast("double").alias("s_max"),
            F.col("mu").cast("double").alias("mean_rev"),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
    )


@register(
    "customers_k_anonymity",
    oracle="""
    WITH qi AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             count(*) AS grp_size
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CASE WHEN grp_size >= 5 THEN '5+'
                ELSE CAST(grp_size AS VARCHAR) END AS k_bucket,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(grp_size) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN grp_size < 5 THEN grp_size ELSE 0 END)
                AS BIGINT) AS n_reidentifiable
    FROM qi GROUP BY 1
    """,
    tags=("analytics", "privacy", "governance"),
)
def customers_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation,
    market segment, $1000 balance band) — the training-data governance
    check that pairs with PII redaction: any row in an equivalence
    class smaller than k=5 is re-identifiable from public attributes
    alone. One map-side-combined group-count, then a 5-bucket rollup —
    two tiny shuffles at any corpus size. The production follow-up
    (suppress or generalize the flagged classes) filters on the same
    grp_size column."""
    qi = (
        load(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("grp_size"))
    )
    return (
        qi.groupBy(
            F.when(F.col("grp_size") >= 5, "5+")
            .otherwise(F.col("grp_size").cast("string"))
            .alias("k_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("grp_size").cast("bigint").alias("n_rows"),
            F.sum(
                F.when(F.col("grp_size") < 5, F.col("grp_size")).otherwise(0)
            ).cast("bigint").alias("n_reidentifiable"),
        )
    )


def _kcore_oracle(k: int = 3, rounds: int = 5) -> str:
    """Peeling replayed round-for-round with materialized CTEs: each
    round drops nodes of degree < k over the surviving edge set."""
    parts = ["""WITH li AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
    )"""]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f""",
    d{r} AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e{p} UNION ALL SELECT v FROM e{p}
      ) GROUP BY 1 HAVING count(*) >= {k}
    ),
    e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM e{p} e
      JOIN d{r} x ON x.node = e.u
      JOIN d{r} y ON y.node = e.v
    )""")
    sels = [
        f"SELECT {r} AS round, (SELECT CAST(count(*) AS BIGINT) FROM d{r}) AS n_nodes, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM e{r}) AS n_edges"
        for r in range(1, rounds + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(sels))
    return "".join(parts)


@register(
    "copurchase_kcore",
    oracle=_kcore_oracle(),
    tags=("analytics", "graph", "kcore"),
)
def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=3) of the co-purchase graph by bounded-
    round peeling: each round computes surviving degrees (one map-side-
    combined count over the edge list) and drops nodes below k, shrinking
    the edge set — the dense-subgraph extractor used for community/
    anomaly mining. 5 fixed rounds (the graph family's bounded-round
    pattern, cf. dedup_cluster_assign): each round is one degree
    aggregate + one semi-join, all shuffles keyed on node id, no
    frontier state on the driver. Emits the peeling trace
    (round, surviving nodes, surviving edges) — monotone non-increasing
    by construction."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    # LAZY checkpoints throughout (r15, guide §2.4/§1.2 "fewer, wider
    # jobs"): the eager per-round localCheckpoint ran ONE JOB PER ROUND
    # whose results the final unioned trace then partly recomputed (deg
    # was rebuilt per round inside the count job, and referenced twice
    # more inside the round's semi-joins). eager=False still truncates
    # lineage at plan-build time (LogicalRDD over the round's RDD) but
    # materializes everything in the single final action, where the
    # shared cached RDDs make each round's degree aggregate run ONCE —
    # measured at sf0.1: 8.5 → 4.7 s min-warm, DuckDB ratio 2.84 → 1.43,
    # and the wall growth across warm reruns (8.5 → 19 s, eager blocks
    # accumulating per invocation) is gone (plans/r15/copurchase_kcore_*).
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    out = None
    e = edges
    for r in range(1, 6):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= 3)
            .localCheckpoint(eager=False)
        )
        e = (
            e.join(deg.select(F.col("node").alias("u")), "u")
            .join(deg.select(F.col("node").alias("v")), "v")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        row = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes")).crossJoin(
            e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        ).select(F.lit(r).alias("round"), "n_nodes", "n_edges")
        out = row if out is None else out.unionAll(row)
    return out


def _bfs_oracle(rounds: int = 3) -> str:
    """Frontier expansion replayed hop-for-hop with materialized CTEs."""
    parts = ["""WITH li AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    e AS MATERIALIZED (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
    ),
    f0 AS MATERIALIZED (SELECT min(u) AS node FROM e),
    s0 AS MATERIALIZED (SELECT node FROM f0)"""]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f""",
    f{r} AS MATERIALIZED (
      SELECT DISTINCT e.v AS node
      FROM e JOIN f{p} f ON f.node = e.u
      WHERE e.v NOT IN (SELECT node FROM s{p})
    ),
    s{r} AS MATERIALIZED (
      SELECT node FROM s{p} UNION SELECT node FROM f{r}
    )""")
    sels = [
        f"SELECT {r} AS hop, (SELECT CAST(count(*) AS BIGINT) FROM f{r}) AS n_new, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM s{r}) AS n_reached"
        for r in range(1, rounds + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(sels))
    return "".join(parts)


@register(
    "copurchase_bfs_hops",
    oracle=_bfs_oracle(),
    tags=("analytics", "graph", "bfs"),
)
def copurchase_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop BFS reachability from the lowest-id part over the
    co-purchase graph — the neighborhood-size profile behind 'related
    products' crawls and influence radii. Each hop is one frontier-to-
    edge hash join plus an anti-join against the visited set, all keyed
    on node id (never an adjacency matrix); the frontier and visited
    sets stay DataFrames, so hop state is distributed, not driver-held.
    Bounded at 3 rounds like the rest of the graph family. Emits
    (hop, newly reached, cumulative reached)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    # NOTE (r15): the copurchase_kcore lazy-checkpoint move was tried
    # here too and measured WORSE (3.1 → 5.0 s min-warm at sf0.1): the
    # hop joins key on a 1-to-few-k-node frontier, and the eager
    # materialization is what lets AQE plan each tiny hop join from real
    # runtime sizes. Kept eager deliberately (guide §1.3).
    e = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") != F.col("b.pk")))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    frontier = e.agg(F.min("u").alias("node")).localCheckpoint()
    seen = frontier
    out = None
    for r in range(1, 4):
        frontier = (
            e.join(frontier.select(F.col("node").alias("u")), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(seen, "node", "left_anti")
            .localCheckpoint()
        )
        seen = seen.unionAll(frontier).localCheckpoint()
        row = frontier.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_new")
        ).crossJoin(
            seen.agg(F.count(F.lit(1)).cast("bigint").alias("n_reached"))
        ).select(F.lit(r).alias("hop"), "n_new", "n_reached")
        out = row if out is None else out.unionAll(row)
    return out


@register(
    "events_pattern_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(CASE event_type
                          WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                          WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                          ELSE 'e' END, ''
                        ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(s) AS BIGINT) AS n_events,
           CAST(length(regexp_replace(s, 'vc+p', '', 'g'))
                <> length(s) AS BOOLEAN) AS browse_buy,
           CAST(s LIKE '%ee%' AS BOOLEAN) AS double_error,
           CAST(length(regexp_extract(s, 'vc+p', 0)) AS BIGINT) AS first_match_len
    FROM seq
    """,
    tags=("analytics", "cep", "pattern"),
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite sequence pattern matching: each user's event
    history collapses to a compact symbol string (one char per event,
    ts/event_id ordered) and CEP patterns become JVM-side regexes —
    'view, clicks, then purchase' is ``vc+p``, 'consecutive errors' is
    ``ee``. One user_id shuffle builds the sequences; the matching is a
    map-only regexp pass over O(users) strings (per-user history is the
    bounded dimension, exactly how production CEP-on-batch shards). The
    reference parses no sequence operators; this exceeds it alongside
    the funnel/Markov family."""
    sym = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seq = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", sym.alias("sym"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "sym"))
                    ),
                    lambda x: x["sym"],
                ),
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").cast("bigint").alias("n_events"),
        (F.length(F.regexp_replace("s", "vc+p", "")) != F.length("s")).alias(
            "browse_buy"
        ),
        F.col("s").like("%ee%").alias("double_error"),
        F.length(F.regexp_extract("s", "vc+p", 0)).cast("bigint").alias(
            "first_match_len"
        ),
    )


@register(
    "customer_gini_revenue",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(round(sum(o_totalprice), 2) AS DECIMAL(18,2)) AS r
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT r, row_number() OVER (ORDER BY r, o_custkey) AS i FROM rev
    ),
    agg AS (
      SELECT count(*) AS n,
             sum(CAST(r AS DECIMAL(28,2))) AS tot,
             sum(CAST(i AS DECIMAL(28,2)) * r) AS iwsum
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(tot AS DOUBLE) AS total_revenue,
           round(2.0 * CAST(iwsum AS DOUBLE) / (n * CAST(tot AS DOUBLE))
                 - (n + 1.0) / n, 6) AS gini
    FROM agg
    """,
    tags=("analytics", "inequality", "gini"),
)
def customer_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration (the
    inequality dual of the Pareto-share query): G = 2·Σi·xᵢ/(n·Σx) −
    (n+1)/n over revenues ranked ascending. One customer rollup, one
    global rank window over the O(customers) table, one 3-value
    aggregate — the rank-weighted sums run in exact DECIMAL so the
    statistic is grid-identical across engines (custkey tiebreak pins
    equal revenues). At 100 TB the rank window is the only total-order
    step and it runs on the post-aggregate table, not raw orders."""
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2)
            .cast("decimal(18,2)")
            .alias("r")
        )
    )
    w = Window.orderBy("r", "o_custkey")
    ranked = rev.select("r", F.row_number().over(w).alias("i"))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r").cast("decimal(28,2)")).alias("tot"),
        F.sum(F.col("i").cast("decimal(28,2)") * F.col("r")).alias("iwsum"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("tot").cast("double").alias("total_revenue"),
        F.round(
            2.0 * F.col("iwsum").cast("double")
            / (F.col("n") * F.col("tot").cast("double"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "lineitem_weighted_median_price",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ),
    c AS (
      SELECT flag, price, qty,
             sum(qty) OVER (PARTITION BY flag
                            ORDER BY price, qty
                            ROWS UNBOUNDED PRECEDING) AS cw,
             sum(qty) OVER (PARTITION BY flag) AS tw
      FROM w
    ),
    m AS (
      SELECT flag, price, cw, tw,
             row_number() OVER (PARTITION BY flag ORDER BY price, qty) AS rn
      FROM c WHERE 2 * cw >= tw
    )
    SELECT flag AS l_returnflag,
           price AS weighted_median_price,
           CAST(tw AS BIGINT) AS total_weight
    FROM m WHERE rn = 1
    """,
    tags=("analytics", "percentile", "weighted"),
)
def lineitem_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the weighted
    percentile Spark lacks natively (percentile_approx is unweighted):
    the first price whose cumulative quantity crosses half the total,
    found with one partitioned sort window (cumulative weight) against
    a broadcast-free same-window total. Deterministic via the
    (price, qty) sort tiebreak. At 100 TB this is one shuffle on the
    group key and a per-group sort — the exact-percentile shape; the
    sketch path (weighted t-digest) is the approx variant."""
    w = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    cum = (
        Window.partitionBy("flag")
        .orderBy("price", "qty")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("flag")
    c = w.select(
        "flag", "price", "qty",
        F.sum("qty").over(cum).alias("cw"),
        F.sum("qty").over(tot).alias("tw"),
    )
    rn = Window.partitionBy("flag").orderBy("price", "qty")
    m = c.where(2 * F.col("cw") >= F.col("tw")).withColumn(
        "rn", F.row_number().over(rn)
    )
    return m.where(F.col("rn") == 1).select(
        F.col("flag").alias("l_returnflag"),
        F.col("price").alias("weighted_median_price"),
        F.col("tw").cast("bigint").alias("total_weight"),
    )


@register(
    "events_cuped_adjustment",
    oracle="""
    WITH bounds AS (
      SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us
      FROM events
    ),
    per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(round(sum(CASE WHEN epoch_us(ts) < (SELECT mid_us FROM bounds)
                                 THEN value ELSE 0 END), 2)
                  AS DECIMAL(18,2)) AS pre,
             CAST(round(sum(CASE WHEN epoch_us(ts) >= (SELECT mid_us FROM bounds)
                                 THEN value ELSE 0 END), 2)
                  AS DECIMAL(18,2)) AS post
      FROM events GROUP BY 1, 2
    ),
    mom AS (
      SELECT count(*) AS n,
             CAST(sum(pre) AS DOUBLE) AS sx,
             CAST(sum(post) AS DOUBLE) AS sy,
             CAST(sum(CAST(pre AS DECIMAL(28,4)) * pre) AS DOUBLE) AS sxx,
             CAST(sum(CAST(pre AS DECIMAL(28,4)) * post) AS DOUBLE) AS sxy,
             CAST(sum(CAST(post AS DECIMAL(28,4)) * post) AS DOUBLE) AS syy
      FROM per_user
    ),
    theta AS (
      SELECT n, sx / n AS mx,
             round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS th,
             round((syy - sy * sy / n) / (n - 1), 6) AS var_post,
             round(((syy - sy * sy / n)
                    - pow((sxy - sx * sy / n), 2) / (sxx - sx * sx / n))
                   / (n - 1), 6) AS var_adj
      FROM mom
    ),
    arms AS (
      SELECT arm, count(*) AS n_users,
             CAST(sum(pre) AS DOUBLE) / count(*) AS mean_pre,
             CAST(sum(post) AS DOUBLE) / count(*) AS mean_post
      FROM per_user GROUP BY 1
    )
    SELECT CAST(a.arm AS BIGINT) AS arm,
           CAST(a.n_users AS BIGINT) AS n_users,
           round(a.mean_post, 6) AS mean_post,
           round(a.mean_post - t.th * (a.mean_pre - t.mx), 6) AS mean_cuped,
           t.var_post, t.var_adj,
           round(1.0 - t.var_adj / t.var_post, 6) AS var_reduction
    FROM arms a, theta t
    """,
    tags=("analytics", "abtest", "cuped"),
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) for an A/B readout:
    per-user pre-period value is the covariate, θ = cov(pre,post)/
    var(pre) pooled, each arm's post-period mean adjusted by
    θ·(pre-mean drift). Everything derives from ONE pass of per-user
    2dp-snapped sums and one 6-value moment aggregate (exact DECIMAL
    products), so θ, the adjusted means and the variance-reduction
    ratio are grid-identical across engines. At 100 TB: one user_id
    shuffle, then scalars — the covariate needs no second scan of the
    raw events."""
    e = load(spark, sf_dir, "events").withColumn("us", ts_epoch_us("ts"))
    b = e.agg(
        F.floor((F.min("us") + F.max("us")) / 2).alias("mid_us")
    )
    pu = (
        e.crossJoin(F.broadcast(b))
        .groupBy("user_id", (F.col("user_id") % 2).alias("arm"))
        .agg(
            F.round(
                F.sum(F.when(F.col("us") < F.col("mid_us"), F.col("value"))
                      .otherwise(0.0)), 2
            ).cast("decimal(18,2)").alias("pre"),
            F.round(
                F.sum(F.when(F.col("us") >= F.col("mid_us"), F.col("value"))
                      .otherwise(0.0)), 2
            ).cast("decimal(18,2)").alias("post"),
        )
    )
    mom = pu.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre").cast("double").alias("sx"),
        F.sum("post").cast("double").alias("sy"),
        F.sum(F.col("pre").cast("decimal(28,4)") * F.col("pre"))
        .cast("double").alias("sxx"),
        F.sum(F.col("pre").cast("decimal(28,4)") * F.col("post"))
        .cast("double").alias("sxy"),
        F.sum(F.col("post").cast("decimal(28,4)") * F.col("post"))
        .cast("double").alias("syy"),
    )
    theta = mom.select(
        "n",
        (F.col("sx") / F.col("n")).alias("mx"),
        F.round(
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")),
            6,
        ).alias("th"),
        F.round(
            (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
            / (F.col("n") - 1),
            6,
        ).alias("var_post"),
        F.round(
            (
                (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
                - F.pow(
                    F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"),
                    F.lit(2),
                )
                / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            )
            / (F.col("n") - 1),
            6,
        ).alias("var_adj"),
    )
    arms = pu.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        (F.sum("pre").cast("double") / F.count(F.lit(1))).alias("mean_pre"),
        (F.sum("post").cast("double") / F.count(F.lit(1))).alias("mean_post"),
    )
    return arms.crossJoin(F.broadcast(theta)).select(
        F.col("arm").cast("bigint").alias("arm"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(F.col("mean_post"), 6).alias("mean_post"),
        F.round(
            F.col("mean_post") - F.col("th") * (F.col("mean_pre") - F.col("mx")),
            6,
        ).alias("mean_cuped"),
        "var_post", "var_adj",
        F.round(1.0 - F.col("var_adj") / F.col("var_post"), 6).alias(
            "var_reduction"
        ),
    )


@register(
    "parts_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS pk,
             CAST(round(CAST(round(sum(l_extendedprice * (1 - l_discount)), 4)
                             AS DECIMAL(38,4)), 2)
                  AS DECIMAL(18,2)) AS r
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(CAST(r AS DECIMAL(28,2))) AS t FROM rev),
    cum AS (
      SELECT pk, r,
             sum(CAST(r AS DECIMAL(28,2)))
               OVER (ORDER BY r DESC, pk) AS cr
      FROM rev
    ),
    cls AS (
      SELECT pk, r,
             CASE WHEN CAST(cr AS DOUBLE) / CAST(t.t AS DOUBLE) <= 0.8
                  THEN 'A'
                  WHEN CAST(cr AS DOUBLE) / CAST(t.t AS DOUBLE) <= 0.95
                  THEN 'B' ELSE 'C' END AS abc
      FROM cum, tot t
    )
    SELECT abc,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CAST(r AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
           round(CAST(sum(CAST(r AS DECIMAL(28,2))) AS DOUBLE)
                 / (SELECT CAST(t AS DOUBLE) FROM tot), 6) AS revenue_share
    FROM cls GROUP BY abc
    """,
    tags=("analytics", "abc", "inventory"),
)
def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC revenue classification (the 80/15/5 inventory rule): parts
    ranked by discounted revenue, classes cut at 80% / 95% of the exact-
    DECIMAL cumulative share. One part-key rollup, then a single global
    cumsum window over the O(parts) aggregate — the ranked table is the
    post-aggregate one, so the total-order step never sees raw
    lineitems. Class boundaries compare exact decimal cumulative sums
    (pk tiebreak on equal revenue), so the cut is engine-identical."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            # money_round2 convention (core_sql.py): the true per-part sum
            # lives on the 4dp grid (price × (1−disc)); snap the double sum
            # to it, then round to cents in DECIMAL — a raw round(sum, 2)
            # ties at .xx50 and flips cents by summation order (r8 hash
            # failure: class revenue …496.42 vs …496.41).
            F.round(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    4,
                ).cast("decimal(38,4)"),
                2,
            ).cast("decimal(18,2)").alias("r")
        )
    )
    tot = rev.agg(F.sum(F.col("r").cast("decimal(28,2)")).alias("t"))
    w = Window.orderBy(F.col("r").desc(), "pk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = rev.withColumn(
        "cr", F.sum(F.col("r").cast("decimal(28,2)")).over(w)
    ).crossJoin(F.broadcast(tot))
    share = F.col("cr").cast("double") / F.col("t").cast("double")
    cls = cum.withColumn(
        "abc",
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C"),
    )
    return (
        cls.groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum(F.col("r").cast("decimal(28,2)")).cast("double").alias("revenue"),
            F.max(F.col("t").cast("double")).alias("_t"),
        )
        .select(
            "abc", "n_parts", "revenue",
            F.round(F.col("revenue") / F.col("_t"), 6).alias("revenue_share"),
        )
    )


@register(
    "customer_order_interarrival",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap
      FROM orders
    ),
    per_cust AS (
      SELECT o_custkey AS custkey,
             count(gap) AS n_gaps,
             round(avg(gap), 6) AS mean_gap,
             CAST(min(gap) AS BIGINT) AS min_gap,
             CAST(max(gap) AS BIGINT) AS max_gap
      FROM gaps WHERE gap IS NOT NULL
      GROUP BY 1 HAVING count(gap) >= 3
    )
    SELECT custkey, CAST(n_gaps AS BIGINT) AS n_gaps,
           mean_gap, min_gap, max_gap
    FROM per_cust
    """,
    tags=("analytics", "interarrival", "window"),
)
def customer_order_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order inter-arrival statistics per customer (the purchase-cadence
    feature behind churn/LTV models): one lag window over each
    customer's date-ordered orders (orderkey tiebreak pins same-day
    orders), then a per-customer gap rollup — both stages keyed on
    custkey, one shuffle total. Customers with < 3 gaps are dropped
    (cadence needs history)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).alias("gap"),
    )
    return (
        gaps.where(F.col("gap").isNotNull())
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("gap").cast("bigint").alias("n_gaps"),
            F.round(F.avg("gap"), 6).alias("mean_gap"),
            F.min("gap").cast("bigint").alias("min_gap"),
            F.max("gap").cast("bigint").alias("max_gap"),
        )
        .where(F.col("n_gaps") >= 3)
    )


@register(
    "users_bot_heuristic",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             count(*) + 1 AS n_events,
             count(*) AS n_gaps,
             sum(gap_us) AS sx,
             sum(CAST(gap_us AS HUGEINT) * gap_us) AS sxx,
             CAST(sum(CASE WHEN gap_us < 1000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_subsecond
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY 1
    ),
    calc AS (
      SELECT user_id, n_events, n_gaps, n_subsecond,
             (2 * sx + n_gaps) // (2 * n_gaps) AS mean_us,
             CASE WHEN n_gaps > 1 THEN
               CAST(floor(sqrt(greatest(
                 (CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                    / CAST(n_gaps AS DOUBLE))
                 / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0)) + 0.5) AS BIGINT)
             ELSE 0 END AS sd_us
      FROM per_user
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(mean_us AS DOUBLE) / 1e6 AS mean_gap_s,
           CAST(sd_us AS DOUBLE) / 1e6 AS sd_gap_s,
           n_subsecond,
           CAST(n_subsecond >= 3
                OR (n_events >= 20 AND 2 * sd_us < mean_us)
                AS BOOLEAN) AS bot_suspect
    FROM calc
    """,
    tags=("analytics", "quality", "bot"),
)
def users_bot_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation detection heuristics over event cadence — the
    traffic-cleaning pass every web-scale corpus runs before counting
    anything: per-user inter-arrival gaps (one lag window, event_id
    tiebreak), then burst (≥3 sub-second gaps) and metronome (many
    events with low gap variance) rules. Integer epoch-microsecond
    gaps keep the arithmetic exact; the rules read a per-user rollup,
    so the verdict is one user_id shuffle at any corpus size.

    Determinism protocol (r9): avg()/stddev_samp() of bigints are
    ORDER-DEPENDENT doubles (DuckDB streams a running mean; Spark
    sums-then-divides) — a 1500-user sf0.1 sweep flipped a 6dp mean by
    1e-6. Both sides now aggregate exact integer sums (Σx as bigint,
    Σx² exact wide: DECIMAL(38,0) here, HUGEINT in the oracle), derive
    the mean as half-up integer µs ((2Σx+n) div 2n ≡ round-6dp of
    seconds) and the sample sd through ONE shared double formula over
    those exact sums, snapped to integer µs via floor(x+0.5); the bot
    rule compares integers (2·sd_us < mean_us)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = ts_epoch_us("ts")
    g = load(spark, sf_dir, "events").select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )
    pu = (
        g.where(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            (F.count(F.lit(1)) + 1).cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum("gap_us").cast("bigint").alias("sx"),
            F.sum(
                F.col("gap_us").cast("decimal(38,0)")
                * F.col("gap_us").cast("decimal(19,0)")
            ).alias("sxx"),
            F.sum(
                F.when(F.col("gap_us") < 1000000, 1).otherwise(0)
            ).cast("bigint").alias("n_subsecond"),
        )
    )
    mean_us = F.expr("(2 * sx + n_gaps) div (2 * n_gaps)")
    nd = F.col("n_gaps").cast("double")
    var = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / nd
    ) / (nd - F.lit(1.0))
    sd_us = F.when(
        F.col("n_gaps") > 1,
        F.floor(F.sqrt(F.greatest(var, F.lit(0.0))) + F.lit(0.5)).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return pu.select(
        "user_id",
        "n_events",
        (mean_us.cast("double") / F.lit(1e6)).alias("mean_gap_s"),
        (sd_us.cast("double") / F.lit(1e6)).alias("sd_gap_s"),
        "n_subsecond",
        (
            (F.col("n_subsecond") >= 3)
            | ((F.col("n_events") >= 20) & (2 * sd_us < mean_us))
        ).alias("bot_suspect"),
    )


_KMV_K = 64
_KMV_HASH = (
    "CAST(('0x' || substr(md5('kmv:' || CAST({c} AS VARCHAR)), 1, 15)) "
    "AS BIGINT)"
)


@register(
    "events_kmv_set_ops",
    oracle=f"""
    WITH m AS (
      SELECT DISTINCT event_type AS et, user_id,
             {_KMV_HASH.format(c='user_id')} AS h
      FROM events
    ),
    sk AS (
      SELECT et, h, row_number() OVER (PARTITION BY et ORDER BY h) AS rn
      FROM m
    ),
    kept AS (SELECT et, h, rn FROM sk WHERE rn <= {_KMV_K}),
    est AS (
      SELECT et,
             count(*) AS k_used,
             max(h) AS kth,
             count(*) AS _n
      FROM kept GROUP BY et
    ),
    exact AS (SELECT et, count(DISTINCT user_id) AS exact_d FROM m GROUP BY et),
    pairs AS (
      SELECT a.et AS set_a, b.et AS set_b,
             count(*) AS common_in_sketch
      FROM kept a JOIN kept b ON b.et > a.et AND b.h = a.h
      GROUP BY 1, 2
    ),
    ex_pairs AS (
      SELECT a.et AS set_a, b.et AS set_b,
             count(*) AS exact_common
      FROM m a JOIN m b ON b.et > a.et AND b.user_id = a.user_id
      GROUP BY 1, 2
    )
    SELECT p.set_a, p.set_b,
           CAST(p.common_in_sketch AS BIGINT) AS common_in_sketch,
           CAST(x.exact_common AS BIGINT) AS exact_common,
           CAST(ea.exact_d AS BIGINT) AS exact_a,
           CAST(eb.exact_d AS BIGINT) AS exact_b
    FROM pairs p
    JOIN ex_pairs x ON x.set_a = p.set_a AND x.set_b = p.set_b
    JOIN exact ea ON ea.et = p.set_a
    JOIN exact eb ON eb.et = p.set_b
    """,
    tags=("analytics", "sketch", "setops"),
)
def events_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/Theta-style sketch set operations: each event type's user set
    compresses to its K=64 minimum md5 hashes; pairwise audience
    overlap is then a K-bounded sketch join instead of a full user-set
    intersection — the mergeable shape for cross-segment overlap at
    100 TB (sketches union by keeping the K smallest of the merged
    hashes; here every per-set sketch is exact-deterministic because
    the hash is seeded md5, so the oracle replays it hash-for-hash).
    Emits sketch-common vs exact-common so the estimate quality is
    visible in the certified output."""
    e = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"), "user_id"
    ).distinct()
    m = e.withColumn(
        "h",
        F.conv(F.substring(F.md5(F.concat(F.lit("kmv:"),
                                          F.col("user_id").cast("string"))),
                           1, 15), 16, 10).cast("bigint"),
    )
    w = Window.partitionBy("et").orderBy("h")
    kept = m.select("et", "h", F.row_number().over(w).alias("rn")).where(
        F.col("rn") <= _KMV_K
    )
    exact = m.groupBy("et").agg(
        F.countDistinct("user_id").alias("exact_d")
    )
    a = kept.select(F.col("et").alias("set_a"), "h")
    b = kept.select(F.col("et").alias("set_b"), "h")
    pairs = (
        a.join(b, (F.col("set_b") > F.col("set_a")) & (a.h == b.h))
        .groupBy("set_a", "set_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_in_sketch"))
    )
    ea = m.select(F.col("et").alias("set_a"), F.col("user_id").alias("ua"))
    eb = m.select(F.col("et").alias("set_b"), F.col("user_id").alias("ub"))
    ex_pairs = (
        ea.join(eb, (F.col("set_b") > F.col("set_a")) & (F.col("ua") == F.col("ub")))
        .groupBy("set_a", "set_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_common"))
    )
    return (
        pairs.join(ex_pairs, ["set_a", "set_b"])
        .join(
            F.broadcast(exact.select(F.col("et").alias("set_a"),
                                     F.col("exact_d").alias("exact_a"))),
            "set_a",
        )
        .join(
            F.broadcast(exact.select(F.col("et").alias("set_b"),
                                     F.col("exact_d").alias("exact_b"))),
            "set_b",
        )
        .select("set_a", "set_b", "common_in_sketch", "exact_common",
                "exact_a", "exact_b")
    )


@register(
    "orders_ar1_autoregression",
    oracle="""
    WITH monthly AS (
      SELECT o_orderpriority AS pri,
             date_trunc('month', o_orderdate) AS mon,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS DOUBLE) / 100 AS rev
      FROM orders GROUP BY 1, 2
    ),
    lagged AS (
      SELECT pri, mon, rev,
             lag(rev) OVER (PARTITION BY pri ORDER BY mon) AS prev
      FROM monthly
    )
    SELECT pri,
           CAST(count(*) AS BIGINT) AS n_obs,
           round(regr_slope(rev, prev), 6) AS phi,
           round(regr_intercept(rev, prev), 2) AS intercept,
           round(regr_r2(rev, prev), 6) AS r2
    FROM lagged WHERE prev IS NOT NULL
    GROUP BY pri
    """,
    tags=("analytics", "timeseries", "autoregression"),
)
def orders_ar1_autoregression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) fit per revenue series (yₜ = φ·yₜ₋₁ + c): the mean-
    reversion / momentum diagnostic that complements the Holt smoother —
    φ comes straight from the regr_slope aggregate over the lagged
    series (one lag window on the O(months) post-aggregate table, then
    a 3-statistic regression aggregate; both stages priority-keyed).
    Monthly revenues are summed in EXACT INTEGER CENTS (the streaming
    integer-cents protocol) — round(sum(double), 2) is run-
    nondeterministic at sf0.1 magnitudes (monthly sums ~1e8, double ulp
    ~0.015: summation order can flip a cent and shift the 6dp
    regression stats; caught by the r12 full-registry sf0.1 sweep), so
    both engines fit identical, order-independent points."""
    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .cast("double")
                / 100
            ).alias("rev")
        )
    )
    w = Window.partitionBy("pri").orderBy("mon")
    lagged = monthly.withColumn("prev", F.lag("rev").over(w)).where(
        F.col("prev").isNotNull()
    )
    # phi and r2 are O(1) — 6dp is 7 significant digits, cross-engine
    # safe; the intercept is a REVENUE-scale value (~1e8) where 6dp
    # would demand 15 significant digits of float agreement — engines
    # differ in the last ulp of regr_intercept, so it rounds to cents
    # (caught flapping in the r12 repeated-sf0.1 sweeps)
    return lagged.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.round(F.regr_slope("rev", "prev"), 6).alias("phi"),
        F.round(F.regr_intercept("rev", "prev"), 2).alias("intercept"),
        F.round(F.regr_r2("rev", "prev"), 6).alias("r2"),
    )


@register(
    "nations_revenue_hhi",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nation, o.o_custkey,
             CAST(round(sum(o.o_totalprice), 2) AS DECIMAL(18,2)) AS r
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT nation, sum(CAST(r AS DECIMAL(28,2))) AS t,
             count(*) AS n_cust
      FROM rev GROUP BY 1
    )
    SELECT r.nation,
           CAST(max(t.n_cust) AS BIGINT) AS n_customers,
           CAST(CAST(max(t.t) * 100 AS BIGINT) AS DOUBLE)
             / CAST(100 AS DOUBLE) AS total_revenue,
           CAST(round(CAST(round(sum(round(
             pow(CAST(r.r AS DOUBLE) / CAST(t.t AS DOUBLE), 2), 8)), 8)
             AS DECIMAL(38,8)), 6) AS DOUBLE) AS hhi
    FROM rev r JOIN tot t ON t.nation = r.nation
    GROUP BY r.nation
    """,
    tags=("analytics", "concentration", "hhi"),
)
def nations_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman revenue-concentration index per nation
    (Σ share² over its customers — 1/HHI is the effective number of
    customers; the market-concentration dual of the Gini query). Two
    shuffles — the customer rollup and the nation totals — then a
    broadcast join puts each customer's share against its nation total;
    shares square on 2dp-gridded revenues so the 6dp index matches
    across engines."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    rev = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("nation", "o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2)
            .cast("decimal(18,2)").alias("r")
        )
    )
    tot = rev.groupBy("nation").agg(
        F.sum(F.col("r").cast("decimal(28,2)")).alias("t"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    return (
        rev.join(F.broadcast(tot), "nation")
        .groupBy("nation")
        .agg(
            F.max("n_cust").cast("bigint").alias("n_customers"),
            # cents/100.0 on both engines (identical doubles) rather
            # than a direct decimal->double cast
            (
                F.max((F.col("t") * 100).cast("bigint")).cast("double")
                / F.lit(100).cast("double")
            ).alias("total_revenue"),
            # squared shares snap to the 8dp grid before the sum, so
            # the 6dp round is tie-free in DECIMAL (round_lint.py)
            F.round(
                F.round(
                    F.sum(
                        F.round(
                            F.pow(
                                F.col("r").cast("double")
                                / F.col("t").cast("double"),
                                F.lit(2),
                            ),
                            8,
                        )
                    ),
                    8,
                ).cast("decimal(38,8)"),
                6,
            ).cast("double").alias("hhi"),
        )
    )


def _markov_stationary_oracle(rounds: int = 5) -> str:
    """Power iteration unrolled: pi_{t+1}[d] = Σ_s pi_t[s]·P[s,d], every
    entry snapped to an 8dp decimal grid per round."""
    parts = ["""WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    p AS MATERIALIZED (
      SELECT event_type AS src, next_type AS dst,
             CAST(round(count(*) / CAST(sum(count(*))
                    OVER (PARTITION BY event_type) AS DOUBLE), 6)
                  AS DECIMAL(8,6)) AS p
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    states AS MATERIALIZED (SELECT DISTINCT src AS st FROM p),
    pi0 AS MATERIALIZED (
      SELECT st, CAST(round(1.0 / (SELECT count(*) FROM states), 8)
                      AS DECIMAL(12,8)) AS prob
      FROM states
    )"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
    pi{t} AS MATERIALIZED (
      SELECT p.dst AS st,
             CAST(round(CAST(sum(pi{t - 1}.prob * p.p) AS DOUBLE), 8)
                  AS DECIMAL(12,8)) AS prob
      FROM pi{t - 1} JOIN p ON p.src = pi{t - 1}.st
      GROUP BY 1
    )""")
    parts.append(f"""
    SELECT st AS state, CAST(prob AS DOUBLE) AS pi
    FROM pi{rounds}""")
    return "".join(parts)


@register(
    "events_markov_stationary",
    oracle=_markov_stationary_oracle(),
    tags=("analytics", "markov", "iterative"),
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain by 5
    power-iteration rounds from the uniform vector — where user
    attention concentrates in the long run. The transition matrix is
    |types|² (tiny at any corpus size; ONE user_id-shuffled lead()
    builds it), so each round is a broadcast |types|-row mat-vec; all
    arithmetic is exact DECIMAL products (p on a 6dp grid) with each
    round's π snapped to 8dp through an identical double-round on both
    engines, and the oracle replays the recurrence round-for-round."""
    ev = events_with_ts(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    wsrc = Window.partitionBy("src")
    p = (
        ordered.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"),
            F.col("next_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "src", "dst",
            F.round(
                F.col("n") / F.sum("n").over(wsrc).cast("double"), 6
            ).cast("decimal(8,6)").alias("p"),
        )
        .localCheckpoint()
    )
    states = p.select(F.col("src").alias("st")).distinct()
    n_states = states.count()
    pi = states.select(
        "st",
        F.round(F.lit(1.0 / n_states), 8).cast("decimal(12,8)").alias("prob"),
    )
    for _ in range(5):
        pi = (
            pi.join(F.broadcast(p), pi.st == p.src)
            .groupBy(F.col("dst").alias("st"))
            .agg(
                F.round(
                    F.sum(F.col("prob") * F.col("p")).cast("double"), 8
                ).cast("decimal(12,8)").alias("prob")
            )
        )
    return pi.select(
        F.col("st").alias("state"), F.col("prob").cast("double").alias("pi")
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('month', min(ts)) AS cohort
      FROM events GROUP BY 1
    ),
    sizes AS (SELECT cohort, count(*) AS n_users FROM first_seen GROUP BY 1),
    rev AS (
      SELECT f.cohort,
             date_diff('month', f.cohort, date_trunc('month', e.ts)) AS age,
             CAST(round(sum(e.value), 2) AS DECIMAL(18,2)) AS r
      FROM events e
      JOIN first_seen f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT r.cohort, CAST(r.age AS BIGINT) AS age_months,
           CAST(s.n_users AS BIGINT) AS cohort_users,
           CAST(sum(CAST(r.r AS DECIMAL(28,2)))
                  OVER (PARTITION BY r.cohort ORDER BY r.age)
                AS DOUBLE) AS cum_revenue,
           round(CAST(sum(CAST(r.r AS DECIMAL(28,2)))
                        OVER (PARTITION BY r.cohort ORDER BY r.age)
                      AS DOUBLE) / s.n_users, 6) AS ltv_per_user
    FROM rev r JOIN sizes s ON s.cohort = r.cohort
    """,
    tags=("analytics", "ltv", "cohort"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves (cumulative purchase revenue per user by
    month-age since first activity) — the growth-model complement of
    cohort retention. Two user_id-keyed aggregates (first-seen month,
    per-cohort-age revenue), then one cumulative window over the
    O(cohorts × ages) rollup; revenue cumsums run as exact DECIMAL so
    the curve is grid-identical. At 100 TB nothing here touches raw
    events twice."""
    e = events_with_ts(spark, sf_dir)
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("cohort")
    )
    sizes = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    rev = (
        e.where(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .groupBy(
            "cohort",
            (
                (F.year(F.date_trunc("month", "ts")) - F.year("cohort")) * 12
                + (F.month(F.date_trunc("month", "ts")) - F.month("cohort"))
            ).alias("age"),
        )
        .agg(F.round(F.sum("value"), 2).cast("decimal(18,2)").alias("r"))
    )
    wc = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col("r").cast("decimal(28,2)")).over(wc)
    return (
        rev.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            F.col("age").cast("bigint").alias("age_months"),
            F.col("n_users").cast("bigint").alias("cohort_users"),
            cum.cast("double").alias("cum_revenue"),
            F.round(cum.cast("double") / F.col("n_users"), 6).alias(
                "ltv_per_user"
            ),
        )
    )


@register(
    "orders_revenue_peaks",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(CAST(round(sum(o_totalprice), 2) AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    nbr AS (
      SELECT day, c,
             lag(c)  OVER (ORDER BY day) AS prev_c,
             lead(c) OVER (ORDER BY day) AS next_c
      FROM daily
    ),
    peaks AS (
      SELECT day, c, prev_c, next_c,
             c - greatest(prev_c, next_c) AS prom_c
      FROM nbr
      WHERE prev_c IS NOT NULL AND next_c IS NOT NULL
        AND c > prev_c AND c > next_c
    )
    SELECT day,
           CAST(c AS DOUBLE) / CAST(100 AS DOUBLE)      AS rev,
           CAST(prev_c AS DOUBLE) / CAST(100 AS DOUBLE) AS prev_rev,
           CAST(next_c AS DOUBLE) / CAST(100 AS DOUBLE) AS next_rev,
           CAST(prom_c AS DOUBLE) / CAST(100 AS DOUBLE) AS prominence,
           CAST(row_number() OVER (ORDER BY prom_c DESC, day)
                AS INTEGER) AS rnk
    FROM peaks
    QUALIFY rnk <= 5
    """,
    tags=("analytics", "timeseries", "peaks"),
)
def orders_revenue_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection over daily revenue (the alerting primitive
    behind spike triage): a peak strictly exceeds both neighbors, its
    prominence is the margin over the taller neighbor, top-5 reported.
    One date-grain aggregate then two window passes over the O(days)
    series — exact integer-CENT values so peak identity and ranking are
    engine-identical (day tiebreak), and every double output is the
    identical bigint/100.0 on both engines (a DECIMAL(18,2)→DOUBLE cast
    is NOT correctly rounded in DuckDB: 801799.32 came back
    801799.3200000001 at sf0.001 — the r9 sweep catch)."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            (F.round(F.sum("o_totalprice"), 2).cast("decimal(18,2)") * 100)
            .cast("bigint").alias("c")
        )
    )
    w = Window.orderBy("day")
    nbr = daily.select(
        "day", "c",
        F.lag("c").over(w).alias("prev_c"),
        F.lead("c").over(w).alias("next_c"),
    )
    peaks = nbr.where(
        F.col("prev_c").isNotNull()
        & F.col("next_c").isNotNull()
        & (F.col("c") > F.col("prev_c"))
        & (F.col("c") > F.col("next_c"))
    ).select(
        "day", "c", "prev_c", "next_c",
        (F.col("c") - F.greatest("prev_c", "next_c")).alias("prom_c"),
    )
    wr = Window.orderBy(F.col("prom_c").desc(), "day")
    hundred = F.lit(100).cast("double")
    return peaks.select(
        "day",
        (F.col("c").cast("double") / hundred).alias("rev"),
        (F.col("prev_c").cast("double") / hundred).alias("prev_rev"),
        (F.col("next_c").cast("double") / hundred).alias("next_rev"),
        (F.col("prom_c").cast("double") / hundred).alias("prominence"),
        F.row_number().over(wr).cast("int").alias("rnk"),
    ).where(F.col("rnk") <= 5)


@register(
    "events_psi_drift",
    oracle="""
    WITH base AS (
      SELECT event_type, value, epoch_us(ts) AS us,
             (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
              FROM events) AS mid
      FROM events
    ),
    ref AS (SELECT event_type, value FROM base WHERE us < mid),
    cur AS (SELECT event_type, value FROM base WHERE us >= mid),
    ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value)
               AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM ref
    ),
    edges AS (
      SELECT event_type,
             max(CASE WHEN rk = CAST(ceil(1 * n / 5.0) AS BIGINT)
                 THEN value END) AS e1,
             max(CASE WHEN rk = CAST(ceil(2 * n / 5.0) AS BIGINT)
                 THEN value END) AS e2,
             max(CASE WHEN rk = CAST(ceil(3 * n / 5.0) AS BIGINT)
                 THEN value END) AS e3,
             max(CASE WHEN rk = CAST(ceil(4 * n / 5.0) AS BIGINT)
                 THEN value END) AS e4
      FROM ranked GROUP BY event_type
    ),
    rc AS (
      SELECT r.event_type, count(*) AS n,
             sum(CASE WHEN value <= e1 THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN value > e1 AND value <= e2 THEN 1 ELSE 0 END) AS c2,
             sum(CASE WHEN value > e2 AND value <= e3 THEN 1 ELSE 0 END) AS c3,
             sum(CASE WHEN value > e3 AND value <= e4 THEN 1 ELSE 0 END) AS c4,
             sum(CASE WHEN value > e4 THEN 1 ELSE 0 END) AS c5
      FROM ref r JOIN edges USING (event_type) GROUP BY 1
    ),
    cc AS (
      SELECT c.event_type, count(*) AS n,
             sum(CASE WHEN value <= e1 THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN value > e1 AND value <= e2 THEN 1 ELSE 0 END) AS c2,
             sum(CASE WHEN value > e2 AND value <= e3 THEN 1 ELSE 0 END) AS c3,
             sum(CASE WHEN value > e3 AND value <= e4 THEN 1 ELSE 0 END) AS c4,
             sum(CASE WHEN value > e4 THEN 1 ELSE 0 END) AS c5
      FROM cur c JOIN edges USING (event_type) GROUP BY 1
    ),
    terms AS (
      SELECT r.event_type, r.n AS n_ref, cc.n AS n_cur,
             round(((r.c1+1.0)/(r.n+5) - (cc.c1+1.0)/(cc.n+5))
                   * ln(((r.c1+1.0)/(r.n+5)) / ((cc.c1+1.0)/(cc.n+5))), 8)
             + round(((r.c2+1.0)/(r.n+5) - (cc.c2+1.0)/(cc.n+5))
                   * ln(((r.c2+1.0)/(r.n+5)) / ((cc.c2+1.0)/(cc.n+5))), 8)
             + round(((r.c3+1.0)/(r.n+5) - (cc.c3+1.0)/(cc.n+5))
                   * ln(((r.c3+1.0)/(r.n+5)) / ((cc.c3+1.0)/(cc.n+5))), 8)
             + round(((r.c4+1.0)/(r.n+5) - (cc.c4+1.0)/(cc.n+5))
                   * ln(((r.c4+1.0)/(r.n+5)) / ((cc.c4+1.0)/(cc.n+5))), 8)
             + round(((r.c5+1.0)/(r.n+5) - (cc.c5+1.0)/(cc.n+5))
                   * ln(((r.c5+1.0)/(r.n+5)) / ((cc.c5+1.0)/(cc.n+5))), 8)
               AS psi
      FROM rc r JOIN cc ON cc.event_type = r.event_type
    )
    SELECT event_type, CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           round(psi, 6) AS psi,
           CAST(round(psi, 6) > 0.1 AS BOOLEAN) AS drift_flag
    FROM terms
    """,
    tags=("analytics", "drift", "psi"),
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the stream's
    first and second halves — THE production drift monitor for any
    scored feature: quintile edges come from exact order statistics of
    the reference window (the r-th smallest value of a multiset is
    tie-order-independent), both windows bin with one conditional
    aggregate against the broadcast 4-edge table, and PSI sums
    Laplace-smoothed (c+1)/(n+5) shares with each term snapped to 8dp.
    Flags types past the classic 0.1 threshold. At 100 TB: two
    map-combined conditional aggregates + one |types|-row join — edges
    would come from approx_percentile in the sketch variant, exact here
    for the oracle."""
    e = load(spark, sf_dir, "events").withColumn("us", ts_epoch_us("ts"))
    mid = e.agg(
        F.floor((F.min("us") + F.max("us")) / 2).alias("mid")
    )
    b = e.crossJoin(F.broadcast(mid)).select(
        "event_type", "value", (F.col("us") < F.col("mid")).alias("is_ref")
    )
    ref = b.where("is_ref")
    cur = b.where(~F.col("is_ref"))
    wr = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    ranked = ref.select(
        "event_type", "value",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    def edge(b_i: int):
        return F.max(
            F.when(
                F.col("rk")
                == F.ceil(b_i * F.col("n") / 5.0).cast("bigint"),
                F.col("value"),
            )
        ).alias(f"e{b_i}")

    edges = ranked.groupBy("event_type").agg(
        edge(1), edge(2), edge(3), edge(4)
    )

    def counts(src):
        return (
            src.join(F.broadcast(edges), "event_type")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("value") <= F.col("e1"), 1).otherwise(0)).alias("c1"),
                F.sum(F.when((F.col("value") > F.col("e1")) & (F.col("value") <= F.col("e2")), 1).otherwise(0)).alias("c2"),
                F.sum(F.when((F.col("value") > F.col("e2")) & (F.col("value") <= F.col("e3")), 1).otherwise(0)).alias("c3"),
                F.sum(F.when((F.col("value") > F.col("e3")) & (F.col("value") <= F.col("e4")), 1).otherwise(0)).alias("c4"),
                F.sum(F.when(F.col("value") > F.col("e4"), 1).otherwise(0)).alias("c5"),
            )
        )

    rc = counts(ref)
    cc = counts(cur)
    r, c = rc.alias("r"), cc.alias("c")
    j = r.join(c, F.col("r.event_type") == F.col("c.event_type"))

    def term(i: int):
        p = (F.col(f"r.c{i}") + 1.0) / (F.col("r.n") + 5)
        q = (F.col(f"c.c{i}") + 1.0) / (F.col("c.n") + 5)
        return F.round((p - q) * F.log(p / q), 8)

    psi = term(1) + term(2) + term(3) + term(4) + term(5)
    return j.select(
        F.col("r.event_type").alias("event_type"),
        F.col("r.n").cast("bigint").alias("n_ref"),
        F.col("c.n").cast("bigint").alias("n_cur"),
        F.round(psi, 6).alias("psi"),
        (F.round(psi, 6) > 0.1).alias("drift_flag"),
    )


@register(
    "events_lateness_profile",
    oracle="""
    WITH arr AS (
      SELECT epoch_us(ts) AS us,
             max(epoch_us(ts)) OVER (ORDER BY event_id) AS frontier_us
      FROM events
    ),
    late AS (
      SELECT CAST(floor((frontier_us - us) / 60000000.0) AS BIGINT)
               AS late_min
      FROM arr
    ),
    hist AS (
      SELECT CASE WHEN late_min = 0 THEN '0 (in order)'
                  WHEN late_min < 5 THEN '1-4 min'
                  WHEN late_min < 30 THEN '5-29 min'
                  WHEN late_min < 120 THEN '30-119 min'
                  ELSE '120+ min' END AS lateness_bucket,
             count(*) AS n
      FROM late GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS t FROM hist)
    SELECT lateness_bucket,
           CAST(n AS BIGINT) AS n_events,
           round(n / CAST(t.t AS DOUBLE), 6) AS share
    FROM hist, tot t
    """,
    tags=("analytics", "streaming", "watermark"),
)
def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time lateness distribution — THE input for choosing a
    Structured-Streaming watermark delay: with event_id as the arrival
    order, each event's lateness is the running event-time frontier
    minus its own timestamp (exact integer microseconds), bucketed into
    the delays a `withWatermark` would need to keep it. A bucket's
    cumulative share IS the fraction of data a watermark of that delay
    retains; the streaming queries in queries/streaming_q.py consume
    this to set their delays. One global running-max window over the
    arrival order (at 100 TB: per-partition frontiers merged, or the
    same profile per shard — the bucketing is map-side after the
    window)."""
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    us = ts_epoch_us("ts")
    late = load(spark, sf_dir, "events").select(
        F.floor((F.max(us).over(w) - us) / 60000000.0).cast("bigint").alias(
            "late_min"
        )
    )
    hist = late.groupBy(
        F.when(F.col("late_min") == 0, "0 (in order)")
        .when(F.col("late_min") < 5, "1-4 min")
        .when(F.col("late_min") < 30, "5-29 min")
        .when(F.col("late_min") < 120, "30-119 min")
        .otherwise("120+ min")
        .alias("lateness_bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = hist.agg(F.sum("n").alias("t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "lateness_bucket",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(F.col("n") / F.col("t").cast("double"), 6).alias("share"),
    )


@register(
    "events_sequence_chi2",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS src,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS dst
      FROM events
    ),
    obs AS (
      SELECT src, dst, count(*) AS o FROM pairs
      WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    margins AS (
      SELECT src, dst, o,
             sum(o) OVER (PARTITION BY src) AS row_tot,
             sum(o) OVER (PARTITION BY dst) AS col_tot,
             sum(o) OVER () AS n
      FROM obs
    ),
    terms AS (
      SELECT src, dst, o,
             round(row_tot * col_tot / CAST(n AS DOUBLE), 6) AS e
      FROM margins
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(o) AS BIGINT) AS n_pairs,
           CAST(round(CAST(round(sum(round(pow(o - e, 2) / e, 8)), 8)
                           AS DECIMAL(38,8)), 6) AS DOUBLE) AS chi2,
           CAST((count(DISTINCT src) - 1) * (count(DISTINCT dst) - 1)
                AS BIGINT) AS dof
    FROM terms
    """,
    tags=("analytics", "stats", "chi2"),
)
def events_sequence_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between consecutive event types —
    'does the next action depend on the current one?', the significance
    companion to the Markov transition matrix: observed |types|² pair
    counts vs independence expectations from the margins, each (o−e)²/e
    term snapped to 8dp before the 6dp total. One user_id-keyed lead()
    window builds pairs (the same shuffle the Markov family pays); the
    contingency table and margins are |types|²-bounded windows."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    obs = pairs.where(F.col("dst").isNotNull()).groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("o")
    )
    wr = Window.partitionBy("src")
    wc = Window.partitionBy("dst")
    wn = Window.partitionBy(F.lit(1))
    terms = obs.select(
        "src", "dst", "o",
        F.round(
            F.sum("o").over(wr) * F.sum("o").over(wc)
            / F.sum("o").over(wn).cast("double"),
            6,
        ).alias("e"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("o").cast("bigint").alias("n_pairs"),
        # 8dp-grid summands → snap the sum to the grid, round to 6 in
        # DECIMAL (tie-proof; see users_kaplan_meier).
        F.round(
            F.round(
                F.sum(
                    F.round(F.pow(F.col("o") - F.col("e"), F.lit(2)) / F.col("e"), 8)
                ),
                8,
            ).cast("decimal(38,8)"),
            6,
        ).cast("double").alias("chi2"),
        (
            (F.countDistinct("src") - 1) * (F.countDistinct("dst") - 1)
        ).cast("bigint").alias("dof"),
    )


@register(
    "events_power_analysis",
    oracle="""
    WITH arm AS (
      SELECT CAST(round(var_samp(value), 6) AS DOUBLE) AS var_v,
             round(avg(value), 6) AS mean_v,
             count(*) AS n
      FROM events WHERE event_type = 'purchase'
    ),
    mde AS (
      SELECT var_v, mean_v, n, round(0.05 * mean_v, 6) AS d
      FROM arm
    )
    SELECT CAST(n AS BIGINT) AS n_current,
           mean_v AS mean_value,
           var_v AS variance,
           d AS min_detectable_diff,
           CAST(ceil(2.0 * pow(1.959964 + 0.841621, 2) * var_v / (d * d))
                AS BIGINT) AS n_required_per_arm,
           CAST(ceil(2.0 * pow(1.959964 + 0.841621, 2) * var_v / (d * d))
                  <= n AS BOOLEAN) AS currently_powered
    FROM mde
    """,
    tags=("analytics", "abtest", "power"),
)
def events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size / power analysis (two-sample normal
    approximation): n per arm = 2(z_{α/2}+z_β)²σ²/d² for α=0.05,
    power=0.8 and a 5%-of-mean minimum detectable effect, with σ²
    measured from the live metric — the planning step before
    events_welch_ttest reads the result. One map-combined aggregate;
    the z constants are literals (1.959964, 0.841621 — the standard
    normal quantiles both engines share as text). Completes the
    experimentation toolkit: power → CUPED → Welch → conformal."""
    arm = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .agg(
            F.round(F.var_samp("value"), 6).cast("double").alias("var_v"),
            F.round(F.avg("value"), 6).alias("mean_v"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    d = F.round(0.05 * F.col("mean_v"), 6)
    n_req = F.ceil(
        2.0 * F.pow(F.lit(1.959964 + 0.841621), F.lit(2)) * F.col("var_v")
        / (d * d)
    ).cast("bigint")
    return arm.select(
        F.col("n").cast("bigint").alias("n_current"),
        F.col("mean_v").alias("mean_value"),
        F.col("var_v").alias("variance"),
        d.alias("min_detectable_diff"),
        n_req.alias("n_required_per_arm"),
        (n_req <= F.col("n")).alias("currently_powered"),
    )
