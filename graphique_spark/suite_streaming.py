"""Event/streaming queries over the ``events`` table.

The window transformations are the *same functions* used on readStream
frames (graphique_spark.streaming); here they run in batch mode so the
DuckDB oracle can verify the event-time semantics. Session windows are
checked against a lag/cumsum SQL sessionization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphique_spark import streaming
from graphique_spark.suite import fround, query, table

# events.ts is TIMESTAMP(NANOS) in parquet; the engine reads it as long ns
# and converts to µs timestamps (sources.normalize_nanos). The oracle casts
# DuckDB's TIMESTAMP_NS to µs TIMESTAMP for identical values.


@query(
    "stream_tumbling_window",
    """
    SELECT CAST(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS VARCHAR)
             AS window_start,
           event_type,
           count(*) AS n,
           floor(sum(value) * 100 + 0.5) / 100 AS total,
           floor(avg(value) * 10000 + 0.5) / 10000 AS mean
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark, sf_dir):
    events = table(spark, sf_dir, "events").df
    out = streaming.tumbling_counts(
        events, ts="ts", duration="1 hour", by=["event_type"], value="value"
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        fround(F.col("total"), 2).alias("total"),
        fround(F.col("mean"), 4).alias("mean"),
    )


@query(
    "stream_sliding_window",
    """
    WITH slides AS (
      SELECT CAST(time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS slot, ts
      FROM events
    ), expanded AS (
      SELECT slot AS window_start, ts FROM slides
      UNION ALL
      SELECT slot - INTERVAL '30 minutes', ts FROM slides
    )
    SELECT CAST(window_start AS VARCHAR) AS window_start, count(*) AS n
    FROM expanded GROUP BY 1
    """,
)
def stream_sliding_window(spark, sf_dir):
    """1-hour windows sliding every 30 minutes: each event lands in two
    windows (the SQL oracle expands explicitly)."""
    events = table(spark, sf_dir, "events").df
    out = streaming.sliding_counts(events, duration="1 hour", slide="30 minutes")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"), "n"
    )


@query(
    "stream_sessionize",
    """
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def stream_sessionize(spark, sf_dir):
    """Gap-based sessions (30 min): session_window start equals the first
    event time; the oracle reproduces it with lag/cumsum."""
    events = table(spark, sf_dir, "events").df
    out = streaming.session_windows(events, gap="30 minutes", by=["user_id"])
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.col("n_events"),
    )


@query(
    "stream_user_activity",
    """
    SELECT user_id,
           count(*) AS events_n,
           count(DISTINCT event_type) AS kinds,
           floor(sum(value) * 100 + 0.5) / 100 AS total_value,
           strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS first_seen,
           strftime(max(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS last_seen
    FROM events GROUP BY user_id
    """,
)
def stream_user_activity(spark, sf_dir):
    from graphique_spark.inputs import Agg

    events = table(spark, sf_dir, "events")
    return (
        events.group(
            by=["user_id"],
            counts="events_n",
            aggregate=[
                Agg("nunique", "event_type", alias="kinds"),
                Agg("sum", "value", alias="total_value"),
                Agg("min", "ts", alias="first_seen"),
                Agg("max", "ts", alias="last_seen"),
            ],
        )
        .project(
            {
                "total_value": fround(F.col("total_value"), 2),
                "first_seen": F.date_format("first_seen", "yyyy-MM-dd HH:mm:ss"),
                "last_seen": F.date_format("last_seen", "yyyy-MM-dd HH:mm:ss"),
            }
        )
        .select("user_id", "events_n", "kinds", "total_value", "first_seen", "last_seen")
        .df
    )


@query(
    "stream_interval_join",
    """
    WITH c AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase')
    SELECT c.user_id % 5 AS cohort,
           count(*) AS pairs,
           count(DISTINCT c.event_id) AS clicks_with_purchase
    FROM c JOIN p ON c.user_id = p.user_id
      AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    GROUP BY 1
    """,
)
def stream_interval_join(spark, sf_dir):
    """Stream-stream interval join (click -> purchase attribution within an
    hour, per user) run in batch mode; the same `streaming.interval_join`
    attaches watermarks on a readStream pair (state bounded by watermark +
    interval, see tests/test_streaming.py parity test)."""
    events = table(spark, sf_dir, "events").df
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    joined = streaming.interval_join(
        clicks, purchases, keys=["user_id"], lower="0 seconds", upper="1 hour"
    )
    return joined.groupBy((F.col("user_id") % 5).alias("cohort")).agg(
        F.count(F.lit(1)).alias("pairs"),
        F.countDistinct("event_id").alias("clicks_with_purchase"),
    )


@query(
    "stream_upsert_totals",
    """
    SELECT user_id % 8 AS cohort, user_id,
           count(*) AS events_n,
           floor(sum(value) * 100 + 0.5) / 100 AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_upsert_totals(spark, sf_dir):
    """True end-to-end streaming upsert: a 3-file landing zone streamed
    with maxFilesPerTrigger=1 (3 micro-batches), per-user running totals
    in update output mode, merged into hive-partitioned parquet by
    ``upsert_sink`` (each batch anti-joins out stale rows and dynamically
    overwrites only the partitions it touched). The final table must equal
    the one-shot batch aggregate over all events — exactly-once across
    batch boundaries is the thing being proven."""
    import os
    import shutil
    import tempfile

    workdir = os.path.join(tempfile.gettempdir(), "graphique_spark_upsert_q")
    shutil.rmtree(workdir, ignore_errors=True)
    events = table(spark, sf_dir, "events").df
    src = f"{workdir}/src"
    # one scan, one parallel job: three hive dirs (__b=0..2) each holding
    # one file — vs three serial full-scan coalesce(1) writes
    events.withColumn("__b", (F.col("event_id") % 3).cast("int")).repartition(
        3, "__b"
    ).write.partitionBy("__b").mode("overwrite").parquet(src)
    schema = (
        events.schema.simpleString().replace("struct<", "").rstrip(">").replace(":", " ")
        + ", __b int"
    )
    stream = streaming.read_event_stream(spark, src, schema=schema, max_files_per_trigger=1)
    totals = stream.groupBy(
        (F.col("user_id") % 8).alias("cohort"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("events_n"), F.sum("value").alias("value_sum"))
    # the state-store partition count is fixed by shuffle.partitions at the
    # checkpoint's first batch; 8 partitions fit this keyspace and cut the
    # per-batch state-commit file churn 4x (fresh checkpoint every run, so
    # the temporary setting can't corrupt resumed state)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = streaming.upsert_sink(
            totals,
            dest=f"{workdir}/table",
            keys=["cohort", "user_id"],
            checkpoint=f"{workdir}/ckpt",
            partition_col="cohort",
            available_now=True,
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.read.parquet(f"{workdir}/table").select(
        F.col("cohort").cast("long").alias("cohort"),
        "user_id",
        "events_n",
        (F.floor(F.col("value_sum") * 100 + F.lit(0.5)) / 100).alias("total_value"),
    )


@query(
    "stream_cdc_snapshot",
    """
    SELECT o_orderkey % 8 AS cohort, o_orderkey,
           floor(CASE WHEN o_orderkey % 14 = 0 THEN o_totalprice + 5000.0
                      WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
                      ELSE o_totalprice END * 100 + 0.5) / 100 AS v
    FROM orders
    WHERE o_orderkey < 3000
      AND NOT (o_orderkey % 7 = 0 AND o_orderkey % 14 <> 0)
    """,
)
def stream_cdc_snapshot(spark, sf_dir):
    """End-to-end streaming CDC apply: a 3-batch op log (inserts, then
    updates + deletes, then re-inserts of some deleted keys) streamed
    through ``cdc_sink`` into a partitioned parquet snapshot. The final
    table must equal the one-shot SQL collapse of the whole log —
    batch-boundary resurrection/tombstone semantics are the thing being
    proven. Landing files get explicit mtimes so the file source's
    batch order is deterministic."""
    import glob
    import os
    import shutil
    import tempfile

    workdir = os.path.join(tempfile.gettempdir(), "graphique_spark_cdc_q")
    shutil.rmtree(workdir, ignore_errors=True)
    src = f"{workdir}/src"
    orders = table(spark, sf_dir, "orders").df.where(F.col("o_orderkey") < 3000)
    key = F.col("o_orderkey")
    base_cols = [
        (key % 8).alias("cohort"),
        key.alias("o_orderkey"),
        F.col("o_totalprice").alias("v"),
    ]
    batches = [
        orders.select(*base_cols, F.lit(1).alias("seq"), F.lit("insert").alias("op")),
        orders.where(key % 5 == 0)
        .select(
            base_cols[0],
            base_cols[1],
            (F.col("o_totalprice") + 1000.0).alias("v"),
            F.lit(2).alias("seq"),
            F.lit("update").alias("op"),
        )
        .unionByName(
            orders.where(key % 7 == 0).select(
                base_cols[0],
                base_cols[1],
                F.lit(None).cast("double").alias("v"),
                F.lit(3).alias("seq"),
                F.lit("delete").alias("op"),
            )
        ),
        orders.where(key % 14 == 0).select(
            base_cols[0],
            base_cols[1],
            (F.col("o_totalprice") + 5000.0).alias("v"),
            F.lit(4).alias("seq"),
            F.lit("insert").alias("op"),
        ),
    ]
    for i, b in enumerate(batches):
        before = set(glob.glob(f"{src}/*.parquet"))
        b.coalesce(1).write.mode("append").parquet(src)
        for f in set(glob.glob(f"{src}/*.parquet")) - before:
            os.utime(f, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    schema = "cohort long, o_orderkey long, v double, seq int, op string"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = streaming.cdc_sink(
        stream,
        dest=f"{workdir}/snap",
        keys=["cohort", "o_orderkey"],
        checkpoint=f"{workdir}/ckpt",
        partition_col="cohort",
        available_now=True,
    )
    q.awaitTermination(300)
    return spark.read.parquet(f"{workdir}/snap").select(
        F.col("cohort").cast("long").alias("cohort"),
        "o_orderkey",
        (F.floor(F.col("v") * 100 + F.lit(0.5)) / 100).alias("v"),
    )


@query(
    "stream_windowed_rollup",
    """
    SELECT CAST(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS VARCHAR)
             AS window_start,
           event_type,
           count(*) AS n,
           floor(sum(value) * 100 + 0.5) / 100 AS value_sum
    FROM events GROUP BY 1, 2
    """,
)
def stream_windowed_rollup(spark, sf_dir):
    """Two-level rollup (5 min -> 1 hour, chained stateful operators in
    streaming mode): since 5 min divides 1 hour exactly, the rollup must
    equal single-level hourly aggregation — which is what the oracle
    computes directly."""
    events = table(spark, sf_dir, "events").df
    out = streaming.windowed_rollup(
        events, ts="ts", fine="5 minutes", coarse="1 hour",
        by=["event_type"], value="value",
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        fround(F.col("value_sum"), 2).alias("value_sum"),
    )


@query(
    "stream_join_windowed",
    """
    WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
         j AS (SELECT c.user_id, c.ts
               FROM c JOIN p ON c.user_id = p.user_id
                 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS VARCHAR) AS window_start,
           user_id % 5 AS cohort,
           count(*) AS pairs
    FROM j GROUP BY 1, 2
    """,
)
def stream_join_windowed(spark, sf_dir):
    """Chained stateful composition: stream-stream interval join (click ->
    purchase within an hour, per user) feeding a tumbling hourly windowed
    count — run in batch mode with the identical plan; the STREAMING
    parity of this chain (join-delayed output watermark, exclusive of the
    exact boundary) is pinned by
    tests/test_differential.py::test_streaming_interval_join_then_window_parity
    and its deterministic companion."""
    events = table(spark, sf_dir, "events").df
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    joined = streaming.interval_join(
        clicks, purchases, keys=["user_id"], lower="0 seconds", upper="1 hour"
    ).withColumn("cohort", F.col("user_id") % 5)
    out = streaming.tumbling_counts(joined, ts="ts", duration="1 hour", by=["cohort"])
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "cohort",
        F.col("n").alias("pairs"),
    )
