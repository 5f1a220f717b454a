package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Time-series operators over the events table (SURVEY.md §2.B
  * "Time-series / streaming semantics").
  *
  * These are the batch-equivalent forms; `graft.streaming.StreamingDemo`
  * runs the tumbling/session/dedup shapes as a real Structured Streaming
  * job with watermarks, proving the batch/streaming equivalence. At
  * 100 TB each of these is one shuffle (by window bucket or user_id);
  * sliding windows multiply rows by windows-per-slide (4× here) before
  * the shuffle, exactly like Spark's streaming window operator.
  */
object TimeSeries {

  /** 1-hour tumbling window counts + exact value sums per event type. */
  def tsTumbling(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("decimal(18,2)").cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws", "event_type")

  val tsTumblingOracle: String =
    """SELECT DATE_TRUNC('hour', ts) AS ws, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin

  /** 1-hour window sliding every 15 minutes: each event lands in exactly
    * four windows. The oracle reproduces Spark's epoch-aligned window
    * starts by unnesting the four 15-minute offsets. */
  def tsSliding(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("decimal(18,2)").cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("n"), col("sum_value"))
      .orderBy("ws")

  val tsSlidingOracle: String =
    """SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000 - CAST(k AS BIGINT) * 900000000) AS ws,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) offsets(k)
      |GROUP BY 1 ORDER BY ws""".stripMargin

  /** `ts_tumbling` executed as a REAL Structured Streaming job: the
    * events file is staged as two parquet files fed one per micro-batch
    * (`maxFilesPerTrigger=1`) through `readStream` → watermark → windowed
    * aggregation → memory sink, so windowed state genuinely carries
    * across triggers. Complete output mode keeps every window, making the
    * result equal to the batch form — the key shares `ts_tumbling`'s
    * DuckDB oracle. At scale the same plan runs from a Kafka/file-rate
    * source with a durable checkpoint; state shuffles by (window,
    * event_type) exactly like the batch shuffle.
    */
  def tsTumblingStream(spark: SparkSession, sfDir: String): DataFrame = {
    enableNanosAsLong(spark)
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // The file stream source requires a DIRECTORY (round-1 lesson): stage
    // the single events file as two splits so there are ≥2 micro-batches.
    val stageDir = s"/tmp/graft_stream_in/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/tumbling"
    spark.read.parquet(path).repartition(2)
      .write.mode("overwrite").parquet(stageDir)
    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
      .withColumn("ts", eventsTsFromNanos)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("decimal(18,2)").cast("double").as("sum_value"))
    val sink = "graft_ts_tumbling_stream"
    val q = agg.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sink)
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws", "event_type")
  }

  /** Per-user session windows with a 30-minute inactivity gap —
    * gaps-and-islands: flag gap starts with lag(), running-sum the flags
    * into session ids, aggregate per session. */
  def tsSession(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, sfDir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(run))
      .groupBy("user_id", "sess_id")
      .agg(min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"))
      .select("user_id", "session_start", "n_events", "duration_us")
      .orderBy("user_id", "session_start")
  }

  val tsSessionOracle: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts, 1) OVER w IS NULL
      |           OR DATE_DIFF('microsecond', LAG(ts, 1) OVER w, ts) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessioned AS (
      |  SELECT user_id, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
      |  DATE_DIFF('microsecond', MIN(ts), MAX(ts)) AS duration_us
      |FROM sessioned GROUP BY user_id, sess_id
      |ORDER BY user_id, session_start""".stripMargin

  /** Replay dedup (batch analog of dropDuplicatesWithinWatermark): the
    * input is doubled to simulate at-least-once replay, then exactly one
    * row per event_id survives, keeping the earliest timestamp. */
  def tsDedupWatermark(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir).select("event_id", "ts", "user_id", "event_type")
    val w = Window.partitionBy("event_id").orderBy("ts", "user_id")
    ev.unionAll(ev)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "ts", "user_id", "event_type")
      .orderBy("event_id")
  }

  val tsDedupWatermarkOracle: String =
    """SELECT event_id, ts, user_id, event_type FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
      |  FROM (SELECT event_id, ts, user_id, event_type FROM events
      |        UNION ALL
      |        SELECT event_id, ts, user_id, event_type FROM events))
      |WHERE rn = 1 ORDER BY event_id""".stripMargin

  /** Watermark-style late-data accounting: events more than 10 minutes
    * behind their user's max timestamp are classified late. */
  def tsLateData(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    events(spark, sfDir)
      .withColumn("max_ts", max(col("ts")).over(w))
      .withColumn("is_late",
        (unix_micros(col("max_ts")) - unix_micros(col("ts")) > 600L * 1000000L).cast("int"))
      .groupBy("event_type")
      .agg(sum(col("is_late")).as("n_late"),
        sum(lit(1) - col("is_late")).as("n_ontime"))
      .orderBy("event_type")
  }

  val tsLateDataOracle: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(DATE_DIFF('microsecond', ts, max_ts) > 600000000 AS INT)) AS BIGINT) AS n_late,
      |  CAST(SUM(1 - CAST(DATE_DIFF('microsecond', ts, max_ts) > 600000000 AS INT)) AS BIGINT) AS n_ontime
      |FROM (SELECT event_type, ts, MAX(ts) OVER (PARTITION BY user_id) AS max_ts FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_tumbling" -> (tsTumbling _),
    "ts_tumbling_stream" -> (tsTumblingStream _),
    "ts_sliding" -> (tsSliding _),
    "ts_session" -> (tsSession _),
    "ts_dedup_watermark" -> (tsDedupWatermark _),
    "ts_late_data" -> (tsLateData _))

  val oracle: Map[String, String] = Map(
    "ts_tumbling" -> tsTumblingOracle,
    // the streaming execution must produce exactly the batch result
    "ts_tumbling_stream" -> tsTumblingOracle,
    "ts_sliding" -> tsSlidingOracle,
    "ts_session" -> tsSessionOracle,
    "ts_dedup_watermark" -> tsDedupWatermarkOracle,
    "ts_late_data" -> tsLateDataOracle)
}
