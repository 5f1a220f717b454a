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

  /** Per-process staging tag: two concurrent runs against the same sfDir
    * (e.g. bench + verify in separate JVMs) must not overwrite each
    * other's file-stream staging dirs or memory-sink names mid-stream.
    * Per-JVM (not per-call) so repeated in-process calls reuse one dir. */
  private val runTag: String = java.util.UUID.randomUUID().toString.take(8)

  /** Staged dirs already written this process: a second stream over the
    * same (sfDir, name, nCopies) — e.g. the two sides of the
    * stream-stream self-join — reuses the files instead of re-writing
    * them (the source parquet is immutable, so the bytes are identical
    * either way; only the redundant staging write is saved). */
  private val stagedDirs = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int), org.apache.spark.sql.types.StructType]
  graft.util.ProcessMemo.register("time_series.stagedDirs", stagedDirs)

  /** Stage the events file as `nCopies` full copies (each one micro-batch
    * under `maxFilesPerTrigger=1`) under a per-process scratch dir and
    * open it as a file-stream with the µs-truncated `ts`. Each call
    * returns its OWN readStream (an independent source with its own
    * micro-batch schedule); staging is shared per (sfDir, name). */
  private[graft] def stagedEventStream(spark: SparkSession, sfDir: String,
      name: String, nCopies: Int): DataFrame = {
    enableNanosAsLong(spark)
    val path = s"$sfDir/events.parquet"
    // nCopies is part of the PATH, not just the memo key: same-name
    // calls with different copy counts must never serve each other's
    // staged files (a 1-copy dir reused by a 2-copy consumer would
    // silently halve its micro-batches)
    val stageDir =
      s"/tmp/graft_stream_in/$runTag/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/$name-x$nCopies"
    // staging copies are per-process scratch: clean the whole tagged root
    // on JVM exit so runs don't accumulate copies of events.parquet in /tmp
    graft.util.Scratch.deleteOnExit(s"/tmp/graft_stream_in/$runTag")
    // staging is a SIDE-EFFECTING write: TrieMap.getOrElseUpdate may run
    // its thunk in two contending threads (benign for the value caches,
    // NOT for two overwrite jobs racing on one directory — parallel
    // suites can start two streaming keys at once), so the whole
    // check-and-stage is serialized
    val schema = stagedDirs.synchronized {
      stagedDirs.getOrElseUpdate((sfDir, name, nCopies), {
        val src = spark.read.parquet(path)
        if (nCopies == 1) src.repartition(2).write.mode("overwrite").parquet(stageDir)
        else {
          src.coalesce(1).write.mode("overwrite").parquet(stageDir)
          (2 to nCopies).foreach(_ => src.coalesce(1).write.mode("append").parquet(stageDir))
        }
        src.schema
      })
    }
    graft.sources.Tables.normalizeEventsTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stageDir))
  }

  /** Stage the events table TIME-ORDERED as three sequenced files —
    * first half, second half (split at the (min+max)/2 micros midpoint;
    * equal timestamps always land in one file), then a single far-future
    * SENTINEL row (user_id = -1, ts = max + 365 days) — with explicitly
    * increasing modification times so `maxFilesPerTrigger=1` feeds them
    * oldest-first, one per micro-batch. Two guarantees the event-time-
    * timeout key needs fall out:
    *  - NO LATE ROWS: batch k+1's min ts ≥ batch k's max ts, so the
    *    post-batch watermark (max − delay) never drops a later row, and
    *    `setTimeoutTimestamp` (last + gap > current batch max ≥
    *    watermark + delay) can never be behind the watermark;
    *  - GUARANTEED FLUSH: the sentinel advances the final watermark past
    *    every real user's last event + gap, so every open session's
    *    timeout provably fires (Spark runs the extra no-data batch when
    *    the watermark advances under an event-time timeout) before
    *    processAllAvailable returns.
    * Files are written normalized (µs TimestampType ts), so the stream
    * needs no re-normalization. */
  private[graft] def stagedOrderedEventStream(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val stageDir =
      s"/tmp/graft_stream_in/$runTag/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/$name-ordered"
    graft.util.Scratch.deleteOnExit(s"/tmp/graft_stream_in/$runTag")
    val schema = stagedDirs.synchronized {
      stagedDirs.getOrElseUpdate((sfDir, name, 3), {
        val src = events(spark, sfDir)
        val Array(b) = src
          .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).collect()
        val (lo, hi) = (b.getLong(0), b.getLong(1))
        val mid = lo + (hi - lo) / 2
        val sentinel = spark.range(1).select(src.schema.fields.map { f =>
          f.name match {
            case "ts" =>
              timestamp_micros(lit(hi + 365L * 86400L * 1000000L)).as("ts")
            case "user_id" => lit(-1L).cast(f.dataType).as("user_id")
            case other => lit(null).cast(f.dataType).as(other)
          }
        }: _*)
        val splits = Seq(
          src.filter(unix_micros(col("ts")) <= mid),
          src.filter(unix_micros(col("ts")) > mid),
          sentinel)
        Files.createDirectories(Paths.get(stageDir))
        splits.zipWithIndex.foreach { case (df, i) =>
          val tmp = s"$stageDir.part$i"
          df.coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".parquet"))
            .getOrElse(sys.error(s"no parquet part written under $tmp"))
          val dest = Paths.get(stageDir, f"split_$i%03d.parquet")
          Files.move(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
          // explicit, strictly increasing mtimes: the file-stream source
          // lists oldest-first, and same-ms writes would make the feed
          // order (hence late-row filtering) nondeterministic
          Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
          graft.util.Scratch.deleteTree(tmp)
        }
        src.schema
      })
    }
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(stageDir)
  }

  /** Run a streaming frame to completion through a per-process memory
    * sink and return its rows as a fresh local frame.
    *
    * Hygiene (the round-4 bench finding): leaving each key's memory-sink
    * table registered for the rest of the session kept every earlier
    * streaming result + its state on the heap, inflating the
    * alphabetically-later bench keys 2–10×. The sink is driver-resident
    * by construction, so copying its rows out costs nothing extra — then
    * the view is dropped and the terminated query released IMMEDIATELY,
    * leaving the session as clean as before the key ran.
    *
    * Shuffle partitions: state-store instances = shuffle partitions, and
    * the session default (32) means 32 RocksDB/HDFS store lifecycles per
    * stateful operator for ~1k distinct keys — pure per-micro-batch
    * overhead at test scale. Streaming keys run at 4; the conf is
    * restored afterwards (the batch plan around the sink is unaffected:
    * it runs on the frame returned here).
    */
  /** Serializes the shuffle-partition override below: the conf is
    * SESSION-global, so two concurrent runToMemory calls (parallel suite
    * execution) could interleave set/restore and either run batch work
    * at 4 partitions or persist the temporary value as the "restored"
    * one. Queries on the returned frame run outside the lock. */
  private val runLock = new Object

  private[graft] def runToMemory(df: DataFrame, sink: String, mode: String,
      shufflePartitions: Int = 4): DataFrame = runLock.synchronized {
    val spark = df.sparkSession
    val name = s"${sink}_$runTag"
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    try {
      // explicit tmpfs checkpoint (r17 verdict task 4): the implicit temp
      // checkpoint puts every micro-batch's offset/commit/state fsyncs on
      // /tmp disk — the measured host-sensitivity amplifier of this block
      val q = df.writeStream.format("memory").queryName(name).outputMode(mode)
        .option("checkpointLocation", graft.util.Scratch.fastCheckpointDir(name))
        .start()
      try q.processAllAvailable() finally q.stop()
      val sinkTable = spark.table(name)
      val (rows, schema) = (sinkTable.collect(), sinkTable.schema)
      spark.catalog.dropTempView(name)
      spark.streams.resetTerminated() // release the terminated query refs
      // Slice the driver-resident sink rows by SIZE, not by default
      // parallelism: LocalTableScan's toRdd re-slices them across
      // defaultParallelism, so small results (the common case) paid
      // 32-task stages per consumer — but a blanket coalesce(1) then
      // serialized the map side of the final sort for the two keys
      // whose sink holds ~100k rows at sf0.1 (ts_session_stream,
      // ts_dedup_stream regressed 2-3× in the r18 mid-round bench).
      // ~8k rows per slice keeps both honest; the count is driver
      // data, so the plan stays deterministic per (key, dataset).
      val slices = math.min(spark.sparkContext.defaultParallelism.toLong,
        rows.length / 8192L + 1).toInt
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(slices)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

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

  /** `ts_sliding` executed as a REAL Structured Streaming job — the
    * one windowed-state shape the streaming family didn't yet cover:
    * OVERLAPPING windows, where each event updates FOUR window states
    * (1 h window / 15 min slide) instead of one and the state store
    * holds window-count × group-count entries. Same staged two-split
    * source and complete-mode memory sink as `ts_tumbling_stream`;
    * state shuffles by window exactly like the batch shuffle, so the
    * result equals the batch form and the key SHARES `ts_sliding`'s
    * oracle (the `ts_session_stream` pattern). NOTE on the watermark:
    * in COMPLETE mode it is declared but INERT — no state is evicted,
    * which is precisely why every window survives to equal the batch
    * result. The production Kafka-fed dashboard runs the same plan in
    * append/update mode, where this watermark drives eviction and
    * closed windows emit once (review finding: say what the graded
    * mode actually does). */
  def tsSlidingStream(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = stagedEventStream(spark, sfDir, "events2split", 1)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("decimal(18,2)").cast("double").as("sum_value"))
    runToMemory(agg, "graft_ts_sliding_stream", "complete")
      .select(col("w.start").as("ws"), col("n"), col("sum_value"))
      .orderBy("ws")
  }

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
    // The file stream source requires a DIRECTORY (round-1 lesson): stage
    // the single events file as two splits so there are ≥2 micro-batches.
    val agg = stagedEventStream(spark, sfDir, "events2split", 1)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("decimal(18,2)").cast("double").as("sum_value"))
    runToMemory(agg, "graft_ts_tumbling_stream", "complete")
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws", "event_type")
  }

  /** `ts_session` executed as a REAL Structured Streaming job via the
    * native `session_window` operator: per-user sessions with a
    * 30-minute gap, state merged across micro-batches, complete output
    * mode. Session-window semantics (an event exactly at the gap
    * boundary MERGES — windows are [start, end) and a touching window
    * extends the session) coincide with the batch gaps-and-islands form
    * (`new_sess` iff gap STRICTLY exceeds 30 min), so the key shares
    * `ts_session`'s DuckDB oracle: session_start = min(ts) per merged
    * window. At scale this is the plan you'd run from Kafka — state
    * shuffles by (user, session) with watermark-driven eviction.
    */
  def tsSessionStream(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = stagedEventStream(spark, sfDir, "events2split", 1)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    // 16 state partitions: the session-window store holds ~95k rows at
    // sf0.1 (ts_dedup_stream's state-volume sizing rule, not a core
    // count — see the runToMemory scaladoc)
    runToMemory(agg, "graft_ts_session_stream", "complete", shufflePartitions = 16)
      .select(col("user_id"), col("mn").as("session_start"), col("n_events"),
        (unix_micros(col("mx")) - unix_micros(col("mn"))).as("duration_us"))
      .orderBy("user_id", "session_start")
  }

  /** `ts_dedup_watermark` executed as a REAL Structured Streaming job:
    * the events file is staged TWICE (replay!), fed one copy per
    * micro-batch through `dropDuplicatesWithinWatermark` on event_id.
    * Batch 2 is the at-least-once replay: rows still inside the
    * watermark hit dedup state, rows behind it are dropped as late —
    * either way exactly one row per event_id survives, and because
    * replayed rows are byte-identical the survivor set equals the batch
    * form regardless of arrival order. Append mode: emitted once, never
    * revised — the streaming contract the batch key models.
    */
  def tsDedupStream(spark: SparkSession, sfDir: String): DataFrame = {
    val dedup = stagedEventStream(spark, sfDir, "dedup", 2)
      .select("event_id", "ts", "user_id", "event_type")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    // dedup state is per-EVENT (one entry per event_id, ~|events| rows),
    // not per-user — give it more stores than the 1k-key aggregations
    runToMemory(dedup, "graft_ts_dedup_stream", "append", shufflePartitions = 16)
      .select("event_id", "ts", "user_id", "event_type")
      .orderBy("event_id")
  }

  /** ARBITRARY-state streaming — the surface beyond built-in stateful
    * ops (windowed agg / session_window / dropDuplicates): a per-user
    * running profile (event count, first/last seen) kept in a CUSTOM
    * state object via `flatMapGroupsWithState`, updated across real
    * micro-batches (the staged events file arrives as two splits) and
    * emitted in Update mode after each batch.
    *
    * Determinism: the state folds are commutative+associative (count,
    * min, max), so arrival order across and within batches cannot change
    * the final profile; the update-mode sink then holds one row per
    * (user, batch-with-changes) and the FINAL profile per user is
    * recovered by max/min/max — each component is monotone over batches.
    * The oracle is the plain batch aggregate. NoTimeout keeps the run
    * deterministic (processing-time timeouts depend on the wall clock);
    * at scale the same code carries a TTL via `GroupStateTimeout` and a
    * durable checkpoint, and state shuffles by user_id exactly like the
    * batch groupBy. */
  def tsStatefulStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val updates = stagedEventStream(spark, sfDir, "events2split", 1)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[(Long, java.sql.Timestamp, java.sql.Timestamp)]) =>
          var (n, mn, mx) = state.getOption.getOrElse(
            (0L, null: java.sql.Timestamp, null: java.sql.Timestamp))
          rows.foreach { case (_, ts) =>
            n += 1
            if (mn == null || ts.compareTo(mn) < 0) mn = ts
            if (mx == null || ts.compareTo(mx) > 0) mx = ts
          }
          state.update((n, mn, mx))
          Iterator((uid, n, mn, mx))
      }
      .toDF("user_id", "n_events", "first_ts", "last_ts")
    runToMemory(updates, "graft_ts_stateful_stream", "update")
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"),
        min(col("first_ts")).as("first_ts"),
        max(col("last_ts")).as("last_ts"))
      .orderBy("user_id")
  }

  /** EVENT-TIME-TIMEOUT SESSIONS — the last unexercised public streaming
    * API shape (r13 verdict task 7): per-user sessions kept as ARBITRARY
    * state in `flatMapGroupsWithState` and emitted in Append mode either
    * when a later event's gap exceeds 30 minutes (in-fold close) or when
    * the event-time watermark passes last-event + 30 minutes
    * (`GroupStateTimeout.EventTimeTimeout` — processing-time-free, so
    * the run is wall-clock independent). This is sessionization the way
    * you write it when `session_window` can't express the state (e.g.
    * carrying custom per-session payloads): the state object IS the open
    * session.
    *
    * Batch equivalence (why this shares `ts_session`'s oracle): the
    * staged feed is time-ordered with a far-future sentinel
    * ([[stagedOrderedEventStream]]), so (a) no row is ever late-dropped,
    * (b) a session closed by timeout can never see a continuing event
    * afterwards — any later event is ≥ the watermark + delay that fired
    * the timeout, hence > gap beyond the session's last event — and
    * (c) the sentinel forces every remaining open session's timeout to
    * fire before the stream drains. Emitted sessions are therefore
    * exactly the batch gaps-and-islands sessions (strict `> gap` split,
    * matching `session_window`'s touching-merges boundary); the sentinel
    * user (-1) never emits (its own timeout stays beyond the final
    * watermark) and is filtered defensively. Within a batch the fold
    * sorts the group's rows by ts, and across batches the ordered feed
    * preserves time order, so the fold IS the batch scan. At scale this
    * runs from Kafka with a real delay: state shuffles by user_id, the
    * store holds one open session per active user, and the watermark —
    * not a driver — retires idle users' state. */
  def tsTimeoutSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val GapUs = 1800L * 1000000L
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val sessions = stagedOrderedEventStream(spark, sfDir, "events_timeout")
      .select(col("user_id"), col("ts"))
      .withWatermark("ts", "10 minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[(java.sql.Timestamp, java.sql.Timestamp, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is closed
            val (start, last, n) = state.get
            state.remove()
            Iterator((uid, start, n, us(last) - us(start)))
          } else {
            val sorted = rows.map(_._2).toArray.sortBy(us)
            var closed = List.empty[(Long, java.sql.Timestamp, Long, Long)]
            var open = state.getOption
            sorted.foreach { t =>
              open match {
                case Some((start, last, n)) =>
                  if (us(t) - us(last) > GapUs) { // strict >: touching merges
                    closed ::= ((uid, start, n, us(last) - us(start)))
                    open = Some((t, t, 1L))
                  } else open = Some((start, t, n + 1))
                case None => open = Some((t, t, 1L))
              }
            }
            val st = open.get
            state.update(st)
            // ms floor truncates <1ms — harmless: the ordered feed keeps
            // any continuing event > watermark + 10 min, far beyond 1 ms
            state.setTimeoutTimestamp(us(st._2) / 1000L + 30L * 60L * 1000L)
            closed.reverseIterator
          }
      }
      .toDF("user_id", "session_start", "n_events", "duration_us")
    runToMemory(sessions, "graft_ts_timeout_sessions", "append")
      .filter(col("user_id") >= 0) // drop the watermark sentinel if it ever emitted
      .orderBy("user_id", "session_start")
  }

  /** STREAM-STATIC JOIN — the enrichment shape every streaming pipeline
    * runs (events arriving from a stream, dimension table at rest): the
    * staged event stream inner-joins the static customer dimension on
    * user_id, then aggregates revenue per (market segment, event type)
    * in complete mode. The static side is broadcast — a stream-static
    * join is STATELESS (each micro-batch joins against the dimension as
    * of that trigger; nothing carries across triggers), so at 100 TB
    * this costs one broadcast per executor and zero state store, which
    * is why enrichment belongs on the stream rather than as a later
    * batch join. The oracle is the plain batch join + aggregate: for a
    * deterministic static side they are equal by construction.
    */
  def tsStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val agg = stagedEventStream(spark, sfDir, "events2split", 1)
      .join(broadcast(cust), Seq("user_id")) // stream-static: stateless per micro-batch
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("decimal(18,2)").cast("double").as("sum_value"))
    runToMemory(agg, "graft_ts_stream_join", "complete")
      .select("segment", "event_type", "n", "sum_value")
      .orderBy("segment", "event_type")
  }

  /** STREAM-STREAM JOIN — the last big Structured Streaming surface
    * (beyond windowed agg / session / dedup / arbitrary state /
    * stream-static): clicks and purchases arrive as TWO independent
    * file streams (each fed in micro-batches), and each purchase joins
    * the same user's clicks from the PRECEDING HOUR. Both sides carry a
    * watermark and the join condition carries the event-time bound —
    * the canonical shape under which Spark can evict buffered rows once
    * the watermark passes `click_ts + 1h`. The watermark delay here
    * (120 days) exceeds the fixture's whole time span, so no state is
    * evicted and the append-mode result provably equals the batch join
    * (the oracle); at scale the SAME plan runs with a minutes-delay
    * watermark and bounded state — only the retention knob changes,
    * never the join logic. Per-side state shuffles by user_id, exactly
    * like the batch shuffle join.
    */
  def tsStreamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    // two INDEPENDENT stream sources (each its own micro-batch
    // schedule) over one shared staged copy — the staging memo saves
    // the second write; the join topology is identical
    val clicks = stagedEventStream(spark, sfDir, "events2split", 1)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "120 days")
    val purchases = stagedEventStream(spark, sfDir, "events2split", 1)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "120 days")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 1 hour"))
    // 16 state partitions (r19, the ts_dedup_stream sizing rule): the
    // join buffers ~40k rows/side here — at the blanket 4 instances each
    // store task single-threads ~10k keys' updates+evictions per
    // trigger (StreamDiag: addBatch 3.5-4.5 s/batch, commitMs ~2 s).
    // Target ≤ ~4k state rows per instance; production sizes this by
    // state volume, not core count.
    runToMemory(joined, "graft_ts_ss_join", "append", shufflePartitions = 16)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .orderBy("click_id", "purchase_id")
  }

  /** LEFT-OUTER STREAM-STREAM JOIN — the state-EVICTION half of the
    * streaming join story: an unmatched click can only be emitted (with
    * null purchase columns) once the global watermark proves no
    * matching purchase can still arrive, so this key exercises exactly
    * the machinery `ts_stream_stream_join`'s no-eviction inner join
    * does not. Determinism is engineered, not hoped for:
    *  - watermark delay = data span + 1h, so NO row is ever
    *    late-dropped regardless of micro-batch file order;
    *  - a sentinel click AND a sentinel purchase (non-joining user ids,
    *    filtered from the output) ride in a second staged file whose
    *    mtime is forced later, advancing BOTH sides' watermarks — and
    *    therefore the global (min-policy) watermark — past every real
    *    click's join window, so every unmatched click flushes before
    *    the stream drains.
    * The append-mode result then provably equals the batch LEFT JOIN
    * (the oracle). At 100 TB only the delay knob changes: state stays
    * bounded by span-of-interest, eviction logic identical. */
  def tsStreamOuterJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir).select("event_id", "user_id", "event_type", "ts")
    val Array(r) = ev.agg(min(col("ts")).cast("long").as("t0"),
      max(col("ts")).cast("long").as("t1")).collect()
    val (t0, t1) = (r.getLong(0), r.getLong(1))
    val delaySec = (t1 - t0) + 3600L
    val sentinelSec = t1 + delaySec + 2 * 3600L // > t1 + delay + 1h window
    val stageDir =
      s"/tmp/graft_stream_in/$runTag/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/events-outer"
    graft.util.Scratch.deleteOnExit(s"/tmp/graft_stream_in/$runTag")
    val schema = stagedDirs.synchronized {
      stagedDirs.getOrElseUpdate((sfDir, "events-outer", 1), {
        import spark.implicits._
        ev.coalesce(1).write.mode("overwrite").parquet(stageDir)
        val before = graft.util.Scratch.parquetFiles(stageDir)
        Seq((-1L, -1L, "click", sentinelSec), (-2L, -2L, "purchase", sentinelSec))
          .toDF("event_id", "user_id", "event_type", "sec")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("sec").cast("timestamp").as("ts"))
          .coalesce(1).write.mode("append").parquet(stageDir)
        // the sentinel file must be the LAST micro-batch: force its
        // mtime strictly past every data file's (FileStreamSource
        // schedules by modification time)
        val latest = before.map(java.nio.file.Files.getLastModifiedTime(_).toMillis).max
        graft.util.Scratch.parquetFiles(stageDir).filterNot(before.contains)
          .foreach(p => java.nio.file.Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(latest + 60000)))
        ev.schema
      })
    }
    def side = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir)
    val clicks = side.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", s"$delaySec seconds")
    val purchases = side.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", s"$delaySec seconds")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 1 hour"),
      "left_outer")
    // 16 state partitions — same sizing rule as ts_stream_stream_join
    // (this side also pays the final watermark-flush eviction scan,
    // which parallelizes with the instance count)
    runToMemory(joined, "graft_ts_so_join", "append", shufflePartitions = 16)
      .filter(col("user_id") >= 0) // drop the sentinel click's outer row
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .orderBy(col("click_id").asc, col("purchase_id").asc_nulls_first)
  }

  /** APPEND-MODE WATERMARKED WINDOW AGG — the window-FINALIZATION
    * semantics the complete-mode streaming keys never exercise: in
    * append mode a (window, event_type) group is emitted EXACTLY ONCE,
    * only after the global watermark passes its window end and its
    * state is evicted — the output is a stream of closed, immutable
    * window results (what a downstream sink can actually consume
    * incrementally at 100 TB, where re-emitting the whole result per
    * trigger is a non-starter). Determinism is engineered the
    * `ts_stream_outer_join` way: watermark delay = span + 1h (no late
    * drops under any file order), and a sentinel event in a final
    * mtime-forced micro-batch advances the watermark past every REAL
    * window's end while its own window stays open and unemitted — so
    * the append stream provably equals the batch tumbling aggregate
    * (`ts_tumbling`'s oracle, shared). */
  /** Shared sentinel-advanced append-mode source for the two
    * window-finalization keys: the events file staged as one
    * micro-batch plus a final mtime-forced sentinel batch whose
    * timestamp drags the watermark to t1 + 2h — past every REAL
    * window's end (tumbling ends ≤ t1 + 1h; sliding ends ≤ t1 + 1h
    * too, since a window containing an event starts at most 45 min
    * before its truncation), short of the sentinel's own windows.
    * Returns the raw readStream plus (t1, delaySec) so each key
    * declares its own watermark + windowing. */
  // `splits` stages the REAL events as that many event_id-hashed
  // micro-batches before the sentinel (mtimes strictly ordered, since
  // FileStreamSource schedules by modification time): splits = 1 is the
  // append-mode finalization source; splits = 2 feeds the UPDATE-mode
  // key, whose multi-emission semantics only show when a window
  // receives events in more than one trigger.
  private def appendModeSource(spark: SparkSession, sfDir: String,
      splits: Int = 1): (DataFrame, Long, Long) = {
    val ev = events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts", "value")
    val Array(r) = ev.agg(min(col("ts")).cast("long").as("t0"),
      max(col("ts")).cast("long").as("t1")).collect()
    val (t0, t1) = (r.getLong(0), r.getLong(1))
    val delaySec = (t1 - t0) + 3600L
    // watermark settles at sentinel − delay = t1 + 2h: past every real
    // window end (≤ t1 + 1h), short of the sentinel's own window end
    val sentinelSec = t1 + delaySec + 2 * 3600L
    val stageName = s"events-append-s$splits"
    val stageDir =
      s"/tmp/graft_stream_in/$runTag/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/$stageName"
    graft.util.Scratch.deleteOnExit(s"/tmp/graft_stream_in/$runTag")
    val schema = stagedDirs.synchronized {
      stagedDirs.getOrElseUpdate((sfDir, stageName, splits), {
        import spark.implicits._
        // write each split sequentially, then force strictly increasing
        // mtimes (batch i at base + i minutes) so the micro-batch order
        // is deterministic regardless of write timing granularity
        var before = Set.empty[java.nio.file.Path]
        // Option, not a 0L sentinel (r12 advice): an epoch-0 mtime is a
        // legitimate value, and an empty first split must not throw on
        // fresh.max — it simply has nothing to stamp.
        var baseMs: Option[Long] = None
        def stampBatch(step: Int): Unit = {
          val now = graft.util.Scratch.parquetFiles(stageDir).toSet
          val fresh = now -- before
          if (fresh.nonEmpty) {
            val base = baseMs.getOrElse {
              val b = fresh.map(java.nio.file.Files.getLastModifiedTime(_).toMillis).max
              baseMs = Some(b); b
            }
            fresh.foreach(p => java.nio.file.Files.setLastModifiedTime(p,
              java.nio.file.attribute.FileTime.fromMillis(base + step * 60000L)))
          }
          before = now
        }
        (0 until splits).foreach { i =>
          ev.filter(pmod(col("event_id"), lit(splits)) === i).coalesce(1)
            .write.mode(if (i == 0) "overwrite" else "append").parquet(stageDir)
          stampBatch(i)
        }
        // the sentinel must be the LAST micro-batch
        Seq((-1L, -1L, "view", sentinelSec, 0.0))
          .toDF("event_id", "user_id", "event_type", "sec", "value")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("sec").cast("timestamp").as("ts"), col("value"))
          .coalesce(1).write.mode("append").parquet(stageDir)
        stampBatch(splits)
        ev.schema
      })
    }
    (spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir), t1, delaySec)
  }

  def tsStreamAppendWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val (src, t1, delaySec) = appendModeSource(spark, sfDir)
    val agg = src
      .withWatermark("ts", s"$delaySec seconds")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("decimal(18,2)").cast("double").as("sum_value"))
    runToMemory(agg, "graft_ts_append_win", "append")
      // the sentinel's window never closes, so it never reaches the
      // sink; this guard only documents the invariant
      .filter(col("w.start").cast("long") <= t1)
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws", "event_type")
  }

  /** Append-mode stream must equal the batch tumbling aggregate. */
  val tsStreamAppendWindowOracle: String = tsTumblingOracle

  /** APPEND-MODE SLIDING WINDOWS (r10) — the production eviction shape
    * for OVERLAPPING windows, the one state pattern `ts_sliding_stream`
    * (complete mode, inert watermark) deliberately does not grade: each
    * event updates FOUR overlapping 1 h/15 min window states, and in
    * append mode each of those windows is emitted EXACTLY ONCE, when
    * the watermark passes ITS end and its state row is evicted — so
    * state held per trigger is bounded by (watermark horizon ÷ slide),
    * not by stream length, which is what makes overlapping windows
    * viable on an unbounded 100 TB stream. Same sentinel machinery as
    * [[tsStreamAppendWindow]]: every real window's end ≤ t1 + 1 h sits
    * behind the settled watermark (t1 + 2 h) so all close and emit;
    * the sentinel's own four windows never close and never reach the
    * sink. Result provably equals the batch `ts_sliding` (shared
    * oracle); the spec additionally pins exactly-once emission. */
  def tsSlidingStreamAppend(spark: SparkSession, sfDir: String): DataFrame = {
    val (src, t1, delaySec) = appendModeSource(spark, sfDir)
    val agg = src
      .withWatermark("ts", s"$delaySec seconds")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("decimal(18,2)").cast("double").as("sum_value"))
    runToMemory(agg, "graft_ts_sliding_append", "append")
      .filter(col("w.start").cast("long") <= t1)
      .select(col("w.start").as("ws"), col("n"), col("sum_value"))
      .orderBy("ws")
  }

  /** Append-mode sliding stream must equal the batch sliding windows. */
  val tsSlidingStreamAppendOracle: String = tsSlidingOracle

  /** UPDATE-MODE SLIDING WINDOWS (r11) — the third and last output
    * mode for overlapping windows, the low-latency dashboard shape the
    * complete (`ts_sliding_stream`, full re-emit per trigger) and
    * append (`ts_sliding_stream_append`, emit once on close) keys
    * bracket: in update mode a window RE-EMITS each trigger in which
    * its aggregate CHANGED, and the watermark still evicts its state
    * once passed — so a consumer sees per-window values converge live
    * while state stays bounded by the watermark horizon, not stream
    * length. The events are staged as TWO event_id-hashed micro-batches
    * (plus the sentinel that drags the watermark past every real
    * window), so most windows genuinely emit twice with growing counts
    * — the spec pins that multi-emission. The graded frame reduces the
    * update stream to its FINAL state per window: `n` strictly
    * increases across a window's successive emissions (update mode
    * only re-emits groups that received rows), so the max-n row IS the
    * last emission, and the result provably equals the batch
    * `ts_sliding` (shared oracle). The sentinel's own windows never
    * close but DO emit updates — filtered by window start ≤ t1, same
    * guard as the append keys. */
  /** The raw update stream (every emission, real windows only) — the
    * spec pins multi-emission on this; the graded key reduces it. */
  private[graft] def tsSlidingStreamUpdateRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val (src, t1, delaySec) = appendModeSource(spark, sfDir, splits = 2)
    val agg = src
      .withWatermark("ts", s"$delaySec seconds")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("decimal(18,2)").cast("double").as("sum_value"))
    runToMemory(agg, "graft_ts_sliding_update", "update")
      .filter(col("w.start").cast("long") <= t1)
      .select(col("w.start").as("ws"), col("n"), col("sum_value"))
  }

  def tsSlidingStreamUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    val wFinal = Window.partitionBy("ws").orderBy(col("n").desc)
    tsSlidingStreamUpdateRaw(spark, sfDir)
      .withColumn("rn", row_number().over(wFinal))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("ws")
  }

  /** The final per-window update state must equal the batch sliding
    * aggregate. */
  val tsSlidingStreamUpdateOracle: String = tsSlidingOracle

  val tsStreamOuterJoinOracle: String =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |  DATE_DIFF('microsecond', c.ts, p.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      |ORDER BY click_id, purchase_id NULLS FIRST""".stripMargin

  val tsStreamStreamJoinOracle: String =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |  DATE_DIFF('microsecond', c.ts, p.ts) AS gap_us
      |FROM events c JOIN events p ON c.user_id = p.user_id
      |  AND c.event_type = 'click' AND p.event_type = 'purchase'
      |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      |ORDER BY click_id, purchase_id""".stripMargin

  val tsStreamJoinOracle: String =
    """SELECT c_mktsegment AS segment, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1, 2 ORDER BY segment, event_type""".stripMargin

  val tsStatefulStreamOracle: String =
    """SELECT user_id, COUNT(*) AS n_events, MIN(ts) AS first_ts, MAX(ts) AS last_ts
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** FUNNEL analysis (the ClickHouse-windowFunnel / product-analytics
    * staple): how far does each user get through view → click →
    * purchase, where each stage must follow the previous one and the
    * whole path must complete within 24 hours of the first view?
    * Emitted as the funnel report: users reaching depth 0..3.
    *
    * Shape: three conditional-min aggregations (first view; first click
    * ≥ that view; first purchase ≥ that click — all within the window),
    * each one groupBy(user) + join back on user. At 100 TB that is
    * three shuffles on the same user key — AQE/bucketing co-locates the
    * follow-up joins — and no window-function sort over the full event
    * log. Stage timestamps are mins, so arrival order is irrelevant.
    */
  def tsFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir).select("user_id", "event_type", "ts")
    val windowUs = 24L * 3600L * 1000000L
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click").join(t1, Seq("user_id"))
      .filter(unix_micros(col("ts")) >= unix_micros(col("t1")) &&
        unix_micros(col("ts")) <= unix_micros(col("t1")) + windowUs)
      .groupBy("user_id").agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
    val t3 = ev.filter(col("event_type") === "purchase").join(t2, Seq("user_id"))
      .filter(unix_micros(col("ts")) >= unix_micros(col("t2")) &&
        unix_micros(col("ts")) <= unix_micros(col("t1")) + windowUs)
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    val users = ev.select("user_id").distinct()
    val depth = users
      .join(t1.select(col("user_id"), lit(1).as("d1")), Seq("user_id"), "left")
      .join(t2.select(col("user_id"), lit(1).as("d2")), Seq("user_id"), "left")
      .join(t3.select(col("user_id"), lit(1).as("d3")), Seq("user_id"), "left")
      .withColumn("depth",
        coalesce(col("d3") * 3, col("d2") * 2, col("d1"), lit(0)))
    depth.groupBy("depth").agg(count(lit(1)).as("n_users")).orderBy("depth")
  }

  val tsFunnelOracle: String =
    """WITH ev AS (SELECT user_id, event_type, ts FROM events),
      |t1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (
      |  SELECT ev.user_id, MIN(ev.ts) AS t2, MIN(t1.t1) AS t1
      |  FROM ev JOIN t1 ON ev.user_id = t1.user_id
      |  WHERE ev.event_type = 'click' AND ev.ts >= t1.t1
      |    AND ev.ts <= t1.t1 + INTERVAL 24 HOURS
      |  GROUP BY ev.user_id),
      |t3 AS (
      |  SELECT ev.user_id, MIN(ev.ts) AS t3
      |  FROM ev JOIN t2 ON ev.user_id = t2.user_id
      |  WHERE ev.event_type = 'purchase' AND ev.ts >= t2.t2
      |    AND ev.ts <= t2.t1 + INTERVAL 24 HOURS
      |  GROUP BY ev.user_id)
      |SELECT depth, COUNT(*) AS n_users FROM (
      |  SELECT u.user_id,
      |    CASE WHEN t3.user_id IS NOT NULL THEN 3
      |         WHEN t2.user_id IS NOT NULL THEN 2
      |         WHEN t1.user_id IS NOT NULL THEN 1
      |         ELSE 0 END AS depth
      |  FROM (SELECT DISTINCT user_id FROM ev) u
      |  LEFT JOIN t1 ON u.user_id = t1.user_id
      |  LEFT JOIN t2 ON u.user_id = t2.user_id
      |  LEFT JOIN t3 ON u.user_id = t3.user_id)
      |GROUP BY depth ORDER BY depth""".stripMargin

  /** COHORT RETENTION (the other product-analytics staple next to the
    * funnel): users are cohorted by their FIRST active day, and the
    * report counts how many of each cohort are active again N days
    * later — the curve every engagement dashboard draws. Shape: one
    * distinct-day projection, one groupBy(user) for the cohort day,
    * one join back on user, one groupBy(cohort, offset) — two shuffles
    * on user + one on the (cohort, offset) pair, no windows. */
  def tsRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val cohorts = ev.groupBy("user_id").agg(min(col("d")).as("cohort"))
    ev.join(cohorts, Seq("user_id"))
      .withColumn("day_offset", datediff(col("d"), col("cohort")))
      .groupBy("cohort", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  val tsRetentionOracle: String =
    """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |f AS (SELECT user_id, MIN(d) AS cohort FROM ev GROUP BY user_id)
      |SELECT cohort, CAST(date_diff('day', cohort, d) AS INT) AS day_offset,
      |  COUNT(DISTINCT ev.user_id) AS n_users
      |FROM ev JOIN f ON ev.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin

  /** EVENT-TYPE TRANSITIONS (the path-mining / Markov-chain building
    * block): each user's events in time order yield (from → to) type
    * pairs, counted corpus-wide — "what do users do after a click?".
    * One window pass partitioned by user (ties broken by event_id so
    * both engines sequence identically) + one groupBy on the pair. */
  def tsTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  val tsTransitionsOracle: String =
    """SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      |FROM (
      |  SELECT event_type,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events)
      |WHERE next_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin

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

  /** GAP FILL — the resampling move every time-series store (and every
    * SQL engine's GENERATE_SERIES idiom) needs: hourly counts per
    * event type with EVERY hour of the observed span present, missing
    * buckets as explicit zero rows. A groupBy alone silently drops
    * empty buckets — downstream interpolation, charting, and windowed
    * models all need the dense grid. Shape: one groupBy for the sparse
    * counts, a spine built from `sequence()` over the global [min,max]
    * hour (bounds are a 1-row aggregate — the cross join broadcasts a
    * single row, never a Cartesian blowup), left join + zero-fill. At
    * 100 TB the spine is types × hours — metadata-sized next to the
    * fact scan; the join shuffles the SPARSE side only. Bucket math is
    * exact integer µs division, epoch-second output. */
  def tsGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .withColumn("bucket_sec", expr("(unix_micros(ts) div 3600000000) * 3600"))
    val counts = ev.groupBy("event_type", "bucket_sec")
      .agg(count(lit(1)).as("n"))
    val bounds = ev.agg(min(col("bucket_sec")).as("t0"),
      max(col("bucket_sec")).as("t1"))
    val spine = ev.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(t0, t1, 3600)")).as("bucket_sec"))
    spine.join(counts, Seq("event_type", "bucket_sec"), "left")
      .na.fill(0L, Seq("n"))
      .orderBy("event_type", "bucket_sec")
  }

  val tsGapFillOracle: String =
    """WITH ev AS (SELECT event_type,
      |  (DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 3600000000) * 3600 AS bucket_sec
      |  FROM events),
      |b AS (SELECT MIN(bucket_sec) AS t0, MAX(bucket_sec) AS t1 FROM ev),
      |t AS (SELECT DISTINCT event_type FROM ev),
      |s AS (SELECT t.event_type, CAST(u.g AS BIGINT) AS bucket_sec
      |      FROM t, b, UNNEST(range(b.t0, b.t1 + 3600, 3600)) AS u(g)),
      |c AS (SELECT event_type, bucket_sec, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM ev GROUP BY 1, 2)
      |SELECT s.event_type, s.bucket_sec, COALESCE(c.n, 0) AS n
      |FROM s LEFT JOIN c USING (event_type, bucket_sec)
      |ORDER BY event_type, bucket_sec""".stripMargin

  /** OHLC DOWNSAMPLING — the canonical time-series compaction: per
    * (event_type, day), the first/highest/lowest/last `value` plus
    * event count and exact-decimal turnover. Open/close are SELECTIONS
    * (not accumulations) picked by a total order (ts, event_id) — the
    * event_id tiebreak makes same-µs ties deterministic, so the
    * cross-engine comparison is exact without any float tolerance; the
    * one float aggregate (sum) goes through the DECIMAL(18,2) cast like
    * every money sum in the suite. One window pass + one groupBy, both
    * keyed by (event_type, day): a single shuffle at any scale. */
  def tsOhlc(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
    val w = Window.partitionBy("event_type", "day")
    val wOrd = w.orderBy(col("ts"), col("event_id"))
    ev.withColumn("rn", row_number().over(wOrd))
      .withColumn("cnt", count(lit(1)).over(w))
      .groupBy("event_type", "day")
      .agg(max(when(col("rn") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn") === col("cnt"), col("value"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("decimal(18,2)").cast("double").as("sum_value"))
      .orderBy("event_type", "day")
  }

  val tsOhlcOracle: String =
    """WITH r AS (SELECT event_type,
      |    DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 86400000000 AS day,
      |    value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type,
      |      DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 86400000000
      |      ORDER BY ts, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type,
      |      DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 86400000000) AS cnt
      |  FROM events)
      |SELECT event_type, day,
      |  MAX(CASE WHEN rn = 1 THEN value END) AS open,
      |  MAX(value) AS high, MIN(value) AS low,
      |  MAX(CASE WHEN rn = cnt THEN value END) AS close,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
      |FROM r GROUP BY event_type, day ORDER BY event_type, day""".stripMargin

  /** STREAMING UPSERT MATERIALIZED VIEW — the `foreachBatch` merge
    * pattern every lakehouse ingestion job runs where no transactional
    * table format is wired in: each micro-batch MERGEs into a persisted
    * "latest state per key" table (here: last event per user), so the
    * table is an incrementally-maintained materialized view of the
    * stream. Merge = union(current, batch) → per-key latest by the
    * (ts, event_id) total order → atomic re-materialize (localCheckpoint
    * pins the merged rows BEFORE the overwrite so the job never reads
    * the dir it is replacing; a table format would make this a real
    * MERGE INTO at scale — the per-batch plan is identical). The stream
    * stages TWO full copies of events (two micro-batches carrying every
    * key), so the final table also witnesses upsert IDEMPOTENCE: batch
    * 2 re-delivers every record and must change nothing. Graded read =
    * the final table, oracle = the batch "latest per user" query. */
  def tsStreamUpsert(spark: SparkSession, sfDir: String): DataFrame = runLock.synchronized {
    val dest = s"/tmp/graft_stream_in/$runTag/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/upsert_state"
    graft.util.Scratch.deleteTree(dest)
    graft.util.Scratch.deleteOnExit(s"/tmp/graft_stream_in/$runTag")
    import org.apache.spark.sql.expressions.Window
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val src = stagedEventStream(spark, sfDir, "upsert", 2)
        .select("event_id", "user_id", "ts", "event_type", "value")
      val q = src.writeStream
        .option("checkpointLocation",
          graft.util.Scratch.fastCheckpointDir("upsert")) // tmpfs, see runToMemory
        .foreachBatch { (batch: DataFrame, _: Long) =>
        val cur =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(dest)))
            spark.read.parquet(dest)
          else batch.limit(0)
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        val merged = cur.unionByName(batch)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .localCheckpoint(true) // materialize BEFORE overwriting the input dir
        merged.write.mode("overwrite").parquet(dest)
        ()
      }.start()
      try q.processAllAvailable() finally q.stop()
      spark.streams.resetTerminated()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    spark.read.parquet(dest)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy("user_id")
  }

  val tsStreamUpsertOracle: String =
    """SELECT user_id, ts AS last_ts, event_type AS last_type, value AS last_value
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** 2σ OUTLIER DETECTION — the classic z-score anomaly flag, made
    * EXACTLY cross-engine-comparable by integer algebra: values become
    * BIGINT cents (exact via the DECIMAL(18,2) cast), and the per-row
    * test |v − mean| > 2σ is cross-multiplied into pure int64 —
    * `(n·c − s)² > 4·(n·m2 − s²)` with s = Σc, m2 = Σc² — so neither
    * engine ever forms a float mean, variance, or square root and the
    * boundary can't wobble. Two passes over events: one groupBy for the
    * per-type moments (5 rows), then the moment table BROADCASTS back
    * against the stream for the flag — the standard "stats then score"
    * scan shape at 100 TB. Overflow headroom at graded scale:
    * c ≤ 6e4, per-type n ≤ 2e4 → n·m2 ≤ ~1.3e18 and dev² ≤ ~1.2e18,
    * inside int64; at larger per-group n the moments drop to
    * DECIMAL(38,0) unchanged in shape (noted, not needed here). */
  def tsAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .select(col("event_type"), (dec(col("value")) * 100).cast("long").as("c"))
    val stats = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("m2"))
    // The outlier test squares n·c−s. In LONG that overflows once a
    // type holds ~200k events (sf1: dev² ≈ 1.6e19 > 2⁶³) — the sf1
    // scale rehearsal caught it live. All comparison intermediates ride
    // DECIMAL(38,0) (exact; headroom through ~sf 10⁶); the oracle
    // mirrors with HUGEINT. Outputs stay BIGINT counts on both engines.
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    ev.join(broadcast(stats), "event_type")
      .withColumn("dev", d38(col("n")) * d38(col("c")) - d38(col("s")))
      // Fail LOUDLY past the documented headroom (ADVICE r14): non-ANSI
      // Spark would NULL an overflowed dev² — is_out silently false —
      // while the oracle's HUGEINT raises. |dev| < 10¹⁹ guarantees dev²
      // fits DECIMAL(38,0); beyond (~sf 10⁶) Spark now raises like the
      // oracle instead of silently under-counting outliers.
      .withColumn("dev",
        when(abs(col("dev")) < lit(BigDecimal("1" + "0" * 19)).cast("decimal(38,0)"), col("dev"))
          .otherwise(raise_error(concat(
            lit("ts_anomaly: |n*c - s| exceeds the DECIMAL(38,0) square headroom at "),
            col("dev").cast("string")))))
      .withColumn("is_out",
        col("dev") * col("dev") >
          lit(4) * (d38(col("n")) * d38(col("m2")) - d38(col("s")) * d38(col("s"))))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  val tsAnomalyOracle: String =
    """WITH ev AS (SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events),
      |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS m2
      |  FROM ev GROUP BY 1)
      |SELECT ev.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN
      |      (CAST(n AS HUGEINT) * c - s) * (CAST(n AS HUGEINT) * c - s)
      |      > 4 * (CAST(n AS HUGEINT) * m2 - CAST(s AS HUGEINT) * s)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM ev JOIN st USING (event_type)
      |GROUP BY ev.event_type ORDER BY event_type""".stripMargin

  /** LAGGED CROSS-CORRELATION — "does click volume predict purchase
    * volume k hours later?": Pearson corr between the dense hourly
    * click-count series and the purchase-count series shifted by lag
    * 0..3. Built the `agg_corr_exact` way: both series are INTEGER
    * counts on a zero-filled hourly spine (so the moment sums Σx Σy Σxy
    * Σx² Σy² are exact in any partition order), then one identical
    * closed-form double expression + ROUND 6 on both engines. Shape at
    * 100 TB: the only data-sized pass is the first groupBy(hour) —
    * everything after runs on the spine (hours × 4 lags), which is
    * metadata-sized; the self-join on shifted hours broadcasts. */
  def tsLagCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .withColumn("h", expr("unix_micros(ts) div 3600000000"))
    val counts = ev.groupBy("h").agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b"))
    val bounds = ev.agg(min(col("h")).as("t0"), max(col("h")).as("t1"))
    val spine = bounds.select(explode(expr("sequence(t0, t1)")).as("h"))
    val dense = spine.join(counts, Seq("h"), "left")
      .na.fill(0L, Seq("a", "b"))
    val lags = spark.range(0L, 4L).select(col("id").as("lag"))
    // pair x=clicks(h) with y=purchases(h+lag); inner join trims the
    // ragged tail so every lag correlates over exactly t1-t0+1-lag pairs
    val pairs = dense.select(col("h"), col("a")).crossJoin(broadcast(lags))
      .join(broadcast(dense.select(col("h").as("h2"), col("b"))),
        col("h2") === col("h") + col("lag"))
    pairs.groupBy("lag")
      .agg(count(lit(1)).cast("decimal(28,2)").as("n"),
        sum(col("a")).cast("decimal(28,2)").as("sx"),
        sum(col("b")).cast("decimal(28,2)").as("sy"),
        sum(col("a") * col("b")).cast("decimal(38,4)").as("sxy"),
        sum(col("a") * col("a")).cast("decimal(38,4)").as("sxx"),
        sum(col("b") * col("b")).cast("decimal(38,4)").as("syy"))
      .select(col("lag"),
        col("n").cast("long").as("n_pairs"),
        r6((col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
            sqrt(col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double")))).as("corr"))
      .orderBy("lag")
  }

  val tsLagCorrOracle: String =
    """WITH ev AS (SELECT event_type,
      |    DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 3600000000 AS h
      |  FROM events),
      |counts AS (SELECT h,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b
      |  FROM ev GROUP BY 1),
      |b AS (SELECT MIN(h) AS t0, MAX(h) AS t1 FROM ev),
      |spine AS (SELECT UNNEST(range(t0, t1 + 1)) AS h FROM b),
      |dense AS (SELECT s.h, COALESCE(c.a, 0) AS a, COALESCE(c.b, 0) AS b
      |  FROM spine s LEFT JOIN counts c ON s.h = c.h),
      |lags AS (SELECT UNNEST(range(0, 4)) AS lag),
      |pairs AS (SELECT l.lag, x.a, y.b
      |  FROM dense x CROSS JOIN lags l JOIN dense y ON y.h = x.h + l.lag),
      |m AS (SELECT lag, CAST(COUNT(*) AS DECIMAL(28,2)) AS n,
      |    CAST(SUM(a) AS DECIMAL(28,2)) AS sx, CAST(SUM(b) AS DECIMAL(28,2)) AS sy,
      |    CAST(SUM(a * b) AS DECIMAL(38,4)) AS sxy,
      |    CAST(SUM(a * a) AS DECIMAL(38,4)) AS sxx,
      |    CAST(SUM(b * b) AS DECIMAL(38,4)) AS syy
      |  FROM pairs GROUP BY lag)
      |SELECT lag, CAST(n AS BIGINT) AS n_pairs,
      |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |     SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
      |FROM m ORDER BY lag""".stripMargin

  /** CHANGEPOINT DETECTION over the hourly event-rate series — the
    * monitoring primitive behind "when did this metric shift?": for
    * each event_type, find the split hour that maximizes the mean-rate
    * difference between the before and after segments (the offline
    * CUSUM / binary-segmentation scoring step). All arithmetic is
    * EXACT: with prefix sum cum at observed-hour index idx of n, the
    * mean difference is [cum·(n−idx) − (tot−cum)·idx] / (idx·(n−idx)),
    * and the score is emitted as integer ppm of that fraction
    * (`(1e6·|num|) div den` — the `llm_ann_recall` determinism move),
    * so the argmax and the tie-break (earliest hour) are cross-engine
    * stable with no double rounding anywhere. Shape at 100 TB: the
    * only data-sized pass is the first groupBy(event_type, hour);
    * every window after runs on the hourly series (≤ hours-per-month
    * rows per type), partitioned by event_type — no unpartitioned
    * window, no second shuffle. */
  def tsChangepoint(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events(spark, sfDir)
      .withColumn("h", expr("unix_micros(ts) div 3600000000"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("h")
    val wAll = Window.partitionBy("event_type")
    val scored = hourly
      .withColumn("idx", row_number().over(w))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("tot", sum(col("c")).over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("idx") < col("n")) // a split needs a non-empty after-segment
      .withColumn("diff_ppm", expr(
        "(1000000 * abs(cum * (n - idx) - (tot - cum) * idx)) div (idx * (n - idx))"))
    val wPick = Window.partitionBy("event_type")
      .orderBy(col("diff_ppm").desc, col("h").asc)
    scored.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("h").as("split_hour"), col("diff_ppm"),
        col("cum").as("n_before"), (col("tot") - col("cum")).as("n_after"))
      .orderBy("event_type")
  }

  /** Same prefix-sum scoring in SQL; every windowed SUM is cast off
    * DuckDB's HUGEINT before it reaches the output or the ppm math. */
  val tsChangepointOracle: String =
    """WITH hourly AS (
      |  SELECT event_type,
      |    DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 3600000000 AS h,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT event_type, h,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS idx,
      |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY h) AS BIGINT) AS cum,
      |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM hourly),
      |d AS (SELECT event_type, h, cum AS n_before, tot - cum AS n_after,
      |    CAST((1000000 * abs(cum * (n - idx) - (tot - cum) * idx))
      |      // (idx * (n - idx)) AS BIGINT) AS diff_ppm
      |  FROM s WHERE idx < n)
      |SELECT event_type, split_hour, diff_ppm, n_before, n_after
      |FROM (SELECT event_type, h AS split_hour, diff_ppm, n_before, n_after,
      |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY diff_ppm DESC, h ASC) AS rn
      |      FROM d) WHERE rn = 1
      |ORDER BY event_type""".stripMargin

  /** PER-WINDOW EXACT DISTINCT — "unique users per hour", the metric
    * behind every DAU/HAU dashboard and the canonical expensive
    * windowed aggregate: COUNT(DISTINCT user_id) per tumbling hour,
    * plus the returning-user split (users also active in the PREVIOUS
    * hour — a window self-reference done as one lag-keyed semi-join on
    * the already-aggregated (hour, user) pairs, never on raw events).
    * Shape at 100 TB: one groupBy(hour, user) collapses raw events to
    * the distinct pairs (map-side partial), then per-hour counts and
    * the prev-hour membership join both run on the collapsed set —
    * every shuffle is keyed by (hour[, user]) and the raw table is
    * touched exactly once. Exact distinct per window stays feasible at
    * scale precisely because of that pre-collapse; `agg_approx_hll`
    * and `agg_sketch_merge` are the sketch path when it does not. */
  def tsTumblingDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = events(spark, sfDir)
      .select(expr("unix_micros(ts) div 3600000000").as("h"), col("user_id"))
      .distinct()
    val prev = pairs.select((col("h") + 1).as("h"), col("user_id"))
    val ret = pairs.join(prev, Seq("h", "user_id"), "left_semi")
      .groupBy("h").agg(count(lit(1)).as("n_returning"))
    pairs.groupBy("h").agg(count(lit(1)).as("n_distinct_users"))
      .join(ret, Seq("h"), "left")
      .na.fill(0L, Seq("n_returning"))
      .select(col("h"), col("n_distinct_users"), col("n_returning"))
      .orderBy("h")
  }

  val tsTumblingDistinctOracle: String =
    """WITH pairs AS (SELECT DISTINCT
      |    DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 3600000000 AS h,
      |    user_id FROM events),
      |ret AS (SELECT p.h, COUNT(*) AS n_returning
      |  FROM pairs p WHERE EXISTS (SELECT 1 FROM pairs q
      |    WHERE q.h = p.h - 1 AND q.user_id = p.user_id)
      |  GROUP BY 1)
      |SELECT p.h,
      |  COUNT(*) AS n_distinct_users,
      |  COALESCE(MAX(r.n_returning), 0) AS n_returning
      |FROM pairs p LEFT JOIN ret r ON p.h = r.h
      |GROUP BY p.h ORDER BY p.h""".stripMargin

  /** FORWARD FILL (LOCF) — the other resampling mode next to
    * `ts_gap_fill`'s zero-fill: each event type's hourly series carries
    * the LAST observed value across empty hours (sensor/price
    * semantics, where absence means "unchanged" not "zero"). The
    * per-hour observation is the value of that hour's final event
    * (argmax by the unique event_id — deterministic in both engines,
    * where a timestamp argmax could tie); the fill is one
    * `last(value, ignoreNulls)` over an unbounded-preceding frame on
    * the dense spine. Hours before a type's first observation stay
    * NULL — LOCF has nothing to carry. Shape at 100 TB: one
    * data-sized groupBy(type, hour), then the window runs on the
    * metadata-sized spine (types × hours), partitioned by type — the
    * same "reduce first, analyze the reduction" shape as
    * `ts_lag_corr`. */
  def tsFillForward(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .withColumn("h", expr("unix_micros(ts) div 3600000000"))
    val lastPerHour = ev.groupBy("event_type", "h")
      .agg(expr("max_by(value, event_id)").as("v_obs"))
    val bounds = ev.agg(min(col("h")).as("t0"), max(col("h")).as("t1"))
    val spine = ev.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(expr("sequence(t0, t1)")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("h")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(lastPerHour, Seq("event_type", "h"), "left")
      .withColumn("v_filled", last(col("v_obs"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("v_obs").isNull.cast("int"))
      .select("event_type", "h", "v_filled", "is_gap")
      .orderBy("event_type", "h")
  }

  val tsFillForwardOracle: String =
    """WITH ev AS (SELECT event_type, event_id, value,
      |    DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 3600000000 AS h
      |  FROM events),
      |obs AS (SELECT event_type, h, arg_max(value, event_id) AS v_obs
      |  FROM ev GROUP BY 1, 2),
      |b AS (SELECT MIN(h) AS t0, MAX(h) AS t1 FROM ev),
      |t AS (SELECT DISTINCT event_type FROM ev),
      |s AS (SELECT t.event_type, CAST(u.g AS BIGINT) AS h
      |  FROM t, b, UNNEST(range(b.t0, b.t1 + 1)) AS u(g))
      |SELECT s.event_type, s.h,
      |  LAST_VALUE(o.v_obs IGNORE NULLS) OVER (PARTITION BY s.event_type
      |    ORDER BY s.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
      |  CAST(o.v_obs IS NULL AS INT) AS is_gap
      |FROM s LEFT JOIN obs o ON s.event_type = o.event_type AND s.h = o.h
      |ORDER BY s.event_type, s.h""".stripMargin

  /** SEASONAL PROFILE — the hour-of-day × day-of-week activity matrix
    * behind every traffic dashboard, in PURE INTEGER epoch arithmetic:
    * `dow = (epoch_days + 4) % 7` (1970-01-01 was a Thursday; 0 =
    * Sunday) and `hod = epoch_hours % 24` — deliberately NOT the
    * engines' dayofweek()/EXTRACT, whose numbering conventions differ
    * (Spark 1=Sunday, DuckDB 0=Sunday) and whose timezone handling
    * can shift a bucket; integer division from the same UTC micros
    * cannot. Share is exact integer parts-per-million. One
    * partial+final aggregate to a 7×24-row result at any scale. */
  def tsSeasonalProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("dow", expr("((us div 86400000000) + 4) % 7"))
      .withColumn("hod", expr("(us div 3600000000) % 24"))
    val total = ev.count()
    ev.groupBy("dow", "hod")
      .agg(count(lit(1)).as("n"))
      .withColumn("share_ppm", expr(s"(n * 1000000) div ${total}L"))
      .orderBy("dow", "hod")
  }

  val tsSeasonalProfileOracle: String =
    """WITH ev AS (SELECT
      |    DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) AS us
      |  FROM events)
      |SELECT (us // 86400000000 + 4) % 7 AS dow,
      |  (us // 3600000000) % 24 AS hod,
      |  COUNT(*) AS n,
      |  (COUNT(*) * 1000000) // (SELECT COUNT(*) FROM ev) AS share_ppm
      |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** M4 DOWNSAMPLING (Jugel et al., VLDB 2014) — the error-free
    * visualization reduction: per (series, pixel-bucket) keep exactly
    * min, max, first, last of the value, which is provably sufficient
    * to render the line chart pixel-identically to the full series.
    * First/last are ordered by the unique `event_id` sequence number
    * (deterministic where a ts argmin could tie); every output value
    * is a SELECTED input double — no arithmetic, so cross-engine float
    * parity is exact by construction. Shape at 100 TB: one partial +
    * final aggregate keyed by (series, pixel) — min/max/min_by/max_by
    * all combine map-side, the shuffle carries 4 doubles per pixel,
    * and the output is bounded by series × pixels no matter how many
    * raw points feed it. This is the pre-aggregation a dashboard
    * pushes down instead of shipping raw points to the renderer. */
  def tsDownsampleM4(spark: SparkSession, sfDir: String): DataFrame = {
    events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 14400000000").as("px"))
      .agg(min(col("value")).as("v_min"), max(col("value")).as("v_max"),
        expr("min_by(value, event_id)").as("v_first"),
        expr("max_by(value, event_id)").as("v_last"),
        count(lit(1)).as("n"))
      .orderBy("event_type", "px")
  }

  val tsDownsampleM4Oracle: String =
    """SELECT event_type,
      |  DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 14400000000 AS px,
      |  MIN(value) AS v_min, MAX(value) AS v_max,
      |  arg_min(value, event_id) AS v_first, arg_max(value, event_id) AS v_last,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Shared (event_type, hour, count) collapse — the pre-aggregation
    * every hourly-series operator starts from. ONE definition (Spark +
    * SQL mirror below) so a bucket-width or tie-break change cannot
    * drift between the five operators and their oracles that share it
    * (the `edgesSql`/`ivfOracleProlog` pattern). */
  private[operators] def hourlyCounts(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"))

  /** SQL mirror of [[hourlyCounts]]; splice as the `hourly` CTE. */
  private[operators] val hourlyCteSql: String =
    """hourly AS (SELECT event_type,
      |    DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 3600000000 AS h,
      |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2)""".stripMargin

  /** ALERT DEBOUNCE — the hysteresis every pager pipeline applies
    * between "a metric spiked" and "wake someone up": an hour is HOT
    * when its count exceeds the type's mean hourly rate (exact integer
    * cross-multiplication `n · n_hours > total`, no float mean), and an
    * ALERT EPISODE is ≥ 2 CONSECUTIVE hot hours — single-hour blips
    * never page. Episodes are dense-rank islands (`h − row_number()`)
    * over the hot set, reported with span and peak. The mean is over
    * the type's OBSERVED hours (an absent hour is silence, not a zero
    * vote — `ts_gap_fill` is the densification when zeros are wanted).
    * Shape at 100 TB: the raw table collapses to the (type, hour)
    * series first; the totals join is type-sized (broadcast) and the
    * island window runs on the collapsed series partitioned by type —
    * the `ts_changepoint` shape with episode semantics on top. */
  def tsAlertDebounce(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = hourlyCounts(spark, sfDir)
    val tot = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("nh"), sum(col("n")).as("tn"))
    val hot = hourly.join(broadcast(tot), Seq("event_type"))
      .filter(col("n") * col("nh") > col("tn"))
    val w = Window.partitionBy("event_type").orderBy("h")
    hot.withColumn("grp", col("h") - row_number().over(w))
      .groupBy("event_type", "grp")
      .agg(min(col("h")).as("start_h"), max(col("h")).as("end_h"),
        count(lit(1)).as("n_hours"), max(col("n")).as("peak_n"))
      .filter(col("n_hours") >= 2)
      .select("event_type", "start_h", "end_h", "n_hours", "peak_n")
      .orderBy("event_type", "start_h")
  }

  val tsAlertDebounceOracle: String =
    s"""WITH $hourlyCteSql,
      |tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nh,
      |               CAST(SUM(n) AS BIGINT) AS tn FROM hourly GROUP BY 1),
      |fl AS (SELECT h.event_type, h.h, h.n FROM hourly h JOIN tot t USING (event_type)
      |       WHERE h.n * t.nh > t.tn),
      |g AS (SELECT event_type, h, n,
      |    h - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS grp FROM fl)
      |SELECT event_type, MIN(h) AS start_h, MAX(h) AS end_h,
      |  COUNT(*) AS n_hours, MAX(n) AS peak_n
      |FROM g GROUP BY event_type, grp
      |HAVING COUNT(*) >= 2
      |ORDER BY event_type, start_h""".stripMargin

  /** DAU / WAU / MAU + STICKINESS — the rolling-distinct-actives board
    * every product reports, computed EXACTLY without a range join: a
    * (user, day) activity pair makes the user active for every window
    * ENDING on day..day+6 (resp. +27), so exploding each distinct pair
    * across its window offsets turns the trailing-window distinct into
    * a plain explode → distinct → count chain — the classic trick that
    * converts a range join (BNLJ at scale) into equi-shuffles only.
    * Stickiness = DAU/WAU in exact integer ppm. Days outside the
    * observed spine are dropped (no window ends on a day with no
    * traffic). Shape at 100 TB: the raw table collapses to distinct
    * (user, day) FIRST; the 7×/28× blowup applies to that collapsed
    * set (bounded by users × days), and every shuffle after is keyed
    * by day or (user, day). */
  def tsDauWau(spark: SparkSession, sfDir: String): DataFrame = {
    val du = events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val obs = du.select("day").distinct()
    def rolling(span: Int, out: String): DataFrame = du
      .select(col("user_id"), explode(expr(s"sequence(day, day + ${span - 1})")).as("day"))
      .distinct()
      .join(obs, Seq("day"), "left_semi")
      .groupBy("day").agg(count(lit(1)).as(out))
    du.groupBy("day").agg(count(lit(1)).as("dau"))
      .join(rolling(7, "wau"), Seq("day"))
      .join(rolling(28, "mau"), Seq("day"))
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        expr("(dau * 1000000) div wau").as("stickiness_ppm"))
      .orderBy("day")
  }

  val tsDauWauOracle: String =
    """WITH du AS (SELECT DISTINCT user_id,
      |    DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 86400000000 AS day
      |  FROM events),
      |obs AS (SELECT DISTINCT day FROM du),
      |wexp AS (SELECT DISTINCT user_id, day + k AS wday FROM du, UNNEST(range(0, 7)) AS u(k)),
      |wau AS (SELECT wday AS day, CAST(COUNT(*) AS BIGINT) AS wau FROM wexp
      |        WHERE wday IN (SELECT day FROM obs) GROUP BY 1),
      |mexp AS (SELECT DISTINCT user_id, day + k AS mday FROM du, UNNEST(range(0, 28)) AS u(k)),
      |mau AS (SELECT mday AS day, CAST(COUNT(*) AS BIGINT) AS mau FROM mexp
      |        WHERE mday IN (SELECT day FROM obs) GROUP BY 1),
      |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY 1)
      |SELECT d.day, d.dau, w.wau, m.mau, (d.dau * 1000000) // w.wau AS stickiness_ppm
      |FROM dau d JOIN wau w ON d.day = w.day JOIN mau m ON d.day = m.day
      |ORDER BY d.day""".stripMargin

  /** ROBUST Z-SCORE (median/MAD) — the outlier score monitoring uses
    * when the mean/std one lies (a single spike inflates σ and hides
    * itself): per event type, score = (n − median) / MAD over the
    * hourly series, entirely in INTEGER SELECTION arithmetic — median
    * and MAD are lower-median picks from sorted collected lists (the
    * `win_sliding_median` move as a grouped aggregate), deviations are
    * integer, and the final ppm division runs on ABSOLUTE values with
    * the sign reapplied, because integer division of negatives is the
    * classic cross-engine trap (Spark `div` truncates toward zero,
    * DuckDB `//` floors — they disagree on every negative quotient).
    * Shape at 100 TB: collapse to the (type, hour) series first; the
    * per-type collected list is series-length (hours), metadata-sized,
    * and both joins are type-keyed broadcasts. */
  def tsRobustZscore(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = hourlyCounts(spark, sfDir)
    def lowerMedian(in: DataFrame, valueCol: String, out: String): DataFrame = in
      .groupBy("event_type")
      .agg(sort_array(collect_list(col(valueCol))).as("arr"))
      .select(col("event_type"),
        element_at(col("arr"), expr("CAST((size(arr) + 1) div 2 AS INT)")).as(out))
    val dev = hourly
      .join(broadcast(lowerMedian(hourly, "n", "med")), Seq("event_type"))
      .withColumn("ad", abs(col("n") - col("med")))
    dev.join(broadcast(lowerMedian(dev, "ad", "mad")), Seq("event_type"))
      .select(col("event_type"), col("h"), col("n"), col("med"), col("mad"),
        expr("""CASE WHEN n >= med THEN ((n - med) * 1000000) div greatest(mad, 1)
               |     ELSE -(((med - n) * 1000000) div greatest(mad, 1)) END""".stripMargin)
          .as("rz_ppm"))
      .orderBy("event_type", "h")
  }

  val tsRobustZscoreOracle: String =
    s"""WITH $hourlyCteSql,
      |med AS (SELECT event_type, arr[CAST((len(arr)+1)//2 AS INT)] AS med
      |        FROM (SELECT event_type, list_sort(list(n)) AS arr FROM hourly GROUP BY 1)),
      |dev AS (SELECT h.event_type, h.h, h.n, m.med, abs(h.n - m.med) AS ad
      |        FROM hourly h JOIN med m USING (event_type)),
      |mad AS (SELECT event_type, arr[CAST((len(arr)+1)//2 AS INT)] AS mad
      |        FROM (SELECT event_type, list_sort(list(ad)) AS arr FROM dev GROUP BY 1))
      |SELECT d.event_type, d.h, d.n, d.med, ma.mad,
      |  CASE WHEN d.n >= d.med THEN ((d.n - d.med) * 1000000) // GREATEST(ma.mad, 1)
      |       ELSE -(((d.med - d.n) * 1000000) // GREATEST(ma.mad, 1)) END AS rz_ppm
      |FROM dev d JOIN mad ma ON d.event_type = ma.event_type
      |ORDER BY d.event_type, d.h""".stripMargin

  /** PEAK DETECTION — strict local maxima with a height gate: an hour
    * is a peak when its count beats BOTH neighbors (lag/lead on the
    * per-type series; series edges, where a neighbor is absent, are
    * excluded — a boundary point's "peak-ness" is unknowable) AND
    * clears the type's mean rate (the `ts_alert_debounce` exact
    * integer cross-multiply, so a noisy floor does not spray peaks).
    * This is the signal-processing primitive under burst mining and
    * "when were the busiest moments" dashboards, complementary to
    * `ts_anomaly` (global threshold) and `ts_changepoint` (level
    * shift). One collapsed-series window pass, totals broadcast. */
  def tsPeaks(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = hourlyCounts(spark, sfDir)
    val tot = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("nh"), sum(col("n")).as("tn"))
    val w = Window.partitionBy("event_type").orderBy("h")
    hourly.join(broadcast(tot), Seq("event_type"))
      .withColumn("pn", lag(col("n"), 1).over(w))
      .withColumn("nn", lead(col("n"), 1).over(w))
      .filter(col("pn").isNotNull && col("nn").isNotNull &&
        col("n") > col("pn") && col("n") > col("nn") &&
        col("n") * col("nh") > col("tn"))
      .select("event_type", "h", "n")
      .orderBy("event_type", "h")
  }

  val tsPeaksOracle: String =
    s"""WITH $hourlyCteSql,
      |tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nh,
      |        CAST(SUM(n) AS BIGINT) AS tn FROM hourly GROUP BY 1),
      |x AS (SELECT h.event_type, h.h, h.n,
      |    LAG(h.n) OVER (PARTITION BY h.event_type ORDER BY h.h) AS pn,
      |    LEAD(h.n) OVER (PARTITION BY h.event_type ORDER BY h.h) AS nn,
      |    t.nh, t.tn
      |  FROM hourly h JOIN tot t USING (event_type))
      |SELECT event_type, h, n FROM x
      |WHERE pn IS NOT NULL AND nn IS NOT NULL AND n > pn AND n > nn AND n * nh > tn
      |ORDER BY event_type, h""".stripMargin

  /** FORECAST BACKTEST — evaluating the seasonal-naive baseline
    * (ŷ(h) = y(h − 168): "same hour last week", the forecast every
    * fancier model must beat) with WAPE in exact integer ppm:
    * Σ|y − ŷ| · 10⁶ div Σy per event type, over the hours where a
    * week-old observation exists (a self-equi-join on h − 168 — the
    * lag is an equi-join key, not a window, so sparse series need no
    * densification). WAPE over MAPE because it is division-safe on
    * zero-actual hours and weighting by volume is what capacity
    * planning wants. Shape at 100 TB: collapse first, then a
    * type+hour-keyed self-join on the collapsed series and one
    * partial+final aggregate to ≤ |types| rows. */
  def tsForecastEval(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = hourlyCounts(spark, sfDir)
    val fc = hourly.select(col("event_type"), (col("h") + 168).as("h"),
      col("n").as("forecast"))
    hourly.join(fc, Seq("event_type", "h"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(col("n")).as("sum_actual"),
        sum(abs(col("n") - col("forecast"))).as("sum_abs_err"))
      .select(col("event_type"), col("n_hours"), col("sum_actual"), col("sum_abs_err"),
        expr("(sum_abs_err * 1000000) div sum_actual").as("wape_ppm"))
      .orderBy("event_type")
  }

  val tsForecastEvalOracle: String =
    s"""WITH $hourlyCteSql,
      |j AS (SELECT a.event_type, a.h, a.n AS actual, f.n AS forecast
      |      FROM hourly a JOIN hourly f
      |        ON a.event_type = f.event_type AND f.h = a.h - 168)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
      |  CAST(SUM(actual) AS BIGINT) AS sum_actual,
      |  CAST(SUM(abs(actual - forecast)) AS BIGINT) AS sum_abs_err,
      |  (CAST(SUM(abs(actual - forecast)) AS BIGINT) * 1000000)
      |    // CAST(SUM(actual) AS BIGINT) AS wape_ppm
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** INTER-ARRIVAL GAPS — the arrival-process profile behind capacity
    * planning and watermark tuning: per event type, the gap series
    * (consecutive event timestamps, tie-broken by event_id so both
    * engines difference the same sequence) summarized as count, LOWER-
    * MEDIAN gap (selection arithmetic — the robust-zscore recipe) and
    * max gap (the longest silence, the number an SLA monitor alarms
    * on). All integer micros. One collapsed window pass per type; the
    * collected gap list is series-length metadata. */
  def tsInterarrival(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir).select(col("event_type"),
      expr("unix_micros(ts)").as("us"), col("event_id"))
    val w = Window.partitionBy("event_type").orderBy("us", "event_id")
    e.withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(sort_array(collect_list(col("gap"))).as("arr"),
        max(col("gap")).as("max_gap_us"))
      .select(col("event_type"),
        size(col("arr")).cast("long").as("n_gaps"),
        element_at(col("arr"), expr("CAST((size(arr)+1) div 2 AS INT)")).as("med_gap_us"),
        col("max_gap_us"))
      .orderBy("event_type")
  }

  val tsInterarrivalOracle: String =
    """WITH e AS (SELECT event_type,
      |    DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) AS us, event_id
      |  FROM events),
      |g AS (SELECT event_type,
      |    us - LAG(us) OVER (PARTITION BY event_type ORDER BY us, event_id) AS gap FROM e),
      |gg AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
      |m AS (SELECT event_type, CAST(len(arr) AS BIGINT) AS n_gaps,
      |        arr[CAST((len(arr)+1)//2 AS INT)] AS med_gap_us
      |      FROM (SELECT event_type, list_sort(list(gap)) AS arr FROM gg GROUP BY 1)),
      |x AS (SELECT event_type, CAST(MAX(gap) AS BIGINT) AS max_gap_us FROM gg GROUP BY 1)
      |SELECT m.event_type, m.n_gaps, m.med_gap_us, x.max_gap_us
      |FROM m JOIN x ON m.event_type = x.event_type ORDER BY m.event_type""".stripMargin

  /** EXPONENTIALLY-WEIGHTED MOVING AVERAGE (binary decay) — the
    * monitoring smoother, made exactly reproducible: true EWMA is an
    * infinite recurrence no window frame expresses, but with α = 1/2
    * the weight of the i-th lag is 2^(7−i) and the tail beyond 8 lags
    * is < 0.4% — so the smoother is a FINITE 8-term integer dot
    * product `Σ n_{t−i}·2^(7−i)` normalized by the weights actually
    * present (series heads use fewer lags rather than fabricating
    * zeros). All integer: the result is milli-units via `(1000·num)
    * div den`, so partial-sum order cannot perturb parity — the
    * float-recurrence trap (each engine rounding a running product
    * differently) never opens. Defined on the OBSERVED hourly series
    * ([[hourlyCounts]] — ONE definition shared with the other five
    * hourly operators); `ts_gap_fill` is the densification when
    * missing hours should weigh in as zeros. Shape at 100 TB: the raw
    * events collapse first (keyed shuffle, map-side combinable), the
    * 8 lags are ONE window pass per type partition. */
  def tsEwma(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("h")
    val base = hourlyCounts(spark, sfDir)
    val withLags = (1 to 7).foldLeft(base)((df, i) =>
      df.withColumn(s"l$i", lag(col("n"), i).over(w)))
    val num = (Seq("n * 128") ++ (1 to 7).map(i => s"coalesce(l$i, 0L) * ${1L << (7 - i)}"))
      .mkString(" + ")
    val den = (Seq("128") ++ (1 to 7).map(i => s"CASE WHEN l$i IS NOT NULL THEN ${1L << (7 - i)} ELSE 0 END"))
      .mkString(" + ")
    withLags.select(col("event_type"), col("h"), col("n"),
      expr(s"(1000 * ($num)) div ($den)").as("ewma_e3"))
      .orderBy("event_type", "h")
  }

  val tsEwmaOracle: String = {
    val num = (Seq("n * 128") ++ (1 to 7).map(i => s"COALESCE(l$i, 0) * ${1L << (7 - i)}"))
      .mkString(" + ")
    val den = (Seq("128") ++ (1 to 7).map(i => s"CASE WHEN l$i IS NOT NULL THEN ${1L << (7 - i)} ELSE 0 END"))
      .mkString(" + ")
    val lags = (1 to 7).map(i =>
      s"LAG(n, $i) OVER (PARTITION BY event_type ORDER BY h) AS l$i").mkString(",\n|    ")
    s"""WITH $hourlyCteSql,
       |lagged AS (SELECT event_type, h, n,
       |    $lags
       |  FROM hourly)
       |SELECT event_type, h, n, (1000 * ($num)) // ($den) AS ewma_e3
       |FROM lagged ORDER BY event_type, h""".stripMargin
  }

  /** COHORT VALUE TRIANGLE (LTV curve) — `ts_retention` counts who
    * comes back; this key measures what they are WORTH: purchase value
    * in exact cents per (signup-week cohort × week age), plus buyer
    * counts — the table a growth team reads diagonally for LTV. Weeks
    * are epoch-week integers (`µs div 604800000000`) — deliberately
    * not WEEK()/DATE_TRUNC, whose ISO-week conventions differ between
    * engines (the `ts_seasonal_profile` discipline). Cohort = first
    * event week of ANY type (activity defines the cohort; purchases
    * define the value). Shape at 100 TB: the cohort map is one
    * user-keyed min-aggregate (map-side combinable), the triangle one
    * join + one aggregate keyed on the same user id — two shuffles
    * total, and the output is weeks²-bounded. */
  def tsCohortValue(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 604800000000").as("wk"),
        col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val cohorts = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    ev.filter(col("event_type") === "purchase")
      .join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_age"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_buyers"),
        sum(col("cents")).as("value_cents"))
      .orderBy("cohort_wk", "week_age")
  }

  val tsCohortValueOracle: String =
    """WITH ev AS (SELECT user_id,
      |    DATE_DIFF('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) // 604800000000 AS wk,
      |    event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY 1)
      |SELECT cohort_wk, wk - cohort_wk AS week_age,
      |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_buyers,
      |  CAST(SUM(cents) AS BIGINT) AS value_cents
      |FROM ev JOIN f ON ev.user_id = f.user_id
      |WHERE event_type = 'purchase'
      |GROUP BY 1, 2 ORDER BY cohort_wk, week_age""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_ewma" -> (tsEwma _),
    "ts_cohort_value" -> (tsCohortValue _),
    "ts_interarrival" -> (tsInterarrival _),
    "ts_peaks" -> (tsPeaks _),
    "ts_forecast_eval" -> (tsForecastEval _),
    "ts_robust_zscore" -> (tsRobustZscore _),
    "ts_dau_wau" -> (tsDauWau _),
    "ts_alert_debounce" -> (tsAlertDebounce _),
    "ts_downsample_m4" -> (tsDownsampleM4 _),
    "ts_seasonal_profile" -> (tsSeasonalProfile _),
    "ts_fill_forward" -> (tsFillForward _),
    "ts_tumbling_distinct" -> (tsTumblingDistinct _),
    "ts_lag_corr" -> (tsLagCorr _),
    "ts_gap_fill" -> (tsGapFill _),
    "ts_ohlc" -> (tsOhlc _),
    "ts_anomaly" -> (tsAnomaly _),
    "ts_changepoint" -> (tsChangepoint _),
    "ts_stream_upsert" -> (tsStreamUpsert _),
    "ts_tumbling" -> (tsTumbling _),
    "ts_tumbling_stream" -> (tsTumblingStream _),
    "ts_sliding" -> (tsSliding _),
    "ts_sliding_stream" -> (tsSlidingStream _),
    "ts_sliding_stream_append" -> (tsSlidingStreamAppend _),
    "ts_sliding_stream_update" -> (tsSlidingStreamUpdate _),
    "ts_session" -> (tsSession _),
    "ts_session_stream" -> (tsSessionStream _),
    "ts_dedup_watermark" -> (tsDedupWatermark _),
    "ts_dedup_stream" -> (tsDedupStream _),
    "ts_stateful_stream" -> (tsStatefulStream _),
    "ts_timeout_sessions" -> (tsTimeoutSessions _),
    "ts_stream_join" -> (tsStreamJoin _),
    "ts_stream_stream_join" -> (tsStreamStreamJoin _),
    "ts_stream_outer_join" -> (tsStreamOuterJoin _),
    "ts_stream_append_window" -> (tsStreamAppendWindow _),
    "ts_funnel" -> (tsFunnel _),
    "ts_retention" -> (tsRetention _),
    "ts_transitions" -> (tsTransitions _),
    "ts_late_data" -> (tsLateData _))

  val oracle: Map[String, String] = Map(
    "ts_ewma" -> tsEwmaOracle,
    "ts_cohort_value" -> tsCohortValueOracle,
    "ts_interarrival" -> tsInterarrivalOracle,
    "ts_peaks" -> tsPeaksOracle,
    "ts_forecast_eval" -> tsForecastEvalOracle,
    "ts_robust_zscore" -> tsRobustZscoreOracle,
    "ts_dau_wau" -> tsDauWauOracle,
    "ts_alert_debounce" -> tsAlertDebounceOracle,
    "ts_downsample_m4" -> tsDownsampleM4Oracle,
    "ts_seasonal_profile" -> tsSeasonalProfileOracle,
    "ts_fill_forward" -> tsFillForwardOracle,
    "ts_tumbling_distinct" -> tsTumblingDistinctOracle,
    "ts_lag_corr" -> tsLagCorrOracle,
    "ts_gap_fill" -> tsGapFillOracle,
    "ts_anomaly" -> tsAnomalyOracle,
    "ts_changepoint" -> tsChangepointOracle,
    "ts_stream_upsert" -> tsStreamUpsertOracle,
    "ts_ohlc" -> tsOhlcOracle,
    "ts_tumbling" -> tsTumblingOracle,
    // the streaming executions must produce exactly the batch results
    "ts_tumbling_stream" -> tsTumblingOracle,
    "ts_sliding" -> tsSlidingOracle,
    "ts_sliding_stream" -> tsSlidingOracle,
    "ts_sliding_stream_append" -> tsSlidingStreamAppendOracle,
    "ts_sliding_stream_update" -> tsSlidingStreamUpdateOracle,
    "ts_session" -> tsSessionOracle,
    "ts_session_stream" -> tsSessionOracle,
    "ts_dedup_watermark" -> tsDedupWatermarkOracle,
    "ts_dedup_stream" -> tsDedupWatermarkOracle,
    "ts_stateful_stream" -> tsStatefulStreamOracle,
    "ts_timeout_sessions" -> tsSessionOracle, // batch-equivalent by construction (see scaladoc)
    "ts_stream_join" -> tsStreamJoinOracle,
    "ts_stream_stream_join" -> tsStreamStreamJoinOracle,
    "ts_stream_outer_join" -> tsStreamOuterJoinOracle,
    "ts_stream_append_window" -> tsStreamAppendWindowOracle,
    "ts_funnel" -> tsFunnelOracle,
    "ts_retention" -> tsRetentionOracle,
    "ts_transitions" -> tsTransitionsOracle,
    "ts_late_data" -> tsLateDataOracle)
}
