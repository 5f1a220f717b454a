package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CONTINUOUS WAL SHIPPING to a replica store (r12) — the HBase
  * inter-cluster replication story (SURVEY.md §2.A's reconstructed
  * replication surface) composed from the pieces the snapshot
  * subsystem already grades: a primary's append-only edit log ships to
  * a replica QUEUE in bounded, seq-ordered batches behind a durable
  * replication OFFSET, the replica applies the queue with
  * last-write-wins semantics (deletes suppress cells), and a
  * VerifyReplication-style checksum report proves convergence without
  * moving either side's data to one place.
  *
  * Failure model (the part that makes replication trustworthy):
  *  - ship() publishes each batch's data FIRST and only then commits
  *    the offset via temp-file + atomic move — a kill in the window
  *    between the two leaves a published-but-uncommitted batch that
  *    the next ship() simply overwrites (batch contents are a pure,
  *    deterministic function of the WAL and the recorded split
  *    geometry), so resume never loses or double-counts an edit;
  *  - the split geometry (batch count + seq range) is PERSISTED in the
  *    offset ledger and re-checked on resume — resuming with a
  *    different --batches or a mutated WAL fails loudly instead of
  *    silently mis-splitting;
  *  - apply() is idempotent: it reads only committed batches (index ≤
  *    offset) and resolves per-coordinate winners by seq, so applying
  *    the same queue twice yields the same state.
  *
  * 100 TB posture: a batch ships as one bounded filter+write of the
  * log tail (a production tailer reads only new WAL segments — the
  * seq-range filter models that boundary); apply is ONE cell-keyed
  * shuffle over the shipped edits regardless of batch count; the
  * verify report aggregates per qualifier on each side independently
  * and joins k rows, never co-locating the two stores' cells. */
object KvReplication {

  /** Spec fault injection (the `exportCopyFault` pattern): invoked
    * after batch `i`'s data is published but BEFORE its offset
    * commits — the nastiest kill window. No-op in production. */
  private[graft] var shipFault: Int => Unit = _ => ()

  final case class ShipStats(shipped: Int, skipped: Int, batches: Int)

  private def queueDir(replRoot: String, i: Int): Path =
    Paths.get(replRoot, "queue", f"batch_$i%05d")
  private def offsetFile(replRoot: String): Path = Paths.get(replRoot, "OFFSET")

  /** Ledger line: `v1 <lastCommitted> <batches> <minSeq> <width>`. */
  private final case class Ledger(last: Int, batches: Int, minSeq: Long, width: Long)

  private def readLedger(replRoot: String): Option[Ledger] = {
    val p = offsetFile(replRoot)
    if (!Files.exists(p)) None
    else Files.readString(p).trim.split(" ") match {
      case Array("v1", l, b, m, w) => Some(Ledger(l.toInt, b.toInt, m.toLong, w.toLong))
      case other => sys.error(s"corrupt replication offset ledger: ${other.mkString(" ")}")
    }
  }

  private def commitLedger(replRoot: String, lg: Ledger): Unit = {
    val p = offsetFile(replRoot)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling("OFFSET.tmp")
    Files.writeString(tmp, s"v1 ${lg.last} ${lg.batches} ${lg.minSeq} ${lg.width}\n")
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Ship the WAL (columns rowkey, qualifier, seq, op, value) into
    * `replRoot`'s queue as `batches` seq-range batches, resuming after
    * the recorded offset. Returns how many batches this call shipped
    * vs skipped (already committed by a previous call). */
  def ship(spark: SparkSession, wal: DataFrame, replRoot: String,
      batches: Int): ShipStats = {
    require(batches > 0, s"batches must be positive, got $batches")
    val required = Seq("rowkey", "qualifier", "seq", "op", "value")
    require(required.forall(wal.columns.contains),
      s"WAL must carry ${required.mkString(", ")}; got ${wal.columns.mkString(", ")}")
    // split geometry from the data, once (two tiny driver values)
    val Array(b) = wal.agg(min(col("seq")).cast("long"), max(col("seq")).cast("long"))
      .collect()
    require(!b.isNullAt(0), "WAL is empty — nothing to ship")
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val width = math.max(1L, (hi - lo) / batches + 1)
    val prior = readLedger(replRoot)
    prior.foreach { lg =>
      require(lg.batches == batches && lg.minSeq == lo && lg.width == width,
        s"resume geometry mismatch: ledger has (batches=${lg.batches}, minSeq=${lg.minSeq}, " +
          s"width=${lg.width}) but this WAL/batch-count derives ($batches, $lo, $width) — " +
          "refusing to mis-split the queue")
    }
    val from = prior.map(_.last).getOrElse(-1) + 1
    val tagged = wal.select(required.map(col): _*)
      .withColumn("batch", ((col("seq") - lit(lo)) / lit(width)).cast("int"))
    for (i <- from until batches) {
      tagged.filter(col("batch") === i).drop("batch")
        .write.mode("overwrite").parquet(queueDir(replRoot, i).toString)
      shipFault(i) // no-op in production; spec kills land HERE
      commitLedger(replRoot, Ledger(i, batches, lo, width))
    }
    ShipStats(shipped = batches - from, skipped = from, batches = batches)
  }

  /** Apply every COMMITTED batch (index ≤ offset) onto the replica
    * store at `storePath`: one cell-keyed last-write-wins window over
    * the shipped edits, deletes suppress, surviving puts flush.
    * Returns the number of cells flushed. */
  def applyShipped(spark: SparkSession, replRoot: String, storePath: String): Long = {
    val lg = readLedger(replRoot)
      .getOrElse(sys.error(s"no committed replication offset under $replRoot"))
    val dirs = (0 to lg.last).map(queueDir(replRoot, _).toString)
    val edits = spark.read.parquet(dirs: _*)
    val coordW = Window.partitionBy("rowkey", "qualifier").orderBy(col("seq").desc)
    val state = edits
      .withColumn("rn", row_number().over(coordW))
      .filter(col("rn") === 1 && col("op") === "put")
      .select("rowkey", "qualifier", "value")
    state.write.format("graft-kv").option("path", storePath).mode("append").save()
    spark.read.format("graft-kv").load(storePath).count()
  }

  /** VerifyReplication: per-qualifier cell counts and order-insensitive
    * content checksums on each side, joined into a convergence report.
    * Neither side's cells move to the other — each aggregates locally
    * and only k summary rows meet. */
  def verify(primary: DataFrame, replica: DataFrame): DataFrame = {
    def summarize(df: DataFrame, side: String): DataFrame =
      df.groupBy("qualifier").agg(
        count(lit(1)).as(s"${side}_cells"),
        sum(expr("CAST(conv(substr(md5(concat_ws('|', rowkey, qualifier, value)), 1, 7), 16, 10) AS BIGINT)"))
          .as(s"${side}_sum"))
    summarize(primary, "primary")
      .join(summarize(replica, "replica"), Seq("qualifier"), "full_outer")
      .withColumn("converged",
        col("primary_cells") <=> col("replica_cells") &&
          col("primary_sum") <=> col("replica_sum"))
      .orderBy("qualifier")
  }
}
