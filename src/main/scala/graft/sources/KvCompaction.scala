package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** MAJOR COMPACTION for a graft-kv store — the HBase compaction analog
  * (SURVEY.md §2.A: the reference's store accumulates one immutable file
  * set per flush/ingest; HBase periodically rewrites them into fewer
  * sorted files). The operational driver at 100 TB is the SMALL-FILES
  * problem: a streaming ingest commits a file set per micro-batch, so a
  * day of 1-minute triggers leaves ~1440 file sets whose per-file open/
  * plan cost dominates scans and whose overlapping rowkey ranges defeat
  * the min/max file pruning. Compaction restores both properties.
  *
  * Shape: one distributed pass —
  *   read store → `repartitionByRange(target, rowkey, qualifier)` →
  *   `sortWithinPartitions` → graft-kv write (two-phase task commit,
  *   write-time stats) — into a scratch dir, then an atomic-ish
  *   directory swap. Range partitioning makes the output files
  *   NON-OVERLAPPING in rowkey order, so post-compaction the stats
  *   index prunes range scans to the single covering file (the HBase
  *   region/HFile layout, recovered). Sorting costs one shuffle — the
  *   price of re-establishing scan order, same as HBase's merge-sort
  *   compaction.
  *
  * Crash safety: the rewrite lands in `<store>.compact-tmp` under the
  * connector's own two-phase commit; the live dir is only touched in
  * the final swap (live → .compact-old, tmp → live, delete .compact-old).
  * A crash before the first move leaves the store untouched; if the
  * second move fails the old dir is moved back to the live path, so
  * readers never observe an empty store (a hard crash between the two
  * moves still leaves the data recoverable in `.compact-old`). At
  * cluster scale the swap becomes a manifest pointer flip
  * (HBase's file-tracker move) — the rewrite job is identical.
  *
  * NOT concurrency-safe vs writers: like HBase, compaction assumes it
  * owns the store for the swap instant (readers mid-scan hold open file
  * handles and finish on the old bytes under POSIX rename semantics).
  */
object KvCompaction {

  /** Result of one compaction: file counts before/after and the cell
    * total carried through (must be invariant). */
  final case class CompactStats(filesBefore: Int, filesAfter: Int, cells: Long)

  def compact(spark: SparkSession, storeRaw: String, targetFiles: Int): CompactStats = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    // normalize: a trailing slash OR "/." segment would make
    // "$store.compact-tmp" a CHILD of the live store and the final
    // swap a move-into-self
    val store = Paths.get(storeRaw).normalize.toString
    val before = KvFormat.dataFiles(store)
    require(before.nonEmpty, s"graft-kv compact: no data files under $store")
    // lossless-rewrite guard: cell count from the stats index when it
    // covers every file (O(files) metadata), else one counting scan
    // (e.g. hand-written fixture files without committed stats)
    val meta = KvMeta.read(store)
    val names = before.map(_.getFileName.toString)
    val cellsBefore =
      if (names.forall(meta.contains)) names.map(meta(_).cells).sum
      else spark.read.format("graft-kv").load(store).count()

    val tmp = s"$store.compact-tmp"
    val old = s"$store.compact-old"
    graft.util.Scratch.deleteTree(tmp)
    graft.util.Scratch.deleteTree(old)

    spark.read.format("graft-kv").load(store)
      .repartitionByRange(targetFiles, col("rowkey"), col("qualifier"))
      .sortWithinPartitions("rowkey", "qualifier")
      .write.format("graft-kv").option("path", tmp).mode("append").save()

    val cellsAfter = KvMeta.read(tmp).values.map(_.cells).sum
    if (cellsAfter != cellsBefore) {
      // a failed rewrite must not strand a store-sized scratch tree
      graft.util.Scratch.deleteTree(tmp)
      throw new IllegalArgumentException(
        s"compaction lost cells: $cellsBefore before, $cellsAfter after")
    }

    Files.move(Paths.get(store), Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    try Files.move(Paths.get(tmp), Paths.get(store), StandardCopyOption.ATOMIC_MOVE)
    catch {
      case scala.util.control.NonFatal(e) =>
        // the live path must never be left empty: put the old data back
        // so readers see the pre-compaction store instead of nothing.
        // If even the rollback fails, the ORIGINAL failure stays the
        // primary error (rollback suppressed onto it) and the tmp tree
        // is still reclaimed — never swallow the cause, never strand a
        // store-sized scratch dir
        try Files.move(Paths.get(old), Paths.get(store), StandardCopyOption.ATOMIC_MOVE)
        catch { case scala.util.control.NonFatal(rb) => e.addSuppressed(rb) }
        finally graft.util.Scratch.deleteTree(tmp)
        throw e
    }
    graft.util.Scratch.deleteTree(old)
    CompactStats(before.size, KvFormat.dataFiles(store).size, cellsAfter)
  }
}
