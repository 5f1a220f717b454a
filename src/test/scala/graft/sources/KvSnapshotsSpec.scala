package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lifecycle invariants of the graft-kv named-snapshot manager that the
  * row-shaped `kv_snapshot_lifecycle` oracle can't express: immutability,
  * manifest-as-commit-mark, tamper detection, and delete semantics.
  */
class KvSnapshotsSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("kv_snapshots_spec").toString

  private def cells =
    graft.operators.Scans.scanKvModel(spark, sf).filter(col("rowkey") <= 5)

  test("create → restore roundtrips the cells exactly") {
    val root = freshRoot()
    KvSnapshots.create(cells, root, "s1")
    val restored = KvSnapshots.restore(spark, root, "s1")
    assert(restored.exceptAll(cells).count() == 0)
    assert(cells.exceptAll(restored).count() == 0)
  }

  test("snapshots are immutable: re-creating a name fails") {
    val root = freshRoot()
    KvSnapshots.create(cells, root, "s1")
    intercept[IllegalArgumentException] { KvSnapshots.create(cells, root, "s1") }
  }

  test("an uncommitted snapshot (no manifest) is invisible and unrestorable") {
    val root = freshRoot()
    KvSnapshots.create(cells, root, "s1")
    Files.delete(Paths.get(root, "s1", "MANIFEST.json")) // simulate a crash mid-create
    assert(KvSnapshots.list(root).isEmpty)
    intercept[IllegalArgumentException] { KvSnapshots.restore(spark, root, "s1") }
  }

  test("restore detects a tampered data file via the manifest checksum") {
    val root = freshRoot()
    KvSnapshots.create(cells, root, "s1")
    val f = KvFormat.dataFiles(Paths.get(root, "s1", "data").toString).head
    Files.write(f, "9\tq\tv\n".getBytes, StandardOpenOption.APPEND)
    val e = intercept[IllegalArgumentException] { KvSnapshots.restore(spark, root, "s1") }
    assert(e.getMessage.contains("bytes") || e.getMessage.contains("checksum"))
  }

  test("delete removes the snapshot; deleting a missing name fails loudly") {
    val root = freshRoot()
    KvSnapshots.create(cells, root, "s1")
    KvSnapshots.create(cells, root, "s2")
    KvSnapshots.delete(root, "s1")
    assert(KvSnapshots.list(root) == Seq("s2"))
    intercept[IllegalArgumentException] { KvSnapshots.delete(root, "s1") }
    // s2 unaffected and still restorable after s1's delete
    assert(KvSnapshots.restore(spark, root, "s2").count() == cells.count())
  }
}
