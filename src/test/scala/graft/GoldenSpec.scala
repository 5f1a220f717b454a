package graft

/** Regression net: every query's sf0.001 result must hash to the
  * checked-in golden checksum (regenerate intentionally via
  * `sbt "runMain graft.GoldenDump"`). Catches silent result drift that
  * a rows-runnable check would miss, without needing DuckDB.
  */
class GoldenSpec extends SparkSpec {
  test("all query results match golden checksums on sf0.001") {
    val path = java.nio.file.Paths.get(GoldenDump.goldenPath)
    assert(java.nio.file.Files.exists(path), s"missing $path — run graft.GoldenDump")
    val golden = java.nio.file.Files.readString(path)
      .split("\n").map(_.trim).filter(_.contains("\": \""))
      .map { l =>
        val parts = l.split("\": \"")
        parts(0).replaceAll("[\"{},]", "").trim -> parts(1).replaceAll("[\",]", "").trim
      }.toMap
    val actual = GoldenDump.checksums(spark, sf)
    val allKeys = golden.keySet ++ actual.keySet
    val diffs = allKeys.toSeq.sorted.flatMap { k =>
      (golden.get(k), actual.get(k)) match {
        case (Some(g), Some(a)) if g == a => None
        case (g, a) => Some(s"$k: golden=${g.getOrElse("-")} actual=${a.getOrElse("-")}")
      }
    }
    assert(diffs.isEmpty, "golden mismatches:\n" + diffs.mkString("\n"))
  }
}
