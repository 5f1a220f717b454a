package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Golden-output checksum harness (SURVEY.md §5.3 item 4): one md5 per
  * query key over the sf0.001 result (rows rendered with toJSON in the
  * query's own deterministic order). `GoldenSpec` compares against the
  * checked-in `src/test/resources/golden_sf0.001.json`; regenerate with
  * `sbt "runMain graft.GoldenDump"` after intentional result changes.
  */
object GoldenDump {

  def checksum(df: DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    df.toJSON.collect().foreach(r => md.update((r + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def checksums(spark: SparkSession, sfDir: String): Map[String, String] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // One broken key must not abort the other ~80 (mirrors Verify's
      // per-key isolation); the error text fails GoldenSpec by name.
      name -> (try checksum(fn(spark, sfDir)) catch {
        case e: Throwable => s"ERROR ${e.getClass.getSimpleName}: ${e.getMessage}".take(120)
      })
    }.toMap

  val goldenPath = "src/test/resources/golden_sf0.001.json"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sums = checksums(spark, sfDir)
    val json = sums.toSeq.sorted
      .map { case (k, v) => s"""  "$k": "$v"""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("src/test/resources"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(goldenPath), json)
    println(s"[golden] wrote ${sums.size} checksums to $goldenPath")
    spark.stop()
  }
}
