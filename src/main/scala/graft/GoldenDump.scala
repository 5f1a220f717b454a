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

  /** All 288 checksums, computed OVERLAPPED from a small driver thread
    * pool (guide §2.6: actions are only sequential because the driver
    * calls them sequentially). The serial pass spent ~14.5 min of the
    * r18 test wall on per-key fixed costs (micro-batch lifecycles, job
    * scheduling) while local[4] sat mostly idle — the r18 verdict's
    * top item is getting `sbt test` under the verify driver's budget.
    * Safety: every staging write is per-key-unique or synchronized
    * (stagedEventStream / mediaIn / runToMemory serialize themselves —
    * written for exactly this), trained-model memos serialize on their
    * cache locks, and each checksum folds its own df.toJSON rows in the
    * query's contract order, so values are identical to the serial pass. */
  def checksums(spark: SparkSession, sfDir: String): Map[String, String] = {
    val keys = SparkEntry.queries.toSeq.sortBy(_._1)
    val par = math.max(1, sys.env.getOrElse("GRAFT_GOLDEN_THREADS", "4").toInt)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    try {
      import scala.jdk.CollectionConverters._
      val tasks = keys.map { case (name, fn) =>
        new java.util.concurrent.Callable[(String, String)] {
          // One broken key must not abort the others (mirrors Verify's
          // per-key isolation); the error text fails GoldenSpec by name.
          def call(): (String, String) =
            name -> (try checksum(fn(spark, sfDir)) catch {
              case e: Throwable => s"ERROR ${e.getClass.getSimpleName}: ${e.getMessage}".take(120)
            })
        }
      }
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toMap
    } finally pool.shutdown()
  }

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
