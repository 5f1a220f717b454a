package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Stage-counter diagnostic main (r17): run any `SparkEntry.queries` keys
  * solo under the exact bench JVM config, printing per-stage task metrics
  * (run/cpu/gc time, shuffle bytes, spill). This is the tool that settled
  * the r15–r17 `join_skew_salted` question — the identical probe stage on
  * unchanged code+data recorded executorCpuTime of 94→1656 s across runs,
  * proving host memory-bandwidth contention inflates even CPU counters
  * (SCALE.md r17). Kept as the standard instrument for adjudicating any
  * future bench reading that a paired full run cannot explain:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.DiagPair <key> [key...]"`. */
object DiagPair {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_data/sf1")
    // Same thread-count source as Bench (ADVICE r17): a diagnostic that
    // hardcodes local[32] while the bench protocol runs another width
    // silently profiles a different configuration. Same fail-fast parse.
    val cpusStr = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cpus = try cpusStr.toInt catch {
      case _: NumberFormatException => sys.error(
        s"SPARK_GRAFT_CPUS must be an integer thread count, got '$cpusStr'")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        println(f"[stage ${si.stageId}%4d] tasks=${si.numTasks}%3d " +
          f"run=${tm.executorRunTime / 1000.0}%8.1fs cpu=${tm.executorCpuTime / 1e9}%8.1fs " +
          f"gc=${tm.jvmGCTime / 1000.0}%7.1fs " +
          f"shRead=${(tm.shuffleReadMetrics.localBytesRead + tm.shuffleReadMetrics.remoteBytesRead) / 1e6}%9.1fMB " +
          f"shWrite=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%9.1fMB " +
          f"spill=${tm.diskBytesSpilled / 1e6}%9.1fMB  ${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.count()
    def timeIt(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"=== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ===")
    }
    for (key <- args) {
      timeIt(key)(exec(graft.SparkEntry.queries(key)(spark, sfDir)))
    }
    spark.stop()
  }
}
