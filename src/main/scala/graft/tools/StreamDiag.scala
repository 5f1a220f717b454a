package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming micro-batch profiler (r19): run ts_*_stream keys solo under
  * the bench JVM config and print every StreamingQueryProgress durationMs
  * breakdown (triggerExecution, addBatch, getBatch, latestOffset,
  * queryPlanning, walCommit, commitOffsets) plus the state-operator
  * commit/total times — the instrument the r18 verdict asked for before
  * touching the ts_*_stream fixed cost ("measure the per-trigger idle
  * gap on a quiet window"). Usage:
  *   SPARK_GRAFT_SF_DIR=... java ... graft.tools.StreamDiag <key> [key...]
  */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpusStr = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cpus = cpusStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[q start ] ${e.name}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        val stateSummary = p.stateOperators.map { s =>
          s"op=${s.operatorName} rowsTotal=${s.numRowsTotal} updated=${s.numRowsUpdated} " +
            s"commitMs=${s.allUpdatesTimeMs}/${s.allRemovalsTimeMs}/${s.commitTimeMs} " +
            s"memUsed=${s.memoryUsedBytes} shards=${s.numShufflePartitions} " +
            s"loadedProviders=${s.numStateStoreInstances}"
        }.mkString(" | ")
        println(s"[progress] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${new java.util.TreeMap[String, java.lang.Long](dur)} $stateSummary")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[q end   ]")
    })
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.count()
    for (key <- args) {
      val t0 = System.nanoTime()
      exec(graft.SparkEntry.queries(key)(spark, sfDir))
      println(f"=== $key: ${(System.nanoTime() - t0) / 1e9}%.2f s ===")
    }
    spark.stop()
  }
}
