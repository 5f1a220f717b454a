package graft
import org.apache.spark.sql.SparkSession
object Bench {
  private def f3(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // df.count() would let Catalyst prune every unused projection,
    // window, and sort — projection-heavy keys would measure scan+count
    // only. toRdd runs the FULL final physical plan (all expressions,
    // sorts, windows) and only then counts the produced rows.
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.count()
    // Untimed warmup: JVM/codegen/session init otherwise lands on
    // whichever query happens to run first (~5s attribution noise).
    try exec(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    // A key that crashes must NOT masquerade as a fast one: record the
    // failure per key and surface an errors total in the JSON.
    // Optional comma-separated key filter for local iteration
    // (SPARK_GRAFT_KEYS=llm_dedup_minhash,llm_curation); driver sets none.
    val keyFilter = sys.env.get("SPARK_GRAFT_KEYS")
      .map(_.split(",").map(_.trim).toSet)
    val keysTotal = SparkEntry.queries.size
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => keyFilter.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { exec(fn(spark, sfDir)); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      val t = (System.nanoTime() - t0) / 1e9
      // Measure every key against a clean block manager: the dedup keys
      // pin localCheckpoint blocks that otherwise accumulate and tax the
      // (alphabetically) later keys with GC/memory pressure — the r2
      // driver bench showed 3–10× inflation clustered on the sorted tail.
      // Cleanup runs OUTSIDE the timed section.
      // blocking: removal must COMPLETE before the next key's t0, or the
      // async cleanup would execute inside the next timed section
      spark.catalog.clearCache()
      val pinned = spark.sparkContext.getPersistentRDDs.values
      pinned.foreach(_.unpersist(blocking = true))
      // Damp cross-key GC debt (r5 driver run: llm_dedup_near 3.5→5.6 s
      // with unchanged code): a block-pinning key leaves a tenured heap
      // the NEXT key pays to collect inside its timed section. Collect
      // it here, untimed, but only when blocks were actually pinned —
      // an unconditional gc per key would tax the wall ~98×.
      if (pinned.nonEmpty) System.gc()
      (name, t, ok)
    }
    val failed = results.collect { case (n, _, false) => n }
    val total = results.map(_._2).sum
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // total + errors lead the line so a truncated tail still carries them;
    // keys_run vs keys_total makes a filtered run self-identifying.
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","errors":${failed.size},"failed":$failedJson,"keys_run":${results.size},"keys_total":$keysTotal,"sf":"$sfDir","queries":$qs}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
