package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit tool: prints, for every registered query, the
  * operators that matter at 100 TB — scans (with PushedFilters /
  * ReadSchema pruning), join strategies, aggregates, exchanges — so a
  * reviewer can verify each plan is the one we'd want on a cluster.
  *
  * Usage: `sbt "runMain graft.PlanAudit [sfDir] [key...]"`
  */
object PlanAudit {
  private val interesting = Seq(
    "FileScan", "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct", "HashAggregate",
    "ObjectHashAggregate", "SortAggregate", "Exchange", "TakeOrderedAndProject",
    "WindowExec", "Window ", "WindowGroupLimit", "Expand", "Generate",
    "MapPartitions")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        println(s"===== $name =====")
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          plan.linesIterator
            .filter(l => interesting.exists(l.contains))
            .foreach(l => println("  " + l.trim.take(220)))
        } catch {
          case e: Throwable => println(s"  PLAN FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
