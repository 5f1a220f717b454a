package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Aggregation operators (SURVEY.md §2.B "Aggregations").
  *
  * Determinism: money/quantity sums run over DECIMAL(18,2) casts so the
  * aggregation is associative (partial/final agg order can't change the
  * result vs DuckDB); averages are computed as exact decimal sums divided
  * as doubles, then ROUND(6) on both sides (SURVEY.md §5.4).
  *
  * Scale posture: every query here is a partial+final HashAggregate over
  * a parquet scan with column pruning — the same plan shuffles only the
  * (few) group keys at 100 TB. No collect, no driver-side loops.
  */
object Aggregations {

  /** FLAGSHIP — TPC-H Q1 shape: pricing summary report over lineitem. */
  def aggPricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).as("raw_sum_qty"),
        sum(dec(col("l_extendedprice"))).as("raw_sum_base"),
        sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1).cast("decimal(8,6)") - col("l_discount").cast("decimal(8,6)"))).as("raw_sum_disc"),
        sum(col("l_extendedprice").cast("decimal(12,2)") * (lit(1).cast("decimal(8,6)") - col("l_discount").cast("decimal(8,6)")) * (lit(1).cast("decimal(8,6)") + col("l_tax").cast("decimal(8,6)"))).as("raw_sum_charge"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        col("raw_sum_qty").cast("decimal(18,2)").as("sum_qty"),
        col("raw_sum_base").cast("decimal(18,2)").as("sum_base_price"),
        col("raw_sum_disc").cast("decimal(18,2)").as("sum_disc_price"),
        col("raw_sum_charge").cast("decimal(18,2)").as("sum_charge"),
        r6(col("raw_sum_qty").cast("double") / col("count_order")).as("avg_qty"),
        r6(col("raw_sum_base").cast("double") / col("count_order")).as("avg_price"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val aggPricingSummaryOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
      |  ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 2) AS sum_disc_price,
      |  ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6))) AS DECIMAL(24,8)) * (CAST(1 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6)))), 2) AS sum_charge,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_pricing_summary" -> (aggPricingSummary _)
  )

  val oracle: Map[String, String] = Map(
    "agg_pricing_summary" -> aggPricingSummaryOracle
  )
}
