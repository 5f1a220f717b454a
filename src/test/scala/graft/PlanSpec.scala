package graft

import org.apache.spark.sql.functions._

/** Structural plan assertions: the perf-critical physical-plan shapes
  * that SCALE.md promises must actually appear. Guards against silent
  * plan regressions (a lost broadcast hint, a filter that stops
  * reaching the scan) that correctness checks can't see.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  /** One QueryExecution per key, shared by the three whole-surface
    * sweeps below (CartesianProduct, non-equi-join audit, unpartitioned
    * Window). Each sweep used to rebuild all 288 frames — re-running
    * every staging write and re-optimizing every plan, ~3× the cost of
    * building the surface once (r18 verdict task 1a: the suite must fit
    * the verify driver's wall-clock budget). QueryExecution memoizes
    * its own phases, so the audits force exactly what they need. */
  private lazy val allQE: Seq[(String, org.apache.spark.sql.execution.QueryExecution)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (k, fn) =>
      k -> fn(spark, sf).queryExecution
    }

  test("scan_filter_pushdown pushes all predicates into the parquet reader") {
    val p = plan("scan_filter_pushdown")
    // (plan toString elides long filter lists with "..." — assert on the
    // stable prefix only)
    assert(p.contains("PushedFilters: [IsNotNull"), "no pushed filters in:\n" + p.take(800))
  }

  test("scan_project prunes to only the referenced columns") {
    val p = plan("scan_project")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_returnflag"), "unreferenced column not pruned")
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
    assert(plan("join_star_5way").contains("BroadcastHashJoin"))
  }

  test("graft-kv v2 scan pushes filters and prunes columns") {
    // (string assertions — AQE wraps the plan so a collect() over
    // executedPlan cannot reach the BatchScanExec before execution)
    val p = plan("source_kv_connector")
    assert(p.contains("BatchScan graft-kv"), "no v2 scan in:\n" + p.take(800))
    // both predicates are pushable, so the post-scan plan needs neither
    // qualifier nor the filters — the v2 scan must carry them
    assert(p.contains("EqualTo(qualifier,acctbal)") && p.contains("LessThanOrEqual(rowkey,500)"),
      "filters not pushed:\n" + p.take(800))
    assert(p.contains("ReadSchema: struct<rowkey:bigint,value:string>"),
      "columns not pruned:\n" + p.take(800))
  }

  test("graft-kv scan carries a pushed LIMIT in its plan") {
    val dir = java.nio.file.Files.createTempDirectory("planspec_kv").toString
    graft.operators.Scans.scanKvModel(spark, sf)
      .write.format("graft-kv").option("path", dir).mode("append").save()
    val p = spark.read.format("graft-kv").load(dir).limit(5)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedLimit: 5"), "limit not pushed into the kv scan:\n" + p.take(800))
  }

  test("kv_stats_pushdown plans a stats-only scan (no data-file read)") {
    val p = plan("kv_stats_pushdown")
    assert(p.contains("PushedAggregates: [count, min, max]"),
      "aggregates not pushed into the kv scan:\n" + p.take(800))
  }

  test("kv_stats_by_qualifier plans a grouped stats-only scan (no data-file read)") {
    val p = plan("kv_stats_by_qualifier")
    assert(p.contains("PushedAggregates: [group by qualifier: count]"),
      "grouped count not pushed into the kv scan:\n" + p.take(800))
  }

  test("sort+limit plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("sort_multikey_limit").contains("TakeOrderedAndProject"))
  }

  test("rank-filter top-k plans with partial WindowGroupLimit") {
    val p = plan("win_topk_per_group")
    assert(p.contains("WindowGroupLimit"), "WindowGroupLimit missing:\n" + p.take(800))
    assert(p.contains("Partial"), "partial (pre-shuffle) group limit missing")
  }

  test("EXISTS/NOT EXISTS decorrelate to semi + anti joins") {
    val p = plan("filter_exists")
    assert(p.contains("LeftSemi"), "EXISTS did not become a semi join:\n" + p.take(800))
    assert(p.contains("LeftAnti"), "NOT EXISTS did not become an anti join:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("NOT IN plans a broadcast null-aware anti join, never a cartesian") {
    val p = plan("join_not_in")
    assert(p.contains("LeftAnti"), "no anti join in:\n" + p.take(800))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "NOT IN set not broadcast:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("bitmap distinct combines map-side: the bit_or aggregate is partial") {
    val p = plan("agg_bitmap_distinct")
    assert(p.contains("partial_bit_or") || p.contains("partial bit_or") ||
      ("HashAggregate".r.findAllIn(p).size >= 4 && p.contains("bit_or")),
      "bit_or aggregate is not two-phase:\n" + p.take(1200))
  }

  test("bloom prefilter probes via broadcast of the word table") {
    val p = plan("llm_dedup_bloom")
    assert(p.contains("BroadcastHashJoin"), "bloom word join not broadcast:\n" + p.take(800))
  }

  test("aggregations are two-phase (partial + final HashAggregate)") {
    val p = plan("agg_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate")
  }

  test("decontamination broadcasts the eval gram set into a semi join") {
    // the 100 TB shape: corpus scan + broadcast semi join — a shuffled
    // semi join here would move the whole corpus's grams
    val p = plan("llm_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "eval gram semi join is not broadcast:\n" + p.take(800))
  }

  test("semdedup candidates come from a cell equi-join, not a nested loop") {
    // the whole point of SemDeDup vs llm_dedup_embed: candidate
    // generation must hash/merge-join on the quantizer cell id — a
    // nested-loop here would be the quadratic scan it exists to avoid
    val p = plan("llm_semdedup")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "semdedup pair join degenerated to a nested loop:\n" + p.take(800))
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"),
      "no equi join on the cell id:\n" + p.take(800))
  }

  test("keyless range join buckets into an equi join, never a nested loop") {
    // join_range_bucket has NO equi key in its semantics — the time
    // bucketing must manufacture one, or the plan is the O(n·m) BNLJ
    // it exists to kill
    val p = plan("join_range_bucket")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range-bucket join degenerated to a pair blowup:\n" + p.take(800))
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"),
      "no equi join on the time bucket:\n" + p.take(800))
  }

  test("snapshot diff plans one full-outer merge join on the cell key") {
    val p = plan("kv_snapshot_diff")
    assert(p.contains("FullOuter"), "diff lost its full-outer join:\n" + p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "diff join shape regressed:\n" + p.take(800))
  }

  test("bucketed fact⋈fact joins with zero exchange (co-located SMJ)") {
    // the entire point of join_bucketed: bucket i ⋈ bucket i directly,
    // no shuffle on either side — an Exchange anywhere in this plan
    // means the bucketing was not picked up
    val (liT, orT) = graft.operators.Joins.bucketedTables(spark, sf)
    try {
      val p = graft.operators.Joins.bucketedJoinFrame(spark, liT, orT)
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), "bucketed join is not a merge join:\n" + p.take(800))
      assert(!p.contains("Exchange"), "bucketed join still shuffles:\n" + p.take(800))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $liT")
      spark.sql(s"DROP TABLE IF EXISTS $orT")
    }
  }

  test("scan_partition_pruning prunes directories at planning time") {
    val p = plan("scan_partition_pruning")
    assert(p.contains("PartitionFilters: [") && p.contains("event_type"),
      "no partition filter reached the scan:\n" + p.take(800))
  }

  test("kv_secondary_index probes the index scan and broadcasts the join-back") {
    val p = plan("kv_secondary_index")
    assert(p.contains("EqualTo(rowkey,3)"),
      "index probe predicate not pushed into the kv scan:\n" + p.take(800))
    assert(p.contains("BroadcastHashJoin"),
      "index join-back is not broadcast:\n" + p.take(800))
  }

  test("graph edge aggregation broadcasts the dims (one fact-fact shuffle only)") {
    // asserted on the edge build itself: the pagerank/triangle plans
    // cut this lineage with localCheckpoint, so the final plans can't
    // witness it
    val p = graft.operators.Graph.tradeEdges(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "customer/supplier dim joins are not broadcast:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"), "edge build plans a CartesianProduct")
  }

  test("anomaly scoring broadcasts the per-type moment table") {
    assert(plan("ts_anomaly").contains("BroadcastHashJoin"),
      "ts_anomaly's stats join-back is not broadcast")
  }

  test("no plan contains a CartesianProduct") {
    allQE.foreach { case (k, qe) =>
      assert(!qe.executedPlan.toString.contains("CartesianProduct"),
        s"$k plans a CartesianProduct")
    }
  }

  test("whole surface: every non-equi join has a bounded side or is declared") {
    // the third whole-surface scale guard (r12): a join with no
    // cross-side equality plans as a nested loop — O(|L|·|R|) — which
    // is only acceptable when one side is provably at most one row (a
    // broadcast global-aggregate scalar, the idiom every recall/ratio
    // key uses). Anything else is a latent 100 TB quadratic. The two
    // deliberately-unbounded theta keys and the rebalancer's bounded
    // histogram theta-join (≤ region-count rows, data-dependent) are
    // declared here, not silently exempted.
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.expressions.PredicateHelper
    object H extends PredicateHelper {
      def split(e: Expression): Seq[Expression] = splitConjunctivePredicates(e)
    }
    // Declared exceptions, each with its boundedness story:
    //  - join_cross / join_theta_range: the deliberate theta keys,
    //    restricted to dimension tables by design;
    //  - kv_region_rebalance: broadcast histogram theta-join, bounded
    //    by the region count;
    //  - llm_sim_cosine_topk / llm_ann_rerank / llm_dedup_embed /
    //    str_fuzzy_match: DECLARED brute-force baselines — a broadcast
    //    query/dim batch against the corpus scan (their scaladocs carry
    //    the O(·) statement and the indexed keys are the scale path);
    //  - llm_pack_chunks: prefix theta-join on shard ids, bounded by
    //    the shard count, not the corpus.
    val declared = Set("join_cross", "join_theta_range", "kv_region_rebalance",
      "llm_sim_cosine_topk", "llm_ann_rerank", "llm_dedup_embed",
      "str_fuzzy_match", "llm_pack_chunks")
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    allQE.filterNot { case (k, _) => declared(k) }.foreach { case (k, qe) =>
      val optimized = qe.optimizedPlan
      optimized.foreach {
        case j @ Join(l, r, jt, cond, _) =>
          def spans(a: Expression, b: Expression): Boolean =
            a.references.nonEmpty && b.references.nonEmpty &&
              ((a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
                (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet)))
          val equi = cond.toSeq.flatMap(H.split).exists {
            case EqualTo(a, b) => spans(a, b)
            case EqualNullSafe(a, b) => spans(a, b)
            case _ => false
          }
          // single-column NOT IN: Or(a = b, isnull(a = b)) — Spark's
          // null-aware anti join, planned as a broadcast hash join
          val nullAwareAnti = jt == LeftAnti && cond.exists(c => c.collect {
            case e @ EqualTo(a, b) if spans(a, b) => e
          }.nonEmpty)
          // a side bounded by a SMALL CONSTANT (a range/local lookup
          // dim — explode-like fan-out, not a data-sized quadratic)
          val bounded = l.maxRows.exists(_ <= 64) || r.maxRows.exists(_ <= 64)
          if (!equi && !nullAwareAnti && !bounded)
            violations += s"$k: ${j.joinType} join with no equi key and no bounded side " +
              s"(l=${l.nodeName} maxRows=${l.maxRows}, r=${r.nodeName} maxRows=${r.maxRows}, cond=$cond)"
        case _ =>
      }
    }
    assert(violations.isEmpty,
      "non-equi joins without a bounded side:\n" + violations.mkString("\n"))
  }

  test("theta-range build side is pre-bounded by the derivable p_size-domain constant") {
    // r14 task 4: both BNLJ sides scaled with sf (18.9× at 10× data).
    // p_size ∈ [1, 50] (fixture domain) implies only s_suppkey ≤ 25 can
    // match, so the broadcast build side must carry that pre-filter —
    // bounding the nested loop by a constant at ANY corpus size.
    val p = plan("join_theta_range")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "theta key no longer a BNLJ:\n" + p.take(800))
    assert(p.contains("* 2) <= 50"),
      "supplier build side lost its p_size-domain bound:\n" + p.take(1200))
  }

  test("scan_dynamic_pruning injects a runtime pruning filter into the fact scan") {
    val p = plan("scan_dynamic_pruning")
    assert(p.toLowerCase.contains("dynamicpruning"),
      "no dynamicpruningexpression in the fact scan — DPP did not fire:\n" + p.take(1200))
  }

  test("null-safe join plans as a hash join, never a nested loop") {
    val p = plan("join_null_safe")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "EqualNullSafe fell out of the hash-join path:\n" + p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("correlated scalar subqueries decorrelate into aggregate joins") {
    val qe = run("filter_correlated").queryExecution
    // after decorrelation no per-row scalar subquery survives — the
    // optimized plan is aggregates + joins only
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    val survivors = qe.optimizedPlan.expressions.flatMap(_.collect {
      case s: ScalarSubquery => s
    })
    assert(survivors.isEmpty,
      "a correlated scalar subquery survived optimization (per-row execution at scale)")
    assert(qe.optimizedPlan.toString.contains("Join"),
      "decorrelation should produce an aggregate join")
  }

  test("Q2-shape correlated MIN under a join tree decorrelates fully") {
    // the two-level stress: the subquery body is itself a 4-table join
    // correlated on the outer part key — after optimization it must be
    // an aggregate joined back on p_partkey, with no per-row subquery
    // and no Cartesian anywhere in the plan
    val qe = run("filter_q2_min_cost").queryExecution
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    val survivors = qe.optimizedPlan.expressions.flatMap(_.collect {
      case s: ScalarSubquery => s
    })
    assert(survivors.isEmpty,
      "the Q2 correlated MIN subquery survived optimization")
    val p = plan("filter_q2_min_cost")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the dims should broadcast into both lineitem scans
    assert(p.contains("BroadcastHashJoin"), "dim chain not broadcast:\n" + p.take(800))
  }

  test("DAU/WAU trailing windows plan as equi joins — the range join is gone") {
    // the whole point of the offset-explode formulation: a naive
    // day BETWEEN d-6 AND d formulation would be a BroadcastNestedLoopJoin
    val p = plan("ts_dau_wau")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "trailing-window distinct degenerated to a range join:\n" + p.take(800))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "no equi join on the exploded window day:\n" + p.take(800))
  }

  test("DSIR scoring broadcasts the 256-row bucket ratio table") {
    assert(plan("llm_dsir").contains("BroadcastHashJoin"),
      "bucket ratio join is not broadcast — corpus would shuffle by bucket")
  }

  test("chi-square and Gini broadcast their metadata-sized margin/dim tables") {
    assert(plan("agg_chi_square").contains("BroadcastHashJoin"),
      "contingency margins not broadcast")
    assert(plan("agg_gini").contains("BroadcastHashJoin"),
      "customer dim join not broadcast")
  }

  test("kNN graph candidates come from the cell equi-join, not a nested loop") {
    // The graded key serves the memoized localCheckpoint (its own plan is
    // `Scan ExistingRDD` by design), so the pin targets the BUILD frame —
    // the exact plan that checkpoint materializes on first build.
    val p = graft.operators.LlmVector.knnGraphBuild(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "kNN graph pair join degenerated to a nested loop:\n" + p.take(800))
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"),
      "no equi join on the cell id:\n" + p.take(800))
  }

  test("no graded plan contains an unpartitioned (single-task) Window") {
    // An empty partitionSpec moves the ENTIRE input to one task — the
    // round-2 llm_pack_chunks scale-killer. Checked on the optimized
    // logical plan (AQE hides physical nodes before execution).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    allQE.foreach { case (k, qe) =>
      val bad = qe.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$k plans an unpartitioned Window (single task at scale)")
    }
  }

  test("LATERAL top-n decorrelates to a Window, never a per-row loop") {
    val p = plan("sql_lateral_topn")
    assert(p.contains("Window"), "no decorrelated window in:\n" + p.take(800))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "no keyed join-back in:\n" + p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("PQ serving scans codes against a broadcast distance table") {
    val p = plan("llm_ann_pq")
    assert(p.contains("BroadcastHashJoin"),
      "the query distance tables are not broadcast:\n" + p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("Q3 top-k avoids a global sort; Q5's cyclic join broadcasts its dims") {
    val p3 = plan("sql_q3_shipping_priority")
    assert(p3.contains("TakeOrderedAndProject"),
      "Q3's LIMIT 10 fell back to a global sort:\n" + p3.take(800))
    val p5 = plan("sql_q5_local_volume")
    assert(p5.contains("BroadcastHashJoin"), "Q5 dims not broadcast:\n" + p5.take(800))
    assert(!p5.contains("CartesianProduct") && !p5.contains("BroadcastNestedLoopJoin"))
  }

  test("GraftExtensions is load-bearing: band join plans a hash join only with it") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    // the naive trailing-window shape a user writes naturally — no equi
    // key, so stock Spark can only nested-loop it
    def bandJoin(s: SparkSession) = {
      val ev = graft.sources.Tables.events(s, sf)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), unix_micros(col("ts")).as("c_us"))
      p.join(c, col("c_us") >= col("p_us") - 600000000L && col("c_us") < col("p_us"))
        .groupBy("p_id").agg(count(lit(1)).as("n_clicks"))
        .orderBy("p_id")
    }
    val plain = bandJoin(spark)
    val plainPlan = plain.queryExecution.executedPlan.toString
    assert(plainPlan.contains("BroadcastNestedLoopJoin") ||
      plainPlan.contains("CartesianProduct"),
      "fixture query no longer nested-loops without the rule:\n" + plainPlan.take(600))
    // a second session on the SAME SparkContext with the extension
    // installed; default/active restored immediately after creation so
    // concurrently running suites never observe the swap
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val ext =
      try SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(spark)
        SparkSession.setActiveSession(spark)
      }
    val rewritten = bandJoin(ext)
    val extPlan = rewritten.queryExecution.executedPlan.toString
    assert(!extPlan.contains("BroadcastNestedLoopJoin") &&
      !extPlan.contains("CartesianProduct"),
      "BandJoinBucketing did not remove the nested loop:\n" + extPlan.take(1200))
    assert(extPlan.contains("SortMergeJoin") || extPlan.contains("ShuffledHashJoin") ||
      extPlan.contains("BroadcastHashJoin"),
      "no equi join after the band rewrite:\n" + extPlan.take(1200))
    // the rewrite is a pure plan upgrade: byte-identical result
    val a = plain.collect().map(_.toSeq)
    val b = rewritten.collect().map(_.toSeq)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y },
      "band rewrite changed the join result")
  }

  // a second session on the SAME SparkContext with the extension
  // installed; default/active restored immediately after creation so
  // concurrently running suites never observe the swap
  private def extSession(): org.apache.spark.sql.SparkSession = {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("Q17-shape correlated AVG threshold decorrelates fully") {
    // the aggregate-vs-own-group stress: both correlated aggregates
    // (COUNT and SUM over the outer row's own part) must collapse into
    // one per-partkey aggregate joined back — no per-row subquery, no
    // Cartesian, and the part dim broadcast
    val qe = run("filter_q17_avg_qty").queryExecution
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    val survivors = qe.optimizedPlan.expressions.flatMap(_.collect {
      case s: ScalarSubquery => s
    })
    assert(survivors.isEmpty,
      "a Q17 correlated aggregate subquery survived optimization")
    val p = plan("filter_q17_avg_qty")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"), "part dim not broadcast:\n" + p.take(800))
  }

  test("Q22-shape global-average gate plans an anti join, scalar subqueries run once") {
    val p = plan("sql_q22_global_cust")
    assert(p.contains("LeftAnti"), "NOT EXISTS did not become an anti join:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"))
    // the UNCORRELATED aggregates must appear as once-executed scalar
    // subqueries (broadcast scalars), not correlate to the outer row
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    val subs = run("sql_q22_global_cust").queryExecution.optimizedPlan
      .expressions.flatMap(_.collect { case s: ScalarSubquery => s })
    assert(subs.forall(_.outerAttrs.isEmpty),
      "a global-average subquery stayed correlated (per-row execution at scale)")
  }

  test("Q15-shape max-over-aggregated-view gates through a once-executed scalar") {
    // the revenue view is referenced twice (join input + MAX gate);
    // the gate must be an UNCORRELATED scalar subquery — one extra
    // aggregate over the k-row view, never a per-outer-row re-scan
    val qe = run("sql_q15_top_supplier").queryExecution
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    val subs = qe.optimizedPlan.collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case s: ScalarSubquery => s })
    assert(subs.nonEmpty, "the MAX gate vanished from the optimized plan:\n" +
      qe.optimizedPlan.toString.take(1600))
    assert(subs.forall(_.outerAttrs.isEmpty),
      "the MAX(total_rev) gate stayed correlated (per-row execution at scale)")
    val p = plan("sql_q15_top_supplier")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("Q7-shape symmetric-OR nation pair keeps both dim joins broadcast") {
    val p = plan("sql_q7_volume_shipping")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the OR-of-conjuncts degenerated to a nested loop:\n" + p.take(1600))
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 2,
      "both nation joins must broadcast:\n" + p.take(1600))
  }

  test("Q19-shape disjunction stays an equi hash join with a residual OR") {
    val p = plan("sql_q19_disjunctive_rev")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the OR-of-conjuncts broke the equi join:\n" + p.take(1600))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "no hash/merge join on p_partkey:\n" + p.take(1600))
  }

  test("Q6-shape join-free aggregate pushes its scan filters, plans no join") {
    val p = plan("sql_q6_forecast_revenue")
    assert(!p.contains("Join"), "Q6 must stay join-free:\n" + p.take(1600))
    // plan toString ELIDES long pushed-filter lists with "..." (the
    // scan_filter_pushdown caveat), so assert the stable prefix: the
    // date range is the first pushed comparison after the null guards —
    // if it shows, the pushdown path is live for the whole conjunction
    // (the DECIMAL-cast discount band is legitimately post-scan)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "no pushed filters on the lineitem scan:\n" + p.take(1600))
  }

  test("Q8-shape market share broadcasts its dims — never a nested loop") {
    val p = plan("sql_q8_market_share")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "a dim join degenerated:\n" + p.take(1600))
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 4,
      "the dims (incl. nation twice under different roles) must broadcast:\n" + p.take(1600))
  }

  test("Q4-shape EXISTS decorrelates to a semi join, never a per-row subquery") {
    val p = plan("sql_q4_order_priority")
    assert(p.contains("LeftSemi"),
      "EXISTS did not decorrelate to a LEFT SEMI join:\n" + p.take(1600))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the semi join degenerated:\n" + p.take(1600))
  }

  test("Q9-shape profit rollup broadcasts its dims and pushes the LIKE") {
    val p = plan("sql_q9_product_profit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "a dim join degenerated:\n" + p.take(1600))
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 3,
      "part/supplier/nation must broadcast:\n" + p.take(1600))
    // the LIKE gate must reach the part scan (prefix assert — the
    // pushed-filter list elides)
    assert(p.contains("PushedFilters: [IsNotNull(p_name)") ||
      p.contains("StringContains(p_name,bolt)"),
      "p_name LIKE not pushed to the part scan:\n" + p.take(1600))
  }

  test("Q21-shape EXISTS + NOT EXISTS plan as one semi and one anti join") {
    val p = plan("sql_q21_waiting_supplier")
    assert(p.contains("LeftSemi"), "EXISTS did not become a semi join:\n" + p.take(1200))
    assert(p.contains("LeftAnti"), "NOT EXISTS did not become an anti join:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "a predicate subquery degenerated to a per-row loop:\n" + p.take(1200))
  }

  test("Q18-shape IN over an aggregated HAVING plans aggregate-then-semi-join") {
    val qe = run("sql_q18_large_orders").queryExecution
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    // the semi probe side must be the collapsed order-grain aggregate,
    // not raw lineitem rows
    val semiWithAgg = qe.optimizedPlan.collect {
      case j: Join if j.joinType == LeftSemi &&
        j.right.collectFirst { case a: Aggregate => a }.nonEmpty => j
    }
    assert(semiWithAgg.nonEmpty,
      "no semi join probing an aggregated subquery in the optimized plan")
    val p = plan("sql_q18_large_orders")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("IVFADC prunes by cell before ADC-scoring — never the full codes table") {
    val p = plan("llm_ann_ivfpq")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // two broadcasts must both appear: the probe list joining the
    // cell-tagged corpus (candidate generation) and the per-query ADC
    // distance tables joining the candidate codes
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "expected the cell-candidate broadcast AND the ADC-table broadcast:\n" + p.take(1600))
    assert(p.contains("cell"), "no cell-keyed candidate join in:\n" + p.take(1600))
    // the behavioral pin that the plan strings can't express: the ADC
    // aggregate's input pairs are a strict subset of the full-corpus
    // scan `llm_ann_pq` performs
    val pruned = graft.operators.LlmVector.ivfPqAdc(spark, sf).count()
    val full = graft.operators.LlmVector.pqAdc(spark, sf).count()
    assert(pruned < full,
      s"IVFADC scored $pruned pairs but the full ADC scan scores $full — no pruning happened")
  }

  test("residual IVFPQ: prunes by cell and its codebook reconstructs better than raw") {
    // the candidate-set pin mirrors the raw composition's; the SSE pin
    // is the SYSTEMATIC residual-encoding claim (top-3 recall on the
    // 90-possible clusterless fixture is noise-dominated and flips
    // sign between SFs — reconstruction SSE does not)
    val pruned = graft.operators.LlmVector.resIvfPqAdc(spark, sf).count()
    val full = graft.operators.LlmVector.pqAdc(spark, sf).count()
    assert(pruned < full,
      s"residual IVFADC scored $pruned pairs vs full scan $full — no pruning happened")
    val (rawSse, resSse) = graft.operators.LlmVector.pqCodeSse(spark, sf)
    assert(resSse < rawSse,
      s"residual codebook SSE $resSse is not below raw $rawSse — residual encoding buys nothing")
  }

  test("AQE splits a skewed shuffle-join partition at runtime (OptimizeSkewedJoin)") {
    // the one join-family scale claim that lived only in a comment
    // (Joins.scala header): at 100 TB a skewed fact⋈fact join is the
    // most common scale-killer, and the engine's posture is "AQE
    // handles it". Force the situation — 90% of a 500k-row side on ONE
    // key, broadcast disabled, thresholds lowered to test scale — and
    // pin that OptimizeSkewedJoin actually split the skewed partition,
    // with the result byte-identical to the unsplit run.
    def fixture(s: org.apache.spark.sql.SparkSession) = {
      val left = s.range(0, 500000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val right = s.range(0, 1000).select(col("id").as("k"), (col("id") * 7).as("w"))
      left.join(right, "k")
        .agg(count(lit(1)).as("n"),
          sum(col("v")).as("chk_v"), sum(col("w")).as("chk_w"))
    }
    def session(skew: Boolean) = {
      val s = spark.newSession()
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", skew.toString)
      // the threshold math at test scale: the key-0 partition carries
      // 450k of 500k rows (~7 MB of shuffle bytes), the other 7
      // partitions ~100 KB each — so 256 KB + factor 2 marks exactly
      // one partition skewed, and the 64 KB advisory target forces a
      // genuine multi-way split, not a boundary no-op
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      s
    }
    val withSkew = fixture(session(skew = true))
    val got = withSkew.collect().map(_.toSeq).toSeq
    // adaptive plans finalize during execution — inspect AFTER collect
    val plan = withSkew.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), "AQE did not finalize:\n" + plan.take(800))
    assert(plan.contains("skew=true"),
      "OptimizeSkewedJoin did not split the skewed partition:\n" + plan.take(1600))
    val unsplit = fixture(session(skew = false))
    val expected = unsplit.collect().map(_.toSeq).toSeq
    assert(!unsplit.queryExecution.executedPlan.toString.contains("skew=true"))
    assert(got == expected,
      s"skew-split run diverged from unsplit run:\n$got\nvs\n$expected")
  }

  test("broadcast joins revert to SortMergeJoin when dims outgrow the threshold, results identical") {
    // SCALE.md's claim that the sf0.1 broadcast plans "revert to
    // SortMergeJoin on the fact side" at 100 TB was asserted, never
    // shown (r13 verdict task 2). Simulate dims outgrowing the driver
    // threshold by disabling broadcast in a fresh session and pin BOTH
    // halves: the five-dim q8 plan (pinned >=4 BroadcastHashJoins at
    // default config elsewhere in this suite) really becomes
    // SortMergeJoins, and the result is byte-identical — the property
    // that makes the same declarative plan safe at any scale.
    val expected = run("sql_q8_market_share").collect().map(_.toSeq).toSeq
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val reverted = SparkEntry.queries("sql_q8_market_share")(s, sf)
    val got = reverted.collect().map(_.toSeq).toSeq
    // adaptive plans finalize during execution — inspect AFTER collect
    val plan = reverted.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      "a broadcast join survived threshold -1 — the reversion claim is false:\n" + plan.take(1600))
    assert(plan.contains("SortMergeJoin"),
      "no SortMergeJoin in the reverted plan:\n" + plan.take(1600))
    assert(got == expected,
      s"SMJ-shape run diverged from the broadcast-shape run:\n$got\nvs\n$expected")
  }

  test("band rule: exact integer buckets survive epoch-nanos magnitudes") {
    // BIGINT nanosecond timestamps (~1.7e18) with a 150 ns band: a
    // Double-cast bucket id has an ulp of 256 ns here — floor(x/W) can
    // misround by whole buckets, and the old fixed ±1 slack silently
    // dropped matches. The exact integer floor-division path must keep
    // the rewrite lossless; the nested-loop plan is the ground truth.
    import org.apache.spark.sql.SparkSession
    def q(s: SparkSession) = {
      val base = 1700000000000000000L
      val purchases = s.range(0, 400)
        .select((lit(base) + col("id") * 1000L).as("p_ns"), col("id").as("p_id"))
      val clicks = s.range(0, 4000)
        .select((lit(base) + pmod(col("id") * 97L, lit(400000L))).as("c_ns"),
          col("id").as("c_id"))
      purchases.join(clicks,
          col("c_ns") >= col("p_ns") - 150L && col("c_ns") < col("p_ns"))
        .groupBy("p_id").agg(count(lit(1)).as("n_clicks"))
        .orderBy("p_id")
    }
    val plain = q(spark)
    assert(plain.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin") ||
      plain.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val rewritten = q(extSession())
    val extPlan = rewritten.queryExecution.executedPlan.toString
    assert(!extPlan.contains("BroadcastNestedLoopJoin") && !extPlan.contains("CartesianProduct"),
      "band rule declined the epoch-nanos band:\n" + extPlan.take(1200))
    assert(extPlan.contains("SortMergeJoin") || extPlan.contains("ShuffledHashJoin") ||
      extPlan.contains("BroadcastHashJoin"), "no equi join:\n" + extPlan.take(1200))
    val a = plain.collect().map(_.toSeq)
    val b = rewritten.collect().map(_.toSeq)
    assert(a.nonEmpty, "fixture produced no matches — the test proves nothing")
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y },
      "exact-integer band rewrite lost or invented matches at nanos magnitude")
  }

  test("band rule: exact buckets are overflow-total at the Long-range edge") {
    // Full-range 64-bit keys within |offset| of Long.MaxValue (r12
    // advice): the old exact path formed x + off in raw Long arithmetic,
    // so the build-side bucket range wrapped and silently LOST matches.
    // With ANSI off, Spark's own predicate Add also wraps — so a pair
    // can legitimately match THROUGH the wrapped bounds (b near +2⁶³,
    // a near −2⁶³), and the rewrite must preserve those too. The
    // nested-loop plan under identical session conf is the ground truth.
    import org.apache.spark.sql.SparkSession
    val M = Long.MaxValue
    def session(ext: Boolean): SparkSession = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      try {
        val b = SparkSession.builder().master("local[4]")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.ansi.enabled", "false")
          .config("spark.ui.enabled", "false")
        (if (ext) b.withExtensions(new GraftExtensions) else b).getOrCreate()
      } finally {
        SparkSession.setDefaultSession(spark)
        SparkSession.setActiveSession(spark)
      }
    }
    def q(s: SparkSession) = {
      import s.implicits._
      // (M-250, M-400) and (M-9850, M-10000) match in true math;
      // (Min+100, M-50) matches ONLY via the wrapped bounds; and
      // (M-50, M-200) matches in true math but is REJECTED by Spark's
      // own wrapped upper bound (b+250 wraps to Min+49) — the rewrite
      // must reproduce all four behaviors, not mathematical truth
      val probe = Seq(M - 50L, M - 250L, M - 9850L, Long.MinValue + 100L).toDF("a")
      val build = Seq(M - 200L, M - 400L, M - 10000L, M - 50L).toDF("b")
      probe.join(build,
          col("a") >= col("b") + 100L && col("a") <= col("b") + 250L)
        .select("a", "b")
    }
    val plainS = session(ext = false)
    val plain = q(plainS)
    assert(plain.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin") ||
      plain.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val groundTruth = plain.collect().map(_.toSeq).sortBy(_.toString)
    assert(groundTruth.length == 3,
      s"fixture expected 3 matches (incl. one wrapped-only), got ${groundTruth.length}")
    val rewritten = q(session(ext = true))
    val extPlan = rewritten.queryExecution.executedPlan.toString
    assert(!extPlan.contains("BroadcastNestedLoopJoin") && !extPlan.contains("CartesianProduct"),
      "band rule declined the Long-edge band:\n" + extPlan.take(1200))
    val got = rewritten.collect().map(_.toSeq).sortBy(_.toString)
    assert(groundTruth.toSeq == got.toSeq,
      s"Long-edge band rewrite diverged:\nexpected ${groundTruth.toSeq}\ngot      ${got.toSeq}")
  }

  test("band rule: timestamp ± INTERVAL bands plan a hash join on epoch micros") {
    // the interval-written trailing-window query (`ts BETWEEN p.ts -
    // INTERVAL 10 MINUTES AND p.ts`) — r10's rule only fired on numeric
    // bases, leaving this natural form a nested loop
    import org.apache.spark.sql.SparkSession
    def q(s: SparkSession) = {
      val ev = graft.sources.Tables.events(s, sf)
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
        .createOrReplaceTempView("g_band_p")
      ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("ts").as("c_ts"))
        .createOrReplaceTempView("g_band_c")
      s.sql(
        """SELECT p_id, COUNT(*) AS n_clicks
          |FROM g_band_p JOIN g_band_c
          |  ON c_ts BETWEEN p_ts - INTERVAL 10 MINUTES AND p_ts
          |GROUP BY p_id ORDER BY p_id""".stripMargin)
    }
    val plain = q(spark)
    assert(plain.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin") ||
      plain.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "interval fixture no longer nested-loops without the rule")
    val rewritten = q(extSession())
    val extPlan = rewritten.queryExecution.executedPlan.toString
    assert(!extPlan.contains("BroadcastNestedLoopJoin") && !extPlan.contains("CartesianProduct"),
      "band rule did not fire on the timestamp-interval band:\n" + extPlan.take(1200))
    assert(extPlan.contains("SortMergeJoin") || extPlan.contains("ShuffledHashJoin") ||
      extPlan.contains("BroadcastHashJoin"), "no equi join:\n" + extPlan.take(1200))
    val a = plain.collect().map(_.toSeq)
    val b = rewritten.collect().map(_.toSeq)
    assert(a.nonEmpty)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y },
      "interval band rewrite changed the join result")
  }
}
