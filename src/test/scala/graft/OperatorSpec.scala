package graft

import org.apache.spark.sql.functions._

/** Cross-operator invariants (SURVEY.md §5.3): each test checks a
  * property that must hold regardless of data, catching logic errors
  * the per-key oracle can miss. All on sf0.001 for speed.
  */
class OperatorSpec extends SparkSpec {

  test("semi ∪ anti partitions the left side exactly") {
    val semi = run("join_semi").count()
    val anti = graft.operators.Joins.joinAnti(spark, sf).count()
    // semi(status=F) and anti(price>400k) use different predicates, so
    // check the partition property directly with a shared predicate:
    val cust = graft.sources.Tables.customer(spark, sf)
    val ord = graft.sources.Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
    val s = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val a = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(s + a == cust.count())
    assert(semi > 0 && anti > 0)
  }

  test("union_distinct == distinct(union_all)") {
    val all = run("set_union_all")
    val dist = run("set_union_distinct")
    assert(dist.count() == all.distinct().count())
  }

  test("intersect ⊆ each input; except ∩ second input = ∅") {
    val o = graft.sources.Tables.orders(spark, sf)
    val fKeys = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    val inter = run("set_intersect")
    val exc = run("set_except")
    assert(inter.join(fKeys, Seq("o_custkey"), "left_anti").count() == 0)
    assert(exc.join(fKeys.distinct(), Seq("o_custkey"), "inner").count() == 0)
  }

  test("exact dedup is idempotent") {
    val once = run("llm_dedup_exact")
    assert(once.groupBy("text_hash").count().filter(col("count") > 1).count() == 0)
    assert(once.count() == once.distinct().count())
  }

  test("replay dedup restores the original row count") {
    val deduped = run("ts_dedup_watermark").count()
    val original = graft.sources.Tables.events(spark, sf).count()
    assert(deduped == original)
  }

  test("cosine(v, v) == 1 for every vector") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val selfCos = e.select(
      round(expr(graft.operators.LlmVector.cosineExpr("embedding", "embedding")), 6).as("c"))
    assert(selfCos.filter(col("c") =!= 1.0).count() == 0)
  }

  test("running sum final row equals the group total") {
    val rs = run("win_running_sum")
    val finals = rs.groupBy("o_custkey").agg(max(col("running_total")).as("final_total"))
    val totals = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("expected"))
    val mismatches = finals.join(totals, Seq("o_custkey"))
      .filter(col("final_total") =!= col("expected")).count()
    assert(mismatches == 0)
  }

  test("jaccard pairs are canonical (a < b) and within (0, 1]") {
    val rows = run("llm_dedup_near").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0 && j <= 1.0)
    }
  }

  test("minhash-LSH recall: finds every exact-Jaccard pair above its threshold") {
    val exact = run("llm_dedup_near").select("doc_a", "doc_b") // J >= 0.8
    val lsh = run("llm_dedup_minhash").select("doc_a", "doc_b") // J >= 0.7
    assert(exact.join(lsh, Seq("doc_a", "doc_b"), "left_anti").count() == 0)
  }

  test("topk per group emits at most k rows per key, correctly ranked") {
    val tk = run("win_topk_per_group")
    assert(tk.groupBy("o_custkey").count().filter(col("count") > 3).count() == 0)
    val bad = tk.groupBy("o_custkey")
      .agg(min(col("o_totalprice")).as("mn"), max(col("rn")).as("mx"))
    assert(bad.filter(col("mx") > 3).count() == 0)
  }

  test("tumbling window counts cover every event exactly once") {
    val total = run("ts_tumbling").agg(sum("n")).collect()(0).getLong(0)
    assert(total == graft.sources.Tables.events(spark, sf).count())
  }

  test("sliding windows hold each event exactly 4 times") {
    val total = run("ts_sliding").agg(sum("n")).collect()(0).getLong(0)
    assert(total == 4 * graft.sources.Tables.events(spark, sf).count())
  }

  test("multimodal frame hashes match direct md5 of the text chunk") {
    val frames = run("mm_frame_sample")
    val docs = graft.sources.Tables.documents(spark, sf)
    val expected = docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, cast(length(text) div 64 as int) - 1), i -> struct(i as frame_idx, md5(cast(substring(text, i * 64 + 1, 64) as binary)) as h))"))
        .as("f"))
      .select(col("doc_id"), col("f.frame_idx"), col("f.h"))
      .filter(col("frame_idx") % 4 === 0)
    val joined = frames.join(expected, Seq("doc_id", "frame_idx"))
    assert(joined.count() == frames.count())
    assert(joined.filter(col("frame_md5") =!= col("h")).count() == 0)
  }

  test("ann-lsh neighbors always share the query's bucket") {
    val rows = run("llm_ann_lsh").collect()
    assert(rows.forall(_.getAs[String]("bucket").length == 8))
    assert(rows.forall(r => r.getAs[Int]("rn") <= 3))
  }
}

/** Streaming/batch equivalence as a test (also runnable standalone via
  * `runMain graft.streaming.StreamingDemo`). */
class StreamingSpec extends SparkSpec {
  test("streaming pipelines agree with batch operators on sf0.001") {
    val failures = graft.streaming.StreamingDemo.run(spark, sf)
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
