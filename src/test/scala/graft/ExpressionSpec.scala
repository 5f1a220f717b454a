package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{DoubleSqL2, FloatDot}

/** The native float_dot expression: interpreted eval, codegen'd
  * execution, and the higher-order-function formulation must all agree
  * bit-for-bit (that equality is what keeps the DuckDB oracle valid
  * after the perf rewrite).
  */
class ExpressionSpec extends SparkSpec {

  private def lit(a: Array[Float]): Literal =
    Literal(ArrayData.toArrayData(a), ArrayType(FloatType))

  test("interpreted eval matches a plain scala fold") {
    val a = Array(0.25f, -1.5f, 3.0f)
    val b = Array(2.0f, 0.5f, -1.0f)
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    assert(FloatDot(lit(a), lit(b)).eval(null) == expected)
  }

  test("codegen'd result equals interpreted eval and zip_with/aggregate on real data") {
    graft.functions.VectorExprs.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sf).limit(50)
    val both = e.select(
      expr("float_dot(embedding, embedding)").as("native"),
      expr("aggregate(zip_with(embedding, embedding, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("two float_dot calls in one projection stay codegen'd (fresh locals)") {
    // Round-1 bug: fixed `n`/`acc`/`i` locals made the second call in the
    // same codegen scope fail Janino compilation and silently fall back to
    // interpreted eval. Non-null literal children mean no null-check
    // branches, so both loops land in one scope. Generating the projection
    // directly (no FALLBACK wrapper) turns that compile error into a
    // thrown exception instead of a silent downgrade.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    val d1 = FloatDot(lit(Array(1.0f, 2.0f)), lit(Array(3.0f, 4.0f)))
    val d2 = FloatDot(lit(Array(2.0f)), lit(Array(5.0f)))
    val proj = GenerateUnsafeProjection.generate(Seq(d1, d2))
    val row = proj(InternalRow.empty)
    assert(row.getDouble(0) == 11.0 && row.getDouble(1) == 10.0)
  }

  test("mismatched dimensions yield null (matches zip_with null-padding)") {
    graft.functions.VectorExprs.register(spark)
    val r = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT)))")
      .collect()(0)
    assert(r.isNullAt(0))
  }

  // --- double_sql2: the same discipline as float_dot (r15 verdict task 3
  // — the kernel shipped under every vector key's assignment path with
  // zero direct tests; a codegen-only bug would have surfaced as a
  // confusing cross-engine hash mismatch instead of a unit failure) ---

  private def dlit(a: Array[Double]): Literal =
    Literal(ArrayData.toArrayData(a), ArrayType(DoubleType))

  test("double_sql2 interpreted eval matches a plain scala fold") {
    val a = Array(0.25, -1.5, 3.0)
    val b = Array(2.0, 0.5, -1.0)
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + (x - y) * (x - y)
    }
    assert(DoubleSqL2(dlit(a), dlit(b)).eval(null) == expected)
  }

  test("double_sql2 codegen equals interpreted and the zip_with/aggregate fold on real data") {
    // The doc's exact claim: same left-to-right double accumulation as
    // aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0, +).
    graft.functions.VectorExprs.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sf).limit(50)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("va"),
        expr("transform(reverse(embedding), x -> CAST(x AS DOUBLE))").as("vb"))
    val both = e.select(
      expr("double_sql2(va, vb)").as("native"),
      expr("aggregate(zip_with(va, vb, (x, y) -> (x - y) * (x - y)), cast(0 as double), (acc, v) -> acc + v)").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("two double_sql2 calls in one projection stay codegen'd (fresh locals)") {
    // Same round-1 float_dot bug class: fixed `n`/`acc`/`d`/`i` locals
    // would fail Janino on the second call in one scope and silently
    // fall back to interpreted eval.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    val d1 = DoubleSqL2(dlit(Array(1.0, 2.0)), dlit(Array(3.0, 4.0)))
    val d2 = DoubleSqL2(dlit(Array(2.0)), dlit(Array(5.0)))
    val proj = GenerateUnsafeProjection.generate(Seq(d1, d2))
    val row = proj(InternalRow.empty)
    assert(row.getDouble(0) == 8.0 && row.getDouble(1) == 9.0)
  }

  test("double_sql2 mismatched dimensions and null inputs yield null") {
    graft.functions.VectorExprs.register(spark)
    val mism = spark.sql(
      "SELECT double_sql2(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), array(CAST(3.0 AS DOUBLE)))")
      .collect()(0)
    assert(mism.isNullAt(0))
    val nul = spark.sql(
      "SELECT double_sql2(CAST(NULL AS ARRAY<DOUBLE>), array(CAST(1.0 AS DOUBLE)))")
      .collect()(0)
    assert(nul.isNullAt(0))
  }

  test("double_sql2 type mismatch is rejected at analysis") {
    graft.functions.VectorExprs.register(spark)
    intercept[Exception] {
      // array<float> must NOT silently coerce — the kernel is the
      // double-precision Lloyd path; float inputs indicate a wiring bug.
      spark.sql("SELECT double_sql2(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT double_sql2(array(1, 2), array(3, 4))").collect()
    }
  }

  test("GraftExtensions installs double_sql2 through the real builder path") {
    import org.apache.spark.sql.SparkSession
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val r = s2.sql(
        """SELECT double_sql2(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
          |                   array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS d""".stripMargin)
        .collect()(0)
      assert(r.getDouble(0) == 8.0)
      intercept[Exception] { s2.sql("SELECT double_sql2(array(CAST(1.0 AS DOUBLE)))").collect() }
    } finally {
      // s2 must never LINGER as the default/active session (ADVICE r16):
      // clear unconditionally, then restore the suite session — but do
      // not stop() s2, which would kill the shared SparkContext under
      // the other suites.
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("rolling_hash equals the higher-order fold formulation on real docs") {
    graft.functions.TextExprs.register(spark)
    val d = graft.sources.Tables.documents(spark, sf).limit(100)
    val both = d.select(
      expr("rolling_hash(text)").as("native"),
      expr("""aggregate(
        |  transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1))),
        |  cast(0 as bigint),
        |  (h, c) -> (h * 31 + c) % 1000000007)""".stripMargin).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // empty string hashes to 0; codegen and interpreted agree
    assert(graft.functions.RollingHash.hash("") == 0L)
    val r = spark.sql("SELECT rolling_hash('')").collect()(0).getLong(0)
    assert(r == 0L)
  }

  test("null inputs yield null") {
    graft.functions.VectorExprs.register(spark)
    val r = spark.sql("SELECT float_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("type mismatch is rejected at analysis") {
    graft.functions.VectorExprs.register(spark)
    intercept[Exception] {
      spark.sql("SELECT float_dot(array(1, 2), array(3, 4))").collect()
    }
  }

  test("map-only PQ assignment equals the join-form argmin bit-for-bit (r19)") {
    // The fused Lloyd update assigns codewords with pqAssignExpr (nested
    // codebook literals + double_sql2 + array_min) instead of
    // pqArgmin(pqDistsArr(...)) (broadcast join + partial-agg min). The
    // two paths must agree EXACTLY — any divergence would silently
    // train a different codebook. Deterministic synthetic corpus: 24
    // vectors × 64 dims, codebook = first 16 vectors' components.
    import org.apache.spark.sql.functions._
    import graft.operators.LlmVector
    graft.functions.VectorExprs.register(spark)
    import spark.implicits._
    val ex = (0 until 24).flatMap { v =>
      (0 until 64).map { p =>
        // varied, sign-flipping values with ties broken by c_id order
        (v.toLong, p, math.sin(v * 17 + p * 3) * (1 + (p % 5)), p / 8L)
      }
    }.toDF("vec_id", "pos", "v", "sub")
    val init = ex.filter(col("vec_id") < 16)
      .select(col("sub"), col("vec_id").cast("int").as("c_id"), col("pos"),
        round(col("v"), 6).as("c"))
    val rows = init.collect()
    val exArr = LlmVector.exArrOf(ex)
    val joinForm = LlmVector.pqArgmin(
        LlmVector.pqDistsArr(exArr, LlmVector.centArrLocal(spark, rows)))
      .orderBy("vec_id", "sub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val mapForm = exArr
      .select(col("vec_id"), col("sub"),
        LlmVector.pqAssignExpr(LlmVector.pqModelOf(rows)).as("c_id"))
      .orderBy("vec_id", "sub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(joinForm.length == 24 * 8)
    assert(joinForm.toSeq == mapForm.toSeq)
  }

  test("GraftExtensions installs float_dot and rolling_hash through the real builder path") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate only applies extensions when it CREATES a session, so
    // clear the default/active session (the shared SparkContext is
    // reused) and restore afterwards — do NOT stop the new session, that
    // would kill the context under the other suites.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val r = s2.sql(
        """SELECT rolling_hash('abc') AS h,
          |  float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
        .collect()(0)
      assert(r.getLong(0) == graft.functions.RollingHash.hash("abc"))
      assert(r.getDouble(1) == 11.0)
      // arity is enforced, not silently truncated
      intercept[Exception] { s2.sql("SELECT rolling_hash('a', 31)").collect() }
      intercept[Exception] { s2.sql("SELECT rolling_hash()").collect() }
    } finally {
      // s2 must never LINGER as the default/active session (ADVICE r16):
      // clear unconditionally, then restore the suite session — but do
      // not stop() s2, which would kill the shared SparkContext under
      // the other suites.
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
