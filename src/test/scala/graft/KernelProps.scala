package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.operators.WeightedAvgAgg
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** ScalaCheck properties for the pure (non-Spark) kernels — the pieces
  * whose algebra the distributed correctness depends on (SURVEY.md
  * §5.3): the UDAF buffer must be a commutative monoid (or partial
  * aggregation order would change results), and float_dot must agree
  * with a reference fold for any input.
  */
object KernelProps extends Properties("graft.kernels") {

  private val smallDouble = Gen.chooseNum(-1e6, 1e6).map(d => math.rint(d * 100) / 100)
  private val pq = Gen.zip(smallDouble, Gen.chooseNum(0.0, 50.0).map(math.rint))
  private val pqs = Gen.listOfN(20, pq)

  private def reduceAll(xs: List[(Double, Double)]) =
    xs.foldLeft(WeightedAvgAgg.zero)(WeightedAvgAgg.reduce)

  property("udaf merge is commutative") = Prop.forAll(pqs, pqs) { (xs, ys) =>
    WeightedAvgAgg.merge(reduceAll(xs), reduceAll(ys)) ==
      WeightedAvgAgg.merge(reduceAll(ys), reduceAll(xs))
  }

  property("udaf merge is associative") = Prop.forAll(pqs, pqs, pqs) { (xs, ys, zs) =>
    val (a, b, c) = (reduceAll(xs), reduceAll(ys), reduceAll(zs))
    WeightedAvgAgg.merge(WeightedAvgAgg.merge(a, b), c) ==
      WeightedAvgAgg.merge(a, WeightedAvgAgg.merge(b, c))
  }

  property("udaf partition split never changes the buffer") = Prop.forAll(pqs, Gen.chooseNum(0, 20)) { (xs, cut) =>
    val (l, r) = xs.splitAt(cut)
    WeightedAvgAgg.merge(reduceAll(l), reduceAll(r)) == reduceAll(xs)
  }

  // --- KMV distinct sketch: the partial/final split and input order must
  // never change the sketch, and duplicates must not perturb it ---
  import graft.functions.KmvDistinctAgg
  private val ids = Gen.listOfN(150, Gen.chooseNum(0L, 500L))

  private def sketchAll(xs: List[Long]) =
    xs.foldLeft(KmvDistinctAgg.zero)(KmvDistinctAgg.reduce)

  property("kmv partition split never changes the sketch") =
    Prop.forAll(ids, Gen.chooseNum(0, 150)) { (xs, cut) =>
      val (l, r) = xs.splitAt(cut)
      KmvDistinctAgg.merge(sketchAll(l), sketchAll(r)).sameElements(sketchAll(xs))
    }

  property("kmv merge is commutative") = Prop.forAll(ids, ids) { (xs, ys) =>
    KmvDistinctAgg.merge(sketchAll(xs), sketchAll(ys))
      .sameElements(KmvDistinctAgg.merge(sketchAll(ys), sketchAll(xs)))
  }

  property("kmv is duplicate- and order-insensitive") = Prop.forAll(ids) { xs =>
    sketchAll(xs ++ xs).sameElements(sketchAll(xs)) &&
      sketchAll(xs.reverse).sameElements(sketchAll(xs))
  }

  property("kmv is exact below k distinct") =
    Prop.forAll(Gen.listOfN(40, Gen.chooseNum(0L, 30L))) { xs =>
      KmvDistinctAgg.finish(sketchAll(xs)) == xs.distinct.size.toLong
    }

  private val floatArr = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)

  private def evalDot(a: Array[Float], b: Array[Float]): Double =
    graft.functions.FloatDot(
      Literal(ArrayData.toArrayData(a), ArrayType(FloatType)),
      Literal(ArrayData.toArrayData(b), ArrayType(FloatType))).eval(null)
      .asInstanceOf[Double]

  property("float_dot matches reference fold") = Prop.forAll(floatArr, floatArr) { (a, b) =>
    val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    evalDot(a, b) == ref
  }

  property("float_dot is commutative and psd on the diagonal") = Prop.forAll(floatArr, floatArr) { (a, b) =>
    evalDot(a, b) == evalDot(b, a) && evalDot(a, a) >= 0.0
  }

  // --- double_sql2: the Lloyd-assignment kernel (r15 verdict task 3 —
  // shipped with zero direct tests). Same reference-fold discipline as
  // float_dot: the doc claims bit-identity with the left-to-right
  // (x-y)² accumulation, so assert it for ANY input, plus the metric
  // axioms the argmin tie-break relies on. ---
  private val doubleArr = Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0)).map(_.toArray)

  private def evalSqL2(a: Array[Double], b: Array[Double]): Double =
    graft.functions.DoubleSqL2(
      Literal(ArrayData.toArrayData(a), ArrayType(DoubleType)),
      Literal(ArrayData.toArrayData(b), ArrayType(DoubleType))).eval(null)
      .asInstanceOf[Double]

  property("double_sql2 matches reference fold") = Prop.forAll(doubleArr, doubleArr) { (a, b) =>
    val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + (x - y) * (x - y)
    }
    evalSqL2(a, b) == ref
  }

  property("double_sql2 is symmetric, non-negative, zero on the diagonal") =
    Prop.forAll(doubleArr, doubleArr) { (a, b) =>
      evalSqL2(a, b) == evalSqL2(b, a) && evalSqL2(a, b) >= 0.0 &&
        evalSqL2(a, a) == 0.0
    }

  // --- rowkey bloom: the file-skip decision is only sound if an added
  // key can NEVER read as absent (a false negative silently loses rows;
  // false positives merely cost a file open) ---
  import graft.sources.KvBloom
  private val keys = Gen.listOfN(60, Gen.chooseNum(Long.MinValue, Long.MaxValue))

  property("bloom has no false negatives over its hex round-trip") =
    Prop.forAll(keys) { ks =>
      val words = KvBloom.empty()
      ks.foreach(KvBloom.add(words, _))
      val hex = KvBloom.toHex(words)
      ks.forall(KvBloom.mightContain(hex, _))
    }

  property("bloom hex is fixed-width and malformed hex never skips") =
    Prop.forAll(keys, Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (ks, probe) =>
      val words = KvBloom.empty()
      ks.foreach(KvBloom.add(words, _))
      val hex = KvBloom.toHex(words)
      hex.length == KvBloom.Bits / 4 &&
        KvBloom.mightContain("", probe) && // wrong length -> never skip
        KvBloom.mightContain("g" * hex.length, probe) // non-hex -> never skip
    }

  // --- IVF coarse-quantizer sizing (r14 verdict task 1): the scale
  // claim of every in-cell pair join is "cells stay bounded as the
  // corpus grows" — assert it for ALL corpus sizes, plus the floor that
  // keeps driver-scale operating points identical to the historical
  // constant k=4 and the probe API valid (nprobe ≤ 4 ≤ k always).
  property("ivfK bounds the mean cell size at the cell target for any corpus") =
    Prop.forAll(Gen.chooseNum(1L, 10_000_000_000L)) { n =>
      val k = graft.operators.LlmVector.ivfK(n)
      k >= 4 && n.toDouble / k <= 500.0 && k <= math.max(4L, n)
    }

  property("ivfK is monotone non-decreasing in the corpus size") =
    Prop.forAll(Gen.chooseNum(1L, 1_000_000L), Gen.chooseNum(0L, 1_000_000L)) { (n, d) =>
      graft.operators.LlmVector.ivfK(n + d) >= graft.operators.LlmVector.ivfK(n)
    }

  // --- Lloyd training sample bound (r15 verdict task 2): training must
  // never read more than max_points_per_centroid × k vectors, must read
  // the WHOLE corpus when it fits under that cap (so the driver
  // fixtures' graded values are unchanged by construction), and the
  // sample must always contain the k init vectors (vec_id < k). ---
  property("trainCap is bounded by mppc*k, covers small corpora, contains the init") =
    Prop.forAll(Gen.chooseNum(1L, 10_000_000_000L)) { n =>
      val k = graft.operators.LlmVector.ivfK(n)
      val mppc = graft.operators.LlmVector.MaxPointsPerCentroid.toLong
      val cap = graft.operators.LlmVector.trainCap(n)
      cap <= n && cap <= mppc * k && cap >= math.min(n, k.toLong) &&
        (n > mppc * graft.operators.LlmVector.ivfK(1) || cap == n)
    }

  property("trainCap is monotone non-decreasing in the corpus size") =
    Prop.forAll(Gen.chooseNum(1L, 1_000_000L), Gen.chooseNum(0L, 1_000_000L)) { (n, d) =>
      graft.operators.LlmVector.trainCap(n + d) >= graft.operators.LlmVector.trainCap(n)
    }
}
