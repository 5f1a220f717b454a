package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Portable k-minimum-values (KMV / bottom-k) distinct-count sketch
  * (Bar-Yossef et al., "Counting distinct elements in a data stream").
  *
  * Keep the k smallest DISTINCT values of a uniform 48-bit hash of each
  * element. If fewer than k distinct hashes exist the count is exact;
  * otherwise the k-th minimum h_k estimates density and
  * E = (k-1)·M / h_k with M = 2^48 the hash space.
  *
  * Why this instead of `approx_count_distinct`: Spark's HLL register
  * layout is engine-specific, so the HLL key was the one oracle-exempt
  * query in rounds 1-2. KMV over md5 (identical in every engine, and
  * integer division only) is deterministic AND cross-engine checkable —
  * the DuckDB oracle reproduces the estimate bit-for-bit.
  *
  * Scale: the buffer is a sorted Array[Long] of ≤ k elements (~0.5 KB at
  * k = 64) regardless of input size, and merge is associative — the
  * same partial/final one-shuffle aggregate shape as any sum; this is
  * exactly why sketches replace exact count-distinct (whose Expand
  * doubles the shuffle) on 100 TB inputs.
  */
object KmvDistinctAgg extends Aggregator[Long, Array[Long], Long] {
  val K = 64
  val HashSpace: Long = 1L << 48

  // reduce() runs per input ROW: a getInstance("MD5") there would do a
  // JCA provider lookup + allocation per row on the aggregation hot
  // path. MD5 digests reset after digest(), so one instance per thread
  // serves every row that thread reduces.
  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 48 bits of md5(decimal string of the id) — matches
    * `md5(CAST(x AS VARCHAR))`'s first 12 hex chars in both engines. */
  private def h48(id: Long): Long = {
    val d = md5Local.get().digest(
      java.lang.Long.toString(id).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (0 until 6).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
  }

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(b: Array[Long], id: Long): Array[Long] = {
    val h = h48(id)
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // distinct sketch: hash already present
    else {
      val ins = -pos - 1
      if (b.length >= K && ins >= K) b // not among the k smallest
      else {
        val out = new Array[Long](math.min(b.length + 1, K))
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, out.length - ins - 1)
        out
      }
    }
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted distinct arrays keeping the k smallest distinct
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0; var j = 0; var n = 0
    var last = -1L // 48-bit hashes are non-negative
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (v != last) { out(n) = v; n += 1; last = v }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  def finish(b: Array[Long]): Long =
    if (b.length < K) b.length.toLong
    else (K - 1).toLong * HashSpace / b(K - 1) // floor div == DuckDB // for positives

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
