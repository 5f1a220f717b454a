package graft.operators

import graft.SparkSpec

/** The large-star/small-star component resolver must label components by
  * their min id AND converge in logarithmic rounds — the whole point of
  * replacing label propagation (O(diameter)) for 100 TB chain-shaped
  * dup graphs.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def ccOf(pairs: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (labels, rounds) = LlmDedup.connectedComponents(pairs.toDF("doc_a", "doc_b"))
    (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("63-diameter chain resolves in logarithmic rounds") {
    val n = 64L
    val (labels, rounds) = ccOf((0L until n - 1).map(i => (i, i + 1)))
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L), "all chain nodes must label to the min")
    assert(rounds <= 10, s"took $rounds rounds for a ${n - 1}-diameter chain (propagation would take ~${n - 1})")
  }

  test("components are labeled independently by their own min") {
    val (labels, _) = ccOf(Seq((5L, 1L), (5L, 3L), (10L, 12L), (20L, 21L)))
    assert(labels == Map(1L -> 1L, 3L -> 1L, 5L -> 1L,
      10L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("an already-star graph converges in one confirming round") {
    val (labels, rounds) = ccOf(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    assert(labels == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
    assert(rounds == 1)
  }
}

/** The forward–backward coloring SCC is the DOCUMENTED degradation path
  * for `graph_scc`'s iterative-doubling closure (pair sets stop being
  * node²-safe at billion-node scale). These tests EXECUTE that path:
  * full ground truth on a 10,000-node graph the closure could not
  * safely attack, and algorithm-vs-algorithm agreement on the real
  * trade graph.
  */
class SccColoringSpec extends SparkSpec {

  test("coloring SCC recovers ground truth on a 10,000-node synthetic graph") {
    import spark.implicits._
    // 2000 disjoint 5-cycles (the true SCCs) + acyclic inter-cluster
    // tree edges pointing from HIGHER cluster ids to LOWER (children
    // feed parents), so colors genuinely cross cluster boundaries and
    // the outer peel loop must run multiple rounds. Ground truth:
    // scc_id(v) = 5 * (v / 5), 2000 components of size 5.
    val cycles = (0L until 10000L).map(v => (v, (v - v % 5) + (v + 1) % 5))
    val tree = for {
      k <- 0L until 2000L
      j <- 1L to 4L
      c = 4 * k + j if c < 2000L
    } yield (5 * c, 5 * k)
    val edges = (cycles ++ tree).toDF("s", "d")
    val labels = Graph.sccByColoring(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 10000, s"labeled ${labels.size} of 10000 nodes")
    val wrong = labels.collect { case (v, id) if id != v - v % 5 => v }
    assert(wrong.isEmpty, s"nodes labeled outside their 5-cycle: ${wrong.take(5)}")
    assert(labels.values.toSet.size == 2000)
  }

  test("coloring SCC agrees with the iterative-doubling closure on the trade graph") {
    val closure = run("graph_scc").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val coloring = Graph.sccByColoring(Graph.thresholdedEdges(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the closure key also labels edge-less nations (self pairs); the
    // coloring path only sees nodes with an incident edge — compare on
    // the overlap, which must agree exactly
    assert(coloring.nonEmpty)
    coloring.foreach { case (v, id) =>
      assert(closure(v) == id, s"node $v: coloring=$id closure=${closure(v)}")
    }
  }
}
