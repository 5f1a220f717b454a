package graft.util

import scala.collection.concurrent.TrieMap

/** Registry of the process-level memo maps (trained ANN models, staged
  * stream/media fixtures) so the bench harness can make its spike-damping
  * rerun honest (ADVICE r12): without this, run 2 of a memoizing key
  * skipped training entirely and `min(run1, run2)` graded a warm-memo
  * pass instead of damping an environmental spike.
  *
  * The invariant the harness wants is "run 2 repeats exactly run 1's
  * work", which is NOT the same as "clear everything": a key that RODE a
  * memo populated by an earlier key (the designed cross-key amortization
  * — e.g. `llm_ann_pq_recall` reusing `llm_ann_pq`'s codebooks) was warm
  * in run 1 and must stay warm in run 2, while a key that POPULATED a
  * memo in run 1 must re-populate it in run 2. Both fall out of one rule:
  * restore the memo maps to their pre-run-1 key sets before run 2 —
  * entries added by run 1 are dropped, pre-existing entries are kept.
  * Run 2 then re-adds whatever run 1 added, so the post-rerun state is
  * identical to the no-rerun state and later keys amortize exactly as
  * before.
  *
  * Maps register lazily at owner-object init; a map first registered
  * DURING run 1 is absent from the snapshot and therefore fully cleared
  * by restore — which is exactly right, since every entry it holds was
  * added by run 1. */
object ProcessMemo {
  private final case class Entry(snap: () => Set[Any], retain: Set[Any] => Unit)
  private val registry = TrieMap.empty[String, Entry]

  /** Register a memo map under a stable name (idempotent per name). */
  def register[K, V](name: String, map: TrieMap[K, V]): Unit =
    registry.put(name, Entry(
      () => map.keySet.toSet.map((k: K) => k: Any),
      keep => map.keySet.toSeq.foreach { k => if (!keep.contains(k: Any)) map.remove(k) }))

  /** Key sets of every registered map, by name. */
  def snapshot(): Map[String, Set[Any]] =
    registry.readOnlySnapshot().toMap.map { case (n, e) => n -> e.snap() }

  /** Drop every memo entry not present in `state` (maps registered after
    * the snapshot retain nothing — all their entries are post-snapshot). */
  def restore(state: Map[String, Set[Any]]): Unit =
    registry.readOnlySnapshot().foreach { case (n, e) =>
      e.retain(state.getOrElse(n, Set.empty))
    }
}
