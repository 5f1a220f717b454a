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
  * POPULATE-ONCE is an enforced invariant, not an assumption (ADVICE
  * r13): the snapshot captures each retained key's VALUE alongside the
  * key, and restore fails loudly if a retained entry's value changed —
  * i.e. if any execution overwrote a pre-existing memo entry instead of
  * only adding new keys. A silent violation would mean restore keeps the
  * run-1 value and run 2 no longer repeats run 1's work. Every
  * registered map today is populate-once by construction (getOrElseUpdate
  * on a deterministic key); this turns that convention into a crash.
  *
  * Maps register lazily at owner-object init; a map first registered
  * DURING run 1 is absent from the snapshot and therefore fully cleared
  * by restore — which is exactly right, since every entry it holds was
  * added by run 1. */
object ProcessMemo {
  private final case class Entry(snap: () => Map[Any, Any], retain: Map[Any, Any] => Unit)
  private val registry = TrieMap.empty[String, Entry]

  /** A DataFrame-valued memo entry whose localCheckpoint blocks are gone
    * (evicted between runs) — the one legitimate reason an entry's value
    * may change after a snapshot: the owner's self-healing protocol
    * rebuilds a dead index instead of serving it. */
  private def isDeadDataset(v: Any): Boolean = v match {
    case ds: org.apache.spark.sql.Dataset[_] =>
      try { ds.count(); false } catch { case scala.util.control.NonFatal(_) => true }
    case _ => false
  }

  /** Register a memo map under a stable name (idempotent per name). The
    * map MUST be populate-once: entries may be added, never overwritten
    * — restore() enforces this on retained entries. The single allowed
    * exception is the self-healing rebuild of a DataFrame entry whose
    * checkpoint blocks died: restore then DROPS the entry (run 2
    * re-heals, repeating run 1's rebuild work — still honest). */
  def register[K, V](name: String, map: TrieMap[K, V]): Unit =
    registry.put(name, Entry(
      () => map.readOnlySnapshot().toMap.map { case (k, v) => (k: Any) -> (v: Any) },
      kept => map.keySet.toSeq.foreach { k =>
        kept.get(k: Any) match {
          case None => map.remove(k)
          case Some(v0) =>
            // Scala == on Array is reference identity — exactly the
            // "same object the snapshot saw" check we want for big
            // model artifacts; value types compare structurally.
            if (map.get(k).exists(v => (v: Any) != v0)) {
              // ADVICE r14: the self-heal drop must be VISIBLE — a
              // non-heal overwrite that merely coincides with dead
              // checkpoint blocks would otherwise pass unnoticed (the
              // liveness probe, a count() job, runs only on this rare
              // overwrite path, never on the healthy restore path).
              if (isDeadDataset(v0)) {
                System.err.println(s"[ProcessMemo] '$name': entry $k dropped on restore — " +
                  "its snapshot value is a dead Dataset (evicted checkpoint); run 2 re-heals")
                map.remove(k)
              }
              else sys.error(s"ProcessMemo '$name': entry $k was OVERWRITTEN after the " +
                "snapshot — registered memo maps must be populate-once, or the bench " +
                "rerun's honesty guarantee breaks (restore would keep the run-1 value)")
            }
        }
      }))

  /** Spark storage ids (RDD ids) backing live DataFrame-valued memo
    * entries. Bench's per-key hygiene pass (blanket unpersist of pinned
    * RDDs) must SKIP these: unpersisting a localCheckpoint truncates its
    * lineage for good, so the next consumer key aborts mid-job and the
    * self-heal rebuild lands INSIDE that key's timed section — the
    * memoized artifacts are the designed cross-key amortization, not
    * per-key garbage. */
  def liveMemoRddIds(): Set[Int] =
    registry.readOnlySnapshot().values.flatMap(_.snap().values).collect {
      case ds: org.apache.spark.sql.Dataset[_] =>
        ds.queryExecution.analyzed.collect {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
        }
    }.flatten.toSet

  /** Key→value contents of every registered map, by name. */
  def snapshot(): Map[String, Map[Any, Any]] =
    registry.readOnlySnapshot().toMap.map { case (n, e) => n -> e.snap() }

  /** Drop every memo entry not present in `state` (maps registered after
    * the snapshot retain nothing — all their entries are post-snapshot);
    * fail loudly if a retained entry's value was overwritten. */
  def restore(state: Map[String, Map[Any, Any]]): Unit =
    registry.readOnlySnapshot().foreach { case (n, e) =>
      e.retain(state.getOrElse(n, Map.empty))
    }
}
