package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap
import graft.util.ProcessMemo

/** The bench rerun's honesty contract (ADVICE r12): restoring the memo
  * registry to its pre-run-1 key sets makes run 2 repeat run 1's exact
  * work — entries ADDED by run 1 are dropped (a cold key re-trains),
  * pre-existing entries survive (a key riding an earlier key's memo
  * stays warm), and maps first registered during run 1 are fully
  * cleared (everything they hold is post-snapshot by construction).
  * Plus (ADVICE r13): populate-once is ENFORCED — restore fails loudly
  * if a retained entry's value was overwritten after the snapshot. */
class ProcessMemoSpec extends AnyFunSuite {

  test("restore drops post-snapshot entries, keeps pre-existing ones, and clears late-registered maps") {
    val m = TrieMap.empty[String, Int]
    m.put("warm", 1)
    ProcessMemo.register("spec.m", m)
    val snap = ProcessMemo.snapshot()
    assert(snap("spec.m").keySet == Set[Any]("warm"))

    // run 1 adds an entry (cold key trained a model)
    m.put("cold", 2)
    ProcessMemo.restore(snap)
    assert(m.keySet == Set("warm"), "run-1 additions must be dropped, prior entries kept")

    // run 1 also initialized a NEW memoizing module (object init during
    // the run): absent from the snapshot, so restore clears it entirely
    val late = TrieMap.empty[String, Int]
    late.put("added-in-run1", 1)
    ProcessMemo.register("spec.late", late)
    ProcessMemo.restore(snap)
    assert(late.isEmpty && m.keySet == Set("warm"))

    // run 2 re-adds what run 1 added: the post-rerun state equals the
    // no-rerun state, so later keys amortize exactly as before
    m.put("cold", 2)
    late.put("added-in-run1", 1)
    val after = ProcessMemo.snapshot()
    assert(after("spec.m").keySet == Set[Any]("warm", "cold") &&
      after("spec.late").keySet == Set[Any]("added-in-run1"))
  }

  test("restore fails loudly when a retained entry was overwritten (populate-once enforcement)") {
    val m = TrieMap.empty[String, Array[Int]]
    val original = Array(1, 2, 3)
    m.put("model", original)
    ProcessMemo.register("spec.once", m)
    val snap = ProcessMemo.snapshot()

    // additions are fine, even content-equal ones under a new key
    m.put("extra", Array(1, 2, 3))
    ProcessMemo.restore(snap)
    assert(m.keySet == Set("model") && (m("model") eq original))

    // overwriting a pre-existing entry — even with equal content — must
    // crash restore: run 2 would otherwise silently keep the run-1 value
    m.put("model", Array(1, 2, 3))
    val e = intercept[RuntimeException] { ProcessMemo.restore(snap) }
    assert(e.getMessage.contains("OVERWRITTEN"))
  }
}
