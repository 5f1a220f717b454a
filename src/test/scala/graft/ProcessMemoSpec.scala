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

/** The one allowed exception to populate-once, plus the Bench hygiene
  * contract around it: a DataFrame memo whose localCheckpoint blocks
  * died may be self-healed (re-put) by its owner — restore must then
  * DROP the entry (run 2 re-heals, repeating run 1's rebuild) instead
  * of crashing — and Bench's per-key unpersist pass must leave live
  * memo checkpoints alone so the heal path stays exceptional. */
class ProcessMemoSelfHealSpec extends SparkSpec {
  import graft.util.ProcessMemo

  test("restore drops a self-healed entry whose snapshot value is a dead checkpoint") {
    import scala.collection.concurrent.TrieMap
    val m = TrieMap.empty[String, org.apache.spark.sql.DataFrame]
    val dead = spark.range(5).toDF("v").localCheckpoint()
    m.put("index", dead)
    ProcessMemo.register("spec.heal", m)
    val snap = ProcessMemo.snapshot()

    // evict the blocks (what a hygiene pass or lost executor does), then
    // self-heal the entry the way the owners do: remove + rebuild + put
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    intercept[Throwable] { dead.count() } // lineage is truncated for good
    val healed = spark.range(5).toDF("v").localCheckpoint()
    m.put("index", healed)

    ProcessMemo.restore(snap)
    assert(!m.contains("index"),
      "a self-healed entry must be dropped on restore (run 2 re-heals honestly)")
  }

  test("liveMemoRddIds covers exactly the live DataFrame entries' checkpoint RDDs") {
    import scala.collection.concurrent.TrieMap
    val m = TrieMap.empty[String, org.apache.spark.sql.DataFrame]
    val df = spark.range(7).toDF("v").localCheckpoint()
    m.put("index", df)
    ProcessMemo.register("spec.live", m)
    val ids = ProcessMemo.liveMemoRddIds()
    val pinned = spark.sparkContext.getPersistentRDDs.keySet
    assert(ids.exists(pinned), "the live checkpoint's RDD id must be reported")
    // the Bench cleanup contract: unpersisting everything EXCEPT those
    // ids leaves the memoized frame readable
    spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => ids(id) }.values
      .foreach(_.unpersist(blocking = true))
    assert(df.count() == 7, "memo-backed checkpoint must survive the hygiene pass")
    m.remove("index")
  }
}
