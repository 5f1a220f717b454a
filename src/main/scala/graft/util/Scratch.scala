package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import scala.jdk.CollectionConverters._

/** Process-scoped /tmp scratch hygiene shared by the operators that
  * stage data on local disk (snapshot roots, file-stream staging dirs):
  * recursive delete that also removes partially-written dirs a crashed
  * run left behind, plus a register-once JVM exit hook so concurrent
  * bench+verify JVMs clean up after themselves instead of accumulating
  * staging data across runs. */
object Scratch {

  def deleteTree(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }

  private val hooked = scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Delete `dir` when this JVM exits; at most one hook per dir no
    * matter how often a graded key re-runs in-process. */
  def deleteOnExit(dir: String): Unit =
    hooked.getOrElseUpdate(dir, { sys.addShutdownHook(deleteTree(dir)); () })

  /** The parquet part files of a written dir (no metadata/_SUCCESS). */
  def parquetFiles(dir: String): Seq[Path] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      finally s.close()
    }
  }
}
