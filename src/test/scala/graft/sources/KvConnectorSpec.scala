package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM edge cases of the graft-kv connector pieces (the end-to-end
  * path is covered by the `source_kv_connector` oracle key + PlanSpec).
  */
class KvConnectorSpec extends AnyFunSuite {

  test("filters with null literals are not accepted for pushdown") {
    assert(!KvFilterEval.supports(EqualTo("rowkey", null)))
    assert(!KvFilterEval.supports(In("rowkey", Array(1L, null))))
    assert(KvFilterEval.supports(In("rowkey", Array[Any](1L, 2L))))
  }

  test("pushed string comparison follows UTF8 byte order, not UTF-16") {
    // U+1F600 (surrogate pair D83D DE00) vs U+FFFF: UTF-16 compareTo says
    // the emoji sorts BELOW, UTF-8 byte order says ABOVE — the reader
    // must agree with Spark's UTF8String order.
    val emoji = new String(Character.toChars(0x1F600))
    val high = "￿"
    assert(emoji.compareTo(high) < 0, "precondition: UTF-16 order disagrees")
    assert(UTF8String.fromString(emoji).compareTo(UTF8String.fromString(high)) > 0)
    assert(KvFilterEval.eval(GreaterThanOrEqual("value", high), 1L, "q", emoji))
  }

  test("writer rejects nulls and separator bytes instead of corrupting the file") {
    val dir = Files.createTempDirectory("kvspec").toString
    val w = new KvDataWriter(dir, 0, 0L)
    def row(q: String, v: String) =
      InternalRow(1L, UTF8String.fromString(q), UTF8String.fromString(v))
    intercept[IllegalArgumentException] { w.write(row("q\tx", "v")) }
    intercept[IllegalArgumentException] { w.write(row("q", "v\nx")) }
    intercept[IllegalArgumentException] { w.write(InternalRow(1L, null, UTF8String.fromString("v"))) }
    w.abort()
    assert(KvFormat.dataFiles(dir).isEmpty)
  }

  test("job abort deletes files already committed by tasks") {
    val dir = Files.createTempDirectory("kvspec").toString
    val w = new KvDataWriter(dir, 0, 0L)
    w.write(InternalRow(7L, UTF8String.fromString("q"), UTF8String.fromString("v")))
    val msg = w.commit()
    assert(KvFormat.dataFiles(dir).size == 1)
    new KvBatchWrite(dir).abort(Array(msg))
    assert(KvFormat.dataFiles(dir).isEmpty)
  }

  test("aborted task leaves no temp file behind") {
    val dir = Files.createTempDirectory("kvspec").toString
    val w = new KvDataWriter(dir, 3, 9L)
    w.write(InternalRow(7L, UTF8String.fromString("q"), UTF8String.fromString("v")))
    w.abort()
    val left = Files.list(Paths.get(dir))
    try assert(!left.iterator().hasNext) finally left.close()
  }
}
