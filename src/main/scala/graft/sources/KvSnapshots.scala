package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-snapshot lifecycle on the `graft-kv` cell store — the
  * reference utility's core object (SURVEY.md §2.A R1/R4/R5: create a
  * named immutable snapshot, restore it elsewhere, delete it).
  *
  * Layout: `<root>/<name>/data/` (.kv files) + `<root>/<name>/MANIFEST.json`.
  * The manifest is written AFTER the data and is the commit mark — a
  * crashed create leaves a data dir without a manifest, which restore
  * and list refuse to see, so half-written snapshots are never visible
  * (same job-level two-phase idea as the connector's task-level
  * rename-on-commit).
  *
  * Restore VERIFIES before it reads: every manifest entry must exist
  * with the recorded size and md5 — the read-back verification the
  * reference performs after an export. Local java.nio keeps the demo
  * hermetic; at scale the data write is the same distributed `graft-kv`
  * write and only the manifest/verify IO moves to the FileSystem API.
  */
object KvSnapshots {

  private def snapDir(root: String, name: String): Path = Paths.get(root, name)
  private def dataDir(root: String, name: String): Path = Paths.get(root, name, "data")
  private def manifest(root: String, name: String): Path =
    Paths.get(root, name, "MANIFEST.json")

  private def md5Hex(p: Path): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString

  /** Create the named snapshot from a (rowkey, qualifier, value) frame.
    * Snapshots are immutable: creating an existing name is an error. */
  def create(df: DataFrame, root: String, name: String): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"invalid snapshot name: $name")
    require(!Files.exists(snapDir(root, name)), s"snapshot $name already exists")
    val data = dataDir(root, name)
    df.write.format("graft-kv").option("path", data.toString).mode("append").save()
    val entries = KvFormat.dataFiles(data.toString).map { f =>
      val cells = { val s = Files.lines(f); try s.count() finally s.close() }
      (f.getFileName.toString, Files.size(f), md5Hex(f), cells)
    }
    val filesJson = entries.map { case (f, bytes, md5, cells) =>
      s"""    {"file": "$f", "bytes": $bytes, "md5": "$md5", "cells": $cells}"""
    }.mkString("[\n", ",\n", "\n  ]")
    val json =
      s"""{
         |  "name": "$name",
         |  "n_files": ${entries.size},
         |  "n_cells": ${entries.map(_._4).sum},
         |  "files": $filesJson
         |}
         |""".stripMargin
    Files.writeString(manifest(root, name), json, StandardCharsets.UTF_8)
  }

  private val EntryRe =
    """\{"file": "([^"]+)", "bytes": (\d+), "md5": "([0-9a-f]{32})", "cells": (\d+)\}""".r

  /** Verify the snapshot against its manifest, then open it through the
    * graft-kv DSv2 scan. Fails loudly on a missing manifest (uncommitted
    * or deleted snapshot) or any size/checksum mismatch (corruption). */
  def restore(spark: SparkSession, root: String, name: String): DataFrame = {
    val mf = manifest(root, name)
    require(Files.exists(mf), s"snapshot $name does not exist (no committed manifest)")
    val text = Files.readString(mf)
    val entries = EntryRe.findAllMatchIn(text).map(m =>
      (m.group(1), m.group(2).toLong, m.group(3))).toSeq
    require(entries.nonEmpty, s"snapshot $name has an empty/corrupt manifest")
    val data = dataDir(root, name)
    entries.foreach { case (f, bytes, md5) =>
      val p = data.resolve(f)
      require(Files.exists(p), s"snapshot $name: data file $f missing")
      require(Files.size(p) == bytes,
        s"snapshot $name: $f is ${Files.size(p)} bytes, manifest says $bytes")
      require(md5Hex(p) == md5, s"snapshot $name: $f fails its manifest checksum")
    }
    val extra = KvFormat.dataFiles(data.toString)
      .map(_.getFileName.toString).toSet -- entries.map(_._1).toSet
    require(extra.isEmpty, s"snapshot $name: unmanifested data files $extra")
    spark.read.format("graft-kv").load(data.toString)
  }

  /** Delete the named snapshot (manifest first, so a crashed delete
    * leaves an invisible — not half-readable — snapshot). */
  def delete(root: String, name: String): Unit = {
    val d = snapDir(root, name)
    require(Files.exists(d), s"snapshot $name does not exist")
    Files.deleteIfExists(manifest(root, name))
    val s = Files.walk(d)
    try s.sorted(Comparator.reverseOrder[Path]()).iterator().asScala
      .foreach(Files.delete)
    finally s.close()
  }

  /** Committed snapshots under the root (manifest present), sorted. */
  def list(root: String): Seq[String] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) Seq.empty
    else {
      val s = Files.list(r)
      try s.iterator().asScala.toSeq
        .filter(d => Files.exists(d.resolve("MANIFEST.json")))
        .map(_.getFileName.toString).sorted
      finally s.close()
    }
  }
}
