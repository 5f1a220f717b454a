package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Multimodal-column operators (builder mandate: image/audio/video as
  * opaque binary columns with typed metadata).
  *
  * The container has no media codecs, so the DECODE step is a clearly
  * marked deterministic stub ([[MediaCodecStub]]) — but the Spark-side
  * plumbing is real and tested: a typed `Dataset[MediaIn]` feeding
  * `mapPartitions` (the Scala analog of `mapInPandas`: one iterator per
  * partition = one batch per task, decoder state amortized across the
  * partition), binary payload columns, and a flatMap frame extractor.
  *
  * Scale posture: decode is embarrassingly parallel over partitions —
  * no shuffle at all; at 100 TB the only knob is input split size
  * (`spark.sql.files.maxPartitionBytes`) and the stub swap-in of a real
  * codec. Because the stub derives metadata arithmetically from the
  * payload bytes, every key still has an exact DuckDB oracle.
  */
object Multimodal {

  /** Opaque media record: what a real pipeline would read from a blob
    * store. Payload here is the UTF-8 bytes of the document text. */
  case class MediaIn(doc_id: Long, payload: Array[Byte])

  case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
      width: Int, height: Int, n_frames: Int)

  case class MediaFrame(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** ??? -- REAL CODEC GOES HERE. Deterministic fake decode in lieu of
    * image/audio libs (not in this container): metadata is pure
    * arithmetic over payload bytes, so the oracle can mirror it.
    *
    * Parity assumption: the oracle mirrors BYTES with DuckDB CHARACTER
    * functions, valid because the corpus is pure ASCII (verified,
    * FIXTURES.md); a multi-byte corpus needs byte-based oracle SQL
    * (octet_length etc.) or a real binary column source. */
  object MediaCodecStub {
    def decode(m: MediaIn): MediaMeta = {
      val n = m.payload.length
      // ascii('') = 0 on the oracle side — mirror that for empty payloads.
      val b0 = if (n > 0) m.payload(0) & 0xff else 0
      val b1 = if (n > 1) m.payload(1) & 0xff else b0
      MediaMeta(m.doc_id, n,
        format = (n % 3) match { case 0 => "img"; case 1 => "audio"; case _ => "video" },
        width = (b0 % 64) * 16 + 64,
        height = (b1 % 64) * 9 + 36,
        n_frames = n % 30 + 1)
    }

    /** Frame extraction stub: 64-byte chunks, every 4th kept. */
    def sampleFrames(m: MediaIn): Iterator[MediaFrame] = {
      val full = m.payload.length / 64
      Iterator.range(0, full).filter(_ % 4 == 0).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(java.util.Arrays.copyOfRange(m.payload, i * 64, (i + 1) * 64))
        MediaFrame(m.doc_id, i, md.map("%02x".format(_)).mkString)
      }
    }
  }

  private def mediaIn(spark: SparkSession, sfDir: String): Dataset[MediaIn] = {
    import spark.implicits._
    documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
  }

  /** Binary payload → typed metadata via per-partition batch decode. */
  def mmDecodeMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaIn(spark, sfDir)
      .mapPartitions(_.map(MediaCodecStub.decode))
      .toDF()
      .orderBy("doc_id")
  }

  val mmDecodeMetaOracle: String =
    """SELECT doc_id, length(text) AS n_bytes,
      |  CASE length(text) % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
      |  (ascii(substr(text, 1, 1)) % 64) * 16 + 64 AS width,
      |  (ascii(substr(text, CASE WHEN length(text) > 1 THEN 2 ELSE 1 END, 1)) % 64) * 9 + 36 AS height,
      |  length(text) % 30 + 1 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Stub resize: cap width at 256, scale height by the same integer
    * ratio (integer math ⇒ exact oracle parity). */
  def mmResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaIn(spark, sfDir)
      .mapPartitions(_.map { m =>
        val meta = MediaCodecStub.decode(m)
        val (ow, oh) =
          if (meta.width > 256) (256, meta.height * 256 / meta.width)
          else (meta.width, meta.height)
        (meta.doc_id, meta.width, meta.height, ow, oh)
      })
      .toDF("doc_id", "width", "height", "out_w", "out_h")
      .orderBy("doc_id")
  }

  val mmResizeOracle: String =
    """SELECT doc_id, width, height,
      |  CASE WHEN width > 256 THEN 256 ELSE width END AS out_w,
      |  CASE WHEN width > 256 THEN height * 256 // width ELSE height END AS out_h
      |FROM (
      |  SELECT doc_id,
      |    (ascii(substr(text, 1, 1)) % 64) * 16 + 64 AS width,
      |    (ascii(substr(text, CASE WHEN length(text) > 1 THEN 2 ELSE 1 END, 1)) % 64) * 9 + 36 AS height
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Stub feature extraction: 8-bin byte histogram, normalized. */
  def mmFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaIn(spark, sfDir)
      .mapPartitions(_.map { m =>
        val bins = new Array[Int](8)
        m.payload.foreach(b => bins((b & 0xff) % 8) += 1)
        val n = math.max(m.payload.length, 1).toDouble // avoid NaN on empty payloads
        (m.doc_id, bins(0) / n, bins(1) / n, bins(2) / n, bins(3) / n,
          bins(4) / n, bins(5) / n, bins(6) / n, bins(7) / n)
      })
      .toDF("doc_id", "r0", "r1", "r2", "r3", "r4", "r5", "r6_", "r7")
      .select(col("doc_id") +: (Seq("r0", "r1", "r2", "r3", "r4", "r5", "r6_", "r7")
        .map(c => r6(col(c)).as(c))): _*)
      .orderBy("doc_id")
  }

  val mmFeaturesOracle: String = {
    val bins = (0 to 7).map { j =>
      val name = if (j == 6) "r6_" else s"r$j"
      // GREATEST(..., 1) mirrors the Spark side's max(n, 1) empty-payload
      // guard: an empty document must yield 0.0 ratios on BOTH engines
      s"ROUND(CAST(len(list_filter(codes, c -> c % 8 = $j)) AS DOUBLE) / GREATEST(len(codes), 1), 6) AS $name"
    }.mkString(",\n|  ")
    s"""SELECT doc_id,
       |  $bins
       |FROM (
       |  SELECT doc_id,
       |    list_transform(range(1, length(text) + 1),
       |      i -> ascii(substr(text, CAST(i AS INT), 1))) AS codes
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Frame sampling: flatMap — one input row explodes to the sampled
    * frame rows (typed generator shape). */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaIn(spark, sfDir)
      .flatMap(MediaCodecStub.sampleFrames)
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** The per-row list range mirrors the Spark side's unbounded
    * `Iterator.range(0, payload.length / 64)` — no fixed cap, so the
    * oracle holds at any document length. */
  val mmFrameSampleOracle: String =
    """SELECT doc_id, CAST(idx AS INT) AS frame_idx,
      |  md5(substr(text, CAST(idx * 64 + 1 AS INT), 64)) AS frame_md5
      |FROM (SELECT doc_id, text, unnest(range(0, length(text) // 64)) AS idx
      |      FROM documents)
      |WHERE idx % 4 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** MEDIA DEDUP BY SHARED FRAMES — the multimodal analog of document
    * near-dup: two videos are near-identical when they share keyframes,
    * and frame-hash matching is how media pipelines find re-encodes and
    * clipped copies without decoding full streams. The sampled frames
    * (same typed flatMap as `mm_frame_sample`) are grouped by their
    * content hash; a hash held by ≥2 DISTINCT documents marks shared
    * footage. At 100 TB this is one flatMap (no shuffle) + ONE shuffle
    * keyed by the 16-byte frame hash — candidate generation never
    * compares payloads pairwise, the same equi-join-only discipline as
    * the text/vector dedup family. */
  def mmDedupFrames(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaIn(spark, sfDir)
      .flatMap(MediaCodecStub.sampleFrames)
      .toDF()
      .groupBy("frame_md5")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_frames"),
        min(col("doc_id")).as("min_doc_id"))
      .filter(col("n_docs") >= 2)
      .orderBy("frame_md5")
  }

  /** Same cap-free per-row range as [[mmFrameSampleOracle]]. */
  val mmDedupFramesOracle: String =
    """SELECT frame_md5, COUNT(DISTINCT doc_id) AS n_docs,
      |  COUNT(*) AS n_frames, MIN(doc_id) AS min_doc_id
      |FROM (
      |  SELECT doc_id, md5(substr(text, CAST(idx * 64 + 1 AS INT), 64)) AS frame_md5
      |  FROM (SELECT doc_id, text, unnest(range(0, length(text) // 64)) AS idx
      |        FROM documents)
      |  WHERE idx % 4 = 0)
      |GROUP BY frame_md5 HAVING COUNT(DISTINCT doc_id) >= 2
      |ORDER BY frame_md5""".stripMargin

  /** Letterbox geometry for a vision-model input grid. */
  case class LetterboxPlan(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, pad_x: Int, pad_y: Int)

  /** LETTERBOX PLANNING — the aspect-preserving resize+pad every
    * vision-model loader performs (fit into 224×224, pad the short
    * side): scale = 224/max(w,h) applied in EXACT integer arithmetic
    * (`(h*224) div w` — positive operands, so Scala truncation and
    * DuckDB floor-div agree), symmetric padding halves likewise. Runs
    * on the typed mapPartitions decode path like the rest of the mm
    * family — per-partition batch, zero shuffle; at 100 TB this plan
    * column rides next to the binary payload into the GPU loader's
    * shard files. Invariant graded by the oracle and pinned in spec:
    * max(out_w, out_h) == 224 and out + 2·pad never exceeds the grid. */
  def mmLetterboxPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaIn(spark, sfDir)
      .mapPartitions(_.map { m =>
        val meta = MediaCodecStub.decode(m)
        val (w, h) = (meta.width, meta.height)
        val (ow, oh) =
          if (w >= h) (224, h * 224 / w) else (w * 224 / h, 224)
        LetterboxPlan(m.doc_id, w, h, ow, oh, (224 - ow) / 2, (224 - oh) / 2)
      })
      .toDF()
      .orderBy("doc_id")
  }

  val mmLetterboxPlanOracle: String =
    """WITH m AS (SELECT doc_id,
      |    (ascii(substr(text, 1, 1)) % 64) * 16 + 64 AS width,
      |    (ascii(substr(text, CASE WHEN length(text) > 1 THEN 2 ELSE 1 END, 1)) % 64) * 9 + 36 AS height
      |  FROM documents),
      |p AS (SELECT doc_id, width, height,
      |    CASE WHEN width >= height THEN 224 ELSE (width * 224) // height END AS out_w,
      |    CASE WHEN width >= height THEN (height * 224) // width ELSE 224 END AS out_h
      |  FROM m)
      |SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
      |  CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,
      |  CAST((224 - out_w) // 2 AS INT) AS pad_x,
      |  CAST((224 - out_h) // 2 AS INT) AS pad_y
      |FROM p ORDER BY doc_id""".stripMargin

  /** LOADER BATCH PACKING — the `llm_pack_chunks` recipe applied to
    * media: decoded items are packed into GPU-loader batches under a
    * 4 KiB payload budget, per format (image/audio/video loaders batch
    * separately), in deterministic doc_id order. batch_idx is the
    * running payload total BEFORE the item, integer-divided by the
    * budget — the same greedy semantics tokenizer packing uses, so an
    * item that crosses the boundary starts in the earlier batch and
    * its overflow defines the next. Shape at 100 TB: the window is
    * partitioned by format (never unpartitioned; a finer sharding key
    * composes exactly like `llm_pack_chunks`' shard-offset split), and
    * the decode metadata it runs on is the typed mapPartitions path —
    * zero shuffle before the window. */
  def mmPackBatches(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val meta = mediaIn(spark, sfDir)
      .mapPartitions(_.map(MediaCodecStub.decode))
      .toDF()
      .select(col("doc_id"), col("format"), col("n_bytes"))
    val w = Window.partitionBy("format").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    meta
      .withColumn("start_b", coalesce(sum(col("n_bytes").cast("long")).over(w), lit(0L)))
      .select(col("doc_id"), col("format"), col("n_bytes"),
        expr("start_b div 4096").as("batch_idx"))
      .orderBy("format", "doc_id")
  }

  val mmPackBatchesOracle: String =
    """SELECT doc_id, format, n_bytes,
      |  CAST(COALESCE(SUM(n_bytes) OVER (PARTITION BY format ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096 AS BIGINT) AS batch_idx
      |FROM (SELECT doc_id, length(text) AS n_bytes,
      |  CASE length(text) % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS format
      |  FROM documents)
      |ORDER BY format, doc_id""".stripMargin

  /** ASPECT-RATIO BUCKETING — how image-generation training (the
    * SDXL recipe) batches variable-shape images without destructive
    * square cropping: every image is assigned to the closest of a
    * fixed bucket list (1:1, 4:3, 3:4, 16:9, 9:16) so a batch shares
    * one shape. "Closest" is the EXACT integer cross-multiplication
    * |w·bh − h·bw| (comparing w/h to bw/bh without a float ratio),
    * tie-broken by bucket index. The 5-row bucket table broadcasts;
    * per-image argmin is a doc-partitioned window over the 5
    * candidates. Bucket population counts ride along via a bucket-
    * keyed window so the loader can size its per-bucket batch queues
    * from the same pass. */
  def mmAspectBucket(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val m = mediaIn(spark, sfDir)
      .mapPartitions(_.map(MediaCodecStub.decode))
      .toDF()
      .select(col("doc_id"), col("width").as("w"), col("height").as("h"))
    val buckets = Seq((1, 1, 1), (2, 4, 3), (3, 3, 4), (4, 16, 9), (5, 9, 16))
      .toDF("bidx", "bw", "bh")
    val pick = Window.partitionBy("doc_id")
      .orderBy(abs(col("w") * col("bh") - col("h") * col("bw")), col("bidx"))
    m.crossJoin(broadcast(buckets))
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("w"), col("h"), col("bidx").as("bucket"))
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy("bucket")))
      .orderBy("doc_id")
  }

  val mmAspectBucketOracle: String =
    """WITH m AS (SELECT doc_id,
      |    (ascii(substr(text, 1, 1)) % 64) * 16 + 64 AS w,
      |    (ascii(substr(text, CASE WHEN length(text) > 1 THEN 2 ELSE 1 END, 1)) % 64) * 9 + 36 AS h
      |  FROM documents),
      |b(bidx, bw, bh) AS (VALUES (1, 1, 1), (2, 4, 3), (3, 3, 4), (4, 16, 9), (5, 9, 16)),
      |s AS (SELECT m.doc_id, m.w, m.h, b.bidx,
      |    ROW_NUMBER() OVER (PARTITION BY m.doc_id
      |      ORDER BY abs(m.w * b.bh - m.h * b.bw), b.bidx) AS rn
      |  FROM m, b),
      |p AS (SELECT doc_id, w, h, bidx AS bucket FROM s WHERE rn = 1)
      |SELECT doc_id, w, h, bucket,
      |  CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS bucket_n
      |FROM p ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_aspect_bucket" -> (mmAspectBucket _),
    "mm_pack_batches" -> (mmPackBatches _),
    "mm_letterbox_plan" -> (mmLetterboxPlan _),
    "mm_decode_meta" -> (mmDecodeMeta _),
    "mm_resize" -> (mmResize _),
    "mm_features" -> (mmFeatures _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_dedup_frames" -> (mmDedupFrames _))

  val oracle: Map[String, String] = Map(
    "mm_aspect_bucket" -> mmAspectBucketOracle,
    "mm_pack_batches" -> mmPackBatchesOracle,
    "mm_letterbox_plan" -> mmLetterboxPlanOracle,
    "mm_decode_meta" -> mmDecodeMetaOracle,
    "mm_resize" -> mmResizeOracle,
    "mm_features" -> mmFeaturesOracle,
    "mm_frame_sample" -> mmFrameSampleOracle,
    "mm_dedup_frames" -> mmDedupFramesOracle)
}
