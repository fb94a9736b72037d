package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The corpus has no real image/audio tables, so the media payload is
  * manufactured deterministically (UTF-8 bytes of `documents.text`) and
  * the DECODE step is a clearly-marked stub — the Spark-side contract
  * (schema, partition-batched processing, feature shape) is real and
  * tested. On a real corpus only [[MultimodalQueries.decodeStub]]
  * changes (swap in an image/audio codec); the plan shape — scan →
  * mapPartitions batch decode → relational feature columns — is the
  * 100 TB design: decode cost is embarrassingly parallel, feature
  * output is columnar, and nothing ever routes through the driver.
  */
object MultimodalQueries {

  /** Typed media record: binary payload + metadata, the schema a real
    * multimodal table would carry. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], n_bytes: Long)

  /** Extracted feature row (fixed shape, columnar-friendly). */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      first_byte: Int, byte_sum_mod: Long, feature: Array[Float])

  /** STUB — deterministic fake decode. A real deployment replaces this
    * body with an image/audio decoder (the libs are not in this
    * container); signature and batch usage stay identical. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val dim = 8
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { out(i % dim) += (payload(i) & 0xff) / 255.0f; i += 1 }
    out
  }

  /** The media "table": documents.text as UTF-8 payloads. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    val s = spark
    import s.implicits._
    Tables(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        lit("text/utf-8").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** Batch feature extraction: mapPartitions so a real decoder can
    * amortize per-batch init (model load, codec context) exactly like
    * `mapInPandas` batches — one init per partition, streamed rows. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { it =>
      // per-partition init of the (stubbed) decoder happens here
      it.map { r =>
        val feat = decodeStub(r.payload)
        val sum = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
        MediaFeatures(r.media_id, r.kind, r.n_bytes,
          if (r.payload.nonEmpty) r.payload(0) & 0xff else -1,
          sum % 1000003L, feat)
      }
    }
  }

  /** Oracled slice of the pipeline: the byte-level features the stub
    * derives deterministically (payload length, first byte, content
    * fingerprint) — DuckDB reproduces them from the text column. The
    * float feature vector itself is exercised in ScalaTest. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("first_byte"), col("byte_sum_mod"))
      .orderBy("media_id")

  val multimodalFeaturesSql: String =
    """SELECT doc_id AS media_id, 'text/utf-8' AS kind,
      |       CAST(strlen(text) AS BIGINT) AS n_bytes,
      |       ascii(substr(text, 1, 1)) AS first_byte,
      |       CAST(list_sum(list_transform(range(strlen(text)),
      |              i -> ascii(substr(text, CAST(i + 1 AS INTEGER), 1)))) % 1000003 AS BIGINT) AS byte_sum_mod
      |FROM documents
      |ORDER BY media_id""".stripMargin

  private val FrameBytes = 32
  private val Stride     = 4

  /** Frame sampling + resize (the video-shaped ops of the multimodal
    * surface): the payload is treated as a sequence of fixed-size
    * frames; every Stride-th complete frame is SAMPLED (explode over a
    * strided `sequence` — one output row per kept frame, no UDF), the
    * frame is sliced out of the binary payload, and its bytes are
    * RESIZED by 4:1 bin-sum pooling (the integer twin of average-pool
    * downsampling; a real pipeline swaps the byte arithmetic for pixel
    * arithmetic, the plan shape is identical). Frame indexing,
    * sampling and pooling are exact integer ops — fully oracled; the
    * corpus text is ASCII, so byte and character arithmetic agree
    * across engines (same equivalence `q_multimodal_features` relies
    * on). At 100 TB: one narrow scan, per-row explode bounded by
    * frames-per-media, no shuffle until a consumer aggregates. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val binSum = (b: Int) =>
      expr(s"aggregate(transform(sequence(1, ${FrameBytes / 4}), j -> " +
        s"ascii(substring(text, frame_idx * $FrameBytes + $b * ${FrameBytes / 4} + j, 1))), 0, (a, v) -> a + v)")
        .as(s"bin$b")
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"),
        encode(col("text"), "UTF-8").as("payload"),
        floor(octet_length(col("text")) / FrameBytes).cast("int").as("n_frames"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx", explode(expr(s"sequence(0, n_frames - 1, $Stride)")))
      .withColumn("frame", expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)"))
      .select(
        Seq(col("media_id"), col("frame_idx"),
          octet_length(col("frame")).as("frame_bytes")) ++ (0 until 4).map(binSum): _*)
      .orderBy("media_id", "frame_idx")
  }

  val frameSampleSql: String = {
    val binSum = (b: Int) =>
      s"CAST(list_sum(list_transform(range(${FrameBytes / 4}), j -> " +
        s"ascii(substr(text, CAST(frame_idx * $FrameBytes + $b * ${FrameBytes / 4} + j + 1 AS INTEGER), 1)))) AS INTEGER) AS bin$b"
    s"""SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx, $FrameBytes AS frame_bytes,
       |       ${(0 until 4).map(binSum).mkString(",\n       ")}
       |FROM (SELECT doc_id AS media_id, text,
       |             unnest(range(0, CAST(floor(strlen(text) / $FrameBytes) AS BIGINT), $Stride)) AS frame_idx
       |      FROM documents
       |      WHERE strlen(text) >= $FrameBytes)
       |ORDER BY media_id, frame_idx""".stripMargin
  }
}
