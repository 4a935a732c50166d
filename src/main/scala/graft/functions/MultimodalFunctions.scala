package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media as opaque `binary` columns plus typed metadata structs.
  *
  * The Spark-side plumbing — schema, batch shape, partition balancing,
  * kernel signatures — is real and tested. The codec itself is STUBBED
  * (`StubCodec`): this container has no image/audio libraries, so decode
  * produces a deterministic fake derived from the bytes. Swapping in a real
  * codec (JNI/javacv or a Python `mapInPandas` stage on a PySpark cluster)
  * changes only the function body, not the plan shape.
  *
  * Scale design: media rows are large and skewed → `balanceBySize`
  * range-partitions on byte length so one partition ≈ one codec batch of
  * similar cost; decode is `mapPartitions` (one codec init per partition,
  * the same batching argument as pandas-UDF batches); features come back as
  * fixed-width `array<float>` ready for the similarity operators.
  */
object MultimodalFunctions {

  /** Typed metadata carried alongside the binary payload. */
  final case class MediaMeta(format: String, width: Int, height: Int,
                             channels: Int, sampleRate: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, media_type: String,
                            content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, media_type: String,
                                 n_bytes: Long, features: Array[Float])

  /** ===== STUB ===== deterministic fake codec: stands in for image decode /
    * audio resample / video frame extraction. Derives all values from the
    * payload bytes so tests and oracles are reproducible. */
  object StubCodec {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I') "wav"
      else "raw"

    /** STUB decode → fake meta (real impl: codec headers). */
    def decodeMeta(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      MediaMeta(sniffFormat(bytes), width = n % 640 + 1, height = n % 480 + 1,
        channels = 3, sampleRate = 16000, durationMs = n.toLong)
    }

    /** STUB feature extraction → `dim` pooled floats from a rolling byte
      * hash (real impl: CNN embedding / mel spectrogram pooling). */
    def extractFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) {
        h = h * 31 + bytes(i)
        out(math.floorMod(i, dim)) += (math.floorMod(h, 1024L) / 1024.0f)
        i += 1
      }
      out.map(v => v / math.max(1, bytes.length / dim))
    }

    /** STUB video frame sampling: every `everyNth` byte-block index stands
      * in for a frame timestamp (real impl: container demux). */
    def sampleFrameOffsets(nBytes: Long, everyNth: Int): Seq[Long] =
      (0L until nBytes by everyNth.toLong).take(32)
  }

  /** Binary-file ingestion (`spark.read.format("binaryFile")`) normalized to
    * the media schema — the entry point for real media directories. */
  def readMediaDir(spark: SparkSession, dir: String, mediaType: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(xxhash64(col("path")).as("media_id"), lit(mediaType).as("media_type"),
        col("content"), col("length").as("n_bytes"), col("modificationTime"))

  /** Balance partitions by payload size so codec batches have similar cost
    * (media size is heavy-tailed; hash partitioning would let one partition
    * hold several 4K videos while another holds thumbnails). */
  def balanceBySize(df: DataFrame, partitions: Int): DataFrame =
    df.withColumn("__sz", length(col("content")))
      .repartitionByRange(partitions, col("__sz"), col("media_id"))
      .drop("__sz")

  /** Decode + feature-extract as a typed mapPartitions kernel: one codec
    * init per partition, rows streamed through it (the Scala analogue of a
    * pandas-UDF batch). */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      // real impl: initialize the codec/model once here
      it.map { row =>
        MediaFeatures(row.media_id, row.media_type, row.content.length.toLong,
          StubCodec.extractFeatures(row.content, dim))
      }
    }
  }

  /** STUB resize/transcode: deterministic fake payload at the target
    * dimensions (real impl: decode → resample pixels → encode). The real
    * part is the plumbing: a typed kernel that replaces the payload and
    * rewrites the meta struct, with one codec init per partition. */
  def resize(ds: Dataset[MediaRow], w: Int, h: Int)
            (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      // real impl: initialize the codec once here
      it.map { r =>
        val src = if (r.content.isEmpty) Array[Byte](0) else r.content
        val out = new Array[Byte](math.min(w * h, 4096))
        var i = 0
        while (i < out.length) { out(i) = src(math.floorMod(i * 31, src.length)); i += 1 }
        r.copy(content = out, meta = r.meta.copy(width = w, height = h))
      }
    }
  }

  /** Frame-sample offsets as a Column (video frame extraction plumbing):
    * every `everyNth` byte offset, capped at `maxFrames` — codegen-built-in
    * sequence/slice, ready for `explode` into one row per frame. Caller
    * guards `nBytes > 0` (a zero-length payload has no frames). */
  def frameOffsets(nBytes: org.apache.spark.sql.Column, everyNth: Int,
                   maxFrames: Int): org.apache.spark.sql.Column =
    slice(sequence(lit(0L), (nBytes - 1).cast("long"), lit(everyNth.toLong)), 1, maxFrames)

  /** Column-level stub meta extraction — codegen-friendly plumbing for the
    * metadata columns (length/format sniff need no real codec). */
  def mediaMetaColumns(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = length(content)
    struct(
      when(substring(hex(content), 1, 4) === "FFD8", "jpeg")
        .when(substring(hex(content), 1, 4) === "8950", "png")
        .when(substring(hex(content), 1, 4) === "5249", "wav")
        .otherwise("raw").as("format"),
      (n % 640 + 1).as("width"),
      (n % 480 + 1).as("height"),
      lit(3).as("channels"),
      lit(16000).as("sample_rate"),
      n.cast("long").as("duration_ms"))
  }
}
