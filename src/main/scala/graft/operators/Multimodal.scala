package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for a training-data pipeline: image/audio/
  * video payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-local batch kernels.
  *
  * STUB NOTICE: no image/audio codecs exist in this environment, so the
  * `decode` kernels below produce deterministic pseudo-features derived
  * from the bytes (clearly marked). Everything around them — schema,
  * batching, partitioning, output shapes — is the real pipeline: swapping
  * the stub for an actual decoder (JNI/OpenCV, or `mapInPandas` + PIL on
  * PySpark) changes only the kernel body.
  */
object Multimodal {

  /** Canonical schema for a multimodal asset row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Wrap a string-keyed payload table into the asset schema (ingest
    * helper for tests/fixtures).
    */
  def toAssets(df: DataFrame, id: Column, payload: Column, mime: String): DataFrame =
    df.select(id.cast("long").as("asset_id"),
      payload.cast("binary").as("content"),
      struct(lit(mime).as("mime"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Image "decode" + feature extraction: one fixed-length float vector per
    * asset. Partition-local, batch-friendly; the feature body is a STUB
    * (deterministic byte-derived pseudo-features standing in for a real
    * decoder+CNN).
    */
  def extractImageFeatures(assets: DataFrame, dim: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // --- STUB: deterministic pseudo-decode ---
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val feats = Array.tabulate(dim) { i =>
            var acc = 0L
            var j = i
            while (j < b.length) { acc = (acc * 131 + (b(j) & 0xff)) % 1000003L; j += dim }
            acc.toFloat / 1000003f
          }
          // --- end STUB ---
          (id, feats)
        }
      }.toDF("asset_id", "features")
  }

  /** Video frame sampling: every `everyNth` "frame" becomes a row
    * (asset_id, frame_idx, frame_bytes). The chunking is real; the frame
    * boundaries are a STUB (fixed-size byte windows standing in for
    * container parsing).
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val nFrames = math.max(1, b.length / math.max(1, frameBytes))
        (0 until nFrames by everyNth).iterator.map { f =>
          val start = f * frameBytes
          val end = math.min(b.length, start + frameBytes)
          (id, f, java.util.Arrays.copyOfRange(b, math.min(start, b.length), end))
        }
      }.toDF("asset_id", "frame_idx", "frame_bytes")
  }

  /** Per-frame byte statistics over [[sampleFrames]] output — the shape of
    * a per-frame feature kernel (length + byte checksum standing in for a
    * frame embedding). Partition-local, no shuffle.
    */
  def frameByteStats(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.select(col("asset_id"), col("frame_idx"), col("frame_bytes"))
      .as[(Long, Int, Array[Byte])]
      .map { case (id, idx, b) =>
        val bb = if (b == null) Array.emptyByteArray else b
        var sum = 0L
        var i = 0
        while (i < bb.length) { sum += bb(i) & 0xff; i += 1 }
        (id, idx, bb.length.toLong, sum)
      }.toDF("asset_id", "frame_idx", "n_bytes", "byte_sum")
  }

  /** Metadata-only resize: records the target dimensions without touching
    * payload bytes (the real pixel resample is the decoder's job).
    */
  def withResizeTarget(assets: DataFrame, width: Int, height: Int): DataFrame =
    assets.withColumn("meta",
      struct(col("meta.mime"),
        lit(width).as("width"), lit(height).as("height"),
        col("meta.duration_ms")))

  /** Deterministic text payload for fixtures. */
  def payloadOf(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
}
