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
  * STUB NOTICE (features only): no image/audio codecs exist in this
  * environment, so the FEATURE kernels below (`extractImageFeatures`)
  * produce deterministic byte-derived pseudo-features standing in for a
  * decoder+CNN. Container parsing itself is REAL where the format is pure
  * byte math: [[Multimodal.WavPcmDecoder]] walks an actual RIFF/WAVE chunk
  * list (magic, fmt geometry, data chunk bounds) and
  * [[Multimodal.BmpRowDecoder]] parses an actual BMP raster (pixel offset
  * past the palette, bottom-up rows, 4-byte stride), both with no codec
  * dependency; [[Multimodal.FixedWindowDecoder]] remains the
  * format-agnostic fallback.
  * Everything around the kernels — schema, batching, partitioning, output
  * shapes — is the real pipeline: swapping a stub for an actual decoder
  * (JNI/OpenCV, or `mapInPandas` + PIL on PySpark) changes only the kernel
  * body.
  */
object Multimodal {

  /** Pluggable container parsing behind [[sampleFrames]]: a decoder turns
    * one payload into (frame_idx, frame_bytes) rows, sampling every
    * `everyNth` frame. Implementations must be serializable (they ship to
    * executors inside the flatMap kernel).
    */
  trait FrameDecoder extends Serializable {
    def frames(bytes: Array[Byte], everyNth: Int): Iterator[(Int, Array[Byte])]
  }

  /** Format-agnostic fallback: fixed-size byte windows over the whole
    * payload (no container parsing — the documented stub geometry).
    */
  final case class FixedWindowDecoder(frameBytes: Int) extends FrameDecoder {
    override def frames(bytes: Array[Byte], everyNth: Int): Iterator[(Int, Array[Byte])] =
      windowed(bytes, 0, if (bytes == null) 0 else bytes.length, frameBytes, everyNth)
  }

  /** Shared window geometry: `max(1, len/frameBytes)` frames over
    * [off, off+len), the last kept frame clipped at the region end.
    */
  private def windowed(b0: Array[Byte], off: Int, len: Int, frameBytes: Int,
                       everyNth: Int): Iterator[(Int, Array[Byte])] = {
    val b = if (b0 == null) Array.emptyByteArray else b0
    val nFrames = math.max(1, len / math.max(1, frameBytes))
    (0 until nFrames by everyNth).iterator.map { f =>
      val start = off + f * frameBytes
      val end = math.min(off + len, start + frameBytes)
      (f, java.util.Arrays.copyOfRange(b, math.min(start, off + len), end))
    }
  }

  /** REAL pure-JVM container parse (no codec libs — RIFF is pure byte
    * math): validates the `RIFF….WAVE` magic, walks the chunk list
    * (4-byte id + little-endian u32 size, word-aligned), reads the sample
    * geometry from the `fmt ` chunk (PCM format, block align), bounds the
    * payload to the `data` chunk, and emits frames of
    * `blockAlign × samplesPerFrame` bytes from the data region only —
    * header and any non-data chunks (LIST/INFO, fact, …) are skipped by
    * construction. Malformed containers fail loudly.
    */
  final case class WavPcmDecoder(samplesPerFrame: Int) extends FrameDecoder {
    require(samplesPerFrame > 0,
      s"WavPcmDecoder: samplesPerFrame must be positive, got $samplesPerFrame")

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, StandardCharsets.US_ASCII)

    override def frames(bytes: Array[Byte], everyNth: Int): Iterator[(Int, Array[Byte])] = {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      require(b.length >= 44 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE",
        s"WavPcmDecoder: not a RIFF/WAVE container (${b.length} bytes)")
      var blockAlign = -1
      var dataOff = -1
      var dataLen = -1
      var o = 12
      while (o + 8 <= b.length && (blockAlign < 0 || dataOff < 0)) {
        val id = fourcc(b, o)
        val size = le32(b, o + 4)
        // compare in Long: a corrupt ~2^31 chunk size must hit this
        // require, not wrap negative and crash later in the array copy
        require(size >= 0 && o + 8 + size.toLong <= b.length,
          s"WavPcmDecoder: chunk '$id' overruns the container")
        if (id == "fmt ") {
          require(size >= 16 && le16(b, o + 8) == 1,
            "WavPcmDecoder: only uncompressed PCM (format 1) is supported")
          blockAlign = le16(b, o + 8 + 12)
          require(blockAlign > 0, "WavPcmDecoder: zero block align")
        } else if (id == "data") {
          dataOff = o + 8
          dataLen = size
        }
        o += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(blockAlign > 0 && dataOff >= 0,
        "WavPcmDecoder: missing fmt or data chunk")
      // checked multiply: a huge samplesPerFrame must fail loudly here,
      // not wrap negative and feed windowed() a nonsense frame size
      windowed(b, dataOff, dataLen,
        math.multiplyExact(blockAlign, samplesPerFrame), everyNth)
    }
  }

  /** REAL pure-JVM image-container parse (no codec libs — BMP is pure
    * byte math), the image-side sibling of [[WavPcmDecoder]]: validates
    * the `BM` magic, reads the pixel-data offset from the file header
    * (honoring it skips the palette — a one-byte mis-location shifts
    * every frame and hash-mismatches), reads the raster geometry from the
    * BITMAPINFOHEADER (width, height, planes, bpp, BI_RGB only), computes
    * the 4-byte-aligned row stride `((width·bpp + 31) / 32) · 4`, and
    * emits one frame per IMAGE row (top-down) of the row's PAYLOAD bytes
    * — un-padding each row and un-reversing the bottom-up storage order
    * BMP rasters use. Malformed containers fail loudly.
    */
  final case class BmpRowDecoder() extends FrameDecoder {
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    override def frames(bytes: Array[Byte], everyNth: Int): Iterator[(Int, Array[Byte])] = {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte,
        s"BmpRowDecoder: not a BMP container (${b.length} bytes)")
      val pixelOff = le32(b, 10)
      require(le32(b, 14) >= 40,
        "BmpRowDecoder: BITMAPINFOHEADER (>= 40 bytes) required")
      val width = le32(b, 18)
      val height = le32(b, 22)
      require(width > 0 && height > 0,
        s"BmpRowDecoder: positive bottom-up raster required ($width x $height)")
      require(le16(b, 26) == 1, "BmpRowDecoder: planes must be 1")
      val bpp = le16(b, 28)
      require(bpp == 8 || bpp == 24 || bpp == 32,
        s"BmpRowDecoder: unsupported bit depth $bpp")
      require(le32(b, 30) == 0,
        "BmpRowDecoder: only uncompressed BI_RGB is supported")
      val rowBytes = math.multiplyExact(width, bpp) / 8
      val stride = (rowBytes + 3) / 4 * 4
      // compare in Long: corrupt geometry must hit this require, not wrap
      require(pixelOff >= 54 &&
        pixelOff.toLong + height.toLong * stride <= b.length,
        s"BmpRowDecoder: $height x $stride raster at offset $pixelOff " +
          s"overruns the container (${b.length} bytes)")
      (0 until height by everyNth).iterator.map { r =>
        // image row r lives at storage row (height-1-r): bottom-up layout
        val start = pixelOff + (height - 1 - r) * stride
        (r, java.util.Arrays.copyOfRange(b, start, start + rowBytes))
      }
    }
  }

  /** REAL pure-JVM PGM (P5 binary graymap) parse — the third container
    * family, and a different KIND of parse from [[WavPcmDecoder]] /
    * [[BmpRowDecoder]]'s fixed binary headers: PGM headers are ASCII
    * tokens ("P5", width, height, maxval) separated by arbitrary
    * whitespace with `#`-to-end-of-line comments allowed between them, so
    * the raster offset is only knowable by actually tokenizing — a
    * mis-skipped comment shifts every frame and hash-mismatches. The
    * raster itself is top-down, one byte per sample (maxval < 256), no
    * row padding; one frame per image row. Malformed containers fail
    * loudly.
    */
  final case class PgmRowDecoder() extends FrameDecoder {
    override def frames(bytes: Array[Byte], everyNth: Int): Iterator[(Int, Array[Byte])] = {
      val b = if (bytes == null) Array.emptyByteArray else bytes
      require(b.length >= 2 && b(0) == 'P'.toByte && b(1) == '5'.toByte,
        s"PgmRowDecoder: not a P5 PGM container (${b.length} bytes)")
      var o = 2
      def isWs(c: Int): Boolean =
        c == ' ' || c == '\t' || c == '\r' || c == '\n'
      def skipWsAndComments(): Unit = {
        var done = false
        while (!done && o < b.length) {
          val c = b(o) & 0xff
          if (c == '#') { while (o < b.length && b(o) != '\n'.toByte) o += 1 }
          else if (isWs(c)) o += 1
          else done = true
        }
      }
      def readHeaderInt(what: String): Int = {
        skipWsAndComments()
        require(o < b.length && b(o) >= '0'.toByte && b(o) <= '9'.toByte,
          s"PgmRowDecoder: digit expected for $what at offset $o")
        var v = 0L
        while (o < b.length && b(o) >= '0'.toByte && b(o) <= '9'.toByte) {
          v = v * 10 + (b(o) - '0'.toByte)
          require(v <= Int.MaxValue, s"PgmRowDecoder: $what overflows")
          o += 1
        }
        v.toInt
      }
      val width = readHeaderInt("width")
      val height = readHeaderInt("height")
      val maxval = readHeaderInt("maxval")
      require(width > 0 && height > 0,
        s"PgmRowDecoder: positive raster required ($width x $height)")
      require(maxval > 0 && maxval < 256,
        s"PgmRowDecoder: single-byte samples required (maxval $maxval)")
      // the spec: exactly ONE whitespace byte separates maxval from the
      // raster (a raster starting with 0x23 must not be eaten as comment)
      require(o < b.length && isWs(b(o) & 0xff),
        "PgmRowDecoder: single whitespace must follow maxval")
      o += 1
      require(o.toLong + math.multiplyExact(width.toLong, height.toLong) <= b.length,
        s"PgmRowDecoder: $width x $height raster at offset $o overruns " +
          s"the container (${b.length} bytes)")
      val off = o
      (0 until height by everyNth).iterator.map { r =>
        val start = off + r * width // top-down, unpadded
        (r, java.util.Arrays.copyOfRange(b, start, start + width))
      }
    }
  }

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

  /** Frame sampling behind a pluggable [[FrameDecoder]]: every `everyNth`
    * frame becomes a row (asset_id, frame_idx, frame_bytes). The
    * chunk/explode plumbing is partition-local and format-independent;
    * frame boundaries come from the decoder ([[WavPcmDecoder]] = real
    * container geometry, [[FixedWindowDecoder]] = stub windows).
    */
  def sampleFrames(assets: DataFrame, decoder: FrameDecoder,
                   everyNth: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decoder.frames(bytes, everyNth).map { case (f, fb) => (id, f, fb) }
      }.toDF("asset_id", "frame_idx", "frame_bytes")
  }

  /** [[sampleFrames]] with the fixed-window fallback decoder. */
  def sampleFrames(assets: DataFrame, frameBytes: Int, everyNth: Int): DataFrame =
    sampleFrames(assets, FixedWindowDecoder(frameBytes), everyNth)

  /** Build REAL single-channel 8-bit PCM WAV containers around a text
    * payload (canonical 44-byte RIFF header + data chunk; pure byte math,
    * byte-exact little-endian fields) — the ingest fixture that lets
    * [[WavPcmDecoder]] exercise an actual container parse end to end.
    */
  def toWavAssets(df: DataFrame, id: Column, text: Column,
                  sampleRate: Int = 8000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long"), text.cast("string")).as[(Long, String)]
      .map { case (i, t) =>
        val data = (if (t == null) "" else t).getBytes(StandardCharsets.UTF_8)
        val bb = java.nio.ByteBuffer.allocate(44 + data.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
        bb.putInt(36 + data.length)
        bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
        bb.put("fmt ".getBytes(StandardCharsets.US_ASCII))
        bb.putInt(16)
        bb.putShort(1)                   // PCM
        bb.putShort(1)                   // mono
        bb.putInt(sampleRate)
        bb.putInt(sampleRate)            // byte rate (8-bit mono)
        bb.putShort(1)                   // block align
        bb.putShort(8)                   // bits per sample
        bb.put("data".getBytes(StandardCharsets.US_ASCII))
        bb.putInt(data.length)
        bb.put(data)
        (i, bb.array(), data.length.toLong * 1000L / sampleRate)
      }.toDF("asset_id", "content", "dur")
      .select(col("asset_id"), col("content"),
        struct(lit("audio/wav").as("mime"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          col("dur").as("duration_ms")).as("meta"))
  }

  /** Build REAL 8-bpp grayscale BMP containers around a text payload
    * (file header + BITMAPINFOHEADER + 256-entry palette + bottom-up
    * zero-padded raster, byte-exact little-endian fields) — the ingest
    * fixture that lets [[BmpRowDecoder]] exercise an actual image
    * container parse end to end: image row r carries text bytes
    * [r·width, (r+1)·width) zero-padded, stored bottom-up with 4-byte
    * row alignment behind the palette the pixel offset must skip.
    */
  def toBmpAssets(df: DataFrame, id: Column, text: Column,
                  width: Int = 32): DataFrame = {
    require(width > 0, s"toBmpAssets: width must be positive, got $width")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long"), text.cast("string")).as[(Long, String)]
      .map { case (i, t) =>
        val data = (if (t == null) "" else t).getBytes(StandardCharsets.UTF_8)
        val height = math.max(1, (data.length + width - 1) / width)
        val stride = (width + 3) / 4 * 4 // 8 bpp: rowBytes == width
        val pixelOff = 14 + 40 + 256 * 4
        val bb = java.nio.ByteBuffer.allocate(pixelOff + height * stride)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put('B'.toByte).put('M'.toByte)
        bb.putInt(pixelOff + height * stride) // file size
        bb.putInt(0)                          // reserved
        bb.putInt(pixelOff)                   // pixel-data offset
        bb.putInt(40)                         // BITMAPINFOHEADER size
        bb.putInt(width)
        bb.putInt(height)                     // positive: bottom-up
        bb.putShort(1)                        // planes
        bb.putShort(8)                        // bits per pixel
        bb.putInt(0)                          // BI_RGB
        bb.putInt(height * stride)            // image size
        bb.putInt(2835).putInt(2835)          // 72 dpi
        bb.putInt(256).putInt(0)              // palette size / important
        var p = 0
        while (p < 256) { // grayscale BGRA palette
          bb.put(p.toByte).put(p.toByte).put(p.toByte).put(0.toByte)
          p += 1
        }
        var srow = 0
        while (srow < height) {
          val imageRow = height - 1 - srow // bottom-up storage
          var j = 0
          while (j < stride) {
            val k = imageRow * width + j
            bb.put(if (j < width && k < data.length) data(k) else 0.toByte)
            j += 1
          }
          srow += 1
        }
        (i, bb.array(), width, height)
      }.toDF("asset_id", "content", "w", "h")
      .select(col("asset_id"), col("content"),
        struct(lit("image/bmp").as("mime"),
          col("w").as("width"), col("h").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
  }

  /** Build REAL P5 PGM containers around a text payload (ASCII header
    * with a comment line the decoder must skip + top-down unpadded
    * raster, zero-filled to width·height) — the ingest fixture that lets
    * [[PgmRowDecoder]] exercise a tokenized-header container parse end to
    * end: image row r carries text bytes [r·width, (r+1)·width)
    * zero-padded.
    */
  def toPgmAssets(df: DataFrame, id: Column, text: Column,
                  width: Int = 24): DataFrame = {
    require(width > 0, s"toPgmAssets: width must be positive, got $width")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long"), text.cast("string")).as[(Long, String)]
      .map { case (i, t) =>
        val data = (if (t == null) "" else t).getBytes(StandardCharsets.UTF_8)
        val height = math.max(1, (data.length + width - 1) / width)
        val header = s"P5\n# graft pgm fixture\n$width $height\n255\n"
          .getBytes(StandardCharsets.US_ASCII)
        val out = new Array[Byte](header.length + width * height)
        System.arraycopy(header, 0, out, 0, header.length)
        System.arraycopy(data, 0, out, header.length, data.length)
        (i, out, width, height)
      }.toDF("asset_id", "content", "w", "h")
      .select(col("asset_id"), col("content"),
        struct(lit("image/x-portable-graymap").as("mime"),
          col("w").as("width"), col("h").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
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

  /** REAL audio feature kernel over 8-bit PCM frames (no codec needed —
    * PCM samples ARE the waveform): per frame, the exact-integer DSP
    * triple a feature pipeline starts from — signal energy
    * Σ(s−128)² (8-bit PCM is unsigned, centered at 128), DC offset
    * Σ(s−128), and peak amplitude max|s−128|. All integer arithmetic,
    * so the features are engine-exact with no rounding discipline
    * needed. Partition-local, no shuffle.
    */
  def pcmFrameFeatures(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.select(col("asset_id"), col("frame_idx"), col("frame_bytes"))
      .as[(Long, Int, Array[Byte])]
      .map { case (id, idx, b) =>
        val bb = if (b == null) Array.emptyByteArray else b
        var energy = 0L; var dc = 0L; var peak = 0L
        var i = 0
        while (i < bb.length) {
          val d = (bb(i) & 0xff) - 128
          energy += d.toLong * d; dc += d
          if (math.abs(d) > peak) peak = math.abs(d)
          i += 1
        }
        (id, idx, bb.length.toLong, energy, dc, peak)
      }.toDF("asset_id", "frame_idx", "n_samples", "energy", "dc_offset",
        "peak")
  }

  /** Metadata-only resize: records the target dimensions without touching
    * payload bytes (the real pixel resample is the decoder's job).
    */
  def withResizeTarget(assets: DataFrame, width: Int, height: Int): DataFrame =
    assets.withColumn("meta",
      struct(col("meta.mime"),
        lit(width).as("width"), lit(height).as("height"),
        col("meta.duration_ms")))

  /** REAL nearest-neighbor resample of a parsed BMP raster — the resize
    * step of the image pipeline made actual (BMP needs no codec: the
    * container is pure byte math, and NN resampling is index
    * arithmetic). Rows come from [[BmpRowDecoder]]'s validated parse
    * (pixel-offset honored, rows un-padded and un-reversed); output
    * pixel (ox, oy) copies source pixel ((ox·W)/outW, (oy·H)/outH) —
    * integer floor, the canonical NN grid — with bytes-per-pixel
    * derived from the parsed geometry, so 8/24/32-bpp rasters all
    * resample whole pixels. Partition-local map, one row-major raster
    * row per asset: (asset_id, out_width, out_height, pixels).
    */
  def resizeBmpNearest(assets: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0,
      s"resizeBmpNearest: positive target required, got $outW x $outH")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val rows = BmpRowDecoder().frames(bytes, 1).map(_._2).toArray
        val h = rows.length
        val rowBytes = rows(0).length
        // width from the validated header (le32 at 18, already parsed
        // as positive by the decoder)
        val w = (bytes(18) & 0xff) | ((bytes(19) & 0xff) << 8) |
          ((bytes(20) & 0xff) << 16) | ((bytes(21) & 0xff) << 24)
        val bpp = rowBytes / w
        val out = new Array[Byte](outW * outH * bpp)
        var oy = 0
        while (oy < outH) {
          val src = rows(oy * h / outH)
          var ox = 0
          while (ox < outW) {
            val sx = ox * w / outW
            var c = 0
            while (c < bpp) {
              out((oy * outW + ox) * bpp + c) = src(sx * bpp + c)
              c += 1
            }
            ox += 1
          }
          oy += 1
        }
        (id, outW, outH, out)
      }.toDF("asset_id", "out_width", "out_height", "pixels")
  }

  /** Exact integer invariants of a resampled raster (order-sensitive:
    * `weighted_sum` = Σ pixel·(index+1) over row-major order catches any
    * pixel-placement error, not just value changes). Partition-local.
    */
  def resizedPixelStats(resized: DataFrame): DataFrame = {
    val spark = resized.sparkSession
    import spark.implicits._
    resized.select(col("asset_id"), col("out_width"), col("out_height"),
        col("pixels"))
      .as[(Long, Int, Int, Array[Byte])]
      .map { case (id, w, h, px) =>
        var s = 0L; var ws = 0L; var nz = 0L
        var i = 0
        while (i < px.length) {
          val v = px(i) & 0xff
          s += v; ws += v.toLong * (i + 1); if (v != 0) nz += 1
          i += 1
        }
        (id, w.toLong, h.toLong, s, ws, nz)
      }.toDF("asset_id", "out_width", "out_height", "byte_sum",
        "weighted_sum", "n_nonzero")
  }

  /** Deterministic text payload for fixtures. */
  def payloadOf(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
}
