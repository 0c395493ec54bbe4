package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def assets = {
    import spark.implicits._
    val df = Seq((1L, "payload-one-abcdefgh"), (2L, "payload-two-ijklmnop"))
      .toDF("id", "data")
    Multimodal.toAssets(df, col("id"), col("data"), "image/fake")
  }

  test("asset wrapping produces the canonical schema") {
    val a = assets
    assert(a.schema.fieldNames.toSeq == Seq("asset_id", "content", "meta"))
    assert(a.schema("content").dataType.typeName == "binary")
    val meta = a.select(col("meta.mime")).collect().map(_.getString(0)).toSet
    assert(meta == Set("image/fake"))
  }

  test("feature extraction is deterministic with fixed dimension") {
    val f1 = Multimodal.extractImageFeatures(assets, dim = 8).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getSeq[Float](1).toList).toMap
    val f2 = Multimodal.extractImageFeatures(assets, dim = 8).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getSeq[Float](1).toList).toMap
    assert(f1(1L).size == 8)
    assert(f1 == f2)
    assert(f1(1L) != f1(2L))
  }

  test("frame sampling emits every Nth fixed-size window") {
    val frames = Multimodal.sampleFrames(assets, frameBytes = 4, everyNth = 2)
      .filter(col("asset_id") === 1L).collect()
    // 20 bytes / 4 = 5 frames, every 2nd → frames 0, 2, 4
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 2, 4))
  }

  test("frame byte stats report exact per-frame length and checksum") {
    val stats = Multimodal.frameByteStats(
        Multimodal.sampleFrames(assets, frameBytes = 4, everyNth = 2))
      .filter(col("asset_id") === 1L).collect()
      .map(r => r.getAs[Int]("frame_idx") ->
        ((r.getAs[Long]("n_bytes"), r.getAs[Long]("byte_sum")))).toMap
    // payload is a known ASCII string: checksum = sum of char codes
    val bytes = Multimodal.payloadOf("payload-one-abcdefgh")
    def sumOf(from: Int, until: Int) =
      bytes.slice(from, until).map(_.toLong).sum
    assert(stats == Map(
      0 -> ((4L, sumOf(0, 4))), 2 -> ((4L, sumOf(8, 12))),
      4 -> ((4L, sumOf(16, 20)))))
  }

  test("WavPcmDecoder frames the data chunk of a generated container") {
    import spark.implicits._
    val df = Seq((7L, "abcdefghijklmnopqrst")).toDF("id", "data") // 20 bytes
    val wav = Multimodal.toWavAssets(df, col("id"), col("data"))
    // duration metadata comes from the data length / sample rate
    assert(wav.select(col("meta.mime"), col("meta.duration_ms")).collect()
      .head.toSeq == Seq("audio/wav", 20L * 1000 / 8000))
    val frames = Multimodal.frameByteStats(Multimodal.sampleFrames(wav,
        Multimodal.WavPcmDecoder(samplesPerFrame = 4), everyNth = 1))
      .collect()
      .map(r => r.getAs[Int]("frame_idx") ->
        ((r.getAs[Long]("n_bytes"), r.getAs[Long]("byte_sum")))).toMap
    val bytes = Multimodal.payloadOf("abcdefghijklmnopqrst")
    def sumOf(from: Int, until: Int) = bytes.slice(from, until).map(_.toLong).sum
    // frames cover the DATA region only — 'a' is frame 0 byte 0, not the
    // RIFF header; 20 data bytes / 4 = 5 frames
    assert(frames == (0 until 5)
      .map(f => f -> ((4L, sumOf(f * 4, f * 4 + 4)))).toMap)
  }

  test("WavPcmDecoder walks past non-data chunks and rejects malformed containers") {
    import spark.implicits._
    // hand-built container with a LIST chunk BETWEEN fmt and data: a
    // parser that assumes data at offset 44 reads garbage; the chunk walk
    // must skip it (including the odd-size word-alignment pad)
    val data = "0123456789".getBytes("US-ASCII")
    val list = "xyz".getBytes("US-ASCII") // odd size → 1 pad byte
    val bb = java.nio.ByteBuffer.allocate(12 + 24 + 8 + list.length + 1 + 8 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(bb.capacity - 8)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb.put("LIST".getBytes("US-ASCII")).putInt(list.length).put(list).put(0.toByte)
    bb.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    val decoder = Multimodal.WavPcmDecoder(samplesPerFrame = 5)
    val frames = decoder.frames(bb.array(), 1).toList
    assert(frames.map { case (f, b) => f -> new String(b, "US-ASCII") } ==
      List(0 -> "01234", 1 -> "56789"))
    // malformed: bad magic / truncated chunk fail loudly
    intercept[IllegalArgumentException] {
      decoder.frames("not a wav at all, definitely not 44 bytes....".getBytes, 1)
    }
    val truncated = java.util.Arrays.copyOfRange(bb.array(), 0, 40)
    intercept[IllegalArgumentException] { decoder.frames(truncated, 1) }
  }

  test("BmpRowDecoder un-reverses the bottom-up raster and honors the pixel offset") {
    import spark.implicits._
    // 10 chars, width 4 → 3 image rows: "abcd", "efgh", "ij" + zero pad
    val df = Seq((7L, "abcdefghij")).toDF("id", "data")
    val a = Multimodal.toBmpAssets(df, col("id"), col("data"), width = 4)
    val bytes = a.select(col("content")).collect().head.getAs[Array[Byte]](0)
    // container geometry: header 54 + palette 1024 + 3 rows × stride 4
    assert(bytes.length == 54 + 1024 + 3 * 4)
    // storage is bottom-up: the FIRST stored row is the LAST image row
    assert(new String(bytes, 54 + 1024, 4, "US-ASCII") == "ij\u0000\u0000")
    val frames = Multimodal.BmpRowDecoder().frames(bytes, 1).toList
    assert(frames.map { case (f, b) => f -> new String(b, "US-ASCII") } ==
      List(0 -> "abcd", 1 -> "efgh", 2 -> "ij\u0000\u0000"))
    // every-2nd sampling keeps image rows 0 and 2
    assert(Multimodal.BmpRowDecoder().frames(bytes, 2).map(_._1).toList ==
      List(0, 2))
    // malformed containers fail loudly: bad magic, truncated raster
    intercept[IllegalArgumentException] {
      Multimodal.BmpRowDecoder().frames("definitely not a bmp container at all....here".getBytes, 1)
    }
    intercept[IllegalArgumentException] {
      Multimodal.BmpRowDecoder().frames(
        java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 1), 1)
    }
  }

  test("PgmRowDecoder tokenizes the ASCII header and frames top-down rows") {
    import spark.implicits._
    // 10 chars, width 4 → 3 image rows: "abcd", "efgh", "ij" + zero fill
    val df = Seq((9L, "abcdefghij")).toDF("id", "data")
    val a = Multimodal.toPgmAssets(df, col("id"), col("data"), width = 4)
    val bytes = a.select(col("content")).collect().head.getAs[Array[Byte]](0)
    // header: "P5\n# graft pgm fixture\n4 3\n255\n" = 31 bytes, then 12 raster
    val header = "P5\n# graft pgm fixture\n4 3\n255\n"
    assert(bytes.length == header.length + 3 * 4)
    assert(new String(bytes, 0, header.length, "US-ASCII") == header)
    val frames = Multimodal.PgmRowDecoder().frames(bytes, 1).toList
    assert(frames.map { case (f, b) => f -> new String(b, "US-ASCII") } ==
      List(0 -> "abcd", 1 -> "efgh", 2 -> "ij\u0000\u0000"))
    assert(Multimodal.PgmRowDecoder().frames(bytes, 2).map(_._1).toList ==
      List(0, 2))
    // a hand-built header with extra whitespace, multi-digit dims, and a
    // comment BETWEEN tokens still parses — the tokenizer is real
    val tricky = ("P5  # wide\n\t 12\n# split\n 2 \n255\n" +
      "abcdefghijklmnopqrstuvwx").getBytes("US-ASCII")
    val got = Multimodal.PgmRowDecoder().frames(tricky, 1).toList
    assert(got.map { case (f, b) => f -> new String(b, "US-ASCII") } ==
      List(0 -> "abcdefghijkl", 1 -> "mnopqrstuvwx"))
    // malformed containers fail loudly: bad magic, truncated raster,
    // oversized maxval (two-byte samples unsupported)
    intercept[IllegalArgumentException] {
      Multimodal.PgmRowDecoder().frames("P6\n4 3\n255\nxxxxxxxxxxxx".getBytes, 1)
    }
    intercept[IllegalArgumentException] {
      Multimodal.PgmRowDecoder().frames(
        java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 1), 1)
    }
    intercept[IllegalArgumentException] {
      Multimodal.PgmRowDecoder().frames("P5\n4 3\n65535\n".getBytes ++
        new Array[Byte](24), 1)
    }
  }

  test("resizeBmpNearest picks the exact NN source pixel per output cell") {
    import spark.implicits._
    // 4×4 image from 16 chars, downsampled 2×2: NN grid (oy·4/2, ox·4/2)
    // = rows {0,2}, cols {0,2} → pixels a, c, i, k in row-major order
    val df = Seq((1L, "abcdefghijklmnop")).toDF("id", "data")
    val a = Multimodal.toBmpAssets(df, col("id"), col("data"), width = 4)
    val out = Multimodal.resizeBmpNearest(a, outW = 2, outH = 2)
      .select(col("pixels")).as[Array[Byte]].collect().head
    assert(new String(out, "US-ASCII") == "acik")
    // identity resize reproduces the raster exactly
    val same = Multimodal.resizeBmpNearest(a, outW = 4, outH = 4)
      .select(col("pixels")).as[Array[Byte]].collect().head
    assert(new String(same, "US-ASCII") == "abcdefghijklmnop")
    // stats: order-sensitive weighted sum pins placement
    val st = Multimodal.resizedPixelStats(
        Multimodal.resizeBmpNearest(a, 2, 2))
      .select(col("byte_sum"), col("weighted_sum"), col("n_nonzero"))
      .as[(Long, Long, Long)].collect().head
    val px = "acik".map(_.toLong)
    assert(st == ((px.sum, px.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum,
      4L)))
  }

  test("resizeBmpNearest resamples whole multi-byte pixels (24 bpp)") {
    import spark.implicits._
    // hand-build a 2×2 24-bpp BMP: pixels (B,G,R) distinct per cell
    val w = 2; val h = 2
    val stride = (w * 3 + 3) / 4 * 4 // 8
    val pixelOff = 54
    val bb = java.nio.ByteBuffer.allocate(pixelOff + h * stride)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(pixelOff + h * stride)
      .putInt(0).putInt(pixelOff)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
      .putInt(h * stride).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up: storage row 0 = image row 1 = pixels [(7,8,9),(10,11,12)]
    bb.put(Array[Byte](7, 8, 9, 10, 11, 12, 0, 0))
    bb.put(Array[Byte](1, 2, 3, 4, 5, 6, 0, 0)) // image row 0
    val a = Seq((5L, bb.array())).toDF("asset_id", "content")
    // 1×1 NN keeps source pixel (0,0) INTACT: bytes (1,2,3), never a
    // byte-granular slice straddling pixels
    val out = Multimodal.resizeBmpNearest(a, 1, 1)
      .select(col("pixels")).as[Array[Byte]].collect().head
    assert(out.toSeq == Seq[Byte](1, 2, 3))
  }

  test("resize target updates metadata only") {
    val resized = Multimodal.withResizeTarget(assets, 224, 224)
    val m = resized.select(col("meta.width"), col("meta.height"), col("content"))
      .collect().head
    assert(m.getInt(0) == 224 && m.getInt(1) == 224)
    assert(m.get(2) != null)
  }
}
