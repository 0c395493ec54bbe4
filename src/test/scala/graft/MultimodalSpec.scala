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

  test("resize target updates metadata only") {
    val resized = Multimodal.withResizeTarget(assets, 224, 224)
    val m = resized.select(col("meta.width"), col("meta.height"), col("content"))
      .collect().head
    assert(m.getInt(0) == 224 && m.getInt(1) == 224)
    assert(m.get(2) != null)
  }
}
