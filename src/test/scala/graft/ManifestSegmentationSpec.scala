package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** Manifest segmentation (Iceberg's manifest-list design on this
  * protocol's CAS): past [[MergeWriter.SegInlineMaxBuckets]] buckets,
  * the `_manifest-<v>` head carries table-level fields plus an ordered
  * list of content-addressed per-bucket-range segment hashes, and the
  * per-bucket state (epoch pointers, file stats, overlays, eq-delete
  * records) lives in immutable `_seg/` files. A commit writes ONLY the
  * ranges it touched and reuses every other segment by hash — commit
  * metadata I/O is O(head + touched ranges), never O(buckets) — while
  * every read path (current, time travel, change feed, branches, gc)
  * behaves exactly as with the inline format.
  */
class ManifestSegmentationSpec extends AnyFunSuite with BeforeAndAfterAll
    with ManifestSpecHelpers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The head's ordered segment-hash list (raw-JSON introspection). */
  private def segHashes(dir: String): Seq[String] = {
    val t = manifestText(dir)
    val i = t.indexOf("\"segs\":[")
    if (i < 0) return Seq.empty
    val body = t.substring(i + 8, t.indexOf("]", i))
    if (body.isEmpty) Seq.empty
    else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  private def segFiles(dir: String): Set[String] = {
    val d = new java.io.File(dir, "_seg")
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName).filter(_.startsWith("seg-")).toSet
  }

  private def seed(dir: String, n: Int, buckets: Int): Unit = {
    import spark.implicits._
    val rows = (0 until n).map(i => (i.toLong, s"v1-$i", i % 7))
      .toDF("id", "body", "grp")
    MergeWriter.merge(spark, dir, rows, Seq("id"), buckets = buckets,
      clusterBy = Seq("id"))
  }

  test("past the bucket threshold the head is segmented: per-bucket " +
       "state moves to _seg/, content round-trips exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mseg").toString + "/t"
    seed(dir, 2000, buckets = 256)
    val head = manifestText(dir)
    assert(head.contains("\"segs\":[") && head.contains("\"segw\":"),
      "a 256-bucket table must commit a segmented head")
    assert(!head.contains("\"stats\":") && head.contains("\"epochs\":{}"),
      s"per-bucket state must NOT ride the head: ${head.take(300)}")
    assert(segHashes(dir).size == 4, "256 buckets / width 64 = 4 ranges")
    // content equals what was written, via the manifest-served schema+stats
    val t = MergeWriter.readTable(spark, dir)
    assert(t.count() == 2000)
    assert(t.where(col("id") === 1234L).select("body").as[String]
      .head() == "v1-1234")
  }

  test("a trickle commit rewrites ONLY the touched ranges' segments and " +
       "reuses the rest by hash") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mseg2").toString + "/t"
    seed(dir, 2000, buckets = 256)
    val before = segHashes(dir)
    val filesBefore = segFiles(dir)
    // one upserted key touches exactly one bucket ⇒ one range
    MergeWriter.merge(spark, dir, Seq((77L, "UPD", 0)).toDF("id", "body",
      "grp"), Seq("id"))
    val after = segHashes(dir)
    assert(after.size == before.size)
    val reused = before.zip(after).count { case (a, b) => a == b }
    assert(reused == before.size - 1,
      s"exactly one range changed: reused $reused of ${before.size}")
    // and the _seg dir grew by exactly the one new segment
    val newFiles = segFiles(dir) -- filesBefore
    assert(newFiles.size == 1, s"one new segment file, got $newFiles")
    assert(MergeWriter.readTable(spark, dir)
      .where(col("id") === 77L).select("body").as[String].head() == "UPD")
  }

  test("commit metadata bytes are touched-proportional, not " +
       "table-proportional: head ≪ the per-bucket state it references") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mseg3").toString + "/t"
    seed(dir, 4000, buckets = 512)
    MergeWriter.merge(spark, dir, Seq((9L, "UPD", 0)).toDF("id", "body",
      "grp"), Seq("id"))
    val d = new java.io.File(dir)
    val headBytes = d.listFiles().filter(_.getName.startsWith("_manifest-"))
      .map(_.getName).sorted.last match {
      case n => new java.io.File(d, n).length()
    }
    val segDir = new java.io.File(dir, "_seg")
    val allSegBytes = segDir.listFiles().filter(_.getName.startsWith("seg-"))
      .map(_.length()).sum
    // the head is a hash list: far smaller than the state. The trickle's
    // newly WRITTEN metadata = head + one segment ≈ allSeg/ranges, not
    // allSeg.
    assert(headBytes * 5 < allSegBytes,
      s"head $headBytes vs segments $allSegBytes — head must be a " +
        "fraction of the per-bucket state")
  }

  test("time travel and the change feed read across segmented versions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mseg4").toString + "/t"
    seed(dir, 1000, buckets = 128)
    val v1 = MergeWriter.availableVersions(spark, dir).last
    MergeWriter.merge(spark, dir,
      Seq((5L, "UPD-5", 0), (2000L, "NEW", 1)).toDF("id", "body", "grp"),
      Seq("id"))
    val v2 = MergeWriter.availableVersions(spark, dir).last
    assert(MergeWriter.readTableVersion(spark, dir, v1).count() == 1000)
    assert(MergeWriter.readTableVersion(spark, dir, v2).count() == 1001)
    val feed = MergeWriter.changeFeed(spark, dir, v1, v2, Seq("id"),
      Seq("body", "grp")).collect()
    assert(feed.length == 2)
    val ops = feed.map(r => r.getAs[Long]("id") ->
      r.getAs[String]("op")).toMap
    assert(ops == Map(5L -> "update", 2000L -> "insert"))
  }

  test("gc reclaims segments no retained head references and keeps the " +
       "referenced ones") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mseg5").toString + "/t"
    seed(dir, 1000, buckets = 128)
    // churn several versions: superseded ranges pile up in _seg
    (0 until 5).foreach { i =>
      MergeWriter.merge(spark, dir,
        Seq((i.toLong, s"UPD-$i", 0)).toDF("id", "body", "grp"), Seq("id"))
    }
    val beforeGc = segFiles(dir)
    MergeWriter.gcNow(spark, dir)
    val afterGc = segFiles(dir)
    assert(afterGc.size < beforeGc.size,
      s"gc must reclaim superseded segments: $beforeGc -> $afterGc")
    // every RETAINED version still resolves fully
    MergeWriter.availableVersions(spark, dir).foreach { v =>
      assert(MergeWriter.readTableVersion(spark, dir, v).count() >= 1000)
    }
    // live hashes all still on disk
    segHashes(dir).foreach(h =>
      assert(afterGc.contains(s"seg-$h.json"), s"live segment $h kept"))
  }

  test("branch staging and fast_forward work on a segmented table, " +
       "sharing the content-addressed segment pool") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mseg6").toString + "/t"
    seed(dir, 1000, buckets = 128)
    MergeWriter.createBranch(spark, dir, "audit")
    MergeWriter.merge(spark, dir,
      Seq((3L, "STAGED", 9)).toDF("id", "body", "grp"), Seq("id"),
      ref = Some("audit"))
    // main unchanged; branch sees the staged row
    assert(MergeWriter.readTable(spark, dir)
      .where(col("id") === 3L).select("body").as[String].head() == "v1-3")
    MergeWriter.fastForward(spark, dir, "audit")
    assert(MergeWriter.readTable(spark, dir)
      .where(col("id") === 3L).select("body").as[String].head() == "STAGED")
  }

  test("eq-delete records ride segments: write-only trickle on a " +
       "segmented eqDeletes table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mseg7").toString + "/t"
    val rows = (0 until 1000).map(i => (i.toLong, s"v1-$i", i % 7))
      .toDF("id", "body", "grp")
    MergeWriter.merge(spark, dir, rows, Seq("id"), buckets = 128,
      clusterBy = Seq("id"), eqDeletes = true, fingerprint = true)
    val before = segHashes(dir)
    MergeWriter.delete(spark, dir, Seq(11L, 500L).toDF("id"), Seq("id"))
    val after = segHashes(dir)
    val changed = before.zip(after).count { case (a, b) => a != b }
    assert(changed >= 1 && changed <= 2,
      s"the delete touches at most two ranges, changed $changed")
    val t = MergeWriter.readTable(spark, dir)
    assert(t.count() == 998 &&
      t.where(col("id").isin(11L, 500L)).count() == 0)
  }

  test("a bucket split past the threshold migrates an inline table to " +
       "the segmented format transparently") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mseg8").toString + "/t"
    seed(dir, 1000, buckets = 64) // at the threshold: inline
    assert(segHashes(dir).isEmpty && manifestText(dir).contains("\"stats\":"))
    MergeWriter.splitBuckets(spark, dir, Seq("id")) // 128 buckets
    assert(segHashes(dir).nonEmpty,
      "the doubled modulus crosses the threshold: segmented head")
    assert(MergeWriter.readTable(spark, dir).count() == 1000)
    MergeWriter.merge(spark, dir, Seq((1L, "UPD", 0)).toDF("id", "body",
      "grp"), Seq("id"))
    assert(MergeWriter.readTable(spark, dir)
      .where(col("id") === 1L).select("body").as[String].head() == "UPD")
  }
}
