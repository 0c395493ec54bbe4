package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.MergeWriter

class MergeWriterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("merge upserts on the natural key and is idempotent on replay") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge").toString + "/states"
    val v1 = Seq(("state#org", "ds#A", "To Do", 1), ("state#org", "ds#B", "To Do", 1))
      .toDF("partitionKey", "sortKey", "state", "rev")
    MergeWriter.merge(spark, dir, v1, Seq("partitionKey", "sortKey"))
    assert(spark.read.parquet(dir).count() == 2)

    // update A, insert C
    val v2 = Seq(("state#org", "ds#A", "Done", 2), ("state#org", "ds#C", "To Do", 1))
      .toDF("partitionKey", "sortKey", "state", "rev")
    MergeWriter.merge(spark, dir, v2, Seq("partitionKey", "sortKey"))
    val rows = spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("sortKey") -> r.getAs[String]("state")).toMap
    assert(rows == Map("ds#A" -> "Done", "ds#B" -> "To Do", "ds#C" -> "To Do"))

    // at-least-once replay of the same batch changes nothing (L2 semantics)
    MergeWriter.merge(spark, dir, v2, Seq("partitionKey", "sortKey"))
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("merge rewrites only buckets containing incoming keys") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bmerge").toString + "/t"
    val v1 = (0 until 64).map(i => (s"k$i", i)).toDF("k", "v")
    MergeWriter.merge(spark, dir, v1, Seq("k"), buckets = 8)
    def filesByBucket(): Map[String, Set[String]] = {
      val root = new java.io.File(dir)
      root.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith(MergeWriter.BucketCol + "="))
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).toSet)
        .toMap
    }
    val before = filesByBucket()
    assert(before.size > 1, "fixture should span several buckets")

    MergeWriter.merge(spark, dir, Seq(("k0", 100)).toDF("k", "v"), Seq("k"), buckets = 8)
    val after = filesByBucket()
    val changed = before.keys.filter(b => before(b) != after.getOrElse(b, Set.empty[String]))
    assert(changed.size == 1, s"exactly one bucket should be rewritten, got $changed")

    val rows = MergeWriter.readTable(spark, dir).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Int]("v")).toMap
    assert(rows.size == 64 && rows("k0") == 100 && rows("k1") == 1)
    assert(!MergeWriter.readTable(spark, dir).columns.contains(MergeWriter.BucketCol))
  }

  test("dedupeOnKey keeps the newest row per key") {
    import spark.implicits._
    val batch = Seq(("A", 1, "old"), ("A", 2, "new"), ("B", 1, "only"))
      .toDF("id", "rev", "v")
    val out = MergeWriter.dedupeOnKey(batch, Seq("id"), Seq(col("rev")))
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("v")).toMap
    assert(out == Map("A" -> "new", "B" -> "only"))
  }

  test("overwritePartitions replaces only touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cwim").toString + "/cwim"
    val v1 = Seq(("ctx1", "A"), ("ctx1", "B"), ("ctx2", "C"))
      .toDF("contextId", "workItemId")
    MergeWriter.overwritePartitions(dir, v1, "contextId")
    // refresh ctx1 membership: B dropped, D added; ctx2 untouched
    val v2 = Seq(("ctx1", "A"), ("ctx1", "D")).toDF("contextId", "workItemId")
    MergeWriter.overwritePartitions(dir, v2, "contextId")
    val out = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[String]("contextId"), r.getAs[String]("workItemId"))).toSet
    assert(out == Set(("ctx1", "A"), ("ctx1", "D"), ("ctx2", "C")))
  }
}
