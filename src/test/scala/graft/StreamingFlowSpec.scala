package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingFlow
import graft.streaming.StreamingFlow.EventIn

class StreamingFlowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val agg = StreamingFlow.windowedCounts(df, col("ts"), col("event_type"),
      "1 hour", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("wc")
      .outputMode("update").start()
    input.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:45:00"), "click"),
      (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "view"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_type, n_events FROM wc").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows.contains(("click", 2L)))
    assert(rows.contains(("view", 1L)))
    q.stop()
  }

  test("flatMapGroupsWithState keeps per-user running state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventIn]
    val updates = StreamingFlow.runningUserState(input.toDS())
    val q = updates.writeStream.format("memory").queryName("us")
      .outputMode("append").start()
    input.addData(EventIn(1, "signup", 1000), EventIn(1, "click", 2000))
    q.processAllAvailable()
    input.addData(EventIn(1, "purchase", 3000), EventIn(2, "view", 1000))
    q.processAllAvailable()
    val byBatch = spark.sql("SELECT userId, nEvents, lastType FROM us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // user 1: 2 events after batch 1, 3 after batch 2 (state survived)
    assert(byBatch.contains((1L, 2L, "click")))
    assert(byBatch.contains((1L, 3L, "purchase")))
    assert(byBatch.contains((2L, 1L, "view")))
    q.stop()
  }

  test("mergeSink rejects a version column built only from merge keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("guard").toString
    val input = MemoryStream[(String, Int, String)]
    val df = input.toDF().toDF("key", "rev", "v")
    // an alias of a key slips past a name comparison; the attribute check
    // must still reject it
    intercept[IllegalArgumentException] {
      StreamingFlow.mergeSink(df, s"$dir/t", Seq("key"),
        col("key").as("disguised"), s"$dir/c")
    }
    // a literal is constant within every key partition — equally arbitrary
    intercept[IllegalArgumentException] {
      StreamingFlow.mergeSink(df, s"$dir/t", Seq("key"), lit(1), s"$dir/c")
    }
  }

  test("foreachBatch merge sink is idempotent on replayed keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream").toString
    val input = MemoryStream[(String, Int, String)]
    val df = input.toDF().toDF("key", "rev", "v")
    val q = StreamingFlow.mergeSink(df, s"$dir/table", Seq("key", "rev"),
      org.apache.spark.sql.functions.col("v"), s"$dir/ckpt")
    input.addData(("A", 1, "a1"), ("B", 1, "b1"))
    q.processAllAvailable()
    // replay A rev1 (at-least-once) + genuinely new A rev2
    input.addData(("A", 1, "a1"), ("A", 2, "a2"))
    q.processAllAvailable()
    q.stop()
    val rows = graft.sources.MergeWriter.readTable(spark, s"$dir/table").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Int]("rev"))).toSet
    assert(rows == Set(("A", 1), ("A", 2), ("B", 1)))
  }

  test("interval join matches within the horizon across staggered batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = MemoryStream[(Long, java.sql.Timestamp)]
    val right = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingFlow.intervalJoin(
      left.toDF().toDF("l_key", "l_ts"), right.toDF().toDF("r_key", "r_ts"),
      "l_key", "r_key", "l_ts", "r_ts",
      watermarkDelay = "1 hour", maxDelay = "30 minutes")
    val q = joined.select(col("l_key"), col("l_ts"), col("r_ts"))
      .writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    left.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // right arrives in a LATER batch: in-horizon (10:20), out-of-horizon
    // (10:50), and wrong-key matches must resolve against buffered left state
    right.addData((1L, ts("2024-01-01 10:20:00")), (1L, ts("2024-01-01 10:50:00")),
      (3L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    // conversion BEFORE the impression is excluded by the lower bound
    right.addData((2L, ts("2024-01-01 09:50:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT l_key, l_ts, r_ts FROM ij").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(rows == Set((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"))))
  }

  test("left-outer interval join emits nulls once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = MemoryStream[(Long, java.sql.Timestamp)]
    val right = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingFlow.intervalJoin(
      left.toDF().toDF("l_key", "l_ts"), right.toDF().toDF("r_key", "r_ts"),
      "l_key", "r_key", "l_ts", "r_ts",
      watermarkDelay = "10 minutes", maxDelay = "30 minutes",
      joinType = "left_outer")
    val q = joined.select(col("l_key"), col("r_key"))
      .writeStream.format("memory").queryName("oj")
      .outputMode("append").start()
    // key 1 converts in-horizon; key 2 never converts
    left.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
    right.addData((1L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    val beforeFlush = spark.sql("SELECT l_key FROM oj WHERE r_key IS NULL").count()
    assert(beforeFlush == 0, "null rows must wait for the watermark")
    // watermark sentinels on BOTH sides (the join takes the minimum)
    left.addData((99L, ts("2024-01-01 12:00:00")))
    right.addData((99L, ts("2024-01-01 12:00:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT l_key, r_key FROM oj WHERE l_key <> 99").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows == Set((1L, 1L), (2L, -1L)))
  }
}
