package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Watermarks

class WatermarksSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("advance is monotonic: a replayed stale batch cannot regress the mark") {
    import spark.implicits._
    val path = Files.createTempDirectory("wm").toString + "/checkpoints"
    val b1 = Seq(("ds1", ts("2024-01-10 00:00:00")), ("ds2", ts("2024-01-12 00:00:00")))
      .toDF("ds", "updated")
    Watermarks.advance(spark, path, b1, col("ds"), col("updated"))
    val b2 = Seq(("ds1", ts("2024-01-20 00:00:00"))).toDF("ds", "updated")
    Watermarks.advance(spark, path, b2, col("ds"), col("updated"))
    // replay batch 1 (stale for ds1, equal for ds2)
    Watermarks.advance(spark, path, b1, col("ds"), col("updated"))
    val marks = Watermarks.currentMarks(spark, path).collect()
      .map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    assert(marks == Map("ds1" -> ts("2024-01-20 00:00:00"),
      "ds2" -> ts("2024-01-12 00:00:00")))
  }

  test("incremental passes only rows after each datasource's mark") {
    import spark.implicits._
    val path = Files.createTempDirectory("wm2").toString + "/checkpoints"
    val b1 = Seq(("ds1", ts("2024-01-10 00:00:00"))).toDF("ds", "updated")
    Watermarks.advance(spark, path, b1, col("ds"), col("updated"))
    val all = Seq(
      ("ds1", ts("2024-01-09 00:00:00"), 1), // before mark: filtered
      ("ds1", ts("2024-01-10 00:00:00"), 2), // at mark: filtered (strict >)
      ("ds1", ts("2024-01-11 00:00:00"), 3), // after mark: kept
      ("dsNEW", ts("2024-01-01 00:00:00"), 4) // no mark (first run): kept
    ).toDF("ds", "updated", "id")
    val out = Watermarks.incremental(all, col("ds"), col("updated"),
      Watermarks.currentMarks(spark, path)).select("id").as[Int].collect().toSet
    assert(out == Set(3, 4))
  }
}
