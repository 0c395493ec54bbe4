package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables written on the join key must join WITHOUT a shuffle on
  * either side — the co-located pre-partitioning that turns a fact⋈fact
  * join into a local merge at 100 TB.
  */
class BucketSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // make the test deterministic: force the sort-merge path (the point
    // is the absent Exchange, not the join strategy pick)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed-by-key tables join with no Exchange on either side") {
    import spark.implicits._
    val root = Files.createTempDirectory("bucket").toString
    val a = (0 until 1000).map(i => (i.toLong, s"p${i % 5}")).toDF("k", "p")
    val b = (0 until 3000).map(i => ((i % 1000).toLong, i * 1.0)).toDF("k", "v")
    a.write.option("path", s"$root/a").bucketBy(4, "k").sortBy("k")
      .saveAsTable("bspec_a")
    b.write.option("path", s"$root/b").bucketBy(4, "k").sortBy("k")
      .saveAsTable("bspec_b")
    val joined = spark.table("bspec_a")
      .join(spark.table("bspec_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 3000)
    // control: the same data UNbucketed shuffles both sides
    val plain = a.join(b.hint("merge"), "k")
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
