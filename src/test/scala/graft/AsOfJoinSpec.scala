package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def frames = {
    import spark.implicits._
    // right history per key; left probes hitting before/at/after/between
    val right = Seq(
      (1L, 10L, 100L, "r-a"), (1L, 20L, 101L, "r-b"),
      (1L, 20L, 102L, "r-c"), // equal-ts tie: greatest id (102) must win
      (2L, 50L, 200L, "r-d")
    ).toDF("k", "t", "rid", "rv")
    val left = Seq(
      (1L, 5L, "probe-before-any"),
      (1L, 10L, "probe-at-first"),   // inclusive <=: sees rid 100
      (1L, 20L, "probe-at-tie"),     // sees rid 102, not 101
      (1L, 25L, "probe-after-tie"),
      (2L, 49L, "probe-other-key-before"),
      (3L, 99L, "probe-unseen-key")
    ).toDF("k", "t", "label")
    (left, right)
  }

  private def run = {
    val (left, right) = frames
    AsOfJoin.asOf(left,
      right.select(col("k").as("rk"), col("t").as("rt"), col("rid"), col("rv")),
      leftKey = col("k"), rightKey = col("rk"),
      leftTs = col("t"), rightTs = col("rt"),
      rightTieBreak = col("rid"), payload = Seq("rid", "rv"))
  }

  test("as-of semantics: inclusive bound, max-id ties, nulls before history") {
    val got = run.collect()
      .map(r => r.getAs[String]("label") ->
        ((if (r.isNullAt(r.fieldIndex("rid"))) -1L else r.getAs[Long]("rid")),
          Option(r.getAs[String]("rv")).getOrElse("-"))).toMap
    assert(got == Map(
      "probe-before-any" -> ((-1L, "-")),
      "probe-at-first" -> ((100L, "r-a")),
      "probe-at-tie" -> ((102L, "r-c")),
      "probe-after-tie" -> ((102L, "r-c")),
      "probe-other-key-before" -> ((-1L, "-")),
      "probe-unseen-key" -> ((-1L, "-"))))
  }

  test("plan is union+window — no nested-loop or inequality join anywhere") {
    val plan = run.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
    assert(plan.contains("Union"), plan)
  }

  test("reserved and colliding column names fail loudly") {
    val (left, right) = frames
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, col("k"), col("k"), col("t"), col("t"),
        col("rid"), payload = Seq("t")) // collides with left's "t"
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left.withColumnRenamed("label", "__side"), right,
        col("k"), col("k"), col("t"), col("t"),
        col("rid"), payload = Seq("rv"))
    }
  }
}
