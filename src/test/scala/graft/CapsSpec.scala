package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Caps

class CapsSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("perGroupCap matches the naive single-window cap") {
    import spark.implicits._
    // 3 groups of very different sizes, deterministic pseudo-random order
    val df = (0 until 500)
      .map(i => (i.toLong, (i % 3).toLong, ((i * 7919) % 1009).toLong))
      .toDF("id", "grp", "ord")
      .repartition(8)
    val capped = Caps.perGroupCap(df, Seq("grp"), Seq("ord", "id"), k = 5)
    val w = Window.partitionBy(col("grp")).orderBy(col("ord").asc, col("id").asc)
    val naive = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    assert(capped.collect().toSet == naive.collect().toSet)
  }

  test("partial stage keeps at most k rows per (group, partition) and is a superset of the global top-k") {
    import spark.implicits._
    val parts = 8
    // ONE group — the pathological single-bucket corpus a naive window
    // funnels through one task
    val df = (0 until 2000)
      .map(i => (i.toLong, 0L, ((i * 2654435761L) % 100003L)))
      .toDF("id", "grp", "ord")
      .repartition(parts)
    val partial = Caps.partialCap(df, Seq("grp"), Seq("ord", "id"), k = 20)
    val n = partial.count()
    assert(n <= 20L * parts, s"partial kept $n rows, cap is ${20 * parts}")
    // the global top-20 must survive the partial pass
    val w = Window.partitionBy(col("grp")).orderBy(col("ord").asc, col("id").asc)
    val top = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20).drop("rn").collect().toSet
    assert(top.subsetOf(partial.collect().toSet))
    assert(Caps.perGroupCap(df, Seq("grp"), Seq("ord", "id"), k = 20)
      .collect().toSet == top)
  }

  test("the executed plan runs the narrow partial before the window") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, 0L, i.toLong))
      .toDF("id", "grp", "ord").repartition(4)
    val plan = Caps.perGroupCap(df, Seq("grp"), Seq("ord", "id"), k = 3)
      .queryExecution.executedPlan.toString
    // phase 1 is the mapPartitions partial (the pre-aggregation stage);
    // phase 2 is the exact window over the survivors
    val iMap = plan.indexOf("MapPartitions")
    val iWin = plan.indexOf("Window")
    assert(iMap >= 0, s"no partial MapPartitions stage in plan:\n$plan")
    assert(iWin >= 0 && iWin < iMap,
      s"window must consume the partial's output (appear above it):\n$plan")
  }

  test("validates k, reserved columns, and long-typed order keys") {
    import spark.implicits._
    val df = Seq((1L, 1L, "x")).toDF("id", "grp", "s")
    intercept[IllegalArgumentException] {
      Caps.perGroupCap(df, Seq("grp"), Seq("id"), k = 0)
    }
    intercept[IllegalArgumentException] {
      Caps.perGroupCap(df, Seq("grp"), Seq("s"), k = 1)
    }
    intercept[IllegalArgumentException] {
      Caps.perGroupCap(df.withColumn("__cap_rn", lit(1)),
        Seq("grp"), Seq("id"), k = 1)
    }
  }
}
