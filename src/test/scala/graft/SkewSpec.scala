package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("salted join is result-identical to the plain join and keys on the salt") {
    import spark.implicits._
    // one pathologically hot key (900 of 1000 rows) plus a long tail
    val big = (0 until 1000)
      .map(i => (i.toLong, if (i < 900) "hot" else s"cold${i % 7}"))
      .toDF("id", "k")
    val dim = (Seq("hot") ++ (0 until 7).map(i => s"cold$i"))
      .map(k => (k, s"cat-$k")).toDF("k", "category").hint("merge")
    val salted = Skew.saltedJoin(big, dim, Seq("k"), col("id"), n = 8)
    val plain = big.join(dim, Seq("k"))
    assert(salted.count() == 1000)
    assert(salted.select("id", "k", "category").collect().toSet ==
      plain.select("id", "k", "category").collect().toSet)
    // the physical join keys include the salt (that IS the mitigation)
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
  }
}
