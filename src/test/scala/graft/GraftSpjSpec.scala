package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins (SPARK-37375): a graft table's key-hash
  * bucket layout reported as KeyGroupedPartitioning, so co-keyed
  * tables join — and keyed aggregations run — with ZERO shuffle when
  * `spark.sql.sources.v2.bucketing.enabled` is on. At 100 TB a side
  * the deleted exchange is the dominant query cost; these specs assert
  * the plan shape (no ShuffleExchange) AND value-exact results, plus
  * the fallbacks: mismatched bucket counts shuffle (correctly), and
  * with the conf off nothing changes.
  */
class GraftSpjSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("spj-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.gspj",
      classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.gspj.warehouse", wh)
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    // the point is the exchange, so keep broadcast and AQE out of the
    // plan under inspection
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.adaptive.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force execution first (final plan)
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan
      .collect { case s: ShuffleExchangeLike => s }.length
  }

  private def mkTables(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gspj.ns")
    spark.sql("CREATE TABLE IF NOT EXISTS gspj.ns.a (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='8')")
    spark.sql("CREATE TABLE IF NOT EXISTS gspj.ns.b (id BIGINT, w STRING) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='8')")
    if (spark.table("gspj.ns.a").isEmpty) {
      spark.sql("INSERT INTO gspj.ns.a SELECT id, id * 2 FROM range(1000)")
      spark.sql("INSERT INTO gspj.ns.b " +
        "SELECT id, CONCAT('w', id) FROM range(500, 1500)")
    }
  }

  test("co-keyed tables join with ZERO shuffle (storage-partitioned join)") {
    mkTables()
    val df = spark.sql("SELECT a.id, a.v, b.w FROM gspj.ns.a a " +
      "JOIN gspj.ns.b b ON a.id = b.id")
    assert(shuffles(df) == 0,
      "co-keyed graft tables must join without an exchange")
    // value-exact: overlap is ids 500..999
    val rows = df.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) * 2 &&
      r.getString(2) == s"w${r.getLong(0)}"))
  }

  test("aggregation on the merge key avoids the exchange too") {
    mkTables()
    val agg = spark.sql(
      "SELECT id, COUNT(*) AS n, SUM(v) AS sv FROM gspj.ns.a GROUP BY id")
    assert(shuffles(agg) == 0,
      "a groupBy on the bucketed merge key needs no shuffle")
    val rows = agg.collect()
    assert(rows.length == 1000 && rows.forall(_.getLong(1) == 1L))
  }

  test("mismatched bucket counts fall back to a shuffled join, correctly") {
    mkTables()
    spark.sql("CREATE TABLE IF NOT EXISTS gspj.ns.c (id BIGINT, u BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    if (spark.table("gspj.ns.c").isEmpty)
      spark.sql("INSERT INTO gspj.ns.c SELECT id, id + 7 FROM range(1000)")
    val df = spark.sql("SELECT a.id, a.v, c.u FROM gspj.ns.a a " +
      "JOIN gspj.ns.c c ON a.id = c.id")
    assert(shuffles(df) > 0, "4-bucket vs 8-bucket cannot co-partition")
    val rows = df.collect()
    assert(rows.length == 1000 &&
      rows.forall(r => r.getLong(2) == r.getLong(0) + 7))
  }

  test("with the conf off, the join shuffles exactly as before") {
    mkTables()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val df = spark.sql("SELECT a.id, b.w FROM gspj.ns.a a " +
        "JOIN gspj.ns.b b ON a.id = b.id")
      assert(shuffles(df) > 0)
      assert(df.collect().length == 500)
    } finally
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  }

  test("SPJ composes with data skipping: a pruned side still co-joins") {
    mkTables()
    val df = spark.sql("SELECT a.id, a.v, b.w FROM gspj.ns.a a " +
      "JOIN gspj.ns.b b ON a.id = b.id WHERE a.id >= 900 AND a.id < 950")
    assert(shuffles(df) == 0,
      "partially-pruned sides co-join via pushed partition values")
    assert(df.collect().length == 50)
  }
}
