package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Planner-facing scan statistics: the manifest's exact per-file row
  * counts surface through `estimateStatistics` (broadcast-vs-shuffle
  * and AQE decisions key off them), shrinking with static pruning; and
  * the inherited parquet aggregate pushdown (COUNT/MIN/MAX answered
  * from footers) stays live through the catalog scan.
  */
class GraftScanStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("stats-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.gst",
      classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.gst.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def mkTable(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gst.ns")
    spark.sql("CREATE TABLE IF NOT EXISTS gst.ns.t (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='8')")
    if (spark.table("gst.ns.t").isEmpty)
      spark.sql("INSERT INTO gst.ns.t SELECT id, id * 2 FROM range(10000)")
  }

  private def rowCountOf(df: org.apache.spark.sql.DataFrame)
      : Option[BigInt] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r.stats.rowCount
      }.head

  test("the scan reports the manifest's EXACT row count to the planner") {
    mkTable()
    assert(rowCountOf(spark.table("gst.ns.t")).contains(BigInt(10000)))
  }

  test("a bucket-pruned point lookup reports only the pruned rows") {
    mkTable()
    val pruned = rowCountOf(spark.table("gst.ns.t").where("id = 42"))
    assert(pruned.isDefined && pruned.get < BigInt(10000),
      s"a one-bucket probe must report < table rows, got $pruned")
    assert(pruned.get >= BigInt(1))
  }

  test("parquet aggregate pushdown answers COUNT/MIN/MAX from footers") {
    mkTable()
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val df = spark.sql(
        "SELECT COUNT(*) AS n, MIN(id) AS lo, MAX(id) AS hi FROM gst.ns.t")
      val planStr = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(planStr.contains("PushedAggregation: [COUNT(*)"),
        s"expected pushed aggregation in:\n$planStr")
      val r = df.collect().head
      assert(r.getLong(0) == 10000L && r.getLong(1) == 0L &&
        r.getLong(2) == 9999L)
    } finally
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
  }
}
