package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** Column DEFAULT values on the graft catalog (Spark's
  * SUPPORT_COLUMN_DEFAULT_VALUE surface): declared at CREATE or via
  * ALTER TABLE ADD COLUMN ... DEFAULT / ALTER COLUMN ... SET DEFAULT,
  * stored as schema field metadata in the manifest — METADATA-ONLY at
  * any scale. CURRENT_DEFAULT feeds future INSERTs (Spark's
  * ResolveDefaultColumns); EXISTS_DEFAULT is what rows written before
  * the column existed read back (filled by the parquet readers, no file
  * rewrite).
  */
class DefaultValuesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val wh = Files.createTempDirectory("dv-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.dft",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.dft.warehouse", wh)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("CREATE TABLE with DEFAULT: INSERT without the column fills it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dft.ns")
    spark.sql(
      """CREATE TABLE dft.ns.t (
        |  id BIGINT, status STRING DEFAULT 'open', score INT DEFAULT 100)
        |TBLPROPERTIES ('keys'='id', 'buckets'='4')""".stripMargin)
    spark.sql("INSERT INTO dft.ns.t (id) VALUES (1), (2)")
    spark.sql("INSERT INTO dft.ns.t (id, status) VALUES (3, 'closed')")
    spark.sql("INSERT INTO dft.ns.t VALUES (4, 'x', 7)")
    val rows = spark.sql(
      "SELECT id, status, score FROM dft.ns.t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSeq == Seq((1L, "open", 100), (2L, "open", 100),
        (3L, "closed", 100), (4L, "x", 7)))
    // the explicit DEFAULT keyword resolves too
    spark.sql("INSERT INTO dft.ns.t VALUES (5, DEFAULT, DEFAULT)")
    assert(spark.sql("SELECT status, score FROM dft.ns.t WHERE id = 5")
      .collect()(0).toSeq == Seq("open", 100))
  }

  test("ADD COLUMN ... DEFAULT: pre-existing rows READ the default " +
       "without any file rewrite") {
    val v0 = spark.sql("SELECT version FROM dft.ns.t.history LIMIT 1")
      .collect()(0).getLong(0)
    spark.sql(
      "ALTER TABLE dft.ns.t ADD COLUMNS (region STRING DEFAULT 'emea')")
    // metadata-only: exactly one commit, no epoch rewrite
    val v1 = spark.sql("SELECT version FROM dft.ns.t.history LIMIT 1")
      .collect()(0).getLong(0)
    assert(v1 == v0 + 1)
    val regions = spark.sql(
      "SELECT DISTINCT region FROM dft.ns.t").collect()
    assert(regions.map(_.getString(0)).toSeq == Seq("emea"),
      s"pre-existing rows must read the exists-default: " +
        s"${regions.mkString(",")}")
    // new INSERT without the column also gets it (current default)
    spark.sql("INSERT INTO dft.ns.t (id) VALUES (6)")
    assert(spark.sql("SELECT region FROM dft.ns.t WHERE id = 6")
      .collect()(0).getString(0) == "emea")
  }

  test("SET DEFAULT changes FUTURE inserts only; stored rows keep " +
       "their values; defaults survive later merges") {
    spark.sql(
      "ALTER TABLE dft.ns.t ALTER COLUMN region SET DEFAULT 'apac'")
    spark.sql("INSERT INTO dft.ns.t (id) VALUES (7)")
    val byId = spark.sql("SELECT id, region FROM dft.ns.t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(7L) == "apac")
    assert(byId(1L) == "emea",
      "rows that read the old exists-default must not follow the new " +
        "current-default")
    // an API merge (schema carries no metadata) must not erase defaults
    import spark.implicits._
    val p = spark.sql("DESCRIBE TABLE EXTENDED dft.ns.t")
      .filter("col_name = 'Location'").collect()(0).getString(1)
      .stripPrefix("file:")
    MergeWriter.merge(spark, p,
      Seq((50L, "s", 1, "sa")).toDF("id", "status", "score", "region"),
      Seq("id"))
    spark.sql("INSERT INTO dft.ns.t (id) VALUES (8)")
    assert(spark.sql("SELECT status, region FROM dft.ns.t WHERE id = 8")
      .collect()(0).toSeq == Seq("open", "apac"),
      "defaults must survive an API merge that knows nothing of them")
    // DROP DEFAULT: later inserts revert to NULL
    spark.sql("ALTER TABLE dft.ns.t ALTER COLUMN region DROP DEFAULT")
    spark.sql("INSERT INTO dft.ns.t (id) VALUES (9)")
    assert(spark.sql("SELECT region FROM dft.ns.t WHERE id = 9")
      .collect()(0).isNullAt(0))
  }
}
