package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** Deletion vectors through the SQL surface: while a table version
  * carries live vectors, CATALOG reads stay on the native DSv2 scan
  * with a reader-side row-index skip (GraftDvSkipReaderFactory), and
  * `format("graft")` reads bridge through the DV-aware storage core —
  * SELECT, point lookups, SQL DELETE (DV fast path), row-level
  * MERGE/UPDATE, time travel and `CALL gc.system.compact` must all
  * agree with the copy-on-write semantics.
  */
class DeleteVectorSqlSpec extends AnyFunSuite with BeforeAndAfterAll
    with ManifestSpecHelpers {

  private lazy val spark = {
    val wh = Files.createTempDirectory("gdv-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gdv",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.gdv.warehouse", wh)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()


  private def tableDir(name: String): String = {
    val wh = spark.conf.get("spark.sql.catalog.gdv.warehouse")
    s"$wh/ns/$name"
  }

  test("SQL DELETE takes the DV fast path; SELECT stays native") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdv.ns")
    spark.sql(
      "CREATE TABLE gdv.ns.t (id BIGINT, grp STRING, v DOUBLE) " +
        "TBLPROPERTIES ('keys'='id', 'buckets'='4', 'clusterBy'='id', " +
        "'deleteVectors'='true')")
    spark.sql(
      "INSERT INTO gdv.ns.t SELECT id, CONCAT('g', id % 3), " +
        "CAST(id AS DOUBLE) FROM range(0, 500)")
    val before = manifestText(tableDir("t"))
    spark.sql("DELETE FROM gdv.ns.t WHERE id IN (5, 123, 456)")
    val after = manifestText(tableDir("t"))
    assert(after.contains("\"dv\":"),
      "translatable SQL DELETE on a deleteVectors table must commit a DV")
    def ptrs(m: String): String = {
      val i = m.indexOf("\"epochs\":{"); m.substring(i, m.indexOf("}", i))
    }
    assert(ptrs(after) == ptrs(before), "DV delete must not move pointers")
    // the DV'd version plans as the native DSv2 scan (round 12: the
    // V1 bridge is retired for catalog reads) — row-based readers with
    // the per-file dead-position skip, never a second-plan Row RDD
    val dvPlan = spark.sql("SELECT v FROM gdv.ns.t WHERE id < 10")
      .queryExecution.executedPlan.toString
    assert(dvPlan.contains("BatchScan"),
      s"DV'd catalog scan must stay the native DSv2 scan, got:\n$dvPlan")
    assert(!dvPlan.contains("RowDataSourceScan"),
      s"DV'd catalog scan must not fall back to a V1 bridge:\n$dvPlan")
    // full scan, filtered scan, point lookup — all through the skip
    assert(spark.sql("SELECT COUNT(*) AS c FROM gdv.ns.t")
      .collect().head.getLong(0) == 497)
    assert(spark.sql("SELECT COUNT(*) AS c FROM gdv.ns.t WHERE id < 10")
      .collect().head.getLong(0) == 9)
    assert(spark.sql("SELECT v FROM gdv.ns.t WHERE id = 123").count() == 0)
    assert(spark.sql("SELECT v FROM gdv.ns.t WHERE id = 124")
      .collect().head.getDouble(0) == 124.0)
    // aggregation over the bridge
    assert(spark.sql("SELECT SUM(v) AS s FROM gdv.ns.t")
      .collect().head.getDouble(0) ==
      (0 until 500).map(_.toDouble).sum - 5.0 - 123.0 - 456.0)
  }

  test("row-level UPDATE and MERGE read THROUGH the vectors") {
    // UPDATE must not see dead rows (it would re-animate them as
    // updated copies), and MERGE must take NOT MATCHED for deleted keys
    spark.sql("UPDATE gdv.ns.t SET grp = 'touched' WHERE id IN (5, 6)")
    val g = spark.sql("SELECT id, grp FROM gdv.ns.t WHERE id IN (5, 6)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g == Set((6L, "touched")),
      s"UPDATE resurrected a DV-deleted row (got $g)")
    spark.sql(
      "MERGE INTO gdv.ns.t USING (SELECT 123 AS id UNION ALL SELECT 124) " +
        "src ON t.id = src.id " +
        "WHEN MATCHED THEN UPDATE SET grp = 'matched' " +
        "WHEN NOT MATCHED THEN INSERT (id, grp, v) VALUES " +
        "(src.id, 'inserted', -1.0)")
    val m = spark.sql("SELECT id, grp FROM gdv.ns.t WHERE id IN (123, 124)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(m == Set((123L, "inserted"), (124L, "matched")),
      s"MERGE matched a DV-deleted key (got $m)")
  }

  test("time travel: the pre-delete version scans columnar, the " +
       "post-delete version row-based with the DV skip") {
    spark.sql("CREATE TABLE gdv.ns.tt (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('keys'='id', 'deleteVectors'='true')")
    spark.sql("INSERT INTO gdv.ns.tt SELECT id, 'x' FROM range(0, 100)")
    val v1 = spark.sql("SELECT MAX(version) AS v FROM gdv.ns.tt.history")
      .collect().head.getLong(0)
    spark.sql("DELETE FROM gdv.ns.tt WHERE id = 50")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM gdv.ns.tt VERSION AS OF $v1")
      .collect().head.getLong(0) == 100)
    assert(spark.sql("SELECT COUNT(*) AS c FROM gdv.ns.tt")
      .collect().head.getLong(0) == 99)
    // the .changes feed carries the DV delete
    val ops = spark.sql(
      s"SELECT id, op FROM gdv.ns.tt.changes WHERE _commit_version > $v1")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ops == Set((50L, "delete")))
  }

  test("readStream.table tails a DV-bearing table (snapshot excludes " +
       "dead rows)") {
    import org.apache.spark.sql.streaming.Trigger
    val out = Files.createTempDirectory("dvstream").toString
    val q = spark.readStream.table("gdv.ns.tt")
      .writeStream.format("parquet")
      .option("path", s"$out/sink")
      .option("checkpointLocation", s"$out/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(s"$out/sink")
    assert(got.count() == 99 && got.where(col("id") === 50L).count() == 0)
  }

  test("CALL gc.system.compact purges the vectors and restores the " +
       "native scan path") {
    spark.sql("CALL gdv.system.compact(table => 'ns.tt')")
    assert(!manifestText(tableDir("tt")).contains("\"dv\":"))
    assert(spark.sql("SELECT COUNT(*) AS c FROM gdv.ns.tt")
      .collect().head.getLong(0) == 99)
    // post-compaction the plan is the DSv2 parquet scan again
    val plan = spark.sql("SELECT * FROM gdv.ns.tt WHERE id = 7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") && !plan.contains("GraftDvScan"),
      s"expected the native scan after compaction, got:\n$plan")
  }

  test("format(graft) read of a DV-bearing path bridges; " +
       "format write after DV delete does not resurrect") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dvfmt").toString + "/t"
    val rows = (0 until 200).map(i => (i.toLong, s"b$i")).toDF("id", "body")
    rows.write.format("graft").option("keys", "id")
      .option("deleteVectors", "true").save(dir)
    MergeWriter.delete(spark, dir, Seq(7L, 8L).toDF("id"), Seq("id"))
    val t = spark.read.format("graft").load(dir)
    assert(t.count() == 198)
    assert(t.where(col("id") === 7L).count() == 0)
    assert(t.where(col("id") === 9L).count() == 1)
    assert(t.where(col("id") >= 190L).count() == 10)
    // versionAsOf still serves the pre-delete state
    val v = MergeWriter.availableVersions(spark, dir).head
    assert(spark.read.format("graft").option("versionAsOf", v.toString)
      .load(dir).count() == 200)
  }

}
