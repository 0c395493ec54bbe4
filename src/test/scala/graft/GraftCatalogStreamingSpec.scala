package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** Streaming through the SQL catalog — `spark.readStream.table` (the
  * keyed table's row-image stream, GraftMicroBatchStream) and
  * `writeStream.toTable` (exactly-once epoch merges,
  * GraftStreamingWrite) — by table NAME, zero format("graft")/path
  * plumbing.
  */
class GraftCatalogStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("gcs-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.gcs",
      classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.gcs.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def version(path: String): Long =
    MergeWriter.describeTable(spark, path).collect().head
      .getAs[Long]("version")

  test("readStream.table -> writeStream.toTable: snapshot, tail, restart") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcs.etl")
    spark.sql("CREATE TABLE gcs.etl.src (id BIGINT, v DOUBLE, s STRING) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    spark.sql("CREATE TABLE gcs.etl.mirror (id BIGINT, v DOUBLE, s STRING) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    spark.sql("INSERT INTO gcs.etl.src " +
      "SELECT id, CAST(id AS DOUBLE), concat('r', id) FROM range(100)")
    val ckpt = Files.createTempDirectory("gcs-ckpt").toString

    def startQuery() = spark.readStream
      .table("gcs.etl.src")
      .writeStream
      .option("checkpointLocation", ckpt)
      .toTable("gcs.etl.mirror")

    val q = startQuery()
    try {
      q.processAllAvailable() // batch 0: full snapshot as row images
      assert(spark.sql("SELECT COUNT(*) AS c FROM gcs.etl.mirror")
        .collect().head.getLong(0) == 100)

      // tail: an upsert batch (50 updates + 10 inserts) flows through
      spark.sql("INSERT INTO gcs.etl.src " +
        "SELECT id, -1.0, 'upd' FROM range(50, 110)")
      q.processAllAvailable()
      val m = spark.sql("SELECT COUNT(*) AS c, " +
        "SUM(CASE WHEN s = 'upd' THEN 1 ELSE 0 END) AS u " +
        "FROM gcs.etl.mirror").collect().head
      assert(m.getLong(0) == 110 && m.getLong(1) == 60)
    } finally q.stop()

    // restart on the SAME checkpoint: no data moved -> no duplicate
    // application (exactly-once via the stable-query-id txn ledger)
    val sinkPath = s"$wh/etl/mirror"
    val vBefore = version(sinkPath)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      // a replayed/empty restart may record a txn guard, never rows
      assert(spark.sql("SELECT COUNT(*) AS c FROM gcs.etl.mirror")
        .collect().head.getLong(0) == 110)
      // new data after the restart still flows
      spark.sql("INSERT INTO gcs.etl.src VALUES (500, 5.0, 'late')")
      q2.processAllAvailable()
      assert(spark.sql("SELECT s FROM gcs.etl.mirror WHERE id = 500")
        .collect().head.getString(0) == "late")
    } finally q2.stop()
    assert(version(sinkPath) >= vBefore)
    spark.sql("DROP TABLE gcs.etl.src")
    spark.sql("DROP TABLE gcs.etl.mirror")
  }

  test("maxVersionsPerTrigger bounds catch-up batches after a stall") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcs.etl")
    spark.sql("CREATE TABLE gcs.etl.lagsrc (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2', 'retainVersions'='10')")
    spark.sql("CREATE TABLE gcs.etl.lagsink (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2')")
    spark.sql("INSERT INTO gcs.etl.lagsrc VALUES (0, 0)")
    val ckpt = Files.createTempDirectory("gcs-lag-ckpt").toString
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "1")
      .table("gcs.etl.lagsrc")
      .writeStream
      .option("checkpointLocation", ckpt)
      .toTable("gcs.etl.lagsink")
    try {
      q.processAllAvailable() // batch 0: snapshot (one batch regardless)
      val snapshotBatches = q.recentProgress.count(_.numInputRows > 0)
      // a 3-commit stall accrues AFTER the cursor exists...
      (1 to 3).foreach(i => spark.sql(
        s"INSERT INTO gcs.etl.lagsrc VALUES ($i, ${i * 10})"))
      q.processAllAvailable()
      assert(spark.sql("SELECT COUNT(*) AS c FROM gcs.etl.lagsink")
        .collect().head.getLong(0) == 4)
      // ... and drains ONE VERSION PER TRIGGER: three non-empty
      // catch-up batches, not one lag-sized diff
      val catchUp = q.recentProgress.count(_.numInputRows > 0) -
        snapshotBatches
      assert(catchUp >= 3,
        s"expected 3 rate-limited catch-up batches, saw $catchUp")
    } finally q.stop()
    spark.sql("DROP TABLE gcs.etl.lagsrc")
    spark.sql("DROP TABLE gcs.etl.lagsink")
  }

  test("Trigger.AvailableNow drains to the trigger-start pin and stops") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcs.etl")
    spark.sql("CREATE TABLE gcs.etl.ansrc (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2', 'retainVersions'='10')")
    spark.sql("CREATE TABLE gcs.etl.ansink (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2')")
    spark.sql("INSERT INTO gcs.etl.ansrc SELECT id, id FROM range(20)")
    spark.sql("INSERT INTO gcs.etl.ansrc SELECT id, -id FROM range(20, 30)")
    val ckpt = Files.createTempDirectory("gcs-an-ckpt").toString
    def drain(): Unit = {
      val q = spark.readStream
        .option("maxVersionsPerTrigger", "1") // rate limit composes
        .table("gcs.etl.ansrc")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .toTable("gcs.etl.ansink")
      // AvailableNow TERMINATES by itself once the pin is drained
      assert(q.awaitTermination(120000), "AvailableNow query must stop")
    }
    drain()
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcs.etl.ansink")
      .collect().head.getLong(0) == 30)
    // work committed between runs is the NEXT run's drain
    spark.sql("INSERT INTO gcs.etl.ansrc VALUES (100, 100)")
    spark.sql("INSERT INTO gcs.etl.ansrc VALUES (101, 101)")
    drain()
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcs.etl.ansink")
      .collect().head.getLong(0) == 32)
    spark.sql("DROP TABLE gcs.etl.ansrc")
    spark.sql("DROP TABLE gcs.etl.ansink")
  }

  test("Complete mode: each epoch is an atomic full replace") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcs.etl")
    spark.sql("CREATE TABLE gcs.etl.aggsrc (id BIGINT, grp STRING) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2')")
    spark.sql("CREATE TABLE gcs.etl.aggsink (grp STRING, n BIGINT) " +
      "TBLPROPERTIES ('keys'='grp', 'buckets'='2')")
    spark.sql("INSERT INTO gcs.etl.aggsrc " +
      "SELECT id, IF(id % 2 = 0, 'even', 'odd') FROM range(10)")
    val ckpt = Files.createTempDirectory("gcs-agg-ckpt").toString
    val q = spark.readStream.table("gcs.etl.aggsrc")
      .groupBy("grp").count().withColumnRenamed("count", "n")
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .toTable("gcs.etl.aggsink")
    try {
      q.processAllAvailable()
      val out = spark.sql(
        "SELECT grp, n FROM gcs.etl.aggsink ORDER BY grp")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(out.toSeq == Seq(("even", 5L), ("odd", 5L)))
      spark.sql("INSERT INTO gcs.etl.aggsrc VALUES (100, 'even')")
      q.processAllAvailable()
      assert(spark.sql("SELECT n FROM gcs.etl.aggsink WHERE grp = 'even'")
        .collect().head.getLong(0) == 6)
    } finally q.stop()
    spark.sql("DROP TABLE gcs.etl.aggsrc")
    spark.sql("DROP TABLE gcs.etl.aggsink")
  }
}
