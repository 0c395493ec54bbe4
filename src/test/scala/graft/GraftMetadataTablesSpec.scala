package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** SQL-visible metadata tables: `gc.ns.t.history` (commit history) and
  * `gc.ns.t.changes` (the per-version CDC feed with `_commit_version`
  * bounds as plain predicates), plus the `.changes` streaming source —
  * the feed that carries deletes.
  */
class GraftMetadataTablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("gmt-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.gmt",
      classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.gmt.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("t.history: commit history as plain SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmt.ns")
    spark.sql("CREATE TABLE gmt.ns.h (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2', 'retainVersions'='5')")
    spark.sql("INSERT INTO gmt.ns.h SELECT id, id FROM range(10)")
    spark.sql("DELETE FROM gmt.ns.h WHERE id = 3")
    val hist = spark.sql(
      "SELECT version, op FROM gmt.ns.h.history ORDER BY version DESC")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(hist.length >= 3)
    assert(hist.head._2 == "delete" && hist(1)._2 == "merge")
    // aggregates/joins over it work like any table
    assert(spark.sql(
      "SELECT COUNT(*) AS c FROM gmt.ns.h.history WHERE op = 'merge'")
      .collect().head.getLong(0) == 1)
    spark.sql("DROP TABLE gmt.ns.h")
  }

  test("t.files: a MoR-pressured table is diagnosable in plain SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmt.ns")
    spark.sql("CREATE TABLE gmt.ns.f (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4', 'clusterBy'='id', " +
      "'deleteVectors'='true')")
    spark.sql("INSERT INTO gmt.ns.f SELECT id, id FROM range(0, 400)")
    // a DV delete + a MoR upsert: pressure an operator would diagnose
    spark.sql("DELETE FROM gmt.ns.f WHERE id IN (5, 105, 205)")
    spark.sql("INSERT INTO gmt.ns.f SELECT id, -id FROM range(398, 410)")
    val inv = spark.sql("""SELECT
        CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets,
        CAST(SUM(live_rows) AS BIGINT) AS live,
        CAST(SUM(dv_dead) AS BIGINT) AS dead,
        CAST(SUM(CASE WHEN overlay THEN live_rows ELSE 0 END) AS BIGINT)
          AS overlay_rows,
        CAST(COUNT(CASE WHEN dv IS NOT NULL THEN 1 END) AS BIGINT)
          AS dvd_files
      FROM gmt.ns.f.files""").collect().head
    assert(inv.getLong(0) == 4, s"buckets: $inv")
    // 400 - 3 deleted + 10 new (398,399 replaced in place via MoR DV)
    assert(inv.getLong(1) == 407, s"live: $inv")
    // 3 DV-deleted + 2 MoR-replaced old copies
    assert(inv.getLong(2) == 5, s"dead: $inv")
    assert(inv.getLong(3) == 12, s"overlay rows: $inv")
    assert(inv.getLong(4) >= 1, s"dv'd files: $inv")
    // per-file hygiene columns exist and are sane
    val row = spark.sql("SELECT bucket, epoch, file, bytes, rows, " +
      "stats_cols, fingerprinted FROM gmt.ns.f.files LIMIT 1")
      .collect().head
    assert(row.getLong(3) > 0 && row.getInt(5) >= 1)
    // compaction drains the pressure and the inventory shows it
    spark.sql("CALL gmt.system.compact(table => 'ns.f')")
    val drained = spark.sql("SELECT CAST(SUM(dv_dead) AS BIGINT), " +
      "CAST(SUM(CASE WHEN overlay THEN 1 ELSE 0 END) AS BIGINT), " +
      "CAST(SUM(live_rows) AS BIGINT) FROM gmt.ns.f.files")
      .collect().head
    assert(drained.getLong(0) == 0 && drained.getLong(1) == 0 &&
      drained.getLong(2) == 407, s"post-compact: $drained")
    spark.sql("DROP TABLE gmt.ns.f")
  }

  test("t.partitions: per-bucket rollup points compaction at the " +
       "pressured buckets") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmt.ns")
    spark.sql("CREATE TABLE gmt.ns.p (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4', 'clusterBy'='id', " +
      "'deleteVectors'='true')")
    spark.sql("INSERT INTO gmt.ns.p SELECT id, id FROM range(0, 400)")
    spark.sql("DELETE FROM gmt.ns.p WHERE id IN (5, 105)")
    spark.sql("INSERT INTO gmt.ns.p SELECT id, -id FROM range(398, 410)")
    val roll = spark.sql("""SELECT
        CAST(COUNT(*) AS BIGINT) AS n_buckets,
        CAST(SUM(live_rows) AS BIGINT) AS live,
        CAST(SUM(dv_dead) AS BIGINT) AS dead,
        CAST(SUM(overlay_epochs) AS BIGINT) AS pressure,
        CAST(SUM(n_files) AS BIGINT) AS files,
        CAST(SUM(overlay_files) AS BIGINT) AS ofiles
      FROM gmt.ns.p.partitions""").collect().head
    assert(roll.getLong(0) == 4, s"buckets: $roll")
    assert(roll.getLong(1) == 408, s"live: $roll") // 400 - 2 + 10
    assert(roll.getLong(2) == 4, s"dead: $roll")   // 2 DV + 2 replaced
    assert(roll.getLong(3) >= 1 && roll.getLong(5) >= 1,
      s"overlay pressure must be visible: $roll")
    // the rollup NAMES the buckets partial compaction should drain
    val pressured = spark.sql("SELECT bucket FROM gmt.ns.p.partitions " +
      "WHERE overlay_epochs > 0 OR dv_dead > 0").collect()
      .map(_.getInt(0)).sorted
    assert(pressured.nonEmpty)
    spark.sql("CALL gmt.system.compact(table => 'ns.p', " +
      s"buckets => '${pressured.mkString(",")}')")
    val after = spark.sql("SELECT CAST(SUM(dv_dead) AS BIGINT), " +
      "CAST(SUM(overlay_epochs) AS BIGINT), " +
      "CAST(SUM(live_rows) AS BIGINT) FROM gmt.ns.p.partitions")
      .collect().head
    assert(after.getLong(0) == 0 && after.getLong(1) == 0 &&
      after.getLong(2) == 408, s"post-drain: $after")
    spark.sql("DROP TABLE gmt.ns.p")
  }

  test("t.changes: per-version CDC with SQL version bounds, pruned I/O") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmt.ns")
    val path = s"$wh/ns/c"
    import spark.implicits._
    val base = (0L until 4000L).map(i => (i, i, "base")).toDF("id", "v", "s")
    val prev = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "256")
    try {
      // fingerprint table, many files per bucket — the feed's file-level
      // pruning has something to prune
      MergeWriter.merge(spark, path, base, Seq("id"), buckets = 2,
        clusterBy = Seq("id"), fingerprint = true)
      // keep the whole history: the feed can only serve versions whose
      // PREDECESSOR is still retained
      MergeWriter.setRetention(spark, path, versions = 8)
      val v1 = MergeWriter.availableVersions(spark, path).last
      // sparse touch: 4 updates + 1 insert
      MergeWriter.merge(spark, path,
        Seq((100L, -1L, "upd"), (200L, -2L, "upd"), (300L, -3L, "upd"),
          (400L, -4L, "upd"), (9999L, 9L, "new")).toDF("id", "v", "s"),
        Seq("id"))
      val v2 = MergeWriter.availableVersions(spark, path).last
      MergeWriter.delete(spark, path, Seq(100L).toDF("id"), Seq("id"))
      val v3 = MergeWriter.availableVersions(spark, path).last

      // SQL: the bounded window (v2 only) in pure SQL
      val sqlRows = spark.sql(
        s"SELECT id, op, old_s, new_s, _commit_version " +
          s"FROM gmt.ns.c.changes WHERE _commit_version = $v2 " +
          "ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(sqlRows.map(_._1).toSeq ==
        Seq(100L, 200L, 300L, 400L, 9999L))
      assert(sqlRows.count(_._2 == "update") == 4 &&
        sqlRows.count(_._2 == "insert") == 1)

      // version attribution across the whole window
      val perV = spark.sql(
        "SELECT _commit_version, COUNT(*) AS n FROM gmt.ns.c.changes " +
          "GROUP BY _commit_version ORDER BY _commit_version")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(perV.toSeq == Seq((v2, 5L), (v3, 1L)))
      assert(spark.sql(s"SELECT op FROM gmt.ns.c.changes " +
        s"WHERE _commit_version = $v3").collect().head.getString(0)
        == "delete")
      // commit timestamps populated
      assert(spark.sql("SELECT COUNT(*) AS c FROM gmt.ns.c.changes " +
        "WHERE _commit_ts IS NULL").collect().head.getLong(0) == 0)

      // PRUNING PARITY: the SQL feed's core builds the same plan as the
      // DataFrame feed — identical file sets opened (fingerprint pairing
      // intact: a sparse touch reads repacked tails, not whole buckets)
      val dfFeed = MergeWriter.changeFeed(spark, path, v1, v2,
        Seq("id"), Seq("v", "s"))
      val sqlCore = graft.sources.GraftStreamCore.changesForVersions(
        spark, path, Seq("id"), Seq("v", "s"), Seq(v2))
      val dfFiles = dfFeed.inputFiles.toSet
      val sqlFiles = sqlCore.inputFiles.toSet
      assert(dfFiles == sqlFiles,
        s"SQL feed opened ${sqlFiles.size} files, DataFrame feed " +
          s"${dfFiles.size}")
      val allFiles = MergeWriter.readTable(spark, path).inputFiles.toSet
      assert(sqlFiles.size < allFiles.size,
        s"feed read the whole table (${sqlFiles.size} of " +
          s"${allFiles.size})")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.maxRecordsPerFile", v)
      case None => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
  }

  test("readStream on t.changes: the stream that carries deletes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmt.ns")
    spark.sql("CREATE TABLE gmt.ns.cdc (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2')")
    spark.sql("INSERT INTO gmt.ns.cdc SELECT id, id FROM range(10)")
    val ckpt = Files.createTempDirectory("gmt-cdc-ckpt").toString
    val q = spark.readStream.table("gmt.ns.cdc.changes")
      .writeStream.format("memory").queryName("gmt_cdc_sink")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable() // snapshot as inserts
      spark.sql("DELETE FROM gmt.ns.cdc WHERE id = 7")
      spark.sql("INSERT INTO gmt.ns.cdc VALUES (100, 1)")
      q.processAllAvailable()
      val ops = spark.sql(
        "SELECT op, COUNT(*) AS n FROM gmt_cdc_sink GROUP BY op")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(ops("insert") == 11) // 10 snapshot + 1 live
      assert(ops("delete") == 1, "the CDC stream must carry the delete")
      // the delete row names its key and its version
      val del = spark.sql("SELECT id, _commit_version FROM gmt_cdc_sink " +
        "WHERE op = 'delete'").collect().head
      assert(del.getLong(0) == 7L && del.getLong(1) > 0)
    } finally q.stop()
    spark.sql("DROP TABLE gmt.ns.cdc")
  }

  test(".changes spans schema evolution: added columns null-pad, " +
      "pre-widening windows serve exact wide values") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmt.ns")
    spark.sql("CREATE TABLE gmt.ns.ev (id BIGINT, v INT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2', 'retainVersions'='12')")
    def ver(): Long = spark.sql(
      "SELECT MAX(version) AS v FROM gmt.ns.ev.history")
      .collect().head.getLong(0)
    spark.sql("INSERT INTO gmt.ns.ev SELECT id, CAST(id AS INT) " +
      "FROM range(4)")
    // an extreme negative value: a narrow int slot reinterpreted as a
    // long would corrupt exactly this
    spark.sql("INSERT INTO gmt.ns.ev VALUES (0, -2147483648)")
    val vUpd = ver()
    spark.sql("ALTER TABLE gmt.ns.ev ADD COLUMNS (score DOUBLE)")
    spark.sql("INSERT INTO gmt.ns.ev VALUES (10, 7, 0.5)")
    // the FULL window resolves even though pre-addition versions have no
    // 'score' — those versions null-pad it
    val feed = spark.sql("SELECT _commit_version, op, id, new_score " +
      "FROM gmt.ns.ev.changes ORDER BY _commit_version, id").collect()
    assert(feed.nonEmpty)
    assert(feed.filter(_.getLong(0) <= vUpd).forall(_.isNullAt(3)),
      "pre-addition versions must serve the added column as NULL")
    assert(feed.exists(r => r.getLong(0) > vUpd && !r.isNullAt(3)))
    // widen v, then a window CONFINED to pre-widening versions: the
    // declared schema is BIGINT and the narrow stored values must be
    // cast, not reinterpreted
    spark.sql("ALTER TABLE gmt.ns.ev ALTER COLUMN v TYPE BIGINT")
    val old = spark.sql("SELECT new_v FROM gmt.ns.ev.changes " +
      s"WHERE _commit_version = $vUpd AND op = 'update'").collect()
    assert(old.nonEmpty && old.exists(r => r.getLong(0) == -2147483648L),
      s"pre-widening window must serve the exact widened value, got " +
        old.map(_.get(0)).mkString(","))
    spark.sql("DROP TABLE gmt.ns.ev")
  }

  test("t.files/t.partitions plan LOCAL below the row threshold and " +
       "DISTRIBUTED above it, with identical results") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmt.ns")
    spark.sql("CREATE TABLE gmt.ns.dist (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4', 'clusterBy'='id')")
    spark.sql("INSERT INTO gmt.ns.dist SELECT id, id FROM range(0, 200)")
    def planOf(sql: String): String =
      spark.sql(sql).queryExecution.executedPlan.toString
    def rowsOf(sql: String): Seq[String] =
      spark.sql(sql).collect().map(_.toString).sorted.toSeq
    val q = "SELECT bucket, file, rows, live_rows FROM gmt.ns.dist.files"
    val qp = "SELECT bucket, n_files, live_rows FROM gmt.ns.dist.partitions"
    // default threshold (4096): manifest-sized → driver-local scan
    assert(planOf(q).contains("LocalTableScan"),
      s"small t.files must plan as a local scan:\n${planOf(q)}")
    val localRows = rowsOf(q)
    val localParts = rowsOf(qp)
    // threshold 0: every inventory row counts as 'large' → the frame
    // parallelizes and the scan bridges the distributed plan
    spark.conf.set("spark.graft.metadata.localRows", "0")
    try {
      // fresh loadTable (the sub-table caches its frame per load)
      spark.sql("REFRESH TABLE gmt.ns.dist")
      val distPlan = planOf(q)
      assert(!distPlan.contains("LocalTableScan"),
        s"past the threshold t.files must plan distributed:\n$distPlan")
      assert(rowsOf(q) == localRows,
        "distributed t.files must serve identical rows")
      assert(rowsOf(qp) == localParts,
        "distributed t.partitions must serve identical rows")
      // the 100 TB shape: a join against another frame stays off the
      // driver (no LocalTableScan feeding the join)
      val joined = spark.sql(
        s"""SELECT f.bucket, COUNT(*) AS n FROM gmt.ns.dist.files f
           |JOIN gmt.ns.dist.partitions p ON f.bucket = p.bucket
           |GROUP BY f.bucket""".stripMargin)
      assert(joined.collect().length == 4)
    } finally spark.conf.unset("spark.graft.metadata.localRows")
  }
}
