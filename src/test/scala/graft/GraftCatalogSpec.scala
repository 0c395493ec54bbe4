package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** The manifest protocol as a SQL catalog (GraftCatalog): CREATE TABLE /
  * INSERT INTO (keyed upsert) / INSERT OVERWRITE / SELECT (DSv2 parquet
  * scan with manifest file skipping) / DELETE FROM / DROP TABLE, all as
  * pure SQL with no temp-view plumbing.
  */
class GraftCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val wh = Files.createTempDirectory("gcat-wh").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gcat",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.gcat.warehouse", wh)
      .getOrCreate()
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** Distinct data files the executed DSv2 scan actually planned —
    * files the manifest-driven index handed to ParquetScan AFTER
    * skipping.
    */
  private def plannedFiles(df: DataFrame): Int = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a BatchScanExec in the plan")
    scans.head.inputPartitions.flatMap {
      case fp: FilePartition => fp.files.map(_.urlEncodedPath)
      case _ => Seq.empty
    }.distinct.size
  }

  test("SQL DDL + DML lifecycle: create, upsert-insert, delete, drop") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.t")
    spark.sql(
      """CREATE TABLE gcat.ns.t (id BIGINT, grp STRING, v DOUBLE)
        |TBLPROPERTIES ('keys'='id', 'buckets'='4', 'clusterBy'='id')
        |""".stripMargin)
    assert(spark.sql("SHOW TABLES IN gcat.ns").collect()
      .map(_.getString(1)).contains("t"))
    // SHOW CREATE TABLE round-trips the declared layout (and the
    // NOT NULL key surfaces)
    val ddl = spark.sql("SHOW CREATE TABLE gcat.ns.t")
      .collect().head.getString(0)
    assert(ddl.contains("id BIGINT NOT NULL") && ddl.contains("USING graft")
      && ddl.contains("'keys' = 'id'") && ddl.contains("'buckets' = '4'"))
    // empty table reads as zero rows of the declared schema
    assert(spark.sql("SELECT * FROM gcat.ns.t").count() == 0)

    spark.sql(
      "INSERT INTO gcat.ns.t SELECT id, CASE WHEN id % 2 = 0 THEN 'even' " +
        "ELSE 'odd' END, CAST(id AS DOUBLE) FROM range(1, 101)")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.t")
      .collect().head.getLong(0) == 100)

    // INSERT INTO is the table's write semantics: keyed MERGE upsert —
    // overlapping ids replace, new ids append
    spark.sql(
      "INSERT INTO gcat.ns.t SELECT id, 'upd', -1.0 FROM range(90, 111)")
    val after = spark.sql(
      "SELECT COUNT(*) AS c, SUM(CASE WHEN grp = 'upd' THEN 1 ELSE 0 END) " +
        "AS u FROM gcat.ns.t").collect().head
    assert(after.getLong(0) == 110 && after.getLong(1) == 21)

    // DELETE FROM → SupportsDeleteV2 → MergeWriter.delete
    spark.sql("DELETE FROM gcat.ns.t WHERE grp = 'upd' AND id >= 100")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.t")
      .collect().head.getLong(0) == 99)
    spark.sql("DELETE FROM gcat.ns.t WHERE id IN (1, 2, 3)")
    assert(spark.sql("SELECT MIN(id) AS m FROM gcat.ns.t")
      .collect().head.getLong(0) == 4)

    // INSERT OVERWRITE = atomic full replace
    spark.sql(
      "INSERT OVERWRITE gcat.ns.t SELECT id, 'fresh', 0.0 FROM range(5)")
    val fresh = spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.t " +
      "WHERE grp = 'fresh'").collect().head.getLong(0)
    assert(fresh == 5)

    spark.sql("DROP TABLE gcat.ns.t")
    assert(!spark.sql("SHOW TABLES IN gcat.ns").collect()
      .map(_.getString(1)).contains("t"))
  }

  test("catalog SELECT prunes files through the manifest stats") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.skip")
    spark.sql("DROP TABLE IF EXISTS gcat.skip.m")
    val dir = spark.conf.get("spark.sql.catalog.gcat.warehouse") + "/skip/m"
    val prev = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "500")
    try {
      MergeWriter.merge(spark,
        dir, (1 to 20000).map(i => (i.toLong, i % 97)).toDF("id", "x"),
        Seq("id"), buckets = 4, clusterBy = Seq("id"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.maxRecordsPerFile", v)
      case None => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
    val all = spark.sql("SELECT * FROM gcat.skip.m")
    val ranged = spark.sql(
      "SELECT COUNT(*) AS c, SUM(x) AS s FROM gcat.skip.m " +
        "WHERE id BETWEEN 4000 AND 4999")
    val total = plannedFiles(all)
    val pruned = plannedFiles(ranged)
    assert(total >= 20, s"expected a many-file table, got $total")
    assert(pruned <= total / 4,
      s"range read planned $pruned of $total files — no skipping?")
    // and the pruned read is exact
    val r = ranged.collect().head
    assert(r.getLong(0) == 1000 &&
      r.getLong(1) == (4000 to 4999).map(_ % 97).sum)
    spark.sql("DROP TABLE gcat.skip.m")
  }

  test("CALL gcat.system.* drives the maintenance verbs from SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ops")
    spark.sql("DROP TABLE IF EXISTS gcat.ops.m")
    spark.sql("CREATE TABLE gcat.ops.m (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2')")
    val path = spark.conf.get("spark.sql.catalog.gcat.warehouse") + "/ops/m"
    // a broad insert then a single-key insert: the second touches ONE
    // bucket, so the other keeps the older epoch → 2 live epochs
    spark.sql("INSERT INTO gcat.ops.m SELECT id, 1.0 FROM range(400)")
    spark.sql("INSERT INTO gcat.ops.m VALUES (0, 2.0)")
    def liveEpochs(): Int = MergeWriter.describeTable(spark, path)
      .collect().head.getAs[Int]("live_epochs")
    assert(liveEpochs() > 1, "test setup: want multiple live epochs")
    val st = spark.sql("CALL gcat.system.compact(table => 'ops.m')")
      .collect().head.getString(0)
    assert(st.startsWith("compacted"))
    assert(liveEpochs() == 1)
    // clustering retrofit + retention + split, all as CALLs
    spark.sql("CALL gcat.system.cluster(table => 'ops.m', " +
      "cluster_by => 'id')")
    assert(MergeWriter.describeTable(spark, path).collect().head
      .getAs[String]("cluster_cols") == "id")
    spark.sql("CALL gcat.system.set_retention(table => 'ops.m', " +
      "versions => 4)")
    spark.sql("CALL gcat.system.split_buckets(table => 'ops.m')")
    assert(MergeWriter.describeTable(spark, path).collect().head
      .getAs[Int]("buckets") == 4)
    spark.sql("CALL gcat.system.vacuum(table => 'ops.m')")
    // table-returning procedures: history (one row per retained commit,
    // newest knows the verbs above) and describe (physical state)
    val hist = spark.sql("CALL gcat.system.history(table => 'ops.m')")
      .collect()
    assert(hist.length > 1)
    assert(hist.exists(r => Option(r.getAs[String]("op"))
      .exists(_.startsWith("split"))))
    val desc = spark.sql("CALL gcat.system.describe(table => 'ops.m')")
      .collect().head
    assert(desc.getAs[Int]("buckets") == 4)
    // content survives every verb
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ops.m")
      .collect().head.getLong(0) == 400)
    // unknown procedure fails loudly with the catalog's inventory
    val e = intercept[Exception] {
      spark.sql("CALL gcat.system.nope(table => 'ops.m')")
    }
    assert(e.getMessage.contains("unknown procedure") ||
      e.getMessage.contains("nope"))
    spark.sql("DROP TABLE gcat.ops.m")
  }

  test("CREATE TABLE AS SELECT creates and loads in one statement") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.ctas")
    spark.sql("CREATE TABLE gcat.ns.ctas TBLPROPERTIES ('keys'='id') " +
      "AS SELECT id, id * 2 AS v FROM range(10)")
    assert(spark.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM gcat.ns.ctas")
      .collect().head.getLong(0) == 90)
    // CTAS result is a real keyed table: INSERT upserts by key
    spark.sql("INSERT INTO gcat.ns.ctas VALUES (0, 100)")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.ctas")
      .collect().head.getLong(0) == 10)
    assert(spark.sql("SELECT v FROM gcat.ns.ctas WHERE id = 0")
      .collect().head.getLong(0) == 100)
    spark.sql("DROP TABLE gcat.ns.ctas")
  }

  test("RTAS + failed CTAS: all-or-nothing staging") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.stg")
    // a CTAS whose query FAILS must leave no table behind
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.ns.stg TBLPROPERTIES ('keys'='id') " +
        "AS SELECT id, raise_error('boom') AS v FROM range(3)")
    }
    assert(spark.sql("SHOW TABLES IN gcat.ns").collect()
      .forall(_.getString(1) != "stg"), "failed CTAS left a table")
    // REPLACE TABLE AS SELECT: new definition lands atomically, prior
    // version stays readable via time travel
    spark.sql("CREATE TABLE gcat.ns.stg TBLPROPERTIES ('keys'='id') " +
      "AS SELECT id, id AS v FROM range(10)")
    val path = spark.conf.get("spark.sql.catalog.gcat.warehouse") + "/ns/stg"
    val v1 = MergeWriter.describeTable(spark, path).collect().head
      .getAs[Long]("version")
    spark.sql("REPLACE TABLE gcat.ns.stg TBLPROPERTIES ('keys'='id') " +
      "AS SELECT id, id * 100 AS v FROM range(4)")
    assert(spark.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM gcat.ns.stg")
      .collect().head.getLong(0) == 600)
    assert(spark.sql(
      s"SELECT COUNT(*) AS c FROM gcat.ns.stg VERSION AS OF $v1")
      .collect().head.getLong(0) == 10)
    // REPLACE redefines the PHYSICAL layout too: declared buckets and
    // clustering take effect (not the prior table's)
    spark.sql("REPLACE TABLE gcat.ns.stg " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='8', 'clusterBy'='v') " +
      "AS SELECT id, id * 3 AS v FROM range(64)")
    val d2 = MergeWriter.describeTable(spark, path).collect().head
    assert(d2.getAs[Int]("buckets") == 8, "RTAS must apply declared buckets")
    assert(d2.getAs[String]("cluster_cols") == "v",
      "RTAS must apply declared clustering")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.stg")
      .collect().head.getLong(0) == 64)
    // CREATE OR REPLACE on a fresh name creates
    spark.sql("DROP TABLE IF EXISTS gcat.ns.stg2")
    spark.sql("CREATE OR REPLACE TABLE gcat.ns.stg2 " +
      "TBLPROPERTIES ('keys'='id') AS SELECT id FROM range(5)")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.stg2")
      .collect().head.getLong(0) == 5)
    spark.sql("DROP TABLE gcat.ns.stg")
    spark.sql("DROP TABLE gcat.ns.stg2")
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only additive evolution") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.ev")
    spark.sql("CREATE TABLE gcat.ns.ev (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gcat.ns.ev SELECT id, id FROM range(5)")
    val path = spark.conf.get("spark.sql.catalog.gcat.warehouse") + "/ns/ev"
    val nFilesBefore = MergeWriter.describeTable(spark, path)
      .collect().head.getAs[Int]("n_files")
    spark.sql("ALTER TABLE gcat.ns.ev ADD COLUMNS (score DOUBLE, tag STRING)")
    // no data file was touched — pure manifest commit
    assert(MergeWriter.describeTable(spark, path).collect().head
      .getAs[Int]("n_files") == nFilesBefore)
    // old rows null-fill; new writes carry the columns
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.ev " +
      "WHERE score IS NULL AND tag IS NULL").collect().head.getLong(0) == 5)
    spark.sql("INSERT INTO gcat.ns.ev VALUES (9, 9, 0.5, 'x')")
    val r = spark.sql(
      "SELECT v, score, tag FROM gcat.ns.ev WHERE id = 9").collect().head
    assert(r.getLong(0) == 9 && r.getDouble(1) == 0.5 &&
      r.getString(2) == "x")
    // duplicate / reordering alters fail loudly
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.ns.ev ADD COLUMNS (score DOUBLE)")
    }
    spark.sql("DROP TABLE gcat.ns.ev")
  }

  test("catalog scalar functions: zorder2, fingerprint64, cosine_sim") {
    import graft.functions.{TextHash, ZOrder}
    // magic-invoke path (codegen'd) must equal the library kernels
    val r = spark.sql(
      """SELECT gcat.system.zorder2_hi(5, 9) AS zh,
        |  gcat.system.zorder2_lo(5, 9) AS zl,
        |  gcat.system.fingerprint64('abc', 1000000007) AS fp,
        |  gcat.system.cosine_sim(array(1.0D, 0.0D), array(1.0D, 1.0D)) AS c
        |""".stripMargin).collect().head
    assert(r.getLong(0) == ZOrder.interleave2High(5L, 9L))
    assert(r.getLong(1) == ZOrder.interleave2Low(5L, 9L))
    assert(r.getLong(2) == TextHash.poly("abc", 1000000007L))
    assert(math.abs(r.getDouble(3) - 1.0 / math.sqrt(2)) < 1e-12)
    // implicit casts: INT literals and float arrays coerce to the
    // declared BIGINT / array<double> input types
    val c2 = spark.sql(
      "SELECT gcat.system.cosine_sim(array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS c").collect().head
    assert(math.abs(c2.getDouble(0) - 1.0) < 1e-6)
    // zero-norm guard
    assert(spark.sql(
      "SELECT gcat.system.cosine_sim(array(0.0D), array(1.0D)) AS c")
      .collect().head.getDouble(0) == 0.0)
    // NULL in → NULL out, like every builtin (non-foldable null via a
    // column so the distributed eval path runs, not constant folding)
    spark.range(1).selectExpr("CAST(NULL AS STRING) AS s", "id")
      .createOrReplaceTempView("fn_null_probe")
    val nr = spark.sql(
      """SELECT gcat.system.fingerprint64(s, 7) AS f,
        |  gcat.system.zorder2_hi(id, CAST(NULL AS BIGINT)) AS z,
        |  gcat.system.cosine_sim(CAST(NULL AS ARRAY<DOUBLE>),
        |    array(1.0D)) AS c,
        |  gcat.system.cosine_sim(array(1.0D, CAST(NULL AS DOUBLE)),
        |    array(1.0D, 1.0D)) AS ce
        |FROM fn_null_probe""".stripMargin).collect().head
    assert(nr.isNullAt(0) && nr.isNullAt(1) && nr.isNullAt(2) &&
      nr.isNullAt(3)) // a null ELEMENT propagates too (never reads 0.0)
    // SHOW FUNCTIONS surfaces the inventory; unknown names fail loudly
    val listed = spark.sql("SHOW FUNCTIONS IN gcat.system")
      .collect().map(_.getString(0))
    assert(listed.exists(_.endsWith("fingerprint64")))
    intercept[Exception] { spark.sql("SELECT gcat.system.nope(1)") }
  }

  test("a NULL merge key fails the write before anything commits") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.nk")
    spark.sql("CREATE TABLE gcat.ns.nk (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gcat.ns.nk SELECT id, id FROM range(4)")
    // the catalog schema claims id NOT NULL; the WRITE enforces it, so
    // Catalyst's null-propagation over that claim can never be wrong
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcat.ns.nk " +
        "SELECT CASE WHEN id = 2 THEN NULL ELSE id + 100 END, id " +
        "FROM range(4)")
    }
    assert(e.getMessage != null)
    // nothing from the failed statement is visible
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.nk")
      .collect().head.getLong(0) == 4)
    spark.sql("DROP TABLE gcat.ns.nk")
  }

  test("SQL TRUNCATE TABLE and ALTER retention") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.r")
    spark.sql("CREATE TABLE gcat.ns.r (id BIGINT, v INT) " +
      "TBLPROPERTIES ('keys'='id')")
    val path = spark.conf.get("spark.sql.catalog.gcat.warehouse") + "/ns/r"
    // ALTER maps to the metadata-only retention commit
    spark.sql("ALTER TABLE gcat.ns.r SET TBLPROPERTIES " +
      "('retainVersions'='5')")
    (1 to 5).foreach(i => spark.sql(
      s"INSERT INTO gcat.ns.r SELECT id, $i FROM range(${i * 10})"))
    assert(MergeWriter.availableVersions(spark, path).size == 5)
    // any OTHER alteration keeps failing loudly
    intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE gcat.ns.r SET TBLPROPERTIES ('keys'='v')")
    }
    // TRUNCATE = delete-all through the keyed delete; schema survives
    spark.sql("TRUNCATE TABLE gcat.ns.r")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.r")
      .collect().head.getLong(0) == 0)
    spark.sql("INSERT INTO gcat.ns.r SELECT id, 9 FROM range(3)")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.r")
      .collect().head.getLong(0) == 3)
    spark.sql("DROP TABLE gcat.ns.r")
  }

  test("catalog COUNT(*) pushes the aggregate down to parquet footers") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.agg")
    spark.sql("CREATE TABLE gcat.ns.agg (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gcat.ns.agg SELECT id, id * 0.5 FROM range(5000)")
    // the DSv2 parquet scan serves COUNT(*) from footer row counts —
    // no data pages decoded (ParquetScanBuilder's
    // SupportsPushDownAggregates, gated on the session conf; the
    // path-based statsAggregate equivalent, reached from plain SQL)
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val q = spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.agg")
      assert(q.queryExecution.executedPlan.toString
        .contains("PushedAggregation: [COUNT(*)]"),
        s"COUNT(*) not pushed:\n${q.queryExecution.executedPlan}")
      assert(q.collect().head.getLong(0) == 5000)
    } finally spark.conf.unset("spark.sql.parquet.aggregatePushdown")
    spark.sql("DROP TABLE gcat.ns.agg")
  }

  test("SQL time travel: VERSION AS OF reads a retained pin, rejects writes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.tt")
    spark.sql("CREATE TABLE gcat.ns.tt (id BIGINT, v INT) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gcat.ns.tt SELECT id, 1 FROM range(10)")
    val path = spark.conf.get("spark.sql.catalog.gcat.warehouse") + "/ns/tt"
    val v1 = MergeWriter.availableVersions(spark, path).last
    spark.sql("INSERT INTO gcat.ns.tt SELECT id, 2 FROM range(10, 30)")
    // current sees both loads; the pin sees only the first
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.tt")
      .collect().head.getLong(0) == 30)
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM gcat.ns.tt VERSION AS OF $v1")
      .collect().head.getLong(0) == 10)
    // history is immutable: writes to a pin fail loudly
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO gcat.ns.tt VERSION AS OF $v1 VALUES (99, 9)")
    }
    assert(e.getMessage != null)
    spark.sql("DROP TABLE gcat.ns.tt")
  }

  test("DELETE with an untranslatable predicate takes the row-level path") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.guard")
    spark.sql("CREATE TABLE gcat.ns.guard (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gcat.ns.guard SELECT id, 'a' FROM range(10)")
    // a predicate the metadata delete can't translate (so pre-row-level
    // this errored): falls through to the delta-based row-level DELETE,
    // which evaluates it over the scan. 'aaa'.length=3 > id ⇔ id ∈ 0..2.
    spark.sql("DELETE FROM gcat.ns.guard WHERE length(repeat(s, 3)) > id")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.guard")
      .collect().head.getLong(0) == 7)
    assert(spark.sql("SELECT MIN(id) AS m FROM gcat.ns.guard")
      .collect().head.getLong(0) == 3)
    spark.sql("DROP TABLE gcat.ns.guard")
  }

  test("LOCATION-pinned table: every statement resolves it; DROP reclaims") {
    val loc = Files.createTempDirectory("gcat-loc").toString + "/pinned"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql(s"CREATE TABLE gcat.ns.pinned (id BIGINT, v DOUBLE) " +
      s"TBLPROPERTIES ('keys'='id', 'buckets'='2') LOCATION '$loc'")
    // the data lives at the declared path, not under the warehouse
    assert(MergeWriter.describeTable(spark, loc).collect()
      .head.getAs[Long]("version") == 1L)
    // ... and every later statement resolves the pointer
    spark.sql("INSERT INTO gcat.ns.pinned " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(10)")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.pinned")
      .collect().head.getLong(0) == 10)
    spark.sql("UPDATE gcat.ns.pinned SET v = -1.0 WHERE id = 3")
    assert(spark.sql("SELECT v FROM gcat.ns.pinned WHERE id = 3")
      .collect().head.getDouble(0) == -1.0)
    assert(spark.sql("SHOW TABLES IN gcat.ns").collect()
      .map(_.getString(1)).contains("pinned"))
    // the pointer entry is a table, not a namespace
    assert(!spark.sql("SHOW NAMESPACES IN gcat.ns").collect()
      .map(_.getString(0)).contains("pinned"))
    // maintenance procedures resolve the pointer too
    spark.sql("CALL gcat.system.compact('ns.pinned')")
    // a conflicting LOCATION on REPLACE fails loudly (data never moves)
    val other = Files.createTempDirectory("gcat-loc2").toString
    val e = intercept[Exception] {
      spark.sql(s"REPLACE TABLE gcat.ns.pinned TBLPROPERTIES " +
        s"('keys'='id') LOCATION '$other/elsewhere' AS SELECT 1L AS id")
    }
    assert(e.getMessage.contains("cannot relocate"))
    // DROP reclaims the pointed data AND the entry
    spark.sql("DROP TABLE gcat.ns.pinned")
    assert(!new java.io.File(loc).exists(), "pointed data reclaimed")
    assert(!spark.sql("SHOW TABLES IN gcat.ns").collect()
      .map(_.getString(1)).contains("pinned"))
  }

  test("CALL gcat.system.restore: metadata-only rollback to a retained version") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("CREATE TABLE gcat.ns.rst (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2', 'retainVersions'='8')")
    spark.sql("INSERT INTO gcat.ns.rst SELECT id, id FROM range(10)")
    val vGood = spark.sql("SELECT MAX(version) AS v FROM gcat.ns.rst.history")
      .collect().head.getLong(0)
    spark.sql("INSERT INTO gcat.ns.rst VALUES (100, -1)") // the bad commit
    spark.sql("UPDATE gcat.ns.rst SET v = 0 WHERE id = 3")
    val filesAtGood = spark.sql(
      s"SELECT * FROM gcat.ns.rst VERSION AS OF $vGood").inputFiles.toSet
    spark.sql(s"CALL gcat.system.restore('ns.rst', $vGood)")
    // the restored state IS version vGood's — served by the SAME files
    // (nothing copied or rewritten: metadata-only)
    val cur = spark.table("gcat.ns.rst")
    assert(cur.count() == 10 && cur.inputFiles.toSet == filesAtGood)
    assert(spark.sql("SELECT v FROM gcat.ns.rst WHERE id = 3")
      .collect().head.getLong(0) == 3L)
    // history rolled FORWARD: the restore is itself a commit...
    val hist = spark.sql("SELECT version, op FROM gcat.ns.rst.history " +
      "ORDER BY version DESC").collect()
    assert(hist.head.getString(1) == "restore")
    assert(hist.head.getLong(0) > vGood + 2)
    // ...so the change feed sees the rollback as ordinary keyed changes
    val feed = spark.sql("SELECT op, id FROM gcat.ns.rst.changes " +
      s"WHERE _commit_version = ${hist.head.getLong(0)}").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed.contains(("delete", 100L)), s"rollback must retract the " +
      s"bad insert, got ${feed.mkString(",")}")
    assert(feed.contains(("update", 3L)))
    // a non-retained target fails loudly
    val e = intercept[Exception] {
      spark.sql("CALL gcat.system.restore('ns.rst', 9999)")
    }
    assert(e.getMessage.contains("not retained"))
    spark.sql("DROP TABLE gcat.ns.rst")
  }

  test("LOCATION at a foreign committed table is refused; no alias leaks") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    val loc = Files.createTempDirectory("gcat-loc3").toString + "/owned"
    spark.sql(s"CREATE TABLE gcat.ns.owner (id BIGINT) " +
      s"TBLPROPERTIES ('keys'='id', 'buckets'='2') LOCATION '$loc'")
    spark.sql("INSERT INTO gcat.ns.owner SELECT id FROM range(5)")
    // a second ident at the same LOCATION would ALIAS the owner's data —
    // and a later DROP through the alias would delete it. Refused before
    // the pointer ever lands (plain CREATE and staged CTAS both).
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE gcat.ns.thief (id BIGINT) " +
        s"TBLPROPERTIES ('keys'='id') LOCATION '$loc'")
    }
    assert(e.getMessage.contains("already holds a committed"))
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE gcat.ns.thief TBLPROPERTIES ('keys'='id') " +
        s"LOCATION '$loc' AS SELECT 99L AS id")
    }
    assert(e2.getMessage.contains("already holds a committed"))
    // no alias survives the failed statements
    assert(!spark.sql("SHOW TABLES IN gcat.ns").collect()
      .map(_.getString(1)).contains("thief"))
    intercept[Exception] { spark.sql("DROP TABLE gcat.ns.thief") }
    // the owner's table and data are untouched
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.owner")
      .collect().head.getLong(0) == 5)
    spark.sql("DROP TABLE gcat.ns.owner")
  }

  test("TBLPROPERTIES fingerprint=true seeds file-level change feeds") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.fp")
    spark.sql("CREATE TABLE gcat.ns.fp (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2', 'clusterBy'='id', " +
      "'fingerprint'='true', 'retainVersions'='6')")
    spark.sql("INSERT INTO gcat.ns.fp SELECT id, id FROM range(10)")
    // the recorded manifest carries the fingerprint policy...
    val wh = spark.conf.get("spark.sql.catalog.gcat.warehouse")
    val dir = new java.io.File(s"$wh/ns/fp")
    val manifest = dir.listFiles().filter(_.getName.startsWith("_manifest-"))
      .maxBy(_.getName)
    val body = new String(
      java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8")
    assert(body.contains("\"fpr\":true"),
      "fingerprint TBLPROPERTY must reach the manifest")
    // ... and the SQL change feed over it works end-to-end
    spark.sql("INSERT INTO gcat.ns.fp VALUES (100, 100)")
    val ch = spark.sql("SELECT id, op FROM gcat.ns.fp.changes " +
      "WHERE _commit_version = 3").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(ch.toSeq == Seq((100L, "insert")))
    spark.sql("DROP TABLE gcat.ns.fp")
  }

  test("a non-deterministic INSERT source is evaluated exactly once") {
    GraftCatalogSpec.evals.set(0)
    val bump = org.apache.spark.sql.functions.udf((x: Long) => {
      GraftCatalogSpec.evals.incrementAndGet(); x
    }).asNondeterministic()
    spark.udf.register("gcat_bump", bump)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.nd")
    spark.sql("CREATE TABLE gcat.ns.nd (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2')")
    // without the persist pin, the duplicate-key guard pass and the
    // written pass would evaluate the source twice — and could DISAGREE
    spark.sql("INSERT INTO gcat.ns.nd " +
      "SELECT id, gcat_bump(id) FROM range(100)")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gcat.ns.nd")
      .collect().head.getLong(0) == 100)
    assert(GraftCatalogSpec.evals.get() == 100,
      s"non-deterministic source ran ${GraftCatalogSpec.evals.get()} " +
        "evaluations — must be pinned to exactly one pass of 100 rows")
    spark.sql("DROP TABLE gcat.ns.nd")
  }

  test("NOT NULL keys are evidence-gated: legacy manifests stay nullable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    spark.sql("DROP TABLE IF EXISTS gcat.ns.legacy")
    spark.sql("CREATE TABLE gcat.ns.legacy (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2')")
    // a NULLABLE source frame, so the recorded data schema keeps
    // nullable columns and the NOT NULL key surface comes only from
    // the sqlSchema certificate gate under test
    spark.sql("INSERT INTO gcat.ns.legacy " +
      "SELECT IF(id >= 0, id, NULL) AS id, IF(id >= 0, id, NULL) AS v " +
      "FROM range(10)")
    def keyNullable: Boolean =
      spark.table("gcat.ns.legacy").schema("id").nullable
    assert(!keyNullable, "enforced table surfaces NOT NULL keys")
    // simulate a pre-enforcement manifest: strip the certificate from
    // the current manifest file
    val wh = spark.conf.get("spark.sql.catalog.gcat.warehouse")
    val dir = new java.io.File(s"$wh/ns/legacy")
    val manifest = dir.listFiles().filter(_.getName.startsWith("_manifest-"))
      .maxBy(_.getName)
    val body = new String(
      java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8")
    assert(body.contains("\"kchk\":true"))
    // strip the certificate AND relax the recorded schema's nullability
    // (a genuine pre-enforcement writer recorded nullable columns; the
    // current INSERT path casts to the table's NOT NULL surface, so the
    // committed schema must be un-done too to reproduce the legacy shape)
    java.nio.file.Files.write(manifest.toPath,
      body.replace(",\"kchk\":true", "")
        .replace("\\\"nullable\\\":false", "\\\"nullable\\\":true")
        .getBytes("UTF-8"))
    assert(keyNullable,
      "a manifest with no NULL-key certificate must surface nullable keys")
    // a full rewrite re-certifies (every live epoch passes the check)
    spark.sql("INSERT OVERWRITE gcat.ns.legacy " +
      "SELECT IF(id >= 0, id, NULL) AS id, IF(id >= 0, id, NULL) AS v " +
      "FROM range(10)")
    assert(!keyNullable, "full rewrite re-certifies NOT NULL")
    spark.sql("DROP TABLE gcat.ns.legacy")
  }
}

object GraftCatalogSpec {
  /** Evaluation counter for the non-deterministic-source test (static:
    * executors share the JVM in local mode).
    */
  val evals = new java.util.concurrent.atomic.AtomicInteger(0)
}
