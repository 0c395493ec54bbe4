package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** ANSI CHECK constraints on the graft catalog (Spark 4.1's DSv2
  * constraint surface + storage-level enforcement): add-time validation
  * of existing rows, single-pass write-side enforcement on every path
  * (SQL INSERT, API merge, merge-on-read overlays, branch staging),
  * ANSI NULL-passes semantics, and schema-evolution guards for
  * constrained columns. Reference analogue: the notification
  * subscriptions table's CHECKed enum columns
  * (`full_ddl.sql:1522-1523`).
  */
class ConstraintSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val wh = Files.createTempDirectory("ck-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.ck",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.ck.warehouse", wh)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  private def tablePath(name: String): String =
    spark.sql(s"DESCRIBE TABLE EXTENDED ck.ns.$name")
      .filter("col_name = 'Location'").collect()(0).getString(1)
      .stripPrefix("file:")

  private def violates(body: => Unit): String = {
    val e = intercept[Exception](body)
    val msg = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).filter(_ != null)
      .find(m => m.toLowerCase.contains("check") ||
        m.toLowerCase.contains("constraint"))
    assert(msg.isDefined,
      s"expected a CHECK-constraint violation, got: ${e.getMessage}")
    msg.get
  }

  test("ALTER TABLE ADD CONSTRAINT enforces on SQL INSERT; NULL passes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ck.ns")
    spark.sql(
      """CREATE TABLE ck.ns.t (id BIGINT, v DOUBLE, grp STRING)
        |TBLPROPERTIES ('keys'='id', 'buckets'='4')""".stripMargin)
    spark.sql("INSERT INTO ck.ns.t VALUES (1, 2.0, 'a'), (2, -9.0, 'b')")
    // add-time validation: existing rows violate -> rejected
    val bad = intercept[Exception](spark.sql(
      "ALTER TABLE ck.ns.t ADD CONSTRAINT v_pos CHECK (v > 0)"))
    assert(bad.getMessage.contains("violate") ||
      Option(bad.getCause).exists(_.getMessage.contains("violate")))
    spark.sql("DELETE FROM ck.ns.t WHERE v < 0")
    spark.sql("ALTER TABLE ck.ns.t ADD CONSTRAINT v_pos CHECK (v > 0)")
    // violating INSERT fails the whole statement...
    violates(spark.sql("INSERT INTO ck.ns.t VALUES (3, -1.0, 'c')"))
    // ...and left nothing behind (commit is atomic)
    assert(spark.sql("SELECT count(*) FROM ck.ns.t WHERE id = 3")
      .collect()(0).getLong(0) == 0L)
    // valid rows and ANSI NULL-passes rows land
    spark.sql("INSERT INTO ck.ns.t VALUES (4, 5.5, 'd'), (5, NULL, 'e')")
    assert(spark.sql("SELECT count(*) FROM ck.ns.t").collect()(0)
      .getLong(0) == 3L)
  }

  test("storage-level enforcement: the API merge path is guarded too") {
    import spark.implicits._
    val p = tablePath("t")
    violates(MergeWriter.merge(spark,
      p, Seq((9L, -3.0, "x")).toDF("id", "v", "grp"), Seq("id")))
    // the failed merge left no partial state
    assert(spark.sql("SELECT count(*) FROM ck.ns.t WHERE id = 9")
      .collect()(0).getLong(0) == 0L)
    MergeWriter.merge(spark, p,
      Seq((9L, 3.0, "x")).toDF("id", "v", "grp"), Seq("id"))
    assert(spark.sql("SELECT v FROM ck.ns.t WHERE id = 9")
      .collect()(0).getDouble(0) == 3.0)
  }

  test("UPDATE and MERGE enforce; DROP CONSTRAINT lifts the guard") {
    violates(spark.sql("UPDATE ck.ns.t SET v = -v WHERE id = 4"))
    violates(spark.sql(
      """MERGE INTO ck.ns.t USING (SELECT 4 AS id, -7.0 AS nv) s
        |ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.nv"""
        .stripMargin.replace("t.id", "ck.ns.t.id")))
    spark.sql("ALTER TABLE ck.ns.t DROP CONSTRAINT v_pos")
    spark.sql("UPDATE ck.ns.t SET v = -1.0 WHERE id = 4")
    assert(spark.sql("SELECT v FROM ck.ns.t WHERE id = 4")
      .collect()(0).getDouble(0) == -1.0)
    // IF EXISTS on an absent name is a no-op; plain drop errors
    spark.sql("ALTER TABLE ck.ns.t DROP CONSTRAINT IF EXISTS nope")
    intercept[Exception](
      spark.sql("ALTER TABLE ck.ns.t DROP CONSTRAINT nope"))
  }

  test("CREATE TABLE with inline CHECK + PRIMARY KEY declaring the keys") {
    spark.sql(
      """CREATE TABLE ck.ns.c (
        |  id BIGINT, qty INT, state STRING,
        |  CONSTRAINT pk PRIMARY KEY (id),
        |  CONSTRAINT qty_nonneg CHECK (qty >= 0),
        |  CONSTRAINT state_enum CHECK (state IN ('open', 'closed'))
        |) TBLPROPERTIES ('buckets'='4')""".stripMargin)
    // PRIMARY KEY became the merge keys: INSERT is a keyed upsert
    spark.sql("INSERT INTO ck.ns.c VALUES (1, 5, 'open')")
    spark.sql("INSERT INTO ck.ns.c VALUES (1, 6, 'closed')")
    val row = spark.sql("SELECT qty, state FROM ck.ns.c WHERE id = 1")
      .collect()
    assert(row.length == 1 && row(0).getInt(0) == 6)
    violates(spark.sql("INSERT INTO ck.ns.c VALUES (2, -1, 'open')"))
    violates(spark.sql("INSERT INTO ck.ns.c VALUES (2, 1, 'OPEN')"))
    assert(spark.sql("SELECT count(*) FROM ck.ns.c").collect()(0)
      .getLong(0) == 1L)
  }

  test("constrained column rejects DROP/RENAME; others still evolve") {
    intercept[Exception](
      spark.sql("ALTER TABLE ck.ns.c DROP COLUMN qty"))
    intercept[Exception](
      spark.sql("ALTER TABLE ck.ns.c RENAME COLUMN qty TO amount"))
    spark.sql("ALTER TABLE ck.ns.c ADD COLUMNS (note STRING)")
    spark.sql("ALTER TABLE ck.ns.c RENAME COLUMN note TO remark")
  }

  test("merge-on-read overlays and branch staging enforce the same") {
    spark.sql(
      """CREATE TABLE ck.ns.m (id BIGINT, v DOUBLE,
        |  CONSTRAINT v_pos CHECK (v > 0))
        |TBLPROPERTIES ('keys'='id', 'buckets'='4',
        |  'deleteVectors'='true')""".stripMargin)
    spark.sql("INSERT INTO ck.ns.m SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(1, 200)")
    // a small UPDATE on a deleteVectors table takes the MoR overlay
    // path — the overlay write must hit the same guard
    violates(spark.sql("UPDATE ck.ns.m SET v = -5.0 WHERE id = 7"))
    spark.sql("UPDATE ck.ns.m SET v = 500.0 WHERE id = 7")
    assert(spark.sql("SELECT v FROM ck.ns.m WHERE id = 7")
      .collect()(0).getDouble(0) == 500.0)
    // branch staging: the staged write enforces before anything lands
    spark.sql("CALL ck.system.create_branch('ns.m', 'audit')")
    violates(spark.sql(
      "INSERT INTO ck.ns.m.branch_audit VALUES (999, -1.0)"))
    spark.sql("INSERT INTO ck.ns.m.branch_audit VALUES (999, 1.0)")
    spark.sql("CALL ck.system.fast_forward('ns.m', 'audit')")
    assert(spark.sql("SELECT v FROM ck.ns.m WHERE id = 999")
      .collect()(0).getDouble(0) == 1.0)
  }

  test("a QUALIFIED CHECK predicate (t.col) is accepted, stored " +
       "unqualified, and enforced; unknown references still fail") {
    spark.sql(
      """CREATE TABLE ck.ns.q (id BIGINT, price DOUBLE)
        |TBLPROPERTIES ('keys'='id', 'buckets'='2')""".stripMargin)
    val p = tablePath("q")
    MergeWriter.addCheckConstraint(spark, p, "pos", "t.price > 0")
    spark.sql("INSERT INTO ck.ns.q VALUES (1, 5.0)")
    violates(spark.sql("INSERT INTO ck.ns.q VALUES (2, -1.0)"))
    // RENAME of the constrained column is caught through the qualifier
    val r = intercept[Exception](
      MergeWriter.renameColumn(spark, p, "price", "cost"))
    assert(Iterator.iterate(r: Throwable)(_.getCause)
      .takeWhile(_ != null).exists(x => Option(x.getMessage)
        .exists(_.contains("CHECK constraint"))), s"got: ${r.getMessage}")
    // a qualified reference to a column that does NOT exist fails loudly
    intercept[Exception](
      MergeWriter.addCheckConstraint(spark, p, "bad", "t.nope > 0"))
  }

  test("constraints survive commits and surface on the DSv2 table") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    import org.apache.spark.sql.connector.catalog.constraints.Check
    val cat = spark.sessionState.catalogManager.catalog("ck")
      .asInstanceOf[TableCatalog]
    val t = cat.loadTable(Identifier.of(Array("ns"), "m"))
    val cs = t.constraints()
    val check = cs.collectFirst { case c: Check => c }
    assert(check.isDefined && check.get.name() == "v_pos")
    assert(cs.exists(_.name() == "graft_pk"))
  }
}
