package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** GENERATED columns (GENERATED ALWAYS AS (expr)) on the graft catalog:
  * the expression rides the schema's field metadata; every write
  * COMPUTES omitted/NULL inputs from the row's stored columns and
  * VALIDATES explicit inputs against the expression (a conflicting
  * value fails the commit — same fused single-pass guard as CHECK
  * constraints).
  */
class GeneratedColumnsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val wh = Files.createTempDirectory("gen-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gen",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.gen.warehouse", wh)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  private def tablePath(name: String): String =
    spark.sql(s"DESCRIBE TABLE EXTENDED gen.ns.$name")
      .filter("col_name = 'Location'").collect()(0).getString(1)
      .stripPrefix("file:")

  test("omitted values are computed; explicit matches pass; explicit " +
       "mismatches fail the whole commit") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gen.ns")
    spark.sql(
      """CREATE TABLE gen.ns.t (
        |  id BIGINT, amount DOUBLE,
        |  amount_cents BIGINT GENERATED ALWAYS AS
        |    (CAST(ROUND(amount * 100) AS BIGINT)),
        |  bucket_day STRING GENERATED ALWAYS AS
        |    (CONCAT('d', CAST(id % 7 AS STRING))))
        |TBLPROPERTIES ('keys'='id', 'buckets'='4')""".stripMargin)
    spark.sql("INSERT INTO gen.ns.t (id, amount) VALUES (1, 1.25), " +
      "(2, 3.5)")
    val rows = spark.sql("SELECT id, amount_cents, bucket_day " +
      "FROM gen.ns.t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq == Seq((1L, 125L, "d1"), (2L, 350L, "d2")))
    // explicit value that MATCHES the expression: accepted
    spark.sql("INSERT INTO gen.ns.t VALUES (3, 2.0, 200, 'd3')")
    assert(spark.sql("SELECT amount_cents FROM gen.ns.t WHERE id = 3")
      .collect()(0).getLong(0) == 200L)
    // explicit MISMATCH: the whole statement fails, nothing lands
    val e = intercept[Exception](spark.sql(
      "INSERT INTO gen.ns.t VALUES (4, 2.0, 999, 'd4')"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage)
        .exists(_.contains("generated column"))), s"got: ${e.getMessage}")
    assert(spark.sql("SELECT count(*) FROM gen.ns.t WHERE id = 4")
      .collect()(0).getLong(0) == 0L)
  }

  test("UPDATE recomputes generated columns from the moved source " +
       "column; API merges compute NULLs; metadata survives commits") {
    // a PLAIN update of the source column — the user never mentions
    // the generated one; the row-level write RECOMPUTES it (the carried
    // old value is stale derivation input, not a user assertion)
    spark.sql("UPDATE gen.ns.t SET amount = 9.75 WHERE id = 1")
    assert(spark.sql("SELECT amount_cents FROM gen.ns.t WHERE id = 1")
      .collect()(0).getLong(0) == 975L)
    // the API merge path computes too (frame carries no metadata)
    import spark.implicits._
    val p = tablePath("t")
    MergeWriter.merge(spark, p,
      Seq((50L, 4.5, Option.empty[Long], Option.empty[String]))
        .toDF("id", "amount", "amount_cents", "bucket_day"), Seq("id"))
    val r = spark.sql(
      "SELECT amount_cents, bucket_day FROM gen.ns.t WHERE id = 50")
      .collect()(0)
    assert(r.getLong(0) == 450L && r.getString(1) == "d1")
    // and the API merge validates explicit mismatches
    val bad = intercept[Exception](MergeWriter.merge(spark, p,
      Seq((51L, 1.0, Some(7L), Option.empty[String]))
        .toDF("id", "amount", "amount_cents", "bucket_day"), Seq("id")))
    assert(Iterator.iterate(bad: Throwable)(_.getCause)
      .takeWhile(_ != null).exists(x => Option(x.getMessage)
        .exists(_.contains("generated column"))))
  }

  test("RENAME/DROP of a column referenced by a generated expression " +
       "is rejected — the stored expression must keep resolving") {
    spark.sql(
      """CREATE TABLE gen.ns.guard (
        |  id BIGINT, amount DOUBLE,
        |  cents BIGINT GENERATED ALWAYS AS
        |    (CAST(ROUND(amount * 100) AS BIGINT)))
        |TBLPROPERTIES ('keys'='id', 'buckets'='2')""".stripMargin)
    val p = tablePath("guard")
    val r = intercept[Exception](
      MergeWriter.renameColumn(spark, p, "amount", "amt"))
    assert(Iterator.iterate(r: Throwable)(_.getCause)
      .takeWhile(_ != null).exists(x => Option(x.getMessage)
        .exists(_.contains("generated column"))), s"got: ${r.getMessage}")
    val d = intercept[Exception](
      MergeWriter.dropColumn(spark, p, "amount"))
    assert(Iterator.iterate(d: Throwable)(_.getCause)
      .takeWhile(_ != null).exists(x => Option(x.getMessage)
        .exists(_.contains("generated column"))), s"got: ${d.getMessage}")
    // dropping the GENERATED column itself stays allowed (its spec
    // rides the dropped field), and the referenced column frees up
    MergeWriter.dropColumn(spark, p, "cents")
    MergeWriter.renameColumn(spark, p, "amount", "amt")
  }

  test("self-references and generated-on-generated are rejected at " +
       "create") {
    val e = intercept[Exception](spark.sql(
      """CREATE TABLE gen.ns.bad (
        |  a BIGINT, b BIGINT GENERATED ALWAYS AS (b + 1))
        |TBLPROPERTIES ('keys'='a', 'buckets'='2')""".stripMargin))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(m =>
        m.contains("references itself") || m.contains("generated"))))
    val e2 = intercept[Exception](spark.sql(
      """CREATE TABLE gen.ns.bad2 (
        |  a BIGINT, b BIGINT GENERATED ALWAYS AS (a + 1),
        |  c BIGINT GENERATED ALWAYS AS (b + 1))
        |TBLPROPERTIES ('keys'='a', 'buckets'='2')""".stripMargin))
    // Spark's own analysis rejects this shape first
    // (UNSUPPORTED_EXPRESSION_GENERATED_COLUMN); the storage-side
    // validation ("stored columns only") is the second line for API
    // creates that bypass the SQL analyzer
    assert(Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).exists(x => Option(x.getMessage)
        .exists(m => m.contains("stored columns only") ||
          m.contains("cannot reference another generated column"))))
  }
}
