package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** VARIANT custom fields (Spark 4's VariantType — the open-format
  * answer to jsonb): the reference's raw side is truly dynamic
  * (`[propName: string]: any`, ref
  * `src/jiracloud/process/revision_processor.ts:113`), and a
  * `customFields VARIANT` column stores it WITHOUT schema churn —
  * heterogeneous shapes per row, typed extraction via `variant_get`,
  * missing paths as NULL. The graft table protocol must carry the type
  * end to end: DDL, keyed merge/upsert, row-level SQL, manifest schema
  * round-trip, and extraction parity with a typed column.
  */
class VariantFieldsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("gvar-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.gvar",
      classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.gvar.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("a VARIANT column stores heterogeneous custom-field documents; " +
       "variant_get extracts typed values, missing paths are NULL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvar.ns")
    spark.sql("CREATE TABLE gvar.ns.cf (id BIGINT, cf VARIANT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    // three SHAPES in one column: flat, nested, and missing-field
    spark.sql("""INSERT INTO gvar.ns.cf VALUES
      (1, PARSE_JSON('{"prio": "high", "points": 5}')),
      (2, PARSE_JSON('{"prio": "low", "meta": {"team": "core"}}')),
      (3, PARSE_JSON('{"points": 8, "tags": ["a", "b"]}'))""")
    val got = spark.sql("""SELECT id,
        variant_get(cf, '$.prio', 'string') AS prio,
        variant_get(cf, '$.points', 'long') AS points,
        variant_get(cf, '$.meta.team', 'string') AS team,
        variant_get(cf, '$.tags[1]', 'string') AS tag1
      FROM gvar.ns.cf ORDER BY id""").collect()
    assert(got.length == 3)
    assert(got(0).getString(1) == "high" && got(0).getLong(2) == 5 &&
      got(0).isNullAt(3) && got(0).isNullAt(4))
    assert(got(1).getString(1) == "low" && got(1).isNullAt(2) &&
      got(1).getString(3) == "core")
    assert(got(2).isNullAt(1) && got(2).getLong(2) == 8 &&
      got(2).getString(4) == "b")
  }

  test("keyed upsert replaces a row's variant document; row-level " +
       "UPDATE rewrites it through SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvar.ns")
    spark.sql("CREATE TABLE gvar.ns.up (id BIGINT, cf VARIANT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2')")
    spark.sql("""INSERT INTO gvar.ns.up
      SELECT id, PARSE_JSON(CONCAT('{"v": ', id, '}')) FROM range(10)""")
    // keyed merge semantics: same key re-landed = replace
    spark.sql("""INSERT INTO gvar.ns.up VALUES
      (3, PARSE_JSON('{"v": 333, "extra": true}'))""")
    assert(spark.sql("SELECT COUNT(*) FROM gvar.ns.up")
      .collect().head.getLong(0) == 10)
    val r3 = spark.sql("SELECT variant_get(cf, '$.v', 'long'), " +
      "variant_get(cf, '$.extra', 'boolean') FROM gvar.ns.up WHERE id = 3")
      .collect().head
    assert(r3.getLong(0) == 333 && r3.getBoolean(1))
    // row-level UPDATE rewrites the document
    spark.sql("UPDATE gvar.ns.up SET cf = PARSE_JSON('{\"v\": -1}') " +
      "WHERE id = 7")
    assert(spark.sql("SELECT variant_get(cf, '$.v', 'long') " +
      "FROM gvar.ns.up WHERE id = 7").collect().head.getLong(0) == -1L)
    // DELETE works like any column-agnostic keyed op
    spark.sql("DELETE FROM gvar.ns.up WHERE id IN (0, 1)")
    assert(spark.sql("SELECT COUNT(*) FROM gvar.ns.up")
      .collect().head.getLong(0) == 8)
  }

  test("typed and variant extraction agree on the same fixture " +
       "(the T11 polymorphic custom-field shape)") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvar.ns")
    val rows = (0 until 100).map(i =>
      (i.toLong, s"prio-${i % 5}", i % 13,
        s"""{"prio": "prio-${i % 5}", "points": ${i % 13}}"""))
      .toDF("id", "prio_typed", "points_typed", "raw")
    rows.createOrReplaceTempView("var_src")
    spark.sql("CREATE TABLE gvar.ns.par (id BIGINT, prio_typed STRING, " +
      "points_typed INT, cf VARIANT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2')")
    spark.sql("INSERT INTO gvar.ns.par SELECT id, prio_typed, " +
      "points_typed, PARSE_JSON(raw) FROM var_src")
    val mismatch = spark.sql("""SELECT COUNT(*) FROM gvar.ns.par
      WHERE variant_get(cf, '$.prio', 'string') <> prio_typed
         OR variant_get(cf, '$.points', 'int') <> points_typed""")
      .collect().head.getLong(0)
    assert(mismatch == 0, s"$mismatch rows disagree typed-vs-variant")
  }

  test("a table with TWO variant columns filters on one of them — the " +
       "catalog declines Spark 4.1.2's broken DSv2 variant-extraction " +
       "pushdown (stale-exprId Filter on the rebuilt relation)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvar.ns")
    spark.sql("CREATE TABLE gvar.ns.two (id BIGINT, a VARIANT, " +
      "b VARIANT) TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    spark.sql("""INSERT INTO gvar.ns.two SELECT id,
      PARSE_JSON('{"kind": "k1"}'), PARSE_JSON('{"tags": ["g"]}')
      FROM range(40)""")
    // without the refusal this binds a stale a#N against the rebuilt
    // relation's fresh output (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
    assert(spark.sql("""SELECT COUNT(*) FROM gvar.ns.two
      WHERE variant_get(a, '$.kind', 'string') = 'k1'""")
      .collect().head.getLong(0) == 40L)
    assert(spark.sql("""SELECT variant_get(b, '$.tags[0]', 'string')
      FROM gvar.ns.two
      WHERE variant_get(a, '$.kind', 'string') = 'k1' LIMIT 1""")
      .collect().head.getString(0) == "g")
  }

  test("the manifest schema round-trips VARIANT (time travel reads the " +
       "pre-evolution version; DESCRIBE shows the type)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvar.ns")
    spark.sql("CREATE TABLE gvar.ns.rt (id BIGINT, cf VARIANT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='2', 'retainVersions'='5')")
    spark.sql("INSERT INTO gvar.ns.rt VALUES (1, PARSE_JSON('{\"a\":1}'))")
    spark.sql("INSERT INTO gvar.ns.rt VALUES (1, PARSE_JSON('{\"a\":2}'))")
    val desc = spark.sql("DESCRIBE TABLE gvar.ns.rt").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("cf").toLowerCase == "variant")
    val v1 = spark.sql("SELECT MAX(version) - 1 FROM gvar.ns.rt.history")
      .collect().head.getLong(0)
    assert(spark.sql(
      s"SELECT variant_get(cf, '$$.a', 'long') FROM gvar.ns.rt " +
        s"VERSION AS OF $v1").collect().head.getLong(0) == 1L)
  }
}
