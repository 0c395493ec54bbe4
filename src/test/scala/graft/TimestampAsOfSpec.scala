package graft

import java.nio.file.Files
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SQL `TIMESTAMP AS OF` end to end — the catalog overload
  * (`GraftCatalog.loadTable(ident, timestampMicros)`) converts Spark's
  * microseconds to the protocol's milliseconds and resolves the LATEST
  * retained version whose manifest committed at or before the instant
  * (inclusive at the commit, like Delta/Iceberg). Wall-clock time
  * travel is the first thing an auditor types; an off-by-unit bug here
  * would silently serve the wrong state, so every boundary gets a
  * test: at-commit, between commits, after the last, before the first
  * (loud error), and equivalence with `VERSION AS OF`.
  */
class TimestampAsOfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val wh = Files.createTempDirectory("gtt-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gtt",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.gtt.warehouse", wh)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  private val fmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(ZoneOffset.UTC)

  private def tsLiteral(millis: Long): String =
    fmt.format(Instant.ofEpochMilli(millis))

  /** version → manifest-file mtime (the instant `TIMESTAMP AS OF`
    * resolves against).
    */
  private def commitTimes(): Map[Long, Long] = {
    val wh = spark.conf.get("spark.sql.catalog.gtt.warehouse")
    new java.io.File(s"$wh/ns/t").listFiles()
      .filter(_.getName.startsWith("_manifest-"))
      .map(f => f.getName.stripPrefix("_manifest-")
        .stripSuffix(".json").toLong -> f.lastModified())
      .toMap
  }

  private def countAt(clause: String): Long =
    spark.sql(s"SELECT COUNT(*) AS c FROM gtt.ns.t $clause")
      .collect().head.getLong(0)

  test("TIMESTAMP AS OF resolves at-commit (inclusive), between " +
       "commits, and after the last commit") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtt.ns")
    spark.sql("CREATE TABLE gtt.ns.t (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4', " +
      "'retainVersions'='10')")
    spark.sql("INSERT INTO gtt.ns.t SELECT id, 'a' FROM range(0, 100)")
    Thread.sleep(150) // mtime gap so boundary instants are unambiguous
    spark.sql("INSERT INTO gtt.ns.t SELECT id, 'b' FROM range(100, 250)")
    val times = commitTimes()
    val vs = times.keys.toSeq.sorted
    val (v0, v1, v2) = (vs(vs.length - 3), vs(vs.length - 2), vs.last)
    // at-commit is INCLUSIVE: the exact commit instant sees the commit
    assert(countAt(s"TIMESTAMP AS OF '${tsLiteral(times(v1))}'") == 100,
      "the exact commit instant must see that commit (inclusive bound)")
    // between commits: the earlier version answers
    val between = times(v2) - 1
    assert(times(v1) < between, "test setup: commits must not share ms")
    assert(countAt(s"TIMESTAMP AS OF '${tsLiteral(between)}'") == 100)
    // at/after the last commit: the latest version answers
    assert(countAt(s"TIMESTAMP AS OF '${tsLiteral(times(v2))}'") == 250)
    assert(countAt(
      s"TIMESTAMP AS OF '${tsLiteral(times(v2) + 3600000)}'") == 250)
    // equivalence with VERSION AS OF at the same pin
    assert(countAt(s"VERSION AS OF $v1") ==
      countAt(s"TIMESTAMP AS OF '${tsLiteral(times(v1))}'"))
    // unit check: micros→millis must truncate, not misscale — the
    // CREATE's empty version resolves at its own instant, where a
    // unit bug would shift the resolution by ~1000×
    assert(countAt(
      s"TIMESTAMP AS OF '${tsLiteral(times(v0))}'") == 0)
  }

  test("TIMESTAMP AS OF before the first commit fails loudly") {
    val times = commitTimes()
    val before = times.values.min - 10000
    val e = intercept[Exception] {
      countAt(s"TIMESTAMP AS OF '${tsLiteral(before)}'")
    }
    assert(e.getMessage != null && e.getMessage.contains("timestampAsOf"),
      s"expected the protocol's loud no-version error, got: $e")
  }

  test("the auditor scenario: a timestamp before a DELETE still sees " +
       "the purged rows") {
    val preDelete = commitTimes().values.max
    Thread.sleep(150)
    spark.sql("DELETE FROM gtt.ns.t WHERE id < 50")
    assert(countAt("") == 200)
    assert(countAt(s"TIMESTAMP AS OF '${tsLiteral(preDelete)}'") == 250,
      "wall-clock travel to the pre-delete instant must see all rows")
  }
}
