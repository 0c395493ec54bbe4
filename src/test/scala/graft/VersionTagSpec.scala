package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** Version tags (Iceberg's named references on the manifest protocol):
  * a tag pins a retained version against gc and count retention until
  * dropped, resolves everywhere a version does (`VERSION AS OF 'tag'`,
  * the `versionAsOf` option, the storage API), and shows up in history.
  * The write-audit-publish anchor.
  */
class VersionTagSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val wh = Files.createTempDirectory("gtag-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gtag",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.gtag.warehouse", wh)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("a tag pins its version against gc; dropping it releases") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tag").toString + "/t"
    def put(gen: Int): Unit = MergeWriter.merge(spark, dir,
      (0 until 50).map(i => (i.toLong, s"g$gen-$i")).toDF("id", "s"),
      Seq("id"), buckets = 4)
    put(1) // v1
    put(2) // v2
    MergeWriter.createTag(spark, dir, "certified", Some(1L))
    // default retention keeps only the last 2 versions — commit past it
    put(3); put(4); put(5)
    MergeWriter.gcNow(spark, dir)
    val versions = MergeWriter.availableVersions(spark, dir)
    assert(versions.contains(1L),
      s"tagged v1 must survive gc (retained: $versions)")
    assert(!versions.contains(2L),
      s"untagged v2 must age out normally (retained: $versions)")
    // the tagged version still reads, by number and by name
    assert(MergeWriter.readTableVersion(spark, dir, 1L).collect()
      .forall(_.getString(1).startsWith("g1-")))
    val byRef = MergeWriter.resolveVersionRef(spark, dir, "certified")
    assert(byRef == 1L)
    // and through format("graft") versionAsOf
    assert(spark.read.format("graft").option("versionAsOf", "certified")
      .load(dir).collect().forall(_.getString(1).startsWith("g1-")))
    MergeWriter.dropTag(spark, dir, "certified")
    MergeWriter.gcNow(spark, dir)
    assert(!MergeWriter.availableVersions(spark, dir).contains(1L),
      "dropping the tag must release the version to retention")
  }

  test("SQL surface: create_tag / VERSION AS OF 'tag' / history tags / " +
       "drop_tag") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtag.ns")
    spark.sql("CREATE TABLE gtag.ns.t (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('keys'='id')")
    spark.sql("INSERT INTO gtag.ns.t SELECT id, 'v2' FROM range(0, 10)")
    spark.sql("CALL gtag.system.create_tag(table => 'ns.t', " +
      "tag => 'audited')")
    spark.sql("INSERT INTO gtag.ns.t SELECT id, 'v3' FROM range(0, 10)")
    // the tag resolves through VERSION AS OF and serves the old rows
    val tagged = spark.sql(
      "SELECT DISTINCT s FROM gtag.ns.t VERSION AS OF 'audited'")
      .collect().map(_.getString(0)).toSet
    assert(tagged == Set("v2"))
    assert(spark.sql("SELECT DISTINCT s FROM gtag.ns.t")
      .collect().map(_.getString(0)).toSet == Set("v3"))
    // history names the tag on its version
    val hist = spark.sql(
      "SELECT version, tags FROM gtag.ns.t.history WHERE tags IS NOT NULL")
      .collect()
    assert(hist.length == 1 && hist.head.getString(1) == "audited")
    spark.sql("CALL gtag.system.drop_tag(table => 'ns.t', " +
      "tag => 'audited')")
    intercept[Exception] {
      spark.sql("SELECT COUNT(*) FROM gtag.ns.t VERSION AS OF 'audited'")
        .collect()
    }
  }

  test("guards: numeric tag names refuse; truncateHistory refuses " +
       "under a pinning tag") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tagg").toString + "/t"
    MergeWriter.merge(spark, dir,
      (0 until 10).map(i => (i.toLong, "x")).toDF("id", "s"), Seq("id"))
    intercept[IllegalArgumentException] {
      MergeWriter.createTag(spark, dir, "42")
    }
    MergeWriter.merge(spark, dir,
      (10 until 20).map(i => (i.toLong, "y")).toDF("id", "s"), Seq("id"))
    MergeWriter.createTag(spark, dir, "keep", Some(1L))
    val e = intercept[IllegalArgumentException] {
      MergeWriter.truncateHistory(spark, dir)
    }
    assert(e.getMessage.contains("keep"))
    MergeWriter.dropTag(spark, dir, "keep")
    MergeWriter.truncateHistory(spark, dir) // now fine
  }
}
