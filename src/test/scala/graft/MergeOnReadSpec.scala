package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** Merge-on-read upserts (Iceberg v2's shape on the manifest protocol):
  * a small batch on a `deleteVectors = true` table lands as ONE overlay
  * epoch while the replaced keys' old rows die by deletion vector —
  * epoch pointers unmoved, write I/O ∝ the batch. Every read must agree
  * with copy-on-write semantics exactly; any full bucket rewrite
  * collapses the overlays.
  */
class MergeOnReadSpec extends AnyFunSuite with BeforeAndAfterAll
    with ManifestSpecHelpers {

  private lazy val spark = {
    val wh = Files.createTempDirectory("gmor-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gmor",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.gmor.warehouse", wh)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()



  private def seed(dir: String, n: Int): Unit = {
    import spark.implicits._
    val rows = (0 until n).map(i => (i.toLong, s"v1-$i", i % 5))
      .toDF("id", "body", "grp")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "50")
    try MergeWriter.merge(spark, dir, rows, Seq("id"), buckets = 4,
      clusterBy = Seq("id"), deleteVectors = true, fingerprint = true)
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
  }

  test("a small upsert lands merge-on-read: pointers unmoved, overlay " +
       "recorded, replaced keys die by DV, content equals CoW semantics") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mor").toString + "/t"
    seed(dir, 400)
    val before = manifestText(dir)
    // 3 updates + 2 inserts, scattered
    val batch = Seq((7L, "UPD-7", 99), (133L, "UPD-133", 99),
      (388L, "UPD-388", 99), (1000L, "NEW-1000", 99),
      (1001L, "NEW-1001", 99)).toDF("id", "body", "grp")
    MergeWriter.merge(spark, dir, batch, Seq("id"))
    val after = manifestText(dir)
    assert(epochPointers(after) == epochPointers(before),
      "MoR upsert must not move base epoch pointers")
    assert(after.contains("\"ovl\":"), "manifest must record the overlay")
    assert(after.contains("\"dv\":"),
      "replaced keys' old rows must die by deletion vector")
    val t = MergeWriter.readTable(spark, dir)
    assert(t.count() == 402)
    val got = t.where(col("id").isin(7L, 133L, 388L, 1000L, 1001L, 8L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(7L -> "UPD-7", 133L -> "UPD-133", 388L -> "UPD-388",
      1000L -> "NEW-1000", 1001L -> "NEW-1001", 8L -> "v1-8"))
    // point lookup resolves the NEW copy only
    val pt = MergeWriter.readKeys(spark, dir, Seq(7L).toDF("id"), Seq("id"))
      .collect()
    assert(pt.length == 1 && pt.head.getString(1) == "UPD-7")
    // range read over the overlay-spanning key space
    val rg = MergeWriter.readTableRange(spark, dir, "id",
      Some(130L), Some(140L)).collect()
    assert(rg.length == 11 &&
      rg.find(_.getLong(0) == 133L).get.getString(1) == "UPD-133")
  }

  test("pure-insert MoR batch (no DVs) stays on the NATIVE catalog scan " +
       "and reads the overlay files") {
    import spark.implicits._
    val wh = spark.conf.get("spark.sql.catalog.gmor.warehouse")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmor.ns")
    spark.sql("CREATE TABLE gmor.ns.t (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4', " +
      "'deleteVectors'='true')")
    spark.sql("INSERT INTO gmor.ns.t SELECT id, 'a' FROM range(0, 100)")
    // second insert: brand-new keys only → overlay with ZERO vectors
    spark.sql("INSERT INTO gmor.ns.t SELECT id, 'b' FROM range(100, 120)")
    val man = manifestText(s"$wh/ns/t")
    assert(man.contains("\"ovl\":") && !man.contains("\"dv\":"),
      s"pure-insert batch must be an overlay without vectors: $man")
    val df = spark.sql("SELECT COUNT(*) AS c FROM gmor.ns.t")
    assert(df.collect().head.getLong(0) == 120)
    val plan = spark.sql("SELECT * FROM gmor.ns.t WHERE id = 110")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") && !plan.contains("GraftDvScan"),
      s"DV-free overlays must plan natively, got:\n$plan")
    assert(spark.sql("SELECT s FROM gmor.ns.t WHERE id = 110")
      .collect().head.getString(0) == "b")
  }

  test("feeds see MoR commits; untouched DV'd/overlay files still pair") {
    import spark.implicits._
    val dir = Files.createTempDirectory("morf").toString + "/t"
    seed(dir, 200)
    val v1 = MergeWriter.availableVersions(spark, dir).last
    MergeWriter.merge(spark, dir,
      Seq((10L, "UPD-10", 1), (500L, "NEW-500", 1))
        .toDF("id", "body", "grp"), Seq("id"))
    val v2 = MergeWriter.availableVersions(spark, dir).last
    val feed = MergeWriter.changeFeed(spark, dir, v1, v2, Seq("id"),
      Seq("body", "grp"))
    val ops = feed.select(col("id"), col("op")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ops == Set((10L, "update"), (500L, "insert")), s"got $ops")
    // a second MoR round in a different key region must not re-emit the
    // first round's rows (sig-pruning + pairing on untouched files)
    MergeWriter.merge(spark, dir,
      Seq((180L, "UPD-180", 2)).toDF("id", "body", "grp"), Seq("id"))
    val v3 = MergeWriter.availableVersions(spark, dir).last
    val feed2 = MergeWriter.changeFeed(spark, dir, v2, v3, Seq("id"),
      Seq("body", "grp"))
    val ops2 = feed2.select(col("id"), col("op")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ops2 == Set((180L, "update")), s"got $ops2")
  }

  test("compact collapses overlays and vectors; split applies them; " +
       "a big batch falls back to copy-on-write") {
    import spark.implicits._
    val dir = Files.createTempDirectory("morc").toString + "/t"
    seed(dir, 300)
    MergeWriter.merge(spark, dir,
      Seq((3L, "UPD-3", 0), (900L, "NEW-900", 0)).toDF("id", "body", "grp"),
      Seq("id"))
    assert(manifestText(dir).contains("\"ovl\":"))
    MergeWriter.compact(spark, dir)
    val afterCompact = manifestText(dir)
    assert(!afterCompact.contains("\"ovl\":") &&
      !afterCompact.contains("\"dv\":"))
    val t = MergeWriter.readTable(spark, dir)
    assert(t.count() == 301)
    assert(t.where(col("id") === 3L).collect().head.getString(1) == "UPD-3")
    // overlay again, then split: rows re-bin, overlays collapse
    MergeWriter.merge(spark, dir,
      Seq((5L, "UPD-5", 0)).toDF("id", "body", "grp"), Seq("id"))
    assert(manifestText(dir).contains("\"ovl\":"))
    MergeWriter.splitBuckets(spark, dir, Seq("id"))
    val afterSplit = manifestText(dir)
    assert(!afterSplit.contains("\"ovl\":"))
    assert(MergeWriter.readTable(spark, dir)
      .where(col("id") === 5L).collect().head.getString(1) == "UPD-5")
    // a whole-table-sized batch stays correct whichever path takes it
    val big = (0 until 301).map(i => (i.toLong, s"v2-$i", 1))
      .toDF("id", "body", "grp")
    MergeWriter.merge(spark, dir, big, Seq("id"))
    val t2 = MergeWriter.readTable(spark, dir)
    assert(t2.count() == 302) // ids 0..300 upserted + NEW-900
    assert(t2.where(col("id") === 7L).collect().head.getString(1) == "v2-7")
  }

  test("a batch past the metadata cap falls back to copy-on-write " +
       "(pointers move, no overlay append)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("morbig").toString + "/t"
    import spark.implicits._
    MergeWriter.merge(spark, dir,
      (0 until 1000).map(i => (i.toLong, "seed")).toDF("id", "s"),
      Seq("id"), buckets = 2, deleteVectors = true)
    val before = epochPointers(manifestText(dir))
    val big = (0 until 100001)
      .map(i => (i.toLong, "big")).toDF("id", "s")
    MergeWriter.merge(spark, dir, big, Seq("id"))
    val after = manifestText(dir)
    assert(epochPointers(after) != before,
      "an over-cap batch must rewrite copy-on-write")
    assert(!after.contains("\"ovl\":"))
    assert(MergeWriter.readTable(spark, dir).count() == 100001)
  }

  test("compacting a PURE-INSERT overlay table (no vectors) keeps the " +
       "overlay rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("morpi").toString + "/t"
    MergeWriter.merge(spark, dir,
      (0 until 100).map(i => (i.toLong, "a")).toDF("id", "s"),
      Seq("id"), buckets = 4, deleteVectors = true)
    // brand-new keys only: overlay with zero vectors
    MergeWriter.merge(spark, dir,
      (100 until 130).map(i => (i.toLong, "b")).toDF("id", "s"), Seq("id"))
    val m = manifestText(dir)
    assert(m.contains("\"ovl\":") && !m.contains("\"dv\":"))
    MergeWriter.compact(spark, dir)
    val t = MergeWriter.readTable(spark, dir)
    assert(t.count() == 130,
      "compaction must fold pure-insert overlay rows in, not drop them")
    assert(t.where(col("s") === "b").count() == 30)
    assert(!manifestText(dir).contains("\"ovl\":"))
  }

  test("compactBuckets drains ONLY the pressured buckets: other " +
       "pointers untouched, content preserved, fully-dead bucket drops") {
    import spark.implicits._
    val dir = Files.createTempDirectory("morpc").toString + "/t"
    seed(dir, 400)
    // MoR-pressure bucket(s): overlay + DVs around key 7
    MergeWriter.merge(spark, dir,
      Seq((7L, "UPD-7", 0)).toDF("id", "body", "grp"), Seq("id"))
    val man = manifestText(dir)
    assert(man.contains("\"ovl\":"))
    // which bucket got the overlay? parse "ovl":{"K":[...]}
    val i = man.indexOf("\"ovl\":{\"")
    val pressured = man.substring(i + 8, man.indexOf('"', i + 8)).toInt
    def pointerOf(m: String, b: Int): String = {
      val j = m.indexOf(s""""$b":"e-""")
      m.substring(j, m.indexOf('"', j + s""""$b":"""".length + 1))
    }
    val others = (0 until 4).filter(_ != pressured)
    val beforePtrs = others.map(b => pointerOf(man, b))
    MergeWriter.compactBuckets(spark, dir, Set(pressured))
    val after = manifestText(dir)
    assert(!after.contains("\"ovl\":") && !after.contains("\"dv\":"),
      "the pressured bucket's overlay and vectors must drain")
    assert(others.map(b => pointerOf(after, b)) == beforePtrs,
      "unpressured buckets' pointers must not move")
    val t = MergeWriter.readTable(spark, dir)
    assert(t.count() == 400)
    assert(t.where(col("id") === 7L).collect().head.getString(1) == "UPD-7")
    // fully-dead bucket: DV every key of one bucket, partial-compact it
    val bKeys = MergeWriter.readTable(spark, dir)
      .withColumn("b", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(col("id")),
        org.apache.spark.sql.functions.lit(4)))
      .where(col("b") === pressured).select("id").as[Long].collect()
    MergeWriter.delete(spark, dir, bKeys.toSeq.toDF("id"), Seq("id"))
    MergeWriter.compactBuckets(spark, dir, Set(pressured))
    val finalMan = manifestText(dir)
    assert(!finalMan.contains(s""""$pressured":"e-""") ||
      // the pointer may exist only if some row survived (hash ties)
      MergeWriter.readTable(spark, dir).count() == 400 - bKeys.length)
    assert(MergeWriter.readTable(spark, dir).count() == 400 - bKeys.length)
  }

  test("a REORDERED-column batch keeps the MoR fast path (column order " +
       "is provenance noise, not a fallback trigger)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gmor-ord").toString + "/t"
    seed(dir, 200)
    // same column SET, different ORDER than the recorded schema — a
    // by-name INSERT's shape; must still land as an overlay, never pay
    // the CoW bucket rewrite
    MergeWriter.merge(spark, dir,
      Seq(("swapped", 3L, 1), ("fresh", 9999L, 2))
        .toDF("body", "id", "grp"), Seq("id"))
    val man = manifestText(dir)
    assert(man.contains("\"ovl\":"),
      "reordered batch must take the overlay path (manifest has no ovl)")
    val rows = MergeWriter.readTable(spark, dir)
      .filter(col("id").isin(3L, 9999L)).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("body")).toMap
    assert(rows == Map(3L -> "swapped", 9999L -> "fresh"))
  }

  test("exactly-once: a replayed MoR txn batch is a zero-commit skip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mort").toString + "/t"
    seed(dir, 100)
    val batch = Seq((1L, "TXN-1", 0)).toDF("id", "body", "grp")
    MergeWriter.merge(spark, dir, batch, Seq("id"), txn = Some(("app", 5L)))
    val vAfter = MergeWriter.availableVersions(spark, dir).last
    MergeWriter.merge(spark, dir,
      Seq((1L, "TXN-STALE", 0)).toDF("id", "body", "grp"), Seq("id"),
      txn = Some(("app", 5L)))
    assert(MergeWriter.availableVersions(spark, dir).last == vAfter,
      "replayed txn must not commit")
    assert(MergeWriter.readTable(spark, dir)
      .where(col("id") === 1L).collect().head.getString(1) == "TXN-1")
  }

  test("a second MoR upsert REPLACING an overlay row DVs the overlay " +
       "file itself") {
    import spark.implicits._
    val dir = Files.createTempDirectory("moro").toString + "/t"
    seed(dir, 100)
    MergeWriter.merge(spark, dir,
      Seq((2L, "GEN-2", 0)).toDF("id", "body", "grp"), Seq("id"))
    MergeWriter.merge(spark, dir,
      Seq((2L, "GEN-3", 0)).toDF("id", "body", "grp"), Seq("id"))
    val t = MergeWriter.readTable(spark, dir)
    assert(t.where(col("id") === 2L).collect()
      .map(_.getString(1)).toSeq == Seq("GEN-3"),
      "the overlay row's old generation must die by DV")
    assert(t.count() == 100)
    // point lookup agrees
    val pt = MergeWriter.readKeys(spark, dir, Seq(2L).toDF("id"), Seq("id"))
      .collect()
    assert(pt.length == 1 && pt.head.getString(1) == "GEN-3")
  }
}
