package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MergeWriter

/** ANALYZE TABLE for the manifest protocol: one pass records per-column
  * NDV / null count / lengths / min-max in the manifest; the catalog
  * scan serves them through `estimateStatistics().columnStats()`, which
  * Spark's `transformV2Stats` turns into the catalyst `attributeStats`
  * the cost-based optimizer consumes — join reorder and selectivity at
  * 100 TB keyed off real NDVs instead of defaults.
  */
class AnalyzeStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val wh = Files.createTempDirectory("gan-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gan",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.sql.catalog.gan.warehouse", wh)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("analyzeTable records NDV / nulls / lengths / min-max and the " +
       "analyzed version") {
    import spark.implicits._
    val dir = Files.createTempDirectory("an").toString + "/t"
    val rows = (0 until 1000).map(i => (i.toLong,
      if (i % 10 == 0) null else s"g${i % 7}",
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19700 + i % 50))))
      .toDF("id", "grp", "d")
    MergeWriter.merge(spark, dir, rows, Seq("id"), buckets = 4)
    val stats = MergeWriter.analyzeTable(spark, dir)
    val id = stats("id")
    // HLL at default rsd: 1000 distinct ids within ~5%
    assert(math.abs(id.ndv - 1000) <= 60, s"id ndv ${id.ndv}")
    assert(id.nulls == 0 && id.avgLen == 8 && id.maxLen == 8)
    assert(id.min == "0" && id.max == "999")
    val grp = stats("grp")
    assert(grp.ndv >= 6 && grp.ndv <= 8, s"grp ndv ${grp.ndv}")
    assert(grp.nulls == 100)
    assert(grp.maxLen == 2 && grp.avgLen == 2)
    assert(grp.min.isEmpty && grp.max.isEmpty) // no string ranges
    val d = stats("d")
    assert(d.min == "19700" && d.max == "19749") // canonical epoch days
    // the commit is metadata-only and visible in history as "analyze"
    val hist = MergeWriter.tableHistory(spark, dir).collect()
    assert(hist.head.getAs[String]("op") == "analyze")
  }

  test("CALL gan.system.analyze serves the CBO attributeStats through " +
       "the catalog scan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gan.ns")
    spark.sql("CREATE TABLE gan.ns.t (id BIGINT, grp STRING) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    spark.sql("INSERT INTO gan.ns.t SELECT id, CONCAT('g', id % 5) " +
      "FROM range(0, 2000)")
    val status = spark.sql("CALL gan.system.analyze(table => 'ns.t')")
      .collect().head.getString(0)
    assert(status.contains("analyzed") && status.contains("ndv="))
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val df = spark.sql("SELECT * FROM gan.ns.t")
      val attrStats = df.queryExecution.optimizedPlan.stats.attributeStats
      assert(attrStats.nonEmpty, "CBO saw no attributeStats")
      val idStat = attrStats.toSeq
        .find(_._1.name == "id").map(_._2)
        .getOrElse(fail("no stats for id"))
      assert(idStat.distinctCount.exists(n =>
        (n.toLong - 2000).abs <= 150), s"id ndv ${idStat.distinctCount}")
      assert(idStat.nullCount.exists(_ == 0))
      assert(idStat.min.contains(0L) && idStat.max.contains(1999L),
        s"id range ${idStat.min}..${idStat.max}")
      val grpStat = attrStats.toSeq
        .find(_._1.name == "grp").map(_._2)
        .getOrElse(fail("no stats for grp"))
      assert(grpStat.distinctCount.exists(n => n.toLong >= 4 &&
        n.toLong <= 6))
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("stats survive later commits as estimates (carried forward, " +
       "version named)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("an2").toString + "/t"
    MergeWriter.merge(spark, dir,
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "s"), Seq("id"))
    MergeWriter.analyzeTable(spark, dir)
    // a later merge keeps the recorded stats (estimates by contract)
    MergeWriter.merge(spark, dir,
      (100 until 200).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      Seq("id"))
    val man = new String(Files.readAllBytes(
      new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("_manifest-"))
        .map(_.toPath).maxBy(_.getFileName.toString)), "UTF-8")
    assert(man.contains("\"cstats\":") && man.contains("\"cstatsv\":") &&
      man.contains("\"cstatsr\":"))
    // the histogram record rides later commits forward the same way
    assert(man.contains("\"chist\":"),
      "equi-height histograms must carry forward with the other stats")
  }

  private def attrStats(sql: String) = {
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.sql(sql).queryExecution.optimizedPlan.stats
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("commits after ANALYZE refresh the stats incrementally (HLL " +
       "union): NDV tracks churn instead of rotting") {
    spark.sql("CREATE TABLE gan.ns.drift (id BIGINT, grp STRING) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    spark.sql("INSERT INTO gan.ns.drift SELECT id, CONCAT('g', id % 5) " +
      "FROM range(0, 1000)")
    spark.sql("CALL gan.system.analyze(table => 'ns.drift')")
    // small drift: stats keep serving (both under the old gate and the
    // refresh — trivially fresh now)
    spark.sql("INSERT INTO gan.ns.drift SELECT id, 'late' " +
      "FROM range(1000, 1050)")
    assert(attrStats("SELECT * FROM gan.ns.drift").attributeStats.nonEmpty,
      "5% drift must not withhold ANALYZE stats")
    // 100% growth: the per-commit sketch union keeps the NDV CURRENT —
    // the CBO gets ~2100 distinct ids, never the stale 1000
    spark.sql("INSERT INTO gan.ns.drift SELECT id, 'churn' " +
      "FROM range(1050, 2100)")
    val churned = attrStats("SELECT * FROM gan.ns.drift")
    assert(churned.rowCount.exists(_.toLong == 2100),
      s"exact numRows: ${churned.rowCount}")
    val idStat = churned.attributeStats.toSeq.find(_._1.name == "id")
      .map(_._2).getOrElse(fail(
        s"refreshed stats must keep serving: ${churned.attributeStats}"))
    assert(idStat.distinctCount.exists(n => (n.toLong - 2100).abs <= 160),
      s"NDV must track the churn: ${idStat.distinctCount}")
    assert(idStat.max.contains(2099L),
      s"max must widen with the batch: ${idStat.max}")
    val grpStat = churned.attributeStats.toSeq.find(_._1.name == "grp")
      .map(_._2).getOrElse(fail("no grp stats"))
    assert(grpStat.distinctCount.exists(n => n.toLong >= 6 &&
      n.toLong <= 8), s"grp ndv ${grpStat.distinctCount}") // 5 + late/churn
  }

  test("legacy sketch-less manifests keep the conservative gate: " +
       "drifted stats are WITHHELD, not served wrong") {
    spark.sql("CREATE TABLE gan.ns.legacy (id BIGINT, grp STRING) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    spark.sql("INSERT INTO gan.ns.legacy SELECT id, CONCAT('g', id % 5) " +
      "FROM range(0, 1000)")
    spark.sql("CALL gan.system.analyze(table => 'ns.legacy')")
    // simulate a pre-sketch manifest: strip the csk field through the
    // protocol's own JSON (backward-compat shape — stats present, no
    // sketches to union)
    val wh = spark.conf.get("spark.sql.catalog.gan.warehouse")
    val dir = new java.io.File(s"$wh/ns/legacy")
    val latest = dir.listFiles()
      .filter(_.getName.startsWith("_manifest-"))
      .maxBy(_.getName)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(latest)
    node.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .remove("csk")
    val v = latest.getName.stripPrefix("_manifest-")
      .stripSuffix(".json").toLong
    val next = new java.io.File(dir, f"_manifest-${v + 1}%016d.json")
    Files.write(next.toPath, node.toString.getBytes("UTF-8"))
    // 100% growth with nothing to union: a confidently-wrong NDV is
    // worse than no estimate — the scan withholds columnStats
    spark.sql("INSERT INTO gan.ns.legacy SELECT id, 'churn' " +
      "FROM range(1000, 2100)")
    val churned = attrStats("SELECT * FROM gan.ns.legacy")
    assert(churned.attributeStats.isEmpty,
      s"sketch-less churned table served stale column stats: " +
        s"${churned.attributeStats}")
    assert(churned.rowCount.exists(_.toLong == 2100),
      s"exact numRows must survive the withholding: ${churned.rowCount}")
    // re-ANALYZE restores both stats and sketches
    spark.sql("CALL gan.system.analyze(table => 'ns.legacy')")
    assert(attrStats("SELECT * FROM gan.ns.legacy").attributeStats.nonEmpty)
  }

  test("ANALYZE records equi-height histograms; skewed-column equality " +
       "selectivity tracks the real distribution, not uniform NDV") {
    spark.sql("CREATE TABLE gan.ns.skew (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4')")
    // 90% of rows carry v=7 (the reference's per-org partitionKey skew
    // shape); the rest spread over ~1000 values
    spark.sql("INSERT INTO gan.ns.skew SELECT id, " +
      "CASE WHEN id % 10 < 9 THEN 7 ELSE id % 1000 END " +
      "FROM range(0, 10000)")
    spark.sql("CALL gan.system.analyze(table => 'ns.skew')")
    val vStat = attrStats("SELECT * FROM gan.ns.skew").attributeStats
      .toSeq.find(_._1.name == "v").map(_._2)
      .getOrElse(fail("no stats for v"))
    assert(vStat.histogram.isDefined, "ANALYZE must record a histogram")
    val bins = vStat.histogram.get.bins
    assert(bins.length >= 8, s"bins: ${bins.length}")
    // equi-height over 90% skew: the heavy hitter OWNS most bins
    // (duplicate endpoints — lo == hi == 7); that is the skew signal
    // uniform NDV cannot carry
    assert(bins.count(b => b.lo == 7.0 && b.hi == 7.0) >= bins.length / 2,
      s"heavy hitter must span bins: ${bins.map(b => (b.lo, b.hi)).toSeq}")
    // the CBO's equality selectivity now SEPARATES heavy from rare —
    // under uniform-NDV both estimates would be identical (rows/ndv)
    val heavy = attrStats("SELECT * FROM gan.ns.skew WHERE v = 7")
      .rowCount.map(_.toLong)
      .getOrElse(fail("no rowCount for the heavy filter"))
    val rare = attrStats("SELECT * FROM gan.ns.skew WHERE v = 503")
      .rowCount.map(_.toLong)
      .getOrElse(fail("no rowCount for the rare filter"))
    assert(heavy >= 10L * math.max(rare, 1L),
      s"histogram selectivity must separate skew: heavy=$heavy rare=$rare")
    assert(heavy >= 5000L, s"the 90% hitter must estimate large: $heavy")
  }

  test("a filter-pruned scan gets exact numRows but not whole-table " +
       "column stats") {
    // whole-table NDV/null counts paired with a pruned numRows could
    // report counts exceeding numRows — the scan omits them when any
    // file was pruned
    val pruned = attrStats("SELECT * FROM gan.ns.drift WHERE id = 5")
    assert(pruned.attributeStats.isEmpty,
      s"pruned scan served whole-table column stats: " +
        s"${pruned.attributeStats}")
    assert(attrStats("SELECT * FROM gan.ns.drift").attributeStats.nonEmpty,
      "the unpruned scan of the same table must keep serving")
  }
}
