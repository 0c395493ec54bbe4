package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Runtime filtering (SPARK-35779 dynamic data pruning): when a graft
  * catalog table joins a selectively-filtered dimension, the dim's
  * surviving join-key values arrive at the fact scan AFTER the
  * broadcast materializes and prune through the same manifest
  * machinery as static predicates — key values hash to their buckets
  * driver-side, other columns prune files by min/max stats and Bloom
  * sidecars. These specs assert the DPP subquery is actually planned
  * (`runtimeFilters` on the BatchScanExec), that the executed scan
  * read FEWER files than the table holds, and that results stay
  * value-exact — plus the no-pruning fallbacks.
  */
class GraftRuntimeFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("dpp-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.gdpp",
      classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.gdpp.warehouse", wh)
    // deterministic plan inspection: the broadcast join (DPP's reuse
    // vehicle) must survive planning, AQE would wrap the scan nodes
    .config("spark.sql.adaptive.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Executes, then reports (runtime-filter count, files the scan
    * actually planned after filtering) for the gdpp BatchScanExec.
    */
  private def runAndInspect(df: org.apache.spark.sql.DataFrame)
      : (Int, Int, Array[org.apache.spark.sql.Row]) = {
    val rows = df.collect()
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan
    val scans = plan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "expected a BatchScanExec in the plan")
    val fact = scans.maxBy(_.scan.toBatch.planInputPartitions().length)
    val files = fact.scan.toBatch.planInputPartitions().collect {
      case fp: FilePartition => fp.files.length
    }.sum
    (fact.runtimeFilters.length, files, rows)
  }

  private def factFiles(): Int = {
    val scan = spark.table("gdpp.ns.fact")
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
    scan.scan.toBatch.planInputPartitions().collect {
      case fp: FilePartition => fp.files.length
    }.sum
  }

  private def mkTables(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdpp.ns")
    spark.sql("CREATE TABLE IF NOT EXISTS gdpp.ns.fact " +
      "(id BIGINT, grp BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='16', 'bloomBy'='grp')")
    if (spark.table("gdpp.ns.fact").isEmpty)
      spark.sql("INSERT INTO gdpp.ns.fact " +
        "SELECT id, id % 50, id * 3 FROM range(20000)")
    spark.range(0, 20000, 1000) // 20 dim rows, 2 flagged
      .selectExpr("id", "id % 10000 = 1000 AS flag")
      .createOrReplaceTempView("dim")
  }

  test("dim join keys prune the fact scan to their hash buckets") {
    mkTables()
    val all = factFiles()
    val df = spark.sql("SELECT f.id, f.v FROM gdpp.ns.fact f " +
      "JOIN dim d ON f.id = d.id WHERE d.flag")
    val (nFilters, files, rows) = runAndInspect(df)
    assert(nFilters > 0, "expected a DPP runtime filter on the fact scan")
    assert(files < all,
      s"runtime filter must prune fact files: opened $files of $all")
    // dim's flagged keys are exactly 1000 and 11000
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1000L, 11000L))
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) * 3))
  }

  test("a join on a NON-key column prunes files by min/max stats") {
    mkTables()
    // a grp-clustered layout (sorted within buckets, split at 1000
    // rows) gives each file a NARROW grp range — per-file stats make
    // grp genuinely file-selective (unlike fact, where every file holds
    // every grp). The dim's filter uses a shape the optimizer cannot
    // constant-fold into a static fact-side literal (pmod), so the
    // ONLY pruning vehicle is the runtime join-key set.
    spark.sql("CREATE TABLE IF NOT EXISTS gdpp.ns.fact2 " +
      "(id BIGINT, grp BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('keys'='id', 'buckets'='4', 'clusterBy'='grp')")
    if (spark.table("gdpp.ns.fact2").isEmpty) {
      // each bucket rewrite sorts by grp (clusterBy) and splits at 1000
      // rows — per-file grp ranges come out narrow
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "1000")
      try
        spark.sql("INSERT INTO gdpp.ns.fact2 SELECT id, " +
          "CAST(id / 400 AS BIGINT), id FROM range(20000)")
      finally spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    }
    val all = spark.table("gdpp.ns.fact2")
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
      .scan.toBatch.planInputPartitions().collect {
        case fp: FilePartition => fp.files.length
      }.sum
    spark.range(0, 50).selectExpr("id AS g")
      .where("pmod(g, 997) = 7") // runtime value set: {7}
      .createOrReplaceTempView("gdim")
    val df = spark.sql("SELECT f.id, f.grp FROM gdpp.ns.fact2 f " +
      "JOIN gdim d ON f.grp = d.g")
    val (nFilters, files, rows) = runAndInspect(df)
    assert(nFilters > 0, "expected a DPP runtime filter on grp")
    // only epoch 0's files hold grp ∈ [0, 10) ∋ 7
    assert(files < all, s"stats must prune epochs: opened $files of $all")
    assert(rows.length == 400 && rows.forall(_.getLong(1) == 7L))
  }

  test("a runtime-empty build side returns zero rows, no planning failure") {
    mkTables()
    // statically non-empty (PropagateEmptyRelation must not collapse
    // the join); empty only at RUNTIME
    spark.range(0, 20000, 1000).selectExpr("id")
      .where("pmod(id, 999983) = 17") // no survivor
      .createOrReplaceTempView("edim")
    val df = spark.sql("SELECT f.id FROM gdpp.ns.fact f " +
      "JOIN edim d ON f.id = d.id")
    val (_, files, rows) = runAndInspect(df)
    assert(rows.isEmpty)
    assert(files >= 0)
  }

  test("runtime filtering composes with SPJ: keys preserved, still pruned") {
    mkTables()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val all = factFiles()
      val df = spark.sql("SELECT f.id, f.v FROM gdpp.ns.fact f " +
        "JOIN dim d ON f.id = d.id WHERE d.flag")
      val (nFilters, files, rows) = runAndInspect(df)
      assert(nFilters > 0)
      assert(files < all)
      assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1000L, 11000L))
    } finally
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("with DPP disabled the scan opens every file (and still answers)") {
    mkTables()
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "false")
    try {
      val all = factFiles()
      val df = spark.sql("SELECT f.id, f.v FROM gdpp.ns.fact f " +
        "JOIN dim d ON f.id = d.id WHERE d.flag")
      val (nFilters, files, rows) = runAndInspect(df)
      assert(nFilters == 0)
      assert(files == all)
      assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1000L, 11000L))
    } finally
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
        "true")
  }
}
