package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Transparent materialized-view query rewrite (MvRewriteRule via
  * GraftSessionExtensions + the live-session experimental hook): an
  * aggregate that is STRUCTURALLY a registered fresh MV's defining
  * query reads the view instead of the source. The contract under
  * test: rewrites fire only on exact structural + freshness matches,
  * results are always identical to running the aggregate as written,
  * and every non-match (stale view, different WHERE, unsupported
  * aggregate, disabled conf, pinned read) silently runs the original
  * plan.
  */
class MvRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val wh = Files.createTempDirectory("gmvr-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the session-build injection path; enable_mv_rewrite additionally
    // exercises the live-session experimental hook
    .config("spark.sql.extensions",
      classOf[graft.sources.GraftSessionExtensions].getName)
    .config("spark.sql.catalog.gmvr",
      classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.gmvr.warehouse", wh)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def aggCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.size

  /** True when the optimized plan kept NO aggregate — the MV answered. */
  private def rewritten(df: DataFrame): Boolean = aggCount(df) == 0

  private def rows(df: DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).toSet

  test("an exact-match aggregate over a FRESH registered MV reads the " +
       "view (no Aggregate in the plan), with free output aliases; " +
       "staleness, refresh, and disable flow through") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmvr.ns")
    spark.sql("CREATE TABLE gmvr.ns.src (id BIGINT, grp STRING, " +
      "v BIGINT) TBLPROPERTIES ('keys'='id', 'buckets'='2', " +
      "'retainVersions'='20')")
    spark.sql("INSERT INTO gmvr.ns.src SELECT id, CONCAT('g', id % 5), " +
      "id * 3 FROM range(0, 200)")
    // COUNT(v) rides along so the nullable SUM is reconstructible
    spark.sql("CALL gmvr.system.create_mv(view => 'ns.mv', " +
      "source => 'ns.src', query => 'SELECT grp, COUNT(*) AS n, " +
      "SUM(v) AS sv, COUNT(v) AS nv FROM src GROUP BY grp')")
    val q = "SELECT grp, COUNT(*) AS total, SUM(v) AS vsum " +
      "FROM gmvr.ns.src GROUP BY grp"
    val direct = rows(spark.sql(q))
    assert(!rewritten(spark.sql(q)), "not registered yet: no rewrite")
    spark.sql("CALL gmvr.system.enable_mv_rewrite(view => 'ns.mv')")
    val rdf = spark.sql(q)
    assert(rewritten(rdf), s"fresh registered MV must answer:\n" +
      rdf.queryExecution.optimizedPlan)
    assert(rows(rdf) == direct, "rewritten result must equal direct")
    // STALE: a source commit without refresh must NOT rewrite, and the
    // as-written aggregate sees the new rows
    spark.sql("INSERT INTO gmvr.ns.src VALUES (1000, 'g1', 7)")
    val sdf = spark.sql(q)
    assert(!rewritten(sdf), "a stale view must decline")
    assert(rows(sdf) != direct, "the as-written aggregate sees new rows")
    // refresh → rewrites again, with the folded rows
    spark.sql("CALL gmvr.system.refresh_mv(view => 'ns.mv')")
    val rdf2 = spark.sql(q)
    assert(rewritten(rdf2), "fresh again after refresh")
    assert(rows(rdf2) == rows(sdf), "rewritten equals as-written")
    // conf kill-switch, then unregister
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try assert(!rewritten(spark.sql(q)), "conf off: no rewrite")
    finally spark.conf.unset("spark.graft.mv.rewrite")
    assert(rewritten(spark.sql(q)))
    spark.sql("CALL gmvr.system.disable_mv_rewrite(view => 'ns.mv')")
    assert(!rewritten(spark.sql(q)), "disabled: no rewrite")
    spark.sql("CALL gmvr.system.enable_mv_rewrite(view => 'ns.mv')")
  }

  test("non-matches decline silently: different WHERE, unsupported " +
       "aggregate, different grouping, time-travel pin") {
    val q0 = "SELECT grp, COUNT(*) AS n, SUM(v) AS sv " +
      "FROM gmvr.ns.src GROUP BY grp"
    assert(rewritten(spark.sql(q0)), "baseline: exact match rewrites")
    assert(!rewritten(spark.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM gmvr.ns.src " +
        "WHERE v > 10 GROUP BY grp")), "extra WHERE declines")
    assert(!rewritten(spark.sql(
      "SELECT grp, COUNT(DISTINCT v) AS n, SUM(v) AS sv " +
        "FROM gmvr.ns.src GROUP BY grp")), "DISTINCT declines")
    assert(!rewritten(spark.sql(
      "SELECT grp, COUNT(*) AS n, AVG(v) AS av FROM gmvr.ns.src " +
        "GROUP BY grp")), "AVG (not in the view) declines")
    assert(!rewritten(spark.sql(
      "SELECT grp, v % 2 AS par, COUNT(*) AS n FROM gmvr.ns.src " +
        "GROUP BY grp, v % 2")), "different grouping declines")
    assert(!rewritten(spark.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS sv " +
        "FROM gmvr.ns.src VERSION AS OF 1 GROUP BY grp")),
      "a pinned read never rewrites")
  }

  test("a WHERE'd MV matches its WHERE exactly (canonicalized conjunct " +
       "set, tolerating optimizer-inferred IsNotNull); the 0-seeded " +
       "SUM reconstructs NULL for an all-NULL group via COUNT(col)") {
    spark.sql("CREATE TABLE gmvr.ns.wsrc (id BIGINT, grp STRING, " +
      "v BIGINT) TBLPROPERTIES ('keys'='id', 'buckets'='2', " +
      "'retainVersions'='20')")
    // group g9 holds ONLY NULL v values — its true SUM is NULL
    spark.sql("INSERT INTO gmvr.ns.wsrc SELECT id, CONCAT('g', id % 3), " +
      "CASE WHEN id % 3 = 0 THEN CAST(NULL AS BIGINT) ELSE id END " +
      "FROM range(0, 90)")
    spark.sql("CALL gmvr.system.create_mv(view => 'ns.wmv', " +
      "source => 'ns.wsrc', query => 'SELECT grp, COUNT(*) AS n, " +
      "SUM(v) AS sv, COUNT(v) AS nv FROM wsrc WHERE id < 60 " +
      "GROUP BY grp')")
    spark.sql("CALL gmvr.system.enable_mv_rewrite(view => 'ns.wmv')")
    val q = "SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM gmvr.ns.wsrc " +
      "WHERE id < 60 GROUP BY grp"
    val rdf = spark.sql(q)
    assert(rewritten(rdf), s"matching WHERE must rewrite:\n" +
      rdf.queryExecution.optimizedPlan)
    val direct = spark.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM (SELECT id, grp, v " +
        "FROM gmvr.ns.wsrc) WHERE id < 60 GROUP BY grp")
    assert(rows(rdf) == rows(direct),
      "rewritten equals as-written, incl. the all-NULL group's NULL sum")
    assert(rdf.collect().exists(_.isNullAt(2)),
      "the all-NULL group must surface SUM = NULL, not the stored 0")
    // a different bound on the same column declines
    assert(!rewritten(spark.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM gmvr.ns.wsrc " +
        "WHERE id < 50 GROUP BY grp")), "different WHERE bound declines")
  }

  test("GROUP-COLUMN residual conjuncts evaluate on the view (the " +
       "rollup-point-query shape); non-group residuals decline") {
    // over the no-WHERE MV on ns.src (registered in test 1)
    val q = "SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM gmvr.ns.src " +
      "WHERE grp = 'g1' GROUP BY grp"
    val rdf = spark.sql(q)
    assert(rewritten(rdf),
      s"a group-column WHERE must rewrite with a view-side residual:\n" +
        rdf.queryExecution.optimizedPlan)
    val direct = spark.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM (SELECT grp, v " +
        "FROM gmvr.ns.src) WHERE grp = 'g1' GROUP BY grp")
    assert(rows(rdf) == rows(direct), "residual rewrite must be exact")
    // composes over a WHERE'd MV too: matching base WHERE + group
    // residual (ns.wmv: WHERE id < 60 GROUP BY grp)
    val qw = "SELECT grp, COUNT(*) AS n, SUM(v) AS sv " +
      "FROM gmvr.ns.wsrc WHERE id < 60 AND grp IN ('g0', 'g1') " +
      "GROUP BY grp"
    val rdw = spark.sql(qw)
    assert(rewritten(rdw), s"base WHERE + group residual must " +
      s"rewrite:\n${rdw.queryExecution.optimizedPlan}")
    val dirw = spark.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM (SELECT id, grp, v " +
        "FROM gmvr.ns.wsrc) WHERE id < 60 AND grp IN ('g0', 'g1') " +
        "GROUP BY grp")
    assert(rows(rdw) == rows(dirw))
    // a residual touching a NON-group column cannot commute: decline
    assert(!rewritten(spark.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM gmvr.ns.src " +
        "WHERE grp = 'g1' AND v > 0 GROUP BY grp")),
      "a non-group residual must decline")
  }

  test("ROLLUP rewrite: a subset (or empty) grouping re-aggregates the " +
       "VIEW — counts sum, sums sum (0-seed reconstructed through the " +
       "summed COUNT rider), extrema re-extremize; residuals on a " +
       "non-queried view group column filter view rows first") {
    spark.sql("CREATE TABLE gmvr.ns.rsrc (id BIGINT, grp STRING, " +
      "par BIGINT, v BIGINT) TBLPROPERTIES ('keys'='id', 'buckets'='2', " +
      "'retainVersions'='20')")
    // grp g2 × par 1 holds only NULL v — exercises the rollup's
    // NULL-sum reconstruction through the SUMMED rider
    spark.sql("INSERT INTO gmvr.ns.rsrc SELECT id, " +
      "CONCAT('g', id % 3), id % 2, " +
      "CASE WHEN id % 6 = 5 THEN CAST(NULL AS BIGINT) ELSE id END " +
      "FROM range(0, 120)")
    spark.sql("CALL gmvr.system.create_mv(view => 'ns.rmv', " +
      "source => 'ns.rsrc', query => 'SELECT grp, par, COUNT(*) AS n, " +
      "SUM(v) AS sv, COUNT(v) AS nv, MIN(v) AS mn, MAX(v) AS mx " +
      "FROM rsrc GROUP BY grp, par')")
    spark.sql("CALL gmvr.system.enable_mv_rewrite(view => 'ns.rmv')")
    def readsView(df: DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("ns/rmv")
    def srcAggs(df: DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("ns/rsrc")
    // subset grouping
    val q1 = "SELECT grp, COUNT(*) AS n, SUM(v) AS sv, MIN(v) AS mn, " +
      "MAX(v) AS mx FROM gmvr.ns.rsrc GROUP BY grp"
    val r1 = spark.sql(q1)
    assert(readsView(r1) && !srcAggs(r1),
      s"subset grouping must roll up the view:\n" +
        r1.queryExecution.executedPlan)
    val d1 = spark.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS sv, MIN(v) AS mn, " +
        "MAX(v) AS mx FROM (SELECT grp, v FROM gmvr.ns.rsrc) GROUP BY grp")
    assert(r1.collect().map(_.toSeq).toSet ==
      d1.collect().map(_.toSeq).toSet, "rollup must equal direct")
    // GLOBAL aggregate (empty grouping) rolls up too
    val q2 = "SELECT COUNT(*) AS n, SUM(v) AS sv FROM gmvr.ns.rsrc"
    val r2 = spark.sql(q2)
    assert(readsView(r2) && !srcAggs(r2), "global aggregate rolls up")
    assert(r2.collect().head.toSeq ==
      spark.sql("SELECT COUNT(*) AS n, SUM(v) AS sv FROM " +
        "(SELECT v FROM gmvr.ns.rsrc)").collect().head.toSeq)
    // residual on the NON-queried view group column (par) filters view
    // rows before the re-aggregation — and the g2/par=1 all-NULL slice
    // must surface SUM = NULL, not 0
    val q3 = "SELECT grp, COUNT(*) AS n, SUM(v) AS sv " +
      "FROM gmvr.ns.rsrc WHERE par = 1 GROUP BY grp"
    val r3 = spark.sql(q3)
    assert(readsView(r3) && !srcAggs(r3), "par residual rolls up")
    val d3 = spark.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM (SELECT grp, par, v " +
        "FROM gmvr.ns.rsrc) WHERE par = 1 GROUP BY grp")
    assert(r3.collect().map(_.toSeq).toSet ==
      d3.collect().map(_.toSeq).toSet)
    assert(r3.collect().exists(_.isNullAt(2)),
      "the all-NULL slice must roll up to SUM = NULL")
    // a non-view grouping column can never roll up
    val q4 = "SELECT grp, v % 2 AS b, COUNT(*) AS n " +
      "FROM gmvr.ns.rsrc GROUP BY grp, v % 2"
    assert(srcAggs(spark.sql(q4)), "non-view grouping declines")
  }

  test("the V1 format(\"graft\") relation rewrites too (main-head reads " +
       "only — a versionAsOf pin declines)") {
    import org.apache.spark.sql.functions._
    // ns.src + ns.mv registered in test 1; read the same table through
    // the V1 data-source face
    val srcPath = s"$wh/ns/src"
    val v1 = spark.read.format("graft").load(srcPath)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(rewritten(v1),
      s"a main-head V1 read must rewrite:\n" +
        v1.queryExecution.optimizedPlan)
    val direct = spark.sql("SELECT grp, COUNT(*) AS n, SUM(v) AS sv " +
      "FROM (SELECT grp, v FROM gmvr.ns.src) GROUP BY grp")
    assert(rows(v1) == rows(direct), "V1 rewrite must be exact")
    // a PINNED V1 read must never rewrite (the view tracks the head)
    val cur = graft.sources.MergeWriter
      .availableVersions(spark, srcPath).max
    val pinned = spark.read.format("graft")
      .option("versionAsOf", cur.toString).load(srcPath)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(!rewritten(pinned), "a pinned V1 read must decline")
  }
}
