package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{
  UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** DECLARATIVE MATERIALIZED VIEWS with incremental refresh (the
  * reference's insights-snapshot pattern,
  * `extract_flomatika_insights_processor.ts:328-473`, generalized the
  * way warehouse MVs generalize hand-rolled rollups): a defining
  * aggregation query is recorded ONCE, the result is a first-class
  * graft table (SELECT / time travel / describe all work), and
  * `refresh` maintains it OFF THE CHANGE FEED — cost ∝ rows changed
  * since the last refresh, never ∝ the source corpus. This subsumes
  * the q127 hand-rolled incremental rollup: what was a bespoke
  * pipeline becomes one `CALL gc.system.create_mv` + `refresh_mv`.
  *
  * MAINTAINABLE SHAPE (the classic self-maintainable fragment):
  * `SELECT <group cols>, <aggs> FROM <source> [WHERE pred] GROUP BY
  * <group cols>` with aggs drawn from COUNT(*) / COUNT(col) /
  * SUM(col), COUNT(*) required (it carries group liveness — a group
  * whose last row leaves must VANISH from the view, not linger as a
  * zero row). AVG = SUM + COUNT, divide at read. Anything else is
  * rejected at create WITH the reason — a silently-full-recompute
  * "incremental" MV would be a lie at 100 TB.
  *
  * REFRESH (exact, atomic, change-proportional):
  * 1. the source's change feed from the refreshed-through version to
  *    its head (bucket-pruned, fingerprint-paired — I/O ∝ changed
  *    rows);
  * 2. ±1-signed contribution images per CDC row — an insert adds its
  *    new image, a delete subtracts its old, an update does both —
  *    each side independently re-filtered by the MV's WHERE (a
  *    predicate flip alone moves a row in or out of the view);
  * 3. delta-aggregate by group, folded against the MV's current rows
  *    for exactly the touched groups (a bounded point read);
  * 4. ONE atomic mixed commit: live groups upsert, vanished groups
  *    delete, and the refreshed-through version rides the commit's
  *    txn ledger — exactly-once under replay/crash, like every
  *    additive consumer of the feed.
  *
  * If retention dropped the refresh window, refresh falls back to ONE
  * full re-evaluation (logged in the returned window as from = -1) —
  * correct always, incremental whenever the feed allows. Group
  * columns are the MV's merge keys (keyed-table invariants: non-null,
  * one row per group); SUM columns are 0-seeded (an all-NULL group
  * reports 0 — the classic maintainable-MV concession, documented).
  */
object MaterializedViews {

  /** One parsed aggregate of the defining query: `fn` ∈ count_star /
    * count / sum; `col` empty for count_star.
    */
  private[sources] case class MvAgg(fn: String, col: String, alias: String)

  private[sources] case class MvDef(source: String, query: String,
                                    groupCols: Seq[String],
                                    aggs: Seq[MvAgg],
                                    whereSql: Option[String],
                                    createdVersion: Long)

  private val MvFileName = "_mv.json"
  private def txnApp(source: String): String = s"mv:$source"

  // ---- defining-query parsing ---------------------------------------------

  /** Parse + validate the defining query into the maintainable
    * fragment, rejecting anything the incremental algorithm cannot
    * maintain exactly.
    */
  private[sources] def parseDefinition(spark: SparkSession, query: String,
                                       sourceName: String)
      : (Seq[String], Seq[MvAgg], Option[String]) = {
    val plan = spark.sessionState.sqlParser.parsePlan(query)
    def fail(why: String): Nothing =
      throw new IllegalArgumentException(
        s"create_mv: defining query is not incrementally maintainable — " +
          s"$why. Maintainable shape: SELECT <group cols>, COUNT(*), " +
          "[COUNT(col) / SUM(col) AS alias ...] FROM <source> " +
          "[WHERE pred] GROUP BY <group cols> (AVG = SUM + COUNT, " +
          "divide at read)")
    val agg = plan match {
      case a: Aggregate => a
      case _ => fail("it is not a single GROUP BY aggregation")
    }
    val (rel, whereSql) = agg.child match {
      case Filter(cond, r: UnresolvedRelation) => (r, Some(cond.sql))
      case r: UnresolvedRelation => (r, None)
      case _ => fail("FROM must be the source table (no joins/subqueries)")
    }
    if (!rel.multipartIdentifier.last.equalsIgnoreCase(
        sourceName.split('.').last))
      fail(s"FROM names '${rel.multipartIdentifier.mkString(".")}' but " +
        s"the declared source is '$sourceName'")
    def attrName(e: Expression): String = e match {
      case u: UnresolvedAttribute if u.nameParts.length == 1 =>
        u.nameParts.head
      case _ => fail(s"group/agg column '${e.sql}' must be a plain column")
    }
    val groupCols = agg.groupingExpressions.map(attrName)
    if (groupCols.isEmpty) fail("GROUP BY is required (a global " +
      "aggregate has no merge key to maintain under)")
    val aggs = agg.aggregateExpressions.flatMap {
      case u: UnresolvedAttribute =>
        val n = attrName(u)
        if (!groupCols.exists(_.equalsIgnoreCase(n)))
          fail(s"output column '$n' is neither a group column nor an " +
            "aliased aggregate")
        None
      case Alias(child, alias) => Some(parseAgg(child, alias, fail))
      case other => fail(s"aggregate '${other.sql}' needs an alias " +
        "(the MV table's column name)")
    }
    if (!aggs.exists(_.fn == "count_star"))
      fail("include COUNT(*) — it carries group liveness (a group " +
        "whose last row leaves must vanish from the view)")
    val dup = (groupCols ++ aggs.map(_.alias))
      .groupBy(_.toLowerCase).collectFirst { case (n, vs) if vs.size > 1 => n }
    dup.foreach(n => fail(s"duplicate output column '$n'"))
    (groupCols, aggs, whereSql)
  }

  private def parseAgg(e: Expression, alias: String,
                       fail: String => Nothing): MvAgg = e match {
    case f: UnresolvedFunction =>
      val fn = f.nameParts.last.toLowerCase
      (fn, f.arguments) match {
        case ("count", Seq(Literal(1, _))) => MvAgg("count_star", "", alias)
        case ("count", Seq(u: UnresolvedAttribute))
            if u.nameParts.length == 1 =>
          MvAgg("count", u.nameParts.head, alias)
        case ("sum", Seq(u: UnresolvedAttribute))
            if u.nameParts.length == 1 =>
          MvAgg("sum", u.nameParts.head, alias)
        case _ => fail(s"aggregate '${e.sql}' — only COUNT(*), " +
          "COUNT(col) and SUM(col) are maintainable")
      }
    case _ => fail(s"'$alias' must be a COUNT(*) / COUNT(col) / SUM(col)")
  }

  // ---- definition persistence ----------------------------------------------

  private def writeDef(fs: FileSystem, mvPath: String, d: MvDef): Unit = {
    def js(s: String) =
      com.fasterxml.jackson.databind.node.TextNode.valueOf(s).toString
    val body = "{\"source\":" + js(d.source) +
      ",\"query\":" + js(d.query) +
      ",\"group\":[" + d.groupCols.map(js).mkString(",") + "]" +
      ",\"aggs\":[" + d.aggs.map(a => "{\"fn\":" + js(a.fn) +
        ",\"col\":" + js(a.col) + ",\"alias\":" + js(a.alias) + "}")
        .mkString(",") + "]" +
      d.whereSql.map(w => ",\"where\":" + js(w)).getOrElse("") +
      ",\"createdv\":" + d.createdVersion + "}"
    val p = new Path(s"$mvPath/$MvFileName")
    val out = fs.create(p, false) // exclusive: one definition, immutable
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private[sources] def readDef(spark: SparkSession, mvPath: String): MvDef = {
    val fs = new Path(mvPath).getFileSystem(
      spark.sessionState.newHadoopConf())
    val p = new Path(s"$mvPath/$MvFileName")
    require(fs.exists(p), s"$mvPath is not a materialized view (no " +
      "recorded definition)")
    val in = fs.open(p)
    val body = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 8192, false)
      bos.toString("UTF-8")
    } finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(body)
    val aggsN = node.get("aggs")
    MvDef(node.get("source").asText(), node.get("query").asText(),
      (0 until node.get("group").size())
        .map(node.get("group").get(_).asText()),
      (0 until aggsN.size()).map { i =>
        val a = aggsN.get(i)
        MvAgg(a.get("fn").asText(), a.get("col").asText(),
          a.get("alias").asText())
      },
      Option(node.get("where")).map(_.asText()),
      node.get("createdv").asLong())
  }

  // ---- create / refresh / status -------------------------------------------

  /** The defining aggregation evaluated over a source frame — the one
    * full evaluation at create, and the rare retention-fallback path.
    */
  private def evaluate(src: DataFrame, groupCols: Seq[String],
                       aggs: Seq[MvAgg],
                       whereSql: Option[String]): DataFrame = {
    val filtered = whereSql.fold(src)(w => src.where(expr(w)))
    def aggExpr(a: MvAgg) = a.fn match {
      case "count_star" => count(lit(1)).as(a.alias)
      case "count" => count(col(a.col)).as(a.alias)
      // 0-seeded (see object doc): additive maintenance cannot tell
      // "all-NULL group" from "empty contribution"
      case "sum" => coalesce(sum(col(a.col)), lit(0)).as(a.alias)
    }
    filtered.groupBy(groupCols.map(col): _*)
      .agg(aggExpr(aggs.head), aggs.tail.map(aggExpr): _*)
  }

  /** Create the MV: parse + validate the defining query, evaluate it
    * ONCE over the source's current version, and commit the result as
    * a keyed graft table whose txn ledger records the
    * refreshed-through source version — the atomic exactly-once anchor
    * every later refresh advances.
    */
  def create(spark: SparkSession, mvPath: String, sourcePath: String,
             sourceName: String, query: String, buckets: Int = 16): Unit = {
    val (groupCols, aggs, whereSql0) =
      parseDefinition(spark, query, sourceName)
    val srcMan = MergeWriter.pinManifest(spark, sourcePath, None, None)
      .getOrElse(throw new IllegalArgumentException(
        s"create_mv: source $sourcePath is not a graft table"))
    require(srcMan.keyCols.nonEmpty,
      s"create_mv: source $sourcePath records no merge keys — the " +
        "change feed that drives refresh is keyed")
    val src = MergeWriter.readTable(spark, sourcePath)
    // validate the WHERE against the SOURCE schema NOW — a qualified
    // (`src.x`) or unknown reference must fail at create with the
    // reason, not at the first refresh's feed projection (the
    // CHECK-constraint rule: normalize qualifiers, reject unknowns)
    val whereSql = whereSql0.map { w =>
      val refs = MergeWriter.checkPredicateColumns(spark, w, src.schema)
      val unknown = refs.filterNot(r =>
        src.schema.fieldNames.exists(_.equalsIgnoreCase(r)))
      if (unknown.nonEmpty) throw new IllegalArgumentException(
        s"create_mv: WHERE references unknown column(s) " +
          s"${unknown.mkString(", ")} — source columns: " +
          src.schema.fieldNames.mkString(", "))
      MergeWriter.normalizeCheckSql(spark, w, src.schema)
    }
    val fs = new Path(mvPath).getFileSystem(
      spark.sessionState.newHadoopConf())
    val root = new Path(mvPath)
    require(!MergeWriter.hasManifest(fs, root),
      s"create_mv: $mvPath already holds a table")
    // a definition file WITHOUT a table is a crashed create's remnant
    // (the definition is written last, below) — clear it so create is
    // re-runnable
    val defP = new Path(s"$mvPath/$MvFileName")
    if (fs.exists(defP)) fs.delete(defP, false)
    val initial = evaluate(src, groupCols, aggs, whereSql)
    val preExisted = fs.exists(root)
    fs.mkdirs(root)
    try {
      // table + initial rows first (the merge's txn ledger carries the
      // refreshed-through anchor — even an empty initial result records
      // it, the empty-changeset rule)
      MergeWriter.createTable(spark, mvPath, initial.schema, groupCols,
        buckets = buckets, clusterBy = groupCols.take(1))
      MergeWriter.merge(spark, mvPath, initial, groupCols,
        txn = Some((txnApp(sourcePath), srcMan.version)))
    } catch {
      case e: Throwable =>
        if (!preExisted) fs.delete(root, true)
        throw e
    }
    // definition LAST: its presence marks a COMPLETE MV (table +
    // anchored initial rows already committed). A crash anywhere above
    // leaves a path readDef rejects loudly — never an anchor-less MV
    // that refresh would silently fold deltas into.
    writeDef(fs, mvPath, MvDef(sourcePath, query, groupCols, aggs,
      whereSql, srcMan.version))
  }

  /** Incremental refresh: advance the MV to the source's head off the
    * change feed. Returns the applied (from, to) window — from = -1
    * marks the retention-fallback full re-evaluation — or None when
    * already fresh. Replay-safe: the txn ledger skips an
    * already-folded window.
    */
  def refresh(spark: SparkSession, mvPath: String): Option[(Long, Long)] = {
    val d = readDef(spark, mvPath)
    val srcMan = MergeWriter.pinManifest(spark, d.source, None, None)
      .getOrElse(throw new IllegalStateException(
        s"refresh_mv: source ${d.source} lost its manifest"))
    val mvMan = MergeWriter.pinManifest(spark, mvPath, None, None)
      .getOrElse(throw new IllegalStateException(
        s"refresh_mv: $mvPath lost its manifest"))
    // the anchor is written by create's initial merge and advanced by
    // every refresh — its ABSENCE means the MV's create never completed
    // (or the ledger was lost). Trusting createdVersion here would fold
    // deltas into a base that never held the initial evaluation.
    val from = mvMan.txns.getOrElse(txnApp(d.source),
      throw new IllegalStateException(
        s"refresh_mv: $mvPath has no '${txnApp(d.source)}' anchor in " +
          "its txn ledger — the create did not complete; drop the path " +
          "and re-create the MV"))
    val to = srcMan.version
    if (to <= from) return None
    // retention fallback: a window whose base version aged out cannot
    // diff — ONE full re-evaluation (correct always, incremental
    // whenever the feed allows), same txn anchor
    if (!MergeWriter.availableVersions(spark, d.source).contains(from)) {
      val full = evaluate(MergeWriter.readTable(spark, d.source),
        d.groupCols, d.aggs, d.whereSql)
      MergeWriter.overwriteTable(spark, mvPath, full, d.groupCols,
        txn = Some((txnApp(d.source), to)))
      return Some((-1L, to))
    }
    val keys = srcMan.keyCols
    // the feed carries every column the definition touches (group +
    // agg + WHERE references); merge keys ride plain
    val whereCols = d.whereSql.toSeq.flatMap(w =>
      spark.sessionState.sqlParser.parseExpression(w).collect {
        case a: UnresolvedAttribute => a.nameParts.head
      })
    val needed = (d.groupCols ++ d.aggs.map(_.col).filter(_.nonEmpty) ++
      whereCols).distinct.filterNot(keys.contains)
    val feed = MergeWriter.changeFeed(spark, d.source, from, to, keys,
      needed)
    // ±1-signed contribution images: old for update/delete, new for
    // update/insert, each side re-filtered by the MV's WHERE
    def side(prefix: String, ops: Seq[String], sign: Int): DataFrame = {
      val img = feed.where(col("op").isin(ops: _*))
        .select((keys.map(col) ++
          needed.map(c => col(s"$prefix$c").as(c)) :+
          lit(sign).as("__sign")): _*)
      d.whereSql.fold(img)(w => img.where(expr(w)))
    }
    val signed = side("old_", Seq("update", "delete"), -1)
      .unionByName(side("new_", Seq("update", "insert"), 1))
    val deltaAggs = d.aggs.map { a =>
      a.fn match {
        case "count_star" => sum(col("__sign")).as(a.alias)
        case "count" => sum(when(col(a.col).isNotNull, col("__sign"))
          .otherwise(0)).as(a.alias)
        case "sum" => sum(when(col(a.col).isNotNull,
          col(a.col) * col("__sign")).otherwise(lit(0))).as(a.alias)
      }
    }
    // persisted: the emptiness probe, the point-read keying and the
    // fold all consume it — without the cache each would recompute the
    // full feed diff
    val delta = signed.groupBy(d.groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*).persist()
    try {
      refreshWithDelta(spark, mvPath, d, delta, from, to)
    } finally { delta.unpersist(); () }
  }

  /** Touched-group cap: past it the point-read keying (a bounded
    * driver collect by contract) stops being bounded, so the refresh
    * re-evaluates fully instead — for a churn that big the full
    * evaluation is competitive anyway.
    */
  private val MaxIncrementalGroups = 100000L

  private def refreshWithDelta(spark: SparkSession, mvPath: String,
                               d: MvDef, delta: DataFrame,
                               from: Long, to: Long): Option[(Long, Long)] = {
    // bounded size probe: 0 / incremental / too-big in one job
    val probe = delta.limit((MaxIncrementalGroups + 1).toInt).count()
    // an advanced source version with an empty contribution (e.g. a
    // churn outside the WHERE) must still move the anchor, or every
    // later refresh re-diffs the same window
    if (probe == 0L) {
      MergeWriter.recordTxn(spark, mvPath, (txnApp(d.source), to))
      return Some((from, to))
    }
    if (probe > MaxIncrementalGroups) {
      val full = evaluate(MergeWriter.readTable(spark, d.source),
        d.groupCols, d.aggs, d.whereSql)
      MergeWriter.overwriteTable(spark, mvPath, full, d.groupCols,
        txn = Some((txnApp(d.source), to)))
      return Some((-1L, to))
    }
    // current MV rows for exactly the touched groups (bounded point
    // read), folded, then ONE atomic mixed commit: live groups upsert,
    // vanished groups delete, the version anchor in the same ledger
    val mvSchema: StructType = MergeWriter.readTable(spark, mvPath).schema
    val cur = MergeWriter.readKeys(spark, mvPath,
      delta.select(d.groupCols.map(col): _*), d.groupCols)
    val starAlias = d.aggs.find(_.fn == "count_star").get.alias
    // cur's plan CONTAINS delta (the point read is keyed by it) — a
    // name-prefixed projection breaks the self-join ambiguity
    val dd = delta.select((d.groupCols ++ d.aggs.map(_.alias))
      .map(c => col(c).as(s"__d_$c")): _*)
    val folded = cur.join(dd,
        d.groupCols.map(c => col(c) <=> col(s"__d_$c")).reduce(_ && _),
        "full_outer")
      .select((d.groupCols.map(c =>
          coalesce(col(c), col(s"__d_$c")).as(c)) ++
        d.aggs.map { a =>
          (coalesce(col(a.alias), lit(0)) +
            coalesce(col(s"__d_${a.alias}"), lit(0)))
            .cast(mvSchema(a.alias).dataType).as(a.alias)
        }): _*)
    val ups = folded.where(col(starAlias) > 0)
    val dels = folded.where(col(starAlias) <= 0)
      .select(d.groupCols.map(col): _*)
    MergeWriter.applyChanges(spark, mvPath, ups, dels, d.groupCols,
      opName = "refresh_mv", txn = Some((txnApp(d.source), to)))
    Some((from, to))
  }

  /** Freshness probe: (source path, refreshed-through version, source
    * current version). Fresh ⇔ the two versions match.
    */
  def status(spark: SparkSession, mvPath: String): (String, Long, Long) = {
    val d = readDef(spark, mvPath)
    val mvMan = MergeWriter.pinManifest(spark, mvPath, None, None)
      .getOrElse(throw new IllegalStateException(
        s"mv_status: $mvPath lost its manifest"))
    val srcV = MergeWriter.pinManifest(spark, d.source, None, None)
      .map(_.version).getOrElse(-1L)
    (d.source, mvMan.txns.getOrElse(txnApp(d.source), d.createdVersion),
      srcV)
  }
}
