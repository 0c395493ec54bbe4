package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{
  DataSourceV2Relation, DataSourceV2ScanRelation}

/** TRANSPARENT MATERIALIZED-VIEW QUERY REWRITE (the warehouse
  * exact-match substitution — Oracle's QUERY REWRITE, BigQuery's smart
  * tuning — scoped conservatively): an aggregate over a graft source
  * table that is STRUCTURALLY the defining query of a registered,
  * FRESH materialized view reads the view's table instead of
  * re-aggregating the source. At 100 TB the substitution deletes the
  * full scan + shuffle the user would otherwise pay for an answer the
  * engine already maintains change-proportionally.
  *
  * Registration is explicit (`CALL gc.system.enable_mv_rewrite`) and
  * the rewrite is EXACT-by-construction, never best-effort:
  *
  *  - the query's FROM must be the MV's source relation, UNPINNED (a
  *    time-travel/branch read never rewrites), and the MV must be
  *    refreshed through exactly the version that relation pinned at
  *    load — a stale view, or a view ahead of a lagging snapshot,
  *    silently declines and the aggregate runs as written;
  *  - group columns, aggregates (COUNT(*) / COUNT(col) / SUM(col) /
  *    MIN / MAX, no DISTINCT, no FILTER) and the WHERE must match the
  *    recorded definition (WHERE by canonicalized conjunct-set
  *    containment after the same coercion + constant folding the
  *    user's condition went through; optimizer-inferred IsNotNull
  *    conjuncts on columns the definition already constrains are
  *    tolerated, and extra conjuncts referencing ONLY group columns
  *    become residual filters on the VIEW — a group-column predicate
  *    commutes with grouping, so `WHERE grp = 'x'` over a per-grp
  *    view reads one view row instead of scanning the corpus);
  *  - output aliases are free — the projection restores each output's
  *    original name, exprId, type and nullability contract;
  *  - the MV's 0-seeded SUM concession is reconstructed, not leaked: a
  *    nullable SUM column rewrites only when the view also records
  *    COUNT(col) (`CASE WHEN cnt = 0 THEN NULL ELSE sum END`), or the
  *    source column is non-nullable;
  *  - dim-joined MVs do not participate (join matching is a wider
  *    equivalence problem than this exact-match fragment).
  *
  * Two injection paths: `spark.sql.extensions =
  * graft.sources.GraftSessionExtensions` at session build (the rule
  * then runs in the operator-optimization batch over the un-pushed
  * DSv2 relation), or — because extensions cannot attach to a live
  * session — `enable_mv_rewrite` also registers the rule through the
  * public `spark.experimental.extraOptimizations` hook, where it runs
  * in the late user batch over the pushed scan relation; both shapes
  * match. `spark.graft.mv.rewrite = false` turns the rewrite off
  * without unregistering.
  */
object MvRewrite {

  // sourcePath -> registered mvPaths; mvPath -> its (immutable)
  // definition. Definitions never change after create, so caching them
  // forever is exact; freshness is checked per rewrite.
  private val bySource =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()
  private val defs = new java.util.concurrent.ConcurrentHashMap[
    String, MaterializedViews.MvDef]()

  def enable(spark: SparkSession, mvPath: String): Unit = {
    val d = MaterializedViews.readDef(spark, mvPath)
    require(d.dims.isEmpty,
      "enable_mv_rewrite: only source-only MVs (no dim joins) " +
        "participate in exact-match rewrite")
    defs.put(mvPath, d)
    bySource.merge(d.source, Set(mvPath), (a, b) => a ++ b)
    // a live session cannot gain extensions — attach through the
    // public experimental hook (the extensions path adds its own
    // instance at session build; a duplicate run is an idempotent
    // no-op, the second pass sees no matching Aggregate)
    val xs = spark.experimental.extraOptimizations
    if (!xs.exists(_.isInstanceOf[MvRewriteRule]))
      spark.experimental.extraOptimizations = xs :+ MvRewriteRule(spark)
  }

  def disable(mvPath: String): Unit = {
    Option(defs.remove(mvPath)).foreach { d =>
      bySource.computeIfPresent(d.source, (_, s) => {
        val n = s - mvPath
        if (n.isEmpty) null else n
      })
    }
  }

  private[sources] def isEmpty: Boolean = bySource.isEmpty

  private[sources] def candidates(sourcePath: String)
      : Seq[(String, MaterializedViews.MvDef)] =
    bySource.getOrDefault(sourcePath, Set.empty).toSeq.sorted
      .flatMap(p => Option(defs.get(p)).map(p -> _))
}

/** `spark.sql.extensions` entry point registering [[MvRewriteRule]]. */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(s => MvRewriteRule(s))
    ()
  }
}

case class MvRewriteRule(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import MaterializedViews.{MvAgg, MvDef}

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvRewrite.isEmpty ||
        !spark.conf.get("spark.graft.mv.rewrite", "true").toBoolean)
      return plan
    plan.transformUp { case agg: Aggregate =>
      try tryRewrite(agg).getOrElse(agg)
      catch { case scala.util.control.NonFatal(_) => agg }
    }
  }

  /** Transparent projections (column pruning inserts them mid-batch). */
  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(c)
    case other => other
  }

  /** The graft source under the aggregate: its table path, output and
    * the version the relation pinned at load (the rewrite's exactness
    * anchor). Three relation shapes match — the pre-pushdown DSv2
    * relation (extensions path), the pushed scan relation
    * (experimental path), and the V1 `format("graft")` relation (a
    * HadoopFsRelation over the manifest-driven [[GraftFileIndex]]);
    * pinned / branch / group-member reads never do.
    */
  private def sourceOf(p: LogicalPlan)
      : Option[(String, Seq[Attribute], Long)] = p match {
    case r: DataSourceV2Relation => r.table match {
      case t: GraftSqlTable if !t.pinnedRead =>
        Some((t.path, r.output, t.pinnedVersion))
      case _ => None
    }
    case s: DataSourceV2ScanRelation => s.relation.table match {
      case t: GraftSqlTable if !t.pinnedRead =>
        Some((t.path, s.output, t.pinnedVersion))
      case _ => None
    }
    case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      l.relation match {
        case fs: org.apache.spark.sql.execution.datasources
            .HadoopFsRelation => fs.location match {
          case g: GraftFileIndex if g.isMainHead =>
            Some((g.tablePathStr, l.output, g.manifestVersion))
          case _ => None
        }
        case _ => None
      }
    case _ => None
  }

  private sealed trait Pick
  private case class PickGroup(col: String) extends Pick
  private case class PickAgg(a: MvAgg) extends Pick

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val below = stripProjects(agg.child)
    val (cond, src) = below match {
      case Filter(c, ch) => (Some(c), sourceOf(stripProjects(ch)))
      case other => (None, sourceOf(other))
    }
    val (path, srcOut, pinnedV) = src.getOrElse(return None)
    MvRewrite.candidates(path).iterator
      .flatMap { case (mvPath, d) =>
        matchOne(agg, cond, srcOut, path, pinnedV, mvPath, d)
      }
      .nextOption()
  }

  private def matchOne(agg: Aggregate, cond: Option[Expression],
                       srcOut: Seq[Attribute], srcPath: String,
                       pinnedV: Long,
                       mvPath: String, d: MvDef): Option[LogicalPlan] = {
    // group columns: plain attributes naming exactly the definition's
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.map(_.name.toLowerCase).distinct.size !=
        groupAttrs.size) return None
    // exact match: same group columns, project the view. ROLLUP: the
    // query groups by a (possibly empty) strict SUBSET of the view's
    // group columns — re-aggregate the VIEW (COUNT→SUM of counts,
    // SUM→SUM, MIN→MIN, MAX→MAX), still exact and view-proportional.
    val mvGroupsLower = d.groupCols.map(_.toLowerCase).toSet
    val qGroupsLower = groupAttrs.map(_.name.toLowerCase).toSet
    if (!qGroupsLower.subsetOf(mvGroupsLower)) return None
    val exact = qGroupsLower == mvGroupsLower
    val residual = whereMatches(cond, d, srcOut)
      .getOrElse(return None)

    def mvAggFor(fn: String, colName: String): Option[MvAgg] =
      d.aggs.find(a => a.fn == fn &&
        (fn == "count_star" || a.col.equalsIgnoreCase(colName)))
    def pick(e: Expression): Option[Pick] = e match {
      case a: AttributeReference
          if groupAttrs.exists(_.exprId == a.exprId) =>
        Some(PickGroup(a.name))
      case Alias(child, _) => pick(child)
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(1, _))) =>
            mvAggFor("count_star", "").map(PickAgg)
          case Count(Seq(a: AttributeReference)) =>
            mvAggFor("count", a.name).map(PickAgg)
          case s: Sum => s.child match {
            case a: AttributeReference =>
              mvAggFor("sum", a.name).map(PickAgg)
            case _ => None
          }
          case m: Min => m.child match {
            case a: AttributeReference =>
              mvAggFor("min", a.name).map(PickAgg)
            case _ => None
          }
          case m: Max => m.child match {
            case a: AttributeReference =>
              mvAggFor("max", a.name).map(PickAgg)
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }
    val picks: Seq[Pick] = agg.aggregateExpressions.map(ne =>
      pick(ne).getOrElse(return None))

    // EXACTNESS GATE, checked last (structure first, it is free): the
    // MV must be refreshed through exactly the version this query's
    // relation pinned at load — a lagging snapshot or a stale view
    // declines, and the aggregate runs as written
    val (_, through, _) = MaterializedViews.status(spark, mvPath)
    if (through != pinnedV) return None

    val mvPlan = MergeWriter.readTable(spark, mvPath)
      .queryExecution.analyzed
    def mvAttr(name: String): Option[Attribute] =
      mvPlan.output.find(_.name.equalsIgnoreCase(name))
    // the sum-reconstruction gate, shared by both paths: a nullable
    // source column's 0-seeded SUM is usable only with its COUNT(col)
    // rider (the all-NULL-group detector)
    def sumRider(a: MvAgg): Option[Option[MvAgg]] = {
      val srcAttr = srcOut.find(_.name.equalsIgnoreCase(a.col))
        .getOrElse(return Some(None))
      if (!srcAttr.nullable) Some(None)
      else d.aggs.find(x => x.fn == "count" &&
        x.col.equalsIgnoreCase(a.col)) match {
        case Some(cn) => Some(Some(cn))
        case None => None
      }
    }
    // group-column residual conjuncts evaluate on the VIEW (a
    // predicate on a view group column commutes with its grouping):
    // remap each source attribute to the MV's same-named column and
    // filter before projecting / re-aggregating
    val base: LogicalPlan =
      if (residual.isEmpty) mvPlan
      else {
        val remapped = residual.map(_.transformUp {
          case a: AttributeReference =>
            mvAttr(a.name).getOrElse(return None)
        }).reduce(And)
        Filter(remapped, mvPlan)
      }
    def finish(e: Expression, ne: NamedExpression): NamedExpression = {
      if (e.dataType != ne.toAttribute.dataType)
        throw new MatchDecline
      val typed =
        if (!ne.toAttribute.nullable && e.nullable) KnownNotNull(e)
        else e
      Alias(typed, ne.name)(exprId = ne.exprId)
    }
    val rewrittenPlan: LogicalPlan =
      if (exact) {
        val outs = agg.aggregateExpressions.zip(picks).map { case (ne, p) =>
          val raw: Expression = p match {
            case PickGroup(c) => mvAttr(c).getOrElse(return None)
            case PickAgg(a) if a.fn == "sum" =>
              val sumA = mvAttr(a.alias).getOrElse(return None)
              sumRider(a).getOrElse(return None) match {
                // reconstruct the 0-seed concession exactly: an
                // all-NULL group's true SUM is NULL, COUNT(col)=0
                // detects it
                case Some(cn) => If(
                  EqualTo(mvAttr(cn.alias).getOrElse(return None),
                    Literal(0L)),
                  Literal(null, sumA.dataType), sumA)
                case None => sumA
              }
            case PickAgg(a) => mvAttr(a.alias).getOrElse(return None)
          }
          finish(raw, ne)
        }
        Project(outs, base)
      } else {
        // ROLLUP: re-aggregate the view by the query's (subset) group
        // columns — per-view-row partials combine exactly (no DISTINCT
        // in the fragment): COUNT → SUM of stored counts, SUM → SUM,
        // MIN → MIN, MAX → MAX; the 0-seeded SUM reconstructs from the
        // SUMMED COUNT(col) rider
        def sumOf(e: Expression): Expression =
          Sum(e).toAggregateExpression()
        val outs = agg.aggregateExpressions.zip(picks).map { case (ne, p) =>
          val raw: Expression = p match {
            case PickGroup(c) => mvAttr(c).getOrElse(return None)
            case PickAgg(a) => a.fn match {
              case "count_star" | "count" =>
                sumOf(mvAttr(a.alias).getOrElse(return None))
              case "min" =>
                Min(mvAttr(a.alias).getOrElse(return None))
                  .toAggregateExpression()
              case "max" =>
                Max(mvAttr(a.alias).getOrElse(return None))
                  .toAggregateExpression()
              case "sum" =>
                val total = sumOf(mvAttr(a.alias).getOrElse(return None))
                sumRider(a).getOrElse(return None) match {
                  case Some(cn) => If(
                    EqualTo(sumOf(mvAttr(cn.alias)
                      .getOrElse(return None)), Literal(0L)),
                    Literal(null, total.dataType), total)
                  case None => total
                }
              case _ => return None
            }
          }
          finish(raw, ne)
        }
        val groupExprs = groupAttrs.map(a =>
          mvAttr(a.name).getOrElse(return None))
        Aggregate(groupExprs, outs, base)
      }
    logInfo(s"graft mv rewrite: aggregate over $srcPath answered " +
      s"by materialized view $mvPath (version $through" +
      s"${if (exact) "" else ", rolled up"})")
    Some(rewrittenPlan)
  }

  /** Local decline signal for the output builder (caught in apply). */
  private class MatchDecline extends RuntimeException

  /** WHERE matching, returning the RESIDUAL conjuncts to apply on the
    * view (None = no rewrite). The recorded (create-normalized)
    * predicate, resolved against the source relation's own attributes
    * and run through the same coercion + constant folding the user's
    * condition received, must be a canonicalized-conjunct SUBSET of
    * the user's; each extra user conjunct must be either an
    * optimizer-inferred IsNotNull on an attribute the definition's
    * conjuncts already constrain (dropped — implied), or a
    * deterministic, subquery-free predicate referencing ONLY group
    * columns — which commutes with grouping and therefore evaluates on
    * the view itself (the rollup-point-query shape: `WHERE grp = 'x'`
    * over a per-grp view filters one view row instead of scanning the
    * corpus).
    */
  private def whereMatches(cond: Option[Expression], d: MvDef,
                           srcOut: Seq[Attribute])
      : Option[Seq[Expression]] = {
    // residuals may reference any of the VIEW's group columns (not
    // just the query's): a view-group-column predicate commutes with
    // the view's grouping, and under a rollup it filters view rows
    // before the re-aggregation — both exact
    def residualOk(e: Expression): Boolean =
      e.deterministic &&
        !e.exists(_.isInstanceOf[PlanExpression[_]]) &&
        e.references.forall(a =>
          d.groupCols.exists(_.equalsIgnoreCase(a.name)))
    (cond, d.whereSql) match {
      case (None, None) => Some(Nil)
      case (Some(c), None) =>
        val cs = splitConjunctivePredicates(c)
        if (cs.forall(residualOk)) Some(cs) else None
      case (Some(c), Some(w)) =>
        try {
          var ok = true
          val resolved = spark.sessionState.sqlParser.parseExpression(w)
            .transformUp {
              case u: UnresolvedAttribute =>
                srcOut.find(_.name.equalsIgnoreCase(u.nameParts.last))
                  .getOrElse { ok = false; u }
            }
          if (!ok) return None
          val probe = spark.sessionState.analyzer.execute(
            Filter(resolved, LocalRelation(srcOut)))
          val folded = org.apache.spark.sql.catalyst.optimizer
            .ConstantFolding(probe) match {
            case Filter(fc, _) => fc
            case _ => return None
          }
          val userCs = splitConjunctivePredicates(c)
          val userCanon = userCs.map(_.canonicalized)
          val mvC = splitConjunctivePredicates(folded).map(_.canonicalized)
          if (!mvC.forall(userCanon.contains)) return None
          val extras = userCs.filterNot(e => mvC.contains(e.canonicalized))
          val resid = extras.filterNot {
            case IsNotNull(a: Attribute) =>
              mvC.exists(_.references.contains(a))
            case _ => false
          }
          if (resid.forall(residualOk)) Some(resid) else None
        } catch { case scala.util.control.NonFatal(_) => None }
      case (None, Some(_)) => None
    }
  }
}
