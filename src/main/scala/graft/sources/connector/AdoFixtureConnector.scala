package graft.sources.connector

import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.PushdownCompiler

/** DataSourceV2 connector over an ADO-Analytics-shaped raw-item JSON drop
  * that makes the S7 OData pushdown compiler REAL (the `graft-jira` twin of
  * S2/S3): Catalyst's pushed filters are re-compiled into the reference's
  * OData `$filter` string — including the surrogate `ChangedDateSK ge
  * yyyymmdd` key (`src/azureboards/data/ab_query.ts:152-232` via
  * [[PushdownCompiler.odataFilter]], key format
  * `src/utils/date_utils.ts:27-33`), the `workitemtype in(...)` and
  * `Area/AreaId in (...)` predicates, and the
  * `(ClosedDateSK eq null or ClosedDateSK ge ...)` completed-before
  * exclusion — and the pruned column set into the `$select` field list
  * (`ab_query.ts:256-300` via [[PushdownCompiler.odataSelect]]). Both
  * appear in the scan's explain output exactly where a live Analytics
  * reader would send them, and the pushdown is ENFORCED: the reader
  * evaluates the pushed predicates and parses only the required columns
  * (scaffold shared via [[FixtureFormat]]).
  *
  * Layout: one JSON document per line, one input partition per file —
  * a live deployment pages the Analytics OData feed instead.
  */
class AdoFixtureProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ado"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AdoFixtureTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new FixtureTable(AdoFixtureTable, properties.get("path"))
}

object AdoFixtureTable extends FixtureFormat {
  override val shortName: String = "graft-ado"

  /** The flat work-item view the WorkItems entity set returns. */
  override val schema: StructType = StructType(Seq(
    StructField("work_item_id", StringType),
    StructField("work_item_type", StringType),
    StructField("area_id", LongType),
    StructField("changed_date_sk", LongType),
    StructField("closed_date_sk", LongType),
    StructField("state", StringType)))

  private val longFields = Set("area_id", "changed_date_sk", "closed_date_sk")

  /** Connector column → raw-drop JSON field (the ADO Analytics names). */
  val adoFieldNames: Map[String, String] = Map(
    "work_item_id" -> "WorkItemId", "work_item_type" -> "WorkItemType",
    "area_id" -> "AreaId", "changed_date_sk" -> "ChangedDateSK",
    "closed_date_sk" -> "ClosedDateSK", "state" -> "State")

  /** Compile the pushed filter set into the reference's OData string. */
  private[graft] def compileOData(pushed: Seq[Filter]): String = {
    val changedSince = pushed.collectFirst {
      case GreaterThanOrEqual("changed_date_sk", v: Long) =>
        PushdownCompiler.surrogateKeyToMillis(v)
    }.getOrElse(0L)
    val types = pushed.collect {
      case EqualTo("work_item_type", v: String) => Seq(v)
      case In("work_item_type", vs) => vs.toSeq.map(_.toString)
    }.flatten
    val areas = pushed.collect {
      case EqualTo("area_id", v: Long) => Seq(v.toString)
      case In("area_id", vs) => vs.toSeq.map(_.toString)
    }.flatten
    // Catalyst preserves the user's disjunct order — accept both
    val excludeBefore = pushed.collectFirst {
      case Or(IsNull("closed_date_sk"),
              GreaterThanOrEqual("closed_date_sk", v: Long)) =>
        PushdownCompiler.surrogateKeyToMillis(v)
      case Or(GreaterThanOrEqual("closed_date_sk", v: Long),
              IsNull("closed_date_sk")) =>
        PushdownCompiler.surrogateKeyToMillis(v)
    }
    PushdownCompiler.odataFilter(changedSince, "WorkItems",
      areaIds = areas, workItemTypes = types,
      excludeCompletedBeforeMillis = excludeBefore)
  }

  override def supported(f: Filter): Boolean = f match {
    case GreaterThanOrEqual(a, _) if longFields.contains(a) => true
    case EqualTo(a, _) if schema.fieldNames.contains(a) => true
    case In(a, _) if schema.fieldNames.contains(a) => true
    case IsNotNull(a) if schema.fieldNames.contains(a) => true
    case IsNull(a) if schema.fieldNames.contains(a) => true
    case Or(l, r) => supported(l) && supported(r)
    case _ => false
  }

  override def eval(f: Filter, get: String => Any): Boolean = f match {
    case GreaterThanOrEqual(a, v: Long) =>
      val x = get(a); x != null && x.asInstanceOf[Long] >= v
    case EqualTo(a, v) => val x = get(a); x != null && x == v
    case In(a, vs) => val x = get(a); x != null && vs.contains(x)
    case IsNotNull(a) => get(a) != null
    case IsNull(a) => get(a) == null
    case Or(l, r) => eval(l, get) || eval(r, get)
    // Spark trusts accepted DSv2 pushed filters (they are NOT re-evaluated
    // post-scan), so a supported()/eval desync must fail loudly instead of
    // silently returning extra rows
    case f => throw new IllegalStateException(
      s"graft-ado: accepted but unevaluable pushed filter $f")
  }

  override def fieldValue(root: JsonNode, name: String): Any = {
    val n = root.get(adoFieldNames(name))
    if (n == null || n.isNull) null
    else if (longFields.contains(name)) n.asLong()
    else n.asText()
  }

  /** What a live Analytics reader would send — shown by `.explain()`. */
  override def describe(pushed: Seq[Filter], required: StructType): String = {
    val select = "$select=" + PushdownCompiler.odataSelect() + " | pruned=" +
      required.fieldNames.map(adoFieldNames).mkString(",")
    s"GraftAdoFixture odata=[$$filter=${compileOData(pushed)}" +
      s" | $$orderby=${PushdownCompiler.odataOrderBy}] " +
      s"fields=[$select] PushedFilters: [${pushed.mkString(", ")}]"
  }
}
