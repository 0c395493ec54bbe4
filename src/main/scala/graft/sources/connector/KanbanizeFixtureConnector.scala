package graft.sources.connector

import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.PushdownCompiler

/** DataSourceV2 connector over a Kanbanize-shaped card JSON drop that makes
  * the S8 query-param compile REAL (the `graft-jira`/`graft-ado` twin for
  * the third extractor family): Catalyst's pushed filters are re-compiled
  * into the reference's REST query string — the incremental watermark rides
  * `last_modified_from` (URL-encoded ISO,
  * `src/kanbanize/extract_state_processor.ts:158-171`), workflow
  * membership rides `workflow_ids` (`:173-181`), and the pruned column set
  * selects between the two reference scan modes: the full card scan
  * (`expand=transitions,custom_fields` over the field list, `:182-184` via
  * [[PushdownCompiler.kanbanizeCardParams]]) and the membership-only
  * refresh (`fields=card_id,workflow_id,type_id`, `:185-198`) whenever the
  * projection needs nothing more. The compiled param string appears in the
  * scan's explain output exactly where the reference's `getCards` URL
  * builder would send it (`:307-310`), and the pushdown is ENFORCED by the
  * shared [[FixtureFormat]] scaffold: the reader evaluates the pushed
  * predicates and parses only the required columns.
  *
  * Layout: one card JSON document per line, one input partition per file —
  * a live deployment pages `/cards?page=N` instead (the fixture compiles
  * `page=1`: paging state is a runtime loop, not plan state).
  */
class KanbanizeFixtureProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kbz"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KanbanizeFixtureTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new FixtureTable(KanbanizeFixtureTable, properties.get("path"))
}

object KanbanizeFixtureTable extends FixtureFormat {
  override val shortName: String = "graft-kbz"

  /** The flat card view the reference's field list selects
    * (`extract_state_processor.ts:107-123`).
    */
  override val schema: StructType = StructType(Seq(
    StructField("card_id", LongType),
    StructField("title", StringType),
    StructField("type_id", LongType),
    StructField("created_at", StringType),
    StructField("revision", LongType),
    StructField("last_modified", StringType),
    StructField("board_id", LongType),
    StructField("workflow_id", LongType),
    StructField("column_id", LongType),
    StructField("owner_user_id", LongType)))

  private val stringFields = Set("title", "created_at", "last_modified")

  /** The membership-refresh projection (`fields=card_id,workflow_id,type_id`). */
  val membershipFields: Set[String] = Set("card_id", "workflow_id", "type_id")

  /** Compile the pushed filter set + pruned columns into the reference's
    * card-scan query-param string.
    */
  private[graft] def compileParams(pushed: Seq[Filter],
                                   required: StructType): String = {
    val lastModifiedFrom = pushed.collectFirst {
      case GreaterThan("last_modified", v: String) => v
    }.getOrElse("1970-01-01T00:00:00.000000")
    val workflowIds = pushed.collect {
      case EqualTo("workflow_id", v: Long) => Seq(v.toString)
      case In("workflow_id", vs) => vs.toSeq.map(_.toString)
    }.flatten
    PushdownCompiler.kanbanizeCardParams(lastModifiedFrom, page = 1,
      workflowIds = workflowIds,
      membershipOnly = required.fieldNames.forall(membershipFields.contains))
  }

  override def supported(f: Filter): Boolean = f match {
    case GreaterThan("last_modified", _: String) => true
    case GreaterThan(a, _: Long) if !stringFields.contains(a) &&
      schema.fieldNames.contains(a) => true
    case EqualTo(a, v) if schema.fieldNames.contains(a) =>
      v.isInstanceOf[String] || v.isInstanceOf[Long]
    case In(a, vs) if schema.fieldNames.contains(a) =>
      vs.forall(v => v.isInstanceOf[String] || v.isInstanceOf[Long])
    case IsNotNull(a) if schema.fieldNames.contains(a) => true
    case IsNull(a) if schema.fieldNames.contains(a) => true
    case _ => false
  }

  override def eval(f: Filter, get: String => Any): Boolean = f match {
    case GreaterThan("last_modified", v: String) =>
      val x = get("last_modified") // ISO-8601 sorts chronologically
      x != null && x.asInstanceOf[String] > v
    case GreaterThan(a, v: Long) =>
      val x = get(a); x != null && x.asInstanceOf[Long] > v
    case EqualTo(a, v) => val x = get(a); x != null && x == v
    case In(a, vs) => val x = get(a); x != null && vs.contains(x)
    case IsNotNull(a) => get(a) != null
    case IsNull(a) => get(a) == null
    // accepted pushed filters are never re-checked by Spark — a
    // supported()/eval desync must fail loudly, not widen the result
    case f => throw new IllegalStateException(
      s"graft-kbz: accepted but unevaluable pushed filter $f")
  }

  override def fieldValue(root: JsonNode, name: String): Any = {
    val n = root.get(name) // the drop uses the Kanbanize snake_case names
    if (n == null || n.isNull) null
    else if (stringFields.contains(name)) n.asText()
    else n.asLong()
  }

  /** What a live card reader would send — shown by `.explain()`. */
  override def describe(pushed: Seq[Filter], required: StructType): String =
    s"GraftKbzFixture params=[${compileParams(pushed, required)}]" +
      s" pruned=${required.fieldNames.mkString(",")}" +
      s" PushedFilters: [${pushed.mkString(", ")}]"
}
