package graft.sources.connector

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

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
  * builder would send it (`:307-310`), and the pushdown is ENFORCED: the
  * reader evaluates the pushed predicates and parses only the required
  * columns.
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
    new KanbanizeFixtureTable(properties.get("path"))
}

object KanbanizeFixtureTable {
  /** The flat card view the reference's field list selects
    * (`extract_state_processor.ts:107-123`).
    */
  val schema: StructType = StructType(Seq(
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

  private val longFields = Set("card_id", "type_id", "revision", "board_id",
    "workflow_id", "column_id", "owner_user_id")

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

  private[graft] def supported(f: Filter): Boolean = f match {
    case GreaterThan("last_modified", _: String) => true
    case GreaterThan(a, _: Long) if longFields.contains(a) => true
    case EqualTo(a, v) if schema.fieldNames.contains(a) =>
      v.isInstanceOf[String] || v.isInstanceOf[Long]
    case In(a, vs) if schema.fieldNames.contains(a) =>
      vs.forall(v => v.isInstanceOf[String] || v.isInstanceOf[Long])
    case IsNotNull(a) if schema.fieldNames.contains(a) => true
    case IsNull(a) if schema.fieldNames.contains(a) => true
    case _ => false
  }

  private[graft] def eval(f: Filter, get: String => Any): Boolean = f match {
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
}

class KanbanizeFixtureTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-kbz(`$path`)"
  override def schema(): StructType = KanbanizeFixtureTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KanbanizeFixtureScanBuilder(path)
}

class KanbanizeFixtureScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = KanbanizeFixtureTable.schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(KanbanizeFixtureTable.supported)
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(KanbanizeFixtureTable.schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new KanbanizeFixtureScan(path, required, pushed)
}

class KanbanizeFixtureScan(path: String, required: StructType,
                           pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** What a live card reader would send — shown by `.explain()`. */
  override def description(): String =
    s"GraftKbzFixture params=[${KanbanizeFixtureTable.compileParams(pushed.toSeq, required)}]" +
      s" pruned=${required.fieldNames.mkString(",")}" +
      s" PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val files = new java.io.File(path).listFiles()
    if (files == null) Array.empty
    else files.filter(f => f.isFile && f.getName.startsWith("part-"))
      .sortBy(_.getName)
      .map(f => KbzFilePartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KanbanizeFixtureReaderFactory(required, pushed)
}

case class KbzFilePartition(file: String) extends InputPartition

class KanbanizeFixtureReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KbzFileReader(partition.asInstanceOf[KbzFilePartition].file, required, pushed)
}

/** Streams one JSON-lines file; parses only the fields the pruned schema
  * needs (card ids and friends as longs), applies the pushed predicates
  * source-side.
  */
class KbzFileReader(file: String, required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val lines = java.nio.file.Files.lines(java.nio.file.Paths.get(file))
  private val it = lines.iterator()
  private var current: InternalRow = _

  private val stringFields = Set("title", "created_at", "last_modified")

  private def fieldValue(root: JsonNode, name: String): Any = {
    val n = root.get(name) // the drop uses the Kanbanize snake_case names
    if (n == null || n.isNull) null
    else if (stringFields.contains(name)) n.asText()
    else n.asLong()
  }

  override def next(): Boolean = {
    current = null
    while (current == null && it.hasNext) {
      val line = it.next()
      if (line.nonEmpty) {
        val root = mapper.readTree(line)
        val get = (n: String) => fieldValue(root, n)
        if (pushed.forall(KanbanizeFixtureTable.eval(_, get))) {
          val vals = new Array[Any](required.length)
          var i = 0
          while (i < required.length) {
            val v = get(required.fields(i).name)
            vals(i) = v match {
              case null => null
              case s: String => UTF8String.fromString(s)
              case other => other
            }
            i += 1
          }
          current = new GenericInternalRow(vals)
        }
      }
    }
    current != null
  }
  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
