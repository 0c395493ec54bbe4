package graft.sources.connector

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset
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

/** DataSourceV2 connector over the raw-item JSON drop path (S11) that makes
  * the S2/S3 pushdown compilers REAL: Catalyst's pushed filters are
  * re-compiled into the reference's JQL filter string
  * (`src/jiracloud/data/jc_issue.ts:734-776` via
  * [[PushdownCompiler.jqlFilter]]) and the pruned column set into its field
  * list (`jc_issue.ts:656-728` via [[PushdownCompiler.jqlSelect]]); both
  * appear in the scan's explain output exactly where a live REST reader
  * would send them. Against JSON files the compiled strings are
  * descriptive, but the pushdown is also ENFORCED: the reader evaluates the
  * pushed predicates and parses only the required columns.
  *
  * Layout: one JSON document per line (the shape
  * [[graft.sources.RawItemsFixture]] serializes), one input partition per
  * file — a live deployment points `path` at the S3 raw-item prefix and
  * parallelism comes from the object listing.
  */
class JiraFixtureProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jira"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JiraFixtureTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new JiraFixtureTable(properties.get("path"))
}

object JiraFixtureTable {
  /** The flat issue view a JQL search returns for the fixed field list. */
  val schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("project", StringType),
    StructField("issue_type", StringType),
    StructField("status", StringType),
    StructField("updated", StringType)))

  /** Connector column → Jira field name (for the S3 select compile). */
  val jiraFieldNames: Map[String, String] = Map(
    "key" -> "key", "project" -> "project", "issue_type" -> "issuetype",
    "status" -> "status", "updated" -> "updated")

  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  private[graft] def isoToMillis(iso: String): Long =
    LocalDateTime.parse(iso, TsFmt).toInstant(ZoneOffset.UTC).toEpochMilli

  /** Compile the pushed filter set into the reference's JQL string. */
  private[graft] def compileJql(pushed: Seq[Filter]): String = {
    val changedSince = pushed.collectFirst {
      case GreaterThan("updated", v: String) => isoToMillis(v)
    }.getOrElse(0L)
    val projects = pushed.collect {
      case EqualTo("project", v: String) => Seq(v)
      case In("project", vs) => vs.toSeq.map(_.toString)
    }.flatten
    val types = pushed.collect {
      case EqualTo("issue_type", v: String) => Seq(v)
      case In("issue_type", vs) => vs.toSeq.map(_.toString)
    }.flatten
    val pairs =
      if (projects.nonEmpty && types.nonEmpty) projects.map(p => p -> types)
      else Seq.empty
    PushdownCompiler.jqlFilter(changedSince, projectIssueTypes = pairs) +
      " " + PushdownCompiler.jqlSort
  }

  private[graft] def supported(f: Filter): Boolean = f match {
    case GreaterThan("updated", _: String) => true
    case EqualTo(a, _: String) if schema.fieldNames.contains(a) => true
    case In(a, _) if schema.fieldNames.contains(a) => true
    case IsNotNull(a) if schema.fieldNames.contains(a) => true
    case _ => false
  }

  private[graft] def eval(f: Filter, get: String => String): Boolean = f match {
    case GreaterThan("updated", v: String) =>
      val u = get("updated"); u != null && u > v // ISO-8601 sorts chronologically
    case EqualTo(a, v: String) => get(a) == v
    case In(a, vs) => vs.exists(v => get(a) == String.valueOf(v))
    case IsNotNull(a) => get(a) != null
    // accepted pushed filters are never re-checked by Spark — a
    // supported()/eval desync must fail loudly, not widen the result
    case f => throw new IllegalStateException(
      s"graft-jira: accepted but unevaluable pushed filter $f")
  }
}

class JiraFixtureTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-jira(`$path`)"
  override def schema(): StructType = JiraFixtureTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JiraFixtureScanBuilder(path)
}

class JiraFixtureScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = JiraFixtureTable.schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(JiraFixtureTable.supported)
    pushed = sup
    residual // the engine re-evaluates only what the source can't handle
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve table column order; Catalyst may ask in projection order
    required = StructType(JiraFixtureTable.schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new JiraFixtureScan(path, required, pushed)
}

class JiraFixtureScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** What a live reader would send — shown by `.explain()` on the scan. */
  override def description(): String = {
    val select = PushdownCompiler.jqlSelect() + " | pruned=" +
      required.fieldNames.map(JiraFixtureTable.jiraFieldNames).mkString(",")
    s"GraftJiraFixture jql=[${JiraFixtureTable.compileJql(pushed.toSeq)}] " +
      s"fields=[$select] PushedFilters: [${pushed.mkString(", ")}]"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val files = new java.io.File(path).listFiles()
    if (files == null) Array.empty
    else files.filter(f => f.isFile && f.getName.startsWith("part-"))
      .sortBy(_.getName)
      .map(f => JiraFilePartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new JiraFixtureReaderFactory(required, pushed)
}

case class JiraFilePartition(file: String) extends InputPartition

class JiraFixtureReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JiraFileReader(partition.asInstanceOf[JiraFilePartition].file, required, pushed)
}

/** Streams one JSON-lines file; parses only the fields the pruned schema
  * needs, applies the pushed predicates source-side.
  */
class JiraFileReader(file: String, required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val lines = java.nio.file.Files.lines(java.nio.file.Paths.get(file))
  private val it = lines.iterator()
  private var current: InternalRow = _

  private def str(n: JsonNode): String =
    if (n == null || n.isNull) null else n.asText()

  private def fieldValue(root: JsonNode, name: String): String = name match {
    case "key" => str(root.get("key"))
    case "project" =>
      val f = root.get("fields")
      if (f == null) null else str(f.path("project").get("id"))
    case "issue_type" =>
      val f = root.get("fields")
      if (f == null) null else str(f.path("issuetype").get("name"))
    case "status" =>
      val f = root.get("fields")
      if (f == null) null else str(f.path("status").get("name"))
    case "updated" =>
      val f = root.get("fields")
      if (f == null) null else str(f.get("updated"))
    case _ => null
  }

  override def next(): Boolean = {
    current = null
    while (current == null && it.hasNext) {
      val line = it.next()
      if (line.nonEmpty) {
        val root = mapper.readTree(line)
        val get = (n: String) => fieldValue(root, n)
        if (pushed.forall(JiraFixtureTable.eval(_, get))) {
          val vals = new Array[Any](required.length)
          var i = 0
          while (i < required.length) {
            val v = get(required.fields(i).name)
            vals(i) = if (v == null) null else UTF8String.fromString(v)
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
