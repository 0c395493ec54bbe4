package graft.sources.connector

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** What a concrete fixture connector supplies; everything else — the
  * ScanBuilder/Scan/Batch plumbing, per-file partition planning, the
  * JSON-lines reader with source-side predicate enforcement and
  * pruned-column parsing — is shared scaffold in [[FixtureTable]] /
  * [[FixtureFileReader]] below (it was four near-verbatim copies before).
  */
trait FixtureFormat extends Serializable {
  /** Datasource short name, e.g. "graft-jira" (display only here;
    * registration stays on the provider's DataSourceRegister).
    */
  def shortName: String
  def schema: StructType
  /** Which Catalyst filters the source accepts (the rest stay residual
    * and are re-evaluated by the engine).
    */
  def supported(f: Filter): Boolean
  /** Source-side enforcement of an ACCEPTED filter. Spark never
    * re-checks accepted DSv2 filters, so implementations must fail
    * loudly on shapes [[supported]] admitted but this cannot evaluate.
    */
  def eval(f: Filter, get: String => Any): Boolean
  /** Parse one pruned column from a JSON document (null if absent). */
  def fieldValue(root: JsonNode, name: String): Any
  /** The compiled wire request a live reader would send — rendered into
    * the scan's explain output.
    */
  def describe(pushed: Seq[Filter], required: StructType): String
}

class FixtureTable(format: FixtureFormat, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"${format.shortName}(`$path`)"
  override def schema(): StructType = format.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixtureScanBuilder(format, path)
}

class FixtureScanBuilder(format: FixtureFormat, path: String)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = format.schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(format.supported)
    pushed = sup
    residual // the engine re-evaluates only what the source can't handle
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve table column order; Catalyst may ask in projection order
    required = StructType(format.schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new FixtureScan(format, path, required, pushed)
}

class FixtureScan(format: FixtureFormat, path: String, required: StructType,
                  pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = format.describe(pushed.toSeq, required)

  /** One input partition per file — a live deployment pages the REST/
    * GraphQL feed instead, and parallelism comes from the listing.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val files = new java.io.File(path).listFiles()
    if (files == null) Array.empty
    else files.filter(f => f.isFile && f.getName.startsWith("part-"))
      .sortBy(_.getName)
      .map(f => FixtureFilePartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FixtureReaderFactory(format, required, pushed)
}

case class FixtureFilePartition(file: String) extends InputPartition

class FixtureReaderFactory(format: FixtureFormat, required: StructType,
                           pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FixtureFileReader(format,
      partition.asInstanceOf[FixtureFilePartition].file, required, pushed)
}

/** Streams one JSON-lines file; parses only the fields the pruned schema
  * needs, applies the pushed predicates source-side.
  */
class FixtureFileReader(format: FixtureFormat, file: String,
                        required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val lines = java.nio.file.Files.lines(java.nio.file.Paths.get(file))
  private val it = lines.iterator()
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null && it.hasNext) {
      val line = it.next()
      if (line.nonEmpty) {
        val root = mapper.readTree(line)
        val get = (n: String) => format.fieldValue(root, n)
        if (pushed.forall(format.eval(_, get))) {
          val vals = new Array[Any](required.length)
          var i = 0
          while (i < required.length) {
            vals(i) = format.fieldValue(root, required.fields(i).name) match {
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
