package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{
  BaseRelation, Filter, PrunedFilteredScan, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** READS OF DELETION-VECTOR-BEARING TABLE VERSIONS, bridged to V1.
  *
  * The native parquet scan ([[GraftStreamableParquetScan]] /
  * [[GraftFileIndex]]) serves files verbatim — it cannot filter the
  * per-file dead positions a DV delete records — so a pinned manifest
  * with live vectors routes its catalog and `format("graft")` reads
  * through [[MergeWriter.readPinnedWhere]] (the DV-aware storage core)
  * behind the standard V1 bridge (`needConversion = false`, internal
  * rows straight through — the same shape as [[GraftChangesScan]]).
  * Delta gates DV-readers with a table feature for the same reason.
  *
  * What this costs, and for how long: while vectors are live the scan
  * loses whole-stage-codegen'd vectorized batches, SPJ/runtime-filter
  * integration and exact planner statistics — but KEEPS file pruning
  * (pushed comparison/IN/null filters translate to the same stats and
  * Bloom keep functions, and fully-pinned merge-key conjunctions still
  * prune to their hash buckets). Compaction purges the vectors and the
  * very next `loadTable` plans natively again; [[MergeWriter
  * .DvAutoCompactFiles]] bounds the window. DV-free tables never enter
  * this file.
  */
private[sources] object GraftDvBridge {

  /** Conservative v1 `Filter` → storage-predicate translation for file
    * pruning (a superset of [[GraftFileIndex.fromV1Filters]]'s runtime
    * shapes: comparisons widen strict bounds, null tests pass through,
    * unrecognized shapes prune nothing — Spark re-evaluates every
    * filter exactly on top of the bridge).
    */
  def toPredicates(fs: Seq[Filter]): Seq[MergeWriter.ColumnPredicate] = {
    import org.apache.spark.sql.sources._
    import MergeWriter.{ColumnIn, ColumnNull, ColumnRange}
    fs.flatMap {
      case EqualTo(c, v) if v != null =>
        Seq(ColumnRange(c, Some(v), Some(v)))
      case EqualNullSafe(c, v) if v != null =>
        Seq(ColumnRange(c, Some(v), Some(v)))
      case In(c, vs) if vs.nonEmpty && !vs.contains(null) &&
          vs.length <= GraftFileIndex.RuntimeInCap =>
        Seq(ColumnIn(c, vs.toSeq))
      case GreaterThan(c, v) if v != null => Seq(ColumnRange(c, Some(v), None))
      case GreaterThanOrEqual(c, v) if v != null =>
        Seq(ColumnRange(c, Some(v), None))
      case LessThan(c, v) if v != null => Seq(ColumnRange(c, None, Some(v)))
      case LessThanOrEqual(c, v) if v != null =>
        Seq(ColumnRange(c, None, Some(v)))
      case IsNull(c) => Seq(ColumnNull(c, true))
      case IsNotNull(c) => Seq(ColumnNull(c, false))
      case And(l, r) => toPredicates(Seq(l)) ++ toPredicates(Seq(r))
      case _ => Seq.empty
    }
  }

  /** The DV-aware pruned frame of a pinned manifest: merge-key point
    * conjunctions prune to their hash buckets (the same driver-side
    * Murmur3 as [[GraftFileIndex.keyBuckets]]), then stats/Bloom file
    * skipping and the DV position filter apply inside.
    */
  def frame(spark: SparkSession, tablePath: String,
            man: MergeWriter.Manifest,
            preds: Seq[MergeWriter.ColumnPredicate]): DataFrame = {
    val buckets = GraftFileIndex.keyBuckets(man,
      MergeWriter.indexSchema(spark, tablePath, man), preds)
    val pinned = buckets.fold(man)(bs =>
      man.copy(epochs = man.epochs.filter { case (b, _) => bs(b) }))
    MergeWriter.readPinnedWhere(spark, tablePath, pinned, preds)
  }

  /** The standard V1 bridge: internal rows of a full Spark plan handed
    * through without re-encoding.
    */
  def bridge(context: SQLContext, out: StructType, df: DataFrame)
      : BaseRelation with TableScan =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = out
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] =
        df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
          .queryExecution.toRdd.asInstanceOf[RDD[Row]]
    }
}

/** Catalog-side scan builder for a DV-bearing pinned manifest — serves
  * batch SQL reads (and the row-level DML target scan, which must not
  * see dead rows: a MERGE matching a deleted key would wrongly take the
  * MATCHED branch) and `readStream.table` (the stream core is DataFrame-
  * based and DV-aware by construction).
  */
private[sources] class GraftDvScanBuilder(
    spark: SparkSession, tablePath: String, man: MergeWriter.Manifest,
    schema: StructType, options: CaseInsensitiveStringMap,
    streamable: Boolean)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read
      .SupportsPushDownRequiredColumns {

  private var preds: Seq[MergeWriter.ColumnPredicate] = Seq.empty
  private var required: StructType = schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    preds = GraftDvBridge.toPredicates(filters.toSeq)
    filters // pruning only — every filter still evaluates exactly
  }

  override def pushedFilters(): Array[Filter] = Array.empty

  /** Column pruning matters doubly here: the V1 bridge materializes
    * rows, so an unpruned wide table would pay full width per scan for
    * the whole DV window. An EMPTY pruned schema (COUNT(*)) keeps the
    * full schema — the bridge must serve rows matching readSchema.
    */
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (requiredSchema.fields.nonEmpty) required = requiredSchema

  override def build(): Scan =
    new GraftDvScan(spark, tablePath, man, required, preds, options,
      streamable)
}

private[sources] class GraftDvScan(
    spark: SparkSession, tablePath: String, man: MergeWriter.Manifest,
    out: StructType, preds: Seq[MergeWriter.ColumnPredicate],
    options: CaseInsensitiveStringMap, streamable: Boolean)
    extends V1Scan {

  override def readSchema(): StructType = out

  override def description(): String =
    s"GraftDvScan($tablePath, ${preds.size} pruning predicates)"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val df = GraftDvBridge.frame(spark, tablePath, man, preds)
      .select(out.fieldNames.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*)
    GraftDvBridge.bridge(context, out, df).asInstanceOf[T]
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(streamable,
      s"graft catalog: $tablePath is a time-travel pin — one " +
        "immutable version has no change stream to tail")
    require(man.keyCols.nonEmpty,
      s"graft streaming: $tablePath records no merge keys")
    val compareCols = out.fieldNames.toSeq.filterNot(man.keyCols.contains)
    new GraftMicroBatchStream(spark, tablePath, man.keyCols, compareCols,
      out, changes = false, checkpointLocation,
      Option(options.get("maxVersionsPerTrigger")).map(_.toLong))
  }
}
