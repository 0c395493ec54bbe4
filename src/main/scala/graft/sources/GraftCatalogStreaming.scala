package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.read.{
  InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{
  DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.Platform

/** STREAMING THROUGH THE SQL CATALOG — `spark.readStream.table("gc.etl.t")`
  * and `df.writeStream.toTable("gc.etl.t")` — the DSv2 micro-batch
  * contract (`MicroBatchStream` / `StreamingWrite`) over the same
  * manifest-version cursor and exactly-once txn ledger as the path-based
  * `format("graft")` source/sink. The reference's E1 pipeline is
  * queue-driven micro-batches end-to-end (ref `serverless.yml:370-418`);
  * after round 10 taught SQL consumers to name tables, the streaming
  * variant must resolve the same names.
  *
  * READ semantics (`readStream.table("gc.etl.t")`): the stream FOLLOWS
  * the keyed table — batch 0 is the full snapshot, every later batch the
  * NEW ROW IMAGES of keys inserted or updated between two committed
  * versions (Delta's streaming read of an upsert table). DELETES are
  * dropped by construction (the output schema is the table's row schema —
  * there is no way to express a retraction in it); a consumer that needs
  * them tails the CDC feed instead: `readStream.table("gc.etl.t.changes")`
  * ([[GraftChangesTable]]), whose schema carries op / old_* / new_*.
  *
  * Offsets are committed manifest versions, exactly the V1 source's
  * cursor: a checkpointed restart resumes at its version as long as that
  * version is retained, and `maxVersionsPerTrigger` bounds catch-up
  * batches through the admission-control contract.
  *
  * Mechanics: DSv2 micro-batch reads must produce `InputPartition`s, but
  * a change batch here is a computed DIFF (a bucket-pruned join of two
  * pinned versions), not a static file list — so `planInputPartitions`
  * runs the diff ONCE as a distributed job that stages its partitions as
  * length-prefixed [[UnsafeRow]] files under the source's checkpoint
  * directory (the row-level changeset transport, `GraftRowLevel`), and
  * the partitions are those staged files. Cost per trigger: one extra
  * write+read round-trip of the CHANGE data — ∝ changed rows, never
  * table size — and the staged batch is deterministic (both endpoints
  * are immutable pinned versions), so a restarted or re-planned batch
  * reuses or recomputes the same bytes. `commit(end)` reclaims staged
  * batches the checkpoint has passed.
  */
private[sources] class GraftMicroBatchStream(
    spark: SparkSession, tablePath: String,
    keys: Seq[String], compareCols: Seq[String],
    streamSchema: StructType, changes: Boolean,
    checkpointLocation: String, maxVersionsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  require(keys.nonEmpty,
    s"graft streaming: $tablePath records no merge keys — the change " +
      "cursor is keyed")

  private val stagedRoot = new Path(checkpointLocation, "graft-staged")

  private def hadoopConf = spark.sparkContext.hadoopConfiguration

  private def currentVersion(): Option[Long] =
    MergeWriter.pinManifest(spark, tablePath, None, None).map(_.version)

  private def versionOf(o: Offset): Long = o.json.trim.toLong

  // -1 = nothing emitted yet: the first batch is the initial snapshot
  override def initialOffset(): Offset = GraftVersionOffset(-1L)

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  // Trigger.AvailableNow (the batch-like drain real pipelines schedule):
  // pin the newest committed version at trigger start; the run drains
  // to the pin — rate-limited as usual — and terminates, excluding
  // commits that land mid-run (they are the NEXT run's work).
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = currentVersion()

  /** Rate-limited cursor advance: the initial snapshot is ONE batch
    * regardless (it diffs against nothing), afterwards at most
    * `maxVersionsPerTrigger` versions per batch — capped intermediate
    * versions must still be retained (versions are dense), so pair rate
    * limiting with a retention window ≥ the expected lag.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startV = versionOf(start)
    val cur0 = currentVersion().getOrElse(startV)
    val cur = availableNowCap.fold(cur0)(math.min(cur0, _))
    val capped =
      if (startV < 0) cur
      else maxVersionsPerTrigger.fold(cur)(c => math.min(cur, startV + c))
    GraftVersionOffset(math.max(capped, startV))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) drives this source")

  /** The batch's rows between two pinned versions, as a BATCH frame in
    * `streamSchema` column order.
    */
  private def batchFrame(fromV: Option[Long], toV: Long): DataFrame = {
    val out =
      if (changes)
        GraftStreamCore.changesBatch(spark, tablePath, keys, compareCols,
          fromV, toV)
      else GraftStreamCore.rowImageBatch(spark, tablePath, keys,
        compareCols, fromV, toV)
    val picked = out.select(streamSchema.fieldNames.map(col).toIndexedSeq: _*)
    // the staged UnsafeRow transport re-reads the batch's bytes under
    // the PINNED streamSchema — a type that drifted mid-stream (a
    // widening commit after the stream resolved its schema) would
    // reinterpret row slots, so fail loudly instead (Delta's mid-stream
    // schema-change behavior): a restart re-resolves the evolved schema.
    // nullability-insensitive: containsNull/nullable flags vary by
    // frame provenance (parquet read vs manifest JSON) without any slot
    // reinterpretation hazard — only a VALUE-type drift is fatal
    streamSchema.fields.foreach { f =>
      val got = picked.schema(f.name).dataType
      require(org.apache.spark.sql.GraftColumnShim
          .sameTypeIgnoreNullability(got, f.dataType),
        s"graft streaming: column '${f.name}' changed type mid-stream " +
          s"($got vs pinned ${f.dataType}) — restart the streaming " +
          "query to pick up the evolved schema")
    }
    picked
  }

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val fromV = versionOf(start)
    val toV = versionOf(end)
    if (toV == fromV) return Array.empty
    val dir = new Path(stagedRoot, s"${fromV}_$toV")
    val fs = dir.getFileSystem(hadoopConf)
    val done = new Path(dir, "_DONE")
    val files: Seq[String] =
      if (fs.exists(done)) GraftStreamCore.readLines(fs, done)
      else {
        if (fs.exists(dir)) fs.delete(dir, true) // partial prior attempt
        val df = batchFrame(if (fromV < 0) None else Some(fromV), toV)
        val staged = GraftStreamCore.stageFrame(df, dir.toString)
        // publish the successful tasks' EXACT file list: a zombie task
        // attempt's leftover file in the directory is never read
        GraftStreamCore.writeLines(fs, done, staged)
        staged
      }
    files.map(f =>
      GraftStagedPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftStagedReaderFactory(streamSchema.length,
      new GraftSerializableConf(hadoopConf))

  /** Batches at or before the committed offset are checkpoint-passed:
    * reclaim their staged files (names encode the batch's end version).
    */
  override def commit(end: Offset): Unit = {
    val endV = versionOf(end)
    val fs = stagedRoot.getFileSystem(hadoopConf)
    if (fs.exists(stagedRoot)) {
      fs.listStatus(stagedRoot).foreach { st =>
        val parts = st.getPath.getName.split('_')
        if (parts.length == 2 &&
            scala.util.Try(parts(1).toLong).toOption.exists(_ <= endV))
          fs.delete(st.getPath, true)
      }
    }
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftMicroBatchStream[$tablePath${if (changes) ".changes" else ""}]"
}

private[sources] case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private[sources] case class GraftStagedPartition(path: String)
    extends InputPartition

/** Streams a staged batch file's length-prefixed UnsafeRows straight
  * back as InternalRows — no converters, no parquet: the bytes ARE the
  * rows the diff job produced.
  */
private[sources] class GraftStagedReaderFactory(n: Int,
                                                conf: GraftSerializableConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = new Path(partition.asInstanceOf[GraftStagedPartition].path)
    val in = new DataInputStream(new BufferedInputStream(
      p.getFileSystem(conf.value).open(p)))
    new PartitionReader[InternalRow] {
      private val row = new UnsafeRow(n)
      private var buf = new Array[Byte](0)
      override def next(): Boolean = {
        val len = try in.readInt() catch {
          case _: java.io.EOFException => return false
        }
        if (buf.length < len) buf = new Array[Byte](len)
        in.readFully(buf, 0, len)
        row.pointTo(buf, Platform.BYTE_ARRAY_OFFSET, len)
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}

/** The change-batch frames and staging transport shared by the catalog
  * stream ([[GraftMicroBatchStream]]) and the SQL-visible change-feed
  * metadata table ([[GraftChangesTable]]).
  */
private[graft] object GraftStreamCore {

  /** New row images of keys inserted/updated in (fromV, toV] — or the
    * full snapshot at toV when fromV is None. Deletes are dropped (the
    * row schema cannot express them — see the class doc).
    */
  def rowImageBatch(spark: SparkSession, tablePath: String,
                    keys: Seq[String], compareCols: Seq[String],
                    fromV: Option[Long], toV: Long): DataFrame =
    fromV match {
      case None => MergeWriter.readTableVersion(spark, tablePath, toV)
      case Some(f) =>
        MergeWriter.changeFeed(spark, tablePath, f, toV, keys, compareCols)
          .where(col("op") =!= "delete")
          .select(keys.map(col) ++
            compareCols.map(c => col(s"new_$c").as(c)): _*)
    }

  /** The PER-VERSION change feed over (fromV, toV] (Delta CDF's
    * `table_changes` shape): each committed version contributes its own
    * keyed diff against its predecessor, stamped with `_commit_version`
    * and the commit's wall clock `_commit_ts` — so a SQL consumer can
    * attribute every change row to the commit that produced it. fromV =
    * None emits the full snapshot at toV as inserts attributed to toV
    * (a stream's batch 0). Each single-version diff is bucket-pruned
    * and fingerprint-paired ([[MergeWriter.changeFeed]]) — I/O per
    * version ∝ that version's changed data.
    */
  def changesBatch(spark: SparkSession, tablePath: String,
                   keys: Seq[String], compareCols: Seq[String],
                   fromV: Option[Long], toV: Long): DataFrame =
    fromV match {
      case None =>
        stampVersion(spark, tablePath,
          snapshotAsInserts(spark, tablePath, keys, compareCols, toV), toV)
      case Some(f) =>
        changesForVersions(spark, tablePath, keys, compareCols,
          (f + 1) to toV)
    }

  /** The named versions' diffs, each against its predecessor, stamped
    * and unioned. Every named version AND its predecessor must still be
    * retained ([[MergeWriter.changeFeed]] fails loudly otherwise).
    */
  def changesForVersions(spark: SparkSession, tablePath: String,
                         keys: Seq[String], compareCols: Seq[String],
                         versions: Seq[Long]): DataFrame = {
    require(versions.nonEmpty, "changesForVersions: empty version list")
    versions.map { v =>
      stampVersion(spark, tablePath,
        MergeWriter.changeFeed(spark, tablePath, v - 1, v, keys,
          compareCols), v)
    }.reduce(_ unionByName _)
  }

  /** The BOUNDED batch window the `.changes` metadata table serves:
    * versions inside [lo, hi] (defaults: the whole retained window)
    * whose predecessor is also retained — the oldest retained version
    * has nothing to diff against and is skipped, never guessed.
    */
  def changesWindow(spark: SparkSession, tablePath: String,
                    keys: Seq[String], compareCols: Seq[String],
                    outSchema: StructType,
                    lo: Option[Long], hi: Option[Long]): DataFrame = {
    val retained = MergeWriter.availableVersions(spark, tablePath).toSet
    val versions = retained.toSeq.sorted.filter { v =>
      retained.contains(v - 1) &&
        lo.forall(v >= _) && hi.forall(v <= _)
    }
    if (versions.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    else changesForVersions(spark, tablePath, keys, compareCols, versions)
  }

  private def stampVersion(spark: SparkSession, tablePath: String,
                           diff: DataFrame, v: Long): DataFrame = {
    val ts = MergeWriter.pinManifest(spark, tablePath, Some(v), None)
      .map(_.opTs).filter(_ > 0L)
    diff.withColumn("_commit_version", lit(v))
      .withColumn("_commit_ts",
        ts.map(m => lit(new java.sql.Timestamp(m)))
          .getOrElse(lit(null)).cast("timestamp"))
  }

  /** The snapshot at `v` expressed as CDC insert rows (a feed's seed
    * batch): diff against an empty frame of the same schema.
    */
  def snapshotAsInserts(spark: SparkSession, tablePath: String,
                        keys: Seq[String], compareCols: Seq[String],
                        v: Long): DataFrame = {
    val neu = MergeWriter.readTableVersion(spark, tablePath, v)
    graft.operators.Reconcile.snapshotDiff(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], neu.schema),
      neu, keys, compareCols)
  }

  /** The CDC output schema for a table schema: keys ++ old_* ++ new_* ++
    * op (all nullable — full-outer provenance), matching the V1 source
    * and [[graft.operators.Reconcile.snapshotDiff]]. `withVersion` adds
    * the metadata-table columns `_commit_version` / `_commit_ts`.
    */
  def cdcSchema(tableSchema: StructType, keys: Seq[String],
                compareCols: Seq[String], withVersion: Boolean)
      : StructType = {
    val byName = tableSchema.fields.map(f => f.name -> f).toMap
    def fieldOf(c: String) = byName.getOrElse(c,
      throw new IllegalArgumentException(
        s"graft streaming: column '$c' not in the table schema"))
    val base = StructType(
      keys.map(k => fieldOf(k).copy(nullable = true)) ++
        compareCols.map(c => fieldOf(c).copy(name = s"old_$c",
          nullable = true)) ++
        compareCols.map(c => fieldOf(c).copy(name = s"new_$c",
          nullable = true)) :+
        org.apache.spark.sql.types.StructField("op",
          org.apache.spark.sql.types.StringType, nullable = true))
    if (!withVersion) base
    else StructType(base.fields :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false) :+
      org.apache.spark.sql.types.StructField("_commit_ts",
        org.apache.spark.sql.types.TimestampType, nullable = true))
  }

  /** Distributed staging of a batch frame as per-partition
    * length-prefixed UnsafeRow files (the row-level changeset
    * transport): each task writes one attempt-unique file and the
    * returned list names EXACTLY the successful attempts' files.
    */
  def stageFrame(df: DataFrame, dir: String): Seq[String] = {
    val classic =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val schema = df.schema
    val conf = new GraftSerializableConf(
      classic.sparkSession.sparkContext.hadoopConfiguration)
    val schemaJson = schema.json
    classic.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val proj = UnsafeProjection.create(
          DataType.fromJson(schemaJson).asInstanceOf[StructType])
        val p = new Path(
          s"$dir/part-$pid-${java.util.UUID.randomUUID()}")
        val fs = p.getFileSystem(conf.value)
        val out = new DataOutputStream(new BufferedOutputStream(
          fs.create(p, false)))
        try it.foreach { r =>
          val u = proj(r)
          val b = u.getBytes
          out.writeInt(b.length)
          out.write(b)
        } finally out.close()
        Iterator.single(p.toString)
      }
    }.collect().toSeq
  }

  def writeLines(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                 lines: Seq[String]): Unit = {
    val out = fs.create(p, true)
    try out.write(lines.mkString("\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readLines(fs: org.apache.hadoop.fs.FileSystem, p: Path)
      : Seq[String] = {
    val in = fs.open(p)
    val s = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
    s.split('\n').toIndexedSeq.map(_.trim).filter(_.nonEmpty)
  }
}

/** The exactly-once STREAMING sink behind `writeStream.toTable`: every
  * epoch's rows stage as per-task UnsafeRow files under the table (the
  * changeset transport again), and the epoch-level commit decodes them
  * into one batch frame and lands it through the SAME atomic keyed
  * merge + `(appId, epochId)` txn guard as the V1 path sink — a
  * replayed epoch after crash/recovery is a zero-I/O skip. Append and
  * Update modes are the keyed MERGE upsert (the table's write
  * semantics); Complete is the atomic full replace. The default appId
  * derives from the STREAMING QUERY's stable id (persisted in its
  * checkpoint), so exactly-once holds across restarts without options;
  * `txnAppId` overrides.
  */
private[sources] class GraftStreamingWrite(spark: SparkSession,
                                           tablePath: String,
                                           writeSchema: StructType,
                                           appId: String,
                                           complete: Boolean,
                                           queryId: String)
    extends StreamingWrite {

  // `_rowlevel-` prefix: a crashed query's leftover staging ages out
  // through the same vacuum rule as row-level DML staging
  private val stagingRoot = s"$tablePath/_rowlevel-stream-$queryId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new GraftStreamWriterFactory(stagingRoot, writeSchema.json,
      new GraftSerializableConf(spark.sparkContext.hadoopConfiguration))

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    try {
      val paths = messages.collect {
        case GraftStreamMessage(Some(p)) => p
      }.toSeq
      val batch = GraftRowLevel.decodeStaged(spark, paths, writeSchema)
      val existing = MergeWriter.pinManifest(spark, tablePath, None, None)
      val keys = existing.map(_.keyCols).filter(_.nonEmpty).getOrElse(
        throw new IllegalStateException(
          s"graft streaming sink: $tablePath records no merge keys"))
      if (complete)
        MergeWriter.overwriteTable(spark, tablePath, batch, keys,
          txn = Some((appId, epochId)))
      else
        MergeWriter.merge(spark, tablePath, batch, keys,
          txn = Some((appId, epochId)))
    } finally cleanup(epochId)
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    cleanup(epochId)

  private def cleanup(epochId: Long): Unit = {
    val p = new Path(s"$stagingRoot/$epochId")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  override def toString: String = s"GraftStreamingWrite[$tablePath]"
}

private[sources] case class GraftStreamMessage(path: Option[String])
    extends WriterCommitMessage

private[sources] class GraftStreamWriterFactory(stagingRoot: String,
                                                schemaJson: String,
                                                conf: GraftSerializableConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(s"$stagingRoot/$epochId",
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      conf.value, partitionId, taskId)
}

/** Per-task epoch writer: one append-only staging stream of
  * length-prefixed UnsafeRows (taskId-unique name — a zombie attempt's
  * file is never named in a commit message, so it is never read).
  */
private[sources] class GraftStreamDataWriter(epochDir: String,
                                             schema: StructType,
                                             conf: org.apache.hadoop.conf.Configuration,
                                             partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val proj = UnsafeProjection.create(schema)
  private var out: DataOutputStream = _
  private var path: Option[String] = None

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      val p = new Path(s"$epochDir/d-$partitionId-$taskId")
      path = Some(p.toString)
      out = new DataOutputStream(new BufferedOutputStream(
        p.getFileSystem(conf).create(p, false)))
    }
    val u = proj(row)
    val b = u.getBytes
    out.writeInt(b.length)
    out.write(b)
  }

  override def commit(): WriterCommitMessage = {
    close()
    GraftStreamMessage(path)
  }

  override def abort(): Unit = {
    close()
    try path.foreach { s =>
      val p = new Path(s); p.getFileSystem(conf).delete(p, false); ()
    } catch { case _: java.io.IOException => () }
  }

  override def close(): Unit =
    if (out != null) { out.close(); out = null }
}
