package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert ("MERGE") and partition-overwrite writers over parquet
  * table directories — the Spark-side equivalent of the reference's
  * transactional Sequelize loads:
  *
  *  - L1 state upsert on `(partitionKey, sortKey)`
  *    (`src/workitem/state_load_processor_aurora.ts:25-129`, unique index
  *    `sql/full_ddl.sql:1358`);
  *  - L2 snapshot upsert on `(partitionKey, workItemId, type, revision,
  *    flomatikaSnapshotDate)` (`snapshot_load_processor_aurora.ts:25-70`,
  *    `full_ddl.sql:1197`) — the natural key makes at-least-once delivery
  *    idempotent;
  *  - A10 context-membership refresh = per-partition overwrite
  *    (`context_workitem_map_processor_aurora.ts:129-224`: bulk upsert +
  *    anti-delete ≡ replace the partition).
  *
  * On a lakehouse deployment these become `MERGE INTO` on Delta/Iceberg;
  * the read-dedupe-swap below reproduces the semantics on plain parquet.
  * The swap is staged-write + rename so a failed job never leaves a
  * half-written table.
  */
object MergeWriter {

  /** Last-wins dedupe of a batch on its natural key (the pre-write dedupe
    * the reference delegates to the DB unique index). `orderBy` breaks ties
    * between duplicate keys — pass the ingestion/version column.
    */
  def dedupeOnKey(batch: DataFrame, keys: Seq[String],
                  orderBy: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderBy.map(_.desc): _*)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Key-hash bucket column maintained on every merge target. It is a
    * physical layout detail: [[readTable]] strips it on the way out.
    */
  val BucketCol = "__bucket"

  /** MERGE: rows in `incoming` replace existing rows with the same key;
    * all other existing rows survive. Equivalent to
    * `MERGE INTO target USING incoming ON keys WHEN MATCHED UPDATE WHEN NOT
    * MATCHED INSERT`.
    *
    * The table is laid out partitioned by `hash(keys) % buckets`, so a
    * merge reads and rewrites ONLY the buckets containing incoming keys —
    * I/O per batch is O(touched buckets), not O(table). This is the shape a
    * lakehouse MERGE has (Delta/Iceberg rewrite matched files); on a real
    * deployment `buckets` is sized so one bucket ≈ a few file groups. The
    * per-partition replace rides the committer's staged write + commit, the
    * same machinery as [[overwritePartitions]]; cross-bucket commit is not
    * table-atomic, but every load through here is keyed and idempotent
    * (dedupe + natural keys, the reference's at-least-once contract), so a
    * replayed batch converges.
    */
  def merge(spark: SparkSession, tablePath: String, incoming: DataFrame,
            keys: Seq[String], buckets: Int = 64): Unit = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(tablePath)
    val inc = incoming
      .withColumn(BucketCol, pmod(hash(keys.map(col): _*), lit(buckets)))
      .persist()
    try {
      // merging zero rows is a no-op — and must not CREATE the table: an
      // empty partitioned write leaves a schema-less directory (just
      // _SUCCESS) that poisons every later read. Streaming append sinks
      // routinely deliver empty early batches (nothing finalized yet).
      if (inc.isEmpty) return
      if (!fs.exists(target)) {
        // cluster by bucket before the partitioned write: each bucket's
        // rows land wholly in one task → one file per bucket, not one per
        // upstream partition (small-file compaction, standard MERGE hygiene)
        inc.repartition(col(BucketCol))
          .write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(tablePath)
      } else {
        val existingAll = spark.read.parquet(tablePath)
        if (existingAll.columns.contains(BucketCol)) {
          // bounded metadata collect: ≤ `buckets` values, never data-scale
          val touched = inc.select(col(BucketCol)).distinct()
            .collect().map(_.getInt(0)).toIndexedSeq
          if (touched.nonEmpty) {
            // partition pruning limits the scan to the touched buckets
            val existing = existingAll.filter(col(BucketCol).isin(touched: _*))
            val survivors = existing
              .join(inc.select(keys.map(col): _*).distinct(), keys, "left_anti")
            survivors
              .unionByName(inc.select(existing.columns.map(col).toIndexedSeq: _*))
              .repartition(col(BucketCol))
              .write.mode(SaveMode.Overwrite)
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy(BucketCol)
              .parquet(tablePath)
          }
        } else {
          // legacy unbucketed table: migrate with one full rewrite through a
          // staged swap, after which merges are bucket-local
          val survivors = existingAll
            .join(inc.select(keys.map(col): _*).distinct(), keys, "left_anti")
            .withColumn(BucketCol, pmod(hash(keys.map(col): _*), lit(buckets)))
          val merged = survivors
            .unionByName(inc.select(survivors.columns.map(col).toIndexedSeq: _*))
          val staging = new Path(tablePath + ".staging-" + UUID.randomUUID())
          merged.repartition(col(BucketCol))
            .write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
            .parquet(staging.toString)
          val backup = new Path(tablePath + ".old-" + UUID.randomUUID())
          // rename reports failure by RETURNING FALSE on HDFS/object-store
          // semantics — fail loudly and restore if the swap-in didn't happen
          if (!fs.rename(target, backup))
            throw new java.io.IOException(s"merge: rename $target -> $backup failed")
          if (!fs.rename(staging, target)) {
            fs.rename(backup, target) // best-effort restore
            throw new java.io.IOException(s"merge: rename $staging -> $target failed")
          }
          fs.delete(backup, true)
        }
      }
    } finally { inc.unpersist(); () }
  }

  /** Read a merge-maintained table without its physical bucket column. */
  def readTable(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath).drop(BucketCol)

  /** L1/L3 — the custom-field load's transactional shape
    * (`state_load_processor_aurora.ts:39-113`): per incoming item, delete
    * ALL existing custom-field rows and insert the new set, deduped inline
    * on (workItemId, name, value). Replacing by item key is exactly a MERGE
    * keyed on the item id where every incoming row of that item survives —
    * stale fields of reloaded items disappear, untouched items keep theirs.
    */
  def loadCustomFields(spark: SparkSession, tablePath: String,
                       incoming: DataFrame): Unit =
    merge(spark, tablePath,
      incoming.dropDuplicates("workItemId", "name", "value"), Seq("workItemId"))

  /** A10: rebuild membership per context and overwrite only the touched
    * partitions (dynamic partition overwrite ≡ the reference's
    * upsert + anti-delete in one transaction).
    */
  def overwritePartitions(tablePath: String, incoming: DataFrame,
                          partitionCol: String): Unit =
    incoming.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(tablePath)
}
