package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S11 — the raw work-item document source. The reference stores one JSON
  * document per work item on S3 under
  * `orgId/datasourceType-datasourceId/workItemId.json`
  * (`src/workitem/s3_client.ts:38-60`); the natural Spark ingestion boundary
  * is a JSON read over that prefix. Line-delimited JSON scales better (no
  * per-file multiline parse); both are supported.
  *
  * At 100 TB the prefix layout IS the partition pruning: filtering on
  * `orgId`/`datasourceId` path columns prunes directories before any byte
  * is read.
  */
object RawItems {

  /** Read a drop of raw work items (JSONL or one-object-per-file). */
  def read(spark: SparkSession, path: String, multiLine: Boolean = false): DataFrame =
    spark.read.option("multiLine", multiLine).json(path)
}
