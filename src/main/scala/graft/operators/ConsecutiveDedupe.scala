package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-on-change dedupe of consecutive revisions.
  *
  * Reference semantics: ADO revision streams repeat the full row on every
  * revision; only rows where a tracked value differs from the previous
  * revision are kept (separately per field family) —
  * `src/azureboards/data/revision_utils.ts:3-145`; the Kanbanize transition
  * variant is `src/kanbanize/transform_processor.ts:293-312`.
  *
  * Spark-first shape: one `lag` window per key, no shuffle beyond the single
  * hash partition on the item key. At 100 TB the window shuffle partitions by
  * the high-cardinality item key, so it scales linearly and AQE handles skew.
  */
object ConsecutiveDedupe {

  /** Rows whose `valueCol` differs from the previous row in
    * (partition by `keyCols`, order by `orderCols`). The first row per key is
    * always kept (matches the reference's `previous === undefined` branch).
    */
  def keepOnChange(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
                   valueCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    df.withColumn("__prev", lag(valueCol, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= valueCol)
      .drop("__prev")
  }
}
