package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reconciliation-style set operators.
  *
  * - Deleted-item detection — reference `src/services/check_deleted_items.ts:
  *   197-267`: items present in the store but absent from the source are
  *   (soft-)deleted. Spark-first: a `left_anti` join, which Catalyst plans as
  *   a broadcast-anti when the source-id side is small.
  * - Reingest key synthesis — `src/handlers/extract_states_handler.ts:191-235`
  *   (A9): two join paths unioned and de-duplicated into storage keys.
  * - Unmapped-step detection — `src/common/unmapped_workflow_step.ts:141-205`
  *   (T13): observed states anti-joined against the configured workflow-step
  *   dimension; unmatched steps get `order=9999, stateType='queue',
  *   active=false` (`:91-104`).
  */
object Reconcile {

  /** Store-side rows whose key is absent from the (usually smaller) source
    * snapshot. Mirror of T19.
    */
  def deletedItems(store: DataFrame, source: DataFrame,
                   storeKey: Column, sourceKey: Column): DataFrame =
    store.join(source, storeKey === sourceKey, "left_anti")

  /** Observed states not present in the step dimension, synthesized as
    * auto-mapped steps (T13).
    */
  def unmappedSteps(observedStates: DataFrame, stateCol: Column,
                    steps: DataFrame, stepNameCol: Column): DataFrame =
    observedStates.select(stateCol.as("state")).distinct()
      .join(broadcast(steps), col("state") === stepNameCol, "left_anti")
      .withColumn("step_order", lit(9999))
      .withColumn("state_type", lit("queue"))
      .withColumn("active", lit(false))

  /** CDC-style diff of two keyed snapshots: one row per key whose state
    * CHANGED between `old` and `neu` — op ∈ insert (key only in new),
    * delete (key only in old), update (present in both, any compared
    * column differs; null-safe). Unchanged keys emit nothing, so the
    * output is change-volume-sized, not corpus-sized — the frame a
    * downstream incremental consumer (merge, notification fan-out,
    * audit) actually wants.
    *
    * Both sides must be key-unique (a snapshot, not a log — dedupe
    * upstream with newest-per-key first). The single shuffle is the
    * full-outer join on the key columns; compared columns ride along,
    * and old_/new_ prefixed values are emitted for audit.
    */
  def snapshotDiff(old: DataFrame, neu: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff requires at least one key column")
    val o = old.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(1))
      .select(keys.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+
        col("__in_old"): _*)
    val n = neu.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(1))
      .select(keys.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+
        col("__in_new"): _*)
    // compareCols MAY be empty: a presence-only diff (insert/delete,
    // never update) — correct for a consumer whose derived state reads
    // nothing but the keys, because keys are immutable in a keyed
    // snapshot so an existing key cannot change
    val changed =
      if (compareCols.isEmpty) lit(false)
      else compareCols
        .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
        .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("op").isNotNull)
      .drop("__in_old", "__in_new")
  }
}
