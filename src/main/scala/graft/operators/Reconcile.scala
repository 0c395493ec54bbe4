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
}
