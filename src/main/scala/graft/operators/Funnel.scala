package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered multi-stage funnel per key: the first stage-1 event, then the
  * first stage-2 event AT OR AFTER it, then the first stage-3 event at or
  * after that, and so on — the "view → click → purchase" progression
  * query of product analytics, generalized to any stage list (and the
  * same ordered-reached shape as the reference's
  * arrival → commitment → departure event-date progression).
  *
  * Physical shape: one combinable `min` aggregation per stage, each
  * chained to the previous stage's per-key timestamp with an equi-join on
  * the (high-cardinality) key — stages are sequential by definition, so
  * the plan is |stages| shuffles on the key and nothing else: no per-key
  * sort, no window over a user's whole history, no row amplification.
  * Keys that never reach stage i have nulls from there on.
  *
  * `maxGap` (e.g. "12 hours") bounds each transition: stage i+1 must
  * occur within that interval of stage i's timestamp — the "conversion
  * window" of product analytics. None = unbounded.
  *
  * Returns (key, t_<stage1>, ..., t_<stageN>, stages_reached).
  */
object Funnel {
  def funnelStages(events: DataFrame, key: Column, ts: Column, typ: Column,
                   stages: Seq[String],
                   maxGap: Option[String] = None): DataFrame = {
    require(stages.nonEmpty, "funnelStages: at least one stage required")
    require(stages.distinct == stages, "funnelStages: stages must be distinct")
    val ev = events.select(key.as("k"), ts.as("t"), typ.as("typ"))
    val stageCols = stages.map(s => s"t_$s")
    val firstStage = ev.filter(col("typ") === stages.head)
      .groupBy(col("k")).agg(min(col("t")).as(stageCols.head))
    val stageFrames = stages.zip(stageCols).drop(1)
      .foldLeft(Vector(firstStage)) { case (acc, (stage, tcol)) =>
        val prevCol = stageCols(acc.size - 1)
        val inWindow = maxGap.fold(lit(true))(g =>
          col("t") <= col(prevCol) + expr(s"interval $g"))
        acc :+ ev.filter(col("typ") === stage)
          .join(acc.last.select(col("k"), col(prevCol)), Seq("k"))
          .filter(col("t") >= col(prevCol) && inWindow)
          .groupBy(col("k")).agg(min(col("t")).as(tcol))
      }
    val base = ev.select(col("k")).distinct()
    val joined = stageFrames.foldLeft(base)((df, s) =>
      df.join(s.select(col("k") +: s.columns.filter(_.startsWith("t_")).map(col): _*),
        Seq("k"), "left"))
    joined.withColumn("stages_reached",
      stageCols.map(c => when(col(c).isNotNull, 1L).otherwise(0L)).reduce(_ + _))
  }
}
