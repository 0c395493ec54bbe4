package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.dot_product

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute-force top-k is the exact baseline: vectors are pre-cast to
  * primitive double arrays and norms computed once per vector, so each
  * query×candidate pair costs one native dot product. The query side is
  * broadcast (it is small by construction), making the cross join map-side:
  * candidates stream through executors, no shuffle of the big side. The
  * per-query top-k is a window; for very large candidate sets switch to the
  * LSH/IVF-pruned candidate path and run the same kernel inside buckets.
  */
object Similarity {

  /** Exact top-k neighbors per query vector (self-matches excluded),
    * deterministic tie-break on neighbor id.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     qId: Column, qVec: Column, cId: Column, cVec: Column,
                     k: Int): DataFrame = {
    val q = queries.select(qId.as("query_id"), qVec.cast("array<double>").as("__qv"))
      .withColumn("__qn", sqrt(dot_product(col("__qv"), col("__qv"))))
    val slices = candidates.sparkSession.sparkContext.defaultParallelism
    val c = candidates.select(cId.as("neighbor_id"), cVec.cast("array<double>").as("__cv"))
      .withColumn("__cn", sqrt(dot_product(col("__cv"), col("__cv"))))
      .repartition(slices)
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dot_product(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cosine", round(col("cosine"), 6))
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }
}
