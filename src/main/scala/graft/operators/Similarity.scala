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

  /** IVF-style ANN: assign every vector to its nearest centroid (argmax
    * cosine, tie-break on centroid id), then search only within the query's
    * cell. Centroids here are fixed seed vectors — deterministic
    * assignment-only IVF; a production deployment would train them with
    * k-means|| and add multi-probe, without changing the pipeline shape.
    * The centroid set is broadcast; the assignment pass is one map-side
    * cross product per vector (|C| dot products); the search join shuffles
    * on the cell id.
    */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame, queries: DataFrame,
              id: Column, vec: Column, k: Int): DataFrame = {
    def prep(df: DataFrame, idAs: String, vecAs: String, nrmAs: String) =
      df.select(id.as(idAs), vec.cast("array<double>").as(vecAs))
        .withColumn(nrmAs, sqrt(dot_product(col(vecAs), col(vecAs))))
    val c = prep(centroids, "cid", "cv", "cn")
    val v = prep(vectors, "vid", "vv", "vn")
    val wAssign = Window.partitionBy(col("vid"))
      .orderBy(col("__cos").desc, col("cid"))
    val assigned = v.crossJoin(broadcast(c))
      .withColumn("__cos", dot_product(col("vv"), col("cv")) / (col("vn") * col("cn")))
      .withColumn("__rn", row_number().over(wAssign))
      .filter(col("__rn") === 1)
      .select(col("vid"), col("vv"), col("vn"), col("cid").as("cell"))
    val q = queries.select(id.as("query_id")).join(
      assigned.withColumnRenamed("vid", "query_id"), "query_id")
    val scored = q.select(col("query_id"), col("vv").as("qv"), col("vn").as("qn"), col("cell"))
      .join(assigned, Seq("cell"))
      .filter(col("vid") =!= col("query_id"))
      .withColumn("cosine", dot_product(col("qv"), col("vv")) / (col("qn") * col("vn")))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vid"))
    scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("cosine"), 6).as("cosine"))
  }

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
