package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.dot_product

/** Deduplication operators for a training-data pipeline over `documents`.
  *
  * Exact dedup is a hash-groupBy (one shuffle on the content hash — uniform
  * keys, no skew, scales linearly). Near-dup has two physical strategies
  * with identical semantics:
  *
  *  - all-pairs: dictionary-encode shingles to sorted long arrays, compare
  *    every (a < b) pair with a primitive two-pointer intersection kernel.
  *    O(n²) pairs but each pair costs ~|shingles| long comparisons — right
  *    when n is bounded (a partition, an LSH bucket, a candidate set).
  *  - inverted index: explode shingles and self-join on the shingle (the
  *    classic candidate generator) — right at scale where n² is infeasible
  *    and shared-shingle candidates are sparse.
  *
  * The MinHash/LSH pipeline (banding) composes with the all-pairs verifier:
  * LSH buckets are small, so the exact kernel runs inside each bucket.
  */
object Dedup {

  /** Exact duplicate groups by content hash; reports group size and the
    * canonical (minimum) id kept per group.
    */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(md5(text).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(id).as("keep_id"))

  /** Distinct word n-gram shingles per doc, dictionary-encoded to sorted
    * long-id arrays: `(doc, sids sorted array<long>)`.
    */
  private def shingleSets(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val sh = explodedShingles(docs, id, text, n)
    val dict = sh.select(col("shingle")).distinct()
      .withColumn("sid", monotonically_increasing_id())
    sh.join(dict, "shingle")
      .groupBy(col("doc"))
      .agg(sort_array(collect_set(col("sid"))).as("sids"))
  }

  /** N-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ threshold). */
  def ngramJaccardPairs(docs: DataFrame, id: Column, text: Column,
                        n: Int, threshold: Double,
                        allPairsLimit: Long = 100000L): DataFrame = {
    val sets = shingleSets(docs, id, text, n)
    if (docs.count() <= allPairsLimit) allPairsJaccard(sets, threshold)
    else invertedIndexJaccard(docs, id, text, n, threshold)
  }

  /** All-pairs strategy over encoded shingle sets.
    *
    * A DataFrame self-join would fold the expensive predicate into the
    * nested-loop join condition, where Spark evaluates it with interpreted
    * (non-codegen) expressions — ~100µs/pair. Instead: the bounded side
    * (≤ allPairsLimit rows, enforced by the caller) is collected once,
    * broadcast, and redistributed — so the expensive shingle derivation runs
    * exactly once, and the O(n²) pair scan is a tight JIT'd per-partition
    * loop spread across all cores. This is the rare case where
    * `mapPartitions` beats the declarative plan, and it is exactly the
    * within-bucket verifier an LSH pipeline needs at 100 TB.
    */
  private def allPairsJaccard(sets: DataFrame, threshold: Double): DataFrame = {
    val spark = sets.sparkSession
    import spark.implicits._
    val slices = spark.sparkContext.defaultParallelism
    val arr = sets.select(col("doc").cast("long"), col("sids"))
      .as[(Long, Array[Long])].collect().sortBy(_._1)
    val side = spark.sparkContext.broadcast(arr)
    // The inner pair loop is hand-rolled (no iterator combinators, no
    // per-pair boxing): in a long-lived JVM the generic Function1/Iterator
    // call sites go megamorphic after many queries and stop inlining, which
    // costs 20-30× on a per-pair closure chain.
    spark.createDataset(arr.toIndexedSeq).repartition(slices).mapPartitions { it =>
      val as = side.value
      val pre = threshold - 1e-6
      it.flatMap { case (bId, bSids) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var ai = 0
        while (ai < as.length && as(ai)._1 < bId) {
          val aSids = as(ai)._2
          var i = 0; var j = 0; var c = 0L
          while (i < aSids.length && j < bSids.length) {
            if (aSids(i) < bSids(j)) i += 1
            else if (aSids(i) > bSids(j)) j += 1
            else { c += 1; i += 1; j += 1 }
          }
          val raw = c.toDouble / (aSids.length + bSids.length - c)
          // BigDecimal rounding costs ~4.5µs/pair — only round candidates
          // that can still pass after rounding (half-up adds < 5e-7).
          if (raw >= pre) {
            val jac = roundHalfUp6(raw)
            if (jac >= threshold) out += ((as(ai)._1, bId, jac))
          }
          ai += 1
        }
        out
      }
    }.toDF("id_a", "id_b", "jaccard")
  }

  /** Same rounding as Spark's `round(x, 6)` / DuckDB's `ROUND(x, 6)`:
    * decimal HALF_UP — keeps kernel output bit-identical to the SQL oracle.
    */
  private def roundHalfUp6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Inverted-index strategy: candidates share ≥1 shingle; intersection size
    * falls out of the pair count; union = |A| + |B| − |A∩B|.
    */
  /** `(doc, shingle)` rows, built in a typed flatMap: a sliding window over
    * whitespace tokens compiles to plain JIT'd Scala — interpreted
    * higher-order Catalyst expressions (transform/slice/concat_ws) cost
    * ~100µs per shingle and serialize on small scans. Semantics match
    * [[TextAnalysis.shinglesFromTokens]]: distinct space-joined n-grams, the
    * whole text as one shingle when shorter than n tokens.
    */
  private def explodedShingles(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slices = spark.sparkContext.defaultParallelism
    docs.select(id.cast("long"), text.cast("string")).as[(Long, String)]
      .repartition(slices)
      .flatMap { case (d, t) => Dedup.distinctShingles(t, n).map(g => (d, g)) }
      .toDF("doc", "shingle")
  }

  /** Distinct space-joined word n-grams, built with tight loops (aged-JVM
    * safe — see allPairsJaccard note).
    */
  private[graft] def distinctShingles(t: String, n: Int): Array[String] = {
    val toks = t.trim.split("\\s+")
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length < n) seen.add(toks.mkString(" "))
    else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[String](seen.size)
    seen.toArray(out)
    out
  }

  private def invertedIndexJaccard(docs: DataFrame, id: Column, text: Column,
                                   n: Int, threshold: Double): DataFrame = {
    val sh = explodedShingles(docs, id, text, n)
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).
    * Norms are computed once per vector, not once per pair; the per-pair
    * work is a single primitive-array dot product.
    */
  def embeddingNearDupPairs(emb: DataFrame, id: Column, vec: Column,
                            threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val slices = spark.sparkContext.defaultParallelism
    val arr = emb.select(id.cast("long").as("id"), vec.cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot_product(col("v"), col("v"))))
      .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
    val side = spark.sparkContext.broadcast(arr)
    spark.createDataset(arr.toIndexedSeq).repartition(slices).mapPartitions { it =>
      val as = side.value
      val pre = threshold - 1e-6
      it.flatMap { case (bId, bVec, bNrm) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var ai = 0
        while (ai < as.length && as(ai)._1 < bId) {
          val aVec = as(ai)._2
          val n = math.min(aVec.length, bVec.length)
          var s = 0.0; var i = 0
          while (i < n) { s += aVec(i) * bVec(i); i += 1 }
          val raw = s / (as(ai)._3 * bNrm)
          if (raw >= pre) {
            val cos = roundHalfUp6(raw)
            if (cos >= threshold) out += ((as(ai)._1, bId, cos))
          }
          ai += 1
        }
        out
      }
    }.toDF("id_a", "id_b", "cosine")
  }
}
