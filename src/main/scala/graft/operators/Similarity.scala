package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  private def prepVecs(df: DataFrame, id: Column, vec: Column,
                       idAs: String, vecAs: String, nrmAs: String) =
    df.select(id.as(idAs), vec.cast("array<double>").as(vecAs))
      .withColumn(nrmAs, sqrt(dot_product(col(vecAs), col(vecAs))))

  /** One Lloyd iteration: assign every vector to its nearest centroid
    * (argmax cosine, tie on centroid id), then recompute each centroid as
    * the element-wise mean of its members. Means accumulate in decimals
    * (order-independent) so the trained centroids are bit-reproducible.
    * Cells that lose all members disappear (standard Lloyd on cosine).
    *
    * Shapes: centroid set broadcast; assignment is |C| dot products per
    * vector map-side; the mean is a (cell, position) groupBy — all
    * map-side combinable, nothing driver-bound.
    */
  private[operators] def kmeansStep(v: DataFrame, c: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vid")).orderBy(col("__cos").desc, col("cid"))
    val assigned = v.crossJoin(broadcast(c))
      .withColumn("__cos", dot_product(col("vv"), col("cv")) / (col("vn") * col("cn")))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("vid"), col("vv"), col("cid").as("cell"))
    val perPos = assigned
      .select(col("cell"), posexplode(col("vv")).as(Seq("pos", "val")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(col("val").cast("decimal(38,15)")).cast("double") / count(lit(1))).as("m"))
    perPos.groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("cv"))
      .select(col("cell").as("cid"), col("cv"))
      .withColumn("cn", sqrt(dot_product(col("cv"), col("cv"))))
  }

  /** IVF ANN: train centroids with `iterations` Lloyd steps from the seed
    * set, assign every vector to its nearest cell, then search each query's
    * top-`probes` cells only. `iterations = 0, probes = 1` is
    * assignment-only IVF (deterministic baseline); multi-probe trades one
    * more |C|-scan per query for recall, never touching the pipeline
    * shape. The centroid set is broadcast; the assignment pass is one
    * map-side cross product per vector (|C| dot products); the search join
    * shuffles on the cell id.
    */
  /** Train IVF centroids: `iterations` Lloyd steps from the seed set.
    * Returns the centroid frame (cid, cv, cn); trained sets are persisted
    * (centroid-count rows — tiny at any scale) and registered with the
    * session's CacheRegistry so callers can reclaim storage.
    */
  def ivfTrain(vectors: DataFrame, seeds: DataFrame, id: Column, vec: Column,
               iterations: Int): DataFrame = {
    val c0 = prepVecs(seeds, id, vec, "cid", "cv", "cn")
    if (iterations == 0) c0
    else {
      val v = prepVecs(vectors, id, vec, "vid", "vv", "vn")
      graft.CacheRegistry.persist(
        (0 until iterations).foldLeft(c0)((cc, _) => kmeansStep(v, cc)))
    }
  }

  /** Assign every vector to its nearest cell (argmax cosine, tie on cid)
    * against a trained centroid frame from [[ivfTrain]]. Returns
    * (vid, vv, vn, cell, centroid_cos) — the centroid cosine doubles as a
    * centrality score (used by semantic dedup's survivor selection). The
    * centroid set is broadcast; assignment is |C| dot products per vector,
    * map-side, no shuffle of the vector table.
    */
  def ivfAssignCells(vectors: DataFrame, trained: DataFrame,
                     id: Column, vec: Column): DataFrame = {
    val v = prepVecs(vectors, id, vec, "vid", "vv", "vn")
    val wAssign = Window.partitionBy(col("vid"))
      .orderBy(col("__cos").desc, col("cid"))
    v.crossJoin(broadcast(trained))
      .withColumn("__cos", dot_product(col("vv"), col("cv")) / (col("vn") * col("cn")))
      .withColumn("__rn", row_number().over(wAssign))
      .filter(col("__rn") === 1)
      .select(col("vid"), col("vv"), col("vn"), col("cid").as("cell"),
        col("__cos").as("centroid_cos"))
  }

  def ivfTopK(vectors: DataFrame, centroids: DataFrame, queries: DataFrame,
              id: Column, vec: Column, k: Int,
              iterations: Int = 0, probes: Int = 1): DataFrame =
    ivfTopKPretrained(vectors,
      ivfTrain(vectors, centroids, id, vec, iterations), queries,
      id, vec, k, probes)

  /** [[ivfTopK]] against an already-trained centroid frame (shared across
    * queries — training once and reusing the persisted centroids is the
    * point of the split).
    */
  def ivfTopKPretrained(vectors: DataFrame, trained: DataFrame,
                        queries: DataFrame, id: Column, vec: Column, k: Int,
                        probes: Int = 1): DataFrame =
    ivfTopKAssigned(ivfAssignCells(vectors, trained, id, vec), trained,
      queries, id, vec, k, probes)

  /** [[ivfTopKPretrained]] against an already-assigned vector frame (from
    * [[ivfAssignCells]]) — assignment is independent of `probes`, so a
    * probes sweep computes it once and reuses the persisted frame.
    */
  def ivfTopKAssigned(assignedCells: DataFrame, trained: DataFrame,
                      queries: DataFrame, id: Column, vec: Column, k: Int,
                      probes: Int = 1): DataFrame = {
    val c = trained
    val assigned = assignedCells
      .select(col("vid"), col("vv"), col("vn"), col("cell"))
    // query → probed cells: rank ALL cells per query, keep the top `probes`
    val qv = queries.select(id.as("query_id"), vec.cast("array<double>").as("qv"))
      .withColumn("qn", sqrt(dot_product(col("qv"), col("qv"))))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("cid"))
    val probed = qv.crossJoin(broadcast(c))
      .withColumn("__cos", dot_product(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= probes)
      .select(col("query_id"), col("qv"), col("qn"), col("cid").as("cell"))
    val scored = probed
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

  // SRP mixer constants, shared with the oracle CTE: plane weights are the
  // deterministic pseudo-random grid w(p,j) = lcg(p·D+j)/M − 0.5.
  val SrpMulA = 1103515245L
  val SrpAddB = 12345L
  val SrpMod = 2147483647L

  /** Signed-random-projection (SRP/hyperplane-LSH) signatures: bit p of the
    * signature is sign(v · w_p) where w_p is a deterministic pseudo-random
    * hyperplane. cos(θ) similarity maps to Hamming agreement
    * (P[bit match] = 1 − θ/π, Charikar's rounding scheme), so banding the
    * bits gives cosine-near-dup candidates exactly like MinHash bands give
    * Jaccard candidates. Embarrassingly parallel (no dictionary, no
    * shuffle); the dot products accumulate left-to-right in doubles so the
    * DuckDB oracle reproduces the signature bit-for-bit.
    */
  def srpSignatures(emb: DataFrame, id: Column, vec: Column,
                    bits: Int = 32): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val nBits = bits
    emb.select(id.cast("long"), vec.cast("array<double>")).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        // the plane grid w(p,j) is a pure function of (bits, d): derive it
        // ONCE per (partition, dimensionality) instead of re-running the
        // LCG multiply+mod per vector element — same constants, identical
        // signatures, ~2× less kernel arithmetic. Keyed by d because the
        // grid is row-major over the vector's own dimensionality.
        val grids = new java.util.HashMap[Int, Array[Double]]()
        def gridFor(d: Int): Array[Double] = {
          var g = grids.get(d)
          if (g == null) {
            g = new Array[Double](nBits * d)
            var k = 0
            while (k < g.length) {
              g(k) = ((SrpMulA * k + SrpAddB) % SrpMod).toDouble /
                SrpMod.toDouble - 0.5
              k += 1
            }
            grids.put(d, g)
          }
          g
        }
        it.map { case (i, v) =>
          val arr = v.toArray
          val d = arr.length
          val g = gridFor(d)
          var sig = 0L
          var p = 0
          while (p < nBits) {
            var acc = 0.0
            val base = p * d
            var j = 0
            while (j < d) {
              acc += arr(j) * g(base + j)
              j += 1
            }
            if (acc > 0) sig |= 1L << p
            p += 1
          }
          (i, sig)
        }
      }.toDF("id", "srp_sig")
  }

  /** The 100 TB front-end for embedding near-dup that
    * [[Dedup.embeddingNearDupPairs]]'s exact block-nested-loop cannot be:
    * SRP signatures → banded bucket join (near-uniform keys) → exact
    * cosine verify INSIDE buckets only. Sub-quadratic end to end; recall
    * is the standard LSH trade (raise bands/bits to tighten), and every
    * surviving pair carries its exact verified cosine.
    */
  /** The banded candidate stage of [[srpNearDupPairs]], exposed for
    * instrumentation: distinct (id_a < id_b) pairs sharing at least one
    * band key. Candidate volume ≈ true near-dup pairs + the random
    * collision floor `bands · n² / 2^(bits/bands)` — at large n the band
    * KEY WIDTH dominates: 8-bit keys (32/4) give only 256 buckets per
    * band and the floor swamps everything by ~20k vectors, while 16-bit
    * keys (64/4) push the same floor out 256×. The wide config loses
    * recall on moderate-cosine pairs (p^16 vs p^8), so it is the
    * dense-replica/high-threshold scale choice, not a universal default.
    */
  /** The per-vector band keys of the SRP banding scheme: one row per
    * (id, band) with the band's key slice of the signature. This is the
    * composable blocking primitive — join band rows on (band, band_key)
    * for pure SRP candidates ([[srpCandidatePairs]]), or compose the key
    * with another blocking column (q79 joins on cell ∧ band ∧ band_key to
    * sub-block IVF cells so the in-cell verify survives a fixed centroid
    * count). Signatures are persisted (one long per vector).
    */
  def srpBandRows(emb: DataFrame, id: Column, vec: Column,
                  bits: Int = 32, bands: Int = 4): DataFrame = {
    require(bits % bands == 0 && bits >= 1 && bits <= 64 && bits / bands < 64,
      s"bits=$bits must be a multiple of bands=$bands, fit one long, and " +
        "give bands narrower than 64 bits (a 64-bit mask shift would wrap " +
        "to 0 and silently degrade the band join to a full cross product)")
    val sig = graft.CacheRegistry.persist(srpSignatures(emb, id, vec, bits))
    val width = bits / bands
    (0 until bands).map { b =>
      sig.select(col("id"), lit(b).as("band"),
        shiftright(col("srp_sig"), b * width)
          .bitwiseAND((1L << width) - 1).as("band_key"))
    }.reduce(_ unionByName _)
  }

  def srpCandidatePairs(emb: DataFrame, id: Column, vec: Column,
                        bits: Int = 32, bands: Int = 4): DataFrame =
    bandJoin(srpBandRows(emb, id, vec, bits, bands))

  /** Distinct (id_a < id_b) pairs sharing at least one (band, band_key). */
  private def bandJoin(bandRows: DataFrame): DataFrame =
    bandRows.as("a").join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()

  /** Two-long SRP signatures for 65-128 planes — same deterministic LCG
    * plane grid as [[srpSignatures]], plane p's sign landing in bit p%64
    * of limb p/64 (`srp_lo` holds planes 0-63, `srp_hi` the rest). Wider
    * signatures exist to be BANDED wider: 128 bits cut 16-bit-key bands
    * from 4 to 8 without narrowing the keys, so the
    * `bands·n²/2^width` collision floor stays out while per-pair recall
    * at matching probability p rises from 1-(1-p^16)^4 to 1-(1-p^16)^8.
    */
  def srpSignatures128(emb: DataFrame, id: Column, vec: Column,
                       bits: Int = 128): DataFrame = {
    require(bits > 64 && bits <= 128,
      s"srpSignatures128 covers 65-128 planes, got $bits (use srpSignatures)")
    val spark = emb.sparkSession
    import spark.implicits._
    val nBits = bits
    emb.select(id.cast("long"), vec.cast("array<double>")).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val grids = new java.util.HashMap[Int, Array[Double]]()
        def gridFor(d: Int): Array[Double] = {
          var g = grids.get(d)
          if (g == null) {
            g = new Array[Double](nBits * d)
            var k = 0
            while (k < g.length) {
              g(k) = ((SrpMulA * k + SrpAddB) % SrpMod).toDouble /
                SrpMod.toDouble - 0.5
              k += 1
            }
            grids.put(d, g)
          }
          g
        }
        it.map { case (i, v) =>
          val arr = v.toArray
          val d = arr.length
          val g = gridFor(d)
          var lo = 0L
          var hi = 0L
          var p = 0
          while (p < nBits) {
            var acc = 0.0
            val base = p * d
            var j = 0
            while (j < d) {
              acc += arr(j) * g(base + j)
              j += 1
            }
            if (acc > 0) {
              if (p < 64) lo |= 1L << p else hi |= 1L << (p - 64)
            }
            p += 1
          }
          (i, lo, hi)
        }
      }.toDF("id", "srp_lo", "srp_hi")
  }

  /** [[srpBandRows]] over two-long signatures: band b's key is the
    * `width`-bit slice starting at bit b·width of the 128-bit signature.
    * `width` must divide 64 so no band straddles the limb boundary.
    */
  def srpBandRows128(emb: DataFrame, id: Column, vec: Column,
                     bits: Int = 128, bands: Int = 8): DataFrame = {
    require(bits % bands == 0 && bits > 64 && bits <= 128,
      s"bits=$bits must be a multiple of bands=$bands in (64, 128]")
    val width = bits / bands
    require(width < 64 && 64 % width == 0,
      s"band width $width must divide 64 (no band may straddle the limb boundary)")
    val sig = graft.CacheRegistry.persist(srpSignatures128(emb, id, vec, bits))
    (0 until bands).map { b =>
      val start = b * width
      val (limb, off) =
        if (start < 64) (col("srp_lo"), start) else (col("srp_hi"), start - 64)
      sig.select(col("id"), lit(b).as("band"),
        shiftright(limb, off).bitwiseAND((1L << width) - 1).as("band_key"))
    }.reduce(_ unionByName _)
  }

  def srpCandidatePairs128(emb: DataFrame, id: Column, vec: Column,
                           bits: Int = 128, bands: Int = 8): DataFrame =
    bandJoin(srpBandRows128(emb, id, vec, bits, bands))

  def srpNearDupPairs(emb: DataFrame, id: Column, vec: Column,
                      threshold: Double, bits: Int = 32,
                      bands: Int = 4): DataFrame =
    verifyCandidates(emb, id, vec,
      srpCandidatePairs(emb, id, vec, bits, bands), threshold)

  /** INCREMENTAL near-dup at ingest: verified near-dup pairs of a NEW
    * batch against a STORED band index plus within-batch — never
    * re-pairing stored-vs-stored. This is dedup-at-ingest for a living
    * corpus: the band-row table ([[srpBandRows]] output) is maintained
    * through the keyed MergeWriter (replay-idempotent), each arriving
    * batch computes only ITS band rows, joins them against the stored
    * index, and the exact-cosine verify runs on the surviving candidates
    * only. Work per batch ∝ batch size × collision rate, independent of
    * corpus size except through the (band, band_key)-keyed join —
    * exactly the 100 TB shape (a full [[srpNearDupPairs]] recompute per
    * batch is quadratic in corpus over time).
    *
    * By set algebra the result equals the full-corpus pair set
    * restricted to pairs with ≥ 1 endpoint in the new batch, which is
    * what the oracle pins. `emb` must cover stored ∪ new (the verify
    * side reads vectors for both endpoints).
    */
  def srpIncrementalNearDupPairs(emb: DataFrame, id: Column, vec: Column,
                                 storedBands: DataFrame, newEmb: DataFrame,
                                 threshold: Double, bits: Int = 32,
                                 bands: Int = 4): DataFrame = {
    val newBands = srpBandRows(newEmb, id, vec, bits, bands)
    val all = storedBands.select(col("id"), col("band"), col("band_key"))
      .unionByName(newBands)
    val cand = all.as("a").join(newBands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b")).distinct()
    verifyCandidates(emb, id, vec, cand, threshold)
  }

  /** [[srpIncrementalNearDupPairs]] with the verify-side vectors fetched
    * by KEY from a merge-maintained embeddings table instead of read
    * from a corpus-scale frame: candidate endpoints are batch ×
    * collision-rate many, so `MergeWriter.readKeys` prunes the vector
    * fetch to ≤ that many buckets — the last corpus-proportional touch
    * in the ingest-dedup loop becomes a point read, and per-batch cost
    * is finally independent of corpus size (the ScaleBench `ingest8`
    * line measures it WITH the fetch included). The table must hold
    * stored ∪ new vectors (merge the arriving batch in first — a keyed
    * merge, so crash-replay idempotent), keyed on the id column.
    */
  def srpIncrementalNearDupPairsKeyed(spark: SparkSession, embTable: String,
                                      idName: String, vecName: String,
                                      storedBands: DataFrame,
                                      newEmb: DataFrame, threshold: Double,
                                      bits: Int = 32,
                                      bands: Int = 4): DataFrame =
    srpIncrementalNearDupPairsWith(
      wanted => graft.sources.MergeWriter.readKeys(spark, embTable, wanted,
        Seq(idName)),
      idName, vecName, storedBands, newEmb, threshold, bits, bands)

  /** [[srpIncrementalNearDupPairsKeyed]] with the candidate-vector fetch
    * ABSTRACTED: `fetchVecs` receives the candidate-id frame (one
    * `idName` column, candidate-scale) and returns those rows' vectors.
    * Lets a caller resolve vectors from a not-yet-committed source — the
    * single-group-commit ingest loop fetches stored candidates from the
    * group's previous version via `readGroupKeys` and batch candidates
    * from the in-memory batch, so vectors, pairs and bands can flip in
    * ONE atomic commit per trigger.
    */
  def srpIncrementalNearDupPairsWith(fetchVecs: DataFrame => DataFrame,
                                     idName: String, vecName: String,
                                     storedBands: DataFrame,
                                     newEmb: DataFrame, threshold: Double,
                                     bits: Int = 32,
                                     bands: Int = 4): DataFrame = {
    val newBands = srpBandRows(newEmb, col(idName), col(vecName), bits, bands)
    val all = storedBands.select(col("id"), col("band"), col("band_key"))
      .unionByName(newBands)
    // persisted: consumed twice (wanted-id set + verify join), and the
    // band join that produces it is batch-scale, not corpus-scale
    val cand = graft.CacheRegistry.persist(
      all.as("a").join(newBands.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.id") =!= col("b.id"))
        .select(least(col("a.id"), col("b.id")).as("id_a"),
          greatest(col("a.id"), col("b.id")).as("id_b")).distinct())
    val wanted = cand.select(col("id_a").as(idName))
      .unionByName(cand.select(col("id_b").as(idName))).distinct()
    val vecs = fetchVecs(wanted)
    verifyCandidates(vecs, col(idName), col(vecName), cand, threshold)
  }

  /** [[srpNearDupPairs]] in the 128-bit regime: the same exact-cosine
    * verify over [[srpCandidatePairs128]] candidates.
    */
  def srpNearDupPairs128(emb: DataFrame, id: Column, vec: Column,
                         threshold: Double, bits: Int = 128,
                         bands: Int = 8): DataFrame =
    verifyCandidates(emb, id, vec,
      srpCandidatePairs128(emb, id, vec, bits, bands), threshold)

  /** Exact-cosine verify of a candidate pair frame (id_a, id_b), keeping
    * pairs at or above `threshold` with their verified cosine.
    */
  private def verifyCandidates(emb: DataFrame, id: Column, vec: Column,
                               cand: DataFrame, threshold: Double): DataFrame = {
    // keep the verify-side vectors in their NATIVE width: the two
    // candidate joins shuffle millions of pair rows carrying arrays, and
    // when the source column is float, widening float→double after the
    // join is bit-identical to widening before it (every float is exactly
    // representable) at half the shuffle bytes. Double sources stay
    // double — never narrow. Norms are computed in doubles either way,
    // as the oracle does.
    val nativeFloat = emb.select(vec.as("__v")).schema.head.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    val wireType = if (nativeFloat) "array<float>" else "array<double>"
    val v = graft.CacheRegistry.persist(
      emb.select(id.cast("long").as("id"), vec.cast(wireType).as("v"))
        .withColumn("nrm", sqrt(dot_product(col("v").cast("array<double>"),
          col("v").cast("array<double>")))))
    cand
      .join(v.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), "id_b")
      .withColumn("cosine", round(
        dot_product(col("v_a").cast("array<double>"), col("v_b").cast("array<double>")) /
          (col("n_a") * col("n_b")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Symmetric per-vector int8 quantization — the memory lever of a
    * billion-vector ANN index (4× smaller than float32, 8× smaller than
    * the double wire format): q_i = floor(x_i·127/max|x| + 0.5), one
    * shared scale per vector. floor(·+0.5) is used instead of round()
    * because the two engines' round() disagree on banker's-vs-away ties,
    * while floor is exact everywhere. All-zero vectors quantize to zeros
    * (guarded division). Returns (id, qv array<long>, scale double).
    */
  def quantizeInt8(emb: DataFrame, id: Column, vec: Column): DataFrame = {
    val e = vec.cast("array<double>")
    val mx = array_max(transform(e, x => abs(x)))
    emb.select(id.cast("long").as("id"),
      when(mx === 0.0, transform(e, x => lit(0L)))
        .otherwise(transform(e, x => floor(x * lit(127.0) / mx + lit(0.5))
          .cast("long"))).as("qv"),
      when(mx === 0.0, lit(0.0)).otherwise(mx / 127.0).as("scale"))
  }

  /** Brute-force top-k over the QUANTIZED vectors, with the exact-search
    * agreement flag per emitted neighbor — the recall instrumentation a
    * quantized index ships with. The quantized cosine is computed purely
    * from integer dot products (exact in doubles regardless of
    * accumulation order: every partial sum is an integer far below 2^53),
    * so ranking is bit-deterministic; `in_exact_topk` marks whether the
    * neighbor also appears in the full-precision top-k (q10 semantics).
    * Query set and join shape mirror [[q10]]'s |Q|·|N| block — at scale
    * the same quantized kernel runs inside IVF cells instead.
    */
  def quantizedTopK(emb: DataFrame, id: Column, vec: Column,
                    nQueries: Int, k: Int): DataFrame = {
    val q = graft.CacheRegistry.persist(
      quantizeInt8(emb, id, vec)
        .withColumn("qd", transform(col("qv"), v => v.cast("double")))
        .withColumn("qn", sqrt(dot_product(col("qd"), col("qd")))))
    val full = graft.CacheRegistry.persist(
      prepVecs(emb, id.cast("long"), vec, "fid", "fv", "fn"))
    def topk(frame: DataFrame, vCol: String, nCol: String,
             idCol: String, scoreAs: String): DataFrame = {
      val pairs = frame.as("a")
        .filter(col(s"a.$idCol") < nQueries)
        .crossJoin(frame.as("b"))
        .filter(col(s"a.$idCol") =!= col(s"b.$idCol"))
        .select(col(s"a.$idCol").as("query_id"),
          col(s"b.$idCol").as("neighbor_id"),
          (dot_product(col(s"a.$vCol"), col(s"b.$vCol")) /
            (col(s"a.$nCol") * col(s"b.$nCol"))).as(scoreAs))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col(scoreAs).desc, col("neighbor_id"))
      pairs.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
    }
    val quant = topk(q, "qd", "qn", "id", "qcos")
    val exact = topk(full, "fv", "fn", "fid", "cos")
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    quant.join(exact, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("qcos"), 6).as("qcosine"),
        coalesce(col("__hit"), lit(0L)).as("in_exact_topk"))
  }

  /** Embedding outliers per group: each group's centroid is the
    * decimal-exact element-wise mean (order-independent accumulation, the
    * kmeansStep discipline — a double sum would drift with partial-agg
    * order), every vector scores cosine against its OWN group's centroid,
    * and the k LOWEST-cosine members per group come out through the
    * skew-proof [[Caps.perGroupCap]] (labels are low-cardinality — the
    * exact key shape a naive per-group window dies on at corpus scale).
    * The cap orders on the round-6 cosine scaled to an integer key
    * (perGroupCap's LONG order contract); ties break on vector id.
    *
    * Returns (grp, vec id, centroid_cos), k rows per group — the
    * mislabeled/noise screening pass of an embedding-quality pipeline.
    */
  def groupOutliers(emb: DataFrame, id: Column, vec: Column, group: Column,
                    k: Int): DataFrame = {
    val v = emb.select(group.as("grp"), id.cast("long").as("vid"),
        vec.cast("array<double>").as("vv"))
      .withColumn("vn", sqrt(dot_product(col("vv"), col("vv"))))
    val centroids = v
      .select(col("grp"), posexplode(col("vv")).as(Seq("pos", "val")))
      .groupBy(col("grp"), col("pos"))
      .agg((sum(col("val").cast("decimal(38,15)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(col("grp"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("cv"))
      .withColumn("cn", sqrt(dot_product(col("cv"), col("cv"))))
    val scored = v.join(broadcast(centroids), Seq("grp"))
      .withColumn("centroid_cos",
        round(dot_product(col("vv"), col("cv")) / (col("vn") * col("cn")), 6))
      // round-6 cosines are multiples of 1e-6, so ·1e6 sits within an
      // epsilon of an integer and round() recovers it exactly — an
      // order-preserving LONG key for the cap
      .withColumn("__cos_key", round(col("centroid_cos") * 1e6).cast("long"))
      .select(col("grp"), col("vid"), col("centroid_cos"), col("__cos_key"))
    Caps.perGroupCap(scored, Seq("grp"), Seq("__cos_key", "vid"), k)
      .drop("__cos_key")
  }

  /** Product-quantization codebooks: the vector space is split into
    * `subspaces` contiguous `subDim`-wide slices and each slice gets its
    * own small codebook, trained with the SAME cosine-Lloyd machinery as
    * IVF ([[kmeansStep]]: broadcast centroids, decimal-exact means) on the
    * sub-vectors. A vector's PQ code is then `subspaces` small ids — the
    * 64× compression lever of billion-scale ANN (Jégou et al. 2011;
    * classic PQ trains L2-k-means, this engine's cosine variant reuses the
    * oracle-reproducible trainer — the compression/ADC mechanics are
    * identical).
    *
    * Returns (sub, cid, cv, cn): one codebook row per (subspace, code).
    */
  def pqCodebooks(emb: DataFrame, id: Column, vec: Column,
                  subspaces: Int, subDim: Int, seedCount: Int,
                  iterations: Int): DataFrame = {
    require(subspaces >= 1 && subDim >= 1, "pqCodebooks: bad geometry")
    (0 until subspaces).map { s =>
      val sliced = emb.select(id.cast("long").as("pid"),
        slice(vec.cast("array<double>"), s * subDim + 1, subDim).as("sv"))
      ivfTrain(sliced, sliced.filter(col("pid") < seedCount),
        col("pid"), col("sv"), iterations)
        .withColumn("sub", lit(s))
    }.reduce(_ unionByName _)
  }

  /** PQ-encode every vector: per subspace, the nearest codeword (argmax
    * cosine, tie on code id) — `subspaces` broadcast assignment passes,
    * no shuffle of the vector table. Returns (vid, sub, code).
    */
  def pqEncode(emb: DataFrame, id: Column, vec: Column,
               codebooks: DataFrame, subspaces: Int, subDim: Int): DataFrame =
    (0 until subspaces).map { s =>
      val sliced = emb.select(id.cast("long").as("eid"),
        slice(vec.cast("array<double>"), s * subDim + 1, subDim).as("sv"))
      ivfAssignCells(sliced, codebooks.filter(col("sub") === s).drop("sub"),
          col("eid"), col("sv"))
        .select(col("vid"), lit(s).as("sub"), col("cell").as("code"))
    }.reduce(_ unionByName _)

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query keeps full
    * precision, the database side is reconstructed from its codewords, and
    * approx_cos(q, x) = Σ_s 〈q_s, cw_s(x)〉 / (‖q‖·‖x̂‖) with
    * ‖x̂‖² = Σ_s ‖cw_s(x)‖². Both cross-subspace sums accumulate in
    * DECIMAL(38,15) — four doubles summed in grouped-aggregation order
    * would be nondeterministic across partial-agg plans and engines;
    * decimal addition is exact and order-free (the kmeansStep
    * discipline). Each emitted neighbor carries the full-precision top-k
    * agreement flag, as in [[quantizedTopK]].
    *
    * `verifyEvery` SAMPLES the agreement instrumentation: the exact
    * (brute-force) side is computed only for queries with
    * `qid % verifyEvery == 0` — a deterministic residue, never rand() —
    * and other queries emit NULL flags. The exact verifier is
    * O(sampled-queries · corpus) by construction; sampling keeps the
    * measured wall dominated by the ADC kernel (the production path)
    * while still auditing recall on a fixed, reproducible query subset.
    * 1 = verify every query (the exhaustive setting for small fixtures).
    *
    * Scale shape: codebooks and the per-query distance tables are
    * config-scale broadcasts; the scored frame shuffles once on
    * (query, vector) for the decimal sum and once per query for the
    * top-k window. At 100 TB the same ADC kernel runs inside IVF cells.
    */
  def pqTopK(emb: DataFrame, id: Column, vec: Column,
             subspaces: Int, subDim: Int, seedCount: Int, iterations: Int,
             nQueries: Int, k: Int,
             booksIn: Option[DataFrame] = None,
             candidates: Option[DataFrame] = None,
             verifyEvery: Int = 1): DataFrame = {
    val books = booksIn.getOrElse(graft.CacheRegistry.persist(
      pqCodebooks(emb, id, vec, subspaces, subDim, seedCount, iterations)))
    val codes0 = pqEncode(emb, id, vec, books, subspaces, subDim)
    // IVF-PQ restriction: keep only (query, vector) pairs whose vector
    // sits in one of the query's probed coarse cells. The codes frame is
    // replicated per matching query BEFORE the codebook join so the ADC
    // partial-sum shuffle only carries surviving pairs.
    val codes = candidates match {
      case None => codes0
      case Some(cand) => codes0.join(cand, Seq("vid"))
    }
    val queries = (0 until subspaces).map { s =>
      emb.filter(id.cast("long") < nQueries)
        .select(id.cast("long").as("qid"), lit(s).as("sub"),
          slice(vec.cast("array<double>"), s * subDim + 1, subDim).as("qv"))
    }.reduce(_ unionByName _)
    val qNorms = prepVecs(emb.filter(id.cast("long") < nQueries),
      id.cast("long"), vec, "qid", "qfull", "qn").select(col("qid"), col("qn"))
    val partials = codes
      .join(broadcast(books), Seq("sub"))
      .filter(col("code") === col("cid"))
      // restricted codes already carry their qid — equi-join it so each
      // surviving pair meets exactly its own query's slices
      .join(broadcast(queries),
        if (candidates.isDefined) Seq("sub", "qid") else Seq("sub"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        dot_product(col("qv"), col("cv")).cast("decimal(38,15)").as("p"),
        (col("cn") * col("cn")).cast("decimal(38,15)").as("cn2"))
    val scored = partials.groupBy(col("qid"), col("vid"))
      .agg(sum(col("p")).cast("double").as("approx_dot"),
        sqrt(sum(col("cn2")).cast("double")).as("recon_norm"))
      .join(broadcast(qNorms), Seq("qid"))
      .withColumn("pq_cos",
        round(col("approx_dot") / (col("qn") * col("recon_norm")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("pq_cos").desc, col("vid"))
    val top = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
    val full = prepVecs(emb, id.cast("long"), vec, "fid", "fv", "fn")
    val exactPairs = full.as("a")
      .filter(col("a.fid") < nQueries &&
        pmod(col("a.fid"), lit(verifyEvery.toLong)) === 0)
      .crossJoin(full.as("b")).filter(col("a.fid") =!= col("b.fid"))
      .select(col("a.fid").as("qid"), col("b.fid").as("vid"),
        (dot_product(col("a.fv"), col("b.fv")) /
          (col("a.fn") * col("b.fn"))).as("cos"))
    val exactTop = exactPairs
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vid"), lit(1L).as("__hit"))
    top.join(exactTop, Seq("qid", "vid"), "left")
      .select(col("qid").as("query_id"), col("rank"),
        col("vid").as("neighbor_id"), col("pq_cos"),
        // unsampled queries report NULL (unaudited), not 0 (a miss)
        when(pmod(col("qid"), lit(verifyEvery.toLong)) === 0,
          coalesce(col("__hit"), lit(0L)))
          .otherwise(lit(null).cast("long")).as("in_exact_topk"))
  }

  /** IVF-PQ: coarse-quantize with a trained IVF centroid frame (from
    * [[ivfTrain]] — shareable across queries), then run [[pqTopK]]'s ADC
    * kernel only on vectors inside each query's `probes` nearest coarse
    * cells. This is the billion-scale ANN composition (IVFADC, Jégou et
    * al. 2011): the full-corpus ADC scan of [[pqTopK]] touches every code
    * per query; here the per-query candidate set is the probed cells'
    * contents, so work scales with probes/cells of the corpus, not the
    * corpus. Residual encoding is deliberately NOT used — codebooks
    * quantize raw sub-vectors so the cosine-Lloyd trainer stays
    * oracle-reproducible; the probing/ADC mechanics are the paper's.
    *
    * Scale shape: centroids and codebooks are config-scale broadcasts;
    * both assignment passes are map-side. The only data-scale shuffles
    * are the probed-cell candidate join (keyed on cell — cell count is an
    * operator knob sized ∝ corpus, the q79 discipline) and the ADC
    * partial sum keyed on (query, vector), which now carries only probed
    * candidates.
    */
  def ivfPqTopK(emb: DataFrame, id: Column, vec: Column, trained: DataFrame,
                subspaces: Int, subDim: Int, seedCount: Int, iterations: Int,
                probes: Int, nQueries: Int, k: Int,
                booksIn: Option[DataFrame] = None,
                verifyEvery: Int = 1): DataFrame =
    pqTopK(emb, id, vec, subspaces, subDim, seedCount, iterations,
      nQueries, k, booksIn,
      Some(ivfProbedCandidates(emb, id, vec, trained, probes, nQueries)),
      verifyEvery)

  /** The coarse-probe candidate set of [[ivfPqTopK]]: (qid, vid) pairs
    * where vid sits in one of qid's `probes` nearest trained cells.
    * Exposed so scale rehearsals can count the candidate volume the
    * probe buys directly (vs the full scan's nQueries·(n−1)).
    */
  def ivfProbedCandidates(emb: DataFrame, id: Column, vec: Column,
                          trained: DataFrame, probes: Int,
                          nQueries: Int): DataFrame = {
    val assigned = ivfAssignCells(emb, trained, id, vec)
      .select(col("vid"), col("cell"))
    val qv = prepVecs(emb.filter(id.cast("long") < nQueries),
      id.cast("long"), vec, "qid", "qv", "qn")
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("__cos").desc, col("cid"))
    val probed = qv.crossJoin(broadcast(trained))
      .withColumn("__cos",
        dot_product(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= probes)
      .select(col("qid"), col("cid").as("cell"))
    probed.join(assigned, Seq("cell"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"))
  }
}
