package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch-based near-dup operators for the training-data pipeline:
  * MinHash + LSH banding and SimHash. Both are built on a deterministic
  * dictionary encoding (rank of the shingle/token in sorted order) so the
  * DuckDB oracle can reproduce the signatures bit-for-bit — a production
  * deployment would swap the rank dictionary for a 64-bit string hash
  * without touching the pipeline shape.
  *
  * Scale shape: signatures are one narrow row per document (k small ints);
  * the LSH candidate join shuffles on (band, bandKey) — band keys are
  * near-uniform, so the join scales linearly while restricting the
  * quadratic verification to same-bucket candidates.
  */
object Sketches {

  val MinhashPrime = 2147483647L // 2^31 − 1
  // Large odd multipliers so (a·sid + b) mod p wraps thoroughly — small
  // multipliers leave the map monotone in sid, collapsing all signatures to
  // a function of min(sid).
  val MinhashA: Seq[Long] = Seq(1103527591L, 59559189L, 1163074433L, 119106031L,
    1222621277L, 178652875L, 1282168119L, 238199717L, 1341714963L, 297746561L,
    1401261805L, 357293403L, 1460808649L, 416840247L, 1520355491L, 476387089L)
  val MinhashB: Seq[Long] = Seq(456789L, 988111110L, 1975765431L, 815936105L,
    1803590426L, 643761100L, 1631415421L, 471586095L, 1459240416L, 299411090L,
    1287065411L, 127236085L, 1114890406L, 2102544727L, 942715401L, 1930369722L)

  /** (doc, sid) pairs: distinct word n-gram shingles dictionary-encoded by
    * their rank in sorted shingle order (deterministic across engines).
    * The rank window is global but runs over the *vocabulary*, which is
    * orders of magnitude smaller than the corpus.
    */
  private def rankedShingles(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slices = spark.sparkContext.defaultParallelism
    val sh = docs.select(id.cast("long"), text.cast("string")).as[(Long, String)]
      .repartition(slices)
      .flatMap { case (d, t) => Dedup.distinctShingles(t, n).map(g => (d, g)) }
      .toDF("doc", "shingle")
    val dict = sh.select(col("shingle")).distinct()
      .withColumn("sid", row_number().over(Window.orderBy(col("shingle"))).cast("long"))
    // vocab scales with the corpus — shuffle join on the shingle; AQE
    // broadcasts when the dictionary is actually small
    sh.join(dict, "shingle").select(col("doc"), col("sid"))
  }

  /** MinHash signatures: one row per doc with columns mh0..mh{k-1},
    * mh_k = min over shingles of (a_k·sid + b_k) mod p. Single map-side
    * combinable aggregation — one shuffle on the doc id.
    */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column,
                        n: Int = 2, k: Int = 16): DataFrame = {
    val enc = rankedShingles(docs, id, text, n)
    val aggs = (0 until k).map { i =>
      min((col("sid") * MinhashA(i) + MinhashB(i)) % MinhashPrime).as(s"mh$i")
    }
    enc.groupBy(col("doc")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH candidate pairs: docs sharing at least one band
    * (bands × rowsPerBand = k), with the estimated Jaccard = fraction of
    * matching minhashes. Banding is the standard
    * shingle→minhash→band→bucket-join pipeline.
    */
  def minhashLshPairs(docs: DataFrame, id: Column, text: Column,
                      n: Int = 2, bands: Int = 4, rowsPerBand: Int = 4,
                      minEstSim: Double = 0.0): DataFrame = {
    val k = bands * rowsPerBand
    val sig = minhashSignatures(docs, id, text, n, k)
    val bandRows = (0 until bands).map { bnd =>
      val key = concat_ws(":",
        (0 until rowsPerBand).map(r => col(s"mh${bnd * rowsPerBand + r}")): _*)
      sig.select(col("doc"), lit(bnd).as("band"), key.as("band_key"))
    }.reduce(_ unionByName _)
    val cand = bandRows.as("a").join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b")).distinct()
    val matches = (0 until k).map(i =>
      when(col(s"sa.mh$i") === col(s"sb.mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sig.as("sa"), col("id_a") === col("sa.doc"))
      .join(sig.as("sb"), col("id_b") === col("sb.doc"))
      .select(col("id_a"), col("id_b"),
        (matches.cast("double") / k).as("est_sim"))
      .filter(col("est_sim") >= minEstSim)
  }

  /** SimHash signatures over unigram tokens (with multiplicity): token →
    * rank-id → mixed 31-bit hash h; bit i of the signature is set iff
    * Σ_tokens (bit_i(h) ? +1 : −1) > 0.
    */
  def simhashSignatures(docs: DataFrame, id: Column, text: Column,
                        bits: Int = 31): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slices = spark.sparkContext.defaultParallelism
    val toks = docs.select(id.cast("long"), text.cast("string")).as[(Long, String)]
      .repartition(slices)
      .flatMap { case (d, t) => t.trim.split("\\s+").iterator.map(w => (d, w)) }
      .toDF("doc", "token")
    val dict = toks.select(col("token")).distinct()
      .withColumn("sid", row_number().over(Window.orderBy(col("token"))).cast("long"))
    val h = (col("sid") * lit(1299721L) + lit(104729L)) % MinhashPrime
    val enc = toks.join(dict, "token").select(col("doc"), h.as("h"))
    val sums = (0 until bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$i")
    }
    val agged = enc.groupBy(col("doc")).agg(sums.head, sums.tail: _*)
    val sig = (0 until bits).map(i =>
      when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)).reduce(_ + _)
    agged.select(col("doc"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: hamming distance of signatures ≤ maxHamming.
    * Signatures are one long per doc, so the pair scan runs as a broadcast
    * + tight per-partition loop (a DF self-join would evaluate the
    * hamming predicate interpreted inside the nested-loop join condition —
    * ~100× slower per pair).
    */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
                   maxHamming: Int, bits: Int = 31): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slices = spark.sparkContext.defaultParallelism
    val arr = simhashSignatures(docs, id, text, bits)
      .as[(Long, Long)].collect().sortBy(_._1)
    val side = spark.sparkContext.broadcast(arr)
    spark.createDataset(arr.toIndexedSeq).repartition(slices).mapPartitions { it =>
      val as = side.value
      it.flatMap { case (bId, bSig) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var ai = 0
        while (ai < as.length && as(ai)._1 < bId) {
          val h = java.lang.Long.bitCount(as(ai)._2 ^ bSig).toLong
          if (h <= maxHamming) out += ((as(ai)._1, bId, h))
          ai += 1
        }
        out
      }
    }.toDF("id_a", "id_b", "hamming")
  }

  /** Polynomial rolling hash (Karp–Rabin) of the full text: fold over
    * codepoints, acc = (acc·31 + code) mod 1e9+7. Kept as a Catalyst
    * `aggregate` fold so the oracle's `list_reduce` reproduces it exactly.
    */
  def rollingHash(text: Column): Column = {
    val codes = transform(split(text, ""), c => ascii(c).cast("long"))
    aggregate(codes, lit(0L), (acc, x) => (acc * 31L + x) % 1000000007L)
  }
}
