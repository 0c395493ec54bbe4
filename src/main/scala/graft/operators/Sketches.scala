package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** Sketch-based near-dup operators for the training-data pipeline:
  * MinHash + LSH banding and SimHash.
  *
  * Both are built on the dictionary-free [[TextHash.poly]] encoding
  * (shingle/token → 31-bit polynomial hash), which the DuckDB oracle
  * reproduces bit-for-bit with `list_reduce`. There is no vocabulary
  * distinct, no dictionary join, and no global window anywhere in the
  * pipeline — per-document shingling and hashing are embarrassingly
  * parallel, and the only shuffles are the per-doc signature aggregation
  * (map-side combinable) and the LSH bucket join (near-uniform keys).
  *
  * Scale shape: signatures are one narrow row per document (k small ints);
  * the LSH candidate join shuffles on (band, bandKey), restricting the
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

  // SimHash per-token mixer constants (shared with the oracle CTE): a
  // 32-bit prime multiplier (2^32−5) against a 63-bit prime modulus
  // (2^63−25) keeps sid·a+b inside the signed-64 range in BOTH engines
  // (max 31-bit sid × (2^32−5) ≈ 2^63 − 1.7e15) while the mixed hash spans
  // all 63 signature bits — at maxHamming=2 each banding chunk then keys on
  // 21 bits, so bucket sizes stay sub-linear in corpus size (a 31-bit
  // signature left only ~10 bits per chunk and the candidate join grew
  // quadratically).
  val SimhashMulA = 4294967291L
  val SimhashAddB = 104729L
  val SimhashMod = 9223372036854775783L
  val SimhashBits = 63

  /** (doc, sid) pairs: distinct word n-gram shingles per document, encoded
    * with the 31-bit polynomial hash. Pure flatMap — no dictionary.
    */
  private def hashedShingles(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slices = spark.sparkContext.defaultParallelism
    docs.select(id.cast("long"), text.cast("string")).as[(Long, String)]
      .repartition(slices)
      .flatMap { case (d, t) =>
        Dedup.distinctShingles(t, n).map(g => (d, TextHash.poly(g, TextHash.Mod31)))
      }
      .toDF("doc", "sid")
  }

  /** MinHash signatures: one row per doc with columns mh0..mh{k-1},
    * mh_k = min over shingles of (a_k·sid + b_k) mod p. Single map-side
    * combinable aggregation — one shuffle on the doc id.
    */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column,
                        n: Int = 2, k: Int = 16): DataFrame = {
    val enc = hashedShingles(docs, id, text, n)
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
    // the signature frame feeds every band branch of the candidate join
    // plus both verify joins (~6 plan copies): ReuseExchange dedupes the
    // shuffle write but re-runs the post-shuffle aggregation per branch —
    // persist the (1 narrow row per doc) frame instead
    val sig = graft.CacheRegistry.persist(minhashSignatures(docs, id, text, n, k))
    val cand = lshCandidates(sig, bands, rowsPerBand)
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

  /** Distinct candidate pairs (id_a < id_b) sharing at least one LSH band of
    * a minhash signature frame (columns doc, mh0..mh{k-1}). The shuffle key
    * (band, band_key) is near-uniform; the distinct bounds duplicate
    * candidates from multi-band matches.
    */
  def lshCandidates(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandRows = (0 until bands).map { bnd =>
      val key = concat_ws(":",
        (0 until rowsPerBand).map(r => col(s"mh${bnd * rowsPerBand + r}")): _*)
      sig.select(col("doc"), lit(bnd).as("band"), key.as("band_key"))
    }.reduce(_ unionByName _)
    bandRows.as("a").join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b")).distinct()
  }

  /** SimHash signatures over unigram tokens (with multiplicity): token →
    * 31-bit poly hash → 63-bit mixed hash h; bit i of the signature is set
    * iff Σ_tokens (bit_i(h) ? +1 : −1) > 0.
    */
  def simhashSignatures(docs: DataFrame, id: Column, text: Column,
                        bits: Int = SimhashBits): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slices = spark.sparkContext.defaultParallelism
    val enc = docs.select(id.cast("long"), text.cast("string")).as[(Long, String)]
      .repartition(slices)
      .flatMap { case (d, t) =>
        t.trim.split("\\s+").iterator.map { w =>
          val sid = TextHash.poly(w, TextHash.Mod31)
          (d, (sid * SimhashMulA + SimhashAddB) % SimhashMod)
        }
      }
      .toDF("doc", "h")
    val sums = (0 until bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$i")
    }
    val agged = enc.groupBy(col("doc")).agg(sums.head, sums.tail: _*)
    val sig = (0 until bits).map(i =>
      when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)).reduce(_ + _)
    agged.select(col("doc"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: hamming distance ≤ maxHamming, found by
    * hamming-chunk banding (Gionis-style): split the signature into
    * maxHamming+1 disjoint bit chunks — any pair within distance maxHamming
    * must agree on at least one whole chunk (pigeonhole), so candidates =
    * equi-join on (chunk index, chunk value) with **guaranteed complete
    * recall**, then verify `bit_count(xor) ≤ maxHamming` exactly. Fully
    * declarative: the join shuffles on near-uniform chunk keys; the verify
    * runs codegen'd built-ins. No driver-side pass anywhere.
    */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
                   maxHamming: Int, bits: Int = SimhashBits): DataFrame = {
    // one narrow row per doc, scanned by every banding branch and both
    // verify joins (~5 plan copies otherwise) — persist it once
    val sig = graft.CacheRegistry.persist(simhashSignatures(docs, id, text, bits))
    val nChunks = maxHamming + 1
    val width = (bits + nChunks - 1) / nChunks
    val chunkRows = (0 until nChunks).map { c =>
      sig.select(col("doc"), lit(c).as("chunk"),
        shiftright(col("simhash"), c * width)
          .bitwiseAND((1L << width) - 1).as("chunk_val"))
    }.reduce(_ unionByName _)
    val cand = chunkRows.as("a").join(chunkRows.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b")).distinct()
    cand
      .join(sig.withColumnRenamed("doc", "id_a").withColumnRenamed("simhash", "sig_a"), "id_a")
      .join(sig.withColumnRenamed("doc", "id_b").withColumnRenamed("simhash", "sig_b"), "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Polynomial rolling hash (Karp–Rabin) of the full text: fold over
    * codepoints, acc = (acc·31 + code) mod 1e9+7. Kept as a Catalyst
    * `aggregate` fold so the oracle's `list_reduce` reproduces it exactly.
    */
  def rollingHash(text: Column): Column = {
    val codes = transform(split(text, ""), c => ascii(c).cast("long"))
    aggregate(codes, lit(0L), (acc, x) => (acc * 31L + x) % 1000000007L)
  }

  /** Engine-portable 60-bit value hash: the first 15 hex digits of the
    * value's md5, parsed as an integer. Both engines emit identical
    * lowercase md5 hex, so Spark's `conv(hex, 16, 10)` and the oracle's
    * hex-digit fold ([[duckdbMd5Hash60]]) agree bit-for-bit — a uniform
    * hash in [0, 2^60) whose collision odds are negligible at any corpus
    * size, with no engine-private hash (xxhash64 etc.) anywhere.
    */
  def md5Hash60(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[md5Hash60]] for oracle CTEs. */
  def duckdbMd5Hash60(colExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(substr(md5($colExpr), 1, 15), ''), " +
      s"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), " +
      s"(a, x) -> a*16 + x)"

  val KmvHashSpace: Double = 1152921504606846976.0 // 2^60, exact in a double

  /** KMV (k-minimum-values) distinct-count sketch per group (Bar-Yossef
    * et al. 2002): keep each group's k smallest distinct 60-bit value
    * hashes; with U = kth smallest hash normalized to [0,1], E[U] ≈ k/(n+1)
    * gives the unbiased estimator n̂ = (k−1)/U. Groups with fewer than k
    * distinct values report their exact count.
    *
    * Physical shape: one distinct on (group, hash) — map-side combinable,
    * uniform 60-bit keys — then the per-group k-smallest via the
    * skew-proof two-phase [[Caps.perGroupCap]] (bounded heap per task,
    * global window only over ≤ k·partitions survivors), so a
    * low-cardinality group column (language, source domain) never funnels
    * a 100 TB corpus through single tasks. The estimate arithmetic is
    * IEEE-exact and engine-portable: (k−1)·2^60 is an exact double
    * product, and one double division + floor is bit-identical in Spark
    * and the oracle.
    *
    * Returns (grp, n_seen, kth_min_hash, est_distinct).
    */
  def kmvDistinct(df: DataFrame, group: Column, value: Column,
                  k: Int): DataFrame = {
    require(k >= 2, s"kmvDistinct: k must be >= 2, got $k")
    val hashed = df.select(group.as("grp"), md5Hash60(value).as("hv")).distinct()
    val topk = Caps.perGroupCap(hashed, Seq("grp"), Seq("hv"), k)
    topk.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_seen"), max(col("hv")).as("kth_min_hash"))
      .withColumn("est_distinct",
        when(col("n_seen") < k, col("n_seen"))
          .otherwise(floor(lit((k - 1).toDouble * KmvHashSpace) /
            col("kth_min_hash").cast("double")).cast("long")))
  }

  /** HyperLogLog register sketch per group (Flajolet et al. 2007):
    * bucket = low `bucketBits` bits of the 60-bit md5 hash, register =
    * max over the bucket's values of rho = (leading-zero count of the
    * remaining `60 − bucketBits` bits) + 1. The register frame IS the
    * mergeable sketch state — `groupBy(grp, bucket).max(register)` is
    * map-side combinable and unions of corpora merge by the same max.
    *
    * rho is computed with integer-exact bit length (`bin()` string length,
    * identical minimal-digit semantics in Spark and DuckDB) — no
    * floating log2 whose ULP could flip a floor at bucket boundaries.
    *
    * Returns (grp, bucket, register).
    */
  def hllRegisters(df: DataFrame, group: Column, value: Column,
                   bucketBits: Int): DataFrame = {
    require(bucketBits >= 2 && bucketBits <= 16,
      s"hllRegisters: bucketBits must be in [2,16], got $bucketBits")
    val m = 1L << bucketBits
    val width = 60 - bucketBits
    val hv = md5Hash60(value)
    // integer bit shift, not a double divide: hv spans the full 60 bits
    // and doubles lose integer exactness past 2^53
    val rest = shiftright(hv, bucketBits)
    val rho = when(col("__rest") === 0, lit(width + 1))
      .otherwise(lit(width + 1) - length(bin(col("__rest"))))
    df.select(group.as("grp"), pmod(hv, lit(m)).as("bucket"), rest.as("__rest"))
      .withColumn("rho", rho.cast("long"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("register"))
  }

  // Row-hash constants for the count-min / Bloom position hashes:
  // pos_r = ((sid·A_r + B_r) mod 2^31−1) mod width. Large odd multipliers
  // (same family as MinHash's) so the maps are far from monotone in sid;
  // sid < 2^31 and A_r < 2^31 keep sid·A_r + B_r inside Int64 in both
  // engines.
  val RowHashA: Seq[Long] = Seq(1103527591L, 1163074433L, 1222621277L,
    1282168119L)
  val RowHashB: Seq[Long] = Seq(456789L, 988111110L, 1975765431L, 815936105L)

  /** The position hash shared by [[countMin]] and [[bloomBits]] — and
    * interpolated into the oracle SQL verbatim via [[duckdbPosHash]].
    */
  def posHash(sid: Column, row: Int, width: Int): Column =
    pmod(pmod(sid * RowHashA(row) + RowHashB(row), lit(MinhashPrime)),
      lit(width.toLong))

  def duckdbPosHash(sidExpr: String, row: Int, width: Int): String =
    s"((($sidExpr) * ${RowHashA(row)} + ${RowHashB(row)}) % $MinhashPrime) % $width"

  /** Count-min sketch (Cormode & Muthukrishnan 2005) of token frequencies:
    * a depth×width counter matrix where row r increments cell
    * posHash_r(token); the point estimate for a token is the MIN over
    * rows of its cell — an overestimate by at most the row collision
    * mass, never an underestimate. The matrix build is ONE combinable
    * count on (row, col) after a depth-fold flatout — constant-size
    * (depth·width rows) mergeable state by cell-wise ADDITION, the
    * frequency member of the sketch family (KMV/HLL count distincts;
    * this counts occurrences).
    *
    * `items` must carry a 31-bit item id column `sid` (e.g.
    * [[graft.functions.TextHash.poly]] of the token) — one row per
    * OCCURRENCE. Returns the matrix (row, col, n).
    */
  def countMin(items: DataFrame, sid: Column, depth: Int,
               width: Int): DataFrame = {
    require(depth >= 1 && depth <= RowHashA.size,
      s"countMin: depth must be in [1, ${RowHashA.size}], got $depth")
    require(width >= 2, s"countMin: width must be >= 2, got $width")
    val s = sid.cast("long")
    (0 until depth).map { r =>
      items.select(lit(r.toLong).as("row"), posHash(s, r, width).as("col"))
    }.reduce(_ unionByName _)
      .groupBy(col("row"), col("col")).agg(count(lit(1)).as("n"))
  }

  /** Bloom-filter bit set over distinct item ids: `hashes` position
    * hashes per item into a `width`-bit space, state = the DISTINCT set
    * bit positions — bounded by `width` rows no matter the corpus (the
    * relational form of the bitmap; mergeable by union). An item is
    * "possibly present" iff ALL its positions are set — no false
    * negatives, false-positive rate ≈ (set_bits/width)^hashes, and the
    * verdicts are deterministic and engine-reproducible (the oracle
    * derives the same bit set).
    */
  def bloomBits(items: DataFrame, sid: Column, hashes: Int,
                width: Int): DataFrame = {
    require(hashes >= 1 && hashes <= RowHashA.size,
      s"bloomBits: hashes must be in [1, ${RowHashA.size}], got $hashes")
    val s = sid.cast("long")
    (0 until hashes).map { r =>
      items.select(posHash(s, r, width).as("bit"))
    }.reduce(_ unionByName _).distinct()
  }

  /** The numerator constant alpha_m·m²·2^(width+1) of [[hllEstimate]],
    * exposed so the oracle SQL interpolates the SAME Scala-computed double
    * (Double.toString round-trips bit-exactly through DuckDB's parser).
    */
  def hllNumerator(bucketBits: Int): Double = {
    val m = 1L << bucketBits
    val width = 60 - bucketBits
    (0.7213 / (1.0 + 1.079 / m)) * (m * m).toDouble * (1L << (width + 1)).toDouble
  }

  /** Raw HLL cardinality estimate per group from a [[hllRegisters]] frame:
    * alpha_m · m² / Σ_b 2^(−M_b), with empty buckets entering the harmonic
    * sum at register 0. The sum is computed as an INTEGER — each bucket
    * contributes 2^(width+1 − M_b), empty buckets 2^(width+1), so the only
    * floating-point steps are one exactly-representable scaling and one
    * division: bit-identical across engines regardless of aggregation
    * order (an unscaled double harmonic sum would not be — double addition
    * is order-sensitive and Spark's partial aggregation order is
    * nondeterministic).
    *
    * Bias corrections (linear counting below 2.5m, the 2^32 clamp) are
    * deliberately NOT applied: they need `ln`, whose last-ULP behavior is
    * libm-specific; the raw estimate plus `n_zero_buckets` lets any
    * consumer apply its own correction. Returns
    * (grp, n_zero_buckets, harmonic_sum_scaled, est_raw).
    */
  def hllEstimate(registers: DataFrame, bucketBits: Int): DataFrame = {
    val m = 1L << bucketBits
    val width = 60 - bucketBits
    registers
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_present"),
        // 2^(width+1−reg) via pow: exact powers of two are exactly
        // representable doubles, so the cast back to long is lossless
        // (shiftleft won't take a column shift amount)
        sum(pow(lit(2.0), lit(width + 1) - col("register")).cast("long"))
          .as("present_sum"))
      .select(col("grp"),
        (lit(m) - col("n_present")).as("n_zero_buckets"),
        (col("present_sum") +
          (lit(m) - col("n_present")) * lit(1L << (width + 1)))
          .as("harmonic_sum_scaled"))
      .withColumn("est_raw",
        floor(lit(hllNumerator(bucketBits)) /
          col("harmonic_sum_scaled").cast("double")).cast("long"))
  }
}
