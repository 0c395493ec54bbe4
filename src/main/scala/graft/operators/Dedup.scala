package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextHash
import graft.functions.VectorExpressions.{dot_product, sorted_intersect_count}

/** Deduplication operators for a training-data pipeline over `documents`.
  *
  * Exact dedup is a hash-groupBy (one shuffle on the content hash — uniform
  * keys, no skew, scales linearly).
  *
  * N-gram Jaccard near-dup is EXACT and fully distributed under either of
  * two physical strategies (see [[Dedup.JaccardStrategy]]):
  *
  *  - prefix filtering (the set-similarity-join technique of
  *    PPJoin/AllPairs): order every document's shingles by ascending
  *    global frequency; a pair with Jaccard ≥ t must share a shingle
  *    inside both documents' first `|S| − ⌈t·|S|⌉ + 1` shingles in that
  *    order (pigeonhole on the overlap bound |A∩B| ≥ t·max(|A|,|B|)) —
  *    selective exactly when the vocabulary is Zipf-shaped;
  *  - a blocked all-pairs join with size-ratio pruning and the same
  *    codegen'd two-pointer intersection — the better plan when the
  *    vocabulary is small and every shingle is hot (prefixes degenerate
  *    to ~everything and only add candidate-join overhead).
  *
  * Both have complete recall, no driver-side pass, every stage a plain
  * shuffle; [[Dedup.AutoStrategy]] picks by a distinct-shingle stats job.
  */
object Dedup {

  /** Exact duplicate groups by content hash; reports group size and the
    * canonical (minimum) id kept per group.
    */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(md5(text).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(id).as("keep_id"))

  /** `(doc, sid, sz)` rows: distinct word n-gram shingles per document encoded
    * with the 57-bit polynomial hash (collision odds ~1e-8 at a 1M-shingle
    * vocabulary — nothing multiplies these ids, so the full width is
    * available). Built in a typed flatMap: a sliding window over whitespace
    * tokens compiles to plain JIT'd Scala — interpreted higher-order
    * Catalyst expressions (transform/slice/concat_ws) cost ~100µs per
    * shingle. Semantics match [[TextAnalysis.shinglesFromTokens]]: distinct
    * space-joined n-grams, the whole text as one shingle when shorter than
    * n tokens. `sz` is the document's distinct-shingle count, stamped on
    * every posting row while it is known for free in the flatMap — strategies
    * that need per-doc sizes read it off the row instead of paying a
    * groupBy-and-join round trip.
    */
  private def hashedShingles(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slices = spark.sparkContext.defaultParallelism
    docs.select(id.cast("long"), text.cast("string")).as[(Long, String)]
      .repartition(slices)
      .flatMap { case (d, t) =>
        // distinct strings can collide to one sid; dedupe after hashing so
        // set sizes are consistent with the encoded sets
        val hs = distinctShingles(t, n).map(g => TextHash.poly(g, TextHash.Mod57))
        java.util.Arrays.sort(hs)
        var w = 0
        var i = 0
        while (i < hs.length) {
          if (i == 0 || hs(i) != hs(i - 1)) { hs(w) = hs(i); w += 1 }
          i += 1
        }
        hs.take(w).iterator.map(h => (d, h, w))
      }
      .toDF("doc", "sid", "sz")
  }

  /** Physical strategy for the exact Jaccard self-join. The best shape is a
    * property of the CORPUS, not the engine:
    *
    *  - [[PrefixFilter]] (PPJoin/AllPairs): right for natural text, where
    *    the vocabulary is Zipf-shaped — rare shingles exist, prefixes are
    *    selective, candidates stay near-linear.
    *  - [[CountJoin]]: the standard exact set-similarity plan when prefixes
    *    degenerate (small, hot vocabulary): self-join the postings on the
    *    shingle id, count co-occurrences per ordered doc pair — that count
    *    IS |A∩B|, so no per-pair array intersection and no doc-set arrays
    *    are ever built. Two shuffles (join on `sid`, map-side-combinable
    *    groupBy on the pair), both on high-cardinality keys. Pair rows that
    *    share no shingle never exist, which is exactly right for any
    *    threshold > 0.
    *  - [[AllPairsBlocked]]: a blocked all-pairs sort-merge join with
    *    size-ratio pruning and a codegen'd two-pointer intersection — kept
    *    for corpora where per-doc shingle sets are large but pair counts
    *    explode the count-join's joined-row stream (|A∩B| rows per pair vs
    *    1 row per pair carrying two arrays).
    *  - [[BitsetBlocked]]: the small-vocabulary SPECIALIST. When the whole
    *    corpus vocabulary fits a fixed bitmask (≤ `vocabCutoff` distinct
    *    shingles → ≤ 2 KB per doc), encode every document's shingle set as
    *    packed longs, tile documents into blocks, and evaluate each tile
    *    pair in a tight flatMap loop: the intersection is popcount-of-AND
    *    over ~⌈V/64⌉ words — an order of magnitude less work per pair than
    *    a two-pointer array merge, and with NO per-pair join-row overhead
    *    (the O(n²) pair stream never exists as Catalyst rows, only as loop
    *    iterations inside ~B²/2 tile-pair tasks). The vocabulary dictionary
    *    is optimizer metadata (≤ cutoff longs), not data — collecting it is
    *    the same class of move as AutoStrategy's stats job.
    *  - [[AutoStrategy]]: decide from a corpus statistic (distinct-shingle
    *    count over the postings frame that every path builds anyway — a
    *    sub-second stats job, the same move a cost-based optimizer makes).
    *    Small vocabulary → [[BitsetBlocked]], else [[PrefixFilter]].
    */
  sealed trait JaccardStrategy
  case object PrefixFilter extends JaccardStrategy
  case object CountJoin extends JaccardStrategy
  final case class AllPairsBlocked(blocks: Int = 64) extends JaccardStrategy
  final case class BitsetBlocked(blocks: Int = 64) extends JaccardStrategy
  final case class AutoStrategy(vocabCutoff: Long = 1 << 14) extends JaccardStrategy

  /** N-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ threshold),
    * exact under every strategy — the strategy changes the plan shape, not
    * the result. Requires threshold > 0 (a zero threshold has no prefix or
    * size bound — the result at that point is the cross product, which no
    * strategy saves).
    */
  def ngramJaccardPairs(docs: DataFrame, id: Column, text: Column,
                        n: Int, threshold: Double,
                        strategy: JaccardStrategy = AutoStrategy()): DataFrame = {
    require(threshold > 0, "similarity join requires threshold > 0")
    // persist the postings: the stats job (AutoStrategy) and both branches
    // of every self-join strategy scan this frame — one narrow row per
    // (doc, shingle), built once. Registered for session-scoped cleanup.
    val sh = graft.CacheRegistry.persist(hashedShingles(docs, id, text, n))
    strategy match {
      case AutoStrategy(cutoff) =>
        val vocab = sh.select(col("sid")).distinct().count()
        val chosen = if (vocab <= cutoff) BitsetBlocked() else PrefixFilter
        jaccardFrom(sh, threshold, chosen)
      case s => jaccardFrom(sh, threshold, s)
    }
  }

  private def jaccardFrom(sh: DataFrame, threshold: Double,
                          strategy: JaccardStrategy): DataFrame = strategy match {
    case BitsetBlocked(blocks) =>
      val spark = sh.sparkSession
      import spark.implicits._
      // The vocabulary dictionary: bounded by construction (this strategy is
      // only right when the vocab is tiny), so the collect is optimizer
      // metadata — the data-scale frames never leave the executors.
      val dict: Array[Long] = sh.select(col("sid")).distinct().as[Long].collect()
      java.util.Arrays.sort(dict)
      val bcDict = spark.sparkContext.broadcast(dict)
      val words = (dict.length + 63) >> 6
      // one packed-bitmask row per doc, built in a single narrow shuffle of
      // the persisted postings; z = |set| (post-hash-dedupe, same as sz)
      val masks = sh.select(col("doc"), col("sid")).as[(Long, Long)]
        .groupByKey(_._1)
        .mapGroups { (d, it) =>
          val dd = bcDict.value
          val m = new Array[Long](words)
          var z = 0
          while (it.hasNext) {
            val idx = java.util.Arrays.binarySearch(dd, it.next()._2)
            if (idx >= 0) {
              val w = idx >> 6
              val bit = 1L << (idx & 63)
              if ((m(w) & bit) == 0L) { m(w) |= bit; z += 1 }
            }
          }
          (d, ((d % blocks) + blocks).toInt % blocks, z, m)
        }.toDF("id", "g", "z", "mask")
      val tiles = masks.groupBy(col("g"))
        .agg(collect_list(struct(col("id"), col("z"), col("mask"))).as("docs"))
      val blockPairs = (for {
        ga <- 0 until blocks
        gb <- ga until blocks
      } yield (ga, gb)).toDF("ga", "gb")
      val k = spark.sparkContext.defaultParallelism * 4
      val t0 = threshold
      // ~B²/2 tile-pair rows, round-robin spread so every core gets an even
      // share of the O(n²) loop; the repartition survives AQE (the inputs
      // are tiny but the LOOP inside each row is the real work).
      val paired = blockPairs
        .join(tiles.select(col("g").as("ga"), col("docs").as("da")), "ga")
        .join(tiles.select(col("g").as("gb"), col("docs").as("db")), "gb")
        .repartition(k)
      paired
        .select(col("ga"), col("gb"), col("da"), col("db"))
        .as[(Int, Int, Array[(Long, Int, Array[Long])], Array[(Long, Int, Array[Long])])]
        .flatMap { case (ga, gb, da, db) =>
          val same = ga == gb
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Int, Int)]
          var i = 0
          while (i < da.length) {
            val (ida, za, ma) = da(i)
            val loA = math.ceil(t0 * za)
            var j = if (same) i + 1 else 0
            while (j < db.length) {
              val (idb, zb, mb) = db(j)
              if (za >= math.ceil(t0 * zb) && zb >= loA) {
                var inter = 0L
                var w = 0
                while (w < ma.length) {
                  inter += java.lang.Long.bitCount(ma(w) & mb(w)); w += 1
                }
                // emit a SUPERSET near the boundary (1e-6 slack); the exact
                // decision is the Catalyst round() below, bit-identical to
                // every other strategy and the oracle
                if (inter > 0 &&
                    inter.toDouble / (za + zb - inter) >= t0 - 1e-6) {
                  out += ((math.min(ida, idb), math.max(ida, idb), inter, za, zb))
                }
              }
              j += 1
            }
            i += 1
          }
          out.iterator
        }
        .toDF("id_a", "id_b", "inter", "z_a", "z_b")
        .withColumn("jaccard", round(col("inter").cast("double") /
          (col("z_a") + col("z_b") - col("inter")), 6))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))

    case CountJoin =>
      // |A∩B| = number of shingles the pair co-occurs under. The join and
      // the pair-count agg are the whole plan: no arrays, no intersection
      // kernel. Sizes ride the posting rows (stamped in the flatMap), so
      // the size-ratio prune runs per JOINED ROW — before the agg — and
      // the Jaccard filter needs no extra joins afterwards.
      //
      // AQE sizes post-shuffle partitions by join INPUT (1 row per
      // posting), but the blow-up happens inside the join (one output row
      // per shared shingle per pair): pin the partition count with explicit
      // repartitioning, which survives AQE. The merge hint keeps the same
      // sort-merge shape at every scale.
      val k = sh.sparkSession.sparkContext.defaultParallelism * 2
      val l = sh.select(col("sid"), col("doc").as("id_a"), col("sz").as("z_a"))
        .repartition(k, col("sid"))
      val r = sh.select(col("sid"), col("doc").as("id_b"), col("sz").as("z_b"))
        .repartition(k, col("sid")).hint("merge")
      l.join(r, "sid")
        .filter(col("id_a") < col("id_b") &&
          col("z_a") >= ceil(lit(threshold) * col("z_b")) &&
          col("z_b") >= ceil(lit(threshold) * col("z_a")))
        // z_a/z_b are functionally dependent on the ids — grouping on them
        // too keeps them available without a re-join
        .groupBy(col("id_a"), col("id_b"), col("z_a"), col("z_b"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard", round(col("inter").cast("double") /
          (col("z_a") + col("z_b") - col("inter")), 6))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))

    case AllPairsBlocked(blocks) =>
      val spark = sh.sparkSession
      import spark.implicits._
      val sets = sh.groupBy(col("doc"))
        .agg(array_sort(collect_list(col("sid"))).as("sids"))
        .select(col("doc"), col("sids"), size(col("sids")).as("sz"))
        .withColumn("g", pmod(col("doc"), lit(blocks)).cast("int"))
      val blockPairs = (for {
        ga <- 0 until blocks
        gb <- ga until blocks
      } yield (ga, gb)).toDF("ga", "gb")
      val a = sets.select(col("g").as("ga"), col("doc").as("id_x"),
        col("sids").as("s_x"), col("sz").as("z_x"))
      val b = sets.select(col("g").as("gb"), col("doc").as("id_y"),
        col("sids").as("s_y"), col("sz").as("z_y"))
      // pin the join to `blocks` explicit partitions: the join INPUTS are
      // tiny (one row per doc) so AQE would coalesce them to one task, but
      // the pair blow-up happens INSIDE the join — parallelism must be
      // sized to the output. User repartitioning survives AQE. The merge
      // hint keeps the SAME sort-merge plan at every scale (both sides are
      // data-scale — broadcasting either is wrong at 100 TB, and a
      // scale-stable plan means a small-scale warmup compiles the same
      // generated classes the big run executes).
      a.join(broadcast(blockPairs), "ga")
        .repartition(blocks, col("gb"))
        .join(b.repartition(blocks, col("gb")).hint("merge"), "gb")
        .filter(col("ga") =!= col("gb") || col("id_x") < col("id_y"))
        // size-ratio prune BEFORE the intersection kernel
        .filter(col("z_x") >= ceil(lit(threshold) * col("z_y")) &&
          col("z_y") >= ceil(lit(threshold) * col("z_x")))
        .withColumn("inter", sorted_intersect_count(col("s_x"), col("s_y")))
        .withColumn("jaccard", round(col("inter").cast("double") /
          (col("z_x") + col("z_y") - col("inter")), 6))
        .filter(col("jaccard") >= threshold)
        .select(least(col("id_x"), col("id_y")).as("id_a"),
          greatest(col("id_x"), col("id_y")).as("id_b"), col("jaccard"))

    case _ =>
      // PPJoin-style prefix filtering: shingle+hash flatMap → frequency
      // groupBy (map-side combinable) → per-doc sort by (freq, sid) →
      // prefix self-join on the shingle id → distinct candidates →
      // size-ratio prune → two shuffle joins to fetch both sorted sets →
      // codegen'd `sorted_intersect_count` verify. At 100 TB every shuffle
      // key here (sid within prefixes, doc id) is high cardinality and
      // skew-resistant: frequent shingles sort to the END of each
      // document's ordering and thus out of the prefixes.
      val threshold0 = threshold
      val freq = sh.groupBy(col("sid")).agg(count(lit(1)).as("freq"))
      // one struct array per doc, ordered by (freq asc, sid asc): rarest first
      val ordered = sh.join(freq, "sid")
        .groupBy(col("doc"))
        .agg(array_sort(collect_list(struct(col("freq"), col("sid")))).as("fs"))
        .select(col("doc"),
          col("fs.sid").as("by_freq"),                       // prefix order
          array_sort(col("fs.sid")).as("sids"),              // verify order
          size(col("fs")).as("sz"))
      // prefix length = |S| − ⌈t·|S|⌉ + 1
      val prefixLen = (col("sz") - ceil(lit(threshold0) * col("sz")) + 1).cast("int")
      val prefixes = ordered.select(col("doc"), col("sz"),
          explode(slice(col("by_freq"), lit(1), prefixLen)).as("sid"))
      val cand = prefixes.as("a").join(prefixes.as("b"),
          col("a.sid") === col("b.sid") && col("a.doc") < col("b.doc") &&
            col("a.sz") >= ceil(lit(threshold0) * col("b.sz")) &&
            col("b.sz") >= ceil(lit(threshold0) * col("a.sz")))
        .select(col("a.doc").as("id_a"), col("b.doc").as("id_b")).distinct()
      val sets = ordered.select(col("doc"), col("sids"))
      cand
        .join(sets.withColumnRenamed("doc", "id_a").withColumnRenamed("sids", "sids_a"), "id_a")
        .join(sets.withColumnRenamed("doc", "id_b").withColumnRenamed("sids", "sids_b"), "id_b")
        .withColumn("inter", sorted_intersect_count(col("sids_a"), col("sids_b")))
        .withColumn("jaccard", round(col("inter").cast("double") /
          (size(col("sids_a")) + size(col("sids_b")) - col("inter")), 6))
        .filter(col("jaccard") >= threshold0)
        .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Distinct space-joined word n-grams, built with tight loops (generic
    * Iterator/Function1 call sites go megamorphic in a long-lived JVM and
    * stop inlining — hand-rolled loops keep the kernel monomorphic).
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

  /** Train/test contamination check: for each held-out document, the
    * fraction of its distinct word n-gram shingles that appear anywhere in
    * the training corpus — the standard benchmark-leakage screen run
    * before training on web-scale corpora.
    *
    * Plan shape: both sides become `(doc, sid)` postings via the same
    * 57-bit polynomial shingle hash as the Jaccard join; the train side is
    * reduced to DISTINCT shingle ids (map-side combinable), then a
    * LEFT SEMI join on `sid` marks each test posting hit and a per-doc
    * count/size ratio comes out of one combinable aggregation. Every
    * shuffle keys on the high-cardinality shingle id or doc id — no skew,
    * no broadcast of anything data-scale, linear at 100 TB.
    */
  def contamination(train: DataFrame, test: DataFrame, id: Column, text: Column,
                    n: Int): DataFrame = {
    // both the hit count and the per-doc size read the test postings —
    // persist so the shingle flatMap runs once (session-scoped cleanup)
    val testPost = graft.CacheRegistry.persist(hashedShingles(test, id, text, n))
    val trainSids = hashedShingles(train, id, text, n).select(col("sid")).distinct()
    val hits = testPost.join(trainSids, Seq("sid"), "left_semi")
      .groupBy(col("doc")).agg(count(lit(1)).as("n_hit"))
    testPost.select(col("doc"), col("sz")).distinct()
      .join(hits, Seq("doc"), "left")
      .select(col("doc").as("doc_id"), col("sz").cast("long").as("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contamination",
        round(col("n_hit").cast("double") / col("n_shingles"), 6))
  }

  /** Connected components over an undirected near-dup pair graph:
    * `(id, comp)` with `comp` = minimum id reachable from `id`. This is the
    * TRANSITIVE dedup-cluster semantics a training-data pipeline actually
    * needs (the reference keep-list drop of "anything paired with a smaller
    * id" is not transitive-safe: a–b and b–c near-dups with disjoint a,c
    * must still land in one cluster so exactly one survivor is kept; cf.
    * the `uniqBy` dedupe passes in
    * `reference/src/jiracloud/process/extract_state_processor.ts:459-466`
    * generalized to similarity edges).
    *
    * Physical shape: min-label propagation. Labels start as `comp(u)=u`;
    * each round propagates every neighbor's current label across the edge
    * list and keeps the per-node minimum. Rounds to converge = graph
    * diameter — near-dup graphs are unions of small dense clusters, so
    * 2-4 rounds in practice; each round is one shuffle join on the node id
    * plus a map-side-combinable `min` aggregation, so the cost at 100 TB is
    * O(diameter) well-partitioned shuffles of the (persisted) edge list,
    * never a collect. (For adversarial long-chain graphs the alternating
    * large-star/small-star scheme halves path lengths per round — O(log n)
    * rounds — but pays two joins per round; diameter-bounded label
    * propagation is the right default for dedup-shaped graphs.)
    *
    * The per-round convergence check (`changed == 0`) is a scalar
    * aggregate — the same class of driver-side move as AutoStrategy's
    * stats job, not a data-scale collect. Throws if `maxIter` rounds do
    * not converge rather than returning non-final labels.
    */
  def connectedComponents(pairs: DataFrame, a: Column, b: Column,
                          maxIter: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val e0 = pairs.select(a.cast("long").as("u"), b.cast("long").as("v"))
    // both orientations, deduped: propagation below is one-directional.
    // localCheckpoint (not just persist): every round's plan references
    // `labels` TWICE (the union and the propagate-join), so after k rounds
    // the logical plan holds 2^k copies of whatever it chains on — with a
    // complex upstream pair plan (an LSH candidate chain) the ANALYZER
    // becomes the bottleneck long before the data does (measured 58 s vs
    // 6 s on a 501-pair graph). Truncating to a flat scan at the input and
    // after every round keeps plan size constant per round.
    val edges = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("u")).distinct()
      .withColumn("comp", col("u")).localCheckpoint()
    var converged = false
    var it = 0
    // hybrid round storage: persist+count most rounds (explicitly
    // reclaimable the moment the next round lands), localCheckpoint every
    // third (bounds the plan at ≤ 2³ copies of a FLAT scan — each round
    // references `labels` twice, so unbounded chaining grows the plan
    // 2^k-fold; checkpointed RDDs are reclaimed by the ContextCleaner)
    var prevPersisted: DataFrame = null
    while (!converged && it < maxIter) {
      val prop = edges
        .join(labels.select(col("u").as("v"), col("comp")), "v")
        .select(col("u"), col("comp"))
      // fold the convergence signal into the SAME action that
      // materializes the round: carry each node's previous label through
      // the min-agg and count improvements in an accumulator while the
      // rows stream out — one job per round, not two. Task retries can
      // only OVER-count (a spurious extra round that converges next
      // time), never under-count a real improvement to a false fixpoint.
      val acc = spark.sparkContext.longAccumulator(s"ccChanged$it")
      val merged = labels.withColumn("old", col("comp"))
        .unionByName(prop.withColumn("old", lit(Long.MaxValue)))
        .groupBy(col("u"))
        .agg(min(col("comp")).as("comp"), min(col("old")).as("old"))
        .as[(Long, Long, Long)]
        .map { case (u, c, o) => if (c < o) acc.add(1L); (u, c) }
        .toDF("u", "comp")
      val truncate = it % 3 == 2
      val next =
        if (truncate) merged.localCheckpoint() // eager: materializes too
        else {
          val n = merged.persist()
          try n.count()
          catch { case e: Throwable => n.unpersist(blocking = false); throw e }
          n
        }
      if (prevPersisted != null) prevPersisted.unpersist(blocking = false)
      prevPersisted = if (truncate) null else next
      labels = next
      converged = acc.value == 0L
      it += 1
    }
    // non-convergence must not leak the last round's cache: the final
    // frame is persisted (or checkpointed) but not yet registered, so an
    // exhausted-iterations throw would leave an untracked cached frame in
    // a long-lived session
    if (!converged && prevPersisted != null)
      prevPersisted.unpersist(blocking = false)
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // the final frame is checkpoint-cached; registered for session-scoped
    // cleanup like every other operator-owned cache
    graft.CacheRegistry.register(labels)
    labels
  }

  /** Connected components by alternating star contraction (the
    * large-star/small-star scheme of Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SoCC'14): large-star hangs every
    * larger-than-center neighbor off the neighborhood minimum, small-star
    * re-hangs the smaller ones, and alternating the two halves path
    * lengths per round — O(log n) rounds on ANY graph shape, where
    * [[connectedComponents]]' label propagation needs O(diameter). The
    * default stays label propagation (dedup graphs are diameter-bounded
    * unions of dense clusters and it runs one job per round); this is the
    * documented alternative for adversarial long-chain graphs, and the
    * spec proves both produce identical labels.
    *
    * Each half-round is one groupBy + one self-join on the node id — all
    * high-cardinality shuffles, nothing driver-bound. Convergence = the
    * edge multiset reaches its star-forest fixpoint (checked exactly).
    */
  def connectedComponentsStar(pairs: DataFrame, a: Column, b: Column,
                              maxIter: Int = 35): DataFrame = {
    val eAll = pairs.select(a.cast("long").as("u"), b.cast("long").as("v"))
    // every node mentioned in the input must appear in the output — a node
    // whose only row is a self-pair has no star edges but still labels
    // itself (label propagation keeps it; star contraction must too)
    val nodes = eAll.select(col("u"))
      .unionByName(eAll.select(col("v").as("u"))).distinct()
    val e0 = eAll.filter(col("u") =!= col("v"))

    // large-star: center on EVERY node (both orientations); m = min of the
    // closed neighborhood; re-hang the larger neighbors onto m
    def largeStar(e: DataFrame): DataFrame = {
      val nb = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val m = nb.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      nb.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // small-star: center on the larger endpoint; re-hang the smaller
    // neighbors (and the center) onto the neighborhood minimum
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val m = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      oriented.join(m, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // localCheckpoint every round, not just persist: each round's plan
    // nests the previous one SEVERAL times (two star halves + the
    // fixpoint exceptAll), so without lineage truncation the logical plan
    // grows exponentially with rounds and the analyzer chokes long before
    // the data does
    // size the per-round materialization to the FRAME, not the session:
    // star rounds on an already-small pair graph would otherwise pay the
    // full shuffle-partition task count per round (pure fixed overhead —
    // measured 14.6 s for a 501-pair graph at 32 partitions)
    def sized(df: DataFrame, rows: Long): DataFrame = {
      val parts = math.max(1L, math.min(
        df.sparkSession.sparkContext.defaultParallelism.toLong, rows / 100000L + 1))
      df.coalesce(parts.toInt)
    }
    // localCheckpoint EVERY round here (unlike the label-propagation
    // hybrid): the star fixpoint check re-reads BOTH the new and previous
    // round (count + exceptAll), so flat bases pay off immediately —
    // measured 2.5× faster than persist-most-rounds on a small graph.
    // Star converges in O(log n) rounds, so the checkpoint count stays
    // tiny and the ContextCleaner reclaims superseded rounds.
    var edges = e0.distinct().localCheckpoint()
    var prevCnt = edges.count()
    var converged = prevCnt == 0L
    var it = 0
    try {
      while (!converged && it < maxIter) {
        val next = sized(smallStar(largeStar(edges)), prevCnt).localCheckpoint()
        // exact fixpoint in ONE job (was count + exceptAll = two): both
        // frames are distinct edge sets, so tagging each side and
        // comparing per-(u,v) multiplicities in a two-level aggregate
        // over the two flat checkpointed scans yields the new count AND
        // the symmetric difference size together — one job per half-round
        // (the checkpoint materialization plus this check per full round)
        val stats = next.select(col("u"), col("v"), lit(1L).as("n"), lit(0L).as("o"))
          .unionByName(edges.select(col("u"), col("v"), lit(0L).as("n"), lit(1L).as("o")))
          .groupBy(col("u"), col("v"))
          .agg(sum(col("n")).as("n"), sum(col("o")).as("o"))
          .agg(sum(col("n")).as("cnt"),
            sum(when(col("n") =!= col("o"), 1L).otherwise(0L)).as("ndiff"))
          .head()
        val cnt = if (stats.isNullAt(0)) 0L else stats.getLong(0)
        // ndiff == 0 ⇒ identical multisets (which implies cnt == prevCnt);
        // null ⇒ both sides empty, also a fixpoint
        converged = stats.isNullAt(1) || stats.getLong(1) == 0L
        edges.unpersist(blocking = false)
        edges = next
        prevCnt = cnt
        it += 1
      }
      require(converged || prevCnt == 0L,
        s"connectedComponentsStar did not converge in $maxIter rounds")
    } catch {
      case e: Throwable =>
        edges.unpersist(blocking = false)
        throw e
    }
    // fixpoint edges form a star forest: (node → root) for every non-root;
    // roots — and nodes with no star edge (self-paired singletons) —
    // label themselves. The final edge frame stays registered —
    // unpersisting it before the labels materialize would hand consumers
    // the whole iteration chain to recompute.
    graft.CacheRegistry.register(edges)
    val nonRoot = edges.withColumnRenamed("v", "comp")
    val labels = nonRoot
      .unionByName(nodes.join(nonRoot.select(col("u")), Seq("u"), "left_anti")
        .withColumn("comp", col("u")))
    graft.CacheRegistry.register(labels.persist())
    labels
  }

  /** One survivor per transitive dedup cluster: join the component labels
    * from [[connectedComponents]] to a per-document quality score and keep,
    * per cluster, the highest-quality member (ties broken on the minimum
    * id) — the end-to-end "dedup a corpus" semantics (transitive clusters →
    * exactly one kept document), generalizing the reference's `uniqBy`
    * passes (`reference/src/jiracloud/process/extract_state_processor.ts:459-466`)
    * from equality keys to similarity clusters.
    *
    * Plan shape: one shuffle join on the doc id, one window partitioned by
    * the cluster label (high-cardinality — clusters are small by
    * construction in dedup graphs, so no partition skew), one
    * map-side-combinable member count. Nothing driver-bound at 100 TB.
    */
  def survivorPerCluster(components: DataFrame, quality: DataFrame,
                         qId: Column, score: Column): DataFrame = {
    val q = quality.select(qId.cast("long").as("u"), score.as("__score"))
    val scored = components.select(col("u"), col("comp")).join(q, "u")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp")).orderBy(col("__score").desc, col("u"))
    scored
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("comp"))))
      .filter(col("__rn") === 1)
      .select(col("comp").as("cluster_id"), col("u").as("survivor_id"),
        col("n_members"), col("__score").as("quality_score"))
  }

  /** Embedding cosine near-dup pairs (id_a < id_b, cosine ≥ threshold),
    * exact, distributed block-nested-loop: vectors are assigned to
    * `blocks` groups by id, the small (gᵃ ≤ gᵇ) block-pair list is
    * broadcast, and each block pair evaluates its cross product with a
    * codegen'd dot product in the projection (NOT in a join condition,
    * where Spark would evaluate it interpreted per pair). The O(n²) pair
    * work is inherent to an exact threshold join; this spreads it evenly
    * across the cluster with no driver-side pass — at 100 TB you put an
    * LSH/IVF candidate filter in front (see [[Similarity.ivfTopK]] and
    * [[Sketches.lshCandidates]]) and run the same verify inside buckets.
    */
  def embeddingNearDupPairs(emb: DataFrame, id: Column, vec: Column,
                            threshold: Double, blocks: Int = 16): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(id.cast("long").as("id"), vec.cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot_product(col("v"), col("v"))))
      .withColumn("g", pmod(col("id"), lit(blocks)).cast("int"))
    val blockPairs = (for {
      ga <- 0 until blocks
      gb <- ga until blocks
    } yield (ga, gb)).toDF("ga", "gb")
    val a = v.select(col("g").as("ga"), col("id").as("id_x"),
      col("v").as("v_x"), col("nrm").as("n_x"))
    val b = v.select(col("g").as("gb"), col("id").as("id_y"),
      col("v").as("v_y"), col("nrm").as("n_y"))
    a.join(broadcast(blockPairs), "ga")
      .join(b, "gb")
      .filter(col("ga") =!= col("gb") || col("id_x") < col("id_y"))
      .withColumn("cosine", round(
        dot_product(col("v_x"), col("v_y")) / (col("n_x") * col("n_y")), 6))
      .filter(col("cosine") >= threshold)
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"), col("cosine"))
  }

  /** Per-node triangle counts over an undirected pair graph — the
    * cluster-density diagnostic for a dedup graph (a node in many
    * triangles sits in a dense replica clique and is a safe cut; a
    * bridge node with pairs but no triangles deserves review before its
    * cluster is collapsed). Each triangle contributes 1 to each of its
    * three vertices; only nodes in ≥1 triangle are emitted.
    *
    * Scale shape — the degree-ordered orientation (the standard
    * distributed-triangle trick, e.g. Suri & Vassilvitskii WWW'11):
    * every edge is directed from its lower-degree endpoint (tie on id),
    * and wedges are built from OUT-edge pairs only. In any triangle
    * exactly one vertex has out-degree 2 under this orientation, so each
    * triangle is found exactly once — and the wedge count is bounded by
    * Σ outdeg² = O(m^1.5) instead of Σ deg² (a hub with a million pair
    * partners generates no wedges at all as apex unless its partners are
    * even hotter). Both joins key on node ids; nothing broadcasts.
    */
  def triangleCounts(pairs: DataFrame, idA: Column, idB: Column): DataFrame = {
    val und = pairs
      .select(least(idA.cast("long"), idB.cast("long")).as("a"),
        greatest(idA.cast("long"), idB.cast("long")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val dir = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"))
    val wedges = dir.as("x").join(dir.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.src").as("u"), col("x.dst").as("p"), col("y.dst").as("q"))
    val tri = wedges.join(und.as("z"),
        least(col("p"), col("q")) === col("z.a") &&
          greatest(col("p"), col("q")) === col("z.b"))
      .select(col("u"), col("p"), col("q"))
    tri.select(explode(array(col("u"), col("p"), col("q"))).as("vec_id"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** PageRank over an undirected pair graph (each pair walked both ways)
    * — the centrality diagnostic for a dedup/similarity graph: a
    * high-rank node is the hub of a dense near-dup neighborhood (its
    * cluster's natural canonical representative), a low-rank member is
    * peripheral. Fixed iteration count, uniform start 1/N, damping d:
    * r'(v) = (1−d)/N + d·Σ_{u→v} r(u)/outdeg(u).
    *
    * Engine-exactness: the per-edge contribution r(u)/outdeg(u) is one
    * IEEE divide; the PER-NODE incoming sum — the only aggregation-
    * order-dependent step — accumulates in DECIMAL(38,15), so every
    * iteration's rank vector is bit-identical across engines and
    * partial-agg plans (the kmeansStep discipline), and the fixpoint
    * needs no tolerance. On this graph every node has outdeg ≥ 1 and
    * indegree ≥ 1 (undirected edges), so there is no dangling mass.
    *
    * Scale shape: edges shuffle on src to meet the rank frame and on
    * dst for the sum — two keyed shuffles per iteration, nothing
    * broadcast but the single-row node count; the rank frame stays one
    * row per node. Iterations are a fixed small constant (a diagnostic,
    * not a convergence loop).
    */
  def pageRank(pairs: DataFrame, idA: Column, idB: Column,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"pageRank: iterations must be in [1,10], got $iterations")
    val und = pairs
      .select(least(idA.cast("long"), idB.cast("long")).as("a"),
        greatest(idA.cast("long"), idB.cast("long")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val edges = graft.CacheRegistry.persist(
      und.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(und.select(col("b").as("src"), col("a").as("dst"))))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = edges.select(col("src").as("v")).distinct()
    val nFrame = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(nFrame))
      .select(col("v"), (lit(1.0) / col("n")).as("r"))
    var i = 0
    while (i < iterations) {
      val contribs = edges
        .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst"),
          (col("r") / col("outdeg")).cast("decimal(38,15)").as("c"))
      ranks = contribs.groupBy(col("dst")).agg(sum(col("c")).as("cs"))
        .crossJoin(broadcast(nFrame))
        .select(col("dst").as("v"),
          ((lit(1.0) - lit(damping)) / col("n") +
            lit(damping) * col("cs").cast("double")).as("r"))
      i += 1
    }
    ranks.select(col("v").as("vec_id"), round(col("r"), 6).as("pagerank"))
  }

  // Independent polynomial moduli for the substring window double-hash —
  // both primes < 2^30, so the rolling update's worst intermediate
  // (2·mod·31) stays far inside a signed 64-bit int, and the paired
  // 60-bit key makes a cross-gram collision (n²/2^60) negligible at any
  // corpus size. Shared with the oracle, which recomputes each window
  // hash directly — direct and rolling folds agree by modular arithmetic.
  val SpanMod1 = 1000000007L
  val SpanMod2 = 998244353L

  /** Substring-level exact dedup: all MAXIMAL character spans that occur
    * more than once in the corpus (in another document or elsewhere in the
    * same one), at window granularity `k` — the suffix-array dedup of Lee
    * et al., "Deduplicating Training Data Makes Language Models Better"
    * (ACL 2022) §4.1, re-expressed without the suffix array: a repeated
    * substring of length ≥ k contains a repeated k-window at every offset,
    * so merging consecutive duplicated window starts per document
    * reconstructs exactly the maximal repeated spans (up to hash-key
    * granularity k).
    *
    * Physical shape, in corpus-linear passes with no global structure:
    *  1. every length-`k` codepoint window is double-rolling-hashed in a
    *     per-doc flatMap — O(1) per window (the oracle recomputes each
    *     window O(k); same values, different cost);
    *  2. windows seen more than once = map-side-combinable count on the
    *     near-uniform (h1, h2) key, then a LEFT SEMI join back — both
    *     shuffles key on the 60-bit hash pair, skew-free even when one
    *     gram repeats millions of times (semi-join output stays one row
    *     per input window);
    *  3. gaps-and-islands merge per doc: `pos − row_number()` groups
    *     consecutive starts; the window partitions on doc_id
    *     (high-cardinality, each partition bounded by a single document's
    *     length).
    *
    * Returns (doc_id, span_start, span_end, span_len, n_windows) with
    * 0-based [start, end) codepoint offsets. A 100 TB cut pass would
    * rejoin spans to the corpus on doc_id and splice text per row.
    */
  def duplicatedSpans(docs: DataFrame, id: Column, text: Column,
                      k: Int): DataFrame = {
    val wins = windowHashFrame(docs, id, text, k)
    // both consumers shuffle on (h1, h2): ReuseExchange runs the linear
    // flatMap once and shares the exchange between the count and the join
    val dup = wins.groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(col("h1"), col("h2"))
    islandSpans(wins.join(dup, Seq("h1", "h2"), "left_semi"), k)
  }

  /** Every length-`k` codepoint window of every document, double-rolling-
    * hashed: (doc_id, pos, h1, h2). The linear-scan stage shared by
    * [[duplicatedSpans]] and [[keepFirstCutSpans]].
    */
  private def windowHashFrame(docs: DataFrame, id: Column, text: Column,
                              k: Int): DataFrame = {
    require(k >= 2, s"duplicatedSpans: window length must be >= 2, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val slices = spark.sparkContext.defaultParallelism
    val (p1, p2) = (SpanMod1, SpanMod2)
    docs.select(id.cast("long"), text.cast("string")).as[(Long, String)]
      .repartition(slices)
      .flatMap { case (d, t) =>
        val cps = t.codePoints.toArray
        val n = cps.length
        if (n < k) Iterator.empty
        else {
          def powK(p: Long): Long = { // 31^(k-1) mod p
            var r = 1L; var i = 1
            while (i < k) { r = r * 31L % p; i += 1 }
            r
          }
          val (pw1, pw2) = (powK(p1), powK(p2))
          val out = new Array[(Long, Long, Long, Long)](n - k + 1)
          var h1 = 0L; var h2 = 0L
          var i = 0
          while (i < k) { h1 = (h1 * 31L + cps(i)) % p1; h2 = (h2 * 31L + cps(i)) % p2; i += 1 }
          out(0) = (d, 0L, h1, h2)
          var j = k
          while (j < n) { // slide: drop cps(j-k), append cps(j)
            h1 = (((h1 - cps(j - k) * pw1) % p1 + p1) * 31L + cps(j)) % p1
            h2 = (((h2 - cps(j - k) * pw2) % p2 + p2) * 31L + cps(j)) % p2
            out(j - k + 1) = (d, (j - k + 1).toLong, h1, h2)
            j += 1
          }
          out.iterator
        }
      }
      .toDF("doc_id", "pos", "h1", "h2")
  }

  /** Gaps-and-islands tail shared by the span operators: merge consecutive
    * flagged window starts per document into maximal spans. The window
    * partitions on doc_id (high-cardinality, each partition bounded by one
    * document's length).
    */
  private def islandSpans(flaggedPos: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    flaggedPos
      .withColumn("grp", col("pos") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + k).as("span_end"),
        (max(col("pos")) + k - min(col("pos"))).as("span_len"),
        count(lit(1)).as("n_windows"))
      .drop("grp")
  }

  /** The CUT side of suffix-array dedup with keep-first-occurrence
    * semantics (Lee et al. ACL 2022 §4.1 cut exactly this: every repeated
    * substring occurrence EXCEPT one canonical copy). [[duplicatedSpans]]
    * flags all occurrences; here an occurrence is cut iff its window
    * content has an earlier occurrence in global (doc_id, pos) order, so
    * the corpus-wide first copy of every repeated region survives — in
    * particular a region repeated across m documents yields cut spans in
    * exactly m−1 of them.
    *
    * The global occurrence order needs no global sort: the canonical copy
    * per 60-bit window key is `min(struct(doc_id, pos))` — a declarative
    * map-side-combinable aggregate on the same near-uniform hash key as
    * the dup-count, so the pass stays skew-free at any repetition count.
    * The flagged positions then merge per doc exactly as in
    * [[duplicatedSpans]]; a cut pass splices `substring` on the result.
    *
    * Returns (doc_id, span_start, span_end, span_len, n_windows) over cut
    * occurrences only.
    */
  def keepFirstCutSpans(docs: DataFrame, id: Column, text: Column,
                        k: Int): DataFrame = {
    val wins = windowHashFrame(docs, id, text, k)
    val firsts = wins.groupBy(col("h1"), col("h2"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      .select(col("h1"), col("h2"),
        col("f.doc_id").as("f_doc"), col("f.pos").as("f_pos"))
    val cut = wins.join(firsts, Seq("h1", "h2"))
      .filter(!(col("doc_id") === col("f_doc") && col("pos") === col("f_pos")))
      .select(col("doc_id"), col("pos"))
    islandSpans(cut, k)
  }

  /** The "apply" step of [[duplicatedSpans]]: per-document duplicated-
    * character accounting — how much of each document a substring-dedup
    * cut pass would remove. Two spans whose window-start runs are
    * separated by a short gap (< k) still overlap in CHARACTERS, so
    * span lengths cannot simply be summed: this merges each document's
    * spans into their interval union first (sort by start; a span starts a
    * new island iff its start is at or past the running max end — the
    * standard sweep, expressed as two per-doc windows, so the whole pass
    * stays partitioned on doc_id with zero extra shuffles beyond the span
    * computation itself).
    *
    * Returns one row per document (including duplicate-free ones):
    * (doc_id, n_chars, n_dup_chars, n_merged_spans, dup_fraction).
    */
  /** Per-doc interval UNION of (possibly overlapping) spans — the
    * standard sweep (a span starts a new island iff its start is at or
    * past the running max end), expressed as two per-doc windows so the
    * whole pass stays partitioned on doc_id with zero extra shuffles.
    * Returns one row per merged interval: (doc_id, s, e), 0-based
    * half-open.
    */
  private def mergeIntervals(spans: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("span_start"))
    val prevMax = max(col("span_end"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    spans
      .withColumn("__new_island",
        when(prevMax.isNull || col("span_start") >= prevMax, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new_island"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("__island"))
      // islands chain-overlap, so the union interval is contiguous
      .agg(min(col("span_start")).as("s"), max(col("span_end")).as("e"))
      .drop("__island")
  }

  /** The APPLY pass that completes the Lee-et-al pipeline: splice the
    * [[keepFirstCutSpans]] cut spans OUT of each document, keeping the
    * corpus-wide first copy of every repeated region (ref semantics Lee
    * et al. ACL 2022 §4.1 — they "remove" each flagged span from the
    * training corpus; the cut text is the pipeline's actual product).
    *
    * Distributed shape: cut spans merge to their per-doc interval union
    * (the [[mergeIntervals]] sweep), collect per doc into ONE sorted
    * array row (bounded by doc_len/k intervals — per-doc state, never
    * corpus-scale), and a single `aggregate` HOF walks the array once
    * concatenating the complement segments. The splice is embarrassingly
    * parallel per document — no collect, no corpus-wide structure; the
    * only shuffles are the span computation's own hash-key shuffles plus
    * one doc_id groupBy/join.
    *
    * Returns one row per document (duplicate-free ones pass through):
    * (doc_id, kept_text, n_chars, n_kept_chars, n_cut_spans).
    */
  def applyKeepFirstCut(docs: DataFrame, id: Column, text: Column,
                        k: Int): DataFrame = {
    val cuts = mergeIntervals(keepFirstCutSpans(docs, id, text, k))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("cuts"))
    // fold over the sorted cut intervals: state = (end of the previous
    // cut, kept prefix so far); each interval appends the uncut segment
    // [prev, s); the finish step appends the tail [last_e, len)
    val spliced = aggregate(
      col("cuts"),
      struct(lit(0L).as("prev"), lit("").as("acc")),
      (st, c) => struct(
        c.getField("e").cast("long").as("prev"),
        concat(st.getField("acc"),
          col("__text").substr((st.getField("prev") + 1).cast("int"),
            (c.getField("s") - st.getField("prev")).cast("int"))).as("acc")),
      st => concat(st.getField("acc"),
        col("__text").substr((st.getField("prev") + 1).cast("int"),
          (length(col("__text")) - st.getField("prev")).cast("int"))))
    docs.select(id.cast("long").as("doc_id"), text.cast("string").as("__text"))
      .join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("cuts").isNull, col("__text")).otherwise(spliced)
          .as("kept_text"),
        length(col("__text")).cast("long").as("n_chars"),
        coalesce(size(col("cuts")), lit(0)).cast("long").as("n_cut_spans"))
      .withColumn("n_kept_chars", length(col("kept_text")).cast("long"))
      .select(col("doc_id"), col("kept_text"), col("n_chars"),
        col("n_kept_chars"), col("n_cut_spans"))
  }

  def duplicatedCharStats(docs: DataFrame, id: Column, text: Column,
                          k: Int): DataFrame = {
    val merged = mergeIntervals(duplicatedSpans(docs, id, text, k))
    val perDoc = merged.groupBy(col("doc_id"))
      .agg(sum(col("e") - col("s")).as("n_dup_chars"),
        count(lit(1)).as("n_merged_spans"))
    docs.select(id.cast("long").as("doc_id"), length(text).cast("long").as("n_chars"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup_chars", "n_merged_spans"))
      .withColumn("dup_fraction",
        round(col("n_dup_chars").cast("double") / col("n_chars"), 6))
  }
}
