package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale-slope rehearsal (~10× the sf0.1 documents/embeddings/
  * events tables) for the heavy dedup/sketch/streaming family, plus a
  * Zipf-vocabulary corpus that must flip [[operators.Dedup.AutoStrategy]]
  * from the small-vocab bitset specialist to prefix filtering.
  *
  *   runMain graft.ScaleBench [baseSfDir] [workDir]
  *
  * Generates (deterministically) if absent:
  *  - `rep10/`: sf0.1 replicated 10× — documents duplicated verbatim
  *    (vocabulary CONSTANT, the natural 10× of this generator; every
  *    replica group is a true dup cluster), embeddings perturbed with
  *    deterministic hash noise (replica groups become near-dup clusters,
  *    not exact copies), events with 10× the user keys;
  *  - `zipf/`: 50k docs of 50 tokens drawn log-uniformly from a 200k-word
  *    vocabulary (freq(rank) ∝ 1/rank, i.e. Zipf), 10% of docs emitted
  *    twice with a one-token change — rare shingles exist, so prefix
  *    filtering is the near-linear exact plan.
  *
  * Prints one JSON line per (dir, query) with wall seconds; the sf0.1
  * pass runs first in the same JVM so slopes are same-conditions ratios.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft-scale")
    // optional third arg: comma list of sections (vocab,srp,heavy,zipf,
    // cap,cellband) — default runs everything
    val sections = args.lift(2).map(_.split(",").toSet)
      .getOrElse(Set("vocab", "srp", "heavy", "zipf", "cap", "cellband", "pq",
        "compact7"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rep = s"$work/rep10"
    val zipf = s"$work/zipf"
    val reps = 10

    // shared micro-helpers for the write-amplification rehearsals
    def elapsedSec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def dirBytesOf(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists()) 0L
      else org.apache.commons.io.FileUtils.sizeOfDirectory(f)
    }

    // guard on the LAST artifact written, so a crash mid-generation
    // regenerates instead of leaving a permanently half-built dataset
    if (!new java.io.File(s"$rep/events.parquet").exists()) {
      val r = explode(sequence(lit(0), lit(reps - 1))).as("r")
      Tables.documents(spark, base).select(col("doc_id"), col("text"), r)
        .select((col("doc_id") + col("r") * 1000000L).as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$rep/documents.parquet")
      // deterministic per-(replica, dim) noise keeps replica groups
      // near-dup (cos ~0.95) instead of exact copies
      Tables.embeddings(spark, base)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"), r)
        .select((col("vec_id") + col("r") * 1000000L).as("vec_id"),
          when(col("r") === 0, col("e")).otherwise(
            zip_with(col("e"),
              transform(sequence(lit(0), size(col("e")) - 1),
                j => (pmod(hash(col("vec_id") + col("r") * 1000000L, j), lit(1000))
                  .cast("double") / 1000.0 - 0.5) * 0.06),
              (x, n) => x + n))
            .cast("array<float>") // match the real table's native width
            .as("embedding"))
        .write.mode("overwrite").parquet(s"$rep/embeddings.parquet")
      Tables.events(spark, base)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), col("value"), col("props"), r)
        .select((col("event_id") + col("r") * 100000000L).as("event_id"),
          (col("user_id") + col("r") * 1000000L).as("user_id"),
          col("event_type"), col("ts"), col("value"), col("props"))
        .write.mode("overwrite").parquet(s"$rep/events.parquet")
    }

    if (!new java.io.File(s"$zipf/documents.parquet").exists()) {
      val nDocs = 50000
      val docLen = 50
      val vocab = 200000
      // freq(rank) ∝ 1/rank: rank = floor(exp(u·lnV)) on a per-(doc,pos)
      // deterministic uniform from the 64-bit mix of (doc, pos)
      val docs = spark.range(0, nDocs).toDF("doc_id")
        .select(col("doc_id"), transform(sequence(lit(0), lit(docLen - 1)),
          p => concat(lit("t"),
            floor(exp((pmod(xxhash64(col("doc_id"), p), lit(1000000))
              .cast("double") / 1000000.0) * log(lit(vocab.toDouble))))
              .cast("long"))).as("toks"))
        .select(col("doc_id"), concat_ws(" ", col("toks")).as("text"))
      // 10% true near-dups: re-emit with one token replaced
      val dups = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          regexp_replace(col("text"), "^\\S+", "tX").as("text"))
      docs.unionByName(dups)
        .write.mode("overwrite").parquet(s"$zipf/documents.parquet")
    }

    def vocabOf(dir: String): Long =
      // materialize tokens as an attribute first — the one-step
      // shingles(text, n) convenience re-tokenizes per lambda element
      // (O(tokens²) interpreted HOF), unaffordable at the 10× corpus
      Tables.documents(spark, dir)
        .select(graft.functions.tokens(col("text")).as("__toks"))
        .select(explode(
          operators.TextAnalysis.shinglesFromTokens(col("__toks"), 2)).as("s"))
        .agg(countDistinct(col("s"))).as[Long].head()

    def time(dir: String, name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, dir).persist()
      try {
        val t0 = System.nanoTime()
        // noop sink: full-column materialization (see Bench — count() lets
        // Catalyst skip the projected work entirely on some query shapes).
        // The frame is persisted so the rows count below reads the cache
        // instead of re-running the full plan a second time.
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val n = df.count()
        println(f"""{"dir":"$dir","query":"$name","sec":$sec%.2f,"rows":$n}""")
      } finally { df.unpersist(); () }
    }

    if (sections("vocab"))
      println(s"""{"vocab_sf01":${vocabOf(base)},"vocab_rep10":${vocabOf(rep)},"vocab_zipf":${vocabOf(zipf)}}""")
    // SRP candidate volume, narrow vs wide band keys, on the dense-replica
    // corpus: the 8-bit keys of 32/4 have a random collision floor of
    // bands·n²/256 that swamps the candidate set at rep10 scale; the
    // 16-bit keys of 64/4 push the same floor out 256×, so candidates
    // collapse to ≈ the true replica pairs (the q81 configuration).
    def srpCand(dir: String, bits: Int, bands: Int): Unit = {
      val t0 = System.nanoTime()
      val emb = Tables.embeddings(spark, dir)
      val n = (if (bits > 64)
          operators.Similarity.srpCandidatePairs128(emb, col("vec_id"),
            col("embedding"), bits = bits, bands = bands)
        else
          operators.Similarity.srpCandidatePairs(emb, col("vec_id"),
            col("embedding"), bits = bits, bands = bands)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"dir":"$dir","srp_candidates":"$bits/$bands","sec":$sec%.2f,"rows":$n}""")
    }
    if (sections("srp")) {
      srpCand(rep, 32, 4)
      srpCand(rep, 64, 4)
      srpCand(rep, 128, 8)
    }

    // round 6, q88 shape: per-group cap on a SINGLE-group corpus — the
    // pathological key the naive global window funnels through one task.
    // Caps.perGroupCap runs a narrow partial first; compare directly.
    def capBench(dir: String): Unit = {
      def corpus = Tables.documents(spark, dir).select(col("doc_id"),
        lit(0L).as("grp"),
        pmod(xxhash64(col("doc_id")), lit(1000000007L)).as("ord"))
      val t0 = System.nanoTime()
      val n = operators.Caps.perGroupCap(corpus,
        Seq("grp"), Seq("ord", "doc_id"), 20).count()
      val s1 = (System.nanoTime() - t0) / 1e9
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col("ord").asc, col("doc_id").asc)
      val t1 = System.nanoTime()
      val n2 = corpus.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 20).count()
      val s2 = (System.nanoTime() - t1) / 1e9
      println(f"""{"dir":"$dir","cap_two_phase_sec":$s1%.2f,"cap_naive_window_sec":$s2%.2f,"rows":$n,"naive_rows":$n2}""")
    }
    // base runs twice: the first pass pays the C2 compile of the Row-codec
    // mapPartitions kernel — the second is the comparable warmed number
    if (sections("cap")) { capBench(base); capBench(base); capBench(rep) }

    // round 6, q79 shape: candidate volume of the in-cell verify, cell-only
    // self-join vs cell ∧ SRP-band sub-blocking, over the SAME trained
    // centroids (8 seeds, 2 Lloyd iterations — deliberately under-
    // provisioned at rep10 so the fixed-k quadratic term is visible).
    def cellCand(dir: String): Unit = {
      val emb = Tables.embeddings(spark, dir)
      val trained = operators.Similarity.ivfTrain(emb,
        emb.filter(col("vec_id") < 8), col("vec_id"), col("embedding"),
        iterations = 2)
      val a = CacheRegistry.persist(operators.Similarity.ivfAssignCells(
        emb, trained, col("vec_id"), col("embedding")))
      val t0 = System.nanoTime()
      val nCell = a.as("x").join(a.as("y"),
          col("x.cell") === col("y.cell") && col("x.vid") < col("y.vid"))
        .count()
      val s1 = (System.nanoTime() - t0) / 1e9
      val bandRows = operators.Similarity.srpBandRows(emb, col("vec_id"),
        col("embedding"), bits = 32, bands = 4)
      val av = a.join(bandRows, col("vid") === col("id"))
        .select(col("vid"), col("cell"), col("band"), col("band_key"))
      val t1 = System.nanoTime()
      val nBand = av.as("x").join(av.as("y"),
          col("x.cell") === col("y.cell") && col("x.band") === col("y.band") &&
            col("x.band_key") === col("y.band_key") && col("x.vid") < col("y.vid"))
        .select(col("x.vid"), col("y.vid")).distinct().count()
      val s2 = (System.nanoTime() - t1) / 1e9
      println(f"""{"dir":"$dir","cell_only_candidates":$nCell,"cell_only_sec":$s1%.2f,"cell_band_candidates":$nBand,"cell_band_sec":$s2%.2f}""")
    }
    if (sections("cellband")) { cellCand(base); cellCand(rep) }

    // round 6, q117/q118 shape: candidate volume the coarse probe buys —
    // full-scan ADC scores nQueries·(n−1) pairs; IVF-PQ scores only the
    // probed cells' contents. Counts are deterministic; walls come from
    // the heavy-list timings of the queries themselves.
    def pqCand(dir: String): Unit = {
      val emb = Tables.embeddings(spark, dir)
      val trained = operators.Similarity.ivfTrain(emb,
        emb.filter(col("vec_id") < 8), col("vec_id"), col("embedding"),
        iterations = 2)
      val n = emb.count()
      val t0 = System.nanoTime()
      val probed = operators.Similarity.ivfProbedCandidates(emb,
        col("vec_id"), col("embedding"), trained,
        probes = 2, nQueries = 10).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"dir":"$dir","adc_full_pairs":${10 * (n - 1)},"adc_probed_pairs":$probed,"probe_sec":$sec%.2f}""")
    }
    if (sections("pq")) { pqCand(base); pqCand(rep) }

    // round 7: auto-compaction payoff. Incremental loads touch FEW
    // buckets per round (the whole point of bucket pruning), so each
    // round strands its buckets in a fresh epoch and live epochs grow
    // with round count; AutoCompactEpochs bounds them. Each round here
    // merges exactly one bucket's keys (rounds cycle the buckets twice),
    // the worst-case fragmentation shape. Same content both ways — the
    // deltas are the small-files effect the policy exists to bound.
    def compactBench(dir: String, rounds: Int): Unit = {
      import graft.sources.MergeWriter
      val nb = rounds / 2
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        // the writer's own bucket function, so round i touches bucket
        // i%nb and nothing else
        .withColumn("__b", pmod(hash(col("doc_id")), lit(nb)))
        .persist()
      docs.count()
      def build(path: String, threshold: Int): Double = {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
        val t0 = System.nanoTime()
        (0 until rounds).foreach { i =>
          MergeWriter.merge(spark, path,
            docs.filter(col("__b") === i % nb).drop("__b"),
            Seq("doc_id"), buckets = nb, autoCompactEpochs = threshold)
        }
        (System.nanoTime() - t0) / 1e9
      }
      def readWall(path: String): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        MergeWriter.readTable(spark, path)
          .agg(count(lit(1)), sum(length(col("text")))).head()
        (System.nanoTime() - t0) / 1e9
      }.min
      def liveEpochs(path: String): Int =
        MergeWriter.currentEpochs(spark, path).values.toSet.size
      val frag = s"$work/compact7/frag"
      val auto = s"$work/compact7/auto"
      val wFrag = build(frag, Int.MaxValue)
      val wAuto = build(auto, MergeWriter.AutoCompactEpochs)
      println(f"""{"dir":"$dir","merge_rounds":$rounds,"buckets":$nb,"frag_live_epochs":${liveEpochs(frag)},"auto_live_epochs":${liveEpochs(auto)},"frag_build_sec":$wFrag%.2f,"auto_build_sec":$wAuto%.2f,"frag_read_sec_min3":${readWall(frag)}%.2f,"auto_read_sec_min3":${readWall(auto)}%.2f}""")
      docs.unpersist()
      ()
    }
    if (sections("compact7")) compactBench(base, 64)

    val heavy = Seq("q22_ngram_jaccard", "q26_minhash_lsh", "q28_simhash_pairs",
      "q62_srp_neardup", "q63_dedup_components", "q64_contamination",
      "q65_dedup_survivors", "q61_streaming_merge", "q66_streaming_sessions",
      "q81_srp_wide_replicas", "q95_repetition_filter", "q101_substring_dedup",
      "q119_keep_first_cut", "q117_pq_topk", "q118_ivfpq_topk",
      "q130_cut_apply", "q133_bm25_topk", "q135_pair_pagerank",
      "q137_incremental_bm25", "q140_streaming_ingest_neardup")
    if (sections("heavy")) {
      heavy.foreach(q => time(base, q))
      heavy.foreach(q => time(rep, q))
    }
    // just the round-6-session-3 additions, for targeted slope reruns
    if (sections("r6c")) {
      val qs = Seq("q119_keep_first_cut", "q117_pq_topk", "q118_ivfpq_topk")
      qs.foreach(q => time(base, q))
      qs.foreach(q => time(rep, q))
    }
    // round 7: dedup-at-ingest — per-batch incremental near-dup against
    // a stored band index vs. a full-corpus recompute, at 1× and 10×
    // corpus with a FIXED batch (vec_id ≡ 0 mod 30 of base: same ~3%).
    // The claim: incremental cost tracks batch × collision rate, full
    // recompute tracks corpus².
    def ingestBench(dir: String, tag: String): Unit = {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val emb = Tables.embeddings(spark, dir)
      val old = emb.filter(pmod(col("vec_id"), lit(30)) =!= 0)
      val neu = emb.filter(pmod(col("vec_id"), lit(30)) === 0)
      val storedBands = operators.Similarity.srpBandRows(old, col("vec_id"),
        col("embedding"), bits = 32, bands = 4).persist()
      storedBands.count() // index build cost excluded: it amortizes
      val t0 = System.nanoTime()
      val nInc = operators.Similarity.srpIncrementalNearDupPairs(emb,
        col("vec_id"), col("embedding"), storedBands, neu,
        threshold = 0.35, bits = 32, bands = 4).count()
      val sInc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nFull = operators.Similarity.srpNearDupPairs(emb, col("vec_id"),
        col("embedding"), threshold = 0.35, bits = 32, bands = 4).count()
      val sFull = (System.nanoTime() - t1) / 1e9
      storedBands.unpersist()
      println(f"""{"dir":"$tag","ingest_batch_pairs":$nInc,"ingest_batch_sec":$sInc%.2f,"full_recompute_pairs":$nFull,"full_recompute_sec":$sFull%.2f}""")
    }
    if (sections("ingest7")) { ingestBench(base, "sf0.1"); ingestBench(rep, "rep10") }

    // round 8: the ingest loop's vector fetch made point-read. ingest7
    // excluded index build but still passed the CORPUS frame into the
    // verify (a corpus-linear scan per batch); the keyed variant
    // point-fetches candidate endpoint vectors from a merge-maintained
    // table via readKeys. This line times the per-batch call WITH the
    // fetch included — the claim is a flat wall as the corpus grows 10×.
    // Table and index builds stay excluded (they amortize across the
    // table's life; the index maintenance slope is ingest7's subject).
    def ingestKeyedBench(dir: String, tag: String): Unit = {
      import graft.sources.MergeWriter
      val emb = Tables.embeddings(spark, dir)
      val old = emb.filter(pmod(col("vec_id"), lit(30)) =!= 0)
      val neu = emb.filter(pmod(col("vec_id"), lit(30)) === 0)
      val vecTable = s"$work/ingest8/$tag/vecs"
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$work/ingest8/$tag"))
      MergeWriter.merge(spark, vecTable, emb, Seq("vec_id"), buckets = 16)
      val storedBands = operators.Similarity.srpBandRows(old, col("vec_id"),
        col("embedding"), bits = 32, bands = 4).persist()
      storedBands.count()
      val t0 = System.nanoTime()
      val nInc = operators.Similarity.srpIncrementalNearDupPairsKeyed(spark,
        vecTable, "vec_id", "embedding", storedBands, neu,
        threshold = 0.35, bits = 32, bands = 4).count()
      val sInc = (System.nanoTime() - t0) / 1e9
      storedBands.unpersist()
      println(f"""{"dir":"$tag","ingest_keyed_pairs":$nInc,"ingest_keyed_batch_sec":$sInc%.2f}""")
    }
    if (sections("ingest8")) { ingestKeyedBench(base, "sf0.1"); ingestKeyedBench(rep, "rep10") }

    // round 8: bucket-split payoff. A merge's I/O per touched bucket is
    // the bucket's SIZE (read survivors + rewrite), and bucket size at a
    // fixed modulus grows linearly with the table — the structural limit
    // splitBuckets exists to lift. Measure a single-key merge (touches
    // exactly one bucket) on the same table before and after one split:
    // the per-merge wall should track bucket size, i.e. roughly halve.
    def splitBench(dir: String, tag: String): Unit = {
      import graft.sources.MergeWriter
      val path = s"$work/split8/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      MergeWriter.merge(spark, path, docs, Seq("doc_id"), buckets = 8)
      def oneKeyMerge(): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        MergeWriter.merge(spark, path,
          docs.filter(col("doc_id") === 0L), Seq("doc_id"))
        (System.nanoTime() - t0) / 1e9
      }.min
      // the physical quantity a split halves is bytes-per-bucket — the
      // I/O a touched-bucket rewrite pays; at THIS corpus the wall is
      // fixed-cost-dominated (job setup + manifest commit), so record
      // both: bytes show the structural effect, walls the overhead floor
      def maxBucketBytes(): Long = {
        val epochs = MergeWriter.currentEpochs(spark, path).values.toSet
        epochs.toSeq.flatMap { e =>
          val d = new java.io.File(s"$path/$e")
          Option(d.listFiles()).toSeq.flatten.filter(_.isDirectory)
            .map(b => Option(b.listFiles()).toSeq.flatten
              .filter(_.getName.startsWith("part-")).map(_.length()).sum)
        }.maxOption.getOrElse(0L)
      }
      val pre = oneKeyMerge()
      val bytesPre = maxBucketBytes()
      val t0 = System.nanoTime()
      MergeWriter.splitBuckets(spark, path, Seq("doc_id"))
      val splitSec = (System.nanoTime() - t0) / 1e9
      val post = oneKeyMerge()
      val bytesPost = maxBucketBytes()
      println(f"""{"dir":"$tag","buckets_pre":8,"buckets_post":16,"max_bucket_bytes_pre":$bytesPre,"max_bucket_bytes_post":$bytesPost,"one_bucket_merge_pre_sec_min3":$pre%.2f,"split_sec":$splitSec%.2f,"one_bucket_merge_post_sec_min3":$post%.2f}""")
    }
    if (sections("split8")) { splitBench(base, "sf0.1"); splitBench(rep, "rep10") }

    // round 9: data skipping — a ts-clustered merge table records
    // per-file min/max in the manifest; a range read opens only files
    // intersecting the window. The claim: opened-file count and scan
    // wall track the MATCHED RANGE, not the table (the CFD date-window
    // shape at 100 TB). Windows at 10% / 50% / 100% of the ts span.
    def skipBench(dir: String, tag: String): Unit = {
      import graft.sources.MergeWriter
      val path = s"$work/skip9/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "5000")
      try MergeWriter.merge(spark, path, ev, Seq("event_id"), buckets = 16,
        clusterBy = Seq("ts"))
      finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
      def lerp(f: Double): Any = (mm.get(0), mm.get(1)) match {
        case (a: Long, b: Long) =>
          java.lang.Long.valueOf(a + ((b - a) * f).toLong)
        case (a: java.sql.Timestamp, b: java.sql.Timestamp) =>
          new java.sql.Timestamp(a.getTime + ((b.getTime - a.getTime) * f).toLong)
        case (a: java.time.LocalDateTime, b: java.time.LocalDateTime) =>
          val x = a.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          val y = b.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          java.time.LocalDateTime.ofInstant(
            java.time.Instant.ofEpochMilli(x + ((y - x) * f).toLong),
            java.time.ZoneOffset.UTC)
        case (a, _) => a
      }
      // the agg hashes two columns per row so the scan actually reads
      // data (a bare count() can be answered from parquet metadata)
      def scan(df: org.apache.spark.sql.DataFrame): (Int, Long, Double) = {
        val files = df.inputFiles.length
        val timed = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val n = df.select(xxhash64(col("event_id"), col("event_type")).as("h"))
            .agg(count(col("h"))).as[Long].head()
          (n, (System.nanoTime() - t0) / 1e9)
        }
        (files, timed.head._1, timed.map(_._2).min)
      }
      val (f10, n10, s10) = scan(MergeWriter.readTableRange(spark, path, "ts",
        Some(lerp(0.45)), Some(lerp(0.55))))
      val (f50, n50, s50) = scan(MergeWriter.readTableRange(spark, path, "ts",
        Some(lerp(0.25)), Some(lerp(0.75))))
      val (fAll, nAll, sAll) = scan(MergeWriter.readTable(spark, path))
      println(f"""{"dir":"$tag","skip_files_10pct":$f10,"skip_rows_10pct":$n10,"skip_sec_10pct_min3":$s10%.2f,"skip_files_50pct":$f50,"skip_rows_50pct":$n50,"skip_sec_50pct_min3":$s50%.2f,"full_files":$fAll,"full_rows":$nAll,"full_sec_min3":$sAll%.2f}""")
    }
    if (sections("skip9")) { skipBench(base, "sf0.1"); skipBench(rep, "rep10") }

    // round 9: Z-order vs linear clustering — files opened for a 10%
    // window on EACH dimension of (user_id, ts). Linear ts-clustering
    // should prune ts-windows only; the Morton layout should prune
    // both (at rectangle-granularity, so neither as sharply as linear
    // prunes its own column — the classic Z-order trade).
    def zorderBench(dir: String, tag: String): Unit = {
      import graft.sources.MergeWriter
      val lin = s"$work/zorder9/$tag/lin"
      val zed = s"$work/zorder9/$tag/zed"
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$work/zorder9/$tag"))
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "1250")
      try {
        MergeWriter.merge(spark, lin, ev, Seq("event_id"), buckets = 16,
          clusterBy = Seq("ts"))
        MergeWriter.merge(spark, zed, ev, Seq("event_id"), buckets = 16,
          clusterBy = Seq("zorder2:user_id,ts"))
      } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      val (uLo, uHi) = {
        val r = ev.agg(min(col("user_id")), max(col("user_id"))).head()
        val (a, b) = (r.getLong(0), r.getLong(1))
        (a + (b - a) * 45 / 100, a + (b - a) * 55 / 100)
      }
      val tsmm = ev.agg(min(col("ts")), max(col("ts"))).head()
      def tsAt(f: Double): Any = (tsmm.get(0), tsmm.get(1)) match {
        case (a: java.time.LocalDateTime, b: java.time.LocalDateTime) =>
          val x = a.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          val y = b.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          java.time.LocalDateTime.ofInstant(
            java.time.Instant.ofEpochMilli(x + ((y - x) * f).toLong),
            java.time.ZoneOffset.UTC)
        case (a: Long, b: Long) =>
          java.lang.Long.valueOf(a + ((b - a) * f).toLong)
        case (a, _) => a
      }
      def files(path: String, column: String, lo: Any, hi: Any): Int =
        MergeWriter.readTableRange(spark, path, column, Some(lo), Some(hi))
          .inputFiles.length
      val all = MergeWriter.readTable(spark, zed).inputFiles.length
      println(f"""{"dir":"$tag","zorder_total_files":$all,"lin_ts_files":${files(lin, "ts", tsAt(0.45), tsAt(0.55))},"lin_user_files":${files(lin, "user_id", uLo, uHi)},"zed_ts_files":${files(zed, "ts", tsAt(0.45), tsAt(0.55))},"zed_user_files":${files(zed, "user_id", uLo, uHi)}}""")
    }
    if (sections("zorder9")) { zorderBench(base, "sf0.1"); zorderBench(rep, "rep10") }

    // round 9: Bloom sidecar point probes — equality on a column the
    // table is NOT clustered by. On the replicated corpus a ts-clustered
    // file holds all 10 replicas' id bands, so its [min,max] on event_id
    // spans nearly the whole domain and stats alone skip NOTHING; the
    // per-file Bloom filter proves absence. Claim: files opened for a
    // point probe is O(1) with blooms vs O(table files) with stats only.
    def bloomBench(dir: String, tag: String): Unit = {
      import graft.sources.MergeWriter
      val noB = s"$work/bloom9/$tag/stats"
      val wiB = s"$work/bloom9/$tag/bloom"
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$work/bloom9/$tag"))
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "5000")
      try {
        MergeWriter.merge(spark, noB, ev, Seq("event_id"), buckets = 16,
          clusterBy = Seq("ts"))
        MergeWriter.merge(spark, wiB, ev, Seq("event_id"), buckets = 16,
          clusterBy = Seq("ts"), bloomBy = Seq("event_id"),
          bloomItems = 5000)
      } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      // the MEDIAN id: a domain-edge probe would let min/max prune
      // trivially (every file's max sits below it); the middle of the
      // domain is where the replicated corpus makes stats blind — each
      // ts-window file holds all 10 replicas' id bands, so its range
      // covers the median no matter the window
      val cnt = ev.count()
      val id = ev.select(col("event_id")).orderBy(col("event_id"))
        .offset((cnt / 2).toInt).limit(1).head().getLong(0)
      def probe(path: String): (Int, Long, Double) = {
        val df = MergeWriter.readTableWhere(spark, path, Seq(
          MergeWriter.ColumnRange("event_id", Some(id), Some(id))))
        val files = df.inputFiles.length
        val timed = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val n = df.agg(count(lit(1))).as[Long].head()
          (n, (System.nanoTime() - t0) / 1e9)
        }
        (files, timed.head._1, timed.map(_._2).min)
      }
      val (fS, nS, sS) = probe(noB)
      val (fB, nB, sB) = probe(wiB)
      val all = MergeWriter.readTable(spark, wiB).inputFiles.length
      println(f"""{"dir":"$tag","bloom_total_files":$all,"probe_files_stats":$fS,"probe_rows_stats":$nS,"probe_sec_stats_min3":$sS%.3f,"probe_files_bloom":$fB,"probe_rows_bloom":$nB,"probe_sec_bloom_min3":$sB%.3f}""")
    }
    if (sections("bloom9")) { bloomBench(base, "sf0.1"); bloomBench(rep, "rep10") }

    // round-7 additions: cut-apply splice, BM25 retrieval, PageRank
    // (q136 needs the lang column, absent from the rep10 projection —
    // base only)
    if (sections("r7")) {
      val qs = Seq("q130_cut_apply", "q133_bm25_topk", "q135_pair_pagerank")
      qs.foreach(q => time(base, q))
      time(base, "q136_token_mixture")
      qs.foreach(q => time(rep, q))
    }
    if (sections("zipf")) time(zipf, "q22_ngram_jaccard")

    // round 10: clustering retrofit (OPTIMIZE ZORDER as a verb) — an
    // UNCLUSTERED table opens every file for a 10% ts window; after
    // clusterTable the same window opens ~the window's fraction. The
    // before/after pair is the whole claim.
    def retroBench(dir: String, tag: String): Unit = {
      import graft.sources.MergeWriter
      val path = s"$work/retro10/$tag/t"
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$work/retro10/$tag"))
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "5000")
      try {
        MergeWriter.merge(spark, path, ev, Seq("event_id"), buckets = 16)
        val tsmm = ev.agg(min(col("ts")), max(col("ts"))).head()
        def tsAt(f: Double): Any = (tsmm.get(0), tsmm.get(1)) match {
          case (a: Long, b: Long) => java.lang.Long.valueOf(
            a + ((b - a) * f).toLong)
          case (a, _) => a
        }
        def window(): Int = MergeWriter.readTableRange(spark, path, "ts",
          Some(tsAt(0.45)), Some(tsAt(0.55))).inputFiles.length
        val before = window()
        val allBefore = MergeWriter.readTable(spark, path).inputFiles.length
        val t0 = System.nanoTime()
        MergeWriter.clusterTable(spark, path, Seq("ts"))
        val sec = (System.nanoTime() - t0) / 1e9
        val after = window()
        val allAfter = MergeWriter.readTable(spark, path).inputFiles.length
        println(f"""{"dir":"$tag","retro_files_total_before":$allBefore,"retro_window_before":$before,"retro_files_total_after":$allAfter,"retro_window_after":$after,"retro_rewrite_sec":$sec%.1f}""")
      } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
    if (sections("retro10")) { retroBench(base, "sf0.1"); retroBench(rep, "rep10") }

    // round 10: cross-column OR skipping — (10% user stripe) OR (point
    // ids): files opened ≈ union of the branches, not the table.
    def orBench(dir: String, tag: String): Unit = {
      import graft.sources.MergeWriter
      val path = s"$work/or10/$tag/t"
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$work/or10/$tag"))
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "5000")
      try MergeWriter.merge(spark, path, ev, Seq("event_id"), buckets = 16,
        clusterBy = Seq("zorder2:user_id,ts"))
      finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      val r = ev.agg(min(col("user_id")), max(col("user_id")),
        min(col("event_id"))).head()
      val (uLo, uHi) = (r.getLong(0) + (r.getLong(1) - r.getLong(0)) * 45 / 100,
        r.getLong(0) + (r.getLong(1) - r.getLong(0)) * 55 / 100)
      val ids = (0 until 4).map(i => r.getLong(2) + i)
      val all = MergeWriter.readTable(spark, path).inputFiles.length
      val stripe = MergeWriter.readTableWhere(spark, path, Seq(
        MergeWriter.ColumnRange("user_id", Some(uLo), Some(uHi))))
        .inputFiles.length
      val or = MergeWriter.readTableWhere(spark, path, Seq(
        MergeWriter.ColumnOr(Seq(
          Seq(MergeWriter.ColumnRange("user_id", Some(uLo), Some(uHi))),
          Seq(MergeWriter.ColumnIn("event_id", ids))))))
        .inputFiles.length
      println(s"""{"dir":"$tag","or_total_files":$all,"or_stripe_files":$stripe,"or_union_files":$or}""")
    }
    if (sections("or10")) { orBench(base, "sf0.1"); orBench(rep, "rep10") }

    // round 10: fingerprint change feeds — a one-key merge into a
    // fingerprinted clustered table diffs ~one repacked file per side
    // instead of every file of the changed bucket; the feed's file
    // count must stay flat from sf0.1 to rep10 (change-proportional,
    // not corpus-proportional).
    def fpFeedBench(dir: String, tag: String): Unit = {
      import graft.sources.MergeWriter
      val path = s"$work/fpfeed10/$tag/t"
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$work/fpfeed10/$tag"))
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      // the file-size cap stays on for BOTH writes — fingerprint
      // pairing needs the rewrite to split files at the same row
      // boundaries, exactly as a production session conf would
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "5000")
      val (v1, v2) = try {
        MergeWriter.merge(spark, path, ev, Seq("event_id"), buckets = 4,
          clusterBy = Seq("event_id"), fingerprint = true)
        val a = MergeWriter.availableVersions(spark, path).last
        val id = ev.agg(max(col("event_id"))).head().getLong(0)
        MergeWriter.merge(spark, path,
          ev.filter(col("event_id") === id).limit(1)
            .withColumn("event_type", lit("touched")),
          Seq("event_id"))
        (a, MergeWriter.availableVersions(spark, path).last)
      } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      val feed = MergeWriter.changeFeed(spark, path, v1, v2,
        Seq("event_id"), Seq("event_type"))
      val t0 = System.nanoTime()
      val n = feed.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val all = MergeWriter.readTable(spark, path).inputFiles.length
      println(f"""{"dir":"$tag","fpfeed_total_files":$all,"fpfeed_files":${feed.inputFiles.length},"fpfeed_rows":$n,"fpfeed_sec":$sec%.2f}""")
    }
    if (sections("fpfeed10")) { fpFeedBench(base, "sf0.1"); fpFeedBench(rep, "rep10") }

    // SQL row-level DML at scale (GraftRowLevel): a point UPDATE's cost
    // must track the MATCHED data (stats-pruned scan + one bounded
    // bucket rewrite), not the table — near-flat 1×→10× is the claim.
    // The small MERGE is reported honestly as scan-bound: delta-based
    // MERGE reads the target once (join side can't be statically
    // pruned — same cost shape as Delta/Iceberg), while its WRITE stays
    // ∝ changed buckets.
    def sqlDmlBench(dir: String, tag: String, buckets: Int): Unit = {
      val whRoot = s"$work/sqldml10/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(whRoot))
      // catalog name must be per-tag: CatalogManager caches the catalog
      // instance on first use, so a later warehouse-conf change on the
      // SAME name is silently ignored
      val cname = "gsb_" + tag.replace('.', '_')
      spark.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cname.warehouse", whRoot)
      val ev = Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), col("event_type"),
        col("ts").cast("timestamp_ntz").as("ts"))
      ev.createOrReplaceTempView("sdml_src")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cname.b")
      spark.sql(s"DROP TABLE IF EXISTS $cname.b.t")
      spark.sql(s"""CREATE TABLE $cname.b.t (event_id BIGINT, user_id BIGINT,
        event_type STRING, ts TIMESTAMP_NTZ)
        TBLPROPERTIES ('keys'='event_id','buckets'='$buckets',
        'clusterBy'='event_id')""")
      spark.sql(s"INSERT INTO $cname.b.t SELECT * FROM sdml_src")
      val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
      val updSec = (1 to 3).map(i => elapsedSec {
        spark.sql(s"UPDATE $cname.b.t SET event_type = 'u$i' " +
          s"WHERE event_id = ${maxId - i}")
      }).min
      val mrgSec = elapsedSec {
        spark.sql(s"""MERGE INTO $cname.b.t t
          USING (WITH head AS (SELECT event_id, user_id, ts
                   FROM sdml_src ORDER BY event_id LIMIT 250)
                 SELECT event_id, user_id, 'mrg' AS event_type, ts FROM head
                 UNION ALL
                 SELECT event_id + 900000000000, user_id, 'mrg', ts
                 FROM head) s
          ON t.event_id = s.event_id
          WHEN MATCHED THEN UPDATE SET event_type = s.event_type
          WHEN NOT MATCHED THEN INSERT * """)
      }
      val files = graft.sources.MergeWriter.readTable(spark, s"$whRoot/b/t")
        .inputFiles.length
      println(f"""{"dir":"$tag","sqldml_files":$files,"sqldml_point_update_sec":$updSec%.2f,"sqldml_small_merge_sec":$mrgSec%.2f}""")
    }
    if (sections("sqldml10")) {
      sqlDmlBench(base, "sf0.1", 4); sqlDmlBench(rep, "rep10", 16)
    }

    // Column identity at scale (round 11): RENAME / DROP / WIDEN are
    // metadata-only commits, so their wall must be FLAT 1×→10× (one
    // manifest rewrite, zero data I/O) — and the post-rename stats
    // probe must keep its pruning ratio (stats keys migrated with the
    // rename).
    def schemaBench(dir: String, tag: String, buckets: Int): Unit = {
      val root = s"$work/schema10/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val path = s"$root/t"
      val ev = Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), col("event_type"),
        col("value").cast("float").as("value"))
      // many range-disjoint files per bucket, so the renamed-column
      // probe has something to prune (one file per bucket can never
      // skip — it spans the full range)
      val prev = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "8192")
      try graft.sources.MergeWriter.merge(spark, path, ev, Seq("event_id"),
        buckets = buckets, clusterBy = Seq("user_id"))
      finally prev.fold(
        spark.conf.unset("spark.sql.files.maxRecordsPerFile"))(
        spark.conf.set("spark.sql.files.maxRecordsPerFile", _))
      val renameSec = elapsedSec {
        graft.sources.MergeWriter.renameColumn(spark, path,
          "user_id", "actor_id")
      }
      val widenSec = elapsedSec {
        graft.sources.MergeWriter.widenColumn(spark, path, "value",
          org.apache.spark.sql.types.DoubleType)
      }
      val all = graft.sources.MergeWriter.readTable(spark, path)
        .inputFiles.length
      // 1% range window on the RENAMED clustered column
      val hi = Tables.events(spark, dir)
        .agg(max(col("user_id"))).head().getLong(0)
      val probe = graft.sources.MergeWriter.readTableRange(spark, path,
        "actor_id", Some(0L), Some(hi / 100))
      val opened = probe.inputFiles.length
      val dropSec = elapsedSec {
        graft.sources.MergeWriter.dropColumn(spark, path, "event_type")
      }
      println(f"""{"dir":"$tag","schema_files":$all,"rename_sec":$renameSec%.3f,"widen_sec":$widenSec%.3f,"drop_sec":$dropSec%.3f,"renamed_probe_opened":$opened,"renamed_probe_frac":${opened.toDouble / all}%.3f}""")
    }
    if (sections("schema10")) {
      schemaBench(base, "sf0.1", 4); schemaBench(rep, "rep10", 16)
    }

    // Catalog streaming at scale (round 11): after the snapshot batch,
    // a drain that tails ONE small commit costs ∝ the commit's CHANGED
    // DATA, not the table: the version diff reads only buckets whose
    // pointer moved, fingerprint pairing drops the rewritten bucket's
    // unchanged files (update-only commit → stable file boundaries),
    // and the sink merge rewrites only the touched mirror buckets. The
    // tail commit's keys are confined to one hash bucket (pmod(hash)) —
    // a scattered key set touches every bucket by construction, which
    // is the WRITE pattern's cost, not the stream's.
    def streamBench(dir: String, tag: String, buckets: Int): Unit = {
      val root = s"$work/stream10/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val cname = "gss_" + tag.replace('.', '_')
      spark.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cname.warehouse", root)
      val ev = Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), col("event_type"))
      ev.createOrReplaceTempView("ss_src")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cname.b")
      spark.sql(s"""CREATE TABLE $cname.b.src (event_id BIGINT,
        user_id BIGINT, event_type STRING)
        TBLPROPERTIES ('keys'='event_id','buckets'='$buckets',
        'clusterBy'='event_id','retainVersions'='8','fingerprint'='true')""")
      spark.sql(s"""CREATE TABLE $cname.b.mirror (event_id BIGINT,
        user_id BIGINT, event_type STRING)
        TBLPROPERTIES ('keys'='event_id','buckets'='$buckets')""")
      val prev = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "8192")
      try {
        spark.sql(s"INSERT INTO $cname.b.src SELECT * FROM ss_src")
        val ckpt = s"$root/ckpt"
        def drain(): Double = {
          val t0 = System.nanoTime()
          val q = spark.readStream.table(s"$cname.b.src")
            .writeStream
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .option("checkpointLocation", ckpt)
            .toTable(s"$cname.b.mirror")
          q.awaitTermination()
          (System.nanoTime() - t0) / 1e9
        }
        val snapshotSec = drain() // ∝ table, reported for context
        // update-only tail commit, keys confined to bucket 0
        spark.sql(s"INSERT INTO $cname.b.src " +
          s"SELECT event_id, user_id + 1, event_type FROM ss_src " +
          s"WHERE pmod(hash(event_id), $buckets) = 0 " +
          "ORDER BY event_id LIMIT 500")
        val tailSec = drain() // the claim: ∝ the commit's changed files
        println(f"""{"dir":"$tag","stream_snapshot_sec":$snapshotSec%.2f,"stream_tail_sec":$tailSec%.2f}""")
      } finally prev.fold(
        spark.conf.unset("spark.sql.files.maxRecordsPerFile"))(
        spark.conf.set("spark.sql.files.maxRecordsPerFile", _))
    }
    if (sections("stream10")) {
      streamBench(base, "sf0.1", 4); streamBench(rep, "rep10", 16)
    }

    // Storage-partitioned joins at scale (round 11): the same co-keyed
    // join with SPJ on (zero exchanges) vs off (both sides shuffled).
    // The deleted exchange's cost grows with the data while the SPJ
    // plan's extra cost is zero — the on/off gap must WIDEN from sf0.1
    // to rep10. AQE off for a deterministic exchange count; broadcast
    // off so the small scale measures the same join strategy.
    def spjBench(dir: String, tag: String, buckets: Int): Unit = {
      val whRoot = s"$work/spj11/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(whRoot))
      val cname = "gspjb_" + tag.replace('.', '_')
      spark.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cname.warehouse", whRoot)
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .createOrReplaceTempView("spjb_src")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cname.b")
      spark.sql(s"""CREATE TABLE $cname.b.ja (event_id BIGINT,
        user_id BIGINT)
        TBLPROPERTIES ('keys'='event_id','buckets'='$buckets')""")
      spark.sql(s"""CREATE TABLE $cname.b.jb (event_id BIGINT,
        event_type STRING)
        TBLPROPERTIES ('keys'='event_id','buckets'='$buckets')""")
      spark.sql(s"INSERT INTO $cname.b.ja " +
        "SELECT event_id, user_id FROM spjb_src")
      spark.sql(s"INSERT INTO $cname.b.jb " +
        "SELECT event_id, event_type FROM spjb_src WHERE event_id % 2 = 0")
      def run(on: Boolean): (Double, Int, Long) = {
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
          on.toString)
        val df = spark.sql(s"""SELECT a.event_id, a.user_id, b.event_type
          FROM $cname.b.ja a JOIN $cname.b.jb b
          ON a.event_id = b.event_id""")
        // execute the INSPECTED plan (a noop write would re-plan and
        // leave these metrics untouched)
        val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution
        val t0 = System.nanoTime()
        qe.toRdd.foreach(_ => ())
        val sec = (System.nanoTime() - t0) / 1e9
        val exchanges = qe.executedPlan.collect {
          case s: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeLike => s
        }
        val bytes = exchanges
          .flatMap(_.metrics.get("dataSize").map(_.value)).sum
        (sec, exchanges.length, bytes)
      }
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val (onSec, onSh, onBy) =
          Seq(run(on = true), run(on = true)).minBy(_._1)
        val (offSec, offSh, offBy) =
          Seq(run(on = false), run(on = false)).minBy(_._1)
        println(f"""{"dir":"$tag","spj_on_sec":$onSec%.2f,"spj_off_sec":$offSec%.2f,"spj_on_shuffles":$onSh,"spj_off_shuffles":$offSh,"spj_on_shuffle_bytes":$onBy,"spj_off_shuffle_bytes":$offBy}""")
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      }
    }
    if (sections("spj11")) {
      spjBench(base, "sf0.1", 16); spjBench(rep, "rep10", 16)
    }

    // Runtime filtering at scale (round 11): fact ⋈ dim where the
    // dim's ~20 surviving join keys are only known at RUNTIME (the
    // flag column is data-dependent, so no static constraint folds
    // onto the fact side). With DPP on, the fact scan must open a
    // key-count-bounded file set at BOTH scales while the table's
    // file count grows ~10× — the flat line is the 100 TB claim.
    def dppBench(dir: String, tag: String): Unit = {
      val whRoot = s"$work/dpp11/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(whRoot))
      val cname = "gdppb_" + tag.replace('.', '_')
      spark.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cname.warehouse", whRoot)
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"))
        .createOrReplaceTempView("dppb_src")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cname.b")
      spark.sql(s"""CREATE TABLE $cname.b.fact (event_id BIGINT,
        user_id BIGINT)
        TBLPROPERTIES ('keys'='event_id','buckets'='16',
        'clusterBy'='event_id')""")
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "4096")
      try spark.sql(s"INSERT INTO $cname.b.fact " +
        "SELECT event_id, user_id FROM dppb_src")
      finally spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
      // 40 candidate keys; ~half survive a data-dependent flag
      Tables.events(spark, dir).select(col("event_id")).distinct()
        .orderBy(col("event_id")).limit(40)
        .withColumn("flag", pmod(hash(col("event_id")), lit(2)))
        .write.mode("overwrite").parquet(s"$whRoot/dim")
      spark.read.parquet(s"$whRoot/dim")
        .createOrReplaceTempView("dppb_dim")
      def scanFiles(df: org.apache.spark.sql.DataFrame): Int = {
        val scans = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.executedPlan.collect {
            case b: org.apache.spark.sql.execution.datasources.v2
              .BatchScanExec => b
          }
        scans.map(_.scan.toBatch.planInputPartitions().collect {
          case fp: org.apache.spark.sql.execution.datasources
            .FilePartition => fp.files.length
        }.sum).max
      }
      val total = scanFiles(spark.table(s"$cname.b.fact"))
      def run(on: Boolean): (Double, Int) = {
        spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.enabled",
          on.toString)
        val df = spark.sql(s"""SELECT COUNT(*) AS n, SUM(f.user_id) AS s
          FROM $cname.b.fact f JOIN dppb_dim d
          ON f.event_id = d.event_id WHERE d.flag = 0""")
        val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution
        val t0 = System.nanoTime()
        qe.toRdd.foreach(_ => ())
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, scanFiles(df))
      }
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val (onSec, onFiles) =
          Seq(run(on = true), run(on = true)).minBy(_._1)
        val (offSec, offFiles) =
          Seq(run(on = false), run(on = false)).minBy(_._1)
        println(f"""{"dir":"$tag","dpp_on_sec":$onSec%.2f,"dpp_off_sec":$offSec%.2f,"dpp_on_files":$onFiles,"dpp_off_files":$offFiles,"total_files":$total}""")
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      }
    }
    if (sections("dpp11")) { dppBench(base, "sf0.1"); dppBench(rep, "rep10") }

    // Deletion vectors at scale (round 11): a 10-key purge on a
    // deleteVectors table must stay METADATA-SIZED — bytes written flat
    // (one sidecar + one manifest) and wall flat 1×→10× — while the
    // copy-on-write delete pays the full touched-bucket rewrite, whose
    // bytes grow with the corpus. Also times the post-delete full scan
    // on both tables, through the storage core (scan_sec) AND the SQL
    // catalog (catalog_scan_sec): since round 12 the DV table's catalog
    // scan stays the native DSv2 plan with a reader-side row-index skip
    // (row-based until compaction purges the vectors) — the remaining
    // read-side price of the write-side win, bounded by
    // DvAutoCompactFiles.
    def dvBench(dir: String, tag: String, buckets: Int): Unit = {
      val root = s"$work/dv11/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val ev = Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), col("event_type"), col("value"))
      val doomed = ev.select(col("event_id"))
        .filter(pmod(col("event_id"), lit(10007)) === 13).limit(10)
        .collect().map(_.getLong(0)).toSeq
      import spark.implicits._
      for ((dv, mode) <- Seq((true, "dv"), (false, "cow"))) {
        val path = s"$root/$mode"
        graft.sources.MergeWriter.merge(spark, path, ev, Seq("event_id"),
          buckets = buckets, clusterBy = Seq("event_id"),
          deleteVectors = dv)
        val before = dirBytesOf(path)
        val delSec = elapsedSec {
          graft.sources.MergeWriter.delete(spark, path,
            doomed.toDF("event_id"), Seq("event_id"))
        }
        val written = dirBytesOf(path) - before
        val scanSec = elapsedSec {
          graft.sources.MergeWriter.readTable(spark, path).count()
        }
        val cat = ("gsbdv" + tag + mode).replace(".", "_")
        spark.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
        // min-of-2: the first catalog scan in a fresh session pays
        // one-time catalyst/codegen warmup that isn't the scan's cost
        val catSec = Seq.fill(2)(
          elapsedSec { spark.table(s"$cat.$mode").count() }).min
        println(f"""{"dir":"$tag","mode":"$mode","table_bytes":$before,"delete_sec":$delSec%.3f,"bytes_written":$written,"scan_sec":$scanSec%.3f,"catalog_scan_sec":$catSec%.3f}""")
      }
    }
    if (sections("dv11")) { dvBench(base, "sf0.1", 4); dvBench(rep, "rep10", 16) }

    // Merge-on-read upserts at scale (round 11): a 10-key trickle
    // upsert on a deleteVectors table lands as one overlay epoch plus a
    // KB-scale sidecar — bytes written ∝ the batch, flat 1×→10× — while
    // the copy-on-write merge rewrites every touched bucket. Scan cost
    // after the upsert recorded for both, storage-core and catalog (the
    // MoR table's catalog scan stays native with the reader-side DV
    // skip, row-based until compaction).
    def morBench(dir: String, tag: String, buckets: Int): Unit = {
      val root = s"$work/mor11/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val ev = Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), col("event_type"), col("value"))
      val someIds = ev.select(col("event_id"))
        .filter(pmod(col("event_id"), lit(10007)) === 13).limit(10)
        .collect().map(_.getLong(0)).toSeq
      import spark.implicits._
      for ((dv, mode) <- Seq((true, "mor"), (false, "cow"))) {
        val path = s"$root/$mode"
        graft.sources.MergeWriter.merge(spark, path, ev, Seq("event_id"),
          buckets = buckets, clusterBy = Seq("event_id"),
          deleteVectors = dv)
        val batch = someIds.map(id => (id, -1L, "touched", 0.0))
          .toDF("event_id", "user_id", "event_type", "value")
        val before = dirBytesOf(path)
        val upSec = elapsedSec {
          graft.sources.MergeWriter.merge(spark, path, batch,
            Seq("event_id"))
        }
        val written = dirBytesOf(path) - before
        val scanSec = elapsedSec {
          graft.sources.MergeWriter.readTable(spark, path).count()
        }
        val cat = ("gsbmor" + tag + mode).replace(".", "_")
        spark.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
        // min-of-2: the first catalog scan in a fresh session pays
        // one-time catalyst/codegen warmup that isn't the scan's cost
        val catSec = Seq.fill(2)(
          elapsedSec { spark.table(s"$cat.$mode").count() }).min
        println(f"""{"dir":"$tag","mode":"$mode","table_bytes":$before,"upsert_sec":$upSec%.3f,"bytes_written":$written,"scan_sec":$scanSec%.3f,"catalog_scan_sec":$catSec%.3f}""")
      }
    }
    if (sections("mor11")) {
      morBench(base, "sf0.1", 4); morBench(rep, "rep10", 16)
    }

    // Equality deletes at scale (round 13): the TRICKLE-CDC shape — five
    // consecutive 10-key upserts (the q140 trigger wall) on the same
    // table, three write modes: eqd (write-only doomed-key sidecars, no
    // probe read), mor (position DVs — one pruned probe read per
    // trigger), cow (full bucket rewrites). The eqd trickle wall must
    // undercut mor's (the probe is the per-trigger fixed cost eq-deletes
    // delete) and both must stay flat 1×→10× while cow scales with
    // bucket bytes. Read-side price recorded on both instruments: the
    // storage scan pays the broadcast anti-join, the catalog scan pays
    // the plan-time position resolution — both bounded by the doomed-key
    // caps and drained by compaction.
    def eqdBench(dir: String, tag: String, buckets: Int): Unit = {
      val root = s"$work/eq13/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val ev = Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), col("event_type"), col("value"))
      val someIds = ev.select(col("event_id"))
        .filter(pmod(col("event_id"), lit(1009)) === 13).limit(50)
        .collect().map(_.getLong(0)).toSeq
      import spark.implicits._
      for ((mode, dv, eqd) <- Seq(("eqd", true, true), ("mor", true, false),
                                  ("cow", false, false))) {
        val path = s"$root/$mode"
        graft.sources.MergeWriter.merge(spark, path, ev, Seq("event_id"),
          buckets = buckets, clusterBy = Seq("event_id"),
          deleteVectors = dv, eqDeletes = eqd)
        val before = dirBytesOf(path)
        val rounds = someIds.grouped(10).toSeq.map { ids =>
          val batch = ids.map(id => (id, -1L, "touched", 0.0))
            .toDF("event_id", "user_id", "event_type", "value")
          elapsedSec {
            graft.sources.MergeWriter.merge(spark, path, batch,
              Seq("event_id"))
          }
        }
        val written = dirBytesOf(path) - before
        val scanSec = elapsedSec {
          graft.sources.MergeWriter.readTable(spark, path).count()
        }
        val cat = ("gsbeqd" + tag + mode).replace(".", "_")
        spark.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
        // min-of-2: the first catalog scan in a fresh session pays
        // one-time catalyst/codegen warmup that isn't the scan's cost
        val catSec = Seq.fill(2)(
          elapsedSec { spark.table(s"$cat.$mode").count() }).min
        val roundsJson = rounds.map(r => f"$r%.3f").mkString("[", ",", "]")
        println(f"""{"dir":"$tag","mode":"$mode","table_bytes":$before,"trickle_sec":${rounds.sum}%.3f,"round_sec":$roundsJson,"bytes_written":$written,"scan_sec":$scanSec%.3f,"catalog_scan_sec":$catSec%.3f}""")
      }
    }
    if (sections("eq13")) {
      eqdBench(base, "sf0.1", 4); eqdBench(rep, "rep10", 16)
    }

    // Materialized-view maintenance at scale (round 13): create pays
    // ONE full evaluation (∝ corpus — the only one the MV ever pays);
    // a trickle churn's refresh must price ∝ the changed rows, flat
    // 1×→10×, never re-evaluating the source. The refresh wall is the
    // claim: an MV over 10× the data refreshes a 20-row churn in the
    // same time as over 1×.
    def mvBench(dir: String, tag: String, buckets: Int): Unit = {
      val root = s"$work/mv13/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val ev = Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), col("event_type"), col("value"))
      val src = s"$root/src"
      graft.sources.MergeWriter.merge(spark, src, ev, Seq("event_id"),
        buckets = buckets, clusterBy = Seq("event_id"), fingerprint = true)
      val createSec = elapsedSec {
        graft.sources.MaterializedViews.create(spark, s"$root/mv", src,
          "src", "SELECT event_type, COUNT(*) AS n, SUM(user_id) AS su " +
            "FROM src WHERE value >= 0 GROUP BY event_type")
      }
      import spark.implicits._
      val someIds = ev.select(col("event_id"))
        .filter(pmod(col("event_id"), lit(1009)) === 13).limit(20)
        .collect().map(_.getLong(0)).toSeq
      val batch = someIds.map(id => (id, -1L, "touched", 0.0))
        .toDF("event_id", "user_id", "event_type", "value")
      graft.sources.MergeWriter.merge(spark, src, batch, Seq("event_id"))
      graft.sources.MergeWriter.delete(spark, src,
        someIds.take(5).toDF("event_id"), Seq("event_id"))
      val refreshSec = elapsedSec {
        graft.sources.MaterializedViews.refresh(spark, s"$root/mv")
      }
      val mvRows = graft.sources.MergeWriter
        .readTable(spark, s"$root/mv").count()
      println(f"""{"dir":"$tag","create_sec":$createSec%.3f,"refresh_sec":$refreshSec%.3f,"mv_rows":$mvRows}""")
    }
    if (sections("mv13")) {
      mvBench(base, "sf0.1", 4); mvBench(rep, "rep10", 16)
    }

    // Incremental DIM maintenance at scale (round 15): a churned dim
    // row must cost ∝ its AFFECTED GROUPS — bounded re-aggregation and
    // a bounded MV write — never a full re-evaluation that rewrites
    // the whole view. The view here has 4096 groups keyed 1:1 by the
    // dim's join key, so the measurable claim is direct: churning k
    // dim rows refreshes with MV-write bytes ∝ k (vs the create's
    // full-view write), and the wall stays far under the full
    // evaluation as k shrinks. The source-scan passes remain
    // corpus-proportional in INPUT (three broadcast-restricted passes
    // — reported honestly via the 10× corpus row), but shuffle and
    // write are churn-bounded, which is the 100 TB property (a 10^8-
    // group view must not rewrite per automap).
    def mv15Bench(dir: String, tag: String, buckets: Int): Unit = {
      val root = s"$work/mv15/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val ev = Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), pmod(col("user_id"), lit(4096)).as("ub"))
      val src = s"$root/src"
      graft.sources.MergeWriter.merge(spark, src, ev, Seq("event_id"),
        buckets = buckets, clusterBy = Seq("event_id"), fingerprint = true)
      val dimPath = s"$root/dim"
      val dim0 = spark.range(0, 4096).toDF("ub")
        .select(col("ub"), concat(lit("g"), col("ub")).as("label"))
      graft.sources.MergeWriter.merge(spark, dimPath, dim0, Seq("ub"),
        buckets = 2)
      val mv = s"$root/mv"
      val createSec = elapsedSec {
        graft.sources.MaterializedViews.create(spark, mv, src, "src",
          "SELECT label, COUNT(*) AS n, SUM(user_id) AS su " +
            "FROM src JOIN dim ON ub = ub GROUP BY label",
          dims = Seq((dimPath, "dim")))
      }
      val createMb = dirBytesOf(mv) / 1e6
      def churn(k: Int): (Double, Double) = {
        val batch = spark.range(0, k.toLong).toDF("i")
          .select((col("i") * (4096L / k)).as("ub"),
            concat(lit(s"m$k-"), col("i")).as("label"))
        graft.sources.MergeWriter.merge(spark, dimPath, batch, Seq("ub"))
        val b0 = dirBytesOf(mv)
        val sec = elapsedSec {
          val w = graft.sources.MaterializedViews.refresh(spark, mv)
          require(w.exists(_._1 >= 0),
            s"mv15: dim churn of $k keys must fold incrementally, got $w")
        }
        (sec, (dirBytesOf(mv) - b0) / 1e6)
      }
      // unreported warmup churn: the FIRST refresh pays one-time JIT/
      // manifest-cache costs that would otherwise masquerade as the
      // smallest churn's wall
      churn(2)
      val (s4, mb4) = churn(4)
      val (s256, mb256) = churn(256)
      val mvRows = graft.sources.MergeWriter.readTable(spark, mv).count()
      println(f"""{"dir":"$tag","create_sec":$createSec%.3f,"create_mb":$createMb%.2f,"dim4_sec":$s4%.3f,"dim4_mb":$mb4%.3f,"dim256_sec":$s256%.3f,"dim256_mb":$mb256%.3f,"mv_rows":$mvRows}""")
    }
    if (sections("mv15")) {
      mv15Bench(base, "sf0.1", 8); mv15Bench(rep, "rep10", 16)
    }

    // Transparent MV query rewrite at scale (round 15): the
    // substitution deletes the source scan + aggregate shuffle for an
    // answer the engine already maintains. Measured: the SAME SQL with
    // the rewrite off vs on (min-of-3 full collects), plus the
    // rollup-point-query shape (a group-column WHERE evaluating as a
    // one-row residual read of the view).
    def mvrw15(dir: String, tag: String, buckets: Int): Unit = {
      val root = s"$work/mvrw15/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val cat = s"gsbrw$tag".replaceAll("[^A-Za-z0-9]", "")
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .createOrReplaceTempView(s"mvrw_src_$cat")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.etl")
      spark.sql(s"""CREATE TABLE $cat.etl.src (event_id BIGINT,
        user_id BIGINT, event_type STRING) TBLPROPERTIES
        ('keys'='event_id', 'buckets'='$buckets',
         'retainVersions'='10')""")
      spark.sql(s"INSERT INTO $cat.etl.src SELECT event_id, user_id, " +
        s"event_type FROM mvrw_src_$cat")
      spark.sql(s"""CALL $cat.system.create_mv(view => 'etl.mv',
        source => 'etl.src', query => 'SELECT event_type,
        COUNT(*) AS n, SUM(user_id) AS su, COUNT(user_id) AS nu
        FROM src GROUP BY event_type')""")
      spark.sql(s"CALL $cat.system.enable_mv_rewrite(view => 'etl.mv')")
      val q = s"SELECT event_type, COUNT(*) AS n, SUM(user_id) AS su " +
        s"FROM $cat.etl.src GROUP BY event_type"
      val qPoint = s"SELECT event_type, COUNT(*) AS n FROM $cat.etl.src " +
        s"WHERE event_type = 'click' GROUP BY event_type"
      def minOf3(sql: String): Double =
        (0 until 3).map(_ => elapsedSec { spark.sql(sql).collect(); () }).min
      spark.conf.set("spark.graft.mv.rewrite", "false")
      val (offFull, offPoint) =
        try (minOf3(q), minOf3(qPoint))
        finally spark.conf.unset("spark.graft.mv.rewrite")
      val (onFull, onPoint) = (minOf3(q), minOf3(qPoint))
      val rows = spark.sql(q).count()
      println(f"""{"mvrw15":"$tag","agg_off_sec":$offFull%.3f,"agg_on_sec":$onFull%.3f,"point_off_sec":$offPoint%.3f,"point_on_sec":$onPoint%.3f,"groups":$rows}""")
    }
    if (sections("mvrw15")) {
      mvrw15(base, "sf0.1", 8); mvrw15(rep, "rep10", 32)
    }

    // Manifest segmentation at scale (round 14): the full-snapshot
    // manifest is O(buckets) LOGICALLY, but a trickle commit must not
    // WRITE O(buckets) — past the inline threshold the head carries a
    // segment-hash list and the commit publishes only the touched
    // ranges. The claim this rehearsal measures: trickle-commit
    // metadata bytes stay FLAT as the bucket modulus grows 1×→64×
    // (the full snapshot meanwhile grows linearly — reported for
    // contrast), and the repeated-read cost after the first load is
    // the small head only (segments are content-addressed and cached).
    def manBench(buckets: Int): Unit = {
      val root = s"$work/man14/b$buckets"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val path = s"$root/t"
      val rows = spark.range(0, 200000).select(col("id"),
        concat(lit("body-"), col("id")).as("body"),
        pmod(col("id"), lit(97)).cast("int").as("grp"))
      graft.sources.MergeWriter.merge(spark, path, rows, Seq("id"),
        buckets = buckets, clusterBy = Seq("id"), eqDeletes = true,
        deleteVectors = true, fingerprint = true)
      def headFile(): java.io.File = {
        val d = new java.io.File(path)
        val n = d.listFiles().map(_.getName)
          .filter(_.startsWith("_manifest-")).sorted.last
        new java.io.File(d, n)
      }
      def segSizes(): Map[String, Long] = {
        val d = new java.io.File(path, "_seg")
        if (!d.exists()) Map.empty
        else d.listFiles().filter(_.getName.startsWith("seg-"))
          .map(f => f.getName -> f.length()).toMap
      }
      val segsBefore = segSizes()
      val fullSnapshotBytes = headFile().length() + segsBefore.values.sum
      // the trickle: a 10-key write-only eq-delete upsert (the CDC
      // shape the design optimizes for)
      import spark.implicits._
      val batch = (0 until 10).map(i => (i * 13L + 7, s"UPD-$i", 1))
        .toDF("id", "body", "grp")
      val trickleSec = elapsedSec {
        graft.sources.MergeWriter.merge(spark, path, batch, Seq("id"))
      }
      val segsAfter = segSizes()
      val newSegBytes = (segsAfter.keySet -- segsBefore.keySet)
        .map(segsAfter).sum
      val headBytes = headFile().length()
      val trickleMetaBytes = headBytes + newSegBytes
      // repeated MANIFEST resolution of the same version: re-reads the
      // small head only (segments are content-addressed and cached) —
      // this wall is the metadata claim. A full data scan would time
      // parquet-open cost of the synthetic tiny files instead.
      graft.sources.MergeWriter.describeTable(spark, path).collect()
      val resolveSec = elapsedSec {
        graft.sources.MergeWriter.describeTable(spark, path).collect()
      }
      val nSegs = segsAfter.size
      println(f"""{"buckets":$buckets,"trickle_meta_bytes":$trickleMetaBytes,"head_bytes":$headBytes,"new_seg_bytes":$newSegBytes,"full_snapshot_meta_bytes":$fullSnapshotBytes,"live_plus_superseded_segs":$nSegs,"trickle_sec":$trickleSec%.3f,"resolve_sec":$resolveSec%.3f}""")
    }
    if (sections("man14")) {
      Seq(128, 1024, 8192).foreach(manBench)
    }

    // Group-member write-path amplification (round 14): q140's ingest
    // loop commits (vecs, bands) per trigger. With CoW staging the
    // per-trigger write rewrites every touched bucket — cost grows
    // with the STORED corpus even at fixed batch size. With eqDeletes
    // members the trigger stages an overlay + doomed-key sidecar —
    // write cost ∝ the batch, flat as the corpus grows. Fixed 2k-row
    // batches against a 1× vs 10× seeded corpus, same JVM, both modes.
    def gq14(dir: String, tag: String, mode: String, batchMod: Int): Unit = {
      val root = s"$work/gq14/$tag-$mode"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val eqd = if (mode == "eqd") Set("vecs", "bands") else Set.empty[String]
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      // batchMod scales with the corpus so the four trickle batches
      // hold ~the same ~100 vectors at 1× and 10× — the fixed-batch /
      // growing-corpus shape the write-amplification claim is about.
      // 8 buckets = q140's actual modulus; 4 batches × 8 buckets stays
      // under the MoR pressure bound, so no drain rides the timing
      // (drains are amortized maintenance, priced by compact7/eq13).
      val seedRows = emb.filter(pmod(col("vec_id"), lit(batchMod)) =!= 0)
      val seedBands = graft.operators.Similarity.srpBandRows(seedRows,
        col("vec_id"), col("embedding"), bits = 32, bands = 4)
      graft.sources.MergeWriter.mergeGroup(spark, root, Seq(
        ("vecs", seedRows, Seq("vec_id")),
        ("bands", seedBands, Seq("id", "band"))),
        buckets = 8, eqDeletes = eqd)
      val newRows = emb.filter(pmod(col("vec_id"), lit(batchMod)) === 0)
        .withColumn("__i", pmod(col("vec_id") / batchMod, lit(4)))
        .persist()
      val batchTotal = newRows.count()
      val bytes0 = dirBytesOf(root)
      var wall = 0.0
      (0 until 4).foreach { i =>
        val b = newRows.filter(col("__i") === i).drop("__i")
        val bb = graft.operators.Similarity.srpBandRows(b, col("vec_id"),
          col("embedding"), bits = 32, bands = 4)
        wall += elapsedSec {
          graft.sources.MergeWriter.mergeGroup(spark, root, Seq(
            ("vecs", b, Seq("vec_id")),
            ("bands", bb, Seq("id", "band"))),
            buckets = 8, eqDeletes = eqd)
        }
      }
      val written = dirBytesOf(root) - bytes0
      val readSec = elapsedSec {
        graft.sources.MergeWriter.readGroupTable(spark, root, "vecs").count()
      }
      // round 15: the streaming sink's drain cadence
      // (drainGroupPressure) bounds the read-side anti-join depth —
      // re-measure the same read after one drain (no-op under cow)
      val drainSec = elapsedSec {
        graft.sources.MergeWriter.drainGroupPressure(spark, root,
          overlayBound = 1, eqdBound = 1)
      }
      val readDrainedSec = elapsedSec {
        graft.sources.MergeWriter.readGroupTable(spark, root, "vecs").count()
      }
      newRows.unpersist()
      println(f"""{"gq14":"$tag-$mode","batch_rows_total":$batchTotal,"trickle_commit_sec":$wall%.3f,"trickle_bytes":$written,"read_sec":$readSec%.3f,"drain_sec":$drainSec%.3f,"read_drained_sec":$readDrainedSec%.3f}""")
    }
    if (sections("gq14")) {
      Seq("cow", "eqd").foreach(m => gq14(base, "sf0.1", m, 29))
      Seq("cow", "eqd").foreach(m => gq14(rep, "rep10", m, 290))
    }

    // Shredded variant paths at scale (round 14): a variant-path point
    // probe on a trickle-grown table must price ∝ the MATCHING batch,
    // not the corpus — the hidden shred columns feed file skipping, so
    // the planned file set (and wall) stays flat as the batch count
    // grows 10×, while the same probe on an undeclared table scans
    // every file. Both tables are eqDeletes trickles (batch-disjoint
    // files — the shape shredding exists for).
    def shredBench(dir: String, tag: String, batches: Int): Unit = {
      val root = s"$work/shred14/$tag-$batches"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars")).persist()
      val perBatch = docs.count()
      def scanFiles(df: org.apache.spark.sql.DataFrame): (Int, Long) =
        df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec => b
        }.headOption.map { b =>
          val fs = b.inputPartitions.flatMap {
            case fp: org.apache.spark.sql.execution.datasources
              .FilePartition => fp.files
                .map(f => (f.urlEncodedPath, f.fileSize)).toSeq
            case _ => Seq.empty
          }.distinct
          (fs.size, fs.map(_._2).sum)
        }.getOrElse((-1, -1L))
      for (mode <- Seq("shred", "plain")) {
        val cat = ("gsbshred" + tag + mode + batches).replace(".", "_")
        spark.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftCatalog].getName)
        spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
        val shredProp = if (mode == "shred")
          ", 'shred'='$.b:bigint,$.lang:string'" else ""
        spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
        spark.sql(s"""CREATE TABLE $cat.ns.$mode (doc_id BIGINT, cf VARIANT)
          TBLPROPERTIES ('keys'='doc_id', 'buckets'='8',
            'eqDeletes'='true'$shredProp)""")
        docs.createOrReplaceTempView(s"shred_docs_$cat")
        (0 until batches).foreach { k =>
          spark.sql(s"""INSERT INTO $cat.ns.$mode
            SELECT doc_id + ${k * 10000000L}, parse_json(to_json(
              named_struct('b', ${k}L, 'lang', lang, 'n', n_chars)))
            FROM shred_docs_$cat""")
        }
        val probe = () => spark.sql(s"SELECT COUNT(*) FROM $cat.ns.$mode " +
          s"WHERE variant_get(cf, '$$.b', 'bigint') = ${batches - 1}")
        // file count off the exchange-free plan shape (COUNT wraps the
        // scan in AQE, whose collect doesn't descend)
        val (files, bytes) = scanFiles(spark.sql(
          s"SELECT doc_id FROM $cat.ns.$mode " +
            s"WHERE variant_get(cf, '$$.b', 'bigint') = ${batches - 1}"))
        val (filesAll, bytesAll) = scanFiles(spark.sql(
          s"SELECT doc_id FROM $cat.ns.$mode"))
        // min-of-2: first catalog scan pays one-time codegen warmup
        val sec = Seq.fill(2)(elapsedSec { probe().collect() }).min
        val rows = probe().collect().head.getLong(0)
        println(f"""{"shred14":"$tag-$mode","batches":$batches,"rows_per_batch":$perBatch,"probe_rows":$rows,"files_planned":$files,"bytes_planned":$bytes,"files_total":$filesAll,"bytes_total":$bytesAll,"probe_sec":$sec%.3f}""")
      }
      docs.unpersist()
      ()
    }
    if (sections("shred14")) {
      shredBench(base, "sf0.1", 5)
      shredBench(base, "sf0.1", 50)
    }

    // Branch staging at scale (round 12): a write-audit-publish cycle
    // on a deleteVectors table — stage a 10-key DV delete plus a
    // 10-key MoR upsert on a branch, audit the branch head, publish.
    // The scale claims: STAGED bytes stay metadata-sized (sidecar +
    // overlay + branch manifests, flat 1×→10×), and the PUBLISH is one
    // manifest commit regardless of staged volume — at 100 TB, the
    // whole WAP cycle costs ∝ the changeset, never ∝ the table.
    def wapBench(dir: String, tag: String, buckets: Int): Unit = {
      val root = s"$work/wap12/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val ev = Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), col("event_type"), col("value"))
      val path = s"$root/t"
      graft.sources.MergeWriter.merge(spark, path, ev, Seq("event_id"),
        buckets = buckets, clusterBy = Seq("event_id"),
        deleteVectors = true)
      val ids = ev.select(col("event_id"))
        .filter(pmod(col("event_id"), lit(10007)) === 13).limit(20)
        .collect().map(_.getLong(0)).toSeq
      val (doomed, touched) = ids.splitAt(10)
      import spark.implicits._
      graft.sources.MergeWriter.createBranch(spark, path, "stage")
      val before = dirBytesOf(path)
      val stageSec = elapsedSec {
        graft.sources.MergeWriter.delete(spark, path,
          doomed.toDF("event_id"), Seq("event_id"), ref = Some("stage"))
        graft.sources.MergeWriter.merge(spark, path,
          touched.map(id => (id, -1L, "touched", 0.0))
            .toDF("event_id", "user_id", "event_type", "value"),
          Seq("event_id"), ref = Some("stage"))
      }
      val stagedBytes = dirBytesOf(path) - before
      val auditSec = elapsedSec {
        graft.sources.MergeWriter.readBranch(spark, path, "stage").count()
      }
      val prePub = dirBytesOf(path)
      val pubSec = elapsedSec {
        graft.sources.MergeWriter.fastForward(spark, path, "stage")
      }
      val pubBytes = dirBytesOf(path) - prePub
      val mainSec = elapsedSec {
        graft.sources.MergeWriter.readTable(spark, path).count()
      }
      println(f"""{"dir":"$tag","table_bytes":$before,"stage_sec":$stageSec%.3f,"staged_bytes":$stagedBytes,"audit_sec":$auditSec%.3f,"publish_sec":$pubSec%.3f,"publish_bytes":$pubBytes,"main_scan_sec":$mainSec%.3f}""")
    }
    if (sections("wap12")) {
      wapBench(base, "sf0.1", 4); wapBench(rep, "rep10", 16)
    }

    // ---- gov12: governance surfaces at scale — CHECK-constraint
    // enforcement and incremental-stats refresh must price ∝ BATCH
    // (flat 1×→10×); the add-time validation scan and ANALYZE are
    // corpus passes BY CONTRACT (the guarantee they claim requires
    // reading everything) and should scale ~linearly; ADD COLUMN with
    // a DEFAULT is one manifest write (flat, metadata-sized).
    def govBench(dir: String, tag: String, buckets: Int): Unit = {
      val root = s"$work/gov12/$tag"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val ev = Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), col("event_type"), col("value"))
      val path = s"$root/t"
      // deleteVectors: the trickle merges below land as MoR overlays,
      // so bucket-rewrite cost cannot mask the per-commit overhead
      // being measured
      graft.sources.MergeWriter.merge(spark, path, ev, Seq("event_id"),
        buckets = buckets, clusterBy = Seq("event_id"),
        deleteVectors = true)
      import spark.implicits._
      def batch(seed: Long) = (0 until 2000).map(i =>
        (3000000000L + seed * 100000L + i, i.toLong, "late", 1.0))
        .toDF("event_id", "user_id", "event_type", "value")
      val plainSec = elapsedSec {
        graft.sources.MergeWriter.merge(spark, path, batch(1),
          Seq("event_id"))
      }
      val addSec = elapsedSec { // corpus validation scan, by contract
        graft.sources.MergeWriter.addCheckConstraint(spark, path,
          "value_sane", "value > -1e18")
      }
      val chkSec = elapsedSec { // same trickle, now guard-enforced
        graft.sources.MergeWriter.merge(spark, path, batch(2),
          Seq("event_id"))
      }
      val anaSec = elapsedSec { // corpus stats pass, by contract
        graft.sources.MergeWriter.analyzeTable(spark, path)
      }
      val refSec = elapsedSec { // trickle + per-commit sketch union
        graft.sources.MergeWriter.merge(spark, path, batch(3),
          Seq("event_id"))
      }
      val meta = new org.apache.spark.sql.types.MetadataBuilder()
        .putString("CURRENT_DEFAULT", "'x'")
        .putString("EXISTS_DEFAULT", "'x'").build()
      val defSec = elapsedSec { // metadata-only retrofit
        graft.sources.MergeWriter.addColumns(spark, path,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("tag",
              org.apache.spark.sql.types.StringType, nullable = true,
              meta))))
      }
      // identity + generated: a trickle on a declared-column table —
      // assignment, generation, validation and the high-water read-back
      // must all price ∝ batch (flat 1×→10×)
      val idPath = s"$root/id"
      val idCat = "govid_" + tag.replace('.', '_')
      spark.conf.set(s"spark.sql.catalog.$idCat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$idCat.warehouse", s"$root/idwh")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $idCat.ns")
      spark.sql(s"""CREATE TABLE $idCat.ns.t (
        sk BIGINT GENERATED BY DEFAULT AS IDENTITY,
        event_id BIGINT, value DOUBLE,
        cents BIGINT GENERATED ALWAYS AS (CAST(value * 100 AS BIGINT)))
        TBLPROPERTIES ('keys'='event_id', 'buckets'='$buckets',
        'deleteVectors'='true')""")
      ev.select(col("event_id"), col("value"))
        .createOrReplaceTempView("gov_ev_" + tag.replace('.', '_'))
      spark.sql(s"INSERT INTO $idCat.ns.t (event_id, value) " +
        "SELECT event_id, value FROM gov_ev_" + tag.replace('.', '_'))
      val idSec = elapsedSec {
        spark.sql(s"INSERT INTO $idCat.ns.t (event_id, value) " +
          "SELECT event_id + 4000000000, value FROM gov_ev_" +
          tag.replace('.', '_') + " " +
          "LIMIT 2000")
      }
      println(f"""{"dir":"$tag","plain_merge_sec":$plainSec%.3f,"add_constraint_sec":$addSec%.3f,"checked_merge_sec":$chkSec%.3f,"analyze_sec":$anaSec%.3f,"refresh_merge_sec":$refSec%.3f,"add_default_col_sec":$defSec%.3f,"identity_generated_merge_sec":$idSec%.3f}""")
    }
    if (sections("gov12")) {
      govBench(base, "sf0.1", 4); govBench(rep, "rep10", 16)
    }

    spark.stop()
  }
}
