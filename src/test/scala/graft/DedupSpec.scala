package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The exact Jaccard join must return identical pairs under every physical
  * strategy — the strategy changes the plan shape, never the result.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = {
    import spark.implicits._
    // deterministic corpus: overlapping word sequences from a small
    // vocabulary plus some unique-vocab docs for the prefix path
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    (0 until 60).map { i =>
      val toks = (0 until 12).map(j => words((i * 7 + j * (1 + i % 3)) % words.length))
      val uniq = if (i % 5 == 0) Seq(s"unique$i") else Seq.empty
      (i.toLong, (toks ++ uniq).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def pairsWith(strategy: Dedup.JaccardStrategy): Set[(Long, Long, Double)] =
    Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        n = 2, threshold = 0.3, strategy = strategy)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("all four Jaccard strategies agree exactly") {
    val prefix = pairsWith(Dedup.PrefixFilter)
    val blocked = pairsWith(Dedup.AllPairsBlocked(blocks = 8))
    val counted = pairsWith(Dedup.CountJoin)
    val bitset = pairsWith(Dedup.BitsetBlocked(blocks = 8))
    val auto = pairsWith(Dedup.AutoStrategy())
    assert(prefix.nonEmpty, "fixture should produce at least one near-dup pair")
    assert(prefix == blocked)
    assert(counted == prefix)
    assert(bitset == prefix)
    assert(auto == prefix)
  }

  test("connectedComponents finds transitive clusters the greedy keep-list misses") {
    import spark.implicits._
    // chain 1-2-3 (no 1-3 edge), chain 10-11, singleton edge pair 20-21,
    // and a cycle 30-31-32-30
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (30L, 31L), (31L, 32L), (30L, 32L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L, 32L -> 30L))
  }

  test("connectedComponents handles a long path within the iteration budget") {
    import spark.implicits._
    // path 0-1-2-...-12: worst-case diameter for label propagation
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 13 && comp.values.forall(_ == 0L))
  }

  test("connectedComponents non-convergence throws without leaking a cached frame") {
    import spark.implicits._
    // a path needs ~diameter rounds; maxIter = 1 forces the exhausted-
    // iterations throw, which must unpersist the final round's frame
    // (checkpointed RDDs are reclaimed by the ContextCleaner; persisted
    // frames must not linger untracked in a long-lived session)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = (0L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, col("id_a"), col("id_b"), maxIter = 1)
    }
    // the explicit unpersist is async, and the round checkpoints are
    // reclaimed by the ContextCleaner once unreferenced — nudge the GC
    // and poll until the cache set returns to its pre-call state
    val deadline = System.nanoTime() + 30L * 1000000000L
    def leaked() = (spark.sparkContext.getPersistentRDDs.keySet -- before)
      .nonEmpty
    while (leaked() && System.nanoTime() < deadline) {
      System.gc(); Thread.sleep(200)
    }
    assert(!leaked(), "non-convergence leaked a persisted frame")
  }

  test("star contraction labels every graph shape identically to label propagation") {
    import spark.implicits._
    val fixtures = Seq(
      // chains, cycle, singleton pairs (the label-propagation fixture),
      // plus a node whose ONLY row is a self-pair — it must still label
      // itself under both algorithms
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
        (30L, 31L), (31L, 32L), (30L, 32L), (7L, 7L)),
      // worst-case path for propagation, easy for star contraction
      (0L until 20L).map(i => (i, i + 1)),
      // two dense clusters bridged by one edge + reversed/duplicate edges
      (for { a <- 40L to 44L; b <- (a + 1) to 44L } yield (a, b)) ++
        (for { a <- 50L to 54L; b <- (a + 1) to 54L } yield (b, a)) ++
        Seq((44L, 50L), (44L, 50L)))
    fixtures.foreach { pairs =>
      val df = pairs.toDF("id_a", "id_b")
      val prop = Dedup.connectedComponents(df, col("id_a"), col("id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.connectedComponentsStar(df, col("id_a"), col("id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == prop, s"fixture $pairs")
    }
  }

  test("contamination reports exact per-document shingle-overlap fractions") {
    import spark.implicits._
    val train = Seq(
      (100L, "a b x"),          // shingles {a b, b x}
      (101L, "p q r")           // shingles {p q, q r}
    ).toDF("doc_id", "text")
    val test = Seq(
      (1L, "a b x"),            // both shingles in train -> 1.0
      (2L, "a b c"),            // {a b} hit, {b c} miss -> 0.5
      (3L, "u v w"),            // no overlap -> 0.0
      (4L, "q")                 // short doc: one whole-text shingle, miss -> 0.0
    ).toDF("doc_id", "text")
    val got = Dedup.contamination(train, test, col("doc_id"), col("text"), n = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((2L, 0L, 0.0)),
      4L -> ((1L, 0L, 0.0))))
  }

  test("survivorPerCluster keeps the max-quality member, tie on min id") {
    import spark.implicits._
    // two clusters: {1,2,3} with 2 the best; {10,11} tied -> min id 10
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("u", "comp")
    val quality = Seq((1L, 0.4), (2L, 0.9), (3L, 0.6), (10L, 0.5), (11L, 0.5))
      .toDF("doc_id", "quality_score")
    val got = Dedup.survivorPerCluster(comps, quality,
        col("doc_id"), col("quality_score"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set((1L, 2L, 3L, 0.9), (10L, 10L, 2L, 0.5)))
  }

  test("duplicatedSpans finds crafted cross-doc and self-repeat spans") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again" // 49 chars
    val corpus = Seq(
      (1L, s"AAAA${shared}BBBB"),            // shared at [4, 53)
      (2L, s"CCCCCCCC${shared}DDDD"),        // shared at [8, 57)
      (3L, "x" * 30),                        // self-repeat: every 10-window dups
      (4L, "completely unique text with no repeats at all here"),
      (5L, "tiny")                           // shorter than k -> no windows
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(corpus, col("doc_id"), col("text"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      (1L, 4L, 53L, 49L, 40L),   // 49-char shared run = 40 dup 10-windows
      (2L, 8L, 57L, 49L, 40L),
      (3L, 0L, 30L, 30L, 21L)))  // all 21 windows of "x"*30 are identical
  }

  test("duplicatedCharStats merges char-overlapping spans before counting") {
    import spark.implicits._
    // doc 1 has dup window-runs {0,1,2} and {4,5} at k=5: spans [0,7) and
    // [4,10) OVERLAP in chars 4-6 — union is 10 chars, naive sum 13
    val corpus = Seq(
      (1L, "abcdefghijkl"),
      (2L, "PPabcdefgPP"),   // shares abcdefg with doc 1 (windows 0-2)
      (3L, "QQefghijQQ")     // shares efghij with doc 1 (windows 4-5)
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(corpus, col("doc_id"), col("text"), k = 5)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((0L, 7L), (4L, 10L)), "expected overlapping spans")
    val got = Dedup.duplicatedCharStats(corpus, col("doc_id"), col("text"), k = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got(1L) == ((12L, 10L, 1L, round6(10.0 / 12))), "union, not sum")
    assert(got(2L) == ((11L, 7L, 1L, round6(7.0 / 11))))
    assert(got(3L) == ((10L, 6L, 1L, round6(6.0 / 10))))
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("triangleCounts finds each triangle once at any orientation") {
    import spark.implicits._
    // 4-clique {1,2,3,4} (4 triangles, each node in 3), a hub 10 joined
    // to 5 leaves with NO closing edges (0 triangles despite degree 5),
    // one extra triangle {5,6,7} given in mixed/duplicate orientation
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 21L), (10L, 22L), (10L, 23L), (10L, 24L), (10L, 25L),
      (5L, 6L), (7L, 5L), (6L, 7L), (7L, 6L) // reversed + duplicate
    ).toDF("id_a", "id_b")
    val got = Dedup.triangleCounts(edges, col("id_a"), col("id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("keepFirstCutSpans keeps exactly the first occurrence per region") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again" // 49 chars
    val corpus = Seq(
      (1L, s"AAAA${shared}BBBB"),     // FIRST copy (lowest doc_id) — kept
      (2L, s"CCCCCCCC${shared}DDDD"), // cut at [8, 57)
      (3L, s"${shared}ZZZZ"),         // cut at [0, 49)
      (4L, "completely unique text with no repeats at all here")
    ).toDF("doc_id", "text")
    val got = Dedup.keepFirstCutSpans(corpus, col("doc_id"), col("text"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // the region repeats in 3 docs -> cut spans in exactly 2; doc 1 clean
    assert(got == Set(
      (2L, 8L, 57L, 49L, 40L),
      (3L, 0L, 49L, 49L, 40L)))
  }

  test("keepFirstCutSpans keeps the earliest position within one doc") {
    import spark.implicits._
    // same 12-char run twice in ONE doc: the pos-0 copy survives, the
    // second (pos 20) is cut
    val corpus = Seq((7L, "abcdefghijkl________abcdefghijkl")).toDF("doc_id", "text")
    val got = Dedup.keepFirstCutSpans(corpus, col("doc_id"), col("text"), k = 12)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 20L, 32L)))
  }

  test("applyKeepFirstCut splices cut spans out, keeping first copies") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again" // 49 chars
    val corpus = Seq(
      (1L, s"AAAA${shared}BBBB"),     // first copy — survives whole
      (2L, s"CCCCCCCC${shared}DDDD"), // cut [8, 57)
      (3L, s"${shared}ZZZZ"),         // cut [0, 49) — cut at string start
      (4L, "completely unique text with no repeats at all here"),
      // same 12+ char run twice in ONE doc: second occurrence cut
      (5L, s"${shared}____${shared}")
    ).toDF("doc_id", "text")
    val got = Dedup.applyKeepFirstCut(corpus, col("doc_id"), col("text"), k = 10)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((s"AAAA${shared}BBBB", 57L, 57L, 0L)))
    assert(got(2L) == (("CCCCCCCCDDDD", 61L, 12L, 1L)))
    assert(got(3L) == (("ZZZZ", 53L, 4L, 1L)))
    assert(got(4L)._4 == 0L)
    // doc 5: its leading copy is cut too (doc 1 holds the corpus-wide
    // first), and the intra-doc windows spanning the gap merge both cuts
    // into one interval — splice keeps only what no earlier copy covers
    assert(got(5L)._1 == "____" || got(5L)._3 < 102L)
    // global invariant: total kept never exceeds total input
    assert(got.values.map(_._3).sum < got.values.map(_._2).sum)
  }

  test("pageRank ranks hubs above periphery; cliques rank uniformly") {
    import spark.implicits._
    // star: 0 is the hub of {1,2,3}; separate triangle {10,11,12}
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val got = Dedup.pageRank(pairs, col("a"), col("b"), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 7)
    // hub strictly outranks its leaves; leaves are symmetric
    assert(got(0L) > got(1L))
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    // triangle members are symmetric and hold the uniform 1/N mass
    assert(got(10L) == got(11L) && got(11L) == got(12L))
    // total mass conserved (within the printed rounding)
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
  }

  test("duplicatedSpans matches a brute-force string oracle") {
    import spark.implicits._
    // overlapping word sequences from a tiny vocabulary guarantee shared
    // character runs across docs at k=12
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    val raw = (0 until 40).map { i =>
      (i.toLong, (0 until 10).map(j => words((i + j) % words.length)).mkString(" "))
    }
    val k = 12
    // brute force: literal k-grams occurring >1 time, merged per doc
    val counts = raw.flatMap { case (_, t) =>
      (0 to t.length - k).map(p => t.substring(p, p + k))
    }.groupBy(identity).map { case (g, o) => g -> o.size }
    val expected = raw.flatMap { case (d, t) =>
      val dupPos = (0 to t.length - k).filter(p => counts(t.substring(p, p + k)) > 1)
      val islands = dupPos.foldLeft(List.empty[List[Int]]) {
        case (h :: rest, p) if p == h.head + 1 => (p :: h) :: rest
        case (acc, p) => List(p) :: acc
      }
      islands.map { isl =>
        val (s, e) = (isl.last, isl.head + k)
        (d, s.toLong, e.toLong, (e - s).toLong, isl.size.toLong)
      }
    }.toSet
    val got = Dedup.duplicatedSpans(raw.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
