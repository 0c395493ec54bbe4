package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def emb = {
    import spark.implicits._
    // deterministic pseudo-random vectors, mixed signs
    (0 until 40).map { i =>
      (i.toLong, Array.tabulate(16)(j => ((i * 31 + j * 7) % 19) - 9.0))
    }.toDF("vec_id", "embedding")
  }

  test("128-bit signatures extend the 64-bit signature limb-exactly") {
    // the plane grid w(p,j) is a pure function of k = p·d + j with the
    // same LCG constants in both kernels, so planes 0-63 of the 128-bit
    // signature must reproduce the 64-bit signature bit for bit
    val s64 = Similarity.srpSignatures(emb, col("vec_id"), col("embedding"), bits = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s128 = Similarity.srpSignatures128(emb, col("vec_id"), col("embedding"), bits = 128)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(s128.keySet == s64.keySet)
    s128.foreach { case (id, (lo, hi)) =>
      assert(lo == s64(id), s"limb 0 of vec $id diverges from the 64-bit kernel")
      assert(hi != 0L || lo != 0L) // planes produce SOME sign structure
    }
  }

  test("band rows slice the two-limb signature at the declared offsets") {
    val sigs = Similarity.srpSignatures128(emb, col("vec_id"), col("embedding"), bits = 128)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rows = Similarity.srpBandRows128(emb, col("vec_id"), col("embedding"),
        bits = 128, bands = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows.size == sigs.size * 8)
    rows.foreach { case ((id, band), key) =>
      val (lo, hi) = sigs(id)
      val expected =
        if (band < 4) (lo >>> (band * 16)) & 0xffffL
        else (hi >>> ((band - 4) * 16)) & 0xffffL
      assert(key == expected, s"band $band of vec $id")
    }
  }

  test("geometry validation fails loudly") {
    intercept[IllegalArgumentException] {
      Similarity.srpSignatures128(emb, col("vec_id"), col("embedding"), bits = 64)
    }
    intercept[IllegalArgumentException] {
      // 120/5 → 24-bit bands straddling the limb boundary (64 % 24 ≠ 0)
      Similarity.srpBandRows128(emb, col("vec_id"), col("embedding"),
        bits = 120, bands = 5)
    }
    intercept[IllegalArgumentException] {
      Similarity.srpCandidatePairs(emb, col("vec_id"), col("embedding"),
        bits = 64, bands = 1)
    }
  }

  test("int8 quantization: floor(+0.5) kernel, zero-vector guard, scale") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),   // all-zero: no division blowup
      (2L, Seq(-2.0f, 1.0f, 0.5f, -0.25f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(emb, col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getDouble(2)))).toMap
    // max|x|=1: q = floor(x*127 + 0.5)
    assert(got(0L) == ((Seq(127L, -63L, 32L, 0L), 1.0 / 127)))
    assert(got(1L) == ((Seq(0L, 0L, 0L, 0L), 0.0)))
    // max|x|=2: q = floor(x*63.5 + 0.5); -0.25 -> floor(-15.375) = -16
    assert(got(2L) == ((Seq(-127L, 64L, 32L, -16L), 2.0 / 127)))
  }

  test("groupOutliers surfaces the planted off-cluster member first") {
    import spark.implicits._
    // two labels; one planted outlier each pointing away from the cluster
    val emb = (0 until 10).map { i =>
      (i.toLong, Seq(1.0f, 0.01f * i, 0.0f), 0L)
    } ++ Seq((10L, Seq(-1.0f, 0.2f, 0.0f), 0L)) ++ (20 until 30).map { i =>
      (i.toLong, Seq(0.0f, 0.01f * i, 1.0f), 1L)
    } ++ Seq((30L, Seq(0.3f, -1.0f, 0.0f), 1L))
    val got = Similarity.groupOutliers(emb.toDF("vec_id", "embedding", "label"),
        col("vec_id"), col("embedding"), col("label"), k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val worstPerGroup = got.groupBy(_._1).map { case (g, rows) =>
      g -> rows.minBy(_._3)._2
    }
    assert(worstPerGroup == Map(0L -> 10L, 1L -> 30L))
    assert(got.length == 4) // k=2 per label
  }

  test("pq codes are in range and codeword vectors reconstruct exactly") {
    // 16 dims, 4 subspaces x 4 dims, 4 codewords, no Lloyd iterations:
    // codebooks ARE the seed sub-vectors, so every seed vector's PQ code
    // must be its own id and its ADC score against itself-as-query 1.0
    val books = Similarity.pqCodebooks(emb, col("vec_id"), col("embedding"),
      subspaces = 4, subDim = 4, seedCount = 4, iterations = 0)
    assert(books.count() == 16) // 4 subspaces x 4 codewords
    val codes = Similarity.pqEncode(emb, col("vec_id"), col("embedding"),
      books, subspaces = 4, subDim = 4)
    assert(codes.count() == 40 * 4)
    val range = codes.agg(min(col("code")), max(col("code"))).collect().head
    assert(range.getLong(0) >= 0L && range.getLong(1) <= 3L)
    // a seed vector quantizes to its own sub-vectors in every subspace
    val own = codes.filter(col("vid") < 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    own.foreach { case (vid, _, code) => assert(code == vid,
      s"seed $vid should be its own codeword, got $code") }
  }

  test("ivfPqTopK probing ALL cells equals the full-scan pqTopK") {
    val trained = Similarity.ivfTrain(emb, emb.filter(col("vec_id") < 4),
      col("vec_id"), col("embedding"), iterations = 1)
    val full = Similarity.pqTopK(emb, col("vec_id"), col("embedding"),
        subspaces = 4, subDim = 4, seedCount = 4, iterations = 1,
        nQueries = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val probedAll = Similarity.ivfPqTopK(emb, col("vec_id"), col("embedding"),
        trained, subspaces = 4, subDim = 4, seedCount = 4, iterations = 1,
        probes = 4, nQueries = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == probedAll,
      "probing every cell must reduce IVF-PQ to the full ADC scan")
  }

  test("incremental near-dup is batch-split invariant vs the one-shot") {
    import spark.implicits._
    val oneShot = Similarity.srpNearDupPairs(emb, col("vec_id"),
        col("embedding"), threshold = 0.3, bits = 32, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oneShot.nonEmpty)
    // arrival order A: evens then odds; arrival order B: three thirds —
    // every split must accumulate exactly the one-shot pair set
    def accumulate(batches: Seq[org.apache.spark.sql.DataFrame]): Set[(Long, Long)] = {
      var storedBands: Option[org.apache.spark.sql.DataFrame] = None
      var pairs = Set.empty[(Long, Long)]
      batches.foreach { b =>
        val bands = Similarity.srpBandRows(b, col("vec_id"),
          col("embedding"), bits = 32, bands = 4)
        val stored = storedBands.getOrElse(bands.limit(0))
        pairs = pairs ++ Similarity.srpIncrementalNearDupPairs(emb,
            col("vec_id"), col("embedding"), stored, b,
            threshold = 0.3, bits = 32, bands = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        storedBands = Some(stored.unionByName(bands))
      }
      pairs
    }
    val splitA = accumulate(Seq(
      emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1)))
    val splitB = accumulate((0 until 3).map(r =>
      emb.filter(col("vec_id") % 3 === r)))
    assert(splitA == oneShot)
    assert(splitB == oneShot)
  }

  test("quantized top-k flags exact-search agreement correctly") {
    import spark.implicits._
    // clusters around two directions; quantization preserves the ranking
    val emb = (0 until 20).map { i =>
      val base = if (i % 2 == 0) Seq(1.0f, 0.1f, 0.0f) else Seq(0.0f, 0.1f, 1.0f)
      (i.toLong, base.map(v => v + (i / 2) * 0.001f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.quantizedTopK(emb, col("vec_id"), col("embedding"),
        nQueries = 2, k = 3)
      .collect()
    assert(got.length == 6) // 2 queries x top-3
    // every quantized top-3 neighbor is on the query's side of the split,
    // and with this separation all agree with exact search
    got.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(2))
      assert(q % 2 == n % 2, s"query $q got cross-cluster neighbor $n")
      assert(r.getLong(4) == 1L, s"query $q neighbor $n not in exact top-3")
    }
  }
}
