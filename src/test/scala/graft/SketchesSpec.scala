package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** The cardinality sketches must agree bit-for-bit with plain-Scala
  * reference implementations of the same definitions — the operators are
  * distributed rewrites (combinable aggs, two-phase caps), never different
  * math.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference md5-60 hash: first 15 hex digits of md5 as a long. */
  private def refHash(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def corpus = {
    import spark.implicits._
    (0 until 300).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      // group "a": only 7 distinct values (below k); "b": 200 distinct
      val v = if (g == "a") s"val${i % 7}" else s"uniq$i"
      (g, v)
    }.toDF("g", "v")
  }

  test("md5Hash60 matches the Java reference digest") {
    import spark.implicits._
    val vals = Seq("hello", "", "Zürich", "a b c", "123")
    val got = vals.toDF("v").select(col("v"), Sketches.md5Hash60(col("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vals.foreach(v => assert(got(v) == refHash(v), s"value '$v'"))
  }

  test("kmvDistinct: exact below k, reference estimator at or above k") {
    val k = 16
    val got = Sketches.kmvDistinct(corpus, col("g"), col("v"), k)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // group a: 7 distinct < k -> exact count, kth = max of all 7 hashes
    val aHashes = (0 until 7).map(i => refHash(s"val$i"))
    assert(got("a") == ((7L, aHashes.max, 7L)))
    // group b: kth = 16th smallest of the 200 distinct hashes
    val bHashes = (0 until 300).filter(_ % 3 != 0).map(i => refHash(s"uniq$i"))
      .distinct.sorted
    val kth = bHashes(k - 1)
    val est = math.floor((k - 1).toDouble * Sketches.KmvHashSpace /
      kth.toDouble).toLong
    assert(got("b") == ((k.toLong, kth, est)))
    // the estimator lands near the truth (200) at k=16
    assert(est > 100 && est < 400)
  }

  test("sketch states merge: union of halves equals the whole") {
    import spark.implicits._
    val (h1, h2) = {
      val all = corpus
      (all.filter(pmod(xxhash64(col("v")), lit(2)) === 0),
        all.filter(pmod(xxhash64(col("v")), lit(2)) === 1))
    }
    // KMV: re-capping the union of per-half top-k frames = whole-corpus top-k
    val k = 16
    def kmvState(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Caps.perGroupCap(
        df.select(col("g").as("grp"),
          Sketches.md5Hash60(col("v")).as("hv")).distinct(),
        Seq("grp"), Seq("hv"), k)
    val merged = graft.operators.Caps.perGroupCap(
      kmvState(h1).unionByName(kmvState(h2)).distinct(), Seq("grp"), Seq("hv"), k)
    val whole = kmvState(corpus)
    assert(merged.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      whole.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    // HLL: bucket-wise max of the halves' registers = whole-corpus registers
    val bits = 4
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, col("g"), col("v"), bits)
    val mergedRegs = regs(h1).unionByName(regs(h2))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("register")).as("register"))
    val wholeRegs = regs(corpus)
    assert(mergedRegs.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      wholeRegs.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("countMin matrix matches a reference sketch; estimates never undershoot") {
    import spark.implicits._
    val (depth, width) = (4, 16) // tiny width to force collisions
    val occurrences = (0 until 400).map(i => (i % 23).toLong).toDF("sid")
    val mat = Sketches.countMin(occurrences, col("sid"), depth, width)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference matrix
    def pos(sid: Long, r: Int) =
      ((sid * Sketches.RowHashA(r) + Sketches.RowHashB(r)) %
        Sketches.MinhashPrime) % width
    val ref = scala.collection.mutable.Map.empty[(Long, Long), Long]
    (0 until 400).foreach { i =>
      val sid = (i % 23).toLong
      (0 until depth).foreach { r =>
        val k = (r.toLong, pos(sid, r))
        ref(k) = ref.getOrElse(k, 0L) + 1
      }
    }
    assert(mat == ref.toMap)
    // point estimates: min over rows >= exact, with real collisions present
    val exact = (0 until 23).map(s => s.toLong -> (400 / 23 + (if (s < 400 % 23) 1 else 0)).toLong).toMap
    val est = (0 until 23).map { s =>
      s.toLong -> (0 until depth).map(r => ref((r.toLong, pos(s, r)))).min
    }.toMap
    (0 until 23).foreach(s => assert(est(s.toLong) >= exact(s.toLong)))
    assert(est.exists { case (s, e) => e > exact(s) }, "width 16 must collide")
  }

  test("bloomBits: no false negatives, and misses are genuine or FP-bounded") {
    import spark.implicits._
    val width = 64 // small bitmap so false positives occur
    val train = (0 until 40).map(i => i.toLong * 7919).toDF("sid")
    val bits = Sketches.bloomBits(train, col("sid"), hashes = 3, width = width)
      .collect().map(_.getLong(0)).toSet
    assert(bits.size <= width.toLong)
    def pos(sid: Long, r: Int) =
      ((sid * Sketches.RowHashA(r) + Sketches.RowHashB(r)) %
        Sketches.MinhashPrime) % width
    // every trained item's positions are all set (no false negatives)
    (0 until 40).foreach { i =>
      val sid = i.toLong * 7919
      (0 until 3).foreach(r => assert(bits.contains(pos(sid, r))))
    }
    // the bit set is exactly the union of the trained positions
    val expected = (for (i <- 0 until 40; r <- 0 until 3)
      yield pos(i.toLong * 7919, r)).toSet
    assert(bits == expected)
  }

  test("hllRegisters and hllEstimate match a reference HLL") {
    val bits = 4 // m = 16 buckets so empty buckets occur
    val m = 1 << bits
    val width = 60 - bits
    val regs = Sketches.hllRegisters(corpus, col("g"), col("v"), bits)
    val got = regs.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference registers
    val ref = scala.collection.mutable.Map.empty[(String, Long), Long]
    corpus.collect().foreach { r =>
      val (g, v) = (r.getString(0), r.getString(1))
      val hv = refHash(v)
      val bucket = hv % m
      val rest = hv >>> bits
      val rho =
        if (rest == 0) (width + 1).toLong
        else (width + 1).toLong - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      val key = (g, bucket)
      ref(key) = math.max(ref.getOrElse(key, 0L), rho)
    }
    assert(got == ref.toMap)
    // estimate: integer harmonic sum with empty buckets at register 0
    val est = Sketches.hllEstimate(regs, bits).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    for (g <- Seq("a", "b")) {
      val present = ref.collect { case ((gg, _), reg) if gg == g => reg }.toSeq
      val zeros = m - present.size
      val sum = present.map(reg => 1L << (width + 1 - reg)).sum +
        zeros.toLong * (1L << (width + 1))
      val raw = math.floor(Sketches.hllNumerator(bits) / sum.toDouble).toLong
      assert(est(g) == ((zeros.toLong, sum, raw)), s"group $g")
    }
  }
}
