package graft.functions

/** Deterministic, engine-portable string hashing for dictionary-free
  * sketch encodings.
  *
  * A polynomial codepoint fold `acc = (acc·31 + codepoint) mod M` is the one
  * hash both Spark and DuckDB can compute bit-identically (DuckDB:
  * `list_reduce(list_prepend(0, list_transform(string_split(s,''),
  * c -> unicode(c))), (a,x) -> (a*31+x) % M)`), which lets the correctness
  * oracle reproduce MinHash/SimHash signatures without sharing a dictionary.
  *
  * This replaces the round-1 rank dictionary (`row_number() OVER (ORDER BY
  * shingle)`), which sorted the entire vocabulary in a single partition — a
  * scale-killer the moment the vocabulary stops fitting one task. Hashing is
  * embarrassingly parallel: no distinct, no join, no global window.
  *
  * Collisions merge two shingles into one id. For [[Mod31]] (needed where a
  * downstream multiply must not overflow a signed 64-bit int, e.g. MinHash's
  * `a·sid + b`), the birthday bound at a 1M-shingle vocabulary is ~200
  * collisions — harmless for sketches, and *shared* with the oracle, which
  * hashes the same way. Where nothing multiplies the id ([[Mod57]], used for
  * exact Jaccard set encoding), the space is 2^57 and collisions are
  * negligible at any realistic vocabulary.
  */
object TextHash {

  /** 2^31 − 1 (prime). Safe for `sid * a + b` with a,b < 2^31. */
  val Mod31: Long = 2147483647L

  /** 2^57 − 13 (odd, coprime to 31). The largest headroom that keeps the
    * fold's `acc*31 + codepoint` inside a signed 64-bit int.
    */
  val Mod57: Long = 144115188075855859L

  /** Polynomial codepoint hash, iterating Unicode code points (matching
    * DuckDB's `unicode()` over `string_split(s, '')`).
    *
    * Cross-engine bit-identity assumes every grapheme cluster is a single
    * code point (true for ASCII and most Latin text, and for the synthetic
    * corpora here): DuckDB's `string_split(s, '')` yields grapheme
    * clusters and `unicode()` returns only the FIRST code point of one,
    * while this fold consumes every code point — combining marks or emoji
    * ZWJ sequences would diverge. For non-ASCII corpora, normalize (e.g.
    * NFC + strip marks) identically on both sides before hashing.
    */
  def poly(s: String, mod: Long): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** The DuckDB SQL expression computing [[poly]] over a string column —
    * interpolated into oracle CTEs so both engines share one definition.
    */
  def duckdbPoly(colExpr: String, mod: Long): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($colExpr, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(a, x) -> (a*31 + x) % $mod)"
}
