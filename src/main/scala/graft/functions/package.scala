package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared column helpers used across operators.
  *
  * The exact-sum helpers exist because the DuckDB correctness oracle
  * hash-compares values: a plain `SUM(double)` is summation-order-dependent
  * and diverges between engines at the last few bits. Casting each addend to
  * a decimal makes the sum exact (associative), after which the cast back to
  * double is deterministic on both engines.
  */
package object functions {

  /** Order-independent sum of a double column: exact decimal accumulation,
    * then a deterministic cast back to double. Decimal(38-scale) headroom is
    * enough for ~1e20 rows of 2-dp money values — safe at 100 TB.
    */
  def exactSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  /** Order-independent mean built from [[exactSum]] / count. */
  def exactAvg(c: Column, scale: Int = 4): Column =
    exactSum(c, scale) / count(c)

  /** Slugify — reference `revision_processor.ts:508-510`,
    * `extract_utils.ts:39-45`: lowercase, non-alphanumerics collapsed to
    * single dashes, trimmed.
    */
  def slugify(c: Column): Column =
    regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", "-"), "^-|-$", "")

  /** Whitespace tokenizer shared by the text-analysis operators. */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** Dot product of two equal-length numeric array columns, accumulated in
    * doubles in element order (matches a sequential fold on the oracle side).
    */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a numeric array column (double accumulation, element order). */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast(DoubleType) * v.cast(DoubleType)))

  /** Cosine similarity between two embedding columns. */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))
}
