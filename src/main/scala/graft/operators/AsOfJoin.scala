package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (a.k.a. last-touch / point-in-time) join: for every left row,
  * the single most recent right row with the same key and
  * `right.ts <= left.ts` — the temporal-lookup operator the DataFrame API
  * has no primitive for (pandas `merge_asof`, kdb `aj`, DuckDB
  * `ASOF JOIN`), and the shape behind T7-style "state category as of a
  * date" lookups generalized to arbitrary payloads.
  *
  * The naive formulation — an inequality join plus a per-left argmax — is
  * the scale trap: Spark plans `left.join(right, key && r.ts <= l.ts)` as
  * a broadcast/BNL join whose output explodes to Σ_key |L_k|·|R_k| rows
  * BEFORE the argmax prunes them (a 100 TB key history × a year of left
  * probes = quadratic blowup per key).
  *
  * This implementation is the union-scan formulation, one shuffle and
  * zero row amplification:
  *  1. tag both inputs and union them on (key, ts, side, right-payload);
  *  2. one window per key ordered by (ts, side, right-tiebreak) computes
  *     `last(payload, ignoreNulls)` over the preceding rows — each left
  *     row reads the latest right payload at or before it;
  *  3. filter back to left rows.
  * Cost: one shuffle on the (high-cardinality) key, a per-key sort, and
  * output exactly |L| rows. Rows at equal (key, ts) resolve
  * deterministically: right rows sort BEFORE left rows (`<=` semantics —
  * a right row at exactly left.ts is visible), and among equal-ts right
  * rows the greatest `rightTieBreak` wins, making the result total — an
  * oracle can reproduce it exactly.
  *
  * `leftTs`/`rightTs` may be any mutually comparable orderable type
  * (timestamp, long). Left rows with no prior right row get nulls.
  *
  * @param left        probe side; all its columns pass through
  * @param right       history side, pre-projected to key + ts + payload
  * @param leftKey     join key column on `left`
  * @param rightKey    join key column on `right`
  * @param leftTs      event-time column on `left`
  * @param rightTs     event-time column on `right`
  * @param rightTieBreak unique-per-(key, ts) column on `right` (an id);
  *                    the max wins among equal timestamps
  * @param payload     right columns to carry (must not collide with left
  *                    column names; rightTs/rightTieBreak may be listed)
  */
object AsOfJoin {
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftTs: Column, rightTs: Column,
           rightTieBreak: Column, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "asOf: payload must name at least one right column")
    require(payload.intersect(leftCols).isEmpty,
      s"asOf: payload columns ${payload.intersect(leftCols).mkString(", ")} " +
        "collide with left column names")
    val reserved = Seq("__k", "__t", "__side", "__tie")
    require(reserved.intersect(leftCols ++ payload).isEmpty,
      "asOf: __k/__t/__side/__tie are reserved working names")
    val taggedRight = right.select(
      Seq(rightKey.as("__k"), rightTs.as("__t"), lit(0).as("__side"),
        rightTieBreak.as("__tie")) ++ payload.map(col): _*)
    val taggedLeft = left.select(
      Seq(leftKey.as("__k"), leftTs.as("__t"), lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__tie").dataType).as("__tie")) ++
        leftCols.map(col) ++
        payload.map(c => lit(null).cast(taggedRight.schema(c).dataType).as(c)): _*)
    // right rows sort before left at equal ts (inclusive <=); among equal
    // right timestamps the greatest tie-break is the last non-null seen
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(
        taggedLeft.unionByName(taggedRight, allowMissingColumns = true)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
