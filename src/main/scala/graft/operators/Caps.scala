package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Skew-proof per-group top-K cap — the "at most K documents per
  * domain/source" corpus-curation rule.
  *
  * A plain `row_number().over(Window.partitionBy(group))` funnels every
  * row of a group through ONE task, which dies at scale the moment the
  * group key has low cardinality (a handful of length buckets over a
  * 100 TB corpus = a handful of tasks doing all the work). The cap is a
  * top-K, and top-K composes: the global K smallest of a group are
  * necessarily among the K smallest of each input partition. So:
  *
  *  - phase 1 ([[partialCap]]) is a NARROW per-partition pass — each task
  *    keeps at most K rows per group with a bounded heap, the window
  *    analog of map-side combine. No shuffle, and no task ever holds more
  *    than K rows per (group it sees).
  *  - phase 2 ranks only the survivors: the global window sees at most
  *    K × inputPartitions rows per group — bounded regardless of how
  *    skewed or low-cardinality the group key is.
  */
object Caps {

  /** Per-partition partial top-K: keep at most `k` rows per group within
    * each input partition, smallest first under the lexicographic
    * ascending order of `orderCols`. Output is a superset of every
    * group's global top-K; row order within the output is unspecified.
    *
    * `orderCols` must be LONG columns (precompute/cast the sort key) and
    * must totally order rows within a group (append a unique id column) —
    * with ties at the cut boundary the evicted row is arbitrary, which
    * phase 2 cannot repair. Whole rows ride the heaps and group keys are
    * compared by value, so project the input down to the needed scalar
    * columns first (q88 keeps only id, group, and sort key).
    */
  private[graft] def partialCap(df: DataFrame, groupCols: Seq[String],
                                orderCols: Seq[String], k: Int): DataFrame = {
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val oIdx = orderCols.map(schema.fieldIndex).toArray
    oIdx.foreach(i => require(schema(i).dataType == LongType,
      s"perGroupCap: order column '${schema(i).name}' must be LONG " +
        "(precompute the sort key as a long column)"))
    // lexicographic compare of the order-key vector
    def cmp(a: Array[Long], b: Array[Long]): Int = {
      var i = 0
      while (i < a.length && a(i) == b(i)) i += 1
      if (i == a.length) 0 else java.lang.Long.compare(a(i), b(i))
    }
    // max-heap on the key: evicting the largest keeps the k smallest
    implicit val heapOrd: Ordering[(Array[Long], Row)] =
      (x, y) => cmp(x._1, y._1)
    df.mapPartitions { it =>
      val heaps =
        mutable.HashMap.empty[Seq[Any], mutable.PriorityQueue[(Array[Long], Row)]]
      it.foreach { row =>
        val g: Seq[Any] = gIdx.toIndexedSeq.map(row.get)
        val key = oIdx.map(row.getLong)
        val h = heaps.getOrElseUpdate(g, mutable.PriorityQueue.empty)
        if (h.size < k) h.enqueue((key, row))
        else if (cmp(key, h.head._1) < 0) { h.dequeue(); h.enqueue((key, row)); () }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }(Encoders.row(schema))
  }

  /** At most `k` rows per group, the first `k` under the ascending
    * lexicographic order of `orderCols` — exact (identical to the naive
    * single window), but skew-proof: see the object doc for the
    * two-phase shape. Column contracts as on [[partialCap]].
    */
  def perGroupCap(df: DataFrame, groupCols: Seq[String],
                  orderCols: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"perGroupCap: k must be positive, got $k")
    require(groupCols.nonEmpty && orderCols.nonEmpty,
      "perGroupCap: group and order columns are both required")
    require(!df.columns.contains("__cap_rn"),
      "perGroupCap: input must not contain reserved column '__cap_rn'")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).asc): _*)
    partialCap(df, groupCols, orderCols, k)
      .withColumn("__cap_rn", row_number().over(w))
      .filter(col("__cap_rn") <= k)
      .drop("__cap_rn")
  }
}
