package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * A sort-merge/shuffle-hash join on a skewed key sends every row of a hot
  * key to ONE reducer — at 100 TB a single hot key (a dominant event type,
  * a mega-customer) turns the join into a one-task straggler. AQE's skew
  * handling splits oversized partitions when statistics reveal them at
  * runtime; the salted join below is the PLAN-level fix for keys known to
  * be pathological: it is deterministic, works on any Spark version, and
  * composes with AQE.
  *
  * Shape: the big side appends `salt = hash(saltBy) % n`; the small side
  * is replicated n× with every salt value (explode of a literal range —
  * n·|small| rows, still dimension-sized); the join keys become
  * `keys :+ salt`, so one hot key's rows spread across n reducers.
  * Result-identical to the unsalted join: every big row finds exactly the
  * replica of its match carrying its own salt.
  */
object Skew {

  /** Inner equi-join on `keys`, salted `n` ways. `saltBy` must be a
    * deterministic big-side expression (an id column, NOT rand() — task
    * retries must re-derive the same salt or shuffle replay duplicates
    * rows).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBy: Column, n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    // the salt column must not collide with user data: withColumn would
    // silently REPLACE an existing column of the same name (corrupting the
    // join) and the final drop would remove the user's column
    val salt = Iterator.from(0).map(i => if (i == 0) "__salt" else s"__salt$i")
      .find(c => !big.columns.contains(c) && !small.columns.contains(c)).get
    val b = big.withColumn(salt, pmod(hash(saltBy), lit(n)))
    val sm = small.withColumn(salt,
      explode(sequence(lit(0), lit(n - 1))))
    b.join(sm, keys :+ salt).drop(salt)
  }
}
