package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of persisted DataFrames.
  *
  * Operators that persist intermediate frames (postings, sketch signatures,
  * trained centroids) register them here instead of leaking a
  * caller-invisible `.persist()`: the handle stays cached for the life of
  * the query plans that reference it, and a long-lived server can reclaim
  * executor storage per session with [[clear]]. Keys are the stable
  * `SparkSession.sessionUUID`, not identity hash codes.
  */
object CacheRegistry {
  private val handles =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.List[DataFrame]]()

  /** Stable per-session key: `sessionUUID` on the classic (JVM) session;
    * identity as a last resort for other implementations.
    */
  def sessionKey(s: SparkSession): String =
    org.apache.spark.sql.GraftColumnShim.sessionUUID(s)

  /** Persist `df` (MEMORY_AND_DISK) and track it for [[clear]]. */
  def persist(df: DataFrame): DataFrame = {
    df.persist()
    register(df)
  }

  /** Track an ALREADY-persisted frame for [[clear]] (for operators that
    * manage persistence inside an iterative loop and hand back the final
    * persisted result).
    */
  def register(df: DataFrame): DataFrame = {
    handles
      .computeIfAbsent(sessionKey(df.sparkSession),
        _ => java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]()))
      .add(df)
    df
  }

  /** Unpersist every frame registered under `session` and drop the entries. */
  def clear(session: SparkSession): Unit = {
    val l = handles.remove(sessionKey(session))
    if (l != null) l.forEach { df => df.unpersist(blocking = false); () }
  }
}
