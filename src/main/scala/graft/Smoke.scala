package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: build a session the way the driver
  * would, call SparkEntry.entry, check rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n schema=${df.schema.map(_.name).mkString(",")}")
    df.show(5, false)
    spark.stop()
  }
}
