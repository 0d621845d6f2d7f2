package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan + timing for one query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    println(s"count=${df.count()} in ${(System.nanoTime() - t0) / 1e9}s")
    val t1 = System.nanoTime()
    println(s"count2=${df.count()} in ${(System.nanoTime() - t1) / 1e9}s")
    spark.stop()
  }
}
