package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for isolating per-operation thread-scaling on this host:
  * runs ONE operation (parquet decode / regex extract / extract+link) in a
  * `local[n]` session and prints warm-excluded timings. Launch it in a
  * `taskset`-pinned child JVM at two thread counts and compare — the op
  * whose per-thread time inflates is the one bound by the shared memory
  * subsystem. Usage:
  *   ScanProbe prep   <threads> <dir> <sfDir> [repl]   (write probe input)
  *   ScanProbe decode|regex|link <threads> <dir>
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val op = args(0); val threads = args(1).toInt; val dir = args(2)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", (4 * threads).toString)
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FuzzRatio.register(spark)
    def timed(f: => Long): Unit = {
      f // warm (codegen + JIT)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); val r = f
        println(f"[scanprobe] $op n=$threads run$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
      }
    }
    op match {
      case "prep" =>
        val repl = if (args.length > 4) args(4).toInt else 8
        val t = graft.synth.TranscriptGen.transcripts(spark, args(3))
        (0 until repl)
          .map(i => t.withColumn("conv_id", concat(lit(s"r$i/"), col("conv_id"))))
          .reduce(_ unionByName _)
          .repartition(64).write.mode("overwrite").parquet(dir)
      case "decode" =>
        timed(spark.read.parquet(dir).select(sum(length(col("text")))).head().getLong(0))
      case "cpuonly" =>
        // pure codegen ALU over range — no parquet, no strings, no shuffle
        timed(spark.range(0, 2000000000L, 1, 4 * threads)
          .select(bit_xor(xxhash64(col("id")))).head().getLong(0))
      case "regex" =>
        timed(graft.extract.Extract.speakerMentions(spark.read.parquet(dir)).count())
      case "link" =>
        timed(graft.link.Link.linkPersons(
          graft.extract.Extract.speakerMentions(spark.read.parquet(dir)),
          graft.synth.Dict.personsDf(spark)).count())
    }
    spark.stop()
  }
}
