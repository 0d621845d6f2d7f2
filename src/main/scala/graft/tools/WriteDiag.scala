package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the graph-write stage (BENCH_r02: graph_write_sec flat
  * 22-23 s from 8→32 cores): runs the bench's write path with the
  * sub-actions timed SEPARATELY and per-job wall-vs-task lines, so the
  * serial/underparallelized culprit is visible.
  *
  * Usage: runMain graft.tools.WriteDiag [repl] [level ...]
  *   SPARK_GRAFT_SF_DIR (default sf0.1), WRITE_DIAG_NB (bucket count)
  */
object WriteDiag {

  private def session(n: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$n]")
      .appName(s"write-diag-$n")
      .config("spark.sql.shuffle.partitions", (4 * n).toString)
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-diag/local")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.FuzzRatio.register(s)
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repl = args.headOption.map(_.toInt).getOrElse(12)
    val levels = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 32)
    val nb = sys.env.getOrElse("WRITE_DIAG_NB", "16").toInt
    val root = "/dev/shm/graft-diag"
    val inDir = s"$root/turns"

    locally {
      val s = session(16)
      try {
        val t = graft.synth.TranscriptGen.transcripts(s, sfDir)
        (0 until repl)
          .map(i => t.withColumn("conv_id", concat(lit(s"r$i/"), col("conv_id"))))
          .reduce(_ unionByName _)
          .repartition(64).write.mode("overwrite").parquet(inDir)
      } finally s.stop()
    }

    levels.foreach { n =>
      val spark = session(n)
      try {
        val jobGc = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
        val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        val jobTask = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
        val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
        val jobName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobStart.put(j.jobId, System.nanoTime())
            jobTask.put(j.jobId, new java.util.concurrent.atomic.AtomicLong)
            j.stageIds.foreach(s => stageJob.put(s, j.jobId))
            jobName.put(j.jobId,
              Option(j.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?"))
          }
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val jid = stageJob.get(t.stageId)
            val acc = jobTask.get(jid)
            if (acc != null && t.taskMetrics != null) {
              acc.addAndGet(t.taskMetrics.executorRunTime)
              jobGc.computeIfAbsent(jid, _ => new java.util.concurrent.atomic.AtomicLong)
                .addAndGet(t.taskMetrics.jvmGCTime)
            }
          }
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val w = (System.nanoTime() - jobStart.getOrDefault(j.jobId, 0L)) / 1e9
            val tt = Option(jobTask.get(j.jobId)).map(_.get).getOrElse(0L) / 1000.0
            val gc = Option(jobGc.get(j.jobId)).map(_.get).getOrElse(0L) / 1000.0
            println(f"JOB[$n%2d] ${j.jobId}%3d wall $w%7.3f task $tt%8.2f gc $gc%7.2f ideal ${tt / n}%7.3f ${jobName.get(j.jobId)}")
          }
        })
        def timed[T](tag: String)(f: => T): T = {
          val t0 = System.nanoTime(); val r = f
          println(f"PHASE[$n%2d] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
          r
        }
        // one full warmup (codegen), then the measured pass — the exact
        // bench write path (Materialize.writeGraphInitial)
        (1 to 2).foreach { pass =>
          val turns = spark.read.parquet(inDir)
          val wh = s"$root/wh-$n-$pass"
          val stages = timed(s"p$pass build")(
            graft.pipeline.Pipeline.build(spark, turns))
          timed(s"p$pass graph-write")(
            graft.materialize.Materialize.writeGraphInitial(spark, wh,
              stages.canonical, triplesDistinct = true, nBuckets = nb))
        }
      } finally spark.stop()
    }
    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
    } catch { case _: Throwable => () }
  }
}
