package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Diagnostic: count jobs/stages/tasks and aggregate task time for one full
  * pipeline run — separates distributable work from driver-serial overhead
  * (wall − taskTime/cores). Usage:
  *   runMain graft.tools.BenchDiag <cpus> <sfDir> [repl]
  */
object BenchDiag {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val repl = if (args.length > 2) args(2).toInt else 1
    val parts = sys.env.getOrElse("DIAG_PARTS", cpus.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("DIAG_SPLIT", "134217728"))
      .config("spark.local.dir", sys.env.getOrElse("DIAG_LOCALDIR", "/tmp"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("DIAG_BCAST", "10485760"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.FuzzRatio.register(spark)

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val deserMs = new AtomicLong; val gcMs = new AtomicLong
    val byStage = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        stageNames.put(s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '\n').take(60))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          deserMs.addAndGet(t.taskMetrics.executorDeserializeTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
          byStage.computeIfAbsent(t.stageId.toString, _ => new AtomicLong)
            .addAndGet(t.taskMetrics.executorRunTime)
        }
      }
    })

    import org.apache.spark.sql.functions._
    // materialize the replicated input as ONE parquet table — the real
    // bench's input shape (a union plan would inflate task binaries)
    val t0s = graft.synth.TranscriptGen.transcripts(spark, sfDir)
    val inDir = java.nio.file.Files.createTempDirectory("diag-in").toString + "/turns"
    (0 until repl)
      .map(i => t0s.withColumn("conv_id", concat(lit(s"r$i/"), col("conv_id"))))
      .reduce(_ unionByName _)
      .repartition(64).write.parquet(inDir)
    val turns = spark.read.parquet(inDir)

    val scope = if (args.length > 3) args(3) else "full"
    def body(): Long = scope match {
      case "scan" =>
        turns.where(length(col("text")) > 20).count()
      case "regex" =>
        turns.where(regexp_extract(col("text"), "het woord aan (.+)$", 1) =!= "").count()
      case "shuffle" =>
        turns.groupBy("conv_id").count().count()
      case "link" =>
        graft.link.Link.linkPersons(
          graft.extract.Extract.speakerMentions(turns),
          graft.synth.Dict.personsDf(spark)).count()
      case "triples" =>
        graft.pipeline.Pipeline.build(spark, turns).canonical.count()
      case _ =>
        val wh = java.nio.file.Files.createTempDirectory("diag-wh").toString
        val canonical = graft.pipeline.Pipeline.build(spark, turns)
          .canonical.localCheckpoint(false)
        val n = canonical.count()
        graft.materialize.Materialize.writeGraph(spark, s"$wh/w", canonical)
        n
    }

    // warmup (codegen) once
    body()
    Thread.sleep(500)
    jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); deserMs.set(0); gcMs.set(0)
    byStage.clear()

    val t0 = System.nanoTime()
    val n = body()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"DIAG cpus=$cpus n=$n wall=$wall%.2fs jobs=${jobs.get} stages=${stages.get} " +
      f"tasks=${tasks.get} taskTime=${taskMs.get / 1000.0}%.2fs " +
      f"deser=${deserMs.get / 1000.0}%.2fs gc=${gcMs.get / 1000.0}%.2fs " +
      f"idealWall=${taskMs.get / 1000.0 / cpus}%.2fs overhead=${wall - taskMs.get / 1000.0 / cpus}%.2fs")
    import scala.jdk.CollectionConverters._
    byStage.asScala.toSeq.sortBy(-_._2.get).take(12).foreach { case (sid, ms) =>
      println(f"STAGE $sid%4s ${ms.get / 1000.0}%7.2fs ${stageNames.getOrDefault(sid.toInt, "?")}")
    }
    spark.stop()
  }
}
