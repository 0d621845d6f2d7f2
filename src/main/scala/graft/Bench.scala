package graft

import org.apache.spark.sql.SparkSession
import graft.functions.FuzzRatio
import graft.synth.TranscriptGen

/** Benchmark main — north-star metric (BASELINE.json): end-to-end triples/sec
  * over extract → link → triples → canonicalize → materialize, plus
  * throughput at two parallelism levels standing in for N vs 4N executors
  * (no real cluster in this sandbox), with scaling efficiency
  * `(T_low / T_high) / (high/low)`.
  *
  * Protocol (round-2, per ADVICE r1):
  *  - SPARK_GRAFT_CPUS is honored, not clamped: the job runs at local[1],
  *    local[4] AND (when CPUS ≥ 8) local[CPUS/4], local[CPUS].
  *  - Each level runs in a CHILD JVM pinned to exactly that many cores via
  *    `taskset -c 0..n-1` (+ -XX:ActiveProcessorCount). Without pinning,
  *    "local[1]" on a 32-core box hands its GC, netty, and compression
  *    threads 31 idle cores — inflating low-level throughput and corrupting
  *    the scaling ratio. Pinning emulates what an N-core executor actually
  *    is: a machine with N cores, period.
  *  - Median-of-k (default 3) per level with min/max emitted, so the
  *    artifact of record carries the ±15-30% host variance instead of one
  *    sample. Each child warms codegen/JIT on a small same-plan-shape input
  *    before its measured runs.
  *  - `scaling_efficiency` (the headline) is the 1→4 pair — this box has 32
  *    cores but ONE memory bus; shuffle-bound dataflow stops scaling at
  *    ~4-6 threads, so the high pair measures the memory subsystem, not the
  *    dataflow (BASELINE.md has the microbenchmark). The CPUS/4→CPUS pair
  *    is still measured and reported (`scaling_efficiency_hi`) so the
  *    numbers argue for themselves.
  *
  * Prints ONE JSON line:
  * `{"metric":…,"value":<triples/sec at the highest level>,"unit":"triples/sec",
  *   "queries":{per-level medians/min/max + throughputs + efficiencies},"sf":…}`.
  */
object Bench {

  /** All bench I/O lives on tmpfs: /tmp is a virtual DISK here and its
    * latency variance (page-cache luck, writeback stalls) swamped the
    * scaling measurement — shuffle files, the input table, and the output
    * warehouse all go to /dev/shm (126 GiB on this box).
    */
  val ShmRoot = "/dev/shm/graft-bench"

  private[graft] def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"$ShmRoot/local")
      // node table fits comfortably in memory at bench scale: broadcast the
      // endpoint-integrity semi-joins instead of shuffling the edge set twice
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    FuzzRatio.register(s)
    s
  }

  /** Input prep (untimed): synthesize the transcript table, replicated
    * `repl`× under distinct conv_ids, and materialize it as ONE parquet
    * table (a repl-way union plan would multiply driver-side Catalyst time;
    * one table matches the north-rule shape: the job reads an input table).
    * Also writes a repl-1 warm-up table: whole-stage codegen is keyed on
    * generated source, so a small input with the identical plan shape warms
    * the janino cache of each child JVM in seconds. Identical input files
    * at every parallelism level.
    */
  private def prepareInput(sfDir: String, repl: Int): (String, String) = {
    import org.apache.spark.sql.functions._
    val dir = s"$ShmRoot/in-${System.nanoTime()}/turns"
    val warm = s"$ShmRoot/in-${System.nanoTime()}/warm"
    val s = session(32)
    try {
      val t = TranscriptGen.transcripts(s, sfDir)
      val all = (0 until repl)
        .map(i => t.withColumn("conv_id", concat(lit(s"r$i/"), col("conv_id"))))
        .reduce(_ unionByName _)
      all.repartition(64).write.parquet(dir)
      t.withColumn("conv_id", concat(lit("w/"), col("conv_id")))
        .repartition(8).write.parquet(warm)
    } finally s.stop()
    (dir, warm)
  }

  /** JDK-17 module opens Spark needs when launched without spark-submit
    * (same list as build.sbt — the child JVMs are raw `java` launches).
    */
  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def classpath: String = {
    val classes = Bench.getClass.getProtectionDomain
      .getCodeSource.getLocation.getPath
    s"$classes:/opt/spark/jars/*"
  }

  private final case class LevelResult(
      cpus: Int, triples: Long, medianSec: Double, minSec: Double,
      maxSec: Double, medianStages: Map[String, Double])

  /** Run one level in a core-pinned child JVM; parse its RUN lines. */
  private def measureLevel(cpus: Int, inputDir: String, warmDir: String,
      runs: Int): LevelResult = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val mem = sys.env.getOrElse("SPARK_GRAFT_CHILD_MEM", "24g")
    val cmd = Seq("taskset", "-c", s"0-${math.max(cpus - 1, 0)}", javaBin) ++
      jdk17AddOpens ++ Seq(
        s"-XX:ActiveProcessorCount=$cpus",
        s"-Xmx$mem",
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", classpath,
        "graft.BenchChild", cpus.toString, inputDir, warmDir, runs.toString)
    val pb = new ProcessBuilder(cmd: _*)
    // stderr → file, NOT a pipe: the child's Spark logging would fill a
    // 64 KiB pipe buffer and deadlock against our blocking stdout read
    val errFile = java.io.File.createTempFile(s"bench-child-$cpus-", ".log")
    pb.redirectError(errFile)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val rc = proc.waitFor()
    lazy val errTail = {
      val t = java.nio.file.Files.readString(errFile.toPath)
      t.substring(math.max(0, t.length - 4000))
    }
    require(rc == 0, s"bench child local[$cpus] failed rc=$rc\n$errTail")
    errFile.delete()
    val runLines = out.linesIterator.filter(_.startsWith("RUN ")).toSeq
    require(runLines.size == runs, s"expected $runs RUN lines, got:\n$out")
    val parsed = runLines.map { l =>
      val f = l.trim.split("\\s+") // RUN n total build pipe mat
      (f(1).toLong, Map(
        "total_sec" -> f(2).toDouble, "extract_link_cc_sec" -> f(3).toDouble,
        "triples_canon_sec" -> f(4).toDouble, "materialize_sec" -> f(5).toDouble))
    }
    val ns = parsed.map(_._1).distinct
    require(ns.size == 1, s"non-deterministic result at local[$cpus]: $ns")
    val sorted = parsed.sortBy(_._2("total_sec"))
    val med = sorted(sorted.size / 2)
    LevelResult(cpus, ns.head, med._2("total_sec"),
      sorted.head._2("total_sec"), sorted.last._2("total_sec"), med._2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repl = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPL", "32").toInt
    val runsPerLevel = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val levels = (Seq(1, 4) ++ (if (cpus >= 8) Seq(cpus / 4, cpus) else Nil)).distinct

    val (inputDir, warmDir) = prepareInput(sfDir, repl)

    val results = levels.map(l => measureLevel(l, inputDir, warmDir, runsPerLevel))
    require(results.map(_.triples).distinct.size == 1,
      s"parallelism changed the result: ${results.map(r => r.cpus -> r.triples)}")
    val n = results.head.triples
    val byLevel = results.map(r => r.cpus -> r).toMap

    def eff(lo: Int, hi: Int): Double =
      (byLevel(lo).medianSec / byLevel(hi).medianSec) / (hi.toDouble / lo)
    val effLow = eff(1, 4)
    val effHigh = if (cpus >= 8) Some(eff(cpus / 4, cpus)) else None

    // tmpfs hygiene: drop bench artifacts so rounds don't accumulate in RAM
    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(ShmRoot)).deleteRecursively()
    } catch { case _: Throwable => () }

    val topLevel = levels.max
    val tpsTop = n / byLevel(topLevel).medianSec
    val perLevel = results.flatMap { r =>
      Map(
        s"total_sec@${r.cpus}" -> r.medianSec,
        s"total_sec_min@${r.cpus}" -> r.minSec,
        s"total_sec_max@${r.cpus}" -> r.maxSec,
        s"triples_per_sec@${r.cpus}" -> n / r.medianSec) ++
        r.medianStages.collect {
          case (k, v) if k != "total_sec" => s"$k@${r.cpus}" -> v
        }
    }.toMap
    val qs = (perLevel ++ Map(
      "scaling_efficiency" -> effLow,
      "canonical_triples" -> n.toDouble,
      "runs_per_level" -> runsPerLevel.toDouble) ++
      effHigh.map(e => "scaling_efficiency_hi" -> e).toMap)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val pairDesc =
      if (cpus >= 8) s"core-pinned local[1] vs local[4] (headline) and local[${cpus / 4}] vs local[$cpus] (scaling_efficiency_hi; one shared memory bus)"
      else "core-pinned local[1] vs local[4]"
    println(
      s"""{"metric":"end-to-end triples/sec (extract->link->canonicalize->materialize), median-of-$runsPerLevel per level, scaling $pairDesc","value":${f"$tpsTop%.2f"},"unit":"triples/sec","queries":$qs,"sf":"$sfDir"}""")
  }
}

/** Child JVM entry: one warm-up run on the small same-shape input, then
  * `runs` measured full-pipeline runs, each in a fresh SparkSession with a
  * GC-settled heap. Prints `RUN <triples> <total> <build> <pipe> <mat>`
  * per measured run. The child is core-pinned by the parent (taskset).
  */
object BenchChild {

  private def run(spark: SparkSession, inputDir: String): (Long, Double, Double, Double, Double) = {
    val wh = s"${Bench.ShmRoot}/wh-${System.nanoTime()}/w"
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val tStart = System.nanoTime()
    val (stages, tBuild) =
      timed(graft.pipeline.Pipeline.build(spark, spark.read.parquet(inputDir)))
    val canonical = stages.canonical.persist()
    val (n, tPipe) = timed(canonical.count())
    val (_, tMat) = timed(graft.materialize.Materialize.writeGraph(spark, wh, canonical))
    val total = (System.nanoTime() - tStart) / 1e9
    canonical.unpersist()
    (n, total, tBuild, tPipe, tMat)
  }

  def main(args: Array[String]): Unit = {
    val Array(cpusS, inputDir, warmDir, runsS) = args
    val cpus = cpusS.toInt
    val runs = runsS.toInt
    locally { val w = Bench.session(cpus); try run(w, warmDir) finally w.stop() }
    (1 to runs).foreach { _ =>
      System.gc(); Thread.sleep(1500); System.gc()
      val s = Bench.session(cpus)
      try {
        val (n, total, b, p, m) = run(s, inputDir)
        println(f"RUN $n $total%.4f $b%.4f $p%.4f $m%.4f")
      } finally s.stop()
    }
  }
}
