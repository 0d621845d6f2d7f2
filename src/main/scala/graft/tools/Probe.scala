package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.FuzzRatio
import graft.pipeline.Pipeline
import graft.synth.TranscriptGen

/** Perf probe: one pipeline run at explicit (threads, shufflePartitions,
  * replication), printing per-stage seconds. For isolating local-mode
  * scaling anomalies: `runMain graft.tools.Probe <threads> <shuffle> <repl>`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(cpus, shuf, repl) = args.map(_.toInt)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    FuzzRatio.register(spark)
    import org.apache.spark.sql.functions._
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val base = TranscriptGen.transcripts(spark, sfDir)
    val turns = if (repl <= 1) base else (0 until repl)
      .map(i => base.withColumn("conv_id", concat(lit(s"r$i/"), col("conv_id"))))
      .reduce(_ unionByName _)
    // decompose build: cache fill vs CC rounds
    val linked = graft.link.Link.linkPersons(
      graft.extract.Extract.speakerMentions(turns),
      graft.synth.Dict.personsDf(spark)).cache()
    t("link_cache_fill")(linked.count())
    val edges = graft.canonicalize.Canonicalize.matchEdges(linked)
    t("cc_run")(graft.canonicalize.ConnectedComponents.run(edges).count())
    val stages = t("build+cc")(Pipeline.build(spark, turns))
    t("link_count")(stages.linkedPersons.count())
    val triples = stages.triples.persist()
    t("triples")(triples.count())
    val canonical = stages.canonical.persist()
    t("canon_rewrite")(canonical.count())
    val wh = java.nio.file.Files.createTempDirectory("probe-wh").toString + "/w"
    t("materialize")(graft.materialize.Materialize.writeGraph(spark, wh, canonical))
    spark.stop()
  }
}
