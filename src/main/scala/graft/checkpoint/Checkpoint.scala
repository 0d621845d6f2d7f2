package graft.checkpoint

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition checkpoint/lineage protocol — the relational re-expression
  * of the reference's JSON checkpoint system (processed-ID sets + per-loader
  * progress counters, src/core/checkpoint/checkpoint_manager.py:305-365,
  * checkpoint_decorator.py:149-197).
  *
  * Unit of resumability: a *conversation bucket* (hash of conv_id into
  * `nBuckets`), not an item — set semantics become relational:
  *  - "already processed" = LEFT ANTI join against the lineage table
  *    (the reference's PROCESSED_IDS set / skip-count, S8/U3);
  *  - "mark processed" = append one lineage row per completed bucket with
  *    counters (the reference's processed_count/failure_count);
  *  - idempotence of re-delivery is guaranteed downstream by the
  *    materializer's keyed upserts, so a bucket that crashes mid-write can
  *    simply be re-run (exactly-once effect from at-least-once execution).
  *
  * Lineage schema: (run_id, stage, bucket, n_rows, status, err_class,
  * config_hash, ts) — `status` is 'done' or 'failed' (the reference's
  * failure_count / failed_items[], checkpoint_manager.py:341-353), and
  * `config_hash` snapshots the run configuration so `--resume` under
  * incompatible settings is REFUSED instead of silently mixing outputs
  * (checkpoint_manager.py:179-210, main.py:74-87).
  */
object Checkpoint {

  val DefaultBuckets = 64

  /** Stable hash of the run-configuration facts that make checkpoints
    * compatible (dictionary version, bucket counts, …) — order-insensitive
    * canonical form so call sites can list parts in any order.
    */
  def configHash(parts: (String, String)*): String = {
    val canonical = parts.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(";")
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  def bucketOf(convCol: org.apache.spark.sql.Column, nBuckets: Int = DefaultBuckets) =
    pmod(xxhash64(convCol), lit(nBuckets)).cast("int")

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** All lineage reads come through here: `mergeSchema` so a directory
    * mixing schema generations (the r3 rows gained err_class/config_hash)
    * reads the UNION of columns instead of whichever file Spark samples,
    * and rows from files that predate a column get it as null — which the
    * consumers then treat EXPLICITLY (see `requireCompatible`).
    */
  private def readLineage(spark: SparkSession, lineagePath: String): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(lineagePath)
    Seq("err_class" -> "string", "config_hash" -> "string").foldLeft(df) {
      case (d, (c, t)) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(t))
    }
  }

  /** Buckets already completed for `stage` (any run). */
  def processedBuckets(spark: SparkSession, lineagePath: String, stage: String): DataFrame = {
    if (!exists(spark, lineagePath)) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.IntegerType))))
    } else {
      readLineage(spark, lineagePath)
        .where(col("stage") === stage && col("status") === "done")
        .select("bucket").distinct()
    }
  }

  /** Resume filter: drop rows of already-processed conversation buckets
    * (LEFT ANTI — the skip-already-loaded semantics of S8; `--overwrite`
    * parity = just don't apply this filter).
    */
  def filterUnprocessed(df: DataFrame, processed: DataFrame,
      convCol: String, nBuckets: Int = DefaultBuckets): DataFrame =
    df.withColumn("bucket", bucketOf(col(convCol), nBuckets))
      .join(processed, Seq("bucket"), "left_anti")
      .drop("bucket")

  /** Record completed buckets with row counters (one lineage row per bucket,
    * appended atomically per job — parquet append of a tiny aggregate).
    * The aggregate is ≤ nBuckets rows: `coalesce(1)` pins the append to ONE
    * file per call, so the lineage dir grows one file per recorded stage
    * instead of one per task — at 10^5 stages × shuffle partitions the
    * uncoalesced form is a small-files swamp (`compactLineage` sweeps what
    * still accumulates over very long histories).
    */
  def recordProcessed(spark: SparkSession, lineagePath: String, runId: String,
      stage: String, df: DataFrame, convCol: String,
      nBuckets: Int = DefaultBuckets, configHash: String = ""): Unit = {
    df.groupBy(bucketOf(col(convCol), nBuckets).as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .select(
        lit(runId).as("run_id"), lit(stage).as("stage"),
        col("bucket"), col("n_rows"),
        lit("done").as("status"),
        lit(null).cast("string").as("err_class"),
        lit(configHash).as("config_hash"), current_timestamp().as("ts"))
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(lineagePath)
  }

  /** Compact an appended-to lineage dir to a single file — the periodic
    * sweep mirroring Materialize.sweepStaleStaging. Single-writer protocol
    * (same as resume itself): run between jobs, not concurrently with an
    * append. Crash-safe ordering: the compacted file is fully written to a
    * `.compact` sibling BEFORE any original is deleted, so a crash mid-sweep
    * loses nothing (the sibling is swept/overwritten by the next compact).
    */
  def compactLineage(spark: SparkSession, lineagePath: String): Unit = {
    if (!exists(spark, lineagePath)) return
    val fs = new Path(lineagePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(lineagePath + ".compact")
    fs.delete(tmp, true)
    readLineage(spark, lineagePath).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val dataFiles = fs.listStatus(new Path(lineagePath))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    val compacted = fs.listStatus(tmp)
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    dataFiles.foreach(fs.delete(_, false))
    compacted.zipWithIndex.foreach { case (p, i) =>
      fs.rename(p, new Path(lineagePath, s"compacted-$i.parquet"))
    }
    fs.delete(tmp, true)
  }

  /** Record a FAILED bucket with its error class — the reference's
    * failure_count + failed_items[] (checkpoint_manager.py:341-353). A
    * failed bucket is visibly distinct from a not-yet-run one, and since
    * `processedBuckets` filters on status='done' a later resume re-runs it.
    */
  def recordFailed(spark: SparkSession, lineagePath: String, runId: String,
      stage: String, bucket: Int, error: Throwable,
      configHash: String = ""): Unit = {
    import spark.implicits._
    Seq((runId, stage, bucket, 0L, "failed",
      error.getClass.getName, configHash))
      .toDF("run_id", "stage", "bucket", "n_rows", "status", "err_class",
        "config_hash")
      .withColumn("ts", current_timestamp())
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(lineagePath)
  }

  /** Refuse to resume under a configuration incompatible with the lineage
    * being resumed (reference checkpoint_manager.py:179-210 / main.py:74-87):
    * every existing row of `stage` must carry exactly `configHash`.
    */
  def requireCompatible(spark: SparkSession, lineagePath: String,
      stage: String, configHash: String): Unit = {
    if (exists(spark, lineagePath)) {
      // null config_hash = rows from files predating the column (mergeSchema
      // read): REFUSED explicitly — an unknown config is not a compatible
      // one (null =!= hash would silently PASS those rows; ADVICE r3)
      val others = readLineage(spark, lineagePath)
        .where(col("stage") === stage &&
          (col("config_hash").isNull || col("config_hash") =!= configHash))
        .select(coalesce(col("config_hash"), lit("<pre-config_hash lineage>"))
          .as("config_hash"))
        .distinct().limit(5)
        .collect().map(_.getString(0))
      if (others.nonEmpty)
        throw new IllegalStateException(
          s"checkpoint config mismatch for stage '$stage': lineage was written " +
            s"under config ${others.mkString(",")} but this run has $configHash — " +
            "resume refused (rerun with --overwrite or matching settings)")
    }
  }

  /** Refuse a run-id that already appears in lineage under a DIFFERENT
    * config_hash: two launches sharing a run-id but not a configuration
    * would interleave incompatible rows under one identity. (The DEFAULT
    * run-id is collision-free by construction — epoch millis + pid — this
    * guards explicitly-passed `--run-id` values; same-config re-use stays
    * allowed, that is what resume IS.)
    */
  def requireRunIdFresh(spark: SparkSession, lineagePath: String,
      runId: String, configHash: String): Unit = {
    if (exists(spark, lineagePath)) {
      val clash = readLineage(spark, lineagePath)
        .where(col("run_id") === runId &&
          (col("config_hash").isNull || col("config_hash") =!= configHash))
        .limit(1).count() > 0
      if (clash)
        throw new IllegalStateException(
          s"run-id '$runId' already exists in lineage under a different " +
            s"config_hash than $configHash — pick a fresh run-id (or rerun " +
            "with the matching settings)")
    }
  }

  /** Progress counters for a stage (the reference's ProcessingStatistics /
    * LoaderResult totals incl. failure counters, models.py:186-210,
    * checkpoint_manager.py:341-353).
    */
  def stats(spark: SparkSession, lineagePath: String, stage: String): DataFrame =
    readLineage(spark, lineagePath)
      .where(col("stage") === stage)
      .agg(
        countDistinct(when(col("status") === "done", col("bucket"))).as("buckets_done"),
        sum(when(col("status") === "done", col("n_rows"))
          .otherwise(lit(0L))).as("rows_done"),
        count(when(col("status") === "failed", lit(1))).as("failure_count"),
        sort_array(collect_set(when(col("status") === "failed", col("bucket"))))
          .as("failed_buckets"))
}
