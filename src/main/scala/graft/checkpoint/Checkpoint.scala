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

  /** Buckets already completed for `stage` (any run). */
  def processedBuckets(spark: SparkSession, lineagePath: String, stage: String): DataFrame = {
    if (!exists(spark, lineagePath)) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.IntegerType))))
    } else {
      spark.read.parquet(lineagePath)
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
      .write.mode(SaveMode.Append).parquet(lineagePath)
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
      .write.mode(SaveMode.Append).parquet(lineagePath)
  }

  /** Refuse to resume under a configuration incompatible with the lineage
    * being resumed (reference checkpoint_manager.py:179-210 / main.py:74-87):
    * every existing row of `stage` must carry exactly `configHash`.
    */
  def requireCompatible(spark: SparkSession, lineagePath: String,
      stage: String, configHash: String): Unit = {
    if (exists(spark, lineagePath)) {
      val others = spark.read.parquet(lineagePath)
        .where(col("stage") === stage && col("config_hash") =!= configHash)
        .select("config_hash").distinct().limit(5)
        .collect().map(_.getString(0))
      if (others.nonEmpty)
        throw new IllegalStateException(
          s"checkpoint config mismatch for stage '$stage': lineage was written " +
            s"under config ${others.mkString(",")} but this run has $configHash — " +
            "resume refused (rerun with --overwrite or matching settings)")
    }
  }

  /** Progress counters for a stage (the reference's ProcessingStatistics /
    * LoaderResult totals incl. failure counters, models.py:186-210,
    * checkpoint_manager.py:341-353).
    */
  def stats(spark: SparkSession, lineagePath: String, stage: String): DataFrame =
    spark.read.parquet(lineagePath)
      .where(col("stage") === stage)
      .agg(
        countDistinct(when(col("status") === "done", col("bucket"))).as("buckets_done"),
        sum(when(col("status") === "done", col("n_rows"))
          .otherwise(lit(0L))).as("rows_done"),
        count(when(col("status") === "failed", lit(1))).as("failure_count"),
        sort_array(collect_set(when(col("status") === "failed", col("bucket"))))
          .as("failed_buckets"))
}
