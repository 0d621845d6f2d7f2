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
  * Lineage schema: (run_id, stage, bucket, n_rows, status, ts).
  */
object Checkpoint {

  val DefaultBuckets = 64

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
      nBuckets: Int = DefaultBuckets): Unit = {
    df.groupBy(bucketOf(col(convCol), nBuckets).as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .select(
        lit(runId).as("run_id"), lit(stage).as("stage"),
        col("bucket"), col("n_rows"),
        lit("done").as("status"), current_timestamp().as("ts"))
      .write.mode(SaveMode.Append).parquet(lineagePath)
  }

  /** Progress counters for a stage (the reference's ProcessingStatistics /
    * LoaderResult totals, models.py:186-210).
    */
  def stats(spark: SparkSession, lineagePath: String, stage: String): DataFrame =
    spark.read.parquet(lineagePath)
      .where(col("stage") === stage)
      .agg(
        countDistinct(col("bucket")).as("buckets_done"),
        sum(col("n_rows")).as("rows_done"))
}
