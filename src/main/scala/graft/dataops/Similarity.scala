package graft.dataops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, same output contract (vec_id, neighbor_id, cos_1e6, rank):
  *  - `bruteForceTopK`: exact all-pairs cosine — the correctness baseline.
  *    O(n²·d); only for verification scale.
  *  - `lshTopK`: the scale path — sign-LSH bucketing (hyperplane = coordinate
  *    axes of the leading dims, deterministic and oracle-expressible; swap in
  *    random-projection planes for production) restricts the pair join to
  *    same-bucket vectors: at 100 TB, bucket-partitioned self-join instead of
  *    a cross join.
  *
  * All arithmetic in double with a deterministic left-to-right fold
  * (`aggregate` over the zipped arrays), then scores are fixed-pointed to
  * 1e-6 (`cos_1e6`) BEFORE ranking, so ranks are reproducible across engines
  * (float-sum association is engine-defined only when order is fixed — both
  * Spark's `aggregate` and DuckDB's `list_` reducers fold sequentially).
  */
object Similarity {

  /** Cosine similarity of two array<double> columns (deterministic fold). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  private def prep(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))

  private def ranked(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_1e6").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Exact top-k cosine neighbors per vector (excluding self). */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val l = prep(embeddings).toDF("vec_id", "emb")
    val r = prep(embeddings).toDF("neighbor_id", "emb_r")
    val pairs = l.join(r, col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        floor(cosine(col("emb"), col("emb_r")) * 1e6).cast("long").as("cos_1e6"))
    ranked(pairs, k)
  }

  /** Sign-LSH bucket key: the sign pattern of the first `nBits` dimensions.
    * Deterministic, SQL-expressible; production swaps in seeded
    * random-projection hyperplanes (same plan shape).
    */
  def signBucket(emb: Column, nBits: Int): Column =
    concat((0 until nBits).map(i =>
      when(element_at(emb, i + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** Approximate top-k: candidate pairs limited to the same sign bucket.
    * Recall < 1 by design (that's the approximation); the pair join shuffles
    * on the bucket key only.
    */
  def lshTopK(embeddings: DataFrame, k: Int = 5, nBits: Int = 4): DataFrame = {
    val withBucket = prep(embeddings)
      .withColumn("bucket", signBucket(col("emb"), nBits))
    val l = withBucket.toDF("vec_id", "emb", "bucket")
    val r = withBucket.toDF("neighbor_id", "emb_r", "bucket")
    val pairs = l.join(r, Seq("bucket"))
      .where(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        floor(cosine(col("emb"), col("emb_r")) * 1e6).cast("long").as("cos_1e6"))
    ranked(pairs, k)
  }
}
