package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins — the north rule's hot-entity
  * mitigation. The linker's dictionary joins are broadcast (no reducer to
  * skew), but two shapes at 10^12 scale DO shuffle on a potentially hot key
  * and need salting when AQE's skew split isn't available (e.g. bucketed
  * pre-shuffles or aggregation-heavy stages):
  *
  *  - fact⋈fact equi-joins on entity keys where one entity (the chair,
  *    "De voorzitter") carries a large share of all rows;
  *  - groupBy on entity keys ahead of non-algebraic aggregates.
  *
  * Scheme: the fact side gets a deterministic per-row salt in [0, n) —
  * derived from the row's own identity columns, NOT rand(), so retries and
  * resumed runs reproduce identical partitioning; the dimension side is
  * exploded n× (one copy per salt). The join key becomes (key, salt):
  * a key that was 1 reducer wide becomes n reducers wide.
  */
object Salting {

  /** Deterministic salt in [0, n) from identity columns. */
  def saltOf(n: Int, identityCols: Column*): Column =
    pmod(xxhash64(identityCols: _*), lit(n)).cast("int")

  /** Fact side: add a `_salt` column derived from `identityCols`. */
  def saltFact(fact: DataFrame, n: Int, identityCols: Seq[String]): DataFrame =
    fact.withColumn("_salt", saltOf(n, identityCols.map(col): _*))

  /** Dimension side: replicate every row once per salt value. */
  def explodeDim(dim: DataFrame, n: Int): DataFrame =
    dim.withColumn("_salt", explode(lit((0 until n).toArray)))

  /** Salted inner equi-join of a skewed fact against a (small-ish, but not
    * broadcastable) dimension on `key`: shuffle width per hot key becomes n.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, n: Int,
      identityCols: Seq[String]): DataFrame =
    saltFact(fact, n, identityCols)
      .join(explodeDim(dim, n), Seq(key, "_salt"))
      .drop("_salt")

  /** Session conf for AQE's built-in skew handling (runtime split of
    * oversized partitions in sort-merge joins) — GraftApp sets these.
    */
  val AqeSkewConf: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "3",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64MB")
}
