package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Voting-pattern analysis — Spark re-expression of the reference's
  * voting_analyzer.py (:23-60 breakdowns, :78-142 fractie alignment,
  * :87-156 topic patterns + controversial/unanimous classification).
  *
  * All percentages are reported as integer permille computed with integer
  * division (`1000*x div total`): deterministic across engines (no float
  * rounding ambiguity), and the reference's float thresholds 80%/95%
  * translate exactly to 800/950.
  *
  * Scale note: every aggregation here is a partial-aggregated groupBy on a
  * bounded key space (events × 3 vote kinds, or ~50 fracties) — map-side
  * combine collapses the 10^12-row input before the shuffle, so hot vote
  * events cannot skew a reducer.
  */
object Voting {

  private def permille(num: Column, den: Column): Column =
    when(den > 0, floor(num * 1000 / den)).otherwise(0).cast("int")

  /** A1: per-event breakdown vote_norm → sorted fractie list + count. */
  def breakdown(votes: DataFrame, eventCols: Seq[String]): DataFrame =
    votes.groupBy((eventCols :+ "vote_norm").map(col): _*)
      .agg(count(lit(1)).as("n"),
        concat_ws(",", sort_array(collect_set(col("fractie_naam")))).as("fracties"))

  /** A2/A12: per-event voor/tegen/onthouding counts + consensus permille
    * (reference: max(voor,tegen)/total*100, voting_analyzer.py:41-48).
    */
  def consensus(votes: DataFrame, eventCols: Seq[String]): DataFrame = {
    val agg = votes.groupBy(eventCols.map(col): _*)
      .agg(
        sum(when(col("vote_norm") === "voor", 1).otherwise(0)).as("voor"),
        sum(when(col("vote_norm") === "tegen", 1).otherwise(0)).as("tegen"),
        sum(when(col("vote_norm") === "onthouding", 1).otherwise(0)).as("onthouding"))
    agg
      .withColumn("total", col("voor") + col("tegen") + col("onthouding"))
      .withColumn("consensus_permille",
        permille(greatest(col("voor"), col("tegen")), col("total")))
      // reference classification thresholds: controversial < 80%, unanimous >= 95%
      // (voting_analyzer.py:145-156)
      .withColumn("classification",
        when(col("consensus_permille") >= 950, "unanimous")
          .when(col("consensus_permille") < 800, "controversial")
          .otherwise("normal"))
  }

  /** A3: fractie alignment — per-fractie vote counts + voor-share permille
    * (reference voting_analyzer.py:78-142).
    */
  def fractieAlignment(votes: DataFrame): DataFrame =
    votes.groupBy("fractie_naam")
      .agg(
        sum(when(col("vote_norm") === "voor", 1).otherwise(0)).as("voor"),
        sum(when(col("vote_norm") === "tegen", 1).otherwise(0)).as("tegen"),
        sum(when(col("vote_norm") === "onthouding", 1).otherwise(0)).as("onthouding"),
        count(lit(1)).as("total"))
      .withColumn("voor_permille", permille(col("voor"), col("total")))

  /** A5: global vote-type distribution. */
  def distribution(votes: DataFrame): DataFrame =
    votes.groupBy("vote_norm").agg(count(lit(1)).as("n"))

  /** A4: per-topic vote patterns — votes rolled up by the topics (dossiers)
    * their conversation discusses, with the reference's controversial (<80%)
    * / unanimous (≥95%) classification (voting_analyzer.py:87-156).
    * `topics`: (conv_id, topic) distinct.
    */
  def topicPatterns(votes: DataFrame, topics: DataFrame): DataFrame =
    consensus(votes.join(topics, "conv_id"), Seq("topic"))
}
