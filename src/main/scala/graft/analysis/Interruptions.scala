package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.InterruptionType

/** Sequential interruption detection — the Spark window re-expression of the
  * reference's adjacent-speaker scan (src/vlos/analyzers/interruption_analyzer.py:191-238):
  * for speaker sequence …A,B,A… the middle turn is an interruption of A by B;
  * if the next speaker is again A it is INTERRUPTION_WITH_RESPONSE, else
  * SIMPLE_INTERRUPTION.
  *
  * Scale note: the lag/lead window needs `(partition key) ordered by turn_idx`.
  * Partitioning on conv_id means one reducer per conversation — giant
  * conversations are the skew risk (SURVEY.md §7.4); callers at scale should
  * `repartitionByRange($"conv_id", $"turn_idx")` first so AQE can split, and
  * conversations are bounded in practice (turns/conv ≪ partition size).
  */
object Interruptions {

  /** Input: speaker-bearing turns (conv_id, turn_idx, speaker[, partition cols]).
    * Output: one row per interruption event with its classification.
    */
  def detect(speakerTurns: DataFrame,
      partitionCols: Seq[String] = Seq("conv_id")): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy("turn_idx")
    speakerTurns
      .withColumn("prev_speaker", lag("speaker", 1).over(w))
      .withColumn("next_speaker", lead("speaker", 1).over(w))
      .where(col("prev_speaker").isNotNull && col("prev_speaker") =!= col("speaker"))
      .withColumn("itype",
        when(col("next_speaker").isNotNull && col("next_speaker") === col("prev_speaker"),
          InterruptionType.WithResponse)
          .otherwise(InterruptionType.Simple))
      .withColumnRenamed("speaker", "interrupter")
      .withColumnRenamed("prev_speaker", "interrupted")
      .drop("next_speaker")
  }

  /** W2 fragment interruption: within one fragment/segment, every speaker
    * other than the fragment's first speaker interrupts them — reference
    * interruption_analyzer.py:73-90.
    */
  def fragmentInterruptions(speakerTurns: DataFrame,
      fragmentCols: Seq[String] = Seq("conv_id", "seg_id")): DataFrame = {
    val w = Window.partitionBy(fragmentCols.map(col): _*).orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    speakerTurns
      .withColumn("first_speaker", first("speaker").over(w))
      .where(col("speaker") =!= col("first_speaker"))
      .select((fragmentCols.map(col) :+ col("turn_idx") :+
        col("speaker").as("interrupter") :+
        col("first_speaker").as("interrupted")): _*)
  }

  /** A6: interruption type counts. */
  def typeCounts(events: DataFrame): DataFrame =
    events.groupBy("itype").agg(count(lit(1)).as("n"))

  /** A7: most frequent interrupters (desc count, stable tie-break). */
  def topInterrupters(events: DataFrame): DataFrame =
    events.groupBy("interrupter").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("interrupter"))

  /** A7 both directions in one frame: per-speaker event counts as
    * interrupter and as interrupted (reference's most_frequent_interrupters
    * / most_interrupted lists, interruption_analyzer.py:128-146), tagged by
    * `side` — one grouped count per direction, no shuffle beyond the two
    * partial aggregates.
    */
  def ranks(events: DataFrame): DataFrame = {
    def side(c: String) = events
      .groupBy(col(c).as("speaker")).agg(count(lit(1)).as("n"))
      .withColumn("side", lit(c))
    side("interrupter").unionByName(side("interrupted"))
      .orderBy(col("side"), col("n").desc, col("speaker"))
  }

  /** A8: interruption pairs A→B with counts. Partial aggregation (map-side
    * combine) makes the hot-chair key a non-issue at scale.
    */
  def pairs(events: DataFrame): DataFrame =
    events.groupBy("interrupter", "interrupted").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("interrupter"), col("interrupted"))

  /** A8 full shape: pairs enriched with the topic set and bounded example
    * slices the reference carries per pair (interruption_analyzer.py:120-143:
    * `{count, topics: set, examples: list[:3]}`). `convTopics` is
    * `(conv_id, topic)`; examples are the 3 lexicographically-smallest
    * `conv:turn` refs (deterministic stand-in for the reference's
    * first-3-encountered under its serial scan). Topics join runs as a
    * separate aggregate so the per-pair count stays the event count, not the
    * topic-multiplied row count.
    */
  def pairsEnriched(events: DataFrame, convTopics: DataFrame): DataFrame = {
    val ev = events.withColumn("example",
      concat_ws(":", col("conv_id"), col("turn_idx")))
    val base = ev.groupBy("interrupter", "interrupted")
      .agg(count(lit(1)).as("n"),
        array_join(slice(sort_array(collect_list(col("example"))), 1, 3), ";")
          .as("examples"))
    val tp = ev.select("conv_id", "interrupter", "interrupted")
      .join(convTopics, Seq("conv_id"))
      .groupBy("interrupter", "interrupted")
      .agg(array_join(sort_array(collect_set(col("topic"))), ",").as("topics"))
    base.join(tp, Seq("interrupter", "interrupted"), "left")
      .withColumn("topics", coalesce(col("topics"), lit("")))
      .orderBy(col("n").desc, col("interrupter"), col("interrupted"))
  }

  /** A10: response patterns — who responded to whom (the interrupted speaker
    * responding after an INTERRUPTION_WITH_RESPONSE event) —
    * reference interruption_analyzer.py:160-179.
    */
  def responsePatterns(events: DataFrame): DataFrame =
    events.where(col("itype") === InterruptionType.WithResponse)
      .groupBy(col("interrupted").as("responder"), col("interrupter").as("responded_to"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("responder"), col("responded_to"))
}
