package graft.matching

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Activity matching — the reference's weighted scorer that links an
  * XML-side activity to its API-side candidate
  * (src/vlos/matching/activity_matcher.py:26-123, weights
  * src/vlos/config/vlos_config.py:16-33), re-expressed as a range join +
  * column-expression score + window argmax with runner-up margin acceptance.
  *
  * All weights are stored ×2 so every score is an exact integer (the
  * reference's 1.5/2.5 half-points) — deterministic across engines:
  *   time:  +6 start within ±300 s; else +3 overlap within ±600 s buffer
  *          (:125-163)
  *   soort: +4 exact; +4 xml⊂api; +3 api⊂xml (:165-205)
  *   topic: +8 exact after normalization; +5 fuzzy ≥85; +4 fuzzy ≥70
  *          (:223-234)
  *   accept: score ≥ 6, OR (score − runnerUp ≥ 2 AND score ≥ 2) (:252-265)
  *   EXACT if score ≥ 10 (min+2, :57-60), else FUZZY.
  *
  * Scale shape: candidates are blocked on the conversation key and the time
  * window (J3) — the join never goes all-pairs; the per-activity candidate
  * cap (reference max 200, api_extractor.py:83-87) is a per-group top-k
  * window, not a global limit.
  */
object ActivityMatch {

  val TimeCloseX2 = 6
  val TimeOverlapX2 = 3
  val SoortExactX2 = 4
  val SoortXmlInApiX2 = 4
  val SoortApiInXmlX2 = 3
  val SoortAliasX2 = 4 // alias hit scores like xml-in-api (matcher :192-203)

  /** Soort alias table — reference activity_matcher.py:193-197: when the xml
    * soort equals the main key and the api soort CONTAINS one of the
    * aliases, score `score_soort_partial_xml_in_api`. The same literals
    * drive the Spark expression and the oracle SQL (MatchSql).
    */
  val SoortAliases: Seq[(String, Seq[String])] = Seq(
    "opening" -> Seq("aanvang", "regeling van werkzaamheden", "reglementair"),
    "sluiting" -> Seq("einde vergadering", "stemmingen", "stemmen"),
    "mededelingen" -> Seq("procedurevergadering", "procedures en brieven", "uitstel brieven"))
  val TopicExactX2 = 8
  val TopicHighX2 = 5
  val TopicMidX2 = 4
  val AcceptMinX2 = 6
  val MarginMinX2 = 2
  val FloorMinX2 = 2
  val ExactMinX2 = 10

  val StartProximityUs: Long = 300L * 1000000 // ±300 s (vlos_config.py:32)
  val OverlapBufferUs: Long = 600L * 1000000 // ±600 s (vlos_config.py:33)

  /** Score one (xml, candidate) pair. Timestamps in epoch micros. */
  def scoreX2(xBegUs: Column, xEndUs: Column, xSoort: Column, xTopic: Column,
      aBegUs: Column, aEndUs: Column, aSoort: Column, aTopic: Column): Column = {
    val time =
      when(abs(xBegUs - aBegUs) <= StartProximityUs, TimeCloseX2)
        .when(greatest(xBegUs, aBegUs - OverlapBufferUs) <
          least(xEndUs, aEndUs + OverlapBufferUs), TimeOverlapX2)
        .otherwise(0)
    val xs = lower(xSoort); val as_ = lower(aSoort)
    val aliasHit = SoortAliases.map { case (main, aliases) =>
      xs === main && aliases.map(a => instr(as_, a) > 0).reduce(_ || _)
    }.reduce(_ || _)
    val soort =
      when(xs === as_, SoortExactX2)
        .when(instr(as_, xs) > 0, SoortXmlInApiX2)
        .when(instr(xs, as_) > 0, SoortApiInXmlX2)
        .when(aliasHit, SoortAliasX2)
        .otherwise(0)
    val nx = TextFunctions.normalizeTopic(xTopic)
    val na = TextFunctions.normalizeTopic(aTopic)
    val ratio = TextFunctions.fuzzRatio(nx, na)
    val topic =
      when(nx === na, TopicExactX2)
        .when(ratio >= 85, TopicHighX2)
        .when(ratio >= 70, TopicMidX2)
        .otherwise(0)
    time + soort + topic
  }

  /** Match XML activities to candidates.
    *
    * `xmlActs`:    (conv_id, xml_id, x_beg_us, x_end_us, x_soort, x_topic)
    * `candidates`: (conv_id, cand_idx, a_beg_us, a_end_us, a_soort, a_topic)
    *
    * Output: one row per xml activity with its best candidate, both scores,
    * acceptance and match type.
    */
  def matchActivities(xmlActs: DataFrame, candidates: DataFrame,
      maxCandidates: Int = 200): DataFrame = {
    val joined = xmlActs.join(candidates, Seq("conv_id"))
      .withColumn("score_x2", scoreX2(
        col("x_beg_us"), col("x_end_us"), col("x_soort"), col("x_topic"),
        col("a_beg_us"), col("a_end_us"), col("a_soort"), col("a_topic")))
    // candidate cap: per-group top-k (deterministic tie-break on cand_idx)
    val wCap = Window.partitionBy("conv_id", "xml_id")
      .orderBy(col("score_x2").desc, col("cand_idx").asc)
    val capped = joined
      .withColumn("rn", row_number().over(wCap))
      .where(col("rn") <= maxCandidates)
    // argmax + runner-up margin (W3/W4)
    val runner = lead("score_x2", 1).over(wCap)
    val best = capped
      .withColumn("runner_x2", runner)
      .where(col("rn") === 1)
      .drop("rn")
    best.select(
      col("conv_id"), col("xml_id"), col("cand_idx"), col("score_x2"),
      coalesce(col("runner_x2"), lit(0)).as("runner_x2"))
      .withColumn("accepted",
        col("score_x2") >= AcceptMinX2 ||
          (col("score_x2") - col("runner_x2") >= MarginMinX2 &&
            col("score_x2") >= FloorMinX2))
      .withColumn("match_type",
        when(!col("accepted"), graft.model.MatchType.NoMatch)
          .when(col("score_x2") >= ExactMinX2, graft.model.MatchType.Exact)
          .otherwise(graft.model.MatchType.Fuzzy))
  }
}
