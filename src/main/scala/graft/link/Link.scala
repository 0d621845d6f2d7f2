package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.model.MatchType

/** Entity linking: candidate generation via broadcast dictionary joins on
  * block keys + the reference's weighted scoring + argmax selection.
  *
  * Re-expresses the reference's per-item API-lookup matching
  * (src/vlos/extractors/api_extractor.py:134-268,
  * src/vlos/matching/name_matcher.py:21-90) as declarative joins:
  *
  *  - The person dictionary is broadcast (dictionaries are ~5k rows at
  *    production scale — SURVEY.md §2.3), so linking 10^12 mentions is a
  *    map-side broadcast hash join with zero shuffle of the fact side.
  *    Hot mention keys (the chair appears in ~every fragment) are therefore
  *    harmless here — broadcast joins have no per-key reducer to skew.
  *  - Blocking = the join key (exact lowered surname), mirroring the
  *    reference's server-side `Achternaam eq '…'` filter (api_extractor.py:148-150);
  *    the contains-fallback tier only runs for mentions with no exact block hit.
  *  - Best-candidate selection = row_number over (mention) ordered by
  *    (score desc, persoon_id asc): a deterministic total order replacing the
  *    reference's order-dependent first-best loop (name_matcher.py:71-81) —
  *    stable under parallelism (SURVEY.md §7.4).
  */
object Link {

  /** Name-similarity score 0..100 — reference name_matcher.py:21-61 with
    * thresholds from vlos_config.py:35-43:
    *   +60 exact surname (bare or tussenvoegsel-full);
    *   else max(ratio(last,bare), ratio(last,full)) - 20 floored at 0;
    *   +40 if best first-name ratio >= 75, +20 if >= 60; capped at 100.
    */
  def nameScore(vFirst: Column, vLast: Column, bare: Column, full: Column,
      roepnaam: Column, voornamen: Column): Column = {
    val last = lower(vLast)
    val surnamePart = when(last === bare || last === full, 60)
      .otherwise(greatest(
        greatest(fuzzRatio(last, bare), fuzzRatio(last, full)) - 20, lit(0)))
    val bestFirst = greatest(
      fuzzRatio(lower(vFirst), lower(roepnaam)),
      fuzzRatio(lower(vFirst), lower(voornamen)))
    val firstPart = when(vFirst.isNull || vFirst === "", 0)
      .when(bestFirst >= 75, 40).when(bestFirst >= 60, 20).otherwise(0)
    least(surnamePart + firstPart, lit(100))
  }

  val MinSpeakerScore = 60 // vlos_config.py:43
  val ExactThreshold = 90 // name_matcher.py:84-90

  /** Person dictionary exploded to one row per block key (bare surname and
    * tussenvoegsel-full surname), ready for an equi broadcast join.
    */
  def personBlocks(persons: DataFrame): DataFrame = {
    val withNames = persons
      .withColumn("bare", lower(col("achternaam")))
      .withColumn("full", fullSurname(col("tussenvoegsel"), col("achternaam")))
    withNames
      .withColumn("block_key", explode(array_distinct(array(col("bare"), col("full")))))
  }

  /** Link speaker mentions to persons. Input: Extract.speakerMentions output.
    * Output: mention keys + best persoon_id, score, match_type (or NO_MATCH).
    */
  def linkPersons(mentions: DataFrame, persons: DataFrame): DataFrame = {
    val blocks = broadcast(personBlocks(persons))

    // Tier 1: exact surname block join (reference api_extractor.py:148-155).
    val exact = mentions
      .join(blocks, lower(mentions("v_last")) === blocks("block_key"))

    // Tier 2 (fallback): contains-join on the last token, only for mentions
    // with no exact hit (reference api_extractor.py:157-168). The fallback
    // side is a broadcast theta-join: tiny dim × (typically few) residuals.
    val lastToken = regexp_extract(lower(col("v_last")), "(\\S+)$", 1)
    val noExact = mentions.join(
      blocks.select("block_key").distinct(),
      lower(mentions("v_last")) === col("block_key"), "left_anti")
    val fallback = noExact
      .withColumn("lt", lastToken)
      .join(broadcast(personBlocks(persons).drop("block_key").distinct()),
        col("bare").contains(col("lt")))
      .drop("lt")

    val cols = Seq("conv_id", "turn_idx", "v_first", "v_last",
      "persoon_id", "fractie_id", "bare", "full", "roepnaam", "voornamen")
    val candidates = exact.select(cols.map(col): _*)
      .unionByName(fallback.select(cols.map(col): _*))
      .withColumn("score", nameScore(col("v_first"), col("v_last"),
        col("bare"), col("full"), col("roepnaam"), col("voornamen")))
      .where(col("score") >= MinSpeakerScore)

    val w = Window.partitionBy("conv_id", "turn_idx", "v_first", "v_last")
      .orderBy(col("score").desc, col("persoon_id").asc)
    candidates
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn", "bare", "full", "roepnaam", "voornamen")
      .withColumn("match_type",
        when(col("score") >= ExactThreshold, MatchType.Exact).otherwise(MatchType.Fuzzy))
  }

  /** Zaak linking with the 3-tier fallback cascade — reference
    * api_extractor.py:207-268 + scoring vlos_pipeline.py:280-308:
    *   tier 1 (zaak on dossier+stuk)     → EXACT,    score 100
    *   tier 2 (dossier on dossier_nr)    → FALLBACK, score 75
    *   tier 3 (document on dossier+volg) → FALLBACK, score 60
    *   none                              → NO_MATCH, score 0
    * All three dims broadcast; the cascade is three left joins + coalesce,
    * evaluated in one pass over the mentions (no shuffle of the fact side).
    */
  def linkZaken(mentions: DataFrame, zaken: DataFrame, dossiers: DataFrame,
      documents: DataFrame): DataFrame = {
    val z = broadcast(zaken.select(
      col("zaak_id"), col("dossier_nr").as("z_dnr"), col("stuk_nr").as("z_snr")))
    val d = broadcast(dossiers.select(
      col("dossier_nr").as("d_dnr"),
      concat(lit("D"), col("dossier_nr").cast("string")).as("dossier_id")))
    val doc = broadcast(documents.select(
      col("dossier_nr").as("doc_dnr"), col("volgnummer").as("doc_volg"),
      concat(lit("DOC"), col("dossier_nr").cast("string"), lit("-"),
        col("volgnummer").cast("string")).as("document_id")))

    mentions
      .join(z, col("dossier_nr") === col("z_dnr") && col("stuk_nr") === col("z_snr"), "left")
      .join(d, col("dossier_nr") === col("d_dnr"), "left")
      .join(doc, col("dossier_nr") === col("doc_dnr") &&
        col("stuk_nr") === col("doc_volg"), "left")
      .select(
        col("conv_id"), col("turn_idx"), col("dossier_nr"), col("stuk_nr"),
        col("toevoeging"),
        coalesce(col("zaak_id"), col("dossier_id"), col("document_id")).as("entity_id"),
        when(col("zaak_id").isNotNull, 100)
          .when(col("dossier_id").isNotNull, 75)
          .when(col("document_id").isNotNull, 60)
          .otherwise(0).as("score"),
        when(col("zaak_id").isNotNull, MatchType.Exact)
          .when(col("dossier_id").isNotNull || col("document_id").isNotNull, MatchType.Fallback)
          .otherwise(MatchType.NoMatch).as("match_type"))
  }
}
