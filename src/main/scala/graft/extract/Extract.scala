package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Mention detection over transcript turns — the Spark re-expression of the
  * reference's VLOS XML extraction stage (src/vlos/extractors/xml_extractor.py):
  * speaker mentions (:118-192), case/zaak mentions (:194-217), fractie vote
  * utterances (:219-257), procedural filtering (:69-83), and first-seen
  * speaker dedup (:122-148).
  *
  * Everything here is narrow (per-row regex/projection): at 10^12 turns this
  * stage is a single map over the scan with full predicate pushdown — no
  * shuffle is introduced until the per-conversation window in `withSegments`.
  */
object Extract {

  /** Procedural-turn markers — reference vlos_config.py:72-80 + xml_extractor.py:69-83. */
  val ProceduralMarkers: Seq[String] =
    Seq("opening", "sluiting", "aanvang", "einde vergadering", "geschorst")

  // word-boundary anchored: a marker must appear as a word, not as a
  // substring of a longer token (reference checks the activity soort/titel
  // against a curated list, xml_extractor.py:69-83 — a speech merely
  // containing "verkoopopening" must not be dropped). \b is RE2-safe, so
  // the same pattern runs in the DuckDB oracle.
  private val proceduralRegex = "\\b(" + ProceduralMarkers.mkString("|") + ")\\b"

  def isProcedural(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(textCol).rlike(proceduralRegex)

  /** Drop procedural turns (P4). */
  def nonProcedural(turns: DataFrame): DataFrame =
    turns.where(!isProcedural(col("text")))

  /** Activity segmentation: a new segment starts at each conversation opening
    * marker (transcript-domain stand-in for the reference's activiteit
    * container). Adds `seg_id`. Requires one shuffle on conv_id — the same
    * partitioning every later per-conversation stage reuses.
    *
    * Word-boundary anchored like `isProcedural` (VERDICT r2): a real-corpus
    * token such as "heropening" must not open a phantom segment. \b is
    * RE2-safe, so the identical pattern runs in the DuckDB oracle.
    */
  def withSegments(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns.withColumn("seg_id",
      sum(when(lower(col("text")).rlike("\\bopening\\b"), 1).otherwise(0)).over(w))
  }

  /** Speaker mentions: four surface patterns (≈ the reference's two XML
    * speaker sources, draadboekfragment + bare spreker, xml_extractor.py:124-191).
    * Output: (conv_id, turn_idx, ts, kind, v_first, v_last) with v_first = ''
    * when the surface form carries no first name.
    */
  def speakerMentions(turns: DataFrame): DataFrame = {
    val t = col("text")
    // Each regex is evaluated into a named column exactly once; later
    // expressions reference the attribute. Building the `when`-chains over
    // raw regex Columns instead would inline every regex tree ~6x into the
    // plan — catastrophic for generated-code size (janino compile seconds).
    nonProcedural(turns)
      .withColumn("m_woord", regexp_extract(t, "het woord aan (.+)$", 1))
      .withColumn("m_spreekt", regexp_extract(t, "^Mevrouw (.+) spreekt over", 1))
      .withColumn("m_inter", regexp_extract(t, "^De heer (.+) interrumpeert", 1))
      .withColumn("m_reactie", regexp_extract(t, "^(.+) vraagt een reactie", 1))
      .withColumn("kind",
        when(col("m_woord") =!= "", "woord_aan")
          .when(col("m_spreekt") =!= "", "spreekt")
          .when(col("m_inter") =!= "", "interrumpeert")
          .when(col("m_reactie") =!= "", "reactie"))
      .where(col("kind").isNotNull)
      .withColumn("m_full",
        when(col("m_woord") =!= "", col("m_woord")).otherwise(col("m_reactie")))
      .withColumn("v_first",
        when(col("m_full") =!= "", regexp_extract(col("m_full"), "^(\\S+) ", 1))
          .otherwise(lit("")))
      .withColumn("v_last",
        when(col("m_full") =!= "", regexp_extract(col("m_full"), "^\\S+ (.+)$", 1))
          .otherwise(when(col("m_spreekt") =!= "", col("m_spreekt")).otherwise(col("m_inter"))))
      // mention validity (P5): a speaker mention needs a surname
      // (reference xml_extractor.py:144, 171)
      .where(col("v_last") =!= "")
      .select("conv_id", "turn_idx", "ts", "kind", "v_first", "v_last")
  }

  /** First-seen dedup of identical speaker mentions within a conversation —
    * reference seen_speakers set keyed voornaam|achternaam (xml_extractor.py:122-148).
    * Keeps the earliest turn via min(turn_idx): order-stable under parallelism.
    */
  def dedupSpeakers(mentions: DataFrame): DataFrame =
    mentions.groupBy("conv_id", "v_first", "v_last")
      .agg(min("turn_idx").as("turn_idx"), min_by(col("kind"), col("turn_idx")).as("kind"))

  /** Case (zaak) mentions: dossier number + optional stuk number / toevoeging —
    * reference xml_extractor.py:194-217 + dossier-code regex api_extractor.py:304-312.
    * Validity: mention must carry a dossier number (P5 analogue).
    */
  def caseMentions(turns: DataFrame): DataFrame = {
    val t = col("text")
    val code = regexp_extract(t, "dossier (\\d+(?:-[A-Za-z0-9]+)?)", 1)
    val stuk = regexp_extract(t, "nr\\. (\\d+)", 1)
    nonProcedural(turns)
      .withColumn("dossier_code", code)
      .where(col("dossier_code") =!= "")
      .select(
        col("conv_id"), col("turn_idx"), col("ts"),
        TextFunctions.dossierNumber(col("dossier_code")).as("dossier_nr"),
        TextFunctions.dossierToevoeging(col("dossier_code")).as("toevoeging"),
        when(stuk =!= "", stuk.cast("int")).as("stuk_nr"))
  }

  /** Fractie vote utterances → normalized votes —
    * reference xml_extractor.py:219-257 (+ vote normalization :244).
    */
  def voteMentions(turns: DataFrame): DataFrame = {
    val t = col("text")
    nonProcedural(turns)
      .withColumn("fractie_naam", regexp_extract(t, "^De fractie (.+) stemt ", 1))
      .withColumn("vote_norm",
        TextFunctions.normalizeVote(regexp_extract(t, " stemt (voor|tegen|onthouding)$", 1)))
      .where(col("fractie_naam") =!= "" && col("vote_norm") =!= "")
      .select("conv_id", "turn_idx", "ts", "fractie_naam", "vote_norm")
  }
}
