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

  /** ONE-PASS extraction of every mention type (speaker, case, vote) from a
    * single scan of the turns table. At 10^12 turns the raw scan + regex
    * evaluation IS the extract cost; running speaker/case/vote extraction
    * as three separate scans (round-2 shape) tripled it — the pipeline now
    * computes this wide form once (checkpointed/staged by `Pipeline.build`)
    * and the per-type extractors are cheap filtered projections of it. The
    * three public extractors below are thin wrappers, so oracle queries and
    * the pipeline share one source of truth.
    *
    * Output: one row per turn carrying at least one mention, with validity
    * flags (is_speaker/is_case/is_vote) and the typed fields of each kind.
    * NOTE: a single turn can carry several mention kinds — the flags are
    * independent, not a partition.
    */
  def mentionsWide(turns: DataFrame): DataFrame = {
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
      .withColumn("m_full",
        when(col("m_woord") =!= "", col("m_woord")).otherwise(col("m_reactie")))
      .withColumn("v_first",
        when(col("m_full") =!= "", regexp_extract(col("m_full"), "^(\\S+) ", 1))
          .otherwise(lit("")))
      .withColumn("v_last",
        when(col("m_full") =!= "", regexp_extract(col("m_full"), "^\\S+ (.+)$", 1))
          .otherwise(when(col("m_spreekt") =!= "", col("m_spreekt")).otherwise(col("m_inter"))))
      .withColumn("dossier_code", regexp_extract(t, "dossier (\\d+(?:-[A-Za-z0-9]+)?)", 1))
      .withColumn("m_stuk", regexp_extract(t, "nr\\. (\\d+)", 1))
      .withColumn("fractie_naam", regexp_extract(t, "^De fractie (.+) stemt ", 1))
      .withColumn("vote_norm",
        TextFunctions.normalizeVote(regexp_extract(t, " stemt (voor|tegen|onthouding)$", 1)))
      // mention validity (P5): a speaker mention needs a surname
      // (reference xml_extractor.py:144, 171); a case mention a dossier code
      .withColumn("is_speaker", col("kind").isNotNull && col("v_last") =!= "")
      .withColumn("is_case", col("dossier_code") =!= "")
      .withColumn("is_vote", col("fractie_naam") =!= "" && col("vote_norm") =!= "")
      .where(col("is_speaker") || col("is_case") || col("is_vote"))
      .select(
        col("conv_id"), col("turn_idx"), col("ts"),
        col("is_speaker"), col("kind"), col("v_first"), col("v_last"),
        col("is_case"),
        // guarded by the flag: dossierNumber's int cast is ANSI-strict and
        // must not see the empty code of speaker/vote-only rows
        when(col("is_case"),
          TextFunctions.dossierNumber(col("dossier_code"))).as("dossier_nr"),
        when(col("is_case"),
          TextFunctions.dossierToevoeging(col("dossier_code"))).as("toevoeging"),
        when(col("m_stuk") =!= "", col("m_stuk").cast("int")).as("stuk_nr"),
        col("is_vote"), col("fractie_naam"), col("vote_norm"))
  }

  /** Speaker-mention view of the wide form (same rows/columns as round-2's
    * standalone extractor — reference speaker sources xml_extractor.py:124-191).
    */
  def speakersFrom(wide: DataFrame): DataFrame =
    wide.where(col("is_speaker"))
      .select("conv_id", "turn_idx", "ts", "kind", "v_first", "v_last")

  /** Speaker view CARRYING the co-row case fields: the wide table is one
    * row per turn, so a turn's speaker mention and case mention are the
    * same row — the pipeline zaak-links these columns in place (broadcast
    * tiers) and threads them through the person-link argmax, making the
    * DISCUSSES derivation join-free (Pipeline.build).
    */
  def speakersWithCaseFrom(wide: DataFrame): DataFrame =
    wide.where(col("is_speaker"))
      .select(col("conv_id"), col("turn_idx"), col("ts"), col("kind"),
        col("v_first"), col("v_last"),
        col("dossier_nr"),
        when(col("is_case"), col("stuk_nr")).as("stuk_nr"))

  /** Case-mention view (reference xml_extractor.py:194-217). */
  def casesFrom(wide: DataFrame): DataFrame =
    wide.where(col("is_case"))
      .select("conv_id", "turn_idx", "ts", "dossier_nr", "toevoeging", "stuk_nr")

  /** Vote-utterance view (reference xml_extractor.py:219-257). */
  def votesFrom(wide: DataFrame): DataFrame =
    wide.where(col("is_vote"))
      .select("conv_id", "turn_idx", "ts", "fractie_naam", "vote_norm")

  /** Speaker mentions: four surface patterns. Output: (conv_id, turn_idx,
    * ts, kind, v_first, v_last) with v_first = '' when the surface form
    * carries no first name.
    */
  def speakerMentions(turns: DataFrame): DataFrame =
    speakersFrom(mentionsWide(turns))

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
  def caseMentions(turns: DataFrame): DataFrame =
    casesFrom(mentionsWide(turns))

  /** Fractie vote utterances → normalized votes —
    * reference xml_extractor.py:219-257 (+ vote normalization :244).
    */
  def voteMentions(turns: DataFrame): DataFrame =
    votesFrom(mentionsWide(turns))
}
