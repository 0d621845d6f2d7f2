package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic transcript synthesizer.
  *
  * Produces the input table of the north rule —
  * `(conv_id:string, turn_idx:int, role:string, text:string, tool:string, ts:timestamp)`
  * — derived *arithmetically* from the driver-generated `events` parquet
  * (TESTDATA.md), so that
  *   (a) the same job scales with the scale factor (sf0.001 → sf0.1 → beyond), and
  *   (b) a DuckDB oracle CTE (`transcriptsSql`) reproduces it bit-for-bit,
  *       which lets the driver hash-verify every downstream pipeline stage.
  *
  * Turn texts embed the mention types the reference extracts from VLOS XML:
  * speaker mentions (xml_extractor.py:118-192), case/dossier mentions
  * (:194-217), fractie vote utterances (:219-257), and procedural turns
  * that must be filtered (:69-83). Conversation = `events.user_id`;
  * turn order = `event_id` within conversation (ts is monotone in event_id,
  * giving the stable `(conv_id, turn_idx)` ordering invariant).
  */
object TranscriptGen {

  /** Spark-side generator. Narrow ops only (one shuffle for the per-conv
    * row_number, which is also the natural partitioning every downstream
    * per-conversation stage reuses).
    */
  def transcripts(spark: SparkSession, sfDir: String): DataFrame = {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val p = broadcast(Dict.personsDf(spark))
    val f = broadcast(Dict.fractiesDf(spark))

    val e = col("event_id")
    val base = events
      .join(p, p("idx") === (e % Dict.persons.size).cast("int"))
      .drop(p("idx"))
      .join(f, f("idx") === (e % Dict.fracties.size).cast("int"))
      .drop(f("idx"))

    val surname = concat_ws(" ",
      when(col("tussenvoegsel") === "", null).otherwise(col("tussenvoegsel")),
      col("achternaam"))
    val dispName = concat_ws(" ", col("roepnaam"), surname)
    val dnr = (lit(Dict.DossierBase) + (e % Dict.NDossiers)).cast("int").cast("string")
    val snr = (lit(1) + (e % Dict.NStuk)).cast("int").cast("string")
    val toev = element_at(lit(Dict.Toevoegingen.toArray), ((e % 4) + 1).cast("int"))
    val vote = element_at(lit(Array("voor", "voor", "tegen", "onthouding")),
      ((floor(e / 10) % 4) + 1).cast("int"))

    val text =
      when(e % 10 === 0, lit("Opening van de vergadering"))
        .when(e % 10 === 1, lit("Sluiting van de vergadering"))
        .when(e % 10 === 2, concat(lit("De voorzitter geeft het woord aan "), dispName))
        .when(e % 10 === 3, concat(lit("Mevrouw "), surname,
          lit(" spreekt over dossier "), dnr, lit(" nr. "), snr))
        .when(e % 10 === 4, concat(lit("De heer "), surname,
          lit(" interrumpeert de spreker")))
        .when(e % 10 === 5, concat(lit("De fractie "), col("naam"), lit(" stemt "), vote))
        .when(e % 10 === 6, concat(lit("Aan de orde is dossier "), dnr, lit("-"), toev))
        .when(e % 10 === 7, lit("Wij bespreken vandaag het wetsvoorstel in detail"))
        .when(e % 10 === 8, concat(dispName, lit(" vraagt een reactie over dossier "),
          dnr, lit(" nr. "), snr))
        .otherwise(lit("De vergadering wordt geschorst voor een korte pauze"))

    val role = when(col("event_type") === "signup", "chair")
      .when(col("event_type") === "purchase", "member")
      .when(col("event_type") === "view", "member")
      .when(col("event_type") === "error", "user")
      .otherwise("assistant")

    val tool = when(e % 7 === 0, "search").when(e % 7 === 3, "vote").otherwise(lit(null))

    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    base.select(
      concat(lit("c"), col("user_id").cast("string")).as("conv_id"),
      (row_number().over(w) - 1).as("turn_idx"),
      role.as("role"),
      text.as("text"),
      tool.cast("string").as("tool"),
      col("ts"))
  }

  /** DuckDB CTE reproducing `transcripts` exactly (same literals via Dict). */
  def transcriptsSql: String = {
    val np = Dict.persons.size
    val nf = Dict.fracties.size
    val toevCase = "CASE e % 4 " + Dict.Toevoegingen.zipWithIndex
      .map { case (t, i) => s"WHEN $i THEN '$t'" }.mkString(" ") + " END"
    s"""${Dict.personsSql},
       |${Dict.fractiesSql},
       |transcripts AS (
       |  SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY e) - 1 AS INT) AS turn_idx,
       |         CASE event_type WHEN 'signup' THEN 'chair' WHEN 'purchase' THEN 'member'
       |              WHEN 'view' THEN 'member' WHEN 'error' THEN 'user' ELSE 'assistant' END AS role,
       |         CASE e % 10
       |           WHEN 0 THEN 'Opening van de vergadering'
       |           WHEN 1 THEN 'Sluiting van de vergadering'
       |           WHEN 2 THEN 'De voorzitter geeft het woord aan ' || disp
       |           WHEN 3 THEN 'Mevrouw ' || surname || ' spreekt over dossier ' || dnr || ' nr. ' || snr
       |           WHEN 4 THEN 'De heer ' || surname || ' interrumpeert de spreker'
       |           WHEN 5 THEN 'De fractie ' || naam || ' stemt ' || vote
       |           WHEN 6 THEN 'Aan de orde is dossier ' || dnr || '-' || $toevCase
       |           WHEN 7 THEN 'Wij bespreken vandaag het wetsvoorstel in detail'
       |           WHEN 8 THEN disp || ' vraagt een reactie over dossier ' || dnr || ' nr. ' || snr
       |           ELSE 'De vergadering wordt geschorst voor een korte pauze'
       |         END AS text,
       |         CASE WHEN e % 7 = 0 THEN 'search' WHEN e % 7 = 3 THEN 'vote' ELSE NULL END AS tool,
       |         ts
       |  FROM (
       |    SELECT ev.event_id AS e, ev.ts, ev.user_id, ev.event_type, fr.naam,
       |           concat_ws(' ', nullif(p.tussenvoegsel, ''), p.achternaam) AS surname,
       |           concat_ws(' ', p.roepnaam, nullif(p.tussenvoegsel, ''), p.achternaam) AS disp,
       |           CAST(${Dict.DossierBase} + ev.event_id % ${Dict.NDossiers} AS VARCHAR) AS dnr,
       |           CAST(1 + ev.event_id % ${Dict.NStuk} AS VARCHAR) AS snr,
       |           CASE (ev.event_id // 10) % 4 WHEN 0 THEN 'voor' WHEN 1 THEN 'voor'
       |                WHEN 2 THEN 'tegen' ELSE 'onthouding' END AS vote
       |    FROM events ev
       |    JOIN persons p ON p.idx = CAST(ev.event_id % $np AS INT)
       |    JOIN fracties fr ON fr.idx = CAST(ev.event_id % $nf AS INT)))""".stripMargin
  }
}
