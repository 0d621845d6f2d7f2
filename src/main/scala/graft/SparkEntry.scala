package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extract
import graft.functions.FuzzRatio
import graft.link.Link
import graft.oracle.OracleSql
import graft.synth.{Dict, TranscriptGen}

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with a DuckDB-equivalent `oracleSql` for every
  * SQL-expressible one. Results are deterministically ordered on both sides.
  */
object SparkEntry {

  private def init(spark: SparkSession): SparkSession = {
    FuzzRatio.register(spark)
    spark
  }

  private def turns(spark: SparkSession, dir: String): DataFrame =
    TranscriptGen.transcripts(init(spark), dir)

  /** Flagship: full mention→link slice on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val t = turns(spark, dir)
    Link.linkPersons(Extract.speakerMentions(t), Dict.personsDf(spark))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/P1/P2 + A-family: pruned scan + aggregation (pushdown visible in plan)
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          bround(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // The synthesized input table itself (gate: generator parity with oracle)
    "kg_transcripts" -> ((s, dir) => {
      turns(s, dir)
        .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
          col("tool"), unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .orderBy("conv_id", "turn_idx")
    }),

    // Extract: speaker mentions (P4, P5, F3-F4 surfaces)
    "kg_speaker_mentions" -> ((s, dir) => {
      Extract.speakerMentions(turns(s, dir))
        .select("conv_id", "turn_idx", "kind", "v_first", "v_last")
        .orderBy("conv_id", "turn_idx")
    }),

    // Extract: case mentions (F5/F6 dossier-code split)
    "kg_case_mentions" -> ((s, dir) => {
      Extract.caseMentions(turns(s, dir))
        .select("conv_id", "turn_idx", "dossier_nr", "toevoeging", "stuk_nr")
        .orderBy("conv_id", "turn_idx")
    }),

    // Extract: vote utterances (F10)
    "kg_vote_mentions" -> ((s, dir) => {
      Extract.voteMentions(turns(s, dir))
        .select("conv_id", "turn_idx", "fractie_naam", "vote_norm")
        .orderBy("conv_id", "turn_idx")
    }),

    // Link: person entity linking (J1/J2 broadcast block join, W3 argmax, §2.9 scoring)
    "kg_link_persons" -> ((s, dir) => {
      Link.linkPersons(Extract.speakerMentions(turns(s, dir)), Dict.personsDf(s))
        .select("conv_id", "turn_idx", "v_first", "v_last", "persoon_id",
          "fractie_id", "score", "match_type")
        .orderBy("conv_id", "turn_idx", "v_last")
    }),

    // Link: zaak 3-tier fallback cascade (J4-J6)
    "kg_link_zaken" -> ((s, dir) => {
      Link.linkZaken(Extract.caseMentions(turns(s, dir)),
          Dict.zakenDf(s), Dict.dossiersDf(s), Dict.documentsDf(s))
        .select("conv_id", "turn_idx", "dossier_nr", "stuk_nr", "entity_id",
          "score", "match_type")
        .orderBy("conv_id", "turn_idx", "dossier_nr")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "kg_transcripts" -> OracleSql.withCtes()(
      """SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
        |FROM transcripts ORDER BY conv_id, turn_idx""".stripMargin),

    "kg_speaker_mentions" -> OracleSql.withCtes(OracleSql.speakerMentionsCte)(
      """SELECT conv_id, turn_idx, kind, v_first, v_last
        |FROM speaker_mentions ORDER BY conv_id, turn_idx""".stripMargin),

    "kg_case_mentions" -> OracleSql.withCtes(OracleSql.caseMentionsCte)(
      """SELECT conv_id, turn_idx, dossier_nr, toevoeging, stuk_nr
        |FROM case_mentions ORDER BY conv_id, turn_idx""".stripMargin),

    "kg_vote_mentions" -> OracleSql.withCtes(OracleSql.voteMentionsCte)(
      """SELECT conv_id, turn_idx, fractie_naam, vote_norm
        |FROM vote_mentions ORDER BY conv_id, turn_idx""".stripMargin),

    "kg_link_persons" -> OracleSql.withCtes(
      OracleSql.speakerMentionsCte, OracleSql.linkPersonsCte)(
      """SELECT conv_id, turn_idx, v_first, v_last, persoon_id, fractie_id, score, match_type
        |FROM linked_persons ORDER BY conv_id, turn_idx, v_last""".stripMargin),

    "kg_link_zaken" -> OracleSql.withCtes(
      (OracleSql.caseMentionsCte +: OracleSql.zakenCtes :+ OracleSql.linkZakenCte): _*)(
      """SELECT conv_id, turn_idx, dossier_nr, stuk_nr, entity_id, score, match_type
        |FROM linked_zaken ORDER BY conv_id, turn_idx, dossier_nr""".stripMargin)
  )
}
