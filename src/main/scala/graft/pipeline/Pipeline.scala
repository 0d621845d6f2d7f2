package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.canonicalize.Canonicalize
import graft.extract.Extract
import graft.link.Link
import graft.synth.Dict
import graft.triples.Triples

/** End-to-end pipeline facade: extract → link → triples → canonicalize.
  * The stage DAG mirrors the reference's loader ordering
  * (src/loaders/loader_manager.py:118-225): dimensions first (broadcast
  * dims feed the link stage), then the analysis pipeline.
  *
  * `linkedPersons` feeds three consumers (triples, interruptions via
  * Triples.all, CC edges) — it is persisted once per run so the
  * extract+link work is not recomputed per branch.
  */
object Pipeline {

  final case class Stages(
      turns: DataFrame,
      linkedPersons: DataFrame,
      linkedZaken: DataFrame,
      votes: DataFrame,
      triples: DataFrame,
      canonical: DataFrame)

  def build(spark: SparkSession, turns: DataFrame): Stages = {
    val linkedPersons =
      Link.linkPersons(Extract.speakerMentions(turns), Dict.personsDf(spark)).cache()
    val linkedZaken = Link.linkZaken(Extract.caseMentions(turns),
      Dict.zakenDf(spark), Dict.dossiersDf(spark), Dict.documentsDf(spark))
    val votes = Extract.voteMentions(turns)
    val triples = Triples.all(linkedPersons, linkedZaken, votes,
      Dict.personsDf(spark), Dict.fractiesDf(spark))
    val canonMap = Canonicalize.canonicalMap(Canonicalize.components(linkedPersons))
    val canonical = Canonicalize.rewrite(triples, canonMap)
    Stages(turns, linkedPersons, linkedZaken, votes, triples, canonical)
  }
}
