package graft

import java.io.File
import graft.extract.XmlSource
import graft.link.Link
import graft.matching.ActivityMatch

/** S4 parity: run the REAL reference corpus (sample_vlos_*.xml, the gold
  * files behind the published 137/137 speaker match rate —
  * docs/comprehensive-parliamentary-analysis-system.md:175-178) through the
  * PRODUCTION XML source module (graft.extract.XmlSource: binaryFile glob →
  * distributed DOM parse → typed streams) and the Spark linker. The
  * reference resolves speakers against the live TK-API (unavailable here);
  * the per-file speaker dictionary stands in. BOM handling comes free via
  * the parser's InputStream encoding detection.
  */
class XmlFixtureSpec extends SparkSpec {

  private val RefDir = "/root/reference"

  private def haveSamples: Boolean =
    new File(RefDir).listFiles() != null &&
      new File(RefDir).listFiles().exists(_.getName.startsWith("sample_vlos_"))

  private def fileRows = XmlSource.files(spark, RefDir, "sample_vlos_*.xml")

  test("XmlSource over the full sample corpus: every XML speaker links (100% match rate)") {
    assume(haveSamples, "reference samples not present")
    val mentions = XmlSource.speakerMentions(fileRows)
    val dict = XmlSource.speakerDict(fileRows)
    val nMentions = mentions.count()
    assert(nMentions > 0, "no speakers parsed from the sample corpus")
    val linked = Link.linkPersons(mentions, dict)
    // reference parity: 100% speaker match rate on the sample corpus
    assert(linked.count() == nMentions,
      s"${linked.count()} of $nMentions speakers linked")
    assert(linked.where(org.apache.spark.sql.functions.col("score") <
      Link.MinSpeakerScore).isEmpty)
  }

  test("XmlSource activities over ALL 14 sample files: timed activities self-match EXACT") {
    assume(haveSamples, "reference samples not present")
    import org.apache.spark.sql.functions._
    val acts = XmlSource.activities(fileRows)
    val n = acts.count()
    assert(n > 0, "no timed activities parsed")
    // activity-match smoke on the whole corpus: each activity offered as its
    // own candidate must self-match EXACT and accepted
    val cand = acts.select(
      col("conv_id"), col("xml_id").as("cand_idx"),
      col("x_beg_us").as("a_beg_us"), col("x_end_us").as("a_end_us"),
      col("x_soort").as("a_soort"), col("x_topic").as("a_topic"))
    val matched = ActivityMatch.matchActivities(acts, cand)
      .where(col("accepted") && col("match_type") === graft.model.MatchType.Exact)
    assert(matched.count() == n, s"${matched.count()} of $n activities self-matched")
    // the corpus spans multiple files — the parse really is per-file
    assert(acts.select("conv_id").distinct().count() >= 2)
  }

  test("XmlSource zaak refs: dossier numbers split into the F5 (nr, toevoeging) shape") {
    assume(haveSamples, "reference samples not present")
    val refs = XmlSource.zaakRefs(fileRows).collect()
    // at least one sample carries a dossiernummer element
    assert(refs.nonEmpty, "no dossier refs parsed")
    refs.foreach { r =>
      assert(r.getAs[Int]("dossier_nr") > 0)
      assert(r.getAs[String]("toevoeging") != null)
    }
  }

  test("XmlSource vote extraction is schema-stable on a corpus without stemmingen") {
    assume(haveSamples, "reference samples not present")
    val votes = XmlSource.voteMentions(fileRows)
    assert(votes.columns.toSeq ==
      Seq("conv_id", "turn_idx", "fractie_naam", "vote_norm"))
    assert(votes.count() == 0) // samples carry no stemming elements
  }
}
