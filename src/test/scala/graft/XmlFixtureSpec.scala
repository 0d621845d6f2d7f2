package graft

import java.io.File
import javax.xml.parsers.DocumentBuilderFactory
import scala.jdk.CollectionConverters._
import org.w3c.dom.Element
import graft.link.Link
import graft.matching.ActivityMatch

/** S4 parity smoke: run the REAL reference corpus (sample_vlos_*.xml, the
  * gold files behind the published 137/137 speaker match rate —
  * docs/comprehensive-parliamentary-analysis-system.md:175-178) through the
  * Spark linker. A minimal JDK-DOM extractor stands in for the reference's
  * lxml layer (xml_extractor.py): `spreker` elements become mentions, their
  * distinct set becomes the dictionary (the reference resolves them against
  * the live TK-API, unavailable here), `activiteit` elements become
  * activities. BOM handling comes free via InputStream encoding detection.
  */
class XmlFixtureSpec extends SparkSpec {
  import spark.implicits._

  private def samples: Seq[File] =
    new File("/root/reference").listFiles()
      .filter(f => f.getName.startsWith("sample_vlos_") && f.getName.endsWith(".xml"))
      .sortBy(_.getName).take(2).toSeq

  private def parse(f: File) = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    dbf.newDocumentBuilder().parse(f)
  }

  private def elems(doc: org.w3c.dom.Document, tag: String): Seq[Element] = {
    val nl = doc.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def childText(e: Element, tag: String): String = {
    val nl = e.getElementsByTagName(tag)
    if (nl.getLength == 0) "" else nl.item(0).getTextContent.trim
  }

  test("real VLOS sample files: every XML speaker links against the file's own dictionary") {
    assume(samples.nonEmpty, "reference samples not present")
    samples.foreach { f =>
      val doc = parse(f)
      val sprekers = elems(doc, "spreker").map { e =>
        (e.getAttribute("objectid"), childText(e, "voornaam"),
          childText(e, "achternaam"), childText(e, "fractie"))
      }.filter(s => s._3.nonEmpty)
      assert(sprekers.nonEmpty, s"${f.getName}: no sprekers parsed")

      val mentions = sprekers.zipWithIndex.map { case (s, i) =>
        (f.getName.take(18), i, s._2, s._3)
      }.toDF("conv_id", "turn_idx", "v_first", "v_last")
      val dict = sprekers.map(s => (s._1, s._2, "", s._3, s._2, s._4))
        .distinct
        .toDF("persoon_id", "roepnaam", "tussenvoegsel", "achternaam",
          "voornamen", "fractie_id")

      val linked = Link.linkPersons(mentions, dict)
      // reference parity: 100% speaker match rate on the sample corpus
      assert(linked.count() == mentions.count(),
        s"${f.getName}: ${linked.count()} of ${mentions.count()} speakers linked")
      assert(linked.where($"score" < Link.MinSpeakerScore).isEmpty)
    }
  }

  test("real VLOS sample files: activities extract and self-match EXACT") {
    assume(samples.nonEmpty, "reference samples not present")
    val f = samples.head
    val doc = parse(f)
    val acts = elems(doc, "activiteit").map { e =>
      (e.getAttribute("objectid"), e.getAttribute("soort"),
        childText(e, "onderwerp"), childText(e, "aanvangstijd"), childText(e, "eindtijd"))
    }.filter(a => a._4.nonEmpty && a._5.nonEmpty)
    assert(acts.nonEmpty, s"${f.getName}: no timed activities parsed")

    def us(ts: String): Long =
      java.time.LocalDateTime.parse(ts).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val xml = acts.zipWithIndex.map { case (a, i) =>
      ("c1", i, us(a._4), us(a._5), a._2, a._3)
    }.toDF("conv_id", "xml_id", "x_beg_us", "x_end_us", "x_soort", "x_topic")
    val cand = acts.zipWithIndex.map { case (a, i) =>
      ("c1", i, us(a._4), us(a._5), a._2, a._3)
    }.toDF("conv_id", "cand_idx", "a_beg_us", "a_end_us", "a_soort", "a_topic")

    val matched = ActivityMatch.matchActivities(xml, cand)
      .where($"accepted" && $"match_type" === graft.model.MatchType.Exact)
    // same-time same-soort same-topic candidates must self-match EXACT
    assert(matched.count() == acts.length.toLong)
  }

  test("real VLOS sample files: zaak/dossier references extract when present") {
    assume(samples.nonEmpty, "reference samples not present")
    val refs = samples.flatMap { f =>
      elems(parse(f), "dossiernummer").map(_.getTextContent.trim).filter(_.nonEmpty)
    }
    // at least one of the first two samples carries a dossiernummer element;
    // all parsed refs must be numeric-codable (the F5 regex shape)
    refs.foreach(r => assert(r.matches("\\d+(?:[-\\s]?[A-Za-z0-9]+)?"), s"bad ref: $r"))
  }
}
