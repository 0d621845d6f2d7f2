package graft

import java.sql.Timestamp
import graft.extract.Extract
import graft.link.Link
import graft.model.MatchType

/** Extraction + linking semantics over an adversarial inline fixture:
  * near-duplicate surnames, tussenvoegsel forms, fuzzy thresholds at the
  * 60/75/90 boundaries (FIXTURES.md §3 edge cases).
  */
class ExtractLinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  private def turnsDf(rows: (String, Int, String)*) =
    rows.map { case (c, i, t) => (c, i, "member", t, null.asInstanceOf[String], ts(i)) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  // adversarial dictionary: Jansen vs Janssen near-dup, tussenvoegsel, Hendriks
  private val dict = Seq(
    ("P1", "Anna", "", "Jansen", "Anna Maria", "F1"),
    ("P2", "Bram", "", "Janssen", "Bram Jan", "F2"),
    ("P3", "Pieter", "van der", "Berg", "Pieter Cornelis", "F1"),
    ("P4", "Tim", "", "Hendriks", "Tim Jacob", "F2")
  ).toDF("persoon_id", "roepnaam", "tussenvoegsel", "achternaam", "voornamen", "fractie_id")

  test("procedural turns are filtered before extraction") {
    val t = turnsDf(
      ("c1", 0, "Opening van de vergadering"),
      ("c1", 1, "De voorzitter geeft het woord aan Anna Jansen"),
      ("c1", 2, "Sluiting van de vergadering"))
    val m = Extract.speakerMentions(t).collect()
    assert(m.length == 1 && m.head.getAs[String]("v_last") == "Jansen")
  }

  test("speaker mention surfaces: full name vs surname-only") {
    val t = turnsDf(
      ("c1", 0, "De voorzitter geeft het woord aan Pieter van der Berg"),
      ("c1", 1, "Mevrouw Jansen spreekt over dossier 36001 nr. 2"),
      ("c1", 2, "De heer Hendriks interrumpeert de spreker"))
    val m = Extract.speakerMentions(t).orderBy("turn_idx").collect()
    assert(m(0).getAs[String]("v_first") == "Pieter")
    assert(m(0).getAs[String]("v_last") == "van der Berg")
    assert(m(1).getAs[String]("v_first") == "")
    assert(m(1).getAs[String]("v_last") == "Jansen")
    assert(m(2).getAs[String]("v_last") == "Hendriks")
  }

  test("exact surname block: near-duplicate surname is NOT a candidate when exact block hits") {
    // reference semantics: exact `Achternaam eq` search first; fallback only
    // when the exact search yields nothing (api_extractor.py:148-168)
    val t = turnsDf(("c1", 0, "Mevrouw Jansen spreekt over dossier 36001 nr. 2"))
    val linked = Link.linkPersons(Extract.speakerMentions(t), dict).collect()
    assert(linked.length == 1)
    assert(linked.head.getAs[String]("persoon_id") == "P1")
    assert(linked.head.getAs[Int]("score") == 60) // surname only, no first name
    assert(linked.head.getAs[String]("match_type") == MatchType.Fuzzy) // < 90
  }

  test("full name with roepnaam reaches EXACT (>=90)") {
    val t = turnsDf(("c1", 0, "De voorzitter geeft het woord aan Pieter van der Berg"))
    val linked = Link.linkPersons(Extract.speakerMentions(t), dict).collect()
    assert(linked.head.getAs[String]("persoon_id") == "P3")
    assert(linked.head.getAs[Int]("score") == 100) // 60 surname + 40 first
    assert(linked.head.getAs[String]("match_type") == MatchType.Exact)
  }

  test("contains-fallback tier: truncated surname links fuzzily") {
    // 'Hendrik' has no exact block; fallback contains-join finds Hendriks:
    // surname part = ratio(hendrik, hendriks) - 20 = 93 - 20 = 73
    val t = turnsDf(("c1", 0, "De heer Hendrik interrumpeert de spreker"))
    val linked = Link.linkPersons(Extract.speakerMentions(t), dict).collect()
    assert(linked.length == 1)
    assert(linked.head.getAs[String]("persoon_id") == "P4")
    assert(linked.head.getAs[Int]("score") == 73)
    assert(linked.head.getAs[String]("match_type") == MatchType.Fuzzy)
  }

  test("fallback tier golden vectors: first-name-less mention scores through nameScore; accept boundary at ratio 80") {
    // The reference fallback (api_extractor.py:157-168) pushes contains-
    // candidates through the SAME calculate_name_similarity + >=60 gate as
    // tier 1 (_calculate_best_persoon_match, api_extractor.py:289-301) —
    // there is no flat fallback score. With v_first empty the score is
    // ratio(last, bare) - 20, so the accept boundary is ratio == 80 exactly.
    val d = Seq(("P7", "Wil", "", "Woldering", "Willem", "F1"))
      .toDF("persoon_id", "roepnaam", "tussenvoegsel", "achternaam", "voornamen", "fractie_id")
    // ratio("dering","woldering") = (1 - 3/15)*100 = 80 -> score 60, accepted
    val accept = turnsDf(("c1", 0, "De heer Dering interrumpeert de spreker"))
    val a = Link.linkPersons(Extract.speakerMentions(accept), d).collect()
    assert(a.length == 1 && a.head.getAs[String]("persoon_id") == "P7")
    assert(a.head.getAs[Int]("score") == 60)
    assert(a.head.getAs[String]("match_type") == MatchType.Fuzzy)
    // ratio("ring","woldering") = (1 - 5/13)*100 ~= 62 -> score 42, dropped
    val reject = turnsDf(("c1", 0, "De heer Ring interrumpeert de spreker"))
    assert(Link.linkPersons(Extract.speakerMentions(reject), d).isEmpty)
  }

  test("medium first-name band adds +20 (60<=ratio<75)") {
    // 'Tmi' vs 'Tim': ratio 67 -> +20; surname exact 60 -> 80 total
    val t = turnsDf(("c1", 0, "De voorzitter geeft het woord aan Tmi Hendriks"))
    val linked = Link.linkPersons(Extract.speakerMentions(t), dict).collect()
    assert(linked.head.getAs[Int]("score") == 80)
  }

  test("deterministic tie-break: equal scores resolve by persoon_id asc") {
    val dupDict = Seq(
      ("P9", "Aa", "", "Smit", "Aa", "F1"),
      ("P8", "Bb", "", "Smit", "Bb", "F1")
    ).toDF("persoon_id", "roepnaam", "tussenvoegsel", "achternaam", "voornamen", "fractie_id")
    val t = turnsDf(("c1", 0, "Mevrouw Smit spreekt over dossier 36001 nr. 2"))
    val linked = Link.linkPersons(Extract.speakerMentions(t), dupDict).collect()
    assert(linked.length == 1 && linked.head.getAs[String]("persoon_id") == "P8")
  }

  test("contains-fallback volume cap: over-threshold residual fails loudly, default cap passes") {
    // 'Qqqzzz' misses every exact surname block -> 1 residual mention;
    // dictionary has 4 rows -> 1 x 4 = 4 comparisons > cap 2 must THROW
    // before the contains-NLJ runs (a dirty corpus degrades loudly, not
    // quadratically)
    val t = turnsDf(("c1", 0, "Mevrouw Qqqzzz spreekt over dossier 36001 nr. 2"))
    val mentions = Extract.speakerMentions(t)
    val ex = intercept[Exception] {
      Link.linkPersons(mentions, dict, Nil, None,
        maxFallbackComparisons = 2L).collect()
    }
    def messages(e: Throwable): List[String] =
      if (e == null) Nil
      else String.valueOf(e.getMessage) :: messages(e.getCause)
    assert(messages(ex).exists(_.contains("maxFallbackComparisons")),
      s"expected the volume-cap message, got: ${messages(ex)}")
    // same corpus under the default cap: the guard stays silent (the
    // residual simply scores below MinSpeakerScore and drops)
    assert(Link.linkPersons(mentions, dict).collect().isEmpty)
  }

  test("case mention extraction: dossier+stuk and dossier-toevoeging forms") {
    val t = turnsDf(
      ("c1", 0, "Mevrouw Jansen spreekt over dossier 36001 nr. 2"),
      ("c1", 1, "Aan de orde is dossier 36725-VI"))
    val m = Extract.caseMentions(t).orderBy("turn_idx").collect()
    assert(m(0).getAs[Int]("dossier_nr") == 36001 && m(0).getAs[Int]("stuk_nr") == 2)
    assert(m(1).getAs[Int]("dossier_nr") == 36725)
    assert(m(1).getAs[String]("toevoeging") == "VI")
    assert(m(1).isNullAt(m(1).fieldIndex("stuk_nr")))
  }

  test("zaak tier cascade: tier1 exact, tier2 dossier fallback, tier3 document, no-match") {
    val zaken = Seq(("Z1", 36001, "", 2, "ond")).toDF("zaak_id", "dossier_nr", "toevoeging", "stuk_nr", "onderwerp")
    val dossiers = Seq((36001, "", "t"), (36002, "VI", "t")).toDF("dossier_nr", "toevoeging", "titel")
    val docs = Seq((36003, 5, "t")).toDF("dossier_nr", "volgnummer", "titel")
    val mentions = Seq(
      ("c1", 0, 36001, "", Some(2)), // tier 1
      ("c1", 1, 36002, "VI", Some(9)), // tier 2
      ("c1", 2, 36003, "", Some(5)), // tier 3
      ("c1", 3, 36099, "", Some(1)) // no match
    ).toDF("conv_id", "turn_idx", "dossier_nr", "toevoeging", "stuk_nr")
    val linked = Link.linkZaken(mentions, zaken, dossiers, docs).orderBy("turn_idx").collect()
    assert(linked(0).getAs[String]("entity_id") == "Z1" && linked(0).getAs[Int]("score") == 100
      && linked(0).getAs[String]("match_type") == MatchType.Exact)
    assert(linked(1).getAs[String]("entity_id") == "D36002" && linked(1).getAs[Int]("score") == 75
      && linked(1).getAs[String]("match_type") == MatchType.Fallback)
    assert(linked(2).getAs[String]("entity_id") == "DOC36003-5" && linked(2).getAs[Int]("score") == 60)
    assert(linked(3).isNullAt(linked(3).fieldIndex("entity_id"))
      && linked(3).getAs[String]("match_type") == MatchType.NoMatch)
  }

  test("speaker dedup keeps first seen per conversation (A13)") {
    val t = turnsDf(
      ("c1", 0, "Mevrouw Jansen spreekt over dossier 36001 nr. 2"),
      ("c1", 5, "Mevrouw Jansen spreekt over dossier 36002 nr. 3"),
      ("c2", 1, "Mevrouw Jansen spreekt over dossier 36001 nr. 2"))
    val d = Extract.dedupSpeakers(Extract.speakerMentions(t)).collect()
    assert(d.length == 2)
    assert(d.filter(_.getAs[String]("conv_id") == "c1").head.getAs[Int]("turn_idx") == 0)
  }

  test("vote mention extraction and normalization") {
    val t = turnsDf(
      ("c1", 0, "De fractie GroenLinks stemt tegen"),
      ("c1", 1, "De fractie Volt stemt onthouding"))
    val v = Extract.voteMentions(t).orderBy("turn_idx").collect()
    assert(v(0).getAs[String]("fractie_naam") == "GroenLinks")
    assert(v(0).getAs[String]("vote_norm") == "tegen")
    assert(v(1).getAs[String]("vote_norm") == "onthouding")
  }
}
