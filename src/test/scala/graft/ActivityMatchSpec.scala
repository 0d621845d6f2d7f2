package graft

import graft.matching.ActivityMatch
import graft.model.MatchType

/** Activity-match scoring tiers (time/soort/topic), candidate cap, argmax,
  * and the runner-up margin acceptance rule — reference
  * activity_matcher.py:93-265 semantics at ×2 integer weights.
  */
class ActivityMatchSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000 // 1h in micros

  private def xml(topic: String = "Debat over de begroting", soort: String = "debat") =
    Seq(("c1", 0, 0L, 2 * H, soort, topic))
      .toDF("conv_id", "xml_id", "x_beg_us", "x_end_us", "x_soort", "x_topic")

  private def cands(rows: (Int, Long, Long, String, String)*) =
    rows.map { case (i, b, e, s, t) => ("c1", i, b, e, s, t) }
      .toDF("conv_id", "cand_idx", "a_beg_us", "a_end_us", "a_soort", "a_topic")

  private def one(df: org.apache.spark.sql.DataFrame) = {
    val rows = df.collect(); assert(rows.length == 1); rows.head
  }

  test("full match: close start + exact soort + exact normalized topic = 18, EXACT") {
    // topic normalization strips the 'debat over' prefix on the xml side
    val r = one(ActivityMatch.matchActivities(
      xml(), cands((0, 100L * 1000000, 2 * H, "debat", "De begroting"))))
    assert(r.getAs[Int]("score_x2") == 18)
    assert(r.getAs[Boolean]("accepted"))
    assert(r.getAs[String]("match_type") == MatchType.Exact)
  }

  test("overlap-only time tier scores +3 (not +6)") {
    // starts 1000s late (outside ±300s) but overlaps within the buffer
    val r = one(ActivityMatch.matchActivities(
      xml(), cands((0, 1000L * 1000000, 3 * H, "debat", "De begroting"))))
    assert(r.getAs[Int]("score_x2") == 3 + 4 + 8)
  }

  test("soort containment tiers: xml in api (+4) vs api in xml (+3)") {
    val a = one(ActivityMatch.matchActivities(
      xml(soort = "debat"), cands((0, 0L, 2 * H, "plenair debat", "x"))))
    assert(a.getAs[Int]("score_x2") == 6 + 4) // xml 'debat' ⊂ api
    val b = one(ActivityMatch.matchActivities(
      xml(soort = "plenair debat"), cands((0, 0L, 2 * H, "debat", "x"))))
    assert(b.getAs[Int]("score_x2") == 6 + 3) // api 'debat' ⊂ xml
  }

  test("fuzzy topic bands: >=85 scores +5, >=70 scores +4, below scores 0") {
    // 'de begroting 2026' vs 'de begroting 2025': ratio 94 -> +5
    val hi = one(ActivityMatch.matchActivities(
      xml(topic = "de begroting 2026"),
      cands((0, 0L, 2 * H, "overleg", "de begroting 2025"))))
    assert(hi.getAs[Int]("score_x2") == 6 + 0 + 5)
    // 'de begroting' vs 'de begroeting xyz a': LCS 12, ratio 200*12/31=77 -> +4
    val mid = one(ActivityMatch.matchActivities(
      xml(topic = "de begroting"),
      cands((0, 0L, 2 * H, "overleg", "de begroeting xyz a"))))
    assert(mid.getAs[Int]("score_x2") == 6 + 0 + 4)
    val lo = one(ActivityMatch.matchActivities(
      xml(topic = "de begroting"),
      cands((0, 0L, 2 * H, "overleg", "stemmingen kamer vandaag"))))
    assert(lo.getAs[Int]("score_x2") == 6)
  }

  test("margin acceptance: score < 6 accepted only with >= 2 lead over runner-up") {
    // two candidates at 3 and 3 (overlap only): tie, margin 0 -> rejected
    val tie = one(ActivityMatch.matchActivities(xml(topic = "zzz"), cands(
      (0, 1000L * 1000000, 3 * H, "xyz", "qqq"),
      (1, 1000L * 1000000, 3 * H, "abc", "rrr"))))
    assert(!tie.getAs[Boolean]("accepted"))
    assert(tie.getAs[String]("match_type") == MatchType.NoMatch)
    // candidates at 3 and 0: margin 3 >= 2 and score >= 2 -> accepted FUZZY
    val margin = one(ActivityMatch.matchActivities(xml(topic = "zzz"), cands(
      (0, 1000L * 1000000, 3 * H, "xyz", "qqq"),
      (1, 100 * H, 101 * H, "abc", "rrr"))))
    assert(margin.getAs[Boolean]("accepted"))
    assert(margin.getAs[Int]("cand_idx") == 0)
    assert(margin.getAs[String]("match_type") == MatchType.Fuzzy)
  }

  test("deterministic tie-break on cand_idx; candidate cap respected") {
    val r = one(ActivityMatch.matchActivities(
      xml(), cands(
        (5, 0L, 2 * H, "debat", "De begroting"),
        (2, 0L, 2 * H, "debat", "De begroting")), maxCandidates = 1))
    assert(r.getAs[Int]("cand_idx") == 2) // equal scores -> lowest idx wins
    assert(r.getAs[Int]("runner_x2") == 0) // cap=1 leaves no runner-up
  }
}
