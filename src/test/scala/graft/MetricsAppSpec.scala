package graft

import java.sql.Timestamp
import graft.pipeline.Metrics

/** observe()-based counters (A11/A14 parity). */
class MetricsAppSpec extends SparkSpec {
  import spark.implicits._

  test("link observations count totals and match types in one action") {
    val linked = Seq(
      ("c1", 0, "P1", 100, "EXACT"),
      ("c1", 1, "P2", 60, "FUZZY"),
      ("c2", 0, "P1", 95, "EXACT")
    ).toDF("conv_id", "turn_idx", "persoon_id", "score", "match_type")
    val (df, obs) = Metrics.observeLink(linked)
    df.count()
    val m = obs.get
    assert(m("n_linked") == 3L && m("n_exact") == 2L && m("n_fuzzy") == 1L)
    assert(m("score_sum") == 255L)
    assert(Metrics.matchRatePermille(2, 3) == 666L)
    assert(Metrics.matchRatePermille(0, 0) == 0L)
  }

  test("triple observations report counts") {
    val t = Seq(("a", "SPOKE_IN", "b"), ("a", "MATCHES_PERSOON", "c"), ("d", "SPOKE_IN", "b"))
      .toDF("subj", "pred", "obj")
    val (df, obs) = Metrics.observeTriples(t)
    df.count()
    assert(obs.get("n_triples") == 3L && obs.get("n_mention_matches") == 1L)
  }

  test("fallback-tier residual volume is an observed metric on the link run") {
    // two mentions hit the exact surname block, one (no dictionary surname)
    // falls through to the contains-fallback — the residual the counter
    // makes visible (VERDICT r3: the broadcast NLJ there is invisible until
    // slow on a dirty corpus; see Link.linkPersons residualObs doc)
    val mentions = Seq(
      ("c1", 0, "Anna", "jansen"),
      ("c1", 1, "", "de vries"),
      ("c2", 0, "", "unknownperson"))
      .toDF("conv_id", "turn_idx", "v_first", "v_last")
    val persons = Seq(
      ("P1", "Anna", "", "Jansen", "Anna Maria", "F1"),
      ("P2", "Willem", "de", "Vries", "Willem", "F2"))
      .toDF("persoon_id", "roepnaam", "tussenvoegsel", "achternaam",
        "voornamen", "fractie_id")
    val obs = org.apache.spark.sql.Observation()
    val linked = graft.link.Link.linkPersons(mentions, persons, Nil, Some(obs))
    linked.count()
    assert(obs.get("fallback_residual_rows") == 1L)
  }

  test("extraction is invariant under input row-order permutation") {
    // SURVEY §5.3: dedup/extraction must not depend on physical row order
    val rows = Seq(
      ("c1", 1, "member", "Mevrouw Jansen spreekt over dossier 36001 nr. 2", null: String, new Timestamp(1L)),
      ("c1", 0, "chair", "De voorzitter geeft het woord aan Anna Jansen", null: String, new Timestamp(0L)),
      ("c2", 0, "member", "De fractie Volt stemt tegen", null: String, new Timestamp(2L)))
    def run(perm: Seq[(String, Int, String, String, String, Timestamp)]) = {
      val df = perm.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      graft.extract.Extract.speakerMentions(df)
        .collect().map(_.mkString("|")).sorted.toSeq
    }
    assert(run(rows) == run(rows.reverse))
    assert(run(rows) == run(rows.sortBy(_._4)))
  }
}
