package graft

import graft.analysis.GraphAnalytics

/** Hand-computed oracles for the post-construction graph analytics
  * (degrees, co-discussion projection, 2-hop reach, triangles, fixed-point
  * PageRank) on small graphs where every value is checkable by hand.
  */
class GraphAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def triples(rows: (String, String, String)*) =
    rows.toDF("subj", "pred", "obj")

  test("degrees: dedups parallel predicates, counts in/out per node") {
    val t = triples(
      ("a", "P", "b"), ("a", "Q", "b"), // parallel edge counts once
      ("a", "P", "c"), ("c", "P", "b"))
    val got = GraphAnalytics.degrees(t).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      "a" -> ((2L, 0L, 2L)),
      "b" -> ((0L, 2L, 2L)),
      "c" -> ((1L, 1L, 2L))))
  }

  test("coDiscussion: oriented pairs per shared zaak, deduped across zaken") {
    val t = triples(
      ("persoon:P1", "DISCUSSES_ZAAK", "zaak:Z1"),
      ("persoon:P2", "DISCUSSES_ZAAK", "zaak:Z1"),
      ("persoon:P3", "DISCUSSES_DOSSIER", "zaak:Z1"),
      ("persoon:P1", "DISCUSSES_ZAAK", "zaak:Z2"),
      ("persoon:P2", "DISCUSSES_DOSSIER", "zaak:Z2"), // P1-P2 again via Z2
      ("persoon:P9", "SPOKE_IN", "conv:c1")) // non-DISCUSSES ignored
    val got = GraphAnalytics.coDiscussion(t).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("persoon:P1", "persoon:P2"),
      ("persoon:P1", "persoon:P3"),
      ("persoon:P2", "persoon:P3")))
  }

  test("twoHopReach: path graph P1-P2-P3 (via zaken) counts 1- and 2-hop") {
    // co-discussion edges: P1-P2 (Z1), P2-P3 (Z2)  => path graph
    val t = triples(
      ("persoon:P1", "DISCUSSES_ZAAK", "zaak:Z1"),
      ("persoon:P2", "DISCUSSES_ZAAK", "zaak:Z1"),
      ("persoon:P2", "DISCUSSES_ZAAK", "zaak:Z2"),
      ("persoon:P3", "DISCUSSES_ZAAK", "zaak:Z2"))
    val got = GraphAnalytics.twoHopReach(t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // P1 reaches P2 (1 hop) + P3 (2 hops); P2 reaches P1, P3; P3 symmetric
    assert(got == Map("persoon:P1" -> 2L, "persoon:P2" -> 2L, "persoon:P3" -> 2L))
  }

  test("triangles: K3 + pendant — corners count 1, pendant absent") {
    // Z1 shared by P1,P2,P3 (triangle); P4 only pairs with P3 via Z2
    val t = triples(
      ("persoon:P1", "DISCUSSES_ZAAK", "zaak:Z1"),
      ("persoon:P2", "DISCUSSES_ZAAK", "zaak:Z1"),
      ("persoon:P3", "DISCUSSES_ZAAK", "zaak:Z1"),
      ("persoon:P3", "DISCUSSES_ZAAK", "zaak:Z2"),
      ("persoon:P4", "DISCUSSES_ZAAK", "zaak:Z2"))
    val got = GraphAnalytics.triangles(t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "persoon:P1" -> 1L, "persoon:P2" -> 1L, "persoon:P3" -> 1L))
  }

  test("triangles: K4 has 4 triangles, each node in 3") {
    val t = triples((for {
      i <- 1 to 4; j <- 1 to 4 if i != j
    } yield (s"persoon:P$i", "DISCUSSES_ZAAK", "zaak:Z")): _*)
    val got = GraphAnalytics.triangles(t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.toSeq.sorted == Seq(3L, 3L, 3L, 3L))
    assert(got.values.sum == 12L) // 4 triangles x 3 corners
  }

  test("pageRank: two-node cycle stays uniform; hand-checked star values") {
    val s = GraphAnalytics.PageRankScale
    // a <-> b: perfectly symmetric, every iteration keeps rank = S/2 up to
    // the deterministic truncation: r' = 0.15*S/2 + (r*85 div 200)
    val cyc = GraphAnalytics.pageRank(
      triples(("a", "P", "b"), ("b", "P", "a")), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = {
      var r = s / 2
      (1 to 3).foreach(_ => r = (s * 15 / 100) / 2 + (r * 85) / (100 * 1))
      r
    }
    assert(cyc == Map("a" -> expected, "b" -> expected))

    // star: b,c,d -> a, one iteration by hand
    val star = GraphAnalytics.pageRank(
      triples(("b", "P", "a"), ("c", "P", "a"), ("d", "P", "a")), 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = (s * 15 / 100) / 4
    val r0 = s / 4
    val share = (r0 * 85) / (100 * 1)
    assert(star("a") == base + 3 * share)
    assert(star("b") == base && star("c") == base && star("d") == base)
  }

  test("pageRank: sink ranks above sources and total mass bounded by S") {
    val t = triples(
      ("u1", "P", "hub"), ("u2", "P", "hub"), ("u3", "P", "hub"),
      ("hub", "P", "u1"))
    val got = GraphAnalytics.pageRank(t, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("hub") > got("u2") && got("u1") > got("u2"))
    assert(got.values.sum <= GraphAnalytics.PageRankScale)
    assert(got.values.forall(_ > 0L))
  }
}
