package graft

import graft.analysis.{Interruptions, Voting}
import graft.model.InterruptionType

/** Interruption window classification (reference
  * interruption_analyzer.py:191-238) and voting aggregate math
  * (voting_analyzer.py:23-156).
  */
class AnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def seq(rows: (String, Int, String)*) =
    rows.toSeq.toDF("conv_id", "turn_idx", "speaker")

  test("A,B,A sequence is INTERRUPTION_WITH_RESPONSE by B of A") {
    val events = Interruptions.detect(seq(
      ("c1", 0, "A"), ("c1", 1, "B"), ("c1", 2, "A"))).collect()
    assert(events.length == 2) // B interrupts A (with response); A "interrupts" B back
    val first = events.find(_.getAs[Int]("turn_idx") == 1).get
    assert(first.getAs[String]("interrupter") == "B")
    assert(first.getAs[String]("interrupted") == "A")
    assert(first.getAs[String]("itype") == InterruptionType.WithResponse)
    val second = events.find(_.getAs[Int]("turn_idx") == 2).get
    assert(second.getAs[String]("itype") == InterruptionType.Simple)
  }

  test("A,B,C sequence yields two SIMPLE_INTERRUPTIONs") {
    val events = Interruptions.detect(seq(
      ("c1", 0, "A"), ("c1", 1, "B"), ("c1", 2, "C")))
      .orderBy("turn_idx").collect()
    assert(events.map(_.getAs[String]("itype")).forall(_ == InterruptionType.Simple))
    assert(events.map(r => (r.getAs[String]("interrupter"), r.getAs[String]("interrupted"))).toSeq
      == Seq(("B", "A"), ("C", "B")))
  }

  test("same speaker continuing is not an interruption; conversations are independent") {
    val events = Interruptions.detect(seq(
      ("c1", 0, "A"), ("c1", 1, "A"),
      ("c2", 0, "B"))).collect() // c2's B must not see c1's A as prev
    assert(events.isEmpty)
  }

  test("interruption pair counts aggregate across conversations") {
    val events = Interruptions.detect(seq(
      ("c1", 0, "A"), ("c1", 1, "B"),
      ("c2", 0, "A"), ("c2", 1, "B"),
      ("c3", 0, "B"), ("c3", 1, "A")))
    val p = Interruptions.pairs(events).collect()
    assert(p.head.getAs[String]("interrupter") == "B"
      && p.head.getAs[String]("interrupted") == "A"
      && p.head.getAs[Long]("n") == 2)
  }

  private def votes(rows: (String, String, String)*) =
    rows.toSeq.toDF("conv_id", "fractie_naam", "vote_norm")

  test("consensus permille + classification thresholds (80%/95%)") {
    val v = votes(
      // c1: 3 voor, 1 tegen -> 750 permille -> controversial (<800)
      ("c1", "F1", "voor"), ("c1", "F2", "voor"), ("c1", "F3", "voor"), ("c1", "F4", "tegen"),
      // c2: 19 voor, 1 tegen -> 950 -> unanimous (>=950)
      ("c2", "F0", "tegen")) union
      (1 to 19).map(i => ("c2", s"G$i", "voor")).toDF("conv_id", "fractie_naam", "vote_norm")
    val c = Voting.consensus(v, Seq("conv_id")).orderBy("conv_id").collect()
    assert(c(0).getAs[Int]("consensus_permille") == 750)
    assert(c(0).getAs[String]("classification") == "controversial")
    assert(c(1).getAs[Int]("consensus_permille") == 950)
    assert(c(1).getAs[String]("classification") == "unanimous")
  }

  test("breakdown lists fracties sorted per vote kind") {
    val b = Voting.breakdown(
      votes(("c1", "Zp", "voor"), ("c1", "Ap", "voor"), ("c1", "Mp", "tegen")),
      Seq("conv_id")).orderBy("vote_norm").collect()
    assert(b(0).getAs[String]("vote_norm") == "tegen" && b(0).getAs[String]("fracties") == "Mp")
    assert(b(1).getAs[String]("fracties") == "Ap,Zp" && b(1).getAs[Long]("n") == 2)
  }

  test("fractie alignment voor-share") {
    val a = Voting.fractieAlignment(votes(
      ("c1", "F1", "voor"), ("c2", "F1", "voor"), ("c3", "F1", "tegen"),
      ("c1", "F2", "onthouding")))
      .orderBy("fractie_naam").collect()
    assert(a(0).getAs[Long]("voor") == 2 && a(0).getAs[Long]("total") == 3
      && a(0).getAs[Int]("voor_permille") == 666)
    assert(a(1).getAs[Long]("onthouding") == 1 && a(1).getAs[Int]("voor_permille") == 0)
  }
}
