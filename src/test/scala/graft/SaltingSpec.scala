package graft

import graft.link.Salting

/** Salted-join semantics: result equality with the unsalted join, and the
  * salt actually spreads a hot key across the salt space.
  */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join (hot-key fact)") {
    // 'chair' is 90% of the fact side — the reference's 'De voorzitter' shape
    val fact = ((1 to 90).map(i => ("chair", s"r$i")) ++
      (1 to 10).map(i => (s"p$i", s"s$i"))).toDF("key", "payload")
    val dim = (Seq("chair") ++ (1 to 10).map(i => s"p$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("key", "attr")
    val plain = fact.join(dim, "key")
      .collect().map(_.mkString("|")).sorted.toSeq
    val salted = Salting.saltedJoin(fact, dim, "key", 8, Seq("key", "payload"))
      .select("key", "payload", "attr")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(salted == plain && salted.length == 100)
  }

  test("hot-corpus e2e: one giant conv + chair in every other turn survives the window+join path") {
    import org.apache.spark.sql.functions._
    // skew injection: ONE conversation with 100k turns (chair speaking every
    // other turn — the reference's 'De voorzitter' shape), plus 50 normal
    // conversations. Exercises the per-conv window stages (W1 segments +
    // interruption detect) and the salted conv_id topic join end-to-end.
    val hot = (0 until 100000).map(i =>
      ("chot", i, if (i % 2 == 0) "P00" else s"P${1 + i % 5}"))
    val normal = for (c <- 1 to 50; i <- 0 until 20)
      yield (s"c$c", i, s"P${i % 7}")
    val speakers = (hot ++ normal).toDF("conv_id", "turn_idx", "speaker")
    val events = graft.analysis.Interruptions.detect(speakers)
      .select("conv_id", "turn_idx")
    val topics = ((Seq("chot") ++ (1 to 50).map(i => s"c$i"))
      .flatMap(c => Seq((c, "t1"), (c, "t2")))).toDF("conv_id", "topic")
    val salted = Salting.saltedJoin(events, topics, "conv_id", 8,
        Seq("conv_id", "turn_idx"))
      .groupBy("topic").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = events.join(topics, "conv_id")
      .groupBy("topic").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // hot conv contributes ~100k interruption events per topic; identical
    // under both plans => the salt changes the partitioning, not the result
    assert(plain("t1") > 90000)
  }

  test("salt is deterministic and spreads the hot key over the salt space") {
    val fact = (1 to 200).map(i => ("chair", s"r$i")).toDF("key", "payload")
    val salted = Salting.saltFact(fact, 8, Seq("key", "payload"))
    val salts = salted.select("_salt").distinct().collect().map(_.getInt(0)).toSet
    assert(salts.size >= 6) // 200 rows over 8 salts: all-but-certainly >= 6 hit
    // deterministic: same input -> same salts
    val again = Salting.saltFact(fact, 8, Seq("key", "payload"))
      .select("payload", "_salt").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val first = salted.select("payload", "_salt").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(again == first)
  }
}
