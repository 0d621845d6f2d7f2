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
