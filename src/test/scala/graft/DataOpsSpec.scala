package graft

import graft.dataops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Semantics of the training-data operators: dedup family, ANN, text
  * analysis, multimodal plumbing.
  */
class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog and runs far away today"
  private val docB = "the quick brown fox jumps over the lazy dog and runs far away" // tail-dropped
  private val docC = "een compleet ander verhaal over de kat die op de mat zat vandaag"

  private def docsDf(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("exact dedup groups identical texts and maps to min doc_id") {
    val d = docsDf((1L, docA), (2L, docB), (3L, docA), (4L, docA))
    val groups = Dedup.exactGroups(d).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n_docs") == 3)
    assert(groups.head.getAs[Long]("canonical_id") == 1L)
    val canon = Dedup.exactCanonical(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon == Map(3L -> 1L, 4L -> 1L))
  }

  test("shingles: n-3 word 3-grams, distinct") {
    val sh = Dedup.shingles(docsDf((1L, "a b c d e"))).collect()
    assert(sh.length == 3) // abc bcd cde
  }

  test("minhash LSH finds the near-dup pair, not the unrelated doc") {
    val pairs = Dedup.minhashPairs(docsDf((1L, docA), (2L, docB), (3L, docC)), 500)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getAs[Int]("est_jaccard_permille") >= 750)
  }

  test("dup shingle ratio: planted duplicate shares all shingles, unique doc none") {
    val r = Dedup.dupShingleRatio(docsDf((1L, docA), (2L, docA), (3L, docC)))
      .collect().map(x => x.getLong(0) -> x.getAs[Int]("dup_permille")).toMap
    assert(r(1L) == 1000 && r(2L) == 1000) // identical docs: every shingle shared
    assert(r(3L) == 0) // unrelated language: nothing shared
  }

  test("near-dup clusters: transitive closure over minhash pairs, singletons alone") {
    val docA2 = docA.split(" ").dropRight(2).mkString(" ") // two-word-dropped tail
    val d = docsDf((1L, docA), (2L, docB), (3L, docA2), (4L, docC))
    val rows = Dedup.nearDupClusters(d, 500).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 1~2 and 2~3 at least (3 may or may not pair with 1 directly) — CC must
    // put all three in cluster 1 by transitivity; 4 is its own singleton
    assert(rows(1L) == (1L, 3L))
    assert(rows(2L) == (1L, 3L))
    assert(rows(3L) == (1L, 3L))
    assert(rows(4L) == (4L, 1L))
  }

  test("dedupPipeline: exact → near on survivors → decisions with chased representatives") {
    // 1 = kept representative; 2 = byte-identical to 1 (exact drop);
    // 3 = near-dup of 1 (tail-dropped text, exact-surviving → near drop);
    // 4 = byte-identical to 3 (exact drop whose canonical is itself
    //     near-dropped — its representative must CHASE to 1, a kept doc);
    // 5 = unrelated (kept)
    val d = docsDf((1L, docA), (2L, docA), (3L, docB), (4L, docB), (5L, docC))
    val got = Dedup.dedupPipeline(d, 500).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("keep"), r.getAs[String]("reason"),
          r.getAs[Long]("representative_id")))).toMap
    assert(got(1L) == ((true, "unique", 1L)))
    assert(got(2L) == ((false, "exact", 1L)))
    assert(got(3L) == ((false, "near", 1L)))
    assert(got(4L) == ((false, "exact", 1L)), "exact drop must chase to the FINAL representative")
    assert(got(5L) == ((true, "unique", 5L)))
    assert(got.size == 5, "one decision row per input document")
  }

  test("exact n-gram jaccard matches hand computation") {
    // docA: 14 words -> 12 shingles; docB (tail-dropped): 13 -> 11 shingles,
    // all shared => jaccard = 11/12 = 916 permille
    val pairs = Dedup.ngramJaccardPairs(docsDf((1L, docA), (2L, docB)), 800, 100)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Int]("jaccard_permille") == 916)
  }

  test("simhash: identical docs get identical hashes; near-dups are close") {
    val sh = Dedup.simhash(docsDf((1L, docA), (2L, docA), (3L, docB), (4L, docC)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) <= 6)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(4L)) > 6)
    val pairs = Dedup.simhashPairs(docsDf((1L, docA), (2L, docA), (3L, docC)), 0)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  private def embDf(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("brute-force cosine top-k ranks by similarity") {
    val e = embDf(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f, 0f)), // closest to 1
      (3L, Seq(0f, 1f, 0f, 0f)),     // orthogonal to 1
      (4L, Seq(0.5f, 0.5f, 0f, 0f)))
    val topk = Similarity.bruteForceTopK(e, 2)
      .where($"vec_id" === 1L).orderBy("rank").collect()
    assert(topk.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 4L))
  }

  test("sign-LSH restricts candidates to same-bucket vectors (any table)") {
    // v1's hyperplane dots are sums of distinct magnitudes (never 0), v2 is
    // an epsilon-perturbation (same sign pattern in every table), v3 is
    // antipodal (complementary sign pattern in every table)
    val e = embDf(
      (1L, Seq(1f, 0.3f, 0.2f, 0.1f)),
      (2L, Seq(1f, 0.31f, 0.2f, 0.1f)),
      (3L, Seq(-1f, -0.3f, -0.2f, -0.1f)))
    val topk = Similarity.lshTopK(e, 5, nBits = 4, nTables = 2, dim = 4).collect()
    val neighborsOf1 = topk.filter(_.getLong(0) == 1L).map(_.getAs[Long]("neighbor_id")).toSet
    assert(neighborsOf1 == Set(2L)) // 3 is excluded by every table's bucket
  }

  test("language id separates nl and en by stopword hits") {
    val lid = TextAnalysis.languageId(docsDf((1L, docA), (2L, docC)))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("lang_pred")).toMap
    assert(lid == Map(1L -> "en", 2L -> "nl"))
  }

  test("token stats: whitespace and bpe-ish counts") {
    val t = TextAnalysis.tokenStats(docsDf((1L, "Hello, world! a1 b-2")))
      .head()
    assert(t.getAs[Int]("ws_tokens") == 4)
    // runs: hello, world, a1, b, 2 = 5; punct: , ! - = 3
    assert(t.getAs[Int]("bpeish_tokens") == 8)
  }

  test("fingerprint equal for identical docs, different for unrelated") {
    val fp = TextAnalysis.fingerprint(docsDf((1L, docA), (2L, docA), (3L, docC)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("quality scoring: empty-ish text scores low, real text higher") {
    val q = TextAnalysis.qualityScore(docsDf((1L, docA), (2L, "x")))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("quality_permille")).toMap
    assert(q(1L) > q(2L))
  }

  test("multimodal: REAL PNG payloads decode via JDK ImageIO to the constructed dims") {
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.assets(docsDf((2L, docA), (4L, docA + " longer text body"))))
      .collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    val (w2, h2) = Multimodal.pngDims(docA.length)
    assert(feats(2L).getAs[String]("mime") == "image/png")
    // the payload is a genuine PNG (magic bytes) and ImageIO read back the
    // dimensions it was constructed with
    assert(feats(2L).getAs[Int]("width") == w2)
    assert(feats(2L).getAs[Int]("height") == h2)
    assert(feats(2L).getAs[Int]("n_frames") == 1)
    val png = Multimodal.assets(docsDf((2L, docA))).head().getAs[Array[Byte]]("payload")
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    assert(feats(2L).getAs[Long]("n_bytes") == png.length)
    val (w4, h4) = Multimodal.pngDims((docA + " longer text body").length)
    assert((feats(4L).getAs[Int]("width"), feats(4L).getAs[Int]("height")) == ((w4, h4)))
  }

  test("multimodal: batch feature extraction is deterministic and typed") {
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.assets(docsDf((1L, docA)).withColumn("doc_id", $"doc_id")))
      .head()
    assert(feats.getAs[String]("mime") == "audio/fake")
    assert(feats.getAs[Long]("n_bytes") == docA.length)
    assert(feats.getAs[String]("checksum").length == 32)
    assert(feats.getAs[Int]("width") == 64 + docA.length % 64)
    val plan = Multimodal.frameSamplePlan(
      Seq((1L, 5)).toDF("asset_id", "n_frames"), 2).collect()
    assert(plan.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2, 4))
  }
}
