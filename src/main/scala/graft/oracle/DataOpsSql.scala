package graft.oracle

import graft.dataops.ContentHash._
import graft.dataops.TextAnalysis

/** DuckDB oracle CTEs for the training-data operators (graft.dataops.*).
  * Tables `documents` and `embeddings` are registered by the driver from the
  * same parquet files the Spark side reads. Hash/permutation constants come
  * from the same `ContentHash` literals as the Spark plans.
  */
object DataOpsSql {

  def withDocCtes(extra: String*)(finalSelect: String): String =
    s"WITH ${extra.mkString(",\n")}\n$finalSelect"

  /** Corpus with guaranteed exact duplicates: documents ∪ identical copy. */
  val corpusCte: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 100000, text FROM documents)""".stripMargin

  /** Corpus with guaranteed near-duplicates: documents ∪ tail-dropped copy. */
  val nearCorpusCte: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, regexp_replace(text, '\s+\S+$', '') FROM documents)""".stripMargin

  val exactGroupsCte: String =
    """exact_groups AS (
      |  SELECT md5(text) AS content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
      |  FROM corpus GROUP BY 1 HAVING COUNT(*) > 1)""".stripMargin

  val exactCanonicalCte: String =
    """exact_canonical AS (
      |  SELECT doc_id, canonical_id FROM (
      |    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
      |    FROM corpus)
      |  WHERE doc_id <> canonical_id)""".stripMargin

  /** Word 3-gram shingles with h32 hashes (mirrors Dedup.shingles). */
  val shinglesCte: String =
    s"""shingles AS (
       |  SELECT DISTINCT doc_id, ${h32Sql("shingle")} AS sh FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
       |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
       |    FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws
       |          FROM corpus)))""".stripMargin

  /** MinHash signatures (k parallel MIN aggregates, same coefficients). */
  val minhashCte: String = {
    val mins = (0 until MinHashK)
      .map(i => s"MIN(${permSql(i, "sh")}) AS mh_$i").mkString(",\n         ")
    s"""mh AS (
       |  SELECT doc_id,
       |         $mins
       |  FROM shingles GROUP BY doc_id)""".stripMargin
  }

  val bandsCte: String = {
    val branches = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => s"mh_${b * RowsPerBand + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $cols)) AS band_hash FROM mh"
    }
    "bands AS (\n  " + branches.mkString("\n  UNION ALL ") + ")"
  }

  def minhashPairsCte(minPermille: Int, maxBandFreq: Int = 256): String = {
    val agree = (0 until MinHashK)
      .map(i => s"CASE WHEN a.mh_$i = b.mh_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""bands_ok AS (
       |  SELECT b.* FROM bands b
       |  JOIN (SELECT band, band_hash FROM bands
       |        GROUP BY 1, 2 HAVING COUNT(*) <= $maxBandFreq) f
       |    USING (band, band_hash)),
       |cand AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands_ok l JOIN bands_ok r
       |    ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2),
       |minhash_pairs AS (
       |  SELECT doc_a, doc_b, est_jaccard_permille FROM (
       |    SELECT doc_a, doc_b,
       |           CAST(FLOOR(($agree) * 1000 / $MinHashK) AS INT) AS est_jaccard_permille
       |    FROM cand p JOIN mh a ON p.doc_a = a.doc_id JOIN mh b ON p.doc_b = b.doc_id)
       |  WHERE est_jaccard_permille >= $minPermille)""".stripMargin
  }

  /** Per-doc duplication ratio: share of a doc's distinct shingles occurring
    * in ≥1 other document (mirrors Dedup.dupShingleRatio).
    */
  val dupShingleRatioCte: String =
    """sdf AS (SELECT sh, COUNT(DISTINCT doc_id) AS df FROM shingles GROUP BY sh),
      |dup_ratio AS (
      |  SELECT s.doc_id,
      |         CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |         CAST(SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      |         CAST(FLOOR(SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) * 1000
      |                    / COUNT(*)) AS INT) AS dup_permille
      |  FROM shingles s JOIN sdf f USING (sh) GROUP BY s.doc_id)""".stripMargin

  /** Near-dup clusters: recursive min-reachability closure over the minhash
    * pair edges (cluster id = MIN doc_id reachable; the self-loop base row
    * gives singletons their own cluster). Mirrors the Spark side's
    * distributed CC semantics exactly — min-label component representative.
    */
  def nearDupClustersSql(minPermille: Int): String = {
    val ctes = Seq(nearCorpusCte, shinglesCte, minhashCte, bandsCte,
      minhashPairsCte(minPermille)).mkString(",\n")
    s"""WITH RECURSIVE $ctes,
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM minhash_pairs
       |  UNION SELECT doc_b, doc_a FROM minhash_pairs),
       |reach AS (
       |  SELECT doc_id AS src, doc_id AS dst FROM corpus
       |  UNION
       |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
       |clusters AS (
       |  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
       |SELECT c.doc_id, c.cluster_id, CAST(n.n AS BIGINT) AS cluster_size
       |FROM clusters c
       |JOIN (SELECT cluster_id, COUNT(*) AS n FROM clusters GROUP BY 1) n
       |  USING (cluster_id)
       |ORDER BY c.doc_id""".stripMargin
  }

  /** Composed dedup pipeline (mirrors Dedup.dedupPipeline over the pipeline
    * corpus: documents ∪ identical copy ∪ tail-dropped copy): exact
    * canonicalization by md5(text) window-min, then the minhash CTE stack
    * runs over the exact SURVIVORS (bound as `corpus`, so shingles/mh/bands
    * are reused verbatim), then the recursive min-reachability closure
    * yields clusters, then one decision row per input doc with the
    * exact-dropped rows chasing to their canonical's FINAL representative.
    */
  def dedupDecisionsSql(minPermille: Int): String = {
    val ctes = Seq(shinglesCte, minhashCte, bandsCte,
      minhashPairsCte(minPermille)).mkString(",\n")
    s"""WITH RECURSIVE corpus0 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 100000, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 200000, regexp_replace(text, '\\s+\\S+$$', '') FROM documents),
       |exact_canon AS (
       |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS exact_canonical
       |  FROM corpus0),
       |corpus AS (
       |  SELECT c.doc_id, c.text FROM corpus0 c JOIN exact_canon e USING (doc_id)
       |  WHERE e.doc_id = e.exact_canonical),
       |$ctes,
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM minhash_pairs
       |  UNION SELECT doc_b, doc_a FROM minhash_pairs),
       |reach AS (
       |  SELECT doc_id AS src, doc_id AS dst FROM corpus
       |  UNION
       |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
       |clusters AS (
       |  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
       |decisions AS (
       |  SELECT doc_id, doc_id = cluster_id AS keep,
       |         CASE WHEN doc_id = cluster_id THEN 'unique' ELSE 'near' END AS reason,
       |         cluster_id AS representative_id
       |  FROM clusters
       |  UNION ALL
       |  SELECT e.doc_id, FALSE, 'exact', c.cluster_id
       |  FROM exact_canon e JOIN clusters c ON e.exact_canonical = c.doc_id
       |  WHERE e.doc_id <> e.exact_canonical)
       |SELECT doc_id, keep, reason, representative_id
       |FROM decisions ORDER BY doc_id""".stripMargin
  }

  def ngramJaccardCte(minPermille: Int, maxFreq: Int): String =
    s"""sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY 1),
       |rare AS (SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) <= $maxFreq),
       |shf AS (SELECT s.* FROM shingles s JOIN rare USING (sh)),
       |inter AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, COUNT(*) AS n_inter
       |  FROM shf l JOIN shf r ON l.sh = r.sh AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2),
       |jaccard_pairs AS (
       |  SELECT doc_a, doc_b, jaccard_permille FROM (
       |    SELECT doc_a, doc_b,
       |           CAST(FLOOR(n_inter * 1000 / (sa.n_sh + sb.n_sh - n_inter)) AS INT)
       |             AS jaccard_permille
       |    FROM inter
       |    JOIN sizes sa ON inter.doc_a = sa.doc_id
       |    JOIN sizes sb ON inter.doc_b = sb.doc_id)
       |  WHERE jaccard_permille >= $minPermille)""".stripMargin

  /** 32-bit SimHash (mirrors Dedup.simhash, relational bit explode). */
  val simhashCte: String =
    s"""tok AS (
       |  SELECT doc_id, word, COUNT(*) AS cnt FROM (
       |    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word
       |    FROM corpus)
       |  GROUP BY 1, 2),
       |tok_h AS (SELECT doc_id, cnt, ${h32Sql("word")} AS h FROM tok),
       |sim_bits AS (
       |  SELECT doc_id, b.bit,
       |         SUM(CASE WHEN (h >> CAST(b.bit AS INT)) & 1 = 1 THEN cnt ELSE -cnt END) AS s
       |  FROM tok_h, (SELECT range AS bit FROM range(32)) b
       |  GROUP BY 1, 2),
       |simhash AS (
       |  SELECT doc_id,
       |         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
       |                       ELSE 0 END) AS BIGINT) AS simhash
       |  FROM sim_bits GROUP BY doc_id)""".stripMargin

  def simhashPairsCte(maxHamming: Int, maxBandFreq: Int = 256): String = {
    val branches = (0 until 4).map(b =>
      s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 8}) & 255 AS band_bits FROM simhash")
    s"""sim_banded_all AS (
       |  ${branches.mkString("\n  UNION ALL ")}),
       |sim_banded AS (
       |  SELECT s.* FROM sim_banded_all s
       |  JOIN (SELECT band, band_bits FROM sim_banded_all
       |        GROUP BY 1, 2 HAVING COUNT(*) <= $maxBandFreq) f
       |    USING (band, band_bits)),
       |simhash_pairs AS (
       |  SELECT doc_a, doc_b, hamming FROM (
       |    SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |           CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
       |    FROM sim_banded l JOIN sim_banded r
       |      ON l.band = r.band AND l.band_bits = r.band_bits AND l.doc_id < r.doc_id
       |    GROUP BY 1, 2, 3)
       |  WHERE hamming <= $maxHamming)""".stripMargin
  }

  /** Cosine with the exact Spark fold shape: dot/(sqrt(na)·sqrt(nb)). */
  val annPairsCte: String =
    """emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |ann_pairs AS (
      |  SELECT l.vec_id, r.vec_id AS neighbor_id,
      |         CAST(FLOOR(list_dot_product(l.e, r.e) /
      |              (sqrt(list_dot_product(l.e, l.e)) * sqrt(list_dot_product(r.e, r.e)))
      |              * 1000000) AS BIGINT) AS cos_1e6
      |  FROM emb l JOIN emb r ON l.vec_id <> r.vec_id)""".stripMargin

  def annTopKCte(k: Int): String =
    s"""ann_topk AS (
       |  SELECT vec_id, neighbor_id, cos_1e6, CAST(rank AS INT) AS rank FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |                                 ORDER BY cos_1e6 DESC, neighbor_id) AS rank
       |    FROM ann_pairs)
       |  WHERE rank <= $k)""".stripMargin

  /** One table's bucket expression: concat of sign bits of hyperplane dots,
    * with the hyperplane ±1 literals from graft.dataops.Similarity (same
    * xorshift stream as the Spark plan).
    */
  private def tableBucketSql(planes: Seq[Array[Double]], arr: String): String =
    planes.map { p =>
      val lits = p.map(v => if (v > 0) "1" else "-1").mkString("[", ",", "]")
      s"CASE WHEN list_dot_product($arr, $lits) >= 0 THEN '1' ELSE '0' END"
    }.mkString("concat(", ", ", ")")

  /** Multi-table sign-LSH buckets + deduped candidate pairs (mirrors
    * Similarity.lshTopK: same bucket in ANY table ⇒ candidate).
    */
  private def lshCandCtes(nBits: Int, nTables: Int, dim: Int,
      embSql: String = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings"): String = {
    val hp = graft.dataops.Similarity.hyperplanes(dim, nBits, nTables)
    val branches = (0 until nTables).map(t =>
      s"SELECT vec_id, e, $t AS tbl, ${tableBucketSql(hp(t), "e")} AS bucket FROM emb")
    s"""emb AS ($embSql),
       |lsh_b AS (
       |  ${branches.mkString("\n  UNION ALL ")}),
       |lsh_cand AS (
       |  SELECT DISTINCT l.vec_id, r.vec_id AS neighbor_id
       |  FROM lsh_b l JOIN lsh_b r
       |    ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.vec_id <> r.vec_id)""".stripMargin
  }

  private val cosPairSql: String =
    """CAST(FLOOR(list_dot_product(a.e, b.e) /
      |              (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
      |              * 1000000) AS BIGINT)""".stripMargin

  private def topKSql(name: String, pairs: String, k: Int): String =
    s"""$name AS (
       |  SELECT vec_id, neighbor_id, cos_1e6, CAST(rank AS INT) AS rank FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |                                 ORDER BY cos_1e6 DESC, neighbor_id) AS rank
       |    FROM $pairs)
       |  WHERE rank <= $k)""".stripMargin

  /** Embedding corpus with PLANTED near-duplicates: embeddings ∪ a ×1.5
    * scaled copy (`vec_id + 1000000`). Scaling preserves direction exactly —
    * cosine(a, 1.5a) folds to 1 up to a shared rounding both engines compute
    * identically — and leaves every hyperplane sign unchanged, so each
    * planted pair is a same-bucket candidate in EVERY LSH table (mirrors
    * SparkEntry.embNear).
    */
  val embNearSql: String =
    """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.5)
      |  FROM embeddings""".stripMargin

  /** Embedding-cosine near-dup pairs over the planted corpus (mirrors
    * Dedup.embeddingDupPairs: LSH candidates → exact fixed-point cosine
    * ≥ threshold, canonical doc_a < doc_b ordering).
    */
  def embedDupPairsCte(minCos1e6: Long, nBits: Int, nTables: Int, dim: Int): String =
    s"""${lshCandCtes(nBits, nTables, dim, embNearSql)},
       |embed_dup_pairs AS (
       |  SELECT c.vec_id AS doc_a, c.neighbor_id AS doc_b, $cosPairSql AS cos_1e6
       |  FROM lsh_cand c
       |  JOIN emb a ON c.vec_id = a.vec_id
       |  JOIN emb b ON c.neighbor_id = b.vec_id
       |  WHERE c.vec_id < c.neighbor_id
       |    AND $cosPairSql >= $minCos1e6)""".stripMargin

  def annLshTopKCte(k: Int, nBits: Int, nTables: Int, dim: Int): String =
    s"""${lshCandCtes(nBits, nTables, dim)},
       |ann_pairs AS (
       |  SELECT c.vec_id, c.neighbor_id, $cosPairSql AS cos_1e6
       |  FROM lsh_cand c
       |  JOIN emb a ON c.vec_id = a.vec_id
       |  JOIN emb b ON c.neighbor_id = b.vec_id),
       |${topKSql("ann_topk", "ann_pairs", k)}""".stripMargin

  /** IVF cells: k-means centroids from seeded starts (mirrors
    * Similarity.kmeansCentroids — 2 unrolled Lloyd iterations in exact
    * 1e-6 fixed-point arithmetic, so both engines learn bit-identical
    * centroids), per-vector cell ranks by (cos desc, centroid_id), home
    * cell = rank 1, probed cells = rank <= nprobe.
    */
  private def ivfCtes(nCentroids: Int, nprobe: Int, dim: Int = 64): String = {
    def rankOver(cent: String, out: String): String =
      s"""$out AS (
         |  SELECT vec_id, e, cell, crank FROM (
         |    SELECT v.vec_id, v.e, c.centroid_id AS cell,
         |           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |             CAST(FLOOR(list_dot_product(v.e, c.ce) /
         |                  (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.ce, c.ce)))
         |                  * 1000000) AS BIGINT) DESC, c.centroid_id) AS crank
         |    FROM emb v CROSS JOIN $cent c))""".stripMargin
    def lloydStep(prevCent: String, i: Int): String =
      s"""${rankOver(prevCent, s"asg$i")},
         |cm$i AS (
         |  SELECT cell, i.idx AS idx,
         |         CAST(FLOOR(SUM(CAST(FLOOR(e[CAST(i.idx + 1 AS INT)] * 1000000) AS BIGINT))
         |              / COUNT(*)) AS BIGINT) AS mq
         |  FROM (SELECT e, cell FROM asg$i WHERE crank = 1) a,
         |       (SELECT range AS idx FROM range($dim)) i
         |  GROUP BY cell, i.idx),
         |cent$i AS (
         |  SELECT cell AS centroid_id, list(mq / 1000000.0 ORDER BY idx) AS ce
         |  FROM cm$i GROUP BY cell)""".stripMargin
    s"""emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |cent0 AS (
       |  SELECT vec_id AS centroid_id, e AS ce FROM emb
       |  ORDER BY ${graft.dataops.ContentHash.h32Sql("CAST(vec_id AS VARCHAR)")}, vec_id
       |  LIMIT $nCentroids),
       |${lloydStep("cent0", 1)},
       |${lloydStep("cent1", 2)},
       |${rankOver("cent2", "ivf_ranked")},
       |ivf_home AS (
       |  SELECT vec_id AS neighbor_id, e AS er, cell FROM ivf_ranked WHERE crank = 1),
       |ivf_probe AS (
       |  SELECT vec_id, e, cell FROM ivf_ranked WHERE crank <= $nprobe),
       |ivf_pairs AS (
       |  SELECT p.vec_id, h.neighbor_id,
       |         CAST(FLOOR(list_dot_product(p.e, h.er) /
       |              (sqrt(list_dot_product(p.e, p.e)) * sqrt(list_dot_product(h.er, h.er)))
       |              * 1000000) AS BIGINT) AS cos_1e6
       |  FROM ivf_probe p JOIN ivf_home h USING (cell)
       |  WHERE p.vec_id <> h.neighbor_id)""".stripMargin
  }

  def annIvfTopKCte(k: Int, nCentroids: Int, nprobe: Int): String =
    s"""${ivfCtes(nCentroids, nprobe)},
       |${topKSql("ann_ivf_topk", "ivf_pairs", k)}""".stripMargin

  /** Recall@k of the IVF top-k vs the exact top-k, as one row. */
  def annIvfRecallCte(k: Int, nCentroids: Int, nprobe: Int): String =
    s"""${ivfCtes(nCentroids, nprobe)},
       |${topKSql("ivf_topk", "ivf_pairs", k)},
       |ex_pairs AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id, $cosPairSql AS cos_1e6
       |  FROM emb a JOIN emb b ON a.vec_id <> b.vec_id),
       |${topKSql("ex_topk", "ex_pairs", k)},
       |ivf_recall AS (
       |  SELECT CAST(COUNT(DISTINCT e.vec_id) AS BIGINT) AS n_queries,
       |         CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |         CAST(COUNT(*) AS BIGINT) AS n_exact,
       |         CAST(FLOOR(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000
       |                    / COUNT(*)) AS INT) AS recall_permille
       |  FROM ex_topk e
       |  LEFT JOIN ivf_topk l
       |    ON e.vec_id = l.vec_id AND e.neighbor_id = l.neighbor_id)""".stripMargin

  /** Recall@k of the LSH top-k vs the exact top-k, as one row. */
  def annLshRecallCte(k: Int, nBits: Int, nTables: Int, dim: Int): String =
    s"""${lshCandCtes(nBits, nTables, dim)},
       |lsh_pairs AS (
       |  SELECT c.vec_id, c.neighbor_id, $cosPairSql AS cos_1e6
       |  FROM lsh_cand c
       |  JOIN emb a ON c.vec_id = a.vec_id
       |  JOIN emb b ON c.neighbor_id = b.vec_id),
       |${topKSql("lsh_topk", "lsh_pairs", k)},
       |ex_pairs AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id, $cosPairSql AS cos_1e6
       |  FROM emb a JOIN emb b ON a.vec_id <> b.vec_id),
       |${topKSql("ex_topk", "ex_pairs", k)},
       |lsh_recall AS (
       |  SELECT CAST(COUNT(DISTINCT e.vec_id) AS BIGINT) AS n_queries,
       |         CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |         CAST(COUNT(*) AS BIGINT) AS n_exact,
       |         CAST(FLOOR(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000
       |                    / COUNT(*)) AS INT) AS recall_permille
       |  FROM ex_topk e
       |  LEFT JOIN lsh_topk l
       |    ON e.vec_id = l.vec_id AND e.neighbor_id = l.neighbor_id)""".stripMargin

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  val langIdCte: String =
    s"""lang_id AS (
       |  SELECT doc_id, nl_hits, en_hits, n_words,
       |         CASE WHEN nl_hits > en_hits THEN 'nl'
       |              WHEN en_hits > nl_hits THEN 'en' ELSE 'und' END AS lang_pred,
       |         CAST(CASE WHEN n_words > 0
       |              THEN FLOOR(GREATEST(nl_hits, en_hits) * 1000 / n_words)
       |              ELSE 0 END AS INT) AS confidence_permille
       |  FROM (SELECT doc_id,
       |          CAST(len(list_filter(ws, x -> x IN ${inList(TextAnalysis.StopwordsNl)})) AS INT) AS nl_hits,
       |          CAST(len(list_filter(ws, x -> x IN ${inList(TextAnalysis.StopwordsEn)})) AS INT) AS en_hits,
       |          CAST(len(ws) AS INT) AS n_words
       |        FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws
       |              FROM documents)))""".stripMargin

  val qualityCte: String =
    s"""quality AS (
       |  SELECT doc_id, n_chars, n_words, punct_permille, stopword_permille,
       |         chars_per_word_x10,
       |         CAST(LEAST(GREATEST(
       |              LEAST(n_words * 20, 400)
       |              + LEAST(stopword_permille, 400)
       |              + CASE WHEN punct_permille <= 100 THEN 200 ELSE 0 END, 0), 1000) AS INT)
       |           AS quality_permille
       |  FROM (
       |    SELECT doc_id, n_chars, n_words,
       |           CAST(CASE WHEN n_chars > 0 THEN FLOOR(n_punct * 1000 / n_chars) ELSE 0 END AS INT) AS punct_permille,
       |           CAST(CASE WHEN n_words > 0 THEN FLOOR(stop_hits * 1000 / n_words) ELSE 0 END AS INT) AS stopword_permille,
       |           CAST(CASE WHEN n_words > 0 THEN FLOOR(n_chars * 10 / n_words) ELSE 0 END AS INT) AS chars_per_word_x10
       |    FROM (
       |      SELECT doc_id,
       |             CAST(length(text) AS INT) AS n_chars,
       |             CAST(len(ws) AS INT) AS n_words,
       |             CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS INT) AS n_punct,
       |             CAST(len(list_filter(ws, x -> x IN ${inList(TextAnalysis.StopwordsNl)}))
       |                + len(list_filter(ws, x -> x IN ${inList(TextAnalysis.StopwordsEn)})) AS INT) AS stop_hits
       |      FROM (SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS ws
       |            FROM documents))))""".stripMargin

  val tokenStatsCte: String =
    s"""token_stats AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS INT) AS ws_tokens,
       |         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))
       |            + length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS INT) AS bpeish_tokens,
       |         CAST(length(text) AS INT) AS n_chars
       |  FROM documents)""".stripMargin

  def fingerprintCte(t: Int): String =
    s"""fingerprint AS (
       |  SELECT doc_id, string_agg(CAST(sh AS VARCHAR), '-' ORDER BY sh) AS fingerprint
       |  FROM (SELECT doc_id, sh,
       |               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sh) AS rn
       |        FROM shingles)
       |  WHERE rn <= $t GROUP BY doc_id)""".stripMargin

  /** Mirrors Multimodal.assets + extractFeatures: even doc_ids are REAL
    * PNGs whose dimensions were CONSTRUCTED as Multimodal.pngDims(len(text))
    * and are then genuinely re-read by ImageIO on the Spark side — the
    * oracle computes the construction rule, the engine decodes pixels; odd
    * doc_ids take the stubbed fakeDecode path over the raw text bytes.
    */
  val multimodalCte: String =
    """mm_features AS (
      |  SELECT doc_id AS asset_id,
      |         CASE WHEN doc_id % 2 = 0 THEN 'image/png'
      |              ELSE 'audio/fake' END AS mime,
      |         CASE WHEN doc_id % 2 = 0 THEN CAST(1 + length(text) % 16 AS INT)
      |              ELSE CAST(64 + length(text) % 64 AS INT) END AS width,
      |         CASE WHEN doc_id % 2 = 0 THEN CAST(1 + (length(text) // 16) % 16 AS INT)
      |              ELSE CAST(64 + (length(text) // 64) % 64 AS INT) END AS height,
      |         CASE WHEN doc_id % 2 = 0 THEN 1
      |              ELSE CAST(1 + length(text) % 8 AS INT) END AS n_frames
      |  FROM documents)""".stripMargin
}
