package graft.dataops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import ContentHash._

/** Deduplication family over a `documents(doc_id, text, …)` table — the
  * operators a 100 TB training-data pipeline needs. All variants follow the
  * same scale shape: per-row sketching (narrow, codegen'd) → hash-bucketed
  * candidate generation (equi-join on bucket keys, NEVER all-pairs) →
  * in-bucket verification. The only shuffles are on sketch/bucket keys, and
  * every aggregation partial-aggregates map-side.
  */
object Dedup {

  // ---- exact dedup -------------------------------------------------------

  /** Exact duplicate groups: hash-groupBy on normalized text. Returns
    * (content_hash, n_docs, canonical_id = min doc_id).
    */
  def exactGroups(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical_id"))
      .where(col("n_docs") > 1)

  /** doc → canonical mapping under exact dedup (identity rows omitted). */
  def exactCanonical(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy("content_hash")
    documents
      .withColumn("content_hash", md5(col("text")))
      .withColumn("canonical_id", min("doc_id").over(w))
      .where(col("doc_id") =!= col("canonical_id"))
      .select("doc_id", "canonical_id")
  }

  // ---- shingling ---------------------------------------------------------

  /** Word 3-gram shingles with h32 hashes: (doc_id, sh) distinct.
    * Lowercased, whitespace-split; shingle = 3 consecutive words.
    *
    * Round 6 (guide §2.4 — remove shuffles outright): the round-5 form
    * fetched the following words with `lead(…, i)` windows, which cost an
    * exchange on doc_id plus a per-doc sort of the EXPLODED word table
    * before a single shingle was hashed — in every consumer (minhash,
    * jaccard, dup-ratio, fingerprint, the composed pipeline). The word
    * array is row-local data: keeping the split array alongside
    * `posexplode` makes the following words indexed `element_at` lookups
    * inside the same whole-stage-codegen span — no exchange, no sort, no
    * lambda. Row set is identical: position i emits a shingle iff i+n−1
    * is still inside the array ⟺ `lead(word, n−1)` was non-null (split
    * elements are never null), and the hash input is the same
    * space-joined string, so the downstream `distinct` sees the same
    * (doc_id, sh) pairs.
    */
  def shingles(documents: DataFrame, n: Int = 3): DataFrame = {
    val words = documents
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("arr"))
      .select(col("doc_id"), col("arr"),
        posexplode(col("arr")).as(Seq("pos", "word")))
    // element_at is 1-based: 0-based pos + offset i ⇒ element_at(pos+i+1)
    val parts = col("word") +:
      (1 until n).map(i => element_at(col("arr"), col("pos") + (i + 1)))
    words
      .where(col("pos") <= size(col("arr")) - n)
      .select(col("doc_id"), h32(concat_ws(" ", parts: _*)).as("sh"))
      .distinct()
  }

  // ---- MinHash + LSH -----------------------------------------------------

  /** MinHash signatures: (doc_id, mh_0 … mh_{k-1}). One groupBy over the
    * shingle set; the k permutations are k parallel `min` aggregates (single
    * shuffle, map-side combined).
    */
  def minhashSignatures(shingleDf: DataFrame): DataFrame =
    shingleDf.groupBy("doc_id")
      .agg(
        min(perm(0, col("sh"))).as("mh_0"),
        (1 until MinHashK).map(i => min(perm(i, col("sh"))).as(s"mh_$i")): _*)

  /** LSH banding: (doc_id, band, band_hash) — md5 over the band's rows. */
  def bands(signatures: DataFrame): DataFrame = {
    val perBand = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => col(s"mh_${b * RowsPerBand + r}"))
      signatures.select(
        col("doc_id"), lit(b).as("band"),
        md5(concat_ws("|", cols: _*)).as("band_hash"))
    }
    perBand.reduce(_ unionByName _)
  }

  /** Hot-band guard shared by the sketch joins: drop bucket keys whose group
    * exceeds `maxFreq` BEFORE the self-join — a mass of exact duplicates
    * sharing one bucket otherwise makes that bucket quadratic (the same
    * stop-shingle logic `ngramJaccardPairs` uses). Dropped buckets are
    * mass-duplicate clusters; exact dedup (run first in a real pipeline)
    * owns those.
    */
  private def capBuckets(banded: DataFrame, keys: Seq[String], maxFreq: Int): DataFrame = {
    val ok = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bf")).where(col("bf") <= maxFreq)
    banded.join(ok.select(keys.map(col): _*), keys, "left_semi")
  }

  /** Candidate near-dup pairs via LSH bucket self-join, verified by the
    * signature-agreement estimate (matching components / k). Same-bucket ⇒
    * candidate; est_jaccard permille ≥ threshold ⇒ emitted. Pairs are
    * (doc_a < doc_b), distinct across bands. `maxBandFreq` caps bucket
    * width (skew guard — see `capBuckets`).
    */
  def minhashPairs(documents: DataFrame, minPermille: Int = 500,
      maxBandFreq: Int = 256): DataFrame = {
    val sig = minhashSignatures(shingles(documents))
    val b = capBuckets(bands(sig), Seq("band", "band_hash"), maxBandFreq)
    val candidates = b.as("l").join(b.as("r"),
        col("l.band") === col("r.band") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val sigA = sig.toDF(sig.columns.map(c => s"a_$c"): _*)
    val sigB = sig.toDF(sig.columns.map(c => s"b_$c"): _*)
    val agree = (0 until MinHashK)
      .map(i => when(col(s"a_mh_$i") === col(s"b_mh_$i"), 1).otherwise(0))
      .reduce(_ + _)
    candidates
      .join(sigA, col("doc_a") === col("a_doc_id"))
      .join(sigB, col("doc_b") === col("b_doc_id"))
      .select(col("doc_a"), col("doc_b"),
        // explicit floor: Spark's double→int cast truncates but DuckDB's
        // rounds — floor() first keeps both engines identical
        floor(agree * 1000 / MinHashK).cast("int").as("est_jaccard_permille"))
      .where(col("est_jaccard_permille") >= minPermille)
  }

  /** Per-document duplication ratio — the C4/RefinedWeb-style repetition
    * filter signal: for each document (with ≥1 shingle), the permille share
    * of its DISTINCT shingles that occur in at least one other document.
    * Two shuffles, both on shingle hash / doc_id, both map-side combined:
    * shingle document-frequency, then a per-doc roll-up. At 100 TB the
    * frequency table is the corpus vocabulary — bounded by content, not
    * rows — and the join back is a plain equi-join on the frequency key.
    */
  def dupShingleRatio(documents: DataFrame, n: Int = 3): DataFrame = {
    val sh = shingles(documents, n)
    val df = sh.groupBy("sh").agg(countDistinct("doc_id").as("df"))
    sh.join(df, "sh")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        // floor() both engines: Spark / on longs is double division
        floor(col("n_shared") * 1000 / col("n_shingles")).cast("int")
          .as("dup_permille"))
  }

  // ---- near-dup clustering ----------------------------------------------

  /** Near-duplicate CLUSTERS, not just pairs: MinHash/LSH pair edges →
    * connected components → `(doc_id, cluster_id, cluster_size)` for EVERY
    * document (a singleton is its own cluster). `cluster_id` is the smallest
    * doc_id in the component — the canonical representative a dedup pipeline
    * keeps, with transitivity handled (a~b, b~c ⇒ one cluster even when a,c
    * never share a band). Unlike the KG surface-form graph (dimension-
    * bounded, driver union-find eligible), the near-dup graph is
    * CORPUS-sized at 100 TB, so this goes straight to the distributed
    * large/small-star loop (`ConnectedComponents.run`) — O(log n) rounds,
    * shuffles only on node keys. Node labels are zero-padded decimals so the
    * CC's lexicographic min IS the numeric min.
    */
  def nearDupClusters(documents: DataFrame, minPermille: Int = 500): DataFrame = {
    def pad(c: org.apache.spark.sql.Column) = lpad(c.cast("string"), 12, "0")
    val edges = minhashPairs(documents, minPermille)
      .select(pad(col("doc_a")).as("u"), pad(col("doc_b")).as("v"))
    val cc = graft.canonicalize.ConnectedComponents.run(edges)
    val labeled = documents.select(col("doc_id"))
      .join(cc, pad(col("doc_id")) === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("component").cast("long"), col("doc_id")).as("cluster_id"))
    // count over an unordered partition frame: one shuffle on cluster_id,
    // no per-key sort semantics needed
    labeled.withColumn("cluster_size",
      count(lit(1)).over(Window.partitionBy("cluster_id")))
  }

  // ---- exact n-gram Jaccard ---------------------------------------------

  /** Exact shingle-set Jaccard for pairs sharing ≥1 shingle:
    * |A∩B| via self-join on shingle hash, |A∪B| = |A|+|B|−|A∩B|.
    * At scale the self-join is bounded by shingle-frequency blocking —
    * `maxShingleFreq` drops stop-shingles that would otherwise create
    * quadratic hot buckets (the skew guard).
    */
  def ngramJaccardPairs(documents: DataFrame, minPermille: Int = 800,
      maxShingleFreq: Int = 100): DataFrame = {
    val sh = shingles(documents)
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxShingleFreq)
    val shF = sh.join(rare.select("sh"), Seq("sh"), "left_semi")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = shF.as("l").join(shF.as("r"),
        col("l.sh") === col("r.sh") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.toDF("doc_a", "n_a"), "doc_a")
      .join(sizes.toDF("doc_b", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        floor(col("n_inter") * 1000 / (col("n_a") + col("n_b") - col("n_inter")))
          .cast("int").as("jaccard_permille"))
      .where(col("jaccard_permille") >= minPermille)
  }

  // ---- SimHash -----------------------------------------------------------

  /** 32-bit SimHash over word unigrams, computed relationally as 32 signed
    * bit sums in ONE aggregation pass.
    *
    * Round 6 (guide §2.3 — aggregate before you shuffle / shuffle fewer
    * bytes): the round-5 form exploded every distinct (doc, token) row ×32
    * bit positions and aggregated twice — the (doc_id, bit) exchange
    * carried 32× the token rows, and a second exchange re-grouped by
    * doc_id. The bit position is a compile-time constant: 32 parallel
    * `sum(case …)` aggregates (the exact pattern `minhashSignatures` uses
    * for its 12 permutations) partial-combine map-side and shuffle 32
    * longs per DOCUMENT, in a single exchange. Same arithmetic, same
    * groups: bit b's sum over a doc's tokens and the sign rule
    * `s_b > 0 → set bit b` are unchanged, so the simhash value is
    * bit-identical to the oracle mirror.
    */
  def simhash(documents: DataFrame): DataFrame = {
    val tokens = documents
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      .withColumn("h", h32(col("word")))
    val bitSums = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"s_$b")
    }
    tokens
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b =>
          when(col(s"s_$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs: 8-bit band join (4 bands over 32 bits — any pair
    * within Hamming distance 3 shares ≥1 exact band), verified by
    * `bit_count(xor) <= maxHamming`.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3,
      maxBandFreq: Int = 256): DataFrame = {
    val sh = simhash(documents)
    val bandedAll = (0 until 4).map { b =>
      sh.select(col("doc_id"), col("simhash"), lit(b).as("band"),
        shiftright(col("simhash"), b * 8).bitwiseAND(0xFF).as("band_bits"))
    }.reduce(_ unionByName _)
    val banded = capBuckets(bandedAll, Seq("band", "band_bits"), maxBandFreq)
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") &&
        col("l.band_bits") === col("r.band_bits") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  // ---- composed pipeline --------------------------------------------------

  /** The composed dedup decision a 100 TB pipeline actually calls — the
    * loader-manager analogue (reference loader_manager.py:118-225): exact
    * dedup first, MinHash/LSH near-dup clustering on the exact SURVIVORS
    * only (running the sketch family after exact dedup is what keeps LSH
    * buckets non-degenerate — see `capBuckets`), then one decision row per
    * input document:
    *
    *   (doc_id, keep, reason ∈ {exact, near, unique}, representative_id)
    *
    *  - `exact`:  byte-identical to a lower doc_id → dropped; its
    *              representative CHASES through the near stage, so
    *              representative_id is always a KEPT document.
    *  - `near`:   exact-surviving but in a near-dup cluster with a lower
    *              doc_id (transitive, via connected components) → dropped.
    *  - `unique`: the kept representative (cluster minimum), self-mapped.
    *
    * Scale shape: the exact stage is one hash-partitioned window over
    * md5(text) (equivalently a groupBy — one shuffle, map-side combined);
    * the near stage is `nearDupClusters` over the smaller survivor set; the
    * exact-dropped rows re-join the cluster map by the survivor key. No
    * all-pairs anywhere.
    */
  def dedupPipeline(documents: DataFrame, minPermille: Int = 500): DataFrame = {
    val d = documents.select("doc_id", "text")
    val w = Window.partitionBy(md5(col("text")))
    val withCanon = d.withColumn("exact_canonical", min("doc_id").over(w))
    val exactDropped = withCanon
      .where(col("doc_id") =!= col("exact_canonical"))
      .select("doc_id", "exact_canonical")
    val survivors = withCanon
      .where(col("doc_id") === col("exact_canonical"))
      .select("doc_id", "text")
    val clusters = nearDupClusters(survivors, minPermille)
      .select("doc_id", "cluster_id")
    val survivorDecision = clusters.select(
      col("doc_id"),
      (col("doc_id") === col("cluster_id")).as("keep"),
      when(col("doc_id") === col("cluster_id"), "unique").otherwise("near")
        .as("reason"),
      col("cluster_id").as("representative_id"))
    val exactDecision = exactDropped
      .join(clusters.select(col("doc_id").as("exact_canonical"),
        col("cluster_id")), "exact_canonical")
      .select(col("doc_id"), lit(false).as("keep"), lit("exact").as("reason"),
        col("cluster_id").as("representative_id"))
    survivorDecision.unionByName(exactDecision)
  }

  /** Embedding-cosine near-duplicate pairs — the semantic member of the
    * dedup family: unordered (doc_a < doc_b) pairs whose exact cosine
    * similarity reaches `minCos1e6` (1e-6 fixed point), with candidate
    * generation by multi-table sign-LSH ([[Similarity.candidates]]) so the
    * pair join shuffles on (table, bucket) keys — never all-pairs. A true
    * near-duplicate (cosine → 1) agrees with every hyperplane sign of its
    * original, so it shares the bucket in EVERY table — exactly the regime
    * where sign-LSH recall approaches 1 (the operator's target pairs, unlike
    * the isotropic far-pair regime measured by `td_ann_lsh_recall`).
    * Verification is the exact fixed-point cosine on the candidate set, so
    * every emitted pair is a true ≥-threshold pair (no false positives).
    */
  def embeddingDupPairs(embeddings: DataFrame, minCos1e6: Long,
      nBits: Int = 16, nTables: Int = 8, dim: Int = 64): DataFrame =
    Similarity.candidates(embeddings, dim, nBits, nTables)
      .where(col("vec_id") < col("neighbor_id"))
      .select(col("vec_id").as("doc_a"), col("neighbor_id").as("doc_b"),
        floor(Similarity.cosine(col("emb"), col("emb_r")) * 1e6)
          .cast("long").as("cos_1e6"))
      .where(col("cos_1e6") >= minCos1e6)
}
