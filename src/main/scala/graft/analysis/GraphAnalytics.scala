package graft.analysis

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Graph analytics over the materialized knowledge graph — the query
  * surface a user of the reference runs AFTER construction (the reference
  * hands its graph to Neo4j and runs Cypher over it; analysis_queries in
  * the reference repo's README and test_queries.py exercise degree-style
  * and neighborhood-style reads). Here the same analyses run directly on
  * the canonical triple Dataset, Spark-first.
  *
  * All operators take the canonical `(subj, pred, obj)` triple set and are
  * expressed as declarative plans:
  *
  *  - `degrees`: one union + one hash aggregate (map-side combined) — no
  *    join. Scales as a single shuffle on node key.
  *  - `coDiscussion`: the persoon–persoon projection of DISCUSSES_* edges
  *    via a self-equi-join on the zaak key. The join key is the zaak — a
  *    DIMENSION key — so the shuffle is bounded by the linked-edge set,
  *    not the corpus; hot-zaak skew at 100 TB is the same failure mode as
  *    an uncapped LSH band and takes the same frequency-cap guard
  *    (`maxZaakPersons`, dropped keys emitted as data; AQE skew splitting
  *    covers the moderate case below the cap).
  *  - `twoHopReach` / `triangles`: neighborhood expansion over the
  *    dimension-bounded projection. Triangle enumeration uses the oriented
  *    (p1 < p2) edge list, so each triangle is emitted exactly once and
  *    the join fan-out is bounded by the oriented degree (the standard
  *    distributed-triangle trick: high-degree nodes orient most edges
  *    outward-by-id, halving the worst-case join).
  *  - `pageRank`: fixed-point INTEGER PageRank (scale 1e12, damping
  *    85/100, uniform init) so the result is bit-identical across engines
  *    — float PageRank cannot sit inside a hash-equality gate. Dangling
  *    mass is dropped by default (the common SQL variant; ranks are then
  *    a centrality ORDER, not a probability distribution);
  *    `preserveDanglingMass = true` redistributes it uniformly each
  *    iteration (the reference-grade read — rank sum stays ≈ S up to
  *    integer-truncation drift, asserted in GraphAnalyticsSpec) at the
  *    cost of one extra node-sized scalar aggregate per iteration.
  *    Each iteration is one co-partitioned join + one hash aggregate; the
  *    edge list is pre-partitioned by src once and the per-iteration plan
  *    is truncated (graft.util.Ckpt) so Catalyst never re-optimizes a
  *    growing tree — the Spark-SQL idiom for bounded iterative dataflow
  *    (same shape as canonicalize.ConnectedComponents).
  */
object GraphAnalytics {

  /** Per-node out/in/total degree over the DISTINCT (subj, obj) edge set.
    * Multi-predicate parallel edges count once — degree is neighbors-ish,
    * matching the oracle's `gedges` dedup.
    */
  def degrees(triples: DataFrame): DataFrame = {
    val edges = triples.select("subj", "obj").distinct()
    // one scan of the deduped edge set: a union of two projections would
    // repeat the dedup aggregate (and its exchange) in both branches —
    // explode(array(...)) emits both directions from a single pass
    edges
      .select(explode(array(
        struct(col("subj").as("node"), lit(1L).as("is_out"), lit(0L).as("is_in")),
        struct(col("obj").as("node"), lit(0L).as("is_out"), lit(1L).as("is_in"))
      )).as("e"))
      .select("e.*")
      .groupBy("node")
      .agg(sum("is_out").as("out_deg"), sum("is_in").as("in_deg"))
      .withColumn("degree", col("out_deg") + col("in_deg"))
  }

  /** Frequency cap on the co-discussion self-join key: a zaak discussed by
    * f persons fans out to f·(f−1)/2 pairs, so one viral zaak at 100 TB
    * (f ~ 10^5 speakers) alone emits ~5·10^9 pairs into ONE shuffle
    * partition — the same quadratic hot-bucket failure as an uncapped LSH
    * band, and it takes the same guard (Dedup.capBuckets): keys above the
    * cap are DROPPED from the projection, and the drop is emitted as data
    * (an `Observation`), never silent. 1024 persons/zaak ≈ 524k pairs per
    * key — well inside one task — while real parliamentary zaken are
    * discussed by at most a few hundred persons, so the default never
    * engages on clean corpora (hash-verified: `kg_two_hop`/`kg_triangles`
    * match the uncapped DuckDB oracle at sf0.01).
    */
  val DefaultMaxZaakPersons: Int = 1024

  /** Persoon–persoon co-discussion projection: an oriented (p1 < p2) edge
    * for each pair of persons that DISCUSSES the same zaak entity.
    *
    * @param maxZaakPersons hot-key guard (see [[DefaultMaxZaakPersons]])
    * @param droppedObs optional observation riding the frequency frame;
    *   reports `dropped_zaak_keys` (capped-away keys) and
    *   `dropped_zaak_rows` (person–zaak rows they carried)
    */
  def coDiscussion(triples: DataFrame,
      maxZaakPersons: Int = DefaultMaxZaakPersons,
      droppedObs: Option[Observation] = None): DataFrame = {
    val d = triples
      .where(col("pred").isin("DISCUSSES_ZAAK", "DISCUSSES_DOSSIER"))
      .select(col("subj").as("p"), col("obj").as("z"))
      .distinct()
    // per-key frequency BEFORE the self-join; the observe node sees every
    // key (it sits above the aggregate, below the filter), so the dropped
    // volume is counted exactly once per action
    val freq0 = d.groupBy("z").agg(count(lit(1)).as("zf"))
    val freq = droppedObs
      .map(o => freq0.observe(o,
        sum(when(col("zf") > maxZaakPersons, 1L).otherwise(0L))
          .as("dropped_zaak_keys"),
        sum(when(col("zf") > maxZaakPersons, col("zf")).otherwise(0L))
          .as("dropped_zaak_rows")))
      .getOrElse(freq0)
    val capped = d.join(
      freq.where(col("zf") <= maxZaakPersons).select("z"), Seq("z"), "left_semi")
    capped.as("a").join(capped.as("b"),
        col("a.z") === col("b.z") && col("a.p") < col("b.p"))
      .select(col("a.p").as("p1"), col("b.p").as("p2"))
      .distinct()
  }

  /** Distinct persons reachable within ≤ 2 undirected co-discussion hops
    * (self excluded at hop 2; a 1-hop neighbor stays counted even when it
    * also appears at hop 2 — COUNT DISTINCT over the union).
    */
  def twoHopReach(triples: DataFrame): DataFrame = {
    val co = coDiscussion(triples)
    val undir = co.select(col("p1").as("u"), col("p2").as("v"))
      .unionByName(co.select(col("p2").as("u"), col("p1").as("v")))
    val oneHop = undir.select(col("u").as("node"), col("v").as("nbr"))
    val twoHop = undir.as("a").join(undir.as("b"), col("a.v") === col("b.u"))
      .where(col("b.v") =!= col("a.u"))
      .select(col("a.u").as("node"), col("b.v").as("nbr"))
    oneHop.unionByName(twoHop)
      .groupBy("node")
      .agg(countDistinct("nbr").as("reach2"))
  }

  /** Per-node triangle participation count in the co-discussion graph.
    * Oriented enumeration (a < b < c via the p1 < p2 edge list): each
    * triangle found once, then exploded to its three corners for the
    * per-node counts.
    */
  def triangles(triples: DataFrame): DataFrame = {
    val co = coDiscussion(triples)
    val tri = co.as("e1")
      .join(co.as("e2"), col("e2.p1") === col("e1.p2"))
      .join(co.as("e3"),
        col("e3.p1") === col("e1.p1") && col("e3.p2") === col("e2.p2"))
      .select(col("e1.p1").as("a"), col("e1.p2").as("b"), col("e2.p2").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-point integer PageRank, the exact arithmetic contract mirrored
    * by `graft.oracle.GraphSql.pageRankCtes`:
    *
    *   S      = 1e12 (rank scale)
    *   n      = |nodes|, base = (S·15/100)/n, r0 = S/n   (integer div)
    *   share  = (rank·85) div (100·out_deg)              (per out-edge)
    *   rank'  = base + Σ shares over in-edges            (missing → 0)
    *            [+ (Σ dangling rank · 85) div (100·n) when
    *             preserveDanglingMass — GraphSql.pageRankPreservedCtes]
    *
    * Every division is BIGINT truncation toward zero on non-negative
    * operands, so Spark `div` ≡ DuckDB `//` and the hash gate holds.
    */
  val PageRankScale: Long = 1000000000000L

  def pageRank(triples: DataFrame, iters: Int = 10,
      preserveDanglingMass: Boolean = false): DataFrame = {
    val S = PageRankScale
    // edge list partitioned by src ONCE; every iteration's join reuses it
    // (ranks — node-sized, the small side — move to the edges, never the
    // reverse), and the checkpoint pins the partitioning across iterations
    val edges = graft.util.Ckpt(
      triples.select("subj", "obj").distinct().repartition(col("subj")))
    val out = edges.groupBy("subj").agg(count(lit(1)).as("out_deg"))
    val nodes = graft.util.Ckpt(
      edges.select(col("subj").as("node"))
        .unionByName(edges.select(col("obj").as("node"))).distinct())
    val n = nodes.count()
    val base = (S * 15 / 100) / n
    var ranks = nodes.select(col("node"), lit(S / n).as("rank_fp"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks, edges("subj") === ranks("node"))
        .join(out, "subj")
        .select(col("obj").as("node"),
          expr("(rank_fp * 85) div (100 * out_deg)").as("share"))
        .groupBy("node").agg(sum("share").as("contrib"))
      val next =
        if (!preserveDanglingMass)
          nodes.join(contrib, Seq("node"), "left")
            .select(col("node"),
              (lit(base) + coalesce(col("contrib"), lit(0L))).as("rank_fp"))
        else {
          // mass-preserving variant: dangling nodes (no out-edges) would
          // leak 85% of their rank each round in the drop variant — here
          // their summed mass is redistributed uniformly,
          // (dang·85) div (100·n) per node. One extra node-sized scalar
          // aggregate per iteration (over the CACHED previous ranks — a
          // one-row frame broadcast back via crossJoin, never a collect),
          // integer-exact at the same truncation points as the DuckDB
          // mirror (GraphSql.pageRankPreservedCtes), so it sits inside the
          // hash gate like the default.
          val dang = ranks
            .join(out.select(col("subj").as("node")), Seq("node"), "left_anti")
            .agg(coalesce(sum("rank_fp"), lit(0L)).as("dang_fp"))
          nodes.join(contrib, Seq("node"), "left")
            .crossJoin(broadcast(dang))
            .select(col("node"),
              (lit(base) + coalesce(col("contrib"), lit(0L)) +
                expr(s"(dang_fp * 85) div (100 * ${n}L)")).as("rank_fp"))
        }
      // plan truncation per round — without it Catalyst re-optimizes a
      // tree that doubles per iteration (see ConnectedComponents)
      ranks = graft.util.Ckpt(next)
    }
    ranks
  }
}
