package graft.analysis

import org.apache.spark.sql.DataFrame
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
  *    Dedup.capBuckets and takes the same frequency-cap fix (AQE skew
  *    splitting covers the moderate case).
  *  - `twoHopReach` / `triangles`: neighborhood expansion over the
  *    dimension-bounded projection. Triangle enumeration uses the oriented
  *    (p1 < p2) edge list, so each triangle is emitted exactly once and
  *    the join fan-out is bounded by the oriented degree (the standard
  *    distributed-triangle trick: high-degree nodes orient most edges
  *    outward-by-id, halving the worst-case join).
  *  - `pageRank`: fixed-point INTEGER PageRank (scale 1e12, damping
  *    85/100, uniform init) so the result is bit-identical across engines
  *    — float PageRank cannot sit inside a hash-equality gate. Dangling
  *    mass is dropped (the common SQL variant), documented here; ranks
  *    are therefore a centrality ORDER, not a probability distribution.
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

  /** Persoon–persoon co-discussion projection: an oriented (p1 < p2) edge
    * for each pair of persons that DISCUSSES the same zaak entity.
    */
  def coDiscussion(triples: DataFrame): DataFrame = {
    val d = triples
      .where(col("pred").isin("DISCUSSES_ZAAK", "DISCUSSES_DOSSIER"))
      .select(col("subj").as("p"), col("obj").as("z"))
      .distinct()
    d.as("a").join(d.as("b"),
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
    *
    * Every division is BIGINT truncation toward zero on non-negative
    * operands, so Spark `div` ≡ DuckDB `//` and the hash gate holds.
    */
  val PageRankScale: Long = 1000000000000L

  def pageRank(triples: DataFrame, iters: Int = 10): DataFrame = {
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
      // plan truncation per round — without it Catalyst re-optimizes a
      // tree that doubles per iteration (see ConnectedComponents)
      ranks = graft.util.Ckpt(
        nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + coalesce(col("contrib"), lit(0L))).as("rank_fp")))
    }
    ranks
  }
}
