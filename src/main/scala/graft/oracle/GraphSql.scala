package graft.oracle

/** DuckDB mirrors of the graph-analytics operators
  * (graft.analysis.GraphAnalytics) over the canonical triple set. All
  * fragments assume the `canonical_triples` CTE (OracleSql.canonicalCtes)
  * is already in scope.
  */
object GraphSql {

  /** Distinct directed edge set + node set + out-degrees — the shared
    * basis of every graph query (mirrors the `edges`/`nodes`/`out` frames
    * in GraphAnalytics).
    *
    * AS MATERIALIZED (DuckDB-only syntax; these fragments never reach
    * Spark): the planner otherwise INLINES a CTE at every reference, so a
    * multiply-referenced frame re-evaluates the entire upstream triple
    * chain per reference — the 10-iteration PageRank unroll would re-run
    * extract+link ~30×.
    */
  val graphBaseCtes: String =
    """gedges AS MATERIALIZED (SELECT DISTINCT subj, obj FROM canonical_triples),
      |gnodes AS MATERIALIZED (
      |  -- DuckDB 1.0.0: a bare UNION as the BODY of a MATERIALIZED CTE can
      |  -- lose its dedup inside a large chain (observed: 2x rows) — keep
      |  -- the set-op UNION ALL and dedup with an explicit DISTINCT
      |  SELECT DISTINCT node FROM (
      |    SELECT subj AS node FROM gedges UNION ALL SELECT obj FROM gedges)),
      |gout AS MATERIALIZED (SELECT subj, CAST(COUNT(*) AS BIGINT) AS out_deg FROM gedges GROUP BY subj)""".stripMargin

  /** Per-node degree (mirrors GraphAnalytics.degrees). */
  val degreesCte: String =
    """gdegrees AS (
      |  SELECT node, CAST(SUM(is_out) AS BIGINT) AS out_deg,
      |         CAST(SUM(is_in) AS BIGINT) AS in_deg,
      |         CAST(SUM(is_out) + SUM(is_in) AS BIGINT) AS degree
      |  FROM (SELECT subj AS node, 1 AS is_out, 0 AS is_in FROM gedges
      |        UNION ALL
      |        SELECT obj AS node, 0 AS is_out, 1 AS is_in FROM gedges)
      |  GROUP BY node)""".stripMargin

  /** Oriented persoon–persoon co-discussion projection
    * (mirrors GraphAnalytics.coDiscussion).
    */
  val coDiscussionCte: String =
    """gdset AS MATERIALIZED (
      |  SELECT DISTINCT subj AS p, obj AS z FROM canonical_triples
      |  WHERE pred IN ('DISCUSSES_ZAAK', 'DISCUSSES_DOSSIER')),
      |codisc AS MATERIALIZED (
      |  SELECT DISTINCT a.p AS p1, b.p AS p2
      |  FROM gdset a JOIN gdset b ON a.z = b.z AND a.p < b.p)""".stripMargin

  /** ≤2-hop undirected reach counts (mirrors GraphAnalytics.twoHopReach). */
  val twoHopCte: String =
    """gundir AS MATERIALIZED (
      |           -- UNION ALL + DISTINCT: see gnodes (DuckDB materialized
      |           -- set-op dedup bug); oriented pairs are disjoint from
      |           -- their mirrors anyway, so ALL is also exact here
      |           SELECT DISTINCT u, v FROM (
      |             SELECT p1 AS u, p2 AS v FROM codisc
      |             UNION ALL SELECT p2 AS u, p1 AS v FROM codisc)),
      |twohop AS (
      |  SELECT node, CAST(COUNT(DISTINCT nbr) AS BIGINT) AS reach2
      |  FROM (SELECT u AS node, v AS nbr FROM gundir
      |        UNION ALL
      |        SELECT a.u AS node, b.v AS nbr
      |        FROM gundir a JOIN gundir b ON a.v = b.u
      |        WHERE b.v <> a.u)
      |  GROUP BY node)""".stripMargin

  /** Per-node triangle participation (mirrors GraphAnalytics.triangles). */
  val trianglesCte: String =
    """gtri AS MATERIALIZED (
      |  SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
      |  FROM codisc e1
      |  JOIN codisc e2 ON e2.p1 = e1.p2
      |  JOIN codisc e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
      |gtricount AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
      |  FROM (SELECT a AS node FROM gtri
      |        UNION ALL SELECT b FROM gtri
      |        UNION ALL SELECT c FROM gtri)
      |  GROUP BY node)""".stripMargin

  /** Unrolled fixed-point PageRank — one CTE per iteration, ending in
    * `pr<iters>`. The arithmetic contract (scale 1e12, damping 85/100,
    * BIGINT truncating division at the same points) matches
    * GraphAnalytics.pageRank exactly; `//` on non-negative BIGINTs is
    * Spark's `div`.
    */
  def pageRankCtes(iters: Int): String = {
    val s = graft.analysis.GraphAnalytics.PageRankScale
    val pr0 =
      s"""gn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM gnodes),
         |pr0 AS MATERIALIZED (SELECT node, (SELECT $s // n FROM gn) AS rank_fp FROM gnodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""pr$i AS MATERIALIZED (
         |  SELECT g.node,
         |         (SELECT ($s * 15 // 100) // n FROM gn)
         |           + COALESCE(c.contrib, 0) AS rank_fp
         |  FROM gnodes g
         |  LEFT JOIN (SELECT e.obj AS node,
         |                    CAST(SUM(p.rank_fp * 85 // (100 * o.out_deg)) AS BIGINT) AS contrib
         |             FROM gedges e
         |             JOIN pr${i - 1} p ON p.node = e.subj
         |             JOIN gout o ON o.subj = e.subj
         |             GROUP BY e.obj) c ON c.node = g.node)""".stripMargin
    }
    (pr0 +: steps).mkString(",\n")
  }

  /** Mass-preserving PageRank unroll (mirrors
    * GraphAnalytics.pageRank(…, preserveDanglingMass = true)): each
    * iteration adds the uniformly-redistributed dangling mass,
    * `(Σ rank of no-out-edge nodes · 85) // (100 · n)` — BIGINT truncation
    * at exactly the Spark `div` points, so the variant sits inside the
    * hash gate like the default. Ends in `prp<iters>`.
    */
  def pageRankPreservedCtes(iters: Int): String = {
    val s = graft.analysis.GraphAnalytics.PageRankScale
    val pr0 =
      s"""gn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM gnodes),
         |prp0 AS MATERIALIZED (SELECT node, (SELECT $s // n FROM gn) AS rank_fp FROM gnodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""prp$i AS MATERIALIZED (
         |  SELECT g.node,
         |         (SELECT ($s * 15 // 100) // n FROM gn)
         |           + COALESCE(c.contrib, 0)
         |           -- CAST: DuckDB SUM(BIGINT) is HUGEINT and would promote
         |           -- the whole rank to a pandas float — same reason the
         |           -- contrib sum below is cast
         |           + (SELECT CAST((COALESCE(SUM(p.rank_fp), 0) * 85)
         |                        // (100 * (SELECT n FROM gn)) AS BIGINT)
         |              FROM prp${i - 1} p
         |              LEFT JOIN gout o ON o.subj = p.node
         |              WHERE o.subj IS NULL) AS rank_fp
         |  FROM gnodes g
         |  LEFT JOIN (SELECT e.obj AS node,
         |                    CAST(SUM(p.rank_fp * 85 // (100 * o.out_deg)) AS BIGINT) AS contrib
         |             FROM gedges e
         |             JOIN prp${i - 1} p ON p.node = e.subj
         |             JOIN gout o ON o.subj = e.subj
         |             GROUP BY e.obj) c ON c.node = g.node)""".stripMargin
    }
    (pr0 +: steps).mkString(",\n")
  }
}
