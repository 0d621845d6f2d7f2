package graft.oracle

import graft.functions.TextFunctions

/** DuckDB oracle for the activity-match query (mirrors
  * matching.ActivityMatch over the synthesized xml/candidate activities of
  * SparkEntry.kg_activity_match).
  *
  * Fuzzy-ratio tiers are structurally unreachable in this dataset: non-equal
  * topic pairs have length ratios that cap fuzz.ratio below 70
  * (ratio ≤ 200·min/(min+max)), so the oracle needs only the exact-topic
  * branch; the fuzzy bands are unit-tested in ActivityMatchSpec instead.
  */
object MatchSql {

  private val prefixAlternation = TextFunctions.TopicPrefixes.mkString("|")

  private def norm(expr: String): String =
    s"trim(regexp_replace(regexp_replace(lower(trim($expr)), " +
      s"'^($prefixAlternation)\\s*', ''), '\\s+', ' ', 'g'))"

  /** F12 alias branch, generated from the same literal table as the Spark
    * expression (ActivityMatch.SoortAliases).
    */
  private val aliasCond: String =
    graft.matching.ActivityMatch.SoortAliases.map { case (main, aliases) =>
      val hits = aliases
        .map(a => s"strpos(lower(a.a_soort), '$a') > 0").mkString("(", " OR ", ")")
      s"(lower(x.x_soort) = '$main' AND $hits)"
    }.mkString("(", " OR ", ")")

  val activityMatchCtes: String =
    s"""conv_bounds AS (
       |  SELECT conv_id, CAST(substr(conv_id, 2) AS INT) AS u,
       |         MIN(epoch_us(ts)) AS beg_us, MAX(epoch_us(ts)) AS end_us
       |  FROM transcripts GROUP BY 1, 2),
       |xml_acts AS (
       |  SELECT conv_id, 0 AS xml_id, beg_us AS x_beg_us, end_us AS x_end_us,
       |         CASE WHEN u % 7 = 0 THEN 'sluiting' ELSE 'debat' END AS x_soort,
       |         'Debat over dossier ' || CAST(36000 + u % 50 AS VARCHAR) AS x_topic
       |  FROM conv_bounds),
       |acands AS (
       |  SELECT conv_id, CAST(c.cand_idx AS INT) AS cand_idx,
       |         beg_us + offs AS a_beg_us, end_us + offs AS a_end_us,
       |         CASE c.cand_idx WHEN 0 THEN 'plenair debat' WHEN 1 THEN 'debat'
       |              ELSE 'stemmingen overig' END AS a_soort,
       |         CASE c.cand_idx
       |              WHEN 0 THEN 'Dossier ' || CAST(36000 + u % 50 AS VARCHAR)
       |              WHEN 1 THEN 'Begrotingsbehandeling hoofdstuk ' || CAST(u % 12 AS VARCHAR)
       |              ELSE 'Stemmingen over ingediende moties plenair' END AS a_topic
       |  FROM (SELECT *,
       |          CASE c2.cand_idx WHEN 0 THEN CASE WHEN u % 2 = 0 THEN 0 ELSE 400000000 END
       |               WHEN 1 THEN 1000000000 ELSE 2000000000 END AS offs
       |        FROM conv_bounds, (SELECT range AS cand_idx FROM range(3)) c2) c),
       |scored AS (
       |  SELECT x.conv_id, x.xml_id, a.cand_idx,
       |    (CASE WHEN abs(x.x_beg_us - a.a_beg_us) <= 300000000 THEN 6
       |          WHEN GREATEST(x.x_beg_us, a.a_beg_us - 600000000)
       |               < LEAST(x.x_end_us, a.a_end_us + 600000000) THEN 3
       |          ELSE 0 END
       |     + CASE WHEN lower(x.x_soort) = lower(a.a_soort) THEN 4
       |            WHEN strpos(lower(a.a_soort), lower(x.x_soort)) > 0 THEN 4
       |            WHEN strpos(lower(x.x_soort), lower(a.a_soort)) > 0 THEN 3
       |            WHEN $aliasCond THEN 4
       |            ELSE 0 END
       |     + CASE WHEN ${norm("x.x_topic")} = ${norm("a.a_topic")} THEN 8
       |            ELSE 0 END) AS score_x2
       |  FROM xml_acts x JOIN acands a USING (conv_id)),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER w AS rn, LEAD(score_x2) OVER w AS runner
       |  FROM scored
       |  WINDOW w AS (PARTITION BY conv_id, xml_id ORDER BY score_x2 DESC, cand_idx)),
       |activity_match AS (
       |  SELECT conv_id, xml_id, cand_idx, score_x2,
       |         COALESCE(runner, 0) AS runner_x2,
       |         (score_x2 >= 6 OR (score_x2 - COALESCE(runner, 0) >= 2 AND score_x2 >= 2))
       |           AS accepted,
       |         CASE WHEN NOT (score_x2 >= 6 OR (score_x2 - COALESCE(runner, 0) >= 2
       |                        AND score_x2 >= 2)) THEN 'NO_MATCH'
       |              WHEN score_x2 >= 10 THEN 'EXACT' ELSE 'FUZZY' END AS match_type
       |  FROM ranked WHERE rn = 1)""".stripMargin
}
