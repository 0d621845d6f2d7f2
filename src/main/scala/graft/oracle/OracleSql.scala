package graft.oracle

import graft.synth.{Dict, TranscriptGen}

/** DuckDB oracle CTE fragments mirroring each pipeline stage.
  *
  * The driver runs these against the same parquet tables (registered as
  * `events`, `lineitem`, …) and hash-compares against the Spark results —
  * this is the correctness gate. Fragments are composed from the same
  * literal dictionaries as the Spark code (graft.synth.Dict), so dictionary
  * edits can never desynchronize the oracle.
  */
object OracleSql {

  /** `WITH persons…, fracties…, transcripts AS (…)` prefix + extra CTEs.
    * RECURSIVE so CC closure CTEs can appear anywhere in the chain (harmless
    * for non-recursive ones).
    */
  def withCtes(extra: String*)(finalSelect: String): String = {
    val ctes = (TranscriptGen.transcriptsSql +: extra).mkString(",\n")
    s"WITH RECURSIVE $ctes\n$finalSelect"
  }

  val proceduralFilter: String =
    "NOT regexp_matches(lower(text), '\\b(opening|sluiting|aanvang|einde vergadering|geschorst)\\b')"

  /** Speaker mentions (mirrors Extract.speakerMentions). */
  val speakerMentionsCte: String =
    s"""sm_raw AS (
       |  SELECT conv_id, turn_idx,
       |         regexp_extract(text, 'het woord aan (.+)$$', 1) AS woord_aan,
       |         regexp_extract(text, '^Mevrouw (.+) spreekt over', 1) AS spreekt,
       |         regexp_extract(text, '^De heer (.+) interrumpeert', 1) AS inter,
       |         regexp_extract(text, '^(.+) vraagt een reactie', 1) AS reactie
       |  FROM transcripts
       |  WHERE $proceduralFilter),
       |sm_kind AS (
       |  SELECT conv_id, turn_idx,
       |         CASE WHEN woord_aan <> '' THEN 'woord_aan'
       |              WHEN spreekt <> '' THEN 'spreekt'
       |              WHEN inter <> '' THEN 'interrumpeert'
       |              WHEN reactie <> '' THEN 'reactie' END AS kind,
       |         CASE WHEN woord_aan <> '' THEN woord_aan ELSE reactie END AS full_name,
       |         CASE WHEN spreekt <> '' THEN spreekt ELSE inter END AS sur
       |  FROM sm_raw),
       |speaker_mentions AS (
       |  SELECT conv_id, turn_idx, kind,
       |         CASE WHEN full_name <> '' THEN regexp_extract(full_name, '^(\\S+) ', 1) ELSE '' END AS v_first,
       |         CASE WHEN full_name <> '' THEN regexp_extract(full_name, '^\\S+ (.+)$$', 1) ELSE sur END AS v_last
       |  FROM sm_kind
       |  WHERE kind IS NOT NULL
       |    AND (CASE WHEN full_name <> '' THEN regexp_extract(full_name, '^\\S+ (.+)$$', 1) ELSE sur END) <> '')""".stripMargin

  /** Case mentions (mirrors Extract.caseMentions). */
  val caseMentionsCte: String =
    s"""cm_raw AS (
       |  SELECT conv_id, turn_idx,
       |         regexp_extract(text, 'dossier (\\d+(?:-[A-Za-z0-9]+)?)', 1) AS dossier_code,
       |         regexp_extract(text, 'nr\\. (\\d+)', 1) AS stuk_raw
       |  FROM transcripts
       |  WHERE $proceduralFilter),
       |case_mentions AS (
       |  SELECT conv_id, turn_idx,
       |         CAST(regexp_extract(dossier_code, '^(\\d+)(?:[-\\s]?([A-Za-z0-9]+))?$$', 1) AS INT) AS dossier_nr,
       |         regexp_extract(dossier_code, '^(\\d+)(?:[-\\s]?([A-Za-z0-9]+))?$$', 2) AS toevoeging,
       |         CASE WHEN stuk_raw <> '' THEN CAST(stuk_raw AS INT) END AS stuk_nr
       |  FROM cm_raw WHERE dossier_code <> '')""".stripMargin

  /** Vote mentions (mirrors Extract.voteMentions). */
  val voteMentionsCte: String =
    s"""vote_mentions AS (
       |  SELECT conv_id, turn_idx,
       |         regexp_extract(text, '^De fractie (.+) stemt ', 1) AS fractie_naam,
       |         regexp_extract(text, ' stemt (voor|tegen|onthouding)$$', 1) AS vote_norm
       |  FROM transcripts
       |  WHERE $proceduralFilter
       |    AND regexp_extract(text, '^De fractie (.+) stemt ', 1) <> ''
       |    AND regexp_extract(text, ' stemt (voor|tegen|onthouding)$$', 1) <> '')""".stripMargin

  /** Person linking (mirrors Link.linkPersons over the clean dictionary:
    * exact-surname block, so the oracle scores reduce to exact arithmetic).
    */
  val linkPersonsCte: String =
    s"""lp_cand AS (
       |  SELECT s.conv_id, s.turn_idx, s.v_first, s.v_last, p.persoon_id, p.fractie_id,
       |         60 + CASE WHEN s.v_first <> '' AND lower(s.v_first) = lower(p.roepnaam)
       |                   THEN 40 ELSE 0 END AS score
       |  FROM speaker_mentions s
       |  JOIN persons p
       |    ON lower(s.v_last) IN (lower(p.achternaam),
       |         lower(concat_ws(' ', nullif(p.tussenvoegsel, ''), p.achternaam)))),
       |linked_persons AS (
       |  SELECT conv_id, turn_idx, v_first, v_last, persoon_id, fractie_id, score,
       |         CASE WHEN score >= 90 THEN 'EXACT' ELSE 'FUZZY' END AS match_type
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx, v_first, v_last
       |                                     ORDER BY score DESC, persoon_id) AS rn
       |        FROM lp_cand WHERE score >= 60)
       |  WHERE rn = 1)""".stripMargin

  /** Zaak linking tier cascade (mirrors Link.linkZaken). */
  val linkZakenCte: String =
    s"""linked_zaken AS (
       |  SELECT cm.conv_id, cm.turn_idx, cm.dossier_nr, cm.stuk_nr, cm.toevoeging,
       |         COALESCE(z.zaak_id, 'D' || CAST(d.dossier_nr AS VARCHAR),
       |                  CASE WHEN doc.dossier_nr IS NOT NULL
       |                       THEN 'DOC' || CAST(doc.dossier_nr AS VARCHAR) || '-' || CAST(doc.volgnummer AS VARCHAR) END)
       |           AS entity_id,
       |         CASE WHEN z.zaak_id IS NOT NULL THEN 100
       |              WHEN d.dossier_nr IS NOT NULL THEN 75
       |              WHEN doc.dossier_nr IS NOT NULL THEN 60 ELSE 0 END AS score,
       |         CASE WHEN z.zaak_id IS NOT NULL THEN 'EXACT'
       |              WHEN d.dossier_nr IS NOT NULL OR doc.dossier_nr IS NOT NULL THEN 'FALLBACK'
       |              ELSE 'NO_MATCH' END AS match_type
       |  FROM case_mentions cm
       |  LEFT JOIN zaken z ON cm.dossier_nr = z.dossier_nr AND cm.stuk_nr = z.stuk_nr
       |  LEFT JOIN dossiers d ON cm.dossier_nr = d.dossier_nr
       |  LEFT JOIN docs doc ON cm.dossier_nr = doc.dossier_nr AND cm.stuk_nr = doc.volgnummer)""".stripMargin

  def zakenCtes: Seq[String] = Seq(Dict.zakenSql, Dict.dossiersSql, Dict.documentsSql)

  /** W1 interruption detection over the linked speaker sequence
    * (mirrors analysis.Interruptions.detect over Link.linkPersons output).
    */
  val interruptionsCte: String =
    s"""interruptions AS (
       |  SELECT conv_id, turn_idx, speaker AS interrupter, prev AS interrupted,
       |         CASE WHEN nxt IS NOT NULL AND nxt = prev
       |              THEN 'INTERRUPTION_WITH_RESPONSE'
       |              ELSE 'SIMPLE_INTERRUPTION' END AS itype
       |  FROM (SELECT conv_id, turn_idx, persoon_id AS speaker,
       |               LAG(persoon_id) OVER w AS prev,
       |               LEAD(persoon_id) OVER w AS nxt
       |        FROM linked_persons
       |        WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
       |  WHERE prev IS NOT NULL AND prev <> speaker)""".stripMargin

  private val mentionKey =
    "'mention:' || md5(concat_ws('|', conv_id, CAST(turn_idx AS VARCHAR), v_first, v_last))"
  private val voteKey =
    "'vote:' || md5(concat_ws('|', conv_id, CAST(turn_idx AS VARCHAR), fractie_naam, vote_norm))"

  /** Full triple set (mirrors triples.Triples.all). Branch preds are disjoint,
    * so SQL UNION's cross-branch dedup matches Spark's per-branch distinct.
    * Requires: linked_persons, linked_zaken, vote_mentions, interruptions,
    * persons, fracties.
    */
  val triplesCte: String =
    s"""triples AS (
       |  SELECT DISTINCT $mentionKey AS subj, 'MATCHES_PERSOON' AS pred,
       |         'persoon:' || persoon_id AS obj
       |  FROM linked_persons
       |  UNION
       |  SELECT DISTINCT 'persoon:' || persoon_id, 'SPOKE_IN', 'conv:' || conv_id
       |  FROM linked_persons
       |  UNION
       |  SELECT DISTINCT 'persoon:' || lp.persoon_id,
       |         CASE WHEN lz.match_type = 'EXACT' THEN 'DISCUSSES_ZAAK'
       |              ELSE 'DISCUSSES_DOSSIER' END,
       |         'zaak:' || lz.entity_id
       |  FROM linked_persons lp
       |  JOIN linked_zaken lz USING (conv_id, turn_idx)
       |  WHERE lz.entity_id IS NOT NULL
       |  UNION
       |  SELECT DISTINCT 'conv:' || conv_id, 'CONTAINS_SPEAKER', 'persoon:' || persoon_id
       |  FROM linked_persons
       |  UNION
       |  SELECT DISTINCT 'conv:' || conv_id, 'CONTAINS_ZAAK', 'zaak:' || entity_id
       |  FROM linked_zaken WHERE entity_id IS NOT NULL
       |  UNION
       |  SELECT DISTINCT 'persoon:' || persoon_id, 'MEMBER_OF', 'fractie:' || fractie_id
       |  FROM persons
       |  UNION
       |  SELECT DISTINCT 'persoon:' || interrupter, 'INTERRUPTED_IN', 'conv:' || conv_id
       |  FROM interruptions
       |  UNION
       |  SELECT DISTINCT 'persoon:' || interrupted, 'WAS_INTERRUPTED_IN', 'conv:' || conv_id
       |  FROM interruptions
       |  UNION
       |  SELECT DISTINCT 'persoon:' || interrupted, 'RESPONDED_IN', 'conv:' || conv_id
       |  FROM interruptions WHERE itype = 'INTERRUPTION_WITH_RESPONSE'
       |  UNION
       |  SELECT DISTINCT 'conv:' || conv_id, 'HAS_FRACTIE_VOTE', $voteKey
       |  FROM vote_mentions
       |  UNION
       |  SELECT DISTINCT $voteKey, 'CAST_BY_FRACTIE', 'fractie:' || f.fractie_id
       |  FROM vote_mentions v JOIN fracties f ON v.fractie_naam = f.naam)""".stripMargin

  /** Connected components via recursive min-reachability closure (the small
    * scale oracle for the large-star/small-star implementation) + canonical
    * map + triple rewrite (mirrors canonicalize.Canonicalize).
    */
  val canonicalCtes: String =
    s"""cc_edges AS (
       |  SELECT DISTINCT $mentionKey AS u, 'persoon:' || persoon_id AS v
       |  FROM linked_persons),
       |cc_undir AS (SELECT u, v FROM cc_edges UNION SELECT v AS u, u AS v FROM cc_edges),
       |cc_reach AS (
       |  SELECT u AS node, u AS comp FROM cc_undir
       |  UNION
       |  SELECT e.v AS node, r.comp FROM cc_reach r JOIN cc_undir e ON e.u = r.node),
       |cc_components AS (SELECT node, MIN(comp) AS component FROM cc_reach GROUP BY node),
       |canon_map AS (
       |  SELECT c.node, COALESCE(b.entity_min, b.node_min) AS canon
       |  FROM cc_components c JOIN (
       |    SELECT component,
       |           MIN(CASE WHEN node LIKE 'persoon:%' THEN node END) AS entity_min,
       |           MIN(node) AS node_min
       |    FROM cc_components GROUP BY component) b USING (component)),
       |canonical_triples AS (
       |  SELECT DISTINCT COALESCE(sm.canon, t.subj) AS subj, t.pred,
       |         COALESCE(om.canon, t.obj) AS obj
       |  FROM triples t
       |  LEFT JOIN canon_map sm ON sm.node = t.subj
       |  LEFT JOIN canon_map om ON om.node = t.obj
       |  WHERE NOT (COALESCE(sm.canon, t.subj) = COALESCE(om.canon, t.obj)
       |             AND t.pred = 'MATCHES_PERSOON'))""".stripMargin

  /** The CTE chain every triple-level query needs. */
  def tripleChain: Seq[String] =
    Seq(speakerMentionsCte, linkPersonsCte, caseMentionsCte) ++
      zakenCtes ++ Seq(linkZakenCte, voteMentionsCte, interruptionsCte, triplesCte)

  /** S2: the expanded/nested attachments collection, flattened with
    * explode_outer semantics (mirrors Expand.withAttachments +
    * flattenAttachments; the LEFT JOIN against `r.i < h % 3` keeps
    * attachment-less turns as one all-null child row).
    */
  val attachmentsCte: String = {
    val P = graft.dataops.ContentHash.P
    val maxAtt = graft.extract.Expand.MaxAttachments
    val kinds = graft.extract.Expand.Kinds
    val kindCase = s"CASE CAST((t.h + r.i) % ${kinds.size} AS INT) " +
      kinds.init.zipWithIndex.map { case (k, i) => s"WHEN $i THEN '$k'" }.mkString(" ") +
      s" ELSE '${kinds.last}' END"
    s"""att_exp AS (
       |  SELECT t.conv_id, t.turn_idx, t.role, t.tool,
       |         CASE WHEN r.i IS NOT NULL
       |              THEN md5(concat_ws('|', t.conv_id, CAST(t.turn_idx AS VARCHAR),
       |                                 CAST(r.i AS VARCHAR))) END AS att_id,
       |         CASE WHEN r.i IS NOT NULL THEN $kindCase END AS kind,
       |         CASE WHEN r.i IS NOT NULL
       |              THEN CAST((t.h + r.i * 37) % 100000 AS INT) END AS size_bytes
       |  FROM (SELECT conv_id, turn_idx, role, tool,
       |               (('0x' || substr(md5(text), 1, 8))::BIGINT % $P) AS h
       |        FROM transcripts) t
       |  LEFT JOIN (SELECT range AS i FROM range($maxAtt)) r ON r.i < t.h % $maxAtt)""".stripMargin
  }

  /** Second nesting level (mirrors the `chunks` array inside each
    * attachment struct, Expand.withAttachments): `size_bytes % 2 + 1`
    * chunks per attachment; attachment-less turns keep one all-null row
    * (the double `explode_outer` shape).
    */
  val attachmentChunksCte: String = {
    val maxChunks = graft.extract.Expand.MaxChunks
    s"""att_chunks AS (
       |  SELECT a.conv_id, a.turn_idx, a.att_id, a.size_bytes,
       |         CASE WHEN c.s IS NOT NULL
       |              THEN md5(a.att_id || '|' || CAST(c.s AS VARCHAR)) END AS chunk_id,
       |         CASE WHEN c.s IS NOT NULL THEN CAST(c.s AS INT) END AS seq,
       |         CASE WHEN c.s IS NOT NULL
       |              THEN CAST((a.size_bytes + c.s * 13) % 4096 AS INT) END AS chunk_bytes
       |  FROM att_exp a
       |  LEFT JOIN (SELECT range AS s FROM range($maxChunks)) c
       |    ON a.att_id IS NOT NULL AND c.s < a.size_bytes % $maxChunks + 1)""".stripMargin
  }

  /** REL_MAP-driven edges over the expanded turn (mirrors RelMap.TurnRels,
    * incl. the two-level attachment→chunk spec).
    */
  val relmapEdgesCte: String =
    s"""relmap_edges AS (
       |  SELECT 'turn:' || conv_id || ':' || CAST(turn_idx AS VARCHAR) AS subj,
       |         'HAS_ATTACHMENT' AS pred, 'attachment:' || att_id AS obj
       |  FROM att_exp WHERE att_id IS NOT NULL
       |  UNION ALL
       |  SELECT 'attachment:' || att_id, 'HAS_CHUNK', 'chunk:' || chunk_id
       |  FROM att_chunks WHERE chunk_id IS NOT NULL
       |  UNION ALL
       |  SELECT 'turn:' || conv_id || ':' || CAST(turn_idx AS VARCHAR),
       |         'USED_TOOL', 'tool:' || tool
       |  FROM transcripts WHERE tool IS NOT NULL
       |  UNION ALL
       |  SELECT 'turn:' || conv_id || ':' || CAST(turn_idx AS VARCHAR),
       |         'IN_CONV', 'conv:' || conv_id
       |  FROM transcripts)""".stripMargin

  /** J2: per-conversation activity-actor sets (mirrors the SparkEntry
    * synthesis: even-u conversations carry the P24 Jansen clone).
    */
  val actorsCte: String =
    """actors AS (
      |  SELECT DISTINCT conv_id,
      |         CASE WHEN CAST(substr(conv_id, 2) AS INT) % 2 = 0
      |              THEN 'P24' ELSE 'P01' END AS persoon_id
      |  FROM transcripts)""".stripMargin

  /** J2: actor-priority person linking over the extended dictionary
    * (mirrors Link.linkPersonsPriority; exact arithmetic is valid because
    * the extended dictionary still has no NEAR-duplicate surnames — the
    * only shared surname is the exact clone).
    */
  val linkPriorityCte: String =
    s"""prio_cand AS (
       |  SELECT s.conv_id, s.turn_idx, s.v_first, s.v_last, p.persoon_id, p.fractie_id,
       |         60 + CASE WHEN s.v_first <> '' AND lower(s.v_first) = lower(p.roepnaam)
       |                   THEN 40 ELSE 0 END AS score,
       |         0 AS source_rank
       |  FROM speaker_mentions s
       |  JOIN actors a ON a.conv_id = s.conv_id
       |  JOIN persons_ext p ON p.persoon_id = a.persoon_id
       |   AND lower(s.v_last) IN (lower(p.achternaam),
       |         lower(concat_ws(' ', nullif(p.tussenvoegsel, ''), p.achternaam)))
       |  UNION ALL
       |  SELECT s.conv_id, s.turn_idx, s.v_first, s.v_last, p.persoon_id, p.fractie_id,
       |         60 + CASE WHEN s.v_first <> '' AND lower(s.v_first) = lower(p.roepnaam)
       |                   THEN 40 ELSE 0 END AS score,
       |         1 AS source_rank
       |  FROM speaker_mentions s
       |  JOIN persons_ext p
       |    ON lower(s.v_last) IN (lower(p.achternaam),
       |         lower(concat_ws(' ', nullif(p.tussenvoegsel, ''), p.achternaam)))),
       |linked_priority AS (
       |  SELECT conv_id, turn_idx, v_first, v_last, persoon_id, fractie_id, score,
       |         CASE WHEN source_rank = 0 THEN 'actor' ELSE 'global' END AS source,
       |         CASE WHEN score >= 90 THEN 'EXACT' ELSE 'FUZZY' END AS match_type
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx, v_first, v_last
       |                                     ORDER BY source_rank, score DESC, persoon_id) AS rn
       |        FROM prio_cand WHERE score >= 60)
       |  WHERE rn = 1)""".stripMargin

  /** J7: agendapunt→zaak refs of the candidate activities (mirrors the
    * SparkEntry synthesis), and the XML ∪ agendapunt union (U1).
    */
  val apZakenCte: String =
    """ap_zaken AS (
      |  SELECT conv_id, CAST(c.cand_idx AS INT) AS cand_idx,
      |         CAST(36000 + (u + c.cand_idx + 3) % 50 AS INT) AS dossier_nr,
      |         CAST(1 + (u + c.cand_idx) % 7 AS INT) AS stuk_nr
      |  FROM conv_bounds, (SELECT range AS cand_idx FROM range(3)) c)""".stripMargin

  val linkZakenUnionCte: String =
    """linked_zaken_union AS (
      |  SELECT conv_id, turn_idx, dossier_nr, stuk_nr, entity_id, score, match_type,
      |         'xml' AS source
      |  FROM linked_zaken
      |  UNION ALL
      |  SELECT m.conv_id, CAST(NULL AS INT) AS turn_idx, a.dossier_nr, a.stuk_nr,
      |         z.zaak_id AS entity_id, 100 AS score, 'EXACT' AS match_type,
      |         'agendapunt' AS source
      |  FROM activity_match m
      |  JOIN ap_zaken a USING (conv_id, cand_idx)
      |  JOIN zaken z ON a.dossier_nr = z.dossier_nr AND a.stuk_nr = z.stuk_nr
      |  WHERE m.accepted)""".stripMargin
}
