package graft.triples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Interruptions
import graft.functions.TextFunctions
import graft.model.{InterruptionType, Pred}

/** Triple extraction — emits the typed `(subj, pred, obj)` Dataset that is the
  * canonical output unit of the pipeline (north rule), re-expressing the
  * reference's per-match Neo4j MERGE calls
  * (src/loaders/vlos_neo4j_loader.py:213-544) as declarative unions.
  *
  * Node-key convention: keys are namespaced (`persoon:P03`, `conv:c17`,
  * `zaak:Z36001-2`, `fractie:F05`, `mention:<md5>`, `vote:<md5>`) so one
  * string column carries (label, business key) — the reference's
  * (label, key-prop) pair (src/utils/helpers.py:13-27). Synthetic IDs are
  * content-stable md5 (the reference's process-salted Python `hash` is a
  * documented non-determinism we deliberately fix — SURVEY.md §7.4 / F13).
  *
  * Scale: every branch below is a narrow projection or a per-key
  * partial-aggregated distinct over already-linked rows; the only joins are
  * same-key equi-joins on `(conv_id, turn_idx)` (co-partitioned) and a
  * broadcast dim join for vote→fractie (J12). `unionByName` of the branches
  * introduces no shuffle of its own.
  */
object Triples {

  private val P = "persoon:"
  private val C = "conv:"
  private val F = "fractie:"

  private def zaakKey = concat(lit("zaak:"), col("entity_id"))
  private def persoonKey = concat(lit(P), col("persoon_id"))
  private def convKey = concat(lit(C), col("conv_id"))

  private def tri(subj: org.apache.spark.sql.Column, pred: String,
      obj: org.apache.spark.sql.Column)(df: DataFrame): DataFrame =
    df.select(subj.as("subj"), lit(pred).as("pred"), obj.as("obj")).distinct()

  /** Projection without dedup — for branches whose input is already unique
    * per output key (one linker row per mention / one dict row per entity):
    * skipping the redundant `distinct` removes a full shuffle of the widest
    * data per branch.
    */
  private def triRaw(subj: org.apache.spark.sql.Column, pred: String,
      obj: org.apache.spark.sql.Column)(df: DataFrame): DataFrame =
    df.select(subj.as("subj"), lit(pred).as("pred"), obj.as("obj"))

  /** Mention provenance: VlosSpeaker-node MATCHES_PERSOON edge
    * (reference vlos_neo4j_loader.py:239-258).
    */
  def mentionMatches(linkedPersons: DataFrame): DataFrame =
    // linker emits exactly one row per mention key (argmax rn=1), so the
    // mention-keyed triple is unique by construction — no dedup shuffle
    triRaw(
      concat(lit("mention:"), TextFunctions.stableId(
        col("conv_id"), col("turn_idx"), col("v_first"), col("v_last"))),
      Pred.MatchesPersoon, persoonKey)(linkedPersons)

  /** (persoon, SPOKE_IN, conv) — reference loader :258-318. */
  def spokeIn(linkedPersons: DataFrame): DataFrame =
    tri(persoonKey, Pred.SpokeIn, convKey)(linkedPersons)

  /** Same-turn speaker × case co-occurrence → DISCUSSES_ZAAK (tier-1 zaak
    * match) or DISCUSSES_DOSSIER (dossier/document fallback tiers) —
    * reference connection semantics vlos_pipeline.py:324-353 with tier split
    * per :280-308. Equi-join on (conv_id, turn_idx): both sides derive from
    * the same scan, so at scale this is a co-partitioned join.
    */
  def discusses(linkedPersons: DataFrame, linkedZaken: DataFrame): DataFrame = {
    val z = linkedZaken.where(col("entity_id").isNotNull)
      .select("conv_id", "turn_idx", "entity_id", "match_type")
    val joined = linkedPersons.select("conv_id", "turn_idx", "persoon_id")
      .join(z, Seq("conv_id", "turn_idx"))
    joined.select(
      persoonKey.as("subj"),
      when(col("match_type") === graft.model.MatchType.Exact, Pred.DiscussesZaak)
        .otherwise(Pred.DiscussesDossier).as("pred"),
      zaakKey.as("obj")).distinct()
  }

  /** Conversation provenance edges (reference CONTAINS_* edges, loader :420-470). */
  def containment(linkedPersons: DataFrame, linkedZaken: DataFrame): DataFrame =
    tri(convKey, Pred.ContainsSpeaker, persoonKey)(linkedPersons)
      .unionByName(tri(convKey, Pred.ContainsZaak, zaakKey)(
        linkedZaken.where(col("entity_id").isNotNull)))

  /** Raw (non-deduplicated) forms of the multi-valued branches, fused under
    * ONE distinct in `all`/`allNonMention`: ten per-branch distinct
    * exchanges become one — same final set (dedup is idempotent and
    * branches have disjoint predicates), an order of magnitude fewer
    * shuffle barriers/AQE jobs per action (pure driver-serial latency in
    * the scaling budget).
    */
  private def spokeInRaw(lp: DataFrame) = triRaw(persoonKey, Pred.SpokeIn, convKey)(lp)

  private def discussesRaw(lp: DataFrame, lz: DataFrame): DataFrame = {
    val z = lz.where(col("entity_id").isNotNull)
      .select("conv_id", "turn_idx", "entity_id", "match_type")
    lp.select("conv_id", "turn_idx", "persoon_id")
      .join(z, Seq("conv_id", "turn_idx"))
      .select(
        persoonKey.as("subj"),
        when(col("match_type") === graft.model.MatchType.Exact, Pred.DiscussesZaak)
          .otherwise(Pred.DiscussesDossier).as("pred"),
        zaakKey.as("obj"))
  }

  private def containmentRaw(lp: DataFrame, lz: DataFrame): DataFrame =
    triRaw(convKey, Pred.ContainsSpeaker, persoonKey)(lp)
      .unionByName(triRaw(convKey, Pred.ContainsZaak, zaakKey)(
        lz.where(col("entity_id").isNotNull)))

  private def interruptionsRaw(linkedSpeakers: DataFrame): DataFrame = {
    val events = Interruptions.detect(linkedSpeakers)
    triRaw(concat(lit(P), col("interrupter")), Pred.InterruptedIn, convKey)(events)
      .unionByName(
        triRaw(concat(lit(P), col("interrupted")), Pred.WasInterruptedIn, convKey)(events))
      .unionByName(
        triRaw(concat(lit(P), col("interrupted")), Pred.RespondedIn, convKey)(
          events.where(col("itype") === InterruptionType.WithResponse)))
  }

  /** Dictionary membership edges (reference Persoon→Fractie via
    * FractieZetelPersoon; dims are part of the graph, seed_enums parity).
    */
  def memberOf(persons: DataFrame): DataFrame =
    triRaw(persoonKey, Pred.MemberOf, concat(lit(F), col("fractie_id")))(persons)

  /** Interruption triples from the W1 sequence analysis —
    * reference loader :471-520.
    */
  def interruptions(linkedSpeakers: DataFrame): DataFrame = {
    val events = Interruptions.detect(linkedSpeakers)
    val interrupter = tri(concat(lit(P), col("interrupter")), Pred.InterruptedIn, convKey)(events)
    val interrupted = tri(concat(lit(P), col("interrupted")), Pred.WasInterruptedIn, convKey)(events)
    val responded = tri(concat(lit(P), col("interrupted")), Pred.RespondedIn, convKey)(
      events.where(col("itype") === InterruptionType.WithResponse))
    interrupter.unionByName(interrupted).unionByName(responded)
  }

  /** Vote triples: synthetic vote node per utterance, fractie resolved by
    * name (J12 — reference vlos_neo4j_loader.py:536-540). `fracties` is a
    * broadcast dim.
    */
  def votes(voteMentions: DataFrame, fracties: DataFrame): DataFrame = {
    val withId = voteMentions
      .join(broadcast(fracties.select(col("naam"), col("fractie_id"))),
        voteMentions("fractie_naam") === col("naam"))
      .withColumn("vote_key", concat(lit("vote:"), TextFunctions.stableId(
        col("conv_id"), col("turn_idx"), col("fractie_naam"), col("vote_norm"))))
    // ≤1 vote mention per turn and the vote key embeds (conv, turn, naam,
    // vote) — both branches unique by construction
    triRaw(convKey, Pred.HasFractieVote, col("vote_key"))(withId)
      .unionByName(
        triRaw(col("vote_key"), Pred.CastByFractie, concat(lit(F), col("fractie_id")))(withId))
  }

  /** Every branch except mention provenance — the input to the scale-path
    * canonicalization (`Canonicalize.canonicalTriples`), which proves the
    * mention branch always self-loops away. Raw branches fused under ONE
    * distinct (see the raw-branch Scaladoc), so the result is a set.
    */
  def allNonMention(linkedPersons: DataFrame, linkedZaken: DataFrame,
      voteMentions: DataFrame, persons: DataFrame, fracties: DataFrame): DataFrame = {
    val speakers = linkedPersons
      .select(col("conv_id"), col("turn_idx"), col("persoon_id").as("speaker"))
    spokeInRaw(linkedPersons)
      .unionByName(discussesRaw(linkedPersons, linkedZaken))
      .unionByName(containmentRaw(linkedPersons, linkedZaken))
      .unionByName(memberOf(persons))
      .unionByName(interruptionsRaw(speakers))
      .unionByName(votes(voteMentions, fracties))
      .distinct()
  }

  /** The full triple set. Inputs are the upstream stage outputs; dims are the
    * dictionary DataFrames. (The mention branch is unique by construction,
    * disjoint from the rest by predicate, and `allNonMention` is already a
    * set — the union needs no further dedup.)
    */
  def all(linkedPersons: DataFrame, linkedZaken: DataFrame,
      voteMentions: DataFrame, persons: DataFrame, fracties: DataFrame): DataFrame =
    mentionMatches(linkedPersons)
      .unionByName(allNonMention(linkedPersons, linkedZaken, voteMentions, persons, fracties))
}
