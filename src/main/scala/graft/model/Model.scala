package graft.model

import java.sql.Timestamp

/** Core data model for the KG-construction pipeline.
  *
  * Mirrors the reference's typed-entity shapes (see SURVEY.md §1):
  *  - Turn       ≈ one transcript row (BASELINE.json input_hint shape).
  *  - Person     ≈ Persoon props (reference: src/loaders/processors/persoon_processor.py:37-54).
  *  - Fractie    ≈ Fractie props (reference: src/loaders/fractie_loader.py:95-103).
  *  - Zaak/Dossier/DocumentRef ≈ the three fallback tiers of case linking
  *    (reference: src/vlos/extractors/api_extractor.py:170-268).
  *  - MatchResult ≈ reference: src/vlos/models.py:82-91.
  *  - Triple / NodeRow / EdgeRow ≈ the property-graph output the reference
  *    materializes via Neo4j MERGE (reference: src/utils/helpers.py:13-54).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp)

final case class Person(
    persoon_id: String,
    roepnaam: String,
    tussenvoegsel: String,
    achternaam: String,
    voornamen: String,
    fractie_id: String)

final case class Fractie(
    fractie_id: String,
    naam: String,
    afkorting: String,
    zetels_aantal: Int)

final case class Zaak(
    zaak_id: String,
    dossier_nr: Int,
    toevoeging: String,
    stuk_nr: Int,
    onderwerp: String)

final case class Dossier(dossier_nr: Int, toevoeging: String, titel: String)

final case class DocumentRef(dossier_nr: Int, volgnummer: Int, titel: String)

final case class Activity(
    activity_id: String,
    conv_id: String,
    soort: String,
    onderwerp: String,
    begin: Timestamp,
    einde: Timestamp)

/** Match outcome, reference src/vlos/models.py:13-19, 82-91. */
object MatchType {
  val Exact = "EXACT"
  val Fuzzy = "FUZZY"
  val Fallback = "FALLBACK"
  val NoMatch = "NO_MATCH"
}

final case class MatchResult(
    success: Boolean,
    matchType: String,
    score: Double,
    entityId: Option[String],
    reasons: Seq[String])

/** The canonical output unit per the north rule. */
final case class Triple(subj: String, pred: String, obj: String)

final case class NodeRow(label: String, key: String, props: Map[String, String])

final case class EdgeRow(
    src_label: String,
    src_key: String,
    rel_type: String,
    dst_label: String,
    dst_key: String)

/** Predicate vocabulary — names per reference src/loaders/vlos_neo4j_loader.py:258-540. */
object Pred {
  val MatchesPersoon = "MATCHES_PERSOON"
  val SpokeIn = "SPOKE_IN"
  val DiscussesZaak = "DISCUSSES_ZAAK"
  val DiscussesDossier = "DISCUSSES_DOSSIER"
  val InterruptedIn = "INTERRUPTED_IN"
  val WasInterruptedIn = "WAS_INTERRUPTED_IN"
  val RespondedIn = "RESPONDED_IN"
  val HasFractieVote = "HAS_FRACTIE_VOTE"
  val CastByFractie = "CAST_BY_FRACTIE"
  val ContainsSpeaker = "CONTAINS_SPEAKER"
  val ContainsZaak = "CONTAINS_ZAAK"
  val MemberOf = "MEMBER_OF"

  /** The full vocabulary (seed-enum dimension rows, seed_enums.py parity). */
  val All: Seq[String] = Seq(MatchesPersoon, SpokeIn, DiscussesZaak,
    DiscussesDossier, InterruptedIn, WasInterruptedIn, RespondedIn,
    HasFractieVote, CastByFractie, ContainsSpeaker, ContainsZaak, MemberOf)
}

/** Interruption classification — reference src/vlos/analyzers/interruption_analyzer.py:203-236. */
object InterruptionType {
  val Simple = "SIMPLE_INTERRUPTION"
  val WithResponse = "INTERRUPTION_WITH_RESPONSE"
}
