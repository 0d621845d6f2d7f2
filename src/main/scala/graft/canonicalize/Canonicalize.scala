package graft.canonicalize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.model.Pred

/** Entity canonicalization: cluster mention surface forms with the entities
  * they link to via connected components, pick the lexicographically smallest
  * member as the canonical representative, and rewrite triples through the
  * mapping.
  *
  * Replaces the reference's implicit canonicalization (same Neo4j MERGE key ⇒
  * same node, src/utils/helpers.py:13-27) with an explicit, testable stage —
  * and goes further: two dictionary entries linked by a shared mention
  * surface collapse into one canonical entity, which MERGE-by-key cannot do.
  */
object Canonicalize {

  /** Match edges `(mention-node, persoon-node)` from the linker output —
    * the same namespaced keys Triples.mentionMatches emits.
    */
  def matchEdges(linkedPersons: DataFrame): DataFrame =
    linkedPersons.select(
      concat(lit("mention:"), TextFunctions.stableId(
        col("conv_id"), col("turn_idx"), col("v_first"), col("v_last"))).as("u"),
      concat(lit("persoon:"), col("persoon_id")).as("v")).distinct()

  /** `(node, component)` for every node incident to a match edge. */
  def components(linkedPersons: DataFrame): DataFrame =
    ConnectedComponents.run(matchEdges(linkedPersons))

  /** Canonical entity id per cluster: the smallest `persoon:`-namespaced
    * member if the cluster contains one (mentions canonicalize to their
    * entity), else the smallest member overall (unlinked-mention clusters).
    * Returns `(node, canon)`.
    */
  def canonicalMap(comps: DataFrame): DataFrame = {
    val best = comps.groupBy("component").agg(
      min(when(col("node").startsWith("persoon:"), col("node"))).as("entity_min"),
      min("node").as("node_min"))
    comps.join(best, "component")
      .select(col("node"), coalesce(col("entity_min"), col("node_min")).as("canon"))
  }

  /** Rewrite triple endpoints through the canonical map (two left joins;
    * un-mapped nodes stay themselves), then re-dedup. Identity edges created
    * by the rewrite (mention → its own canon via MATCHES_PERSOON) collapse to
    * self-loops and are dropped.
    */
  def rewrite(triples: DataFrame, canonMap: DataFrame): DataFrame = {
    val subjMap = canonMap.select(col("node").as("subj"), col("canon").as("subj_canon"))
    val objMap = canonMap.select(col("node").as("obj"), col("canon").as("obj_canon"))
    triples
      .join(subjMap, Seq("subj"), "left")
      .join(objMap, Seq("obj"), "left")
      .select(
        coalesce(col("subj_canon"), col("subj")).as("subj"),
        col("pred"),
        coalesce(col("obj_canon"), col("obj")).as("obj"))
      .where(!(col("subj") === col("obj") && col("pred") === Pred.MatchesPersoon))
      .distinct()
  }
}
