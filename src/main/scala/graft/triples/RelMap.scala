package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative relationship extraction — schema-as-data edge emission, the
  * Spark re-expression of the reference's `REL_MAP_*` dictionaries
  * (src/core/config/constants.py:1-153) and the generic loop that walks them
  * (src/loaders/processors/activiteit_processor.py:45-92): adding an edge
  * type is a `RelSpec` entry, not a new function.
  *
  * Each spec names the parent key columns, the predicate, and where the
  * object key lives — a scalar column, or a field inside a nested
  * `array<struct>` child collection (the S2 expanded-entity shape), which is
  * flattened with a generator (`explode`), never a join.
  *
  * Scale: every generated branch is a narrow projection (+ explode for the
  * nested ones); the union introduces no shuffle. Dedup is left to the
  * caller/sink (the materialize upsert dedups on the edge key), matching
  * `Triples.triRaw` reasoning.
  */
final case class RelSpec(
    pred: String,
    subjPrefix: String,
    subjCols: Seq[String],
    objPrefix: String,
    objField: String,
    childArray: Option[String] = None)

object RelMap {

  /** REL_MAP for the expanded transcript-turn entity — parity with the
    * reference's map-driven edge extraction (constants.py REL_MAP_ACTIVITEIT
    * et al.): parent turn → nested attachment children, scalar tool ref,
    * and conversation containment.
    */
  val TurnRels: Seq[RelSpec] = Seq(
    RelSpec("HAS_ATTACHMENT", "turn", Seq("conv_id", "turn_idx"),
      "attachment", "att_id", childArray = Some("attachments")),
    RelSpec("USED_TOOL", "turn", Seq("conv_id", "turn_idx"), "tool", "tool"),
    RelSpec("IN_CONV", "turn", Seq("conv_id", "turn_idx"), "conv", "conv_id"))

  /** Emit `(subj, pred, obj)` edges for every spec over the parent frame. */
  def edges(parent: DataFrame, specs: Seq[RelSpec]): DataFrame =
    specs.map { sp =>
      val subj = concat_ws(":", (lit(sp.subjPrefix) +: sp.subjCols.map(col)): _*)
      val keyed = sp.childArray match {
        case Some(arr) =>
          parent
            .select(subj.as("subj"), explode(col(arr)).as("_child"))
            .select(col("subj"), col(s"_child.${sp.objField}").as("_key"))
        case None =>
          parent.select(subj.as("subj"), col(sp.objField).as("_key"))
      }
      keyed
        .where(col("_key").isNotNull)
        .select(col("subj"), lit(sp.pred).as("pred"),
          concat_ws(":", lit(sp.objPrefix), col("_key")).as("obj"))
    }.reduce(_ unionByName _)
}
