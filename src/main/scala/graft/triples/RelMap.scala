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
    childArray: Option[String] = None,
    childArray2: Option[String] = None,
    subjChildField: Option[String] = None)

object RelMap {

  /** REL_MAP for the expanded transcript-turn entity — parity with the
    * reference's map-driven edge extraction (constants.py REL_MAP_ACTIVITEIT
    * et al.): parent turn → nested attachment children, scalar tool ref,
    * conversation containment, and the TWO-LEVEL attachment→chunk edge
    * (`childArray2`: the object key lives inside
    * `array<struct<…, array<struct>>>`, flattened with a double explode —
    * mirroring the reference's nevenfunctie→inkomsten nested loop,
    * persoon_processor.py:136-159).
    */
  val TurnRels: Seq[RelSpec] = Seq(
    RelSpec("HAS_ATTACHMENT", "turn", Seq("conv_id", "turn_idx"),
      "attachment", "att_id", childArray = Some("attachments")),
    RelSpec("HAS_CHUNK", "attachment", Nil, "chunk", "chunk_id",
      childArray = Some("attachments"), childArray2 = Some("chunks"),
      subjChildField = Some("att_id")),
    RelSpec("USED_TOOL", "turn", Seq("conv_id", "turn_idx"), "tool", "tool"),
    RelSpec("IN_CONV", "turn", Seq("conv_id", "turn_idx"), "conv", "conv_id"))

  /** Emit `(subj, pred, obj)` edges for every spec over the parent frame.
    * Subject key comes from the parent columns, or (with `subjChildField`)
    * from the level-1 child struct — the shape of child-keyed edges like
    * attachment→chunk.
    */
  def edges(parent: DataFrame, specs: Seq[RelSpec]): DataFrame =
    specs.map { sp =>
      val parentSubj = concat_ws(":", (lit(sp.subjPrefix) +: sp.subjCols.map(col)): _*)
      val keyed = (sp.childArray, sp.childArray2) match {
        case (Some(arr), Some(arr2)) =>
          val subj = sp.subjChildField match {
            case Some(f) => concat_ws(":", lit(sp.subjPrefix), col(s"_child.$f"))
            case None => col("_psubj")
          }
          parent
            .select(parentSubj.as("_psubj"), explode(col(arr)).as("_child"))
            .select(subj.as("subj"), explode(col(s"_child.$arr2")).as("_child2"))
            .select(col("subj"), col(s"_child2.${sp.objField}").as("_key"))
        case (Some(arr), None) =>
          parent
            .select(parentSubj.as("subj"), explode(col(arr)).as("_child"))
            .select(col("subj"), col(s"_child.${sp.objField}").as("_key"))
        case _ =>
          parent.select(parentSubj.as("subj"), col(sp.objField).as("_key"))
      }
      keyed
        .where(col("_key").isNotNull)
        .select(col("subj"), lit(sp.pred).as("pred"),
          concat_ws(":", lit(sp.objPrefix), col("_key")).as("obj"))
    }.reduce(_ unionByName _)
}
