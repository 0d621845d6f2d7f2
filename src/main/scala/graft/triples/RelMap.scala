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
    *
    * Round 6 (guide §2.4): the round-5 form unioned one SELECT per spec —
    * Catalyst planned a separate scan of the parent subtree (and a
    * separate evaluation of any synthetic child-collection expressions)
    * for every branch: 4 specs over the expanded turn entity meant 4
    * parquet scans + 4 per-conversation windows + 2 evaluations of the
    * md5-heavy attachments builder in one query, with no exchange reuse
    * (per-branch column pruning makes the subtrees non-identical).
    * Each spec now contributes a row-local array<struct<subj,pred,obj>>
    * and ONE explode over their concatenation emits every edge from a
    * single pass. Same multiset of rows: per spec, the array holds
    * exactly the rows its branch produced (the `ok` flag reproduces the
    * old `_key IS NOT NULL` filter; a null child collection contributes
    * a typed empty array, matching the old explode-of-null no-op).
    */
  def edges(parent: DataFrame, specs: Seq[RelSpec]): DataFrame = {
    val branches: Seq[org.apache.spark.sql.Column] = specs.map { sp =>
      val parentSubj = concat_ws(":", (lit(sp.subjPrefix) +: sp.subjCols.map(col)): _*)
      def edge(subj: org.apache.spark.sql.Column,
          key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        struct(subj.as("subj"), lit(sp.pred).as("pred"),
          concat_ws(":", lit(sp.objPrefix), key).as("obj"),
          key.isNotNull.as("ok"))
      // typed empty array of the edge-struct shape (null child collection)
      def emptyLike(sample: org.apache.spark.sql.Column) =
        slice(array(sample), 1, 0)
      (sp.childArray, sp.childArray2) match {
        case (Some(arr), Some(arr2)) =>
          def subjOf(c: org.apache.spark.sql.Column) = sp.subjChildField match {
            case Some(f) => concat_ws(":", lit(sp.subjPrefix), c.getField(f))
            case None => parentSubj
          }
          val nested = flatten(transform(col(arr), c =>
            coalesce(transform(c.getField(arr2),
              c2 => edge(subjOf(c), c2.getField(sp.objField))),
              emptyLike(edge(subjOf(c), lit(null))))))
          coalesce(nested, emptyLike(edge(parentSubj, lit(null))))
        case (Some(arr), None) =>
          coalesce(
            transform(col(arr), c => edge(parentSubj, c.getField(sp.objField))),
            emptyLike(edge(parentSubj, lit(null))))
        case _ =>
          array(edge(parentSubj, col(sp.objField)))
      }
    }
    parent
      .select(explode(concat(branches: _*)).as("_e"))
      .where(col("_e.ok"))
      .select(col("_e.subj").as("subj"), col("_e.pred").as("pred"),
        col("_e.obj").as("obj"))
  }
}
