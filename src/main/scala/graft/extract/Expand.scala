package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dataops.ContentHash

/** Nested/expanded entity model (SURVEY.md §2 S2) — the reference's defining
  * data shape: child collections ride along on the parent row as
  * arrays-of-structs, the way `expand_params` inlines Zaak/Besluit/Document/
  * Activiteit children on an Agendapunt (reference
  * src/vlos/extractors/api_extractor.py:63,96,111,126; nested
  * PersoonNevenfunctie→Inkomsten, persoon_processor.py:136-159).
  *
  * Transcript-domain equivalent: each turn carries an `attachments`
  * `array<struct<att_id,kind,size>>` child collection (tool-call artifacts /
  * uploads). The collection is derived deterministically from the turn's
  * content hash so the DuckDB oracle reproduces it bit-for-bit; a real
  * deployment reads it from the source table — the Spark shapes downstream
  * (ArrayType(StructType) column, `explode_outer` flattening, child-keyed
  * edges) are identical either way.
  *
  * Scale: `withAttachments` is a narrow per-row projection; `flatten` is a
  * generator (explode_outer) that multiplies rows without any shuffle —
  * exactly how nested children should be handled at 10^12 rows (never a
  * join back to a separate child table when the source is already nested).
  */
object Expand {

  val MaxAttachments = 3
  val Kinds: Seq[String] = Seq("doc", "img", "audio")
  val MaxChunks = 2

  /** Per-turn content hash driving the synthetic child collection. */
  private def turnHash: Column = ContentHash.h32(col("text"))

  /** Add `attachments: array<struct<att_id, kind, size_bytes, chunks>>`
    * with `h32(text) % 3` elements (possibly empty). Each attachment carries
    * a SECOND-LEVEL child collection `chunks:
    * array<struct<chunk_id:string, seq:int, chunk_bytes:int>>` of
    * `size_bytes % 2 + 1` elements — the nested-in-nested shape of the
    * reference (PersoonNevenfunctie→PersoonNevenfunctieInkomsten,
    * persoon_processor.py:136-159; DocumentVersie→DocumentPublicatie,
    * document_loader.py:188-239), derived deterministically so the DuckDB
    * oracle reproduces both levels bit-for-bit.
    */
  def withAttachments(turns: DataFrame): DataFrame = {
    val h = turnHash
    val n = (h % MaxAttachments).cast("int")
    val idxAll = array((0 until MaxAttachments).map(lit): _*)
    val chunkIdxAll = array((0 until MaxChunks).map(lit): _*)
    val att = transform(slice(idxAll, lit(1), n), i => {
      val attId = md5(concat_ws("|", col("conv_id"), col("turn_idx"), i))
      val size = pmod(h + i * 37, lit(100000)).cast("int")
      val nChunks = (pmod(size, lit(MaxChunks)) + 1).cast("int")
      struct(
        attId.as("att_id"),
        element_at(
          lit(Kinds.toArray), (pmod(h + i, lit(Kinds.size)) + 1).cast("int")).as("kind"),
        size.as("size_bytes"),
        transform(slice(chunkIdxAll, lit(1), nChunks), s =>
          struct(
            md5(concat_ws("|", attId, s)).as("chunk_id"),
            s.cast("int").as("seq"),
            pmod(size + s * 13, lit(4096)).cast("int").as("chunk_bytes"))).as("chunks"))
    })
    turns.withColumn("attachments", att)
  }

  /** Flatten the child collection: one row per (turn, attachment), keeping
    * attachment-less turns as a single row with null child fields —
    * `explode_outer`, the relational equivalent of the reference's
    * `for child in parent.children or []` loops.
    */
  def flattenAttachments(expanded: DataFrame): DataFrame =
    expanded
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        explode_outer(col("attachments")).as("att"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        col("att.att_id").as("att_id"), col("att.kind").as("kind"),
        col("att.size_bytes").as("size_bytes"))

  /** TWO-LEVEL flatten: one row per (turn, attachment, chunk) via
    * `explode_outer` at BOTH nesting levels — turns without attachments
    * survive as a single all-null-child row (the relational form of the
    * reference's doubly-nested `for nevenfunctie … for inkomsten …` loops).
    * Still generator-only: no shuffle at any nesting depth.
    */
  def flattenChunks(expanded: DataFrame): DataFrame =
    expanded
      .select(col("conv_id"), col("turn_idx"),
        explode_outer(col("attachments")).as("att"))
      .select(col("conv_id"), col("turn_idx"),
        col("att.att_id").as("att_id"), col("att.size_bytes").as("size_bytes"),
        explode_outer(col("att.chunks")).as("ch"))
      .select(col("conv_id"), col("turn_idx"), col("att_id"), col("size_bytes"),
        col("ch.chunk_id").as("chunk_id"), col("ch.seq").as("seq"),
        col("ch.chunk_bytes").as("chunk_bytes"))
}
