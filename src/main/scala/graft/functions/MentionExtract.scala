package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused one-pass mention extraction: ALL of the extract stage's per-turn
  * regex work (procedural filter, the four speaker surface patterns, the
  * first/last-name split, dossier/stuk codes, fractie vote utterances —
  * reference xml_extractor.py:69-257) evaluated by ONE kernel call per row.
  *
  * Why not a chain of `regexp_extract` columns (the round-2/3a shape):
  * every `regexp_extract` call converts the row's `UTF8String` text to a
  * fresh Java `String` and allocates a fresh `Matcher` — 9 regex columns
  * mean ~9 String copies of the same text plus 9 Matcher allocations PER
  * ROW. On one socket that allocation traffic is the dominant scaling
  * cost: measured per-task time inflates ~1.5× from 1→4 cores on this
  * box's shared L3/memory system, and the extract job is the largest
  * single contributor. The kernel converts the text ONCE, reuses
  * per-thread Matchers (`Matcher.reset`), prunes impossible patterns with
  * vectorized `String.indexOf`/`startsWith` gates before touching the
  * regex engine, and short-circuits the speaker-pattern cascade exactly
  * along the dataflow of the original column graph.
  *
  * Semantics are bit-identical to the replaced column graph (the DuckDB
  * oracle mirrors it): same java.util.regex patterns, `find()` semantics
  * (`lookingAt()` only where the pattern is `^`-anchored, which is
  * equivalent), unmatched → empty string, and the procedural filter's
  * `lower(text) RLIKE` is reproduced with CASE_INSENSITIVE|UNICODE_CASE
  * on the original text. Returns NULL for rows the wide mention table
  * drops (procedural turns and turns with no valid mention), so the
  * caller's filter is a null check.
  *
  * Codegen: a `UnaryExpression` whose generated code is a single static
  * call (same pattern as [[FuzzRatioExpr]]) — the extract stage stays one
  * whole-stage-codegen span over the scan.
  */
case class MentionExtractExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MentionExtract.schema

  override def prettyName: String = "mention_extract"

  // null for non-null input: procedural turns and no-mention turns
  override def nullable: Boolean = true

  override protected def nullSafeEval(t: Any): Any =
    MentionExtract.extract(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = graft.functions.MentionExtract.extract($t);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MentionExtractExpr =
    copy(child = newChild)
}

object MentionExtract {

  val schema: StructType = StructType(Seq(
    StructField("is_speaker", BooleanType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("v_first", StringType, nullable = false),
    StructField("v_last", StringType, nullable = false),
    StructField("is_case", BooleanType, nullable = false),
    StructField("dossier_code", StringType, nullable = false),
    StructField("stuk", StringType, nullable = false),
    StructField("is_vote", BooleanType, nullable = false),
    StructField("fractie_naam", StringType, nullable = false),
    StructField("vote_raw", StringType, nullable = false)))

  // pattern indices — the literal regexes of the round-2 column graph
  // (Extract.mentionsWide / Extract.isProcedural), unchanged
  private val patterns: Array[Pattern] = Array(
    // 0: the column graph (and the DuckDB oracle) is `lower(text) RLIKE
    // <markers>` — a CASE-SENSITIVE match over the LOWERCASED text. A
    // CASE_INSENSITIVE|UNICODE_CASE match on the raw text is NOT the same
    // function for non-ASCII case mappings (Turkish İ/ı, ﬁ ligatures:
    // UNICODE_CASE folds them onto 'i'/'fi', lower() does not), so the
    // kernel lowercases via Spark's own UTF8String.toLowerCase (bit-exact
    // with the lower() expression) and matches case-sensitively (ADVICE r3).
    Pattern.compile("\\b(" + graft.extract.Extract.ProceduralMarkers.mkString("|") + ")\\b"),
    Pattern.compile("het woord aan (.+)$"), // 1
    Pattern.compile("^Mevrouw (.+) spreekt over"), // 2
    Pattern.compile("^De heer (.+) interrumpeert"), // 3
    Pattern.compile("^(.+) vraagt een reactie"), // 4
    Pattern.compile("^(\\S+) "), // 5: first name of the full form
    Pattern.compile("^\\S+ (.+)$"), // 6: last name of the full form
    Pattern.compile("dossier (\\d+(?:-[A-Za-z0-9]+)?)"), // 7
    Pattern.compile("nr\\. (\\d+)"), // 8
    Pattern.compile("^De fractie (.+) stemt "), // 9
    Pattern.compile(" stemt (voor|tegen|onthouding)$")) // 10

  // one Matcher per pattern per thread, reset per row — zero per-row
  // Matcher allocation (executor task threads are pooled and long-lived)
  private val matchers: ThreadLocal[Array[Matcher]] =
    ThreadLocal.withInitial(() => patterns.map(_.matcher("")))

  /** `regexp_extract(s, p, 1)` semantics: first match anywhere, group 1,
    * unmatched (or null group) → "".
    */
  private def find(ms: Array[Matcher], i: Int, s: String): String = {
    val m = ms(i).reset(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  /** Same, for `^`-anchored patterns: `find()` ≡ `lookingAt()` (any match
    * must start at offset 0), without the engine's position-retry loop.
    */
  private def anchored(ms: Array[Matcher], i: Int, s: String): String = {
    val m = ms(i).reset(s)
    if (m.lookingAt()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  private val KindWoord = UTF8String.fromString("woord_aan")
  private val KindSpreekt = UTF8String.fromString("spreekt")
  private val KindInter = UTF8String.fromString("interrumpeert")
  private val KindReactie = UTF8String.fromString("reactie")
  private val Empty = UTF8String.EMPTY_UTF8

  // byte-level gate literals (all ASCII): UTF8String.contains/startsWith do
  // raw byte search, and an ASCII needle can neither false-match inside a
  // multi-byte UTF-8 char (continuation bytes are >= 0x80) nor miss a true
  // char-level match — so each gate is EXACTLY String.contains/startsWith
  // on the decoded text, evaluated without materializing it
  private val LitWoordAan = UTF8String.fromString("het woord aan ")
  private val LitMevrouw = UTF8String.fromString("Mevrouw ")
  private val LitDeHeer = UTF8String.fromString("De heer ")
  private val LitReactie = UTF8String.fromString(" vraagt een reactie")
  private val LitDossier = UTF8String.fromString("dossier ")
  private val LitDeFractie = UTF8String.fromString("De fractie ")
  private val LitStemt = UTF8String.fromString(" stemt ")

  private def utf8(s: String): UTF8String =
    if (s.isEmpty) Empty else UTF8String.fromString(s)

  /** One fused extraction pass; see class doc for the exact equivalence
    * argument vs the regexp_extract column graph.
    */
  def extract(text: UTF8String): GenericInternalRow = {
    // Literal gates on the RAW UTF8String bytes, before any allocation.
    // Each mention type's regex requires its literal, so a row where no
    // gate holds can only ever produce null: isSpeaker needs one of the
    // four speaker literals, isCase needs "dossier ", isVote needs both
    // vote literals — whether or not the turn is also procedural, the
    // result is null either way, so the procedural regex (the most
    // expensive pattern) and the char[] conversion are skipped entirely.
    // On the bench corpus ~40% of turns (procedural + filler templates)
    // take this zero-allocation exit.
    val gWoord = text.contains(LitWoordAan)
    val gMevrouw = text.startsWith(LitMevrouw)
    val gHeer = text.startsWith(LitDeHeer)
    val gReactie = text.contains(LitReactie)
    val gDossier = text.contains(LitDossier)
    val gStemt = text.contains(LitStemt)
    val gVote = gStemt && text.startsWith(LitDeFractie)
    if (!(gWoord || gMevrouw || gHeer || gReactie || gDossier || gVote))
      return null

    val s = text.toString // the ONE String conversion of the original row
    val ms = matchers.get()
    // procedural turns are dropped before any mention logic (P4): matched
    // against lower(text) computed by Spark's OWN lowercase (UTF8String
    // .toLowerCase — ASCII fast path, same slow path as the lower() expr),
    // exactly mirroring the replaced `lower(text) RLIKE` column
    if (ms(0).reset(text.toLowerCase.toString).find()) return null

    // speaker cascade — evaluation order mirrors the original column
    // dataflow: kind = first non-empty of (woord, spreekt, inter, reactie);
    // full = woord if non-empty else reactie; names split from full when
    // non-empty, else v_last falls back to spreekt-else-inter
    var kind: UTF8String = null
    var full = ""
    var spreekt = ""
    var inter = ""
    val woord = if (gWoord) find(ms, 1, s) else ""
    if (woord.nonEmpty) { kind = KindWoord; full = woord }
    else {
      spreekt = if (gMevrouw) anchored(ms, 2, s) else ""
      if (spreekt.isEmpty)
        inter = if (gHeer) anchored(ms, 3, s) else ""
      val reactie = if (gReactie) anchored(ms, 4, s) else ""
      full = reactie
      kind =
        if (spreekt.nonEmpty) KindSpreekt
        else if (inter.nonEmpty) KindInter
        else if (reactie.nonEmpty) KindReactie
        else null
    }
    var vFirst = ""
    var vLast = ""
    if (full.nonEmpty) { vFirst = anchored(ms, 5, full); vLast = anchored(ms, 6, full) }
    else vLast = if (spreekt.nonEmpty) spreekt else inter

    val dossier = if (gDossier) find(ms, 7, s) else ""
    val stuk = if (s.contains("nr. ")) find(ms, 8, s) else ""
    var fractie = ""
    var vote = ""
    if (gStemt) { // both vote patterns require the literal
      fractie = anchored(ms, 9, s)
      vote = find(ms, 10, s)
    }

    // mention validity (P5) — rows with no valid mention are dropped
    val isSpeaker = kind != null && vLast.nonEmpty
    val isCase = dossier.nonEmpty
    val isVote = fractie.nonEmpty && vote.nonEmpty
    if (!isSpeaker && !isCase && !isVote) return null

    new GenericInternalRow(Array[Any](
      isSpeaker, kind, utf8(vFirst), utf8(vLast),
      isCase, utf8(dossier), utf8(stuk),
      isVote, utf8(fractie), utf8(vote)))
  }

  /** `mention_extract` as a Column (requires [[FuzzRatio.register]] once per
    * session, which registers both functions).
    */
  def of(text: Column): Column = call_function("mention_extract", text)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mention_extract", exprs => MentionExtractExpr(exprs.head), "built-in")
}
