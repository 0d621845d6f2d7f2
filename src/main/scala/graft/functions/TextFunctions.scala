package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-column text helpers — everything here compiles to built-in Catalyst
  * expressions (whole-stage codegen, no UDFs).
  */
object TextFunctions {

  /** fuzz_ratio as a Column (requires FuzzRatio.register(spark) once per session). */
  def fuzzRatio(a: Column, b: Column): Column = call_function("fuzz_ratio", a, b)

  /** Whitespace collapse — reference xml_extractor.py:309-326 `_collapse_text`. */
  def collapseWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Topic-prefix list the reference strips before comparing topics —
    * reference src/vlos/config/vlos_config.py:45-50, topic_normalizer.py:21-41.
    */
  val TopicPrefixes: Seq[String] = Seq(
    "tweeminutendebat",
    "dertigledendebat",
    "interpellatiedebat",
    "wetgevingsoverleg",
    "notaoverleg",
    "debat over",
    "debat")

  private val prefixRegex =
    "^(" + TopicPrefixes.map(java.util.regex.Pattern.quote).mkString("|") + ")\\s*"

  /** Normalize a topic: lowercase, strip one leading prefix, collapse spaces —
    * reference topic_normalizer.py:21-41.
    */
  def normalizeTopic(c: Column): Column =
    collapseWs(regexp_replace(lower(trim(c)), prefixRegex, ""))

  /** Full surname `tussenvoegsel + ' ' + achternaam`, lowercased —
    * reference name_matcher.py:122-125. Skips empty/null tussenvoegsel.
    */
  def fullSurname(tussenvoegsel: Column, achternaam: Column): Column =
    lower(concat_ws(" ", when(tussenvoegsel.isNull || tussenvoegsel === "", null)
      .otherwise(tussenvoegsel), achternaam))

  /** Display name `roepnaam [tussenvoegsel] achternaam`. */
  def displayName(roepnaam: Column, tussenvoegsel: Column, achternaam: Column): Column =
    concat_ws(" ", roepnaam,
      when(tussenvoegsel.isNull || tussenvoegsel === "", null).otherwise(tussenvoegsel),
      achternaam)

  /** Dossier-code split `"36725-VI"` → (36725, "VI") —
    * reference api_extractor.py:304-312 regex `^(\d+)(?:[-\s]?([A-Za-z0-9]+))?$`.
    */
  private val DossierRe = "^(\\d+)(?:[-\\s]?([A-Za-z0-9]+))?$"
  def dossierNumber(code: Column): Column =
    regexp_extract(code, DossierRe, 1).cast("int")
  def dossierToevoeging(code: Column): Column =
    regexp_extract(code, DossierRe, 2)

  /** Content-stable synthetic IDs. The reference uses Python `hash(...)`
    * (process-salted, vlos_neo4j_loader.py:239,320,367,426) — deliberately
    * replaced with deterministic md5 over a `|`-joined key so IDs are stable
    * across runs/executors (documented improvement, SURVEY.md §7.4).
    */
  def stableId(parts: Column*): Column = md5(concat_ws("|", parts: _*))

  /** Fast 64-bit content hash for internal join keys (not oracle-facing). */
  def stableId64(parts: Column*): Column = xxhash64(concat_ws("|", parts: _*))

  /** Vote normalization — reference xml_extractor.py:244. */
  def normalizeVote(c: Column): Column = lower(trim(c))
}
