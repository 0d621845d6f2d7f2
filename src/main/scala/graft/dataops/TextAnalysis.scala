package graft.dataops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import ContentHash._

/** Text-analysis operators over `documents(doc_id, text, …)`: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions / relational aggregates — whole-stage codegen'd,
  * no UDFs, shuffles only on doc_id.
  */
object TextAnalysis {

  /** Tiny function-word dictionaries for the n-gram/stopword language
    * heuristic (deterministic; a real system ships trained profiles).
    */
  val StopwordsNl: Seq[String] = Seq(
    "de", "het", "een", "en", "van", "is", "dat", "die", "niet", "op",
    "aan", "met", "voor", "er", "maar", "om", "ook", "als", "dan", "zijn")
  val StopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "is", "that", "this", "not", "on",
    "to", "with", "for", "there", "but", "or", "also", "as", "then", "are")

  private def words(textCol: Column): Column = split(lower(textCol), "\\s+")

  private def countIn(ws: Column, dict: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(dict)))

  /** Language ID: stopword-hit counts per language; ties → 'und'.
    * Permille confidence = hits(best) * 1000 / n_words.
    */
  def languageId(documents: DataFrame): DataFrame = {
    val ws = words(col("text"))
    documents.select(
      col("doc_id"),
      countIn(ws, StopwordsNl).as("nl_hits"),
      countIn(ws, StopwordsEn).as("en_hits"),
      size(ws).as("n_words"))
      .withColumn("lang_pred",
        when(col("nl_hits") > col("en_hits"), "nl")
          .when(col("en_hits") > col("nl_hits"), "en")
          .otherwise("und"))
      .withColumn("confidence_permille",
        when(col("n_words") > 0,
          floor(greatest(col("nl_hits"), col("en_hits")) * 1000 / col("n_words")))
          .otherwise(0).cast("int"))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean word
    * length; composite permille score (each component clamped to [0,1000]).
    */
  def qualityScore(documents: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val nChars = length(col("text"))
    val nPunct = nChars - length(regexp_replace(col("text"), "[\\.,;:!\\?]", ""))
    val base = documents.select(
      col("doc_id"), nChars.as("n_chars"), size(ws).as("n_words"),
      nPunct.as("n_punct"),
      (countIn(ws, StopwordsNl) + countIn(ws, StopwordsEn)).as("stop_hits"))
    base.select(
      col("doc_id"), col("n_chars"), col("n_words"),
      when(col("n_chars") > 0, floor(col("n_punct") * 1000 / col("n_chars")))
        .otherwise(0).cast("int").as("punct_permille"),
      when(col("n_words") > 0, floor(col("stop_hits") * 1000 / col("n_words")))
        .otherwise(0).cast("int").as("stopword_permille"),
      when(col("n_words") > 0, floor(col("n_chars") * 10 / col("n_words")))
        .otherwise(0).cast("int").as("chars_per_word_x10"))
      .withColumn("quality_permille",
        least(greatest(
          // long enough + has stopwords + sane punctuation = high quality
          least(col("n_words") * 20, lit(400))
            + least(col("stopword_permille"), lit(400))
            + when(col("punct_permille") <= 100, 200).otherwise(0),
          lit(0)), lit(1000)).cast("int"))
  }

  /** Token counting: whitespace tokens + a BPE-ish pre-tokenizer estimate =
    * maximal alnum runs + individual punctuation chars (character-class
    * based, not lookarounds — RE2-compatible so the oracle matches).
    */
  def tokenStats(documents: DataFrame): DataFrame = {
    val lowered = lower(col("text"))
    val wsTokens = size(filter(split(trim(col("text")), "\\s+"), t => t =!= ""))
    val alnumRuns = size(filter(split(lowered, "[^a-z0-9]+"), t => t =!= ""))
    val punctChars = length(regexp_replace(lowered, "[a-z0-9\\s]", ""))
    documents.select(
      col("doc_id"),
      wsTokens.as("ws_tokens"),
      (alnumRuns + punctChars).as("bpeish_tokens"),
      length(col("text")).as("n_chars"))
  }

  /** Document fingerprint: bottom-t sketch of word-shingle h32 hashes
    * (order-stable winnowing analogue): t smallest distinct shingle hashes,
    * concatenated. Equal fingerprints ⇒ near-identical shingle sets.
    */
  def fingerprint(documents: DataFrame, t: Int = 4): DataFrame = {
    val sh = Dedup.shingles(documents)
    val w = Window.partitionBy("doc_id").orderBy(col("sh").asc)
    sh.withColumn("rn", row_number().over(w))
      .where(col("rn") <= t)
      .groupBy("doc_id")
      .agg(array_join(
        transform(sort_array(collect_list(col("sh"))), _.cast("string")),
        "-").as("fingerprint"))
  }
}
