package graft

import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The fused mention kernel (`graft.functions.MentionExtract`) must be
  * bit-identical to the regexp_extract column graph it replaced. This spec
  * re-implements that column graph NAIVELY (one fresh Matcher per regex per
  * call, `find()` everywhere, exactly the round-2 `when`-chain dataflow)
  * and checks the kernel against it on adversarial random text — template
  * fragments, marker words embedded in longer tokens, multiple competing
  * patterns in one turn, unicode, empty strings.
  */
class MentionExtractPropertySpec extends AnyFunSuite {

  // ---- the reference implementation: literal transliteration of the
  // round-2 column graph (Extract.mentionsWide before the kernel) ----

  private def rex(s: String, p: String): String = {
    val m = Pattern.compile(p).matcher(s)
    if (m.find()) Option(m.group(1)).getOrElse("") else ""
  }

  private val procedural = Pattern.compile(
    "\\b(" + graft.extract.Extract.ProceduralMarkers.mkString("|") + ")\\b")

  private case class Wide(
      isSpeaker: Boolean, kind: String, vFirst: String, vLast: String,
      isCase: Boolean, dossierCode: String, stuk: String,
      isVote: Boolean, fractie: String, voteRaw: String)

  private def reference(s: String): Option[Wide] = {
    if (procedural.matcher(s.toLowerCase).find()) return None
    val woord = rex(s, "het woord aan (.+)$")
    val spreekt = rex(s, "^Mevrouw (.+) spreekt over")
    val inter = rex(s, "^De heer (.+) interrumpeert")
    val reactie = rex(s, "^(.+) vraagt een reactie")
    val kind =
      if (woord.nonEmpty) "woord_aan"
      else if (spreekt.nonEmpty) "spreekt"
      else if (inter.nonEmpty) "interrumpeert"
      else if (reactie.nonEmpty) "reactie"
      else null
    val full = if (woord.nonEmpty) woord else reactie
    val vFirst = if (full.nonEmpty) rex(full, "^(\\S+) ") else ""
    val vLast =
      if (full.nonEmpty) rex(full, "^\\S+ (.+)$")
      else if (spreekt.nonEmpty) spreekt
      else inter
    val dossier = rex(s, "dossier (\\d+(?:-[A-Za-z0-9]+)?)")
    val stuk = rex(s, "nr\\. (\\d+)")
    val fractie = rex(s, "^De fractie (.+) stemt ")
    val vote = rex(s, " stemt (voor|tegen|onthouding)$")
    val isSpeaker = kind != null && vLast.nonEmpty
    val isCase = dossier.nonEmpty
    val isVote = fractie.nonEmpty && vote.trim.toLowerCase.nonEmpty
    if (!isSpeaker && !isCase && !isVote) None
    else Some(Wide(isSpeaker, kind, vFirst, vLast, isCase, dossier, stuk,
      isVote, fractie, vote))
  }

  private def kernel(s: String): Option[Wide] =
    Option(graft.functions.MentionExtract.extract(UTF8String.fromString(s)))
      .map { r =>
        def str(i: Int) = if (r.isNullAt(i)) null else r.getUTF8String(i).toString
        Wide(r.getBoolean(0), str(1), str(2), str(3),
          r.getBoolean(4), str(5), str(6), r.getBoolean(7), str(8), str(9))
      }

  // ---- adversarial text generator ----

  private val name: Gen[String] = Gen.oneOf(
    "Anna Jansen", "Pieter van der Berg", "Jansen", "X", "de Vries-Smit",
    "A B C", "heropening", "中文 naam")
  private val frag: Gen[String] = Gen.oneOf(
    Gen.const("De voorzitter geeft het woord aan "),
    Gen.const("Mevrouw "), Gen.const("De heer "),
    Gen.const(" spreekt over "), Gen.const(" interrumpeert"),
    Gen.const(" vraagt een reactie"),
    Gen.const("dossier 36001"), Gen.const("dossier 36001-VI nr. 4"),
    Gen.const("nr. 7"), Gen.const("De fractie GroenLinks stemt "),
    Gen.const(" stemt voor"), Gen.const(" stemt tegen"),
    Gen.const(" stemt onthouding"), Gen.const(" stemt misschien"),
    Gen.const("opening"), Gen.const("de OPENING van"),
    // Turkish dotted İ (U+0130): UNICODE_CASE folds it onto 'i' but
    // lower() maps it to "i̇" (i + combining dot) — the ADVICE r3 case
    // where a case-insensitive match on raw text diverges from
    // lower-then-match; the kernel must agree with lower-then-match
    Gen.const("de OPENİNG van"), Gen.const("GESCHİORST"),
    Gen.const("verkoopopening"), Gen.const("geschorst"),
    Gen.const("einde vergadering"), name,
    Gen.alphaNumStr.map(_.take(8)), Gen.const(" "), Gen.const("."))
  private val text: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, frag).map(_.mkString))

  test("kernel == naive regexp_extract column graph on adversarial text") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3000),
      Prop.forAll(text) { s => kernel(s) == reference(s) })
    assert(res.passed, s"${res.status}")
  }

  test("golden turns: each template and each dropout path") {
    val cases = Seq(
      "De voorzitter geeft het woord aan Anna Jansen",
      "Mevrouw Jansen spreekt over het klimaat",
      "De heer Bakker interrumpeert",
      "Pieter van der Berg vraagt een reactie",
      "wij bespreken dossier 36001-VI nr. 4 vandaag",
      "De fractie GroenLinks stemt voor",
      "De fractie D66 stemt onthouding",
      "de opening van het debat", // procedural → dropped
      "de heropening van het debat", // NOT procedural (word boundary)
      // NOT procedural: lower() turns İ into "i̇" (two code points), which
      // the case-sensitive marker regex does not match — whereas a
      // CASE_INSENSITIVE|UNICODE_CASE match on the raw text would (ADVICE r3)
      "de OPENİNG van het debat geeft het woord aan Anna Jansen",
      "het woord aan ", // no capture → dropped
      "niets bijzonders hier",
      "")
    cases.foreach { s =>
      assert(kernel(s) == reference(s), s"mismatch for: '$s'")
    }
  }
}
