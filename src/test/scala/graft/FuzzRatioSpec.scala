package graft

import graft.functions.FuzzRatio
import org.scalatest.funsuite.AnyFunSuite

/** Golden-parity vectors for the rapidfuzz/thefuzz `ratio` semantics the
  * reference relies on (name_matcher.py:36-38): round(200*LCS/(|a|+|b|))
  * with banker's rounding.
  */
class FuzzRatioSpec extends AnyFunSuite {

  test("golden vectors") {
    assert(FuzzRatio.ratio("", "") == 100)
    assert(FuzzRatio.ratio("a", "") == 0)
    assert(FuzzRatio.ratio("", "jansen") == 0)
    assert(FuzzRatio.ratio("jansen", "jansen") == 100)
    assert(FuzzRatio.ratio("jansen", "janssen") == 92) // 2*6/13
    assert(FuzzRatio.ratio("berg", "van der berg") == 50) // 2*4/16
    assert(FuzzRatio.ratio("voorzitter", "de voorzitter") == 87) // 20/23
    assert(FuzzRatio.ratio("abc", "cba") == 33) // LCS=1
    assert(FuzzRatio.ratio("hendrik", "hendriks") == 93) // 2*7/15
    assert(FuzzRatio.ratio("tmi", "tim") == 67) // LCS=2
  }

  test("non-BMP characters count as ONE code point (rapidfuzz parity)") {
    // "ab👍" is 4 UTF-16 units but 3 code points; rapidfuzz counts 3:
    // ratio("ab👍","ab") = round(200*2/(3+2)) = 80 (UTF-16 units would give 67)
    assert(FuzzRatio.ratio("ab👍", "ab") == 80)
    assert(FuzzRatio.ratio("👍", "👍") == 100)
    // differing surrogate pairs share no code point
    assert(FuzzRatio.ratio("👍", "😀") == 0)
  }

  test("banker's rounding at .5 (Python round parity)") {
    // 200*1/16 = 12.5 -> rounds to even 12
    assert(FuzzRatio.ratio("a", "abcdefghijklmno") == 12)
    // 200*3/16 = 37.5 -> rounds to even 38
    assert(FuzzRatio.ratio("abc", "abcdefghijklm") == 38)
  }

  test("properties: symmetric, bounded, identity (seeded sample)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString.toLowerCase
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString.toLowerCase
      val r = FuzzRatio.ratio(a, b)
      assert(r == FuzzRatio.ratio(b, a))
      assert(r >= 0 && r <= 100)
      assert(FuzzRatio.ratio(a, a) == 100)
    }
  }
}
