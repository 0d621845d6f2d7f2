package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FuzzRatio
import graft.canonicalize.ConnectedComponents

/** ScalaCheck properties for the pure kernels (SURVEY §5 test strategy):
  * the fuzzy-ratio expression, driver-side union-find, and the
  * cross-engine hash substrate. Raw ScalaCheck `Test.check` under
  * ScalaTest (no scalatestplus bridge in this build).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, minOk: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minOk), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // strings over a small alphabet plus some unicode incl. non-BMP,
  // biased toward collisions so the interesting branches get exercised
  private val genStr: Gen[String] = Gen.frequency(
    4 -> Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString.take(16)),
    2 -> Gen.alphaNumStr.map(_.take(12)),
    1 -> Gen.listOf(Gen.oneOf("é", "ß", "中", "😀", "x"))
      .map(_.mkString.take(12)))

  test("fuzzRatio: symmetric, bounded 0..100, 100 on self") {
    check("symmetry", Prop.forAll(genStr, genStr) { (a, b) =>
      FuzzRatio.ratio(a, b) == FuzzRatio.ratio(b, a)
    })
    check("bounds", Prop.forAll(genStr, genStr) { (a, b) =>
      val r = FuzzRatio.ratio(a, b); r >= 0 && r <= 100
    })
    check("identity", Prop.forAll(genStr) { a =>
      a.isEmpty || FuzzRatio.ratio(a, a) == 100
    })
  }

  test("fuzzRatio: Indel metric consistency — ratio = 100 iff equal (code-point level)") {
    check("eq100", Prop.forAll(genStr, genStr) { (a, b) =>
      (FuzzRatio.ratio(a, b) == 100 && a.nonEmpty) == (a == b && a.nonEmpty)
    })
  }

  private val genEdges: Gen[List[(String, String)]] = {
    val node = Gen.chooseNum(0, 15).map(i => s"n$i")
    Gen.listOf(Gen.zip(node, node)).map(_.take(40))
  }

  test("localUnionFind: edge-order permutation invariance, minimal labels, edge consistency") {
    check("permutation", Prop.forAll(genEdges) { es =>
      val a = ConnectedComponents.localUnionFind(es)
      val b = ConnectedComponents.localUnionFind(new scala.util.Random(42).shuffle(es))
      a == b
    })
    check("minimal+consistent", Prop.forAll(genEdges) { es =>
      val m = ConnectedComponents.localUnionFind(es)
      val labelIsMin = m.groupBy(_._2).forall { case (label, members) =>
        members.keys.min == label
      }
      val edgesJoined = es.forall { case (u, v) => u == v || m(u) == m(v) }
      labelIsMin && edgesJoined
    })
  }

  test("h32: deterministic and in [0, P)") {
    val P = graft.dataops.ContentHash.P
    // pure JVM re-derivation of the Column/SQL definition: first 8 md5 hex
    // chars as a long, mod P
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % P
    }
    check("range", Prop.forAll(genStr) { s =>
      val h = h32(s); h >= 0 && h < P && h == h32(s)
    })
  }
}
