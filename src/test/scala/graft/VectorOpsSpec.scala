package graft

import org.apache.spark.sql.functions._

/** Round-6 optimization guard: the codegen vector kernels
  * (graft.functions.VectorOps) must be BIT-IDENTICAL to the higher-order
  * `zip_with`+`aggregate` formulation they replaced in Similarity/Dedup —
  * same IEEE-754 fold order, same null semantics (null element or length
  * mismatch → null), across random vectors where double summation order
  * genuinely matters.
  */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  // the EXACT round-5 column formulations, kept here as the reference
  private def cosineHof(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    dot / (na * nb)
  }
  private def dotHof(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  private def randVecs(n: Int, dim: Int): Seq[(Long, Array[Double], Array[Double])] = {
    var x = 424242424242L
    def nextD(): Double = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      // wide magnitude spread so fold order matters: scale by 2^(h%32)
      val m = java.lang.Long.remainderUnsigned(x, 2000001L).toDouble / 1e6 - 1.0
      m * math.pow(2.0, (java.lang.Long.remainderUnsigned(x >>> 8, 32L)).toDouble)
    }
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)(nextD()), Array.fill(dim)(nextD())))
  }

  test("cosine kernel is bit-identical to the zip_with/aggregate fold " +
      "(floor to 1e-6 fixed point AND raw double bits)") {
    val df = randVecs(200, 64).toDF("id", "a", "b")
    val cmp = df.select(
      cosineHof(col("a"), col("b")).as("hof"),
      graft.functions.VectorOps.cosineSim(col("a"), col("b")).as("ker"))
    val rows = cmp.collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val h = r.getDouble(0); val k = r.getDouble(1)
      assert(java.lang.Double.doubleToRawLongBits(h) ==
        java.lang.Double.doubleToRawLongBits(k), s"$h vs $k")
    }
  }

  test("dot kernel is bit-identical to the zip_with/aggregate fold") {
    val df = randVecs(200, 64).toDF("id", "a", "b")
    val rows = df.select(
      dotHof(col("a"), col("b")).as("hof"),
      graft.functions.VectorOps.vecDot(col("a"), col("b")).as("ker")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null semantics match the HOF graph: null element and length " +
      "mismatch both yield null (zip_with padding / aggregate poisoning)") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (3L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0))
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"),
      cosineHof(col("a"), col("b")).as("hof_cos"),
      graft.functions.VectorOps.cosineSim(col("a"), col("b")).as("ker_cos"),
      dotHof(col("a"), col("b")).as("hof_dot"),
      graft.functions.VectorOps.vecDot(col("a"), col("b")).as("ker_dot"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"cosine null mismatch id=${r.getLong(0)}: hof=${r.get(1)} ker=${r.get(2)}")
      assert(r.isNullAt(3) == r.isNullAt(4),
        s"dot null mismatch id=${r.getLong(0)}: hof=${r.get(3)} ker=${r.get(4)}")
      if (!r.isNullAt(1))
        assert(r.getDouble(1) == r.getDouble(2))
    }
    // rows 2 and 3 must actually BE null on both sides
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }
}
