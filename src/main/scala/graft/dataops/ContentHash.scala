package graft.dataops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic content hashing for the training-data
  * operators (dedup, sketches, fingerprints).
  *
  * Base hash `h32(s)`: the first 8 hex chars of md5(s) as a non-negative
  * int64, reduced mod the Mersenne prime 2^31-1. Chosen because the *same
  * arithmetic* is expressible in Spark (`conv(substring(md5(s),1,8),16,10)`)
  * and in the DuckDB oracle (`('0x'||substr(md5(s),1,8))::BIGINT`), so every
  * sketch built on it is hash-verified end-to-end rather than rows-only.
  *
  * MinHash permutations are the classic `(a*h + b) mod p` family; with
  * `h,b < p = 2^31-1` and odd `a < 2^31`, the product stays < 2^62 — no
  * overflow under ANSI mode in Spark nor in DuckDB BIGINT.
  */
object ContentHash {

  /** Modulus for all permutation arithmetic: 2^31 - 1 (prime). */
  val P = 2147483647L

  /** Number of MinHash permutations / LSH banding (k = bands × rowsPerBand). */
  val MinHashK = 12
  val Bands = 4
  val RowsPerBand = 3

  /** Deterministic permutation coefficients (tiny LCG, seed fixed) — the
    * SAME literals are embedded in the Spark plan and the oracle SQL.
    */
  val coefficients: Seq[(Long, Long)] = {
    var x = 88172645463325252L
    def next(): Long = { // xorshift64
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      math.floorMod(x, P - 1) + 1
    }
    Seq.fill(MinHashK)((next() | 1L, next()))
  }

  /** h32 as a Column (0 <= h < P). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") % P

  /** h32 as DuckDB SQL text over `expr`. */
  def h32Sql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 8))::BIGINT % $P)"

  /** i-th permuted hash of an h32 column. */
  def perm(i: Int, h: Column): Column = {
    val (a, b) = coefficients(i)
    (h * a + b) % P
  }

  /** i-th permuted hash as DuckDB SQL over an h32 expression. */
  def permSql(i: Int, hExpr: String): String = {
    val (a, b) = coefficients(i)
    s"(($hExpr * $a + $b) % $P)"
  }
}
