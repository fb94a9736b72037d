package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic numerics for the DuckDB-oracle contract.
  *
  * Problem: `round(avg(x), n)` is nondeterministic across engines in two
  * ways — float summation order differs (partial aggregation), and the
  * engines disagree at exact round-half points (Spark HALF_UP, DuckDB
  * half-to-even; observed: avg=70.47625 → 70.4763 vs 70.4762).
  *
  * Fix, for columns that are exact decimals (2-dp money, integral
  * quantities): aggregate in EXACT integer units (cents), so the sum is
  * bit-identical regardless of order or engine; divide (both engines do
  * the same IEEE-754 division of identical inputs); round via an explicit
  * `floor(x·10ⁿ + 0.5)` half-up that both engines evaluate identically on
  * identical doubles. The SQL twins spell out the same formula.
  */
object Det {

  /** Exact integer cents of a 2-decimal double column (values carry
    * ≤1e-10 float noise, far from any .5 boundary, so `round` is safe). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Sum a 2-decimal money column exactly; emit as double units. */
  def moneySum(c: Column): Column =
    (sum(cents(c)).cast("double") / 100.0)

  /** Exact mean of a 2-decimal money column, half-up-rounded to `scale`.
    * Nonnegative inputs only (floor(x+0.5) is half-up toward +∞). */
  def moneyAvg(c: Column, scale: Int): Column =
    rnd(sum(cents(c)).cast("double") / (count(c) * 100.0), scale)

  /** Exact integer units of a `scale`-decimal double column (the
    * generalization of [[cents]]: values already rounded to `scale`
    * decimals carry only float noise, far from any .5 boundary). */
  def units(c: Column, scale: Int): Column =
    round(c * math.pow(10, scale)).cast("long")

  /** Exact mean of a `scale`-decimal column, half-up-rounded to
    * `outScale`: the sum runs over exact integers, so partial-
    * aggregation order cannot move the result (plain `round(avg(x))`
    * can flip the last digit between engines at round-half points). */
  def fixedAvg(c: Column, scale: Int, outScale: Int): Column =
    rnd(sum(units(c, scale)).cast("double") / (count(c) * math.pow(10, scale)), outScale)

  /** Deterministic rounding of a double, ties toward +∞ for ANY sign:
    * floor(x·10ˢ + 0.5) rounds 2.5→3 and −2.5→−2 (half-UP for
    * positives, half-down-in-magnitude for negatives — e.g. the
    * negative-capable annQuantized approx scores). Both engines
    * compute floor on the same double product, so there is no engine-
    * specific tie-breaking and no ulp ambiguity for exact-decimal x.
    *
    * Domain guard: above 2⁵³/10ˢ the product x·10ˢ exceeds the integer
    * range doubles represent exactly — s-decimal rounding is below
    * double resolution there, and Spark's `floor` (which returns LONG,
    * unlike DuckDB's double-in/double-out floor) would CLAMP at
    * Long.MaxValue past 2⁶³/10ˢ, silently corrupting the value on one
    * engine only. Both engines therefore branch to identity on the
    * same threshold (emitted with round-trip-exact digits so the
    * branch condition is the identical double comparison). */
  def rnd(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    val t = 9007199254740992.0 / f // 2^53
    when(abs(c) < t, floor(c * f + 0.5) / f).otherwise(c)
  }

  /** SQL-side twins of the helpers above, for composing oracle strings. */
  def centsSql(col: String): String =
    s"CAST(round(($col) * 100) AS BIGINT)"
  def moneySumSql(col: String): String =
    s"CAST(sum(${centsSql(col)}) AS DOUBLE) / 100.0"
  def moneyAvgSql(col: String, scale: Int): String =
    rndSql(s"CAST(sum(${centsSql(col)}) AS DOUBLE) / (count($col) * 100.0)", scale)
  def unitsSql(col: String, scale: Int): String =
    s"CAST(round(($col) * 1${"0" * scale}) AS BIGINT)"
  def fixedAvgSql(col: String, scale: Int, outScale: Int): String =
    rndSql(s"CAST(sum(${unitsSql(col, scale)}) AS DOUBLE) / (count($col) * 1${"0" * scale}.0)", outScale)
  def rndSql(expr: String, scale: Int): String = {
    val f = "1" + "0" * scale
    val t = java.lang.Double.toString(9007199254740992.0 / math.pow(10, scale))
    s"CASE WHEN abs($expr) < $t THEN floor(($expr) * $f + 0.5) / $f" +
      s" ELSE ($expr) END"
  }
}
