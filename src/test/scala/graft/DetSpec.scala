package graft

import org.apache.spark.sql.functions._
import graft.functions.Det

/** Property tests for the cross-engine deterministic numerics
  * (seeded random cases — scalacheck's scalatest bridge is not on the
  * classpath, so generation is explicit). */
class DetSpec extends SparkSpec {

  private val rng = new scala.util.Random(42)
  private def moneyCases(n: Int): Seq[BigDecimal] =
    Seq.fill(n)(BigDecimal(rng.between(-10000000L, 10000000L)) / 100)

  test("cents() recovers the exact integer cents of 2-decimal doubles") {
    val s = spark
    import s.implicits._
    (1 to 10).foreach { _ =>
      val vals = moneyCases(50)
      val df = vals.map(_.toDouble).toDF("v")
      val got = df.select(Det.cents(col("v"))).collect().map(_.getLong(0)).toSeq
      assert(got == vals.map(v => (v * 100).toLongExact))
    }
  }

  test("moneySum is partitioning-invariant (exact regardless of summation order)") {
    val s = spark
    import s.implicits._
    (1 to 5).foreach { _ =>
      val vals = moneyCases(100)
      val df = vals.map(_.toDouble).toDF("v")
      val a = df.repartition(1).agg(Det.moneySum(col("v"))).head().getDouble(0)
      val b = df.repartition(13).agg(Det.moneySum(col("v"))).head().getDouble(0)
      assert(a == b)
      assert(BigDecimal(a) == vals.sum)
    }
  }

  test("rnd() equals the explicit floor(x*10^n + 0.5) formula (engine-tie-break-free)") {
    val s = spark
    import s.implicits._
    // 70.47625 is the observed real-world divergence case: its double
    // representation sits just below the decimal midpoint, so BOTH
    // engines deterministically floor to .4762 — the contract is
    // "identical doubles in → identical result out", not decimal
    // HALF_UP semantics (Spark's round would give .4763, DuckDB .4762).
    val vals = Seq(70.47625, 0.00005, 1.5, 2.5, 123.45675)
    val df = vals.toDF("v")
    val got = df.select(Det.rnd(col("v"), 4)).collect().map(_.getDouble(0)).toSeq
    val expected = vals.map(v => math.floor(v * 1e4 + 0.5) / 1e4)
    assert(got == expected)
    assert(got.head == 70.4762)
  }
}
