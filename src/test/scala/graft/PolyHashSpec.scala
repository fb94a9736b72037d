package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PolyHash

/** The native poly_hash expression (VERDICT r13 #6): value equality
  * with the `aggregate` higher-order fold it replaced, DuckDB-measured
  * non-ASCII fixtures, codegen agreement, and the empty lane. */
class PolyHashSpec extends SparkSpec {

  private def ph(t: String, slots: Int): Int =
    PolyHash.compute(UTF8String.fromString(t), slots)

  /** The r13 higher-order fold poly_hash replaced — kept HERE as the
    * equality baseline (it is also the shape of the DuckDB oracle). */
  private def legacyFold(t: String, slots: Int): String =
    s"CAST((CASE WHEN length($t) = 0 THEN 0L ELSE " +
      s"aggregate(transform(sequence(1, length($t)), i -> CAST(ascii(substring($t, i, 1)) AS BIGINT)), " +
      s"0L, (a, x) -> (a * 31 + x) % 1000003) END) % $slots AS INT)"

  test("kernel equals the legacy aggregate-fold on the corpus vocabulary") {
    val s = spark
    import s.implicits._
    PolyHash.register(spark)
    // corpus vocabulary (small at sf0.001) + a synthetic 500-token
    // sweep so the equality is exercised well past the fixture size
    val synth = (0 until 500)
      .map(i => s"tok${i}_${"abcdefgh".take(i % 8 + 1)}${i * 31}")
    val vocab = Tables(spark, sfDir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .union(synth.toDF("t"))
      .distinct()
    val both = vocab.selectExpr("t", "poly_hash(t, 64) AS nh",
      legacyFold("t", 64) + " AS lh")
    val diff = both.filter(col("nh") =!= col("lh")).count()
    assert(diff == 0, s"$diff vocabulary tokens hash differently")
    assert(both.count() > 500, "fixture too small")
    // and the 65537-ish slot counts used by the trainer family agree too
    val diff2 = vocab.selectExpr(
      s"poly_hash(t, ${graft.queries.TextQueries.LrSlots}) AS nh",
      legacyFold("t", graft.queries.TextQueries.LrSlots) + " AS lh")
      .filter(col("nh") =!= col("lh")).count()
    assert(diff2 == 0)
  }

  test("edge lanes: empty string, single chars, and collision separation") {
    assert(ph("", 64) == 0)
    assert(ph("a", 64) == 97 % 64)
    // the r12 collision pairs must separate (Round13Spec's bar)
    Seq(("cat", "car"), ("hello", "hells"), ("aa", "ab"), ("data", "date"))
      .foreach { case (a, b) => assert(ph(a, 64) != ph(b, 64), s"($a,$b) collide") }
  }

  test("non-ASCII code points match DuckDB's ascii() semantics (measured fixtures)") {
    // duckdb: list_reduce fold of 'naïve' % 64 = 19 (ascii('é')=233,
    // ascii('𝕊')=120138 — full code points, which the kernel decodes
    // from raw UTF-8 without allocating)
    assert(ph("naïve", 64) == 19)
    assert(ph("é", 64) == 233 % 64)
    assert(ph("𝕊", 64) == 120138 % 64)
  }

  test("codegen path agrees with the static kernel") {
    val s = spark
    import s.implicits._
    PolyHash.register(spark)
    val toks = Seq("alpha", "beta", "naïve", "", "x", "𝕊x").toDF("t")
    val viaExpr = toks.selectExpr("t", "poly_hash(t, 997) AS h")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    viaExpr.foreach { case (t, h) =>
      assert(h == ph(t, 997), s"codegen diverges on '$t'")
    }
  }
}
