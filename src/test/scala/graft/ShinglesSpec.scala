package graft

import org.apache.spark.sql.functions._
import graft.functions.Shingles

/** The codegen'd shingle expression must match the interpreted HOF
  * form ELEMENT-BY-ELEMENT (same substring character addressing, same
  * first-occurrence order) — the dedup oracles depend on identical
  * shingle sets. */
class ShinglesSpec extends SparkSpec {

  private val hof =
    "array_distinct(transform(sequence(1, greatest(length(text) - 11, 1)), i -> substring(text, i, 12)))"

  test("shingles(text, 12) equals the interpreted HOF formulation") {
    Shingles.register(spark)
    val mismatches = Tables(spark, sfDir, "documents")
      .select(expr("shingles(text, 12)").as("fast"), expr(hof).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("shingles handles short and empty-ish texts like the HOF") {
    Shingles.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq("", "a", "abcdefghijk", "abcdefghijkl", "abcdefghijklm", "ααββγγδδεεζζηη")
      .toDF("text")
    val bad = df.select(expr("shingles(text, 12)").as("fast"), expr(hof).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }
}
