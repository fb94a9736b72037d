package graft

import org.apache.spark.sql.functions._

import graft.queries.{MultimodalQueries, TextQueries}

/** Round-15 guards — the ADVICE r14 closures, each pinned by a test so
  * the closed item cannot silently re-open:
  *
  *  1. integer-division semantics: Spark `div` and DuckDB `//` BOTH
  *     truncate toward zero on negatives (measured; the SQL side is
  *     re-measured every verify pass by `scripts/check_pins.py`) — the
  *     trainer's signed g12 updates were always cross-engine safe, and
  *     membershipInfer's +1e9 shift exists for grid uniformity, not
  *     engine agreement;
  *  2. membershipInfer's |s6| < 1e9 fence fails loudly instead of
  *     mis-bucketing;
  *  3. sourceAblation's in-band 'none' control sentinel rejects a real
  *     feed named 'none' instead of silently merging with the control;
  *  4. the audio-features oracle's `ascii(substr(...))` byte algebra is
  *     only byte-accurate on single-byte ASCII text — enforced against
  *     the shipped corpus, not assumed.
  */
class Round15Spec extends SparkSpec {

  test("Spark `div` truncates toward zero on negatives — same as the measured DuckDB `//`") {
    val s = spark; import s.implicits._
    val got = Seq((-7L, 2L), (7L, -2L), (-7L, -2L), (7L, 2L), (-1L, 1000L))
      .toDF("a", "b").selectExpr("a div b").as[Long].collect().toSeq
    // DuckDB 1.0.0 measures: SELECT (-7)//2, 7//(-2), (-7)//(-2), 7//2,
    // (-1)//1000 → (-3, -3, 3, 3, 0) — truncation toward zero, NOT
    // flooring. scripts/check_pins.py re-measures the DuckDB half.
    assert(got == Seq(-3L, -3L, 3L, 3L, 0L))
  }

  test("membershipInfer: a corpus inside the fence passes; the fence predicate itself rejects a blown score") {
    val s = spark; import s.implicits._
    // the fixture corpus scores land well under the fence — the query
    // runs clean (the fence's happy path costs nothing)
    val docs = (1 to 40).map { i =>
      val en = i % 3 != 0
      val txt =
        if (en) s"the quick fox t$i jumps over the lazy dog"
        else s"der schnelle fuchs f$i springt nicht weit"
      (i.toLong, txt, if (en) "en" else "de", s"src${i % 4}")
    }.toDF("doc_id", "text", "lang", "source")
    assert(TextQueries.membershipInferOf(docs).count() >= 2)
    // and the fence expression raises on an out-of-range value (the
    // same when/raise_error shape the query builds)
    val fenced = Seq(2000000000L).toDF("s6").select(
      when(abs(col("s6")) < lit(1000000000L), col("s6"))
        .otherwise(raise_error(lit("membershipInfer: |s6| >= 1e9"))
          .cast("long")).as("s6"))
    val e = intercept[Exception] { fenced.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("|s6| >= 1e9")))
  }

  test("sourceAblation: a real feed named 'none' is rejected, not merged with the control lane") {
    val s = spark; import s.implicits._
    val docs = (1 to 30).map { i =>
      (i.toLong, s"the quick fox t$i jumps", "en",
        if (i % 2 == 0) "none" else "srcA")
    }.toDF("doc_id", "text", "lang", "source")
    val e = intercept[IllegalArgumentException] {
      TextQueries.sourceAblationOf(docs).collect()
    }
    assert(e.getMessage.contains("'none'"))
  }

  test("audio-features oracle precondition: the shipped corpus text is single-byte ASCII") {
    // the DuckDB twin re-derives PCM-16 samples via character-indexed
    // ascii(substr(text, ...)) — byte-accurate iff every char is one
    // byte (< 0x80). The decoder itself is byte-true on any input;
    // this guards the ORACLE's assumption against the corpus the
    // driver actually ships (ADVICE r14), at both gate SFs.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables(spark, dir, "documents")
      val bad = docs.filter(octet_length(col("text")) =!= length(col("text")))
        .count()
      assert(bad == 0L, s"non-ASCII text rows in $dir: $bad")
    }
  }
}
