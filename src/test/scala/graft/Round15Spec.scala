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

  // ---- round-15 checkpoint/selection engineering keys --------------

  /** Mixed en/de corpus over 4 feeds (the Round14bSpec shape: ids
    * spread so the 80/100 split has both members and non-members in
    * both label classes). */
  private def corpus(n: Int) = {
    val s = spark; import s.implicits._
    (1 to n).map { i =>
      val en = i % 3 != 0
      val txt =
        if (en) s"the quick fox t$i jumps over the lazy dog"
        else s"der schnelle fuchs f$i springt nicht weit"
      (i.toLong, txt, if (en) "en" else "de", s"src${i % 4}")
    }.toDF("doc_id", "text", "lang", "source")
  }

  test("swaAvg: the final lane IS the production trainer's eval; the averaged loss lands between the checkpoints'") {
    val docs = corpus(60)
    val out = TextQueries.swaAvgOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("final", "swa"))
    val steps = TextQueries.logregStepOf(docs).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out("final").getLong(2) == steps(2).getLong(3), "final acc_ppm")
    assert(out("final").getDouble(3) == steps(2).getDouble(2), "final logloss")
    val (l1, l2, ls) = (steps(1).getDouble(2), steps(2).getDouble(2),
      out("swa").getDouble(3))
    // log-loss is convex in w, so the averaged point cannot exceed the
    // worse checkpoint — it MAY beat both (that is SWA's point)
    assert(ls <= math.max(l1, l2) + 1e-6,
      s"swa loss $ls above the checkpoint ceiling max($l1, $l2)")
  }

  test("weightQuant: fp lane is the trainer's eval; int8 error matches the plain-Scala grid round-trip") {
    val docs = corpus(60)
    val out = TextQueries.weightQuantOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("fp", "int8"))
    assert(out("fp").getLong(5) == 0L)
    val steps = TextQueries.logregStepOf(docs).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out("fp").getLong(2) == steps(2).getLong(3), "fp acc_ppm")
    // replay the symmetric int8 grid in plain Scala on the collected
    // trajectory weights
    val feats = TextQueries.lrFeatsOf(docs).localCheckpoint()
    val n = docs.count()
    var w = TextQueries.lrZeroWeights(spark)
    for (_ <- 0 until TextQueries.LrRounds)
      w = TextQueries.logregSgdStep(w, feats, n).localCheckpoint()
    val ws = w.collect().map(r => r.getAs[Number]("slot").longValue
      -> r.getAs[Long]("w9")).toMap
    val wmax = math.max(ws.values.map(math.abs).max, 1L)
    val errL1 = ws.values.map { v =>
      math.abs(v - (v * 127 / wmax) * wmax / 127)
    }.sum
    assert(out("int8").getLong(5) == errL1, "quant_err_l1 diverges from replay")
  }

  test("el2nPrune: lanes partition the corpus, the pruned mass is <= 30% and scores below the kept lane's") {
    val docs = corpus(80)
    val rows = TextQueries.el2nPruneOf(docs).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == 80L, "lanes must partition the corpus")
    val pruned = rows.filter(_.getString(1) == "pruned").map(_.getLong(2)).sum
    assert(pruned <= 24L, s"pruned $pruned > 30% of 80")
    assert(pruned > 0L, "the 30% cut pruned nothing")
    // within every source that has both lanes, pruned mean < kept mean
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val m = rs.map(r => r.getString(1) -> r.getDouble(3)).toMap
      if (m.contains("pruned") && m.contains("kept"))
        assert(m("pruned") <= m("kept"))
    }
  }

  test("gradClip: clipped counts and mass shares are monotone in the threshold and match a plain-Scala replay") {
    val docs = corpus(60)
    val rows = TextQueries.gradClipOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == TextQueries.ClipGrid6)
    assert(rows.forall(_._2 == 60L))
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted.reverse,
      "n_clipped must not increase with C")
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted.reverse,
      "clipped mass share must not increase with C")
    // plain-Scala replay of the per-doc norm² under the final weights
    val feats = TextQueries.lrFeatsOf(docs).localCheckpoint()
    var w = TextQueries.lrZeroWeights(spark)
    for (_ <- 0 until TextQueries.LrRounds)
      w = TextQueries.logregSgdStep(w, feats, 60L).localCheckpoint()
    val ws = w.collect().map(r => r.getAs[Number]("slot").longValue
      -> r.getAs[Long]("w9")).toMap
    val fs = feats.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Number](2).longValue, r.getLong(3), r.getLong(4)))
    val norm2 = fs.groupBy(_._1).map { case (_, rows0) =>
      val dl = rows0.head._5.toDouble
      val y = rows0.head._2
      val mnum = rows0.map(t => ws(t._3) * t._4).sum
      val p = 1.0 / (1.0 + math.exp(-(mnum.toDouble / (1e9 * dl))))
      rows0.map { t =>
        val g6 = math.round((p - y) * t._4 / dl * 1e6)
        g6 * g6
      }.sum
    }.toSeq
    for ((c6, _, nClip, _) <- rows)
      assert(norm2.count(_ > c6 * c6).toLong == nClip, s"n_clipped at C=$c6")
  }

  test("distillSoft: the hard lane IS the val-slice trainer; a perfect teacher makes the lanes coincide") {
    val docs = corpus(400) // val slice (bucket 80-89) needs enough docs
    val out = TextQueries.distillSoftOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("hard", "soft"))
    val nVal = out("hard").getLong(1)
    assert(nVal > 0 && nVal == out("soft").getLong(1))
    // independent hard-lane replay: the scalar trainer restricted to
    // the val slice must reproduce the hard lane's accuracy
    val valDocs = docs.filter(
      expr(TextQueries.splitBucketOf("doc_id")).between(80, 89))
    val feats = TextQueries.lrFeatsOf(valDocs).localCheckpoint()
    var w = TextQueries.lrZeroWeights(spark)
    for (_ <- 0 until TextQueries.LrRounds)
      w = TextQueries.logregSgdStep(w, feats, nVal).localCheckpoint()
    val ws = w.collect().map(r => r.getAs[Number]("slot").longValue
      -> r.getAs[Long]("w9")).toMap
    val fs = feats.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Number](2).longValue, r.getLong(3), r.getLong(4)))
    val corr = fs.groupBy(_._1).count { case (_, rows0) =>
      val mnum = rows0.map(t => ws(t._3) * t._4).sum
      (mnum > 0) == (rows0.head._2 == 1)
    }
    assert(out("hard").getLong(2) == corr * 1000000L / nVal, "hard acc_ppm")
    // teacher MAE is a [0, 1] mean and both lanes carry it
    for (l <- Seq("hard", "soft")) {
      val mae = out(l).getDouble(4)
      assert(mae >= 0.0 && mae <= 1.0)
    }
  }

  test("rhoLoss: rho is exactly the loss difference and the top-k order is the exact-integer sort") {
    val docs = corpus(80)
    val rows = TextQueries.rhoLossOf(docs).collect()
    assert(rows.length == TextQueries.RhoTopK)
    assert(rows.map(_.getInt(0)).toSeq == (1 to TextQueries.RhoTopK))
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(4) - r.getLong(5),
        "rho9 != nll_cur9 - nll_hold9")
    }
    val ord = rows.map(r => (r.getLong(3), r.getLong(1))).toSeq
    assert(ord == ord.sortBy(t => (-t._1, t._2)),
      "top-k not in (rho9 DESC, doc_id) order")
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
