package graft

import graft.queries.TextQueries

/** Round-13 wave G additions: exact linear SHAP importances and the
  * stream-transition absorption parity. */
class Round13gSpec extends SparkSpec {

  private def fold(s: String, slots: Int): Long = {
    if (s.isEmpty) 0L
    else s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003) % slots
  }

  test("featureShap: the separating token's slot dominates, ties are slot-ordered, and the closed form replays") {
    val s = spark
    import s.implicits._
    // en docs say "a", de docs say "x": after one step |w| is large on
    // both slots and zero elsewhere; SHAP mass concentrates there
    val docs = (0L until 200L).map { id =>
      if (id % 2 == 0) (id, "a a a", "en", "web", 5L)
      else (id, "x x x", "de", "web", 5L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextQueries.featureShapOf(docs).collect()
      .sortBy(_.getAs[Int]("rank"))
    val slotA = fold("a", 64)
    val slotX = fold("x", 64)
    val top2 = out.take(2).map(_.getAs[Long]("slot")).toSet
    assert(top2 == Set(slotA, slotX),
      s"top-2 slots $top2 != separating slots {$slotA, $slotX}")
    assert(out.take(2).map(_.getAs[String]("top_token")).toSet == Set("a", "x"))
    // x = 1.0 on the active slot for half the docs, 0 for the rest:
    // E[x] = 0.5 → mean|φ| = |w6|·500000/1e12 exactly
    val r = out.head
    assert(r.getAs[Long]("imp12") ==
      math.abs(r.getAs[Long]("w6")) * (100L * 500000L + 100L * 500000L) / 200L,
      s"imp12 ${r.getAs[Long]("imp12")} vs closed form")
    // all remaining slots carry zero weight → zero importance
    assert(out.drop(2).forall(_.getAs[Long]("imp12") == 0L))
  }

  test("featureShap: corpus top-k is deterministic and mean_abs_shap is the fenced imp12") {
    val r1 = TextQueries.featureShap(spark, sfDir).collect()
    assert(r1.length == 10)
    r1.foreach { r =>
      val f = math.floor(r.getAs[Long]("imp12").toDouble / 1e12 * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("mean_abs_shap") == f)
    }
    val imps = r1.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("imp12")).toSeq
    assert(imps == imps.sorted.reverse)
  }

  test("transitionsStream state aggregates to the batch counts and the absorption finish is bit-identical") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    // (user_id, event_id, event_type, tus) — time-ordered batches
    val raw = (0L until 40L).flatMap { u =>
      val base = u * 100
      Seq((u, base, "view", base * 1000000),
        (u, base + 1, if (u % 2 == 0) "click" else "error", base * 1000000 + 1000000),
        (u, base + 2, "purchase", base * 1000000 + 2000000))
    }
    val (b1, rest) = raw.splitAt(raw.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = graft.streaming.StreamJobs.transitionsStream(mem.toDS())
      .writeStream.format("memory").queryName("r13g_trans")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamCounts = spark.table("r13g_trans")
        .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      val batchEvents = raw.map { case (u, id, t, tus) =>
        (id, new java.sql.Timestamp(tus / 1000), u, t, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val fromStream = graft.queries.ExtensionQueries
        .absorbFromCounts(streamCounts).collect().map(_.toString).toSeq
      val fromBatch = graft.queries.ExtensionQueries
        .absorbProbOf(batchEvents).collect().map(_.toString).toSeq
      assert(fromStream == fromBatch,
        "stream-aggregated absorption diverges from batch")
    } finally q.stop()
  }

  test("modelAgreement: cells partition the val split and reconcile with the NB confusion matrix") {
    val docs = Tables(spark, sfDir, "documents")
    val r = TextQueries.modelAgreementOf(docs).collect().head
    val n = r.getAs[Long]("n_val")
    val cells = Seq("both_correct", "both_wrong", "nb_only", "lr_only")
      .map(r.getAs[Long](_))
    assert(cells.sum == n, s"cells $cells don't partition $n")
    // agree = both_correct + both_wrong
    assert(r.getAs[Long]("agree_ppm") ==
      (cells(0) + cells(1)) * 1000000L / n)
    // NB-correct count must equal the NB confusion matrix's diagonal
    val nbDiag = TextQueries.naiveBayes(spark, sfDir).collect()
      .filter(x => x.getAs[Int]("actual_en") == x.getAs[Int]("predicted_en"))
      .map(_.getAs[Long]("n_docs")).sum
    assert(cells(0) + cells(2) == nbDiag,
      s"NB-correct ${cells(0) + cells(2)} vs confusion diagonal $nbDiag")
    val b = r.getAs[Long]("nb_only"); val c = r.getAs[Long]("lr_only")
    val chi = if (b + c == 0) 0.0
      else math.floor((b - c).toDouble * (b - c) / (b + c) * 1e4 + 0.5) / 1e4
    assert(r.getAs[Double]("mcnemar_chi2") == chi)
  }

  test("modelAgreement: on a separable corpus both models agree everywhere and are both right") {
    val s = spark
    import s.implicits._
    val docs = (0L until 300L).map { id =>
      if (id % 2 == 0) (id, "a a b", "en", "web", 5L)
      else (id, "x y y", "de", "web", 5L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextQueries.modelAgreementOf(docs).collect().head
    assert(r.getAs[Long]("n_val") > 0L)
    assert(r.getAs[Long]("both_correct") == r.getAs[Long]("n_val"))
    assert(r.getAs[Long]("agree_ppm") == 1000000L)
    assert(r.getAs[Double]("mcnemar_chi2") == 0.0)
  }
}
