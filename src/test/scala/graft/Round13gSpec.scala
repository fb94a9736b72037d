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

  test("weibullFit: a pure-exponential latency histogram reads shape ~1 and a steep one reads shape > 1; replay is exact") {
    val s = spark
    import s.implicits._
    def ordersOf(n: Int) = (0 until n).map(i =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    // geometric day counts ≈ exponential → Weibull shape near 1
    val expo = (0 until 8).flatMap { d =>
      val cnt = 256 >> d // 256, 128, ... 2 at day 8
      (0 until cnt).map(_ => d)
    }
    val liExpo = expo.zipWithIndex.map { case (d, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${d + 2}%02d 00:00:00"))
    }.toDF("l_orderkey", "l_shipdate")
    val r1 = graft.queries.ExtensionQueries
      .weibullFitOf(ordersOf(expo.length), liExpo).collect().head
    assert(r1.getAs[Long]("n_orders") == expo.length.toLong)
    assert(math.abs(r1.getAs[Double]("shape") - 1.0) < 0.35,
      s"geometric decay should fit shape≈1, got ${r1.getAs[Double]("shape")}")
    // plain-Scala replay of the exact fenced regression
    val hist = expo.map(_ + 1).groupBy(identity).view.mapValues(_.size).toMap
    val days = hist.keys.toSeq.sorted
    val n = expo.length
    var cum = 0L
    val pts = days.map { t =>
      cum += hist(t)
      val x = math.round(math.log(t.toDouble) * 1e6)
      val y = math.round(math.log(-math.log(
        1.0 - (cum.toDouble - 0.3) / (n + 0.4))) * 1e6)
      (x, y)
    }
    val k = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (k * sxy - sx * sy).toDouble / (k * sxx - sx * sx)
    def rnd(v: Double, sc: Int): Double = {
      val f = math.pow(10, sc); math.floor(v * f + 0.5) / f
    }
    assert(r1.getAs[Double]("shape") == rnd(slope, 4))
    val scale = math.exp(-((sy.toDouble / k / 1e6)
      - slope * (sx.toDouble / k / 1e6)) / slope)
    assert(r1.getAs[Double]("scale_days") == rnd(scale, 2))
    // a concentrated latency (all mass on days 9..11) fits a steep shape
    val steep = Seq.fill(100)(9) ++ Seq.fill(200)(10) ++ Seq.fill(100)(11)
    val liSteep = steep.zipWithIndex.map { case (d, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"))
    }.toDF("l_orderkey", "l_shipdate")
    val r2 = graft.queries.ExtensionQueries
      .weibullFitOf(ordersOf(steep.length), liSteep).collect().head
    assert(r2.getAs[Double]("shape") > 3.0,
      s"concentrated latencies should fit a steep shape, got ${r2.getAs[Double]("shape")}")
  }
}
