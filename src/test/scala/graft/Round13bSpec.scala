package graft

import graft.queries.TextQueries

/** Round-13 wave B additions: training-data mixture / provenance ops
  * (watermark detection, α-sampling, DoReMi reweighting, gradient
  * noise scale). Every test replays the closed form in plain Scala. */
class Round13bSpec extends SparkSpec {

  /** Plain-Scala replay of the classifier family's full-string
    * polynomial fold ([[TextQueries.tokSlotExprOf]]). */
  private def fold(s: String, slots: Int): Long = {
    if (s.isEmpty) 0L
    else s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003) % slots
  }

  private def docRow(id: Long, text: String, lang: String = "en",
      source: String = "web"): (Long, String, String, String, Long) =
    (id, text, lang, source, text.length.toLong)

  // -------------------------------- watermark detection

  test("watermarkDetect: n_green matches a plain-Scala green-list replay and z is the exact one-proportion statistic") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one one one one one one one one")
    val docs = texts.zipWithIndex
      .map { case (t, i) => docRow(i.toLong, t) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextQueries.watermarkDetectOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_green"),
          r.getAs[Double]("z"))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.trim.split("\\s+").toSeq
      val greens = toks.sliding(2).count(p => fold(p(0) + "|" + p(1), 4) == 0)
      val n = toks.length - 1
      val (np, ng, z) = out(i.toLong)
      assert(np == n.toLong && ng == greens.toLong,
        s"doc $i: engine ($np, $ng) vs replay ($n, $greens)")
      val zExp = math.floor((4.0 * greens - n) / math.sqrt(3.0 * n) * 1e6 + 0.5) / 1e6
      assert(z == zExp, s"doc $i: z $z vs $zExp")
    }
  }

  test("watermarkDetect: ranks are 1..k ordered by descending z on the corpus") {
    val out = TextQueries.watermarkDetect(spark, sfDir).collect()
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to out.length))
    val zs = out.map(_.getAs[Double]("z")).toSeq
    assert(zs == zs.sorted.reverse, s"z not descending: $zs")
    assert(out.length == 15)
  }

  // -------------------------------- α-sampling

  test("alphaSampling: 32-vs-1 language split reproduces the closed form (32^0.3 = 2^1.5) and oversamples the minority") {
    val s = spark
    import s.implicits._
    val docs = ((0 until 32).map(i => docRow(i.toLong, "x", "en")) :+
      docRow(32L, "x", "de"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextQueries.alphaSamplingOf(docs).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val w6en = math.floor(math.pow(32.0, 0.3) * 1e6 + 0.5) / 1e6 // 2.828427
    val m9en = math.round(w6en * 1e9)
    val m9de = 1000000000L
    val tot = m9en + m9de
    def rnd(x: Double, s: Int): Double = {
      val f = math.pow(10, s); math.floor(x * f + 0.5) / f
    }
    assert(rows("en").getAs[Long]("raw_ppm") == 32L * 1000000 / 33)
    assert(rows("en").getAs[Double]("weight") == rnd(m9en.toDouble / tot, 6))
    assert(rows("de").getAs[Double]("weight") == rnd(m9de.toDouble / tot, 6))
    // minority oversampled, majority undersampled
    assert(rows("de").getAs[Double]("eff_epochs") > 1.0)
    assert(rows("en").getAs[Double]("eff_epochs") < 1.0)
    assert(rows("de").getAs[Double]("eff_epochs") ==
      rnd(m9de.toDouble / tot * 33.0 / 1.0, 4))
  }

  // -------------------------------- DoReMi step

  test("doremiStep: a token-identical corpus has zero excess everywhere and uniform weights") {
    val s = spark
    import s.implicits._
    val docs = (0 until 40).map(i =>
        docRow(i.toLong, "x x x", "en", s"src${i % 4}"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextQueries.doremiStepOf(docs).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Double]("loss") == 0.0) // -ln(C/C) = 0
      assert(r.getAs[Double]("excess") == 0.0)
      assert(r.getAs[Double]("weight") == 0.25)
      assert(r.getAs[Long]("n_docs") == 10L && r.getAs[Long]("n_tokens") == 30L)
    }
  }

  test("doremiStep: the source holding rare tokens carries the excess and gets up-weighted") {
    val s = spark
    import s.implicits._
    // srcA: common token soup; srcB: each doc one globally-unique token
    val docs = ((0 until 20).map(i => docRow(i.toLong, "x x x x", "en", "srcA")) ++
      (0 until 5).map(i => docRow(20L + i, s"rare$i", "en", "srcB")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextQueries.doremiStepOf(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("srcB").getAs[Double]("loss") > rows("srcA").getAs[Double]("loss"))
    assert(rows("srcB").getAs[Double]("excess") > 0.0)
    assert(rows("srcA").getAs[Double]("excess") == 0.0) // below the global mean
    assert(rows("srcB").getAs[Double]("weight") > rows("srcA").getAs[Double]("weight"))
    val wsum = rows.values.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 2e-6, s"weights sum to $wsum")
  }

  // -------------------------------- gradient noise scale

  test("gradNoiseScale: identical examples have zero gradient variance; label-split examples have positive variance") {
    val s = spark
    import s.implicits._
    val same = (0 until 200).map(i => docRow(i.toLong, "aa bb cc", "en"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r0 = TextQueries.gradNoiseScaleOf(same).collect().head
    assert(r0.getAs[Long]("tr_sigma12") == 0L,
      s"identical examples: tr_sigma ${r0.getAs[Long]("tr_sigma12")}")
    assert(r0.getAs[Double]("b_simple") == 0.0)
    assert(r0.getAs[Long]("gnorm2_12") > 0L)
    val mixed = (0 until 200).map(i =>
        docRow(i.toLong, "aa bb cc", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r1 = TextQueries.gradNoiseScaleOf(mixed).collect().head
    assert(r1.getAs[Long]("tr_sigma12") > 0L)
  }

  test("gradNoiseScale: moments match a plain-Scala replay of the exact integer pipeline") {
    val s = spark
    import s.implicits._
    val fixture = Seq(
      docRow(0L, "aa bb aa", "en"), docRow(1L, "aa cc", "de"),
      docRow(2L, "bb bb bb bb", "en"), docRow(3L, "dd", "de"),
      docRow(4L, "aa dd cc dd", "en"), docRow(5L, "cc cc", "de"))
    // train-split membership must match the engine's bucket cut
    val buckets = spark.range(6).selectExpr("id",
        TextQueries.splitBucketOf("id") + " AS b")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val train = fixture.filter(d => buckets(d._1) < 80)
    assert(train.nonEmpty)
    // replay: per-(doc, slot) g6 = round((0.5 - y) * num / dl * 1e6)
    val g6 = train.flatMap { case (_, text, lang, _, _) =>
      val y = if (lang == "en") 1L else 0L
      val toks = text.trim.split("\\s+").toSeq
      val dl = toks.length.toLong
      val slotCounts = toks.groupBy(t => fold(t, 64))
        .map { case (sl, ts) => sl -> ts.length.toLong }
      (slotCounts.toSeq :+ (64L -> dl)).map { case (sl, num) =>
        sl -> math.round((0.5 - y) * num.toDouble / dl * 1e6)
      }
    }
    val n = train.length.toLong
    val bySlot = g6.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val trSigma = bySlot.values.map { gs =>
      val s1 = gs.sum; val s2 = gs.map(g => g * g).sum
      s2 / n - (s1 / n) * (s1 / n)
    }.sum
    val gnorm = bySlot.values.map { gs => val m = gs.sum / n; m * m }.sum
    val r = TextQueries.gradNoiseScaleOf(fixture
      .toDF("doc_id", "text", "lang", "source", "n_chars")).collect().head
    assert(r.getAs[Long]("n_train") == n)
    assert(r.getAs[Long]("tr_sigma12") == trSigma,
      s"tr_sigma ${r.getAs[Long]("tr_sigma12")} vs replay $trSigma")
    assert(r.getAs[Long]("gnorm2_12") == gnorm)
  }
}
