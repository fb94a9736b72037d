package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQueries, TextQueries}

/** Round-15c operator semantics, each pinned against an independent
  * plain-Scala replay or a hand-counted fixture:
  *
  *  - pass@k: the unbiased estimator on hand-counted (n, c) pairs, the
  *    attempt BUDGET (events past the first 10 never count), and the
  *    c ≥ 1 ∧ k = n ⇒ pass@n = 1 integer boundary;
  *  - Dawid–Skene: posterior algebra replayed in plain Scala from the
  *    confusion counts; unanimous corpus degenerates to certainty;
  *  - momentum: velocity algebra replayed in plain-Scala Longs from the
  *    collected gradients; step-1/SGD-lane coincidence with the
  *    production trainer;
  *  - raking: the full fixed-point sweep replayed in plain Scala;
  *    trimming bounds hold; calibration moves margins toward target.
  */
class Round15cSpec extends SparkSpec {

  private def eventsDf(rows: Seq[(Long, Long, Long, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("event_id", "tsv", "user_id", "event_type")
      .select(col("event_id"), col("tsv").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
  }

  test("passAtK: hand-counted estimator — n=10, c=3 gives pass@1 = 0.3 and pass@5 = 916667 ppm") {
    // one task, first 10 attempts have hits at positions 1..3
    val rows = (1 to 10).map { i =>
      (i.toLong, i.toLong, 1L, if (i <= 3) "purchase" else "view")
    }
    val got = AnalyticsQueries.passAtKOf(eventsDf(rows))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // pass@1 = 1 - 7/10; pass@5 = 1 - C(7,5)/C(10,5) = 1 - 21/252,
    // ppm-truncated: 1e6 - (2520*1e6 div 30240) = 916667 → 0.916667
    assert(got(1) == (1L, 0.3))
    assert(got(5) == (1L, 0.916667))
    assert(got(10) == (1L, 1.0)) // c ≥ 1, k = n → certainty, integer-decided
  }

  test("passAtK: the attempt budget holds — a purchase at position 11 does not count") {
    val hitLate = (1 to 12).map { i =>
      (i.toLong, i.toLong, 1L, if (i == 11) "purchase" else "view")
    }
    val got = AnalyticsQueries.passAtKOf(eventsDf(hitLate))
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got == Map(1 -> 0.0, 5 -> 0.0, 10 -> 0.0))
  }

  test("passAtK: tasks below the k floor drop out of that k's lane only") {
    val rows = (1 to 10).map { i => // user 1: 10 attempts, 1 hit
      (i.toLong, i.toLong, 1L, if (i == 1) "purchase" else "view")
    } ++ Seq((100L, 1L, 2L, "purchase"), (101L, 2L, 2L, "view"),
      (102L, 3L, 2L, "view")) // user 2: only 3 attempts
    val got = AnalyticsQueries.passAtKOf(eventsDf(rows))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1)._1 == 2L) // both tasks in the k=1 lane
    assert(got(5)._1 == 1L) // user 2 (n=3) excluded from k=5 upward
    assert(got(10)._1 == 1L)
    // k=1 mean: user1 ppm = 1e6 - 9e6 div 10 = 100000; user2 = 1e6 -
    // (2*1e6 div 3) = 333334; mean = 433334/2e6 = 0.216667
    assert(got(1)._2 == 0.216667)
  }

  // crafted texts hitting chosen rater patterns: r1 = len ≥ 200,
  // r2 = tokens ≥ 40, r3 = contains 'the'
  private def patDoc(id: Long, r1: Boolean, r2: Boolean, r3: Boolean) = {
    val word = if (r3) "the" else "zzz"
    val tok = if (r2) 45 else 8
    // r1-false pad must keep total length < 200 even with 45 tokens
    // (179 chars): 5 + 1 + 179 = 185
    val pad = if (r1) "x" * 210 else "x" * 5
    (id, s"$pad " + Seq.fill(tok)(word).mkString(" "), "en", "src0")
  }

  test("dawidSkene: unanimous corpus → posteriors at certainty, nothing flips") {
    val s = spark; import s.implicits._
    val docs = ((1 to 6).map(i => patDoc(i.toLong, true, true, true)) ++
      (7 to 12).map(i => patDoc(i.toLong, false, false, false)))
      .toDF("doc_id", "text", "lang", "source")
    val rows = TextQueries.dawidSkeneOf(docs).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val ymaj = r.getLong(4)
      assert(r.getDouble(5) == (if (ymaj == 1L) 1.0 else 0.0))
      assert(!r.getBoolean(6))
    }
  }

  test("dawidSkene: posterior matches a plain-Scala EM replay on a mixed corpus") {
    val s = spark; import s.implicits._
    // mixed corpus: several patterns incl. minority-rater disagreement
    val spec = Seq( // (count, r1, r2, r3)
      (5, true, true, true), (4, false, false, false),
      (3, true, true, false), (2, false, false, true),
      (1, true, false, false), (1, false, true, true))
    val docs = spec.zipWithIndex.flatMap { case ((cnt, a, b, c), gi) =>
      (1 to cnt).map(j => patDoc(gi * 100L + j, a, b, c))
    }.toDF("doc_id", "text", "lang", "source")
    // independent replay: majority init → confusion counts → posterior
    val pats = spec.map { case (cnt, a, b, c) =>
      (Seq(a, b, c).map(x => if (x) 1L else 0L), cnt.toLong)
    }
    val n = pats.map(_._2).sum
    def ym(p: Seq[Long]) = if (p.sum >= 2) 1L else 0L
    val n1 = pats.filter(p => ym(p._1) == 1L).map(_._2).sum
    val aj = (0 to 2).map(j =>
      pats.filter(p => ym(p._1) == 1L && p._1(j) == 1L).map(_._2).sum)
    val bj = (0 to 2).map(j =>
      pats.filter(p => ym(p._1) == 0L && p._1(j) == 1L).map(_._2).sum)
    def postOf(p: Seq[Long]): Double = {
      val t = (0 to 2).map(j => if (p(j) == 1L) aj(j) else n1 - aj(j))
      val u = (0 to 2).map(j => if (p(j) == 1L) bj(j) else (n - n1) - bj(j))
      val a = t.map(_.toDouble).product * (n - n1) * (n - n1)
      val b = u.map(_.toDouble).product * n1 * n1
      a / (a + b)
    }
    val got = TextQueries.dawidSkeneOf(docs).collect()
      .map(r => (Seq(r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6)))).toMap
    assert(got.keySet == pats.map(_._1).toSet)
    pats.foreach { case (p, cnt) =>
      val (gCnt, gYm, gPost, gFlip) = got(p)
      assert(gCnt == cnt && gYm == ym(p))
      val exp = BigDecimal(postOf(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(gPost) == exp, s"pattern $p")
      assert(gFlip == ((postOf(p) > 0.5) != (ym(p) == 1L)), s"flip $p")
    }
  }

  test("momentum: velocity algebra matches a plain-Scala fold of the collected gradients; sgd lane ≡ the production final") {
    val s = spark; import s.implicits._
    val docs = (1 to 30).map { i =>
      val en = i % 2 == 0
      val txt =
        if (en) s"the quick fox t$i jumps over the lazy dog again and again"
        else s"der schnelle fuchs f$i springt nicht sehr weit heute"
      (i.toLong, txt, if (en) "en" else "de", s"src${i % 3}")
    }.toDF("doc_id", "text", "lang", "source")
    val feats = TextQueries.lrFeatsOf(docs).localCheckpoint()
    val nDocs = feats.filter(col("slot") === 64).select("doc_id")
      .distinct().count()
    val (w2, w2m) = TextQueries.momentumWeightsOf(docs, feats, nDocs)
    // replay: collect g0/g1 off the same trajectory and fold in Longs
    val w0 = TextQueries.lrZeroWeights(s)
    val g0 = TextQueries.lrGrad(w0, feats).collect()
      .map(r => r.getAs[Number](0).intValue -> r.getAs[Number](1).longValue).toMap
    def step(w: Map[Int, Long], g: Map[Int, Long]): Map[Int, Long] =
      w.map { case (sl, wv) => sl -> (wv - g.getOrElse(sl, 0L) * 8 / nDocs / 1000) }
    val w1m = step((0 to 64).map(_ -> 0L).toMap, g0)
    val w1df = w1m.toSeq.toDF("slot", "w9")
    val g1 = TextQueries.lrGrad(w1df, feats).collect()
      .map(r => r.getAs[Number](0).intValue -> r.getAs[Number](1).longValue).toMap
    val expMom = w1m.map { case (sl, wv) =>
      val v2 = (9 * g0.getOrElse(sl, 0L)) / 10 + g1.getOrElse(sl, 0L)
      sl -> (wv - v2 * 8 / nDocs / 1000)
    }
    val gotMom = w2m.collect().map(r => r.getAs[Number](0).intValue -> r.getAs[Number](1).longValue).toMap
    assert(gotMom == expMom)
    // the sgd lane IS the production 2-step trajectory
    val expSgd = step(w1m, g1)
    val gotSgd = w2.collect().map(r => r.getAs[Number](0).intValue -> r.getAs[Number](1).longValue).toMap
    assert(gotSgd == expSgd)
    // Scala / on positive operands ≡ div here: g*8 stays within sign-safe
    // truncation for both (both truncate toward zero)
  }

  test("ivWald: planted partial compliance recovers the constant LATE exactly; instrument reads strong") {
    // 50 users per arm; Z=1: 25 compliers treated, Z=0: 5 always-takers;
    // treated purchase $10, untreated $2 → ITT = $3.20, first stage 0.4,
    // LATE = 8.00 exactly (the integer ratio 800000 / 1000 / 100)
    val rows = (0 until 100).flatMap { u =>
      val z = u % 2
      val treated = if (z == 1) u < 50 else u >= 90
      val nSignup = if (treated) 14 else 1
      val cents = if (treated) 1000L else 200L
      val base = u * 1000L
      (0 until nSignup).map(i =>
        (base + i, base + i, u.toLong, "signup", 0.0)) :+
        ((base + 500L, base + 500L, u.toLong, "purchase", cents / 100.0))
    }
    val s = spark; import s.implicits._
    val ev = rows.toDF("event_id", "tsv", "user_id", "event_type", "value")
      .select(col("event_id"), col("tsv").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val r = queries.AnalyticsQueries.ivWaldOf(ev).collect().head
    assert(r.getLong(0) == 50L && r.getLong(1) == 50L)
    assert(r.getDouble(2) == 3.2)  // ITT dollars
    assert(r.getDouble(3) == 0.4)  // first stage
    assert(r.getDouble(4) == 8.0)  // Wald LATE
    assert(!r.getBoolean(6), s"z_fs=${r.getDouble(5)} should be strong")
  }

  test("ivWald: a null first stage short-circuits to LATE 0 and flags weak") {
    // both arms identical: no signups reach the threshold
    val rows = (0 until 20).flatMap { u =>
      Seq((u * 10L, u * 10L, u.toLong, "signup", 0.0),
        (u * 10L + 5, u * 10L + 5, u.toLong, "purchase", 3.0))
    }
    val s = spark; import s.implicits._
    val ev = rows.toDF("event_id", "tsv", "user_id", "event_type", "value")
      .select(col("event_id"), col("tsv").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val r = queries.AnalyticsQueries.ivWaldOf(ev).collect().head
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    assert(r.getBoolean(6))
  }

  test("ppmiEmbed: output matches a full plain-Scala replay on a two-community corpus") {
    val s = spark; import s.implicits._
    // community 1 (8 docs) dominates community 2 (4 docs)
    val docs = ((1 to 8).map(i => (i.toLong, "alpha beta gamma", "en", "a")) ++
      (9 to 12).map(i => (i.toLong, "delta epsilon", "en", "a")))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextQueries.ppmiEmbedOf(docs).collect()
      .map(r => r.getAs[Number](0).intValue ->
        (r.getAs[Number](1).longValue, r.getAs[Number](2).longValue)).toMap
    // slot of each token via the registered poly_hash (the same fold)
    graft.functions.PolyHash.register(s)
    val toks = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val slotOf = toks.map { t =>
      t -> s.sql(s"SELECT poly_hash('$t', 64)").collect().head
        .getAs[Number](0).intValue
    }.toMap
    val docSlots = (Seq.fill(8)(Seq("alpha", "beta", "gamma")) ++
      Seq.fill(4)(Seq("delta", "epsilon"))).map(_.map(slotOf).distinct)
    val n = docSlots.length.toLong
    val df = docSlots.flatten.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val pairs = docSlots.flatMap(ds =>
        ds.combinations(2).map(p => (p.min, p.max)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ppmi = pairs.flatMap { case ((a, b), cab) =>
      val v6 = math.max(0L,
        math.round(math.log(n.toDouble * cab / (df(a).toDouble * df(b))) * 1e6))
      if (v6 > 0L) Seq((a, b, v6), (b, a, v6)) else Nil
    }.toSeq
    var x = df.keys.map(_ -> 1000000L).toMap
    (1 to 4).foreach { _ =>
      // the operator divides the SUM (not per term), then ∞-normalizes
      val y = df.keys.map(a => a ->
        ppmi.filter(_._1 == a).map { case (_, b, v) => v * x(b) }.sum / 1000000L
      ).toMap
      val mx = math.max(y.values.max, 1L)
      x = y.map { case (k, v) => k -> v * 1000000L / mx }
    }
    assert(got.keySet == df.keySet)
    df.keys.foreach { sl =>
      assert(got(sl) == (df(sl), x(sl)), s"slot $sl")
    }
    // normalization invariant: the dominant slot sits at exactly 1e6
    assert(got.values.map(_._2).max == 1000000L)
  }

  test("rakingIpf: fixed-point sweep matches a plain-Scala replay; trimming bounds hold; margins move toward target") {
    val s = spark; import s.implicits._
    // skewed 2×2 corpus with a structural zero: src a dominates
    val docs = ((1 to 60).map(i => (i.toLong, "t", "en", "a")) ++
      (61 to 80).map(i => (i.toLong, "t", "de", "a")) ++
      (81 to 100).map(i => (i.toLong, "t", "en", "b")))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextQueries.rakingIpfOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // plain-Scala replay of the exact integer algebra
    val n = 100L
    var cells = Map(("a", "en") -> 60L, ("a", "de") -> 20L, ("b", "en") -> 20L)
      .map { case (k, c) => k -> (c, c * 1000000L / n, 1000000L) }
    val ns = 2L; val nl = 2L
    def sweep(bySrc: Boolean): Unit = {
      val key = (k: (String, String)) => if (bySrc) k._1 else k._2
      val nn = if (bySrc) ns else nl
      val masses = cells.groupBy(kv => key(kv._1)).map { case (g, m) =>
        g -> m.values.map(v => v._2 * v._3).sum
      }
      cells = cells.map { case (k, (c, ppm, w6)) =>
        val m = masses(key(k))
        val w = if (m == 0) w6
        else math.max(math.min(
          w6 * math.min(1000000000000000000L / (nn * m), 1000000000L)
            / 1000000, 1000000000L), 1L)
        k -> (c, ppm, w)
      }
    }
    (1 to 2).foreach { _ => sweep(true); sweep(false) }
    cells.foreach { case (k, (c, _, w6)) =>
      val (gc, gw, _, _) = got(k)
      assert(gc == c && gw == w6, s"cell $k")
      assert(w6 >= 1L && w6 <= 1000000000L)
    }
    // calibration moved the margins toward uniform: source b (20% of
    // mass, target 50%) got upweighted, source a downweighted
    assert(got(("b", "en"))._2 > 1000000L)
    assert(got(("a", "en"))._2 < 1000000L)
    // audit columns: row masses in ppm-of-target land nearer 1e6 than
    // the unweighted starting masses (800000 / 400000 ... per margin)
    val rowA = got(("a", "en"))._3; val rowB = got(("b", "en"))._3
    assert(math.abs(rowA - 1000000L) < math.abs(1600000L - 1000000L))
    assert(math.abs(rowB - 1000000L) < math.abs(400000L - 1000000L))
  }
}
