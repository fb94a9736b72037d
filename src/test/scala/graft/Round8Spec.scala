package graft

import org.apache.spark.sql.{Encoders, functions => F}
import graft.sketch.MgAggregator
import graft.queries.StreamQueries

/** Round-8 additions. */
class Round8Spec extends SparkSpec {

  test("MgAggregator: superset guarantee, size bound, and count error bound") {
    val s = spark
    import s.implicits._
    val k = 10
    // skewed stream: w0 ×600, w1 ×300, w2 ×150, tail of 1000 singletons
    val words = Seq.fill(600)("w0") ++ Seq.fill(300)("w1") ++ Seq.fill(150)("w2") ++
      (0 until 1000).map(i => s"t$i")
    val n = words.size
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mg = F.udaf(new MgAggregator(k), Encoders.STRING)
    // repartition forces real partial-summary merges (the mergeable form)
    val summary = words.toDF("v").repartition(8)
      .agg(mg($"v")).head().getAs[Map[String, Long]](0)
    assert(summary.size <= k - 1, s"summary overflowed: ${summary.size}")
    exact.foreach { case (w, c) =>
      if (c * k > n) assert(summary.contains(w), s"guaranteed HH $w missing")
      // kept counts never overestimate and undershoot by at most n/k
      summary.get(w).foreach { est =>
        assert(est <= c, s"$w overcounted: $est > $c")
        assert(est >= c - n / k, s"$w undershot past n/k: $est vs $c")
      }
    }
  }

  test("q_heavy_hitters equals the exact brute-force threshold count") {
    val s = spark
    import s.implicits._
    val got = StreamQueries.heavyHitters(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val toks = Tables(spark, sfDir, "documents")
      .select(F.explode(F.split(F.trim(F.col("text")), "\\s+")).as("tok"))
    val n = toks.count()
    val want = toks.groupBy("tok").count()
      .filter(F.col("count") * StreamQueries.MgK > n)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(1) * 1000000L / n))
      .sortBy(t => (-t._2, t._1))
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty, "gate corpus should have heavy hitters")
  }

  test("q_skyline equals the O(n²) dominance filter") {
    import graft.queries.ExtensionQueries
    val pts = Tables(spark, sfDir, "part")
      .select(F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("pc"), F.col("p_size"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val counts = pts.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.keys.toSeq
      .filter { case (pc, sz) =>
        !counts.keys.exists { case (qc, qz) =>
          qc <= pc && qz >= sz && (qc < pc || qz > sz) }
      }
      .map { case (pc, sz) => (pc / 100.0, sz, counts((pc, sz))) }
      .sortBy { case (p, s, _) => (p, s) }
    val got = ExtensionQueries.skyline(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty && got.size < pts.length, "frontier should be a strict subset")
    // frontier shape: strictly increasing size along increasing price
    assert(got.map(_._2) === got.map(_._2).sorted)
  }

  test("q_survival_km matches a driver-side Kaplan-Meier replay") {
    import graft.queries.ExtensionQueries
    val users = Tables(spark, sfDir, "events")
      .groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts"))).as("f"),
        F.min(F.when(F.col("event_type") === "purchase" && F.col("value") >= 150.0,
          F.unix_micros(F.col("ts")))).as("conv"),
        F.max(F.unix_micros(F.col("ts"))).as("l"))
      .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
    val end = users.map(_._3).max
    val obs = users.map { case (f, conv, _) =>
      ((conv.getOrElse(end) - f) / 86400000000L, conv.isDefined) }
    val days = obs.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toMap
    assert(obs.exists(_._2) && obs.exists(!_._2), "need both deaths and censoring")
    var atRisk = users.length.toLong
    var s = 1.0
    val want = days.keys.toSeq.sorted.map { day =>
      val (d, c) = days(day)
      s *= 1.0 - d.toDouble / atRisk
      val row = (day, d, c, atRisk, math.floor(s * 10000 + 0.5) / 10000)
      atRisk -= d + c
      row
    }
    val got = ExtensionQueries.survivalKm(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4)) === want.map(t => (t._1, t._2, t._3, t._4)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._5 - w._5) < 2e-4, s"surv drift at day ${g._1}: ${g._5} vs ${w._5}")
    }
    // survival curve is monotone non-increasing from 1
    assert(got.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("q_setsim_prefix is lossless vs the naive all-pairs join and actually prunes") {
    import graft.queries.TextQueries
    val docs = Tables(spark, sfDir, "documents")
    val grams = docs
      .select(F.col("doc_id"), F.split(F.trim(F.col("text")), "\\s+").as("w"))
      .select(F.col("doc_id"), F.explode(F.expr(
        """CASE WHEN size(w) >= 3
          |     THEN array_distinct(transform(sequence(0, size(w) - 3),
          |            i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
          |     ELSE array() END""".stripMargin)).as("gram"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = grams.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ids = byDoc.keys.toSeq.sorted
    val want = (for {
      (d1, i) <- ids.zipWithIndex; d2 <- ids.drop(i + 1)
      a = byDoc(d1); b = byDoc(d2)
      inter = (a & b).size
      j = inter.toDouble / (a.size + b.size - inter) if j >= 0.6
    } yield (d1, d2, math.floor(j * 1e6 + 0.5) / 1e6)).sortBy(t => (t._1, t._2))
    val got = TextQueries.setsimPrefix(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "gate corpus should contain similar pairs")
  }

  test("q_hard_negatives mines label-complement top-k with the semi-hard margin") {
    import graft.queries.SimilarityQueries
    val emb = Tables(spark, sfDir, "embeddings")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      if (na * nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = emb.filter(_._1 < 10).sortBy(_._1).flatMap { case (qid, qe, ql) =>
      val scored = emb.filter(_._1 != qid).map { case (cid, ce, cl) => (cid, cl, cos(qe, ce)) }
      val posCos = scored.filter(_._2 == ql).map(_._3).max
      scored.filter(_._2 != ql).sortBy(t => (-t._3, t._1)).take(5).zipWithIndex
        .map { case ((cid, cl, c), i) => (qid, ql, cid, cl, c, i + 1, posCos, c - posCos) }
    }
    val got = SimilarityQueries.hardNegatives(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4), r.getInt(5), r.getDouble(6), r.getDouble(7)))
    assert(got.map(t => (t._1, t._3, t._6)).toSeq === want.map(t => (t._1, t._3, t._6)).toSeq)
    got.zip(want).foreach { case (g, w) =>
      assert(g._2 == w._2 && g._4 == w._4 && g._2 != g._4, s"label constraint broken: $g")
      assert(math.abs(g._5 - w._5) < 2e-6 && math.abs(g._7 - w._7) < 2e-6 &&
        math.abs(g._8 - w._8) < 4e-6, s"score drift: $g vs $w")
    }
    // hard negatives exist: at least one anchor has a negative inside its margin
    assert(got.exists(_._8 > -0.05), "no remotely-hard negative found — check corpus")
  }

  test("q_bitext_mine matches a driver-side margin-scoring replay") {
    import graft.queries.SimilarityQueries
    val lang = Tables(spark, sfDir, "documents")
      .select(F.col("doc_id"), F.col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val emb = Tables(spark, sfDir, "embeddings")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      if (na * nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // scheme-1 sign-LSH bucket replay (8 planes, the shipped scale plan)
    def bucket(e: Array[Float]): Int = (0 until 8).map { p =>
      var dot = 0.0
      for (i <- e.indices) {
        val m = ((i + 1).toLong * (2654435761L + 4096L * p + 2L * p * p)) % 4294967296L
        dot += e(i).toDouble * (if (((m >> 15) & 1L) == 1L) 1.0 else -1.0)
      }
      if (dot > 0) 1 << p else 0
    }.sum
    val src = emb.filter(e => lang(e._1) == "en")
    val tgt = emb.filter(e => lang(e._1) != "en")
    // candidate iff buckets differ in <= 2 planes (1-flip probes both sides)
    val cr = for {
      (q, qe) <- src; (c, ce) <- tgt
      if Integer.bitCount(bucket(qe) ^ bucket(ce)) <= 2
    } yield (q, c, cos(qe, ce))
    val dq = cr.groupBy(_._1).view.mapValues { xs =>
      val top = xs.sortBy(t => (-t._3, t._2)).take(4).map(_._3)
      top.sum / top.size
    }.toMap
    val dc = cr.groupBy(_._2).view.mapValues { xs =>
      val top = xs.sortBy(t => (-t._3, t._1)).take(4).map(_._3)
      top.sum / top.size
    }.toMap
    val want = cr.map { case (q, c, x) => (q, c, x, x / ((dq(q) + dc(c)) / 2)) }
      .groupBy(_._1).values
      .map(_.minBy(t => (-t._4, t._2)))
      .filter(_._4 >= 1.1).toSeq.sortBy(_._1)
    val got = SimilarityQueries.bitextMine(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(t => (t._1, t._2)).toSeq === want.map(t => (t._1, t._2)))
    got.zip(want).foreach { case (g, w) =>
      assert(g._3 != "en" && math.abs(g._4 - w._3) < 2e-6 && math.abs(g._5 - w._4) < 2e-6,
        s"drift: $g vs $w")
    }
    assert(got.nonEmpty && got.map(_._1).distinct.length == got.length)
  }

  test("q_phrase_search equals a regex-free token-scan replay") {
    import graft.queries.TextQueries
    val want = Tables(spark, sfDir, "documents")
      .select(F.col("doc_id"), F.split(F.trim(F.col("text")), "\\s+").as("w"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      .flatMap { case (id, w) =>
        val hits = w.indices.dropRight(1).filter(i => w(i) == "hash" && w(i + 1) == "join")
        if (hits.isEmpty) None else Some((id, hits.size.toLong, hits.min))
      }.sortBy(_._1).toSeq
    val got = TextQueries.phraseSearch(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q_lsh_recall matches a driver-side md5-minhash banding replay") {
    import graft.queries.TextQueries
    val grams = Tables(spark, sfDir, "documents")
      .select(F.col("doc_id"), F.split(F.trim(F.col("text")), "\\s+").as("w"))
      .select(F.col("doc_id"), F.explode(F.expr(
        """CASE WHEN size(w) >= 3
          |     THEN array_distinct(transform(sequence(0, size(w) - 3),
          |            i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
          |     ELSE array() END""".stripMargin)).as("gram"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = grams.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def mh(i: Int, gs: Set[String]): Long =
      gs.map(g => java.lang.Long.parseLong(md5hex(s"$i:$g").take(15), 16)).min
    val sigs = byDoc.view.mapValues(gs => (0 until 16).map(mh(_, gs))).toMap
    val ids = byDoc.keys.toSeq.sorted
    val cand = (for {
      (d1, i) <- ids.zipWithIndex; d2 <- ids.drop(i + 1)
      if (0 until 4).exists(b =>
        (0 until 4).forall(r => sigs(d1)(b * 4 + r) == sigs(d2)(b * 4 + r)))
    } yield (d1, d2)).toSet
    val truth = (for {
      (d1, i) <- ids.zipWithIndex; d2 <- ids.drop(i + 1)
      a = byDoc(d1); b = byDoc(d2)
      inter = (a & b).size
      if inter.toDouble / (a.size + b.size - inter) >= 0.6
    } yield (d1, d2)).toSet
    val found = (cand & truth).size.toLong
    val r = TextQueries.lshRecall(spark, sfDir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((truth.size.toLong, cand.size.toLong, found)))
    assert(r.getLong(3) === found * 1000000L / truth.size)
    assert(r.getLong(0) > 0 && r.getLong(2) <= r.getLong(0))
  }

  test("q_rfm_segment scores quintiles from value histograms, ties whole") {
    import graft.queries.ExtensionQueries
    val rows = ExtensionQueries.rfmSegment(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))
    assert(rows.nonEmpty)
    // segment encodes the three scores; scores stay in 1..5
    rows.foreach { r =>
      assert(r._5 >= 1 && r._5 <= 5 && r._6 >= 1 && r._6 <= 5 && r._7 >= 1 && r._7 <= 5)
      assert(r._8 === r._5 * 100 + r._6 * 10 + r._7)
    }
    // ties score identically: same feature value ⇒ same score
    assert(rows.groupBy(_._2).forall(_._2.map(_._5).distinct.size == 1))
    assert(rows.groupBy(_._3).forall(_._2.map(_._6).distinct.size == 1))
    // monotonicity: fresher users never score lower on recency
    val byRec = rows.sortBy(_._2).map(_._5)
    assert(byRec.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // frequency: higher frequency never scores lower
    val byFreq = rows.sortBy(_._3).map(_._6)
    assert(byFreq.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("q_ewma_forecast equals the sequential recurrence exactly") {
    import graft.queries.ExtensionQueries
    val got = ExtensionQueries.ewmaForecast(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(got.nonEmpty && got.head._1 === 0L)
    var level = got.head._2.toDouble
    assert(got.head._3 === level && got.head._4.isEmpty)
    got.drop(1).foreach { case (_, c, lv, err) =>
      assert(err.get === c.toDouble - level, s"err mismatch at level $level")
      level = (c + level) / 2
      assert(lv === level, s"level mismatch: $lv vs $level") // bit-exact dyadic
    }
  }

  test("q_negative_sampling yields non-positive parts, k per customer, hash-replayable") {
    import graft.queries.ExtensionQueries
    val pos = Tables(spark, sfDir, "orders").join(
        Tables(spark, sfDir, "lineitem"),
        F.col("o_orderkey") === F.col("l_orderkey"))
      .select(F.col("o_custkey"), F.col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val maxPk = Tables(spark, sfDir, "part").agg(F.max("p_partkey")).head().getLong(0)
    val got = ExtensionQueries.negativeSampling(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    got.foreach { case (ck, pk, pick) =>
      assert(!pos.contains((ck, pk)), s"sampled a positive: $ck $pk")
      assert(pk >= 1 && pk <= maxPk && pick >= 1 && pick <= 4)
      // replay the draw: pk must be one of the customer's hash slots
      val slots = (0 until 16).map(s => 1 + ((ck * 2654435761L + s * 40503L + 7) % 4294967296L) % maxPk)
      assert(slots.contains(pk), s"non-replayable draw $ck -> $pk")
    }
    // every customer with >= 4 surviving draws got exactly 4
    val perCust = got.groupBy(_._1).view.mapValues(_.size)
    assert(perCust.values.forall(_ <= 4))
    assert(perCust.values.count(_ == 4) > perCust.size / 2)
  }

  test("q_char_entropy matches a driver-side histogram-entropy replay") {
    import graft.queries.TextQueries
    val want = Tables(spark, sfDir, "documents")
      .select(F.col("doc_id"), F.col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .map { case (id, t) =>
        val h = t.toCharArray.groupBy(identity).view.mapValues(_.length).toMap
        val n = h.values.sum
        val slc = h.values.map(c => c * (math.log(c) / math.log(2))).sum
        val e = math.log(n) / math.log(2) - slc / n
        (id, n.toLong, h.size.toLong, e)
      }.sortBy(_._1).toSeq
    val got = TextQueries.charEntropy(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) === want.map(t => (t._1, t._2, t._3)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) < 2e-4, s"entropy drift: $g vs $w") }
    // entropy bounded by log2(distinct)
    got.foreach(g => assert(g._4 >= -1e-9 && g._4 <= math.log(g._3.toDouble) / math.log(2) + 1e-9))
  }

  test("q_rrf_fuse ranks are permutations and the fused score matches the rank algebra") {
    import graft.queries.SimilarityQueries
    val rows = SimilarityQueries.rrfFuse(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._1).toSeq === (1 to rows.length))
    rows.foreach { case (_, _, rl, rs, rrf) =>
      val want = 1.0 / (60 + rl) + 1.0 / (60 + rs)
      assert(math.abs(rrf - want) < 1e-6, s"rrf mismatch: $rrf vs $want")
    }
    // fused order is non-increasing in rrf
    assert(rows.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) >= p(1) - 1e-9))
  }

  test("q_ndcg_eval matches a driver-side NDCG replay") {
    import graft.queries.SimilarityQueries
    val lab = Tables(spark, sfDir, "embeddings")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      if (na * nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def l2(x: Double): Double = math.log(x) / math.log(2)
    val want = lab.filter(_._1 < 10).sortBy(_._1).map { case (qid, qe, ql) =>
      val scored = lab.filter(_._1 != qid).map { case (cid, ce, cl) => (cid, cl, cos(qe, ce)) }
      val nRel = scored.count(_._2 == ql)
      val top = scored.sortBy(t => (-t._3, t._1)).take(10)
      val dcg = top.zipWithIndex.collect {
        case ((_, cl, _), i) if cl == ql => 1.0 / l2(i + 2) }.sum
      val idcg = (1 to math.min(10, nRel)).map(i => 1.0 / l2(i + 1)).sum
      (qid, nRel.toLong, dcg, dcg / idcg)
    }
    val got = SimilarityQueries.ndcgEval(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2)).toSeq === want.map(t => (t._1, t._2)).toSeq)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 2e-6 && math.abs(g._4 - w._4) < 2e-6, s"$g vs $w")
      assert(g._4 >= 0.0 && g._4 <= 1.0 + 1e-9)
    }
  }

  test("round-8 queries are repartition-invariant") {
    import graft.queries.{ExtensionQueries, StreamQueries, TextQueries}
    // skyline over a 7-way repartitioned part table
    val part7 = Tables(spark, sfDir, "part").repartition(7)
    assert(ExtensionQueries.skylineOf(part7).collect().toSeq ===
      ExtensionQueries.skyline(spark, sfDir).collect().toSeq)
    // setsim over a 5-way repartitioned documents table
    val docs5 = Tables(spark, sfDir, "documents").repartition(5)
    assert(TextQueries.setsimPrefixOf(docs5).collect().toSeq ===
      TextQueries.setsimPrefix(spark, sfDir).collect().toSeq)
    // EWMA over a 9-way repartitioned events table (bit-exact dyadic)
    val ev9 = Tables(spark, sfDir, "events").repartition(9)
    assert(ExtensionQueries.ewmaForecastOf(ev9).collect().toSeq ===
      ExtensionQueries.ewmaForecast(spark, sfDir).collect().toSeq)
  }

  test("q_vocab_encode matches a driver-side top-V vocab replay") {
    import graft.queries.TextQueries
    val docToks = Tables(spark, sfDir, "documents")
      .select(F.col("doc_id"), F.split(F.trim(F.col("text")), "\\s+").as("w"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val counts = docToks.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(25).map(_._1).toSet
    val want = docToks.map { case (id, w) =>
      val oov = w.count(!vocab.contains(_)).toLong
      (id, w.size.toLong, oov, oov * 1000000L / w.size)
    }.sortBy(_._1).toSeq
    val got = TextQueries.vocabEncode(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    assert(got.exists(_._3 > 0), "corpus should have OOV tokens at V=25")
  }

  test("q_pca_power matches a driver-side fenced power-iteration replay") {
    import graft.queries.SimilarityQueries
    val emb = Tables(spark, sfDir, "embeddings")
      .collect().map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    val d = 64
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mu = (0 until d).map(i => r6(emb.map(_(i)).sum / emb.length)).toArray
    val x = emb.map(v => v.indices.map(i => v(i) - mu(i)).toArray)
    var b = Array.fill(d)(1.0 / math.sqrt(d))
    for (_ <- 1 to 3) {
      val y = new Array[Double](d)
      x.foreach { row =>
        val dt = row.indices.map(i => row(i) * b(i)).sum
        row.indices.foreach(i => y(i) += row(i) * dt)
      }
      val nm = math.sqrt(y.map(s => s * s).sum)
      b = y.map(s => r6(s / nm))
    }
    val sg = if (b(0) >= 0) 1.0 else -1.0
    val lam = x.map { row => val dt = row.indices.map(i => row(i) * b(i)).sum; dt * dt }
      .sum / emb.length
    val got = SimilarityQueries.pcaPower(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === (0 until d))
    got.foreach { case (i, loading, eig) =>
      assert(math.abs(loading - sg * b(i)) < 5e-6, s"loading drift at $i: $loading vs ${sg * b(i)}")
      assert(math.abs(eig - lam) < 1e-3, s"eigval drift: $eig vs $lam")
    }
    assert(got.head._2 >= 0.0) // sign convention
    val norm = math.sqrt(got.map(t => t._2 * t._2).sum)
    assert(math.abs(norm - 1.0) < 1e-4)
    assert(got.head._3 > 0.0)
  }

  test("q_select_best keeps exactly the per-source top-k by the packed score") {
    import graft.queries.TextQueries
    val scored = Tables(spark, sfDir, "documents")
      .select(F.col("source"), F.col("doc_id"),
        (F.size(F.array_distinct(F.split(F.trim(F.col("text")), "\\s+"))).cast("long") * 1000000L
          + F.col("n_chars")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = scored.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (src, g) =>
      g.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
        .map { case ((_, id, q), i) => (src, i + 1, id, q) }
    }
    val got = TextQueries.selectBest(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    assert(got.nonEmpty && got.groupBy(_._1).values.forall(_.size <= 5))
  }

  test("q_zonemap_prune prunes zones and counts exactly") {
    import graft.queries.ExtensionQueries
    val r = ExtensionQueries.zonemapPrune(spark, sfDir).head()
    val (zt, zs, rs, rm, fp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val exact = Tables(spark, sfDir, "events")
      .filter(F.unix_micros(F.col("ts")).between(1704672000000000L, 1705276800000000L - 1))
      .count()
    assert(rm === exact, "zone-granular scan must not change the answer")
    assert(zs < zt, s"nothing pruned: $zs of $zt zones scanned")
    assert(rs >= rm && fp === rs - rm)
  }
}
