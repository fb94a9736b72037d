package graft

import org.apache.spark.sql.DataFrame

import graft.queries.SimilarityQueries

/** Round-13 additions: the session-scoped transient pin root (VERDICT
  * r12 "wrong" #1 / ADVICE r12), the shared graph adjacency trunks
  * (VERDICT r12 #1), and the digest-keyed scratch keys (ADVICE r12). */
class Round13Spec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def listTokens(): Set[String] = {
    val d = new java.io.File(s"${Tables.scratchDir}/pins")
    Option(d.list()).map(_.toSet).getOrElse(Set.empty)
  }

  // -------------------------------- cross-session pin isolation (#2)

  test("two isolated sessions interleave graph queries without colliding: distinct token dirs, no cross-wipe, identical answers") {
    val s1 = spark
    val s2 = spark.newSession()
    val before = listTokens()
    val sssp1 = rows(SimilarityQueries.sssp(s1, sfDir))
    val tok1 = (listTokens() -- before).headOption
      .orElse(listTokens().headOption).get
    val pins1 = new java.io.File(s"${Tables.scratchDir}/pins/$tok1")
    val mod1 = pins1.list().map(n =>
      n -> new java.io.File(pins1, n).lastModified()).toMap
    assert(mod1.nonEmpty)
    // the second session runs the SAME query (same transient tags):
    // under the r12 layout (pins/<tag>) this overwrote session 1's
    // live round state; now it lands in its own token dir
    val sssp2 = rows(SimilarityQueries.sssp(s2, sfDir))
    assert(sssp2 == sssp1)
    val toks = listTokens()
    assert(toks.size >= 2, s"expected two session token dirs, found $toks")
    val mod1After = pins1.list().map(n =>
      n -> new java.io.File(pins1, n).lastModified()).toMap
    assert(mod1After == mod1,
      "session 2's run touched session 1's transient pins")
    // and session 1 keeps answering on its own artifacts
    assert(rows(SimilarityQueries.sssp(s1, sfDir)) == sssp1)
  }

  test("startup sweep reaps only dead-session leftovers, never fresh entries") {
    val root = new java.io.File(s"${Tables.scratchDir}/pins")
    root.mkdirs()
    val stale = new java.io.File(root, "deadbeef0000")
    val fresh = new java.io.File(root, "cafe00001111")
    stale.mkdirs(); fresh.mkdirs()
    assert(stale.setLastModified(System.currentTimeMillis() - 13L * 3600 * 1000))
    Tables.sweepStaleScratch(spark)
    assert(!stale.exists(), "13h-old token dir survived the sweep")
    assert(fresh.exists(), "fresh token dir was reaped (live-sibling hazard)")
    fresh.delete()
  }

  test("sessionKey separates dirs whose String.hashCode collides (ADVICE r12: digest keys)") {
    // "Aa" and "BB" have identical 32-bit String.hashCode — under the
    // r12 hashCode keys these aliased readiness flags and pin paths
    assert("Aa".hashCode == "BB".hashCode)
    val kA = Tables.sessionKey(spark, "Aa")
    val kB = Tables.sessionKey(spark, "BB")
    assert(kA != kB, s"sessionKey aliased hashCode-colliding dirs: $kA")
  }

  // -------------------------------- full-string feature hash (#5)

  test("feature hash separates same-length same-first-char tokens (VERDICT r12 #5)") {
    val s = spark
    import s.implicits._
    // under the r12 (length·31 + first-codepoint) hash these four
    // pairs collided by construction; the full-string fold must not
    val pairs = Seq(("cat", "car"), ("hello", "hells"), ("aa", "ab"),
      ("data", "date"))
    graft.functions.PolyHash.register(spark)
    val slots = pairs.flatMap(p => Seq(p._1, p._2)).toDF("t")
      .selectExpr(graft.queries.TextQueries.tokSlotExprOf("t", 64) + " AS slot")
      .collect().map(_.getInt(0))
    pairs.indices.foreach { i =>
      assert(slots(2 * i) != slots(2 * i + 1),
        s"${pairs(i)} still collide at slot ${slots(2 * i)}")
    }
    // and the Spark fold equals the kernel's per-token weight path:
    // single-token docs' logits must rank identically to slot weights
    val docs = pairs.flatMap(p => Seq(p._1, p._2)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernelLogits = graft.queries.TextQueries.qualityClassifierOf(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val foldW = docs.selectExpr("doc_id",
        s"(${graft.queries.TextQueries.tokSlotExprOf("text", 64)} + 1L) * 2654435761L % 4294967296L % 17 - 8 AS w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernelLogits == foldW, "kernel and portable fold diverge")
  }

  // -------------------------------- KNN-Shapley data valuation

  test("knnShapley equals brute-force Shapley over all subsets on a hand fixture") {
    val s = spark
    import s.implicits._
    // 1 anchor (vec_id 0, inside the vec_id < 10 anchor cut) + 4 train
    // points at controlled distances; labels chosen so helpful and
    // harmful examples both appear. Remaining anchor slots stay empty
    // (ids 10+ are train by the engine's split rule).
    def v(x: Float) = (x +: Array.fill(63)(0.0f)).toArray
    // n = 6 > K = 5, with a MATCH at rank 6 behind the K-boundary: the
    // rank-3 mismatch then displaces it out of the top-K in full
    // coalitions — that's where strictly negative values come from
    val emb = Seq(
      (0L, v(0.0f), "A"),   // anchor, label A
      (10L, v(1.0f), "A"), (11L, v(2.0f), "A"), (12L, v(3.0f), "B"),
      (13L, v(4.0f), "A"), (14L, v(5.0f), "B"), (15L, v(6.0f), "A"))
      .toDF("vec_id", "embedding", "label")
    val got = graft.queries.SimilarityQueries.knnShapleyOf(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("shap12")).toMap
    // brute force: v(S) = (1/K)·Σ_{j≤min(K,|S|)} 1[j-th nearest of S
    // matches the anchor label], K = 5; Shapley by direct enumeration
    val K = 5
    val train = Seq((10L, 1.0, 1), (11L, 2.0, 1), (12L, 3.0, 0),
      (13L, 4.0, 1), (14L, 5.0, 0), (15L, 6.0, 1))
    def util(set: Seq[(Long, Double, Int)]): Double =
      if (set.isEmpty) 0.0
      else set.sortBy(_._2).take(K).map(_._3).sum.toDouble / K
    def fact(n: Int): Double = (1 to n).product.toDouble
    val n = train.length
    val shap = train.map { t =>
      val others = train.filterNot(_ == t)
      val contrib = (0 to others.length).flatMap { k =>
        others.combinations(k).map { sub =>
          fact(k) * fact(n - k - 1) / fact(n) *
            (util(sub :+ t) - util(sub))
        }
      }.sum
      t._1 -> contrib
    }.toMap
    shap.foreach { case (id, exact) =>
      val got12 = got(id)
      assert(math.abs(got12 / 1e12 - exact) < 1e-9,
        s"vec $id: engine ${got12 / 1e12} vs brute-force $exact")
    }
    // efficiency sanity on the all-match closed form is covered by the
    // recursion itself; here assert helpful > 0 > harmful (the rank-3
    // mismatch displaces the rank-6 match out of the top-K in full
    // coalitions, so it must be strictly negative)
    assert(got(10L) > 0L && got(12L) < 0L)
  }

  // -------------------------------- r13 wave: serving/training ops

  test("speculativeNgram: acceptance is exact on a fully-predictable corpus and the argmax tie-break is count-desc/token-asc") {
    val s = spark
    import s.implicits._
    // "a b a b a b": bigram argmax is a->b, b->a; every pair accepted
    val det = Seq((1L, "a b a b a b", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r1 = graft.queries.TextQueries.speculativeNgramOf(det).collect().head
    assert(r1.getAs[Long]("n_pairs") == 5L && r1.getAs[Long]("n_accept") == 5L)
    assert(r1.getAs[Long]("accept_ppm") == 1000000L)
    // "x a x b x a": x->a (2) beats x->b (1); pairs x_a,a_x,x_b,b_x,x_a
    // → accepted: both x->a pairs; a->x and b->x are each that token's
    // only continuation → accepted too; x->b rejected (draft says a)
    val mix = Seq((1L, "x a x b x a", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r2 = graft.queries.TextQueries.speculativeNgramOf(mix).collect().head
    assert(r2.getAs[Long]("n_pairs") == 5L && r2.getAs[Long]("n_accept") == 4L)
    assert(r2.getAs[Long]("accept_ppm") == 800000L)
  }

  test("prefixCache: LCP with the sorted predecessor matches a plain-Scala replay per source") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def lcpOf(a: String, b: String): Long = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      i.toLong
    }
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._1))
      val lcps = 0L +: sorted.sliding(2).map {
        case Array(p, c) => lcpOf(c._3, p._3)
      }.toSeq
      src -> (ds.length.toLong, lcps.count(_ >= 16).toLong, lcps.sum, lcps.max)
    }
    val got = graft.queries.TextQueries.prefixCache(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_cacheable"),
          r.getAs[Long]("shared_chars"), r.getAs[Long]("max_lcp"))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) => assert(got(src) == e, s"source $src") }
  }

  test("classBalance: effective numbers follow the closed form and weights normalize to 1") {
    val rows = graft.queries.TextQueries.classBalance(spark, sfDir).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val expected = (1.0 - math.pow(0.999, n.toDouble)) / (1.0 - 0.999)
      assert(math.abs(r.getAs[Double]("eff_n") - expected) < 1e-5, s"lang ${r.getString(0)}")
    }
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    // the rarest class carries the largest weight
    val byN = rows.sortBy(_.getAs[Long]("n"))
    assert(byN.head.getAs[Double]("weight") >= byN.last.getAs[Double]("weight"))
  }

  test("submodularSelect: greedy coverage equals a plain-Scala replay and cost is monotone nonincreasing") {
    val emb = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(v =>
        math.round(v.toDouble * 1000)).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cands = emb.keys.filter(_ < 16).toSeq.sorted
    val all = emb.keys.toSeq.sorted
    var best = all.map(_ -> 1000000000000000L).toMap
    var left = cands
    val expected = (1 to 4).map { r =>
      val scored = left.map(c =>
        c -> all.map(v => math.min(best(v), d2(emb(v), emb(c)))).sum)
      val (pick, cost) = scored.minBy { case (c, s) => (s, c) }
      left = left.filterNot(_ == pick)
      best = all.map(v => v -> math.min(best(v), d2(emb(v), emb(pick)))).toMap
      (r, pick, cost)
    }
    val got = graft.queries.SimilarityQueries.submodularSelect(spark, sfDir)
      .collect().map(r => (r.getAs[Int]("round"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("total_cost"))).toSeq
    assert(got == expected, s"got $got expected $expected")
    val costs = got.map(_._3)
    assert(costs.zip(costs.tail).forall { case (a, b) => b <= a })
  }

  test("annRptree: per-shard median splits balance leaves within one row and recall is sane") {
    val r = graft.queries.SimilarityQueries.annRptree(spark, sfDir).collect().head
    val emb = Tables(spark, sfDir, "embeddings")
    val nVec = emb.count()
    val nLab = emb.select("label").distinct().count()
    // every (label-shard, leaf) cell exists when shards have ≥ 4 rows
    assert(r.getAs[Long]("n_leaves") <= 4L * nLab)
    assert(r.getAs[Long]("n_leaves") > nLab)
    // median splits: within a shard, leaf sizes differ by ≤ 1 per cut;
    // across shards the spread is bounded by shard-size spread + 2
    val shardSizes = emb.groupBy("label").count().collect().map(_.getLong(1))
    assert(r.getAs[Long]("max_leaf") <= shardSizes.max / 4 + 2)
    assert(r.getAs[Long]("min_leaf") >= math.max(0L, shardSizes.min / 4 - 1))
    assert(r.getAs[Long]("n_anchors") == math.min(10L, nVec))
    val ppm = r.getAs[Long]("mean_recall_ppm")
    assert(ppm >= 0L && ppm <= 1000000L)
  }

  test("influenceProxy: mislabeled train docs land in the harmful lane, clean ones in helpful") {
    val s = spark
    import s.implicits._
    // separable corpus with exactly 2 mislabeled TRAIN-split docs:
    // their gradients oppose the val mean gradient by construction
    val buckets = spark.range(300).selectExpr("id",
        graft.queries.TextQueries.splitBucketOf("id") + " AS b")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val trainIds = (0L until 300L).filter(buckets(_) < 80)
    val flipped = trainIds.take(2).toSet
    val docs = (0L until 300L).map { id =>
      val en = id % 2 == 0
      val lang = if (flipped(id)) { if (en) "de" else "en" }
        else if (en) "en" else "de"
      (id, if (en) "aa aa" else "bb bb", lang, "web", 5L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.queries.TextQueries.influenceProxyOf(docs).collect()
    val harmful = out.filter(_.getAs[String]("lane") == "harmful")
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id"))
    val helpful = out.filter(_.getAs[String]("lane") == "helpful")
      .map(_.getAs[Long]("doc_id")).toSet
    // the two planted flips are the MOST harmful examples
    assert(harmful.take(2).toSet == flipped,
      s"harmful head ${harmful.take(2).toSeq} != planted $flipped")
    assert(flipped.intersect(helpful).isEmpty)
    // ranks are 1..10 per lane
    assert(out.count(_.getAs[String]("lane") == "helpful") == 10)
    assert(out.filter(_.getAs[String]("lane") == "helpful")
      .map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 10))
  }

  test("ipsEval: under a uniform logger IPS equals the on-slate direct mean exactly; SNIPS self-normalizes") {
    val s = spark
    import s.implicits._
    // uniform logger over 20 items (μ(k) = 1/20), target = k < 10:
    // w = (1/10)/(1/20) = 2 on-slate. IPS = (1/N)·Σ_{k<10} 2·r =
    // 2·(Σ on-slate r)/N; with half the log on-slate that equals the
    // on-slate mean exactly. SNIPS = Σ2r/Σ2 = direct mean too.
    val evs = (0 until 200).map { i =>
      val k = i % 20
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L,
        "view", if (k < 10) 4.0 + k else 100.0, s"""{"k": $k}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.queries.ExtensionQueries.ipsEvalOf(evs).collect().head
    assert(r.getAs[Long]("n_logged") == 200L && r.getAs[Long]("n_on_slate") == 100L)
    val direct = (0 until 10).map(4.0 + _).sum / 10
    assert(math.abs(r.getAs[Double]("direct_value") - direct) < 1e-6)
    assert(math.abs(r.getAs[Double]("ips_value") - direct) < 1e-6)
    assert(math.abs(r.getAs[Double]("snips_value") - direct) < 1e-6)
    // skewed logger: over-logged on-slate items get DOWN-weighted —
    // estimators stay consistent for the target policy's true value
    val skew = ((0 until 300).map { i => // item 0 logged 3x as often
      val k = if (i % 3 == 0) 0 else (i % 20)
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L,
        "view", if (k < 10) 4.0 + k else 100.0, s"""{"k": $k}""")
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r2 = graft.queries.ExtensionQueries.ipsEvalOf(skew).collect().head
    // true value of uniform-over-slate policy = mean of 4..13 = 8.5
    assert(math.abs(r2.getAs[Double]("ips_value") - 8.5) < 0.5)
    assert(r2.getAs[Double]("direct_value") < 8.5) // naive mean is biased low
  }

  test("dpQuantile: a spiked distribution pins both the true and the DP median to the spike bin") {
    val s = spark
    import s.implicits._
    // 999 purchases at $5.50 + one at $99: utility of the $5 bin is
    // ~0 while every other bin sits ~1000 ranks away — ε/2·Δu ≈ 250
    // dwarfs the O(1) Gumbel spread, so the mechanism must pick it
    val evs = ((1 to 999).map(i => (i.toLong,
      java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "purchase", 5.50, "{}")) :+
      ((1000L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "purchase", 99.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.queries.ExtensionQueries.dpQuantileOf(evs).collect().head
    assert(r.getAs[Long]("n") == 1000L)
    assert(r.getAs[Long]("true_median_cents") == 550L)
    assert(r.getAs[Long]("dp_median_cents") == 550L)
    assert(r.getAs[Long]("err_cents") == 0L)
    // corpus run: error is bounded by the bin width + mechanism spread
    val c = graft.queries.ExtensionQueries.dpQuantile(spark, sfDir).collect().head
    assert(c.getAs[Long]("n") > 0L)
    assert(c.getAs[Double]("epsilon") == 0.5)
  }

  // -------------------------------- real BMP decode (#7)

  test("decodeBmp parses a hand-assembled container and hits every error-lane branch") {
    import graft.queries.MultimodalQueries
    // 2 rows of 12 pixel bytes: values 10..33
    val px = (10 until 34).map(_.toByte).toArray
    val bmp = MultimodalQueries.buildBmp(px)
    assert(bmp.length == 54 + 24)
    val ok = MultimodalQueries.decodeBmp(1L, bmp)
    assert(ok.status == "ok")
    assert(ok.width.contains(4) && ok.height.contains(2) && ok.bpp.contains(24))
    assert(ok.n_px.contains(8L))
    assert(ok.px_sum.contains((10 until 34).map(_.toLong).sum))
    assert(ok.px_min.contains(10) && ok.px_max.contains(33))
    // error lanes: each is a distinct real container defect
    assert(MultimodalQueries.decodeBmp(2L, bmp.take(10)).status == "too_short")
    val badMagic = bmp.clone(); badMagic(0) = 'X'.toByte
    assert(MultimodalQueries.decodeBmp(3L, badMagic).status == "bad_magic")
    val badBpp = bmp.clone(); badBpp(28) = 8.toByte
    assert(MultimodalQueries.decodeBmp(4L, badBpp).status == "unsupported_bpp")
    val badSize = bmp.clone(); badSize(2) = (badSize(2) + 1).toByte
    assert(MultimodalQueries.decodeBmp(5L, badSize).status == "size_mismatch")
    val badH = bmp.clone(); badH(22) = 9.toByte // claims 9 rows, has 2
    // keep the claimed file size consistent so the height check fires
    assert(MultimodalQueries.decodeBmp(6L, badH).status == "truncated_pixels")
  }

  test("mediaDecode: ok-lane stats equal a plain-Scala byte replay; corrupted ids land in the error lane") {
    import graft.queries.MultimodalQueries
    val out = MultimodalQueries.mediaDecode(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val bytes = docs(id).getBytes("UTF-8")
      val rows = bytes.length / 12
      assert(rows >= 1)
      if (id % 7 == 0) {
        assert(r.getAs[String]("status") == "bad_magic")
        assert(r.isNullAt(r.fieldIndex("px_sum")))
      } else {
        assert(r.getAs[String]("status") == "ok")
        val used = bytes.take(rows * 12).map(_ & 0xff)
        assert(r.getAs[Long]("px_sum") == used.map(_.toLong).sum, s"doc $id sum")
        assert(r.getAs[Int]("px_min") == used.min && r.getAs[Int]("px_max") == used.max)
        assert(r.getAs[Int]("height") == rows && r.getAs[Long]("n_px") == 4L * rows)
      }
    }
    // the fixture actually exercises both lanes
    assert(out.exists(_.getAs[String]("status") == "bad_magic"))
    assert(out.count(_.getAs[String]("status") == "ok") > out.length / 2)
  }

  test("decodeWav walks chunks (junk skipped, odd-size padded), handles signed samples, and hits every error lane") {
    import graft.queries.MultimodalQueries
    // two samples: 0x0102 = 258 and 0xFFFE = -2 (signed 16-bit LE)
    val data = Array(0x02, 0x01, 0xfe, 0xff).map(_.toByte)
    Seq(false, true).foreach { junk =>
      val wav = MultimodalQueries.buildWav(data, withJunk = junk)
      val ok = MultimodalQueries.decodeWav(1L, wav)
      assert(ok.status == "ok", s"junk=$junk")
      assert(ok.n_samples.contains(2L))
      assert(ok.s_min.contains(-2) && ok.s_max.contains(258))
      assert(ok.s_sum.contains(256L))
    }
    val wav = MultimodalQueries.buildWav(data, withJunk = false)
    val badMagic = wav.clone(); badMagic(0) = 'X'.toByte
    assert(MultimodalQueries.decodeWav(2L, badMagic).status == "bad_magic")
    val badWave = wav.clone(); badWave(8) = 'X'.toByte
    assert(MultimodalQueries.decodeWav(3L, badWave).status == "bad_wave")
    val badFmt = wav.clone(); badFmt(20) = 3.toByte // IEEE float format
    assert(MultimodalQueries.decodeWav(4L, badFmt).status == "unsupported_format")
    val trunc = wav.clone()
    // data chunk claims more bytes than the payload carries
    trunc(wav.length - data.length - 4) = 99.toByte
    assert(MultimodalQueries.decodeWav(5L, trunc).status == "truncated_chunk")
    assert(MultimodalQueries.decodeWav(6L, wav.take(10)).status == "too_short")
  }

  test("wavDecode: ok-lane stats equal a plain-Scala 16-bit LE replay for both junk and plain containers") {
    import graft.queries.MultimodalQueries
    val out = MultimodalQueries.wavDecode(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val bytes = docs(id).getBytes("UTF-8")
      if (id % 11 == 0) assert(r.getAs[String]("status") == "bad_magic")
      else {
        assert(r.getAs[String]("status") == "ok", s"doc $id")
        val samples = bytes.take(bytes.length / 2 * 2).grouped(2)
          .map(p => (p(0) & 0xff) | ((p(1) & 0xff) << 8)).toSeq
        assert(r.getAs[Long]("n_samples") == samples.length.toLong)
        assert(r.getAs[Long]("s_sum") == samples.map(_.toLong).sum, s"doc $id")
        assert(r.getAs[Int]("s_min") == samples.min && r.getAs[Int]("s_max") == samples.max)
      }
    }
    assert(out.exists(_.getAs[String]("status") == "bad_magic"))
    // junk-chunk containers (id % 5 == 0, not corrupt) decode identically
    assert(out.exists(r => r.getAs[Long]("media_id") % 5 == 0
      && r.getAs[String]("status") == "ok"))
  }

  // -------------------------------- shared adjacency trunks (#1)

  test("graph census family shares one keyed und/sym adjacency trunk and no query rewrites it") {
    val t1 = rows(SimilarityQueries.triangleCount(spark, sfDir))
    val keyedRoot = new java.io.File(s"${Tables.scratchDir}/pins-keyed")
    val trunks = keyedRoot.list().filter(n =>
      n.startsWith("undadj-") || n.startsWith("symadj-"))
    assert(trunks.nonEmpty, s"expected keyed undadj trunk, found ${keyedRoot.list().mkString(",")}")
    SimilarityQueries.sssp(spark, sfDir).count() // forces symadj too
    val all = keyedRoot.list().filter(n =>
      n.startsWith("undadj-") || n.startsWith("symadj-"))
    assert(all.length >= 2, s"expected undadj+symadj, found ${all.mkString(",")}")
    val mod1 = all.map(n =>
      n -> new java.io.File(keyedRoot, n).lastModified()).toMap
    // five more family members must READ the trunks, not rebuild them
    SimilarityQueries.clusteringCoeff(spark, sfDir).count()
    SimilarityQueries.assortativity(spark, sfDir).count()
    SimilarityQueries.kcore(spark, sfDir).count()
    SimilarityQueries.spectralRadius(spark, sfDir).count()
    SimilarityQueries.richClub(spark, sfDir).count()
    val mod2 = all.map(n =>
      n -> new java.io.File(keyedRoot, n).lastModified()).toMap
    all.foreach { t =>
      assert(mod2(t) == mod1(t), s"keyed trunk $t was rewritten by a family member")
    }
    // and the trunk path agrees with the per-edge-list derivation
    val edges = SimilarityQueries.knnGraph(spark, sfDir).select("src", "dst", "cos")
    assert(t1 == rows(SimilarityQueries.triangleCountOnEdges(edges)))
  }
}
