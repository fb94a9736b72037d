package graft

import org.apache.spark.sql.functions._
import graft.queries.{ExtensionQueries, SimilarityQueries, StreamQueries, TextQueries}

/** Round-6 operators: TextRank, BM25, int8 quantization, SCD-2,
  * grouping sets, MAD anomaly gate — each against a hand-computable
  * fixture (the oracle run covers the corpus; these pin semantics). */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  test("textrank: hub word outranks leaves, rank mass conserved, isolated word floors at 0.15") {
    // star graph: "hub" adjacent to every leaf; "lone" isolated
    val docs = Seq(
      (0L, "hub a"), (1L, "hub b"), (2L, "hub c"), (3L, "hub d"),
      (4L, "lone")).toDF("doc_id", "text")
    val out = TextQueries.textRankOf(docs).collect()
    val rank = out.map(r => r.getString(0) -> r.getDouble(2)).toMap
    val hub = rank("hub")
    for (leaf <- Seq("a", "b", "c", "d"))
      assert(hub > rank(leaf), s"hub $hub should outrank $leaf ${rank(leaf)}")
    assert(rank("lone") == 0.15, "isolated word keeps the (1-d) floor")
    // no dangling nodes among the connected 5 → iteration preserves
    // their total rank mass (sum = N exactly, up to the 6-dp rounding)
    val connected = out.filter(_.getString(0) != "lone").map(_.getDouble(2)).sum
    assert(math.abs(connected - 5.0) < 1e-4, s"mass $connected != 5")
    // degrees: hub touches 4 leaves; each leaf only the hub
    val deg = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(deg("hub") == 4 && deg("a") == 1 && deg("lone") == 0)
  }

  test("bm25: scores match the closed-form formula on a 3-doc corpus") {
    val docs = Seq(
      (0L, "x x x y"), // tf(x)=3, tf(y)=1, dl=4
      (1L, "x y"),     // tf(x)=1, tf(y)=1, dl=2
      (2L, "z z z")    // no query terms (x, y beat z on df)
    ).toDF("doc_id", "text")
    val out = TextQueries.bm25Of(docs).collect()
      .map(r => r.getLong(1) -> (r.getInt(0), r.getLong(2), r.getDouble(3))).toMap
    // df: x=2, y=2, z=1 → query = top-5 by (df desc, term asc) = all 3
    // terms; doc 2 matches only z. N=3, avgdl=9/3=3.
    def idf(df: Long) = math.log(1.0 + (3 - df + 0.5) / (df + 0.5))
    def ts(tf: Long, df: Long, dl: Long) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val exp0 = r6(ts(3, 2, 4) + ts(1, 2, 4))
    val exp1 = r6(ts(1, 2, 2) + ts(1, 2, 2))
    val exp2 = r6(ts(3, 1, 3))
    assert(out(0L)._3 == exp0 && out(0L)._2 == 2)
    assert(out(1L)._3 == exp1 && out(1L)._2 == 2)
    assert(out(2L)._3 == exp2 && out(2L)._2 == 1)
    // the rare-term doc wins on idf; ranks follow score desc
    assert(out(2L)._1 == 1, s"doc 2 (rare term) should rank first: $out")
  }

  test("int8 quantization: half-step error bound corpus-wide, exact code norm on a hand vector") {
    val corpus = SimilarityQueries.embeddingQuantizeOf(
      Tables(spark, sfDir, "embeddings")).collect()
    assert(corpus.length > 0)
    corpus.foreach { r =>
      val (scale, maxErr) = (r.getDouble(2), r.getDouble(4))
      // q = half-up(x/scale) → |q·scale − x| ≤ scale/2 (+rounding slack)
      assert(maxErr <= scale / 2 + 1e-8, s"vec ${r.getLong(0)}: $maxErr > $scale/2")
    }
    val hand = Seq((0L, Array(1.0f, -0.5f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val row = SimilarityQueries.embeddingQuantizeOf(hand).head()
    // scale = 1/127; q = [127, floor(-63.5 + 0.5) = -63, 0]
    assert(row.getLong(3) == 127L * 127 + 63L * 63, s"qnorm ${row.getLong(3)}")
    assert(row.getLong(1) == 3)
  }

  test("int8 quantization: equals a plain-Scala reference on seeded random vectors") {
    // seeded generator: negatives, zeros, denormal-ish and huge
    // magnitudes, dims 1..9, plus the all-zero vector (scale = 0)
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = {
      val dim = 1 + rnd.nextInt(9)
      Array.fill(dim)(rnd.nextInt(5) match {
        case 0 => 0.0f
        case 1 => (rnd.nextFloat() - 0.5f) * 1e-30f
        case 2 => (rnd.nextFloat() - 0.5f) * 1e30f
        case _ => rnd.nextFloat() * 2 - 1
      })
    }
    val vecs = (Array.fill(60)(vec()) :+ Array(0.0f, 0.0f, 0.0f)).zipWithIndex
      .map { case (v, i) => (i.toLong, v, 0) }.toSeq
    // mirrors Det.rnd incl. its 2^53/10^s identity guard (above it,
    // s-decimal rounding is below double resolution)
    def r(x: Double, s: Int) = {
      val f = math.pow(10, s)
      if (math.abs(x) < 9007199254740992.0 / f) math.floor(x * f + 0.5) / f else x
    }
    val expected = vecs.map { case (id, vf, _) =>
      val v = vf.map(_.toDouble)
      val scale = v.map(math.abs).foldLeft(0.0)(math.max) / 127
      val q = if (scale == 0) v.map(_ => 0)
        else v.map(x => math.floor(x / scale + 0.5).toInt)
      val err = q.zip(v).map { case (qi, xi) => math.abs(qi * scale - xi) }
      (id, v.length.toLong, r(scale, 8),
        q.foldLeft(0L)((a, x) => a + x.toLong * x),
        r(err.foldLeft(0.0)(math.max), 8),
        r(err.foldLeft(0.0)((a, e) => a + e * e) / v.length, 10))
    }.sortBy(_._1)
    val got = SimilarityQueries
      .embeddingQuantizeOf(vecs.toDF("vec_id", "embedding", "label"))
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getDouble(2),
        row.getLong(3), row.getDouble(4), row.getDouble(5)))
      .toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("quantized ann: high recall vs the brute-force cosine baseline") {
    val base = SimilarityQueries.cosineTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = SimilarityQueries.annQuantized(spark, sfDir).collect()
    val got = quant.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base.nonEmpty && quant.nonEmpty)
    val recall = (base & got).size.toDouble / base.size
    assert(recall >= 0.9, s"int8-shortlist recall $recall vs exact top-k")
    // the rerank stage is exact: within each query, cosines are
    // non-increasing with rank
    quant.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("kmv aggregator: reduce/merge equal brute-force bottom-k on random inputs and splits") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 40) {
      val k = 1 + rnd.nextInt(8) * 2 // 1..15, varied parity
      val agg = new graft.sketch.KmvAggregator(k)
      // duplicates and adversarial orderings included
      val n = rnd.nextInt(60)
      val xs = Array.fill(n)(rnd.nextInt(20).toLong)
      val expected = xs.distinct.sorted.take(k).toList
      // sequential reduce
      val reduced = xs.foldLeft(agg.zero)(agg.reduce)
      assert(reduced.toList == expected, s"trial $trial reduce k=$k")
      // random split points, each side reduced then merged (either order)
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (l, r) = xs.splitAt(cut)
      val (bl, br) = (l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.merge(bl.clone(), br).toList == expected, s"trial $trial merge k=$k")
      assert(agg.merge(br.clone(), bl).toList == expected, s"trial $trial merge-comm k=$k")
    }
  }

  test("kmv set algebra: collapses to exact under k, bounded error above k") {
    // sf0.001: few distinct users per type → the merged min-set holds
    // the whole union, so the estimates ARE the exact answers
    val small = StreamQueries.kmvIntersect(spark, sfDir).collect()
    assert(small.nonEmpty)
    small.foreach { r =>
      if (r.getLong(4) < 64) { // usz < k
        assert(r.getDouble(7) == r.getLong(3).toDouble,
          s"${r.getString(0)}/${r.getString(1)}: est_union ${r.getDouble(7)} != exact ${r.getLong(3)}")
        assert(r.getDouble(8) == r.getLong(2).toDouble,
          s"est_inter ${r.getDouble(8)} != exact ${r.getLong(2)}")
      }
    }
    // sf0.01: 150 users per type → true estimate regime; KMV stderr at
    // k=64 is ~12.5%, gate at a generous 3-4σ band
    val big = StreamQueries.kmvIntersect(spark, "/root/testdata/sf0.01").collect()
    assert(big.exists(_.getLong(4) == 64), "sf0.01 should saturate the sketch")
    big.foreach { r =>
      val (exInter, exUnion) = (r.getLong(2).toDouble, r.getLong(3).toDouble)
      assert(math.abs(r.getDouble(7) - exUnion) <= 0.4 * exUnion,
        s"${r.getString(0)}/${r.getString(1)}: est_union ${r.getDouble(7)} vs $exUnion")
      assert(math.abs(r.getDouble(8) - exInter) <= 0.5 * exInter + 5,
        s"est_inter ${r.getDouble(8)} vs $exInter")
    }
  }

  test("scd2: consecutive same-state events collapse into dated runs") {
    val events = Seq(
      (0L, 1000000L, 7L, "A", 1.0, "{}"),
      (1L, 2000000L, 7L, "A", 1.0, "{}"),
      (2L, 3000000L, 7L, "B", 1.0, "{}"),
      (3L, 4000000L, 7L, "A", 1.0, "{}")
    ).toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = ExtensionQueries.scd2Of(events).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(out.toSeq == Seq(
      (1L, "A", 1000000L, 3000000L, 2L, false), // A-run: 2 events
      (2L, "B", 3000000L, 4000000L, 1L, false),
      (3L, "A", 4000000L, -1L, 1L, true)), out.mkString(", "))
  }

  test("grouping sets: marginals and grand total reconcile") {
    val out = ExtensionQueries.groupingSetsAgg(spark, sfDir).collect()
    val byGid = out.groupBy(_.getLong(0))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val total = byGid(3L).head
    assert(byGid(0L).map(_.getLong(3)).sum == total.getLong(3), "cells != total n")
    assert(byGid(1L).map(_.getLong(4)).sum == total.getLong(4), "flag marginal != total qty")
    assert(byGid(2L).map(_.getLong(3)).sum == total.getLong(3), "status marginal != total n")
    assert(total.getLong(3) ==
      Tables(spark, sfDir, "lineitem").count())
  }

  test("triangle count: K4 gives 3 per vertex, a 3-cycle gives 1, chains give 0") {
    val docs = Seq(
      (0L, "a b c a"),          // 3-cycle: edges ab bc ca
      (1L, "p q r s p r q s"),  // K4: edges pq qr rs sp pr qs
      (2L, "x y")               // chain: no triangle
    ).toDF("doc_id", "text")
    val out = TextQueries.triangleCountOf(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (w <- Seq("a", "b", "c")) assert(out(w) == 1, s"$w: ${out(w)}")
    for (w <- Seq("p", "q", "r", "s")) assert(out(w) == 3, s"$w: ${out(w)}")
    for (w <- Seq("x", "y")) assert(out(w) == 0, s"$w: ${out(w)}")
  }

  test("winsorize: exact rank-pick caps, clamp accounting, cents-exact mean") {
    val events = (1 to 20).map(i =>
      (i.toLong, i * 1000000L, 1L, "t", i.toDouble, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = ExtensionQueries.winsorizeOf(events).head()
    // n=20: p05 at rank ceil(20·5/100)=1 → 1.0; p95 at rank 19 → 19.0;
    // only 20.0 clamps (high); winsorized sum = 190 + 19 = 209
    assert(r.getLong(1) == 20)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 19.0)
    assert(r.getLong(4) == 0 && r.getLong(5) == 1)
    assert(r.getDouble(6) == 10.45, s"win_mean ${r.getDouble(6)}")
  }

  test("chi-square: identical distributions across cohorts give exactly 0") {
    val events = (0 until 8).map { i =>
      (i.toLong, i * 1000000L, (i % 4).toLong, if (i < 4) "a" else "b", 1.0, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = ExtensionQueries.chiSquareOf(events).head()
    assert(r.getLong(0) == 8 && r.getLong(1) == 3) // dof = (2-1)(4-1)
    assert(r.getDouble(2) == 0.0, s"chi2 ${r.getDouble(2)}")
  }

  test("skew stats: hand-computable Gini over multiplicities [1,1,2,4]") {
    // users with 1,1,2,4 events: Gini = Σ(2i−n−1)cᵢ/(nΣc)
    //   = (−3·1 − 1·1 + 1·2 + 3·4)/(4·8) = 10/32 = 0.3125
    val rows = Seq(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 4).flatMap {
      case (u, k) => Seq.fill(k)(u)
    }.zipWithIndex.map { case (u, i) => (i.toLong, u) }
    val df = rows.toDF("event_id", "user_id")
    val r = ExtensionQueries.skewProfileOf(df, "user_id").head()
    assert(r.getLong(1) == 8 && r.getLong(2) == 4, "n_rows/n_keys")
    assert(r.getLong(3) == 4, "max_c")
    assert(r.getLong(4) == 1 && r.getLong(5) == 4, "p50/p99 multiplicity")
    assert(r.getDouble(6) == 2.0, "skew_ratio = max/avg = 4/2")
    assert(r.getDouble(7) == 0.5, "top_share")
    assert(r.getDouble(8) == 0.3125, s"gini ${r.getDouble(8)}")
  }

  test("rank functions: quartile bands carry exact percent_rank/cume_dist ratios") {
    val events = (1 to 8).map(i =>
      (i.toLong, i * 1000000L, 1L, "t", i.toDouble, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val out = ExtensionQueries.rankFunctionsOf(events).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((2L, 1.0, 2.0, 1.0 / 7, 0.25)))
    assert(out(4L) == ((2L, 7.0, 8.0, 1.0, 1.0)))
  }

  test("fuzzy match: equals a brute-force edit-distance sweep of the distinct names") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables(spark, sfDir, "part").select("p_name").distinct()
      .collect().map(_.getString(0))
    val brute = (for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last && lev(a, b) <= 2
    } yield (a, b, lev(a, b).toLong)).toSet
    val got = ExtensionQueries.fuzzyMatch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "fixture should contain near-identical names")
    assert(got == brute,
      s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
  }

  test("textrank: rank mass is conserved on random corpora without isolated words") {
    val rnd = new scala.util.Random(7)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val docs = (0 until 30).map { i =>
      // ≥2 tokens per doc and a shared vocabulary keep every word
      // connected, so iteration preserves total rank mass (= #words)
      (i.toLong, Array.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextQueries.textRankOf(docs).collect()
    val words = out.map(_.getString(0)).toSet
    val isolated = out.filter(r => r.getLong(1) == 0 && words.size > 1)
    val connectedMass = out.filter(_.getLong(1) > 0).map(_.getDouble(2)).sum
    val connectedN = out.count(_.getLong(1) > 0)
    assert(math.abs(connectedMass - connectedN) < 1e-4,
      s"mass $connectedMass over $connectedN connected words (isolated: ${isolated.length})")
  }

  test("profile: one row per column, consistent with direct aggregates") {
    val o = Tables(spark, sfDir, "orders")
    val out = ExtensionQueries.profile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"))
    val n = o.count()
    out.values.foreach(r => assert(r.getLong(1) == n))
    val ck = out("o_custkey")
    assert(ck.getLong(3) ==
      o.select(countDistinct("o_custkey")).head().getLong(0))
    assert(ck.isNullAt(4) && ck.isNullAt(5)) // numeric lane only
    assert(ck.getDouble(6) ==
      o.agg(min("o_custkey")).head().getLong(0).toDouble)
    val st = out("o_orderstatus")
    assert(st.isNullAt(6) && st.isNullAt(7)) // string lane only
    assert(st.getString(4) == o.agg(min("o_orderstatus")).head().getString(0))
  }

  test("markov transitions: bigram counts and row-normalized probabilities") {
    val events = Seq(
      (1L, 1L, "A"), (2L, 2L, "B"), (3L, 3L, "A"), (4L, 4L, "B"), // u1: A→B A→B B→A
      (5L, 1L, "A"), (6L, 2L, "A")                                 // u2: A→A
    ).map { case (id, t, ty) => (id, t * 1000000L, id % 2 + 1, ty, 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("user_id", when(col("event_id") <= 4, 1L).otherwise(2L))
    val out = ExtensionQueries.markovTransitionsOf(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("A", "B")) == ((2L, 3L, 0.666667)), out.toString)
    assert(out(("A", "A")) == ((1L, 3L, 0.333333)))
    assert(out(("B", "A")) == ((1L, 1L, 1.0)))
  }

  test("attribution: purchases credit first and last preceding touch") {
    val events = Seq(
      (1L, 1L, "view", 10.0), (2L, 2L, "click", 20.0),
      (3L, 3L, "purchase", 30.0), (4L, 4L, "purchase", 40.0),
      (5L, 5L, "purchase", 99.0) // second user: no prior touch → dropped
    ).map { case (id, t, ty, v) =>
      (id, t * 1000000L, if (id <= 4) 1L else 2L, ty, v, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = ExtensionQueries.attributionOf(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 2)
    assert(out(("first_touch", "view")) == ((2L, 70.0)))
    assert(out(("last_touch", "click")) == ((2L, 70.0)))
  }

  test("burstiness: -1 for a metronome, Goh-Barabási value for a bursty user") {
    val events = (Seq(0L, 10L, 20L, 30L).map(t => (1L, t)) ++
      Seq(0L, 1L, 2L, 30L).map(t => (2L, t))).zipWithIndex.map {
      case ((u, t), i) => (i.toLong, t * 1000000L, u, "e", 1.0, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = ExtensionQueries.burstinessOf(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(out(1L) == ((3L, 10.0, 0.0, -1.0)), out.toString) // gaps 10,10,10
    val (n, s, ssq) = (3L, 30L, 1L + 1 + 784)                // gaps 1,1,28
    val mu = s.toDouble / n
    val sd = math.sqrt((n * ssq - s * s).toDouble / (n * n))
    assert(out(2L) == ((3L, mu, sd, (sd - mu) / (sd + mu))))
  }

  test("ab test: exact z from integer moment sums on a hand experiment") {
    // g0 (even users): purchases 1.00, 3.00 → mean 2.00, var 1.00²
    // g1 (odd users):  purchases 1.00, 1.00 → mean 1.00, var 0
    val events = Seq(
      (1L, 2L, "purchase", 1.0), (2L, 2L, "purchase", 3.0),
      (3L, 3L, "purchase", 1.0), (4L, 3L, "purchase", 1.0),
      (5L, 2L, "view", 99.0) // non-purchase ignored
    ).map { case (id, u, ty, v) => (id, id * 1000000L, u, ty, v, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = ExtensionQueries.abTestOf(events).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0)
    // z in cents: (200-100)/sqrt((1e4)/2 + 0) = 100/sqrt(5000)
    assert(r.getDouble(4) == 100.0 / math.sqrt(5000.0), s"z ${r.getDouble(4)}")
  }

  test("seasonality: epoch-arithmetic day-of-week cells and shares") {
    // epoch day 0 = Thursday → dow (0+4)%7 = 4; day 3 = Sunday → 0
    val events = Seq(
      (1L, 0L), (2L, 3600L),              // Thu 00h, Thu 01h
      (3L, 3L * 86400), (4L, 3L * 86400)  // Sun 00h ×2
    ).map { case (id, t) => (id, t * 1000000L, 1L, "e", 2.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = ExtensionQueries.seasonalityOf(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out((4L, 0L)) == ((1L, 0.25)))
    assert(out((4L, 1L)) == ((1L, 0.25)))
    assert(out((0L, 0L)) == ((2L, 0.5)))
  }

  test("split audit: planted cross-split duplicates are counted, clean corpora report none") {
    // doc_ids chosen so the deterministic split hash lands text-dup
    // pairs in different splits; recompute expected from the engine's
    // own split assignment to stay robust to the hash constants
    val docs = (0L until 40L).map(i => (i, s"dup text ${i % 8}", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val full = TextQueries.splitAuditOf(docs).collect()
    // planted dups are exact → the bow tier sees the identical leaks
    val byTier = full.groupBy(_.getString(0))
    assert(byTier.keySet == Set("exact", "bow"))
    assert(byTier("exact").map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet ==
      byTier("bow").map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet)
    val out = byTier("exact")
      .map(r => (r.getString(1), r.getString(2)) -> (r.getLong(3), r.getLong(4))).toMap
    // brute-force: same fingerprint (text) in two splits
    val assign = TextQueries.splitAssign(docs)
      .select(col("doc_id"), col("text"), col("split")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val bySplit = assign.groupBy(_._1).map { case (t, rows) =>
      t -> rows.map(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    }
    val expected = (for {
      (_, splits) <- bySplit.toSeq
      pairs = splits.keys.toSeq.sorted.combinations(2).toSeq
      Seq(a, b) <- pairs
    } yield ((a, b), (1L, splits(a) + splits(b))))
      .groupBy(_._1)
      .map { case (k, vs) => k -> (vs.map(_._2._1).sum, vs.map(_._2._2).sum) }
    assert(expected.nonEmpty, "fixture should plant cross-split dups")
    assert(out == expected, s"got $out expected $expected")
    // a corpus of unique texts has nothing to leak
    val clean = (0L until 20L).map(i => (i, s"unique text $i", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextQueries.splitAuditOf(clean).count() == 0)
  }

  test("ngram novelty: fully-shared and fully-novel val bigrams bound the ratio") {
    val out = TextQueries.ngramNoveltyOf(
      Tables(spark, sfDir, "documents")).head()
    val (nVal, nNovel, pct) = (out.getLong(0), out.getLong(1), out.getDouble(2))
    assert(nVal > 0 && nNovel >= 0 && nNovel <= nVal)
    assert(pct == math.floor(nNovel * 100.0 / nVal * 1e4 + 0.5) / 1e4)
  }

  test("mad anomaly gate: exact median/MAD and a planted outlier") {
    val events = ((1 to 9).map(i => (i.toLong, i * 1000000L, 1L, "t", i.toDouble, "{}"))
      :+ (10L, 10000000L, 1L, "t", 100.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = ExtensionQueries.anomalyMadOf(events).head()
    // values 1..9,100: lower median (rank 5) = 5; devs sorted
    // 0,1,1,2,2,3,3,4,4,95 → MAD (rank 5) = 2; gate 3·1.4826·2 ≈ 8.9
    // flags only the planted 100 (dev 95)
    assert(r.getString(0) == "t" && r.getLong(1) == 10)
    assert(r.getDouble(2) == 5.0 && r.getDouble(3) == 2.0)
    assert(r.getLong(4) == 1 && r.getDouble(5) == 95.0)
  }
}
