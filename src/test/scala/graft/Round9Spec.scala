package graft

import java.sql.Timestamp

import org.apache.spark.sql.{functions => F}
import graft.queries.ExtensionQueries

/** Round-9 additions: the segment-reseeded EWMA closed form past the
  * old day-62 overflow horizon, the Kaplan-Meier terminal-day guard,
  * and negative-sampling draw distinctness. */
class Round9Spec extends SparkSpec {

  private val S = ExtensionQueries.EwmaSegDays

  /** Plain-Scala sequential replay of the reseeded dyadic EWMA
    * contract: within a segment the scaled sum is an exact Long; at
    * each segment boundary the carry re-anchors as
    * carry ← (T' + carry)·2^{−S}. Day-by-day, gaps included. */
  private def contractReplay(daily: Map[Long, Long]): Map[Long, Double] = {
    val maxDay = daily.keys.max
    var carry = daily(0L).toDouble
    var t = 0L
    val out = scala.collection.mutable.Map.empty[Long, Double]
    for (d <- 0L to maxDay) {
      val o = (d % S).toInt
      if (d > 0 && o == 0) { carry = (t.toDouble + carry) * math.pow(2.0, -S); t = 0L }
      val c = daily.getOrElse(d, 0L)
      t += c << o
      if (daily.contains(d)) out(d) = (t.toDouble + carry) / (1L << (o + 1)).toDouble
    }
    out.toMap
  }

  /** Naive per-day double recurrence level ← (c + level)/2 — the
    * textbook EWMA the contract must track to float precision. */
  private def naiveReplay(daily: Map[Long, Long]): Map[Long, Double] = {
    val maxDay = daily.keys.max
    var level = daily(0L).toDouble
    val out = scala.collection.mutable.Map.empty[Long, Double]
    out(0L) = level
    for (d <- 1L to maxDay) {
      level = (daily.getOrElse(d, 0L).toDouble + level) / 2.0
      if (daily.contains(d)) out(d) = level
    }
    out.toMap
  }

  private def finishOn(daily: Map[Long, Long]): Map[Long, (Double, Option[Double])] = {
    val s = spark
    import s.implicits._
    ExtensionQueries.ewmaFinish(daily.toSeq.toDF("day", "c"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
  }

  test("ewmaFinish matches the sequential contract replay past day 62 (gaps, big counts)") {
    // 150 days; gaps every 7th day plus a 15-day dark stretch; counts
    // up to ~50k exercise the scaled-sum width
    val daily = (0L to 149L)
      .filterNot(d => d % 7 == 3 && d > 0)
      .filterNot(d => d >= 100 && d < 115)
      .map(d => d -> ((d * 937 % 50000) + 1))
      .toMap
    val got = finishOn(daily)
    val want = contractReplay(daily)
    val naive = naiveReplay(daily)
    assert(got.keySet === daily.keySet)
    daily.keys.foreach { d =>
      assert(got(d)._1 === want(d), s"contract mismatch at day $d")
      val rel = math.abs(got(d)._1 - naive(d)) / math.max(naive(d), 1e-12)
      assert(rel < 1e-9, s"drifted from true EWMA at day $d: ${got(d)._1} vs ${naive(d)}")
    }
    // day 63+ was the old shiftleft overflow zone — levels there must
    // be positive and bounded by the count range, not wrapped garbage
    daily.keys.filter(_ >= 63).foreach { d =>
      assert(got(d)._1 > 0.0 && got(d)._1 < 50001.0, s"overflowed level at day $d")
    }
  }

  test("ewmaFinish err after a gap uses the decayed previous-day level") {
    val daily = Map(0L -> 100L, 1L -> 80L, 5L -> 40L) // 3-day gap before day 5
    val got = finishOn(daily)
    val want = contractReplay(daily)
    assert(got(5L)._1 === want(5L))
    // level decays by halving across days 2..4, so err_5 = c_5 − level_4
    val level1 = (80.0 + 100.0) / 2
    val level4 = level1 / 8
    assert(got(5L)._2.get === 40.0 - level4)
    assert(got(0L)._2.isEmpty)
  }

  test("ewmaFinish stays finite and contract-exact on a centuries-sparse span") {
    // present days straddle many empty segments, far past the old
    // 2^63 scale horizon AND the naive pow(2, day) overflow horizon
    val daily = Map(0L -> 1000L, 40L -> 900L, 2000L -> 800L, 2500L -> 700L)
    val got = finishOn(daily)
    val want = contractReplay(daily)
    daily.keys.foreach { d =>
      assert(!got(d)._1.isNaN && !got(d)._1.isInfinite, s"non-finite at $d")
      assert(got(d)._1 === want(d), s"contract mismatch at day $d")
    }
    // 1960 empty days fully decay the carry: day 2000 restarts cold
    assert(got(2000L)._1 === 400.0)
  }

  test("survivalKm emits surv 0.0 (not NULL) when the last at-risk users all convert") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def r(id: Long, t: String, u: Long, typ: String, v: Double) =
      Row(id, Timestamp.valueOf(t), u, typ, v, "{}")
    // u1 converts day 0, u2 day 1, u3 day 2 = corpus end; nobody is
    // censored, so the day-2 risk set is extinguished (d == n_risk)
    val rows = Seq(
      r(1, "2024-01-01 00:00:00", 1, "click", 0.0),
      r(2, "2024-01-01 06:00:00", 1, "purchase", 200.0),
      r(3, "2024-01-01 00:00:00", 2, "click", 0.0),
      r(4, "2024-01-02 06:00:00", 2, "purchase", 200.0),
      r(5, "2024-01-01 00:00:00", 3, "click", 0.0),
      r(6, "2024-01-03 06:00:00", 3, "purchase", 200.0))
    val events = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = ExtensionQueries.survivalKmOf(events)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(3), x.getDouble(4)))
    assert(got.length === 3)
    // KM: S(0) = 1 − 1/3, S(1) = S(0)·(1 − 1/2), S(2) = 0 exactly
    assert(got(0) === ((0L, 1L, 3L, 0.6667)))
    assert(got(1) === ((1L, 1L, 2L, 0.3333)))
    assert(got(2)._4 === 0.0)
    assert(got(2)._3 === 1L)
  }

  test("q_gini_concentration matches a driver-side sorted-rank replay") {
    import org.apache.spark.sql.{functions => F}
    val rev = Tables(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("c"))
      .collect().map(_.getLong(1)).sorted
    val n = rev.length.toLong
    val total = rev.map(BigInt(_)).sum
    val s1 = rev.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = 2.0 * s1.toDouble / (n.toDouble * total.toDouble) - (n + 1.0) / n
    def topShare(k: Long): Double =
      rev.reverse.take(k.toInt).map(BigInt(_)).sum.toDouble / total.toDouble
    val got = ExtensionQueries.giniConcentration(spark, sfDir).head()
    assert(got.getLong(0) === n && got.getLong(1) === total.toLong)
    assert(math.abs(got.getDouble(2) - gini) < 2e-6, s"gini ${got.getDouble(2)} vs $gini")
    assert(math.abs(got.getDouble(3) - topShare((n + 99) / 100)) < 2e-6)
    assert(math.abs(got.getDouble(4) - topShare((n + 9) / 10)) < 2e-6)
    assert(got.getDouble(2) > 0.0 && got.getDouble(2) < 1.0)
    assert(got.getDouble(3) < got.getDouble(4))
  }

  test("q_psi_drift matches a driver-side decile-binned replay") {
    import org.apache.spark.sql.{functions => F}
    val purch = Tables(spark, sfDir, "events")
      .filter(F.col("event_type") === "purchase")
      .select(F.expr("CAST(round(value * 100) AS BIGINT)").as("v"),
        F.unix_micros(F.col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = (purch.map(_._2).min + purch.map(_._2).max) / 2
    val a = purch.filter(_._2 < mid).map(_._1)
    val b = purch.filter(_._2 >= mid).map(_._1)
    // decile bins from A's distinct-value histogram, ties land whole
    val hist = a.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val nA = a.length.toLong
    var cum = 0L
    val binOf = hist.map { case (v, m) =>
      val bin = math.min(10L, cum * 10 / nA + 1).toInt; cum += m; v -> bin
    }
    val lows = binOf.groupBy(_._2).view.mapValues(_.map(_._1).min).toSeq.sortBy(_._1)
    def binFor(v: Long): Int =
      lows.reverse.find { case (_, lo) => v >= lo }.map(_._1).getOrElse(1)
    val cntA = a.groupBy(binFor).view.mapValues(_.length.toLong).toMap
    val cntB = b.groupBy(binFor).view.mapValues(_.length.toLong).toMap
    val want = lows.map(_._1).map { bin =>
      val ca = cntA.getOrElse(bin, 0L); val cb = cntB.getOrElse(bin, 0L)
      val pa = ca.toDouble / a.length
      val pb = math.max(cb, 1L).toDouble / b.length
      (bin, ca, cb, (pb - pa) * math.log(pb / pa))
    }
    val psi = want.map(_._4).sum
    val got = ExtensionQueries.psiDrift(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq === want.map(w => (w._1, w._2, w._3)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) < 2e-6, s"term drift at bin ${g._1}")
      assert(math.abs(g._5 - psi) < 2e-6)
    }
    assert(got.nonEmpty && got.length <= 10)
  }

  test("q_negative_sampling draws are distinct per customer") {
    val got = ExtensionQueries.negativeSampling(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got.distinct.length === got.length,
      "duplicate (custkey, neg_partkey) pair in the picks")
  }

  test("q_cusum_changepoint matches the textbook recursive CUSUM fold") {
    // the query ships the closed form S_t = C_t − min_{j≤t} C_j; the
    // spec replays the recursive definition S_t = max(0, S_{t−1} + w_t)
    // in plain Scala on the same integer z-scores
    val daily = Tables(spark, sfDir, "events")
      .filter(F.col("event_type") === "purchase")
      .groupBy(F.to_date(F.col("ts")).as("day"))
      .agg(F.sum(graft.functions.Det.cents(F.col("value"))).as("x"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0), r.getLong(1)))
    val n = daily.length.toLong
    val sx = daily.map(_._2).sum
    val d = daily.map { case (_, x) => math.abs(n * x - sx) }.sum
    val z6 = daily.map { case (_, x) =>
      val num = n * x - sx
      (if (num < 0) -1L else 1L) * (math.abs(num) * n * 1000000L / d)
    }
    var sp = 0L; var sn = 0L
    val expect = z6.map { z =>
      sp = math.max(0L, sp + (z - 500000L))
      sn = math.max(0L, sn + (-z - 500000L))
      (sp / 1e6, sn / 1e6, if (sp > 4000000L || sn > 4000000L) 1 else 0)
    }
    val got = ExtensionQueries.cusumChangepoint(spark, sfDir).collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getInt(5)))
    assert(got.length === expect.length)
    got.zip(expect).zipWithIndex.foreach { case (((gp, gn, ga), (ep, en, ea)), i) =>
      assert(math.abs(gp - ep) < 1e-6 && math.abs(gn - en) < 1e-6 && ga === ea,
        s"day $i: got ($gp,$gn,$ga) expected ($ep,$en,$ea)")
    }
  }

  test("q_theil_sen matches a plain-Scala pairwise-slope median") {
    val monthly = Tables(spark, sfDir, "orders")
      .groupBy((F.year(F.col("o_orderdate")) * 12 + F.month(F.col("o_orderdate"))).as("mx"))
      .agg(F.sum(graft.functions.Det.cents(F.col("o_totalprice"))).as("y"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- monthly.indices; j <- monthly.indices if i < j
      dy = monthly(j)._2 - monthly(i)._2
      dx = (monthly(j)._1 - monthly(i)._1).toLong
    } yield (if (dy < 0) -1L else 1L) * (math.abs(dy) * 1000000L / dx)).sorted
    val np = slopes.length
    val medS = (slopes((np + 1) / 2 - 1) + slopes((np + 2) / 2 - 1)) / 2.0
    val i6 = monthly.map { case (mx, y) => y * 1000000L - medS.toLong * mx }.sorted
    val nm = i6.length
    val medI = (i6((nm + 1) / 2 - 1) + i6((nm + 2) / 2 - 1)) / 2.0
    val row = ExtensionQueries.theilSen(spark, sfDir).head()
    assert(row.getLong(0) === nm.toLong)
    assert(row.getLong(1) === np.toLong)
    assert(math.abs(row.getDouble(2) - medS / 1e6 / 100.0) < 1e-6)
    assert(math.abs(row.getDouble(3) - medI / 1e6 / 100.0) < 1e-6)
  }

  test("q_ref_integrity finds a clean star schema and real unreferenced counts") {
    val got = ExtensionQueries.refIntegrity(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.size === 6)
    // the synthetic corpus is FK-clean: zero orphans everywhere
    got.foreach { case (e, (_, orph, _, _)) => assert(orph === 0L, s"edge $e") }
    // unreferenced parents cross-checked directly for one edge
    val parts = Tables(spark, sfDir, "part").select("p_partkey")
    val used = Tables(spark, sfDir, "lineitem").select("l_partkey").distinct()
    val unref = parts.join(used, F.col("p_partkey") === F.col("l_partkey"), "left_anti").count()
    assert(got("lineitem.l_partkey->part")._4 === unref)
  }

  test("q_roc_auc matches brute-force pair counting") {
    graft.functions.HashedLogit.register(spark)
    val scored = Tables(spark, sfDir, "documents")
      .select(F.expr("hashed_logit(text)").getItem(0).as("s"),
        (F.col("lang") === "en").cast("int").as("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val pos = scored.filter(_._2 == 1).map(_._1)
    val neg = scored.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val auc = wins / (pos.length.toDouble * neg.length)
    val got = ExtensionQueriesRocAuc()
    assert(math.abs(got("auc") - auc) < 1e-6)
    assert(got("n_pos") === pos.length.toDouble)
    assert(got("n_neg") === neg.length.toDouble)
    assert(math.abs(got("gini") - (2 * auc - 1)) < 1e-5)
  }

  private def ExtensionQueriesRocAuc(): Map[String, Double] =
    graft.queries.TextQueries.rocAuc(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("q_pagerank matches a plain-Scala integer-iteration replay") {
    val edges = graft.queries.SimilarityQueries.knnGraph(spark, sfDir)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = out.keys.toSeq.sorted
    val n = nodes.length.toLong
    val scale = 1000000000000L
    val p0 = scale / n
    var p = nodes.map(_ -> p0).toMap
    for (_ <- 1 to 5) {
      val inflow = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        p(s) / out(s)
      }.sum).toMap
      p = nodes.map(v => v -> (15L * p0 + 85L * inflow.getOrElse(v, 0L)) / 100L).toMap
    }
    val got = graft.queries.SimilarityQueries.pageRank(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === p.keySet)
    // exact integer arithmetic end-to-end: bit equality, not tolerance
    p.foreach { case (v, e) => assert(got(v) === e, s"node $v") }
    // mass conservation sanity: the only loss is truncation leak —
    // ≲ (out-div + teleport-div) per node per iteration, plus the p0 floor
    val total = p.values.sum
    assert(total <= scale && total > scale - n * 1100, s"mass $total vs $scale")
  }

  test("round-9 queries are repartition-invariant") {
    import graft.queries.TextQueries
    val ev9 = Tables(spark, sfDir, "events").repartition(9)
    assert(ExtensionQueries.cusumChangepointOf(ev9).collect().toSeq ===
      ExtensionQueries.cusumChangepoint(spark, sfDir).collect().toSeq)
    val ord7 = Tables(spark, sfDir, "orders").repartition(7)
    assert(ExtensionQueries.theilSenOf(ord7).collect().toSeq ===
      ExtensionQueries.theilSen(spark, sfDir).collect().toSeq)
    val docs5 = Tables(spark, sfDir, "documents").repartition(5)
    assert(TextQueries.rocAucOf(docs5).collect().toSeq ===
      TextQueries.rocAuc(spark, sfDir).collect().toSeq)
    val pur6 = Tables(spark, sfDir, "events").repartition(6)
    assert(ExtensionQueries.psiDriftOf(pur6).collect().toSeq ===
      ExtensionQueries.psiDrift(spark, sfDir).collect().toSeq)
  }

  test("k-NN edge scratch is written once and shared across graph queries") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    // first consumer pays the write
    graft.queries.SimilarityQueries.pageRank(spark, sfDir).count()
    val dirGlob = Files.list(Paths.get(graft.Tables.scratchDir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("knnedges-")).toSeq
    assert(dirGlob.nonEmpty, "scratch edges parquet missing after pageRank")
    def mtimes(): Map[String, Long] = dirGlob.flatMap { d =>
      Files.walk(d).iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
    }.toMap
    val before = mtimes()
    // later consumers in the same session must NOT rewrite
    graft.queries.SimilarityQueries.labelProp(spark, sfDir).count()
    graft.queries.SimilarityQueries.linkPredict(spark, sfDir).count()
    graft.queries.SimilarityQueries.semanticClusters(spark, sfDir).count()
    graft.queries.SimilarityQueries.pageRank(spark, sfDir).count()
    assert(mtimes() === before, "a shared-scratch consumer rewrote the edge relation")
  }

  test("q_ann_pq matches a plain-Scala PQ encode + ADC replay") {
    val emb = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val seeds = emb.filter(_._1 < 16).map(_._2) // codebook: c-th embedding
    def subDist(a: Array[Double], b: Array[Double], m: Int): Double =
      (8 * m until 8 * m + 8).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val codes: Map[Long, Array[Int]] = emb.map { case (v, vec) =>
      v -> Array.tabulate(8) { m =>
        (0 until 16).map(c => (subDist(vec, seeds(c), m), c)).min._2
      }
    }.toMap
    val expect = (0L until 2L).flatMap { qid =>
      val q = emb.find(_._1 == qid).get._2
      val tab = Array.tabulate(8, 16)((m, c) => subDist(q, seeds(c), m))
      emb.filter(_._1 != qid).map { case (cid, _) =>
        (qid, cid, codes(cid).zipWithIndex.map { case (c, m) => tab(m)(c) }.sum)
      }.sortBy { case (_, cid, d) => (d, cid) }.take(10).zipWithIndex
        .map { case ((q2, cid, d), i) => (q2, cid, math.rint(d * 1e6) / 1e6, i + 1) }
    }.toSet
    val got = graft.queries.SimilarityQueries.annPq(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got === expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
  }

  test("q_ann_pq_rerank reranks the ADC shortlist by exact cosine") {
    val emb = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val byId = emb.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / math.sqrt(na * nb)
    }
    val got = graft.queries.SimilarityQueries.annPqRerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
    assert(got.nonEmpty && got.length <= 20)
    // exact cosine recomputed per output pair; ranks strictly follow it
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._4)
      sorted.foreach { case (_, cid, c, _) =>
        assert(math.abs(c - math.rint(cos(byId(qid), byId(cid)) * 1e6) / 1e6) < 1e-9)
      }
      assert(sorted.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"cos not non-increasing for qid $qid")
    }
  }

  test("q_link_predict matches a plain-Scala common-neighbor replay") {
    val edges = graft.queries.SimilarityQueries.knnGraph(spark, sfDir)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val indeg = edges.groupBy(_._2).view.mapValues(_.length).toMap
    val mids = edges.filter { case (_, w) => indeg(w) <= 64 }
    val byMid = mids.groupBy(_._2)
    val common = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byMid.values.foreach { es =>
      val srcs = es.map(_._1).sorted
      for (i <- srcs.indices; j <- (i + 1) until srcs.length)
        common((srcs(i), srcs(j))) = common.getOrElse((srcs(i), srcs(j)), 0L) + 1
    }
    val adj = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cands = common.toSeq.filterNot { case (p, _) => adj(p) }
    val sym = cands.flatMap { case ((u, v), c) => Seq((u, v, c), (v, u, c)) }
    val expect = sym.groupBy(_._1).flatMap { case (u, rows) =>
      rows.sortBy { case (_, v, c) => (-c, v) }.take(3).zipWithIndex
        .map { case ((_, v, c), i) => (u, v, c, i + 1) }
    }.toSet
    val got = graft.queries.SimilarityQueries.linkPredict(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4))).toSet
    assert(got === expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
    // spot-check the jaccard fence on one row
    val row = graft.queries.SimilarityQueries.linkPredict(spark, sfDir).head()
    val jac = row.getLong(2).toDouble /
      (outdeg(row.getLong(0)) + outdeg(row.getLong(1)) - row.getLong(2))
    assert(math.abs(row.getDouble(3) - (math.rint(jac * 1e6) / 1e6)) < 1e-9)
  }

  test("q_label_prop matches a plain-Scala frozen-frontier majority-vote replay") {
    val edges = graft.queries.SimilarityQueries.knnGraph(spark, sfDir)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    var lab: Map[Long, Option[Int]] = truth.map { case (v, l) =>
      v -> (if (v % 5 == 0) None else Some(l))
    }
    val inEdges = edges.groupBy(_._2)
    for (_ <- 1 to 3) {
      val next = lab.map { case (v, cur) =>
        v -> cur.orElse {
          val votes = inEdges.getOrElse(v, Array.empty)
            .flatMap { case (s, _) => lab.get(s).flatten }
          if (votes.isEmpty) None
          else Some(votes.groupBy(identity).view.mapValues(_.length).toSeq
            .maxBy { case (l, c) => (c, -l) }._1)
        }
      }
      lab = next
    }
    val got = graft.queries.SimilarityQueries.labelProp(spark, sfDir).collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Int]))).toMap
    val hidden = truth.keys.filter(_ % 5 == 0).toSet
    assert(got.keySet === hidden)
    hidden.foreach { v => assert(got(v) === lab(v), s"node $v") }
  }
}
