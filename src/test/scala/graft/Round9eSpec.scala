package graft

import java.sql.Timestamp

import graft.queries.AnalyticsQueries

/** Round-9e additions: t-closeness disclosure audit, Chapman
  * capture–recapture population estimation, and delete-one-group
  * jackknife variance of a ratio estimator. */
class Round9eSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tCloseness: single-priority classes reach TVD 1/2 against a uniform global") {
    val s = spark; import s.implicits._
    // two customers, each a singleton class (different nations), each
    // ordering ONLY its own priority; global is 50/50.
    val customer = Seq(
      (1L, "a", 1, 100.0, "SEG"),
      (2L, "b", 2, 100.0, "SEG")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, "1-URGENT"), (11L, 1L, "1-URGENT"),
      (12L, 2L, "2-HIGH"), (13L, 2L, "2-HIGH")
    ).map { case (ok, ck, pr) => (ok, ck, "O", 1.0, ts("1996-01-01 00:00:00"), pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = AnalyticsQueries.tClosenessOf(customer, orders).collect()(0)
    // per class: num = |2·4−2·2| + |0·4−2·2| = 8; t = 8/(2·2·4) = 0.5
    assert(r.getAs[Long]("n_classes") === 2L)
    assert(r.getAs[Double]("max_t") === 0.5)
    assert(r.getAs[Long]("classes_gt_025") === 2L)
    assert(r.getAs[Double]("share_gt_025") === 1.0)
  }

  test("tCloseness: class matching the global distribution scores t = 0") {
    val s = spark; import s.implicits._
    val customer = Seq(
      (1L, "a", 1, 100.0, "SEG")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, "1-URGENT"), (11L, 1L, "2-HIGH")
    ).map { case (ok, ck, pr) => (ok, ck, "O", 1.0, ts("1996-01-01 00:00:00"), pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = AnalyticsQueries.tClosenessOf(customer, orders).collect()(0)
    assert(r.getAs[Double]("max_t") === 0.0)
    assert(r.getAs[Long]("classes_gt_025") === 0L)
  }

  test("captureRecapture: Chapman estimator and SE from planted occupancy") {
    val s = spark; import s.implicits._
    // window A = [t0, t0+2h), window B = [t0+2h, t0+4h)
    // users 1,2,3 in A; users 3,4,5 in B; user 6 only later.
    val base = "2024-01-01 "
    val rows = Seq(
      (1L, 1L, base + "00:00:00"), (2L, 2L, base + "00:30:00"),
      (3L, 3L, base + "01:00:00"), (4L, 3L, base + "02:30:00"),
      (5L, 4L, base + "03:00:00"), (6L, 5L, base + "03:30:00"),
      (7L, 6L, base + "09:00:00"))
    val events = rows.map { case (id, u, t) => (id, ts(t), u, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = AnalyticsQueries.captureRecaptureOf(events).collect()(0)
    assert(r.getAs[Long]("n1") === 3L)
    assert(r.getAs[Long]("n2") === 3L)
    assert(r.getAs[Long]("m") === 1L)
    assert(r.getAs[Long]("n_users") === 6L)
    // (3+1)(3+1)/(1+1) − 1 = 7; se = sqrt(4·4·2·2/(2²·3)) = sqrt(64/12)
    assert(r.getAs[Double]("chapman_n") === 7.0)
    assert(math.abs(r.getAs[Double]("chapman_se") - math.sqrt(64.0 / 12.0)) < 1e-4)
  }

  private def ordersOf(rows: Seq[(Long, Long, Double, String, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (ok, ck, tp, d, pr) => (ok, ck, "O", tp, ts(d + " 00:00:00"), pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
  }

  test("permutationTest: zero observed difference is never beaten, p = 1") {
    // every pair's 1996 and 1997 spend are equal → d = 0 for all pairs:
    // T_obs = 0 and every replicate T_r = 0, so all 256 are "as extreme".
    val orders = ordersOf(Seq(
      (1L, 1L, 100.0, "1996-03-01", "P"), (2L, 1L, 100.0, "1997-03-01", "P"),
      (3L, 2L, 50.0, "1996-05-01", "P"), (4L, 2L, 50.0, "1997-05-01", "P"),
      (5L, 3L, 70.0, "1995-01-01", "P"))) // outside years → not a pair
    val r = AnalyticsQueries.permutationTestOf(orders).collect()(0)
    assert(r.getAs[Long]("n_pairs") === 2L)
    assert(r.getAs[Double]("t_obs_dollars") === 0.0)
    assert(r.getAs[Long]("n_extreme") === 256L)
    assert(r.getAs[Double]("p_value") === 1.0)
  }

  test("permutationTest: single pair is extreme in every replicate (|±d| = |d|)") {
    val orders = ordersOf(Seq(
      (1L, 1L, 100.0, "1996-03-01", "P"), (2L, 1L, 160.0, "1997-03-01", "P")))
    val r = AnalyticsQueries.permutationTestOf(orders).collect()(0)
    assert(r.getAs[Long]("n_pairs") === 1L)
    assert(r.getAs[Double]("t_obs_dollars") === 60.0)
    assert(r.getAs[Long]("n_extreme") === 256L) // sign flip keeps |T|
  }

  test("brownForsythe: hand-computed F over two groups") {
    val s = spark; import s.implicits._
    val customer = Seq(
      (1L, "a", 1, 0.0, "G1"), (2L, "b", 1, 0.0, "G2")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    // G1 values: 1,2,3 (median 2 → z2 = 2,0,2); G2: 10,30 (median 20 → z2 = 20,20)
    val orders = ordersOf(Seq(
      (1L, 1L, 0.01, "1996-01-01", "P"), (2L, 1L, 0.02, "1996-01-02", "P"),
      (3L, 1L, 0.03, "1996-01-03", "P"),
      (4L, 2L, 0.10, "1996-01-04", "P"), (5L, 2L, 0.30, "1996-01-05", "P")))
    val r = AnalyticsQueries.brownForsytheOf(customer, orders).collect()(0)
    // half-cent z: G1 = {2,0,2} (S=4, SS=8), G2 = {20,20} (S=40, SS=800)
    // SSB = Σs²/n − S²/N = 16/3 + 1600/2 − 44²/5 = 805.333… − 387.2 = 418.1333…
    // SSW = 808 − 805.3333… = 2.6666…; F = (SSB/1)/(SSW/3) = 418.1333/0.8888…
    val exp = (16.0 / 3 + 800.0 - 44.0 * 44 / 5) / ((808.0 - 16.0 / 3 - 800.0) / 3)
    assert(math.abs(r.getAs[Double]("f_bf") - exp) < 1e-3)
    assert(r.getAs[Long]("k") === 2L)
    assert(r.getAs[Long]("n") === 5L)
  }

  test("friedmanTest: perfectly consistent ranking gives maximal chi2 (W = 1)") {
    // 2 complete months, 5 priorities, same revenue order both months.
    val rows = for {
      (mon, base) <- Seq(("1996-01", 10.0), ("1996-02", 20.0))
      (pr, i) <- Seq("1-U", "2-H", "3-M", "4-L", "5-N").zipWithIndex
    } yield (mon.hashCode.toLong * 100 + i, i.toLong + 1,
      base + i * 10.0, s"$mon-05", pr)
    val orders = ordersOf(rows)
    val r = AnalyticsQueries.friedmanTestOf(orders).collect()(0)
    assert(r.getAs[Long]("b_blocks") === 2L)
    // max chi2 = b(k−1) = 8; W = 1
    assert(r.getAs[Double]("chi2_f") === 8.0)
    assert(r.getAs[Double]("kendall_w") === 1.0)
  }

  private def eventsOf(rows: Seq[(Long, Long, String, String, Double)]) = {
    val s = spark; import s.implicits._
    rows.map { case (id, u, t, ty, v) => (id, ts(t), u, ty, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("matrixProfile: planted repeat is the motif, planted spike week the discord") {
    // 21 days: pattern days 0-6, anomaly day 7 (=100), pattern again days 14-20
    val vals = (1 to 7) ++ (Seq(100) ++ Seq.fill(6)(1)) ++ (1 to 7)
    val events = eventsOf(vals.zipWithIndex.map { case (v, day) =>
      (day.toLong, 1L, f"2024-01-${day + 1}%02d 12:00:00", "click", v.toDouble)
    })
    val rows = graft.queries.AnalyticsQueries.matrixProfileOf(events)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (ma, mb, md) = rows("motif")
    assert((ma, mb) === (0L, 14L) && md === 0.0)
    val (da, _, dd) = rows("discord")
    assert(da >= 1L && da <= 7L) // a window containing the spike day
    assert(dd >= 99.0)           // at least the 100-vs-1 term
  }

  test("granger: lag-causal series scores high F in the causal direction only") {
    // y_t follows x_{t−1}; x is unpredictable from y's past
    val x = Seq(3, 9, 2, 8, 1, 7, 4, 9, 1, 6, 2, 9, 3, 7, 1)
    val y = Seq(5, 4, 10, 3, 9, 2, 8, 5, 10, 2, 7, 3, 10, 4, 8)
      .zipWithIndex.map { case (_, i) => if (i == 0) 5 else x(i - 1) + (i % 3) }
    var id = 0L
    val rows = for {
      day <- x.indices
      (ty, n) <- Seq(("click", x(day)), ("purchase", y(day)))
      _ <- 1 to n
    } yield { id += 1; (id, 1L, f"2024-02-${day + 1}%02d 08:00:00", ty, 1.0) }
    val got = graft.queries.AnalyticsQueries.grangerCausalityOf(eventsOf(rows))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // replay the restricted/unrestricted OLS in plain Scala
    def replay(dep: Seq[Int], ownLag: Seq[Int], crossLag: Seq[Int]): Double = {
      val n = dep.size.toDouble
      def m(a: Seq[Int], b: Seq[Int]) =
        n * a.zip(b).map { case (p, q) => p.toDouble * q }.sum - a.sum.toDouble * b.sum
      val det = m(ownLag, ownLag) * m(crossLag, crossLag) - math.pow(m(ownLag, crossLag), 2)
      val b1 = (m(dep, ownLag) * m(crossLag, crossLag) - m(dep, crossLag) * m(ownLag, crossLag)) / det
      val b2 = (m(dep, crossLag) * m(ownLag, ownLag) - m(dep, ownLag) * m(ownLag, crossLag)) / det
      val ru = m(dep, dep) - b1 * m(dep, ownLag) - b2 * m(dep, crossLag)
      val rr = m(dep, dep) - math.pow(m(dep, ownLag), 2) / m(ownLag, ownLag)
      (rr - ru) * (n - 3) / ru
    }
    val yt = y.drop(1); val y1 = y.dropRight(1)
    val xt = x.drop(1); val x1 = x.dropRight(1)
    assert(math.abs(got("click->purchase") - replay(yt, y1, x1)) < 1e-3)
    assert(math.abs(got("purchase->click") - replay(xt, x1, y1)) < 1e-3)
    assert(got("click->purchase") > 10.0 * math.max(got("purchase->click"), 0.1))
  }

  test("dbscan: cores, border attachment, and noise on a planted graph") {
    val s = spark; import s.implicits._
    // clique A {1,2,3,4} + border 5; clique B {8,9,10,11};
    // pair {6,7} too sparse; sub-eps edge 2-8 must not bridge A and B
    val cliqueA = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b, 0.9)
    val cliqueB = for (a <- 8L to 11L; b <- a + 1 to 11L) yield (a, b, 0.9)
    val edges = (cliqueA ++ cliqueB ++ Seq((4L, 5L, 0.9), (6L, 7L, 0.9),
      (2L, 8L, 0.1))).toDF("src", "dst", "cos")
    val got = graft.queries.SimilarityQueries.dbscanOnEdges(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((-1L, 0L, 2L), (1L, 4L, 1L), (8L, 4L, 0L)))
  }

  test("sceneCuts: planted byte jump fires exactly one cut") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a" * 64 + "z" * 32, "en", "web", 96L), // frames a,a,z → one cut
      (2L, "b" * 32, "en", "web", 32L),            // single frame → excluded
      (3L, "c" * 10, "en", "web", 10L)             // sub-frame → excluded
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.MultimodalQueries.sceneCuts _
    val rows = {
      // call the Tables-free core by writing a temp parquet layout is
      // overkill — reuse the public entry via a temp dir
      val dir = java.nio.file.Files.createTempDirectory("scenecuts").toString
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      got(spark, dir).collect()
    }
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getLong(0) === 1L)
    assert(r.getAs[Long]("n_frames") === 3L)
    assert(r.getAs[Long]("n_cuts") === 1L)
    // bins jump from 8·'a'=776 to 8·'z'=976 in all 4 bins → L1 = 800
    assert(r.getAs[Long]("max_jump") === 800L)
    assert(r.getAs[Double]("avg_scene_len") === 1.5)
  }

  test("haarEnergy: 4-day planted series decomposes exactly") {
    // cents [1,1,3,3]: level1 details 0,0; level2 detail −4 (energy 16);
    // approx 8 (energy 64); total 80
    val events = eventsOf((0 until 4).map { day =>
      (day.toLong, 1L, f"2024-03-${day + 1}%02d 12:00:00", "click",
        if (day < 2) 0.01 else 0.03)
    })
    val rows = graft.queries.AnalyticsQueries.haarEnergyOf(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      (0L, 1L, 0.0064, 0.8), (1L, 2L, 0.0, 0.0), (2L, 1L, 0.0016, 0.2)))
  }

  test("hurstExponent: strictly alternating series has R/S = 1 at every scale → H = 0") {
    val base = ts("2024-04-01 00:00:00").getTime
    val events = eventsOf((0 until 128).flatMap { k =>
      val t = new java.sql.Timestamp(base + (2L * k + 1) * 3600000L)
      Seq((2L * k, 1L, t.toString.stripSuffix(".0"), "click", 1.0),
        (2L * k + 1, 1L, t.toString.stripSuffix(".0"), "click", 1.0))
    })
    val r = graft.queries.AnalyticsQueries.hurstExponentOf(events).collect()(0)
    assert(r.getAs[Long]("n_sizes") === 4L)
    assert(r.getAs[Double]("hurst_h") === 0.0)
    assert(r.getAs[Double]("intercept") === 0.0)
  }

  test("forecastBacktest: linear-ramp series scores the hand-computed MAE/MASE") {
    // 22 days, x_i = i dollars: naive error $1/day, snaive $7/day,
    // train window is the single day i=7 → tae = 700 cents
    val events = eventsOf((0 until 22).map { day =>
      (day.toLong, 1L, f"2024-05-${day + 1}%02d 12:00:00", "purchase", day.toDouble)
    })
    val got = graft.queries.AnalyticsQueries.forecastBacktestOf(events).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("naive").getAs[Long]("n_test") === 14L)
    assert(got("naive").getAs[Double]("mae") === 1.0)
    assert(got("snaive").getAs[Double]("mae") === 7.0)
    assert(math.abs(got("naive").getAs[Double]("mase") - 1400.0 / (14 * 700)) < 1e-4)
    assert(got("snaive").getAs[Double]("mase") === 1.0)
    val smapeNaive = (8 to 21).map(i => 2.0 / (2 * i - 1)).sum / 14
    assert(math.abs(got("naive").getAs[Double]("smape") - smapeNaive) < 1e-5)
  }

  test("markovAttribution: DAG chain matches the hand-solved removal effects") {
    // u1: click→purchase; u2: view→(end); u3: click→view→purchase;
    // u4: signup→(end). Hand-solved: P(conv)=1/2; removing click →
    // 1/8 (effect .75); view → 1/4 (effect .5); signup/error → no change.
    val events = eventsOf(Seq(
      (1L, 1L, "2024-06-01 10:00:00", "click", 1.0),
      (2L, 1L, "2024-06-01 10:01:00", "purchase", 1.0),
      (3L, 2L, "2024-06-01 10:00:00", "view", 1.0),
      (4L, 3L, "2024-06-01 10:00:00", "click", 1.0),
      (5L, 3L, "2024-06-01 10:01:00", "view", 1.0),
      (6L, 3L, "2024-06-01 10:02:00", "purchase", 1.0),
      (7L, 4L, "2024-06-01 10:00:00", "signup", 1.0)))
    val got = graft.queries.AnalyticsQueries.markovAttributionOf(events).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("click", 0.5, 0.125, 0.75, 0.6),
      ("error", 0.5, 0.5, 0.0, 0.0),
      ("signup", 0.5, 0.5, 0.0, 0.0),
      ("view", 0.5, 0.25, 0.5, 0.4)))
  }

  test("ccfLagScan: planted 2-day lead is the best lag with corr 1") {
    val x = Seq(3, 9, 2, 8, 1, 7, 4, 9, 1, 6, 2, 9, 3, 7, 1)
    var id = 0L
    val rows = for {
      day <- x.indices
      (ty, n) <- Seq(("click", x(day)),
        ("purchase", if (day >= 2) x(day - 2) else 5))
      _ <- 1 to n
    } yield { id += 1; (id, 1L, f"2024-07-${day + 1}%02d 08:00:00", ty, 1.0) }
    val got = graft.queries.AnalyticsQueries.ccfLagScanOf(eventsOf(rows))
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(got.length === 15)
    val best = got.filter(_._3)
    assert(best.toSeq === Seq((2L, 1.0, true)))
  }

  test("richClub: K5 with pendant leaves has phi 1 at tier 2") {
    val s = spark; import s.implicits._
    val k5 = for (a <- 1L to 5L; b <- a + 1 to 5L) yield (a, b, 0.9)
    val leaves = Seq((1L, 6L, 0.9), (1L, 7L, 0.9), (1L, 8L, 0.9))
    val edges = (k5 ++ leaves).toDF("src", "dst", "cos")
    val got = graft.queries.SimilarityQueries.richClubOnEdges(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (2L, 5L, 10L, 1.0), (4L, 1L, 0L, 0.0), (6L, 1L, 0L, 0.0), (8L, 0L, 0L, 0.0)))
  }

  test("mmdPoly: identical halves give zero, disjoint axes the closed form 48") {
    val s = spark; import s.implicits._
    val same = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 0f), 0),
      (2L, Array(0f, 1f), 0), (3L, Array(0f, 1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r0 = graft.queries.SimilarityQueries.mmdPolyOf(same).collect()(0)
    assert(r0.getAs[Double]("mmd2") === 0.0)
    // A = {[2,0],[2,0]}, B = {[0,2],[0,2]}: K_AA = K_BB = 25, K_AB = 1
    val split = Seq(
      (0L, Array(2f, 0f), 0), (2L, Array(2f, 0f), 0),
      (1L, Array(0f, 2f), 0), (3L, Array(0f, 2f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r1 = graft.queries.SimilarityQueries.mmdPolyOf(split).collect()(0)
    assert(r1.getAs[Double]("k_aa") === 25.0)
    assert(r1.getAs[Double]("k_ab") === 1.0)
    assert(r1.getAs[Double]("mmd2") === 48.0)
  }

  test("tableChecksum: digest is row-order independent and flags a one-cent edit") {
    val mk = (rows: Seq[(Long, Long, Double)]) => ordersOf(
      rows.map { case (ok, ck, tp) => (ok, ck, tp, "1996-01-01", "P") })
    val a = graft.queries.AnalyticsQueries.tableChecksumOf(
      mk(Seq((1L, 1L, 10.0), (2L, 2L, 20.0), (3L, 3L, 30.0)))).collect()
    val b = graft.queries.AnalyticsQueries.tableChecksumOf(
      mk(Seq((3L, 3L, 30.0), (1L, 1L, 10.0), (2L, 2L, 20.0)))).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === b.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    assert(a.map(_.getString(0)).toSeq === Seq("1996", "ALL"))
    val c = graft.queries.AnalyticsQueries.tableChecksumOf(
      mk(Seq((1L, 1L, 10.01), (2L, 2L, 20.0), (3L, 3L, 30.0)))).collect()
    assert(a(1).getLong(2) !== c(1).getLong(2)) // one cent flips the digest
  }

  test("ktruss: K4 survives, the lone triangle and pendant edge peel in round 1") {
    val s = spark; import s.implicits._
    val k4 = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b, 0.9)
    val tri = Seq((5L, 6L, 0.9), (5L, 7L, 0.9), (6L, 7L, 0.9))
    val edges = (k4 ++ tri ++ Seq((7L, 8L, 0.9))).toDF("src", "dst", "cos")
    val got = graft.queries.SimilarityQueries.ktrussOnEdges(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === ((0L, 8L, 10L) +: (1L to 5L).map(r => (r, 4L, 6L))))
  }

  test("kdeGrid: two-point fixture matches the closed-form edge density") {
    val orders = ordersOf(Seq(
      (1L, 1L, 10.0, "1996-01-01", "P"), (2L, 2L, 30.0, "1996-01-02", "P")))
    val got = graft.queries.AnalyticsQueries.kdeGridOf(orders).collect()
    assert(got.length === 21)
    val d0 = got(0).getAs[Double]("density_per_dollar")
    // x = mn contributes exp(0) = 1, the far point ~exp(−200) ≈ 0:
    // density = 1/(2·100·√2π)·100 per dollar
    assert(math.abs(d0 - 100.0 / (2 * 100 * math.sqrt(2 * math.Pi))) < 1e-6)
    assert(got(0).getAs[Double]("x_dollars") === 10.0)
    assert(got(20).getAs[Double]("x_dollars") === 30.0)
    assert(got(10).getAs[Double]("density_per_dollar") === 0.0) // exp(−50)
  }

  test("logrank: one-sided conversion split matches the hand-computed chi2") {
    // g0 users (2,4) convert day 1; g1 users (1,3) censor at day 5
    val events = eventsOf(Seq(
      (1L, 1L, "2024-08-01 00:00:00", "click", 1.0),
      (2L, 1L, "2024-08-06 00:00:00", "click", 1.0),
      (3L, 3L, "2024-08-01 00:00:00", "click", 1.0),
      (4L, 2L, "2024-08-01 00:00:00", "click", 1.0),
      (5L, 2L, "2024-08-02 00:00:00", "purchase", 200.0),
      (6L, 4L, "2024-08-01 00:00:00", "click", 1.0),
      (7L, 4L, "2024-08-02 00:00:00", "purchase", 200.0)))
    val r = graft.queries.ExtensionQueries.logrankTestOf(events).collect()(0)
    assert(r.getAs[Long]("o0") === 2L)
    assert(r.getAs[Long]("o1") === 0L)
    assert(r.getAs[Double]("e1") === 1.0)
    assert(r.getAs[Double]("chi2") === 3.0)
    assert(math.abs(r.getAs[Double]("z") + math.sqrt(3.0)) < 1e-4)
  }

  test("geometricMedian: outlier pulls the mean but barely moves the median") {
    val s = spark; import s.implicits._
    val emb = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(0f, 0f), 0), (3L, Array(9f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = graft.queries.SimilarityQueries.geometricMedianOf(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // Weiszfeld from mean 3.0: → 1.8 → 1.0 → 1.125/2.125
    assert(got.toSeq === Seq((0L, 0.529412, 3.0), (1L, 0.0, 0.0)))
  }

  test("bradleyTerry: dominant item earns the top strength, order follows wins") {
    // 2 complete months; priority order by revenue identical both months
    val rows = for {
      (mon, base) <- Seq(("1996-01", 10.0), ("1996-02", 20.0))
      (pr, i) <- Seq("1-U", "2-H", "3-M", "4-L", "5-N").zipWithIndex
    } yield (mon.hashCode.toLong * 100 + i, i.toLong + 1,
      base + (4 - i) * 10.0, s"$mon-05", pr)
    val got = graft.queries.AnalyticsQueries.bradleyTerryOf(ordersOf(rows))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // wins: 1-U beats all (8), 2-H (6), 3-M (4), 4-L (2), 5-N (0); 8 games each
    assert(got.toSeq === Seq(("1-U", 8L, 8L), ("2-H", 6L, 8L),
      ("3-M", 4L, 8L), ("4-L", 2L, 8L), ("5-N", 0L, 8L)))
    val s = graft.queries.AnalyticsQueries.bradleyTerryOf(ordersOf(rows))
      .collect().map(_.getAs[Double]("bt_strength"))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b }) // monotone strengths
    assert(s.last === 0.0) // never-winning item collapses to zero strength
  }

  test("cronbachAlpha: perfectly parallel items give alpha 1") {
    // four items identical per day → Σvar_i = 4v, var_tot = 16v →
    // α = 4/3·(1 − 4v/16v) = 1
    val rows = (0 until 6).flatMap { day =>
      val n = 2 + day % 3
      Seq("click", "view", "signup", "error").zipWithIndex.flatMap { case (ty, t) =>
        (0 until n).map(e =>
          ((day * 40 + t * 10 + e).toLong, 1L,
            f"2024-09-${day + 1}%02d 08:00:00", ty, 1.0))
      }
    }
    val r = graft.queries.AnalyticsQueries.cronbachAlphaOf(eventsOf(rows)).collect()(0)
    assert(r.getAs[Long]("n_days") === 6L)
    assert(r.getAs[Double]("alpha") === 1.0)
  }

  test("fdDiscovery: planted violations land in the right candidates") {
    val s = spark; import s.implicits._
    val customer = Seq(
      (1L, "a", 1, 0.0, "SEG_A"), (2L, "b", 1, 0.0, "SEG_B"),
      (3L, "c", 2, 0.0, "SEG_A")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = ordersOf(Seq(
      (10L, 1L, 1.0, "1996-01-01", "P_HI"), (11L, 1L, 1.0, "1996-01-01", "P_LO"),
      (12L, 2L, 1.0, "1996-01-01", "P_HI")))
    val part = Seq(
      (1L, "p1", "B1", "T1", 1, 1.0), (2L, "p2", "B1", "T1", 1, 1.0),
      (3L, "p3", "B2", "T1", 1, 1.0)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val got = graft.queries.AnalyticsQueries.fdDiscoveryOf(customer, orders, part)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.toSeq === Seq(
      ("c_custkey->c_mktsegment", 3L, 0L, true),
      ("c_mktsegment->c_nationkey", 2L, 1L, false),
      ("c_nationkey->c_mktsegment", 2L, 1L, false),
      ("o_custkey->o_orderpriority", 2L, 1L, false),
      ("o_orderdate->o_orderstatus", 1L, 0L, true),
      ("o_orderkey->o_orderpriority", 3L, 0L, true),
      ("p_brand->p_type", 2L, 0L, true),
      ("p_type->p_brand", 1L, 1L, false)))
  }

  test("spectralRadius: complete K4 has lambda1 exactly 3") {
    val s = spark; import s.implicits._
    val k4 = (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b, 0.9))
      .toDF("src", "dst", "cos")
    val r = graft.queries.SimilarityQueries.spectralRadiusOnEdges(k4).collect()(0)
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Double]("avg_deg") === 3.0)
    assert(r.getAs[Long]("max_deg") === 3L)
    assert(r.getAs[Double]("lambda1") === 3.0)
  }

  private def lineitemOf(rows: Seq[(Long, Long, Double, Double, Double)]) = {
    val s = spark; import s.implicits._
    rows.map { case (ok, pk, q, ep, disc) =>
      (ok, pk, 1L, 1, q, ep, disc, 0.02, "N", "O", ts("1996-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
  }

  test("priceElasticity: planted constant-elasticity demand recovers epsilon = -2") {
    val s = spark; import s.implicits._
    val part = Seq((1L, "p1", "B1", "T", 1, 1.0), (2L, "p2", "B1", "T", 1, 1.0),
      (3L, "p3", "B1", "T", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    // q = (100/p)²: p=1 → q=10000·? keep small: unit prices 1, 2, 4 →
    // q = 16, 4, 1 (ε = −2); no discount; extendedprice = p·q
    val li = lineitemOf(Seq(
      (1L, 1L, 16.0, 16.0, 0.0), (2L, 2L, 4.0, 8.0, 0.0), (3L, 3L, 1.0, 4.0, 0.0)))
    val r = graft.queries.AnalyticsQueries.priceElasticityOf(li, part).collect()(0)
    assert(r.getString(0) === "B1")
    assert(r.getAs[Long]("n_lines") === 3L)
    assert(r.getAs[Double]("elasticity") === -2.0)
    assert(r.getAs[Double]("r2") === 1.0)
  }

  test("designEffect: homogeneous strata with separated means push DEFF below 1") {
    val s = spark; import s.implicits._
    val customer = Seq(
      (1L, "a", 1, 0.0, "SEG_A"), (2L, "b", 1, 0.0, "SEG_B")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    // SEG_A orders: 10, 12; SEG_B: 100, 102 — tiny within, huge between
    val orders = ordersOf(Seq(
      (1L, 1L, 10.0, "1996-01-01", "P"), (2L, 1L, 12.0, "1996-01-01", "P"),
      (3L, 2L, 100.0, "1996-01-01", "P"), (4L, 2L, 102.0, "1996-01-01", "P")))
    val r = graft.queries.AnalyticsQueries.designEffectOf(customer, orders).collect()(0)
    assert(r.getAs[Long]("n_orders") === 4L)
    assert(r.getAs[Long]("k_strata") === 2L)
    // S²_h = 2 (both strata, dollars² = 20000 cents²); wv/n = 20000 cents²
    // S²_total = (Σq − S²/n)/3 — dominated by the 90-dollar gap
    assert(r.getAs[Double]("s2_within_d2") === 2.0)
    assert(r.getAs[Double]("deff") < 0.01)
  }

  test("transferEntropy: planted y=lag(x) coupling matches a plain-Scala replay") {
    // last day must be active or the event span drops it from the grid
    val x = Seq(1, 0, 0, 1, 1, 0, 1, 0, 0, 1, 1, 0, 1, 1, 0, 1)
    val y = x.indices.map(i => if (i == 0) 0 else x(i - 1))
    var id = 0L
    val rows = for {
      day <- x.indices
      (ty, n) <- Seq(("click", 2 * x(day)), ("purchase", 2 * y(day)))
      _ <- 1 to n
    } yield { id += 1; (id, 1L, f"2024-10-${day + 1}%02d 08:00:00", ty, 1.0) }
    val got = graft.queries.AnalyticsQueries.transferEntropyOf(eventsOf(rows))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    def replay(dep: Seq[Int], own: Seq[Int], cross: Seq[Int]): Double = {
      val t = dep.indices.map(i => (dep(i), own(i), cross(i)))
      val n = t.size.toDouble
      val c3 = t.groupBy(identity).view.mapValues(_.size).toMap
      val cOwCr = t.groupBy(v => (v._2, v._3)).view.mapValues(_.size).toMap
      val cDnOw = t.groupBy(v => (v._1, v._2)).view.mapValues(_.size).toMap
      val cOw = t.groupBy(_._2).view.mapValues(_.size).toMap
      c3.map { case ((dn, ow, cr), c) =>
        c / n * math.log(c.toDouble * cOw(ow)
          / (cOwCr((ow, cr)).toDouble * cDnOw((dn, ow)))) / math.log(2)
      }.sum
    }
    // binarization: day count 2 > mean(=1) → 1; 0 → 0 (exactly x, y)
    val yt = y.drop(1); val y1 = y.dropRight(1); val x1 = x.dropRight(1)
    val xt = x.drop(1)
    assert(math.abs(got("click->purchase") - replay(yt, y1, x1)) < 1e-4)
    assert(math.abs(got("purchase->click") - replay(xt, x1, y1)) < 1e-4)
    assert(got("click->purchase") > 0.3) // deterministic coupling carries bits
  }

  test("sampleEntropy: constant series is perfectly regular (sampen 0)") {
    val events = eventsOf((0 until 6).map { day =>
      (day.toLong, 1L, f"2024-11-${day + 1}%02d 08:00:00", "purchase", 5.0)
    })
    val r = graft.queries.AnalyticsQueries.sampleEntropyOf(events).collect()(0)
    assert(r.getAs[Double]("r_dollars") === 0.0)
    assert(r.getAs[Long]("b_pairs") === 6L) // C(4,2) template pairs
    assert(r.getAs[Long]("a_pairs") === 6L)
    assert(r.getAs[Double]("sampen") === 0.0)
  }

  test("burrowsDelta: identical-style sources score 0, contrasting style 1.7321") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "x x y", "en", "src_a", 5L),
      (2L, "x x y", "en", "src_b", 5L),
      (3L, "y y x", "en", "src_c", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.TextQueries.burrowsDeltaOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("src_a", "src_b", 2L, 0.0),
      ("src_a", "src_c", 2L, 1.7321),
      ("src_b", "src_c", 2L, 1.7321)))
  }

  test("medianPolish: exactly additive matrix leaves zero residual MAD") {
    // v(i,j) = R_i + C_j → col effects = C_j − median(C), residuals ≡ 0
    val cs = Seq("1-U" -> 0.0, "2-H" -> 10.0, "3-M" -> 20.0,
      "4-L" -> 30.0, "5-N" -> 40.0)
    val rows = for {
      (mon, r) <- Seq(("1996-01", 100.0), ("1996-02", 200.0))
      ((pr, c), i) <- cs.zipWithIndex
    } yield ((mon.hashCode.toLong * 10 + i), i.toLong + 1, r + c,
      s"$mon-05", pr)
    val got = graft.queries.AnalyticsQueries.medianPolishOf(ordersOf(rows))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("1-U", -20.0, 0.0), ("2-H", -10.0, 0.0),
      ("3-M", 0.0, 0.0), ("4-L", 10.0, 0.0), ("5-N", 20.0, 0.0)))
  }

  test("tailDependence: comonotone series have both tail coefficients 1") {
    var id = 0L
    val rows = for {
      day <- 1 to 10
      (ty, n) <- Seq(("click", day), ("purchase", 2 * day))
      _ <- 1 to n
    } yield { id += 1; (id, 1L, f"2024-12-$day%02d 08:00:00", ty, 1.0) }
    val r = graft.queries.AnalyticsQueries.tailDependenceOf(eventsOf(rows))
      .collect()(0)
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Long]("ny") === 2L)
    assert(r.getAs[Long]("nxy") === 2L)
    assert(r.getAs[Double]("lambda_upper") === 1.0)
    assert(r.getAs[Double]("lambda_lower") === 1.0)
  }

  test("round-9e queries are repartition-invariant") {
    import graft.queries.{AnalyticsQueries => A, SimilarityQueries => Sim,
      TextQueries => T}
    val ev9 = Tables(spark, sfDir, "events").repartition(9)
    assert(A.matrixProfileOf(ev9).collect().toSeq ===
      A.matrixProfile(spark, sfDir).collect().toSeq)
    assert(A.grangerCausalityOf(ev9).collect().toSeq ===
      A.grangerCausality(spark, sfDir).collect().toSeq)
    assert(A.hurstExponentOf(ev9).collect().toSeq ===
      A.hurstExponent(spark, sfDir).collect().toSeq)
    assert(A.markovAttributionOf(ev9).collect().toSeq ===
      A.markovAttribution(spark, sfDir).collect().toSeq)
    assert(A.captureRecaptureOf(ev9).collect().toSeq ===
      A.captureRecapture(spark, sfDir).collect().toSeq)
    assert(A.transferEntropyOf(ev9).collect().toSeq ===
      A.transferEntropy(spark, sfDir).collect().toSeq)
    assert(A.sampleEntropyOf(ev9).collect().toSeq ===
      A.sampleEntropy(spark, sfDir).collect().toSeq)
    assert(A.tailDependenceOf(ev9).collect().toSeq ===
      A.tailDependence(spark, sfDir).collect().toSeq)
    val ord7 = Tables(spark, sfDir, "orders").repartition(7)
    assert(A.permutationTestOf(ord7).collect().toSeq ===
      A.permutationTest(spark, sfDir).collect().toSeq)
    assert(A.bradleyTerryOf(ord7).collect().toSeq ===
      A.bradleyTerry(spark, sfDir).collect().toSeq)
    assert(A.medianPolishOf(ord7).collect().toSeq ===
      A.medianPolish(spark, sfDir).collect().toSeq)
    assert(A.tableChecksumOf(ord7).collect().toSeq ===
      A.tableChecksum(spark, sfDir).collect().toSeq)
    assert(A.kdeGridOf(ord7).collect().toSeq ===
      A.kdeGrid(spark, sfDir).collect().toSeq)
    val cust3 = Tables(spark, sfDir, "customer").repartition(3)
    assert(A.tClosenessOf(cust3, ord7).collect().toSeq ===
      A.tCloseness(spark, sfDir).collect().toSeq)
    assert(A.jackknifeRatioOf(cust3, ord7).collect().toSeq ===
      A.jackknifeRatio(spark, sfDir).collect().toSeq)
    val docs5 = Tables(spark, sfDir, "documents").repartition(5)
    assert(T.burrowsDeltaOf(docs5).collect().toSeq ===
      T.burrowsDelta(spark, sfDir).collect().toSeq)
    val emb4 = Tables(spark, sfDir, "embeddings").repartition(4)
    assert(Sim.mmdPolyOf(emb4).collect().toSeq ===
      Sim.mmdPoly(spark, sfDir).collect().toSeq)
    assert(Sim.geometricMedianOf(emb4).collect().toSeq ===
      Sim.geometricMedian(spark, sfDir).collect().toSeq)
  }

  test("ransacTrend: consensus line ignores planted wild months") {
    val y = Seq(1000.0, 1100.0, 1200.0, 10000.0, 1400.0,
      1500.0, 1600.0, 10000.0, 1800.0, 1900.0) // line 1000+100k, 2 outliers
    val orders = ordersOf(y.zipWithIndex.map { case (v, k) =>
      ((k + 1).toLong, 1L, v, f"1996-${k + 1}%02d-05", "P")
    })
    val r = graft.queries.AnalyticsQueries.ransacTrendOf(orders).collect()(0)
    assert(r.getAs[Long]("month_i") === 0L)
    assert(r.getAs[Long]("month_j") === 1L)
    assert(r.getAs[Long]("n_inliers") === 8L)
    assert(r.getAs[Double]("slope_dollars") === 100.0)
    assert(r.getAs[Double]("refit_slope_dollars") === 100.0)
  }

  test("distanceCorr: exact linear dependence scores dcor2 = 1") {
    val x = Seq(1, 5, 2, 8, 3, 9, 4, 7)
    var id = 0L
    val rows = for {
      day <- x.indices
      (ty, n) <- Seq(("click", x(day)), ("purchase", 2 * x(day)))
      _ <- 1 to n
    } yield { id += 1; (id, 1L, f"2025-01-${day + 1}%02d 08:00:00", ty, 1.0) }
    val r = graft.queries.AnalyticsQueries.distanceCorrOf(eventsOf(rows))
      .collect()(0)
    assert(r.getAs[Long]("n_days") === 8L)
    assert(r.getAs[Double]("dcor2") === 1.0)
  }

  private def acfReplay(xs: Seq[Double], k: Int): Double = {
    val n = xs.size; val m = xs.sum / n
    val num = (0 until n - k).map(t => (xs(t) - m) * (xs(t + k) - m)).sum
    num / xs.map(v => (v - m) * (v - m)).sum
  }

  test("pacf: Durbin-Levinson levels match a plain-Scala replay; pacf(1) = acf(1)") {
    val v = Seq(3, 7, 1, 9, 2, 8, 4, 6, 3, 9, 1, 7, 5, 8, 2, 9).map(_.toDouble)
    val events = eventsOf(v.zipWithIndex.map { case (x, day) =>
      (day.toLong, 1L, f"2025-02-${day + 1}%02d 08:00:00", "purchase", x)
    })
    val got = graft.queries.AnalyticsQueries.pacfOf(events).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val (r1, r2, r3) = (acfReplay(v, 1), acfReplay(v, 2), acfReplay(v, 3))
    val p2 = (r2 - r1 * r1) / (1 - r1 * r1)
    val p21 = r1 - p2 * r1
    val p3 = (r3 - p21 * r2 - p2 * r1) / (1 - p21 * r1 - p2 * r2)
    assert(math.abs(got(1L)._1 - r1) < 1e-4 && got(1L)._1 === got(1L)._2)
    assert(math.abs(got(2L)._2 - p2) < 1e-4)
    assert(math.abs(got(3L)._2 - p3) < 1e-4)
  }

  test("ljungBox: strongly alternating series rejects white noise") {
    val v = (0 until 16).map(d => if (d % 2 == 0) 2.0 else 10.0)
    val events = eventsOf(v.zipWithIndex.map { case (x, day) =>
      (day.toLong, 1L, f"2025-03-${day + 1}%02d 08:00:00", "purchase", x)
    })
    val r = graft.queries.AnalyticsQueries.ljungBoxOf(events).collect()(0)
    val q = 16 * 18 * (1 to 7).map(k =>
      math.pow(acfReplay(v, k), 2) / (16 - k)).sum
    assert(r.getAs[Long]("n_days") === 16L)
    assert(math.abs(r.getAs[Double]("q_stat") - q) < 1e-3)
    assert(r.getAs[Boolean]("reject_white_noise"))
  }

  test("gevReturn: identical weekly maxima collapse both return levels to the mean") {
    val events = eventsOf((0 until 21).map { day =>
      (day.toLong, 1L, f"2025-04-${day + 1}%02d 08:00:00", "purchase",
        if (day % 7 == 0) 100.0 else 10.0)
    })
    val got = graft.queries.AnalyticsQueries.gevReturnOf(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((13L, 3L, 100.0), (52L, 3L, 100.0)))
  }

  test("theilDecomposition: equal-within nations put all inequality between") {
    val s = spark; import s.implicits._
    val customer = Seq(
      (1L, "a", 1, 0.0, "S"), (2L, "b", 1, 0.0, "S"),
      (3L, "c", 2, 0.0, "S"), (4L, "d", 2, 0.0, "S")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = ordersOf(Seq(
      (1L, 1L, 100.0, "1996-01-01", "P"), (2L, 2L, 100.0, "1996-01-01", "P"),
      (3L, 3L, 300.0, "1996-01-01", "P"), (4L, 4L, 300.0, "1996-01-01", "P")))
    val r = graft.queries.AnalyticsQueries
      .theilDecompositionOf(customer, orders).collect()(0)
    val exp = 0.25 * math.log(0.5) + 0.75 * math.log(1.5)
    assert(math.abs(r.getAs[Double]("theil_total") - exp) < 1e-5)
    assert(r.getAs[Double]("theil_within") === 0.0)
    assert(r.getAs[Double]("between_share") === 1.0)
  }

  test("percolationProfile: rising threshold splits the planted chain") {
    val s = spark; import s.implicits._
    // chain 1-2-3 at cos .31/.27: at t=.26 one component, at t=.28 the
    // .27 edge drops (3 isolates from the chain's tail), at t=.32 all gone
    val edges = Seq((1L, 2L, 0.31), (2L, 3L, 0.27), (4L, 5L, 0.33))
      .toDF("src", "dst", "cos")
    val got = graft.queries.SimilarityQueries.percolationProfileOnEdges(edges)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (0.26, 5L, 3L, 2L, 0.6),  // {1,2,3} + {4,5}
      (0.28, 4L, 2L, 2L, 0.5),  // {1,2} + {4,5}
      (0.30, 4L, 2L, 2L, 0.5),
      (0.32, 2L, 1L, 1L, 1.0))) // {4,5} only
  }

  test("jainsIndex: perfectly even allocation scores J = 1") {
    val s = spark; import s.implicits._
    val events = eventsOf((0 until 12).map { i =>
      (i.toLong, (i % 4).toLong, f"2025-05-${i % 28 + 1}%02d 08:00:00", "click", 1.0)
    }) // 4 users × 3 events each
    val orders = ordersOf(Seq(
      (1L, 1L, 100.0, "1996-01-01", "P"), (2L, 2L, 50.0, "1996-01-02", "P"),
      (3L, 2L, 50.0, "1996-01-03", "P")))
    val got = graft.queries.AnalyticsQueries.jainsIndexOf(events, orders)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("events_per_user", 4L, 1.0, 0.0),
      ("revenue_per_customer", 2L, 1.0, 0.0))) // both customers total 100
  }

  test("hodgesLehmann: symmetric series collapses HL = median = mean") {
    val events = eventsOf(Seq(
      (1L, 1L, "2025-06-01 08:00:00", "purchase", 10.0),
      (2L, 1L, "2025-06-02 08:00:00", "purchase", 20.0),
      (3L, 1L, "2025-06-03 08:00:00", "purchase", 30.0)))
    val r = graft.queries.AnalyticsQueries.hodgesLehmannOf(events).collect()(0)
    assert(r.getAs[Long]("n_days") === 3L)
    assert(r.getAs[Double]("hodges_lehmann_dollars") === 20.0)
    assert(r.getAs[Double]("median_dollars") === 20.0)
    assert(r.getAs[Double]("mean_dollars") === 20.0)
  }

  test("pageTrend: perfectly ordered months give the closed-form z") {
    val rows = for {
      (mon, base) <- Seq(("1996-01", 10.0), ("1996-02", 20.0))
      (pr, i) <- Seq("1-U", "2-H", "3-M", "4-L", "5-N").zipWithIndex
    } yield (mon.hashCode.toLong * 100 + i, i.toLong + 1,
      base + i * 10.0, s"$mon-05", pr)
    val r = graft.queries.AnalyticsQueries.pageTrendOf(ordersOf(rows)).collect()(0)
    assert(r.getAs[Long]("b_blocks") === 2L)
    assert(r.getAs[Long]("page_l") === 110L) // 2·Σj² = 110, max possible
    assert(math.abs(r.getAs[Double]("z") - 20.0 / math.sqrt(50.0)) < 1e-4)
  }

  test("circularStats: all events at one hour give R = 1 and that mean hour") {
    val events = eventsOf((0 until 5).map { i =>
      (i.toLong, 1L, f"2025-07-${i + 1}%02d 06:${10 + i}%02d:00", "click", 1.0)
    })
    val r = graft.queries.AnalyticsQueries.circularStatsOf(events).collect()(0)
    assert(r.getString(0) === "click")
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("mean_hour") === 6.0)
    assert(r.getAs[Double]("resultant_r") === 1.0)
    assert(r.getAs[Double]("rayleigh_z") === 5.0)
    assert(r.getAs[Boolean]("nonuniform"))
  }

  test("cochranArmitage: planted linear proportion trend matches the replay") {
    val rows = for {
      (yr, nf) <- Seq(("1996", 2), ("1997", 5), ("1998", 8))
      i <- 0 until 10
    } yield (yr.toLong * 100 + i, 1L, 10.0, s"$yr-03-05",
      if (i < nf) "F" else "O")
    val orders = {
      val s = spark; import s.implicits._
      rows.map { case (ok, ck, tp, d, st) =>
        (ok, ck, st, tp, ts(d + " 00:00:00"), "P")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    }
    val r = graft.queries.AnalyticsQueries.cochranArmitageOf(orders).collect()(0)
    // replay: w = 0,1,2; x = 2,5,8; n = 10 each; p̄ = 0.5
    val (swx, swn, swwn, nn, p) = (0.0 * 2 + 1 * 5 + 2 * 8.0,
      0.0 * 10 + 1 * 10 + 2 * 10.0, 0.0 * 10 + 1 * 10 + 4 * 10.0, 30.0, 0.5)
    val zExp = (swx - p * swn) / math.sqrt(p * (1 - p) * (swwn - swn * swn / nn))
    assert(r.getAs[Long]("n_years") === 3L)
    assert(r.getAs[Double]("p_overall") === 0.5)
    assert(math.abs(r.getAs[Double]("z_trend") - zExp) < 1e-4)
  }

  test("robustShape: symmetric octiles give zero Bowley skew, uniform Moors 1") {
    // 8 values 10..80: octile ranks ceil(i·8/8)… e_i = 10·i exactly
    val events = eventsOf((1 to 8).map { i =>
      (i.toLong, 1L, f"2025-08-$i%02d 08:00:00", "view", i * 10.0)
    })
    val r = graft.queries.AnalyticsQueries.robustShapeOf(events).collect()(0)
    assert(r.getString(0) === "view")
    assert(r.getAs[Long]("n") === 8L)
    // e2=20, e4=40, e6=60: skew = (20+60−80)/40 = 0
    assert(r.getAs[Double]("bowley_skew") === 0.0)
    // ((70−50)+(30−10))/40 = 1
    assert(r.getAs[Double]("moors_kurtosis") === 1.0)
    assert(r.getAs[Double]("median_dollars") === 40.0)
  }

  test("jackknifeRatio: two-group closed form matches a hand replay") {
    val s = spark; import s.implicits._
    val customer = Seq(
      (1L, "a", 1, 0.0, "SEG"), (2L, "b", 1, 0.0, "SEG"),
      (3L, "c", 2, 0.0, "SEG")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    // nation 1: $300 over 2 buyers; nation 2: $100 over 1 buyer
    val orders = Seq(
      (10L, 1L, 100.0), (11L, 2L, 200.0), (12L, 3L, 100.0)
    ).map { case (ok, ck, tp) => (ok, ck, "O", tp, ts("1996-01-01 00:00:00"), "P") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = AnalyticsQueries.jackknifeRatioOf(customer, orders).collect()(0)
    assert(r.getAs[Long]("n_groups") === 2L)
    // R = 400/3 dollars
    assert(math.abs(r.getAs[Double]("ratio_per_cust") - 400.0 / 3.0) < 1e-3)
    // replicates (dollars): drop n1 → 100/1; drop n2 → 300/2
    val repl = Seq(100.0, 150.0); val rbar = repl.sum / 2
    val seExp = math.sqrt(repl.map(x => (x - rbar) * (x - rbar)).sum * (1.0 / 2))
    assert(math.abs(r.getAs[Double]("jk_se") - seExp) < 1e-3)
    val biasExp = (2 - 1) * (rbar - 400.0 / 3.0)
    assert(math.abs(r.getAs[Double]("jk_bias") - biasExp) < 1e-4)
  }
}
