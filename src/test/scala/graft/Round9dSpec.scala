package graft

import java.sql.Timestamp

import graft.queries.{BatchQueries, ExtensionQueries}

/** Round-9d additions: the remaining TPC-H subquery shapes (Q13
  * left-join distribution, Q17 correlated per-part average, Q21
  * double-correlated blame assignment) and Spearman rank correlation
  * via bounded-domain histogram ranks. */
class Round9dSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  private def customerDf(rows: Seq[(Long, String, Int, Double, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  }
  private def ordersDf(rows: Seq[(Long, Long, String, Double, String, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (ok, ck, st, tp, d, pr) => (ok, ck, st, tp, ts(d), pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
  }
  private def lineitemDf(rows: Seq[(Long, Long, Long, Double, Double, Double, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (ok, pk, sk, q, ep, disc, d) =>
      (ok, pk, sk, 1, q, ep, disc, 0.02, "N", "O", ts(d))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
  }
  private def partDf(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (pk, b) => (pk, s"part$pk", b, "TYPE", 1, 10.0) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
  }
  private def supplierDf(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (sk, n) => (sk, n, 0, 0.0) }
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
  }

  test("tpchQ13: zero-order customers survive the join-condition filter") {
    val cust = customerDf(Seq(
      (1L, "a", 0, 0.0, "B"),   // two non-urgent orders
      (2L, "b", 0, 0.0, "B"),   // urgent only → must land in the 0 bucket
      (3L, "c", 0, 0.0, "B")))  // no orders at all → 0 bucket
    val ord = ordersDf(Seq(
      (10L, 1L, "O", 0.0, "1996-01-01", "2-HIGH"),
      (11L, 1L, "O", 0.0, "1996-01-02", "3-MEDIUM"),
      (12L, 2L, "O", 0.0, "1996-01-03", "1-URGENT")))
    val got = BatchQueries.tpchQ13Of(cust, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // custdist desc, c_count desc: two customers with 0, one with 2
    assert(got.toSeq === Seq((0L, 2L), (2L, 1L)))
  }

  test("tpchQ17: 20%-of-mean cut is strict and exact at the integer boundary") {
    val part = partDf(Seq((1L, "Brand#4"), (2L, "Brand#4"), (3L, "Brand#2")))
    val li = lineitemDf(Seq(
      // part 1: sum_q=26, cnt=5 → q=1 qualifies (1·5·5=25 < 26)
      (100L, 1L, 1L, 1.0, 700.0, 0.0, "1996-01-01"),
      (101L, 1L, 1L, 7.0, 1.0, 0.0, "1996-01-01"),
      (102L, 1L, 1L, 6.0, 1.0, 0.0, "1996-01-01"),
      (103L, 1L, 1L, 6.0, 1.0, 0.0, "1996-01-01"),
      (104L, 1L, 1L, 6.0, 1.0, 0.0, "1996-01-01"),
      // part 2: sum_q=25, cnt=5 → q=1 at the EXACT boundary (25 < 25 is
      // false) — excluded; a float 0.2·avg threshold could flip this row
      (110L, 2L, 1L, 1.0, 999.0, 0.0, "1996-01-01"),
      (111L, 2L, 1L, 6.0, 1.0, 0.0, "1996-01-01"),
      (112L, 2L, 1L, 6.0, 1.0, 0.0, "1996-01-01"),
      (113L, 2L, 1L, 6.0, 1.0, 0.0, "1996-01-01"),
      (114L, 2L, 1L, 6.0, 1.0, 0.0, "1996-01-01"),
      // part 3: wrong brand — its tiny line must not leak in
      (120L, 3L, 1L, 1.0, 888.0, 0.0, "1996-01-01")))
    val got = BatchQueries.tpchQ17Of(li, part).collect()
    assert(got.length === 1)
    // only part 1's 700.00 qualifies: 70000 cents / 700 = 100.0
    assert(got.head.getDouble(0) === 100.0)
  }

  test("tpchQ21: only the sole late supplier of a multi-supplier F order is blamed") {
    val supp = supplierDf(Seq((1L, "s1"), (2L, "s2"), (3L, "s3")))
    val ord = ordersDf(Seq(
      (100L, 1L, "F", 0.0, "1996-01-01", "p"),
      (101L, 1L, "F", 0.0, "1996-01-01", "p"),
      (102L, 1L, "F", 0.0, "1996-01-01", "p"),
      (103L, 1L, "O", 0.0, "1996-01-01", "p"))) // not finished — excluded
    val late = "1996-06-01"; val ok = "1996-02-01"
    val li = lineitemDf(Seq(
      (100L, 1L, 1L, 1.0, 1.0, 0.0, late), // s1 late, s2 on time → s1 blamed
      (100L, 1L, 2L, 1.0, 1.0, 0.0, ok),
      (101L, 1L, 1L, 1.0, 1.0, 0.0, late), // both late → nobody blamed
      (101L, 1L, 2L, 1.0, 1.0, 0.0, late),
      (102L, 1L, 1L, 1.0, 1.0, 0.0, late), // single-supplier order → excluded
      (103L, 1L, 3L, 1.0, 1.0, 0.0, late), // O-status order → excluded
      (103L, 1L, 1L, 1.0, 1.0, 0.0, ok)))
    val got = BatchQueries.tpchQ21Of(supp, li, ord).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("s1", 1L)))
  }

  test("tpchQ21: multiple late lines by the same supplier count the order once") {
    val supp = supplierDf(Seq((1L, "s1"), (2L, "s2")))
    val ord = ordersDf(Seq((100L, 1L, "F", 0.0, "1996-01-01", "p")))
    val li = lineitemDf(Seq(
      (100L, 1L, 1L, 1.0, 1.0, 0.0, "1996-06-01"),
      (100L, 2L, 1L, 1.0, 1.0, 0.0, "1996-07-01"), // second late line, same supp
      (100L, 1L, 2L, 1.0, 1.0, 0.0, "1996-02-01")))
    val got = BatchQueries.tpchQ21Of(supp, li, ord).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("s1", 1L)))
  }

  test("spearman: perfect monotone relation scores exactly +1") {
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 1.0, 0.01, "1996-01-01"),
      (2L, 1L, 1L, 2.0, 1.0, 0.02, "1996-01-01"),
      (3L, 1L, 1L, 3.0, 1.0, 0.03, "1996-01-01"),
      (4L, 1L, 1L, 4.0, 1.0, 0.04, "1996-01-01")))
    val r = ExtensionQueries.spearmanOf(li).head()
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 1.0)
  }

  test("spearman: anti-monotone scores −1; ties use average ranks") {
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 1.0, 0.04, "1996-01-01"),
      (2L, 1L, 1L, 2.0, 1.0, 0.03, "1996-01-01"),
      (3L, 1L, 1L, 3.0, 1.0, 0.02, "1996-01-01"),
      (4L, 1L, 1L, 4.0, 1.0, 0.01, "1996-01-01")))
    assert(ExtensionQueries.spearmanOf(li).head().getDouble(1) === -1.0)
    // tied quantities: ranks average, rho computable and in [−1, 1]
    val tied = lineitemDf(Seq(
      (1L, 1L, 1L, 2.0, 1.0, 0.01, "1996-01-01"),
      (2L, 1L, 1L, 2.0, 1.0, 0.02, "1996-01-01"),
      (3L, 1L, 1L, 2.0, 1.0, 0.03, "1996-01-01"),
      (4L, 1L, 1L, 5.0, 1.0, 0.04, "1996-01-01")))
    val rho = ExtensionQueries.spearmanOf(tied).head().getDouble(1)
    // exact replay: doubled x-ranks (4,4,4,8) vs doubled y-ranks (2,4,6,8)
    val expect = {
      val (n, sx, sy, sxx, syy, sxy) = (4.0, 20.0, 20.0, 112.0, 120.0, 112.0)
      val raw = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    assert(rho === expect)
  }

  test("kruskalWallis: textbook no-tie case and identical-distribution null") {
    // A={1,2}, B={3,4}: ranks 1..4, R_A=3, R_B=7 → H = 2.4 exactly
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 1.0, 0.0, "1996-01-01"),
      (2L, 1L, 1L, 2.0, 1.0, 0.0, "1996-01-01"),
      (3L, 1L, 1L, 3.0, 1.0, 0.0, "1996-01-01"),
      (4L, 1L, 1L, 4.0, 1.0, 0.0, "1996-01-01")))
      .withColumn("l_returnflag",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("l_quantity") <= 2.0, "A")
          .otherwise("B"))
    val r = ExtensionQueries.kruskalWallisOf(li).head()
    assert(r.getLong(0) === 2L)     // k
    assert(r.getLong(1) === 4L)     // n
    assert(r.getDouble(2) === 2.4)  // no ties → H exact
    assert(r.getDouble(3) === 2.4)  // correction factor 1
  }

  test("kruskalWallis: identical groups score 0; all-equal values hit the guard") {
    val same = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 1.0, 0.0, "1996-01-01"),
      (2L, 1L, 1L, 2.0, 1.0, 0.0, "1996-01-01"),
      (3L, 1L, 1L, 1.0, 1.0, 0.0, "1996-01-01"),
      (4L, 1L, 1L, 2.0, 1.0, 0.0, "1996-01-01")))
      .withColumn("l_returnflag",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("l_orderkey") <= 2L, "A")
          .otherwise("B"))
    val row = ExtensionQueries.kruskalWallisOf(same).head()
    assert(row.getDouble(2) === 0.0)
    assert(row.getDouble(3) === 0.0)
    val allEq = lineitemDf(Seq(
      (1L, 1L, 1L, 5.0, 1.0, 0.0, "1996-01-01"),
      (2L, 1L, 1L, 5.0, 1.0, 0.0, "1996-01-01")))
    val g = ExtensionQueries.kruskalWallisOf(allEq).head()
    assert(g.getDouble(3) === 0.0) // degenerate correction guard
  }

  test("fdrBh: a planted shifted day is rejected, quiet days are not") {
    val s = spark; import s.implicits._
    // 9 quiet days at mean 10.00 (alternating ±1 cents for nonzero
    // variance) and one day at mean 1000.00
    val rows = (for {
      d <- 1 to 9
      i <- 0 until 20
    } yield (d.toLong * 100 + i, Timestamp.valueOf(f"2024-01-$d%02d 01:00:00"),
      i.toLong, "click", if (i % 2 == 0) 9.99 else 10.01, "{}")) ++
      (0 until 20).map(i => (1000L + i,
        Timestamp.valueOf("2024-01-10 01:00:00"), i.toLong, "click", 1000.0, "{}"))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.queries.ExtensionQueries.fdrBhOf(events).collect()
    assert(got.length === 10)
    val byDay = got.map(r => r.getDate(0).toString ->
      (r.getDouble(3), r.getInt(4), r.getBoolean(5))).toMap
    // the planted day has the smallest p and is rejected
    assert(byDay("2024-01-10")._2 === 1)
    assert(byDay("2024-01-10")._3)
    // quiet days: all z small → large p → not rejected
    (1 to 9).foreach { d =>
      assert(!byDay(f"2024-01-$d%02d")._3, s"day $d should not be rejected")
    }
    got.foreach { r =>
      val p = r.getDouble(3); assert(p >= 0.0 && p <= 1.0 + 1e-9)
    }
  }

  test("hdrQuantiles: exact integer bucketing and rank selection on a known set") {
    val s = spark; import s.implicits._
    // 100 events of 1.00, 10 of 100.00 (cents 100 → e=6, sub=9, bucket 105;
    // cents 10000 → e=13, sub=3, bucket 211)
    val rows = (0 until 100).map(i => (i.toLong,
      Timestamp.valueOf("2024-01-01 01:00:00"), i.toLong, "click", 1.0, "{}")) ++
      (0 until 10).map(i => (1000L + i,
        Timestamp.valueOf("2024-01-01 02:00:00"), i.toLong, "click", 100.0, "{}"))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.queries.StreamQueries.hdrQuantilesOf(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // q50 rank 55 ≤ 100 → small bucket; q999 rank 110 → large bucket
    assert(got(500L)._1 === 6L * 16 + ((100L * 16) / 64 - 16))
    assert(got(999L)._1 === 13L * 16 + ((10000L * 16) / 8192 - 16))
    // the true value lies inside [lo, hi) for both picked buckets
    assert(got(500L)._2 <= 1.0 && 1.0 < got(500L)._3)
    assert(got(999L)._2 <= 100.0 && 100.0 < got(999L)._3)
  }

  test("hdrQuantiles: relative error bound holds against exact percentiles") {
    val got = graft.queries.StreamQueries
      .hdrQuantilesOf(Tables(spark, sfDir, "events")).collect()
    assert(got.length === 4)
    got.foreach { r =>
      val (lo, hi, est, bound) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(lo < hi && lo <= est && est <= hi)
      assert((hi - lo) / (hi + lo) <= bound + 2e-6) // 6-dp fences on both sides
      assert(bound <= 1.0 / 33 + 1e-9) // 16 sub-buckets → ≤ ~3%
    }
  }

  test("hitsOnEdges: authorities concentrate on the shared part; scores L1-normalize") {
    val s = spark; import s.implicits._
    // part 100 bought by everyone; parts 1-3 by one customer each
    val edges = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L),
      (1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("c", "p")
    val got = graft.queries.ExtensionQueries.hitsOnEdges(edges).collect()
    val auth = got.filter(_.getString(0) == "authority")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val hubs = got.filter(_.getString(0) == "hub")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // the universally-bought part dominates authority mass
    assert(auth(100L) > auth(1L) && auth(100L) > auth(2L) && auth(100L) > auth(3L))
    // symmetric customers tie exactly (integer ring — no float drift)
    assert(hubs(1L) === hubs(2L) && hubs(2L) === hubs(3L))
    // L1 normalization: each side sums to ~Scale (truncation leaks < k ulps)
    val sa = auth.values.sum; val sh = hubs.values.sum
    assert(math.abs(sa - 1000000000000L) < 10)
    assert(math.abs(sh - 1000000000000L) < 10)
  }

  test("stlDecompose: flat series with a planted weekly bump decomposes cleanly") {
    val s = spark; import s.implicits._
    // 21 consecutive days: 100.00/day, but +70.00 every Monday
    val rows = (0 until 21).flatMap { d =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(d) // Jan 1 2024 = Monday
      val bump = if (day.getDayOfWeek.getValue == 1) 170.0 else 100.0
      Seq((d.toLong, Timestamp.valueOf(day.atTime(12, 0)), 1L, "click", bump, "{}"))
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.queries.ExtensionQueries.stlDecomposeOf(events).collect()
    assert(got.length === 21)
    val mid = got.filter(r => !r.isNullAt(3)) // full 7-day frames only
    assert(mid.length === 15)
    mid.foreach { r =>
      // trend = weekly mean = (6·100 + 170)/7 = 110.0 everywhere
      assert(math.abs(r.getDouble(3) - 110.0) < 1e-9)
      // seasonal: +60 on Mondays, −10 elsewhere; residual 0
      val expSeason = if (r.getLong(1) == 0L) 60.0 else -10.0
      assert(math.abs(r.getDouble(4) - expSeason) < 1e-9,
        s"day ${r.getDate(0)} seasonal ${r.getDouble(4)}")
      assert(math.abs(r.getDouble(5)) < 1e-9)
    }
    // edge days: trend and residual NULL, seasonal still reported
    got.filter(r => r.isNullAt(3)).foreach { r =>
      assert(r.isNullAt(5) && !r.isNullAt(4))
    }
  }

  test("rocchioPrf: expansion terms retrieve docs the seed query cannot see") {
    val s = spark; import s.implicits._
    // docs 1-5: dense seed matches + the rare term; 6-9: diluted seed
    // matches (long filler drags bm25 length normalization down);
    // 20: ONLY the rare term — invisible to the seed query. All five
    // seed terms (df 9) outrank zebra (df 6) for the top-5 df cut.
    val docs = ((1L to 5L).map(i =>
      (i, "c1 c1 c2 c2 c3 c3 c4 c5 zebra", "en", "s", 1L)) ++
      (6L to 9L).map(i =>
        (i, "c1 c2 c3 c4 c5 x1 x2 x3 x4 x5 x6 x7 x8 x9 x0", "en", "s", 1L)) :+
      (20L, "zebra zebra zebra", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val prf = graft.queries.TextQueries.rocchioPrfOf(docs).collect()
    val bm = graft.queries.TextQueries.bm25Of(docs).collect()
    assert(!bm.exists(_.getLong(1) == 20L), "seed query must not see doc 20")
    assert(prf.exists(_.getLong(1) == 20L), "expanded query must retrieve doc 20")
    // ranks are 1..k with descending scores
    val ranks = prf.map(_.getInt(0)).toSeq
    assert(ranks === (1 to prf.length))
    val scores = prf.map(_.getDouble(3)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("rendezvousReshard: only the new shard gains; totals conserve") {
    val got = graft.queries.TextQueries
      .rendezvousReshardOf(Tables(spark, sfDir, "documents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = Tables(spark, sfDir, "documents").count()
    assert(got.length === 9)
    assert(got.map(_._2).sum === n) // old assignment partitions the corpus
    assert(got.map(_._3).sum === n) // so does the new one
    val byShard = got.map(t => t._1 -> t).toMap
    assert(byShard(8L)._2 === 0L)   // shard 8 did not exist before
    // rendezvous monotonicity: every move lands on the NEW shard only
    (0L to 7L).foreach(s => assert(byShard(s)._4 === 0L, s"shard $s gained"))
    assert(byShard(8L)._4 === byShard(8L)._3 && byShard(8L)._4 > 0L)
    // movement is in the right ballpark of the theoretical 1/9
    val moved = byShard(8L)._4.toDouble / n
    assert(moved > 0.03 && moved < 0.25, s"moved fraction $moved")
  }

  test("fellegiSunter: agreement weights replay exactly; threshold splits pairs") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "alpha one", "en", "web", 150L),   // agrees with 2 on all fields
      (2L, "alpha two", "en", "web", 120L),
      (3L, "alpha three", "fr", "book", 950L)) // disagrees with both on all
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.TextQueries.fellegiSunterOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getDouble(5), r.getBoolean(6))).toMap
    assert(got.size === 3)
    def w(m: Double, u: Double, agree: Boolean): Double = {
      val x = if (agree) m / u else (1.0 - m) / (1.0 - u)
      ("%.8f".format(math.log(x) / math.log(2.0))).toDouble
    }
    def score(a1: Boolean, a2: Boolean, a3: Boolean): Double = {
      val raw = w(0.95, 0.20, a1) + w(0.90, 0.05, a2) + w(0.85, 0.10, a3)
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    val full = got((1L, 2L))
    assert(full._1 && full._2 && full._3)
    assert(full._4 === score(true, true, true) && full._5)
    val none = got((1L, 3L))
    assert(!none._1 && !none._2 && !none._3)
    assert(none._4 === score(false, false, false) && !none._5)
  }

  test("tpchQ19: disjoint bands OR together; cross-band combos are excluded") {
    val part = partDf(Seq((1L, "Brand#1"), (2L, "Brand#2"), (3L, "Brand#3")))
      .withColumn("p_size",
        org.apache.spark.sql.functions.col("p_partkey").cast("int") * 4 - 3)
    // sizes: part1→1, part2→5, part3→9 (all inside their band's size range)
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 5.0, 100.0, 0.10, "1996-01-01"),  // band 1: in → 90
      (2L, 1L, 1L, 12.0, 100.0, 0.00, "1996-01-01"), // qty 12 > 11 → out
      (3L, 2L, 1L, 15.0, 200.0, 0.00, "1996-01-01"), // band 2: in → 200
      (4L, 2L, 1L, 5.0, 999.0, 0.00, "1996-01-01"),  // brand2 w/ band-1 qty → out
      (5L, 3L, 1L, 25.0, 300.0, 0.00, "1996-01-01"), // band 3: in → 300
      (6L, 3L, 1L, 31.0, 999.0, 0.00, "1996-01-01"))) // qty 31 > 30 → out
    val got = BatchQueries.tpchQ19Of(li, part).collect()
    assert(got.length === 1)
    assert(got.head.getLong(0) === 3L)
    assert(got.head.getDouble(1) === 590.0)
  }

  test("lofOnEdges: the isolated point next to a tight cluster scores highest") {
    val s = spark; import s.implicits._
    // tight 4-clique {1,2,3,4} (d=.01 between members, k-neighborhoods
    // stay inside the clique); point 9's neighbors are clique members
    // at d=.2 — the density-ratio shape global detectors miss
    val q = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (2L, 3L), (2L, 4L),
      (3L, 1L), (3L, 2L), (3L, 4L), (4L, 1L), (4L, 2L), (4L, 3L))
      .map { case (a, b) => (a, b, 0.99) } ++
      Seq((9L, 1L, 0.80), (9L, 2L, 0.80), (9L, 3L, 0.80))
    val edges = q.toDF("src", "dst", "cos")
    val got = graft.queries.SimilarityQueries.lofOnEdges(edges).collect()
    assert(got.length === 5)
    val top = got.head
    assert(top.getLong(0) === 9L)          // ordered by lof desc
    // reach(9→member)=max(kdist(member)=.01, .2)=.2 ⇒ lrd(9)=5;
    // members: lrd=100, lof(9)=100·0.2=20
    assert(math.abs(top.getDouble(4) - 20.0) < 1e-6)
    // clique members sit at exact density parity (lof = 1)
    got.tail.foreach(r => assert(math.abs(r.getDouble(4) - 1.0) < 1e-6,
      s"vec ${r.getLong(0)} lof ${r.getDouble(4)}"))
    assert(math.abs(got.find(_.getLong(0) == 1L).get.getDouble(3) - 100.0) < 1e-6)
  }

  test("alsStep: closed-form factors replay the exact normal equations") {
    val li = Tables(spark, sfDir, "lineitem")
    val ord = Tables(spark, sfDir, "orders")
    val got = graft.queries.RecommenderQueries.alsStepOf(li, ord).collect()
    assert(got.length === 20)
    val users = got.map(_.getLong(0)).toSet
    val ratings = li.join(ord,
        li("l_orderkey") === ord("o_orderkey"))
      .groupBy(org.apache.spark.sql.functions.col("o_custkey").as("u"),
        org.apache.spark.sql.functions.col("l_partkey"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("l_quantity").cast("long")).as("r"))
      .collect()
      .filter(r => users.contains(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def mix(p: Long): Long =
      (((p % 4294967296L) * 34283 % 65536) * 65536 + (p % 4294967296L) * 51831) % 4294967296L
    def rnd(x: Double, s: Int): Double = {
      val f = math.pow(10, s); math.floor(x * f + 0.5) / f
    }
    got.foreach { row =>
      val u = row.getLong(0)
      val items = ratings.filter(_._1 == u)
        .map { case (_, p, r) =>
          (r, mix(p) % 19 - 9, mix(p) / 19 % 19 - 9) }
      assert(row.getLong(1) === items.length.toLong)
      val (saa, sab, sbb) = (items.map(i => i._2 * i._2).sum,
        items.map(i => i._2 * i._3).sum, items.map(i => i._3 * i._3).sum)
      val (ba, bb) = (items.map(i => i._1 * i._2).sum, items.map(i => i._1 * i._3).sum)
      val det = ((saa + 1) * (sbb + 1) - sab * sab).toDouble
      val (u1, u2) = ((ba * (sbb + 1) - bb * sab) / det,
        (bb * (saa + 1) - ba * sab) / det)
      assert(row.getDouble(2) === rnd(u1, 6), s"u1 for $u")
      assert(row.getDouble(3) === rnd(u2, 6), s"u2 for $u")
      val sse = items.map { case (r, qa, qb) =>
        val e = r - u1 * qa - u2 * qb; e * e }.sum
      assert(math.abs(row.getDouble(4) - sse) < 1e-3, s"sse for $u")
    }
  }

  test("winnowing: a shared >= k+w-1 substring guarantees a shared fingerprint") {
    val s = spark; import s.implicits._
    val shared = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta", "en", "s", 1L),
      (2L, s"unrelated prefix words $shared and a different tail", "en", "s", 1L),
      (3L, "0123 456 789 012 345 678 901 234 567 890", "en", "s", 1L),
      (4L, "tiny text", "en", "s", 1L)) // 9 chars: grams but no full window
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.TextQueries.winnowingOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)), "docs sharing a 43-char substring must pair")
    assert(got((1L, 2L)) >= 1L)
    // the digit-only doc shares no 8-gram with the letter docs
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
    // doc 4 never forms a full window → no fingerprints → no pairs
    assert(!got.keys.exists(k => k._1 == 4L || k._2 == 4L))
  }

  test("tpchQ15: exact-integer max keeps revenue ties; window edges respected") {
    val supp = supplierDf(Seq((1L, "s1"), (2L, "s2"), (3L, "s3")))
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 100.0, 0.0, "1996-02-01"),  // s1: 100.00
      (2L, 1L, 2L, 1.0, 50.0, 0.0, "1996-02-01"),   // s2: 50+50 = 100.00 (tie)
      (3L, 1L, 2L, 1.0, 50.0, 0.0, "1996-03-31"),
      (4L, 1L, 3L, 1.0, 99.0, 0.0, "1996-02-01"),   // s3: 99 — below max
      (5L, 1L, 1L, 1.0, 999.0, 0.0, "1996-04-01"))) // outside the quarter
    val got = BatchQueries.tpchQ15Of(supp, li).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, "s1", 100.0), (2L, "s2", 100.0)))
  }

  private def nationDf(rows: Seq[(Int, String, Int)]) = {
    val s = spark; import s.implicits._
    rows.toDF("n_nationkey", "n_name", "n_regionkey")
  }
  private def regionDf(rows: Seq[(Int, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("r_regionkey", "r_name")
  }

  test("tpchQ7: both directions of the nation pair survive; others drop") {
    val nat = nationDf(Seq((1, "NATION_1", 0), (2, "NATION_2", 0), (3, "NATION_3", 0)))
    val supp = supplierDf(Seq((10L, "s10"), (20L, "s20"), (30L, "s30")))
      .withColumn("s_nationkey",
        (org.apache.spark.sql.functions.col("s_suppkey") / 10).cast("int"))
    val cust = customerDf(Seq((100L, "c", 2, 0.0, "B"), (200L, "c", 1, 0.0, "B"),
      (300L, "c", 3, 0.0, "B")))
    val ord = ordersDf(Seq(
      (1L, 100L, "O", 0.0, "1996-05-01", "p"),   // cust nation 2
      (2L, 200L, "O", 0.0, "1996-05-01", "p"),   // cust nation 1
      (3L, 300L, "O", 0.0, "1996-05-01", "p")))  // cust nation 3
    val li = lineitemDf(Seq(
      (1L, 1L, 10L, 1.0, 100.0, 0.0, "1996-06-01"), // n1 → n2: 100
      (2L, 1L, 20L, 1.0, 200.0, 0.0, "1997-06-01"), // n2 → n1: 200
      (3L, 1L, 10L, 1.0, 999.0, 0.0, "1996-06-01"), // n1 → n3: drop
      (1L, 1L, 30L, 1.0, 999.0, 0.0, "1996-06-01"))) // n3 → n2: drop
    val got = BatchQueries.tpchQ7Of(li, ord, cust, supp, nat).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("NATION_1", "NATION_2", 1996L, 100.0),
      ("NATION_2", "NATION_1", 1997L, 200.0)))
  }

  test("tpchQ8: market share is the focal nation's slice of one aggregation") {
    val nat = nationDf(Seq((3, "NATION_3", 3), (8, "NATION_8", 3), (0, "NATION_0", 0)))
    val reg = regionDf(Seq((3, "EUROPE"), (0, "AFRICA")))
    val part = partDf(Seq((1L, "Brand#1"))) // partDf sets p_type = "TYPE"
      .withColumn("p_type", org.apache.spark.sql.functions.lit("ECONOMY"))
    val supp = supplierDf(Seq((1L, "s1"), (2L, "s2")))
      .withColumn("s_nationkey",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("s_suppkey") === 1L, 3).otherwise(0))
    val cust = customerDf(Seq(
      (100L, "c", 3, 0.0, "B"),   // EUROPE
      (200L, "c", 0, 0.0, "B")))  // AFRICA — its orders drop
    val ord = ordersDf(Seq(
      (1L, 100L, "O", 0.0, "1996-05-01", "p"),
      (2L, 100L, "O", 0.0, "1996-06-01", "p"),
      (3L, 200L, "O", 0.0, "1996-07-01", "p")))
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 300.0, 0.0, "1996-06-01"), // focal supplier: 300
      (2L, 1L, 2L, 1.0, 100.0, 0.0, "1996-07-01"), // other supplier: 100
      (3L, 1L, 1L, 1.0, 999.0, 0.0, "1996-07-01"))) // non-EUROPE customer
    val got = BatchQueries.tpchQ8Of(li, ord, cust, supp, nat, reg, part).collect()
    assert(got.length === 1)
    assert(got.head.getLong(0) === 1996L)
    assert(got.head.getDouble(1) === 0.75) // 300 / 400
  }

  test("tpchQ9: signed profits round with the fenced division, not integer div") {
    val nat = nationDf(Seq((1, "NATION_1", 0)))
    val supp = supplierDf(Seq((1L, "s1"))).withColumn("s_nationkey",
      org.apache.spark.sql.functions.lit(1))
    val part = partDf(Seq((1L, "Brand#1")))
      .withColumn("p_name", org.apache.spark.sql.functions.lit("red widget"))
      .withColumn("p_retailprice", org.apache.spark.sql.functions.lit(10.0))
    val ord = ordersDf(Seq((1L, 1L, "O", 0.0, "1996-05-01", "p")))
    // revenue 100·(1−0.1259…) no — keep exact: ep=15.55, disc=0, qty=2
    // amount = 1555·100 − 1000·2·100 = 155500 − 200000 = −44500 units
    // → −4.45 exactly
    val li = lineitemDf(Seq((1L, 1L, 1L, 2.0, 15.55, 0.0, "1996-06-01")))
    val got = BatchQueries.tpchQ9Of(li, ord, supp, nat, part).collect()
    assert(got.length === 1)
    assert(got.head.getString(0) === "NATION_1")
    assert(got.head.getDouble(2) === -4.45)
  }

  test("tpchQ12: urgent/high vs rest split in a single pass") {
    val ord = ordersDf(Seq(
      (1L, 1L, "O", 0.0, "1996-01-01", "1-URGENT"),
      (2L, 1L, "O", 0.0, "1996-01-01", "2-HIGH"),
      (3L, 1L, "O", 0.0, "1996-01-01", "5-LOW")))
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 1.0, 0.0, "1996-06-01"),
      (2L, 1L, 1L, 1.0, 1.0, 0.0, "1996-06-02"),
      (3L, 1L, 1L, 1.0, 1.0, 0.0, "1996-06-03"),
      (3L, 1L, 1L, 1.0, 1.0, 0.0, "1997-06-03"))) // outside the year
    val got = BatchQueries.tpchQ12Of(li, ord).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("N", 2L, 1L))) // fixture flag is always N
  }

  test("feistelPseudonymize: a 2-round Feistel permutes the id domain bijectively") {
    val got = graft.queries.ExtensionQueries
      .feistelPseudonymizeOf(Tables(spark, sfDir, "events")).collect()
    val nUsers = Tables(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(got.length === math.min(20L, nUsers).toInt)
    got.foreach { r =>
      assert(r.getBoolean(4), "pseudonymization must be collision-free")
      assert(r.getLong(2) === r.getLong(3))
      assert(r.getLong(1) !== r.getLong(0)) // ids actually move
      // replay the inverse: recover the original id from the pseudonym
      val (a, b) = (r.getLong(1) / 65536 % 65536, r.getLong(1) % 65536)
      val l0 = b ^ ((a * 34283 + 54321) % 65536)
      val r0 = a ^ ((l0 * 34283 + 12345) % 65536)
      assert(l0 * 65536 + r0 === r.getLong(0), s"inverse of ${r.getLong(1)}")
    }
  }

  test("dpCounts: seeded Laplace draws replay and stay near the true counts") {
    val got = graft.queries.ExtensionQueries
      .dpCountsOf(Tables(spark, sfDir, "events")).collect()
    assert(got.length === 5)
    got.zipWithIndex.foreach { case (r, idx) =>
      val i = idx + 1L // alphabetical rank
      val u = ((i * 2654435761L) % 4294967296L + 0.5) / 4294967296.0
      val v = u - 0.5
      val noise = -(2.0 / 0.5) * math.signum(v) * math.log(1.0 - 2.0 * math.abs(v)) / 2.0
      def rnd4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      assert(r.getDouble(3) === rnd4(noise), s"noise for ${r.getString(0)}")
      assert(r.getDouble(4) === rnd4(r.getLong(1) + noise))
      // ε=0.5, b=2 → |noise| rarely exceeds 20 for these Weyl points
      assert(math.abs(r.getDouble(3)) < 20.0)
    }
  }

  test("neymanAllocation: weights normalize; high-variance strata get more budget") {
    val s = spark; import s.implicits._
    val docs = ((1 to 50).map(i => (i.toLong, "t", "en", "low", 100L)) ++ // σ=0
      (1 to 50).map(i => (100L + i, "t", "en", "high",
        if (i % 2 == 0) 10L else 990L)))                                  // σ≈495
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.TextQueries.neymanAllocationOf(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getLong(5))).toMap
    // zero-variance stratum earns zero budget; the whole budget goes high
    assert(got("low")._2 === 0.0 && got("low")._3 === 0L)
    assert(got("high")._2 === 1.0 && got("high")._3 === 100L)
    val sf = graft.queries.TextQueries
      .neymanAllocationOf(Tables(spark, sfDir, "documents")).collect()
    val wsum = sf.map(_.getDouble(3)).sum
    assert(math.abs(wsum - 1.0) < 1e-4)
    // integer allocations land within rounding of the budget
    val isum = sf.map(_.getLong(5)).sum
    assert(math.abs(isum - 100L) <= sf.length / 2 + 1)
  }

  test("greedySetCover: marginal gains drive the pick order; ties break by name") {
    val s = spark; import s.implicits._
    // cells via lang/bucket: craft sources with known coverage
    //  A: cells {en/1, fr/1, de/1}; B: {de/1, es/1}; C: {es/1}
    val docs = Seq(
      (1L, "t", "en", "A", 100L), (2L, "t", "fr", "A", 100L),
      (3L, "t", "de", "A", 100L),
      (4L, "t", "de", "B", 100L), (5L, "t", "es", "B", 100L),
      (6L, "t", "es", "C", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.TextQueries.greedySetCoverOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // greedy: A gains 3; B adds es (1 new); C adds nothing (gain 0)
    assert(got.toSeq === Seq(
      (1L, "A", 3L, 3L), (2L, "B", 1L, 4L), (3L, "C", 0L, 4L)))
  }

  test("diffInDiff: a planted treatment effect is recovered net of the shared shock") {
    val s = spark; import s.implicits._
    // shared shock: everyone +5 post; treated (odd users) +10 more.
    // ±0.01 jitter keeps each cell's variance nonzero.
    val rows = for {
      u <- 1L to 40L
      i <- 0 until 5
      post <- Seq(0, 1)
    } yield {
      val base = 10.0 + (if (post == 1) 5.0 else 0.0) +
        (if (post == 1 && u % 2 == 1) 10.0 else 0.0) +
        (if (i % 2 == 0) 0.01 else -0.01)
      val ts = Timestamp.valueOf(if (post == 0) "2024-01-05 00:00:00"
        else "2024-01-25 00:00:00")
      (u * 1000 + i, ts, u, "click", base, "{}")
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.queries.ExtensionQueries.diffInDiffOf(events).head()
    assert(r.getLong(0) === 200L && r.getLong(1) === 200L)
    assert(math.abs(r.getDouble(2) - 15.0) < 1e-9) // treated: shock + effect
    assert(math.abs(r.getDouble(3) - 5.0) < 1e-9)  // control: shock only
    assert(math.abs(r.getDouble(4) - 10.0) < 1e-9) // DiD isolates the effect
    assert(r.getDouble(5) > 100.0)                 // tiny jitter → huge z
  }

  test("simpsonCheck: classic aggregation reversal flags every stratum") {
    // 1996: urgent 1/10 late vs other 0/1 → urgent later (+)
    // 1997: urgent 10/10 late vs other 9/10 → (+)
    // pooled: urgent 11/20 (55%) vs other 9/11 (82%) → (−) — reversal
    def orderRows(yr: String, n: Int, prio: String, startKey: Long) =
      (0 until n).map(i => (startKey + i, 1L, "F", 0.0, s"$yr-03-01", prio))
    val ord = ordersDf(
      orderRows("1996", 10, "1-URGENT", 100L) ++ orderRows("1996", 1, "5-LOW", 200L) ++
        orderRows("1997", 10, "1-URGENT", 300L) ++ orderRows("1997", 10, "5-LOW", 400L))
    def li(ok: Long, late: Boolean, yr: String) =
      (ok, 1L, 1L, 1.0, 1.0, 0.0, if (late) s"$yr-08-01" else s"$yr-03-15")
    val lineitems = lineitemDf(
      (100L until 110L).map(k => li(k, k == 100L, "1996")) ++ Seq(li(200L, false, "1996")) ++
        (300L until 310L).map(k => li(k, true, "1997")) ++
        (400L until 410L).map(k => li(k, k != 400L, "1997")))
    val got = graft.queries.ExtensionQueries.simpsonCheckOf(ord, lineitems).collect()
      .map(r => r.getLong(0) -> (r.getInt(7), r.getBoolean(8))).toMap
    assert(got(-1L)._1 === -1)             // pooled: urgent looks SAFER
    assert(got(1996L)._1 === 1 && got(1996L)._2) // ...but every stratum says later
    assert(got(1997L)._1 === 1 && got(1997L)._2)
    assert(!got(-1L)._2)                   // the pooled row never self-flags
  }

  test("partialCorr: controlling the confounder recovers the exact direct link") {
    val s = spark; import s.implicits._
    // y = x + z with x ⊥ z (balanced factorial): r_xy·z must be exactly 1
    val li = (for {x <- Seq(0, 1); z <- Seq(0, 1); rep <- 0 until 3} yield {
      (x.toLong * 10 + z * 2 + rep, 1L, 1L, 1, x.toDouble, (x + z) / 100.0,
        z / 100.0, 0.0, "N", "O", Timestamp.valueOf("1996-01-01 00:00:00"))
    }).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val r = graft.queries.ExtensionQueries.partialCorrOf(li).head()
    assert(r.getLong(0) === 12L)
    assert(r.getDouble(2) === 0.0)        // x ⊥ z by construction
    assert(math.abs(r.getDouble(1) - 0.707107) < 1e-6)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-6)
  }

  test("tostEquivalence: same-mean halves pass; a shifted half fails the margin") {
    val s = spark; import s.implicits._
    def events(shift: Double) = (for {
      u <- 1L to 40L; i <- 0 until 10
    } yield (u * 100 + i, Timestamp.valueOf("2024-01-05 00:00:00"), u, "click",
      10.0 + (if (i % 2 == 0) 0.5 else -0.5) + (if (u % 2 == 1) shift else 0.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val same = graft.queries.ExtensionQueries.tostEquivalenceOf(events(0.0)).head()
    assert(same.getBoolean(8), "identical halves must conclude equivalence")
    assert(math.abs(same.getDouble(4)) < 1e-9)
    // a 20% shift blows past the ±5% margin
    val far = graft.queries.ExtensionQueries.tostEquivalenceOf(events(2.0)).head()
    assert(!far.getBoolean(8))
    assert(far.getDouble(4) > far.getDouble(5)) // diff exceeds delta
  }

  test("propensityAtt: matching on activity removes the planted confounding") {
    val s = spark; import s.implicits._
    // activity drives BOTH error exposure and purchases; the true causal
    // effect of exposure is 0. Heavy users (n_ev=20): half exposed; light
    // users (n_ev=4): none exposed. Purchases scale with activity only.
    val rows = (for (u <- 1L to 60L) yield {
      val heavy = u <= 30
      val exposed = heavy && u % 2 == 1
      val n = if (heavy) 20 else 4
      (0 until n).map { i =>
        val typ = if (exposed && i == 0) "error"
          else if (i % 2 == 0) "purchase" else "click"
        (u * 1000 + i, Timestamp.valueOf("2024-01-05 00:00:00"), u, typ, 10.0, "{}")
      }
    }).flatten
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.queries.ExtensionQueries.propensityAttOf(events).head()
    assert(r.getLong(0) === 15L)   // treated
    assert(r.getLong(1) === 45L)   // controls
    assert(r.getLong(2) === 15L)   // all treated matched
    // naive: exposed users are heavy → big spurious positive diff
    assert(r.getDouble(3) > 20.0)
    // matched: each exposed heavy user pairs with an unexposed heavy user
    // → ATT collapses to the one purchase slot the error displaced
    assert(math.abs(r.getDouble(4)) <= 10.0 + 1e-9)
    assert(r.getDouble(4) < r.getDouble(3) / 2)
  }

  test("sloBurn: both windows must burn before the page fires") {
    val s = spark; import s.implicits._
    // 12 hours at 20% errors (just under budget), then one catastrophic
    // hour at 80%: the 1-h burn spikes instantly AND tips the 6-h window
    val rows = (0 until 13).flatMap { h =>
      val errShare = if (h == 12) 8 else 2
      (0 until 10).map { i =>
        val typ = if (i < errShare) "error" else "click"
        (h.toLong * 100 + i, Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"),
          1L, typ, 1.0, "{}")
      }
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.queries.ExtensionQueries.sloBurnOf(events).collect()
    assert(got.length === 13)
    val quiet = got.take(12)
    quiet.foreach(r => assert(!r.getBoolean(6), s"hour ${r.getLong(0)} paged"))
    val spike = got.last
    assert(spike.getBoolean(6))
    // burn replay: 1h = 0.8/0.22; 6h = (5·2+8)/60/0.22
    assert(math.abs(spike.getDouble(4) - 0.8 / 0.22) < 1e-3)
    assert(math.abs(spike.getDouble(5) - 18.0 / 60.0 / 0.22) < 1e-3)
  }

  test("botDetect: a burst actor and a sub-second repeater both flag; humans don't") {
    val s = spark; import s.implicits._
    val rows =
      // user 1: 25 events inside one minute → burst flag
      (0 until 25).map(i => (100L + i,
        Timestamp.valueOf(f"2024-01-01 10:00:${i * 2}%02d.0"), 1L, "click", 1.0, "{}")) ++
      // user 2: two events 1 ms apart → min-gap flag
      Seq((200L, Timestamp.valueOf("2024-01-01 11:00:00.000"), 2L, "click", 1.0, "{}"),
        (201L, Timestamp.valueOf("2024-01-01 11:00:00.001"), 2L, "click", 1.0, "{}")) ++
      // user 3: 10 events spread over hours → clean
      (0 until 10).map(i => (300L + i,
        Timestamp.valueOf(f"2024-01-01 ${10 + i}%02d:00:00"), 3L, "click", 1.0, "{}"))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.queries.ExtensionQueries.botDetectOf(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(got(1L)._1 === 25L && got(1L)._2)
    assert(got(2L)._2)
    assert(!got(3L)._2)
  }

  test("compactionPlan: groups partition the manifest and chase the target size") {
    val got = graft.queries.TextQueries
      .compactionPlanOf(Tables(spark, sfDir, "documents")).collect()
    val docs = Tables(spark, sfDir, "documents")
    val totalDocs = docs.count()
    val totalBytes = docs.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).cast("long"))).head().getLong(0)
    assert(got.map(_.getLong(2)).sum === totalDocs)   // no doc lost
    assert(got.map(_.getLong(3)).sum === totalBytes)  // no byte lost
    assert(got.length > 1)
    // every group except the last reaches the target (next-fit property:
    // a group only closes once the running total crosses the boundary)
    got.dropRight(1).foreach { r =>
      assert(r.getLong(3) >= 1L, s"group ${r.getLong(0)} empty")
    }
    // group ids are the consecutive prefix-quotients
    assert(got.map(_.getLong(0)).toSeq === got.map(_.getLong(0)).toSeq.sorted)
  }

  test("allenRelations: the CASE ladder lands every crafted pair in its relation") {
    val s = spark; import s.implicits._
    def ev(id: Long, u: Long, t: String, ts: String) =
      (id, Timestamp.valueOf(ts), u, t, 1.0, "{}")
    // user 1: click [10:00,11:00], error [11:00,12:00] → meets
    // user 2: click [10:00,12:00], error [10:30,11:00] → contains
    // user 3: click [10:00,11:00], error [10:00,11:00] → equal
    // user 4: click [10:00,11:00], error [10:30,11:30] → overlaps
    // user 5: click [10:00,10:30], error [11:00,12:00] → before
    val rows = Seq(
      ev(1, 1, "click", "2024-01-01 10:00:00"), ev(2, 1, "click", "2024-01-01 11:00:00"),
      ev(3, 1, "error", "2024-01-01 11:00:00"), ev(4, 1, "error", "2024-01-01 12:00:00"),
      ev(5, 2, "click", "2024-01-01 10:00:00"), ev(6, 2, "click", "2024-01-01 12:00:00"),
      ev(7, 2, "error", "2024-01-01 10:30:00"), ev(8, 2, "error", "2024-01-01 11:00:00"),
      ev(9, 3, "click", "2024-01-01 10:00:00"), ev(10, 3, "click", "2024-01-01 11:00:00"),
      ev(11, 3, "error", "2024-01-01 10:00:00"), ev(12, 3, "error", "2024-01-01 11:00:00"),
      ev(13, 4, "click", "2024-01-01 10:00:00"), ev(14, 4, "click", "2024-01-01 11:00:00"),
      ev(15, 4, "error", "2024-01-01 10:30:00"), ev(16, 4, "error", "2024-01-01 11:30:00"),
      ev(17, 5, "click", "2024-01-01 10:00:00"), ev(18, 5, "click", "2024-01-01 10:30:00"),
      ev(19, 5, "error", "2024-01-01 11:00:00"), ev(20, 5, "error", "2024-01-01 12:00:00"))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.queries.ExtensionQueries.allenRelationsOf(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("meets" -> 1L, "contains" -> 1L, "equal" -> 1L,
      "overlaps" -> 1L, "before" -> 1L))
  }

  test("isotonicFit: output is monotone and L2-no-worse than the raw rates") {
    val got = graft.queries.TextQueries
      .isotonicFitOf(Tables(spark, sfDir, "documents")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length >= 3)
    // monotone nondecreasing — the defining property
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4 + 1e-9, s"bins ${a._1}->${b._1} decrease")
    }
    // where the raw rates are already monotone the fit equals them
    val rawMono = got.sliding(2).forall { case Array(a, b) => a._3 <= b._3 }
    if (rawMono) got.foreach(r => assert(math.abs(r._4 - r._3) < 1e-6))
    // the fit stays inside the raw-rate envelope
    val (lo, hi) = (got.map(_._3).min, got.map(_._3).max)
    got.foreach(r => assert(r._4 >= lo - 1e-9 && r._4 <= hi + 1e-9))
  }

  test("shapleyAttribution: efficiency and the null-player axiom hold empirically") {
    val s = spark; import s.implicits._
    // click alone converts (v=1), view alone doesn't (v=0), both → 1:
    // click carries all credit; view is a null player; signup/error unseen
    def ev(id: Long, u: Long, t: String) =
      (id, Timestamp.valueOf("2024-01-01 10:00:00"), u, t, 1.0, "{}")
    val rows =
      (1L to 10L).flatMap(u => Seq(ev(u * 10, u, "click"), ev(u * 10 + 1, u, "purchase"))) ++
      (11L to 20L).map(u => ev(u * 10, u, "view")) ++
      (21L to 30L).flatMap(u => Seq(ev(u * 10, u, "click"), ev(u * 10 + 1, u, "view"),
        ev(u * 10 + 2, u, "purchase")))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.queries.ExtensionQueries.shapleyAttributionOf(events).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // click: w(∅)·(v(c)−v(∅)) + w({v})·(v(cv)−v(v)) = ¼ + 1/12 = 1/3
    assert(math.abs(got("click") - (0.25 + 0.0833333333333333)) < 1e-6)
    assert(got("view") === 0.0) // exact null player
    // unseen channels: only missing-coalition (v=0) phantom terms,
    // which are ≤ 0 and symmetric between the two
    assert(got("signup") === got("error") && got("signup") <= 0.0)
  }

  test("fairnessAudit: integer-sign predictions, DI ratio, and guards") {
    val got = graft.queries.TextQueries
      .fairnessAuditOf(Tables(spark, sfDir, "documents")).collect()
    assert(got.nonEmpty)
    val di = got.head.getDouble(6)
    got.foreach(r => assert(r.getDouble(6) === di)) // one global ratio
    assert(di >= 0.0 && di <= 1.0 + 1e-9)
    got.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val sel = r.getDouble(3); assert(sel >= 0.0 && sel <= 1.0)
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // DI equals the min/max of the reported per-source rates
    val rates = got.map(_.getDouble(3))
    val expect = math.floor(rates.min / rates.max * 1e6 + 0.5) / 1e6
    assert(math.abs(di - expect) < 1e-9)
  }

  test("otsuThreshold: a clean bimodal distribution splits at the valley") {
    val s = spark; import s.implicits._
    // two tight modes: 100 events at ~1.00, 50 at ~9.00 → the cut must
    // land between them and recover both class means
    val rows = (0 until 100).map(i => (i.toLong,
      Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click",
      1.0 + (i % 3) * 0.01, "{}")) ++
      (0 until 50).map(i => (1000L + i,
        Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click",
        9.0 + (i % 3) * 0.01, "{}"))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.queries.ExtensionQueries.otsuThresholdOf(events).head()
    assert(r.getDouble(0) >= 1.0 && r.getDouble(0) < 9.0)
    assert(r.getLong(1) === 100L && r.getLong(2) === 50L)
    assert(math.abs(r.getDouble(3) - 1.01) < 0.01)
    assert(math.abs(r.getDouble(4) - 9.01) < 0.01)
  }

  test("annFiltered: every hit shares the probe's label; selectivity is visible") {
    val emb = Tables(spark, sfDir, "embeddings")
    val labelOf = emb.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val labelCounts = labelOf.values.groupBy(identity).map { case (k, v) => k -> v.size }
    val got = graft.queries.SimilarityQueries.annFilteredOn(emb).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (qid, lab, cid) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert(labelOf(qid) === lab && labelOf(cid) === lab) // pre-filter holds
      assert(r.getLong(5) === labelCounts(lab).toLong - 1) // candidates = label size − self
    }
    // per-probe ranks are 1..k over the filtered set only
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(4)).sorted.toSeq === (1 to rows.length))
    }
  }

  test("priceVolumeMix: the bridge identity closes exactly on the corpus") {
    val got = graft.queries.ExtensionQueries
      .priceVolumeMixOf(Tables(spark, sfDir, "orders"), Tables(spark, sfDir, "lineitem"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      // residual ≡ 0: Δrev = price + volume by construction
      assert(math.abs(r.getDouble(8)) < 0.02, s"${r.getString(0)} residual")
      // pure volume + mix = volume effect = Δrev − price effect
      val dRev = r.getDouble(4) - r.getDouble(3)
      assert(math.abs(r.getDouble(5) + r.getDouble(6) + r.getDouble(7) - dRev) < 0.05,
        s"${r.getString(0)} bridge")
    }
    // a segment growing exactly at the market rate would have mix 0;
    // the decomposition must produce BOTH signs across real segments
    val mixes = got.map(_.getDouble(7))
    assert(mixes.exists(_ > 0) && mixes.exists(_ < 0))
  }

  test("kendallRankings: identical rankers give tau 1; output is internally consistent") {
    val s = spark; import s.implicits._
    val r = graft.queries.SimilarityQueries
      .kendallRankingsOn(Tables(spark, sfDir, "documents"),
        Tables(spark, sfDir, "embeddings")).head()
    val (m, c, d, tau) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(c + d === m * (m - 1) / 2)
    assert(tau >= -1.0 && tau <= 1.0)
    val expect = math.floor((c - d).toDouble / (c + d) * 1e6 + 0.5) / 1e6
    assert(tau === expect)
  }

  test("kcenterCoreset: farthest-point picks are distinct and distances shrink") {
    val got = graft.queries.SimilarityQueries
      .kcenterCoresetOn(Tables(spark, sfDir, "embeddings")).collect()
    assert(got.length === 5)
    assert(got.head.getLong(1) === 0L && got.head.isNullAt(2)) // the seed
    val ids = got.map(_.getLong(1))
    assert(ids.distinct.length === ids.length)
    val dists = got.tail.map(_.getDouble(2))
    // greedy max-min distances are non-increasing (cover radius shrinks)
    dists.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9) }
    assert(dists.forall(d => d >= 0.0 && d <= 2.0 + 1e-9))
  }

  test("lshPlan: the S-curve table replays and the shipped 8x2 banding is chosen") {
    val got = graft.queries.DedupQueries.lshPlanOf(spark).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(got.length === 5)
    def rnd(x: Double, s: Int) = { val f = math.pow(10, s); math.floor(x * f + 0.5) / f }
    got.foreach { case (b, r, sStar, fp, fn, obj, _) =>
      assert(sStar === rnd(math.pow(1.0 / b, 1.0 / r), 4))
      assert(fp === rnd(1.0 - math.pow(1.0 - math.pow(0.5, r), b), 6))
      assert(fn === rnd(math.pow(1.0 - math.pow(0.8, r), b), 6))
      assert(obj === rnd(fp + fn, 6))
    }
    val chosen = got.filter(_._7)
    assert(chosen.length === 1)
    // at the (0.5, 0.8) operating points the balanced 4×4 split wins
    // (production 8×2 targets a lower crossover — see scaladoc)
    assert(chosen.head._1 === 4 && chosen.head._2 === 4)
    assert(chosen.head._6 === got.map(_._6).min)
  }

  test("logTemplates: numeric slots mask to one shape per event type") {
    val got = graft.queries.TextQueries
      .logTemplatesOf(Tables(spark, sfDir, "events")).collect()
    // 5 event types → 5 structural templates on this corpus
    assert(got.length === 5)
    val n = Tables(spark, sfDir, "events").count()
    assert(got.map(_.getLong(1)).sum === n)
    got.foreach { r =>
      val t = r.getString(0)
      assert(!t.exists(_.isDigit), s"unmasked digit in $t")
      assert(r.getLong(3) >= 3L) // user, amount, props slots at minimum
      // the example is a real line whose masking reproduces the template
      assert(r.getString(4).replaceAll("[0-9]+", "#") === t)
    }
  }

  test("round-9d queries are repartition-invariant") {
    val ev9 = Tables(spark, sfDir, "events").repartition(9)
    assert(ExtensionQueries.fdrBhOf(ev9).collect().toSeq ===
      ExtensionQueries.fdrBh(spark, sfDir).collect().toSeq)
    assert(ExtensionQueries.diffInDiffOf(ev9).collect().toSeq ===
      ExtensionQueries.diffInDiff(spark, sfDir).collect().toSeq)
    assert(ExtensionQueries.sloBurnOf(ev9).collect().toSeq ===
      ExtensionQueries.sloBurn(spark, sfDir).collect().toSeq)
    assert(ExtensionQueries.otsuThresholdOf(ev9).collect().toSeq ===
      ExtensionQueries.otsuThreshold(spark, sfDir).collect().toSeq)
    assert(graft.queries.ExtensionQueries.shapleyAttributionOf(ev9).collect().toSeq ===
      ExtensionQueries.shapleyAttribution(spark, sfDir).collect().toSeq)
    val li7 = Tables(spark, sfDir, "lineitem").repartition(7)
    assert(ExtensionQueries.spearmanOf(li7).collect().toSeq ===
      ExtensionQueries.spearman(spark, sfDir).collect().toSeq)
    assert(ExtensionQueries.kruskalWallisOf(li7).collect().toSeq ===
      ExtensionQueries.kruskalWallis(spark, sfDir).collect().toSeq)
    val docs5 = Tables(spark, sfDir, "documents").repartition(5)
    assert(graft.queries.TextQueries.winnowingOf(docs5).collect().toSeq ===
      graft.queries.TextQueries.winnowing(spark, sfDir).collect().toSeq)
    assert(graft.queries.TextQueries.isotonicFitOf(docs5).collect().toSeq ===
      graft.queries.TextQueries.isotonicFit(spark, sfDir).collect().toSeq)
  }

  test("wassersteinDrift: identical halves give 0; a pure shift gives the shift") {
    val s = spark; import s.implicits._
    def ev(id: Long, ts: String, v: Double) =
      (id, Timestamp.valueOf(ts), 1L, "click", v, "{}")
    // halves with identical value multisets → W1 = 0
    val same = ((0 until 50).map(i => ev(i.toLong, "2024-01-01 00:00:00", 10.0 + i % 5)) ++
      (0 until 50).map(i => ev(100L + i, "2024-01-31 00:00:00", 10.0 + i % 5)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r0 = graft.queries.ExtensionQueries.wassersteinDriftOf(same).head()
    assert(r0.getLong(0) === 50L && r0.getLong(1) === 50L)
    assert(r0.getDouble(2) === 0.0)
    // second half shifted by exactly +2.50 → W1 = 2.50 (translation)
    val shifted = ((0 until 50).map(i => ev(i.toLong, "2024-01-01 00:00:00", 10.0 + i % 5)) ++
      (0 until 50).map(i => ev(100L + i, "2024-01-31 00:00:00", 12.5 + i % 5)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r1 = graft.queries.ExtensionQueries.wassersteinDriftOf(shifted).head()
    assert(math.abs(r1.getDouble(2) - 2.5) < 1e-9)
  }

  test("dppPrune: equals the unpartitioned HAVING-filtered aggregation") {
    val got = graft.queries.BatchQueries.dppPrune(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val events = Tables(spark, sfDir, "events")
    val thresh = events.count() / 5
    val expect = events.groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"),
        graft.functions.Det.moneySum(
          org.apache.spark.sql.functions.col("value")).as("total_value"))
      .filter(org.apache.spark.sql.functions.col("n_events") >= thresh)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === expect.toSeq)
    assert(got.nonEmpty && got.length < 5) // the filter actually prunes
  }
}
