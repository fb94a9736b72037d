package graft

import org.apache.spark.sql.functions._
import graft.queries.{BatchQueries, ExtensionQueries, TextQueries}

/** Round-7d operators: TPC-H Q5-shape star join, market-basket
  * frequent pairs, leave-one-out target encoding, and the epoch
  * reshuffle/sharding step — each pinned by an independent plain-Scala
  * replay or a structural property the oracle hash can't see. */
class Round7dSpec extends SparkSpec {
  import spark.implicits._

  test("star join broadcasts the dims and keeps the nationkey residual out of the scan") {
    val df = BatchQueries.starJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "nation/region should ride a broadcast, not a shuffle")
    assert(!plan.contains("CartesianProduct"), "no cartesian in a star join")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(2) > 0))
    // revenue-desc ordering with name tiebreak
    val revs = rows.map(r => (-r.getDouble(2), r.getString(0))).toSeq
    assert(revs == revs.sorted)
  }

  test("frequent pairs equal a plain-Scala basket replay (support, lift included)") {
    val li = Tables(spark, sfDir, "lineitem")
    val items = li.select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = items.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val nBaskets = baskets.size
    val itemCnt = items.groupBy(_._2).map { case (p, xs) => p -> xs.size }
    val pairCnt = scala.collection.mutable.Map[(Long, Long), Int]()
    baskets.foreach { b =>
      val s = b.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size)
        pairCnt((s(i), s(j))) = pairCnt.getOrElse((s(i), s(j)), 0) + 1
    }
    val expected = pairCnt.toSeq.filter(_._2 >= 2)
      .sortBy { case ((p1, p2), c) => (-c, p1, p2) }.take(20)
      .map { case ((p1, p2), c) =>
        (p1, p2, c.toLong,
          BigDecimal(c.toDouble / nBaskets).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble,
          BigDecimal(c.toDouble * nBaskets / (itemCnt(p1).toDouble * itemCnt(p2)))
            .setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
      }
    val got = ExtensionQueries.frequentPairsOf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == expected.length,
      s"row count ${got.length} vs ${expected.length}")
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      assert(math.abs(g._4 - e._4) < 2e-6 && math.abs(g._5 - e._5) < 2e-4,
        s"support/lift drift: $g vs $e")
    }
  }

  test("per-row LOO target encoding matches a plain-Scala replay and the no-leakage identity") {
    val oc = Seq(
      (1L, "A", 10.00), (2L, "A", 20.00), (3L, "A", 31.50),
      (4L, "B", 5.25), (5L, "B", 7.75),
      (6L, "C", 99.99) // singleton: no out-of-row evidence -> null
    ).toDF("o_orderkey", "c_mktsegment", "o_totalprice")
    val rows = ExtensionQueries.targetEncodeRows(oc).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    val byName = Map(
      1L -> Some((2000L + 3150L) / 2.0 / 100), 2L -> Some((1000L + 3150L) / 2.0 / 100),
      3L -> Some((1000L + 2000L) / 2.0 / 100), 4L -> Some(7.75), 5L -> Some(5.25),
      6L -> None)
    assert(rows == byName, s"$rows")
    // mean of LOO over a group == group mean (the identity the agg emits)
    val looA = Seq(rows(1L).get, rows(2L).get, rows(3L).get)
    assert(math.abs(looA.sum / 3 - (10.00 + 20.00 + 31.50) / 3) < 1e-9)
  }

  test("epoch shuffle is a permutation per epoch, balanced, and epochs differ") {
    val docs = Tables(spark, sfDir, "documents")
    val total = docs.count()
    val chars = docs.agg(sum("n_chars")).head.getLong(0)
    val out = TextQueries.epochShuffleOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val epochs = out.groupBy(_._1)
    assert(epochs.keySet == Set(0L, 1L, 2L))
    epochs.foreach { case (e, rs) =>
      assert(rs.map(_._3).sum == total, s"epoch $e must cover every doc once")
      assert(rs.map(_._4).sum == chars, s"epoch $e must cover every char once")
      // statistical balance: no shard is pathologically loaded
      assert(rs.map(_._3).max <= total / 2, s"epoch $e shard balance")
    }
    // different epochs induce different shard assignments: the per-shard
    // checksums (sum of permutation keys) cannot all coincide
    val sums = epochs.map { case (_, rs) => rs.sortBy(_._2).map(_._5).toSeq }
    assert(sums.toSet.size == 3, "epoch permutations must differ")
    // repartition invariance: assignment is per-row arithmetic
    val re = TextQueries.epochShuffleOf(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(re.sorted.toSeq == out.sorted.toSeq)
  }

  test("equi-depth histogram: counts balance, boundaries partition, ties never straddle") {
    val orders = Tables(spark, sfDir, "orders")
    val cents = orders.select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(_.getLong(0))
    val out = ExtensionQueries.equidepthHistOf(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._2).sum == cents.length)
    // plain-Scala replay: whole distinct value -> bucket of its first row
    val hist = cents.groupBy(identity).toSeq.map { case (v, xs) => (v, xs.size.toLong) }
      .sortBy(_._1)
    val n = cents.length.toLong
    var cum = 0L
    val byBucket = hist.map { case (v, t) =>
      val b = math.min(7L, cum * 8 / n); cum += t; (b, v, t)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, vs) =>
      (b, vs.map(_._3).sum, vs.map(_._2).min / 100.0, vs.map(_._2).max / 100.0)
    }
    assert(out.toSeq == byBucket, s"${out.toSeq.take(2)} vs ${byBucket.take(2)}")
    // heavy-tie fixture: a value spanning a boundary stays in one bucket
    val tied = Seq.fill(40)(10.00) ++ Seq.fill(20)(20.00) ++ Seq.fill(4)(30.00)
    val tdf = tied.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("o_orderkey", "o_totalprice")
    val tout = ExtensionQueries.equidepthHistOf(tdf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // 64 rows, k=8 -> target 8/bucket, but the 40-row tie owns bucket 0
    assert(tout.map(t => (t._1, t._2)).toSeq == Seq((0L, 40L), (5L, 20L), (7L, 4L)))
  }

  test("mann-whitney U and z match a plain-Scala tie-averaged rank replay") {
    val ev = Seq(
      ("click", 1.00), ("click", 2.00), ("click", 2.00), ("click", 5.00),
      ("purchase", 2.00), ("purchase", 3.00), ("purchase", 4.00),
      ("view", 99.0) // must be excluded
    ).map { case (t, v) => (t, v) }.toDF("event_type", "value")
    val out = ExtensionQueries.mannWhitneyOf(ev, "click", "purchase").collect().head
    // plain replay: tie-averaged ranks over the combined sample
    val xs = Seq((1, 100L), (1, 200L), (1, 200L), (1, 500L),
      (2, 200L), (2, 300L), (2, 400L))
    val sorted = xs.sortBy(_._2)
    val rankOf = sorted.map(_._2).zipWithIndex.groupBy(_._1)
      .map { case (v, ps) => v -> ps.map(_._2 + 1).sum.toDouble / ps.size }
    val r1 = xs.filter(_._1 == 1).map(x => rankOf(x._2)).sum
    val (n1, n2) = (4.0, 3.0)
    val u1 = r1 - n1 * (n1 + 1) / 2
    val n = n1 + n2
    val ties = sorted.groupBy(_._2).values.map(_.size.toDouble)
      .map(t => t * t * t - t).sum
    val z = (u1 - n1 * n2 / 2) /
      math.sqrt(n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1))))
    assert(out.getLong(0) == 4 && out.getLong(1) == 3)
    assert(out.getDouble(2) == u1, s"u1 ${out.getDouble(2)} vs $u1")
    assert(math.abs(out.getDouble(3) - z) < 1e-6, s"z ${out.getDouble(3)} vs $z")
  }

  test("association rules: confidence and interest replay from the basket counts") {
    val li = Tables(spark, sfDir, "lineitem")
    val items = li.select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nBaskets = items.map(_._1).distinct.length
    val itemCnt = items.groupBy(_._2).map { case (p, xs) => p -> xs.size }
    val pairCnt = scala.collection.mutable.Map[(Long, Long), Int]()
    items.groupBy(_._1).values.foreach { xs =>
      val s = xs.map(_._2).toSet.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size)
        pairCnt((s(i), s(j))) = pairCnt.getOrElse((s(i), s(j)), 0) + 1
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    val rules = pairCnt.toSeq.filter(_._2 >= 2).flatMap { case ((p1, p2), c) =>
      Seq((p1, p2, c), (p2, p1, c)) }
      .map { case (a, b, c) =>
        (a, b, c.toLong, r6(c.toDouble / itemCnt(a)),
          r6(c.toDouble / itemCnt(a) - itemCnt(b).toDouble / nBaskets))
      }
      .sortBy { case (a, b, c, conf, _) => (-conf, -c, a, b) }.take(20)
    val got = ExtensionQueries.assocRulesOf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == rules.length)
    got.zip(rules).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      assert(math.abs(g._4 - e._4) < 2e-6 && math.abs(g._5 - e._5) < 2e-6, s"$g vs $e")
    }
  }

  test("cv folds: complement stats equal a direct recompute, folds partition the corpus") {
    val docs = Tables(spark, sfDir, "documents")
    val byFold = docs.selectExpr(s"${TextQueries.CvFoldExpr} AS fold", "n_chars")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val out = TextQueries.cvFoldsOf(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.map(_._2).sum == byFold.length, "folds partition the corpus")
    val total = byFold.map(_._2).sum
    out.foreach { case (f, nVal, nTrain, valMean, trainMean) =>
      val inFold = byFold.filter(_._1 == f)
      assert(nVal == inFold.length && nTrain == byFold.length - inFold.length)
      val s = inFold.map(_._2).sum
      assert(math.abs(valMean - s.toDouble / nVal) < 1e-4)
      assert(math.abs(trainMean - (total - s).toDouble / nTrain) < 1e-4,
        "train mean must equal the complement recomputed directly")
    }
    // fold assignment is independent of the 80/10/10 split: every fold
    // must contain docs from more than one split bucket
    val cross = docs.selectExpr(s"${TextQueries.CvFoldExpr} AS fold",
        "CAST(pmod(pmod(pmod(doc_id, 4294967296) * 40503, 65536) * 65536" +
          " + pmod(doc_id, 4294967296) * 31153, 4294967296) % 100 < 80 AS INT) AS tr")
      .groupBy("fold").agg(countDistinct("tr").as("k")).collect()
    assert(cross.forall(_.getLong(1) == 2))
  }

  test("decile lift: deciles from the logit histogram, lift consistent with dup rates") {
    val docs = Tables(spark, sfDir, "documents")
    val out = TextQueries.decileLiftOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val n = docs.count()
    assert(out.map(_._2).sum == n, "deciles partition the corpus")
    // logit ranges are disjoint and increasing; a logit value never straddles
    out.sliding(2).foreach { case Array(a, b) => assert(a._5 < b._4); case _ => }
    // lift recomputes from the emitted exact counts
    val dups = out.map(_._3).sum
    out.foreach { case (_, nd, dd, _, _, rate, lift) =>
      assert(math.abs(lift - (dd.toDouble * n) / (nd.toDouble * dups)) < 1e-4)
      assert(math.abs(rate - dd.toDouble / nd) < 1e-4)
    }
    // equal depth within tie spill: no decile smaller than half the target
    assert(out.forall(_._2 >= n / 10 / 2))
  }

  test("funnel time: histogram quantiles equal a plain-Scala sorted-gaps replay") {
    import java.sql.Timestamp
    def e(id: Long, u: Long, typ: String, sec: Int) =
      (id, new Timestamp(1704067200000L + sec * 1000L), u, typ, 1.0)
    // u1 converts fast; u2 slow; u3 never clicks; u4 views only
    val ev = Seq(
      e(1, 1, "signup", 0), e(2, 1, "view", 10), e(3, 1, "click", 20), e(4, 1, "purchase", 30),
      e(5, 2, "signup", 0), e(6, 2, "view", 100), e(7, 2, "click", 300), e(8, 2, "purchase", 1000),
      e(9, 3, "signup", 0), e(10, 3, "view", 50),
      e(11, 4, "signup", 0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = ExtensionQueries.funnelTimeOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    def q(gaps: Seq[Long], num: Int, den: Int): Long = {
      val s = gaps.sorted; val n = s.length
      s.find(g => s.count(_ <= g) * den >= n.toLong * num).get
    }
    val view = Seq(10L, 100L, 50L); val click = Seq(10L, 200L); val buy = Seq(10L, 700L)
    val expected = Seq(
      ("2_view", 3L, q(view, 1, 2), q(view, 9, 10), view.max),
      ("3_click", 2L, q(click, 1, 2), q(click, 9, 10), click.max),
      ("4_purchase", 2L, q(buy, 1, 2), q(buy, 9, 10), buy.max))
    assert(out == expected, s"$out vs $expected")
  }

  test("share shift: shares sum to 1 per month and rank deltas telescope") {
    val out = ExtensionQueries.shareShiftOf(Tables(spark, sfDir, "orders")).collect()
      .map(r => (r.getDate(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getInt(4), if (r.isNullAt(5)) None else Some(r.getInt(5))))
    val byMonth = out.groupBy(_._1)
    byMonth.foreach { case (m, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4, s"shares must sum to 1 in $m")
      assert(rs.map(_._5).sorted.toSeq == (1 to rs.length), s"ranks must be 1..k in $m")
    }
    // rank_delta = rank at the priority's PREVIOUS APPEARANCE minus the
    // current rank (lag semantics: gaps skip to the last month present)
    out.groupBy(_._2).foreach { case (p, rs) =>
      val seq = rs.sortBy(_._1.getTime)
      seq.zipWithIndex.foreach { case ((m, _, _, _, rk, delta), i) =>
        val prev = if (i == 0) None else Some(seq(i - 1)._5)
        assert(delta == prev.map(_ - rk), s"delta mismatch at ($m, $p)")
      }
    }
  }

  test("argmin join-back picks the true cheapest supplier with deterministic tie-break") {
    val li = Seq(
      // part 1: supp 9 cheapest (unit 2.00); supp 3 at 3.00
      (1L, 9L, 2.0, 4.00), (1L, 3L, 1.0, 3.00),
      // part 2: tie at unit 5.00 between supp 7 and supp 2 -> pick 2
      (2L, 7L, 2.0, 10.00), (2L, 2L, 1.0, 5.00),
      // part 3: single offer
      (3L, 5L, 4.0, 14.00)
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val out = ExtensionQueries.argminJoinOf(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 9L, 2.0, 1L), (2L, 2L, 5.0, 2L), (3L, 5L, 3.5, 1L)), s"$out")
    // corpus-level: every best price really is the per-part minimum
    val big = Tables(spark, sfDir, "lineitem")
    val got = ExtensionQueries.argminJoinOf(big).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val mins = big.selectExpr("l_partkey",
        "(CAST(round(l_extendedprice * 100) AS BIGINT) * 1000) div CAST(l_quantity AS BIGINT) AS mc")
      .groupBy("l_partkey").agg(min("mc").as("mc")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 100000.0)).toMap
    assert(got == mins)
  }

  test("join forecast equals the actual self-join cardinalities it predicts") {
    val li = Tables(spark, sfDir, "lineitem")
    val out = ExtensionQueries.joinForecastOf(li).collect().head
    val items = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val actualSelf = items.alias("a")
      .join(items.alias("b"), col("a.o") === col("b.o")).count()
    val actualPairs = items.alias("a").join(items.alias("b"),
      col("a.o") === col("b.o") && col("a.p") < col("b.p")).count()
    assert(out.getLong(2) == actualSelf, "selfjoin_rows must equal the real fan-out")
    assert(out.getLong(3) == actualPairs, "pair_rows must equal the real pair yield")
    assert(out.getLong(0) > 0 && out.getDouble(5) > 0)
  }
}
