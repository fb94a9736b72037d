package graft

import java.sql.Timestamp

import graft.queries.BatchQueries

/** Round-9c additions: the TPC-H classics (Q3 shipping-priority
  * backlog, Q5 local-supplier volume, Q6 forecast revenue change)
  * re-expressed over this star schema. Fixtures pin the join
  * topology, the filter edges, and the exact integer-cents revenue
  * math. */
class Round9cSpec extends SparkSpec {

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

  test("tpchQ3: segment + date filters gate the join; revenue sums exact cents") {
    val cust = customerDf(Seq(
      (1L, "a", 0, 0.0, "BUILDING"),
      (2L, "b", 0, 0.0, "MACHINERY"))) // wrong segment — excluded
    val ord = ordersDf(Seq(
      (10L, 1L, "O", 0.0, "1998-06-01", "1-URGENT"),   // before cut — kept
      (11L, 1L, "O", 0.0, "1998-06-20", "2-HIGH"),     // after cut — dropped
      (12L, 2L, "O", 0.0, "1998-06-01", "3-MEDIUM")))  // wrong segment
    val li = lineitemDf(Seq(
      (10L, 1L, 1L, 1.0, 100.0, 0.10, "1998-07-01"),   // ships after cut — kept
      (10L, 2L, 1L, 1.0, 50.0, 0.00, "1998-07-02"),    // second line, same order
      (10L, 3L, 1L, 1.0, 999.0, 0.00, "1998-05-01"),   // shipped already — dropped
      (11L, 1L, 1L, 1.0, 100.0, 0.00, "1998-07-01"),
      (12L, 1L, 1L, 1.0, 100.0, 0.00, "1998-07-01")))
    val got = BatchQueries.tpchQ3Of(cust, ord, li).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === 10L)
    // 100·(1−0.10) + 50·(1−0) = 90 + 50 = 140 exactly
    assert(r.getDouble(1) === 140.0)
    assert(r.getString(3) === "1-URGENT")
  }

  test("tpchQ3: top-10 heap keeps the highest-revenue orders with stable ties") {
    val cust = customerDf(Seq((1L, "a", 0, 0.0, "BUILDING")))
    val ord = ordersDf((1L to 12L).map(k =>
      (k, 1L, "O", 0.0, "1998-01-01", "5-LOW")))
    val li = lineitemDf((1L to 12L).map(k =>
      (k, 1L, 1L, 1.0, 100.0 * k, 0.0, "1998-07-01")))
    val got = BatchQueries.tpchQ3Of(cust, ord, li).collect()
    assert(got.length === 10)
    // descending revenue: orders 12..3 survive; 1200.0 first
    assert(got.head.getDouble(1) === 1200.0)
    assert(got.map(_.getLong(0)).toSeq === (12L to 3L by -1L).toSeq)
  }

  test("tpchQ5: only same-nation customer/supplier pairs in the region count") {
    val s = spark; import s.implicits._
    val nation = Seq((0, "N0", 0), (1, "N1", 0), (2, "N2", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((0, "ASIA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
    val supp = Seq((1L, "s1", 0, 0.0), (2L, "s2", 1, 0.0), (3L, "s3", 2, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val cust = customerDf(Seq(
      (1L, "c1", 0, 0.0, "BUILDING"),   // nation 0 (ASIA)
      (2L, "c2", 2, 0.0, "BUILDING")))  // nation 2 (EUROPE)
    val ord = ordersDf(Seq(
      (10L, 1L, "O", 0.0, "1996-03-01", "1-URGENT"),
      (11L, 2L, "O", 0.0, "1996-03-01", "1-URGENT"),
      (12L, 1L, "O", 0.0, "1995-03-01", "1-URGENT"))) // out of year window
    val li = lineitemDf(Seq(
      (10L, 1L, 1L, 1.0, 200.0, 0.05, "1996-04-01"), // cust n0 + supp n0 → counts
      (10L, 1L, 2L, 1.0, 100.0, 0.00, "1996-04-01"), // supp n1 ≠ cust n0 → excluded
      (11L, 1L, 3L, 1.0, 100.0, 0.00, "1996-04-01"), // nation 2 = EUROPE → excluded
      (12L, 1L, 1L, 1.0, 100.0, 0.00, "1996-04-01"))) // 1995 order → excluded
    val got = BatchQueries.tpchQ5Of(cust, ord, li, supp, nation, region).collect()
    assert(got.length === 1)
    assert(got.head.getString(0) === "N0")
    assert(got.head.getDouble(1) === 190.0) // 200·0.95 exact
  }

  test("olsTrend: exact line recovers slope/intercept with r2 = 1") {
    val s = spark; import s.implicits._
    val nation = Seq((0, "N0", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val cust = customerDf(Seq((1L, "c", 0, 0.0, "BUILDING")))
    // monthly revenue exactly 100 + 10·x dollars for x = 0,1,2,3
    val ord = ordersDf(Seq(
      (1L, 1L, "O", 100.0, "1996-01-15", "1-URGENT"),
      (2L, 1L, "O", 110.0, "1996-02-15", "1-URGENT"),
      (3L, 1L, "O", 120.0, "1996-03-15", "1-URGENT"),
      (4L, 1L, "O", 130.0, "1996-04-15", "1-URGENT")))
    val r = graft.queries.ExtensionQueries.olsTrendOf(ord, cust, nation).head()
    assert(r.getString(0) === "N0")
    assert(r.getLong(1) === 4L)
    assert(r.getDouble(2) === 10.0)
    assert(r.getDouble(3) === 100.0)
    assert(r.getDouble(4) === 1.0)
  }

  test("fuzzyJoin: length band is lossless for the distance cut") {
    val s = spark; import s.implicits._
    val part = Seq(
      (1L, "red gear", "B", "T", 1, 1.0),
      (2L, "red bear", "B", "T", 1, 1.0),   // dist 1 from red gear
      (3L, "red gears", "B", "T", 1, 1.0),  // dist 1 from red gear, 2 from red bear
      (4L, "blue widget", "B", "T", 1, 1.0) // far from everything
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val got = graft.queries.TextQueries.fuzzyJoinOf(part).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getBoolean(3)))
    // same_block audits fuzzyMatch's last-word blocking: bear/gear and
    // gear/gears pairs differ in the noun → the blocked join misses them
    assert(got.toSet === Set(
      ("red bear", "red gear", 1, false),
      ("red bear", "red gears", 2, false),
      ("red gear", "red gears", 1, false)))
  }

  test("jsDivergence: identical sources score 0, disjoint sources score 1") {
    val s = spark; import s.implicits._
    def docs(rows: Seq[(Long, String, String)]) =
      rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // two sources with identical token distributions → JSD 0 for both
    val same = docs(Seq((1L, "a b c", "s1"), (2L, "a b c", "s2")))
    val gotSame = graft.queries.TextQueries.jsDivergenceOf(same).collect()
    assert(gotSame.forall(_.getDouble(1) === 0.0))
    // disjoint vocabularies → JSD 1 (log2 bound)
    val disj = docs(Seq((1L, "a a b", "s1"), (2L, "c d d", "s2")))
    val gotDisj = graft.queries.TextQueries.jsDivergenceOf(disj).collect()
    assert(gotDisj.forall(_.getDouble(1) === 1.0))
  }

  test("triangleCount: one triangle plus a pendant edge") {
    val s = spark; import s.implicits._
    // directed knn-ish edges; undirected closure: {1-2, 2-3, 1-3, 3-4}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (2L, 1L))
      .toDF("src", "dst")
    val r = graft.queries.SimilarityQueries.triangleCountOnEdges(edges).head()
    assert(r.getLong(0) === 4L)  // nodes
    assert(r.getLong(1) === 4L)  // undirected edges
    // degrees: 1→2, 2→2, 3→3, 4→1 ⇒ wedges 1+1+3+0 = 5
    assert(r.getLong(2) === 5L)
    assert(r.getLong(3) === 1L)  // one triangle
    assert(r.getDouble(4) === 0.6) // 3·1/5
  }

  test("cdcDiff: added, removed, changed, and unchanged-dropped") {
    val ord = ordersDf(Seq(
      (1L, 1L, "O", 0.0, "1997-06-01", "1-URGENT"), // s1 only → removed
      (2L, 2L, "O", 0.0, "1997-06-01", "2-HIGH"),   // s1 …
      (3L, 2L, "O", 0.0, "1999-06-01", "3-MEDIUM"), // … changed in s2
      (4L, 3L, "O", 0.0, "1999-06-01", "4-LOW"),    // s2 only → added
      (5L, 4L, "O", 0.0, "1997-06-01", "5-LOW"),    // same in both → dropped
      (6L, 4L, "O", 0.0, "1999-06-01", "5-LOW"),
      (7L, 5L, "O", 0.0, "1995-06-01", "1-URGENT"))) // outside both windows
    val got = graft.queries.ExtensionQueries.cdcDiffOf(ord).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3))))
    assert(got.toSeq === Seq(
      (3L, "added", None, Some("4-LOW")),
      (2L, "changed", Some("2-HIGH"), Some("3-MEDIUM")),
      (1L, "removed", Some("1-URGENT"), None)))
  }

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("weightedSample: priorities replay the hash and favor heavy docs") {
    val docs = docsDf((1L to 30L).map(i => (i, "x" * (10 * i.toInt), "s")))
    val got = graft.queries.TextQueries.weightedSampleOf(docs).collect()
    assert(got.length === 20)
    // priorities are negative, sorted descending, and exactly replayable
    def bucket(id: Long): Long =
      ((((id % 4294967296L) * 49842) % 65536) * 65536
        + (id % 4294967296L) * 44605) % 4294967296L
    val expect = (1L to 30L).map { id =>
      val u = (bucket(id) + 0.5) / 4294967296.0
      val w = 10.0 * id
      (id, math.floor(math.log(u) / w * 1e12 + 0.5) / 1e12)
    }.sortBy { case (id, p) => (-p, id) }.take(20)
    assert(got.map(r => (r.getLong(0), r.getDouble(3))).toSeq === expect)
  }

  test("goodTuring: r* follows (r+1)·N_{r+1}/N_r on a tiny corpus") {
    // counts: a→3, b→2, c→2, d→1, e→1, f→1  ⇒ N1=3, N2=2, N3=1, N=10
    val docs = docsDf(Seq((1L, "a a a b b c c d e f", "s")))
    val got = graft.queries.TextQueries.goodTuringOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getDouble(4))).toSeq
    // r=1: r* = 2·N2/N1 = 4/3; r=2: r* = 3·N3/N2 = 1.5; r=3: no N4 → null
    assert(got.map(t => (t._1, t._2)) === Seq((1L, 3L), (2L, 2L), (3L, 1L)))
    assert(got(0)._3 === Some(1.333333))
    assert(got(1)._3 === Some(1.5))
    assert(got(2)._3 === None)
    assert(got.forall(_._4 === 0.3)) // p_unseen = N1/N = 3/10
  }

  test("quantileNormalize: profile is the cross-source rank mean; tail cut") {
    val docs = docsDf(Seq(
      (1L, "x" * 10, "sA"), (2L, "x" * 30, "sA"), (3L, "x" * 50, "sA"),
      (4L, "x" * 20, "sB"), (5L, "x" * 40, "sB"))) // sB has 2 docs → min_n = 2
    val got = graft.queries.TextQueries.quantileNormalizeOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3), r.getDouble(4)))
    // rank 1: mean(10, 20) = 15; rank 2: mean(30, 40) = 35; rank 3 dropped
    assert(got.toSet === Set(
      (1L, "sA", 1, 15.0), (2L, "sA", 2, 35.0),
      (4L, "sB", 1, 15.0), (5L, "sB", 2, 35.0)))
  }

  test("assortativity: star graph is perfectly disassortative") {
    val s = spark; import s.implicits._
    // star: hub 1 — leaves 2,3,4; degrees: hub 3, leaves 1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = graft.queries.SimilarityQueries.assortativityOnEdges(edges).head()
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === -1.0)
  }

  test("tpchQ18: only orders above the quantity threshold survive") {
    val cust = customerDf(Seq((1L, "c1", 0, 0.0, "BUILDING")))
    val ord = ordersDf(Seq(
      (10L, 1L, "O", 500.0, "1996-01-01", "1-URGENT"),
      (11L, 1L, "O", 900.0, "1996-01-01", "1-URGENT")))
    val li = lineitemDf(Seq(
      (10L, 1L, 1L, 150.0, 1.0, 0.0, "1996-02-01"),
      (10L, 2L, 1L, 60.0, 1.0, 0.0, "1996-02-01"),  // 210 > 200 → kept
      (11L, 1L, 1L, 200.0, 1.0, 0.0, "1996-02-01"))) // exactly 200 → dropped
    val got = graft.queries.BatchQueries.tpchQ18Of(cust, ord, li).collect()
    assert(got.length === 1)
    assert(got.head.getLong(2) === 10L)
    assert(got.head.getLong(5) === 210L)
  }

  test("dirichletQl: longer matching doc outranks when tf dominates; scores replay") {
    // top-5-DF query terms on this corpus: every distinct term (all df 2)
    val docs = docsDf(Seq(
      (1L, "a a a b c", "s"),
      (2L, "a b c d e", "s"),
      (3L, "d e d e d", "s")))
    val got = graft.queries.TextQueries.dirichletQlOf(docs).collect()
    assert(got.length === 3)
    // every doc scored (even partial term coverage); ranks are 1..3
    assert(got.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    // doc 2 contains all 5 query terms → n_terms = 5
    val byDoc = got.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byDoc(2L) === 5L)
    // plain-Scala replay of the decomposed score for doc 2
    val mu = 2000.0; val cTot = 15.0
    val cf = Map("a" -> 4L, "b" -> 2L, "c" -> 2L, "d" -> 4L, "e" -> 3L)
    val c0 = cf.values.map(c => math.log(mu * c / cTot)).sum
    val bonus = cf.map { case (_, c) =>
      math.log(1 + mu * c / cTot) - math.log(mu * c / cTot) }.sum
    val expect = math.floor((c0 + bonus - 5 * math.log(5 + mu)) * 1e6 + 0.5) / 1e6
    val s2 = got.find(_.getLong(1) == 2L).get.getDouble(3)
    assert(s2 === expect)
  }

  test("mutualInfo: independent columns give 0, determined columns give NMI 1") {
    val s = spark; import s.implicits._
    def d(rows: Seq[(Long, String, String)]) =
      rows.map { case (id, l, src) => (id, "t", l, src, 1L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // independent 2×2 uniform
    val ind = d(Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "fr", "a"), (4L, "fr", "b")))
    val r1 = graft.queries.TextQueries.mutualInfoOf(ind).head()
    assert(r1.getDouble(0) === 0.0)
    assert(r1.getDouble(1) === 1.0) // H(lang) = 1 bit
    // source determines lang exactly
    val det = d(Seq((1L, "en", "a"), (2L, "en", "a"), (3L, "fr", "b"), (4L, "fr", "b")))
    val r2 = graft.queries.TextQueries.mutualInfoOf(det).head()
    assert(r2.getDouble(0) === 1.0)
    assert(r2.getDouble(3) === 1.0)
  }

  test("sssp: hop distances on a path graph with an island") {
    val s = spark; import s.implicits._
    // path 1-2-3-4-5-6-7 plus island {10,11}: from seed 1,
    // dists 0,1,2,3,4 then 5,6 unreached within 4 rounds; island unreached
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (10L, 11L)).toDF("src", "dst")
    val got = graft.queries.SimilarityQueries.ssspOnEdges(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 1L), (999L, 4L)))
  }

  test("calibration: bins partition docs and frac_pos is exact") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "aa bb cc", "en"), (2L, "dd ee", "en"), (3L, "aa bb cc", "fr"),
      (4L, "zz yy xx ww", "fr"), (5L, "qq", "en"))
      .map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.TextQueries.calibrationOf(docs).collect()
    assert(got.map(_.getLong(1)).sum === 5L) // every doc in exactly one bin
    got.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) <= 9)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("tpchQ4: EXISTS counts each order once regardless of late-line count") {
    val ord = ordersDf(Seq(
      (1L, 1L, "O", 0.0, "1996-08-01", "1-URGENT"),  // two late lines → counted once
      (2L, 1L, "O", 0.0, "1996-08-01", "1-URGENT"),  // on-time only → dropped
      (3L, 1L, "O", 0.0, "1996-08-01", "2-HIGH"),    // one late line → counted
      (4L, 1L, "O", 0.0, "1995-08-01", "1-URGENT"))) // outside quarter
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 1.0, 0.0, "1996-12-01"),
      (1L, 2L, 1L, 1.0, 1.0, 0.0, "1996-12-15"),
      (2L, 1L, 1L, 1.0, 1.0, 0.0, "1996-08-15"),
      (3L, 1L, 1L, 1.0, 1.0, 0.0, "1996-11-01"),
      (4L, 1L, 1L, 1.0, 1.0, 0.0, "1995-12-01")))
    val got = graft.queries.BatchQueries.tpchQ4Of(ord, li).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("1-URGENT", 1L), ("2-HIGH", 1L)))
  }

  test("amsF2: estimator is exact on replay and unbiased-ish on a skewed stream") {
    val s = spark; import s.implicits._
    val ev = (1L to 300L).map(i => (i, new Timestamp(0L), i % 10, "e", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.queries.StreamQueries.amsF2Of(ev).head()
    // 10 users × 30 events each → F2 = 10 · 30² = 9000
    assert(r.getLong(0) === 9000L)
    assert(r.getLong(2) === 16L)
    // AMS mean-of-16 should land within a few × of truth on this stream
    assert(r.getDouble(1) > 0.0)
    assert(math.abs(r.getDouble(3)) < 300.0)
  }

  test("kcore: a clique survives peeling, pendants fall off round 1") {
    val s = spark; import s.implicits._
    // K4 clique {1,2,3,4} + pendant chain 4-5, 5-6
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = graft.queries.SimilarityQueries.kcoreOnEdges(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.head === ((0L, 6L, 8L)))
    // round 1: node 6 (deg 1) and 5 (deg 2) out → clique + edge 4-5?
    // degrees on full graph: 5 has deg 2 < 3, 6 has deg 1 < 3 → both cut,
    // edge 4-5 and 5-6 gone; K4 remains
    assert(got(1) === ((1L, 4L, 6L)))
    // stable thereafter
    assert(got.last === ((6L, 4L, 6L)))
  }

  test("lDiversity: a k-anonymous class with one sensitive value is 1-diverse") {
    val cust = customerDf(Seq(
      (1L, "a", 0, 100.0, "BUILDING"),  // class A, two members
      (2L, "b", 0, 200.0, "BUILDING"),
      (3L, "c", 1, 100.0, "MACHINERY"))) // class B, one member
    val ord = ordersDf(Seq(
      (1L, 1L, "O", 0.0, "1996-01-01", "1-URGENT"),
      (2L, 2L, "O", 0.0, "1996-01-01", "1-URGENT"), // class A: only 1-URGENT → l=1
      (3L, 3L, "O", 0.0, "1996-01-01", "2-HIGH"),
      (4L, 3L, "O", 0.0, "1996-01-01", "3-MEDIUM"))) // class B: l=2
    val r = graft.queries.ExtensionQueries.lDiversityOf(cust, ord).head()
    assert(r.getLong(0) === 2L)       // two classes
    assert(r.getLong(1) === 1L)       // min l — the k-anonymous-but-exposed class
    assert(r.getLong(2) === 1L)       // classes with l < 2
    assert(r.getLong(3) === 2L)       // classes with l < 3
  }

  test("twap: duration weighting differs from the event-count mean") {
    val s = spark; import s.implicits._
    // value 10 held 3s, value 20 held 1s, value 99 terminal (weight 0)
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a", 10.0),
      (2L, "2024-01-01 00:00:03", 1L, "a", 20.0),
      (3L, "2024-01-01 00:00:04", 1L, "a", 99.0))
      .map { case (id, t, u, ty, v) => (id, Timestamp.valueOf(t), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.queries.ExtensionQueries.twapOf(ev).head()
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 4000000L) // 4s held in micros
    assert(r.getDouble(3) === 12.5)   // (10·3 + 20·1)/4
    assert(r.getDouble(4) === 43.0)   // (10+20+99)/3
  }

  test("modularity: two clean cliques score high, one merged blob scores 0") {
    val s = spark; import s.implicits._
    // two triangles, no cross edges
    val mut = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("d1", "d2")
    val cl2 = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("vec_id", "cluster_id")
    val r2 = graft.queries.SimilarityQueries.modularityOf(mut, cl2).head()
    assert(r2.getLong(0) === 2L)
    assert(r2.getLong(2) === 6L) // all edges within
    assert(r2.getDouble(3) === 0.5) // 1 − 2·(6/12)²
    // everything in ONE cluster → Q = 1 − 1 = 0
    val cl1 = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(v => (v, 1L)).toDF("vec_id", "cluster_id")
    val r1 = graft.queries.SimilarityQueries.modularityOf(mut, cl1).head()
    assert(r1.getDouble(3) === 0.0)
  }

  test("prAuc: perfect ranking gives AP 1, inverted ranking matches closed form") {
    val s = spark; import s.implicits._
    def docs(rows: Seq[(Long, String, String)]) =
      rows.map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // rocHistFrom scores by hashed logit; instead drive prAucOf's sweep via
    // a hand-made histogram through the same code path: use docs whose
    // scores we don't control, and assert only the invariants
    val d = docs(Seq((1L, "aa bb", "en"), (2L, "cc dd", "fr"),
      (3L, "aa bb", "en"), (4L, "ee ff gg", "fr")))
    val r = graft.queries.TextQueries.prAucOf(d).head()
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getDouble(3) === 0.5)
    val ap = r.getDouble(0)
    assert(ap >= 0.0 && ap <= 1.0)
    // AP is never below prevalence² nor above 1 for a 2/2 split sweep
    assert(ap >= 0.25)
  }

  test("tpchQ14: promo share is the exact conditional-revenue ratio") {
    val s = spark; import s.implicits._
    val part = Seq((1L, "n", "B", "PROMO", 1, 1.0), (2L, "n", "B", "STANDARD", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 100.0, 0.0, "1996-09-10"),  // promo 100
      (2L, 2L, 1L, 1.0, 300.0, 0.0, "1996-09-10"),  // standard 300
      (3L, 1L, 1L, 1.0, 999.0, 0.0, "1996-10-01"))) // outside month
    val r = graft.queries.BatchQueries.tpchQ14Of(li, part).head()
    assert(r.getDouble(0) === 25.0)
    assert(r.getDouble(1) === 400.0)
  }

  test("tpchQ22: above-average balances with no recent orders, by nation") {
    val cust = customerDf(Seq(
      (1L, "a", 0, 100.0, "B"),   // above avg(pos)=55? avg of (100,10)=55 → yes
      (2L, "b", 0, 10.0, "B"),    // below → dropped
      (3L, "c", 1, 100.0, "B"),   // above but has a recent order → dropped
      (4L, "d", 1, -50.0, "B")))  // negative — excluded from avg, below it
    val ord = ordersDf(Seq(
      (1L, 3L, "O", 0.0, "2000-06-01", "1-URGENT"),  // recent → custkey 3 active
      (2L, 1L, "O", 0.0, "1998-06-01", "1-URGENT"))) // old — doesn't count
    val got = graft.queries.BatchQueries.tpchQ22Of(cust, ord).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((0, 1L, 100.0)))
  }

  test("sprt: a pure-H1 stream crosses the upper boundary and stays crossed") {
    val s = spark; import s.implicits._
    // 40% purchases over 30 days, 20 events/day → llr climbs steadily
    val ev = (0 until 600).map { i =>
      val day = i / 20
      (i.toLong, new Timestamp(86400000L * day + 1000L * i), 1L,
        if (i % 20 < 8) "purchase" else "view", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = graft.queries.ExtensionQueries.sprtOf(ev).collect()
    assert(rows.length === 30)
    // llr is increasing (every day adds positive evidence at 40% >> 22%)
    val llrs = rows.map(_.getDouble(3))
    assert(llrs.zip(llrs.tail).forall { case (a, b) => b > a })
    assert(rows.last.getString(4) === "accept_h1")
    // replay day 0 in plain scala: k=8, n=20
    val expect0 = 8 * math.log(0.22 / 0.18) + 12 * math.log(0.78 / 0.82)
    assert(llrs.head === math.floor(expect0 * 1e6 + 0.5) / 1e6)
  }

  test("fkDiscovery: true FKs hit containment 1, controls do not") {
    val r = graft.queries.ExtensionQueries.fkDiscovery(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getBoolean(5))).toMap
    assert(r("lineitem.l_orderkey")._2 === true)
    assert(r("lineitem.l_partkey")._2 === true)
    assert(r("lineitem.l_suppkey")._2 === true)
    assert(r("orders.o_custkey")._2 === true)
    // reversed pair: not every order has lines? (may or may not hold — just
    // assert the row exists and containment is computed)
    assert(r.contains("orders.o_orderkey"))
    // nonsense pair: p_size values 1..50 ⊆ suppkeys? containment computed,
    // flag reflects it — must at minimum not crash and be ≤ 1
    assert(r("part.p_size")._1 <= 1.0)
  }

  test("silhouette: partition, bounds, and the global row on the corpus fit") {
    val emb = Tables(spark, sfDir, "embeddings")
    val n = emb.count()
    val got = graft.queries.SimilarityQueries.silhouetteOf(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val global = got.filter(_._1 == -1)
    val cells = got.filter(_._1 >= 0)
    assert(global.length === 1)
    assert(global.head._2 === n)             // every vector scored once
    assert(cells.map(_._2).sum === n)        // cells partition the corpus
    got.foreach { case (_, _, s) => assert(s >= -1.0 && s <= 1.0) }
    // the global mean must lie within the per-cell mean envelope
    assert(global.head._3 >= cells.map(_._3).min - 1e-9)
    assert(global.head._3 <= cells.map(_._3).max + 1e-9)
  }

  test("ipfRaking: both margins converge to uniform within ppm tolerance") {
    val s = spark; import s.implicits._
    val docs = Seq(
      // skewed margins: lang en=70/fr=10, source a=45/b=35
      (0 until 40).map(i => (i.toLong, "t", "en", "a")),
      (0 until 30).map(i => (100L + i, "t", "en", "b")),
      (0 until 5).map(i => (200L + i, "t", "fr", "a")),
      (0 until 5).map(i => (300L + i, "t", "fr", "b"))).flatten
      .map { case (id, t, l, src) => (id, t, l, src, 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.ExtensionQueries.ipfRakingOf(docs).collect()
    assert(got.length === 4)
    // three iterations converge the skewed margins to uniform within ppm
    got.foreach { r =>
      assert(math.abs(r.getLong(4)) < 2000, s"lang gap ${r.getLong(4)} ppm")
      assert(math.abs(r.getLong(5)) < 2000, s"src gap ${r.getLong(5)} ppm")
    }
    // the scarce language is upweighted relative to the abundant one
    val w = got.map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(w(("fr", "a")) > w(("en", "a")))
    assert(w(("fr", "b")) > w(("en", "b")))
  }

  test("mcnemar: discordant-cell counting and the corrected statistic") {
    val s = spark; import s.implicits._
    // construct docs where A (logit sign) and B (length) disagree in known ways
    val docs = Seq(
      (1L, "short", "en", "s", 100L),       // B predicts fr (short) → B wrong
      (2L, "short two", "fr", "s", 100L),   // B right
      (3L, "long text", "en", "s", 5000L),  // B right
      (4L, "long text two", "fr", "s", 5000L)) // B wrong
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.queries.TextQueries.mcnemarOf(docs).head()
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3) === 4L)
    // chi2 formula replay from the produced cells
    val (n01, n10) = (r.getLong(1), r.getLong(2))
    val expect = if (n01 + n10 == 0) 0.0
    else {
      val d = math.abs(n01 - n10) - 1.0
      math.floor(d * d / (n01 + n10) * 1e6 + 0.5) / 1e6
    }
    assert(r.getDouble(6) === expect)
  }

  test("tpchQ6: discount band and quantity/date edges are exact") {
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 10.0, 1000.0, 0.05, "1996-06-01"), // in: 1000·0.05 = 50
      (2L, 1L, 1L, 10.0, 1000.0, 0.07, "1996-06-01"), // in: 70
      (3L, 1L, 1L, 10.0, 1000.0, 0.04, "1996-06-01"), // below band
      (4L, 1L, 1L, 10.0, 1000.0, 0.08, "1996-06-01"), // above band
      (5L, 1L, 1L, 24.0, 1000.0, 0.06, "1996-06-01"), // qty 24 not < 24
      (6L, 1L, 1L, 23.0, 1000.0, 0.06, "1995-12-31"), // before window
      (7L, 1L, 1L, 23.0, 1000.0, 0.06, "1997-01-01"), // at exclusive end
      (8L, 1L, 1L, 23.0, 1000.0, 0.06, "1996-12-31"))) // in: 60
    val got = BatchQueries.tpchQ6Of(li).collect()
    assert(got.length === 1)
    assert(got.head.getDouble(0) === 180.0)
  }
}
