package graft

import java.sql.Timestamp

import graft.queries.BatchQueries

/** Round-15b additions: the five TPC-H queries that complete the full
  * 22-query suite (Q1 = q_pricing_summary; Q2/Q11/Q16/Q20 adapted to
  * this partsupp-less schema — see each query's scaladoc). Each test
  * pins the query's SIGNATURE semantics on a hand-computed fixture:
  * Q10's returned-only quarter cut, Q2's regional-min ties, Q11's
  * exact mean-relative boundary, Q16's distinct-pair counting, Q20's
  * strict majority-dominance cut. */
class Round15bSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  private def customerDf(rows: Seq[(Long, String, Int, Double)]) = {
    val s = spark; import s.implicits._
    rows.map { case (ck, n, nk, b) => (ck, n, nk, b, "BUILDING") }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  }
  private def ordersDf(rows: Seq[(Long, Long, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (ok, ck, d) => (ok, ck, "O", 0.0, ts(d), "2-HIGH") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
  }
  // (orderkey, partkey, suppkey, qty, extprice, discount, returnflag, shipdate)
  private def lineitemDf(
      rows: Seq[(Long, Long, Long, Double, Double, Double, String, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (ok, pk, sk, q, ep, disc, rf, d) =>
      (ok, pk, sk, 1, q, ep, disc, 0.02, rf, "O", ts(d))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
  }
  // (partkey, name, type, size)
  private def partDf(rows: Seq[(Long, String, String, Int)]) = {
    val s = spark; import s.implicits._
    rows.map { case (pk, nm, tp, sz) => (pk, nm, "Brand#2", tp, sz, 10.0) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
  }
  // (suppkey, name, nationkey, acctbal)
  private def supplierDf(rows: Seq[(Long, String, Int, Double)]) = {
    val s = spark; import s.implicits._
    rows.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
  }
  private def nationDf(rows: Seq[(Int, String, Int)]) = {
    val s = spark; import s.implicits._
    rows.toDF("n_nationkey", "n_name", "n_regionkey")
  }
  private def regionDf(rows: Seq[(Int, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("r_regionkey", "r_name")
  }

  test("tpchQ10: only returned lines of in-quarter orders count; top by revenue") {
    val cust = customerDf(Seq((1L, "alice", 0, 10.0), (2L, "bob", 1, 20.0)))
    val ord = ordersDf(Seq(
      (10L, 1L, "1996-01-15"),  // in quarter
      (11L, 2L, "1996-03-31"),  // in quarter (last day)
      (12L, 1L, "1996-04-01"))) // OUT (exclusive bound)
    val li = lineitemDf(Seq(
      (10L, 1L, 1L, 1.0, 100.0, 0.0, "R", "1996-02-01"),  // counts: 100.00
      (10L, 1L, 1L, 1.0, 50.0, 0.10, "R", "1996-02-01"),  // counts: 45.00
      (10L, 1L, 1L, 1.0, 999.0, 0.0, "N", "1996-02-01"),  // not returned
      (11L, 1L, 1L, 1.0, 200.0, 0.0, "R", "1996-04-02"),  // counts: 200.00
      (12L, 1L, 1L, 1.0, 777.0, 0.0, "R", "1996-04-02"))) // order out of quarter
    val nat = nationDf(Seq((0, "NATION_0", 0), (1, "NATION_1", 1)))
    val got = BatchQueries.tpchQ10Of(cust, ord, li, nat).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(4)))
    assert(got.toSeq === Seq(
      (2L, "bob", 200.0, "NATION_1"),
      (1L, "alice", 145.0, "NATION_0")))
  }

  test("tpchQ2: regional min-cost ties keep BOTH suppliers; cost is exact cents div qty") {
    val part = partDf(Seq((1L, "blue rod", "PROMO", 5), (2L, "red rod", "PROMO", 5)))
    val supp = supplierDf(Seq(
      (1L, "s1", 0, 100.0), (2L, "s2", 1, 900.0), (3L, "s3", 2, 500.0)))
    val nat = nationDf(Seq((0, "FR", 3), (1, "DE", 3), (2, "US", 1)))
    val reg = regionDf(Seq((3, "EUROPE"), (1, "AMERICA")))
    val li = lineitemDf(Seq(
      // part 1: s1 unit cost 1000c/3 = 333c; s2 unit 999c/3 = 333c → TIE at min
      (1L, 1L, 1L, 3.0, 10.00, 0.0, "N", "1996-01-01"),
      (2L, 1L, 2L, 3.0, 9.99, 0.0, "N", "1996-01-01"),
      // s2 also has a HIGHER-cost line on part 1 — min per (part,supp) wins
      (3L, 1L, 2L, 1.0, 50.00, 0.0, "N", "1996-01-01"),
      // part 2: only non-EUROPE s3 supplies it → excluded entirely
      (4L, 2L, 3L, 1.0, 5.00, 0.0, "N", "1996-01-01")))
    val got = BatchQueries.tpchQ2Of(part, supp, li, nat, reg).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getDouble(5)))
    // s_acctbal desc: s2 (900) before s1 (100); both at supplycost 3.33
    assert(got.toSeq === Seq(("s2", 1L, 3.33), ("s1", 1L, 3.33)))
  }

  test("tpchQ11: strict mean-relative cut — exactly 2x the mean is EXCLUDED") {
    val supp = supplierDf(Seq((1L, "s1", 0, 0.0)))
    val nat = nationDf(Seq((0, "ASIA_N", 2)))
    // four parts valued 600/100/100/200 cents: total=1000, cnt=4,
    // threshold (2*1000) div 4 = 500 → only 600 passes (200 < 500;
    // a part AT 500 would be excluded by the strict >)
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 6.00, 0.0, "N", "1996-01-01"),
      (2L, 2L, 1L, 1.0, 1.00, 0.0, "N", "1996-01-01"),
      (3L, 3L, 1L, 1.0, 1.00, 0.0, "N", "1996-01-01"),
      (4L, 4L, 1L, 1.0, 2.00, 0.0, "N", "1996-01-01")))
    val got = BatchQueries.tpchQ11Of(li, supp, nat).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === Seq((1L, 6.0)))
  }

  test("tpchQ11: boundary — value equal to the truncated threshold is excluded") {
    val supp = supplierDf(Seq((1L, "s1", 0, 0.0)))
    val nat = nationDf(Seq((0, "ASIA_N", 2)))
    // two parts at 500c each: threshold (2*1000) div 2 = 1000 > 500 → empty
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 5.00, 0.0, "N", "1996-01-01"),
      (2L, 2L, 1L, 1.0, 5.00, 0.0, "N", "1996-01-01")))
    assert(BatchQueries.tpchQ11Of(li, supp, nat).count() === 0)
  }

  test("tpchQ16: duplicate (part,supplier) lines count ONCE; acctbal floor excludes") {
    val part = partDf(Seq(
      (1L, "p1", "STANDARD", 9),   // surveyed size
      (2L, "p2", "STANDARD", 2)))  // size not surveyed
    val supp = supplierDf(Seq(
      (1L, "s1", 0, 5000.0),
      (2L, "s2", 0, 999.0)))       // below the 1000 floor → excluded
    val li = lineitemDf(Seq(
      (1L, 1L, 1L, 1.0, 1.0, 0.0, "N", "1996-01-01"),
      (2L, 1L, 1L, 1.0, 1.0, 0.0, "N", "1996-02-01"),  // dup pair (1,1)
      (3L, 1L, 2L, 1.0, 1.0, 0.0, "N", "1996-01-01"),  // complaint supplier
      (4L, 2L, 1L, 1.0, 1.0, 0.0, "N", "1996-01-01"))) // unsurveyed part
    val got = BatchQueries.tpchQ16Of(part, supp, li).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq === Seq(("Brand#2", "STANDARD", 9, 1L)))
  }

  test("tpchQ20: exactly half the part's 1996 quantity does NOT dominate") {
    val part = partDf(Seq((1L, "blue rod", "STANDARD", 5),
      (2L, "red rod", "STANDARD", 5)))
    val supp = supplierDf(Seq(
      (1L, "s1", 0, 0.0), (2L, "s2", 0, 0.0), (3L, "s3", 1, 0.0)))
    val nat = nationDf(Seq((0, "AM_N", 1), (1, "EU_N", 3)))
    val li = lineitemDf(Seq(
      // blue part 1 in 1996: s1 ships 30 of 50 (>half → dominant),
      // s2 ships 20 (not). A 1995 line for s2 must not count.
      (1L, 1L, 1L, 30.0, 1.0, 0.0, "N", "1996-05-01"),
      (2L, 1L, 2L, 20.0, 1.0, 0.0, "N", "1996-06-01"),
      (3L, 1L, 2L, 99.0, 1.0, 0.0, "N", "1995-06-01"),
      // red part: s2 ships ALL of it — but the part isn't blue
      (4L, 2L, 2L, 10.0, 1.0, 0.0, "N", "1996-06-01"),
      // blue part 1: s3 dominates nothing but is non-AMERICA anyway
      (5L, 1L, 3L, 0.0, 1.0, 0.0, "N", "1996-06-01")))
    val got = BatchQueries.tpchQ20Of(supp, nat, part, li).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("s1", "AM_N")))
    // exact-half boundary: s1 25/50 and s2 25/50 → 2*25 > 50 is false → empty
    val liHalf = lineitemDf(Seq(
      (1L, 1L, 1L, 25.0, 1.0, 0.0, "N", "1996-05-01"),
      (2L, 1L, 2L, 25.0, 1.0, 0.0, "N", "1996-06-01")))
    assert(BatchQueries.tpchQ20Of(supp, nat, part, liHalf).count() === 0)
  }
}
