package graft

import java.sql.Timestamp

import org.apache.spark.sql.{functions => F}
import graft.queries.{ExtensionQueries, TextQueries}

/** Round-9b additions: gaps-and-islands streaks, ingest event-dedup,
  * golden-record survivorship, and the balanced training-shard
  * manifest. Fixtures pin the semantics; invariance tests pin the
  * results against physical partitioning. */
class Round9bSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def eventsDf(rows: Seq[(Long, String, Long, String, Double)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("gapsIslands splits streaks exactly at calendar-day gaps") {
    // user 1: days 0,1,2 then 5,6 → two islands (3, 2)
    // user 2: days 10 only → one island of 1
    val ev = eventsDf(Seq(
      (0L, "2024-01-01 08:00:00", 1L, "view", 1.0),
      (1L, "2024-01-01 09:00:00", 1L, "view", 1.0), // same day — one island row
      (2L, "2024-01-02 23:59:59", 1L, "view", 1.0),
      (3L, "2024-01-03 00:00:01", 1L, "view", 1.0),
      (4L, "2024-01-06 12:00:00", 1L, "view", 1.0),
      (5L, "2024-01-07 12:00:00", 1L, "view", 1.0),
      (6L, "2024-01-11 01:00:00", 2L, "click", 1.0)))
    val got = ExtensionQueries.gapsIslandsOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(got === Array(
      (1L, 2L, 3L, 5L, 0), // 2 streaks, longest 3, 5 active days, first day idx 0
      (2L, 1L, 1L, 1L, 10)))
  }

  test("eventDedup flags only same-key repeats within the 1h horizon") {
    val ev = eventsDf(Seq(
      (0L, "2024-01-01 00:00:00", 1L, "click", 1.0),
      (1L, "2024-01-01 00:40:00", 1L, "click", 1.0), // dup: 40min after prior
      (2L, "2024-01-01 01:20:00", 1L, "click", 1.0), // dup: 40min after event 1
      (3L, "2024-01-01 04:00:00", 1L, "click", 1.0), // kept: 2h40m gap
      (4L, "2024-01-01 00:30:00", 1L, "view", 1.0),  // other type — own chain
      (5L, "2024-01-01 00:10:00", 2L, "click", 1.0), // other user — own chain
      (6L, "2024-01-01 00:50:00", 2L, "click", 1.0))) // dup: 40min
    val got = ExtensionQueries.eventDedupOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === Array(("click", 6L, 3L), ("view", 1L, 0L)))
  }

  test("goldenRecord survivorship: latest-wins value, modal type with lexicographic ties") {
    val ev = eventsDf(Seq(
      (0L, "2024-01-01 00:00:00", 1L, "view", 1.10),
      (1L, "2024-01-02 00:00:00", 1L, "view", 2.20),
      (2L, "2024-01-03 00:00:00", 1L, "click", 3.30),
      (3L, "2024-01-04 00:00:00", 1L, "click", 4.40), // 2-2 tie → "click" < "view"
      (4L, "2024-01-05 00:00:00", 2L, "error", 9.99)))
    val rows = ExtensionQueries.goldenRecordOf(ev).collect()
    val u1 = rows(0)
    assert(u1.getLong(0) === 1L)
    assert(u1.getLong(3) === 4L)                       // n_events
    assert(u1.getDouble(4) === 11.0)                   // exact cents sum
    assert(u1.getString(5) === "click")                // modal tie-break
    assert(u1.getString(6) === "click")                // last_type
    assert(u1.getDouble(7) === 4.40)                   // last_value
    assert(rows(1).getString(5) === "error")
  }

  test("goldenRecord latest-wins tie-break on equal timestamps uses event_id") {
    val ev = eventsDf(Seq(
      (7L, "2024-01-01 00:00:00", 1L, "a", 1.00),
      (9L, "2024-01-01 00:00:00", 1L, "b", 2.00), // same ts, higher id wins
      (8L, "2024-01-01 00:00:00", 1L, "c", 3.00)))
    val r = ExtensionQueries.goldenRecordOf(ev).head()
    assert(r.getString(6) === "b" && r.getDouble(7) === 2.00)
  }

  test("shardManifest: doc counts within 1, token sums conserved, heaviest docs spread") {
    val s = spark
    import s.implicits._
    // 64 docs with strongly skewed sizes: doc i has i+1 tokens
    val docs = (0 until 64)
      .map(i => (i.toLong, Seq.fill(i + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TextQueries.shardManifestOf(docs).collect()
    assert(rows.length === TextQueries.ShardCount)
    val nDocs = rows.map(_.getLong(1))
    assert(nDocs.max - nDocs.min <= 1)
    assert(rows.map(_.getLong(2)).sum === (1 to 64).sum.toLong)
    // round-robin on the size-sorted order: per-shard loads stay within
    // a tight band of even (64 docs / 16 shards → 4 docs each; worst
    // shard carries 64+48+32+16, best 49+33+17+1 → factor ≤ 1.6)
    val lf = rows.map(_.getDouble(4))
    assert(lf.forall(f => f > 0.4 && f < 1.6), lf.toSeq.toString)
  }

  test("sessionConcurrency counts overlap inclusively and clips at midnight") {
    val ev = eventsDf(Seq(
      // user 1: one session 23:50 → 00:10 next day (spans midnight)
      (0L, "2024-01-01 23:50:00", 1L, "view", 1.0),
      (1L, "2024-01-02 00:10:00", 1L, "view", 1.0),
      // user 2: session exactly overlapping midnight-day-1 portion
      (2L, "2024-01-01 23:55:00", 2L, "view", 1.0),
      // user 3: separate afternoon session on day 1
      (3L, "2024-01-01 12:00:00", 3L, "view", 1.0)))
    val got = ExtensionQueries.sessionConcurrencyOf(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    // day 1: three segments (u1 clip, u2, u3), peak 2 (u1+u2 at 23:55)
    // day 2: only u1's clipped tail → one segment, peak 1
    assert(got === Array(
      ("2024-01-01", 3L, 2L),
      ("2024-01-02", 1L, 1L)))
  }

  test("sessionConcurrency counts a same-instant end+start as concurrent") {
    val ev = eventsDf(Seq(
      // u1 session is the single instant 10:00:00; u2 starts exactly then
      (0L, "2024-01-01 09:40:00", 1L, "view", 1.0),
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 10:00:00", 2L, "view", 1.0)))
    val got = ExtensionQueries.sessionConcurrencyOf(ev).head()
    assert(got.getLong(2) === 2L)
  }

  test("skewDiagnose ranks hottest keys and derives the salt factor") {
    val s = spark
    import s.implicits._
    // key 7 carries 12 rows; keys 1..4 carry 2 each → n=20, keys=5
    // avg = 4, skew = 12/4 = 3.0 → salt 3
    val li = (Seq.fill(12)(7) ++ (1 to 4).flatMap(k => Seq(k, k)))
      .map(_.toLong).toDF("l_suppkey")
    val rows = ExtensionQueries.skewDiagnoseOf(li).collect()
    assert(rows.length === 5)
    val top = rows.head
    assert(top.getLong(1) === 7L && top.getLong(2) === 12L)
    assert(top.getDouble(6) === 3.0)  // skew_factor
    assert(top.getLong(7) === 3L)     // recommended_salt
    // remaining ranks tie on count → ordered by key
    assert(rows.drop(1).map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("sortedNeighborhood finds in-block near-dups and verifies exact Jaccard") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base + " x"),                      // near-dup of 1, same block
      (3L, "zzz completely different text about spark shuffles and joins"),
      (4L, "zzz completely different text about spark shuffles and joins ok"))
      .toDF("doc_id", "text")
    val got = TextQueries.sortedNeighborhoodOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet === Set((1L, 2L), (3L, 4L)))
  }

  test("kmeansSeeded partitions the corpus, converges, and its argmax margins clear float noise") {
    import graft.queries.SimilarityQueries
    val emb = Tables(spark, sfDir, "embeddings")
    val rows = SimilarityQueries.kmeansSeededOf(emb).collect()
    assert(rows.map(_.getLong(1)).sum === emb.count())
    assert(rows.forall(r => r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0))
    assert(rows.forall(r => r.getDouble(3) > 0.85), "iteration-1→2 centroids should barely move")
    // the float-tie audit behind the oracle's exactness claim: in BOTH
    // assignment rounds, every vector's best-vs-second-best score gap
    // must dwarf cross-engine summation noise (~1e-13)
    val e = SimilarityQueries.kmCoo(emb)
    val c0 = SimilarityQueries.kmSeeds(e)
    val c1 = SimilarityQueries.kmUpdate(e, SimilarityQueries.kmAssign(e, c0))
    for (cent <- Seq(c0, c1)) {
      val m = SimilarityQueries.kmScored(e, cent)
        .filter(F.col("rn") <= 2)
        .groupBy("vec_id")
        .agg((F.max("score") - F.min("score")).as("m"))
        .agg(F.min("m")).head().getDouble(0)
      assert(m > 1e-9, s"assignment margin $m within float-noise range")
    }
  }

  test("joinSizeEst: coordinated sample replays exactly and the estimate is unbiased-by-construction") {
    val s = spark
    import s.implicits._
    // keys 1..40, a-side 1 row each, b-side k rows each
    val orders = (1L to 40L).toDF("o_orderkey")
    val lineitem = (1L to 40L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("l_orderkey")
    val r = ExtensionQueries.joinSizeEstOf(orders, lineitem).head()
    val exact = (1L to 40L).sum
    val sampled = (1L to 40L).filter(k => (k * 2654435761L) % 4294967296L < 4294967296L / 8)
    assert(r.getLong(0) === exact)
    assert(r.getLong(1) === sampled.sum * 8)
    assert(r.getLong(2) === sampled.size.toLong)
    assert(r.getLong(3) === 40L)
  }

  test("ltvCohort builds the cohort-age triangle with exact cents") {
    val s = spark
    import s.implicits._
    val orders = Seq(
      (1L, "1995-03-01 00:00:00", 10.00),
      (1L, "1996-07-01 00:00:00", 5.50),   // cohort 1995, age 1
      (2L, "1996-01-01 00:00:00", 2.25),   // cohort 1996, age 0
      (3L, "1995-06-01 00:00:00", 1.00))   // cohort 1995, age 0
      .map { case (c, d, p) => (c, ts(d), p) }
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = ExtensionQueries.ltvCohortOf(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got === Array(
      (1995L, 0L, 2L, 11.0, 11.0, 5.5),   // 2 customers in cohort 1995
      (1995L, 1L, 1L, 5.5, 16.5, 8.25),
      (1996L, 0L, 1L, 2.25, 2.25, 2.25)))
  }

  test("asofNearest picks the closer side, prefers backward on ties, nulls outside tolerance") {
    val ev = eventsDf(Seq(
      (0L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (1L, "2024-01-01 11:00:00", 1L, "error", 1.0), // back 1h vs fwd 2h → back
      (2L, "2024-01-01 13:00:00", 1L, "click", 1.0),
      (3L, "2024-01-01 14:00:00", 1L, "error", 1.0), // back 1h vs fwd 1h tie → back
      (4L, "2024-01-01 15:00:00", 1L, "click", 1.0),
      (5L, "2024-01-05 12:00:00", 2L, "error", 1.0), // >24h from any click → null
      (6L, "2024-01-01 00:00:00", 2L, "click", 1.0),
      (7L, "2024-01-02 08:00:00", 3L, "error", 1.0), // only a FORWARD click in range
      (8L, "2024-01-02 09:30:00", 3L, "click", 1.0)))
    val got = ExtensionQueries.asofNearestOf(ev).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got === Array(
      (1L, Some(0L), Some(-3600000000L)),
      (3L, Some(2L), Some(-3600000000L)), // tie → backward, negative delta
      (5L, None, None),
      (7L, Some(8L), Some(5400000000L))))
  }

  test("clusterKeywords emits 3 descending-scored terms per fitted cell") {
    import graft.queries.SimilarityQueries
    val rows = SimilarityQueries.clusterKeywords(spark, sfDir).collect()
    assert(rows.length === 24) // 8 cells × 3 terms
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
      val scores = byRank.map(_.getDouble(5))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("embeddingOutliers returns the ascending bottom-10 centroid cosines") {
    import graft.queries.SimilarityQueries
    val rows = SimilarityQueries.embeddingOutliers(spark, sfDir).collect()
    assert(rows.length === 10)
    val cos = rows.map(_.getDouble(2))
    assert(cos.zip(cos.tail).forall { case (a, b) => a <= b })
    assert(cos.forall(c => c >= -1.0 && c <= 1.0))
    // every reported outlier scores BELOW its cell's mean cohesion
    val within = SimilarityQueries.kmeansSeeded(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    rows.foreach(r => assert(r.getDouble(2) < within(r.getInt(1))))
  }

  test("pricingSummary: disc-price and charge round exactly in integer space") {
    val s = spark
    import s.implicits._
    val li = Seq(
      ("A", "F", 3.0, 10.00, 0.05, 0.08, ts("1999-01-01 00:00:00")),
      ("A", "F", 2.0, 20.00, 0.10, 0.00, ts("1999-06-01 00:00:00")),
      ("A", "F", 1.0, 1.00, 0.00, 0.05, ts("2001-01-01 00:00:00"))) // past cutoff
      .toDF("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    val r = graft.queries.BatchQueries.pricingSummaryOf(li).head()
    assert(r.getLong(2) === 5L)                 // sum_qty
    assert(r.getDouble(3) === 30.0)             // base
    assert(r.getDouble(4) === 27.50)            // disc price 9.50 + 18.00
    assert(r.getDouble(5) === 28.26)            // charge 10.26 + 18.00 (tax 8% / 0%)
    assert(r.getDouble(8) === 0.075)            // avg_disc
    assert(r.getLong(9) === 2L)
  }

  test("reflectedBalance equals the sequential Lindley recursion") {
    val ev = eventsDf(Seq(
      (0L, "2024-01-01 00:00:00", 1L, "purchase", 5.00),  // W=5.00
      (1L, "2024-01-01 01:00:00", 1L, "click", 7.00),     // clamp → 0
      (2L, "2024-01-01 02:00:00", 1L, "purchase", 3.00),  // W=3.00
      (3L, "2024-01-01 03:00:00", 1L, "view", 1.00),      // W=2.00
      (4L, "2024-01-01 04:00:00", 1L, "error", 4.00),     // clamp → 0
      (5L, "2024-01-01 05:00:00", 1L, "purchase", 1.50))) // W=1.50
    val r = ExtensionQueries.reflectedBalanceOf(ev).head()
    assert(r.getDouble(1) === 1.50)  // final
    assert(r.getDouble(2) === 5.00)  // max
    assert(r.getLong(3) === 2L)      // floored twice
    assert(r.getLong(4) === 6L)
    // property: identity equals a plain-Scala sequential replay on the
    // gate corpus (per-user final balances)
    val events = Tables(spark, sfDir, "events")
      .select(F.col("user_id"), F.expr("unix_micros(ts)").as("tus"),
        F.col("event_id"), F.col("event_type"),
        F.round(F.col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2),
        r2.getString(3), r2.getLong(4)))
    val expected = events.groupBy(_._1).map { case (u, rows) =>
      var w = 0L
      rows.sortBy(e => (e._2, e._3)).foreach { case (_, _, _, ty, c) =>
        w = math.max(0L, w + (if (ty == "purchase") c else -c))
      }
      u -> w.toDouble / 100.0
    }
    val got = ExtensionQueries.reflectedBalance(spark, sfDir).collect()
      .map(r2 => r2.getLong(0) -> r2.getDouble(1)).toMap
    assert(got === expected)
  }

  test("runsTest counts runs exactly on an alternating and a blocked fixture") {
    // 6 purchase days: values H L H L H L around median → alternating
    // signs, 6 runs (ties at the exact median are dropped; use distinct
    // values so none tie)
    val ev = eventsDf((0 until 6).map { d =>
      val v = if (d % 2 == 0) 90.0 + d else 10.0 + d
      (d.toLong, f"2024-01-${d + 1}%02d 00:00:00", 1L, "purchase", v)
    })
    val r = ExtensionQueries.runsTestOf(ev).head()
    // median is a present value and drops: 5 signs remain → runs = 5
    assert(r.getLong(0) + r.getLong(1) === 5L)
    assert(r.getLong(2) === 5L)
    val blocked = eventsDf((0 until 6).map { d =>
      val v = if (d < 3) 90.0 + d else 10.0 + d // HHH LLL → 2 runs
      (d.toLong, f"2024-02-${d + 1}%02d 00:00:00", 1L, "purchase", v)
    })
    assert(ExtensionQueries.runsTestOf(blocked).head().getLong(2) === 2L)
  }

  test("benfordAudit buckets by decimal string and shares sum to one") {
    val s = spark
    import s.implicits._
    val orders = Seq(1.23, 12.30, 199.99, 2.50, 25.00, 3.99, 0.95, 0.09)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("o_orderkey", "o_totalprice")
    val rows = ExtensionQueries.benfordAuditOf(orders).collect()
    // digits of cents strings: 123→1, 1230→1, 19999→1, 250→2, 2500→2,
    // 399→3, 95→9, 9→9
    val byDigit = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit === Map(1 -> 3L, 2 -> 2L, 3 -> 1L, 9 -> 2L))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    val chi2 = rows.map(_.getDouble(4)).distinct
    assert(chi2.length === 1 && chi2.head > 0.0)
  }

  test("autocorr matches a plain-Scala gapped ACF replay on the gate corpus") {
    val daily = Tables(spark, sfDir, "events")
      .filter(F.col("event_type") === "purchase")
      .groupBy(F.to_date(F.col("ts")).as("day"))
      .agg(F.sum(F.round(F.col("value") * 100).cast("long")).as("x"))
      .collect().map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1)).toMap
    def acf(lag: Int): Double = {
      val n = daily.size
      val s = daily.values.map(BigInt(_)).sum
      val m = s.toDouble / n
      val q = daily.values.map(v => v.toDouble * v).sum
      val pairs = daily.collect {
        case (d, xh) if daily.contains(d + lag) => (xh.toDouble, daily(d + lag).toDouble)
      }
      val num = pairs.map { case (a, b) => (a - m) * (b - m) }.sum
      num / (q - s.toDouble * s.toDouble / n)
    }
    val got = ExtensionQueries.autocorr(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(math.abs(got(1) - acf(1)) < 1e-5, s"${got(1)} vs ${acf(1)}")
    assert(math.abs(got(7) - acf(7)) < 1e-5)
  }

  test("ragPack admits a contiguous score-order prefix within the token budget") {
    val rows = TextQueries.ragPack(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length))
    assert(rows.last.getLong(4) <= 1024L)
    // maximality: the NEXT ranked doc must not have fit
    val nextRank = rows.length + 1
    val next = TextQueries.bm25(spark, sfDir).collect()
      .find(_.getInt(0) === nextRank)
    next.foreach { r =>
      val ntok = Tables(spark, sfDir, "documents")
        .filter(F.col("doc_id") === r.getLong(1))
        .select(F.size(F.split(F.trim(F.col("text")), "\\s+")))
        .head().getInt(0)
      assert(rows.last.getLong(4) + ntok > 1024L, "packer stopped early")
    }
  }

  test("kappaAgreement: internal consistency of the 2x2 algebra") {
    val r = TextQueries.kappaAgreement(spark, sfDir).head()
    val (n11, n10, n01, n00) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val n = (n11 + n10 + n01 + n00).toDouble
    assert(n === Tables(spark, sfDir, "documents").count().toDouble)
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    assert(math.abs(r.getDouble(4) - po) < 1e-6)
    assert(math.abs(r.getDouble(5) - pe) < 1e-6)
    assert(math.abs(r.getDouble(6) - (po - pe) / (1.0 - pe)) < 1e-6)
  }

  test("lengthBias ALL row matches a plain-Scala Pearson replay") {
    val docs = Tables(spark, sfDir, "documents")
    val pairs = graft.queries.TextQueries.qualityClassifierOf(docs)
      .join(docs.select(F.col("doc_id"),
        F.size(F.split(F.trim(F.col("text")), "\\s+")).cast("long").as("x")), "doc_id")
      .select("x", "logit").collect()
      .map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble))
    val n = pairs.length.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val r = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val all = TextQueries.lengthBias(spark, sfDir).collect()
      .find(_.getString(0) == "ALL").get
    assert(all.getLong(1) === pairs.length.toLong)
    assert(math.abs(all.getDouble(2) - r) < 1e-5, s"${all.getDouble(2)} vs $r")
  }

  test("tailLatency rank-picks exact percentiles per type") {
    // user 1 click gaps (minutes): 1,2,3,4 → p50 = ceil(.5*4)=2nd = 2min
    val ev = eventsDf(Seq(
      (0L, "2024-01-01 00:00:00", 1L, "click", 1.0),
      (1L, "2024-01-01 00:01:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:03:00", 1L, "click", 1.0),
      (3L, "2024-01-01 00:06:00", 1L, "click", 1.0),
      (4L, "2024-01-01 00:10:00", 1L, "click", 1.0)))
    val r = ExtensionQueries.tailLatencyOf(ev).head()
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 120000000L)  // p50 = 2 min
    assert(r.getLong(3) === 240000000L)  // p95 = ceil(3.8)=4th = 4 min
    assert(r.getLong(4) === 240000000L)  // p99 → 4th
    assert(r.getLong(5) === 240000000L)  // max
  }

  test("pitFeatures never leaks across the cutoff and labels churn correctly") {
    // corpus end 2024-01-20; cutoff = Jan 13
    val ev = eventsDf(Seq(
      (0L, "2024-01-01 00:00:00", 1L, "purchase", 10.00), // feature side
      (1L, "2024-01-14 00:00:00", 1L, "purchase", 99.00), // label side only
      (2L, "2024-01-02 00:00:00", 2L, "view", 1.00),      // churner: nothing after
      (3L, "2024-01-20 00:00:00", 3L, "click", 1.00),     // no pre-cutoff → excluded
      (4L, "2024-01-05 00:00:00", 3L, "purchase", 5.00))) // wait: u3 HAS pre-cutoff
    val rows = ExtensionQueries.pitFeaturesOf(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(5)))).toMap
    // u1: 1 pre-cutoff event, $10 (the $99 is label-side), active → churned=0
    assert(rows(1L) === ((1L, 10.0, 0)))
    // u2: churned (no post-cutoff)
    assert(rows(2L) === ((1L, 0.0, 1)))
    // u3: pre-cutoff purchase + post-cutoff click → active
    assert(rows(3L) === ((1L, 5.0, 0)))
  }

  test("heatmapHour shares sum to one per type") {
    val rows = ExtensionQueries.heatmapHour(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      // each of the ≤24 shares is 6dp-rounded → budget 24 × 5e-7
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1.3e-5)
      assert(rs.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 23))
    }
  }

  test("kAnonymity counts re-identifiable rows from the class-size histogram") {
    val s = spark
    import s.implicits._
    // classes: (0,A,0)×1, (0,B,0)×4, (1,A,0)×6 → sizes 1,4,6
    val cust = (Seq((0, "A")) ++ Seq.fill(4)((0, "B")) ++ Seq.fill(6)((1, "A")))
      .map { case (n, seg) => (n, seg, 100.0) }
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val r = ExtensionQueries.kAnonymityOf(cust).head()
    assert(r.getLong(0) === 11L)  // rows
    assert(r.getLong(1) === 3L)   // classes
    assert(r.getLong(2) === 1L)   // min class
    assert(r.getLong(3) === 1L)   // rows in classes < 2
    assert(r.getLong(4) === 5L)   // rows in classes < 5 (1 + 4)
    assert(r.getLong(5) === 11L)  // all < 10
  }

  test("reconciliation balances an exactly-consistent fixture and flags drift") {
    val s = spark
    import s.implicits._
    // order 1: one line 10.00, disc 5%, tax 8% → header 10.26 balances
    // order 2: header 99.99, line total 50.00 → drift 49.99
    // order 3: no lines
    val orders = Seq((1L, "O", 10.26), (2L, "O", 99.99), (3L, "F", 5.00))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val lines = Seq((1L, 10.00, 0.05, 0.08), (2L, 50.00, 0.00, 0.00))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val byStatus = ExtensionQueries.reconciliationOf(orders, lines).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(byStatus("O") === ((2L, 1L, 0L, 49.99)))
    assert(byStatus("F") === ((1L, 0L, 1L, 5.00)))
  }

  test("mmrRerank matches a plain-Scala greedy MMR replay") {
    val docs = Tables(spark, sfDir, "documents")
    val emb = Tables(spark, sfDir, "embeddings")
    val got = TextQueries.mmrRerankOf(docs, emb).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.map(_._2).toSeq === (1 to 5))
    assert(got.map(_._1).distinct.length === 5)
    // independent greedy replay off the same shortlist + fenced sims
    val sl = TextQueries.bm25(spark, sfDir).collect()
      .filter(_.getInt(0) <= 20).map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val ids = sl.keySet
    val vecs = emb.filter(F.col("vec_id").isin(ids.toSeq: _*))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      math.floor(dot / d * 1e6 + 0.5) / 1e6
    }
    var sel = List.empty[Long]
    for (_ <- 1 to 5) {
      val cand = (ids -- sel).toSeq.map { d =>
        val msim = if (sel.isEmpty) 0.0 else sel.map(s => cos(vecs(d), vecs(s))).max
        val mmr = math.floor((sl(d) * 0.7 - msim * 0.3) * 1e6 + 0.5) / 1e6
        (d, mmr)
      }
      sel = sel :+ cand.minBy { case (d, m) => (-m, d) }._1
    }
    assert(got.map(_._1).toSeq === sel, s"got ${got.toSeq} expected $sel")
  }

  test("cramersV is 1 on a perfectly dependent table and near 0 on an independent one") {
    val s = spark
    import s.implicits._
    val dep = (Seq.fill(10)(("en", "a")) ++ Seq.fill(10)(("de", "b")))
      .toDF("lang", "source")
    val r1 = TextQueries.cramersVOf(dep).head()
    assert(r1.getDouble(4) === 1.0)
    val ind = (for { l <- Seq("en", "de"); src <- Seq("a", "b") }
      yield Seq.fill(5)((l, src))).flatten.toDF("lang", "source")
    assert(TextQueries.cramersVOf(ind).head().getDouble(4) === 0.0)
  }

  test("hashCollisionAudit internal consistency") {
    val s = spark
    import s.implicits._
    val one = Seq((1L, "hello hello hello")).toDF("doc_id", "text")
    val r1 = TextQueries.hashCollisionAuditOf(one).head()
    assert(r1.getLong(0) === 1L && r1.getLong(3) === 0L)
    val r = TextQueries.hashCollisionAudit(spark, sfDir).head()
    assert(r.getLong(1) <= 64L)
    assert(r.getLong(2) >= (r.getLong(0) + 63L) / 64L) // max load ≥ ceil(vocab/64)
    assert(r.getLong(3) <= r.getLong(0))
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("clusterDiameter surfaces transitive drift on a chained fixture") {
    val s = spark
    import s.implicits._
    // A≈B and B≈C but A shares little with C: the closure glues all
    // three; the audit must report the weak A↔C link via the canonical
    val mid = (1 to 20).map(i => s"tok$i").mkString(" ")
    val head = (1 to 12).map(i => s"alpha$i").mkString(" ")
    val tail = (1 to 12).map(i => s"omega$i").mkString(" ")
    val docs = Seq(
      (1L, s"$head $mid"),     // canonical (least id)
      (2L, s"$head $mid $tail"), // bridges 1 and 3
      (3L, s"$mid $tail"))
      .toDF("doc_id", "text")
    val rows = graft.queries.DedupQueries.clusterDiameterOn(docs).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 3L)
    // doc 3's direct similarity to canonical 1 is well below the 0.5
    // pair threshold — the drift this audit exists to expose
    assert(r.getDouble(2) < 0.5, s"min_jaccard ${r.getDouble(2)}")
    assert(r.getDouble(3) > r.getDouble(2))
  }

  test("oodZscore: top-10 descending, and a constant-dim corpus drops the dim") {
    import graft.queries.SimilarityQueries
    val rows = SimilarityQueries.oodZscore(spark, sfDir).collect()
    assert(rows.length === 10)
    val d = rows.map(_.getDouble(1))
    assert(d.zip(d.tail).forall { case (a, b) => a >= b })
    assert(d.forall(_ > 0.0))
  }

  test("conformalInterval: q-hat is the exact calibration rank pick and coverage is sane") {
    val rows = ExtensionQueries.conformalInterval(spark, sfDir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0) // qhat
      assert(r.getDouble(5) >= 0.80 && r.getDouble(5) <= 1.0,
        s"${r.getString(0)} coverage ${r.getDouble(5)}")
    }
    // replay the purchase q-hat from first principles
    val p = Tables(spark, sfDir, "events")
      .filter(F.col("event_type") === "purchase")
      .select(F.col("event_id"), F.round(F.col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def split(id: Long): String = {
      val h = (id * 2246822519L) % 4294967296L
      if (h < 4294967296L / 2) "train" else if (h < 4294967296L * 3 / 4) "cal" else "test"
    }
    val mu = { val t = p.filter(e => split(e._1) == "train").map(_._2); t.sum / t.length }
    val res = p.filter(e => split(e._1) == "cal")
      .map(e => (math.abs(e._2 - mu), e._1)).sorted.map(_._1)
    val k = math.min(math.ceil((res.length + 1) * 0.9).toLong, res.length.toLong).toInt
    val qhat = res(k - 1).toDouble / 100.0
    val got = rows.find(_.getString(0) == "purchase").get
    assert(got.getDouble(2) === qhat, s"${got.getDouble(2)} vs $qhat")
  }

  test("anovaF separates separated groups and zeroes identical ones") {
    val ev1 = eventsDf(Seq(
      (0L, "2024-01-01 00:00:00", 1L, "a", 10.00),
      (1L, "2024-01-01 00:01:00", 1L, "a", 10.00),
      (2L, "2024-01-01 00:02:00", 1L, "a", 10.02),
      (3L, "2024-01-01 00:03:00", 1L, "b", 20.00),
      (4L, "2024-01-01 00:04:00", 1L, "b", 20.00),
      (5L, "2024-01-01 00:05:00", 1L, "b", 20.02)))
    val r1 = ExtensionQueries.anovaFOf(ev1).head()
    assert(r1.getLong(0) === 2L && r1.getDouble(2) > 1000.0)
    val ev2 = eventsDf((0 until 6).map(i =>
      (i.toLong, s"2024-01-01 00:0$i:00", 1L, if (i < 3) "a" else "b", 7.00)))
    assert(ExtensionQueries.anovaFOf(ev2).head().getDouble(2) === 0.0)
  }

  test("returnedRevenue: 20 distinct customers, revenue descending") {
    val rows = ExtensionQueries.returnedRevenue(spark, sfDir).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getLong(0)).distinct.length === 20)
    val rev = rows.map(_.getDouble(4))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getLong(3) > 0))
  }

  test("mannKendall: monotone series scores S = n(n-1)/2 and strong z") {
    val ev = eventsDf((0 until 10).map(d =>
      (d.toLong, f"2024-01-${d + 1}%02d 00:00:00", 1L, "purchase", 10.0 + d)))
    val r = ExtensionQueries.mannKendallOf(ev).head()
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) === 45L)   // all pairs increasing
    assert(r.getDouble(4) === 1.0) // tau
    assert(r.getDouble(3) > 3.0)   // strongly significant
    // flat series: S = 0, z = 0
    val flat = eventsDf((0 until 10).map(d =>
      (d.toLong, f"2024-02-${d + 1}%02d 00:00:00", 1L, "purchase", 7.0)))
    val r2 = ExtensionQueries.mannKendallOf(flat).head()
    assert(r2.getLong(1) === 0L && r2.getDouble(3) === 0.0)
  }

  test("eventStudy attributes purchases to the correct side of each error") {
    val ev = eventsDf(Seq(
      (0L, "2024-01-02 12:00:00", 1L, "error", 1.0),
      (1L, "2024-01-02 00:00:00", 1L, "purchase", 10.00), // 12h before
      (2L, "2024-01-03 00:00:00", 1L, "purchase", 30.00), // 12h after
      (3L, "2024-01-01 00:00:00", 1L, "purchase", 99.00), // 36h before — outside
      (4L, "2024-01-05 00:00:00", 2L, "error", 1.0)))     // no purchases
    val r = ExtensionQueries.eventStudyOf(ev).head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 1L)
    assert(r.getDouble(2) === 5.0)   // mean_pre = 10/2
    assert(r.getDouble(3) === 15.0)  // mean_post = 30/2
    assert(r.getDouble(4) === 10.0)
  }

  test("cuped matches a plain-Scala theta/adjustment replay") {
    val mid = Tables(spark, sfDir, "events")
      .agg(F.expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2")).head().getLong(0)
    val per = Tables(spark, sfDir, "events")
      .filter(F.col("event_type") === "purchase")
      .select(F.col("user_id"), F.expr("unix_micros(ts)").as("tus"),
        F.round(F.col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (u, rows) =>
        (u, rows.filter(_._2 < mid).map(_._3).sum, rows.filter(_._2 >= mid).map(_._3).sum)
      }.toArray
    val n = per.length.toDouble
    val (sx, sy) = (per.map(_._2).sum.toDouble, per.map(_._3).sum.toDouble)
    val varx = (per.map(p => p._2.toDouble * p._2).sum - sx * sx / n) / n
    val covxy = (per.map(p => p._2.toDouble * p._3).sum - sx * sy / n) / n
    val theta = covxy / varx
    val r = ExtensionQueries.cuped(spark, sfDir).head()
    assert(math.abs(r.getDouble(2) - theta) < 1e-5)
    val a = per.filter(_._1 % 2 == 0); val b = per.filter(_._1 % 2 == 1)
    val diffRaw = (a.map(_._3).sum.toDouble / a.length -
      b.map(_._3).sum.toDouble / b.length) / 100.0
    val diffCuped = diffRaw - theta * (a.map(_._2).sum.toDouble / a.length -
      b.map(_._2).sum.toDouble / b.length) / 100.0
    assert(math.abs(r.getDouble(3) - diffRaw) < 1e-3)
    assert(math.abs(r.getDouble(4) - diffCuped) < 1e-3)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
  }

  test("ratioDelta ratios replay exactly; z finite") {
    val r = ExtensionQueries.ratioDelta(spark, sfDir).head()
    val per = Tables(spark, sfDir, "events")
      .select(F.col("user_id"),
        F.when(F.col("event_type") === "purchase",
          F.round(F.col("value") * 100).cast("long")).otherwise(0L).as("c"))
      .groupBy("user_id").agg(F.sum("c").as("num"), F.count(F.lit(1)).as("den"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    def ratio(g: Long) = {
      val s = per.filter(_._1 % 2 == g)
      s.map(_._2).sum.toDouble / s.map(_._3).sum / 100.0
    }
    assert(math.abs(r.getDouble(2) - ratio(0)) < 1e-5)
    assert(math.abs(r.getDouble(3) - ratio(1)) < 1e-5)
    assert(!r.getDouble(4).isNaN)
  }

  test("srmCheck flags a 1-vs-3 split") {
    val ev = eventsDf(Seq(
      (0L, "2024-01-01 00:00:00", 1L, "view", 1.0),
      (1L, "2024-01-01 00:01:00", 2L, "view", 1.0),
      (2L, "2024-01-01 00:02:00", 3L, "view", 1.0),
      (3L, "2024-01-01 00:03:00", 5L, "view", 1.0)))
    val r = ExtensionQueries.srmCheckOf(ev).head()
    assert(r.getLong(0) === 1L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === -1.0)
    assert(r.getBoolean(4))
  }

  test("frameDedup flags repeated frames and measures the static run") {
    val s = spark
    import s.implicits._
    // a media of 8 identical 32-byte frames (sampled at stride 4 →
    // frames 0 and 4, identical → 1 static) and one all-distinct media
    val block = "abcdefgh" * 4 // 32 bytes
    val docs = Seq(
      (1L, block * 8),
      (2L, (0 until 8).map(i => ('a' + i).toChar.toString * 32).mkString))
      .toDF("doc_id", "text")
    val rows = graft.queries.MultimodalQueries.frameDedupOn(docs).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 1L)
    assert(r.getLong(2) >= 1L)           // static frames seen
    assert(r.getLong(4) >= 1L)           // a run exists
  }

  test("mdePower: planning row is internally consistent") {
    val r = ExtensionQueries.mdePower(spark, sfDir).head()
    val (na, nb) = (r.getLong(0), r.getLong(1))
    assert(na + nb === Tables(spark, sfDir, "events")
      .select("user_id").distinct().count())
    assert(r.getDouble(2) > 0.0)
    // MDE = 2.801585 · σ · sqrt(1/na + 1/nb)
    val expected = 2.801585 * r.getDouble(2) *
      math.sqrt(1.0 / na + 1.0 / nb)
    assert(math.abs(r.getDouble(3) - expected) < 0.01)
    assert(r.getDouble(4) > 0.0)
  }

  test("thresholdSweep is monotone non-increasing in the threshold") {
    val rows = TextQueries.thresholdSweep(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Seq(30, 40, 50, 60, 70, 80, 90))
    val p = rows.map(_._2); val d = rows.map(_._3)
    assert(p.zip(p.tail).forall { case (a, b) => a >= b })
    assert(d.zip(d.tail).forall { case (a, b) => a >= b })
    // the 0.5 rung must agree with q_ngram_jaccard's pair count scope
    val at50 = rows.find(_._1 == 50).get._2
    assert(at50 === TextQueries.ngramJaccard(spark, sfDir).count())
  }

  test("medianCi brackets the median with order-statistic bounds") {
    val r = ExtensionQueries.medianCi(spark, sfDir).head()
    assert(r.getDouble(2) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(3))
    // replay the rank picks off a plain sort
    val cents = Tables(spark, sfDir, "orders")
      .select(F.round(F.col("o_totalprice") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    val md = cents(((n + 1) / 2) - 1).toDouble / 100.0
    val lo = cents(math.floor((n - 1.959964 * math.sqrt(n)) / 2.0).toInt - 1).toDouble / 100.0
    val hi = cents(math.ceil(1.0 + (n + 1.959964 * math.sqrt(n)) / 2.0).toInt - 1).toDouble / 100.0
    assert(r.getDouble(1) === md && r.getDouble(2) === lo && r.getDouble(3) === hi)
  }

  test("spcChart flags the spike day above UCL and brackets the rest") {
    val ev = eventsDf((0 until 20).map(d =>
      (d.toLong, f"2024-01-${d + 1}%02d 00:00:00", 1L, "purchase", 100.0 + d * 0.01))
      :+ (20L, "2024-01-21 00:00:00", 1L, "purchase", 1000.0))
    val rows = ExtensionQueries.spcChartOf(ev).collect()
    assert(rows.length === 21)
    val spike = rows.find(_.getDate(0).toString == "2024-01-21").get
    assert(spike.getString(4) === "above")
    assert(rows.count(_.getString(4) == "in") === 20)
    rows.foreach(r => assert(r.getDouble(2) < r.getDouble(3)))
  }

  test("quotaAdmission rejects exactly the overflow beyond 10/day") {
    val ev = eventsDf(
      (0 until 12).map(i =>
        (i.toLong, f"2024-01-01 00:${i % 60}%02d:30", 1L, "view", 1.0)) ++
        Seq((100L, "2024-01-01 10:00:00", 2L, "view", 1.0),
          (101L, "2024-01-02 10:00:00", 1L, "view", 1.0)))
    val rows = ExtensionQueries.quotaAdmissionOf(ev).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("2024-01-01") === ((13L, 2L, 1L)))
    assert(rows("2024-01-02") === ((1L, 0L, 0L)))
  }

  test("sessionConversion counts converting sessions, not events") {
    val ev = eventsDf(Seq(
      (0L, "2024-01-01 00:00:00", 1L, "view", 1.0),
      (1L, "2024-01-01 00:10:00", 1L, "purchase", 5.0),
      (2L, "2024-01-01 00:12:00", 1L, "purchase", 5.0), // same session — 1 conv
      (3L, "2024-01-01 05:00:00", 1L, "view", 1.0),     // session 2: no purchase
      (4L, "2024-01-02 00:00:00", 2L, "view", 1.0)))    // user 2: 1 session, none
    val r = ExtensionQueries.sessionConversionOf(ev).head()
    assert(r.getLong(0) === 2L)  // users
    assert(r.getLong(1) === 3L)  // sessions
    assert(r.getLong(2) === 1L)  // converting sessions
    assert(r.getLong(3) === 1L)  // converting users
  }

  test("hillTail recovers the Pareto exponent on a synthetic power law") {
    val s = spark
    import s.implicits._
    // exact Pareto(α=2) quantiles: x_i = (n/i)^(1/2), i = 1..n
    val n = 2000
    val orders = (1 to n)
      .map(i => (i.toLong, math.pow(n.toDouble / i, 0.5) * 100.0))
      .map { case (k, v) => (k, math.round(v * 100).toDouble / 100.0) }
      .toDF("o_orderkey", "o_totalprice")
    val r = ExtensionQueries.hillTailOf(orders).head()
    assert(r.getLong(0) === 100L)
    assert(math.abs(r.getDouble(2) - 2.0) < 0.3, s"alpha ${r.getDouble(2)}")
  }

  test("dqRules: one scan per table and the clean corpus passes all rules") {
    val rows = ExtensionQueries.dqRules(spark, sfDir).collect()
    assert(rows.length === 9)
    assert(rows.forall(_.getBoolean(4)), "gate corpus must satisfy its contract")
    assert(rows.map(_.getString(0)).toSet === Set("lineitem", "orders", "customer"))
    // a violating fixture MUST fail: plant a negative price via the
    // lineitem branch of the audit shape
    val s = spark
    import s.implicits._
    val bad = Seq((1L, -5.0, 10.0, 0.05, "A"), (2L, 5.0, 60.0, 0.20, "X"))
      .toDF("l_orderkey", "l_extendedprice", "l_quantity", "l_discount", "l_returnflag")
    // reuse the public query against a temp dir is overkill; assert the
    // predicates directly match the SQL text's semantics
    assert(bad.filter(F.col("l_extendedprice") < 0).count() === 1)
    assert(bad.filter(F.col("l_quantity") < 1 || F.col("l_quantity") > 50).count() === 1)
    assert(bad.filter(!F.col("l_returnflag").isin("A", "N", "R")).count() === 1)
  }

  test("seasonalIndex: per-year indices average to 1") {
    val rows = ExtensionQueries.seasonalIndex(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val mean = rs.map(_.getDouble(3)).sum / rs.length
      assert(math.abs(mean - 1.0) < 1e-3, s"year mean $mean")
    }
    assert(rows.forall(_.getDouble(2) > 0.0))
  }

  test("hashUniformity: uniform modmul hash passes, a lumpy hash is detectable") {
    val r = ExtensionQueries.hashUniformity(spark, sfDir).head()
    assert(r.getLong(0) === Tables(spark, sfDir, "events")
      .select("user_id").distinct().count())
    assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0)
    // the production hash should NOT reject uniformity on this corpus
    assert(!r.getBoolean(3), s"ks_stat ${r.getDouble(2)}")
    // replay D from first principles
    val users = Tables(spark, sfDir, "events").select("user_id").distinct()
      .collect().map(_.getLong(0))
    val u = users.map(x => ((x * 2654435761L) % 4294967296L).toDouble / 4294967296.0).sorted
    val n = u.length
    val d = u.zipWithIndex.map { case (v, i) =>
      math.max((i + 1).toDouble / n - v, v - i.toDouble / n) }.max
    assert(math.abs(r.getDouble(1) - d) < 1e-5)
  }

  test("round-9b queries are invariant to input partitioning") {
    val ev = Tables(spark, sfDir, "events").repartition(7)
    assert(ExtensionQueries.gapsIslandsOf(ev).collect().toSeq ===
      ExtensionQueries.gapsIslands(spark, sfDir).collect().toSeq)
    assert(ExtensionQueries.eventDedupOf(ev).collect().toSeq ===
      ExtensionQueries.eventDedup(spark, sfDir).collect().toSeq)
    assert(ExtensionQueries.goldenRecordOf(ev).collect().toSeq ===
      ExtensionQueries.goldenRecord(spark, sfDir).collect().toSeq)
    assert(ExtensionQueries.sessionConcurrencyOf(ev).collect().toSeq ===
      ExtensionQueries.sessionConcurrency(spark, sfDir).collect().toSeq)
    val docs = Tables(spark, sfDir, "documents").repartition(7)
    assert(TextQueries.shardManifestOf(docs).collect().toSeq ===
      TextQueries.shardManifest(spark, sfDir).collect().toSeq)
    assert(TextQueries.sortedNeighborhoodOf(docs).collect().toSeq ===
      TextQueries.sortedNeighborhood(spark, sfDir).collect().toSeq)
    val li = Tables(spark, sfDir, "lineitem").repartition(7)
    assert(ExtensionQueries.skewDiagnoseOf(li).collect().toSeq ===
      ExtensionQueries.skewDiagnose(spark, sfDir).collect().toSeq)
    val emb = Tables(spark, sfDir, "embeddings").repartition(7)
    assert(graft.queries.SimilarityQueries.kmeansSeededOf(emb).collect().toSeq ===
      graft.queries.SimilarityQueries.kmeansSeeded(spark, sfDir).collect().toSeq)
    val ord = Tables(spark, sfDir, "orders").repartition(7)
    assert(ExtensionQueries.ltvCohortOf(ord).collect().toSeq ===
      ExtensionQueries.ltvCohort(spark, sfDir).collect().toSeq)
    assert(ExtensionQueries.joinSizeEstOf(ord, li).collect().toSeq ===
      ExtensionQueries.joinSizeEst(spark, sfDir).collect().toSeq)
    assert(ExtensionQueries.asofNearestOf(ev).collect().toSeq ===
      ExtensionQueries.asofNearest(spark, sfDir).collect().toSeq)
    assert(graft.queries.SimilarityQueries.clusterKeywordsOf(emb, docs).collect().toSeq ===
      graft.queries.SimilarityQueries.clusterKeywords(spark, sfDir).collect().toSeq)
    assert(graft.queries.SimilarityQueries.embeddingOutliersOf(emb).collect().toSeq ===
      graft.queries.SimilarityQueries.embeddingOutliers(spark, sfDir).collect().toSeq)
    assert(ExtensionQueries.reflectedBalanceOf(ev).collect().toSeq ===
      ExtensionQueries.reflectedBalance(spark, sfDir).collect().toSeq)
    val li2 = Tables(spark, sfDir, "lineitem").repartition(7)
    assert(graft.queries.BatchQueries.pricingSummaryOf(li2).collect().toSeq ===
      graft.queries.BatchQueries.pricingSummary(spark, sfDir).collect().toSeq)
  }
}
