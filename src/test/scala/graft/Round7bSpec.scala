package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Round-7b operators (tokenizer induction, mix policy, provenance,
  * drift, calibration, redaction), each against a hand-computable
  * fixture (the oracle run covers the corpus; these pin semantics). */
class Round7bSpec extends SparkSpec {
  import spark.implicits._

  test("bpe merges: pair counts are occurrence-weighted and fully tie-broken") {
    // "ab" ×3 occurrences → pair ab:3; "abc" → ab, bc; "bc" → bc.
    // Totals: ab = 3 + 1 = 4, bc = 1 + 1 = 2.
    val docs = Seq((0L, "ab ab abc"), (1L, "ab bc")).toDF("doc_id", "text")
    val out = TextQueries.bpeMergesOf(docs).collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "ab", 4L), (2, "bc", 2L)))
    // single-char tokens contribute nothing
    val solo = TextQueries.bpeMergesOf(Seq((0L, "a b c")).toDF("doc_id", "text"))
    assert(solo.count() == 0)
    // tie-break: equal counts rank alphabetically
    val tied = TextQueries.bpeMergesOf(Seq((0L, "xy wz")).toDF("doc_id", "text")).collect()
    assert(tied.map(_.getString(1)).toSeq == Seq("wz", "xy"))
  }

  test("zipf fit: slope/intercept match a plain-Scala OLS on the same ranked points") {
    // term frequencies 8, 4, 2, 1 → exact ln points, hand-replayable
    val words = Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++ Seq("d")
    val docs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
    val out = TextQueries.zipfFitOf(docs, k = 4).collect().head
    assert(out.getLong(0) == 4)
    val pts = Seq((1, 8), (2, 4), (3, 2), (4, 1))
      .map { case (r, c) => (math.log(r.toDouble), math.log(c.toDouble)) }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy * sxx - sx * sxy) / (n * sxx - sx * sx)
    assert(math.abs(out.getDouble(1) - slope) < 1e-6, s"slope ${out.getDouble(1)} vs $slope")
    assert(math.abs(out.getDouble(2) - icept) < 1e-6)
    // geometric decay is exactly Zipf-with-slope −ln2/… shape: slope must be negative
    assert(out.getDouble(1) < 0)
  }

  test("mixture weights: sqrt-temperature weights and boosts are closed-form") {
    // source s1: 9 tokens, s2: 1 token → √9=3, √1=1, ss=4
    val docs = Seq(
      (0L, "t t t t t t t t t", "s1"),
      (1L, "u", "s2")).toDF("doc_id", "text", "source")
    val out = TextQueries.mixtureWeightsOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("s1")._1 == 9 && out("s2")._1 == 1)
    assert(math.abs(out("s1")._2 - 0.75) < 1e-9)
    assert(math.abs(out("s2")._2 - 0.25) < 1e-9)
    // boost = w / natural share: s1 natural 0.9 → 0.75/0.9; s2 0.25/0.1
    assert(math.abs(out("s1")._3 - 0.75 / 0.9) < 1e-6)
    assert(math.abs(out("s2")._3 - 2.5) < 1e-9)
    // weights sum to 1 over sources
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("blocklist filter: hit counting, flag accounting, and clean-source zero row") {
    val docs = Seq(
      (0L, "spark is fast", "s1"),   // 1 hit
      (1L, "vector spark go", "s1"), // 2 hits
      (2L, "clean text here", "s1"), // 0 hits
      (3L, "nothing bad", "s2")).toDF("doc_id", "text", "source")
    val out = TextQueries.blocklistFilterOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out("s1") == ((3L, 2L, 3L, 0.6667)))
    assert(out("s2") == ((1L, 0L, 0L, 0.0)))
  }

  test("source overlap: shared 8-gram types count once per pair, ordered a < b") {
    val span = "w1 w2 w3 w4 w5 w6 w7 w8" // exactly one 8-gram
    val docs = Seq(
      (0L, span, "sA"),
      (1L, span + " tail", "sB"), // shares the gram (plus its own shifted gram)
      (2L, span, "sB"),           // duplicate within sB — must not double-count
      (3L, "all fresh words here none shared at all", "sC"))
      .toDF("doc_id", "text", "source")
    val out = TextQueries.sourceOverlapOf(docs).collect()
    assert(out.length == 1, s"only (sA, sB) overlap expected, got ${out.toSeq}")
    val r = out.head
    assert(r.getString(0) == "sA" && r.getString(1) == "sB" && r.getLong(2) == 1L)
  }

  test("ks split drift: statistic matches a plain-Scala exact replay of the ECDF sup") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = TextQueries.ksSplitDriftOf(docs).collect().head
    // plain-Scala replay: same split rule, same cross-multiplied sup
    def bucket(d: Long): Long = {
      val d32 = d % 4294967296L
      (((d32 * 40503) % 65536) * 65536 + d32 * 31153) % 4294967296L % 100
    }
    val rows = docs.select("doc_id", "n_chars").collect()
      .map(r => (bucket(r.getLong(0)), r.getLong(1)))
      .collect {
        case (b, n) if b < 80 => ("train", n)
        case (b, n) if b < 90 => ("val", n)
      }
    val tr = rows.filter(_._1 == "train").map(_._2).sorted
    val va = rows.filter(_._1 == "val").map(_._2).sorted
    val n1 = tr.length.toLong; val n2 = va.length.toLong
    val dNum = (tr ++ va).distinct.map { x =>
      math.abs(n2 * tr.count(_ <= x) - n1 * va.count(_ <= x))
    }.max
    assert(out.getLong(0) == n1 && out.getLong(1) == n2)
    assert(out.getLong(2) == dNum, s"ks_num ${out.getLong(2)} vs replay $dNum")
    assert(math.abs(out.getDouble(3) - dNum.toDouble / (n1 * n2)) < 1e-6)
  }

  test("classifier calibration: bins partition the corpus and dup accounting is exact") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val out = TextQueries.classifierCalibrationOf(docs).collect()
    val total = out.map(_.getLong(1)).sum
    assert(total == docs.count(), "bins must partition the corpus")
    // bins are ascending, non-overlapping in logit range
    val bins = out.map(_.getInt(0)).toSeq
    assert(bins == bins.sorted && bins.distinct == bins)
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2),
        "previous bin's hi must sit below next bin's lo")
      case _ =>
    }
    // dup totals equal the fingerprint-group accounting computed directly
    val dupDocs = docs
      .withColumn("fp", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .groupBy("fp").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).agg(coalesce(sum("c"), lit(0L)))
      .collect().head.getLong(0)
    assert(out.map(_.getLong(4)).sum == dupDocs)
    // rate is exactly n_dups / n_docs (4dp)
    out.foreach { r =>
      val expect = math.floor(r.getLong(4).toDouble / r.getLong(1) * 1e4 + 0.5) / 1e4
      assert(r.getDouble(5) == expect)
    }
  }

  test("pii redact: planted email/phone/number are scrubbed in order with exact accounting") {
    val events = Seq(
      ("click", "contact a@b.com or +1 (555) 123-4567 id 42"),
      ("click", """{"k": 87}"""),
      ("view", "no pii here")).toDF("event_type", "props")
    val out = TextQueries.piiRedactOf(events).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val (nEv, nEm, nPh, nNum, chIn, chOut) = out("click")
    assert(nEv == 2 && nEm == 1 && nPh == 1)
    // "42" and "87" are the residual digit runs (phone digits already consumed)
    assert(nNum == 2)
    val in1 = "contact a@b.com or +1 (555) 123-4567 id 42"
    val out1 = "contact [EMAIL] or [PHONE] id [NUM]"
    val in2 = """{"k": 87}"""
    val out2 = """{"k": [NUM]}"""
    assert(chIn == in1.length + in2.length)
    assert(chOut == out1.length + out2.length, s"chars_out $chOut")
    assert(out("view") == ((1L, 0L, 0L, 0L, 11L, 11L)))
  }

  test("span excise: owner keeps, overlapping flagged grams excise their union") {
    // 10-token span shared by docs 0 and 1 → two overlapping flagged
    // 8-grams (pos 1-8 and 2-9) in doc 1; union = tokens 1..10 = 10.
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, span),                    // owner of both grams — excises nothing
      (1L, span + " t1 t2"),         // non-owner: union of [1,8] and [2,9] + k−1 ⇒ 10 tokens
      (2L, "all fresh words here none shared at all nine ten"))
      .toDF("doc_id", "text")
    val out = TextQueries.spanExciseOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((10L, 0L, 10L)), "owner keeps every token")
    assert(out(1L) == ((12L, 10L, 2L)), s"union excision, got ${out(1L)}")
    assert(out(2L) == ((10L, 0L, 10L)))
    // DISJOINT duplicated spans excise separately (two islands)
    val gap = (1 to 8).map(i => s"a$i").mkString(" ")
    val gap2 = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs2 = Seq(
      (0L, gap), (1L, gap2),
      (2L, gap + " mid1 mid2 mid3 " + gap2)) // islands of 8 + 8, gap of 3 kept
      .toDF("doc_id", "text")
    val out2 = TextQueries.spanExciseOf(docs2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out2(2L) == ((19L, 16L, 3L)), s"two islands, got ${out2(2L)}")
  }

  test("span excise property: engine output equals a plain-Scala position-set replay") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val k = 8
    // tiny vocab ⇒ shared 8-grams arise naturally; seed-pinned runs
    val word = Gen.oneOf((0 to 4).map(i => s"w$i"))
    val docGen = Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpusGen = Gen.choose(12, 30).flatMap(n => Gen.listOfN(n, docGen))
    (1L to 4L).foreach { seed =>
      val texts = corpusGen.apply(Gen.Parameters.default, Seed(seed)).get
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val out = TextQueries.spanExciseOf(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // independent replay: excised = |union of flagged k-windows| as a POSITION SET
      val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
      val grams = for {
        (id, ts) <- docs.map { case (id, t) => id -> toks(id) }
        i <- 0 to ts.length - k
      } yield (id, i + 1, ts.slice(i, i + k).mkString(" "))
      val owners = grams.groupBy(_._3).collect {
        case (g, occ) if occ.map(_._1).distinct.size >= 2 => g -> occ.map(_._1).min
      }
      val excisedTok = grams
        .filter { case (id, _, g) => owners.get(g).exists(_ != id) }
        .groupBy(_._1)
        .map { case (id, occ) => id -> occ.flatMap(o => o._2 until (o._2 + k)).toSet.size.toLong }
      toks.foreach { case (id, ts) =>
        val ex = excisedTok.getOrElse(id, 0L)
        assert(out(id) == ((ts.length.toLong, ex, ts.length - ex)),
          s"seed=$seed doc=$id: engine ${out(id)} vs replay (${ts.length}, $ex, ${ts.length - ex})")
      }
    }
  }

  test("time decay: dyadic weekly weights are exact and anchored at the newest week") {
    import java.sql.Timestamp
    // week 0: 100.00; week 1: 50.00; week 2 (newest): 25.00
    // decayed = 25 + 50/2 + 100/4 = 75.00; total = 175.00
    def ts(week: Int): Timestamp = new Timestamp(week * 604800L * 1000L)
    val events = Seq(
      (ts(0), "buy", 100.00),
      (ts(1), "buy", 50.00),
      (ts(2), "buy", 25.00),
      (ts(2), "view", 8.00)).toDF("ts", "event_type", "value")
    val out = queries.ExtensionQueries.timeDecayOf(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("buy") == ((3L, 175.00, 75.00)), s"got ${out("buy")}")
    assert(out("view") == ((1L, 8.00, 8.00)), "newest-week event decays by 2^0")
  }

  test("mixture apply: micro-weight budgets admit docs in hash order until crossed") {
    // s1: 9 tokens (3 docs × 3), s2: 1 token → micro weights 750000 / 250000.
    // budget 8 → budgets 6 and 2 tokens.
    val docs = Seq(
      (0L, "a b c", "s1"), (1L, "d e f", "s1"), (2L, "g h i", "s1"),
      (3L, "u", "s2")).toDF("doc_id", "text", "source")
    val out = TextQueries.mixtureApplyOf(docs, budget = 8L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // equal-size docs ⇒ admission count is hash-order-independent:
    // cum_before 0, 3 admitted; 6 is not < 6 ⇒ exactly 2 docs / 6 tokens
    assert(out("s1") == ((6L, 2L, 6L)), s"got ${out("s1")}")
    assert(out("s2") == ((2L, 1L, 1L)), "nonzero budget admits at least one doc")
  }

  test("postings build: numeric-sorted doc:tf lists with tie-broken ranks") {
    val docs = Seq((1L, "a a b"), (2L, "b a")).toDF("doc_id", "text")
    val out = TextQueries.postingsBuildOf(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (1, "a", 2L, 3L, "1:2,2:1"),
      (2, "b", 2L, 2L, "1:1,2:1")))
    // doc ids sort NUMERICALLY inside postings (10 after 2)
    val wide = Seq((2L, "z"), (10L, "z")).toDF("doc_id", "text")
    val p = TextQueries.postingsBuildOf(wide).collect().head.getString(4)
    assert(p == "2:1,10:1", s"numeric postings order, got $p")
  }

  test("round-7b operators are partitioning-invariant (repartition(7) equality)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val shuffled = docs.repartition(7)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).toSeq
    assert(rows(TextQueries.spanExciseOf(docs)) == rows(TextQueries.spanExciseOf(shuffled)))
    assert(rows(TextQueries.mixtureApplyOf(docs)) == rows(TextQueries.mixtureApplyOf(shuffled)))
    assert(rows(TextQueries.bpeMergesOf(docs)) == rows(TextQueries.bpeMergesOf(shuffled)))
    assert(rows(TextQueries.zipfFitOf(docs)) == rows(TextQueries.zipfFitOf(shuffled)))
    assert(rows(TextQueries.sourceOverlapOf(docs)) == rows(TextQueries.sourceOverlapOf(shuffled)))
    assert(rows(TextQueries.postingsBuildOf(docs)) == rows(TextQueries.postingsBuildOf(shuffled)))
  }

  test("anti join: unique-content census plans as LeftAnti and drops every dup copy") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val q = queries.BatchQueries.antiJoin(spark, sfDir)
    // the plan is a genuine anti join, not outer-join-then-filter
    assert(q.queryExecution.executedPlan.toString.contains("LeftAnti"),
      "explicit left_anti expected in the physical plan")
    // accounting: Σ n_unique = docs − members of any >1 fingerprint group
    val total = docs.count()
    val dupMembers = docs
      .withColumn("fp", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .groupBy("fp").agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .agg(coalesce(sum("c"), lit(0L))).collect().head.getLong(0)
    val uniq = q.agg(sum("n_unique")).collect().head.getLong(0)
    assert(uniq == total - dupMembers, s"$uniq unique vs $total - $dupMembers")
  }

  test("observed metrics: funnel accounting rides one action with no second scan") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    ObservedMetrics.install(spark)
    ObservedMetrics.clear("funnel")
    // metrics attach BEFORE the filter: rows_in + kept accounting ride
    // the same job that computes the real output
    val observed = ObservedMetrics.observe(
        docs, "funnel",
        count(lit(1)).as("rows_in"),
        sum(when(col("n_chars") >= 200, 1L).otherwise(0L)).as("rows_kept"))
      .filter(col("n_chars") >= 200)
    val outCount = observed.count() // the one action
    val m = ObservedMetrics.await("funnel")
      .getOrElse(fail("metrics never delivered"))
    val byName = m.schema.fieldNames.zip(m.toSeq).toMap
    assert(byName("rows_in") == docs.count())
    assert(byName("rows_kept") == outCount,
      "observed kept-count must equal the action's own output count")
  }

  test("json roundtrip: nested struct survives write->read; aggregate equals direct parquet") {
    val viaJson = queries.BatchQueries.jsonRoundtrip(spark, sfDir).collect()
    val direct = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        (sum(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100.0)
          .as("total_price"))
      .orderBy("o_orderstatus").collect()
    assert(viaJson.toSeq == direct.toSeq,
      "JSON write->nested-schema read must preserve every row exactly")
  }

  test("moments sketch: exact power sums, closed-form shape stats, additive merge") {
    import java.sql.Timestamp
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    // symmetric {1.00, 2.00, 3.00}: mean 2, var (100²+0+100²)/3 cents²,
    // skew 0, excess kurtosis (2e8/3)/(6666.67²) − 3 = 1.5 − 3 = −1.5
    val events = Seq(
      (t, "buy", 1.00), (t, "buy", 2.00), (t, "buy", 3.00))
      .toDF("ts", "event_type", "value")
    val r = queries.ExtensionQueries.momentsSketchOf(events).collect().head
    assert(r.getLong(1) == 3)
    assert(Seq(r.getString(2), r.getString(3), r.getString(4), r.getString(5)) ==
      Seq("600", "140000", "36000000", "9800000000"))
    assert(r.getDouble(6) == 2.0)
    val sd = math.sqrt(20000.0 / 3) / 100.0
    assert(math.abs(r.getDouble(7) - sd) < 1e-6)
    assert(r.getDouble(8) == 0.0, "symmetric data has zero skew")
    assert(math.abs(r.getDouble(9) + 1.5) < 1e-6, s"kurtosis ${r.getDouble(9)}")
    // MERGE = elementwise sum: sketches of two halves add to the whole
    val h1 = Seq((t, "buy", 1.00)).toDF("ts", "event_type", "value")
    val h2 = Seq((t, "buy", 2.00), (t, "buy", 3.00)).toDF("ts", "event_type", "value")
    def sums(df: org.apache.spark.sql.DataFrame): Seq[BigInt] = {
      val x = queries.ExtensionQueries.momentsSketchOf(df).collect().head
      Seq(BigInt(x.getString(2)), BigInt(x.getString(3)), BigInt(x.getString(4)), BigInt(x.getString(5)))
    }
    assert(sums(h1).zip(sums(h2)).map(p => p._1 + p._2) == sums(events))
  }

  test("embedding drift: parity-half centroids compare by exact cosine") {
    // label 0: both halves centroid (1, 0) → drift 1.0
    // label 1: half A centroid (1, 0), half B centroid (0, 1) → drift 0.0
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),   // half A
      (1L, Array(1.0f, 0.0f), 0), (3L, Array(1.0f, 0.0f), 0),   // half B
      (4L, Array(1.0f, 0.0f), 1), (6L, Array(1.0f, 0.0f), 1),
      (5L, Array(0.0f, 1.0f), 1), (7L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = queries.SimilarityQueries.embeddingDriftOf(emb).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0) == ((2L, 2L, 1.0)))
    assert(out(1) == ((2L, 2L, 0.0)))
  }
}
