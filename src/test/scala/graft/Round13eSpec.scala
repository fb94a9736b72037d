package graft

import graft.queries.TextQueries

/** Round-13 wave E additions: example forgetting audit and
  * inter-domain gradient conflict. */
class Round13eSpec extends SparkSpec {

  private def docRow(id: Long, text: String, lang: String = "en",
      source: String = "web"): (Long, String, String, String, Long) =
    (id, text, lang, source, text.length.toLong)

  // -------------------------------- forgetting flips

  test("forgettingFlips: step-0 correctness is the w=0 baseline (everything predicted non-English) and flip algebra is consistent") {
    val s = spark
    import s.implicits._
    // separable corpus: the trainer's first step pushes en docs to
    // positive margins — they flip incorrect→LEARNED; de docs start
    // correct (margin 0 is classified non-en) and must stay correct.
    // Single-letter tokens: ascii 97..122 fold to DISTINCT slots
    // 33..58 (double-letter tokens all collapse onto slots {0, 32}
    // and en/de gradients would cancel exactly — found the hard way)
    val docs = (0L until 200L).map { id =>
      if (id % 2 == 0) docRow(id, "a a b", "en")
      else docRow(id, "x y y", "de")
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextQueries.forgettingFlipsOf(docs).collect()
    assert(out.length == 4) // 2 steps × 2 langs
    val k = out.map(r => (r.getAs[Int]("step"), r.getAs[String]("lang")) -> r).toMap
    // step 1, en: every en doc was wrong at w=0 and learned
    assert(k((1, "en")).getAs[Long]("n_forgotten") == 0L)
    assert(k((1, "en")).getAs[Long]("n_learned") == 100L)
    assert(k((1, "en")).getAs[Long]("n_correct") == 100L)
    // de docs never forgotten on a separable corpus
    assert(k((1, "de")).getAs[Long]("n_forgotten") == 0L)
    assert(k((1, "de")).getAs[Long]("n_correct") == 100L)
    assert(k((2, "de")).getAs[Long]("n_forgotten") == 0L)
    assert(k((2, "en")).getAs[Long]("n_correct") == 100L)
  }

  test("forgettingFlips: corpus flip counts reconcile with logregStep's accuracy trajectory") {
    val docs = Tables(spark, sfDir, "documents")
    val flips = TextQueries.forgettingFlipsOf(docs).collect()
    val steps = TextQueries.logregStepOf(docs).collect()
      .map(r => r.getAs[Int]("step") ->
        (r.getAs[Long]("acc_ppm"), r.getAs[Long]("n_docs"))).toMap
    // Σ_lang n_correct(step t) must equal the trainer's accuracy
    // numerator at step t: acc_ppm = correct·1e6 div n
    Seq(1, 2).foreach { t =>
      val nCorrect = flips.filter(_.getAs[Int]("step") == t)
        .map(_.getAs[Long]("n_correct")).sum
      val (accPpm, n) = steps(t)
      assert(accPpm == nCorrect * 1000000L / n,
        s"step $t: flips say $nCorrect correct of $n, trainer says $accPpm ppm")
    }
  }

  // -------------------------------- gradient conflict

  test("gradConflict: disjoint-vocabulary same-label sources are orthogonal; opposing-label twins conflict at cos -1") {
    val s = spark
    import s.implicits._
    // srcA/srcB: same tokens, opposite labels → mean gradients are
    // exact negatives → cos = -1; srcC: disjoint vocab (single-letter
    // tokens hash to distinct slots), orthogonal to both bias aside
    val docs = ((0 until 10).map(i => docRow(i.toLong, "a b", "en", "srcA")) ++
      (10 until 20).map(i => docRow(i.toLong, "a b", "de", "srcB")) ++
      (20 until 30).map(i => docRow(i.toLong, "c d", "en", "srcC")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextQueries.gradConflictOf(docs).collect()
    val cos = out.map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      -> r.getAs[Double]("cos")).toMap
    assert(cos(("srcA", "srcB")) == -1.0,
      s"opposing twins read ${cos(("srcA", "srcB"))}")
    // most-conflicting pair ranks first
    assert(out.find(_.getAs[Int]("rank") == 1).get
      .getAs[String]("src_a") == "srcA")
    // A vs C: bias components have opposite sign (en vs en? A is en,
    // C is en → bias gradients equal sign; token slots disjoint) →
    // positive but below 1; B vs C strictly more conflicting than A vs C
    assert(cos(("srcB", "srcC")) < cos(("srcA", "srcC")))
  }

  test("gradConflict: ranks order by ascending fenced cosine on the corpus and dots are exact integers") {
    val out = TextQueries.gradConflict(spark, sfDir).collect()
    assert(out.length == 10)
    val cs = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos")).toSeq
    assert(cs == cs.sorted, s"cos not ascending: $cs")
    assert(cs.forall(c => c >= -1.0000001 && c <= 1.0000001))
  }

  // -------------------------------- Markov absorption

  private def ev(id: Long, user: Long, sec: Int, typ: String) =
    (id, java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d"), user,
      typ, 1.0, "{}")

  test("absorbProb: a deterministic view→click→purchase chain absorbs in exactly the path length") {
    val s = spark
    import s.implicits._
    val events = (0L until 10L).flatMap(u => Seq(
      ev(u * 3, u, 1, "view"), ev(u * 3 + 1, u, 2, "click"),
      ev(u * 3 + 2, u, 3, "purchase")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.queries.ExtensionQueries.absorbProbOf(events).collect()
      .map(r => (r.getAs[String]("state"), r.getAs[Int]("step"))
        -> r.getAs[Long]("p_absorb6")).toMap
    assert(out(("purchase", 1)) == 1000000L)
    assert(out(("click", 1)) == 1000000L)
    assert(out(("view", 1)) == 0L)
    assert(out(("view", 2)) == 1000000L) // two hops to the absorber
    assert(out(("view", 4)) == 1000000L) // and it stays absorbed
  }

  test("absorbProb: a 50/50 branch reads exactly half, and states with no outgoing edges are not rows") {
    val s = spark
    import s.implicits._
    val events = ((0L until 10L).flatMap(u => Seq(
      ev(u * 2, u, 1, "view"), ev(u * 2 + 1, u, 2, "purchase"))) ++
      (10L until 20L).flatMap(u => Seq(
        ev(u * 2, u, 1, "view"), ev(u * 2 + 1, u, 2, "error"))))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.queries.ExtensionQueries.absorbProbOf(events).collect()
    val k = out.map(r => (r.getAs[String]("state"), r.getAs[Int]("step"))
      -> r.getAs[Long]("p_absorb6")).toMap
    assert(k(("view", 1)) == 500000L)
    assert(k(("view", 4)) == 500000L) // error is a dead end, mass stuck
    // error never precedes anything → not a source state → no rows
    assert(!out.exists(_.getAs[String]("state") == "error"))
  }

  test("absorbSteps: the deterministic chain reads exact path lengths and the absorber reads zero") {
    val s = spark
    import s.implicits._
    val events = (0L until 10L).flatMap(u => Seq(
      ev(u * 3, u, 1, "view"), ev(u * 3 + 1, u, 2, "click"),
      ev(u * 3 + 2, u, 3, "purchase")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.queries.ExtensionQueries.absorbStepsOf(events).collect()
      .map(r => r.getAs[String]("state") -> r.getAs[Long]("e_steps6")).toMap
    assert(out("purchase") == 0L)
    assert(out("click") == 1000000L)
    assert(out("view") == 2000000L)
  }

  test("absorbSteps: a 50/50 branch into an absorber and a dead end reads exactly one step (lost-mass convention)") {
    val s = spark
    import s.implicits._
    val events = ((0L until 10L).flatMap(u => Seq(
      ev(u * 2, u, 1, "view"), ev(u * 2 + 1, u, 2, "purchase"))) ++
      (10L until 20L).flatMap(u => Seq(
        ev(u * 2, u, 1, "view"), ev(u * 2 + 1, u, 2, "error"))))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.queries.ExtensionQueries.absorbStepsOf(events).collect()
      .map(r => r.getAs[String]("state") -> r.getAs[Long]("e_steps6")).toMap
    assert(out("view") == 1000000L) // the step is taken; the error mass stops counting
    assert(!out.contains("error")) // dead end: never a source state
  }

  // -------------------------------- supplier concentration

  test("singleSourceRisk: top-supplier exposure ranks single-sourced parts first, revenue breaks share ties") {
    val s = spark
    import s.implicits._
    val li = Seq(
      (1L, 10L, 10.00), (1L, 10L, 10.00), // part 1: 100% on supp 10, rev 20
      (2L, 10L, 30.00), (2L, 11L, 10.00), // part 2: 50/50 split
      (3L, 10L, 10.00), (3L, 11L, 10.00), (3L, 12L, 10.00), // 3-way
      (4L, 12L, 99.00)) // part 4: 100% single line, rev 99
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val out = graft.queries.ExtensionQueries.singleSourceRiskOf(li).collect()
      .sortBy(_.getAs[Int]("rank"))
    // parts 1 and 4 tie at 100% share → the pricier exposure first
    assert(out(0).getAs[Long]("l_partkey") == 4L)
    assert(out(0).getAs[Long]("top_share_ppm") == 1000000L)
    assert(out(0).getAs[Double]("revenue") == 99.0)
    assert(out(1).getAs[Long]("l_partkey") == 1L)
    assert(out(1).getAs[Long]("nsupp") == 1L)
    assert(out(2).getAs[Long]("l_partkey") == 2L) // 500000 ppm
    assert(out(2).getAs[Long]("top_share_ppm") == 500000L)
    assert(out(3).getAs[Long]("l_partkey") == 3L) // 333333 ppm
    assert(out(3).getAs[Long]("top_share_ppm") == 333333L)
    assert(out.length == 4)
  }
}
