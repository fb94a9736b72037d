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
}
