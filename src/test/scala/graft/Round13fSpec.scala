package graft

import graft.queries.{SimilarityQueries, TextQueries}

/** Round-13 wave F additions: butterfly/wedge census and WindowDiff
  * segmentation eval. */
class Round13fSpec extends SparkSpec {

  private def fold(s: String, slots: Int): Long = {
    if (s.isEmpty) 0L
    else s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003) % slots
  }

  private def edges(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("src", "dst")
  }

  // -------------------------------- butterfly census

  test("butterflyCount: C4 has exactly one butterfly, K4 has three, a tree has none") {
    // 4-cycle 1-2-3-4-1
    val c4 = SimilarityQueries.butterflyCountOnEdges(
      edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).collect().head
    assert(c4.getAs[Long]("n_nodes") == 4L && c4.getAs[Long]("n_edges") == 4L)
    assert(c4.getAs[Long]("n_wedges") == 4L) // each degree-2 node: C(2,2)=1
    assert(c4.getAs[Long]("n_butterflies") == 1L)
    // K4: wedges = 4·C(3,2)=12; 4-cycles = 3 (choose the two diagonals)
    val k4 = SimilarityQueries.butterflyCountOnEdges(
      edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .collect().head
    assert(k4.getAs[Long]("n_wedges") == 12L)
    assert(k4.getAs[Long]("n_butterflies") == 3L)
    // star = wedges but no cycles
    val star = SimilarityQueries.butterflyCountOnEdges(
      edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))).collect().head
    assert(star.getAs[Long]("n_wedges") == 6L)
    assert(star.getAs[Long]("n_butterflies") == 0L)
  }

  test("butterflyCount: corpus census is internally consistent and deterministic") {
    val r1 = SimilarityQueries.butterflyCount(spark, sfDir).collect().head
    assert(r1.getAs[Long]("n_nodes") > 0L)
    assert(r1.getAs[Long]("n_wedges") >= r1.getAs[Long]("n_edges"))
    assert(r1.getAs[Long]("n_butterflies") >= 0L)
    val r2 = SimilarityQueries.butterflyCount(spark, sfDir).collect().head
    assert(r1.toString == r2.toString)
  }

  // -------------------------------- WindowDiff

  test("windowDiff: identical segmentations read 0, a replay on a hand fixture is exact") {
    val s = spark
    import s.implicits._
    // build a doc whose content boundaries exactly match every-5:
    // choose tokens so fold(t,2)=0 exactly at positions 5,10,...
    val even = (1 to 80).map(i => s"t$i").filter(t => fold(t, 2) == 0)
    val odd = (1 to 80).map(i => s"t$i").filter(t => fold(t, 2) == 1)
    assert(even.size >= 4 && odd.size >= 20)
    val toks = (1 to 20).map(g => if (g % 5 == 0) even((g / 5) - 1) else odd(g))
    val doc = Seq((0L, toks.mkString(" "), "en", "s1", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextQueries.windowDiffOf(doc).collect().head
    assert(r.getAs[Long]("windowdiff_ppm") == 0L,
      s"aligned segmentations disagree: ${r.getAs[Long]("n_diff")}"
        + s"/${r.getAs[Long]("n_windows")}")
    // and a plain-Scala replay on arbitrary text agrees
    val free = Seq((1L, (1 to 23).map(i => s"w$i").mkString(" "), "en", "s2", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val words = (1 to 23).map(i => s"w$i")
    val t = words.length
    val hb = (1 until t).map(g => if (g % 5 == 0) 1 else 0)
    val rb = (1 until t).map(g => if (fold(words(g - 1), 2) == 0) 1 else 0)
    val diffs = (1 to t - 3).count { g =>
      (0 until 3).map(o => hb(g - 1 + o)).sum !=
        (0 until 3).map(o => rb(g - 1 + o)).sum
    }
    val rf = TextQueries.windowDiffOf(free).collect()
      .find(_.getAs[String]("source") == "s2").get
    assert(rf.getAs[Long]("n_windows") == (t - 3).toLong)
    assert(rf.getAs[Long]("n_diff") == diffs.toLong,
      s"engine ${rf.getAs[Long]("n_diff")} vs replay $diffs")
  }

  // -------------------------------- multi-epoch data value

  test("epochValue: a dup-free source wastes nothing; a source of pure repeats decays by the published law") {
    val s = spark
    import s.implicits._
    def rnd(x: Double, sc: Int): Double = {
      val f = math.pow(10, sc); math.floor(x * f + 0.5) / f
    }
    val docs = ((0 until 10).map(i =>
        (i.toLong, s"unique text number $i", "en", "clean", 20L)) ++
      (10 until 50).map(i =>
        (i.toLong, "same text every time", "en", "loop", 20L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextQueries.epochValueOf(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val clean = out("clean")
    assert(clean.getAs[Long]("n_unique") == 10L)
    assert(clean.getAs[Long]("t_tokens") == clean.getAs[Long]("u_tokens"))
    assert(clean.getAs[Double]("repeat_factor") == 0.0)
    assert(clean.getAs[Double]("eff_tokens") ==
      clean.getAs[Long]("u_tokens").toDouble)
    assert(clean.getAs[Long]("waste_ppm") == 0L)
    val loop = out("loop") // 40 copies of a 4-token doc
    assert(loop.getAs[Long]("n_unique") == 1L)
    assert(loop.getAs[Long]("t_tokens") == 160L)
    assert(loop.getAs[Long]("u_tokens") == 4L)
    val r = rnd(160.0 / 4.0 - 1.0, 6)
    val rp = rnd(15.0 * (1.0 - rnd(math.exp(-r / 15.0), 6)), 6)
    assert(loop.getAs[Double]("repeat_factor") == r)
    assert(loop.getAs[Double]("eff_tokens") == rnd(4.0 * (1.0 + rp), 2))
    assert(loop.getAs[Long]("waste_ppm") > 500000L) // most of it is waste
  }

  // -------------------------------- best-of-n

  test("bestOfN: n=1 is the plain mean, E[max] grows with n toward the max, degenerate distribution is flat") {
    val s = spark
    import s.implicits._
    def ev(id: Long, typ: String, v: Double) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, typ, v, "{}")
    // uniform over {1, 2, 3, 4}: mean 2.5; E[max of 4] = Σ v·((v/4)^4 − ((v−1)/4)^4)
    val events = ((0 until 4).map(i => ev(i.toLong, "a", (i + 1).toDouble)) ++
      (4 until 8).map(i => ev(i.toLong, "b", 7.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.queries.ExtensionQueries.bestOfNOf(events).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("n"))
        -> r.getAs[Double]("e_max")).toMap
    assert(out(("a", 1)) == 2.5)
    def emax(n: Int): Double = {
      val terms = (1 to 4).map { v =>
        math.round((v.toDouble
          * (math.pow(v / 4.0, n) - math.pow((v - 1) / 4.0, n))) * 1e9)
      }
      math.floor(terms.sum.toDouble / 1e9 * 1e4 + 0.5) / 1e4
    }
    assert(out(("a", 4)) == emax(4))
    assert(out(("a", 16)) == emax(16))
    assert(out(("a", 1)) < out(("a", 4)))
    assert(out(("a", 4)) < out(("a", 16)))
    assert(out(("a", 16)) <= 4.0)
    // a constant reward can't be improved by sampling more
    assert(out(("b", 1)) == 7.0 && out(("b", 16)) == 7.0)
  }

  // -------------------------------- structural equivalence

  test("structEquiv: twin leaves of a star share a class, the hub is alone, sizes partition the node set") {
    // star 1-{2,3,4,5}: every leaf's neighborhood is exactly {1}
    val out = SimilarityQueries.structEquivOnEdges(
      edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out(0).getAs[Long]("class_size") == 4L) // the leaves
    assert(out(0).getAs[Long]("rep_node") == 2L)
    assert(out(0).getAs[Long]("degree") == 1L)
    assert(out(1).getAs[Long]("class_size") == 1L) // the hub
    assert(out(1).getAs[Long]("rep_node") == 1L)
    assert(out.map(_.getAs[Long]("class_size")).sum == 5L)
    // chain 1-2-3: ends {2} vs {2} share; middle {1,3} alone
    val chain = SimilarityQueries.structEquivOnEdges(
      edges((1L, 2L), (2L, 3L))).collect()
    assert(chain.head.getAs[Long]("class_size") == 2L)
    assert(chain.head.getAs[Long]("rep_node") == 1L)
  }

  // -------------------------------- temperature scaling

  test("tempScaling: sweep is a plain-Scala replay of the trajectory margins and T=1 recovers the trainer's step-1 loss") {
    val docs = Tables(spark, sfDir, "documents")
    val out = TextQueries.tempScalingOf(docs).collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
    val byT = out.map(r => r.getAs[Double]("t") -> r).toMap
    // T = 1 must equal logregStep's step-1 logloss exactly (same
    // margins, same fence)
    val step1 = TextQueries.logregStepOf(docs).collect()
      .find(_.getAs[Int]("step") == 1).get.getAs[Double]("logloss")
    assert(byT(1.0).getAs[Double]("logloss") == step1,
      s"T=1 ${byT(1.0).getAs[Double]("logloss")} vs trainer $step1")
    // the best T carries rank 1 and no other T beats it
    val best = out.find(_.getAs[Int]("rank") == 1).get
    assert(out.forall(r => r.getAs[Double]("logloss")
      >= best.getAs[Double]("logloss")))
  }
}
