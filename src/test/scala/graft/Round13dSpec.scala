package graft

import graft.queries.{SimilarityQueries, TextQueries}

/** Round-13 wave D additions: DSIR importance selection, quality-signal
  * rank fusion, deterministic random walks. */
class Round13dSpec extends SparkSpec {

  private def fold(s: String, slots: Int): Long = {
    if (s.isEmpty) 0L
    else s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003) % slots
  }

  private def docRow(id: Long, text: String, lang: String = "en",
      source: String = "web"): (Long, String, String, String, Long) =
    (id, text, lang, source, text.length.toLong)

  // -------------------------------- DSIR selection

  test("dsirSelect: a non-target doc written in target vocabulary outranks same-language docs in source vocabulary") {
    val s = spark
    import s.implicits._
    // target (en) speaks {aa bb}; de docs speak {xx yy} except doc 40,
    // which is labeled de but written in the target's vocabulary
    val docs = ((0 until 10).map(i => docRow(i.toLong, "aa bb aa bb", "en")) ++
      (20 until 40).map(i => docRow(i.toLong, "xx yy xx yy", "de")) :+
      docRow(40L, "aa bb aa bb", "de"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextQueries.dsirSelectOf(docs).collect()
    val byRank = out.sortBy(_.getAs[Int]("rank"))
    // the 11 target-vocab docs (10 en + the mislabeled de) fill the
    // head of the cut; xx/yy docs trail with strictly lower scores
    val topIds = byRank.map(_.getAs[Long]("doc_id")).toSeq
    assert(topIds.take(11).toSet == ((0L until 10L) :+ 40L).toSet,
      s"target-vocab docs not at the head: $topIds")
    val li = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("li9")).toMap
    assert(li(40L) == li(0L), "identical token bags must score identically")
    assert(li(40L) > li(topIds(11)), "source-vocab docs must score lower")
  }

  test("dsirSelect: the score is the exact integer Σ num·lp9 of the smoothed hashed models") {
    val s = spark
    import s.implicits._
    val fixture = Seq(docRow(0L, "aa bb", "en"), docRow(1L, "aa cc cc", "de"),
      docRow(2L, "bb bb", "en"), docRow(3L, "dd", "de"))
    val docs = fixture.toDF("doc_id", "text", "lang", "source", "n_chars")
    // plain-Scala replay
    val toks = fixture.flatMap { case (id, text, lang, _, _) =>
      text.split("\\s+").map(t => (id, lang, fold(t, 256))) }
    val grouped = toks.groupBy(x => (x._1, x._2, x._3)).view
      .mapValues(_.size.toLong).toMap
    val raw = grouped.groupBy(_._1._3).view.mapValues(_.values.sum).toMap
    val tgt = grouped.filter(_._1._2 == "en").groupBy(_._1._3).view
      .mapValues(_.values.sum).toMap
    val (totr, tott) = (raw.values.sum, tgt.values.sum)
    def units9(x: Double): Long = math.round(x * 1e9)
    val expected = grouped.groupBy(_._1._1).view.mapValues(
      _.map { case ((_, _, slot), num) =>
        num * units9(math.log((tgt.getOrElse(slot, 0L) + 1).toDouble / (tott + 256))
          - math.log((raw(slot) + 1).toDouble / (totr + 256)))
      }.sum).toMap
    val out = TextQueries.dsirSelectOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("li9")).toMap
    expected.foreach { case (id, li) =>
      assert(out(id) == li, s"doc $id: engine ${out(id)} vs replay $li")
    }
  }

  // -------------------------------- quality fusion

  test("qualityFusion: per-source RRF scores replay exactly and the cut keeps 3 per shard") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      docRow(0L, "the cat sat on a mat", source = "s1"), // stopwordy, diverse
      docRow(1L, "x x x x x x x x x x x x x x", source = "s1"), // long, low ttr
      docRow(2L, "alpha beta gamma", source = "s1"),
      docRow(3L, "zz", source = "s1"),
      docRow(4L, "one two three four the", source = "s2"),
      docRow(5L, "y y", source = "s2"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextQueries.qualityFusionOf(docs).collect()
    assert(out.count(_.getAs[String]("source") == "s1") == 3)
    assert(out.count(_.getAs[String]("source") == "s2") == 2) // only 2 docs
    out.foreach { r =>
      val rrf = Seq("r_len", "r_ttr", "r_stop")
        .map(c => 1000000000L / (60L + r.getAs[Int](c))).sum
      assert(r.getAs[Long]("rrf9") == rrf,
        s"doc ${r.getAs[Long]("doc_id")}: rrf ${r.getAs[Long]("rrf9")} vs $rrf")
    }
    // within a shard, sel_rank follows rrf desc
    val s1 = out.filter(_.getAs[String]("source") == "s1")
      .sortBy(_.getAs[Int]("sel_rank")).map(_.getAs[Long]("rrf9")).toSeq
    assert(s1 == s1.sorted.reverse)
  }

  // -------------------------------- deterministic random walks

  test("randomWalks: trajectories replay exactly on a hand graph and never step off the edge set") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val out = SimilarityQueries.randomWalksOnEdges(
      pairs.toDF("src", "dst")).collect()
      .map(r => (r.getAs[Int]("walker"), r.getAs[Int]("step"),
        r.getAs[Long]("node")))
    // plain-Scala replay
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val seeds = adj.keys.toSeq.sorted.take(16)
    val expected = seeds.zipWithIndex.flatMap { case (s0, wk) =>
      var v = s0
      (0 to 4).map { t =>
        if (t > 0) {
          val ns = adj(v)
          val pick = (((wk * 2654435761L + t * 40503L + v % 4294967296L)
            % 4294967296L) % ns.length).toInt
          v = ns(pick)
        }
        (wk, t, v)
      }
    }.toSet
    assert(out.toSet == expected,
      s"trajectories diverge:\n engine ${out.toSeq.sorted}\n replay ${expected.toSeq.sorted}")
    // structural: every consecutive hop is a real edge
    val byWalker = out.groupBy(_._1)
    byWalker.values.foreach { tr =>
      tr.sortBy(_._2).map(_._3).sliding(2).foreach { h =>
        if (h.length == 2) assert(adj(h(0)).contains(h(1)))
      }
    }
  }

  test("randomWalks: corpus run emits full trajectories for 16 walkers and is deterministic") {
    val r1 = SimilarityQueries.randomWalks(spark, sfDir).collect()
    assert(r1.length == 16 * 5)
    val r2 = SimilarityQueries.randomWalks(spark, sfDir).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  // -------------------------------- effective rank

  private def embDf(vecs: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
  }

  test("effectiveRank: a balanced one-hot simplex reads PR = dim-1 exactly; a rank-1 cloud reads PR = 1") {
    // 4 groups of identical one-hot vectors: after centering the
    // simplex has 3 EQUAL eigenvalues (the all-ones direction dies)
    // → PR = 3 exactly — the eigen-free identity catches it
    val iso = (0 until 16).map { k =>
      (k.toLong, (0 until 4).map(j => if (j == k % 4) 1.0f else 0.0f))
    }
    val rIso = SimilarityQueries.effectiveRankOf(embDf(iso)).collect().head
    assert(rIso.getAs[Int]("dim") == 4)
    assert(rIso.getAs[Long]("n_vecs") == 16L)
    assert(rIso.getAs[Double]("participation_ratio") == 3.0)
    // all mass on one direction: v = ±e0 → only C_00 ≠ 0 → PR = 1
    val r1d = (0 until 8).map { k =>
      (k.toLong, Seq(if (k % 2 == 0) 1.0f else -1.0f, 0.0f, 0.0f, 0.0f))
    }
    val rOne = SimilarityQueries.effectiveRankOf(embDf(r1d)).collect().head
    assert(rOne.getAs[Double]("participation_ratio") == 1.0)
  }

  test("effectiveRank: moments match a plain-Scala integer replay on an arbitrary fixture") {
    val vecs = Seq(
      (0L, Seq(0.25f, -0.5f, 0.125f)), (1L, Seq(-0.75f, 0.3f, 0.6f)),
      (2L, Seq(0.1f, 0.9f, -0.2f)), (3L, Seq(0.45f, -0.15f, 0.05f)),
      (4L, Seq(-0.3f, 0.2f, 0.7f)))
    val n = vecs.length.toLong
    val v6 = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1e6)) }
    val dims = 3
    val m1 = (0 until dims).map(i => v6.map(_._2(i)).sum / n)
    val c6 = for (i <- 0 until dims; j <- 0 until dims) yield {
      val s2 = v6.map(x => x._2(i) * x._2(j)).sum
      (i, j, (s2 / n - m1(i) * m1(j)) / 1000000L)
    }
    val tr6 = c6.filter(x => x._1 == x._2).map(_._3).sum
    val frob12 = c6.map(x => x._3 * x._3).sum
    val r = SimilarityQueries.effectiveRankOf(embDf(vecs)).collect().head
    assert(r.getAs[Long]("tr6") == tr6,
      s"trace ${r.getAs[Long]("tr6")} vs replay $tr6")
    assert(r.getAs[Long]("frob12") == frob12)
    val pr = math.floor(tr6.toDouble * tr6 / frob12 * 1e4 + 0.5) / 1e4
    assert(r.getAs[Double]("participation_ratio") == pr)
  }
}
