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
}
