package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Round-14 trainer-family additions — membership-inference audit,
  * leave-one-source-out valuation, gradient sparsification: scalar
  * parity plus brute-force recomputation on planted fixtures. */
class Round14bSpec extends SparkSpec {

  /** Mixed en/de corpus over 4 feeds; ids spread so the 80/100 hash
    * split has members and non-members in both label classes. */
  private def corpus(n: Int) = {
    val s = spark; import s.implicits._
    (1 to n).map { i =>
      val en = i % 3 != 0
      val txt =
        if (en) s"the quick fox t$i jumps over the lazy dog"
        else s"der schnelle fuchs f$i springt nicht weit"
      (i.toLong, txt, if (en) "en" else "de", s"src${i % 4}")
    }.toDF("doc_id", "text", "lang", "source")
  }

  test("membershipInfer: grid-histogram AUC equals the brute-force pairwise midrank AUC") {
    val docs = corpus(80)
    val out = TextQueries.membershipInferOf(docs).collect()
      .map(r => (r.getString(0), r)).toMap
    // independent score replay via the scalar pieces, then an O(n²)
    // pairwise midrank AUC at CELL granularity (the grid's tie unit)
    val feats = TextQueries.lrFeatsOf(docs)
    val bucket = expr(TextQueries.splitBucketOf("doc_id"))
    val trainF = feats.filter(bucket < 80)
    val nTrain = trainF.filter(col("slot") === TextQueries.LrSlots).count()
    var w = TextQueries.lrZeroWeights(spark)
    for (_ <- 0 until TextQueries.LrRounds)
      w = TextQueries.logregSgdStep(w, trainF, nTrain).localCheckpoint()
    val scored = feats.join(broadcast(w), "slot")
      .groupBy("doc_id", "y")
      .agg((sum(col("w9") * col("num")).cast("double")
        / (lit(1e9) * max("dl"))).as("m"))
      .select((bucket < 80).as("member"),
        graft.functions.Det.units(
          (col("y") * 2 - 1).cast("double") * col("m"), 6).as("s6"))
      .collect()
      .map(r => (r.getBoolean(0), (r.getLong(1) + 1000000000L) / 1000))
    val mem = scored.filter(_._1).map(_._2)
    val non = scored.filterNot(_._1).map(_._2)
    assert(mem.nonEmpty && non.nonEmpty)
    var num2 = 0L
    for (a <- mem; b <- non)
      num2 += (if (a > b) 2L else if (a == b) 1L else 0L)
    // the fenced-double AUC (ADVICE r14: the ppm integer product
    // overflowed past ~2.1M×2.1M docs) — replicate Det.rnd(·, 6)
    val expected = math.floor(num2.toDouble
      / (mem.length.toDouble * non.length * 2.0) * 1e6 + 0.5) / 1e6
    val all = out("all")
    assert(all.getLong(1) == mem.length && all.getLong(2) == non.length)
    assert(all.getDouble(3) == expected)
    // the label-class rows partition the corpus
    assert(out("en").getLong(1) + out("other").getLong(1) == mem.length)
    assert(out("en").getLong(2) + out("other").getLong(2) == non.length)
  }

  test("sourceAblation: the 'none' lane walks the scalar trainer trajectory bit-for-bit") {
    val docs = corpus(60)
    val featsAll = TextQueries.lrFeatsOf(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
    val (wAll, _) = TextQueries.ablationWeights(featsAll)
    val none = wAll.filter(col("abl") === "none")
      .collect()
      .map(r => r.getAs[Number]("slot").longValue -> r.getAs[Long]("w9"))
      .toMap
    var w = TextQueries.lrZeroWeights(spark)
    val feats = TextQueries.lrFeatsOf(docs)
    for (_ <- 0 until TextQueries.LrRounds)
      w = TextQueries.logregSgdStep(w, feats, docs.count()).localCheckpoint()
    val scalar = w.collect()
      .map(r => r.getAs[Number]("slot").longValue -> r.getAs[Long]("w9"))
      .toMap
    assert(none == scalar)
  }

  test("sourceAblation: control row is exactly zero; per-feed train counts are n minus the feed") {
    val docs = corpus(60)
    val rows = TextQueries.sourceAblationOf(docs).collect()
    assert(rows.length == 5) // 4 feeds + 'none'
    val byAbl = rows.map(r => r.getString(0) -> r).toMap
    assert(byAbl("none").getLong(4) == 0L)  // delta_ppm
    assert(byAbl("none").getLong(5) == 0L)  // margin_shift6
    val cnt = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, c) <- cnt) {
      assert(byAbl(src).getLong(1) == 60 - c) // n_train
      assert(byAbl(src).getLong(2) == 60)     // n_eval: full corpus
    }
  }

  test("lrSweep: the lr=8 lane IS the production trainer — final eval matches logregStep bit-for-bit") {
    val docs = corpus(60)
    val sweep = TextQueries.lrSweepOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(sweep.keySet == TextQueries.LrSweepNums.toSet)
    val base = TextQueries.logregStepOf(docs).collect()
      .map(r => r.getInt(0) -> r).toMap.apply(TextQueries.LrRounds)
    val lane8 = sweep(8L)
    assert(lane8.getLong(2) == base.getLong(3))     // acc_ppm
    assert(lane8.getDouble(3) == base.getDouble(2)) // logloss
    // more aggressive steps grow the weights
    assert(sweep(2L).getLong(4) < sweep(32L).getLong(4))
  }

  test("fedAvg: a single-client corpus collapses to the centralized trainer exactly") {
    val s = spark; import s.implicits._
    val docs = corpus(60).drop("source").withColumn("source", lit("only"))
    val out = TextQueries.fedAvgOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val (fed, cen) = (out("fedavg"), out("central"))
    assert(fed.getLong(1) == 60 && cen.getLong(1) == 60)
    assert(fed.getLong(2) == cen.getLong(2))     // acc_ppm
    assert(fed.getDouble(3) == cen.getDouble(3)) // logloss
  }

  test("fedAvg: multi-client averaging evaluates on the full corpus alongside the central lane") {
    val docs = corpus(60)
    val out = TextQueries.fedAvgOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("fedavg", "central"))
    out.values.foreach { r =>
      assert(r.getLong(1) == 60)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000)
    }
  }

  test("dynBatching: alternating lengths — sorted batching eliminates all padding") {
    val s = spark; import s.implicits._
    // ids 1..64 alternate length 1 / length 10; arrival batches mix
    // them (max 10 everywhere), sorted batches are pure
    val docs = (1 to 64).map { i =>
      (i.toLong, Seq.fill(if (i % 2 == 1) 1 else 10)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextQueries.dynBatchingOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val ar = out("arrival")
    // batches: ids 1..31 (cap 31·10), 32..63 (32·10), 64 (1·10)
    assert(ar.getLong(1) == 3 && ar.getLong(2) == 352
      && ar.getLong(3) == 640 && ar.getLong(4) == 288)
    val so = out("length_sorted")
    assert(so.getLong(1) == 2 && so.getLong(2) == 352
      && so.getLong(3) == 352 && so.getLong(4) == 0
      && so.getLong(5) == 0)
  }

  test("dpSgdAccount: every cell matches a plain-Scala grid minimization") {
    val docs = corpus(100)
    val rows = TextQueries.dpSgdAccountOf(docs).collect()
    assert(rows.length ==
      TextQueries.DpSigmas.length * TextQueries.DpSteps.length)
    val lnD = math.log(100.0 * 100)
    rows.foreach { row =>
      val (sigma, t) = (row.getDouble(0), row.getLong(1))
      val cand = (2L to TextQueries.DpAlphaMax.toLong).map { a =>
        (t * a).toDouble / (2.0 * sigma * sigma) + lnD / (a - 1).toDouble -> a
      }
      val best = cand.minBy(c => (c._1, c._2))
      assert(row.getLong(2) == 100L)
      assert(row.getDouble(3) ==
        math.floor(best._1 * 1e6 + 0.5) / 1e6, s"eps at $sigma/$t")
      assert(row.getLong(4) == best._2, s"alpha at $sigma/$t")
    }
    // more noise, fewer steps → smaller budget and a larger optimal α
    val byKey = rows.map(r => (r.getDouble(0), r.getLong(1)) -> r).toMap
    assert(byKey((4.0, 10L)).getDouble(3) < byKey((0.5, 10L)).getDouble(3))
    assert(byKey((4.0, 10L)).getLong(4) > byKey((0.5, 1000L)).getLong(4))
  }

  test("mstBoruvka: hand-computed rounds on a weighted square + the forest invariant") {
    val s = spark; import s.implicits._
    // square 1-2-3-4 with a diagonal; max-similarity spanning tree
    // picks 90+85+80 and skips 70/60
    val und = Seq((1L, 2L, 90L), (2L, 3L, 80L), (3L, 4L, 85L),
      (1L, 4L, 70L), (1L, 3L, 60L)).toDF("u", "v", "cos6")
    val out = graft.queries.SimilarityQueries.mstRoundsOnUnd(und)
      .collect().map(r => r.getInt(0) -> r).toMap
    val r1 = out(1)
    assert(r1.getLong(1) == 4 && r1.getLong(2) == 2
      && r1.getLong(3) == 2 && r1.getLong(4) == 175) // (1,2,90)+(3,4,85)
    val r2 = out(2)
    assert(r2.getLong(1) == 2 && r2.getLong(2) == 1
      && r2.getLong(3) == 1 && r2.getLong(4) == 80)  // (2,3,80) bridges
    (3 to 6).foreach { r =>
      assert(out(r).getLong(3) == 0 && out(r).getLong(4) == 0)
    }
    // forest invariant: components merged == edges added, every round
    out.values.foreach(r =>
      assert(r.getLong(1) - r.getLong(2) == r.getLong(3)))
  }

  test("selfBleu: hand-computed leave-one-out clipped precisions") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b a"), (2L, "a b c"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = TextQueries.selfBleuOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // d1: uni a:2,b:1 vs rest a:1,b:1 → clip 2/3; bi "a b" recurs,
    // "b a" is unique → clip 1/2; geometric mean sqrt(1/3)
    val d1 = out(1L)
    assert(d1.getLong(1) == 3 && d1.getLong(2) == 2)
    assert(d1.getDouble(3) == 0.6667 && d1.getDouble(4) == 0.5)
    assert(d1.getDouble(5) == math.floor(math.sqrt(1.0 / 3) * 1e6 + 0.5) / 1e6)
    // d2 mirrors d1's counts exactly
    assert(out(2L).getDouble(5) == d1.getDouble(5))
    // d3 shares nothing with the rest → 0 on every tier
    val d3 = out(3L)
    assert(d3.getDouble(3) == 0.0 && d3.getDouble(4) == 0.0
      && d3.getDouble(5) == 0.0)
  }

  test("audioFrames: hand-computed frame stats, partial frames, and error lanes") {
    import graft.queries.MultimodalQueries
    def wavOf(samples: Seq[Int]): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        val u = if (s < 0) s + 65536 else s
        data(2 * i) = (u & 0xff).toByte
        data(2 * i + 1) = ((u >> 8) & 0xff).toByte
      }
      MultimodalQueries.buildWav(data, withJunk = false)
    }
    // one partial frame: n=5, Σs=25, Σs²=211 → v=5·211−625=430;
    // crossings of s·5 vs 25: F,T,F,T,F → 4
    val one = MultimodalQueries.audioFrames(1L, wavOf(Seq(1, 10, 1, 10, 3)))
    assert(one.status == "ok" && one.n_frames.contains(1L)
      && one.mcr_total.contains(4L) && one.v_sum.contains(430L)
      && one.v_max.contains(430L) && one.n_low.contains(0L))
    // full constant frame (v=0, no crossings) + 4-sample tail frame
    // (v=4·20000−200²=40000, crossings F,T,F,T → 3); the constant
    // frame is the one strictly below the mean activity
    val two = MultimodalQueries.audioFrames(2L,
      wavOf(Seq.fill(256)(7) ++ Seq(0, 100, 0, 100)))
    assert(two.status == "ok" && two.n_frames.contains(2L)
      && two.mcr_total.contains(3L) && two.v_sum.contains(40000L)
      && two.v_max.contains(40000L) && two.n_low.contains(1L))
    // negative samples: mean 0, v=4·400, crossings F,T,F,T → 3
    val neg = MultimodalQueries.audioFrames(3L, wavOf(Seq(-10, 10, -10, 10)))
    assert(neg.mcr_total.contains(3L) && neg.v_sum.contains(1600L))
    val bad = wavOf(Seq(1, 2, 3)); bad(0) = 'X'.toByte
    val lane = MultimodalQueries.audioFrames(4L, bad)
    assert(lane.status == "bad_magic" && lane.n_frames.isEmpty)
  }

  test("gradTopk: step-0 stats match a direct recomputation of the zero-weight gradient") {
    val docs = corpus(50)
    val out = TextQueries.gradTopkOf(docs).collect().sortBy(_.getInt(0))
    assert(out.length == TextQueries.LrRounds)
    val feats = TextQueries.lrFeatsOf(docs)
    val g = TextQueries.lrGrad(TextQueries.lrZeroWeights(spark), feats)
      .collect().map(r => math.abs(r.getAs[Long]("g12")))
    val l1 = g.sum
    val top = g.sorted(Ordering[Long].reverse).take(TextQueries.GradTopK).sum
    val r0 = out(0)
    assert(r0.getLong(1) == l1)
    assert(r0.getDouble(2) ==
      math.floor(top.toDouble / l1 * 1e6 + 0.5) / 1e6)
    assert(r0.getLong(4) == g.max)
    // top-k of n slots always holds at least k/n of the L1 mass
    out.foreach { r =>
      assert(r.getDouble(2) >=
        TextQueries.GradTopK.toDouble / (TextQueries.LrSlots + 1) - 1e-9)
      assert(r.getDouble(2) <= 1.0)
    }
  }
}
