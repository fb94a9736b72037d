package graft

import org.apache.spark.sql.functions._
import graft.queries.BatchQueries

/** Property-style invariants over the batch surface (SURVEY §5.3). */
class BatchInvariantSpec extends SparkSpec {

  test("topk group count is a prefix of the full sorted aggregation") {
    val full = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("o_custkey"))
      .limit(20).collect()
    val topk = BatchQueries.topkGroupCount(spark, sfDir).collect()
    assert(topk.toSeq == full.toSeq)
  }

  test("dedup is idempotent and keys are unique") {
    val d = BatchQueries.dedup(spark, sfDir)
    assert(d.count() == d.select("o_custkey").distinct().count())
    assert(d.count() == d.dropDuplicates("o_custkey").count())
  }

  test("zscore outliers are a subset of input orders") {
    val orders = Tables(spark, sfDir, "orders").select("o_orderkey")
    val out = BatchQueries.zscoreOutliers(spark, sfDir).select("o_orderkey")
    assert(out.join(orders, Seq("o_orderkey"), "left_anti").count() == 0)
  }

  test("histogram bin counts sum to the table row count") {
    val total = BatchQueries.histogram(spark, sfDir)
      .agg(sum("cnt")).head().getLong(0)
    assert(total == Tables(spark, sfDir, "orders").count())
  }

  test("csv roundtrip preserves aggregate checksums vs direct parquet") {
    val viaCsv = BatchQueries.csvRoundtrip(spark, sfDir).collect()
    val direct = Tables(spark, sfDir, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        graft.functions.Det.moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment").collect()
    assert(viaCsv.toSeq == direct.toSeq)
  }

  test("flatten(collect_list) token pool equals the scalable exploded form") {
    // API coverage for R2's literal flatten-of-collected-lists shape;
    // the flagship q_collect_flatten uses explode+agg (bounded buffers)
    val pooled = Tables(spark, sfDir, "documents")
      .select(col("lang"), split(trim(col("text")), "\\s+").as("toks"))
      .groupBy("lang")
      .agg(flatten(collect_list(col("toks"))).as("pool"))
      .select(col("lang"),
        size(col("pool")).as("total_tokens"),
        size(array_distinct(col("pool"))).as("vocab"))
      .orderBy("lang").collect()
    val scalable = graft.queries.TextQueries.collectFlatten(spark, sfDir)
      .collect()
    assert(pooled.toSeq == scalable.toSeq)
  }

  test("Bloom-pre-screened decontamination equals the exact path row-for-row") {
    // no false negatives + exact join kills false positives ⇒ identical
    val exact = graft.queries.TextQueries.decontamination(spark, sfDir).collect()
    val bloom = graft.queries.TextQueries.decontaminationBloom(spark, sfDir).collect()
    assert(bloom.toSeq == exact.toSeq)
  }

  test("split bucket hash is overflow-safe and equals the naive formula (BigInt reference)") {
    // ADVICE r3: doc_id * 2654435761 overflows past ~3.47e9 and Spark 4
    // ANSI mode throws — the two-step modmul must evaluate on the FULL
    // long range and agree with ((d mod 2^32)·K) mod 2^32 mod 100
    val s = spark
    import s.implicits._
    val ids = Seq(0L, 1L, 499L, 3_470_000_000L, 4_294_967_296L, 1e15.toLong,
      Long.MaxValue - 1, Long.MaxValue, -1L, Long.MinValue)
    val got = ids.toDF("doc_id")
      .selectExpr("doc_id",
        "CAST(pmod(pmod(pmod(doc_id, 4294967296) * 40503, 65536) * 65536" +
          " + pmod(doc_id, 4294967296) * 31153, 4294967296) % 100 AS INT) AS b")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ids.foreach { id =>
      val d32 = BigInt(id).mod(BigInt(2).pow(32))
      val want = ((d32 * BigInt(2654435761L)).mod(BigInt(2).pow(32)) % 100).toInt
      assert(got(id) == want, s"doc_id=$id: got ${got(id)}, want $want")
    }
  }

  test("train split assignment is invariant under repartitioning") {
    // the scaladoc's stability claim (VERDICT r3 #8): per-row hash
    // bucketing cannot depend on partition layout, unlike rand(seed)
    val docs = Tables(spark, sfDir, "documents").select("doc_id")
    def assign(n: Int): Map[Long, String] =
      graft.queries.TextQueries.splitAssign(docs.repartition(n))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = assign(1)
    assert(base.values.toSet == Set("train", "val", "test"))
    Seq(3, 7, 32).foreach(n => assert(assign(n) == base, s"split changed at repartition($n)"))
  }

  test("stratified sample caps dominant languages, keeps small ones whole") {
    val docs = Tables(spark, sfDir, "documents")
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = graft.queries.TextQueries.stratifiedSample(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == before.keySet)
    out.foreach { case (lang, (nBefore, nKept, keptChars)) =>
      assert(nBefore == before(lang))
      assert(nKept <= nBefore)
      if (nBefore <= 100) assert(nKept == nBefore, s"$lang under cap must keep all")
      else {
        // hash sampling: expected cap docs, binomial spread — allow 4σ
        val sd = 4 * math.sqrt(100.0 * (1 - 100.0 / nBefore))
        assert(math.abs(nKept - 100.0) <= sd, s"$lang kept $nKept of $nBefore vs cap 100 ± $sd")
      }
      assert(keptChars >= 0 && (nKept > 0 || keptChars == 0))
    }
  }

  test("source mix hits integer quotas derived from weights (and never oversamples)") {
    val rows = graft.queries.TextQueries.sourceMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val tw = rows.map(_._2).sum
    val nOut = rows.map { case (_, w, n, _, _) => n * tw / w }.min
    rows.foreach { case (src, w, nBefore, quota, nKept) =>
      assert(w == (src.drop(3).toInt % 4) + 1, s"$src weight")
      assert(quota == nOut * w / tw, s"$src quota formula")
      assert(quota <= nBefore, s"$src quota exceeds availability")
      assert(nKept <= nBefore)
      // hash selection is binomial around the quota: 4σ envelope
      val p = quota.toDouble / nBefore
      val sd = 4 * math.sqrt(nBefore * p * (1 - p)) + 1
      assert(math.abs(nKept - quota) <= sd, s"$src kept $nKept vs quota $quota ± $sd")
    }
    // composition: kept shares track the weight profile (loose check —
    // exactness is binomial; weights 1..4 must order the shares)
    val byW = rows.groupBy(_._2).view.mapValues(g => g.map(_._5).sum.toDouble).toMap
    assert(byW(4L) > byW(1L), "weight-4 sources must contribute more than weight-1")
  }

  test("filter funnel partitions the corpus exactly (doc and char conservation)") {
    val docs = Tables(spark, sfDir, "documents")
    val rows = graft.queries.TextQueries.filterFunnel(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).toSeq.sorted)
    assert(rows.map(_.getLong(2)).sum == docs.count(), "every doc lands in exactly one stage")
    assert(rows.map(_.getLong(3)).sum ==
      docs.agg(sum("n_chars")).head().getLong(0), "char totals conserve")
    assert(rows.exists(r => r.getString(1) == "kept" && r.getLong(2) > 0), "funnel keeps something")
  }

  test("doc repetition scores are internally consistent and correctly bounded") {
    val rows = graft.queries.TextQueries.docRepetition(spark, sfDir).collect()
    assert(rows.length <= 100 && rows.nonEmpty)
    var prev = Double.MaxValue
    rows.foreach { r =>
      val (total, distinct, top, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(distinct >= 1 && distinct <= total)
      assert(top >= 1 && top <= total - distinct + 1)
      assert(ratio >= 0.0 && ratio < 1.0)
      assert(math.abs(ratio - (1.0 - distinct.toDouble / total)) < 5e-5)
      assert(ratio <= prev + 1e-12, "output must be sorted by rep_ratio desc")
      prev = ratio
    }
  }

  test("as-of join attaches the true latest prior error (brute-force check, tie-free fixture)") {
    val ev = Tables(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus")).collect()
    // the closed-interval pick is only unambiguous if (user, ts) is tie-free
    assert(ev.groupBy(r => (r.getLong(1), r.getLong(3))).forall(_._2.size == 1),
      "fixture must be (user, ts) tie-free for deterministic as-of semantics")
    val errs = ev.filter(_.getString(2) == "error")
      .groupBy(_.getLong(1)).view.mapValues(_.map(r => (r.getLong(3), r.getLong(0)))).toMap
    val expect = ev.filter(_.getString(2) == "click").map { c =>
      val best = errs.getOrElse(c.getLong(1), Array.empty[(Long, Long)])
        .filter(_._1 <= c.getLong(3)).sortBy(_._1).lastOption
      c.getLong(0) -> best.map { case (ets, eid) => (eid, c.getLong(3) - ets) }
    }.toMap
    val got = graft.queries.ExtensionQueries.asofJoin(spark, sfDir).collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))
    }.toMap
    assert(got == expect)
    assert(got.valuesIterator.exists(_.isEmpty) || got.nonEmpty)
  }

  test("upsert applies latest-wins changes with exact row accounting") {
    val rows = graft.queries.ExtensionQueries.upsert(spark, sfDir).collect()
    val nOut = rows.map(_.getLong(1)).sum
    val nUpd = rows.map(_.getLong(2)).sum
    val nKept = rows.map(_.getLong(3)).sum
    assert(nUpd + nKept == nOut, "every surviving row is either updated or kept")
    // replay the merge decisions relationally
    val customers = Tables(spark, sfDir, "customer")
    val latest = Tables(spark, sfDir, "orders")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
          .orderBy(desc("o_orderdate"), desc("o_orderkey"))))
      .filter(col("rn") === 1)
    val joined = customers.join(latest, col("c_custkey") === col("o_custkey"), "left")
    val nDel = joined.filter(col("o_orderstatus") === "F").count()
    val nUpdWant = joined.filter(col("o_orderstatus").isNotNull && col("o_orderstatus") =!= "F").count()
    assert(nOut == customers.count() - nDel, "deletes remove exactly the F-latest customers")
    assert(nUpd == nUpdWant)
    assert(nKept == customers.count() - nDel - nUpdWant)
  }

  test("compaction bounds file count, conserves rows, and range-aligns the layout") {
    graft.queries.ExtensionQueries.compaction(spark, sfDir).collect() // triggers the guarded write
    val path = s"${Tables.scratchDir}/compacted_events"
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, s"expected 4 compacted files, got ${files.length}")
    val compacted = spark.read.parquet(path)
    val src = Tables(spark, sfDir, "events")
    assert(compacted.count() == src.count())
    // range partitioning on (event_type, ts) ⇒ files cover disjoint
    // slices: at most (files + types - 1) distinct (file, type) pairs
    val pairs = compacted.select(input_file_name().as("f"), col("event_type"))
      .distinct().count()
    val nTypes = src.select("event_type").distinct().count()
    assert(pairs <= files.length + nTypes - 1,
      s"$pairs (file,type) pairs — layout is not range-aligned")
    // in-file sort ⇒ ts is monotone within each (file, type) run
    val disorder = compacted
      .select(input_file_name().as("f"), col("event_type"), col("ts"))
      .withColumn("prev", lag("ts", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f", "event_type").orderBy(monotonically_increasing_id())))
      .filter(col("prev") > col("ts")).count()
    assert(disorder == 0, "rows are not sorted within files")
  }

  test("event funnel narrows monotonically with positive hop gaps") {
    val rows = graft.queries.ExtensionQueries.eventFunnel(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("1_signup", "2_view", "3_click", "4_purchase"))
    val counts = rows.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel must narrow: ${counts.toSeq}")
    assert(counts.head > 0 && counts.last > 0, "fixture should convert some users end-to-end")
    assert(rows.head._3.isEmpty, "stage 1 has no inbound gap")
    assert(rows.tail.forall(_._3.exists(_ > 0)), s"hop gaps must be positive: ${rows.toSeq}")
    // stage-2 cross-check: earliest view strictly after earliest signup, per user
    val brute = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), expr("unix_timestamp(ts)").as("t")).collect()
      .groupBy(_.getLong(0)).count { case (_, evs) =>
        val sign = evs.filter(_.getString(1) == "signup").map(_.getLong(2)).minOption
        sign.exists(s => evs.exists(e => e.getString(1) == "view" && e.getLong(2) > s))
      }
    assert(rows(1)._2 == brute, s"stage-2 count ${rows(1)._2} != brute $brute")
  }

  test("resample fills every gap day with the carried value and flags it") {
    val rows = graft.queries.ExtensionQueries.resample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted
      // the grid is contiguous: every day between first and last present
      assert(days.toSeq == (days.head to days.last), s"user $u grid has holes")
      // gap rows carry exactly the previous day's filled value
      val sortedRs = rs.sortBy(_._2)
      sortedRs.sliding(2).foreach {
        case Array(prev, cur) =>
          if (cur._4 == 1) assert(cur._3 == prev._3,
            s"user $u day ${cur._2}: gap fill ${cur._3} != carried ${prev._3}")
        case _ => () // single-day user: one grid row, nothing to slide
      }
      // first day is an observation, never a gap (grid starts at first obs)
      assert(sortedRs.head._4 == 0, s"user $u grid starts with a gap")
    }
    assert(rows.exists(_._4 == 1), "fixture should contain at least one gap day")
  }

  test("zorder layout yields disjoint per-file z ranges and small bounding rectangles") {
    import graft.queries.ExtensionQueries
    spark.conf.unset("graft.zorder.dir")
    ExtensionQueries.zorder(spark, sfDir).collect() // materialize the write
    val dir = new java.io.File(s"${graft.Tables.scratchDir}/zorder_orders")
    val files = dir.listFiles.filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length > 1 && files.length <= 8, s"unexpected file count ${files.length}")
    val stats = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min("z"), max("z"), min("o_custkey"), max("o_custkey"),
        min("o_orderkey"), max("o_orderkey")).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    }
    // range partitioning by z: per-file z intervals must not overlap
    val byZ = stats.sortBy(_._1)
    byZ.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 < b._1, s"overlapping z ranges: $a vs $b")
    }
    // curve locality: each file's (custkey × orderkey) bounding rectangle
    // is a small fraction of the full space — an unclustered layout has
    // every file spanning the FULL rectangle (ratio 1.0 per file);
    // measured here: ~0.125 per file. Assert a 0.3 ceiling.
    val fullArea = {
      val r = spark.read.parquet(files: _*).agg(
        min("o_custkey"), max("o_custkey"), min("o_orderkey"), max("o_orderkey"))
        .collect().head
      (r.getLong(1) - r.getLong(0)).toDouble * (r.getLong(3) - r.getLong(2))
    }
    val meanRatio = stats.map { s =>
      (s._4 - s._3).toDouble * (s._6 - s._5) / fullArea
    }.sum / stats.length
    assert(meanRatio <= 0.3, f"files not z-clustered: mean rectangle ratio $meanRatio%.3f")
  }

  test("binned range join equals the naive inequality join (no lost or duplicated pairs)") {
    val out = graft.queries.ExtensionQueries.rangeJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // naive check: replay sessions and errors on the driver
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("tsec"), col("ts"))
      .collect()
    val errs = ev.filter(_.getString(2) == "error").map(_.getLong(3)).sorted
    val sessions = ev.groupBy(_.getLong(0)).flatMap { case (user, rows) =>
      val ordered = rows.sortBy(r => (r.getTimestamp(4).getTime, r.getTimestamp(4).getNanos, r.getLong(1)))
      var sid = 0L; var prev = Long.MinValue
      ordered.map { r =>
        val t = r.getLong(3)
        if (prev == Long.MinValue || t - prev > 1800) sid += 1
        prev = t
        (user, sid, t)
      }.groupBy(x => (x._1, x._2)).map { case (k, ts) => k -> (ts.map(_._3).min, ts.map(_._3).max) }
    }.toMap
    assert(out.keySet == sessions.keySet)
    sessions.foreach { case (k, (lo, hi)) =>
      val want = errs.count(t => t >= lo && t <= hi).toLong
      assert(out(k) == (hi - lo, want), s"session $k: got ${out(k)}, want (${hi - lo}, $want)")
    }
  }

  test("regex filter output only contains matching names and casted ints in range") {
    BatchQueries.regexFilterCast(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[String]("p_name").matches("^\\w+ widget$"))
      val bn = r.getAs[Int]("brand_num")
      assert(bn >= 5 && bn <= 40)
    }
  }

  test("doc chunking covers every char with exact stride-overlap structure") {
    val chunks = graft.queries.TextQueries.docChunk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val lens = Tables(spark, sfDir, "documents")
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS len")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == lens.keySet, "every doc must be chunked")
    chunks.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      val len = lens(doc)
      sorted.zipWithIndex.foreach { case ((_, idx, start, clen), i) =>
        assert(idx == i, s"doc $doc chunk indices not dense")
        assert(start == i.toLong * 150, s"doc $doc stride broken at $i")
        assert(clen == math.min(200L, len - start), s"doc $doc chunk_len wrong at $i")
      }
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen == len, s"doc $doc tail not covered")
      // consecutive chunks overlap by exactly 50 chars (except a short tail)
      sorted.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) =>
          assert(s1 + l1 - s2 == math.min(50L, s1 + l1 - s2), "overlap exceeded")
          assert(s2 < s1 + l1, s"doc $doc gap between chunks")
        case _ =>
      }
    }
  }

  test("sequence packing conserves docs and tokens; bins overflow by at most one doc tail") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("source", "doc_id",
        "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bins = graft.queries.TextQueries.seqPack(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // conservation: every doc and every token lands in exactly one bin
    assert(bins.map(_._3).sum == docs.length)
    assert(bins.map(_._4).sum == docs.map(_._3).sum)
    // bounded overflow: a bin holds < capacity tokens before its last
    // doc starts, so n_tokens < capacity + that source's max doc size
    val maxTok = docs.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    bins.foreach { case (src, bin, _, toks) =>
      assert(toks < 256 + maxTok(src), s"bin ($src,$bin) overflowed beyond one doc tail")
    }
    // bins are dense per source starting at 0
    bins.groupBy(_._1).foreach { case (src, bs) =>
      val ids = bs.map(_._2).sorted
      assert(ids.head == 0 && ids.last == ids.length - 1, s"$src bins not dense")
    }
  }

  test("ngram LM scores are valid log-probs that discriminate between val docs") {
    val rows = graft.queries.TextQueries.ngramLmScore(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, n, lp) =>
      assert(n >= 1, s"doc $doc has no bigrams")
      assert(lp < 0, s"doc $doc log-prob $lp must be negative")
      // Laplace floor: every bigram prob >= 1/(maxC1+V) > e^-30 on this corpus
      assert(lp > -30, s"doc $doc log-prob $lp below the smoothing floor")
    }
    // a constant score would mean the model ignores content
    assert(rows.map(_._3).distinct.length > 1, "scores must vary across docs")
    // scoring only the val split: ~10% of the corpus
    val total = Tables(spark, sfDir, "documents").count()
    assert(rows.length < total / 5)
  }

  test("ORC round-trip pushes its predicate into the ORC reader and conserves totals") {
    val df = BatchQueries.orcRoundtrip(spark, sfDir)
    val rows = df.collect() // also materializes the scratch write
    val direct = Tables(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 1000.0)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), graft.functions.Det.moneySum(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderpriority").collect()
    assert(rows.toSeq == direct.toSeq, "ORC round-trip changed the aggregate")
    val scan = spark.read.orc(s"${graft.Tables.scratchDir}/orc_roundtrip_orders")
      .filter(col("o_totalprice") > 1000.0)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(o_totalprice,1000.0)"),
      s"predicate not pushed to the ORC reader:\n${plan.take(1500)}")
  }

  test("tfidf top terms: scores consistent with tf/df columns and ranks dense per doc") {
    val rows = graft.queries.TextQueries.tfidfTopTerms(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = Tables(spark, sfDir, "documents").count()
    rows.foreach { r =>
      val (tf, df, tfidf) = (r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("tfidf"))
      val expect = BigDecimal(tf * math.log(n.toDouble / df))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(tfidf - expect) < 1e-9, s"tfidf $tfidf != tf*ln(N/df) $expect")
      assert(df >= 1 && df <= n && tf >= 1)
    }
    // exactly ranks 1..k per doc, scores non-increasing within a doc
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to byRank.length),
        s"doc $d ranks not dense")
      val scores = byRank.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"doc $d not sorted")
    }
  }

  test("boilerplate coverage is the exact fraction of the doc's distinct trigrams in the top-500 list") {
    val rows = graft.queries.TextQueries.boilerplateNgrams(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute one doc's trigram set and the corpus top-500 list naively
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    def grams(toks: Seq[String]) = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val dfMap = docs.values.toSeq.flatMap(t => grams(t)).groupBy(identity).view.mapValues(_.size)
    val boiler = dfMap.toSeq.sortBy { case (g, c) => (-c, g) }.take(500).map(_._1).toSet
    rows.take(50).foreach { r =>
      val g = grams(docs(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_ngrams") == g.size, s"doc ${r.get(0)} n_ngrams")
      assert(r.getAs[Long]("n_boiler") == g.count(boiler), s"doc ${r.get(0)} n_boiler")
    }
  }

  test("collocation PMI matches the closed-form recompute from raw counts") {
    val rows = graft.queries.TextQueries.collocations(spark, sfDir).collect()
    assert(rows.length == 20)
    // recompute counts naively from the corpus
    val toks = Tables(spark, sfDir, "documents").select("text").collect()
      .map(_.getString(0).trim.split("\\s+").toSeq).filter(_.length >= 2)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val pairCount = toks.flatMap(t => t.zip(t.tail)).groupBy(identity).view.mapValues(_.size.toLong)
    val t = toks.map(_.length - 1).map(_.toLong).sum
    val u = toks.map(_.length.toLong).sum
    rows.foreach { r =>
      val (w1, w2, c2, pmi) = (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(c2 == pairCount((w1, w2)), s"pair count mismatch at ($w1,$w2)")
      assert(c2 >= 5)
      val expect = BigDecimal(math.log((c2.toDouble / t) /
        ((uni(w1).toDouble / u) * (uni(w2).toDouble / u))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(pmi - expect) < 1e-9, s"pmi $pmi != $expect at ($w1,$w2)")
    }
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "not sorted by pmi")
  }

  test("schema evolution merges generations, null-fills the old one, prunes columns") {
    val out = BatchQueries.schemaEvolution(spark, sfDir).collect()
    assert(out.length == 2)
    val orders = Tables(spark, sfDir, "orders")
    val gen1 = out.find(_.getInt(0) == 1).get
    val gen2 = out.find(_.getInt(0) == 2).get
    assert(gen1.getLong(1) == orders.filter(col("o_orderkey") % 2 === 0).count())
    assert(gen2.getLong(1) == orders.filter(col("o_orderkey") % 2 === 1).count())
    // every gen1 row has a null evolved column; no gen2 row does
    assert(gen1.getLong(2) == gen1.getLong(1), "gen1 must be all-null on the evolved column")
    assert(gen2.getLong(2) == 0L, "gen2 must have no nulls on the evolved column")
    assert(gen2.getLong(3) > 0, "gen2 must carry real priorities")
    // the merged read keeps pruning: a 2-column projection reads 2 cols (+ partition col)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"${graft.Tables.scratchDir}/schema_evolution_orders")
      .select("o_orderkey", "o_totalprice").filter(col("o_totalprice") > 1000.0)
    val scan = merged.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"column pruning lost under mergeSchema:\n${scan.take(1200)}")
  }

  test("containment flags a planted strict-substring doc that Jaccard would miss") {
    // B: a long doc; A: a 160-char excerpt of B's middle (every shingle
    // of A appears in B → C(A→B)=1, while J(A,B) ≈ |A|/|B| ≈ 0.25);
    // C: unrelated filler of the same length as B.
    val body = (1 to 100).map(i => s"word$i").mkString(" ") // ~700 chars, unique tokens
    val excerpt = body.substring(250, 410)
    val other = (100 to 200).map(i => s"zeta$i").mkString(" ")
    val docs = spark.createDataFrame(Seq(
      (0L, body), (1L, excerpt), (2L, other)
    )).toDF("doc_id", "text")
    val rows = graft.queries.TextQueries.containmentOn(docs).collect()
    assert(rows.length == 1, s"expected exactly the planted pair, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    // d1=0 is the container: c21 (excerpt→body) = 1, c12 well below
    assert(r.getDouble(3) == 1.0, s"excerpt containment should be exactly 1, got $r")
    assert(r.getDouble(2) < 0.5, s"container direction must stay low, got $r")
  }

  test("group sample emits k deterministic docs per source, the lowest-hash survivors") {
    val rows = graft.queries.TextQueries.groupSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val bySource = rows.groupBy(_._1)
    val sources = Tables(spark, sfDir, "documents")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(bySource.keySet == sources, "every source must be sampled")
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length), s"$src ranks not dense")
      assert(rs.length <= 5)
    }
    // deterministic: same rows on a second run over a repartitioned scan
    val again = graft.queries.TextQueries.groupSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq, "sample must be reproducible")
    // cross-check one source against the naive full-sort definition
    val naive = Tables(spark, sfDir, "documents")
      .withColumn("bucket", expr(
        "pmod(pmod(pmod(doc_id, 4294967296) * 34283, 65536) * 65536" +
          " + pmod(doc_id, 4294967296) * 51831, 4294967296)"))
      .filter(col("source") === "src0")
      .orderBy("bucket", "doc_id").limit(5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(bySource("src0").sortBy(_._2).map(_._3).toSeq == naive,
      "two-phase sample must equal the naive per-group sort prefix")
  }

  test("quality percentile threshold is the exact discrete p25 per language") {
    val rows = graft.queries.TextQueries.qualityPercentile(spark, sfDir).collect()
    val byLang = Tables(spark, sfDir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1).trim.split("\\s+").length.toLong)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(rows.map(_.getString(0)).toSet == byLang.keySet)
    rows.foreach { r =>
      val (lang, thr, nTotal, nKept) =
        (r.getString(0), r.getAs[Long]("thr"), r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      val sorted = byLang(lang)
      val rank = (sorted.length * 25 + 99) / 100 // ceil(p·n/100)
      assert(thr == sorted(rank - 1), s"$lang thr $thr != ${sorted(rank - 1)}")
      assert(nTotal == sorted.length)
      assert(nKept == sorted.count(_ >= thr))
      assert(nKept >= nTotal * 6 / 10, s"$lang kept only $nKept of $nTotal (p25 cut should keep >= ~75%)")
    }
  }

  test("XML round-trip is lossless on the nation dim") {
    BatchQueries.xmlRoundtrip(spark, sfDir).collect() // materialize the write
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.option("rowTag", "nation").schema(schema)
      .format("xml").load(s"${graft.Tables.scratchDir}/xml_roundtrip_nation")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    val orig = Tables(spark, sfDir, "nation")
      .selectExpr("CAST(n_nationkey AS INT)", "n_name", "CAST(n_regionkey AS INT)")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(back.length == orig.length && back.sameElements(orig),
      s"XML round-trip lost or changed rows: ${back.take(3).toSeq} vs ${orig.take(3).toSeq}")
  }

  test("retention triangle: day-0 cells are the cohort sizes and partition the user base") {
    val tri = queries.ExtensionQueries.retention(spark, sfDir).collect()
    val day0 = tri.filter(_.getAs[Long]("day_offset") == 0L)
    day0.foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"))
      assert(r.getAs[Double]("retention_pct") == 100.0)
    }
    // cohorts partition users: day-0 sizes sum to the distinct-user count
    val totalUsers = Tables(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(day0.map(_.getAs[Long]("n_active")).sum == totalUsers)
    // no cell can exceed its cohort and offsets are non-negative
    tri.foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"))
      assert(r.getAs[Long]("day_offset") >= 0L)
    }
  }

  test("active users: WAU bounds DAU and matches a brute-force trailing-week distinct") {
    val au = queries.ExtensionQueries.activeUsers(spark, sfDir).collect()
    assert(au.nonEmpty)
    au.foreach { r =>
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"),
        s"day ${r.getAs[Long]("day")}: wau < dau")
    }
    // brute-force WAU for three sampled days from the raw (user, day) pairs
    val pairs = Tables(spark, sfDir, "events")
      .selectExpr("user_id", "unix_timestamp(ts) div 86400 AS day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val sample = au.indices.by(math.max(1, au.length / 3)).take(3)
    sample.foreach { i =>
      val d = au(i).getAs[Long]("day")
      val brute = pairs.filter { case (_, pd) => pd >= d - 6 && pd <= d }
        .map(_._1).distinct.length.toLong
      assert(au(i).getAs[Long]("wau") == brute, s"day $d: wau != brute-force")
    }
    // the day spine is contiguous over the observed range
    val days = au.map(_.getAs[Long]("day"))
    assert(days.toSeq == (days.min to days.max).toSeq, "holes in the day spine")
  }

  test("active users emits zero-dau days (outage fixture with a short and a >week gap)") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    // active days (epoch-relative): 0, 1, 4, 15 — day 2-3 short gap,
    // 5-14 a gap longer than the trailing week (wau must reach 0)
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    val rows = Seq((1L, 0L), (2L, 0L), (1L, 1L), (1L, 4L), (3L, 15L))
      .map { case (u, d) => (u, new Timestamp((base + d * 86400L + 3600L) * 1000L)) }
    val au = queries.ExtensionQueries
      .activeUsersOf(rows.toDF("user_id", "ts"))
      .collect().map(r => r.getAs[Long]("day") - base / 86400L ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("wau"), Option(r.get(3))))).toMap
    assert(au.keySet == (0L to 15L).toSet, "spine must cover the whole range")
    assert(au(0L) == ((2L, 2L, Some(100.0))))
    assert(au(2L)._1 == 0L && au(2L)._2 == 2L && au(2L)._3.isEmpty,
      "gap day: dau=0, trailing week still populated, stickiness null")
    assert(au(4L) == ((1L, 2L, Some(50.0))))
    assert(au(11L) == ((0L, 0L, None)), "after >6 dead days the trailing week is empty")
    assert(au(15L) == ((1L, 1L, Some(100.0))))
  }

  test("unpivot is the exact inverse of the wide pivot (counts conserved, zero cells kept)") {
    val long = queries.ExtensionQueries.unpivot(spark, sfDir).collect()
    val nUsers = Tables(spark, sfDir, "events").select("user_id").distinct().count()
    assert(long.length == nUsers * 5, "one long row per user x event type")
    assert(long.map(_.getAs[Long]("cnt")).sum ==
      Tables(spark, sfDir, "events").count(), "melt conserves the event total")
    val direct = Tables(spark, sfDir, "events")
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    long.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))
      assert(r.getAs[Long]("cnt") == direct.getOrElse(key, 0L), s"cell $key")
    }
  }

  test("grouped percentiles are real elements at the exact ceil-rank positions") {
    val ps = queries.ExtensionQueries.groupPercentile(spark, sfDir).collect()
    val byType = Tables(spark, sfDir, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(ps.map(_.getString(0)).toSet == byType.keySet)
    ps.foreach { r =>
      val sorted = byType(r.getString(0))
      assert(r.getAs[Long]("n") == sorted.length.toLong)
      // note: sorting by value alone suffices here — the event_id
      // tiebreak only picks WHICH of the equal values is copied
      for ((p, k) <- Seq("p50" -> 50, "p90" -> 90, "p99" -> 99)) {
        val want = sorted((sorted.length * k + 99) / 100 - 1)
        assert(r.getAs[Double](p) == want, s"${r.getString(0)} $p")
      }
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90") &&
        r.getAs[Double]("p90") <= r.getAs[Double]("p99"))
    }
  }

  test("grouped percentiles survive heavy ties and degenerate groups (seeded random trials)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      // small value domain forces massive ties; group sizes 1..~200
      // cover the n=1 and ceil-rank==n edge cases
      val rows = (1 to 7).flatMap { g =>
        val n = 1 + rng.nextInt(40 * trial)
        (1 to n).map(i =>
          (s"g$g", rng.nextInt(5).toDouble, (g * 100000 + i).toLong))
      }
      val got = queries.ExtensionQueries
        .groupPercentileOf(rows.toDF("event_type", "value", "event_id"))
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n"), r.getAs[Double]("p50"), r.getAs[Double]("p90"), r.getAs[Double]("p99"))).toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.map(_._2).sorted
        def pick(k: Int) = sorted((sorted.length * k + 99) / 100 - 1)
        g -> ((sorted.length.toLong, pick(50), pick(90), pick(99)))
      }
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }
}
