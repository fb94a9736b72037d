package graft

import org.apache.spark.sql.functions._
import graft.functions.{MinHashSig, Shingles, SimHash64}

/** The rolling-window signature expressions must reproduce the r3
  * explode-the-shingles formulations VALUE-FOR-VALUE — the dedup
  * candidate structure (bands, agreement prefilter, Hamming radius)
  * was measured and tuned on that hash family, so the single-pass
  * kernels may not change a single bit of it. */
class TextSignaturesSpec extends SparkSpec {

  /** r3 formulation: explode distinct shingles, two masked xxhash64
    * streams, 16-way min aggregation in the 32-bit ring. */
  private def minhashViaExplode = {
    Shingles.register(spark)
    val sh = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), explode(expr("shingles(text, 12)")).as("s"))
      .withColumn("h1", xxhash64(lit(1), col("s")).bitwiseAND(0xffffffffL))
      .withColumn("h2", xxhash64(lit(2), col("s")).bitwiseAND(0xffffffffL).bitwiseOR(1L))
    val mins = (0 until 16).map { i =>
      min((col("h1") + lit(i.toLong) * col("h2")).bitwiseAND(0xffffffffL)).as(s"m$i")
    }
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until 16).map(i => col(s"m$i")): _*).as("slow"))
  }

  /** r3 formulation: explode distinct shingles, xxhash64, 16 packed
    * 16-bit-lane bit-count sums, majority assembly. */
  private def simhashViaExplode = {
    Shingles.register(spark)
    val sh = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), explode(expr("shingles(text, 12)")).as("s"))
      .withColumn("h", xxhash64(col("s")))
    val laneSums = (0 until 16).map { g =>
      val lanes = (0 until 4).map { j =>
        val b = g * 4 + j
        shiftleft(shiftright(col("h"), b).bitwiseAND(1), j * 16)
      }
      sum(lanes.reduce(_ + _)).as(s"p$g")
    }
    val perDoc = sh.groupBy("doc_id").agg(count(lit(1)).as("n"), laneSums: _*)
    val sig = (0 until 64).map { b =>
      val cnt = shiftright(col(s"p${b / 4}"), (b % 4) * 16).bitwiseAND(0xffffL)
      when(cnt * 2 > col("n"), lit(1L << b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    perDoc.select(col("doc_id"), sig.as("slow"))
  }

  test("minhash_sig equals the explode+min-agg formulation on the corpus") {
    MinHashSig.register(spark)
    val fast = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), expr("minhash_sig(text, 12, 16)").as("fast"))
    val bad = fast.join(minhashViaExplode, "doc_id")
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }

  test("simhash64 equals the explode+lane-agg formulation on the corpus") {
    SimHash64.register(spark)
    val fast = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), expr("simhash64(text, 12)").as("fast"))
    val bad = fast.join(simhashViaExplode, "doc_id")
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }

  test("signature kernels handle short, empty and multibyte texts like the explode form") {
    MinHashSig.register(spark)
    SimHash64.register(spark)
    Shingles.register(spark)
    val s = spark
    import s.implicits._
    // window byte-walking must agree with SQL substring CHARACTER
    // addressing — Greek/CJK texts exercise 2- and 3-byte UTF-8 chars
    val df = Seq("", "a", "abcdefghijk", "abcdefghijkl", "abcdefghijklm",
        "ααββγγδδεεζζηη", "数据库引擎的重复数据删除测试文本", "mixed ascii και ελληνικά 漢字")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val sh = df.select(col("doc_id"), explode(expr("shingles(text, 12)")).as("s"))
      .withColumn("h1", xxhash64(lit(1), col("s")).bitwiseAND(0xffffffffL))
      .withColumn("h2", xxhash64(lit(2), col("s")).bitwiseAND(0xffffffffL).bitwiseOR(1L))
    val mins = (0 until 16).map { i =>
      min((col("h1") + lit(i.toLong) * col("h2")).bitwiseAND(0xffffffffL)).as(s"m$i")
    }
    val slow = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until 16).map(i => col(s"m$i")): _*).as("slow"))
    val bad = df.select(col("doc_id"), expr("minhash_sig(text, 12, 16)").as("fast"))
      .join(slow, "doc_id").filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
    // simhash: the empty string still votes (one empty shingle, h of
    // zero bytes) — assert non-crash + determinism across the same set
    val sims = df.select(expr("simhash64(text, 12)").as("v")).collect().map(_.getLong(0))
    val sims2 = df.select(expr("simhash64(text, 12)").as("v")).collect().map(_.getLong(0))
    assert(sims.sameElements(sims2))
  }

  test("interpreted eval matches codegen for both kernels") {
    // force the interpreted path through a fresh expression eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq("", "abc", "the quick brown fox jumps over the lazy dog",
      "ααββγγδδεεζζηη", "repeated repeated repeated repeated")
    texts.foreach { t =>
      val lit = Literal(UTF8String.fromString(t), org.apache.spark.sql.types.StringType)
      val viaEval = graft.functions.MinHashSig(lit, 12, 16).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData].toLongArray()
      val viaKernel = graft.functions.TextSig.minhash(UTF8String.fromString(t), 12, 16).toLongArray()
      assert(viaEval.sameElements(viaKernel), s"minhash mismatch on '$t'")
      val simEval = graft.functions.SimHash64(lit, 12).eval(null).asInstanceOf[Long]
      assert(simEval == graft.functions.TextSig.simhash(UTF8String.fromString(t), 12),
        s"simhash mismatch on '$t'")
    }
  }

  test("shingle_stats equals the position-explode formulation on the corpus") {
    graft.functions.ShingleStats.register(spark)
    val fast = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), expr("shingle_stats(text, 12)").as("st"))
      .select(col("doc_id"), col("st").getItem(0).as("total"),
        col("st").getItem(1).as("dist"), col("st").getItem(2).as("top"))
    val slow = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), greatest(length(col("text")) - 11, lit(1)))).as("i"))
      .select(col("doc_id"), expr("substring(text, i, 12)").as("s"))
      .groupBy("doc_id", "s").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(sum("cnt").as("stotal"),
        count(lit(1)).as("sdist"), max("cnt").as("stop"))
    val bad = fast.join(slow, "doc_id")
      .filter(col("total") =!= col("stotal") || col("dist") =!= col("sdist")
        || col("top") =!= col("stop")).count()
    assert(bad == 0)
  }

  test("shingle_stats equals a naive reference on seeded random unicode strings") {
    // house property-test style (DetSpec): explicit seeded generation.
    // The naive reference counts character-substring multiplicities with
    // a plain Map — no hashing, no open addressing — so any kernel bug
    // in probing, growth, or byte comparison diverges.
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(1234)
    val alphabets = Seq("ab", "abcde ", "αβγ δ", "the quick brown fox ", "日本語中文한국어 ")
    def gen(): String = {
      val a = alphabets(rng.nextInt(alphabets.length))
      val n = rng.nextInt(400)
      val sb = new StringBuilder
      while (sb.length < n) {
        if (rng.nextDouble() < 0.2 && sb.nonEmpty) { // splice a repeat of a prior run
          val from = rng.nextInt(sb.length)
          sb.append(sb.substring(from, math.min(sb.length, from + rng.nextInt(30) + 1)))
        } else sb.append(a.charAt(rng.nextInt(a.length)))
      }
      sb.toString.take(n)
    }
    def naive(t: String, k: Int): Seq[Long] = {
      val nChars = t.codePointCount(0, t.length)
      // fixture alphabets are BMP-only, so String ops are char-accurate
      if (nChars <= k) return Seq(1L, 1L, 1L)
      val subs = (0 to t.length - k).map(i => t.substring(i, i + k))
      val counts = subs.groupBy(identity).view.mapValues(_.size)
      Seq(subs.size.toLong, counts.size.toLong, counts.values.max.toLong)
    }
    for (_ <- 1 to 300; k <- Seq(3, 12)) {
      val t = gen()
      val got = graft.functions.TextSig.shingleStats(UTF8String.fromString(t), k).toLongArray().toSeq
      assert(got == naive(t, k), s"k=$k text='${t.take(60)}...' (len ${t.length})")
    }
  }

  test("shingle_stats exact counts on crafted edge cases (short, multibyte, degenerate)") {
    import org.apache.spark.unsafe.types.UTF8String
    def stats(t: String, k: Int): Seq[Long] =
      graft.functions.TextSig.shingleStats(UTF8String.fromString(t), k).toLongArray().toSeq
    assert(stats("", 12) == Seq(1L, 1L, 1L))          // degenerate: one short window
    assert(stats("abc", 12) == Seq(1L, 1L, 1L))
    assert(stats("abcd", 2) == Seq(3L, 3L, 1L))        // ab bc cd
    assert(stats("aaaa", 2) == Seq(3L, 1L, 3L))        // aa ×3
    assert(stats("ababab", 2) == Seq(5L, 2L, 3L))      // ab×3 ba×2
    assert(stats("αβαβαβ", 2) == Seq(5L, 2L, 3L))      // multibyte, same shape
    // a long single-char run forces table growth past several doublings
    val run = "x" * 5000
    assert(stats(run, 12) == Seq(4989L, 1L, 4989L))
    // high-distinct text exercises growth with all-distinct windows
    val distinctText = (0 until 3000).map(i => ('a' + i % 26).toChar).mkString + "qz9"
    val st = stats(distinctText, 12)
    assert(st.head == distinctText.length - 11L && st(1) <= st.head && st(2) >= 1L)
  }
}
