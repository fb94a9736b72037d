package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det

/** Round-9e additions: resampling inference (jackknife, permutation),
  * population estimation (capture–recapture), distribution-disclosure
  * privacy audit (t-closeness), and rank-based omnibus tests — the
  * statistical-inference layer a curation pipeline runs over its own
  * aggregates. All pure built-ins, all oracled, all shaped as
  * one-corpus-pass → value-bounded finish.
  */
object AnalyticsQueries {

  /** T-CLOSENESS audit — the third rung of the disclosure-audit ladder
    * after [[ExtensionQueries.kAnonymity]] (class SIZE) and
    * [[ExtensionQueries.lDiversity]] (distinct sensitive VALUES): a
    * class can be k-anonymous and l-diverse yet still leak because its
    * sensitive-value DISTRIBUTION differs sharply from the global one
    * (e.g. 90% URGENT where the population is 20%). t is the total
    * variation distance ½·Σ|p_class − p_global| per quasi-identifier
    * class (the categorical earth-mover distance with unit ground
    * metric); the release is t-close if every class stays under t.
    *
    * Scale shape: one orders⋈customer join (custkey, the natural
    * co-partition key), one (class × value) count, then the audit
    * runs in class-cardinality space — the grid is classes × 5
    * priorities, value-bounded. EXACT: the TVD numerator
    * Σ|cnt·N − g_v·n_c| rides decimal(38,0) over the common
    * denominator 2·n_c·N (cnt·N overflows long at ~10¹¹ rows — the
    * 100 TB case); the >0.25 threshold test is the integer
    * cross-multiplication 2·num > n_c·N, no float near the boundary;
    * one fenced division at output. */
  def tCloseness(spark: SparkSession, dir: String): DataFrame =
    tClosenessOf(Tables(spark, dir, "customer"), Tables(spark, dir, "orders"))

  private[graft] def tClosenessOf(
      customer: DataFrame, orders: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val joined = customer.select(col("c_custkey"),
        col("c_nationkey"), col("c_mktsegment"),
        (Det.cents(col("c_acctbal")).cast("double") / 50000.0)
          .cast("long").as("bal_band"))
      .join(orders.select(col("o_custkey"), col("o_orderpriority")),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("bal_band"),
        col("o_orderpriority").as("v"))
    val cnt = joined.groupBy("c_nationkey", "c_mktsegment", "bal_band", "v")
      .agg(count(lit(1)).as("cnt"))
    val classTot = cnt.groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(sum("cnt").as("n_c"))
    val globTot = cnt.groupBy("v").agg(sum("cnt").as("g_v"))
    val tot = joined.agg(count(lit(1)).as("n"))
    // full class × value grid: a class MISSING a global value v leaks
    // |0 − g_v·n_c| of variation distance, so absent cells must count
    val grid = classTot.crossJoin(broadcast(globTot))
      .join(cnt, Seq("c_nationkey", "c_mktsegment", "bal_band", "v"), "left")
      .na.fill(0L, Seq("cnt"))
    val perClass = grid.crossJoin(broadcast(tot))
      .withColumn("term",
        abs(col("cnt").cast(d38) * col("n") - col("g_v").cast(d38) * col("n_c")))
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(max("n_c").as("n_c"), max("n").as("n"),
        sum(col("term").cast(d38)).as("num"))
    perClass.agg(
        count(lit(1)).as("n_classes"),
        Det.rnd(max(col("num").cast("double")
          / (col("n_c").cast("double") * col("n") * 2.0)), 6).as("max_t"),
        sum(when(col("num") * 2 > col("n_c").cast(d38) * col("n"), 1L)
          .otherwise(0L)).as("classes_gt_025"))
      .select(col("n_classes"), col("max_t"), col("classes_gt_025"),
        Det.rnd(col("classes_gt_025").cast("double") / col("n_classes"), 6)
          .as("share_gt_025"))
  }

  val tClosenessSql: String =
    s"""WITH j AS (
       |  SELECT c_nationkey, c_mktsegment,
       |         ${Det.centsSql("c_acctbal")} // 50000 AS bal_band,
       |         o_orderpriority AS v
       |  FROM customer JOIN orders ON o_custkey = c_custkey),
       |cnt AS (
       |  SELECT c_nationkey, c_mktsegment, bal_band, v, count(*) AS cnt
       |  FROM j GROUP BY 1, 2, 3, 4),
       |ct AS (
       |  SELECT c_nationkey, c_mktsegment, bal_band,
       |         CAST(sum(cnt) AS BIGINT) AS n_c
       |  FROM cnt GROUP BY 1, 2, 3),
       |gt AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS g_v FROM cnt GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
       |grid AS (
       |  SELECT ct.c_nationkey, ct.c_mktsegment, ct.bal_band, ct.n_c,
       |         gt.g_v, coalesce(cnt.cnt, 0) AS cnt
       |  FROM ct CROSS JOIN gt
       |  LEFT JOIN cnt ON cnt.c_nationkey = ct.c_nationkey
       |    AND cnt.c_mktsegment = ct.c_mktsegment
       |    AND cnt.bal_band = ct.bal_band AND cnt.v = gt.v),
       |pc AS (
       |  SELECT c_nationkey, c_mktsegment, bal_band,
       |         max(n_c) AS n_c, max(n) AS n,
       |         sum(abs(CAST(cnt AS HUGEINT) * n - CAST(g_v AS HUGEINT) * n_c)) AS num
       |  FROM grid CROSS JOIN tot GROUP BY 1, 2, 3)
       |SELECT count(*) AS n_classes,
       |       ${Det.rndSql(
            "max(CAST(num AS DOUBLE) / (CAST(n_c AS DOUBLE) * n * 2.0))", 6)} AS max_t,
       |       CAST(sum(CASE WHEN num * 2 > CAST(n_c AS HUGEINT) * n
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS classes_gt_025,
       |       ${Det.rndSql(
            "CAST(sum(CASE WHEN num * 2 > CAST(n_c AS HUGEINT) * n THEN 1 ELSE 0 END)" +
              " AS DOUBLE) / count(*)", 6)} AS share_gt_025
       |FROM pc""".stripMargin

  /** CAPTURE–RECAPTURE population estimation (Chapman's corrected
    * Lincoln–Petersen): how many users exist in total, estimated from
    * two short observation windows — the ecology estimator that data
    * pipelines reuse to size "how many distinct entities will I
    * eventually see" from limited probes (bot populations, device
    * counts, crawl frontier size) without scanning everything. Two
    * capture occasions = the first two 2-hour slices of the event
    * timeline; N̂ = (n₁+1)(n₂+1)/(m+1) − 1 with its standard error,
    * emitted next to the true distinct-user count the synthetic
    * corpus lets us audit against.
    *
    * Scale shape: ONE groupBy(user) pass computes both membership
    * flags (no per-occasion distinct jobs), then a 1-row finish; the
    * only exchange is on user_id. Estimator algebra is pure integer
    * in, fenced double out. */
  def captureRecapture(spark: SparkSession, dir: String): DataFrame =
    captureRecaptureOf(Tables(spark, dir, "events"))

  private val CaptureWin = 7200000000L // 2 h in micros

  /** Per-user occasion-membership flags — the MERGEABLE state shared
    * with the streaming twin ([[graft.streaming.StreamJobs.captureStream]]):
    * max() flags merge across arbitrary batch splits. */
  private[graft] def captureMarks(offs: DataFrame): DataFrame =
    offs.groupBy("user_id")
      .agg(max(when(col("off") < CaptureWin, 1L).otherwise(0L)).as("in_a"),
        max(when(col("off") >= CaptureWin && col("off") < 2 * CaptureWin, 1L)
          .otherwise(0L)).as("in_b"))

  /** Chapman estimator finish over the marks state (shared verbatim by
    * batch and streaming — bit-equal by construction). */
  private[graft] def chapmanFinish(marks: DataFrame): DataFrame = {
    val s = marks.agg(sum("in_a").as("n1"), sum("in_b").as("n2"),
      sum(col("in_a") * col("in_b")).as("m"), count(lit(1)).as("n_users"))
    val est = "(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1.0)"
    val se = "sqrt(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) * (n1 - m) * (n2 - m)" +
      " / ((CAST(m + 1 AS DOUBLE)) * (m + 1) * (m + 2)))"
    s.select(col("n1"), col("n2"), col("m"), col("n_users"),
      Det.rnd(expr(est), 4).as("chapman_n"),
      Det.rnd(expr(se), 4).as("chapman_se"))
  }

  private[graft] def captureRecaptureOf(events: DataFrame): DataFrame = {
    val t0d = events.agg(min(unix_micros(col("ts"))).as("t0"))
    chapmanFinish(captureMarks(events.crossJoin(broadcast(t0d))
      .select(col("user_id"), (unix_micros(col("ts")) - col("t0")).as("off"))))
  }

  val captureRecaptureSql: String = {
    val est = "(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1.0)"
    val se = "sqrt(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) * (n1 - m) * (n2 - m)" +
      " / ((CAST(m + 1 AS DOUBLE)) * (m + 1) * (m + 2)))"
    s"""WITH t0 AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
       |u AS (
       |  SELECT user_id,
       |         max(CASE WHEN epoch_us(ts) - t0 < 7200000000 THEN 1 ELSE 0 END) AS in_a,
       |         max(CASE WHEN epoch_us(ts) - t0 >= 7200000000
       |                   AND epoch_us(ts) - t0 < 14400000000 THEN 1 ELSE 0 END) AS in_b
       |  FROM events CROSS JOIN t0 GROUP BY 1),
       |s AS (
       |  SELECT CAST(sum(in_a) AS BIGINT) AS n1, CAST(sum(in_b) AS BIGINT) AS n2,
       |         CAST(sum(in_a * in_b) AS BIGINT) AS m, count(*) AS n_users
       |  FROM u)
       |SELECT n1, n2, m, n_users,
       |       ${Det.rndSql(est, 4)} AS chapman_n,
       |       ${Det.rndSql(se, 4)} AS chapman_se
       |FROM s""".stripMargin
  }

  /** DELETE-ONE-GROUP JACKKNIFE of a ratio estimator: the standard
    * error of revenue-per-customer (Σ order cents / Σ distinct
    * buyers) obtained by recomputing the ratio with each NATION's
    * contribution removed — the survey-statistics variance method for
    * nonlinear statistics where [[ExtensionQueries.bootstrapCi]]
    * resamples rows, this deletes design groups (and unlike the
    * bootstrap it is closed-form deterministic: no replicate
    * randomness at all). Emits the plug-in ratio, the jackknife SE,
    * the jackknife bias estimate (k−1)(θ̄₍·₎ − θ̂), and the ±1.96·SE
    * interval.
    *
    * Scale shape: one join + one groupBy(nation) pass collapses the
    * corpus to k≈25 group totals; every replicate is ARITHMETIC on
    * those totals against a 1-row broadcast (no k extra passes —
    * the leave-one-out identity θ₍ᵢ₎ = (S−sᵢ)/(C−cᵢ) needs only
    * sums). Replicates are exact-integer ratios; the spread is
    * computed on centered deviations (no Σr² cancellation); fences
    * only at output. */
  def jackknifeRatio(spark: SparkSession, dir: String): DataFrame =
    jackknifeRatioOf(Tables(spark, dir, "customer"), Tables(spark, dir, "orders"))

  private[graft] def jackknifeRatioOf(
      customer: DataFrame, orders: DataFrame): DataFrame = {
    val g = orders
      .select(col("o_custkey"), Det.cents(col("o_totalprice")).as("cents"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(sum("cents").as("s_i"), countDistinct(col("o_custkey")).as("c_i"))
    val tot = g.agg(sum("s_i").as("s"), sum("c_i").as("c"), count(lit(1)).as("k"))
    val reps = g.crossJoin(broadcast(tot))
      .select(col("s"), col("c"), col("k"),
        ((col("s") - col("s_i")).cast("double")
          / (col("c") - col("c_i")).cast("double")
          - col("s").cast("double") / col("c")).as("d_i"))
    val varSum = "(sd2 - sd * sd / kk)" // Σ(dᵢ−d̄)² from centered dᵢ
    reps.agg(max("k").as("kk"), max("s").as("s"), max("c").as("c"),
        sum("d_i").as("sd"), sum(col("d_i") * col("d_i")).as("sd2"))
      .select(col("kk").as("n_groups"),
        Det.rnd(col("s").cast("double") / col("c") / 100.0, 4).as("ratio_per_cust"),
        Det.rnd(sqrt(expr(s"(kk - 1.0) / kk * $varSum")) / 100.0, 4).as("jk_se"),
        Det.rnd(expr("(kk - 1.0) * (sd / kk)") / 100.0, 6).as("jk_bias"),
        Det.rnd((col("s").cast("double") / col("c")
          - expr(s"1.96 * sqrt((kk - 1.0) / kk * $varSum)")) / 100.0, 4).as("ci_lo"),
        Det.rnd((col("s").cast("double") / col("c")
          + expr(s"1.96 * sqrt((kk - 1.0) / kk * $varSum)")) / 100.0, 4).as("ci_hi"))
  }

  /** PAIRED SIGN-FLIP PERMUTATION TEST (Monte-Carlo randomization
    * inference): did per-customer spend CHANGE from 1996 to 1997? The
    * paired design's full permutation group is sign-flipping the
    * within-pair differences; each of R=256 replicates flips every
    * pair by an engine-neutral hash bit and recomputes T = Σ±dᵢ, and
    * p = (#{|T_r| ≥ |T_obs|}+1)/(R+1) — distribution-free inference
    * where [[ExtensionQueries.bootstrapCi]] gives intervals and the
    * t-test needs normality. EXACT end to end: dᵢ is integer cents,
    * every replicate statistic is an integer sum, the extremeness
    * comparison is integer — the Monte-Carlo draw is the only
    * "randomness" and it is a deterministic two-round modmul both
    * engines replay bit-equally.
    *
    * Scale shape: one groupBy(custkey) builds the pair relation; the
    * replicate stage fans each pair ×256 but aggregates immediately —
    * map-side partial sums mean the exchange carries ≤256 rows per
    * task regardless of corpus size. |T_r| rides BIGINT (overflows
    * only past ~10¹⁰ pairs × max-cents; decimal38 is the swap there). */
  def permutationTest(spark: SparkSession, dir: String): DataFrame =
    permutationTestOf(Tables(spark, dir, "orders"))

  private[graft] def permutationTestOf(orders: DataFrame): DataFrame = {
    val reps = 256
    val pairs = orders
      .select(col("o_custkey").as("k"), year(col("o_orderdate")).as("yr"),
        Det.cents(col("o_totalprice")).as("cents"))
      .filter(col("yr").isin(1996, 1997))
      .groupBy("k")
      .agg(sum(when(col("yr") === 1996, col("cents")).otherwise(0L)).as("a"),
        sum(when(col("yr") === 1997, col("cents")).otherwise(0L)).as("b"),
        max(when(col("yr") === 1996, 1L).otherwise(0L)).as("ha"),
        max(when(col("yr") === 1997, 1L).otherwise(0L)).as("hb"))
      .filter(col("ha") === 1 && col("hb") === 1)
      .select(col("k"), (col("b") - col("a")).as("d"))
    val obs = pairs.agg(count(lit(1)).as("n_pairs"), sum("d").as("t_obs"))
    val flips = pairs
      .select(col("k"), col("d"), explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .withColumn("h1", expr("pmod(k * 2654435761 + r * 40503, 4294967296)"))
      .withColumn("h2",
        expr("pmod(pmod(h1 * 34283, 65536) * 65536 + h1 * 51831, 4294967296)"))
      .groupBy("r")
      .agg(sum(when(col("h2") < 2147483648L, col("d")).otherwise(-col("d")))
        .as("t_r"))
    flips.crossJoin(broadcast(obs))
      .agg(max("n_pairs").as("n_pairs"),
        max(col("t_obs")).as("t_obs_c"),
        sum(when(abs(col("t_r")) >= abs(col("t_obs")), 1L).otherwise(0L))
          .as("n_extreme"))
      .select(col("n_pairs"),
        Det.rnd(col("t_obs_c").cast("double") / 100.0, 2).as("t_obs_dollars"),
        col("n_extreme"),
        Det.rnd((col("n_extreme").cast("double") + 1.0) / (reps + 1.0), 6)
          .as("p_value"))
  }

  val permutationTestSql: String =
    s"""WITH p0 AS (
       |  SELECT o_custkey AS k,
       |         CAST(sum(CASE WHEN year(o_orderdate) = 1996
       |                       THEN ${Det.centsSql("o_totalprice")} ELSE 0 END) AS BIGINT) AS a,
       |         CAST(sum(CASE WHEN year(o_orderdate) = 1997
       |                       THEN ${Det.centsSql("o_totalprice")} ELSE 0 END) AS BIGINT) AS b,
       |         max(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS ha,
       |         max(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) AS hb
       |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
       |  GROUP BY 1),
       |pairs AS (SELECT k, b - a AS d FROM p0 WHERE ha = 1 AND hb = 1),
       |obs AS (SELECT count(*) AS n_pairs, CAST(sum(d) AS BIGINT) AS t_obs FROM pairs),
       |f AS (
       |  SELECT r, d,
       |         (k * 2654435761 + r * 40503) % 4294967296 AS h1
       |  FROM pairs CROSS JOIN (SELECT unnest(range(256)) AS r)),
       |t AS (
       |  SELECT r,
       |         CAST(sum(CASE WHEN ((h1 * 34283) % 65536 * 65536 + h1 * 51831)
       |                            % 4294967296 < 2147483648
       |                       THEN d ELSE -d END) AS BIGINT) AS t_r
       |  FROM f GROUP BY 1)
       |SELECT max(n_pairs) AS n_pairs,
       |       ${Det.rndSql("max(CAST(t_obs AS DOUBLE)) / 100.0", 2)} AS t_obs_dollars,
       |       CAST(sum(CASE WHEN abs(t_r) >= abs(t_obs) THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_extreme,
       |       ${Det.rndSql(
            "(CAST(sum(CASE WHEN abs(t_r) >= abs(t_obs) THEN 1 ELSE 0 END) AS DOUBLE)" +
              " + 1.0) / 257.0", 6)} AS p_value
       |FROM t CROSS JOIN obs""".stripMargin

  /** BROWN–FORSYTHE TEST (the robust Levene variant): are order-value
    * VARIANCES equal across market segments? One-way ANOVA on
    * zᵢⱼ = |xᵢⱼ − median_g| — the variance-homogeneity check run
    * before trusting [[ExtensionQueries.anovaF]]'s equal-variance
    * assumption (which tests MEANS; this tests SPREADS, and uses the
    * group MEDIAN so heavy tails don't inflate the test itself).
    *
    * Scale shape: group medians come from the distinct-cents
    * HISTOGRAM (value-bounded, never a global row sort); the z
    * transform is one codegen'd pass; both ANOVA sums ride exact
    * integers (half-cent units make the two-middle median exact) —
    * Σz and Σz² per group are BIGINT/decimal38 — and the F assembly
    * is k=5 arithmetic on exact sums, fenced once. */
  def brownForsythe(spark: SparkSession, dir: String): DataFrame =
    brownForsytheOf(Tables(spark, dir, "customer"), Tables(spark, dir, "orders"))

  private[graft] def brownForsytheOf(
      customer: DataFrame, orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val seg = orders
      .select(col("o_custkey"), Det.cents(col("o_totalprice")).as("cents"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"), col("cents"))
    val hist = seg.groupBy("g", "cents").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("g").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, 0)))
    val tot = hist.groupBy("g").agg(sum("cnt").as("n_g"))
    // two-middle median in half-cents: m2 = lo + hi stays integer
    val med = hist.join(tot, Seq("g"))
      .groupBy("g")
      .agg(min(when(col("cum") >= expr("(n_g + 1) div 2"), col("cents"))).as("lo"),
        min(when(col("cum") >= expr("n_g div 2 + 1"), col("cents"))).as("hi"))
      .select(col("g"), (col("lo") + col("hi")).as("m2"))
    val z = seg.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("cents") * 2 - col("m2")).as("z"))
    val grp = z.groupBy("g")
      .agg(count(lit(1)).as("n_g"), sum("z").as("s_g"),
        sum(col("z").cast(d38) * col("z")).as("ss_g"))
    // SSB = Σ n_g·(z̄_g − z̄)², SSW = Σz² − Σ S_g²/n_g — doubles built
    // from exact integer sums, identical on both engines
    grp.agg(count(lit(1)).as("k"), sum("n_g").as("n"),
        sum("s_g").as("s"),
        sum(col("ss_g")).as("ss"),
        sum(col("s_g").cast("double") * col("s_g") / col("n_g")).as("ssq_over_n"))
      .select(col("k"), col("n"),
        Det.rnd(
          ((col("ssq_over_n") - col("s").cast("double") * col("s") / col("n"))
            / (col("k") - 1))
            / ((col("ss").cast("double") - col("ssq_over_n"))
              / (col("n") - col("k"))), 4).as("f_bf"))
  }

  val brownForsytheSql: String =
    s"""WITH seg AS (
       |  SELECT c_mktsegment AS g, ${Det.centsSql("o_totalprice")} AS cents
       |  FROM orders JOIN customer ON c_custkey = o_custkey),
       |hist AS (
       |  SELECT g, cents, count(*) AS cnt,
       |         sum(count(*)) OVER (PARTITION BY g ORDER BY cents
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM seg GROUP BY 1, 2),
       |tot AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g FROM hist GROUP BY 1),
       |med AS (
       |  SELECT h.g,
       |         min(CASE WHEN cum >= (n_g + 1) // 2 THEN cents END)
       |           + min(CASE WHEN cum >= n_g // 2 + 1 THEN cents END) AS m2
       |  FROM hist h JOIN tot USING (g) GROUP BY 1),
       |z AS (
       |  SELECT seg.g, abs(cents * 2 - m2) AS z
       |  FROM seg JOIN med ON seg.g = med.g),
       |grp AS (
       |  SELECT g, count(*) AS n_g, CAST(sum(z) AS BIGINT) AS s_g,
       |         sum(CAST(z AS HUGEINT) * z) AS ss_g
       |  FROM z GROUP BY 1),
       |a AS (
       |  SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
       |         CAST(sum(s_g) AS BIGINT) AS s,
       |         CAST(sum(ss_g) AS DOUBLE) AS ss,
       |         sum(CAST(s_g AS DOUBLE) * s_g / n_g) AS ssq_over_n
       |  FROM grp)
       |SELECT k, n,
       |       ${Det.rndSql(
            "((ssq_over_n - CAST(s AS DOUBLE) * s / n) / (k - 1))" +
              " / ((ss - ssq_over_n) / (n - k))", 4)} AS f_bf
       |FROM a""".stripMargin

  /** FRIEDMAN RANK TEST (repeated-measures omnibus): do order
    * priorities consistently out-revenue each other month after
    * month? Blocks = calendar months, treatments = the 5 priorities;
    * revenues rank WITHIN each month so scale drift across months
    * cancels — the nonparametric two-way companion to
    * [[ExtensionQueries.kruskalWallis]] (which has no blocking).
    * Kendall's W = χ²/(b(k−1)) rides along as the agreement effect
    * size. Only COMPLETE blocks (months with all k treatments) enter,
    * and the count is emitted.
    *
    * Scale shape: the corpus collapses to the (month × priority)
    * revenue matrix in one pass; ranking is a window over that
    * calendar-bounded relation. Revenue cells are exact cents so
    * ranks are integers (ties broken by priority name, identically in
    * both engines); ΣR² is integer; ONE fenced division. */
  def friedmanTest(spark: SparkSession, dir: String): DataFrame =
    friedmanTestOf(Tables(spark, dir, "orders"))

  private[graft] def friedmanTestOf(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 5
    val cells = orders
      .select(date_trunc("month", col("o_orderdate")).as("mon"),
        col("o_orderpriority").as("trt"),
        Det.cents(col("o_totalprice")).as("cents"))
      .groupBy("mon", "trt").agg(sum("cents").as("rev"))
    val complete = cells.groupBy("mon").agg(count(lit(1)).as("n_trt"))
      .filter(col("n_trt") === k).select("mon")
    val ranked = cells.join(broadcast(complete), Seq("mon"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("mon").orderBy(col("rev"), col("trt"))))
    val rsums = ranked.groupBy("trt").agg(sum("rk").as("r_j"),
      count(lit(1)).as("b"))
    rsums.agg(max("b").as("b"), sum(col("r_j") * col("r_j")).as("sr2"))
      .select(col("b").as("b_blocks"), lit(k.toLong).as("k_treatments"),
        Det.rnd(lit(12.0) * col("sr2") / (col("b") * k * (k + 1))
          - lit(3.0) * col("b") * (k + 1), 4).as("chi2_f"),
        Det.rnd((lit(12.0) * col("sr2") / (col("b") * k * (k + 1))
          - lit(3.0) * col("b") * (k + 1)) / (col("b") * (k - 1)), 6)
          .as("kendall_w"))
  }

  val friedmanTestSql: String = {
    val chi2 = "12.0 * sr2 / (b * 5 * 6) - 3.0 * b * 6"
    s"""WITH cells AS (
       |  SELECT date_trunc('month', o_orderdate) AS mon, o_orderpriority AS trt,
       |         CAST(sum(${Det.centsSql("o_totalprice")}) AS BIGINT) AS rev
       |  FROM orders GROUP BY 1, 2),
       |complete AS (
       |  SELECT mon FROM cells GROUP BY 1 HAVING count(*) = 5),
       |ranked AS (
       |  SELECT trt,
       |         row_number() OVER (PARTITION BY mon ORDER BY rev, trt) AS rk
       |  FROM cells JOIN complete USING (mon)),
       |rs AS (
       |  SELECT trt, CAST(sum(rk) AS BIGINT) AS r_j, count(*) AS b
       |  FROM ranked GROUP BY 1),
       |a AS (SELECT max(b) AS b, CAST(sum(r_j * r_j) AS BIGINT) AS sr2 FROM rs)
       |SELECT b AS b_blocks, CAST(5 AS BIGINT) AS k_treatments,
       |       ${Det.rndSql(chi2, 4)} AS chi2_f,
       |       ${Det.rndSql(s"($chi2) / (b * 4)", 6)} AS kendall_w
       |FROM a""".stripMargin
  }

  /** MATRIX PROFILE (motif + discord discovery, STAMP/STOMP family):
    * over the daily revenue series, the closest pair of
    * non-overlapping 7-day windows (the MOTIF — a repeated weekly
    * pattern) and the window whose nearest neighbor is farthest (the
    * DISCORD — the most anomalous week, the distance-based
    * changepoint [[ExtensionQueries.cusumChangepoint]] can't rank).
    * Distances are unnormalized Euclidean on exact cents so every
    * comparison — including all tie-breaks — is integer arithmetic.
    *
    * Scale shape: the corpus collapses to the dense day grid in one
    * pass (missing days are true zeros); windows are 7 leads over
    * that CALENDAR-BOUNDED relation (single-partition window by
    * design — the documented vocabulary-sized finish); the all-pairs
    * stage is windows², bounded by the calendar no matter the corpus
    * size (the same argument as Theil–Sen's month×month pair join).
    * d² rides decimal(38,0): daily cents² already passes long at
    * ~10⁵× this corpus. */
  def matrixProfile(spark: SparkSession, dir: String): DataFrame =
    matrixProfileOf(Tables(spark, dir, "events"))

  private[graft] def matrixProfileOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val byDay = events
      .select(to_date(col("ts")).as("d"), Det.cents(col("value")).as("c"))
      .groupBy("d").agg(sum("c").as("c"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"), col("d0"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(col("i").cast("long").as("i"), coalesce(col("c"), lit(0L)).as("x"))
    val w = Window.orderBy("i")
    val wins = dense.select(
      (col("i") +: (0 to 6).map(t =>
        (if (t == 0) col("x") else lead("x", t).over(w)).as(s"v$t"))): _*)
      .filter(col("v6").isNotNull)
    val a = wins.select(col("i").as("ia") +: (0 to 6).map(t => col(s"v$t").as(s"a$t")): _*)
    val b = wins.select(col("i").as("ib") +: (0 to 6).map(t => col(s"v$t").as(s"b$t")): _*)
    val pairs = a.join(b, col("ib") >= col("ia") + 7)
      .select(col("ia"), col("ib"),
        (0 to 6).map(t => (col(s"a$t") - col(s"b$t")).cast(d38)
          * (col(s"a$t") - col(s"b$t"))).reduce(_ + _).as("d2"))
    val motif = pairs.orderBy(col("d2"), col("ia"), col("ib")).limit(1)
      .select(lit("motif").as("role"), col("ia").as("day_a"),
        col("ib").as("day_b"), col("d2"))
    val sym = pairs.select(col("ia").as("i"), col("ib").as("j"), col("d2"))
      .union(pairs.select(col("ib").as("i"), col("ia").as("j"), col("d2")))
    val nn = sym.groupBy("i").agg(min("d2").as("nnd"))
    val nnj = sym.join(nn, Seq("i")).filter(col("d2") === col("nnd"))
      .groupBy("i", "nnd").agg(min("j").as("j"))
    val discord = nnj.orderBy(desc("nnd"), col("i")).limit(1)
      .select(lit("discord").as("role"), col("i").as("day_a"),
        col("j").as("day_b"), col("nnd").as("d2"))
    motif.union(discord)
      .select(col("role"), col("day_a"), col("day_b"),
        Det.rnd(sqrt(col("d2").cast("double")) / 100.0, 4).as("dist_dollars"))
      .orderBy("role")
  }

  val matrixProfileSql: String = {
    val d2 = (0 to 6).map(t =>
      s"CAST(a.v$t - b.v$t AS HUGEINT) * (a.v$t - b.v$t)").mkString(" + ")
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(${Det.centsSql("value")}) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |grid AS (SELECT unnest(range(nd + 1)) AS i, d0 FROM sp),
       |dense AS (
       |  SELECT CAST(grid.i AS BIGINT) AS i, coalesce(byday.c, 0) AS x
       |  FROM grid LEFT JOIN byday ON byday.d = grid.d0 + CAST(grid.i AS INTEGER)),
       |wins AS (
       |  SELECT i, x AS v0,
       |         ${(1 to 6).map(t => s"lead(x, $t) OVER (ORDER BY i) AS v$t")
            .mkString(", ")}
       |  FROM dense),
       |wv AS (SELECT * FROM wins WHERE v6 IS NOT NULL),
       |pairs AS (
       |  SELECT a.i AS ia, b.i AS ib, $d2 AS d2
       |  FROM wv a JOIN wv b ON b.i >= a.i + 7),
       |motif AS (
       |  SELECT 'motif' AS role, ia AS day_a, ib AS day_b, d2
       |  FROM pairs ORDER BY d2, ia, ib LIMIT 1),
       |sym AS (
       |  SELECT ia AS i, ib AS j, d2 FROM pairs
       |  UNION ALL SELECT ib, ia, d2 FROM pairs),
       |nn AS (SELECT i, min(d2) AS nnd FROM sym GROUP BY 1),
       |nnj AS (
       |  SELECT s.i, s.d2 AS nnd, min(s.j) AS j
       |  FROM sym s JOIN nn ON nn.i = s.i AND s.d2 = nn.nnd
       |  GROUP BY 1, 2),
       |discord AS (
       |  SELECT 'discord' AS role, i AS day_a, j AS day_b, nnd AS d2
       |  FROM nnj ORDER BY nnd DESC, i LIMIT 1)
       |SELECT role, day_a, day_b,
       |       ${Det.rndSql("sqrt(CAST(d2 AS DOUBLE)) / 100.0", 4)} AS dist_dollars
       |FROM (SELECT * FROM motif UNION ALL SELECT * FROM discord)
       |ORDER BY role""".stripMargin
  }

  /** LAG-1 GRANGER CAUSALITY between the daily click and purchase
    * series, BOTH directions: does adding yesterday's clicks improve
    * the autoregression of today's purchases (and vice versa)? The
    * F-statistic compares restricted (own lag only) vs unrestricted
    * (own + cross lag) OLS — the standard temporal-precedence test
    * that [[ExtensionQueries.partialCorr]] (contemporaneous) and
    * [[ExtensionQueries.olsTrend]] (trend-only) don't cover.
    *
    * Scale shape: one pass collapses the corpus to dense daily
    * counts; ALL cross-moments for both directions come from ONE
    * aggregation over the calendar-bounded lagged relation; both
    * regressions are closed-form Cramer solves on centered moments
    * (kept n-scaled so every moment is an exact integer — the
    * homogeneous F ratio cancels the scaling). Doubles enter only in
    * the final algebra on exact sums, identically on both engines. */
  def grangerCausality(spark: SparkSession, dir: String): DataFrame =
    grangerCausalityOf(Tables(spark, dir, "events"))

  /** n-scaled centered moment algebra shared by both engines:
    * given dep d, own lag l, cross lag c — F, b_own, b_cross. */
  private def grangerAlgebra(d: String, l: String, c: String): (String, String, String) = {
    def m(p: String, q: String) = s"(nn * s_${p}_${q} - s_$p * s_$q)"
    val det = s"(${m(l, l)} * ${m(c, c)} - ${m(l, c)} * ${m(l, c)})"
    val b1 = s"((${m(d, l)} * ${m(c, c)} - ${m(d, c)} * ${m(l, c)}) / $det)"
    val b2 = s"((${m(d, c)} * ${m(l, l)} - ${m(d, l)} * ${m(l, c)}) / $det)"
    val ru = s"(${m(d, d)} - $b1 * ${m(d, l)} - $b2 * ${m(d, c)})"
    val rr = s"(${m(d, d)} - ${m(d, l)} * ${m(d, l)} / ${m(l, l)})"
    (s"(($rr - $ru) * (nn - 3) / $ru)", b1, b2)
  }

  private[graft] def grangerCausalityOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = events
      .select(to_date(col("ts")).as("d"), col("event_type"))
      .groupBy("d").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("xc"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("yc"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"), col("d0"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(col("i"), coalesce(col("xc"), lit(0L)).as("x"),
        coalesce(col("yc"), lit(0L)).as("y"))
    val w = Window.orderBy("i")
    val lagged = dense
      .select(col("x"), col("y"),
        lag("x", 1).over(w).as("x1"), lag("y", 1).over(w).as("y1"))
      .filter(col("x1").isNotNull)
    // cast-BEFORE-multiply (ADVICE r9): the product must widen to
    // decimal first — (long * long) wraps silently at ~3e9/day counts
    // before a post-hoc cast could save it, and the DuckDB twin
    // widens first (CAST(x AS HUGEINT) * y), so the engines would
    // diverge exactly when it matters
    def s2(p: String, q: String) =
      sum(col(p).cast("decimal(38,0)") * col(q)).cast("double").as(s"s_${p}_${q}")
    val mom = lagged.agg(
      count(lit(1)).cast("double").as("nn"),
      sum(col("x")).cast("double").as("s_x"),
      sum(col("y")).cast("double").as("s_y"),
      sum(col("x1")).cast("double").as("s_x1"),
      sum(col("y1")).cast("double").as("s_y1"),
      s2("x", "x"), s2("y", "y"),
      s2("x", "x1"), s2("x", "y1"),
      s2("y", "y1"), s2("y", "x1"),
      s2("x1", "x1"), s2("x1", "y1"), s2("y1", "y1"))
      // the algebra reads lag-pair moments in (own, cross) order
      .withColumn("s_y1_x1", col("s_x1_y1"))
    val (fXy, bOwnXy, bCrossXy) = grangerAlgebra("y", "y1", "x1")
    val (fYx, bOwnYx, bCrossYx) = grangerAlgebra("x", "x1", "y1")
    // ONE explode, not a union: a union would recompute the corpus
    // pass per direction (the measured per-metric-union lesson)
    mom.select(explode(array(
        struct(lit("click->purchase").as("direction"),
          col("nn").cast("long").as("n_obs"),
          Det.rnd(expr(fXy), 4).as("f_stat"),
          Det.rnd(expr(bOwnXy), 6).as("beta_own_lag"),
          Det.rnd(expr(bCrossXy), 6).as("beta_cross_lag")),
        struct(lit("purchase->click").as("direction"),
          col("nn").cast("long").as("n_obs"),
          Det.rnd(expr(fYx), 4).as("f_stat"),
          Det.rnd(expr(bOwnYx), 6).as("beta_own_lag"),
          Det.rnd(expr(bCrossYx), 6).as("beta_cross_lag")))).as("r"))
      .select(col("r.direction").as("direction"), col("r.n_obs").as("n_obs"),
        col("r.f_stat").as("f_stat"), col("r.beta_own_lag").as("beta_own_lag"),
        col("r.beta_cross_lag").as("beta_cross_lag"))
      .orderBy("direction")
  }

  val grangerCausalitySql: String = {
    val (fXy, bOwnXy, bCrossXy) = grangerAlgebra("y", "y1", "x1")
    val (fYx, bOwnYx, bCrossYx) = grangerAlgebra("x", "x1", "y1")
    val prods = Seq(("x", "x"), ("y", "y"), ("x", "x1"), ("x", "y1"),
      ("y", "y1"), ("y", "x1"), ("x1", "x1"), ("x1", "y1"), ("y1", "y1"))
      .map { case (p, q) => s"CAST(sum(CAST($p AS HUGEINT) * $q) AS DOUBLE) AS s_${p}_${q}" }
      .mkString(", ") + ", CAST(sum(CAST(x1 AS HUGEINT) * y1) AS DOUBLE) AS s_y1_x1"
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS xc,
       |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS yc
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |grid AS (SELECT unnest(range(nd + 1)) AS i, d0 FROM sp),
       |dense AS (
       |  SELECT grid.i AS i, coalesce(byday.xc, 0) AS x, coalesce(byday.yc, 0) AS y
       |  FROM grid LEFT JOIN byday ON byday.d = grid.d0 + CAST(grid.i AS INTEGER)),
       |lagged AS (
       |  SELECT x, y,
       |         lag(x, 1) OVER (ORDER BY i) AS x1,
       |         lag(y, 1) OVER (ORDER BY i) AS y1
       |  FROM dense),
       |lv AS (SELECT * FROM lagged WHERE x1 IS NOT NULL),
       |mom AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS nn,
       |         CAST(sum(x) AS DOUBLE) AS s_x, CAST(sum(y) AS DOUBLE) AS s_y,
       |         CAST(sum(x1) AS DOUBLE) AS s_x1, CAST(sum(y1) AS DOUBLE) AS s_y1,
       |         $prods
       |  FROM lv)
       |SELECT * FROM (
       |  SELECT 'click->purchase' AS direction, CAST(nn AS BIGINT) AS n_obs,
       |         ${Det.rndSql(fXy, 4)} AS f_stat,
       |         ${Det.rndSql(bOwnXy, 6)} AS beta_own_lag,
       |         ${Det.rndSql(bCrossXy, 6)} AS beta_cross_lag
       |  FROM mom
       |  UNION ALL
       |  SELECT 'purchase->click' AS direction, CAST(nn AS BIGINT) AS n_obs,
       |         ${Det.rndSql(fYx, 4)} AS f_stat,
       |         ${Det.rndSql(bOwnYx, 6)} AS beta_own_lag,
       |         ${Det.rndSql(bCrossYx, 6)} AS beta_cross_lag
       |  FROM mom)
       |ORDER BY direction""".stripMargin
  }

  /** HURST EXPONENT by rescaled-range (R/S) analysis over the hourly
    * event-count series: for block sizes 16/32/64/128 hours, each full
    * block contributes R/S = (max−min of mean-adjusted cumulative
    * deviations) / (population std); H is the log-log slope of the
    * per-size mean — H≈0.5 is memoryless, H>0.5 long-range dependent
    * (bursty load that [[ExtensionQueries.autocorr]]'s fixed-lag view
    * can't summarize in one number).
    *
    * Scale shape: the corpus collapses to the dense hourly histogram
    * in one pass (calendar-bounded); the block machinery is windows
    * PARTITIONED by (size, block) over a bounded explode (hours × 4
    * sizes). EXACT: n·Yₜ = n·Cₜ − t·S_b and the variance radicand
    * n·Σx² − S_b² are integer algebra — the only floats are the final
    * ln/sqrt on exact integers and the 4-point OLS, fenced once. */
  def hurstExponent(spark: SparkSession, dir: String): DataFrame =
    hurstExponentOf(Tables(spark, dir, "events"))

  private[graft] def hurstExponentOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t0d = events.agg(min(unix_micros(col("ts"))).as("t0"),
      ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
        / 3600000000L).cast("long").as("nh"))
    val byHour = events.crossJoin(broadcast(t0d))
      .select(((unix_micros(col("ts")) - col("t0")) / 3600000000L)
        .cast("long").as("h"))
      .groupBy("h").agg(count(lit(1)).as("x"))
    val dense = t0d.select(explode(sequence(lit(0L), col("nh"))).as("h"),
        (col("nh") + 1).as("nhours"))
      .join(byHour, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"), col("nhours"))
    val sized = dense
      .select(col("h"), col("x"), col("nhours"),
        explode(array(lit(16L), lit(32L), lit(64L), lit(128L))).as("s"))
      .filter((col("h") / col("s")).cast("long") < (col("nhours") / col("s")).cast("long"))
      .select(col("s"), (col("h") / col("s")).cast("long").as("blk"),
        col("h"), col("x"))
    val w = Window.partitionBy("s", "blk").orderBy("h")
    val cum = sized
      .withColumn("c", sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t", row_number().over(w).cast("long"))
    val btot = cum.groupBy("s", "blk")
      .agg(sum("x").as("sb"), sum(col("x") * col("x")).as("sx2"))
    val rs = cum.join(btot, Seq("s", "blk"))
      .select(col("s"), col("blk"), col("sb"), col("sx2"),
        (col("s") * col("c") - col("t") * col("sb")).as("ny"))
      .groupBy("s", "blk")
      .agg((max("ny") - min("ny")).as("rsc"), max("sb").as("sb"),
        max("sx2").as("sx2"))
      .withColumn("denom", col("s") * col("sx2") - col("sb") * col("sb"))
      .filter(col("denom") > 0 && col("rsc") > 0) // constant/flat blocks drop
      .select(col("s"),
        log(col("rsc").cast("double") / sqrt(col("denom").cast("double")))
          .as("lrs"))
    val pts = rs.groupBy("s")
      .agg(avg("lrs").as("m"), count(lit(1)).as("n_blocks"))
      .select(log(col("s").cast("double")).as("lx"), col("m"))
    pts.agg(count(lit(1)).cast("double").as("k"),
        sum("lx").as("sx"), sum("m").as("sy"),
        sum(col("lx") * col("m")).as("sxy"),
        sum(col("lx") * col("lx")).as("sxx"))
      .select(col("k").cast("long").as("n_sizes"),
        Det.rnd(expr("(k * sxy - sx * sy) / (k * sxx - sx * sx)"), 4)
          .as("hurst_h"),
        Det.rnd(expr("(sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k"), 4)
          .as("intercept"))
  }

  val hurstExponentSql: String =
    s"""WITH t0 AS (
       |  SELECT min(epoch_us(ts)) AS t0,
       |         (max(epoch_us(ts)) - min(epoch_us(ts))) // 3600000000 AS nh
       |  FROM events),
       |byhour AS (
       |  SELECT (epoch_us(ts) - t0) // 3600000000 AS h, count(*) AS x
       |  FROM events CROSS JOIN t0 GROUP BY 1),
       |dense AS (
       |  SELECT g.h, coalesce(byhour.x, 0) AS x, g.nhours
       |  FROM (SELECT unnest(range(nh + 1)) AS h, nh + 1 AS nhours FROM t0) g
       |  LEFT JOIN byhour ON byhour.h = g.h),
       |sized AS (
       |  SELECT s, h // s AS blk, h, x
       |  FROM dense CROSS JOIN (SELECT unnest([16, 32, 64, 128]) AS s)
       |  WHERE h // s < nhours // s),
       |cum AS (
       |  SELECT s, blk, x,
       |         sum(x) OVER (PARTITION BY s, blk ORDER BY h
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
       |         CAST(row_number() OVER (PARTITION BY s, blk ORDER BY h) AS BIGINT) AS t
       |  FROM sized),
       |btot AS (
       |  SELECT s, blk, CAST(sum(x) AS BIGINT) AS sb,
       |         CAST(sum(x * x) AS BIGINT) AS sx2
       |  FROM cum GROUP BY 1, 2),
       |rs AS (
       |  SELECT c.s, c.blk,
       |         CAST(max(c.s * c.c - c.t * b.sb)
       |              - min(c.s * c.c - c.t * b.sb) AS BIGINT) AS rsc,
       |         max(b.sb) AS sb, max(b.sx2) AS sx2
       |  FROM cum c JOIN btot b ON b.s = c.s AND b.blk = c.blk
       |  GROUP BY 1, 2),
       |lrs AS (
       |  SELECT s, ln(CAST(rsc AS DOUBLE) / sqrt(CAST(s * sx2 - sb * sb AS DOUBLE))) AS lrs
       |  FROM rs WHERE s * sx2 - sb * sb > 0 AND rsc > 0),
       |pts AS (
       |  SELECT ln(CAST(s AS DOUBLE)) AS lx, avg(lrs) AS m
       |  FROM lrs GROUP BY s),
       |a AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS k, sum(lx) AS sx, sum(m) AS sy,
       |         sum(lx * m) AS sxy, sum(lx * lx) AS sxx
       |  FROM pts)
       |SELECT CAST(k AS BIGINT) AS n_sizes,
       |       ${Det.rndSql("(k * sxy - sx * sy) / (k * sxx - sx * sx)", 4)} AS hurst_h,
       |       ${Det.rndSql(
            "(sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k", 4)} AS intercept
       |FROM a""".stripMargin

  /** HAAR WAVELET ENERGY DECOMPOSITION of the daily revenue series:
    * unnormalized dyadic detail coefficients d_{k,i} = (left-half sum
    * − right-half sum) of block i at scale 2ᵏ, with the series
    * zero-padded to the next power of two (the pad is chosen by
    * integer comparison, not float log2). The per-level energy shares
    * localize WHERE the variance lives in time-scale — day-to-day
    * noise vs weekly structure vs the month trend — the
    * multi-resolution view [[ExtensionQueries.stlDecompose]]'s fixed
    * weekly split doesn't give. Level 0 is the approximation (total
    * sum).
    *
    * Scale shape: one pass to the calendar-bounded daily histogram;
    * the transform is an explode over (days × levels) — still
    * calendar-bounded — then one groupBy(level, block). EXACT: cents
    * sums and signed differences are integers; energies ride
    * decimal(38,0); one fenced share division per level. */
  def haarEnergy(spark: SparkSession, dir: String): DataFrame =
    haarEnergyOf(Tables(spark, dir, "events"))

  private[graft] def haarEnergyOf(events: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val byDay = events
      .select(to_date(col("ts")).as("d"), Det.cents(col("value")).as("c"))
      .groupBy("d").agg(sum("c").as("c"))
    val span = byDay.agg(min(col("d")).as("d0"),
      (datediff(max(col("d")), min(col("d"))) + 1).as("n"))
    // next power of two ≥ n by integer comparison over exponents 1..20
    val pexp = span.select(col("d0"), col("n"),
        explode(sequence(lit(1), lit(20))).as("p"))
      .filter(expr("shiftleft(CAST(1 AS BIGINT), p) >= n"))
      .groupBy("d0", "n").agg(min("p").as("lmax"))
    val dense = pexp
      .select(col("d0"), col("lmax"),
        explode(expr(
          "sequence(CAST(0 AS BIGINT), shiftleft(CAST(1 AS BIGINT), lmax) - 1)"))
          .as("i"))
      .join(byDay, expr("date_add(d0, CAST(i AS INT)) = d"), "left")
      .select(col("i"), coalesce(col("c"), lit(0L)).as("x"), col("lmax"))
    val detail = dense
      .select(col("i"), col("x"), explode(sequence(lit(1), col("lmax"))).as("k"))
      .select(col("k"), expr("shiftright(i, k)").as("blk"),
        expr("CASE WHEN i % shiftleft(CAST(1 AS BIGINT), k)" +
          " < shiftleft(CAST(1 AS BIGINT), k - 1) THEN x ELSE -x END").as("sx"))
      .groupBy("k", "blk").agg(sum("sx").as("dcoef"))
      .groupBy("k").agg(count(lit(1)).as("n_coeffs"),
        sum((col("dcoef").cast(d38)) * col("dcoef")).as("energy"))
    val approx = dense.agg(sum("x").as("s"))
      .select(lit(0).as("k"), lit(1L).as("n_coeffs"),
        (col("s").cast(d38) * col("s")).as("energy"))
    val all = detail.union(approx)
    val tot = all.agg(sum(col("energy")).as("te"))
    all.crossJoin(broadcast(tot))
      .select(col("k").cast("long").as("level"), col("n_coeffs"),
        Det.rnd(col("energy").cast("double") / 10000.0, 4).as("energy_d2"),
        Det.rnd(col("energy").cast("double") / col("te").cast("double"), 6)
          .as("energy_share"))
      .orderBy("level")
  }

  val haarEnergySql: String =
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(${Det.centsSql("value")}) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) + 1 AS n FROM byday),
       |pe AS (
       |  SELECT d0, n, min(p) AS lmax
       |  FROM sp CROSS JOIN (SELECT unnest(range(1, 21)) AS p)
       |  WHERE (CAST(1 AS BIGINT) << p) >= n GROUP BY 1, 2),
       |dense AS (
       |  SELECT g.i, coalesce(byday.c, 0) AS x, g.lmax
       |  FROM (SELECT unnest(range(CAST(1 AS BIGINT) << lmax)) AS i, d0, lmax
       |        FROM pe) g
       |  LEFT JOIN byday ON byday.d = g.d0 + CAST(g.i AS INTEGER)),
       |det AS (
       |  SELECT k, i >> k AS blk,
       |         CASE WHEN i % (CAST(1 AS BIGINT) << k)
       |                   < (CAST(1 AS BIGINT) << (k - 1))
       |              THEN x ELSE -x END AS sx
       |  FROM dense CROSS JOIN (SELECT unnest(range(1, 21)) AS k)
       |  WHERE k <= lmax),
       |dc AS (
       |  SELECT k, blk, CAST(sum(sx) AS BIGINT) AS dcoef
       |  FROM det GROUP BY 1, 2),
       |lev AS (
       |  SELECT k, count(*) AS n_coeffs,
       |         sum(CAST(dcoef AS HUGEINT) * dcoef) AS energy
       |  FROM dc GROUP BY 1),
       |app AS (
       |  SELECT 0 AS k, CAST(1 AS BIGINT) AS n_coeffs,
       |         (SELECT CAST(sum(x) AS HUGEINT) * CAST(sum(x) AS HUGEINT)
       |          FROM dense) AS energy),
       |allv AS (SELECT * FROM lev UNION ALL SELECT * FROM app),
       |tot AS (SELECT sum(energy) AS te FROM allv)
       |SELECT CAST(k AS BIGINT) AS level, n_coeffs,
       |       ${Det.rndSql("CAST(energy AS DOUBLE) / 10000.0", 4)} AS energy_d2,
       |       ${Det.rndSql("CAST(energy AS DOUBLE) / CAST(te AS DOUBLE)", 6)}
       |         AS energy_share
       |FROM allv CROSS JOIN tot
       |ORDER BY level""".stripMargin

  /** ROLLING-ORIGIN FORECAST BACKTEST over the daily revenue series:
    * the last 14 days are the holdout; for each holdout day the NAIVE
    * (yesterday) and SEASONAL-NAIVE (same weekday last week) one-step
    * forecasts are scored with MAE, sMAPE, and MASE (error scaled by
    * the TRAINING-period seasonal-naive MAE — the standard
    * scale-free comparison). This is the evaluation harness that
    * turns [[ExtensionQueries.ewmaForecast]]/[[ExtensionQueries.joinForecast]]
    * from "a forecast" into "a measured forecast".
    *
    * Scale shape: one pass to the calendar-bounded daily histogram;
    * both forecasts are lag() windows over it; all error sums are
    * exact integer cents (sMAPE's per-day ratio is the one
    * non-integer — a deterministic double from exact cents); two
    * output rows ride a single explode, not a re-computing union. */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame =
    forecastBacktestOf(Tables(spark, dir, "events"))

  private[graft] def forecastBacktestOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = events
      .select(to_date(col("ts")).as("d"), Det.cents(col("value")).as("c"))
      .groupBy("d").agg(sum("c").as("c"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"),
        col("d0"), col("nd"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(col("i").cast("long").as("i"),
        coalesce(col("c"), lit(0L)).as("x"), col("nd").cast("long").as("nd"))
    val w = Window.orderBy("i")
    val lagged = dense
      .withColumn("f1", lag("x", 1).over(w))
      .withColumn("f7", lag("x", 7).over(w))
      .filter(col("f7").isNotNull)
      .withColumn("is_test", col("i") > col("nd") - 14)
    val agg = lagged.agg(
      sum(when(col("is_test"), 1L).otherwise(0L)).as("n_test"),
      sum(when(col("is_test"), abs(col("x") - col("f1"))).otherwise(0L)).as("ae1"),
      sum(when(col("is_test"), abs(col("x") - col("f7"))).otherwise(0L)).as("ae7"),
      sum(when(col("is_test"),
        when(col("x") + col("f1") > 0,
          abs(col("x") - col("f1")).cast("double") * 2
            / (col("x") + col("f1"))).otherwise(0.0)).otherwise(0.0)).as("sm1"),
      sum(when(col("is_test"),
        when(col("x") + col("f7") > 0,
          abs(col("x") - col("f7")).cast("double") * 2
            / (col("x") + col("f7"))).otherwise(0.0)).otherwise(0.0)).as("sm7"),
      sum(when(!col("is_test"), abs(col("x") - col("f7"))).otherwise(0L)).as("tae"),
      sum(when(!col("is_test"), 1L).otherwise(0L)).as("n_train"))
    agg.select(explode(array(
        struct(lit("naive").as("method"), col("n_test"),
          Det.rnd(col("ae1").cast("double") / col("n_test") / 100.0, 4).as("mae"),
          Det.rnd(col("sm1") / col("n_test"), 6).as("smape"),
          Det.rnd(col("ae1").cast("double") * col("n_train")
            / (col("n_test") * col("tae").cast("double")), 4).as("mase")),
        struct(lit("snaive").as("method"), col("n_test"),
          Det.rnd(col("ae7").cast("double") / col("n_test") / 100.0, 4).as("mae"),
          Det.rnd(col("sm7") / col("n_test"), 6).as("smape"),
          Det.rnd(col("ae7").cast("double") * col("n_train")
            / (col("n_test") * col("tae").cast("double")), 4).as("mase")))).as("r"))
      .select(col("r.method").as("method"), col("r.n_test").as("n_test"),
        col("r.mae").as("mae"), col("r.smape").as("smape"),
        col("r.mase").as("mase"))
      .orderBy("method")
  }

  val forecastBacktestSql: String = {
    def mrow(tag: String, ae: String, sm: String) =
      s"""SELECT '$tag' AS method, n_test,
         |       ${Det.rndSql(s"CAST($ae AS DOUBLE) / n_test / 100.0", 4)} AS mae,
         |       ${Det.rndSql(s"$sm / n_test", 6)} AS smape,
         |       ${Det.rndSql(
          s"CAST($ae AS DOUBLE) * n_train / (n_test * CAST(tae AS DOUBLE))", 4)} AS mase
         |FROM agg""".stripMargin
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(${Det.centsSql("value")}) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |dense AS (
       |  SELECT CAST(g.i AS BIGINT) AS i, coalesce(byday.c, 0) AS x,
       |         CAST(g.nd AS BIGINT) AS nd
       |  FROM (SELECT unnest(range(nd + 1)) AS i, d0, nd FROM sp) g
       |  LEFT JOIN byday ON byday.d = g.d0 + CAST(g.i AS INTEGER)),
       |lagged AS (
       |  SELECT i, x, nd,
       |         lag(x, 1) OVER (ORDER BY i) AS f1,
       |         lag(x, 7) OVER (ORDER BY i) AS f7
       |  FROM dense),
       |lv AS (SELECT *, i > nd - 14 AS is_test FROM lagged WHERE f7 IS NOT NULL),
       |agg AS (
       |  SELECT CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
       |         CAST(sum(CASE WHEN is_test THEN abs(x - f1) ELSE 0 END) AS BIGINT) AS ae1,
       |         CAST(sum(CASE WHEN is_test THEN abs(x - f7) ELSE 0 END) AS BIGINT) AS ae7,
       |         sum(CASE WHEN is_test AND x + f1 > 0
       |                  THEN CAST(abs(x - f1) AS DOUBLE) * 2 / (x + f1)
       |                  ELSE 0.0 END) AS sm1,
       |         sum(CASE WHEN is_test AND x + f7 > 0
       |                  THEN CAST(abs(x - f7) AS DOUBLE) * 2 / (x + f7)
       |                  ELSE 0.0 END) AS sm7,
       |         CAST(sum(CASE WHEN NOT is_test THEN abs(x - f7) ELSE 0 END) AS BIGINT) AS tae,
       |         CAST(sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS BIGINT) AS n_train
       |  FROM lv)
       |SELECT * FROM (
       |${mrow("naive", "ae1", "sm1")}
       |UNION ALL
       |${mrow("snaive", "ae7", "sm7")})
       |ORDER BY method""".stripMargin
  }

  private val MkRounds = 24
  private val MkScale = 1000000000000L // value iteration in 1e-12 units

  /** MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al.): build the
    * first-order journey chain start → {click,view,signup,error} →
    * {conv,null} from each user's event sequence up to their FIRST
    * purchase, compute the conversion-absorption probability by value
    * iteration, and per channel the REMOVAL EFFECT 1 − P(conv |
    * channel blocked) / P(conv) — the path-aware attribution that
    * [[ExtensionQueries.shapleyAttribution]] (set-based, order-free)
    * and [[ExtensionQueries.attribution]] (position rules) don't
    * capture: a channel that only relays traffic INTO converting
    * channels still earns credit here.
    *
    * Scale shape: one window pass extracts transitions (partitioned
    * by user_id — the shuffle key); the chain collapses to a ≤
    * 7×7-count relation, and ALL five variants (base + 4 removals)
    * ride ONE value iteration over a (variant × state) relation of ≤
    * 30 rows — blocking a channel is reading its value as 0, so no
    * per-variant chain rebuild. Determinism: the iteration is exact
    * scaled-integer ([[MkScale]] units) with truncating division,
    * bit-reproducible on both engines (the [[SimilarityQueries.pageRank]]
    * contract); [[MkRounds]] unrolled rounds are identical in the
    * oracle, so even pre-convergence residue replays bit-equally. */
  def markovAttribution(spark: SparkSession, dir: String): DataFrame =
    markovAttributionOf(Tables(spark, dir, "events"))

  private[graft] def markovAttributionOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tus"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val fp = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("tus").as("ftus"), col("event_id").as("feid"))
    val j = ev.join(fp, Seq("user_id"), "left")
      .filter(col("ftus").isNull || col("tus") < col("ftus")
        || (col("tus") === col("ftus") && col("event_id") <= col("feid")))
    val seqT = j
      .withColumn("prev", lag("event_type", 1).over(w))
      .select(coalesce(col("prev"), lit("start")).as("s"),
        when(col("event_type") === "purchase", lit("conv"))
          .otherwise(col("event_type")).as("t"))
    val wd = Window.partitionBy("user_id").orderBy(desc("tus"), desc("event_id"))
    val lastE = j.filter(col("ftus").isNull)
      .withColumn("rn", row_number().over(wd)).filter(col("rn") === 1)
      .select(col("event_type").as("s"), lit("null").as("t"))
    val trans = seqT.union(lastE).groupBy("s", "t")
      .agg(count(lit(1)).as("cnt")).localCheckpoint() // ≤ 7×7 rows
    val outdeg = trans.groupBy("s").agg(sum("cnt").as("o"))
    val variants = Seq("none", "click", "view", "signup", "error")
    var v = outdeg.select(col("s"),
        explode(array(variants.map(lit): _*)).as("variant"))
      .withColumn("val", lit(0L))
    for (_ <- 1 to MkRounds) {
      val upd = outdeg
        .select(col("s"), col("o"), explode(array(variants.map(lit): _*)).as("variant"))
        .join(trans.withColumnRenamed("s", "ts_"), col("ts_") === col("s"))
        .join(v.select(col("variant").as("pv_var"), col("s").as("pv_s"),
          col("val").as("pval")),
          col("pv_var") === col("variant") && col("pv_s") === col("t"), "left")
        .withColumn("ev", when(col("t") === "conv", lit(MkScale))
          .when(col("t") === "null", lit(0L))
          .when(col("t") === col("variant"), lit(0L))
          .otherwise(coalesce(col("pval"), lit(0L))))
        .groupBy("variant", "s", "o")
        .agg(sum(col("cnt") * col("ev")).as("sv"))
        .select(col("variant"), col("s"), expr("sv div o").as("val"))
      // NOTE (r15 optimization pass): batching these checkpoints to
      // every 6th round (lazy 6-round segments; v IS single-consumption
      // so the chain stays linear) was MEASURED SLOWER (3.2s → 5.5s at
      // sf0.1) — the 6-deep join/explode segments cost more in
      // planning + chained stages than the 24 tiny eager jobs they
      // replaced. Per-round localCheckpoint kept on purpose.
      v = upd.localCheckpoint() // (variant × state)-bounded
    }
    val starts = v.filter(col("s") === "start")
    val baseV = starts.filter(col("variant") === "none")
      .select(col("val").as("pb"))
    val chans = starts.filter(col("variant") =!= "none")
      .crossJoin(broadcast(baseV))
    val totRem = chans.agg(sum(col("pb") - col("val")).as("tr"))
    chans.crossJoin(broadcast(totRem))
      .select(col("variant").as("channel"),
        Det.rnd(col("pb").cast("double") / MkScale, 6).as("p_conv_base"),
        Det.rnd(col("val").cast("double") / MkScale, 6).as("p_conv_removed"),
        Det.rnd((col("pb") - col("val")).cast("double") / col("pb"), 6)
          .as("removal_effect"),
        Det.rnd((col("pb") - col("val")).cast("double") / col("tr"), 6)
          .as("attribution"))
      .orderBy("channel")
  }

  val markovAttributionSql: String = {
    val rounds = (1 to MkRounds).map { r =>
      val prev = s"v${r - 1}"
      s"""v$r AS MATERIALIZED (
         |  SELECT nv.variant, nv.s,
         |         CAST(coalesce(sum(tr.cnt *
         |           CASE WHEN tr.t = 'conv' THEN $MkScale
         |                WHEN tr.t = 'null' THEN 0
         |                WHEN tr.t = nv.variant THEN 0
         |                ELSE coalesce(pv.val, 0) END), 0) // nv.o AS BIGINT) AS val
         |  FROM nv JOIN tr ON tr.s = nv.s
         |       LEFT JOIN $prev pv ON pv.variant = nv.variant AND pv.s = tr.t
         |  GROUP BY nv.variant, nv.s, nv.o)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
       |fp AS (
       |  SELECT user_id, tus AS ftus, event_id AS feid
       |  FROM (SELECT user_id, tus, event_id,
       |               row_number() OVER (PARTITION BY user_id
       |                 ORDER BY tus, event_id) AS rn
       |        FROM ev WHERE event_type = 'purchase')
       |  WHERE rn = 1),
       |j AS (
       |  SELECT ev.* FROM ev LEFT JOIN fp USING (user_id)
       |  WHERE ftus IS NULL OR tus < ftus
       |     OR (tus = ftus AND event_id <= feid)),
       |sq AS (
       |  SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id
       |           ORDER BY tus, event_id), 'start') AS s,
       |         CASE WHEN event_type = 'purchase' THEN 'conv'
       |              ELSE event_type END AS t
       |  FROM j),
       |le AS (
       |  SELECT event_type AS s, 'null' AS t
       |  FROM (SELECT j.event_type,
       |               row_number() OVER (PARTITION BY j.user_id
       |                 ORDER BY tus DESC, event_id DESC) AS rn
       |        FROM j LEFT JOIN fp USING (user_id) WHERE ftus IS NULL)
       |  WHERE rn = 1),
       |tr AS MATERIALIZED (
       |  SELECT s, t, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT * FROM sq UNION ALL SELECT * FROM le) GROUP BY 1, 2),
       |outdeg AS (SELECT s, CAST(sum(cnt) AS BIGINT) AS o FROM tr GROUP BY 1),
       |nv AS MATERIALIZED (
       |  SELECT variant, s, o FROM outdeg CROSS JOIN
       |    (SELECT unnest(['none', 'click', 'view', 'signup', 'error']) AS variant)),
       |v0 AS (SELECT variant, s, CAST(0 AS BIGINT) AS val FROM nv),
       |$rounds,
       |starts AS (SELECT variant, val FROM v$MkRounds WHERE s = 'start'),
       |base AS (SELECT val AS pb FROM starts WHERE variant = 'none'),
       |chans AS (
       |  SELECT variant, val, pb FROM starts CROSS JOIN base
       |  WHERE variant <> 'none'),
       |trm AS (SELECT CAST(sum(pb - val) AS BIGINT) AS tr FROM chans)
       |SELECT variant AS channel,
       |       ${Det.rndSql(s"CAST(pb AS DOUBLE) / $MkScale", 6)} AS p_conv_base,
       |       ${Det.rndSql(s"CAST(val AS DOUBLE) / $MkScale", 6)} AS p_conv_removed,
       |       ${Det.rndSql("CAST(pb - val AS DOUBLE) / pb", 6)} AS removal_effect,
       |       ${Det.rndSql("CAST(pb - val AS DOUBLE) / tr", 6)} AS attribution
       |FROM chans CROSS JOIN trm
       |ORDER BY channel""".stripMargin
  }

  /** CROSS-CORRELATION FUNCTION (CCF) LAG SCAN between the daily
    * click and purchase series: Pearson correlation of (clicks_t,
    * purchases_{t+l}) for every lag l ∈ [−7, +7] — the lag-
    * identification companion to [[grangerCausality]] (which fixes
    * lag 1 and tests significance; this locates WHERE the
    * lead-lag relationship peaks, e.g. "purchases follow clicks by 2
    * days"). The best row is flagged (max correlation, ties to the
    * smallest lag).
    *
    * Scale shape: the corpus collapses once to the dense daily grid;
    * the lag fan-out is a calendar-bounded explode joined back on the
    * shifted day index (an EQUI join — no theta join); per-lag
    * Pearson comes from exact integer moments, fenced once per row. */
  def ccfLagScan(spark: SparkSession, dir: String): DataFrame =
    ccfLagScanOf(Tables(spark, dir, "events"))

  private[graft] def ccfLagScanOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = events
      .select(to_date(col("ts")).as("d"), col("event_type"))
      .groupBy("d").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("xc"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("yc"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"), col("d0"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(col("i").cast("long").as("i"),
        coalesce(col("xc"), lit(0L)).as("x"), coalesce(col("yc"), lit(0L)).as("y"))
      .localCheckpoint() // calendar-bounded; joined once per lag side
    val pairs = dense
      .select(col("i"), col("x"), explode(sequence(lit(-7), lit(7))).as("l"))
      .withColumn("j", col("i") + col("l"))
      .join(dense.select(col("i").as("j"), col("y")), Seq("j"))
    val corr = pairs.groupBy("l").agg(
        count(lit(1)).cast("double").as("n"),
        sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"))
      .select(col("l").cast("long").as("lag"), col("n").cast("long").as("n_days"),
        Det.rnd(expr("(n * sxy - sx * sy)" +
          " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"), 6).as("ccf"))
      .localCheckpoint() // 15 rows; read twice (best pick + output)
    val best = corr.orderBy(desc("ccf"), asc("lag")).limit(1)
      .select(col("lag").as("bl"))
    corr.crossJoin(broadcast(best))
      .select(col("lag"), col("n_days"), col("ccf"),
        (col("lag") === col("bl")).as("is_best"))
      .orderBy("lag")
  }

  val ccfLagScanSql: String =
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS xc,
       |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS yc
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |dense AS (
       |  SELECT CAST(g.i AS BIGINT) AS i, coalesce(byday.xc, 0) AS x,
       |         coalesce(byday.yc, 0) AS y
       |  FROM (SELECT unnest(range(nd + 1)) AS i, d0 FROM sp) g
       |  LEFT JOIN byday ON byday.d = g.d0 + CAST(g.i AS INTEGER)),
       |p AS (
       |  SELECT a.l, a.x, d2.y
       |  FROM (SELECT i, x, l, i + l AS j FROM dense
       |        CROSS JOIN (SELECT unnest(range(-7, 8)) AS l)) a
       |  JOIN dense d2 ON d2.i = a.j),
       |mom AS (
       |  SELECT l, CAST(count(*) AS DOUBLE) AS n,
       |         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
       |         CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
       |         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
       |         CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
       |  FROM p GROUP BY 1),
       |corr AS (
       |  SELECT CAST(l AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
       |         ${Det.rndSql("(n * sxy - sx * sy)" +
            " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))", 6)} AS ccf
       |  FROM mom),
       |best AS (SELECT lag AS bl FROM corr ORDER BY ccf DESC, lag LIMIT 1)
       |SELECT lag, n_days, ccf, lag = bl AS is_best
       |FROM corr CROSS JOIN best
       |ORDER BY lag""".stripMargin

  /** ORDER-INDEPENDENT TABLE CHECKSUM (content digest): each order row
    * canonicalizes to a delimited string, hashes to a 60-bit integer
    * (md5-derived — engine-neutral), and the per-year and whole-table
    * digests are the hash SUMS mod 2⁶¹ — identical no matter how the
    * table is partitioned, ordered, or which engine computes it. This
    * is the replication/migration verification primitive ("did the
    * copy arrive bit-identical?") that [[ExtensionQueries.reconciliation]]'s
    * aggregate comparisons approximate: a single flipped character
    * anywhere changes the digest, and the per-year subtotals localize
    * WHICH slice diverged without re-scanning everything.
    *
    * Scale shape: one narrow scan, hash as a codegen'd projection,
    * ROLLUP aggregation with map-side partials; the modular sum rides
    * decimal(38,0) (hash sums pass 2⁶³ at ~15 rows). Pure integer
    * output — no floats anywhere. */
  def tableChecksum(spark: SparkSession, dir: String): DataFrame =
    tableChecksumOf(Tables(spark, dir, "orders"))

  /** The digest's MERGEABLE state — per-year (row count, raw hash
    * sum) — shared with the streaming twin
    * ([[graft.streaming.StreamJobs.checksumStream]]): counts and
    * decimal sums are additive across any batch split; the mod-2⁶¹
    * fold happens only in the finish. */
  /** Shared canonical-row string for both checksum tiers: every field
    * rides an explicit coalesce sentinel (ADVICE r9) — concat_ws
    * silently SKIPS null args (distinct rows could canonicalize
    * identically) while the DuckDB twin's || chain NULLs the whole
    * hash and drops the row from the digest; for a replication-
    * verification primitive both engines must see the same
    * collision-free canonical string, so NULL becomes a sentinel
    * token on both sides. */
  private val ChecksumCanon =
    "concat_ws('|', coalesce(CAST(o_orderkey AS STRING), '<NULL>'), " +
      "coalesce(CAST(o_custkey AS STRING), '<NULL>'), " +
      "coalesce(o_orderstatus, '<NULL>'), " +
      "coalesce(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), '<NULL>'), " +
      "coalesce(date_format(o_orderdate, 'yyyy-MM-dd'), '<NULL>'), " +
      "coalesce(o_orderpriority, '<NULL>'))"

  private[graft] def checksumState(orders: DataFrame): DataFrame = {
    val canon = ChecksumCanon
    orders
      .select(year(col("o_orderdate")).as("yr"),
        expr(s"CAST(conv(substring(md5($canon), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
      .groupBy("yr")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h").cast("decimal(38,0)")).as("hs"))
  }

  /** Per-year + ALL digests from the state (equals the batch ROLLUP
    * output because the mod distributes over the raw decimal sums). */
  private[graft] def checksumFinish(state: DataFrame): DataFrame = {
    val modSql = "CAST(pmod(hs, 2305843009213693952) AS BIGINT)"
    val years = state.select(col("yr").cast("string").as("scope"),
      col("n_rows"), expr(modSql).as("checksum"))
    val all = state.agg(sum("n_rows").as("n_rows"), sum("hs").as("hs"))
      .select(lit("ALL").as("scope"), col("n_rows"), expr(modSql).as("checksum"))
    years.union(all).orderBy("scope")
  }

  private[graft] def tableChecksumOf(orders: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val canon = ChecksumCanon
    orders
      .select(year(col("o_orderdate")).as("yr"),
        expr(s"CAST(conv(substring(md5($canon), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
      .rollup("yr")
      .agg(count(lit(1)).as("n_rows"),
        expr(s"CAST(pmod(sum(CAST(h AS $d38)), 2305843009213693952) AS BIGINT)")
          .as("checksum"))
      .select(coalesce(col("yr").cast("string"), lit("ALL")).as("scope"),
        col("n_rows"), col("checksum"))
      .orderBy("scope")
  }

  val tableChecksumSql: String = {
    // mirror of the Spark side's per-field NULL sentinels (ADVICE r9)
    val canon = "coalesce(CAST(o_orderkey AS VARCHAR), '<NULL>') || '|' || " +
      "coalesce(CAST(o_custkey AS VARCHAR), '<NULL>') || '|' || " +
      "coalesce(o_orderstatus, '<NULL>') || '|' || " +
      s"coalesce(CAST(${Det.centsSql("o_totalprice")} AS VARCHAR), '<NULL>') || '|' || " +
      "coalesce(strftime(o_orderdate, '%Y-%m-%d'), '<NULL>') || '|' || " +
      "coalesce(o_orderpriority, '<NULL>')"
    s"""SELECT coalesce(CAST(yr AS VARCHAR), 'ALL') AS scope,
       |       count(*) AS n_rows,
       |       CAST(sum(h) % 2305843009213693952 AS BIGINT) AS checksum
       |FROM (SELECT year(o_orderdate) AS yr,
       |             CAST('0x' || substr(md5($canon), 1, 15) AS BIGINT) AS h
       |      FROM orders)
       |GROUP BY ROLLUP (yr)
       |ORDER BY scope""".stripMargin
  }

  /** GAUSSIAN KDE evaluated on a 21-point grid over the order-value
    * range: density(g) = Σᵢ exp(−(xᵢ−g)²/2h²) / (n·h·√2π) with the
    * fixed bandwidth h = range/20 — the smooth nonparametric density
    * readout where [[ExtensionQueries.histogram]] gives counts in
    * arbitrary bins and [[ExtensionQueries.equidepthHist]] gives
    * quantile edges; the grid form is what a dashboard plots and what
    * modes/valleys are read from.
    *
    * Scale shape: the grid explode fans the scan ×21 with immediate
    * map-side aggregation — the exchange carries 21 rows regardless
    * of corpus size. Grid points and bandwidth derive from exact
    * integer min/max cents; the kernel sum is the one float
    * accumulation (engine libm exp differs in the last ulp — the 9dp
    * fence absorbs it, the [[TextQueries.weightedSample]] ln
    * precedent). */
  def kdeGrid(spark: SparkSession, dir: String): DataFrame =
    kdeGridOf(Tables(spark, dir, "orders"))

  private[graft] def kdeGridOf(orders: DataFrame): DataFrame = {
    val x = orders.select(Det.cents(col("o_totalprice")).as("x"))
    val mm = x.agg(min("x").as("mn"), max("x").as("mx"), count(lit(1)).as("n"))
    val pts = x.crossJoin(broadcast(mm))
      .select(col("x"), col("mn"), col("mx"), col("n"),
        explode(sequence(lit(0), lit(20))).as("j"))
      .withColumn("g", col("mn") + col("j") * (col("mx") - col("mn")) / 20.0)
      // bandwidth floor of 1 cent (ADVICE r9): a degenerate corpus
      // where every order value is equal makes mx = mn and h = 0 —
      // NaN/Inf densities on both engines, invisible to the oracle
      // gate; the floor is mirrored in the twin
      .withColumn("h", greatest((col("mx") - col("mn")) / 20.0, lit(1.0)))
      .withColumn("kern",
        exp((col("x") - col("g")) * (col("x") - col("g"))
          / (col("h") * col("h")) * -0.5))
    pts.groupBy("j")
      .agg(max("g").as("g"), max("h").as("h"), max("n").as("n"),
        sum("kern").as("s"))
      .select(col("j").cast("long").as("j"),
        Det.rnd(col("g") / 100.0, 2).as("x_dollars"),
        Det.rnd(col("s") / (col("n") * col("h") * math.sqrt(2 * math.Pi)) * 100.0, 9)
          .as("density_per_dollar"))
      .orderBy("j")
  }

  val kdeGridSql: String =
    s"""WITH mm AS (
       |  SELECT CAST(min(${Det.centsSql("o_totalprice")}) AS BIGINT) AS mn,
       |         CAST(max(${Det.centsSql("o_totalprice")}) AS BIGINT) AS mx,
       |         count(*) AS n
       |  FROM orders),
       |pts AS (
       |  SELECT j, x, mn + j * (mx - mn) / 20.0 AS g,
       |         greatest((mx - mn) / 20.0, 1.0) AS h, n
       |  FROM (SELECT ${Det.centsSql("o_totalprice")} AS x FROM orders)
       |  CROSS JOIN mm
       |  CROSS JOIN (SELECT unnest(range(21)) AS j)),
       |agg AS (
       |  SELECT j, max(g) AS g, max(h) AS h, max(n) AS n,
       |         sum(exp((x - g) * (x - g) / (h * h) * -0.5)) AS s
       |  FROM pts GROUP BY 1)
       |SELECT CAST(j AS BIGINT) AS j,
       |       ${Det.rndSql("g / 100.0", 2)} AS x_dollars,
       |       ${Det.rndSql(
          s"s / (n * h * ${math.sqrt(2 * math.Pi)}) * 100.0", 9)} AS density_per_dollar
       |FROM agg
       |ORDER BY j""".stripMargin

  private val BtRounds = 8

  /** BRADLEY–TERRY STRENGTH FITTING from pairwise monthly wins
    * (Zermelo's fixed point, [[BtRounds]] rounds): each complete
    * month is a tournament round where priority i "beats" j if it
    * out-revenues it, and the BT model turns the win matrix into
    * latent strengths p with P(i beats j) = pᵢ/(pᵢ+pⱼ) — the
    * preference-learning primitive (the same likelihood RLHF reward
    * models fit over human pairwise choices) where
    * [[friedmanTest]] only tests "is there ANY consistent order" and
    * [[ExtensionQueries.kendallRankings]] compares two fixed
    * rankings.
    *
    * Scale shape: the corpus collapses once to (month × priority)
    * revenue cells; wins are a month-keyed self-join of that
    * calendar-bounded relation; the Zermelo iteration runs on a
    * 5-row strength relation joined to a 20-row win relation,
    * rounded to 9dp per iterate (the determinism contract for float
    * fixed points), identically unrolled in the oracle. */
  def bradleyTerry(spark: SparkSession, dir: String): DataFrame =
    bradleyTerryOf(Tables(spark, dir, "orders"))

  private[graft] def bradleyTerryOf(orders: DataFrame): DataFrame = {
    val k = 5
    val cells = orders
      .select(date_trunc("month", col("o_orderdate")).as("mon"),
        col("o_orderpriority").as("trt"),
        Det.cents(col("o_totalprice")).as("cents"))
      .groupBy("mon", "trt").agg(sum("cents").as("rev"))
    val complete = cells.groupBy("mon").agg(count(lit(1)).as("n_trt"))
      .filter(col("n_trt") === k).select("mon")
    val cc = cells.join(broadcast(complete), Seq("mon"))
    val duels = cc.as("a").join(cc.as("b"),
        col("a.mon") === col("b.mon") && col("a.trt") < col("b.trt"))
      .select(col("a.trt").as("i"), col("b.trt").as("j"),
        // exact-cents tie breaks to the lexicographically smaller name
        when(col("a.rev") >= col("b.rev"), 1L).otherwise(0L).as("wi"))
      .groupBy("i", "j").agg(count(lit(1)).as("n"), sum("wi").as("w"))
      .localCheckpoint() // ≤ k² rows
    val sym = duels.select(col("i"), col("j"), col("n"), col("w"))
      .union(duels.select(col("j").as("i"), col("i").as("j"), col("n"),
        (col("n") - col("w")).as("w")))
    val wins = sym.groupBy("i").agg(sum("w").as("wins"), sum("n").as("games"))
      .localCheckpoint()
    var p = wins.select(col("i"), lit(1.0 / k).as("p"))
    for (_ <- 1 to BtRounds) {
      val denom = sym
        .join(p.select(col("i"), col("p").as("pi")), Seq("i"))
        .join(p.select(col("i").as("j"), col("p").as("pj")), Seq("j"))
        .groupBy("i").agg(sum(col("n") / (col("pi") + col("pj"))).as("dn"))
      val raw = wins.join(denom, Seq("i"))
        .select(col("i"), (col("wins").cast("double") / col("dn")).as("r"))
      val tot = raw.agg(sum("r").as("t"))
      p = raw.crossJoin(broadcast(tot))
        .select(col("i"), round(col("r") / col("t"), 9).as("p"))
        .localCheckpoint() // k rows per iterate
    }
    wins.join(p, Seq("i"))
      .select(col("i").as("priority"), col("wins"), col("games"),
        Det.rnd(col("p"), 6).as("bt_strength"))
      .orderBy(desc("bt_strength"), col("priority"))
  }

  val bradleyTerrySql: String = {
    val rounds = (1 to BtRounds).map { r =>
      val prev = s"p${r - 1}"
      s"""r$r AS (
         |  SELECT s.i, w.wins / sum(s.n / (pi.p + pj.p)) AS r
         |  FROM sym s JOIN $prev pi ON pi.i = s.i
         |             JOIN $prev pj ON pj.i = s.j
         |             JOIN wins w ON w.i = s.i
         |  GROUP BY s.i, w.wins),
         |p$r AS MATERIALIZED (
         |  SELECT i, round(r / (SELECT sum(r) FROM r$r), 9) AS p FROM r$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH cells AS (
       |  SELECT date_trunc('month', o_orderdate) AS mon, o_orderpriority AS trt,
       |         CAST(sum(${Det.centsSql("o_totalprice")}) AS BIGINT) AS rev
       |  FROM orders GROUP BY 1, 2),
       |complete AS (SELECT mon FROM cells GROUP BY 1 HAVING count(*) = 5),
       |cc AS (SELECT cells.* FROM cells JOIN complete USING (mon)),
       |duels AS MATERIALIZED (
       |  SELECT a.trt AS i, b.trt AS j, count(*) AS n,
       |         CAST(sum(CASE WHEN a.rev >= b.rev THEN 1 ELSE 0 END) AS BIGINT) AS w
       |  FROM cc a JOIN cc b ON a.mon = b.mon AND a.trt < b.trt
       |  GROUP BY 1, 2),
       |sym AS (SELECT i, j, n, w FROM duels
       |        UNION ALL SELECT j, i, n, n - w FROM duels),
       |wins AS MATERIALIZED (
       |  SELECT i, CAST(sum(w) AS DOUBLE) AS wins,
       |         CAST(sum(n) AS BIGINT) AS games
       |  FROM sym GROUP BY 1),
       |p0 AS (SELECT i, 0.2 AS p FROM wins),
       |$rounds
       |SELECT w.i AS priority, CAST(w.wins AS BIGINT) AS wins, w.games,
       |       ${Det.rndSql("p.p", 6)} AS bt_strength
       |FROM wins w JOIN p$BtRounds p ON p.i = w.i
       |ORDER BY bt_strength DESC, priority""".stripMargin
  }

  /** CRONBACH'S ALPHA over the four engagement "items" (daily click /
    * view / signup / error counts, days as subjects): do the four
    * channels move together enough to justify summing them into one
    * daily engagement score? α = k/(k−1)·(1 − Σvarᵢ/var_total) — the
    * internal-consistency reliability gate run before any composite
    * metric ships; [[ExtensionQueries.partialCorr]] relates two
    * series, α certifies a SCALE of k of them.
    *
    * Scale shape: one pass to the calendar-bounded daily item matrix;
    * all variances come from exact integer moment sums; one fenced
    * assembly. */
  def cronbachAlpha(spark: SparkSession, dir: String): DataFrame =
    cronbachAlphaOf(Tables(spark, dir, "events"))

  private[graft] def cronbachAlphaOf(events: DataFrame): DataFrame = {
    val types = Seq("click", "view", "signup", "error")
    val daily = events
      .filter(col("event_type").isin(types.map(x => x: Any): _*))
      .select(to_date(col("ts")).as("d"), col("event_type"))
      .groupBy("d")
      .agg(sum(when(col("event_type") === types.head, 1L).otherwise(0L))
          .as(types.head),
        types.tail.map(t =>
          sum(when(col("event_type") === t, 1L).otherwise(0L)).as(t)): _*)
      .withColumn("tot", types.map(col).reduce(_ + _))
    val momCols = (types.flatMap(t => Seq(
        sum(col(t)).cast("double").as(s"s_$t"),
        sum(col(t) * col(t)).cast("double").as(s"q_$t"))) :+
      sum(col("tot")).cast("double").as("s_tot") :+
      sum(col("tot") * col("tot")).cast("double").as("q_tot"))
    val mom = daily.agg(count(lit(1)).cast("double").as("n"), momCols: _*)
    val varOf = (s: String, q: String) => s"(($q - $s * $s / n) / (n - 1))"
    val sumVars = types.map(t => varOf(s"s_$t", s"q_$t")).mkString(" + ")
    val vTot = varOf("s_tot", "q_tot")
    mom.select(col("n").cast("long").as("n_days"),
      lit(types.size.toLong).as("k_items"),
      Det.rnd(expr(s"$vTot"), 4).as("var_total"),
      Det.rnd(expr(s"${types.size}.0 / ${types.size - 1}.0" +
        s" * (1.0 - ($sumVars) / $vTot)"), 6).as("alpha"))
  }

  val cronbachAlphaSql: String = {
    val types = Seq("click", "view", "signup", "error")
    val items = types.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
      .mkString(", ")
    val moms = types.flatMap(t => Seq(
      s"CAST(sum($t) AS DOUBLE) AS s_$t",
      s"CAST(sum(CAST($t AS HUGEINT) * $t) AS DOUBLE) AS q_$t")).mkString(", ")
    val varOf = (s: String, q: String) => s"(($q - $s * $s / n) / (n - 1))"
    val sumVars = types.map(t => varOf(s"s_$t", s"q_$t")).mkString(" + ")
    val vTot = varOf("s_tot", "q_tot")
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, $items
       |  FROM events
       |  WHERE event_type IN (${types.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY 1),
       |dt AS (SELECT *, ${types.mkString(" + ")} AS tot FROM daily),
       |mom AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, $moms,
       |         CAST(sum(tot) AS DOUBLE) AS s_tot,
       |         CAST(sum(CAST(tot AS HUGEINT) * tot) AS DOUBLE) AS q_tot
       |  FROM dt)
       |SELECT CAST(n AS BIGINT) AS n_days, CAST(${types.size} AS BIGINT) AS k_items,
       |       ${Det.rndSql(vTot, 4)} AS var_total,
       |       ${Det.rndSql(s"${types.size}.0 / ${types.size - 1}.0" +
            s" * (1.0 - ($sumVars) / $vTot)", 6)} AS alpha
       |FROM mom""".stripMargin
  }

  /** FUNCTIONAL-DEPENDENCY DISCOVERY over a fixed candidate lattice:
    * for each candidate A→B the number of A-groups carrying more than
    * one distinct B decides whether the dependency HOLDS — the
    * schema-semantics profiler that complements
    * [[ExtensionQueries.fkDiscovery]] (cross-table inclusion) with
    * intra-table determination, the check that catches "this column
    * is secretly derivable" (drop it from the feature set) and "this
    * key isn't actually a key" (dedup before joining on it).
    *
    * Scale shape: one groupBy per candidate on its LHS key (the
    * natural shuffle), collapsing to a 1-row verdict each; the pass
    * count is bounded by the candidate list, not the data. Pure
    * integer counts, one fenced share per row. */
  def fdDiscovery(spark: SparkSession, dir: String): DataFrame =
    fdDiscoveryOf(Tables(spark, dir, "customer"), Tables(spark, dir, "orders"),
      Tables(spark, dir, "part"))

  private[graft] def fdDiscoveryOf(
      customer: DataFrame, orders: DataFrame, part: DataFrame): DataFrame = {
    val candidates: Seq[(String, DataFrame, String, String)] = Seq(
      ("c_custkey->c_mktsegment", customer, "c_custkey", "c_mktsegment"),
      ("c_nationkey->c_mktsegment", customer, "c_nationkey", "c_mktsegment"),
      ("c_mktsegment->c_nationkey", customer, "c_mktsegment", "c_nationkey"),
      ("o_orderkey->o_orderpriority", orders, "o_orderkey", "o_orderpriority"),
      ("o_custkey->o_orderpriority", orders, "o_custkey", "o_orderpriority"),
      ("o_orderdate->o_orderstatus", orders, "o_orderdate", "o_orderstatus"),
      ("p_brand->p_type", part, "p_brand", "p_type"),
      ("p_type->p_brand", part, "p_type", "p_brand"))
    candidates.map { case (name, df, lhs, rhs) =>
      df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("nd"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(name).as("fd"), col("n_groups"), col("n_violating"),
          (col("n_violating") === 0).as("holds"),
          Det.rnd(col("n_violating").cast("double") / col("n_groups"), 6)
            .as("violation_share"))
    }.reduce(_ union _).orderBy("fd")
  }

  val fdDiscoverySql: String = {
    val candidates = Seq(
      ("c_custkey->c_mktsegment", "customer", "c_custkey", "c_mktsegment"),
      ("c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"),
      ("c_mktsegment->c_nationkey", "customer", "c_mktsegment", "c_nationkey"),
      ("o_orderkey->o_orderpriority", "orders", "o_orderkey", "o_orderpriority"),
      ("o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
      ("o_orderdate->o_orderstatus", "orders", "o_orderdate", "o_orderstatus"),
      ("p_brand->p_type", "part", "p_brand", "p_type"),
      ("p_type->p_brand", "part", "p_type", "p_brand"))
    val rows = candidates.map { case (name, table, lhs, rhs) =>
      s"""SELECT '$name' AS fd, count(*) AS n_groups,
         |       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         |       sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds,
         |       ${Det.rndSql(
          "CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)}
         |         AS violation_share
         |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nd FROM $table GROUP BY 1)"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$rows)
       |ORDER BY fd""".stripMargin
  }

  /** PRICE ELASTICITY per brand: log-log OLS of quantity on effective
    * unit price (list price net of discount) over the brand's line
    * items — ε = d ln q / d ln p, the unit-free demand-curve slope
    * the pricing bridge ([[ExtensionQueries.priceVolumeMix]]) treats
    * as exogenous and this estimates. Per-group closed-form OLS —
    * no iterative fitting.
    *
    * Scale shape: one lineitem⋈part join (partkey — the natural key),
    * one groupBy(brand) collapsing to moment sums; ln() runs on
    * ratios of EXACT integers (cents × discount-% / quantity), so
    * both engines feed identical doubles to identical closed forms,
    * fenced per row. */
  def priceElasticity(spark: SparkSession, dir: String): DataFrame =
    priceElasticityOf(Tables(spark, dir, "lineitem"), Tables(spark, dir, "part"))

  private[graft] def priceElasticityOf(
      lineitem: DataFrame, part: DataFrame): DataFrame = {
    val rows = lineitem
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        expr("ln(CAST(round(l_extendedprice * 100) AS BIGINT)" +
          " * (100 - CAST(round(l_discount * 100) AS BIGINT))" +
          " / CAST(round(l_quantity) AS BIGINT))").as("x"),
        expr("ln(CAST(round(l_quantity) AS BIGINT))").as("y"))
    rows.groupBy("brand")
      .agg(count(lit(1)).cast("double").as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("brand"), col("n").cast("long").as("n_lines"),
        Det.rnd(expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)"), 4)
          .as("elasticity"),
        Det.rnd(expr("(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n"), 4)
          .as("intercept"),
        Det.rnd(expr("(n * sxy - sx * sy) * (n * sxy - sx * sy)" +
          " / ((n * sxx - sx * sx) * (n * syy - sy * sy))"), 6).as("r2"))
      .orderBy("brand")
  }

  val priceElasticitySql: String =
    s"""WITH r AS (
       |  SELECT p_brand AS brand,
       |         ln(${Det.centsSql("l_extendedprice")}
       |            * (100 - CAST(round(l_discount * 100) AS BIGINT))
       |            / CAST(round(l_quantity) AS BIGINT)) AS x,
       |         ln(CAST(round(l_quantity) AS BIGINT)) AS y
       |  FROM lineitem JOIN part ON p_partkey = l_partkey),
       |m AS (
       |  SELECT brand, CAST(count(*) AS DOUBLE) AS n,
       |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
       |         sum(x * x) AS sxx, sum(y * y) AS syy
       |  FROM r GROUP BY 1)
       |SELECT brand, CAST(n AS BIGINT) AS n_lines,
       |       ${Det.rndSql("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 4)} AS elasticity,
       |       ${Det.rndSql(
            "(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n", 4)} AS intercept,
       |       ${Det.rndSql("(n * sxy - sx * sy) * (n * sxy - sx * sy)" +
            " / ((n * sxx - sx * sx) * (n * syy - sy * sy))", 6)} AS r2
       |FROM m
       |ORDER BY brand""".stripMargin

  /** SURVEY DESIGN EFFECT of market-segment stratification for the
    * mean order value: DEFF = Σ W_h·S²_h / S² — how much variance a
    * proportionally-allocated stratified sample buys over simple
    * random sampling (DEFF < 1 ⟺ the strata explain between-group
    * variance). The planning companion to
    * [[ExtensionQueries.neymanAllocation]] (which OPTIMIZES the
    * allocation; this scores whether stratifying is worth anything
    * at all).
    *
    * Scale shape: one join + one groupBy(segment) to exact integer
    * moments; the assembly is k-row arithmetic, fenced once. */
  def designEffect(spark: SparkSession, dir: String): DataFrame =
    designEffectOf(Tables(spark, dir, "customer"), Tables(spark, dir, "orders"))

  private[graft] def designEffectOf(
      customer: DataFrame, orders: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val seg = orders
      .select(col("o_custkey"), Det.cents(col("o_totalprice")).as("c"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("h"))
      .agg(count(lit(1)).as("n_h"), sum("c").as("s_h"),
        sum(col("c").cast(d38) * col("c")).as("q_h"))
    val varH = "((CAST(q_h AS DOUBLE) - CAST(s_h AS DOUBLE) * s_h / n_h) / (n_h - 1))"
    seg.agg(count(lit(1)).as("k"), sum("n_h").as("n"),
        sum("s_h").as("s"), sum(col("q_h")).as("q"),
        sum(expr(s"n_h * $varH")).as("wv"))
      .select(col("n").cast("long").as("n_orders"), col("k").as("k_strata"),
        Det.rnd(expr("((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))")
          / 10000.0, 2).as("s2_total_d2"),
        Det.rnd(expr("wv / n") / 10000.0, 2).as("s2_within_d2"),
        Det.rnd(expr("(wv / n)" +
          " / ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))"), 6)
          .as("deff"))
  }

  val designEffectSql: String = {
    val varH = "((CAST(q_h AS DOUBLE) - CAST(s_h AS DOUBLE) * s_h / n_h) / (n_h - 1))"
    s"""WITH seg AS (
       |  SELECT c_mktsegment AS h, count(*) AS n_h,
       |         CAST(sum(${Det.centsSql("o_totalprice")}) AS BIGINT) AS s_h,
       |         sum(CAST(${Det.centsSql("o_totalprice")} AS HUGEINT)
       |             * ${Det.centsSql("o_totalprice")}) AS q_h
       |  FROM orders JOIN customer ON c_custkey = o_custkey
       |  GROUP BY 1),
       |a AS (
       |  SELECT count(*) AS k, CAST(sum(n_h) AS BIGINT) AS n,
       |         CAST(sum(s_h) AS BIGINT) AS s, CAST(sum(q_h) AS DOUBLE) AS q,
       |         sum(n_h * $varH) AS wv
       |  FROM seg)
       |SELECT n AS n_orders, k AS k_strata,
       |       ${Det.rndSql(
            "((q - CAST(s AS DOUBLE) * s / n) / (n - 1)) / 10000.0", 2)} AS s2_total_d2,
       |       ${Det.rndSql("wv / n / 10000.0", 2)} AS s2_within_d2,
       |       ${Det.rndSql(
            "(wv / n) / ((q - CAST(s AS DOUBLE) * s / n) / (n - 1))", 6)} AS deff
       |FROM a""".stripMargin
  }

  /** TRANSFER ENTROPY (Schreiber) between the binarized daily click
    * and purchase series, both directions: TE(X→Y) =
    * Σ p(y⁺,y,x)·log₂[p(y⁺|y,x)/p(y⁺|y)] — the model-free causality
    * measure that catches NONLINEAR lagged influence
    * [[grangerCausality]]'s linear F-test misses. States binarize
    * against the series MEAN by exact integer cross-multiplication
    * (xₜ·n > Σx — no float threshold), so the whole joint histogram
    * is exact integer counts.
    *
    * Scale shape: the corpus collapses to the dense daily grid once;
    * the TE assembly is arithmetic over the 8-cell joint histogram
    * and its margins (value-bounded joins). Zero-count contexts
    * contribute zero by the standard convention, identically in both
    * engines; one fence per direction. */
  def transferEntropy(spark: SparkSession, dir: String): DataFrame =
    transferEntropyOf(Tables(spark, dir, "events"))

  private[graft] def transferEntropyOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = events
      .select(to_date(col("ts")).as("d"), col("event_type"))
      .groupBy("d").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("xc"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("yc"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"), col("d0"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(col("i"), coalesce(col("xc"), lit(0L)).as("xv"),
        coalesce(col("yc"), lit(0L)).as("yv"))
    val tot = dense.agg(count(lit(1)).as("n"), sum("xv").as("sx"),
      sum("yv").as("sy"))
    val bin = dense.crossJoin(broadcast(tot))
      .select(col("i"),
        when(col("xv") * col("n") > col("sx"), 1).otherwise(0).as("x"),
        when(col("yv") * col("n") > col("sy"), 1).otherwise(0).as("y"))
    val w = Window.orderBy("i")
    val lagged = bin
      .select(col("x"), col("y"),
        lag("x", 1).over(w).as("x1"), lag("y", 1).over(w).as("y1"))
      .filter(col("x1").isNotNull)
      .localCheckpoint() // calendar-bounded; two TE directions read it
    def te(dep: String, own: String, cross: String): DataFrame = {
      val cells = lagged.groupBy(col(dep).as("dn"), col(own).as("ow"),
        col(cross).as("cr")).agg(count(lit(1)).as("c"))
      val mOwCr = cells.groupBy("ow", "cr").agg(sum("c").as("n_owcr"))
      val mDnOw = cells.groupBy("dn", "ow").agg(sum("c").as("n_dnow"))
      val mOw = cells.groupBy("ow").agg(sum("c").as("n_ow"))
      val nT = cells.agg(sum("c").as("nn"))
      cells.join(mOwCr, Seq("ow", "cr")).join(mDnOw, Seq("dn", "ow"))
        .join(mOw, Seq("ow")).crossJoin(broadcast(nT))
        .select((col("c").cast("double") / col("nn")
          * log(col("c").cast("double") * col("n_ow")
            / (col("n_owcr").cast("double") * col("n_dnow")))
          / math.log(2.0)).as("term"))
        .agg(coalesce(sum("term"), lit(0.0)).as("te"))
    }
    val teXy = te("y", "y1", "x1")
    val teYx = te("x", "x1", "y1")
    val n = lagged.agg(count(lit(1)).as("n_days"))
    n.crossJoin(teXy.select(col("te").as("te_xy")))
      .crossJoin(teYx.select(col("te").as("te_yx")))
      .select(explode(array(
        struct(lit("click->purchase").as("direction"), col("n_days"),
          Det.rnd(col("te_xy"), 6).as("te_bits")),
        struct(lit("purchase->click").as("direction"), col("n_days"),
          Det.rnd(col("te_yx"), 6).as("te_bits")))).as("r"))
      .select(col("r.direction").as("direction"), col("r.n_days").as("n_days"),
        col("r.te_bits").as("te_bits"))
      .orderBy("direction")
  }

  val transferEntropySql: String = {
    def te(dep: String, own: String, cross: String) =
      s"""SELECT coalesce(sum(
         |  CAST(c AS DOUBLE) / nn
         |  * ln(CAST(c AS DOUBLE) * n_ow / (CAST(n_owcr AS DOUBLE) * n_dnow))
         |  / ${math.log(2.0)}), 0.0) AS te
         |FROM (
         |  SELECT c.c, m1.n_owcr, m2.n_dnow, m3.n_ow, t.nn
         |  FROM (SELECT $dep AS dn, $own AS ow, $cross AS cr, count(*) AS c
         |        FROM lv GROUP BY 1, 2, 3) c
         |  JOIN (SELECT $own AS ow, $cross AS cr, count(*) AS n_owcr
         |        FROM lv GROUP BY 1, 2) m1 ON m1.ow = c.ow AND m1.cr = c.cr
         |  JOIN (SELECT $dep AS dn, $own AS ow, count(*) AS n_dnow
         |        FROM lv GROUP BY 1, 2) m2 ON m2.dn = c.dn AND m2.ow = c.ow
         |  JOIN (SELECT $own AS ow, count(*) AS n_ow
         |        FROM lv GROUP BY 1) m3 ON m3.ow = c.ow
         |  CROSS JOIN (SELECT count(*) AS nn FROM lv) t)""".stripMargin
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS xc,
       |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS yc
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |dense AS (
       |  SELECT g.i, coalesce(byday.xc, 0) AS xv, coalesce(byday.yc, 0) AS yv
       |  FROM (SELECT unnest(range(nd + 1)) AS i, d0 FROM sp) g
       |  LEFT JOIN byday ON byday.d = g.d0 + CAST(g.i AS INTEGER)),
       |tot AS (SELECT count(*) AS n, CAST(sum(xv) AS BIGINT) AS sx,
       |               CAST(sum(yv) AS BIGINT) AS sy FROM dense),
       |bin AS (
       |  SELECT i, CASE WHEN xv * n > sx THEN 1 ELSE 0 END AS x,
       |         CASE WHEN yv * n > sy THEN 1 ELSE 0 END AS y
       |  FROM dense CROSS JOIN tot),
       |lagged AS (
       |  SELECT x, y, lag(x) OVER (ORDER BY i) AS x1,
       |         lag(y) OVER (ORDER BY i) AS y1
       |  FROM bin),
       |lv AS MATERIALIZED (SELECT * FROM lagged WHERE x1 IS NOT NULL),
       |nr AS (SELECT count(*) AS n_days FROM lv),
       |xy AS (${te("y", "y1", "x1")}),
       |yx AS (${te("x", "x1", "y1")})
       |SELECT * FROM (
       |  SELECT 'click->purchase' AS direction, n_days,
       |         ${Det.rndSql("xy.te", 6)} AS te_bits
       |  FROM nr CROSS JOIN xy
       |  UNION ALL
       |  SELECT 'purchase->click', n_days, ${Det.rndSql("yx.te", 6)}
       |  FROM nr CROSS JOIN yx)
       |ORDER BY direction""".stripMargin
  }

  /** SAMPLE ENTROPY (Richman–Moorman, m=2) of the daily revenue
    * series: −ln(A/B) where B counts template pairs of length 2 and A
    * of length 3 matching within Chebyshev tolerance r — the
    * regularity/complexity readout (low = predictable rhythm, high =
    * structureless) that [[hurstExponent]]'s long-memory slope and
    * [[ExtensionQueries.autocorr]]'s fixed lags don't capture.
    * Tolerance r = half the interquartile range, RANK-PICKED from the
    * distinct-cents day histogram — an exact integer, so every match
    * decision is integer Chebyshev ≤ r with no float boundary.
    *
    * Scale shape: corpus → calendar-bounded day grid → windows² pair
    * join (the matrix-profile argument: bounded at any corpus size).
    * A = 0 yields NULL entropy by the standard convention, same in
    * both engines. */
  def sampleEntropy(spark: SparkSession, dir: String): DataFrame =
    sampleEntropyOf(Tables(spark, dir, "events"))

  private[graft] def sampleEntropyOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = events
      .select(to_date(col("ts")).as("d"), Det.cents(col("value")).as("c"))
      .groupBy("d").agg(sum("c").as("c"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"), col("d0"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(col("i").cast("long").as("i"), coalesce(col("c"), lit(0L)).as("x"))
    // r = IQR/2 rank-picked from the sorted day values (exact integer)
    val wv = Window.orderBy("x")
    val ranked = dense.withColumn("rk", row_number().over(wv))
    val nRow = dense.agg(count(lit(1)).as("n"))
    val r = ranked.crossJoin(broadcast(nRow))
      .agg((min(when(col("rk") >= expr("(n * 3 + 3) div 4"), col("x")))
        - min(when(col("rk") >= expr("(n + 3) div 4"), col("x")))).as("iqr"))
      .select(expr("iqr div 2").as("r"))
    val w = Window.orderBy("i")
    val wins = dense
      .select(col("i"), col("x").as("v0"), lead("x", 1).over(w).as("v1"),
        lead("x", 2).over(w).as("v2"))
      .filter(col("v2").isNotNull)
    val pairs = wins.as("a").join(wins.as("b"), col("b.i") > col("a.i"))
      .crossJoin(broadcast(r))
      .select(col("r"),
        greatest(abs(col("a.v0") - col("b.v0")),
          abs(col("a.v1") - col("b.v1"))).as("d2"),
        greatest(abs(col("a.v0") - col("b.v0")),
          abs(col("a.v1") - col("b.v1")),
          abs(col("a.v2") - col("b.v2"))).as("d3"))
    pairs.agg(max("r").as("r"),
        sum(when(col("d2") <= col("r"), 1L).otherwise(0L)).as("b_pairs"),
        sum(when(col("d3") <= col("r"), 1L).otherwise(0L)).as("a_pairs"))
      .select(Det.rnd(col("r").cast("double") / 100.0, 2).as("r_dollars"),
        col("b_pairs"), col("a_pairs"),
        when(col("a_pairs") > 0 && col("b_pairs") > 0,
          Det.rnd(-log(col("a_pairs").cast("double") / col("b_pairs")), 4))
          .as("sampen"))
  }

  val sampleEntropySql: String =
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(${Det.centsSql("value")}) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |dense AS (
       |  SELECT CAST(g.i AS BIGINT) AS i, coalesce(byday.c, 0) AS x
       |  FROM (SELECT unnest(range(nd + 1)) AS i, d0 FROM sp) g
       |  LEFT JOIN byday ON byday.d = g.d0 + CAST(g.i AS INTEGER)),
       |rk AS (SELECT x, row_number() OVER (ORDER BY x) AS rk,
       |              count(*) OVER () AS n FROM dense),
       |rr AS (SELECT CAST((min(CASE WHEN rk >= (n * 3 + 3) // 4 THEN x END)
       |                    - min(CASE WHEN rk >= (n + 3) // 4 THEN x END)) // 2
       |              AS BIGINT) AS r
       |       FROM rk),
       |wins AS (
       |  SELECT i, x AS v0, lead(x, 1) OVER (ORDER BY i) AS v1,
       |         lead(x, 2) OVER (ORDER BY i) AS v2
       |  FROM dense),
       |wv AS (SELECT * FROM wins WHERE v2 IS NOT NULL),
       |p AS (
       |  SELECT r,
       |         greatest(abs(a.v0 - b.v0), abs(a.v1 - b.v1)) AS d2,
       |         greatest(abs(a.v0 - b.v0), abs(a.v1 - b.v1),
       |                  abs(a.v2 - b.v2)) AS d3
       |  FROM wv a JOIN wv b ON b.i > a.i CROSS JOIN rr),
       |agg AS (
       |  SELECT max(r) AS r,
       |         CAST(sum(CASE WHEN d2 <= r THEN 1 ELSE 0 END) AS BIGINT) AS b_pairs,
       |         CAST(sum(CASE WHEN d3 <= r THEN 1 ELSE 0 END) AS BIGINT) AS a_pairs
       |  FROM p)
       |SELECT ${Det.rndSql("CAST(r AS DOUBLE) / 100.0", 2)} AS r_dollars,
       |       b_pairs, a_pairs,
       |       CASE WHEN a_pairs > 0 AND b_pairs > 0
       |            THEN ${Det.rndSql("-ln(CAST(a_pairs AS DOUBLE) / b_pairs)", 4)}
       |       END AS sampen
       |FROM agg""".stripMargin

  /** TUKEY MEDIAN POLISH (two full row/col sweeps) of the month ×
    * priority revenue matrix: the ROBUST two-way decomposition value =
    * row effect + column effect + residual, where
    * [[ExtensionQueries.seasonalIndex]]'s mean ratios let one wild
    * month drag every priority's profile. Emits the per-priority
    * column effects and the residual MAD (the robust "what the
    * additive model can't explain" number).
    *
    * Scale shape: the corpus collapses once to the calendar-bounded
    * complete-month matrix; each sweep is a rank-picked two-middle
    * median over that bounded relation. EXACT: cents are integers and
    * every median halves at most twice per sweep pair, so all
    * intermediates are dyadic rationals (k/4, k/8 …) that doubles
    * represent exactly — both engines run identical exact arithmetic
    * end-to-end, fenced only at output. */
  def medianPolish(spark: SparkSession, dir: String): DataFrame =
    medianPolishOf(Tables(spark, dir, "orders"))

  private[graft] def medianPolishOf(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 5
    val cells0 = orders
      .select(date_trunc("month", col("o_orderdate")).as("mon"),
        col("o_orderpriority").as("trt"),
        Det.cents(col("o_totalprice")).as("cents"))
      .groupBy("mon", "trt").agg(sum("cents").cast("double").as("v"))
    val complete = cells0.groupBy("mon").agg(count(lit(1)).as("n_trt"))
      .filter(col("n_trt") === k).select("mon")
    var resid = cells0.join(broadcast(complete), Seq("mon"))
      .localCheckpoint() // calendar-bounded matrix
    def medOver(df: DataFrame, key: String): DataFrame = {
      val w = Window.partitionBy(key).orderBy("v")
      df.withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(key)))
        .groupBy(key)
        .agg(((min(when(col("rk") >= expr("(n + 1) div 2"), col("v")))
          + min(when(col("rk") >= expr("n div 2 + 1"), col("v")))) / 2).as("med"))
    }
    var colEff = resid.select(col("trt")).distinct()
      .withColumn("ce", lit(0.0))
    for (_ <- 1 to 2) {
      val rm = medOver(resid, "mon").withColumnRenamed("med", "rm")
      resid = resid.join(broadcast(rm), Seq("mon"))
        .select(col("mon"), col("trt"), (col("v") - col("rm")).as("v"))
      val cm = medOver(resid, "trt").withColumnRenamed("med", "cm")
      resid = resid.join(broadcast(cm), Seq("trt"))
        .select(col("mon"), col("trt"), (col("v") - col("cm")).as("v"))
        .localCheckpoint() // bounded; next sweep + MAD read it
      colEff = colEff.join(cm, Seq("trt"))
        .select(col("trt"), (col("ce") + col("cm")).as("ce"))
    }
    val wAll = Window.orderBy("av")
    val mad = resid.select(abs(col("v")).as("av"))
      .withColumn("rk", row_number().over(wAll))
      .withColumn("n", count(lit(1)).over())
      .agg(((min(when(col("rk") >= expr("(n + 1) div 2"), col("av")))
        + min(when(col("rk") >= expr("n div 2 + 1"), col("av")))) / 2).as("mad"))
    colEff.crossJoin(broadcast(mad))
      .select(col("trt").as("priority"),
        Det.rnd(col("ce") / 100.0, 4).as("col_effect_dollars"),
        Det.rnd(col("mad") / 100.0, 4).as("residual_mad_dollars"))
      .orderBy("priority")
  }

  val medianPolishSql: String = {
    def med(src: String, key: String, out: String) =
      s"""$out AS (
         |  SELECT $key,
         |         (min(CASE WHEN rk >= (n + 1) // 2 THEN v END)
         |          + min(CASE WHEN rk >= n // 2 + 1 THEN v END)) / 2 AS med
         |  FROM (SELECT $key, v,
         |               row_number() OVER (PARTITION BY $key ORDER BY v) AS rk,
         |               count(*) OVER (PARTITION BY $key) AS n
         |        FROM $src)
         |  GROUP BY 1)""".stripMargin
    s"""WITH cells0 AS (
       |  SELECT date_trunc('month', o_orderdate) AS mon, o_orderpriority AS trt,
       |         CAST(sum(${Det.centsSql("o_totalprice")}) AS DOUBLE) AS v
       |  FROM orders GROUP BY 1, 2),
       |complete AS (SELECT mon FROM cells0 GROUP BY 1 HAVING count(*) = 5),
       |r0 AS (SELECT cells0.* FROM cells0 JOIN complete USING (mon)),
       |${med("r0", "mon", "rm1")},
       |r1 AS (SELECT mon, trt, v - med AS v FROM r0 JOIN rm1 USING (mon)),
       |${med("r1", "trt", "cm1")},
       |r2 AS (SELECT mon, trt, v - med AS v FROM r1 JOIN cm1 USING (trt)),
       |${med("r2", "mon", "rm2")},
       |r3 AS (SELECT mon, trt, v - med AS v FROM r2 JOIN rm2 USING (mon)),
       |${med("r3", "trt", "cm2")},
       |r4 AS (SELECT mon, trt, v - med AS v FROM r3 JOIN cm2 USING (trt)),
       |madc AS (
       |  SELECT (min(CASE WHEN rk >= (n + 1) // 2 THEN av END)
       |          + min(CASE WHEN rk >= n // 2 + 1 THEN av END)) / 2 AS mad
       |  FROM (SELECT abs(v) AS av,
       |               row_number() OVER (ORDER BY abs(v)) AS rk,
       |               count(*) OVER () AS n
       |        FROM r4))
       |SELECT cm1.trt AS priority,
       |       ${Det.rndSql("(cm1.med + cm2.med) / 100.0", 4)} AS col_effect_dollars,
       |       ${Det.rndSql("mad / 100.0", 4)} AS residual_mad_dollars
       |FROM cm1 JOIN cm2 USING (trt) CROSS JOIN madc
       |ORDER BY priority""".stripMargin
  }

  /** TAIL-DEPENDENCE coefficients between the daily click and
    * purchase series: λ_U = P(X > q₈₀ˣ ∧ Y > q₈₀ʸ)/P(Y > q₈₀ʸ) and
    * its lower-tail mirror — do extreme days CO-OCCUR? The
    * dependence-structure readout a correlation can't give (two
    * series can be ρ=0.5 with independent extremes, or ρ=0.5 with
    * every spike shared — different capacity-planning worlds).
    * Thresholds are rank-picked exact integers from each series'
    * day histogram; every count and comparison is integer.
    *
    * Scale shape: corpus → calendar-bounded day grid; two bounded
    * rank windows pick the quantiles; one pass counts the joint
    * exceedances. */
  def tailDependence(spark: SparkSession, dir: String): DataFrame =
    tailDependenceOf(Tables(spark, dir, "events"))

  private[graft] def tailDependenceOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = events
      .select(to_date(col("ts")).as("d"), col("event_type"))
      .groupBy("d").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("xc"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("yc"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"), col("d0"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(coalesce(col("xc"), lit(0L)).as("x"),
        coalesce(col("yc"), lit(0L)).as("y"))
      .localCheckpoint() // calendar-bounded; quantiles + count read it
    def q(cn: String, p: Int) = { // the ceil(p%·n)-th order statistic
      val w = Window.orderBy(cn)
      dense.withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over())
        .agg(min(when(col("rk") >= expr(s"(n * $p + 99) div 100"), col(cn)))
          .as(s"q_$cn"))
    }
    val qs = q("x", 80).crossJoin(q("y", 80))
      .crossJoin(q("x", 20).withColumnRenamed("q_x", "l_x"))
      .crossJoin(q("y", 20).withColumnRenamed("q_y", "l_y"))
    dense.crossJoin(broadcast(qs))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("y") > col("q_y"), 1L).otherwise(0L)).as("ny"),
        sum(when(col("x") > col("q_x") && col("y") > col("q_y"), 1L)
          .otherwise(0L)).as("nxy"),
        sum(when(col("y") <= col("l_y"), 1L).otherwise(0L)).as("nly"),
        sum(when(col("x") <= col("l_x") && col("y") <= col("l_y"), 1L)
          .otherwise(0L)).as("nlxy"))
      .select(col("n_days"), col("ny"), col("nxy"),
        Det.rnd(col("nxy").cast("double") / col("ny"), 4).as("lambda_upper"),
        Det.rnd(col("nlxy").cast("double") / col("nly"), 4).as("lambda_lower"))
  }

  val tailDependenceSql: String = {
    def q(cn: String, p: Int, out: String) =
      s"""$out AS (
         |  SELECT min(CASE WHEN rk >= (n * $p + 99) // 100 THEN $cn END) AS v
         |  FROM (SELECT $cn, row_number() OVER (ORDER BY $cn) AS rk,
         |               count(*) OVER () AS n FROM dense))""".stripMargin
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS xc,
       |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS yc
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |dense AS (
       |  SELECT coalesce(byday.xc, 0) AS x, coalesce(byday.yc, 0) AS y
       |  FROM (SELECT unnest(range(nd + 1)) AS i, d0 FROM sp) g
       |  LEFT JOIN byday ON byday.d = g.d0 + CAST(g.i AS INTEGER)),
       |${q("x", 80, "qx")}, ${q("y", 80, "qy")},
       |${q("x", 20, "lx")}, ${q("y", 20, "ly")}
       |SELECT count(*) AS n_days,
       |       CAST(sum(CASE WHEN y > qy.v THEN 1 ELSE 0 END) AS BIGINT) AS ny,
       |       CAST(sum(CASE WHEN x > qx.v AND y > qy.v THEN 1 ELSE 0 END) AS BIGINT) AS nxy,
       |       ${Det.rndSql(
            "CAST(sum(CASE WHEN x > qx.v AND y > qy.v THEN 1 ELSE 0 END) AS DOUBLE)" +
              " / sum(CASE WHEN y > qy.v THEN 1 ELSE 0 END)", 4)} AS lambda_upper,
       |       ${Det.rndSql(
            "CAST(sum(CASE WHEN x <= lx.v AND y <= ly.v THEN 1 ELSE 0 END) AS DOUBLE)" +
              " / sum(CASE WHEN y <= ly.v THEN 1 ELSE 0 END)", 4)} AS lambda_lower
       |FROM dense CROSS JOIN qx CROSS JOIN qy CROSS JOIN lx CROSS JOIN ly""".stripMargin
  }

  /** RANSAC CONSENSUS LINE FIT of monthly revenue vs month index:
    * every month PAIR proposes a line, each line's inlier count is
    * tested with the band |residual| ≤ MAD, the maximum-consensus
    * line wins, and OLS refits on its inliers — the
    * consensus-maximization robust fit (up to 50% arbitrary
    * corruption) where [[ExtensionQueries.theilSen]] medians all
    * pairwise slopes (29% breakdown) and OLS chases every outlier.
    * EXACT consensus: the inlier test cross-multiplies to
    * |y_k·Δ − y_i·Δ − Δy·(k−i)| ≤ band·Δ — pure integers, no float
    * residual ever decides membership; ties break to the smallest
    * (i, j).
    *
    * Scale shape: the corpus collapses once to the calendar-bounded
    * month histogram; candidates × months is calendar² — bounded at
    * any corpus size (the Theil–Sen argument); the refit is a
    * closed-form OLS over the winner's inliers. */
  def ransacTrend(spark: SparkSession, dir: String): DataFrame =
    ransacTrendOf(Tables(spark, dir, "orders"))

  private[graft] def ransacTrendOf(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mon = orders
      .select(date_trunc("month", col("o_orderdate")).as("m"),
        Det.cents(col("o_totalprice")).as("c"))
      .groupBy("m").agg(sum("c").as("y"))
    val t0 = mon.agg(min(col("m")).as("m0"))
    val pts = mon.crossJoin(broadcast(t0))
      .select(((year(col("m")) - year(col("m0"))) * 12
        + month(col("m")) - month(col("m0"))).cast("long").as("k"), col("y"))
      .localCheckpoint() // calendar-bounded
    val wv = Window.orderBy("ay")
    val band = pts.select(abs(col("y")).as("ay"))
      .withColumn("rk", row_number().over(wv))
      .withColumn("n", count(lit(1)).over())
      .agg(min(when(col("rk") >= expr("(n + 1) div 2"), col("ay"))).as("medy"))
      .crossJoin(pts.select(col("k").as("kk"), col("y").as("yy")))
      .select(abs(col("yy") - col("medy")).as("ad"))
      .withColumn("rk", row_number().over(Window.orderBy("ad")))
      .withColumn("n", count(lit(1)).over())
      .agg(min(when(col("rk") >= expr("(n + 1) div 2"), col("ad"))).as("band"))
    val cand = pts.as("a").join(pts.as("b"), col("b.k") > col("a.k"))
      .select(col("a.k").as("i"), col("a.y").as("yi"),
        col("b.k").as("j"), col("b.y").as("yj"))
    val scored = cand.crossJoin(pts).crossJoin(broadcast(band))
      .withColumn("dl", col("j") - col("i"))
      .withColumn("resid",
        abs(col("y") * col("dl") - col("yi") * col("dl")
          - (col("yj") - col("yi")) * (col("k") - col("i"))))
      .groupBy("i", "j", "yi", "yj", "dl")
      .agg(sum(when(col("resid") <= col("band") * col("dl"), 1L)
        .otherwise(0L)).as("n_in"))
    val best = scored.orderBy(desc("n_in"), col("i"), col("j")).limit(1)
      .localCheckpoint() // 1 row, read by the refit join
    val refit = pts.crossJoin(broadcast(best)).crossJoin(broadcast(band))
      .filter(abs(col("y") * col("dl") - col("yi") * col("dl")
        - (col("yj") - col("yi")) * (col("k") - col("i")))
        <= col("band") * col("dl"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum("k").cast("double").as("sk"), sum("y").cast("double").as("sy"),
        // cast-before-multiply (ADVICE r9): widen, then multiply
        sum(col("k").cast("decimal(38,0)") * col("y")).cast("double").as("sky"),
        sum(col("k") * col("k")).cast("double").as("skk"))
    best.crossJoin(refit)
      .select(col("i").as("month_i"), col("j").as("month_j"),
        col("n_in").as("n_inliers"),
        Det.rnd((col("yj") - col("yi")).cast("double")
          / (col("dl") * 100.0), 4).as("slope_dollars"),
        Det.rnd(expr("(n * sky - sk * sy) / (n * skk - sk * sk)") / 100.0, 4)
          .as("refit_slope_dollars"))
  }

  val ransacTrendSql: String =
    s"""WITH mon AS (
       |  SELECT date_trunc('month', o_orderdate) AS m,
       |         CAST(sum(${Det.centsSql("o_totalprice")}) AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |t0 AS (SELECT min(m) AS m0 FROM mon),
       |pts AS (
       |  SELECT CAST((year(m) - year(m0)) * 12 + month(m) - month(m0) AS BIGINT) AS k, y
       |  FROM mon CROSS JOIN t0),
       |medy AS (
       |  SELECT min(CASE WHEN rk >= (n + 1) // 2 THEN ay END) AS medy
       |  FROM (SELECT abs(y) AS ay, row_number() OVER (ORDER BY abs(y)) AS rk,
       |               count(*) OVER () AS n FROM pts)),
       |band AS (
       |  SELECT min(CASE WHEN rk >= (n + 1) // 2 THEN ad END) AS band
       |  FROM (SELECT abs(y - medy) AS ad,
       |               row_number() OVER (ORDER BY abs(y - medy)) AS rk,
       |               count(*) OVER () AS n
       |        FROM pts CROSS JOIN medy)),
       |cand AS (
       |  SELECT a.k AS i, a.y AS yi, b.k AS j, b.y AS yj, b.k - a.k AS dl
       |  FROM pts a JOIN pts b ON b.k > a.k),
       |scored AS (
       |  SELECT c.i, c.j, c.yi, c.yj, c.dl,
       |         CAST(sum(CASE WHEN abs(p.y * c.dl - c.yi * c.dl
       |                                 - (c.yj - c.yi) * (p.k - c.i))
       |                            <= band.band * c.dl
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_in
       |  FROM cand c CROSS JOIN pts p CROSS JOIN band
       |  GROUP BY 1, 2, 3, 4, 5),
       |best AS (SELECT * FROM scored ORDER BY n_in DESC, i, j LIMIT 1),
       |refit AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |         CAST(sum(p.k) AS DOUBLE) AS sk, CAST(sum(p.y) AS DOUBLE) AS sy,
       |         CAST(sum(CAST(p.k AS HUGEINT) * p.y) AS DOUBLE) AS sky,
       |         CAST(sum(p.k * p.k) AS DOUBLE) AS skk
       |  FROM pts p CROSS JOIN best b CROSS JOIN band
       |  WHERE abs(p.y * b.dl - b.yi * b.dl - (b.yj - b.yi) * (p.k - b.i))
       |        <= band.band * b.dl)
       |SELECT b.i AS month_i, b.j AS month_j, b.n_in AS n_inliers,
       |       ${Det.rndSql(
            "CAST(b.yj - b.yi AS DOUBLE) / (b.dl * 100.0)", 4)} AS slope_dollars,
       |       ${Det.rndSql(
            "(n * sky - sk * sy) / (n * skk - sk * sk) / 100.0", 4)}
       |         AS refit_slope_dollars
       |FROM best b CROSS JOIN refit""".stripMargin

  /** DISTANCE CORRELATION (Székely) between the daily click and
    * purchase series: dCor² = dCov²/√(dVar_x·dVar_y) over
    * double-centered pairwise-distance matrices — zero iff the
    * series are INDEPENDENT (Pearson/Spearman miss non-monotone
    * coupling; [[transferEntropy]] needs binarization and a lag —
    * this is the contemporaneous any-shape dependence test).
    *
    * Scale shape: the corpus collapses once to the calendar-bounded
    * day grid; the n² distance matrices are calendar² (the
    * matrix-profile argument). Distances are exact integers; row
    * means enter as exact-ratio doubles and the three V-statistics
    * are assembled from them identically in both engines, fenced at
    * output. */
  def distanceCorr(spark: SparkSession, dir: String): DataFrame =
    distanceCorrOf(Tables(spark, dir, "events"))

  private[graft] def distanceCorrOf(events: DataFrame): DataFrame = {
    val byDay = events
      .select(to_date(col("ts")).as("d"), col("event_type"))
      .groupBy("d").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("xc"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("yc"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"), col("d0"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(col("i").cast("long").as("i"),
        coalesce(col("xc"), lit(0L)).as("x"), coalesce(col("yc"), lit(0L)).as("y"))
      .localCheckpoint() // calendar-bounded; self-joined
    val pair = dense.as("a").crossJoin(dense.as("b"))
      .select(col("a.i").as("i"), col("b.i").as("j"),
        abs(col("a.x") - col("b.x")).as("ax"),
        abs(col("a.y") - col("b.y")).as("ay"))
      .localCheckpoint() // calendar²-bounded; three consumers
    val rowm = pair.groupBy("i").agg(
      avg(col("ax")).as("rx"), avg(col("ay")).as("ry"))
    val gm = pair.agg(avg(col("ax")).as("gx"), avg(col("ay")).as("gy"))
    val centered = pair
      .join(broadcast(rowm), Seq("i"))
      .join(broadcast(rowm.select(col("i").as("j"), col("rx").as("cx"),
        col("ry").as("cy"))), Seq("j"))
      .crossJoin(broadcast(gm))
      .select((col("ax") - col("rx") - col("cx") + col("gx")).as("axc"),
        (col("ay") - col("ry") - col("cy") + col("gy")).as("ayc"))
    centered.agg(count(lit(1)).cast("double").as("n2"),
        sum(col("axc") * col("ayc")).as("sxy"),
        sum(col("axc") * col("axc")).as("sxx"),
        sum(col("ayc") * col("ayc")).as("syy"))
      .select(sqrt(col("n2")).cast("long").as("n_days"),
        Det.rnd(expr("sxy / sqrt(sxx * syy)"), 4).as("dcor2"))
  }

  val distanceCorrSql: String =
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS xc,
       |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS yc
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |dense AS (
       |  SELECT CAST(g.i AS BIGINT) AS i, coalesce(byday.xc, 0) AS x,
       |         coalesce(byday.yc, 0) AS y
       |  FROM (SELECT unnest(range(nd + 1)) AS i, d0 FROM sp) g
       |  LEFT JOIN byday ON byday.d = g.d0 + CAST(g.i AS INTEGER)),
       |pair AS MATERIALIZED (
       |  SELECT a.i AS i, b.i AS j, abs(a.x - b.x) AS ax, abs(a.y - b.y) AS ay
       |  FROM dense a CROSS JOIN dense b),
       |rowm AS (SELECT i, avg(ax) AS rx, avg(ay) AS ry FROM pair GROUP BY 1),
       |gm AS (SELECT avg(ax) AS gx, avg(ay) AS gy FROM pair),
       |cent AS (
       |  SELECT (p.ax - r1.rx - r2.rx + gm.gx) AS axc,
       |         (p.ay - r1.ry - r2.ry + gm.gy) AS ayc
       |  FROM pair p JOIN rowm r1 ON r1.i = p.i JOIN rowm r2 ON r2.i = p.j
       |  CROSS JOIN gm),
       |a AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n2, sum(axc * ayc) AS sxy,
       |         sum(axc * axc) AS sxx, sum(ayc * ayc) AS syy
       |  FROM cent)
       |SELECT CAST(sqrt(n2) AS BIGINT) AS n_days,
       |       ${Det.rndSql("sxy / sqrt(sxx * syy)", 4)} AS dcor2
       |FROM a""".stripMargin

  /** Daily-revenue ACF ρ_k for k = 1..maxLag (full-mean biased-1/n
    * estimator) — shared by [[pacf]] and [[ljungBox]]. One row per
    * lag: (k, n, rho), rho a deterministic double assembled from
    * exact integer sums (Σxₜx₍ₜ₊ₖ₎, head/tail sums, Σx, Σx²). */
  private def dailyAcfOf(events: DataFrame, maxLag: Int): DataFrame = {
    val byDay = events
      .select(to_date(col("ts")).as("d"), Det.cents(col("value")).as("c"))
      .groupBy("d").agg(sum("c").as("c"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"), col("d0"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(col("i").cast("long").as("i"), coalesce(col("c"), lit(0L)).as("x"))
      .localCheckpoint() // calendar-bounded; lag joins + totals read it
    val tot = dense.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum((col("x").cast("decimal(38,0)")) * col("x")).cast("double").as("sxx"))
    val lagged = dense
      .select(col("i"), col("x"), explode(sequence(lit(1), lit(maxLag))).as("k"))
      .withColumn("j", col("i") + col("k"))
      .join(dense.select(col("i").as("j"), col("x").as("xb")), Seq("j"))
      .groupBy("k")
      .agg(sum((col("x").cast("decimal(38,0)")) * col("xb")).cast("double").as("sk"),
        sum("x").cast("double").as("hk"), sum("xb").cast("double").as("tk"),
        count(lit(1)).cast("double").as("cnt"))
    lagged.crossJoin(broadcast(tot))
      .select(col("k").cast("long").as("k"), col("n"),
        expr("(sk - (CAST(sx AS DOUBLE) / n) * (hk + tk)" +
          " + cnt * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))" +
          " / (sxx - n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))")
          .as("rho"))
  }

  /** The identical ACF pipeline as a DuckDB CTE chain ending in `acf`
    * (k, n, rho) — shared verbatim by both oracle twins. */
  private def dailyAcfCte(maxLag: Int): String =
    s"""byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(${Det.centsSql("value")}) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |dense AS (
       |  SELECT CAST(g.i AS BIGINT) AS i, coalesce(byday.c, 0) AS x
       |  FROM (SELECT unnest(range(nd + 1)) AS i, d0 FROM sp) g
       |  LEFT JOIN byday ON byday.d = g.d0 + CAST(g.i AS INTEGER)),
       |tot AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |               CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
       |        FROM dense),
       |lagged AS (
       |  SELECT a.k,
       |         CAST(sum(CAST(a.x AS HUGEINT) * b.x) AS DOUBLE) AS sk,
       |         CAST(sum(a.x) AS DOUBLE) AS hk, CAST(sum(b.x) AS DOUBLE) AS tk,
       |         CAST(count(*) AS DOUBLE) AS cnt
       |  FROM (SELECT i, x, k, i + k AS j FROM dense
       |        CROSS JOIN (SELECT unnest(range(1, ${maxLag + 1})) AS k)) a
       |  JOIN dense b ON b.i = a.j
       |  GROUP BY 1),
       |acf AS (
       |  SELECT CAST(k AS BIGINT) AS k, n,
       |         (sk - (CAST(sx AS DOUBLE) / n) * (hk + tk)
       |          + cnt * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
       |         / (sxx - n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) AS rho
       |  FROM lagged CROSS JOIN tot)""".stripMargin

  /** PARTIAL AUTOCORRELATION (Durbin–Levinson, lags 1–3) of the daily
    * revenue series: φ_kk strips the shorter-lag chain out of ρ_k —
    * the AR-order diagnostic ([[ExtensionQueries.autocorr]] answers
    * "is there memory at lag k", PACF answers "is lag k NEEDED once
    * lags < k are modeled"). Closed-form recursion on three ρ values;
    * no fitting.
    *
    * Scale shape: one corpus pass to the day histogram; the lag sums
    * are calendar-bounded equi-joins; the recursion is scalar
    * algebra on one row, identical text in both engines. */
  def pacf(spark: SparkSession, dir: String): DataFrame =
    pacfOf(Tables(spark, dir, "events"))

  /** Durbin–Levinson closed forms over r1..r3 (shared text). */
  private val PacfPhi2 = "((r2 - r1 * r1) / (1.0 - r1 * r1))"
  private val PacfPhi21 = s"(r1 - $PacfPhi2 * r1)"
  private val PacfPhi3 =
    s"((r3 - $PacfPhi21 * r2 - $PacfPhi2 * r1)" +
      s" / (1.0 - $PacfPhi21 * r1 - $PacfPhi2 * r2))"

  private[graft] def pacfOf(events: DataFrame): DataFrame = {
    val wide = dailyAcfOf(events, 3)
      .groupBy().agg(max("n").as("n"),
        max(when(col("k") === 1, col("rho"))).as("r1"),
        max(when(col("k") === 2, col("rho"))).as("r2"),
        max(when(col("k") === 3, col("rho"))).as("r3"))
    wide.select(explode(array(
        struct(lit(1L).as("lag"), col("n").as("n_days"),
          Det.rnd(col("r1"), 4).as("acf"), Det.rnd(col("r1"), 4).as("pacf")),
        struct(lit(2L).as("lag"), col("n").as("n_days"),
          Det.rnd(col("r2"), 4).as("acf"),
          Det.rnd(expr(PacfPhi2), 4).as("pacf")),
        struct(lit(3L).as("lag"), col("n").as("n_days"),
          Det.rnd(col("r3"), 4).as("acf"),
          Det.rnd(expr(PacfPhi3), 4).as("pacf")))).as("r"))
      .select(col("r.lag").as("lag"), col("r.n_days").as("n_days"),
        col("r.acf").as("acf"), col("r.pacf").as("pacf"))
      .orderBy("lag")
  }

  val pacfSql: String =
    s"""WITH ${dailyAcfCte(3)},
       |wide AS (
       |  SELECT max(n) AS n,
       |         max(CASE WHEN k = 1 THEN rho END) AS r1,
       |         max(CASE WHEN k = 2 THEN rho END) AS r2,
       |         max(CASE WHEN k = 3 THEN rho END) AS r3
       |  FROM acf)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS lag, n AS n_days,
       |         ${Det.rndSql("r1", 4)} AS acf, ${Det.rndSql("r1", 4)} AS pacf
       |  FROM wide
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT), n, ${Det.rndSql("r2", 4)},
       |         ${Det.rndSql(PacfPhi2, 4)} FROM wide
       |  UNION ALL
       |  SELECT CAST(3 AS BIGINT), n, ${Det.rndSql("r3", 4)},
       |         ${Det.rndSql(PacfPhi3, 4)} FROM wide)
       |ORDER BY lag""".stripMargin

  /** LJUNG–BOX PORTMANTEAU TEST (lags 1–7) on the daily revenue
    * series: Q = n(n+2)·Σρ_k²/(n−k) against χ²₇ — the ONE-number
    * "is there any serial structure at all" gate run before trusting
    * i.i.d.-assuming statistics (bootstrap, plain CIs) on a time
    * series. Critical value 14.067 (95%) pinned as a literal so no
    * engine quantile function is involved.
    *
    * Scale shape: same calendar-bounded ACF machinery as [[pacf]];
    * one summed assembly, fenced once. */
  def ljungBox(spark: SparkSession, dir: String): DataFrame =
    ljungBoxOf(Tables(spark, dir, "events"))

  private[graft] def ljungBoxOf(events: DataFrame): DataFrame = {
    dailyAcfOf(events, 7)
      .agg(max("n").as("n"),
        sum(col("rho") * col("rho") / (col("n") - col("k"))).as("s"))
      .select(col("n").as("n_days"), lit(7L).as("df"),
        Det.rnd(col("n") * (col("n") + 2) * col("s"), 4).as("q_stat"),
        (col("n") * (col("n") + 2) * col("s") > 14.067).as("reject_white_noise"))
  }

  val ljungBoxSql: String =
    s"""WITH ${dailyAcfCte(7)},
       |a AS (SELECT max(n) AS n,
       |             sum(rho * rho / (n - k)) AS s
       |      FROM acf)
       |SELECT n AS n_days, CAST(7 AS BIGINT) AS df,
       |       ${Det.rndSql("n * (n + 2) * s", 4)} AS q_stat,
       |       n * (n + 2) * s > 14.067 AS reject_white_noise
       |FROM a""".stripMargin

  /** GUMBEL BLOCK-MAXIMA RETURN LEVELS: weekly maxima of the daily
    * revenue series fit a Gumbel law by method of moments
    * (β = s·√6/π, μ = m̄ − γβ), giving the T-week RETURN LEVEL
    * μ − β·ln(−ln(1−1/T)) — "the weekly peak you should expect once a
    * quarter / once a year", the extreme-value capacity number
    * [[ExtensionQueries.hillTail]]'s tail index (per-order, shape
    * only) and [[ExtensionQueries.tailLatency]]'s empirical p99
    * (within-sample only) can't extrapolate to. Euler–Mascheroni and
    * √6/π enter as pinned literals.
    *
    * Scale shape: one pass to the day histogram, one groupBy to
    * week maxima (calendar-bounded), exact integer moments of the
    * maxima, closed-form assembly fenced per row. */
  def gevReturn(spark: SparkSession, dir: String): DataFrame =
    gevReturnOf(Tables(spark, dir, "events"))

  private[graft] def gevReturnOf(events: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val byDay = events
      .select(to_date(col("ts")).as("d"), Det.cents(col("value")).as("c"))
      .groupBy("d").agg(sum("c").as("c"))
    val t0 = byDay.agg(min(col("d")).as("d0"))
    val weekMax = byDay.crossJoin(broadcast(t0))
      .select((datediff(col("d"), col("d0")) / 7).cast("long").as("wk"), col("c"))
      .groupBy("wk").agg(max("c").as("mx"))
    val mom = weekMax.agg(count(lit(1)).cast("double").as("n"),
      sum("mx").cast("double").as("s"),
      sum((col("mx").cast(d38)) * col("mx")).cast("double").as("q"))
    // β = s_sample·√6/π, μ = mean − γ·β  (γ = Euler–Mascheroni)
    val beta = "(sqrt((q - s * s / n) / (n - 1)) * 0.7796968012336793)"
    val mu = s"(s / n - 0.5772156649015329 * $beta)"
    // ln(−ln(1−1/T)) are CONSTANTS — pinned as literals so no engine
    // libm ln() enters the plan (sqrt alone is IEEE-exact); observed:
    // a 1-ulp engine ln() spread landed exactly on a 2dp fence edge
    val k13 = math.log(-math.log(1.0 - 1.0 / 13))
    val k52 = math.log(-math.log(1.0 - 1.0 / 52))
    mom.select(explode(array(
        struct(lit(13L).as("t_weeks"), col("n").cast("long").as("n_weeks"),
          Det.rnd(expr(s"($mu - $beta * ($k13))") / 100.0, 2)
            .as("return_level_dollars")),
        struct(lit(52L).as("t_weeks"), col("n").cast("long").as("n_weeks"),
          Det.rnd(expr(s"($mu - $beta * ($k52))") / 100.0, 2)
            .as("return_level_dollars")))).as("r"))
      .select(col("r.t_weeks").as("t_weeks"), col("r.n_weeks").as("n_weeks"),
        col("r.return_level_dollars").as("return_level_dollars"))
      .orderBy("t_weeks")
  }

  val gevReturnSql: String = {
    val beta = "(sqrt((q - s * s / n) / (n - 1)) * 0.7796968012336793)"
    val mu = s"(s / n - 0.5772156649015329 * $beta)"
    val k13 = math.log(-math.log(1.0 - 1.0 / 13))
    val k52 = math.log(-math.log(1.0 - 1.0 / 52))
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(${Det.centsSql("value")}) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |t0 AS (SELECT min(d) AS d0 FROM byday),
       |wm AS (
       |  SELECT date_diff('day', d0, d) // 7 AS wk, max(c) AS mx
       |  FROM byday CROSS JOIN t0 GROUP BY 1),
       |mom AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(mx) AS DOUBLE) AS s,
       |         CAST(sum(CAST(mx AS HUGEINT) * mx) AS DOUBLE) AS q
       |  FROM wm)
       |SELECT * FROM (
       |  SELECT CAST(13 AS BIGINT) AS t_weeks, CAST(n AS BIGINT) AS n_weeks,
       |         ${Det.rndSql(
            s"($mu - $beta * ($k13)) / 100.0", 2)}
       |           AS return_level_dollars
       |  FROM mom
       |  UNION ALL
       |  SELECT CAST(52 AS BIGINT), CAST(n AS BIGINT),
       |         ${Det.rndSql(
            s"($mu - $beta * ($k52)) / 100.0", 2)}
       |  FROM mom)
       |ORDER BY t_weeks""".stripMargin
  }

  /** THEIL-T INEQUALITY DECOMPOSITION of customer revenue by nation:
    * T = Σ(yᵢ/Y)·ln(yᵢ/μ) splits EXACTLY into within-nation +
    * between-nation terms — the question
    * [[ExtensionQueries.giniConcentration]] cannot answer (Gini does
    * not decompose): is revenue inequality a within-market
    * phenomenon or a cross-market one? The between share is the
    * emitted verdict.
    *
    * Scale shape: one join + one groupBy(custkey) pass to per-customer
    * cents, one groupBy(nation); the per-customer ln() runs on exact
    * integer ratios and aggregates with map-side partials (the only
    * corpus-sized float sum — fenced; the decomposition identity is
    * emitted as an audit residual). */
  def theilDecomposition(spark: SparkSession, dir: String): DataFrame =
    theilDecompositionOf(Tables(spark, dir, "customer"), Tables(spark, dir, "orders"))

  private[graft] def theilDecompositionOf(
      customer: DataFrame, orders: DataFrame): DataFrame = {
    val cust = orders
      .select(col("o_custkey"), Det.cents(col("o_totalprice")).as("c"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("g"), col("o_custkey").as("ck"))
      .agg(sum("c").as("y"))
      .localCheckpoint() // customer-bounded; three aggregates read it
    val gstat = cust.groupBy("g").agg(sum("y").as("yg"), count(lit(1)).as("ng"))
    val tot = gstat.agg(sum("yg").as("yt"), sum("ng").as("nt"))
    // T_total = Σ (y/Y)·ln(y·N/Y); T_between = Σ (Yg/Y)·ln((Yg/Y)/(ng/N))
    val tTotal = cust.crossJoin(broadcast(tot))
      .agg(sum(col("y").cast("double") / col("yt")
        * log(col("y").cast("double") * col("nt") / col("yt"))).as("t_total"))
    val tBetween = gstat.crossJoin(broadcast(tot))
      .agg(sum(col("yg").cast("double") / col("yt")
        * log(col("yg").cast("double") * col("nt")
          / (col("yt").cast("double") * col("ng")))).as("t_between"))
    tTotal.crossJoin(tBetween)
      .select(Det.rnd(col("t_total"), 6).as("theil_total"),
        Det.rnd(col("t_between"), 6).as("theil_between"),
        Det.rnd(col("t_total") - col("t_between"), 6).as("theil_within"),
        Det.rnd(col("t_between") / col("t_total"), 6).as("between_share"))
  }

  val theilDecompositionSql: String =
    s"""WITH cust AS (
       |  SELECT c_nationkey AS g, o_custkey AS ck,
       |         CAST(sum(${Det.centsSql("o_totalprice")}) AS BIGINT) AS y
       |  FROM orders JOIN customer ON c_custkey = o_custkey
       |  GROUP BY 1, 2),
       |gstat AS (SELECT g, CAST(sum(y) AS BIGINT) AS yg, count(*) AS ng
       |          FROM cust GROUP BY 1),
       |tot AS (SELECT CAST(sum(yg) AS BIGINT) AS yt,
       |               CAST(sum(ng) AS BIGINT) AS nt FROM gstat),
       |tt AS (
       |  SELECT sum(CAST(y AS DOUBLE) / yt
       |             * ln(CAST(y AS DOUBLE) * nt / yt)) AS t_total
       |  FROM cust CROSS JOIN tot),
       |tb AS (
       |  SELECT sum(CAST(yg AS DOUBLE) / yt
       |             * ln(CAST(yg AS DOUBLE) * nt
       |                  / (CAST(yt AS DOUBLE) * ng))) AS t_between
       |  FROM gstat CROSS JOIN tot)
       |SELECT ${Det.rndSql("t_total", 6)} AS theil_total,
       |       ${Det.rndSql("t_between", 6)} AS theil_between,
       |       ${Det.rndSql("t_total - t_between", 6)} AS theil_within,
       |       ${Det.rndSql("t_between / t_total", 6)} AS between_share
       |FROM tt CROSS JOIN tb""".stripMargin

  /** JAIN'S FAIRNESS INDEX J = (Σx)²/(n·Σx²) for two allocations —
    * events per user and revenue per customer: the systems-standard
    * fairness scalar (1 = perfectly even, 1/n = one entity holds
    * everything; J = 1/(1+cv²), so the cv rides along).
    * [[ExtensionQueries.giniConcentration]] ranks the whole Lorenz
    * curve; J is the number capacity planners and schedulers quote.
    *
    * Scale shape: one groupBy per allocation to per-entity integer
    * totals, exact integer moment sums (Σx in BIGINT, Σx² in
    * decimal(38,0)), closed-form assembly fenced per row. */
  def jainsIndex(spark: SparkSession, dir: String): DataFrame =
    jainsIndexOf(Tables(spark, dir, "events"), Tables(spark, dir, "orders"))

  private[graft] def jainsIndexOf(
      events: DataFrame, orders: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    def momentsOf(per: DataFrame) = per.agg(
      count(lit(1)).cast("double").as("n"),
      sum("x").cast("double").as("s"),
      sum((col("x").cast(d38)) * col("x")).cast("double").as("q"))
    val ue = momentsOf(events.groupBy("user_id").agg(count(lit(1)).as("x")))
    val cr = momentsOf(orders.groupBy("o_custkey")
      .agg(sum(Det.cents(col("o_totalprice"))).as("x")))
    def rowOf(tag: String, m: DataFrame) = m.select(lit(tag).as("allocation"),
      col("n").cast("long").as("n_entities"),
      Det.rnd(expr("s * s / (n * q)"), 6).as("jains_j"),
      Det.rnd(expr("sqrt(n * q / (s * s) - 1.0)"), 6).as("cv"))
    rowOf("events_per_user", ue).union(rowOf("revenue_per_customer", cr))
      .orderBy("allocation")
  }

  val jainsIndexSql: String = {
    def block(tag: String, sub: String) =
      s"""SELECT '$tag' AS allocation, CAST(n AS BIGINT) AS n_entities,
         |       ${Det.rndSql("s * s / (n * q)", 6)} AS jains_j,
         |       ${Det.rndSql("sqrt(n * q / (s * s) - 1.0)", 6)} AS cv
         |FROM (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(x) AS DOUBLE) AS s,
         |             CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS q
         |      FROM ($sub))""".stripMargin
    s"""SELECT * FROM (
       |${block("events_per_user",
          "SELECT user_id, count(*) AS x FROM events GROUP BY 1")}
       |UNION ALL
       |${block("revenue_per_customer",
          s"SELECT o_custkey, CAST(sum(${Det.centsSql("o_totalprice")}) AS BIGINT) AS x" +
            " FROM orders GROUP BY 1")})
       |ORDER BY allocation""".stripMargin
  }

  /** HODGES–LEHMANN PSEUDO-MEDIAN of daily revenue: the median of all
    * pairwise Walsh averages (xᵢ+xⱼ)/2, i ≤ j — the location
    * estimator dual to the Wilcoxon test (≈ 96% Gaussian efficiency
    * with a 29% breakdown point; the plain median trades more
    * efficiency, the mean all robustness). Emitted next to both for
    * contrast.
    *
    * Scale shape: corpus → calendar-bounded day histogram; Walsh
    * pairs are calendar² (the Theil–Sen argument); sums xᵢ+xⱼ stay
    * exact integers (half-cents resolved by keeping SUMS and halving
    * once at output), the median is a rank pick. */
  def hodgesLehmann(spark: SparkSession, dir: String): DataFrame =
    hodgesLehmannOf(Tables(spark, dir, "events"))

  private[graft] def hodgesLehmannOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = events
      .select(to_date(col("ts")).as("d"), Det.cents(col("value")).as("c"))
      .groupBy("d").agg(sum("c").as("c"))
      .localCheckpoint() // calendar-bounded; self-joined + medians
    val walsh = byDay.as("a").join(byDay.as("b"), col("a.d") <= col("b.d"))
      .select((col("a.c") + col("b.c")).as("w")) // 2×(Walsh average)
    val wW = Window.orderBy("w")
    val hl = walsh.withColumn("rk", row_number().over(wW))
      .withColumn("n", count(lit(1)).over())
      .agg(((min(when(col("rk") >= expr("(n + 1) div 2"), col("w")))
        + min(when(col("rk") >= expr("n div 2 + 1"), col("w")))) / 2).as("hl2"))
    val wM = Window.orderBy("c")
    val med = byDay.withColumn("rk", row_number().over(wM))
      .withColumn("n", count(lit(1)).over())
      .agg(count(lit(1)).as("n_days_ph"),
        ((min(when(col("rk") >= expr("(n + 1) div 2"), col("c")))
          + min(when(col("rk") >= expr("n div 2 + 1"), col("c")))) / 2).as("med"))
    val mean = byDay.agg(count(lit(1)).as("n_days"), sum("c").as("s"))
    mean.crossJoin(hl).crossJoin(med.select("med"))
      .select(col("n_days"),
        Det.rnd(col("hl2") / 200.0, 2).as("hodges_lehmann_dollars"),
        Det.rnd(col("med") / 100.0, 2).as("median_dollars"),
        Det.rnd(col("s").cast("double") / col("n_days") / 100.0, 2)
          .as("mean_dollars"))
  }

  val hodgesLehmannSql: String =
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(${Det.centsSql("value")}) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |walsh AS (
       |  SELECT a.c + b.c AS w
       |  FROM byday a JOIN byday b ON a.d <= b.d),
       |hl AS (
       |  SELECT (min(CASE WHEN rk >= (n + 1) // 2 THEN w END)
       |          + min(CASE WHEN rk >= n // 2 + 1 THEN w END)) / 2 AS hl2
       |  FROM (SELECT w, row_number() OVER (ORDER BY w) AS rk,
       |               count(*) OVER () AS n FROM walsh)),
       |med AS (
       |  SELECT (min(CASE WHEN rk >= (n + 1) // 2 THEN c END)
       |          + min(CASE WHEN rk >= n // 2 + 1 THEN c END)) / 2 AS med
       |  FROM (SELECT c, row_number() OVER (ORDER BY c) AS rk,
       |               count(*) OVER () AS n FROM byday)),
       |mn AS (SELECT count(*) AS n_days, CAST(sum(c) AS BIGINT) AS s FROM byday)
       |SELECT n_days,
       |       ${Det.rndSql("hl2 / 200.0", 2)} AS hodges_lehmann_dollars,
       |       ${Det.rndSql("med / 100.0", 2)} AS median_dollars,
       |       ${Det.rndSql("CAST(s AS DOUBLE) / n_days / 100.0", 2)} AS mean_dollars
       |FROM mn CROSS JOIN hl CROSS JOIN med""".stripMargin

  /** PAGE'S TREND TEST (ordered alternatives) over the same
    * month-block × priority ranks as [[friedmanTest]]: L = Σ j·R_j
    * with treatments in their hypothesized order — sensitive to a
    * MONOTONE progression Friedman's any-difference χ² dilutes. The
    * z approximation uses the exact closed-form E(L) and Var(L).
    *
    * Scale shape: identical calendar-bounded rank machinery as
    * Friedman; L and its moments are exact integers/rationals, one
    * fence. */
  def pageTrend(spark: SparkSession, dir: String): DataFrame =
    pageTrendOf(Tables(spark, dir, "orders"))

  private[graft] def pageTrendOf(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 5
    val cells = orders
      .select(date_trunc("month", col("o_orderdate")).as("mon"),
        col("o_orderpriority").as("trt"),
        Det.cents(col("o_totalprice")).as("cents"))
      .groupBy("mon", "trt").agg(sum("cents").as("rev"))
    val complete = cells.groupBy("mon").agg(count(lit(1)).as("n_trt"))
      .filter(col("n_trt") === k).select("mon")
    val ranked = cells.join(broadcast(complete), Seq("mon"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("mon").orderBy(col("rev"), col("trt"))))
      // hypothesized order = priority name order (1-URGENT … 5-LOW):
      // j = the treatment's ordinal in that order
      .withColumn("j", dense_rank().over(Window.orderBy("trt")))
    val l = ranked.agg(sum(col("j") * col("rk")).as("l"),
      (count(lit(1)) / k).cast("long").as("b"))
    l.select(col("b").as("b_blocks"), col("l").as("page_l"),
        Det.rnd((col("l").cast("double")
          - lit(k * (k + 1) * (k + 1) / 4.0) * col("b"))
          / sqrt(lit(k * k * (k + 1) * (k * k - 1) / 144.0) * col("b")), 4)
          .as("z"))
  }

  val pageTrendSql: String = {
    val k = 5
    s"""WITH cells AS (
       |  SELECT date_trunc('month', o_orderdate) AS mon, o_orderpriority AS trt,
       |         CAST(sum(${Det.centsSql("o_totalprice")}) AS BIGINT) AS rev
       |  FROM orders GROUP BY 1, 2),
       |complete AS (SELECT mon FROM cells GROUP BY 1 HAVING count(*) = $k),
       |ranked AS (
       |  SELECT row_number() OVER (PARTITION BY mon ORDER BY rev, trt) AS rk,
       |         dense_rank() OVER (ORDER BY trt) AS j
       |  FROM cells JOIN complete USING (mon)),
       |a AS (SELECT CAST(sum(j * rk) AS BIGINT) AS l,
       |             count(*) // $k AS b FROM ranked)
       |SELECT b AS b_blocks, l AS page_l,
       |       ${Det.rndSql(
          s"(CAST(l AS DOUBLE) - ${k * (k + 1) * (k + 1) / 4.0} * b)" +
            s" / sqrt(${k * k * (k + 1) * (k * k - 1) / 144.0} * b)", 4)} AS z
       |FROM a""".stripMargin
  }

  /** CIRCULAR STATISTICS of event arrival hour per type: the circular
    * mean hour, the resultant length R̄ (1 = all events at one hour,
    * 0 = uniform around the clock), and the Rayleigh test z = n·R̄²
    * against 24-hour uniformity — the CORRECT treatment of
    * hour-of-day as an angle, where [[ExtensionQueries.heatmapHour]]'s
    * linear histogram can't even average 23:00 and 01:00 to midnight.
    * The 24 unit-circle coordinates are PINNED Scala-computed
    * literals (the Gumbel lesson: constants never go through engine
    * libm); atan2 is the one data-dependent transcendental, fenced.
    *
    * Scale shape: one pass to the (type × 24)-bin histogram; the
    * trig algebra runs on that vocabulary-bounded relation. */
  def circularStats(spark: SparkSession, dir: String): DataFrame =
    circularStatsOf(Tables(spark, dir, "events"))

  private[graft] def circularStatsOf(events: DataFrame): DataFrame = {
    val cosW = (0 until 24).map(h => math.cos(2 * math.Pi * h / 24))
    val sinW = (0 until 24).map(h => math.sin(2 * math.Pi * h / 24))
    val cosCase = (0 until 24).map(h => s"WHEN h = $h THEN ${cosW(h)}")
      .mkString("CASE ", " ", " END")
    val sinCase = (0 until 24).map(h => s"WHEN h = $h THEN ${sinW(h)}")
      .mkString("CASE ", " ", " END")
    val hist = events
      .select(col("event_type").as("ty"), hour(col("ts")).as("h"))
      .groupBy("ty", "h").agg(count(lit(1)).as("cnt"))
    hist.groupBy("ty")
      .agg(sum("cnt").as("n"),
        sum(expr(s"cnt * ($cosCase)")).as("c"),
        sum(expr(s"cnt * ($sinCase)")).as("s"))
      .select(col("ty").as("event_type"), col("n"),
        Det.rnd(expr(
          "pmod(atan2(s, c) * 12.0 / pi() + 24.0, 24.0)"), 4).as("mean_hour"),
        Det.rnd(expr("sqrt(c * c + s * s)") / col("n"), 6).as("resultant_r"),
        Det.rnd(expr("(c * c + s * s)") / col("n"), 4).as("rayleigh_z"),
        (expr("(c * c + s * s)") / col("n") > 2.9957).as("nonuniform"))
      .orderBy("event_type")
  }

  val circularStatsSql: String = {
    val cosW = (0 until 24).map(h => math.cos(2 * math.Pi * h / 24))
    val sinW = (0 until 24).map(h => math.sin(2 * math.Pi * h / 24))
    val cosCase = (0 until 24).map(h => s"WHEN h = $h THEN ${cosW(h)}")
      .mkString("CASE ", " ", " END")
    val sinCase = (0 until 24).map(h => s"WHEN h = $h THEN ${sinW(h)}")
      .mkString("CASE ", " ", " END")
    s"""WITH hist AS (
       |  SELECT event_type AS ty, hour(ts) AS h, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |agg AS (
       |  SELECT ty, CAST(sum(cnt) AS BIGINT) AS n,
       |         sum(cnt * ($cosCase)) AS c,
       |         sum(cnt * ($sinCase)) AS s
       |  FROM hist GROUP BY 1)
       |SELECT ty AS event_type, n,
       |       ${Det.rndSql(
            "fmod(fmod(atan2(s, c) * 12.0 / pi(), 24.0) + 24.0, 24.0)", 4)}
       |         AS mean_hour,
       |       ${Det.rndSql("sqrt(c * c + s * s) / n", 6)} AS resultant_r,
       |       ${Det.rndSql("(c * c + s * s) / n", 4)} AS rayleigh_z,
       |       (c * c + s * s) / n > 2.9957 AS nonuniform
       |FROM agg
       |ORDER BY event_type""".stripMargin
  }

  /** COCHRAN–ARMITAGE TREND TEST: is the 'F'-status share of orders
    * drifting LINEARLY across the ordered years? The
    * ordered-exposure test for proportions — [[ExtensionQueries.chiSquare]]
    * asks "any association at all" and burns power on non-monotone
    * patterns; CA concentrates it on the trend with weights = year
    * index. z = Σwᵢ(xᵢ − nᵢp̄) / √[p̄(1−p̄)(Σwᵢ²nᵢ − (Σwᵢnᵢ)²/N)] —
    * every moment an exact integer, one fenced assembly.
    *
    * Scale shape: one groupBy(year) pass; the test runs on the
    * ≤7-row year table. */
  def cochranArmitage(spark: SparkSession, dir: String): DataFrame =
    cochranArmitageOf(Tables(spark, dir, "orders"))

  private[graft] def cochranArmitageOf(orders: DataFrame): DataFrame = {
    val yr = orders
      .select(year(col("o_orderdate")).as("y"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("f"))
      .groupBy("y").agg(count(lit(1)).as("n_i"), sum("f").as("x_i"))
    val t0 = yr.agg(min("y").as("y0"))
    val w = yr.crossJoin(broadcast(t0))
      .select((col("y") - col("y0")).cast("long").as("w"),
        col("n_i"), col("x_i"))
    w.agg(count(lit(1)).as("k"), sum("n_i").as("nn"), sum("x_i").as("xx"),
        sum(col("w") * col("x_i")).cast("double").as("swx"),
        sum(col("w") * col("n_i")).cast("double").as("swn"),
        sum(col("w") * col("w") * col("n_i")).cast("double").as("swwn"))
      .select(col("k").as("n_years"), col("nn").as("n_orders"),
        Det.rnd(col("xx").cast("double") / col("nn"), 6).as("p_overall"),
        Det.rnd(expr(
          "(swx - (CAST(xx AS DOUBLE) / nn) * swn)" +
            " / sqrt((CAST(xx AS DOUBLE) / nn) * (1.0 - CAST(xx AS DOUBLE) / nn)" +
            " * (swwn - swn * swn / nn))"), 4).as("z_trend"))
  }

  val cochranArmitageSql: String =
    s"""WITH yr AS (
       |  SELECT year(o_orderdate) AS y, count(*) AS n_i,
       |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS x_i
       |  FROM orders GROUP BY 1),
       |t0 AS (SELECT min(y) AS y0 FROM yr),
       |w AS (SELECT CAST(y - y0 AS BIGINT) AS w, n_i, x_i
       |      FROM yr CROSS JOIN t0),
       |a AS (
       |  SELECT count(*) AS k, CAST(sum(n_i) AS BIGINT) AS nn,
       |         CAST(sum(x_i) AS BIGINT) AS xx,
       |         CAST(sum(w * x_i) AS DOUBLE) AS swx,
       |         CAST(sum(w * n_i) AS DOUBLE) AS swn,
       |         CAST(sum(w * w * n_i) AS DOUBLE) AS swwn
       |  FROM w)
       |SELECT k AS n_years, nn AS n_orders,
       |       ${Det.rndSql("CAST(xx AS DOUBLE) / nn", 6)} AS p_overall,
       |       ${Det.rndSql(
          "(swx - (CAST(xx AS DOUBLE) / nn) * swn)" +
            " / sqrt((CAST(xx AS DOUBLE) / nn) * (1.0 - CAST(xx AS DOUBLE) / nn)" +
            " * (swwn - swn * swn / nn))", 4)} AS z_trend
       |FROM a""".stripMargin

  /** QUANTILE-BASED ROBUST SHAPE per event type: Bowley skewness
    * (Q₁+Q₃−2·Q₂)/(Q₃−Q₁) and Moors kurtosis
    * ((E₇−E₅)+(E₃−E₁))/(E₆−E₂) from rank-picked octiles — the
    * outlier-immune skew/kurtosis that [[StreamQueries.quantileSketch]]'s
    * moment-based shape stats are not (one wild value saturates a
    * classical kurtosis; octiles shrug). Every octile is an exact
    * integer rank pick; the two ratios are integer-over-integer,
    * fenced once each.
    *
    * Scale shape: one pass to per-type ordered values with
    * type-partitioned rank windows (the tail-latency pattern — never
    * a global sort); the shape algebra runs on a k-type relation. */
  def robustShape(spark: SparkSession, dir: String): DataFrame =
    robustShapeOf(Tables(spark, dir, "events"))

  private[graft] def robustShapeOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("ty").orderBy("c")
    val ranked = events
      .select(col("event_type").as("ty"), Det.cents(col("value")).as("c"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("ty")))
    val octCols = (1 to 7).map(i =>
      min(when(col("rk") >= expr(s"($i * n + 7) div 8"), col("c"))).as(s"e$i"))
    val oct = ranked.groupBy("ty").agg(max("n").as("n"), octCols: _*)
    oct.select(col("ty").as("event_type"), col("n"),
        Det.rnd(expr("CAST(e2 + e6 - 2 * e4 AS DOUBLE) / (e6 - e2)"), 4)
          .as("bowley_skew"),
        Det.rnd(expr("CAST((e7 - e5) + (e3 - e1) AS DOUBLE) / (e6 - e2)"), 4)
          .as("moors_kurtosis"),
        Det.rnd(col("e4").cast("double") / 100.0, 2).as("median_dollars"))
      .orderBy("event_type")
  }

  val robustShapeSql: String = {
    val octs = (1 to 7).map(i =>
      s"min(CASE WHEN rk >= ($i * n + 7) // 8 THEN c END) AS e$i").mkString(", ")
    s"""WITH ranked AS (
       |  SELECT event_type AS ty, ${Det.centsSql("value")} AS c,
       |         row_number() OVER (PARTITION BY event_type
       |           ORDER BY ${Det.centsSql("value")}) AS rk,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events),
       |oct AS (SELECT ty, max(n) AS n, $octs FROM ranked GROUP BY 1)
       |SELECT ty AS event_type, CAST(n AS BIGINT) AS n,
       |       ${Det.rndSql("CAST(e2 + e6 - 2 * e4 AS DOUBLE) / (e6 - e2)", 4)}
       |         AS bowley_skew,
       |       ${Det.rndSql("CAST((e7 - e5) + (e3 - e1) AS DOUBLE) / (e6 - e2)", 4)}
       |         AS moors_kurtosis,
       |       ${Det.rndSql("CAST(e4 AS DOUBLE) / 100.0", 2)} AS median_dollars
       |FROM oct
       |ORDER BY event_type""".stripMargin
  }

  val jackknifeRatioSql: String = {
    val varSum = "(sd2 - sd * sd / k)"
    s"""WITH g AS (
       |  SELECT c_nationkey, CAST(sum(${Det.centsSql("o_totalprice")}) AS BIGINT) AS s_i,
       |         CAST(count(DISTINCT o_custkey) AS BIGINT) AS c_i
       |  FROM orders JOIN customer ON c_custkey = o_custkey
       |  GROUP BY 1),
       |t AS (SELECT CAST(sum(s_i) AS BIGINT) AS s, CAST(sum(c_i) AS BIGINT) AS c,
       |             count(*) AS k FROM g),
       |r AS (
       |  SELECT s, c, k,
       |         CAST(s - s_i AS DOUBLE) / CAST(c - c_i AS DOUBLE)
       |           - CAST(s AS DOUBLE) / c AS d_i
       |  FROM g CROSS JOIN t),
       |a AS (
       |  SELECT max(k) AS k, max(s) AS s, max(c) AS c,
       |         sum(d_i) AS sd, sum(d_i * d_i) AS sd2
       |  FROM r)
       |SELECT k AS n_groups,
       |       ${Det.rndSql("CAST(s AS DOUBLE) / c / 100.0", 4)} AS ratio_per_cust,
       |       ${Det.rndSql(s"sqrt((k - 1.0) / k * $varSum) / 100.0", 4)} AS jk_se,
       |       ${Det.rndSql("(k - 1.0) * (sd / k) / 100.0", 6)} AS jk_bias,
       |       ${Det.rndSql(
            s"(CAST(s AS DOUBLE) / c - 1.96 * sqrt((k - 1.0) / k * $varSum)) / 100.0", 4)} AS ci_lo,
       |       ${Det.rndSql(
            s"(CAST(s AS DOUBLE) / c + 1.96 * sqrt((k - 1.0) / k * $varSum)) / 100.0", 4)} AS ci_hi
       |FROM a""".stripMargin
  }

  private val SaxWin = 7     // days per PAA window
  private val SaxWord = 3    // windows per SAX word
  private val SaxBp = 0.6745 // N(0,1) quartile breakpoints -> 4 symbols

  /** SAX SYMBOLIZATION + MOTIF CENSUS of the daily revenue series
    * (Lin et al. 2003): PAA over [[SaxWin]]-day windows, z-normalize
    * against the window population, quantize at the fixed N(0,1)
    * quartile breakpoints into symbols a-d, and report the most
    * frequent [[SaxWord]]-window words — the discrete-pattern view of
    * the series ([[matrixProfile]] finds the single best motif by
    * exact distance; the SAX census counts HOW OFTEN each coarse
    * shape repeats, which is what "is this weekly pattern recurring
    * or a one-off" asks).
    *
    * Scale shape: the dense day grid is calendar-bounded; window sums
    * are exact cents; mu/sigma come from exact integer moments (one
    * division each), so both engines symbolize identical doubles at
    * pinned literal breakpoints. Degenerate all-equal series fences
    * sigma to 1 (symbols all 'c'). */
  def saxMotifs(spark: SparkSession, dir: String): DataFrame =
    saxMotifsOf(Tables(spark, dir, "events"))

  private[graft] def saxMotifsOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val byDay = events
      .select(to_date(col("ts")).as("d"), Det.cents(col("value")).as("c"))
      .groupBy("d").agg(sum("c").as("c"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"), col("d0"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(col("i").cast("long").as("i"), coalesce(col("c"), lit(0L)).as("x"))
    val wins = dense
      .groupBy((col("i") / SaxWin).cast("long").as("win"))
      .agg(count(lit(1)).as("nt"), sum("x").as("s"))
      .filter(col("nt") === SaxWin) // full windows only
    val mom = wins.agg(count(lit(1)).as("n"), sum("s").as("ssum"),
      sum(col("s").cast(d38) * col("s")).as("sq"))
    val sym = wins.crossJoin(broadcast(mom))
      .withColumn("mu", col("ssum").cast("double") / col("n"))
      .withColumn("sg", expr(
        "CASE WHEN n <= 1 THEN 1.0 ELSE " +
          "greatest(sqrt((CAST(sq AS DOUBLE) - CAST(ssum AS DOUBLE) * ssum / n) / (n - 1)), 1.0) END"))
      .withColumn("z", (col("s") - col("mu")) / col("sg"))
      .withColumn("sym",
        when(col("z") < -SaxBp, "a").when(col("z") < 0, "b")
          .when(col("z") < SaxBp, "c").otherwise("d"))
      .select(col("win"), col("sym"))
    val w = Window.orderBy("win")
    val words = sym
      .withColumn("w1", lead("sym", 1).over(w))
      .withColumn("w2", lead("sym", 2).over(w))
      .filter(col("w2").isNotNull)
      .select(col("win"), concat(col("sym"), col("w1"), col("w2")).as("word"))
    words.groupBy("word")
      .agg(count(lit(1)).as("n"), min("win").as("first_win"))
      .orderBy(desc("n"), asc("word"))
      .limit(10)
  }

  val saxMotifsSql: String =
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(${Det.centsSql("value")}) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |grid AS (SELECT unnest(range(nd + 1)) AS i, d0 FROM sp),
       |dense AS (
       |  SELECT CAST(grid.i AS BIGINT) AS i, coalesce(byday.c, 0) AS x
       |  FROM grid LEFT JOIN byday ON byday.d = grid.d0 + CAST(grid.i AS INTEGER)),
       |wins AS (
       |  SELECT i // $SaxWin AS win, count(*) AS nt, CAST(sum(x) AS BIGINT) AS s
       |  FROM dense GROUP BY 1 HAVING count(*) = $SaxWin),
       |mom AS (SELECT count(*) AS n, CAST(sum(s) AS BIGINT) AS ssum,
       |               sum(CAST(s AS HUGEINT) * s) AS sq FROM wins),
       |sym AS (
       |  SELECT win,
       |         CASE WHEN z < -$SaxBp THEN 'a' WHEN z < 0 THEN 'b'
       |              WHEN z < $SaxBp THEN 'c' ELSE 'd' END AS sym
       |  FROM (SELECT win,
       |               (s - CAST(ssum AS DOUBLE) / n) /
       |               (CASE WHEN n <= 1 THEN 1.0 ELSE
       |                 greatest(sqrt((CAST(sq AS DOUBLE) - CAST(ssum AS DOUBLE) * ssum / n) / (n - 1)), 1.0)
       |                END) AS z
       |        FROM wins, mom)),
       |words AS (
       |  SELECT win, sym || lead(sym, 1) OVER w || lead(sym, 2) OVER w AS word
       |  FROM sym WINDOW w AS (ORDER BY win))
       |SELECT word, count(*) AS n, CAST(min(win) AS BIGINT) AS first_win
       |FROM words WHERE word IS NOT NULL AND length(word) = $SaxWord
       |GROUP BY 1
       |ORDER BY n DESC, word
       |LIMIT 10""".stripMargin

  private val EsdRounds = 5
  private val EsdZ = 3.0

  /** ITERATIVE SIGMA-CLIP OUTLIER EXTRACTION over the daily revenue
    * series — the generalized-ESD shape with a fixed z cut: each of
    * [[EsdRounds]] rounds recomputes mean/stddev from the REMAINING
    * days' exact integer moments, extracts the most deviant day
    * (ties by day index), and flags it if |z| > [[EsdZ]]. Unlike the
    * single-pass [[ExtensionQueries.anomalyMad]] rule, re-estimation
    * after each removal keeps one enormous spike from masking the
    * next ([[https://www.itl.nist.gov/div898/handbook/eda/section3/eda35h3.htm ESD masking]]) —
    * the top-k anomaly queue, most-masked last.
    *
    * Scale shape: the series is calendar-bounded; each round is one
    * moment aggregate + one TakeOrdered(1) over it, unrolled
    * [[EsdRounds]] times identically in the oracle. */
  def esdOutliers(spark: SparkSession, dir: String): DataFrame =
    esdOutliersOf(Tables(spark, dir, "events"))

  private[graft] def esdOutliersOf(events: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val byDay = events
      .select(to_date(col("ts")).as("d"), Det.cents(col("value")).as("c"))
      .groupBy("d").agg(sum("c").as("x"))
      .localCheckpoint() // calendar-bounded; re-read every round
    var remaining = byDay
    val spark = events.sparkSession
    var out: DataFrame = null
    for (r <- 1 to EsdRounds) {
      val mom = remaining.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x").cast(d38) * col("x")).as("sxx"))
      val pick = remaining.crossJoin(broadcast(mom))
        .withColumn("mu", col("sx").cast("double") / col("n"))
        .withColumn("sg", expr(
          "CASE WHEN n <= 1 THEN 1.0 ELSE " +
            "greatest(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)), 1e-9) END"))
        .withColumn("z", abs(col("x") - col("mu")) / col("sg"))
        .orderBy(desc("z"), asc("d")).limit(1)
        .select(lit(r).as("round"), col("d").as("day"),
          (col("x").cast("double") / 100.0).as("revenue"),
          Det.rnd(col("z"), 4).as("z"),
          (col("z") > EsdZ).as("flagged"))
        .localCheckpoint() // 1 row
      out = if (out == null) pick else out.unionAll(pick)
      val d = pick.select("day")
      remaining = remaining.join(broadcast(d), remaining("d") === d("day"), "left_anti")
        .localCheckpoint() // calendar-bounded per round
    }
    out.orderBy("round")
  }

  val esdOutliersSql: String = {
    val rounds = (1 to EsdRounds).map { r =>
      val prev = s"r${r - 1}"
      s"""m$r AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |              sum(CAST(x AS HUGEINT) * x) AS sxx FROM $prev),
         |p$r AS MATERIALIZED (
         |  SELECT $r AS round, d AS day, x,
         |         abs(x - CAST(sx AS DOUBLE) / n) /
         |         (CASE WHEN n <= 1 THEN 1.0 ELSE
         |            greatest(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)), 1e-9)
         |          END) AS z
         |  FROM $prev, m$r
         |  ORDER BY z DESC, d LIMIT 1),
         |r$r AS MATERIALIZED (
         |  SELECT $prev.* FROM $prev, p$r WHERE $prev.d <> p$r.day)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to EsdRounds).map(r =>
      s"SELECT round, day, x, z FROM p$r").mkString("\nUNION ALL\n")
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(${Det.centsSql("value")}) AS BIGINT) AS x
       |  FROM events GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT * FROM byday),
       |$rounds
       |SELECT round, day, CAST(x AS DOUBLE) / 100.0 AS revenue,
       |       ${Det.rndSql("z", 4)} AS z, z > $EsdZ AS flagged
       |FROM ($sel)
       |ORDER BY round""".stripMargin
  }

  private val PgramMaxK = 10

  /** PERIODOGRAM of the daily revenue series — DFT power at harmonics
    * k = 1..[[PgramMaxK]] of the observed span, reported as POWER
    * SHARES with the implied period in days: the frequency-domain
    * seasonality detector next to `q_seasonality` (which ASSUMES the
    * weekly period and measures it) — the periodogram FINDS the
    * dominant periods, weekly or not.
    *
    * Scale shape: the day grid is calendar-bounded; the k x t
    * explode is (harmonics x days) rows with immediate map-side
    * aggregation. cos/sin arguments are ratios of exact integers
    * times the pinned 2*pi literal, so both engines call libm on
    * identical doubles; shares are scale-free and 6-dp fenced. */
  def periodogram(spark: SparkSession, dir: String): DataFrame =
    periodogramOf(Tables(spark, dir, "events"))

  private[graft] def periodogramOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = pgramPowersOf(events)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    terms
      .withColumn("tot", sum("power").over(wAll))
      .select(col("k").cast("int").as("k"),
        Det.rnd(col("n").cast("double") / col("k"), 4).as("period_days"),
        Det.rnd(col("power") / col("tot"), 6).as("power_share"))
      .orderBy(desc("power_share"), asc("k"))
      .limit(PgramMaxK)
  }

  /** The DFT power table (k, n, power) behind [[periodogram]] and
    * [[spectralEntropy]] — one shared derivation so the two cannot
    * fork. */
  private[graft] def pgramPowersOf(events: DataFrame): DataFrame = {
    val byDay = events
      .select(to_date(col("ts")).as("d"), Det.cents(col("value")).as("c"))
      .groupBy("d").agg(sum("c").as("c"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"), col("d0"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(col("i").cast("long").as("i"), coalesce(col("c"), lit(0L)).as("x"))
    val mom = dense.agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val centered = dense.crossJoin(broadcast(mom))
      .select(col("i"), col("n"),
        (col("x").cast("double") - col("sx").cast("double") / col("n")).as("xc"))
    val tau = 6.283185307179586 // pinned 2*pi
    centered
      .select(col("i"), col("n"), col("xc"),
        explode(sequence(lit(1), lit(PgramMaxK))).as("k"))
      .groupBy("k")
      .agg(max("n").as("n"),
        sum(col("xc") * cos(lit(tau) * col("k") * col("i") / col("n"))).as("a"),
        sum(col("xc") * sin(lit(tau) * col("k") * col("i") / col("n"))).as("b"))
      .withColumn("power", col("a") * col("a") + col("b") * col("b"))
  }

  /** Shared oracle prefix of [[periodogramSql]] and
    * [[spectralEntropySql]]: the dense daily series → DFT power table
    * `pw(k, n, power)`. */
  private[graft] val pgramPowerCtes: String =
    s"""byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(${Det.centsSql("value")}) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |grid AS (SELECT unnest(range(nd + 1)) AS i, d0 FROM sp),
       |dense AS (
       |  SELECT CAST(grid.i AS BIGINT) AS i, coalesce(byday.c, 0) AS x
       |  FROM grid LEFT JOIN byday ON byday.d = grid.d0 + CAST(grid.i AS INTEGER)),
       |mom AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx FROM dense),
       |terms AS (
       |  SELECT k, max(n) AS n,
       |         sum(xc * cos(6.283185307179586 * k * i / n)) AS a,
       |         sum(xc * sin(6.283185307179586 * k * i / n)) AS b
       |  FROM (SELECT i, n, x - CAST(sx AS DOUBLE) / n AS xc FROM dense, mom)
       |  CROSS JOIN (SELECT unnest(range(1, ${PgramMaxK + 1})) AS k)
       |  GROUP BY k),
       |pw AS (SELECT k, n, a * a + b * b AS power FROM terms)""".stripMargin

  val periodogramSql: String =
    s"""WITH $pgramPowerCtes
       |SELECT CAST(k AS INTEGER) AS k,
       |       ${Det.rndSql("CAST(n AS DOUBLE) / k", 4)} AS period_days,
       |       ${Det.rndSql("power / sum(power) OVER ()", 6)} AS power_share
       |FROM pw
       |ORDER BY power_share DESC, k
       |LIMIT $PgramMaxK""".stripMargin

  /** SPECTRAL ENTROPY of the daily-revenue periodogram — the one
    * scalar that separates "one dominant cycle" (entropy → 0) from
    * "white noise" (entropy → 1): H = −Σ p̂_k ln p̂_k over the
    * [[PgramMaxK]] harmonic power shares, normalized by ln K. The
    * forecastability pre-check a planner runs BEFORE fitting seasonal
    * models — [[ExtensionQueries.seasonality]] and the seasonal index
    * assume a cycle exists; this measures whether one does.
    *
    * Scale shape: identical to [[periodogram]] ([[pgramPowersOf]] is
    * shared verbatim) — calendar-bounded after the daily collapse.
    * The K-term entropy sum is fenced at 6 dp. */
  def spectralEntropy(spark: SparkSession, dir: String): DataFrame =
    spectralEntropyOf(Tables(spark, dir, "events"))

  private[graft] def spectralEntropyOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = pgramPowersOf(events)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // tot = 0 (a constant series: every harmonic's power is exactly 0)
    // would be an ANSI DIVIDE_BY_ZERO — shares go NULL instead, and the
    // 0·ln(0) guard below treats NULL like zero power (ADVICE r11)
    val shares = terms.withColumn("tot", sum("power").over(wAll))
      .select(col("k"), col("n"),
        when(col("tot") > 0, col("power") / col("tot")).as("s"))
    shares
      .withColumn("top", row_number().over(Window.orderBy(desc("s"), asc("k"))))
      .agg(max("n").as("n_days"),
        // 0·ln(0) = 0 convention (ADVICE r11): a harmonic with exactly
        // zero power would yield 0 * -Infinity = NaN and poison the
        // whole entropy — guard mirrored in the SQL twin
        Det.rnd(-sum(when(col("s") > 0, col("s") * log(col("s"))).otherwise(0.0)), 6)
          .as("spectral_entropy"),
        Det.rnd(-sum(when(col("s") > 0, col("s") * log(col("s"))).otherwise(0.0))
          / math.log(PgramMaxK), 6).as("h_norm"),
        max(when(col("top") === 1, col("k"))).cast("int").as("dominant_k"),
        Det.rnd(max(when(col("top") === 1, col("s"))), 6).as("dominant_share"))
  }

  val spectralEntropySql: String =
    s"""WITH $pgramPowerCtes,
       |sh AS (SELECT k, n, CASE WHEN sum(power) OVER () > 0
       |                         THEN power / sum(power) OVER () END AS s FROM pw),
       |rk AS (SELECT *, row_number() OVER (ORDER BY s DESC, k) AS top FROM sh)
       |SELECT CAST(max(n) AS BIGINT) AS n_days,
       |       ${Det.rndSql("-sum(CASE WHEN s > 0 THEN s * ln(s) ELSE 0.0 END)", 6)} AS spectral_entropy,
       |       ${Det.rndSql(s"-sum(CASE WHEN s > 0 THEN s * ln(s) ELSE 0.0 END) / ln($PgramMaxK)", 6)} AS h_norm,
       |       CAST(max(CASE WHEN top = 1 THEN k END) AS INTEGER) AS dominant_k,
       |       ${Det.rndSql("max(CASE WHEN top = 1 THEN s END)", 6)} AS dominant_share
       |FROM rk""".stripMargin

  /** BINARY-SEGMENTATION CHANGEPOINTS of the daily revenue series —
    * the top split minimizes two-segment SSE over the whole span,
    * then each side is split again (3 reported changepoints, rank
    * order): the multi-changepoint extension of the single-shift
    * CUSUM ([[ExtensionQueries.cusumChangepoint]]) — a level shift
    * UP then DOWN needs two points; binary segmentation finds both.
    * SSE gains reduce to prefix-sum algebra — gain(k) = S_L^2/n_L +
    * S_R^2/n_R - S^2/n — computed on exact integer prefix sums with
    * one double division per term, 6-dp-fenced before each argmax
    * (day-index tiebreak), so both engines replay identical picks.
    *
    * Scale shape: calendar-bounded grid; each level is one windowed
    * prefix-sum pass + a TakeOrdered(1) per segment. */
  def binsegChangepoints(spark: SparkSession, dir: String): DataFrame =
    binsegChangepointsOf(Tables(spark, dir, "events"))

  private[graft] def binsegChangepointsOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = events
      .select(to_date(col("ts")).as("d"), Det.cents(col("value")).as("c"))
      .groupBy("d").agg(sum("c").as("c"))
    val span = byDay.agg(min(col("d")).as("d0"),
      datediff(max(col("d")), min(col("d"))).as("nd"))
    val dense = span.select(explode(sequence(lit(0), col("nd"))).as("i"), col("d0"))
      .join(byDay, expr("date_add(d0, i) = d"), "left")
      .select(col("i").cast("long").as("i"), coalesce(col("c"), lit(0L)).as("x"))
      .localCheckpoint() // calendar-bounded; re-read per level
    // best split of [lo, hi): last index of the LEFT segment, gain 6dp
    def bestSplit(seg: DataFrame): DataFrame = {
      val w = Window.orderBy("i")
      seg
        .withColumn("cs", sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("cn", count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("ts", sum("x").over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("tn", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("cn") < col("tn")) // both sides non-empty
        .withColumn("gain", graft.functions.Det.rnd(
          col("cs").cast("double") * col("cs") / col("cn")
            + (col("ts") - col("cs")).cast("double") * (col("ts") - col("cs"))
              / (col("tn") - col("cn"))
            - col("ts").cast("double") * col("ts") / col("tn"), 6))
        .orderBy(desc("gain"), asc("i"))
        .limit(1)
        .select(col("i").as("split_i"), col("gain"))
    }
    val l1 = bestSplit(dense).localCheckpoint() // 1 row
    val left = dense.crossJoin(broadcast(l1)).filter(col("i") <= col("split_i"))
      .select("i", "x")
    val right = dense.crossJoin(broadcast(l1)).filter(col("i") > col("split_i"))
      .select("i", "x")
    val l2a = bestSplit(left)
      .select(lit(2).as("rank"), col("split_i"), col("gain"))
    val l2b = bestSplit(right)
      .select(lit(3).as("rank"), col("split_i"), col("gain"))
    l1.select(lit(1).as("rank"), col("split_i"), col("gain"))
      .unionAll(l2a).unionAll(l2b)
      .select(col("rank"), col("split_i").as("split_day_index"), col("gain"))
      .orderBy("rank")
  }

  val binsegChangepointsSql: String = {
    def splitCte(src: String, name: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT i AS split_i, gain FROM (
         |    SELECT i,
         |           ${Det.rndSql(
               "CAST(cs AS DOUBLE) * cs / cn" +
                 " + CAST(ts - cs AS DOUBLE) * (ts - cs) / (tn - cn)" +
                 " - CAST(ts AS DOUBLE) * ts / tn", 6)} AS gain
         |    FROM (SELECT i,
         |                 CAST(sum(x) OVER (ORDER BY i) AS BIGINT) AS cs,
         |                 CAST(count(*) OVER (ORDER BY i) AS BIGINT) AS cn,
         |                 CAST(sum(x) OVER () AS BIGINT) AS ts,
         |                 CAST(count(*) OVER () AS BIGINT) AS tn
         |          FROM $src)
         |    WHERE cn < tn)
         |  ORDER BY gain DESC, i LIMIT 1)""".stripMargin
    s"""WITH byday AS (
       |  SELECT CAST(ts AS DATE) AS d,
       |         CAST(sum(${Det.centsSql("value")}) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |sp AS (SELECT min(d) AS d0,
       |              date_diff('day', min(d), max(d)) AS nd FROM byday),
       |grid AS (SELECT unnest(range(nd + 1)) AS i, d0 FROM sp),
       |dense AS MATERIALIZED (
       |  SELECT CAST(grid.i AS BIGINT) AS i, coalesce(byday.c, 0) AS x
       |  FROM grid LEFT JOIN byday ON byday.d = grid.d0 + CAST(grid.i AS INTEGER)),
       |${splitCte("dense", "l1")},
       |lseg AS (SELECT dense.i, dense.x FROM dense, l1 WHERE dense.i <= l1.split_i),
       |rseg AS (SELECT dense.i, dense.x FROM dense, l1 WHERE dense.i > l1.split_i),
       |${splitCte("lseg", "l2a")},
       |${splitCte("rseg", "l2b")}
       |SELECT rank, split_i AS split_day_index, gain FROM (
       |  SELECT 1 AS rank, split_i, gain FROM l1
       |  UNION ALL SELECT 2, split_i, gain FROM l2a
       |  UNION ALL SELECT 3, split_i, gain FROM l2b)
       |ORDER BY rank""".stripMargin
  }

  /** pass@k ks and the per-task attempt budget. */
  private[graft] val PassAtKs = Seq(1, 5, 10)
  private[graft] val PassAtBudget = 10

  /** UNBIASED pass@k (Chen et al. 2021, "Evaluating Large Language
    * Models Trained on Code", eq. 1): the eval-harness headline for
    * sampled generation — with n attempts per task and c successes,
    * the naive fraction-of-tasks-with-a-hit-in-the-first-k is biased;
    * the unbiased estimator is 1 − C(n−c,k)/C(n,k). Tasks are users,
    * a task's attempts are its FIRST [[PassAtBudget]] events by
    * (ts, event_id), success = a purchase — the fixed per-task sample
    * budget every harness draws.
    *
    * EXACT: C(n−c,k)/C(n,k) = Π_{i<k}(n−c−i) / Π_{i<k}(n−i) — with
    * n ≤ 10 both products are tiny integers, and when n−c < k the
    * falling product steps through an exact 0 factor, so the c ≥ 1
    * ∧ k = n ⇒ pass@n = 1 boundary is integer-decided. Each task
    * contributes the TRUNCATING-div integer pass_ppm (≤ 1 ppm bias
    * per task, same on both engines — check_pins.py pins the
    * semantics); the mean over tasks is one fenced division over
    * exact BIGINT sums. Tasks with n < k are excluded for that k,
    * per the estimator's domain.
    *
    * Scale shape: one user-partitioned window picks the attempt
    * budget (co-partitioned with the groupBy that follows — ONE
    * shuffle on user_id), then everything is arithmetic on a
    * task-sized relation; the k fan-out is a 3-row bounded union. */
  def passAtK(spark: SparkSession, dir: String): DataFrame =
    passAtKOf(Tables(spark, dir, "events"))

  private[graft] def passAtKOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tasks = events
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("event_type") === "purchase").cast("long").as("hit"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= PassAtBudget)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("hit").as("c"))
    passAtKLanes(tasks)
  }

  /** The estimator finish over a per-task (n, c) relation — shared by
    * the batch operator and the streaming state twin
    * ([[graft.streaming.StreamJobs.passAtKStream]]), so the two read
    * the SAME arithmetic off their respective attempt-budget states. */
  private[graft] def passAtKLanes(tasks: DataFrame): DataFrame = {
    val lanes = PassAtKs.map { k =>
      val num = (0 until k).map(i => s"(n - c - $i)").mkString(" * ")
      val den = (0 until k).map(i => s"(n - $i)").mkString(" * ")
      tasks.filter(col("n") >= k)
        .select(expr(s"1000000L - ($num) * 1000000L div ($den)").as("ppm"))
        .agg(count(lit(1)).as("n_tasks"), sum("ppm").as("s"))
        .select(lit(k).as("k"), col("n_tasks"),
          Det.rnd(col("s").cast("double") / col("n_tasks") / 1e6, 6)
            .as("pass_at_k"))
    }
    lanes.reduce(_ unionByName _).orderBy("k")
  }

  val passAtKSql: String = {
    val lanes = PassAtKs.map { k =>
      val num = (0 until k).map(i => s"(n - c - $i)").mkString(" * ")
      val den = (0 until k).map(i => s"(n - $i)").mkString(" * ")
      s"""  SELECT $k AS k, count(*) AS n_tasks,
         |         ${Det.rndSql(
        s"CAST(sum(1000000 - ($num) * 1000000 // ($den)) AS DOUBLE)" +
          " / count(*) / 1e6", 6)} AS pass_at_k
         |  FROM tasks WHERE n >= $k""".stripMargin
    }
    s"""WITH att AS (
       |  SELECT user_id,
       |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY ts, event_id) AS rn
       |  FROM events),
       |tasks AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(hit) AS BIGINT) AS c
       |  FROM att WHERE rn <= $PassAtBudget GROUP BY 1)
       |${lanes.mkString("\nUNION ALL\n")}
       |ORDER BY k""".stripMargin
  }

  /** INSTRUMENTAL-VARIABLE / LATE Wald estimator (Angrist & Imbens —
    * the encouragement-design readout that completes the causal family
    * next to [[ExtensionQueries.diffInDiff]], propensity and CUPED):
    * instrument Z = the user assignment hash (user_id mod 2, the
    * [[ExtensionQueries.abTest]] split), endogenous treatment T = the
    * user is a heavy signup user (≥ [[IvTreatMin]] signups — a count
    * threshold so T varies on a corpus where every user signs up at
    * least once), outcome Y = the user's purchase cents. Wald LATE
    * = ITT / first-stage = (E[Y|1]−E[Y|0]) / (E[T|1]−E[T|0]) — the
    * common n1·n0 denominators CANCEL, so the estimate is the exact
    * integer ratio (Σy1·n0 − Σy0·n1)/(Σt1·n0 − Σt0·n1) with ONE
    * fenced division. First-stage strength is the audit half: binary
    * T makes var = p(1−p) exact, z_fs one fixed double expression,
    * and the pinned F ≈ z² < 10 rule-of-thumb flags a weak instrument
    * (a zero first stage short-circuits to LATE 0, flagged). On this
    * corpus the instrument is null by construction — the WEAK flag
    * firing is the finding, and the planted-compliance spec proves
    * the estimator recovers a real LATE when one exists.
    *
    * Scale shape: one user-keyed aggregation (a single shuffle), then
    * a 1-row conditional-moment reduce; overflow note: Σy·n crosses
    * int64 around 10⁹ users × 10⁴-cent outcomes — past that the two
    * cross products move to decimal (the abTest bound). */
  /** Treatment threshold for [[ivWald]]: heavy-signup users. */
  private[graft] val IvTreatMin = 14

  def ivWald(spark: SparkSession, dir: String): DataFrame =
    ivWaldOf(Tables(spark, dir, "events"))

  private[graft] def ivWaldOf(events: DataFrame): DataFrame = {
    val users = events.groupBy("user_id").agg(
      (sum((col("event_type") === "signup").cast("long")) >= IvTreatMin)
        .cast("long").as("t"),
      sum(when(col("event_type") === "purchase", Det.cents(col("value")))
        .otherwise(0L)).as("y"))
      .select((col("user_id") % 2).as("z"), col("t"), col("y"))
    def side(z: Int, nm: String) = Seq(
      sum(when(col("z") === z, 1L).otherwise(0L)).as(s"n_$nm"),
      sum(when(col("z") === z, col("t")).otherwise(0L)).as(s"t_$nm"),
      sum(when(col("z") === z, col("y")).otherwise(0L)).as(s"y_$nm"))
    val moments = side(0, "a") ++ side(1, "b")
    val m = users.agg(moments.head, moments.tail: _*)
    m.select(col("n_a"), col("n_b"),
        Det.rnd(expr("CAST(y_b * n_a - y_a * n_b AS DOUBLE)" +
          " / (n_a * n_b) / 100.0"), 6).as("itt_dollars"),
        Det.rnd(expr("CAST(t_b * n_a - t_a * n_b AS DOUBLE)" +
          " / (n_a * n_b)"), 6).as("first_stage"),
        Det.rnd(expr("CASE WHEN t_b * n_a - t_a * n_b = 0 THEN 0.0" +
          " ELSE CAST(y_b * n_a - y_a * n_b AS DOUBLE)" +
          " / (t_b * n_a - t_a * n_b) / 100.0 END"), 6).as("wald_late"),
        Det.rnd(expr(
          "CASE WHEN t_a = 0 AND t_b = 0 THEN 0.0" +
            " WHEN t_a = n_a AND t_b = n_b THEN 0.0 ELSE" +
            " (CAST(t_b AS DOUBLE) / n_b - CAST(t_a AS DOUBLE) / n_a)" +
            " / sqrt(CAST(t_b AS DOUBLE) / n_b * (1.0 - CAST(t_b AS DOUBLE) / n_b) / n_b" +
            "      + CAST(t_a AS DOUBLE) / n_a * (1.0 - CAST(t_a AS DOUBLE) / n_a) / n_a)" +
            " END"), 4).as("z_fs"))
      .withColumn("weak_instrument", col("z_fs") * col("z_fs") < 10.0)
  }

  val ivWaldSql: String = {
    val c = Det.centsSql("value")
    val zfs =
      "CASE WHEN t_a = 0 AND t_b = 0 THEN 0.0" +
        " WHEN t_a = n_a AND t_b = n_b THEN 0.0 ELSE" +
        " (CAST(t_b AS DOUBLE) / n_b - CAST(t_a AS DOUBLE) / n_a)" +
        " / sqrt(CAST(t_b AS DOUBLE) / n_b * (1.0 - CAST(t_b AS DOUBLE) / n_b) / n_b" +
        "      + CAST(t_a AS DOUBLE) / n_a * (1.0 - CAST(t_a AS DOUBLE) / n_a) / n_a)" +
        " END"
    s"""WITH users AS (
       |  SELECT user_id % 2 AS z,
       |         CAST(CASE WHEN sum(CASE WHEN event_type = 'signup'
       |                            THEN 1 ELSE 0 END) >= $IvTreatMin
       |              THEN 1 ELSE 0 END AS BIGINT) AS t,
       |         CAST(sum(CASE WHEN event_type = 'purchase' THEN $c ELSE 0 END)
       |              AS BIGINT) AS y
       |  FROM events GROUP BY user_id),
       |m AS (
       |  SELECT CAST(sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |         CAST(sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |         CAST(sum(CASE WHEN z = 0 THEN t ELSE 0 END) AS BIGINT) AS t_a,
       |         CAST(sum(CASE WHEN z = 1 THEN t ELSE 0 END) AS BIGINT) AS t_b,
       |         CAST(sum(CASE WHEN z = 0 THEN y ELSE 0 END) AS BIGINT) AS y_a,
       |         CAST(sum(CASE WHEN z = 1 THEN y ELSE 0 END) AS BIGINT) AS y_b
       |  FROM users)
       |SELECT n_a, n_b,
       |       ${Det.rndSql(
      "CAST(y_b * n_a - y_a * n_b AS DOUBLE) / (n_a * n_b) / 100.0", 6)}
       |         AS itt_dollars,
       |       ${Det.rndSql(
      "CAST(t_b * n_a - t_a * n_b AS DOUBLE) / (n_a * n_b)", 6)}
       |         AS first_stage,
       |       ${Det.rndSql(
      "CASE WHEN t_b * n_a - t_a * n_b = 0 THEN 0.0" +
        " ELSE CAST(y_b * n_a - y_a * n_b AS DOUBLE)" +
        " / (t_b * n_a - t_a * n_b) / 100.0 END", 6)} AS wald_late,
       |       ${Det.rndSql(zfs, 4)} AS z_fs,
       |       (${Det.rndSql(zfs, 4)}) * (${Det.rndSql(zfs, 4)}) < 10.0
       |         AS weak_instrument
       |FROM m""".stripMargin
  }
}
