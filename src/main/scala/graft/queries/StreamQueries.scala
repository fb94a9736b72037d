package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.Det

/** Batch twins of the reference's micro-batch stream counters
  * (`Part_B.py`): nested-JSON extraction, running frequency counts with
  * top-k reporting, exact vs HyperLogLog distinct counting, Count-Min
  * Sketch point queries — plus the event-time window extension (the
  * test data has real timestamps; the reference is processing-time
  * only, SURVEY §2.8).
  *
  * The DuckDB oracle is batch-only, so these run over `events.parquet`;
  * the true Structured Streaming variants (file source /
  * `MemoryStream`, state-store running counts, `foreachBatch` reports)
  * live in `graft.streaming.StreamJobs` and are exercised by ScalaTest.
  */
object StreamQueries {

  /** P9+R1 — nested-field extraction from JSON (reference
    * `post['user']['id']` / hashtag explode, `Part_B.py:102,105`):
    * `from_json` with an explicit schema, then aggregate per entity.
    * Schema-on-read stays on the executors — no driver parsing. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables(spark, dir, "events")
      .withColumn("k", from_json(col("props"), schema).getField("k"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n_k"),
        sum("k").as("sum_k"),
        Det.rnd(sum("k").cast("double") / count(col("k")), 4).as("avg_k"),
        max("k").as("max_k"))
      .orderBy("event_type")
  }

  val jsonExtractSql: String =
    s"""SELECT event_type,
       |       count(k) AS n_k, CAST(sum(k) AS BIGINT) AS sum_k,
       |       ${Det.rndSql("CAST(sum(k) AS DOUBLE) / count(k)", 4)} AS avg_k,
       |       max(k) AS max_k
       |FROM (SELECT event_type,
       |             TRY_CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS INTEGER) AS k
       |      FROM events)
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** R1 (array-of-struct shape) — nested entity-array explode
    * (reference `Part_B.py:105`: `post['entities']['hashtags'][i]
    * ['text']`). The fixture's `props` JSON has no array field, so a
    * deterministic entity array is synthesized per event FROM ITS OWN
    * FIELDS as a raw JSON string, then parsed back with `from_json`
    * under an `ArrayType(StructType)` schema and exploded — the
    * hashtag pipeline: schema-on-read of a struct array, struct-field
    * access post-explode, aggregate per entity. All executor-side;
    * the oracle reconstructs the same entities arithmetically (the
    * synthesis is deterministic), so the JSON parse itself is what
    * the hash check exercises. */
  def nestedExplode(spark: SparkSession, dir: String): DataFrame = {
    val entSchema = ArrayType(StructType(Seq(
      StructField("tag", StringType), StructField("w", IntegerType))))
    // built with a codegen'd CASE chain, not transform(sequence(...)):
    // Catalyst HOF lambdas are interpreted per element, and the string
    // build is the hot loop here — the entity count is bounded (≤ 3),
    // so unrolling keeps the whole row inside whole-stage codegen
    val entry = (t: Int) =>
      s"""concat('${if (t == 0) "" else ","}{"tag":"t', CAST((event_id * 7 + $t) % 20 AS STRING), '","w":$t}')"""
    val rawJson = expr(
      s"""concat('[', ${entry(0)},
         |  CASE WHEN event_id % 3 >= 1 THEN ${entry(1)} ELSE '' END,
         |  CASE WHEN event_id % 3 >= 2 THEN ${entry(2)} ELSE '' END, ']')""".stripMargin)
    Tables(spark, dir, "events")
      .withColumn("ents", from_json(rawJson, entSchema))
      .select(col("event_type"), explode(col("ents")).as("e"))
      .select(col("event_type"), col("e.tag").as("tag"), col("e.w").as("w"))
      .groupBy("tag")
      .agg(
        count(lit(1)).as("n"),
        sum("w").as("sum_w"),
        countDistinct("event_type").as("n_types"))
      .orderBy("tag")
  }

  val nestedExplodeSql: String =
    """SELECT 't' || CAST((event_id * 7 + t) % 20 AS VARCHAR) AS tag,
      |       count(*) AS n, CAST(sum(t) AS BIGINT) AS sum_w,
      |       count(DISTINCT event_type) AS n_types
      |FROM (SELECT event_id, event_type, unnest(range(event_id % 3 + 1)) AS t FROM events)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** A13+T2 — running frequency counts with top-k report (reference
    * exact counters + `MAX_COUNTS_LIMIT=5`, `Part_B.py:90-114`):
    * groupBy-count + TakeOrderedAndProject. In streaming mode the
    * state store holds exactly this aggregation (see StreamJobs). */
  def streamTopk(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("event_type"))
      .limit(5)

  val streamTopkSql: String =
    """SELECT event_type, count(*) AS cnt
      |FROM events
      |GROUP BY event_type
      |ORDER BY cnt DESC, event_type ASC
      |LIMIT 5""".stripMargin

  /** A10+A11+D2 — exact distinct vs HyperLogLog (reference set-counter
    * vs HLL class, `Part_B.py:38-65,136-157`). The HLL++ estimate
    * itself is engine-specific, so the oracled contract is the sketch's
    * GUARANTEE: the estimate lands within 10% of exact (rsd=0.02 —
    * 5σ margin). Exact counts are oracled directly. */
  def distinctExactVsHll(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .agg(
        countDistinct("user_id").as("exact_users"),
        countDistinct("event_type").as("exact_types"),
        approx_count_distinct("user_id", 0.02).as("hll_users"))
      .select(
        col("exact_users"),
        col("exact_types"),
        (abs(col("hll_users") - col("exact_users")) <=
          col("exact_users") * 0.1).as("hll_ok"))

  val distinctExactVsHllSql: String =
    """SELECT count(DISTINCT user_id) AS exact_users,
      |       count(DISTINCT event_type) AS exact_types,
      |       true AS hll_ok""".stripMargin + "\nFROM events"

  /** A12 — Count-Min Sketch build + point queries (reference
    * MinCountSketch, `Part_B.py:67-88`): built IN-PLAN by
    * [[graft.sketch.CmsAggregator]] (partial sketches per partition,
    * `mergeInPlace` at the exchange — one pass, no driver-side build
    * job), then point-queried per entity. Oracled on the CMS
    * guarantee: estimate ≥ exact (one-sided) and ≤ exact + ε·N. */
  def sketchCms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    import graft.sketch.CmsAggregator
    val events = Tables(spark, dir, "events")
    val eps = 0.001
    val cmsUdaf = udaf(new CmsAggregator(eps, 0.99, 42), Encoders.STRING)
    val sketch = events.agg(
      cmsUdaf(col("event_type")).as("sketch"),
      count(lit(1)).as("n_total"))
    val est = udf((b: Array[Byte], s: String) => CmsAggregator.estimate(b, s))
    events.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(sketch))
      .withColumn("cms_est", est(col("sketch"), col("event_type")))
      .select(
        col("event_type"),
        col("cnt"),
        (col("cms_est") >= col("cnt") &&
          col("cms_est") <= col("cnt") + ceil(col("n_total") * eps)).as("cms_ok"))
      .orderBy("event_type")
  }

  val sketchCmsSql: String =
    """SELECT event_type, count(*) AS cnt, true AS cms_ok
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** A11 — the reference-semantics HyperLogLog clone
    * ([[graft.sketch.HllAggregator]], raw LogLog estimator of
    * `Part_B.py:38-65`) run through the oracle gate on its accuracy
    * envelope: the raw estimator overshoots by ≈1/α ≈ 1.4×, so the
    * contract is est/exact ∈ [1.1, 1.8] on a column whose cardinality
    * is far above m (event_id: n ≥ 1000 vs m=256 — the raw estimator
    * has no small-range correction, so low-cardinality columns like
    * user_id at sf0.001 sit outside its working regime by design;
    * measured ratios across SFs: 1.37–1.49). */
  def hllCustom(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    import graft.sketch.HllAggregator
    val hll = udaf(new HllAggregator(256), Encoders.STRING)
    Tables(spark, dir, "events")
      .agg(
        countDistinct("event_id").as("exact_ids"),
        hll(col("event_id").cast("string")).as("est"))
      .select(
        col("exact_ids"),
        (col("est") / col("exact_ids")).between(1.1, 1.8).as("hll_raw_ok"))
  }

  val hllCustomSql: String =
    """SELECT count(DISTINCT event_id) AS exact_ids, true AS hll_raw_ok
      |FROM events""".stripMargin

  /** Quantile sketch (the scale path for A4's percentiles): exact
    * `percentile` needs a full sort per group — unrunnable at 100 TB —
    * while `approx_percentile` (Greenwald-Khanna) is a mergeable
    * one-pass sketch with a bounded-error contract. Oracled the same
    * way as the HLL/CMS sketches: exact quantiles are hash-checked
    * directly, the sketch is checked against its GUARANTEE (observed
    * rank error within the configured accuracy, generous 5× margin). */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val acc = 1000 // GK rank error <= 1/acc; contract checked at 50x margin
    val events = Tables(spark, dir, "events")
    val approx = events.agg(
      expr(s"approx_percentile(value, 0.5, $acc)").as("p50_est"),
      expr(s"approx_percentile(value, 0.95, $acc)").as("p95_est"))
    // observed rank of each estimate, computed in-plan (one scan +
    // broadcast of the 1-row sketch result — no driver round-trip)
    val ranks = events.crossJoin(broadcast(approx))
      .agg(
        (sum(when(col("value") <= col("p50_est"), 1).otherwise(0)).cast("double")
          / count(lit(1))).as("r50"),
        (sum(when(col("value") <= col("p95_est"), 1).otherwise(0)).cast("double")
          / count(lit(1))).as("r95"))
    events
      .agg(
        // 4-dp rounding is boundary-safe: 2-dp inputs interpolated at
        // frac .05/.5 land on a 5e-4 grid, never halfway at 1e-4 (same
        // argument as q_summary_stats' p25/50/75)
        round(expr("percentile(value, 0.5)"), 4).as("p50_exact"),
        round(expr("percentile(value, 0.95)"), 4).as("p95_exact"))
      .crossJoin(broadcast(ranks))
      .select(
        col("p50_exact"), col("p95_exact"),
        (abs(col("r50") - 0.5) <= 0.05).as("p50_ok"),
        (abs(col("r95") - 0.95) <= 0.05).as("p95_ok"))
  }

  val quantileSketchSql: String =
    """SELECT round(quantile_cont(value, 0.5), 4) AS p50_exact,
      |       round(quantile_cont(value, 0.95), 4) AS p95_exact,
      |       true AS p50_ok, true AS p95_ok
      |FROM events""".stripMargin

  /** Extension (SURVEY §2.8) — event-time tumbling window aggregation
    * over `events.ts`. Window start emitted as epoch seconds: timestamp
    * columns never cross the oracle boundary (ns-vs-us precision).
    * In streaming mode the same expression runs with a watermark
    * (StreamJobs.windowedCounts). */
  def windowHourly(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"), Det.moneySum(col("value")).as("total_value"))
      .select(
        unix_timestamp(col("w.start")).as("hour_start"),
        col("cnt"),
        col("total_value"))
      .orderBy("hour_start")

  val windowHourlySql: String =
    s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
       |       count(*) AS cnt, ${Det.moneySumSql("value")} AS total_value
       |FROM events
       |GROUP BY 1
       |ORDER BY hour_start""".stripMargin

  /** Sliding event-time windows (1h length, 30min slide): every event
    * lands in exactly two windows. The oracle reproduces Spark's
    * window assignment by exploding each event's two covering window
    * starts (the 30-min floor and the one 30 min earlier). */
  def windowSliding(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("cnt"))
      .orderBy("win_start")

  val windowSlidingSql: String =
    """SELECT win_start, count(*) AS cnt
      |FROM (SELECT unnest([CAST(epoch(time_bucket(INTERVAL '30 minutes', ts)) AS BIGINT),
      |                     CAST(epoch(time_bucket(INTERVAL '30 minutes', ts)) AS BIGINT) - 1800]) AS win_start
      |      FROM events)
      |GROUP BY win_start
      |ORDER BY win_start""".stripMargin

  // ------------------------------------------------- KMV set algebra

  private final val KmvK = 64

  /** Cross-group distinct SET OPERATIONS via the KMV bottom-k sketch
    * ([[graft.sketch.KmvAggregator]]) — the capability the register
    * sketches can't offer: per event-type-pair, estimated distinct
    * user UNION, INTERSECTION and Jaccard from two k-long min-arrays,
    * next to the exact answers for the error audit (the
    * `q_distinct_exact_vs_hll` pattern, extended to set algebra).
    * θ = k-th smallest of the merged mins; below θ both sketches are
    * complete uniform samples of the hashed key space, so
    * union ≈ (|u|−1)·2³²/θ and intersection ≈ (ρ/|u|)·union where
    * ρ counts merged mins present in BOTH sketches. When the merged
    * min-set holds fewer than k values it IS the exact union and the
    * estimates collapse to exact — asserted in ScalaTest.
    *
    * Scale: the sketch aggregation ships k longs per (partition,
    * group) — never the distinct users; the pair algebra runs on a
    * group-cardinality-sized frame of arrays via codegen'd HOFs. The
    * EXACT tier (distinct self-join) is the thing this replaces at
    * 100 TB — here it rides along as the oracle-checked error audit.
    * The in-plan Knuth hash is overflow-safe to user_id < 3.5e9 (the
    * two-step modmul of `TextQueries.splitBucket` is the documented
    * extension past that). */
  def kmvIntersect(spark: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(new graft.sketch.KmvAggregator(KmvK),
      org.apache.spark.sql.Encoders.scalaLong)
    val hashed = Tables(spark, dir, "events")
      .select(col("event_type"),
        expr("(user_id + 1) * 2654435761 % 4294967296").as("h"),
        col("user_id"))
    val sk = hashed.groupBy("event_type").agg(kmv(col("h")).as("mins"))
      .localCheckpoint() // group-cardinality-sized; both join sides
    val du = hashed.select(col("event_type"), col("user_id")).distinct()
      .transform(Tables.scratchPin(_, "kmv-du")) // (type×user) distinct, corpus-linear — durable pin (r11)
    val sizes = du.groupBy("event_type").agg(count(lit(1)).as("nd"))
    val exact = du.as("a")
      .join(du.as("b"), col("a.user_id") === col("b.user_id")
        && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("exact_inter"))
    val pairs = sk.as("x")
      .join(sk.as("y"), col("x.event_type") < col("y.event_type"))
      .select(col("x.event_type").as("ta"), col("y.event_type").as("tb"),
        col("x.mins").as("ma"), col("y.mins").as("mb"))
      .withColumn("u", expr(s"slice(array_sort(array_union(ma, mb)), 1, $KmvK)"))
      .withColumn("usz", size(col("u")).cast("long"))
      .withColumn("theta", expr("element_at(u, CAST(usz AS INT))"))
      .withColumn("rho", expr(
        "CAST(size(filter(u, v -> array_contains(ma, v) AND array_contains(mb, v))) AS BIGINT)"))
      .withColumn("est_union",
        when(col("usz") < KmvK, col("usz").cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) * lit(4294967296.0) / col("theta")))
      .withColumn("est_inter", (col("rho") / col("usz")) * col("est_union"))
    pairs
      .join(broadcast(sizes.select(col("event_type").as("ta"), col("nd").as("na"))), "ta")
      .join(broadcast(sizes.select(col("event_type").as("tb"), col("nd").as("nb"))), "tb")
      .join(exact, Seq("ta", "tb"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .select(col("ta"), col("tb"), col("exact_inter"),
        (col("na") + col("nb") - col("exact_inter")).as("exact_union"),
        col("usz"), col("theta"), col("rho"),
        Det.rnd(col("est_union"), 4).as("est_union"),
        Det.rnd(col("est_inter"), 4).as("est_inter"))
      .orderBy("ta", "tb")
  }

  val kmvIntersectSql: String =
    s"""WITH hashed AS (
       |  SELECT DISTINCT event_type,
       |         (user_id + 1) * 2654435761 % 4294967296 AS h, user_id
       |  FROM events),
       |mins AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT event_type, h FROM hashed))
       |  WHERE rn <= $KmvK),
       |types AS (SELECT DISTINCT event_type FROM events),
       |tp AS (SELECT a.event_type AS ta, b.event_type AS tb
       |       FROM types a JOIN types b ON a.event_type < b.event_type),
       |uni AS (
       |  SELECT ta, tb, h FROM (
       |    SELECT tp.ta, tp.tb, m.h,
       |           row_number() OVER (PARTITION BY tp.ta, tp.tb ORDER BY m.h) AS rn
       |    FROM tp JOIN (SELECT DISTINCT t.ta, t.tb, m0.h
       |                  FROM tp t JOIN mins m0
       |                    ON m0.event_type IN (t.ta, t.tb)) m
       |      ON m.ta = tp.ta AND m.tb = tp.tb)
       |  WHERE rn <= $KmvK),
       |ustat AS (SELECT ta, tb, count(*) AS usz, max(h) AS theta
       |          FROM uni GROUP BY 1, 2),
       |rho AS (SELECT u.ta, u.tb, count(*) AS rho
       |        FROM uni u
       |        JOIN mins x ON x.event_type = u.ta AND x.h = u.h
       |        JOIN mins y ON y.event_type = u.tb AND y.h = u.h
       |        GROUP BY 1, 2),
       |du AS (SELECT DISTINCT event_type, user_id FROM events),
       |sizes AS (SELECT event_type, count(*) AS nd FROM du GROUP BY 1),
       |exact AS (SELECT a.event_type AS ta, b.event_type AS tb,
       |                 count(*) AS exact_inter
       |          FROM du a JOIN du b ON a.user_id = b.user_id
       |            AND a.event_type < b.event_type
       |          GROUP BY 1, 2),
       |est AS (
       |  SELECT us.ta, us.tb, CAST(us.usz AS BIGINT) AS usz,
       |         us.theta, CAST(coalesce(r.rho, 0) AS BIGINT) AS rho,
       |         CASE WHEN us.usz < $KmvK THEN CAST(us.usz AS DOUBLE)
       |              ELSE CAST(${KmvK - 1} AS DOUBLE) * 4294967296 / us.theta
       |         END AS est_union
       |  -- LEFT: a pair whose sketches share no hash still emits, with
       |  -- rho = 0 (the Spark side's filter() count is 0, never absent)
       |  FROM ustat us LEFT JOIN rho r ON r.ta = us.ta AND r.tb = us.tb)
       |SELECT e.ta, e.tb,
       |       CAST(coalesce(x.exact_inter, 0) AS BIGINT) AS exact_inter,
       |       CAST(sa.nd + sb.nd - coalesce(x.exact_inter, 0) AS BIGINT)
       |         AS exact_union,
       |       e.usz, e.theta, e.rho,
       |       ${Det.rndSql("e.est_union", 4)} AS est_union,
       |       ${Det.rndSql("(e.rho / e.usz) * e.est_union", 4)} AS est_inter
       |FROM est e
       |JOIN sizes sa ON sa.event_type = e.ta
       |JOIN sizes sb ON sb.event_type = e.tb
       |LEFT JOIN exact x ON x.ta = e.ta AND x.tb = e.tb
       |ORDER BY e.ta, e.tb""".stripMargin

  private[graft] val MgK = 50

  /** Exact-threshold heavy hitters via the Misra-Gries two-pass pattern
    * ([[graft.sketch.MgAggregator]]): which tokens exceed 1/[[MgK]] of
    * the whole corpus token stream?
    *
    * The scale story is the DETERMINISTIC candidate bound. Pass 1 runs
    * the MG summary — O(k) memory per partition, mergeable partial
    * aggregation, one scan — whose guarantee is that every token with
    * frequency > n/k is IN the ≤ k−1 returned counters (CMS can't do
    * this: its overestimates admit unbounded false positives at the
    * threshold; exact groupBy carries the full vocabulary through the
    * shuffle). Pass 2 recounts ONLY the broadcast candidate keys — the
    * shuffle carries ≤ k−1 distinct keys after map-side combine — and
    * applies the exact integer threshold `cnt·k > n`, killing MG's
    * underestimates. Output is exact and engine-independent (the
    * sketch decides nothing final — it only bounds the second pass),
    * which is precisely why a DuckDB oracle can hash-check a
    * sketch-driven plan. Share is exact-integer ppm (`cnt·10⁶ div n`),
    * no float rounding anywhere. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    import graft.sketch.MgAggregator
    val toks = Tables(spark, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
    val mg = udaf(new MgAggregator(MgK), Encoders.STRING)
    // one pass: bounded-memory candidate summary + exact stream length
    val summary = toks.agg(mg(col("tok")).as("mg"), count(lit(1)).as("n"))
      .localCheckpoint() // 1 row; consumed by candidates AND the threshold join
    val cand = summary.select(explode(map_keys(col("mg"))).as("tok"))
    toks.join(broadcast(cand), Seq("tok")) // pass 2: ≤ k−1 keys survive
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(summary.select(col("n"))))
      .filter(col("cnt") * MgK > col("n"))
      .select(col("tok"), col("cnt"),
        expr("(cnt * CAST(1000000 AS BIGINT)) div n").as("ppm"))
      .orderBy(desc("cnt"), col("tok"))
  }

  val heavyHittersSql: String =
    s"""WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |              FROM documents),
       |t AS (SELECT count(*) AS n FROM toks),
       |c AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1)
       |SELECT tok, CAST(cnt AS BIGINT) AS cnt,
       |       CAST(cnt * 1000000 // n AS BIGINT) AS ppm
       |FROM c CROSS JOIN t
       |WHERE cnt * $MgK > n
       |ORDER BY cnt DESC, tok""".stripMargin

  private[graft] val AmsR = 16 // independent ±1 estimators

  /** The per-(user, estimator) ±1 sign relation shared by the batch
    * sketch and [[graft.streaming.StreamJobs.amsStream]] — one
    * definition so the twins cannot drift. Input needs a `user_id`
    * column; output adds (j, s). */
  private[graft] def amsSigns(users: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    users
      .select(col("user_id"), explode(expr(s"sequence(0, ${AmsR - 1})")).as("j"))
      .withColumn("key", col("user_id") * 131 + col("j"))
      .withColumn("h", expr(
        "pmod(pmod(pmod(key, 4294967296) * 34283, 65536) * 65536" +
          " + pmod(key, 4294967296) * 51831, 4294967296)"))
      .withColumn("s", when(col("h") < 2147483648L, -1L).otherwise(1L))

  /** AMS "TUG-OF-WAR" SKETCH for the second frequency moment F₂ =
    * Σᵤ fᵤ² of the user-activity stream — the join-size/self-join
    * self-similarity estimate (F₂ of the join key IS the self-join
    * size) maintained in O(R) counters: each estimator keeps
    * Sⱼ = Σ_events sⱼ(user), sⱼ ∈ {−1,+1} a 4-universal-style hash
    * sign, and E[Sⱼ²] = F₂. Output compares the R-estimator mean to
    * the exact F₂ — the accuracy audit that justifies running the
    * sketch INSTEAD of the exact per-key aggregation at 100 TB
    * ([[graft.queries.ExtensionQueries.joinSizeEst]] estimates a
    * two-table join from per-key histograms; this is the streaming-
    * mergeable one-pass form for the self-join case).
    *
    * Scale shape: the sketch side never aggregates per user — each
    * event updates R running sums locally (map-side partial sums per
    * estimator; the exchange carries R rows per task, NOT per key),
    * exactly the property that makes the sketch mergeable across
    * stream batches and executors. Signs come from the overflow-safe
    * modmul ring on key·131+j (injective: j < 131), so both engines
    * replay identical draws; every sum is an exact integer, and the
    * single relative-error division is fenced at 6 dp. */
  def amsF2(spark: SparkSession, dir: String): DataFrame =
    amsF2Of(Tables(spark, dir, "events"))

  private[graft] def amsF2Of(events: DataFrame): DataFrame = {
    val exact = events.groupBy("user_id").agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f")).as("f2_exact"))
    val est = amsSigns(events.select("user_id"))
      .groupBy("j").agg(sum("s").as("sj"))
      .agg(sum(col("sj") * col("sj")).as("ssq"), count(lit(1)).as("r"))
    exact.crossJoin(est)
      .select(col("f2_exact"),
        Det.rnd(col("ssq").cast("double") / col("r"), 4).as("f2_est"),
        col("r").as("n_estimators"),
        Det.rnd((col("ssq").cast("double") / col("r") - col("f2_exact"))
          / col("f2_exact") * 100, 6).as("rel_err_pct"))
  }

  val amsF2Sql: String = {
    s"""WITH exact AS (
       |  SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact
       |  FROM (SELECT user_id, count(*) AS f FROM events GROUP BY 1)),
       |d AS (SELECT user_id * 131 + j.j AS key, j.j AS j
       |      FROM events CROSS JOIN (SELECT unnest(range($AmsR)) AS j) j),
       |sj AS (SELECT j,
       |              CAST(sum(CASE WHEN (((key % 4294967296) * 34283 % 65536) * 65536
       |                                  + (key % 4294967296) * 51831) % 4294967296
       |                                 < 2147483648
       |                            THEN -1 ELSE 1 END) AS BIGINT) AS sj
       |       FROM d GROUP BY 1),
       |est AS (SELECT CAST(sum(sj * sj) AS BIGINT) AS ssq, count(*) AS r FROM sj)
       |SELECT f2_exact,
       |       ${graft.functions.Det.rndSql("CAST(ssq AS DOUBLE) / r", 4)} AS f2_est,
       |       r AS n_estimators,
       |       ${graft.functions.Det.rndSql(
            "(CAST(ssq AS DOUBLE) / r - f2_exact) / f2_exact * 100", 6)} AS rel_err_pct
       |FROM exact CROSS JOIN est""".stripMargin
  }

  /** HDR-HISTOGRAM QUANTILE SKETCH (the HdrHistogram/DDSketch family):
    * relative-error-bounded quantiles of event value from a LOG₂
    * bucket histogram with 16 linear sub-buckets per octave — the
    * mergeable alternative to [[quantileSketch]]'s rank-error
    * `approx_percentile`: here the guarantee is RELATIVE value error
    * ≤ ~3% per estimate regardless of the value range, and the sketch
    * is a plain additive histogram.
    *
    * Scale shape: the corpus collapses to ≤ 64·16 bucket counts in
    * one partial-aggregated pass (map-side combine — the exchange
    * carries bucket-cardinality rows per task, constant in corpus
    * size, same as the CMS/HLL/AMS aggregators); ranks, cumulative
    * sums and bucket→bound algebra run in bucket space. Bucketing is
    * EXACT INTEGER arithmetic — octave e = length(bin(cents))−1,
    * sub-bucket = 16·c div 2ᵉ − 16 — so no engine's log/float can
    * shift a value across a bucket edge (a ulp-divergent `ceil(log
    * x/log γ)` is exactly how a naive DDSketch port loses cross-
    * engine determinism). Rank targets are per-mille integers:
    * r = ⌈n·q⌉ = (n·qm + 999) div 1000. */
  def hdrQuantiles(spark: SparkSession, dir: String): DataFrame =
    hdrQuantilesOf(Tables(spark, dir, "events"))

  /** The row→bucket mapping of the HDR sketch — shared by the batch
    * histogram and the streaming twin
    * ([[graft.streaming.StreamJobs.hdrStream]]) so the two cannot
    * drift: bucket = 16·octave + sub, all exact integer ops. */
  private[graft] def hdrBuckets(values: DataFrame): DataFrame =
    values.select(Det.cents(col("value")).as("c"))
      .select(expr("CAST(length(bin(c)) - 1 AS BIGINT)").as("e"), col("c"))
      .select((col("e") * 16 +
        expr("(c * 16) div shiftleft(CAST(1 AS BIGINT), e) - 16")).as("bucket"))

  private[graft] def hdrQuantilesOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = events.sparkSession; import s.implicits._
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // bucket-cardinality relation (≤ 64 octaves × 16 sub-buckets)
    val hist = hdrBuckets(events)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wAll))
    val targets = Seq(500L, 900L, 990L, 999L).toDF("qm")
    targets.join(hist,
        col("cum") >= expr("(n * qm + 999) div 1000"), "inner")
      .groupBy("qm")
      .agg(max("n").as("n"), min("bucket").as("bucket"))
      .select(col("qm"), col("n"), col("bucket"),
        Det.rnd(expr("(16 + bucket % 16) * shiftleft(CAST(1 AS BIGINT), " +
          "CAST(bucket div 16 AS INT)) / 1600.0"), 6).as("lo"),
        Det.rnd(expr("(17 + bucket % 16) * shiftleft(CAST(1 AS BIGINT), " +
          "CAST(bucket div 16 AS INT)) / 1600.0"), 6).as("hi"),
        Det.rnd(expr("(33 + 2 * (bucket % 16)) * shiftleft(CAST(1 AS BIGINT), " +
          "CAST(bucket div 16 AS INT)) / 3200.0"), 6).as("est"),
        Det.rnd(expr("1.0 / (33 + 2 * (bucket % 16))"), 6).as("rel_err_bound"))
      .orderBy("qm")
  }

  val hdrQuantilesSql: String = {
    import graft.functions.Det
    s"""WITH h AS (
       |  SELECT bucket, count(*) AS cnt
       |  FROM (SELECT (length(bin(c)) - 1) * 16
       |               + (c * 16) // (CAST(1 AS BIGINT) << (length(bin(c)) - 1))
       |               - 16 AS bucket
       |        FROM (SELECT ${Det.centsSql("value")} AS c FROM events))
       |  GROUP BY 1),
       |hc AS (
       |  SELECT bucket, cnt,
       |         sum(cnt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
       |                        AND CURRENT ROW) AS cum,
       |         sum(cnt) OVER () AS n
       |  FROM h),
       |t AS (SELECT CAST(qm AS BIGINT) AS qm
       |      FROM (VALUES (500), (900), (990), (999)) v(qm)),
       |pick AS (
       |  SELECT qm, CAST(max(n) AS BIGINT) AS n, min(bucket) AS bucket
       |  FROM t JOIN hc ON cum >= (n * qm + 999) // 1000
       |  GROUP BY qm)
       |SELECT qm, n, bucket,
       |       ${Det.rndSql("(16 + bucket % 16) * (CAST(1 AS BIGINT) << (bucket // 16)) / 1600.0", 6)} AS lo,
       |       ${Det.rndSql("(17 + bucket % 16) * (CAST(1 AS BIGINT) << (bucket // 16)) / 1600.0", 6)} AS hi,
       |       ${Det.rndSql("(33 + 2 * (bucket % 16)) * (CAST(1 AS BIGINT) << (bucket // 16)) / 3200.0", 6)} AS est,
       |       ${Det.rndSql("1.0 / (33 + 2 * (bucket % 16))", 6)} AS rel_err_bound
       |FROM pick
       |ORDER BY qm""".stripMargin
  }
}
