package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's OWN Bloom-filter expression pair —
  * `BloomFilterAggregate` (build, a distributed aggregate producing
  * the serialized filter) and `BloomFilterMightContain` (probe, a
  * codegen'd predicate) — the exact machinery Catalyst injects for
  * runtime join filtering (`InjectRuntimeFilter`), which Spark does
  * not expose in the public FunctionRegistry.
  *
  * Why: [[graft.queries.TextQueries.decontaminationBloom]] needs a
  * Bloom pre-screen in the PROBE side's hot path. A broadcast
  * `df.stat.bloomFilter` + Scala UDF works, but the boxed UDF call
  * per shingle breaks whole-stage codegen exactly where the corpus is
  * widest (every test-side shingle, ~1e10 rows at 100 TB).
  * Registering the native expressions keeps the probe inside the
  * generated plan, and the build side becomes a plain aggregation —
  * partial filters merged at the exchange like any other agg, the
  * filter travelling to probes as a scalar-subquery broadcast result
  * rather than a driver-built broadcast variable.
  *
  * `might_contain` requires its filter argument to be foldable or a
  * scalar subquery (the attribute form is rejected by its type
  * check) — callers pass `(SELECT graft_bloom_agg(...) FROM train)`.
  * Values are inserted and probed as `xxhash64` longs: identical
  * strings hash identically, so the no-false-negative property is
  * preserved end-to-end. */
object BloomProbe {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_agg")))
      reg.createOrReplaceTempFunction("graft_bloom_agg",
        exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    if (!reg.functionExists(FunctionIdentifier("graft_might_contain")))
      reg.createOrReplaceTempFunction("graft_might_contain",
        exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}
