package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** One-pass pipeline metrics via `Dataset.observe` — the accounting a
  * production curation job ships WITHOUT paying a second scan: named
  * aggregates (`count`, `sum`, …) ride the existing action's plan at
  * the point where `observe` is attached, and Spark delivers the
  * result to a `QueryExecutionListener` when the action completes.
  * This is the engine-native alternative to the two obvious wrong
  * shapes: re-scanning the input to count it (doubles the IO), or
  * `.cache()` + two actions (materializes the corpus to answer a
  * 5-number question). The filter-funnel queries (`q_filter_funnel`)
  * oracle the same numbers as a standalone result; this utility is
  * how a pipeline gets them for free while writing its real output.
  *
  * Scale: observed aggregates are partial-aggregated inside the
  * existing exchange structure — zero additional shuffles, constant
  * driver memory per metric. Thread-safety: metrics land keyed by
  * observation name in a concurrent map; the listener is installed
  * once per session (idempotent). */
object ObservedMetrics {

  private val captured = new ConcurrentHashMap[String, Row]()
  private val installed = ConcurrentHashMap.newKeySet[String]()

  /** Install the capture listener on this session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (installed.add(System.identityHashCode(spark).toString)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            captured.put(name, row)
          }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
    }

  /** The last observed row for `name`, if any action has delivered it.
    * Listener delivery is asynchronous; [[await]] polls for tests. */
  def get(name: String): Option[Row] = Option(captured.get(name))

  /** Poll up to `timeoutMs` for the metrics of `name` to arrive. */
  def await(name: String, timeoutMs: Long = 10000L): Option[Row] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var r = get(name)
    while (r.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(20L); r = get(name)
    }
    r
  }

  /** Clear a captured observation (test hygiene between runs). */
  def clear(name: String): Unit = captured.remove(name)

  /** Attach a named observation to `df` — a thin alias for
    * `df.observe` kept here so callers find install/get/observe in
    * one place. */
  def observe(df: DataFrame, name: String,
              first: org.apache.spark.sql.Column,
              rest: org.apache.spark.sql.Column*): DataFrame =
    df.observe(name, first, rest: _*)
}
