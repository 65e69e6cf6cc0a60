package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Idempotent per-session function registration (r5, VERDICT #7).
  *
  * Operators register the SQL functions they use at build time, and a
  * gate query is built many times per session (bench passes, verify,
  * repeated API calls) — an unconditional
  * `createOrReplaceTempFunction` re-registers on every build and logs a
  * "function replaced" warning each time. Registering only when the
  * name is absent makes the call a cheap no-op after the first build.
  */
private[graft] object Registration {

  /** Run `register` only if `name` is not yet in the session's
    * function registry.
    */
  def once(spark: SparkSession, name: String)(register: => Unit): Unit =
    if (!spark.sessionState.functionRegistry
          .functionExists(FunctionIdentifier(name))) register
}
