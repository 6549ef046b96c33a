package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Accessor for the engine's per-session UUID (`private[sql]` on the
  * classic session, hence this shim in the sql package — the same access
  * route the expression registrations here already use). Graft's
  * session-scoped caches key on it (ADVICE r13): unlike
  * `System.identityHashCode`, a UUID is never reused after the owning
  * session is GC'd, so a fresh session can never inherit a dead session's
  * checkpointed state from a cache.
  */
object SessionUid {
  def of(s: SparkSession): String = s match {
    case cs: org.apache.spark.sql.classic.SparkSession => cs.sessionUUID
    case other => "idhash-" + System.identityHashCode(other)
  }
}
