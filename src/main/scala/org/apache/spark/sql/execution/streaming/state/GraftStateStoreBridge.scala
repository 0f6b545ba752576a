package org.apache.spark.sql.execution.streaming.state

/** Package-private-API bridge (same pattern as GraftColumnBridge): lets
  * the bench/verify harness unload every loaded state-store provider
  * between queries. A finished streaming query leaves its providers —
  * state maps and checkpoint-IO thread pools — in a JVM-global registry
  * until the maintenance task unloads them; the harness pins the
  * maintenance interval high (see Bench.scala), so six stateful queries
  * at 10x bench scale accumulated ~8 GB of dead state and OOMed the
  * shared JVM. On a real cluster this is executor-decommission
  * semantics; locally it is one call. */
object GraftStateStoreBridge {
  /** Unload all providers and stop the maintenance task; the next
    * streaming query lazily restarts both. */
  def unloadAll(): Unit = StateStore.stop()
}
