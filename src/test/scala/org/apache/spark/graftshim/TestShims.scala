package org.apache.spark

/** Test-only bridge to `private[spark]` scheduler internals (the
  * graftshim pattern, test classpath only). */
package object graftshim {

  /** Block until the async listener bus has delivered every queued
    * event — the deterministic replacement for sleep-before-assert in
    * listener-counting specs (a fixed sleep is flaky on a loaded host:
    * late-arriving job-start events land after the assertion). The
    * caller's jobs have already COMPLETED (its action returned), so
    * draining the bus is sufficient, not racy. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(60000L)
}
