package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
import org.apache.logging.log4j.core.config.LoggerConfig
import org.apache.logging.log4j.core.filter.AbstractFilter

/** Test-log quarantine for the KNOWN-benign unpartitioned-window WARN
  * (r13 verdict, next #5).
  *
  * The 8 whitelisted bounded-frame queries (PlanGateSpec's
  * `boundedByConstruction` — the single source of truth) legitimately
  * execute `WindowExec` with no partition spec, so every full test run
  * printed eight `WindowExec: No Partition Defined for Window
  * operation!` WARNs — exactly the message a human scans for when
  * hunting REAL offenders, buried under false positives.
  *
  * This filter DENIES that one message (by logger package + message
  * text) in TEST JVMs only (test sources; Verify/Bench logs are
  * untouched) and counts what it suppressed. Detection of new
  * offenders does NOT ride on the log line: PlanGateSpec walks the
  * physical plan tree of all 434 board queries (plus a synthetic-
  * offender canary), so a new unpartitioned window over corpus-sized
  * data fails the gate loudly regardless of what the log shows. The
  * counter keeps the filter itself honest — PlanGateSpec asserts the
  * quarantine actually intercepts when a whitelisted query runs, so a
  * Spark logger rename can't silently turn this into a no-op while the
  * WARNs come back.
  *
  * Every other WARN from the window package (spill, codegen, future
  * messages) passes through NEUTRAL — the quarantine is one message,
  * not a logger mute.
  */
object TestLogQuarantine {

  private val WindowLoggerPackage = "org.apache.spark.sql.execution.window"
  private val BenignMessage = "No Partition Defined"

  val suppressed = new java.util.concurrent.atomic.AtomicLong

  private object BoundedWindowWarnFilter extends AbstractFilter {
    override def filter(event: LogEvent): Filter.Result = {
      val msg = event.getMessage
      if (msg != null && msg.getFormattedMessage != null &&
          msg.getFormattedMessage.contains(BenignMessage)) {
        suppressed.incrementAndGet()
        Filter.Result.DENY
      } else Filter.Result.NEUTRAL
    }
  }

  /** Install into the live log4j2 configuration: a LoggerConfig for the
    * window-exec package (additive, WARN — the test default level)
    * carrying the message filter.
    *
    * A `def` with a presence check, NOT a lazy val: Spark REPLACES the
    * whole log4j2 configuration once during SparkContext creation
    * ("Using Spark's default log4j profile"), dropping any LoggerConfig
    * installed earlier — so a call that races ahead of the first
    * session would cache `true` while the filter is gone (measured:
    * WARNs printing with the filter "installed"). Re-checking on every
    * call makes install order irrelevant; TestSpark re-asserts it right
    * after session creation. */
  def installed: Boolean = synchronized {
    val ctx = LogManager.getContext(
      classOf[org.apache.spark.sql.execution.window.WindowExec].getClassLoader,
      false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val lc = cfg.getLoggerConfig(WindowLoggerPackage) match {
      case exact if exact.getName == WindowLoggerPackage => exact
      case _ =>
        val fresh = new LoggerConfig(WindowLoggerPackage, Level.WARN, true)
        cfg.addLogger(WindowLoggerPackage, fresh)
        fresh
    }
    val present = lc.getFilter match {
      case f if f eq BoundedWindowWarnFilter => true
      case c: org.apache.logging.log4j.core.filter.CompositeFilter =>
        c.getFiltersArray.exists(_ eq BoundedWindowWarnFilter)
      case _ => false
    }
    if (!present) {
      lc.addFilter(BoundedWindowWarnFilter)
      ctx.updateLoggers()
    }
    true
  }
}
