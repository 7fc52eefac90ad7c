package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Detects silent whole-stage-codegen fallback across a run.
  *
  * Why this exists: r14's root-cause find was a 37 KB generated Filter
  * that blew janino's 64 KB method limit — Spark logged ONE warning
  * and quietly ran the Louvain loop INTERPRETED at every scale factor
  * for multiple rounds before an 8 g sweep happened to surface it
  * (SOAK_r14.md §3). Codegen fallback is a performance cliff that no
  * correctness gate catches, so the bench/verify harnesses now count
  * the fallback warnings and fail the qualified run if any fire
  * (r14 verdict item 2).
  *
  * Mechanism: a log4j2 appender on the root logger config counting
  * WARN+ events whose message marks a codegen bailout —
  * `WholeStageCodegenExec`'s "Whole-stage codegen disabled for plan"
  * (janino compile failure) / "whole-stage codegen was disabled for
  * this plan" (bytecode over spark.sql.codegen.hugeMethodLimit), and
  * `CodeGenerator`'s "Failed to compile the generated Java code".
  * Root-level attachment sees every logger by additivity; Bench and
  * Verify run at log level WARN, so the events flow regardless of the
  * default console config. */
object CodegenSentinel {
  private val count = new AtomicLong(0)
  private val samples = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile private var installed = false

  private val markers = Seq(
    "whole-stage codegen disabled",
    "whole-stage codegen was disabled",
    "failed to compile the generated")

  private final class Counter extends AbstractAppender(
      "graft-codegen-sentinel", null, null, false, Property.EMPTY_ARRAY) {
    override def append(event: LogEvent): Unit = {
      val msg = event.getMessage.getFormattedMessage
      val lower = msg.toLowerCase
      if (markers.exists(lower.contains)) {
        count.incrementAndGet()
        if (samples.size() < 5) samples.add(msg.linesIterator.take(1).mkString.take(300))
      }
    }
  }

  /** Idempotent: attach the counting appender. Two hooks because Spark
    * 4.1 logs the two bailout paths at DIFFERENT levels (verified
    * against the shipped bytecode): janino compile failure →
    * logWarning in WholeStageCodegenExec's compile catch, but the
    * hugeMethodLimit bailout ("Found too long generated codes … and
    * the whole-stage codegen was disabled for this plan") → logInfo —
    * invisible at the harness's WARN root level unless the WSCG logger
    * itself is opened to INFO. */
  def install(): Unit = synchronized {
    if (!installed) {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val cfg = ctx.getConfiguration
      val appender = new Counter
      appender.start()
      cfg.addAppender(appender)
      cfg.getLoggerConfig(LogManager.ROOT_LOGGER_NAME)
        .addAppender(appender, Level.WARN, null)
      val wscg = "org.apache.spark.sql.execution.WholeStageCodegenExec"
      val lc = new org.apache.logging.log4j.core.config.LoggerConfig(
        wscg, Level.INFO, true)
      lc.addAppender(appender, Level.INFO, null)
      cfg.addLogger(wscg, lc)
      ctx.updateLoggers()
      installed = true
    }
  }

  def fallbackCount: Long = count.get()
  def reset(): Unit = { count.set(0); samples.clear() }

  /** Nonzero fallbacks ⇒ print the evidence and return false. */
  def reportClean(tag: String): Boolean = {
    val n = count.get()
    if (n > 0) {
      System.err.println(s"[$tag] CODEGEN FALLBACK: $n warning(s) — " +
        "some plan ran interpreted. First occurrences:")
      samples.forEach(s => System.err.println(s"[$tag]   $s"))
    }
    n == 0
  }
}
