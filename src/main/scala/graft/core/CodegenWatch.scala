package graft.core

import java.util.concurrent.atomic.AtomicLong

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender

/** Counts the two log signatures of Spark silently leaving compiled code:
  * `CodeGenerator` ERRORs (janino failed — most often "Code grows beyond
  * 64 KB" from an expression unrolled too wide) and `WholeStageCodegenExec`
  * WARNs ("Whole-stage codegen disabled for plan"). Both fall back to
  * interpreted eval and change NO results — which is exactly why they
  * need a counter: a hot path can lose codegen and stay green while
  * running many times slower (round 6 measured 4.6x on the PQ encode;
  * BASELINE.md "64 KB" note). `graft.Verify` and `graft.Bench` install
  * the watch and report `codegen_fallbacks` in their artifacts, so every
  * round's gate records that the whole registry stayed compiled — and a
  * future giant-literal expression shows up as a nonzero count in the
  * artifact diff, not as an unexplained bench regression two rounds
  * later. */
object CodegenWatch {

  private val count = new AtomicLong(0L)
  @volatile private var installed = false

  /** Idempotently hook the root log4j2 logger. Call AFTER SparkSession
    * creation (Spark initializes the logging context). */
  def install(): Unit = synchronized {
    if (installed) return
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val appender = new AbstractAppender(
        "graft-codegen-watch", null, null, true, Array.empty) {
      override def append(e: LogEvent): Unit = {
        val name = e.getLoggerName
        val lvl = e.getLevel
        if ((name.endsWith(".CodeGenerator") && lvl.isMoreSpecificThan(Level.ERROR)) ||
            (name.endsWith(".WholeStageCodegenExec") && lvl.isMoreSpecificThan(Level.WARN)))
          count.incrementAndGet()
      }
    }
    appender.start()
    val conf = ctx.getConfiguration
    // hook the two signal loggers DIRECTLY (not just root): a root level
    // of ERROR would filter the WholeStageCodegenExec WARN before any
    // appender sees it
    for (name <- Seq(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        "org.apache.spark.sql.execution.WholeStageCodegenExec")) {
      val existing = conf.getLoggerConfig(name)
      val lc =
        if (existing.getName == name) existing
        else {
          val fresh = new org.apache.logging.log4j.core.config.LoggerConfig(
            name, Level.WARN, true)
          conf.addLogger(name, fresh)
          fresh
        }
      if (lc.getLevel.isMoreSpecificThan(Level.WARN) && lc.getLevel != Level.WARN)
        lc.setLevel(Level.WARN)
      lc.addAppender(appender, Level.WARN, null)
    }
    ctx.updateLoggers()
    installed = true
  }

  /** Fallback events observed since install. */
  def fallbacks(): Long = count.get()
}
