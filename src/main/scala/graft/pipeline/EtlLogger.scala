package graft.pipeline

import java.util.logging.{ConsoleHandler, FileHandler, Level, Logger, SimpleFormatter}

/** Job-level logging surface ≙ reference `ETLLogger`
  * (`services/logger.py:12-42`): a named logger with console + optional
  * file handlers and a level API. Spark's own operators keep using the
  * Spark `Logging` trait; this is the ORCHESTRATION logger a job hands to
  * its stages, mirroring the reference's `etl_logger.get_logger()` handoff
  * (`lambda_function.py:86-88`).
  *
  * JUL loggers are process-global, so reconstruction with the same name is
  * made idempotent by removing only handlers TAGGED as EtlLogger-installed
  * — a handler some other component attached to the same logger is never
  * touched. Corollary (inherent to JUL's global registry): two EtlLogger
  * instances sharing a name must not COEXIST — the newer one supersedes
  * the older one's handlers; give concurrent jobs per-run names.
  */
final class EtlLogger(
    name: String = "graft.etl",
    logFile: Option[String] = None,
    level: Level = Level.INFO) {
  import EtlLogger.{TaggedConsoleHandler, TaggedFileHandler}

  private val ownHandlers = scala.collection.mutable.ArrayBuffer.empty[java.util.logging.Handler]

  private val logger: Logger = {
    val lg = Logger.getLogger(name)
    lg.setUseParentHandlers(false)
    lg.getHandlers.foreach {
      case h @ (_: TaggedConsoleHandler | _: TaggedFileHandler) =>
        lg.removeHandler(h); h.close()
      case _ => // foreign handler — not ours to remove
    }
    val console = new TaggedConsoleHandler()
    console.setFormatter(new SimpleFormatter())
    console.setLevel(level)
    lg.addHandler(console)
    ownHandlers += console
    logFile.foreach { path =>
      val fh = new TaggedFileHandler(path)
      fh.setFormatter(new SimpleFormatter())
      fh.setLevel(level)
      lg.addHandler(fh)
      ownHandlers += fh
    }
    lg.setLevel(level)
    lg
  }

  def getLogger: Logger = logger

  def setLevel(l: Level): Unit = {
    logger.setLevel(l)
    ownHandlers.foreach(_.setLevel(l))
  }

  def info(msg: String): Unit = logger.info(msg)
  def warning(msg: String): Unit = logger.warning(msg)
  def error(msg: String): Unit = logger.severe(msg)
  def debug(msg: String): Unit = logger.fine(msg)

  def close(): Unit = {
    ownHandlers.foreach { h => logger.removeHandler(h); h.close() }
    ownHandlers.clear()
  }
}

object EtlLogger {
  /** Marker subclasses: lets a new instance recognize (and supersede)
    * handlers a previous EtlLogger installed without touching foreign ones.
    */
  private final class TaggedConsoleHandler extends ConsoleHandler
  private final class TaggedFileHandler(path: String) extends FileHandler(path, true)
}
