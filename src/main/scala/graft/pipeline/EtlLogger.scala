package graft.pipeline

import java.util.logging.{ConsoleHandler, FileHandler, Level, Logger, SimpleFormatter}

/** Job-level logging surface ≙ reference `ETLLogger`
  * (`services/logger.py:12-42`): a named logger with console + optional
  * file handlers and a level API. Spark's own operators keep using the
  * Spark `Logging` trait; this is the ORCHESTRATION logger a job hands to
  * its stages, mirroring the reference's `etl_logger.get_logger()` handoff
  * (`lambda_function.py:86-88`).
  */
final class EtlLogger(
    name: String = "graft.etl",
    logFile: Option[String] = None,
    level: Level = Level.INFO) {

  private val logger: Logger = {
    val lg = Logger.getLogger(name)
    lg.setUseParentHandlers(false)
    // idempotent re-construction: a second EtlLogger with the same name
    // must not stack duplicate handlers (the reference guards the same way
    // with logger.hasHandlers)
    lg.getHandlers.foreach { h => lg.removeHandler(h); h.close() }
    val console = new ConsoleHandler()
    console.setFormatter(new SimpleFormatter())
    console.setLevel(level)
    lg.addHandler(console)
    logFile.foreach { path =>
      val fh = new FileHandler(path, true)
      fh.setFormatter(new SimpleFormatter())
      fh.setLevel(level)
      lg.addHandler(fh)
    }
    lg.setLevel(level)
    lg
  }

  def getLogger: Logger = logger

  def setLevel(l: Level): Unit = {
    logger.setLevel(l)
    logger.getHandlers.foreach(_.setLevel(l))
  }

  def info(msg: String): Unit = logger.info(msg)
  def warning(msg: String): Unit = logger.warning(msg)
  def error(msg: String): Unit = logger.severe(msg)
  def debug(msg: String): Unit = logger.fine(msg)

  def close(): Unit = logger.getHandlers.foreach { h =>
    logger.removeHandler(h); h.close()
  }
}
