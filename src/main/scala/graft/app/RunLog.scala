package graft.app

import java.io.{File, FileWriter, PrintWriter}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Level-split run-log files — the reference's operational artifact
  * (settings.py:34-71 writes logs/info|warning|error|critical.log with
  * per-level handlers) re-expressed for a distributed engine.
  *
  * The crucial difference from the reference: it logs per-DOCUMENT.
  * A driver-side logger fed one line per record is a serialization
  * point a 100 TB job cannot have, so here per-record failures stay
  * where the operators put them — quarantine/error COLUMNS riding the
  * distributed frames — and the run log records bounded driver-side
  * facts only: stage summaries, per-error-kind counts (capped), model
  * artifacts, timings. Ops keep the tail-able files they had; the hot
  * path never blocks on a log handler.
  *
  * Line shape mirrors the reference (`asctime - name - LEVEL -
  * message`), and each file captures its level AND everything above it
  * (info.log sees all, error.log only ERROR+CRITICAL) — the same
  * cascade `setup_logging` builds, so downstream grep/alert tooling
  * ports unchanged.
  */
final class RunLog private[app] (dir: File, name: String) extends AutoCloseable {
  import RunLog._

  private val writers: Seq[(Int, PrintWriter)] = {
    dir.mkdirs()
    Files.map { case (level, file) =>
      level -> new PrintWriter(new FileWriter(new File(dir, file), true))
    }
  }

  private def write(level: Int, levelName: String, msg: String): Unit = {
    val line = s"${TsFormat.format(Instant.now())} - $name - $levelName - $msg"
    synchronized {
      writers.foreach { case (threshold, w) =>
        if (level >= threshold) { w.println(line); w.flush() }
      }
    }
  }

  def info(msg: String): Unit = write(20, "INFO", msg)
  def warning(msg: String): Unit = write(30, "WARNING", msg)
  def error(msg: String): Unit = write(40, "ERROR", msg)
  def critical(msg: String): Unit = write(50, "CRITICAL", msg)

  override def close(): Unit = synchronized { writers.foreach(_._2.close()) }
}

object RunLog {

  /** File per threshold; a record lands in every file whose threshold
    * it meets (the reference's handler cascade).
    */
  val Files: Seq[(Int, String)] = Seq(
    20 -> "info.log", 30 -> "warning.log", 40 -> "error.log",
    50 -> "critical.log")

  private val TsFormat =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss,SSS").withZone(ZoneOffset.UTC)

  /** Env var naming the log directory (the reference's LOG_PATH). */
  val LogPathEnv = "SPARK_GRAFT_LOG_PATH"

  /** System-property override, checked first (tests and embedded
    * callers can't set environment variables).
    */
  val LogPathProp = "graft.log.path"

  def open(dir: String, name: String): RunLog = new RunLog(new File(dir), name)

  /** A logger when the run configured one (property, then env var),
    * None otherwise — stages log opportunistically and stay silent,
    * zero-cost, when ops didn't ask for files.
    */
  def fromContext(name: String): Option[RunLog] =
    sys.props.get(LogPathProp).orElse(sys.env.get(LogPathEnv))
      .map(open(_, name))

  /** Run `body` with a context logger if configured; always closes. */
  def withLog(name: String)(body: Option[RunLog] => Unit): Unit = {
    val log = fromContext(name)
    try body(log) finally log.foreach(_.close())
  }

  /** Cap on distinct error kinds logged per stage: the log is a
    * driver-side artifact and must stay bounded even if a bug makes
    * every row's error message unique.
    */
  val MaxErrorKinds = 50

  /** Log a stage's quarantined rows as bounded per-kind ERROR lines:
    * group by the error column (distinct-kind-sized aggregate, top
    * [[MaxErrorKinds]] by count) instead of a line per row. Returns the
    * total quarantined count.
    */
  def logQuarantine(log: Option[RunLog], df: DataFrame, errorCol: String,
      stage: String): Long = {
    val rows = df.filter(col(errorCol).isNotNull)
      .groupBy(col(errorCol).cast("string").as("err"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("err"))
      .limit(MaxErrorKinds + 1)
      .collect()
    val shown = rows.take(MaxErrorKinds)
    log.foreach { l =>
      shown.foreach(r => l.error(s"$stage: ${r.getLong(1)} row(s): ${r.getString(0)}"))
      if (rows.length > MaxErrorKinds)
        l.error(s"$stage: further error kinds truncated (cap $MaxErrorKinds)")
    }
    if (rows.length > MaxErrorKinds) df.filter(col(errorCol).isNotNull).count()
    else shown.map(_.getLong(1)).sum
  }
}
