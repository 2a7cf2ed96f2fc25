package graft.ledger

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/**
 * Per-table run log files (S10) — the reference's Serilog layout
 * `logs/yyyy-MM/<table>/<table>-<timestamp>.log` (`Program.cs:18-30`,
 * `TableCopyService.cs:27-43`, `TableUpdateService.cs:25-42`): one file per
 * table per run, timestamped level-tagged lines.
 *
 * Cluster note: this records DRIVER-side orchestration events (phase
 * start/end, row counts, errors) — executor logs belong to the cluster's
 * own log infrastructure, and the ledger (S8) remains the queryable record;
 * these files are the human-greppable trail the reference's operators rely
 * on.
 */
final class RunLogs(root: String, clock: () => LocalDateTime = () => LocalDateTime.now()) {

  private val month = DateTimeFormatter.ofPattern("yyyy-MM")
  private val stamp = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")

  /** Open (or re-open for append) the per-table log file of this run. */
  def forTable(table: String): TableLog = {
    val now = clock()
    val dir = Paths.get(root, now.format(month), table)
    Files.createDirectories(dir)
    new TableLog(dir.resolve(s"$table-${now.format(stamp)}.log"), clock)
  }
}

/** Appender for one table's log file; thread-safe (dims copy in parallel). */
final class TableLog(val path: Path, clock: () => LocalDateTime) {
  private val line = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")

  private def write(level: String, msg: String): Unit = synchronized {
    Files.writeString(path, s"[${clock().format(line)} $level] $msg\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def info(msg: String): Unit = write("INF", msg)
  def error(msg: String): Unit = write("ERR", msg)
}
