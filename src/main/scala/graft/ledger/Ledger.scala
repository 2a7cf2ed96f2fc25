package graft.ledger

import java.time.LocalDateTime

import graft.store.TableStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Run ledger — the analog of `bronze.tbl_dw_copy_logs`
 * (`TableCopyService.cs:57-87,206-228`; `TableUpdateService.cs:56-72,194-214`).
 *
 * The reference INSERTs an "In Progress" row, then UPDATEs Status/EndTime/
 * RecordsCopied/ErrorMessage on a fresh connection so the audit trail
 * survives the data transaction's rollback. Parquet files don't update in
 * place, so the ledger is **append-only with latest-record-wins**: starting
 * a run appends an `In Progress` record, finishing appends a second record
 * with the same `runId` and a higher `seq`; [[latest]] resolves current
 * status. Appends are tiny (one row) and never rewrite history — at any
 * scale the ledger write cost is constant.
 */
final case class RunRecord(
    runId: String,
    seq: Int,
    tableName: String,
    process: String, // "Fact Copy" | "Dim Copy" | "Table Update" | "Sproc"  (TableCopyService.cs:71,78)
    status: String, // "In Progress" | "Completed" | "Failed"              (TableCopyService.cs:20,172,180)
    startTime: java.sql.Timestamp,
    endTime: Option[java.sql.Timestamp],
    startDateParam: Option[String],
    endDateParam: Option[String],
    dateColumn: Option[String],
    updateDateColumn: Option[String],
    primaryKey: Option[String],
    recordsCopied: Option[Long],
    errorMessage: Option[String])

final class Ledger(spark: SparkSession, store: TableStore, table: String = "tbl_dw_copy_logs",
    clock: () => LocalDateTime = () => LocalDateTime.now()) {
  import spark.implicits._

  private def ts(t: LocalDateTime): java.sql.Timestamp = java.sql.Timestamp.valueOf(t)

  /** Ledger appends are serialized: the parallel-dims phase (O3) calls
    * start/finish from multiple threads, and concurrent Spark write jobs into
    * the same directory race on the FileOutputCommitter `_temporary` staging
    * dir. The rows are single-record writes, so the lock costs nothing. */
  private def appendLocked(df: org.apache.spark.sql.DataFrame): Unit =
    this.synchronized { store.append(table, df) }

  /** Append the "In Progress" record; returns the runId used by [[finish]]. */
  def start(tableName: String, process: String, window: Option[(String, String)],
      dateColumn: Option[String] = None, updateDateColumn: Option[String] = None,
      primaryKey: Option[String] = None): RunRecord = {
    val rec = RunRecord(
      runId = java.util.UUID.randomUUID.toString, seq = 0,
      tableName = tableName, process = process, status = "In Progress",
      startTime = ts(clock()), endTime = None,
      startDateParam = window.map(_._1), endDateParam = window.map(_._2),
      dateColumn = dateColumn, updateDateColumn = updateDateColumn, primaryKey = primaryKey,
      recordsCopied = None, errorMessage = None)
    appendLocked(Seq(rec).toDF())
    rec
  }

  /** Append the completion record (Completed/Failed). Mirrors the final
    * UPDATE on a new connection (`TableCopyService.cs:206-228`). */
  def finish(run: RunRecord, status: String, recordsCopied: Option[Long],
      errorMessage: Option[String] = None): Unit =
    appendLocked(Seq(run.copy(
      seq = run.seq + 1, status = status, endTime = Some(ts(clock())),
      recordsCopied = recordsCopied, errorMessage = errorMessage)).toDF())

  /** All records, raw (audit history). */
  def history: DataFrame = store.read(table)

  /** Latest record per runId — the reference's post-UPDATE row view. */
  def latest: DataFrame = {
    val w = Window.partitionBy("runId").orderBy(col("seq").desc)
    history.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
