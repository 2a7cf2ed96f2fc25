package graft.store

/**
 * Derby SQL-procedure bodies for the `o22_jdbc_sproc` gate and `JdbcSpec` —
 * the stand-in for the reference deployment's real SQL Server stored
 * procedures (`StoreProcRunService.cs:16-31` runs `EXEC name
 * @StartDateParam, @EndDateParam` on the target connection). Derby's
 * procedures are Java static methods (`CREATE PROCEDURE … PARAMETER STYLE
 * JAVA … EXTERNAL NAME`), and Scala objects emit exactly the static
 * forwarders Derby needs, so the engine can register a procedure whose SIDE
 * EFFECT is observable from the gate: the engine's [[Jdbc.call]] passthrough
 * is then certified end to end (window parameters arrive, the procedure's
 * write lands, failures abort).
 *
 * The body runs INSIDE the database (embedded Derby = this JVM) on the
 * nested connection `jdbc:default:connection`, exactly like a T-SQL proc
 * body runs inside SQL Server — the engine side never sees this code, only
 * `CALL WINDOW_SUMMARY(?, ?)`.
 */
object DerbyProcs {

  /** `WINDOW_SUMMARY(IN s TIMESTAMP, IN e TIMESTAMP)`: summarize the
    * `SPROC_SRC` rows inside the window into `SPROC_OUT(n_rows, sum_ids)` —
    * integer arithmetic only, so the gate's DuckDB twin matches bit-exactly
    * (a double SUM would hash-differ on partial-sum order). */
  def windowSummary(from: java.sql.Timestamp, to: java.sql.Timestamp): Unit = {
    val conn = java.sql.DriverManager.getConnection("jdbc:default:connection")
    val ps = conn.prepareStatement(
      """INSERT INTO SPROC_OUT SELECT COUNT(*), SUM("event_id") FROM SPROC_SRC WHERE "ts" BETWEEN ? AND ?""")
    try {
      ps.setTimestamp(1, from)
      ps.setTimestamp(2, to)
      ps.executeUpdate()
      ()
    } finally ps.close()
    // the nested connection belongs to the calling statement's context —
    // Derby closes it when the procedure returns; closing here would be a
    // no-op, committing would be an error
  }

  /** `ALWAYS_FAILS()`: raises — the fixture for the abort-the-run contract
    * (a failing sproc must propagate, `BulkCopyManager.cs:114-134`). */
  def alwaysFails(): Unit =
    throw new java.sql.SQLException("ALWAYS_FAILS: deliberate procedure failure")
}
