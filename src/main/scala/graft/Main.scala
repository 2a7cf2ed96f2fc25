package graft

import graft.config.EngineConfig
import graft.ledger.Ledger
import graft.pipeline.Runner
import graft.proc.SqlStepRegistry
import graft.store.TableStore

/**
 * Scheduled-run entry point — the analog of the reference's `Program.Main`
 * (`Program.cs:6-39`): load config, derive the window from the schedule
 * mode, dispatch all configured tables, exit non-zero if any table failed.
 *
 * Usage: `runMain graft.Main <config.json> <sourceRoot> <targetRoot>`
 * where the roots are parquet warehouse directories (directory per table;
 * swap `TableStore` reads/writes for JDBC against a real database).
 */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: graft.Main <config.json> <sourceRoot> <targetRoot>")
    val Array(cfgPath, srcRoot, tgtRoot) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = io.Sessions.builder(s"local[$cpus]", cpus.toInt).appName("graft-run").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val cfg = EngineConfig.load(spark, cfgPath)
      val target = new TableStore(spark, tgtRoot)
      // sproc-type tables resolve their SQL bodies from the config's SqlSteps
      // section (the analog of BulkCopyManager.cs:114-134 dispatching to
      // server-side procs by name)
      // per-table log files (S10): logs/yyyy-MM/<table>/<table>-<ts>.log,
      // like the reference's Serilog layout; root overridable via env
      val logRoot = sys.env.getOrElse("GRAFT_LOG_DIR", "logs")
      val runner = new Runner(spark, new TableStore(spark, srcRoot), target,
        new Ledger(spark, target), new SqlStepRegistry(cfg.sqlSteps),
        runLogs = Some(new graft.ledger.RunLogs(logRoot)))
      val results = runner.run(cfg)
      results.foreach { r =>
        val status = if (r.ok) s"OK rows=${r.rows.getOrElse(-1L)}" else s"FAILED ${r.error.get}"
        println(s"[graft] ${r.process} ${r.table}: $status")
      }
      if (results.exists(!_.ok)) sys.exit(1)
    } finally spark.stop()
  }
}
