package graft.config

import org.apache.spark.sql.SparkSession

/**
 * Configured-table model and classification.
 *
 * Mirrors the reference's five-field table record parsed from the `Tables`
 * config section (`BulkCopyManager.cs:87-98`) and the classification into
 * phase lists (`BulkCopyManager.cs:100-104`).
 */
final case class TableSpec(
    tableName: String,
    tableType: String,
    dateColumn: Option[String] = None,
    updateDateColumn: Option[String] = None,
    primaryKey: Option[String] = None,
    /** Store this fact date-partitioned (`load_date=<day>` dirs) so the
      * windowed reload swaps only the window's partitions — the 100 TB
      * layout (config key `partition_by_date`; an engine extension, the
      * reference has no equivalent). */
    partitionByDate: Boolean = false) {
  def typeLower: String = tableType.trim.toLowerCase
}

/** Phase lists in the reference's dispatch order (`BulkCopyManager.cs:107-197`):
  * sprocs (sequential, abort-on-error), copy+update facts (sequential),
  * plain facts (sequential), dims (parallel). `historical` is classified by
  * the reference but never dispatched (`:104` vs `:107-197`) — we keep the
  * list so a runner can warn instead of silently dropping it. */
final case class Classified(
    sprocs: Seq[TableSpec],
    copyUpdate: Seq[TableSpec],
    facts: Seq[TableSpec],
    dims: Seq[TableSpec],
    historical: Seq[TableSpec])

final case class EngineConfig(
    sourceSchema: String,
    targetSchema: String,
    scheduleMode: Option[String],
    dateFrom: Option[String],
    dateTo: Option[String],
    tables: Seq[TableSpec],
    /** Named SQL step definitions (`SqlSteps` config section) — the sproc
      * bodies a `sproc`-type table entry refers to by `table_name`. The
      * reference keeps sproc bodies server-side (`StoreProcRunService.cs`);
      * here the config carries the SQL text with `{start_ts}`/`{end_ts}` /
      * `{start_date}`/`{end_date}` placeholders (see `SqlStepRegistry`). */
    sqlSteps: Map[String, String] = Map.empty)

object TableSpec {

  /** Classification per `BulkCopyManager.cs:100-104`:
    *  - fact with BOTH update_date_column and primary_key → copy+update
    *  - fact otherwise                                    → plain fact copy
    *  - dim                                               → truncate+reload
    *  - sproc                                             → stored-proc phase
    *  - historical with update_date_column                → dead list (never run)
    * Type comparison is case-insensitive like the reference's string equals.
    */
  def classify(specs: Seq[TableSpec]): Classified = Classified(
    sprocs = specs.filter(_.typeLower == "sproc"),
    copyUpdate = specs.filter(s =>
      s.typeLower == "fact" && s.updateDateColumn.exists(_.nonEmpty) && s.primaryKey.exists(_.nonEmpty)),
    facts = specs.filter(s =>
      s.typeLower == "fact" && !(s.updateDateColumn.exists(_.nonEmpty) && s.primaryKey.exists(_.nonEmpty))),
    dims = specs.filter(_.typeLower == "dim"),
    historical = specs.filter(s => s.typeLower == "historical" && s.updateDateColumn.exists(_.nonEmpty)))
}

object EngineConfig {

  /**
   * Load an `appsettings.json`-shaped config file:
   * {{{
   * { "SourceSchema": "...", "TargetSchema": "...", "ScheduleMode": "daily",
   *   "DateFrom": "2024-01-01", "DateTo": "2024-01-02",
   *   "Tables": [ { "table_name": "...", "table_type": "fact",
   *                 "date_column": "...", "update_date_column": "...",
   *                 "primary_key": "..." } ],
   *   "SqlSteps": [ { "name": "daily_stats",
   *                   "sql": "SELECT ... WHERE d BETWEEN TIMESTAMP '{start_ts}' AND TIMESTAMP '{end_ts}'" } ] }
   * }}}
   * Parsed with Spark's JSON reader (multiLine) — no extra dependency.
   *
   * ENVIRONMENT OVERRIDES: after the file parse, `GRAFT_`-prefixed
   * environment variables overlay the scalar settings — the reference
   * layers `AddEnvironmentVariables()` over `appsettings.json`
   * (`Program.cs:11-16`), so a deployment overrides schemas / schedule /
   * window per environment without editing the file. Matching follows
   * .NET config-provider semantics: the key after the prefix compares
   * case-insensitively (`GRAFT_SCHEDULEMODE`, `GRAFT_ScheduleMode` both
   * hit `ScheduleMode`), an env value always wins over the file value,
   * and an EMPTY env value clears an optional setting (sets it to None).
   * Overridable keys: `SourceSchema`, `TargetSchema`, `ScheduleMode`,
   * `DateFrom`, `DateTo`. Structured sections (`Tables`, `SqlSteps`) are
   * file-only, as in the reference's practice. `env` is injectable for
   * tests; production callers use the default `sys.env`.
   */
  def load(spark: SparkSession, path: String,
      env: Map[String, String] = sys.env): EngineConfig = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.option("multiLine", "true").json(path)
    val row = df.head()
    def optStr(name: String): Option[String] =
      if (!df.columns.contains(name)) None
      else Option(row.getAs[Any](name)).map(_.toString).filter(_.nonEmpty)
    val tables: Seq[TableSpec] =
      if (!df.columns.contains("Tables")) Seq.empty
      else {
        val tdf = df.select(org.apache.spark.sql.functions.explode(col("Tables")).as("t")).select("t.*")
        val cols = tdf.columns.toSet
        tdf.collect().toSeq.map { r =>
          def f(n: String): Option[String] =
            if (!cols.contains(n)) None else Option(r.getAs[Any](n)).map(_.toString).filter(_.nonEmpty)
          TableSpec(
            tableName = f("table_name").getOrElse(
              throw new IllegalArgumentException("table_name is required for every Tables entry")),
            tableType = f("table_type").getOrElse("fact"),
            dateColumn = f("date_column"),
            updateDateColumn = f("update_date_column"),
            primaryKey = f("primary_key"),
            partitionByDate = f("partition_by_date").exists(_.equalsIgnoreCase("true")))
        }
      }
    val sqlSteps: Map[String, String] =
      if (!df.columns.contains("SqlSteps")) Map.empty
      else {
        val sdf = df.select(org.apache.spark.sql.functions.explode(col("SqlSteps")).as("s")).select("s.*")
        val cols = sdf.columns.toSet
        require(cols.contains("name") && cols.contains("sql"),
          "every SqlSteps entry needs 'name' and 'sql' fields")
        sdf.collect().toSeq.map { r =>
          val name = Option(r.getAs[Any]("name")).map(_.toString).filter(_.nonEmpty).getOrElse(
            throw new IllegalArgumentException("SqlSteps entry with empty 'name'"))
          val sql = Option(r.getAs[Any]("sql")).map(_.toString).filter(_.nonEmpty).getOrElse(
            throw new IllegalArgumentException(s"SqlSteps entry '$name' with empty 'sql'"))
          name -> sql
        }.toMap
      }
    // env overlay: last writer wins, like the reference's provider order
    // (JSON first, environment second — Program.cs:11-16)
    val overlay: Map[String, String] = env.collect {
      case (k, v) if k.toUpperCase.startsWith("GRAFT_") =>
        k.drop("GRAFT_".length).toUpperCase -> v
    }
    def layered(name: String): Option[String] = overlay.get(name.toUpperCase) match {
      case Some(v) => Some(v).filter(_.nonEmpty) // empty env value CLEARS the setting
      case None    => optStr(name)
    }
    EngineConfig(
      sourceSchema = layered("SourceSchema").getOrElse("src"),
      targetSchema = layered("TargetSchema").getOrElse("tgt"),
      scheduleMode = layered("ScheduleMode"),
      dateFrom = layered("DateFrom"),
      dateTo = layered("DateTo"),
      tables = tables,
      sqlSteps = sqlSteps)
  }
}
