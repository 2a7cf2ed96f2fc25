package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A second writer raced an in-flight rewrite of the same table. The losing
  * writer's data was NOT published and the winning writer's swap proceeds
  * untouched — retry after the winner finishes (the reference inherited this
  * exclusion from SQL Server's transactions, `TableCopyService.cs:89,170`). */
final class ConcurrentWriteException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/**
 * Directory-per-table parquet store with atomic publish.
 *
 * Stands in for the reference's target SQL Server database plus its
 * delete+bulk-insert transaction (`TableCopyService.cs:89,170`): readers of a
 * table must never observe a half-refreshed state. With no transactional
 * table format on the classpath, atomicity comes from a write-temp-then-rename
 * swap protocol on the filesystem (SURVEY.md §4.4):
 *
 *  1. write the new state to `<table>.tmp-<nonce>` (Spark job; crash here
 *     leaves the current state untouched),
 *  2. rename current `<table>` → `<table>.old-<nonce>` (atomic),
 *  3. rename `<table>.tmp-<nonce>` → `<table>` (atomic publish),
 *  4. delete the `.old` dir (best-effort cleanup).
 *
 * A crash between 2 and 3 is recovered by [[recover]]: if `<table>` is
 * missing but an `.old` dir exists, the old state is renamed back. Stale
 * `.tmp`/`.old` dirs never shadow the live directory because reads only ever
 * target `<table>` exactly.
 *
 * At 100 TB the same protocol holds: the swap is two metadata operations
 * regardless of data volume, and the expensive step (1) is a fully parallel
 * distributed write.
 */
final class TableStore(spark: SparkSession, root: String) {

  private def fs: FileSystem = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tablePath(table: String): String = s"$root/$table"

  def exists(table: String): Boolean = fs.exists(new Path(tablePath(table)))

  def read(table: String): DataFrame = spark.read.parquet(tablePath(table))

  /** Read an append-evolved table with schema merging: a table whose later
    * appends added columns (the CDC-source-gained-a-field case) has mixed
    * parquet footers, and a plain read takes ONE footer's schema — silently
    * dropping the new column or the old rows' view of it depending on which
    * file wins. `mergeSchema` unions all footers (old rows read NULL for
    * later columns). Footer-merge cost scales with file count, not bytes —
    * pair evolving tables with [[compact]] to keep it bounded. */
  def readEvolved(table: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(tablePath(table))

  /** Append rows (the reference's plain `SqlBulkCopy` append path,
    * `TableCopyService.cs:121,144-170`). Not atomic across files; used for
    * the ledger and pure-append facts. */
  def append(table: String, df: DataFrame): Unit = {
    refuseIfCatalogBucketed(table, "append")
    df.write.mode("append").parquet(tablePath(table))
  }

  /** Writer mutual exclusion: atomically create `<table>.lock` (create with
    * overwrite=false is the filesystem's compare-and-set) and fail loudly
    * with [[ConcurrentWriteException]] if another writer holds it. Without
    * this, two racing [[atomicOverwrite]]s both complete and the LAST swap
    * silently discards the first writer's data — a lost update with no
    * error anywhere (the reference got this exclusion for free from SQL
    * Server transactions). A crashed writer leaves a stale lock; [[recover]]
    * clears it (run recovery only when no writer is live). */
  private def acquireWriteLock(table: String, op: String): Path = {
    val lock = new Path(tablePath(table) + ".lock")
    def conflict(cause: Throwable) = throw new ConcurrentWriteException(
      s"$op('$table'): another writer holds ${lock.getName} — concurrent rewrites of one " +
        "table lose the first writer's data; retry after it finishes " +
        "(a stale lock from a crashed writer is cleared by recover)", cause)
    if (fs.exists(lock)) conflict(null)
    try {
      val out = fs.create(lock, false) // atomic create-fails-if-exists
      try out.writeUTF(s"$op@${java.time.Instant.now()}") finally out.close()
    } catch { case e: java.io.IOException => conflict(e) }
    lock
  }

  /** Atomically replace the table's state with `df` (protocol above).
    * `df` MAY be derived from the table's own current state — it is fully
    * materialized into the temp dir before any rename touches the live dir.
    * Guarded at this funnel (and [[append]]/[[overwriteDatePartitions]]) so
    * EVERY rewrite path refuses catalog-bucketed tables, not just the
    * convenience wrappers. Rewrites of one table are mutually exclusive
    * ([[acquireWriteLock]]): a racing second writer fails loudly instead of
    * silently clobbering the first. */
  def atomicOverwrite(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    refuseIfCatalogBucketed(table, "atomicOverwrite")
    val lock = acquireWriteLock(table, "atomicOverwrite")
    try {
      val nonce = java.util.UUID.randomUUID.toString.take(8)
      val live = new Path(tablePath(table))
      val tmp = new Path(tablePath(table) + s".tmp-$nonce")
      val old = new Path(tablePath(table) + s".old-$nonce")
      val writer = if (partitionBy.nonEmpty) df.write.partitionBy(partitionBy: _*) else df.write
      writer.mode("overwrite").parquet(tmp.toString)
      val hadLive = fs.exists(live)
      if (hadLive && !fs.rename(live, old))
        throw new java.io.IOException(s"atomicOverwrite: could not retire $live")
      if (!fs.rename(tmp, live)) {
        // roll back: restore the old state before failing
        if (hadLive) fs.rename(old, live)
        throw new java.io.IOException(s"atomicOverwrite: could not publish $tmp as $live")
      }
      if (hadLive) fs.delete(old, true)
    } finally fs.delete(lock, false)
  }

  /**
   * Partition-scoped overwrite — the 100 TB shape of the windowed reload:
   * replace ONLY the date partitions named in `days`, leaving every other
   * partition untouched. `df` must contain `partCol` (a `date` column); it is
   * written `partitionBy(partCol)` into a temp dir, then each affected
   * `partCol=<day>` directory is swapped into the live table:
   *
   *  - every day in `days` has its live partition retired (windowed DELETE
   *    covers days that end up with zero fresh rows),
   *  - each partition dir present in the temp output is renamed in.
   *
   * Each partition swap is an atomic rename; the overall operation is
   * per-partition atomic (the same guarantee as Hive/Spark dynamic partition
   * overwrite — a crash mid-way leaves some days new and some old, never a
   * torn single day). Cost is proportional to the WINDOW's data, not the
   * table: a one-week reload of a 10-year 100 TB fact table touches ~0.2%
   * of the files and no shuffle.
   */
  def overwriteDatePartitions(table: String, df: DataFrame, partCol: String,
      days: Seq[java.time.LocalDate]): Unit = {
    refuseIfCatalogBucketed(table, "overwriteDatePartitions")
    val lock = acquireWriteLock(table, "overwriteDatePartitions")
    try overwriteDatePartitionsLocked(table, df, partCol, days)
    finally fs.delete(lock, false)
  }

  private def overwriteDatePartitionsLocked(table: String, df: DataFrame, partCol: String,
      days: Seq[java.time.LocalDate]): Unit = {
    val nonce = java.util.UUID.randomUUID.toString.take(8)
    val live = new Path(tablePath(table))
    val tmp = new Path(tablePath(table) + s".tmp-$nonce")
    df.write.partitionBy(partCol).mode("overwrite").parquet(tmp.toString)
    val f = fs
    if (!f.exists(live)) f.mkdirs(live)
    def renameOrThrow(from: Path, to: Path): Unit =
      if (!f.rename(from, to))
        throw new java.io.IOException(s"overwriteDatePartitions: rename $from -> $to failed")
    // validate BEFORE mutating anything: fresh data outside the declared day
    // list means the caller's list was incomplete — failing after partial
    // publication would leave the table half-mutated
    val declared = days.map(d => s"$partCol=$d").toSet
    val undeclared = f.listStatus(tmp).map(_.getPath.getName)
      .filter(n => n.startsWith(s"$partCol=") && !declared.contains(n))
    if (undeclared.nonEmpty)
      throw new java.io.IOException(
        s"overwriteDatePartitions: fresh data for ${undeclared.mkString(", ")} " +
          "not covered by the declared day list — nothing was modified")
    // per-day retire-then-publish keeps the crash window per partition
    // minimal; a leftover .retired-* dir is restored by recover() if its
    // live partition is missing
    val retired = scala.collection.mutable.ListBuffer.empty[Path]
    days.foreach { d =>
      val p = new Path(live, s"$partCol=$d")
      if (f.exists(p)) {
        val old = new Path(live, s".retired-$nonce-$partCol=$d")
        renameOrThrow(p, old)
        retired += old
      }
      val freshPart = new Path(tmp, s"$partCol=$d")
      if (f.exists(freshPart)) renameOrThrow(freshPart, p)
    }
    retired.foreach(f.delete(_, true))
    f.delete(tmp, true)
  }

  /**
   * Bucketed write: hash-cluster the table's FILES on `bucketCol` into
   * `numBuckets` buckets, registered in the session catalog (bucket layout
   * is catalog metadata — readers must come back through [[readBucketed]],
   * not a bare path read, to see it). Data lives under this store's root as
   * an external table, so the directory layout stays ours.
   *
   * This is the 100 TB co-location primitive: two tables bucketed on the
   * same key with the same bucket count join with NO shuffle on either side
   * (each scan already reports `HashPartitioning(bucketCol, numBuckets)`),
   * and a `groupBy(bucketCol)` aggregates with no exchange. For a fact table
   * joined on the same key every day (orders ⋈ customer, events ⋈ users),
   * paying one clustered write amortizes the per-query shuffle away —
   * the layout replaces the network. `sortCols` additionally sorts within
   * each bucket file (sorted-bucket scans skip the sort before a
   * sort-merge join when one file per bucket).
   *
   * Plan contract pinned by `TableStoreSpec`: co-bucketed join plans contain
   * zero Exchange operators and equal the plain join's result.
   */
  def writeBucketed(table: String, df: DataFrame, bucketCol: String, numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    val w = df.write.mode("overwrite").format("parquet")
      .option("path", tablePath(table))
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /**
   * Range-clustered atomic write: globally range-partition `df` on
   * `clusterCols` (sampled boundaries, `numFiles` disjoint key ranges) and
   * sort within each range, so every output file covers a DISJOINT,
   * internally-sorted slice of the cluster-key space. Parquet footer
   * min/max stats then let any equality or range predicate on the cluster
   * key skip whole files and row groups at scan time.
   *
   * This is the within-partition data-skipping layout for the 100 TB fact
   * table, complementary to the two other layouts here: `partitionBy`
   * prunes directories on the coarse axis (date), [[writeBucketed]]
   * co-locates equi-join keys, and range-clustering makes selective scans
   * on an ordered key (order id, user id, timestamp) read ~selectivity ×
   * table instead of all of it — no catalog dependency, plain parquet
   * readers benefit. Disjointness + skip behavior pinned by
   * `TableStoreSpec`.
   */
  def atomicOverwriteClustered(table: String, df: DataFrame,
      clusterCols: Seq[String], numFiles: Int): Unit = {
    require(clusterCols.nonEmpty, "atomicOverwriteClustered needs at least one cluster column")
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    val cols = clusterCols.map(org.apache.spark.sql.functions.col)
    atomicOverwrite(table,
      df.repartitionByRange(numFiles, cols: _*).sortWithinPartitions(cols: _*))
  }

  /**
   * Z-order (Morton-curve) clustered atomic write over TWO numeric key
   * columns: each column is min-max normalized to a `bits`-bit integer grid
   * and the bits interleaved into one z-value; files are then range-split
   * and sorted on z. Because the Morton curve preserves locality in BOTH
   * dimensions, every file covers a compact rectangle-ish region of the
   * (colA, colB) space — parquet footer min/max stats on the ORIGINAL
   * columns then skip files for selective predicates on EITHER column,
   * where a plain range-cluster ([[atomicOverwriteClustered]]) serves only
   * its leading column. The layout for a 100 TB fact table filtered
   * sometimes by customer and sometimes by order range.
   *
   * The normalization bounds come from one tiny min/max aggregation
   * (driver-side scalars, not data). Constant columns normalize to 0 and
   * the curve degrades to a 1-D range cluster on the other key.
   */
  def atomicOverwriteZOrdered(table: String, df: DataFrame, colA: String, colB: String,
      numFiles: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions._
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    Seq(colA, colB).foreach { c =>
      require(df.columns.contains(c), s"atomicOverwriteZOrdered: no such column: $c")
      require(df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"atomicOverwriteZOrdered: $c must be numeric, is ${df.schema(c).dataType}")
    }
    val mm = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    require(!mm.anyNull, "atomicOverwriteZOrdered: empty input or all-null key column")
    val top = (1L << bits) - 1
    def gridded(c: String, lo: Double, hi: Double) =
      if (hi <= lo) lit(0L)
      else least(lit(top), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(top.toDouble)).cast("long")))
    val na = gridded(colA, mm.getDouble(0), mm.getDouble(1))
    val nb = gridded(colB, mm.getDouble(2), mm.getDouble(3))
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(shiftright(na, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(nb, i).bitwiseAND(lit(1L)), 2 * i))
    }
    val zCol = {
      val taken = df.columns.toSet
      Iterator.from(0).map(i => s"__z$i").find(!taken(_)).get
    }
    atomicOverwrite(table,
      df.withColumn(zCol, z)
        .repartitionByRange(numFiles, col(zCol))
        .sortWithinPartitions(col(zCol))
        .select(df.columns.toIndexedSeq.map(col): _*))
  }

  /** Refuse to rewrite a table whose files back a catalog-registered BUCKETED
    * definition at this store's path: a plain repartition rewrite would leave
    * non-bucket-named files under a bucket spec, failing `readBucketed` /
    * `spark.table` reads or silently invalidating the shuffle-free join
    * contract the spec advertises. Such tables must be rewritten through
    * [[writeBucketed]] so layout and metadata stay in agreement. */
  private def refuseIfCatalogBucketed(table: String, op: String): Unit = {
    val cat = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    if (cat.tableExists(ident)) {
      val meta = cat.getTableMetadata(ident)
      val ours = fs.makeQualified(new Path(tablePath(table)))
      if (meta.bucketSpec.isDefined && fs.makeQualified(new Path(meta.location)) == ours)
        throw new IllegalStateException(
          s"$op('$table'): the catalog registers this path as a bucketed table " +
            s"(${meta.bucketSpec.get}); rewrite it via writeBucketed instead — " +
            "a plain rewrite would orphan the bucket spec")
    }
  }

  /** Small-file compaction: rewrite the table as ~`targetFiles` files with
    * an atomic swap. Append-heavy tables (ledgers, streaming sinks, micro-
    * batch upserts) accrete one-file-per-batch; at scale the file count —
    * not the byte count — dominates scan planning and open() overhead, so
    * periodic compaction is part of the table lifecycle. Readers see the
    * old state until the single atomic publish. Catalog-bucketed tables are
    * refused ([[refuseIfCatalogBucketed]]). */
  def compact(table: String, targetFiles: Int): Unit = {
    require(targetFiles > 0, s"targetFiles must be positive: $targetFiles")
    // readEvolved, NOT read: compacting an append-evolved table through a
    // single-footer read would rewrite every file with whichever footer won
    // schema inference — silently and permanently dropping the evolved
    // column's data. The merged read makes compaction the operation that
    // HEALS a mixed-schema table into one uniform footer.
    atomicOverwrite(table, readEvolved(table).repartition(targetFiles))
  }

  /** Partition-scoped small-file compaction — the date-partitioned form of
    * [[compact]]: rewrite ONLY the named `partCol=<day>` partitions, one
    * file per day, leaving every other partition's files untouched. The
    * shape a micro-batch CDC target needs ([[graft.streaming.EventStream]]
    * accretes a file per batch per day): a 100 TB table compacts its few
    * hot days for the cost of those days, never a full rewrite. Reads
    * merged footers like [[compact]], so compaction also heals a
    * mixed-schema day into one uniform footer. Per-partition atomic via
    * [[overwriteDatePartitions]] (same crash guarantee + writer lock). */
  def compactDatePartitions(table: String, partCol: String,
      days: Seq[java.time.LocalDate], filesPerDay: Int = 1): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    require(days.nonEmpty, "compactDatePartitions needs at least one day")
    require(filesPerDay > 0, s"filesPerDay must be positive: $filesPerDay")
    // hash-repartition on (day, row-content salt) into days×filesPerDay
    // tasks: each day's rows spread across ≤ filesPerDay tasks, so the
    // partitionBy write emits ≤ filesPerDay files per day and a hot day's
    // bytes stream through filesPerDay parallel writers, not one (a task
    // co-locating two days still writes each day separately). filesPerDay
    // = 1 is the tightest layout; size it to the day's volume at scale.
    val slice = readEvolved(table)
      .filter(col(partCol).isin(days.map(java.sql.Date.valueOf): _*))
    val salt = pmod(xxhash64(slice.columns.toIndexedSeq.map(col): _*), lit(filesPerDay))
    overwriteDatePartitions(table,
      slice.repartition(days.size * filesPerDay, col(partCol), salt),
      partCol, days)
  }

  /** Read a [[writeBucketed]] table THROUGH the catalog — `spark.table`, not
    * `spark.read.parquet(path)`: the bucket spec rides on the catalog entry,
    * and a path read would silently lose the shuffle-free join property. */
  def readBucketed(table: String): DataFrame = spark.table(table)

  /** Crash recovery: restore `<table>` from the most recently modified
    * `.old-` dir if the live dir is missing; restore any `.retired-*`
    * partition dir whose live partition is missing (partition-scoped
    * overwrite crash); drop all remaining stale `.tmp-`/`.old-`/`.retired-`
    * dirs and the writer lock a crashed writer left behind. ONLY run
    * recovery when no writer is live — it releases the mutual exclusion. */
  def recover(table: String): Unit = {
    val f = fs
    val live = new Path(tablePath(table))
    val parent = new Path(root)
    if (!f.exists(parent)) return
    f.delete(new Path(tablePath(table) + ".lock"), false) // stale writer lock
    val leftovers = f.listStatus(parent)
      .filter(s => s.getPath.getName.startsWith(s"$table.tmp-") ||
        s.getPath.getName.startsWith(s"$table.old-"))
    if (!f.exists(live)) {
      // newest retired snapshot by modification time, NOT by name (nonces
      // are random — lexicographic order would restore an arbitrary one)
      val olds = leftovers.filter(_.getPath.getName.startsWith(s"$table.old-"))
        .sortBy(_.getModificationTime)
      olds.lastOption.foreach(o => f.rename(o.getPath, live))
    }
    leftovers.map(_.getPath).filter(p => f.exists(p) && p != live).foreach(f.delete(_, true))
    // partition-scoped crash: .retired-<nonce>-<partCol>=<day> inside the table dir
    if (f.exists(live)) {
      f.listStatus(live).map(_.getPath).filter(_.getName.startsWith(".retired-")).foreach { r =>
        val partName = r.getName.replaceFirst("^\\.retired-[^-]+-", "")
        val target = new Path(live, partName)
        if (!f.exists(target)) f.rename(r, target) else f.delete(r, true)
      }
    }
  }
}
