package graft.sink

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

import graft.config.WarehouseConfig

/** Warehouse publish with atomic visibility (SURVEY K4-K7; reference
  * redshift_loader/handler.py:76-183).
  *
  * Reference protocol: CREATE staging LIKE target → COPY into staging →
  * verify count → transactional double-RENAME swap → drop old. The
  * double rename has a reader-visible gap (no table exists between the
  * renames), so this engine uses a strictly stronger commit: each load
  * writes an immutable versioned physical table `<target>_vN`, and the
  * commit point is a single `CREATE OR REPLACE VIEW <target>` pointer
  * swap — readers of `<target>` see the old version or the new one,
  * never a missing table or partial data. A failure before the view
  * swap leaves the previous version fully intact.
  *
  * Retention keeps the latest two physical versions so readers that
  * resolved the previous pointer mid-swap finish their scan before the
  * files disappear (lag-by-one retention, the same reason table formats
  * keep a vacuum horizon).
  */
object WarehousePublisher {

  final case class PublishResult(
      table: String, rowsLoaded: Long, analyzed: Boolean, version: Long)

  private val VersionRe = """(?i)(.*)_v(\d+)""".r

  /** Physical versions of `target` only: names that are not exactly
    * `<target>_v<digits>` (views, sibling targets, backups) are
    * ignored, never matched-on-error.
    */
  private def versionsOf(spark: SparkSession, target: String): Seq[(String, Long)] =
    spark.catalog.listTables().collect().toSeq.flatMap { t =>
      t.name.toLowerCase match {
        case VersionRe(base, v) if base == target.toLowerCase => Some((t.name, v.toLong))
        case _ => None
      }
    }

  /** Raised by the K7 schema gate: the incoming frame dropped or
    * retyped columns of the currently published version and the config
    * did not opt into evolution.
    */
  final class SchemaCompatException(msg: String) extends RuntimeException(msg)

  /** K7 column introspection gate, mirroring the reference's
    * information_schema.columns check before COPY
    * (redshift_loader/handler.py:102-118): every column of the
    * currently published version must exist in the incoming frame with
    * the same type. Additive columns are always compatible (the view
    * swap republishes the full schema, so readers see the superset);
    * drops/retypes are silent data loss for downstream readers and
    * fail the publish unless `allow_column_evolution` opts in.
    *
    * Catalog metadata only — no data is read.
    */
  private def checkColumnCompat(
      spark: SparkSession, target: String, incoming: DataFrame): Unit = {
    if (!spark.catalog.tableExists(target)) return
    val published = spark.catalog.listColumns(target).collect()
      .map(c => c.name.toLowerCase -> c.dataType).toMap
    val offered = incoming.schema.map(f =>
      f.name.toLowerCase -> f.dataType.simpleString).toMap
    val dropped = published.keySet -- offered.keySet
    val retyped = published.collect {
      case (name, dt) if offered.get(name).exists(_ != dt) =>
        s"$name: $dt -> ${offered(name)}"
    }
    if (dropped.nonEmpty || retyped.nonEmpty)
      throw new SchemaCompatException(
        s"incompatible publish to $target: dropped=[${dropped.toSeq.sorted.mkString(", ")}] " +
          s"retyped=[${retyped.toSeq.sorted.mkString(", ")}] " +
          "(set allow_column_evolution to publish anyway)")
  }

  def publish(spark: SparkSession, df: DataFrame, cfg: WarehouseConfig): PublishResult = {
    val target = cfg.qualified
    if (!cfg.allowColumnEvolution) checkColumnCompat(spark, target, df)

    // Physical layout: distribution key → hash repartition (co-locates
    // equal keys, the distkey contract); sort keys → within-partition
    // sort (run-length/dictionary-friendly parquet, range-pruned scans).
    val shaped0 = cfg.distkey.fold(df)(k => df.repartition(col(k)))
    val shaped = if (cfg.sortkey.nonEmpty)
      shaped0.sortWithinPartitions(cfg.sortkey.map(col): _*)
    else shaped0

    val existing = versionsOf(spark, target)
    // One-time migration from a pre-versioning layout: a plain TABLE at
    // the target name is RENAMED into the version chain (never dropped —
    // a crash must not lose the old data). It takes the next free slot,
    // and the new load the one after, so the rename can never collide
    // with an existing version. The rename→create-view window is the
    // legacy protocol's gap, paid once; every later publish is a pure
    // atomic view swap.
    val legacyExists = spark.catalog.tableExists(target) &&
      spark.catalog.getTable(target).tableType != "VIEW"
    // The version the live pointer reads right now. Usually the newest,
    // but after a rollback it's older — retention must never drop the
    // version readers were just being served from.
    val pointerBefore: Option[Long] =
      if (!legacyExists && spark.catalog.tableExists(target))
        scala.util.Try(currentVersion(spark, target)).toOption
      else None
    val nextSlot = existing.map(_._2).maxOption.getOrElse(0L) + 1L
    val legacySlot = if (legacyExists) Some(nextSlot) else None
    val version = if (legacyExists) nextSlot + 1L else nextSlot
    val phys = s"${target}_v$version"

    try {
      shaped.write.mode(SaveMode.Overwrite).saveAsTable(phys)
      val loaded = spark.table(phys).count() // K7-style verification read
      legacySlot.foreach(s => spark.sql(s"ALTER TABLE $target RENAME TO ${target}_v$s"))
      // Commit point: one atomic pointer swap.
      spark.sql(s"CREATE OR REPLACE VIEW $target AS SELECT * FROM $phys")
      // Retention: latest two versions stay readable — and whatever
      // version the pointer served immediately before this swap (equal
      // to the newest except after a rollback), for the same
      // finish-your-scan reason.
      existing.filter { case (_, v) =>
        v < version - 1 && !pointerBefore.contains(v)
      }.foreach { case (name, _) =>
        spark.sql(s"DROP TABLE IF EXISTS $name")
      }
      val analyzed = maintain(spark, cfg, target, phys)
      PublishResult(target, loaded, analyzed, version)
    } catch {
      case e: Throwable =>
        spark.sql(s"DROP TABLE IF EXISTS $phys") // abort: old version untouched
        throw e
    }
  }

  /** K6: table maintenance — ANALYZE maps to COMPUTE STATISTICS on the
    * physical version; the VACUUM analog (small-file compaction)
    * rewrites into the next version and re-points the view, so even
    * compaction never interrupts readers. Triggered only under
    * `vacuum_strategy: full` to keep `auto` cheap.
    */
  private def maintain(
      spark: SparkSession, cfg: WarehouseConfig, target: String, phys: String): Boolean = {
    var current = phys
    if (cfg.vacuumStrategy == "full") {
      val compacted = spark.table(phys).coalesce(
        math.max(1, spark.sparkContext.defaultParallelism / 4))
      val next = versionsOf(spark, target).map(_._2).max + 1L
      val nextPhys = s"${target}_v$next"
      compacted.write.mode(SaveMode.Overwrite).saveAsTable(nextPhys)
      spark.sql(s"CREATE OR REPLACE VIEW $target AS SELECT * FROM $nextPhys")
      current = nextPhys
    } else if (cfg.vacuumStrategy == "delete") {
      // VACUUM DELETE ONLY analog: reclaim space now — drop every
      // retained version except the one just published, trading the
      // time-travel window for storage. No rewrite, no re-point.
      versionsOf(spark, target)
        .filter(!_._1.equalsIgnoreCase(phys))
        .foreach { case (name, _) => spark.sql(s"DROP TABLE IF EXISTS $name") }
    }
    if (cfg.analyze) {
      spark.sql(s"ANALYZE TABLE $current COMPUTE STATISTICS")
      true
    } else false
  }

  /** Retained physical versions of `target`, newest first. The lag-one
    * retention window means this is normally (current, previous).
    */
  def listVersions(spark: SparkSession, target: String): Seq[Long] =
    versionsOf(spark, target).map(_._2).sorted.reverse

  /** Time-travel read: a specific retained physical version. The
    * previous publish stays queryable until the next one lands
    * (retention keeps two versions) — the same bounded time travel a
    * table format gives inside its vacuum horizon.
    */
  def readVersion(spark: SparkSession, target: String, version: Long): DataFrame =
    spark.table(s"${target}_v$version")

  /** The version the published view currently points at, parsed from
    * the view definition — the pointer IS the commit state, so there is
    * no side channel to fall out of sync with.
    */
  def currentVersion(spark: SparkSession, target: String): Long = {
    val text = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(target))
      .viewText.getOrElse(
        throw new IllegalStateException(s"$target is not a published view"))
    """(?i)_v(\d+)\s*$""".r.findFirstMatchIn(text.trim)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(
        s"$target view does not point at a version: $text"))
  }

  /** Roll the published pointer back to the newest retained version
    * below the current one — the same single atomic view swap as
    * publish, so readers see old-or-new, never neither. The rolled-back
    * version is NOT dropped; the next publish takes a fresh slot above
    * it (history moves forward even through a rollback).
    */
  def rollback(spark: SparkSession, target: String): Long = {
    val cur = currentVersion(spark, target)
    val prev = versionsOf(spark, target).map(_._2).filter(_ < cur).maxOption
      .getOrElse(throw new IllegalStateException(
        s"no retained version below v$cur to roll $target back to"))
    spark.sql(s"CREATE OR REPLACE VIEW $target AS SELECT * FROM ${target}_v$prev")
    prev
  }

  /** K8 UNLOAD (README.md:57,148): export a published table/view to
    * files for external consumers — a scan + write, counted in the
    * same pass via observe().
    */
  def exportTable(
      spark: SparkSession, table: String, path: String, format: String = "parquet"): Long = {
    val obs = Observation()
    spark.table(table)
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).format(format).save(path)
    obs.get("n").asInstanceOf[Long]
  }
}
