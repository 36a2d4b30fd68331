package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Build-once, `_SUCCESS`-guarded warehouse tables — the shared
 * persistence substrate behind every "ensure X" serving path in the
 * engine ([[Similarity.ensureIvfIndex]]'s pattern, factored out so the
 * dedup-cluster and language-ID-profile tables don't re-implement it).
 *
 * Semantics: the in-memory catalog forgets tables between sessions but
 * warehouse directories survive. A COMPLETE previous write (`_SUCCESS`
 * marker present) is re-attached as an external parquet table over the
 * same LOCATION; a partial write is cleared and redone; an
 * already-registered table is a no-op. Callers fingerprint the table
 * name with every build parameter (source dir, schema, thresholds) so
 * a parameter change falls through to a fresh build instead of
 * silently attaching stale files — the q_bucketed_join convention.
 *
 * This is the serving posture for expensive derived artifacts: build
 * the pipeline ONCE, let every downstream report/probe query read the
 * persisted result instead of re-running the pipeline per query.
 */
object Warehouse {

  /** Resolve `table`'s directory under `spark.sql.warehouse.dir`. */
  def tablePath(spark: SparkSession, table: String): java.nio.file.Path = {
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
    java.nio.file.Paths.get(
      if (wh.getScheme == "file") java.nio.file.Paths.get(wh).toString
      else wh.getPath).resolve(table)
  }

  private def clear(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }

  /**
   * Ensure `name` exists as a (non-partitioned) parquet table holding
   * `build`'s result. `schemaDdl` is the table's column DDL, needed to
   * re-attach a surviving directory WITHOUT evaluating `build` (some
   * builders — cluster resolution — execute eagerly, so the schema
   * cannot be taken from the unbuilt frame). `build` is by-name and
   * only runs when no complete prior write exists.
   */
  def ensureTable(spark: SparkSession, name: String, schemaDdl: String)(
      build: => DataFrame): Unit = {
    if (!spark.catalog.tableExists(name)) {
      val p = tablePath(spark, name)
      if (java.nio.file.Files.exists(p.resolve("_SUCCESS"))) {
        spark.sql(s"CREATE TABLE $name ($schemaDdl) USING PARQUET " +
          s"LOCATION '${p.toUri}'")
      } else {
        clear(p)
        build.write.mode("overwrite").saveAsTable(name)
      }
    }
  }
}
