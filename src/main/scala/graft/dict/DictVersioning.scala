package graft.dict

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D7 + D9 — dictionary artifacts and blue/green version swap.
  *
  * The reference alternates two Redis instances and flips a "current
  * instance" pointer after an offline rebuild, so annotation never sees a
  * half-built dictionary. Spark-native equivalent: each build writes an
  * immutable `dict_version=v<N>` snapshot dir; a tiny manifest file names the
  * current version and is swapped atomically (write temp + rename). On
  * Iceberg this maps to snapshot commit semantics (SURVEY.md §7.6).
  */
object DictVersioning {

  def versionPath(baseDir: String, version: String) = s"$baseDir/dict_version=$version"
  private def manifest(baseDir: String) = Paths.get(s"$baseDir/current_version")

  /** Write a dictionary snapshot under its version dir (never in place). */
  def writeSnapshot(dict: DataFrame, baseDir: String, version: String): Unit =
    dict.write.mode("overwrite").parquet(versionPath(baseDir, version))

  /** Atomically flip the current-version pointer (temp file + rename). */
  def activate(baseDir: String, version: String): Unit = {
    val tmp = Paths.get(s"$baseDir/current_version.tmp")
    Files.createDirectories(Paths.get(baseDir))
    Files.write(tmp, version.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifest(baseDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def currentVersion(baseDir: String): Option[String] = {
    val m = manifest(baseDir)
    if (Files.exists(m)) Some(new String(Files.readAllBytes(m), StandardCharsets.UTF_8).trim)
    else None
  }

  /** Read the currently-active dictionary snapshot. */
  def readCurrent(spark: SparkSession, baseDir: String): DataFrame = {
    val v = currentVersion(baseDir)
      .getOrElse(sys.error(s"no active dictionary version under $baseDir"))
    spark.read.parquet(versionPath(baseDir, v))
  }

  /** D7 — the mgrep-compatible `id<TAB>TERM` dictionary file (debug/oracle
    * parity artifact; the automaton replaces the mgrep server itself). */
  def writeTsv(dict: DataFrame, path: String): Unit = {
    val spark = dict.sparkSession
    import spark.implicits._
    dict.select(col("term_id"), col("term"))
      .orderBy(col("term_id"))
      .map { r => s"${r.getInt(0)}\t${r.getString(1)}" }
      .coalesce(1)
      .write.mode("overwrite").text(path)
  }

  /** Dictionary SOURCE from an existing mgrep `id<TAB>TERM` file — reference
    * interop: a user migrating off the mgrep server can point the engine at
    * the same dictionary file their mgrep instance loads. Terms are stored
    * pre-normalized in mgrep files (uppercased), but normalization is
    * re-applied defensively (idempotent on conforming files). Returns
    * `(term string, term_id int)`; concept payload (the reference keeps it
    * in Redis, not in the file) joins in from a separate entries table.
    */
  def readTsv(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "\t", 2).as("kv"))
      .select(
        col("kv").getItem(0).cast("int").as("term_id"),
        DictBuild.normalizeTerm(col("kv").getItem(1)).as("term"))
      .filter(col("term_id").isNotNull && length(col("term")) > 0)
}
