package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-format isolation (SURVEY.md §7.6). All pipeline IO routes through
  * this trait; locally the Parquet impl is used everywhere. On a real cluster
  * the Iceberg impl activates when `org.apache.iceberg.spark.SparkCatalog` is
  * on the classpath (spark-submit `--packages`), giving snapshot-isolation
  * for the dict_version blue/green swap and partition-level commits — no
  * pipeline code changes. Partition spec, dict versioning, and resume
  * semantics are format-agnostic by design.
  */
trait TableIO {
  def read(spark: SparkSession, table: String): DataFrame
  def write(df: DataFrame, table: String, partitionCols: Seq[String]): Unit
  def exists(spark: SparkSession, table: String): Boolean
}

/** Local / test implementation: one parquet dir per table under `baseDir`;
  * `_SUCCESS` marker doubles as the stage-completion flag for resume. */
final class ParquetTableIO(baseDir: String) extends TableIO {
  private def path(table: String) = s"$baseDir/$table"

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  override def write(df: DataFrame, table: String, partitionCols: Seq[String]): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path(table))
  }

  override def exists(spark: SparkSession, table: String): Boolean =
    new java.io.File(s"${path(table)}/_SUCCESS").exists()
}

/** Cluster implementation: catalog tables via the DataFrameWriterV2 API.
  * Untestable in this sandbox (no Iceberg jar — SURVEY.md §7.6); kept minimal
  * and behind the classpath check in [[TableIO.forSession]]. */
final class IcebergTableIO(catalog: String, namespace: String) extends TableIO {
  private def fqn(table: String) = s"$catalog.$namespace.$table"

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.table(fqn(table))

  override def write(df: DataFrame, table: String, partitionCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val w = df.writeTo(fqn(table))
    (if (partitionCols.nonEmpty) w.partitionedBy(col(partitionCols.head),
      partitionCols.tail.map(col): _*)
     else w).createOrReplace()
  }

  override def exists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(fqn(table))
}

object TableIO {
  def icebergAvailable: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: ClassNotFoundException => false }

  /** Iceberg when the runtime has it AND a catalog is configured; else Parquet. */
  def forSession(spark: SparkSession, baseDir: String,
                 catalog: String = "graft", namespace: String = "kg"): TableIO =
    if (icebergAvailable &&
        spark.conf.getOption(s"spark.sql.catalog.$catalog").isDefined)
      new IcebergTableIO(catalog, namespace)
    else new ParquetTableIO(baseDir)
}
