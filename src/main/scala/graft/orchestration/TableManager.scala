package graft.orchestration

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StructField, StructType}

import graft.config.SinkTableConfig
import graft.model.BronzeSchema

/** Catalog DDL lifecycle for the bronze sink.
  * Ref: src/core/table_manager.py:9-195.
  *
  * Format: the reference writes Delta; this environment has no Delta jars, so
  * the manager probes for `io.delta.sql.DeltaSparkSessionExtension` and falls
  * back to `USING PARQUET` managed tables — append/overwrite/anti-join
  * idempotency semantics are format-agnostic (SURVEY.md §7.2/§7.4).
  */
final class TableManager(spark: SparkSession) {

  val format: String =
    if (TableManager.deltaAvailable(spark)) "DELTA" else "PARQUET"

  private def fieldDdl(f: StructField): String = {
    val notNull = if (f.nullable) "" else " NOT NULL"
    val comment =
      if (f.metadata.contains("comment"))
        s" COMMENT '${f.metadata.getString("comment").replace("'", "''")}'"
      else ""
    s"`${f.name}` ${f.dataType.sql}$notNull$comment"
  }

  def createDatabase(namespace: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$namespace`")

  /** CREATE TABLE IF NOT EXISTS (append) or CREATE OR REPLACE TABLE
    * (overwrite), with PARTITIONED BY / LOCATION / TBLPROPERTIES clauses.
    * Ref: table_manager.py:61-114.
    */
  def createTable(cfg: SinkTableConfig, schema: StructType = BronzeSchema.schema): Unit = {
    createDatabase(cfg.namespace)
    // Append mode across JVMs without a persistent metastore: the fresh
    // in-memory catalog doesn't know the previous run's managed table, but
    // its data directory exists. Re-attach it with an explicit LOCATION so
    // append + anti-join idempotency survive process restarts. (With a Hive
    // metastore or Delta the catalog itself persists and this is a no-op.)
    val adoptLocation =
      if (cfg.mode == "append" && format != "DELTA" && cfg.location.isEmpty &&
          !spark.catalog.tableExists(cfg.namespace, cfg.name) &&
          new java.io.File(defaultLocation(cfg)).exists())
        Some(defaultLocation(cfg))
      else None
    // CREATE OR REPLACE TABLE needs a v2 catalog (Delta); the parquet
    // fallback emulates overwrite with DROP + CREATE (SURVEY.md §7.4).
    val create =
      if (cfg.mode == "overwrite" && format == "DELTA") "CREATE OR REPLACE TABLE"
      else {
        if (cfg.mode == "overwrite") {
          spark.sql(s"DROP TABLE IF EXISTS `${cfg.namespace}`.`${cfg.name}`")
          // A fresh in-memory catalog doesn't know about a previous
          // process's managed table, so DROP won't clear its directory —
          // remove the leftover location or CREATE fails with
          // LOCATION_ALREADY_EXISTS.
          deleteLeftoverLocation(cfg)
        }
        "CREATE TABLE IF NOT EXISTS"
      }
    val cols = schema.fields.map(fieldDdl).mkString(",\n  ")
    val partitioned =
      if (cfg.partitionBy.nonEmpty) cfg.partitionBy.mkString("\nPARTITIONED BY (", ", ", ")") else ""
    val location = cfg.location.orElse(adoptLocation).map(l => s"\nLOCATION '$l'").getOrElse("")
    val props =
      if (cfg.tableProperties.nonEmpty)
        cfg.tableProperties.map { case (k, v) => s"'$k'='$v'" }.mkString("\nTBLPROPERTIES (", ", ", ")")
      else ""
    spark.sql(s"$create `${cfg.namespace}`.`${cfg.name}` (\n  $cols\n)\nUSING $format$partitioned$location$props")
  }

  private def defaultLocation(cfg: SinkTableConfig): String = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    s"$warehouse/${cfg.namespace}.db/${cfg.name}"
  }

  private def deleteLeftoverLocation(cfg: SinkTableConfig): Unit = {
    if (spark.catalog.tableExists(cfg.namespace, cfg.name)) return
    val dir = new java.io.File(cfg.location.getOrElse(defaultLocation(cfg)))
    if (!dir.exists()) return
    // The default managed path is ours to reclaim. A user-supplied LOCATION
    // is not: it may hold unrelated pre-existing data, and the reference
    // (Delta CREATE OR REPLACE, table_manager.py:83-89) never deletes the
    // directory. Only proceed if every file in it is a recognizable
    // parquet-sink artifact from a previous run of this engine.
    if (cfg.location.isDefined && !looksLikeSinkDir(dir))
      throw new IllegalStateException(
        s"overwrite: refusing to delete leftover location '${dir.getPath}' — " +
          "it contains files that are not parquet sink artifacts. Move the " +
          "directory aside or point sink.location elsewhere.")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(dir)
  }

  /** True iff every regular file under `dir` is a Spark parquet-sink
    * artifact (part files, _SUCCESS markers, checksums, commit metadata). */
  private def looksLikeSinkDir(dir: java.io.File): Boolean = {
    val artifact = (n: String) =>
      n.endsWith(".parquet") || n.endsWith(".crc") || n == "_SUCCESS" ||
        n.startsWith("_started_") || n.startsWith("_committed_") ||
        n == "_spark_metadata" || n == "_delta_log"
    def ok(f: java.io.File): Boolean =
      if (f.isDirectory) artifact(f.getName) || Option(f.listFiles()).forall(_.forall(ok))
      else artifact(f.getName)
    Option(dir.listFiles()).forall(_.forall(ok))
  }

  /** Existing-table compatibility check: missing column = error, extra =
    * warning, type mismatch = error, nullable declared NOT NULL = error.
    * Ref: table_manager.py:141-195.
    */
  def validateSchema(identifier: String, expected: StructType): (Boolean, Seq[String], Seq[String]) = {
    val actual = spark.table(identifier).schema
    val actualByName = actual.fields.map(f => f.name -> f).toMap
    val errs = Seq.newBuilder[String]
    expected.fields.foreach { f =>
      actualByName.get(f.name) match {
        case None => errs += s"Missing column '${f.name}' in $identifier"
        case Some(a) =>
          if (a.dataType != f.dataType)
            errs += s"Type mismatch for '${f.name}': expected ${f.dataType.sql}, found ${a.dataType.sql}"
          if (!a.nullable && f.nullable)
            errs += s"Column '${f.name}' is NOT NULL in $identifier but nullable in the contract"
      }
    }
    val expectedNames = expected.fields.map(_.name).toSet
    val warns = actual.fields.map(_.name).filterNot(expectedNames.contains)
      .map(c => s"Extra column '$c' in $identifier").toSeq
    val e = errs.result()
    (e.isEmpty, e, warns)
  }
}

object TableManager {
  def deltaAvailable(spark: SparkSession): Boolean =
    try {
      Class.forName("io.delta.sql.DeltaSparkSessionExtension")
      spark.conf.getOption("spark.sql.extensions").exists(_.contains("DeltaSparkSessionExtension"))
    } catch { case _: ClassNotFoundException => false }
}
