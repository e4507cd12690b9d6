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
    val path = cfg.location.getOrElse(defaultLocation(cfg))
    val dir = new java.io.File(path)
    if (dir.exists() && !spark.catalog.tableExists(cfg.namespace, cfg.name)) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dir)
    }
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
