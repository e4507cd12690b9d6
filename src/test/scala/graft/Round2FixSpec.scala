package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.config.SinkTableConfig
import graft.model.{BronzeSchema, RequestExchange, RequestContext, TransportRequest}
import graft.orchestration.{BatchProcessor, TableManager}

/** Round-2 regression specs for the ADVICE.md fixes. */
class Round2FixSpec extends SparkSpec {

  private def exchangeWithHeaders(h: Map[String, String]): RequestExchange = {
    val ctx = RequestContext(url = "http://x/api", method = "GET")
    RequestExchange(context = ctx,
      request = Some(TransportRequest(url = "http://x/api", method = "GET", headers = h)))
  }

  test("buildRow redacts configured headers case-insensitively, leaves others") {
    val ex = exchangeWithHeaders(Map(
      "authorization" -> "Bearer s3cret", "Accept" -> "application/json"))
    val row = BronzeSchema.buildRow("r1", ex, redactHeaders = Set("Authorization"))
    val headersJson = row.getString(BronzeSchema.columns.indexOf("request_headers"))
    assert(!headersJson.contains("s3cret"))
    assert(headersJson.contains("***redacted***"))
    assert(headersJson.contains("application/json"))
  }

  test("buildRow default keeps headers verbatim (reference parity)") {
    val ex = exchangeWithHeaders(Map("Authorization" -> "Basic abc"))
    val row = BronzeSchema.buildRow("r1", ex)
    assert(row.getString(BronzeSchema.columns.indexOf("request_headers")).contains("Basic abc"))
  }

  test("overwrite refuses to delete an explicit location with foreign files") {
    val dir = Files.createTempDirectory("graft-foreign").toFile
    Files.writeString(new java.io.File(dir, "precious.csv").toPath, "do,not,delete")
    val tm = new TableManager(spark)
    val cfg = SinkTableConfig("refuse_probe", "demo", mode = "overwrite",
      location = Some(dir.getAbsolutePath))
    spark.sql("DROP TABLE IF EXISTS demo.refuse_probe")
    val e = intercept[IllegalStateException](tm.createTable(cfg))
    assert(e.getMessage.contains("refusing to delete"))
    assert(new java.io.File(dir, "precious.csv").exists())
  }

  test("overwrite reclaims an explicit location holding only sink artifacts") {
    val dir = Files.createTempDirectory("graft-sinkdir").toFile
    Files.writeString(new java.io.File(dir, "part-00000-abc.snappy.parquet").toPath, "x")
    Files.writeString(new java.io.File(dir, "_SUCCESS").toPath, "")
    val tm = new TableManager(spark)
    val cfg = SinkTableConfig("reclaim_probe", "demo", mode = "overwrite",
      location = Some(dir.getAbsolutePath))
    spark.sql("DROP TABLE IF EXISTS demo.reclaim_probe")
    tm.createTable(cfg)
    assert(spark.table("demo.reclaim_probe").count() == 0L)
    spark.sql("DROP TABLE IF EXISTS demo.reclaim_probe")
  }

  test("portableBatchId matches the md5-56bit spec and is non-negative") {
    import spark.implicits._
    val df = Seq("1", "42", "9999").toDF("request_id")
      .withColumn("batch_id", BatchProcessor.portableBatchId(col("request_id"), 6))
      .withColumn("expected",
        pmod(conv(substring(md5(col("request_id")), 1, 14), 16, 10).cast("long"), lit(6L)))
    assert(df.filter(col("batch_id") =!= col("expected")).isEmpty)
    assert(df.filter(col("batch_id") < 0 || col("batch_id") >= 6).isEmpty)
  }

  test("silver layer types good rows and NULLs unparseable ones, keeping request_id") {
    import spark.implicits._
    val bronze = Seq(
      ("1", true, 200, """{"id":"1","customer":"7","status":"ok"}"""),
      ("2", false, 500, "not json at all")
    ).toDF("request_id", "success", "status_code", "body_text")
    val silver = graft.orchestration.SilverLayer
      .fromBronze(bronze, "id STRING, customer STRING, status STRING")
      .orderBy("request_id").collect()
    assert(silver(0).getString(3) == "1")
    assert(silver(0).getString(4) == "7")
    assert(silver(1).getString(0) == "2")
    assert(silver(1).isNullAt(3))
  }

  test("CLI source reader infers format from the extension") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fmt")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    df.write.option("header", "true").csv(s"$dir/s.csv"); df.write.json(s"$dir/s.json")
    df.write.orc(s"$dir/s.orc"); df.write.parquet(s"$dir/s.parquet")
    for (ext <- Seq("csv", "json", "orc", "parquet")) {
      val back = RunPipelineCli.readSource(spark, s"$dir/s.$ext")
      assert(back.count() == 2, ext)
      assert(back.columns.toSet == Set("id", "v"), ext)
    }
  }

  test("murmur3 batchId covers [0, n) after pmod (quirk Q8)") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toString).toDF("request_id")
      .withColumn("batch_id", BatchProcessor.batchId(col("request_id"), 7))
    assert(df.filter(col("batch_id") < 0 || col("batch_id") >= 7).isEmpty)
    assert(df.select(countDistinct("batch_id")).as[Long].head() == 7L)
  }
}
