package graft

import org.scalatest.matchers.should.Matchers

import graft.config.SinkTableConfig
import graft.orchestration.TableManager

/** Coverage for the `USING DELTA` branch of TableManager. The sandbox
  * ships no Delta jars, so the write-path test self-skips (visible as
  * "canceled" in the run output) — the moment the classpath gains
  * delta-spark and the session registers DeltaSparkSessionExtension, it
  * runs for real with zero code changes. The probe itself is always
  * testable.
  */
class DeltaGateSpec extends SparkSpec with Matchers {

  test("deltaAvailable probes classpath + session extension, false here") {
    // This environment has no Delta jars: the probe must return false
    // (never throw), which is what routes TableManager to the parquet
    // fallback everywhere else in the suite.
    TableManager.deltaAvailable(spark) shouldBe false
  }

  test("USING DELTA branch: CREATE OR REPLACE + append write (runs only with Delta on classpath)") {
    assume(TableManager.deltaAvailable(spark),
      "delta-spark not on classpath — USING DELTA branch exercised only when available")
    val tm = new TableManager(spark)
    tm.format shouldBe "DELTA"
    val cfg = SinkTableConfig("delta_gate_probe", "demo", mode = "overwrite")
    // overwrite on Delta must take the transactional CREATE OR REPLACE
    // path (no DROP, no directory delete)
    tm.createTable(cfg)
    spark.sql("DESCRIBE DETAIL demo.delta_gate_probe")
      .select("format").first().getString(0).toLowerCase should include("delta")
    import spark.implicits._
    Seq(("r1", "GET")).toDF("request_id", "method")
      .write.format("delta").mode("append")
      .saveAsTable("demo.delta_gate_probe_rows")
    spark.table("demo.delta_gate_probe_rows").count() shouldBe 1L
  }
}
