package graft

import org.apache.spark.sql.internal.SQLConf

/** Pins the claim in Bench.scala's split-sizing comment: the two knobs the
  * bench retunes for sub-MB sf0.1 files (maxPartitionBytes=128 KB, coalesce
  * minPartitionSize=64 KB) really do default to 128 MB / 1 MB in an
  * UNCONFIGURED session — i.e. a production deploy gets the documented
  * sizing back simply by not setting them. If a Spark upgrade moves these
  * defaults, this spec fails and the Bench comment must be re-verified.
  */
class BenchSizingSpec extends SparkSpec {
  test("unconfigured split sizing defaults to 128 MB splits / 1 MB coalesce floor") {
    // The shared test session deliberately sets NEITHER knob (only
    // Bench.scala does), so reading them here reads Spark's defaults.
    val conf = spark.sessionState.conf
    assert(conf.filesMaxPartitionBytes === 128L * 1024 * 1024)
    assert(conf.getConf(SQLConf.COALESCE_PARTITIONS_MIN_PARTITION_SIZE) === 1024L * 1024)
  }
}
