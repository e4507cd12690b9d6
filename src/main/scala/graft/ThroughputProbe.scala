package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.config._
import graft.exec.PartitionExecutor
import graft.testkit.MockApiServer

/** Pure HTTP-stage throughput probe: drives PartitionExecutor's
  * mapPartitions function directly (no Spark job, no parquet write) against
  * the in-JVM mock API — isolates the engine's per-partition request
  * pipeline from cluster overheads. Prints one JSON line with requests/sec
  * for 1 and N simulated partitions.
  *
  * Usage: runMain graft.ThroughputProbe [rows] [concurrency] [partitions]
  */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toInt).getOrElse(20000)
    val concurrency = args.lift(1).map(_.toInt).getOrElse(64)
    val partitions = args.lift(2).map(_.toInt).getOrElse(8)

    val server = new MockApiServer().start()
    try {
      val cfg = PipelineConfig(
        endpoint = EndpointConfig("probe", server.baseUrl, "/api/data"),
        auth = NoAuth,
        middleware = Seq(JsonBodyConfig),
        tables = TablesConfig(None, SinkTableConfig("probe", "probe"),
          Seq(ColumnMapping("request_id", Some("id")))),
        execution = ExecutionConfig(maxConcurrentRequests = concurrency))
      val schema = StructType(Seq(StructField("request_id", StringType)))
      def rowsIter(offset: Int, n: Int): Iterator[Row] =
        (0 until n).iterator.map(i =>
          new GenericRowWithSchema(Array(s"r${offset + i}"), schema))

      def run(parts: Int): Double = {
        val perPart = rows / parts
        val t0 = System.nanoTime()
        val threads = (0 until parts).map { p =>
          val t = new Thread(() => {
            val fn = PartitionExecutor.makeFn(cfg, None)
            val n = fn(rowsIter(p * perPart, perPart)).count(_ => true)
            require(n == perPart, s"partition $p produced $n of $perPart rows")
          })
          t.start(); t
        }
        threads.foreach(_.join())
        rows / ((System.nanoTime() - t0) / 1e9)
      }

      run(partitions) // warm-up (connections, codegen of nothing — JIT)
      val single = run(1)
      val multi = run(partitions)
      println(f"""{"metric":"http_stage_rps","rows":$rows,"concurrency":$concurrency,"partitions":$partitions,"rps_single_partition":$single%.0f,"rps_multi_partition":$multi%.0f}""")
    } finally server.stop()
  }
}
