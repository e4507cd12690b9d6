package org.apache.spark.sql.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-level input-bytes meter for the scale probes: sums
  * `taskMetrics.inputMetrics.bytesRead` (datasource/file reads — shuffle
  * and block-manager traffic excluded) across every task that completes
  * while `body` runs. Lives in a child package of `org.apache.spark`
  * because draining the listener bus before reading the counter
  * (`listenerBus.waitUntilEmpty`) is `private[spark]` — without the
  * drain, late task-end events would race the read and the probe would
  * under-count nondeterministically.
  */
object InputBytesMeter {

  def measure[T](sc: SparkContext)(body: => T): (T, Long) = {
    val (r, b, _) = measureIO(sc)(body)
    (r, b)
  }

  /** Bytes AND records. CAVEAT measured in-repo: on a LOCAL filesystem
    * the vectorized parquet reader's `bytesRead` captures footer/
    * metadata I/O but not the column-chunk payload (a full aggregate
    * over a 3.4 MB store registered 387 KB), so bytesRead there tracks
    * FILE COUNT more than data volume. `recordsRead` is exact — the
    * honest scale proxy for "how much of the store did this read touch"
    * on local runs; on HDFS/object stores bytesRead is the real number.
    */
  def measureIO[T](sc: SparkContext)(body: => T): (T, Long, Long) = {
    val (r, ib, irows, _) = measureRW(sc)(body)
    (r, ib, irows)
  }

  /** Input AND output: (result, bytesRead, recordsRead, bytesWritten).
    * `outputMetrics.bytesWritten` counts the datasource files tasks
    * commit — unlike the read side, it IS the payload on local FS, so
    * it is the honest "bytes this mutation wrote" axis for the
    * write-path probes (staged rewrites and appends alike, whichever
    * path the operator takes). */
  def measureRW[T](sc: SparkContext)(body: => T): (T, Long, Long, Long) = {
    val bytes = new AtomicLong(0L)
    val records = new AtomicLong(0L)
    val outBytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.inputMetrics.bytesRead)
          records.addAndGet(m.inputMetrics.recordsRead)
          outBytes.addAndGet(m.outputMetrics.bytesWritten)
          ()
        }
      }
    }
    sc.addSparkListener(listener)
    try {
      val result = body
      sc.listenerBus.waitUntilEmpty()
      (result, bytes.get(), records.get(), outBytes.get())
    } finally sc.removeSparkListener(listener)
  }
}
