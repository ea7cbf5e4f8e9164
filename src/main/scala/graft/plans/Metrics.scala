package graft.plans

import org.apache.spark.graft.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/**
 * Live progress metrics (SURVEY.md MET-1): the Spark re-expression of the
 * reference's byte-percentage progress + 10k-row ticker
 * (/root/reference/ru_address/common.py:63-84, source/xml.py:64-65).
 *
 * A `SparkListener` aggregates executor task metrics (records/bytes read and
 * written) as tasks finish, emitting a ticker line every `tickEveryRows` rows
 * — the cluster analog of the reference's single-threaded row counter. The
 * final `Snapshot` is exact once the listener bus drains (measure() does).
 *
 * For per-stage EXACT counts inside a query plan, use `observe()`
 * (Dataset.observe + org.apache.spark.sql.Observation) — collected by the
 * driver at action completion with no plan change; Lineage's per-region row
 * counts complement both as the durable manifest.
 */
object Metrics {

  case class Snapshot(
      rowsRead: Long, bytesRead: Long,
      rowsWritten: Long, bytesWritten: Long,
      tasks: Long, wallMs: Long)

  /** Task-metrics aggregator with a row ticker (xml.py:64-65 analog). */
  final class Progress(tickEveryRows: Long = 10000,
      report: String => Unit = s => Console.err.print(s)) extends SparkListener {
    private val rowsRead = new AtomicLong
    private val bytesRead = new AtomicLong
    private val rowsWritten = new AtomicLong
    private val bytesWritten = new AtomicLong
    private val tasks = new AtomicLong
    private val lastTick = new AtomicLong

    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      val m = taskEnd.taskMetrics
      if (m != null) {
        val r = rowsRead.addAndGet(m.inputMetrics.recordsRead)
        bytesRead.addAndGet(m.inputMetrics.bytesRead)
        rowsWritten.addAndGet(m.outputMetrics.recordsWritten)
        bytesWritten.addAndGet(m.outputMetrics.bytesWritten)
        tasks.incrementAndGet()
        val tick = r / tickEveryRows
        // emit at most one ticker line per tickEveryRows boundary crossed
        if (tick > 0 && lastTick.getAndSet(tick) != tick)
          report(s"\r${tick * tickEveryRows}+ row")
      }
    }

    def snapshot(wallMs: Long): Snapshot = Snapshot(
      rowsRead.get, bytesRead.get, rowsWritten.get, bytesWritten.get,
      tasks.get, wallMs)
  }

  /** Run `body` with a Progress listener attached; returns (result, exact
    * snapshot) — the listener bus is drained before snapshotting, so counts
    * reflect every finished task of the measured jobs. */
  def measure[T](spark: SparkSession, tickEveryRows: Long = 10000,
      report: String => Unit = s => Console.err.print(s))(body: => T): (T, Snapshot) = {
    val listener = new Progress(tickEveryRows, report)
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    val t0 = System.currentTimeMillis()
    try {
      val result = body
      ListenerBridge.waitUntilListenerBusEmpty(sc)
      (result, listener.snapshot(System.currentTimeMillis() - t0))
    } finally sc.removeSparkListener(listener)
  }
}
