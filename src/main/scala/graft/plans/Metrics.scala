package graft.plans

import org.apache.spark.graft.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
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

  /** Task-metrics aggregator with a row ticker (xml.py:64-65 analog).
    * With `jobGroup` set, only tasks of jobs carrying that group id are
    * counted — a listener on the shared SparkContext otherwise sees EVERY
    * concurrent workload's tasks (a streaming query or a second stage in
    * the same session would pollute the "exact" snapshot). */
  final class Progress(tickEveryRows: Long = 10000,
      report: String => Unit = s => Console.err.print(s),
      jobGroup: Option[String] = None) extends SparkListener {
    private val rowsRead = new AtomicLong
    private val bytesRead = new AtomicLong
    private val rowsWritten = new AtomicLong
    private val bytesWritten = new AtomicLong
    private val tasks = new AtomicLong
    private val lastTick = new AtomicLong
    private val trackedStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

    override def onJobStart(jobStart: SparkListenerJobStart): Unit =
      if (jobGroup.exists(g => g == Option(jobStart.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull))
        jobStart.stageIds.foreach(id => trackedStages.add(id))

    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      if (jobGroup.isDefined && !trackedStages.contains(taskEnd.stageId)) return
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
    * reflect every finished task of the measured jobs. The body's jobs run
    * under a unique JOB GROUP and only that group's tasks are counted, so
    * concurrent workloads on the same SparkContext (streaming queries,
    * other stages) cannot pollute the snapshot. The caller's prior job
    * group (thread-local) is restored afterwards. */
  def measure[T](spark: SparkSession, tickEveryRows: Long = 10000,
      report: String => Unit = s => Console.err.print(s))(body: => T): (T, Snapshot) = {
    val sc = spark.sparkContext
    val group = s"graft-metrics-${System.nanoTime()}"
    val listener = new Progress(tickEveryRows, report, jobGroup = Some(group))
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    val prevDesc = sc.getLocalProperty("spark.job.description")
    // setJobGroup also writes this thread-local; leaving it behind as
    // "false" would silently override a caller's configured
    // interrupt-on-cancel for every later job on this thread
    val prevInterrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    sc.addSparkListener(listener)
    sc.setJobGroup(group, "Metrics.measure", interruptOnCancel = false)
    val t0 = System.currentTimeMillis()
    try {
      val result = body
      ListenerBridge.waitUntilListenerBusEmpty(sc)
      (result, listener.snapshot(System.currentTimeMillis() - t0))
    } finally {
      sc.setLocalProperty("spark.jobGroup.id", prevGroup)
      sc.setLocalProperty("spark.job.description", prevDesc)
      sc.setLocalProperty("spark.job.interruptOnCancel", prevInterrupt)
      sc.removeSparkListener(listener)
    }
  }
}
