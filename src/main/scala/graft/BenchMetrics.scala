package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-metric accumulator shared by the scale benches' attribution
  * modes: aggregates executor run time, GC, spill, shuffle and I/O bytes
  * across tasks; [[snapshot]]/[[delta]] bracket a phase. All tasks run in
  * this JVM (local mode), so jvmGCTime is the executor-thread GC bill. */
final class BenchMetrics extends SparkListener {
  final case class Snap(taskMs: Long, gcMs: Long, spillMemB: Long,
      spillDiskB: Long, shufReadB: Long, shufWriteB: Long,
      inputB: Long, outputB: Long)
  private var cur = Snap(0, 0, 0, 0, 0, 0, 0, 0)
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
    val m = e.taskMetrics
    if (m != null) cur = Snap(
      cur.taskMs + m.executorRunTime, cur.gcMs + m.jvmGCTime,
      cur.spillMemB + m.memoryBytesSpilled, cur.spillDiskB + m.diskBytesSpilled,
      cur.shufReadB + m.shuffleReadMetrics.totalBytesRead,
      cur.shufWriteB + m.shuffleWriteMetrics.bytesWritten,
      cur.inputB + m.inputMetrics.bytesRead,
      cur.outputB + m.outputMetrics.bytesWritten)
  }
  def snapshot(): Snap = synchronized(cur)
  def delta(a: Snap, b: Snap): Snap = Snap(b.taskMs - a.taskMs,
    b.gcMs - a.gcMs, b.spillMemB - a.spillMemB, b.spillDiskB - a.spillDiskB,
    b.shufReadB - a.shufReadB, b.shufWriteB - a.shufWriteB,
    b.inputB - a.inputB, b.outputB - a.outputB)

  /** Wait until the async listener stream goes quiet (two identical
    * 200 ms-apart snapshots), then return the settled snapshot. */
  def settled(): Snap = {
    var prev = snapshot()
    var done = false
    var tries = 0
    while (!done && tries < 50) {
      Thread.sleep(200)
      val s = snapshot()
      done = s == prev
      prev = s
      tries += 1
    }
    snapshot()
  }

  /** Render a phase delta as the one-line attribution row both scale
    * benches print. */
  def row(label: String, wallSec: Double, d: Snap): String =
    f"[phase] $label%-22s wall=$wallSec%7.1fs task=${d.taskMs / 1e3}%8.1fs " +
      f"gc=${d.gcMs / 1e3}%6.1fs spill=${d.spillDiskB / 1e9}%6.2fGB " +
      f"shufR=${d.shufReadB / 1e9}%6.2fGB shufW=${d.shufWriteB / 1e9}%6.2fGB " +
      f"in=${d.inputB / 1e9}%6.2fGB out=${d.outputB / 1e9}%6.2fGB"
}
