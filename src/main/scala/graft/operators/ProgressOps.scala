package graft.operators

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** Replay progress reporting (SURVEY.md §2 E2/E5): the reference surfaces a
  * `NotifyProgressAsync` callback per fetched page so a long replay is
  * observable and resumable (CassandraEventStore.cs:458,462-472). Spark's
  * unit of incremental progress is the task; this listener maps completed
  * tasks + their output row counts onto the same callback shape.
  *
  * Resumability needs no token on the batch path — deterministic recompute
  * and (for streams) checkpoints replace Cassandra paging states — so the
  * callback carries (tasksDone, rowsSeen) instead of an opaque token.
  */
object ProgressOps {

  final case class Progress(tasksDone: Long, rowsSeen: Long)

  /** Run `action` on `df` while reporting per-task progress; returns the
    * action's result. The listener is removed afterwards. */
  def withProgress[T](df: DataFrame, onProgress: Progress => Unit)(action: DataFrame => T): T = {
    val sc = df.sparkSession.sparkContext
    val tasks = new AtomicLong(0)
    val rows = new AtomicLong(0)
    val error = new AtomicReference[Throwable]()
    val listener = new SparkListener {
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
        val t = tasks.incrementAndGet()
        val r = Option(taskEnd.taskMetrics)
          .map(_.outputMetrics.recordsWritten + taskEnd.taskMetrics.shuffleWriteMetrics.recordsWritten)
          .getOrElse(0L)
        val total = rows.addAndGet(r)
        try onProgress(Progress(t, total))
        catch { case e: Throwable => error.compareAndSet(null, e) }
      }
    }
    sc.addSparkListener(listener)
    try action(df)
    finally {
      // listener-bus delivery is async; give trailing task-end events a
      // moment to drain before detaching (the bus has no public flush)
      Thread.sleep(200)
      sc.removeSparkListener(listener)
      val e = error.get()
      if (e != null) throw e
    }
  }
}
