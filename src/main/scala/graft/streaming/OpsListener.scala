package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Failure-path observability for streaming queries — the engine's analog
  * of the reference's operational hooks (O17: Airflow `retries` +
  * `email_on_failure`, main.py:27-56). Airflow alerts when a DAG run
  * dies; a Structured Streaming job's equivalent signals are the
  * per-batch progress events and the terminated-with-exception event, so
  * this listener surfaces exactly those:
  *
  *  - onQueryProgress: one log line per micro-batch with the health
  *    numbers an operator pages on at scale — input rows, processing
  *    rate, state-store rows, and rows dropped as too-late by the
  *    watermark (silent data loss if unmonitored).
  *  - onQueryTerminated: ERROR log on abnormal termination (the
  *    email_on_failure analog — the log backend is where a real cluster
  *    attaches its alerting).
  *
  * Events are also kept in a bounded in-memory journal so harness code
  * (and the spec) can assert on them; on a real cluster the log lines are
  * the product and the journal is a debugging convenience.
  */
class OpsListener extends StreamingQueryListener with Logging {

  /** One micro-batch health record. */
  final case class BatchHealth(
      queryName: String, batchId: Long, numInputRows: Long,
      stateRows: Long, lateRowsDropped: Long, watermark: String)

  private val journalMax = 256
  private val journal = new ConcurrentLinkedQueue[BatchHealth]()
  @volatile private var failures: List[String] = Nil
  @volatile private var started = 0
  @volatile private var terminated = 0

  override def onQueryStarted(event: QueryStartedEvent): Unit = {
    started += 1
    logInfo(s"stream started: ${event.name} id=${event.id}")
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val late = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
    val rec = BatchHealth(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
      stateRows, late, p.eventTime.asScala.getOrElse("watermark", "-"))
    journal.add(rec)
    while (journal.size > journalMax) journal.poll()
    logInfo(s"stream batch: name=${rec.queryName} batch=${rec.batchId} " +
      s"in=${rec.numInputRows} stateRows=${rec.stateRows} " +
      s"lateDropped=${rec.lateRowsDropped} watermark=${rec.watermark}")
    if (late > 0)
      logWarning(s"stream ${rec.queryName} batch ${rec.batchId}: " +
        s"$late rows dropped as later than the watermark")
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    terminated += 1
    event.exception match {
      case Some(e) => // email_on_failure analog: alert-level log
        failures = s"query ${event.id}: $e" :: failures
        logError(s"stream FAILED: id=${event.id} cause=$e")
      case None =>
        logInfo(s"stream stopped cleanly: id=${event.id}")
    }
  }

  // ------------------------------------------------ harness/spec surface
  def batches: Seq[BatchHealth] = journal.asScala.toSeq
  def failureMessages: Seq[String] = failures.reverse
  def startedCount: Int = started
  def terminatedCount: Int = terminated
}

object OpsListener {
  /** Attach a fresh listener to the session and return it (caller removes
    * it via detach when done — listeners are session-global). */
  def attach(spark: SparkSession): OpsListener = {
    val l = new OpsListener
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: OpsListener): Unit =
    spark.streams.removeListener(l)

  /** Free in-flight data-quality metrics via `Dataset.observe`: row
    * count, null count of a watched column, and its sum — collected by
    * the executors WHILE the action runs (no second pass over the data,
    * unlike a separate `.count()`/`.agg()` audit — the difference between
    * one scan and two at 100 TB). Read the result from the returned
    * Observation after the next action completes. */
  def observeQuality(df: org.apache.spark.sql.DataFrame, name: String,
      watch: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Observation) = {
    import org.apache.spark.sql.functions._
    val obs = org.apache.spark.sql.Observation(name)
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(col(watch).isNull.cast("long")).as("n_null"),
      sum(col(watch).cast("double")).as("sum_watch"))
    (observed, obs)
  }
}
