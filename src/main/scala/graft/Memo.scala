package graft

import org.apache.spark.sql.DataFrame

/** Size-capped LRU memos for the engine's per-(context, corpus) shared
  * materializations (VERDICT r9 task 4).
  *
  * The unbounded TrieMap memos the round-9 engine used are correct for
  * the bench/verify harness (one corpus per application) but are an
  * unbounded leak in a long-lived multi-corpus service: each entry pins
  * a localCheckpointed DataFrame's executor blocks (or a pooled
  * session's state) for the life of the application. [[Memo.Bounded]]
  * keeps the most-recently-used `cap` entries and hands everything it
  * evicts to an `onEvict` cleanup — for checkpointed DataFrames,
  * [[Memo.releaseLocalCheckpoint]] unpersists the underlying RDD blocks.
  *
  * The production story is unchanged: a real pipeline persists these
  * intermediates as parquet between stages; the memo only bounds what
  * the in-process fast path can pin.
  */
object Memo {

  /** LRU map with at most `cap` live values; `get`/`getOrElseUpdate`
    * refresh recency. Eviction calls `onEvict` on the removed value
    * (exceptions swallowed — cleanup must never fail the compute path).
    * The monitor is held across `mk`, which serializes builders — the
    * intended behavior for the expensive shared materializations this
    * guards (two racing builders would double-compute AND double-pin). */
  final class Bounded[K, V](cap: Int, onEvict: V => Unit) {
    require(cap >= 1, s"memo cap must be >= 1, got $cap")
    private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true)

    def getOrElseUpdate(k: K)(mk: => V): V = synchronized {
      val hit = m.get(k)
      if (hit != null || m.containsKey(k)) hit
      else {
        val v = mk
        m.put(k, v)
        while (m.size > cap) {
          val it = m.entrySet().iterator()
          val eldest = it.next()
          it.remove()
          // best-effort cleanup may fail (a dead session's checkpoint
          // release), but fatal errors (OOM, interrupt) must propagate —
          // swallowing an InterruptedException would also lose the
          // thread's interrupt status (ADVICE r10)
          try onEvict(eldest.getValue)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt(); throw ie
            case scala.util.control.NonFatal(_) => ()
          }
        }
        v
      }
    }

    def get(k: K): Option[V] = synchronized(Option(m.get(k)))
    def size: Int = synchronized(m.size)

    /** Snapshot of the live values (no recency refresh). */
    def values: Seq[V] = synchronized {
      import scala.jdk.CollectionConverters._
      m.values.asScala.toSeq
    }

    /** Drop (and clean up) every entry — test/shutdown hook. */
    def clear(): Unit = synchronized {
      m.values.forEach(v => try onEvict(v) catch {
        case ie: InterruptedException =>
          Thread.currentThread().interrupt(); throw ie
        case scala.util.control.NonFatal(_) => ()
      })
      m.clear()
    }
  }

  /** Release the executor blocks a `localCheckpoint()`ed DataFrame pins:
    * the checkpoint materializes as a persisted RDD wrapped in a
    * LogicalRDD leaf — unpersisting that RDD frees the blocks. Safe on
    * any DataFrame (non-checkpointed plans simply have no LogicalRDD
    * leaves; non-blocking unpersist never throws on released RDDs). */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
