package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-store delete log (deletion-vector pattern) for PACKED token
  * stores — r16, the works-once fix for stores whose rows carry no doc
  * membership.
  *
  * The derived indexes (band/posting) forget by filtering their own
  * rows, so the artifact itself remembers earlier deletes. The packed
  * shard stores CANNOT: their fixed-width rows deliberately carry no
  * per-token doc ids (trainer-format design), so a forget re-derives
  * affected partitions from the SOURCE — and the source still contains
  * every doc an earlier forget removed. Until r16 that meant
  * forget(p2) resurrected forget(p1)'s docs wherever their partitions
  * overlapped; latent on every single-delete fixture, exposed by the
  * periodic-lifecycle harness.
  *
  * The store therefore keeps a `_tombstones` log INSIDE its directory
  * (underscore-prefixed — invisible to every parquet read of the
  * store, like `_forget_stage`; travels with file-level copies, dies
  * with an overwrite-rebuild): one doc_id per deleted doc, appended
  * BEFORE the rewrite and anti-joined into every survivor derivation.
  * Record-first ordering makes a crashed delete conservative: the ids
  * are tombstoned but still physically present until the retry (the
  * delete is not acknowledged until the rewrite completes), and both
  * the record (duplicates collapse under the distinct read) and the
  * rewrite are idempotent, so a retry of the same delete set always
  * converges — the same discipline as the compacted-store forget's
  * marker protocol.
  *
  * Scale shape: O(total deleted ids) narrow rows, read as one distinct
  * and broadcast into the anti-join when small (the common case) —
  * the standard deletion-vector cost, never a store scan.
  */
object Tombstones {

  private def dirOf(store: String): java.nio.file.Path =
    java.nio.file.Paths.get(store).resolve("_tombstones")

  private def exists(store: String): Boolean = {
    val d = dirOf(store).toFile
    d.isDirectory && d.listFiles().exists(_.getName.startsWith("part-"))
  }

  /** Append `ids` (a one-column doc_id relation) to the store's delete
    * log. Idempotent under retry: the read collapses duplicates. */
  def record(s: SparkSession, store: String, ids: DataFrame): Unit =
    ids.select(col("doc_id").cast("long").as("doc_id"))
      .coalesce(1)
      .write.mode("append").parquet(dirOf(store).toString)

  /** Drop the log (a fresh build owes no history to the old store). */
  def reset(store: String): Unit = graft.Fs.deleteRecursively(dirOf(store))

  /** Deterministic fingerprint of the current tombstoned-id SET
    * (count + sum + xor over the distinct ids — order-free, so any
    * replayed/duplicated append states agree). Bounded: one 1-row
    * aggregate over the narrow log. The compacted-store forget stamps
    * its `_forget_committed` marker with this, so a stage built under
    * a DIFFERENT delete state is detectable as stale. (count, sum, xor)
    * is not collision-proof against an adversarial id set — but the
    * states being distinguished are successive delete logs of ONE
    * store, where any difference perturbs all three aggregates
    * independently; an accidental collision would need two distinct
    * delete histories agreeing on all three, and the failure mode it
    * guards (installing a stage built under the wrong delete state)
    * also requires a crash in the same window. The alternative — an
    * order-insensitive cryptographic set hash — needs either a
    * driver-side id collect (unbounded) or a per-id hash SUM, which is
    * the same algebraic shape with bigger constants. */
  def fingerprint(s: SparkSession, store: String): String =
    if (!exists(store)) "empty"
    else {
      val r = s.read.parquet(dirOf(store).toString)
        .select(col("doc_id")).distinct()
        .agg(count(lit(1)), sum(col("doc_id")), expr("bit_xor(doc_id)"))
        .head()
      s"${r.get(0)}:${r.get(1)}:${r.get(2)}"
    }

  /** Restrict `df` to rows whose `doc_id` is not tombstoned. */
  def without(s: SparkSession, store: String, df: DataFrame): DataFrame =
    if (!exists(store)) df
    else df.join(
      s.read.parquet(dirOf(store).toString).select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
}
