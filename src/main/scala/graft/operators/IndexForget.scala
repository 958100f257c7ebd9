package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE RTBF rewrite for generation-partitioned derived indexes
  * (media/audio band indexes, the embedding ANN index, the posting
  * index and its manifest) — r16, the works-once lesson promoted into
  * shared machinery.
  *
  * Until r16 every index forget re-derived an affected generation from
  * its SOURCE slice filtered by the current delete predicate. Correct
  * once — and a resurrection bug the second time: the source still
  * contains the docs an EARLIER forget removed, so rewriting a
  * generation for delete #2 silently re-admitted delete #1's ids.
  * Latent on every single-delete fixture; the PeriodicLifecycleSpec
  * harness (VERDICT r15 task 6) is what exposed it.
  *
  * The fix is to treat the ARTIFACT as the current truth: a derived
  * index's rows carry their ids, so a forget needs no re-derivation at
  * all — each affected generation is the generation's CURRENT rows
  * anti-joined against the delete set, lineage-broken (localCheckpoint
  * — we overwrite the very partition we read), and swapped in with
  * dynamic partition overwrite. Survivors' rows are carried byte-for-
  * byte (nothing is re-encoded or re-hashed — strictly stronger than
  * the old "deleted payloads never hashed": now NO payload is), and
  * forgets compose: forget(p1) ∘ forget(p2) ≡ forget(p1 ∨ p2).
  *
  * Scale shape: per affected generation, one narrow scan of that
  * generation + an anti-join against the delete-set relation (broadcast
  * when the delete set is small — the common case); untouched
  * generations keep their files byte-identical. A generation whose
  * every id was deleted is dropped at the directory level (the dynamic-
  * overwrite zero-row gap, same as the packed stores' forgets).
  */
object IndexForget {

  /** Rewrite `affected` generations of the index at `dir`, keeping only
    * rows whose `idCol` is NOT in `delIds` (a one-column relation named
    * `idCol`). `dataCols` is the artifact's data-column order (the
    * written schema; `gen` stays the partition column).
    *
    * ONE pass over all affected generations (r16 optimization): the old
    * per-generation loop paid [scan + anti-join + checkpoint + write]
    * per generation — 3 sequential Spark jobs each. All generations are
    * partition-pruned in one scan (`gen IN affected`), anti-joined once,
    * checkpointed once, and swapped in with one dynamic-partition
    * overwrite (guide §1.2: remove passes before tuning inside them).
    * Per-generation content is unchanged — the anti-join is row-local
    * and `gen` rides along as the partition column, so each gen=g
    * directory receives exactly the rows the old per-g rewrite wrote. */
  def filterInPlace(s: SparkSession, dir: String, idCol: String,
      dataCols: Seq[String], affected: Seq[Int],
      delIds: DataFrame): Unit = {
    import s.implicits._
    if (affected.isEmpty) return
    val surviving = s.read.parquet(dir)
      .filter(col("gen").isin(affected: _*))
      .join(delIds, Seq(idCol), "left_anti")
      .select(dataCols.map(col) :+ col("gen").cast("int").as("gen"): _*)
      .localCheckpoint()
    // generations with no survivors get no partition from the dynamic
    // overwrite — drop their stale directories explicitly (the same
    // zero-row gap the per-generation loop handled with isEmpty)
    val present = surviving.select(col("gen"))
      .distinct().as[Int].collect().toSet
    if (present.nonEmpty)
      surviving.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gen").parquet(dir)
    affected.filterNot(present).foreach(g =>
      graft.Fs.deleteRecursively(
        java.nio.file.Paths.get(dir).resolve(s"gen=$g")))
  }
}
