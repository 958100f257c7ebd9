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
    * written schema; `gen` is re-attached as the partition column). */
  def filterInPlace(s: SparkSession, dir: String, idCol: String,
      dataCols: Seq[String], affected: Seq[Int],
      delIds: DataFrame): Unit = {
    import s.implicits._
    affected.foreach { g =>
      val surviving = s.read.parquet(dir)
        .filter(col("gen") === g)
        .join(delIds, Seq(idCol), "left_anti")
        .select(dataCols.map(col): _*)
        .localCheckpoint()
      if (surviving.isEmpty)
        graft.Fs.deleteRecursively(
          java.nio.file.Paths.get(dir).resolve(s"gen=$g"))
      else
        surviving.withColumn("gen", lit(g))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("gen").parquet(dir)
    }
  }
}
