package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared candidate-pair kernel of the near-dup tier: an inverted
  * index grouped by key, each posting list cut into ≤`cap`-element blocks
  * ([[graft.functions.BlockSplit]]), bucket rows redistributed across
  * tasks, pairs streamed per bucket ([[graft.functions.BlockPairs]]).
  *
  * Shape at scale (the reason this helper exists — VERDICT r6 task 2):
  *   Exchange(key) → collect sorted postings      (the inverted index)
  *   → block_split → Exchange(key, b1, b2)        (buckets to tasks)
  *   → block_pairs → downstream aggregation       (≤ ~cap² pairs/task)
  * One hot key no longer serializes its Σ df² emission into one task;
  * the forced second exchange is what buys the distribution, and it
  * moves only ~posting-volume bytes while df ≤ cap.
  *
  * The collect_list aggregation buffer is non-spillable (unlike the
  * sort-merge self-join this kernel replaced, which buffered per-key
  * groups in a spillable ExternalAppendOnlyUnsafeRowArray) — the grouped
  * posting for ONE key must fit an executor's heap. That is the honest
  * trade-off of the join-free formulation (ADVICE r6): acceptable because
  * a posting list is df·16 bytes (a df-10⁶ stop-word shingle is 16 MB,
  * large but not fatal), and because callers with unbounded-df exposure
  * (the ngram family) pair this kernel with a prefix filter or df
  * ceiling upstream. The cap bounds per-TASK pair emission, not the
  * per-key buffer.
  */
object PairStreams {

  /** Per-task posting block bound: ≤ ~2048² ≈ 4.2M pairs per bucket row.
    * Fixture keys sit far below it (the split degenerates to one intra
    * row); a 10×-stress hot shingle crosses it and fans out. */
  val DefaultBlockCap = 2048

  /** The ordered (dn_i < dn_j positional) pair multiset of every per-key
    * posting group of `posting`, as columns `outNames` = (id1, n1, id2,
    * n2). `dn` must be a struct<long,long> column; null dn entries are
    * dropped (collect_list semantics, same as the pre-blocked kernel). */
  def blockedPairs(posting: DataFrame, keys: Seq[Column], dn: Column,
      outNames: Seq[String], cap: Int = DefaultBlockCap): DataFrame =
    bucketRows(posting, keys, dn, cap)
      .select(graft.functions.BlockedPairs
        .block_pairs(col("l_id"), col("l_n"), col("r_id"), col("r_n"))
        .as(outNames))

  /** The intermediate bucket rows, post-redistribution — exposed so the
    * hot-shingle spec can assert >1 task handles one key's emission. */
  private[graft] def bucketRows(posting: DataFrame, keys: Seq[Column],
      dn: Column, cap: Int): DataFrame = {
    val keyNames = keys.indices.map(i => s"_k$i")
    val keyed = posting.select(
      keys.zip(keyNames).map { case (c, n) => c.as(n) } :+ dn.as("_dn"): _*)
    keyed
      .groupBy(keyNames.map(col): _*)
      .agg(sort_array(collect_list(col("_dn"))).as("_docs"))
      .select(keyNames.map(col) :+
        graft.functions.BlockedPairs.block_split(col("_docs"), cap)
          .as(Seq("b1", "b2", "l_id", "l_n", "r_id", "r_n")): _*)
      // FORCED exchange with an EXPLICIT partition count: clustering by
      // key alone already satisfies the downstream distribution, so
      // without the repartition the bucket rows of a hot key would stay
      // in the task that aggregated it — the exact straggler this kernel
      // exists to break up. The count is pinned (REPARTITION_BY_NUM)
      // because AQE's byte-based coalescing would legally re-merge the
      // small bucket ROWS into one partition while being blind to their
      // ~cap²-pair EMISSION cost — the skew here is in the generator
      // output, which no input-size statistic sees.
      .repartition(numShufflePartitions(posting), keyNames.map(col) :+ col("b1") :+ col("b2"): _*)
  }

  private def numShufflePartitions(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
}
