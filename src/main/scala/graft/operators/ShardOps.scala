package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryPack}

/** Packed token-ID training shards — the file a trainer actually loads
  * (VERDICT r11 task 1: the q_pipeline_shards manifest describes bins;
  * this WRITES the binned id rows and reads them back).
  *
  * Composition of three oracle-verified pieces: the BPE subword-id
  * stream ([[BpeOps.subwordIdRows]], the q_text_bpe_ids plan), the
  * q_pipeline_shards fixed-budget packing rule (per-shard running
  * position → integer-division bin), and the q_sink_partitioned
  * hive-layout write (one directory per shard, partition-pruned reads).
  * The reference's whole purpose is "persist the processed deliverable"
  * (`/root/reference/src/mining/utils/load.py:45-55`); this is that
  * step at training-pipeline scale.
  *
  * Scale shape: the id stream is a map + two broadcast joins (never a
  * corpus×corpus join); packing is ONE shuffle on `shard` with a
  * per-shard sort (shard count is the parallelism knob — 8 at fixture
  * scale, thousands at 100 TB, each shard's sort is 1/N of the corpus
  * and spillable); the write reuses the shard partitioning as the
  * hive layout, so a training job reading `shard=k` plans exactly one
  * directory (PartitionFilters, zero cross-shard I/O). Row width is
  * fixed at [[SeqLen]] ids, per-shard tails excepted — the contract
  * ShardSpec pins.
  */
object ShardOps extends QueryPack {

  /** Fixed training-row length (ids per packed row). */
  private[graft] val SeqLen = 512

  /** Shard count — the parallelism/layout knob (thousands at 100 TB). */
  private[graft] val NShards = 8

  /** Collision-proof per-corpus artifact dir — the shared
    * full-path-hash scheme (r11 basename-collision rule), one
    * implementation for every artifact family. */
  private[graft] def shardDir(d: String): String =
    graft.streaming.StreamingOps.indexArtifactDir("shard_ids", d).toString

  private val shardWrite = QueryDef(
    "q_shard_write",
    (s, d) => {
      import s.implicits._
      val ids = BpeOps.subwordIdRows(s, d)
        .withColumn("shard", pmod($"doc_id", lit(NShards.toLong)))
      // Per-shard total order (doc_id, pos, subpos) → running token
      // index. A per-SHARD sort, not a global one: the window partitions
      // on the layout key, so each sort is corpus/NShards and the whole
      // pack is one exchange (the q_pipeline_shards window rule).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"shard").orderBy($"doc_id", $"pos", $"subpos")
      val packed = ids
        .withColumn("tok_idx", row_number().over(w).cast("long") - 1L)
        // integer division — exact past 2^53 cumulative tokens (the
        // q_pipeline_shards ADVICE r11 rule); operands non-negative
        .withColumn("seq_idx", expr(s"tok_idx div $SeqLen"))
        .withColumn("pos_in_seq", pmod($"tok_idx", lit(SeqLen.toLong)))
        .groupBy($"shard", $"seq_idx")
        .agg(count(lit(1)).cast("long").as("n_ids"),
          array_join(
            transform(array_sort(collect_list(struct($"pos_in_seq", $"tid"))),
              x => x.getField("tid").cast("string")), ",").as("ids_str"),
          countDistinct($"doc_id").as("n_docs"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
      val dir = shardDir(d)
      packed.write.mode("overwrite").partitionBy("shard").parquet(dir)
      // Declared result = the READ-BACK, so the oracle hash proves the
      // whole tokenize → pack → write → read chain. The hive partition
      // column comes back as INT (partition inference) — cast to long.
      s.read.parquet(dir)
        .select($"shard".cast("long").as("shard"), $"seq_idx", $"n_ids",
          $"n_docs", $"first_doc", $"last_doc", $"ids_str")
        .orderBy($"shard", $"seq_idx")
    },
    Some(s"""WITH ${BpeOps.subwordIdCtes},
      t AS (SELECT doc_id, pos, subpos, tid, doc_id % $NShards AS shard
        FROM ids),
      ord AS (SELECT shard, doc_id, tid,
          row_number() OVER (PARTITION BY shard
            ORDER BY doc_id, pos, subpos) - 1 AS tok_idx
        FROM t)
      SELECT CAST(shard AS BIGINT) AS shard,
        CAST(tok_idx // $SeqLen AS BIGINT) AS seq_idx,
        CAST(count(*) AS BIGINT) AS n_ids,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        array_to_string(list(CAST(tid AS VARCHAR) ORDER BY tok_idx), ',')
          AS ids_str
      FROM ord GROUP BY 1, 2 ORDER BY shard, seq_idx"""),
    "Packed token-ID training shards: BPE subword-id stream packed into " +
      s"fixed-$SeqLen-id rows per shard, written hive-partitioned and " +
      "read back — the tokenize->pack->write->read chain under one hash")

  override def defs: Seq[QueryDef] = Seq(shardWrite)
}
