package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE id → (slice, shard, generation) addressing rule per store
  * family (VERDICT r14 task 3).
  *
  * Every generation-aligned store in the engine — the packed shard
  * store, the media/audio band indexes, the posting index — derives a
  * row's physical partition from the doc id ALONE: that is what makes
  * append a pure file add, forget a bounded partition rewrite, and
  * lineage a zero-store-scan computation. Until r15 each store
  * hand-rolled its rule inline, and that duplication shipped a real
  * bug: the family `doc_id % HoldoutMod == 0` delta split selects only
  * EVEN ids, so on the odd-id (WAV) modality it was vacuous — the
  * audio index's "incremental maintain" ran against an empty delta for
  * a round (fixed in `ea3ed50`). Centralizing the rules makes the next
  * store reuse a PROPERTY-TESTED rule (GenerationLayoutSpec sweeps
  * even/odd/astral id mixes and asserts every generation of every
  * layout is non-vacuously populated) instead of re-deriving one.
  *
  * The rules themselves are unchanged from the stores that shipped
  * them — this module is the single point of truth, not a migration.
  */
object GenerationLayout {

  /** id → shard: the pack-parallelism/layout key every packed store
    * shares (`extract.py`/`load.py` have no analog — sharding is the
    * 100 TB extension tier's addressing rule; thousands of shards in
    * production, [[ShardOps.NShards]] at fixture scale). */
  def shardOf(id: Column): Column = pmod(id, lit(ShardOps.NShards.toLong))

  /** One store family's addressing rule. `slice` picks the ids the
    * store holds at all (modality); `isDelta` — WITHIN the slice —
    * picks the delta-generation (gen 1) members. The base/delta split
    * must be non-vacuous on the slice: a rule that never (or always)
    * fires turns "incremental maintain" into a silent no-op — the
    * exact ea3ed50 bug class the property spec pins. */
  sealed abstract class Layout(val name: String) {
    def slice(id: Column): Column
    def isDelta(id: Column): Column

    /** Slice restriction of ONE generation (the base/delta split the
      * build and maintain passes filter by, BEFORE any per-row work). */
    def genSlice(id: Column, delta: Boolean): Column =
      if (delta) isDelta(id) else !isDelta(id)

    /** The generation an id's rows live in (long). */
    def genOf(id: Column): Column = when(isDelta(id), 1L).otherwise(0L)

    /** As [[genOf]] but int-typed — the band indexes partition on an
      * int gen column. */
    def genOfInt(id: Column): Column = when(isDelta(id), 1).otherwise(0)
  }

  /** The packed token-shard store and the posting index: all ids, the
    * family HoldoutMod split (every HoldoutMod-th id is the delta
    * ingest generation). */
  case object ShardStore extends Layout("shard_store") {
    def slice(id: Column): Column = lit(true)
    def isDelta(id: Column): Column = id % BpeOps.HoldoutMod === 0
  }

  /** The media (BMP) band index: even ids. The plain HoldoutMod rule is
    * non-vacuous here (HoldoutMod is even, so its multiples are a 1/5
    * subset of the even ids). */
  case object MediaIndex extends Layout("media_index") {
    def slice(id: Column): Column = id % 2 === 0
    def isDelta(id: Column): Column = id % BpeOps.HoldoutMod === 0
  }

  /** The audio (WAV) band index: odd ids. The plain HoldoutMod rule is
    * VACUOUS on odds (its multiples are all even) — the delta is every
    * HoldoutMod-th odd id by rank instead: rank of an odd id among the
    * odds is (id−1)/2, exact as a right-shift (ids are non-negative).
    * Same 1/HoldoutMod delta fraction, genuinely populated (ea3ed50). */
  case object AudioIndex extends Layout("audio_index") {
    def slice(id: Column): Column = id % 2 === 1
    def isDelta(id: Column): Column =
      pmod(shiftright(id - 1, 1), lit(BpeOps.HoldoutMod.toLong)) === 0
  }

  /** The embedding (Rademacher-SRP) band index: every vec_id — the
    * embeddings table is one vector per id, no modality split — with
    * the family HoldoutMod delta rule on the vec_id domain (dense
    * 0..N−1, so multiples of HoldoutMod are always populated). */
  case object EmbedIndex extends Layout("embed_index") {
    def slice(id: Column): Column = lit(true)
    def isDelta(id: Column): Column = id % BpeOps.HoldoutMod === 0
  }

  /** The STREAM-built shard store's generation rule: gen = the
    * micro-batch that admitted the doc. Not a static id rule in
    * general; the pinned two-file fixture landing zone admits
    * [0, midpoint) as batch 0 and the rest as batch 1, which is what
    * makes the streamed store's layout replayable by the oracles. */
  def streamGenOf(id: Column, midpoint: Long): Column =
    when(id < midpoint, 0L).otherwise(1L)

  /** Every static layout — the property spec sweeps this list, so a
    * store added here is non-vacuity-tested for free. */
  val all: Seq[Layout] = Seq(ShardStore, MediaIndex, AudioIndex, EmbedIndex)
}
