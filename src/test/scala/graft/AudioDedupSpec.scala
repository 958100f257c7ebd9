package graft

import graft.functions.{AudioHash, MediaCodec}
import graft.operators.MultimodalOps

/** q_dedup_audio contract: the temporal fingerprint is DC-offset
  * invariant (the structural argument behind the planted variants), the
  * sample extractor strips container framing (junk chunks included),
  * and the banded plan never degenerates to all-pairs. */
class AudioDedupSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("fingerprint is exactly DC-offset invariant; sample streams " +
      "differ (the pair a byte-hash dedup cannot see)") {
    val docs = Tables.documents(spark, sf).filter($"doc_id" % 2 === 1)
      .select($"doc_id", encode($"text", "UTF-8"))
      .as[(Long, Array[Byte])].filter(_._2.nonEmpty).take(40)
    assert(docs.nonEmpty)
    docs.foreach { case (id, tb) =>
      val base = MediaCodec.encodeWav(id, tb)
      val dc = MultimodalOps.dcShift(base)
      val h0 = AudioHash.ahash(base)
      val h1 = AudioHash.ahash(dc)
      assert(h0 != null && h1 != null)
      assert(h0 === h1, s"doc $id: DC offset changed the fingerprint")
      val s0 = AudioHash.samples(base)
      val s1 = AudioHash.samples(dc)
      assert(!java.util.Arrays.equals(s0, s1),
        s"doc $id: DC variant left samples identical")
    }
  }

  test("sample extraction strips the RIFF framing: junk-chunk and " +
      "plain layouts of the same samples compare equal") {
    // ids divisible by 3 get a LIST chunk before fmt (MediaCodec), so
    // (id, id+3) with the same text differ in container layout; force
    // identical PARAMS by picking ids with equal channel/rate classes:
    // id=9 (junk, mono? 9%4=1 mono, 9%8=1 8k) vs id=33 (junk) — instead
    // compare the same id encoded twice (identity) and a junk id's
    // samples against the formula-expected byte count.
    val tb = "the same audio content".getBytes("UTF-8")
    val plain = MediaCodec.encodeWav(5L, tb) // 5%3 != 0 → no junk chunk
    val junk = MediaCodec.encodeWav(9L, tb) // 9%3 == 0 → LIST chunk
    val sPlain = AudioHash.samples(plain)
    val sJunk = AudioHash.samples(junk)
    assert(sPlain != null && sJunk != null)
    // both mono (5%4=1, 9%4=1) with the same text → same sample stream
    // despite different container layouts and rates
    assert(java.util.Arrays.equals(sPlain, sJunk),
      "junk-chunk layout leaked into the extracted samples")
    // corrupt payloads are nulls, not failures
    assert(AudioHash.ahash("not a wav".getBytes) == null)
    assert(AudioHash.ahash(java.util.Arrays.copyOf(plain, 20)) == null)
    // adversarial chunk sizes must END the walk, not hang or throw:
    // 0xFFFFFFF8 as a signed Int is -8, which made the old inline walk
    // advance by 8 + (-8) = 0 forever; near-2^31 sizes overflowed the
    // Int cursor negative and indexed out of bounds
    for (hostileSize <- Seq(0xFFFFFFF8, 0x7FFFFFF8)) {
      val evil = java.util.Arrays.copyOf(plain, plain.length)
      // first chunk starts at offset 12; poison its size field
      evil(16) = (hostileSize & 0xff).toByte
      evil(17) = ((hostileSize >> 8) & 0xff).toByte
      evil(18) = ((hostileSize >> 16) & 0xff).toByte
      evil(19) = ((hostileSize >> 24) & 0xff).toByte
      assert(AudioHash.ahash(evil) == null)
      assert(AudioHash.samples(evil) == null)
      assert(MediaCodec.decode(evil) == null)
    }
  }

  test("the banded pair plan is equi-join only, and every planted pair " +
      "lands as specified") {
    // assert on the UNCACHED plan — the audit's .cache() registration
    // on this exact pair subtree otherwise collapses it into an
    // InMemoryTableScan (see MediaSearchSpec)
    spark.sharedState.cacheManager.clearCache()
    val df = q("q_dedup_audio")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "pair generation degenerated to all-pairs")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))
      -> (r.getAs[Int]("hamming"), r.getAs[Long]("exact_sample"))).toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", length($"text").as("n"))
      .as[(Long, Int)].collect()
    docs.filter { case (id, _) => id % 10 == 5 }.foreach { case (id, _) =>
      assert(byPair.get((id, id + MultimodalOps.ExactOff))
        .exists { case (h, ex) => h == 0 && ex == 1L },
        s"exact copy of $id not found as an identical pair")
    }
    docs.filter { case (id, n) => id % 14 == 7 && n > 0 }.foreach {
      case (id, _) =>
        assert(byPair.get((id, id + MultimodalOps.BrightOff))
          .exists { case (h, ex) => h == 0 && ex == 0L },
          s"DC variant of $id not found at hamming 0 / exact 0")
    }
  }
}
