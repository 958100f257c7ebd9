package graft

import graft.operators.ShardOps

/** q_shard_append contract (VERDICT r12 task 3): appending the delta
  * generation must be a PURE FILE ADD — every base file byte-identical
  * after the append, all new bytes under gen=1 directories — and the
  * combined layout must keep the fixed-row/density contract per
  * (shard, gen). */
class ShardAppendSpec extends SparkTestBase {
  import spark.implicits._

  private def dataFiles(dir: String): Map[String, (Long, String)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.startsWith("part-")) Seq(f) else Seq.empty
    walk(new java.io.File(dir)).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      f.getAbsolutePath -> (f.length(), md5)
    }.toMap
  }

  test("append is a pure file add: base files byte-identical, new bytes " +
      "only under gen=1") {
    val dir = ShardOps.writeShardBase(spark, sf)
    val before = dataFiles(dir)
    assert(before.nonEmpty)
    ShardOps.appendShardDelta(spark, sf)
    val after = dataFiles(dir)
    // every pre-existing file survives with identical bytes
    before.foreach { case (path, sig) =>
      assert(after.get(path) === Some(sig), s"base file rewritten: $path")
    }
    // every new file is a gen=1 file
    (after.keySet -- before.keySet).foreach { p =>
      assert(p.contains("gen=1"), s"append created a non-gen-1 file: $p")
    }
    assert((after.keySet -- before.keySet).nonEmpty, "append added no files")
  }

  test("combined layout keeps the fixed-row and dense-seq contract per " +
      "(shard, gen), and generations never share a seq row") {
    val rows = q("q_shard_append").collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("gen")))
      .foreach { case ((shard, gen), rs) =>
        val seqs = rs.map(_.getAs[Long]("seq_idx")).sorted.toSeq
        // dense within the generation: a loader addresses rows by range
        assert(seqs === (seqs.head to seqs.last).toSeq,
          s"shard $shard gen $gen seq_idx not dense")
        val maxSeq = seqs.last
        rs.foreach { r =>
          val (seq, n) = (r.getAs[Long]("seq_idx"), r.getAs[Long]("n_ids"))
          if (seq < maxSeq) assert(n === ShardOps.SeqLen.toLong,
            s"shard $shard gen $gen seq $seq not a full row ($n ids)")
          else assert(n >= 1L && n <= ShardOps.SeqLen.toLong)
        }
      }
    // generation alignment: gen-1 rows start at a fresh boundary past
    // every gen-0 row, never inside one
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val g0 = rs.filter(_.getAs[Long]("gen") == 0L).map(_.getAs[Long]("seq_idx"))
      val g1 = rs.filter(_.getAs[Long]("gen") == 1L).map(_.getAs[Long]("seq_idx"))
      if (g0.nonEmpty && g1.nonEmpty)
        assert(g1.min === g0.max + 1, s"shard $shard generations overlap")
    }
    // conservation: every subword id lands exactly once
    val total = operators.BpeOps.subwordIdRows(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_ids")).sum === total)
  }
}
