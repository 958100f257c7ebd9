package graft

import graft.operators.{BpeOps, ShardOps}

/** q_shard_forget contract: the delete's blast radius is exactly the
  * (shard, generation) partitions containing deleted docs — every other
  * partition byte-identical — and the surviving store conserves exactly
  * the surviving token stream with gen-1 addressing untouched. */
class ShardForgetSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
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

  test("blast radius is exactly the affected (shard, gen) partitions; " +
      "all other partitions byte-identical") {
    val dir = ShardOps.forgetShardDir(sf)
    ShardOps.writeShardBaseTo(spark, sf, dir)
    ShardOps.appendShardDeltaTo(spark, sf, dir)
    val before = dataFiles(dir)
    val affected = Tables.documents(spark, sf)
      .filter($"doc_id" % ShardOps.ForgetMod === ShardOps.ForgetRes)
      .select(pmod($"doc_id", lit(ShardOps.NShards.toLong)).as("s"),
        when($"doc_id" % BpeOps.HoldoutMod === 0, 1).otherwise(0).as("g"))
      .distinct().as[(Long, Int)].collect()
      .map { case (s0, g) => s"shard=$s0/gen=$g" }.toSet
    assert(affected.nonEmpty, "fixture plants no deletable docs")
    ShardOps.forgetDocs(spark, sf, dir)
    val after = dataFiles(dir)
    before.foreach { case (path, sig) =>
      val hit = affected.exists(path.contains)
      if (!hit) assert(after.get(path) === Some(sig),
        s"unaffected partition rewritten: $path")
      else assert(!after.contains(path),
        s"affected partition kept a stale pre-delete file: $path")
    }
  }

  test("surviving store conserves exactly the surviving tokens, with " +
      "gen-1 addressing preserved and zero deleted-doc spans") {
    val rows = q("q_shard_forget").collect()
    assert(rows.nonEmpty)
    val surviving = BpeOps.subwordIdRows(spark, sf)
      .filter($"doc_id" % ShardOps.ForgetMod =!= ShardOps.ForgetRes)
      .count()
    assert(rows.map(_.getAs[Long]("n_ids")).sum === surviving)
    val deleted = BpeOps.subwordIdRows(spark, sf)
      .filter($"doc_id" % ShardOps.ForgetMod === ShardOps.ForgetRes)
      .count()
    assert(deleted > 0, "the delete set had no tokens — vacuous test")
    // no surviving row claims a deleted doc as its span boundary
    val delIds = Tables.documents(spark, sf)
      .filter($"doc_id" % ShardOps.ForgetMod === ShardOps.ForgetRes)
      .select($"doc_id").as[Long].collect().toSet
    rows.foreach { r =>
      assert(!delIds.contains(r.getAs[Long]("first_doc")) &&
        !delIds.contains(r.getAs[Long]("last_doc")),
        "a packed row still spans a deleted doc")
    }
    // gen-1 rows keep their append-time addresses: min gen-1 seq per
    // shard equals the ORIGINAL base row count (full base, pre-delete)
    val origBaseRows = BpeOps.subwordIdRows(spark, sf)
      .filter($"doc_id" % BpeOps.HoldoutMod =!= 0)
      .withColumn("shard", pmod($"doc_id", lit(ShardOps.NShards.toLong)))
      .groupBy($"shard").agg(count(lit(1)).as("nb"))
      .select($"shard", expr(s"(nb + ${ShardOps.SeqLen - 1}) div ${ShardOps.SeqLen}").as("nbseq"))
      .as[(Long, Long)].collect().toMap
    rows.filter(_.getAs[Long]("gen") == 1L)
      .groupBy(_.getAs[Long]("shard")).foreach { case (sh, rs) =>
        val minSeq = rs.map(_.getAs[Long]("seq_idx")).min
        assert(minSeq === origBaseRows(sh),
          s"shard $sh gen-1 addressing shifted by the base delete")
      }
  }
}
