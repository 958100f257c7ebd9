package graft

import org.apache.spark.sql.functions._

/** SCD-2 interval semantics: the build's intervals must tile each key's
  * change history, and the AS OF lookup must return exactly the run
  * covering the instant for every key with history before it. */
class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  test("q_scd2_asof returns one covering interval per eligible user and " +
      "matches a chronological replay") {
    import graft.operators.CurationOps
    val t = CurationOps.Scd2AsOfS
    val got = q("q_scd2_asof")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // replay: per user, the state at T is the last run started <= T
    val runs = q("q_scd2_build")
      .select($"user_id", $"event_type", $"valid_from_s", $"valid_to_s")
      .as[(Long, String, Long, Long)].collect().toSeq
    val expect = runs.groupBy(_._1).flatMap { case (u, rs) =>
      rs.filter(r => r._3 <= t && t < r._4) match {
        case Seq(one) => Some((u, one._2, one._3, t - one._3,
          if (one._4 == 32503680000L) 1L else 0L))
        case Seq() => None
        case more => fail(s"user $u has ${more.size} intervals covering T")
      }
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    got.foreach { case (u, _, since, tenure, _) =>
      assert(since <= t && tenure == t - since && tenure >= 0, s"user $u")
    }
  }

  test("build intervals tile each user's history with no overlap or gap") {
    val runs = q("q_scd2_build")
      .select($"user_id", $"valid_from_s", $"valid_to_s")
      .as[(Long, Long, Long)].collect().toSeq
    runs.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, _, to1), (_, from2, _)) =>
          assert(to1 == from2, s"user $u: gap/overlap at $to1 vs $from2")
        case _ =>
      }
      assert(sorted.last._3 == 32503680000L, s"user $u: open current run")
    }
  }
}
