package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine classifier training — the distributed-training tier beyond
  * k-means: a batch perceptron (Rosenblatt 1958, full-batch variant)
  * over hashed bag-of-words features, run ENTIRELY in exact integer
  * arithmetic so the whole training trajectory — every weight, margin,
  * and update — is replayed bit-for-bit by the DuckDB oracle.
  *
  * Why the batch variant: the classic online perceptron updates after
  * every example, which imposes a total processing order — inherently
  * sequential, the one shape a distributed engine must refuse. The
  * full-batch update
  *
  *   w_{t+1} = w_t + Σ_{i : y_i·(w_t·x_i) ≤ 0} y_i·x_i
  *
  * is an order-free SUM over the misclassified set — exactly one keyed
  * aggregation per iteration — and is the textbook gradient step on the
  * perceptron criterion (the same aggregate-gradients-then-update shape
  * MLlib's linear models run; see also ClusterOps' Lloyd's loop, the
  * k-means precedent this file follows).
  *
  * Features: token counts over [[TrainBuckets]] md5-hashed buckets (the
  * DSIR bucket formula, engine-portable) plus a constant bias feature
  * (bucket −1, count 1 — so the bias is just another weight). Labels:
  * y = +1 for lang='en', −1 otherwise. The fixture's labels are
  * synthetic; what the operator proves is the exact distributed
  * training DYNAMICS, not fixture accuracy (the k-means convention).
  *
  * Scale shape: the (doc, bucket, count) relation materializes ONCE
  * (localCheckpoint — it is read 2× per iteration) with map-side
  * combine; each iteration is (a) a broadcast join of the ≤B+1-row
  * weight table + one doc_id-keyed margin aggregation, (b) one
  * bucket-keyed gradient aggregation whose output is ≤B+1 rows
  * COLLECTED to the driver (the kmeans centroid-collect shape —
  * kilobytes at any corpus size). Driver state is B+1 longs. Nothing
  * corpus-sized is ever collected, broadcast, or pair-joined; per-
  * iteration cost at 100 TB is two linear passes over the cached
  * feature relation. Margins/weights fit comfortably in BIGINT at any
  * realistic scale (|w_b| grows by at most the corpus token count per
  * iteration; 4 iterations × 10^14 tokens is still < 2^63).
  */
object TrainOps extends QueryPack {

  private[graft] val TrainBuckets = 256L
  private[graft] val TrainIters = 4

  /** +1 / −1 label column from `lang`. */
  private def yCol = when(col("lang") === "en", 1L).otherwise(-1L)

  /** The checkpointed (doc_id, y, b, c) feature relation, memoized per
    * (context, corpus, fingerprint) with eviction unpersisting the
    * checkpoint blocks — every training pass over one corpus shares one
    * materialization instead of leaking one per invocation (the
    * sharedNgramPairs hygiene, VERDICT r9 task 4). */
  private val featMemo = new graft.Memo.Bounded[
    (String, String, String), DataFrame](
    cap = 2, onEvict = graft.Memo.releaseLocalCheckpoint)
  private def features(s: SparkSession, d: String): DataFrame =
    featMemo.getOrElseUpdate((s.sparkContext.applicationId, d,
      graft.FixtureStamp.stamp("train1", d, "documents"))) {
      import s.implicits._
      val docs = Tables.documents(s, d)
      docs
        .select($"doc_id", yCol.as("y"),
          explode(split(lower($"text"), " +")).as("w"))
        .filter($"w" =!= "")
        .select($"doc_id", $"y",
          OpHash.md5Bucket($"w", TrainBuckets).as("b"))
        .groupBy($"doc_id", $"y", $"b").agg(count(lit(1)).as("c"))
        .unionByName(docs.select($"doc_id", yCol.as("y"),
          lit(-1L).as("b"), lit(1L).as("c")))
        .localCheckpoint() // read 2× per iteration: margins + gradient
    }

  private val trainClassifier = QueryDef(
    "q_train_classifier",
    (s, d) => {
      import s.implicits._
      val x = features(s, d)
      def margins(w: Map[Long, Long]): DataFrame = {
        val wDf = (if (w.isEmpty) Seq((0L, 0L)) else w.toSeq)
          .toDF("b", "wt")
        x.join(broadcast(wDf), Seq("b"), "left")
          .na.fill(0L, Seq("wt"))
          .groupBy($"doc_id", $"y")
          .agg(sum($"c" * $"wt").as("margin"))
      }
      var w = Map.empty[Long, Long]
      for (_ <- 0 until TrainIters) {
        // r16 (guide §2.4): the margin is a per-doc WINDOW sum over the
        // feature rows instead of a groupBy + semi-join back to x — the
        // misclassification test (y·margin ≤ 0, y and margin constant
        // within a doc) then filters the feature rows in place and the
        // gradient aggregates directly, one exchange of x per iteration
        // instead of two plus a join.
        val wDf = (if (w.isEmpty) Seq((0L, 0L)) else w.toSeq)
          .toDF("b", "wt")
        val wdoc = org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id")
        val grad = x.join(broadcast(wDf), Seq("b"), "left")
          .na.fill(0L, Seq("wt"))
          .withColumn("margin", sum($"c" * $"wt").over(wdoc))
          .filter($"y" * $"margin" <= 0)
          .groupBy($"b").agg(sum($"y" * $"c").as("g"))
          .as[(Long, Long)].collect() // ≤B+1 rows — bounded
        w = grad.foldLeft(w) { case (acc, (b, g)) =>
          acc.updated(b, acc.getOrElse(b, 0L) + g)
        }
      }
      margins(w)
        .select($"doc_id", $"y", $"margin",
          when($"margin" > 0, 1L).otherwise(-1L).as("pred"))
        .withColumn("correct", $"pred" === $"y")
        .orderBy($"doc_id")
    },
    Some {
      val bias = s"""SELECT doc_id,
          CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
          CAST(-1 AS BIGINT) AS b, CAST(1 AS BIGINT) AS c
        FROM documents"""
      val parts = Seq.newBuilder[String]
      parts += s"""tk AS (
        SELECT doc_id, lang, w FROM (
          SELECT doc_id, lang,
            unnest(regexp_split_to_array(lower(text), ' +')) AS w
          FROM documents) WHERE w <> ''),
      bk AS MATERIALIZED (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
          CAST(list_sum(list_transform(range(1, 9), i ->
              (strpos('0123456789abcdef', substr(md5(w), i, 1)) - 1)
                * (16 ** (8 - i))))
            AS BIGINT) % $TrainBuckets AS b,
          CAST(count(*) AS BIGINT) AS c
        FROM tk GROUP BY 1, 2, 3
        UNION ALL $bias),
      w0 AS MATERIALIZED (
        SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS wt
        WHERE false)"""
      for (k <- 0 until TrainIters) {
        parts += s"""m$k AS MATERIALIZED (
          SELECT x.doc_id, x.y,
            CAST(COALESCE(SUM(x.c * w.wt), 0) AS BIGINT) AS margin
          FROM bk x LEFT JOIN w$k w USING (b) GROUP BY 1, 2),
        g$k AS MATERIALIZED (
          SELECT x.b, CAST(SUM(x.y * x.c) AS BIGINT) AS g
          FROM bk x JOIN (SELECT doc_id FROM m$k WHERE y * margin <= 0) mi
            USING (doc_id)
          GROUP BY 1),
        w${k + 1} AS MATERIALIZED (
          SELECT COALESCE(w.b, g.b) AS b,
            CAST(COALESCE(w.wt, 0) + COALESCE(g.g, 0) AS BIGINT) AS wt
          FROM w$k w FULL JOIN g$k g ON w.b = g.b)"""
      }
      s"""WITH ${parts.result().mkString(",\n      ")},
      fin AS (
        SELECT x.doc_id, x.y,
          CAST(COALESCE(SUM(x.c * w.wt), 0) AS BIGINT) AS margin
        FROM bk x LEFT JOIN w$TrainIters w USING (b) GROUP BY 1, 2)
      SELECT doc_id, CAST(y AS BIGINT) AS y, margin,
        CAST(CASE WHEN margin > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred,
        (CASE WHEN margin > 0 THEN 1 ELSE -1 END) = y AS correct
      FROM fin ORDER BY doc_id"""
    },
    s"Distributed batch-perceptron training: $TrainIters integer-exact " +
      s"full-batch updates over $TrainBuckets hashed-bucket features + " +
      "bias, whole trajectory replayed by the oracle")

  override def defs: Seq[QueryDef] = Seq(trainClassifier)
}
