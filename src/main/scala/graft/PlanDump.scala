package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for a list of declared queries
  * into `plans/<tag dir>/<query>_<tag>.txt` — the optimization-round
  * deliverable (one file per touched query, before and after).
  *
  *   sbt "runMain graft.PlanDump r16/before q_graph_pagerank q_embed_pq"
  *
  * The first arg is `<dir>/<tag>`; remaining args are query names. Each
  * query fn RUNS once before the dump so state the plan depends on
  * (recorded K, fixture stores, memoized vocab) is the same state a
  * bench pass sees; the dumped plan is the declared DataFrame's.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, tag) = args(0).split("/", 2) match {
      case Array(d, t) => Array(d, t)
      case _           => sys.error("first arg must be <dir>/<tag>")
    }
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Paths.get("plans", dir)
    java.nio.file.Files.createDirectories(out)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // run once: plan-bearing state = what a bench pass sees
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(out.resolve(s"${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      spark.sharedState.cacheManager.clearCache()
      println(s"[plandump] $name -> ${out.resolve(s"${name}_$tag.txt")}")
    }
    spark.stop()
  }
}
