package graft

import org.apache.spark.sql.SparkSession

/** Debug/audit utility: run (and optionally explain) named declared
  * queries against an arbitrary fixture dir.
  *
  *   sbt "runMain graft.RunOne <sfDir> <query>[,<query>...] [explain]"
  *
  * Prints one line per query: name, row count, wall seconds — or the
  * formatted physical plan when `explain` is given. Used for one-off
  * scale checks (e.g. against the BenchStress replicated corpus) without
  * editing the bench harness.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunOne <sfDir> <q1>[,<q2>...] [explain]")
    val Array(sfDir, names) = args.take(2)
    val explain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(',').foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (explain) {
        println(s"==== $name ====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } else {
        val t0 = System.nanoTime()
        try {
          val n = df.count()
          println(f"RUNONE-OK $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
        } catch { case e: Throwable =>
          println(s"RUNONE-FAIL $name: ${e.getClass.getName}: " +
            String.valueOf(e.getMessage).take(300))
        }
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
