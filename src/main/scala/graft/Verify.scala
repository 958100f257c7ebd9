package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Declared-output contract breach — a DEDICATED type so the main loop
    * rethrows exactly this and nothing else (Spark internals throw plain
    * IllegalStateException for transient reasons; those must stay
    * per-query failures, not abort the whole dump). */
  final class SchemaContractViolation(msg: String)
      extends IllegalStateException(msg)

  /** Driver-compare contract: the driver loads each declared result via
    * pandas and lexsorts every column before hashing; a nested cell
    * (numpy array / dict) is unhashable and crashes the whole check
    * (round-3 q_agg_percentile_approx incident). So no DECLARED query may
    * emit array/map/struct columns — render arrays with array_join,
    * unpack structs into scalar columns. Enforced here (fail fast, before
    * any artifact is written for the offender) and in SmokeSpec. */
  def assertFlatSchema(name: String, schema: StructType): Unit = {
    val nested = schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
    }
    if (nested.nonEmpty)
      throw new SchemaContractViolation(
        s"declared query '$name' emits non-hashable nested columns " +
          s"[${nested.mkString(", ")}] — the driver's pandas compare " +
          "cannot process them; array_join arrays / unpack structs")
  }

  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [queryName...] — the optional trailing names
    // restrict the dump to those queries (dev iteration; the driver
    // always calls with exactly two args and dumps everything)
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    // fail fast on typos: a misspelled name would otherwise dump nothing
    // and read as a green dev-loop pass downstream
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        assertFlatSchema(name, df.schema) // rethrown below: contract breach
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch {
        case e: SchemaContractViolation => throw e // contract breach: abort
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // rendered AFTER the queries ran: lazy oracles (oracleFn) embed paths
    // the queries materialized this run (e.g. the payload landing dir)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
