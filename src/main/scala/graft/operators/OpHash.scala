package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing shared by the hashed-feature operators.
  *
  * `md5Long32` is THE portable 32-bit hash of this engine: the first 8
  * hex digits of md5 parsed as an unsigned integer — md5 is the one
  * hash Spark and DuckDB both expose, and DuckDB rebuilds the same
  * integer with the strpos/16^k formula (see the DSIR oracle). The
  * bucketed form feeds DSIR's unigram models (`CurationOps`), the
  * perceptron's feature space (`TrainOps`), and the quality scorer's
  * weight formula (`TextOps`, which layers the Knuth multiplier on
  * top). One definition, so a change to the hash width or formula
  * cannot silently diverge the operators that must agree with their
  * oracles.
  */
private[operators] object OpHash {

  /** int(first 8 hex digits of md5(c)) as a long in [0, 2^32). */
  def md5Long32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** md5Long32 mod `buckets` — the hashed-bucket feature index. */
  def md5Bucket(c: Column, buckets: Long): Column =
    pmod(md5Long32(c), lit(buckets))
}
