package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for fact-dim joins whose join key is Zipfian
  * (SURVEY §5). AQE's skew-join splits oversized partitions at
  * runtime, but only for sort-merge joins after a shuffle has
  * already placed one hot key in one partition; salting removes the
  * hot key from the shuffle entirely, which is the shape you want
  * when one key is a double-digit percentage of 100 TB.
  *
  * The salt is derived deterministically from a unique fact column
  * (no rand(): reproducible across retries and engines); the dim
  * side is replicated `nSalts` ways, so each hot key spreads over
  * `nSalts` reducers at the cost of a dim-side blow-up — size
  * nSalts to the skew factor, not the cluster.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factUniqueCol: String, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(col(factUniqueCol)), lit(nSalts.toLong)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
