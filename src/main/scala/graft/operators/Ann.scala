package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForce` is the exact baseline: broadcast the (small) query
  * set against the corpus, rank by cosine. The corpus side streams —
  * no shuffle of the 100 TB side at all; per-query top-k is a window
  * over query_id (query-count-bounded cardinality).
  *
  * `lshTopK` is the scale path: hyperplane-LSH bucket both sides and
  * only score within matching buckets (multi-probe = exact-match
  * probing here), trading recall for a corpus-×-queries → bucket-
  * local join.
  */
object Ann {

  def bruteForce(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("sim"))
    topK(scored, k)
  }

  /** Per-query top-k with a cross-engine-deterministic order: rank on
    * the 6-dp-rounded similarity (immune to last-ulp fp differences)
    * with the neighbor id as total-order tiebreak.
    */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid")
      .orderBy(round(col("sim"), 6).desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, nPlanes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"),
      lshBucket(asDouble(col(vecCol)), nPlanes).as("bucket"))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"),
      lshBucket(asDouble(col(vecCol)), nPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("sim"))
    topK(scored, k)
  }
}
