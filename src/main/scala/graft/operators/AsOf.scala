package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row at or before
  * it in time within the same key. The temporal-join primitive every
  * event pipeline eventually needs (enrich a purchase with the most
  * recent preceding click, a trade with the prevailing quote);
  * Spark has no native as-of join, and the naive `JOIN … ON r.ts <=
  * l.ts` + windowed-max formulation is a range join that expands to
  * |key-group|² intermediate rows before its filter.
  *
  * This is the union+window formulation instead: tag both sides,
  * union them, sort each key's timeline once, and carry the last
  * seen right-side payload forward onto every left row with
  * `last(_, ignoreNulls)` over a running window — then keep only the
  * left rows. ONE shuffle (the key partition), no join at all, and
  * per-key cost is linear in the timeline length. At 100 TB the
  * shuffle keys on the join key at corpus cardinality; a hot key
  * costs its timeline sort, never a quadratic pair expansion.
  *
  * Right rows at exactly the left timestamp qualify (`<=`), so the
  * union sorts right before left at equal timestamps. Left rows
  * with no preceding right row keep NULL carries (LEFT-join
  * semantics). Ties among right rows at the same (key, ts) break on
  * the carry payload's total order, deterministically.
  */
object AsOf {

  /** @param carry right-side columns to attach to each left row,
    *              emitted as `carryPrefix + name` (types preserved).
    * @param leftTs / rightTs timestamp-castable event-time columns.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, carry: Seq[String],
      carryPrefix: String = "asof_"): DataFrame = {
    require(carry.nonEmpty, "asofJoin: need at least one carry column")
    val leftCols = left.columns.toSeq
    val reserved = Seq("_asof_ts", "_asof_side", "_asof_pay", "_asof_match")
    require(!leftCols.exists(reserved.contains),
      s"asofJoin: left side may not contain ${reserved.mkString("/")}")
    // one struct payload so a single last() carries every right
    // column at once and ties get one total order; the left side
    // unions a typed NULL of the same struct
    val payType = right
      .select(struct(carry.map(c => col(c).as(c)): _*).as("p"))
      .schema.head.dataType
    val l = left
      .withColumn("_asof_ts", col(leftTs).cast("timestamp"))
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_pay", lit(null).cast(payType))
    val r = right.select(
      keys.map(col) :+
        col(rightTs).cast("timestamp").as("_asof_ts") :+
        struct(carry.map(c => col(c).as(c)): _*).as("_asof_pay"): _*)
      .withColumn("_asof_side", lit(0))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_side"), col("_asof_pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof_match",
        last(col("_asof_pay"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
      .select(leftCols.map(col) ++
        carry.map(c => col(s"_asof_match.$c").as(carryPrefix + c)): _*)
  }
}
