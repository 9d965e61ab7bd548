package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass range-partitioned global rank + prefix sum (r9 VERDICT
  * task 7: the scale-safe replacement for `Window.orderBy(...)` with
  * no partition clause, which sorts the whole input in ONE task).
  *
  * Pass 1: range-shuffle on the order key (each partition holds a
  * contiguous key range, partition index ascending with the order),
  * then a per-partition window computes LOCAL ranks and running sums
  * in parallel. Pass 2: the per-partition row counts and sums — one
  * row per partition, bounded by the session's parallelism — get an
  * exclusive-prefix offset via a tiny single-partition window
  * (sanctioned bounded grain), broadcast back, and added.
  *
  * EXACTNESS CONTRACT — LONG mass only: long addition is associative,
  * so the result is bit-identical to the single-partition window no
  * matter where the sampled range bounds land. Double mass is
  * deliberately NOT supported: `repartitionByRange` samples its
  * bounds, so a double regrouping would change FP rounding run to
  * run — a global statistic must not depend on partitioning. Keys
  * whose mass is inherently double (q_pareto_abc/q_abc_xyz revenue)
  * keep the single-partition window at their bounded dimension grain
  * and carry the scale plan in a comment (snap to an integer grid at
  * ingestion, then adopt this helper).
  *
  * The order must be a TOTAL order (append a unique id tiebreak) —
  * equal keys straddling a partition boundary would otherwise make
  * local ranks ambiguous.
  */
object PrefixSum {

  /** @param df    input
    * @param order total order (e.g. `Seq(col("v"), col("user_id"))`)
    * @param value LONG mass column to prefix-sum
    * @param rn    output name for the global 1-based rank
    * @param cum   output name for the inclusive prefix sum
    */
  def rankAndCumSum(df: DataFrame, order: Seq[Column], value: Column,
                    rn: String, cum: String): DataFrame = {
    val s = df.sparkSession
    val n = math.max(1, s.sessionState.conf.numShufflePartitions)
    // checkpoint freezes the sampled range assignment so both passes
    // see one consistent partitioning (re-evaluation could re-sample)
    val ranged = df.repartitionByRange(n, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val wLoc = Window.partitionBy("__pid").orderBy(order: _*)
    val local = ranged
      .withColumn("__lrn", row_number().over(wLoc))
      .withColumn("__lcum", sum(value).over(
        wLoc.rowsBetween(Window.unboundedPreceding, 0)))
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranged.groupBy("__pid")
      .agg(count(lit(1)).as("__c"), sum(value).as("__s"))
      .withColumn("__orn", coalesce(sum("__c").over(wOff), lit(0L)))
      .withColumn("__ocum", coalesce(sum("__s").over(wOff), lit(0L)))
      .select("__pid", "__orn", "__ocum")
    local.join(broadcast(offs), "__pid")
      .withColumn(rn, col("__lrn") + col("__orn"))
      .withColumn(cum, col("__lcum") + col("__ocum"))
      .drop("__pid", "__lrn", "__lcum", "__orn", "__ocum")
  }
}
