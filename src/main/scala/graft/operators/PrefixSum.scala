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

  /** Rank-only convenience (r10 VERDICT task 4): a global LONG
    * row_number over `order` with no single-partition window —
    * bit-identical to `row_number().over(Window.orderBy(order))
    * .cast("long")` for any total order.
    */
  def rank(df: DataFrame, order: Seq[Column], rn: String): DataFrame =
    rankAndCumSum(df, order, lit(0L), rn, "__ps_cum").drop("__ps_cum")

  /** (value, position) pairs of the sorted multiset of a LONG column —
    * the TIE-SAFE distributed replacement for `row_number().over
    * (Window.orderBy(value))` when no unique tiebreak column exists:
    * ties collapse to one block row (value, count), block position
    * bounds come from the range-partitioned prefix sum over counts,
    * and positions re-explode via sequence(first, last). The value at
    * every sorted position is identical under ANY tie order, so this
    * is deterministic where the raw row_number is not — and there is
    * no single-partition window anywhere. Caveat: one block = one
    * sequence() array, so a single value repeated ~10⁸+ times should
    * chunk the explode; the house's snapped-grid domains are far
    * below that.
    *
    * @param vOut output name for the value column
    * @param pos  output name for the 1-based LONG sorted position
    */
  def sortedPositions(df: DataFrame, value: Column, vOut: String,
                      pos: String): DataFrame = {
    val blocks = df.select(value.as("__v")).groupBy("__v")
      .agg(count(lit(1)).as("__cnt"))
    rankAndCumSum(blocks, Seq(col("__v")), col("__cnt"), "__br", "__cum")
      .select(col("__v").as(vOut),
        explode(expr("sequence(__cum - __cnt + 1, __cum)")).as(pos))
  }

  /** SQL-standard NTILE(k) as a closed form over (global rank, total
    * count) — bit-identical to `ntile(k).over(Window.orderBy(...))`
    * (both Spark and DuckDB follow the standard: the first n%k
    * buckets take n/k+1 rows). Lets the bucket assignment ride a
    * range-partitioned rank instead of a single-task window.
    *
    * @param rn column name of the 1-based global rank
    * @param n  column name of the total row count
    */
  def ntileExpr(rn: String, n: String, k: Int): String =
    s"CAST(CASE WHEN $rn <= ($n div $k + 1) * ($n % $k) " +
      s"THEN ($rn - 1) div ($n div $k + 1) + 1 " +
      s"WHEN $n div $k > 0 " +
      s"THEN $n % $k + ($rn - 1 - ($n div $k + 1) * ($n % $k)) div ($n div $k) + 1 " +
      s"ELSE NULL END AS INT)"

  /** Competition rank (SQL `rank()`: ties share the FIRST position of
    * their value block) over a single key column, with no
    * single-partition window: one block row per distinct value, the
    * block's first position from the range-partitioned prefix sum of
    * counts, then an equi-join back on the value. Bit-identical to
    * `rank().over(Window.orderBy(key)).cast("long")`.
    */
  def competitionRank(df: DataFrame, key: String, desc: Boolean,
                      out: String): DataFrame = {
    val blocks = df.groupBy(key).agg(count(lit(1)).as("__c"))
    val ord = if (desc) col(key).desc else col(key).asc
    val ranks = rankAndCumSum(blocks, Seq(ord), col("__c"), "__br", "__cum")
      .select(col(key), (col("__cum") - col("__c") + 1L).as(out))
    df.join(ranks, key)
  }
}
