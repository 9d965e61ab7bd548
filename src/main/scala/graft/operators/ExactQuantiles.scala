package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact quantiles (SURVEY §7.5 exact-quantile posture).
  *
  * `percentile(x, q)` buffers every input value of a group in ONE
  * aggregation state — the memory-unbounded shape that dies first at
  * corpus scale. This operator computes the SAME number (Spark
  * percentile / DuckDB quantile_cont linear interpolation at position
  * q·(n−1), reproduced as the identical IEEE expression tree) as a
  * distributed plan:
  *
  *   1. value-count groupBy — map-side combinable, the full-table
  *      buffer becomes a distinct-value stream;
  *   2. per-group cumulative-rank window over the distinct values —
  *      external sort, O(1) running state, spillable;
  *   3. a tiny probe table (|groups|·|quantiles| rows, broadcast)
  *      picks the two covering ranks and interpolates.
  *
  * `approx_percentile` stays the documented fallback for when even
  * the distinct-value domain explodes (SURVEY §7.5).
  */
object ExactQuantiles {

  /** One row per group × quantile: (groupCols…, q, v) with v exactly
    * `percentile(valueCol, q)`'s linear-interpolation result.
    *
    * Plan shape (one window pass, one broadcast join): per-group
    * totals come straight off the input (map-side combinable — never
    * from the windowed frame, which would re-derive it), the probe
    * table explodes to one row per (group, q, covering-rank, side),
    * and a single broadcast probe join + a |groups|·|qs|-row group-by
    * assembles the interpolation. */
  def byGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
              qs: Seq[Double]): DataFrame = {
    val gs = groupCols.map(col)
    val counts = df.groupBy(gs :+ col(valueCol): _*)
      .agg(count(lit(1)).as("_cnt"))
    val wOrd = Window.partitionBy(gs: _*).orderBy(col(valueCol))
    val ranked = counts
      .withColumn("_hi", sum("_cnt").over(wOrd))
      .withColumn("_lo", col("_hi") - col("_cnt") + 1)
    // pos = q·(n−1) 0-based → covering 1-based ranks rl/rh and the
    // fractional weight — the exact expression percentile() evaluates
    // weights mirror Percentile.getPercentile EXACTLY:
    //   lower==higher → lowerValue;
    //   else lowerValue·(higher − pos) + higherValue·(pos − lower)
    // (NOT vlo + (vhi−vlo)·frac — that form differs by an ulp)
    val probes = df.groupBy(gs: _*).agg(count(lit(1)).as("_n"))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("_p", col("q") * (col("_n") - 1))
      .withColumn("_rl", floor(col("_p")).cast("long") + 1)
      .withColumn("_rh", ceil(col("_p")).cast("long") + 1)
      .withColumn("_wlo", ceil(col("_p")) - col("_p"))
      .withColumn("_whi", col("_p") - floor(col("_p")))
      // one probe row per covering rank: side 0 = lower, 1 = higher
      .select(gs ++ Seq(col("q"), col("_rl"), col("_rh"), col("_wlo"),
        col("_whi"), explode(array(
          struct(col("_rl").as("_r"), lit(0).as("_side")),
          struct(col("_rh").as("_r"), lit(1).as("_side")))).as("_probe")): _*)
      .select(gs ++ Seq(col("q"), col("_rl"), col("_rh"), col("_wlo"),
        col("_whi"), col("_probe._r").as("_r"), col("_probe._side").as("_side")): _*)
    // each probe row matches exactly one ranked row (rank ranges
    // partition 1..n), so the group-by below sees ≤2 rows per (g, q)
    ranked.join(broadcast(probes), groupCols)
      .filter(col("_r").between(col("_lo"), col("_hi")))
      .groupBy(gs :+ col("q"): _*)
      .agg(
        max(when(col("_side") === 0, col(valueCol))).as("_vlo"),
        max(when(col("_side") === 1, col(valueCol))).as("_vhi"),
        max("_rl").as("_rl"), max("_rh").as("_rh"),
        max("_wlo").as("_wlo"), max("_whi").as("_whi"))
      .withColumn("v", when(col("_rl") === col("_rh"), col("_vlo"))
        .otherwise(col("_vlo") * col("_wlo") + col("_vhi") * col("_whi")))
      .select(gs :+ col("q") :+ col("v"): _*)
  }
}
