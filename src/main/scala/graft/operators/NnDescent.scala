package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NN-descent (Dong et al. WWW'11) as a distributed operator: one
  * refinement round re-ranks each node's candidate set {current
  * edges} ∪ {reverse edges} ∪ {neighbor-of-neighbor closure} down to
  * its top-M by cosine — every step an equi-join on node ids, no
  * cartesian, no collect of edge data. Candidate fan-in per round is
  * ≤ 2M + M² per node, LINEAR in the corpus.
  *
  * r11 VERDICT task 5 adds the convergence loop production actually
  * runs: iterate rounds until the replaced-edge fraction drops under
  * `tol`, with a bounded round budget that LOUD-FAILS instead of
  * silently shipping an unconverged graph (the ConnectedComponents
  * posture — a converged-looking lie is worse than an exception).
  * The two per-round counts are driver actions, bounded by design:
  * one long each per round, the operator's convergence meter.
  *
  * Exactness: cosines snap to the 6dp grid before ranking and to the
  * µ-grid long `cu` on output, so a round is deterministic and
  * cross-engine replayable — q_ann_nndescent (one round) and
  * q_ann_nndescent2 (two rounds) in queries/StatsR11+R12 hash-check
  * the unrolled rounds against DuckDB.
  */
object NnDescent {

  /** One refinement round over graph `g` (columns a_id, b_id; extra
    * columns ignored): returns the re-ranked top-`m` graph with the
    * µ-snapped cosine `cu`. `all` = (vec_id, embedding).
    */
  def round(all: DataFrame, g: DataFrame, m: Int = 8): DataFrame = {
    val base = g.select("a_id", "b_id")
    val rev = base.select(col("b_id").as("a_id"), col("a_id").as("b_id"))
    val nn2 = base
      .join(base.select(col("a_id").as("mid"), col("b_id").as("b2")),
        col("b_id") === col("mid"))
      .select(col("a_id"), col("b2").as("b_id"))
    val cand = base.unionByName(rev).unionByName(nn2)
      .filter(col("a_id") =!= col("b_id"))
      .distinct()
    val ea = all.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val eb = all.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val wTop = Window.partitionBy("a_id")
      .orderBy(col("cos").desc, col("b_id"))
    cand.join(ea, "a_id").join(eb, "b_id")
      .select(col("a_id"), col("b_id"),
        // qualified: `round` alone resolves to this object's method
        org.apache.spark.sql.functions
          .round(expr("cosine_sim(a_emb, b_emb)"), 6).as("cos"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= m)
      .select(col("a_id"), col("b_id"),
        expr("CAST(ROUND(cos * 1e6) AS BIGINT)").as("cu"))
      .localCheckpoint(true) // next round scans it 3×; stats once
  }

  /** Iterate rounds until the fraction of NEW edges (in the round's
    * output but not its input) drops to ≤ `tol`, or throw after
    * `maxRounds` — never silently return an unconverged graph.
    * Returns (final graph, rounds run).
    */
  def refineUntilConverged(all: DataFrame, g0: DataFrame, m: Int = 8,
                           maxRounds: Int = 8,
                           tol: Double = 0.01): (DataFrame, Int) = {
    var g = g0.select("a_id", "b_id").localCheckpoint(true)
    // superseded checkpoints are unpersisted as soon as the round's
    // churn counts are done (r12 ADVICE: up to maxRounds full edge
    // graphs otherwise stay pinned in executor storage until context-
    // cleaner GC). `owned` = the checkpoint THIS loop created and no
    // longer needs; g0 itself belongs to the caller and the returned
    // graph stays live.
    var owned = g
    var rounds = 0
    while (rounds < maxRounds) {
      val next = round(all, g, m)
      rounds += 1
      // convergence meter: two bounded driver counts per round
      val replaced = next
        .join(g.withColumn("old", lit(1)), Seq("a_id", "b_id"), "left")
        .filter(col("old").isNull).count()
      val total = math.max(1L, next.count())
      freeCheckpoint(owned)
      owned = next
      g = next.select("a_id", "b_id")
      if (replaced.toDouble / total <= tol) return (next, rounds)
    }
    throw new IllegalStateException(
      s"NN-descent did not converge within $maxRounds rounds " +
        s"(edge churn still above $tol) — raise maxRounds or loosen " +
        "tol explicitly; refusing to ship an unconverged graph")
  }

  /** Release a localCheckpoint's pinned storage: the checkpointed
    * Dataset's plan IS a LogicalRDD over the persisted RDD, so
    * unpersisting that RDD frees the blocks without waiting for the
    * driver-side ContextCleaner to notice the reference lapse. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
