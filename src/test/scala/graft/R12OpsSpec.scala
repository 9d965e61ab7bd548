package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cells, EvalSample}

/** Round-12 invariants: the data-derived cell count and the absolute
  * eval-sample cap (r11 VERDICT tasks 2 + 3). The formulas live in
  * operators/Cells.scala and are mirrored verbatim into the DuckDB
  * oracles (Cells.kSql / EvalSample.sqlPred), so these pins guard the
  * Scala side of the cross-engine contract: if a constant or the ceil
  * arithmetic drifts, the sf0.01/sf0.1 hash gates fail loudly — this
  * spec names WHICH side moved.
  */
class R12OpsSpec extends AnyFunSuite {

  test("Cells.k is max(4, ceil(n/budget)) — exercises both SF regimes") {
    // the two driver fixtures: 500 vecs (sf0.01) and 2000 (sf0.1)
    assert(Cells.k(500) === 4)    // ceil(500/125) = 4: floor of the max
    assert(Cells.k(499) === 4)    // q_ann_nsw holds out vec 0
    assert(Cells.k(2000) === 16)  // ceil(2000/125) = 16: k differs by SF
    assert(Cells.k(1999) === 16)
    assert(Cells.k(1) === 4)      // the floor
    assert(Cells.k(126) === 4)    // ceil(126/125) = 2 → floor wins
    assert(Cells.k(1001) === 9)   // exact ceil, no FP: 8.008 → 9
    // linearity at scale: 10⁹ vectors → 8M cells of ≈125 rows
    assert(Cells.k(1000000000L) === 8000000)
  }

  test("Cells.kPerLabel keeps per-(label,cell) size near labelBudget") {
    assert(Cells.kPerLabel(500, 10) === 4)   // sf0.01: 500/(10·25)=2 → floor
    assert(Cells.kPerLabel(2000, 10) === 8)  // sf0.1: 2000/250 = 8 — differs
    assert(Cells.kPerLabel(2001, 10) === 9)  // exact ceil
  }

  test("Cells.kSql mirrors the Scala formula textually") {
    val sql = Cells.kSql("embeddings")
    assert(sql.contains("GREATEST(4"), sql)
    assert(sql.contains(s"/ ${Cells.budget}.0"), sql)
    assert(sql.contains("CEIL"), sql)
    val psql = Cells.kPerLabelSql("embeddings")
    assert(psql.contains(s"COUNT(DISTINCT label) * ${Cells.labelBudget}.0"), psql)
  }

  test("EvalSample cap is slack at sf0.01 ids and binds at sf0.1 ids") {
    def members(maxId: Long): Seq[Long] =
      (0L until maxId).filter(v =>
        v % EvalSample.every == 0 && v < EvalSample.bound)
    assert(members(500).size === 30)       // sf0.01: all sample members kept
    assert(members(2000).size === EvalSample.maxQueries) // sf0.1: binds at 64
    // the predicate keeps exactly the FIRST maxQueries multiples
    assert(members(2000).max === EvalSample.every.toLong
      * (EvalSample.maxQueries - 1))
    val p = EvalSample.sqlPred("a.vec_id")
    assert(p === s"a.vec_id % 17 = 0 AND a.vec_id < 1088", p)
  }
}

/** q_ann_hnsw's reason to exist: the layer descent hands the layer-0
  * beam a query-adapted entry, so its recall must not fall below the
  * fixed-entry single-layer walk's on the same fixture (r11 VERDICT
  * task 4's done-bar; measured 2 ≥ 2 at sf0.01 and 1 ≥ 0 at sf0.1).
  */
class R12AnnSpec extends org.scalatest.funsuite.AnyFunSuite
    with SparkFixture {
  test("q_ann_hnsw recall@5 >= q_ann_nsw on the same query") {
    def hits(k: String): Long =
      SparkEntry.queries(k)(spark, sf)
        .agg(org.apache.spark.sql.functions.sum("in_exact_top5"))
        .head.getLong(0)
    val h = hits("q_ann_hnsw")
    val n = hits("q_ann_nsw")
    assert(h >= n, s"hnsw $h < nsw $n")
  }
}

/** operators/NnDescent convergence contract (r11 VERDICT task 5):
  * each round's candidate set CONTAINS the node's current edges, so
  * the per-node top-8 sum of µ-cosines — hence the global sum — is
  * provably non-decreasing round over round; and the loop must stop
  * on low edge churn within its round budget, loud-failing otherwise
  * rather than shipping an unconverged graph.
  */
class R12NnDescentSpec extends org.scalatest.funsuite.AnyFunSuite
    with SparkFixture {
  import org.apache.spark.sql.functions._

  private def fixture() = {
    graft.expr.Registry.ensure(spark)
    val all = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val n = all.count()
    // crude ring init (a → a±1, a → a±2 mod n): far from the true
    // kNN graph, so the refinement has real work to do
    val g0 = all.select(col("vec_id").as("a_id"))
      .withColumn("d", explode(array(lit(1L), lit(2L), lit(n - 1), lit(n - 2))))
      .select(col("a_id"), pmod(col("a_id") + col("d"), lit(n)).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
    (all, g0)
  }

  test("round-over-round top-8 quality sum is monotone non-decreasing") {
    val (all, g0) = fixture()
    val g1 = graft.operators.NnDescent.round(all, g0)
    val g2 = graft.operators.NnDescent.round(all, g1)
    val g3 = graft.operators.NnDescent.round(all, g2)
    def qual(g: org.apache.spark.sql.DataFrame): Long =
      g.agg(sum("cu")).head.getLong(0)
    val (q1, q2, q3) = (qual(g1), qual(g2), qual(g3))
    assert(q2 >= q1, s"round 2 regressed: $q2 < $q1")
    assert(q3 >= q2, s"round 3 regressed: $q3 < $q2")
  }

  test("refineUntilConverged stops on low churn within the budget") {
    val (all, g0) = fixture()
    // the ring init is deliberately adversarial — embedding-space
    // structure has to propagate around the whole ring, so churn
    // decays slowly (measured: 0.50 at round 1 → 0.031 at round 16 on
    // the fixture). tol=0.05 with a 20-round budget converges at ~16;
    // a production caller starting from the cell-graph union (the
    // q_ann_nndescent init) converges in 1-2 rounds at tol=0.01.
    val (g, rounds) = graft.operators.NnDescent
      .refineUntilConverged(all, g0, maxRounds = 20, tol = 0.05)
    assert(rounds >= 2 && rounds <= 20, s"rounds = $rounds")
    assert(g.count() > 0)
  }

  test("refineUntilConverged loud-fails when the budget is exhausted") {
    val (all, g0) = fixture()
    // a zero-round budget can never observe convergence → must throw,
    // never return an unconverged graph
    val ex = intercept[IllegalStateException] {
      graft.operators.NnDescent
        .refineUntilConverged(all, g0, maxRounds = 0, tol = 0.0)
    }
    assert(ex.getMessage.contains("did not converge"), ex.getMessage)
  }
}
