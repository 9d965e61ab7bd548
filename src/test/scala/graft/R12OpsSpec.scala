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
