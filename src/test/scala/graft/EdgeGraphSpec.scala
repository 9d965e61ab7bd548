package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EdgeGraph

/** Boundary behavior of the memoized edge layer (r5): the cache must
  * serve per (sfDir, kind, τ) — never bleed results across scale
  * factors or parameterizations — and repeated calls must return the
  * SAME materialization (no re-derivation) with identical rows. */
class EdgeGraphSpec extends AnyFunSuite with SparkFixture {

  test("repeated calls reuse one materialization with identical rows") {
    val a = EdgeGraph.pairs(spark, sf, "bigram", 0.3)
    val b = EdgeGraph.pairs(spark, sf, "bigram", 0.3)
    assert(a eq b, "second call must return the cached frame, not a new derivation")
    assert(a.collect().toSeq === b.collect().toSeq)
  }

  test("cache keys on sfDir: different scale factors serve different edge tables") {
    val small = EdgeGraph.pairs(spark, "/root/testdata/sf0.001", "token", 0.8)
    val mid = EdgeGraph.pairs(spark, "/root/testdata/sf0.01", "token", 0.8)
    assert(!(small eq mid))
    // sf0.01 has strictly more documents, so at this τ it has at least
    // as many near-dup pairs — and empirically more
    assert(mid.count() > small.count())
  }

  test("cache keys on (kind, tau): parameterizations do not collide") {
    val bigram = EdgeGraph.pairs(spark, sf, "bigram", 0.3)
    val token = EdgeGraph.pairs(spark, sf, "token", 0.3)
    assert(!(bigram eq token))
    val tight = EdgeGraph.pairs(spark, sf, "token", 0.95)
    val loose = EdgeGraph.pairs(spark, sf, "token", 0.3)
    assert(tight.count() <= loose.count(),
      "a tighter τ can never admit more pairs than a looser one")
  }

  test("cached frame equals a fresh SetSimJoin derivation row-for-row") {
    graft.expr.Registry.ensure(spark)
    val cached = EdgeGraph.pairs(spark, sf, "bigram", 0.3).collect().toSeq
    val fresh = graft.operators.SetSimJoin.auto(spark,
      graft.tables.Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"),
          expr("bigram_hashes(split(text, ' '))").as("hs")),
      tau = 0.3).collect().toSeq
    assert(cached === fresh)
  }

  test("unknown element kind fails loudly") {
    intercept[IllegalArgumentException] {
      EdgeGraph.pairs(spark, sf, "trigram", 0.3)
    }
  }
}
