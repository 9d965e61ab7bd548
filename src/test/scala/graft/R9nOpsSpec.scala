package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-14 semantics (queries/StatsR9n.scala): ML-eval folds over
  * the collected sf0.001 tables.
  */
class R9nOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val evs: Array[(Long, String, Double)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

  private lazy val embs: Array[(Long, Long, Array[Float])] =
    graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long"), col("label").cast("long"),
        col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toArray))

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    rnd(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
  }

  test("q_pr_auc matches the group-end precision fold") {
    val groups = evs.groupBy(_._3).toArray
      .map { case (v, g) =>
        (v, g.length.toLong, g.count(_._2 == "purchase").toLong)
      }.sortBy(-_._1)
    var cump = 0L; var cumn = 0L; var su = 0L
    for ((_, n, pos) <- groups) {
      cump += pos; cumn += n
      su += rnd(pos.toDouble * cump * 1e9 / cumn)
    }
    val nPos = groups.map(_._3).sum
    val nNeg = groups.map(_._2).sum - nPos
    val r = q("q_pr_auc").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === nPos)
    assert(r(0).getLong(1) === nNeg)
    assert(math.abs(r(0).getDouble(2)
      - rnd(su.toDouble / (nPos * 1e9) * 1e6) / 1e6) <= 1e-9)
  }

  test("q_recall_curve matches the leg-rank intersection") {
    val ivf = SparkEntry.queries("q_sim_ivf")(spark, sf)
      .orderBy(col("cos").desc, col("vec_id")).collect()
      .map(_.getLong(0))
    val exact = SparkEntry.queries("q_sim_cosine_topk")(spark, sf)
      .orderBy(col("cos").desc, col("vec_id")).collect()
      .map(_.getLong(0))
    val got = q("q_recall_curve").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    for (k <- Seq(1, 5, 10)) {
      val common = (ivf.take(k).toSet & exact.take(k).toSet).size.toLong
      val (gc, gr) = got(k.toLong)
      assert(gc === common)
      assert(math.abs(gr - rnd(common.toDouble / k * 100) / 100.0)
        <= 1e-9)
    }
  }

  test("q_silhouette_simple matches the post-hoc centroid fold") {
    val km = SparkEntry.queries("q_kmeans")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val byC = embs.filter(e => km.contains(e._1)).groupBy(e => km(e._1))
    val cents = byC.map { case (c, g) =>
      val dims = g.head._3.length
      c -> Array.tabulate(dims)(i =>
        (g.map(_._3(i).toDouble).sum / g.length).toFloat)
    }
    val sByC = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for (e <- embs if km.contains(e._1)) {
      val own = km(e._1)
      val a = 1.0 - cos(e._3, cents(own))
      val b = 1.0 - cents.filter(_._1 != own).values.map(cos(e._3, _)).max
      if (math.max(a, b) > 0) {
        val su = rnd((b - a) * 1e6 / math.max(a, b))
        val (n, sTot) = sByC.getOrElse(own, (0L, 0L))
        sByC(own) = (n + 1, sTot + su)
      }
    }
    val got = q("q_silhouette_simple").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === sByC.keySet.toSet)
    for ((c, (n, sTot)) <- sByC) {
      val (gn, gs) = got(c)
      assert(gn === n)
      assert(math.abs(gs - rnd(sTot.toDouble / n / 1e6 * 1e6) / 1e6)
        <= 1e-9)
    }
  }

  test("q_ipw_ate matches the stratified fold") {
    val users = evs.groupBy(_._1).toArray.map { case (u, g) =>
      val ne = g.length.toLong
      val nc = g.count(_._2 == "click").toLong
      val np = g.count(_._2 == "purchase").toLong
      (u, ne, if (nc * 1000 / ne >= 200) 1L else 0L, np * 1000 / ne)
    }.sortBy(x => (x._2, x._1))
    val n = users.length
    // ntile(10): first (n mod 10) bins get ceil(n/10)
    val bins = Array.fill(10)(scala.collection.mutable
      .ArrayBuffer.empty[(Long, Long)])
    val base = n / 10; val extra = n % 10
    var idx = 0
    for (b <- 0 until 10) {
      val sz = base + (if (b < extra) 1 else 0)
      for (_ <- 0 until sz) {
        bins(b) += ((users(idx)._3, users(idx)._4)); idx += 1
      }
    }
    var su = 0L; var used = 0L
    for (b <- bins if b.nonEmpty) {
      val nb = b.length.toLong
      val tb = b.map(_._1).sum
      if (tb > 0 && tb < nb) {
        val y1 = b.filter(_._1 == 1).map(_._2).sum
        val y0 = b.filter(_._1 == 0).map(_._2).sum
        su += rnd(nb.toDouble * (y1.toDouble / tb
          - y0.toDouble / (nb - tb)) * 1e6)
        used += 1
      }
    }
    val r = q("q_ipw_ate").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === n.toLong)
    assert(r(0).getLong(1) === used)
    assert(math.abs(r(0).getDouble(2)
      - rnd(su.toDouble / (n * 1e9) * 1e6) / 1e6) <= 1e-9)
  }

  test("q_textrank_keywords matches the integer pagerank fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0).split(" ", -1))
    val ecnt = scala.collection.mutable.Map.empty[(String, String), Long]
    for (toks <- docs; Array(a, b) <- toks.sliding(2).map(_.toArray)
         if toks.length >= 2 && a != b) {
      val k = if (a < b) (a, b) else (b, a)
      ecnt(k) = ecnt.getOrElse(k, 0L) + 1
    }
    val edges = ecnt.filter(_._2 >= 3).keys.toArray
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (w, g) => w -> g.map(_._2) }
    val nv = adj.size.toLong
    val base = 150000000L / nv
    var pr: Map[String, Long] = adj.keys.map(_ -> 1000000000L / nv).toMap
    for (_ <- 1 to 4) {
      val nxt = scala.collection.mutable.Map.empty[String, Long]
      for ((u, nbrs) <- adj; v <- nbrs)
        nxt(v) = nxt.getOrElse(v, 0L) + pr(u) / nbrs.length
      pr = nxt.map { case (v, sc) => v -> (base + sc * 85 / 100) }.toMap
    }
    val exp = pr.toArray.sortBy { case (w, p) => (-p, w) }.take(20)
    val got = q("q_textrank_keywords").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.length === exp.length)
    for ((((ew, ep), (gw, gs)), _) <- exp.zip(got).zipWithIndex) {
      assert(gw === ew)
      assert(math.abs(gs - rnd(ep / 1e9 * 1e6) / 1e6) <= 1e-9)
    }
  }

  test("q_hard_negatives matches the different-label top-10 fold") {
    val (qe, qlab) = embs.find(_._1 == 0).map(e => (e._3, e._2)).get
    val exp = embs.filter(e => e._1 != 0 && e._2 != qlab)
      .map(e => (e._1, e._2, cos(e._3, qe)))
      .sortBy(x => (-x._3, x._1)).take(10)
    val got = q("q_hard_negatives").collect()
      .map(r => (r.getLong(0), r.get(1).toString.toLong, r.getDouble(2)))
    assert(got.toSeq === exp.toSeq)
  }
}
