package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic tests for the round-4 operators beyond the oracle compare:
  * funnel ordering edge cases, EWMA closed-form ≡ direct recurrence,
  * k-means cluster separation on a crafted corpus, fuzzy-match banding
  * completeness vs brute force, MAD outlier flagging. Synthetic-table
  * cases write a one-off parquet dir and pass it as the query's sfDir
  * — the same entry path the driver uses.
  */
class R4OpsSpec extends AnyFunSuite with SparkFixture {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_r4spec_$tag").toString

  // ---- q_funnel: full recompute of every user from the raw events ----

  test("q_funnel matches a driver-side recompute of every user at sf0.001") {
    import spark.implicits._
    val raw = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)].collect()
    val byUser = raw.groupBy(_._1)
    val expected = byUser.flatMap { case (uid, evs) =>
      val t1 = evs.filter(_._2 == "view").map(_._3).minOption
      t1.map { v =>
        val t2 = evs.filter(e => e._2 == "click" && e._3 > v).map(_._3).minOption
        val t3 = t2.flatMap(c =>
          evs.filter(e => e._2 == "purchase" && e._3 > c).map(_._3).minOption)
        val stage = 1 + t2.size + t3.size
        uid -> ((v, t2, t3, stage))
      }
    }
    val got = SparkEntry.queries("q_funnel")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (t1, t2, t3, stage) = expected(r.getLong(0))
      assert(r.getLong(1) === t1)
      assert((if (r.isNullAt(2)) None else Some(r.getLong(2))) === t2)
      assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) === t3)
      assert(r.getInt(4) === stage)
    }
  }

  test("q_funnel ignores a purchase that precedes the first click") {
    // user 1: view(1) -> purchase(2) -> click(3): stage must be 2, t3 null
    // user 2: click(1) -> view(2) -> click(3) -> purchase(4): full funnel
    // user 3: purchase-only: absent (no view)
    import spark.implicits._
    val dir = tmpDir("funnel")
    val rows = Seq(
      (1L, 1000L * 1000, 1L, "view", 1.0, "{}"),
      (2L, 2000L * 1000, 1L, "purchase", 1.0, "{}"),
      (3L, 3000L * 1000, 1L, "click", 1.0, "{}"),
      (4L, 1000L * 1000, 2L, "click", 1.0, "{}"),
      (5L, 2000L * 1000, 2L, "view", 1.0, "{}"),
      (6L, 3000L * 1000, 2L, "click", 1.0, "{}"),
      (7L, 4000L * 1000, 2L, "purchase", 1.0, "{}"),
      (8L, 1000L * 1000, 3L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_funnel")(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val u1 = got(0); val u2 = got(1)
    assert(u1.getInt(4) === 2 && u1.isNullAt(3)) // purchase before click ignored
    assert(u2.getInt(4) === 3 && u2.getLong(1) === 2000L) // pre-view click ignored
  }

  // ---- q_ewma: closed form equals the direct recurrence ----

  test("q_ewma equals the direct recurrence y_i = 0.2 x_i + 0.8 y_{i-1}") {
    val rows = SparkEntry.queries("q_ewma")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, series) =>
      var y = 0.0
      series.zipWithIndex.foreach { case (r, i) =>
        val x = r.getLong(2).toDouble
        y = if (i == 0) x else 0.2 * x + 0.8 * y
        assert(math.abs(r.getDouble(3) - y) < 6e-5,
          s"row $i: got ${r.getDouble(3)}, recurrence $y")
      }
    }
  }

  // ---- q_kmeans: separation on a crafted two-cluster corpus ----

  test("q_kmeans separates two crisp clusters and assigns every vector once") {
    import spark.implicits._
    val dir = tmpDir("kmeans")
    def v(base: Array[Float], eps: Float): Array[Float] =
      base.zipWithIndex.map { case (x, i) => x + (if (i == 0) eps else 0f) }
    val a = Array(10f, 0f, 0f, 0f); val b = Array(0f, 10f, 0f, 0f)
    val rows = Seq(
      (1L, v(a, 0.1f), 0), (2L, v(a, 0.2f), 0), (3L, v(a, 0.3f), 0),
      (4L, v(b, 0.1f), 1),
      (5L, v(a, 0.4f), 0), (6L, v(a, 0.5f), 0),
      (7L, v(b, 0.2f), 1), (8L, v(b, 0.3f), 1))
      .toDF("vec_id", "embedding", "label")
    rows.write.parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q_kmeans")(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq === (1L to 8L)) // each vector exactly once
    val cid = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aIds = Seq(1L, 2L, 3L, 5L, 6L); val bIds = Seq(4L, 7L, 8L)
    assert(aIds.map(cid).forall(Set(1L, 2L, 3L)), s"A-cluster got ${aIds.map(cid)}")
    assert(bIds.map(cid).forall(_ == 4L), s"B-cluster got ${bIds.map(cid)}")
    got.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  // ---- q_fuzzy_match: banding loses no true pair ----

  test("q_fuzzy_match equals brute force over band-boundary-crossing names") {
    import spark.implicits._
    val dir = tmpDir("fuzzy")
    // lengths straddle the width-4 band edges (3|4 and 7|8); dist<=3
    // pairs exist within and across bands, plus far pairs to exclude
    val names = Seq(
      "cat", "cart", "carts", "charts", // chain of dist-1 steps, len 3..6
      "abcdefg", "abcdefgh", "abcdefghi", // len 7|8|9 across a band edge
      "zzzzzzzzzzzz", "qqqq", "pelican")
    names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name").write.parquet(s"$dir/part.parquet")
    val got = SparkEntry.queries("q_fuzzy_match")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val expected = (for {
      x <- names; y <- names if x < y
      dd = lev(x, y) if dd <= 3
    } yield (x, y, dd)).toSet
    assert(expected.exists { case (a, b, _) => (a.length / 4) != (b.length / 4) },
      "fixture must include a cross-band true pair")
    assert(got === expected)
  }

  // ---- q_anomaly_mad: a planted extreme outlier is flagged ----

  test("q_anomaly_mad flags exactly the planted outlier") {
    import spark.implicits._
    val dir = tmpDir("mad")
    val base = (0 until 100).map(i =>
      (i.toLong, 1000L * 1000 * (i + 1), 1L, "x", 10.0 + i * 0.01, "{}"))
    val rows = base :+ ((999L, 1000L * 1000 * 200, 1L, "x", 1000.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_anomaly_mad")(spark, dir).collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getLong(3) === 1L, s"n_out = ${r.getLong(3)}")   // exactly one outlier
    assert(r.getLong(4) === 999L)                             // and it is event 999
  }

  // ---- jaro_winkler: classic vectors + DuckDB-pinned semantics ----

  test("jaro_winkler matches the classic vectors and DuckDB edge semantics") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      graft.expr.JaroCore.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("small ring", "small wing") - 0.96) < 1e-12)
    assert(jw("", "") === 0.0)          // DuckDB: empties score 0, not 1
    assert(jw("a", "") === 0.0)
    assert(jw("ab", "ba") === 0.0)      // window 0: no cross-position match
    assert(jw("aaa", "aaa") === 1.0)
    // no Winkler boost at jaro <= 0.7 despite the shared prefix
    assert(math.abs(jw("aquickbrown", "azzzzzzzz") - 0.4006734006734007) < 1e-12)
    assert(math.abs(jw("crate", "trace") - 0.7333333333333334) < 1e-12)
  }

  // ---- q_retention_cohort: internal consistency at sf0.001 ----

  test("q_retention_cohort offset-0 counts equal cohort sizes, retention never exceeds them") {
    val got = SparkEntry.queries("q_retention_cohort")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val cohortSize = got.filter(_._2 == 0).map(t => t._1 -> t._3).toMap
    assert(cohortSize.nonEmpty)
    got.foreach { case (cw, off, n) =>
      assert(off >= 0)
      assert(n <= cohortSize(cw), s"cohort $cw offset $off: $n > ${cohortSize(cw)}")
    }
  }
}
