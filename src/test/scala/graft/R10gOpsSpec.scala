package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-7 key-level pins (queries/StatsR10g.scala +
  * s_stream_substring_dup): pure-Scala folds over sf0.001.
  */
class R10gOpsSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val docs: Array[(Long, String, String, Long)] =
    graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))

  test("q_dataset_fingerprint matches the ordered md5-chain fold") {
    def chain(g: Array[(Long, String, String, Long)]) =
      md5(g.sortBy(_._1).map(d => md5(d._3)).mkString(""))
    val bySrc = docs.groupBy(_._2).toArray.map { case (s0, g) =>
      (s0, g.length.toLong, g.map(_._4).sum, chain(g))
    }
    val want = (bySrc :+ (("ALL", docs.length.toLong,
      docs.map(_._4).sum, chain(docs)))).sortBy(_._1)
    val got = q("q_dataset_fingerprint").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("s_stream_substring_dup matches the sharded windowed-bloom fold") {
    val ps = Array(2654435761L, 2246822519L, 3266489917L)
    val qs = Array(1L, 7L, 13L)
    // windows in (doc_id, index) order; 60-bit h from the md5 prefix
    val windows = docs.sortBy(_._1).flatMap { case (id, _, t, _) =>
      val toks = t.split(" ")
      if (toks.length < 10) Seq.empty
      else (0 to toks.length - 10).map { i =>
        val h = java.lang.Long.parseLong(
          md5(toks.slice(i, i + 10).mkString(" ")).take(15), 16)
        (id, i.toLong, h)
      }
    }
    val bits = Array.fill(8)(new Array[Boolean](4096))
    var fl = 0L
    windows.foreach { case (_, _, h) =>
      // shard = (h·C mod 2^63) mod 8 — BigInt mirrors the DECIMAL form
      val sh = ((BigInt(h) * 2654435761L)
        .mod(BigInt(1) << 63) % 8).toInt
      val hs = (0 to 2).map(j =>
        (((h * ps(j) + qs(j)) & 0x7FFFFFFFFFFFFFFFL)
          % 2147483647L % 4096L).toInt)
      if (hs.forall(bits(sh)(_))) fl += 1
      hs.foreach(bits(sh)(_) = true)
    }
    val r = q("s_stream_substring_dup").collect()(0)
    assert(r.getLong(0) == windows.length.toLong)
    assert(r.getLong(1) == fl)
  }
}
