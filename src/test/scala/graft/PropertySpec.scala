package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{CosineSimilarity, KeccakCore, MinHashSignature, SimHash64}

/** ScalaCheck-generator property tests (SURVEY.md §5.2.4), evaluated
  * directly on the Catalyst expressions — deterministic seeds, no
  * SparkSession needed. (Plain Gen sampling: the scalatest-plus
  * bridge artifact isn't in the offline dependency cache.) */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default.withSize(20)
    (0 until n).flatMap(i => g.apply(params, Seed(i.toLong)))
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-100f, 100f)).map(_.toArray)

  private def cos(a: Array[Float], b: Array[Float]): Double =
    CosineSimilarity(
      Literal(new GenericArrayData(a.map(x => x: Any)), ArrayType(FloatType)),
      Literal(new GenericArrayData(b.map(x => x: Any)), ArrayType(FloatType)))
      .eval(null).asInstanceOf[Double]

  test("jaro_winkler: bounded, symmetric, identity, monotone under prefix damage") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      graft.expr.JaroCore.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    val strGen = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    samples(Gen.zip(strGen, strGen), 300).foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"jw($a,$b)=$s out of range")
      assert(s === jw(b, a), s"asymmetric on ($a,$b)")
    }
    samples(strGen, 100).foreach { a =>
      assert(jw(a, a) === 1.0, s"identity failed on $a")
    }
    // equality with an independent char-based reference implementation
    // (JaroCore is byte-based with its own loop structure)
    def ref(a: String, b: String): Double = {
      if (a.isEmpty || b.isEmpty) return 0.0
      val w = math.max(0, math.max(a.length, b.length) / 2 - 1)
      val bm = Array.fill(b.length)(false)
      val pairs = a.zipWithIndex.flatMap { case (ch, i) =>
        ((i - w).max(0) to (i + w).min(b.length - 1))
          .find(j => !bm(j) && b(j) == ch).map { j => bm(j) = true; (i, j) }
      }
      val m = pairs.length
      if (m == 0) return 0.0
      val t = pairs.map(_._2).sliding(2).count { case Seq(x, y) => x > y; case _ => false } match {
        case _ => // transpositions = matched chars out of order / 2, computed as in the classic
          val bOrder = pairs.sortBy(_._1).map(_._2)
          val aChars = pairs.sortBy(_._1).map(p => a(p._1))
          val bChars = bOrder.sorted.map(b(_))
          aChars.zip(bChars).count { case (x, y) => x != y } / 2
      }
      val j = (m.toDouble / a.length + m.toDouble / b.length + (m - t).toDouble / m) / 3.0
      if (j <= 0.7) j
      else j + a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size * 0.1 * (1.0 - j)
    }
    samples(Gen.zip(strGen, strGen), 500).foreach { case (a, b) =>
      assert(math.abs(jw(a, b) - ref(a, b)) < 1e-12,
        s"jw($a,$b)=${jw(a, b)} ref=${ref(a, b)}")
    }
  }

  test("cosine: self-similarity ~1, bounded, symmetric") {
    samples(vecGen, 100).filter(_.exists(_ != 0f)).foreach { v =>
      assert(math.abs(cos(v, v) - 1.0) < 1e-9)
    }
    val pairs = samples(Gen.zip(vecGen, vecGen), 100)
    pairs.foreach { case (a, b) =>
      val n = math.min(a.length, b.length)
      val (x, y) = (a.take(n), b.take(n))
      if (x.exists(_ != 0f) && y.exists(_ != 0f)) {
        val c = cos(x, y)
        assert(c <= 1.0 + 1e-9 && c >= -1.0 - 1e-9, s"c=$c")
        assert(math.abs(c - cos(y, x)) < 1e-12)
      }
    }
  }

  private def strArr(ts: Seq[String]) =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t): Any).toArray)

  private val toksGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("spark", "join", "hash", "scan", "merge", "row",
      "batch", "filter", "sort", "agg"))

  test("minhash: permutation-invariant, fixed length, deterministic") {
    val mh = MinHashSignature(BoundReference(0, ArrayType(StringType), nullable = false), 32)
    def sig(ts: Seq[String]): Seq[Long] =
      mh.eval(InternalRow(strArr(ts)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    val rnd = new scala.util.Random(7)
    samples(toksGen, 100).foreach { ts =>
      val d = ts.distinct
      val s1 = sig(d)
      assert(s1.length === 32)
      assert(s1 === sig(rnd.shuffle(d)))
      assert(s1 === sig(d))
    }
  }

  test("simhash: order-invariant for multisets, deterministic") {
    val sh = SimHash64(BoundReference(0, ArrayType(StringType), nullable = false))
    def fp(ts: Seq[String]): Long =
      sh.eval(InternalRow(strArr(ts))).asInstanceOf[Long]
    val rnd = new scala.util.Random(11)
    samples(toksGen, 100).foreach { ts =>
      assert(fp(ts) === fp(rnd.shuffle(ts)))
    }
  }

  test("keccak256: 32 bytes, deterministic, input-sensitive") {
    samples(Gen.alphaNumStr, 100).foreach { s =>
      val h1 = KeccakCore.hash256(s.getBytes("UTF-8"))
      assert(h1.length === 32)
      assert(KeccakCore.hex(h1) === KeccakCore.hex(KeccakCore.hash256(s.getBytes("UTF-8"))))
      assert(KeccakCore.hex(h1) !== KeccakCore.hex(KeccakCore.hash256((s + "x").getBytes("UTF-8"))))
    }
  }

  test("EIP-55 checksum is a fixpoint and preserves hex value") {
    val hexGen = Gen.listOfN(40, Gen.oneOf("0123456789abcdef".toSeq)).map("0x" + _.mkString)
    samples(hexGen, 100).foreach { addr =>
      val cs = KeccakCore.toChecksumAddress(addr)
      assert(cs.toLowerCase === addr.toLowerCase)
      assert(KeccakCore.toChecksumAddress(cs) === cs)
    }
  }
}
