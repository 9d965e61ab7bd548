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
