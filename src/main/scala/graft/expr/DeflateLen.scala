package graft.expr

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string, as a native codegen'd
  * expression (SURVEY.md §2 B.10 text-quality family).
  *
  * Compressibility is a classic corpus-quality signal: machine-
  * generated or template text compresses far below natural prose, so
  * `deflate_len(text) / octet_length(text)` is a cheap single-pass
  * heuristic used alongside repetition and entropy scores when
  * curating web-scale training data (same family as the Gopher
  * repetition rules — PAPERS.md). Neither Spark nor DuckDB exposes a
  * compressed-size function, so this is the custom-scalar-Expression
  * case: JDK zlib (`java.util.zip.Deflater`) behind whole-stage
  * codegen; the key is DuckDB-unoracled and carries a unit contract
  * instead (ExprSpec: roundtrip via Inflater, interpreted == codegen,
  * repetitive ≪ high-entropy).
  *
  * Determinism: fixed level + raw-deflate (nowrap) on a fixed JDK
  * zlib makes the length a pure function of the bytes — the run-twice
  * byte-equality gate (SURVEY §7.6.1) holds. The Deflater is native-
  * backed and expensive to construct, so one instance per thread is
  * kept and `reset()` between rows; `end()` is intentionally left to
  * finalization (executor threads are long-lived and pooled).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    DeflateLen.dlen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.DeflateLen.dlen($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DeflateLen {
  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
  }

  /** Shared by the interpreted and generated paths. */
  def dlen(s: UTF8String): Int = {
    val in = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
