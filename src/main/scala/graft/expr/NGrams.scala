package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram generator (the UDTF/Generator surface, SURVEY.md §7.4):
  * emits one row per consecutive n-token window of the input array.
  *
  * A Generator multiplies rows inside the executor pipeline — the
  * n-gram explosion never materializes per-document arrays on the
  * driver, so it scales like built-in explode().
  */
case class NGrams(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  require(n >= 1, "n must be >= 1")
  override val inline: Boolean = false
  override def position: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema)

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Iterator.empty
    else (0 to arr.numElements() - n).iterator.map { i =>
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      InternalRow(UTF8String.fromString(sb.toString))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
