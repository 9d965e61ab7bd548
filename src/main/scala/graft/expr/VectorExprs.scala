package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity over two array<float> columns as a native
  * codegen'd Catalyst expression (SURVEY.md §4.2/§7.4).
  *
  * One fused pass computes dot product and both norms — versus the
  * higher-order-function composition (zip_with + three aggregate
  * folds) this stays inside whole-stage codegen with zero per-row
  * allocations, which is what makes brute-force re-ranking viable at
  * scale. Accumulation order is ascending-index, matching the HOF
  * and DuckDB-list formulations, so results agree bit-for-bit.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // every local is ctx.freshName'd: two cosine_sim calls fused into one
  // generated projection must not collide (Janino "Redefinition of local
  // variable" → silent interpreter fallback); pinned in ExprSpec.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** MinHash signature of a token set: array<long> of `numPerms`
  * minimums over universal-hash permutations (SURVEY.md §2 B.10).
  *
  * Permutation i applies an affine mix (splitmix64-derived odd
  * constants, fixed seeds → fully deterministic across runs/engines)
  * to a 64-bit base hash of each token. One pass over the tokens per
  * row, no shuffle — the LSH banding join downstream is what turns
  * this into a sub-quadratic candidate generator at corpus scale.
  */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val coefA: Array[Long] =
    Array.tabulate(numPerms)(i => Mix.splitmix64(0x9E3779B97F4A7C15L + i) | 1L)
  @transient private lazy val coefB: Array[Long] =
    Array.tabulate(numPerms)(i => Mix.splitmix64(0xD1B54A32D192ED03L + i))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var t = 0
    while (t < arr.numElements()) {
      val tok = arr.getUTF8String(t)
      val base = Mix.splitmix64(tok.hashCode.toLong ^ (tok.numBytes().toLong << 32))
      var i = 0
      while (i < numPerms) {
        val h = coefA(i) * base + coefB(i)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  // generated code mirrors nullSafeEval exactly (same arithmetic, same
  // iteration order) — the signature values are bit-identical whether
  // this runs interpreted or fused into WholeStageCodegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val a = ctx.addReferenceObj("minhashCoefA", coefA, "long[]")
      val b = ctx.addReferenceObj("minhashCoefB", coefB, "long[]")
      val mins = ctx.freshName("mins")
      val nTok = ctx.freshName("nTok")
      val t = ctx.freshName("t")
      val tok = ctx.freshName("tok")
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$numPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $nTok = $arr.numElements();
         |for (int $t = 0; $t < $nTok; $t++) {
         |  org.apache.spark.unsafe.types.UTF8String $tok = $arr.getUTF8String($t);
         |  long $base = graft.expr.Mix.splitmix64(
         |    (long) $tok.hashCode() ^ ((long) $tok.numBytes() << 32));
         |  for (int $i = 0; $i < $numPerms; $i++) {
         |    long $h = $a[$i] * $base + $b[$i];
         |    if ($h < $mins[$i]) $mins[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** 64-bit SimHash document fingerprint over a token array: per-token
  * 64-bit hash votes ±1 on every bit; the sign vector is the
  * fingerprint. Near-duplicate docs land within small Hamming
  * distance — a constant-size sketch per document (OMIT oracle;
  * property-tested). */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val nTok = ctx.freshName("nTok")
      val t = ctx.freshName("t")
      val tok = ctx.freshName("tok")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val b2 = ctx.freshName("b2")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |int $nTok = $arr.numElements();
         |for (int $t = 0; $t < $nTok; $t++) {
         |  org.apache.spark.unsafe.types.UTF8String $tok = $arr.getUTF8String($t);
         |  long $h = graft.expr.Mix.splitmix64(
         |    (long) $tok.hashCode() ^ ((long) $tok.numBytes() << 32));
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b2 = 0; $b2 < 64; $b2++) { if ($votes[$b2] > 0) $out |= (1L << $b2); }
         |${ev.value} = $out;
       """.stripMargin
    })

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    while (t < arr.numElements()) {
      val tok = arr.getUTF8String(t)
      val h = Mix.splitmix64(tok.hashCode.toLong ^ (tok.numBytes().toLong << 32))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Public: called from Janino-generated whole-stage code. */
object Mix {
  /** splitmix64 finalizer — public-domain mixing constants. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}

/** Sorted distinct 64-bit bigram-shingle hashes of a token array — the
  * document representation for count-based shingle dedup
  * (graft.operators.SetSimJoin.pairsByCount). One codegen'd pass
  * replaces the interpreted HOF chain transform(sequence)+concat+
  * array_distinct+sort, whose per-element boxed allocations dominate
  * at high parallelism. Hashing shingles to longs is the standard
  * large-corpus dedup representation (8-byte primitives through
  * explode/shuffle instead of strings); with a 64-bit space, corpus
  * vocabularies collide with probability ~|V|^2/2^65 — negligible, and
  * asserted zero on this corpus in ShingleSpec.
  */
case class BigramHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleOps.bigramHashes(input.asInstanceOf[ArrayData])

  // generated code calls the same static helper — one virtual call per
  // row, primitive long[] inside; bit-identical to interpreted eval
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.expr.ShingleOps.bigramHashes($arr);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Public: called from Janino-generated whole-stage code. */
object ShingleOps {
  private def base(t: org.apache.spark.unsafe.types.UTF8String): Long =
    Mix.splitmix64(t.hashCode.toLong ^ (t.numBytes().toLong << 32))

  private def sortDedup(hs: Array[Long]): ArrayData = {
    java.util.Arrays.sort(hs)
    var m = 1
    var j = 1
    while (j < hs.length) {
      if (hs(j) != hs(j - 1)) { hs(m) = hs(j); m += 1 }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(hs, m))
  }

  def bigramHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n - 1)
    var prev = base(arr.getUTF8String(0))
    var i = 0
    while (i < n - 1) {
      val next = base(arr.getUTF8String(i + 1))
      hs(i) = Mix.splitmix64(prev ^ (next * 0xC2B2AE3D27D4EB4FL))
      prev = next
      i += 1
    }
    sortDedup(hs)
  }

  def tokenHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = base(arr.getUTF8String(i)); i += 1 }
    sortDedup(hs)
  }

  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Merge-walk dot product over two key-sorted (key: string,
    * weight: long) struct arrays: Σ wa·wb over matching keys, exact
    * long arithmetic. The weighted sibling of
    * [[sortedIntersectCount]] — replaces an exploded
    * pair×term join + re-aggregation (r14, q_tfidf_rerank). Key order
    * must be the binary UTF8 order `array_sort` produces for the
    * struct's first field. */
  def sortedDot(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < na && j < nb) {
      val x = a.getStruct(i, 2)
      val y = b.getStruct(j, 2)
      val c = x.getUTF8String(0).compareTo(y.getUTF8String(0))
      if (c == 0) { s += x.getLong(1) * y.getLong(1); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    s
  }
}

/** Sorted distinct 64-bit hashes of a token array (unigram sibling of
  * [[BigramHashes]]) — the document representation for the hashed
  * set-similarity joins in graft.operators.SetSimJoin. */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleOps.tokenHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.expr.ShingleOps.tokenHashes($arr);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Intersection size of two ASCENDING-sorted long arrays via a linear
  * merge — zero allocation, whole-stage-codegen. This is the exact
  * verification step of the prefix-filtered set-similarity join: with
  * documents as sorted hash arrays, verify costs |A|+|B| primitive
  * comparisons instead of an interpreted string-set intersection.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleOps.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.ShingleOps.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** sorted_dot(a, b) over two key-sorted array<struct<string, long>>
  * columns: exact long Σ wa·wb over matching keys
  * ([[ShingleOps.sortedDot]]). */
case class SortedDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleOps.sortedDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.ShingleOps.sortedDot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine_sim(x, x) reduced to its exact value: null for a null array,
  * NaN for an empty/zero-norm vector (0/0, matching the unfolded
  * expression), 1.0 otherwise — found by an early-exit scan for the
  * first non-zero component, so the usual cost is O(1) instead of a
  * full fused dot/norm pass. Installed by the FoldSelfCosine optimizer
  * rule; never user-facing.
  *
  * (The unfolded cosine_sim(x, x) = na / (sqrt(na) * sqrt(na)) can be
  * 1 ulp off 1.0 in floating point; this returns the mathematically
  * exact 1.0 — pinned as the deliberate behavior in RuleSpec.)
  */
case class SelfCosine(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.getFloat(i) != 0.0f) return 1.0
      i += 1
    }
    Double.NaN
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = Double.NaN;
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.getFloat($i) != 0.0f) { ${ev.value} = 1.0; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
