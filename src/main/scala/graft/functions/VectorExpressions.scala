package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels shared by interpreted eval and generated Java (top-level
  * object → static forwarders callable from janino codegen). */
object VectorKernels {
  def cosine(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Native Catalyst cosine similarity over two `array<double>` columns,
  * with whole-stage codegen (`doGenCode`) — the (b)-tier extension from
  * the build brief: a scalar kernel too hot for interpreted higher-order
  * functions, expressed as a first-class expression so Catalyst can
  * still prune, push down and fuse around it.
  *
  * Arithmetic is the same sequential dot/norm loop used by q43's
  * block-scan and by the HOF formulation, so all cosine paths in the
  * engine agree bit-for-bit.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData].toDoubleArray(),
                         b.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.VectorKernels.cosine(" +
        s"$a.toDoubleArray(), $b.toDoubleArray());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Custom Catalyst Generator (the udtf_gen stretch goal, SURVEY.md §2B):
  * emits the n-token shingles of a string array — the row-generation
  * primitive under MinHash (q46) and fingerprinting (q51). Documents
  * with fewer than n tokens emit no rows, matching the
  * `range(1, len-1)`-based SQL formulation.
  */
case class NGrams(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)
  override def prettyName: String = "ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) Nil
    else {
      val arr = data.asInstanceOf[ArrayData]
      val toks = new Array[UTF8String](arr.numElements())
      var i = 0
      while (i < toks.length) { toks(i) = arr.getUTF8String(i); i += 1 }
      (0 to toks.length - n).map { s =>
        InternalRow(UTF8String.concatWs(UTF8String.fromString(" "),
          toks.slice(s, s + n).toIndexedSeq: _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API bridge for the graft-native expressions. */
object GraftFunctions {
  def cosineSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def ngrams(tokens: Column, n: Int): Column =
    ExpressionUtils.column(NGrams(ExpressionUtils.expression(tokens), n))
}
