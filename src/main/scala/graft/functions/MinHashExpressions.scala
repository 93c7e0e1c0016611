package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** In-place MinHash-LSH banding kernel (SURVEY.md §2B q46 family).
  *
  * Motivation (measured, r9): the column-level banding pipeline —
  * `NGrams` generate → `md5` → groupBy(doc_id).agg(8 × min(rotation))
  * → band explode — is already partial-aggregated map-side, but it
  * still materializes one (doc_id, 32-hex) row per shingle into the
  * aggregation hash map and carries one exchange of (doc_id, 8 minima)
  * rows; the pure-HOF per-row formulation removes the exchange but
  * runs interpreted (`transform`/`array_min` are CodegenFallback in
  * Spark 4) and measured ~14× SLOWER at sf0.1. This kernel is the
  * LshSignature move (VectorExpressions.scala): the whole
  * signature+banding computation per document in one codegen'd pass —
  * no generate, no aggregation, no exchange, no interpreted HOFs.
  *
  * Semantics are bit-identical to the aggregate formulation (equality
  * spec-asserted against an independent HOF reference, and every
  * consumer query is DuckDB-oracled): for each 3-token shingle,
  * md5 lowercase hex; minhash_i = min over shingles of the 4·i-nibble
  * left-rotation of the hex (rotations of a uniform hash stay uniform;
  * hex order = byte order, so min is a valid min-hash); band key j =
  * `"j:" + h(j·rpb) + … + h(j·rpb+rpb−1)`. Documents with fewer than 3
  * tokens emit an empty array (the aggregate formulation emits no
  * rows). Comparisons run lazily against the current minimum with
  * index arithmetic — a rotation string is only materialized when it
  * becomes the new minimum.
  */
object MinHashKernels {

  private val Space = UTF8String.fromString(" ")

  /** rotation(hex, 4r) < cur, without materializing the rotation. */
  private def rotLess(hex: String, r4: Int, cur: String): Boolean = {
    var i = 0
    while (i < 32) {
      val c = hex.charAt((i + r4) % 32)
      val d = cur.charAt(i)
      if (c != d) return c < d
      i += 1
    }
    false
  }

  def bandKeys(toks: ArrayData, nHashes: Int, bands: Int): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val minima = new Array[String](nHashes)
    var s = 0
    while (s + 2 < n) {
      val sh = UTF8String.concatWs(Space, toks.getUTF8String(s),
        toks.getUTF8String(s + 1), toks.getUTF8String(s + 2))
      val hex =
        org.apache.commons.codec.digest.DigestUtils.md5Hex(sh.getBytes)
      var r = 0
      while (r < nHashes) {
        if (minima(r) == null || rotLess(hex, 4 * r, minima(r)))
          minima(r) = hex.substring(4 * r) + hex.substring(0, 4 * r)
        r += 1
      }
      s += 1
    }
    val rpb = nHashes / bands
    val out = new Array[Any](bands)
    var j = 0
    while (j < bands) {
      val sb = new java.lang.StringBuilder(2 + 32 * rpb)
      sb.append(j).append(':')
      var r = 0
      while (r < rpb) { sb.append(minima(j * rpb + r)); r += 1 }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd per-document MinHash band keys over an `array<string>`
  * token column — see [[MinHashKernels.bandKeys]]. One map-stage
  * expression replaces the generate→md5→groupBy→explode pipeline of
  * the aggregate formulation, which is what lets q109 band a STREAM
  * (a per-row projection is stateless) and removes the banding
  * exchange from every batch consumer (q46/q76/q82/q108).
  */
case class MinHashBandKeys(child: Expression, nHashes: Int, bands: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(nHashes >= 1 && nHashes <= 8, s"nHashes in [1,8], got $nHashes")
  require(bands >= 1 && nHashes % bands == 0,
          s"bands must divide nHashes, got ($nHashes, $bands)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  override protected def nullSafeEval(a: Any): Any =
    MinHashKernels.bandKeys(a.asInstanceOf[ArrayData], nHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.MinHashKernels" +
        s".bandKeys($a, $nHashes, $bands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
