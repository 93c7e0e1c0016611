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

  /** Winnowed minimizer hashes — see [[MinimizerHashes]]. Same grams
    * (`md5(concat_ws(' ', slice(t, i, n)))` identity), same w-window
    * minima, distinct survivors in first-occurrence order. */
  def minimizers(toks: ArrayData, n: Int, w: Int,
                 shortMin: Boolean): ArrayData = {
    val nt = toks.numElements()
    if (nt < n) return new GenericArrayData(Array.empty[Any])
    val g = nt - n + 1
    if (!shortMin && g < w) return new GenericArrayData(Array.empty[Any])
    val hex = new Array[String](g)
    var i = 0
    while (i < g) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
      val gram = UTF8String.concatWs(Space, parts: _*)
      hex(i) =
        org.apache.commons.codec.digest.DigestUtils.md5Hex(gram.getBytes)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    if (g < w) {
      // short doc: the single global-min gram survives
      var m = hex(0); var t = 1
      while (t < g) { if (hex(t) < m) m = hex(t); t += 1 }
      seen.add(m)
    } else {
      var j = 0
      while (j + w <= g) {
        var m = hex(j); var t = j + 1
        while (t < j + w) { if (hex(t) < m) m = hex(t); t += 1 }
        seen.add(m)
        j += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
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

/** Codegen'd winnowed minimizer emission over an `array<string>` token
  * column (Roberts et al. 2004; the q96/q103/q227/q341 selection) —
  * md5 each n-token gram, keep a hash only when it is the minimum of
  * some w-gram window, return the DISTINCT survivors in first-
  * occurrence order (the `array_distinct` convention; consumers treat
  * the result as a set). `shortDocGlobalMin` selects the two declared
  * short-doc semantics: q96's tier keeps a single global-min gram for
  * docs with fewer than w grams (every ≥ n-token doc stays in the
  * tier); q227's candidate generator emits nothing (complete windows
  * only). Replaces the interpreted transform/array_min HOF chain —
  * the same class of CodegenFallback the r14 lattice kernels removed,
  * and the hot half of q96's 100× line. Bit-identical selection: same
  * grams, same md5 identity, same window minima. */
case class MinimizerHashes(child: Expression, n: Int, w: Int,
                           shortDocGlobalMin: Boolean)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && w >= 1, s"need n, w >= 1, got ($n, $w)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minimizer_hashes"

  override protected def nullSafeEval(a: Any): Any =
    MinHashKernels.minimizers(a.asInstanceOf[ArrayData], n, w,
                              shortDocGlobalMin)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.MinHashKernels" +
        s".minimizers($a, $n, $w, $shortDocGlobalMin);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
