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

  /** ArrayData-direct variant used by codegen: reading `getDouble(i)`
    * off the (Unsafe)ArrayData avoids materializing two fresh
    * Array[Double] per evaluated pair — in an O(n²) broadcast scan the
    * per-pair allocation dominates the arithmetic. Same sequential
    * fold, bit-identical result. */
  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val a = x.getDouble(i); val b = y.getDouble(i)
      dot += a * b; na += a * a; nb += b * b; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Plain dot product — same sequential fold as [[cosine]]'s `dot`
    * accumulator (independent accumulators, so splitting them off is
    * bit-neutral). With per-vector stored norms this gives
    * `dot(a,b)/(norm_a*norm_b)` == `cosine(a,b)` bit-for-bit — FOR
    * EQUAL-LENGTH vectors (the engine's dim=64 embedding contract):
    * [[norm]] folds its whole vector while [[cosine]] folds only
    * min(|x|,|y|) elements, so the decomposition diverges on ragged
    * pairs. */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var i = 0
    while (i < n) { d += x.getDouble(i) * y.getDouble(i); i += 1 }
    d
  }

  /** L2 norm — the same sum-of-squares fold as [[cosine]]'s `na`
    * (over the FULL vector; see the equal-length caveat on [[dot]]). */
  def norm(x: ArrayData): Double = {
    val n = x.numElements()
    var nn = 0.0; var i = 0
    while (i < n) { val a = x.getDouble(i); nn += a * a; i += 1 }
    math.sqrt(nn)
  }

  /** Squared L2 distance — the same sequential `Σ (x_i − y_i)²` fold
    * [[argminCentroid]] scores candidates with (and the SQL
    * `list_sum(list_transform(...))` formulation performs), exposed as
    * its own kernel for the PQ asymmetric-distance lookup (q100): the
    * distance between a query SUBvector and an assigned codeword is one
    * in-place fold, no per-row allocation. Lengths must MATCH: the PQ
    * path always passes equal-length subvectors, so a mismatch means a
    * bad slice bound or codebook packing bug — failing loudly beats the
    * plausible-but-wrong distances a silent min-length truncation would
    * produce. */
  def sqL2(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    require(y.numElements() == n,
            s"sqL2 dimension mismatch: $n vs ${y.numElements()}")
    var d = 0.0; var i = 0
    while (i < n) {
      val t = x.getDouble(i) - y.getDouble(i); d += t * t; i += 1
    }
    d
  }

  /** Nearest-centroid assignment by squared L2 (IVF coarse quantizer,
    * q73): `cents` is an `array<struct<cid: long, cv: array<double>>>` —
    * the whole (small) centroid table packed into ONE broadcast row —
    * and the result is the cid minimizing sequential-fold
    * `Σ (v_i − cv_i)²`, ties to the smaller cid. The fold order matches
    * the SQL formulation (`list_sum(list_transform(...))`) element for
    * element, so the chosen cell is bit-identical to the oracle's
    * `row_number() OVER (ORDER BY dist, cid)` pick. Reads both
    * ArrayData in place — no per-row allocation — so the assignment of
    * n vectors to C centroids is one codegen'd map pass: zero shuffle,
    * versus the crossJoin(n×C)+window-sort formulation it replaced. */
  def argminCentroid(v: ArrayData, cents: ArrayData): Long = {
    val c = cents.numElements()
    var best = Double.PositiveInfinity
    var bestCid = Long.MaxValue
    var k = 0
    while (k < c) {
      val st = cents.getStruct(k, 2)
      val cid = st.getLong(0)
      val cv = st.getArray(1)
      val n = math.min(v.numElements(), cv.numElements())
      var dist = 0.0; var i = 0
      while (i < n) {
        val d = v.getDouble(i) - cv.getDouble(i); dist += d * d; i += 1
      }
      if (dist < best || (dist == best && cid < bestCid)) {
        best = dist; bestCid = cid
      }
      k += 1
    }
    bestCid
  }

  /** Exact integer dot product over two `array<bigint>` lattice
    * vectors — the q311/q339 SemDeDup family's hot fold. Same
    * sequential Σ x_i·y_i the SQL HOF
    * (`aggregate(zip_with(x, y, (x,y) -> x*y), 0, +)`) computes; for
    * the engine's 64-dim 1e6-lattice contract the accumulator stays
    * far inside Long range (|x_i| ≤ 2e6 ⇒ Σ ≤ 64·4e12 ≈ 2.6e14). The
    * r14 measurement that motivated it: the interpreted HOF form made
    * a 25M-pair stage run at ~0.4M dots/s — the pair join's whole
    * wall-clock. */
  def dotLong(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L; var i = 0
    while (i < n) { d += x.getLong(i) * y.getLong(i); i += 1 }
    d
  }

  /** [[argminCentroid]] on the INTEGER lattice (`v`: array<bigint>,
    * `cents`: array<struct<cid: long, ci: array<bigint>>>) — the
    * Lloyd assignment's argmin (q222/q311/q339) as one codegen'd
    * fold: exact integer Σ (v_i − c_i)² per centroid, min dist with
    * ties to the smaller cid — identical to the SQL
    * `array_min(transform(cents, …struct(dist, cid)))` pick and the
    * oracle's `row_number() OVER (ORDER BY dist, cid)`. */
  def argminCentroidLong(v: ArrayData, cents: ArrayData): Long = {
    val c = cents.numElements()
    var best = Long.MaxValue
    var bestCid = Long.MaxValue
    var k = 0
    while (k < c) {
      val st = cents.getStruct(k, 2)
      val cid = st.getLong(0)
      val cv = st.getArray(1)
      val n = math.min(v.numElements(), cv.numElements())
      var dist = 0L; var i = 0
      while (i < n) {
        val d = v.getLong(i) - cv.getLong(i); dist += d * d; i += 1
      }
      if (dist < best || (dist == best && cid < bestCid)) {
        best = dist; bestCid = cid
      }
      k += 1
    }
    bestCid
  }

  /** The min DISTANCE of [[argminCentroidLong]]'s pick — same loop,
    * other output half (q222's inertia column). Two codegen'd folds
    * per row beat one interpreted HOF by orders of magnitude, and a
    * struct-returning expression buys nothing here. */
  def minCentroidDistLong(v: ArrayData, cents: ArrayData): Long = {
    val c = cents.numElements()
    var best = Long.MaxValue
    var bestCid = Long.MaxValue
    var k = 0
    while (k < c) {
      val st = cents.getStruct(k, 2)
      val cid = st.getLong(0)
      val cv = st.getArray(1)
      val n = math.min(v.numElements(), cv.numElements())
      var dist = 0L; var i = 0
      while (i < n) {
        val d = v.getLong(i) - cv.getLong(i); dist += d * d; i += 1
      }
      if (dist < best || (dist == best && cid < bestCid)) {
        best = dist; bestCid = cid
      }
      k += 1
    }
    best
  }

  /** Random-hyperplane LSH sign signature: one '0'/'1' byte per plane.
    * Plane p's components come from an integer LCG —
    * `((i + p·64)·2654435761 mod 1000)/1000 − 0.5` for element i — so any
    * engine reproduces the identical doubles with zero stored state, and
    * the dot product is the same sequential fold the SQL formulation
    * (`list_sum(list_transform(...))`) performs. One pass over the
    * vector per plane, no per-row allocation beyond the output bytes. */
  def lshSign(v: ArrayData, planes: Int): UTF8String = {
    // The plane stride (base = p*64) yields independent planes only for
    // the declared 64-component contract (the oracle pins range(1,65));
    // bound the fold there so longer vectors can't correlate plane p
    // with plane p+1's LCG inputs or diverge from the SQL formulation.
    val n = math.min(v.numElements(), 64)
    val out = new Array[Byte](planes)
    var p = 0
    while (p < planes) {
      val base = p * 64
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += v.getDouble(i) *
          (((i + base) * 2654435761L % 1000).toDouble / 1000.0 - 0.5)
        i += 1
      }
      out(p) = if (dot > 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(out)
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
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.VectorKernels.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd dot product over two `array<double>` columns — the
  * per-candidate-pair half of the stored-norm cosine decomposition
  * `dot(a,b)/(norm_a*norm_b)` used by the re-rank stages of q56/q71/
  * q73. The norms are computed ONCE per vector (one [[VectorNorm]] in
  * the signature/assignment projection, n folds total) instead of once
  * per candidate pair (up to n² folds inside [[CosineSimilarity]]), so
  * a re-rank over P pairs does P+n vector folds instead of 3P. Equal
  * vector lengths (the dim=64 embedding contract) make the split
  * bit-identical to the fused kernel — see [[VectorKernels.dot]].
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.VectorKernels.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared L2 distance over two `array<double>` columns —
  * the metric [[ArgminCentroid]] assigns with, exposed standalone for
  * the PQ asymmetric-distance computation (q100), where the distance
  * argument is a query subvector vs a LOOKED-UP codeword rather than an
  * argmin over a packed set. */
case class SquaredL2(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "squared_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sqL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.VectorKernels.sqL2($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd exact integer dot product over two `array<bigint>`
  * columns — the SemDeDup family's lattice fold (see
  * [[VectorKernels.dotLong]]); replaces the interpreted
  * `aggregate(zip_with(...))` HOF in the pair-join hot path. */
case class DotProductLong(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_product_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotLong(a.asInstanceOf[ArrayData],
                          b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.VectorKernels.dotLong($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd nearest-centroid assignment on the INTEGER lattice (see
  * [[VectorKernels.argminCentroidLong]]) — the Lloyd assignment's
  * argmin as one map-pass expression. */
case class ArgminCentroidLong(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType),
        ArrayType(StructType(Seq(StructField("cid", LongType),
                                 StructField("ci", ArrayType(LongType))))))
  override def dataType: DataType = LongType
  override def prettyName: String = "argmin_centroid_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.argminCentroidLong(a.asInstanceOf[ArrayData],
                                     b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.VectorKernels" +
        s".argminCentroidLong($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd min centroid DISTANCE on the integer lattice — the other
  * output half of [[ArgminCentroidLong]] (see
  * [[VectorKernels.minCentroidDistLong]]). */
case class MinCentroidDistLong(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType),
        ArrayType(StructType(Seq(StructField("cid", LongType),
                                 StructField("ci", ArrayType(LongType))))))
  override def dataType: DataType = LongType
  override def prettyName: String = "min_centroid_dist_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.minCentroidDistLong(a.asInstanceOf[ArrayData],
                                      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.VectorKernels" +
        s".minCentroidDistLong($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd L2 norm of an `array<double>` column — the once-per-vector
  * half of the stored-norm decomposition (see [[DotProduct]]). */
case class VectorNorm(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.VectorKernels.norm($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd nearest-centroid assignment (the IVF coarse quantizer,
  * SURVEY.md §2B q73): `left` is the vector column, `right` the packed
  * centroid array — `array<struct<cid: long, cv: array<double>>>`,
  * built by an executor-side `collect_list` over the (small) centroid
  * set and shipped to every row via `crossJoin(broadcast(...))`, the
  * q43/CosineTopK broadcast-packing mold. Whole-stage codegen'd, so
  * assigning a 100 TB corpus to its cells is a pure map stage with no
  * exchange; input types are enforced structurally by the builder in
  * [[GraftFunctions.argminCentroid]] rather than ExpectsInputTypes
  * (nested struct coercion would add nothing here).
  */
case class ArgminCentroid(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "argmin_centroid"

  override protected def nullSafeEval(v: Any, cents: Any): Any =
    VectorKernels.argminCentroid(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = org.apache.spark.sql.graft.VectorKernels.argminCentroid($v, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd random-hyperplane LSH signature over an `array<double>`
  * column (SURVEY.md §2B q52/q56): emits a `planes`-character '0'/'1'
  * string in one pass over the vector. Replaces the round-1 nested-HOF
  * formulation (`aggregate`×`zip_with`×`transform` per plane — an
  * interpreted CodegenFallback evaluated per row per join side) with a
  * whole-stage-codegen expression; widening the signature is now a
  * parameter, not a cost multiplier.
  */
case class LshSignature(child: Expression, planes: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(planes >= 1 && planes <= 64, s"planes must be in [1,64], got $planes")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StringType
  override def prettyName: String = "lsh_signature"

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.lshSign(a.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.VectorKernels.lshSign($a, $planes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

/** Per-probe top-k cosine block scan as a Catalyst Generator (SURVEY.md
  * §2B q43): the collection arrives packed as ONE aggregated row of
  * (ids, vecs) arrays — built by executor-side collect_list and shipped
  * by a Spark broadcast, never a driver collect — and each probe row
  * emits its k best (b, sim) pairs with b > a. A nested-loop join would
  * materialize a ~1 KB two-vector row per candidate pair (and cannot
  * enter whole-stage codegen); this generator keeps the O(n²) scan in a
  * primitive-array loop and emits only k narrow rows per probe, so the
  * downstream global top-k (TakeOrderedAndProject) sees k·n rows.
  *
  * `sim` is rounded (4 dp, half-away-from-zero — matching `round()` on
  * doubles in Spark and DuckDB) BEFORE the per-probe pruning, so local
  * top-k uses the exact global ordering key (sim desc, a, b) and ties
  * are never dropped. The decoded collection (ids, vectors, norms) is
  * cached per task keyed on the backing buffer of the packed array —
  * every probe row references the same broadcast row, so the decode
  * happens once per partition, not once per probe.
  */
case class CosineTopK(vec: Expression, id: Expression, coll: Expression,
                      k: Int, gtOnly: Boolean = true)
  extends Expression with Generator with CodegenFallback {
  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(vec, id, coll)
  override def elementSchema: StructType = new StructType()
    .add("b", LongType, nullable = false)
    .add("sim", DoubleType, nullable = false)
  override def prettyName: String = "cosine_topk"

  @transient private var cachedBase: AnyRef = _
  @transient private var cachedOffset: Long = -1L
  @transient private var ids: Array[Long] = _
  @transient private var vecs: Array[Array[Double]] = _
  @transient private var norms: Array[Double] = _

  private def decode(arr: ArrayData): Unit = {
    val n = arr.numElements()
    ids = new Array[Long](n)
    vecs = new Array[Array[Double]](n)
    norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val st = arr.getStruct(i, 2)
      ids(i) = st.getLong(0)
      val v = st.getArray(1).toDoubleArray()
      vecs(i) = v
      var nn = 0.0; var j = 0
      while (j < v.length) { nn += v(j) * v(j); j += 1 }
      norms(i) = math.sqrt(nn)
      i += 1
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val vEval = vec.eval(input)
    val cEval = coll.eval(input)
    if (vEval == null || cEval == null) return Nil
    val arr = cEval.asInstanceOf[ArrayData]
    arr match {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        if (u.getBaseObject eq cachedBase) && u.getBaseOffset == cachedOffset =>
        // same broadcast buffer as the previous probe row: reuse decode
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
        decode(u); cachedBase = u.getBaseObject; cachedOffset = u.getBaseOffset
      case other if other eq cachedBase =>
        // same materialized (non-Unsafe) collection object: reuse decode
      case other =>
        decode(other); cachedBase = other; cachedOffset = -1L
    }
    val va = vEval.asInstanceOf[ArrayData].toDoubleArray()
    val a = id.eval(input).asInstanceOf[Long]
    var na = 0.0; var j = 0
    while (j < va.length) { na += va(j) * va(j); j += 1 }
    na = math.sqrt(na)
    // max-heap on "badness": head = worst kept (lowest sim, then largest b)
    val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
      .on[(Double, Long)] { case (sim, b) => (sim, b) }
    val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
    var i = 0
    while (i < ids.length) {
      // gtOnly: unordered-pair consumers (q43) probe the upper triangle;
      // directional consumers (q329's k-NN graph build, r19) score every
      // non-self candidate
      if (if (gtOnly) ids(i) > a else ids(i) != a) {
        val vb = vecs(i)
        // min-length guard for ragged inputs, same as VectorKernels.cosine;
        // rounding delegates to the shared cross-engine contract in Det
        val n = math.min(va.length, vb.length)
        var dot = 0.0; var m = 0
        while (m < n) { dot += va(m) * vb(m); m += 1 }
        val cand = (graft.Det.round4(dot / (na * norms(i))), ids(i))
        if (pq.size < k) pq.enqueue(cand)
        else if (ord.lt(cand, pq.head)) { pq.dequeue(); pq.enqueue(cand) }
      }
      i += 1
    }
    pq.iterator.map { case (sim, b) => InternalRow(b, sim) }.toSeq
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), id = newChildren(1), coll = newChildren(2))
}

/** Column-API bridge for the graft-native expressions. */
object GraftFunctions {
  def cosineSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def ngrams(tokens: Column, n: Int): Column =
    ExpressionUtils.column(NGrams(ExpressionUtils.expression(tokens), n))

  def lshSignature(vec: Column, planes: Int): Column =
    ExpressionUtils.column(LshSignature(ExpressionUtils.expression(vec), planes))

  /** `tokens`: array<string> → array of MinHash-LSH band keys (see
    * [[MinHashBandKeys]]). */
  def minhashBandKeys(tokens: Column, nHashes: Int, bands: Int): Column =
    ExpressionUtils.column(
      MinHashBandKeys(ExpressionUtils.expression(tokens), nHashes, bands))

  /** `tokens`: array<string> → distinct winnowed minimizer md5 hashes
    * (see [[MinimizerHashes]]). */
  def minimizerHashes(tokens: Column, n: Int, w: Int,
                      shortDocGlobalMin: Boolean): Column =
    ExpressionUtils.column(MinimizerHashes(
      ExpressionUtils.expression(tokens), n, w, shortDocGlobalMin))

  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dotProductLong(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductLong(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** `vec`: array<bigint>; `cents`: array<struct<cid: long, ci: array<bigint>>>. */
  def argminCentroidLong(vec: Column, cents: Column): Column =
    ExpressionUtils.column(ArgminCentroidLong(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(cents)))

  def minCentroidDistLong(vec: Column, cents: Column): Column =
    ExpressionUtils.column(MinCentroidDistLong(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(cents)))

  /** A driver-collected centroid pack frozen as ONE `Literal` node of
    * type `array<struct<cid: bigint, ci: array<bigint>>>` — the shape
    * [[argminCentroidLong]] consumes. The 16-cell gate freezes its
    * model via a `array(struct(lit…))` tree (fine at 16×64 leaves),
    * but a √n-cell model would put k·d literal leaves into a STREAMING
    * plan that is re-analyzed every micro-batch; a single Literal is
    * O(1) tree size at any k, and codegen references it as one object
    * instead of materializing thousands of constants per method. */
  def centroidLitLong(cents: Seq[(Long, Seq[Long])]): Column = {
    import org.apache.spark.sql.types._
    val dt = ArrayType(StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("ci", ArrayType(LongType, containsNull = false),
                  nullable = false))), containsNull = false)
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        cents.map { case (c, v) => org.apache.spark.sql.Row(c, v) }, dt))
  }

  def vectorNorm(vec: Column): Column =
    ExpressionUtils.column(VectorNorm(ExpressionUtils.expression(vec)))

  def squaredL2(a: Column, b: Column): Column =
    ExpressionUtils.column(SquaredL2(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** `vec`: array<double>; `cents`: array<struct<cid: long, cv: array<double>>>. */
  def argminCentroid(vec: Column, cents: Column): Column =
    ExpressionUtils.column(ArgminCentroid(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(cents)))

  def cosineTopK(vec: Column, id: Column, coll: Column, k: Int): Column =
    ExpressionUtils.column(CosineTopK(ExpressionUtils.expression(vec),
      ExpressionUtils.expression(id), ExpressionUtils.expression(coll), k))

  /** [[CosineTopK]] over every non-self candidate (directional k-NN:
    * each probe keeps its own top-k among id ≠ probe, ranked by
    * (round-4 cosine desc, id asc) — the q329 graph-build selection). */
  def cosineTopKAll(vec: Column, id: Column, coll: Column, k: Int): Column =
    ExpressionUtils.column(CosineTopK(ExpressionUtils.expression(vec),
      ExpressionUtils.expression(id), ExpressionUtils.expression(coll), k,
      gtOnly = false))

  /** Spark's BloomFilterAggregate/BloomFilterMightContain live in the
    * internal registry (the optimizer's runtime row-level filtering uses
    * them); bridge them to the Column API for the explicit bloom-semi
    * pattern (q74). */
  def bloomFilterAgg(key: Column, items: Long, bits: Long): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ExpressionUtils.expression(key),
        org.apache.spark.sql.catalyst.expressions.Literal(items),
        org.apache.spark.sql.catalyst.expressions.Literal(bits), 0, 0)
        .toAggregateExpression())

  /** might_contain requires its bloom input as a constant or scalar
    * subquery (same wiring the optimizer's InjectRuntimeFilter builds):
    * the one-row bloom aggregate becomes a ScalarSubquery expression. */
  def mightContain(bloomDF: org.apache.spark.sql.DataFrame, value: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          bloomDF.queryExecution.analyzed),
        ExpressionUtils.expression(value)))
}
