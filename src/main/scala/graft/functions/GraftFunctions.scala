package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, LeafExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the BLAKE2b pseudonym hash.
  *
  * A `udf()` would box every row (String <-> UTF8String copies + closure
  * dispatch); a native expression with `doGenCode` keeps the call inside
  * whole-stage codegen as one static invocation on UTF8String, which matters
  * on the 100 TB uid-pseudonymization path (SURVEY.md §7.5).
  */
case class Blake2bExpr(child: Expression, digestSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "blake2b_hex"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    UTF8String.fromString(Blake2b.hexDigest(s.getBytes, digestSize))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Blake2b.hexDigest($c.getBytes(), $digestSize))")

  override protected def withNewChildInternal(newChild: Expression): Blake2bExpr =
    copy(child = newChild)
}

/** Tight-loop vector kernels called from generated code — in the
  * profile-pollution-safe bulk form ([[CentroidOps.nearest]]'s round-14
  * discipline): this call site is hot in sessions that feed it several
  * `ArrayData` subtypes (parquet ColumnarArray, shuffle UnsafeArrayData,
  * object-encoder GenericArrayData from the graph stores), and once a
  * third type shows up HotSpot's inline cache on a virtual per-element
  * `getDouble` goes megamorphic and the loop recompiles with
  * out-of-line Unsafe calls, PERMANENTLY — the exact mechanism that
  * inflated the IVF family 2× until round 14 fixed `nearest` at the
  * source. One bulk `toDoubleArray` per side (a single dispatch + a
  * primitive copy — UnsafeArrayData's is one `copyMemory`) after a
  * loud-null pre-scan keeps the multiply loop pure primitive-array
  * arithmetic no matter what the session ran before; the per-pair copy
  * is dim-sized and young-gen-local, and the accumulation order is
  * unchanged, so results are bitwise identical.
  */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // strict: silently truncating to min(length) would return plausible
    // but wrong similarities for a mis-dimensioned query vector
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"array_dot dimension mismatch: $n vs ${b.numElements()}")
    // strict: a null ELEMENT in an array<double> (containsNull=true
    // survives the cast) bulk-copied through toDoubleArray would read as
    // a silent 0.0 — a plausible-but-wrong similarity. Corrupt vectors
    // fail loudly; filter/quarantine first.
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"array_dot null element at index $i — quarantine ragged/null embeddings before the kernel")
      i += 1
    }
    val aa = a.toDoubleArray()
    val bb = b.toDoubleArray()
    var s = 0.0
    i = 0
    while (i < n) {
      s += aa(i) * bb(i)
      i += 1
    }
    s
  }
}

/** Tight-loop nearest-centroid kernel called from generated code —
  * the scale form of the argmin-over-literals expression family: the
  * expression-tree formulation (`array_min`/`array_sort` over k
  * `(score, cid)` structs) generates source LINEAR in k, which blows
  * janino's 64 KB method limit around k ≈ 400 and silently drops the
  * whole stage to interpreted mode — and every re-plan pays a
  * multi-minute FAILED compile first (measured: the ×100 rehearsal's
  * k=400 Lloyd iterations were dominated by failed compiles, not
  * arithmetic). A loop over a reference-array matrix is constant-size
  * source at ANY k — 16k cells (the 1e9-vector sizing) costs the same
  * bytecode as 4.
  */
object CentroidOps {
  /** The `m = min(nProbe, k)` nearest cell ids of `v`, ascending by
    * (score, cid) with score = ‖c‖² − 2·v·c — EXACTLY the
    * `scoreToCentroid` algebra (c² precomputed driver-side by the same
    * sequential sum; dot accumulated index 0→n like [[VectorOps.dot]]),
    * so assignments and probe lists are bitwise interchangeable with
    * the expression-tree form (spec-pinned). Bounded insertion sort:
    * k·dim multiplies + at most k·m shifts per row.
    */
  def nearest(v: ArrayData, centroids: Array[Array[Double]],
              c2: Array[Double], nProbe: Int): ArrayData = {
    val dim = v.numElements()
    // Hoist every element read out of the k×dim loop through ONE bulk
    // copy. `ArrayData.getDouble` is a virtual call, and this kernel is
    // hot in sessions that feed the SAME call site several ArrayData
    // subtypes (parquet ColumnarArray, shuffle UnsafeArrayData, the
    // object-encoder GenericArrayData the graph stores emit): once a
    // third type shows up, HotSpot's inline cache goes megamorphic and
    // the whole loop recompiles with out-of-line Unsafe calls — measured
    // as a PERMANENT ~2× on every IVF-family query after one geo-store
    // compaction ran in-session (BASELINE round-14: JFR showed
    // CentroidOps.nearest falling 68% → 31% of samples with the time
    // moving into un-inlined Unsafe.getDouble/getLong). A per-row bulk
    // toDoubleArray pays one dispatch + dim copies instead of k×dim
    // polluted reads, and the loop below stays pure primitive-array
    // arithmetic no matter what the session ran before. The null
    // pre-check keeps the loud-null contract (UnsafeArrayData's bulk
    // copy reads null slots as 0.0 silently).
    var jn = 0
    while (jn < dim) {
      if (v.isNullAt(jn))
        throw new IllegalArgumentException(
          s"nearest_cells null element at index $jn — quarantine ragged/null embeddings first")
      jn += 1
    }
    val vv = v.toDoubleArray()
    val k = centroids.length
    val m = math.min(nProbe, k)
    val bs = new Array[Double](m)
    val bc = new Array[Int](m)
    var filled = 0
    var i = 0
    while (i < k) {
      val c = centroids(i)
      if (c.length != dim)
        throw new IllegalArgumentException(
          s"nearest_cells dimension mismatch: vector $dim vs centroid ${c.length}")
      var dot = 0.0
      var j = 0
      while (j < dim) {
        dot += vv(j) * c(j)
        j += 1
      }
      val s = c2(i) - 2.0 * dot
      if (filled < m || s < bs(filled - 1)) {
        // insertion position: after any kept entry with score <= s
        // (strict > comparison) — equal scores keep the earlier cid
        // first, matching the lexicographic (score, cid) struct order
        var p = math.min(filled, m - 1)
        while (p > 0 && bs(p - 1) > s) {
          bs(p) = bs(p - 1); bc(p) = bc(p - 1); p -= 1
        }
        bs(p) = s; bc(p) = i
        if (filled < m) filled += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bc, filled))
  }
}

/** Tight-loop random-hyperplane LSH signature kernel — the
  * [[CentroidOps]] discipline applied to the sign-bit family: the
  * expression-tree form (one `when(dot_product(v, lit(plane)) >= 0, …)`
  * tree per plane, OR-reduced) embeds P array literals and P dot trees
  * in every plan, which costs a fixed ~0.6 s of planning + codegen per
  * EXECUTION at P = 16 (q26's round-13 attribution — the plan, not the
  * data, was the floor). One kernel over a reference-object plane
  * matrix is constant-size source at any P. Per-plane dots accumulate
  * sequentially 0→n exactly like [[VectorOps.dot]], so the sign bits —
  * and therefore every signature — are bitwise the expression form's.
  * Reads go through ONE bulk `toDoubleArray` per row (the
  * profile-pollution-safe form; see [[CentroidOps.nearest]]).
  */
object HyperplaneOps {
  def signature(v: ArrayData, planes: Array[Array[Double]]): Long = {
    val dim = v.numElements()
    var jn = 0
    while (jn < dim) {
      if (v.isNullAt(jn))
        throw new IllegalArgumentException(
          s"hyperplane_sig null element at index $jn — quarantine " +
            "ragged/null embeddings first")
      jn += 1
    }
    val vv = v.toDoubleArray()
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      if (p.length != dim)
        throw new IllegalArgumentException(
          s"hyperplane_sig dimension mismatch: vector $dim vs plane ${p.length}")
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += vv(j) * p(j); j += 1 }
      if (dot >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** Native hyperplane-signature expression — P sign bits of a vector
  * against a plan-constant plane matrix (reference object, never source
  * text). See [[HyperplaneOps.signature]] for the planning-cost story.
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 64,
    s"need 1..64 planes for a long signature, got ${planes.length}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneOps.signature(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refP = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneOps.signature($c, $refP)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** Native top-`nProbe` nearest-centroid ids of an `array<double>` vector
  * against a plan-constant centroid matrix (ridden as reference objects,
  * never source text) — see [[CentroidOps.nearest]] for why the
  * expression-tree form stops scaling at k ≈ 400. `nProbe = 1` IS cell
  * assignment (`element_at(..., 1)`).
  */
case class NearestCells(child: Expression,
                        centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty && nProbe >= 1,
    s"need centroids and nProbe >= 1, got ${centroids.length}/$nProbe")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cells"

  // the ‖c‖² terms, precomputed once driver-side with the same
  // sequential sum scoreToCentroid used — part of the bitwise contract
  private lazy val c2: Array[Double] = centroids.map(_.map(x => x * x).sum)

  override protected def nullSafeEval(v: Any): Any =
    CentroidOps.nearest(v.asInstanceOf[ArrayData], centroids, c2, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refC = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val refC2 = ctx.addReferenceObj("c2", c2, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CentroidOps.nearest($c, $refC, $refC2, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** Native dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * allocates a zipped array and dispatches a lambda per element —
  * measured ~14 µs per 64-dim pair on the all-pairs path. This expression
  * compiles to one static call on the unsafe array data (~0.1 µs), which
  * is the difference between the O(n²) similarity queries being
  * compute-bound and overhead-bound.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDotProduct = copy(left = newLeft, right = newRight)
}

/** A double constant that generated code reads from the plan's reference
  * array instead of embedding in the Java source.
  *
  * `lit(x: Double)` splices the value into the generated source text, so a
  * family of plans that differ ONLY in scalar constants (e.g. the per-
  * centroid ‖c‖² terms of k-means, re-planned every Lloyd iteration with
  * fresh centroids) produces a distinct source string per plan — and janino
  * recompiles the whole stage each time, which dominates iterative training
  * on anything but huge inputs. Array literals already go through
  * `references` (source-invariant); this gives scalars the same treatment.
  * Deliberately non-foldable — ConstantFolding would otherwise collapse it
  * right back into an embedded constant.
  */
case class StableDouble(value: Double) extends LeafExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "stable_double"
  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stableDouble", value, "java.lang.Double")
    ev.copy(code = code"final double ${ev.value} = $ref.doubleValue();",
      isNull = FalseLiteral)
  }
}

/** [[StableDouble]]'s long twin — for iterative integer recurrences
  * (PageRank's per-generation dangling-mass constant) whose plans differ
  * only in one scalar per round.
  */
case class StableLong(value: Long) extends LeafExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "stable_long"
  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stableLong", value, "java.lang.Long")
    ev.copy(code = code"final long ${ev.value} = $ref.longValue();",
      isNull = FalseLiteral)
  }
}

/** Column-level entry points for graft's custom functions. */
object GraftFunctions {

  /** Codegen-stable scalar constant — see [[StableDouble]]. Use in plans
    * that are re-built many times with different constants (iterative
    * training loops); plain `lit()` everywhere else, where embedded
    * constants give the JIT more to work with.
    */
  def stable_lit(x: Double): Column =
    org.apache.spark.sql.GraftShim.column(StableDouble(x))

  /** [[stable_lit]]'s long twin — see [[StableLong]]. */
  def stable_lit_long(x: Long): Column =
    org.apache.spark.sql.GraftShim.column(StableLong(x))

  /** 28-class character histogram in one native pass — see
    * [[CharClassCounts]].
    */
  def char_class_counts(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      CharClassCounts(org.apache.spark.sql.GraftShim.expression(c)))

  /** blake2b(digest_size) hex digest of a string column — the reference's
    * uid pseudonym is `blake2b_hex(c, 5)` (10 hex chars).
    */
  def blake2b_hex(c: Column, digestSize: Int = 5): Column =
    org.apache.spark.sql.GraftShim.column(
      Blake2bExpr(expression(c), digestSize))

  /** Cosine similarity between an array<float|double> column and a constant
    * query vector: dot(a,q) / (norm(a) * norm(q)), all through the native
    * [[ArrayDotProduct]] kernel. Accumulation order (sequential, index 0→n)
    * matches the prior higher-order-function formulation, so values are
    * bit-identical — only faster.
    */
  def cosine_sim(vec: Column, query: Array[Double]): Column = {
    val normQ = math.sqrt(query.map(x => x * x).sum)
    dot_product(vec, lit(query)) / (l2_norm(vec) * lit(normQ))
  }

  /** Dot product of two array columns (double arithmetic, native kernel).
    *
    * STRICT on dimensions: a length mismatch throws (task → job failure)
    * rather than silently truncating to plausible-but-wrong values. For
    * data that may contain ragged embeddings, guard the scan first —
    * `df.filter(size(col("embedding")) === dim)` — and quarantine the
    * remainder; a corrupt vector reaching a similarity kernel is a data
    * bug worth failing loudly on.
    */
  def dot_product(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    org.apache.spark.sql.GraftShim.column(
      ArrayDotProduct(expression(ad), expression(bd)))
  }

  /** L2 norm of an array column (sqrt of the self dot product). */
  def l2_norm(a: Column): Column = sqrt(dot_product(a, a))

  /** Top-`nProbe` nearest-centroid ids (ascending (‖c‖²−2·v·c, cid)) of
    * an array<double> vector column against a constant centroid matrix —
    * the native, any-k form of the argmin-over-struct-literals family
    * (see [[NearestCells]]); `nProbe = 1` is cell assignment.
    */
  def nearest_cells(v: Column, centroids: Array[Array[Double]],
                    nProbe: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      NearestCells(expression(v), centroids, nProbe))

  /** P sign bits of `v` against a constant plane matrix as one long —
    * the [[HyperplaneSig]] native kernel (planes ride as a reference
    * object; bitwise ≡ the per-plane `dot_product >= 0` tree).
    */
  def hyperplane_sig(v: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftShim.column(
      HyperplaneSig(expression(v.cast("array<double>")), planes))

  /** MD5 digest as four unsigned 32-bit lanes (`array<long>`) — the native
    * form of `conv(substring(md5(x), 8i+1, 8), 16, 10)` with one digest
    * and zero hex-string work; see [[Md5Lanes]]. Strings are hashed as
    * their UTF-8 bytes (same as `md5(x.cast("binary"))`).
    */
  def md5_lanes(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      Md5Lanes(expression(c.cast("binary"))))

  /** Jaro–Winkler similarity of two string columns in [0, 1] — the
    * record-linkage comparator, as a native codegen'd expression
    * (RapidFuzz/DuckDB variant: 0.7 boost threshold, prefix ≤ 4, weight
    * 0.1; see [[JaroWinkler]]).
    */
  def jaro_winkler(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      JaroWinkler(expression(a.cast("string")), expression(b.cast("string"))))

  /** Unrestricted Damerau–Levenshtein distance of two string columns —
    * edits + adjacent transpositions, Lowrance–Wagner variant matching
    * DuckDB's `damerau_levenshtein` (see [[DamerauLevenshtein]]). Spark
    * ships plain `levenshtein` only.
    */
  def damerau_levenshtein(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      DamerauLevenshtein(expression(a.cast("string")),
        expression(b.cast("string"))))

  /** Misra–Gries heavy hitters AGGREGATE over a string column: at most `k`
    * counters per group, mergeable across partitions, exact when the
    * group's distinct count stays within `k` (see [[MisraGries]]).
    * Returns array<struct<item, count>> sorted by (count desc, item asc).
    */
  def heavy_hitters(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      MisraGries(expression(c), k).toAggregateExpression())

  private def expression(c: Column): Expression =
    org.apache.spark.sql.GraftShim.expression(c)
}
