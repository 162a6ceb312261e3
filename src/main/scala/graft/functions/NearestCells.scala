package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Runtime core of [[NearestCells]] — one tight JVM loop over all K
  * centroids, shared verbatim by interpreted eval and codegen (the
  * generated code CALLS this method, so both paths are one
  * implementation and the JIT sees a small hot method).
  *
  * Why this exists: building the K-centroid argmin as a Catalyst
  * expression tree (K × (CreateArray(dims) + dot + struct) unrolled
  * per subspace) generates enormous per-plan Java that (a) recompiles
  * every Lloyd round because the centroid literals are inlined into
  * the source, and (b) runs bytecode-interpreted when the method
  * outgrows the JIT's size limits — measured 2× SLOWER than
  * interpreted expression eval on the PQ training round. Here the
  * centroids arrive as one constant object through the codegen
  * references array, the generated source is IDENTICAL across rounds
  * (janino cache hit), and the loop JITs like any small method.
  */
object NearestCellsUtil {
  /** Sorted (d2 ASC, cell ASC) distance table, or null if any element
    * of `v` is null (the dot_i64 null convention). Arithmetic wraps on
    * overflow (quantized inputs keep |x| far below the long edge). */
  def compute(v: ArrayData, cents: ArrayData, ids: ArrayData,
              norms: ArrayData): ArrayData = {
    val n = v.numElements()
    var i = 0
    var xx = 0L
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getLong(i)
      xx += x * x
      i += 1
    }
    val k = cents.numElements()
    val d2 = new Array[Long](k)
    val cell = new Array[Long](k)
    var c = 0
    while (c < k) {
      val cv = cents.getArray(c)
      if (cv.numElements() != n) return null // dim mismatch: not comparable
      var dot = 0L
      var j = 0
      while (j < n) { dot += v.getLong(j) * cv.getLong(j); j += 1 }
      d2(c) = xx - 2L * dot + norms.getLong(c)
      cell(c) = ids.getLong(c)
      c += 1
    }
    // insertion sort on (d2, cell) — K is quantizer-scale (≤ 64 on
    // the literal path), and the arrays stay primitive
    var a = 1
    while (a < k) {
      val dv = d2(a); val cv = cell(a)
      var b = a - 1
      while (b >= 0 && (d2(b) > dv || (d2(b) == dv && cell(b) > cv))) {
        d2(b + 1) = d2(b); cell(b + 1) = cell(b); b -= 1
      }
      d2(b + 1) = dv; cell(b + 1) = cv
      a += 1
    }
    val rows = new Array[Any](k)
    var r = 0
    while (r < k) { rows(r) = InternalRow(d2(r), cell(r)); r += 1 }
    new GenericArrayData(rows)
  }
}

/** `nearest_cells_i64(v, centroids, cell_ids, cell_norms)` →
  * `array<struct<d2, cell>>` sorted by (d2 ASC, cell ASC): the whole
  * centroid-distance table of one vector in ONE expression. Element 1
  * is the assignment (the [[graft.operators.KMeans.assign]] argmin
  * with its lower-cell-id tie break), the first nprobe elements are
  * the multiprobe set — callers compose `element_at`/`slice`, nothing
  * re-sorts. The three centroid-side children must be foldable (the
  * frozen quantizer IS plan state; a non-literal centroid table takes
  * the broadcast-join assign path instead). */
case class NearestCells(
    v: Expression, cents: Expression, ids: Expression, norms: Expression)
  extends QuaternaryExpression {

  override def first: Expression = v
  override def second: Expression = cents
  override def third: Expression = ids
  override def fourth: Expression = norms

  override def checkInputDataTypes(): TypeCheckResult = {
    def longArray(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!longArray(v.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"nearest_cells_i64 vector must be array<bigint>, got ${v.dataType.sql}")
    else if (!(cents.dataType match {
      case ArrayType(inner, _) => longArray(inner)
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        s"centroids must be array<array<bigint>>, got ${cents.dataType.sql}")
    else if (!longArray(ids.dataType) || !longArray(norms.dataType))
      TypeCheckResult.TypeCheckFailure(
        "cell ids and norms must be array<bigint>")
    else if (!(cents.foldable && ids.foldable && norms.foldable))
      TypeCheckResult.TypeCheckFailure(
        "centroid table must be foldable (plan-literal quantizer)")
    else {
      // the three centroid-side children are foldable, so their
      // lengths are knowable at analysis — refuse a ragged quantizer
      // here instead of AIOOBE-ing inside the codegen'd loop on the
      // first row
      val cc = cents.eval().asInstanceOf[ArrayData]
      val ii = ids.eval().asInstanceOf[ArrayData]
      val nn = norms.eval().asInstanceOf[ArrayData]
      if (cc == null || ii == null || nn == null)
        TypeCheckResult.TypeCheckFailure(
          "centroid table, ids and norms must be non-null literals")
      else if (ii.numElements() != cc.numElements() ||
        nn.numElements() != cc.numElements())
        TypeCheckResult.TypeCheckFailure(
          s"centroids (${cc.numElements()}), cell ids " +
            s"(${ii.numElements()}) and norms (${nn.numElements()}) " +
            "must have one entry per cell")
      else if ((0 until cc.numElements()).exists(cc.isNullAt))
        TypeCheckResult.TypeCheckFailure("centroid vectors must be non-null")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("cell", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells_i64"

  override def eval(input: InternalRow): Any = {
    val vv = v.eval(input)
    if (vv == null) return null
    val cc = cents.eval(input)
    val ii = ids.eval(input)
    val nn = norms.eval(input)
    if (cc == null || ii == null || nn == null) return null
    NearestCellsUtil.compute(vv.asInstanceOf[ArrayData],
      cc.asInstanceOf[ArrayData], ii.asInstanceOf[ArrayData],
      nn.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => {
      s"""
         |${ev.value} = graft.functions.NearestCellsUtil.compute($a, $b, $c, $d);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(v = newFirst, cents = newSecond, ids = newThird, norms = newFourth)
}
