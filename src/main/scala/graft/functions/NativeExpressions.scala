package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expressions for the vector hot path.
  *
  * [[DotI64]] is the per-pair scoring kernel: an integer dot product
  * over two `array<long>` columns as a tight codegen'd loop
  * (`getLong` directly off the unsafe array data — no lambda
  * dispatch, no boxing). Preference order from the build brief:
  * compose built-ins where semantics allow, native `Expression` with
  * `doGenCode` where the built-ins leave interpreted HOF dispatch in
  * a loop that runs millions of times per stage — which is exactly
  * the candidate-verify dot product.
  */
case class DotI64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i64 needs two array<bigint> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i64"

  // semantics match the HOF zip_with/aggregate formulation exactly:
  // different lengths or any null element in the overlap → NULL (the
  // HOF pads with null / propagates null through the sum)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: two dot_i64 calls can share one codegen scope
      val n = ctx.freshName("dotN")
      val acc = ctx.freshName("dotAcc")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernel for [[Hash60]], callable from generated code. */
object Hash60Util {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5 as a non-negative long — bit-identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)`: 15 hex digits are the
    * first 7.5 bytes big-endian, i.e. [[hash64]] shifted right 4. */
  def hash60(bytes: Array[Byte]): Long = hash64(bytes) >>> 4

  /** Full first 64 bits of md5 as a (possibly negative) big-endian
    * long — the 16-hex-char prefix. Callers only ever extract bit
    * fields (`shiftright(h, j) & mask`), which are sign-safe, so the
    * signed representation never leaks. The DuckDB mirror reads the
    * same bits as four 16-bit hex slices: bits [16b, 16b+16) of this
    * value equal `('0x' || substr(md5(x), 1 + 4*(3-b), 4))::BIGINT`. */
  def hash64(bytes: Array[Byte]): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }
}

/** Native form of the portable `hash60` content hash (the MinHash /
  * SimHash cost center — one evaluation per shingle/token): the same
  * md5, but read straight off the digest bytes instead of
  * materializing a 32-char hex string and re-parsing 15 digits with
  * `conv`. Value is bit-identical to the `TextFunctions.hash60`
  * column form (property-tested), so every DuckDB oracle keeps its
  * `('0x' || substr(md5(x),1,15))::BIGINT` mirror unchanged. */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash60_md5 needs a binary argument, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60_md5"

  override def nullSafeEval(input: Any): Any =
    Hash60Util.hash60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60Util.hash60($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit sibling of [[Hash60]]: the full 16-hex-char md5 prefix as a
  * signed long, for signatures that need more than 60 bits (the
  * 64-bit simhash in `dedup_simhash_pairs`). Bit-field extraction
  * (`shiftright & mask`) is exact on the signed value; the oracle
  * mirror is per-16-bit-band hex slices (see [[Hash60Util.hash64]]). */
case class Hash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash64_md5 needs a binary argument, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hash64_md5"

  override def nullSafeEval(input: Any): Any =
    Hash60Util.hash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60Util.hash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Membership probe against a serialized `BloomFilter` — the scan-side
  * prefilter for set-membership joins whose build side outgrows an
  * exact broadcast (decontamination against a large eval suite). The
  * filter bytes must be a plan-time constant (a literal produced by
  * `DataFrameStatFunctions.bloomFilter`'s distributed build); they are
  * deserialized ONCE per expression instance and enter generated code
  * as a referenced object, so the per-row cost is the probe's few hash
  * multiplies — never a per-row deserialize. Guarantees follow the
  * sketch: no false negatives (safe as a prefilter ahead of an exact
  * verify join), bounded false-positive rate. */
case class BloomMightContainLong(bloom: Expression, value: Expression)
  extends BinaryExpression {

  override def left: Expression = bloom
  override def right: Expression = value
  override def prettyName: String = "bloom_might_contain_long"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!bloom.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain_long needs a constant (foldable) filter argument")
    else if (bloom.dataType != BinaryType || value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_long needs (binary, bigint), got " +
          s"${bloom.dataType.sql} and ${value.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  /** Deserialized once per instance (and once per task after codegen
    * reference-object ship), NOT once per row. */
  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullable: Boolean = bloom.nullable || value.nullable

  // custom eval/codegen instead of nullSafeEval: the bloom child must
  // not be re-evaluated (let alone re-parsed) per row
  override def eval(input: InternalRow): Any = {
    if (filter == null) return null
    val v = value.eval(input)
    if (v == null) null else filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (filter == null) {
      ev.copy(
        code = code"""
          |boolean ${ev.isNull} = true;
          |boolean ${ev.value} = false;
        """.stripMargin,
        isNull = ev.isNull, value = ev.value)
    } else {
      val bf = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      val v = value.genCode(ctx)
      ev.copy(
        code = code"""
          |${v.code}
          |boolean ${ev.isNull} = ${v.isNull};
          |boolean ${ev.value} = false;
          |if (!${ev.isNull}) { ${ev.value} = $bf.mightContainLong(${v.value}); }
        """.stripMargin,
        isNull = ev.isNull, value = ev.value)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bloom = newLeft, value = newRight)
}

object NativeExpressions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[DotI64].getName, "dot_i64"),
      { children: Seq[Expression] =>
        require(children.size == 2, "dot_i64 takes exactly 2 arguments")
        DotI64(children.head, children(1))
      }),
    (FunctionIdentifier("hash60_md5"),
      new ExpressionInfo(classOf[Hash60].getName, "hash60_md5"),
      { children: Seq[Expression] =>
        require(children.size == 1, "hash60_md5 takes exactly 1 argument")
        Hash60(children.head)
      }),
    (FunctionIdentifier("hash64_md5"),
      new ExpressionInfo(classOf[Hash64].getName, "hash64_md5"),
      { children: Seq[Expression] =>
        require(children.size == 1, "hash64_md5 takes exactly 1 argument")
        Hash64(children.head)
      }),
    (FunctionIdentifier("bloom_might_contain_long"),
      new ExpressionInfo(classOf[BloomMightContainLong].getName,
        "bloom_might_contain_long"),
      { children: Seq[Expression] =>
        require(children.size == 2,
          "bloom_might_contain_long takes (filterBytes, value)")
        BloomMightContainLong(children.head, children(1))
      }),
    (FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
      { children: Seq[Expression] =>
        require(children.size == 3, "topk_pairs takes (ord, id, k)")
        // returned unwrapped — the analyzer wraps an AggregateFunction
        // into its AggregateExpression in aggregation context
        TopKPairs(children.head, children(1), children(2))
      }),
    (FunctionIdentifier("min_k_distinct"),
      new ExpressionInfo(classOf[MinKDistinct].getName, "min_k_distinct"),
      { children: Seq[Expression] =>
        require(children.size == 2, "min_k_distinct takes (value, k)")
        MinKDistinct(children.head, children(1))
      }),
    (FunctionIdentifier("vec_sum_i64"),
      new ExpressionInfo(classOf[VecSumI64].getName, "vec_sum_i64"),
      { children: Seq[Expression] =>
        require(children.size == 1, "vec_sum_i64 takes (array<bigint>)")
        VecSumI64(children.head)
      }),
    (FunctionIdentifier("nearest_cells_i64"),
      new ExpressionInfo(classOf[NearestCells].getName, "nearest_cells_i64"),
      { children: Seq[Expression] =>
        require(children.size == 4,
          "nearest_cells_i64 takes (v, centroids, ids, norms)")
        NearestCells(children.head, children(1), children(2), children(3))
      }))

  /** Register the native functions on a live session (idempotent) so
    * they are callable via `call_function` / SQL by name. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id))
        registry.registerFunction(id, info, builder)
    }
  }

  private[functions] def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}

/** Session-extensions entry point: sessions built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (a STATIC
  * conf — set it before the first session of the application) or
  * `builder.withExtensions(new GraftExtensions)` get every graft
  * native function injected at session construction — the deployment
  * path for a cluster where user SQL should see `dot_i64` without any
  * driver-side registration call. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    NativeExpressions.inject(ext)
}
