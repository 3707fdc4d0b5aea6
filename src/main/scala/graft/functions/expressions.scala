package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions (SURVEY.md §2.10) filling Spark 4.1 builtin
  * gaps relative to the reference surface (DataFusion's gcd/lcm/date_bin:
  * /root/reference/datafusion/functions/src/math/gcd.rs, lcm.rs,
  * datetime/date_bin.rs) plus the vector kernels the LLM-pipeline operators
  * need (cosine similarity, hamming distance — the reference's arrow-extra
  * crate ships custom compute kernels; on Spark the analogue is a custom
  * Expression with `doGenCode` so the hot loop lives inside whole-stage
  * codegen, no UDF serialization, no boxing).
  */

/** Cosine similarity of two float-array embeddings. 0.0 when either norm is
  * zero. Tight scalar loop in generated Java; stays inside
  * WholeStageCodegen — at 100 TB this runs per-row with zero allocation. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs two array<float> args, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      // promote BEFORE multiplying: float*float rounds to float and would
      // diverge from double-accumulating oracles
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i); double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hamming distance between two 64-bit signatures (simhash compare). */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hammingdistance needs two bigint args, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Greatest common divisor (Spark 4.1 has no builtin; DataFusion does). */
case class Gcd(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gcd needs two bigint args, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "gcd"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Gcd.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Gcd.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Gcd {
  /** Euclid on magnitudes; gcd(0, 0) = 0 (DataFusion/DuckDB convention). */
  def compute(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
}

/** Least common multiple; lcm(0, x) = 0. */
case class Lcm(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcm needs two bigint args, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "lcm"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Lcm.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Lcm.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Lcm {
  /** Errors on Long overflow (incl. abs(Long.MinValue)) instead of silently
    * wrapping — mirrors the reference's explicit lcm overflow error
    * (datafusion/functions/src/math/lcm.rs). */
  def compute(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L
    else {
      val g = Gcd.compute(a, b)
      val r = Math.multiplyExact(a / g, b) // throws ArithmeticException
      if (r == Long.MinValue)
        throw new ArithmeticException(s"lcm($a, $b) overflows BIGINT")
      math.abs(r)
    }
}

/** Origin-aligned time binning: floor((ts - origin) / width) * width + origin,
  * all in epoch microseconds (DataFusion's date_bin; Spark 4.1 lacks it —
  * `window()` buckets are structs and date_trunc has no custom width).
  * Negative-safe via floorDiv so pre-origin timestamps bin correctly. */
case class DateBin(widthUs: Expression, ts: Expression, originTs: Expression)
    extends TernaryExpression {

  override def first: Expression = widthUs
  override def second: Expression = ts
  override def third: Expression = originTs

  override def checkInputDataTypes(): TypeCheckResult =
    if (widthUs.dataType == LongType && ts.dataType == TimestampType &&
        originTs.dataType == TimestampType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"date_bin_us(bigint, timestamp, timestamp) got " +
        s"${widthUs.dataType}, ${ts.dataType}, ${originTs.dataType}")
  override def dataType: DataType = TimestampType
  override def prettyName: String = "date_bin_us"

  override protected def nullSafeEval(w: Any, t: Any, o: Any): Any =
    DateBin.compute(w.asInstanceOf[Long], t.asInstanceOf[Long], o.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, t, o) =>
      s"${ev.value} = graft.functions.DateBin.compute($w, $t, $o);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(widthUs = f, ts = s, originTs = t)
}

object DateBin {
  /** Rejects non-positive widths explicitly (the reference's date_bin errors
    * on "stride must be positive"; floorDiv would otherwise surface an
    * opaque ArithmeticException or, for negative widths, wrong bins). */
  def compute(widthUs: Long, tUs: Long, oUs: Long): Long = {
    if (widthUs <= 0)
      throw new IllegalArgumentException(
        s"date_bin_us: bin width must be positive, got $widthUs")
    Math.floorDiv(tUs - oUs, widthUs) * widthUs + oUs
  }
}

/** 64-bit order-sensitive rolling fingerprint of whitespace-split words:
  * fp_i = xxh64(bytes(w_i), seed = fp_{i-1}), fp_0 = 0. Replaces the round-1
  * transform+aggregate HOF chain, which ran interpreted (CodegenFallback) and
  * boxed per element; this is one static-call codegen'd loop over the
  * string's UTF-8 bytes with zero allocation (no split array is ever
  * materialized). Equal texts collide w.h.p. only when equal — the document
  * fingerprint of SURVEY §2.7. */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint needs a string arg, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(s: Any): Any =
    RollingFingerprint.compute(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingFingerprint.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RollingFingerprint {
  /** Chain over words (split on single space, like `split(text, ' ')` —
    * consecutive spaces yield empty words, hashed like any other). */
  def compute(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var fp = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        fp = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
          i - start, fp)
        start = i + 1
      }
      i += 1
    }
    fp
  }
}
