package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Small codegen'd scalar expressions backing the remaining Presto
  * VarbinaryFunctions.java / StringFunctions.java tail:
  * double↔bits (for to/from_ieee754_*), Unicode normalize, and the
  * MySQL-pattern translator feeding date_parse/presto_date_format.
  */

/** Double.doubleToLongBits — basis of to_ieee754_64. */
case class DoubleToBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "double_to_bits"
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.doubleToLongBits($c)")
  override protected def withNewChildInternal(newChild: Expression): DoubleToBits =
    copy(child = newChild)
}

/** Double.longBitsToDouble — basis of from_ieee754_64. */
case class BitsToDouble(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bits_to_double"
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Double.longBitsToDouble(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.longBitsToDouble($c)")
  override protected def withNewChildInternal(newChild: Expression): BitsToDouble =
    copy(child = newChild)
}

/** Float.floatToIntBits — basis of to_ieee754_32. */
case class FloatToBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "float_to_bits"
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Float.floatToIntBits($c)")
  override protected def withNewChildInternal(newChild: Expression): FloatToBits =
    copy(child = newChild)
}

/** Float.intBitsToFloat — basis of from_ieee754_32. */
case class BitsToFloat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = FloatType
  override def prettyName: String = "bits_to_float"
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Float.intBitsToFloat(v.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Float.intBitsToFloat($c)")
  override protected def withNewChildInternal(newChild: Expression): BitsToFloat =
    copy(child = newChild)
}

/** combine_hash(h1, h2) = 31*h1 + h2 with Java wrap-around semantics
  * (CombineHashFunction.java / HashGenerationOptimizer) — ANSI-mode SQL
  * arithmetic would raise on overflow, so this is a native expression. */
case class CombineHash(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "combine_hash"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    31L * a.asInstanceOf[Long] + b.asInstanceOf[Long]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"31L * $a + $b")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CombineHash =
    copy(left = newLeft, right = newRight)
}

/** Unicode normalization (Presto StringFunctions.normalize — NFC default,
  * NFD/NFKC/NFKD via the form argument). */
case class NormalizeString(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize"
  override def nullSafeEval(s: Any, form: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      s.toString, Normalizer.Form.valueOf(form.toString.toUpperCase)))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NormalizeString =
    copy(left = newLeft, right = newRight)
}

/** MySQL `%`-pattern → java.time pattern ([[PrestoDatetime]]). Foldable
  * for literal patterns, so `date_parse(x, '%Y-%m-%d')` constant-folds
  * to Spark's codegen'd to_timestamp with a java.time literal — zero
  * per-row translation cost.
  */
case class PrestoPatternExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def foldable: Boolean = child.foldable
  override def prettyName: String = "presto_pattern"
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(PrestoDatetime.translateFormat(v.toString))
  override protected def withNewChildInternal(newChild: Expression): PrestoPatternExpr =
    copy(child = newChild)
}
