package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Color / ANSI-rendering functions (reference: presto-main
  * operator/scalar/ColorFunctions.java + ColorType).
  *
  * Presto's COLOR type is a long: non-negative = 24-bit RGB, negative
  * = -(ansi-system-color-index + 1). The same encoding is kept here as
  * plain BIGINT (the type itself carries no behavior beyond these
  * functions). Gradient interpolation runs in HSB space exactly as the
  * reference does (ColorFunctions.interpolate via java.awt.Color's
  * RGB↔HSB conversions — a JDK math utility, no graphics environment).
  *
  * These are terminal-rendering helpers, not analytics hot paths, so
  * the expressions are eval-based (CodegenFallback) — each call is a
  * handful of arithmetic ops on already-computed values.
  */
object ColorOps {
  val AnsiReset = "\u001b[0m"

  private val systemColors =
    Array("black", "red", "green", "yellow", "blue", "magenta", "cyan", "white")

  /** ColorFunctions.color(varchar): '#rgb' CSS short form (nibbles
    * replicated) or a system color name → negative encoding. */
  def parse(s: String): Long = {
    if (s.length == 4 && s.charAt(0) == '#') {
      val r = Character.digit(s.charAt(1), 16)
      val g = Character.digit(s.charAt(2), 16)
      val b = Character.digit(s.charAt(3), 16)
      if (r >= 0 && g >= 0 && b >= 0)
        return rgb(r * 17L, g * 17L, b * 17L)
    }
    val idx = systemColors.indexOf(s.toLowerCase)
    if (idx < 0) throw new IllegalArgumentException(s"Invalid color: '$s'")
    -(idx + 1L)
  }

  /** ColorFunctions.rgb: range-checked 24-bit pack. */
  def rgb(r: Long, g: Long, b: Long): Long = {
    require(r >= 0 && r <= 255, "red must be between 0 and 255")
    require(g >= 0 && g <= 255, "green must be between 0 and 255")
    require(b >= 0 && b <= 255, "blue must be between 0 and 255")
    (r << 16) | (g << 8) | b
  }

  /** ColorFunctions.color(fraction, low, high): clamp to [0,1], then
    * linear interpolation of each HSB component. */
  def interpolate(fraction: Double, low: Long, high: Long): Long = {
    require(low >= 0, "lowColor not a valid RGB color")
    require(high >= 0, "highColor not a valid RGB color")
    val f = math.min(1.0, math.max(0.0, fraction)).toFloat
    interpolateUnchecked(f, low, high)
  }

  private def interpolateUnchecked(f: Float, low: Long, high: Long): Long = {
    val lo = java.awt.Color.RGBtoHSB(
      ((low >> 16) & 0xff).toInt, ((low >> 8) & 0xff).toInt, (low & 0xff).toInt, null)
    val hi = java.awt.Color.RGBtoHSB(
      ((high >> 16) & 0xff).toInt, ((high >> 8) & 0xff).toInt, (high & 0xff).toInt, null)
    val h = f * (hi(0) - lo(0)) + lo(0)
    val s = f * (hi(1) - lo(1)) + lo(1)
    val v = f * (hi(2) - lo(2)) + lo(2)
    (java.awt.Color.HSBtoRGB(h, s, v) & 0xffffff).toLong
  }

  /** ESC[38;5;<n>m — rgb rescaled to the 6×6×6 ansi cube, system
    * colors to their raw index (ColorFunctions.toAnsi). */
  def ansiEscape(color: Long): String = {
    val n =
      if (color >= 0) {
        val r = (((color >> 16) & 0xff) * 6 / 256).toInt
        val g = (((color >> 8) & 0xff) * 6 / 256).toInt
        val b = ((color & 0xff) * 6 / 256).toInt
        16 + r * 36 + g * 6 + b
      } else (-color - 1).toInt
    "\u001b[38;5;" + n + "m"
  }

  def render(value: String, color: Long): String =
    ansiEscape(color) + value + AnsiReset

  /** ColorFunctions.bar: count = clamp(percent·width); one gradient
    * step per block char, a single reset, space-padded to width. */
  def bar(percent: Double, width: Long, low: Long, high: Long): String = {
    val count = math.max(0L, math.min(width, (percent * width).toLong))
    val sb = new StringBuilder
    var i = 0L
    while (i < count) {
      val f = (i * 1.0 / (width - 1)).toFloat
      sb.append(ansiEscape(interpolateUnchecked(f, low, high))).append('█')
      i += 1
    }
    sb.append(AnsiReset)
    i = count
    while (i < width) { sb.append(' '); i += 1 }
    sb.toString
  }
}

case class ColorParse(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "color"
  override protected def nullSafeEval(v: Any): Any = ColorOps.parse(v.toString)
  override protected def withNewChildInternal(newChild: Expression): ColorParse =
    copy(child = newChild)
}

case class ColorRgb(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "rgb"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else ColorOps.rgb(vs(0).asInstanceOf[Number].longValue(),
      vs(1).asInstanceOf[Number].longValue(), vs(2).asInstanceOf[Number].longValue())
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ColorRgb = copy(children = newChildren)
}

/** color(fraction, low, high) and, via the 5-arg builder,
  * color(value, vlow, vhigh, low, high) = color((value-vlow)/(vhigh-vlow), …). */
case class ColorInterpolate(children: Seq[Expression])
  extends Expression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "color"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else ColorOps.interpolate(vs(0).asInstanceOf[Number].doubleValue(),
      vs(1).asInstanceOf[Number].longValue(), vs(2).asInstanceOf[Number].longValue())
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ColorInterpolate = copy(children = newChildren)
}

/** render(x, color) for varchar/bigint/double x, and render(boolean)
  * (green check / red cross) via the 1-arg builder. */
case class ColorRender(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "render"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val out =
      if (children.length == 1)
        // RENDERED_TRUE / RENDERED_FALSE (ColorFunctions.java:39-40)
        if (vs(0).asInstanceOf[Boolean])
          ColorOps.render("✓", ColorOps.parse("green"))
        else ColorOps.render("✗", ColorOps.parse("red"))
      else {
        val s = children(0).dataType match {
          case DoubleType => vs(0).asInstanceOf[Double].toString
          case FloatType => vs(0).asInstanceOf[Float].toString
          case _ => vs(0).toString
        }
        ColorOps.render(s, vs(1).asInstanceOf[Number].longValue())
      }
    UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ColorRender = copy(children = newChildren)
}

case class ColorBar(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "bar"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else UTF8String.fromString(ColorOps.bar(
      vs(0).asInstanceOf[Number].doubleValue(), vs(1).asInstanceOf[Number].longValue(),
      vs(2).asInstanceOf[Number].longValue(), vs(3).asInstanceOf[Number].longValue()))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ColorBar = copy(children = newChildren)
}

object ColorCatalog {
  import org.apache.spark.sql.catalyst.expressions.{Divide, Subtract, Cast, Literal, If, EqualTo, LessThan}

  // the eval paths unbox via java.lang.Number, which Spark's Decimal
  // (the type of bare literals like 0.5) does not implement — cast
  // every numeric child at build time, like Presto's signature coercion
  private def d(e: Expression) = Cast(e, DoubleType)
  private def l(e: Expression) = Cast(e, LongType)

  private def builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("color", new ExpressionInfo(classOf[ColorParse].getName, "color"),
      (args: Seq[Expression]) => args.length match {
        case 1 => ColorParse(args.head)
        case 3 => ColorInterpolate(Seq(d(args(0)), l(args(1)), l(args(2))))
        // color(value, low, high, lowColor, highColor) =
        // color((value-low)/(high-low), lowColor, highColor).
        // high == low: Java division yields ±Infinity, which Presto's
        // clamp maps to the high/low color — Spark's non-ANSI Divide
        // yields NULL instead, so the zero-width range is special-cased
        // (ADVICE r3)
        case 5 =>
          val (value, low, high) = (d(args(0)), d(args(1)), d(args(2)))
          val fraction = If(EqualTo(high, low),
            If(LessThan(value, low), Literal(0.0), Literal(1.0)),
            Divide(Subtract(value, low), Subtract(high, low)))
          ColorInterpolate(Seq(fraction, l(args(3)), l(args(4))))
        case n => throw new IllegalArgumentException(s"color: invalid arity $n")
      }),
    ("rgb", new ExpressionInfo(classOf[ColorRgb].getName, "rgb"),
      (args: Seq[Expression]) => ColorRgb(args.map(l))),
    ("render", new ExpressionInfo(classOf[ColorRender].getName, "render"),
      (args: Seq[Expression]) =>
        if (args.length == 2) ColorRender(Seq(args(0), l(args(1))))
        else ColorRender(args)),
    ("bar", new ExpressionInfo(classOf[ColorBar].getName, "bar"),
      (args: Seq[Expression]) => args.length match {
        case 2 => ColorBar(Seq(d(args(0)), l(args(1)),
          Literal(0xff0000L), Literal(0x00ff00L)))
        case 4 => ColorBar(Seq(d(args(0)), l(args(1)), l(args(2)), l(args(3))))
        case n => throw new IllegalArgumentException(s"bar: invalid arity $n")
      })
  )

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
