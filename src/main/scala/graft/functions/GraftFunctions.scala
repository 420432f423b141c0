package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

/** Registration of graft's custom Catalyst expressions, mirroring the
  * reference's plugin function SPI (presto-spi Plugin.getFunctions →
  * FunctionRegistry.addFunctions, SURVEY.md §2.11).
  *
  * Two entry points:
  *  - [[GraftFunctions.register]]: direct FunctionRegistry injection on
  *    an existing session (used by GraftSession).
  *  - [[GraftExtensions]]: `spark.sql.extensions`-style injection for
  *    sessions built elsewhere.
  */
object GraftFunctions {
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("max_n",
      new ExpressionInfo(classOf[BoundedTopNAgg].getName, "max_n"),
      (args: Seq[Expression]) =>
        BoundedTopNAgg(args(0), args(1), wantLargest = true).toAggregateExpression()),
    ("min_n",
      new ExpressionInfo(classOf[BoundedTopNAgg].getName, "min_n"),
      (args: Seq[Expression]) =>
        BoundedTopNAgg(args(0), args(1), wantLargest = false).toAggregateExpression()),
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    ("vec_norm",
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (args: Seq[Expression]) => VecNorm(args(0))),
    ("erf",
      new ExpressionInfo(classOf[Erf].getName, "erf"),
      (args: Seq[Expression]) => Erf(Cast(args(0), DoubleType))),
    ("probit",
      new ExpressionInfo(classOf[Probit].getName, "probit"),
      (args: Seq[Expression]) => Probit(Cast(args(0), DoubleType))),
    ("hmac_md5",
      new ExpressionInfo(classOf[Hmac].getName, "hmac_md5"),
      (args: Seq[Expression]) => Hmac(args(0), args(1), "HmacMD5")),
    ("hmac_sha1",
      new ExpressionInfo(classOf[Hmac].getName, "hmac_sha1"),
      (args: Seq[Expression]) => Hmac(args(0), args(1), "HmacSHA1")),
    ("hmac_sha256",
      new ExpressionInfo(classOf[Hmac].getName, "hmac_sha256"),
      (args: Seq[Expression]) => Hmac(args(0), args(1), "HmacSHA256")),
    ("hmac_sha512",
      new ExpressionInfo(classOf[Hmac].getName, "hmac_sha512"),
      (args: Seq[Expression]) => Hmac(args(0), args(1), "HmacSHA512"))
  )

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}
