package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Gauss error function — the scalar core of Presto's `normal_cdf` /
  * `inverse_normal_cdf` (reference: presto-main MathFunctions.java,
  * which delegates to Apache commons-math Erf). Spark has no erf
  * builtin, so this is a codegen'd expression using the
  * Abramowitz–Stegun 7.1.26 rational approximation (|ε| ≤ 1.5e-7 —
  * well inside the 4-decimal oracle tolerance).
  *
  * normal_cdf(mean, sd, v) ≡ 0.5 * (1 + erf((v - mean) / (sd * √2)))
  * composes from this plus built-in arithmetic (see fn_normal_cdf).
  */
case class Erf(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "erf"

  override def nullSafeEval(a: Any): Any = Erf.compute(a.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.Erf.compute($x)")

  override protected def withNewChildInternal(c: Expression): Erf = copy(child = c)
}

object Erf {
  /** Abramowitz–Stegun 7.1.26. */
  def compute(x: Double): Double = {
    val sign = if (x < 0) -1.0 else 1.0
    val ax = math.abs(x)
    val t = 1.0 / (1.0 + 0.3275911 * ax)
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-ax * ax)
    sign * y
  }

  /** Rational approximation of the probit (inverse normal CDF),
    * Acklam's algorithm (|ε| < 1.15e-9) — powers inverse_normal_cdf.
    */
  def probit(p: Double): Double = {
    if (p <= 0.0 || p >= 1.0) return Double.NaN
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pLow) {
      val q = p - 0.5
      val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }
}

/** Probit as an expression (inverse_normal_cdf composes from it). */
case class Probit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "probit"
  override def nullSafeEval(a: Any): Any = Erf.probit(a.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.Erf.probit($x)")
  override protected def withNewChildInternal(c: Expression): Probit = copy(child = c)
}

/** Regularized incomplete beta I_x(a,b) — the scalar core of Presto's
  * `beta_cdf` / `inverse_beta_cdf` (MathFunctions.java, which delegate
  * to commons-math BetaDistribution). Continued-fraction evaluation by
  * the modified Lentz method with the standard symmetry reduction
  * (published in Numerical Recipes §6.4 and DLMF 8.17); |ε| well under
  * the 6-decimal oracle tolerance. The inverse is bisection on the
  * monotone CDF — 80 halvings ≈ 2^-80, far past double precision. */
object BetaDist {
  private def lnGamma(x: Double): Double = {
    // Lanczos approximation (g=7, n=9), standard public coefficients
    val c = Array(0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - lnGamma(1.0 - x)
    else {
      val z = x - 1.0
      var s = c(0)
      var i = 1
      while (i < 9) { s += c(i) / (z + i); i += 1 }
      val t = z + 7.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(s)
    }
  }

  private def betacf(a: Double, b: Double, x: Double): Double = {
    val eps = 1e-15
    val fpmin = 1e-300
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 200) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) return h
      m += 1
    }
    h
  }

  def cdf(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val front = math.exp(lnGamma(a + b) - lnGamma(a) - lnGamma(b) +
      a * math.log(x) + b * math.log(1.0 - x))
    if (x < (a + 1.0) / (a + b + 2.0)) front * betacf(a, b, x) / a
    else 1.0 - front * betacf(b, a, 1.0 - x) / b
  }

  def inverseCdf(a: Double, b: Double, p: Double): Double = {
    if (p <= 0.0) return 0.0
    if (p >= 1.0) return 1.0
    var lo = 0.0
    var hi = 1.0
    var i = 0
    while (i < 80) {
      val mid = 0.5 * (lo + hi)
      if (cdf(a, b, mid) < p) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }
}

case class BetaCdf(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "beta_cdf"
  override def nullSafeEval(a: Any, b: Any, x: Any): Any =
    BetaDist.cdf(a.asInstanceOf[Double], b.asInstanceOf[Double],
      x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, x) =>
      s"graft.functions.BetaDist.cdf($a, $b, $x)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, x: Expression): BetaCdf =
    copy(first = a, second = b, third = x)
}

case class InverseBetaCdf(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "inverse_beta_cdf"
  override def nullSafeEval(a: Any, b: Any, p: Any): Any =
    BetaDist.inverseCdf(a.asInstanceOf[Double], b.asInstanceOf[Double],
      p.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, p) =>
      s"graft.functions.BetaDist.inverseCdf($a, $b, $p)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, p: Expression): InverseBetaCdf =
    copy(first = a, second = b, third = p)
}
