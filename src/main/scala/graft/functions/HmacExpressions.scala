package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HMAC family (Presto HmacFunctions.java: hmac_md5 / hmac_sha1 /
  * hmac_sha256 / hmac_sha512) as a Catalyst expression over
  * javax.crypto. Returns the lowercase hex digest. The Mac instance is
  * created per call (Mac is not thread-safe); key/message are UTF-8.
  */
case class Hmac(left: Expression, right: Expression, algorithm: String)
  extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = s"hmac_${algorithm.toLowerCase.replace("hmac", "")}"

  override def nullSafeEval(msg: Any, key: Any): Any =
    UTF8String.fromString(Hmac.compute(algorithm, msg.toString, key.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (m, k) =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |graft.functions.Hmac.compute("$algorithm", $m.toString(), $k.toString()))""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hmac =
    copy(left = l, right = r)
}

object Hmac {
  def compute(algorithm: String, message: String, key: String): String = {
    val mac = javax.crypto.Mac.getInstance(algorithm)
    mac.init(new javax.crypto.spec.SecretKeySpec(
      key.getBytes("UTF-8"), algorithm))
    mac.doFinal(message.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
  }
}
