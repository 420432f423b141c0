package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `url_encode` / `url_decode` — the last two members of the URL
  * function family (reference: presto-main UrlFunctions.java:150-170).
  * The reference escapes with Guava's urlFormParameterEscaper and
  * decodes with java.net.URLDecoder — both implement
  * application/x-www-form-urlencoded (alphanumerics and `*-._`
  * preserved, space ⇄ `+`, everything else percent-encoded as UTF-8
  * bytes), which is exactly java.net.URLEncoder's contract. */
object UrlCodec {
  def encode(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
  def decode(s: String): String =
    java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)
}

case class UrlEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_encode"
  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(UrlCodec.encode(s.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.UrlCodec.encode($s.toString()))""".stripMargin)
  override protected def withNewChildInternal(c: Expression): UrlEncode =
    copy(child = c)
}

case class UrlDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_decode"
  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(UrlCodec.decode(s.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.UrlCodec.decode($s.toString()))""".stripMargin)
  override protected def withNewChildInternal(c: Expression): UrlDecode =
    copy(child = c)
}
