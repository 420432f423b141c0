/* Lives in Spark's expressions package: HigherOrderFunction's
 * argumentTypes/functionTypes contract is typed with the private[sql]
 * AbstractDataType, so a lambda-taking expression cannot be declared
 * from an application package (same approach as other Spark-extending
 * libraries). The only graft source under org.apache.spark.*. */
package org.apache.spark.sql.catalyst.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, AnyDataType, DataType}

/** Presto `apply(input, function)` — evaluate a unary lambda at a
  * scalar value (reference ApplyFunction.java). A genuine
  * [[HigherOrderFunction]] so the analyzer accepts the lambda argument
  * and binds its parameter to the input's type; evaluation follows the
  * same interpreted path as Spark's own higher-order functions (which
  * are likewise non-codegen).
  *
  * Null input flows INTO the lambda (Presto lambdas are null-accepting:
  * `apply(NULL, x -> coalesce(x, 1))` is 1), so there is no null
  * short-circuit here.
  */
case class ApplyLambda(argument: Expression, function: Expression)
    extends HigherOrderFunction with CodegenFallback {

  override def children: Seq[Expression] = argument :: function :: Nil
  override def arguments: Seq[Expression] = argument :: Nil
  override def argumentTypes: Seq[AbstractDataType] = AnyDataType :: Nil
  override def functions: Seq[Expression] = function :: Nil
  override def functionTypes: Seq[AbstractDataType] = AnyDataType :: Nil
  override def dataType: DataType = function.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "apply"

  override protected def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): ApplyLambda =
    copy(function = f(function, (argument.dataType, argument.nullable) :: Nil))

  @transient private lazy val elemVar: NamedLambdaVariable = function match {
    case LambdaFunction(_, Seq(v: NamedLambdaVariable), _) => v
    case other => throw new IllegalArgumentException(
      s"apply(input, function) requires a unary lambda, got: $other")
  }

  override def eval(input: InternalRow): Any = {
    elemVar.value.set(argument.eval(input))
    functionsForEval.head.eval(input)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApplyLambda =
    copy(argument = newChildren(0), function = newChildren(1))
}
