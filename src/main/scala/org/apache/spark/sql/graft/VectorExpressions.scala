package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Column↔Expression bridge for the graft engine. Lives under
  * `org.apache.spark.sql` because Spark 4 scopes `ExpressionUtils` (and
  * `AbstractDataType`) `private[sql]` — the standard pattern for extension
  * libraries shipping native Catalyst expressions.
  */
object GraftShim {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Native Catalyst expressions for the embedding hot path (SURVEY.md §2.4
  * "similarity search": preference order (b) — custom codegen `Expression`
  * beats higher-order functions beats UDFs).
  *
  * The higher-order formulation (`aggregate(zip_with(...))`,
  * [[ColumnOps.dotProduct]]) allocates an intermediate array and evaluates
  * interpreted lambdas per element — ~60µs/pair measured at dim=64. These
  * expressions compile to a tight primitive loop inside whole-stage codegen
  * (~0.05µs/pair), which is what makes exact all-pairs verification tiers and
  * brute-force top-k viable at all.
  *
  * Numerical contract (oracle parity): the fold is sequential element order
  * 0..n-1 in IEEE double — `acc += (double)a[i] * (double)b[i]` — exactly the
  * fold order of both the HOF formulation and DuckDB's
  * `list_sum(list_transform(list_zip(a,b), ...))`, so results are
  * bit-identical across all three. Null array → null result; null *elements*
  * are not expected (parquet embeddings are non-null) and read as 0.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float vector in double precision; same sequential-fold
  * contract as [[VectorDot]] (`acc += (double)a[i] * (double)a[i]`, then one
  * sqrt) so it is bit-identical to the HOF [[ColumnOps.l2Norm]] and DuckDB's
  * `sqrt(list_sum(list_transform(a, e -> e*e)))`.
  */
case class VectorNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = (double) $a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}
