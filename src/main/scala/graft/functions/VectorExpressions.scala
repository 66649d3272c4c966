package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`)
  * is interpreted per element with boxing; these expressions compile
  * to a tight primitive loop inside whole-stage codegen — the
  * difference is ~10× on the ANN/near-dup candidate scoring stages,
  * which at 100 TB is the dominant CPU cost.
  *
  * Both accept `array<float>` and `array<double>` children (floats
  * are widened per element, so results are exact doubles). Null
  * elements are not expected (embedding columns are dense).
  */
trait VectorLoopCodegen { self: BinaryExpression =>

  private def getterFor(dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }
  protected def leftGetter: String = getterFor(left.dataType)
  protected def rightGetter: String = getterFor(right.dataType)

  protected def elemAt(dt: DataType, a: ArrayData, i: Int): Double = dt match {
    case ArrayType(FloatType, _) => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} expects array<float>/array<double> columns, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }
}

/** dot(a, b) = Σ aᵢ·bᵢ over the common prefix length. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with VectorLoopCodegen {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += elemAt(left.dataType, x, i) * elemAt(right.dataType, y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val gl = leftGetter; val gr = rightGetter
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double sum = 0.0;
         |for (int i = 0; i < n; i++) {
         |  sum += (double)$a.$gl(i) * (double)$b.$gr(i);
         |}
         |${ev.value} = sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) in one pass; 0.0 when either norm is zero. */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression with VectorLoopCodegen {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = elemAt(left.dataType, x, i); val yv = elemAt(right.dataType, y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val gl = leftGetter; val gr = rightGetter
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, na = 0.0, nb = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double xv = (double)$a.$gl(i);
         |  double yv = (double)$b.$gr(i);
         |  dot += xv * yv; na += xv * xv; nb += yv * yv;
         |}
         |double denom = java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb);
         |${ev.value} = denom == 0.0 ? 0.0 : dot / denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column constructors for the native expressions. */
object NativeVector {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
