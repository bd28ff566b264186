package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns — the preferred extension mechanism when a
  * scalar must run inside whole-stage codegen (SURVEY.md §2-K preference
  * order: compose built-ins > native Expression > Scala UDF).
  *
  * Arithmetic contract: one fused index-order loop accumulating dot /
  * ‖a‖² / ‖b‖² — each accumulator sums in exactly the order the HOF
  * formulation (`aggregate(zip_with(...))` in [[graft.ops.Llm]]) folds, so
  * results are bit-identical to both the HOF path and the typed kernels,
  * and the DuckDB oracle keeps hash-matching. Unlike a Scala UDF there is
  * no Catalyst→Scala `Seq` boxing: `eval` uses the primitive
  * `toDoubleArray` fast path and `doGenCode` emits the loop straight into
  * the generated Java, keeping the surrounding WholeStageCodegen span
  * intact.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  private def compute(xa: Array[Double], ya: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < xa.length) {
      dot += xa(i) * ya(i); na += xa(i) * xa(i); nb += ya(i) * ya(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData].toDoubleArray(),
      b.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xa = ctx.freshName("xa"); val ya = ctx.freshName("ya")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      s"""
         |double[] $xa = $a.toDoubleArray();
         |double[] $ya = $b.toDoubleArray();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $xa.length; $i++) {
         |  $dot += $xa[$i] * $ya[$i];
         |  $na += $xa[$i] * $xa[$i];
         |  $nb += $ya[$i] * $ya[$i];
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration surface for the native functions: per-session (for the
  * driver's plain sessions) and via `spark.sql.extensions` config
  * ([[GraftExtensions]]) for sessions the user builds. */
object GraftFunctions {
  val cosineDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_cosine expects 2 arguments")
      CosineSimilarity(children(0), children(1))
    })

  /** idempotent — SimpleFunctionRegistry.registerFunction overwrites */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.registerFunction(
      cosineDescriptor._1, cosineDescriptor._2, cosineDescriptor._3)
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftFunctions.cosineDescriptor)
}
