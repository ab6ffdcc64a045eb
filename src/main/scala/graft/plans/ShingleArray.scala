package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The one-pass kernel behind [[ShingleArray]], static so generated code
  * calls it directly (a single invoke inside whole-stage codegen — no
  * interpreted lambdas, no per-shingle regex work).
  */
object ShingleKernel {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** All k-word shingles of `text`, splitting EXACTLY like
    * `split(trim(text), "\\s+")`: UTF8String.trim strips ASCII spaces
    * only, and the -1 split limit keeps trailing empties — so the output
    * is word-for-word identical to the composed-expression formulation
    * (and therefore to the DuckDB oracle's regexp_split_to_array).
    */
  def shingles(text: UTF8String, k: Int): ArrayData = {
    val words = ws.split(text.trim().toString, -1)
    val n     = words.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    val sb  = new java.lang.StringBuilder
    var i   = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native shingling: `graft_shingles(text, k)` returns every k-word
  * shingle of the document in one O(L) pass over the row — the engine's
  * hottest primitive (d02/d03/d04/d06/t04/q44/q47 all start here).
  *
  * Why an expression and not composition: the composable forms are either
  * O(L²) per document (a `transform` lambda re-evaluating the outer split
  * per position, interpreted, on the scan task's core) or force a full
  * corpus shuffle (explode words + `lead()` window partitioned by doc —
  * every word of 100 TB through the wire before the first shingle
  * exists). This kernel splits once, joins adjacent words in place, and
  * stays inside whole-stage codegen; `explode(graft_shingles(...))` then
  * feeds the dedup family with zero exchanges before the first aggregate.
  */
case class ShingleArray(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) if right.foldable =>
      if (k >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"graft_shingles k must be >= 1, got $k")
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_shingles requires (string, constant int) arguments, got ($l, $r)")
  }

  private lazy val k: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(text: Any, kAny: Any): Any =
    ShingleKernel.shingles(text.asInstanceOf[UTF8String], kAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, kk) => {
      s"${ev.value} = graft.plans.ShingleKernel.shingles($text, $kk);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ShingleArray =
    copy(left = newLeft, right = newRight)
}
