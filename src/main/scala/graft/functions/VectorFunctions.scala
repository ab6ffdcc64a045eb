package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns.
  *
  * `dot` resolves to the native codegen'd [[graft.plans.DotProduct]]
  * expression (registered by [[graft.GraftSession.registerFunctions]]);
  * `hofDot` keeps the composable `zip_with`/`aggregate` formulation as the
  * bit-identical reference (elements widened to double before multiplying,
  * summed in index order — both match a double-precision SQL oracle).
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def hofDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v,
    )

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))
}
