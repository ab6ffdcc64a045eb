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

  /** Fixed-point micro-unit quantization: component → ⌊x·10⁶ + 0.5⌋ as
    * BIGINT. `floor` (not `round`) so half-way ties resolve identically
    * in every engine — Spark rounds doubles HALF_UP via BigDecimal,
    * DuckDB half-away-from-zero, but ⌊·⌋ of the same double is the same
    * everywhere. This is what makes iterative float algorithms (Lloyd
    * k-means) hash-exact across engines: all arithmetic after this
    * projection is exact integer math, immune to aggregation order.
    */
  def toMicro(a: Column): Column =
    transform(a, x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))

  /** Exact integer dot product over micro-unit vectors — the native
    * codegen'd [[graft.plans.LongDotProduct]]. Sums are
    * order-independent (integer associativity), so any partitioning of
    * the aggregate yields the identical BIGINT.
    */
  def dotLong(a: Column, b: Column): Column = call_function("graft_dotl", a, b)

  /** The composable HOF reference formulation of [[dotLong]] (kept as
    * the bit-identical cross-check, like [[hofDot]] for floats).
    */
  def hofDotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
}
