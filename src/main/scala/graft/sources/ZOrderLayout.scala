package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER clustered layout — the multi-dimensional data-layout lever
  * (SURVEY.md §2.5 #281). A table sorted on one column prunes scans on
  * that column only; a 100 TB fact table is probed on several (user AND
  * time, part AND supplier). Interleaving the bit representations of two
  * dimensions into one sort key ("Morton order") makes file/row-group
  * min-max envelopes tight on BOTH dimensions at once, so the parquet
  * stats pruning Spark already does (pushed filters skip row groups whose
  * footer range excludes the predicate; the same envelope logic drives
  * file-level skipping in table formats) cuts the scan on either
  * predicate — at the cost of each envelope being ~√files wide instead
  * of 1/files on the single sorted column.
  *
  * Spark-first: the z-value is a pure codegen'd column expression (a
  * 16-step shift/mask fold — no UDF), the layout is one
  * `repartitionByRange` (sampled range bounds, no SinglePartition) plus a
  * within-partition sort, and the write is a plain parquet sink. Nothing
  * here is a new storage format — it is a write-ORDER discipline over the
  * stock one.
  *
  * Dimension normalization is linear min/max bucketing into `bits`-bit
  * codes (`width_bucket`, broadcast 1-row stats). Linear buckets keep
  * codes engine-exact; heavily skewed dimensions would want
  * quantile-edge bucketing (the q74 percentile machinery) — documented,
  * not silently applied, since rank codes cost a second pass.
  */
object ZOrderLayout {

  /** Interleave the low `bits` bits of two non-negative codes:
    * bit i of `a` lands at 2i, bit i of `b` at 2i+1. Stays inside
    * whole-stage codegen (shift/and/or only).
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** `df` clustered on the z-curve over (`dimA`, `dimB`): each dimension
    * linearly bucketed to `bits`-bit codes against its broadcast global
    * min/max, rows range-partitioned into `nFiles` z-runs and sorted
    * within each. Write the result with a plain `.write.parquet` — one
    * file per partition, each covering a compact z-range whose projection
    * onto EITHER dimension is narrow.
    */
  def cluster(df: DataFrame, dimA: String, dimB: String,
              nFiles: Int, bits: Int = 16): DataFrame = {
    val n = 1 << bits
    val stats = df.agg(
      min(col(dimA).cast("double")).as("a_lo"), max(col(dimA).cast("double")).as("a_hi"),
      min(col(dimB).cast("double")).as("b_lo"), max(col(dimB).cast("double")).as("b_hi"))
    def code(c: Column, lo: Column, hi: Column): Column =
      // width_bucket yields 1..n+1 on [lo, hi]; clamp the hi edge, and
      // coalesce degenerate (lo = hi → NULL) dimensions to a single 0 code
      least(greatest(coalesce(width_bucket(c.cast("double"), lo, hi, lit(n)), lit(1L)) - 1L,
        lit(0L)), lit(n - 1L))
    df.crossJoin(broadcast(stats))
      .withColumn("z",
        zValue(code(col(dimA), col("a_lo"), col("a_hi")),
               code(col(dimB), col("b_lo"), col("b_hi")), bits))
      .drop("a_lo", "a_hi", "b_lo", "b_hi")
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
  }

  /** Per-file min/max envelopes of `cols` for a written parquet dir —
    * the same footer stats a reader's pruning consults, gathered in ONE
    * scan via input_file_name (not a per-file job).
    */
  def envelopes(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))).head,
           cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))).tail: _*)
}
