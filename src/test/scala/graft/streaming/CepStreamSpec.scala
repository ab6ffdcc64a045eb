package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Temporal

/** SURVEY.md §2.3 #173 — streaming CEP: the live q39. Equality with the
  * batch MATCH_RECOGNIZE-class query over the full feed, micro-batch-
  * split invariance, and restart continuity from a checkpoint.
  */
class CepStreamSpec extends SparkSpec {
  import CepStream._

  private def tmp(prefix: String): String = {
    val base = new java.io.File("target/streaming-tmp").toPath.toAbsolutePath
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private def withRocksDb[A](body: => A): A = {
    val key  = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** The full sf0.001 events feed as TypedEvents in global (ts, id) order
    * — per-key order is preserved under any contiguous batch split.
    */
  private lazy val feed: Seq[TypedEvent] = {
    implicit val enc = Encoders.product[TypedEvent]
    graft.sources.Tables.events(spark, sf)
      .select(col("event_id").as("eventId"), col("user_id").as("key"), col("ts"), col("event_type").as("eventType"))
      .as[TypedEvent]
      .collect().toSeq
      .sortBy(e => (CdcMaterializer.micros(e.ts), e.eventId))
  }

  /** Batch q39 truth: user -> has_funnel. */
  private lazy val batchTruth: Map[Long, Boolean] =
    Temporal.eventPattern(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Boolean]("has_funnel")).toMap

  private def runCep(name: String, batches: Seq[Seq[TypedEvent]],
      pattern: String = "s[vc]*p"): Map[Long, Boolean] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[TypedEvent]
    val q = CepStream.matches(input.toDS(), pattern)
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Update())
      .option("checkpointLocation", tmp(name)).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect().toSeq
        .groupBy(_.getAs[Long]("key"))
        .map { case (k, rs) => k -> rs.last.getAs[Boolean]("matched") }
    } finally q.stop()
  }

  test("#173a NFA compile/step: tokens, closures, containment semantics") {
    val toks = compile("s[vc]*p")
    assert(toks == Vector(Tok(Set('s'), false), Tok(Set('v', 'c'), true), Tok(Set('p'), false)))
    // sticky accept, like the processor: containment means "matched at
    // ANY prefix", not "accepting after the last char" (trailing events
    // drop the accept bit from the mask, never the answer)
    def matchStr(s: String): Boolean = {
      var m   = closure(1L, toks)
      var acc = accepts(m, toks)
      s.foreach { c => m = step(m, c, toks); acc ||= accepts(m, toks) }
      acc
    }
    // containment (rlike) semantics, exactly the batch predicate
    for (s <- Seq("svp", "sp", "svvcccp", "xxsvpzz", "psvp", "ssp"))
      assert(matchStr(s), s"'$s' must match")
    for (s <- Seq("", "s", "p", "ps", "svc", "pvs", "sxp"))
      assert(!matchStr(s), s"'$s' must not match")
    // and agreement with Java regex containment on random event strings
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = (1 to rnd.nextInt(12)).map(_ => "svcpe".charAt(rnd.nextInt(5))).mkString
      assert(matchStr(s) == "s[vc]*p".r.findFirstIn(s).isDefined, s"divergence on '$s'")
    }
  }

  test("#173e grammar extensions: + ? . agree with Java regex containment") {
    val rnd = new scala.util.Random(7)
    for (pat <- Seq("sv+p", "s.?p", "s.p", "[sv]+e", "sv?c*p", "p.+p")) {
      val toks = compile(pat)
      def matchStr(s: String): Boolean = {
        var m   = closure(1L, toks)
        var acc = accepts(m, toks)
        s.foreach { c => m = step(m, c, toks); acc ||= accepts(m, toks) }
        acc
      }
      (1 to 300).foreach { _ =>
        val s = (1 to rnd.nextInt(10)).map(_ => "svcpe".charAt(rnd.nextInt(5))).mkString
        assert(matchStr(s) == pat.r.findFirstIn(s).isDefined, s"'$pat' diverges on '$s'")
      }
    }
  }

  test("#173f character-class ranges expand with rlike semantics; descending ranges fail fast") {
    assert(compile("[a-d]") == Vector(Tok(Set('a', 'b', 'c', 'd'), false)))
    // '-' first or last in the body is a literal (regex convention)
    assert(compile("[-ab]") == Vector(Tok(Set('-', 'a', 'b'), false)))
    assert(compile("[ab-]") == Vector(Tok(Set('a', 'b', '-'), false)))
    // mixed literals and ranges
    assert(compile("[xa-cz]") == Vector(Tok(Set('x', 'a', 'b', 'c', 'z'), false)))
    // descending range: rejected at compile, not silently empty
    intercept[IllegalArgumentException](compile("[z-a]"))
    // agreement with Java regex containment on random strings
    val rnd = new scala.util.Random(11)
    for (pat <- Seq("[a-c]+d", "x[p-s]?y", "[su-w]*e")) {
      val toks = compile(pat)
      def matchStr(s: String): Boolean = {
        var m   = closure(1L, toks)
        var acc = accepts(m, toks)
        s.foreach { c => m = step(m, c, toks); acc ||= accepts(m, toks) }
        acc
      }
      (1 to 300).foreach { _ =>
        val s = (1 to rnd.nextInt(10)).map(_ => "abcdpqrsuvwxye".charAt(rnd.nextInt(14))).mkString
        assert(matchStr(s) == pat.r.findFirstIn(s).isDefined, s"'$pat' diverges on '$s'")
      }
    }
  }

  private def runCepOrdered(name: String, batches: Seq[Seq[TypedEvent]],
      pattern: String = "s[vc]*p", delay: String = "10 minutes"): Map[Long, Boolean] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[TypedEvent]
    val q = CepStream.matchesOrdered(input.toDS(), pattern, delay)
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Update())
      .option("checkpointLocation", tmp(name)).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect().toSeq
        .groupBy(_.getAs[Long]("key"))
        .map { case (k, rs) => k -> rs.last.getAs[Boolean]("matched") }
    } finally q.stop()
  }

  test("#173g watermark-ordered CEP: a cross-batch late event folds in event-time order, matching batch") {
    def at(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    // key 1 receives 'p' FIRST (arrival), then 's' arrives late in a
    // later micro-batch with an EARLIER event time. Event-time order is
    // s,p → "sp" matches the pattern; arrival order p,s does not.
    val batches = Seq(
      Seq(TypedEvent(2L, 1L, at(5), "p"), TypedEvent(10L, 99L, at(6), "x")),
      Seq(TypedEvent(1L, 1L, at(0), "s"), TypedEvent(11L, 99L, at(20), "x")), // wm after: min(20)-10 = 10
      Seq(TypedEvent(12L, 99L, at(40), "x")), // wm 30 → key 1's buffer finalizes via timers
    )
    val ordered = runCepOrdered("cep_ord", batches, pattern = "sp")
    assert(ordered(1L), "event-time order s,p must match 'sp'")
    // the arrival-order variant provably diverges on the same feed —
    // this IS the documented contract difference the variant closes
    val arrival = runCep("cep_arr_div", batches, pattern = "sp")
    assert(!arrival(1L), "arrival order p,s must NOT match 'sp'")
    // batch truth over the full history agrees with the ordered variant
    val history = batches.flatten.filter(_.key == 1L)
      .sortBy(e => (e.ts.getTime, e.eventId)).map(_.eventType).mkString
    assert("sp".r.findFirstIn(history).isDefined)
  }

  test("#173h watermark-ordered CEP == batch truth on a slack-bounded SHUFFLED arrival of the sf0.001 feed") {
    // perturb arrival order within the watermark slack: sort by
    // (ts + deterministic jitter < slack) — the ordered variant must
    // still equal the batch q39 truth; split across 5 micro-batches
    val rnd = new scala.util.Random(31)
    val jittered = feed.map(e => (e, CdcMaterializer.micros(e.ts) + rnd.nextInt(8 * 60 * 1000) * 1000L))
      .sortBy(_._2).map(_._1)
    val n = (jittered.size + 4) / 5
    // closing tick far past the end so every buffered event finalizes
    val closer = TypedEvent(-1L, -1L, new Timestamp(feed.map(_.ts.getTime).max + 3600L * 1000), "x")
    val batches = jittered.grouped(n).toSeq :+ Seq(closer)
    val live = runCepOrdered("cep_ord_full", batches, delay = "10 minutes")
    val diverging = batchTruth.collect { case (k, m) if live.get(k).exists(_ != m) => k }
    assert(diverging.isEmpty, s"ordered CEP diverges from batch truth for users: ${diverging.take(10)}")
    assert(batchTruth.keySet.forall(live.contains), "every user must reach a finalized status")
  }

  test("#173i ordered-CEP restart continuity: buffered events and timers survive the checkpoint") { withRocksDb {
    implicit val enc = Encoders.product[TypedEvent]
    val srcDir = tmp("ceposrc")
    val ck     = tmp("cepock")
    val outDir = tmp("cepoout")
    val schema = StructType(Seq(
      StructField("eventId", LongType), StructField("key", LongType),
      StructField("ts", TimestampType), StructField("eventType", StringType)))
    def writeFile(name: String, rows: Seq[TypedEvent]): Unit =
      Files.write(
        java.nio.file.Paths.get(srcDir, name),
        rows.map { e =>
          val iso = java.time.Instant.ofEpochSecond(0, CdcMaterializer.micros(e.ts) * 1000L).toString
          s"""{"eventId":${e.eventId},"key":${e.key},"ts":"$iso","eventType":"${e.eventType}"}"""
        }.mkString("\n").getBytes("UTF-8"))
    def run(): Unit = {
      val q = CepStream
        .matchesOrdered(spark.readStream.schema(schema).json(srcDir).as[TypedEvent], "sp", "10 minutes")
        .toDF()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.write.mode("append").parquet(outDir)
        }
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ck)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def at(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    // deployment 1: key 1's 'p' arrives FIRST and buffers (watermark
    // still behind it when the deployment stops)
    writeFile("f1.json", Seq(TypedEvent(2L, 1L, at(5), "p"), TypedEvent(10L, 99L, at(6), "x")))
    run()
    // deployment 2: the late 's' (earlier event time) joins the
    // CHECKPOINTED buffer; later traffic advances the watermark so the
    // pair finalizes in event-time order s,p → match
    writeFile("f2.json", Seq(TypedEvent(1L, 1L, at(0), "s"), TypedEvent(11L, 99L, at(30), "x")))
    run()
    writeFile("f3.json", Seq(TypedEvent(12L, 99L, at(60), "x")))
    run()
    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Boolean]("matched"), r.getAs[Long]("n_events")))
    val key1 = rows.filter(_._1 == 1L).maxBy(_._3)
    assert(key1._2, s"buffered 'p' must survive the restart and fold AFTER the late 's': $rows")
    assert(key1._3 == 2L, "both events must fold exactly once across deployments")
  }}

  test("#173b live CEP equals batch q39 over the full sf0.001 feed") {
    val live = runCep("cep_full", Seq(feed))
    assert(live.keySet == batchTruth.keySet, "every user with events must have a status")
    assert(live == batchTruth, {
      val diff = live.collect { case (k, v) if batchTruth(k) != v => k }.take(5)
      s"live != batch for users $diff"
    })
    // every sf0.001 user completes the funnel (66-event histories), so
    // exercise BOTH outcomes with a more selective pattern, checked
    // against direct regex containment over the assembled histories
    val histories = feed.groupBy(_.key).view
      .mapValues(_.sortBy(e => (CdcMaterializer.micros(e.ts), e.eventId))
        .flatMap(_.eventType.headOption).mkString).toMap
    val wantSpp = histories.view.mapValues(h => "spp".r.findFirstIn(h).isDefined).toMap
    assert(wantSpp.values.exists(identity) && wantSpp.values.exists(!_),
      "the selective pattern must split the corpus or this check is vacuous")
    assert(runCep("cep_spp", Seq(feed), "spp") == wantSpp,
      "live NFA must equal regex containment for the selective pattern too")
  }

  test("#173c micro-batch-split invariance: 1 batch vs 7 batches vs per-100 events") {
    val one   = runCep("cep_one", Seq(feed))
    val seven = runCep("cep_seven", feed.grouped(math.max(1, feed.size / 7 + 1)).toSeq)
    val tiny  = runCep("cep_tiny", feed.grouped(100).toSeq)
    assert(one == seven && one == tiny, "NFA state must be prefix-incremental under any batch split")
  }

  test("#173d restart continuity: second half folds onto checkpointed NFA state") { withRocksDb {
    implicit val enc = Encoders.product[TypedEvent]
    val srcDir = tmp("cepsrc")
    val ck     = tmp("cepck")
    val outDir = tmp("cepout")
    val schema = StructType(Seq(
      StructField("eventId", LongType), StructField("key", LongType),
      StructField("ts", TimestampType), StructField("eventType", StringType)))
    def writeFile(name: String, rows: Seq[TypedEvent]): Unit =
      Files.write(
        java.nio.file.Paths.get(srcDir, name),
        rows.map { e =>
          val iso = java.time.Instant.ofEpochSecond(0, CdcMaterializer.micros(e.ts) * 1000L).toString
          s"""{"eventId":${e.eventId},"key":${e.key},"ts":"$iso","eventType":"${e.eventType}"}"""
        }.mkString("\n").getBytes("UTF-8"))
    def run(): Unit = {
      val q = CepStream
        .matches(spark.readStream.schema(schema).json(srcDir).as[TypedEvent], "s[vc]*p")
        .toDF()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("batch_id", lit(id)).write.mode("append").parquet(outDir)
        }
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ck)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val (first, second) = feed.splitAt(feed.size / 2)
    writeFile("f1.json", first)
    run() // deployment 1 consumes the first half, checkpoints NFA masks
    writeFile("f2.json", second)
    run() // deployment 2 MUST continue from state, not re-derive
    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("key"), r.getAs[Boolean]("matched"),
        r.getAs[Long]("n_events")))
    val lastByKey = rows.groupBy(_._2).map { case (k, vs) => k -> vs.maxBy(_._1) }
    val live = lastByKey.map { case (k, v) => k -> v._3 }
    assert(live == batchTruth, "restarted CEP must equal batch q39 over the whole feed")
    // continuity proof: total event count per key spans BOTH deployments
    val perKeyCounts = feed.groupBy(_.key).view.mapValues(_.size.toLong).toMap
    assert(lastByKey.map { case (k, v) => k -> v._4 } == perKeyCounts,
      "n_events must accumulate across the restart (state continued, not reset)")
  }}
}
