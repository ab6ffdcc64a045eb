package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingDataSpec extends SparkSpec {

  test("q42 split is a total, deterministic partition of the corpus") {
    val rows  = TrainingData.trainTestSplit(spark, sf).collect()
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length == total, "every doc gets a split")
    val again = TrainingData.trainTestSplit(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toMap ==
      again.map(r => (r.getLong(0), r.getString(2))).toMap, "membership must be stable across runs")
    val evalFrac = rows.count(_.getString(2) == "eval").toDouble / rows.length
    assert(evalFrac > 0.02 && evalFrac < 0.3, s"~10% eval expected, got $evalFrac")
  }

  test("q43 packs are contiguous per source and respect the budget boundary") {
    val rows = TrainingData.sequencePacking(spark, sf, budget = 2048).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"), r.getAs[Long]("pack_id")))
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._2)
      // pack ids never decrease in fill order, and each pack STARTS below
      // the budget (a doc may straddle the boundary; the next one opens a
      // new pack)
      assert(ordered.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      var cum = 0L
      ordered.foreach { case (_, _, tok, pack) =>
        assert(pack == cum / 2048, "pack id must be exclusive-prefix-sum div budget")
        cum += tok
      }
    }
  }

  test("q44 contamination flags the planted near-dup partners of benchmark docs") {
    val hits = TrainingData.contamination(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ratio")).toMap
    // every d03 near-dup pair with one side in the benchmark (doc_id < 50)
    // must surface its training-side partner with substantial overlap
    val planted = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .collect { case (a, b) if a < 50 && b >= 50 => b }
    assert(planted.nonEmpty, "corpus should plant at least one cross-split near-dup")
    planted.foreach { b =>
      assert(hits.get(b).exists(_ > 0.3), s"near-dup of a benchmark doc must be flagged: $b -> ${hits.get(b)}")
    }
    assert(hits.values.forall(r => r > 0.0 && r <= 1.0))
  }

  test("pii redaction scrubs emails/phones/ssns and counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact me at jane.doe+x@corp.example.com or +1 (555) 123-4567 ok"),
      (2L, "ssn 123-45-6789 inline"),
      (3L, "nothing sensitive here"),
    ).toDF("doc_id", "text")
    val out = TrainingData.redactPii(df).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("redacted").contains("<email>"))
    assert(out(1L).getAs[String]("redacted").contains("<phone>"))
    assert(!out(1L).getAs[String]("redacted").contains("jane.doe"))
    assert(out(1L).getAs[Long]("n_email") == 1L && out(1L).getAs[Long]("n_phone") == 1L)
    assert(out(2L).getAs[String]("redacted") == "ssn <ssn> inline" && out(2L).getAs[Long]("n_ssn") == 1L)
    assert(out(3L).getAs[String]("redacted") == "nothing sensitive here")
    assert(out(3L).getAs[Long]("n_email") + out(3L).getAs[Long]("n_phone") + out(3L).getAs[Long]("n_ssn") == 0L)
  }

  test("q46 bucketed range join matches a brute-force inequality join") {
    val fast = TrainingData.errorBlastRadius(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_after")).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val slow = ev.filter(col("event_type") === "error").as("p")
      .join(ev.as("e"),
        col("e.us") > col("p.us") && col("e.us") <= col("p.us") + 300000000L, "left")
      .groupBy(col("p.event_id")).agg(count(col("e.event_id")).as("n"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n")).toMap
    assert(fast == slow, "bucketed candidate generation must be lossless")
  }

  test("q74 deciles: band decomposition equals the single-window rank; sizes balanced; partitioned plan") {
    val got = TrainingData.qualityDeciles(spark, sf)
    val p   = got.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"decile assignment must not funnel through one partition:\n$p")
    assert("windowspecdefinition\\(band".r.findAllIn(p).nonEmpty,
      s"within-band rank window must be partitioned by the score band:\n$p")
    val rows = got.collect()
    val n    = rows.length
    // exact-rank deciles split n as evenly as arithmetic allows
    val sizes = rows.groupBy(_.getAs[Long]("decile")).view.mapValues(_.length).toMap
    assert(sizes.keySet == (1L to 10L).toSet, s"missing deciles: ${sizes.keySet}")
    assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced deciles: $sizes")
    // the banded decomposition must equal ONE global rank: reference
    // ranked driver-side (sf0.001 fits trivially) — a global Window here
    // would log the WindowExec no-partition warning the driver queries
    // are asserted never to produce, masking a real one
    val ref = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        round(length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") / length(col("text")), 4)
          .as("score"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .sortBy { case (id, sc) => (-sc, id) }
      .zipWithIndex
      .map { case ((id, _), i) => id -> (i.toLong * 10 / n + 1) }.toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("decile") == ref(id), s"doc $id decile diverged from global rank")
    }
  }

  test("q86 shard ids: seq is the exact global curriculum rank; shards balanced; partitioned plan") {
    val got = TrainingData.globalShardIds(spark, sf)
    val p   = got.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"global id assignment must not funnel through one partition:\n$p")
    assert("windowspecdefinition\\(band".r.findAllIn(p).nonEmpty,
      s"within-band rank window must be partitioned by the length band:\n$p")
    val rows = got.collect()
    val n    = rows.length.toLong
    // seq is a permutation of 0..n-1
    assert(rows.map(_.getAs[Long]("seq")).sorted.toSeq == (0L until n), "seq must be a permutation")
    // seq order IS (n_chars desc, doc_id) order
    val bySeq = rows.sortBy(_.getAs[Long]("seq"))
      .map(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
    assert(bySeq.sameElements(bySeq.sortBy { case (c, id) => (-c, id) }),
      "seq must follow the longest-first curriculum order")
    // round-robin shards: sizes differ by at most 1, every shard present
    val sizes = rows.groupBy(_.getAs[Long]("shard")).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced shards: $sizes")
  }

  test("q74 deciles: NULL scores (empty/NULL text) band as NULL and drop; range raise still fires") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target").toAbsolutePath, "docs_nullscore").toString
    Seq(
      (1L, "alpha beta gamma", "en", "web", 16L),
      (2L, "", "en", "web", 0L),                    // len 0 → x/0 → NULL score
      (3L, null.asInstanceOf[String], "en", "web", 0L), // NULL text → NULL score
      (4L, "delta!! 123", "en", "web", 11L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // NULL is not out-of-range: the query must complete, NULL-score docs
    // dropping at the band join rather than killing the query with a
    // NULL-message raise_error
    val got = TrainingData.qualityDeciles(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("decile"))).toMap
    assert(got.keySet == Set(1L, 4L), s"NULL-score docs must drop, scored docs must rank: $got")
    // decile arithmetic runs over the LIVE count (n=2), not the raw
    // corpus count (n=4): ranks 1,2 of 2 → deciles 1 and 6
    assert(got.values.toSet == Set(1L, 6L), s"n must exclude unscorable docs: $got")
  }

  test("q75 chunking: full coverage with exact overlap — reassembly reproduces every token stream") {
    val width = 64; val stride = 48
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    val byDoc = TrainingData.chunkOverlap(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_text")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc.keySet == toks.keySet, "every document must produce chunks")
    byDoc.foreach { case (id, chunks) =>
      val n = toks(id).length
      val expected = if (n <= width) 1 else (n - width + stride - 1) / stride + 1
      assert(chunks.length == expected, s"doc $id: ${chunks.length} chunks, expected $expected")
      chunks.zipWithIndex.foreach { case ((_, cid, nt, _), i) =>
        assert(cid == i, s"doc $id chunk ids must be dense")
        assert(nt <= width && (i == chunks.length - 1 || nt == width),
          s"doc $id chunk $i: only the final chunk may be partial ($nt tokens)")
      }
      // drop each successor's (width - stride)-token overlap: the splice
      // must reproduce the original token stream exactly — nothing lost
      // at chunk boundaries, nothing duplicated
      val rebuilt = chunks.head._4.split(" ").toSeq ++
        chunks.tail.flatMap(_._4.split(" ").toSeq.drop(width - stride))
      assert(rebuilt == toks(id), s"doc $id: chunk reassembly diverged from the token stream")
    }
  }

  test("q79 curation: kept and dropped partition the corpus — every drop has a provable gate reason") {
    val kept = TrainingData.curationPipeline(spark, sf).collect()
    assert(kept.nonEmpty)
    assert(kept.forall(_.getAs[Double]("alpha_ratio") >= 0.81), "quality gate leaked")
    val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
    assert(keptIds.forall(_ >= 50L), "benchmark holdout leaked into the corpus")
    val docs = graft.sources.Tables.documents(spark, sf)
    val losers = docs.groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("keeper"))
      .join(docs.select(md5(col("text")).as("h"), col("doc_id")), Seq("h"))
      .filter(col("doc_id") =!= col("keeper"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val contaminated = TrainingData.contamination(spark, sf)
      .filter(col("ratio") >= 0.5).collect().map(_.getAs[Long]("doc_id")).toSet
    val lowQuality = docs
      .select(col("doc_id"),
        round(length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") / length(col("text")), 4)
          .as("a"))
      .filter(col("a") < 0.81).collect().map(_.getAs[Long]("doc_id")).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = allIds.filter(id => id >= 50L && !losers(id) && !contaminated(id) && !lowQuality(id))
    assert(keptIds == expected,
      s"kept set diverged: missing=${(expected -- keptIds).take(5)} extra=${(keptIds -- expected).take(5)}")
  }

  test("q48/q49 sampling is stratified and deterministic") {
    val strat = TrainingData.stratifiedSample(spark, sf).collect()
    val perLang = strat.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ <= 25))
    val mix = TrainingData.mixtureSample(spark, sf).collect()
    val langs = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val kept = mix.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    // under-represented strata keep everything (rate >= 1)
    langs.filter { case (_, c) => c.toDouble / langs.values.sum <= 0.2 }.keys.foreach { l =>
      assert(kept.getOrElse(l, 0) == langs(l), s"stratum $l at/below target must keep all docs")
    }
    // over-represented strata thin toward target (within hash noise)
    langs.filter { case (_, c) => c.toDouble / langs.values.sum > 0.25 }.keys.foreach { l =>
      assert(kept.getOrElse(l, 0) < langs(l), s"over-represented stratum $l must thin")
    }
  }

  test("q94 mixture weights: integer micro-unit replay; temperature flattens the distribution; invariants hold") {
    val got = TrainingData.mixtureWeights(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("tokens"),
        r.getAs[Long]("share_ppm"), r.getAs[Long]("weight_ppm"), r.getAs[Long]("epochs_ppm"))).toMap
    // independent replay: whitespace token counts per source, then the
    // exact integer pipeline with BigInt arithmetic
    val toks = graft.sources.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+").length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val rs = toks.view.mapValues(t => math.floor(math.sqrt(t.toDouble) * 1e6).toLong).toMap
    val (totalTok, totalR) = (BigInt(toks.values.sum), BigInt(rs.values.sum))
    assert(got.keySet == toks.keySet)
    got.foreach { case (s, (tok, share, w, ep)) =>
      assert(tok == toks(s), s"$s tokens")
      assert(share == (BigInt(tok) * 1000000 / totalTok).toLong, s"$s share")
      assert(w == (BigInt(rs(s)) * 1000000 / totalR).toLong, s"$s weight")
      assert(ep == (BigInt(w) * totalTok / BigInt(tok)).toLong, s"$s epochs")
    }
    // α = 0.5 flattens: every below-uniform source is upweighted, every
    // above-uniform source downweighted (sqrt crosses the mean once)
    got.values.foreach { case (_, share, w, _) =>
      if (share * got.size < 1000000L) assert(w >= share, s"small source must upweight: $got")
      else assert(w <= share, s"large source must downweight: $got")
    }
    // weights are a (floor-truncated) distribution
    val wSum = got.values.map(_._3).sum
    assert(wSum <= 1000000L && wSum > 1000000L - got.size, s"weight_ppm sum: $wSum")
  }
}
