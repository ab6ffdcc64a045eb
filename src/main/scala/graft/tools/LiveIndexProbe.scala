package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Scale probe for the live-index tier (#337/#339/#340): is the
  * incremental `updateBatch` cost a function of the BATCH, not the
  * STORE? Method: build each index store from the full corpus at two
  * scales (sf0.1 and a 10× corpus), then time the SAME fixed-size
  * update batch against both stores — if maintenance cost were
  * store-proportional, the 10× leg would run ~10× slower; the claim is
  * it stays ~flat (touched partitions ∝ batch keys).
  *
  * `runMain graft.tools.LiveIndexProbe <sfDirA> <sfDirB> [out.json]`
  * — min-of-3 per leg; one JSON artifact.
  */
object LiveIndexProbe {
  def main(args: Array[String]): Unit = {
    val dirA = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dirB = args.drop(1).headOption.getOrElse("/tmp/sf1")
    val out  = args.drop(2).headOption.getOrElse("bench/liveindex_scale.json")
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    def timeMin3(f: () => Unit): Double =
      (1 to 3).map { _ => val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9 }.min

    def annLeg(dir: String): (Long, Double, Double) = {
      val root = java.nio.file.Files.createTempDirectory("probe_ann").toString
      val emb = graft.sources.Tables.embeddings(spark, dir).select("vec_id", "embedding")
      val n = emb.count()
      val t0 = System.nanoTime()
      graft.streaming.AnnIndexView.updateBatch(
        emb.select(lit("I").as("op"), col("vec_id"), col("embedding"),
          lit(1000L).as("tsUs"), col("vec_id").as("seq")),
        root, numPlanes = 8, keyBuckets = 64)
      val build = (System.nanoTime() - t0) / 1e9
      // the probe: a FIXED 500-key update batch (bucket-moving negations),
      // fresh ts per run so every run does real work
      var ts = 2000L
      val inc = timeMin3 { () =>
        ts += 1000L
        val tsNow = ts
        graft.streaming.AnnIndexView.updateBatch(
          emb.filter(col("vec_id") < 500).select(lit("U").as("op"), col("vec_id"),
            transform(col("embedding"), x => -x * lit((tsNow % 3 + 1).toFloat)).as("embedding"),
            lit(tsNow).as("tsUs"), col("vec_id").as("seq")),
          root, numPlanes = 8, keyBuckets = 64)
      }
      (n, build, inc)
    }

    def postLeg(dir: String): (Long, Double, Double) = {
      val root = java.nio.file.Files.createTempDirectory("probe_post").toString
      val docs = graft.sources.Tables.documents(spark, dir).select("doc_id", "text")
      val n = docs.count()
      val t0 = System.nanoTime()
      graft.streaming.PostingIndexView.updateBatch(
        docs.select(lit("I").as("op"), col("doc_id"), col("text"),
          lit(1000L).as("tsUs"), col("doc_id").as("seq")), root)
      val build = (System.nanoTime() - t0) / 1e9
      var ts = 2000L
      val inc = timeMin3 { () =>
        ts += 1000L
        val tsNow = ts
        graft.streaming.PostingIndexView.updateBatch(
          docs.filter(col("doc_id") < 500).select(lit("U").as("op"), col("doc_id"),
            concat(col("text"), lit(s" probe$tsNow")).as("text"),
            lit(tsNow).as("tsUs"), col("doc_id").as("seq")), root)
      }
      (n, build, inc)
    }

    def ivfLeg(dir: String): (Long, Double, Double) = {
      val root = java.nio.file.Files.createTempDirectory("probe_ivf").toString
      val emb = graft.sources.Tables.embeddings(spark, dir).select("vec_id", "embedding")
      val n = emb.count()
      val t0 = System.nanoTime()
      graft.streaming.IvfIndexView.create(spark, root, emb, k = 16, iters = 2)
      graft.streaming.IvfIndexView.updateBatch(
        emb.select(lit("I").as("op"), col("vec_id"), col("embedding"),
          lit(1000L).as("tsUs"), col("vec_id").as("seq")),
        root, keyBuckets = 64)
      val build = (System.nanoTime() - t0) / 1e9
      var ts = 2000L
      val inc = timeMin3 { () =>
        ts += 1000L
        val tsNow = ts
        graft.streaming.IvfIndexView.updateBatch(
          emb.filter(col("vec_id") < 500).select(lit("U").as("op"), col("vec_id"),
            transform(col("embedding"), x => -x * lit((tsNow % 3 + 1).toFloat)).as("embedding"),
            lit(tsNow).as("tsUs"), col("vec_id").as("seq")),
          root, keyBuckets = 64)
      }
      (n, build, inc)
    }

    def bmLeg(dir: String): (Long, Double, Double) = {
      val root = java.nio.file.Files.createTempDirectory("probe_bm").toString
      val o = graft.sources.Tables.orders(spark, dir)
        .select(col("o_orderkey").as("key"), col("o_orderpriority").as("value"))
      val n = o.count()
      val t0 = System.nanoTime()
      graft.streaming.BitmapIndexView.updateBatch(
        o.select(lit("I").as("op"), col("key"), col("value"),
          lit(1000L).as("tsUs"), col("key").as("seq")), root)
      val build = (System.nanoTime() - t0) / 1e9
      var ts = 2000L
      val inc = timeMin3 { () =>
        ts += 1000L
        val tsNow = ts
        graft.streaming.BitmapIndexView.updateBatch(
          o.filter(col("key") < 5000).select(lit("U").as("op"), col("key"),
            concat(lit("P"), lit(tsNow % 3)).cast("string").as("value"),
            lit(tsNow).as("tsUs"), col("key").as("seq")), root)
      }
      (n, build, inc)
    }

    def pqLeg(dir: String): (Long, Double, Double) = {
      val root = java.nio.file.Files.createTempDirectory("probe_pq").toString
      val emb = graft.sources.Tables.embeddings(spark, dir).select("vec_id", "embedding")
      val n = emb.count()
      val t0 = System.nanoTime()
      graft.streaming.PqIndexView.create(spark, root, emb, m = 4, k = 16, iters = 2)
      graft.streaming.PqIndexView.updateBatch(
        emb.select(lit("I").as("op"), col("vec_id"), col("embedding"),
          lit(1000L).as("tsUs"), col("vec_id").as("seq")),
        root, m = 4, keyBuckets = 64)
      val build = (System.nanoTime() - t0) / 1e9
      var ts = 2000L
      val inc = timeMin3 { () =>
        ts += 1000L
        val tsNow = ts
        graft.streaming.PqIndexView.updateBatch(
          emb.filter(col("vec_id") < 500).select(lit("U").as("op"), col("vec_id"),
            transform(col("embedding"), x => -x * lit((tsNow % 3 + 1).toFloat)).as("embedding"),
            lit(tsNow).as("tsUs"), col("vec_id").as("seq")),
          root, m = 4, keyBuckets = 64)
      }
      (n, build, inc)
    }

    def legJson(name: String, a: (Long, Double, Double), b: (Long, Double, Double)): String =
      f"""{"index":"$name","a_rows":${a._1},"a_build_sec":${a._2}%.2f,"a_inc_sec":${a._3}%.2f,""" +
        f""""b_rows":${b._1},"b_build_sec":${b._2}%.2f,"b_inc_sec":${b._3}%.2f,""" +
        f""""inc_ratio_b_over_a":${b._3 / math.max(a._3, 1e-9)}%.2f}"""

    val lines = Seq(
      legJson("ann_lsh", annLeg(dirA), annLeg(dirB)),
      legJson("postings", postLeg(dirA), postLeg(dirB)),
      legJson("bitmap", bmLeg(dirA), bmLeg(dirB)),
      legJson("ivf", ivfLeg(dirA), ivfLeg(dirB)),
      legJson("pq", pqLeg(dirA), pqLeg(dirB)))
    val json = s"""{"metric":"liveindex_scale","a":"$dirA","b":"$dirB","legs":[${lines.mkString(",")}]}"""
    println(json)
    val p = java.nio.file.Paths.get(out)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
