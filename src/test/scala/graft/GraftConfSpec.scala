package graft

import org.apache.spark.sql.functions._

/** The `spark.graft.*` settings seam: defaults are byte-identical to the
  * pre-seam constants (the oracle gate runs with nothing set), overrides
  * flow into the registered queries, and bad values fail eagerly with the
  * offending key named. */
class GraftConfSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def withConf[A](kv: (String, String)*)(body: => A): A = {
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally kv.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("unset conf returns the call-site default") {
    assert(GraftConf.int(spark, GraftConf.KnnK, 5) == 5)
    assert(GraftConf.int(spark, GraftConf.KnnNProbe, 4) == 4)
    assert(GraftConf.fraction(spark, GraftConf.SemdedupThreshold, 0.35) == 0.35)
  }

  test("set conf overrides the default, with surrounding whitespace tolerated") {
    withConf("spark.graft.knn.k" -> " 3 ") {
      assert(GraftConf.int(spark, GraftConf.KnnK, 5) == 3)
    }
    assert(GraftConf.int(spark, GraftConf.KnnK, 5) == 5)
  }

  test("non-numeric and below-minimum values fail eagerly, naming the key") {
    withConf("spark.graft.knn.k" -> "five") {
      val e = intercept[IllegalArgumentException](
        GraftConf.int(spark, GraftConf.KnnK, 5))
      assert(e.getMessage.contains("spark.graft.knn.k"))
    }
    withConf("spark.graft.knn.nprobe" -> "0") {
      val e = intercept[IllegalArgumentException](
        GraftConf.int(spark, GraftConf.KnnNProbe, 4))
      assert(e.getMessage.contains("spark.graft.knn.nprobe"))
    }
    withConf("spark.graft.semdedup.threshold" -> "1.5") {
      val e = intercept[IllegalArgumentException](
        GraftConf.fraction(spark, GraftConf.SemdedupThreshold, 0.35))
      assert(e.getMessage.contains("spark.graft.semdedup.threshold"))
    }
  }

  test("knn.k retunes the registered graph query without editing it") {
    val dflt = SparkEntry.queries("g_knn_graph")(spark, sfDir)
    assert(dflt.agg(max(col("rank"))).head().getInt(0) == 5)
    withConf("spark.graft.knn.k" -> "3") {
      val tuned = SparkEntry.queries("g_knn_graph")(spark, sfDir)
      assert(tuned.agg(max(col("rank"))).head().getInt(0) == 3)
      // rank<=3 of the same candidate ordering: the tuned graph is a
      // prefix of the default one
      val dflt3 = dflt.filter(col("rank") <= 3)
      assert(tuned.exceptAll(dflt3).isEmpty && dflt3.exceptAll(tuned).isEmpty)
    }
  }

  test("ivf.cells retunes routing while the oracle arm stays probe-all") {
    // At an oracle SF the probe count follows the tuned cell count
    // (probe-all stays probe-all), so the graph still equals the
    // brute-force truth — the losslessness contract is cell-count-proof.
    val dflt = SparkEntry.queries("g_knn_graph")(spark, sfDir)
    withConf("spark.graft.ivf.cells" -> "8") {
      val tuned = SparkEntry.queries("g_knn_graph")(spark, sfDir)
      assert(tuned.exceptAll(dflt).isEmpty && dflt.exceptAll(tuned).isEmpty)
    }
  }

  test("retrieval knobs retune the lexical family without editing queries") {
    // retrieval.k cuts the BM25 shortlist
    assert(SparkEntry.queries("g_bm25")(spark, sfDir).count() == 10L)
    withConf("spark.graft.retrieval.k" -> "3") {
      assert(SparkEntry.queries("g_bm25")(spark, sfDir).count() == 3L)
    }
    // bm25.b = 0 switches length normalization off: scores change but the
    // match set (docs with >= 1 query term) does not
    val dflt = SparkEntry.queries("g_bm25")(spark, sfDir)
      .select("doc_id", "bm25").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    withConf("spark.graft.bm25.b" -> "0") {
      val flat = SparkEntry.queries("g_bm25")(spark, sfDir)
        .select("doc_id", "bm25").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(flat.values.toSet != dflt.values.toSet)
    }
    // postings.npt re-fans the index directories; results are unchanged
    withConf("spark.graft.postings.npt" -> "4") {
      val rows = SparkEntry.queries("g_bm25_indexed")(spark, sfDir)
        .collect().map(_.toString).toSeq
      val base = SparkEntry.queries("g_bm25")(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(rows == base)
    }
  }

  test("the three shared-oracle BM25 rows agree under non-default knobs") {
    // g_bm25, g_bm25_indexed and q_stream_postings share one oracle hash,
    // so every scorer knob must thread into all three — a row that drops
    // k1/b would diverge only when a user tunes them (the silent kind of
    // drift the oracle gate can't see, since it runs at defaults).
    withConf("spark.graft.bm25.k1" -> "0.75", "spark.graft.bm25.b" -> "0.25",
        "spark.graft.retrieval.k" -> "6") {
      val scan = SparkEntry.queries("g_bm25")(spark, sfDir)
        .collect().map(_.toString).toSeq
      val indexed = SparkEntry.queries("g_bm25_indexed")(spark, sfDir)
        .collect().map(_.toString).toSeq
      val streamed = SparkEntry.queries("q_stream_postings")(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(indexed == scan)
      assert(streamed == scan)
    }
  }

  test("kn.mincount retunes the vocabulary cut on both KN rows") {
    // the fixture has no natural singletons (rarest even-half token
    // count: 18, then a cluster in the 440s), and mapping exactly ONE
    // type to <unk> is a pure relabeling that leaves every probability
    // identical — the cut must MERGE several types to move scores, so
    // test at 460 (≈6 types fold into <unk>); the two shared-oracle rows
    // must keep agreeing with each other at ANY knob value
    val dflt = SparkEntry.queries("g_kn_score")(spark, sfDir)
      .collect().map(_.toString).toSeq
    withConf("spark.graft.kn.mincount" -> "460") {
      val wide = SparkEntry.queries("g_kn_score")(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(wide != dflt)
      val streamed = SparkEntry.queries("q_stream_kn")(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(streamed == wide)
      // the trigram pair shares the knob and must agree the same way
      val wide3 = SparkEntry.queries("g_kn3_score")(spark, sfDir)
        .collect().map(_.toString).toSeq
      val streamed3 = SparkEntry.queries("q_stream_kn3")(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(streamed3 == wide3)
    }
  }

  test("logit.steps retunes the descent on both shared-oracle rows") {
    val dflt = SparkEntry.queries("g_logit_train")(spark, sfDir)
      .collect().map(_.toString).toSeq
    withConf("spark.graft.logit.steps" -> "1") {
      val short = SparkEntry.queries("g_logit_train")(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(short != dflt) // fewer steps = different weights = different logits
      val streamed = SparkEntry.queries("q_stream_logit")(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(streamed == short)
    }
  }

  test("phash knobs retune the video-dedup family; writer/probe stay signed") {
    // phash.k cuts sampled frames per media: pair rows can only shrink,
    // and the media rollup follows
    val dflt = SparkEntry.queries("g_frame_phash")(spark, sfDir).count()
    withConf("spark.graft.phash.k" -> "2") {
      assert(SparkEntry.queries("g_frame_phash")(spark, sfDir).count() <= dflt)
    }
    // phash.maxdist = 0 keeps only exact-hash pairs — a subset of dist<=3
    val dflt3 = SparkEntry.queries("g_frame_phash")(spark, sfDir)
    withConf("spark.graft.phash.maxdist" -> "0") {
      val exact = SparkEntry.queries("g_frame_phash")(spark, sfDir)
      assert(exact.exceptAll(dflt3).isEmpty)
    }
    // the losslessness ceiling is NOT tunable past the pigeonhole bound
    withConf("spark.graft.phash.maxdist" -> "7") {
      val e = intercept[IllegalArgumentException](
        SparkEntry.queries("g_frame_phash")(spark, sfDir).collect())
      assert(e.getMessage.contains("pigeonhole"))
    }
    // the indexed row writes AND probes under one tuned (fps, k,
    // nBuckets), so the _meta.json signing stays consistent and the
    // verdicts still match the in-DAG face at the same parameters
    val dfltIndexed = SparkEntry.queries("g_phash_indexed")(spark, sfDir).count()
    withConf("spark.graft.phash.k" -> "4", "spark.graft.phash.nbuckets" -> "8") {
      // fewer sampled frames can only lose candidate pairs — and the
      // probe signs against the index it just wrote, so no meta refusal
      assert(SparkEntry.queries("g_phash_indexed")(spark, sfDir).count()
        <= dfltIndexed)
    }
  }

  test("semdedup.threshold flows into the drop rule") {
    // threshold 1.0: nothing clears a >= 1.0 floored-cosine bar against a
    // DISTINCT earlier neighbor unless vectors coincide; kept-count can
    // only rise vs the 0.35 default
    val dflt = SparkEntry.queries("g_semdedup_knn")(spark, sfDir)
      .filter(col("kept")).count()
    withConf("spark.graft.semdedup.threshold" -> "1.0") {
      val kept = SparkEntry.queries("g_semdedup_knn")(spark, sfDir)
        .filter(col("kept")).count()
      assert(kept >= dflt)
    }
  }
}
