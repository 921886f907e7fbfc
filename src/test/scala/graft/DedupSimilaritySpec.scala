package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, MultimodalOps, SimilarityOps}

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  def docsDf() = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog", 43L),
    (2L, "en", "the quick brown fox jumps over the lazy dog", 43L),   // exact dup of 1
    (3L, "en", "the quick brown fox leaps over the lazy dog", 43L),   // near dup of 1
    (4L, "en", "completely different content about spark engines", 48L),
    (5L, "de", "der schnelle braune fuchs springt ueber den hund", 48L),
  ).toDF("doc_id", "lang", "text", "n_chars")

  test("CDC chunking is shift-resistant where fixed-stride chunking is not") {
    // doc 2 = a 3-token junk prefix + doc 1's text verbatim. CDC
    // boundaries depend only on local windows, so once past the prefix
    // the two docs chunk identically; fixed-stride frames are all offset
    // by 3 and share (almost) nothing.
    val base = (0 until 64).map(i => s"tok${(i * 7) % 23}x$i").mkString(" ")
    val docs = Seq((1L, base), (2L, s"junkA junkB junkC $base")).toDF("doc_id", "text")
    def shared(chunks: org.apache.spark.sql.DataFrame, textCol: String): Long = {
      val c1 = chunks.filter(col("doc_id") === 1).select(col(textCol)).distinct()
      val c2 = chunks.filter(col("doc_id") === 2).select(col(textCol)).distinct()
      c1.intersect(c2).count()
    }
    val cdc = DedupOps.cdcChunks(docs, w = 3, divisor = 4)
    val cdcShared = shared(cdc, "chunk_text")
    val cdcTotal = cdc.filter(col("doc_id") === 1).count()
    val stride = graft.operators.TextOps.chunkTokens(docs, 8, 8)
    val strideShared = shared(stride, "chunk_text")
    assert(cdcTotal >= 3, s"fixture too small to be meaningful: $cdcTotal chunks")
    assert(cdcShared * 2 >= cdcTotal,
      s"CDC must re-find most chunks after a prefix shift ($cdcShared of $cdcTotal)")
    assert(strideShared == 0,
      s"stride chunks should all be offset by the prefix, got $strideShared shared")
    assert(cdcShared > strideShared)
  }

  test("CDC-dedup composition: paragraphDedup over cdcChunks drops the shifted duplicate's chunks") {
    val base = (0 until 64).map(i => s"tok${(i * 7) % 23}x$i").mkString(" ")
    val docs = Seq((1L, base), (2L, s"junkA junkB junkC $base")).toDF("doc_id", "text")
    val out = DedupOps.paragraphDedup(
        DedupOps.cdcChunks(docs, w = 3, divisor = 4),
        idxCol = "chunk_idx", paraCol = "chunk_text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))).toMap
    assert(out(1L)._2 == 0, "the first document keeps everything")
    assert(out(2L)._2 > 0, "the shifted duplicate must lose its re-found chunks")
  }

  test("byte-CDC on binary payloads: shift resistance and dup counting on real bytes") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    // payload 2 = 7 junk bytes + payload 1 verbatim (non-UTF8 bytes included)
    val base = Array.tabulate(300)(i => ((i * 73 + 19) % 256).toByte)
    val shifted = Array[Byte](-1, 0, 77, -128, 5, 9, 33) ++ base
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, base),
        org.apache.spark.sql.Row(2L, shifted)),
      StructType(Seq(StructField("media_id", LongType), StructField("content", BinaryType))))
    val chunks = MultimodalOps.cdcByteChunks(media, w = 5, divisor = 4)
    val byDoc = chunks.collect().groupBy(_.getAs[Long]("media_id"))
      .view.mapValues(_.map(_.getAs[Array[Byte]]("chunk_bytes").toSeq).toSet).toMap
    val sharedFrac = byDoc(1L).intersect(byDoc(2L)).size.toDouble / byDoc(1L).size
    assert(byDoc(1L).size >= 4, s"fixture too small: ${byDoc(1L).size} chunks")
    assert(sharedFrac >= 0.5,
      s"byte-CDC must re-find most chunks after a 7-byte prefix shift ($sharedFrac)")
    // chunks reassemble the payload exactly (no byte lost or reordered)
    val rebuilt = chunks.filter(col("media_id") === 2)
      .orderBy("chunk_idx").collect().flatMap(_.getAs[Array[Byte]]("chunk_bytes"))
    assert(rebuilt.toSeq == shifted.toSeq, "chunks must partition the payload")
    // dup stats see the shared chunks (hashed mode == content mode)
    val stats = MultimodalOps.cdcByteStats(media, w = 5, divisor = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats(1L)._2 > 0 && stats(2L)._2 > 0)
    val hashed = MultimodalOps.cdcByteStats(media, w = 5, divisor = 4, hashed = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hashed == stats, "hashed occurrence keys must not change the counts")
  }

  test("chunk store: duplicated payloads share storage; round trip is byte-exact") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val base = Array.tabulate(400)(i => ((i * 73 + 19) % 256).toByte)
    val rows: Seq[org.apache.spark.sql.Row] = Seq(
      org.apache.spark.sql.Row(1L, base),
      org.apache.spark.sql.Row(2L, Array[Byte](9, -3, 0) ++ base), // prefixed dup
      org.apache.spark.sql.Row(3L, base.map(b => (b ^ 0x55).toByte))) // unrelated
    val media = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      StructType(Seq(StructField("media_id", LongType), StructField("content", BinaryType))))
    val path = s"${tmpDir()}/store"
    MultimodalOps.writeChunkStore(media, path, w = 5, divisor = 4)
    // storage dedup: distinct chunk bytes < total chunk references
    val nRefs = spark.read.parquet(s"$path/recipes").count()
    val nStored = spark.read.parquet(s"$path/chunks").count()
    assert(nStored < nRefs, s"no dedup: $nStored stored vs $nRefs refs")
    val storedBytes = spark.read.parquet(s"$path/chunks")
      .agg(sum(octet_length(col("chunk_bytes")))).head().getLong(0)
    val rawBytes = rows.map(_.getAs[Array[Byte]](1).length.toLong).sum
    assert(storedBytes < rawBytes,
      s"store must be smaller than the raw corpus: $storedBytes vs $rawBytes")
    // byte-exact reassembly of every payload, including the non-UTF8 ones
    val back = MultimodalOps.readChunkStore(spark, path)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    rows.foreach { r =>
      assert(back(r.getLong(0)) == r.getAs[Array[Byte]](1).toSeq,
        s"payload ${r.getLong(0)} did not round-trip")
    }
  }

  test("chunk store lifecycle: incremental append dedups against the store; GC keeps shared chunks") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    def mediaOf(rows: Seq[(Long, Array[Byte])]) = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        rows.map { case (i, b) => org.apache.spark.sql.Row(i, b) }).asJava,
      StructType(Seq(StructField("media_id", LongType), StructField("content", BinaryType))))
    val base = Array.tabulate(400)(i => ((i * 73 + 19) % 256).toByte)
    val other = base.map(b => (b ^ 0x55).toByte)
    val path = s"${tmpDir()}/store"
    MultimodalOps.writeChunkStore(mediaOf(Seq(1L -> base)), path, w = 5, divisor = 4)
    val storedAfterBase = spark.read.parquet(s"$path/chunks").count()

    // incremental append: a prefixed dup of payload 1 plus novel content
    MultimodalOps.appendToChunkStore(
      mediaOf(Seq(2L -> (Array[Byte](9, -3, 0) ++ base), 3L -> other)),
      path, w = 5, divisor = 4)
    val storedAfterAppend = spark.read.parquet(s"$path/chunks").count()
    val refs = spark.read.parquet(s"$path/recipes").count()
    // the store never holds duplicate addresses, and the dup payload
    // contributed far fewer novel chunks than references
    assert(spark.read.parquet(s"$path/chunks").select("addr").distinct().count()
      == storedAfterAppend)
    assert(storedAfterAppend < refs)
    assert(storedAfterAppend > storedAfterBase, "novel content must land")
    def readBack() = MultimodalOps.readChunkStore(spark, path)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val all = readBack()
    assert(all(2L) == (Array[Byte](9, -3, 0) ++ base).toSeq && all(3L) == other.toSeq)

    // GC: deleting payload 2 keeps every chunk payload 1 still references
    import spark.implicits._
    MultimodalOps.deleteFromChunkStore(spark, path, Seq(2L).toDF("media_id"))
    val after = readBack()
    assert(!after.contains(2L) && after(1L) == base.toSeq && after(3L) == other.toSeq)
    // orphan vacuum: a dangling chunk row is reclaimed by a no-delete rerun
    val orphan = mediaOf(Seq(9L -> Array.tabulate(40)(i => (i * 7).toByte)))
    graft.operators.MultimodalOps.cdcByteChunks(orphan, w = 5, divisor = 4)
      .withColumn("addr", sha2(col("chunk_bytes"), 256))
      .select(col("addr"), col("chunk_bytes"))
      .write.mode("append").parquet(s"$path/chunks")
    val withOrphans = spark.read.parquet(s"$path/chunks").count()
    MultimodalOps.deleteFromChunkStore(spark, path, spark.emptyDataFrame
      .withColumn("media_id", lit(null).cast("long")))
    assert(spark.read.parquet(s"$path/chunks").count() < withOrphans)
    assert(readBack() == after, "vacuum must not disturb live payloads")
  }

  test("exact dedup groups identical texts and keeps min id") {
    val got = DedupOps.exact(docsDf()).orderBy("keep_id")
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"))).toSeq
    assert(got == Seq((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("minhash LSH surfaces the exact pair as a candidate with jaccard 1.0") {
    val got = DedupOps.minHashNearDups(docsDf(), threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("jaccard")))
    assert(got.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
  }

  test("incremental minhash: increment docs match corpus dups, corpus never pairs with itself") {
    // increment = {2, 3}; corpus = {1, 4, 5}. 2 is an exact copy of corpus
    // doc 1 — every band collides, guaranteed surfaced with jaccard 1.0.
    // (3 vs 1 differ in one token: shingle-jaccard 0.4, below threshold —
    // correctly absent.) The corpus-internal pair space must not appear.
    val docs = docsDf()
    val got = DedupOps.minHashNearDupsAgainst(
        docs.filter(col("doc_id").isin(2L, 3L)),
        docs.filter(col("doc_id").isin(1L, 4L, 5L)), threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("corpus_id"), r.getAs[Double]("jaccard")))
      .toSeq
    assert(got.exists { case (n, c, j) => n == 2L && c == 1L && j == 1.0 })
    assert(got.forall { case (n, c, _) => Set(2L, 3L)(n) && Set(1L, 4L, 5L)(c) })
  }

  test("persisted minhash index: indexed result == against, with partition-pruned reads") {
    val docs = docsDf()
    val inc = docs.filter(col("doc_id").isin(2L, 3L))
    val cor = docs.filter(col("doc_id").isin(1L, 4L, 5L))
    val path = s"${tmpDir()}/mhidx"
    DedupOps.writeMinHashIndex(cor, path, nBuckets = 8)
    // layout: band=*/bucket=* directories
    val bandDirs = new java.io.File(path).listFiles().filter(_.getName.startsWith("band="))
    assert(bandDirs.nonEmpty)
    assert(bandDirs.forall(_.listFiles().exists(_.getName.startsWith("bucket="))))
    val indexed = DedupOps.minHashNearDupsIndexed(inc, cor, path, nBuckets = 8, threshold = 0.5)
    val against = DedupOps.minHashNearDupsAgainst(inc, cor, threshold = 0.5)
    val gi = indexed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ga = against.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gi == ga && gi.nonEmpty)
    // point-probe access pattern: literal (band, bucket) filters are
    // directory-level partition pruning — the probe reads one directory
    val probe = spark.read.parquet(path).filter(col("band") === 0 && col("bucket") === 3)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("band") && plan.contains("bucket"),
      s"no band/bucket partition filter:\n$plan")
    val probedFiles = probe.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(probedFiles.forall(f => f.contains("band=0") && f.contains("bucket=3")))
    // the _meta sidecar pins the index's LSH parameters: probing with a
    // different banding fails loudly instead of silently missing candidates
    val e = intercept[IllegalArgumentException] {
      DedupOps.minHashNearDupsIndexed(inc, cor, path, nBuckets = 64, threshold = 0.5)
    }
    assert(e.getMessage.contains("nBuckets: index=8 probe=64"))
  }

  test("incremental exact: copy count + first corpus id, novel docs get 0/null") {
    val docs = docsDf()
    val got = DedupOps.incrementalExact(
        docs.filter(col("doc_id").isin(2L, 4L)),
        docs.filter(col("doc_id").isin(1L, 3L, 5L)))
      .orderBy("new_id")
      .collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("n_corpus_copies"),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSeq
    assert(got == Seq((2L, 1L, Some(1L)), (4L, 0L, None)))
  }

  test("bloom-prefiltered incremental exact == plain, at every sketch size") {
    val docs = docsDf()
    val inc = docs.filter(col("doc_id").isin(2L, 4L))
    val cor = docs.filter(col("doc_id").isin(1L, 3L, 5L))
    def collect(df: org.apache.spark.sql.DataFrame) = df.orderBy("new_id").collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("n_corpus_copies"),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSeq
    val want = collect(DedupOps.incrementalExact(inc, cor))
    // roomy sketch (no FPs) and a 1-slot-ish sketch (everything collides →
    // every row confirms): identical output either way — FPs only cost work
    assert(collect(DedupOps.incrementalExactBloom(inc, cor)) == want)
    assert(collect(DedupOps.incrementalExactBloom(
      inc, cor, expectedItems = 1L, fpp = 0.5)) == want)

    // duplicate ids in the increment (one corpus-matching text, one novel)
    // must collapse to one row per id, like the plain groupBy does
    import spark.implicits._
    val dupInc = Seq(
      (2L, "the quick brown fox jumps over the lazy dog"), // matches corpus 1,3? (1 exact)
      (2L, "a novel text this corpus has never seen before"),
      (4L, "completely different content about spark engines")
    ).toDF("doc_id", "text")
    val wantDup = collect(DedupOps.incrementalExact(dupInc, cor))
    assert(collect(DedupOps.incrementalExactBloom(dupInc, cor)) == wantDup)
    assert(collect(DedupOps.incrementalExactBloom(
      dupInc, cor, expectedItems = 1L, fpp = 0.5)) == wantDup)
  }

  test("corpusDigestBloom is partitioning-independent and has no false negatives") {
    val docs = docsDf()
    val cor = docs.filter(col("doc_id").isin(1L, 3L, 5L))
    val a = DedupOps.corpusDigestBloom(cor)
    val b = DedupOps.corpusDigestBloom(cor.repartition(7))
    assert(java.util.Arrays.equals(a, b), "sketch bytes differ across partitionings")
    // every corpus digest must probe true (the no-false-negative guarantee
    // the exactness argument rests on)
    graft.plans.GraftFunctions.register(spark)
    val misses = cor
      .withColumn("mc", graft.plans.GraftFunctions.bloomMightContain(
        lit(a), xxhash64(sha2(col("text"), 256))))
      .filter(!col("mc")).count()
    assert(misses == 0)
  }

  test("editDistancePairs: in-block typo pair surfaces with its true distance") {
    // docs 1/2 identical (dist 0), 1/3 one word changed (jumps->leaps,
    // 3 substitutions); doc 4 is same-band different content (past the
    // radius); doc 5 is another lang (blocked out)
    val got = DedupOps.editDistancePairs(docsDf(), blockWidth = 8, maxDist = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got == Map((1L, 2L) -> 0, (1L, 3L) -> 3, (2L, 3L) -> 3))
  }

  test("blocked exact jaccard finds exact and near dup, skips cross-lang") {
    val got = DedupOps.ngramJaccardPairs(docsDf(), blockWidth = 8, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSeq
    assert(got.contains((1L, 2L)))
    assert(got.contains((1L, 3L)) && got.contains((2L, 3L)))
    assert(!got.exists { case (a, b) => b == 5L || a == 5L })
  }

  test("simhash near-dups: identical pair at hamming 0") {
    val got = DedupOps.simHashNearDups(docsDf(), maxHamming = 0)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Int]("hamming")))
    assert(got.toSeq == Seq((1L, 2L, 0)))
  }

  def embDf() = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(-1.0f, 0.0f, 0.0f)),
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with id tiebreak") {
    val got = SimilarityOps.bruteForceTopK(embDf(), Seq(1.0, 0.0, 0.0), k = 3)
      .collect().map(r => r.getAs[Long]("vec_id")).toSeq
    assert(got == Seq(0L, 1L, 2L)) // 1.0, ~0.99, 0.0 (−1 excluded by k)
  }

  test("lsh top-k finds the query vector itself in its bucket") {
    val got = SimilarityOps.lshTopK(embDf(), Seq(1.0, 0.0, 0.0), k = 4, nPlanes = 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim")))
    assert(got.nonEmpty)
    assert(got.head._2 == 1.0) // something colinear with the query leads
  }

  test("batchTopK returns k ranked neighbors per probe") {
    val got = SimilarityOps.batchTopK(embDf(), embDf().filter(col("vec_id") === 0L), k = 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rank"))).toSeq
    assert(got == Seq((1L, 1), (2L, 2)))
  }

  test("nearDupClusters resolves transitive chains to min-id components") {
    // chain 1-2, 2-3 plus isolated pair 7-9: components {1,2,3} and {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
    val got = DedupOps.nearDupClusters(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("paragraphDedup keeps first occurrences and reassembles documents in order") {
    val paras = Seq(
      (1L, 0, "a b"), (1L, 1, "c d"),
      (2L, 0, "a b"), (2L, 1, "e f"), // first para is doc 1's, second unique
      (3L, 0, "c d"), (3L, 1, "c d")  // both dups (one cross-doc, one of itself)
    ).toDF("doc_id", "idx", "para")
    for (hashed <- Seq(false, true)) {
      val got = DedupOps.paragraphDedup(paras, hashed = hashed).collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))))
        .toMap
      assert(got == Map(
        1L -> ("a b c d", 2L, 0L),
        2L -> ("e f", 1L, 1L),
        3L -> ("", 0L, 2L)), s"hashed=$hashed")
    }
  }

  test("paragraphDedupAgainst: corpus hits and earlier increment firsts both drop") {
    val inc = Seq(
      (10L, 0, "a b"), (10L, 1, "x y"),  // "a b" exists in the corpus
      (11L, 0, "x y"), (11L, 1, "z w")   // "x y" lost to doc 10's earlier one
    ).toDF("doc_id", "idx", "para")
    val cor = Seq((1L, 0, "a b"), (1L, 1, "c d")).toDF("doc_id", "idx", "para")
    for (hashed <- Seq(false, true)) {
      val got = DedupOps.paragraphDedupAgainst(inc, cor, hashed = hashed).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))))
        .toMap
      assert(got == Map(
        10L -> ("x y", 1L, 1L),
        11L -> ("z w", 1L, 1L)), s"hashed=$hashed")
    }
  }

  test("nearDupClustersStar matches label propagation on chains and isolated pairs") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
    val got = DedupOps.nearDupClustersStar(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("nearDupClustersIncremental merges bridged clusters, carries untouched singletons") {
    import spark.implicits._
    // prior: {1,2} rooted at 1, {10,11} rooted at 10, singleton 20
    val prev = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L), (20L, 20L))
      .toDF("doc_id", "cluster_id")
    // a new pair bridges the two clusters; nothing touches 20
    val got = DedupOps.nearDupClustersIncremental(
        prev, Seq((2L, 11L)).toDF("id1", "id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 20L -> 20L))
  }

  test("nearDupClustersStar flattens a high-degree hub whose id is not the min") {
    // hub 100 connected to 1..20: one component, min = 1. A large-star
    // round attaches every larger neighbor of 100 straight to 1 — the
    // skew shape label propagation floods edge-by-edge.
    val pairs = (1L to 20L).map(i => (100L, i)).toDF("id1", "id2")
    val got = DedupOps.nearDupClustersStar(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got.keySet == ((1L to 20L).toSet + 100L))
    assert(got.values.toSet == Set(1L))
  }

  test("nearDupClustersStar collapses a 30-edge path within the default round budget") {
    // diameter 30: label propagation needs 30 rounds (> its default
    // maxIter); star rounds contract geometrically and finish inside 12
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = DedupOps.nearDupClustersStar(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == (0L to 30L).map(_ -> 0L).toMap)
  }

  test("canonicalPerCluster keeps the highest-score doc per cluster, ties to lowest id") {
    import spark.implicits._
    // cluster {1,2,3}: 2 is longest; cluster {7,9}: tie -> 7; 5 unpaired
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 20L), (5L, 99L), (7L, 4L), (9L, 4L))
      .toDF("doc_id", "n_chars")
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "cluster_id")
    val got = DedupOps.canonicalPerCluster(docs, assign).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((1L, 0L)), 2L -> ((1L, 1L)), 3L -> ((1L, 0L)),
      5L -> ((5L, 1L)), 7L -> ((7L, 1L)), 9L -> ((7L, 0L))))
  }

  test("IVF: Lloyd iterations separate orthogonal clusters; probe finds the cluster") {
    // three tight clusters around orthogonal axes
    val vecs = (0 until 30).map { i =>
      val axis = i % 3
      val base = Array(0.0f, 0.0f, 0.0f)
      base(axis) = 1.0f
      base((axis + 1) % 3) = 0.01f * (i / 3) // slight within-cluster spread
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val centroids = SimilarityOps.ivfCentroids(vecs, k = 3, nIters = 3)
    assert(centroids.length == 3)
    // assignment is a pure projection: no exchange in the plan
    val assignPlan = SimilarityOps.assignCells(
      vecs.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v")),
      centroids).queryExecution.executedPlan.toString
    assert(!assignPlan.contains("Exchange"), s"assignCells shuffles:\n$assignPlan")
    // probing with an axis-0 query returns only axis-0 cluster members in top-5
    val got = SimilarityOps.ivfTopK(vecs, centroids, Seq(1.0, 0.0, 0.0), k = 5, nProbe = 1)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(got.length == 5)
    assert(got.forall(_ % 3 == 0), s"expected axis-0 cluster, got ${got.toSeq}")
    // and matches brute force over the same metric
    val brute = SimilarityOps.bruteForceTopK(vecs, Seq(1.0, 0.0, 0.0), k = 5)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(got.toSet == brute.toSet)
  }

  test("kmeansStep: fixed-point means are bit-identical across partitionings " +
      "and equal a driver-side reference") {
    val dim = 5
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until dim).map(d => math.sin(i * 13 + d * 7).toFloat))
    }
    val cents = (1 to 3).map(c => (c, (0 until dim).map(d => math.cos(c * 3 + d).toDouble)))
    val df = vecs.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<double>").as("v"))
    def rows(parts: Int) = SimilarityOps.kmeansStep(df.repartition(parts), cents)
      .collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Int]("dim")) ->
        ((r.getAs[Double]("mean_x"), r.getAs[Long]("n_vecs")))).toMap
    val one = rows(1)
    assert(rows(7) == one, "partitioning changed the step output")
    // driver reference: same argmax (ties to smallest cid), same fixed point
    val assigned = vecs.map { case (_, v) =>
      val vd = v.map(_.toDouble)
      val best = cents.map { case (cid, c) =>
        (SimilarityOps.cosineOf(vd, c), -cid) }.max
      (-best._2, vd)
    }
    val ref = assigned.groupBy(_._1).flatMap { case (cell, vs) =>
      val n = vs.size
      (0 until dim).map { d =>
        val s = vs.map(t => math.floor(t._2(d) * 1e6).toLong).sum
        (cell, d) -> ((s.toDouble / (1e6 * n), n.toLong))
      }
    }
    assert(one == ref, "distributed step diverged from the driver reference")
  }

  test("kmeansStep omits empty cells; ivfCentroids keeps k centroids anyway") {
    val df = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1))).toDF("id", "v")
    // centroid 2 points away from both vectors -> captures nothing
    val cents = Seq((1, Seq(1.0, 0.0)), (2, Seq(-1.0, 0.0)))
    val cells = SimilarityOps.kmeansStep(df, cents).collect().map(_.getAs[Int]("cell")).toSet
    assert(cells == Set(1), s"expected only cell 1, got $cells")
  }

  test("persisted IVF index prunes to the probed cell directories") {
    val vecs = (0 until 30).map { i =>
      val axis = i % 3
      val base = Array(0.0f, 0.0f, 0.0f)
      base(axis) = 1.0f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val centroids = SimilarityOps.ivfCentroids(vecs, k = 3, nIters = 2)
    val path = s"${tmpDir()}/ivf"
    SimilarityOps.writeIvfIndex(vecs, centroids, path)
    // one directory per cell
    val cellDirs = new java.io.File(path).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.length == 3, s"expected 3 cell dirs, got ${cellDirs.toSeq}")
    val got = SimilarityOps.ivfTopKIndexed(spark, path, centroids, Seq(1.0, 0.0, 0.0),
      k = 5, nProbe = 1)
    // directory-level pruning: the scan carries a cell partition filter and
    // reads files from exactly one cell directory (mirrors the readAggregate
    // bucket-pruning spec)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no cell partition filter:\n$plan")
    val probed = SimilarityOps.probeCellsOf(centroids, Seq(1.0, 0.0, 0.0), 1)
    val files = spark.read.parquet(path)
      .filter(col("cell").isin(probed: _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f => f.contains(s"cell=${probed.head}")))
    // and the result matches the unindexed path
    val direct = SimilarityOps.ivfTopK(vecs, centroids, Seq(1.0, 0.0, 0.0), k = 5, nProbe = 1)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(got.collect().map(_.getAs[Long]("vec_id")).toSeq == direct)
  }

  test("bitextMarginIvf: probe-all == exact; reduced probes stay within co-probed candidates") {
    val dim = 6
    val emb = (0 until 24).map { i =>
      (i.toLong, (0 until dim).map(d => math.sin(i * 11 + d * 3).toFloat), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val cents = (1 to 3).map(cid =>
      (cid, (0 until dim).map(j => if ((cid * 5 + j * 3) % 2 == 0) 1.0 else -1.0)))
    val exact = SimilarityOps.bitextMargin(emb, 0, 1, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
    val probeAll = SimilarityOps.bitextMarginIvf(emb, 0, 1, cents, nProbe = 3, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(probeAll == exact, "probe-all IVF candidates must equal the cross product")
    // reduced probes: every reported pair is genuinely co-probed
    val reduced = SimilarityOps.bitextMarginIvf(emb, 0, 1, cents, nProbe = 1, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rightCell = SimilarityOps.assignCells(
        emb.filter(col("label") === 1)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v")), cents)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("cell")).toMap
    val leftVec = emb.filter(col("label") === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    reduced.foreach { case (x, y) =>
      val probed = SimilarityOps.probeCellsOf(cents, leftVec(x), 1).toSet
      assert(probed.contains(rightCell(y)),
        s"pair ($x, $y) reported but $y's cell ${rightCell(y)} was not probed")
    }
  }

  test("bitextMargin equals a driver-side reference; one best candidate per left vector") {
    val dim = 6
    val emb = (0 until 24).map { i =>
      (i.toLong, (0 until dim).map(d => math.sin(i * 11 + d * 3).toFloat), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val k = 3
    val got = SimilarityOps.bitextMargin(emb, leftLabel = 0, rightLabel = 1, k = k)
      .collect()
      .map(r => r.getAs[Long]("x_id") ->
        ((r.getAs[Long]("y_id"), r.getAs[Double]("margin")))).toMap
    // driver reference: identical fixed-point formula
    val xs = (0 until 24).filter(_ % 2 == 0).map(i =>
      i.toLong -> (0 until dim).map(d => math.sin(i * 11 + d * 3).toFloat.toDouble))
    val ys = (0 until 24).filter(_ % 2 == 1).map(i =>
      i.toLong -> (0 until dim).map(d => math.sin(i * 11 + d * 3).toFloat.toDouble))
    val s = (for ((xi, xv) <- xs; (yi, yv) <- ys)
      yield (xi, yi) -> math.floor(SimilarityOps.cosineOf(xv, yv) * 1e4).toLong).toMap
    def topSum(items: Seq[(Long, Long)]): (Long, Long) = { // (sum, n) of top-k (s desc, id)
      val top = items.sortBy { case (id, sv) => (-sv, id) }.take(k)
      (top.map(_._2).sum, top.size.toLong)
    }
    val fwd = xs.map { case (xi, _) => xi -> topSum(ys.map { case (yi, _) => (yi, s((xi, yi))) }) }.toMap
    val bwd = ys.map { case (yi, _) => yi -> topSum(xs.map { case (xi, _) => (xi, s((xi, yi))) }) }.toMap
    val ref = xs.map { case (xi, _) =>
      val cands = ys.map { case (yi, _) =>
        val (f, nf) = fwd(xi); val (b, nb) = bwd(yi)
        val m = math.floor((2.0 * s((xi, yi))) / (f.toDouble / nf + b.toDouble / nb) * 1e4) / 1e4
        (yi, m)
      }
      val best = cands.minBy { case (yi, m) => (-m, yi) }
      xi -> best
    }.toMap
    assert(got == ref, s"margin mining diverged from reference")
    assert(got.keySet == xs.map(_._1).toSet)
  }

  test("multi-probe LSH widens the candidate set to full recall") {
    // with maxProbeFlips = nPlanes every bucket is probed: exact top-k
    val got = SimilarityOps.lshTopK(embDf(), Seq(1.0, 0.0, 0.0), k = 3,
      nPlanes = 2, maxProbeFlips = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val brute = SimilarityOps.bruteForceTopK(embDf(), Seq(1.0, 0.0, 0.0), k = 3)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(got == brute)
    // driver-side bucket arithmetic agrees with the distributed expression
    val qb = SimilarityOps.rhpBucketOf(Seq(1.0, 0.0, 0.0), 4)
    val sparkQb = spark.range(1)
      .select(graft.functions.VectorFns.rhpBucket(
        array(lit(1.0), lit(0.0), lit(0.0)), 4))
      .head.getInt(0)
    assert(qb == sparkQb, s"driver bucket $qb != spark bucket $sparkQb")
  }

  test("reliable-checkpoint path produces identical results to localCheckpoint") {
    // the cluster escape hatch (Checkpoints.pin(_, reliable = true)) writes
    // recoverable checkpoints instead of lineage-free local blocks — same
    // results, different fault story
    spark.sparkContext.setCheckpointDir(s"${tmpDir()}/ckpt")
    def pairs(reliable: Boolean) =
      DedupOps.minHashNearDups(docsDf(), threshold = 0.5, reliable = reliable)
        .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(pairs(reliable = true) == pairs(reliable = false))
    def clusters(reliable: Boolean) =
      DedupOps.nearDupClusters(
          Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2"), reliable = reliable)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(reliable = true) == clusters(reliable = false))
  }

  test("decodeStub emits deterministic byte features at the mapPartitions seam") {
    val media = MultimodalOps.mediaFromDocuments(docsDf())
    val f1 = MultimodalOps.decodeStub(media).orderBy("media_id").collect()
    val f2 = MultimodalOps.decodeStub(media).orderBy("media_id").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    assert(f1.length == 5)
    val r = f1.head
    assert(r.getAs[Int]("byte_len") == 43)
    assert(r.getAs[Double]("mean_byte") > 0)
  }

  test("resizeStub truncates or zero-pads blobs to the target size") {
    val media = MultimodalOps.mediaFromDocuments(docsDf())
    val out = MultimodalOps.resizeStub(media, targetBytes = 16).collect()
    assert(out.forall(_.getAs[Array[Byte]]("content_resized").length == 16))
    val r1 = out.find(_.getAs[Long]("media_id") == 1L).get
    assert(new String(r1.getAs[Array[Byte]]("content_resized")) == "the quick brown ")
  }

  test("frameSampleManifest: midpoint strata, bounds, slice digests") {
    val media = MultimodalOps.mediaFromDocuments(docsDf())
    val got = MultimodalOps.frameSampleManifest(media, frameBytes = 4, fps = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSeq.sorted
    // independent reference over the fake media (utf-8 of text)
    val texts = docsDf().select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ref = (for ((id, t) <- texts.toSeq) yield {
      val nf = t.getBytes("UTF-8").length / 4
      val kk = math.min(3L, nf.toLong)
      (0L until kk).map { i =>
        val idx = (2 * i + 1) * nf / (2 * kk)
        val slice = t.getBytes("UTF-8").slice((idx * 4).toInt, (idx * 4).toInt + 4)
        val dig = java.security.MessageDigest.getInstance("MD5").digest(slice)
          .map("%02x".format(_)).mkString
        (id, i, idx, idx * 4, idx * 1000 / 2, dig)
      }
    }).flatten.sorted
    assert(got == ref)
    // strictly increasing frame indices within a media row, all in bounds
    got.groupBy(_._1).values.foreach { fs =>
      val idxs = fs.sortBy(_._2).map(_._3)
      assert(idxs == idxs.sorted && idxs.distinct == idxs)
      val nf = texts(fs.head._1).getBytes("UTF-8").length / 4
      assert(idxs.forall(ix => ix >= 0 && ix < nf))
    }
    // media shorter than one frame emits nothing
    import spark.implicits._
    val tiny = Seq((99L, "text/fake")).toDF("media_id", "media_type")
      .withColumn("content", org.apache.spark.sql.functions.to_binary(
        org.apache.spark.sql.functions.lit("ab"),
        org.apache.spark.sql.functions.lit("utf-8")))
    assert(MultimodalOps.frameSampleManifest(tiny, 4, 2, 3).count() == 0)
  }

  test("frameDups: cross-media frame collisions only, counts exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{to_binary, lit => flit, col => fcol}
    // media 0 and 1 share their content (re-encode twin); 2 is unique;
    // 3 repeats a frame INTERNALLY only (must not count as cross-media)
    val mk = (s: String) => s * 8 // >= 2 frames of 4 bytes
    val media = Seq(
      (0L, mk("abcd")), (1L, mk("abcd")), (2L, mk("wxyz")), (3L, mk("abab"))
    ).toDF("media_id", "raw")
      .withColumn("content", to_binary(fcol("raw"), flit("utf-8")))
      .select("media_id", "content")
    val got = MultimodalOps.frameDups(media, frameBytes = 4, fps = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // every sampled frame of media 0/1 is "abcd" -> ONE digest shared by
    // both (3 samples each = 6 occurrences); nothing else crosses media
    assert(got.size == 1)
    val (_, occ, nm, first) = got.head
    assert(occ == 6L && nm == 2L && first == 0L)
  }

  test("framePHash: brightness-shift invariant; pHash pairs catch what frameDups misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{to_binary, lit => flit, col => fcol}
    val rnd = new scala.util.Random(17)
    // a deterministic 128-byte "picture" (two 8x8 frames) in printable ASCII
    val base = Array.fill(128)((33 + rnd.nextInt(90)).toChar).mkString
    // re-encode stand-in: a uniform +1 brightness shift on every byte
    // moves only each frame's DC coefficient -> pHash identical, md5 not
    val shifted = base.map(c => (c + 1).toChar).mkString
    // an unrelated picture
    val other = Array.fill(128)((33 + rnd.nextInt(90)).toChar).mkString
    val media = Seq((0L, base), (1L, shifted), (2L, other))
      .toDF("media_id", "raw")
      .withColumn("content", to_binary(fcol("raw"), flit("utf-8")))
      .select("media_id", "content")
    // byte-digest dedup sees NO cross-media duplicate (every byte moved)
    assert(MultimodalOps.frameDups(media, frameBytes = 64, fps = 4, k = 8).isEmpty)
    // the DCT hash is bit-identical under the shift
    val h = MultimodalOps.framePHash(media, fps = 4, k = 8)
      .select("media_id", "frame_ix", "phash")
      .as[(Long, Long, Long)].collect().toSeq
    val h0 = h.filter(_._1 == 0L).map(t => (t._2, t._3)).sorted
    val h1 = h.filter(_._1 == 1L).map(t => (t._2, t._3)).sorted
    assert(h0 == h1 && h0.nonEmpty)
    assert(h.forall(_._3 >= 0L)) // 63-bit pack stays non-negative
    // the banded Hamming join surfaces the (0,1) re-encode pair at dist 0
    val pairs = MultimodalOps.framePhashPairs(media, fps = 4, k = 8, maxDist = 3)
      .select("media_a", "media_b", "dist")
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.contains((0L, 1L, 0L)))
    // the dedup completion (the g_phash_cc composition): the >= 2-frame
    // rollup pairs cluster via star CC, the election keeps ONE of the
    // re-encode pair (equal lengths -> lowest id) and the unrelated
    // singleton keeps itself
    val docs = Seq((0L, base, base.length.toLong), (1L, shifted, base.length.toLong),
        (2L, other, other.length.toLong))
      .toDF("doc_id", "text", "n_chars")
    val kept = graft.operators.DedupOps.canonicalPerCluster(docs,
        graft.operators.DedupOps.nearDupClustersStar(
          MultimodalOps.mediaPhashDups(media, fps = 4, k = 8, maxDist = 3,
              minFrames = 2)
            .select(col("media_a").as("id1"), col("media_b").as("id2"))))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(kept == Seq((0L, 0L, 1L), (1L, 0L, 0L), (2L, 2L, 1L)))
    // the persisted index (the daily-crawl probe shape): corpus {0, 2}
    // indexed once, increment {1} probed — the re-encode pair surfaces
    // with both frames, without re-hashing the corpus
    val dir = tmpDir()
    val corpus = media.filter(col("media_id") =!= 1L)
    val inc = media.filter(col("media_id") === 1L)
    MultimodalOps.writePhashIndex(corpus, s"$dir/idx", nBuckets = 16)
    val probed = MultimodalOps.mediaPhashDupsIndexed(inc, s"$dir/idx", nBuckets = 16)
      .select("media_new", "media_corpus", "n_frame_pairs", "min_dist")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(probed == Seq((1L, 0L, 2L, 0L)))
    // a probe banded/sampled differently silently misses — refused, named
    val e = intercept[IllegalArgumentException] {
      MultimodalOps.mediaPhashDupsIndexed(inc, s"$dir/idx", k = 4, nBuckets = 16)
        .collect()
    }
    assert(e.getMessage.contains("pHash parameters disagree"))
    // the streamed twin indexes identically: two batches + compact ==
    // the batch-built index, probe-row-level
    graft.streaming.StreamingOps.phashBatch(
      corpus.filter(col("media_id") === 0L), 0L, s"$dir/sidx", 4, 8, 16)
    graft.streaming.StreamingOps.phashBatch(
      corpus.filter(col("media_id") === 2L), 1L, s"$dir/sidx", 4, 8, 16)
    graft.streaming.StreamingOps.compactPhashIndex(spark, s"$dir/sidx")
    val streamed = MultimodalOps.mediaPhashDupsIndexed(inc, s"$dir/sidx", nBuckets = 16)
      .select("media_new", "media_corpus", "n_frame_pairs", "min_dist")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(streamed == probed)
    // the index self-join face == the in-DAG face (the corpus is never
    // re-hashed for the prior of an incremental clustering)
    MultimodalOps.writePhashIndex(media, s"$dir/allidx", nBuckets = 16)
    val cols6 = Seq("media_a", "media_b", "n_frame_pairs", "min_dist",
      "aligned_frames", "modal_offset")
    val fromIdx = MultimodalOps.mediaPhashDupsFromIndex(spark, s"$dir/allidx")
      .select(cols6.head, cols6.tail: _*)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val inDag = MultimodalOps.mediaPhashDups(media)
      .select(cols6.head, cols6.tail: _*)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(fromIdx == inDag && fromIdx.nonEmpty)
  }

  test("mediaRollup alignment vote: a re-encode aligns, a scattered intro does not") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{to_binary, lit => flit, col => fcol}
    val rnd = new scala.util.Random(23)
    def frame() = Array.fill(64)((33 + rnd.nextInt(90)).toChar).mkString
    val Seq(i1, i2) = Seq(frame(), frame())
    // A: the intro opens the video; B: a full re-encode of A (+1 per
    // byte moves only DC coefficients); C: a DIFFERENT video carrying
    // the same intro frames scattered at positions 3 and 6
    val a = i1 + i2 + (3 to 8).map(_ => frame()).mkString
    val b = a.map(c => (c + 1).toChar).mkString
    val cFrames = (1 to 8).map(_ => frame()).toArray
    cFrames(3) = i1; cFrames(6) = i2
    val c = cFrames.mkString
    val media = Seq((0L, a), (1L, b), (2L, c)).toDF("media_id", "raw")
      .withColumn("content", to_binary(fcol("raw"), flit("utf-8")))
      .select("media_id", "content")
    val got = MultimodalOps.mediaPhashDups(media, fps = 4, k = 8,
        maxDist = 3, minFrames = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    // (A,B): all 8 frames pair at one consistent offset 0 — a re-encode.
    // (A,C)/(B,C): two frame pairs, but at offsets -3 and -5 — the modal
    // offset carries ONE vote (ties -> lowest offset), so the alignment
    // columns separate the shared-intro pair from the re-encode even
    // though both clear minFrames = 2.
    assert(got == Seq(
      (0L, 1L, 8L, 0L, 8L, 0L),
      (0L, 2L, 2L, 0L, 1L, -5L),
      (1L, 2L, 2L, 0L, 1L, -5L)))
  }

  test("pidsIn walks the calendar between two FileTimes") {
    import graft.functions.TimeFns
    val ft = (iso: String) => TimeFns.microsToFileTime(lit(TimeFns.utcMicros(iso)))
    val lo = TimeFns.utcMicros("2023-12-30T12:00:00") * 10 + TimeFns.FileTimeEpochTicks
    val hi = TimeFns.utcMicros("2024-01-02T01:00:00") * 10 + TimeFns.FileTimeEpochTicks
    assert(graft.operators.IndexOps.pidsIn(lo, hi) ==
      Seq(2023364, 2023365, 2024001, 2024002)) // year wrap included
  }

  test("sampleChunks produces stride-spaced chunks of the binary column") {
    val media = MultimodalOps.mediaFromDocuments(docsDf())
    val chunks = MultimodalOps.sampleChunks(media, chunk = 8, stride = 2)
    assert(chunks.count() > 0)
    val first = chunks.filter(col("media_id") === 1L).orderBy("chunk_idx").head
    assert(new String(first.getAs[Array[Byte]]("chunk_bytes")) == "the quic")
  }
}
