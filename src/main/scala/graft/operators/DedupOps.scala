package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{NumFns, TextFns}
import graft.plans.GraftFunctions

/** Deduplication operators for the training-data pipeline (builder mandate
  * §G; all beyond the reference's own surface). Each has a distinct
  * scale/recall tradeoff:
  *
  *  - exact:   one hash-shuffle, exact duplicates only.
  *  - minhash: shingle -> minhash signature -> banded LSH bucket join ->
  *             exact-Jaccard rescore of candidates. Near-linear; the
  *             standard 100 TB near-dup pipeline (one shuffle on band
  *             signatures, candidate set << n^2).
  *  - simhash: 64-bit fingerprint, hamming-ball lookup via 4x16-bit block
  *             keys (any pair within hamming distance 3 shares >= 1 block).
  *  - ngram-jaccard: exact pairwise within deterministic blocks — quadratic
  *             in block size; the verification/oracle path, not the scale
  *             path.
  *  - embedding: cosine >= threshold within LSH buckets (see SimilarityOps).
  */
object DedupOps {

  /** Exact dedup by content hash: one representative (min id) per distinct
    * text; n_copies counts the duplicates. Single shuffle, map-side
    * partial agg. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Candidate near-dup pairs via MinHash LSH: `nHashes` minhashes split
    * into `bands` bands; docs sharing any band signature become candidates;
    * candidates are rescored with exact Jaccard over shingle sets and
    * filtered to >= `threshold`.
    *
    * The band join is the only shuffle; its key cardinality grows with the
    * corpus, so the plan scales horizontally (no broadcast of the corpus,
    * no n^2). */
  def minHashNearDups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      nHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.7,
      reliable: Boolean = false): DataFrame = {
    val banded = bandedSignatures(docs, idCol, textCol, shingleK, nHashes, bands, reliable)
    val candidates = banded.select(col("band"), col("bandsig"), col("id").as("id1"))
      .join(banded.select(col("band"), col("bandsig"), col("id").as("id2")), Seq("band", "bandsig"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
      .transform(Checkpoints.pin(_, reliable))
    candidates
      .join(candidateShingles(docs, candidates, "id1", idCol, textCol, shingleK), Seq("id1"))
      .join(candidateShingles(docs, candidates, "id2", idCol, textCol, shingleK), Seq("id2"))
      .withColumn("jaccard", jaccardArrays(col("toks_id1"), col("toks_id2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), NumFns.floorAt(col("jaccard"), 4).as("jaccard"))
  }

  /** Incremental near-dup detection: candidate pairs between a NEW batch
    * and the EXISTING corpus via the same banded MinHash keys, rescored
    * with exact Jaccard. This is the daily-increment shape at 100 TB —
    * the corpus never self-joins or re-clusters; the increment's band
    * keys hash-join against the corpus' (in production: pre-materialized)
    * band index, one band-keyed shuffle in total. Output:
    * (new_id, corpus_id, jaccard >= threshold). */
  def minHashNearDupsAgainst(
      increment: DataFrame,
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      nHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.7,
      reliable: Boolean = false): DataFrame = {
    val bi = bandedSignatures(increment, idCol, textCol, shingleK, nHashes, bands, reliable)
    val bc = bandedSignatures(corpus, idCol, textCol, shingleK, nHashes, bands, reliable)
    val candidates = bi.select(col("band"), col("bandsig"), col("id").as("new_id"))
      .join(bc.select(col("band"), col("bandsig"), col("id").as("corpus_id")), Seq("band", "bandsig"))
      .select("new_id", "corpus_id").distinct()
      .transform(Checkpoints.pin(_, reliable))
    candidates
      .join(candidateShingles(increment, candidates, "new_id", idCol, textCol, shingleK),
        Seq("new_id"))
      .join(candidateShingles(corpus, candidates, "corpus_id", idCol, textCol, shingleK),
        Seq("corpus_id"))
      .withColumn("jaccard", jaccardArrays(col("toks_new_id"), col("toks_corpus_id")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), NumFns.floorAt(col("jaccard"), 4).as("jaccard"))
  }

  /** Persist the corpus' banded-MinHash LSH index, `partitionBy(band,
    * bucket)` with bucket = pmod(bandsig, nBuckets) — the text-space
    * analogue of [[SimilarityOps.writeIvfIndex]]'s cell directories. A
    * 100 TB corpus pays the shingle+minhash scan ONCE; every increment
    * after that joins this table instead of re-signing the corpus
    * ([[minHashNearDupsIndexed]]). The (band, bucket) directory layout
    * serves the second access pattern too: point probes ("find this one
    * doc's candidates") filter on literal band/bucket values, which is
    * directory-level partition pruning — the probe reads 1/(bands ×
    * nBuckets) of the index (spec-pinned). */
  def writeMinHashIndex(
      corpus: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      nHashes: Int = 16,
      bands: Int = 4,
      nBuckets: Int = 64): Unit = {
    bandedWithBucket(corpus, idCol, textCol, shingleK, nHashes, bands, nBuckets)
      // co-locate each (band, bucket) into one task before partitionBy:
      // without this every shuffle partition writes its own file into
      // every directory it touches — tasks × directories small files
      // (observed 5x bench overhead at sf0.1; at 100 TB it's the classic
      // small-file problem). One shuffle, one file per directory.
      .repartition(col("band"), col("bucket"))
      .write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .partitionBy("band", "bucket").parquet(path)
    writeLshMeta(corpus.sparkSession, path, shingleK, nHashes, bands, nBuckets)
  }

  /** Band signatures with the directory bucket attached — the row shape
    * every LSH-index writer lands. */
  private[graft] def bandedWithBucket(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, nHashes: Int, bands: Int, nBuckets: Int): DataFrame =
    bandedSignatures(docs, idCol, textCol, shingleK, nHashes, bands, reliable = false)
      .withColumn("bucket", pmod(col("bandsig"), lit(nBuckets.toLong)).cast("int"))

  /** Parameter sidecar: a probe signed with different LSH parameters than
    * the index silently yields missing candidates, so record them for
    * [[assertLshMeta]] to check. */
  private[graft] def writeLshMeta(spark: org.apache.spark.sql.SparkSession, path: String,
      shingleK: Int, nHashes: Int, bands: Int, nBuckets: Int): Unit =
    ParamMeta.write(spark, path,
      Seq("shingleK" -> shingleK.toLong, "nHashes" -> nHashes.toLong,
        "bands" -> bands.toLong, "nBuckets" -> nBuckets.toLong))

  /** Assert the caller's LSH parameters against the index's `_meta.json`
    * sidecar (no-op when the sidecar is absent — pre-sidecar indexes). */
  private[graft] def assertLshMeta(spark: org.apache.spark.sql.SparkSession, path: String,
      shingleK: Int, nHashes: Int, bands: Int, nBuckets: Int): Unit =
    ParamMeta.assertMatches(spark, path,
      Seq("shingleK" -> shingleK.toLong, "nHashes" -> nHashes.toLong,
        "bands" -> bands.toLong, "nBuckets" -> nBuckets.toLong),
      "LSH parameters", "writeMinHashIndex")

  /** [[minHashNearDupsAgainst]] with the corpus side served from a
    * persisted index ([[writeMinHashIndex]]): the increment is signed
    * fresh (it's new data), the corpus is NOT re-scanned — its band keys
    * are read back from the index, a (band, bucket, bandsig)-keyed hash
    * join (the bucket key narrows each shuffle partition to one
    * directory's worth of index rows; AQE splits skewed buckets). The
    * exact-Jaccard rescore still projects shingles for candidate corpus
    * docs only (semi-join first). Same output contract as
    * minHashNearDupsAgainst. */
  def minHashNearDupsIndexed(
      increment: DataFrame,
      corpus: DataFrame,
      indexPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      nHashes: Int = 16,
      bands: Int = 4,
      nBuckets: Int = 64,
      threshold: Double = 0.7,
      reliable: Boolean = false): DataFrame = {
    val spark = increment.sparkSession
    // the probe's banding must match the index's or candidates silently go
    // missing — assert against the sidecar writeMinHashIndex recorded
    assertLshMeta(spark, indexPath, shingleK, nHashes, bands, nBuckets)
    val bi = bandedSignatures(increment, idCol, textCol, shingleK, nHashes, bands, reliable)
      .withColumn("bucket", pmod(col("bandsig"), lit(nBuckets.toLong)).cast("int"))
    val bc = spark.read.parquet(indexPath)
    val candidates = bi
      .select(col("band"), col("bucket"), col("bandsig"), col("id").as("new_id"))
      .join(bc.select(col("band"), col("bucket"), col("bandsig"), col("id").as("corpus_id")),
        Seq("band", "bucket", "bandsig"))
      .select("new_id", "corpus_id").distinct()
      .transform(Checkpoints.pin(_, reliable))
    rescoreCandidates(candidates, increment, corpus, idCol, textCol, shingleK, threshold)
  }

  /** [[minHashNearDupsIndexed]] with the corpus TEXT side also pruned:
    * the caller's corpus landing is hive-partitioned by a doc-id bucket
    * (`db = pmod(id, nDb)`), and instead of a corpus frame it supplies a
    * reader from a bucket set to the matching slice. After the index
    * probe yields candidates, their bucket set (bounded by `nDb` — a
    * driver-side collect of ints, the touched-pb pattern of
    * curatedIngest) selects which corpus directories the exact-Jaccard
    * rescore reads: static partition pruning, so per increment the
    * corpus scan is O(candidate buckets), never O(corpus). Same output
    * contract as minHashNearDupsIndexed; with sparse candidates the
    * rescore reads a vanishing corpus fraction, and in the dense worst
    * case it degrades to exactly the unpruned scan. */
  def minHashNearDupsIndexedPruned(
      increment: DataFrame,
      corpusForBuckets: Seq[Int] => DataFrame,
      indexPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      nHashes: Int = 16,
      bands: Int = 4,
      nBuckets: Int = 64,
      threshold: Double = 0.7,
      nDb: Int = 64,
      reliable: Boolean = false): DataFrame = {
    val spark = increment.sparkSession
    assertLshMeta(spark, indexPath, shingleK, nHashes, bands, nBuckets)
    val bi = bandedSignatures(increment, idCol, textCol, shingleK, nHashes, bands, reliable)
      .withColumn("bucket", pmod(col("bandsig"), lit(nBuckets.toLong)).cast("int"))
    val bc = spark.read.parquet(indexPath)
    val candidates = bi
      .select(col("band"), col("bucket"), col("bandsig"), col("id").as("new_id"))
      .join(bc.select(col("band"), col("bucket"), col("bandsig"), col("id").as("corpus_id")),
        Seq("band", "bucket", "bandsig"))
      .select("new_id", "corpus_id").distinct()
      .transform(Checkpoints.pin(_, reliable))
    // bounded by nDb: the only driver-side state this path ever collects
    val touched = candidates
      .select(pmod(col("corpus_id"), lit(nDb.toLong)).cast("int").as("db"))
      .distinct().collect().map(_.getInt(0)).toSeq
    rescoreCandidates(candidates, increment, corpusForBuckets(touched),
      idCol, textCol, shingleK, threshold)
  }

  /** Shared exact-Jaccard rescore over a pinned candidate pair list: both
    * text sides are semi-joined down to candidate docs before shingling. */
  private def rescoreCandidates(
      candidates: DataFrame,
      increment: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int,
      threshold: Double): DataFrame =
    candidates
      .join(candidateShingles(increment, candidates, "new_id", idCol, textCol, shingleK),
        Seq("new_id"))
      .join(candidateShingles(corpus, candidates, "corpus_id", idCol, textCol, shingleK),
        Seq("corpus_id"))
      .withColumn("jaccard", jaccardArrays(col("toks_new_id"), col("toks_corpus_id")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), NumFns.floorAt(col("jaccard"), 4).as("jaccard"))

  /** Exact incremental dedup: every increment doc annotated with how many
    * byte-identical copies already exist in the corpus, and the first such
    * id (null when novel). The join key is the 256-bit content digest, not
    * the text: at 100 TB the shuffle ships 32-byte hashes, and the corpus
    * side is typically a pre-hashed index table that never rescans the
    * raw bytes. */
  def incrementalExact(
      increment: DataFrame,
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val inc = increment.select(col(idCol).as("new_id"), sha2(col(textCol), 256).as("h"))
    val cor = corpus.select(col(idCol).as("cid"), sha2(col(textCol), 256).as("h"))
    inc.join(cor, Seq("h"), "left")
      .groupBy(col("new_id"))
      .agg(
        count(col("cid")).as("n_corpus_copies"),
        min(col("cid")).as("first_copy_id"))
  }

  /** Serialized Bloom sketch over the corpus' content digests — the
    * bounded broadcastable membership summary [[incrementalExactBloom]]
    * probes (build once, reuse across increments; at 1% FPP the sketch is
    * ~1.2 bytes per corpus doc). One map-side-combined aggregation job;
    * the result is partitioning-independent (bitwise-OR merge). */
  def corpusDigestBloom(
      corpus: DataFrame,
      textCol: String = "text",
      expectedItems: Long = 1L << 22,
      fpp: Double = 0.01): Array[Byte] = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    corpus
      .select(graft.plans.GraftFunctions.bloomAgg(
        xxhash64(sha2(col(textCol), 256)), expectedItems, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** [[incrementalExact]] with a broadcast Bloom prefilter — the
    * runtime-filter pattern as an explicit operator, and the shape that
    * survives 100 TB when the increment is large and mostly novel (the
    * training-data steady state):
    *
    *  1. the corpus digest set collapses to a Bloom sketch
    *     ([[corpusDigestBloom]], or a caller-persisted one) — bounded
    *     driver state, shipped to executors ONCE in the plan's codegen
    *     references, never a shuffle;
    *  2. the increment is split map-only: rows whose digest the sketch
    *     rejects are DEFINITELY novel (no false negatives — they take
    *     n_corpus_copies = 0 without touching the corpus); only sketch
    *     hits (true matches + FPP false positives) continue;
    *  3. the surviving candidates — matches + ~fpp·|increment|, typically
    *     orders of magnitude smaller than the increment — confirm against
    *     the corpus digests with an INNER join (broadcastable build side:
    *     inner supports building the small side, unlike the left-outer
    *     formulation, which only builds right and therefore degenerates
    *     to shuffling the corpus at scale); candidates the confirm did
    *     NOT match are the false positives, recovered as novel by an
    *     anti-join against the (match-sized) confirmed id set. The output
    *     is row-identical to [[incrementalExact]].
    *
    * Versus the plain digest join, neither the full increment nor the
    * corpus is ever shuffled (the classic two-big-sides sort-merge):
    * every broadcast side — candidates, confirmed ids — is bounded by
    * matches + fpp·|increment|, and the corpus is touched only as a
    * streamed scan-and-probe. The plain join still wins when most of the
    * increment IS duplicated (the prefilter then rejects nothing). */
  def incrementalExactBloom(
      increment: DataFrame,
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      expectedItems: Long = 1L << 22,
      fpp: Double = 0.01,
      sketch: Option[Array[Byte]] = None,
      reliable: Boolean = false): DataFrame = {
    graft.plans.GraftFunctions.register(increment.sparkSession)
    val bloom = sketch.getOrElse(corpusDigestBloom(corpus, textCol, expectedItems, fpp))
    // the digested+probed increment feeds three consumers (novel filter,
    // confirm join, FP anti-join) — materialize it once
    val inc = Checkpoints.pin(
      increment.select(col(idCol).as("new_id"), sha2(col(textCol), 256).as("h"))
        .withColumn("mc", graft.plans.GraftFunctions.bloomMightContain(
          lit(bloom), xxhash64(col("h")))),
      reliable)
    // mc is never null (xxhash64 hashes a null digest to its seed), so a
    // null-text row routes by the probe of that seed key: sketch-miss ->
    // novel directly; sketch-hit -> candidate, where the confirm join's
    // null digest matches nothing and the anti-join recovers it as novel
    val nullId = lit(null).cast(corpus.schema(idCol).dataType)
    val novel = inc.filter(!col("mc"))
      .select(col("new_id"), lit(0L).as("n_corpus_copies"),
        nullId.as("first_copy_id"))
    val candidates = inc.filter(col("mc")).drop("mc")
    val cor = corpus.select(col(idCol).as("cid"), sha2(col(textCol), 256).as("h"))
    val confirmed = candidates.join(cor, Seq("h"))
      .groupBy(col("new_id"))
      .agg(
        count(col("cid")).as("n_corpus_copies"),
        min(col("cid")).as("first_copy_id"))
    val fpNovel = candidates
      .join(confirmed.select(col("new_id")), Seq("new_id"), "left_anti")
      .select(col("new_id"), lit(0L).as("n_corpus_copies"),
        nullId.as("first_copy_id"))
    // final per-id aggregate: an increment carrying DUPLICATE ids (several
    // rows, possibly different texts) must collapse to one row per id
    // exactly like incrementalExact's groupBy does — summing the branch
    // counts equals counting over all of the id's rows
    confirmed.unionByName(fpNovel).unionByName(novel)
      .groupBy(col("new_id"))
      .agg(
        sum(col("n_corpus_copies")).as("n_corpus_copies"),
        min(col("first_copy_id")).as("first_copy_id"))
  }

  /** (id, band, bandsig) banded MinHash signatures — the LSH key layout
    * shared by the self-join (minHashNearDups) and increment-vs-corpus
    * (minHashNearDupsAgainst) paths.
    *
    * Signature construction never builds shingle strings: a shingle's
    * minhash only needs a hash of its k consecutive tokens, so we hash
    * (tok, lead(tok,1), .., lead(tok,k-1), seed) straight off a window —
    * everything stays in whole-stage codegen. (The per-row
    * transform/element_at/concat_ws formulation evaluates interpreted and
    * dominated the runtime.) min() over the shingle multiset equals min()
    * over the set, so no dedup is needed either. */
  private def bandedSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int,
      nHashes: Int,
      bands: Int,
      reliable: Boolean): DataFrame = {
    require(nHashes % bands == 0, "bands must divide nHashes")
    GraftFunctions.register(docs.sparkSession)
    val rows = nHashes / bands
    import org.apache.spark.sql.expressions.Window

    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    val toks = base.select(col("id"), posexplode(split(col("text"), " ")).as(Seq("p", "t")))
    val w = Window.partitionBy(col("id")).orderBy(col("p"))
    val leads = (1 until shingleK).map(j => lead(col("t"), j).over(w).as(s"t$j"))
    val tri = toks.select((col("id") +: col("t") +: leads): _*)
      .filter(col(s"t${shingleK - 1}").isNotNull)
    val shingleCols = col("t") +: (1 until shingleK).map(j => col(s"t$j"))
    val sigLong = tri
      .select(col("id") +: (0 until nHashes).map(i =>
        xxhash64((shingleCols :+ lit(i)): _*).as(s"h$i")): _*)
      .groupBy(col("id"))
      .agg(min(col("h0")).as("m0"), (1 until nHashes).map(i => min(col(s"h$i")).as(s"m$i")): _*)
    // docs shorter than k tokens fall back to one whole-text shingle,
    // mirroring TextFns.shingles
    val sigShort = base.filter(size(split(col("text"), " ")) < shingleK)
      .select(col("id") +: (0 until nHashes).map(i =>
        xxhash64(col("text"), lit(i)).as(s"m$i")): _*)
    // The signature table can feed both sides of a band self-join: compute
    // once. localCheckpoint (not persist): cuts the logical plan so the
    // self-join doesn't re-analyze the window pipeline twice, and its
    // blocks are released by the ContextCleaner once the frame is
    // unreachable — persist() would leak a CacheManager entry for every
    // call unless the caller remembered to unpersist. (At cluster scale
    // with lineage-loss concerns, pass reliable = true — see Checkpoints.)
    val sig = Checkpoints.pin(sigLong.unionByName(sigShort), reliable)
    sig.select(
      col("id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64((lit(b) +: (0 until rows).map(r => col(s"m${b * rows + r}"))): _*)
      }: _*)).as(Seq("band", "bandsig")))
  }

  /** Exact-Jaccard rescore input: shingle STRINGS are built only for
    * candidate docs — semi-join first, project after, so the expensive
    * projection runs over |candidates| docs, not the corpus. The
    * candidate-id set scales with the corpus' near-dup density: no
    * broadcast hint (AQE broadcasts it when it is actually small). */
  private def candidateShingles(
      src: DataFrame,
      candidates: DataFrame,
      side: String,
      idCol: String,
      textCol: String,
      shingleK: Int): DataFrame =
    src.join(candidates.select(col(side).as("cid")).distinct(),
        col(idCol) === col("cid"), "left_semi")
      .select(col(idCol).as(side),
        array_distinct(TextFns.shingles(col(textCol), shingleK)).as(s"toks_$side"))

  /** SimHash near-dup candidates: pairs within `maxHamming` of each other.
    * Block key trick: split the 64-bit fingerprint into (maxHamming+1)
    * blocks — differing bits can touch at most maxHamming blocks, so any
    * pair within the radius agrees on at least one whole block (pigeonhole)
    * and the block self-join has EXACT recall for the requested radius.
    * Cost grows with the radius (narrower blocks -> more key collisions);
    * radius <= 3 keeps 16-bit blocks, the intended scale regime. */
  def simHashNearDups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      reliable: Boolean = false): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming=$maxHamming: need maxHamming+1 blocks of >= 2 bits each")
    val nBlocks = maxHamming + 1
    val width = 64 / nBlocks // last block absorbs the remaining high bits
    // fingerprints feed both sides of the block self-join: compute once
    // (localCheckpoint: lineage cut + ContextCleaner-managed blocks)
    val withFp = Checkpoints.pin(simHashFingerprints(docs, idCol, textCol), reliable)
    val blockKeys = (0 until nBlocks).map { b =>
      if (b == nBlocks - 1) shiftrightunsigned(col("fp"), b * width)
      else shiftrightunsigned(col("fp"), b * width).bitwiseAND(lit((1L << width) - 1L))
    }
    val blocks = withFp.select(
      col("id"), col("fp"),
      posexplode(array(blockKeys: _*)).as(Seq("block", "key")))
    val l = blocks.select(col("block"), col("key"), col("id").as("id1"), col("fp").as("fp1"))
    val r = blocks.select(col("block"), col("key"), col("id").as("id2"), col("fp").as("fp2"))
    l.join(r, Seq("block", "key")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), TextFns.hamming64(col("fp1"), col("fp2")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash fingerprints in explode + 64-sum hash-aggregate form (same
    * semantics as TextFns.simHash — majority vote per bit over the token
    * multiset — but stays in codegen instead of interpreted per-row
    * aggregate() lambdas). Token hash is FNV-1a 64 (plans/Fnv64), not
    * xxhash64: identical distribution quality in codegen, but the fold is
    * reproducible in ANSI SQL engines, which makes the WHOLE pipeline
    * (hash -> majority vote -> block join -> hamming) oracle-checkable
    * rather than property-checked. */
  def simHashFingerprints(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val hashed = docs
      .select(col(idCol).as("id"), explode(TextFns.tokens(col(textCol))).as("tok"))
      .select(col("id"), GraftFunctions.fnv64(col("tok")).as("h"))
    val votes = hashed.groupBy(col("id")).agg(
      sum(when(col("h").bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as("v0"),
      (1 until 64).map { bit =>
        sum(when(shiftright(col("h"), bit).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as(s"v$bit")
      }: _*)
    votes.select(
      col("id"),
      (0 until 64).map(bit =>
        when(col(s"v$bit") > 0, lit(1L << bit)).otherwise(lit(0L)))
        .reduce(_ bitwiseOR _).as("fp"))
  }

  /** Exact n-gram (token) Jaccard within deterministic blocks — the
    * SQL-expressible oracle path. Blocks: (lang, n_chars div blockWidth).
    * Quadratic within a block; keep blocks small. */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockWidth: Int = 8,
      threshold: Double = 0.5,
      reliable: Boolean = false): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val base = docs.select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / blockWidth).as("len_bucket"),
      TextFns.tokenSet(col("text")).as("toks"))
      .transform(Checkpoints.pin(_, reliable))
    val a = base.select(col("lang"), col("len_bucket"), col("doc_id").as("id1"), col("toks").as("t1"))
    val b = base.select(col("lang"), col("len_bucket"), col("doc_id").as("id2"), col("toks").as("t2"))
    a.join(b, Seq("lang", "len_bucket")).filter(col("id1") < col("id2"))
      .withColumn("jaccard", jaccardArrays(col("t1"), col("t2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), NumFns.floorAt(col("jaccard"), 4).as("jaccard"))
  }

  /** Blocked fuzzy dedup by edit distance: pairs within (lang, length
    * band) whose Levenshtein distance <= maxDist — the character-level
    * complement of token-set Jaccard (catches in-word typos and
    * transpositions that leave token sets mostly intact and vice versa).
    * Uses the THRESHOLDED Levenshtein kernel (early-abandon banded DP,
    * O(len*maxDist) per pair instead of O(len^2); returns -1 past the
    * radius) so per-pair cost is bounded by the radius. Same documented
    * caveat as ngramJaccardPairs: quadratic within blocks is the
    * verification/oracle path — at 100 TB the candidate set comes from
    * MinHash/SimHash and edit distance is the high-precision rescore. */
  def editDistancePairs(
      docs: DataFrame,
      blockWidth: Int = 8,
      maxDist: Int = 20,
      reliable: Boolean = false): DataFrame = {
    val base = docs.select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / blockWidth).as("len_bucket"), col("text"))
      .transform(Checkpoints.pin(_, reliable))
    val a = base.select(col("lang"), col("len_bucket"), col("doc_id").as("id1"),
      col("text").as("t1"))
    val b = base.select(col("lang"), col("len_bucket"), col("doc_id").as("id2"),
      col("text").as("t2"))
    a.join(b, Seq("lang", "len_bucket")).filter(col("id1") < col("id2"))
      .withColumn("dist", levenshtein(col("t1"), col("t2"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id1"), col("id2"), col("dist"))
  }

  /** Connected components over a near-dup pair list via iterative
    * min-label propagation: every doc adopts the smallest id reachable
    * through pair edges; after convergence the label is the cluster id
    * (and the natural "keeper" — smallest doc id per duplicate cluster).
    *
    * Pure DataFrame ops, no GraphX: each iteration is one join + one
    * aggregation. Near-dup graphs are forests of tiny cliques, so the
    * label frontier converges in O(longest chain) iterations — `maxIter`
    * bounds pathological chains; at 100 TB each iteration is one shuffle
    * over the (small) pair list, not the corpus. */
  def nearDupClusters(
      pairs: DataFrame,
      maxIter: Int = 10,
      earlyStop: Boolean = true,
      reliable: Boolean = false): DataFrame = {
    // Iterative algorithms must TRUNCATE lineage each generation, not just
    // cache: a persisted frame still carries its full logical plan, so by
    // iteration k the optimizer re-analyzes k nested copies of the (large)
    // pair-producing pipeline — observed as super-linear per-iteration
    // planning time. localCheckpoint materializes AND cuts the plan.
    // (On a real cluster with node loss concerns, swap for reliable
    // checkpoint() against the checkpoint dir.)
    // undirected edge list WITH self-loops: a node's own label then flows
    // through the same min() aggregation as its neighbors' labels, so each
    // iteration is ONE join + ONE agg (the two-join least(own, nbr)
    // formulation cost an extra shuffle per iteration); self-loops also
    // keep singleton endpoints labeled
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .unionByName(pairs.select(col("id1").as("src"), col("id1").as("dst")))
      .unionByName(pairs.select(col("id2").as("src"), col("id2").as("dst")))
      .distinct()
      .transform(Checkpoints.pin(_, reliable))
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .transform(Checkpoints.pin(_, reliable))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node adopts min over its closed neighborhood's labels; the
      // self-loop row (dst == src) also carries the node's CURRENT label
      // through the same aggregation, so convergence detection is a
      // shuffle-free filter on the materialized result — no probe join
      val next = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "dst_label"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(
          min(col("dst_label")).as("label"),
          min(when(col("dst") === col("src"), col("dst_label"))).as("old"))
        .transform(Checkpoints.pin(_, reliable))
      if (earlyStop && iter > 0) {
        // skipped on the first iteration: any proper edge (id1 < id2)
        // changes at least one label there, so that probe never fires
        converged = next.filter(col("label") =!= col("old")).limit(1).count() == 0
      }
      labels = next.drop("old")
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Paragraph-level dedup with document reconstruction (the CCNet /
    * C4-style pipeline stage: drop every repeated paragraph corpus-wide,
    * keep documents). Input is pre-split passages (idCol, idxCol, paraCol)
    * — compose with [[TextOps.chunkTokens]] at stride == chunkSize for
    * fixed-width passages, or any splitter. Keeps only the globally FIRST
    * occurrence of each distinct paragraph (order = (doc id, position)),
    * then reassembles each document from its surviving paragraphs in
    * original order, with kept/dropped counts per document. Documents
    * whose every paragraph was dropped survive as empty clean_text — the
    * caller decides the document-level fate (C4 drops, CCNet keeps).
    *
    * Scale: one window shuffle keyed on the paragraph (`hashed=true`
    * partitions on the 8-byte xxhash64 instead of the full string — same
    * keep-set unless 64-bit collision) + one groupBy on doc id; per-doc
    * state is bounded by document length. Never all-pairs. */
  /** Content-defined chunking (CDC): split each document at token
    * positions where the polynomial fingerprint of the w-token window
    * STARTING there divides `divisor` — the rsync/LBFS boundary rule
    * lifted to tokens. Because a boundary depends only on its local
    * window, inserting or deleting tokens early in a document shifts
    * FIXED-STRIDE chunk frames everywhere downstream but leaves CDC
    * boundaries (and so the chunks between them) intact — the
    * shift-resistance that chunk-level dedup of mutated/prepended
    * payloads rests on (spec-pinned against the stride chunker).
    * Expected chunk length ≈ `divisor` tokens.
    *
    * One per-doc window pass (lead() shingles + a running boundary sum —
    * partitions are documents, never the corpus) and one (doc, chunk)
    * groupBy; the fingerprint is the codegen'd [[graft.plans.PolyFingerprint]]
    * so the boundary rule replays exactly in ANSI SQL (g_fingerprints_rolling's
    * identity). Output: (id, chunk_idx, chunk_text) — the
    * [[paragraphDedup]] input contract, so CDC-dedup with document
    * reconstruction is the direct composition
    * `paragraphDedup(cdcChunks(docs), idxCol = "chunk_idx", paraCol = "chunk_text")`. */
  def cdcChunks(
      docs: DataFrame,
      w: Int = 3,
      divisor: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(w >= 1 && divisor >= 1, "w and divisor must be >= 1")
    GraftFunctions.register(docs.sparkSession)
    val toks = docs.select(col(idCol),
      posexplode(TextFns.tokens(coalesce(col(textCol), lit("")))).as(Seq("pos", "tok")))
    val wl = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val shingle = concat_ws(" ",
      (0 until w).map(j => if (j == 0) col("tok") else lead(col("tok"), j).over(wl)): _*)
    val complete =
      if (w == 1) lit(true) else lead(col("tok"), w - 1).over(wl).isNotNull
    val boundary = complete && col("pos") > 0 &&
      GraftFunctions.polyFp(shingle) % divisor === 0
    toks
      .withColumn("__b", when(boundary, 1L).otherwise(0L))
      .withColumn("chunk_idx",
        sum(col("__b")).over(wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos").as("i"), col("tok").as("p")))),
          x => x.getField("p")),
        " ").as("chunk_text"))
  }

  /** Corpus-wide CDC duplication report: chunk every document
    * ([[cdcChunks]]), count content occurrences across the corpus, and
    * report per document how many of its chunks are duplicated anywhere
    * (including within itself). `hashed = true` ships the 8-byte xxhash64
    * of the chunk through the occurrence shuffle instead of the text —
    * the 100 TB mode; string mode replays in the oracle. Plan: the
    * cdcChunks window + two keyed aggregations and a chunk-keyed join —
    * never all-pairs. */
  def cdcChunkStats(
      docs: DataFrame,
      w: Int = 3,
      divisor: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
      hashed: Boolean = false): DataFrame = {
    val chunks = cdcChunks(docs, w, divisor, idCol, textCol)
      .withColumn("__key", if (hashed) xxhash64(col("chunk_text")) else col("chunk_text"))
    val occ = chunks.groupBy(col("__key")).agg(count(lit(1)).as("__occ"))
    chunks.join(occ, "__key")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("__occ") >= 2, true)).as("n_dup_chunks"))
  }

  def paragraphDedup(
      paras: DataFrame,
      idCol: String = "doc_id",
      idxCol: String = "idx",
      paraCol: String = "para",
      sep: String = " ",
      hashed: Boolean = false): DataFrame = {
    val key = if (hashed) xxhash64(col(paraCol)) else col(paraCol)
    // row_number over (doc, position) is a total order per paragraph:
    // deterministic first-occurrence winner
    val w = Window.partitionBy(key).orderBy(col(idCol), col(idxCol))
    reassembleKept(
      paras.withColumn("__kept", row_number().over(w) === 1),
      idCol, idxCol, paraCol, sep)
  }

  /** Shared reassembly tail of [[paragraphDedup]] / [[paragraphDedupAgainst]]:
    * collapse a passage frame carrying a boolean `__kept` column into one
    * row per document — surviving paragraphs joined in position order,
    * kept/dropped counts. */
  private[graft] def reassembleKept(
      flagged: DataFrame, idCol: String, idxCol: String, paraCol: String,
      sep: String): DataFrame =
    flagged
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__kept"), struct(col(idxCol).as("i"), col(paraCol).as("p"))))),
            x => x.getField("p")),
          sep).as("clean_text"),
        count(when(col("__kept"), true)).as("n_kept"),
        count(when(!col("__kept"), true)).as("n_dropped"))

  /** Incremental [[paragraphDedup]]: dedup a NEW batch's paragraphs
    * against a historical corpus (and within itself), reassembling only
    * the increment's documents — the daily-landing shape. An increment
    * paragraph is dropped if the corpus contains it anywhere, or if an
    * earlier (doc, position) in the increment already produced it; the
    * corpus is never rewritten or re-deduped. Corpus side ships only
    * DISTINCT paragraphs (or their 8-byte hashes with `hashed = true` —
    * the 100 TB mode, where the corpus side is typically a pre-hashed
    * paragraph index maintained across landings) through one left-anti
    * style join; within-increment firsts are the same window as the batch
    * operator. Same output contract as paragraphDedup. */
  def paragraphDedupAgainst(
      incParas: DataFrame,
      corpusParas: DataFrame,
      idCol: String = "doc_id",
      idxCol: String = "idx",
      paraCol: String = "para",
      sep: String = " ",
      hashed: Boolean = false): DataFrame = {
    def key(c: Column): Column = if (hashed) xxhash64(c) else c
    reassembleKept(
      flagAgainstKeys(
        incParas, corpusParas.select(key(col(paraCol)).as("__k")),
        idCol, idxCol, paraCol, hashed),
      idCol, idxCol, paraCol, sep)
  }

  /** Flag an increment's passages against a pre-computed corpus KEY set
    * (column `__k`: paragraph strings, or their xxhash64 when `hashed`):
    * adds `__key` (this row's key) and `__kept` (first in-increment
    * occurrence AND not in the corpus). The composition point for
    * incremental curation that maintains a persisted paragraph-key index
    * across landings ([[graft.streaming.StreamingOps.curatedIngest]]) —
    * the flagged frame feeds both the document reassembly and the index
    * delta (the admitted keys). */
  private[graft] def flagAgainstKeys(
      incParas: DataFrame,
      corpusKeys: DataFrame,
      idCol: String,
      idxCol: String,
      paraCol: String,
      hashed: Boolean): DataFrame = {
    def key(c: Column): Column = if (hashed) xxhash64(c) else c
    // single-pass union-window formulation: the increment's passages and
    // the corpus' keys ship through ONE shuffle keyed on the paragraph —
    // a partition-wide max flags corpus presence, a row_number ordered
    // (corpus-last, doc, position) ranks the increment's occurrences, and
    // corpus rows are filtered back out. No join, no corpus distinct():
    // duplicate corpus keys (an un-distinct caller, the overlap window of
    // a crashed compactParaIndex) change nothing, and the corpus side is
    // never shuffled twice (a semi/anti join pair re-ships it per join —
    // measured: no exchange reuse fires, even under AQE)
    val i = incParas
      .withColumn("__key", key(col(paraCol)))
      .withColumn("__corp", lit(false))
    val extra = i.columns.filterNot(c => c == "__key" || c == "__corp")
    val c = extra.foldLeft(
        corpusKeys.select(col("__k").as("__key")).withColumn("__corp", lit(true))) {
      case (df, name) => df.withColumn(name, lit(null).cast(i.schema(name).dataType))
    }.select(i.columns.map(col): _*)
    val wAll = Window.partitionBy(col("__key"))
    // __corp leads the sort, so every increment row precedes every corpus
    // row (their null ids never order) and row_number 1..n lands on the
    // increment's occurrences in (doc, position) order
    val wOrd = wAll.orderBy(col("__corp"), col(idCol), col(idxCol))
    i.unionByName(c)
      .withColumn("__in", max(when(col("__corp"), 1).otherwise(0)).over(wAll) === 1)
      .withColumn("__rn", row_number().over(wOrd))
      .filter(!col("__corp"))
      .withColumn("__kept", col("__rn") === 1 && !col("__in"))
      .drop("__corp", "__in")
  }

  /** Connected components via alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the scale path next to [[nearDupClusters]]'s label
    * propagation. Label propagation needs O(diameter) rounds and floods a
    * high-degree hub's label through every edge each round; star rounds
    * rewire the edge list itself, so chains collapse in O(log² n) rounds
    * and a hub is flattened in ONE large-star (all its larger neighbors
    * attach directly to its neighborhood min — per-node fanout stays
    * bounded by the node's degree, never grows). Same contract as
    * nearDupClusters: input near-dup pairs (id1, id2), output one row per
    * edge endpoint with cluster_id = the component's smallest id.
    *
    * Each round = 2 aggregations + 2 joins on the EDGE list (pair-sized,
    * not corpus-sized), all keyed shuffles, plus a stable-set probe on
    * materialized checkpoints; lineage is truncated per round like the
    * label-prop loop. At convergence the edge set is a star forest:
    * every node holds exactly one edge to its component min. */
  def nearDupClustersStar(
      pairs: DataFrame,
      maxRounds: Int = 12,
      reliable: Boolean = false): DataFrame = {
    // canonical undirected form: (u, v) with u > v, no self-loops, distinct
    def canon(e: DataFrame): DataFrame = e
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
    // large-star: each node u links every LARGER neighbor to the min of
    // u's closed neighborhood. Processing the symmetric list means each
    // undirected edge is seen from both endpoints; min-agg + join, no
    // neighborhood collect.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      canon(sym.join(m, Seq("u")).filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }
    // small-star: each node u links its SMALLER neighbors and itself to
    // the min of those; on the canonical (u > v) list the smaller
    // neighborhood of u is exactly its v-side
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("u").agg(min(col("v")).as("m"))
      canon(
        e.join(m, Seq("u")).select(col("v").as("u"), col("m").as("v"))
          .unionByName(m.select(col("u"), col("m").as("v"))))
    }
    var cur = canon(pairs.select(col("id1").as("u"), col("id2").as("v")))
      .transform(Checkpoints.pin(_, reliable))
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(cur)).transform(Checkpoints.pin(_, reliable))
      // star forests are fixed points of both operators, so a stable edge
      // set == converged. Both sides are distinct edge lists, so set
      // equality == "no row where either side is absent" — ONE full-outer
      // probe job over the materialized checkpoints (was two counts plus
      // an anti-join probe, three jobs per round)
      converged = next.withColumn("__n", lit(1))
        .join(cur.withColumn("__c", lit(1)), Seq("u", "v"), "full_outer")
        .filter(col("__n").isNull || col("__c").isNull)
        .limit(1).count() == 0
      cur = next
      round += 1
    }
    // converged: u = member, v = its component-min root. The min-agg keeps
    // the output well-formed (one row per endpoint) even on a maxRounds
    // bailout before convergence.
    cur.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .unionByName(cur.select(col("v").as("doc_id"), col("v").as("cluster_id")))
      .groupBy("doc_id").agg(min(col("cluster_id")).as("cluster_id"))
  }

  /** Incremental connected components — merge a day's NEW near-dup edges
    * into an existing cluster assignment without recomputing over the
    * historical pair list (the daily-crawl steady state: pairs are found
    * increment-vs-corpus, e.g. [[minHashNearDupsIndexed]], and the full
    * historical pair list is never materialized again).
    *
    * The prior assignment IS a lossless connectivity summary: each
    * (doc, cluster) row is an edge to the cluster's canonical member, so
    * clustering `assignment-edges ∪ new-pairs` with the same
    * alternating-star algorithm yields exactly the components of the
    * full union graph — clusters bridged by a new pair merge, untouched
    * clusters are already star-shaped fixed points and stabilize
    * immediately (the iteration cost tracks the NEW merges' diameter,
    * not history). Shuffle volume per run is O(|assignment| + |new
    * pairs|), vs O(|all pairs ever|) for a recompute; the spec pins
    * incremental == full-recompute row-level.
    *
    * Contract: `cluster_id` must be a MEMBER of its cluster (the
    * canonical min every clustering operator here emits) — labels are
    * graph nodes, so a synthetic non-member label would join components
    * that share it. Prior singletons (doc_id == cluster_id, degree 0)
    * are carried through unchanged unless a new pair touches them. */
  def nearDupClustersIncremental(
      prevAssign: DataFrame,
      newPairs: DataFrame,
      maxRounds: Int = 12,
      reliable: Boolean = false): DataFrame = {
    val priorEdges = prevAssign.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("id1"), col("cluster_id").as("id2"))
    val merged = nearDupClustersStar(
      priorEdges.unionByName(newPairs.select(col("id1"), col("id2"))),
      maxRounds, reliable)
    // prior singletons have no edge to survive through the star rounds;
    // re-attach the ones no new pair connected (left_anti: bounded by the
    // assignment, broadcastable at the merged-result side's match size)
    val untouchedSingletons = prevAssign
      .filter(col("doc_id") === col("cluster_id"))
      .join(merged.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
    merged.unionByName(untouchedSingletons)
  }

  /** Canonical-representative selection over a near-dup clustering — the
    * "keep the best copy of each cluster" step that turns an assignment
    * into a pruned corpus. Output: one row per document with its cluster
    * id (own id for unclustered docs) and `keep` = 1 iff the doc is its
    * cluster's representative (highest `scoreCol`, ties to the lowest id).
    *
    * Scale shape: the corpus shuffles ONCE (the left join on `idCol`
    * against the assignment — broadcast when the assignment is small,
    * which near-dup assignments usually are relative to the corpus);
    * unpaired docs exit map-only as their own kept singleton. The
    * election over the paired slice is a partial-aggregable `max_by`
    * per cluster + a cluster-keyed join back (the representative set is
    * cluster-count-sized — broadcastable), NOT a rank window: a window
    * sorts each cluster inside one task, and real corpora have hub
    * clusters (boilerplate duplicated millions of times) that would
    * spill a single partition; `max_by` partials merge map-side, so a
    * hub cluster costs one struct per partition it touches.
    *
    * @param assignment `(doc_id, cluster_id)` as produced by
    *   [[nearDupClusters]] / [[nearDupClustersStar]] (paired docs only). */
  def canonicalPerCluster(
      docs: DataFrame,
      assignment: DataFrame,
      idCol: String = "doc_id",
      scoreCol: String = "n_chars"): DataFrame = {
    val j = docs.select(col(idCol), col(scoreCol))
      .join(assignment.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
    val paired = j.filter(col("cluster_id").isNotNull)
    // arg-max by (score, -id): highest score wins, ties to the LOWEST id
    // (ids are non-negative, so the negation cannot overflow)
    val reps = paired.groupBy(col("cluster_id"))
      .agg(max_by(col(idCol), struct(col(scoreCol), (-col(idCol)).as("nid"))).as("rep"))
    val keptPaired = paired.join(reps, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"),
        (col(idCol) === col("rep")).cast("long").as("keep"))
    val singletons = j.filter(col("cluster_id").isNull)
      .select(col(idCol), col(idCol).as("cluster_id"), lit(1L).as("keep"))
    keptPaired.unionByName(singletons)
  }

  /** Jaccard of two pre-deduplicated arrays: |a ∩ b| / (|a| + |b| - |a ∩ b|).
    * int/int division -> double, same as DuckDB's `/`. Uses the fused
    * native IntersectionSize expression (GraftFunctions.register must have
    * run on the session — every DedupOps entry point does). */
  def jaccardArrays(a: Column, b: Column): Column = {
    val inter = GraftFunctions.intersectionSize(a, b)
    inter / (size(a) + size(b) - inter)
  }

  /** Per-source boilerplate removal (the C4/RefinedWeb "repeated line"
    * cleaning step): a passage is boilerplate for its source when it
    * appears in at least `pctDocs`% of that source's documents (and in at
    * least `minDf` of them — the floor keeps a 2-doc source from calling
    * half its content boilerplate); every occurrence is dropped and the
    * documents are reassembled from the survivors — nav bars, cookie
    * banners, and footer text vanish corpus-wide while genuinely shared
    * long-tail passages (df below the ratio) stay. Distinct from
    * [[paragraphDedup]]: that keeps the globally FIRST occurrence of any
    * duplicated passage; this removes ALL occurrences, but only of
    * passages frequent WITHIN their source.
    *
    * Input is pre-split passages ([[paragraphDedup]]'s contract:
    * idCol/idxCol/paraCol) that additionally carry `sourceCol`. Document
    * frequency counts DISTINCT documents (a passage repeated inside one
    * doc is df 1). The threshold is integer cross-multiplied
    * (`df · 100 >= pctDocs · nDocs`) — no FP boundary.
    *
    * Plan: one distinct + aggregate keyed on (source, passage) for the
    * df counts, a strata-sized doc-count frame broadcast back, the flag
    * join keyed on (source, passage), then [[reassembleKept]]'s one
    * doc-keyed aggregate — passage-keyed shuffles only, never all-pairs,
    * and `hashed = true` ships 8-byte passage keys (the 100 TB mode;
    * string mode replays in the oracle). */
  def boilerplateRemove(
      paras: DataFrame,
      pctDocs: Int,
      minDf: Long = 2L,
      sourceCol: String = "source",
      idCol: String = "doc_id",
      idxCol: String = "idx",
      paraCol: String = "para",
      sep: String = " ",
      hashed: Boolean = false): DataFrame = {
    require(pctDocs >= 1 && pctDocs <= 100, "pctDocs in [1, 100]")
    val keyed = Checkpoints.pin(
      paras.withColumn("__key",
        if (hashed) xxhash64(col(paraCol)) else col(paraCol)), reliable = false)
    val dfCounts = keyed.select(col(sourceCol), col("__key"), col(idCol)).distinct()
      .groupBy(col(sourceCol), col("__key")).agg(count(lit(1)).as("__df"))
    val nDocs = keyed.select(col(sourceCol), col(idCol)).distinct()
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("__nd"))
    reassembleKept(
      keyed
        .join(dfCounts, Seq(sourceCol, "__key"))
        .join(broadcast(nDocs), Seq(sourceCol))
        .withColumn("__kept",
          !(col("__df") >= minDf && col("__df") * 100 >= lit(pctDocs) * col("__nd"))),
      idCol, idxCol, paraCol, sep)
  }

  /** Near-SUBSET document pairs by k-shingle containment: directed pairs
    * (doc_a, doc_b) where at least `thresholdPct`% of doc_a's distinct
    * shingles also occur in doc_b — the asymmetric relation resemblance
    * dedup is blind to (a quote page inside a long article has high
    * containment but low Jaccard, so MinHash never pairs them; exact
    * dedup sees nothing). The excerpt/wrapper/quotation detector.
    *
    * Same inverted-index shape as [[graft.operators.MultimodalOps.cdcNearDups]]:
    * distinct per-doc shingle sets -> shingle-keyed equi-join restricted
    * to df >= 2 keys (never all-pairs) -> per-pair intersection counts ->
    * size join -> integer cross-multiplied threshold, both directions
    * emitted and filtered independently (`contain_ppm` is an integer DIV).
    * `maxDf` is the stop-shingle cap (set sizes are computed BEFORE the
    * cap, so capped-away intersections only LOWER a reported containment
    * — conservative); `hashed = true` ships 8-byte shingle keys (the
    * 100 TB mode; string mode replays in the oracle). */
  def containmentPairs(
      docs: DataFrame,
      k: Int = 3,
      thresholdPct: Int = 80,
      maxDf: Option[Long] = None,
      idCol: String = "doc_id",
      textCol: String = "text",
      hashed: Boolean = false): DataFrame = {
    require(thresholdPct >= 1 && thresholdPct <= 100, "thresholdPct in [1, 100]")
    val sets = Checkpoints.pin(
      CurationOps.shingleRows(docs, k, idCol, textCol, hashed)
        .select(col("doc_id").as("id"), col("shingle").as("__key"))
        .distinct(), reliable = false)
    val sizes = sets.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val paired = sets.join(
      sets.groupBy(col("__key")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") >= 2 && col("__df") <= lit(maxDf.getOrElse(Long.MaxValue)))
        .select(col("__key")),
      Seq("__key"), "left_semi")
    val inter = paired.select(col("__key"), col("id").as("ida"))
      .join(paired.select(col("__key"), col("id").as("idb")), Seq("__key"))
      .filter(col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("ida"), col("n").as("na")), Seq("ida"))
      .join(sizes.select(col("id").as("idb"), col("n").as("nb")), Seq("idb"))
    inter.select(col("ida").as("doc_a"), col("idb").as("doc_b"),
        col("inter"), col("na").as("n_a"), col("nb").as("n_b"))
      .unionByName(inter.select(col("idb").as("doc_a"), col("ida").as("doc_b"),
        col("inter"), col("nb").as("n_a"), col("na").as("n_b")))
      .filter(col("inter") * 100 >= lit(thresholdPct) * col("n_a"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"), col("n_b"),
        expr("(inter * 1000000L) DIV n_a").as("contain_ppm"))
  }
}
