package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{NumFns, TextFns}

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
      threshold: Double = 0.7): DataFrame = {
    require(nHashes % bands == 0, "bands must divide nHashes")
    val rows = nHashes / bands
    val withSig = docs.select(
      col(idCol).as("id"),
      TextFns.shingles(col(textCol), shingleK).as("shingles"))
      .withColumn("sig", TextFns.minHashSignature(array_distinct(col("shingles")), nHashes))
    // explode into (band, banded-signature-hash) keys
    val banded = withSig.select(
      col("id"), col("shingles"),
      posexplode(array((0 until bands).map { b =>
        xxhash64((lit(b) +: (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1))): _*)
      }: _*)).as(Seq("band", "bandsig")))
    val left = banded.select(col("band"), col("bandsig"), col("id").as("id1"), col("shingles").as("sh1"))
    val right = banded.select(col("band"), col("bandsig"), col("id").as("id2"), col("shingles").as("sh2"))
    val candidates = left.join(right,
        Seq("band", "bandsig")).filter(col("id1") < col("id2"))
      .select("id1", "id2", "sh1", "sh2").distinct()
    candidates
      .withColumn("jaccard", jaccardArrays(array_distinct(col("sh1")), array_distinct(col("sh2"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), NumFns.floorAt(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup candidates: pairs within `maxHamming` of each other.
    * Block key trick: split the 64-bit fingerprint into (maxHamming+1)
    * 16-bit blocks — any pair within the radius agrees on at least one
    * block (pigeonhole), so the join key space stays tiny while recall is
    * exact for radius <= 3. */
  def simHashNearDups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    val withFp = docs.select(col(idCol).as("id"), TextFns.simHash(TextFns.tokens(col(textCol))).as("fp"))
    val blocks = withFp.select(
      col("id"), col("fp"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("fp"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("block", "key")))
    val l = blocks.select(col("block"), col("key"), col("id").as("id1"), col("fp").as("fp1"))
    val r = blocks.select(col("block"), col("key"), col("id").as("id2"), col("fp").as("fp2"))
    l.join(r, Seq("block", "key")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), TextFns.hamming64(col("fp1"), col("fp2")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram (token) Jaccard within deterministic blocks — the
    * SQL-expressible oracle path. Blocks: (lang, n_chars div blockWidth).
    * Quadratic within a block; keep blocks small. */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockWidth: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val base = docs.select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / blockWidth).as("len_bucket"),
      TextFns.tokenSet(col("text")).as("toks"))
    val a = base.select(col("lang"), col("len_bucket"), col("doc_id").as("id1"), col("toks").as("t1"))
    val b = base.select(col("lang"), col("len_bucket"), col("doc_id").as("id2"), col("toks").as("t2"))
    a.join(b, Seq("lang", "len_bucket")).filter(col("id1") < col("id2"))
      .withColumn("jaccard", jaccardArrays(col("t1"), col("t2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), NumFns.floorAt(col("jaccard"), 4).as("jaccard"))
  }

  /** Jaccard of two pre-deduplicated arrays: |a ∩ b| / (|a| + |b| - |a ∩ b|).
    * int/int division -> double, same as DuckDB's `/`. */
  def jaccardArrays(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter / (size(a) + size(b) - inter)
  }
}
