package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators (dedup, quality,
  * language id). Everything is a Catalyst built-in composition — codegen'd,
  * pushdown-friendly, no UDFs.
  */
object TextFns {

  /** Whitespace tokenization (single-space; testdata uses single spaces). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** BPE-ish subword-count heuristic: words + punctuation runs counted
    * separately (a cheap stand-in for a tokenizer's token count). */
  def approxBpeCount(text: Column): Column =
    size(split(text, "[\\s]+")) +
      length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))

  /** `k`-gram shingles over tokens, joined with spaces. Safe on short
    * texts (returns empty array below k tokens — ANSI mode would error on
    * a negative-length sequence otherwise). */
  def shingles(text: Column, k: Int): Column = {
    val t = tokens(text)
    val n = size(t)
    when(n >= k,
      transform(sequence(lit(0), n - k), i =>
        concat_ws(" ", (0 until k).map(j => element_at(t, i + j + 1)): _*)))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** MinHash signature: for each of `nHashes` seeded hash functions, the
    * minimum xxhash64 over the shingle set. Returns array<long>. */
  def minHashSignature(shingleCol: Column, nHashes: Int): Column =
    array((0 until nHashes).map { seed =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(seed))))
    }: _*)

  /** 64-bit SimHash over the token multiset, built bit-by-bit from
    * majority votes of per-token hash bits. Returns a long. Kept as the
    * interpreted HOF reference of the vote semantics; the production path
    * (DedupOps.simHashFingerprints) uses the same votes over FNV-1a token
    * hashes (plans/Fnv64) so the whole pipeline is oracle-checkable —
    * fingerprints from the two paths differ by token hash, not shape. */
  def simHash(tokenCol: Column): Column = {
    val hashes = transform(tokenCol, t => xxhash64(t))
    (0 until 64).map { bit =>
      // vote_bit = sum over tokens of (+1 if hash bit set else -1)
      val vote = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Deterministic rolling fingerprint: xor-rotate fold of per-token
    * hashes, order-sensitive (unlike a set hash). Token-level, not
    * char-level — ~5x fewer interpreted lambda steps for the same
    * fingerprinting power; use md5/sha2 for the cryptographic variant. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), c => xxhash64(c)),
      lit(0L),
      // xor-rotate accumulation is overflow-free under ANSI mode
      (acc, h) => shiftleft(acc, 1).bitwiseXOR(shiftright(acc, 62)).bitwiseXOR(h))

  /** Char-level polynomial rolling fingerprint, (acc*31 + code) mod 1e9+7 —
    * the ORACLE-CHECKABLE rolling hash: the identical fold is expressible
    * in ANSI SQL (DuckDB `list_reduce` over codepoints), and the modulus
    * keeps every intermediate below 2^35 (overflow-free in both engines).
    * This is the interpreted higher-order REFERENCE formulation, kept to
    * cross-check the native codegen kernel that production paths use
    * (plans/PolyFingerprint, ~7x faster — fused byte loop, no per-char
    * substr allocation). */
  def polyFingerprint(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1)))),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)

  /** Stopword hits: number of distinct words from `stop` present in the
    * text. Both engines dedup before intersecting -> exact parity. */
  def stopwordHits(text: Column, stop: Seq[String]): Column =
    size(array_intersect(tokenSet(text), array(stop.map(lit): _*)))

  /** Punctuation ratio = non-alphanumeric-non-space chars / total chars. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")) / length(text)

  /** Simple quality score in [0,1]: rewards mid-length docs, low punct
    * ratio, and high distinct-token ratio. Deterministic arithmetic only. */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text))
    val distinctRatio = size(tokenSet(text)) / nTok.cast("double")
    val lenScore = least(nTok.cast("double") / lit(64.0), lit(1.0))
    val punct = punctRatio(text)
    least(greatest(
      lenScore * lit(0.4) + distinctRatio * lit(0.4) + (lit(1.0) - punct) * lit(0.2),
      lit(0.0)), lit(1.0))
  }
}
