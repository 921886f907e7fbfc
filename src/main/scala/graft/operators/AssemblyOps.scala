package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Training-run assembly: the last mile from a curated corpus to the
  * token stream a trainer actually consumes (builder mandate §G, beyond
  * the reference surface — the reference stops at replayable event
  * streams, `CassandraEventStore.cs:246-266`; a pretraining pipeline
  * additionally has to PACK those documents into fixed-length sequences
  * and SCHEDULE their repeats).
  *
  * Three operators, each deterministic and engine-replayable (no RNG —
  * the multiplicative permutation from [[CurationOps.shuffleShards]]
  * supplies all pseudo-randomness, so a run is bit-reproducible on any
  * cluster and auditable in ANSI SQL):
  *
  *   - [[packTokenSpans]] — GPT-style concat-and-chunk packing: the
  *     corpus is one long token stream in a declared order; sequence `s`
  *     owns tokens `[s·L, (s+1)·L)`; every document contributes one SPAN
  *     row per sequence it crosses. The output is the (seq_id, seq_pos,
  *     doc, doc_start, len) manifest a loader needs to build both the
  *     input ids and the attention-reset / loss mask at sequence
  *     boundaries — documents are sliced, never padded, and the trailing
  *     partial sequence is dropped.
  *   - [[epochExpand]] — materializes [[CurationOps.unimaxAllocation]]'s
  *     epochs_ppm as actual repeat rows: each source's documents appear
  *     `alloc DIV n_src` full epochs, plus one fractional epoch filled
  *     by the minimal shuffle-order prefix covering the remainder
  *     (boundary document kept — the [[CurationOps.domainTokenBudget]]
  *     rule, so realized tokens overshoot each source's allocation by
  *     less than one document).
  *   - [[trainManifest]] — the composed pass: allocation → epoch
  *     expansion → deterministic global interleave of (doc, epoch) →
  *     packing. One DAG from raw corpus to training manifest.
  *
  * Scale shape: the only inherently sequential step — the corpus-wide
  * exclusive prefix-sum of token counts — runs two-phase exactly like
  * [[CurationOps.tokenPacking]]: contiguous order-key chunks prefix-sum
  * locally (windows PARTITIONED by chunk), and only the bounded
  * chunk-totals frame sees an unpartitioned window. Span fan-out is an
  * `explode(sequence(...))` of at most `n/L + 1` rows per document; the
  * sequence-total denominator is a 1-row aggregate broadcast back in-DAG
  * (no driver action).
  */
object AssemblyOps {

  /** Mersenne prime 2^31-1 — the [[CurationOps.shuffleShards]] modulus. */
  private[graft] val P = 2147483647L
  private[graft] val Mult = 62089911L

  /** The shared multiplicative permutation `((id mod P)·M + seed) mod P`
    * — a bijection on [0, P) for seed-shifted ids, overflow-safe for any
    * long id on wrap-on-overflow AND trap-on-overflow engines.
    *
    * Seeding caveat: the `seed` slot here is an AFTER-multiplication
    * shift, which preserves relative order except at mod-P wraps —
    * different seeds produce nearly the same ORDER. Callers that want a
    * seed to genuinely re-permute must pre-shift the id instead:
    * `permKey(id + seed, 0)` (every assembly operator does). */
  private[graft] def permKey(id: Column, seed: Long): Column =
    (pmod(id, lit(P)) * lit(Mult) + lit(seed)) % lit(P)

  /** Concat-and-chunk sequence packing. Documents are concatenated in
    * `(orderCol, idCol)` order into one token stream; each document
    * emits one row per `seqLen`-token sequence it intersects:
    *
    *   - `seq_id`    — the sequence (complete sequences only: the
    *                   trailing `T mod L` tokens are dropped)
    *   - `seq_pos`   — the slice's first position within the sequence
    *   - `idCol`     — the document (plus any `carryCols`)
    *   - `doc_start` — the slice's first token within the document
    *   - `len`       — slice length; a sequence's slices tile `[0, L)`
    *
    * `nTokensCol` supplies a pre-computed token count (the composed
    * manifest re-uses [[epochExpand]]'s); otherwise `textCol` is
    * whitespace-tokenized. Zero-token rows contribute nothing.
    *
    * Two-phase prefix sum: `orderCol DIV chunkSize` buckets are
    * contiguous in the order, so per-chunk totals (a bounded frame —
    * size it via `chunkSize` so chunks ≈ corpus/10k) turn into exclusive
    * chunk offsets with ONE tiny window, and the per-document running
    * sum windows only within its chunk. Bit-equal to the single-window
    * formulation (AssemblySpec) because chunk boundaries respect the
    * order. */
  def packTokenSpans(
      docs: DataFrame,
      seqLen: Long,
      orderCol: String = "doc_id",
      idCol: String = "doc_id",
      textCol: String = "text",
      nTokensCol: Option[String] = None,
      carryCols: Seq[String] = Nil,
      chunkSize: Long = 1L << 20): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(chunkSize > 0, "chunkSize must be positive")
    val n = nTokensCol.map(c => col(c).cast("long"))
      .getOrElse(size(TextFns.tokens(coalesce(col(textCol), lit("")))).cast("long"))
    // pinned: the tokenized frame feeds the chunk-offset aggregate, the
    // 1-row total, and the per-document window — unpinned it would
    // re-tokenize the corpus three times
    val base = Checkpoints.pin(
      docs.select((Seq(col(orderCol).cast("long").as("__ord"), col(idCol).as("__id"),
          n.as("__n")) ++ carryCols.map(col)): _*)
        .filter(col("__n") > 0)
        .withColumn("__chunk", expr(s"__ord DIV ${chunkSize}L")),
      reliable = false)
    val total = base.agg(coalesce(sum(col("__n")), lit(0L)).as("__T"))
    val off = exclusiveOffsets(base).crossJoin(broadcast(total))
    spansBetween(off, seqLen, lit(0L), expr(s"__T DIV ${seqLen}L"), idCol, carryCols)
  }

  /** The shared two-phase exclusive prefix-sum of `__n` in `(__ord,
    * __id)` order over a frame carrying a contiguous `__chunk` bucket
    * column: per-chunk totals → exclusive chunk offsets with ONE window
    * over the bounded chunk frame → chunk-local running sums (windows
    * PARTITIONED by chunk). Adds `__off`. Used by [[packTokenSpans]] and
    * the incremental pack's per-batch offset assignment. */
  private[graft] def exclusiveOffsets(base: DataFrame): DataFrame = {
    val wC = Window.orderBy(col("__chunk"))
    val offsets = base.groupBy(col("__chunk")).agg(sum(col("__n")).as("__csum"))
      .withColumn("__coff", coalesce(
        sum(col("__csum")).over(wC.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__chunk"), col("__coff"))
    val wIn = Window.partitionBy(col("__chunk")).orderBy(col("__ord"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(offsets, Seq("__chunk")) // AQE broadcasts the offsets
      .withColumn("__off", col("__coff") + sum(col("__n")).over(wIn) - col("__n"))
  }

  /** Span rows of an offset-carrying frame (`__id`, `__off`, `__n` +
    * carry columns), clipped to the sequence window `[sFrom, sTo)` — the
    * shared emission core of [[packTokenSpans]] (full window `[0, T/L)`)
    * and the incremental/streaming pack
    * ([[graft.streaming.StreamingOps.packStream]]: only the sequences a
    * delta completes). The empty-range filter runs BEFORE the explode
    * (Spark's `sequence(a, b)` descends when a > b — a doc entirely
    * inside the dropped window must emit nothing, not reversed spans). */
  private[graft] def spansBetween(withOff: DataFrame, seqLen: Long,
      sFrom: Column, sTo: Column, idCol: String, carryCols: Seq[String]): DataFrame =
    withOff
      .withColumn("__lo", greatest(expr(s"__off DIV ${seqLen}L"), sFrom))
      .withColumn("__hi", least(expr(s"(__off + __n - 1) DIV ${seqLen}L"), sTo - 1))
      .filter(col("__lo") <= col("__hi"))
      .withColumn("seq_id", explode(expr("sequence(__lo, __hi)")))
      .withColumn("__s", greatest(col("__off"), col("seq_id") * seqLen))
      .withColumn("__e", least(col("__off") + col("__n"), (col("seq_id") + 1) * seqLen))
      .select((Seq(col("seq_id"),
        (col("__s") - col("seq_id") * seqLen).as("seq_pos"),
        col("__id").as(idCol),
        (col("__s") - col("__off")).as("doc_start"),
        (col("__e") - col("__s")).as("len")) ++ carryCols.map(col)): _*)

  /** Materialize a UniMax allocation as repeat rows — the "applied at
    * training time" half [[CurationOps.unimaxSelect]]'s scaladoc defers.
    * Per source with token total `n` and allocation `alloc`:
    *
    *   - every document repeats `full = alloc DIV n` times
    *     (`epoch` 0 .. full−1);
    *   - the fractional epoch (`alloc mod n` tokens) is filled by the
    *     minimal prefix of the source's documents in shuffle-permutation
    *     order (`epoch = full`) — the boundary document is kept, so each
    *     source realizes at least its allocation and overshoots by less
    *     than one document; a zero remainder adds nothing.
    *
    * Output: (idCol, sourceCol, epoch, n_tokens), one row per scheduled
    * document instance. Realized tokens per source ≈ alloc_tokens; the
    * epoch column is what a loader shuffles/interleaves on.
    *
    * Scale: the allocation is a domains-sized frame; full repeats are a
    * broadcast join + bounded explode (≤ epochCap rows per doc); the
    * fractional prefix is the [[CurationOps.domainTokenBudgetEach]]
    * two-phase shape over CONTIGUOUS sort-key ranges, so no mega-source
    * ever serializes into one window task — only each source's boundary
    * range (~1/nRanges of it) sorts. */
  def epochExpand(
      docs: DataFrame,
      budgetTokens: Long,
      epochCap: Int,
      seed: Long = 0L,
      nRanges: Int = 64,
      sourceCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      nTokensCol: Option[String] = None): DataFrame = {
    require(budgetTokens >= 0 && epochCap >= 1 && nRanges >= 1,
      "budgetTokens >= 0, epochCap >= 1, nRanges >= 1")
    // nTokensCol: expand from precomputed per-doc counts (the slim frame a
    // streaming re-manifest maintains) — textCol is never touched then
    val perDoc = nTokensCol match {
      case Some(n) => col(n).cast("long")
      case None => size(TextFns.tokens(coalesce(col(textCol), lit("")))).cast("long")
    }
    val alloc = CurationOps.unimaxAllocation(docs, budgetTokens, epochCap,
        sourceCol, textCol, nTokensCol)
      .withColumn("__full",
        when(col("n_tokens") > 0, expr("alloc_tokens DIV n_tokens")).otherwise(lit(0L)))
      .withColumn("__frac",
        when(col("n_tokens") > 0, expr("alloc_tokens % n_tokens")).otherwise(lit(0L)))
      .select(col("source").as(sourceCol), col("__full"), col("__frac"))
    val scored = Checkpoints.pin(docs.select(
      col(idCol), col(sourceCol), perDoc.as("n_tokens"))
      // seed pre-shifts the id (the permKey caveat): an after-shift would
      // preserve the prefix order except at wraps, so different seeds
      // would pick nearly the same fractional epoch
      .withColumn("__sk", permKey(col(idCol) + lit(seed), 0L)), reliable = false)
    val withAlloc = scored.join(broadcast(alloc), Seq(sourceCol))
    val out = Seq(col(idCol), col(sourceCol), col("epoch"), col("n_tokens"))
    val fullReps = withAlloc.filter(col("__full") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__full") - 1)))
      .select(out: _*)
    // fractional epoch: two-phase minimal shuffle-order prefix per source
    val width = (P + nRanges - 1) / nRanges
    val ranged = withAlloc.withColumn("__r", expr(s"__sk DIV ${width}L"))
    val wD = Window.partitionBy(col(sourceCol)).orderBy(col("__r"))
    val marked = ranged.groupBy(col(sourceCol), col("__r"))
      .agg(sum(col("n_tokens")).as("__rsum"), max(col("__frac")).as("__budget"))
      .withColumn("__before", coalesce(
        sum(col("__rsum")).over(wD.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__cat",
        when(col("__before") + col("__rsum") <= col("__budget"), "all")
          .when(col("__before") >= col("__budget"), "none")
          .otherwise("bnd"))
      .select(col(sourceCol), col("__r"), col("__before"), col("__cat"))
    val joined = ranged.join(broadcast(marked), Seq(sourceCol, "__r"))
    // one source's "bnd" rows all share its single boundary range, so the
    // per-source window here sorts ~1/nRanges of the source, never all of it
    val wB = Window.partitionBy(col(sourceCol)).orderBy(col("__sk"), col(idCol))
    val fracRows = joined.filter(col("__cat") === "all")
      .unionByName(joined.filter(col("__cat") === "bnd")
        .withColumn("__cum", sum(col("n_tokens")).over(wB))
        .filter(col("__before") + col("__cum") - col("n_tokens") < col("__frac"))
        .drop("__cum"))
      .withColumn("epoch", col("__full"))
      .select(out: _*)
    fullReps.unionByName(fracRows)
  }

  /** Truncation-free length-binned packing — the complement of
    * [[packTokenSpans]]'s concat-and-chunk: documents are NEVER split
    * across sequences (no attention-reset mask needed, no truncated
    * context), at the cost of per-sequence slack the caller can measure
    * with [[packStats]]. Documents are grouped by EXACT token count `n`;
    * a sequence of a length-`n` group holds `cap = L DIV n` whole
    * documents at positions `slot·n`; documents fill their group's
    * sequences in shuffle-permutation order (`seed` — deterministic
    * pseudo-random mixing, the [[permKey]] bijection). Documents with
    * `n > L` (or zero tokens) are EXCLUDED — report them via
    * [[packStats]]'s dropped columns; only each group's LAST sequence
    * can be partially filled.
    *
    * Output: `(seq_id, seq_pos, idCol, len)` — `seq_id` is globally
    * dense (length groups own contiguous id ranges in ascending-`n`
    * order), `seq_pos = slot·n`, and a whole document sits at each slot
    * (`doc_start` would be identically 0, so it is omitted).
    *
    * Scale shape: ranks within a length group run TWO-PHASE over
    * contiguous permutation-key chunks (the [[packTokenSpans]]
    * discipline) — per-(n, chunk) counts roll into exclusive chunk
    * offsets with a window partitioned by `n` over the bounded
    * chunk-counts frame, and the row-level `row_number` window
    * partitions by (n, chunk), so a degenerate corpus where one length
    * dominates never serializes into one task. The group-offset frame
    * (≤ L rows — one per distinct length) is the only unpartitioned
    * window, and it is bounded by construction. */
  def packBinned(
      docs: DataFrame,
      seqLen: Long,
      seed: Long = 0L,
      idCol: String = "doc_id",
      textCol: String = "text",
      nTokensCol: Option[String] = None,
      chunkSize: Long = 1L << 20): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(chunkSize > 0, "chunkSize must be positive")
    val n = nTokensCol.map(c => col(c).cast("long"))
      .getOrElse(size(TextFns.tokens(coalesce(col(textCol), lit("")))).cast("long"))
    // pinned: the tokenized frame feeds the chunk-count aggregate, the
    // group-offset aggregate, and the row-level rank join
    // the seed shifts BEFORE the multiplication (permKey(id + seed, 0)):
    // an after-multiplication shift (permKey's own seed slot) is an
    // additive rotation that preserves relative order except at wraps,
    // so different seeds would barely re-place anything — pre-shift ids
    // scramble through the multiplier into genuinely different orders
    val base = Checkpoints.pin(
      docs.select(col(idCol).as("__id"), n.as("__n"))
        .filter(col("__n") > 0 && col("__n") <= seqLen)
        .withColumn("__ord", permKey(col("__id") + lit(seed), 0L))
        .withColumn("__chunk", expr(s"__ord DIV ${chunkSize}L"))
        .withColumn("__cap", expr(s"${seqLen}L DIV __n")),
      reliable = false)
    // phase 1: exclusive chunk offsets within each length group (the
    // chunk-counts frame is bounded: ≤ P/chunkSize rows per length)
    val wLC = Window.partitionBy(col("__n")).orderBy(col("__chunk"))
    val chunkOffs = base.groupBy(col("__n"), col("__chunk")).agg(count(lit(1)).as("__c"))
      .withColumn("__coff", coalesce(
        sum(col("__c")).over(wLC.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__n"), col("__chunk"), col("__coff"))
    // bounded group frame (≤ seqLen rows): sequences per group → dense
    // global seq_id ranges in ascending-length order
    val wG = Window.orderBy(col("__n"))
    val groupOffs = base.groupBy(col("__n"), col("__cap")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__nseq", expr("(__cnt + __cap - 1) DIV __cap"))
      .withColumn("__goff", coalesce(
        sum(col("__nseq")).over(wG.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__n"), col("__goff"))
    // phase 2: chunk-local rank (parallelism = groups × chunks)
    val wIn = Window.partitionBy(col("__n"), col("__chunk"))
      .orderBy(col("__ord"), col("__id"))
    base.join(chunkOffs, Seq("__n", "__chunk")) // AQE broadcasts the offsets
      .withColumn("__r", col("__coff") + row_number().over(wIn) - 1)
      .join(broadcast(groupOffs), Seq("__n"))
      .select(
        (col("__goff") + expr("__r DIV __cap")).as("seq_id"),
        (expr("__r % __cap") * col("__n")).as("seq_pos"),
        col("__id").as(idCol),
        col("__n").as("len"))
  }

  /** Packing-efficiency report over any spans manifest (works on
    * [[packTokenSpans]], [[packBinned]], or [[trainManifest]] output —
    * anything with `(seq_id, idCol, len)` rows): one row of exact
    * integers quantifying the truncation-vs-slack tradeoff between the
    * two packers.
    *
    *   - `n_seqs`, `n_slices`, `kept_tokens` — manifest size
    *   - `n_docs_packed` / `n_docs_split` — distinct documents placed /
    *     documents sliced across ≥2 sequences (identically 0 for
    *     [[packBinned]]; the concat-and-chunk fragmentation cost)
    *   - `n_docs_dropped` / `dropped_tokens` — corpus (token count > 0)
    *     minus manifest (the binned packer's overlength exclusions; the
    *     chunk packer's trailing-tail casualties)
    *   - `fill_ppm` — kept_tokens·10⁶ DIV (n_seqs·L), the slack measure
    *     (identically 10⁶ for concat-and-chunk)
    *   - `split_ppm` — n_docs_split·10⁶ DIV n_docs_packed
    *
    * Shape: one shuffle keyed on seq_id, one on the doc id, corpus
    * totals as a 1-row broadcast — all map-side combined; no driver
    * action. */
  def packStats(
      manifest: DataFrame,
      docs: DataFrame,
      seqLen: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      nTokensCol: Option[String] = None): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val n = nTokensCol.map(c => col(c).cast("long"))
      .getOrElse(size(TextFns.tokens(coalesce(col(textCol), lit("")))).cast("long"))
    val totals = docs.select(n.as("__n")).filter(col("__n") > 0)
      .agg(count(lit(1)).as("__cd"), coalesce(sum(col("__n")), lit(0L)).as("__ct"))
    val m = manifest.select(col("seq_id"), col(idCol).as("__id"),
      col("len").cast("long").as("__len"))
    val seqAgg = m.groupBy(col("seq_id")).agg(sum(col("__len")).as("__sl"))
      .agg(count(lit(1)).as("n_seqs"), coalesce(sum(col("__sl")), lit(0L)).as("kept_tokens"))
    val docAgg = m.groupBy(col("__id")).agg(count(lit(1)).as("__slices"))
      .agg(count(lit(1)).as("n_docs_packed"),
        coalesce(sum(col("__slices")), lit(0L)).as("n_slices"),
        coalesce(sum(when(col("__slices") > 1, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as("n_docs_split"))
    seqAgg.crossJoin(docAgg).crossJoin(broadcast(totals))
      .select(
        col("n_seqs"), col("n_slices"), col("n_docs_packed"), col("n_docs_split"),
        (col("__cd") - col("n_docs_packed")).as("n_docs_dropped"),
        col("kept_tokens"),
        (col("__ct") - col("kept_tokens")).as("dropped_tokens"),
        when(col("n_seqs") > 0,
          expr(s"(kept_tokens * 1000000L) DIV (n_seqs * ${seqLen}L)"))
          .otherwise(lit(0L)).as("fill_ppm"),
        when(col("n_docs_packed") > 0,
          expr("(n_docs_split * 1000000L) DIV n_docs_packed"))
          .otherwise(lit(0L)).as("split_ppm"))
  }

  /** Loader shard manifest over a spans manifest: sequences are grouped
    * into fixed-size shards (`shard = seq_id DIV seqsPerShard` — the
    * contiguous assignment a sequential reader wants), and each shard
    * gets one row of exact validation facts:
    *
    *   - `n_seqs` / `n_slices` / `n_docs` / `n_tokens` — shard size
    *   - `first_seq` / `last_seq` — the id range actually present
    *   - `checksum` — an order-free modular row-signature sum
    *     (`Σ ((doc mod P)·M + seq_id·131 + seq_pos·31 + len) mod P`,
    *     reduced mod P), so a loader (or a re-run on another cluster)
    *     can verify a shard's content without comparing rows; any
    *     changed/dropped/duplicated row moves it.
    *
    * One map-side-combined shuffle keyed on the shard; every term of the
    * checksum is < P and shards are bounded by `seqsPerShard`, so the
    * running sum stays far from long overflow on both wrap-on-overflow
    * and trap-on-overflow engines. */
  def shardManifest(
      manifest: DataFrame,
      seqsPerShard: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(seqsPerShard > 0, "seqsPerShard must be positive")
    val sig = (pmod(col(idCol).cast("long"), lit(P)) * lit(Mult)
      + col("seq_id") * lit(131L) + col("seq_pos") * lit(31L)
      + col("len").cast("long")) % lit(P)
    manifest
      .withColumn("shard", expr(s"seq_id DIV ${seqsPerShard}L"))
      .withColumn("__sig", sig)
      .groupBy(col("shard"))
      .agg(
        countDistinct(col("seq_id")).as("n_seqs"),
        count(lit(1)).as("n_slices"),
        countDistinct(col(idCol)).as("n_docs"),
        sum(col("len").cast("long")).as("n_tokens"),
        min(col("seq_id")).as("first_seq"),
        max(col("seq_id")).as("last_seq"),
        (sum(col("__sig")) % lit(P)).as("checksum"))
  }

  /** Deterministic span-corruption masks (the T5/UL2 denoising-objective
    * noise schedule — Raffel et al. 2020 §3.1.4 "span corruption";
    * UL2's denoiser mixture varies (density, span length)) over the
    * sequence universe of a spans manifest. This is the UNIFORM-STRATA
    * deterministic variant: per `seqLen`-token sequence,
    *
    *   - `nMask = (seqLen · densityPpm) DIV 10⁶` tokens are masked in
    *     `nSpans = nMask DIV meanSpan` spans of EXACTLY `meanSpan`
    *     tokens (the fixed-length variant of T5's mean-3 sampling —
    *     deterministic, so a run is bit-reproducible and
    *     engine-replayable);
    *   - the sequence is divided into `nSpans` equal strata; span `i`
    *     starts at `i·(seqLen DIV nSpans) + off_i` with
    *     `off_i = permKey(seq_id·nSpans + i + seed) mod
    *     (seqLen DIV nSpans − meanSpan + 1)` — one span per stratum,
    *     non-overlapping BY CONSTRUCTION, pseudo-randomly placed within
    *     its stratum, different per sequence and per seed.
    *
    * Output: `(seq_id, span_ix, span_start, span_len)` — the mask
    * manifest a denoising loader turns into sentinel-token inputs and
    * span targets. Map-only over the distinct-sequence frame: one
    * bounded `explode(sequence(...))` of `nSpans` rows per sequence,
    * no shuffle beyond the distinct. */
  def spanCorruptMask(
      manifest: DataFrame,
      seqLen: Long,
      densityPpm: Long = 150000L,
      meanSpan: Long = 3L,
      seed: Long = 0L): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(densityPpm > 0 && densityPpm <= 500000L,
      "densityPpm must be in (0, 500000] — above 50% the strata cannot hold their spans")
    require(meanSpan > 0, "meanSpan must be positive")
    val nMask = seqLen * densityPpm / 1000000L
    val nSpans = nMask / meanSpan
    require(nSpans >= 1, "density·seqLen too small for even one span")
    val stratum = seqLen / nSpans
    require(stratum >= meanSpan, "meanSpan does not fit a stratum at this density")
    manifest.select(col("seq_id")).distinct()
      .withColumn("span_ix", explode(sequence(lit(0L), lit(nSpans - 1))))
      .withColumn("__off",
        permKey(col("seq_id") * lit(nSpans) + col("span_ix") + lit(seed), 0L)
          % lit(stratum - meanSpan + 1))
      .select(
        col("seq_id"),
        col("span_ix"),
        (col("span_ix") * lit(stratum) + col("__off")).as("span_start"),
        lit(meanSpan).as("span_len"))
  }

  /** Curriculum-ordered packing — the data schedule half of
    * curriculum / annealing recipes (easy-first ordering, "anneal the
    * high-quality slice at the end of the run"): the corpus is split
    * into `nBuckets` exact equal-size-by-rank strata of an integer
    * per-document score ([[CurationOps.rankBuckets]]; here the score is
    * the type-token ratio in ppm — `(distinct_tokens · 10⁶) DIV tokens`,
    * a pure-integer quality/diversity proxy both engines compute
    * identically), then packed with the declared order `(bucket,
    * permutation)`: ascending buckets, pseudo-random within a bucket.
    * Because the token stream is bucket-sorted, sequence ids are
    * CURRICULUM-MONOTONE: for i < j every token of sequence i comes
    * from a bucket ≤ every token of sequence j (spec-pinned), so a
    * trainer consuming seq_id order walks the schedule — while
    * in-bucket order stays shuffled, avoiding within-phase ordering
    * bias.
    *
    * Output: the [[packTokenSpans]] manifest + the slice's `bucket`.
    * Scale shape: rankBuckets' two-phase ranks + the packer's two-phase
    * prefix — no new unbounded window anywhere. */
  def curriculumManifest(
      docs: DataFrame,
      nBuckets: Int,
      seqLen: Long,
      seed: Long = 0L,
      idCol: String = "doc_id",
      textCol: String = "text",
      rangeWidth: Long = 64L,
      chunkSize: Long = 1L << 20): DataFrame =
    curriculumManifestFromCounts(curriculumCounts(docs, idCol, textCol),
      nBuckets, seqLen, seed, idCol, rangeWidth, chunkSize)

  /** The slim per-doc curriculum evidence `(idCol, score, n_tokens)` —
    * score is the type–token ratio in ppm (`(distinct · 10⁶) DIV tokens`),
    * per-doc computable at landing, so a streaming maintainer
    * ([[graft.streaming.StreamingOps.curriculumStream]]) never retains
    * text. */
  def curriculumCounts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = TextFns.tokens(coalesce(col(textCol), lit("")))
    docs.select(col(idCol),
        size(array_distinct(toks)).cast("long").as("__d"),
        size(toks).cast("long").as("n_tokens"))
      .withColumn("score", expr("(__d * 1000000L) DIV n_tokens"))
      .select(col(idCol), col("score"), col("n_tokens"))
  }

  /** [[curriculumManifest]] from the precomputed [[curriculumCounts]]
    * frame — the whole rank→order→pack DAG without touching text (the
    * [[trainManifest]] `nTokensCol` seam, applied to the curriculum
    * schedule). Global rank buckets move with every corpus change, so a
    * maintained curriculum refreshes through THIS entry point over
    * accumulated slim counts. */
  def curriculumManifestFromCounts(
      scored: DataFrame,
      nBuckets: Int,
      seqLen: Long,
      seed: Long = 0L,
      idCol: String = "doc_id",
      rangeWidth: Long = 64L,
      chunkSize: Long = 1L << 20): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val buckets = CurationOps.rankBuckets(
        scored.select(col(idCol), col("score")), nBuckets, "score", idCol, rangeWidth)
      .select(col(idCol), col("bucket"))
    val ordered = scored.join(buckets, idCol)
      .withColumn("__cord", col("bucket") * lit(P) + permKey(col(idCol) + lit(seed), 0L))
    packTokenSpans(ordered, seqLen, orderCol = "__cord", idCol = idCol,
      nTokensCol = Some("n_tokens"), carryCols = Seq("bucket"), chunkSize = chunkSize)
  }

  /** The composed training-run assembly: UniMax allocation → epoch
    * expansion → deterministic global interleave of (document, epoch)
    * instances → concat-and-chunk packing, one DAG.
    *
    * The interleave key is the shared permutation over
    * `eid = id·(epochCap+1) + epoch` (injective — epoch ≤ epochCap),
    * pre-shifted by `seed + 1` (the [[permKey]] caveat: pre-shifting
    * makes the interleave genuinely seed-dependent AND distinct from the
    * expansion's own fractional-prefix permutation at the same seed), so
    * repeats of one document scatter across the run instead of
    * clustering. Output: (seq_id, seq_pos, idCol, sourceCol,
    * epoch, doc_start, len) — the manifest a loader materializes
    * batches from. */
  def trainManifest(
      docs: DataFrame,
      budgetTokens: Long,
      epochCap: Int,
      seqLen: Long,
      seed: Long = 0L,
      nRanges: Int = 64,
      sourceCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkSize: Long = 1L << 20,
      nTokensCol: Option[String] = None): DataFrame = {
    val expanded = epochExpand(docs, budgetTokens, epochCap, seed, nRanges,
        sourceCol, idCol, textCol, nTokensCol)
      .withColumn("__eid", col(idCol) * lit((epochCap + 1).toLong) + col("epoch"))
      // seed+1 pre-shifts eid (the permKey caveat): the old
      // after-multiplication "+seed+1" produced the SAME relative order
      // for every seed — the interleave was effectively unseeded
      .withColumn("__ord", permKey(col("__eid") + lit(seed + 1), 0L))
    packTokenSpans(expanded, seqLen, orderCol = "__ord", idCol = "__eid",
        textCol = textCol, nTokensCol = Some("n_tokens"),
        carryCols = Seq(idCol, sourceCol, "epoch"), chunkSize = chunkSize)
      .select(col("seq_id"), col("seq_pos"), col(idCol), col(sourceCol),
        col("epoch"), col("doc_start"), col("len"))
  }
}
