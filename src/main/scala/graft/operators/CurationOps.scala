package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NumFns

/** Corpus-curation operators for the training-data pipeline (builder
  * mandate §G, beyond the reference's own surface): benchmark-contamination
  * checks, intra-document repetition scoring, deterministic train/val
  * splitting, and token-budget packing.
  *
  * Shingling here follows the round-1 perf lesson: shingles are built with
  * window lead() over exploded tokens (whole-stage codegen) rather than
  * per-row higher-order-function lambdas (interpreted per element). With
  * `hashed = true` the shingle never materializes as a string at all —
  * only its xxhash64 — which is the 100 TB path (8 bytes/shingle through
  * the shuffle instead of ~k words); `hashed = false` keeps the exact
  * strings so results are oracle-checkable against ANSI SQL.
  */
object CurationOps {

  /** The curation pipeline composed end-to-end, per document — the shape
    * a real pretraining-data run takes through this engine:
    *
    *   1. model-based quality filter ([[TextOps.qualityLogit]] — map-only)
    *   2. exact dedup of the survivors ([[DedupOps.exact]] — one
    *      hash-shuffle, min-id keeper per content class)
    *   3. corpus-wide paragraph dedup with document reconstruction
    *      ([[TextOps.chunkTokens]] at stride == chunkSize into
    *      [[DedupOps.paragraphDedup]] — one paragraph-keyed window +
    *      one doc-keyed groupBy)
    *   4. deterministic train/val/test assignment (the
    *      [[stratifiedSplit]] modulus rule, per-doc)
    *
    * Output: (doc_id, split, n_paras_kept, n_paras_dropped,
    * n_clean_tokens) for every surviving document. The quality filter
    * fuses into the scan (a projection predicate, zero shuffles); the
    * rest is a linear DAG of keyed shuffles (content-hash agg, keeper
    * semi-join, paragraph window, doc reassembly) with no collect, so
    * the composition runs at any corpus size exactly as its stages do
    * individually. Weights default to the g_quality_logit fixture
    * coefficients. */
  def curationPipeline(
      docs: DataFrame,
      chunkSize: Int = 8,
      logitThreshold: Double = 0.6,
      wNTokens: Double = 0.01,
      wMeanTokLen: Double = 0.2,
      wPunct: Double = -8.0,
      wStopword: Double = 0.15,
      bias: Double = -1.0): DataFrame = {
    // stage 1 fuses into the scan: the classifier is a projection, so the
    // filter costs zero shuffles (vs scoring into a frame and joining back)
    val kept1 = docs.filter(
      TextOps.qualityLogitExpr(col("text"), wNTokens, wMeanTokLen, wPunct, wStopword, bias)
        >= logitThreshold)
    val keepers = DedupOps.exact(kept1).select(col("keep_id").as("doc_id"))
    val kept2 = kept1.join(keepers, Seq("doc_id"))
    val cleaned = DedupOps.paragraphDedup(
      TextOps.chunkTokens(kept2, chunkSize, chunkSize),
      idxCol = "chunk_idx", paraCol = "chunk_text")
    cleaned
      .withColumn("split", splitExpr(col("doc_id")))
      .select(col("doc_id"), col("split"),
        col("n_kept").as("n_paras_kept"),
        col("n_dropped").as("n_paras_dropped"),
        when(col("clean_text") === "", lit(0))
          .otherwise(size(split(col("clean_text"), " "))).cast("int").as("n_clean_tokens"))
  }

  /** One row per (doc, shingle): k-token shingles via window lead();
    * documents shorter than k tokens contribute their whole text as a
    * single shingle (mirrors TextFns.shingles). NOT deduplicated. */
  def shingleRows(
      docs: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      hashed: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val toks = base.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "t")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val leads = (1 until k).map(j => lead(col("t"), j).over(w).as(s"t$j"))
    val parts = col("t") +: (1 until k).map(j => col(s"t$j"))
    // hashed mode hashes the SAME canonical string the unhashed mode emits
    // (space-joined tokens / whole text) — so a short doc equal to a k-gram
    // string collides across the two row shapes exactly like the string
    // mode would, and hashed vs string differ ONLY by xxhash64 collisions
    // (~n^2/2^65 expected false matches; see contamination scaladoc).
    val long = toks.select((col("doc_id") +: col("t") +: leads): _*)
      .filter(if (k == 1) lit(true) else col(s"t${k - 1}").isNotNull)
      .select(col("doc_id"),
        (if (hashed) xxhash64(concat_ws(" ", parts: _*)) else concat_ws(" ", parts: _*))
          .as("shingle"))
    val short = base.filter(size(split(col("text"), " ")) < k)
      .select(col("doc_id"),
        (if (hashed) xxhash64(col("text")) else col("text")).as("shingle"))
    long.unionByName(short)
  }

  /** Benchmark-contamination check: training documents sharing at least one
    * k-token shingle with the evaluation corpus, with the count of distinct
    * shared shingles. The eval side reduces to a distinct shingle set before
    * the join (it is the small side; size-based selection/AQE broadcasts it
    * when appropriate), the train side shuffles once on the shingle.
    *
    * `hashed = true` (the 100 TB path: 8 bytes/shingle through the shuffle)
    * is an approximation of the string mode: two distinct shingles may
    * collide under xxhash64 and report a false shared shingle — expected
    * collisions ~ |train|x|eval|/2^64, negligible for contamination
    * screening. Both row shapes hash the same canonical string
    * (shingleRows), so the approximation is collision-only. */
  def contamination(
      train: DataFrame,
      eval0: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      hashed: Boolean = true): DataFrame = {
    val evalShingles = shingleRows(eval0, k, idCol, textCol, hashed)
      .select(col("shingle")).distinct()
    shingleRows(train, k, idCol, textCol, hashed).distinct()
      .join(evalShingles, Seq("shingle"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-doc n-gram NOVELTY against a reference corpus — the
    * memorization-audit inverse of [[contamination]]: for every eval
    * document, the fraction of its DISTINCT k-shingles NOT present in
    * the reference corpus' distinct-shingle set. 1.0 = fully novel
    * text; near 0.0 = almost every n-gram was seen in training (a
    * memorization-suspect generation, or a leak). Exact count ratio,
    * 6-digit floor. Plan: per-doc distinct eval shingles LEFT-join the
    * train index once on the shingle key (8-byte hashed keys at scale
    * via `hashed = true` — the [[contamination]] collision analysis
    * carries); short docs (< k tokens) shingle to their whole text (the
    * shingleRows convention), so every doc gets a row. Output:
    * `(doc_id, n_shingles, n_seen, novelty_frac)`. */
  def noveltyScore(
      evalDocs: DataFrame,
      train: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      hashed: Boolean = true): DataFrame = {
    val trainShingles = shingleRows(train, k, idCol, textCol, hashed)
      .select(col("shingle")).distinct().withColumn("__hit", lit(1))
    shingleRows(evalDocs, k, idCol, textCol, hashed).distinct()
      .join(trainShingles, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_seen"))
      .select(col("doc_id"), col("n_shingles"), col("n_seen"),
        NumFns.floorAt(
          lit(1.0) - col("n_seen").cast("double") / col("n_shingles"), 6)
          .as("novelty_frac"))
  }

  /** Intra-document repetition: 1 - distinct/total k-token shingles
    * (0 = no repetition). The Gopher/RefinedWeb-style quality signal for
    * filtering boilerplate and degenerate generations. */
  def repetitionRatio(
      docs: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      hashed: Boolean = true): DataFrame =
    shingleRows(docs, k, idCol, textCol, hashed)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        countDistinct(col("shingle")).as("n_distinct"))
      .select(col("doc_id"), col("n_shingles"),
        NumFns.floorAt(lit(1.0) - col("n_distinct").cast("double") / col("n_shingles"), 4)
          .as("repetition"))

  /** The deterministic train/val/test assignment as a bare Column — the
    * single source of the modulus rule (stable across runs, engines and
    * partitionings: a modulus on the id, not a RNG), shared by
    * [[stratifiedSplit]]'s distribution check and [[curationPipeline]]'s
    * per-doc assignment so the two can never silently disagree. */
  def splitExpr(
      id: org.apache.spark.sql.Column,
      modulus: Int = 100,
      trainLt: Int = 90,
      valLt: Int = 95): org.apache.spark.sql.Column =
    when(pmod(id, lit(modulus)) < trainLt, "train")
      .when(pmod(id, lit(modulus)) < valLt, "val")
      .otherwise("test")

  /** Deterministic hash-free train/val/test split ([[splitExpr]]),
    * aggregated per (stratum, split) for distribution checks. */
  def stratifiedSplit(
      docs: DataFrame,
      stratumCol: String = "lang",
      idCol: String = "doc_id",
      modulus: Int = 100,
      trainLt: Int = 90,
      valLt: Int = 95): DataFrame =
    docs
      .withColumn("split", splitExpr(col(idCol), modulus, trainLt, valLt))
      .groupBy(col(stratumCol), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))

  /** Near-dup-aware (leakage-safe) train/val/test split: a document's side
    * is decided by its CLUSTER representative, not its own id, so a
    * near-duplicate pair can never straddle the train/test boundary — the
    * eval-contamination hole a row-hash split leaves open (the test half
    * of a duplicated page would grade the model on memorized training
    * text). `assignment` is a (doc_id, cluster_id) near-dup assignment
    * (e.g. [[DedupOps.nearDupClustersStar]] over MinHash pairs);
    * group_id = cluster_id for paired docs, the doc's own id for
    * singletons — both are doc ids, one permutation domain. The side
    * decision is the [[shuffleShards]] multiplicative permutation of
    * group_id (pure BIGINT arithmetic, overflow-safe for any id, so
    * Spark's wrapping and an oracle's trapping int64 agree bit-for-bit),
    * NOT the raw id: a raw-id modulus would correlate the side with crawl
    * order. One left join against the assignment (match-sized, hence
    * broadcastable at any corpus scale); the corpus never shuffles on
    * anything else, never feeds a window. */
  def leakageSafeSplit(
      docs: DataFrame,
      assignment: DataFrame,
      idCol: String = "doc_id",
      seed: Long = 0L,
      modulus: Int = 100,
      trainLt: Int = 90,
      valLt: Int = 95): DataFrame = {
    val P = 2147483647L
    val j = docs.select(col(idCol))
      .join(assignment.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("cluster_id"), col(idCol)))
    val side = (pmod(col("group_id"), lit(P)) * lit(62089911L) + lit(seed)) % lit(P)
    j.select(
      col(idCol), col("group_id"),
      when(pmod(side, lit(modulus)) < trainLt, "train")
        .when(pmod(side, lit(modulus)) < valLt, "val")
        .otherwise("test").as("split"))
  }

  /** Per-domain quota: keep the best `quota` documents of every domain —
    * the "cap every crawl domain, prefer the best pages" curation step
    * (C4/RefinedWeb keep per-domain caps so no single site dominates the
    * mix). "Best" = (orderCol DESC, id ASC); any scoring column plugs in.
    *
    * Two-phase so a mega-domain never serializes into one window task (the
    * same skew lesson as tokenPacking): phase 1 ranks within
    * (domain, salt) where salt = id mod saltBuckets — a doc ranked past
    * `quota` inside its salt slice cannot be in the domain's global
    * top-quota (its slice alone already holds `quota` better docs) — so
    * phase 2's window sees at most quota*saltBuckets rows per domain, a
    * bounded frame at any corpus size. Survivor ranks are identical to the
    * single-window formulation; a hot domain costs saltBuckets parallel
    * tasks instead of one. */
  def domainQuota(
      docs: DataFrame,
      quota: Int = 10,
      saltBuckets: Int = 8,
      domainCol: String = "source",
      orderCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    require(quota >= 1 && saltBuckets >= 1, "quota and saltBuckets must be >= 1")
    val salted = docs.withColumn("__salt", pmod(col(idCol), lit(saltBuckets)))
    val w1 = Window.partitionBy(col(domainCol), col("__salt"))
      .orderBy(col(orderCol).desc, col(idCol))
    val pruned = salted
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= quota)
    val w2 = Window.partitionBy(col(domainCol))
      .orderBy(col(orderCol).desc, col(idCol))
    pruned
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= quota)
      .select(col(idCol), col(domainCol), col(orderCol), col("rank"))
  }

  /** Per-domain quality-QUANTILE filter: keep each domain's top `keepFrac`
    * fraction of documents by the heuristic quality score — the
    * "threshold per domain, not globally" curation rule (a global cutoff
    * lets a high-quality domain crowd out a noisy-but-wanted one; the
    * per-domain quantile keeps the mix). The cutoff is a COUNT-derived
    * quota (`ceil(keepFrac · n_domain)` — one tiny per-domain aggregate,
    * broadcastable at any scale), so the selection is exact and
    * deterministic, not a sketch estimate; ties break on doc_id.
    *
    * Ranking reuses [[domainQuota]]'s two-phase salted window so a
    * mega-domain ranks in `saltBuckets` parallel tasks first: any row
    * whose true per-domain rank r is within the quota has salted rank
    * <= r, so phase 1 never drops a survivor — the proof is quota-value
    * independent and carries over unchanged to the dynamic per-domain
    * quota. Output: (doc_id, domain, q_score, rank). */
  def qualityQuantileFilter(
      docs: DataFrame,
      keepFrac: Double,
      saltBuckets: Int = 8,
      domainCol: String = "source",
      idCol: String = "doc_id"): DataFrame =
    scoreQuantileFilter(
      docs.select(
        col(idCol), col(domainCol),
        NumFns.floorAt(graft.functions.TextFns.qualityScore(col("text")), 4).as("q_score")),
      keepFrac, saltBuckets, domainCol, idCol, scoreCol = "q_score")

  /** [[qualityQuantileFilter]]'s machinery over an ARBITRARY pre-computed
    * score column — the reusable "keep each domain's top keepFrac by X"
    * selector (X = the heuristic quality score, a DSIR importance score,
    * a model logit, ...). Exact count-derived quota per domain, salted
    * two-phase ranking (a hot domain ranks in saltBuckets parallel tasks
    * first — each salt slice independently keeps its own top-quota, a
    * superset of the global top-quota's members in that slice — then the
    * survivors, at most quota*saltBuckets rows per domain, rank once);
    * ties break on the id, so the selection is deterministic in every
    * engine. */
  def scoreQuantileFilter(
      scored: DataFrame,
      keepFrac: Double,
      saltBuckets: Int = 8,
      domainCol: String = "source",
      idCol: String = "doc_id",
      scoreCol: String = "score"): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0, "keepFrac must be in (0, 1]")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val quotas = scored.groupBy(col(domainCol))
      .agg(ceil(lit(keepFrac) * count(lit(1)).cast("double")).cast("long").as("__quota"))
    val salted = scored
      .join(quotas, domainCol) // domain-cardinality build side — AQE broadcasts
      .withColumn("__salt", pmod(col(idCol), lit(saltBuckets)))
    val w1 = Window.partitionBy(col(domainCol), col("__salt"))
      .orderBy(col(scoreCol).desc, col(idCol))
    val w2 = Window.partitionBy(col(domainCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    salted
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= col("__quota"))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= col("__quota"))
      .select(col(idCol), col(domainCol), col(scoreCol), col("rank"))
  }

  /** DSIR end to end: score with [[importanceWeights]], length-normalize
    * in fixed point (`(score * 1e6) DIV n_tokens` — a raw sum only
    * rewards length), and keep the top `keepFrac` of the RAW pool by
    * that per-token score through [[scoreQuantileFilter]]'s salted
    * machinery (one global stratum — the selection is corpus-wide; pass
    * a real domain upstream for per-domain DSIR). Deterministic top-frac
    * is the reproducible variant of the paper's Gumbel-noise sampling:
    * same marginal selection pressure, bit-identical reruns. Target
    * docs are the DEFINITION of the target distribution, not selection
    * candidates — they are excluded from the pool. */
  def importanceSelect(
      docs: DataFrame,
      targetPred: org.apache.spark.sql.Column,
      keepFrac: Double,
      nBuckets: Int = 1024,
      saltBuckets: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    scoreQuantileFilter(
      importanceWeights(docs, targetPred, nBuckets, idCol = idCol, textCol = textCol)
        .filter(col("is_target") === 0L)
        .select(col(idCol), lit("all").as("__pool"),
          // the *1e6 length-normalization runs in DECIMAL(38,0): score
          // is a sum of per-token bucket weights that themselves scale
          // as (target_tokens+1)*1e6, so at large target corpora
          // score*1e6 can exceed Long range — the decimal intermediate
          // never wraps, and the DIV result (bounded by the max
          // per-token weight * 1e6) comes back as an exact LONG or
          // fails loudly rather than corrupting the ranking
          expr("(CAST(score AS DECIMAL(38,0)) * 1000000) DIV n_tokens")
            .as("score_pt")),
      keepFrac, saltBuckets, domainCol = "__pool", idCol = idCol, scoreCol = "score_pt")
      .select(col(idCol), col("score_pt"), col("rank"))

  /** Per-source corpus report — the "dataset card" numbers a
    * training-data release ships (docs/chars/tokens, distinct-content and
    * language cardinalities, mean quality): ONE aggregation pass over the
    * corpus, output is source-cardinality (driver/broadcast scale). The
    * two exact COUNT DISTINCTs expand the scan ×2; `approx = true` swaps
    * them for HLL++ (`approx_count_distinct`, mergeable fixed-size
    * state — no expand, the 100 TB mode when ±2% cardinalities are
    * acceptable; row shape unchanged, spec pins the error bound against
    * the exact card). The quality mean accumulates fixed-point
    * (`floor(q*1e4)` longs — the kmeansStep discipline), so the report is
    * bit-identical under any partitioning; the final division is one
    * exact op over identical operands in any engine. */
  /** The card's SUMMABLE per-source aggregates (n_docs, n_chars,
    * n_tokens, fixed-point quality sum) — shared verbatim between the
    * one-pass batch card and the streaming card's per-batch partials
    * ([[graft.streaming.StreamingOps.cardStream]]): long sums fold
    * associatively, so partial sums landed per micro-batch merge to
    * exactly the batch card's values. */
  private[graft] def cardSumCols: Seq[org.apache.spark.sql.Column] = {
    import graft.functions.TextFns
    Seq(
      count(lit(1)).as("n_docs"),
      sum(length(col("text")).cast("long")).as("n_chars"),
      sum(size(TextFns.tokens(col("text"))).cast("long")).as("n_tokens"),
      sum(floor(TextFns.qualityScore(col("text")) * lit(1e4)).cast("long")).as("__sum_q4"))
  }

  /** The card's mean-quality face over an aggregated frame holding
    * `__sum_q4` and `n_docs` — shared by both card paths so the final
    * double division is the same expression on both. */
  private[graft] def cardSelect(agg: DataFrame): DataFrame =
    agg.select(
      col("source"), col("n_docs"), col("n_chars"), col("n_tokens"),
      col("n_distinct_texts"), col("n_langs"),
      (col("__sum_q4").cast("double") / (lit(1e4) * col("n_docs"))).as("mean_quality"))

  def datasetCard(docs: DataFrame, approx: Boolean = false): DataFrame = {
    def distinctOf(c: org.apache.spark.sql.Column) =
      if (approx) approx_count_distinct(c) else countDistinct(c)
    val sums = cardSumCols
    cardSelect(docs
      .groupBy(col("source"))
      .agg(
        sums.head,
        (sums.tail ++ Seq(
          distinctOf(sha2(col("text"), 256)).as("n_distinct_texts"),
          distinctOf(col("lang")).as("n_langs"))): _*))
  }

  /** Hashed n-gram importance weights for data selection — the DSIR
    * recipe (Xie et al. 2023, arXiv:2302.03169) re-expressed with exact
    * integer arithmetic: score every document by how much its token
    * distribution looks like a TARGET slice of the corpus (the
    * high-quality / in-domain sample) versus the RAW rest. Features are
    * hashed token buckets (`pmod(polyFp(token), nBuckets)` — the
    * oracle-replayable rolling fingerprint; at 100 TB swap in xxhash64
    * for 8-byte keys, same plan); each bucket's weight is the
    * Laplace-smoothed target/raw ratio in fixed point
    * (`((t+1)*scale) DIV (r+1)` — integer division, so the weights and
    * every downstream sum are bit-identical across engines and
    * partitionings, where DSIR's log-ratio floats would drift with
    * accumulation order); a document's score is the sum of its tokens'
    * bucket weights. Selection = keep the top slice by
    * `score DIV n_tokens` (length-normalized), or feed the score into
    * [[qualityQuantileFilter]]'s per-domain quota machinery.
    *
    * Plan shape: token explode -> bucket projection (map-only) -> one
    * nBuckets-row aggregate (map-side combined; the frame is bounded by
    * nBuckets, never the corpus) -> broadcast join back -> per-doc sum.
    * Two shuffles total; nothing driver-side. */
  def importanceWeights(
      docs: DataFrame,
      targetPred: org.apache.spark.sql.Column,
      nBuckets: Int = 1024,
      scale: Long = 1000000L,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    import graft.functions.TextFns
    import graft.plans.GraftFunctions
    GraftFunctions.register(docs.sparkSession)
    val toks = docs.select(
      col(idCol),
      when(targetPred, lit(1L)).otherwise(lit(0L)).as("__t"),
      explode(TextFns.tokens(coalesce(col(textCol), lit("")))).as("__tok"))
      .withColumn("__b", pmod(GraftFunctions.polyFp(col("__tok")), lit(nBuckets.toLong)))
    val weights = toks.groupBy(col("__b")).agg(
      sum(col("__t")).as("__tc"),
      sum(lit(1L) - col("__t")).as("__rc"))
      .select(col("__b"),
        expr(s"((__tc + 1L) * ${scale}L) DIV (__rc + 1L)").as("__w"))
    toks.join(broadcast(weights), Seq("__b"))
      .groupBy(col(idCol))
      .agg(
        max(col("__t")).as("is_target"),
        count(lit(1)).as("n_tokens"),
        sum(col("__w")).as("score"))
  }

  /** Deterministic alpha-mixture sampling (alpha = 0.5): re-weight a
    * multi-source corpus so expected per-stratum counts follow
    * n_s^alpha instead of n_s — the standard rare-source upweighting /
    * dominant-source downsampling pass of multilingual training mixes.
    * Acceptance rate r_s = sqrt(n_min / n_s), normalized at the RAREST
    * stratum (which keeps everything): kept_s = n_s * r_s =
    * sqrt(n_min * n_s) ∝ sqrt(n_s). (A prior revision normalized at
    * n_max, putting every ratio >= 1 — the clamp absorbed it and NOTHING
    * was ever dropped on any input; the uniform per-source counts of the
    * test corpus made the oracle blind to it. The clamp stays as a
    * belt-and-suspenders.) Acceptance is a MODULUS on the id, not an RNG,
    * so the sample is stable across runs, engines and partitionings, and
    * the whole pass is two shuffles (per-stratum counts + the rate join —
    * the counts frame is strata-cardinality, AQE broadcasts it).
    *
    * sqrt, not pow(x, 0.5): sqrt is IEEE-exact and bit-identical in every
    * engine, pow is libm-dependent — the floor(r * 1e6) ppm boundary must
    * not flip between engines. */
  def mixtureSample(
      docs: DataFrame,
      stratumCol: String = "source",
      idCol: String = "doc_id",
      ppmModulus: Int = 1000000): DataFrame =
    temperatureSample(docs, sqrtDepth = 1, stratumCol, idCol, ppmModulus)

  /** Temperature-scaled mixture sampling, generalizing [[mixtureSample]]:
    * expected kept counts follow n_s^alpha with alpha = 1 - 1/2^sqrtDepth
    * (depth 1 = the alpha-0.5 mix; depth 2 = alpha 0.75 — gentler; each
    * extra depth halves the flattening). The exponent is realized as
    * sqrtDepth NESTED sqrts of n_min/n_s — every step IEEE-exact and
    * bit-identical across engines, where a pow() call is libm-dependent
    * (the ppm floor boundary must not flip between engines). Same
    * id-modulus acceptance and two-shuffle plan as [[mixtureSample]]. */
  def temperatureSample(
      docs: DataFrame,
      sqrtDepth: Int,
      stratumCol: String = "source",
      idCol: String = "doc_id",
      ppmModulus: Int = 1000000): DataFrame = {
    require(sqrtDepth >= 1, "sqrtDepth must be >= 1")
    val counts = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
    val nMin = counts.agg(min(col("n_docs")).as("n_min"))
    val ratio = col("n_min").cast("double") / col("n_docs").cast("double")
    val r = (1 to sqrtDepth).foldLeft(ratio)((c, _) => sqrt(c))
    val rates = counts.crossJoin(nMin)
      .withColumn("rate_ppm", least(lit(ppmModulus.toLong), floor(r * ppmModulus)))
      .select(col(stratumCol), col("n_docs"), col("rate_ppm"))
    docs.join(rates, Seq(stratumCol))
      .withColumn("sampled", pmod(col(idCol), lit(ppmModulus)) < col("rate_ppm"))
  }

  /** Greedy offset packing of documents into fixed token budgets: within
    * each stratum, documents (in id order) land in bin
    * floor(preceding_token_count / capacity) — the deterministic way to
    * build ~equal-budget training shards. (True first-fit bin packing is
    * inherently sequential; offset packing overshoots each bin by at most
    * one document.)
    *
    * The prefix sum is TWO-PHASE (round-2 verdict #6): a single
    * `Window.partitionBy(stratum)` would make each stratum one task — at
    * 100 TB "en" is most of the corpus sorted on one core. Instead:
    * documents are chunked by id range (`chunk = id div chunkSize`, order-
    * aligned with the id sort), phase 1 aggregates token totals per
    * (stratum, chunk) — map-side combined, tiny result — and turns them
    * into chunk offsets with a window over that TINY frame; phase 2 adds a
    * chunk-local running sum, windowed by (stratum, chunk), so parallelism
    * is the number of id chunks, not the number of strata. Bins are
    * identical to the one-window formulation because chunk boundaries
    * respect id order. */
  def tokenPacking(
      docs: DataFrame,
      capacity: Long,
      stratumCol: String = "lang",
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkSize: Long = 1L << 20): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(chunkSize > 0, "chunkSize must be positive")
    val base = docs.select(col(idCol), col(stratumCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("chunk", floor(col(idCol) / chunkSize))
    // phase 1: per-(stratum, chunk) totals -> exclusive chunk offsets.
    // The offset window runs over strata x chunks ROWS (corpus/chunkSize),
    // not the corpus — the only sequential-per-stratum step, and it is
    // driver-scale by construction.
    val wOff = Window.partitionBy(col(stratumCol)).orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = base.groupBy(col(stratumCol), col("chunk"))
      .agg(sum(col("n_tokens")).as("chunk_tokens"))
      .withColumn("chunk_offset",
        sum(col("chunk_tokens")).over(wOff) - col("chunk_tokens"))
      .select(col(stratumCol), col("chunk"), col("chunk_offset"))
    // phase 2: chunk-local running sum + the broadcast-size offset join
    // (no hint — AQE broadcasts the offsets frame when it is small)
    val wLocal = Window.partitionBy(col(stratumCol), col("chunk")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(offsets, Seq(stratumCol, "chunk"))
      .withColumn("cum", col("chunk_offset") + sum(col("n_tokens")).over(wLocal))
      .select(col(idCol), col(stratumCol), col("n_tokens"),
        // floor (not a truncating cast): DuckDB's CAST(double AS BIGINT)
        // rounds, Spark's truncates — floor() agrees on both engines
        floor((col("cum") - col("n_tokens")) / capacity).as("bin"))
  }

  /** Deterministic training-order shuffle: every document gets a
    * pseudo-random sort key and a shard via a fixed multiplicative
    * permutation mod the Mersenne prime 2^31-1 — `sort_key =
    * ((id mod P) * 62089911 + seed) mod P`, `shard = sort_key mod
    * nShards`. The map is a true permutation on [0, P), so reordering a
    * corpus by (shard, sort_key) is a reproducible global shuffle: same
    * seed -> same training order on any cluster, any partitioning, any
    * day — the property a training pipeline needs to resume or replicate
    * a run. All arithmetic stays inside signed-64 range for ANY id
    * (the id folds mod P first), so engines that trap on overflow and
    * engines that wrap agree bit-for-bit.
    *
    * Map-only — no shuffle, no window, nothing driver-side; the global
    * order is DECLARED by the key, not materialized by a sort. Writers
    * lay it out with [[writeTrainingShards]] (hash-sharded directories,
    * sorted within each file); readers consume shards independently. */
  def shuffleShards(
      docs: DataFrame,
      nShards: Int,
      seed: Long = 0L,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val P = 2147483647L
    val key = (pmod(col(idCol), lit(P)) * lit(62089911L) + lit(seed)) % lit(P)
    docs.withColumn("sort_key", key)
      .withColumn("shard", col("sort_key") % lit(nShards.toLong))
  }

  /** Exact token-budget prefix sample: take documents in the
    * deterministic [[shuffleShards]] permutation order until the running
    * token total reaches `budgetTokens` (the boundary document is kept,
    * so the sample is the MINIMAL prefix covering the budget — "give me
    * a uniformly-shuffled 50B-token slice of the corpus" without an RNG
    * and bit-identical on every run/engine/partitioning).
    *
    * A naive implementation is one global window (cum sum over the full
    * corpus order) — a single-task sort at 100 TB. This is the two-phase
    * exact equivalent: the key space is cut into `nRanges` CONTIGUOUS
    * key ranges (range = key DIV ceil(P/nRanges) — deterministic,
    * data-independent); phase 1 aggregates per-range token sums (an
    * nRanges-row frame, collected — bounded driver state); the driver
    * prefix-sums them to find the single BOUNDARY range where the budget
    * lands; phase 2 keeps every doc in earlier ranges map-only and
    * windows ONLY inside the boundary range (1/nRanges of the corpus —
    * size it so a slice sorts in one healthy task; the window is keyed
    * by a constant range id, which is exactly the bounded-skew story of
    * a single 2 TB sort vs a 100 TB one). Per-range sums compose
    * exactly: the boundary range's local cumsum offset by the earlier
    * ranges' total reproduces the global running sum, so the selection
    * equals the single-window truth row for row. */
  def tokenBudgetSample(
      docs: DataFrame,
      budgetTokens: Long,
      seed: Long = 0L,
      nRanges: Int = 64,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 0 && nRanges >= 1, "budgetTokens >= 0, nRanges >= 1")
    import graft.functions.TextFns
    val P = 2147483647L
    val rangeWidth = (P + nRanges - 1) / nRanges
    // pinned: the tokenized frame feeds the phase-1 totals collect AND
    // both phase-2 branches — unpinned, the corpus-wide tokenization
    // would run three times
    val keyed = Checkpoints.pin(docs.select(
      col(idCol),
      ((pmod(col(idCol), lit(P)) * lit(62089911L) + lit(seed)) % lit(P)).as("sort_key"),
      size(TextFns.tokens(coalesce(col(textCol), lit("")))).cast("long").as("n_tokens"))
      .withColumn("__r", expr(s"sort_key DIV ${rangeWidth}L")), reliable = false)
    // phase 1: per-range totals — an nRanges-row frame (bounded driver state)
    val totals = keyed.groupBy(col("__r")).agg(sum(col("n_tokens")).as("__sum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var cum = 0L
    var boundary = -1L
    var prevCum = 0L
    totals.foreach { case (r, s) =>
      if (boundary < 0) { if (cum + s >= budgetTokens) { boundary = r; prevCum = cum }; cum += s }
    }
    if (boundary < 0) keyed.select(col(idCol), col("sort_key"), col("n_tokens"))
    else {
      // phase 2: earlier ranges pass map-only; ONLY the boundary range sorts
      val before = keyed.filter(col("__r") < boundary)
      val wInRange = Window.partitionBy(col("__r")).orderBy(col("sort_key"), col(idCol))
      val atBoundary = keyed.filter(col("__r") === boundary)
        .withColumn("__cum", sum(col("n_tokens")).over(wInRange))
        .filter(lit(prevCum) + col("__cum") - col("n_tokens") < budgetTokens)
      before.select(col(idCol), col("sort_key"), col("n_tokens"))
        .unionByName(atBoundary.select(col(idCol), col("sort_key"), col("n_tokens")))
    }
  }

  /** Per-domain token-budget curation: keep each domain's BEST documents
    * (quality desc, id tiebreak) until the domain's kept token total
    * covers `budgetTokens` — the "equal token budget per source, filled
    * with the best material first" mixing rule (a doc-count quota treats
    * a 50-token doc like a 5000-token one; this one budgets what
    * training actually consumes). The boundary document is kept, so each
    * domain lands the MINIMAL quality-prefix covering its budget;
    * domains below the budget keep everything.
    *
    * The naive form is one cum-sum window per domain — a mega-domain
    * (half the corpus from one crawl) sorts in a single task. This is
    * the two-phase exact equivalent of [[tokenBudgetSample]], with the
    * quality score as the order and NO driver state at all: documents
    * bucket by quality range (`(10000 - q4) DIV width` — contiguous in
    * the sort order by construction); per-(domain, range) token sums
    * form a (domains × nRanges)-row frame; the running-total window runs
    * over THAT frame, classifying each range as keep-all (its whole span
    * fits the budget), drop (the budget is already covered), or the one
    * BOUNDARY range per domain; the classification broadcast-joins back,
    * keep-all/drop rows pass map-only, and only the boundary slice
    * (~1/nRanges of each domain) feeds the per-domain cum-sum window.
    * Range sums compose exactly (every doc with the same q4 shares a
    * range, and the in-range order extends the cross-range order), so
    * the selection equals the single-window truth row for row. */
  def domainTokenBudget(
      docs: DataFrame,
      budgetTokens: Long,
      nRanges: Int = 64,
      domainCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 0 && nRanges >= 1, "budgetTokens >= 0, nRanges >= 1")
    import graft.functions.TextFns
    val width = (10001 + nRanges - 1) / nRanges
    // q4 coalesced to 0: qualityScore is NULL on null/empty text (its
    // punct ratio divides by length), and a null q4 would fall out of the
    // __qr equi-join below while its range's tokens still inflated every
    // real range's running total — null-text docs instead sort LAST
    // (lowest quality) and stay budgeted like any other row. Pinned: the
    // frame feeds the range aggregate AND the classification join.
    val scored = Checkpoints.pin(docs.select(
      col(idCol), col(domainCol),
      coalesce(floor(TextFns.qualityScore(col(textCol)) * lit(1e4)).cast("long"), lit(0L))
        .as("q4"),
      size(TextFns.tokens(coalesce(col(textCol), lit("")))).cast("long").as("n_tokens"))
      .withColumn("__qr", expr(s"(10000L - q4) DIV ${width}L")), reliable = false)
    val ranges = scored.groupBy(col(domainCol), col("__qr"))
      .agg(sum(col("n_tokens")).as("__rsum"))
    val wD = Window.partitionBy(col(domainCol)).orderBy(col("__qr"))
    val marked = ranges
      .withColumn("__before", coalesce(
        sum(col("__rsum")).over(wD.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__cat",
        when(col("__before") + col("__rsum") <= budgetTokens, "all")
          .when(col("__before") >= budgetTokens, "none")
          .otherwise("bnd"))
    val joined = scored.join(
      broadcast(marked.select(col(domainCol), col("__qr"), col("__before"), col("__cat"))),
      Seq(domainCol, "__qr"))
    val out = Seq(col(idCol), col(domainCol), col("q4"), col("n_tokens"))
    val wB = Window.partitionBy(col(domainCol)).orderBy(col("q4").desc, col(idCol))
    joined.filter(col("__cat") === "all").select(out: _*)
      .unionByName(
        joined.filter(col("__cat") === "bnd")
          .withColumn("__cum", sum(col("n_tokens")).over(wB))
          .filter(col("__before") + col("__cum") - col("n_tokens") < budgetTokens)
          .select(out: _*))
  }

  /** Corpus drift report: the per-source deltas between two corpus
    * snapshots' [[datasetCard]]s — the "what changed in this release"
    * numbers (a source that doubled its docs but halved its distinct
    * texts is a duplication regression; a token count that moved without
    * a doc-count move is a truncation change). Full-outer join on the
    * source (appearing/disappearing sources report against zero), deltas
    * over the card's exact integer columns; output is strata-sized. */
  def cardDelta(before: DataFrame, after: DataFrame): DataFrame = {
    val b = datasetCard(before)
    val a = datasetCard(after)
    val cols = Seq("n_docs", "n_chars", "n_tokens", "n_distinct_texts", "n_langs")
    val joined = b.select(col("source") +: cols.map(c => col(c).as(s"b_$c")): _*)
      .join(a.select(col("source") +: cols.map(c => col(c).as(s"a_$c")): _*),
        Seq("source"), "full_outer")
    joined.select(
      col("source") +:
        cols.flatMap(c => Seq(
          coalesce(col(s"a_$c"), lit(0L)).as(s"$c"),
          (coalesce(col(s"a_$c"), lit(0L)) - coalesce(col(s"b_$c"), lit(0L)))
            .as(s"d_$c"))): _*)
  }

  /** Join-key skew report — the pre-flight diagnostic for any 100 TB
    * join/groupBy: per-key counts reduced to the numbers that decide a
    * partitioning strategy (row/key cardinalities, the heaviest key and
    * its count, and `skew_ppm` = max-key share relative to the uniform
    * share × 1e6 — 1_000_000 means perfectly uniform; 50_000_000 means
    * the hottest key is 50× its fair share and the plan wants salting /
    * AQE skew-join / a chunked window variant). Two aggregations: the
    * keyed count (map-side combined) and a single-row fold over the
    * counts frame. All integer arithmetic; the argmax tie-breaks to the
    * SMALLEST key via a struct-ordered max_by, so the report is
    * deterministic in every engine. */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    // pinned: the counts frame feeds the fold AND the argmax join
    val c = Checkpoints.pin(
      df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cnt")),
      reliable = false)
    val agg = c.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_keys"),
      coalesce(max(col("cnt")), lit(0L)).as("max_cnt"))
    // argmax via an equi-join on the count against the one-row fold (the
    // documented bounded-scalar class) — min() then tie-breaks in the
    // key's OWN ordering, so string/date/binary keys work; a numeric
    // negation trick would coerce or mis-order them
    val maxKey = c.join(agg.select(col("max_cnt")), col("cnt") === col("max_cnt"))
      .agg(min(col("k")).as("max_key"))
    agg.crossJoin(maxKey)
      .select(col("n_rows"), col("n_keys"), col("max_cnt"), col("max_key"),
        expr("CASE WHEN n_rows = 0 THEN 0L ELSE (max_cnt * n_keys * 1000000L) DIV n_rows END")
          .as("skew_ppm"))
  }

  /** Exact join-output cardinality — [[keySkewReport]]'s companion
    * pre-flight: |A ⋈ B| on an equi-key is EXACTLY the sum over shared
    * keys of the per-side count product, computable from the two keyed
    * count frames (distinct-key-sized — orders of magnitude smaller than
    * running the join) without materializing a single output row. The
    * report answers "is this join safe to run, and which side
    * broadcasts": est_rows explodes exactly when a hot key is hot on
    * BOTH sides — the case AQE only discovers after the shuffle is
    * already written. All-integer; one keyed agg per side + one
    * count-frame join. */
  def joinCardinality(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("lcnt"))
    val rc = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("rcnt"))
    lc.join(rc, Seq("k"))
      .agg(
        count(lit(1)).as("n_shared_keys"),
        sum(col("lcnt") * col("rcnt")).as("join_rows"),
        max(col("lcnt") * col("rcnt")).as("max_key_rows"))
      // empty key intersection -> a zero row, not nulls
      .select(
        coalesce(col("n_shared_keys"), lit(0L)).as("n_shared_keys"),
        coalesce(col("join_rows"), lit(0L)).as("join_rows"),
        coalesce(col("max_key_rows"), lit(0L)).as("max_key_rows"))
  }

  /** Exact per-group quantiles WITHOUT a per-group sort — the two-phase
    * counting trick ([[tokenBudgetSample]]/[[domainTokenBudget]]'s
    * machinery pointed at rank selection): the exact companion of the GK
    * sketch gate (`TextOps.quantileSketchGate` trades exactness for
    * fixed state; this trades a second pass for exactness). The quantile
    * at fraction p is the value at rank `ceil(p·n)` (1-indexed) in
    * (value, id) order. Values bucket by `value DIV bucketWidth`
    * (order-preserving, data-independent); per-(group, bucket) counts
    * form a small frame whose running totals locate each target rank's
    * bucket; ONLY those buckets' rows (one bucket per requested
    * quantile, ~1/nBuckets of each group) are ranked with a window. A
    * mega-group never sorts in one task and there is no driver state.
    * Values must be NON-NEGATIVE (integer DIV truncates toward zero, so
    * the bucket id is order-preserving only on [0, ∞) — lengths, counts,
    * byte sizes all qualify; shift signed values first). */
  /** Row-level precondition for the DIV-truncation operators: a negative
    * score would make `score DIV rangeWidth` non-monotone (truncation
    * toward zero maps [-w+1, w-1] onto range 0) and silently mis-bucket.
    * Enforced in the plan itself — `raise_error` inside a codegen'd CASE,
    * so the check costs no extra pass and fails loudly, named, at the
    * first offending row on any executor. NULL raises too: `null < 0`
    * is null (falsy), so a bare `c < 0` would wave a NULL score through
    * into a NULL range id — and Spark windows order NULLS FIRST while
    * DuckDB defaults LAST, the exact silent cross-engine mis-bucketing
    * class this guard exists to make loud. */
  private def requireNonNegative(c: Column, name: String, op: String): Column =
    when(c.isNull || c < 0, raise_error(concat(
      lit(s"$op: $name must be non-negative and non-null (DIV truncates "
        + "toward zero, so range ids stop being monotone; NULL orders "
        + "differently across engines) — shift signed scores first; got "),
      coalesce(c.cast("string"), lit("NULL"))))).otherwise(c)

  /** Exact rank-derived buckets over an integer score: every row gets
    * its 0-based global rank in `(score, id)` order and the bucket
    * `(rank · nBuckets) DIV n` — equal-size-by-rank strata (sizes differ
    * by at most one), deterministic in any engine. The corpus-wide rank
    * runs TWO-PHASE like [[exactQuantiles]]: per-score-range counts
    * (`range = score DIV rangeWidth`, order-preserving on non-negative
    * scores) roll into exclusive range offsets with one window over the
    * bounded range frame; row-level `row_number` windows partition by
    * range, so no score region serializes into one task; the total is a
    * 1-row broadcast. Scores must be NON-NEGATIVE (the
    * [[exactQuantiles]] truncation caveat).
    *
    * Output: `(idCol, scoreCol, bucket, rank)`. The reusable core of
    * quantile-strata selection and
    * [[graft.operators.AssemblyOps.curriculumManifest]]'s ordering. */
  def rankBuckets(
      scored: DataFrame,
      nBuckets: Int,
      scoreCol: String = "score",
      idCol: String = "doc_id",
      rangeWidth: Long = 64L): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    require(rangeWidth >= 1, "rangeWidth must be >= 1")
    val base = Checkpoints.pin(
      scored.select(col(idCol).as("__id"),
          requireNonNegative(col(scoreCol).cast("long"), scoreCol,
            "rankBuckets").as("__s"))
        .withColumn("__b", expr(s"__s DIV ${rangeWidth}L")), reliable = false)
    val wB = Window.orderBy(col("__b"))
    val rangeOffs = base.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__boff", coalesce(
        sum(col("__c")).over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__boff"))
    val total = base.agg(count(lit(1)).as("__n"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__s"), col("__id"))
    base.join(rangeOffs, Seq("__b")) // AQE broadcasts the bounded offsets
      .withColumn("__r", col("__boff") + row_number().over(wIn) - 1)
      .crossJoin(broadcast(total))
      .select(col("__id").as(idCol), col("__s").as(scoreCol),
        expr(s"(__r * ${nBuckets}L) DIV __n").as("bucket"),
        col("__r").as("rank"))
  }

  /** [[rankBuckets]] within each group — per-facet equal-size-by-rank
    * strata (per-language quality deciles, per-source curriculum bands):
    * every row gets its 0-based rank within ITS group in `(score, id)`
    * order and the bucket `(rank · nBuckets) DIV n_group`. Same
    * two-phase shape with every window partitioned one level deeper
    * (range offsets by group over the bounded (group × range) frame,
    * ranks by (group, range)); group totals are a group-cardinality
    * frame joined back (AQE broadcasts it). A mega-group never
    * serializes and no corpus-wide window exists at all. Scores must be
    * non-negative ([[rankBuckets]]'s truncation caveat).
    *
    * Output: `(groupCol, idCol, scoreCol, bucket, rank)`. */
  def rankBucketsByGroup(
      scored: DataFrame,
      nBuckets: Int,
      groupCol: String = "source",
      scoreCol: String = "score",
      idCol: String = "doc_id",
      rangeWidth: Long = 64L): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    require(rangeWidth >= 1, "rangeWidth must be >= 1")
    val base = Checkpoints.pin(
      scored.select(col(groupCol).as("__g"), col(idCol).as("__id"),
          requireNonNegative(col(scoreCol).cast("long"), scoreCol,
            "rankBucketsByGroup").as("__s"))
        .withColumn("__b", expr(s"__s DIV ${rangeWidth}L")), reliable = false)
    val wB = Window.partitionBy(col("__g")).orderBy(col("__b"))
    val rangeOffs = base.groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__boff", coalesce(
        sum(col("__c")).over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__g"), col("__b"), col("__boff"))
    val totals = base.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val wIn = Window.partitionBy(col("__g"), col("__b"))
      .orderBy(col("__s"), col("__id"))
    base.join(rangeOffs, Seq("__g", "__b"))
      .withColumn("__r", col("__boff") + row_number().over(wIn) - 1)
      .join(totals, Seq("__g")) // group-cardinality frame — AQE broadcasts
      .select(col("__g").as(groupCol), col("__id").as(idCol),
        col("__s").as(scoreCol),
        expr(s"(__r * ${nBuckets}L) DIV __n").as("bucket"),
        col("__r").as("rank"))
  }

  /** DPO/RLHF-style preference-pair assembly from a scored corpus: per
    * domain, the i-th BEST document pairs with the i-th WORST as
    * (chosen, rejected) — the standard top-vs-bottom construction for
    * preference training over quality-scored data. Ranks come from the
    * two-phase [[rankBucketsByGroup]] machinery (scores must be
    * non-negative longs, its DIV contract), so a mega-domain never
    * serializes into one task; the descending rank is the exact mirror
    * `n − rank`, and the pairing is an equi-join on (domain, i). The
    * strict score inequality drops uninformative pairs: equal-score
    * pairs carry no preference signal, the middle element of an odd
    * domain would pair with itself, and every i past the midpoint is
    * the reflection of an earlier pair. Deterministic in every engine
    * (ties rank by id on both sides). Output: `(domainCol, pair_rank,
    * chosen_id, chosen_score, rejected_id, rejected_score)`,
    * pair_rank 1-based from the extremes inward. */
  def preferencePairs(
      scored: DataFrame,
      domainCol: String = "source",
      idCol: String = "doc_id",
      scoreCol: String = "score",
      rangeWidth: Long = 64L): DataFrame = {
    val ranked = Checkpoints.pin(
      rankBucketsByGroup(scored, nBuckets = 1, domainCol, scoreCol, idCol,
        rangeWidth),
      reliable = false)
    val totals = ranked.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val withN = ranked.join(totals, Seq(domainCol)) // AQE broadcasts domains
    val chosen = withN.select(col(domainCol),
      (col("__n") - col("rank")).as("__i"), // best (rank n−1) → i = 1
      col(idCol).as("chosen_id"), col(scoreCol).as("chosen_score"))
    val rejected = withN.select(col(domainCol),
      (col("rank") + 1).as("__i"), // worst (rank 0) → i = 1
      col(idCol).as("rejected_id"), col(scoreCol).as("rejected_score"))
    chosen.join(rejected, Seq(domainCol, "__i"))
      .filter(col("chosen_score") > col("rejected_score"))
      .select(col(domainCol), col("__i").as("pair_rank"),
        col("chosen_id"), col("chosen_score"),
        col("rejected_id"), col("rejected_score"))
  }

  /** Bradley–Terry reward selection end to end over a slim evidence
    * frame `(doc_id, source, score, x0..x6)` — the [[preferencePairs]]
    * pairing, chosen−rejected feature diffs, the shared logit descent
    * on the diffs (y = 1 rows; the bias diff is identically 0), reward-
    * scoring of EVERY doc with the trained weights, and the per-source
    * top-`keepFrac` keep through [[scoreQuantileFilter]]. ONE
    * implementation serves the batch row, the streamed maintainer's
    * refresh, and the specs: all three must stay bit-equal (they share
    * one oracle hash), so the chain lives here exactly once. The
    * evidence is pinned once; everything downstream derives from the
    * pin (pairs, diffs, rewards — the corpus is never re-derived).
    * Output: `(doc_id, source, reward, rank)` — the kept rows. */
  def btRewardRank(evidence: DataFrame, steps: Int = 3,
      lrDen: Double = 4096.0, keepFrac: Double = 0.25,
      saltBuckets: Int = 4): DataFrame = {
    val xs = TextOps.LogitXCols
    val ev = Checkpoints.pin(
      evidence.select(col("doc_id") +: col("source") +: col("score") +:
        xs.map(col): _*),
      reliable = false)
    val pairs = preferencePairs(
      ev.select(col("doc_id"), col("source"), col("score")))
    val feats = ev.select(col("doc_id") +: xs.map(col): _*)
    val diffs = Checkpoints.pin(
      pairs
        .join(feats.select(col("doc_id").as("chosen_id") +:
          xs.map(c => col(c).as(s"c_$c")): _*), Seq("chosen_id"))
        .join(feats.select(col("doc_id").as("rejected_id") +:
          xs.map(c => col(c).as(s"r_$c")): _*), Seq("rejected_id"))
        .select(col("chosen_id").as("doc_id") +: lit(1.0).as("y") +:
          xs.map(c => (col(s"c_$c") - col(s"r_$c")).as(c)): _*),
      reliable = false)
    val w = TextOps.logitTrain(diffs, steps = steps, lrDen = lrDen)
    val rewards = TextOps.logitScoreFeatures(
        feats.withColumn("y", lit(1.0)), w)
      .select(col("doc_id"), col("logit").as("reward"))
    scoreQuantileFilter(
      rewards.join(ev.select(col("doc_id"), col("source")), Seq("doc_id")),
      keepFrac = keepFrac, saltBuckets = saltBuckets, scoreCol = "reward")
  }

  /** DoReMi-shaped domain-mixture reweighting via exponentiated
    * gradient (Xie et al., "DoReMi: Optimizing Data Mixtures Speeds Up
    * Language Model Pretraining", NeurIPS 2023 — the EG update,
    * simplified to a FIXED per-domain excess-loss signal rather than
    * re-training the proxy between steps): start uniform over domains,
    * then T times w_d ← w_d·exp(η·loss_d) / Σ. High-loss domains gain
    * training weight — the standard group-DRO direction.
    *
    * Engine-replayable: `lossCol` arrives as the quantized decimal the
    * caller computed ([[graft.operators.TextOps.logitLossPerDoc]]); the
    * per-domain mean is ONE double division of an exact decimal sum;
    * each EG step quantizes w·exp(η·loss) back to DECIMAL(18,8) before
    * the normalization sum (order-free — the ln-quantization discipline
    * applied to exp), and normalizes with one double division. All
    * iteration state is the DOMAIN frame (bounded, broadcast-sized);
    * the corpus is touched exactly once. Output:
    * `(domainCol, mean_loss, weight)`, both 6-digit floored. */
  def doremiWeights(
      perDocLoss: DataFrame,
      eta: Double = 1.0,
      steps: Int = 3,
      domainCol: String = "source",
      lossCol: String = "loss"): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val dLoss = Checkpoints.pin(
      perDocLoss.groupBy(col(domainCol))
        .agg((sum(col(lossCol)).cast("double") / count(lit(1))).as("__l")),
      reliable = false)
    var w = dLoss
      .crossJoin(broadcast(dLoss.agg(count(lit(1)).as("__d"))))
      .select(col(domainCol), col("__l"), (lit(1.0) / col("__d")).as("__w"))
    for (_ <- 1 to steps) {
      val m = w.select(col(domainCol), col("__l"),
        (col("__w") * exp(lit(eta) * col("__l"))).cast("decimal(18,8)").as("__m"))
      val tot = m.agg(sum(col("__m")).as("__t"))
      w = Checkpoints.pin(
        m.crossJoin(broadcast(tot))
          .select(col(domainCol), col("__l"),
            (col("__m").cast("double") / col("__t").cast("double")).as("__w")),
        reliable = false)
    }
    w.select(col(domainCol),
      NumFns.floorAt(col("__l"), 6).as("mean_loss"),
      NumFns.floorAt(col("__w"), 6).as("weight"))
  }

  def exactQuantiles(
      df: DataFrame,
      ps: Seq[Double],
      groupCol: String = "lang",
      valueCol: String = "n_chars",
      idCol: String = "doc_id",
      bucketWidth: Long = 64L): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0), "ps in (0, 1]")
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    // pinned: the frame feeds the bucket counts, the semi-join, and the
    // target window
    val vals = Checkpoints.pin(
      df.select(col(groupCol), col(idCol), col(valueCol).cast("long").as("__v"))
        .withColumn("__b", expr(s"__v DIV ${bucketWidth}L")), reliable = false)
    val counts = vals.groupBy(col(groupCol), col("__b")).agg(count(lit(1)).as("__c"))
    // one row per (group, requested fraction) whose target rank lands in
    // this bucket — the frame stays (groups × buckets × |ps|) small
    val targets = rankLocate(counts, ps, groupCol, "__b", "__c")
    val wB = Window.partitionBy(col(groupCol), col("__b"))
      .orderBy(col("__v"), col(idCol))
    pivotByFraction(
      vals.join(broadcast(targets.select(col(groupCol), col("__b")).distinct()),
          Seq(groupCol, "__b"), "left_semi")
        .withColumn("__rn", row_number().over(wB))
        .join(broadcast(targets), Seq(groupCol, "__b"))
        .filter(col("__rn") === col("__local")),
      ps, groupCol, "__v")
  }

  /** Locate, per (group, requested fraction), the counts-frame row that
    * contains rank `ceil(p·n)` (1-indexed) in `keyCol` order — the
    * rank-selection core shared by [[exactQuantiles]] (keys = value
    * buckets; the located bucket's rows are then windowed) and
    * [[graft.streaming.StreamingOps.readQuantiles]] (keys = exact values;
    * the located key IS the answer). Output: (group, key, p,
    * __local = rank − running-total-before). */
  private[graft] def rankLocate(counts: DataFrame, ps: Seq[Double],
      groupCol: String, keyCol: String, cntCol: String): DataFrame = {
    val wG = Window.partitionBy(col(groupCol)).orderBy(col(keyCol))
    counts
      .withColumn("__before", coalesce(
        sum(col(cntCol)).over(wG.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col(cntCol)).over(
        wG.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(groupCol), col(keyCol), col("__before"), col(cntCol), col("__n"),
        explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("__rank", ceil(col("p") * col("__n").cast("double")).cast("long"))
      .filter(col("__rank") > col("__before") &&
        col("__rank") <= col("__before") + col(cntCol))
      .select(col(groupCol), col(keyCol), col("p"),
        (col("__rank") - col("__before")).as("__local"))
  }

  /** Shared pivot-and-rename tail: one row per group, a `p<percent>`
    * column per requested fraction. */
  private[graft] def pivotByFraction(df: DataFrame, ps: Seq[Double],
      groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .pivot("p", ps.map(p => p: Any))
      .agg(first(col(valueCol)))
      .select(col(groupCol) +: ps.map(p => col(s"`$p`").as(s"p${(p * 100).round}")): _*)

  /** Log2-bucketed length histogram per domain — the release-diagnostics
    * companion of [[datasetCard]] (truncation/boilerplate pathologies
    * show up as spikes in a length histogram long before they move a
    * mean). The bucket is `length(bin(n_chars))` = floor(log2) + 1 —
    * EXACT integer bit-length in both engines, where floor(log2(x)) on
    * doubles can flip at power-of-two boundaries. One map-side-combined
    * aggregation; output is (domains × ~40 buckets) rows. */
  def lengthHistogram(docs: DataFrame, domainCol: String = "source"): DataFrame =
    docs.groupBy(col(domainCol), length(bin(col("n_chars"))).cast("long").as("len_bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("sum_chars"))

  /** Materialize the shuffled corpus as one directory per shard, rows
    * sorted by `sort_key` within each file — the physical layout a
    * trainer streams sequentially. Shard directories are written by a
    * `repartition(shard)` + `sortWithinPartitions`, so each shard's
    * rows land in one task's files in key order; no global sort, no
    * driver state, shard count = write parallelism. */
  def writeTrainingShards(
      docs: DataFrame,
      path: String,
      nShards: Int,
      seed: Long = 0L,
      idCol: String = "doc_id"): Unit =
    shuffleShards(docs, nShards, seed, idCol)
      .repartition(nShards, col("shard"))
      // shard leads the sort so the partitioned writer sees its required
      // ordering already satisfied and skips its own (unstable) re-sort —
      // otherwise a task holding two shards could destroy the key order
      .sortWithinPartitions(col("shard"), col("sort_key"), col(idCol))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard").parquet(path)

  /** Materialize the packed training shards: every (stratum, bin) from
    * tokenPacking becomes ONE row with its documents concatenated in id
    * order — the physical sequence a trainer consumes, with doc count and
    * token total for budget accounting. One hash aggregation over the
    * packing assignment; the in-group order is imposed by sort_array over
    * (id, text) structs, not by shuffle order, so the shard text is
    * deterministic under any partitioning. A shard is at most
    * capacity+1 documents' text — rows stay bounded by the bin capacity,
    * never by stratum size. */
  def packedSequences(
      docs: DataFrame,
      capacity: Long,
      stratumCol: String = "lang",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bins = tokenPacking(docs, capacity, stratumCol, idCol, textCol)
      .select(col(idCol), col(stratumCol), col("n_tokens"), col("bin"))
    bins.join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy(col(stratumCol), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        array_join(
          transform(
            sort_array(collect_list(struct(col(idCol).as("id"), col(textCol).as("t")))),
            x => x.getField("t")),
          " ").as("packed_text"))
  }

  // ───── cross-corpus comparison: exact overlap + bottom-k sketches ─────

  /** Exact pairwise source-overlap matrix over a content-identity column —
    * the "how much does crawl B re-crawl of crawl A" report that decides
    * whether two sources should be cross-deduped at all. The identity
    * unit is whatever `textCol` holds: whole documents, or (sharper in
    * practice) pre-split passages / shingles — feed [[TextOps.chunkTokens]]
    * output to measure passage-level overlap. A pair's overlap is the
    * number of distinct units present in BOTH sources; the full matrix
    * (including zero-overlap pairs) is emitted with Jaccard and both
    * directed containments in exact integer ppm.
    *
    * Shape: distinct (source, content) sets -> content-keyed inverted
    * index restricted to df >= 2 keys (only shared content generates
    * pair rows — the join is EQUI on the content key, never
    * sources × corpus) -> per-pair intersection counts -> left join onto
    * the strata² pair universe. `hashed = true` ships 8-byte xxhash64
    * content keys through the shuffles (the 100 TB mode; string mode
    * replays in the oracle). The pair universe is built by a broadcast
    * nested-loop cross of the per-source size frame against itself —
    * the documented bounded-BNLJ class (strata-sized operands, like the
    * dataset card's strata). Null-text rows carry no content identity
    * and are excluded on both engines. */
  def sourceOverlap(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      hashed: Boolean = false): DataFrame = {
    val key = if (hashed) xxhash64(col(textCol)) else col(textCol)
    val sets = Checkpoints.pin(
      docs.filter(col(textCol).isNotNull)
        .select(col(sourceCol).as("__src"), key.as("__key"))
        .distinct(), reliable = false)
    val sizes = sets.groupBy(col("__src")).agg(count(lit(1)).as("n"))
    val universe = broadcast(sizes.select(col("__src").as("source_a"), col("n").as("n_a")))
      .crossJoin(broadcast(sizes.select(col("__src").as("source_b"), col("n").as("n_b"))))
      .filter(col("source_a") < col("source_b"))
    val shared = sets.join(
      sets.groupBy(col("__key")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") >= 2).select(col("__key")),
      Seq("__key"), "left_semi")
    val inter = shared.select(col("__key"), col("__src").as("source_a"))
      .join(shared.select(col("__key"), col("__src").as("source_b")), Seq("__key"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("inter"))
    universe.join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .select(col("source_a"), col("source_b"), col("inter"), col("n_a"), col("n_b"),
        expr("(inter * 1000000L) DIV (n_a + n_b - inter)").as("jaccard_ppm"),
        expr("(inter * 1000000L) DIV n_a").as("contain_a_ppm"),
        expr("(inter * 1000000L) DIV n_b").as("contain_b_ppm"))
  }

  /** Exact bottom-k selection per group: the k smallest `valCol` values of
    * each group, without a per-group sort — the two-phase rank-selection
    * trick ([[exactQuantiles]] / [[domainTokenBudget]]) pointed at the
    * head of the order. Values bucket by range (`valCol DIV width`,
    * contiguous in the order by construction); per-(group, bucket) counts
    * form a bounded frame whose running total classifies each bucket as
    * keep-all, drop, or the one BOUNDARY bucket per group; only boundary
    * rows (~1/nBuckets of each group) are ranked. Input rows must be
    * DISTINCT on (group, value) and `valCol` must lie in [0, domain). */
  private[graft] def bottomKPerGroup(
      df: DataFrame,
      grpCol: String,
      valCol: String,
      k: Int,
      nBuckets: Int = 64,
      domain: Long = 1000000007L): DataFrame = {
    require(k >= 1 && nBuckets >= 1, "k >= 1, nBuckets >= 1")
    val width = (domain + nBuckets - 1) / nBuckets
    val rows = Checkpoints.pin(
      df.select(col(grpCol), col(valCol))
        .withColumn("__b", expr(s"$valCol DIV ${width}L")), reliable = false)
    val wG = Window.partitionBy(col(grpCol)).orderBy(col("__b"))
    val marked = rows.groupBy(col(grpCol), col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__before", coalesce(
        sum(col("__c")).over(wG.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__cat",
        when(col("__before") + col("__c") <= k, "all")
          .when(col("__before") >= k, "none").otherwise("bnd"))
    val joined = rows.join(
      broadcast(marked.select(col(grpCol), col("__b"), col("__before"), col("__cat"))),
      Seq(grpCol, "__b"))
    val wB = Window.partitionBy(col(grpCol), col("__b")).orderBy(col(valCol))
    joined.filter(col("__cat") === "all").select(col(grpCol), col(valCol))
      .unionByName(
        joined.filter(col("__cat") === "bnd")
          .withColumn("__rn", row_number().over(wB))
          .filter(col("__rn") + col("__before") <= k)
          .select(col(grpCol), col(valCol)))
  }

  /** Bottom-k (KMV / k-minimum-values) corpus signature per source: the k
    * smallest DISTINCT content fingerprints of each source's units
    * (`textCol` — whole documents or pre-split passages, like
    * [[sourceOverlap]]) —
    * a fixed-size, mergeable, fully DETERMINISTIC sketch of the source's
    * content set (min-k of a union is the min-k of the per-part min-ks,
    * and the fingerprint is the oracle-replayable char-level polynomial
    * hash, so a signature is a pure function of the content set: no seed
    * state, no RNG, bit-identical across engines and partitionings).
    * Output: (source, fp), at most k rows per source.
    *
    * Scale: one distinct shuffle on (source, fp) then [[bottomKPerGroup]]
    * — no per-source sort; downstream comparison work is O(strata² · k),
    * independent of corpus size. The fingerprinting itself is the native
    * codegen kernel (plans/PolyFingerprint). */
  def bottomKSignatures(
      docs: DataFrame,
      k: Int,
      sourceCol: String = "source",
      textCol: String = "text",
      nBuckets: Int = 64): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val fps = docs.filter(col(textCol).isNotNull)
      .select(col(sourceCol).as("source"),
        graft.plans.GraftFunctions.polyFp(col(textCol)).as("fp"))
      .distinct()
    bottomKPerGroup(fps, "source", "fp", k, nBuckets)
  }

  /** Pairwise source-similarity ESTIMATES from [[bottomKSignatures]]: for
    * each source pair, merge the two signatures, keep the k smallest
    * distinct fingerprints of the union, and count how many are present
    * in both — the standard KMV Jaccard estimator, here in exact integer
    * ppm. When a pair's union has at most k distinct fingerprints the
    * estimate IS the exact Jaccard of the fingerprint sets
    * ([[sourceOverlap]]'s truth up to hash collisions) — the sparse
    * regime the gate pins; at corpus scale the estimate's error is the
    * usual O(1/sqrt(k)).
    *
    * Everything here runs on signature frames: at most strata · k rows
    * in, strata² · 2k through the pair tagging — bounded by the sketch
    * parameter, never the corpus. */
  def bottomKJaccard(sigs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val srcs = sigs.select(col("source")).distinct()
    val pairs = broadcast(srcs.select(col("source").as("source_a")))
      .crossJoin(broadcast(srcs.select(col("source").as("source_b"))))
      .filter(col("source_a") < col("source_b"))
    val a = pairs.join(sigs.withColumnRenamed("source", "source_a"), Seq("source_a"))
      .select(col("source_a"), col("source_b"), col("fp"), lit(1).as("ia"), lit(0).as("ib"))
    val b = pairs.join(sigs.withColumnRenamed("source", "source_b"), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("fp"), lit(0).as("ia"), lit(1).as("ib"))
    val wP = Window.partitionBy(col("source_a"), col("source_b")).orderBy(col("fp"))
    a.unionByName(b)
      .groupBy(col("source_a"), col("source_b"), col("fp"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .withColumn("__rn", row_number().over(wP))
      .filter(col("__rn") <= k)
      .groupBy(col("source_a"), col("source_b"))
      .agg(
        count(lit(1)).as("n_sig"),
        count(when(col("ia") === 1 && col("ib") === 1, true)).as("overlap"))
      .select(col("source_a"), col("source_b"), col("n_sig"), col("overlap"),
        expr("(overlap * 1000000L) DIV n_sig").as("jaccard_est_ppm"))
  }

  // ───── UniMax mixture allocation ─────

  /** UniMax sampling allocation (Chung et al., "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual Pretraining",
    * arXiv 2304.09151): split a total token budget across sources as
    * UNIFORMLY as possible subject to a per-source repetition cap of
    * `epochCap` epochs — the principled alternative to temperature
    * sampling ([[temperatureSample]]) that never over-repeats a small
    * source. Formally: alloc_s = min(cap_s, θ) with cap_s = tokens_s ·
    * epochCap and the water level θ chosen so Σ alloc = min(budget,
    * Σ cap); the θ remainder (budget is integral) goes one token each to
    * the smallest-cap uncapped sources — fully deterministic, so both
    * engines agree to the token.
    *
    * Computed with NO driver state on the domains-sized frame: rank
    * sources by (cap, source); source i is capped iff
    * cap_i · (S − i + 1) ≤ budget − prefix_{i−1} (the waterfilling
    * condition, cross-multiplied; the product is evaluated in
    * DECIMAL(38,0) — at 100 TB cap · S overflows a Long). The windows run
    * over the per-source aggregate (domains rows, not documents); for a
    * domain cardinality that itself needs distribution, range-bucket the
    * frame first like [[domainTokenBudget]] does its quality ranges.
    * Output per source: n_tokens, cap_tokens, alloc_tokens, and
    * epochs_ppm = alloc · 1e6 DIV n_tokens (the repetition factor the
    * trainer applies). */
  def unimaxAllocation(
      docs: DataFrame,
      budgetTokens: Long,
      epochCap: Int,
      sourceCol: String = "source",
      textCol: String = "text",
      nTokensCol: Option[String] = None): DataFrame = {
    require(budgetTokens >= 0 && epochCap >= 1, "budgetTokens >= 0, epochCap >= 1")
    import graft.functions.TextFns
    // nTokensCol: allocate from a PRECOMPUTED per-doc token count (the
    // slim (id, source, n_tokens) frame a streaming re-manifest maintains)
    // instead of re-tokenizing text — same totals by construction when the
    // counts were produced by the same tokenizer expression
    val perDoc = nTokensCol match {
      case Some(n) => col(n).cast("long")
      case None => size(TextFns.tokens(coalesce(col(textCol), lit("")))).cast("long")
    }
    val caps = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(perDoc).cast("long").as("n_tokens"))
      .withColumn("cap", col("n_tokens") * epochCap)
    val wAsc = Window.orderBy(col("cap"), col("source"))
    val wAll = wAsc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val flagged = caps
      .withColumn("__i", row_number().over(wAsc).cast("long"))
      .withColumn("__S", count(lit(1)).over(wAll))
      .withColumn("__before", coalesce(
        sum(col("cap")).over(wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__flag", expr(
        s"CAST(cap AS DECIMAL(38,0)) * (__S - __i + 1)" +
          s" <= CAST(${budgetTokens}L AS DECIMAL(38,0)) - __before"))
      .withColumn("__m", coalesce(max(when(col("__flag"), col("__i"))).over(wAll), lit(0L)))
      .withColumn("__Pm", coalesce(
        max(when(col("__flag"), col("__before") + col("cap"))).over(wAll), lit(0L)))
      .withColumn("__U", col("__S") - col("__m"))
      .withColumn("__R", lit(budgetTokens) - col("__Pm"))
      .withColumn("__theta", when(col("__U") > 0, expr("__R DIV __U")).otherwise(lit(0L)))
      .withColumn("__rem", when(col("__U") > 0, expr("__R % __U")).otherwise(lit(0L)))
    // capped sources keep their cap; uncapped get the water level, the
    // remainder one token each to the smallest-cap uncapped ranks (the
    // first uncapped cap strictly exceeds θ, so θ+1 never breaches a cap)
    val alloc = flagged.withColumn("alloc",
      when(col("__i") <= col("__m"), col("cap"))
        .otherwise(col("__theta") +
          when(col("__i") - col("__m") <= col("__rem"), 1L).otherwise(0L)))
    alloc.select(col("source"), col("n_tokens"), col("cap").as("cap_tokens"),
      col("alloc").as("alloc_tokens"),
      when(col("n_tokens") > 0, expr("(alloc * 1000000L) DIV n_tokens"))
        .otherwise(lit(0L)).as("epochs_ppm"))
  }

  /** [[unimaxAllocation]] at DOMAIN-cardinality scale (per-URL-host mixing
    * → millions of sources): allocation identical to the token, with NO
    * unpartitioned domains-sized window anywhere (the single-window
    * variant's `Window.orderBy(cap, source)` moves every source to one
    * task). The two-phase rank-selection shape ([[domainTokenBudget]]'s
    * ranges, here over the cap order):
    *
    *  1. range-bucket sources by `cap DIV width` — width comes from one
    *     scalar max aggregate broadcast back in-DAG (no driver action),
    *     and the bucket id is monotone in cap, so bucket order extends
    *     the (cap, source) rank order;
    *  2. per-bucket counts and cap sums prefix-scan in ONE window over
    *     the BOUNDED (≤ nRanges+1 rows) bucket frame;
    *  3. each source's global rank `i` and prefix `before` assemble from
    *     its bucket's offsets plus a window PARTITIONED by bucket —
    *     domains-sized work, but distributed across buckets;
    *  4. the waterfilling cut (m, Pm) reduces to two scalar MAXIMA,
    *     because the capped set is a PREFIX of the ascending cap order —
    *     a map-side-combined aggregate, broadcast back.
    *
    * The per-source aggregate is pinned once; everything downstream is
    * projections, bounded-frame windows, bucket-local windows, and 1-row
    * broadcast joins. TemporalCurationSpec proves bit-equality with the
    * single-window variant on random domain counts. */
  def unimaxAllocationBucketed(
      docs: DataFrame,
      budgetTokens: Long,
      epochCap: Int,
      nRanges: Int = 64,
      sourceCol: String = "source",
      textCol: String = "text",
      reliable: Boolean = false): DataFrame = {
    require(budgetTokens >= 0 && epochCap >= 1 && nRanges >= 1,
      "budgetTokens >= 0, epochCap >= 1, nRanges >= 1")
    import graft.functions.TextFns
    val caps = Checkpoints.pin(
      docs.groupBy(col(sourceCol).as("source"))
        .agg(sum(size(TextFns.tokens(coalesce(col(textCol), lit(""))))).cast("long")
          .as("n_tokens"))
        .withColumn("cap", col("n_tokens") * epochCap),
      reliable)
    val width = caps.agg(
      (coalesce(floor(max(col("cap")) / nRanges).cast("long"), lit(0L)) + 1L).as("__w"))
    val bucketed = caps.crossJoin(broadcast(width)).withColumn("__b", expr("cap DIV __w"))
    val wB = Window.orderBy(col("__b")) // bounded: ≤ nRanges+1 bucket rows
    val offsets = bucketed.groupBy(col("__b"))
      .agg(count(lit(1)).as("__bn"), sum(col("cap")).as("__bsum"))
      .withColumn("__iOff", coalesce(
        sum(col("__bn")).over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__sOff", coalesce(
        sum(col("__bsum")).over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__iOff"), col("__sOff"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("cap"), col("source"))
    val ranked = Checkpoints.pin(
      bucketed.join(broadcast(offsets), Seq("__b"))
        .withColumn("__i", col("__iOff") + row_number().over(wIn).cast("long"))
        .withColumn("__before", col("__sOff") + coalesce(
          sum(col("cap")).over(wIn.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))),
      reliable)
    val flagged = ranked
      .crossJoin(broadcast(caps.agg(count(lit(1)).as("__S"))))
      .withColumn("__flag", expr(
        s"CAST(cap AS DECIMAL(38,0)) * (__S - __i + 1)" +
          s" <= CAST(${budgetTokens}L AS DECIMAL(38,0)) - __before"))
    val cut = flagged.agg(
      coalesce(max(when(col("__flag"), col("__i"))), lit(0L)).as("__m"),
      coalesce(max(when(col("__flag"), col("__before") + col("cap"))), lit(0L)).as("__Pm"))
    val alloc = flagged.crossJoin(broadcast(cut))
      .withColumn("__U", col("__S") - col("__m"))
      .withColumn("__R", lit(budgetTokens) - col("__Pm"))
      .withColumn("__theta", when(col("__U") > 0, expr("__R DIV __U")).otherwise(lit(0L)))
      .withColumn("__rem", when(col("__U") > 0, expr("__R % __U")).otherwise(lit(0L)))
      .withColumn("alloc",
        when(col("__i") <= col("__m"), col("cap"))
          .otherwise(col("__theta") +
            when(col("__i") - col("__m") <= col("__rem"), 1L).otherwise(0L)))
    alloc.select(col("source"), col("n_tokens"), col("cap").as("cap_tokens"),
      col("alloc").as("alloc_tokens"),
      when(col("n_tokens") > 0, expr("(alloc * 1000000L) DIV n_tokens"))
        .otherwise(lit(0L)).as("epochs_ppm"))
  }

  /** [[domainTokenBudget]] generalized to a PER-DOMAIN budget frame
    * (`budgets`: (domainCol, budget_tokens)) — the execution half of any
    * allocator: each budgeted domain keeps its best documents (quality
    * desc, id tiebreak) until its kept tokens cover ITS budget; the
    * boundary document is kept; domains absent from `budgets` are not
    * emitted; a zero budget keeps nothing. Identical two-phase shape —
    * the budget joins the bounded (domains × nRanges) range frame before
    * classification, so the per-document work is unchanged. */
  def domainTokenBudgetEach(
      docs: DataFrame,
      budgets: DataFrame,
      nRanges: Int = 64,
      domainCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(nRanges >= 1, "nRanges >= 1")
    import graft.functions.TextFns
    val width = (10001 + nRanges - 1) / nRanges
    val scored = Checkpoints.pin(docs.select(
      col(idCol), col(domainCol),
      coalesce(floor(TextFns.qualityScore(col(textCol)) * lit(1e4)).cast("long"), lit(0L))
        .as("q4"),
      size(TextFns.tokens(coalesce(col(textCol), lit("")))).cast("long").as("n_tokens"))
      .withColumn("__qr", expr(s"(10000L - q4) DIV ${width}L")), reliable = false)
    val ranges = scored.groupBy(col(domainCol), col("__qr"))
      .agg(sum(col("n_tokens")).as("__rsum"))
      .join(broadcast(budgets.select(col(domainCol), col("budget_tokens").as("__budget"))),
        Seq(domainCol))
    val wD = Window.partitionBy(col(domainCol)).orderBy(col("__qr"))
    val marked = ranges
      .withColumn("__before", coalesce(
        sum(col("__rsum")).over(wD.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__cat",
        when(col("__before") + col("__rsum") <= col("__budget"), "all")
          .when(col("__before") >= col("__budget"), "none")
          .otherwise("bnd"))
    val joined = scored.join(
      broadcast(marked.select(col(domainCol), col("__qr"), col("__before"), col("__budget"),
        col("__cat"))),
      Seq(domainCol, "__qr"))
    val out = Seq(col(idCol), col(domainCol), col("q4"), col("n_tokens"))
    val wB = Window.partitionBy(col(domainCol)).orderBy(col("q4").desc, col(idCol))
    joined.filter(col("__cat") === "all").select(out: _*)
      .unionByName(
        joined.filter(col("__cat") === "bnd")
          .withColumn("__cum", sum(col("n_tokens")).over(wB))
          .filter(col("__before") + col("__cum") - col("n_tokens") < col("__budget"))
          .select(out: _*))
  }

  /** UniMax end to end: [[unimaxAllocation]] decides each source's token
    * budget, [[domainTokenBudgetEach]] fills it with the source's best
    * documents — the full "mix the corpus for training" pass in one DAG.
    * An allocation above a source's own token count (epochCap > 1 head
    * room) keeps the whole source; the repetition factor is epochs_ppm
    * in the allocation report, applied at training time, not by
    * duplicating rows here. */
  def unimaxSelect(
      docs: DataFrame,
      budgetTokens: Long,
      epochCap: Int,
      nRanges: Int = 64,
      domainCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    domainTokenBudgetEach(
      docs,
      unimaxAllocation(docs, budgetTokens, epochCap, domainCol, textCol)
        .select(col("source").as(domainCol), col("alloc_tokens").as("budget_tokens")),
      nRanges, domainCol, idCol, textCol)
}
