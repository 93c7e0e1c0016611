package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.language.existentials // the (DataFrame, RDD[_]) pin-handle pairs

/** Scalable near-duplicate detection (SURVEY.md §2B q46–q47):
  * MinHash-LSH banding and SimHash fingerprinting.
  *
  * These are the 100 TB paths that replace q42's all-pairs-per-block
  * Jaccard: cost is O(docs · bands) for signature building plus
  * O(Σ bucket²) for candidate pairing — never O(n²) over the corpus.
  * Hashing uses md5 hex strings (identical lowercase output in Spark and
  * DuckDB), so the whole pipeline is portable SQL and oracle-checkable:
  * min() over hex strings is a valid uniform min-hash because the hex
  * encoding preserves byte order.
  */
object DedupExtOps extends OpModule {

  private val NumHashes = 8
  private val Bands = 4 // rows-per-band = 2

  /** THE hot-bucket cap — one constant shared by the declared pair query
    * (q46) and the cluster artifact's candidate graph ([[clusterTable]]
    * via [[candidatePairs]]), so the two can never disagree on the
    * candidate edge set: at production scale the cluster fixpoint would
    * otherwise run on exactly the quadratic boilerplate-bucket graph the
    * cap exists to prevent. At every test SF the largest band bucket is
    * 9 (spec-asserted in CorrectnessSpec, not just measured), so the cap
    * is a semantic no-op here and every oracle stays exact; the capped
    * regime itself is exercised on a constructed hot-bucket corpus. */
  private[graft] val HotBucketCap = 64

  /** q313's wedge-center degree cap: a hub neighbor contributes the
    * SMALLEST Adamic–Adar evidence (1/ln deg → 0) while costing deg²
    * wedge rows, so capping centers bounds the wedge join at cap² per
    * node with no material score loss — the standard AA pruning. */
  private[graft] val WedgeHubCap = 64

  /** One row per (doc, band) with a single composite band key
    * `bk = "<band>:<sig>"` — MinHash-LSH banding flattened to the
    * one-column form a persisted signature index buckets on. Docs
    * sharing any `bk` are near-dup candidates; rows-per-band =
    * nHashes/bands trades recall (more bands) against precision
    * (wider bands). Parameterized library surface — q46/q76/q82 run
    * the (8, 4) default; non-default widths are spec-tested.
    *
    * Banding is ONE codegen'd map expression per document (r9,
    * [[org.apache.spark.sql.graft.MinHashKernels]]): minhash_i(doc) =
    * min over 3-token shingles of the 4·i-nibble rotation of the
    * shingle's md5 hex (rotations of a uniform hash stay uniform; hex
    * order = byte order, so min is a valid min-hash per rotation — one
    * digest per shingle instead of nHashes). The pre-r9 formulation —
    * NGrams generate → md5 → groupBy(doc_id) with min-aggs → band
    * explode — computed the same thing through a per-shingle
    * aggregation and one (doc_id, minima) exchange; the kernel removes
    * both, keeps whole-stage codegen (the pure-HOF per-row alternative
    * measured ~14× slower: interpreted CodegenFallback), and is what
    * lets q109 band a stream statelessly. Equality with an independent
    * HOF reference is spec-asserted, and every consumer stays
    * DuckDB-oracled against the aggregate SQL formulation.
    *
    * `maxBucket` is the hot-bucket frequency guard (standard LSH
    * practice, the q87 df-cap discipline): a band bucket holding B
    * near-identical boilerplate docs — empty pages, templated text —
    * would emit B² candidate pairs, and at web scale one such bucket
    * is millions of rows ⇒ a 10¹²-pair self-join. Buckets larger than
    * the cap are dropped wholesale: past the size where near-dup
    * evidence is meaningful, a bucket is boilerplate, not signal (its
    * members are still caught by their OTHER, discriminative bands).
    * The guard's count-over-bucket window shuffles on the same `bk`
    * key every downstream self-join/probe uses, so it adds no extra
    * exchange of the corpus rows. The declared test-SF queries run
    * uncapped (oracle-equal by construction); the capped path is
    * spec-tested on a constructed hot-bucket corpus (bounded candidate
    * count, unchanged recall on non-boilerplate pairs). */
  private[graft] def bandKeys(docs: DataFrame, nHashes: Int = NumHashes,
                              bands: Int = Bands,
                              maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must allow pairs, got $maxBucket")
    val keyed = docs.select(col("doc_id"),
      explode(org.apache.spark.sql.graft.GraftFunctions
        .minhashBandKeys(split(col("text"), " "), nHashes, bands)).as("bk"))
    if (maxBucket == Int.MaxValue) keyed
    else keyed
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("bk")))
      .where(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
  }

  /** q324's exact AllPairs prefix-filter join (see its registry entry
    * for the full theorem/discipline docstring) — factored out so the
    * q338 recall attestation consumes the IDENTICAL certified pair
    * set (one truth definition across tiers, the q82/q108 rule).
    *
    * `assertCapNoop` (r13 ADVICE): the q46 HotBucketCap on prefix
    * postings is a declared boilerplate guard for the PRODUCTION tier
    * (q324) — but when this join serves as the CERTIFIED TRUTH of the
    * q338 recall attestation, a silently biting cap would drop true
    * pairs and inflate the reported recall, the exact metric the
    * attestation exists to report. With the flag set, any posting
    * past the cap raises instead of filtering (a codegen'd
    * raise_error guard on the already-computed posting count — zero
    * extra shuffle), so an over-cap corpus ABORTS the attestation
    * rather than attesting a lie. A no-op at every test SF (max
    * prefix posting 4 at sf0.1, spec-asserted by q324's cap test). */
  private def setsimPairs(s: SparkSession, d: String,
                          assertCapNoop: Boolean = false): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
    val (sh, shh) = pin(Tables(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 5)
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(sequence(0, size(ws) - 5),
          |  i -> concat_ws(' ', element_at(ws, i + 1),
          |    element_at(ws, i + 2), element_at(ws, i + 3),
          |    element_at(ws, i + 4), element_at(ws, i + 5))))"""
          .stripMargin)).as("t")))
    shh.count(); graft.PinScope.retain(shh)
    val (pref, ph) = pin(sh
      .withColumn("df", count(lit(1)).over(W.partitionBy("t")))
      .withColumn("n", count(lit(1)).over(W.partitionBy("doc_id")))
      .withColumn("r", row_number().over(
        W.partitionBy("doc_id").orderBy(col("df"), col("t"))))
      .where(col("r") <= col("n") - expr("(6 * n + 9) DIV 10") + 1)
      .withColumn("pn", count(lit(1)).over(W.partitionBy("t")))
      .where(if (assertCapNoop)
               when(col("pn") > HotBucketCap, expr(
                 s"""raise_error(concat('setsim truth tier: prefix posting for shingle "',
                    |  t, '" exceeds HotBucketCap=$HotBucketCap (', pn,
                    |  ' docs) - the certified pair set would be silently
                    | truncated; re-run with a wider cap or an exact
                    | uncapped pass'))""".stripMargin.replace("\n", "")))
                 .otherwise(lit(true))
             else col("pn") <= HotBucketCap)
      .select(col("doc_id"), col("t"), col("n")))
    ph.count(); graft.PinScope.retain(ph)
    val cand = pref.select(col("t"), col("doc_id").as("id_a"),
                           col("n").as("na"))
      .join(pref.select(col("t"), col("doc_id").as("id_b"),
                        col("n").as("nb")), Seq("t"))
      .where(col("id_a") < col("id_b") &&
             lit(10) * least(col("na"), col("nb")) >=
               lit(6) * greatest(col("na"), col("nb")))
      .select("id_a", "id_b", "na", "nb").distinct()
    cand
      .join(sh.select(col("doc_id").as("id_a"), col("t")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("t")),
            Seq("id_b", "t"))
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(count(lit(1)).as("inter_sh"))
      .withColumn("union_sh", col("na") + col("nb") - col("inter_sh"))
      .where(lit(10) * col("inter_sh") >= lit(6) * col("union_sh"))
      .select(col("id_a"), col("id_b"), col("inter_sh"),
              col("union_sh"),
              expr("(1000000 * inter_sh) DIV union_sh").as("jac_ppm"))
      .orderBy("id_a", "id_b")
  }

  /** q300/q340's 64-bit SimHash fingerprint fold — a PURE MAP: each
    * doc's 64 ±1 vote sums fold in one tight mapPartitions loop over
    * its own tokens (the q151 BpeDict typed-codec discipline) — no
    * token explode, no aggregation, no shuffle; a 5M-doc corpus
    * fingerprints as a map stage. Measured r13 against two aggregate
    * formulations (64 per-bit expressions; a long[64] typed
    * Aggregator): the per-doc loop wins because the alternatives push
    * the token stream through group-by machinery this fold never
    * needed. Byte-level nibbles = md5 hex chars (high nibble first),
    * the identical integers the oracle derives with strpos/substr
    * arithmetic. Returns (doc_id, fp: 64-char '0'/'1' string). */
  private[graft] def simhash64Fps(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val b = new Array[Long](64)
          for (tok <- text.split(" ", -1)) {
            val dig = md.digest(tok.getBytes("UTF-8"))
            var j = 0
            while (j < 16) {
              val v = if (j % 2 == 0) (dig(j / 2) >> 4) & 15
                      else dig(j / 2) & 15
              val base = j * 4
              var k = 0
              while (k < 4) {
                b(base + k) += ((v >> k) & 1) * 2 - 1; k += 1
              }
              j += 1
            }
          }
          val sb = new java.lang.StringBuilder(64)
          var p = 0
          while (p < 64) {
            sb.append(if (b(p) > 0) '1' else '0'); p += 1
          }
          (id, sb.toString)
        }
      }.toDF("doc_id", "fp")
  }

  /** q227/q341's winnowed minimizer stream — the PURE-MAP emission
    * (r13's reshape; r14: the codegen'd MinimizerHashes kernel
    * replaces the interpreted HOF chain — same 8-token grams, same
    * w=5 complete-window minima, distinct per doc; docs with < w
    * grams emit nothing). The gram stream never shuffles before the
    * minimizer-keyed join. */
  private def minimizerStream(docs: DataFrame, k: Int = 8,
                              win: Int = 5): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= k + win - 1)
      .select(col("doc_id"), explode(
        org.apache.spark.sql.graft.GraftFunctions.minimizerHashes(
          col("t"), k, win, shortDocGlobalMin = false)).as("m"))

  /** q227/q341's persisted corpus signature index: the WHOLE corpus's
    * winnowed minimizers as an m-bucketed table (q82's clusterTable
    * discipline — derive the expensive stream once per (session,
    * corpus), probe it many times). Distinct from q103's
    * `graft_minidx8` (train-split only, df ≤ 10-capped postings — a
    * decontamination semantic); this index is the uncapped full
    * stream, with the HotBucketCap applied by its CONSUMERS (a
    * posting-count window that rides the m bucketing, zero extra
    * exchange). */
  private def minPairIndexTable(s: SparkSession, d: String): String =
    graft.BucketedCache.ensure(s, d, "minpairidx",
      "m STRING, doc_id BIGINT", "m", 8) {
      minimizerStream(Tables(s, d, "documents")).select("m", "doc_id")
    }

  /** q340's persisted Hamming-band index: the EVEN corpus's 4×16-bit
    * pigeonhole band keys (composite `bk = "<band>:<bits>"`, q76's
    * one-column form) with the doc's full 64-bit fingerprint carried
    * on every row (so the probe verifies without a second lookup),
    * bucketed on bk. Postings past [[HotBucketCap]] drop WHOLESALE at
    * build (q300's boilerplate discipline, applied index-side where
    * an ahead-of-time index must apply it). Built once per (session,
    * corpus); the fingerprint fold runs only here. */
  private def hamIndexTable(s: SparkSession, d: String): String =
    graft.BucketedCache.ensure(s, d, "hamidx",
      "bk STRING, doc_id BIGINT, fp STRING", "bk", 8) {
      val fps = simhash64Fps(s, Tables(s, d, "documents")
                               .where(col("doc_id") % 2 === 0))
      val bands = (0 until 4).map(b =>
          fps.select(concat(lit(s"$b:"),
                            substring(col("fp"), b * 16 + 1, 16)).as("bk"),
                     col("doc_id"), col("fp")))
        .reduce(_ unionAll _)
      bands
        .withColumn("bn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("bk")))
        .where(col("bn") <= HotBucketCap).drop("bn")
    }

  /** q341's batch-vs-index minimizer pair probe (id_a, id_b,
    * n_shared) — factored so the q347 intake funnel consumes the
    * IDENTICAL pair set (one truth per tier, the q82/q108 rule).
    *
    * The batch side reads the INDEX's own odd-id rows (r15 ADVICE:
    * the persisted index already contains the odd half's minimizer
    * stream verbatim — [[minimizerStream]] emits distinct-per-doc, so
    * the index rows ARE the fresh derivation, row for row), instead
    * of re-tokenizing the odd corpus per probe. Besides dropping the
    * duplicate gram emission, this makes BOTH join inputs m-bucketed
    * scans of the same table: the probe join runs with zero exchanges
    * on either side. In production the roles split — the arriving
    * batch is NOT yet in the index and ships its freshly derived
    * stream (exactly [[minimizerStream]] over the batch), shuffled
    * once onto the index's m bucketing; the test geometry's "odd half
    * already indexed" just lets the declared query skip a re-derive
    * that changes no output bit. */
  private[graft] def minimizerIncPairs(s: SparkSession, d: String,
                                       batchMod: Int = 2): DataFrame = {
    // batchMod parameterizes the BATCH FRACTION for the r15 scale
    // sweep (the r14 verdict's #1: the O(batch) claim was only ever
    // measured at the declared half-corpus geometry): batch = ids ≡ 1
    // (mod batchMod) — 1/batchMod of the corpus, always a subset of
    // the odd half, so the even standing index stays authoritative.
    // The declared query's mod 2 is the identity case.
    val idx = s.table(minPairIndexTable(s, d))
    val batch = idx.where(col("doc_id") % batchMod === 1)
    val capped = idx
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("m")))
      .where(col("bn") <= HotBucketCap).drop("bn")
    batch.select(col("m"), col("doc_id").as("new_id"))
      .join(capped.hint("merge")
              .select(col("m"), col("doc_id").as("old_id")), Seq("m"))
      .where(col("old_id") =!= col("new_id") &&
             (col("old_id") % batchMod =!= 1 ||
              col("old_id") < col("new_id")))
      .select(least(col("new_id"), col("old_id")).as("id_a"),
              greatest(col("new_id"), col("old_id")).as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 2)
  }

  /** Exact 64-position Hamming distance between two 64-char '0'/'1'
    * fingerprint strings (r19 optimization). The original form — 64
    * per-position `CASE WHEN substr(a,i,1) <> substr(b,i,1)` terms —
    * builds a ~12k-node expression tree that exceeds the codegen
    * method budget and falls back to INTERPRETED evaluation: measured
    * 9.3 s for q300's 90k-candidate verify at sf0.1, 79% of the whole
    * query (guide §1.1: the stage census, not the guess). Packing
    * each 32-char half through conv(_, 2, 10) and counting
    * bit_count(xor) compares the identical bits in 6 codegen'd
    * integer ops — positions differ iff the corresponding bits of the
    * packed longs differ, so the count is equal BY CONSTRUCTION and
    * every consumer's oracle is untouched. */
  private[graft] def hamming64(fpa: Column, fpb: Column): Column = {
    def half(c: Column, off: Int) =
      conv(substring(c, off, 32), 2, 10).cast("long")
    (bit_count(half(fpa, 1).bitwiseXOR(half(fpb, 1))) +
      bit_count(half(fpa, 33).bitwiseXOR(half(fpb, 33)))).cast("long")
  }

  /** q340's batch-vs-index Hamming pair probe (id_a, id_b, hamming)
    * — factored for the q347 intake funnel (one truth per tier). */
  private[graft] def hammingIncPairs(s: SparkSession, d: String,
                                     batchMod: Int = 2): DataFrame = {
    // batchMod: see [[minimizerIncPairs]] — the r15 batch-fraction
    // sweep knob; mod 2 (the default) is the declared query.
    def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
    locally {
      val idxT = hamIndexTable(s, d)
      val (fps, h) = pin(simhash64Fps(s, Tables(s, d, "documents")
                                        .where(col("doc_id") % batchMod === 1)))
      h.count(); graft.PinScope.retain(h)
      val bands = (0 until 4).map(b =>
          fps.select(concat(lit(s"$b:"),
                            substring(col("fp"), b * 16 + 1, 16)).as("bk"),
                     col("doc_id"), col("fp")))
        .reduce(_ unionAll _)
      val capped = bands
        .withColumn("bn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("bk")))
        .where(col("bn") <= HotBucketCap).drop("bn")
      val newOld = capped
        .select(col("bk"), col("doc_id").as("id_b"), col("fp").as("fpb"))
        .join(s.table(idxT).hint("merge")
                .select(col("bk"), col("doc_id").as("id_a"),
                        col("fp").as("fpa")), Seq("bk"))
      val newNew = capped
        .select(col("bk"), col("doc_id").as("id_a"), col("fp").as("fpa"))
        .join(capped.select(col("bk"), col("doc_id").as("id_b"),
                            col("fp").as("fpb")), Seq("bk"))
        .where(col("id_a") < col("id_b"))
      val cand = newOld
        .select(least(col("id_a"), col("id_b")).as("id_a"),
                greatest(col("id_a"), col("id_b")).as("id_b"),
                when(col("id_a") < col("id_b"), col("fpa"))
                  .otherwise(col("fpb")).as("fpa"),
                when(col("id_a") < col("id_b"), col("fpb"))
                  .otherwise(col("fpa")).as("fpb"))
        .unionAll(newNew.select(col("id_a"), col("id_b"),
                                col("fpa"), col("fpb")))
        .distinct()
      cand.withColumn("hamming", hamming64(col("fpa"), col("fpb")))
        .where(col("hamming") <= 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash-LSH candidate pairs through [[bandKeys]] — shingle
    // (3-token), not unigram: the corpus vocabulary is small, so
    // unigram token sets barely discriminate documents; the shingle
    // space is |vocab|³ and recovers real near-dup structure. The
    // declared query runs WITH the production hot-bucket cap
    // (maxBucket = 64): at every test SF the largest band bucket is 9
    // (measured via the oracle engine), so the cap is a semantic no-op
    // here and the oracle stays exact — but the Σ bucket² guard knob is
    // part of the declared contract, not a spec-only path (the capped
    // regime itself is exercised on a constructed hot-bucket corpus in
    // CorrectnessSpec). The count-over-bucket window shuffles on the
    // same bk key the self-join uses, so the cap adds no extra
    // exchange of the corpus rows.
    "q46_dedup_minhash" -> { (s, d) =>
      val bk = bandKeys(Tables(s, d, "documents"), maxBucket = HotBucketCap)
      bk.select(col("bk"), col("doc_id").as("id_a"))
        .join(bk.select(col("bk"), col("doc_id").as("id_b")), Seq("bk"))
        .where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("n_bands"))
        .orderBy("id_a", "id_b")
    },

    // EXACT set-similarity join via prefix filtering (added r13) —
    // AllPairs (Bayardo, Ma & Srikant, WWW 2007), the algorithm that
    // closes the gap q46 leaves open: MinHash-LSH is probabilistic
    // (recall < 1 by design), while the prefix filter finds EVERY pair
    // with Jaccard ≥ t over the exact shingle sets and still never
    // goes corpus-quadratic. The theorem: order every doc's shingles
    // by one GLOBAL total order (df asc, shingle — rarest first) and
    // keep only the first |T| − ceil(t·|T|) + 1 as its PREFIX; two
    // docs with Jaccard ≥ t MUST share a prefix shingle (if all
    // prefix elements differ, the overlap is bounded below t). So
    // candidates = join on prefix shingles only — and those postings
    // are the RAREST tokens' postings, the filter's own bound. Plus
    // the length filter (10·min(n) ≥ 6·max(n): Jaccard ≤ min/max) and
    // the q46 HotBucketCap on prefix postings (boilerplate guard —
    // a semantic no-op at every test SF, so the full-join oracle
    // stays exact: TWO algorithms, ONE pair set, the q289
    // discipline). Shingles are FIVE-token (the q46 discriminative-
    // shingle lesson, one width further): on this small-vocabulary
    // corpus 3-token prefix postings pack to Σpn² ≈ 46M candidate
    // rows at 10× volume (225 s measured) while 5-token postings top
    // out at 4 (Σpn² 1.3M, 35× less) — and the qualifying pair sets
    // are IDENTICAL at every measured scale (near-dups share long
    // spans; width buys discrimination, not recall, here).
    // Verification joins candidates back to the full shingle sets for
    // exact intersection counts; jac_ppm is the q129 integer
    // fixed-point. Shuffles: shingle stream keyed twice (df-by-
    // shingle, rank-by-doc) with the prefix PINNED (three consumers),
    // candidate join on prefix shingle, verify join on doc keys —
    // all narrow, none corpus-quadratic.
    "q324_setsim_prefix" -> { (s, d) => setsimPairs(s, d) },

    // Cross-tier recall attestation (added r13) — the q214 pattern
    // applied to DEDUP: does the production MinHash-LSH tier (q46's
    // banding, the probabilistic scale path) actually CATCH the pairs
    // the exact tier certifies (q324's 5-gram Jaccard ≥ 0.6 join)?
    // One row: certified-true pair count, LSH candidate volume, hits,
    // misses, recall in ppm (integer fixed point, zero-truth guarded).
    // Both inputs are themselves fully-oracled operators — ONE truth,
    // TWO tiers, and the attestation is the number a pipeline owner
    // watches when tuning bands vs cost. Cost = the two constituent
    // pipelines + a semi-join on pair keys.
    "q338_lsh_recall" -> { (s, d) =>
      def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
      // truth tier runs with assertCapNoop: an over-cap corpus aborts
      // the attestation instead of silently inflating recall_ppm
      val (truth, th) = pin(setsimPairs(s, d, assertCapNoop = true)
                              .select("id_a", "id_b"))
      th.count(); graft.PinScope.retain(th)
      val (cand, ch) = pin(candidatePairs(Tables(s, d, "documents"),
                                          maxBucket = HotBucketCap))
      ch.count(); graft.PinScope.retain(ch)
      val hits = truth.join(cand, Seq("id_a", "id_b"), "left_semi")
      truth.agg(count(lit(1)).as("true_pairs"))
        .crossJoin(hits.agg(count(lit(1)).as("caught")))
        .crossJoin(cand.agg(count(lit(1)).as("lsh_candidates")))
        .select(col("true_pairs"), col("caught"),
                (col("true_pairs") - col("caught")).as("missed"),
                expr("CASE WHEN true_pairs = 0 THEN 0 " +
                     "ELSE (1000000 * caught) DIV true_pairs END")
                  .as("recall_ppm"),
                col("lsh_candidates"))
    },

    // 16-bit SimHash from the first 4 md5 nibbles of each token; output
    // one row per doc with its fingerprint and fingerprint-bucket size.
    "q47_dedup_simhash" -> { (s, d) =>
      val t = Tables(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("h", md5(col("tok")))
      val bitSums = (0 until 16).map { p =>
        val j = p / 4 + 1 // hex char index (1-based)
        val pw = 1 << (p % 4)
        sum(expr(s"((instr('0123456789abcdef', substr(h, $j, 1)) - 1) DIV $pw) % 2 * 2 - 1"))
          .as(s"s$p")
      }
      val fps = t.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          concat((0 until 16).map(p =>
            when(col(s"s$p") > 0, "1").otherwise("0")): _*).as("fp"))
      // bucket size via a window on fp — one shuffle, instead of
      // recomputing the whole fingerprint pipeline for a groupBy + join
      fps.withColumn("bucket_size",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
        .select("doc_id", "fp", "bucket_size")
        .orderBy("doc_id")
    },

    // 64-bit SimHash Hamming-distance join (added r13) — the dedup
    // axis q47 OPENS but does not finish: q47 buckets exact-equal
    // 16-bit fingerprints, which misses the near-duplicate whose
    // fingerprint differs by a couple of bits — precisely the pairs
    // SimHash exists to find. This is the Manku et al. 2007 (WWW,
    // the Google crawl-dedup paper) production design: 64-bit
    // fingerprint (per-token md5 nibbles 1-16 as ±1 bit votes),
    // Hamming radius k = 3, and the PIGEONHOLE multi-index — split
    // the fingerprint into k+1 = 4 bands of 16 bits; two fingerprints
    // within Hamming 3 agree EXACTLY on at least one band (3 flipped
    // bits cannot touch all 4 bands), so equal-band buckets are a
    // complete candidate set and the exact 64-position Hamming count
    // verifies each candidate. Scale shape: fingerprints are ONE
    // token-scan aggregate (64 map-side-combined sign sums, pinned);
    // banding is 4 narrow projections of the pinned table; band
    // buckets carry ~corpus/2^16 docs each and the q46 hot-bucket cap
    // bounds template-mass buckets; the verify join touches only
    // candidates — never corpus². All-integer ⇒ hash-exact oracle.
    "q300_simhash_hamming" -> { (s, d) =>
      def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
      val (fp, h) = pin(simhash64Fps(s, Tables(s, d, "documents")))
      h.count(); graft.PinScope.retain(h)
      val bands = (0 until 4).map(b =>
          fp.select(col("doc_id"), lit(b).as("band"),
                    substring(col("fp"), b * 16 + 1, 16).as("bk")))
        .reduce(_ unionAll _)
      val capped = bands
        .withColumn("bn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("band", "bk")))
        .where(col("bn") <= HotBucketCap).drop("bn")
      val cand = capped
        .select(col("band"), col("bk"), col("doc_id").as("id_a"))
        .join(capped.select(col("band"), col("bk"),
                            col("doc_id").as("id_b")), Seq("band", "bk"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      cand
        .join(fp.select(col("doc_id").as("id_a"), col("fp").as("fpa")),
              Seq("id_a"))
        .join(fp.select(col("doc_id").as("id_b"), col("fp").as("fpb")),
              Seq("id_b"))
        .withColumn("hamming", hamming64(col("fpa"), col("fpb")))
        .where(col("hamming") <= 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy("id_a", "id_b")
    },

    // Incremental Hamming dedup — batch vs PERSISTED band index (added
    // r14, the r13 verdict's #3: q300 is the honest full-rescan
    // attestation tier — 52.8 s at 100× because every invocation
    // re-fingerprints and re-bands the whole corpus). The q76/q103
    // batch-vs-index discipline applied to the SimHash family: the
    // even corpus fingerprints and bands ONCE into [[hamIndexTable]]
    // (composite band keys, fp carried on the row, postings
    // HotBucketCap'd at build); the day's batch (odd ids)
    // fingerprints in one map pass, bands, caps its own buckets, and
    // probes the index with a merge join that never re-shuffles the
    // index side (plan-asserted) — plus the batch×batch self-join.
    // Exact 64-position Hamming ≤ 3 verifies candidates from the
    // carried fingerprints, no second lookup. Per-release cost is
    // O(batch) fingerprinting + posting-bounded joins; the corpus is
    // fingerprinted exactly once per corpus, not once per release.
    // Oracle: the full both-sides computation restated inline — the
    // artifact must be semantically invisible.
    "q340_hamming_incremental" -> { (s, d) =>
      hammingIncPairs(s, d).orderBy("id_a", "id_b")
    },


    // Incremental dedup — the operation a training-data pipeline runs
    // daily: a NEW batch of documents (odd doc_ids here) is deduped
    // against a PERSISTED band-signature index built once from the
    // existing corpus (even doc_ids), never by re-banding the whole
    // corpus. The index is a bucketed table on the band key, so the
    // index side of the probe join reads its buckets with NO shuffle —
    // at 100 TB the daily cost is O(batch) banding + one batch-side
    // shuffle, while the corpus index is written once and only ever
    // read. New×new candidates come from a batch self-join (the batch
    // is small relative to the corpus). Both joins emit one row per
    // shared band; the pair count is the LSH candidate strength.
    "q76_dedup_incremental" -> { (s, d) =>
      val idxT = bandIndexTable(s, d)
      val batch = bandKeys(
        Tables(s, d, "documents").where(col("doc_id") % 2 === 1))
        .select(col("bk"), col("doc_id").as("new_id"))
      val index = s.table(idxT).select(col("bk"), col("doc_id").as("old_id"))
      val newVsOld = batch.join(index.hint("merge"), Seq("bk"))
        .select(least(col("new_id"), col("old_id")).as("id_a"),
                greatest(col("new_id"), col("old_id")).as("id_b"))
      val newVsNew = batch
        .join(batch.select(col("bk"), col("new_id").as("other_id")), Seq("bk"))
        .where(col("new_id") < col("other_id"))
        .select(col("new_id").as("id_a"), col("other_id").as("id_b"))
      newVsOld.unionAll(newVsNew)
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("n_bands"))
        .orderBy("id_a", "id_b")
    },

    // Dedup CLUSTERING (added r5; persisted r8) — the step that turns
    // q46's candidate PAIRS into duplicate GROUPS: connected components
    // over the candidate graph, cluster id = min doc_id in the
    // component (the representative a pipeline keeps). Iterative
    // min-label propagation: each round is one shuffle join
    // (edges ⋈ labels) + one min-aggregation, repeated until a fixpoint
    // — O(diameter) rounds, and LSH candidate components are
    // near-cliques so the diameter is tiny. Each round is pinned on an
    // explicit persisted RDD that truncates the growing plan; the
    // previous round's blocks are freed once the convergence count is
    // done (at cluster scale: reliable checkpoint dir instead, or the
    // alternating large-star/small-star variant — same join+agg
    // primitives, O(log n) rounds, declared as q102). The driver
    // touches only the convergence COUNT, never the data.
    //
    // The fixpoint output is a persisted ARTIFACT, not a transient plan
    // (see [[clusterTable]]): computed once per (session, corpus) and
    // written as a doc_id-bucketed table that q83 (keep-best) — and any
    // downstream reporting — probes without re-running the most
    // expensive job in the pipeline. Oracle: DuckDB recursive-CTE
    // reachability with the same min-per-component reduction.
    "q82_dedup_clusters" -> { (s, d) =>
      s.table(clusterTable(s, d)).orderBy("doc_id")
    },

    // The O(log n) large-star/small-star clustering variant as a
    // DECLARED query (r7 verdict: "no dark code paths in the
    // components family") — same candidate graph, same persisted-
    // artifact discipline, same oracle as q82 (the two variants
    // produce identical (doc_id, cluster_id) tables; equivalence is
    // additionally property-tested on long-path graphs where their
    // round counts diverge). A pipeline picks minlabel for LSH
    // near-cliques (diameter 2-3) and star for long-chain graphs
    // (cross-snapshot link graphs, incremental crawls).
    "q102_clusters_star" -> { (s, d) =>
      s.table(clusterTable(s, d, variant = "star")).orderBy("doc_id")
    },

    // Dedup threshold attestation (added r12) — q214's knob-tuning
    // discipline applied to the DEDUP family: before a pipeline picks
    // its near-dup Jaccard cutoff, this reports, for each candidate
    // threshold (0.01 / 0.5 / 0.95 — spanning the corpus's bimodal
    // candidate-Jaccard distribution), how many LSH candidate pairs an
    // exact shingle-Jaccard confirms, and the banding's precision at
    // that cutoff — the measured table that justifies both the LSH
    // parameters and the production threshold. ONE banding pass + ONE
    // exact scoring pass serve all thresholds (the 3-row knob table
    // crosses the scored pairs); scoring is pair-bounded (intersection
    // via a (pair, shingle) join over per-doc DISTINCT shingle-md5
    // sets — never corpus-quadratic, the pairs came from the capped
    // banding). Jaccard is a single IEEE division of exact integer
    // set sizes, engine-identical.
    "q218_dedup_threshold_sweep" -> { (s, d) =>
      import s.implicits._
      val docs = Tables(s, d, "documents")
      val bk = bandKeys(docs, maxBucket = HotBucketCap)
      val cand = bk.select(col("bk"), col("doc_id").as("id_a"))
        .join(bk.select(col("bk"), col("doc_id").as("id_b")), Seq("bk"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      val sh = docs.select(col("doc_id"),
          org.apache.spark.sql.graft.GraftFunctions
            .ngrams(split(col("text"), " "), 3).as("g"))
        .select(col("doc_id"), md5(col("g")).as("m")).distinct()
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cand
        .join(sh.select(col("doc_id").as("id_a"), col("m")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("m")),
              Seq("id_b", "m"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("ni"))
      val scored = cand.join(inter, Seq("id_a", "id_b"), "left")
        .join(broadcast(cnt.select(col("doc_id").as("id_a"),
                                   col("n").as("na"))), Seq("id_a"))
        .join(broadcast(cnt.select(col("doc_id").as("id_b"),
                                   col("n").as("nb"))), Seq("id_b"))
        .select((coalesce(col("ni"), lit(0L)).cast("double") /
                 (col("na") + col("nb") -
                  coalesce(col("ni"), lit(0L))).cast("double"))
                  .as("jac"))
      val candN = cand.agg(count(lit(1)).as("candidate_pairs"))
      scored.crossJoin(broadcast(Seq(0.01, 0.5, 0.95).toDF("threshold")))
        .groupBy("threshold")
        .agg(sum(when(col("jac") >= col("threshold"), 1L).otherwise(0L))
               .as("confirmed_pairs"))
        .crossJoin(broadcast(candN))
        .select(col("threshold"), col("candidate_pairs"),
                col("confirmed_pairs"),
                round(col("confirmed_pairs").cast("double") /
                      col("candidate_pairs"), 6).as("precision"))
        .orderBy("threshold")
    },

    // Cross-document repeated-substring report (added r12) — the
    // EXACT-SUBSTRING dedup axis (Lee et al. 2021, "Deduplicating
    // Training Data Makes Language Models Better"): document-level
    // dedup (q41/q46) misses the license header / navigation chrome /
    // quoted-reply text that repeats INSIDE otherwise-distinct
    // documents, which is precisely the text an LM memorizes first.
    // Per ingest source: how many 8-token windows are covered by a
    // span that also occurs verbatim in ANOTHER document, and what
    // fraction of the source that is — the measured signal that
    // decides whether a substring-level pass (suffix-array style) is
    // worth running. Distinct from q84 (repetition WITHIN one doc) and
    // q96 (overlap vs an external benchmark): this is intra-corpus,
    // cross-doc.
    //
    // Scale shape: the gram stream is a generator flatMap (NGrams →
    // md5 — no tokenized-corpus shuffle, ~|tokens| narrow rows),
    // derived TWICE and deliberately NEVER pinned: it is corpus-sized,
    // and caching a corpus-sized intermediate is exactly what blows an
    // executor heap at volume (the pinned first cut OOMed at the 100×
    // sweep) — re-running a cheap projected flatMap beats materializing
    // it, at any scale. Pass 1 builds the duplicated-hash set: a
    // groupBy(h) with a distinct-doc count ≥2 (one hash-keyed shuffle,
    // map-side partial). Pass 2 left-joins the dup flag on the SAME h
    // key (co-partitioned with pass 1's output) and folds per-doc
    // totals AND dup counts in ONE (doc, source) aggregate. Never
    // pairwise: cost is O(grams), not O(docs²) — a 10¹⁰-gram corpus
    // stays a counts problem. Docs shorter than 8 tokens have no
    // window and are out of scope by declared semantics (filtered
    // identically in both engines).
    // Minimizer-signature candidate pairs (added r12) — the PAIR
    // generator for substring-level dedup, q219's missing half: q219
    // MEASURES cross-doc repeated spans; this finds WHICH doc pairs
    // share them, at a fraction of the index cost. The minimizer
    // scheme (Roberts et al. 2004 — the genomics workhorse behind
    // minimap2, applied here to token 8-grams): a gram hash is kept
    // only if it is the MINIMUM of some w=5 consecutive gram window,
    // so any two documents sharing an ≥ (k+w−1)-token verbatim span
    // share a minimizer BY CONSTRUCTION (same window ⇒ same minimum —
    // deterministic recall for long spans, unlike MinHash's
    // probabilistic recall), while the persisted signature carries
    // ~2/(w+1) of the gram stream (spec-asserted < 1/2 here). Pairs
    // sharing ≥2 distinct minimizers survive (single-minimizer pairs
    // are mostly the hash floor). Scale shape: per-doc windowed min =
    // one doc_id-keyed window (grams never shuffle globally), the
    // signature join rides one minimizer-keyed shuffle with the q46
    // HOT-BUCKET CAP (a boilerplate minimizer shared by B docs would
    // emit B² pairs; past the cap it is template noise, and long-span
    // evidence survives through the pair's OTHER minimizers), and the
    // pair aggregate is candidate-bounded — never corpus-quadratic.
    // Since r14 the signature stream is a PERSISTED artifact
    // ([[minPairIndexTable]], the q82 clusterTable discipline): the
    // corpus's winnowed minimizers derive ONCE (the same pure-map HOF
    // emission, now at build time) into an m-bucketed table; the
    // declared query caps postings with a window that RIDES the m
    // bucketing (zero extra exchange) and self-joins bucket-locally.
    // The r13 verdict's #4: re-deriving the gram stream per
    // invocation cost 38.8 s at 100× when the q103-style persisted
    // index was already the family's discipline. Identical pair
    // output, oracle unchanged.
    "q227_minimizer_pairs" -> { (s, d) =>
      val capped = s.table(minPairIndexTable(s, d))
        .withColumn("bn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("m")))
        .where(col("bn") <= HotBucketCap).drop("bn")
      capped.select(col("m"), col("doc_id").as("id_a"))
        .join(capped.select(col("m"), col("doc_id").as("id_b")), Seq("m"))
        .where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 2)
        .orderBy("id_a", "id_b")
    },

    // Incremental minimizer pairs — batch vs the PERSISTED corpus
    // signature index (added r14): the per-release form of q227. The
    // day's batch (odd doc_ids) derives its winnowed minimizers in
    // one map pass and probes the m-bucketed index; because the
    // HotBucketCap drops an over-cap minimizer's postings WHOLESALE,
    // probing the capped index equals capping both sides — so the
    // output is EXACTLY q227's pair set restricted to pairs touching
    // the batch (the oracle states it that way). Odd-odd pairs count
    // once via the larger-id side's probe (old < new guard); odd-even
    // pairs once via the odd side (the index holds both halves — one
    // artifact serves the full-corpus and the incremental tiers).
    // Per-release cost: O(batch grams) emission + posting-bounded
    // probe, never a corpus re-derivation.
    "q341_minimizer_incremental" -> { (s, d) =>
      minimizerIncPairs(s, d).orderBy("id_a", "id_b")
    },

    "q219_substring_dup" -> { (s, d) =>
      val k = 8
      // r19: `grams` was a def consumed twice (the dup-hash threshold
      // and the join's probe side) — the gram explode + md5 ran twice
      // (q261/q262's fix, guide §2.4). Pinned, it runs once.
      val (grams, gh) = org.apache.spark.sql.graft.InternalPin.pin(
        Tables(s, d, "documents")
        .where(size(split(col("text"), " ")) >= k)
        .select(col("doc_id"), col("source"),
          org.apache.spark.sql.graft.GraftFunctions
            .ngrams(split(col("text"), " "), k).as("g"))
        .select(col("doc_id"), col("source"), md5(col("g")).as("h")))
      gh.count(); graft.PinScope.retain(gh)
      val dupH = grams.groupBy("h")
        .agg(countDistinct("doc_id").as("nd"))
        .where(col("nd") >= 2)
        .select(col("h"), lit(1L).as("isdup"))
      grams.join(dupH, Seq("h"), "left")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("ng"),
             sum(coalesce(col("isdup"), lit(0L))).as("dg"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("ng").as("n_grams"),
          sum("dg").as("dup_grams"),
          sum(when(col("dg") > 0, 1L).otherwise(0L)).as("docs_hit"),
          round(sum("dg").cast("double") / sum("ng").cast("double"), 6)
            .as("dup_ratio"))
        .orderBy("source")
    },

    // Duplication rate by source (added r12) — the report a corpus
    // curator reads BEFORE deciding crawl weights: per ingest source,
    // how many docs sit in a duplicate cluster and how many are
    // REDUNDANT (non-representative members, cluster_id ≠ doc_id —
    // exactly the rows q83's keep-best pass would drop). Rides the
    // PERSISTED cluster artifact (never re-runs the fixpoint, never
    // re-bands): one shuffle join of the doc_id-bucketed cluster table
    // against the documents metadata (text never moves — only doc_id/
    // source), then a |sources|-row rollup. The per-source dup_rate is
    // what turns the dedup family from a cleanup step into a FEEDBACK
    // signal on acquisition.
    "q211_dup_rate_by_source" -> { (s, d) =>
      val cl = s.table(clusterTable(s, d))
      Tables(s, d, "documents").select(col("doc_id"), col("source"))
        .join(cl, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
             count(col("cluster_id")).as("clustered_docs"),
             sum(when(col("cluster_id").isNotNull &&
                      col("cluster_id") =!= col("doc_id"), 1L)
                   .otherwise(0L)).as("redundant_docs"))
        .withColumn("dup_rate",
          round(col("redundant_docs").cast("double") / col("docs"), 6))
        .orderBy("source")
    },

    // Keep-best dedup (added r6) — the step that turns q82's duplicate
    // CLUSTERS into a cleaned CORPUS: every document gets a cluster id
    // (its component's min doc_id; singletons are their own cluster)
    // and a keep bit — the highest-quality member of each cluster
    // (q49's score, doc_id tie-break) survives, the rest are dropped.
    //
    // Scale shape: the cluster table is the PERSISTED artifact
    // [[clusterTable]] built by the q82 fixpoint — keep-best is a
    // probe, never a recompute (r7's verdict flagged the duplicate
    // fixpoint as the suite's one avoidable scale cost; the q76/q79
    // batch-vs-index discipline applies verbatim). The table covers
    // only docs that appeared in a candidate pair — usually a sliver of
    // the corpus — so it reaches both the inner join (clustered docs)
    // and the anti join (singletons, keep=1 by definition, no window
    // needed) via broadcast. The hint is GATED on the actual
    // cluster-table size (a cheap count over the bucketed parquet):
    // high-duplication corpora — web crawls routinely put 30-50% of
    // docs in a candidate pair — blow past any broadcast threshold, and
    // there the plain join lets AQE pick a shuffle join instead of
    // OOMing the driver on a forced broadcast. The row_number window
    // shuffles only the clustered sliver, never the corpus.
    "q83_dedup_keep_best" -> { (s, d) =>
      keepBest(s, d).orderBy("doc_id")
    },

    // PageRank over the candidate graph (added r9) — graph centrality
    // as a declared ITERATIVE query: 5 damped power-iteration rounds
    // (d = 0.85) over the symmetric LSH candidate edges, identifying
    // the most-connected documents of each near-dup neighborhood (the
    // "hub" boilerplate a cleanup pipeline inspects first). All
    // arithmetic is INTEGER FIXED-POINT (ranks scaled by 1e12;
    // per-edge contribution r DIV deg; damping (85·Σ) DIV 100) — sums
    // of integers are partition-order-free and both engines' integer
    // division agrees on positives, so a floating-point iterative
    // algorithm becomes exactly DuckDB-oracle-checkable (the oracle
    // unrolls the 5 rounds as CTEs). Per round: one shuffle join
    // (edges⋈ranks) + one sum-agg — the q82 fixpoint's primitives
    // with a fixed round count, so no pinning is needed and the plan
    // stays a 5-deep join tree.
    // k-core peel (added r13) — the graph family's DENSITY filter
    // next to q115's centrality and q182's communities: the 2-core of
    // the LSH candidate graph (iteratively remove nodes with fewer
    // than 2 surviving neighbors) separates docs embedded in DENSE
    // near-dup structure from pendant one-edge coincidences — in a
    // dedup pipeline the core is where cluster review effort goes
    // (Seidman 1983; Batagelj–Zaveršnik peel). Declared semantics: a
    // FOUR-round synchronous peel attestation (q182's fixed-round
    // discipline) reporting per round how many nodes fell and how
    // many remain; at every test SF round 4 removes nothing, i.e. the
    // fixpoint IS reached and the output is the true 2-core
    // (spec-asserted, plus the core property that every survivor
    // keeps ≥2 surviving neighbors). Each round = one semi-join of
    // the pinned edge list against the pinned survivor set + a degree
    // agg — shuffle-per-round on the edge key, the standard
    // distributed peel; survivor sets only shrink.
    "q328_kcore" -> { (s, d) =>
      def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
      val pairs = candidatePairs(Tables(s, d, "documents"),
                                 maxBucket = HotBucketCap)
      val (edges, eh) = pin(
        pairs.select(col("id_a").as("u"), col("id_b").as("v"))
          .unionAll(pairs.select(col("id_b").as("u"),
                                 col("id_a").as("v"))))
      eh.count(); graft.PinScope.retain(eh)
      var alive = edges.select(col("u").as("id")).distinct()
      val (a0, ah) = pin(alive); ah.count(); graft.PinScope.retain(ah)
      alive = a0
      val stats = (1 to 4).map { r =>
        val deg = edges
          .join(alive.select(col("id").as("u")), Seq("u"))
          .join(alive.select(col("id").as("v")), Seq("v"))
          .groupBy("u").agg(count(lit(1)).as("deg"))
        val keep = deg.where(col("deg") >= 2).select(col("u").as("id"))
        val (kp, kh) = pin(keep); kh.count(); graft.PinScope.retain(kh)
        val stat = alive.agg(count(lit(1)).as("before"))
          .crossJoin(kp.agg(count(lit(1)).as("after")))
          .select(lit(r).cast("long").as("peel_round"),
                  (col("before") - col("after")).as("removed"),
                  col("after").as("remaining"))
        alive = kp
        stat
      }
      stats.reduce(_.union(_)).orderBy("peel_round")
    },

    "q115_pagerank" -> { (s, d) =>
      val pairs = candidatePairs(Tables(s, d, "documents"),
                                 maxBucket = HotBucketCap)
      // r19 optimization: pin the symmetrized edge list ONCE (q182's
      // discipline — guide §2.4): unpinned, all five rounds' lineage
      // re-derived the MinHash banding per reference (deg + the five
      // withDeg reads = six banding subtrees in one plan). Each round's
      // arithmetic is untouched.
      def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
      val (edges, eh) =
        pin(pairs.select(col("id_a").as("u"), col("id_b").as("v"))
          .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v"))))
      eh.count(); graft.PinScope.retain(eh)
      // deg and each round's rank table are pinned too (q182's
      // per-round discipline): unpinned, round 5's lineage nests all
      // prior rounds — 44 exchanges of plan for 2 s of task time, the
      // wall-clock was Catalyst planning, not compute.
      val (deg, dh) =
        pin(edges.groupBy("u").agg(count(lit(1)).as("deg")))
      dh.count(); graft.PinScope.retain(dh)
      val withDeg = edges.join(deg, Seq("u"))
      var r = deg.select(col("u").as("id"), lit(1000000000000L).as("r"))
      for (_ <- 1 to 5) {
        val contrib = withDeg
          .join(r.withColumnRenamed("id", "u"), Seq("u"))
          .select(col("v").as("id"), expr("r DIV deg").as("c"))
          .groupBy("id").agg(sum(col("c")).as("sc"))
        val (next, nh) = pin(deg.select(col("u").as("id"))
          .join(contrib, Seq("id"), "left")
          .select(col("id"),
                  (lit(150000000000L) +
                   expr("(85 * coalesce(sc, 0L)) DIV 100")).as("r")))
        nh.count(); graft.PinScope.retain(nh)
        r = next
      }
      r.select(col("id").as("doc_id"), col("r").as("rank_fp"))
        .orderBy("doc_id")
    },

    // Triangle participation counts (added r10) — the third graph
    // primitive over the LSH candidate graph, next to components
    // (q82/q102/q108) and centrality (q115): how many triangles each
    // document sits in. Triangle density separates true near-dup
    // CLIQUES (boilerplate families, template fills — every pair
    // collides, triangle-rich) from chains of borderline pairs
    // (triangle-free), so it is the cluster-QUALITY signal a cleanup
    // pipeline reads before trusting a component. Enumeration uses
    // the oriented a<b<c form — each triangle counted exactly once:
    // edges(a,b)⋈edges(b,c) gives the wedges, a semi join against
    // edges(a,c) closes them; per-node counts then explode each
    // triangle to its three corners. Cost O(Σ_wedges) with the
    // hot-bucket cap bounding any bucket's clique size; at web scale
    // the standard degree-ordered orientation (direct each edge
    // low→high degree) bounds wedge fan-out at O(edges^1.5) — same
    // join shape, different orientation key.
    "q132_triangles" -> { (s, d) =>
      val e = candidatePairs(Tables(s, d, "documents"),
                             maxBucket = HotBucketCap)
      val wedges = e.select(col("id_a").as("a"), col("id_b").as("b"))
        .join(e.select(col("id_a").as("b"), col("id_b").as("c")), Seq("b"))
      val tri = wedges.join(
        e.select(col("id_a").as("a"), col("id_b").as("c")),
        Seq("a", "c"), "left_semi")
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
        .orderBy("doc_id")
    },

    // BFS distance layers (added r10) — the fourth graph primitive:
    // hop distance from a deterministic source (the max-degree node,
    // smallest id on ties — the hub of the densest near-dup
    // neighborhood, so the walk explores real structure) out to 3
    // hops, the
    // neighborhood-radius query behind "how far does this boilerplate
    // family spread". Unrolled frontier expansion: each round is one
    // join (edges ⋈ frontier) + a distinct + an anti join against the
    // visited set — the standard distributed BFS where a round's cost
    // is O(frontier-adjacent edges), never O(graph); first discovery
    // IS minimum distance because rounds run in order. Fixed 3 rounds
    // keeps the plan static and the oracle expressible (a bounded
    // recursive CTE with min-dist reduction); an unbounded BFS swaps
    // in the q82 fixpoint discipline (pinned rounds + convergence
    // count). The edge set is PINNED once (q82's InternalPin
    // discipline): `edges` is referenced by the degree ranking plus
    // every round's expansion — lazily that re-runs the whole
    // banding+self-join pipeline per reference (measured 5.8 s at
    // sf0.1); pinned, banding runs once and each round joins against
    // in-memory blocks (1.3 s). Each round's frontier is pinned too,
    // so the round-k anti-join reads round-(k−1)'s blocks instead of
    // replaying the growing union chain. Handles outlive the lazy
    // result via [[graft.PinScope]]; the harness drains them after
    // consuming (releasing before the consume would race block
    // removal and recompute everything — measured 4.7 s).
    "q138_bfs_layers" -> { (s, d) =>
      def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
      val pairs = candidatePairs(Tables(s, d, "documents"),
                                 maxBucket = HotBucketCap)
      val (edges, eh) =
        pin(pairs.select(col("id_a").as("u"), col("id_b").as("v"))
          .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v"))))
      eh.count() // materialize: every later reference reads blocks
      val src = edges.groupBy("u").agg(count(lit(1)).as("deg"))
        .orderBy(col("deg").desc, col("u")).limit(1)
        .select(col("u").as("doc_id"))
      graft.PinScope.retain(eh)
      var layers = broadcast(src).select(col("doc_id"), lit(0L).as("dist"))
      var frontier = layers.select("doc_id")
      for (k <- 1 to 3) {
        val (next, nh) = pin(edges
          .join(frontier.withColumnRenamed("doc_id", "u"), Seq("u"))
          .select(col("v").as("doc_id")).distinct()
          .join(layers.select("doc_id"), Seq("doc_id"), "left_anti"))
        nh.count()
        graft.PinScope.retain(nh)
        layers = layers
          .unionAll(next.select(col("doc_id"), lit(k.toLong).as("dist")))
        frontier = next
      }
      layers.orderBy("doc_id")
    },

    // Recursive-CTE BFS (added r12) — the same ≤3-hop distance layers
    // as q138, computed through Spark 4's NATIVE `WITH RECURSIVE`
    // surface instead of hand-pinned iterative joins: the declarative
    // SQL a warehouse user writes for reachability, now a first-class
    // engine path. Three paths, one answer: q138's pinned frontier
    // loop, this recursive CTE, and the DuckDB oracle (itself a
    // recursive CTE) must all agree — q82/q102's discipline extended
    // to the SQL surface. Scale note, stated honestly: UNION ALL
    // recursion enumerates WALKS (the depth-3 bound terminates it, and
    // min(dist) reduces to BFS layers), so on a dense component the
    // intermediate grows with path count, not node count — q138's
    // frontier loop (per-level distinct + anti join) IS the scale
    // path; this query declares the surface and pins its equivalence.
    "q217_bfs_recursive" -> { (s, d) =>
      val pairs = candidatePairs(Tables(s, d, "documents"),
                                 maxBucket = HotBucketCap)
      // r19: pin the edge table before the view (q138's discipline) —
      // the recursive CTE's iterations each re-planned the whole
      // banding+self-join lineage through the lazy view; pinned, the
      // src ranking and every walk round read in-memory blocks. The
      // SQL text (what the oracle restates) is unchanged.
      val (edges, eh) = org.apache.spark.sql.graft.InternalPin.pin(
        pairs.select(col("id_a").as("u"), col("id_b").as("v"))
          .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v"))))
      eh.count(); graft.PinScope.retain(eh)
      edges.createOrReplaceTempView("graft_bfs_edges")
      s.sql("""
        WITH RECURSIVE
        src AS (SELECT u AS id FROM (
                  SELECT u, count(*) AS deg FROM graft_bfs_edges
                  GROUP BY u ORDER BY deg DESC, u LIMIT 1)),
        walk(v, dist) AS (
          SELECT id, 0 FROM src
          UNION ALL
          SELECT e.v, w.dist + 1
          FROM walk w JOIN graft_bfs_edges e ON e.u = w.v
          WHERE w.dist < 3)
        SELECT v AS doc_id, CAST(min(dist) AS BIGINT) AS dist
        FROM walk GROUP BY v ORDER BY doc_id""")
    },

    // Synchronous label propagation (added r12) — the fifth graph
    // primitive: community labels over the LSH candidate graph, next
    // to components (q82: ANY connectivity merges), centrality (q115),
    // triangles (q132) and BFS (q138). LPA answers a finer question
    // than components — within a connected blob, labels converge to
    // DENSELY-linked cores (boilerplate families) while thin bridges
    // between them keep separate labels, which is exactly the
    // over-merged-component diagnosis a dedup pipeline runs when one
    // giant component swallows distinct template families. Made
    // deterministic (classic LPA is famously order-dependent): three
    // SYNCHRONOUS rounds (every node updates from the previous round's
    // labels, never a mix), argmax by neighbor-label count with the
    // DECLARED tie-break (highest count, then smallest label); init =
    // own id. Each round is one edges⋈labels join + a (node, label)
    // count + a per-node argmax window — O(edges) per round, never
    // O(n²); fixed rounds keep the plan static and the oracle
    // expressible as unrolled CTEs. The edge set and each round's
    // labels are PINNED (q138's InternalPin discipline) so banding
    // runs once and round k reads round k−1's blocks instead of
    // replaying the growing lineage.
    "q182_label_prop" -> { (s, d) =>
      def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
      val pairs = candidatePairs(Tables(s, d, "documents"),
                                 maxBucket = HotBucketCap)
      val (edges, eh) =
        pin(pairs.select(col("id_a").as("u"), col("id_b").as("v"))
          .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v"))))
      eh.count()
      graft.PinScope.retain(eh)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("u").orderBy(col("cnt").desc, col("lab").asc)
      var labels = edges.select(col("u").as("id")).distinct()
        .withColumn("lab", col("id"))
      for (_ <- 1 to 3) {
        val counts = edges
          .join(labels.withColumnRenamed("id", "v"), Seq("v"))
          .groupBy("u", "lab").agg(count(lit(1)).as("cnt"))
        val (next, nh) = pin(counts
          .withColumn("rk", row_number().over(w))
          .where(col("rk") === 1)
          .select(col("u").as("id"), col("lab")))
        nh.count()
        graft.PinScope.retain(nh)
        labels = next
      }
      labels.select(col("id").as("doc_id"), col("lab").as("lpa_label"))
        .orderBy("doc_id")
    },

    // Incremental cluster MAINTENANCE (added r9) — the operation a
    // pipeline runs when a new crawl batch lands: merge the batch into
    // the existing duplicate-cluster structure WITHOUT re-banding or
    // re-clustering the base corpus. Inputs are two persisted
    // artifacts over the even-doc_id base: q76's band index (probed
    // for batch×base candidate edges, no base rescan) and the base
    // cluster table (its rows collapse all base-internal connectivity
    // to star edges doc→cluster, so the fixpoint never revisits base
    // structure). New edges = batch⋈index + batch self-join; the
    // min-label fixpoint then runs on (stars ∪ new edges) — a graph
    // whose size is O(batch + affected clusters), NOT O(corpus). The
    // result is provably the full-corpus clustering (components of
    // stars∪new = components of the full candidate graph, the
    // union-find merge property), so the oracle is EXACTLY q82's —
    // one oracle text, two independent computation paths, and the
    // third consumer of the batch-vs-index discipline's artifacts.
    // Cap-regime caveat: the equivalence proof assumes ONE edge set.
    // The base cluster table caps hot buckets on bucket counts over
    // the even-only subset, while the index/batch edges here are
    // uncapped — in a regime where HotBucketCap actually fires, the
    // merged edge set is neither the capped nor the uncapped
    // full-corpus graph. At every test SF the cap is a spec-asserted
    // no-op (max bucket 9 ≪ 64), so the equality holds exactly; a
    // production deployment must compute the cap on FULL-corpus
    // bucket counts and apply it identically to base, index and
    // batch banding before relying on the merge property.
    "q108_clusters_incremental" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val baseT = clusterTable(s, d, baseOnly = true)
      val idxT = bandIndexTable(s, d)
      val batch = bandKeys(docs.where(col("doc_id") % 2 === 1))
        .select(col("bk"), col("doc_id").as("new_id"))
      val index = s.table(idxT).select(col("bk"), col("doc_id").as("old_id"))
      val newVsOld = batch.join(index.hint("merge"), Seq("bk"))
        .select(least(col("new_id"), col("old_id")).as("id_a"),
                greatest(col("new_id"), col("old_id")).as("id_b"))
      val newVsNew = batch
        .join(batch.select(col("bk"), col("new_id").as("other_id")), Seq("bk"))
        .where(col("new_id") < col("other_id"))
        .select(col("new_id").as("id_a"), col("other_id").as("id_b"))
      val starEdges = s.table(baseT)
        .where(col("doc_id") =!= col("cluster_id"))
        .select(col("cluster_id").as("id_a"), col("doc_id").as("id_b"))
      connectedComponents(
          newVsOld.unionAll(newVsNew).unionAll(starEdges).distinct())
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
        .orderBy("doc_id")
    },

    // Reciprocal-best match (added r12) — the entity-resolution
    // refinement between q42's threshold pairs and q82's transitive
    // clusters: a pair links only when each side is the OTHER's single
    // best match, which kills the hub problem (one boilerplate doc
    // matching fifty others chains them all; mutual-best keeps only
    // genuine 1:1 duplicates — the record-linkage convention). Three
    // canonical stages, each scale-shaped: BLOCKING on the 20-char
    // text prefix with q227's hot-block cap (≤ 64 docs/block declared
    // — a degenerate block would otherwise square), exact
    // distinct-token Jaccard on candidates only (set algebra on
    // per-doc token arrays; scores round 6 BEFORE ranking so the order
    // is engine-identical), MUTUAL-ARGMAX as two row_number windows
    // over the directed pair list joined back on itself (pair volume,
    // never corpus volume). Docs table pinned: blocking self-join
    // reads blocks twice, the corpus scans once.
    "q238_reciprocal_match" -> { (s, d) =>
      def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
      val (docs, h) = pin(Tables(s, d, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 20).as("blk"),
                array_distinct(filter(split(col("text"), " "),
                                      t => length(t) > 0)).as("toks")))
      h.count(); graft.PinScope.retain(h)
      val capped = docs.join(
        docs.groupBy("blk").agg(count(lit(1)).as("bn"))
          .where(col("bn") <= HotBucketCap).select("blk"), Seq("blk"))
      val cand = capped.as("a")
        .join(capped.as("b"),
              col("a.blk") === col("b.blk") &&
                col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
                size(array_intersect(col("a.toks"), col("b.toks")))
                  .as("inter"),
                size(col("a.toks")).as("na"), size(col("b.toks")).as("nb"))
        .withColumn("jac",
          round(col("inter").cast("double") /
                (col("na") + col("nb") - col("inter")).cast("double"), 6))
      val dirs = cand.select(col("id_a").as("id"), col("id_b").as("p"),
                             col("jac"))
        .unionAll(cand.select(col("id_b").as("id"), col("id_a").as("p"),
                              col("jac")))
      val best = dirs.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("id")
            .orderBy(col("jac").desc, col("p").asc)))
        .where(col("rk") === 1)
      best.as("x").join(best.as("y"),
            col("x.id") === col("y.p") && col("x.p") === col("y.id") &&
              col("x.id") < col("x.p"))
        .select(col("x.id").as("id_a"), col("x.p").as("id_b"),
                col("x.jac").as("jac"))
        .orderBy("id_a")
    },

    // Containment dedup (added r12) — the ASYMMETRIC overlap Jaccard
    // structurally misses: a short document fully quoted inside a long
    // one has |A∩B|/|A| ≈ 1 but Jaccard ≈ |A|/|B| (arbitrarily low),
    // so a symmetric threshold never fires — yet subset-duplication
    // (quoted boilerplate, prepended headers, excerpt pages) is
    // exactly what a corpus-prep pass must catch. Same blocked
    // candidate stage as q238 (20-char prefix, ≤64 hot-block cap);
    // score = inter / |small| with SMALL declared as fewer distinct
    // tokens then lower doc_id; keep containment ≥ 0.9 and report
    // Jaccard alongside — rows with high cont and low jac are the
    // pairs the symmetric pass provably loses. Integer set algebra,
    // two rounded divisions at emission.
    "q241_containment_dedup" -> { (s, d) =>
      def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
      val (docs, h) = pin(Tables(s, d, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 20).as("blk"),
                array_distinct(filter(split(col("text"), " "),
                                      t => length(t) > 0)).as("toks")))
      h.count(); graft.PinScope.retain(h)
      val capped = docs.join(
        docs.groupBy("blk").agg(count(lit(1)).as("bn"))
          .where(col("bn") <= HotBucketCap).select("blk"), Seq("blk"))
      capped.as("a")
        .join(capped.as("b"),
              col("a.blk") === col("b.blk") &&
                col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
                size(array_intersect(col("a.toks"), col("b.toks")))
                  .as("inter"),
                size(col("a.toks")).as("na"), size(col("b.toks")).as("nb"))
        .select(
          when(col("na") < col("nb") ||
                 (col("na") === col("nb")), col("ia"))
            .otherwise(col("ib")).as("id_small"),
          when(col("na") < col("nb") ||
                 (col("na") === col("nb")), col("ib"))
            .otherwise(col("ia")).as("id_big"),
          col("inter"), least(col("na"), col("nb")).as("nsmall"),
          (col("na") + col("nb") - col("inter")).as("uni"))
        .where(col("inter") * 10 >= col("nsmall") * 9)
        .select(col("id_small"), col("id_big"),
                round(col("inter").cast("double") /
                      col("nsmall").cast("double"), 6).as("containment"),
                round(col("inter").cast("double") /
                      col("uni").cast("double"), 6).as("jaccard"))
        .orderBy("id_small", "id_big")
    },

    // Source-mirror detection (added r12) — dedup at the SOURCE grain:
    // two feeds whose 8-gram SETS overlap heavily are mirrors (the
    // same crawl behind two hostnames, a re-hosted dump, a partner
    // syndication), and ingesting both double-weights that corpus in
    // training. Per source the distinct-gram set is the q242 gram
    // projection aggregated once; pair volume is Σ_gram |sources|² ≤
    // |sources|² per gram — source-count bounded, never doc² — and
    // set sizes broadcast onto the ≤|sources|² pair table. Jaccard
    // says "same corpus"; containment (÷ the smaller set) also catches
    // a feed that is a strict SUBSET mirror of a bigger one. All-pairs
    // reported with a declared total order (the source space is the
    // operator's cardinality, tiny by construction even at 100 TB).
    "q262_source_mirror" -> { (s, d) =>
      // r19: the distinct (source, gram) set feeds THREE consumers
      // (sizes + both self-join sides) — unpinned, the gram explode +
      // md5 + distinct ran three times (q261's fix, guide §2.4).
      val (g, gh) = org.apache.spark.sql.graft.InternalPin.pin(
        Tables(s, d, "documents")
        .select(col("source"),
                org.apache.spark.sql.graft.GraftFunctions
                  .ngrams(split(col("text"), " "), 8).as("gr"))
        .select(col("source"), md5(col("gr")).as("m"))
        .distinct())
      gh.count(); graft.PinScope.retain(gh)
      val sizes = g.groupBy("source").agg(count(lit(1)).as("sz"))
      val inter = g.as("a")
        .join(g.as("b"),
              col("a.m") === col("b.m") &&
                col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sizes.select(col("source").as("s1"),
                                     col("sz").as("n1"))), Seq("s1"))
        .join(broadcast(sizes.select(col("source").as("s2"),
                                     col("sz").as("n2"))), Seq("s2"))
        .select(col("s1"), col("s2"), col("inter"),
                round(col("inter").cast("double") /
                      (col("n1") + col("n2") - col("inter"))
                        .cast("double"), 6).as("jaccard"),
                round(col("inter").cast("double") /
                      least(col("n1"), col("n2")).cast("double"), 6)
                  .as("containment"))
        .orderBy(col("jaccard").desc, col("s1"), col("s2"))
        .limit(20)
    },

    // Sorted-neighborhood blocking (added r12) — the THIRD blocking
    // family next to prefix blocks (q238/q241) and LSH bands (q46):
    // sort the records by a blocking key and compare each only to its
    // w nearest neighbors in sort order — O(n·w) candidates with no
    // bucket-size skew by construction (a hot prefix block is
    // impossible; the trade is recall at sort-order boundaries, the
    // classical sliding-window ER compromise). Here: customers sorted
    // by (balance cents, key), window w = 3 via stacked lead()s, match
    // = balance within 10 cents — the near-duplicate-account screen.
    // Since r14 the neighborhood is computed DISTRIBUTED (the r12 form
    // stacked lead()s over one unpartitioned window — a single-
    // partition sort of the whole table, the q329 defect class): the
    // global rank runs as [[GlobalOrder]]'s two-level bucket rank
    // ($100-resolution balance buckets, within-bucket sorts parallel)
    // and each row equi-joins to its next 1..3 successors on the rank
    // key — bit-identical to the lead form (tail rows simply have
    // fewer successors), same oracle, no fact-scaled global window
    // (WindowBoundednessSpec-guarded). Declared total order on the
    // match list.
    "q270_sorted_neighborhood" -> { (s, d) =>
      val c = Tables(s, d, "customer")
        .select(col("c_custkey").as("k"),
                round(col("c_acctbal") * 100).cast("long").as("bal"))
      GlobalOrder.neighbors(c, expr("(bal + 100000) DIV 10000"),
                            Seq(col("bal"), col("k")), 3, Seq("k", "bal"))
        .where(col("bal2") - col("bal") <= 10)
        .select(col("k").as("cust_a"), col("k2").as("cust_b"),
                (col("bal2") - col("bal")).as("diff_cents"))
        .orderBy(col("diff_cents"), col("cust_a"), col("cust_b"))
        .limit(30)
    },

    // Fellegi–Sunter record-linkage scoring (added r12) — the
    // PROBABILISTIC tier of the matching family: q270's blocking gives
    // candidate PAIRS, this turns field agreements into calibrated
    // log-likelihood-ratio match weights (the 1969 model every
    // production linker — Splink, dedupe.io — still runs). Per field
    // (nation, segment, $10 balance band): u = P(agree | random pair)
    // estimated from the field's OWN value distribution (Σ n_v(n_v−1) /
    // N(N−1) — exact integer folds over an UNPIVOTED one-scan stack,
    // 3·|values| cells), m = P(agree | match) declared (0.9/0.85/0.8 —
    // the part a pipeline tunes from labeled pairs); agreement and
    // disagreement weights log2(m/u), log2((1−m)/(1−u)) round ONCE at
    // 6 dp (q220's round-log-once rule), so the per-pattern score is an
    // exact 3-term decimal sum. Candidates = q270's w=3 sorted
    // neighborhood (no caliper — the score itself separates); output =
    // the 2^3-pattern histogram with its weight, the table a linkage
    // analyst reads to set the match/review/reject thresholds. All
    // post-blocking work is pattern-bound (≤8 rows) at any scale.
    // Degree assortativity (added r12) — the graph-family summary
    // statistic next to components (q82), centrality (q115), triangles
    // (q132) and BFS (q138): do high-degree documents collide with
    // other high-degree documents (r > 0: hub-on-hub boilerplate
    // families) or with leaves (r < 0: star-shaped template spam)?
    // Pearson correlation of (deg u, deg v) over the symmetric LSH
    // candidate edges — the standard newman-r. All moments fold as
    // exact decimals over the edge list (one deg agg + two broadcast
    // joins of the tiny degree table), the correlation divides once in
    // double and rounds 6 dp. Cost = the candidate banding + one
    // edge-keyed agg; nothing quadratic, hot buckets capped as q46.
    "q284_assortativity" -> { (s, d) =>
      val pairs = candidatePairs(Tables(s, d, "documents"),
                                 maxBucket = HotBucketCap)
      val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
      val du = deg.select(col("u"), col("deg").as("du"))
      val dv = deg.select(col("u").as("v"), col("deg").as("dv"))
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      edges.join(broadcast(du), Seq("u")).join(broadcast(dv), Seq("v"))
        .agg(count(lit(1)).as("n_edges"),
             sum(col("du").cast("decimal(38,0)")).as("sx"),
             sum(col("dv").cast("decimal(38,0)")).as("sy"),
             sum(col("du").cast("decimal(38,0)") * col("du")).as("sxx"),
             sum(col("dv").cast("decimal(38,0)") * col("dv")).as("syy"),
             sum(col("du").cast("decimal(38,0)") * col("dv")).as("sxy"))
        .select(col("n_edges"),
          round(dd(col("sx")) / dd(col("n_edges")), 6).as("avg_deg"),
          round((dd(col("n_edges") * col("sxy") - col("sx") * col("sy"))) /
                sqrt(dd(col("n_edges") * col("sxx") -
                        col("sx") * col("sx")) *
                     dd(col("n_edges") * col("syy") -
                        col("sy") * col("sy"))), 6).as("assortativity"))
    },

    // Adamic–Adar link prediction (added r13) — the graph-family
    // PREDICTIVE primitive next to q284's descriptive summary: which
    // NON-adjacent doc pairs share many RARE neighbors in the LSH
    // candidate graph? AA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z)
    // (Adamic & Adar 2003) — the standard link-prediction score, and
    // in a dedup pipeline the "cluster repair" probe: a high-AA
    // non-edge is a near-dup pair the banding missed (two docs
    // colliding with the same rare third doc but never with each
    // other). Shape: symmetric edges → degree table → wedge join
    // THROUGH the capped center table ([[WedgeHubCap]] — hubs cost
    // deg² wedges and contribute 1/ln(deg) ≈ 0, so pruning them is
    // the standard AA move; cap a no-op at test SF like q46's) →
    // per-pair count + decimal sum of once-rounded 1/ln(deg) terms
    // (order-free — q220's round-log-once rule) → anti-join drops
    // already-adjacent pairs → deterministic top-50 by (score desc,
    // ids), a bounded TakeOrdered, never a global sort.
    "q313_adamic_adar" -> { (s, d) =>
      val (cp, h) = org.apache.spark.sql.graft.InternalPin.pin(
        candidatePairs(Tables(s, d, "documents"),
                       maxBucket = HotBucketCap))
      h.count(); graft.PinScope.retain(h)
      val edges = cp.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionAll(cp.select(col("id_b").as("u"), col("id_a").as("v")))
      val cent = edges.groupBy("u").agg(count(lit(1)).as("deg"))
        .where(col("deg") <= WedgeHubCap && col("deg") >= 2)
        .select(col("u").as("z"),
                round(lit(1.0) / log(col("deg").cast("double")), 6)
                  .cast("decimal(28,6)").as("aa"))
      val n1 = edges.select(col("u"), col("v").as("z")).join(cent, Seq("z"))
      val wed = n1
        .join(edges.select(col("u").as("w"), col("v").as("z")), Seq("z"))
        .where(col("u") < col("w"))
      val sc = wed.groupBy("u", "w")
        .agg(count(lit(1)).as("n_common"), sum("aa").as("aa_dec"))
      sc.join(cp.select(col("id_a").as("u"), col("id_b").as("w")),
              Seq("u", "w"), "left_anti")
        .select(col("u").as("id_a"), col("w").as("id_b"), col("n_common"),
                col("aa_dec").cast("double").as("aa_score"))
        .orderBy(col("aa_score").desc, col("id_a"), col("id_b"))
        .limit(50)
    },

    // Fellegi–Sunter EM (added r13) — q275 DECLARES its match
    // probabilities (m = 0.9/0.85/0.8, "the part a pipeline tunes
    // from labeled pairs"); this LEARNS them with no labels at all:
    // Winkler's EM over the agreement-pattern histogram (Winkler
    // 1988, the estimator every production record-linkage stack
    // ships), treating match/non-match as the latent class. 3 rounds
    // over the ≤2³-row pattern table (composed from q275's declared
    // output — the candidate generation and agreement bits are ONE
    // definition): E-step w_g = P(match|γ_g) under the current
    // (p, m, u); M-step re-estimates all seven parameters from the
    // w-weighted pattern counts. Everything is 8-row×1-row algebra:
    // [[fsRound]] is ONE SQL string both engines run (the q310
    // staging discipline — Spark pins each round's 1-row parameter
    // view, the oracle unrolls the identical text); w and the
    // parameters floor-quantize at 1e-8 so every M-step sum is an
    // exact order-free decimal; per-pattern ln(P(γ)) quantizes at
    // 1e-6 into the avg log-likelihood, whose round-over-round
    // monotone ascent is EM's own guarantee (spec-certified). Output
    // per round: p, m's, u's, avg log-lik.
    "q319_fs_em" -> { (s, d) =>
      val pat = queries("q275_fellegi_sunter")(s, d)
        .select(expr("CAST(substring(pattern, 1, 1) AS INT)").as("a1"),
                expr("CAST(substring(pattern, 2, 1) AS INT)").as("a2"),
                expr("CAST(substring(pattern, 3, 1) AS INT)").as("a3"),
                col("n_pairs").as("ng"))
      val (pp, h) = org.apache.spark.sql.graft.InternalPin.pin(pat)
      h.count(); graft.PinScope.retain(h)
      pp.createOrReplaceTempView("graft_fs_pat")
      s.sql("SELECT 1e-1 AS p, 9e-1 AS m1, 85e-2 AS m2, 8e-1 AS m3, " +
            "3e-1 AS u1, 2e-1 AS u2, 1e-1 AS u3")
        .createOrReplaceTempView("graft_fs_w0")
      val outs = (1 to 3).map { m =>
        val block = fsRound(m, "graft_fs_pat", s"graft_fs_w${m - 1}")
        if (m < 3) {
          val (wt, chW) = org.apache.spark.sql.graft.InternalPin.pin(
            s.sql(s"WITH $block SELECT p, m1, m2, m3, u1, u2, u3 " +
                  s"FROM wu$m"))
          chW.count(); graft.PinScope.retain(chW)
          wt.createOrReplaceTempView(s"graft_fs_w$m")
        }
        s.sql(s"WITH $block SELECT * FROM out$m")
      }
      outs.reduce(_ unionAll _)
        .selectExpr("CAST(em_round AS BIGINT) AS em_round", "p",
                    "m1 AS m_nat", "m2 AS m_seg", "m3 AS m_band",
                    "u1 AS u_nat", "u2 AS u_seg", "u3 AS u_band",
                    "avg_loglik")
        .orderBy("em_round")
    },

    "q275_fellegi_sunter" -> { (s, d) =>
      val c = Tables(s, d, "customer")
        .select(col("c_custkey").as("k"),
                round(col("c_acctbal") * 100).cast("long").as("bal"),
                col("c_nationkey").cast("long").as("nat"),
                col("c_mktsegment").as("seg"))
        .withColumn("band", expr("(bal + 100000) div 1000"))
      // u per field from the value distribution (one unpivoted scan)
      val uTab = c.select(explode(array(
          struct(lit("nat").as("f"), col("nat").cast("string").as("v")),
          struct(lit("seg").as("f"), col("seg").as("v")),
          struct(lit("band").as("f"), col("band").cast("string").as("v"))))
          .as("fv"))
        .select(col("fv.f").as("f"), col("fv.v").as("v"))
        .groupBy("f", "v").agg(count(lit(1)).as("nv"))
        .groupBy("f")
        .agg(sum(col("nv").cast("decimal(38,0)") * (col("nv") - 1))
               .as("agree"),
             sum(col("nv").cast("decimal(38,0)")).as("n"))
        .withColumn("u", col("agree").cast("double") /
                         (col("n") * (col("n") - 1)).cast("double"))
        .withColumn("m", when(col("f") === "nat", 0.9)
                           .when(col("f") === "seg", 0.85)
                           .otherwise(0.8))
        .withColumn("wa", round(log2(col("m") / col("u")), 6))
        .withColumn("wd", round(log2((lit(1.0) - col("m")) /
                                     (lit(1.0) - col("u"))), 6))
      def wOf(f: String, c0: String) =
        max(when(col("f") === f, col(c0))).as(s"${c0}_$f")
      val weights = uTab.agg(wOf("nat", "wa"), wOf("nat", "wd"),
                             wOf("seg", "wa"), wOf("seg", "wd"),
                             wOf("band", "wa"), wOf("band", "wd"))
      // candidates = q270's w=3 sorted neighborhood, computed since
      // r14 through [[GlobalOrder.neighbors]] (bucket-distributed rank
      // + successor equi-join) instead of stacked lead()s over an
      // unpartitioned window — bit-identical pairs, no fact-scaled
      // single-partition sort (WindowBoundednessSpec-guarded)
      val led = GlobalOrder.neighbors(c,
          expr("(bal + 100000) DIV 10000"),
          Seq(col("bal"), col("k")), 3,
          Seq("k", "bal", "nat", "seg", "band"))
        .select((col("nat") === col("nat2")).cast("int").as("a_nat"),
                (col("seg") === col("seg2")).cast("int").as("a_seg"),
                (col("band") === col("band2")).cast("int").as("a_band"))
      led.crossJoin(broadcast(weights))
        .withColumn("score",
          (when(col("a_nat") === 1, col("wa_nat"))
             .otherwise(col("wd_nat")).cast("decimal(18,6)") +
           when(col("a_seg") === 1, col("wa_seg"))
             .otherwise(col("wd_seg")).cast("decimal(18,6)") +
           when(col("a_band") === 1, col("wa_band"))
             .otherwise(col("wd_band")).cast("decimal(18,6)"))
            .cast("double"))
        .withColumn("pattern",
          concat(col("a_nat").cast("string"), col("a_seg").cast("string"),
                 col("a_band").cast("string")))
        .groupBy("pattern")
        .agg(count(lit(1)).as("n_pairs"),
             round(max(col("score")), 6).as("score"))
        .orderBy("pattern")
    }
  )

  /** The q83 keep-best table `(doc_id, cluster_id, score, keep)` — also
    * the dedup stage of the composed pipeline (q104), so one definition
    * keeps "the pipeline runs q83's dedup" structural. Probes the
    * persisted cluster artifact, never re-runs the fixpoint; see q83's
    * scaladoc for the broadcast gating and the sliver-only window. */
  private[graft] def keepBest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents")
    val clusters = s.table(clusterTable(s, d))
    // count over the persisted bucketed table (footer-cheap), not a
    // recompute; 1M rows ≈ 16 MB — past that, fall back to AQE's own
    // join selection
    val bcast = if (clusters.count() <= 1000000L) broadcast(clusters)
                else clusters
    val scored = docs.select(col("doc_id"),
                             TextExtOps.qualityScore.as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("score").desc, col("doc_id"))
    val clustered = scored.join(bcast, Seq("doc_id"))
      .withColumn("keep", when(row_number().over(w) === 1, 1).otherwise(0))
      .select("doc_id", "cluster_id", "score", "keep")
    val singletons = scored.join(bcast, Seq("doc_id"),
                                 "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"), col("score"),
              lit(1).as("keep"))
    clustered.unionByName(singletons)
  }

  /** The persisted band-signature index over the even-doc_id base
    * corpus — q76's probe target, shared by q108's incremental cluster
    * maintenance (one build, two consumers). Built UNCAPPED: at test
    * SFs the hot-bucket cap is a no-op anyway (spec-asserted), and
    * q108's base-vs-batch equivalence argument needs one consistent
    * edge set — see the cap-regime caveat on q108. */
  private[graft] def bandIndexTable(s: SparkSession, d: String): String =
    graft.BucketedCache.ensure(s, d, "bandidx",
        "bk STRING, doc_id BIGINT", "bk", 8)(
      bandKeys(Tables(s, d, "documents").where(col("doc_id") % 2 === 0))
        .select("bk", "doc_id"))

  /** One EM round of q319's Fellegi–Sunter estimator (E-step posterior
    * fold → exact-decimal M-step sums → parameter update → avg
    * log-likelihood at the INCOMING parameters), reading the pattern
    * table `pat` (a1, a2, a3, ng) and the previous round's 1-row
    * parameter table `prev` (p, m1..m3, u1..u3 doubles). The SAME text
    * serves Spark's staged execution and the oracle's unrolled chain
    * (the q310 discipline). The posterior and each updated parameter
    * floor-quantize through the pure-IEEE `floor(x·1e8 + 5e-1)` chain;
    * per-pattern ln P(γ) quantizes at 1e-6; all cross-pattern sums are
    * exact decimals (order-free). out$m pairs the UPDATED parameters
    * with the likelihood of the parameters that produced them, so the
    * avg_loglik column ascends monotonically across rounds — EM's own
    * guarantee, spec-certified. */
  private def fsRound(m: Int, pat: String, prev: String): String =
    s"""e$m AS (
       |  SELECT g.a1, g.a2, g.a3, g.ng,
       |    w.p *
       |      (CASE WHEN g.a1 = 1 THEN w.m1 ELSE 1e0 - w.m1 END) *
       |      (CASE WHEN g.a2 = 1 THEN w.m2 ELSE 1e0 - w.m2 END) *
       |      (CASE WHEN g.a3 = 1 THEN w.m3 ELSE 1e0 - w.m3 END) AS pm,
       |    (1e0 - w.p) *
       |      (CASE WHEN g.a1 = 1 THEN w.u1 ELSE 1e0 - w.u1 END) *
       |      (CASE WHEN g.a2 = 1 THEN w.u2 ELSE 1e0 - w.u2 END) *
       |      (CASE WHEN g.a3 = 1 THEN w.u3 ELSE 1e0 - w.u3 END) AS pu
       |  FROM $pat g CROSS JOIN $prev w),
       |wq$m AS (
       |  SELECT a1, a2, a3, ng,
       |    CAST(floor(pm / (pm + pu) * 1e8 + 5e-1) AS DECIMAL(28,0))
       |      AS wq,
       |    CAST(floor(ln(pm + pu) * 1e6 + 5e-1) AS DECIMAL(28,0)) AS llq
       |  FROM e$m),
       |ag$m AS (
       |  SELECT
       |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * wq) AS DOUBLE) AS swn,
       |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * (100000000 - wq))
       |         AS DOUBLE) AS sun,
       |    CAST(sum(CAST(ng AS DECIMAL(38,0))) AS DOUBLE) AS nn,
       |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * wq * a1) AS DOUBLE)
       |      AS sw1,
       |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * wq * a2) AS DOUBLE)
       |      AS sw2,
       |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * wq * a3) AS DOUBLE)
       |      AS sw3,
       |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * (100000000 - wq) * a1)
       |         AS DOUBLE) AS su1,
       |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * (100000000 - wq) * a2)
       |         AS DOUBLE) AS su2,
       |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * (100000000 - wq) * a3)
       |         AS DOUBLE) AS su3,
       |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * llq) AS DOUBLE) AS sll
       |  FROM wq$m),
       |wu$m AS (
       |  SELECT
       |    CAST(floor(swn / 1e8 / nn * 1e8 + 5e-1) AS DOUBLE) / 1e8 AS p,
       |    CAST(floor(sw1 / swn * 1e8 + 5e-1) AS DOUBLE) / 1e8 AS m1,
       |    CAST(floor(sw2 / swn * 1e8 + 5e-1) AS DOUBLE) / 1e8 AS m2,
       |    CAST(floor(sw3 / swn * 1e8 + 5e-1) AS DOUBLE) / 1e8 AS m3,
       |    CAST(floor(su1 / sun * 1e8 + 5e-1) AS DOUBLE) / 1e8 AS u1,
       |    CAST(floor(su2 / sun * 1e8 + 5e-1) AS DOUBLE) / 1e8 AS u2,
       |    CAST(floor(su3 / sun * 1e8 + 5e-1) AS DOUBLE) / 1e8 AS u3
       |  FROM ag$m),
       |out$m AS (
       |  SELECT $m AS em_round, w.p, w.m1, w.m2, w.m3, w.u1, w.u2,
       |    w.u3,
       |    CAST(floor(g.sll / 1e6 / g.nn * 1e6 + 5e-1) AS DOUBLE) / 1e6
       |      AS avg_loglik
       |  FROM wu$m w CROSS JOIN ag$m g)""".stripMargin

  /** Distinct near-dup candidate pairs `(id_a < id_b)` from MinHash-LSH
    * band collisions — the edge set q82 clusters and q83 prunes.
    * `maxBucket` passes through to [[bandKeys]]' hot-bucket guard
    * (declared queries run uncapped at test SF; a production corpus
    * sets the cap so no single boilerplate bucket can go quadratic). */
  private[graft] def candidatePairs(docs: DataFrame,
                                    maxBucket: Int = Int.MaxValue): DataFrame = {
    val bk = bandKeys(docs, maxBucket = maxBucket)
    bk.select(col("bk"), col("doc_id").as("id_a"))
      .join(bk.select(col("bk"), col("doc_id").as("id_b")), Seq("bk"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** The persisted cluster artifact (the q76/q79 batch-vs-index
    * discipline applied to clustering, per the r7 verdict): q82's
    * `(doc_id, cluster_id)` output computed ONCE per (tmpdir, corpus
    * dir) by the connected-components fixpoint and written as a
    * doc_id-bucketed parquet table. Every consumer — q82's declared
    * output, q83's keep-best probe, downstream decontamination or
    * reporting — reads the table; at 100 TB the fixpoint is a
    * multi-hour job and "clusters" is a pipeline artifact with a
    * lifecycle, not a subplan to re-derive per query. The final pinned
    * labels RDD is freed as soon as the write has consumed it —
    * nothing stays resident after the table exists. */
  private[graft] def clusterTable(s: SparkSession, d: String,
                                  variant: String = "minlabel",
                                  baseOnly: Boolean = false): String = {
    val base = if (baseOnly) "clustersbase" else "clusters"
    val name = if (variant == "minlabel") base else s"${base}_$variant"
    var handle: Option[org.apache.spark.rdd.RDD[_]] = None
    try {
      graft.BucketedCache.ensure(s, d, name,
          "doc_id BIGINT, cluster_id BIGINT", "doc_id", 8) {
        // the candidate graph shares q46's declared cap (one constant,
        // one edge-set definition); `baseOnly` restricts to the
        // even-doc_id base corpus — q108's incremental starting point
        val docs = Tables(s, d, "documents")
        val (lbls, h) = connectedComponentsPinned(
          candidatePairs(if (baseOnly) docs.where(col("doc_id") % 2 === 0)
                         else docs,
                         maxBucket = HotBucketCap), variant)
        handle = Some(h)
        lbls.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
      }
    } finally handle.foreach(_.unpersist(blocking = false))
  }

  /** Connected components over an undirected pair set `(id_a, id_b)`:
    * returns `(id, lbl)` with `lbl` = min node id in the component,
    * plus the persisted RDD handle backing the result. Min-label
    * propagation to a fixpoint — see q82's scaladoc for the per-round
    * cost and the 100 TB variant. Property-tested against an in-memory
    * union-find on random graphs (PropertySpec).
    *
    * Each round is pinned on an explicit RDD handle (not
    * `localCheckpoint`, whose blocks bypass the cache manager and can't
    * be released through `Dataset.unpersist`): the logical plan is
    * truncated per round, and the PREVIOUS round's blocks are freed as
    * soon as the convergence count no longer needs them, so executor
    * storage stays O(1) in the iteration count. The final labels stay
    * pinned on the RETURNED handle — the caller frees it once the
    * result is consumed ([[clusterTable]] frees it right after the
    * table write), so the pinned-block lifetime is scoped to one
    * consumer instead of a module-global slot (the r7-advice race: a
    * global "last labels" slot let a second invocation free blocks a
    * first caller's unexecuted plan still referenced).
    *
    * Dispatch: `"minlabel"` (default — O(diameter) rounds, right for
    * LSH near-cliques) or `"star"` (large-star/small-star, O(log n)
    * rounds — the cluster-scale path for long-chain graphs, declared
    * as q102). Both return the identical `(id, lbl = component min)`
    * table; equivalence property-tested on random long-path graphs. */
  private[graft] def connectedComponentsPinned(pairs: DataFrame,
      variant: String = "minlabel"): (DataFrame, org.apache.spark.rdd.RDD[_]) =
    variant match {
      case "star" => connectedComponentsStar(pairs)
      case "minlabel" => connectedComponentsMinLabel(pairs)
      case other => throw new IllegalArgumentException(
        s"unknown components variant '$other' (minlabel|star)")
    }

  /** Test convenience: [[connectedComponentsPinned]] with the handle
    * released immediately — the result recomputes from lineage if
    * consumed more than once (never wrong, just slower; production
    * callers go through [[clusterTable]]). */
  private[graft] def connectedComponents(pairs: DataFrame,
                                         variant: String = "minlabel"): DataFrame = {
    val (df, h) = connectedComponentsPinned(pairs, variant)
    h.unpersist(blocking = false)
    df
  }

  /** Connected components of a BOUNDED graph folded in ONE task (r19
    * optimization, guide §1.2 step 1 / §2.4): for graphs whose node
    * count is pinned by construction — q278's density grid is ≤
    * (4/0.05)² = 6400 cells regardless of corpus size — the min-label
    * fixpoint's per-round scheduler jobs (2 jobs + a labelSum action
    * per round, ~70 jobs measured at sf0.1) cost more wall-clock than
    * the entire fold. The edge set funnels into one task and a plain
    * union-find labels every node with its component MINIMUM: unions
    * always attach the larger root under the smaller, so each tree's
    * root is the min member by invariant — the identical (id, lbl)
    * relation the fixpoint converges to, for any input. Corpus-scale
    * graphs (q82's LSH components et al.) keep the distributed
    * variants; this one is only for graphs a DESIGN bound keeps tiny. */
  private[graft] def connectedComponentsBounded(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        val ids = parent.keysIterator.toArray
        ids.iterator.map(id => (id, find(id)))
      }
      .toDF("id", "lbl")
  }

  private def connectedComponentsMinLabel(
      pairs: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    // materialize each round on a persisted internal-row RDD (the
    // localCheckpoint mechanics, no Row round-trip) and restart the
    // logical plan from it; the handle lets us drop exactly this
    // round's blocks
    def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
    val (edges, edgesRdd) =
      pin(pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v"))))
    var (labels, labelsRdd) =
      pin(edges.select(col("u").as("id")).distinct()
        .select(col("id"), col("id").as("lbl")))
    // Convergence test: labels only ever DECREASE under min-propagation
    // (new = min(old, propagated)), so any change strictly lowers the
    // label sum — sum-unchanged ⟺ fixpoint. One cheap aggregate action
    // per round instead of a self-join diff count. DECIMAL(38) sum so
    // the test cannot wrap even with billions of 64-bit node ids;
    // coalesce covers the empty-graph case.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
                      lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")))
        .head().getDecimal(0)
    var prevSum: java.math.BigDecimal = null
    var curSum = labelSum(labels)
    while (prevSum == null || curSum.compareTo(prevSum) != 0) {
      val prop = edges.join(labels.withColumnRenamed("id", "u"), Seq("u"))
        .select(col("v").as("id"), col("lbl"))
      val (next, nextRdd) = pin(labels.unionAll(prop)
        .groupBy("id").agg(min("lbl").as("lbl")))
      prevSum = curSum
      curSum = labelSum(next)
      labelsRdd.unpersist(blocking = false)
      labels = next
      labelsRdd = nextRdd
    }
    edgesRdd.unpersist(blocking = false)
    (labels, labelsRdd)
  }

  /** The alternating large-star/small-star connected-components variant
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * O(log n) rounds on ANY graph, vs the min-label fixpoint's
    * O(diameter). LSH candidate components are near-cliques (diameter
    * 2-3), so q82/q83 declare the simpler fixpoint; this is the
    * documented cluster-scale path for graphs with long chains
    * (incremental crawls, cross-snapshot link graphs), now coded and
    * property-tested against the fixpoint on exactly such graphs.
    *
    * Edges are kept canonical (u > v, "u points at v"). Per round:
    *  - large-star: every node u connects its LARGER neighbors to the
    *    minimum of its neighborhood ∪ itself — long chains contract
    *    onto local minima in parallel (this is what buys O(log n));
    *  - small-star: every node u re-points itself and its smaller
    *    non-min neighbors at the minimum of its smaller neighborhood.
    * Each transform is one shuffle (groupBy u for the neighborhood min
    * + a join back), the same join+agg primitives as the fixpoint, and
    * each round is pinned/freed with the identical O(1)-storage
    * discipline. Terminal state: a star per component, every node
    * pointing at its component min. Convergence is an EXACT set
    * equality test: both rounds' edge sets are distinct by
    * construction, so next == edges ⟺ |next| == |edges| ∧
    * (next ∖ edges) = ∅ — one count per round (needed anyway to
    * materialize the pin) plus a set-difference emptiness probe only
    * when the counts agree. (The r7 cut compared a (count, Σu, Σv)
    * checksum triple, which is not injective — two different edge sets
    * can collide and exit the loop early with wrong labels; unlike the
    * min-label variant's label sum there is no monotonicity argument
    * to make a checksum sound here.) */
  private[graft] def connectedComponentsStar(
      pairs: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
    val nodes = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    var (edges, edgesRdd) = pin(pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
              least(col("id_a"), col("id_b")).as("v"))
      .where(col("u") =!= col("v")).distinct())
    def sym(e: DataFrame) =
      e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val mins = s.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"))
      s.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val small = sym(e).where(col("v") < col("u"))
      val mins = small.groupBy("u").agg(min(col("v")).as("m"))
      mins.select(col("u"), col("m").as("v"))
        .unionAll(small.join(mins, "u").where(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
    }
    var curCount = edges.count()
    var converged = false
    while (!converged) {
      val (next, nextRdd) = pin(smallStar(largeStar(edges)))
      val nextCount = next.count()
      // exact equality of the (distinct) edge sets; the diff probe runs
      // only on equal counts, and a converged round's sets are small
      converged = nextCount == curCount && next.exceptAll(edges).isEmpty
      edgesRdd.unpersist(blocking = false)
      edges = next
      edgesRdd = nextRdd
      curCount = nextCount
    }
    val out = nodes
      .join(edges.groupBy("u").agg(min("v").as("m"))
              .withColumnRenamed("u", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("m"), col("id")).as("lbl"))
    (out, edgesRdd)
  }

  private[graft] def minhashCte: String = {
    val hs = (0 until NumHashes)
      .map(i => s"min(substr(m || m, ${1 + 4 * i}, 32)) AS h$i").mkString(", ")
    val bandRows = (0 until Bands)
      .map(j => s"SELECT doc_id, $j AS band, h${2 * j} || h${2 * j + 1} AS sig FROM sigs")
      .mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, md5(unnest(
       |    list_transform(range(1, len(t) - 1),
       |                   i -> array_to_string(t[i:i+2], ' ')))) AS m
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)),
       |sigs AS (SELECT doc_id, $hs FROM toks GROUP BY doc_id),
       |bands AS ($bandRows)""".stripMargin
  }

  /** The recursive-reachability cluster CTE shared by the q82/q83
    * oracles (and q104's composed-pipeline oracle in TextExtOps):
    * `clusters(doc_id, cluster_id)` over the LSH candidate graph,
    * cluster_id = min node id in the component. */
  private[operators] def clustersCte: String =
    s"""${minhashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.sig = y.sig
       |          AND x.doc_id < y.doc_id),
       |edges AS (SELECT id_a AS u, id_b AS v FROM cand
       |          UNION SELECT id_b, id_a FROM cand),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |clusters AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id
       |             FROM reach GROUP BY u)""".stripMargin

  private def simhashBits: String =
    (0 until 16).map { p =>
      val j = p / 4 + 1
      val pw = 1 << (p % 4)
      s"sum(((strpos('0123456789abcdef', substr(h, $j, 1)) - 1) // $pw) % 2 * 2 - 1) AS s$p"
    }.mkString(", ")

  /** q300's 64-bit extension of [[simhashBits]] (nibbles 1-16). */
  private[graft] def simhashBits64: String =
    (0 until 64).map { p =>
      val j = p / 4 + 1
      val pw = 1 << (p % 4)
      s"sum(((strpos('0123456789abcdef', substr(h, $j, 1)) - 1) // $pw) % 2 * 2 - 1) AS s$p"
    }.mkString(", ")

  def oracles: Map[String, String] = Map(
    // same prefix blocking + hot-block cap, same rounded-Jaccard
    // mutual-argmax with (jac desc, partner asc) tie order
    "q238_reciprocal_match" ->
      """WITH dd AS (
        |  SELECT doc_id, substr(text, 1, 20) AS blk,
        |    list_distinct(list_filter(string_split(text, ' '),
        |                              t -> len(t) > 0)) AS toks
        |  FROM documents),
        |ok AS (SELECT blk FROM dd GROUP BY blk HAVING count(*) <= 64),
        |dc AS (SELECT dd.* FROM dd JOIN ok USING (blk)),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |          CAST(len(a.toks) + len(b.toks) -
        |               len(list_intersect(a.toks, b.toks)) AS DOUBLE), 6)
        |      AS jac
        |  FROM dc a JOIN dc b
        |    ON a.blk = b.blk AND a.doc_id < b.doc_id),
        |dirs AS (
        |  SELECT id_a AS id, id_b AS p, jac FROM cand
        |  UNION ALL
        |  SELECT id_b AS id, id_a AS p, jac FROM cand),
        |best AS (
        |  SELECT id, p, jac FROM (
        |    SELECT id, p, jac, row_number() OVER (
        |        PARTITION BY id ORDER BY jac DESC, p ASC) AS rk
        |    FROM dirs) WHERE rk = 1)
        |SELECT x.id AS id_a, x.p AS id_b, x.jac AS jac
        |FROM best x JOIN best y
        |  ON x.id = y.p AND x.p = y.id AND x.id < x.p
        |ORDER BY id_a""".stripMargin,

    // same blocking + cap, same declared small side, same integer
    // threshold inter*10 >= nsmall*9
    "q241_containment_dedup" ->
      """WITH dd AS (
        |  SELECT doc_id, substr(text, 1, 20) AS blk,
        |    list_distinct(list_filter(string_split(text, ' '),
        |                              t -> len(t) > 0)) AS toks
        |  FROM documents),
        |ok AS (SELECT blk FROM dd GROUP BY blk HAVING count(*) <= 64),
        |dc AS (SELECT dd.* FROM dd JOIN ok USING (blk)),
        |sc AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib,
        |    len(list_intersect(a.toks, b.toks)) AS inter,
        |    len(a.toks) AS na, len(b.toks) AS nb
        |  FROM dc a JOIN dc b ON a.blk = b.blk AND a.doc_id < b.doc_id),
        |dir AS (
        |  SELECT CASE WHEN na <= nb THEN ia ELSE ib END AS id_small,
        |    CASE WHEN na <= nb THEN ib ELSE ia END AS id_big,
        |    inter, least(na, nb) AS nsmall, na + nb - inter AS uni
        |  FROM sc)
        |SELECT id_small, id_big,
        |  round(CAST(inter AS DOUBLE) / CAST(nsmall AS DOUBLE), 6)
        |    AS containment,
        |  round(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 6)
        |    AS jaccard
        |FROM dir WHERE inter * 10 >= nsmall * 9
        |ORDER BY id_small, id_big""".stripMargin,

    // truth = q324's independent full-join text; candidates = q46's
    // minhash banding text; the attestation is count arithmetic
    "q338_lsh_recall" ->
      s"""$minhashCte,
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |      FROM documents),
         |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 3)) AS i
         |        FROM w WHERE len(ws) >= 5),
         |sh5 AS (SELECT DISTINCT doc_id,
         |          ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
         |          ws[i+3] || ' ' || ws[i+4] AS t
         |        FROM idx),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh5 GROUP BY 1),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    count(*) AS inter_sh
         |  FROM sh5 a JOIN sh5 b ON a.t = b.t AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (SELECT id_a, id_b FROM inter
         |  JOIN sz za ON id_a = za.doc_id JOIN sz zb ON id_b = zb.doc_id
         |  WHERE 10 * inter_sh >= 6 * (za.n + zb.n - inter_sh)),
         |lsh AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |        FROM bands x JOIN bands y
         |          ON x.band = y.band AND x.sig = y.sig
         |         AND x.doc_id < y.doc_id),
         |h AS (SELECT count(*) AS caught FROM truth t
         |      WHERE EXISTS (SELECT 1 FROM lsh l
         |                    WHERE l.id_a = t.id_a AND l.id_b = t.id_b)),
         |tp AS (SELECT count(*) AS true_pairs FROM truth),
         |lc AS (SELECT count(*) AS lsh_candidates FROM lsh)
         |SELECT tp.true_pairs, h.caught,
         |  tp.true_pairs - h.caught AS missed,
         |  CASE WHEN tp.true_pairs = 0 THEN 0
         |       ELSE (1000000 * h.caught) // tp.true_pairs END
         |    AS recall_ppm,
         |  lc.lsh_candidates
         |FROM tp, h, lc""".stripMargin,

    // the INDEPENDENT algorithm: full all-token intersection join with
    // no prefix filter, no length filter, no cap — two algorithms,
    // one pair set (the q289 discipline)
    "q324_setsim_prefix" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 3)) AS i
        |        FROM w WHERE len(ws) >= 5),
        |sh AS (SELECT DISTINCT doc_id,
        |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
        |         ws[i+3] || ' ' || ws[i+4] AS t
        |       FROM idx),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    count(*) AS inter_sh
        |  FROM sh a JOIN sh b ON a.t = b.t AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (SELECT id_a, id_b, inter_sh,
        |    za.n + zb.n - inter_sh AS union_sh, za.n AS na, zb.n AS nb
        |  FROM inter JOIN sz za ON id_a = za.doc_id
        |             JOIN sz zb ON id_b = zb.doc_id)
        |SELECT id_a, id_b, inter_sh, union_sh,
        |  (1000000 * inter_sh) // union_sh AS jac_ppm
        |FROM j WHERE 10 * inter_sh >= 6 * union_sh
        |ORDER BY id_a, id_b""".stripMargin,

    "q46_dedup_minhash" ->
      s"""$minhashCte
         |SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_bands
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
         |GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin,

    // the incremental split (new = odd doc_ids vs index = the rest) must
    // produce exactly the full self-join's pairs restricted to those
    // touching at least one new doc — that restriction IS the oracle
    "q76_dedup_incremental" ->
      s"""$minhashCte
         |SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_bands
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
         |WHERE x.doc_id % 2 = 1 OR y.doc_id % 2 = 1
         |GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin,

    // the three synchronous LPA rounds unrolled as CTEs — integer
    // counts + the declared tie-break, so the iterative result
    // hash-matches
    "q182_label_prop" -> {
      val rounds = (1 to 3).map { i =>
        s"""l$i AS (SELECT u AS id, lab FROM (
           |  SELECT e.u, l.lab,
           |    row_number() OVER (PARTITION BY e.u
           |      ORDER BY count(*) DESC, l.lab) AS rk
           |  FROM e JOIN l${i - 1} l ON e.v = l.id
           |  GROUP BY e.u, l.lab) WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      s"""$minhashCte,
         |p AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |      FROM bands x JOIN bands y
         |        ON x.band = y.band AND x.sig = y.sig
         |       AND x.doc_id < y.doc_id),
         |e AS (SELECT a AS u, b AS v FROM p
         |      UNION ALL SELECT b, a FROM p),
         |l0 AS (SELECT DISTINCT u AS id, u AS lab FROM e),
         |$rounds
         |SELECT id AS doc_id, lab AS lpa_label FROM l3
         |ORDER BY doc_id""".stripMargin
    },

    // recursive-CTE reachability over the symmetric candidate-edge set;
    // a node's cluster = least(self, min reachable) — identical to the
    // label-propagation fixpoint (symmetric edges put self in reach)
    "q82_dedup_clusters" ->
      s"""$clustersCte
         |SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id""".stripMargin,

    // the star variant must produce EXACTLY the min-label fixpoint's
    // table — one oracle text, two independent distributed algorithms
    "q102_clusters_star" ->
      s"""$clustersCte
         |SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id""".stripMargin,

    "q218_dedup_threshold_sweep" ->
      s"""$minhashCte,
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.sig = y.sig
         |          AND x.doc_id < y.doc_id),
         |sh AS (SELECT doc_id, list(DISTINCT m) AS s FROM toks
         |       GROUP BY doc_id),
         |j AS (SELECT c.id_a, c.id_b,
         |        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |        CAST(len(a.s) + len(b.s) -
         |             len(list_intersect(a.s, b.s)) AS DOUBLE) AS jac
         |      FROM cand c JOIN sh a ON c.id_a = a.doc_id
         |                 JOIN sh b ON c.id_b = b.doc_id),
         |t(threshold) AS (VALUES (CAST(0.01 AS DOUBLE)),
         |                        (CAST(0.5 AS DOUBLE)),
         |                        (CAST(0.95 AS DOUBLE)))
         |SELECT t.threshold,
         |  (SELECT count(*) FROM cand) AS candidate_pairs,
         |  CAST(sum(CASE WHEN j.jac >= t.threshold THEN 1 ELSE 0 END)
         |       AS BIGINT) AS confirmed_pairs,
         |  round(CAST(sum(CASE WHEN j.jac >= t.threshold
         |                      THEN 1 ELSE 0 END) AS DOUBLE) /
         |        (SELECT count(*) FROM cand), 6) AS precision
         |FROM t CROSS JOIN j GROUP BY t.threshold
         |ORDER BY threshold""".stripMargin,

    // same windowed-min minimizer set, same hot cap, same ≥2-shared
    // pair rule — the SQL mirror of the per-doc window + signature join
    "q227_minimizer_pairs" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
        |            FROM documents
        |            WHERE len(string_split(text, ' ')) >= 8),
        |idx AS (SELECT doc_id, t, len(t) - 7 AS ng,
        |          unnest(generate_series(1, len(t) - 7)) AS i FROM tk),
        |g AS (SELECT doc_id, ng, i,
        |        md5(array_to_string(t[i:i+7], ' ')) AS h FROM idx),
        |wm AS (SELECT doc_id, i, ng,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                 ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS m
        |  FROM g),
        |mz AS (SELECT DISTINCT doc_id, m FROM wm WHERE i <= ng - 4),
        |cap AS (SELECT m FROM mz GROUP BY m HAVING count(*) <= 64),
        |mzc AS (SELECT mz.doc_id, mz.m FROM mz JOIN cap USING (m))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  count(*) AS n_shared
        |FROM mzc a JOIN mzc b ON a.m = b.m AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY 1, 2""".stripMargin,

    // q227's full pair set restricted to pairs touching the odd batch
    // — the wholesale per-m cap makes probing the capped index equal
    // to capping both sides, so the restriction IS the semantics
    "q341_minimizer_incremental" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
        |            FROM documents
        |            WHERE len(string_split(text, ' ')) >= 8),
        |idx AS (SELECT doc_id, t, len(t) - 7 AS ng,
        |          unnest(generate_series(1, len(t) - 7)) AS i FROM tk),
        |g AS (SELECT doc_id, ng, i,
        |        md5(array_to_string(t[i:i+7], ' ')) AS h FROM idx),
        |wm AS (SELECT doc_id, i, ng,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                 ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS m
        |  FROM g),
        |mz AS (SELECT DISTINCT doc_id, m FROM wm WHERE i <= ng - 4),
        |cap AS (SELECT m FROM mz GROUP BY m HAVING count(*) <= 64),
        |mzc AS (SELECT mz.doc_id, mz.m FROM mz JOIN cap USING (m))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  count(*) AS n_shared
        |FROM mzc a JOIN mzc b ON a.m = b.m AND a.doc_id < b.doc_id
        |WHERE a.doc_id % 2 = 1 OR b.doc_id % 2 = 1
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY 1, 2""".stripMargin,

    // same 8-token windows, same md5 gram identity, same ≥2-distinct-
    // docs rule — the SQL mirror of the generator flatMap
    "q219_substring_dup" ->
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |            FROM documents
        |            WHERE len(string_split(text, ' ')) >= 8),
        |idx AS (SELECT doc_id, source, t,
        |          unnest(generate_series(1, len(t) - 7)) AS i FROM tk),
        |grams AS (SELECT doc_id, source,
        |            md5(array_to_string(t[i:i+7], ' ')) AS h FROM idx),
        |duph AS (SELECT h FROM grams GROUP BY h
        |         HAVING count(DISTINCT doc_id) >= 2),
        |pd AS (SELECT doc_id, source, count(*) AS ng
        |       FROM grams GROUP BY 1, 2),
        |dd AS (SELECT doc_id, count(*) AS dg FROM grams
        |       WHERE h IN (SELECT h FROM duph) GROUP BY 1)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(ng) AS BIGINT) AS n_grams,
        |  CAST(sum(coalesce(dg, 0)) AS BIGINT) AS dup_grams,
        |  CAST(sum(CASE WHEN coalesce(dg, 0) > 0 THEN 1 ELSE 0 END)
        |       AS BIGINT) AS docs_hit,
        |  round(CAST(sum(coalesce(dg, 0)) AS DOUBLE) /
        |        CAST(sum(ng) AS DOUBLE), 6) AS dup_ratio
        |FROM pd LEFT JOIN dd USING (doc_id)
        |GROUP BY source ORDER BY source""".stripMargin,

    // the artifact must be invisible: the report equals the same
    // rollup over the recursive-CTE clustering of the full corpus
    "q211_dup_rate_by_source" ->
      s"""$clustersCte
         |SELECT d.source, count(*) AS docs,
         |  count(c.cluster_id) AS clustered_docs,
         |  CAST(sum(CASE WHEN c.cluster_id IS NOT NULL
         |                 AND c.cluster_id <> d.doc_id
         |                THEN 1 ELSE 0 END) AS BIGINT) AS redundant_docs,
         |  round(CAST(sum(CASE WHEN c.cluster_id IS NOT NULL
         |                       AND c.cluster_id <> d.doc_id
         |                      THEN 1 ELSE 0 END) AS DOUBLE) /
         |        count(*), 6) AS dup_rate
         |FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // the incremental merge must produce EXACTLY the full-corpus
    // clustering — q82's oracle verbatim: base stars ∪ new edges has
    // the same components as the full candidate graph
    "q108_clusters_incremental" ->
      s"""$clustersCte
         |SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id""".stripMargin,

    // bounded recursive walk + min-dist reduction — first discovery in
    // the engine's ordered rounds ≡ the minimum over all ≤3-hop walks
    "q138_bfs_layers" ->
      s"""${minhashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.sig = y.sig
         |          AND x.doc_id < y.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM cand
         |          UNION ALL SELECT id_b, id_a FROM cand),
         |src AS (SELECT u AS id FROM (
         |          SELECT u, count(*) AS deg FROM edges GROUP BY u
         |          ORDER BY deg DESC, u LIMIT 1)),
         |walk(v, dist) AS (
         |  SELECT id, 0 FROM src
         |  UNION ALL
         |  SELECT e.v, w.dist + 1 FROM walk w JOIN edges e ON e.u = w.v
         |  WHERE w.dist < 3)
         |SELECT v AS doc_id, CAST(min(dist) AS BIGINT) AS dist
         |FROM walk GROUP BY v ORDER BY doc_id""".stripMargin,

    // three computation paths, one answer: q138's iterative frontier
    // loop, Spark's native recursive CTE (q217), and this DuckDB
    // recursive oracle — the text is q138's verbatim
    "q217_bfs_recursive" ->
      s"""${minhashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.sig = y.sig
         |          AND x.doc_id < y.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM cand
         |          UNION ALL SELECT id_b, id_a FROM cand),
         |src AS (SELECT u AS id FROM (
         |          SELECT u, count(*) AS deg FROM edges GROUP BY u
         |          ORDER BY deg DESC, u LIMIT 1)),
         |walk(v, dist) AS (
         |  SELECT id, 0 FROM src
         |  UNION ALL
         |  SELECT e.v, w.dist + 1 FROM walk w JOIN edges e ON e.u = w.v
         |  WHERE w.dist < 3)
         |SELECT v AS doc_id, CAST(min(dist) AS BIGINT) AS dist
         |FROM walk GROUP BY v ORDER BY doc_id""".stripMargin,

    // oriented a<b<c enumeration: wedge join + closing-edge semi join,
    // each triangle exploded to its three corners
    "q132_triangles" ->
      s"""$minhashCte,
         |e AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |      FROM bands x JOIN bands y
         |        ON x.band = y.band AND x.sig = y.sig
         |       AND x.doc_id < y.doc_id),
         |tri AS (SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
         |        FROM e e1 JOIN e e2 ON e2.id_a = e1.id_b
         |        WHERE EXISTS (SELECT 1 FROM e e3
         |                      WHERE e3.id_a = e1.id_a
         |                        AND e3.id_b = e2.id_b)),
         |corners AS (SELECT a AS doc_id FROM tri
         |            UNION ALL SELECT b FROM tri
         |            UNION ALL SELECT c FROM tri)
         |SELECT doc_id, count(*) AS n_triangles
         |FROM corners GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the 5 fixed-point power-iteration rounds unrolled as CTEs —
    // integer arithmetic only, so the iterative result hash-matches
    // same LSH candidate graph; synchronous peel unrolled with
    // MATERIALIZED survivor sets (each is referenced three times)
    "q328_kcore" -> {
      val rounds = (1 to 4).map { r =>
        s"""d$r AS (SELECT e.u, count(*) AS deg
           |  FROM edges e JOIN a${r - 1} x ON e.u = x.id
           |               JOIN a${r - 1} y ON e.v = y.id
           |  GROUP BY e.u),
           |a$r AS MATERIALIZED (SELECT u AS id FROM d$r WHERE deg >= 2),
           |s$r AS (SELECT $r AS peel_round,
           |  (SELECT count(*) FROM a${r - 1}) -
           |  (SELECT count(*) FROM a$r) AS removed,
           |  (SELECT count(*) FROM a$r) AS remaining)""".stripMargin
      }.mkString(",\n")
      s"""$minhashCte,
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.sig = y.sig
         |          AND x.doc_id < y.doc_id),
         |edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM cand
         |          UNION ALL SELECT id_b, id_a FROM cand),
         |a0 AS MATERIALIZED (SELECT DISTINCT u AS id FROM edges),
         |$rounds
         |SELECT CAST(peel_round AS BIGINT) AS peel_round,
         |  CAST(removed AS BIGINT) AS removed,
         |  CAST(remaining AS BIGINT) AS remaining
         |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
         |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
         |ORDER BY peel_round""".stripMargin
    },

    "q115_pagerank" -> {
      val rounds = (0 until 5).map { i =>
        s"""c$i AS (SELECT e.v AS id, sum(r$i.r // d.deg) AS sc
           |        FROM edges e JOIN deg d ON d.u = e.u
           |                     JOIN r$i ON r$i.id = e.u
           |        GROUP BY e.v),
           |r${i + 1} AS (SELECT deg.u AS id,
           |          CAST(150000000000 + (85 * COALESCE(sc, 0)) // 100
           |               AS BIGINT) AS r
           |        FROM deg LEFT JOIN c$i ON c$i.id = deg.u)""".stripMargin
      }.mkString(",\n")
      s"""$minhashCte,
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.sig = y.sig
         |          AND x.doc_id < y.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM cand
         |          UNION ALL SELECT id_b, id_a FROM cand),
         |deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY u),
         |r0 AS (SELECT u AS id, CAST(1000000000000 AS BIGINT) AS r FROM deg),
         |$rounds
         |SELECT id AS doc_id, r AS rank_fp FROM r5 ORDER BY doc_id""".stripMargin
    },

    // same reachability clusters + q49's score formula; keep bit = first
    // by (score DESC, doc_id) within each cluster, singletons keep
    "q83_dedup_keep_best" ->
      s"""$clustersCte,
         |scored AS (
         |  SELECT doc_id, ${TextExtOps.qualityScoreSql} AS score
         |  FROM documents),
         |j AS (
         |  SELECT s.doc_id, coalesce(c.cluster_id, s.doc_id) AS cluster_id,
         |         s.score
         |  FROM scored s LEFT JOIN clusters c ON s.doc_id = c.doc_id)
         |SELECT doc_id, cluster_id, score,
         |  CAST((row_number() OVER (PARTITION BY cluster_id
         |         ORDER BY score DESC, doc_id) = 1) AS INT) AS keep
         |FROM j ORDER BY doc_id""".stripMargin,

    "q47_dedup_simhash" ->
      s"""WITH t AS (
         |  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents),
         |fps AS (
         |  SELECT doc_id, ${(0 until 16).map(p => s"CASE WHEN s$p > 0 THEN '1' ELSE '0' END").mkString(" || ")} AS fp
         |  FROM (SELECT doc_id, $simhashBits FROM t GROUP BY doc_id)),
         |buckets AS (SELECT fp, count(*) AS bucket_size FROM fps GROUP BY fp)
         |SELECT doc_id, fps.fp, bucket_size FROM fps JOIN buckets ON fps.fp = buckets.fp
         |ORDER BY doc_id""".stripMargin,

    // same 64-bit fingerprint, same 4×16 pigeonhole bands + cap, same
    // exact 64-position Hamming verify and k = 3 radius
    "q300_simhash_hamming" -> {
      val fpConcat = (0 until 64)
        .map(p => s"CASE WHEN s$p > 0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      val hamSql = (1 to 64).map(i =>
        s"CASE WHEN substr(a.fp, $i, 1) <> substr(b.fp, $i, 1) " +
          "THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
         |  FROM documents),
         |fps AS MATERIALIZED (
         |  SELECT doc_id, $fpConcat AS fp
         |  FROM (SELECT doc_id, $simhashBits64 FROM t GROUP BY doc_id)),
         |bands AS (
         |  SELECT doc_id, band, substr(fp, band * 16 + 1, 16) AS bk
         |  FROM fps, (SELECT unnest([0, 1, 2, 3]) AS band) u),
         |capped AS (
         |  SELECT * FROM (
         |    SELECT *, count(*) OVER (PARTITION BY band, bk) AS bn
         |    FROM bands)
         |  WHERE bn <= $HotBucketCap),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM capped x JOIN capped y
         |    ON x.band = y.band AND x.bk = y.bk
         |   AND x.doc_id < y.doc_id),
         |v AS (
         |  SELECT id_a, id_b, CAST($hamSql AS BIGINT) AS hamming
         |  FROM cand JOIN fps a ON cand.id_a = a.doc_id
         |            JOIN fps b ON cand.id_b = b.doc_id)
         |SELECT id_a, id_b, hamming FROM v
         |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin
    },

    // the full both-sides computation inlined: identical fingerprints,
    // per-side capped band buckets (index cap restated as the even
    // side's posting filter), new-vs-old + new-vs-new candidates, the
    // same exact 64-position verify
    "q340_hamming_incremental" -> {
      val fpConcat = (0 until 64)
        .map(p => s"CASE WHEN s$p > 0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      val hamSql = (1 to 64).map(i =>
        s"CASE WHEN substr(a.fp, $i, 1) <> substr(b.fp, $i, 1) " +
          "THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
         |  FROM documents),
         |fps AS MATERIALIZED (
         |  SELECT doc_id, $fpConcat AS fp
         |  FROM (SELECT doc_id, $simhashBits64 FROM t GROUP BY doc_id)),
         |bands AS (
         |  SELECT doc_id, band, substr(fp, band * 16 + 1, 16) AS bk
         |  FROM fps, (SELECT unnest([0, 1, 2, 3]) AS band) u),
         |oc AS (
         |  SELECT * FROM (
         |    SELECT *, count(*) OVER (PARTITION BY band, bk) AS bn
         |    FROM bands WHERE doc_id % 2 = 0)
         |  WHERE bn <= $HotBucketCap),
         |nc AS (
         |  SELECT * FROM (
         |    SELECT *, count(*) OVER (PARTITION BY band, bk) AS bn
         |    FROM bands WHERE doc_id % 2 = 1)
         |  WHERE bn <= $HotBucketCap),
         |cand AS (
         |  SELECT DISTINCT least(n.doc_id, o.doc_id) AS id_a,
         |    greatest(n.doc_id, o.doc_id) AS id_b
         |  FROM nc n JOIN oc o ON n.band = o.band AND n.bk = o.bk
         |  UNION
         |  SELECT DISTINCT x.doc_id, y.doc_id
         |  FROM nc x JOIN nc y
         |    ON x.band = y.band AND x.bk = y.bk
         |   AND x.doc_id < y.doc_id),
         |v AS (
         |  SELECT id_a, id_b, CAST($hamSql AS BIGINT) AS hamming
         |  FROM cand JOIN fps a ON cand.id_a = a.doc_id
         |            JOIN fps b ON cand.id_b = b.doc_id)
         |SELECT id_a, id_b, hamming FROM v
         |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin
    },

    "q262_source_mirror" ->
      """WITH g AS (
        |  SELECT DISTINCT source,
        |    md5(unnest(list_transform(range(1, len(t) - 6),
        |        i -> array_to_string(t[i:i+7], ' ')))) AS m
        |  FROM (SELECT source, string_split(text, ' ') AS t
        |        FROM documents)),
        |sz AS (SELECT source, count(*) AS sz FROM g GROUP BY 1),
        |inter AS (
        |  SELECT a.source AS s1, b.source AS s2, count(*) AS inter
        |  FROM g a JOIN g b ON a.m = b.m AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT s1, s2, inter,
        |  round(CAST(inter AS DOUBLE) /
        |        CAST(x.sz + y.sz - inter AS DOUBLE), 6) AS jaccard,
        |  round(CAST(inter AS DOUBLE) /
        |        CAST(least(x.sz, y.sz) AS DOUBLE), 6) AS containment
        |FROM inter JOIN sz x ON inter.s1 = x.source
        |           JOIN sz y ON inter.s2 = y.source
        |ORDER BY jaccard DESC, s1, s2 LIMIT 20""".stripMargin,

    "q270_sorted_neighborhood" ->
      """WITH c AS (
        |  SELECT c_custkey AS k,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal
        |  FROM customer),
        |led AS (
        |  SELECT k, bal,
        |    lead(k, 1) OVER w AS k1, lead(bal, 1) OVER w AS b1,
        |    lead(k, 2) OVER w AS k2, lead(bal, 2) OVER w AS b2,
        |    lead(k, 3) OVER w AS k3, lead(bal, 3) OVER w AS b3
        |  FROM c WINDOW w AS (ORDER BY bal, k)),
        |u AS (
        |  SELECT k, bal, k1 AS kk, b1 AS bb FROM led
        |  UNION ALL SELECT k, bal, k2, b2 FROM led
        |  UNION ALL SELECT k, bal, k3, b3 FROM led)
        |SELECT k AS cust_a, kk AS cust_b, bb - bal AS diff_cents
        |FROM u
        |WHERE kk IS NOT NULL AND bb - bal <= 10
        |ORDER BY diff_cents, cust_a, cust_b LIMIT 30""".stripMargin,

    "q284_assortativity" ->
      s"""$minhashCte,
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.sig = y.sig
         |          AND x.doc_id < y.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM cand
         |          UNION ALL SELECT id_b, id_a FROM cand),
         |deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY u),
         |j AS (
         |  SELECT du.deg AS du, dv.deg AS dv
         |  FROM edges e JOIN deg du ON e.u = du.u
         |               JOIN deg dv ON e.v = dv.u),
         |m AS (
         |  SELECT count(*) AS n_edges,
         |    sum(CAST(du AS DECIMAL(38,0))) AS sx,
         |    sum(CAST(dv AS DECIMAL(38,0))) AS sy,
         |    sum(CAST(du AS DECIMAL(38,0)) * du) AS sxx,
         |    sum(CAST(dv AS DECIMAL(38,0)) * dv) AS syy,
         |    sum(CAST(du AS DECIMAL(38,0)) * dv) AS sxy
         |  FROM j)
         |SELECT n_edges,
         |  round(CAST(sx AS DOUBLE) / CAST(n_edges AS DOUBLE), 6)
         |    AS avg_deg,
         |  round(CAST(n_edges * sxy - sx * sy AS DOUBLE) /
         |        sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE) *
         |             CAST(n_edges * syy - sy * sy AS DOUBLE)), 6)
         |    AS assortativity
         |FROM m""".stripMargin,

    // same candidate edges, same capped centers, same once-rounded
    // 1/ln(deg) decimal terms and non-edge anti-join
    "q313_adamic_adar" ->
      s"""$minhashCte,
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.sig = y.sig
         |          AND x.doc_id < y.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM cand
         |          UNION ALL SELECT id_b, id_a FROM cand),
         |cent AS (
         |  SELECT u AS z,
         |    CAST(round(CAST(1.0 AS DOUBLE) / ln(CAST(deg AS DOUBLE)), 6)
         |         AS DECIMAL(28,6)) AS aa
         |  FROM (SELECT u, count(*) AS deg FROM edges GROUP BY u)
         |  WHERE deg <= $WedgeHubCap AND deg >= 2),
         |wed AS (
         |  SELECT a.u AS u, b.u AS w, c.aa
         |  FROM edges a JOIN cent c ON a.v = c.z
         |       JOIN edges b ON b.v = a.v
         |  WHERE a.u < b.u),
         |sc AS (SELECT u, w, count(*) AS n_common, sum(aa) AS aa_dec
         |       FROM wed GROUP BY 1, 2),
         |nn AS (SELECT sc.* FROM sc
         |       LEFT JOIN cand ON sc.u = cand.id_a AND sc.w = cand.id_b
         |       WHERE cand.id_a IS NULL)
         |SELECT u AS id_a, w AS id_b, n_common,
         |  CAST(aa_dec AS DOUBLE) AS aa_score
         |FROM nn ORDER BY aa_score DESC, id_a, id_b LIMIT 50""".stripMargin,

    // q275's candidate + agreement-bit chain verbatim down to the
    // pattern histogram, then three statically-unrolled [[fsRound]]
    // blocks — the whole estimator is the shared string
    "q319_fs_em" ->
      s"""WITH c AS (
         |  SELECT c_custkey AS k,
         |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
         |    CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
         |    (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 1000
         |      AS band
         |  FROM customer),
         |led AS (
         |  SELECT k, nat, seg, band,
         |    lead(k, 1) OVER w AS k1, lead(nat, 1) OVER w AS nat1,
         |    lead(seg, 1) OVER w AS seg1, lead(band, 1) OVER w AS band1,
         |    lead(k, 2) OVER w AS k2, lead(nat, 2) OVER w AS nat2,
         |    lead(seg, 2) OVER w AS seg2, lead(band, 2) OVER w AS band2,
         |    lead(k, 3) OVER w AS k3, lead(nat, 3) OVER w AS nat3,
         |    lead(seg, 3) OVER w AS seg3, lead(band, 3) OVER w AS band3
         |  FROM c WINDOW w AS (ORDER BY bal, k)),
         |pr AS (
         |  SELECT k1 AS kk, nat1 AS nat2_, seg1 AS seg2_,
         |         band1 AS band2_, nat, seg, band FROM led
         |  UNION ALL SELECT k2, nat2, seg2, band2, nat, seg, band
         |  FROM led
         |  UNION ALL SELECT k3, nat3, seg3, band3, nat, seg, band
         |  FROM led),
         |pat AS MATERIALIZED (
         |  SELECT CASE WHEN nat = nat2_ THEN 1 ELSE 0 END AS a1,
         |         CASE WHEN seg = seg2_ THEN 1 ELSE 0 END AS a2,
         |         CASE WHEN band = band2_ THEN 1 ELSE 0 END AS a3,
         |         count(*) AS ng
         |  FROM pr WHERE kk IS NOT NULL GROUP BY 1, 2, 3),
         |wz AS (SELECT 1e-1 AS p, 9e-1 AS m1, 85e-2 AS m2, 8e-1 AS m3,
         |       3e-1 AS u1, 2e-1 AS u2, 1e-1 AS u3),
         |${fsRound(1, "pat", "wz")},
         |${fsRound(2, "pat", "wu1")},
         |${fsRound(3, "pat", "wu2")}
         |SELECT CAST(em_round AS BIGINT) AS em_round, p,
         |  m1 AS m_nat, m2 AS m_seg, m3 AS m_band,
         |  u1 AS u_nat, u2 AS u_seg, u3 AS u_band, avg_loglik
         |FROM (SELECT * FROM out1 UNION ALL SELECT * FROM out2
         |      UNION ALL SELECT * FROM out3)
         |ORDER BY em_round""".stripMargin,

    "q275_fellegi_sunter" ->
      """WITH c AS (
        |  SELECT c_custkey AS k,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
        |    CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
        |    (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 1000
        |      AS band
        |  FROM customer),
        |fv AS (
        |  SELECT 'nat' AS f, CAST(nat AS VARCHAR) AS v FROM c
        |  UNION ALL SELECT 'seg', seg FROM c
        |  UNION ALL SELECT 'band', CAST(band AS VARCHAR) FROM c),
        |ut AS (
        |  SELECT f,
        |    sum(CAST(nv AS DECIMAL(38,0)) * (nv - 1)) AS agree,
        |    sum(CAST(nv AS DECIMAL(38,0))) AS n
        |  FROM (SELECT f, v, count(*) AS nv FROM fv GROUP BY 1, 2)
        |  GROUP BY 1),
        |uw AS (
        |  SELECT f,
        |    CAST(agree AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS u,
        |    CAST(CASE WHEN f = 'nat' THEN 0.9
        |              WHEN f = 'seg' THEN 0.85
        |              ELSE 0.8 END AS DOUBLE) AS m
        |  FROM ut),
        |wt AS (
        |  SELECT f, round(log2(m / u), 6) AS wa,
        |    round(log2((1 - m) / (1 - u)), 6) AS wd
        |  FROM uw),
        |wp AS (
        |  SELECT
        |    max(CASE WHEN f = 'nat' THEN wa END) AS wa_nat,
        |    max(CASE WHEN f = 'nat' THEN wd END) AS wd_nat,
        |    max(CASE WHEN f = 'seg' THEN wa END) AS wa_seg,
        |    max(CASE WHEN f = 'seg' THEN wd END) AS wd_seg,
        |    max(CASE WHEN f = 'band' THEN wa END) AS wa_band,
        |    max(CASE WHEN f = 'band' THEN wd END) AS wd_band
        |  FROM wt),
        |led AS (
        |  SELECT k, nat, seg, band,
        |    lead(k, 1) OVER w AS k1, lead(nat, 1) OVER w AS nat1,
        |    lead(seg, 1) OVER w AS seg1, lead(band, 1) OVER w AS band1,
        |    lead(k, 2) OVER w AS k2, lead(nat, 2) OVER w AS nat2,
        |    lead(seg, 2) OVER w AS seg2, lead(band, 2) OVER w AS band2,
        |    lead(k, 3) OVER w AS k3, lead(nat, 3) OVER w AS nat3,
        |    lead(seg, 3) OVER w AS seg3, lead(band, 3) OVER w AS band3
        |  FROM c WINDOW w AS (ORDER BY bal, k)),
        |pr AS (
        |  SELECT k1 AS kk, nat1 AS nat2_, seg1 AS seg2_, band1 AS band2_,
        |         nat, seg, band FROM led
        |  UNION ALL SELECT k2, nat2, seg2, band2, nat, seg, band FROM led
        |  UNION ALL SELECT k3, nat3, seg3, band3, nat, seg, band
        |  FROM led),
        |ag AS (
        |  SELECT CASE WHEN nat = nat2_ THEN 1 ELSE 0 END AS a_nat,
        |         CASE WHEN seg = seg2_ THEN 1 ELSE 0 END AS a_seg,
        |         CASE WHEN band = band2_ THEN 1 ELSE 0 END AS a_band
        |  FROM pr WHERE kk IS NOT NULL),
        |sc AS (
        |  SELECT a_nat, a_seg, a_band,
        |    CAST(CAST(CASE WHEN a_nat = 1 THEN wa_nat ELSE wd_nat END
        |              AS DECIMAL(18,6)) +
        |         CAST(CASE WHEN a_seg = 1 THEN wa_seg ELSE wd_seg END
        |              AS DECIMAL(18,6)) +
        |         CAST(CASE WHEN a_band = 1 THEN wa_band ELSE wd_band END
        |              AS DECIMAL(18,6)) AS DOUBLE) AS score
        |  FROM ag, wp)
        |SELECT CAST(a_nat AS VARCHAR) || CAST(a_seg AS VARCHAR) ||
        |       CAST(a_band AS VARCHAR) AS pattern,
        |  count(*) AS n_pairs, round(max(score), 6) AS score
        |FROM sc GROUP BY 1 ORDER BY pattern""".stripMargin
  )
}
