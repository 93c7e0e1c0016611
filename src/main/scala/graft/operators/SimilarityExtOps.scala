package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions

// (q214 pins its exact-baseline set once for the semi join)

/** Approximate-nearest-neighbor building blocks (SURVEY.md §2B
  * q52–q53, q56, q71) complementing q43's brute-force top-k.
  *
  * Signature scheme: random-hyperplane LSH, `Planes` sign bits computed
  * in one pass by the codegen'd [[org.apache.spark.sql.graft.LshSignature]]
  * kernel (round 1 computed 8 bits via interpreted nested HOFs — the
  * slowest query in the bench; the kernel makes signature width a free
  * parameter). The hyperplanes come from an integer LCG formula
  * evaluated identically in Spark and DuckDB, which keeps the whole
  * pipeline oracle-checkable with zero stored state.
  *
  * Banding: the signature splits into `Bands` bands of `BandBits` bits;
  * a candidate pair is any pair agreeing on at least one full band
  * (union of `Bands` bucket-equijoins, the q46 MinHash shape). Sizing
  * rule at scale: candidate-join cost per band is Σ bucket² ≈ n²/2^BandBits,
  * so pick `BandBits ≈ log2(n / targetBucketSize)` — for 1 B vectors and
  * ~4 k-row buckets that is 18 bits/band; `Bands` then buys recall
  * (P[candidate] = 1−(1−p^BandBits)^Bands for per-bit agreement p).
  * Here 2×8 over the small test corpus: 256 buckets per band, two
  * independent chances to collide — strictly better recall than round
  * 1's single 8-bit band at the same bucket granularity, and every
  * parameter grows without touching query code.
  *
  * q53 is single-query search: broadcast one query vector against the
  * collection (a Catalyst BroadcastNestedLoopJoin) scored by the
  * codegen'd CosineSimilarity kernel. q71 is the batched bridge between
  * q53 (one query) and q56 (self-dedup): N query vectors retrieve their
  * top-k via banded LSH candidates + exact re-rank — the operator a
  * retrieval pipeline actually calls.
  */
object SimilarityExtOps extends OpModule {

  private def pin(df: DataFrame) =
    org.apache.spark.sql.graft.InternalPin.pin(df)


  /** Hard bound on the embedding dimensionality the PCA family's
    * driver-side d² collect accepts (r12 verdict #4): the covariance
    * aggregate is d² decimal cells collected to the driver — 4096
    * cells at the corpus's 64 dims, ~262k (&lt;10 MB) at the bound.
    * Past ~512 dims the right tool is a distributed block
    * eigensolver, not a bigger collect — this check fails FAST with a
    * named limit instead of letting the collect degrade silently. */
  private[graft] val MaxPcaDims = 512

  private[graft] def requirePcaDims(dims: Int): Unit =
    require(dims <= MaxPcaDims,
      s"PCA covariance collect supports at most $MaxPcaDims dims, got " +
        s"$dims — past this, use a distributed block eigensolver " +
        "instead of the driver-side d^2 aggregate")

  /** The declared 120-step fixed-point power iteration on a scaled
    * integer covariance matrix: w = C·v, v = w·1e6 div max|w| (BigInt
    * / truncates like DuckDB //), sign fixed so the largest-|loading|
    * dim (tie: lowest index) loads positive. Returns (v, L2 norm). */
  private def powerIterate(c: Array[Array[BigInt]], steps: Int = 120)
      : (Array[BigInt], Double) = {
    val Steps = steps
    val dims = c.length
    var v = Array.fill(dims)(BigInt(1000000L))
    for (_ <- 1 to Steps) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => c(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      v = w.map(x => (x * 1000000L) / m)
    }
    val dmax = (0 until dims).maxBy(i => (v(i).abs, BigInt(-i)))
    if (v(dmax).signum < 0) v = v.map(-_)
    (v, math.sqrt(v.map(x => x.toDouble * x.toDouble).sum))
  }

  /** Shared q295/q296 eigensolve: quantized covariance fold (the only
    * distributed term) + the declared 120-step integer power iteration
    * on the collected 64x64 aggregate. Returns (v fixed-point top
    * component with declared sign, its L2 norm as double, the scaled
    * integer covariance matrix). */
  private def pcaTopComponent(s: SparkSession, dir: String)
      : (Array[BigInt], Double, Array[Array[BigInt]]) = {
    val qCol = expr("transform(embedding, x -> " +
      "cast(round(cast(x as double) * 1000000) as bigint))")
    def lvl1 = Tables(s, dir, "embeddings").select(qCol.as("q"))
      .select(posexplode(col("q")).as(Seq("i", "a")), col("q"))
    // r19 optimization, exact: the Gram fold is symmetric, so only the
    // upper triangle i ≤ j is aggregated (half the exploded rows) and
    // mirrored below; the per-ROW product a·b runs in LONG (|a|,|b| ≤
    // ~4e6 at the ×1e6 quantization of the bounded embedding range, so
    // the product is ≤ ~1.6e13 at ANY corpus volume — the bound is
    // per-row, not per-sum) and only the SUM accumulates as
    // decimal(38,0), same exact integer total in any order.
    val s2half = lvl1
      .select(col("i"), col("a"),
              posexplode(col("q")).as(Seq("j", "b")))
      .where(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum((col("a") * col("b")).cast("decimal(38,0)")).as("s2"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
                           BigInt(r.getDecimal(2).toBigInteger)))
      .toMap
    val s2 = s2half ++ s2half.map { case ((i, j), v) => ((j, i), v) }
    val s1rows = lvl1.groupBy("i")
      .agg(sum(col("a").cast("decimal(38,0)")).as("s1"),
           count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0),
        BigInt(r.getDecimal(1).toBigInteger), r.getLong(2)))
    val dims = s1rows.length
    requirePcaDims(dims)
    val n = BigInt(s1rows.head._3)
    val s1 = s1rows.map(r => r._1 -> r._2).toMap
    val c0 = Array.tabulate(dims, dims)((i, j) =>
      n * s2((i, j)) - s1(i) * s1(j))
    val maxAbs = c0.flatten.map(_.abs).max
    val scl = (maxAbs / BigInt(1000000000L)).max(BigInt(1))
    val c = c0.map(_.map(_ / scl)) // BigInt / truncates like DuckDB //
    val (v, norm) = powerIterate(c)
    (v, norm, c)
  }

  /** q297: top-k principal components by integer Hotelling deflation.
    * After each 120-step solve, C ← (C − (ray·v_i·v_j) div vtv²)
    * re-scaled by max(1, max|·| div 1e9) — the SAME truncating-
    * integer discipline as the first scale, so entry magnitudes (and
    * thus every 128-bit product in the next power chain) stay bounded
    * at ANY spectrum, and the oracle's generated CTE chain reproduces
    * every component bit-for-bit. Deflated components drift from true
    * eigenvectors only by the declared truncation — a fixed-point
    * algorithm, not an approximation of one. Returns per component
    * (v, norm, ray over the matrix it solved, vtv, cumulative rescale
    * product vs the first-scale matrix) plus trace of the
    * first-scale matrix. */
  private def pcaDeflatedComponents(s: SparkSession, dir: String, k: Int)
      : (Seq[(Array[BigInt], Double, BigInt, BigInt, BigInt)], BigInt) = {
    val (v1, n1, c1) = pcaTopComponent(s, dir)
    val dims = v1.length
    val trace = (0 until dims).map(i => c1(i)(i)).sum
    def rayOf(c: Array[Array[BigInt]], v: Array[BigInt]): BigInt =
      (for (i <- 0 until dims; j <- 0 until dims)
        yield c(i)(j) * v(i) * v(j)).sum
    def vtvOf(v: Array[BigInt]): BigInt = v.map(x => x * x).sum
    val comps = scala.collection.mutable.ArrayBuffer(
      (v1, n1, rayOf(c1, v1), vtvOf(v1), BigInt(1)))
    var c = c1
    for (_ <- 2 to k) {
      val (pv, _, pray, pvtv, pscl) = comps.last
      val den = pvtv * pvtv
      val raw = Array.tabulate(dims, dims)((i, j) =>
        c(i)(j) - (pray * pv(i) * pv(j)) / den)
      val mx = raw.flatten.map(_.abs).max
      val s2 = (mx / BigInt(1000000000L)).max(BigInt(1))
      c = raw.map(_.map(_ / s2))
      // Deflated solves run the DECLARED 60 steps (not 120): DuckDB's
      // binder caps transitive CTE nesting at 1000 expressions, and
      // the oracle's three chained solves at 120 steps each sit at
      // ~1100 — 120 + 60 + 60 lands at ~740 with the same
      // bit-for-bit replay property (a declared fixed-point count,
      // not a convergence target; component 1 keeps q295's 120).
      val (v, nrm) = powerIterate(c, 60)
      comps += ((v, nrm, rayOf(c, v), vtvOf(v), pscl * s2))
    }
    (comps.toSeq, trace)
  }

  private val Planes = 16
  private val Bands = 2
  private val BandBits = Planes / Bands
  private val BatchQueries = 8
  private val BatchK = 5
  private[graft] val Cents = 16  // IVF coarse centroids (sampled: vec_id < Cents)
  private val NProbe = 4  // IVF cells probed per query
  private val PqSub = 8     // PQ subspaces (64-dim vectors → 8 dims each)
  private val PqDim = 8     // dims per subspace
  private val PqCents = 8   // codewords per subspace (vec_id < PqCents)
  private val PqRerank = 64 // ADC candidates exact-re-ranked
  // q120's flag threshold: exact cosine at/above this after re-rank
  // marks a train doc as semantically contaminated by the eval doc.
  // 0.35 sits above this corpus's unrelated-pair band (the q43 exact
  // top-20 floor is ~0.5; random 64-dim pairs center near 0) but low
  // enough to flag real neighbors at every test SF.
  private val SemThreshold = 0.35
  // q311's fixed-k escape hatch: per-cluster member cap (min-id kept),
  // a measured no-op at every test SF — see the q311 docstring
  private[graft] val SemDedupClusterCap = 4096

  /** The gate family's ONE capped MEMBER-PROBE side (r17 ADVICE: the
    * capped probe + dup predicate had drifted into four inline copies
    * — q370, q376, the census tail, and the stream committer — so a
    * threshold or cap change had to be edited four times in sync with
    * four oracle texts; this is now the single definition). Input: any
    * frame projecting the standing members as (cid, vec_id, xi, nv) —
    * an assignment's even half, or a model table's 'm' rows. Output:
    * (cid, a, xa, na), at most `cap` members per cell kept by
    * ascending id — q311's Σ cluster-occupancy volume guard. */
  private[graft] def cappedMemberSide(m: DataFrame, cap: Long): DataFrame =
    m.withColumn("mrk", row_number().over(
        Window.partitionBy("cid").orderBy("vec_id")))
      .where(col("mrk") <= cap)
      .select(col("cid"), col("vec_id").as("a"), col("xi").as("xa"),
              col("nv").as("na"))

  /** The gate DUP PREDICATE, one definition for every consumer:
    * arrivals (cid, b, xb, nb) co-cluster-join the capped member side
    * (cid[, a], xa, na) and keep pairs whose exact-lattice cosine²
    * clears 0.16 by integer CROSS-MULTIPLICATION (dot²·10⁴ ≥
    * na·nb·1600 — never a division, q311/q339's line). Returns the
    * joined pair rows with dot/na/nb retained (q376 reads the
    * strength band off them; most callers fold or distinct). */
  private[graft] def gateDupPairs(arr: DataFrame, mem: DataFrame): DataFrame =
    arr.join(mem, Seq("cid"))
      .withColumn("dot",
        GraftFunctions.dotProductLong(col("xa"), col("xb")))
      .where(col("dot") > 0 &&
             col("dot").cast("decimal(38,0)") * col("dot") * 10000 >=
               col("na").cast("decimal(38,0)") * col("nb") * 1600)

  /** The CERTIFICATION geometry's gate pairs from an assignment frame:
    * odd arrivals × even members capped at the declared synthetic cap
    * 8, through [[gateDupPairs]] — shared by q370's flagged sets,
    * q376's band pairs and the persisted router cert artifact, so the
    * certification's predicate is structurally the gate's. */
  private[graft] def certPairs(asg: DataFrame): DataFrame =
    gateDupPairs(
      asg.where(col("vec_id") % 2 === 1)
        .select(col("cid"), col("vec_id").as("b"), col("xi").as("xb"),
                col("nv").as("nb")),
      cappedMemberSide(asg.where(col("vec_id") % 2 === 0), 8L)
        .select(col("cid"), col("xa"), col("na")))

  /** The STRENGTH band of a dup pair row (q376/q380): the pair's cos²
    * band measured by integer CROSS-MULTIPLICATION against the band
    * lines (dot²·10⁴ ≥ na·nb·{1600, 2500, 4900, 8100} ⇔ cos² ≥
    * {0.16, 0.25, 0.49, 0.81}) — never a division. Input columns:
    * dot, na, nb (a [[gateDupPairs]] output row). */
  private[graft] def strengthBand: Column = {
    val d2 = col("dot").cast("decimal(38,0)") * col("dot") * 10000
    val nn = col("na").cast("decimal(38,0)") * col("nb")
    when(d2 >= nn * 8100, 4L).when(d2 >= nn * 4900, 3L)
      .when(d2 >= nn * 2500, 2L).otherwise(1L)
  }

  /** Bumped on ANY change to the certification geometry — TwoLevelRep,
    * the strengthBand lines, the 4096-id cert slice, or the synthetic
    * cap 8: folds into [[routerCertTable]]'s artifact name (r18 ADVICE
    * — the cert table keyed only on name+sfDir+fingerprint, so a
    * geometry change across JVM runs could silently serve a stale cert
    * to q370/q376/q380; the GateAdmitBuilderVersion discipline applied
    * to the measurement artifact). */
  private val RouterCertBuilderVersion = 1

  /** The ROUTER CERTIFICATION PERSISTED (r18, the r17 verdict's #4's
    * prerequisite — q362's rule: an attestation is a MEASUREMENT, so
    * it is write-once data, not a query to re-run): both assigners
    * run ONCE per (corpus, fingerprint) on the declared 4096-id
    * certification slice at the hybrid geometry and synthetic cap 8,
    * and the comparison lands as one artifact — band 0 = the overall
    * row (vectors, assignment agreement, each gate's flagged count,
    * the overlap), bands 1–4 = the flat gate's catches by strength
    * (q376's cross-multiplied lines) with how many the two-level gate
    * keeps. q370, q376 and q380 all READ this table — one
    * measurement, three views, sub-second warm. */
  private[graft] def routerCertTable(s: SparkSession, d: String): String =
    graft.BucketedCache.ensure(s, d, s"routercert_b$RouterCertBuilderVersion",
      "band BIGINT, vectors BIGINT, agree BIGINT, flat_flagged BIGINT, " +
        "two_flagged BIGINT, kept BIGINT",
      "band", 1) {
      val em = latticeFrame(s, d, idCap = 4096L)
      val kAgg = greatest(ceil(sqrt(count(lit(1)))).cast("long"),
                          expr("(count(1) + 7) DIV 8").cast("long"))
      val (_, asgFlat) = hybridCellAssign(em, kAgg, twoLevel = false)
      val (_, asgTwo) = hybridCellAssign(em, kAgg, twoLevel = true)
      val (fb, fh) = pin(certPairs(asgFlat)
        .groupBy("b").agg(max(strengthBand).as("band")))
      fh.count(); graft.PinScope.retain(fh)
      val (tf, th) = pin(certPairs(asgTwo).select("b").distinct())
      th.count(); graft.PinScope.retain(th)
      val agree = asgFlat.select(col("vec_id"), col("cid").as("fcid"))
        .join(asgTwo.select(col("vec_id"), col("cid").as("tcid")),
              Seq("vec_id"))
        .agg(count(lit(1)).as("vectors"),
             sum(when(col("fcid") === col("tcid"), 1L).otherwise(0L))
               .as("agree"))
      val overall = agree
        .crossJoin(fb.agg(count(lit(1)).as("flat_flagged")))
        .crossJoin(tf.agg(count(lit(1)).as("two_flagged")))
        .crossJoin(tf.join(fb, Seq("b"), "left_semi")
          .agg(count(lit(1)).as("kept")))
        .select(lit(0L).as("band"), col("vectors"), col("agree"),
                col("flat_flagged"), col("two_flagged"), col("kept"))
      val bands = fb
        .join(tf.withColumn("kept1", lit(1L)), Seq("b"), "left")
        .groupBy("band")
        .agg(count(lit(1)).as("flat_flagged"),
             sum(coalesce(col("kept1"), lit(0L))).as("kept"))
        .select(col("band"), lit(0L).as("vectors"), lit(0L).as("agree"),
                col("flat_flagged"), lit(0L).as("two_flagged"),
                col("kept"))
      overall.unionByName(bands)
    }

  private val RrfK = 60   // the standard RRF damping constant

  // q175 BM25: the fixed query-term set and the standard Robertson
  // parameters (k1 term-frequency saturation, b length normalization)
  private val Bm25Terms = Seq("hash", "join", "vector")
  private val Bm25K = 20

  // q354's fixed phrase workload (each a 2-token exact phrase over
  // the corpus vocabulary — present at every test SF)
  private val PhraseQueries =
    Seq(("table", "scan"), ("window", "join"), ("hash", "scan"))

  /** The POSITIONAL postings rows (t, doc_id, pos) of `docs` — one row
    * per token occurrence, positions preserved from the raw token
    * array (empties dropped AFTER posexplode so surviving positions
    * stay exact). The per-occurrence inverted index a search system
    * stores next to q187's (t, doc, tf) rows; shared by q358's full
    * artifact and q359's standing even-half artifact. */
  private def posPostings(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
    .where(length(col("t")) > 0)
    .select(col("t"), col("doc_id"), col("pos").cast("long").as("pos"))

  /** q187's persisted BM25 postings artifact — (t, doc_id, tf, dl)
    * bucketed by term so the probe prunes to its terms' buckets at
    * planning time. Extracted r19 so q390's cache fsck can audit it
    * by name. */
  private[graft] def bm25PostingsTable(s: SparkSession,
                                       d: String): String =
    graft.BucketedCache.ensure(s, d, "postings",
        "t STRING, doc_id BIGINT, tf BIGINT, dl BIGINT", "t", 8) {
      Tables(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
                size(col("toks")).cast("long").as("dl"))
        .select(col("doc_id"), col("dl"),
                explode(col("toks")).as("t"))
        .where(length(col("t")) > 0)
        .groupBy("t", "doc_id", "dl").agg(count(lit(1)).as("tf"))
        .select("t", "doc_id", "tf", "dl")
    }

  /** q358's persisted positional postings artifact — (t, doc_id, pos)
    * bucketed by term (same pruning contract as [[bm25PostingsTable]]).
    * Extracted r19 for q390's audit. */
  private[graft] def posPostingsTable(s: SparkSession,
                                      d: String): String =
    graft.BucketedCache.ensure(s, d, "pospost",
      "t STRING, doc_id BIGINT, pos BIGINT", "t", 8)(
      posPostings(Tables(s, d, "documents")))

  /** The phrase-match body shared VERBATIM by q354 (inline scan),
    * q358 (persisted positional index probe) and q359 (standing index
    * + arriving batch) — the q175/q187/q188 one-oracle-three-paths
    * discipline: each 2-token phrase is a (doc_id, pos+1) self-equi-
    * join of its terms' postings, report = per-phrase top-5 docs by
    * occurrence count (rank ≤ 5 rides Catalyst's WindowGroupLimit
    * map-side heap, the q195 mechanism). */
  private def phraseHits(pos: DataFrame): DataFrame = {
    val ph = PhraseQueries.map { case (w1, w2) =>
      val a = pos.where(col("t") === w1).select(col("doc_id"), col("pos"))
      val b = pos.where(col("t") === w2)
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      a.join(b, Seq("doc_id", "pos"))
        .groupBy("doc_id").agg(count(lit(1)).as("hits"))
        .select(lit(s"$w1 $w2").as("phrase"), col("doc_id"), col("hits"))
    }.reduce(_ unionAll _)
    ph.withColumn("rnk", row_number().over(
        Window.partitionBy("phrase")
          .orderBy(col("hits").desc, col("doc_id"))).cast("long"))
      .where(col("rnk") <= 5)
      .orderBy("phrase", "rnk")
  }

  private def vec: Column = col("embedding").cast("array<double>")

  /** q222/q311's shared Lloyd oracle text: lattice quantization, the
    * sampled initial centroids, and three assign(+two update) rounds —
    * the SQL twin of [[lloydAssignments]], ending at a3. */
  private def lloydDStep(i: Int): String =
    s"""d$i AS (SELECT e.vec_id, c.cid,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      j -> (e.xi[j] - c.ci[j]) * (e.xi[j] - c.ci[j])))
       |      AS BIGINT) AS dist
       |  FROM e CROSS JOIN c$i c),
       |a$i AS (SELECT vec_id, cid, dist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY dist, cid) AS rn
       |    FROM d$i) WHERE rn = 1)""".stripMargin

  private def lloydUStep(i: Int): String =
    s"""u$i AS (SELECT cid, u.i - 1 AS dim, sum(e.xi[u.i]) AS sx,
       |      count(*) AS n
       |    FROM a$i JOIN e USING (vec_id),
       |         (SELECT unnest(range(1, 65)) AS i) u
       |    GROUP BY 1, 2),
       |c${i + 1} AS (SELECT cid,
       |      list(CAST(CASE WHEN sx >= 0
       |             THEN (2 * sx + n) // (2 * n)
       |             ELSE -((2 * -sx + n) // (2 * n)) END AS BIGINT)
       |           ORDER BY dim) AS ci
       |    FROM u$i GROUP BY cid)""".stripMargin

  /** ONE greedy MMR step — the max-sim-to-picked fold, the scored
    * remainder, and the (score desc, id)-tie argmax — parameterized by
    * the candidate table (id, v, rel), the symmetric pairwise-sim
    * table (a, b, sim), and the picked-set table. The SAME text runs
    * in Spark (per-step, over pinned picked-set views — the q308
    * CTE-inlining lesson: a self-referencing pk chain inlined by
    * Catalyst grows the plan ~3^k) and in DuckDB (statically unrolled
    * by [[mmrBody]], where multi-referenced CTEs materialize). Step
    * 1's empty picked-set max coalesces to 0 (pure relevance, the
    * declared MMR base case). */
  private def mmrStep(k: Int, cand: String, pw: String,
                      pk: String): String =
    s"""mx$k AS (SELECT p.a AS id, max(p.sim) AS ms
       |  FROM $pw p JOIN $pk s ON p.b = s.id GROUP BY p.a),
       |sc$k AS (SELECT c.id,
       |    round(5e-1 * CAST(c.rel AS DOUBLE) -
       |          5e-1 * CAST(coalesce(m.ms, CAST(0 AS DOUBLE))
       |                      AS DOUBLE), 6) AS score,
       |    c.rel
       |  FROM $cand c LEFT JOIN mx$k m ON c.id = m.id
       |  WHERE c.id NOT IN (SELECT id FROM $pk)),
       |sel$k AS (SELECT $k AS step, id, score, rel FROM sc$k
       |          ORDER BY score DESC, id LIMIT 1)""".stripMargin

  /** ONE beam-search hop of q329's graph ANN — expand the current
    * beam through the k-NN graph, union the beam itself (so the beam
    * never regresses), score against the precomputed query sims, keep
    * the top-4 by (sim desc, id). The SAME text runs per-hop in Spark
    * (over pinned beam views) and statically unrolled in DuckDB. */
  private def annHop(k: Int, graph: String, beam: String,
                     sims: String): String =
    s"""cd$k AS (SELECT g.dst AS id FROM $graph g
       |         JOIN $beam b ON g.src = b.id
       |         UNION SELECT id FROM $beam),
       |bm$k AS (SELECT c.id, e.sim FROM cd$k c
       |         JOIN $sims e ON c.id = e.id
       |         ORDER BY e.sim DESC, c.id LIMIT 4)""".stripMargin

  /** q322's oracle-side unrolled greedy chain (everything after
    * `WITH`): ten [[mmrStep]]s chained through pk0..pk10 CTEs. */
  private def mmrBody(cand: String, pw: String): String = {
    val steps = (1 to 10).map { k =>
      mmrStep(k, cand, pw, s"pk${k - 1}") +
      s""",
         |pk$k AS MATERIALIZED (SELECT id FROM pk${k - 1}
         |         UNION ALL SELECT id FROM sel$k)""".stripMargin
    }.mkString(",\n")
    val un = (1 to 10).map(k => s"SELECT * FROM sel$k")
      .mkString(" UNION ALL ")
    s"""pk0 AS (SELECT CAST(NULL AS BIGINT) AS id WHERE 1 = 0),
       |$steps
       |SELECT CAST(step AS BIGINT) AS step, id AS vec_id, score,
       |  CAST(rel AS DOUBLE) AS relevance
       |FROM ($un) ORDER BY step""".stripMargin
  }

  /** [[lloydCte]] generalized over the source predicate and the
    * initial-centroid predicate — the q339 incremental tier fits the
    * SAME 3-round text on the even half with the 16 lowest EVEN ids
    * as seeds. */
  private[graft] def lloydCteOn(srcWhere: String, centPred: String): String =
    s"""e AS (SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
       |      AS xi
       |  FROM embeddings $srcWhere),
       |c1 AS (SELECT vec_id AS cid, xi AS ci FROM e
       |       WHERE $centPred),
       |${lloydDStep(1)},
       |${lloydUStep(1)},
       |${lloydDStep(2)},
       |${lloydUStep(2)},
       |${lloydDStep(3)}""".stripMargin

  private def lloydCte: String = lloydCteOn("", s"vec_id < $Cents")

  /** The embeddings table as (vec_id, v: array<double>). */
  private def embBase(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "embeddings").select(col("vec_id"), vec.as("v"))

  /** q329's 4096-node md5-ranked backbone, computed as a BUCKET-
    * DISTRIBUTED global rank (the r13 verdict's one `weak`: the first
    * cut ranked `row_number() OVER (ORDER BY md5(vec_id), vec_id)`
    * with no partitioning — a single-partition WindowExec sort of the
    * whole corpus, one executor's worth of 10⁹ vectors at 100 TB).
    * Same function, distributed shape: bucket by the md5's first 2
    * hex chars (256 uniform buckets — lexicographic md5 order =
    * bucket order, so global rank = exclusive cumulative bucket count
    * + within-bucket rank). Pass 1 is a map-side-combined 256-cell
    * count census; its exclusive cumulative sums identify the LIVE
    * buckets — those whose offset is below the 4096 cut (at 10⁹
    * vectors that is bucket '00' alone: ~n/256 rows). Pass 2 ranks
    * ONLY the live buckets' rows (broadcast-join prefilter below the
    * sort — plan-asserted), so the rank window sorts ~max(4096, n/256)
    * rows across parallel partitions instead of the corpus. The only
    * unpartitioned window runs over the 256-row census. Bit-identical
    * to the global rank (a row outside a live bucket has offset ≥
    * 4096 ⇒ global rank > 4096): the oracle keeps its one-line
    * `row_number() OVER (ORDER BY ...)` text. */
  private[graft] def beamBackbone(em: DataFrame): DataFrame = {
    val keyed = em.where(col("vec_id") =!= 0)
      .withColumn("h", md5(col("vec_id").cast("string")))
      .withColumn("pfx", substring(col("h"), 1, 2))
    val live = keyed.groupBy("pfx").agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum("bn").over(
          Window.orderBy("pfx")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .where(col("off") < 4096)
      .select(col("pfx"), col("off"))
    keyed.join(broadcast(live), Seq("pfx"))
      .withColumn("br", row_number().over(
        Window.partitionBy("pfx").orderBy(col("h"), col("vec_id"))))
      .withColumn("mr", (col("off") + col("br")).cast("int"))
      .where(col("mr") <= 4096)
      .select(col("vec_id"), col("v"), col("mr"))
  }

  /** The zero-shuffle Lloyd assignment pass over one broadcast packed
    * centroid row — shared by the 3-round loop and q339's single
    * batch-assignment probe (identical argmin in both). Since r14 the
    * argmin and its distance run as the codegen'd
    * [[GraftFunctions.argminCentroidLong]]/[[GraftFunctions.minCentroidDistLong]]
    * kernels instead of the interpreted `array_min(transform(...))`
    * HOF (a CodegenFallback) — bit-identical integer picks (same
    * sequential fold, same (dist, cid) tie), measured ~10× on the
    * assignment pass at the 10× sweep. */
  private def lloydAssign(emQ: DataFrame, cent: DataFrame): DataFrame = {
    val packed = cent
      .agg(collect_list(struct(col("cid"), col("ci"))).as("cents"))
    emQ.crossJoin(broadcast(packed))
      .select(col("vec_id"), col("xi"),
              GraftFunctions.argminCentroidLong(col("xi"), col("cents"))
                .as("cid"),
              GraftFunctions.minCentroidDistLong(col("xi"), col("cents"))
                .as("dist"))
  }

  /** The 3-round integer-lattice Lloyd loop over an explicit base
    * (vec_id, v) with an explicit seed predicate — shared by q222/
    * q311 (full corpus, seeds = the [[Cents]] lowest ids) and q339's
    * artifact build (even half, seeds = the [[Cents]] lowest EVEN
    * ids). Returns (per-iteration pinned assignments (vec_id, xi,
    * cid, dist), the centroid table that PRODUCED each assignment —
    * cs(i) drives as(i), so cs.last is what a later batch must be
    * assigned against to extend as.last). */
  private def lloydRounds(s: SparkSession, base: DataFrame,
                          centPred: Column)
      : (Seq[DataFrame], Seq[DataFrame]) = {
    val (em, h) = pin(base.select(col("vec_id"),
      expr("transform(v, x -> CAST(round(x * 1000000) AS BIGINT))")
        .as("xi")))
    h.count(); graft.PinScope.retain(h)
    var cent = em.where(centPred)
      .select(col("vec_id").as("cid"), col("xi").as("ci"))
    val as = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val cs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (t <- 1 to 3) {
      cs += cent
      val (a, ah) = pin(lloydAssign(em, cent))
      ah.count(); graft.PinScope.retain(ah)
      as += a
      if (t < 3)
        cent = a
          .select(col("cid"), posexplode(col("xi")).as(Seq("dim", "x")))
          .groupBy("cid", "dim")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"))
          // nearest-lattice mean, half away from zero — PURE integer
          // arithmetic ((2|sx|+n) DIV 2n, re-signed), because the
          // double round(sx/n/1e6, 6) path diverged between engines
          // in the 3rd iteration's last bit (caught by the oracle)
          .withColumn("cl", expr(
            "CASE WHEN sx >= 0 THEN (2 * sx + n) DIV (2 * n) " +
            "ELSE -((2 * -sx + n) DIV (2 * n)) END"))
          .groupBy("cid")
          .agg(expr("transform(array_sort(collect_list(" +
                    "struct(dim, cl))), s -> s.cl)").as("ci"))
    }
    (as.toSeq, cs.toSeq)
  }

  /** The 3-round integer-lattice Lloyd loop shared by q222 (training-
    * curve report) and q311 (final assignment feeding SemDeDup):
    * vectors quantize once to the 1e6 lattice, assignment is a
    * zero-shuffle codegen'd argmin over ONE broadcast centroid row,
    * centroid update is the nearest-lattice integer mean — see q222's
    * docstring for the full determinism contract. Returns the pinned
    * per-iteration assignments (vec_id, xi, cid, dist). */
  private def lloydAssignments(s: SparkSession, d: String): Seq[DataFrame] =
    lloydRounds(s, embBase(s, d), col("vec_id") < Cents)._1

  /** q342's per-cell HUB cap: the IVF-bucketed k-NN graph build joins
    * every cell membership against the cell's hub set, so hub count
    * bounds candidate volume at 2·|nodes|·cap cosines (the member→hub
    * direction; reversed edges reuse the same scored rows). Hubs =
    * the cap lowest vec_ids per cell — a declared deterministic
    * choice the oracle restates; the symmetric member↔hub edges keep
    * every node reachable (members route through hubs, the HNSW
    * upper-layer pattern). */
  private[graft] val BeamHubCap = 64

  /** q351's convergence knobs: NN-descent rounds run until a round's
    * edge-turnover falls below [[DescentStopPpm]] (10% — Dong, Moses &
    * Li 2011 stop on a sampled update rate; here the turnover is exact
    * because each round's edge set is materialized anyway), capped at
    * [[DescentRoundsCap]] rounds — the declared bound that keeps the
    * curve's cost linear in the corpus regardless of convergence. */
  private[graft] val DescentRoundsCap = 3
  private[graft] val DescentStopPpm = 100000L

  /** The IVF-bucketed k-NN graph BUILD shared by q342's full-corpus
    * artifact and q350's even-half standing artifact: each node
    * registers in its 2 nearest cells of `centSel`'s sampled
    * centroids (multi-probe membership keeps the graph connected
    * across cell borders), candidates = memberships × [[BeamHubCap]]
    * hubs per cell (hubs = the cap lowest vec_ids — a declared
    * deterministic choice the oracles restate), edges are the
    * symmetric member↔hub pairs scored once (cosine, 4 dp), and each
    * src keeps its top-8 by (cos desc, dst). Cost O(n · 2 · cap)
    * cosines — linear in the corpus, never n². Returns (edges (src,
    * dst, es), hubs (cid, hid)). */
  private def graphBuild(em: DataFrame, centSel: Column)
      : (DataFrame, DataFrame) = {
    val packed = em.where(centSel)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
      .agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
    val mem = em.crossJoin(broadcast(packed))
      .select(col("vec_id"), col("v"), explode(col("cents")).as("c"))
      .select(col("vec_id"), col("v"), col("c.cid").as("cid"),
              sqL2("v", "c.cv").as("dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))))
      .where(col("rn") <= 2)
      .select(col("vec_id"), col("v"), col("cid"))
    val hubs = mem
      .withColumn("hr", row_number().over(
        Window.partitionBy("cid").orderBy("vec_id")))
      .where(col("hr") <= BeamHubCap)
      .select(col("cid"), col("vec_id").as("hid"), col("v").as("hv"))
    val scored = mem.join(hubs, Seq("cid"))
      .where(col("vec_id") =!= col("hid"))
      .select(col("vec_id").as("a"), col("hid").as("b"),
              round(GraftFunctions.cosineSimilarity(col("v"), col("hv")),
                    4).as("es"))
    val edges = scored
      .unionAll(scored.select(col("b").as("a"), col("a").as("b"),
                              col("es")))
      .distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy("a").orderBy(col("es").desc, col("b"))))
      .where(col("rk") <= 8)
      .select(col("a").as("src"), col("b").as("dst"), col("es"))
    (edges, hubs.select(col("cid"), col("hid")))
  }

  /** q342's persisted k-NN GRAPH artifact over the full corpus — the
    * offline graph-build job q329's capped n² scaffold stood in for
    * (the r13 verdict's #2): [[graphBuild]] over every vector with
    * the frozen [[Cents]] sampled cells. Persisted src-bucketed;
    * built once per (session, corpus fingerprint). */
  private def beamGraphTable(s: SparkSession, d: String): String =
    graft.BucketedCache.ensure(s, d, "beamgraph",
      "src BIGINT, dst BIGINT", "src", 8) {
      graphBuild(embBase(s, d).where(col("vec_id") =!= 0),
                 col("vec_id") < Cents)._1.select("src", "dst")
    }

  /** q350's persisted STANDING graph artifact — the per-release
    * discipline (q339/q340/q341) applied to the graph tier: the even
    * half is the standing corpus, built once by [[graphBuild]] with
    * the 2·[[Cents]] lowest even ids as frozen cells (q339's even-seed
    * rule), and the artifact persists everything a batch insert needs
    * to probe WITHOUT a rebuild or an even-corpus rescan — edge rows
    * (kind 'e': src, dst, es — the score is stored so reversed batch
    * edges merge into standing top-8s without rescoring standing
    * pairs), hub rows (kind 'h': cid, hid — the entry points a new
    * node links through), and node-vector rows (kind 'v': id, v —
    * exactly what a production vector index stores; the batch scores
    * candidates against these, so the only embeddings scan in the
    * probe plan is the odd batch itself, plan-asserted). */
  private[graft] def beamGraphIncTable(s: SparkSession, d: String): String =
    graft.BucketedCache.ensure(s, d, "beamgraphinc",
      "kind STRING, a BIGINT, b BIGINT, es DOUBLE, v ARRAY<DOUBLE>",
      "a", 8) {
      val em = embBase(s, d)
        .where(col("vec_id") =!= 0 && col("vec_id") % 2 === 0)
      val (edges, hubs) = graphBuild(em, col("vec_id") < 2 * Cents)
      edges.select(lit("e").as("kind"), col("src").as("a"),
                   col("dst").as("b"), col("es"),
                   lit(null).cast("array<double>").as("v"))
        .unionByName(hubs.select(lit("h").as("kind"), col("cid").as("a"),
                     col("hid").as("b"), lit(0.0).as("es"),
                     lit(null).cast("array<double>").as("v")))
        .unionByName(em.select(lit("v").as("kind"),
                     col("vec_id").as("a"), lit(0L).as("b"),
                     lit(0.0).as("es"), col("v")))
    }

  /** In-JVM monitors for [[graphVersionRoot]] — per (sfDir,
    * fingerprint), BucketedCache's rule: independent corpora build
    * concurrently, two builders of the same log serialize. */
  private val graphLogLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Bumped on ANY change to the promoted-log build logic (the tier
    * queries it commits, the manifest layout): the tag folds into
    * [[graphVersionRoot]]'s tmpdir key, so a code change can never
    * silently serve a stale committed graph built by an older layout
    * across JVM runs (r16 ADVICE — the cache key was (dir,
    * fingerprint) only). */
  private val GraphLogBuilderVersion = 2

  /** Two-level assigner replication factor (q369/q370): every fine
    * cell lands in its [[TwoLevelRep]] nearest coarse buckets at
    * BUILD time, so a vector's single coarse probe still sees the
    * fine cells whose true region borders its coarse cell — the
    * spill-tree/redundant-routing remedy for quantizer boundary loss,
    * chosen over vector-side multiprobe because it keeps the serving
    * path one equi-join (the online gate's shape). Measured on the
    * r17 grid at sf0.1 (k = 125, kc = 12): R = 9 reads 90.5 %
    * assignment agreement and 91.7 % gate recall vs the flat truth;
    * per-vector cost stays kc + R·k/kc ≈ (1+R)·√k — 11× under flat
    * at the 100× sweep volume, ~49× at the 10⁹-vector census point.
    * R ≥ kc degrades to the flat assigner (every bucket holds every
    * cell), which is why the small-SF certification slice reads
    * agreement 10⁶ ppm below k ≈ 81. */
  private[graft] val TwoLevelRep = 9

  /** DECLARED broadcast ceiling for the two-level router's packed
    * fine-group side (the r17 verdict's #1, wired r18). The switch
    * point is a MEASURED number, not AQE's 10 MB default: the r17
    * same-window A/B showed the explicit broadcast still beating the
    * shuffled shape at 58 MB — 6× AQE's threshold — (q369 best 6.96 s
    * broadcast vs 9.40 s AQE-shuffled at 100×), while the 10⁹-vector
    * census point prices the side at ≈1.18 GB (ProbeRouterBuild) —
    * past any sane executor broadcast. 128 MB sits between the two:
    * comfortably above every measured broadcast win, comfortably
    * below the geometry where the driver fan-out and per-executor
    * copy dominate. Past it, [[twoLevelAssign]] swaps the hint for
    * the ccid-co-bucketed shuffled hash join (same plan otherwise). */
  private[graft] val TwoLevelBroadcastCeilingBytes: Long = 128L << 20

  /** Measured bytes per packed fine-group entry — the size model the
    * switch prices the side with: ProbeRouterBuild's census-point
    * build read ≈1.18 GB over k·R = 244k·9 ≈ 2.2M entries ≈ 540 B
    * each (64 int64 lattice components + cid + struct/array
    * overhead). */
  private[graft] val TwoLevelFineEntryBytes: Long = 540L

  /** The PROMOTED GRAPH VERSION LOG (added r16, the r15 verdict's #2)
    * — q350 merged edge lists but never COMMITTED them; this is the
    * commit: each graph tier lands as a SnapshotLog VERSION (the
    * q167/q298 manifest discipline — files first, one atomic manifest
    * rename second, so a reader can never observe a half-promoted
    * graph and a crash between data write and manifest leaves the old
    * version serving; ArtifactCommitSpec drives that case), keyed on
    * the corpus fingerprint (BucketedCache's r15 rule — an in-place
    * corpus rewrite routes consumers to a fresh log, never a stale
    * graph). Versions: v1 = the IVF build (q342's artifact), v2 = one
    * NN-descent round over v1 (q343), v3 = the batch-insert merge
    * (q350). The expensive machinery — descent rescoring, the HNSW
    * search-then-link — runs ONCE per (corpus, fingerprint) inside
    * the build; every consumer (q344's recall attestation, a serving
    * layer) READS a committed version: at 100 TB the promotion job is
    * the nightly writer and queries only ever pay a parquet scan.
    * The whole log builds in a scratch dir and atomic-renames into
    * place (cachedLayout's discipline), so the log itself is also
    * all-or-nothing. */
  private[graft] def graphVersionRoot(s: SparkSession,
                                      d: String): java.nio.file.Path = {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    val key = d.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      graft.BucketedCache.corpusFingerprint(d) +
      s"_b$GraphLogBuilderVersion"
    val dir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_graphlog_$key")
    val lock = graphLogLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      if (!java.nio.file.Files.exists(dir)) {
        val scratchRoot =
          java.nio.file.Files.createTempDirectory("graft_graphlog_scratch")
        val scratch = scratchRoot.resolve("log")
        try {
          java.nio.file.Files.createDirectories(scratch)
          val v1 = SnapshotLog.addFiles(s, scratch, "g1",
            s.table(beamGraphTable(s, d)).select("src", "dst"))
          SnapshotLog.commitVersion(scratch, 1, v1)
          val v2 = SnapshotLog.addFiles(s, scratch, "g2",
            nnDescentEdges(s, d).select("src", "dst"))
          SnapshotLog.commitVersion(scratch, 2, v2)
          val v3 = SnapshotLog.addFiles(s, scratch, "g3",
            graphInsertEdges(s, d).select("src", "dst"))
          SnapshotLog.commitVersion(scratch, 3, v3)
          try java.nio.file.Files.move(scratch, dir,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.FileSystemException
              if java.nio.file.Files.exists(dir) => // lost the race
          }
        } finally {
          import scala.jdk.CollectionConverters._
          if (java.nio.file.Files.exists(scratchRoot))
            java.nio.file.Files.walk(scratchRoot).iterator.asScala.toSeq
              .sortBy(-_.getNameCount)
              .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    }
    dir
  }

  /** The tier name each promoted graph version carries — the log's
    * lineage contract, shared by q357's report and q344's reader. */
  private[graft] val GraphVersionTiers =
    Map(1 -> "ivf_build", 2 -> "nn_descent_1", 3 -> "graph_insert")

  /** q362's recall floor: the cheapest encoding whose MEASURED recall
    * clears this ppm is the recommended serving config. */
  private[graft] val RecallFloorPpm = 950000L

  /** THE recall formula — integer ppm with the zero-pair guard — as
    * one shared expression (q344's tiers, both persisted attestations
    * and every future recall row must stay in sync on rounding and
    * the guard; r16 review: it had drifted into four inline copies).
    * Input columns: `exact_pairs`, `hits`. */
  private def recallPpm: Column =
    expr("CASE WHEN exact_pairs = 0 THEN 0 ELSE " +
         "(1000000 * hits) DIV exact_pairs END")

  /** q352's Matryoshka attestation PERSISTED (r16, the r15 verdict's
    * #7): the four (dims, exact_pairs, hits, recall_ppm) measurement
    * rows land once per (corpus, fingerprint) as a bucketed artifact —
    * the attestation is a MEASUREMENT, so it is write-once data, not a
    * query to re-run; q352 reads it back and q362 consumes it as the
    * serving-config input. Body is the r15 measurement verbatim: exact
    * top-8 by full 64-dim cosine as truth, tiers re-rank by prefix-
    * sliced cosine (8/16/32 dims), the dims=64 self-check row emitted
    * from the pinned exact frame. */
  private[graft] def mrlAttestationTable(s: SparkSession,
                                         d: String): String =
    graft.BucketedCache.ensure(s, d, "mrlatt",
      "dims BIGINT, exact_pairs BIGINT, hits BIGINT, recall_ppm BIGINT",
      "dims", 1) {
      val em = embBase(s, d).where(col("vec_id") =!= 0)
      val (anchors, ah) = pin(em.orderBy("vec_id").limit(64)
        .select(col("vec_id").as("qid"), col("v").as("qv")))
      ah.count(); graft.PinScope.retain(ah)
      def topk(dims: Int): DataFrame = {
        val (va, vq) =
          if (dims == 64) (col("v"), col("qv"))
          else (slice(col("v"), 1, dims), slice(col("qv"), 1, dims))
        em.crossJoin(broadcast(anchors))
          .where(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("dst"),
                  round(GraftFunctions.cosineSimilarity(va, vq), 4)
                    .as("sim"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("qid")
              .orderBy(col("sim").desc, col("dst"))))
          .where(col("rk") <= 8)
          .select(col("qid"), col("dst"))
      }
      val (exact, eh) = pin(topk(64))
      eh.count(); graft.PinScope.retain(eh)
      // the dims=64 self-check row reads hits = exact_pairs straight
      // off the pinned exact frame (re-ranking the truth against
      // itself is a wasted 64·n pass; the oracle hardcodes the row
      // the same way): three truncated passes plus one exact pass
      Seq(8, 16, 32).map { k =>
        val hits = topk(k).join(exact, Seq("qid", "dst"), "left_semi")
        exact.agg(count(lit(1)).as("exact_pairs"))
          .crossJoin(hits.agg(count(lit(1)).as("hits")))
          .select(lit(k.toLong).as("dims"), col("exact_pairs"),
                  col("hits"),
                  recallPpm.as("recall_ppm"))
      }.reduce(_ unionAll _)
        .unionAll(
          // the self-check row flows through the SHARED formula with
          // hits = exact_pairs (r16 ADVICE): on a degenerate corpus
          // (< 2 vectors ⇒ exact_pairs = 0) the zero-pair guard yields
          // 0 here exactly as it would for any other tier, instead of
          // a hardcoded perfect-recall literal
          exact.agg(count(lit(1)).as("exact_pairs"))
            .select(lit(64L).as("dims"), col("exact_pairs"),
                    col("exact_pairs").as("hits"),
                    recallPpm.as("recall_ppm")))
    }

  /** q353's int8 attestation PERSISTED — same write-once measurement
    * discipline as [[mrlAttestationTable]]; q362 reads the 'sq8' row
    * as the int8 candidate's measured recall. */
  private[graft] def sq8AttestationTable(s: SparkSession,
                                         d: String): String =
    graft.BucketedCache.ensure(s, d, "sq8att",
      "tier STRING, exact_pairs BIGINT, hits BIGINT, recall_ppm BIGINT",
      "tier", 1) {
      val em = embBase(s, d).where(col("vec_id") =!= 0)
      val scaleDf = em.agg(
        max(expr("aggregate(transform(v, x -> abs(x)), " +
                 "CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, x))"))
          .as("sc"))
      val eq = em.crossJoin(broadcast(scaleDf))
        .select(col("vec_id"), col("v"),
                expr("transform(v, x -> CAST(round(x * 127 / sc) " +
                     "AS BIGINT))").as("q"))
        .select(col("vec_id"), col("v"), col("q"),
                GraftFunctions.dotProductLong(col("q"), col("q"))
                  .as("nq"))
      val (anchors, ah) = pin(eq.orderBy("vec_id").limit(64)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
                col("q").as("qq"), col("nq").as("nqa")))
      ah.count(); graft.PinScope.retain(ah)
      def tier(name: String, ranked: DataFrame,
               exact: DataFrame): DataFrame = {
        val hits = ranked.join(exact, Seq("qid", "dst"), "left_semi")
        exact.agg(count(lit(1)).as("exact_pairs"))
          .crossJoin(hits.agg(count(lit(1)).as("hits")))
          .select(lit(name).as("tier"), col("exact_pairs"), col("hits"),
                  recallPpm.as("recall_ppm"))
      }
      val (exact, eh) = pin(eq.crossJoin(broadcast(anchors))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("dst"),
                round(GraftFunctions.cosineSimilarity(col("v"), col("qv")),
                      4).as("sim"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("sim").desc, col("dst"))))
        .where(col("rk") <= 8)
        .select(col("qid"), col("dst")))
      eh.count(); graft.PinScope.retain(eh)
      val sq8 = eq.crossJoin(broadcast(anchors))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("dst"),
                round(GraftFunctions.dotProductLong(col("q"), col("qq"))
                        .cast("double") /
                      sqrt(col("nq").cast("double") *
                           col("nqa").cast("double")), 4).as("sim"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("sim").desc, col("dst"))))
        .where(col("rk") <= 8)
        .select(col("qid"), col("dst"))
      tier("exact", exact, exact).unionAll(tier("sq8", sq8, exact))
    }

  /** q350's link budget — the HNSW efConstruction discipline: only
    * the batch node's [[GraphInsertEf]] BEST-scoring hubs expand to
    * their standing neighbors. The first cut expanded every hub of
    * both cells (2·cap·9 ≈ 1152 rescores per insert — 9× the build's
    * per-node cost, measured 177 s at the 100× ½-batch geometry,
    * MORE than a full rebuild); search-then-link caps the expansion
    * at 2·cap + ef·8 ≈ 256 and the measured line drops ~4×. */
  private[graft] val GraphInsertEf = 16

  /** q350's batch INSERT against [[beamGraphIncTable]] (also q344's
    * third recall tier), the HNSW search-then-link shape: the odd
    * batch assigns to its 2 nearest frozen cells (centroid vectors
    * read from the artifact's 'v' rows — never the even parquet),
    * SEARCH scores the cells' hubs and keeps the [[GraphInsertEf]]
    * best per node, LINK expands only those hubs' standing
    * out-neighbors (the localized descent step, scored once — hub
    * scores are never recomputed), new out-edges = the node's top-8
    * over hubs ∪ expanded neighbors (≤ 2·cap + ef·8 rescores per
    * insert), and each touched standing node merges the REVERSED
    * batch edges into its stored top-8 by the persisted scores — no
    * standing pair is ever rescored. Returns the merged edge list
    * (src, nn_rank, dst, es) over both halves. */
  private[graft] def graphInsertEdges(s: SparkSession, d: String,
                                      batchMod: Int = 2)
      : DataFrame = {
    val idx = s.table(beamGraphIncTable(s, d))
    val standing = idx.where(col("kind") === "e")
      .select(col("a").as("src"), col("b").as("dst"), col("es"))
    val hubs = idx.where(col("kind") === "h")
      .select(col("a").as("cid"), col("b").as("hid"))
    val nodes = idx.where(col("kind") === "v")
      .select(col("a").as("nid"), col("v").as("nv"))
    val batch = embBase(s, d).where(col("vec_id") % batchMod === 1)
    val packed = nodes.where(col("nid") < 2 * Cents)
      .select(col("nid").as("cid"), col("nv").as("cv"))
      .agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
    val bmem = batch.crossJoin(broadcast(packed))
      .select(col("vec_id"), explode(col("cents")).as("c"),
              col("v"))
      .select(col("vec_id"), col("c.cid").as("cid"),
              sqL2("v", "c.cv").as("dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))))
      .where(col("rn") <= 2)
      .select(col("vec_id"), col("cid"))
    val bv = batch.select(col("vec_id"), col("v").as("bv"))
    // SEARCH: score every hub of the node's 2 cells, once
    val hcd = bmem.join(hubs, Seq("cid"))
      .select(col("vec_id"), col("hid").as("cnd")).distinct()
    val hsc = hcd
      .join(bv, Seq("vec_id"))
      .join(nodes.select(col("nid").as("cnd"), col("nv")), Seq("cnd"))
      .select(col("vec_id"), col("cnd"),
              round(GraftFunctions.cosineSimilarity(col("bv"), col("nv")),
                    4).as("es"))
    // LINK: expand only the ef best hubs' standing neighbors, and
    // score only candidates the hub pass has not already scored
    val hk = hsc.withColumn("hr", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("es").desc, col("cnd"))))
      .where(col("hr") <= GraphInsertEf)
      .select(col("vec_id"), col("cnd"))
    val ncd = hk.join(standing.select(col("src").as("cnd"), col("dst")),
                      Seq("cnd"))
      .select(col("vec_id"), col("dst").as("cnd")).distinct()
      .join(hcd, Seq("vec_id", "cnd"), "left_anti")
    val nsc = ncd
      .join(bv, Seq("vec_id"))
      .join(nodes.select(col("nid").as("cnd"), col("nv")), Seq("cnd"))
      .select(col("vec_id"), col("cnd"),
              round(GraftFunctions.cosineSimilarity(col("bv"), col("nv")),
                    4).as("es"))
    val bnew = hsc.unionAll(nsc)
      .select(col("vec_id").as("src"), col("cnd").as("dst"), col("es"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("src").orderBy(col("es").desc, col("dst"))))
      .where(col("rk") <= 8).select("src", "dst", "es")
    val smerge = standing
      .unionAll(bnew.select(col("dst").as("src"), col("src").as("dst"),
                            col("es")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("src").orderBy(col("es").desc, col("dst"))))
      .where(col("rk") <= 8).select("src", "dst", "es")
    smerge.unionAll(bnew)
      .select(col("src"),
              row_number().over(Window.partitionBy("src")
                  .orderBy(col("es").desc, col("dst")))
                .cast("long").as("nn_rank"),
              col("dst"), col("es"))
  }

  /** The [[graphBuild]] text as oracle CTEs (ends at `${p}graph(src,
    * dst, es)`), parameterized by a CTE-name prefix `p` (so q344's
    * oracle can hold the full-corpus build AND the even standing
    * build side by side), a node-predicate suffix, and the centroid
    * cut — shared by the q342/q343/q344/q350/q351 oracles so every
    * tier certifies against ONE build definition. */
  private def beamGraphCteOn(p: String, where: String,
                             centPred: String): String =
    s"""${p}e AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id <> 0$where),
       |${p}c AS (SELECT vec_id AS cid, v AS cv FROM ${p}e
       |      WHERE $centPred),
       |${p}mem AS MATERIALIZED (SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        list_sum(list_transform(range(1, 65),
       |          i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))),
       |        c.cid) AS rn
       |    FROM ${p}e e, ${p}c c) WHERE rn <= 2),
       |${p}hub AS MATERIALIZED (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY cid
       |                         ORDER BY vec_id) AS hr
       |    FROM ${p}mem) WHERE hr <= $BeamHubCap),
       |${p}sc AS (SELECT DISTINCT m.vec_id AS a, h.vec_id AS b,
       |    round(list_cosine_similarity(x.v, y.v), 4) AS es
       |  FROM ${p}mem m JOIN ${p}hub h
       |    ON m.cid = h.cid AND m.vec_id <> h.vec_id
       |  JOIN ${p}e x ON m.vec_id = x.vec_id
       |  JOIN ${p}e y ON h.vec_id = y.vec_id),
       |${p}ed AS (SELECT a, b, es FROM ${p}sc
       |       UNION SELECT b, a, es FROM ${p}sc),
       |${p}graph AS MATERIALIZED (SELECT a AS src, b AS dst, es FROM (
       |    SELECT a, b, es,
       |      row_number() OVER (PARTITION BY a
       |                         ORDER BY es DESC, b) AS rk
       |    FROM ${p}ed) WHERE rk <= 8)""".stripMargin

  private def beamGraphCte: String =
    beamGraphCteOn("", "", s"vec_id < $Cents")

  /** The [[graphInsertEdges]] text as oracle CTEs: expects the
    * `$p`-prefixed even standing build ([[beamGraphCteOn]]) in scope
    * and ends at `${p}mrg(src, dst, es)` — the merged post-insert
    * edge set. */
  private def graphInsertCte(p: String): String =
    s"""${p}bq AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id % 2 = 1),
       |${p}bmem AS (SELECT vec_id, cid FROM (
       |    SELECT b.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
       |        list_sum(list_transform(range(1, 65),
       |          i -> (b.v[i] - c.cv[i]) * (b.v[i] - c.cv[i]))),
       |        c.cid) AS rn
       |    FROM ${p}bq b, ${p}c c) WHERE rn <= 2),
       |${p}hcd AS (SELECT DISTINCT m.vec_id, h.vec_id AS cnd
       |    FROM ${p}bmem m JOIN ${p}hub h ON m.cid = h.cid),
       |${p}hsc AS MATERIALIZED (SELECT cd.vec_id, cd.cnd,
       |    round(list_cosine_similarity(b.v, e.v), 4) AS es
       |  FROM ${p}hcd cd JOIN ${p}bq b ON cd.vec_id = b.vec_id
       |       JOIN ${p}e e ON cd.cnd = e.vec_id),
       |${p}hk AS (SELECT vec_id, cnd FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY es DESC, cnd) AS hr
       |    FROM ${p}hsc) WHERE hr <= $GraphInsertEf),
       |${p}ncd AS (SELECT DISTINCT k.vec_id, g.dst AS cnd
       |    FROM ${p}hk k JOIN ${p}graph g ON g.src = k.cnd
       |    WHERE NOT EXISTS (SELECT 1 FROM ${p}hcd h
       |      WHERE h.vec_id = k.vec_id AND h.cnd = g.dst)),
       |${p}nsc AS (SELECT cd.vec_id, cd.cnd,
       |    round(list_cosine_similarity(b.v, e.v), 4) AS es
       |  FROM ${p}ncd cd JOIN ${p}bq b ON cd.vec_id = b.vec_id
       |       JOIN ${p}e e ON cd.cnd = e.vec_id),
       |${p}bnew AS MATERIALIZED (SELECT src, dst, es FROM (
       |    SELECT vec_id AS src, cnd AS dst, es,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY es DESC, cnd) AS rk
       |    FROM (SELECT * FROM ${p}hsc
       |          UNION ALL SELECT * FROM ${p}nsc)) WHERE rk <= 8),
       |${p}smerge AS (SELECT src, dst, es FROM (
       |    SELECT *, row_number() OVER (PARTITION BY src
       |                                 ORDER BY es DESC, dst) AS rk
       |    FROM (SELECT src, dst, es FROM ${p}graph
       |          UNION ALL
       |          SELECT dst AS src, src AS dst, es FROM ${p}bnew))
       |  WHERE rk <= 8),
       |${p}mrg AS (SELECT src, dst, es FROM ${p}smerge
       |        UNION ALL SELECT src, dst, es FROM ${p}bnew)""".stripMargin

  /** One NN-descent round as oracle CTEs: candidates from graph CTE
    * `$g` (2-hop union), exact rescore against the full-corpus `e`
    * nodes, per-src top-8 — ends at `g$k(src, dst)`. The SQL twin of
    * [[descentRound]], unrolled per round by the q351 oracle. */
  private def descentCte(k: Int, g: String): String =
    s"""cd$k AS (SELECT g1.src, g2.dst AS cnd
       |         FROM $g g1 JOIN $g g2 ON g1.dst = g2.src
       |         WHERE g1.src <> g2.dst
       |         UNION SELECT src, dst FROM $g),
       |g$k AS MATERIALIZED (SELECT src, dst FROM (
       |    SELECT cd.src, cd.cnd AS dst,
       |      row_number() OVER (PARTITION BY cd.src ORDER BY
       |        round(list_cosine_similarity(x.v, y.v), 4) DESC,
       |        cd.cnd) AS rk
       |    FROM cd$k cd JOIN e x ON cd.src = x.vec_id
       |            JOIN e y ON cd.cnd = y.vec_id)
       |  WHERE rk <= 8)""".stripMargin

  /** One NN-descent refinement round over the persisted q342 graph
    * (q343/q344's shared body): candidates = each node's current
    * neighbors ∪ its neighbors' neighbors (Dong et al. 2011's core
    * observation — a neighbor of a neighbor is likely a neighbor),
    * rescored exactly and cut back to the per-src top-8. The top-8
    * over a SUPERSET of the current edges can only improve per-edge
    * similarity — spec-asserted. Cost: |E|·8 = 64·n candidate
    * rescores — linear, the round's whole point vs an n² rebuild.
    * Returns (src, nn_rank, dst, es). */
  private def nnDescentEdges(s: SparkSession, d: String): DataFrame =
    descentRound(s.table(beamGraphTable(s, d))
                   .select("src", "dst"), embBase(s, d))

  /** [[nnDescentEdges]] generalized over the input graph — q351's
    * convergence loop feeds each round's output back in. */
  private def descentRound(graph: DataFrame, em: DataFrame): DataFrame = {
    val cand = graph
      .join(graph.select(col("src").as("mid"), col("dst").as("dst2")),
            col("dst") === col("mid"))
      .where(col("src") =!= col("dst2"))
      .select(col("src"), col("dst2").as("cnd"))
      .unionAll(graph.select(col("src"), col("dst").as("cnd")))
      .distinct()
    cand
      .join(em.select(col("vec_id").as("src"), col("v").as("va")),
            Seq("src"))
      .join(em.select(col("vec_id").as("cnd"), col("v").as("vb")),
            Seq("cnd"))
      .select(col("src"), col("cnd").as("dst"),
              round(GraftFunctions.cosineSimilarity(col("va"), col("vb")),
                    4).as("es"))
      .withColumn("nn_rank", row_number().over(
        Window.partitionBy("src").orderBy(col("es").desc, col("dst")))
        .cast("long"))
      .where(col("nn_rank") <= 8)
      .select(col("src"), col("nn_rank"), col("dst"), col("es"))
  }

  /** q339's persisted SemDeDup MODEL — one cid-bucketed table holding
    * both halves of the fitted even-corpus model: member rows (kind
    * 'm': final Lloyd assignment with the quantized lattice vector and
    * its pinned norm) and the centroid rows that PRODUCED that
    * assignment (kind 'c': xi = the c3 table — what a later batch must
    * argmin against to extend the assignment). Fit once per (session,
    * corpus), probed per batch; the cid bucketing is the co-cluster
    * pair join's layout key. */
  private[graft] def semDedupIndexTable(s: SparkSession, d: String): String =
    graft.BucketedCache.ensure(s, d, "semidx",
      "kind STRING, id BIGINT, cid BIGINT, nv BIGINT, xi ARRAY<BIGINT>",
      "cid", 8) {
      val (as0, cs0) = lloydRounds(s,
        embBase(s, d).where(col("vec_id") % 2 === 0),
        col("vec_id") < 2 * Cents)
      as0.last.select(lit("m").as("kind"), col("vec_id").as("id"),
          col("cid"),
          GraftFunctions.dotProductLong(col("xi"), col("xi")).as("nv"),
          col("xi"))
        .unionByName(cs0.last.select(lit("c").as("kind"),
          col("cid").as("id"), col("cid"), lit(0L).as("nv"),
          col("ci").as("xi")))
    }

  /** q356's persisted √n-cell SemDeDup MODEL (added r16; the r15
    * verdict's #1 promoted the MEASURED lever — 12.6× less gate
    * wall-clock AND 2.7× more duplicates found at 100× than the
    * 16-cell model, BASELINE's SweepR15 cells table — into the
    * production-facing online gate's artifact). Same two-kind layout
    * as [[semDedupIndexTable]] but at q355's geometry: k = ⌈√|even|⌉
    * computed in-frame, cells = the 2k lowest even ids (sampled,
    * q73's discipline — NOT a Lloyd fit: at cells ∝ √n a Lloyd round
    * costs k·n distance evaluations ∝ n^1.5, while sampled cells keep
    * the build one linear assignment pass; q355 certified the
    * sampled-cell census against DuckDB so the oracle text is shared),
    * members = the even half argmin-assigned once. 32 cid buckets
    * (vs semidx's 8): the cell count scales with the corpus, so the
    * probe join's layout key needs more parallel grain. */
  private[graft] def semDedupSqrtIndexTable(s: SparkSession,
                                            d: String): String =
    graft.BucketedCache.ensure(s, d, "semsqidx",
      "kind STRING, id BIGINT, cid BIGINT, nv BIGINT, xi ARRAY<BIGINT>",
      "cid", 32) {
      val em = embBase(s, d).where(col("vec_id") =!= 0)
        .select(col("vec_id"),
          expr("transform(v, x -> CAST(round(x * 1000000) AS BIGINT))")
            .as("xi"))
      val kDf = em.where(col("vec_id") % 2 === 0)
        .agg(ceil(sqrt(count(lit(1)))).cast("long").as("k"))
      val cents = em.where(col("vec_id") % 2 === 0)
        .crossJoin(broadcast(kDf))
        .where(col("vec_id") <= lit(2) * col("k"))
        .select(col("vec_id").as("cid"), col("xi").as("ci"))
      val packed = cents
        .agg(collect_list(struct(col("cid"), col("ci"))).as("cents"))
      em.where(col("vec_id") % 2 === 0)
        .crossJoin(broadcast(packed))
        .select(lit("m").as("kind"), col("vec_id").as("id"),
                GraftFunctions.argminCentroidLong(col("xi"), col("cents"))
                  .as("cid"),
                GraftFunctions.dotProductLong(col("xi"), col("xi"))
                  .as("nv"),
                col("xi"))
        .unionByName(cents.select(lit("c").as("kind"),
          col("cid").as("id"), col("cid"), lit(0L).as("nv"),
          col("ci").as("xi")))
    }

  /** The q345 TWO-LEVEL online-gate MODEL (r17; the r16 verdict's #3
    * — "no shipped query carries the known-truncating 16-cell
    * model"): the √n/hybrid fine-cell geometry of [[
    * semDedupSqrtIndexTable]] — k = max(⌈√|even|⌉, ⌈|even|/cap⌉), the
    * production cap-aware rule, which reads ⌈√|even|⌉ at every test
    * SF — PLUS the [[twoLevelRouter]] build: coarse cells ('o' rows)
    * and the replicated fine→coarse routing table ('f' rows, id =
    * fine cid / cid = ccid / xi = fine centroid), and members ('m')
    * assigned through the SAME two-level path the gate runs — the
    * index is self-consistent: an arrival and a member at the same
    * point route to the same cell by construction. 32 cid buckets
    * (the member-probe join's layout key, q356's grain). */
  private[graft] def semDedupTwoIndexTable(s: SparkSession,
                                           d: String): String =
    graft.BucketedCache.ensure(s, d, "semtwoidx",
      "kind STRING, id BIGINT, cid BIGINT, nv BIGINT, xi ARRAY<BIGINT>",
      "cid", 32) {
      val em = latticeFrame(s, d, Long.MaxValue)
        .where(col("vec_id") % 2 === 0)
      val kAgg = greatest(ceil(sqrt(count(lit(1)))).cast("long"),
        expr(s"(count(1) + ${SemDedupClusterCap - 1}) DIV " +
             s"$SemDedupClusterCap").cast("long"))
      val (cents, assigned) = hybridCellAssign(em, kAgg, twoLevel = true)
      val (coarse, fa) = twoLevelRouter(cents)
      assigned.select(lit("m").as("kind"), col("vec_id").as("id"),
          col("cid"), col("nv"), col("xi"))
        .unionByName(cents.select(lit("c").as("kind"),
          col("cid").as("id"), col("cid"), lit(0L).as("nv"),
          col("ci").as("xi")))
        .unionByName(coarse.select(lit("o").as("kind"),
          col("ccid").as("id"), col("ccid").as("cid"), lit(0L).as("nv"),
          col("cci").as("xi")))
        .unionByName(fa.select(lit("f").as("kind"), col("cid").as("id"),
          col("ccid").as("cid"), lit(0L).as("nv"), col("ci").as("xi")))
    }

  /** Bumped on ANY change to the at-rest fine-group layout or its
    * packing rule. */
  private val TwoFineBuilderVersion = 1

  /** The standing model's ROUTING TABLE AT REST (r19, the r18
    * verdict's #2 / §14.1 #3): the semtwoidx 'f' rows PRE-PACKED to
    * one (ccid, fc) row per coarse bucket and committed ccid-BUCKETED
    * — the serving join's model side as a layout, not a per-plan
    * repack. Past the declared broadcast ceiling (the 10⁹-vector
    * census point prices the side at 1.18 GB) the shuffled-hash
    * serving join then reads this table's bucketing straight into its
    * distribution requirement: ZERO exchange on the static side, only
    * arrivals move — the claim the family's docstrings made ("at
    * 100 TB the fine table is written ccid-bucketed") now committed
    * code. The BUILD itself is exchange-free on the group-by too:
    * semtwoidx is bucketed by `cid`, and an 'f' row's `cid` column IS
    * its ccid, so the pack rides the source bucketing. Consumers:
    * every gate surface serving the NIGHTLY model (v1's content ≡
    * semtwoidx by construction — gateModelRoot commits v1 from the
    * table); a mid-cycle rebuild (v2/v3) packs its own fine side per
    * plan until its nightly landing commits the layout. */
  private[graft] def semDedupTwoFineTable(s: SparkSession,
                                          d: String): String =
    graft.BucketedCache.ensure(s, d, s"semtwofine_b$TwoFineBuilderVersion",
      "ccid BIGINT, fc ARRAY<STRUCT<cid: BIGINT, ci: ARRAY<BIGINT>>>",
      "ccid", 32) {
      val idxT = semDedupTwoIndexTable(s, d)
      s.table(idxT).where(col("kind") === "f")
        .select(col("cid").as("ccid"),
                struct(col("id").as("cid"), col("xi").as("ci")).as("e"))
        .groupBy("ccid")
        .agg(collect_list(col("e")).as("fc"))
    }

  /** Deterministic sampled IVF centroids (cid, cv). `n` defaults to the
    * frozen [[Cents]] every declared query uses (oracle determinism);
    * the q120 production variant passes cells ∝ √corpus. */
  private def centroids(em: DataFrame, n: Int = Cents): DataFrame =
    em.where(col("vec_id") < n)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

  /** The IVF assignment pass shared by q73 (inline) and q79 (persisted
    * index build): centroids pack into ONE broadcast row (collect_list,
    * the q43 mold) and each vector gets (nv, cid) in a zero-shuffle
    * codegen'd map over it — the ArgminCentroid kernel; the corpus
    * never shuffles to be assigned. One definition keeps the two
    * queries' "exactly the same assignment" contract structural. */
  private def ivfAssign(em: DataFrame): DataFrame =
    ivfAssignC(em, centroids(em))

  /** [[ivfAssign]] against an explicit centroid table (the production
    * variant's √n-cell codebook). */
  private def ivfAssignC(em: DataFrame, cent: DataFrame): DataFrame = {
    val packed = cent
      .agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
    em.crossJoin(broadcast(packed))
      .select(col("vec_id"), col("v"),
              GraftFunctions.vectorNorm(col("v")).as("nv"),
              GraftFunctions.argminCentroid(col("v"), col("cents")).as("cid"))
  }

  /** Squared L2 between two array columns — the same sequential fold
    * the oracle's `list_sum(list_transform(...))` performs, so probe
    * selection is bit-identical to the assignment kernel's metric.
    * Since r14 this routes through the codegen'd [[GraftFunctions
    * .squaredL2]] kernel (same fold, no interpreted HOF): most call
    * sites are ≤16-centroid probe selections where it hardly matters,
    * but q342's graph build runs it n×16 times. */
  private def sqL2(a: String, b: String): Column =
    GraftFunctions.squaredL2(col(a), col(b))

  /** One packed PQ codebook row (q100/q105): per subspace, the
    * PqCents codewords pre-sliced to that subspace's dims
    * (sort_array → position k holds cid k). Codebooks are
    * deterministic via the q73 sampling trick (vec_id < PqCents) —
    * zero trained state. */
  private def pqPacked(em: DataFrame): DataFrame = {
    val cb = em.where(col("vec_id") < PqCents)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val centCols = (0 until PqSub).map { ss =>
      sort_array(collect_list(struct(col("cid"),
        slice(col("cv"), ss * PqDim + 1, PqDim).as("cv"))))
        .as(s"cents$ss")
    }
    cb.agg(centCols.head, centCols.tail: _*)
  }

  /** Per-row PQ code assignment + asymmetric distance (the Jégou et
    * al. ADC form) over `v`, `qv` and the packed codebook columns —
    * one codegen'd expression per subspace (ArgminCentroid to code,
    * SquaredL2 to the looked-up codeword), summed left-to-right so
    * the fold order is reproducible in the oracle. */
  private def pqAdc: Column = (0 until PqSub).map { ss =>
    val code = GraftFunctions.argminCentroid(
      slice(col("v"), ss * PqDim + 1, PqDim), col(s"cents$ss"))
    GraftFunctions.squaredL2(
      slice(col("qv"), ss * PqDim + 1, PqDim),
      element_at(col(s"cents$ss"), (code + 1).cast("int"))("cv"))
  }.reduce(_ + _)

  /** ADC from STORED codes (q107): the index row carries its 8
    * one-byte codes as columns c0..c7; the asymmetric distance is the
    * codeword lookup against the broadcast packed codebooks — no
    * coding at query time, which is the whole point of a coded index:
    * the stored layout IS the quantization. */
  private def pqAdcStored: Column = (0 until PqSub).map { ss =>
    GraftFunctions.squaredL2(
      slice(col("qv"), ss * PqDim + 1, PqDim),
      element_at(col(s"cents$ss"), (col(s"c$ss") + 1).cast("int"))("cv"))
  }.reduce(_ + _)

  /** Full sign signature via the codegen'd kernel. */
  private def sigColumn: Column = GraftFunctions.lshSignature(vec, Planes)

  /** 1-based substring band `b` of a signature column. */
  private def band(sig: Column, b: Int): Column =
    substring(sig, 1 + b * BandBits, BandBits)

  /** Distinct (a, b) pairs (a < b) sharing at least one signature band —
    * union of per-band bucket-equijoins, never an all-pairs scan. */
  /** q56's hot-bucket cap (q46's `HotBucketCap` principle for the
    * EMBEDDING band space): a band bucket holding B vectors contributes
    * B² candidate pairs, so one boilerplate-dense bucket can dominate
    * Σ bucket² — the r11 100× sweep measured the uncapped form filling
    * the spill disk (embedding families concentrate into few 8-bit
    * band buckets). 128 sits above every test-SF bucket (measured max
    * 75 at sf0.1, 22/24 below), so declared results and the oracle
    * stay exact; past the cap a bucket is dropped WHOLESALE — beyond
    * that density, band collisions are boilerplate geometry, not
    * near-dup evidence. CorrectnessSpec exercises the capped regime
    * directly with a low cap. */
  private[graft] val EmbBucketCap = 128

  private[graft] def bandedPairs(base: DataFrame,
                                 maxBucket: Int = Int.MaxValue): DataFrame =
    (0 until Bands).map { b =>
      val keyed = base.select(band(col("sig"), b).as("bk"), col("vec_id"))
      // the bucket-size window shuffles on the SAME bk key the
      // self-join uses, so the cap adds no extra exchange (q46's
      // argument, verbatim)
      val kept = keyed
        .withColumn("bc", count(lit(1)).over(Window.partitionBy("bk")))
        .where(col("bc") <= maxBucket)
      val x = kept.select(col("bk"), col("vec_id").as("a"))
      val y = kept.select(col("bk"), col("vec_id").as("b"))
      x.join(y, Seq("bk")).where(col("a") < col("b")).select("a", "b")
    }.reduce(_.unionAll(_)).distinct()

  /** q339's incremental SemDeDup building blocks — (pinned assigned
    * batch, standing members, pinned dup pairs (cid, a, b)) — factored
    * so the q347 intake funnel consumes the IDENTICAL dup set (one
    * truth per tier). See q339's registry docstring for the full
    * semantics. */
  private[graft] def semDedupIncParts(s: SparkSession, d: String,
                                      batchMod: Int = 2)
      : (DataFrame, DataFrame, DataFrame) = {
    // batchMod: the r15 batch-fraction sweep knob (see DedupExtOps
    // .minimizerIncPairs) — batch = vec_id ≡ 1 (mod batchMod), a
    // subset of the odd half; mod 2 is the declared query.
    val idx = s.table(semDedupIndexTable(s, d))
    val cents = idx.where(col("kind") === "c")
      .select(col("cid"), col("xi").as("ci"))
    val old = idx.where(col("kind") === "m")
      .select(col("cid"), col("id"), col("nv"), col("xi"))
    val batchQ = embBase(s, d).where(col("vec_id") % batchMod === 1)
      .select(col("vec_id"),
        expr("transform(v, x -> CAST(round(x * 1000000) AS BIGINT))")
          .as("xi"))
    val (batch, bh) = pin(lloydAssign(batchQ, cents)
      .select(col("vec_id"), col("cid"), col("xi"),
              GraftFunctions.dotProductLong(col("xi"), col("xi"))
                .as("nv")))
    bh.count(); graft.PinScope.retain(bh)
    val wCap = org.apache.spark.sql.expressions.Window
      .partitionBy("cid").orderBy("vec_id")
    val batchCap = batch
      .withColumn("mrk", row_number().over(wCap))
      .where(col("mrk") <= SemDedupClusterCap).drop("mrk")
    val oldCap = old
      .withColumn("mrk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cid").orderBy("id")))
      .where(col("mrk") <= SemDedupClusterCap).drop("mrk")
    val newSide = batchCap.select(col("cid"), col("vec_id").as("b"),
                                  col("xi").as("xb"), col("nv").as("nb"))
    val newOld = oldCap
      .select(col("cid"), col("id").as("a"),
              col("xi").as("xa"), col("nv").as("na"))
      .join(newSide, Seq("cid"))
    val newNew = batchCap
      .select(col("cid"), col("vec_id").as("a"),
              col("xi").as("xa"), col("nv").as("na"))
      .join(newSide, Seq("cid")).where(col("a") < col("b"))
    val pairs = newOld.unionAll(newNew)
      .withColumn("dot",
        GraftFunctions.dotProductLong(col("xa"), col("xb")))
      .where(col("dot") > 0 &&
             col("dot").cast("decimal(38,0)") * col("dot") * 10000 >=
               col("na").cast("decimal(38,0)") * col("nb") * 1600)
      .select(col("cid"), col("a"), col("b"))
    val (dp, dh) = pin(pairs); dh.count(); graft.PinScope.retain(dh)
    (batch, old, dp)
  }

  /** SweepR15's "cells" lever measurement (NOT a declared query): the
    * q345 floor paragraph records "more/smaller clusters shrink every
    * gate rectangle" as the production lever — this measures it. The
    * semantic gate's cost shape at `k` cells: quantize to the 1e6
    * lattice, assign the even half (capped members) and the odd half
    * (uncapped arrivals) to the k lowest even-id sampled cells via
    * the codegen'd integer argmin, score every arrival×member
    * co-cluster pair with the exact-lattice dup predicate. Returns a
    * 1-row census (cells, pair_rows, dups) — the sweep times the
    * pass; pair_rows IS Σ_c odd_c·min(cap, even_c). Sampled cells
    * (q73's discipline), not the Lloyd fit: the lever under test is
    * the CELL COUNT's effect on rectangle mass, and sampling keeps
    * the k=16 baseline and the k=√n variant structurally identical. */
  private[graft] def gateRectangleProbe(s: SparkSession, d: String,
                                        k: Int): DataFrame = {
    val em = embBase(s, d).where(col("vec_id") =!= 0)
      .select(col("vec_id"),
        expr("transform(v, x -> CAST(round(x * 1000000) AS BIGINT))")
          .as("xi"))
    val packed = em
      .where(col("vec_id") % 2 === 0 && col("vec_id") <= 2L * k)
      .select(col("vec_id").as("cid"), col("xi").as("ci"))
      .agg(collect_list(struct(col("cid"), col("ci"))).as("cents"))
    val assigned = em.crossJoin(broadcast(packed))
      .select(col("vec_id"), col("xi"),
              GraftFunctions.argminCentroidLong(col("xi"), col("cents"))
                .as("cid"),
              GraftFunctions.dotProductLong(col("xi"), col("xi"))
                .as("nv"))
    val members = assigned.where(col("vec_id") % 2 === 0)
      .withColumn("mrk", row_number().over(
        Window.partitionBy("cid").orderBy("vec_id")))
      .where(col("mrk") <= SemDedupClusterCap)
      .select(col("cid"), col("xi").as("xa"), col("nv").as("na"))
    val arrivals = assigned.where(col("vec_id") % 2 === 1)
      .select(col("cid"), col("xi").as("xb"), col("nv").as("nb"))
    arrivals.join(members, Seq("cid"))
      .withColumn("dot",
        GraftFunctions.dotProductLong(col("xa"), col("xb")))
      .agg(count(lit(1)).as("pair_rows"),
           sum(when(col("dot") > 0 &&
                    col("dot").cast("decimal(38,0)") * col("dot") * 10000 >=
                      col("na").cast("decimal(38,0)") * col("nb") * 1600,
                    1L).otherwise(0L)).as("dups"))
      .select(lit(k.toLong).as("cells"), col("pair_rows"), col("dups"))
  }

  /** q355/q367's shared cell-census body: quantize to the lattice,
    * sample the 2k lowest even ids as cells (k = `kAgg` over the even
    * half), assign both halves via the codegen'd integer argmin, cap
    * members at `cap` per cell, score every arrival×member co-cluster
    * pair with the exact-lattice dup line, report the per-cell census
    * (+ a `capped` flag when the certification geometry wants cap
    * hits visible). One definition so the √n census (q355) and the
    * cap-aware hybrid census (q367) differ ONLY in their declared k
    * and cap. */
  /** The (fine cells, assignment) pair every cell-census/certification
    * query starts from: quantize `em` rows to the 1e6 lattice is the
    * CALLER's job — this takes the lattice frame, computes k = `kAgg`
    * over the even half in-frame, cuts cells = the 2k lowest even ids
    * (q73's dense-id sampling), and assigns EVERY vector a cell id.
    *
    * `twoLevel = false` is the flat assigner: all k cells pack into one
    * broadcast row and each vector pays a k-way codegen'd integer
    * argmin — exact, but at the cap-aware hybrid k (= n/cap once the
    * cap binds) the linear cell scan IS the cost (measured 49.6 s of
    * pure assignment @100×, the r16 q367 note).
    *
    * `twoLevel = true` is the PRODUCTION assigner at that k (the r16
    * verdict's #1): a two-level coarse quantizer — the IVF coarse/fine
    * discipline (Jégou et al. 2011's inverted-file coarse quantizer
    * applied to cell assignment). Coarse cells = the ⌈√k⌉ lowest-cid
    * fine cells (the same dense-id cut one level up, so both engines
    * restate it as `cid <= 2·kc`); each FINE cell assigns once to its
    * nearest coarse cell (k·√k integer distances, build-side); each
    * VECTOR argmins over the √k coarse cells, then over only the fine
    * cells OF its coarse cell — ≈ 2√k distances per vector instead of
    * k. Both argmin passes are the same codegen'd kernel over packed
    * centroid rows; the per-coarse fine lists join on ccid through
    * [[twoLevelAssign]]'s DECLARED size switch (broadcast at or under
    * [[TwoLevelBroadcastCeilingBytes]], ccid-co-bucketed shuffled
    * hash past it — the corpus is never a broadcast and never sorts
    * for its own assignment). The price is approximation: a vector
    * whose true nearest fine cell lives under a DIFFERENT coarse cell
    * mis-assigns — q370 measures exactly that against the flat truth
    * (assignment agreement + gate recall) on the declared slice. */
  private[graft] def hybridCellAssign(em: DataFrame, kAgg: Column,
                               twoLevel: Boolean,
                               fineBroadcastCeiling: Long =
                                 TwoLevelBroadcastCeilingBytes)
      : (DataFrame, DataFrame) = {
    val kDf = em.where(col("vec_id") % 2 === 0).agg(kAgg.as("k"))
    val cents = em.where(col("vec_id") % 2 === 0)
      .crossJoin(broadcast(kDf))
      .where(col("vec_id") <= lit(2) * col("k"))
      .select(col("vec_id").as("cid"), col("xi").as("ci"))
    val assigned =
      if (!twoLevel) {
        val packed = cents
          .agg(collect_list(struct(col("cid"), col("ci"))).as("cents"))
        em.crossJoin(broadcast(packed))
          .select(col("vec_id"), col("xi"),
                  GraftFunctions.argminCentroidLong(col("xi"), col("cents"))
                    .as("cid"),
                  GraftFunctions.dotProductLong(col("xi"), col("xi"))
                    .as("nv"))
      } else twoLevelAssign(em, cents, fineBroadcastCeiling)
    (cents, assigned)
  }

  /** The two-level SERVING pass from an explicit fine-cell table —
    * [[hybridCellAssign]]'s production branch, shared with the gate
    * rebuild (q375/q377's v2 model assigns its mixed-parity
    * population through exactly this path): one √k-way coarse argmin
    * over the packed-coarse broadcast row, then a ccid equi-join
    * against the replicated fine groups and one argmin over the
    * bucket's fine cells. The fine-group side picks its join shape by
    * the DECLARED size switch (r16 verdict #1 → r17 measurement → r18
    * wiring): entries = |cents|·R priced at
    * [[TwoLevelFineEntryBytes]]; at or under
    * [[TwoLevelBroadcastCeilingBytes]] the side rides an EXPLICIT
    * broadcast — the r17 A/B measured WHY the switch must not be
    * AQE's 10 MB default (un-hinted, AQE shuffled the 58 MB 100× side
    * and the q369/q370 lines regressed 25–35%; best 6.96 s broadcast
    * vs 9.40 s shuffled) — and PAST the ceiling (the 10⁹-vector
    * census point prices the side at 1.18 GB, ProbeRouterBuild) the
    * same plan swaps the hint for the ccid-co-bucketed SHUFFLED HASH
    * join: both sides hash-partition on ccid (at 100 TB the fine
    * table is WRITTEN ccid-bucketed, so only the arrival side moves),
    * the corpus-side exchange is one hash partitioning of (vec_id,
    * xi, ccid) — never a sort, never a corpus broadcast. The |cents|
    * count is a bounded build-side action (the model's cell count —
    * the size probe a planner runs), paid once per assignment plan. */
  private[graft] def twoLevelAssign(em: DataFrame, cents: DataFrame,
      fineBroadcastCeiling: Long = TwoLevelBroadcastCeilingBytes)
      : DataFrame = {
    val (coarse, fa) = twoLevelRouter(cents)
    // the kernel's input type names its struct fields (cid, ci)
    val packedCoarse = coarse
      .agg(collect_list(struct(col("ccid").as("cid"),
                               col("cci").as("ci"))).as("cc"))
    val packedFine = fa
      .groupBy("ccid")
      .agg(collect_list(struct(col("cid"), col("ci"))).as("fc"))
    val fineEntries = cents.count() * TwoLevelRep
    val fineSide =
      if (fineEntries * TwoLevelFineEntryBytes <= fineBroadcastCeiling)
        broadcast(packedFine)
      else packedFine.hint("shuffle_hash")
    em.crossJoin(broadcast(packedCoarse))
      .select(col("vec_id"), col("xi"),
              GraftFunctions.argminCentroidLong(col("xi"), col("cc"))
                .as("ccid"))
      .join(fineSide, Seq("ccid"))
      .select(col("vec_id"), col("xi"),
              GraftFunctions.argminCentroidLong(col("xi"), col("fc"))
                .as("cid"),
              GraftFunctions.dotProductLong(col("xi"), col("xi"))
                .as("nv"))
  }

  /** The two-level router's BUILD side, shared by [[hybridCellAssign]]
    * and the q345 online-gate artifact: kc = ⌈√k⌉ coarse cells (the
    * 2kc lowest fine cids — computed from the CELL count, not the
    * corpus count: the two differ when id gaps shrink the cut), and
    * the fine→coarse routing table in which every fine cell
    * REPLICATES into its [[TwoLevelRep]] nearest coarse buckets
    * (k·kc integer distances + one cid-partitioned top-R window —
    * nightly-build cost, never per-vector). The distance rides the
    * codegen'd dot kernel as ‖a‖² + ‖b‖² − 2·a·b — exact integer
    * identity with Σ(aᵢ−bᵢ)², replacing the interpreted zip_with HOF
    * that was the measured hot half of the 100× build (k·kc = 1.4M
    * 64-element lambda chains). Replication is the spill-tree remedy
    * for boundary loss AT THE BUILD, which keeps the per-vector path
    * a single coarse probe — the streaming-friendly shape. A coarse
    * bucket always holds at least its own fine form (dist-0
    * self-route survives any top-R cut), so consumers' ccid
    * equi-joins are inner. Returns (coarse (ccid, cci),
    * fa (cid, ci, ccid)). */
  private[graft] def twoLevelRouter(cents: DataFrame)
      : (DataFrame, DataFrame) = {
    val kcDf = cents.agg(ceil(sqrt(count(lit(1)))).cast("long")
      .as("kc"))
    val coarse = cents.crossJoin(broadcast(kcDf))
      .where(col("cid") <= lit(2) * col("kc"))
      .select(col("cid").as("ccid"), col("ci").as("cci"))
    val fa = cents
      .select(col("cid"), col("ci"),
              GraftFunctions.dotProductLong(col("ci"), col("ci"))
                .as("nf"))
      .crossJoin(broadcast(coarse.select(col("ccid"), col("cci"),
        GraftFunctions.dotProductLong(col("cci"), col("cci"))
          .as("nc"))))
      .select(col("cid"), col("ci"), col("ccid"),
        (col("nf") + col("nc") -
         lit(2L) * GraftFunctions.dotProductLong(col("ci"),
                                                 col("cci")))
          .as("dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cid").orderBy("dist", "ccid")))
      .where(col("rn") <= TwoLevelRep)
      .select(col("cid"), col("ci"), col("ccid"))
    (coarse, fa)
  }

  /** The 1e6-lattice projection of the corpus minus the query vector,
    * bounded to `idCap` — the shared head of every cell census. */
  private[graft] def latticeFrame(s: SparkSession, d: String,
                           idCap: Long): DataFrame =
    embBase(s, d)
      .where(col("vec_id") =!= 0 && col("vec_id") < idCap)
      .select(col("vec_id"),
        expr("transform(v, x -> CAST(round(x * 1000000) AS BIGINT))")
          .as("xi"))

  private def semDedupCellCensus(s: SparkSession, d: String,
                                 kAgg: Column, cap: Long,
                                 capFlag: Boolean,
                                 idCap: Long = Long.MaxValue,
                                 twoLevel: Boolean = false): DataFrame = {
    val em = latticeFrame(s, d, idCap)
    val (cents, assigned0) = hybridCellAssign(em, kAgg, twoLevel)
    // the census tail reads the assignment FOUR times (members and
    // arrivals each feed both the dup join and their own census agg);
    // unpinned, the r17 probe measured the two-level 100× line as 4×
    // the single assignment pass — pin once, pay once
    val (assigned, ah) = pin(assigned0)
    ah.count(); graft.PinScope.retain(ah)
    val members = cappedMemberSide(
      assigned.where(col("vec_id") % 2 === 0), cap)
    val arrivals = assigned.where(col("vec_id") % 2 === 1)
      .select(col("cid"), col("vec_id").as("b"), col("xi").as("xb"),
              col("nv").as("nb"))
    val dups = gateDupPairs(arrivals,
        members.select(col("cid"), col("xa"), col("na")))
      .groupBy("cid")
      .agg(count(lit(1)).as("dup_pairs"),
           countDistinct(col("b")).as("dropped"))
    val base = cents.select(col("cid"))
      .join(members.groupBy("cid")
              .agg(count(lit(1)).as("standing")), Seq("cid"), "left")
      .join(arrivals.groupBy("cid")
              .agg(count(lit(1)).as("arrivals")), Seq("cid"), "left")
      .join(dups, Seq("cid"), "left")
      .select(col("cid"),
              coalesce(col("standing"), lit(0L)).as("standing"),
              coalesce(col("arrivals"), lit(0L)).as("arrivals"),
              coalesce(col("dup_pairs"), lit(0L)).as("dup_pairs"),
              coalesce(col("dropped"), lit(0L)).as("dropped"))
      .withColumn("keep_ppm", expr(
        "CASE WHEN arrivals = 0 THEN 1000000 ELSE " +
        "(1000000 * (arrivals - dropped)) DIV arrivals END"))
    (if (capFlag)
       base.withColumn("capped",
         when(col("standing") === cap, 1L).otherwise(0L))
     else base)
      .orderBy("cid")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_lsh_buckets" -> { (s, d) =>
      Tables(s, d, "embeddings")
        .select(col("vec_id"), sigColumn.as("sig"))
        .groupBy("sig")
        .agg(count(lit(1)).as("cnt"), min("vec_id").as("min_vec"))
        .orderBy("sig")
    },

    "q53_ann_query" -> { (s, d) =>
      val em = Tables(s, d, "embeddings")
      val q = em.where(col("vec_id") === 0).select(vec.as("qv"))
      em.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
                round(GraftFunctions.cosineSimilarity(vec, col("qv")), 4)
                  .as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },

    // Embedding-based near-dup detection, composed from the scale-path
    // pieces: banded LSH candidates -> exact cosine verification ->
    // threshold. Cost is O(Bands · Σ bucket²) under the
    // [[EmbBucketCap]] hot-bucket cap (a no-op at every test SF —
    // measured max bucket 75 at sf0.1 — so the oracle stays exact; at
    // the r11 100× stress the UNCAPPED form's Σ bucket² filled the
    // spill disk, which is exactly what the cap exists to bound),
    // never all-pairs; the vectors are re-joined by id so only (a, b)
    // id pairs pass through the distinct. Verification uses the
    // stored-norm decomposition: each side's L2 norm is computed ONCE
    // in the base projection (n folds) and the per-pair work is a
    // single dot fold — bit-identical to the fused cosine kernel at
    // the engine's fixed dim=64 (see VectorKernels.dot).
    "q56_dedup_embedding" -> { (s, d) =>
      val base = Tables(s, d, "embeddings")
        .select(col("vec_id"), vec.as("v"), sigColumn.as("sig"),
                GraftFunctions.vectorNorm(vec).as("nv"))
      bandedPairs(base, maxBucket = EmbBucketCap)
        .join(base.select(col("vec_id").as("a"), col("v").as("va"),
                          col("nv").as("na")), Seq("a"))
        .join(base.select(col("vec_id").as("b"), col("v").as("vb"),
                          col("nv").as("nb")), Seq("b"))
        .select(col("a"), col("b"),
                round(GraftFunctions.dotProduct(col("va"), col("vb")) /
                      (col("na") * col("nb")), 4).as("sim"))
        .where(col("sim") >= 0.4)
        .orderBy("a", "b")
    },

    // Hard-negative mining (added r13) — the CONTRASTIVE-TRAINING
    // data op between q56's near-dup removal and q53's retrieval: for
    // each anchor, the most-similar candidates that are NOT
    // near-duplicates (cosine in [0.25, 0.4) — the upper cutoff IS
    // q56's declared dup threshold, so the mining band and the dedup
    // band partition the candidate space) — exactly the negatives
    // an embedding model trains against (in-batch/BM25 negatives are
    // too easy; near-dups are false negatives that poison the loss —
    // the standard dense-retrieval mining recipe, e.g. ANCE). Shape:
    // q56's banded LSH candidates VERBATIM (shared bandedPairs +
    // EmbBucketCap — one candidate definition across the dedup and
    // mining tiers, the q82/q108 discipline), stored-norm cosine,
    // the declared sim band, then a per-anchor top-3 window over the
    // symmetrized pairs (mining is directional). Candidate cost is
    // the banding's O(Σ bucket²) under the cap, never corpus²; the
    // per-anchor window is bounded by candidate fan-in.
    "q333_hard_negatives" -> { (s, d) =>
      val W = org.apache.spark.sql.expressions.Window
      val base = Tables(s, d, "embeddings")
        .select(col("vec_id"), vec.as("v"), sigColumn.as("sig"),
                GraftFunctions.vectorNorm(vec).as("nv"))
      val prs = bandedPairs(base, maxBucket = EmbBucketCap)
        .join(base.select(col("vec_id").as("a"), col("v").as("va"),
                          col("nv").as("na")), Seq("a"))
        .join(base.select(col("vec_id").as("b"), col("v").as("vb"),
                          col("nv").as("nb")), Seq("b"))
        .select(col("a"), col("b"),
                round(GraftFunctions.dotProduct(col("va"), col("vb")) /
                      (col("na") * col("nb")), 4).as("sim"))
        .where(col("sim") >= 0.25 && col("sim") < 0.4)
      prs.select(col("a").as("anchor"), col("b").as("neg"), col("sim"))
        .unionAll(prs.select(col("b").as("anchor"), col("a").as("neg"),
                             col("sim")))
        .withColumn("rk", row_number().over(W.partitionBy("anchor")
          .orderBy(col("sim").desc, col("neg"))))
        .where(col("rk") <= 3)
        .select(col("anchor"), col("rk").cast("long").as("neg_rank"),
                col("neg"), col("sim"))
        .orderBy("anchor", "neg_rank")
    },

    // IVF-flat ANN (the other classic ANN scale path next to LSH):
    // coarse-quantize every vector to its nearest of C sampled
    // centroids (deterministic: vec_id < C — no trained state, so the
    // whole index is oracle-expressible), then answer a query by
    // probing only the nprobe nearest cells and exact-re-ranking their
    // members. At 100 TB the cell id becomes the partition key of the
    // stored layout: the centroid table packs into ONE broadcast row
    // (collect_list, the q43 mold) and assignment is a zero-shuffle
    // codegen'd map — the ArgminCentroid kernel — so the corpus never
    // shuffles to be assigned; a query then touches nprobe partitions
    // instead of the corpus. (Round ≤3 shape — crossJoin n×C then a
    // row_number window over vec_id — shuffled and sorted C× the
    // corpus to compute this embarrassingly-parallel argmin.)
    "q73_ann_ivf" -> { (s, d) =>
      val em = embBase(s, d)
      // norm rides along in the same zero-shuffle map pass as the cell
      // assignment, so the probe-time re-rank is one dot fold per member
      val assigned = ivfAssign(em)
      // probe selection is ONE query row × C centroids — negligible
      val qrow = em.where(col("vec_id") === 0)
      val qv = qrow.select(col("v").as("qv"),
                           GraftFunctions.vectorNorm(col("v")).as("qn"))
      val probeCells = qrow.crossJoin(broadcast(centroids(em)))
        .select(col("cid"), sqL2("v", "cv").as("dist"))
        .orderBy(col("dist"), col("cid")).limit(NProbe).select("cid")
      assigned.join(broadcast(probeCells), Seq("cid"))
        .where(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"),
                round(GraftFunctions.dotProduct(col("v"), col("qv")) /
                      (col("nv") * col("qn")), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },

    // Product-quantization ANN (added r8) — the vector-STORAGE half of
    // the ANN family: IVF (q73/q79) bounds compute, but a 100 TB
    // float64 corpus still dominates the index on disk; PQ stores each
    // 64-dim vector as 8 one-byte codes (64× smaller) and answers
    // queries from the codes alone. Deterministic codebooks via the
    // q73 sampling trick (subspace s's codewords = vectors
    // vec_id < 8, sliced to dims [s·8, s·8+8)) — zero trained state,
    // so the whole pipeline is oracle-expressible. Per subspace the
    // codebook packs into one broadcast row of PRE-SLICED codewords
    // and assignment is the same zero-shuffle codegen'd ArgminCentroid
    // map pass as IVF; the asymmetric distance (exact query subvector
    // vs assigned codeword, the Jégou et al. ADC form) is a looked-up
    // SquaredL2 kernel fold per subspace, summed in fixed order. The
    // PqRerank best ADC candidates (bounded: TakeOrdered, never a
    // sort) are re-ranked exactly; recall vs the exact q53 top-10 is
    // spec-asserted. At scale the stored layout is (vec_id, 8 codes):
    // the scan that answers a query reads codes, not vectors — the
    // full vectors are touched only for the PqRerank re-rank rows.
    "q100_ann_pq" -> { (s, d) =>
      val em = embBase(s, d)
      val q = em.where(col("vec_id") === 0).select(col("v").as("qv"))
      // codes + ADC in ONE codegen'd map pass over (corpus × packed ×
      // query); adc terms are summed left-to-right so the fold order
      // is reproducible in the oracle
      val cands = em.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(pqPacked(em))).crossJoin(broadcast(q))
        .select(col("vec_id"), col("v"), col("qv"), pqAdc.as("adc"))
        .orderBy(col("adc"), col("vec_id")).limit(PqRerank)
      cands.select(col("vec_id"),
          round(GraftFunctions.cosineSimilarity(col("v"), col("qv")), 4)
            .as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },

    // IVF-PQ composition (added r9 — the r8 verdict's item #6): the
    // production ANN index shape, with BOTH bounds at once — IVF
    // bounds COMPUTE (only nprobe cells are touched per query, q73)
    // and PQ bounds STORAGE (members are scored from 8 one-byte codes,
    // q100). The probed cells' members get their PQ codes and ADC
    // distance in the same single codegen'd map pass as q100 —
    // coding-on-scan; at 100 TB the codes are precomputed per cell in
    // the stored layout (q79's cid-bucketed index with 8 code bytes
    // replacing the vector, which is where the 64× storage cut pays) —
    // then the bounded TakeOrdered cut (never a sort) picks PqRerank
    // ADC candidates and only THOSE touch full vectors for the exact
    // re-rank. Recall vs exact q53 spec-asserted; everything
    // deterministic (sampled centroids AND codebooks), so the whole
    // two-level index is oracle-expressible.
    "q105_ann_ivfpq" -> { (s, d) =>
      val em = embBase(s, d)
      val assigned = ivfAssign(em)
      val qrow = em.where(col("vec_id") === 0)
      val q = qrow.select(col("v").as("qv"))
      val probeCells = qrow.crossJoin(broadcast(centroids(em)))
        .select(col("cid"), sqL2("v", "cv").as("dist"))
        .orderBy(col("dist"), col("cid")).limit(NProbe).select("cid")
      val cands = assigned.join(broadcast(probeCells), Seq("cid"))
        .where(col("vec_id") =!= 0)
        .crossJoin(broadcast(pqPacked(em))).crossJoin(broadcast(q))
        .select(col("vec_id"), col("v"), col("qv"), pqAdc.as("adc"))
        .orderBy(col("adc"), col("vec_id")).limit(PqRerank)
      cands.select(col("vec_id"),
          round(GraftFunctions.cosineSimilarity(col("v"), col("qv")), 4)
            .as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },

    // Batch-vs-INDEX ANN — the incremental operation a retrieval
    // pipeline actually runs: the IVF index (cell assignment + vector +
    // stored norm, exactly q73's zero-shuffle assignment pass) is built
    // ONCE and persisted as a cid-bucketed table; each query batch then
    // probes it without re-reading or re-assigning the corpus. At
    // 100 TB the index is the stored layout of the corpus itself — the
    // daily cost is O(batch) probe selection plus a broadcast join that
    // streams only the probed cells' buckets, with the index side never
    // shuffling (PlanShapeSpec asserts this). Complements q76, which is
    // the same batch-vs-index discipline for dedup.
    "q79_ann_index" -> { (s, d) =>
      val em = embBase(s, d)
      val idxT = graft.BucketedCache.ensure(s, d, "ivfidx",
          "cid BIGINT, vec_id BIGINT, v ARRAY<DOUBLE>, nv DOUBLE", "cid", 8)(
        ivfAssign(em).select("cid", "vec_id", "v", "nv"))
      val index = s.table(idxT)
      val qs = em.where(col("vec_id") < BatchQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
                GraftFunctions.vectorNorm(col("v")).as("qn"))
      // probe selection: B queries × C centroids — negligible
      val pw = Window.partitionBy("qid").orderBy(col("dist"), col("cid"))
      val probeCells = qs.crossJoin(broadcast(centroids(em)))
        .select(col("qid"), col("cid"), sqL2("qv", "cv").as("dist"))
        .select(col("qid"), col("cid"), row_number().over(pw).as("pr"))
        .where(col("pr") <= NProbe).select("qid", "cid")
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
      index.join(broadcast(probeCells), Seq("cid"))
        .where(col("vec_id") =!= col("qid"))
        .join(broadcast(qs), Seq("qid"))
        .select(col("qid"), col("vec_id"),
                round(GraftFunctions.dotProduct(col("v"), col("qv")) /
                      (col("nv") * col("qn")), 4).as("sim"))
        .select(col("qid"), col("vec_id"), col("sim"),
                row_number().over(w).cast("long").as("rk"))
        .where(col("rk") <= BatchK)
        .orderBy("qid", "rk")
    },

    // ANN recall attestation (added r12) — the report every ANN
    // deployment publishes next to its index: measured recall@10 of
    // the IVF probe against the exact brute force, per candidate
    // n_probe setting (1/2/4) — the knob-tuning table that decides how
    // many cells a production query pays for. Fully deterministic and
    // oracled: similarities round to 4 dp with a vec_id tie-break
    // (both rankings engine-identical), so recall is an exact integer
    // ratio, not a statistical estimate. Shape: the brute-force
    // baseline is |corpus| × B cosines (B = 8 sampled queries — the
    // production form audits a sample, never the full query log);
    // per-cell probe ranks are B × C rows; ONE scored candidate pass
    // serves all three n_probe settings (pr ≤ 4 candidates crossed
    // with the 3-row knob table, then per-(knob, query) bounded
    // top-10). One semi join against the pinned exact set counts hits.
    "q214_ann_recall" -> { (s, d) =>
      import s.implicits._
      val em = embBase(s, d)
      val assigned = ivfAssign(em)
      val qs = em.where(col("vec_id") < BatchQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
                GraftFunctions.vectorNorm(col("v")).as("qn"))
      val w = Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("vec_id"))
      val (exact, h) = pin(assigned.crossJoin(broadcast(qs))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
                round(GraftFunctions.dotProduct(col("v"), col("qv")) /
                      (col("nv") * col("qn")), 4).as("sim"))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 10)
        .select("qid", "vec_id"))
      h.count(); graft.PinScope.retain(h)
      val pw = Window.partitionBy("qid").orderBy(col("dist"), col("cid"))
      val cellRank = qs.crossJoin(broadcast(centroids(em)))
        .select(col("qid"), col("cid"), sqL2("qv", "cv").as("dist"))
        .select(col("qid"), col("cid"), row_number().over(pw).as("pr"))
        .where(col("pr") <= 4)
      val nps = Seq(1L, 2L, 4L).toDF("n_probe")
      val wq = Window.partitionBy("n_probe", "qid")
        .orderBy(col("sim").desc, col("vec_id"))
      val ivfTop = assigned.join(broadcast(cellRank), Seq("cid"))
        .where(col("vec_id") =!= col("qid"))
        .join(broadcast(qs), Seq("qid"))
        .crossJoin(broadcast(nps))
        .where(col("pr") <= col("n_probe"))
        .select(col("n_probe"), col("qid"), col("vec_id"),
                round(GraftFunctions.dotProduct(col("v"), col("qv")) /
                      (col("nv") * col("qn")), 4).as("sim"))
        .withColumn("rk", row_number().over(wq)).where(col("rk") <= 10)
      val hits = ivfTop.join(exact, Seq("qid", "vec_id"), "left_semi")
        .groupBy("n_probe").agg(count(lit(1)).as("hits"))
      nps.join(hits, Seq("n_probe"), "left")
        .select(col("n_probe"),
                lit(BatchQueries.toLong).as("queries"),
                coalesce(col("hits"), lit(0L)).as("hits"),
                round(coalesce(col("hits"), lit(0L)).cast("double") /
                      (BatchQueries * 10).toDouble, 6).as("recall"))
        .orderBy("n_probe")
    },

    // Persisted IVF-PQ coded index (added r9) — makes q105's storage
    // claim REAL: the index table a production ANN system stores is
    // (cell id, vec_id, 8 one-byte codes) bucketed by cell, built ONCE
    // (assignment + coding in the same zero-shuffle map pass) and
    // probed per query batch with the codes read FROM the table — no
    // re-assignment, no re-coding, no index-side shuffle. The full
    // vectors ride along here only because the final exact re-rank
    // needs them under one roof at test scale; at 100 TB they live in
    // a separate colocated bucket layout and only PqRerank rows per
    // query ever touch them. Query cost per batch: B×C probe
    // selection, a broadcast join streaming the probed cells' buckets,
    // ADC from stored codes via codeword lookup (one codegen'd
    // projection), per-query bounded cut, exact re-rank of the
    // survivors. Complements q79 (flat index) the way q105 complements
    // q73: PQ changes WHAT the scan reads (codes, 64× smaller), not
    // how it probes.
    "q107_ann_pq_index" -> { (s, d) =>
      val em = embBase(s, d)
      val idxT = pqIndexTable(s, d)
      val qs = em.where(col("vec_id") < BatchQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
                GraftFunctions.vectorNorm(col("v")).as("qn"))
      val pw = Window.partitionBy("qid").orderBy(col("dist"), col("cid"))
      val probeCells = qs.crossJoin(broadcast(centroids(em)))
        .select(col("qid"), col("cid"), sqL2("qv", "cv").as("dist"))
        .select(col("qid"), col("cid"), row_number().over(pw).as("pr"))
        .where(col("pr") <= NProbe).select("qid", "cid")
      val aw = Window.partitionBy("qid").orderBy(col("adc"), col("vec_id"))
      val rw = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
      s.table(idxT).join(broadcast(probeCells), Seq("cid"))
        .where(col("vec_id") =!= col("qid"))
        .join(broadcast(qs), Seq("qid"))
        .crossJoin(broadcast(pqPacked(em)))
        .withColumn("adc", pqAdcStored)
        .withColumn("ar", row_number().over(aw))
        .where(col("ar") <= PqRerank)
        .select(col("qid"), col("vec_id"),
                round(GraftFunctions.dotProduct(col("v"), col("qv")) /
                      (col("nv") * col("qn")), 4).as("sim"))
        .select(col("qid"), col("vec_id"), col("sim"),
                row_number().over(rw).cast("long").as("rk"))
        .where(col("rk") <= BatchK)
        .orderBy("qid", "rk")
    },

    // SEMANTIC decontamination (added r10 — the r9 verdict's #3): the
    // contamination tier the lexical q87/q96 n-gram pair cannot see —
    // an eval item PARAPHRASED into the training split shares no
    // verbatim grams but sits next to its source in embedding space.
    // Composition of existing artifacts, nothing new trained: the
    // eval split's embeddings (doc_id ≡ vec_id per q45; split
    // membership is q67's md5 rule, so eval/train is deterministic
    // and engine-portable) probe the PERSISTED IVF-PQ coded index
    // (q107's table, one build, two consumers) — per eval doc: NProbe
    // cells by exact centroid distance, ADC over the probed cells'
    // TRAIN members from their stored codes (no re-coding, no index
    // shuffle — q107's plan assertions rerun verbatim on this query),
    // bounded PqRerank cut, exact cosine re-rank, and every train doc
    // within the threshold is flagged with its eval source. At 100 TB
    // this is the per-release semantic sweep next to q99/q103's
    // lexical ones: cost O(eval batch × probed cells), never
    // eval×corpus — the same batch-vs-index discipline, in embedding
    // space.
    "q120_decontaminate_semantic" -> { (s, d) =>
      val em = embBase(s, d)
      val qs = em.where(TextExtOps.splitOf(col("vec_id")) === "eval")
        .select(col("vec_id").as("eval_id"), col("v").as("qv"),
                GraftFunctions.vectorNorm(col("v")).as("qn"))
      semProbe(s, pqIndexTable(s, d), centroids(em), qs, pqPacked(em))
    },

    // One exact k-means (Lloyd) refinement step (added r10) — the
    // TRAINING step the IVF/PQ family's codebooks have so far sampled
    // away (vec_id < C is deterministic but untrained): assign every
    // vector to its nearest current centroid (the same zero-shuffle
    // codegen'd ArgminCentroid pass as q73/q79/q107 — the corpus never
    // shuffles to be assigned), then recompute each cell's centroid as
    // the per-dimension mean. Made EXACT cross-engine by the q118
    // fixed-point discipline: coordinates scale to 1e-6-resolution
    // BIGINTs (round(x·1e6) — both engines' IEEE double product and
    // half-away-from-zero round agree bit-for-bit), sums are integer
    // and partition-order-free, and the mean divides once as a double,
    // rounded once. Production runs this step k× to train real
    // codebooks; per step the cost is one map pass + one (cell, dim)
    // aggregation with map-side partials — no pairwise anything. The
    // Lloyd descent property (refined centroids do not increase total
    // within-cell squared distance) is spec-asserted.
    "q125_kmeans_step" -> { (s, d) =>
      val em = embBase(s, d)
      ivfAssign(em)
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .select(col("cid"), col("dim").cast("long").as("dim"),
                expr("CAST(round(x * 1000000) AS BIGINT)").as("xi"))
        .groupBy("cid", "dim")
        .agg(count(lit(1)).as("n"), sum(col("xi")).as("sx"))
        .select(col("cid"), col("dim"), col("n"),
                round(col("sx").cast("double") / col("n") / 1000000.0, 6)
                  .as("c_new"))
        .orderBy("cid", "dim")
    },

    // k-means convergence LOOP (added r12) — q125 is one Lloyd step;
    // this is the iterative algorithm as a declared query: 3 full
    // assign→update rounds with a per-iteration convergence report
    // (inertia, assignments moved, live clusters) — the training curve
    // an embedding-clustering job actually monitors. Made exactly
    // engine-portable by running Lloyd ON THE INTEGER LATTICE: vectors
    // quantize once to xi = round(v·1e6) (BIGINT per dim), distances
    // are integer squared-L2 (sums of integers — partition-order-free
    // AND bit-identical across engines, where float distances are
    // neither), argmin ties break (dist, cid); the centroid update is
    // the nearest-lattice mean — (2|Σx|+n) DIV 2n re-signed, integer
    // half-away-from-zero (the double round(Σx/n, 6dp) path diverged
    // between engines in iteration 3's last bit). Assignment is the
    // q73 mold on the lattice: centroids pack into ONE broadcast row
    // and a codegen'd HOF computes per-vector argmin — the corpus
    // NEVER shuffles to be assigned; only the (cid, dim) update
    // aggregate shuffles, 3×. Clusters that lose all members drop out
    // (declared; the report's n_clusters row tracks it). Inertia is
    // exact lattice units (BIGINT; at web scale the sum widens to
    // DECIMAL the q142 way).
    "q222_kmeans_loop" -> { (s, d) =>
      val as0 = lloydAssignments(s, d)
      var report: DataFrame = null
      for (t <- 1 to 3) {
        val a = as0(t - 1)
        val moved =
          if (t == 1) a.agg(count(lit(1)).as("moved"))
          else a.select(col("vec_id"), col("cid"))
            .join(as0(t - 2).select(col("vec_id"), col("cid").as("pc")),
                  Seq("vec_id"))
            .agg(sum(when(col("cid") =!= col("pc"), 1L).otherwise(0L))
                   .as("moved"))
        val row = a.agg(sum("dist").as("inertia"),
                        countDistinct("cid").as("n_clusters"))
          .crossJoin(moved)
          .select(lit(t.toLong).as("iter"), col("inertia"),
                  col("moved"), col("n_clusters"))
        report = if (report == null) row else report.unionAll(row)
      }
      report.orderBy("iter")
    },

    // SemDeDup (added r13) — semantic deduplication by
    // cluster-then-prune (Abbas et al. 2023, the embedding-space
    // dedup the LAION/web-scale pipelines run where MinHash can't
    // see paraphrase): k-means cluster the embeddings, then compare
    // pairs ONLY within a cluster and drop all but one member of
    // each near-dup neighborhood. Composes the suite's two halves
    // structurally: the clustering IS [[lloydAssignments]] (q222's
    // integer-lattice Lloyd, third-round assignment — identical
    // text in the oracle), and the near-dup line IS q56's declared
    // 0.4 cosine, restated EXACTLY on the lattice: dup iff dot > 0
    // and 10⁴·dot² ≥ 1600·‖a‖²·‖b‖² (all exact decimals — no float
    // round anywhere, so the predicate is hash-stable; the spec
    // bridges it to float cosine within 5e-4). Keep rule: the
    // MIN-id member of each pairwise neighborhood survives (the
    // paper keeps one per ε-neighborhood; min-id is the declared
    // deterministic choice, q83's keep-best discipline). Scale: the
    // within-cluster self-join is the paper's own cost model —
    // production runs k ∝ N so cluster sizes stay O(1) and pair
    // volume stays O(N); here k is the frozen Cents=16 at test SF.
    // Payload arrays join by cid only; per-vec norms fold once in
    // the base pass. Report: per cluster, members / dup pairs /
    // removed / keep ratio.
    "q311_semdedup" -> { (s, d) =>
      // the lattice dot runs as the codegen'd dotProductLong kernel
      // (r14) - bit-identical to the oracle's aggregate(zip_with(...))
      // fold, removing the interpreted HOF from the pair join
      // [[SemDedupClusterCap]]: a no-op at every test SF (max cluster
      // ~40 at sf0.1), it bounds the quadratic within-cluster pair
      // volume when the corpus outgrows the FIXED k of the declared
      // query (measured 3.9 s → 39 s at 10× — exactly the cluster²
      // slope the paper's k ∝ N prescription exists to prevent; the
      // cap keeps the fixed-k form finite, min-id members kept).
      // The cap applies to the PAIR-GENERATION sides ONLY (r13
      // ADVICE): the membership census (n_vecs, the keep_ratio
      // denominator) always counts the UNCAPPED assignment, so a
      // biting cap bounds pair volume without distorting the
      // reported cluster sizes.
      val wCap = org.apache.spark.sql.expressions.Window
        .partitionBy("cid").orderBy("vec_id")
      val base = lloydAssignments(s, d).last
        .select(col("vec_id"), col("cid"), col("xi"),
                GraftFunctions.dotProductLong(col("xi"), col("xi"))
                  .as("nv"))
      val capped = base
        .withColumn("mrk", row_number().over(wCap))
        .where(col("mrk") <= SemDedupClusterCap).drop("mrk")
      val l = capped.select(col("cid"), col("vec_id").as("a"),
                            col("xi").as("xa"), col("nv").as("na"))
      val r = capped.select(col("cid"), col("vec_id").as("b"),
                            col("xi").as("xb"), col("nv").as("nb"))
      val pairs = l.join(r, Seq("cid")).where(col("a") < col("b"))
        .withColumn("dot",
          GraftFunctions.dotProductLong(col("xa"), col("xb")))
        .where(col("dot") > 0 &&
               col("dot").cast("decimal(38,0)") * col("dot") * 10000 >=
                 col("na").cast("decimal(38,0)") * col("nb") * 1600)
        .select(col("cid"), col("a"), col("b"))
      val (dp, dh) = pin(pairs); dh.count(); graft.PinScope.retain(dh)
      val removed = dp.select(col("cid"), col("b")).distinct()
      base.groupBy("cid").agg(count(lit(1)).as("n_vecs"))
        .join(dp.groupBy("cid").agg(count(lit(1)).as("n_dup_pairs")),
              Seq("cid"), "left")
        .join(removed.groupBy("cid").agg(count(lit(1)).as("n_removed")),
              Seq("cid"), "left")
        .na.fill(0L, Seq("n_dup_pairs", "n_removed"))
        .withColumn("keep_ratio",
          round((col("n_vecs") - col("n_removed")).cast("double") /
                col("n_vecs").cast("double"), 6))
        .orderBy("cid")
    },

    // Incremental SemDeDup — batch vs PERSISTED centroid+member
    // artifact (added r14, the r13 verdict's #1: q311 re-runs all
    // three Lloyd assignment rounds over the full corpus per
    // invocation — 377.8 s at 100×, the suite's steepest line — while
    // every other dedup family already had an incremental sibling).
    // The q76/q103/q334 discipline applied to the embedding-cluster
    // tier: the standing corpus (even vec_ids) fits ONCE — 3-round
    // integer-lattice Lloyd ([[lloydRounds]], seeds = the 16 lowest
    // even ids) — and persists BOTH halves of the model as one
    // cid-bucketed artifact ([[semDedupIndexTable]]: member rows =
    // final assignment + pinned norms, centroid rows = the c3 table
    // that PRODUCED that assignment, so a later batch assigns against
    // exactly the frozen model). The day's batch (odd ids) quantizes,
    // assigns in ONE zero-shuffle broadcast-argmin pass (the same
    // [[lloydAssign]] text the trainer ran — never re-fitting, never
    // rescanning the even corpus: plan-asserted), and near-dup pairs
    // form ONLY against co-clustered members — batch×members plus
    // batch×batch, q311's exact-lattice cosine line verbatim
    // (10⁴·dot² ≥ 1600·na·nb, all DECIMAL). [[SemDedupClusterCap]]
    // bounds both pair sides (min-id kept, census uncapped — the r13
    // ADVICE rule). Report per receiving cluster: standing members,
    // batch arrivals, dup pairs, batch removals (a new doc is removed
    // if it matches ANY standing member or a lower-id batch peer),
    // batch keep ratio. At 100 TB the daily cost is O(batch·k) assign
    // FLOPs + co-cluster pair volume — the 3-round corpus re-fit is
    // gone, which is the whole point. Oracle: the full even-half
    // Lloyd + odd assignment restated inline — the artifact must be
    // semantically invisible.
    "q339_semdedup_incremental" -> { (s, d) =>
      val (batch, old, dp) = semDedupIncParts(s, d)
      val removed = dp.select(col("cid"), col("b")).distinct()
      batch.groupBy("cid").agg(count(lit(1)).as("n_new"))
        .join(old.groupBy("cid").agg(count(lit(1)).as("n_old")),
              Seq("cid"), "left")
        .join(dp.groupBy("cid").agg(count(lit(1)).as("n_dup_pairs")),
              Seq("cid"), "left")
        .join(removed.groupBy("cid").agg(count(lit(1))
                                           .as("n_new_removed")),
              Seq("cid"), "left")
        .na.fill(0L, Seq("n_old", "n_dup_pairs", "n_new_removed"))
        .select(col("cid"), col("n_old"), col("n_new"),
                col("n_dup_pairs"), col("n_new_removed"),
                round((col("n_new") - col("n_new_removed")).cast("double") /
                      col("n_new").cast("double"), 6).as("keep_ratio"))
        .orderBy("cid")
    },

    // Graph-based ANN beam search (added r13) — the SEARCH pattern of
    // the modern ANN defaults (HNSW/NSG/Vamana: Malkov & Yashunin
    // 2018): instead of probing buckets (q73's IVF) the query WALKS a
    // precomputed k-NN graph — start at an entry point, repeatedly
    // expand the beam through neighbors, keep the best-scoring beam.
    // Here: exact 8-NN graph over a 4096-node md5-ranked BACKBONE
    // (at 100 TB the graph is the persisted offline artifact an
    // NN-descent/IVF job builds — q79's index discipline; the exact
    // n² build stands in ONLY under a declared volume cap, because
    // measured uncapped it costs 109 s at 10× volume and the build is
    // scaffolding, not the operator under test — the SEARCH is),
    // entry = vec_id 1, beam width 4, three hops of [[annHop]]'s
    // shared text (per-node
    // query sims precomputed ONCE, rounded 4, pinned — each hop is a
    // graph join + top-4, never a corpus scan; beam ∪ neighbors keeps
    // the walk monotone). Entry = the backbone's md5-first node (rank
    // 1 — always present at any corpus, unlike a fixed id). Report:
    // the final beam ranked, flagged against the exact top-4 WITHIN
    // the indexed set (the recall attestation, q214's pattern — you
    // can only retrieve what's indexed). Both engines run the
    // identical chain — fully oracled.
    "q329_ann_beam" -> { (s, d) =>
      val W = org.apache.spark.sql.expressions.Window
      val em = embBase(s, d)
      val q0 = em.where(col("vec_id") === 0).select(col("v").as("qv"))
      val (bb, bbh) = pin(beamBackbone(em))
      bbh.count(); graft.PinScope.retain(bbh)
      val (sims, simh) = pin(bb
        .crossJoin(broadcast(q0))
        .select(col("vec_id").as("id"), col("mr"),
                round(org.apache.spark.sql.graft.GraftFunctions
                  .cosineSimilarity(col("v"), col("qv")), 4).as("sim")))
      simh.count(); graft.PinScope.retain(simh)
      sims.createOrReplaceTempView("graft_beam_sims")
      // r19: the exact 8-NN build runs through the packed-broadcast
      // [[CosineTopK]] generator (q43's protocol, directional mode —
      // every non-self candidate, top-8 by (round-4 cosine desc, dst
      // asc), the identical selection the rank window made): the
      // BroadcastNestedLoopJoin materialized a two-vector row per n²
      // candidate pair and shuffled ~n²/k of them into the rank sort;
      // the generator block-scans the one broadcast buffer per probe
      // with a bounded heap and emits only the k kept edges — no pair
      // materialization, no pair shuffle, same dot/(nₐ·n_b) stored-norm
      // arithmetic (bit-identical to the fused kernel at equal dims).
      val packed = bb
        .agg(collect_list(struct(col("vec_id"), col("v"))).as("coll"))
      val (graph, gh) = pin(bb
        .select(col("vec_id").as("src"), col("v").as("vsrc"))
        .crossJoin(broadcast(packed))
        .select(col("src"),
                org.apache.spark.sql.graft.GraftFunctions
                  .cosineTopKAll(col("vsrc"), col("src"), col("coll"), 8)
                  .as(Seq("dst", "es")))
        .select("src", "dst"))
      gh.count(); graft.PinScope.retain(gh)
      graph.createOrReplaceTempView("graft_beam_graph")
      s.sql("SELECT id, sim FROM graft_beam_sims WHERE mr = 1")
        .createOrReplaceTempView("graft_beam_b0")
      (1 to 3).foreach { k =>
        val hop = s.sql(
          "WITH " + annHop(k, "graft_beam_graph", s"graft_beam_b${k - 1}",
                           "graft_beam_sims") + s" SELECT * FROM bm$k")
        // pinBounded: each hop front is the beam — ≤ 4 rows by the
        // hop's own top-k cut; the final global rank rides b3
        val (hp, hh) = org.apache.spark.sql.graft.InternalPin
          .pinBounded(hop)
        hh.count(); graft.PinScope.retain(hh)
        hp.createOrReplaceTempView(s"graft_beam_b$k")
      }
      s.sql("""
        WITH ex AS (SELECT id FROM graft_beam_sims
                    ORDER BY sim DESC, id LIMIT 4)
        SELECT CAST(row_number() OVER (ORDER BY b.sim DESC, b.id)
                    AS BIGINT) AS rank,
          b.id AS vec_id, b.sim,
          CAST(b.id IN (SELECT id FROM ex) AS INT) AS in_exact_top4
        FROM graft_beam_b3 b ORDER BY rank""")
    },

    // Beam search over the PERSISTED IVF-built k-NN graph (added r14,
    // the r13 verdict's #2 second half): q329 walks a capped
    // 4096-node scaffold whose exact n² build is declared
    // scaffolding; this is the production pair — the graph is the
    // offline artifact [[beamGraphTable]] (full corpus, IVF-bucketed
    // linear build, symmetric member↔hub edges), and the SEARCH is
    // the identical [[annHop]] staged walk: entry = the graph's
    // md5-first node (a bounded TakeOrdered, never a rank window),
    // beam 4, three hops, final beam ranked and flagged against the
    // exact top-4 within the graph's node set (q214's recall
    // attestation — the flag is WHY the per-query sims table spans
    // the node set; a production search that skips the attestation
    // computes sims per hop via index lookups instead). Fully
    // oracled: both engines restate the build and run the identical
    // hop text.
    "q342_ann_graph_beam" -> { (s, d) =>
      val graph = s.table(beamGraphTable(s, d))
      val em = embBase(s, d)
      val q0 = em.where(col("vec_id") === 0).select(col("v").as("qv"))
      val ns = graph.select(col("src").as("id"))
        .unionAll(graph.select(col("dst").as("id"))).distinct()
      val (sims, sh) = pin(ns
        .join(em, col("id") === col("vec_id"))
        .crossJoin(broadcast(q0))
        .select(col("id"),
                round(GraftFunctions.cosineSimilarity(col("v"), col("qv")),
                      4).as("sim")))
      sh.count(); graft.PinScope.retain(sh)
      sims.createOrReplaceTempView("graft_bg_sims")
      graph.createOrReplaceTempView("graft_bg_graph")
      // pinBounded: the entry (1 row) and each hop front (≤ 4 rows,
      // the hop's own top-k cut) — the final global rank rides b3
      val (b0, bh) = org.apache.spark.sql.graft.InternalPin.pinBounded(
        sims.orderBy(md5(col("id").cast("string")), col("id")).limit(1))
      bh.count(); graft.PinScope.retain(bh)
      b0.createOrReplaceTempView("graft_bg_b0")
      (1 to 3).foreach { k =>
        val hop = s.sql(
          "WITH " + annHop(k, "graft_bg_graph", s"graft_bg_b${k - 1}",
                           "graft_bg_sims") + s" SELECT * FROM bm$k")
        val (hp, hh) = org.apache.spark.sql.graft.InternalPin
          .pinBounded(hop)
        hh.count(); graft.PinScope.retain(hh)
        hp.createOrReplaceTempView(s"graft_bg_b$k")
      }
      s.sql("""
        WITH ex AS (SELECT id FROM graft_bg_sims
                    ORDER BY sim DESC, id LIMIT 4)
        SELECT CAST(row_number() OVER (ORDER BY b.sim DESC, b.id)
                    AS BIGINT) AS rank,
          b.id AS vec_id, b.sim,
          CAST(b.id IN (SELECT id FROM ex) AS INT) AS in_exact_top4
        FROM graft_bg_b3 b ORDER BY rank""")
    },

    // NN-descent refinement round (added r14) — the graph-IMPROVEMENT
    // step between q342's IVF build and a production-quality ANN
    // graph (Dong, Moses & Li 2011, the NN-descent everyone's offline
    // graph builds run): a neighbor of a neighbor is likely a
    // neighbor, so one round rescores each node's 2-hop candidate set
    // (current edges ∪ neighbors-of-neighbors, ≤ 8+64 per node) and
    // keeps the best 8 — per-edge similarity can only improve (top-8
    // over a superset; spec-asserted), and the round costs 64·n exact
    // cosines, linear, vs the n² rebuild it replaces. Emits the
    // refined edge list; q344 attests how much the round actually
    // bought. Fully oracled against the build + refinement restated.
    "q343_nn_descent" -> { (s, d) =>
      nnDescentEdges(s, d).orderBy("src", "nn_rank")
    },

    // Graph-quality recall attestation (added r14; third tier r15;
    // r16 reads PROMOTED VERSIONS) — q214/q338's knob-tuning
    // discipline applied to the GRAPH artifact: for 64 deterministic
    // anchor nodes (the lowest vec_ids), how many of each tier's
    // out-edges land in the anchor's EXACT top-8 (one 64·n exact pass
    // — the attestation's own price, linear)? Three rows — the IVF
    // build, the NN-descent round, and the batch insert — with
    // integer fixed-point recall; the measured table that justifies
    // (or caps) further descent rounds and prices insert-time linking
    // vs a full rebuild. Since r16 (the r15 verdict's #2) the tiers
    // are READ from [[graphVersionRoot]]'s committed versions instead
    // of re-running descent + insert inline — the machinery runs once
    // in the promotion job and this attestation pays only its own
    // exact pass plus three parquet scans (the r15 49.8 s @100× line
    // was the inline insert re-run, not the attestation). All tiers
    // and the truth share one node set and one exact pass.
    "q344_graph_recall" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val root = graphVersionRoot(s, d)
      val em = embBase(s, d).where(col("vec_id") =!= 0)
      val (anchors, ah) = pin(em.orderBy("vec_id").limit(64)
        .select(col("vec_id").as("qid"), col("v").as("qv")))
      ah.count(); graft.PinScope.retain(ah)
      val (exact, eh) = pin(em.crossJoin(broadcast(anchors))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("dst"),
                round(GraftFunctions.cosineSimilarity(col("v"), col("qv")),
                      4).as("sim"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("sim").desc, col("dst"))))
        .where(col("rk") <= 8)
        .select(col("qid").as("src"), col("dst")))
      eh.count(); graft.PinScope.retain(eh)
      def tier(name: String, g: DataFrame): DataFrame = {
        val ae = g.join(broadcast(anchors.select(col("qid").as("src"))),
                        Seq("src"))
        val hits = ae.join(exact, Seq("src", "dst"), "left_semi")
        ae.agg(count(lit(1)).as("anchor_edges"))
          .crossJoin(exact.agg(count(lit(1)).as("exact_pairs")))
          .crossJoin(hits.agg(count(lit(1)).as("hits")))
          .select(lit(name).as("tier"), col("anchor_edges"),
                  col("exact_pairs"), col("hits"),
                  recallPpm.as("recall_ppm"))
      }
      GraphVersionTiers.toSeq.sortBy(_._1)
        .map { case (v, name) =>
          tier(name, SnapshotLog.read(s, root, v)) }
        .reduce(_ unionAll _)
        .orderBy("tier")
    },

    // Graph artifact PROMOTION report (added r16, the r15 verdict's
    // #2) — the query a serving team runs after the nightly graph
    // job: which graph versions are COMMITTED, and what does each
    // hold? Running it ensures the promotion itself: v1 = the IVF
    // build, v2 = the NN-descent round, v3 = the batch-insert merge,
    // each committed under SnapshotLog's files-then-manifest protocol
    // (a crash between data write and manifest serves the old
    // version — ArtifactCommitSpec) into a corpus-fingerprint-keyed
    // log (a mutated corpus can never serve a stale graph). The
    // build is write-once per (corpus, fingerprint); re-running the
    // query reads the committed manifests. Report: per version its
    // tier name, edge count, and distinct source nodes — all
    // deterministic, so the oracle restates the three edge sets from
    // the shared build/descent/insert CTE text and must see the
    // promotion as invisible. Version numbers are data: a consumer
    // pins `version = 3` the way q136 pins a time-travel snapshot.
    "q357_graph_promote" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val root = graphVersionRoot(s, d)
      SnapshotLog.versions(root).map { v =>
        SnapshotLog.read(s, root, v)
          .agg(count(lit(1)).as("edges"),
               countDistinct(col("src")).as("srcs"))
          .select(lit(v.toLong).as("version"),
                  // tolerant lookup (r16 ADVICE): a log holding a
                  // version this builder doesn't know names it
                  // explicitly instead of crashing the report
                  lit(GraphVersionTiers.getOrElse(v, s"unknown_v$v"))
                    .as("tier"),
                  col("edges"), col("srcs"))
      }.reduce(_ unionAll _).orderBy("version")
    },

    // ANN graph batch-insert maintenance (added r15, the r14
    // verdict's #7) — completes the per-release artifact discipline
    // (q339 SemDeDup / q340 Hamming / q341 minimizer) at the GRAPH
    // tier: the even half is the standing corpus whose k-NN graph,
    // hubs, and node vectors persist once ([[beamGraphIncTable]]);
    // the odd batch INSERTS in the HNSW search-then-link shape —
    // assigns to its 2 nearest frozen cells, SEARCHES the cells'
    // hubs (scored once), LINKS through only the GraphInsertEf best
    // hubs' standing out-neighbors (the localized descent step) —
    // while touched standing nodes merge the reversed batch edges
    // into their STORED top-8 by the persisted scores, so no
    // standing pair is ever rescored and the even corpus is never
    // rescanned (plan-asserted: the only embeddings FileScan is the
    // odd batch). Cost O(batch · (2·cap + ef·8)) cosines —
    // proportional to the batch, not the corpus. Emits the merged
    // edge list; q344's third recall row attests what insert-time
    // linking costs vs the full rebuild.
    "q350_graph_insert" -> { (s, d) =>
      graphInsertEdges(s, d).orderBy("src", "nn_rank")
    },

    // NN-descent convergence loop (added r15, the r14 verdict's #9) —
    // q343 runs exactly ONE refinement round and r14's "one round is
    // enough" was an assumption; this runs Dong, Moses & Li 2011's
    // iterate-until-quiet loop: each round rescores every node's
    // 2-hop candidate set and keeps the top-8, the loop stops when
    // edge turnover falls below [[DescentStopPpm]] (10%) or at
    // [[DescentRoundsCap]] rounds — the declared bound that keeps the
    // curve linear regardless of convergence. Per executed round the
    // report row carries the exact turnover (changed/total edges, ppm)
    // and the q344-style anchor recall (64 lowest ids vs their exact
    // top-8, one shared exact pass) — the MEASURED curve that
    // justifies (or refutes) stopping after one round. Driver loop is
    // over ROUNDS (≤ 3 scalar reads per round); every per-round edge
    // set is a pinned distributed table. Fully oracled: DuckDB unrolls
    // the same three rounds and applies the same stop rule.
    "q351_descent_converge" -> { (s, d) =>
      val em = embBase(s, d)
      val (anchors, ah) = pin(em.where(col("vec_id") =!= 0)
        .orderBy("vec_id").limit(64)
        .select(col("vec_id").as("qid"), col("v").as("qv")))
      ah.count(); graft.PinScope.retain(ah)
      val (exact, eh) = pin(em.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(anchors))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("dst"),
                round(GraftFunctions.cosineSimilarity(col("v"), col("qv")),
                      4).as("sim"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("sim").desc, col("dst"))))
        .where(col("rk") <= 8)
        .select(col("qid").as("src"), col("dst")))
      eh.count(); graft.PinScope.retain(eh)
      val exactPairs = exact.count()
      var g = s.table(beamGraphTable(s, d)).select("src", "dst")
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Long)]
      var stop = false
      for (r <- 1 to DescentRoundsCap if !stop) {
        val (nxt, nh) = pin(descentRound(g, em).select("src", "dst"))
        nh.count(); graft.PinScope.retain(nh)
        val edges = nxt.count()
        val changed = nxt.join(g, Seq("src", "dst"), "left_anti").count()
        val ppm = if (edges == 0) 0L else 1000000L * changed / edges
        val hits = nxt
          .join(broadcast(anchors.select(col("qid").as("src"))),
                Seq("src"))
          .join(exact, Seq("src", "dst"), "left_semi").count()
        val recall =
          if (exactPairs == 0) 0L else 1000000L * hits / exactPairs
        rows += ((r.toLong, edges, changed, ppm, recall))
        stop = ppm < DescentStopPpm
        g = nxt
      }
      import s.implicits._
      rows.toSeq
        .toDF("round", "edges", "changed", "update_ppm", "recall_ppm")
        .orderBy("round")
    },

    // √n-cell SemDeDup gate geometry (added r15, §11.1 candidate #1
    // promoted the same round its lever was measured) — the declared
    // 16-cell model is the oracle-deterministic TEST geometry; the
    // production rule is cells ∝ √corpus (q120's note), and SweepR15
    // measured it at 100×: 17.5× less rectangle mass, 12.6× less
    // wall-clock, and 2.7× MORE dups found (at 16 cells every
    // ~6.2k-member cluster is truncated by the 4096-member cap —
    // dropped members are invisible to the gate; at √n cells no
    // cluster hits it). This query is that geometry CERTIFIED: k =
    // ⌈√|even|⌉ computed in-frame (a broadcast 1-row scalar, no
    // collect), cells = the 2k lowest even ids (dense-id sampling,
    // q73's discipline — both engines restate the cut), both halves
    // assign via the codegen'd integer-lattice argmin, members cap
    // at SemDedupClusterCap per cell (a no-op at this k, which is
    // the point), and the per-cell census reports standing/arrivals/
    // dup pairs/dropped arrivals — q339's report at the production
    // cell count. Output is k ≈ √n rows.
    "q355_semdedup_cells" -> { (s, d) =>
      semDedupCellCensus(s, d,
        ceil(sqrt(count(lit(1)))).cast("long"),
        SemDedupClusterCap, capFlag = false)
    },

    // Cap-aware HYBRID cell sizing certified (added r16, §12.1
    // candidate #3 promoted the same round it was recorded) — the r16
    // cap census measured √n-cell occupancy ≈ √n, so the 4096 member
    // cap BINDS once the corpus passes cap² ≈ 16.7M vectors; the
    // production rule past that point is cells = max(⌈√n⌉, ⌈n/cap⌉),
    // which bounds MEAN occupancy at the cap by construction. No test
    // SF reaches cap², so this certifies the hybrid rule at a
    // SYNTHETIC cap of 8 (declared — the certification geometry, the
    // way q355 declared √n) over a DECLARED 4096-id certification
    // slice: the rule's claims (mean bound, skew tail) are geometric,
    // not volumetric, and the first cut that ran the synthetic cap on
    // the full corpus MEASURED the reason for the slice — at 100× the
    // n/8-cell brute-force argmin cost 49.6 s of pure assignment (at
    // 12,500 sampled cells the linear cell scan IS the cost; a
    // production assigner at that k is a two-level coarse quantizer,
    // out of scope here). On the slice: k = max(⌈√|even|⌉, ⌈|even|/8⌉)
    // in-frame, members capped at 8 per cell, and the census gains a
    // `capped` flag so truncation is VISIBLE data, not an invisible
    // recall loss (mean occupancy ≤ cap is guaranteed; the flag
    // counts the skew tail the mean bound cannot see). Shares q355's
    // census body verbatim ([[semDedupCellCensus]]).
    "q367_semdedup_capaware" -> { (s, d) =>
      semDedupCellCensus(s, d,
        greatest(ceil(sqrt(count(lit(1)))).cast("long"),
                 expr("(count(1) + 7) DIV 8").cast("long")),
        8L, capFlag = true, idCap = 4096L)
    },

    // TWO-LEVEL coarse-quantizer assignment at the hybrid geometry
    // (added r17, the r16 verdict's #1 — the one measured scale cliff
    // left open): q367 certified the cap-aware cell RULE (cells =
    // max(⌈√n⌉, ⌈n/cap⌉)) but had to certify it on a declared 4096-id
    // slice because the flat assigner at that k is linear in the cell
    // count — its full-corpus first cut MEASURED 49.6 s @100× of pure
    // argmin at 12,500 cells, and at 10⁹ vectors (where the census
    // says the 4096 cap BINDS, k = n/cap ≈ 244k cells) the flat scan
    // is simply not runnable. This query IS the runnable path: the
    // same census, FULL corpus (no slice), synthetic cap 8 (the q367
    // declaration — no test SF reaches the real cap² ≈ 16.7M), with
    // assignment running coarse-then-fine ([[hybridCellAssign]]
    // twoLevel): ⌈√k⌉ coarse cells, each fine cell replicated into
    // its [[TwoLevelRep]] nearest coarse buckets at build time, and
    // every vector paying one √k-way coarse argmin plus one argmin
    // over its bucket's ~R·k/kc fine cells — ≈ (1+R)·√k integer
    // distances instead of k (distance-count model: ~1,120 vs 12,500
    // per vector at the 100× sweep volume, ratio ~49× at the
    // 10⁹-vector census point where the cap binds). MEASURED @100×
    // (SweepR17, same box): the full-corpus census line 49.6 s →
    // 7.66 s (the pin below contributes too — the unpinned census
    // re-ran its assignment 4×); the assignment pass alone 9.1 s
    // flat vs 3.4 s two-level with today's kernels. The census body,
    // member cap, dup predicate and `capped` visibility are q367's
    // verbatim; only the assigner differs, and q370 attests what the
    // approximation costs against the flat truth.
    "q369_twolevel_assign" -> { (s, d) =>
      semDedupCellCensus(s, d,
        greatest(ceil(sqrt(count(lit(1)))).cast("long"),
                 expr("(count(1) + 7) DIV 8").cast("long")),
        8L, capFlag = true, twoLevel = true)
    },

    // Two-level vs flat assigner CERTIFICATION (added r17, with q369)
    // — the attestation that makes q369's approximation a measured
    // trade, not a hope: on q367's declared 4096-id certification
    // slice (the one place the flat assigner stays affordable at ANY
    // corpus volume), run BOTH assigners at the identical hybrid
    // geometry and synthetic cap 8, and report ONE row: vectors
    // assigned, how many land in the same cell (agree_ppm — the
    // direct quantizer-fidelity number), each assigner's flagged
    // arrival count through the identical gate, their overlap, and
    // recall_ppm = flagged-by-both / flagged-by-flat (the number that
    // says what fraction of the exact gate's catches the production
    // assigner keeps — the q344/q352 recall discipline applied to the
    // assigner). Integer ppm, zero-denominator guard, hash-exact.
    "q370_twolevel_recall" -> { (s, d) =>
      // since r18 the measurement PERSISTS ([[routerCertTable]], once
      // per corpus fingerprint) and this query reads the artifact —
      // q352/q353's discipline applied to the router certification;
      // q380 consumes the same rows as the serving-config input
      s.table(routerCertTable(s, d)).where(col("band") === 0)
        .select(col("vectors"), col("agree"),
                expr("CASE WHEN vectors = 0 THEN 0 ELSE " +
                     "(1000000 * agree) DIV vectors END").as("agree_ppm"),
                col("flat_flagged"), col("two_flagged"),
                col("kept").as("both_flagged"),
                expr("CASE WHEN flat_flagged = 0 THEN 0 ELSE " +
                     "(1000000 * kept) DIV flat_flagged END")
                  .as("recall_ppm"))
    },

    // Recall-by-STRENGTH attestation for the two-level router (added
    // r17, §13.1 candidate #4 promoted the same round it was
    // recorded) — q370 reports ONE recall number; this stratifies it
    // by duplicate strength, turning the docstring's geometry
    // argument ("near-identical pairs route identically; losses
    // concentrate in the borderline band") into DATA. Per arrival
    // flagged by the FLAT gate, its strength = the strongest
    // qualifying pair's cos² band — measured by integer
    // CROSS-MULTIPLICATION against the band lines (dot²·10⁴ ≥
    // na·nb·{1600, 2500, 4900, 8100} ⇔ cos² ≥ {0.16, 0.25, 0.49,
    // 0.81}), never a division — and the row reports how many of
    // that band's flat catches the two-level gate KEEPS. On this
    // uniform-random corpus every flagged arrival sits in bands 1–2
    // (cos 0.4–0.7; no near-identical pairs exist at any test SF) —
    // visible here as the only populated rows, which is exactly the
    // honesty the attestation exists for.
    "q376_twolevel_bands" -> { (s, d) =>
      // since r18 the band census reads the persisted certification
      // ([[routerCertTable]]) — one measurement, three views (q370's
      // overall row, these band rows, q380's config)
      s.table(routerCertTable(s, d)).where(col("band") >= 1)
        .select(col("band"), col("flat_flagged"), col("kept"),
                expr("(1000000 * kept) DIV flat_flagged")
                  .as("recall_ppm"))
        .orderBy("band")
    },

    // ROUTER SERVING-CONFIG row (added r18, the r17 verdict's #4 —
    // q362's discipline applied to the two-level router): the ONE
    // machine-readable row a gate deployment reads before serving,
    // derived ENTIRELY from declared constants and the PERSISTED
    // certification ([[routerCertTable]] — an artifact probe,
    // sub-second warm, never a recompute): the replication factor R
    // and coarse probe count (the build-time spill-tree trade that
    // keeps serving one equi-join), the DECLARED broadcast switch
    // ceiling and the measured per-entry size model it prices with
    // (the r18 wiring of the r17 A/B), the PINNED gate-model version
    // (q345/q371's deployment pin), and the certification's measured
    // agreement/recall — overall and the borderline band 1, where the
    // r17 stratification showed the losses concentrate (bands absent
    // from the cert carry no flat catches to lose: vacuously-kept
    // 10⁶, the declared convention). Oracle: literals + the full
    // two-assigner recompute.
    "q380_router_config" -> { (s, d) =>
      val cert = s.table(routerCertTable(s, d))
      val overall = cert.where(col("band") === 0)
        .select(col("vectors"),
                expr("CASE WHEN vectors = 0 THEN 0 ELSE " +
                     "(1000000 * agree) DIV vectors END").as("agree_ppm"),
                expr("CASE WHEN flat_flagged = 0 THEN 0 ELSE " +
                     "(1000000 * kept) DIV flat_flagged END")
                  .as("recall_ppm"))
      val borderline = cert.where(col("band") === 1)
        .agg(coalesce(max(expr("(1000000 * kept) DIV flat_flagged")),
                      lit(1000000L)).as("borderline_recall_ppm"))
      overall.crossJoin(broadcast(borderline))
        .select(lit(TwoLevelRep.toLong).as("rep_r"),
                lit(1L).as("coarse_probes"),
                lit(TwoLevelBroadcastCeilingBytes)
                  .as("switch_ceiling_bytes"),
                lit(TwoLevelFineEntryBytes).as("fine_entry_bytes"),
                // the served version comes from the prod deployment's
                // PIN FILE (r19 — the pin is data, gateModelPin), not
                // a compile-time constant; the oracle restates the
                // pin's declared initial value, so a config drift
                // surfaces as a correctness mismatch
                lit(graft.streaming.StreamOps.gateModelPin(
                      graft.streaming.StreamOps.gateModelRoot(s, d,
                        upTo = 1)).toLong).as("model_version"),
                col("vectors"), col("agree_ppm"), col("recall_ppm"),
                col("borderline_recall_ppm"))
    },

    // Graph version-log RETENTION (added r16, §12.1 candidate #1
    // promoted the same round it was recorded) — the retire step that
    // completes the artifact lifecycle q357 opened (build → promote →
    // serve → RETIRE): a nightly store keeps the last K versions and
    // collects every data file no kept manifest references (q167's
    // vacuum, verbatim — the union rule is what lets manifests share
    // files). Retention runs on a SCRATCH COPY of the promoted log:
    // a pinned reader of the live log (q344 reads v1!) must never
    // lose a version under it mid-session — production separates the
    // retention job from readers by age-based grace, and the copy
    // models that separation at test scale. Report: per version its
    // tier, kept/dropped status, and the kept versions' edge counts
    // re-read COMPLETE from the vacuumed log — the oracle restates
    // the kept edge sets from the shared build CTEs, so the GC must
    // be invisible to every surviving version. The spec additionally
    // asserts the dropped set is exactly {v1} and the LIVE log still
    // serves all three versions.
    "q366_graph_vacuum" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val live = graphVersionRoot(s, d)
      // the returned DataFrame reads the copy LAZILY, so eager deletion
      // is unsafe; a JVM-exit sweep bounds the leak per process instead
      // (r16 ADVICE — bench passes invoke this repeatedly and each
      // invocation staged a full log copy into tmpdir forever)
      val copy = java.nio.file.Files
        .createTempDirectory("graft_graphlog_vac")
      graft.TempSweep.replaceAtExit("graphlog_vac", copy)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(live).iterator.asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .foreach { p =>
          val rel = live.relativize(p)
          val dst = copy.resolve(rel.toString)
          java.nio.file.Files.createDirectories(dst.getParent)
          java.nio.file.Files.copy(p, dst)
        }
      // enumerate the versions the log ACTUALLY holds (captured before
      // the vacuum drops manifests): a log written by a different
      // builder layout must surface as an explicit unknown-tier row,
      // never a Map lookup crash (r16 ADVICE)
      val allVs = SnapshotLog.versions(copy)
      val (_, dropped) = SnapshotLog.vacuum(copy, keep = 2)
      val rows = allVs.map { v =>
        val tier = GraphVersionTiers.getOrElse(v, s"unknown_v$v")
        if (dropped.contains(v))
          s.range(1).select(lit(v.toLong).as("version"),
            lit(tier).as("tier"), lit("dropped").as("status"),
            lit(0L).as("edges"))
        else
          SnapshotLog.read(s, copy, v)
            .agg(count(lit(1)).as("edges"))
            .select(lit(v.toLong).as("version"), lit(tier).as("tier"),
                    lit("kept").as("status"), col("edges"))
      }
      rows.reduce(_ unionAll _).orderBy("version")
    },

    // ENGINE-WIDE LOG FSCK (added r19 — q388's audit widened to the
    // FIVE committed SnapshotLogs outside the gate family, so every
    // manifest chain the engine serves from passes the same
    // integrity battery): the graph-ANN version log (q342/q350/q366),
    // the pack-manifest log (q372/q378), and the three snapshot-table
    // fixtures — the post-vacuum events log (q167: versions start at
    // 2, which contiguity must ACCEPT — a retention-trimmed history
    // is gapless, not broken), the branched orders log (q335: dev's
    // branch-only files are referenced by BRANCH manifests, which the
    // orphan detector must count as live — exactly the vacuum union
    // rule as an audit), and the merged orders log (q336). Same row
    // shape and detectors as q388 ([[graft.streaming.StreamOps
    // .fsckLogRow]]: O(files), never reads row data); none of these
    // logs carries deployment pins, so pins_total = valid_pins = 0.
    // The oracle restates each latest census from first principles
    // (the graph build chain, the token-sum pack arithmetic, the
    // orders/events slices).
    "q389_log_fsck" -> { (s, d) =>
      val P = graft.sources.PartitionedOps
      val logs = Seq(
        ("graph", graphVersionRoot(s, d)),
        ("pack", graft.operators.TextExtOps.packLogRoot(s, d)),
        ("snap_branch",
         java.nio.file.Paths.get(P.branchedOrdersDir(s, d))),
        ("snap_events",
         java.nio.file.Paths.get(P.snapshotEventsDir(s, d))),
        ("snap_merge",
         java.nio.file.Paths.get(P.mergedOrdersDir(s, d))))
      logs.map { case (name, root) =>
        val (contiguous, complete, noOrphans, pinsTotal, validPins) =
          graft.streaming.StreamOps.fsckLogRow(root)
        val latestRows =
          P.SnapshotLog.read(s, root, P.SnapshotLog.latest(root)).count()
        s.range(1).select(lit(name).as("log"),
          lit(latestRows).as("latest_rows"),
          lit(contiguous).as("contiguous"),
          lit(complete).as("manifests_complete"),
          lit(noOrphans).as("no_orphans"),
          lit(pinsTotal).as("pins_total"),
          lit(validPins).as("valid_pins"))
      }.reduce(_ unionByName _).orderBy("log")
    },

    // Matryoshka dimension-truncation recall (added r15; Kusupati et
    // al. 2022's MRL evaluation as an ATTESTATION over this corpus) —
    // the production knob every embedding index weighs: a prefix-
    // truncated index costs k/64 of the storage and compute, and this
    // measures what each prefix actually buys HERE instead of
    // assuming the paper's curve transfers. For q344's 64 anchor
    // nodes, exact top-8 by full 64-dim cosine is the truth; tiers
    // re-rank by cosine over the first 8/16/32 dims (truncated
    // SLICES on both sides — MRL's prefix metric, norms over the
    // slice) plus the dims=64 self-check row that must read exactly
    // 10⁶ (emitted from the pinned exact frame itself, no re-rank
    // pass). One exact + three truncated 64·n passes, never n². Same integer
    // fixed-point recall_ppm as q344 — the two tables read together:
    // graph recall tells you the INDEX's loss, this one the
    // REPRESENTATION's. Since r16 the measurement PERSISTS
    // ([[mrlAttestationTable]], once per corpus fingerprint) and the
    // query reads the artifact — q362 consumes the same rows as the
    // serving-config input.
    "q352_mrl_recall" -> { (s, d) =>
      s.table(mrlAttestationTable(s, d)).orderBy("dims")
    },

    // Scalar-quantization (symmetric int8) recall (added r15) — the
    // OTHER standard index-compression knob next to q100's product
    // quantization: one global scale S = max |component| over the
    // corpus (a broadcast 1-row aggregate — the quantizer's entire
    // model), every vector quantizes to q_i = round(x_i · 127 / S) ∈
    // [−127, 127] (8 bits/dim, a 8× storage cut vs float64), and the
    // tier re-ranks q344's 64 anchors by QUANTIZED cosine — integer
    // dot and integer norms via the codegen'd dotProductLong kernel,
    // so both engines rank identical integers and the only float op
    // is the final round(dot/√(na·nb), 4). Truth = exact full-
    // precision top-8 (same pass as q352's dims=64 row). Report: the
    // sq8 recall row plus the exact self-check row — the measured
    // basis for "int8 is free on this corpus" (or not). Since r16 the
    // measurement PERSISTS ([[sq8AttestationTable]]) and the query
    // reads the artifact; q362 consumes the 'sq8' row.
    "q353_sq8_recall" -> { (s, d) =>
      s.table(sq8AttestationTable(s, d)).orderBy("tier")
    },

    // Serving-index CONFIGURATION table (added r16, the r15 verdict's
    // #7) — turns the q352/q353 attestations into the artifact a
    // serving team actually consumes: per candidate encoding the
    // measured (recall_ppm, bytes/vector) price, plus the RECOMMENDED
    // row — the cheapest config whose measured recall clears the
    // [[RecallFloorPpm]] floor (ties by encoding name). This query
    // reads ONLY the two persisted attestation artifacts (mrlatt +
    // sq8att — the measurements run once per corpus fingerprint
    // inside their builds); the pick itself is a 1-row orderBy-limit
    // over ≤ 5 rows, never a rescan. On this corpus the table says
    // what the r15 measurements said: truncation is near-worthless
    // (float64@8dims = int8's 64 bytes at 2.3% vs 97.5% recall) and
    // int8 is nearly free — so int8@64 is the recommended row, now
    // machine-readable instead of prose.
    "q362_index_config" -> { (s, d) =>
      val mrl = s.table(mrlAttestationTable(s, d))
        .select(lit("float64").as("encoding"), col("dims"),
                (col("dims") * 8L).as("bytes_per_vec"),
                col("recall_ppm"))
      val sq8 = s.table(sq8AttestationTable(s, d))
        .where(col("tier") === "sq8")
        .select(lit("int8").as("encoding"), lit(64L).as("dims"),
                lit(64L).as("bytes_per_vec"), col("recall_ppm"))
      val cfg = mrl.unionByName(sq8)
      val best = cfg.where(col("recall_ppm") >= RecallFloorPpm)
        .orderBy(col("bytes_per_vec"), col("encoding"))
        .limit(1)
        .select(col("encoding").as("enc_b"), col("dims").as("dims_b"))
      cfg.join(broadcast(best),
               col("encoding") === col("enc_b") &&
                 col("dims") === col("dims_b"), "left")
        .select(col("encoding"), col("dims"), col("bytes_per_vec"),
                col("recall_ppm"),
                when(col("enc_b").isNotNull, 1L).otherwise(0L)
                  .as("recommended"))
        .orderBy("bytes_per_vec", "encoding")
    },

    // Positional phrase search (added r15) — the EXACT-PHRASE tier of
    // the retrieval stack next to q175's bag-of-words BM25: real
    // search systems answer quoted queries from POSITIONAL postings
    // (term, doc, position), matching consecutive occurrences with a
    // per-document position equi-join — never a substring rescan of
    // the corpus. Shape: one linear token scan emits (doc, pos, term)
    // restricted to the query phrases' component terms (the probe
    // touches only the query terms' postings, exactly what a
    // persisted positional index serves — q187's postings artifact
    // gains a pos column at scale), each 2-token phrase is a
    // (doc_id, pos+1) self-equi-join of its two terms' postings, and
    // the report is each phrase's top-5 documents by occurrence count
    // (rank ≤ 5 gets Catalyst's WindowGroupLimit map-side heap, the
    // q195 mechanism, so the per-phrase funnel never carries more
    // than 5 rows per input partition). Fully oracled: DuckDB
    // restates the postings and the adjacency join verbatim.
    "q354_phrase_search" -> { (s, d) =>
      val terms = PhraseQueries.flatMap(p => Seq(p._1, p._2)).distinct
      phraseHits(Tables(s, d, "documents")
        .select(col("doc_id"),
                posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
        .where(col("t").isin(terms: _*)))
    },

    // Phrase search through the PERSISTED POSITIONAL INDEX (added
    // r16, the r15 verdict's #3) — makes q354's "a persisted
    // positional index serves the probe" note real, the way q187
    // made q175's postings note real: the artifact is the per-
    // occurrence inverted index (t, doc_id, pos) BUCKETED BY TERM
    // (q187's pospostings sibling with the pos column), built once
    // per corpus; the probe filters on the phrase terms, and because
    // `t` is the bucket key Spark prunes to the terms' buckets at
    // PLANNING time (SelectedBucketsCount, plan-asserted) and never
    // touches the documents parquet — a quoted query against a
    // web-scale index reads its terms' postings lists, never the
    // corpus. Adjacency join + top-5 are [[phraseHits]] verbatim, so
    // the result is byte-identical to q354 (one oracle, two paths).
    "q358_phrase_index" -> { (s, d) =>
      val posT = posPostingsTable(s, d)
      val terms = PhraseQueries.flatMap(p => Seq(p._1, p._2)).distinct
      phraseHits(s.table(posT).where(col("t").isin(terms: _*)))
    },

    // INCREMENTAL phrase search — standing index + arriving batch
    // (added r16, the r15 verdict's #3) — the q340/q341/q188
    // per-release discipline at the positional tier: when the day's
    // crawl lands, the search system does NOT rebuild the positional
    // index — the standing even-half artifact is probed bucket-pruned
    // (its postings were written before the batch existed), the odd
    // batch tokenizes INLINE filtered to the query terms before the
    // union (the only documents scan in the plan is the `% 2 = 1`
    // batch, q350's rule), and the adjacency join runs over the
    // union. Positions are per-document, so a batch doc's phrase
    // hits never interact with standing docs' postings — the union
    // is exact, and the result is provably the full-corpus q354
    // (one oracle, THREE computation paths: scan, index, merged).
    "q359_phrase_incremental" -> { (s, d) =>
      val all = Tables(s, d, "documents")
      val baseT = graft.BucketedCache.ensure(s, d, "pospostbase",
          "t STRING, doc_id BIGINT, pos BIGINT", "t", 8)(
        posPostings(all.where(col("doc_id") % 2 === 0)))
      val terms = PhraseQueries.flatMap(p => Seq(p._1, p._2)).distinct
      val batch = posPostings(all.where(col("doc_id") % 2 === 1))
        .where(col("t").isin(terms: _*))
      phraseHits(s.table(baseT).where(col("t").isin(terms: _*))
        .unionByName(batch))
    },

    // MMR diversified re-ranking (added r13) — the DIVERSITY stage of
    // the retrieval stack (Carbonell & Goldstein 1998), between the
    // raw top-k (q53) and fusion (q127): greedily pick the item
    // maximizing λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s), λ=0.5 —
    // the re-rank every RAG/search pipeline runs so the context
    // window isn't ten copies of the same document. Shape: exact
    // top-20 relevance candidates (q53's chain, 4 dp-rounded before
    // ranking) and their 20×20 pairwise sims PIN as bounded tables;
    // the greedy selection is [[mmrBody]] — TEN statically-unrolled
    // SQL steps (each: max-sim-to-picked fold → scored remainder →
    // argmax with (score desc, id) ties → picked-set union) that BOTH
    // engines run verbatim (the q308 discipline; no driver loop, no
    // recursion — the chain is k-bounded). Scores round 6 before
    // every argmax. At scale only the candidate retrieval touches the
    // corpus; the re-rank is k²-bounded by construction.
    "q322_mmr_rerank" -> { (s, d) =>
      import s.implicits._
      val em = embBase(s, d)
      val q0 = em.where(col("vec_id") === 0).select(col("v").as("qv"))
      val cand = em.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q0))
        .select(col("vec_id").as("id"), col("v"),
                round(org.apache.spark.sql.graft.GraftFunctions
                  .cosineSimilarity(col("v"), col("qv")), 4).as("rel"))
        .orderBy(col("rel").desc, col("id")).limit(20)
      val (cp, ch) = pin(cand); ch.count(); graft.PinScope.retain(ch)
      val pw = cp.select(col("id").as("a"), col("v").as("va"))
        .join(cp.select(col("id").as("b"), col("v").as("vb")),
              col("a") =!= col("b"))
        .select(col("a"), col("b"),
                round(org.apache.spark.sql.graft.GraftFunctions
                  .cosineSimilarity(col("va"), col("vb")), 4).as("sim"))
      // the greedy chain folds in ONE task over the two k-bounded
      // tables (r19 optimization): the staged per-step formulation —
      // [[mmrStep]] SQL per step over pinned picked-set views, which
      // the oracle still runs verbatim via [[mmrBody]] — paid ~30
      // scheduler jobs (3 pins/step) to fold ≤20 candidates and 380
      // pair sims; measured 83 jobs / 0.76 s of task time at sf0.1
      // (guide §1.1 census: pure scheduler round-trips). The fold
      // below is the IDENTICAL chain — ms = max sim to picked (step
      // 1's empty-set max coalesces to 0, the declared base case),
      // score = round(5e-1·rel − 5e-1·ms, 6) with Spark's own
      // BigDecimal.valueOf HALF_UP round, argmax by (score desc, id)
      // — and the q322 correctness spec asserts it against an
      // independent in-memory recomputation, step for step.
      val packed = cp.groupBy(lit(1).as("g"))
        .agg(collect_list(struct(col("id"), col("rel"))).as("cs"))
        .join(pw.groupBy(lit(1).as("g")).agg(collect_list(
          struct(col("a"), col("b"), col("sim"))).as("ps")), Seq("g"))
      val sels = packed.flatMap { row =>
        def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        val cs = row.getSeq[org.apache.spark.sql.Row](1)
          .map(c => (c.getLong(0), c.getDouble(1))).sortBy(_._1)
        val sim = row.getSeq[org.apache.spark.sql.Row](2)
          .map(p => ((p.getLong(0), p.getLong(1)), p.getDouble(2)))
          .toMap
        var picked = Vector.empty[Long]
        (1 to 10).map { k =>
          val scored = cs.filterNot(c => picked.contains(c._1))
            .map { case (id, rel) =>
              val ms = if (picked.isEmpty) 0.0
                       else picked.map(p => sim((id, p))).max
              (id, r6(5e-1 * rel - 5e-1 * ms), rel)
            }
          val (id, sc, rel) = scored.minBy(x => (-x._2, x._1))
          picked :+= id
          (k.toLong, id, sc, rel)
        }
      }.toDF("step", "id", "score", "rel")
      sels
        .select(col("step"), col("id").as("vec_id"), col("score"),
                col("rel").cast("double").as("relevance"))
        .orderBy("step")
    },

    // Reciprocal-rank fusion (added r10) — the retrieval ENSEMBLE a
    // production stack runs over its heterogeneous indexes: the same
    // query batch retrieves through two independent ANN paths — the
    // banded-LSH top-k (q71) and the persisted-IVF-index top-k (q79) —
    // and the lists fuse by RRF: score(doc) = Σ_paths 1/(K + rank),
    // K = 60 (the Cormack et al. constant), re-ranked per query. RRF
    // needs only RANKS, never comparable scores, which is exactly why
    // it is the standard way to combine an embedding index with a
    // second retriever. Deterministic end-to-end: both input rank
    // lists are hash-verified queries, the two reciprocal terms add in
    // fixed order as doubles, one round. Cost at scale: the two
    // retrievals (each already bounded) plus a full-outer join of two
    // k-row-per-query lists — the fusion itself is negligible.
    "q127_rrf_fusion" -> { (s, d) =>
      val lsh = queries("q71_ann_batch")(s, d)
        .select(col("qid"), col("cid").as("doc_id"), col("rk").as("rk_l"))
      val ivf = queries("q79_ann_index")(s, d)
        .select(col("qid"), col("vec_id").as("doc_id"), col("rk").as("rk_i"))
      val fused = lsh.join(ivf, Seq("qid", "doc_id"), "full_outer")
        .select(col("qid"), col("doc_id"),
                round(coalesce(lit(1.0) / (lit(RrfK) + col("rk_l")), lit(0.0)) +
                      coalesce(lit(1.0) / (lit(RrfK) + col("rk_i")), lit(0.0)),
                      6).as("rrf"))
      val w = Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id"))
      fused.select(col("qid"), col("doc_id"), col("rrf"),
                   row_number().over(w).cast("long").as("rk"))
        .where(col("rk") <= BatchK)
        .orderBy("qid", "rk")
    },

    // BM25 lexical retrieval (added r12) — the OTHER half of the
    // hybrid-retrieval stack q127 fuses: the exact sparse ranker every
    // search system pairs with the embedding index. For a FIXED query
    // term set no postings index is needed: the term filter pushes
    // into the exploded token stream, so only matching (doc, term)
    // rows ever aggregate — the corpus-sized token explosion never
    // shuffles (filter-before-agg; a standing query workload would
    // persist a postings-list artifact the way q79 persists the IVF
    // index, and corpus stats N/avgdl come from a StatsCatalog-style
    // profile rather than the second scan used here). Determinism:
    // every count is an integer; idf is ln on identical doubles
    // rounded 6 dp (the q137 log discipline); the per-term scores add
    // in FIXED order via one conditional sum per term (each sum folds
    // one value plus exact 0.0 terms), one final round 4. Top-k is a
    // bounded TakeOrderedAndProject, never a global sort.
    "q175_bm25" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
                size(col("toks")).cast("long").as("dl"))
      val stats = docs.agg(count(lit(1)).as("n_docs"),
                           sum(col("dl")).as("tot_len"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("t"))
        .where(col("t").isin(Bm25Terms: _*))
        .groupBy("doc_id", "dl", "t").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("t").agg(count(lit(1)).as("df"))
      val sc = tf.join(broadcast(dfT), Seq("t"))
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          round(log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
                    (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6))
        .withColumn("norm",
          lit(0.25) + lit(0.75) *
            ((col("dl") * col("n_docs")).cast("double") /
             col("tot_len").cast("double")))
        .withColumn("sc",
          col("idf") * (col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) * col("norm")))
      sc.groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"),
             Bm25Terms.map(t =>
               sum(when(col("t") === t, col("sc")).otherwise(lit(0.0)))
                 .as("s_" + t)): _*)
        .select(col("doc_id"), col("n_terms"),
                round(Bm25Terms.map(t => col("s_" + t))
                        .reduce(_ + _), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(Bm25K)
    },

    // BM25 through the PERSISTED POSTINGS INDEX (added r12) — makes
    // q175's "standing query workload persists a postings artifact"
    // note real, the way q79 made q71's IVF index real: the inverted
    // index every search system actually stores is (term, doc, tf,
    // doclen) BUCKETED BY TERM, built once per corpus
    // (BucketedCache's write-once atomic-rename contract), plus a
    // one-row corpus-stats artifact (N, Σdl) — the catalog entry a
    // warehouse keeps. The probe filters the index on the query's
    // terms, and because `t` is the bucket key Spark prunes to the
    // terms' buckets at PLANNING time (SelectedBucketsCount in the
    // scan, plan-asserted) — a 3-term query against a web-scale index
    // reads 3 buckets' worth of postings, never the corpus, never the
    // full index. Scoring and output are byte-identical to q175 (one
    // oracle, two computation paths — the q82/q108 discipline).
    "q187_bm25_index" -> { (s, d) =>
      val postT = bm25PostingsTable(s, d)
      val statT = graft.BucketedCache.ensure(s, d, "bmstats",
          "k BIGINT, n_docs BIGINT, tot_len BIGINT", "k", 1) {
        Tables(s, d, "documents")
          .select(size(split(col("text"), " ")).cast("long").as("dl"))
          .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_len"))
          .select(lit(0L).as("k"), col("n_docs"), col("tot_len"))
      }
      val tf = s.table(postT).where(col("t").isin(Bm25Terms: _*))
      val stats = s.table(statT).select("n_docs", "tot_len")
      val dfT = tf.groupBy("t").agg(count(lit(1)).as("df"))
      val sc = tf.join(broadcast(dfT), Seq("t"))
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          round(log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
                    (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6))
        .withColumn("norm",
          lit(0.25) + lit(0.75) *
            ((col("dl") * col("n_docs")).cast("double") /
             col("tot_len").cast("double")))
        .withColumn("sc",
          col("idf") * (col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) * col("norm")))
      sc.groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"),
             Bm25Terms.map(t =>
               sum(when(col("t") === t, col("sc")).otherwise(lit(0.0)))
                 .as("s_" + t)): _*)
        .select(col("doc_id"), col("n_terms"),
                round(Bm25Terms.map(t => col("s_" + t))
                        .reduce(_ + _), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(Bm25K)
    },

    // INCREMENTAL BM25 — batch vs persisted index (added r12) — the
    // q76/q99/q103 batch-vs-index discipline applied to retrieval:
    // when the day's crawl lands, a search system does NOT rebuild the
    // inverted index — it tokenizes the BATCH, unions the delta
    // postings with the standing index, and ADDS the mergeable corpus
    // stats (N and Σdl are sums — the same merge property as q110's
    // HLL and q152's moments). Base index = even doc_ids (q76's
    // standing-corpus convention), batch = odds tokenized inline; the
    // index side is probed bucket-pruned like q187, the batch side
    // filters its token stream to the query terms before aggregating
    // (q175's filter-before-agg), and df/idf re-derive from the MERGED
    // postings, so scores reflect the full corpus exactly. The result
    // is provably the full-corpus BM25 — the oracle is q175's verbatim
    // (one oracle, THREE computation paths: scratch, index, merged).
    "q188_bm25_incremental" -> { (s, d) =>
      def postings(docs: org.apache.spark.sql.DataFrame) = docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
                size(col("toks")).cast("long").as("dl"))
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("t"))
        .where(length(col("t")) > 0)
        .groupBy("t", "doc_id", "dl").agg(count(lit(1)).as("tf"))
        .select("t", "doc_id", "tf", "dl")
      def stats(docs: org.apache.spark.sql.DataFrame) = docs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_len"))
      val all = Tables(s, d, "documents")
      val baseT = graft.BucketedCache.ensure(s, d, "postingsbase",
          "t STRING, doc_id BIGINT, tf BIGINT, dl BIGINT", "t", 8)(
        postings(all.where(col("doc_id") % 2 === 0)))
      val baseStatT = graft.BucketedCache.ensure(s, d, "bmstatsbase",
          "k BIGINT, n_docs BIGINT, tot_len BIGINT", "k", 1)(
        stats(all.where(col("doc_id") % 2 === 0))
          .select(lit(0L).as("k"), col("n_docs"), col("tot_len")))
      val batch = all.where(col("doc_id") % 2 === 1)
      val tf = s.table(baseT).where(col("t").isin(Bm25Terms: _*))
        .unionByName(postings(batch).where(col("t").isin(Bm25Terms: _*)))
      val merged = s.table(baseStatT)
        .select(col("n_docs").as("nb"), col("tot_len").as("lb"))
        .crossJoin(stats(batch)
          .select(col("n_docs").as("nx"), col("tot_len").as("lx")))
        .select((col("nb") + col("nx")).as("n_docs"),
                (col("lb") + col("lx")).as("tot_len"))
      val dfT = tf.groupBy("t").agg(count(lit(1)).as("df"))
      val sc = tf.join(broadcast(dfT), Seq("t"))
        .crossJoin(broadcast(merged))
        .withColumn("idf",
          round(log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
                    (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6))
        .withColumn("norm",
          lit(0.25) + lit(0.75) *
            ((col("dl") * col("n_docs")).cast("double") /
             col("tot_len").cast("double")))
        .withColumn("sc",
          col("idf") * (col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) * col("norm")))
      sc.groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"),
             Bm25Terms.map(t =>
               sum(when(col("t") === t, col("sc")).otherwise(lit(0.0)))
                 .as("s_" + t)): _*)
        .select(col("doc_id"), col("n_terms"),
                round(Bm25Terms.map(t => col("s_" + t))
                        .reduce(_ + _), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(Bm25K)
    },

    // Batched ANN: N query vectors × banded LSH buckets -> exact
    // re-rank -> per-query top-k. The query side is broadcast (N rows);
    // the collection side shuffles once per band on the 8-bit band key.
    // Re-rank is the stored-norm decomposition (one norm fold per
    // vector in the base projection, one dot fold per candidate pair).
    "q71_ann_batch" -> { (s, d) =>
      val base = Tables(s, d, "embeddings")
        .select(col("vec_id"), vec.as("v"), sigColumn.as("sig"),
                GraftFunctions.vectorNorm(vec).as("nv"))
      val qs = base.where(col("vec_id") < BatchQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
                col("sig").as("qsig"), col("nv").as("qn"))
      val cands = (0 until Bands).map { b =>
        broadcast(qs.select(col("qid"), band(col("qsig"), b).as("bk")))
          .join(base.select(col("vec_id").as("cid"), band(col("sig"), b).as("bk")),
                Seq("bk"))
          .select("qid", "cid")
      }.reduce(_.unionAll(_)).where(col("qid") =!= col("cid")).distinct()
      val scored = cands
        .join(broadcast(qs.select(col("qid"), col("qv"), col("qn"))), Seq("qid"))
        .join(base.select(col("vec_id").as("cid"), col("v").as("cv"),
                          col("nv").as("cn")), Seq("cid"))
        .select(col("qid"), col("cid"),
                round(GraftFunctions.dotProduct(col("qv"), col("cv")) /
                      (col("qn") * col("cn")), 4).as("sim"))
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
      scored.select(col("qid"), col("cid"), col("sim"),
                    row_number().over(w).cast("long").as("rk"))
        .where(col("rk") <= BatchK)
        .orderBy("qid", "rk")
    },

    // Grid-density clustering / DBSCAN-lite (added r12) — the DENSITY
    // member of the clustering family next to the centroid pair
    // (q125/q222 k-means) and the similarity-graph components (q82):
    // clusters of arbitrary shape, no preset k, noise set aside. The
    // classic grid reduction makes it relational AND scale-free: quantize
    // the first two embedding dims to a 0.05 grid (round(x·1e6) integer
    // µ-units — float→double is exact, so cell membership is
    // engine-identical), fold points to per-cell counts (the ONLY
    // volume-bound step, one shuffle), core cells = count ≥ 3, connect
    // 8-adjacent core cells with the q82 min-label fixpoint, report
    // per-cluster cell/point totals plus the noise remainder (-1).
    // Everything past the fold is GRID-bounded (≤ (4/0.05)² = 6400
    // cells, pinned) no matter the corpus: adjacency via an exploded
    // 8-offset broadcast join, never cell×cell; the oracle re-derives
    // the components with a recursive-CTE reachability (q82's
    // discipline — two independent algorithms, one table).
    "q278_dbscan_grid" -> { (s, dir) =>
      val minPts = 3
      val pts = Tables(s, dir, "embeddings")
        .select(expr("(cast(round(cast(element_at(embedding, 1) as double) * 1000000) as bigint) + 2000000) div 50000").as("cx"),
                expr("(cast(round(cast(element_at(embedding, 2) as double) * 1000000) as bigint) + 2000000) div 50000").as("cy"))
      val (cells, h) = pin(pts.groupBy("cx", "cy")
        .agg(count(lit(1)).as("n")))
      h.count(); graft.PinScope.retain(h)
      val core = cells.where(col("n") >= minPts)
        .withColumn("cid", col("cx") * 100000L + col("cy"))
      val offs = for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0)
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
      val probes = core.select(col("cid"), col("cx"), col("cy"),
          explode(array(offs: _*)).as("o"))
        .select(col("cid").as("id_a"),
                (col("cx") + col("o.dx")).as("nx"),
                (col("cy") + col("o.dy")).as("ny"))
      val edges = probes.join(
          broadcast(core.select(col("cid").as("id_b"),
                                col("cx").as("nx"), col("cy").as("ny"))),
          Seq("nx", "ny"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      // (id, lbl); the grid bound (≤ 6400 cells) is what licenses the
      // one-task union-find fold — see connectedComponentsBounded
      val comp = DedupExtOps.connectedComponentsBounded(edges)
      val labeled = core.join(broadcast(comp),
          col("cid") === col("id"), "left")
        .withColumn("cluster_id", coalesce(col("lbl"), col("cid")))
      val clustered = labeled.groupBy("cluster_id")
        .agg(count(lit(1)).as("n_cells"),
             sum(col("n")).cast("long").as("n_points"))
      val noise = cells.where(col("n") < minPts)
        .agg(lit(-1L).as("cluster_id"), count(lit(1)).as("n_cells"),
             coalesce(sum(col("n")), lit(0L)).cast("long").as("n_points"))
      clustered.unionAll(noise)
        .orderBy(col("n_points").desc, col("cluster_id"))
    },

    // Spatial radius join (added r12) — the SPATIAL member of the join
    // family: all point pairs within radius R, the self-join behind
    // store-catchment overlap, sensor co-location, and 2-D embedding
    // neighborhoods. The classic scale shape: bucket points to an
    // R-sized grid, probe each point against its 9-cell neighborhood
    // (any ≤R pair MUST share or neighbor a cell — no recall loss),
    // verify with the EXACT integer metric dist² = Δx²+Δy² in 1e-6
    // µ-units ≤ R² (a declared planar metric: no trig, engine-exact;
    // the haversine refinement swaps in at the verify step only).
    // Cost O(points × avg 9-cell occupancy), never points²; the oracle
    // is the INDEPENDENT quadratic self-join — two algorithms, one
    // pair set. Candidate dedup: a pair is emitted only from its
    // lower-id side's probe (id_a < id_b), then distinct guards the
    // both-sides-probe duplication.
    "q289_spatial_join" -> { (s, dir) =>
      val R = 20000L // 0.02 embedding units in 1e-6 µ-units
      val pts = Tables(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          expr("cast(round(cast(element_at(embedding, 1) as double) * 1000000) as bigint)").as("x"),
          expr("cast(round(cast(element_at(embedding, 2) as double) * 1000000) as bigint)").as("y"))
        .withColumn("cx", expr(s"(x + 2000000) div $R"))
        .withColumn("cy", expr(s"(y + 2000000) div $R"))
      val offs = for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
      val probes = pts.select(col("id").as("id_a"), col("x").as("xa"),
          col("y").as("ya"), col("cx"), col("cy"),
          explode(array(offs: _*)).as("o"))
        .select(col("id_a"), col("xa"), col("ya"),
                (col("cx") + col("o.dx")).as("ncx"),
                (col("cy") + col("o.dy")).as("ncy"))
      val right = pts.select(col("id").as("id_b"), col("x").as("xb"),
                             col("y").as("yb"),
                             col("cx").as("ncx"), col("cy").as("ncy"))
      probes.join(right, Seq("ncx", "ncy"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
                ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
                 (col("ya") - col("yb")) * (col("ya") - col("yb")))
                  .as("dist2"))
        .where(col("dist2") <= R * R)
        .distinct()
        .orderBy("id_a", "id_b")
    },

    // Radius-bounded k-NN JOIN (added r13) — the DIRECTIONAL member
    // next to q289's symmetric radius join: for EVERY point, its k=5
    // nearest neighbors within R (rank-ordered), the per-row retrieval
    // primitive behind k-NN graph construction (q329's artifact at
    // scale), local-density estimation, and spatial recommendation.
    // Same exactness theorem as q289: any ≤R neighbor shares or
    // borders the probe's R-sized grid cell, so candidates = the
    // 9-cell neighborhood and the top-5 among them by the EXACT
    // integer metric (dist² asc, id tie-break) is the true in-radius
    // k-NN — no recall loss, no distinct needed (each candidate pair
    // matches through exactly one probe cell, and k-NN is directional
    // so no both-sides dedup arises). Cost O(points × 9-cell
    // occupancy) + a per-point bounded window, never points²; points
    // with no in-radius neighbor drop (declared). Oracle: the
    // INDEPENDENT quadratic join + window — two algorithms, one list.
    "q331_knn_join" -> { (s, dir) =>
      val R = 20000L
      val W = org.apache.spark.sql.expressions.Window
      val pts = Tables(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          expr("cast(round(cast(element_at(embedding, 1) as double) * 1000000) as bigint)").as("x"),
          expr("cast(round(cast(element_at(embedding, 2) as double) * 1000000) as bigint)").as("y"))
        .withColumn("cx", expr(s"(x + 2000000) div $R"))
        .withColumn("cy", expr(s"(y + 2000000) div $R"))
      val offs = for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
      val probes = pts.select(col("id").as("id_a"), col("x").as("xa"),
          col("y").as("ya"), col("cx"), col("cy"),
          explode(array(offs: _*)).as("o"))
        .select(col("id_a"), col("xa"), col("ya"),
                (col("cx") + col("o.dx")).as("ncx"),
                (col("cy") + col("o.dy")).as("ncy"))
      val right = pts.select(col("id").as("id_b"), col("x").as("xb"),
                             col("y").as("yb"),
                             col("cx").as("ncx"), col("cy").as("ncy"))
      probes.join(right, Seq("ncx", "ncy"))
        .where(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"),
                ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
                 (col("ya") - col("yb")) * (col("ya") - col("yb")))
                  .as("dist2"))
        .where(col("dist2") <= R * R)
        .withColumn("nn_rank", row_number().over(
          W.partitionBy("id_a").orderBy(col("dist2"), col("id_b"))))
        .where(col("nn_rank") <= 5)
        .select(col("id_a"), col("nn_rank").cast("long").as("nn_rank"),
                col("id_b"), col("dist2"))
        .orderBy("id_a", "nn_rank")
    },

    // Incremental k-NN join — batch vs PERSISTED grid index (added
    // r13): the q76/q79/q99 batch-vs-index discipline applied to the
    // spatial family. The standing corpus (even vec_ids, the house
    // convention) persists ONCE as a grid-cell-bucketed artifact
    // (BucketedCache; at 100 TB the cell id is the layout's partition
    // key); the day's new points (odd ids) probe their 9-cell
    // neighborhoods against it — the index is never rebuilt and the
    // even corpus never rescanned (plan-asserted: the only parquet
    // scan is the odd batch). Same exactness theorem and metric as
    // q331; k=5 nearest EVEN neighbors within R per new point.
    // Oracle: the independent quadratic odd×even join — the artifact
    // must be semantically invisible.
    "q334_knn_index" -> { (s, dir) =>
      val R = 20000L
      val W = org.apache.spark.sql.expressions.Window
      def gridded(df: DataFrame) = df
        .select(col("vec_id").as("id"),
          expr("cast(round(cast(element_at(embedding, 1) as double) * 1000000) as bigint)").as("x"),
          expr("cast(round(cast(element_at(embedding, 2) as double) * 1000000) as bigint)").as("y"))
        .withColumn("cx", expr(s"(x + 2000000) div $R"))
        .withColumn("cy", expr(s"(y + 2000000) div $R"))
        .withColumn("cell", col("cx") * 1000 + col("cy"))
      val idxT = graft.BucketedCache.ensure(s, dir, "knnidx",
          "id BIGINT, x BIGINT, y BIGINT, cell BIGINT", "cell", 8)(
        gridded(Tables(s, dir, "embeddings")
                  .where(col("vec_id") % 2 === 0))
          .select("id", "x", "y", "cell"))
      val offs = for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
      val probes = gridded(Tables(s, dir, "embeddings")
                             .where(col("vec_id") % 2 === 1))
        .select(col("id").as("id_a"), col("x").as("xa"),
                col("y").as("ya"), col("cx"), col("cy"),
                explode(array(offs: _*)).as("o"))
        .select(col("id_a"), col("xa"), col("ya"),
                ((col("cx") + col("o.dx")) * 1000 +
                 (col("cy") + col("o.dy"))).as("cell"))
      probes.join(s.table(idxT), Seq("cell"))
        .select(col("id_a"), col("id").as("id_b"),
                ((col("xa") - col("x")) * (col("xa") - col("x")) +
                 (col("ya") - col("y")) * (col("ya") - col("y")))
                  .as("dist2"))
        .where(col("dist2") <= R * R)
        .withColumn("nn_rank", row_number().over(
          W.partitionBy("id_a").orderBy(col("dist2"), col("id_b"))))
        .where(col("nn_rank") <= 5)
        .select(col("id_a"), col("nn_rank").cast("long").as("nn_rank"),
                col("id_b"), col("dist2"))
        .orderBy("id_a", "nn_rank")
    },

    // PCA top component via fixed-point power iteration (added r12) —
    // the dimensionality-reduction member the embedding family lacked:
    // the corpus's principal direction and its explained-variance
    // share, the first diagnostic before choosing an index/codebook
    // dimensionality (q73/q107) and the axis q283's drift projects
    // onto. The DISTRIBUTED work is the covariance fold: quantized
    // vectors (1e-6 BIGINT µ-units) expand to (i, j, q_i·q_j) products
    // — exactly the O(n·d²) FLOPs the covariance needs — map-side
    // combined into d² decimal cells plus a d-row mean vector (two
    // column-pruned scans). The 64×64 matrix is an aggregate smaller
    // than the output, so the eigensolve runs driver-side in BigInt
    // (q279's contract): C = n·S2 − S1S1ᵀ, pre-scaled by
    // max(1, max|C| div 1e9) (truncating division, matching DuckDB's
    // // exactly — keeps later products in 64-bit range at ANY corpus
    // size), then 120 power
    // steps w = C·v with integer max-normalization v = w·1e6 div
    // max|w| (120 steps: convergence goes as (λ2/λ1)^k and this
    // corpus's spectrum is flat — measured cos-to-eigenvector 0.79 at
    // 20 steps, 0.9999998 at 120). All arithmetic integer ⇒ the oracle's generated
    // 20-step CTE chain reproduces it bit-for-bit. Sign declared:
    // the largest-|loading| dimension (tie: lowest index) loads
    // positive. Output: per-dim unit-L2 loadings + the Rayleigh
    // explained-variance share (computed over the scaled matrix,
    // declared).
    "q295_pca_power" -> { (s, dir) =>
      import s.implicits._
      val (v, norm, c) = pcaTopComponent(s, dir)
      val dims = v.length
      val vtv = v.map(x => x * x).sum
      val ray = (for (i <- 0 until dims; j <- 0 until dims)
        yield c(i)(j) * v(i) * v(j)).sum
      val trace = (0 until dims).map(i => c(i)(i)).sum
      val varExp = (ray.toDouble / vtv.toDouble) / trace.toDouble
      val varExpR = BigDecimal(varExp)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (0 until dims).map(i => (i,
          BigDecimal(v(i).toDouble / norm)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          varExpR))
        .toDF("dim", "loading", "var_explained")
        .orderBy("dim")
    },

    // Top-3 principal components via integer deflation (added r13 —
    // the r12 verdict's #4): one component rarely summarizes an
    // embedding space (this corpus's spectrum is flat — q295 measures
    // PC1 explaining only a sliver), so the dimensionality-choice
    // question needs the SPECTRUM'S HEAD, not its top. Hotelling
    // deflation in the same fixed-point discipline as q295 (120-step
    // first solve = q295 verbatim; deflated solves declare 60 steps —
    // see pcaDeflatedComponents for the oracle depth rationale): after
    // each solve, subtract the component's Rayleigh outer product
    // (ray·v_i·v_j div vtv²) and re-scale by max(1, max|·| div 1e9) —
    // every operation truncating-integer, so the generated-CTE oracle
    // replays all three solves bit-for-bit. Distributed cost is
    // UNCHANGED from q295 (one covariance fold; deflation is d²
    // driver arithmetic on the collected aggregate — q279's
    // driver-solve contract); var_explained re-scales each ray back
    // to the first-scale matrix before dividing by its trace.
    // Component 1 equals q295's output by construction.
    "q297_pca_topk" -> { (s, dir) =>
      import s.implicits._
      val (comps, trace) = pcaDeflatedComponents(s, dir, 3)
      comps.zipWithIndex.flatMap { case ((v, norm, ray, vtv, scl), ci) =>
        val ve = ray.toDouble * scl.toDouble / vtv.toDouble /
          trace.toDouble
        val veR = BigDecimal(ve)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        v.indices.map(i => (ci + 1, i,
          BigDecimal(v(i).toDouble / norm)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          veR))
      }.toDF("component", "dim", "loading", "var_explained")
        .orderBy("component", "dim")
    },

    // Per-source drift along the principal axis (added r12) — the
    // COMPOSITION of q295's direction with q283's per-source question:
    // project every embedding onto PC1 (one zip_with/aggregate
    // map-side pass — exact BIGINT dot products against the 64
    // integer loadings broadcast as literals) and report each ingest
    // source's mean projection in embedding units. Sources whose text
    // drifts along the corpus's dominant axis separate HERE first —
    // the 1-D summary a monitoring dashboard trends per crawl. The
    // eigensolve is shared with q295 (one declared algorithm, two
    // consumers); the projection divides exact decimal sums once,
    // 6 dp.
    "q296_pc1_source_drift" -> { (s, dir) =>
      val (v, norm, _) = pcaTopComponent(s, dir)
      val vlit = array(v.map(x => lit(x.toLong)): _*)
      val qCol = expr("transform(embedding, x -> " +
        "cast(round(cast(x as double) * 1000000) as bigint))")
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"))
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), qCol.as("q"))
        .withColumn("p", aggregate(
          zip_with(col("q"), vlit, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
        .join(docs, col("vec_id") === col("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
             sum(col("p").cast("decimal(38,0)")).as("sp"))
        .select(col("source"), col("n"),
          round(col("sp").cast("double") / col("n").cast("double") /
                (lit(1000000.0) * lit(norm)), 6).as("mean_proj"))
        .orderBy("source")
    },

    // Embedding-space source drift (added r12) — the SEMANTIC tier of
    // the per-source DQ family: q211 measures each ingest source's
    // duplicate rate and q262 its lexical mirroring; this measures
    // whether a source's EMBEDDING DISTRIBUTION sits apart from the
    // corpus (a crawl gone off-domain shows up here before any lexical
    // signal). Per source: centroid cosine to the global centroid and
    // within-source dispersion — both from ONE pass, because E‖x−c‖² =
    // E‖x‖²−‖c‖² and cosine(c_s, c_g) cancels the 1/n factors, so
    // everything derives from per-(source, dim) integer sums: vectors
    // quantize to 1e-6 BIGINTs (q125's fixed-point discipline,
    // float→double exact), posexplode folds to a |sources|×64 cell
    // table (map-side combine; the ONLY volume-bound step), and all
    // norms/dots are exact decimal folds over the PINNED cells with
    // one double divide-sqrt chain per output, 6 dp. doc_id ≡ vec_id
    // joins source in (q45's rule, broadcast dim projection).
    "q283_embed_drift" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"))
      val cellsRaw = Tables(s, dir, "embeddings")
        .join(docs, col("vec_id") === col("doc_id"))
        .select(col("source"), expr(
          "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))")
          .as("q"))
        .select(col("source"), posexplode(col("q")).as(Seq("dim", "v")))
        .groupBy("source", "dim")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"),
             sum(col("v").cast("decimal(38,0)") * col("v")).as("svv"))
      val (cells, h) = pin(cellsRaw)
      h.count(); graft.PinScope.retain(h)
      val gl = cells.groupBy("dim")
        .agg(sum(col("sv").cast("decimal(38,0)")).as("gv"))
      val gn = gl.agg(sum(col("gv") * col("gv")).as("gn"))
      val per = cells.join(broadcast(gl), Seq("dim"))
        .groupBy("source")
        .agg(max("n").as("n_docs"),
             sum(col("sv").cast("decimal(38,0)") * col("sv")).as("ns"),
             sum(col("sv").cast("decimal(38,0)") * col("gv")).as("dot"),
             sum(col("svv")).as("ssq"))
      per.crossJoin(broadcast(gn))
        .select(col("source"), col("n_docs"),
          round(col("dot").cast("double") /
                (sqrt(col("ns").cast("double")) *
                 sqrt(col("gn").cast("double"))), 6).as("cos_to_global"),
          round((col("ssq").cast("double") /
                   col("n_docs").cast("double") -
                 col("ns").cast("double") /
                   (col("n_docs").cast("double") *
                    col("n_docs").cast("double"))) / 1.0e12, 6)
            .as("dispersion"))
        .orderBy("source")
    }
  )

  /** The semantic-decontamination probe shared by the declared q120 and
    * [[q120Production]]: per eval row in `qs`, NProbe cells by exact
    * centroid distance against `cent`, ADC from the index's stored
    * codes (no re-coding, no index shuffle), bounded PqRerank cut,
    * exact cosine re-rank, threshold flag. */
  private def semProbe(s: SparkSession, idxT: String, cent: DataFrame,
                       qs: DataFrame, codebook: DataFrame): DataFrame = {
    val trainSide = TextExtOps.splitOf(col("vec_id")) === "train"
    val pw = Window.partitionBy("eval_id").orderBy(col("dist"), col("cid"))
    val probeCells = qs.crossJoin(broadcast(cent))
      .select(col("eval_id"), col("cid"), sqL2("qv", "cv").as("dist"))
      .select(col("eval_id"), col("cid"), row_number().over(pw).as("pr"))
      .where(col("pr") <= NProbe).select("eval_id", "cid")
    val aw = Window.partitionBy("eval_id").orderBy(col("adc"), col("vec_id"))
    s.table(idxT).where(trainSide)
      .join(broadcast(probeCells), Seq("cid"))
      .join(broadcast(qs), Seq("eval_id"))
      .crossJoin(broadcast(codebook))
      .withColumn("adc", pqAdcStored)
      .withColumn("ar", row_number().over(aw))
      .where(col("ar") <= PqRerank)
      .select(col("eval_id"), col("vec_id").as("train_id"),
              round(GraftFunctions.dotProduct(col("v"), col("qv")) /
                    (col("nv") * col("qn")), 4).as("sim"))
      .where(col("sim") >= SemThreshold)
      .orderBy("eval_id", "train_id")
  }

  /** q120's PRODUCTION configuration (the r10 verdict's measured-linear
    * mandate): the r10 10× sweep ran the declared query's WORKLOAD
    * MODEL — an eval probe set that is a fixed FRACTION of the corpus
    * (md5 split ≈ 25%) against a FROZEN 16-cell codebook — so probed
    * work grew ∝ |eval|·(n/cells) = n²/16: super-linear by
    * construction, not by plan. Production releases don't do that:
    * the eval suite is a FIXED SIZE regardless of corpus (first
    * `evalCap` eval docs here — deterministic), and the IVF codebook
    * scales with the corpus (`cents` ∝ √n, the standard IVF sizing),
    * making probe work ∝ evalCap·√n — sublinear per release. Same
    * probe plan ([[semProbe]], plan assertions unchanged), same
    * persisted-index discipline (a per-`cents` artifact: the index is
    * rebuilt when the codebook generation changes, exactly like a real
    * reindex). Clone-table hygiene: the 10× sweep tables repeat
    * vec_ids, so codebook/centroid/eval SOURCES dedup on vec_id —
    * duplicate centroid ids would break the sort_array position
    * contract in [[pqPacked]] — while the INDEXED corpus keeps every
    * clone (volume is the thing being measured).
    * CorrectnessSpec pins equality with the declared q120 at the
    * declared configuration (evalCap ≥ |eval|, cents = Cents). */
  private[graft] def q120Production(s: SparkSession, d: String,
                                    evalCap: Int, cents: Int): DataFrame = {
    val em = embBase(s, d)
    val dd = em.dropDuplicates("vec_id")
    val idxT = pqIndexTableC(s, d, cents)
    val qs = dd.where(TextExtOps.splitOf(col("vec_id")) === "eval")
      .orderBy("vec_id").limit(evalCap)
      .select(col("vec_id").as("eval_id"), col("v").as("qv"),
              GraftFunctions.vectorNorm(col("v")).as("qn"))
    semProbe(s, idxT, centroids(dd, cents), qs, pqPacked(dd))
  }

  /** The persisted IVF-PQ coded index (q107/q120): cell id + 8 stored
    * one-byte codes + vector + norm, bucketed on cid — assignment and
    * coding happen in ONE zero-shuffle map pass at build time and
    * never again (both probes' plans are asserted argmin-free). */
  private def pqIndexTable(s: SparkSession, d: String): String =
    pqIndexTableC(s, d, Cents)

  /** [[pqIndexTable]] parameterized on the coarse-codebook size: the
    * frozen declared artifact is `pqidx_c16`-equivalent under its
    * historical name `pqidx`; production codebook generations land as
    * separate artifacts (a codebook change IS a reindex). */
  private def pqIndexTableC(s: SparkSession, d: String, cents: Int): String = {
    val em = embBase(s, d)
    val dd = if (cents == Cents) em else em.dropDuplicates("vec_id")
    val codeCols = (0 until PqSub).map { ss =>
      GraftFunctions.argminCentroid(
        slice(col("v"), ss * PqDim + 1, PqDim), col(s"cents$ss"))
        .as(s"c$ss")
    }
    val name = if (cents == Cents) "pqidx" else s"pqidx_c$cents"
    graft.BucketedCache.ensure(s, d, name,
        "cid BIGINT, vec_id BIGINT, " +
          (0 until PqSub).map(ss => s"c$ss BIGINT").mkString(", ") +
          ", v ARRAY<DOUBLE>, nv DOUBLE", "cid", 8)(
      ivfAssignC(em, centroids(dd, cents))
        .crossJoin(broadcast(pqPacked(dd)))
        .select(col("cid") +: col("vec_id") +: codeCols :+
                col("v") :+ col("nv"): _*))
  }

  /** Shared IVF oracle CTEs (q73/q79): e = embeddings as double lists,
    * c = sampled centroids, d = all (vector, centroid) distances,
    * a = the argmin assignment — the SQL twin of [[ivfAssign]]. */
  private def ivfCte: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $Cents),
       |d AS (SELECT e.vec_id, e.v, c.cid,
       |        list_sum(list_transform(range(1, 65),
       |          i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS dist
       |      FROM e, c),
       |a AS (SELECT vec_id, v, cid FROM (
       |        SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                     ORDER BY dist, cid) AS rn
       |        FROM d) WHERE rn = 1)""".stripMargin


  /** Shared q295/q296 oracle prefix: quantized covariance, scaled
    * integer matrix, and the 120 generated MATERIALIZED power-iteration
    * CTEs (plain CTE inlining re-evaluates the chain exponentially),
    * ending at `fin` (signed component) and `nrm` (its norm). */
  private def pcaOracleCte: String = {
    val steps = (1 to 120).map { k =>
      s"""w$k AS MATERIALIZED (
         |  SELECT c.i, sum(c.cv * v.val) AS w
         |  FROM cs c JOIN v${k - 1} v ON c.j = v.i GROUP BY 1),
         |m$k AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w$k),
         |v$k AS MATERIALIZED (
         |  SELECT i, (w * 1000000) // (SELECT m FROM m$k)
         |    AS val FROM w$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
       |    AS q
       |  FROM embeddings),
       |l1 AS MATERIALIZED (
       |  SELECT q, unnest(q) AS a,
       |    unnest(range(0, len(q))) AS i
       |  FROM e),
       |cells AS MATERIALIZED (
       |  SELECT i, j, sum(CAST(a AS HUGEINT) * b) AS s2
       |  FROM (SELECT i, a, unnest(q) AS b,
       |          unnest(range(0, len(q))) AS j
       |        FROM l1)
       |  GROUP BY 1, 2),
       |s1 AS MATERIALIZED (
       |  SELECT i, sum(CAST(a AS HUGEINT)) AS s1, count(*) AS n
       |  FROM l1 GROUP BY 1),
       |cmat AS MATERIALIZED (
       |  SELECT c.i, c.j,
       |    (SELECT max(n) FROM s1) * c.s2 - x.s1 * y.s1 AS cv
       |  FROM cells c JOIN s1 x ON c.i = x.i JOIN s1 y ON c.j = y.i),
       |scl AS (
       |  SELECT greatest(CAST(1 AS HUGEINT),
       |                  max(abs(cv)) // 1000000000) AS s
       |  FROM cmat),
       |cs AS MATERIALIZED (
       |  SELECT i, j, cv // (SELECT s FROM scl) AS cv FROM cmat),
       |v0 AS MATERIALIZED (
       |  SELECT i, CAST(1000000 AS HUGEINT) AS val FROM s1),
       |$steps,
       |pick AS (
       |  SELECT i, val FROM v120
       |  ORDER BY abs(val) DESC, i ASC LIMIT 1),
       |sgn AS (
       |  SELECT CASE WHEN (SELECT val FROM pick) < 0 THEN -1
       |              ELSE 1 END AS g),
       |fin AS MATERIALIZED (
       |  SELECT i, val * (SELECT g FROM sgn) AS val FROM v120),
       |nrm AS (
       |  SELECT sqrt(sum(CAST(val AS DOUBLE) * CAST(val AS DOUBLE)))
       |    AS nr,
       |    sum(val * val) AS vtv
       |  FROM fin)""".stripMargin
  }

  /** 120 generated MATERIALIZED power-step CTEs over matrix CTE `mat`
    * with name prefix `tag` (q297's deflated chains; the tag-""
    * instance is inlined in [[pcaOracleCte]]), ending at v{tag}120. */
  private def pcaPowerChainSql(tag: String, mat: String,
                               steps: Int = 120): String =
    (1 to steps).map { k =>
      s"""w$tag$k AS MATERIALIZED (
         |  SELECT c.i, sum(c.cv * v.val) AS w
         |  FROM $mat c JOIN v$tag${k - 1} v ON c.j = v.i GROUP BY 1),
         |m$tag$k AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w$tag$k),
         |v$tag$k AS MATERIALIZED (
         |  SELECT i, (w * 1000000) // (SELECT m FROM m$tag$k)
         |    AS val FROM w$tag$k)""".stripMargin
    }.mkString(",\n")

  /** One deflation round for the q297 oracle: subtract the previous
    * component's Rayleigh outer product off `prevMat` (truncating //),
    * re-scale by max(1, max|·| // 1e9), then run a fresh 120-step
    * chain — sign fix, fin/nrm/ray mirrors of the shared prefix, all
    * suffixed with `tag`. */
  private def pcaDeflateSql(tag: String, prevMat: String,
                            prevFin: String, prevNrm: String,
                            prevRay: String): String =
    s"""csraw$tag AS MATERIALIZED (
       |  SELECT c.i, c.j, c.cv -
       |    (((SELECT r FROM $prevRay) * a.val * b.val) //
       |     ((SELECT vtv FROM $prevNrm) * (SELECT vtv FROM $prevNrm)))
       |    AS cv
       |  FROM $prevMat c JOIN $prevFin a ON c.i = a.i
       |                  JOIN $prevFin b ON c.j = b.i),
       |scl$tag AS (
       |  SELECT greatest(CAST(1 AS HUGEINT),
       |                  max(abs(cv)) // 1000000000) AS s
       |  FROM csraw$tag),
       |cs$tag AS MATERIALIZED (
       |  SELECT i, j, cv // (SELECT s FROM scl$tag) AS cv
       |  FROM csraw$tag),
       |v${tag}0 AS MATERIALIZED (
       |  SELECT i, CAST(1000000 AS HUGEINT) AS val FROM s1),
       |${pcaPowerChainSql(tag, s"cs$tag", steps = 60)},
       |pick$tag AS (
       |  SELECT i, val FROM v${tag}60
       |  ORDER BY abs(val) DESC, i ASC LIMIT 1),
       |sgn$tag AS (
       |  SELECT CASE WHEN (SELECT val FROM pick$tag) < 0 THEN -1
       |              ELSE 1 END AS g),
       |fin$tag AS MATERIALIZED (
       |  SELECT i, val * (SELECT g FROM sgn$tag) AS val
       |  FROM v${tag}60),
       |nrm$tag AS (
       |  SELECT sqrt(sum(CAST(val AS DOUBLE) * CAST(val AS DOUBLE)))
       |    AS nr,
       |    sum(val * val) AS vtv
       |  FROM fin$tag),
       |ray$tag AS (
       |  SELECT sum(c.cv * a.val * b.val) AS r
       |  FROM cs$tag c JOIN fin$tag a ON c.i = a.i
       |                JOIN fin$tag b ON c.j = b.i)""".stripMargin

  /** The cert-slice two-assigner chain shared VERBATIM by the three
    * certification oracles (q370/q376/q380 — one definition, the r18
    * ADVICE discipline applied to the 3.3 KB the texts repeated): the
    * declared <4096 slice e, the hybrid k, cells c, the FLAT assigner
    * asgf, the coarse level (kcv/cc/fa), the routed assigner
    * ac→asgt, norms nv, and the flat side's capped members memf +
    * arrival pairs arrf. PREFIX-PARAMETERIZED (r19, the
    * beamGraphCteOn idiom) so a composing oracle that already uses
    * these CTE names — q390's gate chain defines e/c/cc/fa too — can
    * hold a `p`-prefixed copy side by side; internal qualified
    * references stay short via self-aliases. */
  private[graft] def certSliceCtes(p: String): String =
    s"""${p}e AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
       |      AS xi
       |  FROM embeddings WHERE vec_id <> 0 AND vec_id < 4096),
       |${p}kv AS (SELECT greatest(
       |         CAST(ceil(sqrt(count(*))) AS BIGINT),
       |         CAST((count(*) + 7) // 8 AS BIGINT)) AS k
       |       FROM ${p}e WHERE vec_id % 2 = 0),
       |${p}c AS MATERIALIZED (SELECT vec_id AS cid, xi AS ci
       |      FROM ${p}e, ${p}kv
       |      WHERE vec_id % 2 = 0 AND vec_id <= 2 * k),
       |${p}asgf AS MATERIALIZED (SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (e.xi[j] - c.ci[j]) * (e.xi[j] - c.ci[j])))
       |          AS BIGINT), c.cid) AS rn
       |    FROM ${p}e e, ${p}c c) WHERE rn = 1),
       |${p}kcv AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS kc
       |        FROM ${p}c),
       |${p}cc AS MATERIALIZED (SELECT cid AS ccid, ci AS cci
       |      FROM ${p}c, ${p}kcv WHERE cid <= 2 * kc),
       |${p}fa AS MATERIALIZED (SELECT cid, ccid FROM (
       |    SELECT c.cid, cc.ccid,
       |      row_number() OVER (PARTITION BY c.cid ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (c.ci[j] - cc.cci[j]) * (c.ci[j] - cc.cci[j])))
       |          AS BIGINT), cc.ccid) AS rn
       |    FROM ${p}c c, ${p}cc cc) WHERE rn <= $TwoLevelRep),
       |${p}ac AS MATERIALIZED (SELECT vec_id, ccid FROM (
       |    SELECT e.vec_id, cc.ccid,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (e.xi[j] - cc.cci[j]) * (e.xi[j] - cc.cci[j])))
       |          AS BIGINT), cc.ccid) AS rn
       |    FROM ${p}e e, ${p}cc cc) WHERE rn = 1),
       |${p}asgt AS MATERIALIZED (SELECT vec_id, cid FROM (
       |    SELECT a.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |        CAST(list_sum(list_transform(range(1, 65),
       |          j -> (e.xi[j] - c.ci[j]) * (e.xi[j] - c.ci[j])))
       |          AS BIGINT), c.cid) AS rn
       |    FROM ${p}ac a JOIN ${p}e e ON a.vec_id = e.vec_id
       |         JOIN ${p}fa fa ON fa.ccid = a.ccid
       |         JOIN ${p}c c ON c.cid = fa.cid) WHERE rn = 1),
       |${p}nv AS (SELECT vec_id,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      j -> xi[j] * xi[j])) AS BIGINT) AS nv
       |  FROM ${p}e),
       |${p}memf AS MATERIALIZED (SELECT cid, xi, nv FROM (
       |    SELECT a.cid, e.xi, n.nv,
       |      row_number() OVER (PARTITION BY a.cid
       |                         ORDER BY a.vec_id) AS mrk
       |    FROM ${p}asgf a JOIN ${p}e e ON a.vec_id = e.vec_id
       |         JOIN ${p}nv n ON a.vec_id = n.vec_id
       |    WHERE a.vec_id % 2 = 0)
       |  WHERE mrk <= 8),
       |${p}arrf AS (SELECT a.cid, a.vec_id AS b, e.xi AS xb,
       |    n.nv AS nb
       |  FROM ${p}asgf a JOIN ${p}e e ON a.vec_id = e.vec_id
       |       JOIN ${p}nv n ON a.vec_id = n.vec_id
       |  WHERE a.vec_id % 2 = 1)""".stripMargin

  private lazy val twoLevelCertSliceCtes: String = certSliceCtes("")

  /** q376/q380's shared per-pair strength CTEs over the flat pairs:
    * fp = dot/norms, fq = per-arrival max cross-multiplied band among
    * qualifying pairs (q376's band lines). Prefix-parameterized like
    * [[certSliceCtes]]. */
  private[graft] def certBandCtes(p: String): String =
    s"""${p}fp AS (SELECT r.b,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
       |    m.nv AS na, r.nb
       |  FROM ${p}arrf r JOIN ${p}memf m ON r.cid = m.cid),
       |${p}fq AS MATERIALIZED (SELECT b,
       |    max(CASE
       |      WHEN CAST(dot AS HUGEINT) * dot * 10000 >=
       |           CAST(na AS HUGEINT) * nb * 8100 THEN 4
       |      WHEN CAST(dot AS HUGEINT) * dot * 10000 >=
       |           CAST(na AS HUGEINT) * nb * 4900 THEN 3
       |      WHEN CAST(dot AS HUGEINT) * dot * 10000 >=
       |           CAST(na AS HUGEINT) * nb * 2500 THEN 2
       |      ELSE 1 END) AS band
       |  FROM ${p}fp
       |  WHERE dot > 0 AND
       |    CAST(dot AS HUGEINT) * dot * 10000 >=
       |      CAST(na AS HUGEINT) * nb * 1600
       |  GROUP BY b)""".stripMargin

  private lazy val twoLevelCertBandCtes: String = certBandCtes("")

  /** The two-level side's capped members memt / arrival pairs arrt /
    * flagged set flt — shared verbatim by all three cert oracles.
    * Prefix-parameterized like [[certSliceCtes]]. */
  private def certFlagCtes(p: String): String =
    s"""${p}memt AS MATERIALIZED (SELECT cid, xi, nv FROM (
       |    SELECT a.cid, e.xi, n.nv,
       |      row_number() OVER (PARTITION BY a.cid
       |                         ORDER BY a.vec_id) AS mrk
       |    FROM ${p}asgt a JOIN ${p}e e ON a.vec_id = e.vec_id
       |         JOIN ${p}nv n ON a.vec_id = n.vec_id
       |    WHERE a.vec_id % 2 = 0)
       |  WHERE mrk <= 8),
       |${p}arrt AS (SELECT a.cid, a.vec_id AS b, e.xi AS xb,
       |    n.nv AS nb
       |  FROM ${p}asgt a JOIN ${p}e e ON a.vec_id = e.vec_id
       |       JOIN ${p}nv n ON a.vec_id = n.vec_id
       |  WHERE a.vec_id % 2 = 1),
       |${p}flt AS MATERIALIZED (SELECT DISTINCT b FROM (
       |    SELECT r.b,
       |      CAST(list_sum(list_transform(range(1, 65),
       |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
       |      m.nv AS na, r.nb
       |    FROM ${p}arrt r JOIN ${p}memt m ON r.cid = m.cid)
       |  WHERE dot > 0 AND
       |    CAST(dot AS HUGEINT) * dot * 10000 >=
       |      CAST(na AS HUGEINT) * nb * 1600)""".stripMargin

  private lazy val twoLevelCertFlagCtes: String = certFlagCtes("")

  def oracles: Map[String, String] = {
    val sigSql = (0 until Planes).map { p =>
      val dot = s"""list_sum(list_transform(range(1, 65),
                   | i -> CAST(embedding[i] AS DOUBLE) *
                   |      (CAST(((i - 1 + ${p * 64}) * 2654435761) % 1000 AS DOUBLE) / 1000 - 0.5)))"""
        .stripMargin.replaceAll("\n", " ")
      s"CASE WHEN $dot > 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")
    def bandEq(l: String, r: String) = (0 until Bands).map { b =>
      s"substr($l, ${1 + b * BandBits}, $BandBits) = substr($r, ${1 + b * BandBits}, $BandBits)"
    }.mkString("(", " OR ", ")")
    // q175/q187: every numeric literal is forced DOUBLE before
    // arithmetic (a bare 0.5 is DECIMAL in DuckDB and its arithmetic
    // diverges); the three per-term sums add in the same fixed order as
    // the Spark conditional sums. ONE oracle text, TWO computation
    // paths (from-scratch q175, index-probe q187) — the q82/q108
    // discipline.
    val bm25Sql = {
        val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
        val sumOrder = Bm25Terms.map(t =>
          s"coalesce(sum(sc) FILTER (WHERE t = '$t'), CAST(0 AS DOUBLE))")
          .mkString("\n           |  + ")
        s"""WITH toks AS (
           |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
           |d AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
           |st AS (SELECT count(*) AS n_docs, sum(dl) AS tot_len FROM d),
           |f AS (SELECT doc_id, t, count(*) AS tf FROM (
           |        SELECT doc_id, unnest(tk) AS t FROM toks)
           |      WHERE t IN ($termList) GROUP BY 1, 2),
           |dfr AS (SELECT t, count(*) AS df FROM f GROUP BY 1),
           |scd AS (SELECT f.doc_id, f.t,
           |    round(ln((CAST(st.n_docs - dfr.df AS DOUBLE) + 0.5) /
           |             (CAST(dfr.df AS DOUBLE) + 0.5) + 1.0), 6)
           |    * (CAST(f.tf AS DOUBLE) * 2.2)
           |    / (CAST(f.tf AS DOUBLE) + 1.2 *
           |       (0.25 + 0.75 * (CAST(d.dl * st.n_docs AS DOUBLE) /
           |                       CAST(st.tot_len AS DOUBLE)))) AS sc
           |  FROM f JOIN d USING (doc_id) JOIN dfr USING (t) CROSS JOIN st)
           |SELECT doc_id, count(*) AS n_terms,
           |  round($sumOrder, 4) AS score
           |FROM scd GROUP BY doc_id
           |ORDER BY score DESC, doc_id LIMIT $Bm25K""".stripMargin
    }
    // ONE phrase oracle, THREE computation paths (inline-scan q354,
    // index-probe q358, standing-index+batch q359) — bm25Sql's rule
    // at the positional tier
    val phraseSql = {
        val terms = PhraseQueries.flatMap(p => Seq(p._1, p._2))
          .distinct.map(t => s"'$t'").mkString(", ")
        val ph = PhraseQueries.map { case (w1, w2) =>
          s"""SELECT '$w1 $w2' AS phrase, a.doc_id,
             |    count(*) AS hits
             |  FROM pos a JOIN pos b
             |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             |  WHERE a.t = '$w1' AND b.t = '$w2'
             |  GROUP BY a.doc_id""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
           |           FROM documents),
           |pos AS MATERIALIZED (
           |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, toks[u.i] AS t
           |  FROM tk, unnest(range(1, len(toks) + 1)) u(i)
           |  WHERE toks[u.i] IN ($terms)),
           |ph AS (
           |$ph)
           |SELECT phrase, doc_id, hits, CAST(rk AS BIGINT) AS rnk
           |FROM (SELECT *, row_number() OVER (PARTITION BY phrase
           |        ORDER BY hits DESC, doc_id) AS rk FROM ph)
           |WHERE rk <= 5 ORDER BY phrase, rnk""".stripMargin
    }
    val base = Map(
      "q175_bm25" -> bm25Sql,

      // positional postings restated; adjacency = pos+1 equi-join
      "q354_phrase_search" -> phraseSql,
      "q358_phrase_index" -> phraseSql,
      "q359_phrase_incremental" -> phraseSql,
      "q187_bm25_index" -> bm25Sql,
      "q188_bm25_incremental" -> bm25Sql,

      "q52_lsh_buckets" ->
        s"""SELECT sig, count(*) AS cnt, min(vec_id) AS min_vec
           |FROM (SELECT vec_id, $sigSql AS sig FROM embeddings)
           |GROUP BY sig ORDER BY sig""".stripMargin,

      // identical sims, identical 8-NN graph, then annHop's shared
      // text unrolled through MATERIALIZED beam CTEs
      "q329_ann_beam" ->
        s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
           |           FROM embeddings WHERE vec_id = 0),
           |e AS MATERIALIZED (SELECT vec_id, v, mr FROM (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
           |                       vec_id) AS mr
           |  FROM embeddings WHERE vec_id <> 0) WHERE mr <= 4096),
           |sims AS MATERIALIZED (
           |  SELECT vec_id AS id, mr,
           |    round(list_cosine_similarity(v, q.qv), 4) AS sim
           |  FROM e, q),
           |g0 AS (SELECT x.vec_id AS src, y.vec_id AS dst,
           |    round(list_cosine_similarity(x.v, y.v), 4) AS es
           |  FROM e x JOIN e y ON x.vec_id <> y.vec_id),
           |graph AS MATERIALIZED (SELECT src, dst FROM (
           |  SELECT src, dst,
           |    row_number() OVER (PARTITION BY src
           |                       ORDER BY es DESC, dst) AS rk
           |  FROM g0) WHERE rk <= 8),
           |bm0 AS (SELECT id, sim FROM sims WHERE mr = 1),
           |${annHop(1, "graph", "bm0", "sims")},
           |${annHop(2, "graph", "bm1", "sims")},
           |${annHop(3, "graph", "bm2", "sims")},
           |ex AS (SELECT id FROM sims ORDER BY sim DESC, id LIMIT 4)
           |SELECT CAST(row_number() OVER (ORDER BY b.sim DESC, b.id)
           |            AS BIGINT) AS rank,
           |  b.id AS vec_id, b.sim,
           |  CAST(b.id IN (SELECT id FROM ex) AS INT) AS in_exact_top4
           |FROM bm3 b ORDER BY rank""".stripMargin,

      // the IVF graph build restated (2-cell memberships, lowest-id
      // hubs, symmetric scored edges, per-src top-8), then annHop's
      // shared text unrolled — the artifact must be invisible
      "q342_ann_graph_beam" ->
        s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
           |           FROM embeddings WHERE vec_id = 0),
           |$beamGraphCte,
           |ns AS (SELECT src AS id FROM graph
           |       UNION SELECT dst FROM graph),
           |sims AS MATERIALIZED (
           |  SELECT ns.id,
           |    round(list_cosine_similarity(e.v, q.qv), 4) AS sim
           |  FROM ns JOIN e ON ns.id = e.vec_id, q),
           |b0 AS (SELECT id, sim FROM sims
           |       ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 1),
           |${annHop(1, "graph", "b0", "sims")},
           |${annHop(2, "graph", "bm1", "sims")},
           |${annHop(3, "graph", "bm2", "sims")},
           |ex AS (SELECT id FROM sims ORDER BY sim DESC, id LIMIT 4)
           |SELECT CAST(row_number() OVER (ORDER BY b.sim DESC, b.id)
           |            AS BIGINT) AS rank,
           |  b.id AS vec_id, b.sim,
           |  CAST(b.id IN (SELECT id FROM ex) AS INT) AS in_exact_top4
           |FROM bm3 b ORDER BY rank""".stripMargin,

      // the shared build CTE, then the 2-hop candidate union and the
      // per-src top-8 rescore restated
      "q343_nn_descent" ->
        s"""WITH $beamGraphCte,
           |cd AS (SELECT g1.src, g2.dst AS cnd
           |       FROM graph g1 JOIN graph g2 ON g1.dst = g2.src
           |       WHERE g1.src <> g2.dst
           |       UNION SELECT src, dst FROM graph),
           |sc2 AS (SELECT cd.src, cd.cnd AS dst,
           |    round(list_cosine_similarity(x.v, y.v), 4) AS es
           |  FROM cd JOIN e x ON cd.src = x.vec_id
           |          JOIN e y ON cd.cnd = y.vec_id)
           |SELECT src, CAST(rk AS BIGINT) AS nn_rank, dst, es FROM (
           |  SELECT *, row_number() OVER (PARTITION BY src
           |                               ORDER BY es DESC, dst) AS rk
           |  FROM sc2)
           |WHERE rk <= 8 ORDER BY src, nn_rank""".stripMargin,

      // one full build, one refinement, one even build + insert, one
      // exact pass — all three tiers attest against the identical
      // anchor top-8
      "q344_graph_recall" ->
        s"""WITH $beamGraphCte,
           |cd AS (SELECT g1.src, g2.dst AS cnd
           |       FROM graph g1 JOIN graph g2 ON g1.dst = g2.src
           |       WHERE g1.src <> g2.dst
           |       UNION SELECT src, dst FROM graph),
           |rg AS (SELECT src, dst FROM (
           |    SELECT cd.src, cd.cnd AS dst,
           |      row_number() OVER (PARTITION BY cd.src ORDER BY
           |        round(list_cosine_similarity(x.v, y.v), 4) DESC,
           |        cd.cnd) AS rk
           |    FROM cd JOIN e x ON cd.src = x.vec_id
           |            JOIN e y ON cd.cnd = y.vec_id)
           |  WHERE rk <= 8),
           |${beamGraphCteOn("i", " AND vec_id % 2 = 0",
                             s"vec_id < ${2 * Cents}")},
           |${graphInsertCte("i")},
           |anch AS (SELECT vec_id AS qid, v AS qv FROM e
           |         ORDER BY vec_id LIMIT 64),
           |ex AS (SELECT qid, dst FROM (
           |    SELECT a.qid, e.vec_id AS dst,
           |      row_number() OVER (PARTITION BY a.qid ORDER BY
           |        round(list_cosine_similarity(e.v, a.qv), 4) DESC,
           |        e.vec_id) AS rk
           |    FROM e, anch a WHERE e.vec_id <> a.qid)
           |  WHERE rk <= 8),
           |t1 AS (SELECT g.src, g.dst FROM graph g
           |       JOIN anch a ON g.src = a.qid),
           |t2 AS (SELECT g.src, g.dst FROM rg g
           |       JOIN anch a ON g.src = a.qid),
           |t3 AS (SELECT g.src, g.dst FROM imrg g
           |       JOIN anch a ON g.src = a.qid)
           |SELECT tier, anchor_edges, exact_pairs, hits,
           |  CASE WHEN exact_pairs = 0 THEN 0
           |       ELSE (1000000 * hits) // exact_pairs END AS recall_ppm
           |FROM (
           |  SELECT 'ivf_build' AS tier,
           |    (SELECT count(*) FROM t1) AS anchor_edges,
           |    (SELECT count(*) FROM ex) AS exact_pairs,
           |    (SELECT count(*) FROM t1 JOIN ex
           |       ON t1.src = ex.qid AND t1.dst = ex.dst) AS hits
           |  UNION ALL
           |  SELECT 'nn_descent_1',
           |    (SELECT count(*) FROM t2),
           |    (SELECT count(*) FROM ex),
           |    (SELECT count(*) FROM t2 JOIN ex
           |       ON t2.src = ex.qid AND t2.dst = ex.dst)
           |  UNION ALL
           |  SELECT 'graph_insert',
           |    (SELECT count(*) FROM t3),
           |    (SELECT count(*) FROM ex),
           |    (SELECT count(*) FROM t3 JOIN ex
           |       ON t3.src = ex.qid AND t3.dst = ex.dst))
           |ORDER BY tier""".stripMargin,

      // the three promoted versions' edge sets restated from the
      // shared build/descent/insert text — the manifest log must be
      // invisible: a committed version IS its tier's edge list
      "q357_graph_promote" ->
        s"""WITH $beamGraphCte,
           |cd AS (SELECT g1.src, g2.dst AS cnd
           |       FROM graph g1 JOIN graph g2 ON g1.dst = g2.src
           |       WHERE g1.src <> g2.dst
           |       UNION SELECT src, dst FROM graph),
           |rg AS (SELECT src, dst FROM (
           |    SELECT cd.src, cd.cnd AS dst,
           |      row_number() OVER (PARTITION BY cd.src ORDER BY
           |        round(list_cosine_similarity(x.v, y.v), 4) DESC,
           |        cd.cnd) AS rk
           |    FROM cd JOIN e x ON cd.src = x.vec_id
           |            JOIN e y ON cd.cnd = y.vec_id)
           |  WHERE rk <= 8),
           |${beamGraphCteOn("i", " AND vec_id % 2 = 0",
                             s"vec_id < ${2 * Cents}")},
           |${graphInsertCte("i")}
           |SELECT * FROM (
           |  SELECT CAST(1 AS BIGINT) AS version, 'ivf_build' AS tier,
           |    (SELECT count(*) FROM graph) AS edges,
           |    (SELECT count(DISTINCT src) FROM graph) AS srcs
           |  UNION ALL
           |  SELECT CAST(2 AS BIGINT), 'nn_descent_1',
           |    (SELECT count(*) FROM rg),
           |    (SELECT count(DISTINCT src) FROM rg)
           |  UNION ALL
           |  SELECT CAST(3 AS BIGINT), 'graph_insert',
           |    (SELECT count(*) FROM imrg),
           |    (SELECT count(DISTINCT src) FROM imrg))
           |ORDER BY version""".stripMargin,

      // the even standing build restated, then the insert: batch cell
      // assignment, hub + hub-neighbor candidates, per-src top-8, and
      // the stored-score standing merge — the artifact must be
      // invisible
      "q350_graph_insert" ->
        s"""WITH ${beamGraphCteOn("", " AND vec_id % 2 = 0",
                                  s"vec_id < ${2 * Cents}")},
           |${graphInsertCte("")}
           |SELECT src,
           |  CAST(row_number() OVER (PARTITION BY src
           |                          ORDER BY es DESC, dst)
           |       AS BIGINT) AS nn_rank,
           |  dst, es
           |FROM mrg ORDER BY src, nn_rank""".stripMargin,

      // three unrolled descent rounds over the shared build, exact
      // per-round turnover + anchor recall, and the same stop rule:
      // a round's row survives only if every EARLIER round's turnover
      // was at or above the threshold
      "q351_descent_converge" ->
        s"""WITH $beamGraphCte,
           |${descentCte(1, "graph")},
           |${descentCte(2, "g1")},
           |${descentCte(3, "g2")},
           |anch AS (SELECT vec_id AS qid, v AS qv FROM e
           |         ORDER BY vec_id LIMIT 64),
           |ex AS MATERIALIZED (SELECT qid, dst FROM (
           |    SELECT a.qid, e.vec_id AS dst,
           |      row_number() OVER (PARTITION BY a.qid ORDER BY
           |        round(list_cosine_similarity(e.v, a.qv), 4) DESC,
           |        e.vec_id) AS rk
           |    FROM e, anch a WHERE e.vec_id <> a.qid)
           |  WHERE rk <= 8),
           |st AS (
           |  SELECT 1 AS round,
           |    (SELECT count(*) FROM g1) AS edges,
           |    (SELECT count(*) FROM g1 a WHERE NOT EXISTS (
           |       SELECT 1 FROM graph b
           |       WHERE b.src = a.src AND b.dst = a.dst)) AS changed,
           |    (SELECT count(*) FROM g1 a JOIN ex
           |       ON a.src = ex.qid AND a.dst = ex.dst) AS hits
           |  UNION ALL
           |  SELECT 2, (SELECT count(*) FROM g2),
           |    (SELECT count(*) FROM g2 a WHERE NOT EXISTS (
           |       SELECT 1 FROM g1 b
           |       WHERE b.src = a.src AND b.dst = a.dst)),
           |    (SELECT count(*) FROM g2 a JOIN ex
           |       ON a.src = ex.qid AND a.dst = ex.dst)
           |  UNION ALL
           |  SELECT 3, (SELECT count(*) FROM g3),
           |    (SELECT count(*) FROM g3 a WHERE NOT EXISTS (
           |       SELECT 1 FROM g2 b
           |       WHERE b.src = a.src AND b.dst = a.dst)),
           |    (SELECT count(*) FROM g3 a JOIN ex
           |       ON a.src = ex.qid AND a.dst = ex.dst)),
           |fin AS (SELECT round, edges, changed,
           |    CASE WHEN edges = 0 THEN 0
           |         ELSE (1000000 * changed) // edges END AS update_ppm,
           |    CASE WHEN (SELECT count(*) FROM ex) = 0 THEN 0
           |         ELSE (1000000 * hits) // (SELECT count(*) FROM ex)
           |         END AS recall_ppm
           |  FROM st)
           |SELECT CAST(round AS BIGINT) AS round,
           |  CAST(edges AS BIGINT) AS edges,
           |  CAST(changed AS BIGINT) AS changed,
           |  CAST(update_ppm AS BIGINT) AS update_ppm,
           |  CAST(recall_ppm AS BIGINT) AS recall_ppm
           |FROM fin f
           |WHERE NOT EXISTS (SELECT 1 FROM fin f2
           |  WHERE f2.round < f.round
           |    AND f2.update_ppm < $DescentStopPpm)
           |ORDER BY round""".stripMargin,

      // the in-frame k, the 2k-lowest-even-id cell cut, the lattice
      // argmin assignment, the member cap, and the exact dup
      // predicate restated per cell
      // q355's census text at the hybrid k and the synthetic cap 8,
      // plus the capped flag
      "q367_semdedup_capaware" ->
        s"""WITH e AS MATERIALIZED (SELECT vec_id,
           |    list_transform(embedding,
           |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
           |      AS xi
           |  FROM embeddings WHERE vec_id <> 0 AND vec_id < 4096),
           |kv AS (SELECT greatest(
           |         CAST(ceil(sqrt(count(*))) AS BIGINT),
           |         CAST((count(*) + 7) // 8 AS BIGINT)) AS k
           |       FROM e WHERE vec_id % 2 = 0),
           |c AS (SELECT vec_id AS cid, xi AS ci FROM e, kv
           |      WHERE vec_id % 2 = 0 AND vec_id <= 2 * k),
           |d0 AS (SELECT e.vec_id, c.cid,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> (e.xi[j] - c.ci[j]) * (e.xi[j] - c.ci[j])))
           |      AS BIGINT) AS dist
           |  FROM e, c),
           |asg AS MATERIALIZED (SELECT vec_id, cid FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |                                 ORDER BY dist, cid) AS rn
           |    FROM d0) WHERE rn = 1),
           |nv AS (SELECT vec_id,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> xi[j] * xi[j])) AS BIGINT) AS nv
           |  FROM e),
           |mem AS MATERIALIZED (SELECT cid, vec_id, xi, nv FROM (
           |    SELECT a.cid, a.vec_id, e.xi, n.nv,
           |      row_number() OVER (PARTITION BY a.cid
           |                         ORDER BY a.vec_id) AS mrk
           |    FROM asg a JOIN e ON a.vec_id = e.vec_id
           |         JOIN nv n ON a.vec_id = n.vec_id
           |    WHERE a.vec_id % 2 = 0)
           |  WHERE mrk <= 8),
           |arr AS (SELECT a.cid, a.vec_id AS b, e.xi AS xb, n.nv AS nb
           |  FROM asg a JOIN e ON a.vec_id = e.vec_id
           |       JOIN nv n ON a.vec_id = n.vec_id
           |  WHERE a.vec_id % 2 = 1),
           |dp AS (SELECT cid, count(*) AS dup_pairs,
           |    count(DISTINCT b) AS dropped
           |  FROM (SELECT m.cid, r.b,
           |      CAST(list_sum(list_transform(range(1, 65),
           |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
           |      m.nv AS na, r.nb
           |    FROM arr r JOIN mem m ON r.cid = m.cid)
           |  WHERE dot > 0 AND
           |    CAST(dot AS HUGEINT) * dot * 10000 >=
           |      CAST(na AS HUGEINT) * nb * 1600
           |  GROUP BY cid)
           |SELECT c.cid,
           |  CAST(coalesce(ms.standing, 0) AS BIGINT) AS standing,
           |  CAST(coalesce(ar.arrivals, 0) AS BIGINT) AS arrivals,
           |  CAST(coalesce(dp.dup_pairs, 0) AS BIGINT) AS dup_pairs,
           |  CAST(coalesce(dp.dropped, 0) AS BIGINT) AS dropped,
           |  CAST(CASE WHEN coalesce(ar.arrivals, 0) = 0 THEN 1000000
           |       ELSE (1000000 * (ar.arrivals - coalesce(dp.dropped, 0)))
           |            // ar.arrivals END AS BIGINT) AS keep_ppm,
           |  CAST(CASE WHEN coalesce(ms.standing, 0) = 8 THEN 1 ELSE 0
           |       END AS BIGINT) AS capped
           |FROM c
           |LEFT JOIN (SELECT cid, count(*) AS standing FROM mem
           |           GROUP BY cid) ms ON c.cid = ms.cid
           |LEFT JOIN (SELECT cid, count(*) AS arrivals FROM arr
           |           GROUP BY cid) ar ON c.cid = ar.cid
           |LEFT JOIN dp ON c.cid = dp.cid
           |ORDER BY c.cid""".stripMargin,

      // q367's census text on the FULL corpus with the assignment
      // restated coarse-then-fine: kc = ⌈√k⌉ coarse cells (the 2kc
      // lowest fine cids), fine cells route to their nearest coarse
      // cell once (fa), every vector picks a coarse cell (ac) then
      // argmins over only that coarse cell's fine cells — ties to the
      // lower id at both levels, the kernel's rule
      "q369_twolevel_assign" ->
        s"""WITH e AS MATERIALIZED (SELECT vec_id,
           |    list_transform(embedding,
           |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
           |      AS xi
           |  FROM embeddings WHERE vec_id <> 0),
           |kv AS (SELECT greatest(
           |         CAST(ceil(sqrt(count(*))) AS BIGINT),
           |         CAST((count(*) + 7) // 8 AS BIGINT)) AS k
           |       FROM e WHERE vec_id % 2 = 0),
           |c AS MATERIALIZED (SELECT vec_id AS cid, xi AS ci FROM e, kv
           |      WHERE vec_id % 2 = 0 AND vec_id <= 2 * k),
           |kcv AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS kc
           |        FROM c),
           |cc AS MATERIALIZED (SELECT cid AS ccid, ci AS cci
           |      FROM c, kcv WHERE cid <= 2 * kc),
           |fa AS MATERIALIZED (SELECT cid, ccid FROM (
           |    SELECT c.cid, cc.ccid,
           |      row_number() OVER (PARTITION BY c.cid ORDER BY
           |        CAST(list_sum(list_transform(range(1, 65),
           |          j -> (c.ci[j] - cc.cci[j]) * (c.ci[j] - cc.cci[j])))
           |          AS BIGINT), cc.ccid) AS rn
           |    FROM c, cc) WHERE rn <= $TwoLevelRep),
           |ac AS MATERIALIZED (SELECT vec_id, ccid FROM (
           |    SELECT e.vec_id, cc.ccid,
           |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |        CAST(list_sum(list_transform(range(1, 65),
           |          j -> (e.xi[j] - cc.cci[j]) * (e.xi[j] - cc.cci[j])))
           |          AS BIGINT), cc.ccid) AS rn
           |    FROM e, cc) WHERE rn = 1),
           |asg AS MATERIALIZED (SELECT vec_id, cid FROM (
           |    SELECT a.vec_id, c.cid,
           |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
           |        CAST(list_sum(list_transform(range(1, 65),
           |          j -> (e.xi[j] - c.ci[j]) * (e.xi[j] - c.ci[j])))
           |          AS BIGINT), c.cid) AS rn
           |    FROM ac a JOIN e ON a.vec_id = e.vec_id
           |         JOIN fa ON fa.ccid = a.ccid
           |         JOIN c ON c.cid = fa.cid) WHERE rn = 1),
           |nv AS (SELECT vec_id,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> xi[j] * xi[j])) AS BIGINT) AS nv
           |  FROM e),
           |mem AS MATERIALIZED (SELECT cid, vec_id, xi, nv FROM (
           |    SELECT a.cid, a.vec_id, e.xi, n.nv,
           |      row_number() OVER (PARTITION BY a.cid
           |                         ORDER BY a.vec_id) AS mrk
           |    FROM asg a JOIN e ON a.vec_id = e.vec_id
           |         JOIN nv n ON a.vec_id = n.vec_id
           |    WHERE a.vec_id % 2 = 0)
           |  WHERE mrk <= 8),
           |arr AS (SELECT a.cid, a.vec_id AS b, e.xi AS xb, n.nv AS nb
           |  FROM asg a JOIN e ON a.vec_id = e.vec_id
           |       JOIN nv n ON a.vec_id = n.vec_id
           |  WHERE a.vec_id % 2 = 1),
           |dp AS (SELECT cid, count(*) AS dup_pairs,
           |    count(DISTINCT b) AS dropped
           |  FROM (SELECT m.cid, r.b,
           |      CAST(list_sum(list_transform(range(1, 65),
           |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
           |      m.nv AS na, r.nb
           |    FROM arr r JOIN mem m ON r.cid = m.cid)
           |  WHERE dot > 0 AND
           |    CAST(dot AS HUGEINT) * dot * 10000 >=
           |      CAST(na AS HUGEINT) * nb * 1600
           |  GROUP BY cid)
           |SELECT c.cid,
           |  CAST(coalesce(ms.standing, 0) AS BIGINT) AS standing,
           |  CAST(coalesce(ar.arrivals, 0) AS BIGINT) AS arrivals,
           |  CAST(coalesce(dp.dup_pairs, 0) AS BIGINT) AS dup_pairs,
           |  CAST(coalesce(dp.dropped, 0) AS BIGINT) AS dropped,
           |  CAST(CASE WHEN coalesce(ar.arrivals, 0) = 0 THEN 1000000
           |       ELSE (1000000 * (ar.arrivals - coalesce(dp.dropped, 0)))
           |            // ar.arrivals END AS BIGINT) AS keep_ppm,
           |  CAST(CASE WHEN coalesce(ms.standing, 0) = 8 THEN 1 ELSE 0
           |       END AS BIGINT) AS capped
           |FROM c
           |LEFT JOIN (SELECT cid, count(*) AS standing FROM mem
           |           GROUP BY cid) ms ON c.cid = ms.cid
           |LEFT JOIN (SELECT cid, count(*) AS arrivals FROM arr
           |           GROUP BY cid) ar ON c.cid = ar.cid
           |LEFT JOIN dp ON c.cid = dp.cid
           |ORDER BY c.cid""".stripMargin,

      // both assigners restated over the declared slice; the flagged
      // sets and the assignment-agreement summary fold into one row
      "q370_twolevel_recall" ->
        s"""WITH $twoLevelCertSliceCtes,
           |flf AS MATERIALIZED (SELECT DISTINCT b FROM (
           |    SELECT r.b,
           |      CAST(list_sum(list_transform(range(1, 65),
           |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
           |      m.nv AS na, r.nb
           |    FROM arrf r JOIN memf m ON r.cid = m.cid)
           |  WHERE dot > 0 AND
           |    CAST(dot AS HUGEINT) * dot * 10000 >=
           |      CAST(na AS HUGEINT) * nb * 1600),
           |$twoLevelCertFlagCtes,
           |ag AS (SELECT count(*) AS vectors,
           |    sum(CASE WHEN f.cid = t.cid THEN 1 ELSE 0 END) AS agree
           |  FROM asgf f JOIN asgt t ON f.vec_id = t.vec_id)
           |SELECT CAST(vectors AS BIGINT) AS vectors,
           |  CAST(agree AS BIGINT) AS agree,
           |  CAST(CASE WHEN vectors = 0 THEN 0
           |       ELSE (1000000 * agree) // vectors END AS BIGINT)
           |    AS agree_ppm,
           |  CAST((SELECT count(*) FROM flf) AS BIGINT) AS flat_flagged,
           |  CAST((SELECT count(*) FROM flt) AS BIGINT) AS two_flagged,
           |  CAST((SELECT count(*) FROM flt
           |        WHERE b IN (SELECT b FROM flf)) AS BIGINT)
           |    AS both_flagged,
           |  CAST(CASE WHEN (SELECT count(*) FROM flf) = 0 THEN 0
           |       ELSE (1000000 * (SELECT count(*) FROM flt
           |                        WHERE b IN (SELECT b FROM flf)))
           |            // (SELECT count(*) FROM flf) END AS BIGINT)
           |    AS recall_ppm
           |FROM ag""".stripMargin,

      // q370's two-assigner text; the flat side keeps per-pair
      // strength and folds to a per-arrival max band by the same
      // cross-multiplied lines, then recall per band vs the
      // two-level flagged set
      "q376_twolevel_bands" ->
        s"""WITH $twoLevelCertSliceCtes,
           |$twoLevelCertBandCtes,
           |$twoLevelCertFlagCtes
           |SELECT CAST(band AS BIGINT) AS band,
           |  count(*) AS flat_flagged,
           |  CAST(sum(CASE WHEN b IN (SELECT b FROM flt)
           |                THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           |  CAST((1000000 * sum(CASE WHEN b IN (SELECT b FROM flt)
           |                           THEN 1 ELSE 0 END)) // count(*)
           |       AS BIGINT) AS recall_ppm
           |FROM fq GROUP BY band ORDER BY band""".stripMargin,

      // literals (R, probes, ceiling, entry bytes, pinned version) +
      // the full two-assigner recompute: q370's agreement/recall and
      // q376's band-1 recall folded into the one config row; an empty
      // band 1 reads vacuously-kept 10⁶ (the declared convention)
      "q380_router_config" ->
        s"""WITH $twoLevelCertSliceCtes,
           |$twoLevelCertBandCtes,
           |$twoLevelCertFlagCtes,
           |ag AS (SELECT count(*) AS vectors,
           |    sum(CASE WHEN f.cid = t.cid THEN 1 ELSE 0 END) AS agree
           |  FROM asgf f JOIN asgt t ON f.vec_id = t.vec_id)
           |SELECT CAST($TwoLevelRep AS BIGINT) AS rep_r,
           |  CAST(1 AS BIGINT) AS coarse_probes,
           |  CAST($TwoLevelBroadcastCeilingBytes AS BIGINT)
           |    AS switch_ceiling_bytes,
           |  CAST($TwoLevelFineEntryBytes AS BIGINT) AS fine_entry_bytes,
           |  CAST(${graft.streaming.StreamOps.GateProdInitialPin}
           |       AS BIGINT) AS model_version,
           |  CAST(vectors AS BIGINT) AS vectors,
           |  CAST(CASE WHEN vectors = 0 THEN 0
           |       ELSE (1000000 * agree) // vectors END AS BIGINT)
           |    AS agree_ppm,
           |  CAST(CASE WHEN (SELECT count(*) FROM fq) = 0 THEN 0
           |       ELSE (1000000 * (SELECT count(*) FROM fq
           |                        WHERE b IN (SELECT b FROM flt)))
           |            // (SELECT count(*) FROM fq) END AS BIGINT)
           |    AS recall_ppm,
           |  CAST(coalesce((SELECT CASE WHEN count(*) = 0 THEN NULL
           |       ELSE (1000000 * sum(CASE WHEN b IN (SELECT b FROM flt)
           |                                THEN 1 ELSE 0 END))
           |            // count(*) END
           |       FROM fq WHERE band = 1), 1000000) AS BIGINT)
           |    AS borderline_recall_ppm
           |FROM ag""".stripMargin,

      "q355_semdedup_cells" ->
        s"""WITH e AS MATERIALIZED (SELECT vec_id,
           |    list_transform(embedding,
           |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
           |      AS xi
           |  FROM embeddings WHERE vec_id <> 0),
           |kv AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS k
           |       FROM e WHERE vec_id % 2 = 0),
           |c AS (SELECT vec_id AS cid, xi AS ci FROM e, kv
           |      WHERE vec_id % 2 = 0 AND vec_id <= 2 * k),
           |d0 AS (SELECT e.vec_id, c.cid,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> (e.xi[j] - c.ci[j]) * (e.xi[j] - c.ci[j])))
           |      AS BIGINT) AS dist
           |  FROM e, c),
           |asg AS MATERIALIZED (SELECT vec_id, cid FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |                                 ORDER BY dist, cid) AS rn
           |    FROM d0) WHERE rn = 1),
           |nv AS (SELECT vec_id,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> xi[j] * xi[j])) AS BIGINT) AS nv
           |  FROM e),
           |mem AS MATERIALIZED (SELECT cid, vec_id, xi, nv FROM (
           |    SELECT a.cid, a.vec_id, e.xi, n.nv,
           |      row_number() OVER (PARTITION BY a.cid
           |                         ORDER BY a.vec_id) AS mrk
           |    FROM asg a JOIN e ON a.vec_id = e.vec_id
           |         JOIN nv n ON a.vec_id = n.vec_id
           |    WHERE a.vec_id % 2 = 0)
           |  WHERE mrk <= $SemDedupClusterCap),
           |arr AS (SELECT a.cid, a.vec_id AS b, e.xi AS xb, n.nv AS nb
           |  FROM asg a JOIN e ON a.vec_id = e.vec_id
           |       JOIN nv n ON a.vec_id = n.vec_id
           |  WHERE a.vec_id % 2 = 1),
           |dp AS (SELECT cid, count(*) AS dup_pairs,
           |    count(DISTINCT b) AS dropped
           |  FROM (SELECT m.cid, r.b,
           |      CAST(list_sum(list_transform(range(1, 65),
           |        j -> m.xi[j] * r.xb[j])) AS BIGINT) AS dot,
           |      m.nv AS na, r.nb
           |    FROM arr r JOIN mem m ON r.cid = m.cid)
           |  WHERE dot > 0 AND
           |    CAST(dot AS HUGEINT) * dot * 10000 >=
           |      CAST(na AS HUGEINT) * nb * 1600
           |  GROUP BY cid)
           |SELECT c.cid,
           |  CAST(coalesce(ms.standing, 0) AS BIGINT) AS standing,
           |  CAST(coalesce(ar.arrivals, 0) AS BIGINT) AS arrivals,
           |  CAST(coalesce(dp.dup_pairs, 0) AS BIGINT) AS dup_pairs,
           |  CAST(coalesce(dp.dropped, 0) AS BIGINT) AS dropped,
           |  CAST(CASE WHEN coalesce(ar.arrivals, 0) = 0 THEN 1000000
           |       ELSE (1000000 * (ar.arrivals - coalesce(dp.dropped, 0)))
           |            // ar.arrivals END AS BIGINT) AS keep_ppm
           |FROM c
           |LEFT JOIN (SELECT cid, count(*) AS standing FROM mem
           |           GROUP BY cid) ms ON c.cid = ms.cid
           |LEFT JOIN (SELECT cid, count(*) AS arrivals FROM arr
           |           GROUP BY cid) ar ON c.cid = ar.cid
           |LEFT JOIN dp ON c.cid = dp.cid
           |ORDER BY c.cid""".stripMargin,

      // truncated-prefix tiers restated with list slices; the dims=64
      // row is definitionally the truth joined to itself
      "q352_mrl_recall" -> {
        def tk(k: Int): String =
          s"""tk$k AS (SELECT qid, dst FROM (
             |    SELECT a.qid, e.vec_id AS dst,
             |      row_number() OVER (PARTITION BY a.qid ORDER BY
             |        round(list_cosine_similarity(e.v[1:$k],
             |                                     a.qv[1:$k]), 4) DESC,
             |        e.vec_id) AS rk
             |    FROM e, anch a WHERE e.vec_id <> a.qid)
             |  WHERE rk <= 8)""".stripMargin
        s"""WITH e AS MATERIALIZED (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings WHERE vec_id <> 0),
           |anch AS (SELECT vec_id AS qid, v AS qv FROM e
           |         ORDER BY vec_id LIMIT 64),
           |ex AS MATERIALIZED (SELECT qid, dst FROM (
           |    SELECT a.qid, e.vec_id AS dst,
           |      row_number() OVER (PARTITION BY a.qid ORDER BY
           |        round(list_cosine_similarity(e.v, a.qv), 4) DESC,
           |        e.vec_id) AS rk
           |    FROM e, anch a WHERE e.vec_id <> a.qid)
           |  WHERE rk <= 8),
           |${tk(8)},
           |${tk(16)},
           |${tk(32)}
           |SELECT CAST(dims AS BIGINT) AS dims,
           |  CAST(exact_pairs AS BIGINT) AS exact_pairs,
           |  CAST(hits AS BIGINT) AS hits,
           |  CAST(CASE WHEN exact_pairs = 0 THEN 0
           |       ELSE (1000000 * hits) // exact_pairs END AS BIGINT)
           |    AS recall_ppm
           |FROM (
           |  SELECT 8 AS dims,
           |    (SELECT count(*) FROM ex) AS exact_pairs,
           |    (SELECT count(*) FROM tk8 t JOIN ex
           |       ON t.qid = ex.qid AND t.dst = ex.dst) AS hits
           |  UNION ALL
           |  SELECT 16, (SELECT count(*) FROM ex),
           |    (SELECT count(*) FROM tk16 t JOIN ex
           |       ON t.qid = ex.qid AND t.dst = ex.dst)
           |  UNION ALL
           |  SELECT 32, (SELECT count(*) FROM ex),
           |    (SELECT count(*) FROM tk32 t JOIN ex
           |       ON t.qid = ex.qid AND t.dst = ex.dst)
           |  UNION ALL
           |  SELECT 64, (SELECT count(*) FROM ex),
           |    (SELECT count(*) FROM ex))
           |ORDER BY dims""".stripMargin
      },

      // the one-scalar quantizer, integer q-vectors and norms, and
      // the quantized re-rank restated; the only float op is the
      // final round(dot/sqrt, 4), same as the declared plan
      "q353_sq8_recall" ->
        s"""WITH e AS MATERIALIZED (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings WHERE vec_id <> 0),
           |scl AS (SELECT max(list_max(list_transform(v,
           |          x -> abs(x)))) AS sc FROM e),
           |qn AS MATERIALIZED (SELECT vec_id, v, q,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      i -> q[i] * q[i])) AS BIGINT) AS nq
           |  FROM (SELECT vec_id, v,
           |      list_transform(v, x -> CAST(round(x * 127 / s.sc)
           |        AS BIGINT)) AS q
           |    FROM e, scl s)),
           |anch AS (SELECT vec_id AS qid, v AS qv, q AS qq,
           |         nq AS nqa FROM qn ORDER BY vec_id LIMIT 64),
           |ex AS MATERIALIZED (SELECT qid, dst FROM (
           |    SELECT a.qid, x.vec_id AS dst,
           |      row_number() OVER (PARTITION BY a.qid ORDER BY
           |        round(list_cosine_similarity(x.v, a.qv), 4) DESC,
           |        x.vec_id) AS rk
           |    FROM qn x, anch a WHERE x.vec_id <> a.qid)
           |  WHERE rk <= 8),
           |s8 AS (SELECT qid, dst FROM (
           |    SELECT a.qid, x.vec_id AS dst,
           |      row_number() OVER (PARTITION BY a.qid ORDER BY
           |        round(CAST(list_sum(list_transform(range(1, 65),
           |                i -> x.q[i] * a.qq[i])) AS DOUBLE) /
           |              sqrt(CAST(x.nq AS DOUBLE) *
           |                   CAST(a.nqa AS DOUBLE)), 4) DESC,
           |        x.vec_id) AS rk
           |    FROM qn x, anch a WHERE x.vec_id <> a.qid)
           |  WHERE rk <= 8)
           |SELECT tier, exact_pairs, hits,
           |  CAST(CASE WHEN exact_pairs = 0 THEN 0
           |       ELSE (1000000 * hits) // exact_pairs END AS BIGINT)
           |    AS recall_ppm
           |FROM (
           |  SELECT 'exact' AS tier,
           |    CAST((SELECT count(*) FROM ex) AS BIGINT) AS exact_pairs,
           |    CAST((SELECT count(*) FROM ex) AS BIGINT) AS hits
           |  UNION ALL
           |  SELECT 'sq8',
           |    CAST((SELECT count(*) FROM ex) AS BIGINT),
           |    CAST((SELECT count(*) FROM s8 t JOIN ex
           |       ON t.qid = ex.qid AND t.dst = ex.dst) AS BIGINT))
           |ORDER BY tier""".stripMargin,

      // keep-2 retention drops exactly v1; kept versions restate the
      // descent and insert edge sets — the GC must be invisible
      "q366_graph_vacuum" ->
        s"""WITH $beamGraphCte,
           |cd AS (SELECT g1.src, g2.dst AS cnd
           |       FROM graph g1 JOIN graph g2 ON g1.dst = g2.src
           |       WHERE g1.src <> g2.dst
           |       UNION SELECT src, dst FROM graph),
           |rg AS (SELECT src, dst FROM (
           |    SELECT cd.src, cd.cnd AS dst,
           |      row_number() OVER (PARTITION BY cd.src ORDER BY
           |        round(list_cosine_similarity(x.v, y.v), 4) DESC,
           |        cd.cnd) AS rk
           |    FROM cd JOIN e x ON cd.src = x.vec_id
           |            JOIN e y ON cd.cnd = y.vec_id)
           |  WHERE rk <= 8),
           |${beamGraphCteOn("i", " AND vec_id % 2 = 0",
                             s"vec_id < ${2 * Cents}")},
           |${graphInsertCte("i")}
           |SELECT * FROM (
           |  SELECT CAST(1 AS BIGINT) AS version, 'ivf_build' AS tier,
           |    'dropped' AS status, CAST(0 AS BIGINT) AS edges
           |  UNION ALL
           |  SELECT CAST(2 AS BIGINT), 'nn_descent_1', 'kept',
           |    (SELECT count(*) FROM rg)
           |  UNION ALL
           |  SELECT CAST(3 AS BIGINT), 'graph_insert', 'kept',
           |    (SELECT count(*) FROM imrg))
           |ORDER BY version""".stripMargin,

      // every latest census from first principles: the graph log's v3
      // = the post-insert merged edge set (the q366 chain), the pack
      // log's v2 = the 1024-token chunk count, the snapshot fixtures
      // = their defining orders/events slices; the integrity booleans
      // are the audit contract (GateModelSpec proves the detectors on
      // broken copies; these five logs ship healthy)
      "q389_log_fsck" ->
        s"""WITH $beamGraphCte,
           |${beamGraphCteOn("i", " AND vec_id % 2 = 0",
                             s"vec_id < ${2 * Cents}")},
           |${graphInsertCte("i")},
           |t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
           |    AS tok FROM documents),
           |ts AS (SELECT CAST(sum(tok) AS BIGINT) AS tot FROM t)
           |SELECT * FROM (
           |  SELECT 'graph' AS log,
           |    CAST((SELECT count(*) FROM imrg) AS BIGINT)
           |      AS latest_rows,
           |    CAST(1 AS BIGINT) AS contiguous,
           |    CAST(1 AS BIGINT) AS manifests_complete,
           |    CAST(1 AS BIGINT) AS no_orphans,
           |    CAST(0 AS BIGINT) AS pins_total,
           |    CAST(0 AS BIGINT) AS valid_pins
           |  UNION ALL
           |  SELECT 'pack',
           |    CAST((SELECT (tot + 1023) // 1024 FROM ts) AS BIGINT),
           |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
           |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           |  UNION ALL
           |  SELECT 'snap_branch',
           |    CAST((SELECT count(*) FROM orders
           |          WHERE o_orderkey % 4 IN (0, 1, 3)) AS BIGINT),
           |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
           |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           |  UNION ALL
           |  SELECT 'snap_events',
           |    CAST((SELECT count(*) FROM events) AS BIGINT),
           |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
           |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           |  UNION ALL
           |  SELECT 'snap_merge',
           |    CAST((SELECT count(*) FROM orders) AS BIGINT),
           |    CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
           |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           |) ORDER BY log""".stripMargin,

      // both attestations restated (q352's truncated tiers + q353's
      // quantized re-rank), then the config construction: bytes =
      // dims·8 for float64 prefixes, 64 for int8; recommended = the
      // cheapest row clearing the 950000 ppm floor (encoding ties by
      // name) — the artifacts must be invisible
      "q362_index_config" -> {
        def tk(k: Int): String =
          s"""tk$k AS (SELECT qid, dst FROM (
             |    SELECT a.qid, e.vec_id AS dst,
             |      row_number() OVER (PARTITION BY a.qid ORDER BY
             |        round(list_cosine_similarity(e.v[1:$k],
             |                                     a.qv[1:$k]), 4) DESC,
             |        e.vec_id) AS rk
             |    FROM e, anch a WHERE e.vec_id <> a.qid)
             |  WHERE rk <= 8)""".stripMargin
        s"""WITH e AS MATERIALIZED (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |  FROM embeddings WHERE vec_id <> 0),
           |anch AS (SELECT vec_id AS qid, v AS qv FROM e
           |         ORDER BY vec_id LIMIT 64),
           |ex AS MATERIALIZED (SELECT qid, dst FROM (
           |    SELECT a.qid, e.vec_id AS dst,
           |      row_number() OVER (PARTITION BY a.qid ORDER BY
           |        round(list_cosine_similarity(e.v, a.qv), 4) DESC,
           |        e.vec_id) AS rk
           |    FROM e, anch a WHERE e.vec_id <> a.qid)
           |  WHERE rk <= 8),
           |${tk(8)},
           |${tk(16)},
           |${tk(32)},
           |scl AS (SELECT max(list_max(list_transform(v,
           |          x -> abs(x)))) AS sc FROM e),
           |qn AS MATERIALIZED (SELECT vec_id, q,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      i -> q[i] * q[i])) AS BIGINT) AS nq
           |  FROM (SELECT vec_id,
           |      list_transform(v, x -> CAST(round(x * 127 / s.sc)
           |        AS BIGINT)) AS q
           |    FROM e, scl s)),
           |anq AS (SELECT vec_id AS qid, q AS qq, nq AS nqa FROM qn
           |        ORDER BY vec_id LIMIT 64),
           |s8 AS (SELECT qid, dst FROM (
           |    SELECT a.qid, x.vec_id AS dst,
           |      row_number() OVER (PARTITION BY a.qid ORDER BY
           |        round(CAST(list_sum(list_transform(range(1, 65),
           |                i -> x.q[i] * a.qq[i])) AS DOUBLE) /
           |              sqrt(CAST(x.nq AS DOUBLE) *
           |                   CAST(a.nqa AS DOUBLE)), 4) DESC,
           |        x.vec_id) AS rk
           |    FROM qn x, anq a WHERE x.vec_id <> a.qid)
           |  WHERE rk <= 8),
           |cfg AS (
           |  SELECT encoding, CAST(dims AS BIGINT) AS dims,
           |    CAST(bytes_per_vec AS BIGINT) AS bytes_per_vec,
           |    CAST(CASE WHEN exact_pairs = 0 THEN 0
           |         ELSE (1000000 * hits) // exact_pairs END AS BIGINT)
           |      AS recall_ppm
           |  FROM (
           |    SELECT 'float64' AS encoding, 8 AS dims,
           |      64 AS bytes_per_vec,
           |      (SELECT count(*) FROM ex) AS exact_pairs,
           |      (SELECT count(*) FROM tk8 t JOIN ex
           |         ON t.qid = ex.qid AND t.dst = ex.dst) AS hits
           |    UNION ALL
           |    SELECT 'float64', 16, 128,
           |      (SELECT count(*) FROM ex),
           |      (SELECT count(*) FROM tk16 t JOIN ex
           |         ON t.qid = ex.qid AND t.dst = ex.dst)
           |    UNION ALL
           |    SELECT 'float64', 32, 256,
           |      (SELECT count(*) FROM ex),
           |      (SELECT count(*) FROM tk32 t JOIN ex
           |         ON t.qid = ex.qid AND t.dst = ex.dst)
           |    UNION ALL
           |    SELECT 'float64', 64, 512,
           |      (SELECT count(*) FROM ex), (SELECT count(*) FROM ex)
           |    UNION ALL
           |    SELECT 'int8', 64, 64,
           |      (SELECT count(*) FROM ex),
           |      (SELECT count(*) FROM s8 t JOIN ex
           |         ON t.qid = ex.qid AND t.dst = ex.dst))),
           |best AS (SELECT encoding, dims FROM cfg
           |         WHERE recall_ppm >= $RecallFloorPpm
           |         ORDER BY bytes_per_vec, encoding LIMIT 1)
           |SELECT c.encoding, c.dims, c.bytes_per_vec, c.recall_ppm,
           |  CAST(CASE WHEN b.encoding IS NOT NULL THEN 1 ELSE 0 END
           |       AS BIGINT) AS recommended
           |FROM cfg c LEFT JOIN best b
           |  ON c.encoding = b.encoding AND c.dims = b.dims
           |ORDER BY c.bytes_per_vec, c.encoding""".stripMargin
      },

      // identical candidate retrieval (4 dp before ranking), identical
      // pairwise table, then mmrBody verbatim — the greedy chain is
      // the shared string
      "q322_mmr_rerank" ->
        s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
           |           FROM embeddings WHERE vec_id = 0),
           |cand AS MATERIALIZED (
           |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
           |    round(list_cosine_similarity(
           |      CAST(embedding AS DOUBLE[]), q.qv), 4) AS rel
           |  FROM embeddings, q WHERE vec_id <> 0
           |  ORDER BY rel DESC, id LIMIT 20),
           |pw AS MATERIALIZED (
           |  SELECT x.id AS a, y.id AS b,
           |    round(list_cosine_similarity(x.v, y.v), 4) AS sim
           |  FROM cand x JOIN cand y ON x.id <> y.id),
           |${mmrBody("cand", "pw")}""".stripMargin,

      "q53_ann_query" ->
        """SELECT b.vec_id AS vec_id,
          |  round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
          |                               CAST(a.embedding AS DOUBLE[])), 4) AS sim
          |FROM embeddings b, embeddings a
          |WHERE a.vec_id = 0 AND b.vec_id <> 0
          |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,

      "q56_dedup_embedding" ->
        s"""WITH s AS (SELECT vec_id, embedding, $sigSql AS sig FROM embeddings),
           |c AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
           |      FROM s x JOIN s y
           |        ON x.vec_id < y.vec_id AND ${bandEq("x.sig", "y.sig")})
           |SELECT * FROM (
           |  SELECT c.a, c.b,
           |    round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
           |                                 CAST(eb.embedding AS DOUBLE[])), 4) AS sim
           |  FROM c JOIN embeddings ea ON ea.vec_id = c.a
           |         JOIN embeddings eb ON eb.vec_id = c.b)
           |WHERE sim >= 0.4 ORDER BY a, b""".stripMargin,

      // q56's candidate text verbatim, the declared sim band, then the
      // symmetrized per-anchor top-3 window
      "q333_hard_negatives" ->
        s"""WITH s AS (SELECT vec_id, embedding, $sigSql AS sig FROM embeddings),
           |c AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
           |      FROM s x JOIN s y
           |        ON x.vec_id < y.vec_id AND ${bandEq("x.sig", "y.sig")}),
           |pr AS (SELECT * FROM (
           |  SELECT c.a, c.b,
           |    round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
           |                                 CAST(eb.embedding AS DOUBLE[])), 4) AS sim
           |  FROM c JOIN embeddings ea ON ea.vec_id = c.a
           |         JOIN embeddings eb ON eb.vec_id = c.b)
           |  WHERE sim >= 0.25 AND sim < 0.4),
           |sym AS (SELECT a AS anchor, b AS neg, sim FROM pr
           |        UNION ALL SELECT b, a, sim FROM pr)
           |SELECT anchor, CAST(rk AS BIGINT) AS neg_rank, neg, sim
           |FROM (SELECT *, row_number() OVER (PARTITION BY anchor
           |        ORDER BY sim DESC, neg) AS rk FROM sym)
           |WHERE rk <= 3 ORDER BY anchor, neg_rank""".stripMargin,

      // the PQ pipeline inlined: per-(vector, subspace, codeword)
      // distances → per-subspace argmin codes → the query's codeword
      // lut → ADC summed in the SAME left-to-right subspace order as
      // the engine (pivoted max-per-subspace, never an unordered
      // SUM()) → top-PqRerank by (adc, vec_id) → exact re-rank
      "q100_ann_pq" -> {
        val adcTerms = (0 until PqSub)
          .map(ss => s"max(CASE WHEN c.s = $ss THEN l.ld END)")
          .mkString(" + ")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |           FROM embeddings),
           |cb AS (SELECT vec_id AS j, v AS cv FROM e WHERE vec_id < $PqCents),
           |sub AS (SELECT unnest(range(0, $PqSub)) AS s),
           |d AS (SELECT e.vec_id, sub.s, cb.j,
           |        list_sum(list_transform(range(1, ${PqDim + 1}),
           |          i -> (e.v[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])
           |             * (e.v[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])))
           |          AS dist
           |      FROM e, cb, sub),
           |codes AS (SELECT vec_id, s, j AS code FROM (
           |            SELECT *, row_number() OVER (PARTITION BY vec_id, s
           |                                         ORDER BY dist, j) AS rn
           |            FROM d) WHERE rn = 1),
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |lut AS (SELECT sub.s, cb.j,
           |          list_sum(list_transform(range(1, ${PqDim + 1}),
           |            i -> (q.qv[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])
           |               * (q.qv[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])))
           |            AS ld
           |        FROM q, cb, sub),
           |adc AS (SELECT c.vec_id, $adcTerms AS adc
           |        FROM codes c JOIN lut l ON l.s = c.s AND l.j = c.code
           |        GROUP BY c.vec_id),
           |cand AS (SELECT vec_id FROM adc WHERE vec_id <> 0
           |         ORDER BY adc, vec_id LIMIT $PqRerank)
           |SELECT e.vec_id,
           |  round(list_cosine_similarity(e.v, q.qv), 4) AS sim
           |FROM cand JOIN e USING (vec_id), q
           |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
      },

      // the two-level index inlined: IVF probe-cell selection (q73's
      // CTEs) restricts the candidate set FIRST, then the PQ
      // code/lut/ADC pipeline (q100's CTEs) runs over only those
      // members, same ordered ADC sum and bounded re-rank
      "q105_ann_ivfpq" -> {
        val adcTerms = (0 until PqSub)
          .map(ss => s"max(CASE WHEN c.s = $ss THEN l.ld END)")
          .mkString(" + ")
        s"""WITH $ivfCte,
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |pc AS (SELECT cid FROM d WHERE vec_id = 0
           |       ORDER BY dist, cid LIMIT $NProbe),
           |cell AS (SELECT a.vec_id, a.v FROM a JOIN pc USING (cid)
           |         WHERE a.vec_id <> 0),
           |cb AS (SELECT vec_id AS j, v AS cv FROM e WHERE vec_id < $PqCents),
           |sub AS (SELECT unnest(range(0, $PqSub)) AS s),
           |dd AS (SELECT cell.vec_id, sub.s, cb.j,
           |        list_sum(list_transform(range(1, ${PqDim + 1}),
           |          i -> (cell.v[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])
           |             * (cell.v[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])))
           |          AS dist
           |      FROM cell, cb, sub),
           |codes AS (SELECT vec_id, s, j AS code FROM (
           |            SELECT *, row_number() OVER (PARTITION BY vec_id, s
           |                                         ORDER BY dist, j) AS rn
           |            FROM dd) WHERE rn = 1),
           |lut AS (SELECT sub.s, cb.j,
           |          list_sum(list_transform(range(1, ${PqDim + 1}),
           |            i -> (q.qv[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])
           |               * (q.qv[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])))
           |            AS ld
           |        FROM q, cb, sub),
           |adc AS (SELECT c.vec_id, $adcTerms AS adc
           |        FROM codes c JOIN lut l ON l.s = c.s AND l.j = c.code
           |        GROUP BY c.vec_id),
           |cand AS (SELECT vec_id FROM adc
           |         ORDER BY adc, vec_id LIMIT $PqRerank)
           |SELECT e.vec_id,
           |  round(list_cosine_similarity(e.v, q.qv), 4) AS sim
           |FROM cand JOIN e USING (vec_id), q
           |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
      },

      // the coded index inlined, batched: codes for every vector (the
      // index build), per-query probe cells and codeword luts, ADC
      // over probed cells' members from the stored codes, bounded cut,
      // exact re-rank — the persisted table is invisible to semantics
      "q107_ann_pq_index" -> {
        val adcTerms = (0 until PqSub)
          .map(ss => s"max(CASE WHEN c.s = $ss THEN l.ld END)")
          .mkString(" + ")
        s"""WITH $ivfCte,
           |cb AS (SELECT vec_id AS j, v AS cv FROM e WHERE vec_id < $PqCents),
           |sub AS (SELECT unnest(range(0, $PqSub)) AS s),
           |dd AS (SELECT e.vec_id, sub.s, cb.j,
           |        list_sum(list_transform(range(1, ${PqDim + 1}),
           |          i -> (e.v[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])
           |             * (e.v[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])))
           |          AS dist
           |      FROM e, cb, sub),
           |codes AS (SELECT vec_id, s, j AS code FROM (
           |            SELECT *, row_number() OVER (PARTITION BY vec_id, s
           |                                         ORDER BY dist, j) AS rn
           |            FROM dd) WHERE rn = 1),
           |q AS (SELECT vec_id AS qid, v AS qv FROM e
           |      WHERE vec_id < $BatchQueries),
           |pc AS (SELECT qid, cid FROM (
           |         SELECT q.qid, d.cid,
           |           row_number() OVER (PARTITION BY q.qid
           |                              ORDER BY d.dist, d.cid) AS pr
           |         FROM d JOIN q ON d.vec_id = q.qid) WHERE pr <= $NProbe),
           |lut AS (SELECT q.qid, sub.s, cb.j,
           |          list_sum(list_transform(range(1, ${PqDim + 1}),
           |            i -> (q.qv[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])
           |               * (q.qv[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])))
           |            AS ld
           |        FROM q, cb, sub),
           |mem AS (SELECT pc.qid, a.vec_id FROM a JOIN pc USING (cid)
           |        WHERE a.vec_id <> pc.qid),
           |adc AS (SELECT m.qid, m.vec_id, $adcTerms AS adc
           |        FROM mem m JOIN codes c ON c.vec_id = m.vec_id
           |                   JOIN lut l ON l.qid = m.qid AND l.s = c.s
           |                            AND l.j = c.code
           |        GROUP BY m.qid, m.vec_id),
           |cand AS (SELECT qid, vec_id FROM (
           |           SELECT *, row_number() OVER (PARTITION BY qid
           |                      ORDER BY adc, vec_id) AS ar
           |           FROM adc) WHERE ar <= $PqRerank),
           |sc AS (SELECT cand.qid, cand.vec_id,
           |         round(list_cosine_similarity(e.v, q.qv), 4) AS sim
           |       FROM cand JOIN e ON e.vec_id = cand.vec_id
           |                 JOIN q ON q.qid = cand.qid)
           |SELECT * FROM (
           |  SELECT qid, vec_id, sim,
           |    row_number() OVER (PARTITION BY qid
           |                       ORDER BY sim DESC, vec_id) AS rk
           |  FROM sc)
           |WHERE rk <= $BatchK ORDER BY qid, rk""".stripMargin
      },

      // q107's inlined-index oracle with the q67 md5 split rule on the
      // ids: eval vecs are the queries, probed-cell members restrict to
      // the train side, and the flag is the threshold on the exact
      // re-ranked cosine
      "q120_decontaminate_semantic" -> {
        val adcTerms = (0 until PqSub)
          .map(ss => s"max(CASE WHEN c.s = $ss THEN l.ld END)")
          .mkString(" + ")
        val isTrain =
          "substr(md5(CAST(%s AS VARCHAR)), 1, 1) <= 'b'"
        s"""WITH $ivfCte,
           |cb AS (SELECT vec_id AS j, v AS cv FROM e WHERE vec_id < $PqCents),
           |sub AS (SELECT unnest(range(0, $PqSub)) AS s),
           |dd AS (SELECT e.vec_id, sub.s, cb.j,
           |        list_sum(list_transform(range(1, ${PqDim + 1}),
           |          i -> (e.v[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])
           |             * (e.v[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])))
           |          AS dist
           |      FROM e, cb, sub),
           |codes AS (SELECT vec_id, s, j AS code FROM (
           |            SELECT *, row_number() OVER (PARTITION BY vec_id, s
           |                                         ORDER BY dist, j) AS rn
           |            FROM dd) WHERE rn = 1),
           |q AS (SELECT vec_id AS eval_id, v AS qv FROM e
           |      WHERE NOT ${isTrain.format("vec_id")}),
           |pc AS (SELECT eval_id, cid FROM (
           |         SELECT q.eval_id, d.cid,
           |           row_number() OVER (PARTITION BY q.eval_id
           |                              ORDER BY d.dist, d.cid) AS pr
           |         FROM d JOIN q ON d.vec_id = q.eval_id) WHERE pr <= $NProbe),
           |lut AS (SELECT q.eval_id, sub.s, cb.j,
           |          list_sum(list_transform(range(1, ${PqDim + 1}),
           |            i -> (q.qv[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])
           |               * (q.qv[sub.s * $PqDim + i] - cb.cv[sub.s * $PqDim + i])))
           |            AS ld
           |        FROM q, cb, sub),
           |mem AS (SELECT pc.eval_id, a.vec_id FROM a JOIN pc USING (cid)
           |        WHERE ${isTrain.format("a.vec_id")}),
           |adc AS (SELECT m.eval_id, m.vec_id, $adcTerms AS adc
           |        FROM mem m JOIN codes c ON c.vec_id = m.vec_id
           |                   JOIN lut l ON l.eval_id = m.eval_id AND l.s = c.s
           |                            AND l.j = c.code
           |        GROUP BY m.eval_id, m.vec_id),
           |cand AS (SELECT eval_id, vec_id FROM (
           |           SELECT *, row_number() OVER (PARTITION BY eval_id
           |                      ORDER BY adc, vec_id) AS ar
           |           FROM adc) WHERE ar <= $PqRerank)
           |SELECT * FROM (
           |  SELECT cand.eval_id, cand.vec_id AS train_id,
           |    round(list_cosine_similarity(e.v, q.qv), 4) AS sim
           |  FROM cand JOIN e ON e.vec_id = cand.vec_id
           |            JOIN q ON q.eval_id = cand.eval_id)
           |WHERE sim >= $SemThreshold
           |ORDER BY eval_id, train_id""".stripMargin
      },

      // the shared IVF assignment CTEs + the identical fixed-point
      // mean: round(x·1e6) BIGINTs summed exactly, one double divide,
      // one round
      "q125_kmeans_step" ->
        s"""WITH $ivfCte,
           |x AS (SELECT a.cid, CAST(u.i - 1 AS BIGINT) AS dim,
           |        CAST(round(a.v[u.i] * 1000000) AS BIGINT) AS xi
           |      FROM a, (SELECT unnest(range(1, 65)) AS i) u)
           |SELECT cid, dim, count(*) AS n,
           |  round(CAST(sum(xi) AS DOUBLE) / count(*) / 1000000.0, 6)
           |    AS c_new
           |FROM x GROUP BY cid, dim ORDER BY cid, dim""".stripMargin,

      // the 3 Lloyd rounds unrolled as CTEs — all assignment math on
      // the same integer lattice, so the iterative result hash-matches
      "q222_kmeans_loop" -> {
        s"""WITH $lloydCte
           |SELECT * FROM (
           |  SELECT CAST(1 AS BIGINT) AS iter,
           |    (SELECT CAST(sum(dist) AS BIGINT) FROM a1) AS inertia,
           |    (SELECT count(*) FROM a1) AS moved,
           |    (SELECT count(DISTINCT cid) FROM a1) AS n_clusters
           |  UNION ALL
           |  SELECT 2, (SELECT CAST(sum(dist) AS BIGINT) FROM a2),
           |    (SELECT count(*) FROM a2 JOIN a1 USING (vec_id)
           |     WHERE a2.cid <> a1.cid),
           |    (SELECT count(DISTINCT cid) FROM a2)
           |  UNION ALL
           |  SELECT 3, (SELECT CAST(sum(dist) AS BIGINT) FROM a3),
           |    (SELECT count(*) FROM a3 JOIN a2 USING (vec_id)
           |     WHERE a3.cid <> a2.cid),
           |    (SELECT count(DISTINCT cid) FROM a3))
           |ORDER BY iter""".stripMargin
      },

      // the identical Lloyd text to a3, then the exact-lattice dup
      // predicate (10⁴·dot² ≥ 1600·na·nb in DECIMAL — q56's 0.4 line
      // with zero float arithmetic) and the min-id keep rule
      "q311_semdedup" ->
        s"""WITH $lloydCte,
           |bs AS (SELECT a3.vec_id, a3.cid, e.xi,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> e.xi[j] * e.xi[j])) AS BIGINT) AS nv
           |  FROM a3 JOIN e USING (vec_id)),
           |pr AS (
           |  SELECT l.cid, l.vec_id AS a, r.vec_id AS b,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> l.xi[j] * r.xi[j])) AS BIGINT) AS dot,
           |    l.nv AS na, r.nv AS nb
           |  FROM bs l JOIN bs r
           |    ON l.cid = r.cid AND l.vec_id < r.vec_id),
           |dp AS (SELECT cid, a, b FROM pr
           |       WHERE dot > 0 AND
           |         CAST(dot AS DECIMAL(38,0)) * dot * 10000 >=
           |           CAST(na AS DECIMAL(38,0)) * nb * 1600),
           |cl AS (SELECT cid, count(*) AS n_vecs FROM bs GROUP BY 1),
           |dc AS (SELECT cid, count(*) AS n_dup_pairs FROM dp GROUP BY 1),
           |rc AS (SELECT cid, count(*) AS n_removed
           |       FROM (SELECT DISTINCT cid, b FROM dp) GROUP BY 1)
           |SELECT cl.cid, cl.n_vecs,
           |  coalesce(dc.n_dup_pairs, 0) AS n_dup_pairs,
           |  coalesce(rc.n_removed, 0) AS n_removed,
           |  round(CAST(cl.n_vecs - coalesce(rc.n_removed, 0) AS DOUBLE) /
           |        CAST(cl.n_vecs AS DOUBLE), 6) AS keep_ratio
           |FROM cl LEFT JOIN dc USING (cid) LEFT JOIN rc USING (cid)
           |ORDER BY cid""".stripMargin,

      // the even-half Lloyd fit restated inline (lloydCteOn — the
      // artifact must be invisible), the odd batch's single argmin
      // assignment against c3, then q311's exact-lattice dup line on
      // the two pair tiers and the per-cluster batch census
      // both pair sides restate [[SemDedupClusterCap]] (min-id rows
      // kept per cluster, exactly semDedupIncParts' windows — r15
      // ADVICE symmetry with q345's oracle; a no-op at every
      // oracle-checked SF, max cluster ≪ cap)
      "q339_semdedup_incremental" ->
        s"""WITH ${lloydCteOn("WHERE vec_id % 2 = 0",
                              s"vec_id < ${2 * Cents}")},
           |onb AS (SELECT vec_id, cid, xi, nv FROM (
           |  SELECT a3.vec_id, a3.cid, e.xi,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> e.xi[j] * e.xi[j])) AS BIGINT) AS nv,
           |    row_number() OVER (PARTITION BY a3.cid
           |                       ORDER BY a3.vec_id) AS mrk
           |  FROM a3 JOIN e USING (vec_id))
           |  WHERE mrk <= $SemDedupClusterCap),
           |ob AS (SELECT vec_id,
           |    list_transform(embedding,
           |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
           |      AS xi
           |  FROM embeddings WHERE vec_id % 2 = 1),
           |od AS (SELECT ob.vec_id, c.cid,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> (ob.xi[j] - c.ci[j]) * (ob.xi[j] - c.ci[j])))
           |      AS BIGINT) AS dist
           |  FROM ob CROSS JOIN c3 c),
           |bn AS (SELECT vec_id, cid, xi, nv FROM (
           |  SELECT oa.vec_id, oa.cid, ob.xi,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> ob.xi[j] * ob.xi[j])) AS BIGINT) AS nv,
           |    row_number() OVER (PARTITION BY oa.cid
           |                       ORDER BY oa.vec_id) AS mrk
           |  FROM (SELECT vec_id, cid FROM (
           |          SELECT *, row_number() OVER (PARTITION BY vec_id
           |                                       ORDER BY dist, cid) AS rn
           |          FROM od) WHERE rn = 1) oa
           |       JOIN ob USING (vec_id))
           |  WHERE mrk <= $SemDedupClusterCap),
           |pr AS (
           |  SELECT o.cid, o.vec_id AS a, n.vec_id AS b,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> o.xi[j] * n.xi[j])) AS BIGINT) AS dot,
           |    o.nv AS na, n.nv AS nb
           |  FROM onb o JOIN bn n ON o.cid = n.cid
           |  UNION ALL
           |  SELECT l.cid, l.vec_id, r.vec_id,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      j -> l.xi[j] * r.xi[j])) AS BIGINT),
           |    l.nv, r.nv
           |  FROM bn l JOIN bn r
           |    ON l.cid = r.cid AND l.vec_id < r.vec_id),
           |dp AS (SELECT cid, a, b FROM pr
           |       WHERE dot > 0 AND
           |         CAST(dot AS DECIMAL(38,0)) * dot * 10000 >=
           |           CAST(na AS DECIMAL(38,0)) * nb * 1600),
           |nn AS (SELECT cid, count(*) AS n_new FROM bn GROUP BY 1),
           |no AS (SELECT cid, count(*) AS n_old FROM onb GROUP BY 1),
           |dc AS (SELECT cid, count(*) AS n_dup_pairs FROM dp GROUP BY 1),
           |rc AS (SELECT cid, count(*) AS n_new_removed
           |       FROM (SELECT DISTINCT cid, b FROM dp) GROUP BY 1)
           |SELECT nn.cid, coalesce(no.n_old, 0) AS n_old, nn.n_new,
           |  coalesce(dc.n_dup_pairs, 0) AS n_dup_pairs,
           |  coalesce(rc.n_new_removed, 0) AS n_new_removed,
           |  round(CAST(nn.n_new - coalesce(rc.n_new_removed, 0)
           |             AS DOUBLE) / CAST(nn.n_new AS DOUBLE), 6)
           |    AS keep_ratio
           |FROM nn LEFT JOIN no USING (cid) LEFT JOIN dc USING (cid)
           |        LEFT JOIN rc USING (cid)
           |ORDER BY cid""".stripMargin,

      "q73_ann_ivf" ->
        s"""WITH $ivfCte,
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |pc AS (SELECT cid FROM d WHERE vec_id = 0
           |       ORDER BY dist, cid LIMIT $NProbe),
           |cand AS (SELECT a.vec_id, a.v FROM a JOIN pc USING (cid)
           |         WHERE a.vec_id <> 0)
           |SELECT cand.vec_id, round(list_cosine_similarity(cand.v, q.qv), 4) AS sim
           |FROM cand, q
           |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,

      "q214_ann_recall" ->
        s"""WITH $ivfCte,
           |q AS (SELECT vec_id AS qid, v AS qv FROM e
           |      WHERE vec_id < $BatchQueries),
           |ex AS (SELECT qid, vec_id FROM (
           |    SELECT q.qid, a.vec_id,
           |      row_number() OVER (PARTITION BY q.qid
           |        ORDER BY round(list_cosine_similarity(a.v, q.qv), 4)
           |                 DESC, a.vec_id) AS rk
           |    FROM a, q WHERE a.vec_id <> q.qid) WHERE rk <= 10),
           |pr AS (SELECT qid, cid, pr FROM (
           |    SELECT q.qid, d.cid,
           |      row_number() OVER (PARTITION BY q.qid
           |                         ORDER BY d.dist, d.cid) AS pr
           |    FROM d JOIN q ON d.vec_id = q.qid) WHERE pr <= 4),
           |np(n_probe) AS (VALUES (1), (2), (4)),
           |cand AS (SELECT np.n_probe, pr.qid, a.vec_id,
           |    round(list_cosine_similarity(a.v, q.qv), 4) AS sim
           |  FROM a JOIN pr USING (cid) JOIN q ON q.qid = pr.qid
           |       CROSS JOIN np
           |  WHERE a.vec_id <> pr.qid AND pr.pr <= np.n_probe),
           |top AS (SELECT n_probe, qid, vec_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY n_probe, qid
           |                                 ORDER BY sim DESC, vec_id)
           |      AS rk
           |    FROM cand) WHERE rk <= 10),
           |h AS (SELECT n_probe, count(*) AS hits
           |      FROM top JOIN ex USING (qid, vec_id) GROUP BY 1)
           |SELECT CAST(np.n_probe AS BIGINT) AS n_probe,
           |  CAST($BatchQueries AS BIGINT) AS queries,
           |  CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
           |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) /
           |        ($BatchQueries * 10), 6) AS recall
           |FROM np LEFT JOIN h ON np.n_probe = h.n_probe
           |ORDER BY n_probe""".stripMargin,

      // the persisted index must be invisible to semantics: the oracle
      // is the full IVF computation inlined (the shared CTEs, batched)
      "q79_ann_index" ->
        s"""WITH $ivfCte,
           |q AS (SELECT vec_id AS qid, v AS qv FROM e
           |      WHERE vec_id < $BatchQueries),
           |pc AS (SELECT qid, cid FROM (
           |         SELECT q.qid, d.cid,
           |           row_number() OVER (PARTITION BY q.qid
           |                              ORDER BY d.dist, d.cid) AS pr
           |         FROM d JOIN q ON d.vec_id = q.qid) WHERE pr <= $NProbe),
           |sc AS (SELECT pc.qid, a.vec_id,
           |         round(list_cosine_similarity(a.v, q.qv), 4) AS sim
           |       FROM a JOIN pc USING (cid)
           |              JOIN q ON q.qid = pc.qid
           |       WHERE a.vec_id <> pc.qid)
           |SELECT * FROM (
           |  SELECT qid, vec_id, sim,
           |    row_number() OVER (PARTITION BY qid
           |                       ORDER BY sim DESC, vec_id) AS rk
           |  FROM sc)
           |WHERE rk <= $BatchK ORDER BY qid, rk""".stripMargin,

      "q71_ann_batch" ->
        s"""WITH s AS (SELECT vec_id, embedding, $sigSql AS sig FROM embeddings),
           |q AS (SELECT vec_id AS qid, embedding AS qe, sig AS qsig
           |      FROM s WHERE vec_id < $BatchQueries),
           |c AS (SELECT DISTINCT q.qid, s.vec_id AS cid
           |      FROM q JOIN s
           |        ON q.qid <> s.vec_id AND ${bandEq("q.qsig", "s.sig")}),
           |sc AS (SELECT c.qid, c.cid,
           |         round(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
           |                                      CAST(e.embedding AS DOUBLE[])), 4) AS sim
           |       FROM c JOIN q ON q.qid = c.qid
           |              JOIN embeddings e ON e.vec_id = c.cid)
           |SELECT * FROM (
           |  SELECT qid, cid, sim,
           |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
           |  FROM sc)
           |WHERE rk <= $BatchK ORDER BY qid, rk""".stripMargin
    )
    // q127's oracle embeds BOTH verified rank lists verbatim as CTE
    // bodies and fuses them with the identical fixed-order double
    // arithmetic (CAST(1 AS DOUBLE) — a bare 1.0 literal is DECIMAL in
    // DuckDB and its division rounds differently)
    base + ("q127_rrf_fusion" ->
      s"""WITH lsh AS (${base("q71_ann_batch")}),
         |ivf AS (${base("q79_ann_index")}),
         |u AS (SELECT coalesce(l.qid, i.qid) AS qid,
         |        coalesce(l.cid, i.vec_id) AS doc_id,
         |        round(coalesce(CAST(1 AS DOUBLE) / ($RrfK + l.rk), 0) +
         |              coalesce(CAST(1 AS DOUBLE) / ($RrfK + i.rk), 0), 6)
         |          AS rrf
         |      FROM lsh l FULL OUTER JOIN ivf i
         |        ON l.qid = i.qid AND l.cid = i.vec_id)
         |SELECT qid, doc_id, rrf, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |             ORDER BY rrf DESC, doc_id) AS rk
         |  FROM u)
         |WHERE rk <= $BatchK ORDER BY qid, rk""".stripMargin,

    // independent re-derivation: same grid quantization, components by
    // recursive-CTE reachability over the 8-adjacency (q82's oracle
    // discipline for iterative fixpoints)
    "q278_dbscan_grid" ->
      """WITH RECURSIVE pts AS (
        |  SELECT (CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000)
        |               AS BIGINT) + 2000000) // 50000 AS cx,
        |         (CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000)
        |               AS BIGINT) + 2000000) // 50000 AS cy
        |  FROM embeddings),
        |cells AS (SELECT cx, cy, count(*) AS n FROM pts GROUP BY 1, 2),
        |core AS (SELECT cx * 100000 + cy AS cid, cx, cy, n
        |         FROM cells WHERE n >= 3),
        |edges AS (
        |  SELECT a.cid AS u, b.cid AS v FROM core a JOIN core b
        |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        |   AND a.cid <> b.cid),
        |reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |lbl AS (SELECT u AS cid, least(u, min(v)) AS cluster_id
        |        FROM reach GROUP BY u),
        |labeled AS (
        |  SELECT c.cid, c.n, COALESCE(l.cluster_id, c.cid) AS cluster_id
        |  FROM core c LEFT JOIN lbl l ON c.cid = l.cid),
        |cl AS (
        |  SELECT cluster_id, count(*) AS n_cells,
        |    CAST(sum(n) AS BIGINT) AS n_points
        |  FROM labeled GROUP BY 1),
        |noise AS (
        |  SELECT CAST(-1 AS BIGINT) AS cluster_id, count(*) AS n_cells,
        |    CAST(COALESCE(sum(n), 0) AS BIGINT) AS n_points
        |  FROM cells WHERE n < 3)
        |SELECT * FROM cl UNION ALL SELECT * FROM noise
        |ORDER BY n_points DESC, cluster_id""".stripMargin,

    // the same integer pipeline re-derived: covariance from zipped
    // unnests, 120 power steps as generated MATERIALIZED CTEs (plain
    // CTE inlining re-evaluates the chain exponentially), truncating
    // division (//) matching BigInt / throughout
    "q295_pca_power" ->
      s"""$pcaOracleCte,
         |ray AS (
         |  SELECT sum(c.cv * a.val * b.val) AS r
         |  FROM cs c JOIN fin a ON c.i = a.i JOIN fin b ON c.j = b.i),
         |tr AS (SELECT sum(cv) AS t FROM cs WHERE i = j)
         |SELECT f.i AS dim,
         |  round(CAST(f.val AS DOUBLE) / n.nr, 6) AS loading,
         |  round(CAST(r.r AS DOUBLE) / CAST(n.vtv AS DOUBLE) /
         |        CAST(t.t AS DOUBLE), 6) AS var_explained
         |FROM fin f, nrm n, ray r, tr t
         |ORDER BY dim""".stripMargin,

    // three generated 120-step chains: the shared prefix solves
    // component 1, each pcaDeflateSql round replays the integer
    // Rayleigh-outer-product subtraction + rescale + fresh chain;
    // var_explained multiplies each ray back to the first-scale
    // matrix (HUGEINT scale product cast to DOUBLE — the identical
    // operand chain the Spark driver computes in BigInt)
    "q297_pca_topk" ->
      s"""$pcaOracleCte,
         |tr AS (SELECT sum(cv) AS t FROM cs WHERE i = j),
         |rayA AS (
         |  SELECT sum(c.cv * a.val * b.val) AS r
         |  FROM cs c JOIN fin a ON c.i = a.i JOIN fin b ON c.j = b.i),
         |${pcaDeflateSql("d2_", "cs", "fin", "nrm", "rayA")},
         |${pcaDeflateSql("d3_", "csd2_", "find2_", "nrmd2_", "rayd2_")}
         |SELECT 1 AS component, f.i AS dim,
         |  round(CAST(f.val AS DOUBLE) / n.nr, 6) AS loading,
         |  round(CAST(r.r AS DOUBLE) * CAST(1 AS DOUBLE) /
         |        CAST(n.vtv AS DOUBLE) / CAST(t.t AS DOUBLE), 6)
         |    AS var_explained
         |FROM fin f, nrm n, rayA r, tr t
         |UNION ALL
         |SELECT 2 AS component, f.i AS dim,
         |  round(CAST(f.val AS DOUBLE) / n.nr, 6) AS loading,
         |  round(CAST(r.r AS DOUBLE) *
         |        CAST((SELECT s FROM scld2_) AS DOUBLE) /
         |        CAST(n.vtv AS DOUBLE) / CAST(t.t AS DOUBLE), 6)
         |    AS var_explained
         |FROM find2_ f, nrmd2_ n, rayd2_ r, tr t
         |UNION ALL
         |SELECT 3 AS component, f.i AS dim,
         |  round(CAST(f.val AS DOUBLE) / n.nr, 6) AS loading,
         |  round(CAST(r.r AS DOUBLE) *
         |        CAST((SELECT s FROM scld2_) * (SELECT s FROM scld3_)
         |             AS DOUBLE) /
         |        CAST(n.vtv AS DOUBLE) / CAST(t.t AS DOUBLE), 6)
         |    AS var_explained
         |FROM find3_ f, nrmd3_ n, rayd3_ r, tr t
         |ORDER BY component, dim""".stripMargin,

    // the projection rides the same shared chain; per-row dot products
    // against fin, per-source decimal sums, one division
    "q296_pc1_source_drift" ->
      s"""$pcaOracleCte,
         |rws AS (
         |  SELECT vec_id, unnest(q) AS qv,
         |    unnest(range(0, len(q))) AS k
         |  FROM e),
         |pr AS (
         |  SELECT r.vec_id, sum(r.qv * f.val) AS p
         |  FROM rws r JOIN fin f ON r.k = f.i GROUP BY 1),
         |j AS (
         |  SELECT d.source, p FROM pr
         |  JOIN documents d ON pr.vec_id = d.doc_id)
         |SELECT source, count(*) AS n,
         |  round(CAST(sum(CAST(p AS HUGEINT)) AS DOUBLE) /
         |        CAST(count(*) AS DOUBLE) /
         |        (1000000.0 * (SELECT nr FROM nrm)), 6) AS mean_proj
         |FROM j GROUP BY 1 ORDER BY source""".stripMargin,

    // the INDEPENDENT quadratic self-join — the grid must be invisible
    // the independent quadratic odd×even join — no grid, no artifact
    "q334_knn_index" ->
      """WITH pts AS (
        |  SELECT vec_id AS id,
        |    CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000)
        |         AS BIGINT) AS x,
        |    CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000)
        |         AS BIGINT) AS y
        |  FROM embeddings),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |      AS dist2
        |  FROM pts a JOIN pts b ON a.id % 2 = 1 AND b.id % 2 = 0),
        |rk AS (
        |  SELECT id_a, id_b, dist2,
        |    row_number() OVER (PARTITION BY id_a
        |                       ORDER BY dist2, id_b) AS nn_rank
        |  FROM cand WHERE dist2 <= 400000000)
        |SELECT id_a, nn_rank, id_b, dist2 FROM rk
        |WHERE nn_rank <= 5 ORDER BY id_a, nn_rank""".stripMargin,

    // the independent quadratic algorithm: full self-join + window,
    // no grid — two algorithms, one ranked list
    "q331_knn_join" ->
      """WITH pts AS (
        |  SELECT vec_id AS id,
        |    CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000)
        |         AS BIGINT) AS x,
        |    CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000)
        |         AS BIGINT) AS y
        |  FROM embeddings),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |      AS dist2
        |  FROM pts a JOIN pts b ON a.id <> b.id),
        |rk AS (
        |  SELECT id_a, id_b, dist2,
        |    row_number() OVER (PARTITION BY id_a
        |                       ORDER BY dist2, id_b) AS nn_rank
        |  FROM cand WHERE dist2 <= 400000000)
        |SELECT id_a, nn_rank, id_b, dist2 FROM rk
        |WHERE nn_rank <= 5 ORDER BY id_a, nn_rank""".stripMargin,

    "q289_spatial_join" ->
      """WITH pts AS (
        |  SELECT vec_id AS id,
        |    CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000)
        |         AS BIGINT) AS x,
        |    CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000)
        |         AS BIGINT) AS y
        |  FROM embeddings)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |    AS dist2
        |FROM pts a JOIN pts b ON a.id < b.id
        |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |      <= 400000000
        |ORDER BY id_a, id_b""".stripMargin,

    // same fixed-point cell algebra, HUGEINT folds in place of decimal
    "q283_embed_drift" ->
      """WITH e AS (
        |  SELECT d.source,
        |    list_transform(v.embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
        |      AS q
        |  FROM embeddings v JOIN documents d ON v.vec_id = d.doc_id),
        |x AS (
        |  SELECT source, unnest(q) AS v,
        |    unnest(range(1, len(q) + 1)) AS dim
        |  FROM e),
        |cells AS (
        |  SELECT source, dim, count(*) AS n, sum(v) AS sv,
        |    sum(CAST(v AS HUGEINT) * v) AS svv
        |  FROM x GROUP BY 1, 2),
        |gl AS (
        |  SELECT dim, sum(CAST(sv AS HUGEINT)) AS gv
        |  FROM cells GROUP BY 1),
        |gn AS (SELECT sum(gv * gv) AS gn FROM gl),
        |per AS (
        |  SELECT c.source, max(c.n) AS n_docs,
        |    sum(CAST(c.sv AS HUGEINT) * c.sv) AS ns,
        |    sum(CAST(c.sv AS HUGEINT) * g.gv) AS dot,
        |    sum(svv) AS ssq
        |  FROM cells c JOIN gl g ON c.dim = g.dim
        |  GROUP BY 1)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  round(CAST(dot AS DOUBLE) /
        |        (sqrt(CAST(ns AS DOUBLE)) * sqrt(CAST(gn AS DOUBLE))),
        |        6) AS cos_to_global,
        |  round((CAST(ssq AS DOUBLE) / CAST(n_docs AS DOUBLE) -
        |         CAST(ns AS DOUBLE) /
        |         (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))) /
        |        1.0e12, 6) AS dispersion
        |FROM per, gn ORDER BY source""".stripMargin)
  }
}
