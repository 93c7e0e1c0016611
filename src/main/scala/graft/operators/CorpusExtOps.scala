package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Exact bounded "k smallest rows by sort key" as a typed [[Aggregator]]
  * — the scale-correct form of per-stratum sampling (q92). The buffer
  * holds at most k rows sorted by (key, id); reduce rejects a row in
  * O(1) once the buffer is full and the row sorts after the current
  * max. Associative + commutative, so Spark runs it partial+final:
  * every input partition boils down to ≤ k rows map-side and only
  * strata × k rows ever shuffle — unlike a rank window, which funnels
  * the ENTIRE corpus through one reducer per stratum.
  *
  * Exactness (property-tested in PropertySpec): any reduce/merge tree
  * yields exactly sortBy(key, id).take(k) of the inputs, because min-k
  * is a mergeable summary: min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)).
  */
class MinKByKeyAgg(k: Int) extends Aggregator[
    (String, Long, Long),           // (sort key, id, payload)
    Seq[(String, Long, Long)],      // sorted ascending, ≤ k rows
    Seq[(String, Long, Long)]] {
  private def ord(x: (String, Long, Long)): (String, Long) = (x._1, x._2)
  def zero: Seq[(String, Long, Long)] = Seq.empty
  def reduce(b: Seq[(String, Long, Long)], a: (String, Long, Long)): Seq[(String, Long, Long)] =
    if (b.length >= k && Ordering[(String, Long)].lteq(ord(b.last), ord(a))) b
    else ((b :+ a).sortBy(ord) take k)
  def merge(b1: Seq[(String, Long, Long)], b2: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] =
    ((b1 ++ b2).sortBy(ord) take k)
  def finish(b: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = b
  def bufferEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Corpus-preparation operators beyond the dedup/quality families
  * (SURVEY.md §2B, added r6): sequence packing, exact stratified
  * sampling, PII redaction, TF-IDF term ranking, and overlapping
  * token-window chunking — the remaining stages a training-data
  * pipeline runs between "filtered corpus" and "tokenizer input".
  *
  * Shared determinism discipline: every sampling/sharding decision
  * derives from md5(doc_id) hex substrings — stable under reshuffles
  * and re-runs, reproducible in any engine. Distinct substring ranges
  * keep the decisions independent: chars 1-2 = q67 train/eval split,
  * 3-4 = q85 mixture, 5 = q91 pack shard, full string = q92 sample
  * rank.
  */
object CorpusExtOps extends OpModule {

  /** Greedy stream packing: within a shard, documents are laid out in
    * stable (doc_id) order and cut into packs of ≤ `budget` tokens by
    * the exclusive prefix sum. This is how training shards are packed
    * into fixed-length sequences: deterministic, restartable, and
    * parallel across shards (16 here; a parameter — at 100 TB use
    * O(cluster) shards, since packing within a shard is inherently
    * sequential). */
  private val packBudget = 2048

  /** PII redaction patterns — portable between java.util.regex and
    * RE2 (no backrefs, no lookaround). Scrub order matters: emails
    * first (they contain digit runs), then phones (structured digit
    * groups), then bare long digit runs. */
  private val emailPat = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  private val phonePat = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val idPat = "[0-9]{9}"

  /** The ordered redaction chain (email → phone → 9-digit run). The
    * replacement tags contain no lowercase/digit runs the patterns can
    * re-match, so the scrub is idempotent — spec-asserted
    * (`scrub(scrub(x)) = scrub(x)`), the property that makes re-running
    * a pipeline over already-cleaned text safe. */
  private[graft] def scrub(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      lit(emailPat), lit("<EMAIL>")),
      lit(phonePat), lit("<PHONE>")),
      lit(idPat), lit("<ID>"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token-pair association mining (added r10) — Apriori-style lift,
    // the market-basket analytics family the suite lacked: which token
    // pairs CO-OCCUR in documents far more than independence predicts
    // (collocations, templated phrases, topic markers). Per doc the
    // DISTINCT token set explodes into ordered pairs (x < y) via a
    // doc-keyed self-join — cost Σ tokens(doc)², bounded by document
    // length, never corpus-quadratic (the q42 blocking argument; a
    // 100 TB run additionally df-caps the token list like q87, since a
    // stopword's pair list is pure noise). Support = co-occurrence doc
    // count; lift is made EXACT cross-engine by the q115/q118
    // fixed-point discipline: lift = P(xy)/(P(x)P(y)) =
    // n·c_xy/(c_x·c_y), scaled by 1e6 and integer-DIV'd — no floating
    // point, so an association metric becomes hash-checkable. Output:
    // the top 50 pairs by fixed-point lift at support ≥ 5. BIGINT
    // headroom: 1e6·c_xy·n ≤ 1e6·n² needs n ≤ ~3e6 docs — a 100 TB
    // run widens to decimal(38,0) exactly as q118 did.
    "q129_token_lift" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      val df = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      val n = docs.agg(count(lit(1)).as("n"))
      val pairs = toks.select(col("doc_id"), col("tok").as("x"))
        .join(toks.select(col("doc_id"), col("tok").as("y")), Seq("doc_id"))
        .where(col("x") < col("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
        .where(col("c_xy") >= 5)
      pairs
        .join(df.select(col("tok").as("x"), col("c").as("c_x")), Seq("x"))
        .join(df.select(col("tok").as("y"), col("c").as("c_y")), Seq("y"))
        .crossJoin(broadcast(n))
        .select(col("x"), col("y"), col("c_xy"),
                expr("(1000000 * c_xy * n) DIV (c_x * c_y)").as("lift_fp"))
        .orderBy(col("lift_fp").desc, col("x"), col("y"))
        .limit(50)
    },

    // Sequence packing for training shards (see packBudget above).
    // One scan; the prefix-sum window shuffles each shard's (doc_id,
    // token count) pairs — never the text — and the per-pack rollup
    // reuses that partitioning.
    "q91_pack_sequences" -> { (s, d) =>
      packRollup(s, d, size(split(col("text"), " ")).cast("long"))
    },

    // Sequence packing denominated in BPE tokens (added r9) — the
    // budget a training shard actually has is model-tokenizer tokens,
    // not whitespace words (the r7/r8 verdicts' accounting gap, closed
    // by q101): the SAME 2048-token budget and prefix-sum layout as
    // q91, with each document's length measured by the frozen-merge
    // BPE tokenizer. The tokenizer is a codegen'd projection (q101),
    // so the scale shape is unchanged: the prefix-sum window still
    // shuffles only (doc_id, count) pairs — the text never moves.
    "q106_pack_bpe" -> { (s, d) =>
      packRollup(s, d, TextExtOps.bpeTokenCount)
    },

    // Exact stratified sample: the k=50 hash-smallest docs per lang —
    // deterministic (no seed, no partition dependence) and bounded.
    // Implemented with [[MinKByKeyAgg]], not a rank window: map-side
    // partial aggregation reduces every partition to ≤ 50 rows per
    // stratum before the shuffle, so the full corpus never funnels
    // through one reducer per stratum.
    "q92_stratified_sample" -> { (s, d) =>
      val mink = udaf(new MinKByKeyAgg(50))
      Tables(s, d, "documents")
        .groupBy("lang")
        .agg(mink(md5(col("doc_id").cast("string")), col("doc_id"),
                  col("n_chars")).as("sample"))
        .select(col("lang"), posexplode(col("sample")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
                col("col._2").as("doc_id"), col("col._3").as("n_chars"))
        .orderBy("lang", "rk")
    },

    // PII scrubbing with an audit trail. The corpus has no raw contact
    // fields, so a contact blob is synthesized per customer from its
    // keys (deterministically — both engines build the identical
    // string); the operator under test is the scrub path: ordered
    // regex redaction + per-segment hit accounting, verified
    // byte-exact via the redacted length. Pure per-row projection +
    // tiny agg: one scan, 5-key shuffle at any scale.
    "q93_pii_scrub" -> { (s, d) =>
      val key = col("c_custkey")
      val blob = concat(
        col("c_name"),
        lit(" email:user"), key.cast("string"), lit("@example.com"),
        when(key % 3 === 0,
          concat(lit(" tel:+1-"), (key % 900 + 100).cast("string"),
                 lit("-"), lpad(((key * 7) % 1000).cast("string"), 3, "0"),
                 lit("-"), lpad(((key * 7919) % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(key % 5 === 0,
          concat(lit(" ref:"),
                 lpad(((key * 104729) % 1000000000).cast("string"), 9, "0")))
          .otherwise(lit("")))
      val clean = scrub(blob)
      Tables(s, d, "customer")
        .select(col("c_mktsegment"), blob.as("blob"), clean.as("clean"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("customers"),
             sum(size(regexp_extract_all(col("blob"), lit(emailPat), lit(0))))
               .as("email_hits"),
             sum(size(regexp_extract_all(col("blob"), lit(phonePat), lit(0))))
               .as("phone_hits"),
             sum(size(regexp_extract_all(col("clean"), lit("<ID>"), lit(0))))
               .as("id_hits"),
             sum(length(col("clean"))).as("clean_chars"))
        .orderBy("c_mktsegment")
    },

    // TF-IDF top term per document. The document-frequency table joins
    // the tf rows on `word` WITHOUT a broadcast hint: at web scale the
    // distinct-token space is billions of rows (typos, URLs, numbers) —
    // not a broadcastable dimension — and tf is already keyed by
    // (doc_id, word), so the shuffle join on `word` is the scale-safe
    // plan; at test scale AQE still turns it into a broadcast join on
    // its own (threshold-driven, asserted in PlanShapeSpec). Only the
    // one-row corpus-size scalar keeps an explicit broadcast. Scores
    // are rounded to 6 dp BEFORE ranking so the ordering is identical
    // in both engines (ties broken by word).
    "q94_tfidf" -> { (s, d) =>
      val words = Tables(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfreq = words.groupBy("word")
        .agg(countDistinct(col("doc_id")).as("df"))
      val n = words.agg(countDistinct(col("doc_id")).as("n"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("word"))
      tf.join(dfreq, "word").crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") * log(col("n").cast("double") / col("df")), 6))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("doc_id"), col("word").as("top_term"),
                col("tf"), col("df"), col("score"))
        .orderBy("doc_id")
    },

    // Distributed sparse matrix multiply (added r12) — C = A·B where A
    // is the corpus doc-term count matrix (sparse COO triples from the
    // token stream) and B a deterministic term-topic factor (vocab × 4
    // topics; weights derived arithmetically from the term string so
    // both engines build the identical matrix — standing in for a
    // trained topic/classifier head). This is the "apply a linear
    // model to the corpus" kernel behind topic scoring, shallow
    // classification and feature projection. Shapes: A materializes by
    // ONE (doc, term) shuffle; B is vocabulary-bounded and BROADCAST
    // (the trained-model case — a vocab×topics factor fits an
    // executor); C aggregates on (doc, topic) — Spark's partial
    // aggregation combines map-side, so the shuffle carries ≤
    // |docs|×topics rows, never the token stream. When B outgrows
    // broadcast (embedding-sized factors), the general SpMM shuffles A
    // on term and re-aggregates — same plan minus the hint. All-integer
    // arithmetic ⇒ hash-exact.
    "q178_sparse_matmul" -> { (s, d) =>
      val tf = Tables(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .where(length(col("t")) > 0)
        .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      val factor = tf.select("t").distinct()
        .select(col("t"), explode(sequence(lit(0L), lit(3L))).as("topic"))
        .withColumn("w",
          pmod(length(col("t")) * (col("topic") + 1) +
               ascii(substring(col("t"), 1, 1)) * (col("topic") + 2),
               lit(7)) - 3)
      tf.join(broadcast(factor), Seq("t"))
        .groupBy("doc_id", "topic")
        .agg(sum(col("tf") * col("w")).as("score"))
        .orderBy("doc_id", "topic")
    },

    // Overlapping token-window chunking (size 50, stride 40) — the
    // retrieval/context-window prep step. One generator (chunk starts
    // per doc) + one per-doc rollup; chunk counts and coverage are
    // computed from lengths alone, so the text never re-shuffles.
    "q95_chunk_windows" -> { (s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
        .select(col("doc_id"), col("n"),
                explode(sequence(lit(0), col("n") - 1, lit(40))).as("start"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
             sum(least(lit(50), col("n") - col("start"))).cast("long")
               .as("chunk_tokens"),
             max(col("n")).as("n"))
        .select(col("doc_id"), col("n_chunks"), col("chunk_tokens"),
                round(col("chunk_tokens").cast("double") / col("n"), 6)
                  .as("coverage"))
        .orderBy("doc_id")
    },

    // Class-balanced downsampling (added r12) — the rebalancing step
    // between q92's fixed-k strata and q85's ratio mixing: cap EVERY
    // language at the SMALLEST class's size, the deterministic
    // undersampling a classifier-training prep runs when the majority
    // class would drown the loss. Selection is q67's no-RNG draw —
    // rank by (md5(doc_id), doc_id) within each class, keep rank ≤ m
    // where m is the broadcast min class size — so the sample is
    // identical across engines, partitionings, and re-runs, and
    // adding documents to OTHER classes never changes a class's kept
    // set (only m can move it). One scan, one lang shuffle for the
    // rank, a ≤ langs-row class-count table broadcast back. The
    // audit output checksums the selection (kept char mass) so the
    // oracle pins membership, not just counts.
    "q240_class_balance" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
                md5(col("doc_id").cast("string")).as("u"))
      val m = docs.groupBy("lang").agg(count(lit(1)).as("cn"))
        .agg(min("cn").as("m"))
      docs.withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy("u", "doc_id")))
        .crossJoin(broadcast(m))
        .where(col("rk") <= col("m"))
        .groupBy("lang")
        .agg(count(lit(1)).as("kept"),
             sum(col("n_chars").cast("decimal(28,0)")).cast("long")
               .as("kept_chars"),
             min(col("u")).as("first_u"))
        .orderBy("lang")
    },

    // Negative-sampling draw audit (added r12) — the weighted
    // categorical sampler under word2vec-style training: draws follow
    // the unigram^0.75 distribution (the exponent that keeps frequent
    // tokens from swamping the negatives), with q67's no-RNG
    // discipline — draw i's uniform comes from md5(i), so the sample
    // is identical across engines, partitionings and re-runs. The
    // alias-table-free formulation: token weights w = count^0.75
    // rounded 6 dp become exact INTEGERS at ×10⁶, the cumulative
    // [lo, hi) ladder is an integer prefix sum over the vocabulary
    // (tok-ordered), and each draw lands by integer interval
    // containment — a range join against the BROADCAST vocab ladder
    // (web-scale path: bucketize the ladder, q75's machinery; the
    // modulo fold of the 48-bit hash is the declared uniform, its
    // ≤2⁻³² residue bias documented). Report: top-20 sampled tokens
    // vs expectation k·w/T — the sanity audit that the sampler's
    // empirical distribution tracks the designed one.
    "q265_neg_sampling" -> { (s, d) =>
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      val wCum = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = Tables(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("t"))
        .where(length(col("t")) > 0)
        .groupBy("t").agg(count(lit(1)).as("c"))
        .withColumn("wi",
          (round(pow(dd(col("c")), 0.75), 6).cast("decimal(18,6)") *
             1000000).cast("long"))
        .withColumn("hi", sum("wi").over(wCum))
        .withColumn("lo", col("hi") - col("wi"))
      val tot = cum.agg(max("hi").as("tt"))
      val draws = s.range(1, 1001).toDF("i")
        .crossJoin(broadcast(tot))
        .select((conv(substring(md5(col("i").cast("string")), 1, 12),
                      16, 10).cast("long") % col("tt")).as("u"))
      draws
        .join(broadcast(cum.select(col("t"), col("lo"), col("hi"),
                                   col("wi"))),
              col("u") >= col("lo") && col("u") < col("hi"))
        .groupBy("t", "wi")
        .agg(count(lit(1)).as("sampled"))
        .crossJoin(broadcast(tot))
        .withColumn("expected",
          round(lit(1000.0) * dd(col("wi")) / dd(col("tt")), 6))
        .select(col("t").as("token"), col("sampled"), col("expected"),
                round(dd(col("sampled")) / col("expected"), 6)
                  .as("ratio"))
        .orderBy(col("sampled").desc, col("token"))
        .limit(20)
    }
  )

  /** The greedy prefix-sum pack rollup shared by q91 (whitespace
    * tokens) and q106 (BPE tokens): stable doc_id order within 16
    * md5 shards, packs cut at `packBudget` by the EXCLUSIVE prefix
    * sum, per-(shard, pack) doc/token rollup. Only (doc_id, count)
    * pairs ever shuffle. */
  private def packRollup(s: SparkSession, d: String,
                         toks: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(s, d, "documents")
      .select(col("doc_id"),
              substring(md5(col("doc_id").cast("string")), 5, 1).as("shard"),
              toks.as("toks"))
      .withColumn("pack_id",
        floor(coalesce(sum(col("toks")).over(w), lit(0L)) / packBudget))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("docs"), sum(col("toks")).as("tokens"))
      .orderBy("shard", "pack_id")
  }

  /** q91/q106's oracle at a given token-count SQL expression. */
  private def packRollupSql(toksSql: String): String =
    s"""WITH t AS (
       |  SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 5, 1) AS shard,
       |         $toksSql AS toks
       |  FROM documents),
       |p AS (
       |  SELECT shard, toks,
       |    CAST(floor(COALESCE(sum(toks) OVER (PARTITION BY shard
       |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) / $packBudget.0) AS BIGINT) AS pack_id
       |  FROM t)
       |SELECT shard, pack_id, count(*) AS docs,
       |  CAST(sum(toks) AS BIGINT) AS tokens
       |FROM p GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin

  def oracles: Map[String, String] = Map(
    // same md5 rank within class, same broadcast min-class cap
    "q240_class_balance" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars,
        |    md5(CAST(doc_id AS VARCHAR)) AS u
        |  FROM documents),
        |m AS (SELECT min(cn) AS m FROM (
        |        SELECT count(*) AS cn FROM d GROUP BY lang)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |        ORDER BY u, doc_id) AS rk FROM d)
        |SELECT lang, count(*) AS kept,
        |  CAST(sum(CAST(n_chars AS DECIMAL(28,0))) AS BIGINT)
        |    AS kept_chars,
        |  min(u) AS first_u
        |FROM r CROSS JOIN m WHERE rk <= m.m
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // identical fixed-point lift: integer scale + integer division
    "q129_token_lift" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
        |    AS tok
        |  FROM documents),
        |df AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
        |n AS (SELECT count(*) AS n FROM documents),
        |p AS (
        |  SELECT a.tok AS x, b.tok AS y, count(*) AS c_xy
        |  FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT p.x, p.y, p.c_xy,
        |  (1000000 * p.c_xy * n.n) // (dx.c * dy.c) AS lift_fp
        |FROM p JOIN df dx ON dx.tok = p.x
        |       JOIN df dy ON dy.tok = p.y, n
        |ORDER BY lift_fp DESC, x, y LIMIT 50""".stripMargin,
    "q106_pack_bpe" -> packRollupSql(TextExtOps.bpeTokenCountSql),

    "q91_pack_sequences" -> packRollupSql("len(string_split(text, ' '))"),

    "q92_stratified_sample" ->
      """SELECT lang, rk, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 50 ORDER BY lang, rk""".stripMargin,

    "q93_pii_scrub" ->
      """WITH b AS (
        |  SELECT c_mktsegment,
        |    c_name || ' email:user' || CAST(c_custkey AS VARCHAR) || '@example.com'
        |    || CASE WHEN c_custkey % 3 = 0
        |       THEN ' tel:+1-' || CAST(c_custkey % 900 + 100 AS VARCHAR)
        |         || '-' || lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0')
        |         || '-' || lpad(CAST((c_custkey * 7919) % 10000 AS VARCHAR), 4, '0')
        |       ELSE '' END
        |    || CASE WHEN c_custkey % 5 = 0
        |       THEN ' ref:' || lpad(CAST((c_custkey * 104729) % 1000000000 AS VARCHAR), 9, '0')
        |       ELSE '' END AS blob
        |  FROM customer),
        |c AS (
        |  SELECT c_mktsegment, blob,
        |    regexp_replace(regexp_replace(regexp_replace(blob,
        |      '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
        |      '\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |      '[0-9]{9}', '<ID>', 'g') AS clean
        |  FROM b)
        |SELECT c_mktsegment, count(*) AS customers,
        |  CAST(sum(len(regexp_extract_all(blob, '[a-z0-9]+@[a-z]+\.[a-z]+'))) AS BIGINT)
        |    AS email_hits,
        |  CAST(sum(len(regexp_extract_all(blob, '\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}'))) AS BIGINT)
        |    AS phone_hits,
        |  CAST(sum(len(regexp_extract_all(clean, '<ID>'))) AS BIGINT) AS id_hits,
        |  CAST(sum(len(clean)) AS BIGINT) AS clean_chars
        |FROM c GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q178_sparse_matmul" ->
      """WITH tf AS (
        |  SELECT doc_id, t, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |    FROM documents)
        |  WHERE length(t) > 0 GROUP BY 1, 2),
        |v AS (SELECT DISTINCT t FROM tf),
        |b AS (SELECT t, r.topic,
        |    (length(t) * (r.topic + 1) +
        |     ord(substr(t, 1, 1)) * (r.topic + 2)) % 7 - 3 AS w
        |  FROM v CROSS JOIN range(0, 4) r(topic))
        |SELECT tf.doc_id, b.topic,
        |  CAST(sum(tf.tf * b.w) AS BIGINT) AS score
        |FROM tf JOIN b USING (t)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q94_tfidf" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
        |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM w),
        |sc AS (
        |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |    round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
        |  FROM tf JOIN df USING (word) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, word) AS rk FROM sc)
        |SELECT doc_id, word AS top_term, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, score
        |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "q95_chunk_windows" ->
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, n, unnest(range(0, n, 40)) AS start FROM t)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(least(50, n - start)) AS BIGINT) AS chunk_tokens,
        |  round(CAST(sum(least(50, n - start)) AS DOUBLE) / max(n), 6) AS coverage
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q265_neg_sampling" ->
      """WITH tc AS (
        |  SELECT t, count(*) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t
        |    FROM documents) WHERE len(t) > 0 GROUP BY 1),
        |cum AS (SELECT t,
        |    CAST(CAST(round(pow(CAST(c AS DOUBLE), 0.75), 6)
        |              AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS wi
        |  FROM tc),
        |lad AS (SELECT t, wi,
        |    sum(wi) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
        |  FROM cum),
        |lad2 AS (SELECT t, wi, hi, hi - wi AS lo FROM lad),
        |tot AS (SELECT max(hi) AS tt FROM lad2),
        |draws AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 12))
        |         AS BIGINT) % tt AS u
        |  FROM range(1, 1001) r(i), tot),
        |hits AS (SELECT l.t, l.wi, count(*) AS sampled
        |  FROM draws d JOIN lad2 l ON d.u >= l.lo AND d.u < l.hi
        |  GROUP BY 1, 2),
        |f AS (SELECT t AS token, sampled,
        |    round(1000.0 * CAST(wi AS DOUBLE) / CAST(tt AS DOUBLE), 6)
        |      AS expected
        |  FROM hits, tot)
        |SELECT token, sampled, expected,
        |  round(CAST(sampled AS DOUBLE) / expected, 6) AS ratio
        |FROM f ORDER BY sampled DESC, token LIMIT 20""".stripMargin
  )
}
