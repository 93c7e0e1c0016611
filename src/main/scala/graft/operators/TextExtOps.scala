package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM data pipelines (SURVEY.md §2B
  * q48–q51): trigram language-ID heuristic, quality scoring, token
  * counting, shingle fingerprinting.
  *
  * All four are pure per-row projections + one keyed aggregation — they
  * scan the corpus once, stay inside whole-stage codegen, and shuffle
  * only the (small) aggregated key space, so they scale linearly with
  * corpus size.
  */
object TextExtOps extends OpModule {

  /** Occurrences of a trigram in text via the length-difference trick —
    * portable to any SQL engine. */
  // literal (non-regex) replace on both engines: the trigrams are plain
  // strings, and a regex scan per (doc × trigram) is pure overhead
  private def occ(tg: String): Column =
    (length(col("text")) - length(expr(s"replace(text, '$tg', '')"))) / lit(3)

  private val langTrigrams: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "ein", "sch"),
    "en" -> Seq("the", "and", "ing"),
    "es" -> Seq("que", "los", "nte"),
    "fr" -> Seq("les", "ent", "our"))

  /** The composite quality score shared by q49 and q81 (one definition
    * on each side keeps "q81 uses q49's formula" structural): length
    * saturation + stopword ratio + alphabetic-character ratio, round 6,
    * identical operand order in both engines. */
  private[operators] def qualityScore: Column = {
    val toks = split(col("text"), " ")
    val stop = size(filter(toks, t => t.isin("a", "the", "of", "and", "in")))
      .cast("double") / size(toks)
    val alpha = length(regexp_replace(col("text"), "[^a-z]", ""))
      .cast("double") / length(col("text"))
    val lenScore = least(lit(1.0), col("n_chars").cast("double") / 400)
    round(lenScore * 0.4 + stop * 0.3 + alpha * 0.3, 6)
  }

  private[operators] val qualityScoreSql: String =
    """round(least(1.0, CAST(n_chars AS DOUBLE) / 400) * 0.4 +
      |      CAST(len(list_filter(string_split(text, ' '),
      |                           t -> t IN ('a','the','of','and','in'))) AS DOUBLE) /
      |        len(string_split(text, ' ')) * 0.3 +
      |      CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) /
      |        len(text) * 0.3, 6)""".stripMargin

  /** q299's vocab cap: BPE merges are learned from the top-N words by
    * (freq desc, word) — the deterministic dict bound every production
    * BPE trainer applies, and what keeps training vocab-bound at any
    * corpus size. */
  private val BpeTrainVocabCap = 4096

  /** The stable hash train/eval split rule shared by q67, q81 and —
    * through doc_id ≡ vec_id (q45) — q120's semantic sweep: membership
    * depends only on the key (~75/25 via first md5 nibble). */
  private[operators] def splitOf(key: Column): Column =
    when(substring(md5(key.cast("string")), 1, 1) <= "b", "train")
      .otherwise("eval")

  private def trainSplit: Column = splitOf(col("doc_id"))

  private val trainSplitSql: String =
    """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
      |     THEN 'train' ELSE 'eval' END""".stripMargin

  /** The q85 mixture-keep rule, shared with the composed pipeline
    * (q104): curated sources 0-4 keep all, mid 5-11 keep ~1/2, tail
    * ~1/4, membership by md5 chars 3-4 (independent of q67's split
    * bit, chars 1-2). */
  private[operators] def mixtureKeep: Column = {
    val idx = expr("CAST(substring(source, 4) AS INT)")
    val u = substring(md5(col("doc_id").cast("string")), 3, 2)
    when(idx < 5, lit(true)).when(idx < 12, u <= "7f").otherwise(u <= "3f")
  }

  private[operators] val mixtureKeepSql: String =
    """CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN TRUE
      |     WHEN CAST(substr(source, 4) AS INT) < 12
      |       THEN substr(md5(CAST(doc_id AS VARCHAR)), 3, 2) <= '7f'
      |     ELSE substr(md5(CAST(doc_id AS VARCHAR)), 3, 2) <= '3f'
      |END""".stripMargin

  /** Deterministic BPE merge table (q101) — the first 24 merges of a
    * standard byte-pair-encoding training run over this corpus's
    * unigram frequencies (computed offline once; the table is a FIXED
    * public constant, the way a production tokenizer ships a frozen
    * merges.txt). Tokenizer INFERENCE applies merges in rank order,
    * each as a left-to-right pass over the word — which both engines
    * replay exactly via the marker formulation below. No merge has
    * identical left/right tokens (spec-guarded): that is the condition
    * under which the doubled literal-replace application is exact. */
  private[graft] val BpeMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r", "s" -> "t",
    "m" -> "er", "a" -> "t", "l" -> "u", "a" -> "r", "p" -> "ar",
    "j" -> "o", "jo" -> "in", "a" -> "s", "as" -> "h", "h" -> "ash",
    "r" -> "ow", "at" -> "c", "atc" -> "h", "b" -> "atch", "a" -> "n",
    "c" -> "an", "s" -> "can", "c" -> "o", "co" -> "lu")

  /** BPE-tokenize the whole `text` column in ONE codegen'd string
    * expression — no UDF, no explode, no per-word lambda. Marker
    * representation: every character is prefixed with `|` (a char
    * absent from the corpus alphabet) plus a trailing sentinel, so
    * token boundaries are explicit (`the` → `|t|h|e|`); merge (a,b)
    * is then the literal replace `|a|b|` → `|ab|`, applied twice —
    * one replace pass consumes the trailing marker of a match, which
    * is the LEADING marker of an immediately-adjacent occurrence, and
    * the second pass picks up those skipped matches (exact for
    * left≠right merges, which the table guarantees; validated against
    * a reference BPE implementation in CorrectnessSpec's replay).
    * Word boundaries need no special casing: the space character
    * becomes its own `| |` token and no merge contains a space.
    * Per-doc BPE token count = (#markers − 1) − (#words − 1) — total
    * tokens minus the spurious space tokens. */
  private def bpeMarked: Column =
    BpeMerges.foldLeft(
      concat(regexp_replace(col("text"), "(.)", "|$1"), lit("|"))) {
      case (c, (a, b)) =>
        val p = lit(s"|$a|$b|"); val r = lit(s"|$a$b|")
        replace(replace(c, p, r), p, r)
    }

  private[graft] def bpeTokenCount: Column =
    (length(bpeMarked) - length(replace(bpeMarked, lit("|"), lit(""))) -
     size(split(col("text"), " "))).cast("long")

  /** The corpus's FULL merge closure (q121) — the same offline BPE
    * training run as [[BpeMerges]] continued past 24 until it
    * exhausts: at merge 90 no left≠right adjacent pair remains in any
    * word type (the corpus's small vocabulary closes — the table ends
    * with whole words: customer, vector, window, spark, query, …).
    * (x,x) merges are excluded from training candidacy, which keeps
    * the doubled-replace SQL replay exact (q101's precondition) AND is
    * harmless to coverage: a run of equal tokens has no mixed pair to
    * merge first. Tie-break: highest pair count, then lexicographically
    * smallest pair — fully deterministic, so the table is a fixed
    * public constant like a production tokenizer's merges.txt. */
  private[graft] val BpeMergesFull: Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r", "s" -> "t",
    "m" -> "er", "a" -> "t", "l" -> "u", "a" -> "r", "p" -> "ar",
    "j" -> "o", "jo" -> "in", "a" -> "s", "as" -> "h", "h" -> "ash",
    "r" -> "ow", "at" -> "c", "atc" -> "h", "b" -> "atch", "a" -> "n",
    "c" -> "an", "s" -> "can", "c" -> "o", "c" -> "u", "co" -> "lu",
    "colu" -> "m", "colum" -> "n", "cu" -> "st", "cust" -> "o", "custo" -> "mer",
    "f" -> "i", "fi" -> "l", "fil" -> "t", "filt" -> "er", "a" -> "l",
    "al" -> "l", "m" -> "all", "s" -> "mall", "g" -> "e", "l" -> "ow",
    "mer" -> "ge", "s" -> "low", "c" -> "t", "ct" -> "or", "d" -> "er",
    "e" -> "ctor", "or" -> "der", "v" -> "ector", "in" -> "e", "l" -> "ine",
    "a" -> "b", "ab" -> "l", "abl" -> "e", "at" -> "a", "d" -> "ata",
    "t" -> "able", "u" -> "p", "a" -> "g", "ag" -> "g", "a" -> "lu",
    "alu" -> "e", "v" -> "alue", "e" -> "y", "k" -> "ey", "a" -> "m",
    "e" -> "am", "r" -> "eam", "st" -> "ream", "d" -> "ow", "in" -> "dow",
    "w" -> "indow", "par" -> "k", "s" -> "park", "g" -> "r", "gr" -> "o",
    "gro" -> "up", "par" -> "t", "b" -> "i", "bi" -> "g", "or" -> "t",
    "s" -> "ort", "er" -> "y", "q" -> "u", "qu" -> "ery", "a" -> "st",
    "f" -> "ast", "h" -> "e", "t" -> "he", "d" -> "up")

  private def bpeMarkedSql: String =
    BpeMerges.foldLeft("""regexp_replace(text, '(.)', '|\1', 'g') || '|'""") {
      case (e, (a, b)) =>
        s"replace(replace($e, '|$a|$b|', '|$a$b|'), '|$a|$b|', '|$a$b|')"
    }

  private[graft] def bpeTokenCountSql: String =
    s"""(len($bpeMarkedSql) - len(replace($bpeMarkedSql, '|', ''))
       | - len(string_split(text, ' ')))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Trigram-vote language ID; argmax with fixed priority order, then
    // confusion matrix against the labeled lang column.
    "q48_lang_id" -> { (s, d) =>
      val scored = langTrigrams.foldLeft(Tables(s, d, "documents")) {
        case (df, (lg, tgs)) =>
          df.withColumn(s"s_$lg", tgs.map(occ).reduce(_ + _))
      }
      val langs = langTrigrams.map(_._1)
      val pred = langs.init.foldRight(lit(langs.last): Column) { (lg, els) =>
        val ge = langs.filter(_ != lg)
          .map(o => col(s"s_$lg") >= col(s"s_$o")).reduce(_ && _)
        when(ge, lit(lg)).otherwise(els)
      }
      scored.withColumn("pred", pred)
        .groupBy("lang", "pred").agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "pred")
    },

    // TRAINED language ID (added r15 — the r14 verdict's #5): q48
    // votes with a hand-fixed trigram table; every real intake
    // pipeline instead TRAINS the detector and computes `lang` for
    // unlabeled arrivals — here the Cavnar–Trenkle 1994 rank-profile
    // classifier, the classic n-gram method production langid tools
    // descend from. Train: per-language profiles = the top-64
    // character trigrams of the EVEN docs by (count desc, gram) with
    // their ranks. Classify: each ODD doc builds its own top-64
    // profile and scores every language by out-of-place distance —
    // Σ over the doc's profile grams of |doc rank − profile rank|,
    // with a miss costing the max displacement 64 (computed as
    // 64·|doc grams| − Σ matched (64 − |Δrank|), so only the MATCHED
    // join rows are ever touched); argmin wins, ties to the smaller
    // language code. Report: the confusion matrix against the labeled
    // `lang` column with per-true-language shares — the held-out
    // accuracy card a pipeline reviews before trusting the detector.
    // (On THIS synthetic corpus all languages draw from one token
    // vocabulary, so the matrix honestly reports near-chance
    // separation — the operator's mechanics, not the corpus's
    // signal, are what the oracle certifies.) Scale shape: the gram
    // emission is a pure per-row map (no doc-keyed shuffle before the
    // per-doc count); the language profiles live on a (lang, gram)
    // cell table bounded by the trigram space and broadcast to the
    // classify side; per-doc ranks/argmin ride doc_id-partitioned
    // windows. One corpus scan per side, everything else is bounded.
    "q348_langid_train" -> { (s, d) =>
      import s.implicits._
      val W = org.apache.spark.sql.expressions.Window
      val P = 64
      val docs = Tables(s, d, "documents")
        .where(length(col("text")) >= 3)
      // r19 optimization: the SQL gram emission exploded EVERY trigram
      // occurrence (substring(text, i, 3) per position — O(len) per
      // call on UTF8String, O(len²) per doc) into per-occurrence rows,
      // then paid a (doc, g)-keyed groupBy AND a doc-keyed rank window
      // to recover per-doc counts that never needed to leave the doc's
      // own row — 10.1 s of task time at sf0.1 (guide §1.1 census;
      // §2.3: aggregate before you shuffle). The typed per-doc fold
      // (the simhash64Fps discipline) counts trigrams in one pass per
      // doc; `cmp` is UTF8String's unsigned-byte order, so the in-map
      // (count desc, gram) top-64 IS row_number(orderBy(c desc, g))
      // bit for bit. The corpus is single-space ASCII (all SFs), where
      // Java char indexing == Spark's codepoint substring semantics.
      def gramMap(text: String): java.util.HashMap[String, Long] = {
        val m = new java.util.HashMap[String, Long]()
        var i = 0
        while (i + 3 <= text.length) {
          m.merge(text.substring(i, i + 3), 1L, _ + _); i += 1
        }
        m
      }
      def cmp(a: String, b: String): Int =
        java.util.Arrays.compareUnsigned(
          a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val prof = docs.where(col("doc_id") % 2 === 0)
        .select(col("lang"), col("text")).as[(String, String)]
        .mapPartitions(_.flatMap { case (lang, text) =>
          import scala.jdk.CollectionConverters._
          gramMap(text).entrySet().asScala
            .map(e => (lang, e.getKey, e.getValue))
        }).toDF("lang", "g", "c")
        .groupBy("lang", "g").agg(sum("c").as("c"))
        .withColumn("lr", row_number().over(
          W.partitionBy("lang").orderBy(col("c").desc, col("g"))))
        .where(col("lr") <= P)
        .select(col("lang").as("plang"), col("g"), col("lr"))
      val dp = docs.where(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .mapPartitions(_.flatMap { case (id, lang, text) =>
          import scala.jdk.CollectionConverters._
          val arr = gramMap(text).entrySet().asScala
            .map(e => (e.getKey, e.getValue)).toArray
          scala.util.Sorting.stableSort(arr,
            (x: (String, Long), y: (String, Long)) =>
              if (x._2 != y._2) x._2 > y._2 else cmp(x._1, y._1) < 0)
          arr.take(P).zipWithIndex
            .map { case ((g, c), i) => (id, lang, g, c, (i + 1)) }
        }).toDF("doc_id", "lang", "g", "c", "dr")
      val nd = dp.groupBy("doc_id", "lang")
        .agg(count(lit(1)).cast("long").as("ng"))
      val gain = dp.join(broadcast(prof), Seq("g"))
        .groupBy("doc_id", "plang")
        .agg(sum(lit(P.toLong) - abs(col("dr") - col("lr")).cast("long"))
               .as("gain"))
      val pred = nd
        .crossJoin(broadcast(prof.select("plang").distinct()))
        .join(gain, Seq("doc_id", "plang"), "left")
        .select(col("doc_id"), col("lang"), col("plang"),
                (lit(P.toLong) * col("ng") -
                 coalesce(col("gain"), lit(0L))).as("dist"))
        .withColumn("rn", row_number().over(
          W.partitionBy("doc_id").orderBy(col("dist"), col("plang"))))
        .where(col("rn") === 1)
      pred
        .groupBy(col("lang").as("lang_true"), col("plang").as("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("share", round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(W.partitionBy("lang_true")), 6))
        .orderBy("lang_true", "lang_pred")
    },

    // Composite quality score (see qualityScore above).
    "q49_quality_score" -> { (s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), qualityScore.as("score"))
        .orderBy("doc_id")
    },

    // Whitespace vs regex ("BPE-ish" alpha-run) token counts by lang.
    "q50_token_count" -> { (s, d) =>
      Tables(s, d, "documents")
        .select(col("lang"), col("n_chars"),
                size(split(col("text"), " ")).cast("long").as("ws"),
                expr("size(regexp_extract_all(text, '[a-z]+', 0))")
                  .cast("long").as("re"))
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
             sum(col("ws")).as("ws_tokens"),
             sum(col("re")).as("re_tokens"),
             round(sum(col("n_chars")).cast("double") / sum(col("ws")), 6)
               .as("chars_per_token"))
        .orderBy("lang")
    },

    // Deterministic hash-based train/eval split (the production way to
    // split a corpus: stable under reshuffles, joins, and re-runs —
    // membership depends only on the key; see trainSplit above).
    "q67_train_split" -> { (s, d) =>
      Tables(s, d, "documents")
        .groupBy(trainSplit.as("split"), col("lang"))
        .agg(count(lit(1)).as("docs"),
             round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
               .as("avg_chars"))
        .orderBy("split", "lang")
    },

    // ◐ seeded Bernoulli sampling — deterministic within a Spark config
    // but partition-layout dependent, so no cross-engine oracle.
    "q68_sample" -> { (s, d) =>
      Tables(s, d, "documents").sample(withReplacement = false, 0.2, seed = 42)
        .groupBy("lang").agg(count(lit(1)).as("docs"))
        .orderBy("lang")
    },

    // End-to-end corpus preparation (added r5) — the full training-data
    // job the surrounding operators are stages of: quality-score every
    // document (q49's formula), drop the low-quality tail, exact-dedup
    // the survivors on content hash keeping the lowest doc_id (q41's
    // discipline), split train/eval by stable key hash (q67's rule),
    // and emit per-(split, lang) corpus stats. Cost at scale: one
    // corpus scan, one narrow shuffle on the content hash (the dedup
    // window), one aggregation shuffle on the tiny (split, lang) key
    // space — each stage keeps the scale shape its standalone operator
    // established. avg_score sums DECIMAL(18,6) (the rounded score's
    // exact width) so partial-aggregation order cannot perturb it.
    "q81_corpus_prep" -> { (s, d) =>
      val scored = Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("text"),
                qualityScore.as("score"))
        .where(col("score") >= 0.5)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(sha2(col("text"), 256))
      val deduped = scored
        .withColumn("keeper", min(col("doc_id")).over(w))
        .where(col("doc_id") === col("keeper"))
      deduped
        .groupBy(trainSplit.as("split"), col("lang"))
        .agg(count(lit(1)).as("docs"),
             sum(size(split(col("text"), " ")).cast("long")).as("ws_tokens"),
             round(sum(col("score").cast("decimal(18,6)")).cast("double") /
                   count(lit(1)), 6).as("avg_score"))
        .orderBy("split", "lang")
    },

    // Within-document repetition ratio (added r6) — the Gopher/C4-style
    // quality signal the length/stopword score (q49) can't see: a doc
    // stuffed with the same phrase has few DISTINCT 2-grams relative to
    // its total. One generator + one per-doc aggregation: at 100 TB
    // this is a narrow shuffle on (doc_id, gram) for the distinct count
    // (partial aggregation dedups grams map-side first) — linear in
    // corpus size, never cross-document.
    "q84_repetition_ratio" -> { (s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"),
                org.apache.spark.sql.graft.GraftFunctions
                  .ngrams(split(col("text"), " "), 2).as("g"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
             countDistinct(col("g")).as("n_distinct"))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
                round(lit(1.0) - col("n_distinct").cast("double") /
                      col("n_grams"), 6).as("dup_ratio"))
        .orderBy("doc_id")
    },

    // Gopher-rule quality battery (added r16, the r15 verdict's #4;
    // Rae et al. 2022's Appendix-A quality filters as ONE per-doc
    // report) — the full rule battery a pretraining intake runs where
    // q49 (composite score) and q84 (repetition ratio) are single
    // fragments: per document, SEVEN pass/fail gates — word-count
    // bounds (50..100k), mean-word-length bounds (3..10 chars),
    // symbol-to-word ratio ('#'/'...' ≤ 0.1·words), alphabetic-word
    // share (≥ 80% of words contain [a-z]), stop-word floor (≥ 2
    // distinct of Gopher's 8-word list), top-2-gram character mass
    // (≤ 0.20 of chars), and duplicated-5-gram character mass
    // (≤ 0.15 of chars) — reported as pass/fail doc counts per rule
    // per source (the table a curation team reads to pick thresholds).
    // Every gate is an INTEGER cross-multiplied comparison (3n ≤ Σlen,
    // 10·sym ≤ n, 5·cnt·len(g) ≤ chars, 20·mass ≤ 3·chars …) — zero
    // float thresholds, hash-stable across engines. Cost: one corpus
    // scan for the six scalar gates plus two token-linear (doc, gram)
    // aggregations for the n-gram gates (q84's narrow-shuffle shape,
    // map-side combined); the report shuffle is |sources|×7 rows at
    // any volume.
    "q360_gopher_rules" -> { (s, d) =>
      val rules = Seq("r1_word_count", "r2_mean_word_len",
        "r3_symbol_ratio", "r4_alpha_words", "r5_stopwords",
        "r6_top2gram_mass", "r7_dup5gram_mass")
      gopherPerDoc(Tables(s, d, "documents"))
        .select(col("source"), expr(
          "stack(7, " + rules.map(r => s"'$r', $r").mkString(", ") +
            ") AS (rule, pass)"))
        .groupBy("source", "rule")
        .agg(sum(when(col("pass"), 1L).otherwise(0L)).as("pass_docs"),
             sum(when(col("pass"), 0L).otherwise(1L)).as("fail_docs"))
        .orderBy("source", "rule")
    },

    // Deterministic weighted corpus mixture (added r6) — training-data
    // mixing: each source tier keeps a different fraction of its docs,
    // membership decided by a stable key hash (same discipline as q67's
    // split — survives reshuffles and re-runs, needs no sort or state).
    // Tiers: curated sources 0-4 keep all, mid 5-11 keep ~1/2, tail
    // keeps ~1/4 (first md5 byte vs a hex threshold = rate·256). Uses
    // md5 chars 3-4 so mixture membership is INDEPENDENT of q67's
    // train/eval bit (chars 1-2). Pure map + tiny agg: one scan, one
    // 20-key shuffle at any corpus size.
    "q85_mixture_sample" -> { (s, d) =>
      val idx = expr("CAST(substring(source, 4) AS INT)")
      val weight = when(idx < 5, 1.0).when(idx < 12, 0.5).otherwise(0.25)
      val keep = mixtureKeep
      Tables(s, d, "documents")
        .groupBy("source")
        .agg(max(weight).as("weight"),
             count(lit(1)).as("total_docs"),
             sum(keep.cast("long")).as("kept_docs"),
             sum(when(keep, size(split(col("text"), " ")).cast("long"))
               .otherwise(0L)).as("kept_tokens"))
        .orderBy("source")
    },

    // Temperature-weighted source mixture (added r16, the r15
    // verdict's #5; the p_i ∝ n_i^α sampling rule of Raffel et al.
    // 2020 / Conneau et al. 2020 at α = 0.5) — q85 mixes by FIXED
    // per-tier ratios; production multilingual/multi-source mixes
    // compute the ratio FROM the data: a source's share of the token
    // budget ∝ √(its token count), which upweights small sources
    // without letting any source dominate. α = 0.5 because sqrt is
    // the one power both engines round identically; the weight is
    // then FIXED-POINT (w = round(√tokens · 1000) as BIGINT) so the
    // weight sum and every budget split are pure integer arithmetic —
    // a float Σw would depend on summation order. Budget B = ⌊Σtok/4⌋
    // (sample a quarter of the corpus), budget_i = (B·w_i) DIV Σw.
    // Selection = the q67 no-RNG draw (order by (md5(doc_id),
    // doc_id)); a doc is kept while its source's EXCLUSIVE prefix
    // token count is under budget — and that cumsum rides the
    // GlobalOrder bucket discipline, NOT a per-source running window
    // (a fact-scaled source would funnel through one partition —
    // the q270 defect class): within-bucket cumsums run partitioned
    // by (source, md5-prefix bucket), seams stitch through the
    // |sources|·256-row census table, bit-identical to the global
    // per-source cumsum because the bucket key is a prefix of the
    // order. Report: per source (docs, tokens, w, budget, kept docs,
    // kept tokens) — all BIGINT, hash-stable.
    "q361_temperature_mixture" -> { (s, d) =>
      val (bud, kept0) = budgetCut(Tables(s, d, "documents")
        .select(col("doc_id"), col("source"),
                size(split(col("text"), " ")).cast("long").as("tok")))
      val kept = kept0.groupBy("source")
        .agg(count(lit(1)).as("kept_docs"),
             sum("tok").as("kept_tokens"))
      bud.join(kept, Seq("source"), "left")
        .select(col("source"), col("docs"), col("tokens"), col("w"),
                col("budget"),
                coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
                coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
        .orderBy("source")
    },

    // EPOCH-CAPPED (repetition-aware) mixture (added r17, the r16
    // verdict's #5; the data-constrained recipe of Muennighoff et al.
    // 2023 — when the training budget EXCEEDS the corpus, sources
    // repeat, and repeats are only near-free up to a few epochs):
    // q361 temperature-samples a single pass (budget < corpus); here
    // the declared budget is B = 2·Σtok — a training run twice the
    // corpus — split by the same fixed-point √-weights, and every
    // source's grant is CAPPED at MixtureMaxEpochs (2) passes over
    // its own tokens. The surplus a capped source cannot absorb
    // redistributes ONCE to the sources still under cap,
    // ∝ their weights (one declared redistribution round — the full
    // waterfilling iterates to a fixpoint; a second round's residue
    // at this geometry is the leftover the report makes visible as
    // granted < desired on re-capped sources). All integer. Per
    // source: docs, tokens, w, desired, granted, capped flag,
    // full_epochs = granted DIV tokens, and the PARTIAL pass —
    // the md5-order take-until-budget draw (q361's prefixCut,
    // verbatim machinery) over the remainder granted MOD tokens —
    // as tail_docs/tail_tokens, plus eff_epochs_ppm = the realized
    // epochs in integer ppm. At sf0.01 ten of twenty sources cap
    // (the √-upweighting pushes every small source past 2 epochs)
    // and their surplus visibly lands on the uncapped ten.
    "q373_epoch_mixture" -> { (s, d) =>
      val t0 = Tables(s, d, "documents")
        .select(col("doc_id"), col("source"),
                size(split(col("text"), " ")).cast("long").as("tok"))
      val perSrc = t0.groupBy("source")
        .agg(count(lit(1)).as("docs"), sum("tok").as("tokens"))
        .withColumn("w",
          round(sqrt(col("tokens").cast("double")) * 1000).cast("long"))
      val tot = perSrc.agg(sum("tokens").as("tt"), sum("w").as("sw"))
      val d1 = perSrc.crossJoin(broadcast(tot))
        .withColumn("desired", expr("((2 * tt) * w) DIV sw"))
        .withColumn("cap", col("tokens") * lit(MixtureMaxEpochs))
        .withColumn("g1", least(col("desired"), col("cap")))
      val redis = d1.agg(
        sum(col("desired") - col("g1")).as("surplus"),
        sum(when(col("g1") < col("cap"), col("w")).otherwise(lit(0L)))
          .as("swu"))
      val d2 = d1.crossJoin(broadcast(redis))
        .withColumn("extra",
          when(col("g1") < col("cap") && col("swu") > 0,
               expr("(surplus * w) DIV swu")).otherwise(lit(0L)))
        .withColumn("granted", least(col("g1") + col("extra"),
                                     col("cap")))
      val tail = prefixCut(t0,
          d2.select(col("source"), expr("granted % tokens").as("budget")))
        .groupBy("source")
        .agg(count(lit(1)).as("tail_docs"), sum("tok").as("tail_tokens"))
      d2.join(tail, Seq("source"), "left")
        .select(col("source"), col("docs"), col("tokens"), col("w"),
                col("desired"), col("granted"),
                when(col("granted") === col("cap"), 1L).otherwise(0L)
                  .as("capped"),
                expr("granted DIV tokens").as("full_epochs"),
                coalesce(col("tail_docs"), lit(0L)).as("tail_docs"),
                coalesce(col("tail_tokens"), lit(0L)).as("tail_tokens"))
        .withColumn("eff_epochs_ppm", expr(
          "((full_epochs * tokens + tail_tokens) * 1000000) DIV tokens"))
        .orderBy("source")
    },

    // Sequence packing census (added r16; the concat-and-chunk
    // training-batch prep every LLM pipeline runs between the corpus
    // and the dataloader — Brown et al. 2020's "documents are
    // concatenated and chunked to the context length" step, the one
    // stage of the intake this engine's card did not yet cover):
    // documents concatenate in a DETERMINISTIC order (the q67 no-RNG
    // draw: (md5(doc_id), doc_id) — reshuffle/re-run stable, no
    // curriculum leak from ingest order) and the stream chunks into
    // fixed 2048-token sequences; a doc whose span crosses a chunk
    // boundary is SPLIT across sequences (concat packing has zero
    // padding; the cost it pays instead is fragmentation — split docs
    // lose attention contiguity), so the census a pipeline reads
    // before picking chunk length is: per source, docs, tokens, docs
    // split by a boundary, and the worst span (max chunks one doc
    // touches). Everything derives from each doc's EXCLUSIVE prefix
    // token count in the global order — first_chunk = pre DIV 2048,
    // last_chunk = (pre + tok − 1) DIV 2048 — and that GLOBAL cumsum
    // rides the GlobalOrder bucket discipline (within-bucket running
    // sums partitioned by the md5's first 2 hex chars, one 256-row
    // census window — never a single-partition sort of the corpus,
    // the q270 funnel class). All-integer ⇒ hash-exact.
    "q365_sequence_packing" -> { (s, d) =>
      packedPositions(s, d)
        .withColumn("fc", expr(s"pre DIV $PackLen"))
        .withColumn("lc", expr(s"(pre + tok - 1) DIV $PackLen"))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
             sum("tok").as("tokens"),
             sum(when(col("lc") > col("fc"), 1L).otherwise(0L))
               .as("split_docs"),
             max(col("lc") - col("fc") + 1).as("max_span"))
        .orderBy("source")
    },

    // Pack MANIFEST materialization (added r16, §12.1 candidate #4
    // promoted the same round it was recorded) — q365 is the census;
    // this is the artifact a dataloader actually consumes: one row
    // per 2048-token training sequence with its doc occupancy.
    // Per chunk: docs touching it, tokens filled (always 2048 except
    // the tail chunk — concat packing's zero-padding property as
    // DATA), lead_in (1 when the chunk starts mid-document — the
    // fragmentation the q365 census counts, now locatable), and
    // starts_doc (the doc covering the chunk's first token — the
    // deterministic seek key a loader shard uses to open the chunk).
    // Shape: each doc explodes to its chunk RANGE (sequence(fc, lc) —
    // Σ span lengths ≈ chunks + docs, linear), per-chunk contribution
    // is pure interval algebra min(pre+tok, (c+1)L) − max(pre, cL),
    // and the manifest is ⌈Σtok/2048⌉ rows at any volume — the output
    // scales with the TRAINING RUN, not the corpus row count.
    // All-integer ⇒ hash-exact.
    "q368_pack_manifest" -> { (s, d) =>
      packManifest(s, d, PackLen).orderBy("chunk_id")
    },

    // VERSIONED pack manifest (added r17, the r16 verdict's #4 —
    // "a training run PINS its data order and can time-travel it"):
    // q368 computes the dataloader manifest per run; here each pack
    // parameterization COMMITS as a SnapshotLog VERSION in a
    // corpus-fingerprint-keyed log (q357's promote discipline —
    // files first, one atomic manifest rename second, built in a
    // scratch dir and atomic-renamed into place; a mutated corpus
    // routes consumers to a fresh log): v1 = the 2048-token manifest
    // (q368's declared params), v2 = a 1024-token RE-PACK (the
    // shorter-context training run that supersedes it). The declared
    // query is the PINNED reader: it time-travel-reads v1 while the
    // log's latest is v2 — exactly what a training run does to
    // reproduce its data order after a re-pack has landed — and
    // stamps each row with (version, pack_len) so the lineage is
    // data. Oracle = q368's manifest text + the two pinned literals;
    // ArtifactCommitSpec drives the crash-between-files-and-manifest
    // window and the version-content contract.
    "q372_pack_manifest_log" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val root = packLogRoot(s, d)
      SnapshotLog.read(s, root, 1)
        .select(lit(1L).as("version"), lit(PackLen).as("pack_len"),
                col("chunk_id"), col("docs"), col("tokens"),
                col("lead_in"), col("starts_doc"))
        .orderBy("chunk_id")
    },

    // LM-ORDER saturation census (added r17, §13.1 candidate #5's
    // MEASUREMENT — before extending the KN stack another order, read
    // the number that says whether it would help): per n-gram order
    // 1..4 over the train split, the gram events (Σ max(len−n+1, 0)),
    // the DISTINCT grams (the rows an order-n KN marginal table would
    // hold — the artifact's growth curve), the SINGLETONS (grams seen
    // once — contexts where the KN discount backs the whole
    // probability off to the lower order), and two integer shares:
    // saturation_ppm = distinct/events (at 10⁶ every event is unique
    // and the order memorizes) and singleton_ppm = singletons/
    // distinct (the discount-mass share). The decision rule this
    // feeds: an order whose singleton share approaches 10⁶ adds
    // artifact rows without adding predictive mass — the measured
    // reason the q374 stack stops where it stops, as data instead of
    // a docstring claim. One scan per order, gram-keyed map-side
    // combined aggs; output is 4 rows at any volume.
    "q379_lm_order_census" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), trainSplit.as("split"),
                split(col("text"), " ").as("t"))
        .where(col("split") === "train")
      (1 to 4).map { n =>
        val gramsOf = expr(
          s"transform(sequence(1, size(t) - ${n - 1}), " +
            s"i -> array_join(slice(t, i, $n), ' '))")
        docs.where(size(col("t")) >= n)
          .select(explode(gramsOf).as("g"))
          .groupBy("g").agg(count(lit(1)).as("c"))
          .agg(sum("c").as("events"),
               count(lit(1)).as("distinct_grams"),
               sum(when(col("c") === 1, 1L).otherwise(0L))
                 .as("singletons"))
          .select(lit(n.toLong).as("ord"), col("events"),
                  col("distinct_grams"), col("singletons"),
                  expr("(1000000 * distinct_grams) DIV events")
                    .as("saturation_ppm"),
                  expr("(1000000 * singletons) DIV distinct_grams")
                    .as("singleton_ppm"))
      }.reduce(_ unionAll _).orderBy("ord")
    },

    // Pack-log RETENTION with branch-pinned protection (added r17,
    // §13.1 candidate #6 promoted the same round it was recorded) —
    // q372's log only ever grows; this is the retire step, q366's
    // grace-copy discipline with the wrinkle that makes it the PACK
    // log's: an old training run PINS its manifest as a BRANCH
    // (`run2048`, committed from v1's file list — zero data movement,
    // the q335 model), and retention must never collect a pinned
    // version's files. On a scratch copy of the live log: pin v1 as
    // the branch, vacuum keep = 1 — v1's MAIN manifest drops (status
    // `branch_only`) but its data files survive the GC because every
    // branch manifest pins its files (the SnapshotLog.vacuum union
    // rule, exercised here on purpose), and the report re-reads v1's
    // chunks COMPLETE through the branch while v2 serves from the
    // kept main manifest. The live log is never touched. Oracle:
    // chunk counts are ⌈Σtok/L⌉ per committed length — the retention
    // must be invisible to both readers.
    "q378_packlog_vacuum" -> { (s, d) =>
      val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
      val live = packLogRoot(s, d)
      val copy = java.nio.file.Files
        .createTempDirectory("graft_packlog_vac")
      graft.TempSweep.replaceAtExit("packlog_vac", copy)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(live).iterator.asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .foreach { p =>
          val rel = live.relativize(p)
          val dst = copy.resolve(rel.toString)
          java.nio.file.Files.createDirectories(dst.getParent)
          java.nio.file.Files.copy(p, dst)
        }
      SnapshotLog.branchCommit(copy, "run2048",
        SnapshotLog.files(copy, 1))
      val (_, dropped) = SnapshotLog.vacuum(copy, keep = 1)
      val st1 = if (dropped.contains(1)) "branch_only" else "kept"
      SnapshotLog.branchRead(s, copy, "run2048", 1)
        .agg(count(lit(1)).as("chunks"))
        .select(lit(1L).as("version"), lit(PackLen).as("pack_len"),
                lit(st1).as("status"), col("chunks"))
        .unionAll(SnapshotLog.read(s, copy, 2)
          .agg(count(lit(1)).as("chunks"))
          .select(lit(2L).as("version"), lit(1024L).as("pack_len"),
                  lit("kept").as("status"), col("chunks")))
        .orderBy("version")
    },

    // Composed QUALITY-intake pipeline v5 (added r16) — where v4
    // (q347) is the round's DEDUP funnel over the persisted artifacts,
    // v5 is the QUALITY funnel over the round's new gates, the other
    // half a production intake runs: the held-out quarter (q67's eval
    // split — the "incoming data judged by a fixed reference model"
    // population q301 established) flows through three gates IN
    // ORDER — (1) the Gopher rule battery (q360's per-doc booleans,
    // pass ≥ 6 of 7: the stop-word rule fails this synthetic
    // vocabulary wholesale, and a battery whose one dead rule vetoes
    // the corpus is a miscalibrated battery — the ≥6 floor is the
    // declared calibration, carried honestly from q360's card), (2)
    // the reference-LM perplexity gate — q301's per-doc avg NLL under
    // the TRAIN-split bigram LM, cut AT THE EVAL-SPLIT MEAN (CCNet's
    // head/tail split is perplexity-relative, and q301's absolute 8.0
    // flag line is VACUOUS on this synthetic corpus — measured max
    // 3.55 at sf0.01 — so an 8.0 gate would make the funnel's middle
    // stage a no-op; the mean is decimal-exact: 6-dp NLLs sum as
    // DECIMAL, one double divide, round 6). Docs too short to score
    // (under 2 tokens) drop, declared. And
    // (3) the temperature token budget (q361's machinery verbatim
    // over the survivors: √-weighted per-source budgets on ⌊Σtok/4⌋,
    // md5-order take-until-budget). Per-source report with the q282
    // funnel discipline: eval docs, per-gate survivors, budget, kept
    // docs + tokens. Every gate consumes the IDENTICAL factored body
    // its own declared query certifies (gopherPerDoc / pplPerDoc /
    // budgetCut — one truth per gate), so the funnel's claims are
    // exactly its parts'.
    "q364_pipeline_prep_v5" -> { (s, d) =>
      val rules = Seq("r1_word_count", "r2_mean_word_len",
        "r3_symbol_ratio", "r4_alpha_words", "r5_stopwords",
        "r6_top2gram_mass", "r7_dup5gram_mass")
      // the eval filter applies BEFORE the battery: the gram
      // aggregations (the funnel's dominant cost term) run over the
      // quarter they score, not the corpus
      // r19 (guide §2.4): the funnel's five rollup branches re-derived
      // their shared stages per branch — gp's typed gram fold ran up
      // to 5×, pplPerDoc's LM scoring 3× (thr + filter + each s2
      // consumer) and s2's join 3× (budget, kept, pass_ppl). Pin the
      // three shared frames; each stage now computes once.
      def qpin(df: DataFrame) = {
        val (p, ph) = org.apache.spark.sql.graft.InternalPin.pin(df)
        ph.count(); graft.PinScope.retain(ph); p
      }
      val gp = qpin(gopherPerDoc(Tables(s, d, "documents")
        .where(splitOf(col("doc_id")) === "eval")))
      // boolean->int cast propagates NULL exactly like the oracle's
      // CAST(rN AS INT) sum, so an unevaluable rule FAILS the doc in
      // both engines rather than counting as 0 only here
      val s1 = gp.withColumn("n_pass",
          rules.map(r => col(r).cast("int")).reduce(_ + _))
        .where(col("n_pass") >= 6)
        .select("doc_id", "source", "n_words")
      val ppl = qpin(pplPerDoc(s, d))
      val thr = ppl.agg(round(
        sum(col("avg_nll")).cast("double") / count(lit(1)), 6).as("thr"))
      val s2 = qpin(s1.join(
        ppl.crossJoin(broadcast(thr))
          .where(col("avg_nll").cast("double") <= col("thr"))
          .select("doc_id"),
        Seq("doc_id")))
      val (bud, kept0) = budgetCut(
        s2.select(col("doc_id"), col("source"),
                  col("n_words").as("tok")))
      val kept = kept0.groupBy("source")
        .agg(count(lit(1)).as("kept_docs"),
             sum("tok").as("kept_tokens"))
      gp.groupBy("source").agg(count(lit(1)).as("eval_docs"))
        .join(s1.groupBy("source").agg(count(lit(1)).as("pass_gopher")),
              Seq("source"), "left")
        .join(s2.groupBy("source").agg(count(lit(1)).as("pass_ppl")),
              Seq("source"), "left")
        .join(bud.select("source", "budget"), Seq("source"), "left")
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("eval_docs"),
                coalesce(col("pass_gopher"), lit(0L)).as("pass_gopher"),
                coalesce(col("pass_ppl"), lit(0L)).as("pass_ppl"),
                coalesce(col("budget"), lit(0L)).as("budget"),
                coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
                coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
        .orderBy("source")
    },

    // Eval-set decontamination (added r6) — the pre-training hygiene
    // step: find (eval doc, train doc) pairs sharing suspiciously many
    // 3-token shingles, i.e. eval examples leaked into the training
    // split. Inverted-index shape, one shingle posting list at a time:
    // (1) document frequency per shingle hash, dropping shingles in
    // > 10 docs (boilerplate/stop-shingles — the standard df-cap that
    // also bounds every posting list the next stage collects); (2) the
    // survivors' eval and train id-sets per shingle (collect_set ≤ 10
    // elements by construction — reuses the df-agg's partitioning on
    // the shingle hash, so no extra shuffle); (3) explode the ≤ 25
    // (eval, train) pairs per shingle and count distinct shared
    // shingles per pair, keep ≥ 3. Two corpus scans, two shuffles on
    // the same shingle-hash key, one tiny pair shuffle — never a
    // corpus×corpus join. (The first formulation self-joined a pruned
    // shingle table: Catalyst cannot share the subtree across a
    // self-join's sides, so the whole scan→distinct→filter pipeline
    // ran twice more, plus a distinct shuffled on the wrong key.) At
    // 100 TB this is the contamination scan Dolma/RedPajama-style
    // pipelines run before every release.
    "q87_decontaminate" -> { (s, d) =>
      contaminationPairs(Tables(s, d, "documents"),
                         n = 3, minShared = 3, outCol = "shared_shingles")
    },

    // Exact-substring decontamination tier (added r7; WINNOWED r13) —
    // the second pass a production contamination scan runs next to
    // q87's shingle tier: q87's df ≤ 10 cap MISSES a contaminated pair
    // whose every shared 3-shingle is boilerplate-frequent (df > 10
    // drops the evidence). This tier matches LONG verbatim token runs
    // (8 here — the corpus runs 10-100 tokens/doc; production uses
    // ~50-gram windows over web-scale docs): one shared run IS the
    // signal (minShared = 1). Since r13 the tier ships MINIMIZER
    // grams, not every gram position ([[minimizerHashes]], w = 5):
    // the r12 100× sweep showed every-position 8-gram volume growing
    // ∝ corpus × window positions (the suite's one 61× line), and the
    // winnowing guarantee keeps the signal — any pair sharing a
    // verbatim span of ≥ 12 tokens shares a minimizer BY CONSTRUCTION
    // (deterministic recall for exactly the long runs this tier
    // exists to catch; an 8-11-token overlap is caught iff its gram
    // wins a window on both sides). Declared semantics: pairs sharing
    // ≥ 1 df-capped minimizer — the oracle implements the identical
    // selection. Same inverted-index shape as q87, but the gram-keyed
    // shuffle now carries ~2/(w+1) of the positions and the emission
    // is a PURE MAP (no doc-keyed shuffle).
    "q96_decontaminate_exact" -> { (s, d) =>
      contaminationPairsFrom(
        minimizerHashes(Tables(s, d, "documents")
            .select(col("doc_id"), trainSplit.as("split"), col("text")),
          n = 8, w = 5, carry = Seq("split")),
        minShared = 1, outCol = "shared_grams")
    },

    // SPAN-LEVEL exact-substring removal (added r15 — the r14
    // verdict's #6): every dedup tier above DROPS whole documents;
    // production exact-substring dedup (Lee et al. 2022's ExactSubstr)
    // instead EXCISES the repeated span and keeps the document. Rule:
    // an 8-token gram occurring in ≥ 2 DISTINCT docs is
    // over-represented; every token covered by any over-represented
    // gram occurrence is excised, the survivors re-join on single
    // spaces. Span-exactness by construction: a verbatim cross-doc
    // run of L ≥ 8 tokens has all L−7 of its 8-windows over-
    // represented, and their union covers the run EXACTLY — no
    // boundary slop on either side (Lee et al. find the same runs via
    // suffix arrays; the k-gram-df form is the shuffle-native
    // equivalent, catching every cross-doc repeat ≥ k tokens).
    // Within-doc repeats deliberately don't count (df is per-doc) —
    // cross-document over-representation is the dedup signal.
    // Report per source: docs, docs touched, tokens/bytes removed,
    // and an md5 fold over every doc's REWRITTEN text (doc-id-ordered)
    // so the oracle certifies the actual rewritten strings, not just
    // the counts. Scale shape: the gram stream is a pure map keyed by
    // md5(gram) for the df count and the anchor join (two gram-keyed
    // shuffles, linear); coverage and rebuild ride doc_id-partitioned
    // ops. The 100-TB path prefilters with the persisted q227
    // minimizer index — full gram emission only for docs sharing a
    // minimizer, shifting recall to q96's declared ≥ 12-token window
    // guarantee; this declared tier is the exact full-scan truth
    // (q300's full-rescan role, applied to spans). The df ≥ 2
    // threshold is the test-corpus knob; production raises it to the
    // memorization bar (Lee et al. use 50-token spans at higher df).
    "q349_span_excise" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text"),
                split(col("text"), " ").as("t"))
      // the gram stream is pinned (r19): both the df count and the
      // anchor join read it, and lazily each would re-run the
      // explode + per-gram md5 emission
      val (grams, gh) = org.apache.spark.sql.graft.InternalPin.pin(
        docs.where(size(col("t")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t) - 7), " +
            "i -> struct(i, md5(array_join(slice(t, i, 8), ' ')) AS gm))"))
          .as("x"))
        .select(col("doc_id"), col("x.i").as("i"), col("x.gm").as("gm")))
      gh.count(); graft.PinScope.retain(gh)
      val hot = grams.groupBy("gm")
        .agg(countDistinct(col("doc_id")).as("df"))
        .where(col("df") >= 2).select("gm")
      // r19 optimization: the first formulation exploded 8 covered
      // positions per hot anchor, distinct'd them (a token-granularity
      // shuffle), posexploded EVERY token of the corpus, anti-joined
      // on (doc_id, j) and re-grouped with a collect_list sort — two
      // full token-level exchanges to rebuild strings the doc already
      // holds (guide §2.3: shuffle keys/metadata, not payloads). Now
      // only the ANCHOR POSITIONS come back per doc (one doc_id-keyed
      // shuffle of hot-anchor ints) and the excision is a pure map
      // over the doc's own token array: covered = the sorted distinct
      // union of [a, a+7] spans, kept = the tokens whose 1-based
      // position is not covered, re-joined on single spaces — the
      // identical rewrite (same positions, same order), so the
      // per-source md5 fold certifies the same strings.
      val anchors = grams.join(hot, Seq("gm"))
        .groupBy("doc_id").agg(collect_list(col("i")).as("anch"))
      docs
        .join(anchors, Seq("doc_id"), "left")
        .withColumn("cov", expr(
          "array_sort(array_distinct(flatten(transform(" +
            "CASE WHEN anch IS NULL THEN CAST(array() AS ARRAY<INT>) " +
            "ELSE anch END, a -> sequence(a, a + 7)))))"))
        .withColumn("new_text", expr(
          "array_join(transform(filter(transform(t, (tok, p) -> " +
            "struct(p + 1 AS j, tok AS tok)), " +
            "x -> NOT array_contains(cov, x.j)), x -> x.tok), ' ')"))
        .select(col("doc_id"), col("source"), col("new_text"),
                size(col("cov")).cast("long").as("tokens_removed"),
                (length(col("text")) - length(col("new_text")))
                  .cast("long").as("bytes_removed"))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
             sum(when(col("tokens_removed") > 0, 1L).otherwise(0L))
               .as("docs_excised"),
             sum(col("tokens_removed")).as("tokens_removed"),
             sum(col("bytes_removed")).as("bytes_removed"),
             md5(expr("array_join(transform(array_sort(collect_list(" +
               "struct(doc_id, concat(cast(doc_id as string), ':', " +
               "md5(new_text)) AS dh))), x -> x.dh), ';')"))
               .as("rewrite_md5"))
        .orderBy("source")
    },

    // Incremental decontamination (added r8) — the form a pipeline
    // actually runs PER EVAL RELEASE: q87 rescans the full train corpus
    // every time, but the train side only changes between training
    // runs, so its df-capped 3-shingle posting lists are a PERSISTED
    // INDEX (the q76/q79 batch-vs-index discipline applied to
    // contamination): built once, bucketed on the gram hash, and a new
    // eval batch (here: the eval split's odd doc_ids, standing in for
    // "the next benchmark release") probes it with NO train-side rescan
    // or re-shuffle (plan-asserted). The df cap is computed TRAIN-SIDE
    // — the semantic an ahead-of-time index forces (at q87's
    // whole-corpus cap the index would depend on the eval batch it
    // hasn't seen) — and bounds every posting list at ≤ 10, so probe
    // cost is O(batch grams), never O(corpus). At 100 TB: the index is
    // grams-with-df≤10 only (the q87 scan showed caps prune hard), and
    // each eval release costs one batch-side shuffle.
    "q99_decontaminate_incr" -> { (s, d) =>
      incrContamination(s, d, "gramidx", n = 3, minShared = 3,
                        outCol = "shared_shingles")
    },

    // Incremental EXACT-SUBSTRING decontamination (added r9; WINNOWED
    // r13) — q96's verbatim tier gets the same per-release
    // persisted-index form q99 gave q87's shingle tier (the r8
    // verdict's item #3): the train side's df-capped MINIMIZER
    // posting lists ([[minimizerHashes]] — q96's winnowed emission,
    // identical scheme on both sides so the ≥ 12-token span guarantee
    // holds across the index boundary) persist as an m-bucketed index
    // built once, and each eval release probes it with zero train
    // rescan (same SelectedBucketsCount plan assertion). One shared
    // minimizer is the signal (minShared = 1), exactly q96's declared
    // semantics; the index is ~2/(w+1) the size of the r9 every-
    // position form — the winnowing saving compounds here because the
    // index is PERSISTED.
    "q103_decontaminate_exact_incr" -> { (s, d) =>
      incrContaminationMin(s, d, "minidx8", n = 8, w = 5, minShared = 1,
                           outCol = "shared_grams")
    },

    // BPE token accounting (added r9 — the r7/r8 verdicts' "training
    // budgets are BPE tokens, not whitespace tokens" gap): per-lang
    // corpus accounting in REAL subword tokens next to q50's
    // whitespace counts. The tokenizer is [[bpeMarked]] — a frozen
    // 24-merge BPE applied as one codegen'd chain of literal string
    // replaces, no UDF and no explode, so at 100 TB this is a pure
    // map-side projection + 5-key agg: the cheapest possible shape
    // for "how many tokens does my corpus hold", and the same
    // expression drops into any rollup (q104 budgets in it). The
    // merge application is SQL-replayable, so the whole query is
    // DuckDB-oracled; the merge-order semantics are additionally
    // replay-tested against a reference BPE in CorrectnessSpec.
    // Token-budget report (added r12) — "what is my training mix made
    // of, in MODEL tokens": per (lang, source) cell, docs, BPE tokens
    // (q101's codegen'd frozen-merge tokenizer as a map-side
    // projection), each cell's share of the corpus token budget, and
    // the cumulative share in declared (tokens desc, lang, source)
    // order — the table a pretraining run's data card publishes and a
    // q85-style mixture re-weights against. One scan, one
    // |langs×sources|-key agg; both denominators are windows over the
    // AGGREGATE (cells, not docs). Shares divide exact BIGINTs once,
    // round 6.
    // Perplexity-based quality filter (added r13) — the HELD-OUT
    // counterpart of q149's in-corpus screen, and the form a pipeline
    // actually deploys: q149 trains on the full corpus and scores the
    // SAME documents (a drift/gibberish screen — self-scoring flatters
    // in-distribution text by construction), while this trains the LM
    // on the TRAIN split only and scores the EVAL split — the
    // CCNet / Wikipedia-LM filtering semantics, where incoming data is
    // judged by a FIXED reference model it never influenced (the
    // q220→q266 out-of-fold move applied to the LM family). Model:
    // add-1-smoothed bigram LM (declared — the classic n-gram form; a
    // neural scorer would slot into the same pipeline shape as an
    // opaque score column); report is per SOURCE with a declared flag
    // line, the acquisition-feedback axis q149's per-language screen
    // does not give. Per eval doc
    // with ≥ 2 tokens: avg negative log-prob per adjacent token pair,
    // each term ln((cb+1)/(cu+V)) rounded ONCE at 6 dp then summed as
    // exact decimals (q220's round-log-once discipline ⇒ the
    // order-free sum is engine-identical); per source: docs, mean
    // avg-NLL, and the share above the declared 8.0 flag line. Scale
    // shape: ONE train scan folds the bigram/unigram count tables
    // (vocab-bound, ≪ corpus — production persists them as an
    // artifact like q99's index); scoring is one eval-pair explode +
    // two count-table joins + a per-doc agg — never corpus×corpus,
    // and the LM tables are the only shuffled state.
    "q301_ppl_filter" -> { (s, d) =>
      pplPerDoc(s, d).groupBy("source")
        .agg(count(lit(1)).as("docs"),
             round(sum(col("avg_nll")).cast("double") /
                   count(lit(1)).cast("double"), 6).as("mean_nll"),
             sum(when(col("avg_nll").cast("double") > 8.0, 1L)
                   .otherwise(0L)).as("flagged"))
        .withColumn("flagged_share",
          round(col("flagged").cast("double") / col("docs").cast("double"),
                6))
        .orderBy("source")
    },

    // Kneser–Ney LM quality filter (added r13) — the SMOOTHING UPGRADE
    // of q301's add-1 bigram: interpolated Kneser–Ney (Kneser & Ney
    // 1995; Chen & Goodman 1998 — the smoothing KenLM ships and the
    // CCNet filtering stack actually runs). Add-1 drowns the signal on
    // any realistic vocab (every unseen pair pays ln(V)); KN discounts
    // each seen bigram by D=0.75 and redistributes the held-out mass
    // over the CONTINUATION distribution — "how many distinct contexts
    // precede w2" — the estimator that made n-gram LMs competitive.
    // Model = 4 vocab-bound tables folded from ONE train-split scan
    // (bigram counts + two marginals + 1-row globals); scoring =
    // q301's exact pipeline shape (eval-pair explode, count-table
    // joins, per-doc agg — the gram stream never joins corpus×corpus).
    // Per seen context the smoothed-continuation variant sums to
    // EXACTLY 1 over the train vocab (spec-certified); unseen contexts
    // back off to the continuation distribution (declared). Report:
    // per source docs, mean avg-NLL, share above the declared 3.5 flag
    // line (KN NLLs sit below q301's add-1 scores because seen mass is
    // no longer taxed by V).
    "q309_kneser_ney" -> { (s, d) =>
      knPerDoc(s, d).groupBy("source")
        .agg(count(lit(1)).as("docs"),
             round(sum(col("avg_nll")).cast("double") /
                   count(lit(1)).cast("double"), 6).as("mean_nll"),
             sum(when(col("avg_nll").cast("double") > 3.5, 1L)
                   .otherwise(0L)).as("flagged"))
        .withColumn("flagged_share",
          round(col("flagged").cast("double") / col("docs").cast("double"),
                6))
        .orderBy("source")
    },

    // TRIGRAM Kneser–Ney quality gate (added r17, the r16 verdict's
    // #6 — "production CCNet-style gates use 5-gram KenLM-class
    // models"; this closes the realism gap one order up with zero new
    // machinery): per-eval-doc avg NLL under an interpolated TRIGRAM
    // KN LM ([[kn3PerDoc]]) whose trigram marginals persist as the
    // `lmkn3` artifact and whose BACK-OFF level probes the existing
    // `lmkn` bigram artifact — one truth per marginal order, the way
    // a production n-gram stack shares its lower orders. The gate
    // line is RELATIVE (q364's discipline, not q309's absolute 3.5 —
    // measured vacuous on this synthetic corpus): flagged = docs
    // whose NLL exceeds the eval-split mean. Report per source: docs
    // scored (≥ 3 tokens — the population a trigram event exists
    // for), mean NLL, flagged count + share. Re-pointing q364's
    // funnel at this gate is one factored-body swap (pplPerDoc →
    // kn3PerDoc) behind this query's certification.
    "q374_kn3_gate" -> { (s, d) =>
      val pd = kn3PerDoc(s, d)
      val thr = pd.agg(round(
        sum(col("avg_nll")).cast("double") / count(lit(1)), 6).as("thr"))
      pd.crossJoin(broadcast(thr))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
             round(sum(col("avg_nll")).cast("double") /
                   count(lit(1)).cast("double"), 6).as("mean_nll"),
             sum(when(col("avg_nll").cast("double") > col("thr"), 1L)
                   .otherwise(0L)).as("flagged"))
        .withColumn("flagged_share",
          round(col("flagged").cast("double") / col("docs").cast("double"),
                6))
        .orderBy("source")
    },

    // DoReMi-style domain reweighting (added r13) — the OPTIMIZED
    // mixture between q85's declared ratios and q306's per-doc DSIR
    // selection: Domain Reweighting with Minimax Optimization (Xie et
    // al. 2023) upweights domains where the proxy model's EXCESS loss
    // over a reference is largest (Group-DRO's multiplicative-weights
    // update; with a FIXED loss gap the R-round update telescopes to
    // one softmax, so the declared operator is the honest closed form:
    // α = 0.8·softmax(excess) + 0.2·uniform, η = 1, the paper's
    // uniform-smoothing shape). Losses: per-domain mean avg-NLL under
    // q301's held-out bigram LM ([[pplPerDoc]] — structurally the same
    // scorer); reference = the corpus-wide mean (declared: a uniform
    // reference model — a trained reference slots into the same gap).
    // Scale: everything after the q301 scoring pipeline is ≤|sources|
    // rows; exp quantizes through the pure-IEEE floor-chain at 1e-8 so
    // the softmax denominator is an exact order-free decimal sum.
    // Output: per source, docs / mean NLL / excess / α (Σα = 1 and
    // argmax-excess = argmax-α, spec-certified).
    "q315_doremi_mixture" -> { (s, d) =>
      val bySrc = pplPerDoc(s, d).groupBy("source")
        .agg(count(lit(1)).as("docs"), sum(col("avg_nll")).as("snll"))
      val glob = bySrc.agg(sum("docs").as("nd"), sum("snll").as("gs"))
      val ex = bySrc.crossJoin(broadcast(glob))
        .withColumn("mean_nll",
          round(col("snll").cast("double") / col("docs").cast("double"), 6))
        .withColumn("excess",
          round(col("mean_nll") -
                round(col("gs").cast("double") / col("nd").cast("double"),
                      6), 6))
        .withColumn("wq",
          expr("CAST(floor(exp(excess) * 1e8 + 5e-1) AS DECIMAL(28,0))"))
      val tot = ex.agg(sum("wq").as("tw"), count(lit(1)).as("k"))
      ex.crossJoin(broadcast(tot))
        .select(col("source"), col("docs"), col("mean_nll"), col("excess"),
                round(expr("8e-1 * (CAST(wq AS DOUBLE) / " +
                           "CAST(tw AS DOUBLE)) + 2e-1 / CAST(k AS DOUBLE)"),
                      6).as("alpha"))
        .orderBy("source")
    },

    // DSIR importance weighting (added r13) — Data Selection via
    // Importance Resampling (Xie et al. 2023), the pretraining
    // data-selection operator between q49's heuristic quality score
    // and q301's LM perplexity filter: estimate target (the curated
    // tier, q85's sources 0-4) and raw (the rest) distributions over
    // B=4096 HASHED BIGRAM buckets, then score every doc by its total
    // importance log-weight Σ_grams ln(p̂_target(b)/p̂_raw(b)) with
    // add-1 smoothing — docs whose n-gram profile looks more like the
    // curated tier than the crawl get w > 0 and are selected. Scale
    // shape: ONE gram emission (the q133 Generator, pinned), both
    // count tables are ≤B rows (broadcast — the scoring join never
    // shuffles the gram stream), totals are a 1-row broadcast; the
    // only gram-volume shuffle is the per-doc weight agg. Each log
    // term is ln of ONE exact-integer ratio rounded at 6 dp, summed
    // as exact decimals (order-free, engine-identical — the q301
    // discipline). Report: per source, docs scored / selected / mean
    // weight (curated sources scoring top is the sanity readout).
    "q306_dsir_weights" -> { (s, d) =>
      val B = 4096
      val curated = expr("CAST(substring(source, 4) AS INT) < 5")
      val docs = Tables(s, d, "documents")
      val (bg, bh) = org.apache.spark.sql.graft.InternalPin.pin(
        docs.select(col("doc_id"), col("source"),
            org.apache.spark.sql.graft.GraftFunctions
              .ngrams(split(col("text"), " "), 2).as("g"))
          .select(col("doc_id"), col("source"),
                  conv(substring(md5(col("g")), 1, 3), 16, 10)
                    .cast("long").as("b")))
      bh.count(); graft.PinScope.retain(bh)
      val ct = bg.where(curated).groupBy("b")
        .agg(count(lit(1)).as("ct"))
      val cr = bg.where(!curated).groupBy("b")
        .agg(count(lit(1)).as("cr"))
      val tot = bg.agg(
        sum(when(curated, 1L).otherwise(0L)).as("tt"),
        sum(when(!curated, 1L).otherwise(0L)).as("rr"))
      val scored = bg
        .join(broadcast(ct), Seq("b"), "left")
        .join(broadcast(cr), Seq("b"), "left")
        .crossJoin(broadcast(tot))
        .withColumn("lp", round(log(
            ((coalesce(col("ct"), lit(0L)) + 1L) * (col("rr") + B))
              .cast("double") /
            ((coalesce(col("cr"), lit(0L)) + 1L) * (col("tt") + B))
              .cast("double")), 6).cast("decimal(28,6)"))
      val perDoc = scored.groupBy("doc_id", "source")
        .agg(sum("lp").as("w"))
      // selection line = the GLOBAL mean weight (w > 0 would demand
      // the doc literally out-scores the raw pool — right for a real
      // curated/crawl split, vacuous on a corpus whose sources share
      // one word distribution); docs above the line are the resample
      val gm = perDoc.agg(
        round(sum(col("w")).cast("double") / count(lit(1)), 6)
          .as("gmean"))
      perDoc.crossJoin(broadcast(gm))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("w").cast("double") > col("gmean"), 1L)
                .otherwise(0L)).as("n_selected"),
          round(sum(col("w")).cast("double") / count(lit(1)), 6)
            .as("mean_w"))
        .orderBy("source")
    },

    // BPE merge INDUCTION (added r13) — the missing counterpart to
    // q101/q106, which APPLY a frozen merge table: this LEARNS one
    // from the corpus (Sennrich et al. 2016, the tokenizer-training
    // step every LLM data pipeline runs before anything tokenizes).
    // Declared algorithm, identical in both engines:
    //  - ONE corpus scan folds to a word-frequency table, capped at
    //    the top [[BpeTrainVocabCap]] words by (freq desc, word) —
    //    exactly how production BPE trainers bound their dict, and
    //    what makes training VOCAB-bound (Heaps' law), not
    //    corpus-bound: at 100 TB the scan is the only volume term;
    //  - words symbolize to one row per character; 8 rounds each
    //    (a) count adjacent symbol pairs weighted by word freq,
    //    (b) pick argmax (count desc, pair asc) — a 1-row collect,
    //    the q279 driver-solve contract, and (c) merge every GREEDY
    //    LEFTMOST occurrence via the gaps-and-islands parity
    //    formulation (consecutive matched positions form runs; odd
    //    ranks within a run merge, each consuming its successor) —
    //    three window passes over the symbol table, NO per-row
    //    sequential fold, so the same relational spec runs in DuckDB
    //    verbatim as generated CTEs;
    //  - output = the learned merge table (round, lft, rgt,
    //    pair_count) — the artifact q101's applier would ship with.
    // The greedy-parity window formulation is certified against a
    // sequential textbook fold in CorrectnessSpec. All counts exact
    // integers; the symbol table re-pins per round (vocab-bound).
    "q299_bpe_train" -> { (s, d) =>
      import s.implicits._
      bpeTrainMerges(s, d).toDF("round", "lft", "rgt", "pair_count")
        .orderBy("round")
    },

    // BPE APPLY (added r14) — the missing middle of the tokenizer
    // family: q299 TRAINS the merge table, q101/q121/q212 ACCOUNT
    // with heuristics; this ENCODES the corpus with the learned
    // merges and reports what the tokenizer actually buys. The apply
    // runs on the DISTINCT-WORD table (vocabulary-bounded — encoding
    // is a pure function of the word, the whole reason word-level BPE
    // application scales: a 10¹²-token corpus has a 10⁷-word
    // vocabulary), replaying the 8 learned merges with the SAME
    // greedy left-to-right parity algebra the trainer used
    // ([[bpeMergeLocal]] — one shared definition, so train and apply
    // can never disagree on merge semantics), then one w-keyed join
    // puts per-word encoded lengths back on the token stream and two
    // grouped folds produce the per-(lang, source) data card: docs,
    // base symbols (chars), encoded BPE tokens, compression ratio.
    // Out-of-vocab-cap words still encode (merges apply wherever
    // their pair occurs — the standard BPE property). Oracle: the
    // train chain + a parallel full-vocab apply chain, all
    // MATERIALIZED CTEs.
    "q346_bpe_apply" -> { (s, d) =>
      import s.implicits._
      val merges = bpeTrainMerges(s, d)
      val words = Tables(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("freq"))
      // r19: the 8 merge passes replay locally per vocabulary word
      // ([[bpeMergeLocal]] — the same greedy parity semantics the
      // trainer used), one narrow map instead of 8 pinned
      // five-window passes over exploded symbol rows.
      val ms = merges.map { case (_, a, b, _) => (a, b) }.toArray
      val enc = words.select(col("w")).as[String]
        .map { w =>
          var sy = bpeSplitSyms(w)
          for ((a, b) <- ms) sy = bpeMergeLocal(sy, a, b)
          (w, sy.length.toLong)
        }.toDF("w", "enc")
      Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
                explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .join(enc, Seq("w"))
        .groupBy("doc_id", "lang", "source")
        .agg(sum("enc").as("enc"),
             sum(length(col("w")).cast("long")).as("base"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("docs"),
             sum("base").as("base_symbols"),
             sum("enc").as("bpe_tokens"),
             round(sum("enc").cast("double") /
                   sum("base").cast("double"), 6).as("compression"))
        .orderBy("lang", "source")
    },

    "q212_token_budget" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wAll = Window.partitionBy(lit(0))
      val wCum = Window
        .orderBy(col("bpe_tokens").desc, col("lang"), col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("docs"),
             sum(bpeTokenCount.cast("long")).as("bpe_tokens"))
        .withColumn("total", sum(col("bpe_tokens")).over(wAll))
        .withColumn("cum", sum(col("bpe_tokens")).over(wCum))
        .select(col("lang"), col("source"), col("docs"), col("bpe_tokens"),
                round(col("bpe_tokens").cast("double") / col("total"), 6)
                  .as("token_share"),
                round(col("cum").cast("double") / col("total"), 6)
                  .as("cum_share"))
        .orderBy(col("bpe_tokens").desc, col("lang"), col("source"))
    },

    "q101_bpe_tokens" -> { (s, d) =>
      Tables(s, d, "documents")
        .select(col("lang"),
                size(split(col("text"), " ")).cast("long").as("ws"),
                bpeTokenCount.as("bpe"))
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
             sum(col("ws")).as("ws_tokens"),
             sum(col("bpe")).as("bpe_tokens"),
             round(sum(col("bpe")).cast("double") / sum(col("ws")), 6)
               .as("bpe_per_word"))
        .orderBy("lang")
    },

    // Dictionary-scale BPE accounting (added r10 — the r9 verdict's
    // #2, "the only toy-sized caveat in the corpus-prep story"):
    // q101's accounting re-run with the tokenizer the PRODUCTION path
    // uses — the merge table carried as broadcast DATA and applied in
    // plain JVM code per partition ([[graft.functions.BpeDict]],
    // q54's typed-codec discipline), not as O(merges) expression
    // nodes. The vocab is [[BpeMergesFull]], the corpus's full
    // 89-merge closure — already past what a single replace-chain
    // expression can replay (DuckDB's binder caps at ~60 merges per
    // expression), which is exactly the regime this form exists for;
    // a 50k-merge vocab changes only the broadcast size. Still fully
    // oracled: the SQL replay chains the merges through a CTE
    // PIPELINE (30 merges per stage — depth per expression stays
    // bounded while the stage count grows freely). Scale shape
    // unchanged from q101: one corpus scan, a per-row map, a 5-key
    // agg; the only non-codegen region is the tokenizer projection
    // itself. Equality with q101's replace chain on the frozen
    // 24-merge table is spec-asserted over the full corpus, and the
    // implementation is replay-tested at a 1k-merge synthetic vocab.
    "q121_bpe_dict" -> { (s, d) =>
      import s.implicits._
      val merges = s.sparkContext.broadcast(BpeMergesFull.toArray)
      Tables(s, d, "documents")
        .select(col("lang"), col("text"))
        .as[(String, String)]
        .mapPartitions { it =>
          val m = merges.value
          it.map { case (lang, text) =>
            (lang, text.split(" ", -1).length.toLong,
             graft.functions.BpeDict.countTokens(m, text))
          }
        }
        .toDF("lang", "ws", "bpe")
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
             sum(col("ws")).as("ws_tokens"),
             sum(col("bpe")).as("bpe_tokens"),
             round(sum(col("bpe")).cast("double") / sum(col("ws")), 6)
               .as("bpe_per_word"))
        .orderBy("lang")
    },

    // Composed corpus-prep pipeline v2 (added r9 — the r8 verdict's
    // item #4): one declared query chaining the r5–r8 ARTIFACTS,
    // proving they compose in a single session: quality + keep-best
    // dedup via the persisted `graft_clusters` table (q83's stage,
    // one shared definition), eval-set decontamination via the
    // persisted `graft_gramidx` (q99's train-side df-capped index
    // probed by the FULL eval split), the q85 mixture rule, and a
    // per-(split, source) rollup whose token budget is quoted in BOTH
    // whitespace AND q101's BPE tokens. Plan-asserted: both persisted
    // artifacts are scanned, neither the cluster fixpoint nor the
    // gram index is recomputed. Scale shape: every stage keeps its
    // standalone operator's cost — the corpus is scanned once for
    // scoring, once for eval grams; the only corpus-wide shuffles are
    // the keep-best window on the clustered sliver and the final
    // 20-key rollup.
    "q104_pipeline_prep" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      // stage 1-2: quality + keep-best over the persisted clusters
      val kept = DedupExtOps.keepBest(s, d)
        .where(col("keep") === 1 && col("score") >= 0.5)
        .select("doc_id", "score")
      // stage 3: train docs contaminated by ANY eval doc (≥ 3 shared
      // df-capped 3-shingles), via the persisted gram index — the
      // index is train-side only, so eval docs can never be dropped
      val idxT = gramIndexTable(s, d, "gramidx", 3)
      val evalGrams = gramHashes(docs.where(trainSplit === "eval"), 3)
        .withColumnRenamed("doc_id", "eval_id").distinct()
      val contaminated = evalGrams
        .join(s.table(idxT).hint("merge"), Seq("m"))
        .groupBy("eval_id", "train_id")
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 3)
        .select(col("train_id").as("doc_id")).distinct()
      // stages 4-5: drop contaminated, apply the mixture rule, roll up
      docs.join(kept, Seq("doc_id"))
        .join(contaminated, Seq("doc_id"), "left_anti")
        .where(mixtureKeep)
        .groupBy(trainSplit.as("split"), col("source"))
        .agg(count(lit(1)).as("docs"),
             sum(size(split(col("text"), " ")).cast("long")).as("ws_tokens"),
             sum(bpeTokenCount).as("bpe_tokens"),
             round(sum(col("score").cast("decimal(18,6)")).cast("double") /
                   count(lit(1)), 6).as("avg_score"))
        .orderBy("split", "source")
    },

    // Composed corpus-prep pipeline v3 (added r13) — q104's chain
    // extended with BOTH r13 artifacts, proving the new pieces
    // compose in one session exactly like the old ones: quality +
    // keep-best over the persisted cluster table, BOTH contamination
    // tiers via their persisted indexes (q99's 3-shingle graft_gramidx
    // at ≥ 3 shared AND q103's winnowed graft_minidx8 at ≥ 1 shared —
    // the two-tier scan a production release actually runs; both
    // probes are index-side-unshuffled merge joins), the r13 held-out
    // perplexity filter (flagged eval docs drop — incoming data judged
    // by the fixed train-split LM), the q85 mixture rule, and the same
    // per-(split, source) ws+BPE token-budget rollup. Every stage
    // keeps its standalone operator's cost; the only corpus-wide
    // shuffles are keep-best's window on the clustered sliver, the
    // eval-side gram/minimizer/pair emissions, and the final rollup.
    // Composed intake pipeline v4 (added r14) — the per-release
    // CLEANING FUNNEL over the round's three persisted dedup
    // artifacts, the composition a daily corpus intake actually runs:
    // the new batch (odd ids) flows through three gates IN ORDER —
    // (1) verbatim-span near-dup (q341's minimizer pairs against
    // graft_minpairidx), (2) SimHash Hamming near-dup (q340's pairs
    // against graft_hamidx), (3) semantic dup (q339's exact-lattice
    // pairs against graft_semidx; doc_id = vec_id, q45's declared
    // alignment) — and a doc drops at the FIRST gate that flags it,
    // where each gate applies its OWN tier's declared drop rule: the
    // minimizer and Hamming gates drop a batch doc linked to a
    // smaller id (id_b = greatest — the q83 keep-min rule), while the
    // semantic gate drops a batch doc that duplicates ANY standing
    // member, larger ids included (q339's declared semantics: the
    // standing corpus is already deduped, so every member outranks an
    // arrival; r15 ADVICE wording fix). Staged counts are the q282
    // funnel discipline, so each stage's drop column reports its
    // MARGINAL yield. Every gate consumes the IDENTICAL factored
    // pair set its own declared query certifies (one truth per tier)
    // and probes its artifact without rebuilding anything. Per-source
    // report: batch docs, per-stage drops, kept, keep ratio — the
    // data card that says what each dedup tier actually buys on this
    // corpus.
    "q347_pipeline_prep_v4" -> { (s, d) => pipelineV4Report(s, d) },

    "q302_pipeline_prep_v3" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val kept = DedupExtOps.keepBest(s, d)
        .where(col("keep") === 1 && col("score") >= 0.5)
        .select("doc_id", "score")
      val idxT = gramIndexTable(s, d, "gramidx", 3)
      val evalGrams = gramHashes(docs.where(trainSplit === "eval"), 3)
        .withColumnRenamed("doc_id", "eval_id").distinct()
      val contam3 = evalGrams
        .join(s.table(idxT).hint("merge"), Seq("m"))
        .groupBy("eval_id", "train_id")
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 3)
        .select(col("train_id").as("doc_id"))
      val idx8 = minimizerIndexTable(s, d, "minidx8", 8, 5)
      val evalMin = minimizerHashes(docs.where(trainSplit === "eval"),
                                    8, 5)
        .withColumnRenamed("doc_id", "eval_id").distinct()
      val contam8 = evalMin
        .join(s.table(idx8).hint("merge"), Seq("m"))
        .select(col("train_id").as("doc_id"))
      val flagged = pplPerDoc(s, d)
        .where(col("avg_nll").cast("double") > 8.0)
        .select("doc_id")
      docs.join(kept, Seq("doc_id"))
        .join(contam3.unionAll(contam8).distinct(),
              Seq("doc_id"), "left_anti")
        .join(flagged, Seq("doc_id"), "left_anti")
        .where(mixtureKeep)
        .groupBy(trainSplit.as("split"), col("source"))
        .agg(count(lit(1)).as("docs"),
             sum(size(split(col("text"), " ")).cast("long")).as("ws_tokens"),
             sum(bpeTokenCount).as("bpe_tokens"),
             round(sum(col("score").cast("decimal(18,6)")).cast("double") /
                   count(lit(1)), 6).as("avg_score"))
        .orderBy("split", "source")
    },

    // Fuzzy-pair mining via deletion-neighborhood blocking (added r10)
    // — the FUZZY STRING MATCHING family, done the way it scales
    // (SymSpell's insight): an all-pairs levenshtein over a vocabulary
    // is O(V²) and dies at web scale, but any two tokens within edit
    // distance k share a common string reachable by ≤ k DELETIONS from
    // each, so generating each token's delete-≤2 neighborhood (itself,
    // one-deletes, two-deletes — ≤ 1 + L + L² variants for length L)
    // and equi-joining on the variant key finds every distance-≤2
    // candidate with a plain shuffle join — O(V·L²) keys, nothing
    // quadratic in V — and the exact levenshtein ≤ 2 check prunes the
    // false candidates blocking admits. Runs on the DISTINCT
    // vocabulary (tiny relative to the corpus; the corpus is scanned
    // once for frequencies), which is what makes the HOF variant
    // generation harmless here — at a 50M-type web vocabulary the
    // variant table is still only ~billions of short keys, a routine
    // shuffle. Output carries both frequencies — the asymmetry (rare
    // token beside a frequent neighbor) is the typo signal a
    // normalization pipeline acts on (this corpus's curated vocab has
    // six distance-2 neighbors and no true typos — the operator
    // reports the neighborhood structure it finds).
    "q134_typo_pairs" -> { (s, d) =>
      val del =
        "transform(sequence(1, length(%s)), i -> " +
          "concat(substring(%s, 1, i - 1), substring(%s, i + 1)))"
      val d1 = del.format("tok", "tok", "tok")
      val d2 = s"flatten(transform($d1, t1 -> ${del.format("t1", "t1", "t1")}))"
      val vocab = Tables(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) >= 3)
        .groupBy("tok").agg(count(lit(1)).as("freq"))
      val variants = vocab.select(col("tok"), col("freq"),
        explode(expr(s"array_distinct(concat(array(tok), $d1, $d2))"))
          .as("v"))
      variants.select(col("v"), col("tok").as("a"), col("freq").as("freq_a"))
        .join(variants.select(col("v"), col("tok").as("b"),
                              col("freq").as("freq_b")), Seq("v"))
        .where(col("a") < col("b"))
        .select("a", "b", "freq_a", "freq_b").distinct()
        .withColumn("lev", levenshtein(col("a"), col("b")).cast("long"))
        .where(col("lev") <= 2)
        .orderBy("a", "b")
    },

    // N-gram frequency table (added r10) — the custom Catalyst
    // GENERATOR surface as a DECLARED query: §2's udtf_gen row has
    // been ◐-structural since r1 (the NGrams generator is exercised
    // inside q46/q51/q84 but never stood alone); this is the corpus
    // phrase-frequency table every tokenizer/boilerplate analysis
    // starts from, produced by that generator directly. One scan, one
    // generate, one agg on the gram key; bounded TakeOrdered output.
    "q133_ngram_freq" -> { (s, d) =>
      Tables(s, d, "documents")
        .select(org.apache.spark.sql.graft.GraftFunctions
          .ngrams(split(col("text"), " "), 3).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("gram"))
        .limit(30)
    },

    // Document fingerprint: min-hash over 3-token shingles (rolling
    // content signature) + shingle cardinality.
    "q51_fingerprint" -> { (s, d) =>
      val sh = Tables(s, d, "documents")
        .select(col("doc_id"),
                org.apache.spark.sql.graft.GraftFunctions
                  .ngrams(split(col("text"), " "), 3).as("sh"))
      sh.groupBy("doc_id")
        .agg(min(md5(col("sh"))).as("fp"),
             count(lit(1)).as("n_shingles"),
             countDistinct(col("sh")).as("n_distinct"))
        .orderBy("doc_id")
    },

    // Vocabulary coverage curve (added r12) — the TOKENIZER-DESIGN
    // table: how many vocabulary entries cover 90/95/99% of the token
    // mass, and what share the top-k types already cover —
    // the measured curve that sizes a vocab (or justifies BPE, q101/
    // q121, when the tail is fat). Tokens are the q142 whitespace
    // convention; types rank by (count DESC, token ASC) — declared,
    // total order — and the cumulative mass is an exact integer
    // prefix sum; the target test compares the UNROUNDED cum/total
    // (two exact BIGINTs, one IEEE division — identical both engines),
    // the reported share rounds 6 once. Scale shape: one token-keyed
    // count shuffle to the VOCAB-bound type table; the ranking window
    // runs on that table, not the corpus (q199's curve discipline —
    // at a 10⁸-type web vocab the single-partition window becomes the
    // q146 two-level bucketed prefix sum, same semantics). Targets
    // cross a broadcast 3-row knob table; rows for ranks the vocab
    // never reaches are absent by construction in both engines.
    "q224_vocab_coverage" -> { (s, d) =>
      import s.implicits._
      val tf = Tables(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("tok"))
      val ranked = tf
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cum", sum("c").over(w))
        .crossJoin(broadcast(tf.agg(sum("c").as("n"))))
        .select(col("rk"), col("cum"),
                (col("cum").cast("double") / col("n")).as("shr"))
      val targets = Seq(("cov90", 0.90), ("cov95", 0.95), ("cov99", 0.99))
        .toDF("metric", "q")
      val cov = ranked.crossJoin(broadcast(targets))
        .where(col("shr") >= col("q"))
        .groupBy("metric")
        .agg(min(struct(col("rk"), col("shr"))).as("m"))
        .select(col("metric"), col("m.rk").as("tokens"),
                round(col("m.shr"), 6).as("share"))
      // top-k knobs sized to this corpus's 31-type vocabulary (a web
      // vocab would use 100/1000); ranks past the vocab end are absent
      // identically in both engines
      val topk = ranked.where(col("rk") === 10 || col("rk") === 25)
        .select(concat(lit("top"), col("rk")).as("metric"),
                col("rk").as("tokens"), round(col("shr"), 6).as("share"))
      cov.unionAll(topk).orderBy("metric")
    },

    // GROUP-aware train/eval split (added r12) — the LEAKAGE-SAFE form
    // of q67: hashing documents independently puts near-duplicates on
    // opposite sides of the split (the classic eval-contamination bug
    // — the model "generalizes" to its own training text), so the
    // split key must be the duplicate GROUP, not the doc: every doc
    // splits by its cluster representative from the persisted q82
    // artifact (singletons by their own id), q67's md5-prefix rule
    // unchanged. The report prices the repair: per split, docs, the
    // distinct groups, and how many docs FLIPPED sides vs the naive
    // per-doc hash — the leakage volume the group key closed. Rides
    // the doc_id-bucketed cluster table (never re-runs the fixpoint);
    // one left join + a 2-row rollup. The no-straddle invariant is
    // structural (one rep ⇒ one split) and spec-asserted end-to-end
    // against the q46 candidate pairs.
    "q226_group_split" -> { (s, d) =>
      val cl = s.table(DedupExtOps.clusterTable(s, d))
      Tables(s, d, "documents").select(col("doc_id"))
        .join(cl, Seq("doc_id"), "left")
        .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
        .groupBy(splitOf(col("rep")).as("split"))
        .agg(count(lit(1)).as("docs"),
             countDistinct(col("rep")).as("n_groups"),
             sum(when(splitOf(col("rep")) =!= splitOf(col("doc_id")), 1L)
                   .otherwise(0L)).as("flipped"))
        .orderBy("split")
    },

    // TextRank keyword extraction (added r12) — Mihalcea & Tarau 2004:
    // corpus keywords as the highest-centrality nodes of the word
    // CO-OCCURRENCE graph (tokens within distance ≤2 in a document,
    // undirected, weighted by pair frequency), ranked by 3 damped
    // weighted power-iteration rounds — the graph answer to "what is
    // this corpus about" that pure frequency (q224) gets wrong when a
    // frequent token co-occurs with nothing (boilerplate separators
    // rank low here, connective vocabulary ranks high). All arithmetic
    // is q115's INTEGER FIXED-POINT extended to weighted edges
    // (contribution = (r·w) DIV Σw(u); damping (85·Σ) DIV 100; ranks
    // scaled 1e12) — iterative float PageRank is neither partition-
    // order-free nor engine-portable, integer mass is both. One
    // doc-keyed window builds pairs via lead(1)/lead(2) (no self-join
    // of the position table), the weight table is VOCAB²-bounded (in
    // practice co-occurrence-sparse), and each round is one edges⋈rank
    // join + one sum — the q115 shape on a vocabulary-sized graph, so
    // the corpus is scanned exactly once regardless of rounds.
    "q228_textrank" -> { (s, d) =>
      val S = 1000000000000L
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("p")
      val tk = Tables(s, d, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " "))
                  .as(Seq("p", "tok")))
      val prs = tk
        .withColumn("n1", lead("tok", 1).over(wd))
        .withColumn("n2", lead("tok", 2).over(wd))
        .select(col("tok").as("x"),
                explode(array(col("n1"), col("n2"))).as("y"))
        .where(col("y").isNotNull && length(col("x")) > 0 &&
               length(col("y")) > 0 && col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a"),
                greatest(col("x"), col("y")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      // r19 optimization (q115's lesson): pin the edge list, the
      // degree table and each round's rank table — unpinned, round 3's
      // lineage re-derived the token-pair emission per reference and
      // the wall-clock was Catalyst planning. Arithmetic untouched.
      def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
      val (edges, eh) = pin(
        prs.select(col("a").as("u"), col("b").as("v"), col("w"))
          .unionAll(prs.select(col("b").as("u"), col("a").as("v"),
                               col("w"))))
      eh.count(); graft.PinScope.retain(eh)
      val (deg, dh) = pin(edges.groupBy("u").agg(sum("w").as("ws")))
      dh.count(); graft.PinScope.retain(dh)
      val n = deg.agg(count(lit(1)).as("nn"))
      var r = deg.crossJoin(broadcast(n))
        .select(col("u").as("id"),
                expr(s"CAST($S AS BIGINT) DIV nn").as("r"))
      for (_ <- 1 to 3) {
        val contrib = edges.join(deg, Seq("u"))
          .join(r.withColumnRenamed("id", "u"), Seq("u"))
          .groupBy(col("v").as("id"))
          .agg(sum(expr("(r * w) DIV ws")).as("sc"))
        val (next, nh) = pin(r.select(col("id"))
          .join(contrib, Seq("id"), "left")
          .crossJoin(broadcast(n))
          .select(col("id"),
                  (expr(s"(15 * ($S DIV nn)) DIV 100") +
                   expr("(85 * coalesce(sc, CAST(0 AS BIGINT))) DIV 100"))
                    .as("r")))
        nh.count(); graft.PinScope.retain(nh)
        r = next
      }
      r.select(col("id").as("token"), col("r").as("rank"))
        .orderBy(col("rank").desc, col("token")).limit(10)
    },

    // Per-source n-gram novelty (added r12) — the CONTRIBUTION metric
    // a data-acquisition pipeline prices sources by: of each source's
    // 8-gram set, what share is claimed FIRST by its docs (first =
    // lowest doc_id, the declared ingestion order) rather than already
    // present earlier in the corpus? Boilerplate-heavy feeds score low
    // and get deprioritized before the next crawl — the dedup
    // families (q41/q46/q219) remove redundancy after the fact, this
    // screen prevents buying it. O(grams) exactly like q219: the gram
    // projection derives twice (grams → first-claimant table, grams ⋈
    // claims), one m-keyed shuffle each, NOTHING corpus-sized cached
    // (q219's pin lesson); per-doc rollup then a source join on the
    // doc-count-sized table. Docs under 8 tokens have no grams and
    // are declared out of scope.
    "q242_gram_novelty" -> { (s, d) =>
      def g = gramHashes(Tables(s, d, "documents"), 8).distinct()
      val firsts = g.groupBy("m").agg(min("doc_id").as("first_id"))
      val perDoc = g.join(firsts, Seq("m"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("g"),
             sum(when(col("doc_id") === col("first_id"), 1L)
                   .otherwise(0L)).as("nv"))
      perDoc
        .join(Tables(s, d, "documents").select(col("doc_id"), col("source")),
              Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"), sum("g").as("grams"),
             sum("nv").as("novel"))
        .select(col("source"), col("docs"),
                col("grams").cast("long").as("grams"),
                col("novel").cast("long").as("novel"),
                round(col("novel").cast("double") /
                      col("grams").cast("double"), 6).as("novelty"))
        .orderBy("source")
    },

    // Incremental per-source novelty (added r12) — q242's metric in
    // the shape it actually runs in production: the base corpus's
    // gram first-claims live in a PERSISTED m-bucketed index (built
    // once, q99/q103's ahead-of-time-index semantic; base = even
    // doc_ids, the house split convention), and each NEW batch (odd
    // doc_ids — "the next crawl drop") probes it with a bucket-local
    // anti join: a batch gram is novel iff it is ABSENT from the base
    // index and this doc is its first claimant WITHIN the batch. Probe
    // cost is O(batch grams) — the base corpus is never rescanned and
    // the index never reshuffles (bucket-pruned merge, the q213
    // discipline); the per-source bill then prices each feed's next
    // drop before ingesting it.
    "q246_novelty_incremental" -> { (s, d) =>
      val idx = graft.BucketedCache.ensure(s, d, "gramfirst",
          "m STRING", "m", 8)(
        gramHashes(Tables(s, d, "documents")
                     .where(col("doc_id") % 2 === 0), 8)
          .select(col("m")).distinct())
      val batch = gramHashes(Tables(s, d, "documents")
                               .where(col("doc_id") % 2 === 1), 8)
        .distinct()
      val fresh = batch
        .join(s.table(idx).hint("merge"), Seq("m"), "left_anti")
      val perDoc = batch.groupBy("doc_id").agg(count(lit(1)).as("g"))
        .join(fresh.groupBy("m").agg(min("doc_id").as("doc_id"))
                .groupBy("doc_id").agg(count(lit(1)).as("nv")),
              Seq("doc_id"), "left")
      perDoc
        .join(Tables(s, d, "documents").select(col("doc_id"), col("source")),
              Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
             sum("g").cast("long").as("batch_grams"),
             sum(coalesce(col("nv"), lit(0L))).cast("long").as("novel"))
        .withColumn("novelty",
          round(col("novel").cast("double") /
                col("batch_grams").cast("double"), 6))
        .orderBy("source")
    },

    // PMI collocations (added r12) — the lexicographer's classic next
    // to q228's TextRank and q231's field-level MI: which word pairs
    // co-occur (distance ≤ 2, the q228 pair stream) far above chance?
    // PMI = ln(N·c_xy/(cx·cy)) over PAIR-SLOT margins (cx counts x's
    // appearances in the pair stream, so the contingency algebra is
    // self-consistent), minimum pair count 10 to kill the
    // low-frequency PMI explosion, top-20 by the DECLARED
    // (pmi rounded 6 desc, w1, w2) total order. Scale shape: pair gen
    // is lead(1)/lead(2) on ONE doc-keyed window (no position
    // self-join); everything after lives on the observed-pair cell
    // table — margins are windows over it (q231's no-rescan trick),
    // never a second corpus pass.
    "q243_pmi_pairs" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val toks = Tables(s, d, "documents")
        .select(col("doc_id"),
                posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
        .where(length(col("t")) > 0)
      // pin the AGGREGATED pair cell table (an artifact, not the gram
      // stream — q219's distinction): three consumers read blocks, the
      // corpus window runs once
      val (prs, ph) = org.apache.spark.sql.graft.InternalPin.pin(toks
        .withColumn("n1", lead("t", 1).over(w))
        .withColumn("n2", lead("t", 2).over(w))
        .select(col("t"), explode(array(col("n1"), col("n2"))).as("u"))
        .where(col("u").isNotNull)
        .select(least(col("t"), col("u")).as("w1"),
                greatest(col("t"), col("u")).as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c")))
      ph.count(); graft.PinScope.retain(ph)
      // slot margins from the pair cell table itself: m(x) = x's
      // appearances across both slots; P(slot=x) = m/2N, so
      // PMI = ln((c/N) / ((m1/2N)(m2/2N))) = ln(4·c·N/(m1·m2))
      val marg = prs.select(explode(array(col("w1"), col("w2"))).as("t"),
                            col("c"))
        .groupBy("t").agg(sum("c").as("m"))
      val n = prs.agg(sum("c").as("nn"))
      prs.where(col("c") >= 10)
        .join(marg.select(col("t").as("w1"), col("m").as("m1")), Seq("w1"))
        .join(marg.select(col("t").as("w2"), col("m").as("m2")), Seq("w2"))
        .crossJoin(broadcast(n))
        .select(col("w1"), col("w2"), col("c"),
                round(log(lit(4.0) * col("c").cast("double") *
                          col("nn").cast("double") /
                          (col("m1").cast("double") *
                           col("m2").cast("double"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
    },

    // Flesch reading-ease screen (added r12) — the classic readability
    // heuristic as a corpus-quality dimension next to q49's composite
    // score: 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    // with syllables ≈ vowel GROUPS (the standard cheap estimator —
    // counted via the replace-groups-with-one-char length trick, no
    // per-char UDF) and sentences = terminal-punctuation count floored
    // at 1 (this corpus is unpunctuated token streams, so the guard is
    // load-bearing and the declared convention). Per-doc score rounds
    // 6 dp into exact decimals; the per-lang rollup (mean + share
    // below the "very difficult" 30 cutoff) is order-free. Pure
    // map-side string algebra + one ≤|langs| agg: scan-bound at any
    // corpus size, whole-stage-codegen throughout.
    "q259_readability" -> { (s, d) =>
      def dd(c: Column) = c.cast("double")
      val toks = filter(split(col("text"), " "),
                        x => length(x) > 0)
      val scored = Tables(s, d, "documents")
        .select(col("lang"),
                size(toks).cast("long").as("words"),
                (length(regexp_replace(lower(col("text")),
                                       "[aeiouy]+", "#")) -
                 length(regexp_replace(lower(col("text")),
                                       "[aeiouy]+", "")))
                  .cast("long").as("syll"),
                greatest(lit(1L),
                  (length(col("text")) -
                   length(translate(col("text"), ".!?", "")))
                    .cast("long")).as("sents"))
        .select(col("lang"),
                round(lit(206.835) -
                      lit(1.015) * dd(col("words")) / dd(col("sents")) -
                      lit(84.6) * dd(col("syll")) / dd(col("words")),
                      6).as("flesch"))
      scored.groupBy("lang")
        .agg(count(lit(1)).as("docs"),
             round(dd(sum(col("flesch").cast("decimal(28,6)"))) /
                   dd(count(lit(1))), 6).as("avg_flesch"),
             round(dd(sum(when(col("flesch") < 30, 1L).otherwise(0L))) /
                   dd(count(lit(1))), 6).as("pct_hard"))
        .orderBy("lang")
    },

    // Zipf rank-frequency fit (added r12) — the corpus-statistics
    // audit behind every vocabulary decision: natural text follows
    // freq ∝ rank^(−s) with s ≈ 1, and a corpus that DOESN'T (too
    // flat = synthetic/templated, too steep = boilerplate-dominated)
    // fails the naturalness screen. Fit = OLS of ln(freq) on ln(rank)
    // over the whole vocabulary (rank by count desc with token
    // tie-break — deterministic), reusing q255's rounded-log decimal
    // moment discipline so the slope is engine-exact. The rank window
    // and moment agg run on the VOCABULARY table (one token-keyed
    // shuffle collapses the corpus); the single-partition rank window
    // is vocab-bound by declared contract — at web scale the rank
    // comes from the q146 bucketed prefix sum instead (documented
    // alternative, same statistic).
    "q260_zipf_fit" -> { (s, d) =>
      def dd(c: Column) = c.cast("double")
      val tc = Tables(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("t"))
        .where(length(col("t")) > 0)
        .groupBy("t").agg(count(lit(1)).as("c"))
      val wR = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("t"))
      tc.withColumn("r", row_number().over(wR))
        .select(round(log(dd(col("r"))), 6).cast("decimal(18,6)").as("x"),
                round(log(dd(col("c"))), 6).cast("decimal(18,6)").as("y"),
                col("c"))
        .agg(count(lit(1)).as("vocab"), sum("c").as("n_tokens"),
             sum(col("x")).as("sx"), sum(col("y")).as("sy"),
             sum(col("x") * col("x")).as("sxx"),
             sum(col("y") * col("y")).as("syy"),
             sum(col("x") * col("y")).as("sxy"))
        .withColumn("cxy", dd(col("vocab")) * dd(col("sxy")) -
                           dd(col("sx")) * dd(col("sy")))
        .withColumn("vx", dd(col("vocab")) * dd(col("sxx")) -
                          dd(col("sx")) * dd(col("sx")))
        .withColumn("vy", dd(col("vocab")) * dd(col("syy")) -
                          dd(col("sy")) * dd(col("sy")))
        .select(col("vocab"), col("n_tokens").cast("long").as("n_tokens"),
                round(col("cxy") / col("vx"), 6).as("zipf_slope"),
                round(col("cxy") * col("cxy") /
                      (col("vx") * col("vy")), 6).as("r2"))
    },

    // Template-shingle boilerplate detection (added r12) — the
    // Common-Crawl cleaning primitive: a 5-gram that appears in MORE
    // THAN HALF of a source's documents is template (nav bars, footers,
    // licence blurbs), and a doc whose gram mass is mostly template
    // carries little novel signal. Membership is per-source DISTINCT
    // (source, gram, doc) — occurrence counts don't inflate a
    // repeated-within-one-doc gram into boilerplate — and the >1/2
    // threshold compares integers (2·doc_count > source_docs, no
    // division). Per-doc template share then rolls up per source
    // (rounded 6 into decimal sums). One scan + gram explode + two
    // (source, gram)-keyed aggs; everything is gram-shuffle bound
    // (q242's O(grams) shape), with the source-docs side a ≤|sources|
    // broadcast.
    "q261_template_shingles" -> { (s, d) =>
      def dd(c: Column) = c.cast("double")
      // r19: the distinct gram-membership stream feeds BOTH the
      // template threshold and the per-doc share — unpinned, the gram
      // explode + md5 + distinct shuffle ran twice (q269's unpinned-
      // base case, guide §2.4). Pinned, the derivation runs once.
      val (g, gh) = org.apache.spark.sql.graft.InternalPin.pin(
        Tables(s, d, "documents")
        .select(col("source"), col("doc_id"),
                org.apache.spark.sql.graft.GraftFunctions
                  .ngrams(split(col("text"), " "), 5).as("gr"))
        .select(col("source"), col("doc_id"), md5(col("gr")).as("m"))
        .distinct())
      gh.count(); graft.PinScope.retain(gh)
      val nd = Tables(s, d, "documents")
        .groupBy("source").agg(countDistinct("doc_id").as("ndocs"))
      val tpl = g.groupBy("source", "m")
        .agg(count(lit(1)).as("dc"))
        .join(broadcast(nd), Seq("source"))
        .where(col("dc") * 2 > col("ndocs"))
        .select(col("source"), col("m"), lit(1).as("is_tpl"))
      val perDoc = g.join(tpl, Seq("source", "m"), "left")
        .groupBy("source", "doc_id")
        .agg(count(lit(1)).as("grams"),
             sum(coalesce(col("is_tpl"), lit(0))).as("tgrams"))
        .withColumn("share",
          round(dd(col("tgrams")) / dd(col("grams")), 6)
            .cast("decimal(28,6)"))
      perDoc.groupBy("source")
        .agg(count(lit(1)).as("docs"),
             sum("tgrams").cast("long").as("template_hits"),
             round(dd(sum("share")) / dd(count(lit(1))), 6)
               .as("avg_template_share"))
        .orderBy("source")
    },

    // Cleaning-funnel yield report (added r12) — the data-cleaning
    // analog of q113's event funnel, and the table every pretraining
    // pipeline publishes next to its q212 data card: per filter stage
    // (length bounds → quality score ≥ 0.5 → distinct-token diversity
    // ≥ 0.3 → alpha ratio ≥ 0.55, applied in declared order), how many
    // docs pass that filter ALONE (is the filter pulling its weight?),
    // how many survive CUMULATIVELY, the docs dropped at exactly this
    // stage (attribution of loss), and the surviving whitespace-token
    // budget — the number the mixture plan (q85/q212) actually
    // consumes. ONE documents scan computes all four boolean flags and
    // token counts as map-side projections (shared qualityScore
    // helper, SQL-twin oracled); the funnel itself is a 4-row unpivot
    // of the single 1-row aggregate. Yields divide exact counts once,
    // 6 dp.
    "q282_filter_funnel" -> { (s, d) =>
      def dd(c: Column) = c.cast("double")
      val toks = split(col("text"), " ")
      val flagged = Tables(s, d, "documents")
        .select(col("n_chars"), col("text"),
                size(toks).cast("long").as("wtoks"),
                (col("n_chars") >= 50 && col("n_chars") <= 5000)
                  .as("f1"),
                (qualityScore >= 0.5).as("f2"),
                (round(dd(size(array_distinct(toks))) / dd(size(toks)),
                       6) >= 0.3).as("f3"),
                (round(dd(length(regexp_replace(col("text"), "[^a-z]",
                                                ""))) /
                       dd(length(col("text"))), 6) >= 0.55).as("f4"))
        .select(col("wtoks"), col("f1"), col("f2"), col("f3"), col("f4"),
                col("f1").as("c1"),
                (col("f1") && col("f2")).as("c2"),
                (col("f1") && col("f2") && col("f3")).as("c3"),
                (col("f1") && col("f2") && col("f3") && col("f4"))
                  .as("c4"))
      val agg = flagged.agg(
        count(lit(1)).as("total"),
        sum(col("wtoks")).as("total_toks"),
        sum(when(col("f1"), 1L).otherwise(0L)).as("a1"),
        sum(when(col("f2"), 1L).otherwise(0L)).as("a2"),
        sum(when(col("f3"), 1L).otherwise(0L)).as("a3"),
        sum(when(col("f4"), 1L).otherwise(0L)).as("a4"),
        sum(when(col("c1"), 1L).otherwise(0L)).as("k1"),
        sum(when(col("c2"), 1L).otherwise(0L)).as("k2"),
        sum(when(col("c3"), 1L).otherwise(0L)).as("k3"),
        sum(when(col("c4"), 1L).otherwise(0L)).as("k4"),
        sum(when(col("c1"), col("wtoks")).otherwise(0L)).as("t1"),
        sum(when(col("c2"), col("wtoks")).otherwise(0L)).as("t2"),
        sum(when(col("c3"), col("wtoks")).otherwise(0L)).as("t3"),
        sum(when(col("c4"), col("wtoks")).otherwise(0L)).as("t4"))
      agg.select(expr(
          """stack(4,
            |  1, 'length_50_5000', a1, k1, total - k1, t1,
            |  2, 'quality_ge_05',  a2, k2, k1 - k2, t2,
            |  3, 'diversity_ge_03', a3, k3, k2 - k3, t3,
            |  4, 'alpha_ge_055',   a4, k4, k3 - k4, t4)
            |  AS (stage, filter_name, pass_alone, pass_cum, dropped_here,
            |      tokens_cum)""".stripMargin),
          col("total"))
        .withColumn("yield_cum",
          round(dd(col("pass_cum")) / dd(col("total")), 6))
        .drop("total")
        .orderBy("stage")
    }
  )

  /** q301/q302's held-out scoring core: per eval doc (≥ 2 tokens),
    * the add-1-smoothed bigram avg negative log-prob under the
    * TRAIN-split LM — (doc_id, source, avg_nll DECIMAL(28,6)). Count
    * tables are vocab-bound; every log term rounds once at 6 dp then
    * sums as exact decimals (order-free, engine-identical). */
  /** The packing context length shared by q365's census and q368's
    * manifest. */
  private[operators] val PackLen = 2048L

  /** q365/q368's shared packing frame: every doc's EXCLUSIVE prefix
    * token count `pre` in the deterministic concat order ((md5(id),
    * id) — the q67 no-RNG draw), computed by the GlobalOrder bucket
    * discipline (within-(md5-prefix-bucket) running sums + one
    * 256-row census window) — bit-identical to the global running
    * window, never a single-partition corpus sort. Returns (doc_id,
    * source, tok, pre). */
  private[operators] def packedPositions(s: SparkSession,
                                         d: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val t = Tables(s, d, "documents")
      .select(col("doc_id"), col("source"),
              size(split(col("text"), " ")).cast("long").as("tok"),
              md5(col("doc_id").cast("string")).as("h"))
      .withColumn("bkt", substring(col("h"), 1, 2))
      .withColumn("wpre", coalesce(sum("tok").over(
        W.partitionBy("bkt").orderBy("h", "doc_id")
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
    val census = t.groupBy("bkt").agg(sum("tok").as("bn"))
      .withColumn("off", coalesce(sum("bn").over(
        W.orderBy("bkt")
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select("bkt", "off")
    t.join(broadcast(census), Seq("bkt"))
      .withColumn("pre", col("off") + col("wpre"))
      .select("doc_id", "source", "tok", "pre")
  }

  /** q368's manifest body at an arbitrary chunk length `L` — one row
    * per L-token training sequence with its doc occupancy (docs,
    * tokens filled, lead_in, starts_doc); see the q368 registry
    * docstring for the interval algebra. Factored so the versioned
    * log (q372) can commit RE-PACKS at other context lengths through
    * the identical definition. */
  private[graft] def packManifest(s: SparkSession, d: String,
                                      L: Long): DataFrame = {
    val t = packedPositions(s, d)
      .withColumn("fc", expr(s"pre DIV $L"))
      .withColumn("lc", expr(s"(pre + tok - 1) DIV $L"))
    t.select(col("doc_id"), col("tok"), col("pre"),
             explode(expr("sequence(fc, lc)")).as("chunk_id"))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("docs"),
           sum(least(col("pre") + col("tok"),
                     (col("chunk_id") + 1) * L) -
               greatest(col("pre"), col("chunk_id") * L)).as("tokens"),
           max(when(col("pre") < col("chunk_id") * L, 1L)
                 .otherwise(0L)).as("lead_in"),
           min(when(col("pre") <= col("chunk_id") * L, col("doc_id")))
             .as("starts_doc"))
  }

  /** q373's per-source repetition ceiling: a source's grant never
    * exceeds this many passes over its own tokens (the data-
    * constrained max-epochs knob; 2 here so the sf0.01 corpus shows
    * BOTH regimes — ten sources cap, ten absorb the surplus). */
  private[operators] val MixtureMaxEpochs = 2L

  /** Bumped on ANY change to the pack-log build (the committed
    * lengths, the manifest body): folds into [[packLogRoot]]'s tmpdir
    * key so a code change never serves a stale committed log across
    * JVM runs (the graphVersionRoot discipline). */
  private val PackLogBuilderVersion = 1

  /** The chunk lengths the pack log commits, in version order:
    * v1 = [[PackLen]] (q368's declared run), v2 = 1024 (the
    * shorter-context re-pack). */
  private[graft] val PackLogLens = Seq(PackLen, 1024L)

  /** In-JVM monitors for [[packLogRoot]] — per (sfDir, fingerprint):
    * independent corpora build concurrently, two builders of the same
    * log serialize. */
  private val packLogLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Commits each [[PackLogLens]] manifest as a SnapshotLog version
    * into `root` — files-then-manifest per version, so a crash
    * between addFiles and commitVersion leaves the previous version
    * serving (ArtifactCommitSpec drives that window). Package-visible
    * so the spec can build into a scratch root directly. */
  private[graft] def buildPackLog(s: SparkSession, d: String,
                                  root: java.nio.file.Path): Unit = {
    val SnapshotLog = graft.sources.PartitionedOps.SnapshotLog
    PackLogLens.zipWithIndex.foreach { case (len, i) =>
      val files = SnapshotLog.addFiles(s, root, s"pack$len",
        packManifest(s, d, len))
      SnapshotLog.commitVersion(root, i + 1, files)
    }
  }

  /** The PACK-MANIFEST VERSION LOG (q372): write-once per (corpus
    * fingerprint, builder version), built in a scratch dir and
    * atomic-renamed into place — a reader can never observe a
    * half-built log, and a mutated corpus routes to a fresh one. */
  private[graft] def packLogRoot(s: SparkSession,
                                 d: String): java.nio.file.Path = {
    val key = d.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      graft.BucketedCache.corpusFingerprint(d) +
      s"_b$PackLogBuilderVersion"
    val dir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_packlog_$key")
    val lock = packLogLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      if (!java.nio.file.Files.exists(dir)) {
        val scratchRoot =
          java.nio.file.Files.createTempDirectory("graft_packlog_scratch")
        val scratch = scratchRoot.resolve("log")
        try {
          java.nio.file.Files.createDirectories(scratch)
          buildPackLog(s, d, scratch)
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

  /** q360's Gopher battery as a PER-DOC frame — (doc_id, source,
    * n_words, r1..r7 booleans) — the shared body q360 reports and
    * q364's funnel gates on (one definition per rule). Cost: one
    * corpus scan for the scalar gates + two token-linear (doc, gram)
    * aggregations (q84's narrow-shuffle shape). */
  private[operators] def gopherPerDoc(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val stopList = Seq("the", "be", "to", "of", "and",
                       "that", "have", "with")
    def occCnt(lit0: String): Column =
      (length(col("text")) -
       length(expr(s"replace(text, '$lit0', '')"))) / lit(lit0.length)
    // r19 optimization: the two gram masses are PER-DOC statistics,
    // but the SQL form exploded every bigram and 5-gram occurrence
    // into (doc, g)-keyed groupBys plus a doc-keyed rank window —
    // corpus-token-volume exchanges to recover numbers that never
    // needed to leave the doc's own row (guide §2.3). One typed fold
    // (the simhash64Fps discipline) counts both gram widths in a
    // single pass per doc: grams are the NGrams kernel's exact
    // emission (space-joined token slices over split(text, ' ') with
    // trailing empties kept), the top-bigram argmax uses UTF8String's
    // unsigned-byte order (≡ orderBy(cnt desc, g)), masses are
    // cnt·length(g) in long — the identical integers, no exchange.
    val masses = locally {
      val sp = docs.sparkSession
      import sp.implicits._
      def cmpBytes(a: String, b: String): Int =
        java.util.Arrays.compareUnsigned(
          a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      def counts(tk: Array[String], n: Int)
          : java.util.HashMap[String, Long] = {
        val m = new java.util.HashMap[String, Long]()
        var s = 0
        while (s + n <= tk.length) {
          val sb = new java.lang.StringBuilder(tk(s))
          var j = 1
          while (j < n) { sb.append(' ').append(tk(s + j)); j += 1 }
          m.merge(sb.toString, 1L, _ + _); s += 1
        }
        m
      }
      docs.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          import scala.jdk.CollectionConverters._
          val tk = text.split(" ", -1)
          val m2 = counts(tk, 2)
          val top2 =
            if (m2.isEmpty) None
            else {
              val (g, c) = m2.entrySet().asScala
                .map(e => (e.getKey, e.getValue))
                .minBy(identity)(Ordering.fromLessThan[(String, Long)] {
                  case ((ga, ca), (gb, cb)) =>
                    if (ca != cb) ca > cb else cmpBytes(ga, gb) < 0
                })
              Some(c * g.length.toLong)
            }
          val m5 = counts(tk, 5)
          var dup = 0L; var any = false
          m5.forEach { (g, c) =>
            if (c >= 2) { dup += c * g.length.toLong; any = true }
          }
          (id, top2, if (any) Some(dup) else None)
        }).toDF("doc_id", "top2_mass", "dup5_mass")
    }
    docs
      .select(col("doc_id"), col("source"),
              length(col("text")).cast("long").as("chars"),
              size(toks).cast("long").as("n_words"),
              expr("aggregate(transform(split(text, ' '), " +
                   "w -> CAST(length(w) AS BIGINT)), 0L, " +
                   "(a, x) -> a + x)").as("word_chars"),
              size(filter(toks, w => w.rlike("[a-z]")))
                .cast("long").as("alpha_words"),
              size(array_distinct(filter(toks,
                w => w.isin(stopList: _*)))).cast("long").as("stops"),
              (occCnt("#") + occCnt("...")).cast("long").as("syms"))
      .join(masses, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_words"),
        (col("n_words") >= 50 && col("n_words") <= 100000)
          .as("r1_word_count"),
        (lit(3) * col("n_words") <= col("word_chars") &&
         col("word_chars") <= lit(10) * col("n_words"))
          .as("r2_mean_word_len"),
        (lit(10) * col("syms") <= col("n_words"))
          .as("r3_symbol_ratio"),
        (lit(5) * col("alpha_words") >= lit(4) * col("n_words"))
          .as("r4_alpha_words"),
        (col("stops") >= 2).as("r5_stopwords"),
        (lit(5) * coalesce(col("top2_mass"), lit(0L)) <= col("chars"))
          .as("r6_top2gram_mass"),
        (lit(20) * coalesce(col("dup5_mass"), lit(0L)) <=
         lit(3) * col("chars")).as("r7_dup5gram_mass"))
  }

  /** q361's temperature-budget machinery over an arbitrary (doc_id,
    * source, tok) frame — returns (per-source budget table (source,
    * docs, tokens, w, budget), kept rows (doc_id, source, tok)). The
    * fixed-point √ weights, integer budget split, md5-order draw and
    * the GlobalOrder-bucketed exclusive token cumsum are one
    * definition for q361 (whole corpus) and q364 (funnel survivors).
    */
  private[operators] def budgetCut(t0: DataFrame)
      : (DataFrame, DataFrame) = {
    val perSrc = t0.groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("tok").as("tokens"))
      .withColumn("w",
        round(sqrt(col("tokens").cast("double")) * 1000).cast("long"))
    val tot = perSrc.agg(sum("tokens").as("tt"), sum("w").as("sw"))
    val bud = perSrc.crossJoin(broadcast(tot))
      .withColumn("budget", expr("((tt DIV 4) * w) DIV sw"))
      .select("source", "docs", "tokens", "w", "budget")
    (bud, prefixCut(t0, bud.select("source", "budget")))
  }

  /** The md5-order take-until-budget draw factored out of
    * [[budgetCut]] (r17, for q373's epoch tail): keeps each source's
    * docs while the EXCLUSIVE prefix token count is under that
    * source's `budget` column — the per-source cumsum rides the
    * GlobalOrder bucket discipline (within-(source, md5-prefix)
    * running sums + one |sources|·256-row census window, bit-equal to
    * the global per-source cumsum — never a per-source single
    * partition). Returns kept (doc_id, source, tok). */
  private[operators] def prefixCut(t0: DataFrame,
                                   bud: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val t = t0.withColumn("h", md5(col("doc_id").cast("string")))
    val ranked = t.withColumn("bkt", substring(col("h"), 1, 2))
      .withColumn("wpre", coalesce(sum("tok").over(
        W.partitionBy("source", "bkt").orderBy("h", "doc_id")
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
    val census = ranked.groupBy("source", "bkt")
      .agg(sum("tok").as("bn"))
      .withColumn("off", coalesce(sum("bn").over(
        W.partitionBy("source").orderBy("bkt")
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select("source", "bkt", "off")
    ranked.join(broadcast(census), Seq("source", "bkt"))
      .join(broadcast(bud), Seq("source"))
      .where(col("off") + col("wpre") < col("budget"))
      .select("doc_id", "source", "tok")
  }

  /** q347's body, parameterized by the batch modulus (batch = ids ≡ 1
    * mod batchMod — the r15 batch-fraction sweep knob threaded through
    * all three artifact-probe tiers; mod 2 is the declared query).
    * See the q347 registry docstring for the gate semantics. */
  private[graft] def pipelineV4Report(s: SparkSession, d: String,
                                      batchMod: Int = 2): DataFrame = {
    def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
    val (dm, mh) = pin(DedupExtOps.minimizerIncPairs(s, d, batchMod)
      .where(col("id_b") % batchMod === 1)
      .select(col("id_b").as("doc_id")).distinct())
    mh.count(); graft.PinScope.retain(mh)
    val (dh, hh) = pin(DedupExtOps.hammingIncPairs(s, d, batchMod)
      .where(col("id_b") % batchMod === 1)
      .select(col("id_b").as("doc_id")).distinct())
    hh.count(); graft.PinScope.retain(hh)
    val (_, _, sdp) = SimilarityExtOps.semDedupIncParts(s, d, batchMod)
    val ds = sdp.select(col("b").as("doc_id")).distinct()
    Tables(s, d, "documents").where(col("doc_id") % batchMod === 1)
      .select(col("doc_id"), col("source"))
      .join(broadcast(dm.withColumn("m1", lit(1))), Seq("doc_id"), "left")
      .join(broadcast(dh.withColumn("h1", lit(1))), Seq("doc_id"), "left")
      .join(broadcast(ds.withColumn("s1", lit(1))), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("batch_docs"),
           sum(when(col("m1") === 1, 1L).otherwise(0L))
             .as("dropped_minimizer"),
           sum(when(col("m1").isNull && col("h1") === 1, 1L)
                 .otherwise(0L)).as("dropped_hamming"),
           sum(when(col("m1").isNull && col("h1").isNull &&
                    col("s1") === 1, 1L).otherwise(0L))
             .as("dropped_semantic"),
           sum(when(col("m1").isNull && col("h1").isNull &&
                    col("s1").isNull, 1L).otherwise(0L)).as("kept"))
      .withColumn("keep_ratio",
        round(col("kept").cast("double") /
              col("batch_docs").cast("double"), 6))
      .orderBy("source")
  }

  /** The TRAIN-split bigram LM PERSISTED (r16) — q301's "production
    * persists them as an artifact like q99's index" note made real:
    * the bigram counts, unigram counts and the vocab-size scalar land
    * once per (corpus, fingerprint) as one kind-tagged, w1-bucketed
    * table ('b': (w1, w2) → c; 'u': w1 → c; 'v': c = |vocab|). Every
    * scorer (q301, q315's DoReMi weights, q364's funnel gate) PROBES
    * the artifact instead of re-aggregating the 75% train split —
    * which the r16 q364 re-measurement showed was that funnel's
    * dominant volume term. */
  private def lmModelTable(s: SparkSession, d: String): String =
    graft.BucketedCache.ensure(s, d, "lmbigram",
      "kind STRING, w1 STRING, w2 STRING, c BIGINT", "w1", 8) {
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), trainSplit.as("split"),
                split(col("text"), " ").as("t"))
      val pairsOf = expr(
        "transform(sequence(1, size(t) - 1), i -> " +
          "struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))")
      val cb = docs.where(col("split") === "train" && size(col("t")) >= 2)
        .select(explode(pairsOf).as("pr"))
        .groupBy(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
        .agg(count(lit(1)).as("c"))
      val cu = docs.where(col("split") === "train")
        .select(explode(col("t")).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("c"))
      cb.select(lit("b").as("kind"), col("w1"), col("w2"), col("c"))
        .unionByName(cu.select(lit("u").as("kind"), col("w1"),
                     lit("").as("w2"), col("c")))
        .unionByName(cu.agg(count(lit(1)).as("c"))
          .select(lit("v").as("kind"), lit("").as("w1"),
                  lit("").as("w2"), col("c")))
    }

  private def pplPerDoc(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents")
      .select(col("doc_id"), trainSplit.as("split"), col("source"),
              split(col("text"), " ").as("t"))
    val pairsOf = expr(
      "transform(sequence(1, size(t) - 1), i -> " +
        "struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))")
    val m = s.table(lmModelTable(s, d))
    val cb = m.where(col("kind") === "b")
      .select(col("w1"), col("w2"), col("c").as("cb"))
    val cu = m.where(col("kind") === "u")
      .select(col("w1"), col("c").as("cu"))
    val vv = m.where(col("kind") === "v").select(col("c").as("v"))
    val scored = docs
      .where(col("split") === "eval" && size(col("t")) >= 2)
      .select(col("doc_id"), col("source"), explode(pairsOf).as("pr"))
      .select(col("doc_id"), col("source"),
              col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      .join(cb, Seq("w1", "w2"), "left")
      .join(cu, Seq("w1"), "left")
      .crossJoin(broadcast(vv))
      .withColumn("lp", round(log(
          (coalesce(col("cb"), lit(0L)).cast("double") + lit(1.0)) /
          (coalesce(col("cu"), lit(0L)).cast("double") +
           col("v").cast("double"))), 6).cast("decimal(28,6)"))
    scored.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), sum("lp").as("slp"))
      .withColumn("avg_nll",
        round(-col("slp").cast("double") / col("n").cast("double"), 6)
          .cast("decimal(28,6)"))
  }

  /** Per-eval-doc avg NLL under an interpolated Kneser–Ney bigram LM
    * trained on the train split (q309). Model tables (all vocab-bound,
    * broadcast): bigram counts cb; per-context totals cw and distinct-
    * successor counts n1f; per-word distinct-predecessor counts n1b;
    * the global distinct-bigram count nbb and vocab size v. The
    * continuation distribution is add-1 smoothed over the train vocab
    * — Pcont(w2) = (N1+(·w2)+1)/(N1+(··)+V) — which keeps every score
    * finite on OOV eval words AND makes each seen context a proper
    * distribution: Σ_vocab P_KN(w2|w1) = (cw−D·n1f)/cw + (D·n1f/cw)·1
    * = 1 exactly (spec-certified). Unseen contexts (cw NULL) back off
    * to Pcont alone — the standard backoff floor, declared. Every P is
    * one fixed-order double chain; ln rounds ONCE at 6 dp into an
    * order-free decimal sum (the q301 discipline). */
  /** The TRAIN-split Kneser–Ney model PERSISTED (r16, §12.1 #2 —
    * [[lmModelTable]]'s discipline for q309's richer marginal set):
    * bigram counts ('b'), per-context totals + distinct-successor
    * counts ('x'), distinct-predecessor counts ('c'), and the two
    * globals ('g' = distinct bigrams, 'v' = vocab) land once per
    * (corpus, fingerprint) as one kind-tagged, w1-bucketed table;
    * q309's scoring probes it instead of re-deriving four marginal
    * tables from the 75% train split every run. */
  private def knModelTable(s: SparkSession, d: String): String =
    graft.BucketedCache.ensure(s, d, "lmkn",
      "kind STRING, w1 STRING, w2 STRING, a BIGINT, b BIGINT", "w1", 8) {
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), trainSplit.as("split"),
                split(col("text"), " ").as("t"))
      val pairsOf = expr(
        "transform(sequence(1, size(t) - 1), i -> " +
          "struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))")
      val cb = docs.where(col("split") === "train" && size(col("t")) >= 2)
        .select(explode(pairsOf).as("pr"))
        .groupBy(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
        .agg(count(lit(1)).as("c"))
      cb.select(lit("b").as("kind"), col("w1"), col("w2"),
                col("c").as("a"), lit(0L).as("b"))
        .unionByName(cb.groupBy("w1")
          .agg(sum("c").as("a"), count(lit(1)).as("b"))
          .select(lit("x").as("kind"), col("w1"), lit("").as("w2"),
                  col("a"), col("b")))
        .unionByName(cb.groupBy("w2").agg(count(lit(1)).as("a"))
          .select(lit("c").as("kind"), lit("").as("w1"), col("w2"),
                  col("a"), lit(0L).as("b")))
        .unionByName(cb.agg(count(lit(1)).as("a"))
          .select(lit("g").as("kind"), lit("").as("w1"),
                  lit("").as("w2"), col("a"), lit(0L).as("b")))
        .unionByName(docs.where(col("split") === "train")
          .select(explode(col("t")).as("w"))
          .agg(count_distinct(col("w")).as("a"))
          .select(lit("v").as("kind"), lit("").as("w1"),
                  lit("").as("w2"), col("a"), lit(0L).as("b")))
    }

  private def knPerDoc(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents")
      .select(col("doc_id"), trainSplit.as("split"), col("source"),
              split(col("text"), " ").as("t"))
    val pairsOf = expr(
      "transform(sequence(1, size(t) - 1), i -> " +
        "struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))")
    val m = s.table(knModelTable(s, d))
    val cb = m.where(col("kind") === "b")
      .select(col("w1"), col("w2"), col("a").as("cb"))
    val ctx = m.where(col("kind") === "x")
      .select(col("w1"), col("a").as("cw"), col("b").as("n1f"))
    val cont = m.where(col("kind") === "c")
      .select(col("w2"), col("a").as("n1b"))
    val gq = m.where(col("kind") === "g").select(col("a").as("nbb"))
    val vv = m.where(col("kind") === "v").select(col("a").as("v"))
    val pcont = (coalesce(col("n1b"), lit(0L)).cast("double") + lit(1.0)) /
      (col("nbb").cast("double") + col("v").cast("double"))
    val p = when(col("cw").isNull, pcont)
      .otherwise(
        greatest(coalesce(col("cb"), lit(0L)).cast("double") - lit(0.75),
                 lit(0.0)) / col("cw").cast("double") +
          lit(0.75) * col("n1f").cast("double") / col("cw").cast("double") *
            pcont)
    docs.where(col("split") === "eval" && size(col("t")) >= 2)
      .select(col("doc_id"), col("source"), explode(pairsOf).as("pr"))
      .select(col("doc_id"), col("source"),
              col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      .join(cb, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(gq))
      .crossJoin(broadcast(vv))
      .withColumn("lp", round(log(p), 6).cast("decimal(28,6)"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), sum("lp").as("slp"))
      .withColumn("avg_nll",
        round(-col("slp").cast("double") / col("n").cast("double"), 6)
          .cast("decimal(28,6)"))
  }

  /** The TRAIN-split TRIGRAM Kneser–Ney marginals PERSISTED (r17, the
    * r16 verdict's #6 — [[knModelTable]]'s discipline one order up):
    * trigram counts ('t': w1 = the two-word context "w1 w2", w2 = the
    * successor, a = c123) and per-context totals + distinct-successor
    * counts ('y': a = c12·, b = N1+(w1w2·)), kind-tagged and
    * w1-bucketed like every LM artifact. The BIGRAM back-off level is
    * NOT duplicated here — q374's scorer probes the existing `lmkn`
    * artifact for it (one truth per marginal set; the two artifacts
    * version independently the way a production 5-gram stack shares
    * its lower orders). */
  private def kn3ModelTable(s: SparkSession, d: String): String =
    graft.BucketedCache.ensure(s, d, "lmkn3",
      "kind STRING, w1 STRING, w2 STRING, a BIGINT, b BIGINT", "w1", 8) {
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), trainSplit.as("split"),
                split(col("text"), " ").as("t"))
      val triplesOf = expr(
        "transform(sequence(1, size(t) - 2), i -> " +
          "struct(concat_ws(' ', element_at(t, i), element_at(t, i + 1)) " +
          "AS w1, element_at(t, i + 2) AS w2))")
      val ct = docs.where(col("split") === "train" && size(col("t")) >= 3)
        .select(explode(triplesOf).as("tr"))
        .groupBy(col("tr.w1").as("w1"), col("tr.w2").as("w2"))
        .agg(count(lit(1)).as("c"))
      ct.select(lit("t").as("kind"), col("w1"), col("w2"),
                col("c").as("a"), lit(0L).as("b"))
        .unionByName(ct.groupBy("w1")
          .agg(sum("c").as("a"), count(lit(1)).as("b"))
          .select(lit("y").as("kind"), col("w1"), lit("").as("w2"),
                  col("a"), col("b")))
    }

  /** Per-eval-doc avg NLL under the interpolated TRIGRAM Kneser–Ney
    * LM (q374): P₃(w3|w1w2) = max(c123−D,0)/c12· + D·N1+(w1w2·)/c12·
    * · P₂(w3|w2), backing off to q309's bigram KN (probed from the
    * `lmkn` artifact — its own continuation floor handles OOV) when
    * the two-word context is unseen. D = 0.75 at both orders. Every P
    * is one fixed-order double chain; ln rounds ONCE at 6 dp into an
    * order-free decimal sum (the q301/q309 discipline). Docs need
    * ≥ 3 tokens to score — declared, the population a trigram event
    * exists for. */
  private def kn3PerDoc(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents")
      .select(col("doc_id"), trainSplit.as("split"), col("source"),
              split(col("text"), " ").as("t"))
    val eventsOf = expr(
      "transform(sequence(1, size(t) - 2), i -> struct(" +
        "concat_ws(' ', element_at(t, i), element_at(t, i + 1)) AS ctx, " +
        "element_at(t, i + 1) AS wp, element_at(t, i + 2) AS w3))")
    val m3 = s.table(kn3ModelTable(s, d))
    val t3 = m3.where(col("kind") === "t")
      .select(col("w1").as("ctx"), col("w2").as("w3"),
              col("a").as("c123"))
    val y3 = m3.where(col("kind") === "y")
      .select(col("w1").as("ctx"), col("a").as("c12"),
              col("b").as("n1f3"))
    val m2 = s.table(knModelTable(s, d))
    val cb = m2.where(col("kind") === "b")
      .select(col("w1").as("wp"), col("w2").as("w3"), col("a").as("cb"))
    val ctx2 = m2.where(col("kind") === "x")
      .select(col("w1").as("wp"), col("a").as("cw"), col("b").as("n1f"))
    val cont = m2.where(col("kind") === "c")
      .select(col("w2").as("w3"), col("a").as("n1b"))
    val gq = m2.where(col("kind") === "g").select(col("a").as("nbb"))
    val vv = m2.where(col("kind") === "v").select(col("a").as("v"))
    val pcont = (coalesce(col("n1b"), lit(0L)).cast("double") + lit(1.0)) /
      (col("nbb").cast("double") + col("v").cast("double"))
    val p2 = when(col("cw").isNull, pcont)
      .otherwise(
        greatest(coalesce(col("cb"), lit(0L)).cast("double") - lit(0.75),
                 lit(0.0)) / col("cw").cast("double") +
          lit(0.75) * col("n1f").cast("double") / col("cw").cast("double") *
            pcont)
    val p3 = when(col("c12").isNull, p2)
      .otherwise(
        greatest(coalesce(col("c123"), lit(0L)).cast("double") - lit(0.75),
                 lit(0.0)) / col("c12").cast("double") +
          lit(0.75) * col("n1f3").cast("double") / col("c12").cast("double") *
            p2)
    docs.where(col("split") === "eval" && size(col("t")) >= 3)
      .select(col("doc_id"), col("source"), explode(eventsOf).as("ev"))
      .select(col("doc_id"), col("source"), col("ev.ctx").as("ctx"),
              col("ev.wp").as("wp"), col("ev.w3").as("w3"))
      .join(t3, Seq("ctx", "w3"), "left")
      .join(y3, Seq("ctx"), "left")
      .join(cb, Seq("wp", "w3"), "left")
      .join(ctx2, Seq("wp"), "left")
      .join(cont, Seq("w3"), "left")
      .crossJoin(broadcast(gq))
      .crossJoin(broadcast(vv))
      .withColumn("lp", round(log(p3), 6).cast("decimal(28,6)"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), sum("lp").as("slp"))
      .withColumn("avg_nll",
        round(-col("slp").cast("double") / col("n").cast("double"), 6)
          .cast("decimal(28,6)"))
  }

  /** (doc_id, md5(n-token gram)) rows — the gram-hash projection every
    * contamination tier starts from. */
  private def gramHashes(df: DataFrame, n: Int): DataFrame = df
    .select(col("doc_id"),
            org.apache.spark.sql.graft.GraftFunctions
              .ngrams(split(col("text"), " "), n).as("g"))
    .select(col("doc_id"), md5(col("g")).as("m"))

  /** (doc_id, minimizer md5) rows — the WINNOWED gram projection the
    * exact-substring tier ships at scale (r12 verdict #2). A gram hash
    * is kept only when it is the minimum of some `w` consecutive gram
    * window (Roberts et al. 2004 winnowing; the minimap2 minimizer
    * scheme q227 already uses for pair candidates), so two documents
    * sharing a verbatim span of ≥ n+w−1 tokens share a minimizer BY
    * CONSTRUCTION, while the emitted stream carries ~2/(w+1) of the
    * gram positions — gram volume stops growing ∝ corpus × window
    * positions. Docs with fewer than w grams keep their single
    * global-min gram, so every ≥ n-token doc stays in the tier
    * (q227's candidate generator instead declares complete-windows-
    * only and drops them). The selection is a PURE MAP — since r14 it
    * runs as the codegen'd [[org.apache.spark.sql.graft
    * .MinimizerHashes]] kernel (the r12–r13 form was an interpreted
    * transform/array_min HOF chain — a CodegenFallback, the hot half
    * of q96's 100× line); same grams, same md5 identity, same window
    * minima, bit-identical survivor set. No doc-keyed shuffle, no
    * posexplode; the per-row work is O(doc tokens).
    * `carry` columns (e.g. the train/eval split bit) ride through. */
  private[operators] def minimizerHashes(df: DataFrame, n: Int, w: Int,
                                         carry: Seq[String] = Nil)
      : DataFrame = {
    val cs = carry.map(col)
    df.select((col("doc_id") +: cs) :+ split(col("text"), " ").as("t"): _*)
      .where(size(col("t")) >= n)
      .select((col("doc_id") +: cs) :+ explode(
        org.apache.spark.sql.graft.GraftFunctions.minimizerHashes(
          col("t"), n, w, shortDocGlobalMin = true)).as("m"): _*)
  }

  /** The persisted train-side contamination index (q99/q103/q104): the
    * train split's df-capped n-gram posting lists as an m-bucketed
    * table, built once per (tmpdir, corpus). The df cap is computed
    * TRAIN-SIDE — the semantic an ahead-of-time index forces — and
    * bounds every posting list at ≤ 10. collect_set dedups repeated
    * (doc, gram) occurrences AND yields the df cap in the same single
    * shuffle on m. */
  private[operators] def gramIndexTable(s: SparkSession, d: String,
                                        name: String, n: Int): String =
    graft.BucketedCache.ensure(s, d, name, "m STRING, train_id BIGINT",
                               "m", 8)(
      gramHashes(Tables(s, d, "documents").where(trainSplit === "train"), n)
        .groupBy("m").agg(collect_set(col("doc_id")).as("ids"))
        .where(size(col("ids")) <= 10)
        .select(col("m"), explode(col("ids")).as("train_id")))

  /** The incremental (per-eval-release) contamination probe shared by
    * q99 (3-shingle tier, ≥ 3 shared) and q103 (8-gram verbatim tier,
    * ≥ 1 shared): a new eval batch — the eval split's odd doc_ids,
    * standing in for "the next benchmark release" — probes the
    * persisted index via a merge join with NO train-side rescan or
    * re-shuffle (SelectedBucketsCount plan-asserted). Probe cost is
    * O(batch grams), never O(corpus). */
  private def incrContamination(s: SparkSession, d: String, idxName: String,
                                n: Int, minShared: Int,
                                outCol: String): DataFrame = {
    val idxT = gramIndexTable(s, d, idxName, n)
    val evalBatch = gramHashes(
      Tables(s, d, "documents")
        .where(trainSplit === "eval" && col("doc_id") % 2 === 1), n)
      .withColumnRenamed("doc_id", "eval_id").distinct()
    evalBatch.join(s.table(idxT).hint("merge"), Seq("m"))
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as(outCol))
      .where(col(outCol) >= minShared)
      .orderBy("eval_id", "train_id")
  }

  /** [[gramIndexTable]]'s winnowed sibling (q103): the train side's
    * df-capped MINIMIZER posting lists as an m-bucketed persisted
    * index — same TRAIN-SIDE df cap, same ≤ 10 posting-list bound,
    * ~2/(w+1) the index size of the every-position form. */
  private[operators] def minimizerIndexTable(s: SparkSession, d: String,
                                             name: String, n: Int,
                                             w: Int): String =
    graft.BucketedCache.ensure(s, d, name, "m STRING, train_id BIGINT",
                               "m", 8)(
      minimizerHashes(Tables(s, d, "documents")
                        .where(trainSplit === "train"), n, w)
        .groupBy("m").agg(collect_set(col("doc_id")).as("ids"))
        .where(size(col("ids")) <= 10)
        .select(col("m"), explode(col("ids")).as("train_id")))

  /** [[incrContamination]] over the minimizer index: the eval batch
    * emits the SAME winnowed selection the index was built with, so
    * the ≥ n+w−1-token span guarantee holds across the index
    * boundary. Probe cost is O(batch minimizers), never O(corpus). */
  private def incrContaminationMin(s: SparkSession, d: String,
                                   idxName: String, n: Int, w: Int,
                                   minShared: Int,
                                   outCol: String): DataFrame = {
    val idxT = minimizerIndexTable(s, d, idxName, n, w)
    val evalBatch = minimizerHashes(
      Tables(s, d, "documents")
        .where(trainSplit === "eval" && col("doc_id") % 2 === 1), n, w)
      .withColumnRenamed("doc_id", "eval_id").distinct()
    evalBatch.join(s.table(idxT).hint("merge"), Seq("m"))
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as(outCol))
      .where(col(outCol) >= minShared)
      .orderBy("eval_id", "train_id")
  }

  /** The shared inverted-index contamination scan behind q87 (3-token
    * shingles, ≥ 3 shared) and q96 (8-token verbatim grams, ≥ 1
    * shared): (eval doc, train doc) pairs sharing `minShared` DISTINCT
    * df-capped n-token gram hashes. One gram posting list at a time:
    * df per gram hash with a > 10-doc cap (boilerplate AND the hot
    * keys that would otherwise blow up pair generation — the cap also
    * bounds every posting list at ≤ 10), then the survivors' eval and
    * train id-sets per gram (collect_set reuses the df-agg's
    * partitioning on the gram hash — no extra shuffle; it also dedups
    * repeated (doc, gram) occurrences, so `shared` counts DISTINCT
    * grams), then the ≤ 25 exploded pairs per gram counted per
    * (eval, train). Never a corpus×corpus join. */
  private def contaminationPairs(docs: DataFrame, n: Int, minShared: Int,
                                 outCol: String): DataFrame =
    contaminationPairsFrom(docs
      .select(col("doc_id"), trainSplit.as("split"),
              org.apache.spark.sql.graft.GraftFunctions
                .ngrams(split(col("text"), " "), n).as("g"))
      .select(col("doc_id"), col("split"), md5(col("g")).as("m")),
      minShared, outCol)

  /** The pair machinery of [[contaminationPairs]] over an already-
    * emitted (doc_id, split, m) gram stream — q96 feeds it the
    * winnowed [[minimizerHashes]] stream instead of every position. */
  private def contaminationPairsFrom(sh0: DataFrame, minShared: Int,
                                     outCol: String): DataFrame = {
    // r19: the gram stream feeds the df cap AND the posting probe —
    // unpinned, the gram/minimizer emission + md5 ran twice (q261's
    // fix, guide §2.4). Pinned, it runs once for both q87 and q96.
    val (sh, shh) = org.apache.spark.sql.graft.InternalPin.pin(sh0)
    shh.count(); graft.PinScope.retain(shh)
    val rare = sh.groupBy("m")
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") <= 10).select("m")
    sh.join(rare, Seq("m"))
      .groupBy("m")
      .agg(collect_set(when(col("split") === "eval", col("doc_id")))
             .as("evals"),
           collect_set(when(col("split") === "train", col("doc_id")))
             .as("trains"))
      .select(explode(col("evals")).as("eval_id"), col("trains"))
      .select(col("eval_id"), explode(col("trains")).as("train_id"))
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as(outCol))
      .where(col(outCol) >= minShared)
      .orderBy("eval_id", "train_id")
  }

  /** q299's oracle: the identical 8-round induction as generated CTEs
    * — per round one argmax-pair CTE (p\$k) and one greedy-parity
    * merge CTE (s\$k), the SAME window algebra the Spark side runs
    * (cumulative matched-count → run id → within-run parity → lag
    * consume), so the learned merge table matches exactly. */
  /** Per-word symbol rows (w, freq, i, s) — character-exploded, the
    * state both the trainer (q299) and the encoder (q346) fold merges
    * over. */
  /** Code-point-wise symbol split — the local twin of the SQL seed
    * `transform(sequence(1, length(w)), i -> substring(w, i, 1))`
    * (both `length`/`substring` count code points, so the split is
    * identical for any input). */
  private[graft] def bpeSplitSyms(w: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      buf += w.substring(i, i + n)
      i += n
    }
    buf.toArray
  }

  /** ONE greedy left-to-right merge application of the pair (a, b)
    * over a packed symbol array — r19: the windowed
    * cumulative-parity formulation (lead + matched-count run ids +
    * within-run parity + lag consume, five window passes per merge
    * round) is exactly leftmost-non-overlapping greedy pairing, so
    * it runs as a LOCAL SCAN on the vocabulary-bounded symbol rows:
    * zero shuffles per round instead of five window passes, shared
    * verbatim by the trainer's rounds and q346's full-vocab encode
    * so the two can never disagree on merge semantics. The q299/q346
    * specs pin it against independent in-memory replays and the
    * DuckDB oracle still runs the windowed-CTE text. */
  private[graft] def bpeMergeLocal(syms: Array[String], a: String,
                                   b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }


  /** q299's 8-round training loop over the [[BpeTrainVocabCap]]-capped
    * vocabulary — returns the learned merge table (round, lft, rgt,
    * pair_count); each round's argmax is a 1-row driver collect (the
    * declared bounded fold) and each pass pins. Shared by q299 (which
    * presents the table) and q346 (which applies it). */
  private def bpeTrainMerges(s: SparkSession, d: String)
      : Seq[(Int, String, String, Long)] = {
    val W = org.apache.spark.sql.expressions.Window
    val vocab = Tables(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("rk",
        row_number().over(W.orderBy(col("freq").desc, col("w"))))
      .where(col("rk") <= BpeTrainVocabCap).drop("rk")
    import s.implicits._
    // r19 (second cut): the ENTIRE 8-round induction folds in ONE task
    // over the [[BpeTrainVocabCap]]-bounded vocabulary (guide §1.2
    // step 1 / §2.4 — the first cut's one-aggregate-per-round form
    // still paid ~3 scheduler jobs per round plus a driver argmax
    // round-trip, ~24 jobs for ≤4096 words of state). Pair counting,
    // the argmax and the greedy merge run as a local loop inside the
    // task; only the 8 learned merges return. The argmax tie rule is
    // unchanged — (cnt desc, a asc, b asc) under UTF8String's
    // unsigned-byte string order (`cmp`, the q348 idiom), which is
    // exactly what `.orderBy(col("cnt").desc, col("a"), col("b"))`
    // compared — and the merge semantics are [[bpeMergeLocal]]'s, the
    // same function the per-round form and q346's encoder use, so the
    // learned table is identical by construction.
    vocab.select(col("w"), col("freq")).as[(String, Long)]
      .repartition(1)
      .mapPartitions { it =>
        def cmp(a: String, b: String): Int =
          java.util.Arrays.compareUnsigned(
            a.getBytes("UTF-8"), b.getBytes("UTF-8"))
        val words = it.map { case (w, f) => (f, bpeSplitSyms(w)) }.toArray
        val merges =
          scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
        for (round <- 1 to 8) {
          val cnt = new java.util.HashMap[String, (String, String, Long)]()
          for ((f, sy) <- words) {
            var i = 0
            while (i < sy.length - 1) {
              val k = sy(i) + " " + sy(i + 1)
              val prev = cnt.get(k)
              cnt.put(k, if (prev == null) (sy(i), sy(i + 1), f)
                         else (prev._1, prev._2, prev._3 + f))
              i += 1
            }
          }
          var best: (String, String, Long) = null
          val vs = cnt.values().iterator()
          while (vs.hasNext) {
            val v = vs.next()
            if (best == null || v._3 > best._3 ||
                (v._3 == best._3 &&
                 (cmp(v._1, best._1) < 0 ||
                  (v._1 == best._1 && cmp(v._2, best._2) < 0))))
              best = v
          }
          merges += ((round, best._1, best._2, best._3))
          var j = 0
          while (j < words.length) {
            words(j) = (words(j)._1,
                        bpeMergeLocal(words(j)._2, best._1, best._2))
            j += 1
          }
        }
        merges.iterator
      }
      .collect().toSeq.sortBy(_._1)
  }

  /** One greedy merge-application round as oracle CTE text — the SQL
    * twin of [[bpeMergeLocal]]'s parity algebra, parameterized by output/source symbol
    * tables and the 1-row learned-pair CTE, so the trainer's rounds
    * (q299) and the full-vocab encode chain (q346) share ONE merge
    * semantics in both engines. */
  private def bpeApplyRoundCte(out: String, src: String,
                               pair: String): String =
    s"""$out AS MATERIALIZED (
       |  SELECT w, freq,
       |    row_number() OVER (PARTITION BY w ORDER BY i) AS i,
       |    CASE WHEN kept THEN s || nx ELSE s END AS s
       |  FROM (
       |    SELECT *, coalesce(lag(kept)
       |        OVER (PARTITION BY w ORDER BY i), false) AS consumed
       |    FROM (
       |      SELECT *, mat AND prank % 2 = 1 AS kept
       |      FROM (
       |        SELECT *, sum(CASE WHEN mat THEN 1 ELSE 0 END)
       |            OVER (PARTITION BY w, grp ORDER BY i) AS prank
       |        FROM (
       |          SELECT *, i - mrank AS grp
       |          FROM (
       |            SELECT *, sum(CASE WHEN mat THEN 1 ELSE 0 END)
       |                OVER (PARTITION BY w ORDER BY i) AS mrank
       |            FROM (
       |              SELECT w, freq, i, s, nx,
       |                coalesce(s = (SELECT a FROM $pair) AND
       |                         nx = (SELECT b FROM $pair), false) AS mat
       |              FROM (SELECT w, freq, i, s,
       |                      lead(s) OVER (PARTITION BY w ORDER BY i)
       |                        AS nx
       |                    FROM $src)))))))
       |  WHERE NOT consumed)""".stripMargin

  /** The shared q299/q346 training chain: corpus word counts, the
    * capped vocab, the char-exploded s0, and the 8 argmax+apply
    * rounds (p1..p8, s1..s8) — everything after `WITH `. */
  private def bpeTrainChainCte: String = {
    val rounds = (1 to 8).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT s AS a, nx AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT s, freq,
         |          lead(s) OVER (PARTITION BY w ORDER BY i) AS nx
         |        FROM s${k - 1})
         |  WHERE nx IS NOT NULL GROUP BY 1, 2
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |${bpeApplyRoundCte(s"s$k", s"s${k - 1}", s"p$k")}""".stripMargin
    }.mkString(",\n")
    s"""words AS (
       |  SELECT w, count(*) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w
       |        FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |vocab AS (
       |  SELECT w, freq FROM (
       |    SELECT w, freq,
       |      row_number() OVER (ORDER BY freq DESC, w) AS rk
       |    FROM words)
       |  WHERE rk <= $BpeTrainVocabCap),
       |s0 AS MATERIALIZED (
       |  SELECT w, freq, i, w[CAST(i AS INT)] AS s
       |  FROM (SELECT w, freq, unnest(range(1, len(w) + 1)) AS i
       |        FROM vocab)),
       |$rounds""".stripMargin
  }

  /** q347's oracle: the three tiers' certified pair sets restated
    * inline (q341's minimizer pairs, q340's Hamming pairs, q339's
    * exact-lattice semantic pairs — the identical texts their own
    * oracles run), then the staged keep-min funnel per source. */
  private def pipelineV4Oracle: String = {
    val fpConcat = (0 until 64)
      .map(p => s"CASE WHEN s$p > 0 THEN '1' ELSE '0' END")
      .mkString(" || ")
    val hamSql = (1 to 64).map(i =>
      s"CASE WHEN substr(a.fp, $i, 1) <> substr(b.fp, $i, 1) " +
        "THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH ${SimilarityExtOps.lloydCteOn("WHERE vec_id % 2 = 0",
                s"vec_id < ${2 * SimilarityExtOps.Cents}")},
       |onb AS (SELECT vec_id, cid, xi, nv FROM (
       |  SELECT a3.vec_id, a3.cid, e.xi,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      j -> e.xi[j] * e.xi[j])) AS BIGINT) AS nv,
       |    row_number() OVER (PARTITION BY a3.cid
       |                       ORDER BY a3.vec_id) AS mrk
       |  FROM a3 JOIN e USING (vec_id))
       |  WHERE mrk <= ${SimilarityExtOps.SemDedupClusterCap}),
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
       |  WHERE mrk <= ${SimilarityExtOps.SemDedupClusterCap}),
       |pr AS (
       |  SELECT o.vec_id AS a, n.vec_id AS b,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      j -> o.xi[j] * n.xi[j])) AS BIGINT) AS dot,
       |    o.nv AS na, n.nv AS nb
       |  FROM onb o JOIN bn n ON o.cid = n.cid
       |  UNION ALL
       |  SELECT l.vec_id, r.vec_id,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      j -> l.xi[j] * r.xi[j])) AS BIGINT),
       |    l.nv, r.nv
       |  FROM bn l JOIN bn r
       |    ON l.cid = r.cid AND l.vec_id < r.vec_id),
       |ds AS (SELECT DISTINCT b AS doc_id FROM pr
       |       WHERE dot > 0 AND
       |         CAST(dot AS DECIMAL(38,0)) * dot * 10000 >=
       |           CAST(na AS DECIMAL(38,0)) * nb * 1600),
       |tk AS (SELECT doc_id, string_split(text, ' ') AS t
       |       FROM documents
       |       WHERE len(string_split(text, ' ')) >= 8),
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
       |mzc AS (SELECT mz.doc_id, mz.m FROM mz JOIN cap USING (m)),
       |dm AS (SELECT DISTINCT doc_id FROM (
       |    SELECT b.doc_id
       |    FROM mzc a JOIN mzc b
       |      ON a.m = b.m AND a.doc_id < b.doc_id
       |    WHERE b.doc_id % 2 = 1
       |    GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2)),
       |t2 AS (
       |  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
       |  FROM documents),
       |fps AS MATERIALIZED (
       |  SELECT doc_id, $fpConcat AS fp
       |  FROM (SELECT doc_id, ${DedupExtOps.simhashBits64}
       |        FROM t2 GROUP BY doc_id)),
       |bands AS (
       |  SELECT doc_id, band, substr(fp, band * 16 + 1, 16) AS bk
       |  FROM fps, (SELECT unnest([0, 1, 2, 3]) AS band) u),
       |oc AS (
       |  SELECT * FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, bk) AS bcn
       |    FROM bands WHERE doc_id % 2 = 0)
       |  WHERE bcn <= 64),
       |nc AS (
       |  SELECT * FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, bk) AS bcn
       |    FROM bands WHERE doc_id % 2 = 1)
       |  WHERE bcn <= 64),
       |cand AS (
       |  SELECT DISTINCT least(n.doc_id, o.doc_id) AS id_a,
       |    greatest(n.doc_id, o.doc_id) AS id_b
       |  FROM nc n JOIN oc o ON n.band = o.band AND n.bk = o.bk
       |  UNION
       |  SELECT DISTINCT x.doc_id, y.doc_id
       |  FROM nc x JOIN nc y
       |    ON x.band = y.band AND x.bk = y.bk
       |   AND x.doc_id < y.doc_id),
       |dhh AS (SELECT DISTINCT id_b AS doc_id FROM (
       |    SELECT id_a, id_b, CAST($hamSql AS BIGINT) AS hamming
       |    FROM cand JOIN fps a ON cand.id_a = a.doc_id
       |              JOIN fps b ON cand.id_b = b.doc_id)
       |  WHERE hamming <= 3 AND id_b % 2 = 1),
       |fl AS (
       |  SELECT source,
       |    doc_id IN (SELECT doc_id FROM dm) AS m1,
       |    doc_id IN (SELECT doc_id FROM dhh) AS h1,
       |    doc_id IN (SELECT doc_id FROM ds) AS s1
       |  FROM documents WHERE doc_id % 2 = 1)
       |SELECT source, count(*) AS batch_docs,
       |  CAST(sum(CASE WHEN m1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS dropped_minimizer,
       |  CAST(sum(CASE WHEN NOT m1 AND h1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS dropped_hamming,
       |  CAST(sum(CASE WHEN NOT m1 AND NOT h1 AND s1 THEN 1 ELSE 0 END)
       |       AS BIGINT) AS dropped_semantic,
       |  CAST(sum(CASE WHEN NOT m1 AND NOT h1 AND NOT s1 THEN 1 ELSE 0
       |           END) AS BIGINT) AS kept,
       |  round(CAST(sum(CASE WHEN NOT m1 AND NOT h1 AND NOT s1 THEN 1
       |                      ELSE 0 END) AS DOUBLE) /
       |        CAST(count(*) AS DOUBLE), 6) AS keep_ratio
       |FROM fl GROUP BY source ORDER BY source""".stripMargin
  }

  private def bpeTrainOracle: String = {
    val out = (1 to 8).map(k =>
      s"SELECT $k AS round, a AS lft, b AS rgt, cnt AS pair_count FROM p$k")
      .mkString("\nUNION ALL\n")
    s"""WITH $bpeTrainChainCte
       |$out
       |ORDER BY round""".stripMargin
  }

  /** q346's oracle: the train chain plus a parallel encode chain over
    * the FULL vocabulary (t0..t8, each round consuming the trained
    * p$k pair), then per-word encoded lengths joined back to the
    * token stream and rolled up per (lang, source). */
  private def bpeApplyOracle: String = {
    val applyRounds = (1 to 8)
      .map(k => bpeApplyRoundCte(s"t$k", s"t${k - 1}", s"p$k"))
      .mkString(",\n")
    s"""WITH $bpeTrainChainCte,
       |t0 AS MATERIALIZED (
       |  SELECT w, freq, i, w[CAST(i AS INT)] AS s
       |  FROM (SELECT w, freq, unnest(range(1, len(w) + 1)) AS i
       |        FROM words)),
       |$applyRounds,
       |enc AS (SELECT w, count(*) AS enc FROM t8 GROUP BY w),
       |dt AS (
       |  SELECT lang, source, doc_id,
       |    unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |per AS (
       |  SELECT lang, source, doc_id,
       |    sum(e.enc) AS enc, sum(len(dt.w)) AS base
       |  FROM dt JOIN enc e USING (w)
       |  WHERE len(dt.w) > 0
       |  GROUP BY 1, 2, 3)
       |SELECT lang, source, count(*) AS docs,
       |  CAST(sum(base) AS BIGINT) AS base_symbols,
       |  CAST(sum(enc) AS BIGINT) AS bpe_tokens,
       |  round(CAST(sum(enc) AS DOUBLE) / CAST(sum(base) AS DOUBLE), 6)
       |    AS compression
       |FROM per GROUP BY 1, 2 ORDER BY lang, source""".stripMargin
  }

  /** The q301 held-out bigram-LM scoring chain (train-split
    * model tables -> eval pair scoring -> per-doc avg NLL `pd`),
    * shared verbatim by the q301 and q315 oracles. */
  /** q360's per-doc Gopher battery as oracle CTEs, ending at
    * `gp(doc_id, source, n_words, r1..r7)` — the SQL twin of
    * [[gopherPerDoc]], shared by the q360 report and the q364
    * funnel's first gate. */
  private val gopherPdCte: String =
    """gd0 AS (
      |  SELECT doc_id, source, text, string_split(text, ' ') AS t,
      |    CAST(len(text) AS BIGINT) AS chars
      |  FROM documents),
      |gbase AS (
      |  SELECT doc_id, source, chars,
      |    CAST(len(t) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(t, w -> len(w)))
      |         AS BIGINT) AS word_chars,
      |    CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]')))
      |         AS BIGINT) AS alpha_words,
      |    CAST(len(list_distinct(list_filter(t, w -> w IN
      |      ('the','be','to','of','and','that','have','with'))))
      |         AS BIGINT) AS stops,
      |    CAST((len(text) - len(replace(text, '#', ''))) +
      |         (len(text) - len(replace(text, '...', ''))) // 3
      |         AS BIGINT) AS syms
      |  FROM gd0),
      |gg2 AS (
      |  SELECT doc_id, cnt * len(g) AS top2_mass FROM (
      |    SELECT doc_id, g, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY doc_id
      |                         ORDER BY count(*) DESC, g) AS rn
      |    FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |            i -> array_to_string(t[i:i+1], ' '))) AS g FROM gd0)
      |    GROUP BY doc_id, g) WHERE rn = 1),
      |gg5 AS (
      |  SELECT doc_id, sum(cnt * len(g)) AS dup5_mass FROM (
      |    SELECT doc_id, g, count(*) AS cnt
      |    FROM (SELECT doc_id,
      |            unnest(list_transform(range(1, len(t) - 3),
      |              i -> array_to_string(t[i:i+4], ' '))) AS g
      |          FROM gd0)
      |    GROUP BY doc_id, g) WHERE cnt >= 2 GROUP BY doc_id),
      |gp AS (
      |  SELECT b.doc_id, b.source, b.n_words,
      |    b.n_words >= 50 AND b.n_words <= 100000 AS r1,
      |    3 * b.n_words <= b.word_chars AND
      |      b.word_chars <= 10 * b.n_words AS r2,
      |    10 * b.syms <= b.n_words AS r3,
      |    5 * b.alpha_words >= 4 * b.n_words AS r4,
      |    b.stops >= 2 AS r5,
      |    5 * coalesce(gg2.top2_mass, 0) <= b.chars AS r6,
      |    20 * coalesce(gg5.dup5_mass, 0) <= 3 * b.chars AS r7
      |  FROM gbase b LEFT JOIN gg2 USING (doc_id)
      |       LEFT JOIN gg5 USING (doc_id))""".stripMargin

  private val pplPdCte: String =
    s"""dd AS (
       |  SELECT doc_id, $trainSplitSql AS split, source,
       |    string_split(text, ' ') AS t
       |  FROM documents),
       |tp AS (
       |  SELECT t[CAST(i AS INT)] AS w1,
       |         t[CAST(i + 1 AS INT)] AS w2
       |  FROM (SELECT t, unnest(range(1, len(t))) AS i
       |        FROM dd WHERE split = 'train' AND len(t) >= 2)),
       |cb AS (SELECT w1, w2, count(*) AS cb FROM tp GROUP BY 1, 2),
       |cu AS (SELECT w1, count(*) AS cu
       |       FROM (SELECT unnest(t) AS w1 FROM dd
       |             WHERE split = 'train')
       |       GROUP BY 1),
       |vv AS (SELECT count(*) AS v FROM cu),
       |ep AS (
       |  SELECT doc_id, source, t[CAST(i AS INT)] AS w1,
       |         t[CAST(i + 1 AS INT)] AS w2
       |  FROM (SELECT doc_id, source, t,
       |          unnest(range(1, len(t))) AS i
       |        FROM dd WHERE split = 'eval' AND len(t) >= 2)),
       |sc AS (
       |  SELECT ep.doc_id, ep.source,
       |    CAST(round(ln((CAST(coalesce(cb.cb, 0) AS DOUBLE) + 1.0) /
       |                  (CAST(coalesce(cu.cu, 0) AS DOUBLE) +
       |                   CAST((SELECT v FROM vv) AS DOUBLE))), 6)
       |         AS DECIMAL(28,6)) AS lp
       |  FROM ep LEFT JOIN cb ON ep.w1 = cb.w1 AND ep.w2 = cb.w2
       |          LEFT JOIN cu ON ep.w1 = cu.w1),
       |pd AS (
       |  SELECT doc_id, source, count(*) AS n,
       |    CAST(round(-CAST(sum(lp) AS DOUBLE) /
       |               CAST(count(*) AS DOUBLE), 6)
       |         AS DECIMAL(28,6)) AS avg_nll
       |  FROM sc GROUP BY 1, 2)""".stripMargin

  def oracles: Map[String, String] = {
    val occSql = (tg: String) => s"(len(text) - len(replace(text, '$tg', ''))) / 3"
    val scores = langTrigrams.map { case (lg, tgs) =>
      s"${tgs.map(occSql).mkString(" + ")} AS s_$lg"
    }.mkString(", ")
    val langs = langTrigrams.map(_._1)
    val predSql = langs.init.foldRight(s"'${langs.last}'") { (lg, els) =>
      val ge = langs.filter(_ != lg).map(o => s"s_$lg >= s_$o").mkString(" AND ")
      s"CASE WHEN $ge THEN '$lg' ELSE $els END"
    }
    Map(
      // same distinct 8-gram hashes, same min-doc_id first claim
      "q242_gram_novelty" ->
        """WITH g0 AS (
          |  SELECT DISTINCT doc_id,
          |    md5(unnest(list_transform(range(1, len(t) - 6),
          |        i -> array_to_string(t[i:i+7], ' ')))) AS m
          |  FROM (SELECT doc_id, string_split(text, ' ') AS t
          |        FROM documents)),
          |f AS (SELECT m, min(doc_id) AS first_id FROM g0 GROUP BY m),
          |pd AS (SELECT g0.doc_id, count(*) AS g,
          |         sum(CASE WHEN g0.doc_id = f.first_id
          |                  THEN 1 ELSE 0 END) AS nv
          |       FROM g0 JOIN f USING (m) GROUP BY g0.doc_id)
          |SELECT d.source, count(*) AS docs,
          |  CAST(sum(g) AS BIGINT) AS grams,
          |  CAST(sum(nv) AS BIGINT) AS novel,
          |  round(CAST(sum(nv) AS DOUBLE) / CAST(sum(g) AS DOUBLE), 6)
          |    AS novelty
          |FROM pd JOIN documents d USING (doc_id)
          |GROUP BY d.source ORDER BY d.source""".stripMargin,

      // same even/odd split, same absent-from-base + first-in-batch rule
      "q246_novelty_incremental" ->
        """WITH g0 AS (
          |  SELECT DISTINCT doc_id,
          |    md5(unnest(list_transform(range(1, len(t) - 6),
          |        i -> array_to_string(t[i:i+7], ' ')))) AS m
          |  FROM (SELECT doc_id, string_split(text, ' ') AS t
          |        FROM documents)),
          |base AS (SELECT DISTINCT m FROM g0 WHERE doc_id % 2 = 0),
          |batch AS (SELECT doc_id, m FROM g0 WHERE doc_id % 2 = 1),
          |fresh AS (SELECT b.doc_id, b.m FROM batch b
          |          WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.m = b.m)),
          |claims AS (SELECT m, min(doc_id) AS doc_id FROM fresh GROUP BY m),
          |nv AS (SELECT doc_id, count(*) AS nv FROM claims GROUP BY doc_id),
          |pd AS (SELECT b.doc_id, count(*) AS g FROM batch b
          |       GROUP BY b.doc_id)
          |SELECT d.source, count(*) AS docs,
          |  CAST(sum(pd.g) AS BIGINT) AS batch_grams,
          |  CAST(sum(coalesce(nv.nv, 0)) AS BIGINT) AS novel,
          |  round(CAST(sum(coalesce(nv.nv, 0)) AS DOUBLE) /
          |        CAST(sum(pd.g) AS DOUBLE), 6) AS novelty
          |FROM pd LEFT JOIN nv USING (doc_id)
          |JOIN documents d USING (doc_id)
          |GROUP BY d.source ORDER BY d.source""".stripMargin,

      // same lead(1)/lead(2) pair stream, slot margins, min count 10,
      // declared (pmi desc, w1, w2) top-20
      "q243_pmi_pairs" ->
        """WITH tk0 AS (
          |  SELECT doc_id,
          |    unnest(range(0, len(string_split(text, ' ')))) AS pos,
          |    unnest(string_split(text, ' ')) AS tok
          |  FROM documents),
          |tk AS (SELECT * FROM tk0 WHERE len(tok) > 0),
          |ld AS (SELECT doc_id, tok,
          |    lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS n1,
          |    lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS n2
          |  FROM tk),
          |pr0 AS (
          |  SELECT least(tok, u) AS w1, greatest(tok, u) AS w2
          |  FROM (SELECT tok, unnest([n1, n2]) AS u FROM ld)
          |  WHERE u IS NOT NULL),
          |prs AS (SELECT w1, w2, count(*) AS c FROM pr0 GROUP BY 1, 2),
          |marg AS (SELECT t, CAST(sum(c) AS BIGINT) AS m FROM (
          |    SELECT unnest([w1, w2]) AS t, c FROM prs) GROUP BY t),
          |n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM prs)
          |SELECT w1, w2, c,
          |  round(ln(4.0 * CAST(c AS DOUBLE) * CAST(nn AS DOUBLE) /
          |           (CAST(m1.m AS DOUBLE) * CAST(m2.m AS DOUBLE))), 6)
          |    AS pmi
          |FROM prs JOIN marg m1 ON m1.t = prs.w1
          |         JOIN marg m2 ON m2.t = prs.w2
          |         CROSS JOIN n
          |WHERE c >= 10
          |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

      // identical total order (count DESC, token ASC), identical
      // unrounded cum/total target test, share rounded 6 once
      "q224_vocab_coverage" ->
        """WITH tk0 AS (SELECT unnest(string_split(text, ' ')) AS tok
          |            FROM documents),
          |t AS (SELECT tok, count(*) AS c FROM tk0
          |      WHERE len(tok) > 0 GROUP BY 1),
          |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM t),
          |r AS (SELECT tok, c,
          |    CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT)
          |      AS rk,
          |    sum(c) OVER (ORDER BY c DESC, tok
          |                 ROWS UNBOUNDED PRECEDING) AS cum FROM t),
          |s AS (SELECT rk, CAST(cum AS DOUBLE) / n AS shr FROM r, tot),
          |tg(metric, q) AS (VALUES ('cov90', 0.90), ('cov95', 0.95),
          |                         ('cov99', 0.99)),
          |cov AS (SELECT tg.metric, min(s.rk) AS tokens,
          |    round(arg_min(s.shr, s.rk), 6) AS share
          |  FROM tg JOIN s ON s.shr >= tg.q GROUP BY 1),
          |topk AS (SELECT 'top' || CAST(rk AS VARCHAR) AS metric,
          |    rk AS tokens, round(shr, 6) AS share
          |  FROM s WHERE rk = 10 OR rk = 25)
          |SELECT * FROM (SELECT * FROM cov UNION ALL
          |               SELECT * FROM topk) ORDER BY metric""".stripMargin,

      // the 3 weighted power-iteration rounds unrolled as CTEs —
      // integer arithmetic only, q115's oracle discipline on the
      // co-occurrence graph
      "q228_textrank" -> {
        val S = "1000000000000"
        def round(i: Int) =
          s"""c$i AS (SELECT e.v AS id,
             |      CAST(sum((r${i - 1}.r * e.w) // d.ws) AS BIGINT) AS sc
             |    FROM edges e JOIN deg d ON d.u = e.u
             |                 JOIN r${i - 1} ON r${i - 1}.id = e.u
             |    GROUP BY 1),
             |r$i AS (SELECT r${i - 1}.id,
             |      CAST((15 * ($S // nn)) // 100 +
             |           (85 * coalesce(c$i.sc, 0)) // 100 AS BIGINT) AS r
             |    FROM r${i - 1} LEFT JOIN c$i ON c$i.id = r${i - 1}.id,
             |         n)""".stripMargin
        s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
           |            FROM documents),
           |pos AS (SELECT doc_id, t,
           |          unnest(generate_series(1, len(t))) AS i FROM tk),
           |off(k) AS (VALUES (1), (2)),
           |pr0 AS (SELECT least(t[i], t[i + o.k]) AS a,
           |          greatest(t[i], t[i + o.k]) AS b
           |        FROM pos, off o
           |        WHERE i + o.k <= len(t) AND len(t[i]) > 0
           |          AND len(t[i + o.k]) > 0 AND t[i] <> t[i + o.k]),
           |wt AS (SELECT a, b, count(*) AS w FROM pr0 GROUP BY 1, 2),
           |edges AS (SELECT a AS u, b AS v, w FROM wt
           |          UNION ALL SELECT b, a, w FROM wt),
           |deg AS (SELECT u, CAST(sum(w) AS BIGINT) AS ws
           |        FROM edges GROUP BY u),
           |n AS (SELECT count(*) AS nn FROM deg),
           |r0 AS (SELECT u AS id, CAST($S // nn AS BIGINT) AS r
           |       FROM deg, n),
           |${round(1)},
           |${round(2)},
           |${round(3)}
           |SELECT id AS token, r AS rank FROM r3
           |ORDER BY rank DESC, token LIMIT 10""".stripMargin
      },

      // the artifact must be invisible: the same rollup over the
      // recursive-CTE clustering, q67's md5-prefix rule on the rep
      "q226_group_split" ->
        s"""${DedupExtOps.clustersCte},
           |rep AS (SELECT d.doc_id,
           |          coalesce(c.cluster_id, d.doc_id) AS rep
           |        FROM documents d LEFT JOIN clusters c USING (doc_id))
           |SELECT CASE WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1)
           |              <= 'b' THEN 'train' ELSE 'eval' END AS split,
           |  count(*) AS docs, count(DISTINCT rep) AS n_groups,
           |  CAST(sum(CASE WHEN
           |      (substr(md5(CAST(rep AS VARCHAR)), 1, 1) <= 'b') <>
           |      (substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b')
           |    THEN 1 ELSE 0 END) AS BIGINT) AS flipped
           |FROM rep GROUP BY 1 ORDER BY 1""".stripMargin,

      "q48_lang_id" ->
        s"""SELECT lang, $predSql AS pred, count(*) AS cnt
           |FROM (SELECT lang, $scores FROM documents)
           |GROUP BY lang, pred ORDER BY lang, pred""".stripMargin,

      // the same k=8 / df>=2 anchor rule, coverage union, and
      // doc-ordered rewrite fold, token positions 1-based on both
      // engines; anti-join spelled as a NULL-rejecting left join
      "q349_span_excise" ->
        """WITH d AS (SELECT doc_id, source, text,
          |    string_split(text, ' ') AS t FROM documents),
          |g AS (SELECT doc_id, i,
          |    md5(array_to_string(t[i:i+7], ' ')) AS gm
          |  FROM (SELECT doc_id, t,
          |          unnest(range(1, len(t) - 6)) AS i
          |        FROM d WHERE len(t) >= 8)),
          |hot AS (SELECT gm FROM (
          |    SELECT gm, count(DISTINCT doc_id) AS df
          |    FROM g GROUP BY 1) WHERE df >= 2),
          |cov AS (SELECT DISTINCT doc_id, i + o AS j
          |  FROM (SELECT g.doc_id, g.i FROM g JOIN hot USING (gm)),
          |       (SELECT unnest(range(0, 8)) AS o)),
          |tok AS (SELECT doc_id, j, t[CAST(j AS INT)] AS tok
          |  FROM (SELECT doc_id, t,
          |          unnest(range(1, len(t) + 1)) AS j FROM d)),
          |kept AS (SELECT tok.doc_id,
          |    string_agg(tok.tok, ' ' ORDER BY tok.j) AS new_text
          |  FROM tok LEFT JOIN cov
          |    ON tok.doc_id = cov.doc_id AND tok.j = cov.j
          |  WHERE cov.doc_id IS NULL GROUP BY tok.doc_id),
          |rem AS (SELECT doc_id, count(*) AS tr FROM cov GROUP BY 1),
          |pd AS (SELECT d.doc_id, d.source,
          |    coalesce(k.new_text, '') AS new_text,
          |    coalesce(r.tr, 0) AS tokens_removed,
          |    length(d.text) - length(coalesce(k.new_text, ''))
          |      AS bytes_removed
          |  FROM d LEFT JOIN kept k ON d.doc_id = k.doc_id
          |         LEFT JOIN rem r ON d.doc_id = r.doc_id)
          |SELECT source, count(*) AS docs,
          |  CAST(sum(CASE WHEN tokens_removed > 0 THEN 1 ELSE 0 END)
          |       AS BIGINT) AS docs_excised,
          |  CAST(sum(tokens_removed) AS BIGINT) AS tokens_removed,
          |  CAST(sum(bytes_removed) AS BIGINT) AS bytes_removed,
          |  md5(string_agg(CAST(doc_id AS VARCHAR) || ':' ||
          |                 md5(new_text), ';' ORDER BY doc_id))
          |    AS rewrite_md5
          |FROM pd GROUP BY source ORDER BY source""".stripMargin,

      // Cavnar–Trenkle rank profiles restated: even-doc top-64
      // trigram profiles per language, odd-doc top-64 profiles,
      // out-of-place distance via 64·|grams| − Σ matched (64−|Δ|)
      "q348_langid_train" ->
        """WITH tg AS (
          |  SELECT lang, substr(text, CAST(i AS INT), 3) AS g
          |  FROM (SELECT lang, text,
          |          unnest(range(1, length(text) - 1)) AS i
          |        FROM documents
          |        WHERE doc_id % 2 = 0 AND length(text) >= 3)),
          |pc AS (SELECT lang, g, count(*) AS c FROM tg GROUP BY 1, 2),
          |pf AS (SELECT lang AS plang, g, lr FROM (
          |    SELECT lang, g, row_number() OVER (
          |        PARTITION BY lang ORDER BY c DESC, g) AS lr
          |    FROM pc) WHERE lr <= 64),
          |dg AS (
          |  SELECT doc_id, lang, substr(text, CAST(i AS INT), 3) AS g
          |  FROM (SELECT doc_id, lang, text,
          |          unnest(range(1, length(text) - 1)) AS i
          |        FROM documents
          |        WHERE doc_id % 2 = 1 AND length(text) >= 3)),
          |dc AS (SELECT doc_id, lang, g, count(*) AS c
          |       FROM dg GROUP BY 1, 2, 3),
          |dp AS (SELECT doc_id, lang, g, dr FROM (
          |    SELECT doc_id, lang, g, row_number() OVER (
          |        PARTITION BY doc_id ORDER BY c DESC, g) AS dr
          |    FROM dc) WHERE dr <= 64),
          |nd AS (SELECT doc_id, lang, count(*) AS ng
          |       FROM dp GROUP BY 1, 2),
          |mt AS (SELECT dp.doc_id, pf.plang,
          |    sum(64 - abs(dp.dr - pf.lr)) AS gain
          |  FROM dp JOIN pf USING (g) GROUP BY 1, 2),
          |ls AS (SELECT DISTINCT plang FROM pf),
          |ds AS (SELECT nd.doc_id, nd.lang, ls.plang,
          |    64 * nd.ng - coalesce(mt.gain, 0) AS dist
          |  FROM nd CROSS JOIN ls
          |  LEFT JOIN mt ON mt.doc_id = nd.doc_id
          |             AND mt.plang = ls.plang),
          |pr AS (SELECT doc_id, lang, plang FROM (
          |    SELECT doc_id, lang, plang, row_number() OVER (
          |        PARTITION BY doc_id ORDER BY dist, plang) AS rn
          |    FROM ds) WHERE rn = 1),
          |cm AS (SELECT lang AS lang_true, plang AS lang_pred,
          |         count(*) AS n_docs
          |       FROM pr GROUP BY 1, 2)
          |SELECT lang_true, lang_pred, n_docs,
          |  round(CAST(n_docs AS DOUBLE) /
          |        sum(n_docs) OVER (PARTITION BY lang_true), 6) AS share
          |FROM cm ORDER BY lang_true, lang_pred""".stripMargin,

      "q49_quality_score" ->
        s"""SELECT doc_id, $qualityScoreSql AS score
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q67_train_split" ->
        s"""SELECT $trainSplitSql AS split,
           |  lang, count(*) AS docs,
           |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
           |FROM documents GROUP BY split, lang ORDER BY split, lang""".stripMargin,

      "q50_token_count" ->
        """SELECT lang, count(*) AS docs,
          |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
          |  CAST(sum(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS re_tokens,
          |  round(CAST(sum(n_chars) AS DOUBLE) / sum(len(string_split(text, ' '))), 6)
          |    AS chars_per_token
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      "q81_corpus_prep" ->
        s"""WITH scored AS (
           |  SELECT doc_id, lang, text, $qualityScoreSql AS score
           |  FROM documents),
           |filtered AS (SELECT * FROM scored WHERE score >= 0.5),
           |dedup AS (
           |  SELECT * FROM (
           |    SELECT *, min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
           |    FROM filtered)
           |  WHERE doc_id = keeper)
           |SELECT $trainSplitSql AS split,
           |  lang, count(*) AS docs,
           |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           |  round(CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
           |    AS avg_score
           |FROM dedup GROUP BY split, lang ORDER BY split, lang""".stripMargin,

      "q84_repetition_ratio" ->
        """WITH g AS (
          |  SELECT doc_id, unnest(
          |    list_transform(range(1, len(t)),
          |                   i -> array_to_string(t[i:i+1], ' '))) AS g
          |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
          |SELECT doc_id, count(*) AS n_grams, count(DISTINCT g) AS n_distinct,
          |  round(1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6)
          |    AS dup_ratio
          |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // every rule restated as the same integer cross-multiplied
      // comparison (the shared gopherPdCte text); gram text = q84's
      // array_to_string slices
      "q360_gopher_rules" ->
        s"""WITH $gopherPdCte,
           |u AS (
           |  SELECT source, 'r1_word_count' AS rule, r1 AS pass FROM gp
           |  UNION ALL SELECT source, 'r2_mean_word_len', r2 FROM gp
           |  UNION ALL SELECT source, 'r3_symbol_ratio', r3 FROM gp
           |  UNION ALL SELECT source, 'r4_alpha_words', r4 FROM gp
           |  UNION ALL SELECT source, 'r5_stopwords', r5 FROM gp
           |  UNION ALL SELECT source, 'r6_top2gram_mass', r6 FROM gp
           |  UNION ALL SELECT source, 'r7_dup5gram_mass', r7 FROM gp)
           |SELECT source, rule,
           |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
           |    AS pass_docs,
           |  CAST(sum(CASE WHEN pass THEN 0 ELSE 1 END) AS BIGINT)
           |    AS fail_docs
           |FROM u GROUP BY 1, 2 ORDER BY source, rule""".stripMargin,

      // the same cumsum, each doc unnested to its chunk range, then
      // the per-chunk interval algebra
      "q368_pack_manifest" ->
        """WITH t AS (
          |  SELECT doc_id,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
          |    md5(CAST(doc_id AS VARCHAR)) AS h
          |  FROM documents),
          |o AS (
          |  SELECT doc_id, tok,
          |    CAST(coalesce(sum(tok) OVER (ORDER BY h, doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS BIGINT) AS pre
          |  FROM t),
          |x AS (
          |  SELECT doc_id, tok, pre,
          |    unnest(range(pre // 2048, (pre + tok - 1) // 2048 + 1))
          |      AS chunk_id
          |  FROM o)
          |SELECT chunk_id, count(*) AS docs,
          |  CAST(sum(least(pre + tok, (chunk_id + 1) * 2048) -
          |           greatest(pre, chunk_id * 2048)) AS BIGINT)
          |    AS tokens,
          |  CAST(max(CASE WHEN pre < chunk_id * 2048 THEN 1 ELSE 0 END)
          |       AS BIGINT) AS lead_in,
          |  CAST(min(CASE WHEN pre <= chunk_id * 2048 THEN doc_id END)
          |       AS BIGINT) AS starts_doc
          |FROM x GROUP BY chunk_id ORDER BY chunk_id""".stripMargin,

      // q368's manifest text + the pinned (version, pack_len)
      // literals — the committed v1 must be indistinguishable from
      // recomputing the 2048-token manifest, even though the log's
      // latest version is the 1024 re-pack
      "q372_pack_manifest_log" ->
        """WITH t AS (
          |  SELECT doc_id,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
          |    md5(CAST(doc_id AS VARCHAR)) AS h
          |  FROM documents),
          |o AS (
          |  SELECT doc_id, tok,
          |    CAST(coalesce(sum(tok) OVER (ORDER BY h, doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS BIGINT) AS pre
          |  FROM t),
          |x AS (
          |  SELECT doc_id, tok, pre,
          |    unnest(range(pre // 2048, (pre + tok - 1) // 2048 + 1))
          |      AS chunk_id
          |  FROM o)
          |SELECT CAST(1 AS BIGINT) AS version,
          |  CAST(2048 AS BIGINT) AS pack_len,
          |  chunk_id, count(*) AS docs,
          |  CAST(sum(least(pre + tok, (chunk_id + 1) * 2048) -
          |           greatest(pre, chunk_id * 2048)) AS BIGINT)
          |    AS tokens,
          |  CAST(max(CASE WHEN pre < chunk_id * 2048 THEN 1 ELSE 0 END)
          |       AS BIGINT) AS lead_in,
          |  CAST(min(CASE WHEN pre <= chunk_id * 2048 THEN doc_id END)
          |       AS BIGINT) AS starts_doc
          |FROM x GROUP BY chunk_id ORDER BY chunk_id""".stripMargin,

      // one grouped count per order, the same slice/join gram text
      "q379_lm_order_census" -> {
        def ord(n: Int): String =
          s"""SELECT $n AS ord, sum(c) AS events,
             |  count(*) AS distinct_grams,
             |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS singletons
             |FROM (SELECT g, count(*) AS c FROM (
             |    SELECT array_to_string(t[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' ') AS g
             |    FROM (SELECT t, unnest(range(1, len(t) - ${n - 2})) AS i
             |          FROM dd WHERE len(t) >= $n))
             |  GROUP BY g)""".stripMargin
        s"""WITH dd AS (
           |  SELECT string_split(text, ' ') AS t FROM documents
           |  WHERE $trainSplitSql = 'train'),
           |u AS (${ord(1)} UNION ALL ${ord(2)} UNION ALL ${ord(3)}
           |      UNION ALL ${ord(4)})
           |SELECT CAST(ord AS BIGINT) AS ord,
           |  CAST(events AS BIGINT) AS events,
           |  CAST(distinct_grams AS BIGINT) AS distinct_grams,
           |  CAST(singletons AS BIGINT) AS singletons,
           |  CAST((1000000 * distinct_grams) // events AS BIGINT)
           |    AS saturation_ppm,
           |  CAST((1000000 * singletons) // distinct_grams AS BIGINT)
           |    AS singleton_ppm
           |FROM u ORDER BY ord""".stripMargin
      },

      // chunk counts are ⌈Σtok/L⌉ per committed pack length — the
      // vacuum (and the branch pin that survives it) must be
      // invisible to both readers
      "q378_packlog_vacuum" ->
        """WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
          |    AS tok FROM documents),
          |s AS (SELECT CAST(sum(tok) AS BIGINT) AS tot FROM t)
          |SELECT CAST(1 AS BIGINT) AS version,
          |  CAST(2048 AS BIGINT) AS pack_len,
          |  'branch_only' AS status,
          |  CAST((tot + 2047) // 2048 AS BIGINT) AS chunks FROM s
          |UNION ALL
          |SELECT CAST(2 AS BIGINT), CAST(1024 AS BIGINT), 'kept',
          |  CAST((tot + 1023) // 1024 AS BIGINT) FROM s
          |ORDER BY version""".stripMargin,

      // the md5-ordered global token cumsum as a plain running window
      // (the bucket machinery must be invisible), then the integer
      // chunk-boundary algebra per doc
      "q365_sequence_packing" ->
        """WITH t AS (
          |  SELECT doc_id, source,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
          |    md5(CAST(doc_id AS VARCHAR)) AS h
          |  FROM documents),
          |o AS (
          |  SELECT source, tok,
          |    coalesce(sum(tok) OVER (ORDER BY h, doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS pre
          |  FROM t)
          |SELECT source, count(*) AS docs,
          |  CAST(sum(tok) AS BIGINT) AS tokens,
          |  CAST(sum(CASE WHEN (pre + tok - 1) // 2048 > pre // 2048
          |                THEN 1 ELSE 0 END) AS BIGINT) AS split_docs,
          |  CAST(max((pre + tok - 1) // 2048 - pre // 2048 + 1)
          |       AS BIGINT) AS max_span
          |FROM o GROUP BY source ORDER BY source""".stripMargin,

      // the three gates restated from their own shared texts
      // (gopherPdCte / pplPdCte / q361's budget arithmetic) over the
      // eval split, then the funnel rollup
      "q364_pipeline_prep_v5" ->
        s"""WITH $gopherPdCte,
           |$pplPdCte,
           |ge AS (SELECT gp.* FROM gp
           |       WHERE ${trainSplitSql.replace("doc_id", "gp.doc_id")}
           |             = 'eval'),
           |s1 AS (SELECT doc_id, source, n_words FROM ge
           |       WHERE CAST(r1 AS INT) + CAST(r2 AS INT) +
           |             CAST(r3 AS INT) + CAST(r4 AS INT) +
           |             CAST(r5 AS INT) + CAST(r6 AS INT) +
           |             CAST(r7 AS INT) >= 6),
           |thr AS (SELECT round(CAST(sum(avg_nll) AS DOUBLE) /
           |                     CAST(count(*) AS DOUBLE), 6) AS thr
           |        FROM pd),
           |s2 AS (SELECT s1.* FROM s1 JOIN pd USING (doc_id), thr
           |       WHERE CAST(pd.avg_nll AS DOUBLE) <= thr.thr),
           |sb AS (SELECT source, count(*) AS docs,
           |         CAST(sum(n_words) AS BIGINT) AS tokens,
           |         CAST(round(sqrt(CAST(sum(n_words) AS DOUBLE)) * 1000)
           |              AS BIGINT) AS w
           |       FROM s2 GROUP BY source),
           |st AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt,
           |              CAST(sum(w) AS BIGINT) AS sw FROM sb),
           |bb AS (SELECT sb.source,
           |         CAST(((tt // 4) * w) // sw AS BIGINT) AS budget
           |       FROM sb, st),
           |oo AS (SELECT source, n_words AS tok,
           |         coalesce(sum(n_words) OVER (PARTITION BY source
           |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |           0) AS pre
           |       FROM s2),
           |kk AS (SELECT oo.source, count(*) AS kept_docs,
           |         CAST(sum(tok) AS BIGINT) AS kept_tokens
           |       FROM oo JOIN bb USING (source)
           |       WHERE oo.pre < bb.budget GROUP BY 1)
           |SELECT ev.source, ev.eval_docs,
           |  CAST(coalesce(c1.n, 0) AS BIGINT) AS pass_gopher,
           |  CAST(coalesce(c2.n, 0) AS BIGINT) AS pass_ppl,
           |  CAST(coalesce(bb.budget, 0) AS BIGINT) AS budget,
           |  CAST(coalesce(kk.kept_docs, 0) AS BIGINT) AS kept_docs,
           |  CAST(coalesce(kk.kept_tokens, 0) AS BIGINT) AS kept_tokens
           |FROM (SELECT source, count(*) AS eval_docs FROM ge
           |      GROUP BY source) ev
           |LEFT JOIN (SELECT source, count(*) AS n FROM s1
           |           GROUP BY source) c1 ON ev.source = c1.source
           |LEFT JOIN (SELECT source, count(*) AS n FROM s2
           |           GROUP BY source) c2 ON ev.source = c2.source
           |LEFT JOIN bb ON ev.source = bb.source
           |LEFT JOIN kk ON ev.source = kk.source
           |ORDER BY ev.source""".stripMargin,

      "q85_mixture_sample" ->
        """WITH t AS (
          |  SELECT source, text,
          |    CAST(substr(source, 4) AS INT) AS idx,
          |    substr(md5(CAST(doc_id AS VARCHAR)), 3, 2) AS u
          |  FROM documents),
          |k AS (
          |  SELECT source, text,
          |    CASE WHEN idx < 5 THEN 1.0
          |         WHEN idx < 12 THEN 0.5 ELSE 0.25 END AS weight,
          |    CASE WHEN idx < 5 THEN TRUE
          |         WHEN idx < 12 THEN u <= '7f' ELSE u <= '3f' END AS keep
          |  FROM t)
          |SELECT source, CAST(max(weight) AS DOUBLE) AS weight,
          |  count(*) AS total_docs,
          |  CAST(sum(CAST(keep AS BIGINT)) AS BIGINT) AS kept_docs,
          |  CAST(sum(CASE WHEN keep THEN len(string_split(text, ' '))
          |                ELSE 0 END) AS BIGINT) AS kept_tokens
          |FROM k GROUP BY source ORDER BY source""".stripMargin,

      // sqrt weight fixed-pointed to milli-units; budgets and the
      // take-until-budget cut are pure integer arithmetic; the oracle
      // runs the plain per-source running window the bucket machinery
      // reproduces bit-identically
      "q361_temperature_mixture" ->
        """WITH t AS (
          |  SELECT doc_id, source,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
          |    md5(CAST(doc_id AS VARCHAR)) AS h
          |  FROM documents),
          |s AS (
          |  SELECT source, count(*) AS docs,
          |    CAST(sum(tok) AS BIGINT) AS tokens,
          |    CAST(round(sqrt(CAST(sum(tok) AS DOUBLE)) * 1000)
          |         AS BIGINT) AS w
          |  FROM t GROUP BY source),
          |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt,
          |               CAST(sum(w) AS BIGINT) AS sw FROM s),
          |b AS (SELECT s.source, s.docs, s.tokens, s.w,
          |        CAST(((tt // 4) * w) // sw AS BIGINT) AS budget
          |      FROM s, tot),
          |o AS (
          |  SELECT source, tok,
          |    coalesce(sum(tok) OVER (PARTITION BY source
          |      ORDER BY h, doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS pre
          |  FROM t),
          |k AS (
          |  SELECT o.source, count(*) AS kept_docs,
          |    sum(o.tok) AS kept_tokens
          |  FROM o JOIN b USING (source)
          |  WHERE o.pre < b.budget GROUP BY o.source)
          |SELECT b.source, b.docs, b.tokens, b.w, b.budget,
          |  CAST(coalesce(k.kept_docs, 0) AS BIGINT) AS kept_docs,
          |  CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
          |FROM b LEFT JOIN k USING (source) ORDER BY source""".stripMargin,

      // q361's weight/cumsum text + the two declared passes: grant
      // capped at 2 epochs, surplus redistributed once ∝ w among the
      // still-uncapped sources, tail = the md5-order prefix cut on
      // granted MOD tokens
      "q373_epoch_mixture" ->
        """WITH t AS (
          |  SELECT doc_id, source,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
          |    md5(CAST(doc_id AS VARCHAR)) AS h
          |  FROM documents),
          |s AS (
          |  SELECT source, count(*) AS docs,
          |    CAST(sum(tok) AS BIGINT) AS tokens,
          |    CAST(round(sqrt(CAST(sum(tok) AS DOUBLE)) * 1000)
          |         AS BIGINT) AS w
          |  FROM t GROUP BY source),
          |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt,
          |               CAST(sum(w) AS BIGINT) AS sw FROM s),
          |d1 AS (
          |  SELECT s.source, s.docs, s.tokens, s.w,
          |    CAST(((2 * tt) * w) // sw AS BIGINT) AS desired,
          |    CAST(2 * tokens AS BIGINT) AS cap,
          |    CAST(least(((2 * tt) * w) // sw, 2 * tokens) AS BIGINT)
          |      AS g1
          |  FROM s, tot),
          |redis AS (
          |  SELECT CAST(sum(desired - g1) AS BIGINT) AS surplus,
          |    CAST(sum(CASE WHEN g1 < cap THEN w ELSE 0 END) AS BIGINT)
          |      AS swu
          |  FROM d1),
          |d2 AS (
          |  SELECT d1.*,
          |    CAST(least(g1 + CASE WHEN g1 < cap AND swu > 0
          |                   THEN (surplus * w) // swu ELSE 0 END,
          |               cap) AS BIGINT) AS granted
          |  FROM d1, redis),
          |o AS (
          |  SELECT source, tok,
          |    coalesce(sum(tok) OVER (PARTITION BY source
          |      ORDER BY h, doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS pre
          |  FROM t),
          |tl AS (
          |  SELECT o.source, count(*) AS tail_docs,
          |    CAST(sum(o.tok) AS BIGINT) AS tail_tokens
          |  FROM o JOIN d2 USING (source)
          |  WHERE o.pre < (d2.granted % d2.tokens) GROUP BY o.source)
          |SELECT d2.source, d2.docs, d2.tokens, d2.w, d2.desired,
          |  d2.granted,
          |  CAST(CASE WHEN d2.granted = d2.cap THEN 1 ELSE 0 END
          |       AS BIGINT) AS capped,
          |  CAST(d2.granted // d2.tokens AS BIGINT) AS full_epochs,
          |  CAST(coalesce(tl.tail_docs, 0) AS BIGINT) AS tail_docs,
          |  CAST(coalesce(tl.tail_tokens, 0) AS BIGINT) AS tail_tokens,
          |  CAST(((d2.granted // d2.tokens) * d2.tokens +
          |        coalesce(tl.tail_tokens, 0)) * 1000000 // d2.tokens
          |       AS BIGINT) AS eff_epochs_ppm
          |FROM d2 LEFT JOIN tl USING (source) ORDER BY source""".stripMargin,

      "q87_decontaminate" ->
        s"""WITH sh AS (
           |  SELECT DISTINCT doc_id, $trainSplitSql AS split,
           |    md5(unnest(list_transform(range(1, len(t) - 1),
           |        i -> array_to_string(t[i:i+2], ' ')))) AS m
           |  FROM (SELECT doc_id, string_split(text, ' ') AS t
           |        FROM documents)),
           |rare AS (SELECT m FROM sh GROUP BY m
           |         HAVING count(DISTINCT doc_id) <= 10),
           |p AS (SELECT sh.* FROM sh JOIN rare USING (m))
           |SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
           |  count(*) AS shared_shingles
           |FROM p e JOIN p t ON e.m = t.m
           | AND e.split = 'eval' AND t.split = 'train'
           |GROUP BY eval_id, train_id HAVING count(*) >= 3
           |ORDER BY eval_id, train_id""".stripMargin,

      // the persisted index must be invisible to semantics: the oracle
      // inlines the full computation — train-side df cap (the
      // ahead-of-time index semantic), eval side restricted to the
      // probed batch (odd doc_ids), same ≥ 3 threshold as q87
      "q99_decontaminate_incr" ->
        s"""WITH sh AS (
           |  SELECT DISTINCT doc_id, $trainSplitSql AS split,
           |    md5(unnest(list_transform(range(1, len(t) - 1),
           |        i -> array_to_string(t[i:i+2], ' ')))) AS m
           |  FROM (SELECT doc_id, string_split(text, ' ') AS t
           |        FROM documents)),
           |tr AS (SELECT doc_id, m FROM sh WHERE split = 'train'),
           |rare AS (SELECT m FROM tr GROUP BY m
           |         HAVING count(DISTINCT doc_id) <= 10),
           |idx AS (SELECT tr.* FROM tr JOIN rare USING (m)),
           |ev AS (SELECT doc_id, m FROM sh
           |       WHERE split = 'eval' AND doc_id % 2 = 1)
           |SELECT ev.doc_id AS eval_id, idx.doc_id AS train_id,
           |  count(*) AS shared_shingles
           |FROM ev JOIN idx ON ev.m = idx.m
           |GROUP BY eval_id, train_id HAVING count(*) >= 3
           |ORDER BY eval_id, train_id""".stripMargin,

      // q99's incremental shape over q96's WINNOWED gram stream (r13)
      // — train-side df cap on MINIMIZER posting lists (the
      // ahead-of-time index semantic), eval side restricted to the
      // probed batch (odd doc_ids), identical minimizer selection on
      // both sides of the index boundary
      "q103_decontaminate_exact_incr" ->
        s"""WITH g0 AS (
           |  SELECT doc_id, $trainSplitSql AS split,
           |    list_transform(range(1, len(t) - 6),
           |        i -> md5(array_to_string(t[i:i+7], ' '))) AS hs
           |  FROM (SELECT doc_id, string_split(text, ' ') AS t
           |        FROM documents)
           |  WHERE len(t) >= 8),
           |sh AS (
           |  SELECT DISTINCT doc_id, split,
           |    unnest(CASE WHEN len(hs) >= 5
           |      THEN list_transform(range(1, len(hs) - 3),
           |                          j -> list_min(hs[j:j+4]))
           |      ELSE [list_min(hs)] END) AS m
           |  FROM g0),
           |tr AS (SELECT doc_id, m FROM sh WHERE split = 'train'),
           |rare AS (SELECT m FROM tr GROUP BY m
           |         HAVING count(DISTINCT doc_id) <= 10),
           |idx AS (SELECT tr.* FROM tr JOIN rare USING (m)),
           |ev AS (SELECT doc_id, m FROM sh
           |       WHERE split = 'eval' AND doc_id % 2 = 1)
           |SELECT ev.doc_id AS eval_id, idx.doc_id AS train_id,
           |  count(*) AS shared_grams
           |FROM ev JOIN idx ON ev.m = idx.m
           |GROUP BY eval_id, train_id
           |ORDER BY eval_id, train_id""".stripMargin,

      "q299_bpe_train" -> bpeTrainOracle,
      "q346_bpe_apply" -> bpeApplyOracle,
      "q347_pipeline_prep_v4" -> pipelineV4Oracle,

      // same train-split count tables, same add-1 chain with the
      // round-log-once 6 dp term, same 8.0 flag line
      // identical hashed-bigram buckets (md5 first 3 hex chars =
      // 0..4095), identical add-1 smoothed integer ratio inside ONE
      // ln per term, rounded 6 dp and summed as exact decimals
      "q306_dsir_weights" ->
        """WITH t0 AS (
          |  SELECT doc_id, source, string_split(text, ' ') AS t
          |  FROM documents),
          |bg0 AS (
          |  SELECT doc_id, source,
          |    unnest(list_transform(range(1, len(t)),
          |        i -> array_to_string(t[i:i+1], ' '))) AS g
          |  FROM t0),
          |bg AS (
          |  SELECT doc_id, source,
          |    CAST(('0x' || substr(md5(g), 1, 3)) AS BIGINT) AS b
          |  FROM bg0),
          |ct AS (SELECT b, count(*) AS ct FROM bg
          |       WHERE CAST(substr(source, 4) AS INT) < 5 GROUP BY 1),
          |cr AS (SELECT b, count(*) AS cr FROM bg
          |       WHERE CAST(substr(source, 4) AS INT) >= 5 GROUP BY 1),
          |tot AS (
          |  SELECT
          |    sum(CASE WHEN CAST(substr(source, 4) AS INT) < 5
          |             THEN 1 ELSE 0 END) AS tt,
          |    sum(CASE WHEN CAST(substr(source, 4) AS INT) >= 5
          |             THEN 1 ELSE 0 END) AS rr
          |  FROM bg),
          |sc AS (
          |  SELECT doc_id, source,
          |    CAST(round(ln(
          |        CAST((coalesce(ct.ct, 0) + 1) * (tot.rr + 4096)
          |             AS DOUBLE) /
          |        CAST((coalesce(cr.cr, 0) + 1) * (tot.tt + 4096)
          |             AS DOUBLE)), 6) AS DECIMAL(28,6)) AS lp
          |  FROM bg LEFT JOIN ct USING (b) LEFT JOIN cr USING (b)
          |       CROSS JOIN tot),
          |pd AS (SELECT doc_id, source, sum(lp) AS w
          |       FROM sc GROUP BY 1, 2),
          |gm AS (SELECT round(CAST(sum(w) AS DOUBLE) / count(*), 6)
          |         AS gmean FROM pd)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN CAST(w AS DOUBLE) > gm.gmean
          |           THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
          |  round(CAST(sum(w) AS DOUBLE) / count(*), 6) AS mean_w
          |FROM pd CROSS JOIN gm GROUP BY source ORDER BY source""".stripMargin,

      "q301_ppl_filter" ->
        s"""WITH $pplPdCte
           |SELECT source, count(*) AS docs,
           |  round(CAST(sum(avg_nll) AS DOUBLE) /
           |        CAST(count(*) AS DOUBLE), 6) AS mean_nll,
           |  CAST(sum(CASE WHEN CAST(avg_nll AS DOUBLE) > 8.0
           |                THEN 1 ELSE 0 END) AS BIGINT) AS flagged,
           |  round(CAST(sum(CASE WHEN CAST(avg_nll AS DOUBLE) > 8.0
           |                      THEN 1 ELSE 0 END) AS DOUBLE) /
           |        CAST(count(*) AS DOUBLE), 6) AS flagged_share
           |FROM pd GROUP BY source ORDER BY source""".stripMargin,

      // the identical q301 scoring chain (shared pplPdCte text), then
      // the closed-form smoothed softmax over ≤|sources| rows — exp
      // floor-quantized at 1e-8 into an exact decimal denominator
      "q315_doremi_mixture" ->
        s"""WITH $pplPdCte,
           |bs AS (SELECT source, count(*) AS docs, sum(avg_nll) AS snll
           |       FROM pd GROUP BY 1),
           |gl AS (SELECT sum(docs) AS nd, sum(snll) AS gs FROM bs),
           |ex AS (
           |  SELECT source, docs,
           |    round(CAST(snll AS DOUBLE) / CAST(docs AS DOUBLE), 6)
           |      AS mean_nll,
           |    round(round(CAST(snll AS DOUBLE) / CAST(docs AS DOUBLE), 6)
           |          - round(CAST(gl.gs AS DOUBLE) /
           |                  CAST(gl.nd AS DOUBLE), 6), 6) AS excess
           |  FROM bs CROSS JOIN gl),
           |wq AS (SELECT *, CAST(floor(exp(excess) * 1e8 + 5e-1)
           |                      AS DECIMAL(28,0)) AS wq FROM ex),
           |tt AS (SELECT sum(wq) AS tw, count(*) AS k FROM wq)
           |SELECT source, docs, mean_nll, excess,
           |  round(8e-1 * (CAST(wq AS DOUBLE) / CAST(tw AS DOUBLE)) +
           |        2e-1 / CAST(k AS DOUBLE), 6) AS alpha
           |FROM wq CROSS JOIN tt ORDER BY source""".stripMargin,

      // identical train-split model tables (bigram counts, context
      // totals/distinct-successor marginal, continuation marginal,
      // distinct-bigram + vocab globals) and the identical fixed-order
      // double chain per pair — every literal cast to DOUBLE so DuckDB
      // does not route the arithmetic through exact DECIMALs (the q264
      // lesson); ln rounded once at 6 dp into an order-free decimal sum
      "q309_kneser_ney" ->
        s"""WITH dd AS (
           |  SELECT doc_id, $trainSplitSql AS split, source,
           |    string_split(text, ' ') AS t
           |  FROM documents),
           |tp AS (
           |  SELECT t[CAST(i AS INT)] AS w1,
           |         t[CAST(i + 1 AS INT)] AS w2
           |  FROM (SELECT t, unnest(range(1, len(t))) AS i
           |        FROM dd WHERE split = 'train' AND len(t) >= 2)),
           |cb AS (SELECT w1, w2, count(*) AS cb FROM tp GROUP BY 1, 2),
           |ctx AS (SELECT w1, sum(cb) AS cw, count(*) AS n1f
           |        FROM cb GROUP BY 1),
           |cont AS (SELECT w2, count(*) AS n1b FROM cb GROUP BY 1),
           |gq AS (SELECT count(*) AS nbb FROM cb),
           |vv AS (SELECT count(DISTINCT w1) AS v
           |       FROM (SELECT unnest(t) AS w1 FROM dd
           |             WHERE split = 'train')),
           |ep AS (
           |  SELECT doc_id, source, t[CAST(i AS INT)] AS w1,
           |         t[CAST(i + 1 AS INT)] AS w2
           |  FROM (SELECT doc_id, source, t,
           |          unnest(range(1, len(t))) AS i
           |        FROM dd WHERE split = 'eval' AND len(t) >= 2)),
           |sc AS (
           |  SELECT ep.doc_id, ep.source,
           |    CAST(round(ln(CASE WHEN ctx.cw IS NULL
           |      THEN (CAST(coalesce(cont.n1b, 0) AS DOUBLE) +
           |            CAST(1.0 AS DOUBLE)) /
           |           (CAST(gq.nbb AS DOUBLE) + CAST(vv.v AS DOUBLE))
           |      ELSE greatest(CAST(coalesce(cb.cb, 0) AS DOUBLE) -
           |                    CAST(0.75 AS DOUBLE),
           |                    CAST(0.0 AS DOUBLE)) /
           |             CAST(ctx.cw AS DOUBLE) +
           |           CAST(0.75 AS DOUBLE) * CAST(ctx.n1f AS DOUBLE) /
           |             CAST(ctx.cw AS DOUBLE) *
           |             ((CAST(coalesce(cont.n1b, 0) AS DOUBLE) +
           |               CAST(1.0 AS DOUBLE)) /
           |              (CAST(gq.nbb AS DOUBLE) +
           |               CAST(vv.v AS DOUBLE)))
           |      END), 6) AS DECIMAL(28,6)) AS lp
           |  FROM ep LEFT JOIN cb ON ep.w1 = cb.w1 AND ep.w2 = cb.w2
           |          LEFT JOIN ctx ON ep.w1 = ctx.w1
           |          LEFT JOIN cont ON ep.w2 = cont.w2
           |          CROSS JOIN gq CROSS JOIN vv),
           |pd AS (
           |  SELECT doc_id, source, count(*) AS n,
           |    CAST(round(-CAST(sum(lp) AS DOUBLE) /
           |               CAST(count(*) AS DOUBLE), 6)
           |         AS DECIMAL(28,6)) AS avg_nll
           |  FROM sc GROUP BY 1, 2)
           |SELECT source, count(*) AS docs,
           |  round(CAST(sum(avg_nll) AS DOUBLE) /
           |        CAST(count(*) AS DOUBLE), 6) AS mean_nll,
           |  CAST(sum(CASE WHEN CAST(avg_nll AS DOUBLE) > 3.5
           |                THEN 1 ELSE 0 END) AS BIGINT) AS flagged,
           |  round(CAST(sum(CASE WHEN CAST(avg_nll AS DOUBLE) > 3.5
           |                      THEN 1 ELSE 0 END) AS DOUBLE) /
           |        CAST(count(*) AS DOUBLE), 6) AS flagged_share
           |FROM pd GROUP BY source ORDER BY source""".stripMargin,

      // q309's bigram-KN text as the back-off level, one trigram
      // layer on top (context = the two-word string, D = 0.75 at
      // both orders), the relative eval-mean gate line
      "q374_kn3_gate" -> {
        val p2Sql =
          """CASE WHEN ctx.cw IS NULL
            |      THEN (CAST(coalesce(cont.n1b, 0) AS DOUBLE) +
            |            CAST(1.0 AS DOUBLE)) /
            |           (CAST(gq.nbb AS DOUBLE) + CAST(vv.v AS DOUBLE))
            |      ELSE greatest(CAST(coalesce(cb.cb, 0) AS DOUBLE) -
            |                    CAST(0.75 AS DOUBLE),
            |                    CAST(0.0 AS DOUBLE)) /
            |             CAST(ctx.cw AS DOUBLE) +
            |           CAST(0.75 AS DOUBLE) * CAST(ctx.n1f AS DOUBLE) /
            |             CAST(ctx.cw AS DOUBLE) *
            |             ((CAST(coalesce(cont.n1b, 0) AS DOUBLE) +
            |               CAST(1.0 AS DOUBLE)) /
            |              (CAST(gq.nbb AS DOUBLE) +
            |               CAST(vv.v AS DOUBLE)))
            |      END""".stripMargin
        s"""WITH dd AS (
           |  SELECT doc_id, $trainSplitSql AS split, source,
           |    string_split(text, ' ') AS t
           |  FROM documents),
           |tp AS (
           |  SELECT t[CAST(i AS INT)] AS w1,
           |         t[CAST(i + 1 AS INT)] AS w2
           |  FROM (SELECT t, unnest(range(1, len(t))) AS i
           |        FROM dd WHERE split = 'train' AND len(t) >= 2)),
           |cb AS (SELECT w1, w2, count(*) AS cb FROM tp GROUP BY 1, 2),
           |ctx AS (SELECT w1, sum(cb) AS cw, count(*) AS n1f
           |        FROM cb GROUP BY 1),
           |cont AS (SELECT w2, count(*) AS n1b FROM cb GROUP BY 1),
           |gq AS (SELECT count(*) AS nbb FROM cb),
           |vv AS (SELECT count(DISTINCT w1) AS v
           |       FROM (SELECT unnest(t) AS w1 FROM dd
           |             WHERE split = 'train')),
           |t3p AS (
           |  SELECT t[CAST(i AS INT)] || ' ' || t[CAST(i + 1 AS INT)]
           |           AS ctx3,
           |         t[CAST(i + 2 AS INT)] AS w3
           |  FROM (SELECT t, unnest(range(1, len(t) - 1)) AS i
           |        FROM dd WHERE split = 'train' AND len(t) >= 3)),
           |ct3 AS (SELECT ctx3, w3, count(*) AS c123
           |        FROM t3p GROUP BY 1, 2),
           |y3 AS (SELECT ctx3, sum(c123) AS c12, count(*) AS n1f3
           |       FROM ct3 GROUP BY 1),
           |ep AS (
           |  SELECT doc_id, source,
           |    t[CAST(i AS INT)] || ' ' || t[CAST(i + 1 AS INT)]
           |      AS ctx3,
           |    t[CAST(i + 1 AS INT)] AS w1,
           |    t[CAST(i + 2 AS INT)] AS w2
           |  FROM (SELECT doc_id, source, t,
           |          unnest(range(1, len(t) - 1)) AS i
           |        FROM dd WHERE split = 'eval' AND len(t) >= 3)),
           |sc AS (
           |  SELECT ep.doc_id, ep.source,
           |    CAST(round(ln(CASE WHEN y3.c12 IS NULL
           |      THEN ($p2Sql)
           |      ELSE greatest(CAST(coalesce(ct3.c123, 0) AS DOUBLE) -
           |                    CAST(0.75 AS DOUBLE),
           |                    CAST(0.0 AS DOUBLE)) /
           |             CAST(y3.c12 AS DOUBLE) +
           |           CAST(0.75 AS DOUBLE) * CAST(y3.n1f3 AS DOUBLE) /
           |             CAST(y3.c12 AS DOUBLE) *
           |             ($p2Sql)
           |      END), 6) AS DECIMAL(28,6)) AS lp
           |  FROM ep LEFT JOIN ct3 ON ep.ctx3 = ct3.ctx3
           |                        AND ep.w2 = ct3.w3
           |          LEFT JOIN y3 ON ep.ctx3 = y3.ctx3
           |          LEFT JOIN cb ON ep.w1 = cb.w1 AND ep.w2 = cb.w2
           |          LEFT JOIN ctx ON ep.w1 = ctx.w1
           |          LEFT JOIN cont ON ep.w2 = cont.w2
           |          CROSS JOIN gq CROSS JOIN vv),
           |pd AS (
           |  SELECT doc_id, source, count(*) AS n,
           |    CAST(round(-CAST(sum(lp) AS DOUBLE) /
           |               CAST(count(*) AS DOUBLE), 6)
           |         AS DECIMAL(28,6)) AS avg_nll
           |  FROM sc GROUP BY 1, 2),
           |thr AS (SELECT round(CAST(sum(avg_nll) AS DOUBLE) /
           |                     count(*), 6) AS thr FROM pd)
           |SELECT source, count(*) AS docs,
           |  round(CAST(sum(avg_nll) AS DOUBLE) /
           |        CAST(count(*) AS DOUBLE), 6) AS mean_nll,
           |  CAST(sum(CASE WHEN CAST(avg_nll AS DOUBLE) > thr
           |                THEN 1 ELSE 0 END) AS BIGINT) AS flagged,
           |  round(CAST(sum(CASE WHEN CAST(avg_nll AS DOUBLE) > thr
           |                      THEN 1 ELSE 0 END) AS DOUBLE) /
           |        CAST(count(*) AS DOUBLE), 6) AS flagged_share
           |FROM pd, thr GROUP BY source, thr ORDER BY source""".stripMargin
      },

      "q212_token_budget" ->
        s"""WITH a AS (
           |  SELECT lang, source, count(*) AS docs,
           |    CAST(sum($bpeTokenCountSql) AS BIGINT) AS bpe_tokens
           |  FROM documents GROUP BY 1, 2),
           |w AS (SELECT *, sum(bpe_tokens) OVER () AS total,
           |    sum(bpe_tokens) OVER (ORDER BY bpe_tokens DESC, lang,
           |                          source ROWS UNBOUNDED PRECEDING)
           |      AS cum
           |  FROM a)
           |SELECT lang, source, docs, bpe_tokens,
           |  round(CAST(bpe_tokens AS DOUBLE) / total, 6) AS token_share,
           |  round(CAST(cum AS DOUBLE) / total, 6) AS cum_share
           |FROM w ORDER BY bpe_tokens DESC, lang, source""".stripMargin,

      "q101_bpe_tokens" ->
        s"""SELECT lang, count(*) AS docs,
           |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           |  CAST(sum($bpeTokenCountSql) AS BIGINT) AS bpe_tokens,
           |  round(CAST(sum($bpeTokenCountSql) AS DOUBLE) /
           |        sum(len(string_split(text, ' '))), 6) AS bpe_per_word
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      // the 89-merge replay chained through a CTE PIPELINE: ~30 merges
      // per stage keeps every expression under DuckDB's binder depth
      // while the stage count grows with the vocab — the SQL twin of
      // carrying the merge table as data
      "q121_bpe_dict" -> {
        val stages = BpeMergesFull.grouped(30).toSeq
        val ctes = stages.zipWithIndex.map { case (ms, i) =>
          val expr = ms.foldLeft("m") { case (e, (a, b)) =>
            s"replace(replace($e, '|$a|$b|', '|$a$b|'), '|$a|$b|', '|$a$b|')"
          }
          s"t${i + 1} AS (SELECT lang, text, $expr AS m FROM t$i)"
        }
        s"""WITH t0 AS (SELECT lang, text,
           |  regexp_replace(text, '(.)', '|\\1', 'g') || '|' AS m
           |  FROM documents),
           |${ctes.mkString(",\n")}
           |SELECT lang, count(*) AS docs,
           |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           |  CAST(sum(len(m) - len(replace(m, '|', ''))
           |           - len(string_split(text, ' '))) AS BIGINT) AS bpe_tokens,
           |  round(CAST(sum(len(m) - len(replace(m, '|', ''))
           |                 - len(string_split(text, ' '))) AS DOUBLE) /
           |        sum(len(string_split(text, ' '))), 6) AS bpe_per_word
           |FROM t${stages.size} GROUP BY lang ORDER BY lang""".stripMargin
      },

      // the two persisted artifacts must be invisible to semantics:
      // the oracle inlines the ENTIRE pipeline — reachability clusters
      // (q82's recursive CTE), q49's score, q83's keep-best window,
      // the train-side df-capped contamination index probed by the
      // full eval split (q99's semantic), the q85 mixture rule, and
      // the BPE-token rollup
      "q104_pipeline_prep" ->
        s"""${DedupExtOps.clustersCte},
           |scored AS (
           |  SELECT doc_id, source, text, $qualityScoreSql AS score
           |  FROM documents),
           |jn AS (
           |  SELECT s.*, coalesce(c.cluster_id, s.doc_id) AS cluster_id
           |  FROM scored s LEFT JOIN clusters c USING (doc_id)),
           |kept AS (
           |  SELECT * FROM (
           |    SELECT *, row_number() OVER (PARTITION BY cluster_id
           |             ORDER BY score DESC, doc_id) AS rn
           |    FROM jn)
           |  WHERE rn = 1 AND score >= 0.5),
           |sh AS (
           |  SELECT DISTINCT doc_id, $trainSplitSql AS split,
           |    md5(unnest(list_transform(range(1, len(t) - 1),
           |        i -> array_to_string(t[i:i+2], ' ')))) AS m
           |  FROM (SELECT doc_id, string_split(text, ' ') AS t
           |        FROM documents)),
           |tr AS (SELECT doc_id, m FROM sh WHERE split = 'train'),
           |rare AS (SELECT m FROM tr GROUP BY m
           |         HAVING count(DISTINCT doc_id) <= 10),
           |idx AS (SELECT tr.* FROM tr JOIN rare USING (m)),
           |ev AS (SELECT doc_id, m FROM sh WHERE split = 'eval'),
           |contam AS (
           |  SELECT DISTINCT train_id AS doc_id FROM (
           |    SELECT ev.doc_id AS eval_id, idx.doc_id AS train_id,
           |           count(*) AS n
           |    FROM ev JOIN idx ON ev.m = idx.m
           |    GROUP BY 1, 2)
           |  WHERE n >= 3)
           |SELECT $trainSplitSql AS split, source, count(*) AS docs,
           |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           |  CAST(sum($bpeTokenCountSql) AS BIGINT) AS bpe_tokens,
           |  round(CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) /
           |        count(*), 6) AS avg_score
           |FROM kept
           |WHERE doc_id NOT IN (SELECT doc_id FROM contam)
           |  AND $mixtureKeepSql
           |GROUP BY split, source ORDER BY split, source""".stripMargin,

      // q104's skeleton + the winnowed minimizer tier + the held-out
      // ppl flag — every fragment identical to its standalone oracle
      "q302_pipeline_prep_v3" ->
        s"""${DedupExtOps.clustersCte},
           |scored AS (
           |  SELECT doc_id, source, text, $qualityScoreSql AS score
           |  FROM documents),
           |jn AS (
           |  SELECT s.*, coalesce(c.cluster_id, s.doc_id) AS cluster_id
           |  FROM scored s LEFT JOIN clusters c USING (doc_id)),
           |kept AS (
           |  SELECT * FROM (
           |    SELECT *, row_number() OVER (PARTITION BY cluster_id
           |             ORDER BY score DESC, doc_id) AS rn
           |    FROM jn)
           |  WHERE rn = 1 AND score >= 0.5),
           |sh AS (
           |  SELECT DISTINCT doc_id, $trainSplitSql AS split,
           |    md5(unnest(list_transform(range(1, len(t) - 1),
           |        i -> array_to_string(t[i:i+2], ' ')))) AS m
           |  FROM (SELECT doc_id, string_split(text, ' ') AS t
           |        FROM documents)),
           |tr AS (SELECT doc_id, m FROM sh WHERE split = 'train'),
           |rare AS (SELECT m FROM tr GROUP BY m
           |         HAVING count(DISTINCT doc_id) <= 10),
           |idx AS (SELECT tr.* FROM tr JOIN rare USING (m)),
           |ev AS (SELECT doc_id, m FROM sh WHERE split = 'eval'),
           |contam3 AS (
           |  SELECT DISTINCT train_id AS doc_id FROM (
           |    SELECT ev.doc_id AS eval_id, idx.doc_id AS train_id,
           |           count(*) AS n
           |    FROM ev JOIN idx ON ev.m = idx.m
           |    GROUP BY 1, 2)
           |  WHERE n >= 3),
           |g08 AS (
           |  SELECT doc_id, $trainSplitSql AS split,
           |    list_transform(range(1, len(t) - 6),
           |        i -> md5(array_to_string(t[i:i+7], ' '))) AS hs
           |  FROM (SELECT doc_id, string_split(text, ' ') AS t
           |        FROM documents)
           |  WHERE len(t) >= 8),
           |sh8 AS (
           |  SELECT DISTINCT doc_id, split,
           |    unnest(CASE WHEN len(hs) >= 5
           |      THEN list_transform(range(1, len(hs) - 3),
           |                          j -> list_min(hs[j:j+4]))
           |      ELSE [list_min(hs)] END) AS m
           |  FROM g08),
           |tr8 AS (SELECT doc_id, m FROM sh8 WHERE split = 'train'),
           |rare8 AS (SELECT m FROM tr8 GROUP BY m
           |          HAVING count(DISTINCT doc_id) <= 10),
           |idx8 AS (SELECT tr8.* FROM tr8 JOIN rare8 USING (m)),
           |ev8 AS (SELECT doc_id, m FROM sh8 WHERE split = 'eval'),
           |contam8 AS (
           |  SELECT DISTINCT idx8.doc_id FROM ev8
           |  JOIN idx8 ON ev8.m = idx8.m),
           |pdd AS (
           |  SELECT doc_id, $trainSplitSql AS split, source,
           |    string_split(text, ' ') AS t
           |  FROM documents),
           |ptp AS (
           |  SELECT t[CAST(i AS INT)] AS w1,
           |         t[CAST(i + 1 AS INT)] AS w2
           |  FROM (SELECT t, unnest(range(1, len(t))) AS i
           |        FROM pdd WHERE split = 'train' AND len(t) >= 2)),
           |pcb AS (SELECT w1, w2, count(*) AS cb FROM ptp GROUP BY 1, 2),
           |pcu AS (SELECT w1, count(*) AS cu
           |        FROM (SELECT unnest(t) AS w1 FROM pdd
           |              WHERE split = 'train')
           |        GROUP BY 1),
           |pvv AS (SELECT count(*) AS v FROM pcu),
           |pep AS (
           |  SELECT doc_id, t[CAST(i AS INT)] AS w1,
           |         t[CAST(i + 1 AS INT)] AS w2
           |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
           |        FROM pdd WHERE split = 'eval' AND len(t) >= 2)),
           |psc AS (
           |  SELECT pep.doc_id,
           |    CAST(round(ln((CAST(coalesce(pcb.cb, 0) AS DOUBLE) + 1.0) /
           |                  (CAST(coalesce(pcu.cu, 0) AS DOUBLE) +
           |                   CAST((SELECT v FROM pvv) AS DOUBLE))), 6)
           |         AS DECIMAL(28,6)) AS lp
           |  FROM pep LEFT JOIN pcb ON pep.w1 = pcb.w1 AND pep.w2 = pcb.w2
           |           LEFT JOIN pcu ON pep.w1 = pcu.w1),
           |flg AS (
           |  SELECT doc_id FROM (
           |    SELECT doc_id,
           |      CAST(round(-CAST(sum(lp) AS DOUBLE) /
           |                 CAST(count(*) AS DOUBLE), 6)
           |           AS DECIMAL(28,6)) AS avg_nll
           |    FROM psc GROUP BY doc_id)
           |  WHERE CAST(avg_nll AS DOUBLE) > 8.0)
           |SELECT $trainSplitSql AS split, source, count(*) AS docs,
           |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           |  CAST(sum($bpeTokenCountSql) AS BIGINT) AS bpe_tokens,
           |  round(CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) /
           |        count(*), 6) AS avg_score
           |FROM kept
           |WHERE doc_id NOT IN (SELECT doc_id FROM contam3)
           |  AND doc_id NOT IN (SELECT doc_id FROM contam8)
           |  AND doc_id NOT IN (SELECT doc_id FROM flg)
           |  AND $mixtureKeepSql
           |GROUP BY split, source ORDER BY split, source""".stripMargin,

      // q87's shape over the WINNOWED 8-gram stream (r13): hs is the
      // per-doc gram-hash list (t[i:i+7] is DuckDB's inclusive
      // 8-element slice), a minimizer is the min of each 5-gram
      // window (hs[j:j+4] inclusive = 5 elements), short docs (< 5
      // grams) keep their global min — the identical selection the
      // Spark side's minimizerHashes makes, gram strings and md5s
      // byte-equal in both engines
      "q96_decontaminate_exact" ->
        s"""WITH g0 AS (
           |  SELECT doc_id, $trainSplitSql AS split,
           |    list_transform(range(1, len(t) - 6),
           |        i -> md5(array_to_string(t[i:i+7], ' '))) AS hs
           |  FROM (SELECT doc_id, string_split(text, ' ') AS t
           |        FROM documents)
           |  WHERE len(t) >= 8),
           |sh AS (
           |  SELECT DISTINCT doc_id, split,
           |    unnest(CASE WHEN len(hs) >= 5
           |      THEN list_transform(range(1, len(hs) - 3),
           |                          j -> list_min(hs[j:j+4]))
           |      ELSE [list_min(hs)] END) AS m
           |  FROM g0),
           |rare AS (SELECT m FROM sh GROUP BY m
           |         HAVING count(DISTINCT doc_id) <= 10),
           |p AS (SELECT sh.* FROM sh JOIN rare USING (m))
           |SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
           |  count(*) AS shared_grams
           |FROM p e JOIN p t ON e.m = t.m
           | AND e.split = 'eval' AND t.split = 'train'
           |GROUP BY eval_id, train_id
           |ORDER BY eval_id, train_id""".stripMargin,

      "q51_fingerprint" ->
        """WITH sh AS (
          |  SELECT doc_id, unnest(
          |    list_transform(range(1, len(toks) - 1),
          |                   i -> array_to_string(toks[i:i+2], ' '))) AS sh
          |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents))
          |SELECT doc_id, min(md5(sh)) AS fp, count(*) AS n_shingles,
          |  count(DISTINCT sh) AS n_distinct
          |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // identical depth-2 deletion-neighborhood blocking + exact
      // verify; DuckDB substr/levenshtein mirror Spark's 1-based
      // semantics
      "q134_typo_pairs" -> {
        val d1 = "list_transform(range(1, len(tok) + 1), " +
          "i -> substr(tok, 1, i - 1) || substr(tok, i + 1, len(tok)))"
        val d2 = s"flatten(list_transform($d1, t1 -> " +
          "list_transform(range(1, len(t1) + 1), " +
          "j -> substr(t1, 1, j - 1) || substr(t1, j + 1, len(t1)))))"
        s"""WITH vocab AS (
           |  SELECT tok, count(*) AS freq FROM (
           |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
           |  WHERE len(tok) >= 3 GROUP BY tok),
           |vr AS (
           |  SELECT tok, freq, unnest(list_distinct(
           |    list_append(list_concat($d1, $d2), tok))) AS v
           |  FROM vocab),
           |cand AS (
           |  SELECT DISTINCT a.tok AS a, b.tok AS b,
           |    a.freq AS freq_a, b.freq AS freq_b
           |  FROM vr a JOIN vr b ON a.v = b.v AND a.tok < b.tok)
           |SELECT a, b, freq_a, freq_b, levenshtein(a, b) AS lev FROM cand
           |WHERE levenshtein(a, b) <= 2
           |ORDER BY a, b""".stripMargin
      },

      // the generator's semantics replayed with the list_transform
      // formulation (q51's CTE without the hashing)
      "q133_ngram_freq" ->
        """WITH g AS (
          |  SELECT unnest(
          |    list_transform(range(1, len(toks) - 1),
          |                   i -> array_to_string(toks[i:i+2], ' '))) AS gram
          |  FROM (SELECT string_split(text, ' ') AS toks FROM documents))
          |SELECT gram, count(*) AS cnt FROM g
          |GROUP BY gram ORDER BY cnt DESC, gram LIMIT 30""".stripMargin,

      "q259_readability" ->
        """WITH sc AS (
          |  SELECT lang,
          |    CAST(len(list_filter(string_split(text, ' '),
          |                         x -> len(x) > 0)) AS BIGINT) AS words,
          |    CAST(len(regexp_replace(lower(text), '[aeiouy]+', '#',
          |                            'g')) -
          |         len(regexp_replace(lower(text), '[aeiouy]+', '',
          |                            'g')) AS BIGINT) AS syll,
          |    greatest(1, CAST(len(text) -
          |                     len(translate(text, '.!?', ''))
          |                     AS BIGINT)) AS sents
          |  FROM documents),
          |f AS (SELECT lang,
          |    round(206.835 -
          |          1.015 * CAST(words AS DOUBLE) /
          |                  CAST(sents AS DOUBLE) -
          |          84.6 * CAST(syll AS DOUBLE) /
          |                 CAST(words AS DOUBLE), 6) AS flesch
          |  FROM sc)
          |SELECT lang, count(*) AS docs,
          |  round(CAST(sum(CAST(flesch AS DECIMAL(28,6))) AS DOUBLE) /
          |        CAST(count(*) AS DOUBLE), 6) AS avg_flesch,
          |  round(CAST(sum(CASE WHEN flesch < 30 THEN 1 ELSE 0 END)
          |             AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
          |    AS pct_hard
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      "q260_zipf_fit" ->
        """WITH tc AS (
          |  SELECT t, count(*) AS c FROM (
          |    SELECT unnest(string_split(text, ' ')) AS t
          |    FROM documents) WHERE len(t) > 0 GROUP BY 1),
          |r AS (SELECT c,
          |    row_number() OVER (ORDER BY c DESC, t) AS rk
          |  FROM tc),
          |v AS (SELECT c,
          |    CAST(round(ln(CAST(rk AS DOUBLE)), 6)
          |         AS DECIMAL(18,6)) AS x,
          |    CAST(round(ln(CAST(c AS DOUBLE)), 6)
          |         AS DECIMAL(18,6)) AS y
          |  FROM r),
          |m AS (SELECT count(*) AS vocab, sum(c) AS n_tokens,
          |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
          |    sum(y * y) AS syy, sum(x * y) AS sxy
          |  FROM v),
          |f AS (SELECT *,
          |    CAST(vocab AS DOUBLE) * CAST(sxy AS DOUBLE) -
          |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy,
          |    CAST(vocab AS DOUBLE) * CAST(sxx AS DOUBLE) -
          |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
          |    CAST(vocab AS DOUBLE) * CAST(syy AS DOUBLE) -
          |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
          |  FROM m)
          |SELECT CAST(vocab AS BIGINT) AS vocab,
          |  CAST(n_tokens AS BIGINT) AS n_tokens,
          |  round(cxy / vx, 6) AS zipf_slope,
          |  round(cxy * cxy / (vx * vy), 6) AS r2
          |FROM f""".stripMargin,

      "q261_template_shingles" ->
        """WITH g AS (
          |  SELECT DISTINCT source, doc_id,
          |    md5(unnest(list_transform(range(1, len(t) - 3),
          |        i -> array_to_string(t[i:i+4], ' ')))) AS m
          |  FROM (SELECT source, doc_id, string_split(text, ' ') AS t
          |        FROM documents)),
          |nd AS (SELECT source, count(DISTINCT doc_id) AS ndocs
          |  FROM documents GROUP BY 1),
          |tpl AS (SELECT g.source, g.m
          |  FROM g JOIN nd ON g.source = nd.source
          |  GROUP BY g.source, g.m, nd.ndocs
          |  HAVING count(*) * 2 > nd.ndocs),
          |pd AS (SELECT g.source, g.doc_id, count(*) AS grams,
          |    sum(CASE WHEN tpl.m IS NOT NULL THEN 1 ELSE 0 END)
          |      AS tgrams
          |  FROM g LEFT JOIN tpl ON g.source = tpl.source
          |                       AND g.m = tpl.m
          |  GROUP BY 1, 2),
          |sh AS (SELECT source, grams, tgrams,
          |    CAST(round(CAST(tgrams AS DOUBLE) /
          |               CAST(grams AS DOUBLE), 6)
          |         AS DECIMAL(28,6)) AS share
          |  FROM pd)
          |SELECT source, count(*) AS docs,
          |  CAST(sum(tgrams) AS BIGINT) AS template_hits,
          |  round(CAST(sum(share) AS DOUBLE) /
          |        CAST(count(*) AS DOUBLE), 6) AS avg_template_share
          |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin,

      "q282_filter_funnel" ->
        s"""WITH f AS (
           |  SELECT
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wtoks,
           |    n_chars >= 50 AND n_chars <= 5000 AS f1,
           |    ($qualityScoreSql) >= 0.5 AS f2,
           |    round(CAST(len(list_distinct(string_split(text, ' ')))
           |               AS DOUBLE) /
           |          CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
           |      >= 0.3 AS f3,
           |    round(CAST(len(regexp_replace(text, '[^a-z]', '', 'g'))
           |               AS DOUBLE) /
           |          CAST(len(text) AS DOUBLE), 6) >= 0.55 AS f4
           |  FROM documents),
           |c AS (
           |  SELECT wtoks, f1, f2, f3, f4, f1 AS c1,
           |    f1 AND f2 AS c2, f1 AND f2 AND f3 AS c3,
           |    f1 AND f2 AND f3 AND f4 AS c4
           |  FROM f),
           |a AS (
           |  SELECT count(*) AS total,
           |    CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
           |    CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS a2,
           |    CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS a3,
           |    CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS a4,
           |    CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
           |    CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS k2,
           |    CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS k3,
           |    CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS k4,
           |    CAST(sum(CASE WHEN c1 THEN wtoks ELSE 0 END) AS BIGINT)
           |      AS t1,
           |    CAST(sum(CASE WHEN c2 THEN wtoks ELSE 0 END) AS BIGINT)
           |      AS t2,
           |    CAST(sum(CASE WHEN c3 THEN wtoks ELSE 0 END) AS BIGINT)
           |      AS t3,
           |    CAST(sum(CASE WHEN c4 THEN wtoks ELSE 0 END) AS BIGINT)
           |      AS t4
           |  FROM c),
           |u AS (
           |  SELECT 1 AS stage, 'length_50_5000' AS filter_name, a1 AS
           |    pass_alone, k1 AS pass_cum, total - k1 AS dropped_here,
           |    t1 AS tokens_cum, total FROM a
           |  UNION ALL SELECT 2, 'quality_ge_05', a2, k2, k1 - k2, t2,
           |    total FROM a
           |  UNION ALL SELECT 3, 'diversity_ge_03', a3, k3, k2 - k3, t3,
           |    total FROM a
           |  UNION ALL SELECT 4, 'alpha_ge_055', a4, k4, k3 - k4, t4,
           |    total FROM a)
           |SELECT stage, filter_name, pass_alone, pass_cum, dropped_here,
           |  tokens_cum,
           |  round(CAST(pass_cum AS DOUBLE) / CAST(total AS DOUBLE), 6)
           |    AS yield_cum
           |FROM u ORDER BY stage""".stripMargin
    )
  }
}
