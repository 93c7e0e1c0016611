package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core LLM-data-pipeline operators (SURVEY.md §2B q41–q45): exact and
  * near deduplication, all-pairs cosine top-k, per-corpus text stats,
  * document⋈embedding join.
  *
  * Scale design:
  *  - q41 exact dedup hashes text once (sha2) and groups on the digest —
  *    one shuffle on a 64-char key, never on the full text.
  *  - q42 near-dup uses blocking (40-char prefix) to restrict Jaccard to
  *    candidate pairs: cost O(Σ blockᵢ²), not O(n²). The 100 TB path is
  *    MinHash-LSH banding — implemented as q46 in [[DedupExtOps]].
  *  - q43 brute-force cosine packs the collection into one aggregated
  *    row (executor-side collect_list + Spark broadcast — never a
  *    driver collect) and block-scans it with the
  *    [[org.apache.spark.sql.graft.CosineTopK]] generator: primitive
  *    arrays, per-probe bounded heap, k narrow rows per probe into a
  *    global TakeOrderedAndProject. The 100 TB path is LSH bucketing
  *    (q52 in [[SimilarityExtOps]]).
  */
object LlmOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_dedup_exact" -> { (s, d) =>
      Tables(s, d, "documents")
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(count(lit(1)).as("copies"))
        .agg(count(lit(1)).as("distinct_docs"),
             sum(when(col("copies") > 1, 1L).otherwise(0L)).as("dup_groups"),
             sum(col("copies") - 1).as("dropped"))
    },

    "q42_dedup_near" -> { (s, d) =>
      val docs = Tables(s, d, "documents").select(
        col("doc_id"),
        substring(col("text"), 1, 40).as("pfx"),
        array_distinct(split(col("text"), " ")).as("toks"))
      val a = docs.select(col("doc_id").as("id_a"), col("pfx"),
                          col("toks").as("toks_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("pfx"),
                          col("toks").as("toks_b"))
      a.join(b, "pfx")
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
                round(size(array_intersect(col("toks_a"), col("toks_b")))
                        .cast("double") /
                      size(array_union(col("toks_a"), col("toks_b"))), 3)
                  .as("jac"))
        .where(col("jac") >= 0.9)
        .orderBy("id_a", "id_b")
    },

    "q43_sim_topk" -> { (s, d) =>
      val k = 20
      val em = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      // Brute-force exact top-k without a driver collect: the collection
      // is packed into ONE row by an executor-side collect_list, shipped
      // by a Spark broadcast, and block-scanned by the CosineTopK
      // generator (primitive-array loop, per-probe bounded heap, decode
      // cached per partition). Only k narrow rows per probe reach the
      // global TakeOrderedAndProject — a BroadcastNestedLoopJoin doing
      // the same work materializes a two-vector row per candidate pair
      // and runs ~4× slower. The 100 TB path (big×big) is LSH
      // bucketing — q52/q56/q71.
      val packed = em.agg(collect_list(struct(col("vec_id"), col("v"))).as("coll"))
      em.select(col("vec_id").as("a"), col("v").as("va"))
        .crossJoin(broadcast(packed))
        .select(col("a"),
                org.apache.spark.sql.graft.GraftFunctions
                  .cosineTopK(col("va"), col("a"), col("coll"), k)
                  .as(Seq("b", "sim")))
        .orderBy(col("sim").desc, col("a"), col("b"))
        .limit(k)
    },

    "q44_text_stats" -> { (s, d) =>
      Tables(s, d, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("docs"),
             round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
               .as("avg_chars"),
             round(sum(size(split(col("text"), " ")).cast("long"))
                     .cast("double") / count(lit(1)), 6).as("avg_tokens"),
             max(array_max(transform(split(col("text"), " "),
                                     t => length(t)))).cast("long")
               .as("max_token_len"))
        .orderBy("lang", "source")
    },

    "q45_multimodal_join" -> { (s, d) =>
      Tables(s, d, "documents")
        .join(Tables(s, d, "embeddings"),
              col("doc_id") === col("vec_id"))
        .groupBy("label", "lang")
        .agg(count(lit(1)).as("cnt"),
             round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
               .as("avg_chars"))
        .orderBy("label", "lang")
    }
  )

  def oracles: Map[String, String] = Map(
    "q41_dedup_exact" ->
      """SELECT count(*) AS distinct_docs,
        |  CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
        |  CAST(sum(copies - 1) AS BIGINT) AS dropped
        |FROM (SELECT sha256(text) AS h, count(*) AS copies
        |      FROM documents GROUP BY h)""".stripMargin,

    "q42_dedup_near" ->
      """SELECT * FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |          len(list_distinct(list_concat(a.toks, b.toks))), 3) AS jac
        |  FROM (SELECT doc_id, substr(text,1,40) AS pfx,
        |               list_distinct(string_split(text,' ')) AS toks
        |        FROM documents) a
        |  JOIN (SELECT doc_id, substr(text,1,40) AS pfx,
        |               list_distinct(string_split(text,' ')) AS toks
        |        FROM documents) b
        |    ON a.pfx = b.pfx AND a.doc_id < b.doc_id)
        |WHERE jac >= 0.9 ORDER BY id_a, id_b""".stripMargin,

    "q43_sim_topk" ->
      """SELECT a.vec_id AS a, b.vec_id AS b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 4) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY sim DESC, a, b LIMIT 20""".stripMargin,

    "q44_text_stats" ->
      """SELECT lang, source, count(*) AS docs,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
        |  round(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*), 6) AS avg_tokens,
        |  CAST(max(list_max(list_transform(string_split(text, ' '),
        |                                   t -> len(t)))) AS BIGINT) AS max_token_len
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q45_multimodal_join" ->
      """SELECT label, lang, count(*) AS cnt,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY label, lang ORDER BY label, lang""".stripMargin
  )
}
