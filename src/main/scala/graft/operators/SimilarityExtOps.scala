package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor building blocks (SURVEY.md §2B
  * q52–q53) complementing q43's brute-force top-k.
  *
  * q52 is the 100 TB path: random-hyperplane LSH reduces each vector to
  * a b-bit sign signature; similar vectors collide, so candidate
  * generation becomes a bucket join of cost O(Σ bucket²) instead of an
  * all-pairs scan. The hyperplanes are generated from an integer LCG
  * formula evaluated identically in Spark and DuckDB, which keeps the
  * whole pipeline oracle-checkable with zero stored state.
  *
  * q53 is single-query search: broadcast one query vector against the
  * collection (a Catalyst BroadcastNestedLoopJoin), cosine via
  * codegen-free higher-order functions — fine for one query; batched
  * query workloads should use the q43 block-scan shape.
  */
object SimilarityExtOps extends OpModule {

  private val Planes = 8

  /** Pseudo-random hyperplane component: integer LCG scaled to
    * [-0.5, 0.5) — exact same doubles in any engine. */
  private def planeVal(p: Int): Column => Column = d =>
    ((d + lit(p * 64)) * lit(2654435761L) % 1000).cast("double") / 1000 - 0.5

  /** 8-bit sign signature of the embedding column vs the LCG planes. */
  private def sigColumn: Column = {
    val v = col("embedding").cast("array<double>")
    concat((0 until Planes).map { p =>
      val dot = aggregate(
        zip_with(v, transform(sequence(lit(0), lit(63)), planeVal(p)), _ * _),
        lit(0.0), _ + _)
      when(dot > 0, "1").otherwise("0")
    }: _*)
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
      val q = em.where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qv"))
      val v = col("embedding").cast("array<double>")
      // native codegen'd expression (same arithmetic as the HOF and
      // block-scan formulations — see VectorExpressions)
      em.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
                round(org.apache.spark.sql.graft.GraftFunctions
                        .cosineSimilarity(v, col("qv")), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },

    // Embedding-based near-dup detection, composed from the scale-path
    // pieces: LSH bucket candidates (q52's signature) -> exact cosine
    // verification (q43's native kernel) -> threshold. Cost is
    // O(Σ bucket²), never all-pairs.
    "q56_dedup_embedding" -> { (s, d) =>
      val base = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
                sigColumn.as("sig"))
      val x = base.select(col("sig"), col("vec_id").as("a"), col("v").as("va"))
      val y = base.select(col("sig"), col("vec_id").as("b"), col("v").as("vb"))
      x.join(y, Seq("sig"))
        .where(col("a") < col("b"))
        .select(col("a"), col("b"),
                round(org.apache.spark.sql.graft.GraftFunctions
                        .cosineSimilarity(col("va"), col("vb")), 4).as("sim"))
        .where(col("sim") >= 0.4)
        .orderBy("a", "b")
    }
  )

  def oracles: Map[String, String] = {
    val sigSql = (0 until Planes).map { p =>
      val dot = s"""list_sum(list_transform(range(1, 65),
                   | i -> CAST(embedding[i] AS DOUBLE) *
                   |      (CAST(((i - 1 + ${p * 64}) * 2654435761) % 1000 AS DOUBLE) / 1000 - 0.5)))"""
        .stripMargin.replaceAll("\n", " ")
      s"CASE WHEN $dot > 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")
    Map(
      "q52_lsh_buckets" ->
        s"""SELECT sig, count(*) AS cnt, min(vec_id) AS min_vec
           |FROM (SELECT vec_id, $sigSql AS sig FROM embeddings)
           |GROUP BY sig ORDER BY sig""".stripMargin,

      "q53_ann_query" ->
        """SELECT b.vec_id AS vec_id,
          |  round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
          |                               CAST(a.embedding AS DOUBLE[])), 4) AS sim
          |FROM embeddings b, embeddings a
          |WHERE a.vec_id = 0 AND b.vec_id <> 0
          |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,

      "q56_dedup_embedding" ->
        s"""SELECT * FROM (
           |  SELECT x.vec_id AS a, y.vec_id AS b,
           |    round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
           |                                 CAST(y.embedding AS DOUBLE[])), 4) AS sim
           |  FROM (SELECT vec_id, embedding, $sigSql AS sig FROM embeddings) x
           |  JOIN (SELECT vec_id, embedding, $sigSql AS sig FROM embeddings) y
           |    ON x.sig = y.sig AND x.vec_id < y.vec_id)
           |WHERE sim >= 0.4 ORDER BY a, b""".stripMargin
    )
  }
}
