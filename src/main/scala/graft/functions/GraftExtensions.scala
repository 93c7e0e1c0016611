package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** [[SparkSessionExtensions]] installer for the graft-native Catalyst
  * expressions — the library's SQL registration surface. With
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)            // or
  *   .config("spark.sql.extensions",
  *           "org.apache.spark.sql.graft.GraftExtensions")
  * }}}
  *
  * plain SQL can call the kernels directly:
  *
  * {{{
  * SELECT cosine_similarity(a.v, b.v), lsh_signature(v, 16) FROM ...
  * SELECT ngrams(split(text, ' '), 3) FROM documents
  * }}}
  *
  * The config-string form means a cluster operator can enable the
  * functions fleet-wide without any code change — the deployment story
  * for a shared 1000-executor installation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    // the modern 9-arg constructor (the 5-arg form is deprecated since
    // Spark 3.0); empty strings for the optional doc fields
    new ExpressionInfo(classOf[GraftExtensions].getName, "", name, usage,
                       "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
           "_FUNC_(a, b) - cosine similarity of two array<double> vectors"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity takes 2 arguments")
        CosineSimilarity(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("lsh_signature"),
      info("lsh_signature",
           "_FUNC_(v, planes) - random-hyperplane LSH sign signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "lsh_signature takes 2 arguments")
        LshSignature(args(0), args(1) match {
          case e if e.foldable => e.eval().toString.toInt
          case _ => throw new IllegalArgumentException(
            "lsh_signature planes must be a literal")
        })
      }))
    ext.injectFunction((
      FunctionIdentifier("ngrams"),
      info("ngrams", "_FUNC_(tokens, n) - generate n-token shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "ngrams takes 2 arguments")
        NGrams(args(0), args(1) match {
          case e if e.foldable => e.eval().toString.toInt
          case _ => throw new IllegalArgumentException(
            "ngrams n must be a literal")
        })
      }))
    // the whole-operator tier: plans the AsOfJoin logical node
    // (AsOfJoinPlan.asof) to its co-partitioned merge operator
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
