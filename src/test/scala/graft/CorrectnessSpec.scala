package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-computed expectations at sf0.001 (SURVEY.md §5.2 item 2) —
  * independent Scala-collections recomputation, not the SQL oracle. */
class CorrectnessSpec extends SparkSpecBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q31 wordcount matches in-memory recomputation") {
    val texts = Tables(spark, sf, "documents").select("text").as[String].collect()
    val counts = texts.flatMap(_.split(" "))
      .groupBy(identity).map { case (t, a) => (t, a.length.toLong) }
    val expected = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    val got = q("q31_wordcount").as[(String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q55 MR-API wordcount agrees with the declarative q31") {
    assert(q("q55_mr_wordcount").as[(String, Long)].collect().toSeq ==
           q("q31_wordcount").as[(String, Long)].collect().toSeq)
  }

  test("q11 cross join is exactly |region| x |nation|") {
    assert(q("q11_join_cross").count() == 5L * 25L)
  }

  test("q09 semi + q10 anti partition the customer table") {
    assert(q("q09_join_semi").count() + q("q10_join_anti").count() ==
           Tables(spark, sf, "customer").count())
  }

  test("q17 rollup grand-total row equals whole-table aggregate") {
    val all = q("q17_agg_rollup")
      .where(col("returnflag") === "ALL" && col("linestatus") === "ALL")
      .collect()
    assert(all.length == 1)
    val qty = Tables(spark, sf, "lineitem").select("l_quantity").as[Double]
      .collect().map(BigDecimal(_)).sum
    // sum_qty is emitted as DOUBLE (driver-compat), derived from the
    // exact decimal sum — compare through the same final cast
    assert(all.head.getDouble(2) == qty.setScale(4).toDouble)
    assert(all.head.getLong(3) == 6000L)
  }

  test("q41 exact dedup: corpus has no duplicate texts") {
    val r = q("q41_dedup_exact").collect().head
    assert(r.getLong(0) == 500L)   // distinct_docs
    assert(r.getLong(1) == 0L)     // dup_groups
    assert(r.getLong(2) == 0L)     // dropped
  }

  test("q22 per-customer top-3 invariants") {
    val rows = q("q22_win_rank")
      .select("o_custkey", "rn", "rk", "drk").as[(Long, Long, Long, Long)]
      .collect()
    assert(rows.groupBy(_._1).values.forall(_.length <= 3))
    assert(rows.forall { case (_, rn, rk, drk) =>
      rn >= 1 && rn <= 3 && rk <= rn && drk <= rk })
  }

  test("q28 global top-k is descending and tie-broken") {
    val prices = q("q28_topk").select("l_extendedprice").as[Double].collect()
    assert(prices.length == 10)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q43 pairwise sims are valid cosines, sorted desc") {
    val sims = q("q43_sim_topk").select("sim").as[Double].collect()
    assert(sims.length == 20)
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(sims.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("session_window: 30-min gap merges (inclusive); >30 min splits") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val df = Seq((1L, at(0)), (1L, at(10)), (1L, at(40)), (1L, at(71)))
      .toDF("user_id", "ts")
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select("cnt").as[Long].collect().sorted.toSeq
    // 0,10,40 merge (gaps of exactly 30 are inclusive); 71 splits (31 > 30)
    assert(sessions == Seq(1L, 3L))
  }

  test("GeoMeanAgg computes the geometric mean") {
    val geo = udaf(functions.GeoMeanAgg)
    val got = Seq(2.0, 8.0).toDF("x")
      .agg(geo(col("x"))).as[Double].collect().head
    assert(math.abs(got - 4.0) < 1e-12)
  }

  test("q21 approx distinct within 5% of exact (SURVEY §2B tolerance)") {
    val r = q("q21_agg_approx").collect().head
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact) <= 0.05 * exact)
  }

  test("q77 approx percentiles within rank tolerance of exact (SURVEY §2B)") {
    // approx_percentile's guarantee is in RANK space (error <= 1/accuracy
    // of the rank), and it returns an actual order statistic while exact
    // `percentile` interpolates — so a value-distance bound is wrong
    // wherever adjacent order statistics are >tolerance apart (true for
    // sf0.001's ~300-row groups). The correct contract: each approx
    // percentile lies between the exact percentiles at rank +/- 2%
    // (sketch rank error at accuracy=1000 is 0.1%, 20x inside the slack).
    val rows = q("q77_agg_approx_pct").collect()
    assert(rows.nonEmpty)
    val bounds = Tables(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(0.48, 0.52, 0.88, 0.92))")
        .as("b"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { r =>
      val Seq(lo50, hi50, lo90, hi90) = bounds(r.getString(0))
      assert(r.getDouble(1) >= lo50 && r.getDouble(1) <= hi50, r)
      assert(r.getDouble(2) >= lo90 && r.getDouble(2) <= hi90, r)
    }
  }

  test("bandKeys generalizes: (4 hashes, 2 bands) emits 2 keys/doc, clones collide") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact clone of 1
      (3L, "completely different token stream here now")).toDF("doc_id", "text")
    val bk = operators.DedupExtOps.bandKeys(docs, nHashes = 4, bands = 2)
      .as[(Long, String)].collect()
    assert(bk.count(_._1 == 1L) == 2, bk.toSeq)     // one row per band
    val k1 = bk.filter(_._1 == 1L).map(_._2).toSet
    val k2 = bk.filter(_._1 == 2L).map(_._2).toSet
    val k3 = bk.filter(_._1 == 3L).map(_._2).toSet
    assert(k1 == k2, "clones must collide on every band")
    assert((k1 & k3).isEmpty, "disjoint texts should not share band keys")
    // each key = "<band>:" + rows-per-band (=2) 32-hex minhashes
    assert(bk.forall(_._2.length == 2 + 64), bk.toSeq)
  }

  test("sessionize generalizes: 60-min gap matches a gaps-and-islands fold") {
    val ev = Tables(spark, sf, "events").select(col("user_id"), col("ts"))
    val got = operators.TimeWindowOps.sessionize(ev, gapMinutes = 60)
      .select(col("user_id"), unix_micros(col("sess_start")),
              col("cnt"), col("dur_us"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val gapUs = 60L * 60 * 1000000
    val expected = ev.select(col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (u, rows) =>
        val ts = rows.map(_._2).sorted
        val sessions = scala.collection.mutable.ArrayBuffer((ts.head, ts.head))
        ts.tail.foreach { t =>
          val (s, e) = sessions.last
          // inclusive-gap merge (q38 semantics): only > gap opens a session
          if (t - e > gapUs) sessions += ((t, t)) else sessions(sessions.size - 1) = (s, t)
        }
        sessions.map { case (s, e) =>
          (u, s, ts.count(t => t >= s && t <= e).toLong, e - s)
        }
      }.toSet
    assert(got == expected)
  }

  test("q82 clusters: candidate pairs co-cluster and cluster id is the min member") {
    val pairs = q("q46_dedup_minhash")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val lbl = q("q82_dedup_clusters").as[(Long, Long)].collect().toMap
    pairs.foreach { case (a, b) =>
      assert(lbl(a) == lbl(b), s"pair ($a,$b) landed in different clusters")
    }
    lbl.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"cluster $c is not its min member id")
    }
  }

  test("q76 incremental dedup equals the full self-join restricted to new pairs") {
    // the batch-vs-index split must lose nothing and invent nothing:
    // its output is exactly q46's corpus self-join filtered to pairs
    // touching at least one new (odd doc_id) document
    val expected = q("q46_dedup_minhash").as[(Long, Long, Long)].collect()
      .filter { case (a, b, _) => a % 2 == 1 || b % 2 == 1 }.toSeq
    val got = q("q76_dedup_incremental").as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("MediaCodec BMP round-trip: header fields and payload checksum") {
    import operators.MultimodalExtOps.MediaCodec
    val data = Array.tabulate(200)(i => (i % 251).toByte)
    val file = MediaCodec.encodeBmp(data)
    assert(file(0) == 'B' && file(1) == 'M')
    val m = MediaCodec.decode(file)
    assert(m.kind == "bmp")
    assert(m.units == 3)                        // ceil(200/96) rows
    assert(m.fileBytes == 54 + 3 * 96)
    assert(m.fileBytes == file.length)
    assert(m.checksum == data.map(_ & 0xff).map(_.toLong).sum)
  }

  test("MediaCodec WAV round-trip: RIFF chunk walk finds the data chunk") {
    import operators.MultimodalExtOps.MediaCodec
    val data = "hello wav".getBytes("UTF-8")    // odd length -> zero pad
    val file = MediaCodec.encodeWav(data)
    val m = MediaCodec.decode(file)
    assert(m.kind == "wav")
    assert(m.units == 5)                        // ceil(9/2) samples
    assert(m.fileBytes == 44 + 10)
    assert(m.fileBytes == file.length)
    assert(m.checksum == data.map(_ & 0xff).map(_.toLong).sum)
  }

  test("MediaCodec dHash: gradient signs, invariances, and sensitivity") {
    import operators.MultimodalExtOps.MediaCodec
    // strictly increasing bytes -> every horizontal gradient positive
    // -> all 64 bits set (image taller than the 8-row grid, so every
    // sampled row is distinct)
    val inc = Array.tabulate(8 * 96)(i => (i % 96).toByte)
    val fpInc = MediaCodec.dHash(MediaCodec.encodeBmp(inc))
    assert(fpInc == "1" * 64)
    // constant bytes -> no gradient anywhere -> all bits clear
    val flat = Array.fill(8 * 96)(7.toByte)
    assert(MediaCodec.dHash(MediaCodec.encodeBmp(flat)) == "0" * 64)
    // identical payloads -> identical hashes; a localized byte edit
    // flips few bits (the perceptual property the Hamming join uses)
    val copy = inc.clone()
    copy(9) = 120.toByte // pixel column 3 = sampled grid column c=1
    val fpCopy = MediaCodec.dHash(MediaCodec.encodeBmp(copy))
    val ham = fpInc.zip(fpCopy).count { case (a, b) => a != b }
    assert(ham >= 1 && ham <= 4, s"local edit flipped $ham bits")
    assert(MediaCodec.dHash(MediaCodec.encodeBmp(inc)) == fpInc)
  }

  test("MediaCodec rejects unknown container magic") {
    import operators.MultimodalExtOps.MediaCodec
    intercept[IllegalArgumentException] {
      MediaCodec.decode(Array[Byte](1, 2, 3, 4))
    }
  }

  test("MisterJob word count over a typed Dataset") {
    val out = new mr.WordCountJob().run(Seq("a b", "b c").toDS(), 2)
    assert(out == Map("a" -> 1L, "b" -> 2L, "c" -> 1L))
  }

  test("MisterJob.runDistributed (treeReduce) equals the driver-fold run") {
    val texts = Tables(spark, sf, "documents")
      .select(col("text")).as[String]
    val job = new mr.WordCountJob()
    assert(job.runDistributed(texts, 8) == job.run(texts, 8))
    assert(job.runDistributed(spark.emptyDataset[String], 2) == Map.empty)
  }

  test("CosineSimilarity expression agrees with the HOF formulation") {
    val em = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50)
    val pairs = em.as("a").crossJoin(em.as("b"))
      .where(col("a.vec_id") < col("b.vec_id"))
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)
    val hof = pairs.select(
      (dot(col("a.v"), col("b.v")) /
        (sqrt(dot(col("a.v"), col("a.v"))) * sqrt(dot(col("b.v"), col("b.v")))))
        .as("sim")).as[Double].collect()
    val native = pairs.select(
      org.apache.spark.sql.graft.GraftFunctions
        .cosineSimilarity(col("a.v"), col("b.v")).as("sim"))
      .as[Double].collect()
    assert(hof.length == native.length)
    hof.zip(native).foreach { case (h, n) => assert(h == n) } // bit-equal
  }

  test("CosineSimilarity of a vector with itself is 1") {
    val em = Tables(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v")).limit(20)
    em.select(org.apache.spark.sql.graft.GraftFunctions
        .cosineSimilarity(col("v"), col("v")).as("s"))
      .as[Double].collect()
      .foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }

  test("NGrams generator matches the transform/sequence formulation") {
    val docs = Tables(spark, sf, "documents").limit(100)
    val viaGen = docs.select(col("doc_id"),
        org.apache.spark.sql.graft.GraftFunctions
          .ngrams(split(col("text"), " "), 3).as("sh"))
      .as[(Long, String)].collect().toSeq.sorted
    val viaSql = docs.withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 2), i -> concat_ws(' ', slice(t, i, 3)))"))
        .as("sh"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(viaGen == viaSql)
  }

  test("NGrams emits nothing for too-short token arrays") {
    val df = Seq("a b", "x", "p q r").toDF("text")
    val out = df.select(org.apache.spark.sql.graft.GraftFunctions
        .ngrams(split(col("text"), " "), 3).as("sh"))
      .as[String].collect().toSeq
    assert(out == Seq("p q r"))
  }

  test("LshSignature kernel agrees with the HOF formulation") {
    val em = Tables(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v")).limit(100)
    // the round-1 interpreted formulation, as the independent reference
    def planeVal(p: Int): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      d => ((d + lit(p * 64)) * lit(2654435761L) % 1000).cast("double") / 1000 - 0.5
    val hofSig = concat((0 until 16).map { p =>
      val dot = aggregate(
        zip_with(col("v"), transform(sequence(lit(0), lit(63)), planeVal(p)), _ * _),
        lit(0.0), _ + _)
      when(dot > 0, "1").otherwise("0")
    }: _*)
    val rows = em.select(
      org.apache.spark.sql.graft.GraftFunctions.lshSignature(col("v"), 16).as("k"),
      hofSig.as("h")).as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, h) => assert(k == h) }
  }

  test("q71 batched ANN: exact top-k candidates come from banded buckets") {
    val rows = q("q71_ann_batch")
      .select("qid", "cid", "sim", "rk").as[(Long, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    // per query: ranks are 1..n with descending sims, no self-matches
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq)
    }
    rows.foreach { case (qid, cid, _, _) => assert(qid != cid) }
  }

  test("q100 PQ ANN recalls the bulk of the exact top-10 after ADC re-rank") {
    // 8×8 sampled codebooks are crude by design (zero trained state =
    // oracle-expressible); the contract is that ADC candidate
    // generation + exact re-rank of the top-64 recovers most of the
    // true neighbors (measured 0.8 at sf0.001, 0.6 at sf0.1)
    val exact = q("q53_ann_query").select("vec_id").as[Long].collect().toSet
    val pq = q("q100_ann_pq").select("vec_id").as[Long].collect().toSet
    assert(pq.size == 10)
    assert(!pq.contains(0L), "query vector leaked into its own results")
    val recall = exact.count(pq.contains).toDouble / exact.size
    assert(recall >= 0.5, s"PQ m=8×8 rerank=64 recall $recall vs exact top-10")
  }

  test("SquaredL2 kernel agrees bit-for-bit with the HOF formulation") {
    val em = Tables(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v")).limit(40)
    val pairs = em.as("a").crossJoin(em.as("b"))
    val hof = pairs.select(
      aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => (x - y) * (x - y)),
                lit(0.0), _ + _).as("d")).as[Double].collect()
    val native = pairs.select(
      org.apache.spark.sql.graft.GraftFunctions
        .squaredL2(col("a.v"), col("b.v")).as("d")).as[Double].collect()
    assert(hof.length == native.length && hof.nonEmpty)
    hof.zip(native).foreach { case (h, n) => assert(h == n) }
  }

  test("q73 IVF ANN recalls most of the exact top-10 for the probe query") {
    val exact = q("q53_ann_query").select("vec_id").as[Long].collect().toSet
    val ivf = q("q73_ann_ivf").select("vec_id").as[Long].collect().toSet
    assert(ivf.size == 10)
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF nprobe=4/16 recall $recall vs exact top-10")
  }

  test("GraftExtensions registers the native kernels as SQL functions") {
    import org.apache.spark.sql.SparkSession
    // build a second session (same SparkContext) so withExtensions
    // actually applies — getOrCreate() would return the shared session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
        .getOrCreate()
      val r = ext.sql(
        """SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |       lsh_signature(array(1.0d, 0.0d), 4) AS s""".stripMargin)
        .collect().head
      assert(r.getDouble(0) == 1.0)
      assert(r.getString(1).length == 4 && r.getString(1).forall("01".contains(_)))
      val ng = ext.sql(
        "SELECT ngrams(array('a','b','c'), 2) AS g")
        .collect().map(_.getString(0)).toSeq
      assert(ng == Seq("a b", "b c"))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("q83 keep-best: one survivor per cluster, and it's the best member") {
    val rows = q("q83_dedup_keep_best")
      .select("doc_id", "cluster_id", "score", "keep")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    rows.groupBy(_._2).foreach { case (cid, members) =>
      // exactly one keeper, and it is max by (score, then smaller doc_id)
      val keepers = members.filter(_._4 == 1)
      assert(keepers.length == 1, s"cluster $cid has ${keepers.length} keepers")
      val best = members.minBy { case (id, _, sc, _) => (-sc, id) }
      assert(keepers.head == best)
      // singleton clusters are their own id and always keep
      if (members.length == 1) assert(members.head._1 == cid)
    }
    // clustered docs agree with q82's component labels
    val q82 = q("q82_dedup_clusters").as[(Long, Long)].collect().toMap
    q82.foreach { case (id, cid) =>
      assert(rows.find(_._1 == id).get._2 == cid)
    }
  }

  test("q84 repetition ratio matches in-memory recomputation") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .as[(Long, String)].collect()
    val expected = docs.map { case (id, t) =>
      // split(" ", -1): Spark SQL split keeps trailing empty tokens (§7.4)
      val grams = t.split(" ", -1).sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
      (id, grams.size.toLong, grams.distinct.size.toLong,
       BigDecimal(1.0 - grams.distinct.size.toDouble / grams.size)
         .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = q("q84_repetition_ratio")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("q85 mixture matches an in-memory replay of the hash rule") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val idx = src.drop(3).toInt
      val weight = if (idx < 5) 1.0 else if (idx < 12) 0.5 else 0.25
      val kept = ds.filter { case (id, _, _) =>
        val u = md5hex(id.toString).substring(2, 4)
        idx < 5 || (idx < 12 && u <= "7f") || (idx >= 12 && u <= "3f")
      }
      (src, weight, ds.length.toLong, kept.length.toLong,
       kept.map(_._3.split(" ").length.toLong).sum)
    }.toSeq.sortBy(_._1)
    val got = q("q85_mixture_sample")
      .as[(String, Double, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q86 profile stats match in-memory recomputation") {
    val docs = Tables(spark, sf, "documents").collect()
    val byName = q("q86_profile_stats")
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(byName.keySet ==
           Set("doc_id", "lang", "n_chars", "source", "text"))
    for ((name, i) <- Seq("doc_id" -> 0, "text" -> 1, "lang" -> 2,
                          "source" -> 3, "n_chars" -> 4)) {
      val vals = docs.map(_.get(i)).filter(_ != null)
      val (_, nulls, distinct, minV, maxV) = byName(name)
      assert(nulls == docs.length - vals.length)
      assert(distinct == vals.distinct.length)
      (name, i) match {
        case (_, 0) | (_, 4) => // BIGINT columns range numerically
          assert(minV == vals.map(_.asInstanceOf[Long]).min.toString)
          assert(maxV == vals.map(_.asInstanceOf[Long]).max.toString)
        case _ =>
          assert(minV == vals.map(_.asInstanceOf[String]).min)
          assert(maxV == vals.map(_.asInstanceOf[String]).max)
      }
    }
  }

  test("q87 decontamination matches an in-memory replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .as[(Long, String)].collect()
    val shingles = docs.map { case (id, t) =>
      // split(" ", -1): Spark SQL split keeps trailing empty tokens (§7.4)
      val sh = t.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(w => md5hex(w.mkString(" "))).toSet
      (id, md5hex(id.toString).head <= 'b', sh)
    }
    val df = shingles.flatMap(d => d._3).groupBy(identity)
      .map { case (m, _) => m ->
        shingles.count(_._3.contains(m)) }
    val rare = df.filter(_._2 <= 10).keySet
    val expected = (for {
      (eid, eTrain, esh) <- shingles if !eTrain
      (tid, tTrain, tsh) <- shingles if tTrain
      shared = (esh intersect tsh).count(rare.contains)
      if shared >= 3
    } yield (eid, tid, shared.toLong)).sortBy(p => (p._1, p._2)).toSeq
    val got = q("q87_decontaminate")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  // ---- dedicated specs for the r6 corpus-prep family (added r7) ----

  /** Spark `round(x, 6)` semantics: HALF_UP on the exact double expansion. */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q91 packing matches in-memory prefix-sum recomputation") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    // split(" ", -1): Spark SQL split keeps trailing empty tokens (§7.4)
    val expected = docs
      .map { case (id, t) =>
        (md5hex(id.toString).substring(4, 5), id, t.split(" ", -1).length.toLong) }
      .groupBy(_._1).toSeq
      .flatMap { case (shard, rows) =>
        val sorted = rows.sortBy(_._2)
        val exclusivePrefix = sorted.map(_._3).scanLeft(0L)(_ + _)
        sorted.zip(exclusivePrefix).map { case ((_, _, toks), pre) =>
          (shard, pre / 2048, toks) }
      }
      .groupBy { case (shard, pack, _) => (shard, pack) }.toSeq
      .map { case ((shard, pack), rows) =>
        (shard, pack, rows.size.toLong, rows.map(_._3).sum) }
      .sortBy(r => (r._1, r._2))
    val got = q("q91_pack_sequences")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q92 equals per-stratum take-50 by (md5(doc_id), doc_id)") {
    val docs = Tables(spark, sf, "documents")
      .select("lang", "doc_id", "n_chars").as[(String, Long, Long)].collect()
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.sortBy { case (_, id, _) => (md5hex(id.toString), id) }.take(50)
        .zipWithIndex.map { case ((_, id, nc), i) => (lang, i + 1L, id, nc) }
    }.sortBy(r => (r._1, r._2))
    val got = q("q92_stratified_sample")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q93 scrub is idempotent and redacts each segment kind") {
    val samples = Seq(
      "alice bob01@mail.com +1-555-123-4567 ref:123456789 tail",
      "no pii here",
      "a@b.cd 999999999999 x", // 12-digit run: one <ID> + a 3-digit rest
      "user7@example.com user8@example.com +1-900-000-0000")
    val df = samples.toDF("s")
    val once = df.select(operators.CorpusExtOps.scrub(col("s")))
      .as[String].collect().toSeq
    val twice = df.select(operators.CorpusExtOps.scrub(
      operators.CorpusExtOps.scrub(col("s")))).as[String].collect().toSeq
    assert(once == twice, "scrub(scrub(x)) != scrub(x)")
    assert(once.head == "alice <EMAIL> <PHONE> ref:<ID> tail")
    assert(once(1) == "no pii here")
    assert(once(2) == "<EMAIL> <ID>999 x")
    assert(once(3) == "<EMAIL> <EMAIL> <PHONE>")
  }

  test("q94 tf-idf top term matches in-memory recomputation") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val words = docs.flatMap { case (id, t) =>
      t.split(" ", -1).map(w => (id, w)) }
    val tf = words.groupBy(identity).map { case ((id, w), a) =>
      (id, w, a.length.toLong) }
    val dfreq = words.distinct.groupBy(_._2)
      .map { case (w, a) => (w, a.length.toLong) }
    val n = docs.length.toDouble
    val expected = tf.groupBy(_._1).toSeq.map { case (id, rows) =>
      val best = rows
        .map { case (_, w, c) => (w, c, dfreq(w), r6(c * math.log(n / dfreq(w)))) }
        .minBy { case (w, _, _, sc) => (-sc, w) }
      (id, best._1, best._2, best._3, best._4)
    }.sortBy(_._1)
    val got = q("q94_tfidf")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("q95 chunking matches in-memory recomputation") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.map { case (id, t) =>
      val n = t.split(" ", -1).length
      val starts = 0 until n by 40
      val toks = starts.map(st => math.min(50, n - st)).sum.toLong
      (id, starts.length.toLong, toks, r6(toks.toDouble / n))
    }.sortBy(_._1).toSeq
    val got = q("q95_chunk_windows")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("q88 precondition: vocabulary fits the k=64 exact regime") {
    // q88's DuckDB oracle is the plain exact top-10, valid ONLY because
    // nothing is ever evicted (k=64 >= distinct tokens, 31 at current
    // corpus generations). If a corpus-generator change ever widens the
    // vocabulary past 64, the sketch silently enters its approximate
    // regime and the oracle hash mismatch would masquerade as an agg
    // bug — this assertion names the real precondition instead.
    val vocab = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t"))).as[Long].head()
    assert(vocab <= 64, s"vocab $vocab exceeds SpaceSaving k=64 exact regime")
  }

  test("bandKeys hot-bucket cap bounds boilerplate without losing real pairs") {
    // 60 identical boilerplate docs (ids >= 10000) stacked on the real
    // corpus: uncapped LSH lands them all in the same band buckets and
    // goes quadratic — C(60,2) candidate pairs from one hot bucket, the
    // Σ bucket² blowup a web corpus hits on empty/templated pages. The
    // maxBucket guard must drop exactly those buckets: bounded output,
    // recall on every real-corpus pair unchanged.
    val boiler = (0 until 60).map(i =>
      (10000L + i, ("lorem ipsum dolor sit amet " * 8).trim))
      .toDF("doc_id", "text")
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .unionByName(boiler)
    val uncapped = operators.DedupExtOps.candidatePairs(docs)
      .as[(Long, Long)].collect().toSet
    val capped = operators.DedupExtOps.candidatePairs(docs, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    val realPairs = uncapped.filter { case (a, b) => a < 10000 && b < 10000 }
    // the quadratic blowup is present without the cap...
    assert(uncapped.count { case (a, b) => a >= 10000 && b >= 10000 } ==
             60 * 59 / 2)
    // ...fully suppressed with it...
    assert(capped.forall { case (a, b) => a < 10000 && b < 10000 },
           "boilerplate pairs survived the cap")
    // ...and no real pair is lost (real buckets are all under the cap)
    assert(capped == realPairs)
  }

  test("q101 BPE token counts match a reference BPE implementation") {
    // reference BPE inference: merges applied in rank order, each as a
    // left-to-right pass over the word's token sequence — the engine's
    // marker/doubled-replace formulation must reproduce it exactly
    def applyMerges(word: String): Seq[String] = {
      var toks: Vector[String] = word.map(_.toString).toVector
      for ((a, b) <- operators.TextExtOps.BpeMerges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks
    }
    val docs = Tables(spark, sf, "documents").select("lang", "text")
      .as[(String, String)].collect()
    val expected = docs.groupBy(_._1).map { case (lang, rows) =>
      // split(" ", -1): Spark SQL split keeps trailing empty tokens (§7.4)
      lang -> rows.map { case (_, t) =>
        t.split(" ", -1).map(w => applyMerges(w).length.toLong).sum }.sum
    }
    val got = q("q101_bpe_tokens").select("lang", "bpe_tokens")
      .as[(String, Long)].collect().toMap
    assert(got == expected)
    // the doubled literal-replace application is exact ONLY for merges
    // whose left and right tokens differ (an (x,x) merge over a run of
    // 3+ x's would group differently) — guard the table's precondition
    assert(operators.TextExtOps.BpeMerges.forall { case (a, b) => a != b },
           "BPE merge table contains an (x,x) merge — replace-chain unsound")
  }

  test("q121 dictionary tokenizer equals q101's replace chain on the frozen 24-merge table") {
    // two implementations of the same reference semantics — the
    // codegen'd marker/doubled-replace expression (q101) and the
    // broadcast-dictionary mapPartitions form (q121) — must agree
    // word-for-word over the full corpus when given the SAME table
    val merges = operators.TextExtOps.BpeMerges.toArray
    val viaDict = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> functions.BpeDict.countTokens(merges, t) }.toMap
    val viaChain = Tables(spark, sf, "documents")
      .select(col("doc_id"),
              operators.TextExtOps.bpeTokenCount.as("bpe"))
      .as[(Long, Long)].collect().toMap
    assert(viaDict == viaChain)
    assert(viaDict.nonEmpty)
  }

  test("q121 tokenizer handles a 1k-merge vocab (vs independent reference)") {
    // the machinery claim behind q121: vocab size is data, not plan
    // size. A 1024-merge synthetic vocab (chain merges that build long
    // runs, plus pair merges over a 4-char alphabet — many fire, many
    // don't) applied by BpeDict must equal the naive reference fold
    // (q101's replay semantics) on deterministic pseudo-random text.
    val chars = "abcd"
    val syn: Array[(String, String)] =
      ((0 until 24).map(i => ("ab" * (1 << (i % 4)), "ab" * (1 << (i % 4)))) ++
        (for (x <- chars; y <- chars; z <- chars; w <- chars)
          yield (s"$x$y", s"$z$w")) ++
        (0 until 744).map { i =>
          val a = chars((i / 64) % 4); val b = chars((i / 16) % 4)
          val c = chars((i / 4) % 4); val d = chars(i % 4)
          (s"$a$b$c", s"$d")
        }).toArray
    assert(syn.length >= 1024)
    def reference(word: String): Seq[String] = {
      var toks: Vector[String] = word.map(_.toString).toVector
      for ((a, b) <- syn) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks
    }
    val rnd = new scala.util.Random(42)
    val words = (0 until 200).map(_ =>
      (0 until rnd.nextInt(40)).map(_ => chars(rnd.nextInt(4))).mkString) ++
      Seq("", "a", "ab" * 64, "abab" + "cd" * 30)
    for (w <- words)
      assert(functions.BpeDict.tokenize(syn, w).toSeq == reference(w),
             s"mismatch on '$w'")
  }

  test("q46/clusters hot-bucket cap is a no-op at the correctness-gate SFs") {
    // ADVICE r8: the declared q46 and the cluster artifact run capped
    // at HotBucketCap while their DuckDB oracles are uncapped —
    // exactness rests on no test-SF band bucket exceeding the cap.
    // Assert the invariant instead of assuming it: a corpus change
    // that produces a hot bucket now fails HERE, not as an opaque
    // oracle diff.
    // all THREE SFs: sf0.01 is the oracle gate, sf0.1 the bench —
    // a hot bucket at bench scale would silently change q46's bench
    // output vs its uncapped oracle semantics (cheap to guard now
    // that banding is one kernel pass: ~1 s for the sf0.1 corpus)
    for (dir <- Seq(sf, "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val maxBucket = operators.DedupExtOps
        .bandKeys(Tables(spark, dir, "documents"))
        .groupBy("bk").count().agg(max("count")).as[Long].head()
      assert(maxBucket <= operators.DedupExtOps.HotBucketCap,
             s"$dir max band bucket $maxBucket exceeds the cap — " +
               "capped queries no longer oracle-exact")
    }
  }

  test("MinHashBandKeys kernel equals an independent HOF banding reference") {
    // the codegen'd kernel (r9, used by every banding consumer) vs a
    // from-scratch interpreted formulation of the same scheme —
    // shingle → md5 → per-rotation minima → band keys — built here
    // from Spark HOFs only. Two independent implementations, one
    // (doc, band-key) set. (DuckDB provides the third implementation
    // via every consumer query's oracle.)
    val toks = split(col("text"), " ")
    val starts = when(size(toks) >= 3, sequence(lit(1), size(toks) - 2))
      .otherwise(array().cast("array<int>"))
    val ms = transform(
      transform(starts, i => array_join(slice(toks, i, lit(3)), " ")),
      sh => md5(sh))
    val hs = (0 until 8).map { i =>
      array_min(transform(ms, m => substring(concat(m, m), 1 + 4 * i, 32)))
    }
    val hofBands = array((0 until 4).map(j =>
      concat(lit(s"$j:"), hs(2 * j), hs(2 * j + 1))): _*)
    val docs = Tables(spark, sf, "documents")
    val kernel = operators.DedupExtOps.bandKeys(docs)
      .select("doc_id", "bk").as[(Long, String)].collect().toSet
    val hof = docs.where(size(toks) >= 3)
      .select(col("doc_id"), explode(hofBands).as("bk"))
      .as[(Long, String)].collect().toSet
    assert(kernel == hof)
    assert(kernel.nonEmpty)
  }

  test("MinHashBandKeys edge cases: short docs empty, empty tokens hash") {
    // corpus docs are 10-100 tokens; the kernel's contract beyond that:
    // <3 tokens → empty array (the aggregate formulation emitted no
    // rows), and empty-string tokens participate like any token
    val df = Seq((1L, ""), (2L, "a"), (3L, "a b"), (4L, "a b c"),
                 (5L, "a  b"), (6L, "x y z w"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
              org.apache.spark.sql.graft.GraftFunctions
                .minhashBandKeys(split(col("text"), " "), 8, 4).as("bks"))
      .select(col("doc_id"), size(col("bks")).as("n"))
      .as[(Long, Int)].collect().toMap
    // "" splits to [""] (1 token); "a b" = 2 tokens; "a  b" = 3 tokens
    // (the empty middle token counts — split(" ") semantics)
    assert(df == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 4, 5L -> 4, 6L -> 4))
  }

  test("q108 incremental merge equals the full-corpus clustering (q82)") {
    // the union-find merge property made executable: components of
    // (base stars ∪ batch edges) == components of the full candidate
    // graph. q108 computes the left side from the persisted base
    // artifacts; q82 reads the persisted full-corpus table. (A plan
    // assertion can't see q108's artifact probes — the fixpoint pins
    // each round eagerly, truncating the final plan to an ExistingRDD
    // — so the equivalence is asserted on VALUES here, and both
    // queries share the same DuckDB oracle text in the gate.)
    val full = q("q82_dedup_clusters").as[(Long, Long)].collect().toSeq
    val incr = q("q108_clusters_incremental").as[(Long, Long)].collect().toSeq
    assert(incr == full)
    assert(full.nonEmpty)
  }

  test("q107 coded-index ANN agrees with the exact IVF batch (q79) per query") {
    // same probe cells, ADC-bounded candidates, exact re-rank: the
    // stored-code path must recover most of each query's exact top-k
    val exact = q("q79_ann_index").select("qid", "vec_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val coded = q("q107_ann_pq_index").select("qid", "vec_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    assert(coded.keySet == exact.keySet)
    val overlaps = exact.map { case (qid, ex) =>
      ex.intersect(coded(qid)).size.toDouble / ex.size }
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.5, s"mean per-query overlap $mean vs exact IVF top-k")
  }

  test("media transforms: byte-level reference on ragged payload sizes") {
    // decode(transform(encode(payload))) vs a brute-force reference on
    // the raw payload, at sizes that exercise every boundary: empty,
    // sub-row/sub-sample, exact row/sample multiples, one over
    import operators.MultimodalExtOps.MediaCodec
    for (len <- Seq(0, 1, 2, 3, 95, 96, 97, 191, 192, 193, 500)) {
      val payload = Array.tabulate(len)(i => ((i * 37 + 11) % 251).toByte)
      // BMP: kept bytes are (even stored row, even pixel) positions
      val b = MediaCodec.decode(
        MediaCodec.downsampleBmp(MediaCodec.encodeBmp(payload)))
      val inH = (len + 95) / 96
      val outH = (inH + 1) / 2
      val bSum = (0 until len).filter(p =>
        (p / 96) % 2 == 0 && ((p % 96) / 3) % 2 == 0)
        .map(p => payload(p) & 0xff).map(_.toLong).sum
      assert((b.kind, b.fileBytes, b.units, b.checksum) ==
               ("bmp", 54L + 48L * outH, outH.toLong, bSum), s"bmp len=$len")
      // WAV: kept bytes are every 4th 16-bit sample
      val w = MediaCodec.decode(
        MediaCodec.decimateWav(MediaCodec.encodeWav(payload), 4))
      val inS = (len + 1) / 2
      val outS = (inS + 3) / 4
      val wSum = (0 until len).filter(p => (p / 2) % 4 == 0)
        .map(p => payload(p) & 0xff).map(_.toLong).sum
      assert((w.kind, w.fileBytes, w.units, w.checksum) ==
               ("wav", 44L + 2L * outS, outS.toLong, wSum), s"wav len=$len")
    }
  }

  test("q110 merged daily sketches estimate within 5% of exact distincts") {
    // the union of per-day HLL sketches must estimate each type's
    // all-days distinct users within sketch tolerance — the property
    // that makes the persisted sketch artifact a valid substitute for
    // a fact-table rescan
    val est = q("q110_hll_daily_union").select("event_type", "est_users")
      .as[(String, Long)].collect().toMap
    val exact = Tables(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("nd"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    for ((t, e) <- exact) {
      val a = est(t)
      assert(math.abs(a - e).toDouble / e <= 0.05,
             s"$t: sketch $a vs exact $e")
    }
  }

  test("q56's hot-bucket cap: declared cap is a no-op at test SF; a low cap drops hot buckets wholesale") {
    // the r11 100× sweep measured the UNCAPPED banded self-join
    // filling the spill disk (embedding families concentrate into few
    // 8-bit band buckets, and Σ bucket² is quadratic in bucket size).
    // Contract: EmbBucketCap = 128 sits above every test-SF bucket
    // (max 24 here, 75 at sf0.1), so the declared pair set and the
    // oracle stay exact — while the capped REGIME, forced with a low
    // cap, must really suppress dense buckets.
    val v = col("embedding").cast("array<double>")
    val base = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), v.as("v"),
              org.apache.spark.sql.graft.GraftFunctions
                .lshSignature(v, 16).as("sig"))
    val uncapped = operators.SimilarityExtOps.bandedPairs(base).count()
    val declared = operators.SimilarityExtOps
      .bandedPairs(base, operators.SimilarityExtOps.EmbBucketCap).count()
    val low = operators.SimilarityExtOps.bandedPairs(base, 8).count()
    assert(declared == uncapped,
           s"declared cap changed test-SF semantics: $declared vs $uncapped")
    assert(low < uncapped, s"low cap dropped nothing: $low vs $uncapped")
  }

  test("q168's evolution contract: merged field set, per-batch field sets, NULL = pre-evolution rows") {
    // schema evolution is a READER merge, never a backfill: batch-1
    // files must genuinely lack the evolved column, the merged read
    // must surface it nullable, and its NULLs must be exactly the
    // batch-1 rows.
    val root = sources.PartitionedOps.evolvedEventsDir(spark, sf)
    val b1 = spark.read.parquet(s"$root/batch=1")
    val b2 = spark.read.parquet(s"$root/batch=2")
    assert(!b1.schema.fieldNames.contains("channel"),
           "batch-1 files were backfilled with the evolved column")
    assert(b2.schema.fieldNames.contains("channel"))
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    val f = merged.schema("channel")
    assert(f.dataType == org.apache.spark.sql.types.StringType && f.nullable)
    assert(merged.where(col("channel").isNull).count() == b1.count(),
           "NULL channel rows are not exactly the pre-evolution rows")
    assert(merged.where(col("channel").isNotNull).count() == b2.count())
  }

  test("q120 production variant at the declared configuration equals the declared query") {
    // the production-scaled path (fixed eval cap + parameterized
    // codebook) must be the SAME operator when its knobs sit at the
    // declared values: evalCap ≥ |eval split| and cents = 16. This
    // pins the semProbe refactor and the parameterized index build —
    // the sweep's production point differs from the declared query by
    // configuration only, never by code path.
    val declared = q("q120_decontaminate_semantic").collect().toSeq
    val prod = operators.SimilarityExtOps
      .q120Production(spark, sf, evalCap = 1000000, cents = 16)
      .collect().toSeq
    assert(prod == declared,
           s"production variant diverged: ${prod.size} vs ${declared.size} rows")
  }

  test("q105 IVF-PQ ANN recalls most of the exact top-10") {
    val exact = q("q53_ann_query").select("vec_id").as[Long].collect().toSeq
    val got = q("q105_ann_ivfpq").select("vec_id").as[Long].collect().toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF-PQ nprobe=4 m=8 recall $recall vs exact top-10")
  }

  /** The winnowed minimizer selection q96/q103 declare (r13), replayed
    * sequentially: per-doc 8-gram hash list, min of each complete
    * 5-gram window, global min for docs with < 5 grams. */
  private def replayMinimizers(t: String): Set[String] = {
    // split(" ", -1): Spark SQL split keeps trailing empty tokens (§7.4)
    val hs = t.split(" ", -1).sliding(8).filter(_.length == 8)
      .map(w => md5hex(w.mkString(" "))).toVector
    if (hs.isEmpty) Set.empty[String]
    else if (hs.length >= 5) hs.sliding(5).map(_.min).toSet
    else Set(hs.min)
  }

  test("q96 winnowed exact-substring decontamination matches an in-memory replay") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .as[(Long, String)].collect()
    val mins = docs.map { case (id, t) =>
      (id, md5hex(id.toString).head <= 'b', replayMinimizers(t))
    }
    val rare = mins.flatMap(_._3).groupBy(identity)
      .map { case (m, _) => m -> mins.count(_._3.contains(m)) }
      .filter(_._2 <= 10).keySet
    val expected = (for {
      (eid, eTrain, eg) <- mins if !eTrain
      (tid, tTrain, tg) <- mins if tTrain
      shared = (eg intersect tg).count(rare.contains)
      if shared >= 1
    } yield (eid, tid, shared.toLong)).sortBy(p => (p._1, p._2)).toSeq
    val got = q("q96_decontaminate_exact")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "exact tier found no pairs at test SF")
  }

  test("q96 winnowing guarantee: a shared ≥12-token span always shares a minimizer") {
    // the deterministic-recall property the tier's declared semantics
    // rest on: k=8, w=5 ⇒ any verbatim span of ≥ k+w−1 = 12 tokens
    // contains a complete minimizer window, and both docs pick the
    // same minimum in it — checked over 200 constructed pairs with
    // the shared span embedded at varying offsets in random context
    val rnd = new scala.util.Random(42)
    def toks(n: Int) = Vector.fill(n)("t" + rnd.nextInt(5000))
    for (trial <- 1 to 200) {
      val span = toks(12 + rnd.nextInt(6))
      val a = (toks(rnd.nextInt(20)) ++ span ++ toks(rnd.nextInt(20)))
        .mkString(" ")
      val b = (toks(rnd.nextInt(20)) ++ span ++ toks(rnd.nextInt(20)))
        .mkString(" ")
      assert(replayMinimizers(a).intersect(replayMinimizers(b)).nonEmpty,
             s"trial $trial: shared ${span.length}-token span missed")
    }
  }

  test("q299 BPE induction matches a sequential textbook trainer") {
    // the gaps-and-islands parity formulation (three window passes,
    // engine-replayable) must equal the straightforward sequential
    // greedy-leftmost trainer on the same capped word-frequency dict
    val words = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect().toSeq
      .sortBy { case (w, f) => (-f, w) }.take(4096)
    var vocab = words.map { case (w, f) =>
      (w.map(_.toString).toVector, f) }
    val expected = (1 to 8).map { round =>
      val counts =
        scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val ((a, b), cnt) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, x, y) }
      vocab = vocab.map { case (syms, f) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toVector, f)
      }
      (round, a, b, cnt)
    }
    val got = q("q299_bpe_train")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == expected, s"merge tables diverge:\n$got\nvs\n$expected")
  }

  test("PCA dims bound fails fast with the named limit") {
    // the r12 verdict's #4: the d² driver collect must refuse, with a
    // named limit, rather than degrade into a silent giant collect
    val e = intercept[IllegalArgumentException] {
      operators.SimilarityExtOps.requirePcaDims(513)
    }
    assert(e.getMessage.contains("at most 512 dims"),
           s"bound message changed: ${e.getMessage}")
    operators.SimilarityExtOps.requirePcaDims(512) // boundary accepted
  }

  test("q297 component 1 equals q295's output") {
    // deflation must be a pure extension: the first solve is the SAME
    // declared algorithm, so component 1's rows are q295's verbatim
    val c1 = q("q297_pca_topk").where(col("component") === 1)
      .select("dim", "loading", "var_explained")
      .as[(Int, Double, Double)].collect().toSeq
    val p = q("q295_pca_power").as[(Int, Double, Double)].collect().toSeq
    assert(c1 == p, "q297 component 1 diverges from q295")
  }

  test("q119 re-diff self-check: applied snapshot diffs to all-unchanged") {
    // the built-in invariant a production MERGE job asserts after the
    // write: re-running q117's classification with the APPLIED snapshot
    // as the old side and the synthesized target as the new side must
    // classify every key as unchanged (no lost deletes, no stale
    // updates, no dropped inserts)
    val applied = operators.AdvancedOps.mergedSnapshot(spark, sf)
    val target = operators.AdvancedOps.todayRows(Tables(spark, sf, "orders"))
    val ops = operators.AdvancedOps.diffClassify(applied, target)
      .groupBy("op").count().as[(String, Long)].collect().toMap
    assert(ops.keySet == Set("unchanged"), s"re-diff found changes: $ops")
    assert(ops("unchanged") == target.count())
  }

  test("q123 SCD2 invariants: exactly one current row per live key, none for deleted") {
    // the structural contract of a type-2 history: the set of
    // is_current rows IS today's snapshot key set — one open version
    // per live key, no open version for a deleted key, never two
    val hist = q("q123_scd2_history")
    val cur = hist.where(col("is_current") === 1)
    val dupCur = cur.groupBy("key").count().where(col("count") =!= 1)
    assert(dupCur.count() == 0, "a key holds two current versions")
    val live = operators.AdvancedOps
      .todayRows(Tables(spark, sf, "orders")).select("key")
    assert(cur.select("key").exceptAll(live).count() == 0,
           "a current version exists for a key not in today's snapshot")
    assert(live.exceptAll(cur.select("key")).count() == 0,
           "a live key lacks a current version")
  }

  test("q125 Lloyd descent: refined centroids do not increase within-cell cost") {
    // the k-means guarantee made executable: with the assignment held
    // fixed, replacing each cell's centroid by the cell MEAN minimizes
    // the within-cell sum of squared distances, so the refined
    // codebook's total cost can never exceed the sampled codebook's
    // (up to the 1e-6 fixed-point rounding of the declared output)
    val em = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].collect()
    val cents = em.filter(_._1 < 16).map { case (id, v) => id -> v }.toMap
    def sq(a: Seq[Double], b: Seq[Double]): Double =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    // same argmin + (dist, cid) tie-break as the ArgminCentroid kernel
    val asg = em.map { case (_, v) =>
      (cents.toSeq.minBy { case (cid, cv) => (sq(v, cv), cid) }._1, v) }
    val oldCost = asg.map { case (cid, v) => sq(v, cents(cid)) }.sum
    val refined = q("q125_kmeans_step").select("cid", "dim", "c_new")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (cid, rows) =>
        cid -> rows.sortBy(_._2).map(_._3).toSeq }
    val newCost = asg.map { case (cid, v) => sq(v, refined(cid)) }.sum
    assert(newCost <= oldCost + 1e-3,
           s"Lloyd step increased cost: $oldCost -> $newCost")
    assert(newCost < oldCost, "refinement had no effect — fixture degenerate")
  }

  test("q126 cascade invariant: applying the deletes introduces no NEW orphans") {
    // the point of the TRANSITIVE lineitem hop: after the erasure job
    // applies (anti joins with the same keys the audit counted),
    // q116's referential-integrity rule over the survivors must find
    // exactly the orphans the RAW data already had (the corpus ships
    // some by design — q116 fires on them) and not one more — a
    // cascade that deleted orders but missed their lineitems fails
    // exactly here
    def orphanCount(li: org.apache.spark.sql.DataFrame,
                    or: org.apache.spark.sql.DataFrame): Long =
      li.join(or.select(col("o_orderkey").as("l_orderkey")),
              Seq("l_orderkey"), "left_anti").count()
    val delCust = Tables(spark, sf, "customer")
      .where(col("c_custkey") % 37 === 0).select("c_custkey")
    val survivingOrders = Tables(spark, sf, "orders")
      .join(delCust.withColumnRenamed("c_custkey", "o_custkey"),
            Seq("o_custkey"), "left_anti")
    val delOrderKeys = Tables(spark, sf, "orders")
      .join(delCust.withColumnRenamed("c_custkey", "o_custkey"),
            Seq("o_custkey"), "left_semi")
      .select(col("o_orderkey").as("l_orderkey"))
    val survivingLineitem = Tables(spark, sf, "lineitem")
      .join(delOrderKeys, Seq("l_orderkey"), "left_anti")
    val before = orphanCount(Tables(spark, sf, "lineitem"),
                             Tables(spark, sf, "orders"))
    val after = orphanCount(survivingLineitem, survivingOrders)
    assert(after == before,
           s"cascade changed the orphan count: $before -> $after")
    // the fixture must actually delete something, or the test is vacuous
    assert(delOrderKeys.count() > 0)
  }

  test("q128 KLL estimates are rank-bracketed by the exact order statistics") {
    // the q77 discipline for the persisted sketch: each estimated
    // percentile must sit between the exact values at rank ± 4%
    // (k=200 single-level KLL ⇒ ~1.65% rank error; at this SF the
    // per-type streams sit under k, so estimates are typically exact)
    val exact = Tables(spark, sf, "events")
      .select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = q("q128_kll_daily_union")
      .select("event_type", "p50_est", "p90_est")
      .as[(String, Double, Double)].collect()
    assert(got.map(_._1).toSet == exact.keySet)
    for ((t, p50, p90) <- got; (r, est) <- Seq(0.5 -> p50, 0.9 -> p90)) {
      val v = exact(t)
      def at(rank: Double): Double =
        v(math.max(0, math.min(v.length - 1, (rank * v.length).toInt)))
      assert(est >= at(r - 0.04) && est <= at(r + 0.04),
             s"$t p$r estimate $est outside rank bracket " +
               s"[${at(r - 0.04)}, ${at(r + 0.04)}]")
    }
  }

  test("q136 time travel forward: the history reconstructs the day-1 snapshot too") {
    // q136's declared read recovers version 0 (oracle = orders); the
    // same interval predicate at v = 1 must recover the APPLIED
    // snapshot q119 built — history, merge and diff all agree on what
    // "today" is
    // o_orderdate canonicalized to string: the merged snapshot reads
    // the bucketed artifact (DDL TIMESTAMP) while the history reads
    // the parquet directly (TIMESTAMP_NTZ) — same instant under the
    // UTC session, different JVM types
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("key"), col("o_custkey"), col("o_orderstatus"),
              col("o_totalprice"), col("o_orderdate").cast("string"),
              col("o_orderpriority"))
      .orderBy("key").collect().toSeq
    val v1 = canon(operators.AdvancedOps.scd2History(spark, sf)
      .where(col("valid_from") <= 1 &&
             (col("valid_to").isNull || col("valid_to") > 1)))
    val applied = canon(operators.AdvancedOps.mergedSnapshot(spark, sf))
    assert(v1 == applied)
    assert(v1.nonEmpty)
  }

  // ---- q139–q144 exact-statistics family: in-memory replays ----
  // Each test recomputes the statistic with plain Scala collections
  // (BigInt/BigDecimal exact arithmetic, the same fixed double operand
  // order) and demands EQUALITY with the declared query — the oracle
  // checks cross-engine agreement; these check the math itself.
  // (`r6` = the suite's existing HALF_UP 6 dp helper.)

  test("q139 sweep equals an in-memory interval sweep") {
    val ev = Tables(spark, sf, "events")
      .select(col("event_type"), unix_micros(col("ts")))
      .as[(String, Long)].collect()
    val expected = ev.groupBy(_._1).map { case (tpe, rows) =>
      val bounds = rows.flatMap { case (_, t) =>
        Seq((t, 1L), (t + 1800000000L, -1L)) }.sortBy(identity)
      var cur = 0L
      val running = bounds.map { case (t, dl) => cur += dl; (t, cur) }
      val mx = running.map(_._2).max
      val first = running.find(_._2 == mx).get._1
      tpe -> (mx, first)
    }
    val got = q("q139_max_concurrency")
      .select(col("event_type"), col("max_concurrent"),
              unix_micros(col("peak_start")))
      .as[(String, Long, Long)].collect()
      .map { case (tpe, m, t) => tpe -> (m, t) }.toMap
    assert(got == expected)
  }

  test("q140 correlations equal a BigInt-moment replay, and are valid") {
    val rows = Tables(spark, sf, "lineitem").select(
        round(col("l_quantity") * 100).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_tax") * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val cols = Map("q" -> rows.map(_._1), "e" -> rows.map(_._2),
                   "d" -> rows.map(_._3), "t" -> rows.map(_._4))
    def corr(x: Array[Long], y: Array[Long]): Double = {
      val n = BigInt(x.length)
      def s(a: Array[Long]) = a.foldLeft(BigInt(0))(_ + _)
      def sp(a: Array[Long], b: Array[Long]) =
        a.zip(b).foldLeft(BigInt(0)) { case (acc, (u, v)) =>
          acc + BigInt(u) * BigInt(v) }
      val (sx, sy) = (s(x), s(y))
      val (sxx, syy, sxy) = (sp(x, x), sp(y, y), sp(x, y))
      r6((n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
         math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
                   (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble)))
    }
    val got = q("q140_corr_matrix").as[(String, Double)].collect().toMap
    assert(got.keySet ==
           Set("q_e", "q_d", "q_t", "e_d", "e_t", "d_t"))
    got.foreach { case (pair, v) =>
      assert(v >= -1.0 && v <= 1.0, s"$pair out of range: $v")
      val Array(a, b) = pair.split("_")
      assert(v == corr(cols(a), cols(b)), s"$pair: $v")
    }
  }

  test("q141 KS statistic equals a BigInt cumulative replay") {
    val o = Tables(spark, sf, "orders")
      .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(round(col("o_totalprice") * 100).cast("long"),
              col("o_orderpriority"))
      .as[(Long, String)].collect()
    val g1 = o.filter(_._2 == "1-URGENT").map(_._1).sorted
    val g2 = o.filter(_._2 == "5-LOW").map(_._1).sorted
    val (n1, n2) = (BigInt(g1.length), BigInt(g2.length))
    val dmax = (g1 ++ g2).distinct.map { v =>
      val c1 = BigInt(g1.count(_ <= v))
      val c2 = BigInt(g2.count(_ <= v))
      (c1 * n2 - c2 * n1).abs
    }.max
    val Array(row) = q("q141_ks_test")
      .as[(Long, Long, Long, Double)].collect()
    assert(row == ((n1.toLong, n2.toLong, dmax.toLong,
                    r6(dmax.toDouble / (n1.toDouble * n2.toDouble)))))
  }

  test("q142 entropy equals a decimal-sum replay and respects ln(vocab)") {
    val docs = Tables(spark, sf, "documents")
      .select(col("lang"), col("text")).as[(String, String)].collect()
    val expected = docs.groupBy(_._1).map { case (lang, rows) =>
      val counts = rows.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).values.map(_.length.toLong)
      val n = counts.sum
      val s = counts.foldLeft(BigDecimal(0)) { (acc, c) =>
        acc + BigDecimal(r6(c.toDouble * math.log(c.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) }
      lang -> ((n, counts.size.toLong,
                r6(math.log(n.toDouble) - s.toDouble / n.toDouble)))
    }
    val got = q("q142_token_entropy")
      .as[(String, Long, Long, Double)].collect()
      .map { case (l, n, v, h) => l -> ((n, v, h)) }.toMap
    assert(got == expected)
    got.foreach { case (lang, (_, vocab, h)) =>
      assert(h >= 0 && h <= math.log(vocab.toDouble) + 1e-6,
             s"$lang entropy $h outside [0, ln vocab]") }
  }

  test("q143 weighted sample equals an in-memory A-ES replay") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(docId: Long, w: Long): Double = {
      val hex = md.digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967297.0
      r6(math.log(u) / w.toDouble)
    }
    val docs = Tables(spark, sf, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars").cast("long"))
      .as[(String, Long, Long)].collect()
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.map { case (_, id, w) => (id, key(id, w)) }
        .sortBy { case (id, k) => (-k, id) }.take(20).zipWithIndex
        .map { case ((id, k), i) => (lang, i + 1L, id, k) }
    }.toSet
    val got = q("q143_weighted_sample")
      .select(col("lang"), col("rk"), col("doc_id"), col("es_key"))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("q144 chi-squared equals a cleared-denominator replay") {
    val ev = Tables(spark, sf, "events")
      .select(col("event_type"), unix_micros(col("ts")))
      .as[(String, Long)].collect()
      .map { case (tpe, us) =>
        (tpe, (Math.floorDiv(us, 86400000000L) - 4) % 7) }
    val obs = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val c = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = obs.values.sum
    val cells = obs.map { case ((tpe, dow), o) =>
      val dev = BigInt(o) * BigInt(n) - BigInt(r(tpe)) * BigInt(c(dow))
      (tpe, dow) -> ((o, r6((dev * dev).toDouble /
        (r(tpe).toDouble * c(dow).toDouble * n.toDouble))))
    }
    val total = cells.values.map { case (_, chi) =>
      BigDecimal(chi).setScale(6, BigDecimal.RoundingMode.HALF_UP) }
      .sum.toDouble
    val got = q("q144_chi2_independence")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length == cells.size)
    got.foreach { case (tpe, dow, o, chi, tot) =>
      assert(cells((tpe, dow)) == ((o, chi)), s"cell ($tpe, $dow)")
      assert(tot == total)
    }
  }

  test("q145 PSI equals a smoothed-share replay and is nonnegative-ish") {
    val ev = Tables(spark, sf, "events")
      .select(col("value"), unix_micros(col("ts")))
      .as[(Double, Long)].collect()
      .map { case (v, us) =>
        (v, if ((Math.floorDiv(us, 86400000000L) - 4) % 7 < 5) 1L else 0L) }
    val vmin = ev.map(_._1).min
    val vmax = ev.map(_._1).max
    val cells = ev.groupBy { case (v, _) =>
        math.min(9L, math.floor((v - vmin) * 10.0 / (vmax - vmin)).toLong) }
      .view.mapValues { rows =>
        (rows.map(_._2).sum, rows.map(1L - _._2).sum) }.toMap
    val na = cells.values.map(_._1).sum
    val nb = cells.values.map(_._2).sum
    val terms = cells.map { case (bin, (a, b)) =>
      val pa = (a + 1).toDouble / (na + 10).toDouble
      val pb = (b + 1).toDouble / (nb + 10).toDouble
      bin -> ((a, b, r6((pa - pb) * math.log(pa / pb))))
    }
    val psi = terms.values.map { case (_, _, t) =>
      BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP) }
      .sum.toDouble
    val got = q("q145_psi_drift")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.length == terms.size)
    got.foreach { case (bin, a, b, term, p) =>
      assert(terms(bin) == ((a, b, term)), s"bin $bin")
      assert(p == psi)
    }
  }

  test("q146 Gini equals a sorted-rank replay and sits in [0, 1)") {
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderpriority"),
              round(col("o_totalprice") * 100).cast("long"))
      .as[(String, Long)].collect()
    val expected = o.groupBy(_._1).map { case (prio, rows) =>
      val xs = rows.map(_._2).sorted
      val n = BigInt(xs.length)
      val sx = xs.foldLeft(BigInt(0))(_ + _)
      val six = xs.zipWithIndex.foldLeft(BigInt(0)) {
        case (acc, (x, i)) => acc + BigInt(i + 1) * BigInt(x) }
      prio -> ((xs.length.toLong,
                r6((2.0 * six.toDouble - (n.toDouble + 1.0) * sx.toDouble) /
                   (n.toDouble * sx.toDouble))))
    }
    val got = q("q146_gini").as[(String, Long, Double)].collect()
      .map { case (p, n, g) => p -> ((n, g)) }.toMap
    assert(got == expected)
    got.foreach { case (p, (_, g)) =>
      assert(g >= 0.0 && g < 1.0, s"$p gini $g outside [0, 1)") }
  }

  test("q46 minhash candidates are supported by real prefix near-dups") {
    // Every q42 high-Jaccard pair should be recovered by LSH banding.
    val lsh = q("q46_dedup_minhash").select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val jac = q("q42_dedup_near").select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val recall = if (jac.isEmpty) 1.0
                 else jac.count(lsh.contains).toDouble / jac.size
    assert(recall >= 0.9, s"LSH recall $recall of ${jac.size} true pairs")
  }

  test("q228 TextRank matches a Scala integer power iteration") {
    val S = 1000000000000L
    val docs = Tables(spark, sf, "documents").select("text")
      .as[String].collect().toSeq.map(_.split(" ", -1).toSeq)
    val pairs = for {
      t <- docs; i <- t.indices; k <- 1 to 2
      if i + k < t.length
      a = t(i); b = t(i + k)
      if a.nonEmpty && b.nonEmpty && a != b
    } yield (Seq(a, b).min, Seq(a, b).max)
    val wt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val edges = wt.toSeq.flatMap { case ((a, b), w) =>
      Seq((a, b, w), (b, a, w)) }
    val ws = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nn = ws.size
    var r = ws.keys.map(_ -> S / nn).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).view.mapValues(_.map { case (u, _, w) =>
        r(u) * w / ws(u) }.sum).toMap
      r = r.keys.map(id =>
        id -> (15 * (S / nn) / 100 + 85 * contrib.getOrElse(id, 0L) / 100))
        .toMap
    }
    val expected = r.toSeq.sortBy { case (t, rk) => (-rk, t) }.take(10)
    val got = q("q228_textrank").as[(String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q227 minimizers compress the gram index and pairs share real grams") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, t.split(" ", -1).toSeq) }
      .filter(_._2.length >= 8)
    val gramSets = docs.map { case (id, t) =>
      id -> t.sliding(8).map(_.mkString(" ")).toSet }.toMap
    val pairs = q("q227_minimizer_pairs")
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.nonEmpty, "no candidate pairs at sf0.001")
    pairs.foreach { case (a, b, n) =>
      val shared = gramSets(a).intersect(gramSets(b)).size
      assert(shared >= n,
             s"pair ($a,$b) claims $n shared minimizers, only $shared grams")
      assert(n >= 2)
    }
    // the index-size claim: the minimizer signature must be well under
    // half the distinct-gram postings (expected density 2/(w+1) = 1/3)
    val gramRows = gramSets.values.map(_.size.toLong).sum
    val mzRows = docs.map { case (id, t) =>
      val hs = t.sliding(8).map(w => {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(w.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }).toIndexedSeq
      hs.sliding(5).map(_.min).toSet.size.toLong
    }.sum
    assert(mzRows.toDouble / gramRows < 0.5,
           s"minimizer rows $mzRows vs gram rows $gramRows — no compression")
  }

  test("q226 group split never separates q46 near-duplicates and covers the corpus") {
    def split(k: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
      if (Integer.toHexString((h(0) >> 4) & 0xf).charAt(0) <= 'b') "train"
      else "eval"
    }
    val cl = spark.table(operators.DedupExtOps.clusterTable(spark, sf))
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val pairs = q("q46_dedup_minhash").select("id_a", "id_b")
      .as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(split(cl.getOrElse(a, a)) == split(cl.getOrElse(b, b)),
             s"near-dup pair ($a, $b) straddles the split") }
    val rows = q("q226_group_split").as[(String, Long, Long, Long)]
      .collect().toSeq
    assert(rows.map(_._2).sum == Tables(spark, sf, "documents").count())
  }

  test("q225 TWAP matches a Scala interval fold") {
    val evs = Tables(spark, sf, "events")
      .select(col("event_type"), col("event_id"),
              unix_micros(col("ts")),
              round(col("value") * 100).cast("long"))
      .as[(String, Long, Long, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = evs.groupBy(_._1).toSeq.map { case (t, g) =>
      val s = g.sortBy(e => (e._3, e._2))
      val iv = s.zip(s.tail).map { case (a, b) => (a._4, b._3 - a._3) }
      val durSum = iv.map(d => BigInt(d._2)).sum
      val wSum = iv.map(d => BigInt(d._1) * BigInt(d._2)).sum
      val cSum = iv.map(d => BigInt(d._1)).sum
      (t, iv.length.toLong, r6(durSum.toDouble / 1e6),
       r6(wSum.toDouble / durSum.toDouble / 100.0),
       r6(cSum.toDouble / iv.length / 100.0))
    }.sortBy(_._1)
    val got = q("q225_twap")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == expected)
    // the weighting must actually differ from the row average somewhere
    assert(got.exists(r => r._4 != r._5), "TWAP == plain avg everywhere")
  }

  test("q224 coverage curve is monotone and consistent with the vocab") {
    val rows = q("q224_vocab_coverage")
      .as[(String, Long, Double)].collect()
      .map { case (m, t, s) => m -> ((t, s)) }.toMap
    val cov = Seq("cov90", "cov95", "cov99").map(rows)
    assert(cov.map(_._1) == cov.map(_._1).sorted, "ranks not monotone")
    assert(cov.zip(Seq(0.90, 0.95, 0.99)).forall { case ((_, s), q) =>
             s >= q }, s"achieved share below target: $cov")
    val vocab = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .where(length(col("t")) > 0).select("t").distinct().count()
    assert(cov.forall(_._1 <= vocab))
  }

  test("q223 custom as-of operator agrees with the compositional q13") {
    // two independent engines for the same semantics: the AsOfJoinExec
    // merge pass vs the union + running-last window — bit-equal output
    val viaExec = q("q223_asof_exec")
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSeq
    val viaWindow = q("q13_join_asof")
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSeq
    assert(viaExec == viaWindow)
    assert(viaExec.exists(_._4.isDefined) && viaExec.exists(_._4.isEmpty),
           "both matched and unmatched purchases must occur")
  }

  test("q222 k-means loop converges: inertia non-increasing, iter-1 moved = corpus") {
    val rows = try q("q222_kmeans_loop")
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      finally PinScope.drain()
    assert(rows.map(_._1) == Seq(1L, 2L, 3L))
    val nVec = Tables(spark, sf, "embeddings").count()
    assert(rows.head._3 == nVec, "iter-1 'moved' must be the full corpus")
    // Lloyd monotonicity holds on the lattice too: each assignment is
    // argmin under its centroids, each update is the (lattice) mean
    assert(rows(1)._2 <= rows(0)._2 && rows(2)._2 <= rows(1)._2,
           s"inertia not non-increasing: ${rows.map(_._2)}")
    assert(rows.forall(r => r._4 >= 1L && r._4 <= 16L))
  }

  test("q219 substring-dup report matches a Scala brute force") {
    // gram identity = the raw 8-token window joined on " " (md5 in the
    // operator is only a fixed-width transport key); split keeps empty
    // tokens, docs shorter than 8 tokens are out of scope
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().toSeq
      .map { case (id, src, t) => (id, src, t.split(" ", -1).toSeq) }
      .filter(_._3.length >= 8)
    val grams = docs.flatMap { case (id, src, t) =>
      t.sliding(8).map(w => (id, src, w.mkString(" "))) }
    val dupG = grams.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val expected = docs.map(_._2).distinct.sorted.map { src =>
      val g = grams.filter(_._2 == src)
      val perDoc = g.groupBy(_._1).view
        .mapValues(ws => (ws.length.toLong, ws.count(w => dupG(w._3)).toLong))
      val ng = perDoc.values.map(_._1).sum
      val dg = perDoc.values.map(_._2).sum
      (src, perDoc.size.toLong, ng, dg,
       perDoc.values.count(_._2 > 0).toLong,
       BigDecimal(dg.toDouble / ng.toDouble)
         .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = try q("q219_substring_dup")
        .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
      finally PinScope.drain()
    assert(got == expected)
    assert(got.exists(_._4 > 0L),
           "no cross-doc duplicated gram at sf0.001 — report vacuous")
  }

  test("q229 AUC matches a brute-force pairwise count") {
    // independent semantics: AUC = P(score_pos > score_neg) + P(=)/2,
    // counted directly over order pairs — no ranks at all
    val orders = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"),
               round(col("o_totalprice") * 100).cast("long").as("v"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("pos"))
      .as[(Long, String, Long, Int)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = orders.groupBy(_._2).toSeq.map { case (prio, g) =>
      val ps = g.filter(_._4 == 1).map(_._3)
      val ns = g.filter(_._4 == 0).map(_._3)
      val wins = (for (p <- ps; n <- ns)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      (prio, ps.size.toLong, ns.size.toLong,
       r6(wins.toDouble / (2.0 * ps.size * ns.size)))
    }.sortBy(_._1)
    val got = q("q229_auc_rank")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.forall(r => r._4 > 0.0 && r._4 < 1.0), s"degenerate AUC: $got")
  }

  test("q230 out-of-fold encoding never sees its own fold") {
    val rows = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
            col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
              conv(substring(md5(col("o_orderkey").cast("string")), 1, 4),
                   16, 10).cast("long") % 5,
              round(col("o_totalprice") * 100).cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sumAll = rows.map(r => BigInt(r._3)).sum
    val cntAll = rows.size.toLong
    val expected = rows.groupBy(r => (r._1, r._2)).toSeq.map {
      case ((seg, fold), g) =>
        val segRows = rows.filter(_._1 == seg)
        val (sSeg, cSeg) = (segRows.map(r => BigInt(r._3)).sum,
                            segRows.size.toLong)
        val (sF, cF) = (g.map(r => BigInt(r._3)).sum, g.size.toLong)
        val oof = (sSeg - sF).toDouble / (cSeg - cF).toDouble / 100.0
        val prior = (sumAll - sSeg).toDouble / (cntAll - cSeg).toDouble
        val smooth = ((sSeg - sF).toDouble + 20.0 * prior) /
          (cSeg - cF + 20).toDouble / 100.0
        (seg, fold, g.size.toLong, r6(oof), r6(smooth))
    }.sortBy(r => (r._1, r._2))
    val got = q("q230_target_encoding")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == expected)
    // leakage check is structural: folds of one segment get DIFFERENT
    // encodings exactly because each excludes different rows
    assert(got.groupBy(_._1).forall(_._2.map(_._4).distinct.size > 1),
           "fold-invariant encoding — own-fold exclusion not happening")
  }

  test("q231 mutual information matches a direct cell recomputation") {
    val evs = Tables(spark, sf, "events")
      .select(col("event_type"),
              get_json_object(col("props"), "$.k").cast("long") / 10)
      .as[(String, Double)].collect().toSeq.map(r => (r._1, r._2.toLong))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = evs.size.toDouble
    val cells = evs.groupBy(identity).map { case (k, g) => (k, g.size) }
    val cx = evs.groupBy(_._1).map { case (k, g) => (k, g.size) }
    val cy = evs.groupBy(_._2).map { case (k, g) => (k, g.size) }
    def decSum(ts: Iterable[Double]): Double =
      ts.map(t => BigDecimal(r6(t))).sum.toDouble
    val smi = decSum(cells.map { case ((x, y), c) =>
      c * math.log(n * c / (cx(x).toDouble * cy(y).toDouble)) })
    val sx = decSum(cells.map { case ((x, _), c) =>
      c * math.log(cx(x).toDouble) })
    val sy = decSum(cells.map { case ((_, y), c) =>
      c * math.log(cy(y).toDouble) })
    val (hx, hy) = (math.log(n) - sx / n, math.log(n) - sy / n)
    val expected = (evs.size.toLong, cells.size.toLong, r6(smi / n),
                    r6(hx), r6(hy), r6((smi / n) / math.sqrt(hx * hy)))
    val got = q("q231_mutual_info")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(got == expected)
    assert(got._3 >= 0.0 && got._6 <= 1.0, s"MI out of range: $got")
  }

  test("q233 EWMA spike screen matches a sequential BigInt fold") {
    // independent semantics: walk each type's series in order keeping
    // the last 32 values, recompute the weighted pair directly
    val evs = Tables(spark, sf, "events")
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")),
              round(col("value") * 100).cast("long"))
      .as[(String, Long, Long, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = evs.groupBy(_._1).toSeq.map { case (t, g) =>
      val cs = g.sortBy(e => (e._3, e._2)).map(_._4)
      var spikes = 0L
      var lastEwma = 0.0
      for (i <- cs.indices) {
        val prev = cs.slice(math.max(0, i - 32), i).reverse
        val (numP, denP) = prev.zipWithIndex.map { case (c, j) =>
          (BigInt(c) * BigInt(1L << (31 - j)), BigInt(1L << (31 - j)))
        }.foldLeft((BigInt(0), BigInt(0))) { case ((a, b), (x, y)) =>
          (a + x, b + y) }
        if (denP > 0 && BigInt(cs(i)) * denP > numP * 2) spikes += 1
        val incl = cs.slice(math.max(0, i - 31), i + 1).reverse
        val (numI, denI) = incl.zipWithIndex.map { case (c, j) =>
          (BigInt(c) * BigInt(1L << (31 - j)), BigInt(1L << (31 - j)))
        }.foldLeft((BigInt(0), BigInt(0))) { case ((a, b), (x, y)) =>
          (a + x, b + y) }
        if (i == cs.indices.last)
          lastEwma = r6(numI.toDouble / denI.toDouble / 100.0)
      }
      val avg = r6(cs.map(BigInt(_)).sum.toDouble / cs.size / 100.0)
      (t, cs.size.toLong, spikes, lastEwma, avg)
    }.sortBy(_._1)
    val got = q("q233_ewma_spikes")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == expected)
    assert(got.exists(_._3 > 0L), "no spike anywhere — screen vacuous")
  }

  test("q234 association rules match a brute-force basket walk") {
    val it = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .as[(Long, String)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nOrders = it.map(_._1).distinct.size.toLong
    val sup = it.groupBy(_._2).map { case (b, g) => b -> g.size.toLong }
    val pairs = it.groupBy(_._1).values.toSeq.flatMap { basket =>
      val bs = basket.map(_._2).sorted
      for (i <- bs.indices; j <- (i + 1) until bs.size) yield (bs(i), bs(j))
    }.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      .filter(_._2 >= 5L)
    val expected = pairs.toSeq.map { case ((b1, b2), ab) =>
      val (sa, sb) = (sup(b1), sup(b2))
      (b1, b2, ab, sa, sb, r6(ab.toDouble / sa), r6(ab.toDouble / sb),
       r6(ab.toDouble * nOrders / (sa.toDouble * sb.toDouble)))
    }.sortBy(r => (-r._8, r._1, r._2)).take(20)
    val got = q("q234_basket_rules")
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "no rule above min-support — vacuous")
  }

  test("q235 variant shred agrees with the schema-ful from_json path") {
    // two parse stacks over the same payload: open-schema VARIANT vs
    // q35's typed map — identical buckets, and the drift probe is all-null
    val viaMap = Tables(spark, sf, "events")
      .select((get_json_object(col("props"), "$.k").cast("long") / 10)
                .cast("long").as("bucket"),
              col("event_type"),
              round(col("value") * 100).cast("long").as("cents"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
           countDistinct(col("event_type")).as("types"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val got = q("q235_variant_shred")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == viaMap)
    assert(got.forall(_._4 == 0L), "missing-key probe hit something")
  }

  test("q236 feature-hash buckets match a JVM md5 recomputation") {
    val rows = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
            col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("c_nationkey").cast("string"),
              col("o_orderpriority"),
              round(col("o_totalprice") * 100).cast("long"))
      .as[(String, String, String, Long)].collect().toSeq
    def bucket(fv: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(fv.getBytes("UTF-8"))
      val hex = dig.take(2).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 64
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val fvs = rows.flatMap { case (seg, nat, pri, c) =>
      Seq((s"seg=$seg", c), (s"nat=$nat", c), (s"pri=$pri", c)) }
    val expected = fvs.groupBy(f => bucket(f._1)).toSeq.map {
      case (b, g) =>
        (b, g.size.toLong, g.map(_._1).distinct.size.toLong,
         r6(g.map(r => BigInt(r._2)).sum.toDouble / 100.0),
         if (g.map(_._1).distinct.size > 1) 1L else 0L)
    }.sortBy(_._1)
    val got = q("q236_feature_hash")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == rows.size * 3L)
  }

  test("q237 Kaplan-Meier matches a sequential product fold") {
    val evs = Tables(spark, sf, "events")
      .select(col("user_id"),
              col("event_type") === "purchase" &&
                get_json_object(col("props"), "$.k").cast("long") < 5,
              unix_micros(col("ts")))
      .as[(Long, Boolean, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cut = evs.map(_._3).max
    val life = evs.groupBy(_._1).values.toSeq.map { g =>
      val first = g.map(_._3).min
      val p = g.filter(_._2).map(_._3).minOption
      p match {
        case Some(pu) => ((pu - first) / 86400000000L, 1L)
        case None     => ((cut - first) / 86400000000L, 0L)
      }
    }
    val total = life.size.toLong
    val steps = life.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      (t, g.size.toLong, g.map(_._2).sum) }
    var atRiskBefore = total
    var sv = 1.0
    val expected = steps.flatMap { case (t, ct, dth) =>
      val n = atRiskBefore
      atRiskBefore -= ct
      if (dth > 0) {
        sv = sv * ((n - dth).toDouble / n.toDouble)
        Some((t, n, dth, r6(sv)))
      } else None
    }
    val got = q("q237_km_survival")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.last._4 < 1.0)
    // censoring must actually occur for the estimator to differ from
    // a plain conversion curve
    assert(life.exists(_._2 == 0L), "no censored user — KM vacuous")
  }

  test("q238 reciprocal-best pairs are mutual argmaxes of exact Jaccard") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
      .map { case (id, t) =>
        (id, t.take(20), t.split(" ").filter(_.nonEmpty).toSet) }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byBlk = docs.groupBy(_._2).filter(_._2.size <= 64)
    val cand = byBlk.values.toSeq.flatMap { g =>
      for (a <- g; b <- g if a._1 < b._1) yield {
        val inter = (a._3 & b._3).size
        (a._1, b._1, r6(inter.toDouble / (a._3.size + b._3.size - inter)))
      }
    }
    val dirs = cand.flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }
    val best = dirs.groupBy(_._1).map { case (id, g) =>
      id -> g.minBy(r => (-r._3, r._2))._2 }
    val expected = cand.filter { case (a, b, _) =>
      best(a) == b && best(b) == a }.sortBy(_._1)
      .map { case (a, b, j) => (a, b, j) }
    val got = q("q238_reciprocal_match")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "no mutual pair at sf0.001 — vacuous")
    // anti-hub property: every doc appears at most once per side
    assert(got.map(_._1).distinct.size == got.size)
    assert(got.map(_._2).distinct.size == got.size)
  }

  test("q239 quantile map is monotone and hits exact target order stats") {
    val sup = Tables(spark, sf, "supplier")
      .select(round(col("s_acctbal") * 100).cast("long"))
      .as[Long].collect().toSeq.sorted
    val cus = Tables(spark, sf, "customer")
      .select(round(col("c_acctbal") * 100).cast("long"))
      .as[Long].collect().toSeq.sorted
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (ns, nc) = (sup.size.toLong, cus.size.toLong)
    val expected = sup.groupBy(identity).toSeq.sortBy(_._1).map {
      case (v, g) =>
        val cum = sup.count(_ <= v).toLong
        val k = ((cum * nc + ns - 1) / ns).toInt
        (r6(v.toDouble / 100.0), g.size.toLong,
         r6(cus(k - 1).toDouble / 100.0))
    }
    val got = q("q239_quantile_norm")
      .as[(Double, Long, Double)].collect().toSeq
    assert(got == expected)
    // monotone: higher source balance never maps lower
    assert(got.map(_._3) == got.map(_._3).sorted)
  }

  test("q240 class balance caps every language at the min class size") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSeq
    def h(id: Long): String = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      dig.map(b => f"$b%02x").mkString
    }
    val m = docs.groupBy(_._2).values.map(_.size).min
    val expected = docs.groupBy(_._2).toSeq.map { case (lang, g) =>
      val kept = g.sortBy(r => (h(r._1), r._1)).take(m)
      (lang, kept.size.toLong, kept.map(_._3).sum,
       kept.map(r => h(r._1)).min)
    }.sortBy(_._1)
    val got = q("q240_class_balance")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._2).distinct == Seq(m.toLong), "classes not equal-size")
  }

  test("q241 containment catches a subset pair Jaccard would miss") {
    val got = q("q241_containment_dedup")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.forall(r => r._3 >= 0.9))
    assert(got.forall(r => r._3 >= r._4 - 1e-9),
           "containment below jaccard — direction inverted")
    // the operator's reason to exist: at least one asymmetric pair
    // (high containment, materially lower jaccard)
    assert(got.exists(r => r._4 <= r._3 - 0.05),
           s"no asymmetric pair found: $got")
  }

  test("q242 novelty: first source claiming every gram nets it exactly once") {
    val rows = q("q242_gram_novelty")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    // total novel grams across sources == corpus distinct gram count
    val distinctGrams = Tables(spark, sf, "documents")
      .select(col("doc_id"),
              org.apache.spark.sql.graft.GraftFunctions
                .ngrams(split(col("text"), " "), 8).as("g"))
      .select(md5(col("g"))).distinct().count()
    assert(rows.map(_._4).sum == distinctGrams)
    assert(rows.forall(r => r._4 <= r._3 && r._5 >= 0.0 && r._5 <= 1.0))
  }

  test("q243 PMI pairs match a direct pair-margin recomputation") {
    val texts = Tables(spark, sf, "documents")
      .select(col("text")).as[String].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pairs = texts.flatMap { t =>
      val ts = t.split(" ").filter(_.nonEmpty)
      ts.indices.flatMap { i =>
        Seq(i + 1, i + 2).filter(_ < ts.size).map { j =>
          val (a, b) = (ts(i), ts(j))
          if (a <= b) (a, b) else (b, a)
        }
      }
    }
    val cell = pairs.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val marg = cell.toSeq.flatMap { case ((a, b), c) => Seq((a, c), (b, c)) }
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
    val n = cell.values.sum.toDouble
    val expected = cell.filter(_._2 >= 10L).toSeq.map { case ((a, b), c) =>
      (a, b, c, r6(math.log(4.0 * c * n / (marg(a).toDouble * marg(b).toDouble))))
    }.sortBy(r => (-r._4, r._1, r._2)).take(20)
    val got = q("q243_pmi_pairs")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("q244 checksum is stable, partition-immune, and content-sensitive") {
    val base = q("q244_table_checksum")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(base.map(_._1) == Seq("customer", "lineitem", "orders"))
    assert(base.find(_._1 == "orders").get._2 ==
             Tables(spark, sf, "orders").count())
    // order-free sum: a repartitioned recomputation is bit-identical
    val again = q("q244_table_checksum")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(base == again)
    // content-sensitive: dropping one order's md5 word from the exact
    // sum must change the published checksum
    val one = Tables(spark, sf, "orders")
      .select(concat_ws("|", col("o_orderkey"), col("o_custkey"),
              round(col("o_totalprice") * 100).cast("long"),
              col("o_orderstatus"), col("o_orderpriority")))
      .as[String].head()
    val word = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(one.getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString, 16)
    assert(word != 0L,
      "degenerate zero md5 word — drop-one insensitivity possible")
    val full = base.find(_._1 == "orders").get
    assert(full._3 - word != full._3)
  }

  test("q245 PK shortcut emits exactly the general formula's numbers") {
    val got = q("q245_join_size_pk")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // the certified branch must actually certify; the self-join must not
    assert(got("customer_orders")._4 == 1L)
    assert(got("events_self_user")._4 == 0L)
    // recompute the general sum/max formula directly for both joins
    def counts(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col(c)).as[Long].collect().toSeq
        .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val cust = counts(Tables(spark, sf, "customer"), "c_custkey")
    val ord = counts(Tables(spark, sf, "orders"), "o_custkey")
    val ev = counts(Tables(spark, sf, "events"), "user_id")
    def general(a: Map[Long, Long], b: Map[Long, Long]) = {
      val shared = a.keySet & b.keySet
      (shared.size.toLong, shared.toSeq.map(k => a(k) * b(k)).sum,
       shared.toSeq.map(k => a(k) * b(k)).max)
    }
    val co = general(cust, ord)
    assert((got("customer_orders")._5, got("customer_orders")._6,
            got("customer_orders")._7) == co,
           "shortcut numbers diverge from the general formula")
    val ee = general(ev, ev)
    assert((got("events_self_user")._5, got("events_self_user")._6,
            got("events_self_user")._7) == ee)
  }

  test("q246 incremental novelty agrees with a set recomputation") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().toSeq
    def grams(t: String): Set[String] = {
      val ts = t.split(" ")
      if (ts.length < 8) Set.empty
      else ts.sliding(8).map { w =>
        val dig = java.security.MessageDigest.getInstance("MD5")
          .digest(w.mkString(" ").getBytes("UTF-8"))
        dig.map(b => f"$b%02x").mkString
      }.toSet
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val base = docs.filter(_._1 % 2 == 0).flatMap(d => grams(d._3)).toSet
    val batch = docs.filter(_._1 % 2 == 1)
      .map(d => (d._1, d._2, grams(d._3))).filter(_._3.nonEmpty)
    val claims = batch.flatMap { case (id, _, g) =>
      g.filterNot(base).map(_ -> id) }
      .groupBy(_._1).map { case (m, g) => m -> g.map(_._2).min }
    val expected = batch.groupBy(_._2).toSeq.map { case (src, g) =>
      val bg = g.map(_._3.size.toLong).sum
      val nv = g.map { case (id, _, gs) =>
        gs.count(m => claims.get(m).contains(id)).toLong }.sum
      (src, g.size.toLong, bg, nv, r6(nv.toDouble / bg.toDouble))
    }.sortBy(_._1)
    val got = q("q246_novelty_incremental")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.exists(_._4 > 0L), "no novel gram in any batch — vacuous")
  }

  test("q232 Kendall tau-b matches a brute-force pair walk") {
    val rev = Tables(spark, sf, "lineitem")
      .select(col("l_suppkey"), col("l_shipdate").cast("string"),
              round(col("l_extendedprice") * 100).cast("long"))
      .as[(Long, String, Long)].collect().toSeq
      .groupBy(_._1).toSeq.map { case (sk, g) =>
        (sk, g.filter(_._2 < "1998-01-01").map(_._3).sum,
         g.filter(_._2 >= "1998-01-01").map(_._3).sum)
      }
    val pairs = for (a <- rev; b <- rev if a._1 < b._1)
      yield (math.signum((a._2 - b._2).toDouble).toInt,
             math.signum((a._3 - b._3).toDouble).toInt)
    val conc = pairs.count(p => p._1 * p._2 == 1).toLong
    val disc = pairs.count(p => p._1 * p._2 == -1).toLong
    val tieA = pairs.count(p => p._1 == 0 && p._2 != 0).toLong
    val tieB = pairs.count(p => p._1 != 0 && p._2 == 0).toLong
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tau = r6((conc - disc).toDouble /
      math.sqrt((conc + disc + tieA).toDouble * (conc + disc + tieB).toDouble))
    val got = q("q232_kendall_tau")
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(got == ((pairs.size.toLong, conc, disc, tieA, tieB, tau)))
  }

  test("q247 Mann-Whitney matches a brute-force rank walk") {
    val vals = Tables(spark, sf, "events")
      .where(col("event_type").isin("view", "purchase"))
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val na = vals.count(_._1 == "view").toLong
    val nb = vals.count(_._1 == "purchase").toLong
    val n = na + nb
    var ra2 = BigInt(0); var tt = BigInt(0)
    for ((v, g) <- vals.groupBy(_._2)) {
      val t = g.size.toLong
      val cum = vals.count(_._2 < v).toLong
      ra2 += BigInt(g.count(_._1 == "view")) * (2L * cum + t + 1L)
      tt += BigInt(t) * t * t - t
    }
    val u2 = (ra2 - BigInt(na) * (na + 1)).toLong
    val ties = tt.toDouble
    val rb = r6(u2.toDouble / (na.toDouble * nb.toDouble) - 1.0)
    val nD = n.toDouble
    val z = r6((u2.toDouble - na.toDouble * nb.toDouble) /
      math.sqrt(na.toDouble * nb.toDouble * (nD * nD * nD - nD - ties) /
                (nD * (nD - 1.0) * 3.0)))
    val got = q("q247_mann_whitney")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(got == ((na, nb, u2, ties, rb, z)))
  }

  test("q248 log-rank matches a sequential hypergeometric fold") {
    val evs = Tables(spark, sf, "events")
      .select(col("user_id"),
              col("event_type") === "purchase" &&
                get_json_object(col("props"), "$.k").cast("long") < 5,
              unix_micros(col("ts")))
      .as[(Long, Boolean, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cut = evs.map(_._3).max
    val life = evs.groupBy(_._1).toSeq.map { case (uid, g) =>
      val first = g.map(_._3).min
      val (dur, death) = g.filter(_._2).map(_._3).minOption match {
        case Some(pu) => ((pu - first) / 86400000000L, 1L)
        case None     => ((cut - first) / 86400000000L, 0L)
      }
      (dur, death, if (md5hex(uid.toString).head <= '7') 0L else 1L)
    }
    val total = life.size.toLong
    val total1 = life.map(_._3).sum
    var atRisk = total; var atRisk1 = total1
    var o1 = 0L; var nSteps = 0L
    var e1s = BigDecimal(0); var vs = BigDecimal(0)
    for ((dur, g) <- life.groupBy(_._1).toSeq.sortBy(_._1)) {
      val (ct, dth) = (g.size.toLong, g.map(_._2).sum)
      val (ct1, dth1) = (g.map(_._3).sum,
                         g.filter(_._2 == 1L).map(_._3).sum)
      val (n, n1) = (atRisk, atRisk1)
      if (dth > 0) {
        nSteps += 1; o1 += dth1
        e1s += BigDecimal(r6(dth.toDouble * n1.toDouble / n.toDouble))
        if (n > 1)
          vs += BigDecimal(r6(dth.toDouble * n1.toDouble / n.toDouble *
            (n.toDouble - n1.toDouble) / n.toDouble *
            (n.toDouble - dth.toDouble) / (n.toDouble - 1.0)))
      }
      atRisk -= ct; atRisk1 -= ct1
    }
    val (e1d, vd) = (e1s.toDouble, vs.toDouble)
    val got = q("q248_logrank")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(got == ((nSteps, total, total1, o1, r6(e1d), r6(vd),
      r6((o1.toDouble - e1d) / math.sqrt(vd)),
      r6((o1.toDouble - e1d) * (o1.toDouble - e1d) / vd))))
  }

  test("q249 Spearman matches a brute-force doubled-rank recomputation") {
    val rev = Tables(spark, sf, "lineitem")
      .select(col("l_suppkey"), col("l_shipdate").cast("string"),
              round(col("l_extendedprice") * 100).cast("long"))
      .as[(Long, String, Long)].collect().toSeq
      .groupBy(_._1).toSeq.map { case (sk, g) =>
        (g.filter(_._2 < "1998-01-01").map(_._3).sum,
         g.filter(_._2 >= "1998-01-01").map(_._3).sum)
      }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (va, vb) = (rev.map(_._1), rev.map(_._2))
    def r2of(vs: Seq[Long], v: Long) =
      2L * vs.count(_ < v) + vs.count(_ == v) + 1L
    val pairs = rev.map(r => (r2of(va, r._1), r2of(vb, r._2)))
    val n = pairs.size.toLong
    val sx = pairs.map(p => BigInt(p._1)).sum
    val sy = pairs.map(p => BigInt(p._2)).sum
    val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
    val syy = pairs.map(p => BigInt(p._2) * p._2).sum
    val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
    val fr2 = pairs.map(p => math.abs(p._1 - p._2)).sum
    val rho = r6((n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
                (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble)))
    val got = q("q249_spearman").as[(Long, Double, Long)].collect().head
    assert(got == ((n, rho, fr2)))
  }

  test("q250 lead-lag matches a brute-force shifted-series walk") {
    val ev = Tables(spark, sf, "events")
      .select(to_date(col("ts")).cast("string"), col("event_type"))
      .as[(String, String)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val daily = ev.groupBy(_._1).map { case (day, g) =>
      (java.time.LocalDate.parse(day),
       (g.count(_._2 == "view").toLong, g.count(_._2 == "purchase").toLong))
    }
    val expected = (0 to 6).map { lag =>
      val pts = daily.toSeq.flatMap { case (day, (x, _)) =>
        daily.get(day.plusDays(lag)).map { case (_, y) => (x, y) } }
      val n = pts.size.toLong
      val sx = pts.map(p => BigInt(p._1)).sum
      val sy = pts.map(p => BigInt(p._2)).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val syy = pts.map(p => BigInt(p._2) * p._2).sum
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum
      val r = r6((n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
                  (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble)))
      (lag, n, r)
    }
    val rmax = expected.map(_._3).max
    val best = expected.filter(_._3 == rmax).map(_._1).min
    val want = expected.map { case (lag, n, r) =>
      (lag, n, r, if (lag == best) 1 else 0) }
    val got = q("q250_lead_lag").as[(Int, Long, Double, Int)]
      .collect().toSeq
    assert(got == want)
  }

  test("q251 ANOVA matches a brute-force sums-of-squares decomposition") {
    val vals = Tables(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val groups = vals.groupBy(_._1).values.toSeq
    val k = groups.size.toLong
    val nTot = vals.size.toLong
    val sAll = vals.map(v => BigInt(v._2)).sum
    val tAll = vals.map(v => BigInt(v._2) * v._2).sum
    val a = groups.map { g =>
      val sv = g.map(v => BigInt(v._2)).sum
      BigDecimal(r6(sv.toDouble * sv.toDouble / g.size.toDouble))
    }.sum
    val ssb = r6(a.toDouble - sAll.toDouble * sAll.toDouble / nTot.toDouble)
    val ssw = r6(tAll.toDouble - a.toDouble)
    val f = r6((ssb / (k - 1).toDouble) / (ssw / (nTot - k).toDouble))
    val eta = r6(ssb / (ssb + ssw))
    val got = q("q251_anova")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(got == ((k, nTot, ssb, ssw, f, eta)))
  }

  test("q252 CUPED matches a brute-force moment recomputation") {
    val evs = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
              col("ts") < lit("2024-01-16").cast("timestamp"),
              round(col("value") * 100).cast("long"))
      .as[(Long, String, Boolean, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val users = evs.groupBy(_._1).toSeq.map { case (uid, g) =>
      val x = g.filter(e => e._2 == "purchase" && e._3).map(_._4).sum
      val y = g.filter(e => e._2 == "purchase" && !e._3).map(_._4).sum
      (if (md5hex(uid.toString).head <= '7') "c" else "t", x, y)
    }
    def mom(arm: String) = {
      val g = users.filter(_._1 == arm)
      (g.size.toLong, g.map(u => BigInt(u._2)).sum,
       g.map(u => BigInt(u._3)).sum, g.map(u => BigInt(u._2) * u._2).sum,
       g.map(u => BigInt(u._3) * u._3).sum,
       g.map(u => BigInt(u._2) * u._3).sum)
    }
    val (nc, sxc, syc, sxxc, syyc, sxyc) = mom("c")
    val (nt, sxt, syt, sxxt, syyt, sxyt) = mom("t")
    val nn = (nc + nt).toDouble
    val px = (sxc + sxt).toDouble; val py = (syc + syt).toDouble
    val pxx = (sxxc + sxxt).toDouble; val pyy = (syyc + syyt).toDouble
    val pxy = (sxyc + sxyt).toDouble
    val cxy = nn * pxy - px * py
    val vx = nn * pxx - px * px; val vy = nn * pyy - py * py
    val theta = r6(cxy / vx)
    val diffRaw = r6((syt.toDouble / nt.toDouble -
                      syc.toDouble / nc.toDouble) / 100.0)
    val diffCuped = r6((syt.toDouble / nt.toDouble -
                        syc.toDouble / nc.toDouble -
                        theta * (sxt.toDouble / nt.toDouble -
                                 sxc.toDouble / nc.toDouble)) / 100.0)
    val vr = r6(cxy * cxy / (vx * vy))
    val got = q("q252_cuped")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(got == ((nc, nt, diffRaw, theta, diffCuped, vr)))
  }

  test("q253 average precision matches a brute-force tie-block walk") {
    val lab = Tables(spark, sf, "orders").as("o")
      .join(Tables(spark, sf, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority").as("prio"),
               round(col("o_totalprice") * 100).cast("long").as("v"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("p"))
      .select(col("prio"), col("v"), col("p"))
      .as[(String, Long, Int)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = lab.groupBy(_._1).toSeq.map { case (prio, g) =>
      val blocks = g.groupBy(_._2).toSeq.sortBy(-_._1)
      var cp = 0L; var ct = 0L; var ap = BigDecimal(0)
      for ((_, blk) <- blocks) {
        val npos = blk.map(_._3).sum.toLong
        cp += npos; ct += blk.size
        ap += BigDecimal(r6(npos.toDouble * cp.toDouble / ct.toDouble))
      }
      val np = g.map(_._3).sum.toLong; val nt = g.size.toLong
      (prio, np, nt, r6(np.toDouble / nt.toDouble),
       if (np > 0) r6(ap.toDouble / np.toDouble) else Double.NaN)
    }.sortBy(_._1)
    val got = q("q253_avg_precision")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == want)
  }

  test("q254 BH-FDR matches a brute-force step-up walk") {
    val orders = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
            col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sf, "nation"),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_totalprice") > 450000)
      .as[(String, Boolean)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cells = orders.groupBy(_._1).toSeq.map { case (nm, g) =>
      (nm, g.size.toLong, g.count(_._2).toLong) }
    val m = cells.size
    val (nAll, xAll) = (cells.map(_._2).sum, cells.map(_._3).sum)
    val scored = cells.map { case (nm, n, x) =>
      val (nr, xr) = (nAll - n, xAll - x)
      val pp = (x.toDouble + xr.toDouble) / (n.toDouble + nr.toDouble)
      val z = (x.toDouble / n.toDouble - xr.toDouble / nr.toDouble) /
        math.sqrt(pp * (1.0 - pp) * (1.0 / n.toDouble + 1.0 / nr.toDouble))
      val az = math.abs(z)
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val pval = r6(2.0 * math.exp(az * az * -0.5) * 0.3989422804014327 *
        ((((1.330274429 * t + -1.821255978) * t + 1.781477937) * t +
          -0.356563782) * t + 0.319381530) * t)
      (nm, n, x, r6(x.toDouble / n.toDouble), r6(z), pval)
    }.sortBy(s => (s._6, s._1))
    val flags = scored.zipWithIndex.map { case (s, i) =>
      if (s._6 <= (i + 1).toDouble * 0.05 / m.toDouble) 1 else 0 }
    val want = scored.zipWithIndex.map { case (s, i) =>
      (s._1, s._2, s._3, s._4, s._5, s._6, i + 1, flags.drop(i).max) }
    val got = q("q254_bh_fdr")
      .as[(String, Long, Long, Double, Double, Double, Int, Int)]
      .collect().toSeq
    assert(got == want)
  }

  test("q255 elasticity matches a brute-force log-log OLS") {
    val rows = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part"),
            col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_extendedprice"), col("l_quantity"))
      .as[(String, Double, Double)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = rows.groupBy(_._1).toSeq.map { case (brand, g) =>
      val pts = g.map { case (_, ep, qty) =>
        (BigDecimal(r6(math.log(math.round(ep / qty * 100).toDouble))),
         BigDecimal(r6(math.log(qty)))) }
      val n = pts.size.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val cxy = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val vx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      val vy = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
      (brand, n, r6(cxy / vx), r6(cxy * cxy / (vx * vy)))
    }.sortBy(_._1)
    val got = q("q255_elasticity")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == want)
  }

  test("q256 seasonal index matches a brute-force centered-MA walk") {
    val ev = Tables(spark, sf, "events")
      .where(col("event_type") === "purchase")
      .select(to_date(col("ts")).cast("string"),
              round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cells = ev.groupBy(_._1).toSeq
      .map { case (d, g) => (java.time.LocalDate.parse(d),
                             g.map(_._2).sum) }
      .sortBy(_._1.toEpochDay)
    val ratios = (3 until cells.size - 3).flatMap { i =>
      val win = cells.slice(i - 3, i + 4)
      val span = win.last._1.toEpochDay - win.head._1.toEpochDay
      if (span == 6) {
        val s7 = win.map(_._2).sum
        val (day, c) = cells(i)
        Some(((day.toEpochDay - java.time.LocalDate
                 .parse("1970-01-05").toEpochDay) % 7,
              BigDecimal(r6(c.toDouble * 7.0 / s7.toDouble))))
      } else None
    }
    val want = ratios.groupBy(_._1).toSeq.map { case (dow, g) =>
      (dow, g.size.toLong,
       r6(g.map(_._2).sum.toDouble / g.size.toDouble)) }.sortBy(_._1)
    val got = q("q256_seasonal_index")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q257 time-decay attribution matches a brute-force credit walk") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
              unix_micros(col("ts")))
      .as[(Long, Long, String, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byUser = ev.groupBy(_._1)
    val weights = byUser.values.toSeq.flatMap { g =>
      val ps = g.filter(_._3 == "purchase")
      val ts = g.filter(e => e._3 == "view" || e._3 == "click")
      ps.flatMap { case (_, pid, _, pts) =>
        ts.filter(t => t._4 < pts && t._4 >= pts - 7L * 86400000000L)
          .map { case (_, _, ch, tts) =>
            val dday = math.floor((pts - tts).toDouble / 86400000000L)
            (pid, ch, BigDecimal(r6(math.pow(0.5, dday / 7.0)))) }
      }
    }
    val wsum = weights.groupBy(_._1)
      .map { case (pid, g) => (pid, g.map(_._3).sum) }
    val shares = weights.map { case (pid, ch, w) =>
      (pid, ch, BigDecimal(r6(w.toDouble / wsum(pid).toDouble))) }
    val want = shares.groupBy(_._2).toSeq.map { case (ch, g) =>
      (ch, g.size.toLong, g.map(_._1).distinct.size.toLong,
       r6(g.map(_._3).sum.toDouble)) }.sortBy(_._1)
    val got = q("q257_attribution_decay")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q258 forecast backtest matches a brute-force error walk") {
    val ev = Tables(spark, sf, "events")
      .select(col("event_type"), to_date(col("ts")).cast("string"))
      .as[(String, String)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cells = ev.groupBy(identity).map { case ((t, d), g) =>
      ((t, java.time.LocalDate.parse(d)), g.size.toLong) }
    val maxDay = cells.keys.map(_._2.toEpochDay).max
    val pairs = cells.toSeq.flatMap { case ((t, d), c) =>
      if (d.toEpochDay > maxDay - 14)
        cells.get((t, d.minusDays(7))).map(f => (t, c, f))
      else None
    }
    val want = pairs.groupBy(_._1).toSeq.map { case (t, g) =>
      val n = g.size.toLong
      val aes = g.map(p => math.abs(p._2 - p._3))
      val mape = g.map(p => BigDecimal(
        r6(math.abs(p._2 - p._3).toDouble / p._2.toDouble))).sum
      val smape = g.map(p => BigDecimal(
        r6(math.abs(p._2 - p._3).toDouble * 2.0 /
           (p._2.toDouble + p._3.toDouble)))).sum
      (t, n, aes.sum, r6(aes.sum.toDouble / n.toDouble),
       r6(mape.toDouble / n.toDouble), r6(smape.toDouble / n.toDouble))
    }.sortBy(_._1)
    val got = q("q258_forecast_backtest")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == want)
  }

  test("q259 readability matches a brute-force Flesch recomputation") {
    val docs = Tables(spark, sf, "documents")
      .select(col("lang"), col("text")).as[(String, String)]
      .collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scored = docs.map { case (lang, text) =>
      val words = text.split(" ").count(_.nonEmpty).toLong
      val lo = text.toLowerCase
      val syll = (lo.replaceAll("[aeiouy]+", "#").length -
                  lo.replaceAll("[aeiouy]+", "").length).toLong
      val sents = math.max(1L, text.count(c => ".!?".contains(c)).toLong)
      (lang, BigDecimal(r6(206.835 -
        1.015 * words.toDouble / sents.toDouble -
        84.6 * syll.toDouble / words.toDouble)))
    }
    val want = scored.groupBy(_._1).toSeq.map { case (lang, g) =>
      (lang, g.size.toLong,
       r6(g.map(_._2).sum.toDouble / g.size.toDouble),
       r6(g.count(_._2 < 30).toDouble / g.size.toDouble))
    }.sortBy(_._1)
    val got = q("q259_readability")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == want)
  }

  test("q260 Zipf fit matches a brute-force rank-frequency OLS") {
    val toks = Tables(spark, sf, "documents")
      .select(col("text")).as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty).toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val counts = toks.groupBy(identity).toSeq
      .map { case (t, g) => (t, g.size.toLong) }
      .sortBy { case (t, c) => (-c, t) }
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (BigDecimal(r6(math.log((i + 1).toDouble))),
       BigDecimal(r6(math.log(c.toDouble))), c) }
    val n = pts.size.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val cxy = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val vx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    val vy = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
    val got = q("q260_zipf_fit")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got == ((n, pts.map(_._3).sum, r6(cxy / vx),
                    r6(cxy * cxy / (vx * vy)))))
  }

  test("q261 template shingles match a brute-force majority walk") {
    val docs = Tables(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("text"))
      .as[(String, Long, String)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val g = docs.flatMap { case (src, id, text) =>
      text.split(" ").toSeq.sliding(5).filter(_.size == 5)
        .map(w => (src, id, md5hex(w.mkString(" ")))).toSet
    }.distinct
    val ndocs = docs.groupBy(_._1).map { case (s, d) =>
      (s, d.map(_._2).distinct.size.toLong) }
    val tpl = g.groupBy(x => (x._1, x._3))
      .filter { case ((src, _), occ) => occ.size * 2 > ndocs(src) }
      .keySet
    val perDoc = g.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((src, id), gs) =>
        val t = gs.count(x => tpl.contains((x._1, x._3))).toLong
        (src, t, BigDecimal(r6(t.toDouble / gs.size.toDouble))) }
    val want = perDoc.groupBy(_._1).toSeq.map { case (src, g2) =>
      (src, g2.size.toLong, g2.map(_._2).sum,
       r6(g2.map(_._3).sum.toDouble / g2.size.toDouble)) }.sortBy(_._1)
    val got = q("q261_template_shingles")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q262 source-mirror matches a brute-force set comparison") {
    val docs = Tables(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)]
      .collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sets = docs.groupBy(_._1).map { case (src, g) =>
      (src, g.flatMap(_._2.split(" ").toSeq.sliding(8)
                        .filter(_.size == 8).map(_.mkString(" "))).toSet)
    }
    val srcs = sets.keys.toSeq.sorted
    val want = (for {
      a <- srcs; b <- srcs if a < b
      inter = (sets(a) & sets(b)).size.toLong
    } yield (a, b, inter,
             r6(inter.toDouble /
                (sets(a).size + sets(b).size - inter).toDouble),
             r6(inter.toDouble /
                math.min(sets(a).size, sets(b).size).toDouble)))
      .sortBy { case (a, b, _, j, _) => (-j, a, b) }.take(20)
    val got = q("q262_source_mirror")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(got == want)
  }

  test("q263 CMH matches a brute-force stratified 2x2 walk") {
    val rows = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
            col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("c_custkey"),
              col("o_totalprice") > 450000)
      .as[(String, Long, Boolean)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cells = rows.groupBy(_._1).toSeq.map { case (_, g) =>
      val arm1 = g.filter(r => md5hex(r._2.toString).head <= '7')
      val arm0 = g.filterNot(r => md5hex(r._2.toString).head <= '7')
      (arm1.count(_._3).toLong, arm1.count(!_._3).toLong,
       arm0.count(_._3).toLong, arm0.count(!_._3).toLong)
    }
    var aSum = 0L
    var (eS, vS, rS, sS) = (BigDecimal(0), BigDecimal(0),
                            BigDecimal(0), BigDecimal(0))
    for ((a, b, c, e) <- cells) {
      val n = (a + b + c + e).toDouble
      val r1 = (a + b).toDouble; val c1 = (a + c).toDouble
      aSum += a
      eS += BigDecimal(r6(r1 * c1 / n))
      vS += BigDecimal(r6(r1 * c1 / n * (n - r1) / n * (n - c1) /
                          (n - 1.0)))
      rS += BigDecimal(r6(a.toDouble * e.toDouble / n))
      sS += BigDecimal(r6(b.toDouble * c.toDouble / n))
    }
    val (eD, vD) = (eS.toDouble, vS.toDouble)
    val got = q("q263_cmh_test")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().head
    assert(got == ((cells.size.toLong, aSum, r6(eD), r6(vD),
      r6((aSum.toDouble - eD) / math.sqrt(vD)),
      r6((aSum.toDouble - eD) * (aSum.toDouble - eD) / vD),
      r6(rS.toDouble / sS.toDouble))))
  }

  test("q264 power analysis matches a brute-force formula walk") {
    val pu = Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" &&
                      col("value") > 150, 1L).otherwise(0L)).as("conv"))
      .as[(Long, Long)].collect().toSeq
    val nDays = Tables(spark, sf, "events")
      .select(to_date(col("ts"))).distinct().count()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val users = pu.size.toLong
    val p0 = r6(pu.map(_._2).sum.toDouble / users.toDouble)
    val upd = r6(users.toDouble / nDays.toDouble)
    val want = Seq(0.01, 0.02, 0.05, 0.10).map { mde =>
      val p1 = p0 + mde
      val n = math.ceil((1.959964 + 0.841621) * (1.959964 + 0.841621) *
        (p0 * (1.0 - p0) + p1 * (1.0 - p1)) / (mde * mde)).toLong
      (mde, p0, r6(p1), n,
       math.ceil(n.toDouble * 2.0 / upd).toLong)
    }
    val got = q("q264_power_analysis")
      .as[(Double, Double, Double, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q265 negative sampling matches a brute-force ladder walk") {
    val toks = Tables(spark, sf, "documents")
      .select(col("text")).as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty).toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ladder = toks.groupBy(identity).toSeq
      .map { case (t, g) =>
        (t, (BigDecimal(r6(math.pow(g.size.toDouble, 0.75))) *
             1000000).toLongExact) }
      .sortBy(_._1)
      .scanLeft(("", 0L, 0L)) { case ((_, _, hi0), (t, wi)) =>
        (t, wi, hi0 + wi) }.drop(1)
    val tt = ladder.last._3
    val hits = (1 to 1000).map { i =>
      val u = java.lang.Long.parseLong(md5hex(i.toString).take(12), 16) % tt
      ladder.find(l => u >= l._3 - l._2 && u < l._3).get
    }
    val want = hits.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((t, wi), g) =>
        val exp = r6(1000.0 * wi.toDouble / tt.toDouble)
        (t, g.size.toLong, exp, r6(g.size.toDouble / exp)) }
      .sortBy { case (t, n, _, _) => (-n, t) }.take(20)
    val got = q("q265_neg_sampling")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == want)
  }

  test("q266 cross-validated NB matches a brute-force OOF scorer") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def fold(id: Long) =
      java.lang.Long.parseLong(md5hex(id.toString).take(4), 16) % 5
    val toks = docs.map { case (id, lang, text) =>
      (id, lang, fold(id), text.split(" ").filter(_.nonEmpty).toSeq) }
    val vsz = toks.flatMap(_._4).distinct.size.toLong
    val langs = docs.map(_._2).distinct.sorted
    val mdlTot = toks.flatMap(t => t._4.map(tok => ((t._2, tok), 1L)))
      .groupBy(_._1).map { case (k, g) => (k, g.size.toLong) }
    val mdlF = toks.flatMap(t => t._4.map(tok => ((t._2, tok, t._3), 1L)))
      .groupBy(_._1).map { case (k, g) => (k, g.size.toLong) }
    val clTot = mdlTot.groupBy(_._1._1)
      .map { case (l, g) => (l, g.values.sum) }
    val clF = mdlF.groupBy(k => (k._1._1, k._1._3))
      .map { case (k, g) => (k, g.values.sum) }
    val ndTot = docs.groupBy(_._2).map { case (l, g) => (l, g.size.toLong) }
    val ndF = toks.groupBy(t => (t._2, t._3))
      .map { case (k, g) => (k, g.size.toLong) }
    val nTot = docs.size.toLong
    val nF = toks.groupBy(_._3).map { case (f, g) => (f, g.size.toLong) }
    val correctByFold = toks.map { case (id, lang, f, ts) =>
      val cnts = ts.groupBy(identity).map { case (t, g) =>
        (t, g.size.toLong) }
      val ntok = ts.size.toLong
      val scored = langs.map { ml =>
        val cloof = clTot(ml) - clF.getOrElse((ml, f), 0L)
        val plp = BigDecimal(r6(math.log(
          (ndTot(ml) - ndF.getOrElse((ml, f), 0L)).toDouble /
            (nTot - nF(f)).toDouble)))
        val lp0 = BigDecimal(r6(math.log(1.0 / (cloof + vsz).toDouble)))
        var score = plp
        var matched = 0L
        for ((t, c) <- cnts) {
          val coof = mdlTot.getOrElse((ml, t), 0L) -
            mdlF.getOrElse((ml, t, f), 0L)
          if (coof > 0) {
            score += BigDecimal(c) * BigDecimal(r6(math.log(
              (coof + 1).toDouble / (cloof + vsz).toDouble)))
            matched += c
          }
        }
        (ml, score + BigDecimal(ntok - matched) * lp0)
      }
      val pred = scored.sortBy { case (ml, sc) => (-sc, ml) }.head._1
      (f, pred == lang)
    }
    val want = correctByFold.groupBy(_._1).toSeq.map { case (f, g) =>
      (f, g.size.toLong, g.count(_._2).toLong,
       r6(g.count(_._2).toDouble / g.size.toDouble)) }.sortBy(_._1)
    val got = q("q266_crossval_nb")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q267 stream alert matches a brute-force suppression walk") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")),
              round(col("value") * 100).cast("long"))
      .as[(Long, Long, Long)].collect().toSeq
    val want = ev.filter(_._3 > 18000)
      .map(e => (e._1, e._2 / 3600000000L)).distinct
      .groupBy(_._1).toSeq.flatMap { case (uid, g) =>
        g.map(_._2).sorted.zipWithIndex.map { case (h, i) =>
          (uid, new java.sql.Timestamp(h * 3600000L), i + 1) }
      }.sortBy(x => (x._1, x._2.getTime))
    val got = q("q267_stream_alert")
      .as[(Long, java.sql.Timestamp, Int)].collect().toSeq
    assert(got == want)
  }

  test("q268 stats artifact matches a brute-force histogram walk") {
    val vals = Tables(spark, sf, "orders")
      .select(round(col("o_totalprice") * 100).cast("long"))
      .as[Long].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sorted = vals.sorted
    val n = sorted.size.toLong
    val ndv = vals.distinct.size.toLong
    val want = (1 to 9).map { i =>
      val qv = i / 10.0
      val h = (n - 1).toDouble * qv
      val lo = sorted(math.floor(h).toInt).toDouble
      val hi = sorted(math.ceil(h).toInt).toDouble
      ("o_totalprice", s"d$i", n, ndv,
       r6(sorted.head.toDouble / 100.0), r6(sorted.last.toDouble / 100.0),
       r6((lo + (h - math.floor(h)) * (hi - lo)) / 100.0))
    }
    val got = q("q268_stats_artifact")
      .as[(String, String, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == want)
  }

  test("q269 item-kNN matches a brute-force cosine walk") {
    val items = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part"),
            col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
      .as[(Long, String)].collect().toSeq.distinct
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cnt = items.groupBy(_._2).map { case (b, g) => (b, g.size.toLong) }
    val byOrder = items.groupBy(_._1).values.map(_.map(_._2).toSet)
    val pairCnt = byOrder.toSeq.flatMap { bs =>
      bs.toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) } }
      .groupBy(identity).map { case (p, g) => (p, g.size.toLong) }
    val sym = pairCnt.toSeq.flatMap { case ((a, b), c) =>
      Seq((a, b, c), (b, a, c)) }
    val want = sym.map { case (b, nb, cij) =>
      (b, nb, cij, r6(cij.toDouble / math.sqrt(
        cnt(b).toDouble * cnt(nb).toDouble))) }
      .groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy(x => (-x._4, x._2)).take(3).zipWithIndex
          .map { case ((b, nb, c, cos), i) => (b, nb, c, cos, i + 1) } }
      .sortBy(x => (x._1, x._5))
    val got = q("q269_item_knn")
      .as[(String, String, Long, Double, Int)].collect().toSeq
    assert(got == want)
  }

  test("q270 sorted neighborhood matches a brute-force window walk") {
    val c = Tables(spark, sf, "customer")
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long"))
      .as[(Long, Long)].collect().toSeq
    val sorted = c.sortBy(x => (x._2, x._1))
    val want = sorted.zipWithIndex.flatMap { case ((k, bal), i) =>
      (1 to 3).flatMap { w =>
        sorted.lift(i + w).collect {
          case (k2, bal2) if bal2 - bal <= 10 => (k, k2, bal2 - bal) }
      }
    }.sortBy(x => (x._3, x._1, x._2)).take(30)
    val got = q("q270_sorted_neighborhood")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q271 DiD matches a brute-force delta walk") {
    val asia = Tables(spark, sf, "nation")
      .join(Tables(spark, sf, "region"),
            col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .select(col("n_nationkey")).as[Long].collect().toSet
    val cust = Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
      .as[(Long, Long)].collect().toSeq
    val ords = Tables(spark, sf, "orders")
      .select(col("o_custkey"),
              (col("o_orderdate") < lit("1998-01-01")),
              round(col("o_totalprice") * 100).cast("long"))
      .as[(Long, Boolean, Long)].collect().toSeq
      .groupBy(_._1)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    case class G(n: Long, spre: BigInt, spost: BigInt, sd: BigInt,
                 sdd: BigInt)
    val groups = cust.map { case (k, nk) =>
      val os = ords.getOrElse(k, Seq())
      val pre = os.filter(_._2).map(_._3).sum
      val post = os.filterNot(_._2).map(_._3).sum
      (asia.contains(nk), pre, post, post - pre)
    }.groupBy(_._1).map { case (t, g) =>
      t -> G(g.size.toLong, g.map(x => BigInt(x._2)).sum,
             g.map(x => BigInt(x._3)).sum, g.map(x => BigInt(x._4)).sum,
             g.map(x => BigInt(x._4) * BigInt(x._4)).sum)
    }
    val (g0, g1) = (groups(false), groups(true))
    def vr(g: G) = (BigInt(g.n) * g.sdd - g.sd * g.sd).toDouble /
                   (g.n * (g.n - 1)).toDouble
    val did = (g1.sd.toDouble / g1.n - g0.sd.toDouble / g0.n) / 100.0
    val se = math.sqrt(vr(g1) / g1.n + vr(g0) / g0.n) / 100.0
    val got = q("q271_diff_in_diff")
      .as[(Long, Long, Double, Double, Double, Double, Double, Double,
           Double)].collect().head
    assert(got == ((g0.n, g1.n,
      r6(g0.spre.toDouble / g0.n / 100.0),
      r6(g0.spost.toDouble / g0.n / 100.0),
      r6(g1.spre.toDouble / g1.n / 100.0),
      r6(g1.spost.toDouble / g1.n / 100.0),
      r6(did), r6(se), r6(did / se))))
  }

  test("q272 isotonic fit equals the sequential PAV algorithm") {
    val rows = Tables(spark, sf, "lineitem")
      .select(round(col("l_discount") * 100).cast("long"),
              (col("l_returnflag") === "R"))
      .as[(Long, Boolean)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bins = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, g) =>
      (s, g.size.toLong, g.count(_._2).toLong) }
    // the actual pool-adjacent-violators walk: merge blocks while a
    // violator exists (exact rational comparison) — this certifies the
    // query's minimax-identity formulation against the textbook
    // sequential algorithm, not against a re-derivation of itself
    val stack = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for ((_, w, pos) <- bins) {
      stack += ((w, pos))
      while (stack.size >= 2 &&
             stack(stack.size - 2)._2 * stack.last._1 >=
             stack.last._2 * stack(stack.size - 2)._1) {
        val b = stack.remove(stack.size - 1)
        val a = stack.remove(stack.size - 1)
        stack += ((a._1 + b._1, a._2 + b._2))
      }
    }
    val iso = stack.toSeq
    // expand blocks back over bins in order
    val perBin = scala.collection.mutable.ArrayBuffer[Double]()
    var bi = 0
    var rem = 0L
    var rate = 0.0
    for ((_, w, _) <- bins) {
      if (rem == 0) { rate = iso(bi)._2.toDouble / iso(bi)._1
                      rem = iso(bi)._1; bi += 1 }
      perBin += rate
      rem -= w
      assert(rem >= 0)
    }
    val want = bins.zip(perBin).map { case ((s, w, pos), ir) =>
      (s, w, r6(pos.toDouble / w), r6(ir)) }
    val got = q("q272_isotonic_calibration")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == want)
    // monotone non-decreasing by construction
    assert(got.map(_._4).sliding(2).forall(p => p.head <= p.last))
  }

  test("q273 caliper matching matches a brute-force nearest walk") {
    val spend = Tables(spark, sf, "orders")
      .select(col("o_custkey"), round(col("o_totalprice") * 100)
        .cast("long")).as[(Long, Long)].collect().toSeq
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val u = Tables(spark, sf, "customer")
      .select(col("c_custkey"), round(col("c_acctbal") * 100)
        .cast("long"), col("c_mktsegment") === "BUILDING")
      .as[(Long, Long, Boolean)].collect().toSeq
      .map { case (k, sc, tr) => (k, sc, tr, spend.getOrElse(k, 0L)) }
      .sortBy(x => (x._2, x._1))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val treated = u.zipWithIndex.filter(_._1._3)
    val picks = treated.map { case ((_, sc, _, out), i) =>
      val prev = u.take(i).reverse.find(!_._3)
      val next = u.drop(i + 1).find(!_._3)
      val dp = prev.map(p => sc - p._2)
      val dn = next.map(n => n._2 - sc)
      val (gap, mo) =
        if (dp.isDefined && (dn.isEmpty || dp.get <= dn.get))
          (dp, prev.map(_._4))
        else (dn, next.map(_._4))
      (out, gap, mo)
    }
    val ok = picks.filter(p => p._2.exists(_ <= 1000L))
    val att = ok.map(p => BigInt(p._1 - p._3.get)).sum.toDouble /
              ok.size / 100.0
    val gap = ok.map(p => BigInt(p._2.get)).sum.toDouble / ok.size
    val got = q("q273_propensity_match")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got == ((treated.size.toLong, ok.size.toLong,
      r6(ok.size.toDouble / treated.size), r6(att), r6(gap))))
  }

  test("q274 Shapley credits match a direct subset enumeration " +
       "and satisfy efficiency") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string"),
              col("event_type"))
      .as[(Long, String, String)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val units = ev.groupBy(u => (u._1, u._2)).values.map { g =>
      (g.map(_._3).filter(_ != "purchase").distinct.sorted,
       g.exists(_._3 == "purchase"))
    }.toSeq
    val stats = units.groupBy(_._1.mkString(","))
      .map { case (s, g) => s -> (g.size.toLong,
                                  g.count(_._2).toLong) }
    def v(sig: String) = stats.get(sig)
      .map { case (n, c) => c.toDouble / n }.getOrElse(0.0)
    val chans = ev.map(_._3).filter(_ != "purchase").distinct.sorted
    val k = chans.size
    def fact(n: Int): Long = (1 to n).map(_.toLong).product
    val want = chans.map { c =>
      val others = chans.filterNot(_ == c)
      val terms = others.toSet.subsets().toSeq.map { sset =>
        val s = sset.toSeq.sorted
        val w = fact(s.size) * fact(k - s.size - 1)
        r12(w * (v((s :+ c).sorted.mkString(",")) - v(s.mkString(","))))
      }
      (c, r6(terms.sum.toDouble / fact(k)))
    }
    val got = q("q274_shapley_attribution")
      .as[(String, Double)].collect().toSeq
    assert(got == want)
    // efficiency: credits sum to v(full) − v(∅) up to output rounding
    val eff = v(chans.mkString(",")) - v("")
    assert(math.abs(got.map(_._2).sum - eff) < 5e-6 * k)
  }

  test("q275 FS weights and patterns match a brute-force walk") {
    val c = Tables(spark, sf, "customer")
      .select(col("c_custkey"), round(col("c_acctbal") * 100)
        .cast("long"), col("c_nationkey").cast("long"),
        col("c_mktsegment"))
      .as[(Long, Long, Long, String)].collect().toSeq
      .map { case (k, bal, nat, seg) =>
        (k, bal, nat, seg, (bal + 100000L) / 1000L) }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def uOf[T](vals: Seq[T]): Double = {
      val n = vals.size.toDouble
      vals.groupBy(identity).values
        .map(g => BigInt(g.size) * (g.size - 1)).sum.toDouble /
        (n * (n - 1))
    }
    val ms = Map("nat" -> 0.9, "seg" -> 0.85, "band" -> 0.8)
    val us = Map("nat" -> uOf(c.map(_._3)), "seg" -> uOf(c.map(_._4)),
                 "band" -> uOf(c.map(_._5)))
    def wa(f: String) = r6(math.log(ms(f) / us(f)) / math.log(2.0))
    def wd(f: String) =
      r6(math.log((1 - ms(f)) / (1 - us(f))) / math.log(2.0))
    val sorted = c.sortBy(x => (x._2, x._1))
    val pats = sorted.zipWithIndex.flatMap { case ((_, _, nat, seg, bd),
                                                   i) =>
      (1 to 3).flatMap(w => sorted.lift(i + w).map { n =>
        ((if (nat == n._3) 1 else 0, if (seg == n._4) 1 else 0,
          if (bd == n._5) 1 else 0))
      })
    }
    val want = pats.groupBy(identity).toSeq.map { case ((a, b, e), g) =>
      val score = (BigDecimal(if (a == 1) wa("nat") else wd("nat")) +
                   BigDecimal(if (b == 1) wa("seg") else wd("seg")) +
                   BigDecimal(if (e == 1) wa("band") else wd("band")))
      (s"$a$b$e", g.size.toLong, r6(score.toDouble))
    }.sortBy(_._1)
    val got = q("q275_fellegi_sunter")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q276 ESD rounds match a sequential remove-and-refit walk") {
    val cells0 = Tables(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).cast("string"),
              round(col("o_totalprice") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
      .groupBy(_._1).toSeq.map { case (d, g) => (d, g.map(_._2).sum) }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var rem = cells0
    val want = (1 to 3).map { r =>
      val n = rem.size.toLong
      val sx = rem.map(x => BigInt(x._2)).sum
      val sxx = rem.map(x => BigInt(x._2) * BigInt(x._2)).sum
      // argmax dev with earlier-day tie: sort by (-dev, day)
      val best = rem.map { case (d, x) =>
        (d, x, (BigInt(x) * BigInt(n) - sx).abs) }
        .sortBy { case (d, _, dev) => (dev, d) }(
          Ordering.Tuple2(Ordering[BigInt].reverse, Ordering[String]))
        .head
      rem = rem.filterNot(_._1 == best._1)
      val rstat = (best._3.toDouble / n) /
        math.sqrt((BigInt(n) * sxx - sx * sx).toDouble /
                  (n * (n - 1)).toDouble)
      (r, best._1, r6(best._2.toDouble / 100.0), r6(rstat),
       r6(rstat) > 3.0)
    }
    val got = q("q276_esd_outliers")
      .select(col("esd_round"), col("day").cast("string"),
              col("revenue"), col("r_stat"), col("flagged"))
      .as[(Int, String, Double, Double, Boolean)].collect().toSeq
    assert(got == want)
  }

  test("q277 sequential-pair support matches a brute-force walk") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
              unix_micros(col("ts")))
      .as[(Long, String, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byUser = ev.groupBy(_._1)
    val tot = byUser.size.toDouble
    val pairs = byUser.values.flatMap { g =>
      val env = g.groupBy(_._2).map { case (t, rs) =>
        (t, rs.map(_._3).min, rs.map(_._3).max) }.toSeq
      for (a <- env; b <- env if a._2 < b._3) yield (a._1, b._1)
    }.toSeq
    val want = pairs.groupBy(identity).toSeq.map { case ((a, b), g) =>
      (a, b, g.size.toLong, r6(g.size / tot)) }.sortBy(p => (p._1, p._2))
    val got = q("q277_seq_2patterns")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q278 grid DBSCAN matches a brute-force flood fill") {
    val pts = Tables(spark, sf, "embeddings")
      .select(expr("cast(round(cast(element_at(embedding, 1) as double)" +
                   " * 1000000) as bigint)"),
              expr("cast(round(cast(element_at(embedding, 2) as double)" +
                   " * 1000000) as bigint)"))
      .as[(Long, Long)].collect().toSeq
      .map { case (x, y) => ((x + 2000000L) / 50000L,
                             (y + 2000000L) / 50000L) }
    val cells = pts.groupBy(identity).map { case (c, g) =>
      c -> g.size.toLong }
    val core = cells.filter(_._2 >= 3).keySet
    // flood fill over 8-adjacency
    val label = scala.collection.mutable.Map[(Long, Long), Long]()
    for (c <- core.toSeq.sortBy(c => c._1 * 100000L + c._2)
         if !label.contains(c)) {
      val id = c._1 * 100000L + c._2
      var frontier = List(c)
      while (frontier.nonEmpty) {
        val cur = frontier.head; frontier = frontier.tail
        if (!label.contains(cur)) {
          label(cur) = id
          for (dx <- -1L to 1L; dy <- -1L to 1L
               if (dx, dy) != ((0L, 0L))) {
            val nb = (cur._1 + dx, cur._2 + dy)
            if (core(nb) && !label.contains(nb)) frontier ::= nb
          }
        }
      }
    }
    // flood order can visit a component from a non-minimal seed; remap
    // each component to its min cell id (the declared cluster id)
    val byComp = label.toSeq.groupBy(_._2).values.flatMap { g =>
      val minId = g.map(c => c._1._1 * 100000L + c._1._2).min
      g.map(c => c._1 -> minId)
    }.toMap
    val clusters = byComp.toSeq.groupBy(_._2).toSeq.map { case (id, g) =>
      (id, g.size.toLong, g.map(c => cells(c._1)).sum) }
    val noise = cells.filter(_._2 < 3)
    val want = (clusters :+
      ((-1L, noise.size.toLong, noise.values.sum)))
      .sortBy { case (id, _, np) => (-np, id) }
    val got = q("q278_dbscan_grid")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q279 Markov attribution matches a brute-force chain walk") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string"),
              unix_micros(col("ts")), col("event_id"), col("event_type"))
      .as[(Long, String, Long, Long, String)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val Scale = BigInt(1000000000L)
    // transitions
    val trans = ev.groupBy(e => (e._1, e._2)).values.flatMap { g =>
      val conv = g.exists(_._5 == "purchase")
      val end = if (conv) "CONV" else "NULL"
      val path = g.sortBy(e => (e._3, e._4)).map(_._5)
        .filter(_ != "purchase")
      if (path.isEmpty) Seq(("START", end))
      else ("START", path.head) +:
           (path.zip(path.tail) :+ (path.last, end))
    }.toSeq
    val m = trans.groupBy(identity).map { case (ft, g) =>
      ft -> g.size.toLong }
    val channels = m.keys.map(_._1).filter(_ != "START").toSeq.distinct
    val tot = m.groupBy(_._1._1).map { case (f, g) =>
      f -> g.values.sum }
    def absorb(rm: String): BigInt = {
      // variant matrix: rows from rm dropped, targets rm -> NULL
      val mm = m.toSeq.filter(_._1._1 != rm)
        .map { case ((f, t), c) =>
          ((f, if (t == rm) "NULL" else t), c) }
        .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      var v = Map("CONV" -> Scale, "NULL" -> BigInt(0))
      for (_ <- 1 to 12) {
        val states = mm.keys.map(_._1).toSeq.distinct
        val nv = states.map { f =>
          val num = mm.filter(_._1._1 == f).map { case ((_, t), c) =>
            BigInt(c) * v.getOrElse(t, BigInt(0)) }.sum
          f -> num / tot(f)
        }.toMap
        v = nv ++ Map("CONV" -> Scale, "NULL" -> BigInt(0))
      }
      v("START")
    }
    val p0 = absorb("none")
    val drops = channels.sorted.map(c => (c, p0 - absorb(c)))
    val dtot = drops.map(_._2).sum
    val want = drops.map { case (c, dr) =>
      (c, r6(p0.toDouble / 1e9), r6((p0 - dr).toDouble / 1e9),
       r6(dr.toDouble / p0.toDouble), r6(dr.toDouble / dtot.toDouble)) }
    val got = q("q279_markov_attribution")
      .as[(String, Double, Double, Double, Double)].collect().toSeq
    assert(got == want)
  }

  test("q280 skipping attestation matches a brute-force layout walk") {
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey"),
              datediff(to_date(col("o_orderdate")),
                       lit("1995-01-01").cast("date")).cast("long"),
              col("o_custkey").cast("long"))
      .as[(Long, Long, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (dmin, dmax) = (o.map(_._2).min, o.map(_._2).max)
    val (cmin, cmax) = (o.map(_._3).min, o.map(_._3).max)
    def z(dd: Long, ck: Long): Long = {
      val bx = (dd - dmin) * 256 / (dmax - dmin + 1)
      val by = (ck - cmin) * 256 / (cmax - cmin + 1)
      (0 until 8).map(i => ((bx >> i) & 1) * (1L << (2 * i + 1)) +
                           ((by >> i) & 1) * (1L << (2 * i))).sum
    }
    val layouts = Seq(
      "linear_date" -> o.sortBy(r => (r._2, r._1)),
      "zorder" -> o.sortBy(r => (z(r._2, r._3), r._1)))
    val boxes = Seq(
      ("7d_x_10pct_keys", (dmin + 1000, dmin + 1006, cmin,
        cmin + (cmax - cmin + 1) / 10)),
      ("all_dates_x_1pct_keys", (Long.MinValue, Long.MaxValue, cmin,
        cmin + (cmax - cmin + 1) / 100)))
    val want = (for ((lname, rows) <- layouts; (bname, b) <- boxes)
      yield {
        val groups = rows.grouped(512).toSeq
        val hits = groups.filter { g =>
          val (dlo, dhi) = (g.map(_._2).min, g.map(_._2).max)
          val (clo, chi) = (g.map(_._3).min, g.map(_._3).max)
          dlo <= b._2 && dhi >= b._1 && clo <= b._4 && chi >= b._3
        }
        (lname, bname, groups.size.toLong, hits.size.toLong,
         hits.map(_.size.toLong).sum,
         r6(1.0 - hits.size.toDouble / groups.size))
      }).sortBy(x => (x._1, x._2))
    val got = q("q280_zorder_skipping")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q281 stratified split matches a brute-force md5-rank walk") {
    val c = Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .as[(Long, String)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = c.groupBy(_._2).toSeq.map { case (seg, g) =>
      val n = g.size
      val cut = (n * 8 + 9) / 10
      val train = g.map(x => (md5hex(x._1.toString), x._1))
        .sortBy(identity).take(cut).map(_._2)
      (seg, n.toLong, cut.toLong, (n - cut).toLong,
       r6(cut.toDouble / n), train.map(BigInt(_)).sum.toDouble)
    }.sortBy(_._1)
    val got = q("q281_stratified_split")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == want)
  }

  test("q282 filter funnel matches a brute-force flag walk") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val flags = docs.map { case (_, text, nc) =>
      val toks = text.split(" ", -1)
      val stop = toks.count(Set("a", "the", "of", "and", "in"))
        .toDouble / toks.length
      val alpha = text.count(c => c >= 'a' && c <= 'z').toDouble /
        text.length
      val qs = r6(math.min(1.0, nc.toDouble / 400) * 0.4 + stop * 0.3 +
                  alpha * 0.3)
      val f1 = nc >= 50 && nc <= 5000
      val f2 = qs >= 0.5
      val f3 = r6(toks.distinct.length.toDouble / toks.length) >= 0.3
      val f4 = r6(alpha) >= 0.55
      (toks.length.toLong, f1, f2, f3, f4)
    }
    val total = flags.size.toLong
    def cum(i: Int)(f: (Long, Boolean, Boolean, Boolean, Boolean)) =
      Seq(f._2, f._3, f._4, f._5).take(i).forall(identity)
    val names = Seq("length_50_5000", "quality_ge_05", "diversity_ge_03",
                    "alpha_ge_055")
    val alone = Seq(flags.count(_._2), flags.count(_._3),
                    flags.count(_._4), flags.count(_._5))
    val kums = (1 to 4).map(i => flags.count(cum(i)))
    val toksCum = (1 to 4).map(i =>
      flags.filter(cum(i)).map(_._1).sum)
    val want = (0 until 4).map { i =>
      (i + 1, names(i), alone(i).toLong, kums(i).toLong,
       (if (i == 0) total else kums(i - 1).toLong) - kums(i),
       toksCum(i), r6(kums(i).toDouble / total))
    }
    val got = q("q282_filter_funnel")
      .as[(Int, String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q283 embedding drift matches a brute-force fixed-point walk") {
    val src = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toMap
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
      .filter(v => src.contains(v._1))
      .map { case (id, e) =>
        (src(id), e.map(x => math.round(x.toDouble * 1e6))) }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dims = vecs.head._2.length
    val bySrc = vecs.groupBy(_._1)
    val gsum = (0 until dims).map(d0 =>
      vecs.map(v => BigInt(v._2(d0))).sum)
    val gn = gsum.map(g => g * g).sum
    val want = bySrc.toSeq.sortBy(_._1).map { case (s0, g) =>
      val n = g.size.toLong
      val sv = (0 until dims).map(d0 => g.map(v => BigInt(v._2(d0))).sum)
      val ns = sv.map(v => v * v).sum
      val dot = sv.zip(gsum).map { case (a, b) => a * b }.sum
      val ssq = g.map(_._2.map(v => BigInt(v) * BigInt(v)).sum).sum
      (s0, n,
       r6(dot.toDouble / (math.sqrt(ns.toDouble) * math.sqrt(gn.toDouble))),
       r6((ssq.toDouble / n - ns.toDouble / (n.toDouble * n)) / 1.0e12))
    }
    val got = q("q283_embed_drift")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == want)
  }

  test("q284 assortativity matches a brute-force moment walk") {
    import graft.operators.DedupExtOps
    val pairs = DedupExtOps.candidatePairs(
        Tables(spark, sf, "documents"),
        maxBucket = DedupExtOps.HotBucketCap)
      .as[(Long, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (u, g) => u -> g.size }
    val xy = edges.map { case (u, v) => (BigInt(deg(u)), BigInt(deg(v))) }
    val n = BigInt(xy.size)
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val want = (n.toLong, r6(sx.toDouble / n.toDouble),
      r6((n * sxy - sx * sy).toDouble /
         math.sqrt((n * sxx - sx * sx).toDouble *
                   (n * syy - sy * sy).toDouble)))
    val got = q("q284_assortativity")
      .as[(Long, Double, Double)].collect().head
    assert(got == want)
  }

  test("q285 CDC apply matches a brute-force last-writer walk") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
              col("event_type"), round(col("value") * 100).cast("long"))
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = ev.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      val last = g.maxBy(e => (e._3, e._2))
      if (last._4 == "error") None
      else Some((u, r6(last._5.toDouble / 100.0), g.size.toLong))
    }.sortBy(_._1)
    val got = q("q285_stream_cdc_apply")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == want)
  }

  test("q286 McNemar matches a brute-force paired walk") {
    val rows = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag") === "R", col("l_discount") >= 0.05,
              col("l_quantity") >= 25)
      .as[(Boolean, Boolean, Boolean)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (a, b, c, dd) = rows.foldLeft((0L, 0L, 0L, 0L)) {
      case ((a, b, c, d), (y, pa, pb)) =>
        ((pa == y, pb == y) match {
          case (true, true) => (a + 1, b, c, d)
          case (true, false) => (a, b + 1, c, d)
          case (false, true) => (a, b, c + 1, d)
          case (false, false) => (a, b, c, d + 1)
        })
    }
    val n = (a + b + c + dd).toDouble
    val want = (a, b, c, dd, r6((a + b) / n), r6((a + c) / n),
      r6((math.abs(b - c) - 1).toDouble * (math.abs(b - c) - 1) /
         (b + c).toDouble))
    val got = q("q286_mcnemar")
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().head
    assert(got == want)
  }

  test("q287 Cohen's kappa matches a brute-force agreement walk") {
    val docs = Tables(spark, sf, "documents")
      .select(col("n_chars"), col("text"))
      .as[(Long, String)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pairs = docs.map { case (nc, text) =>
      val toks = text.split(" ", -1)
      val stop = toks.count(Set("a", "the", "of", "and", "in"))
        .toDouble / toks.length
      val alpha = text.count(ch => ch >= 'a' && ch <= 'z').toDouble /
        text.length
      val qs = r6(math.min(1.0, nc.toDouble / 400) * 0.4 + stop * 0.3 +
                  alpha * 0.3)
      (if (nc < 200) 0 else if (nc < 500) 1 else 2,
       if (qs < 0.4) 0 else if (qs < 0.6) 1 else 2)
    }
    val n = pairs.size.toLong
    val agree = pairs.count(p => p._1 == p._2).toLong
    def marg(side: Int, v: Int) =
      BigInt(pairs.count(p => (if (side == 1) p._1 else p._2) == v))
    val po = r6(agree.toDouble / n)
    val pe = r6((marg(1, 0) * marg(2, 0) + marg(1, 1) * marg(2, 1) +
                 marg(1, 2) * marg(2, 2)).toDouble / (n.toDouble * n))
    val want = (n, po, pe, r6((po - pe) / (1.0 - pe)))
    val got = q("q287_cohens_kappa")
      .as[(Long, Double, Double, Double)].collect().head
    assert(got == want)
  }

  test("q288 ECE matches a brute-force reliability walk") {
    val rows = Tables(spark, sf, "lineitem")
      .select(round(col("l_discount") * 100).cast("long"),
              col("l_returnflag") === "R")
      .as[(Long, Boolean)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val nn = rows.size.toDouble
    val bins = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (sc, g) =>
      val n = g.size.toLong
      val conf = r6(sc.toDouble / 100.0)
      val acc = r6(g.count(_._2).toDouble / n)
      (sc, n, conf, acc, math.abs(acc - conf))
    }
    val ece = r6(bins.map { case (_, n, _, _, gap) =>
      r12(n / nn * gap) }.sum.toDouble)
    val want = bins.map { case (sc, n, conf, acc, gap) =>
      (sc, n, conf, acc, r6(gap), ece) }
    val got = q("q288_ece")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got == want)
  }

  test("q289 spatial join matches a brute-force quadratic walk") {
    val pts = Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
              expr("cast(round(cast(element_at(embedding, 1) as double)" +
                   " * 1000000) as bigint)"),
              expr("cast(round(cast(element_at(embedding, 2) as double)" +
                   " * 1000000) as bigint)"))
      .as[(Long, Long, Long)].collect().toSeq
    val want = (for (a <- pts; b <- pts if a._1 < b._1) yield {
      val d2 = (a._2 - b._2) * (a._2 - b._2) +
               (a._3 - b._3) * (a._3 - b._3)
      (a._1, b._1, d2)
    }).filter(_._3 <= 400000000L).sortBy(p => (p._1, p._2))
    val got = q("q289_spatial_join")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(want.nonEmpty) // non-vacuous at the test SF
  }

  test("q290 IPS/SNIPS match a brute-force replay walk") {
    val logs = Tables(spark, sf, "events")
      .select(hour(col("ts")), col("event_type"),
              round(col("value") * 100).cast("long"))
      .as[(Int, String, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val ctxN = logs.groupBy(_._1).map { case (c, g) => c -> g.size }
    val cellN = logs.groupBy(l => (l._1, l._2))
      .map { case (k, g) => k -> g.size }
    val terms = logs.map { case (ctx, a, r) =>
      val pi = if (ctx < 12) "click" else "view"
      val m = if (a == pi) 1L else 0L
      val w = m.toDouble / (cellN((ctx, a)).toDouble / ctxN(ctx))
      (m, r12(w * r / 100.0), r12(w))
    }
    val n = logs.size.toLong
    val sumWr = terms.map(_._2).sum.toDouble
    val want = (n, terms.map(_._1).sum,
                r6(sumWr / n), r6(sumWr / terms.map(_._3).sum.toDouble))
    val got = q("q290_ips_offline_eval")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got == want)
  }

  test("q291 ACF matches a brute-force series walk") {
    val cells = Tables(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).cast("string"),
              round(col("o_totalprice") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) => BigInt(g.map(_._2).sum) }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = BigInt(cells.size)
    val sS = cells.sum
    val qS = cells.map(y => y * y).sum
    val want = (1 to 7).map { k =>
      val pairs = cells.dropRight(k).zip(cells.drop(k))
      val p = pairs.map { case (a, b) => a * b }.sum
      val aS = pairs.map(_._1).sum
      val bS = pairs.map(_._2).sum
      (k, (n - k).toLong,
       r6((n * n * p - n * sS * (aS + bS) + (n - k) * sS * sS).toDouble /
          (n * (n * qS - sS * sS)).toDouble))
    }
    val got = q("q291_acf").as[(Int, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q292 Theil-Sen matches a brute-force pairwise-slope walk") {
    val cells = Tables(spark, sf, "orders")
      .select(datediff(to_date(col("o_orderdate")),
                       lit("1995-01-01").cast("date")).cast("long"),
              round(col("o_totalprice") * 100).cast("long"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).toSeq.map { case (d, g) => (d, g.map(_._2).sum) }
      .sortBy(_._1)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val slopes = (for (a <- cells; b <- cells if a._1 < b._1)
      yield (a._1, b._1,
             (b._2 - a._2).toDouble / (b._1 - a._1).toDouble))
      .sortBy(p => (p._3, p._1, p._2))
    val m = slopes.size
    val med = slopes((m + 1) / 2 - 1)._3
    val n = BigInt(cells.size)
    val sx = cells.map(c => BigInt(c._1)).sum
    val sy = cells.map(c => BigInt(c._2)).sum
    val sxx = cells.map(c => BigInt(c._1) * c._1).sum
    val sxy = cells.map(c => BigInt(c._1) * c._2).sum
    val ols = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val want = (cells.size.toLong, m.toLong, r6(med / 100.0),
                r6(ols / 100.0))
    val got = q("q292_theil_sen")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got == want)
  }

  test("q293 k-anonymity matches a brute-force class walk") {
    val c = Tables(spark, sf, "customer")
      .select(col("c_nationkey").cast("long"),
              round(col("c_acctbal") * 100).cast("long"),
              col("c_mktsegment"))
      .as[(Long, Long, String)].collect().toSeq
      .map { case (nat, cents, seg) =>
        ((nat, (cents + 100000L) / 10000L), seg) }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val classes = c.groupBy(_._1).values
      .map(g => (g.size.toLong, g.map(_._2).distinct.size.toLong)).toSeq
    val total = classes.map(_._1).sum.toDouble
    val want = classes.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (sz, g) =>
        (sz, g.size.toLong, sz * g.size, g.map(_._2).min,
         r6(sz * g.size / total))
    }
    val got = q("q293_k_anonymity")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q294 best split matches a brute-force threshold walk") {
    val rows = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag") === "R",
              round(col("l_discount") * 100).cast("long"),
              col("l_quantity").cast("long"))
      .as[(Boolean, Long, Long)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def gini(n: Long, p: Long): Double = {
      val pd = p.toDouble / n; val qd = (n - p).toDouble / n
      1.0 - pd * pd - qd * qd
    }
    def best(f: String, vals: Seq[(Long, Boolean)]) = {
      val nn = vals.size.toLong
      val pp = vals.count(_._2).toLong
      val gParent = gini(nn, pp)
      val cand = vals.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (v, g) => (v, g.size.toLong, g.count(_._2).toLong) }
        .scanLeft((0L, 0L, 0L)) { case ((_, cn, cp), (v, n, p)) =>
          (v, cn + n, cp + p) }.drop(1)
        .filter(_._2 < nn)
        .map { case (v, cn, cp) =>
          val g = cn.toDouble / nn * gini(cn, cp) +
            (nn - cn).toDouble / nn * gini(nn - cn, pp - cp)
          (v, cn, g) }
      val (v, cn, g) = cand.minBy(c => (c._3, c._1))
      (f, v, cn, r6(gParent), r6(g), r6(gParent - g))
    }
    val want = Seq(
      best("discount_cents", rows.map(r => (r._2, r._1))),
      best("quantity", rows.map(r => (r._3, r._1))))
    val got = q("q294_best_split")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == want)
  }

  test("q295 PCA direction agrees with an independent double-precision " +
       "eigensolve") {
    val vecs = Tables(spark, sf, "embeddings")
      .select(expr("transform(embedding, x -> cast(x as double))"))
      .as[Array[Double]].collect()
    val dims = vecs.head.length
    val n = vecs.length.toDouble
    val mean = Array.tabulate(dims)(d0 => vecs.map(_(d0)).sum / n)
    val cov = Array.tabulate(dims, dims)((i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n)
    var w = Array.fill(dims)(1.0)
    for (_ <- 1 to 300) {
      val nw = Array.tabulate(dims)(i =>
        (0 until dims).map(j => cov(i)(j) * w(j)).sum)
      val nn = math.sqrt(nw.map(x => x * x).sum)
      w = nw.map(_ / nn)
    }
    val got = q("q295_pca_power")
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val loadings = got.map(_._2)
    // unit norm
    assert(math.abs(loadings.map(x => x * x).sum - 1.0) < 1e-4)
    // direction agreement with the independent solve (sign-free)
    val cos = math.abs(loadings.zip(w).map { case (a, b) => a * b }.sum)
    assert(cos > 0.999, s"cosine to reference eigenvector: $cos")
    // explained variance is a sane share and matches the reference
    // Rayleigh quotient loosely (quantization + truncated iteration)
    val ve = got.head._3
    val lam = (0 until dims).map(i => (0 until dims)
      .map(j => cov(i)(j) * w(j)).sum * w(i)).sum
    val trace = (0 until dims).map(i => cov(i)(i)).sum
    assert(ve > 0.0 && ve <= 1.0)
    assert(math.abs(ve - lam / trace) < 0.01,
           s"var_explained $ve vs reference ${lam / trace}")
  }

  test("q296 source projections agree with an independent eigensolve") {
    val src = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toMap
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
              expr("transform(embedding, x -> cast(x as double))"))
      .as[(Long, Array[Double])].collect()
      .filter(v => src.contains(v._1))
    val dims = vecs.head._2.length
    val n = vecs.length.toDouble
    val mean = Array.tabulate(dims)(d0 => vecs.map(_._2(d0)).sum / n)
    val cov = Array.tabulate(dims, dims)((i, j) =>
      vecs.map(v => (v._2(i) - mean(i)) * (v._2(j) - mean(j))).sum / n)
    var w = Array.fill(dims)(1.0)
    for (_ <- 1 to 300) {
      val nw = Array.tabulate(dims)(i =>
        (0 until dims).map(j => cov(i)(j) * w(j)).sum)
      val nn = math.sqrt(nw.map(x => x * x).sum)
      w = nw.map(_ / nn)
    }
    // align the reference's sign with the declared convention (via the
    // q295 output, already independently verified)
    val loadings = q("q295_pca_power")
      .as[(Int, Double, Double)].collect().sortBy(_._1).map(_._2)
    if (loadings.zip(w).map { case (a, b) => a * b }.sum < 0)
      w = w.map(-_)
    val want = vecs.groupBy(v => src(v._1)).toSeq.sortBy(_._1)
      .map { case (s0, g) =>
        (s0, g.size.toLong,
         g.map(v => v._2.zip(w).map { case (a, b) => a * b }.sum)
           .sum / g.size) }
    val got = q("q296_pc1_source_drift")
      .as[(String, Long, Double)].collect().toSeq
    assert(got.map(x => (x._1, x._2)) == want.map(x => (x._1, x._2)))
    got.zip(want).foreach { case ((s0, _, mp), (_, _, ref)) =>
      assert(math.abs(mp - ref) < 1e-3,
             s"$s0: mean_proj $mp vs reference $ref") }
  }

  test("q309 Kneser–Ney: every seen context sums to 1 over the train vocab") {
    // the property that makes KN-with-smoothed-continuation a proper
    // LM: Σ_vocab P(w2|w1) = (cw − D·n1f)/cw + (D·n1f/cw)·Σ Pcont = 1
    // exactly, because Σ_vocab (n1b+1)/(nbb+V) = (nbb+V)/(nbb+V).
    // Recomputed here from raw text with the identical split rule.
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def isTrain(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "%x".format((md(0) >> 4) & 0xf).head <= 'b'
    }
    val train = docs.filter(d => isTrain(d._1)).map(_._2.split(" ", -1).toSeq)
    val cb = train.filter(_.length >= 2)
      .flatMap(t => t.sliding(2).map(a => (a(0), a(1))))
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val ctx = cb.groupBy(_._1._1)
      .map { case (w1, m) => (w1, (m.values.sum, m.size)) }
    val n1b = cb.groupBy(_._1._2).map { case (w2, m) => (w2, m.size) }
    val nbb = cb.size
    val vocab = train.flatten.distinct
    val v = vocab.size
    assert(nbb > 100 && v > 20, s"corpus too small to certify: $nbb/$v")
    for (w1 <- ctx.keys.toSeq.sorted.take(12)) {
      val (c, f) = ctx(w1)
      val s0 = vocab.map { w2 =>
        math.max(cb.getOrElse((w1, w2), 0L) - 0.75, 0.0) / c +
          0.75 * f / c * ((n1b.getOrElse(w2, 0) + 1.0) / (nbb + v.toDouble))
      }.sum
      assert(math.abs(s0 - 1.0) < 1e-9, s"context '$w1' sums to $s0")
    }
  }

  test("q311 SemDeDup matches an in-memory Lloyd + lattice-dup recomputation") {
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) =>
        (id, v.map(x => math.round(x * 1000000.0)).toArray) }
      .sortBy(_._1)
    // 3-round integer-lattice Lloyd, exactly lloydAssignments' contract
    val byId = vecs.toMap
    var cents: Seq[(Long, Array[Long])] =
      vecs.filter(_._1 < 16).map { case (id, x) => (id, x) }.toSeq
    var assign: Map[Long, Long] = Map.empty
    for (t <- 1 to 3) {
      assign = vecs.map { case (id, x) =>
        val best = cents.map { case (cid, c) =>
          (x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }.min
        (id, best._2)
      }.toMap
      if (t < 3)
        cents = assign.groupBy(_._2).toSeq.sortBy(_._1).map { case (cid, m) =>
          val members = m.keys.toSeq.map(id => byId(id))
          val cl = Array.tabulate(64) { d0 =>
            val sx = members.map(_(d0)).sum
            val n = members.size
            if (sx >= 0) (2 * sx + n) / (2 * n)
            else -((2 * -sx + n) / (2 * n))
          }
          (cid, cl)
        }
    }
    def nrm(x: Array[Long]) = x.map(v => BigInt(v) * BigInt(v)).sum
    val dups = for {
      (a, ca) <- assign.toSeq; (b, cb) <- assign.toSeq
      if a < b && ca == cb
      dot = byId(a).zip(byId(b)).map { case (p, q0) => BigInt(p) * q0 }.sum
      if dot > 0 && dot * dot * 10000 >= nrm(byId(a)) * nrm(byId(b)) * 1600
    } yield (ca, a, b)
    val want = assign.groupBy(_._2).toSeq.sortBy(_._1).map { case (cid, m) =>
      val np = dups.count(_._1 == cid)
      val nr = dups.filter(_._1 == cid).map(_._3).distinct.size
      (cid, m.size.toLong, np.toLong, nr.toLong,
       math.round((m.size - nr).toDouble / m.size * 1e6) / 1e6)
    }
    val got = q("q311_semdedup")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("q337 decomposition matches in-memory; seasonal components center to zero") {
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val cells = Tables(spark, sf, "events")
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).cast("string"))
      .agg(sum(round(col("value") * 100).cast("long")))
      .as[(String, Long)].collect()
      .map { case (d0, c) => (java.time.LocalDate.parse(d0).toEpochDay, c) }
      .sortBy(_._1)
    val byDay = cells.toMap
    val det = cells.flatMap { case (day, c) =>
      val wnd = (-3 to 3).map(i => byDay.get(day + i))
      if (wnd.forall(_.isDefined))
        Some((((day - 4) % 7 + 7) % 7, 7L * c - wnd.flatten.sum))
      else None
    } // 1970-01-05 is epoch day 4
    val g7 = det.map(_._2.toDouble).sum / det.length // exact: longs sum in Double? use BigInt
    val g7e = det.map(d => BigInt(d._2)).sum.toDouble / det.length
    val want = det.groupBy(_._1).toSeq.sortBy(_._1).map { case (dow, g) =>
      val n = g.length
      val sd = g.map(d => BigInt(d._2)).sum
      val sdd = g.map(d => BigInt(d._2) * BigInt(d._2)).sum
      val mean = sd.toDouble / n
      val rms = math.sqrt(math.max(
        sdd.toDouble / n - mean * mean, 0.0)) / 7.0
      (dow, n.toLong, r6((mean - g7e) / 7.0), r6(rms))
    }
    val got = q("q337_stl_lite")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == want, s"g7=$g7 g7e=$g7e")
    // grand centering: the day-weighted seasonal components cancel
    val wsum = got.map(r => r._2 * r._3).sum
    assert(math.abs(wsum) <= det.length * 1e-6,
           s"seasonal components not centered: $wsum")
  }

  test("q334 index probe equals q331's answer restricted to odd-anchor/even-neighbor") {
    // ONE definition of in-radius k-NN: the incremental tier must
    // agree with the from-scratch q331 on the shared (odd anchor,
    // even neighbor) slice RE-RANKED within it — and since q331 is
    // brute-force-certified, this transitively certifies q334
    val full = q("q331_knn_join")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // q331 keeps top-5 over ALL neighbors; rebuild the odd→even slice
    // from the certified brute-force instead (same metric, same R)
    val pts = Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
              expr("cast(round(cast(element_at(embedding, 1) as double) * 1000000) as bigint)"),
              expr("cast(round(cast(element_at(embedding, 2) as double) * 1000000) as bigint)"))
      .as[(Long, Long, Long)].collect()
    val evens = pts.filter(_._1 % 2 == 0)
    val want = pts.filter(_._1 % 2 == 1).flatMap { case (a, xa, ya) =>
      evens.map { case (b, xb, yb) =>
        (b, (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)) }
        .filter(_._2 <= 400000000L)
        .sortBy { case (b, d2) => (d2, b) }.take(5).zipWithIndex
        .map { case ((b, d2), ix) => (a, ix + 1L, b, d2) }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = q("q334_knn_index")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(full.nonEmpty && got.nonEmpty)
  }

  test("q333 mined negatives sit strictly below q56's dup band; ranks well-formed") {
    val rows = q("q333_hard_negatives")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.length.toLong),
             s"ranks not consecutive: $sorted")
      assert(sorted.map(_._4).sliding(2)
               .forall(p => p.length < 2 || p(0) >= p(1)),
             s"sims not descending within anchor: $sorted")
    }
    assert(rows.forall(r => r._4 >= 0.25 && r._4 < 0.4))
    // the mining band and the dedup band PARTITION the shared banded
    // candidate space: no mined pair is a q56 near-dup
    val dups = q("q56_dedup_embedding").select(col("a"), col("b"))
      .as[(Long, Long)].collect().toSet
    assert(rows.forall(r => !dups(
      (math.min(r._1, r._3), math.max(r._1, r._3)))))
  }

  test("q332 motif/discord match brute-force over the daily-cell series") {
    val cells = Tables(spark, sf, "events")
      .groupBy(col("event_type"),
               datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
                 .cast("long"))
      .agg(sum(round(col("value") * 100).cast("long")))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (et, rs) =>
        (et, rs.map(r => (r._2, r._3)).sortBy(_._1)) }
    val want = cells.toSeq.sortBy(_._1).flatMap { case (et, series) =>
      val byDay = series.toMap
      val wins = series.map(_._1).filter { s0 =>
        (0 to 6).forall(i => byDay.contains(s0 + i)) }
        .map(s0 => (s0, (0 to 6).map(i => byDay(s0 + i))))
      val pairs = for {
        (sa, va) <- wins; (sb, vb) <- wins
        if sa < sb && sb - sa >= 7
      } yield (sa, sb, va.zip(vb)
        .map { case (x, y) => BigInt(x - y) * BigInt(x - y) }.sum)
      if (pairs.isEmpty) Seq.empty
      else {
        val m = pairs.minBy { case (sa, sb, d2) => (d2, sa, sb) }
        val nnd = pairs.flatMap { case (sa, sb, d2) =>
          Seq((sa, d2), (sb, d2)) }
          .groupBy(_._1).map { case (w, ds) => (w, ds.map(_._2).min) }
        val disc = nnd.toSeq.minBy { case (w, d2) => (-d2, w) }
        Seq((et, m._1, m._2, m._3.toDouble, disc._1, disc._2.toDouble))
      }
    }
    val got = q("q332_matrix_profile")
      .as[(String, Long, Long, Double, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q331 grid k-NN join equals brute-force in-radius k-NN") {
    val pts = Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
              expr("cast(round(cast(element_at(embedding, 1) as double) * 1000000) as bigint)"),
              expr("cast(round(cast(element_at(embedding, 2) as double) * 1000000) as bigint)"))
      .as[(Long, Long, Long)].collect()
    val want = pts.flatMap { case (a, xa, ya) =>
      pts.filter(_._1 != a)
        .map { case (b, xb, yb) =>
          (b, (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)) }
        .filter(_._2 <= 400000000L)
        .sortBy { case (b, d2) => (d2, b) }.take(5).zipWithIndex
        .map { case ((b, d2), ix) => (a, ix + 1L, b, d2) }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = q("q331_knn_join")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q329 beam walk matches in-memory graph search; beam never regresses") {
    def r4(d: Double): Double = java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(x: Seq[Double], y: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < x.length) {
        dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val em = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val qv = em(0L)
    def hex(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // the md5-ranked 4096-node backbone (all nodes at this SF)
    val nodes = em.keys.filter(_ != 0L).toSeq
      .sortBy(i => (hex(i), i)).take(4096)
    val sims = nodes.map(i => (i, r4(cos(em(i), qv)))).toMap
    val graph = nodes.map { src =>
      (src, nodes.filter(_ != src)
        .map(dst => (dst, r4(cos(em(src), em(dst)))))
        .sortBy { case (dst, es) => (-es, dst) }.take(8).map(_._1))
    }.toMap
    var beam = Seq(nodes.head)
    val beams = (1 to 3).map { _ =>
      val cands = (beam.flatMap(graph) ++ beam).distinct
      beam = cands.sortBy(i => (-sims(i), i)).take(4)
      beam
    }
    val exact = nodes.sortBy(i => (-sims(i), i)).take(4).toSet
    val want = beam.sortBy(i => (-sims(i), i)).zipWithIndex.map {
      case (id, ix) =>
        (ix + 1L, id, sims(id), if (exact(id)) 1 else 0)
    }
    val got = q("q329_ann_beam")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got == want)
    // the beam ∪ neighbors union keeps the walk monotone: the best
    // sim in each successive beam never drops
    val bests = beams.map(b => b.map(sims).max)
    assert(bests.sliding(2).forall(p => p(1) >= p(0)))
  }

  test("q327 DP release matches in-memory Laplace chain; noise is calibrated") {
    def r6(d: Double): Double = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val cells = Tables(spark, sf, "customer")
      .join(Tables(spark, sf, "nation"),
            col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)))
      .as[(String, String, Long)].collect()
    def lap(seg: String, nat: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seg:$nat".getBytes("UTF-8"))
      val hex = md.take(6).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        281474976710656.0
      r6(-math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5)))
    }
    val want = cells.map { case (seg, nat, cnt) =>
      val noisy = math.max(math.floor(cnt.toDouble + lap(seg, nat) + 0.5)
                             .toLong, 0L)
      (seg, nat, noisy)
    }.sortBy(c => (c._1, c._2)).toSeq
    val got = q("q327_dp_release")
      .as[(String, String, Long)].collect().toSeq
    assert(got == want)
    // calibration: Laplace(1) has E|noise| = 1; over the released
    // cells the empirical mean must sit near it (σ/√n ≈ 0.09 here)
    val meanAbs = cells.map { case (s0, n0, _) =>
      math.abs(lap(s0, n0)) }.sum / cells.length
    assert(meanAbs > 0.5 && meanAbs < 1.5, s"mean |noise| $meanAbs")
  }

  test("q328 peel matches in-memory; fixpoint (the true 2-core) reached by round 4") {
    val edges = operators.DedupExtOps
      .candidatePairs(Tables(spark, sf, "documents"), 64)
      .as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    var alive = edges.map(_._1).toSet
    val series = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (r <- 1 to 4) {
      val deg = edges.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (u, es) => (u, es.length) }
      val keep = alive.filter(u => deg.getOrElse(u, 0) >= 2)
      series += ((r.toLong, (alive.size - keep.size).toLong,
                  keep.size.toLong))
      alive = keep
    }
    val got = q("q328_kcore").as[(Long, Long, Long)].collect().toSeq
    assert(got == series.toSeq)
    // the declared attestation: round 4 removes nothing, so the peel
    // has CONVERGED and `remaining` is the true 2-core size
    assert(got.last._2 == 0L, s"peel not converged by round 4: $got")
    // core property: every survivor keeps >= 2 surviving neighbors
    val deg = edges.filter(e => alive(e._1) && alive(e._2))
      .groupBy(_._1).map { case (u, es) => (u, es.length) }
    assert(alive.forall(u => deg.getOrElse(u, 0) >= 2))
  }

  test("q326 Cox fit matches in-memory Newton; loglik ascends; score converges") {
    def r6(d: Double): Double = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def nib(id: Long): Char = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "%x".format((md(0) >> 4) & 0xf).head
    }
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")),
              col("event_type"),
              get_json_object(col("props"), "$.k").cast("long"))
      .as[(Long, Long, String, Option[Long])].collect()
    val cut = ev.map(_._2).max
    val lives = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val first = rows.map(_._2).min
      val p = rows.filter(r => r._3 == "purchase" && r._4.exists(_ < 5))
        .map(_._2).minOption
      val death = if (p.isDefined) 1L else 0L
      val dur = (p.getOrElse(cut) - first) / 86400000000L
      val a1 = if (nib(u) <= '7') 0L else 1L
      (death, dur, a1)
    }
    // step table: per distinct event day, deaths and per-arm at-risk
    val steps = lives.groupBy(_._2).toSeq
      .map { case (dur, g) =>
        val dth = g.map(_._1).sum
        val dth1 = g.filter(_._3 == 1L).map(_._1).sum
        val n = lives.count(_._2 >= dur).toLong
        val n1 = lives.count(l => l._2 >= dur && l._3 == 1L).toLong
        (dur, dth, dth1, n - n1, n1)
      }.filter(_._2 > 0).sortBy(_._1)
    def decSum(xs: Seq[Double]): Double =
      xs.map(x => java.math.BigDecimal.valueOf(x).setScale(6))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue()
    var b = 0.0
    val want = (1 to 3).map { k =>
      val eb = math.exp(b)
      val u = decSum(steps.map { case (_, dth, dth1, n0, n1) =>
        r6(dth1 - dth * (eb * n1) / (n0 + eb * n1)) })
      val i = decSum(steps.map { case (_, dth, _, n0, n1) =>
        r6(dth * ((eb * n1) / (n0 + eb * n1)) *
           (n0 / (n0 + eb * n1))) })
      b = r6(b + u / i)
      val nb = math.exp(b)
      val ll = r6(decSum(steps.map { case (_, dth, dth1, n0, n1) =>
        r6(dth1 * b - dth * math.log(n0 + nb * n1)) }))
      (k.toLong, b, r6(nb), ll)
    }
    val got = q("q326_cox_hazard")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(got == want)
    // the partial likelihood is concave — Newton from 0 must ascend
    // up to the declared rounding budget: each reported ℓ is a sum of
    // |steps| per-term 6-dp roundings, so converged rounds may jitter
    // by ~steps·1e-6 (observed: −318.042000 → −318.042002 at sf0.01)
    val budget = steps.size * 1e-6
    assert(got.map(_._4).sliding(2).forall(p => p(1) >= p(0) - budget),
           s"loglik not ascending beyond rounding budget: ${got.map(_._4)}")
    // converged: the score at the final beta is numerically dead
    val ebF = math.exp(got.last._2)
    val uF = decSum(steps.map { case (_, dth, dth1, n0, n1) =>
      r6(dth1 - dth * (ebF * n1) / (n0 + ebF * n1)) })
    assert(math.abs(uF) < 1e-2, s"score $uF at final beta")
  }

  test("q325 ALS solve matches in-memory normal equations and is the ridge argmin") {
    def r6(d: Double): Double = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val rows = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables(spark, sf, "lineitem")
              .select(col("l_orderkey"), col("l_partkey"),
                      col("l_quantity").cast("long")),
            col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long"), col("l_partkey").cast("long"),
              col("l_quantity").cast("long"))
      .as[(Long, Long, Long)].collect()
    case class St(var n: Long = 0, var s11: Long = 0, var s12: Long = 0,
                  var s22: Long = 0, var sr1: Long = 0, var sr2: Long = 0,
                  var srr: Long = 0)
    val m = scala.collection.mutable.HashMap.empty[Long, St]
    rows.foreach { case (u, p, r) =>
      val q1 = (p * 37) % 97; val q2 = (p * 61 + 13) % 89
      val st = m.getOrElseUpdate(u, St())
      st.n += 1; st.s11 += q1 * q1; st.s12 += q1 * q2; st.s22 += q2 * q2
      st.sr1 += r * q1; st.sr2 += r * q2; st.srr += r * r
    }
    def solve(st: St): (Double, Double, Double) = {
      val a11 = (st.s11 + 10000).toDouble; val a12 = st.s12.toDouble
      val a22 = (st.s22 + 10000).toDouble
      val b1 = st.sr1.toDouble; val b2 = st.sr2.toDouble
      val det = a11 * a22 - a12 * a12
      val p1 = r6((b1 * a22 - a12 * b2) / det)
      val p2 = r6((a11 * b2 - b1 * a12) / det)
      val res = st.srr.toDouble - 2.0 * (p1 * b1 + p2 * b2) +
        (p1 * p1 * st.s11.toDouble + 2.0 * p1 * p2 * st.s12.toDouble +
         p2 * p2 * st.s22.toDouble)
      (p1, p2, r6(math.sqrt(math.max(res / st.n.toDouble, 0.0))))
    }
    val want = m.toSeq.sortBy { case (u, st) => (-st.n, u) }.take(20)
      .map { case (u, st) =>
        val (p1, p2, rm) = solve(st); (u, st.n, p1, p2, rm) }
    val got = q("q325_als_user_step")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == want)
    // the solution minimizes the PENALIZED objective: any ±1e-3
    // perturbation of the top user's factors scores no better
    val st0 = m(want.head._1)
    def j(p1: Double, p2: Double): Double =
      st0.srr - 2.0 * (p1 * st0.sr1 + p2 * st0.sr2) +
        p1 * p1 * st0.s11 + 2.0 * p1 * p2 * st0.s12 + p2 * p2 * st0.s22 +
        10000.0 * (p1 * p1 + p2 * p2)
    val (bp1, bp2) = (want.head._3, want.head._4)
    for (d1 <- Seq(-1e-3, 0.0, 1e-3); d2 <- Seq(-1e-3, 0.0, 1e-3))
      assert(j(bp1, bp2) <= j(bp1 + d1, bp2 + d2) + 1e-9)
  }

  test("q324 prefix filter finds every Jaccard>=0.6 pair; posting cap is a no-op") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val sets = docs.map { case (id, tx) =>
      val ws = tx.split(" ")
      (id, ws.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty)
    // brute-force exact all-pairs (the algorithm-independent truth)
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      uni = sa.size + sb.size - inter
      if 10 * inter >= 6 * uni
    } yield (a, b, inter, uni, 1000000L * inter / uni))
      .sortBy(p => (p._1, p._2)).toSeq
    val got = q("q324_setsim_prefix")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // the q46 cap discipline: assert (not just measure) that the
    // hot-posting cap cannot fire at this SF — prefix postings stay
    // far under HotBucketCap, so the declared query IS the exact join
    val df = sets.flatMap(_._2).groupBy(identity)
      .map { case (t, a) => (t, a.length) }
    val maxPosting = sets.flatMap { case (id, ts) =>
      val n = ts.size
      val p = n - ((6 * n + 9) / 10) + 1
      ts.toSeq.sortBy(t => (df(t), t)).take(p)
    }.groupBy(identity).values.map(_.length).max
    assert(maxPosting <= 64, s"prefix posting $maxPosting exceeds cap")
  }

  test("q323 CMS one-sided error holds corpus-wide; report matches in-memory sketch") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id")).as[Long].collect()
    def h(dd: Int, u: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$dd:$u".getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 64).toInt
    }
    val cells = Array.fill(4, 64)(0L)
    ev.foreach(u => (0 to 3).foreach(dd => cells(dd)(h(dd, u)) += 1))
    val exact = ev.groupBy(identity)
      .map { case (u, a) => (u, a.length.toLong) }
    def est(u: Long): Long = (0 to 3).map(dd => cells(dd)(h(dd, u))).min
    // the CMS guarantee: estimate ≥ exact for EVERY key, not just the
    // reported hot set
    exact.foreach { case (u, c) => assert(est(u) >= c, s"user $u") }
    val want = exact.toSeq.sortBy { case (u, c) => (-c, u) }.take(10)
      .map { case (u, c) => (u, c, est(u), est(u) - c) }
    val got = q("q323_cms_artifact")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q322 MMR greedy chain matches in-memory recomputation") {
    def r(d: Double, s: Int): Double =
      java.math.BigDecimal.valueOf(d)
        .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(x: Seq[Double], y: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < x.length) {
        dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val em = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val qv = em(0L)
    val cand = em.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, r(cos(v, qv), 4)) }
      .sortBy { case (id, rel) => (-rel, id) }.take(20)
    val sim = (for { (a, _) <- cand; (b, _) <- cand if a != b }
      yield ((a, b), r(cos(em(a), em(b)), 4))).toMap
    var picked = Vector.empty[Long]
    val exp = (1 to 10).map { k =>
      val scored = cand.filterNot(c => picked.contains(c._1))
        .map { case (id, rel) =>
          val ms = if (picked.isEmpty) 0.0
                   else picked.map(p => sim((id, p))).max
          (id, r(0.5 * rel - 0.5 * ms, 6), rel)
        }
      val (id, sc, rel) = scored.sortBy(x => (-x._2, x._1)).head
      picked :+= id
      (k.toLong, id, sc, rel)
    }
    val got = q("q322_mmr_rerank")
      .as[(Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(got == exp)
    // step 1 is the pure-relevance argmax (MMR's declared base case)
    assert(got.head._2 == cand.head._1)
  }

  test("q360 gram-mass gates match an in-memory per-doc recomputation") {
    // exercises the r19 typed per-doc gram fold: top-bigram mass
    // (argmax by count desc, gram asc) and duplicated-5-gram mass,
    // recomputed independently with Scala collections and pushed
    // through the r6/r7 gate inequalities
    def masses(text: String): (Long, Long) = {
      val tk = text.split(" ", -1)
      def counts(n: Int): Map[String, Long] =
        (0 to tk.length - n)
          .map(s => tk.slice(s, s + n).mkString(" "))
          .groupBy(identity).map { case (g, o) => (g, o.length.toLong) }
      val m2 = counts(2)
      val top2 = if (m2.isEmpty) 0L
        else {
          val (g, c) = m2.toSeq.sortBy { case (g, c) => (-c, g) }.head
          c * g.length
        }
      val dup5 = counts(5).collect {
        case (g, c) if c >= 2 => c * g.length }.sum
      (top2, dup5)
    }
    val docs = Tables(spark, sf, "documents")
      .select("source", "text").as[(String, String)].collect()
    val exp = docs.groupBy(_._1).map { case (src, ds) =>
      val ms = ds.map { case (_, t) => (t.length.toLong, masses(t)) }
      (src,
       ms.count { case (ch, (t2, _)) => 5 * t2 <= ch }.toLong,
       ms.count { case (ch, (_, d5)) => 20 * d5 <= 3 * ch }.toLong)
    }.toSeq.sortBy(_._1)
    val got = q("q360_gopher_rules")
      .where(col("rule").isin("r6_top2gram_mass", "r7_dup5gram_mass"))
      .select("source", "rule", "pass_docs")
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (src, rs) =>
        val m = rs.map(r => r._2 -> r._3).toMap
        (src, m("r6_top2gram_mass"), m("r7_dup5gram_mass"))
      }.toSeq.sortBy(_._1)
    assert(got == exp)
  }

  test("q321 final look reproduces q159's fixed-horizon readout") {
    val rows = q("q321_sequential_ab").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)),
                 r.getDouble(6), r.getBoolean(7)))
      .sortBy(_._1)
    // boundary schedule: 3.0 on every interim look, 1.96 only at the end
    assert(rows.init.forall(_._7 == 3.0) && rows.last._7 == 1.96)
    // cumulative counts are monotone and x ≤ n per arm
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4 && b._5 >= a._5) }
    assert(rows.forall(r => r._4 <= r._2 && r._5 <= r._3))
    // the last look IS q159's fixed-horizon test: same universe, same
    // z chain — counts and z must agree exactly
    val ab = q("q159_ab_test").collect().head
    val last = rows.last
    assert((last._2, last._3, last._4, last._5) ==
           (ab.getLong(0), ab.getLong(1), ab.getLong(2), ab.getLong(3)))
    assert(last._6.contains(ab.getDouble(6)),
           s"z ${last._6} vs q159 z_conv ${ab.getDouble(6)}")
  }

  test("q320 conformal: q̂ is the exact order statistic; coverage near 0.9") {
    val ev = Tables(spark, sf, "events")
      .select(col("event_id"), col("event_type"),
              datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
                .cast("long"),
              round(col("value") * 100).cast("long"))
      .as[(Long, String, Long, Long)].collect()
    def nib(id: Long): Char = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "%x".format((md(0) >> 4) & 0xf).head
    }
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val want = ev.groupBy(_._2).toSeq.sortBy(_._1).map { case (et, rows) =>
      val tr = rows.filter(r => nib(r._1) <= '9')
      val n = tr.length.toDouble
      val (sx, sy) = (tr.map(_._3).sum.toDouble, tr.map(_._4).sum.toDouble)
      val sxx = tr.map(r => r._3.toDouble * r._3).sum
      val sxy = tr.map(r => r._3.toDouble * r._4).sum
      val b = r6((n * sxy - sx * sy) / (n * sxx - sx * sx))
      val a = r6((sy * sxx - sx * sxy) / (n * sxx - sx * sx))
      def rq(r: (Long, String, Long, Long)): Long =
        math.floor(math.abs(r._4.toDouble - (a + b * r._3.toDouble)) *
                   1e2 + 0.5).toLong
      val cal = rows.filter(r => nib(r._1) >= 'a' && nib(r._1) <= 'c')
        .map(rq).sorted
      val k = (9 * (cal.length + 1) + 9) / 10
      val qh = cal(math.min(k, cal.length) - 1)
      val ev2 = rows.filter(r => nib(r._1) >= 'd')
      val covered = ev2.count(r => rq(r) <= qh)
      (et, qh, r6(covered.toDouble / ev2.length))
    }
    val got = q("q320_conformal")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .sortBy(_._1)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1)
      assert(math.abs(g._5 - w._2 / 1e4) < 1e-9,
             s"${g._1}: q̂ ${g._5} vs ${w._2 / 1e4}")
      assert(math.abs(g._6 - w._3) < 1e-9)
      // the ≥0.9 guarantee is marginal (in expectation over the
      // calibration draw); at sf0.001's ~40-point calibration sets a
      // single type can dip well below it (purchase hits 0.74 here),
      // so this is a sanity band only — at sf0.01 the verify gate
      // observes 0.88–0.93 across all five types
      assert(g._6 > 0.6 && g._6 <= 1.0, s"${g._1}: coverage ${g._6}")
    }
  }

  test("q318 uplift stump matches an in-memory split search") {
    val pu = Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("nev"),
           countDistinct(col("event_type")).as("ntypes"),
           max(when(col("event_type") === "purchase" && col("value") > 150,
                    1L).otherwise(0L)).as("y"))
      .as[(Long, Long, Long, Long)].collect()
    def arm(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      if ("%x".format((md(0) >> 4) & 0xf).head <= '7') 0 else 1
    }
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val rows = pu.map { case (id, nev, nt, y) =>
      (math.min(nev / 10, 20L), nt, arm(id), y) }
    val want = Seq("activity" -> rows.map(r => (r._1, r._3, r._4)),
                   "breadth" -> rows.map(r => (r._2, r._3, r._4)))
      .flatMap { case (f, data) =>
        val vs = data.map(_._1).distinct.sorted
        val cand = vs.flatMap { v =>
          val (l, r) = data.partition(_._1 <= v)
          val Seq(lc, lt) = Seq(0, 1).map(a => l.filter(_._2 == a))
          val Seq(rc, rt) = Seq(0, 1).map(a => r.filter(_._2 == a))
          if (lc.isEmpty || lt.isEmpty || rc.isEmpty || rt.isEmpty) None
          else {
            val ul = r6(lt.map(_._3).sum.toDouble / lt.size -
                        lc.map(_._3).sum.toDouble / lc.size)
            val ur = r6(rt.map(_._3).sum.toDouble / rt.size -
                        rc.map(_._3).sum.toDouble / rc.size)
            Some((v, l.size.toLong, r.size.toLong, ul, ur,
                  r6((ul - ur) * (ul - ur))))
          }
        }
        if (cand.isEmpty) None
        else {
          val b = cand.sortBy(c => (-c._6, c._1)).head
          Some((f, b._1, b._2, b._3, b._4, b._5, b._6))
        }
      }.sortBy(_._1)
    val got = q("q318_uplift_stump")
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("q319 FS-EM: monotone likelihood ascent; round 1 matches in-memory EM") {
    val pat = q("q275_fellegi_sunter")
      .select(col("pattern"), col("n_pairs")).as[(String, Long)].collect()
    val p0 = 0.1
    val m0 = Array(0.9, 0.85, 0.8)
    val u0 = Array(0.3, 0.2, 0.1)
    // E-step at the init parameters, replicating fsRound's exact
    // operand order (p * c1 * c2 * c3 left-assoc) and quantization
    val rows = pat.map { case (g, ng) =>
      val a = g.map(_ - '0').toArray
      var pm = p0
      var pu = 1.0 - p0
      for (f <- 0 to 2) {
        pm = pm * (if (a(f) == 1) m0(f) else 1.0 - m0(f))
        pu = pu * (if (a(f) == 1) u0(f) else 1.0 - u0(f))
      }
      (a, ng, math.floor(pm / (pm + pu) * 1e8 + 0.5))
    }
    def bd(x: Double) = BigDecimal(x)
    val swn = rows.map(r => bd(r._2) * bd(r._3)).sum.toDouble
    val sun = rows.map(r => bd(r._2) * bd(1e8 - r._3)).sum.toDouble
    val nn = rows.map(_._2).sum.toDouble
    def qz(x: Double) = math.floor(x * 1e8 + 0.5) / 1e8
    val pRef = qz(swn / 1e8 / nn)
    val mRef = (0 to 2).map(f =>
      qz(rows.map(r => bd(r._2) * bd(r._3) * r._1(f)).sum.toDouble / swn))
    val uRef = (0 to 2).map(f =>
      qz(rows.map(r => bd(r._2) * bd(1e8 - r._3) * r._1(f)).sum.toDouble /
         sun))
    val got = q("q319_fs_em")
      .as[(Long, Double, Double, Double, Double, Double, Double, Double,
           Double)].collect().sortBy(_._1)
    assert(got.length == 3)
    assert(math.abs(got(0)._2 - pRef) < 1e-9, s"p ${got(0)._2} vs $pRef")
    assert(Seq(got(0)._3, got(0)._4, got(0)._5)
             .zip(mRef).forall { case (a, e) => math.abs(a - e) < 1e-9 })
    assert(Seq(got(0)._6, got(0)._7, got(0)._8)
             .zip(uRef).forall { case (a, e) => math.abs(a - e) < 1e-9 })
    // EM's ascent guarantee on the avg log-likelihood column
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._9 >= a._9 - 1e-9, s"loglik fell: $a -> $b") }
  }

  test("q316 Holt-Winters matches an in-memory triple-smoothing recursion") {
    val byEt = Tables(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("yc"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1).map { case (et, rows) =>
        (et, rows.sortBy(_._2.toString).map(_._3)) }
    val want = byEt.filter(_._2.length >= 14).toSeq.sortBy(_._1)
      .map { case (et, y) =>
        val w1 = y.take(7).sum
        val w2 = y.slice(7, 14).sum
        var l = w1.toDouble / 7.0
        var b = (w2.toDouble / 7.0 - w1.toDouble / 7.0) / 7.0
        var s0 = y.take(7).map(_.toDouble - w1.toDouble / 7.0).toVector
        var errs = BigDecimal(0)
        var nerr = 0
        for (k <- 8 to y.length) {
          val yk = y(k - 1).toDouble
          errs += BigDecimal(math.abs(yk - (l + b + s0.head)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP)
          nerr += 1
          val nl = 0.2 * (yk - s0.head) + 0.8 * (l + b)
          val nb = 0.1 * (nl - l) + 0.9 * b
          val ns = 0.05 * (yk - nl) + 0.95 * s0.head
          s0 = s0.tail :+ ns
          l = nl; b = nb
        }
        (et, y.length.toLong, l / 100.0, b / 100.0,
         (l + 7.0 * b + s0.last) / 100.0, (s0.max - s0.min) / 100.0,
         errs.toDouble / nerr / 100.0)
      }
    val got = q("q316_holt_winters")
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq.sortBy(_._1)
    assert(got.map(r => (r._1, r._2)) == want.map(r => (r._1, r._2)))
    got.zip(want).foreach { case (g, w) =>
      Seq(g._3 -> w._3, g._4 -> w._4, g._5 -> w._5, g._6 -> w._6,
          g._7 -> w._7).foreach { case (a, e) =>
        assert(math.abs(a - e) < 1e-5, s"${g._1}: $g vs $w") } }
  }

  test("q315 DoReMi mixture: α is a smoothed softmax over the excess losses") {
    val rows = q("q315_doremi_mixture")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val sumA = rows.map(_._5).sum
    assert(math.abs(sumA - 1.0) < 1e-4, s"Σα = $sumA")
    // α floors at the 0.2-uniform smoothing share and is monotone in
    // excess: the max-excess domain gets the max α
    val k = rows.length
    assert(rows.forall(_._5 >= 0.2 / k - 1e-6))
    assert(rows.maxBy(_._4)._1 == rows.maxBy(_._5)._1)
    // independent recomputation of the softmax tail from the excesses
    val wq = rows.map(r => math.floor(math.exp(r._4) * 1e8 + 0.5))
    val tw = wq.sum
    rows.zip(wq).foreach { case (r, w) =>
      val ref = math.round((0.8 * (w / tw) + 0.2 / k) * 1e6) / 1e6
      assert(math.abs(r._5 - ref) < 1e-9, s"${r._1}: ${r._5} vs $ref") }
  }

  test("q314 audioPeaks: real RIFF walk, frame argmax, first-index tie rule") {
    import operators.MultimodalExtOps.MediaCodec
    // 128 payload bytes → 64 samples → 2 complete frames; sample 7 of
    // frame 0 spikes (low byte 100), frame 1 is all-zero so the tie
    // rule must pick position 0
    val payload = new Array[Byte](128)
    payload(2 * 7) = 100
    assert(MediaCodec.audioPeaks(MediaCodec.encodeWav(payload)).toSeq ==
           Seq(7, 0))
    // a container with an extra odd-sized chunk BEFORE data: the chunk
    // walk must skip it (incl. the pad byte), not assume a 44-byte
    // layout
    val std = MediaCodec.encodeWav(payload)
    val extra = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0)
    val custom = std.slice(0, 12) ++ extra ++ std.slice(12, std.length)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val sz = custom.length - 8
    for (i <- 0 until 4) custom(4 + i) = ((sz >> (8 * i)) & 0xff).toByte
    assert(MediaCodec.audioPeaks(custom).toSeq == Seq(7, 0))
    // high byte dominates: sample 3 = 0x0100 beats sample 7 = 0x0064
    val p2 = payload.clone()
    p2(2 * 3 + 1) = 1
    assert(MediaCodec.audioPeaks(MediaCodec.encodeWav(p2)).toSeq ==
           Seq(3, 0))
  }

  test("q313 Adamic–Adar matches an in-memory wedge recomputation") {
    val pairs = operators.DedupExtOps
      .candidatePairs(Tables(spark, sf, "documents"))
      .as[(Long, Long)].collect().toSet
    val adj = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (u, es) => (u, es.map(_._2).toSet) }
    val aaOf = adj.collect {
      case (z, ns) if ns.size >= 2 && ns.size <= 64 =>
        (z, math.round(1.0 / math.log(ns.size.toDouble) * 1e6) / 1e6)
    }
    val scores = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, BigDecimal)]
    for ((z, aa) <- aaOf; u <- adj(z); w <- adj(z) if u < w
         if !pairs.contains((u, w))) {
      val (c, s0) = scores.getOrElse((u, w), (0L, BigDecimal(0)))
      scores((u, w)) = (c + 1, s0 + BigDecimal(aa))
    }
    val want = scores.toSeq
      .map { case ((u, w), (c, s0)) => (u, w, c, s0.toDouble) }
      .sortBy { case (u, w, _, s0) => (-s0, u, w) }.take(50)
    val got = q("q313_adamic_adar")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q312 Kruskal–Wallis H matches a textbook average-rank recomputation") {
    val rows = Tables(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect()
    val sorted = rows.map(_._2).sorted
    // average rank per value (ties share the mean of their positions)
    val avgRank = sorted.zipWithIndex.groupBy(_._1).map { case (v, g) =>
      (v, g.map(_._2 + 1).sum.toDouble / g.length) }
    val n = rows.length.toDouble
    val byG = rows.groupBy(_._1)
    val s0 = byG.values.map { g =>
      val r = g.map(x => avgRank(x._2)).sum
      r * r / g.length
    }.sum
    val tt = sorted.groupBy(identity).values
      .map(g => math.pow(g.length.toDouble, 3) - g.length).sum
    val hRef = (12.0 / (n * (n + 1.0)) * s0 - 3.0 * (n + 1.0)) /
      (1.0 - tt / (n * n * n - n))
    val got = q("q312_kruskal_wallis")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == byG.size && got._2 == rows.length)
    assert(math.abs(got._4 - hRef) < 1e-3,
           s"h_corrected ${got._4} vs textbook $hRef")
  }

  test("q310 round-1 weights match an in-memory gradient; loss is monotone") {
    val docs = Tables(spark, sf, "documents")
      .select(col("n_chars"), col("text"), col("source"))
      .as[(Long, String, String)].collect()
    val cells = docs
      .map { case (nc, t, src0) =>
        ((math.min(nc / 100, 15L),
          math.min(t.split(" ", -1).length / 10L, 15L)),
         if (src0.drop(3).toInt < 5) 1L else 0L) }
      .groupBy(_._1)
      .map { case (k, g) => (k, (g.size.toLong, g.map(_._2).sum)) }
    // round 1 from w = 0: σ = 0.5 exactly, so sd = sy·1e8 − n·5e7
    val sd = cells.map { case ((x1, x2), (n, sy)) =>
      (x1, x2, sy * 100000000L - n * 50000000L, n) }
    val nn = sd.map(_._4).sum.toDouble
    val g0 = sd.map(_._3).sum.toDouble
    val g1 = sd.map(t => t._3 * t._1).sum.toDouble
    val g2 = sd.map(t => t._3 * t._2).sum.toDouble
    def qz(x: Double): Double = math.floor(x * 1e8 + 5e-1) / 1e8
    val w0 = qz(0.0 + 5e-1 * g0 / 1e8 / nn)
    val w1 = qz(0.0 + 5e-1 * g1 / 1.5e1 / 1e8 / nn)
    val w2 = qz(0.0 + 5e-1 * g2 / 1.5e1 / 1e8 / nn)
    val rows = q("q310_logreg_quality")
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.length == 6)
    assert(rows(0)._2 == w0 && rows(0)._3 == w1 && rows(0)._4 == w2,
           s"round-1 weights ${rows(0)} vs reference ($w0, $w1, $w2)")
    // lr 0.5 < 1/L for ‖x‖² ≤ 3 ⇒ the descent lemma guarantees this
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 < a._5, s"log-loss not decreasing: $a -> $b") }
  }

  test("q346 BPE encode matches an in-memory leftmost-non-overlapping merge replay") {
    // ONE merge semantics: the parity window algebra must equal the
    // textbook greedy scan (merge at the leftmost unconsumed (a,b),
    // skip both, continue) — replay it per distinct word and rebuild
    // the (lang, source) card
    try {
      val merges = q("q299_bpe_train")
        .as[(Int, String, String, Long)].collect().sortBy(_._1)
        .map(m => (m._2, m._3))
      def encode(w: String): Int = {
        var syms = w.map(_.toString).toVector
        for ((a, b) <- merges) {
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
        syms.length
      }
      val docs = Tables(spark, sf, "documents")
        .select(col("lang"), col("source"), col("text"))
        .as[(String, String, String)].collect()
      val want = docs
        .map { case (l, src, t) =>
          val ws = t.split(" ").filter(_.nonEmpty)
          (l, src, ws.map(encode).map(_.toLong).sum,
           ws.map(_.length.toLong).sum, ws.nonEmpty)
        }
        .filter(_._5)
        .groupBy(r => (r._1, r._2))
        .map { case ((l, src), rs) =>
          val enc = rs.map(_._3).sum; val base = rs.map(_._4).sum
          (l, src, rs.length.toLong, base, enc,
           BigDecimal(enc.toDouble / base.toDouble)
             .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.toSeq.sortBy(r => (r._1, r._2))
      val got = q("q346_bpe_apply")
        .as[(String, String, Long, Long, Long, Double)].collect().toSeq
      assert(got == want)
    } finally PinScope.drain()
  }

  test("q345 streaming SemDeDup gate matches an in-memory TWO-LEVEL replay") {
    try {
      // run the stream first — it serves the PINNED v1 of the
      // gate-model log (r18), whose content is the two-level model
      // artifact (coarse cells 'o', replicated fine→coarse routing
      // 'f', two-level-assigned members 'm'); the replay reads the
      // artifact directly — pin ≡ artifact is GateModelSpec's claim
      val got = q("q345_stream_semdedup")
        .as[(Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
      val idx = spark.table(
        operators.SimilarityExtOps.semDedupTwoIndexTable(spark, sf))
      val coarse = idx.where(col("kind") === "o")
        .select(col("id"), col("xi"))
        .as[(Long, Array[Long])].collect().sortBy(_._1)
      // 'f' rows: id = fine cid, cid = its coarse bucket, xi = fine ci
      val fa = idx.where(col("kind") === "f")
        .select(col("cid"), col("id"), col("xi"))
        .as[(Long, Long, Array[Long])].collect()
      val members = idx.where(col("kind") === "m")
        .select(col("cid"), col("nv"), col("xi"))
        .as[(Long, Long, Array[Long])].collect()
      val odds = Tables(spark, sf, "embeddings")
        .where(col("vec_id") % 2 === 1)
        .select(col("vec_id"), expr(
          "transform(cast(embedding as array<double>), " +
            "x -> CAST(round(x * 1000000) AS BIGINT))"))
        .as[(Long, Array[Long])].collect()
      def dot(a: Array[Long], b: Array[Long]): Long =
        a.zip(b).map { case (x, y) => x * y }.sum
      def argmin(xi: Array[Long],
                 cs: Seq[(Long, Array[Long])]): Long =
        cs.map { case (c, ci) =>
          (xi.zip(ci).map { case (x, y) => (x - y) * (x - y) }.sum, c)
        }.min._2
      val want = odds.flatMap { case (vid, xi) =>
        val ccid = argmin(xi, coarse.toSeq)
        val cid = argmin(xi,
          fa.filter(_._1 == ccid).map(f => (f._2, f._3)).toSeq)
        val nb = BigInt(dot(xi, xi))
        val hits = members.filter(_._1 == cid).count { case (_, na, xa) =>
          val d = BigInt(dot(xa, xi))
          d > 0 && d * d * 10000 >= BigInt(na) * nb * 1600
        }
        if (hits > 0) Some((vid, cid, hits.toLong)) else None
      }.toSeq.sortBy(r => (r._1, r._2))
      assert(got == want)
      assert(got.nonEmpty, "gate is vacuous at this SF")
    } finally PinScope.drain()
  }

  test("q356 sqrt-cell streaming gate matches replay; no cell hits the cap") {
    try {
      // run the stream first — it builds + registers the √n model
      val got = q("q356_stream_semdedup_sqrt")
        .as[(Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
      val idx = spark.table(BucketedCache.tableName("semsqidx", sf))
      // the r15 verdict's #6 (cap honesty at volume): under the √n
      // geometry NO cell may hit SemDedupClusterCap at oracle-checked
      // SFs — the whole point of cells ∝ √n is that the volume guard
      // never truncates, so gate recall is the model's, not the
      // guard's (at 16 cells the 100× sweep measured every ~6.2k-
      // member cluster truncated and 2.7× of the dups invisible)
      val maxCell = idx.where(col("kind") === "m")
        .groupBy("cid").count().agg(max("count")).as[Long].head()
      assert(maxCell <= graft.operators.SimilarityExtOps.SemDedupClusterCap,
             s"a √n cell holds $maxCell members (> cap) — the cap " +
               "truncates and the geometry's no-truncation recall " +
               "claim is void here")
      val cents = idx.where(col("kind") === "c")
        .select(col("cid"), col("xi"))
        .as[(Long, Array[Long])].collect().sortBy(_._1)
      val members = idx.where(col("kind") === "m")
        .select(col("cid"), col("nv"), col("xi"))
        .as[(Long, Long, Array[Long])].collect()
      val odds = Tables(spark, sf, "embeddings")
        .where(col("vec_id") % 2 === 1)
        .select(col("vec_id"), expr(
          "transform(cast(embedding as array<double>), " +
            "x -> CAST(round(x * 1000000) AS BIGINT))"))
        .as[(Long, Array[Long])].collect()
      def dot(a: Array[Long], b: Array[Long]): Long =
        a.zip(b).map { case (x, y) => x * y }.sum
      val want = odds.flatMap { case (vid, xi) =>
        val cid = cents.map { case (c, ci) =>
          (xi.zip(ci).map { case (x, y) => (x - y) * (x - y) }.sum, c)
        }.min._2
        val nb = BigInt(dot(xi, xi))
        val hits = members.filter(_._1 == cid).count { case (_, na, xa) =>
          val d = BigInt(dot(xa, xi))
          d > 0 && d * d * 10000 >= BigInt(na) * nb * 1600
        }
        if (hits > 0) Some((vid, cid, hits.toLong)) else None
      }.toSeq.sortBy(r => (r._1, r._2))
      assert(got == want)
      assert(got.nonEmpty, "gate is vacuous at this SF")
    } finally PinScope.drain()
  }

  test("q340 incremental Hamming equals q300 restricted to batch-touching pairs") {
    // at sf0.001 every band bucket is under the cap on BOTH the
    // global (q300) and per-side (q340) definitions, so the index
    // tier must reproduce the full-rescan attestation tier exactly on
    // pairs touching the odd batch — one truth, two tiers (q338's
    // rule applied to the Hamming family)
    try {
      // precondition census (r15 ADVICE): the equality below holds
      // only while every cap is a no-op — q340 caps odd and even
      // bands independently while q300 caps globally, and the two
      // DIVERGE once any bucket overflows (BASELINE.md records 103k
      // vs 68k pairs at 100×). Assert the premise directly so a
      // future data change fails with the real reason, not a diff.
      val maxBucket = {
        val fps = graft.operators.DedupExtOps
          .simhash64Fps(spark, Tables(spark, sf, "documents"))
        (0 until 4).map(b =>
            fps.select(concat(lit(s"$b:"),
              substring(col("fp"), b * 16 + 1, 16)).as("bk")))
          .reduce(_ unionAll _)
          .groupBy("bk").count()
          .agg(max("count")).as[Long].head()
      }
      assert(maxBucket <= graft.operators.DedupExtOps.HotBucketCap,
             s"a band bucket holds $maxBucket docs — past the cap the " +
               "q340 per-side and q300 global cap definitions diverge " +
               "and this cross-tier identity no longer holds")
      val full = q("q300_simhash_hamming")
        .as[(Long, Long, Long)].collect().toSeq
      val want = full.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
      val got = q("q340_hamming_incremental")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == want)
      assert(got.nonEmpty, "restriction is vacuous at this SF")
    } finally PinScope.drain()
  }

  test("q341 incremental minimizer pairs equal q227 restricted to batch-touching") {
    // both tiers read the SAME persisted signature index with the
    // same wholesale per-minimizer cap, so the per-release probe must
    // be exactly the full join's batch-touching slice
    val full = q("q227_minimizer_pairs")
      .as[(Long, Long, Long)].collect().toSeq
    val want = full.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
    val got = q("q341_minimizer_incremental")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty, "restriction is vacuous at this SF")
  }

  test("q339 census is exact: arrivals = odd count, removals bounded by pairs") {
    try {
      val rows = q("q339_semdedup_incremental")
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
      val nOdd = Tables(spark, sf, "embeddings")
        .where(col("vec_id") % 2 === 1).count()
      val nEven = Tables(spark, sf, "embeddings")
        .where(col("vec_id") % 2 === 0).count()
      // every batch vector assigns to exactly one cluster
      assert(rows.map(_._3).sum == nOdd)
      // standing members of receiving clusters never exceed the corpus
      assert(rows.map(_._2).sum <= nEven)
      for (r <- rows) {
        assert(r._5 <= r._3, s"removals exceed arrivals: $r")
        assert(r._5 <= r._4, s"removals exceed dup pairs: $r")
        assert(r._6 >= 0.0 && r._6 <= 1.0, s"keep ratio out of range: $r")
      }
    } finally PinScope.drain()
  }

  test("q343 NN-descent round never worsens an edge; q344 attests both tiers") {
    // the refinement keeps the top-8 of a SUPERSET of the current
    // edges, so per-src the k-th best similarity is non-decreasing —
    // compare each src's WORST kept edge across tiers
    try {
      val em = Tables(spark, sf, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])].collect().toMap
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        BigDecimal(dot / (na * nb))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      // run the query first: it ensures + registers the graph artifact
      val refined = q("q343_nn_descent")
        .as[(Long, Long, Long, Double)].collect().toSeq
        .groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._4).min }
      val base = spark.table(BucketedCache.tableName("beamgraph", sf))
        .as[(Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (s0, es) =>
          s0 -> es.map(e => cos(em(s0), em(e._2))).min }
      for ((s0, worst) <- base)
        assert(refined(s0) >= worst - 1e-9,
               s"src $s0 worsened: $worst -> ${refined(s0)}")
      val rec = q("q344_graph_recall")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
        .sortBy(_._1)
      assert(rec.map(_._1) ==
        Seq("graph_insert", "ivf_build", "nn_descent_1"))
      for (r <- rec) assert(r._4 <= r._3 && r._5 >= 0 && r._5 <= 1000000)
    } finally PinScope.drain()
  }

  test("q350 insert covers every batch node; standing top-8s never worsen") {
    try {
      val merged = q("q350_graph_insert")
        .as[(Long, Long, Long, Double)].collect().toSeq
      // per-src degree bounded by the declared top-8, ranks contiguous
      for ((s0, es) <- merged.groupBy(_._1)) {
        assert(es.size <= 8, s"src $s0 degree ${es.size}")
        assert(es.map(_._2).sorted == (1L to es.size.toLong),
               s"src $s0 ranks not contiguous")
      }
      // every odd batch vector got linked in
      val odd = Tables(spark, sf, "embeddings")
        .where(col("vec_id") % 2 === 1).select("vec_id")
        .as[Long].collect().toSet
      val srcs = merged.map(_._1).toSet
      assert(odd.subsetOf(srcs), s"unlinked batch nodes: ${odd -- srcs}")
      // the standing merge keeps the top-8 of a SUPERSET of the stored
      // standing edges, so each standing src's WORST kept score is
      // non-decreasing vs the artifact
      val stored = spark
        .table(BucketedCache.tableName("beamgraphinc", sf))
        .where(col("kind") === "e")
        .select(col("a"), col("es")).as[(Long, Double)].collect().toSeq
        .groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._2).min }
      val after = merged.groupBy(_._1)
        .map { case (s0, es) => s0 -> es.map(_._4).min }
      for ((s0, worst) <- stored)
        assert(after(s0) >= worst - 1e-9,
               s"standing src $s0 worsened: $worst -> ${after(s0)}")
    } finally PinScope.drain()
  }

  test("q352/q353: truncation and quantization recall tiers bracket correctly") {
    try {
      val mrl = q("q352_mrl_recall")
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(mrl.map(_._1) == Seq(8L, 16L, 32L, 64L))
      for (r <- mrl) {
        assert(r._3 <= r._2, s"hits exceed truth: $r")
        assert(r._4 >= 0 && r._4 <= 1000000, s"recall out of range: $r")
      }
      // the full-dimension row is the truth joined to itself
      assert(mrl.last._4 == 1000000L, s"dims=64 self-check: ${mrl.last}")
      val sq = q("q353_sq8_recall")
        .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(sq.map(_._1) == Seq("exact", "sq8"))
      assert(sq.head._4 == 1000000L, s"exact self-check: ${sq.head}")
      assert(sq.last._3 <= sq.last._2 &&
             sq.last._4 >= 0 && sq.last._4 <= 1000000, s"sq8: ${sq.last}")
    } finally PinScope.drain()
  }

  test("q351 stop rule: every non-final row is at/above the turnover threshold") {
    try {
      val rows = q("q351_descent_converge")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(rows.nonEmpty &&
             rows.size <= operators.SimilarityExtOps.DescentRoundsCap)
      assert(rows.map(_._1) == (1L to rows.size.toLong))
      for (r <- rows) {
        assert(r._3 <= r._2, s"changed exceeds edges: $r")
        assert(r._5 >= 0 && r._5 <= 1000000, s"recall out of range: $r")
      }
      // rounds run exactly until the first sub-threshold turnover:
      // all but the last row are >= the threshold, and a final row
      // still >= threshold means the cap (not convergence) stopped it
      for (r <- rows.init)
        assert(r._4 >= operators.SimilarityExtOps.DescentStopPpm,
               s"loop continued past a converged round: $r")
      if (rows.last._4 >= operators.SimilarityExtOps.DescentStopPpm)
        assert(rows.size == operators.SimilarityExtOps.DescentRoundsCap,
               "loop stopped early without converging")
    } finally PinScope.drain()
  }

  test("q342 graph artifact degree-bounded; beam ranked and inside the node set") {
    try {
      val rows = q("q342_ann_graph_beam")
        .as[(Long, Long, Double, Int)].collect().toSeq
      assert(rows.map(_._1) == (1L to rows.length.toLong))
      rows.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 >= b._3, s"beam unsorted: $a -> $b")
        case _ =>
      }
      val g = spark.table(BucketedCache.tableName("beamgraph", sf))
        .as[(Long, Long)].collect().toSeq
      assert(g.groupBy(_._1).values.map(_.size).max <= 8,
             "out-degree exceeds the declared top-8")
      val ns = (g.map(_._1) ++ g.map(_._2)).toSet
      assert(rows.forall(r => ns.contains(r._2)),
             "beam escaped the graph's node set")
    } finally PinScope.drain()
  }

  test("q348 language-ID matches an in-memory Cavnar-Trenkle replay") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSeq
      .filter(_._3.length >= 3)
    def grams(t: String): Seq[String] =
      (0 to t.length - 3).map(i => t.substring(i, i + 3))
    def top64(cnt: Map[String, Int]): Map[String, Int] =
      cnt.toSeq.sortBy { case (g2, c) => (-c, g2) }.take(64)
        .zipWithIndex.map { case ((g2, _), r) => g2 -> (r + 1) }.toMap
    val prof = docs.filter(_._1 % 2 == 0).groupBy(_._2).map {
      case (lg, ds) =>
        lg -> top64(ds.flatMap(d => grams(d._3))
          .groupBy(identity).map { case (g2, a) => (g2, a.length) })
    }
    val langs = prof.keys.toSeq.sorted
    val want = docs.filter(_._1 % 2 == 1).map { case (_, lt, t) =>
      val dp = top64(grams(t).groupBy(identity)
        .map { case (g2, a) => (g2, a.length) })
      val pred = langs.map { lg =>
        val p = prof(lg)
        val dist = dp.map { case (g2, dr) =>
          p.get(g2).map(lr => math.abs(dr - lr)).getOrElse(64)
        }.sum
        (dist, lg)
      }.min._2
      (lt, pred)
    }.groupBy(identity).map { case ((lt, lp), a) =>
      (lt, lp, a.length.toLong)
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = q("q348_langid_train")
      .select("lang_true", "lang_pred", "n_docs")
      .as[(String, String, Long)].collect().toSeq
    assert(got == want)
    assert(got.map(_._3).sum == docs.count(_._1 % 2 == 1))
  }

  test("q349 span excision matches an in-memory replay; near-dup pair fully excised") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    val toks = docs.map { case (id, src, t) =>
      (id, src, t, t.split(" ", -1).toSeq)
    }
    // over-represented 8-gram keys (>= 2 distinct docs)
    val hot = toks.flatMap { case (id, _, _, t) =>
      (0 to t.length - 8).map(i => (t.slice(i, i + 8).mkString(" "), id))
    }.distinct.groupBy(_._1).filter(_._2.size >= 2).keySet
    val perDoc = toks.map { case (id, src, text, t) =>
      val cov = (0 to t.length - 8)
        .filter(i => hot(t.slice(i, i + 8).mkString(" ")))
        .flatMap(i => i until i + 8).toSet
      val kept = t.zipWithIndex.collect {
        case (tok, j) if !cov(j) => tok
      }.mkString(" ")
      (id, src, cov.size.toLong, (text.length - kept.length).toLong)
    }
    val want = perDoc.groupBy(_._2).map { case (src, ds) =>
      (src, ds.size.toLong, ds.count(_._3 > 0).toLong,
       ds.map(_._3).sum, ds.map(_._4).sum)
    }.toSeq.sortBy(_._1)
    val got = q("q349_span_excise")
      .select("source", "docs", "docs_excised", "tokens_removed",
              "bytes_removed")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.map(_._3).sum > 0, "excision is vacuous at this SF")
    // span-exactness on the corpus's known verbatim near-dups: any doc
    // whose FULL text occurs verbatim in another doc must be excised
    // completely (every 8-window of it is over-represented)
    val byText = docs.groupBy(_._3).filter(_._2.size >= 2)
    if (byText.nonEmpty) {
      val fully = byText.values.flatten.map(_._1).toSet
      val covById = perDoc.map(r => r._1 -> r._3).toMap
      val lenById = toks.map(r => r._1 -> r._4.length.toLong).toMap
      for (id <- fully if lenById(id) >= 8)
        assert(covById(id) == lenById(id),
               s"doc $id duplicated verbatim but not fully excised")
    }
  }
}
