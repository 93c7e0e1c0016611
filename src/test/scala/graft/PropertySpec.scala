package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (SURVEY.md §5.2 item 3), via plain
  * ScalaCheck (no scalatest bridge in the dependency set). JVM-side
  * properties run at full volume; Spark-backed ones use a reduced case
  * count (each case is a full job). */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("Det.round4 matches BigDecimal HALF_UP") {
    check(Prop.forAll(Gen.choose(-1.0, 1.0)) { x =>
      Det.round4(x) ==
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    })
  }

  test("GeoMeanAgg merge is associative and commutative on buffers") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0.1, 1000.0))) { xs =>
      val a = xs.foldLeft(functions.GeoMeanAgg.zero)(functions.GeoMeanAgg.reduce)
      val (l, r) = xs.splitAt(xs.length / 2)
      val lb = l.foldLeft(functions.GeoMeanAgg.zero)(functions.GeoMeanAgg.reduce)
      val rb = r.foldLeft(functions.GeoMeanAgg.zero)(functions.GeoMeanAgg.reduce)
      val merged = functions.GeoMeanAgg.merge(rb, lb)
      merged._2 == a._2 &&
        math.abs(merged._1 - a._1) <= 1e-9 * math.max(1.0, math.abs(a._1))
    })
  }

  test("lshSign is invariant under positive scaling and flips under negation") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def sig(v: Array[Double]): String =
      org.apache.spark.sql.graft.VectorKernels
        .lshSign(ArrayData.toArrayData(v), 16).toString
    val vecGen = Gen.listOfN(64, Gen.choose(-1.0, 1.0)).map(_.toArray)
    check(Prop.forAll(vecGen, Gen.choose(0.1, 100.0)) { (v, c) =>
      // sign(dot(c·v, p)) == sign(dot(v, p)) for c > 0: bucket
      // assignment depends only on direction, the property that makes
      // the signature a valid cosine-LSH family
      sig(v.map(_ * c)) == sig(v)
    }, n = 50)
    check(Prop.forAll(vecGen) { v =>
      val s = sig(v); val f = sig(v.map(-_))
      // negation flips every strictly-signed bit (dot -> -dot; only an
      // exactly-zero dot maps '0'->'0', measure-zero for random v)
      s.zip(f).forall { case (a, b) => a != b } || v.forall(_ == 0.0)
    }, n = 50)
  }

  test("MinHashBandKeys kernel equals a from-scratch Scala reference") {
    // independent reference: MessageDigest md5 hex → doubled-string
    // rotations → String minima → "j:" band concat, on plain Scala
    // collections. The kernel (lazy rotation compare, UTF8String path)
    // must agree on arbitrary token lists — including empty tokens,
    // unicode, and <3-token lists (both → empty).
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def reference(toks: List[String], nHashes: Int, bands: Int): Seq[String] = {
      val shingles = toks.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toList
      if (shingles.isEmpty) return Seq.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val hexes = shingles.map { sh =>
        md.reset()
        md.digest(sh.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      val minima = (0 until nHashes).map { r =>
        hexes.map(h => h.substring(4 * r) + h.substring(0, 4 * r)).min
      }
      val rpb = nHashes / bands
      (0 until bands).map(j =>
        s"$j:" + (0 until rpb).map(r => minima(j * rpb + r)).mkString)
    }
    def kernel(toks: List[String], nHashes: Int, bands: Int): Seq[String] = {
      val arr = ArrayData.toArrayData(
        toks.map(UTF8String.fromString).toArray[Any])
      val out = org.apache.spark.sql.graft.MinHashKernels
        .bandKeys(arr, nHashes, bands)
      (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
    }
    val tokGen = Gen.oneOf(Gen.alphaLowerStr.map(_.take(6)),
                           Gen.const(""), Gen.const("déjà"))
    val docGen = Gen.listOf(tokGen)
    check(Prop.forAll(docGen) { toks =>
      kernel(toks, 8, 4) == reference(toks, 8, 4) &&
        kernel(toks, 4, 2) == reference(toks, 4, 2)
    }, n = 200)
  }

  test("cosine kernel: ArrayData path is bit-equal to the primitive path") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val vecGen = Gen.listOfN(64, Gen.choose(-1.0, 1.0)).map(_.toArray)
    check(Prop.forAll(vecGen, vecGen) { (x, y) =>
      val k = org.apache.spark.sql.graft.VectorKernels
      k.cosine(ArrayData.toArrayData(x), ArrayData.toArrayData(y)) ==
        k.cosine(x, y)
    }, n = 100)
  }

  test("stored-norm decomposition dot/(na*nb) is bit-equal to fused cosine") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    // the re-rank contract of q56/q71/q73: for equal-length vectors
    // (dim=64 embedding contract) splitting the fused kernel into a
    // stored norm per vector + a dot per pair changes no bits
    val vecGen = Gen.listOfN(64, Gen.choose(-1.0, 1.0)).map(_.toArray)
    check(Prop.forAll(vecGen, vecGen) { (x, y) =>
      val k = org.apache.spark.sql.graft.VectorKernels
      val (ax, ay) = (ArrayData.toArrayData(x), ArrayData.toArrayData(y))
      k.dot(ax, ay) / (k.norm(ax) * k.norm(ay)) == k.cosine(ax, ay)
    }, n = 100)
  }

  test("BpeDict tokenization is a partition of the word (lossless, order-preserving)") {
    // ∀ words, ∀ merge tables: concatenating the tokens reconstructs
    // the word exactly — BPE merges only ever JOIN adjacent tokens,
    // never drop, reorder or rewrite content. Random words over a
    // 3-char alphabet (seeded) × three vocab choices, plus edge cases.
    val rnd = new scala.util.Random(7)
    val vocabs = Seq(
      operators.TextExtOps.BpeMerges.toArray,
      operators.TextExtOps.BpeMergesFull.toArray,
      Array("a" -> "a", "aa" -> "aa", "b" -> "a", "ba" -> "ba"))
    val words = (0 until 300).map(_ =>
      (0 until rnd.nextInt(30)).map(_ => "abe"(rnd.nextInt(3))).mkString) ++
      Seq("", "a", "er", "erer", "aaaa", "the quick".replace(" ", ""))
    for (m <- vocabs; w <- words) {
      val toks = functions.BpeDict.tokenize(m, w)
      assert(toks.mkString == w, s"lossy tokenization of '$w'")
      assert(toks.forall(_.nonEmpty) || w.isEmpty)
    }
  }

  test("WordCountJob reduce: any partitioning yields the same totals") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaLowerStr.map(_.take(3))),
                      Gen.choose(1, 5)) { (words, nChunks) =>
      val job = new mr.WordCountJob()
      val whole = job.map(Iterator(words.mkString(" ")))
      val chunks = words.grouped(math.max(1, words.length / nChunks + 1))
        .map(c => job.map(Iterator(c.mkString(" ")))).toList
      chunks.foldLeft(job.zero)(job.reduce) == whole
    })
  }

  test("groupBy sums partition the grand total (5 Spark cases)") {
    check(Prop.forAll(
      Gen.listOfN(30, Gen.zip(Gen.choose(0, 4), Gen.choose(-100L, 100L)))) {
      pairs =>
        pairs.isEmpty || {
          val df = pairs.toDF("k", "v")
          val total = df.agg(org.apache.spark.sql.functions.sum("v"))
            .as[Long].collect().head
          val parts = df.groupBy("k")
            .agg(org.apache.spark.sql.functions.sum("v").as("s"))
            .select("s").as[Long].collect().sum
          parts == total
        }
    }, n = 5)
  }

  test("connectedComponents equals union-find on random graphs (5 Spark cases)") {
    // the q82 fixpoint loop vs an in-memory union-find reference on
    // arbitrary undirected pair sets (not just LSH near-cliques)
    val pairGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
        .distinct)
    check(Prop.forAll(pairGen) { pairs =>
      pairs.isEmpty || {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
          .map(n => n -> find(n)).toMap
        val got = operators.DedupExtOps
          .connectedComponents(pairs.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        got == expected
      }
    }, n = 5)
  }

  test("connectedComponentsBounded equals the distributed fixpoint's labels (5 Spark cases)") {
    // the r19 one-task fold (q278's grid-bounded graphs) must produce
    // the IDENTICAL (id, lbl) relation as the min-label fixpoint on
    // arbitrary undirected pair sets — the wrapper's own reference
    // union-find is implemented independently above, so compare against
    // the fixpoint directly (two algorithms, one relation)
    val pairGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
        .distinct)
    check(Prop.forAll(pairGen) { pairs =>
      pairs.isEmpty || {
        val df = pairs.toDF("id_a", "id_b")
        val got = operators.DedupExtOps
          .connectedComponentsBounded(df)
          .as[(Long, Long)].collect().toMap
        val expected = operators.DedupExtOps
          .connectedComponents(df)
          .as[(Long, Long)].collect().toMap
        got == expected
      }
    }, n = 5)
  }

  test("large-star/small-star components equal union-find on long-path graphs") {
    // the O(log n) variant's weak spot coverage is the fixpoint's
    // strength and vice versa: long CHAINS are where O(diameter)
    // min-label propagation degrades, so the star variant is exercised
    // on a long shuffled path (diameter ~ n) plus random chords — and
    // must still produce exactly the union-find components
    val caseGen = for {
      n <- Gen.choose(8, 40)
      perm <- Gen.const(scala.util.Random.shuffle((0L until 100L).toList).take(n))
      extra <- Gen.listOfN(4, Gen.zip(Gen.choose(0L, 99L), Gen.choose(0L, 99L)))
    } yield (perm.sliding(2).map(p => (p.head, p.last)).toList ++ extra)
      .collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
      .distinct
    check(Prop.forAll(caseGen) { pairs =>
      pairs.isEmpty || {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
          .map(n => n -> find(n)).toMap
        val got = operators.DedupExtOps
          .connectedComponents(pairs.toDF("id_a", "id_b"), variant = "star")
          .as[(Long, Long)].collect().toMap
        got == expected
      }
    }, n = 4)
  }

  test("star and minlabel variants agree on a long path") {
    // direct cross-check of the two declared variants on the shape that
    // separates them (diameter = node count)
    val path = (0 until 12).map(i => (i * 7L % 97L, (i + 1) * 7L % 97L))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toList
    val df = path.toDF("id_a", "id_b")
    val a = operators.DedupExtOps.connectedComponents(df, variant = "minlabel")
      .as[(Long, Long)].collect().toMap
    val b = operators.DedupExtOps.connectedComponents(df, variant = "star")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("SpaceSaving: over-capacity error bounds and heavy-hitter recall") {
    val agg = new functions.SpaceSavingAgg(4)
    val streamGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e",
                                                 "f", "g", "h"))
    check(Prop.forAll(streamGen) { xs =>
      val b = xs.foldLeft(agg.zero)(agg.reduce)
      val truth = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      // tracked counts bracket the truth: true <= est <= true + err
      val bounds = b.forall { case (t, (est, err)) =>
        val tr = truth.getOrElse(t, 0L)
        tr <= est && est - err <= tr
      }
      // any value with frequency > n/k must be tracked
      val recall = truth.forall { case (t, c) =>
        c <= xs.length / 4 || b.contains(t)
      }
      bounds && recall
    })
  }

  test("SpaceSaving merge of over-capacity sketches keeps the bracket guarantee") {
    // the regime r6's merge got wrong: both sides are PAST capacity, so
    // a key tracked in one sketch may have been evicted from the other
    // after real occurrences — the merge must compensate with the other
    // side's eviction floor or it under-estimates (ADVICE r6: with k=1,
    // merge({a:(5,0)}, {b:(4,3)}) where 'a' saw 3 occurrences on the
    // right must yield est(a) >= 8, not 5)
    val agg = new functions.SpaceSavingAgg(4)
    val streamGen = Gen.nonEmptyListOf(Gen.oneOf(
      (1 to 12).map(i => ('a' + i - 1).toChar.toString)))
    check(Prop.forAll(streamGen, streamGen) { (l, r) =>
      val xs = l ++ r
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
                             r.foldLeft(agg.zero)(agg.reduce))
      val truth = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      // every tracked counter still brackets the truth after the merge
      val bounds = merged.forall { case (t, (est, err)) =>
        val tr = truth.getOrElse(t, 0L)
        tr <= est && est - err <= tr
      }
      // any value with frequency > 2n/k survives the post-merge top-k
      // truncation (the merged summary's guarantee degrades to the SUM
      // of the two sketches' error floors, i.e. 2n/k for equal halves)
      val recall = truth.forall { case (t, c) =>
        c <= 2 * xs.length / 4 || merged.contains(t)
      }
      bounds && recall
    })
  }

  test("SpaceSaving at capacity >= distinct is exact under any merge split") {
    val agg = new functions.SpaceSavingAgg(64)
    val streamGen = Gen.nonEmptyListOf(Gen.oneOf((1 to 31).map(_.toString)))
    check(Prop.forAll(streamGen, Gen.choose(0, 100)) { (xs, cut) =>
      val (l, r) = xs.splitAt(cut % (xs.length + 1))
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
                             r.foldLeft(agg.zero)(agg.reduce))
      agg.finish(merged) ==
        xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    })
  }

  test("sha2-dedup is idempotent (5 Spark cases)") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(8)))) {
      texts =>
        import org.apache.spark.sql.functions._
        val df = texts.toDF("text")
        val once = df.groupBy(sha2(col("text"), 256))
          .agg(count(lit(1)))
        once.count() == texts.distinct.length.toLong
    }, n = 5)
  }

  test("q202 closed form equals the sequential clamped fold") {
    // the window formulation's whole claim: b_i = prefix_i −
    // min(0, min_{j≤i} prefix_j) reproduces the non-associative
    // recurrence b_i = max(0, b_{i−1} + δ_i) — final balance,
    // forfeited total, AND the per-step floored indicator
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-5000L, 5000L))) {
      deltas =>
        // sequential reference
        var bal = 0L; var floored = 0
        deltas.foreach { d =>
          if (bal + d < 0) { floored += 1; bal = 0L } else bal += d
        }
        // closed form
        val prefixes = deltas.scanLeft(0L)(_ + _).tail
        val runmins = prefixes.scanLeft(Long.MaxValue)(math.min).tail
        val finalBal = prefixes.last - math.min(0L, runmins.last)
        val flooredCf = prefixes.zipWithIndex.count { case (p, i) =>
          p < math.min(0L, if (i == 0) Long.MaxValue else runmins(i - 1))
        }
        finalBal == bal && flooredCf == floored
    })
  }
}
