package graft

import graft.core.{JsonFlatten, Jsons}
import graft.sources.RawSource
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2 item 4), using raw ScalaCheck
  * generators with fixed seeds (no scalatest bridge in the offline cache —
  * sampling is explicit and deterministic). */
class PropertiesSpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default.withSize(8), Seed(i.toLong)))

  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)), Gen.choose(-1000L, 1000L),
    Gen.choose(-10.0, 10.0), Gen.oneOf(true, false))

  private val keyGen: Gen[String] = Gen.alphaLowerStr.map(s => "k" + s.take(5))

  private def valueGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      4 -> scalarGen,
      1 -> Gen.mapOf(Gen.zip(keyGen, valueGen(depth - 1))).map(m => m.take(3): Any),
      1 -> Gen.listOf(valueGen(depth - 1)).map(l => l.take(3): Any))

  private val docGen: Gen[Map[String, Any]] =
    Gen.mapOf(Gen.zip(keyGen, valueGen(2))).map(_.take(4))

  test("one-level docs flatten to fully scalar rows (single-pass contract)") {
    // flattenValue is single-pass like the reference (utils.py:36-80): only
    // depth-1 nesting is guaranteed gone; deeper values survive as values
    // and are handled by later passes / spark.read.json struct inference.
    val shallowDoc: Gen[Map[String, Any]] =
      Gen.mapOf(Gen.zip(keyGen, valueGen(1))).map(_.take(4))
    samples(shallowDoc).foreach { doc =>
      JsonFlatten.flattenValue(doc).foreach { row =>
        row.values.foreach {
          case m: scala.collection.Map[_, _] => fail(s"nested map survived: $m in $row")
          case _ =>
        }
      }
    }
  }

  test("flattenValue row count = sum(list sizes) + dict count (or 1 if flat)") {
    samples(docGen).foreach { doc =>
      val lists = doc.values.collect { case l: Seq[_] => l.size }
      val dicts = doc.values.count(_.isInstanceOf[scala.collection.Map[_, _]])
      val expected = if (lists.isEmpty && dicts == 0) 1 else lists.sum + dicts
      assert(JsonFlatten.flattenValue(doc).size === expected, s"doc=$doc")
    }
  }

  test("source id is invariant under map insertion order") {
    samples(Gen.listOfN(4, Gen.zip(keyGen, scalarGen))).foreach { kvs0 =>
      val kvs = kvs0.distinctBy(_._1) // duplicate keys would make the two
      assert(RawSource(Seq(kvs.toMap)).getId === // maps genuinely different
        RawSource(Seq(kvs.reverse.toMap)).getId)
    }
  }

  test("canonical JSON is key-order independent") {
    samples(docGen).foreach { doc =>
      assert(Jsons.canonical(doc) === Jsons.canonical(doc.toSeq.reverse.toMap))
    }
  }

  test("whole doubles render with their fraction marker (type stability)") {
    assert(Jsons.render(Map("x" -> 8.0)) === """{"x":8.0}""")
    assert(Jsons.render(Map("x" -> 8L)) === """{"x":8}""")
    // roundtrip preserves the double-ness through spark.read.json inference
    val df = spark.read.json(
      spark.createDataset(Seq(Jsons.render(Map("v" -> 8.0))))(
        org.apache.spark.sql.Encoders.STRING))
    assert(df.schema("v").dataType.typeName === "double")
  }

  test("canonical JSON round-trips through parse") {
    val flatDoc: Gen[Map[String, Any]] = Gen.mapOf(Gen.zip(keyGen, Gen.oneOf(
      Gen.alphaNumStr.map(s => s.take(8): Any),
      Gen.choose(-1000L, 1000L).map(x => x: Any)))).map(_.take(4))
    samples(flatDoc).foreach { doc =>
      val rendered = Jsons.canonical(doc)
      assert(Jsons.canonical(Jsons.parse(rendered)) === rendered)
    }
  }

  test("cappedBucketPairs invariants: orientation, subset-of-all-pairs, small-bucket exactness") {
    import spark.implicits._
    // random bucket assignments: ids 0..n-1 over b buckets
    val assignGen = for {
      n <- Gen.choose(2, 40)
      b <- Gen.choose(1, 5)
      buckets <- Gen.listOfN(n, Gen.choose(0, b - 1))
    } yield buckets.zipWithIndex.map { case (bk, id) => (s"b$bk", id.toLong) }
    samples(assignGen, n = 12).foreach { rows =>
      val df = rows.toDF("__bucket", "id")
      val maxBucket = 5
      val pairs = graft.operators.Dedup
        .cappedBucketPairs(df, Seq("__bucket"), "id", Nil, maxBucket)
        .as[(Long, Long)].collect().toSet
      // orientation + no self-pairs
      pairs.foreach { case (a, b) => assert(a < b) }
      // subset of true co-bucket pairs
      val byBucket = rows.groupBy(_._1).values.map(_.map(_._2).sorted)
      val allPairs = byBucket.flatMap(ids =>
        for (i <- ids; j <- ids if i < j) yield (i, j)).toSet
      assert(pairs.subsetOf(allPairs))
      // buckets under the cap contribute ALL their pairs
      val smallPairs = byBucket.filter(_.size <= maxBucket).flatMap(ids =>
        for (i <- ids; j <- ids if i < j) yield (i, j)).toSet
      assert(smallPairs.subsetOf(pairs))
    }
  }

  test("slidingWindows invariants: full token coverage, chunk-count formula, disjoint reconstruction") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.choose(0, 40)
      w <- Gen.choose(1, 12)
      s <- Gen.choose(1, w)
    } yield (n, w, s)
    samples(caseGen, n = 12).foreach { case (n, w, s) =>
      val text = (0 until n).map(i => s"t$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val chunks = graft.operators.Packing.slidingWindows(df, "doc_id", "text", w, s)
        .orderBy("chunk_id")
        .select("chunk_id", "chunk_text", "n_chunk_tokens")
        .as[(Int, String, Int)].collect().toSeq
      if (n == 0) assert(chunks.isEmpty)
      else {
        // count formula: ceil(max(n-w,0)/s) + 1
        assert(chunks.size === (math.max(n - w, 0) + s - 1) / s + 1, s"(n=$n w=$w s=$s)")
        // every token index covered at least once
        val covered = chunks.flatMap(_._2.split(" ")).toSet
        assert(covered === (0 until n).map(i => s"t$i").toSet, s"(n=$n w=$w s=$s)")
        // chunk i holds exactly tokens [i*s, min(i*s+w, n))
        chunks.foreach { case (i, txt, nc) =>
          val expect = (i * s until math.min(i * s + w, n)).map(j => s"t$j")
          assert(txt === expect.mkString(" "), s"(n=$n w=$w s=$s chunk=$i)")
          assert(nc === expect.size)
        }
        // stride == window tiles the doc exactly once
        if (s == w) assert(chunks.map(_._3).sum === n)
      }
    }
  }

  test("connectedComponents equals driver-side union-find on random graphs " +
    "(30 graphs packed into one run via id-offsetting)") {
    import spark.implicits._
    // one Spark CC invocation validates ALL graphs at once: graph i's node
    // ids live in [i*1000, i*1000+999], so components can never bridge
    // graphs and the per-graph union-find answers compose directly
    val graphGen = for {
      nNodes <- Gen.choose(2, 30)
      nEdges <- Gen.choose(0, 45)
      edges <- Gen.listOfN(nEdges,
        Gen.zip(Gen.choose(0L, nNodes - 1L), Gen.choose(0L, nNodes - 1L)))
    } yield edges
    val graphs = samples(graphGen, n = 30).zipWithIndex.map { case (es, i) =>
      es.map { case (a, b) => (i * 1000L + a, i * 1000L + b) }
    }
    val allEdges = graphs.flatten ++ Seq((7L, 7L)) // self-loop noise
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        if (a != b) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      // canonical root = min id of the component (find after min-rooting
      // unions keeps the smaller id as root)
      val nodes = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(n => n -> find(n)).toMap
    }
    val want = unionFind(allEdges)
    val got = graft.operators.DupClusters
      .connectedComponents(allEdges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got === want,
      s"diff=${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
  }

  test("asof join equals a brute-force reference on random keyed series " +
    "(all strategies, with and without tolerance)") {
    import spark.implicits._
    // distinct rt per key — equal right timestamps within a key would make
    // the window's pick among them order-dependent, which is out of contract
    val caseGen = for {
      leftRows <- Gen.listOfN(40, Gen.zip(
        Gen.choose(1L, 3L),
        Gen.frequency(9 -> Gen.choose(0L, 100L).map(Option(_)), 1 -> Gen.const(Option.empty[Long]))))
      rts <- Gen.listOfN(3, Gen.listOfN(25, Gen.choose(0L, 100L)).map(_.distinct))
    } yield (leftRows, rts)
    def refPick(t: Option[Long], cands: Seq[Long], strategy: String): Option[Long] = t.flatMap { lt =>
      val back = cands.filter(_ <= lt).sorted.lastOption
      val fwd = cands.filter(_ >= lt).sorted.headOption
      strategy match {
        case "backward" => back
        case "forward" => fwd
        case "nearest" => (back, fwd) match {
          case (Some(b), Some(f)) => if (math.abs(f - lt) < math.abs(b - lt)) Some(f) else Some(b)
          case (b, f) => b.orElse(f)
        }
      }
    }
    samples(caseGen, n = 3).foreach { case (leftRows, rts) =>
      val left = leftRows.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "t", "idx")
      val rightRows = rts.zipWithIndex.flatMap { case (ts, ki) =>
        ts.map(rt => (ki + 1L, rt, rt * 10.0 + ki)) }
      val right = rightRows.toDF("k", "rt", "v")
      val byKey = rightRows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap.withDefaultValue(Nil)
      for (strategy <- Seq("backward", "forward", "nearest"); tol <- Seq(None, Some(7.0))) {
        val got = graft.operators.AsofJoin(
            left, right, Seq("k"), "t", "rt", Seq("v"), strategy, tolerance = tol)
          .select($"idx", $"asof_v").as[(Long, Option[Double])].collect().toMap
        leftRows.zipWithIndex.foreach { case ((k, t), i) =>
          val picked = refPick(t, byKey(k), strategy)
            .filter(rt => tol.forall(tl => math.abs(rt - t.get) <= tl.toLong))
          val want = picked.map(rt => rt * 10.0 + (k - 1))
          assert(got(i.toLong) === want,
            s"strategy=$strategy tol=$tol k=$k t=$t -> got=${got(i.toLong)} want=$want")
        }
      }
    }
  }

  test("removeDuplicateSpans equals a driver-side reference on random " +
    "small-vocab corpora (heavy span overlap)") {
    import spark.implicits._
    // 5-token vocab over 10 docs of <= 12 tokens: shared 3-grams are
    // everywhere, so overlapping and adjacent covered spans — the hard
    // part of the RANGE-frame coverage — occur in nearly every sample
    val vocab = Vector("a", "b", "c", "d", "e")
    val spanN = 3
    val docGen = Gen.listOfN(10,
      Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))))
    samples(docGen, n = 4).foreach { docsToks =>
      val docs = docsToks.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
      val gramDocs = scala.collection.mutable.Map
        .empty[Seq[String], scala.collection.mutable.Set[Long]]
      toks.foreach { case (id, ts) =>
        if (ts.size >= spanN)
          ts.sliding(spanN).foreach(g =>
            gramDocs.getOrElseUpdate(g.toList, scala.collection.mutable.Set.empty) += id)
      }
      val dup = gramDocs.collect { case (g, ids) if ids.size >= 2 => g }.toSet
      val want = toks.map { case (id, ts) =>
        val cov = Array.fill(ts.size)(false)
        for (i <- 0 to ts.size - spanN; if dup.contains(ts.slice(i, i + spanN).toList))
          (i until i + spanN).foreach(cov(_) = true)
        val kept = ts.indices.filterNot(cov).map(ts)
        id -> ((kept.mkString(" "), kept.size, ts.size - kept.size))
      }.toMap
      val got = graft.operators.Dedup.removeDuplicateSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", spanN = spanN)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
      assert(got === want, s"docs=$docs")
    }
  }

  test("winnowFingerprints equals a driver reference: bottom-k of shingle " +
    "md5s, duplicates kept, shingle-less docs get the empty fingerprint") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val vocab = Vector("a", "b", "c", "d")
    val docGen = Gen.listOfN(8,
      Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))))
    samples(docGen, n = 4).foreach { docsToks =>
      val docs = docsToks.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      val want = docs.map { case (id, t) =>
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val shingles =
          if (toks.size < 3) Seq.empty[String]
          else toks.sliding(3).map(_.mkString(" ")).toSeq
        id -> shingles.map(md5hex).sorted.take(4).mkString("|")
      }.toMap
      val got = graft.operators.Dedup.winnowFingerprints(
          docs.toDF("doc_id", "text"), "doc_id", "text", shingleN = 3, k = 4)
        .as[(Long, String)].collect().toMap
      assert(got === want, s"docs=$docs")
    }
  }

  test("removeDuplicateLines equals a driver reference on random line " +
    "corpora (blank lines exempt, order preserved, empty-doc row kept)") {
    import spark.implicits._
    // tiny line vocab so cross-doc recurrence (the boilerplate condition)
    // is common; includes blank and whitespace-only lines
    val lineVocab = Vector("nav bar", "cookie notice", "body one",
      "body two", "body three", "", "  ")
    val docGen = Gen.listOfN(8,
      Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf(lineVocab))))
    samples(docGen, n = 4).foreach { docsLines =>
      val docs = docsLines.zipWithIndex.map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
      val split = docs.map { case (id, t) => id -> t.split("\n", -1).toSeq }
      val boiler = split.flatMap { case (id, ls) =>
        ls.filter(_.trim.nonEmpty).distinct.map(_ -> id)
      }.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val want = split.map { case (id, ls) =>
        val kept = ls.filterNot(boiler.contains)
        id -> ((kept.mkString("\n"), kept.size, ls.size - kept.size))
      }.toMap
      val got = graft.operators.LineDedup.removeDuplicateLines(
          docs.toDF("doc_id", "text"), "doc_id", "text", minDocs = 2)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
      assert(got === want, s"docs=$docs")
    }
  }

  test("assignSessions equals a driver reference on random event streams " +
    "(null timestamps join the final session)") {
    import spark.implicits._
    val evGen = Gen.listOfN(60, Gen.zip(
      Gen.choose(1L, 3L),
      Gen.frequency(9 -> Gen.choose(0L, 500L).map(Option(_)), 1 -> Gen.const(Option.empty[Long]))))
    samples(evGen, n = 4).foreach { evs0 =>
      val evs = evs0.zipWithIndex.map { case ((u, ts), i) => (u, ts, i.toLong) }
      val want = evs.groupBy(_._1).flatMap { case (_, es) =>
        // ts asc nulls last, id tiebreak — the operator's documented order
        val sorted = es.sortBy { case (_, ts, id) => (ts.isEmpty, ts.getOrElse(0L), id) }
        var sess = 0L
        var prev = Option.empty[Long]
        sorted.map { case (_, ts, id) =>
          // a null ts has a null gap -> never a break -> stays in session
          if (prev.nonEmpty && ts.nonEmpty && ts.get - prev.get > 60L) sess += 1
          if (ts.nonEmpty) prev = ts
          id -> sess
        }
      }
      val df = evs.map { case (u, ts, id) =>
        (u, ts.map(s => new java.sql.Timestamp(s * 1000L)).orNull, id)
      }.toDF("user_id", "ts", "event_id")
      val got = graft.operators.Sessionize.assignSessions(
          df, "user_id", "ts", "event_id", gapSeconds = 60)
        .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
      assert(got === want, s"evs=$evs")
    }
  }

  test("sampleMixture invariants: integer weights copy exactly, fractional " +
    "weights are monotone and unbiased, zero drops the source") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => (if (i % 2 == 0) "a" else "b", s"k$i"))
    val df = rows.toDF("src", "key")
    def run(wa: Double, wb: Double): Seq[(String, String, Int)] =
      graft.operators.Mixture.sampleMixture(
          df, "src", "key", Map("a" -> wa, "b" -> wb), salt = "s1")
        .as[(String, String, Int)].collect().toSeq
    // integer weight: exactly w copies of EVERY row; zero drops the source
    val exact = run(2.0, 0.0)
    assert(exact.forall(_._1 == "a"))
    assert(exact.size === 1000 * 2)
    assert(exact.groupBy(_._2).values.forall(_.map(_._3).sorted == Seq(0, 1)))
    // fractional: unbiased within 3 sigma and MONOTONE in w (documented:
    // raising a weight never drops a previously kept copy)
    val lo = run(0.3, 1.0).filter(_._1 == "a").map(r => (r._2, r._3)).toSet
    val hi = run(0.6, 1.0).filter(_._1 == "a").map(r => (r._2, r._3)).toSet
    assert(lo.subsetOf(hi), s"monotonicity violated: ${(lo diff hi).take(5)}")
    def within3Sigma(got: Int, n: Int, p: Double): Boolean =
      math.abs(got - n * p) <= 3 * math.sqrt(n * p * (1 - p)) + 1
    assert(within3Sigma(lo.size, 1000, 0.3), s"lo=${lo.size}")
    assert(within3Sigma(hi.size, 1000, 0.6), s"hi=${hi.size}")
    // w = 1.3: every row keeps copy 0; ~30% gain a second copy
    val rep = run(1.3, 1.0).filter(_._1 == "a")
    assert(rep.count(_._3 == 0) === 1000)
    assert(within3Sigma(rep.count(_._3 == 1), 1000, 0.3), s"rep1=${rep.count(_._3 == 1)}")
  }

  test("bloomDecontaminate never false-negatives: its survivors are a " +
    "subset of the exact overlap filter's on random corpora") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val caseGen = for {
      docs <- Gen.listOfN(20, Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))))
      benchPick <- Gen.listOfN(5, Gen.choose(0, 19))
    } yield (docs, benchPick)
    samples(caseGen, n = 3).foreach { case (docsToks, benchPick) =>
      val docs = docsToks.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      // benchmark = a few doc texts verbatim (guaranteed contamination
      // when the doc has >= shingleN tokens) plus an unrelated row
      val bench = (benchPick.map(i => docs(i)._2) :+ "zz yy xx ww vv").toDF("text")
      val corpus = docs.toDF("doc_id", "text")
      val exact = graft.operators.Decontaminate.removeContaminated(
          corpus, "doc_id", "text", bench, "text", shingleN = 3, minHits = 1)
        .select($"doc_id").as[Long].collect().toSet
      val bloom = graft.operators.Decontaminate.bloomDecontaminate(
          corpus, "doc_id", "text", bench, "text", shingleN = 3)
        .select($"doc_id").as[Long].collect().toSet
      // bloom may over-drop (hash collisions at the fpp rate) but must
      // NEVER keep a doc the exact filter drops
      assert(bloom.subsetOf(exact),
        s"bloom kept contaminated docs: ${(bloom diff exact).take(5)}")
    }
  }

  test("KMV merge equals the sketch of the union for arbitrary shard splits") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.choose(1, 120)
      cut <- Gen.choose(0, n)
      dup <- Gen.choose(0, 30) // overlap re-inserted on both sides
    } yield (n, cut, dup)
    samples(caseGen, n = 8).foreach { case (n, cut, dup) =>
      val all = (0 until n).map(i => ("g", s"v$i"))
      val a = (all.take(cut) ++ all.take(dup)).toDF("g", "v")
      val b = (all.drop(cut) ++ all.take(dup)).toDF("g", "v")
      val k = 16
      val merged = graft.operators.Sketch.kmvMerge(
        graft.operators.Sketch.kmvSketch(a, "v", "g", k),
        graft.operators.Sketch.kmvSketch(b, "v", "g", k), "g", k)
      val whole = graft.operators.Sketch.kmvSketch(all.toDF("g", "v"), "v", "g", k)
      assert(merged.exceptAll(whole).count() === 0, s"(n=$n cut=$cut dup=$dup)")
      assert(whole.exceptAll(merged).count() === 0, s"(n=$n cut=$cut dup=$dup)")
    }
  }

  test("editDistancePairs equals driver-side levenshtein on random low-alphabet " +
    "strings (one Spark run via id-striping; lengths straddle the short-block cut)") {
    import spark.implicits._
    // alphabet {a,b,c} maximizes near-collisions; lengths 0..12 cross the
    // d=2 segment-path boundary (len 6) in both directions
    val strGen = for {
      len <- Gen.choose(0, 12)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    // corpus i occupies ids [i*100, i*100+29]; cross-corpus pairs are
    // excluded from BOTH sides of the differential (id stripe filter)
    val corpora = (0 until 12).map { i =>
      samples(strGen, n = 30).zipWithIndex.map { case (s, j) => (i * 100L + j, s) }
    }
    val all = corpora.flatten
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      c <- corpora; (ia, sa) <- c; (ib, sb) <- c
      if ia < ib && lev(sa, sb) <= 2
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
    val got = graft.operators.Dedup
      .editDistancePairs(all.toDF("doc_id", "k"), "doc_id", "k", maxDist = 2)
      .as[(Long, Long, Long)].collect()
      .filter { case (a, b, _) => a / 100 == b / 100 } // same stripe only
      .toSet
    assert(want.nonEmpty, "generator produced no in-range pairs — tighten it")
    assert(got === want,
      s"missing=${(want diff got).take(5)} extra=${(got diff want).take(5)}")
  }

  test("heavyHitters equals the exact threshold count on random zipf-ish " +
    "streams, under eviction, for every summary size that honors the guarantee") {
    import spark.implicits._
    val streamGen = for {
      nKeys <- Gen.choose(3, 25)
      rows <- Gen.listOfN(400, Gen.choose(1, nKeys).map(i => s"k${i * i % nKeys}"))
    } yield rows
    for ((rows, i) <- samples(streamGen, n = 6).zipWithIndex) {
      val n = rows.size.toLong
      val fMicro = 50000L // 5%
      val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * 1000000L >= n * fMicro }.toMap
      for (k <- Seq(21, 64)) { // 21 is the tightest size with (k+1)f > 1
        val got = graft.operators.Sketch
          .heavyHitters(rows.toDF("key").repartition(5), "key", 0.05, summarySize = k)
          .select("key", "count").as[(String, Long)].collect().toMap
        assert(got === want, s"case $i k=$k: got ${got.size} want ${want.size}")
      }
    }
  }
}
