package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 8x scaling probe for the exact-similarity/sketch operators: replicate
  * the documents table R times with DECORRELATED replicas, run an operator
  * at 1x and Rx, and print wall seconds + output rows. "Would this survive
  * 100 TB" can't be answered at one fixture size — the probe answers the
  * next-best local question: does cost grow ~linearly when the corpus
  * grows 8x while per-shard structure stays constant?
  *
  * Decorrelation per op (replicas must not match each other, or the pair
  * space grows quadratically BY CONSTRUCTION and measures nothing):
  *  - edit join: replica i's text maps a-z onto a DISJOINT unicode
  *    alphabet block (translate, U+0100 + 26i; replica 0 = identity) —
  *    a bijection on chars, so WITHIN-replica edit structure is exactly
  *    replica 0's, while cross-replica segment/gram universes are truly
  *    disjoint. Neither a salt PREFIX (content substrings still shared)
  *    nor a rotation cipher (rotations permute the SAME value space, so
  *    replica 0's "bc" collides with replica 1's rotated "ab") is enough:
  *    both leave join-key values shared across replicas, and the
  *    candidate equi-join then pays an R^2 blow-up that verify silently
  *    discards (measured: 39x and 12x time for 8x rows — the probe's
  *    first two versions). Expected: output rows exactly Rx the 1x count.
  *  - heavy hitters: every TOKEN gets a per-replica prefix, making the
  *    shingle universes orthogonal across replicas; the fraction scales
  *    1/R so the per-replica cut is unchanged. The base fraction (80µ)
  *    divides exactly by R in integer micros — 5e-5/8 would round 6.25µ
  *    down to 6µ and admit extra rows. Expected: rows exactly Rx.
  *
  * Usage: ScaleProbe <sfDir> [R=8]   (SPARK_GRAFT_CPUS to size local[N]) */
object ScaleProbe {

  /** Session handle for [[time]]'s per-leg cleanup (set once in main). */
  private var session: org.apache.spark.sql.SparkSession = _

  /** Time one leg, then RELEASE the staged state it created: every leg
    * localCheckpoints intermediates (minhash sets, SNM ranks, containment
    * postings), and without an unpersist the checkpoints ACCUMULATE across
    * legs — by the containment legs the executor heap is mostly dead stage
    * blocks and the measurement reads GC, not the operator (measured: the
    * maxDf leg swung 11 s ↔ 216 s at 8x run-to-run before this). Cleanup is
    * the Bench per-query DELTA pattern — only RDDs persisted DURING this
    * leg are released, never pre-existing state: a blanket unpersist kills
    * the incremental-dedup leg's standing index, whose localCheckpoint
    * lineage is truncated and cannot recompute
    * (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). Cleanup runs OUTSIDE the timed
    * region. */
  private def time[T](f: => T): (T, Double) = {
    val before: Set[Int] =
      if (session == null) Set.empty
      else session.sparkContext.getPersistentRDDs.keySet.toSet
    val t0 = System.nanoTime()
    val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    if (session != null) {
      // BLOCKING: an async unpersist leaves the previous leg's dead blocks
      // on the heap while the next leg is being timed (measured: the leg
      // after the 95 s uncut-containment 8x read 77 s for work that takes
      // ~7 s in isolation — the timer was mostly watching old-gen GC)
      session.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.gc() // off the clock: start the next leg on a settled heap
    }
    (r, dt)
  }

  private def saltChar(i: Int): String = ('a' + i).toChar.toString

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val r = args.lift(1).map(_.toInt).getOrElse(8)
    require(r >= 2 && r <= 20,
      s"replicas must be in [2, 20] (salt chars and alphabet blocks), got $r")
    // the heavy-hitters leg scales its 80-micro base fraction by 1/R in
    // INTEGER micros; a non-divisor R would round the per-replica cut and
    // silently break the documented rows-exactly-Rx invariant
    require(80 % r == 0,
      s"replicas must divide 80 (exact integer-micro heavy-hitter cut: " +
        s"80µ/R), got $r — use 2, 4, 5, 8, 10, 16 or 20")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    session = spark
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).filter(col("text").isNotNull)

    // ---- edit join: per-replica disjoint alphabet, replica 0 = identity
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def editFrame(reps: Int): DataFrame = (0 until reps).map { i =>
      val block =
        if (i == 0) alpha
        else (0 until 26).map(c => (0x100 + 26 * i + c).toChar).mkString
      docs.select((col("doc_id") * r + i).as("doc_id"),
        translate(col("text"), alpha, block).as("text"))
    }.reduce(_ unionByName _)
    def editRun(reps: Int): Long =
      graft.operators.Dedup.editDistancePairs(
        editFrame(reps).select(col("doc_id"), substring(col("text"), 1, 16).as("k")),
        "doc_id", "k", maxDist = 2).count()

    // ---- heavy hitters: orthogonal token universes, corpus-relative cut
    def hhFrame(reps: Int): DataFrame = (0 until reps).map { i =>
      docs.select((col("doc_id") * r + i).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", saltChar(i) + "_$1").as("text"))
    }.reduce(_ unionByName _)
    def hhRun(reps: Int, frac: Double): Long =
      graft.operators.Sketch.heavyHitters(
        graft.operators.Dedup.shingleRows(hhFrame(reps), "doc_id", "text", 3),
        "shingle", minFraction = frac).count()

    time(editRun(1)) // codegen + stager warm-up, discarded (cleanup after)
    val (e1, te1) = time(editRun(1))
    val (eR, teR) = time(editRun(r))
    println(f"edit_join 1x: $te1%.1fs $e1 pairs | ${r}x: $teR%.1fs $eR pairs" +
      f" (ratio ${teR / te1}%.2fx time, ${eR.toDouble / e1}%.2fx rows)")

    time(hhRun(1, 0.00008))
    val (h1, th1) = time(hhRun(1, 0.00008))
    val (hR, thR) = time(hhRun(r, 0.00008 / r))
    println(f"heavy_hitters 1x: $th1%.1fs $h1 rows | ${r}x: $thR%.1fs $hR rows" +
      f" (ratio ${thR / th1}%.2fx time, ${hR.toDouble / h1}%.2fx rows)")

    // ---- containment join: the heavy-hitters frame's per-replica token
    // prefixes make the 3-shingle universes orthogonal, so posting lists
    // never span replicas and every candidate/output pair stays within
    // its replica; per-pair containment is corpus-independent, so the
    // per-replica structure is exactly replica 0's. Expected: rows
    // exactly Rx.
    def cntRun(reps: Int): Long =
      graft.operators.Dedup.containmentPairsPrefix(
        hhFrame(reps), "doc_id", "text", shingleN = 3, threshold = 0.8).count()
    time(cntRun(1))
    val (c1, tc1) = time(cntRun(1))
    val (cR, tcR) = time(cntRun(r))
    println(f"containment 1x: $tc1%.1fs $c1 pairs | ${r}x: $tcR%.1fs $cR pairs" +
      f" (ratio ${tcR / tc1}%.2fx time, ${cR.toDouble / c1}%.2fx rows)")

    // ---- containment WITH the maxDf cut (round-11 advice: the knob
    // landed but the probe only measured the uncut path, which reads
    // super-linear on this fixture BY CONSTRUCTION — a 31-token synthetic
    // vocabulary makes hot posting lists pathological). The cut at 20% of
    // the 1x corpus is replica-invariant: each replica's salted shingle
    // has exactly replica 0's document frequency (orthogonal universes),
    // so the SAME absolute cut filters every replica identically and
    // rows stay exactly Rx. This is the knob a 100 TB run would have on.
    val dfCut = (docs.count() / 5L).max(1L)
    def cntCutRun(reps: Int): Long =
      graft.operators.Dedup.containmentPairsPrefix(
        hhFrame(reps), "doc_id", "text", shingleN = 3, threshold = 0.8,
        maxDf = Some(dfCut)).count()
    time(cntCutRun(1))
    val (cc1, tcc1) = time(cntCutRun(1))
    val (ccR, tccR) = time(cntCutRun(r))
    println(f"containment_maxdf(df<=$dfCut) 1x: $tcc1%.1fs $cc1 pairs |" +
      f" ${r}x: $tccR%.1fs $ccR pairs" +
      f" (ratio ${tccR / tcc1}%.2fx time, ${ccR.toDouble / cc1}%.2fx rows)")

    // ---- sorted-neighborhood pairs: the token-prefix salt puts every
    // replica's blocking keys in a CONTIGUOUS sort range (keys start
    // with the salt char), so windows stay within replicas except the
    // w-1 boundary pairs at each joint — whose cross-replica shingle
    // universes are orthogonal, so the exact verify drops them.
    // Expected: rows exactly Rx.
    def snmRun(reps: Int): Long =
      graft.operators.Dedup.sortedNeighborhoodPairs(
        hhFrame(reps), "doc_id", "text",
        windowSize = 4, shingleN = 3, threshold = 0.5, keyLen = 12).count()
    time(snmRun(1))
    val (s1, ts1) = time(snmRun(1))
    val (sR, tsR) = time(snmRun(r))
    println(f"sorted_neighborhood 1x: $ts1%.1fs $s1 pairs | ${r}x: $tsR%.1fs $sR pairs" +
      f" (ratio ${tsR / ts1}%.2fx time, ${sR.toDouble / s1}%.2fx rows)")

    // ---- edit dedup (PassJoin o connected components o min-id keep):
    // the edit-join frame's disjoint alphabet blocks keep every edit
    // cluster within one replica, and the id stripe (doc_id*R + i) is
    // order-preserving within a replica, so each replica keeps exactly
    // replica 0's survivors. Expected: rows exactly Rx.
    def edRun(reps: Int): Long = {
      val f = editFrame(reps)
      val pairs = graft.operators.Dedup.editDistancePairs(
        f.select(col("doc_id"), substring(col("text"), 1, 16).as("k")),
        "doc_id", "k", maxDist = 2)
      graft.operators.DupClusters.dedupByPairs(f, "doc_id", pairs).count()
    }
    time(edRun(1))
    val (d1, td1) = time(edRun(1))
    val (dR, tdR) = time(edRun(r))
    println(f"edit_dedup 1x: $td1%.1fs $d1 kept | ${r}x: $tdR%.1fs $dR kept" +
      f" (ratio ${tdR / td1}%.2fx time, ${dR.toDouble / d1}%.2fx rows)")

    // ---- incremental dedup: FIXED batch, index grown Rx with PRE-BUILT
    // signatures (the persisted-signature operating mode) — the claim
    // under test is "per-batch cost scales with the batch, not the
    // standing corpus". Replica 0 keeps the real text (so real cross
    // pairs exist); extra replicas are token-prefix salted (orthogonal
    // shingle universes -> no new matches, no bucket collisions beyond
    // hash luck) and only their SIGNATURES enter the run.
    // every replica remaps ids into its own stripe — replica 0 keeping
    // RAW ids would collide with stripe arithmetic and silently merge
    // two docs' shingle sets in the verify groupBy (measured: 89 -> 26
    // pairs). Replica 0 keeps the real TEXT so real cross pairs exist.
    def idxFrame(reps: Int): DataFrame = (0 until reps).map { i =>
      val base = docs.filter(col("doc_id") % 5 =!= 0)
      base.select((col("doc_id") * r + i).as("doc_id"),
        (if (i == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", saltChar(i) + "_$1")).as("text"))
    }.reduce(_ unionByName _)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    def incPrep(reps: Int): (DataFrame, DataFrame) = {
      // index text + signatures materialize OFF the clock — in production
      // both already sit in the warehouse; the timed part is the batch's
      // own signatures, the bucket join, and the candidate-only verify
      // (whose semi-join re-scan of the index is the honest residual
      // index-sized term — id-pushdown territory on a real store)
      val idx = idxFrame(reps).localCheckpoint()
      val sigs = graft.operators.Dedup
        .minhashSignature(idx, "doc_id", "text", 3, 8).localCheckpoint()
      (idx, sigs)
    }
    def incRun(prep: (DataFrame, DataFrame)): Long =
      graft.operators.Dedup.nearDupPairsAgainstIndex(
        batch, prep._1, "doc_id", "text", indexSignatures = Some(prep._2)).count()
    val prep1 = incPrep(1)
    val prepR = incPrep(r)
    incRun(prep1)
    val (i1, ti1) = time(incRun(prep1))
    val (iR, tiR) = time(incRun(prepR))
    println(f"incremental_dedup 1x-index: $ti1%.1fs $i1 pairs | ${r}x-index: $tiR%.1fs $iR pairs" +
      f" (ratio ${tiR / ti1}%.2fx time, ${iR.toDouble / i1}%.2fx pairs)")

    // ---- boundary stitch pairs: positional overlapping halves of the
    // edit frame (the char-bijection translate COMMUTES with substring
    // positions, so each replica's pair structure is exactly replica
    // 0's), joined on the 40-char suffix==prefix boundary. Every
    // boundary window on this fixture contains letters, so replicas'
    // boundary keys live in disjoint alphabet blocks — no cross-replica
    // pairs. (CDC-based sharedChunkPairs has NO exact-Rx decorrelation:
    // chunk boundaries are functions of codepoint VALUES, which any
    // content transform perturbs — its scale shape is the same
    // hash-equi-join as this leg.) Expected: rows exactly Rx.
    def stitchFrame(reps: Int): DataFrame = {
      val f = editFrame(reps).filter(length(col("text")) >= 60)
        .withColumn("L", length(col("text")))
      f.select((col("doc_id") * 2).as("id"),
          expr("substring(text, 1, L div 2 + 20)").as("t"))
        .unionByName(f.select((col("doc_id") * 2 + 1).as("id"),
          expr("substring(text, L div 2 - 19)").as("t")))
    }
    def stitchRun(reps: Int): Long =
      graft.operators.Dedup.boundaryStitchPairs(
        stitchFrame(reps), "id", "t", boundaryLen = 40).count()
    time(stitchRun(1))
    val (b1, tb1) = time(stitchRun(1))
    val (bR, tbR) = time(stitchRun(r))
    println(f"boundary_stitch 1x: $tb1%.1fs $b1 pairs | ${r}x: $tbR%.1fs $bR pairs" +
      f" (ratio ${tbR / tb1}%.2fx time, ${bR.toDouble / b1}%.2fx rows)")

    // ---- Heaps'-law fit: the hh frame's per-replica token prefixes make
    // the vocabularies ORTHOGONAL across replicas, so total vocabulary
    // (and total tokens) are exactly Rx — a countable invariant even
    // though the output is a single report row. The heavy terms are the
    // token-stream count aggregations and two PrefixSum scans; the OLS
    // itself is O(docs). Expected: vocab and n_tokens exactly Rx, time
    // well under Rx.
    def heapsRun(reps: Int): (Long, Long) = {
      val row = graft.operators.Profile
        .heapsFit(hhFrame(reps), "doc_id", "text").head()
      (row.getAs[Long]("vocab"), row.getAs[Long]("n_tokens"))
    }
    time(heapsRun(1))
    val ((v1, t1tok), th1b) = time(heapsRun(1))
    val ((vR, tRtok), thRb) = time(heapsRun(r))
    println(f"heaps_fit 1x: $th1b%.1fs vocab $v1 | ${r}x: $thRb%.1fs vocab $vR" +
      f" (ratio ${thRb / th1b}%.2fx time, ${vR.toDouble / v1}%.2fx vocab," +
      f" ${tRtok.toDouble / t1tok}%.2fx tokens)")

    // ---- grouped quantiles (keyed PrefixSum): per-replica group-name
    // suffixes make groups disjoint, so output rows are exactly Rx and
    // each replica's value grid is exactly replica 0's. Probes the
    // withKeyedRunningSums range-exchange at 8x the distinct-value frame.
    val docsG = Tables.read(spark, sfDir, "documents")
      .select(col("source"), col("lang"), col("n_chars"))
      .filter(col("source").isNotNull && col("n_chars").isNotNull)
    def gFrame(reps: Int): DataFrame = (0 until reps).map { i =>
      docsG.select(concat(col("source"), lit("_" + i)).as("source"),
        col("lang"), col("n_chars"))
    }.reduce(_ unionByName _)
    def gqRun(reps: Int): Long = graft.operators.Profile.quantilesByGroup(
      gFrame(reps), "source", "n_chars", Seq(0.5, 0.99)).count()
    time(gqRun(1))
    val (gq1, tgq1) = time(gqRun(1))
    val (gqR, tgqR) = time(gqRun(r))
    println(f"grouped_quantiles 1x: $tgq1%.1fs $gq1 rows | ${r}x: $tgqR%.1fs $gqR rows" +
      f" (ratio ${tgqR / tgq1}%.2fx time, ${gqR.toDouble / gq1}%.2fx rows)")

    // ---- grouped KS (keyed PrefixSum + per-group scaled-integer sup):
    // same decorrelation; rows exactly Rx, per-group ks identical.
    def ksgRun(reps: Int): Long = {
      val f = gFrame(reps)
      graft.operators.Drift.ksByGroup(
        f.filter(col("lang") === "en").select(col("source"), col("n_chars")),
        f.filter(col("lang") =!= "en").select(col("source"), col("n_chars")),
        "source", "n_chars").count()
    }
    time(ksgRun(1))
    val (kg1, tkg1) = time(ksgRun(1))
    val (kgR, tkgR) = time(ksgRun(r))
    println(f"grouped_ks 1x: $tkg1%.1fs $kg1 rows | ${r}x: $tkgR%.1fs $kgR rows" +
      f" (ratio ${tkgR / tkg1}%.2fx time, ${kgR.toDouble / kg1}%.2fx rows)")

    // ---- GIANT single group (round-12 verdict: the keyed-PrefixSum
    // claims were parity-specced but no leg measured ONE group at Rx —
    // the exact shape Window.partitionBy(group) serializes through one
    // reducer). Every row lands in group "g"; replicas stripe ids AND
    // the value space (v*R + i), so the distinct-(group, value) frame
    // grows exactly Rx while the group count stays 1. Invariant: the
    // reported per-group n is exactly Rx the 1x n.
    val docsV = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
    def giantFrame(reps: Int): DataFrame = (0 until reps).map { i =>
      docsV.select(lit("g").as("g"),
        (col("doc_id") * r + i).as("id"),
        (col("n_chars") * r + i).as("v"))
    }.reduce(_ unionByName _)
    def ggqRun(reps: Int): Long =
      graft.operators.Profile.quantilesByGroup(
        giantFrame(reps), "g", "v", Seq(0.5, 0.99)).head().getAs[Long]("n")
    time(ggqRun(1))
    val (gg1, tgg1) = time(ggqRun(1))
    val (ggR, tggR) = time(ggqRun(r))
    println(f"giant_group_quantiles 1x: $tgg1%.1fs n=$gg1 | ${r}x: $tggR%.1fs n=$ggR" +
      f" (ratio ${tggR / tgg1}%.2fx time, ${ggR.toDouble / gg1}%.2fx n)")

    // mrrByGroup on the giant group: (score, tie-id) tuples distinct by
    // the id stripe; sparse positives via the id grid
    def ggmRun(reps: Int): Long =
      graft.operators.Eval.mrrByGroup(
        giantFrame(reps).select(col("g"), col("v").cast("double").as("s"),
          (col("id") % 97 === 0).as("l"), col("id")),
        "g", "s", "l", "id").head().getAs[Long]("n")
    time(ggmRun(1))
    val (gm1, tgm1) = time(ggmRun(1))
    val (gmR, tgmR) = time(ggmRun(r))
    println(f"giant_group_mrr 1x: $tgm1%.1fs n=$gm1 | ${r}x: $tgmR%.1fs n=$gmR" +
      f" (ratio ${tgmR / tgm1}%.2fx time, ${gmR.toDouble / gm1}%.2fx n)")

    // prioritySample on the giant group (the r13 migration under test):
    // output is exactly k at both scales — the ratio IS the story
    def gpsRun(reps: Int): Long =
      graft.operators.Splits.prioritySample(
        giantFrame(reps).withColumn("w", col("v").cast("double") + 1.0),
        "g", "id", "w", k = 1000).count()
    time(gpsRun(1))
    val (gp1, tgp1) = time(gpsRun(1))
    val (gpR, tgpR) = time(gpsRun(r))
    println(f"giant_group_priority_sample(k=1000) 1x: $tgp1%.1fs $gp1 kept |" +
      f" ${r}x: $tgpR%.1fs $gpR kept" +
      f" (ratio ${tgpR / tgp1}%.2fx time, ${gpR.toDouble / gp1}%.2fx rows)")

    // ---- the remaining r13/r14 keyed-PrefixSum migrations on the giant
    // group (r13 verdict #5 + the r14 robustStats/trimmedMean moves):
    // same giantFrame; every output either joins back to rows (rows
    // exactly Rx) or reports the per-group n (exactly Rx).
    def gcalRun(reps: Int): Long =
      graft.operators.Profile.calibrateByGroup(
        giantFrame(reps), "g", "v", "id").count()
    time(gcalRun(1))
    val (gc1, tgc1) = time(gcalRun(1))
    val (gcR, tgcR) = time(gcalRun(r))
    println(f"giant_group_calibrate 1x: $tgc1%.1fs $gc1 rows | ${r}x: $tgcR%.1fs $gcR rows" +
      f" (ratio ${tgcR / tgc1}%.2fx time, ${gcR.toDouble / gc1}%.2fx rows)")

    def gtsRun(reps: Int): Long =
      graft.operators.Splits.temporalSplitByGroup(
        giantFrame(reps), "g", "v", "id").count()
    time(gtsRun(1))
    val (gt1, tgt1) = time(gtsRun(1))
    val (gtR, tgtR) = time(gtsRun(r))
    println(f"giant_group_temporal_split 1x: $tgt1%.1fs $gt1 rows | ${r}x: $tgtR%.1fs $gtR rows" +
      f" (ratio ${tgtR / tgt1}%.2fx time, ${gtR.toDouble / gt1}%.2fx rows)")

    def gwqRun(reps: Int): Long =
      graft.operators.Profile.weightedQuantilesByGroup(
        giantFrame(reps).withColumn("w", col("id") % 10 + 1),
        "g", "v", "w", Seq(0.5, 0.9)).head().getAs[Long]("n")
    time(gwqRun(1))
    val (gw1, tgw1) = time(gwqRun(1))
    val (gwR, tgwR) = time(gwqRun(r))
    println(f"giant_group_weighted_quantiles 1x: $tgw1%.1fs n=$gw1 | ${r}x: $tgwR%.1fs n=$gwR" +
      f" (ratio ${tgwR / tgw1}%.2fx time, ${gwR.toDouble / gw1}%.2fx n)")

    def gabRun(reps: Int): Long =
      graft.operators.Packing.assignBins(
        giantFrame(reps).withColumn("n_tokens", col("v") % 400L + 1L),
        "id", "n_tokens", 512L, groupCol = Some("g")).count()
    time(gabRun(1))
    val (ga1, tga1) = time(gabRun(1))
    val (gaR, tgaR) = time(gabRun(r))
    println(f"giant_group_assign_bins 1x: $tga1%.1fs $ga1 rows | ${r}x: $tgaR%.1fs $gaR rows" +
      f" (ratio ${tgaR / tga1}%.2fx time, ${gaR.toDouble / ga1}%.2fx rows)")

    def grsRun(reps: Int): Long =
      graft.operators.Profile.robustStats(
        giantFrame(reps), "g", "v").head().getAs[Long]("n")
    time(grsRun(1))
    val (gr1, tgr1) = time(grsRun(1))
    val (grR, tgrR) = time(grsRun(r))
    println(f"giant_group_robust_stats 1x: $tgr1%.1fs n=$gr1 | ${r}x: $tgrR%.1fs n=$grR" +
      f" (ratio ${tgrR / tgr1}%.2fx time, ${grR.toDouble / gr1}%.2fx n)")

    def gtmRun(reps: Int): Long =
      graft.operators.Profile.trimmedMeanByGroup(
        giantFrame(reps), "g", "v", "id", 100000L).head().getAs[Long]("n")
    time(gtmRun(1))
    val (gm1b, tgm1b) = time(gtmRun(1))
    val (gmRb, tgmRb) = time(gtmRun(r))
    println(f"giant_group_trimmed_mean 1x: $tgm1b%.1fs n=$gm1b | ${r}x: $tgmRb%.1fs n=$gmRb" +
      f" (ratio ${tgmRb / tgm1b}%.2fx time, ${gmRb.toDouble / gm1b}%.2fx n)")

    // ---- giant HUB linkPrediction (round-14 verdict #5): wedge fan-out
    // is QUADRATIC in hub degree, and the maxCenterDegree cap is the knob
    // a 100 TB call relies on — this leg measures both sides. Graph per
    // replica stripe: 500 spokes on ONE shared hub (node 0, so hub degree
    // grows Rx -> hub wedges R^2: C(500R, 2) candidate pairs) plus a
    // disjoint 20k-node chain (the linear background). UNCAPPED, time and
    // rows must blow up ~R^2 BY CONSTRUCTION (that run documents the
    // hazard); capped at 64 the hub stops being a wedge center at BOTH
    // scales, so rows are exactly Rx the chain candidates and time must
    // stay near-linear.
    def hubEdges(reps: Int): DataFrame = (0 until reps).map { i =>
      val base = 1000000L * (i + 1)
      val spokes = spark.range(0, 500)
        .select((col("id") + base).as("a"), lit(0L).as("b"))
      val chain = spark.range(0, 20000)
        .select((col("id") + base + 1000L).as("a"),
          (col("id") + base + 1001L).as("b"))
      spokes.unionByName(chain)
    }.reduce(_ unionByName _)
    def hubRun(reps: Int, cap: Option[Long]): Long =
      graft.operators.Graphs.linkPrediction(hubEdges(reps), "a", "b",
        maxCenterDegree = cap).count()
    time(hubRun(1, Some(64L)))
    val (hc1, thc1) = time(hubRun(1, Some(64L)))
    val (hcR, thcR) = time(hubRun(r, Some(64L)))
    println(f"giant_hub_linkpred_capped(64) 1x: $thc1%.1fs $hc1 pairs |" +
      f" ${r}x: $thcR%.1fs $hcR pairs" +
      f" (ratio ${thcR / thc1}%.2fx time, ${hcR.toDouble / hc1}%.2fx rows)")
    val (hu1, thu1) = time(hubRun(1, None))
    val (huR, thuR) = time(hubRun(r, None))
    println(f"giant_hub_linkpred_uncapped 1x: $thu1%.1fs $hu1 pairs |" +
      f" ${r}x: $thuR%.1fs $huR pairs" +
      f" (ratio ${thuR / thu1}%.2fx time, ${huR.toDouble / hu1}%.2fx rows — " +
      "the R^2 wedge blow-up the cap exists to stop)")

    // ---- embedding uniformity (p238): the pair space is the bucketed
    // self-equi-join, Σ_b size(b)² — the documented posture is
    // nBuckets ∝ n so occupancy stays constant and pairs grow LINEARLY.
    // Replicas stripe vec_ids (the pair set is a pure function of the
    // id-hash buckets, so identical vectors across replicas change
    // nothing); n_pairs is hash-occupancy random, ~Rx in expectation,
    // so the invariant here is the ORDER (≈Rx pairs, near-linear time),
    // not an exact count.
    val emb = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
    def embFrame(reps: Int, bound: Long): DataFrame = (0 until reps).map { i =>
      emb.filter(col("vec_id") < bound)
        .select((col("vec_id") * r + i).as("vec_id"), col("embedding"))
    }.reduce(_ unionByName _)
    val nEmb = emb.count()
    val bk1 = math.max(1L, nEmb / 16L).toInt
    def unifRun(reps: Int, buckets: Int, bound: Long): Long =
      graft.operators.Similarity.embeddingUniformity(
        embFrame(reps, bound), "vec_id", "embedding", nBuckets = buckets)
        .head().getAs[Long]("n_pairs")
    time(unifRun(1, bk1, Long.MaxValue))
    val (u1, tu1) = time(unifRun(1, bk1, Long.MaxValue))
    val (uR, tuR) = time(unifRun(r, bk1 * r, Long.MaxValue))
    println(f"uniformity_buckets(n/16) 1x: $tu1%.1fs $u1 pairs | ${r}x: $tuR%.1fs $uR pairs" +
      f" (ratio ${tuR / tu1}%.2fx time, ${uR.toDouble / u1}%.2fx pairs)")
    // the GIANT-bucket hazard: nBuckets FIXED at 1 while n grows Rx —
    // pairs are exactly C(n,2), so rows/time blow up ~R^2 BY CONSTRUCTION
    // (documents why the bucket count must track n); bounded base so the
    // quadratic demonstration stays seconds, the capped-hub convention
    val unifBound = 250L
    val (g1p, tg1p) = time(unifRun(1, 1, unifBound))
    val (gRp, tgRp) = time(unifRun(r, 1, unifBound))
    println(f"uniformity_giant_bucket 1x: $tg1p%.1fs $g1p pairs | ${r}x: $tgRp%.1fs $gRp pairs" +
      f" (ratio ${tgRp / tg1p}%.2fx time, ${gRp.toDouble / g1p}%.2fx pairs — " +
      "the C(n,2) blow-up nBuckets ∝ n exists to stop)")

    // ---- Fellegi–Sunter linkage (p242): the corpus collapses to <= 2^k
    // pattern counts in ONE aggregation; EM is a driver recipe over that
    // bounded table. Two claims probed: (a) pair-corpus growth at fixed
    // k is near-linear with rows exactly Rx (scores join back onto every
    // input row); (b) growing k 3 -> 12 multiplies the DRIVER table 512x
    // but the corpus side stays one aggregation — time must grow far
    // under 512x, rows exactly 1x. Agreement bits are deterministic
    // hash bits, so every replica stripe carries the same pattern mix.
    def linkFrame(reps: Int, k: Int): DataFrame = {
      val n = 500000L
      spark.range(0L, n * reps).select(
        (col("id") +:
          (0 until k).map(i =>
            (xxhash64(col("id"), lit(i)).bitwiseAND(lit(1L)) === 0L)
              .as(s"f$i"))): _*)
    }
    def linkRun(reps: Int, k: Int): Long =
      graft.operators.Linkage.fellegiSunter(
        linkFrame(reps, k), (0 until k).map(i => s"f$i")).count()
    time(linkRun(1, 3))
    val (l1, tl1) = time(linkRun(1, 3))
    val (lR, tlR) = time(linkRun(r, 3))
    println(f"linkage_em(k=3) 1x: $tl1%.1fs $l1 rows | ${r}x: $tlR%.1fs $lR rows" +
      f" (ratio ${tlR / tl1}%.2fx time, ${lR.toDouble / l1}%.2fx rows)")
    val (lk1, tlk1) = time(linkRun(1, 12))
    println(f"linkage_em(k=12, 1x): $tlk1%.1fs $lk1 rows" +
      f" (vs k=3 1x: ${tlk1 / tl1}%.2fx time for 512x the pattern table — " +
      "driver-side EM, corpus side unchanged)")

    // ---- margin mining score (p246): neighborhoods are caller-injected
    // (the p67b rule), so the operator's own cost is the pair-cosine
    // equi-joins plus per-query aggregations over the neighbor frames.
    // Replicas stripe ALL ids (pairs, neighbors, embeddings); vectors
    // repeat, so each replica's margins are exactly replica 0's.
    // Expected: rows exactly Rx, near-linear time.
    def marginRun(reps: Int): Long = {
      val e = embFrame(reps, Long.MaxValue)
      val qs = e.filter(col("vec_id") % (2L * r) >= r.toLong) // odd pre-stripe ids
        .select(col("vec_id").as("id_a"), (col("vec_id") - r).as("id_b"))
      def nbr(side: String) = qs.select(col(side).as("query_id"))
        .select(col("query_id"),
          explode(sequence(lit(1), lit(5))).as("__j"))
        .select(col("query_id"), (col("query_id") + col("__j")).as("neighbor_id"),
          (lit(0.5) + col("__j") * 0.01).as("cosine"))
      graft.operators.Similarity.marginScore(
        qs, "id_a", "id_b", e, "vec_id", "embedding",
        nbr("id_a"), nbr("id_b")).count()
    }
    time(marginRun(1))
    val (m1, tm1) = time(marginRun(1))
    val (mR, tmR) = time(marginRun(r))
    println(f"margin_score 1x: $tm1%.1fs $m1 rows | ${r}x: $tmR%.1fs $mR rows" +
      f" (ratio ${tmR / tm1}%.2fx time, ${mR.toDouble / m1}%.2fx rows)")

    // ---- chat structure audit (p251): a pure per-row HOF projection —
    // the probe checks the zero-shuffle claim's consequence at Rx (time
    // ~Rx, rows exactly Rx). Transcripts synthesized per doc (the p250
    // fixture shape); replicas stripe doc ids, text can repeat verbatim —
    // a per-row projection has no cross-row structure to decorrelate.
    def chatFrame(reps: Int): DataFrame = (0 until reps).map { i =>
      docs.select((col("doc_id") * r + i).as("doc_id"),
        concat(lit("user: "), substring(col("text"), 1, 30),
          lit("\nassistant: "), substring(col("text"), 31, 15)).as("text"))
    }.reduce(_ unionByName _)
    def chatRun(reps: Int): Long =
      graft.operators.Chat.chatAudit(chatFrame(reps), "doc_id", "text").count()
    time(chatRun(1))
    val (ca1, tca1) = time(chatRun(1))
    val (caR, tcaR) = time(chatRun(r))
    println(f"chat_audit 1x: $tca1%.1fs $ca1 rows | ${r}x: $tcaR%.1fs $caR rows" +
      f" (ratio ${tcaR / tca1}%.2fx time, ${caR.toDouble / ca1}%.2fx rows)")

    // ---- min-k% membership audit (p248): scoring stream + document-
    // keyed window + one final aggregation. The hhFrame's per-replica
    // token prefixes make the bigram model universes orthogonal, so each
    // replica's per-doc min-k logp is exactly replica 0's; vocabSize is
    // uncapped here because a global top-N cut tie-breaks on the SALTED
    // token string at the boundary count, which is not replica-symmetric
    // (the model tables grow Rx with the corpus — at 100 TB the cap is
    // the knob that bounds them; its cut path is hash-gated by p248).
    // Expected: rows exactly Rx.
    def minkRun(reps: Int): Long =
      graft.operators.LmScore.minKProbAuditSelf(
        hhFrame(reps), "doc_id", "text", kPercent = 20.0,
        vocabSize = Int.MaxValue).count()
    time(minkRun(1))
    val (mk1, tmk1) = time(minkRun(1))
    val (mkR, tmkR) = time(minkRun(r))
    println(f"min_k_prob 1x: $tmk1%.1fs $mk1 rows | ${r}x: $tmkR%.1fs $mkR rows" +
      f" (ratio ${tmkR / tmk1}%.2fx time, ${mkR.toDouble / mk1}%.2fx rows)")

    // ---- preference length-bias roll-up (p256): a per-pair projection
    // into ONE map-side-combinable scalar aggregation — output is always
    // one row, so the Rx invariant lives in n_pairs (exactly Rx) and the
    // time ratio (~linear: the reduce tree carries a handful of counters
    // per partition regardless of corpus size).
    def prefFrame(reps: Int): DataFrame = (0 until reps).map { i =>
      docs.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") * r + i).as("doc_id"),
          substring(col("text"), 1, 60).as("chosen"),
          substring(col("text"), 20, 60).as("rejected"))
    }.reduce(_ unionByName _)
    def prefRun(reps: Int): Long =
      graft.operators.Chat.preferenceLengthBias(prefFrame(reps),
          "doc_id", "chosen", "rejected")
        .collect()(0).getLong(0) // n_pairs
    time(prefRun(1))
    val (pb1, tpb1) = time(prefRun(1))
    val (pbR, tpbR) = time(prefRun(r))
    println(f"pref_bias 1x: $tpb1%.1fs $pb1 pairs | ${r}x: $tpbR%.1fs $pbR pairs" +
      f" (ratio ${tpbR / tpb1}%.2fx time, ${pbR.toDouble / pb1}%.2fx pairs)")
    spark.stop()
  }
}
