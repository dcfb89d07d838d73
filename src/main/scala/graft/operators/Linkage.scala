package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969) with
  * EM-estimated parameters (Winkler 1988) — the entity-resolution
  * scoring layer ABOVE the pair generators: [[Dedup]]'s blockers say
  * which pairs to compare; this says how much each field agreement is
  * WORTH. Given candidate pairs with k boolean agreement fields, EM
  * learns per-field m = P(agree | match) and u = P(agree | non-match)
  * plus the match prevalence p, unsupervised, from the agreement-pattern
  * counts alone; each pair then scores
  * Σ_f log2(m_f/u_f) on agreeing fields + log2((1−m_f)/(1−u_f)) on
  * disagreeing ones — the classic match weight — plus the posterior
  * match probability of its pattern.
  *
  * Determinism contract (the oracle replays EM as UNROLLED per-iteration
  * SQL stages): pattern counts are exact integers; every EM iteration
  * computes pattern likelihoods as FIXED-ORDER IEEE products of the
  * previous (9-dp) parameters, rounds the posterior w to 9 dp, forms the
  * sums Σ w·n / Σ (1−w)·n in EXACT DECIMAL (w is a 9-dp quantity, n an
  * integer — order-independent), divides once in IEEE, CLAMPS into
  * [1e-9, 1−1e-9] (no absorbing 0/1 states) and rounds the new
  * parameter to 9 dp. Per-field score weights are 9-dp log2s of the
  * final parameters, summed in field order.
  *
  * 100 TB shape: ONE aggregation collapses the pair corpus to ≤ 2^k
  * pattern counts (map-side combinable; k ≤ 16 enforced); EM runs on
  * the driver over that bounded table (iters × 2^k multiplies — a
  * recipe, not data); the learned weights join back as a ≤ 2^k-row
  * BROADCAST onto the pair stream. No iteration ever touches the
  * corpus.
  */
object Linkage {

  /** EM-fitted Fellegi–Sunter scores. Returns `pairs` with two added
    * columns: `match_weight` (the log2 field-weight sum) and
    * `posterior` (P(match | pattern), 9 dp). Rows with a NULL in any
    * agreement column drop (a comparison that didn't run is not a
    * disagreement — route NULLs to an explicit false upstream if that's
    * the intended semantics). */
  def fellegiSunter(pairs: DataFrame, agreeCols: Seq[String],
      emIters: Int = 10, initM: Double = 0.9, initU: Double = 0.1,
      initP: Double = 0.1, caseApplyMaxPatterns: Int = 64): DataFrame = {
    require(agreeCols.nonEmpty && agreeCols.size <= 16,
      s"need 1..16 agreement columns, got ${agreeCols.size}")
    require(emIters >= 1 && emIters <= 100,
      s"emIters must be in [1, 100], got $emIters")
    Seq("match_weight", "posterior").foreach(c =>
      require(!pairs.columns.contains(c),
        s"output column '$c' already exists in the input"))
    val k = agreeCols.size
    val agree = agreeCols.map(c => col(s"`$c`"))
    val base = pairs.filter(agree.map(_.isNotNull).reduce(_ && _))
    // pattern counts: the ONLY corpus-sized aggregation
    val patRows = base.groupBy(agree: _*).agg(count(lit(1)).as("__n"))
      .collect() // bounded: <= 2^k patterns
    val pats: Array[(Array[Boolean], Long)] = patRows.map { r =>
      (Array.tabulate(k)(i => r.getBoolean(i)), r.getLong(k))
    }

    def r9(x: Double): Double = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def clamp9(x: Double): Double = r9(math.min(math.max(x, 1e-9), 1 - 1e-9))
    def bd9(x: Double): java.math.BigDecimal = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP)

    var p = r9(initP)
    var m = Array.fill(k)(r9(initM))
    var u = Array.fill(k)(r9(initU))
    for (_ <- 1 to emIters if pats.nonEmpty) {
      // per-pattern posterior at the current parameters, 9 dp
      val w9 = pats.map { case (g, _) =>
        var pm = 1.0; var pu = 1.0
        var f = 0
        while (f < k) { // fixed field order: the oracle's product order
          pm *= (if (g(f)) m(f) else 1.0 - m(f))
          pu *= (if (g(f)) u(f) else 1.0 - u(f))
          f += 1
        }
        r9(p * pm / (p * pm + (1.0 - p) * pu))
      }
      // exact-decimal sums (9-dp w times integer n): order-independent
      var swn = java.math.BigDecimal.ZERO // Σ w·n
      var sn = java.math.BigDecimal.ZERO  // Σ n
      val smf = Array.fill(k)(java.math.BigDecimal.ZERO) // Σ w·n·γ_f
      val suf = Array.fill(k)(java.math.BigDecimal.ZERO) // Σ (1−w)·n·γ_f
      var i = 0
      while (i < pats.length) {
        val (g, n) = pats(i)
        val nBd = java.math.BigDecimal.valueOf(n)
        val wn = bd9(w9(i)).multiply(nBd)
        val vn = bd9(1.0 - w9(i)).multiply(nBd)
        swn = swn.add(wn); sn = sn.add(nBd)
        var f = 0
        while (f < k) {
          if (g(f)) { smf(f) = smf(f).add(wn); suf(f) = suf(f).add(vn) }
          f += 1
        }
        i += 1
      }
      val svn = sn.subtract(swn) // Σ (1−w)·n, exact complement
      p = clamp9(swn.doubleValue() / sn.doubleValue())
      m = Array.tabulate(k)(f =>
        if (swn.signum() == 0) m(f)
        else clamp9(smf(f).doubleValue() / swn.doubleValue()))
      u = Array.tabulate(k)(f =>
        if (svn.signum() == 0) u(f)
        else clamp9(suf(f).doubleValue() / svn.doubleValue()))
    }
    // per-field 9-dp log2 weights from the FINAL parameters
    val wAgree = Array.tabulate(k)(f => r9(math.log(m(f) / u(f)) / math.log(2.0)))
    val wDis = Array.tabulate(k)(f =>
      r9(math.log((1.0 - m(f)) / (1.0 - u(f))) / math.log(2.0)))
    // final posterior per pattern (same recipe as inside the loop)
    def postOf(g: Array[Boolean]): Double = {
      var pm = 1.0; var pu = 1.0
      var f = 0
      while (f < k) {
        pm *= (if (g(f)) m(f) else 1.0 - m(f))
        pu *= (if (g(f)) u(f) else 1.0 - u(f))
        f += 1
      }
      r9(p * pm / (p * pm + (1.0 - p) * pu))
    }
    // codegen'd field-order weight sum; the posterior applies as a
    // chained CASE while the pattern table is small (fully codegen'd, no
    // join — the k <= 6 common case) and as a <= 2^k-row BROADCAST join
    // beyond that: a when-chain nests one level PER PATTERN, and at
    // k = 12 the 4096-deep expression tree overflowed the analyzer stack
    // (caught by the ScaleProbe linkage leg) — exactly the shape the
    // docstring's broadcast-apply contract exists for. Both paths emit
    // the identical 9-dp literals.
    val weight = (0 until k).map { f =>
      when(agree(f), lit(wAgree(f))).otherwise(lit(wDis(f)))
    }.reduce(_ + _)
    val weighted = base.withColumn("match_weight", weight)
    if (pats.length <= caseApplyMaxPatterns) {
      val posterior = pats.foldLeft(lit(null).cast("double")) {
        case (other, (g, _)) =>
          val cond = (0 until k).map(f => agree(f) === lit(g(f))).reduce(_ && _)
          when(cond, lit(postOf(g))).otherwise(other)
      }
      weighted.withColumn("posterior", posterior)
    } else {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(
        agreeCols.map(c => StructField(c, BooleanType, nullable = false)) :+
          StructField("posterior", DoubleType, nullable = false))
      val postDf = pairs.sparkSession.createDataFrame(
        java.util.Arrays.asList(pats.map { case (g, _) =>
          Row.fromSeq(g.toSeq :+ postOf(g)) }: _*),
        schema)
      // every base row's pattern is in pats by construction (the counts
      // came from base), so the left join never manufactures a null.
      // Re-select to the CASE path's column order (input + the two added
      // columns) — a using-join would otherwise move the key columns first.
      weighted.join(broadcast(postDf), agreeCols, "left")
        .select((base.columns.toSeq.map(c => col(s"`$c`")) :+
          col("match_weight") :+ col("posterior")): _*)
    }
  }
}
