package graft

class GraftExtensionsSpec extends SparkSpecBase {

  test("float_array_dot is callable from SQL after registration") {
    // config-driven path (spark.sql.extensions=graft.GraftExtensions) only
    // applies to NEW sessions; the runtime path registers into this one
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT float_array_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
  }

  test("composite text operators are callable from SQL") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT graft_token_count('the cat sat') AS n, " +
        "graft_lang_id('the cat sat on the mat and it is fine') AS lang, " +
        "graft_fingerprint('  A  b ') = graft_fingerprint('a b') AS same, " +
        "graft_hamming_bits('1010', '1001') AS h").head()
    assert(row.getInt(0) === 3)
    assert(row.getString(1) === "en")
    assert(row.getBoolean(2))
    assert(row.getInt(3) === 2)
    // quality score matches the Column-level helper bitwise
    val viaSql = spark.sql("SELECT graft_quality_score('the cat sat on the mat') AS q")
      .head().getDouble(0)
    import spark.implicits._
    val viaCol = Seq(Tuple1("the cat sat on the mat")).toDF("text")
      .select(graft.functions.TextFunctions.qualityScore(org.apache.spark.sql.functions.col("text")))
      .head().getDouble(0)
    assert(viaSql === viaCol)
  }

  test("graft_hash_bucket matches Splits.hashBucket bitwise from SQL") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    import spark.implicits._
    val keys = Seq("42", "doc-7", "").toDF("k")
    val viaCol = keys
      .select(graft.operators.Splits.hashBucket(
        org.apache.spark.sql.functions.col("k"), "fold1").as("b"))
      .as[Long].collect().toSeq
    keys.createOrReplaceTempView("hb_keys")
    val viaSql = spark.sql(
      "SELECT graft_hash_bucket(k, 'fold1', 1000000) FROM hb_keys")
      .as[Long].collect().toSeq
    assert(viaSql === viaCol)
  }

  test("graft_hash_bucket fails loudly on nBuckets <= 0 and null salt (Scala contract)") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    import spark.implicits._
    Seq("42").toDF("k").createOrReplaceTempView("hb_guard_keys")
    // the Scala form throws require(nBuckets > 0); non-ANSI SQL modulo
    // would instead yield NULL for every row and silently drop them
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_hash_bucket(k, 's', 0) FROM hb_guard_keys").collect()
    }
    assert(e1.getMessage.contains("nBuckets must be positive"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_hash_bucket(k, CAST(NULL AS STRING), 10) FROM hb_guard_keys").collect()
    }
    assert(e2.getMessage.contains("salt must not be null"))
    // the guarded expression is value-identical on the happy path
    assert(spark.sql("SELECT graft_hash_bucket(k, 'fold1', 1000000) FROM hb_guard_keys")
      .as[Long].head() >= 0L)
  }

  test("markup and URL functions are callable from SQL and match the Column forms") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT graft_strip_markup('<p>a</p> <b>b</b>') AS clean, " +
        "graft_host('https://u@WWW.Ex.COM:8080/p?q#f') AS host, " +
        "graft_domain('https://www.ex.com/p') AS dom, " +
        "graft_link_density('<a href=\"/x\">all link</a>') AS ld").head()
    assert(row.getString(0) === "a b")
    assert(row.getString(1) === "www.ex.com")
    assert(row.getString(2) === "ex.com")
    assert(row.getDouble(3) === 1.0)
  }

  test("GraftExtensions wires the same builder (smoke)") {
    val ext = new GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e) // must not throw; full session-creation path needs a fresh JVM
  }

  test("levenshtein threshold filters rewrite to the banded O(d*n) form") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    // parquet-backed: an in-memory LocalRelation would constant-fold the
    // whole filter away before the rewrite could be observed
    testdata("sf0.001", "documents").createOrReplaceTempView("lv_docs")
    def opt(sql: String) =
      spark.sql(sql).queryExecution.optimizedPlan.toString
    val expected = spark.sql(
      "SELECT doc_id FROM lv_docs WHERE levenshtein(substring(text, 1, 12), " +
        "'the fast key', 2) >= 0").as[Long].collect().sorted.toSeq
    assert(expected.nonEmpty, "probe literal matches nothing — pick another prefix")
    // all four literal/comparison shapes pick up the threshold argument
    for ((q, d) <- Seq(
        ("SELECT doc_id FROM lv_docs WHERE levenshtein(substring(text, 1, 12), 'the fast key') <= 2", 2),
        ("SELECT doc_id FROM lv_docs WHERE levenshtein(substring(text, 1, 12), 'the fast key') < 3", 2),
        ("SELECT doc_id FROM lv_docs WHERE 2 >= levenshtein(substring(text, 1, 12), 'the fast key')", 2),
        ("SELECT doc_id FROM lv_docs WHERE 3 > levenshtein(substring(text, 1, 12), 'the fast key')", 2))) {
      val p = opt(q)
      assert(p.contains(s"Some($d)) >= 0"), s"$q did not rewrite:\n$p")
      assert(spark.sql(q).as[Long].collect().sorted.toSeq === expected, q)
    }
    // a negative threshold must NOT rewrite (banded needs d >= 0)
    assert(!opt("SELECT doc_id FROM lv_docs WHERE levenshtein(text, 'x') <= -1")
      .contains("Some(-1)"))
    // explicit banded calls are untouched
    assert(opt("SELECT doc_id FROM lv_docs WHERE levenshtein(text, 'x', 2) >= 0")
      .contains("Some(2)) >= 0"))
  }

  test("levenshtein DISSIMILARITY filters rewrite to the banded -1 sentinel form") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    testdata("sf0.001", "documents").createOrReplaceTempView("lv_docs")
    def opt(sql: String) =
      spark.sql(sql).queryExecution.optimizedPlan.toString
    // keep-different ground truth via the explicit banded sentinel
    val expected = spark.sql(
      "SELECT doc_id FROM lv_docs WHERE levenshtein(substring(text, 1, 12), " +
        "'the fast key', 2) < 0").as[Long].collect().sorted.toSeq
    assert(expected.nonEmpty, "probe literal separates nothing — pick another prefix")
    // all four dissimilarity shapes rewrite to banded(d') < 0
    for ((q, d) <- Seq(
        ("SELECT doc_id FROM lv_docs WHERE levenshtein(substring(text, 1, 12), 'the fast key') >= 3", 2),
        ("SELECT doc_id FROM lv_docs WHERE levenshtein(substring(text, 1, 12), 'the fast key') > 2", 2),
        ("SELECT doc_id FROM lv_docs WHERE 3 <= levenshtein(substring(text, 1, 12), 'the fast key')", 2),
        ("SELECT doc_id FROM lv_docs WHERE 2 < levenshtein(substring(text, 1, 12), 'the fast key')", 2))) {
      val p = opt(q)
      assert(p.contains(s"Some($d)) < 0"), s"$q did not rewrite:\n$p")
      assert(spark.sql(q).as[Long].collect().sorted.toSeq === expected, q)
    }
    // `>= 0` is a tautology on non-null input, not a threshold — no rewrite
    // (d-1 would be -1, which the banded form rejects)
    assert(!opt("SELECT doc_id FROM lv_docs WHERE levenshtein(text, 'x') >= 0")
      .contains("Some(-1)"))
    // non-foldable threshold must NOT rewrite
    assert(!opt("SELECT doc_id FROM lv_docs WHERE levenshtein(text, 'x') > doc_id")
      .contains("Some("))
    // NULL input: banded(d) < 0 stays NULL exactly like the unbounded form
    val nulls = spark.sql(
      "SELECT levenshtein(CAST(NULL AS STRING), 'x') > 1 AS a, " +
        "levenshtein(CAST(NULL AS STRING), 'x', 1) < 0 AS b").head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("graft_nfc composes decomposed text in SQL and stays codegen'd") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_nfc('café') AS a, graft_nfc('café') AS b, " +
        "graft_nfc(CAST(NULL AS STRING)) AS n, length(graft_nfc('café')) AS l")
      .head()
    assert(r.getString(0) === "café" && r.getString(1) === "café")
    assert(r.isNullAt(2) && r.getInt(3) === 4)
    // a literal input constant-folds away entirely (the expression is
    // foldable); a column input must stay inside whole-stage codegen
    val exec = spark.range(1)
      .selectExpr("graft_nfc(cast(id as string)) as v")
      .queryExecution.executedPlan
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString
    }
    assert(inCodegen.exists(_.contains("graft_nfc")), exec.toString)
  }

  test("graft_strip_accents strips combining marks after NFD; non-decomposable chars survive") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_strip_accents('Café naïve ça ü') AS a, " +
        "graft_strip_accents('café') AS b, " + // already-decomposed input
        "graft_strip_accents('Øl østers Ω') AS c, " +
        "graft_strip_accents('plain') AS d, " +
        "graft_strip_accents(CAST(NULL AS STRING)) AS n").head()
    assert(r.getString(0) === "Cafe naive ca u")
    assert(r.getString(1) === "cafe")
    assert(r.getString(2) === "Øl østers Ω", "no canonical decomposition -> untouched")
    assert(r.getString(3) === "plain")
    assert(r.isNullAt(4))
    // column API agrees
    import spark.implicits._
    val viaCol = Seq("résumé").toDF("t")
      .select(org.apache.spark.sql.graft.StripAccents.stripAccents(
        org.apache.spark.sql.functions.col("t")))
      .head().getString(0)
    assert(viaCol === "resume")
  }

  test("graft_url_canonical normalizes crawl variants in SQL") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_url_canonical('HTTPS://Ex.COM:443/p?b=2&utm_source=x&a=1#f') AS u")
      .head()
    assert(r.getString(0) === "https://ex.com/p?a=1&b=2")
  }
}
