package graft

import graft.operators.{Mixture, Splits}
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = spark.range(1000).select(
    concat(lit("d"), $"id").as("doc_id"),
    when($"id" % 5 === 0, "rare").otherwise("common").as("src"))

  test("weight 1 keeps each row exactly once; weight 0 drops the source") {
    val out = Mixture.sampleMixture(corpus, "src", "doc_id",
      Map("rare" -> 1.0, "common" -> 0.0), salt = "m1")
    assert(out.count() === 200)
    assert(out.select("mix_rep").distinct().as[Int].collect().toSeq === Seq(0))
    assert(out.select("src").distinct().as[String].collect().toSeq === Seq("rare"))
  }

  test("integer weight > 1 repeats every row exactly w times") {
    val out = Mixture.sampleMixture(corpus, "src", "doc_id",
      Map("rare" -> 3.0), defaultWeight = 0.0, salt = "m2")
    assert(out.count() === 600)
    assert(out.groupBy("doc_id").count().select("count").distinct()
      .as[Long].collect().toSeq === Seq(3L))
  }

  test("fractional weights land near the expected rate and stay monotone in w") {
    def kept(w: Double) = Mixture.sampleMixture(corpus, "src", "doc_id",
      Map("common" -> w), defaultWeight = 0.0, salt = "m3")
      .select("doc_id", "mix_rep").as[(String, Int)].collect().toSet
    val half = kept(0.5)
    assert(math.abs(half.size - 400) < 60, s"got ${half.size} of 800 expected 400±60")
    // 1.3: every base copy survives + ~30% seconds
    val up = kept(1.3)
    assert(up.count(_._2 == 0) === 800)
    assert(math.abs(up.count(_._2 == 1) - 240) < 60)
    // monotone: every copy kept at 0.5 is kept at 0.8 (same salt)
    assert(half.subsetOf(kept(0.8)))
  }

  test("mixture is a pure function of (salt, rep, key): reorder-stable, salt re-deals") {
    val a = Mixture.sampleMixture(corpus, "src", "doc_id", Map("common" -> 0.4), salt = "s1")
      .select("doc_id", "mix_rep").as[(String, Int)].collect().toSet
    val b = Mixture.sampleMixture(corpus.orderBy($"doc_id".desc), "src", "doc_id",
      Map("common" -> 0.4), salt = "s1")
      .select("doc_id", "mix_rep").as[(String, Int)].collect().toSet
    assert(a === b)
    val c = Mixture.sampleMixture(corpus, "src", "doc_id", Map("common" -> 0.4), salt = "s2")
      .select("doc_id", "mix_rep").as[(String, Int)].collect().toSet
    assert(a !== c)
  }

  test("the mixture plan is narrow: no Exchange anywhere") {
    val out = Mixture.sampleMixture(corpus, "src", "doc_id", Map("rare" -> 2.5), salt = "p")
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("temperatureWeights: tau=1 is natural proportions; tau>1 upweights rare sources") {
    val counts = Map("a" -> 100L, "b" -> 400L)
    val t1 = Mixture.temperatureWeights(counts, tau = 1.0)
    assert(t1("a") === 1.0 && t1("b") === 1.0) // every source at maxWeight
    val t2 = Mixture.temperatureWeights(counts, tau = 2.0, maxWeight = 2.0)
    assert(t2("a") === 2.0) // rarest source pinned to maxWeight
    assert(math.abs(t2("b") - 1.0) < 1e-12) // (0.8/0.2)^-0.5 * 2 = 1
    assert(t2("a") > t2("b"))
  }

  test("guard rails: bad weights, colliding/reserved columns") {
    intercept[IllegalArgumentException] {
      Mixture.sampleMixture(corpus, "src", "doc_id", Map("rare" -> -1.0))
    }
    intercept[IllegalArgumentException] {
      Mixture.sampleMixture(corpus, "src", "doc_id", Map("rare" -> Double.NaN))
    }
    intercept[IllegalArgumentException] { // repeat fan-out guard
      Mixture.sampleMixture(corpus, "src", "doc_id", Map("rare" -> 1e6))
    }
    intercept[IllegalArgumentException] {
      Mixture.sampleMixture(corpus.withColumn("mix_rep", lit(1)), "src", "doc_id", Map())
    }
    intercept[IllegalArgumentException] {
      Mixture.sampleMixture(corpus.withColumn("__mix_w", lit(1)), "src", "doc_id", Map())
    }
    intercept[IllegalArgumentException] {
      Mixture.temperatureWeights(Map("a" -> 0L), tau = 1.0)
    }
    intercept[IllegalArgumentException] {
      Mixture.temperatureWeights(Map("a" -> 10L), tau = 0.0)
    }
  }

  test("matchMixture: the kept subset matches the recipe exactly at the max total") {
    val df = ((1L to 10L).map(i => (i, "a")) ++ (11L to 20L).map(i => (i, "b")) ++
      (21L to 24L).map(i => (i, "c")) ++ Seq((99L, "zzz_not_in_recipe")))
      .toDF("id", "src")
    val target = Map("a" -> 500000L, "b" -> 300000L, "c" -> 200000L)
    val kept = Mixture.matchMixture(df, "src", target, "id", "s1")
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // T = min(10/0.5, 10/0.3, 4/0.2) = 20 -> quotas 10 / 6 / 4
    assert(kept === Map("a" -> 10L, "b" -> 6L, "c" -> 4L))
  }

  test("matchMixture: monotone — new data only ADDS rows; missing key empties") {
    val base = ((1L to 10L).map(i => (i, "a")) ++ (11L to 20L).map(i => (i, "b")) ++
      (21L to 24L).map(i => (i, "c")))
    val target = Map("a" -> 500000L, "b" -> 300000L, "c" -> 200000L)
    def ids(rows: Seq[(Long, String)]) =
      Mixture.matchMixture(rows.toDF("id", "src"), "src", target, "id", "s1")
        .select("id").as[Long].collect().toSet
    val s0 = ids(base)
    // growing the non-binding key c leaves every QUOTA unchanged (T is
    // still bound by a) — c's 4 seats re-deal over 8 candidates, a and
    // b selections are untouched
    val grown = base ++ (25L to 28L).map(i => (i, "c"))
    val s1 = ids(grown)
    assert(s1.size === s0.size)
    assert(s1.filter(_ <= 20L) === s0.filter(_ <= 20L),
      "a/b selections stable when only c grows")
    // growing the binding key a raises T = 24: quotas 12/7/4 — over the
    // SAME population plus the new a rows, the old selection only grows
    val s2 = ids(grown ++ (29L to 30L).map(i => (i, "a")))
    assert(s1.subsetOf(s2) && s2.size > s1.size)
    // a recipe key with zero rows supports no total at all
    val s3 = ids(base.filterNot(_._2 == "c"))
    assert(s3.isEmpty)
    intercept[IllegalArgumentException] {
      Mixture.matchMixture(base.toDF("id", "src"), "src",
        Map("a" -> 600000L, "b" -> 600000L), "id", "s1")
    }
  }

  test("epochReplicate: integer epochs exact, fractional epochs seeded, zero drops, absent keys pass") {
    val df = (1L to 200L).map(i =>
      (i, if (i % 4 == 0) "a" else if (i % 4 == 1) "b"
          else if (i % 4 == 2) "c" else "d")).toDF("id", "k")
    val out = Mixture.epochReplicate(df, "k", "id",
      Map("a" -> 2.0, "b" -> 0.5, "c" -> 0.0))
    val got = out.select("k", "id", "copy")
      .as[(String, Long, Int)].collect()
    val byKey = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byKey("a") === 100, "2.0 epochs = exactly two copies per row")
    assert(!byKey.contains("c"), "0.0 epochs drops every row")
    assert(byKey("d") === 50, "absent key defaults to exactly 1 epoch")
    // b at 0.5: seeded md5 draw; deterministic and strictly between 0 and 50x2
    assert(byKey("b") > 0 && byKey("b") < 50)
    val again = Mixture.epochReplicate(df, "k", "id",
        Map("a" -> 2.0, "b" -> 0.5, "c" -> 0.0))
      .select("k", "id", "copy").as[(String, Long, Int)].collect()
    assert(again.toSet === got.toSet, "the draw is a pure function of the key/id")
    // copies are contiguous 0-based per row
    val copiesA = got.filter(r => r._1 == "a" && r._2 == 4L).map(_._3).sorted
    assert(copiesA.toSeq === Seq(0, 1))
  }
}
