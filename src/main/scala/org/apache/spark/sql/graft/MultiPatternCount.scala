package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring counting (Aho & Corasick 1975):
  * one pass over the text matching EVERY pattern simultaneously — the
  * blocklist/badwords/PII-keyword primitive at corpus scale, where the
  * naive alternative (one regex or indexOf sweep per pattern) pays
  * O(|patterns| · |text|) per document and a 10k-entry blocklist turns a
  * scan into 10k scans. Counts ALL occurrences including overlapping
  * ones ("aa" in "aaa" = 2 — the automaton's dictionary-suffix chain),
  * the standard AC semantics. Returns
  * struct(n_hits bigint, n_patterns int) — total occurrences across
  * patterns and the number of DISTINCT patterns present; NULL text →
  * NULL. Matching is code-point exact on the char sequence (the
  * blocklist contract: callers lowercase both sides for
  * case-insensitive use — [[graft.operators.Scrub.blocklistHits]]
  * does).
  *
  * The automaton is built ONCE per executor from the pattern list baked
  * into the expression (driver-held, bounded — a blocklist is a recipe,
  * not data) and walked left-to-right: goto with fail links, hits
  * accumulated along each node's dictionary-suffix chain. O(|text| +
  * matches) per document regardless of pattern count.
  *
  * 100 TB shape: a pure per-row expression — no shuffle, no join; the
  * pattern list rides the serialized expression (same distribution
  * class as a broadcast literal). Interpreted eval (CodegenFallback):
  * the per-char automaton step is a hash lookup, already the dominant
  * cost codegen couldn't remove. */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(patterns.nonEmpty, "patterns must be non-empty")
  require(patterns.forall(_.nonEmpty), "empty-string patterns are not searchable")
  require(patterns.distinct.size == patterns.size,
    s"duplicate patterns: ${patterns.diff(patterns.distinct).distinct}")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_patterns", IntegerType, nullable = false)))
  override def prettyName: String = "multi_pattern_count"

  @transient private lazy val ac = new MultiPatternCount.Automaton(patterns.toArray)

  override protected def nullSafeEval(input: Any): Any = {
    val (hits, distinct) = ac.run(input.asInstanceOf[UTF8String].toString)
    InternalRow(hits, distinct)
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object MultiPatternCount {

  /** Classic goto/fail/dictionary-suffix automaton over chars. */
  private[graft] final class Automaton(patterns: Array[String]) {
    private val goto = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    private val endPat = scala.collection.mutable.ArrayBuffer(-1)
    // trie
    for (p <- patterns.indices) {
      var s = 0
      for (c <- patterns(p)) {
        s = goto(s).getOrElseUpdate(c, {
          goto += scala.collection.mutable.HashMap.empty[Char, Int]
          endPat += -1
          goto.size - 1
        })
      }
      endPat(s) = p
    }
    private val fail = Array.fill(goto.size)(0)
    // dict(s): nearest proper-suffix state that ends a pattern (0 = none)
    private val dict = Array.fill(goto.size)(0)
    // BFS fail/dict construction
    locally {
      val q = scala.collection.mutable.Queue.empty[Int]
      for ((_, s) <- goto(0)) q.enqueue(s)
      while (q.nonEmpty) {
        val s = q.dequeue()
        for ((c, t) <- goto(s)) {
          var f = fail(s)
          while (f != 0 && !goto(f).contains(c)) f = fail(f)
          fail(t) = if (s != 0 && goto(f).contains(c)) goto(f)(c) else 0
          if (fail(t) == t) fail(t) = 0
          dict(t) = if (endPat(fail(t)) >= 0) fail(t) else dict(fail(t))
          q.enqueue(t)
        }
      }
    }

    /** One pass: (total occurrences, distinct patterns present). */
    def run(text: String): (Long, Int) = {
      var hits = 0L
      val seen = new Array[Boolean](patterns.length)
      var nSeen = 0
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !goto(s).contains(c)) s = fail(s)
        s = goto(s).getOrElse(c, 0)
        var o = if (endPat(s) >= 0) s else dict(s)
        while (o != 0) {
          hits += 1L
          val p = endPat(o)
          if (!seen(p)) { seen(p) = true; nSeen += 1 }
          o = dict(o)
        }
        i += 1
      }
      (hits, nSeen)
    }
  }

  /** Column wrapper: multi_pattern_count(text) over a fixed pattern list. */
  def of(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      MultiPatternCount(ExpressionUtils.expression(text), patterns))
}
