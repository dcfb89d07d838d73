package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pluggable LLM boundary (reference: utils.py:83-164, call_ai_model).
  * The environment is zero-egress, so the default implementation is the
  * deterministic compiler below; an online client can be swapped in.
  * Contract carried over from the reference: callers sample at most 10 rows
  * / 20 000 chars of context (utils.py:129) — enforced by PromptBudget.
  */
trait LlmClient extends Serializable {
  def completeJson(prompt: String, context: String): String
  def completeCode(prompt: String, context: String): String
}

object PromptBudget {
  val MaxRows = 10
  val MaxChars = 20000
  def clip(sampleRows: Seq[String]): String = {
    val s = sampleRows.take(MaxRows).mkString("\n")
    if (s.length > MaxChars) s.substring(0, MaxChars) else s
  }
}

/** Deterministic NL -> DataFrame-plan compiler (reference C3,
  * magictable.py:148-200). The reference asks an LLM for pandas code and
  * `exec`s it; here the observed operation classes (example.ipynb generated
  * code: pd.to_datetime(errors='coerce'), sort_values desc,
  * drop_duplicates(subset, keep='first'), head(k), column projection, and
  * simple comparison filters) compile directly to Catalyst plans — no code
  * execution, fully distributed, optimizable.
  *
  * Grammar (case-insensitive, clause order free):
  *   top|first|head <k>            -> limit k (after any sort)
  *   by <k1> [asc|desc][, <k2> [asc|desc]...] -> multi-key orderBy
  *                                    (desc default for "top")
  *   unique|distinct by <col>      -> keep-first-after-sort dedup (window)
  *   show|showing|select <c1, c2 and c3>   -> projection
  *   where <col> <op> <value>      -> filter (op: = != > < >= <=, is null)
  *   parse <col> as date|timestamp -> to_timestamp (null on failure — the
  *                                    pandas errors='coerce' analogue)
  *   count|sum|avg|min|max [of] [col]
  *     per|group(ed) by <g1[, g2]> -> groupBy(g...).agg(...); filters parse
  *                                    against the INPUT schema and run
  *                                    pre-aggregation, every other clause
  *                                    compiles against the aggregated
  *                                    schema (count -> "n", else "<fn>_<col>")
  *   top <k> per|within each|for each <g1[, g2]>
  *                                 -> grouped top-k: row_number() over
  *                                    (partition by g, order by the sort
  *                                    clause, desc default) kept as `rank`,
  *                                    cut to rank <= k
  *   rank by <col...> per <g...>   -> same window, `rank` column only (no
  *                                    cut)
  *   running|cumulative total|sum [of] <col> [per <g1[, g2]>]
  *                                 -> running_<col>: windowed prefix sum
  *                                    ordered by the sort clause (ASC
  *                                    default — chronological), explicit
  *                                    ROWS unbounded-preceding..current
  *                                    frame
  */
object NlCompiler {

  /** warnings lists clauses that PARSED but did not resolve against the
    * schema (typo'd column, etc.) and were therefore dropped — the
    * reference's best-effort posture. Strict callers (GraphQuery) refuse
    * to run when warnings is non-empty rather than silently widen results. */
  case class Compiled(describe: String, apply: DataFrame => DataFrame,
      warnings: Seq[String] = Nil)

  // group tokens must EXCLUDE grammar keywords: the list joins with bare
  // "and", so without the lookahead "count per region and top 5" captures
  // "top" as a group column — resolve() drops it silently and replaceAllIn
  // then strips the keyword, destroying the following clause
  private val grammarKeyword =
    "(?:top|first|head|show|showing|select|return|returning|where|parse|convert|by|unique|distinct|join|on|per|within|for|each|running|cumulative)"
  private val aggRx =
    ("""(?i)\b(count|sum|total|avg|average|mean|min|max)\s+(?:of\s+)?(?:((?!""" + grammarKeyword +
      """\b)[a-z0-9_\.]+)\s+)?(?:per|grouped\s+by|group\s+by)\s+((?!""" + grammarKeyword +
      """\b)[a-z0-9_\.]+(?:\s*(?:,|and)\s*(?!""" + grammarKeyword +
      """\b)[a-z0-9_\.]+)*)""").r
  // comparison ops take a value; null-checks must NOT (an optional value
  // group after "is null" would swallow the next clause's keyword, and the
  // agg branch strips whole matches from the remainder)
  private val filterRx =
    """(?i)\bwhere\s+([a-zA-Z0-9_\.]+)\s*(?:(>=|<=|!=|=|>|<)\s*('[^']*'|"[^"]*"|[a-zA-Z0-9_\.\-]+)?|(is\s+(?:not\s+)?null))""".r

  /** Normalized (op, value) of a filterRx match. */
  private def filterOpValue(m: scala.util.matching.Regex.Match): (String, String) =
    Option(m.group(2)) match {
      case Some(cmp) =>
        (cmp, Option(m.group(3)).map(_.stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")).getOrElse(""))
      case None => (m.group(4).toLowerCase.replaceAll("\\s+", " "), "")
    }
  private val dateRx =
    """(?i)\b(?:parse|convert)\s+([a-z0-9_\.]+)\s+(?:as|to)\s+(?:a\s+)?(?:date(?:time)?|timestamp)""".r
  private val topKRx = """(?i)\b(?:top|first|head)\s+(\d+)\b""".r
  /** `per|within each|for each <g1[, g2]>` — the window partition clause of
    * the grouped top-k / rank / running-total classes. */
  private val perRx =
    ("""(?i)\b(?:per|within\s+each|for\s+each)\s+((?!""" + grammarKeyword +
      """\b)[a-z0-9_\.]+(?:\s*(?:,|\band\b)\s*(?!""" + grammarKeyword +
      """\b)[a-z0-9_\.]+)*)""").r
  /** `running|cumulative total|sum of <col>` — windowed cumulative sum;
    * MUST be checked before aggRx (whose own `total ... per` pattern is a
    * strict suffix of this one and would compile a groupBy instead). */
  private val runningRx =
    ("""(?i)\b(?:running|cumulative)\s+(?:total|sum)\s+(?:of\s+)?((?!""" +
      grammarKeyword + """\b)[a-z0-9_\.]+)""").r
  /** `share|percent of <col> per <groups>` — per-group share of the
    * grand total; percent verbs scale by 100. */
  private val shareRx =
    ("""(?i)\b(share|percent(?:age)?|pct|fraction|proportion)\s+of\s+((?!""" +
      grammarKeyword + """\b)[a-z0-9_\.]+)\s+(?:per|grouped\s+by|group\s+by)\s+((?!""" +
      grammarKeyword + """\b)[a-z0-9_\.]+(?:\s*(?:,|and)\s*(?!""" + grammarKeyword +
      """\b)[a-z0-9_\.]+)*)""").r
  /** `rank by ...` — the rank-only window verb; group(1) keeps the `by` so
    * stripping the verb leaves the sort clause intact ("$1" replacement). */
  private val rankVerbRx = """(?i)\brank(?:ed)?(\s+by)\b""".r
  private val uniqueRx =
    """(?i)\b(?:unique|distinct|dedup(?:licated?)?)\s+(?:by\s+)?([a-z0-9_\.]+)""".r

  /** Deterministic-order tie-break sorts on at most this many remaining
    * columns; wider schemas collapse the tail into a single xxhash64 sort
    * key — at scale a 100-column tie-break key would dominate the shuffle
    * write, but the hash keeps the order total (modulo 64-bit collisions)
    * at 8 bytes. */
  val MaxTieBreakCols = 8

  // sort keys: multi-word column phrases whose words are never grammar
  // keywords, direction words, or the list separator — the clause capture
  // then stops on its own right before the next clause ("by price top 5")
  private val sortDir = "(?:asc|desc|ascending|descending)"
  private val sortWord =
    "(?!" + grammarKeyword + "\\b|and\\b|" + sortDir + "\\b)[a-z0-9_\\.]+"
  private val sortPhrase = sortWord + "(?:\\s+" + sortWord + ")*"
  /** `by k1 [dir] [, k2 [dir] ...]` — multi-key, pandas
    * sort_values(["k1","k2"], ascending=[...]) analogue; the reference's LLM
    * path routinely emits multi-key sorts. */
  private val sortClauseRx =
    ("(?i)\\bby\\s+(" + sortPhrase + "(?:\\s+" + sortDir + ")?" +
      "(?:\\s*(?:,|\\band\\b)\\s*" + sortPhrase + "(?:\\s+" + sortDir + ")?)*)").r
  private val sortSegRx = ("""(?i)^(.*?)(?:\s+(""" + sortDir + """))?$""").r

  /** Parse the sort clause into (resolvedCol, explicit direction) pairs —
    * direction stays raw (None when unspecified) so each caller applies
    * its own default: the sort/top-k paths default DESC ("top 5 by price"
    * means highest-first), the running-total path defaults ASC ("running
    * total by date" means chronological). */
  private def parseSortKeys(search: String, resolve: String => Option[String],
      warn: String => Unit): Seq[(String, Option[String])] =
    sortClauseRx.findFirstMatchIn(search).toSeq.flatMap { m =>
      m.group(1).split("""\s*(?:,|\band\b)\s*""").toSeq
        .map(_.trim).filter(_.nonEmpty).flatMap { seg =>
          val sm = sortSegRx.findFirstMatchIn(seg).get
          resolve(sm.group(1)) match {
            case Some(c) => Some((c, Option(sm.group(2)).map(_.toLowerCase)))
            case None =>
              warn(s"sort column '${sm.group(1).trim}' did not resolve")
              None
          }
        }
    }

  /** Deterministic TOTAL order: the resolved sort keys, then every
    * remaining column ascending as the tie-break (pandas keep='first'
    * depends on input order, which has no distributed equivalent). On
    * schemas wider than [[MaxTieBreakCols]] the tail collapses into one
    * xxhash64 so the sort key stays bounded WITHOUT surrendering the
    * total order — only a 64-bit collision (or fully identical rows,
    * which are interchangeable) leaves a tie. MapType columns are not
    * hashable in Spark and drop from the hash tail. */
  private def totalOrder(df0: DataFrame,
      sortKeys: Seq[(String, Boolean)]): Seq[Column] = {
    def cref(name: String): Column = col(s"`${name.replace("`", "``")}`")
    val primary = sortKeys.map { case (c, asc) => if (asc) cref(c).asc else cref(c).desc }
    val named = sortKeys.map(_._1).toSet
    val rest = df0.columns.toSeq.filterNot(named)
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val tieBreak =
      if (rest.size <= MaxTieBreakCols) rest.map(cref(_).asc)
      else {
        val tail = rest.drop(MaxTieBreakCols - 1)
          .filter(c => hashable(df0.schema(c).dataType))
        rest.take(MaxTieBreakCols - 1).map(cref(_).asc) ++
          (if (tail.isEmpty) Nil else Seq(xxhash64(tail.map(cref): _*).asc))
      }
    primary ++ tieBreak
  }

  def compile(query: String, columns: Seq[String]): Compiled =
    compileWith(query, columns, ascDefault = false)

  /** [[compile]] with the sort-direction default made explicit: the
    * top-level default is DESC ("top 5 by price" means highest-first),
    * but the running-total branch recurses on its remainder with
    * ascDefault = true so a direction-free "running total of x by date"
    * both ACCUMULATES chronologically (the window's ASC default) and
    * EMITS rows in that same order — one resolved default per query,
    * never two. */
  private def compileWith(query: String, columns: Seq[String],
      ascDefault: Boolean): Compiled = {
    val q = " " + query.trim + " "
    val lower = q.toLowerCase
    val steps = scala.collection.mutable.ArrayBuffer.empty[String]

    def resolve(name: String): Option[String] = {
      val n = name.trim.stripPrefix("`").stripSuffix("`")
      columns.find(_.equalsIgnoreCase(n))
        .orElse(columns.find(_.equalsIgnoreCase(n.replace(' ', '_'))))
        .orElse(columns.find(c => c.equalsIgnoreCase(n + "s") || (c + "s").equalsIgnoreCase(n)))
        .orElse {
          // separator-insensitive fallback for NL phrases vs TPC-H-style
          // prefixed columns: "total price" -> o_totalprice. The comparison
          // strips [ _ .], optionally drops the column's FIRST
          // underscore-delimited segment (the table-prefix convention), and
          // stays EXACT on the remainder (±plural). The match must be
          // UNIQUE: with columns (unit_price, total_price) a bare "price"
          // is ambiguous and resolves to nothing — binding it to whichever
          // column the schema lists first would silently rewrite the query.
          val flat = n.toLowerCase.replaceAll("[ _\\.]", "")
          val wanted = Set(flat, flat.stripSuffix("s"))
          val hits = columns.filter { c =>
            val cl = c.toLowerCase
            val whole = cl.replaceAll("[_\\.]", "")
            val noPrefix = cl.split("[_\\.]", 2) match {
              case Array(_, rest) => rest.replaceAll("[_\\.]", "")
              case _ => whole
            }
            wanted.contains(whole) || wanted.contains(noPrefix) ||
              wanted.contains(whole.stripSuffix("s")) || wanted.contains(noPrefix.stripSuffix("s"))
          }
          if (hits.size == 1) hits.headOption else None
        }
    }

    def cref(name: String): Column = col(s"`${name.replace("`", "``")}`")

    /** Shared by the window branches: groups of the per-clause (resolved,
      * with no-silent-drop warnings), pre-window filters and date parses
      * (INPUT-schema clauses, applied before the window — the agg-branch
      * convention), and the query remainder with all of those stripped. */
    def perGroups(): (Seq[String], Seq[String]) =
      perRx.findFirstMatchIn(q) match {
        case Some(pm) =>
          val toks = pm.group(1).split("""(?i)\s*(?:,|\band\b)\s*""").toSeq
          val resolved = toks.map(g => g -> resolve(g))
          (resolved.flatMap(_._2),
            resolved.collect { case (tok, None) => s"group column '$tok' did not resolve" })
        case None => (Nil, Nil)
      }
    def preClauses(): (Seq[(String, String, String)], Seq[String]) = (
      filterRx.findAllMatchIn(q).toSeq.flatMap { fm =>
        resolve(fm.group(1)).map { c =>
          val (op, v) = filterOpValue(fm); (c, op, v)
        }
      },
      dateRx.findAllMatchIn(q).toSeq.flatMap(dm => resolve(dm.group(1))))
    def stripPre(s: String): String =
      dateRx.replaceSomeIn(
        filterRx.replaceSomeIn(s,
          fm => if (resolve(fm.group(1)).isDefined) Some(" ") else None),
        dm => if (resolve(dm.group(1)).isDefined) Some(" ") else None)

    // ---- running / cumulative total: a window, not a groupBy -------------
    // Checked BEFORE aggRx: "running total of x per g" contains the agg
    // grammar "total of x per g" as a suffix and would otherwise compile to
    // a groupBy sum. Order comes from the query's sort clause (ASC default
    // here — "running total by date" means chronological); the sort clause
    // stays in the remainder so the OUTPUT is also ordered by it.
    val runM = runningRx.findFirstMatchIn(q)
    if (runM.isDefined) {
      val m = runM.get
      val valCol = resolve(m.group(1)).getOrElse(throw new IllegalArgumentException(
        s"running-total column '${m.group(1)}' did not resolve"))
      val outName = s"running_$valCol"
      require(!columns.exists(_.equalsIgnoreCase(outName)),
        s"input already has a '$outName' column")
      val warnB = scala.collection.mutable.ArrayBuffer.empty[String]
      val (groupCols, groupWarnings) = perGroups()
      val orderKeys = parseSortKeys(uniqueRx.replaceAllIn(lower, " "),
          resolve, warnB += _)
        .map { case (c, dir) => (c, !dir.exists(_.startsWith("desc"))) }
      require(orderKeys.nonEmpty,
        s"running total needs an order: add 'by <col> [asc|desc]' in: $query")
      val (preFilters, preDates) = preClauses()
      val rest = runningRx.replaceAllIn(perRx.replaceAllIn(stripPre(q), " "), " ")
      val post = compileWith(rest, columns :+ outName, ascDefault = true)
      val describe = (s"runningSum=$valCol->$outName" +
        s":per=${groupCols.mkString("|")}" +
        s":order=${orderKeys.map { case (c, a) => s"$c:${if (a) "asc" else "desc"}" }.mkString("|")}" +
        preDates.map(c => s";toTimestamp=$c").mkString +
        preFilters.map { case (c, op, v) => s";filter=$c$op$v" }.mkString +
        (if (post.describe.nonEmpty) ";" + post.describe else ""))
      return Compiled(describe, { df0 =>
        val dated = preDates.foldLeft(df0)((d, c) =>
          d.withColumn(c, try_to_timestamp(cref(c))))
        val filtered = preFilters.foldLeft(dated) { case (d, (c, op, v)) =>
          d.filter(comparison(cref(c), op, v))
        }
        // explicit ROWS frame: the default RANGE frame sums whole peer
        // groups at once; with the total order they coincide, but ROWS
        // states the sequential-prefix intent (and is what the oracle pins)
        val w = Window.partitionBy(groupCols.map(cref): _*)
          .orderBy(totalOrder(filtered, orderKeys): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        post.apply(filtered.withColumn(outName, sum(cref(valCol)).over(w)))
      }, groupWarnings ++ warnB.toSeq ++ post.warnings)
    }

    // ---- share-of-total: one agg + one broadcast total join --------------
    // "share of revenue per region": groupBy(g).agg(sum -> sum_<col>), the
    // grand total re-aggregated from the |groups|-sized frame (exact for
    // decimal inputs — same values, just re-summed) and broadcast back as
    // a 1-row cross join. Checked before aggRx: the share verbs are not
    // agg verbs, but a query holding both ("share of x per g top 3")
    // must resolve to the share class with the rest compiling post-agg.
    val shareM = shareRx.findFirstMatchIn(q)
    if (shareM.isDefined) {
      val m = shareM.get
      val verb = m.group(1).toLowerCase
      val isPercent = verb.startsWith("percent") || verb == "pct"
      val valCol = resolve(m.group(2)).getOrElse(throw new IllegalArgumentException(
        s"share-of column '${m.group(2)}' did not resolve"))
      val groupToks = m.group(3).split("""(?i)\s*(?:,|\band\b)\s*""").toSeq
      val groupResolved = groupToks.map(g => g -> resolve(g))
      val groupCols = groupResolved.flatMap(_._2)
      val groupWarnings = groupResolved.collect {
        case (tok, None) => s"group column '$tok' did not resolve"
      }
      require(groupCols.nonEmpty,
        s"no resolvable grouping column in: ${m.group(3)}")
      val sumName = s"sum_$valCol"
      val outName = if (isPercent) s"percent_$valCol" else s"share_$valCol"
      Seq(sumName, outName).foreach(n =>
        require(!columns.exists(_.equalsIgnoreCase(n)),
          s"input already has a '$n' column"))
      val (preFilters, preDates) = preClauses()
      val rest = shareRx.replaceAllIn(stripPre(q), " ")
      val post = compileWith(rest, groupCols ++ Seq(sumName, outName), ascDefault)
      val describe = (s"shareOf=$valCol->$outName:by=${groupCols.mkString("|")}" +
        preDates.map(c => s";toTimestamp=$c").mkString +
        preFilters.map { case (c, op, v) => s";filter=$c$op$v" }.mkString +
        (if (post.describe.nonEmpty) ";" + post.describe else ""))
      return Compiled(describe, { df0 =>
        val dated = preDates.foldLeft(df0)((d, c) =>
          d.withColumn(c, try_to_timestamp(cref(c))))
        val filtered = preFilters.foldLeft(dated) { case (d, (c, op, v)) =>
          d.filter(comparison(cref(c), op, v))
        }
        // FLOATING value columns sum through the repo's exact-decimal
        // contract (DECIMAL(25,6) accumulator, double result — the q01
        // dsum rule): a raw double SUM is addition-order-dependent,
        // which surfaced the moment the input scan stopped being a
        // single task (r17 fan-out) — shares must not depend on
        // partitioning. Integer/decimal columns keep the plain sum
        // (already exact and order-independent, and the sum column
        // keeps its natural type).
        val isFloating = filtered.schema(valCol).dataType match {
          case org.apache.spark.sql.types.DoubleType |
               org.apache.spark.sql.types.FloatType => true
          case _ => false
        }
        val vexpr =
          if (isFloating) cref(valCol).cast(org.apache.spark.sql.types.DecimalType(25, 6))
          else cref(valCol)
        val grp = filtered.groupBy(groupCols.map(cref): _*)
          .agg(sum(vexpr).as("__dsum"))
        val total = grp.agg(sum(col("__dsum")).as("__tot"))
        val frac = col("__dsum").cast("double") / col("__tot").cast("double")
        val out = round(
          (if (isPercent) frac * lit(100.0) else frac)
            .cast(org.apache.spark.sql.types.DecimalType(25, 12)), 9)
          .cast("double")
        post.apply(grp.crossJoin(broadcast(total))
          .withColumn(sumName,
            if (isFloating) col("__dsum").cast("double") else col("__dsum"))
          .withColumn(outName, out)
          .drop("__tot", "__dsum"))
      }, groupWarnings ++ post.warnings)
    }

    // ---- aggregation clause: handled by recursion ------------------------
    // Filters (and date parses) resolve against the INPUT schema and run
    // before the groupBy; the query REMAINDER (sort/limit/show/...) compiles
    // against the aggregated schema, so "count per grp by n desc top 3"
    // sorts the group counts.
    val aggM = aggRx.findFirstMatchIn(q)
    if (aggM.isDefined) {
      val m = aggM.get
      val fn = m.group(1).toLowerCase
      val valCol = Option(m.group(2)).map(_.trim).filter(_.nonEmpty).flatMap(resolve)
      val groupToks = m.group(3).split("""(?i)\s*(?:,|\band\b)\s*""").toSeq
      val groupResolved = groupToks.map(g => g -> resolve(g))
      val groupCols = groupResolved.flatMap(_._2)
      // no-silent-drop contract: a group token that parsed but failed to
      // resolve surfaces as a warning — strict callers (GraphQuery.queryNl)
      // refuse to run rather than silently group by fewer columns
      val groupWarnings = groupResolved.collect {
        case (tok, None) => s"group column '$tok' did not resolve"
      }
      require(groupCols.nonEmpty, s"no resolvable grouping column in: ${m.group(3)}")
      def gref(c: String) = col(s"`${c.replace("`", "``")}`")
      val (aggCol, outName) = fn match {
        case "count" => (count(lit(1)), "n")
        case f =>
          val c = valCol.getOrElse(throw new IllegalArgumentException(
            s"aggregate '$f' needs a value column ('$f of <col> per ...')"))
          val canon = Map("total" -> "sum", "average" -> "avg", "mean" -> "avg")
            .getOrElse(f, f)
          val column = canon match {
            case "sum" => sum(gref(c))
            case "avg" => avg(gref(c))
            case "min" => min(gref(c))
            case "max" => max(gref(c))
          }
          (column, s"${canon}_$c")
      }
      val preFilters = filterRx.findAllMatchIn(q).toSeq.flatMap { fm =>
        resolve(fm.group(1)).map { c =>
          val (op, v) = filterOpValue(fm)
          (c, op, v)
        }
      }
      // date parses name INPUT columns — apply them before the groupBy
      val preDates = dateRx.findAllMatchIn(q).toSeq.flatMap(m => resolve(m.group(1)))
      // strip only the clauses that resolved PRE-agg; a filter naming the
      // aggregate output (e.g. "where n > 2" — a HAVING) stays in the
      // remainder and compiles against the aggregated schema below
      val rest = aggRx.replaceAllIn(
        dateRx.replaceSomeIn(
          filterRx.replaceSomeIn(q,
            fm => if (resolve(fm.group(1)).isDefined) Some(" ") else None),
          dm => if (resolve(dm.group(1)).isDefined) Some(" ") else None),
        " ")
      val post = compileWith(rest, groupCols :+ outName, ascDefault)
      val describe = (s"groupAgg=$fn:${valCol.getOrElse("*")}->$outName:by=${groupCols.mkString("|")}" +
        preDates.map(c => s";toTimestamp=$c").mkString +
        preFilters.map { case (c, op, v) => s";filter=$c$op$v" }.mkString +
        (if (post.describe.nonEmpty) ";" + post.describe else ""))
      return Compiled(describe, { df0 =>
        val dated = preDates.foldLeft(df0)((d, c) => d.withColumn(c, try_to_timestamp(gref(c))))
        val filtered = preFilters.foldLeft(dated) { case (d, (c, op, v)) =>
          d.filter(comparison(gref(c), op, v))
        }
        post.apply(filtered.groupBy(groupCols.map(gref): _*).agg(aggCol.as(outName)))
      }, groupWarnings ++ post.warnings)
    }

    // ---- grouped top-k / rank-within-group: a window, not a limit --------
    // "top 3 per brand by price" / "rank by score per lang": row_number()
    // over (partition groups, order by sort keys DESC-default + total-order
    // tie-break), kept as a `rank` column; `top <k>` also cuts rank <= k,
    // the bare rank verb keeps every row. The sort clause stays in the
    // remainder (global output order); filters/date parses are pre-window.
    val topPerM = topKRx.findFirstMatchIn(q)
    val rankM = rankVerbRx.findFirstMatchIn(q)
    if ((topPerM.isDefined || rankM.isDefined) &&
        perRx.findFirstMatchIn(q).isDefined) {
      require(!columns.exists(_.equalsIgnoreCase("rank")),
        "input already has a 'rank' column")
      val warnB = scala.collection.mutable.ArrayBuffer.empty[String]
      val (groupCols, groupWarnings) = perGroups()
      require(groupCols.nonEmpty,
        s"no resolvable grouping column after per/within each in: $query")
      val orderKeys = parseSortKeys(uniqueRx.replaceAllIn(lower, " "),
          resolve, warnB += _)
        .map { case (c, dir) => (c, dir.exists(_.startsWith("asc"))) }
      require(orderKeys.nonEmpty,
        s"grouped top-k/rank needs an order: add 'by <col> [asc|desc]' in: $query")
      val k = topPerM.map(_.group(1).toInt)
      val (preFilters, preDates) = preClauses()
      val rest = rankVerbRx.replaceAllIn(
        topKRx.replaceAllIn(perRx.replaceAllIn(stripPre(q), " "), " "), "$1")
      val post = compileWith(rest, columns :+ "rank", ascDefault)
      val describe = (s"topPerGroup=${k.map(_.toString).getOrElse("*")}" +
        s":per=${groupCols.mkString("|")}" +
        s":order=${orderKeys.map { case (c, a) => s"$c:${if (a) "asc" else "desc"}" }.mkString("|")}" +
        preDates.map(c => s";toTimestamp=$c").mkString +
        preFilters.map { case (c, op, v) => s";filter=$c$op$v" }.mkString +
        (if (post.describe.nonEmpty) ";" + post.describe else ""))
      return Compiled(describe, { df0 =>
        val dated = preDates.foldLeft(df0)((d, c) =>
          d.withColumn(c, try_to_timestamp(cref(c))))
        val filtered = preFilters.foldLeft(dated) { case (d, (c, op, v)) =>
          d.filter(comparison(cref(c), op, v))
        }
        val w = Window.partitionBy(groupCols.map(cref): _*)
          .orderBy(totalOrder(filtered, orderKeys): _*)
        val ranked = filtered.withColumn("rank", row_number().over(w))
        post.apply(k.map(kk => ranked.filter(col("rank") <= kk)).getOrElse(ranked))
      }, groupWarnings ++ warnB.toSeq ++ post.warnings)
    }

    // ---- parse clauses ----------------------------------------------------
    val topK = topKRx.findFirstMatchIn(lower).map(_.group(1).toInt)

    val uniqueBy = uniqueRx.findFirstMatchIn(lower).flatMap(m => resolve(m.group(1)))

    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]

    // the unique-clause's own "by" must not be mistaken for the sort clause.
    // Every phrase word excludes clause keywords (sortWord), so the capture
    // stops on its own before the next clause — a keyword the capture could
    // swallow silently kills the sort (review regression: "by price top 5"
    // used to limit unsorted rows).
    val sortSearch = uniqueRx.replaceAllIn(lower, " ")
    // top-level default is DESC ("top 5 by price" means highest-first);
    // a running-total remainder recompiles with ascDefault = true
    val sortKeys: Seq[(String, Boolean)] =
      parseSortKeys(sortSearch, resolve, warnings += _)
        .map { case (c, dir) => (c, dir.map(_.startsWith("asc")).getOrElse(ascDefault)) }

    // filler words between the verb and the first column ("show me the id")
    // are skipped so plain-English phrasing neither breaks the clause nor
    // surfaces spurious warnings
    val showCols = """(?i)\b(?:showing|show|select|return(?:ing)?)\s+(?:(?:me|us|the|all|only|just|columns?|of)\s+)*((?:[a-z0-9_\.]+)(?:\s*(?:,|and)\s*[a-z0-9_\.]+)*)""".r
      .findFirstMatchIn(lower).flatMap { m =>
        val toks = m.group(1).split("""\s*(?:,|\band\b)\s*""").toSeq
        val resolved = toks.map(t => t -> resolve(t))
        val hits = resolved.flatMap(_._2)
        // warn only when the WHOLE clause resolved nothing: NL filler
        // ("show me the n_name") routinely puts non-column words here, and
        // a single resolved column means the user's intent was understood
        if (hits.isEmpty) {
          warnings += s"projection '${m.group(1)}' resolved no columns"
          None
        } else Some(hits)
      }

    // run against the ORIGINAL query (with (?i) flags), not the lowered
    // copy: filter literals must keep their case ("where flag = R" compares
    // against "R", not "r")
    val filters = filterRx
      .findAllMatchIn(q).toSeq.flatMap { m =>
        resolve(m.group(1)) match {
          case Some(c) =>
            val (op, v) = filterOpValue(m)
            Some((c, op, v))
          case None =>
            warnings += s"filter column '${m.group(1)}' did not resolve"
            None
        }
      }

    val dateParse = dateRx
      .findAllMatchIn(lower).toSeq.flatMap { m =>
        val r = resolve(m.group(1))
        if (r.isEmpty) warnings += s"date-parse column '${m.group(1)}' did not resolve"
        r
      }

    // ---- assemble plan ----------------------------------------------------
    val fn: DataFrame => DataFrame = { df0 =>
      var df = df0
      dateParse.foreach { c =>
        // try_to_timestamp nulls on malformed input even under ANSI mode —
        // the pandas errors='coerce' analogue (example.ipynb generated code)
        df = df.withColumn(c, try_to_timestamp(cref(c)))
      }
      filters.foreach { case (c, op, v) =>
        df = df.filter(comparison(cref(c), op, v))
      }
      val ordered =
        if (sortKeys.nonEmpty) {
          val ord = totalOrder(df0, sortKeys)
          uniqueBy match {
            case Some(u) =>
              // drop_duplicates(subset=u, keep='first' after sort) — Spark's
              // dropDuplicates keeps an arbitrary row, so pin it with a window.
              val w = Window.partitionBy(cref(u)).orderBy(ord: _*)
              df.withColumn("__rn", row_number().over(w))
                .filter(col("__rn") === 1).drop("__rn")
                .orderBy(ord: _*)
            case None => df.orderBy(ord: _*)
          }
        } else {
          uniqueBy.map(u => df.dropDuplicates(u)).getOrElse(df)
        }
      val limited = topK.map(ordered.limit).getOrElse(ordered)
      showCols.map(cs => limited.select(cs.map(cref): _*)).getOrElse(limited)
    }

    topK.foreach(k => steps += s"limit=$k")
    sortKeys.foreach { case (c, asc) => steps += s"orderBy=$c:${if (asc) "asc" else "desc"}" }
    uniqueBy.foreach(c => steps += s"dedupKeepFirst=$c")
    showCols.foreach(cs => steps += s"select=${cs.mkString("|")}")
    filters.foreach { case (c, op, v) => steps += s"filter=$c$op$v" }
    dateParse.foreach(c => steps += s"toTimestamp=$c")

    Compiled(steps.mkString(";"), fn, warnings.toSeq)
  }

  /** Comparison predicate shared by the filter and pre-aggregation paths.
    * A value is numeric only if it actually parses ("2024-01-01" and
    * "1.2.3" pass a digits/./- character test but are strings). */
  private def comparison(column: Column, op: String, v: String): Column = {
    val value: Column = scala.util.Try(v.toDouble).toOption.map(lit(_)).getOrElse(lit(v))
    op match {
      case "=" => column === value
      case "!=" => column =!= value
      case ">" => column > value
      case "<" => column < value
      case ">=" => column >= value
      case "<=" => column <= value
      case "is null" => column.isNull
      case "is not null" => column.isNotNull
    }
  }

  case class CompiledJoin(describe: String, apply: (DataFrame, DataFrame) => DataFrame,
      warnings: Seq[String] = Nil)

  /** NL JOIN -> plan (reference intent: notsomagictable.py:15-18 declares
    * join_with_query, but the MagicTable method it forwards to does not
    * exist — the declared surface is implemented here). Grammar, on top of
    * [[compile]]'s clauses (which run against the JOINED frame):
    *
    *   [inner|left|right|full|outer|semi|anti] join [with <name>]
    *     [on <col> [= <rightCol>]]
    *
    * Without an `on` clause the key is inferred from common column names
    * (the C4 inference posture): key- or id-suffixed columns win, then the
    * first common column. semi/anti keep left columns only (Spark
    * left_semi/left_anti).
    */
  def compileJoin(query: String, leftCols: Seq[String], rightCols: Seq[String]): CompiledJoin = {
    val q = " " + query.trim + " "
    // a table NAME is only consumed after an explicit "with" — a bare
    // token after "join" is the next clause's keyword (where/showing/by/
    // top/on), which must survive for the post-join compile
    val typeRx =
      """(?i)\b(?:(inner|left|right|full|outer|semi|anti)(?:\s+outer)?\s+)?join(?:\s+with\s+[a-z0-9_\.]+)?""".r
    val tm = typeRx.findFirstMatchIn(q).getOrElse(
      throw new IllegalArgumentException(s"no join clause in: $query"))
    val joinType = Option(tm.group(1)).map(_.toLowerCase) match {
      case Some("semi") => "left_semi"
      case Some("anti") => "left_anti"
      case Some("outer") => "full"
      case Some(t) => t
      case None => "inner"
    }
    def res(cols: Seq[String], n: String): Option[String] = {
      val nn = n.trim
      cols.find(_.equalsIgnoreCase(nn))
        .orElse(cols.find(_.equalsIgnoreCase(nn.replace(' ', '_'))))
        .orElse(cols.find(c => c.toLowerCase.endsWith("_" + nn.toLowerCase)))
    }
    val onRx = """(?i)\bon\s+([a-z0-9_\.]+)(?:\s*=\s*([a-z0-9_\.]+))?""".r
    val onM = onRx.findFirstMatchIn(q)
    val (leftKey, rightKey) = onM match {
      case Some(m) =>
        val a = m.group(1)
        val b = Option(m.group(2))
        val lk = res(leftCols, a).getOrElse(
          throw new IllegalArgumentException(s"join key $a not in left columns"))
        val rk = res(rightCols, b.getOrElse(a)).getOrElse(
          throw new IllegalArgumentException(s"join key ${b.getOrElse(a)} not in right columns"))
        (lk, rk)
      case None =>
        val common = leftCols.filter(lc => rightCols.exists(_.equalsIgnoreCase(lc)))
        require(common.nonEmpty,
          s"no `on` clause and no common column between [${leftCols.mkString(",")}] and [${rightCols.mkString(",")}]")
        val pick = common.find { c =>
          val l = c.toLowerCase; l.endsWith("key") || l.endsWith("id")
        }.getOrElse(common.head)
        (pick, rightCols.find(_.equalsIgnoreCase(pick)).get)
    }
    // the remaining clauses compile against the joined schema
    val rest = onRx.replaceAllIn(typeRx.replaceAllIn(q, " "), " ")
    // non-key columns present on BOTH sides would be ambiguous to every
    // post-join clause — keep the left copy (pandas-suffix semantics are
    // not in the grammar; dropping the right duplicate is the predictable
    // choice and is documented in describe)
    val dupRight = rightCols.filter(rc =>
      !rc.equalsIgnoreCase(rightKey) && leftCols.exists(_.equalsIgnoreCase(rc)))
    val mergedCols =
      if (joinType.startsWith("left_")) leftCols // semi/anti: left side only
      else leftCols ++ rightCols.filterNot(rc =>
        rc.equalsIgnoreCase(rightKey) || dupRight.contains(rc))
    val post = compile(rest, mergedCols)

    val fn: (DataFrame, DataFrame) => DataFrame = { (l, r0) =>
      val outer = joinType == "right" || joinType == "full"
      val sameKey = leftKey.equalsIgnoreCase(rightKey)
      // inner/left/semi/anti: duplicate right columns add nothing — drop
      // pre-join. right/full: KEEP them and coalesce per column below, so
      // unmatched right rows keep their own values (key treated likewise).
      val r = if (outer) r0 else dupRight.foldLeft(r0)((d, c) => d.drop(d(c)))
      val joined =
        if (sameKey) l.join(r, Seq(leftKey), joinType)
        else l.join(r, l(leftKey) === r(rightKey), joinType)
      val out =
        if (joinType.startsWith("left_")) joined // semi/anti: left cols only
        else {
          val leftSide = leftCols.map { c =>
            if (outer && dupRight.exists(_.equalsIgnoreCase(c)))
              coalesce(l(c), r(c)).as(c)
            else if (c.equalsIgnoreCase(leftKey) && !sameKey && outer)
              coalesce(l(leftKey), r(rightKey)).as(leftKey)
            else if (c.equalsIgnoreCase(leftKey) && sameKey)
              col(s"`${c.replace("`", "``")}`") // using-join key, already coalesced
            else l(c)
          }
          val rightSide = r.columns.toSeq
            .filterNot(_.equalsIgnoreCase(rightKey))
            .filterNot(c => leftCols.exists(_.equalsIgnoreCase(c)))
            .map(c => r(c))
          joined.select(leftSide ++ rightSide: _*)
        }
      post.apply(out)
    }
    val describe = (s"join=$joinType:$leftKey=$rightKey" +
      (if (dupRight.nonEmpty) s";dropRightDups=${dupRight.mkString("|")}" else "") +
      (if (post.describe.nonEmpty) ";" + post.describe else ""))
    CompiledJoin(describe, fn, post.warnings)
  }
}
