package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{TableGraph, TableNode}

/** NL querying over the WHOLE data graph (reference README.md:250-277 — the
  * "Unified Data Graph and Natural Language Querying" feature the reference
  * marks In Progress; its generate_embeddings, utils.py:179-242, is dead
  * code with no caller precisely because this consumer was never built).
  *
  * The declared mechanism, implemented offline:
  *  1. every registered table gets a PROFILE (name, column names split on
  *     underscores, source types/identifiers) embedded with the pluggable
  *     [[Embedder]] (offline default: deterministic feature hashing);
  *  2. the plain-English query embeds the same way; cosine picks the table
  *     the query is about;
  *  3. the query then compiles against that table's schema through the
  *     deterministic [[NlCompiler]] grammar and runs distributed.
  *
  * Everything is driver-side ONLY over graph METADATA (node list + parquet
  * footers — bounded by the number of registered tables, never row data);
  * the returned plan executes on the cluster.
  */
object GraphQuery {

  /** Text profile of a node: table name + schema tokens + source lineage.
    * Column names contribute their underscore fragments too ("o_totalprice"
    * -> "o", "totalprice") so NL words match TPC-H-style prefixed columns. */
  def profile(spark: SparkSession, node: TableNode): String = {
    val cols = spark.read.parquet(node.path).schema.fieldNames.toSeq
    val fragments = cols.flatMap(c => c.split("_").filter(_.nonEmpty))
    val sources = node.sourceInfo.flatMap(m =>
      Seq(m.get("type"), m.get("identifier")).flatten.map(String.valueOf))
    (Seq(node.name) ++ cols ++ fragments ++ sources).mkString(" ")
  }

  /** True cosine — normalizes both sides (the [[Embedder]] trait does not
    * promise unit vectors; an online client's raw vectors would otherwise
    * rank tables by profile magnitude, not relevance). Dimensions must
    * agree: silently truncating a mismatch would compare different spaces. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length,
      s"embedding dims differ: ${a.length} vs ${b.length} (mixed embedders?)")
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
  }

  // profiles depend only on (table, registration time): memoize so a query
  // against an N-table graph does not pay N parquet-footer reads every call.
  // Keyed by PATH, not name: the map is JVM-global, and two graphs holding a
  // same-named table created at the same instant (easy with the injectable
  // fixed clock) must not serve each other's stale profile — the warehouse
  // path is unique per graph.
  private val profileCache =
    new java.util.concurrent.ConcurrentHashMap[(String, java.time.Instant), String]()

  /** Rank every table in the graph by embedding similarity to the query.
    * A node whose parquet payload has gone missing is skipped (with a
    * stderr note) rather than failing queries about healthy tables. */
  def rankTables(spark: SparkSession, graph: TableGraph, query: String,
      embedder: Embedder = new FeatureHashEmbedder(64)): Seq[(TableNode, Double)] = {
    val qv = embedder.embed(query)
    graph.allNodes.flatMap { n =>
      scala.util.Try(
        profileCache.computeIfAbsent((n.path, n.createdAt), _ => profile(spark, n))
      ) match {
        case scala.util.Success(p) => Some(n -> cosine(qv, embedder.embed(p)))
        case scala.util.Failure(e) =>
          System.err.println(s"[graph-query] skipping unreadable table ${n.name}: ${e.getMessage}")
          None
      }
    }.sortBy { case (n, s) => (-s, n.name) }
  }

  /** Query the graph in plain English: route to the best-matching table,
    * then compile and run the query against it. Refuses to run when NO
    * clause of the query resolved against the chosen table's schema —
    * with feature hashing some token almost always collides into a
    * nonzero score, and silently returning every row of a vaguely-related
    * table is worse than an error. */
  def queryNl(spark: SparkSession, graph: TableGraph, query: String,
      embedder: Embedder = new FeatureHashEmbedder(64)): DataFrame = {
    val ranked = rankTables(spark, graph, query, embedder)
    require(ranked.nonEmpty, "the graph has no registered (readable) tables to query")
    val (best, score) = ranked.head
    require(score > 0.0,
      s"no table matches '$query' (best candidate ${best.name} scored 0)")
    val df = graph.getTable(spark, best.name).getOrElse(
      sys.error(s"table ${best.name} vanished from the graph"))
    // natural phrasings mention the routed table in prose ("top 2 orders by
    // total price") and the table word then lands inside a clause capture,
    // fails to resolve, and strict mode would hard-error. Compile the query
    // as written first; only if clauses were dropped, retry with the routed
    // table's name tokens (±plural) stripped and keep the retry when IT
    // resolves cleanly — queries that never mention the table are untouched.
    val first = NlCompiler.compile(query, df.columns.toSeq)
    // a clause is "accounted for" when it either compiled (a describe step)
    // or was explicitly warned about — the count must never DROP across the
    // stripped retry, or stripping could silently delete a clause whose
    // column tokens coincide with the table name ("top 3 by total sales"
    // on table total_sales must keep erroring, not return unsorted rows)
    def clauseCount(c: NlCompiler.Compiled): Int =
      (if (c.describe.isEmpty) 0 else c.describe.split(";").length) + c.warnings.length
    val compiled =
      if (first.warnings.isEmpty) first
      else {
        val nameToks = best.name.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
          .flatMap(t => Seq(t, t.stripSuffix("s"), t + "s")).toSet
        val stripped = query.split("\\s+")
          .filterNot(w => nameToks.contains(w.toLowerCase.replaceAll("[^a-z0-9]", "")))
          .mkString(" ")
        val second = NlCompiler.compile(stripped, df.columns.toSeq)
        if (second.warnings.isEmpty && second.describe.nonEmpty &&
            clauseCount(second) >= clauseCount(first)) second
        else first
      }
    require(compiled.describe.nonEmpty,
      s"query '$query' routed to table ${best.name} but no clause resolved " +
        s"against its columns [${df.columns.mkString(", ")}] — refusing to " +
        "return the unfiltered table")
    // strict mode: a PARTIALLY-resolved query (typo'd filter column, say)
    // would silently widen the result — error instead
    require(compiled.warnings.isEmpty,
      s"query '$query' routed to table ${best.name} but some clauses were " +
        s"dropped: ${compiled.warnings.mkString("; ")}")
    compiled.apply(df)
  }
}
