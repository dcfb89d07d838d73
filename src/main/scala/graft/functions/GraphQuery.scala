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

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length && i < b.length) { d += a(i).toDouble * b(i); i += 1 }
    d // embedder output is L2-normalized, so the dot IS the cosine
  }

  /** Rank every table in the graph by embedding similarity to the query. */
  def rankTables(spark: SparkSession, graph: TableGraph, query: String,
      embedder: Embedder = new FeatureHashEmbedder(64)): Seq[(TableNode, Double)] = {
    val qv = embedder.embed(query)
    graph.allNodes
      .map(n => n -> cosine(qv, embedder.embed(profile(spark, n))))
      .sortBy { case (n, s) => (-s, n.name) }
  }

  /** Query the graph in plain English: route to the best-matching table,
    * then compile and run the query against it. */
  def queryNl(spark: SparkSession, graph: TableGraph, query: String,
      embedder: Embedder = new FeatureHashEmbedder(64)): DataFrame = {
    val ranked = rankTables(spark, graph, query, embedder)
    require(ranked.nonEmpty, "the graph has no registered tables to query")
    val (best, score) = ranked.head
    require(score > 0.0,
      s"no table matches '$query' (best candidate ${best.name} scored 0)")
    val df = graph.getTable(spark, best.name).getOrElse(
      sys.error(s"table ${best.name} vanished from the graph"))
    NlCompiler.compile(query, df.columns.toSeq).apply(df)
  }
}
