package graft.core

import org.apache.spark.sql.DataFrame
import graft.sources.Fetcher

/** C21: the reference's NotSoMagicTable (notsomagictable.py:6-50) is a
  * pandas.DataFrame subclass whose `__getattribute__` lazily forwards any
  * MagicTable method by wrapping itself into a temp-labeled MagicTable and
  * unwrapping the result back to a plain frame. (Its headline method,
  * join_with_query at notsomagictable.py:15-18, forwards to a MagicTable
  * method that does not exist in the reference — implemented for real here
  * via [[graft.functions.NlCompiler.compileJoin]].)
  *
  * The idiomatic Scala analogue of attribute-forwarding is an implicit
  * enrichment: `import NotSoMagicTable._` and every DataFrame gains the
  * MagicTable verbs, each call round-tripping through a temp-labeled
  * MagicTable exactly like the reference's `temp_label` wrapper. Results
  * come back as plain DataFrames (the "not so magic" contract — no lineage
  * is retained across calls, which is also the reference's behavior: each
  * call re-wraps from scratch).
  */
object NotSoMagicTable {

  implicit class RichDataFrame(private val df: DataFrame) extends AnyVal {

    // the temp label must distinguish FRAMES, or two different DataFrames
    // chained with the same URL template would share chainImpl's
    // name-keyed result cache and the second would get the first's rows.
    private def mt: MagicTable =
      MagicTable.fromDataFrame(df, NotSoMagicTable.planLabel(df))

    /** Per-row API fan-out (forwards to [[MagicTable.chain]]). */
    def chain(urlTemplate: String,
        fetcher: Fetcher = MagicTable.defaultFetcher): DataFrame =
      mt.chain(urlTemplate, fetcher).df

    /** NL transform (named transformNl: Dataset already has transform). */
    def transformNl(query: String): DataFrame = mt.transform(query).df

    /** NL join against another plain DataFrame. The right frame's label is
      * plan-hashed like the left's ([[mt]]): a fixed "temp_label_other"
      * would make transformation-cache keys collide across DIFFERENT right
      * frames joined with the same query, each overwriting the last. */
    def joinWithQuery(other: DataFrame, query: String): DataFrame =
      mt.joinWithQuery(MagicTable.fromDataFrame(other,
        NotSoMagicTable.planLabel(other)), query).df
  }

  /** Stable-yet-distinguishing label for a bare frame: md5 of the ANALYZED
    * plan's canonical form plus its semanticHash. Canonicalization erases
    * expression IDs, so an equivalent rebuilt frame re-derives the SAME
    * label (a raw plan toString would mint a fresh label per construction
    * and the caches would never hit); the canonical string pins structure
    * and file sources, while semanticHash folds in in-memory relation data.
    * Same-structure different-data local frames ride on the 32-bit hash
    * component — fine for temp labels, whose worst collision is a 1h-TTL
    * cache crossover between two in-memory test frames. */
  private[core] def planLabel(df: DataFrame): String = {
    val a = df.queryExecution.analyzed
    "temp_label_" + Jsons.md5Hex(a.canonicalized.toString + "#" + a.semanticHash()).take(12)
  }

  /** Wipe every cache level of a graph (reference notsomagictable.py:30-32,
    * whose MagicTable target does not exist there). */
  def clearAllData(graph: TableGraph = TableGraph.defaultGraph): Unit =
    graph.clearAllData()
}
