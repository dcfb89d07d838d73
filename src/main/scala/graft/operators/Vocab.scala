package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary construction and token-id encoding (beyond-reference,
  * SURVEY.md §2.4) — the step that turns a curated text corpus into the
  * integer sequences a trainer consumes.
  *
  * 100 TB shape: token counting is ONE map-side-combinable aggregation
  * shuffled on the token; the top-`maxSize` cut is TakeOrderedAndProject
  * (each partition contributes at most maxSize rows to the driver-side
  * merge — never a global sort of all distinct tokens); only the final
  * id-assignment window runs over a single partition, and that frame is
  * bounded by `maxSize` (a vocab-sized constant, not corpus-sized).
  * Encoding broadcasts the vocab and never shuffles the corpus — the one
  * aggregation regroups the token stream by document, which any
  * tokenizer must do.
  */
object Vocab {

  /** Top-`maxSize` whitespace tokens (lowercased) by corpus frequency;
    * ties break lexicographically ascending. Output: (token, token_id,
    * n) with token_id 0-based in (n desc, token asc) order — the most
    * frequent token is id 0. `minCount` prunes the long tail before the
    * cut. */
  def buildVocab(docs: DataFrame, textCol: String,
      maxSize: Int, minCount: Long = 1L): DataFrame = {
    require(maxSize >= 1, s"maxSize must be >= 1, got $maxSize")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val counts = graft.functions.TextFunctions.termStream(docs, Nil, textCol)
      .select(col("__term").as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      // TakeOrderedAndProject: the distributed top-N, not a global sort
      .orderBy(col("n").desc, col("token"))
      .limit(maxSize)
    // id assignment: an unpartitioned window over AT MOST maxSize rows
    counts.withColumn("token_id",
      row_number().over(Window.orderBy(col("n").desc, col("token"))) - lit(1).cast("int"))
      .select(col("token"), col("token_id"), col("n"))
  }

  /** Encode each document as its token-id sequence under `vocab` (a
    * [[buildVocab]] frame, broadcast). Out-of-vocabulary tokens become
    * `oovId`. Output: (idCol, token_ids array<int>, n_tokens, n_oov). */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, oovId: Int = -1): DataFrame = {
    val id = col(s"`$idCol`")
    // positional variant of TextFunctions.termStream (same lowercase/
    // split/empty-drop contract; posexplode because encoding needs the
    // original token order back)
    val toks = docs
      .select(id, posexplode(split(lower(coalesce(col(s"`$textCol`"), lit(""))), "\\s+"))
        .as(Seq("__pos", "__tok")))
      .filter(col("__tok") =!= "")
    toks
      .join(broadcast(vocab.select(col("token").as("__tok"), col("token_id"))),
        Seq("__tok"), "left")
      .withColumn("__id", coalesce(col("token_id"), lit(oovId)))
      .groupBy(id)
      .agg(
        transform(array_sort(collect_list(struct(col("__pos"), col("__id")))),
          x => x.getField("__id")).as("token_ids"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"))
  }
}
