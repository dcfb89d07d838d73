package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Chat-transcript structure operators (beyond-reference, SURVEY.md §2.4):
  * the SFT/RLHF-era counterpart of the pre-training text battery. Fine-
  * tuning corpora arrive as role-tagged transcripts ("system:"/"user:"/
  * "assistant:" lines), and the structural defects that poison a tuning
  * run — two user turns in a row, a transcript that ends on the user,
  * empty assistant turns, untagged continuation lines — are exactly the
  * cheap-to-check invariants a 100 TB ingest should screen BEFORE
  * tokenization. Everything here is line arithmetic: one split/explode
  * per doc plus doc-keyed windows (partitions are transcript-sized by
  * construction), so the pass is engine-portable and oracle-checked.
  *
  * Line format contract: turns are newline-separated; a turn line starts
  * with a role tag `system:` / `user:` / `assistant:` (case-insensitive,
  * optional spaces around the colon); any other non-empty line is an
  * UNPARSED line (continuation text in the wild — counted, never
  * silently merged). Empty lines drop.
  */
object Chat {

  private val roleRx = "^(?i)\\s*(system|user|assistant)\\s*:\\s*"

  /** One row per transcript line: (idCol, turn_idx int — 0-based over
    * the KEPT (non-empty) lines, role string lowercased or NULL for an
    * unparsed line, content string — the line with the role tag
    * stripped, n_chars int). Order within a transcript is the line
    * order (turn_idx is dense over kept lines).
    *
    * 100 TB shape: one split + posexplode per doc, a per-doc window for
    * the dense index — transcript-bounded partitions, no corpus-wide
    * state. */
  def parseChatTurns(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val lines = df
      .filter(id.isNotNull && col(s"`$textCol`").isNotNull)
      .select(id, posexplode(split(col(s"`$textCol`"), "\n")).as(Seq("__ln", "__line")))
      .filter(trim(col("__line")) =!= "")
    val w = Window.partitionBy(id).orderBy(col("__ln"))
    lines
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .withColumn("role",
        when(regexp_extract(col("__line"), roleRx, 1) === "", lit(null))
          .otherwise(lower(regexp_extract(col("__line"), roleRx, 1))))
      .withColumn("content",
        when(col("role").isNull, col("__line"))
          .otherwise(regexp_replace(col("__line"), roleRx, "")))
      .withColumn("n_chars", length(col("content")).cast("int"))
      .select(id, col("turn_idx"), col("role"), col("content"), col("n_chars"))
  }

  /** Per-transcript structure audit over [[parseChatTurns]]'s contract.
    * One row per doc: (idCol, n_turns, n_user, n_assistant, n_system,
    * n_unparsed, n_empty ints — role turns with zero content chars,
    * first_role, last_role strings — NULL when the transcript has no
    * role turns, alternation_ok, ends_with_assistant booleans).
    *
    * `alternation_ok` is the strict tuning contract: at most ONE system
    * turn and only in first position; the first non-system role is
    * `user`; consecutive turns never repeat a role; system never
    * reappears mid-transcript. Transcripts with unparsed lines fail it
    * (an untagged line is a turn of unknown attribution). A transcript
    * with zero role turns reports alternation_ok = false, roles NULL.
    *
    * 100 TB shape: the parse explode, one doc-keyed lag window, one
    * hash aggregation to a row per doc. */
  def chatAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val turns = parseChatTurns(df, idCol, textCol)
    val w = Window.partitionBy(id).orderBy(col("turn_idx"))
    val flagged = turns
      .withColumn("__prev", lag(col("role"), 1).over(w))
      // a violation at THIS turn, given the previous one:
      //  - unparsed line anywhere
      //  - first turn must be system or user
      //  - system may not follow anything (only lead runs of system)
      //  - first non-system turn must be user (covers system->assistant)
      //  - two consecutive turns with the same role
      .withColumn("__viol",
        col("role").isNull ||
          (col("__prev").isNull && col("role") === "assistant") ||
          (col("__prev").isNotNull && col("role") === "system") ||
          (col("__prev") === "system" && col("role") === "assistant") ||
          (col("__prev") === col("role")))
    flagged.groupBy(id)
      .agg(
        count(lit(1)).cast("int").as("n_turns"),
        sum(when(col("role") === "user", 1).otherwise(0)).cast("int").as("n_user"),
        sum(when(col("role") === "assistant", 1).otherwise(0)).cast("int")
          .as("n_assistant"),
        sum(when(col("role") === "system", 1).otherwise(0)).cast("int")
          .as("n_system"),
        sum(when(col("role").isNull, 1).otherwise(0)).cast("int").as("n_unparsed"),
        sum(when(col("role").isNotNull && col("n_chars") === 0, 1).otherwise(0))
          .cast("int").as("n_empty"),
        min(when(col("role").isNotNull,
          struct(col("turn_idx"), col("role")))).getField("role").as("first_role"),
        max(when(col("role").isNotNull,
          struct(col("turn_idx"), col("role")))).getField("role").as("last_role"),
        (sum(when(col("__viol"), 1).otherwise(0)) === 0 &&
          sum(when(col("role").isNotNull, 1).otherwise(0)) > 0)
          .as("alternation_ok"))
      .withColumn("ends_with_assistant",
        coalesce(col("last_role") === "assistant", lit(false)))
  }

  /** Per-transcript token budget split by side: prompt tokens (system +
    * user turns) vs response tokens (assistant turns) — the ratio every
    * SFT mix tracks (loss usually masks the prompt side, so the
    * RESPONSE tokens are what a token budget actually buys; a corpus
    * whose transcripts are 95% prompt is mostly dead weight). Unparsed
    * lines count separately, never silently into either side. Tokens
    * are whitespace tokens of the tag-stripped content (the
    * TextFunctions.tokens contract). One row per doc: (idCol,
    * prompt_tokens, response_tokens, unparsed_tokens longs,
    * response_ratio double 9 dp — response/(prompt+response), NULL when
    * both are zero).
    *
    * 100 TB shape: the parse explode + one hash aggregation — no
    * windows, map-side combinable. */
  def chatTokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val nTok = graft.functions.TextFunctions.tokenCount(col("content")).cast("long")
    parseChatTurns(df, idCol, textCol)
      .withColumn("__t", nTok)
      .groupBy(id)
      .agg(
        sum(when(col("role").isin("system", "user"), col("__t")).otherwise(0L))
          .as("prompt_tokens"),
        sum(when(col("role") === "assistant", col("__t")).otherwise(0L))
          .as("response_tokens"),
        sum(when(col("role").isNull, col("__t")).otherwise(0L))
          .as("unparsed_tokens"))
      .withColumn("response_ratio",
        when(col("prompt_tokens") + col("response_tokens") > 0L,
          round((col("response_tokens").cast("double") /
            (col("prompt_tokens") + col("response_tokens")).cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(25, 12)), 9)
            .cast("double")))
  }

  /** Render parsed transcripts back to ONE training string per doc with
    * explicit special-token delimiters — the template step every SFT
    * tokenizer pipeline runs before packing:
    * `<|role|>content<|end|>` per role turn, in turn order, no
    * separator between turns. Unparsed lines render as
    * `<|unparsed|>content<|end|>` so nothing is silently dropped and
    * the defect stays visible downstream. Output: (idCol, rendered
    * string, n_rendered_turns int).
    *
    * 100 TB shape: the parse explode + one ORDER-pinned string
    * aggregation per doc (array_sort on the (turn_idx, piece) struct →
    * concat — deterministic regardless of partial-aggregation order). */
  def renderTemplate(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    parseChatTurns(df, idCol, textCol)
      .withColumn("__piece",
        concat(lit("<|"), coalesce(col("role"), lit("unparsed")), lit("|>"),
          col("content"), lit("<|end|>")))
      .groupBy(id)
      .agg(
        concat_ws("", array_sort(collect_list(struct(col("turn_idx"), col("__piece"))))
          .getField("__piece")).as("rendered"),
        count(lit(1)).cast("int").as("n_rendered_turns"))
  }
}
