package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chat-transcript structure operators (beyond-reference, SURVEY.md §2.4):
  * the SFT/RLHF-era counterpart of the pre-training text battery. Fine-
  * tuning corpora arrive as role-tagged transcripts ("system:"/"user:"/
  * "assistant:" lines), and the structural defects that poison a tuning
  * run — two user turns in a row, a transcript that ends on the user,
  * empty assistant turns, untagged continuation lines — are exactly the
  * cheap-to-check invariants a 100 TB ingest should screen BEFORE
  * tokenization.
  *
  * Line format contract: turns are newline-separated; a turn line starts
  * with a role tag `system:` / `user:` / `assistant:` (case-insensitive,
  * optional spaces around the colon); any other non-empty line is an
  * UNPARSED line (continuation text in the wild — counted, never
  * silently merged). Empty lines drop.
  *
  * Shape: [[parseChatTurns]] explodes (its OUTPUT is turn rows); the
  * audit / token-split / render passes are pure PER-ROW projections over
  * the line array (higher-order functions on `split(text, '\n')`) — one
  * transcript is one row, so no explode, no window, ZERO shuffle, and
  * every one of them runs unchanged on an unbounded stream (stateless
  * projection, the Streams.scala composability contract). */
object Chat {

  private val roleRx = "^(?i)\\s*(system|user|assistant)\\s*:\\s*"

  /** Non-empty lines of the transcript, in order. */
  private def keptLines(textCol: String): Column =
    filter(split(col(s"`${textCol.replace("`", "``")}`"), "\n"),
      l => trim(l) =!= "")

  /** Lowercased role tag of one line, NULL for an unparsed line. */
  private def roleOf(l: Column): Column = {
    val r = regexp_extract(l, roleRx, 1)
    when(r === "", lit(null)).otherwise(lower(r))
  }

  /** The line with its role tag stripped (unparsed lines pass through). */
  private def contentOf(l: Column): Column =
    when(regexp_extract(l, roleRx, 1) === "", l)
      .otherwise(regexp_replace(l, roleRx, ""))

  /** One row per transcript line: (idCol, turn_idx int — 0-based over
    * the KEPT (non-empty) lines, role string lowercased or NULL for an
    * unparsed line, content string — the line with the role tag
    * stripped, n_chars int). Order within a transcript is the line
    * order (turn_idx is dense over kept lines).
    *
    * 100 TB shape: the line array is filtered to kept lines BEFORE
    * posexplode, so the explode ordinal IS the dense turn index — one
    * split + filter + posexplode per doc, a pure per-row projection with
    * ZERO shuffle (no window, no per-doc repartition; the first version
    * derived the dense index with row_number() over a per-doc window,
    * a full shuffle of every line row for a value the ordinal already
    * carries). PlanAuditSpec pins the no-Window/no-Exchange plan. */
  def parseChatTurns(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    df.filter(id.isNotNull && col(s"`$textCol`").isNotNull)
      .select(id, posexplode(keptLines(textCol)).as(Seq("__ti", "__line")))
      .select(id,
        col("__ti").cast("int").as("turn_idx"),
        roleOf(col("__line")).as("role"),
        contentOf(col("__line")).as("content"),
        length(contentOf(col("__line"))).cast("int").as("n_chars"))
  }

  /** Per-transcript structure audit. One row per doc: (idCol, n_turns,
    * n_user, n_assistant, n_system, n_unparsed, n_empty ints — role
    * turns with zero content chars, first_role, last_role strings —
    * NULL when the transcript has no role turns, alternation_ok,
    * ends_with_assistant booleans).
    *
    * `alternation_ok` is the strict tuning contract: at most ONE system
    * turn and only in first position; the first non-system role is
    * `user`; consecutive turns never repeat a role; system never
    * reappears mid-transcript. Transcripts with unparsed lines fail it
    * (an untagged line is a turn of unknown attribution). A transcript
    * with zero role turns reports alternation_ok = false, roles NULL;
    * a doc with no kept lines at all is PRESENT with all-zero counts
    * (screens never silently drop rows).
    *
    * 100 TB shape: a pure per-row projection — the role array and the
    * adjacent-pair violation scan are higher-order functions over the
    * line array (one transcript = one row), zero shuffle; `get()` is
    * the 0-based null-safe index so the i = 0 predecessor reads as
    * NULL, exactly the lag() semantics the first implementation had. */
  def chatAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val base = df.filter(id.isNotNull && col(s"`$textCol`").isNotNull)
      .withColumn("__lines", keptLines(textCol))
      .withColumn("__roles", transform(col("__lines"), l => roleOf(l)))
    val roles = col("__roles")
    val rolesNN = filter(roles, r => r.isNotNull)
    // a violation at turn i, given predecessor role p = roles[i-1]
    // (NULL at i = 0 and after an unparsed line — the lag() contract):
    //  - unparsed line anywhere
    //  - first turn must be system or user
    //  - system may not follow anything (only lead)
    //  - first non-system turn must be user (covers system->assistant)
    //  - two consecutive turns with the same role
    val viols = filter(transform(roles, (r, i) => {
      val p = get(roles, i - 1)
      r.isNull ||
        (p.isNull && r === "assistant") ||
        (p.isNotNull && r === "system") ||
        (p === "system" && r === "assistant") ||
        (p === r)
    }), v => v)
    base.select(
        id,
        size(col("__lines")).as("n_turns"),
        size(filter(roles, r => r === "user")).as("n_user"),
        size(filter(roles, r => r === "assistant")).as("n_assistant"),
        size(filter(roles, r => r === "system")).as("n_system"),
        size(filter(roles, r => r.isNull)).as("n_unparsed"),
        size(filter(col("__lines"),
          l => roleOf(l).isNotNull && length(contentOf(l)) === 0)).as("n_empty"),
        get(rolesNN, lit(0)).as("first_role"),
        get(rolesNN, size(rolesNN) - 1).as("last_role"),
        (size(viols) === 0 && size(rolesNN) > 0).as("alternation_ok"))
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
    * 100 TB shape: a pure per-row projection — three higher-order folds
    * over the line array, zero shuffle, stream-safe. */
  def chatTokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    def tokSum(cond: Column => Column): Column =
      aggregate(
        transform(keptLines(textCol), l =>
          when(cond(roleOf(l)),
            graft.functions.TextFunctions.tokenCount(contentOf(l)).cast("long"))
            .otherwise(0L)),
        lit(0L), (a, b) => a + b)
    df.filter(id.isNotNull && col(s"`$textCol`").isNotNull)
      .select(id,
        tokSum(r => r.isin("system", "user")).as("prompt_tokens"),
        tokSum(r => r === "assistant").as("response_tokens"),
        tokSum(r => r.isNull).as("unparsed_tokens"))
      .withColumn("response_ratio",
        when(col("prompt_tokens") + col("response_tokens") > 0L,
          round((col("response_tokens").cast("double") /
            (col("prompt_tokens") + col("response_tokens")).cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(25, 12)), 9)
            .cast("double")))
  }

  /** Preference-pair audit (DPO/RLHF data): per (chosen, rejected)
    * response pair, the structural signals preference-data curation
    * screens on — IDENTICAL pairs (a no-signal row that silently
    * shrinks the effective dataset), empty sides, and the length gap
    * (reward models notoriously learn "longer is better"; a corpus
    * where chosen is longer in 90% of pairs bakes that bias in before
    * training starts). One row per pair: (idCol, chosen_tokens,
    * rejected_tokens longs — whitespace tokens, the TextFunctions
    * contract, len_ratio double 9 dp — chosen/rejected tokens, NULL
    * when rejected has zero tokens, identical boolean — exact string
    * equality after trim, chosen_empty, rejected_empty booleans).
    * NULL sides read as empty.
    *
    * 100 TB shape: a pure per-row projection — zero shuffle,
    * stream-safe. */
  def preferencePairAudit(df: DataFrame, idCol: String,
      chosenCol: String, rejectedCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val ch = coalesce(col(s"`$chosenCol`"), lit(""))
    val rj = coalesce(col(s"`$rejectedCol`"), lit(""))
    val chT = graft.functions.TextFunctions.tokenCount(ch).cast("long")
    val rjT = graft.functions.TextFunctions.tokenCount(rj).cast("long")
    df.filter(id.isNotNull)
      .select(id,
        chT.as("chosen_tokens"),
        rjT.as("rejected_tokens"),
        (trim(ch) === trim(rj)).as("identical"),
        (chT === 0L).as("chosen_empty"),
        (rjT === 0L).as("rejected_empty"))
      .withColumn("len_ratio",
        when(col("rejected_tokens") > 0L,
          round((col("chosen_tokens").cast("double") /
            col("rejected_tokens").cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(25, 12)), 9)
            .cast("double")))
  }

  /** Corpus-level length-bias roll-up of [[preferencePairAudit]]: ONE
    * row — (n_pairs, n_identical, n_chosen_longer, n_rejected_longer,
    * n_ties longs, frac_chosen_longer double 9 dp — over non-identical
    * pairs, NULL when there are none, mean_len_ratio double 9 dp — the
    * decimal mean of the defined 9-dp ratios, NULL when none). A
    * healthy preference corpus sits near 0.5 frac_chosen_longer; a
    * skewed one is a length-bias warning BEFORE any reward model sees
    * it.
    *
    * 100 TB shape: one map-side-combinable scalar aggregation over the
    * per-pair projection. */
  def preferenceLengthBias(df: DataFrame, idCol: String,
      chosenCol: String, rejectedCol: String): DataFrame = {
    val a = preferencePairAudit(df, idCol, chosenCol, rejectedCol)
    val dec = org.apache.spark.sql.types.DecimalType(25, 9)
    a.agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("identical"), 1L).otherwise(0L)).as("n_identical"),
        sum(when(!col("identical") &&
          col("chosen_tokens") > col("rejected_tokens"), 1L).otherwise(0L))
          .as("n_chosen_longer"),
        sum(when(!col("identical") &&
          col("chosen_tokens") < col("rejected_tokens"), 1L).otherwise(0L))
          .as("n_rejected_longer"),
        sum(when(!col("identical") &&
          col("chosen_tokens") === col("rejected_tokens"), 1L).otherwise(0L))
          .as("n_ties"),
        sum(col("len_ratio").cast(dec)).as("__sr"),
        count(col("len_ratio")).as("__nr"))
      .withColumn("frac_chosen_longer",
        when(col("n_chosen_longer") + col("n_rejected_longer") + col("n_ties") > 0L,
          round((col("n_chosen_longer").cast("double") /
            (col("n_chosen_longer") + col("n_rejected_longer") + col("n_ties"))
              .cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(25, 12)), 9)
            .cast("double")))
      .withColumn("mean_len_ratio",
        when(col("__nr") > 0L,
          round((col("__sr").cast("double") / col("__nr").cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(25, 12)), 9)
            .cast("double")))
      .drop("__sr", "__nr")
  }

  /** Render transcripts to ONE training string per doc with explicit
    * special-token delimiters — the template step every SFT tokenizer
    * pipeline runs before packing: `<|role|>content<|end|>` per role
    * turn, in line order, no separator between turns. Unparsed lines
    * render as `<|unparsed|>content<|end|>` so nothing is silently
    * dropped and the defect stays visible downstream. Output: (idCol,
    * rendered string, n_rendered_turns int).
    *
    * 100 TB shape: a pure per-row projection (transform + concat over
    * the line array, order inherited from the array), zero shuffle,
    * stream-safe. */
  def renderTemplate(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(s"`$idCol`")
    val lines = keptLines(textCol)
    df.filter(id.isNotNull && col(s"`$textCol`").isNotNull)
      .select(id,
        concat_ws("", transform(lines, l =>
          concat(lit("<|"), coalesce(roleOf(l), lit("unparsed")), lit("|>"),
            contentOf(l), lit("<|end|>")))).as("rendered"),
        size(lines).cast("int").as("n_rendered_turns"))
  }
}
