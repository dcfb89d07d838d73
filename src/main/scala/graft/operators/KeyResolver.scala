package graft.operators

/** Placeholder -> column matcher for chain URL templates (reference C4,
  * magictable.py:393-447 — there an LLM picks the columns from {dtype,
  * 5 sample values}; here a deterministic matcher covers the same contract,
  * with the LLM pluggable behind graft.functions.LlmClient).
  *
  * Contract carried over:
  *  - explicit sourceKey/targetKey override wins (magictable.py:240-248);
  *  - unmatched placeholders pass through literally as "{p}"
  *    (magictable.py:434-437);
  *  - zero matches overall -> error (magictable.py:442-446).
  *
  * Matching order per placeholder: exact name -> case/snake-insensitive ->
  * singular/plural stem -> suffix match (placeholder "id" matches the only
  * column ending in "_id" or named "id").
  */
object KeyResolver {

  def placeholders(template: String): Seq[String] =
    """\{([^{}]+)\}""".r.findAllMatchIn(template).map(_.group(1)).toSeq

  private def norm(s: String): String = s.toLowerCase.replace("_", "")

  def resolve(
      template: String,
      columns: Seq[String],
      sourceKey: Option[String] = None,
      targetKey: Option[String] = None): Map[String, String] = {
    val phs = placeholders(template)
    (sourceKey, targetKey) match {
      case (Some(sk), Some(tk)) =>
        // an explicit override WINS — and an invalid one must fail loudly,
        // not silently fall back to heuristics that may bind a different
        // column and fetch wrong URLs
        require(columns.contains(sk),
          s"explicit sourceKey '$sk' is not a column (have: ${columns.mkString(", ")})")
        require(phs.contains(tk),
          s"explicit targetKey '$tk' is not a placeholder of template $template")
        Map(tk -> sk)
      case (Some(_), None) | (None, Some(_)) =>
        throw new IllegalArgumentException(
          "sourceKey and targetKey must be provided together (one without the other is ambiguous)")
      case _ =>
        val mapping = phs.flatMap { p =>
          val exact = columns.find(_ == p)
          val insens = columns.find(c => norm(c) == norm(p))
          val stem = columns.find(c =>
            norm(c) == norm(p) + "s" || norm(c) + "s" == norm(p))
          val suffix = {
            val hits = columns.filter(c => norm(c).endsWith(norm(p)))
            if (hits.size == 1) hits.headOption else None
          }
          exact.orElse(insens).orElse(stem).orElse(suffix).map(p -> _)
        }.toMap
        if (phs.nonEmpty && mapping.isEmpty)
          throw new IllegalArgumentException(
            s"No columns match placeholders ${phs.mkString("{", ", ", "}")} of template $template")
        mapping
    }
  }
}
