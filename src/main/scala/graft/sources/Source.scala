package graft.sources

import graft.core.{Jsons, JsonFlatten}

/** Source abstraction (reference: magictables/sources.py:15-39).
  * Identity contract: get_id = MD5 of the canonical (sorted-keys) JSON of
  * {type, identifier, params} (sources.py:32-39) — this is the cache key,
  * so it must be deterministic under param-key reordering.
  *
  * fetchRows returns flat row maps rendered as JSON lines; ingestion builds
  * a DataFrame via spark.read.json over them so schema inference matches
  * the reference's permissive pl.DataFrame(list_of_dicts) behavior.
  */
trait Source extends Serializable {
  def getType: String
  def getIdentifier: String
  def getParams: Map[String, Any]

  def getId: String = {
    val payload = Map(
      "type" -> getType,
      "identifier" -> getIdentifier,
      "params" -> getParams)
    Jsons.md5Hex(Jsons.canonical(payload))
  }

  /** Fetch and rectangularize; each element is one JSON-rendered flat row. */
  def fetchRows(fetcher: Fetcher): Seq[String]
}

/** In-memory rows (reference: sources.py:42-60). Identity = MD5 of the data. */
case class RawSource(rows: Seq[Map[String, Any]]) extends Source {
  override def getType = "raw"
  override def getIdentifier: String = Jsons.md5Hex(Jsons.canonical(rows))
  override def getParams: Map[String, Any] = Map.empty
  override def fetchRows(fetcher: Fetcher): Seq[String] =
    rows.flatMap(r => JsonFlatten.flattenValue(r)).map(Jsons.render)
}

/** Raw JSON payload (string form of RawSource — handy for fixtures). */
case class RawJsonSource(json: String) extends Source {
  override def getType = "raw"
  override def getIdentifier: String = Jsons.md5Hex(json)
  override def getParams: Map[String, Any] = Map.empty
  override def fetchRows(fetcher: Fetcher): Seq[String] =
    JsonFlatten.flattenToJsonLines(Jsons.parse(json))
}

/** JSON-over-HTTP GET (reference: sources.py:63-93). Non-2xx -> exception
  * (sources.py:82-84); body parsed as JSON then flattened one level.
  */
case class ApiSource(url: String, params: Map[String, Any] = Map.empty) extends Source {
  override def getType = "api"
  override def getIdentifier: String = url
  override def getParams: Map[String, Any] = params
  override def fetchRows(fetcher: Fetcher): Seq[String] = {
    val full =
      if (params.isEmpty) url
      else url + (if (url.contains("?")) "&" else "?") +
        params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
    fetcher.fetchRaw(full) match {
      case Right(body) => JsonFlatten.flattenToJsonLines(Jsons.parse(body))
      case Left(status) =>
        throw new RuntimeException(s"ApiSource fetch failed ($status): $full")
    }
  }
}

/** Web page source (reference: sources.py:96-119). Parity is the STUB the
  * reference actually ships: one row {"content": html}; table extraction
  * was never implemented there.
  */
case class WebSource(url: String) extends Source {
  override def getType = "web"
  override def getIdentifier: String = url
  override def getParams: Map[String, Any] = Map.empty
  override def fetchRows(fetcher: Fetcher): Seq[String] =
    fetcher.fetchRaw(url) match {
      case Right(body) => Seq(Jsons.render(Map("content" -> body)))
      case Left(status) =>
        throw new RuntimeException(s"WebSource fetch failed ($status): $url")
    }
}

/** PDF source (reference: sources.py:122-150): one row per page
  * {"page_content": text}. No PDF decoder ships in this environment, so the
  * offline contract accepts pre-extracted text: the fixture body is either
  * a JSON array of page strings or plain text with pages split on \f.
  */
case class PdfSource(url: String) extends Source {
  override def getType = "pdf"
  override def getIdentifier: String = url
  override def getParams: Map[String, Any] = Map.empty
  override def fetchRows(fetcher: Fetcher): Seq[String] = {
    val body = fetcher.fetchRaw(url) match {
      case Right(b) => b
      case Left(status) =>
        throw new RuntimeException(s"PdfSource fetch failed ($status): $url")
    }
    val pages: Seq[String] = Jsons.parseOpt(body) match {
      case Some(arr: Seq[_]) => arr.map(String.valueOf)
      case _ => body.split('\f').toSeq
    }
    pages.map(p => Jsons.render(Map("page_content" -> p)))
  }
}

/** LLM-generated synthetic data (reference: sources.py:153-183). The
  * offline default is a deterministic generator covering the two behaviors
  * the reference prompt's few-shot examples pin down (prompts.py:113-143):
  * paginated parameter grids ("pages 1..N") and date ranges. Doubles as the
  * pure lineage marker for transform outputs (magictable.py:182-184).
  */
case class GenerativeSource(query: String) extends Source {
  override def getType = "generative"
  override def getIdentifier: String = query
  override def getParams: Map[String, Any] = Map.empty

  private val PageRange = """(?i).*pages?\s+(\d+)\s*(?:to|-|\.\.|through)\s*(\d+).*""".r
  private val DateRange =
    """(?i).*from\s+(\d{4}-\d{2}-\d{2})\s+(?:to|through|until)\s+(\d{4}-\d{2}-\d{2}).*""".r

  /** Generated rows materialize on the DRIVER (they seed spark.read.json)
    * — cap the count so a runaway range in the NL query ("pages 1 to 2
    * billion") errors instead of OOMing the driver. */
  val MaxGeneratedRows = 1000000L

  override def fetchRows(fetcher: Fetcher): Seq[String] = query match {
    case PageRange(a, b) =>
      val (lo, hi) = (a.toLong, b.toLong)
      require(hi >= lo, s"page range $a..$b is inverted")
      // check the DIFFERENCE (non-negative, cannot overflow), not count
      // via +1, which wraps for hi = Long.MaxValue and bypasses the cap
      require(hi - lo < MaxGeneratedRows,
        s"page range $a..$b exceeds $MaxGeneratedRows driver-side rows")
      (lo to hi).map(p => Jsons.render(Map("page" -> p)))
    case DateRange(a, b) =>
      val start = java.time.LocalDate.parse(a)
      val end = java.time.LocalDate.parse(b)
      require(java.time.temporal.ChronoUnit.DAYS.between(start, end) < MaxGeneratedRows,
        s"date range $a..$b exceeds $MaxGeneratedRows driver-side rows")
      Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end))
        .map(d => Jsons.render(Map("date" -> d.toString))).toSeq
    case _ => Seq(Jsons.render(Map("query" -> query, "generated" -> true)))
  }
}
