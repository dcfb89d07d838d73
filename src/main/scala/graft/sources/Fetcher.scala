package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.util.Random

/** Transport abstraction for everything the reference fetches over HTTPS
  * (API pages, web pages, PDFs, chain fan-out URLs). The build/test
  * environment is zero-egress, so the default implementation is
  * file-backed; an HTTP implementation can be plugged in where egress
  * exists. Implementations MUST be Serializable — chain ships the fetcher
  * to executors inside a mapPartitions closure (the reference instead loops
  * rows on the driver, magictable.py:250-266 — the #1 thing not to copy).
  */
trait Fetcher extends Serializable {

  /** Fetch one URL; Left(status) on failure, Right(body) on success. */
  def fetchRaw(url: String): Either[Int, String]

  /** Retry policy of the reference (magictable.py:317-347): max 5 attempts,
    * backoff 2^attempt seconds + jitter in [0,1)s, 429 honored like any
    * retryable failure; after final failure returns None — the row keeps
    * all-null api_* columns (magictable.py:340,389).
    * Jitter is seeded per-URL so tests are deterministic; sleeps can be
    * disabled for tests via `maxSleepMs = 0`.
    */
  def fetchWithRetry(url: String, maxRetries: Int = 5, maxSleepMs: Long = 30000L): Option[String] = {
    val rng = new Random(url.hashCode.toLong)
    var attempt = 0
    while (attempt < maxRetries) {
      fetchRaw(url) match {
        case Right(body) => return Some(body)
        case Left(_) =>
          attempt += 1
          if (attempt < maxRetries && maxSleepMs > 0) {
            val delayMs = math.min(maxSleepMs,
              (math.pow(2, attempt) * 1000L + rng.nextInt(1000)).toLong)
            Thread.sleep(delayMs)
          }
      }
    }
    None
  }
}

/** Offline fetcher: resolves a URL to a fixture file under `root`.
  * Mapping: strip the scheme, replace every non [A-Za-z0-9._-] char with
  * '_', append ".json" if no extension. Missing fixture -> Left(404).
  */
class FileFetcher(rootDir: String) extends Fetcher {
  override def fetchRaw(url: String): Either[Int, String] = {
    val p = FileFetcher.resolve(rootDir, url)
    if (Files.exists(p)) Right(new String(Files.readAllBytes(p), "UTF-8"))
    else Left(404)
  }
}

object FileFetcher {
  def resolve(rootDir: String, url: String): Path = {
    val noScheme = url.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val safe = noScheme.map(c => if (c.isLetterOrDigit || "._-".contains(c)) c else '_')
    val named = if (safe.contains('.') && safe.split('.').last.length <= 5) safe else s"$safe.json"
    Paths.get(rootDir, named)
  }

  /** Write a fixture for `url` (test/gate helper). Temp + atomic move: gate
    * fixtures are seeded by whichever JVM runs first while others may
    * already be fetching — a torn read would feed null api_* rows into a
    * correctness compare. */
  def writeFixture(rootDir: String, url: String, body: String): Path = {
    val p = resolve(rootDir, url)
    Files.createDirectories(p.getParent)
    val tmp = Files.createTempFile(p.getParent, "." + p.getFileName.toString, ".tmp")
    try {
      Files.write(tmp, body.getBytes("UTF-8"))
      Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
    p
  }
}

/** In-memory fetcher for unit tests: url -> body, with an optional set of
  * URLs that always fail (exercises the retry-exhausted -> all-null path).
  */
class MapFetcher(entries: Map[String, String], alwaysFail: Set[String] = Set.empty)
    extends Fetcher {
  override def fetchRaw(url: String): Either[Int, String] =
    if (alwaysFail.contains(url)) Left(500)
    else entries.get(url).toRight(404)
}
