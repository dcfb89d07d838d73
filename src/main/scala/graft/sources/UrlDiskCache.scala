package graft.sources

import java.nio.file.{Files, Path, Paths}
import graft.core.Jsons

/** THE per-URL response cache layout: one file `<md5(url)>.json` under a
  * cache dir. Single definition shared by the executor-side fetch path
  * (Chain.fetchResponses) and the driver-side TableGraph accessors — a
  * second copy of the key scheme would silently fork the cache the moment
  * either drifted. Executor-safe: plain java.nio, no Spark state. */
object UrlDiskCache {

  def path(dir: String, url: String): Path =
    Paths.get(dir, Jsons.md5Hex(url) + ".json")

  def get(dir: String, url: String): Option[String] = {
    val p = path(dir, url)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8")) else None
  }

  def put(dir: String, url: String, body: String): Unit = {
    val p = path(dir, url)
    Files.createDirectories(p.getParent)
    // write-to-temp + atomic move: concurrent fetchers of the same URL (a
    // chain fan-out across partitions) must never observe a half-written
    // body — a torn read would poison the cache for every future run
    val tmp = Files.createTempFile(p.getParent, ".url-", ".tmp")
    try {
      Files.write(tmp, body.getBytes("UTF-8"))
      Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }
}
