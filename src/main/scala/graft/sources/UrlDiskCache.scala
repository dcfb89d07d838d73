package graft.sources

import org.apache.hadoop.conf.Configuration
import graft.core.{Fs, Jsons}

/** THE per-URL response cache layout: one file `<md5(url)>.json` under a
  * cache dir. Single definition shared by the executor-side fetch path
  * (Chain.fetchResponses) and the driver-side TableGraph accessors — a
  * second copy of the key scheme would silently fork the cache the moment
  * either drifted.
  *
  * All IO goes through the Hadoop FileSystem API ([[graft.core.Fs]]) so the
  * cache is CLUSTER-shared when the warehouse lives on HDFS/S3, not per-node:
  * executors pass the session's Hadoop conf (via [[graft.core.SerializableHadoopConf]])
  * and hit the same store the driver registered. No `java.nio.file` on this
  * path. Write atomicity (temp + rename, torn reads impossible) is preserved
  * by [[Fs.writeStringAtomic]]; concurrent writers of one URL race benignly —
  * first writer wins, the loser's temp is discarded.
  */
object UrlDiskCache {

  def path(dir: String, url: String): String =
    dir + "/" + Jsons.md5Hex(url) + ".json"

  def get(dir: String, url: String, conf: Configuration): Option[String] =
    Fs.readString(path(dir, url), conf)

  def put(dir: String, url: String, body: String, conf: Configuration): Unit =
    // overwrite=false: an existing entry for this URL is already the cached
    // truth; replacing it buys nothing and widens the race window.
    // BEST-EFFORT: this runs inside executor tasks right after a successful
    // fetch — a failed cache write (permissions, disk-full, store hiccup)
    // must degrade to a cache miss, never fail the task that already has
    // its data. NonFatal, not just IOException: object-store clients throw
    // RuntimeExceptions (SDK errors not wrapped in IOException) too.
    try Fs.writeStringAtomic(path(dir, url), body, conf, overwrite = false)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[url-cache] skipping cache write for $url: ${e.getMessage}")
    }

  // Driver-side convenience (TableGraph accessors): resolve the active
  // session's Hadoop conf so spark.hadoop.* credentials apply.
  def get(dir: String, url: String): Option[String] =
    get(dir, url, Fs.driverConf())

  def put(dir: String, url: String, body: String): Unit =
    put(dir, url, body, Fs.driverConf())
}
