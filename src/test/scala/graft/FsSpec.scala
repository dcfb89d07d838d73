package graft

import graft.core.Fs
import org.apache.hadoop.conf.Configuration

/** Crash-safety contract of Fs.replace (core/Fs.scala): the destination
  * payload must survive every failure point — the old delete-then-rename
  * could lose the table's parquet while the checkpointed catalog still
  * listed it. */
class FsSpec extends SparkSpecBase {

  private val conf = new Configuration()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_fs").toString

  private def write(path: String, body: String): Unit =
    Fs.writeStringAtomic(path, body, conf)

  test("replace swaps payload and leaves no aside copy behind") {
    val dir = tmpDir()
    write(s"$dir/src", "new")
    write(s"$dir/dst", "old")
    Fs.replace(s"$dir/src", s"$dir/dst", conf)
    assert(Fs.readString(s"$dir/dst", conf) === Some("new"))
    assert(!new java.io.File(dir).list().exists(_.startsWith(".dst.old-")),
      "the aside copy must be deleted after a successful swap")
  }

  test("failed replace restores the old destination instead of losing it") {
    val dir = tmpDir()
    write(s"$dir/dst", "old")
    // src does not exist -> the into-place rename fails AFTER the old
    // payload moved aside; the old payload must come back
    intercept[java.io.IOException] {
      Fs.replace(s"$dir/missing_src", s"$dir/dst", conf)
    }
    assert(Fs.readString(s"$dir/dst", conf) === Some("old"),
      "a failed replace must never lose the existing destination")
  }

  test("replace reclaims aside copies leaked by an earlier crash") {
    val dir = tmpDir()
    write(s"$dir/dst", "old")
    write(s"$dir/.dst.old-crash001", "leaked") // crash-after-rename leftover
    write(s"$dir/src", "new")
    Fs.replace(s"$dir/src", s"$dir/dst", conf)
    assert(Fs.readString(s"$dir/dst", conf) === Some("new"))
    assert(!new java.io.File(dir).list().exists(_.startsWith(".dst.old-")),
      "stale aside copies for this destination must be reclaimed")
  }
}
