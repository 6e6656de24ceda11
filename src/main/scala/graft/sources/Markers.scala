package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Tiny layout-marker files (`_GRAFT_*`): a few UTF-8 bytes of layout
  * metadata stamped next to a table's data so a later writer/reader can
  * verify it is using the layout the table was actually written with
  * (bucket counts, batch content fingerprints). One shared read/write
  * pair so every guard that depends on these markers has identical
  * I/O semantics (single-shot create-overwrite, full read, trim).
  */
object Markers {

  def write(fs: FileSystem, marker: Path, value: String): Unit = {
    val out = fs.create(marker, true)
    try out.write(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** None when the marker does not exist. */
  def read(fs: FileSystem, marker: Path): Option[String] =
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
}
