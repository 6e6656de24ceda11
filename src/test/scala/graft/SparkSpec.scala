package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // shared session, never stop per-suite

  /** True iff the tombstone table under `root/dirName` holds no data
    * files. Compaction deletes the entry-pinned tombstone FILES, not
    * the directory (concurrently appended tombstones must survive),
    * so "tombstones reclaimed" means no `.parquet` left — the dir and
    * a stray `_SUCCESS` may legitimately remain.
    */
  def tombstonesEmpty(root: String, dirName: String): Boolean =
    Option(new java.io.File(root, dirName).listFiles()).toSeq.flatten
      .forall(!_.getName.endsWith(".parquet"))
}

object SparkSpec {
  // through the library's real front door, so specs run under the same
  // confs (AQE, UTC, nanosAsLong, graft extensions) as production
  lazy val session: SparkSession = {
    val s = GraftSession.create("local[4]", "graft-test",
      uiEnabled = false)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
