package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // shared session, never stop per-suite
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
