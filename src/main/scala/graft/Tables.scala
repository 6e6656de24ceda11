package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md /
  * FIXTURES.md). Each table is a single parquet file under the
  * scale-factor directory passed to every query by the driver.
  *
  * Scale posture: at 100 TB these would be partitioned/bucketed
  * directories, not single files; all call sites go through here so the
  * layout can change in one place. Reads are plain `spark.read.parquet`
  * so Catalyst's predicate pushdown + column pruning reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      // the generic dispatch must route through the same loaders as
      // the named accessors — a caller iterating Tables.names would
      // otherwise get the single-split frames the fanned() repartition
      // exists to fix
      case "documents" => documents(spark, dir)
      case "embeddings" => embeddings(spark, dir)
      case _ => spark.read.parquet(s"$dir/$name.parquet")
    }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is physically parquet INT64 TIMESTAMP(NANOS), which
    * Spark 4 rejects at schema inference (PARQUET_TYPE_ILLEGAL). The
    * `spark.sql.legacy.parquet.nanosAsLong` conf reads the nanos as
    * long; the testdata carries only microsecond precision inside the
    * nano field, so rebuilding a proper TimestampType column via
    * integer division is lossless. [[GraftSession]] sets the conf at
    * session build; for sessions built elsewhere (the driver's own
    * smoke harness) we set it only if it isn't already true — a
    * guarded fallback, not an unconditional per-call flip, and the
    * conf changes behavior ONLY for NANOS columns, which no other
    * table in this corpus has.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  /** documents/embeddings arrive as ONE parquet file each, i.e. one
    * input split — every map-side ML pipeline (shingling, hashing,
    * per-pair dot products) would run on a single core. Repartition to
    * the session's parallelism right after the scan; on a real multi-
    * file/bucketed layout this exchange disappears.
    */
  private def fanned(s: SparkSession, d: String, name: String): DataFrame =
    s.read.parquet(s"$d/$name.parquet")
      .repartition(s.sparkContext.defaultParallelism)
  def documents(s: SparkSession, d: String): DataFrame = fanned(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = fanned(s, d, "embeddings")
}
