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
  /** `events.ts` has shipped under two physical parquet types across
    * testdata generations: INT64 TIMESTAMP(NANOS) (rounds ≤6), which
    * Spark 4 rejects at schema inference unless
    * `spark.sql.legacy.parquet.nanosAsLong` reads the nanos as long —
    * the micros-precision payload then rebuilds losslessly via integer
    * division — and plain TIMESTAMP(MICROS) (round 7 regeneration),
    * which Spark reads directly as TIMESTAMP_NTZ. Dispatch on the
    * INFERRED type so either generation loads, and normalize both to
    * TimestampType: the session is pinned UTC, so the NTZ→LTZ cast is
    * the same instant, and every downstream comparison/window keeps
    * the exact semantics (and parquet INT96 output type) the oracle
    * gate has been green against. [[GraftSession]] sets the conf at
    * session build; the guarded set here covers sessions built
    * elsewhere (the driver's own smoke harness), and the conf changes
    * behavior ONLY for NANOS columns, which no current table has.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
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
