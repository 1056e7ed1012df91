package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query receives `sfDir` (e.g. /root/testdata/sf0.01) and reads
  * parquet lazily so Catalyst can push filters/pruning into the scan.
  * At 100 TB these would be partitioned/bucketed external tables; the
  * loader is the single seam where that changes.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    // default; read it as a long (ns since epoch) and convert with
    // eventTime(). Set here, not only in session builders, because the
    // driver may hand us its own session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events.ts (ns-since-epoch long under nanosAsLong) -> TimestampType
    * at microsecond precision, truncating like DuckDB's CAST(ts AS
    * TIMESTAMP). Oracle SQL counterpart: epoch_us(ts) for the long form.
    *
    * ns/1000 must be EXACT integer division: `floor(ts / 1000)` runs in
    * doubles and ns-since-epoch (~1.7e18) exceeds 2^53, so values
    * within ~128 ns of a microsecond boundary would mis-truncate
    * relative to DuckDB. Decimal division keeps it exact; decimal->long
    * cast truncates toward zero (positive epochs => floor).
    */
  def eventTime(tsNanos: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(
      (tsNanos.cast("decimal(25,0)") / 1000).cast("long"))

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Session factory used by tests / local mains. Verify/Bench build
    * their own (driver contract) — keep configs in sync with those.
    */
  def session(appName: String, cores: Int = 4): SparkSession = {
    val spark = SparkSession.builder()
      // local[N, 2]: allow one task retry, like a real cluster would —
      // required for the worker-failure semantics tests
      .master(s"local[$cores, 2]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
