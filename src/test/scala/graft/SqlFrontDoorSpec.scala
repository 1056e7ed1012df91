package graft

import org.apache.spark.sql.functions._

/** The spark.sql front door: registered temp views + ANSI SQL must
  * produce exactly what the DataFrame plans produce, and the native
  * expressions are callable from SQL (Column-API self-registration;
  * GraftExtensions covers sessions built with the extension hook).
  */
class SqlFrontDoorSpec extends SparkSpec {
  import spark.implicits._

  test("spark.sql over registered views == the DataFrame q1_agg plan") {
    Tables.registerViews(spark, sf0001)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .as[(String, String, Double, Long)].collect().toSeq
    val df = SparkEntry.queries("q1_agg")(spark, sf0001)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .as[(String, String, Double, Long)].collect().toSeq
    assert(sql == df)
  }

  test("events time plane is schema-adaptive through SQL too") {
    Tables.registerViews(spark, sf0001)
    // the view carries whatever encoding the lake has; a daily rollup
    // through SQL must match the ev_daily DataFrame query
    val ev = Tables.events(spark, sf0001)
    ev.select(Tables.eventTime(ev).as("ts_utc"), col("event_type"), col("value"))
      .createOrReplaceTempView("events_utc")
    val sql = spark.sql(
      """SELECT to_date(ts_utc) AS day, event_type, count(*) AS n
        |FROM events_utc GROUP BY day, event_type
        |ORDER BY day, event_type""".stripMargin)
      .as[(java.sql.Date, String, Long)].collect().toSeq
    val df = SparkEntry.queries("ev_daily")(spark, sf0001)
      .select("day", "event_type", "n")
      .as[(java.sql.Date, String, Long)].collect().toSeq
    assert(sql == df)
  }

  test("native expressions callable from SQL via the Column-API registration") {
    // touching the Column API once registers the function for SQL
    graft.functions.SimHashFp.simhashFp(spark, split(lit("a b"), " "))
    graft.functions.HammingDistance.hamming(spark, lit("00"), lit("01"))
    // fingerprints are character strings ('0'/'1' bytes)
    val r = spark.sql(
      "SELECT hamming('1010', '1001') AS d, " +
        "simhash_fp(split('spark spark window', ' ')) AS fp")
      .collect().head
    assert(r.getAs[Int]("d") == 2)
    assert(r.getAs[Any]("fp") != null)
  }
}
