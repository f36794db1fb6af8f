object QSmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    for (q <- args(0).split(",")) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      df.show(6, false)
      println(s"[qsmoke] $q rows=" + df.count())
      if (args.length > 2 && args(2) == "sql")
        println("ORACLE_SQL_BEGIN\n" + graft.SparkEntry.oracleSql(q) + "\nORACLE_SQL_END")
    }
    spark.stop()
  }
}
