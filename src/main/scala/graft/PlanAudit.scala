package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (q <- args.toSeq) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.split("\n").map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
