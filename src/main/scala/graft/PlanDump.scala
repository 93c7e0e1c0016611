package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (n <- args) {
      val p = SparkEntry.queries(n)(s, sf).queryExecution.executedPlan.toString
      println(s"===== $n")
      println(p.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") || l.contains("Window") || l.contains("HashAggregate")).map(_.trim.replaceAll("\\(\\d+\\)","").take(110)).mkString("\n"))
      PinScope.drain()
    }
    s.stop()
  }
}
