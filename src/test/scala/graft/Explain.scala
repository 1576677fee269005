package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- Seq(
      "Q05" -> operators.Joins.q05 _,
      "Q11" -> operators.Joins.q11 _,
      "Q15" -> operators.Aggregates.q15 _,
      "Q35" -> operators.TextOps.q35 _,
      "Q43" -> operators.EventTime.q43 _)) {
      println(s"===== $name =====")
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      // count exchanges + print join/scan lines
      val lines = p.linesIterator.toSeq
      println("exchanges: " + lines.count(_.contains("Exchange")))
      lines.filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan parquet"))
        .take(20).foreach(l => println(l.take(160)))
    }
  }
}
