package graft.tools
import graft.{GraftSession, SparkEntry}
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.queryExecution.toRdd.count()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
