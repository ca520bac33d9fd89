package graft.tools
import graft.GraftSession
object FlatProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.Selection.dsFlatline(spark, "/tmp/graft-sf1")
    df.explain("formatted")
  }
}
