package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.{GraftSession, SparkEntry}

/** Per-STAGE attribution for named queries — the instrument behind
  * SCALING.md's "where does the second go" rows (r9 task 6 / r11 task 6:
  * the weak-set constants need stage evidence, not guesses).
  *   sbt "runMain graft.tools.StageTime <sfDir> q1 q2 ..."
  * For each query it runs the exec phase once (executedPlan → toRdd.count,
  * Bench's split) with a listener capturing every completed stage's wall
  * time, executor task time, shuffle bytes, and spill — then prints the
  * stages sorted by task time. Stage wall times overlap (the scheduler
  * runs independent stages concurrently), so `sum(task)` vs `wall` also
  * shows how parallel the plan ran.
  */
object StageTime {
  private case class StageRow(id: Int, name: String, wallMs: Long,
      taskMs: Long, tasks: Int, shufWriteMb: Double, shufReadMb: Double,
      spillMb: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the session (codegen, file index, parquet footers)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val rows = ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        val wall = (for { s <- i.submissionTime; c <- i.completionTime }
          yield c - s).getOrElse(0L)
        rows.synchronized {
          rows += StageRow(i.stageId, i.name.takeWhile(_ != '\n'), wall,
            m.executorRunTime, i.numTasks,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6)
        }
      }
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // pass 1 un-listened: JIT + AQE warmup so the measured pass is the
      // steady-state plan, same as Bench's min-of-passes intent
      fn(spark, sfDir).queryExecution.toRdd.count()
      rows.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wallS = (System.nanoTime() - t0) / 1e9
      // listenerBus is private[spark]; a short sleep drains the async bus
      // (stage-completed events are posted synchronously with job end at
      // local scale — this is belt-and-braces for the last stage)
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"ST $name wall=$wallS%.3f stages=${rows.size} taskSum=${rows.map(_.taskMs).sum / 1e3}%.3f")
      rows.sortBy(-_.taskMs).take(8).foreach { r =>
        println(f"ST   stage=${r.id}%4d task=${r.taskMs / 1e3}%7.3f wall=${r.wallMs / 1e3}%7.3f n=${r.tasks}%3d " +
          f"shW=${r.shufWriteMb}%8.2fMB shR=${r.shufReadMb}%8.2fMB spill=${r.spillMb}%6.1fMB ${r.name}")
      }
    }
    spark.stop()
  }
}
