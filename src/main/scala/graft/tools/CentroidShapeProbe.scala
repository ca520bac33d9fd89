package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Measures the IVF assignment projection at PRODUCTION quantizer shapes
  * (r12 verdict #1): the literal greatest-of-structs path vs the native
  * `nearest_centroid` kernel, across k (cells) and dim, on the replica
  * corpora. Three costs per cell, because they fail differently:
  *
  *  - build: driver-side Column construction + analysis/optimization of
  *    the plan (the k·dim literal tree is walked by every optimizer rule);
  *  - exec: the assignment scan + a |k|-key count rollup, warm;
  *  - codegen: run with `spark.sql.codegen.fallback=false`, so an
  *    expression that falls out of codegen THROWS instead of silently
  *    interpreting (the embed_gram_matrix 17x cliff's failure mode);
  *    whole-stage codegen survival is read off the executed plan.
  *
  * dim > 64 corpora are synthesized in the scan by concatenating
  * circular shifts of the base 64-dim vector (the ReplicateCorpus
  * decorrelation trick along the dim axis) — centroids get the same
  * treatment, so the assignment is a genuine k x dim argmax.
  *
  * Run: sbt "runMain graft.tools.CentroidShapeProbe <dir> <k1,k2,..> <dim1,dim2,..>"
  * e.g.: sbt "runMain graft.tools.CentroidShapeProbe /tmp/graft-x100 16,256,1024 64,256"
  */
object CentroidShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-x10")
    val ks = if (args.length > 1) args(1).split(',').map(_.toInt).toSeq else Seq(16, 256)
    val dims = if (args.length > 2) args(2).split(',').map(_.toInt).toSeq else Seq(64, 256)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    // codegen failure must THROW, not silently interpret
    spark.conf.set("spark.sql.codegen.fallback", "false")

    def widened(dim: Int): DataFrame = {
      val base = graft.sources.Tables.embeddings(spark, dir).select(
        col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v0"))
      val tiles = dim / 64
      val parts = (0 until tiles).map { t =>
        if (t == 0) expr("v0")
        else expr(s"concat(slice(v0, ${t + 1}, ${64 - t}), slice(v0, 1, $t))")
      }
      base.select(col("vec_id"),
        (if (tiles == 1) parts.head else flatten(array(parts: _*))).as("v"))
    }

    for (dim <- dims; k <- ks) {
      val cents: Seq[Array[Double]] = widened(dim)
        .filter(col("vec_id") >= 100 && col("vec_id") < (100 + k))
        .orderBy("vec_id").collect()
        .map(_.getSeq[Double](1).toArray).toSeq
      require(cents.length == k, s"corpus too small for k=$k centroids")

      def run(label: String, bestOf: Seq[Array[Double]] => Column): Unit = {
        try {
          // a FRESH plan per pass: re-counting one DataFrame's RDD reuses
          // the first pass's shuffle files and skips the map stage that
          // holds the assignment — the cost being measured (ScaleProbe's
          // convention)
          def mkDf() = widened(dim).select(
            (-bestOf(cents).getField("ncid")).cast("long").as("cid"))
            .groupBy("cid").count()
          val t0 = System.nanoTime()
          val df0 = mkDf()
          df0.queryExecution.executedPlan // force analysis + planning
          val tBuild = (System.nanoTime() - t0) / 1e9
          df0.queryExecution.toRdd.count() // warm scan caches + JIT
          val df = mkDf()
          val t1 = System.nanoTime()
          val n = df.queryExecution.toRdd.count()
          val tExec = (System.nanoTime() - t1) / 1e9
          // AQE materializes stages as QueryStageExec leaves — recurse so
          // the WholeStageCodegen spans inside them are visible
          def planStr(p: org.apache.spark.sql.execution.SparkPlan): String = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              planStr(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              q.toString + "\n" + planStr(q.plan)
            case other =>
              other.toString + "\n" + other.children.map(planStr).mkString("\n")
          }
          // simple-mode treeString renders a WholeStageCodegenExec span as
          // "*(id)" prefixes on its children, not as a named node
          val ps = planStr(df.queryExecution.executedPlan)
          val wscg = ps.contains("WholeStageCodegen") || ps.contains("*(")
          println(f"CENTROIDPROBE dim=$dim%-4d k=$k%-5d $label%-8s build=${tBuild}%8.2fs exec=${tExec}%8.2fs cells=$n%-5d wscg=$wscg")
        } catch {
          case e: Throwable =>
            println(f"CENTROIDPROBE dim=$dim%-4d k=$k%-5d $label%-8s FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
        }
        spark.catalog.clearCache()
      }

      run("structs", graft.operators.Similarity.bestCentroidStructs)
      run("kernel", graft.operators.Similarity.bestCentroidKernel)
    }
    spark.stop()
  }
}
