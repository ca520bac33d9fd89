package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}
import graft.sources.Tables

/** r11 verdict #5: prove (or break) the single-row-group floor claim.
  *
  * StageTime's r11 finding: every driver-testdata parquet file is ONE row
  * group, and a Spark scan cannot split inside a row group, so every
  * fact-scan stage runs on one core no matter the split config — the
  * attributed constant behind the near-1s trio (`pipeline_qc`,
  * `ds_resample`, `q_sessionize`). This probe tests that attribution
  * directly: rewrite `events` — same rows, ONE file — with small parquet
  * row groups into a sibling dir (all other tables symlinked unchanged),
  * then time the trio on both dirs. If the constants drop when the scan
  * can split, the floor is a DATA-LAYOUT artifact that vanishes at scale
  * (100 TB files carry hundreds of row groups per file); if they don't,
  * the ratios need a plan fix, not a note. Results recorded in SCALING.md.
  *
  * Run: sbt "runMain graft.tools.RowGroupProbe [srcDir] [q1,q2,...]"
  */
object RowGroupProbe {
  private val AllTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = (if (args.length > 1) args(1)
      else "pipeline_qc,ds_resample,q_sessionize").split(',').toSeq
    val dst = "/tmp/graft-rowgroup-probe"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(16)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // stage the sibling dir: events rewritten as ONE file with ~256 KB row
    // groups (raw ts long preserved — Tables.events normalizes either
    // encoding), every other table symlinked so only the layout under test
    // changes
    Files.createDirectories(Paths.get(dst))
    spark.read.parquet(s"$src/events.parquet").coalesce(1)
      .write.mode("overwrite").option("parquet.block.size", 262144)
      .parquet(s"$dst/events.parquet")
    AllTables.filter(_ != "events").foreach { t =>
      val link = Paths.get(dst, s"$t.parquet")
      if (!Files.exists(link))
        Files.createSymbolicLink(link, Paths.get(src, s"$t.parquet"))
    }
    Tables.invalidate() // the rewritten dir must not serve stale relations

    // min-of-3 exec per (dir, query), QueryTime's split: executedPlan
    // excluded from exec so the number is scan+exchange work, not planning
    for (dir <- Seq(src, dst); name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).queryExecution.toRdd.count() // warm
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val qe = fn(spark, dir).queryExecution
        qe.executedPlan
        val t0 = System.nanoTime()
        qe.toRdd.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      val tag = if (dir == src) "1-rowgroup" else "multi-rowgroup"
      println(f"RGP $name%-16s $tag%-15s exec=$best%6.3fs")
    }
    spark.stop()
  }
}
