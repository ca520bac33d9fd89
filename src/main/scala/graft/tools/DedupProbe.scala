package graft.tools

import graft.GraftSession
import graft.operators.Dedup

/** Scale linearity probe for the dedup family (SURVEY §5 / SCALING.md).
  *
  * Times the shared LSH pipeline (paid by the first query to touch it),
  * the verification reuse, and the components propagation on one or more
  * document directories, and prints the candidate/verified/component pair
  * counts — the quantities that must stay linear in true-duplicate pairs
  * (NOT quadratic in corpus size) for the 100 TB story to hold.
  *
  * Run: sbt "runMain graft.tools.DedupProbe dir1 dir2"
  * (dirs only need documents.parquet; the 10× probe dir is a /tmp copy
  * with every copy's tokens suffixed by the copy index, so copies keep
  * their internal near-dup structure without being near-dups of each
  * other — the expected pair growth is ~10×, not 45×.)
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    for (dir <- dirs) {
      Dedup.releaseCaches() // each dir pays its own pipeline
      val (cand, tPipe) = timed(Dedup.dedupMinhashLsh(spark, dir).count())
      val (ver, tVer) = timed(Dedup.dedupNgramJaccard(spark, dir).count())
      val (comp, tComp) = timed(
        Dedup.dedupComponents(spark, dir)
          .filter("canonical_id != doc_id").count())
      println(f"PROBE dedup $dir%-28s cand=$cand%-7d verified=$ver%-7d " +
        f"non_canonical_docs=$comp%-7d pipeline=$tPipe%.2fs verify_reuse=$tVer%.2fs components=$tComp%.2fs")
    }
    Dedup.releaseCaches()
    spark.stop()
  }
}
