package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Builds the N× replicated probe corpora behind SCALING.md's cost
  * curves, reproducibly (earlier rounds built them ad hoc).
  *
  * - `documents`: each copy offsets doc_id and SUFFIXES every token with
  *   the copy index — copies keep their internal near-dup structure
  *   without being near-dups of each other, so duplicate DENSITY stays
  *   the baseline's and expected pair growth under replication is ~N,
  *   not N² (the contract the dedup family's linearity claims are
  *   measured against; DedupProbe's doc).
  * - `embeddings`: each copy offsets vec_id and CIRCULARLY SHIFTS the
  *   vector by the copy index — decorrelates copies (no cos≈1 twins
  *   across copies) while preserving the component distribution, so
  *   cell-blocked operators see a genuinely larger corpus, not a
  *   duplicate explosion. Copy 0 is the original, so the deterministic
  *   seed-centroid rows (vec_id ∈ [100, 116)) exist exactly once.
  *
  * All other tables are symlinked from the source dir.
  *
  * Run: sbt "runMain graft.tools.ReplicateCorpus <n> [srcDir] [dstDir]"
  */
object ReplicateCorpus {
  private val AllTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
  private val IdOffset = 10000000L

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val dst = if (args.length > 2) args(2) else s"/tmp/graft-x$n"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(16)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(dst))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val copiesD = (0 until n).map { i =>
      if (i == 0) docs
      else docs.select(
        (col("doc_id") + lit(i * IdOffset)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1_" + i).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    copiesD.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val copiesE = (0 until n).map { i =>
      if (i == 0) emb
      else {
        // shift in [1, dim-1] for EVERY copy: a plain i % dim would make
        // copy `dim` (and every multiple) a zero-shift exact duplicate of
        // the originals — cos≈1 twins, the duplicate explosion the shift
        // exists to prevent (r12 review)
        val s = 1 + (i - 1) % (dim - 1)
        val shifted =
          concat(slice(col("embedding"), s + 1, dim - s),
            slice(col("embedding"), 1, s))
        emb.select((col("vec_id") + lit(i * IdOffset)).as("vec_id"),
          shifted.as("embedding"), col("label"))
      }
    }
    copiesE.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    AllTables.filterNot(Set("documents", "embeddings")).foreach { t =>
      val link = Paths.get(dst, s"$t.parquet")
      // re-create, never skip: a surviving link from an earlier run with a
      // DIFFERENT srcDir would silently mix two corpora (r12 review)
      Files.deleteIfExists(link)
      Files.createSymbolicLink(link, Paths.get(src, s"$t.parquet"))
    }
    println(s"REPLICATED x$n -> $dst")
    spark.stop()
  }
}
