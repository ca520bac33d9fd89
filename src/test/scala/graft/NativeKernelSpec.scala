package graft

import org.apache.spark.sql.functions._

/** Adversarial-input equivalence for the native fingerprint expressions.
  *
  * The synthetic corpus is single-spaced ASCII, so the oracle alone cannot
  * distinguish "replicates `split(trim(text), "\\s+")` exactly" from
  * "close enough on clean text". These inputs can: leading/trailing
  * whitespace of every kind (Spark's `trim` strips ONLY spaces — a leading
  * tab must produce the empty first token `split` emits), multi-char
  * whitespace runs, empty and sub-3-word strings (must be filtered/NULL in
  * both formulations), duplicate shingles, non-ASCII text (md5 over UTF-8
  * bytes), and a literal NULL.
  */
class NativeKernelSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq[(Long, String)](
      (0L, ""),
      (1L, " "),
      (2L, "a"),
      (3L, "a b"),
      (4L, "a b c"),
      (5L, " a  b\tc "),
      (6L, "a\nb c d"),
      (7L, "\ta b c"),
      (8L, "a  b   c  d"),
      (9L, "héllo wörld ünïcode test"),
      (10L, "a b c a b c a b c"),
      (11L, "x\t\ny  z\r\nw"),
      (12L, "trailing newline a b c\n"),
      (13L, (1 to 40).map(i => s"w${i % 7}").mkString(" ")))
      .toDF("doc_id", "text")
      .union(Seq((14L, null.asInstanceOf[String])).toDF("doc_id", "text"))
  }

  test("shingle_set equals explode+distinct on adversarial whitespace/unicode") {
    val native = docs.select(col("doc_id"), expr("shingle_set(text)").as("ss"))
      .filter(col("ss").isNotNull).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    val composable = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("s"))
      .distinct().collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[String]("s")).toSet }
    // identical doc membership (<3 words and NULL filtered the same way)
    assert(native.keySet === composable.keySet)
    assert(native.keySet === Set(4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 12L, 13L))
    composable.foreach { case (id, s) => assert(native(id).toSet === s, s"doc $id") }
    // duplicate shingles collapse (doc 10 repeats "a b c" three times)
    assert(native(10L).length === native(10L).distinct.length)
  }

  test("gram_dup_stats equals the explode+count formulation on adversarial input") {
    // the kernel that carries text_dup_ngram_frac: (n_grams, dup_occ,
    // dup_distinct) over consecutive 5-token windows, gram identity =
    // concat_ws(' ', slice(w, i, 5)); docs under 5 tokens (and NULL) are
    // NULL in the kernel and filtered in the reference
    val native = docs.select(col("doc_id"), expr("gram_dup_stats(text)").as("gd"))
      .filter(col("gd").isNotNull).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    val composable = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 4), i -> concat_ws(' ', slice(w, i, 5)))")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_grams"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_occ"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("dup_distinct"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Seq(r.getAs[Long]("n_grams"), r.getAs[Long]("dup_occ"), r.getAs[Long]("dup_distinct")))
      .toMap
    assert(native.keySet === composable.keySet)
    composable.foreach { case (id, s) => assert(native(id) === s, s"doc $id") }
    // doc 10 ("a b c a b c a b c", 9 tokens): 5 grams, "a b c a b" twice
    // and "b c a b c" twice -> dup_occ 4, dup_distinct 2
    assert(native(10L) === Seq(5L, 4L, 2L))
    // doc 13 (w1..w0 mod 7, 40 tokens): every 5-gram repeats with period 7
    assert(native(13L).head === 36L && native(13L)(1) === 36L)
  }

  test("term_counts equals explode+groupBy term frequencies on adversarial input") {
    val native = docs.select(col("doc_id"), explode(expr("term_counts(text)")).as("e"))
      .select(col("doc_id"), col("e.t").as("t"), col("e.c").as("c"))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.map(r => r.getAs[String]("t") -> r.getAs[Long]("c")).toMap }
    val composable = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.map(r => r.getAs[String]("t") -> r.getAs[Long]("c")).toMap }
    // identical doc membership (NULL text drops in both) and identical
    // (term -> count) tables, incl. the empty token of all-whitespace docs
    assert(native.keySet === composable.keySet)
    composable.foreach { case (id, m) => assert(native(id) === m, s"doc $id") }
    // doc 10: three distinct terms, each three times; doc 1 (" "): the
    // single empty token
    assert(native(10L) === Map("a" -> 3L, "b" -> 3L, "c" -> 3L))
    assert(native(1L) === Map("" -> 1L))
  }

  test("bigram_counts equals the transform-pair explode+groupBy on adversarial input") {
    val native = docs.select(col("doc_id"), explode(expr("bigram_counts(text)")).as("b"))
      .select(col("doc_id"), col("b.wp").as("wp"), col("b.w").as("w"), col("b.c").as("c"))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getAs[String]("wp"), r.getAs[String]("w")) ->
          r.getAs[Long]("c")).toMap }
    val composable = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> " +
          "struct(element_at(ws, i) AS wp, element_at(ws, i + 1) AS w))")).as("b"))
      .groupBy(col("doc_id"), col("b.wp").as("wp"), col("b.w").as("w"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getAs[String]("wp"), r.getAs[String]("w")) ->
          r.getAs[Long]("c")).toMap }
    // identical doc membership: NULL text is NULL in the kernel (explode
    // drops it) and filtered in the reference; < 2 tokens -> empty array
    // in the kernel (explode drops) and size filter in the reference
    assert(native.keySet === composable.keySet)
    composable.foreach { case (id, m) => assert(native(id) === m, s"doc $id") }
    // doc 10 ("a b c a b c a b c"): pair (a,b) x3, (b,c) x3, (c,a) x2
    assert(native(10L) === Map(("a", "b") -> 3L, ("b", "c") -> 3L, ("c", "a") -> 2L))
    // doc 1 (" "): single empty token -> no bigrams -> absent entirely
    assert(!native.contains(1L))
  }

  test("text_quality's plan evaluates the gate_stats kernel exactly once") {
    // the three signal columns read elements of ONE projected gs column;
    // CollapseProject must not inline the (expensive, thrice-referenced)
    // kernel back into three instances, and nothing may rely on runtime
    // subexpression elimination to undo it (r13 ADVICE)
    val plan = graft.operators.TextAnalysis
      .textQuality(spark, sf).queryExecution.optimizedPlan.toString
    val n = "gate_stats\\(".r.findAllIn(plan).length
    assert(n === 1, s"expected one gate_stats instance in the plan, got $n:\n$plan")
  }

  test("minhash_sig equals the explode+16-min formulation on adversarial input") {
    val native = docs.select(col("doc_id"), expr("minhash_sig(text)").as("sig"))
      .filter(col("sig").isNotNull).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    val sh = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("s"))
    val hashed = sh.select(
      col("doc_id") +: (0 until 16).map(k =>
        substring(md5(concat(lit(s"${k / 4}|"), col("s"))), (k % 4) * 8 + 1, 8).as(s"h$k")): _*)
    val expected = hashed.groupBy("doc_id")
      .agg(min(col("h0")).as("m0"), (1 until 16).map(k => min(col(s"h$k")).as(s"m$k")): _*)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (0 until 16).map(k => r.getAs[String](s"m$k")))
      .toMap
    assert(native.keySet === expected.keySet)
    expected.foreach { case (id, sig) => assert(native(id) === sig, s"doc $id") }
  }

  test("simhash64 equals the weighted-sum formulation on adversarial input") {
    val native = docs.select(col("doc_id"), expr("simhash64(text)").as("ks"))
      .filter(col("ks").isNotNull).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Int](1)).toMap
    val tok = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val chunkedTok = tok.select(col("doc_id") :: col("c") ::
      (0 until 4).map(j =>
        conv(substring(md5(col("t")), j * 4 + 1, 4), 16, 10).cast("int").as(s"c$j")).toList: _*)
    val sums = chunkedTok.groupBy("doc_id")
      .agg(sum(col("c") * (shiftright(col("c0"), 15).bitwiseAND(lit(1)) * 2 - 1)).as("s0"),
        (1 until 64).map { b =>
          val (j, r) = (b / 16, b % 16)
          sum(col("c") * (shiftright(col(s"c$j"), 15 - r).bitwiseAND(lit(1)) * 2 - 1)).as(s"s$b")
        }: _*)
    val expected = sums.select(col("doc_id") +: (0 until 4).map { j =>
      (0 until 16).map(r =>
        when(col(s"s${16 * j + r}") > 0, lit(1 << (15 - r))).otherwise(lit(0)))
        .reduce(_ + _).cast("int").as(s"k$j")
    }: _*).collect()
      .map(r => r.getAs[Long]("doc_id") -> (0 until 4).map(j => r.getAs[Int](s"k$j"))).toMap
    // NULL text yields NULL fingerprint natively and no row composably
    assert(native.keySet === expected.keySet)
    expected.foreach { case (id, ks) => assert(native(id) === ks, s"doc $id") }
  }

  test("top_ngram_counts equals the explode+groupBy+max formulation on adversarial input") {
    val native = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("top_ngram_counts(text)").as("tc")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    val composable = graft.operators.TextAnalysis
      .topNgramComposable(docs.filter(col("text").isNotNull)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Seq(r.getAs[Long]("top_bigram_n"), r.getAs[Long]("top_trigram_n"))).toMap
    assert(native.keySet === composable.keySet)
    composable.foreach { case (id, c) => assert(native(id) === c, s"doc $id") }
    // sanity anchors: doc 10 repeats "a b c" 3 times → "a b" ×3, "a b c" ×3
    assert(native(10L) === Seq(3L, 3L))
    // doc 13: 40 words from a 7-word alphabet → some bigram repeats
    assert(native(13L).head >= 2L)
    // sub-n docs report 0, not null/absent
    assert(native(2L) === Seq(0L, 0L))
    assert(native(3L) === Seq(1L, 0L))
  }

  test("phash_blocks equals the aggregate(sequence) hex-digit formulation") {
    val blockSqls = (0 until 8).map { i =>
      s"""aggregate(sequence((($i * hl) div 8) + 1, ((${i + 1} * hl) div 8)), 0L,
         |(acc, p) -> acc + instr('0123456789abcdef', substring(hexs, CAST(p AS INT), 1)) - 1) AS b$i""".stripMargin
    }
    val composable = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), lower(hex(expr("encode(text, 'UTF-8')"))).as("hexs"))
      .filter(length(col("hexs")) >= 8)
      .withColumn("hl", length(col("hexs")).cast("long"))
      .selectExpr(("doc_id" +: blockSqls): _*).collect()
      .map(r => r.getAs[Long]("doc_id") -> (0 until 8).map(i => r.getAs[Long](s"b$i"))).toMap
    val native = docs.select(col("doc_id"), expr("phash_blocks(text)").as("bs"))
      .filter(col("bs").isNotNull).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    // same survivors (≥ 4 bytes, non-null) — unicode docs included: the
    // kernel walks UTF-8 BYTES, exactly like hex(encode(text, 'UTF-8'))
    assert(native.keySet === composable.keySet)
    composable.foreach { case (id, c) => assert(native(id) === c, s"doc $id") }
  }

  test("top_token_count equals the array_distinct+filter formulation on adversarial input") {
    val composable = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"),
        expr("aggregate(transform(array_distinct(w), t -> size(filter(w, x -> x = t))), 0, (a, x) -> greatest(a, x))")
          .cast("long").as("topn")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("topn")).toMap
    val native = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("top_token_count(text)").as("topn")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("topn")).toMap
    assert(native.keySet === composable.keySet)
    composable.foreach { case (id, c) => assert(native(id) === c, s"doc $id") }
    // anchors: blank text counts one empty token; doc 10 repeats a/b/c 3×
    assert(native(0L) === 1L)
    assert(native(10L) === 3L)
  }

  test("winnow_stats equals the md5-gram + sliding-array_min formulation on adversarial input") {
    val native = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("winnow_stats(text)").as("st")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    // the composable formulation the kernel's Scaladoc names: k=4 grams as
    // md5(concat_ws(' ', 4 tokens)), w=8 sliding lexicographic min via
    // array_min over slices, fingerprints = distinct window minima
    val composable = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"),
        when(size(col("w")) >= 4,
          expr("transform(sequence(0, size(w)-4), i -> md5(concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3])))"))
          .otherwise(typedLit(Array.empty[String])).as("g"))
      .select(col("doc_id"), size(col("g")).cast("long").as("n_grams"),
        when(size(col("g")) >= 8,
          expr("transform(sequence(1, size(g)-7), j -> array_min(slice(g, j, 8)))"))
          .otherwise(typedLit(Array.empty[String])).as("mins"))
      .select(col("doc_id"), col("n_grams"),
        size(col("mins")).cast("long").as("n_windows"),
        size(array_distinct(col("mins"))).cast("long").as("n_fp"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Seq(r.getAs[Long]("n_grams"), r.getAs[Long]("n_windows"), r.getAs[Long]("n_fp"))).toMap
    assert(native.keySet === composable.keySet)
    composable.foreach { case (id, s) => assert(native(id) === s, s"doc $id") }
    // anchors: the 40-token doc has 37 grams, 30 windows, and repeats
    // (w1..w7 cycle) force fp < windows; short docs hit the 0-branches
    assert(native(13L)(0) === 37L && native(13L)(1) === 30L)
    assert(native(13L)(2) < native(13L)(1))
    assert(native(4L) === Seq(0L, 0L, 0L)) // 3 tokens < k
    assert(native(8L) === Seq(1L, 0L, 0L)) // 4 tokens: 1 gram < w
  }

  test("window_md5_set equals the array_distinct(transform(unhex(md5))) formulation on adversarial input") {
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    val native = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("window_md5_set(text)").as("s"))
      .filter(col("s").isNotNull).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Array[Byte]](1).map(hex)).toMap
    val composable = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 16)
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(1, size(w)-15), i -> unhex(md5(concat_ws(' ', slice(w, i, 16))))))").as("s"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Array[Byte]](1).map(hex)).toMap
    // identical doc membership: <16 tokens → NULL in the kernel, filtered
    // in the composable path (only the 40-token doc qualifies here)
    assert(native.keySet === composable.keySet)
    assert(native.keySet === Set(13L))
    // identical digests in identical (first-occurrence) order
    composable.foreach { case (id, s) => assert(native(id) === s, s"doc $id") }
  }

  test("window_md5_idx equals the indexed transform(unhex(md5)) formulation on adversarial input") {
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    val native = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("window_md5_idx(text)").as("xs"))
      .filter(col("xs").isNotNull)
      .select(col("doc_id"), explode(col("xs")).as("x"))
      .select(col("doc_id"), col("x.idx").as("idx"), col("x.g").as("g"))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.map(r => r.getAs[Long]("idx") -> hex(r.getAs[Array[Byte]]("g"))).sortBy(_._1) }
    val composable = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 16)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 15), i -> " +
          "struct(CAST(i AS BIGINT) AS idx, unhex(md5(concat_ws(' ', slice(w, i, 16)))) AS g))")).as("x"))
      .select(col("doc_id"), col("x.idx").as("idx"), col("x.g").as("g"))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.map(r => r.getAs[Long]("idx") -> hex(r.getAs[Array[Byte]]("g"))).sortBy(_._1) }
    // identical doc membership (<16 tokens → NULL/filtered) and identical
    // per-position digests INCLUDING duplicate windows (doc 13 repeats
    // its 7-token cycle, so windows repeat with period 7 — the set kernel
    // collapses them, this one must not)
    assert(native.keySet === composable.keySet)
    assert(native.keySet === Set(13L))
    composable.foreach { case (id, s) => assert(native(id) === s, s"doc $id") }
    assert(native(13L).length === 25) // 40 tokens -> 25 positions, dups kept
  }

  test("shingle_set tokenization matches split(trim) on 300 random whitespace-adversarial strings") {
    import spark.implicits._
    // seeded random corpus over an alphabet heavy in the characters that
    // distinguish the tokenizer contract: every \s class member, runs,
    // NON-\s unicode spaces (U+00A0 must NOT split in either engine),
    // and multi-byte letters — breadth the 15 fixed docs can't give
    val alphabet = "ab \t\n\r é語 "
    val rnd = new scala.util.Random(42)
    val corpus = (0 until 300).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val docs = corpus.toDF("doc_id", "text")
    val native = docs.select(col("doc_id"), expr("shingle_set(text)").as("ss"))
      .filter(col("ss").isNotNull).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toSet).toMap
    val composable = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2])))").as("ss"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toSet).toMap
    assert(native.keySet === composable.keySet)
    composable.foreach { case (id, s) => assert(native(id) === s, s"doc $id") }
    assert(native.nonEmpty, "random corpus produced no >=3-token docs — alphabet drifted")
  }

  test("pq_encode equals the least-of-structs composable formulation on real embeddings") {
    import graft.operators.Similarity
    val e = graft.sources.Tables.embeddings(spark, sf).select(
      col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cb = Similarity.pqCodebooks(Similarity.seedCentroids(spark, sf))
    val cbArg = array(cb.map(sub =>
      array(sub.map(w => array(w.toSeq.map(lit): _*)): _*)): _*)
    val native = e.select(col("vec_id"),
      call_function("pq_encode", col("v"), cbArg).as("code")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    val composable = e.select(col("vec_id") +:
      (0 until 8).map(s => Similarity.pqCode(cb(s), s).as(s"c$s")): _*).collect()
      .map(r => r.getAs[Long]("vec_id") -> (0 until 8).map(i => r.getAs[Int](s"c$i"))).toMap
    assert(native.keySet === composable.keySet)
    composable.foreach { case (id, c) => assert(native(id) === c, s"vec $id") }
    // every code addresses a real codeword
    native.values.foreach(codes => codes.foreach(c => assert(c >= 0 && c < 16)))
  }

  test("dot_i64 equals the aggregate(zip_with) fold incl. null and length-mismatch cases") {
    import spark.implicits._
    val rows = Seq[(Long, Seq[java.lang.Long], Seq[java.lang.Long])](
      (0L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (1L, Seq(-7L, 0L, 127L), Seq(127L, -127L, 2L)),
      (2L, Seq(), Seq()),
      (3L, Seq(1L, 2L), Seq(1L, 2L, 3L)), // length mismatch -> null both ways
      (4L, Seq(1L, null, 3L), Seq(1L, 2L, 3L)), // null element -> null both ways
      (5L, (1L to 64L).map(java.lang.Long.valueOf), (64L to 1L by -1L).map(java.lang.Long.valueOf)))
      .toDF("id", "a", "b")
    val got = rows.select(col("id"), expr("dot_i64(a, b)").as("d")).collect()
      .map(r => r.getAs[Long]("id") -> (if (r.isNullAt(1)) null else r.getAs[Long]("d"))).toMap
    val want = rows.select(col("id"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)").as("d"))
      .collect()
      .map(r => r.getAs[Long]("id") -> (if (r.isNullAt(1)) null else r.getAs[Long]("d"))).toMap
    assert(got === want)
    assert(got(0L) === 32L && got(3L) === null && got(4L) === null)
  }

  test("char_collision equals the slice(split)+HOF formulation on adversarial input") {
    val native = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("char_collision(text)").as("cc")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    val composable = docs.filter(col("text").isNotNull)
      // split(text, '') is Java split(regex, -1): the zero-width match at
      // end-of-string appends a phantom "" element — slice to exactly
      // length(text) chars
      .select(col("doc_id"),
        expr("slice(split(text, ''), 1, length(text))").as("cs"))
      .select(col("doc_id"),
        size(col("cs")).cast("long").as("n"),
        size(array_distinct(col("cs"))).cast("long").as("k"),
        expr("""aggregate(
          transform(array_distinct(cs), ch -> CAST(size(filter(cs, x -> x = ch)) AS BIGINT)),
          0L, (acc, x) -> acc + x * x)""").as("coll"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Seq(r.getAs[Long]("n"), r.getAs[Long]("k"), r.getAs[Long]("coll"))).toMap
    assert(native === composable)
    // empty string → [0, 0, 0]; NULL text → NULL out (nullSafeEval)
    assert(native(0L) === Seq(0L, 0L, 0L))
    assert(docs.filter(col("doc_id") === 14L)
      .select(expr("char_collision(text)")).collect().head.isNullAt(0))
    // unicode: counts are per code point, never per UTF-16 unit or byte
    assert(native(9L).head === "héllo wörld ünïcode test".codePointCount(0, 24))
  }

  test("cdc_chunk_hashes equals the per-position explode formulation on adversarial input") {
    import spark.implicits._
    // the shared fixture plus CDC-specific adversaries: strings long
    // enough to actually cut (expected boundary rate 1/32 per position),
    // an astral-plane code point (the kernel must index code points like
    // substring, never UTF-16 units), and a repeated motif (identical
    // chunks must hash identically)
    val rnd = new scala.util.Random(7)
    val long1 = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val extra = Seq(
      (100L, long1),
      (101L, long1 + "X" + long1), // shared content at shifted offsets
      (102L, "préfix😀" + long1.take(120) + "😀suffix"),
      (103L, ("ab" * 100)))
      .toDF("doc_id", "text")
    val all = docs.union(extra)
    val native = all.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("cdc_chunk_hashes(text)").as("chs")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    // the composable formulation the kernel's Scaladoc names (and the
    // oracle SQL mirrors): cut after p ∈ [8, n−1] iff the first 16 md5
    // bits of the trailing-8-char window ≡ 0 mod 32
    val composable = all.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .withColumn("cuts", expr(
        """CASE WHEN n >= 9 THEN filter(sequence(8, n - 1),
          |  p -> CAST(conv(substring(md5(substring(text, p - 7, 8)), 1, 4), 16, 10) AS INT) % 32 = 0)
          |ELSE array() END""".stripMargin))
      .withColumn("starts", expr("concat(array(1), transform(cuts, p -> p + 1))"))
      .withColumn("chs", expr(
        """transform(sequence(0, size(starts) - 1),
          |  j -> md5(substring(text, starts[j],
          |    (CASE WHEN j + 1 < size(starts) THEN starts[j + 1] ELSE n + 1 END) - starts[j])))""".stripMargin))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](r.fieldIndex("chs"))).toMap
    assert(native.keySet === composable.keySet)
    composable.foreach { case (id, s) => assert(native(id) === s, s"doc $id") }
    // anchors: long strings actually cut; empty string = one md5("") chunk;
    // NULL → NULL; the duplicated motif's repeated chunks dedup by hash
    assert(native(100L).size > 1, "400-char string produced no cuts")
    assert(native(0L) === Seq("d41d8cd98f00b204e9800998ecf8427e"))
    assert(all.filter(col("doc_id") === 14L)
      .select(expr("cdc_chunk_hashes(text)")).collect().head.isNullAt(0))
    val rep = native(103L)
    assert(rep.toSet.size < rep.size || rep.size == 1,
      "periodic motif should repeat at least one chunk hash (or be a single chunk)")
  }

  test("outer_upper_i64 equals the nested transform-over-sequence formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq[(Long, Seq[Long])](
      (0L, Seq()),
      (1L, Seq(5L)),
      (2L, Seq(-3L, 7L)),
      (3L, Seq(0L, -1L, 2L, 4L)),
      (4L, Seq.fill(64)(rnd.nextLong() % 40000L)))
      .toDF("id", "q")
    val native = rows.select(col("id"), expr("outer_upper_i64(q)").as("o")).collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    val composable = rows.filter(size(col("q")) > 0).select(col("id"), expr(
      """flatten(transform(sequence(1, size(q)), i ->
        |  transform(sequence(i, size(q)), j ->
        |    element_at(q, i) * element_at(q, j))))""".stripMargin).as("o")).collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    // sequence(1, 0) is DESCENDING [1, 0] in Spark, so the empty case is
    // asserted directly instead of against the composable form
    assert(native(0L) === Seq.empty[Long])
    (1L to 4L).foreach(id => assert(native(id) === composable(id), s"id $id"))
    assert(native(2L) === Seq(9L, -21L, 49L))
    // null element → null result (the composable form nulls those products)
    val withNull = Seq((9L, Seq[java.lang.Long](1L, null, 3L))).toDF("id", "q")
    assert(withNull.select(expr("outer_upper_i64(q)")).collect().head.isNullAt(0))
  }

  test("eq_count equals size(filter(zip_with)) incl. null-element and length-mismatch cases") {
    import spark.implicits._
    val rows = Seq[(Long, Seq[String], Seq[String])](
      (0L, Seq("a", "b", "c"), Seq("a", "x", "c")),
      (1L, Seq(), Seq()),
      (2L, Seq("a", "b"), Seq("a", "b", "c")), // pads never count
      (3L, Seq("a", null, "c"), Seq("a", null, "c")), // null = null is NOT a match
      (4L, Seq("é", "ü"), Seq("é", "u")),
      (5L, (1 to 16).map(i => s"h$i"), (1 to 16).map(i => s"h$i")))
      .toDF("id", "a", "b")
    val got = rows.select(col("id"), expr("eq_count(a, b)").as("c")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("c")).toMap
    val want = rows.select(col("id"),
      expr("size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))").cast("long").as("c"))
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("c")).toMap
    assert(got === want)
    assert(got(0L) === 2L && got(2L) === 2L && got(3L) === 2L && got(5L) === 16L)
  }

  test("bpe_token_count applies ordered merges iteratively, building multi-char tokens") {
    import spark.implicits._
    // ordered rules: a+b -> ab, then ab+c -> abc (a MULTI-CHARACTER left
    // token — later rounds must see the tokens earlier rounds built), an
    // overlap probe (a+a, leftmost-first non-overlapping), and a unicode
    // pair (code-point stepping)
    val merges = Seq("a b", "ab c", "a a", "h \u00e9")
    val ml = typedLit(merges)
    val extra = Seq[(Long, String)](
      (100L, "abc abcc aaa xabcy"), // 1 + 2 + 2 + 3 = 8 tokens
      (101L, "h\u00e9llo w\u00f6rld"),        // h\u00e9 l l o = 4; w \u00f6 r l d = 5
      (102L, "aaaa ab")             // [aa, aa] = 2; [ab] = 1
    ).toDF("doc_id", "text")
    val gdocs = docs.union(extra)
    val native = gdocs.select(col("doc_id"),
      call_function("bpe_token_count", col("text"), ml).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> Option(r.get(1))).toMap
    // independent in-test reference: iterated leftmost-first merge passes
    def tok(w: String): Seq[String] = {
      var toks: Seq[String] =
        w.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp)))
      merges.foreach { m =>
        val Array(l, r) = m.split(" ", 2)
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
            out += (toks(i) + toks(i + 1)); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.toSeq
      }
      toks
    }
    val wordsByDoc = gdocs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(native(14L).isEmpty) // null text -> null
    wordsByDoc.foreach { case (id, ws) =>
      val want = ws.map(w => tok(w).length.toLong).sum
      assert(native(id) === Some(want), s"doc $id")
    }
    // bpe_tokens (the per-word training primitive) sums to the same count
    val viaTokens = gdocs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .select(col("doc_id"),
        size(call_function("bpe_tokens", col("w"), ml)).cast("long").as("n"))
      .groupBy("doc_id").agg(sum("n").as("n")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    viaTokens.foreach { case (id, n) => assert(native(id) === Some(n), s"doc $id") }
    // spot values incl. the composed 3-char token and the overlap chain
    assert(native(100L) === Some(8L))
    assert(native(101L) === Some(9L))
    assert(native(102L) === Some(3L))
    assert(native(10L) === Some(9L)) // single-char words never merge
    // token SEQUENCE spot check: "xabcy" -> [x, abc, y]
    val seq = Seq(Tuple1("xabcy")).toDF("w")
      .select(call_function("bpe_tokens", col("w"), ml)).collect()(0).getSeq[String](0)
    assert(seq === Seq("x", "abc", "y"))
  }

  test("nearest_centroid equals greatest-of-literal-structs incl. ties and malformed vectors") {
    import spark.implicits._
    import graft.operators.Similarity
    // adversarial quantizer: duplicate centroids (rows 0 and 1) force
    // csim ties that must break to the SMALLER cid in both formulations
    val cents: Seq[Array[Double]] = Seq(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0),
      Array(-0.5, 0.5, 0.25, -0.125))
    val vecs = Seq[(Long, Seq[java.lang.Double])](
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),      // exact tie between cid 0 and 1
      (1L, Seq(0.0, 2.0, 0.0, 0.0)),
      (2L, Seq(-1.0, 1.0, 0.5, -0.25)),
      (3L, Seq(0.3, -0.7, 0.2, 0.9)),
      (4L, Seq(1.0, 2.0, 3.0)),           // length mismatch -> (null, 0)
      (5L, Seq[java.lang.Double](1.0, null, 0.0, 0.0))) // null element -> (null, 0)
      .toDF("vec_id", "v")
      .select(col("vec_id"), expr("transform(v, x -> CAST(x AS DOUBLE))").as("v"))
    def collectBoth(c: org.apache.spark.sql.Column) = vecs
      .select(col("vec_id"), c.getField("csim").as("csim"),
        c.getField("ncid").cast("long").as("ncid"))
      .orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        Option(r.get(1)).map(_.asInstanceOf[Double]), r.getAs[Long]("ncid")))
    val structs = collectBoth(Similarity.bestCentroidStructs(cents))
    val kernel = collectBoth(Similarity.bestCentroidKernel(cents))
    assert(kernel.toSeq === structs.toSeq)
    // the tie broke to cid 0 (ncid 0), and malformed rows read (null, 0)
    assert(kernel(0)._3 === 0L)
    assert(kernel(4)._2.isEmpty && kernel(4)._3 === 0L)
    assert(kernel(5)._2.isEmpty && kernel(5)._3 === 0L)

    // DOCUMENTED divergence on a NULL vector (out of the embeddings-table
    // contract, pinned here so it can't regress unnoticed — r13 ADVICE):
    // the kernel is null-in/null-out (whole struct NULL), while the
    // greatest-of-structs form manufactures (csim=null, ncid=0)
    val nullVec = Seq(Tuple1[Seq[java.lang.Double]](null)).toDF("v")
      .select(expr("transform(v, x -> CAST(x AS DOUBLE))").as("v"))
    def structOf(c: org.apache.spark.sql.Column) =
      nullVec.select(c.as("s")).collect()(0)
    val ks = structOf(Similarity.bestCentroidKernel(cents))
    val ss = structOf(Similarity.bestCentroidStructs(cents))
    assert(ks.isNullAt(0), "kernel: NULL v -> NULL struct")
    val ssRow = ss.getStruct(0)
    assert(ssRow.isNullAt(0) && ssRow.getInt(1) === 0,
      "structs: NULL v -> (null, ncid=0)")

    // real corpus: the full 16x64 assignment is struct-for-struct identical
    // (bit-exact csim, same cid) between the two formulations
    val cents16 = Similarity.seedCentroids(spark, sf)
    val e = graft.sources.Tables.embeddings(spark, sf).select(
      col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    def assignAll(c: org.apache.spark.sql.Column) = e
      .select(col("vec_id"), c.getField("csim").as("csim"),
        c.getField("ncid").cast("long").as("ncid"))
      .orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("csim"), r.getAs[Long]("ncid")))
    assert(assignAll(Similarity.bestCentroidKernel(cents16)).toSeq ===
      assignAll(Similarity.bestCentroidStructs(cents16)).toSeq)
  }

  test("gate_stats equals all nine composable formulations on adversarial input") {
    import spark.implicits._
    // the shared adversarial corpus plus gate-specific edges: the '#|...'
    // alternation (overlap '....', adjacency '#...#', terminal '...'),
    // symbol/digit runs for the re-token classes, uppercase (lower() is
    // applied for nsym/retok but NOT for stopn/alphan), and a surrogate
    // pair (one regex code point, not two chars)
    val gdocs = docs.union(Seq[(Long, String)](
      (20L, "#"),
      (21L, "...."),
      (22L, "#...# ... .."),
      (23L, "ends with dots..."),
      (24L, "A 42 the THE a A9 9a ##"),
      (25L, "emoji 😀 pair"),
      (26L, "t4b--x7 , . ; 12ab34"),
      (27L, "THE UPPER A")).toDF("doc_id", "text"))
    val w = split(trim(col("text")), "\\s+")
    val composable = gdocs.filter(col("text").isNotNull)
      .select(col("doc_id"), w.as("w"), col("text"))
      .select(col("doc_id"), array(
        size(col("w")).cast("long"),
        expr("aggregate(transform(w, x -> length(x)), 0L, (acc, x) -> acc + x)"),
        size(expr("filter(w, x -> x IN ('the', 'a'))")).cast("long"),
        expr("aggregate(transform(array_distinct(w), t -> size(filter(w, x -> x = t))), 0, (a, x) -> greatest(a, x))").cast("long"),
        size(array_distinct(col("w"))).cast("long"),
        size(expr("filter(w, x -> x rlike '[a-zA-Z]')")).cast("long"),
        size(regexp_extract_all(col("text"), lit("#|\\.\\.\\."), lit(0))).cast("long"),
        size(regexp_extract_all(lower(col("text")), lit("[^a-z0-9\\s]"), lit(0))).cast("long"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")).as("gs"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    val native = gdocs.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("gate_stats(text)").as("gs"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(native.keySet === composable.keySet)
    composable.foreach { case (id, c) => assert(native(id) === c, s"doc $id") }
    // NULL text propagates NULL, matching the HOF chain
    assert(gdocs.filter(col("text").isNull)
      .select(expr("gate_stats(text)")).head.isNullAt(0))
    // anchors: '....' = one leftmost '...' match; '#...#' = 3 matches
    assert(native(21L)(6) === 1L)
    assert(native(22L)(6) === 4L) // '#','...','#' in token 1 + terminal '...'
  }
}
