package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Tokenizer + digest helpers shared by every native text kernel
  * (MinHashKernel, TextWindowKernel). The tokenization contract is the
  * repo-wide `split(trim(text), "\\s+")`; ONE implementation here so the
  * kernels cannot silently diverge from that contract or from each other.
  */
private[functions] object TextKernelUtil {
  /** One MessageDigest per thread — codegen calls kernels from task threads. */
  val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial[java.security.MessageDigest](
      () => java.security.MessageDigest.getInstance("MD5"))

  val HexChars: Array[Char] = "0123456789abcdef".toCharArray

  /** Compiled once: Pattern is immutable and thread-safe for split;
    * compiling per row in a map-side kernel was measurable regex+GC
    * overhead. */
  val WsPattern: java.util.regex.Pattern = java.util.regex.Pattern.compile("\\s+")

  /** Exactly `split(trim(text), "\\s+")`: trim = Spark's `trim` (spaces
    * only); split = Spark's `split(s, re)` which uses Pattern.split with
    * limit -1 (trailing empties kept) — including the single empty token
    * an all-whitespace document yields.
    */
  def splitWords(text: UTF8String): Array[String] = {
    var s = text.toString
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s = s.substring(b, e)
    WsPattern.split(s, -1)
  }

  /** Lowercase-hex rendering of a 16-byte md5 digest — byte-identical to
    * Spark's `md5()` string output. */
  def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
