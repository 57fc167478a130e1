package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized reference tests: the hand-optimized primitives must
  * agree with naive, obviously-correct implementations on thousands of
  * random inputs. Deterministic (fixed seeds), so failures reproduce.
  */
class ReferenceSpec extends AnyFunSuite {

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  test("Md5PrefixUtil matches BigInt-parsed hex prefix on random strings") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000; n <- Seq(1, 7, 8, 15)) {
      val s = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      val expect = BigInt(md5Hex(s).take(n), 16).toLong
      val got = Md5PrefixUtil.md5PrefixLong(UTF8String.fromString(s), n)
      assert(got == expect, s"nHex=$n s='$s'")
    }
  }

  test("SpanHashUtil matches naive sliding-window hashing on random tokens") {
    val rnd = new scala.util.Random(7)
    val span = 3
    for (_ <- 1 to 2000) {
      val toks = Seq.fill(rnd.nextInt(12))(
        rnd.alphanumeric.take(1 + rnd.nextInt(5)).mkString)
      val expect = toks.sliding(span).filter(_.size == span)
        .map(w => BigInt(md5Hex(w.mkString(" ")).take(8), 16).toLong).toSeq
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val got = SpanHashUtil.spanHashes(arr, span, 8).toLongArray.toSeq
      assert(got == expect, s"toks=$toks")
    }
  }

  test("separator-wrapped replace() merge equals greedy sequence BPE merge") {
    // the encoding claim behind TextOps.bpeLearnMerges: on ␟-wrapped
    // symbol strings, java String.replace of ␟l␟␟r␟ → ␟lr␟ merges
    // exactly the left-to-right non-overlapping (l, r) occurrences and
    // can never match across symbol boundaries
    def refMerge(syms: List[String], l: String, r: String): List[String] =
      syms match {
        case a :: b :: rest if a == l && b == r =>
          (l + r) :: refMerge(rest, l, r)
        case a :: rest => a :: refMerge(rest, l, r)
        case Nil => Nil
      }
    val sep = "\u001f"
    def encode(syms: Seq[String]) = syms.map(s => sep + s + sep).mkString
    def decode(s: String): Seq[String] =
      if (s.isEmpty) Seq.empty
      else s.stripPrefix(sep).stripSuffix(sep).split(sep + sep).toSeq
    val alphabet = Seq("a", "b", "c", "ab", "aa", "ba", "abc")
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 5000) {
      val syms = Seq.fill(1 + rnd.nextInt(8))(
        alphabet(rnd.nextInt(alphabet.size)))
      val l = alphabet(rnd.nextInt(alphabet.size))
      val r = alphabet(rnd.nextInt(alphabet.size))
      val viaReplace = decode(encode(syms).replace(
        sep + l + sep + sep + r + sep, sep + l + r + sep))
      val viaRef = refMerge(syms.toList, l, r)
      assert(viaReplace == viaRef, s"syms=$syms merge=($l,$r)")
    }
  }
}
