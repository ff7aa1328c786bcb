package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Bpe

class BpeSpec extends AnyFunSuite {

  /** Naive reference encoder: replay the merges in TRAINING ORDER, each
    * applied to exhaustion, over one pretoken's symbols — the textbook
    * formulation the greedy lowest-rank-first inference must equal.
    */
  private def encodeNaive(bytes: Array[Byte]): Array[Int] = {
    var syms = Array.tabulate(bytes.length)(i => bytes(i) & 0xff)
    Bpe.merges.zipWithIndex.foreach { case ((a, b), r) =>
      var changed = true
      while (changed) {
        changed = false
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (256 + r); i += 2; changed = true
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  private val pretokenRe = java.util.regex.Pattern.compile(Bpe.PretokenPattern)
  private def encodeTextNaive(text: String): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val m = pretokenRe.matcher(text)
    while (m.find())
      out ++= encodeNaive(m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.toArray
  }

  test("trainer is deterministic: first merges pinned (golden)") {
    def render(p: (Int, Int)): String = {
      def s(id: Int) = new String(Bpe.decode(Array(id)),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      s"'${s(p._1)}'+'${s(p._2)}'"
    }
    val first = Bpe.merges.take(8).map(render)
    info(s"first merges: ${first.mkString(", ")}")
    // the committed golden: English byte frequencies make ' t'/'th'/'he'
    // family merges appear first; a trainer change shifts these and must
    // be a conscious decision (update this list + every count downstream)
    assert(Bpe.merges.size === Bpe.NumMerges)
    assert(first === Vector("' '+'t'", "'h'+'e'", "' t'+'he'", "'i'+'n'",
      "' '+'s'", "' '+'a'", "'e'+'r'", "' '+'w'"))
  }

  test("greedy lowest-rank inference equals the rank-order replay (differential)") {
    val samples = Seq(
      "the quick brown fox", "don't stop believing", "10:45, platform 9",
      "aaaaaaaa", "a", "", " ", "   leading and trailing   ",
      "café naïve résumé", "日本語 text mixed",
      "é decomposed", "tabs\tand\nnewlines", "!!!???...",
      "supercalifragilisticexpialidocious") ++
      graft.fixtures.PageGen.pages(40).map(p =>
        new String(p.html, java.nio.charset.StandardCharsets.ISO_8859_1).take(300))
    samples.foreach { s =>
      assert(Bpe.encode(s).toSeq === encodeTextNaive(s).toSeq, s.take(40))
    }
  }

  test("decode inverts encode byte-exactly; counts match encode length") {
    val samples = Seq("the rain in spain", "don't", "mixed 123 !?",
      "café ☃ snowman", "")
    samples.foreach { s =>
      val ids = Bpe.encode(s)
      assert(new String(Bpe.decode(ids), "UTF-8") === s)
      assert(Bpe.countTokens(s) === ids.length)
    }
    assert(Bpe.countTokens(null) === 0)
  }

  test("merges actually compress: common words cost few tokens, counts sit between pretokens and bytes") {
    // " the" is the single most frequent English pretoken — the merges
    // table must take it to ONE token; rare byte salad stays several
    assert(Bpe.encode(" the").length === 1)
    assert(Bpe.encode("the").length <= 2)
    assert(Bpe.encode(" zqxvjkw").length > 3)
    val text = "the extraction pipeline reads the pages and keeps the content"
    val pretokens = {
      val m = pretokenRe.matcher(text); var n = 0
      while (m.find()) n += 1
      n
    }
    val subwords = Bpe.countTokens(text)
    val bytes = text.getBytes("UTF-8").length
    info(s"pretokens=$pretokens subwords=$subwords bytes=$bytes")
    assert(subwords >= pretokens && subwords < bytes)
  }
}
