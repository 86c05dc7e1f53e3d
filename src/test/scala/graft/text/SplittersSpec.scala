package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Golden + property tests pinning the splitter semantics (SURVEY.md §5:
  * "the splitters and cleaner are where silent semantic drift happens").
  * Property cases use a seeded generator — deterministic across runs.
  */
class SplittersSpec extends AnyFunSuite {
  import Splitters._

  // ---- recursiveCharSplit goldens (hand-simulated) ----

  test("short text is a single stripped chunk") {
    assert(recursiveCharSplit("  hello world \n", 2048, 256) == List("hello world"))
    assert(recursiveCharSplit("", 2048, 256) == Nil)
  }

  test("greedy merge with overlap carries trailing pieces forward") {
    // words of 2, chunkSize 5 fits "aa bb"; overlap 2 keeps the last word
    assert(recursiveCharSplit("aa bb cc dd", 5, 2) ==
      List("aa bb", "bb cc", "cc dd"))
  }

  test("zero overlap never repeats content") {
    assert(recursiveCharSplit("aa bb cc dd", 5, 0) == List("aa bb", "cc dd"))
  }

  test("separator descent: paragraphs before lines before words") {
    // Split on \n\n first: ["p1a p1b", "p2"]; joined back they exceed 8,
    // so they stay separate chunks.
    assert(recursiveCharSplit("p1a p1b\n\np2", 8, 0) == List("p1a p1b", "p2"))
    // A paragraph over chunkSize recurses to the word level.
    assert(recursiveCharSplit("aaaa bbbb\n\ncc", 8, 0) ==
      List("aaaa", "bbbb", "cc"))
  }

  test("unsplittable overlong piece falls through to char split") {
    assert(recursiveCharSplit("abcdefghij", 4, 0) == List("abcd", "efgh", "ij"))
  }

  test("reference parameters 2048/256 on joined paragraphs") {
    val para = ("word " * 100).trim // 499 chars
    val text = Seq.fill(10)(para).mkString("\n\n")
    val chunks = recursiveCharSplit(text, 2048, 256)
    assert(chunks == List(
      Seq.fill(4)(para).mkString("\n\n"),
      Seq.fill(4)(para).mkString("\n\n"),
      Seq.fill(2)(para).mkString("\n\n")))
  }

  // ---- recursiveCharSplit properties over seeded random texts ----

  private def randomTexts(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val seps = Array(" ", " ", "\n", "\n\n")
    (1 to n).map { _ =>
      val words = Seq.fill(rnd.nextInt(60))(
        Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString)
      words.map(w => w + seps(rnd.nextInt(seps.length))).mkString.strip()
    }
  }

  test("property: chunks are ≤ chunkSize, non-empty, stripped substrings") {
    for (text <- randomTexts(200); size <- Seq(8, 15, 40)) {
      recursiveCharSplit(text, size, size / 4).foreach { c =>
        assert(c.length <= size)
        assert(c.nonEmpty && c == c.strip())
        assert(text.contains(c), s"chunk '$c' not a substring of '$text'")
      }
    }
  }

  test("property: no content lost — every word appears in some chunk") {
    for (text <- randomTexts(200)) {
      val got = recursiveCharSplit(text, 12, 4).flatMap(_.split("\\s+")).toSet
      text.split("\\s+").filter(w => w.nonEmpty && w.length <= 12).foreach(w =>
        assert(got.contains(w), s"word '$w' lost from '$text'"))
    }
  }

  test("property: splitting a chunk again is a no-op") {
    for (text <- randomTexts(100); size <- Seq(10, 25)) {
      recursiveCharSplit(text, size, size / 3).foreach { c =>
        assert(recursiveCharSplit(c, size, size / 3) == List(c))
      }
    }
  }

  // ---- markdownHeaderSplit goldens ----

  test("basic sections with nested header metadata") {
    val md = "# T\npara1\n\npara2\n## S\nx"
    assert(markdownHeaderSplit(md) == List(
      MdSection("para1  \npara2", Map("Header1" -> "T")),
      MdSection("x", Map("Header1" -> "T", "Header2" -> "S"))))
  }

  test("entering a header pops same-or-deeper levels") {
    val md = "# A\n## B\ntext1\n# C\ntext2"
    assert(markdownHeaderSplit(md) == List(
      MdSection("text1", Map("Header1" -> "A", "Header2" -> "B")),
      MdSection("text2", Map("Header1" -> "C"))))
  }

  test("content before any header has empty metadata") {
    assert(markdownHeaderSplit("intro\n# A\nbody") == List(
      MdSection("intro", Map.empty),
      MdSection("body", Map("Header1" -> "A"))))
  }

  test("fenced code blocks are opaque to header detection") {
    val md = "# A\n```\n# not a header\n```\nafter"
    assert(markdownHeaderSplit(md) == List(
      MdSection("```\n# not a header\n```\nafter", Map("Header1" -> "A"))))
  }

  test("header level beyond the configured set is plain content") {
    // "#### D" is not a 1–3 level header: the char after "###" is '#'.
    assert(markdownHeaderSplit("#### D\nx", Headers3) ==
      List(MdSection("#### D\nx", Map.empty)))
    // With the 4-level WEB variant it IS a header.
    assert(markdownHeaderSplit("#### D\nx", Headers4) ==
      List(MdSection("x", Map("Header4" -> "D"))))
  }

  test("stripHeaders=false keeps the header line in content") {
    assert(markdownHeaderSplit("# A\nbody", stripHeaders = false) ==
      List(MdSection("# A\nbody", Map("Header1" -> "A"))))
  }

  test("blank-line separated paragraphs rejoin with markdown hard breaks") {
    assert(markdownHeaderSplit("# A\np1\n\np2\n\np3") ==
      List(MdSection("p1  \np2  \np3", Map("Header1" -> "A"))))
  }

  test("empty and header-only inputs") {
    assert(markdownHeaderSplit("") == Nil)
    assert(markdownHeaderSplit("# A") == Nil) // no content → no section
  }
}
