package graft.text

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the HTML prep chain over the FIXTURES.md fixtures
  * (P1–P11 structural behaviors, pinned; SURVEY.md §5 hard part #3).
  */
class HtmlPrepSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val src = Source.fromResource(name)
    try src.mkString finally src.close()
  }
  private lazy val book = fixture("redhat-book.html")
  private lazy val landing = fixture("landing.html")
  private lazy val website = fixture("website-body.html")

  // ---- S3: structural extraction ----

  test("extractTitleAndBody finds h1 title and .book content") {
    val (title, body) = HtmlPrep.extractTitleAndBody(book)
    assert(title == "Installing FooProduct")
    assert(body.contains("Chapter One") && body.contains("Tail paragraph"))
    assert(!body.contains("producttitle")) // outside .book
  }

  test("extractTitleAndBody yields empty content without .book/.article") {
    val (title, body) = HtmlPrep.extractTitleAndBody("<h1>T</h1><div>x</div>")
    assert(title == "T" && body == "")
  }

  // ---- P4–P10: cleanHtml on the book fixture ----

  private lazy val cleaned = HtmlPrep.cleanHtml(
    HtmlPrep.extractTitleAndBody(book)._2)

  test("P4: unwanted classes and hr are removed") {
    for (gone <- Seq("Copyright text to remove", "callout heading removed",
        "callout list body removed", "<hr"))
      assert(!cleaned.contains(gone), s"expected removed: $gone")
  }

  test("P5: Legal Notice anchor removed, other anchors kept") {
    assert(!cleaned.contains("Legal Notice"))
    assert(cleaned.contains("Keep Me"))
  }

  test("P6: div/span/strong/section unwrapped") {
    for (tag <- Seq("<div", "<span", "<strong", "<section"))
      assert(!cleaned.contains(tag), s"expected unwrapped: $tag")
    assert(cleaned.contains("bold")) // content preserved
  }

  test("P7: dt text gets the arrow prefix") {
    assert(cleaned.contains("<dt>-&gt; TermA</dt>"))
  }

  test("P8: all seven fence variants") {
    for (fence <- Seq("```yaml\nkind: Pod\nmetadata: x\n```",
        "```json\n{\"a\": 1}\n```", "```bash\necho hi\n```",
        "```python\nprint(1)\n```", "```plain", "```none\nuntagged\n```",
        "```console\n$ oc get pods\n```")) {
      // language-none fixture content is "plain" under ```none
      assert(cleaned.contains(fence.replace("```plain", "```none\nplain\n```")),
        s"missing fence: $fence")
    }
  }

  test("P9: no attributes survive") {
    assert(!cleaned.contains("class=") && !cleaned.contains("id="))
  }

  test("P10: nbsp becomes a plain space") {
    assert(cleaned.contains("Intro paragraph"))
    assert(!cleaned.contains(' '))
  }

  test("cleanHtml is idempotent on its own output") {
    assert(HtmlPrep.cleanHtml(cleaned) == cleaned)
  }

  test("parser and cleaner never throw on malformed input (fuzz)") {
    val rnd = new scala.util.Random(13)
    val pieces = Array("<div>", "</div>", "<", ">", "\"", "'", "=", "a",
      " ", "<p class=", "<!--", "-->", "&amp;", "&", "<pre>", "</zzz>",
      "<h1", "<!DOCTYPE", "<script>", "</script>", "<br/>", "~~~", "```")
    for (_ <- 1 to 500) {
      val s = Seq.fill(rnd.nextInt(30))(pieces(rnd.nextInt(pieces.length))).mkString
      val cleaned = HtmlPrep.cleanHtml(s) // must not throw
      HtmlPrep.htmlToMarkdown(s) // must not throw
      HtmlPrep.extractTitleAndBody(s)
      HtmlPrep.extractLinks(s)
      assert(HtmlPrep.cleanHtml(cleaned) == cleaned, s"not idempotent on: $s")
    }
  }

  // ---- P1: link extraction ----

  test("extractLinks takes only anchors under h3[slot=headline]") {
    assert(HtmlPrep.extractLinks(landing) == Seq(
      "/en/documentation/red_hat_openshift_ai/2.14/html/installing",
      "/en/documentation/red_hat_openshift_ai/2.14/html/serving",
      "/en/documentation/red_hat_openshift_ai/2.14/release_notes",
      "https://example.com/external"))
  }

  // ---- P11: markdown conversion ----

  test("website fixture converts to pinned markdown") {
    assert(HtmlPrep.htmlToMarkdown(website) ==
      """# Site Guide
        |
        |Welcome to the *site*. See [docs](https://example.com/docs).
        |
        |## Getting Started
        |
        |First paragraph of getting started.
        |
        |- step one
        |- step two
        |
        |### Prerequisites
        |
        |Some prerequisites text.
        |
        |#### Hardware
        |
        |Hardware requirements body.
        |
        |```
        |raw code
        |```
        |
        |1. alpha
        |2. beta
        |""".stripMargin)
  }

  test("cleaned book markdown splits into expected header sections") {
    val md = HtmlPrep.htmlToMarkdown(cleaned)
    val sections = Splitters.markdownHeaderSplit(md)
    val headers = sections.map(_.headers)
    assert(headers.contains(Map("Header1" -> "Chapter One")))
    assert(headers.contains(
      Map("Header1" -> "Chapter One", "Header2" -> "Section One One")))
    assert(headers.contains(Map("Header1" -> "Chapter One",
      "Header2" -> "Section One One", "Header3" -> "Deep Section")))
    assert(headers.contains(
      Map("Header1" -> "Chapter One", "Header2" -> "Section One Two")))
    // fenced code survives splitting intact inside its section
    val deep = sections.find(_.headers.get("Header3").contains("Deep Section")).get
    assert(deep.content.contains("```yaml\nkind: Pod\nmetadata: x\n```"))
    assert(deep.content.contains("```console\n$ oc get pods\n```"))
  }

  test("full chain: website markdown through 4-level split") {
    val md = HtmlPrep.htmlToMarkdown(website)
    val sections = Splitters.markdownHeaderSplit(md, Splitters.Headers4)
    assert(sections.map(_.headers.size).max == 4)
    val hw = sections.find(_.headers.get("Header4").contains("Hardware")).get
    // The pre block and the list that follow #### Hardware belong to it.
    assert(hw.content ==
      "Hardware requirements body.  \n```\nraw code\n```  \n1. alpha\n2. beta")
    assert(hw.headers == Map("Header1" -> "Site Guide",
      "Header2" -> "Getting Started", "Header3" -> "Prerequisites",
      "Header4" -> "Hardware"))
  }
}
