package graft.text

import graft.text.Html.{Elem, Node, Text}

/** The reference's HTML preparation chain (SURVEY.md P1–P11), re-expressed
  * as pure deterministic String => String functions so they run as
  * executor-side row transforms (UDF / Dataset.map) with golden-test
  * pinning. Citations: kfp/redhat-product-documentation-ingestor/
  * ingestion-pipeline.py lines noted per step.
  *
  * Capability parity, not byte parity with bs4/html2text: whitespace
  * details differ from the Python libraries, but every structural behavior
  * (what is removed/unwrapped/fenced/prefixed) matches the reference and
  * is pinned by HtmlPrepSpec (SURVEY.md §5 hard part #3).
  */
object HtmlPrep {

  private val UnwantedClasses = Set("producttitle", "subtitle", "abstract",
    "legalnotice", "calloutlist", "callout") // P4, ingestion-pipeline.py:86–104
  private val UnwrapTags = Set("div", "span", "strong", "section") // P6, :111–115
  private val CodeLangs = Seq("yaml", "json", "bash", "python", "none") // P8, :122–147

  /** P4–P10 (ingestion-pipeline.py:86–157) as ONE pure function, applied
    * in the reference's order: unwanted-class removal + hr removal, Legal
    * Notice anchors, tag unwrap, dt prefix, code fencing, attribute
    * strip, nbsp normalize (nbsp entities are normalized at parse; raw
    * U+00A0 in text is normalized here).
    */
  def cleanHtml(html: String): String = {
    val root = Html.parse(html)
    // P4: decompose div/span/h2 carrying any unwanted class; remove hr.
    root.removeAll(e =>
      (Set("div", "span", "h2").contains(e.tag) &&
        e.classes.intersect(UnwantedClasses).nonEmpty) || e.tag == "hr")
    // P5: anchors whose text is exactly "Legal Notice".
    root.removeAll(e => e.tag == "a" && e.text == "Legal Notice")
    // P8 BEFORE P6: fence code while <pre> classes still exist (the
    // reference fences before unwrap touches nothing inside <pre>, and
    // unwrap doesn't target pre — order P6/P8 is observably equivalent,
    // but fencing first keeps the class lookup local).
    root.replaceContent(e => e.tag == "pre" && e.classes.contains("programlisting")) { e =>
      val lang = CodeLangs.find(l => e.classes.contains(s"language-$l")).getOrElse("none")
      s"```$lang\n${e.text}\n```"
    }
    root.replaceContent(e => e.tag == "pre" && e.classes.contains("screen")) { e =>
      s"```console\n${e.text}\n```"
    }
    // P7: definition terms become "-> term" lines (skip already-prefixed
    // terms so the whole cleaner stays idempotent).
    root.replaceContent(_.tag == "dt") { e =>
      val t = e.text
      if (t.startsWith("-> ")) t else s"-> $t"
    }
    // P6: unwrap purely-structural tags.
    root.unwrapAll(e => UnwrapTags.contains(e.tag))
    // P9: strip every attribute.
    (root :: root.descendants).foreach(_.attrs = Map.empty)
    // P10: non-breaking spaces -> plain spaces in raw text nodes.
    def nbsp(n: Node): Unit = n match {
      case t: Text => t.value = t.value.replace('\u00a0', ' ')
      case e: Elem => e.children.foreach(nbsp)
    }
    nbsp(root)
    root.outerHtml
  }

  /** S3 structural extraction (ingestion-pipeline.py:67–162): page title
    * from the first `<h1>`, main content from the first element classed
    * `book` or `article`; a page with neither yields empty content.
    */
  def extractTitleAndBody(html: String): (String, String) = {
    val root = Html.parse(html)
    val title = root.find(_.tag == "h1").map(_.text.strip()).getOrElse("")
    val body = root
      .find(e => e.classes.contains("book") || e.classes.contains("article"))
      .map(_.outerHtml).getOrElse("")
    (title, body)
  }

  /** P1 (ingestion-pipeline.py:166–191): hrefs of anchors under
    * `h3[slot=headline]` landing-page headline elements.
    */
  def extractLinks(html: String): Seq[String] = {
    val root = Html.parse(html)
    root.descendants
      .filter(e => e.tag == "h3" && e.attrs.get("slot").contains("headline"))
      .flatMap(_.descendants.filter(_.tag == "a"))
      .flatMap(_.attrs.get("href"))
  }

  /** P11 (ingestion-pipeline.py:201–202; website-ingestion-pipeline.py:
    * 140–144): HTML → Markdown. Headings become `#`-lines (feeding
    * [[Splitters.markdownHeaderSplit]]), paragraphs/blocks separate with
    * blank lines, lists bullet/number, `<pre>` becomes (or passes
    * through) fenced code, links/emphasis use inline markdown syntax.
    */
  def htmlToMarkdown(html: String): String = {
    val root = Html.parse(html)
    val out = new StringBuilder
    renderBlock(root, out)
    out.toString.replaceAll("\n{3,}", "\n\n").strip() + "\n"
  }

  private val HeadingTags: Map[String, Int] =
    (1 to 6).map(i => s"h$i" -> i).toMap

  private def inline(n: Node): String = n match {
    case Text(v) => v.replaceAll("\\s+", " ")
    case e: Elem => e.tag match {
      case "a" =>
        val t = e.children.map(inline).mkString.trim
        e.attrs.get("href") match {
          case Some(h) if h.nonEmpty => s"[$t]($h)"
          case _ => t
        }
      case "strong" | "b" => s"**${e.children.map(inline).mkString.trim}**"
      case "em" | "i" => s"*${e.children.map(inline).mkString.trim}*"
      case "code" => s"`${e.text}`"
      case "br" => "\n"
      case "script" | "style" => ""
      case _ => e.children.map(inline).mkString
    }
  }

  private def isBlock(e: Elem): Boolean =
    HeadingTags.contains(e.tag) || Set("p", "div", "section", "article",
      "body", "html", "main", "ul", "ol", "li", "pre", "dl", "dt", "dd",
      "table", "blockquote", "#root").contains(e.tag)

  private def renderBlock(e: Elem, out: StringBuilder): Unit = e.tag match {
    case t if HeadingTags.contains(t) =>
      out.append("#" * HeadingTags(t)).append(' ')
        .append(e.children.map(inline).mkString.trim).append("\n\n")
    case "p" | "dd" | "blockquote" =>
      val t = e.children.map(inline).mkString.trim
      if (t.nonEmpty) out.append(t).append("\n\n")
    case "dt" =>
      out.append(e.children.map(inline).mkString.trim).append('\n')
    case "pre" =>
      val t = e.text.strip()
      if (t.startsWith("```")) out.append(t).append("\n\n")
      else out.append("```\n").append(e.text.strip()).append("\n```\n\n")
    case "ul" =>
      e.children.collect { case li: Elem if li.tag == "li" => li }.foreach(li =>
        out.append("- ").append(li.children.map(inline).mkString.trim).append('\n'))
      out.append('\n')
    case "ol" =>
      e.children.collect { case li: Elem if li.tag == "li" => li }
        .zipWithIndex.foreach { case (li, i) =>
          out.append(i + 1).append(". ")
            .append(li.children.map(inline).mkString.trim).append('\n')
        }
      out.append('\n')
    case "script" | "style" => ()
    case _ =>
      // Container: blocks recurse; runs of inline children form paragraphs.
      val para = new StringBuilder
      def flushPara(): Unit = {
        val t = para.toString.trim
        if (t.nonEmpty) out.append(t).append("\n\n")
        para.clear()
      }
      e.children.foreach {
        case c: Elem if isBlock(c) => flushPara(); renderBlock(c, out)
        case other => para.append(inline(other))
      }
      flushPara()
  }
}
