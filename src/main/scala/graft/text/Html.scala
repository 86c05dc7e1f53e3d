package graft.text

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** Minimal tolerant HTML DOM: parser + mutation ops sufficient for the
  * reference's cleanup chain (SURVEY.md P4–P11; reference:
  * kfp/redhat-product-documentation-ingestor/ingestion-pipeline.py:67–162).
  * Not a general browser parser — handles well-formed tags, attributes,
  * comments, doctype, void elements, and raw script/style content, and
  * recovers from stray close tags. No external dependency (the classpath
  * has no HTML library), fully deterministic.
  */
object Html {

  sealed trait Node
  final case class Text(var value: String) extends Node
  final case class Elem(
      var tag: String,
      var attrs: Map[String, String],
      children: ArrayBuffer[Node]) extends Node {

    def classes: Set[String] =
      attrs.getOrElse("class", "").split("\\s+").filter(_.nonEmpty).toSet

    /** Concatenated descendant text. */
    def text: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n match {
        case Text(v) => sb.append(v)
        case e: Elem => e.children.foreach(walk)
      }
      children.foreach(walk)
      sb.toString
    }

    /** All descendant elements (document order), self excluded. */
    def descendants: List[Elem] = {
      val out = ListBuffer[Elem]()
      def walk(e: Elem): Unit = e.children.foreach {
        case c: Elem => out += c; walk(c)
        case _ =>
      }
      walk(this)
      out.toList
    }

    def find(p: Elem => Boolean): Option[Elem] = descendants.find(p)

    /** Remove matching descendant elements (and their subtrees). */
    def removeAll(p: Elem => Boolean): Unit = {
      def walk(e: Elem): Unit = {
        val keep = e.children.filter {
          case c: Elem => !p(c)
          case _ => true
        }
        e.children.clear()
        e.children ++= keep
        e.children.foreach { case c: Elem => walk(c); case _ => }
      }
      walk(this)
    }

    /** Replace matching descendant elements by their children. */
    def unwrapAll(p: Elem => Boolean): Unit = {
      def walk(e: Elem): Unit = {
        var changed = true
        while (changed) {
          changed = false
          val next = ArrayBuffer[Node]()
          e.children.foreach {
            case c: Elem if p(c) => next ++= c.children; changed = true
            case other => next += other
          }
          e.children.clear()
          e.children ++= next
        }
        e.children.foreach { case c: Elem => walk(c); case _ => }
      }
      walk(this)
    }

    /** Replace the whole subtree content of matching elements. */
    def replaceContent(p: Elem => Boolean)(f: Elem => String): Unit =
      descendants.filter(p).foreach { e =>
        val t = f(e)
        e.children.clear()
        e.children += Text(t)
      }

    /** Serialize back to HTML (entities: & < > only; attrs quoted). */
    def outerHtml: String = {
      val sb = new StringBuilder
      def esc(s: String): String =
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      def walk(n: Node): Unit = n match {
        case Text(v) => sb.append(esc(v))
        case e: Elem =>
          sb.append('<').append(e.tag)
          e.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
            sb.append(' ').append(k).append("=\"")
              .append(v.replace("&", "&amp;").replace("\"", "&quot;"))
              .append('"')
          }
          if (VoidTags(e.tag) && e.children.isEmpty) sb.append("/>")
          else {
            sb.append('>')
            if (RawTextTags(e.tag)) {
              // script/style content is raw text in HTML: captured
              // undecoded at parse, so serialize verbatim (escaping it
              // would double-escape on every parse→serialize round).
              e.children.foreach {
                case Text(v) => sb.append(v)
                case c => walk(c)
              }
            } else e.children.foreach(walk)
            sb.append("</").append(e.tag).append('>')
          }
      }
      if (tag == Root) children.foreach(walk) else walk(this)
      sb.toString
    }
  }

  private val Root = "#root"
  private val VoidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "source", "track", "wbr")
  private val RawTextTags = Set("script", "style")

  private val EntityMap = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ")

  def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          if (name.startsWith("#x") || name.startsWith("#X")) {
            try { sb.appendAll(Character.toChars(Integer.parseInt(name.drop(2), 16))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else if (name.startsWith("#")) {
            try { sb.appendAll(Character.toChars(name.drop(1).toInt)); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else EntityMap.get(name) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse an HTML fragment/document into a synthetic root element. */
  def parse(html: String): Elem = {
    val root = Elem(Root, Map.empty, ArrayBuffer())
    var stack = List(root)
    var i = 0
    val n = html.length

    def top = stack.head
    def addText(s: String): Unit =
      if (s.nonEmpty) top.children += Text(decodeEntities(s))

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { addText(html.substring(i)); i = n }
      else {
        addText(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val end = html.indexOf('>', lt)
          i = if (end < 0) n else end + 1
        } else if (lt + 1 < n && html.charAt(lt + 1) == '/') {
          val end = html.indexOf('>', lt)
          val tag = html.substring(lt + 2, if (end < 0) n else end).trim.toLowerCase
          // close the nearest matching open tag; ignore stray closers
          if (stack.exists(_.tag == tag)) {
            while (stack.head.tag != tag) stack = stack.tail
            stack = stack.tail
          }
          i = if (end < 0) n else end + 1
        } else {
          val end = html.indexOf('>', lt)
          if (end < 0) { addText(html.substring(lt)); i = n }
          else {
            val inner = html.substring(lt + 1, end).trim
            val selfClose = inner.endsWith("/")
            val body = if (selfClose) inner.dropRight(1).trim else inner
            val (tag, attrs) = parseTag(body)
            if (tag.nonEmpty) {
              val e = Elem(tag, attrs, ArrayBuffer())
              top.children += e
              i = end + 1
              if (RawTextTags(tag) && !selfClose) {
                val closer = s"</$tag"
                val stop = html.toLowerCase.indexOf(closer, i)
                val stopAt = if (stop < 0) n else stop
                e.children += Text(html.substring(i, stopAt))
                val gt = html.indexOf('>', stopAt)
                i = if (gt < 0) n else gt + 1
              } else if (!selfClose && !VoidTags(tag)) {
                stack = e :: stack
              }
            } else i = end + 1
          }
        }
      }
    }
    root
  }

  private def parseTag(body: String): (String, Map[String, String]) = {
    val sp = body.indexWhere(Character.isWhitespace)
    val tag = (if (sp < 0) body else body.substring(0, sp)).toLowerCase
    if (!tag.forall(c => c.isLetterOrDigit || c == '-')) return ("", Map.empty)
    var attrs = Map.empty[String, String]
    if (sp > 0) {
      val rest = body.substring(sp)
      val attrRe = """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("([^"]*)"|'([^']*)'|[^\s"'>]+))?""".r
      for (m <- attrRe.findAllMatchIn(rest)) {
        val key = m.group(1).toLowerCase
        val v = Option(m.group(3)).orElse(Option(m.group(4)))
          .getOrElse(Option(m.group(2)).getOrElse(""))
        attrs += (key -> decodeEntities(v))
      }
    }
    (tag, attrs)
  }
}
