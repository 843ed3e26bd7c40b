package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Markdown extraction: frontmatter + heading-delimited sections.
  *
  * The reference parses a full mdast AST (remark), but sections are
  * defined purely by top-level headings and frontmatter is a simple
  * YAML/TOML block (/root/reference/src/services/MarkdownExtractor.ts:
  * 131-237) — a line scan reproduces the same sectioning without the AST
  * (SURVEY.md S2). Code fences are tracked so `#` inside a fence is not
  * a heading (as in the AST walk).
  */
object MarkdownSource {

  case class Section(section: Int, heading: String, headingLevel: Int, text: String)
  case class Frontmatter(title: Option[String], description: Option[String],
                         tags: Seq[String], extra: Map[String, String])

  private val headingRe = "^(#{1,6})\\s+(.*)$".r

  /** Split a raw markdown string into (frontmatterBody, contentBody). */
  def splitFrontmatter(content: String): (Seq[String], String) = {
    val lines = content.split("\n", -1)
    val delim = lines.headOption.map(_.trim).getOrElse("")
    if ((delim == "---" || delim == "+++") && lines.length > 1) {
      val end = lines.indexWhere(l => l.trim == delim, 1)
      if (end > 0) (lines.slice(1, end).toSeq, lines.drop(end + 1).mkString("\n"))
      else (Nil, content)
    } else (Nil, content)
  }

  /** Minimal YAML-subset frontmatter parse: `key: value` scalars plus
    * inline (`tags: [a, b]`) and dashed list syntax for tags. Malformed
    * input never throws (reference behavior). */
  def parseFrontmatter(content: String): Frontmatter = {
    val (fmLines, _) = splitFrontmatter(content)
    val kv = collection.mutable.LinkedHashMap.empty[String, String]
    val tags = ArrayBuffer.empty[String]
    var inTags = false
    for (line <- fmLines) {
      val t = line.trim
      if (inTags && t.startsWith("- ")) tags += stripQuotes(t.drop(2).trim)
      else {
        inTags = false
        t.split(":", 2) match {
          case Array(k, v) =>
            val key = k.trim; val value = v.trim
            if (key == "tags") {
              if (value.startsWith("[") && value.endsWith("]")) {
                tags ++= value.drop(1).dropRight(1).split(",")
                  .map(s => stripQuotes(s.trim)).filter(_.nonEmpty)
              } else if (value.isEmpty) inTags = true
              else tags += stripQuotes(value)
            } else if (key.nonEmpty && value.nonEmpty) kv(key) = stripQuotes(value)
          case _ => ()
        }
      }
    }
    Frontmatter(kv.get("title"), kv.get("description"), tags.toSeq,
      (kv - "title" - "description").toMap)
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s

  /** Heading-delimited sectioning; returns at least one section for
    * non-blank content (whole document fallback, section=1). */
  def sections(content: String): Seq[Section] = {
    val (_, body) = splitFrontmatter(content)
    val out = ArrayBuffer.empty[Section]
    var heading = ""
    var level = 0
    var buf = ArrayBuffer.empty[String]
    var inFence = false

    def flush(): Unit = {
      val text = buf.mkString("\n").trim
      if (text.nonEmpty || heading.nonEmpty)
        out += Section(out.length + 1, heading, level, text)
      buf = ArrayBuffer.empty[String]
    }

    for (line <- body.split("\n", -1)) {
      if (line.trim.startsWith("```")) { inFence = !inFence; buf += line }
      else if (!inFence) {
        headingRe.findFirstMatchIn(line) match {
          case Some(m) =>
            flush()
            heading = m.group(2).trim
            level = m.group(1).length
          case None => buf += line
        }
      } else buf += line
    }
    flush()

    if (out.isEmpty && body.trim.nonEmpty)
      out += Section(1, "", 0, body.trim)
    out.toSeq
  }

  /** Full extraction: (page=sectionOrdinal, chunkIndex, content) triples —
    * the reference's markdown analog of PDF pages
    * (MarkdownExtractor.ts:552-567). Used inside a flatMap over a
    * wholetext scan. */
  def extractChunks(content: String,
                    chunkSize: Int = Chunker.DefaultChunkSize,
                    overlap: Int = Chunker.DefaultOverlap): Seq[(Int, Int, String)] = {
    var idx = 0
    sections(content).flatMap { sec =>
      val body = if (sec.heading.nonEmpty) s"${sec.heading}\n\n${sec.text}" else sec.text
      Chunker.chunkMarkdown(body, chunkSize, overlap).map { c =>
        val t = (sec.section, idx, c); idx += 1; t
      }
    }
  }

  /** Title resolution order: frontmatter title > first H1 > fallback
    * (reference src/index.ts:123-160). */
  def resolveTitle(content: String, fallback: String): String =
    parseFrontmatter(content).title
      .orElse(sections(content).find(_.headingLevel == 1).map(_.heading).filter(_.nonEmpty))
      .getOrElse(fallback)
}
