package graft.sources

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** Text chunking — a faithful re-implementation of the reference's
  * `chunkText` cascade, because chunk ids (`{docId}-{i}`) derive from the
  * exact split points and every downstream table keys on them
  * (SURVEY.md §7.3 "chunk identity parity").
  *
  * Plain variant (PDF path, /root/reference/src/services/PDFExtractor.ts:78-145):
  * collapse whitespace -> paragraph split -> sentence split -> hard split
  * with overlap -> drop chunks <= 20 chars. Note the reference collapses
  * ALL whitespace (including newlines) for PDFs, so the paragraph split
  * never fires there — preserved as-is.
  *
  * Markdown variant (MarkdownExtractor.ts:247-472): additionally
  * pre-splits oversized fenced code blocks (re-fencing each piece) and
  * tables (re-attaching the header rows) at 80% of chunk size, and
  * protects code spans behind placeholders so the splitter never cuts
  * inside them.
  *
  * Pure Scala, used inside `flatMap`/UDFs — embarrassingly parallel at
  * any scale.
  *
  * Known reference-faithful quirk: the fixed-width hard splitter can
  * bisect a `__CODE_BLOCK_N__` placeholder inside a very long
  * punctuation-free paragraph, leaving the fragment unrestored — the
  * reference has the identical behavior (its restore also requires the
  * whole placeholder in one chunk), and chunk-identity parity takes
  * precedence over papering it over (SURVEY.md §7.3).
  */
object Chunker {
  val DefaultChunkSize = 512  // reference src/types.ts:129-130
  val DefaultOverlap = 50
  val MinChunkChars = 20

  private val sentenceRe: Regex = "[^.!?]+[.!?]+".r
  private val fencedBlockRe: Regex = "(?s)```(\\w*)\\n(.*?)```".r
  private val codeSpanRe: Regex = "(?s)```.*?```|`[^`]+`".r
  private val tableRe: Regex =
    "(\\|[^\\n]+\\|\\n\\|[-:\\s|]+\\|\\n(?:\\|[^\\n]+\\|\\n?)+)".r

  /** Strip null bytes (reference sanitizeText). */
  def sanitize(text: String): String = text.replace("\u0000", "")

  /** PDF-path chunker: whitespace fully collapsed before splitting. */
  def chunkPlain(text: String,
                 chunkSize: Int = DefaultChunkSize,
                 overlap: Int = DefaultOverlap): Seq[String] = {
    require(overlap < chunkSize,
      s"overlap ($overlap) must be < chunkSize ($chunkSize)")
    val cleaned = sanitize(text)
      .replaceAll("\\s+", " ")
      .replaceAll("\\n{3,}", "\n\n")
      .trim
    if (cleaned.length <= chunkSize) {
      if (cleaned.isEmpty) Nil else Seq(cleaned)
    } else splitCascade(cleaned, chunkSize, overlap).filter(_.length > MinChunkChars)
  }

  /** Markdown-path chunker with code-block/table protection. */
  def chunkMarkdown(text: String,
                    chunkSize: Int = DefaultChunkSize,
                    overlap: Int = DefaultOverlap): Seq[String] = {
    require(overlap < chunkSize,
      s"overlap ($overlap) must be < chunkSize ($chunkSize)")
    val maxElement = (chunkSize * 0.8).toInt
    val sanitized = sanitize(text)
    val preSplit = preprocessTables(
      preprocessCodeBlocks(sanitized, maxElement), maxElement)

    // placeholder-protect small code blocks/spans so splits never cut them
    val codeBlocks = ArrayBuffer.empty[(String, String)]
    val withPlaceholders = codeSpanRe.replaceAllIn(preSplit, m => {
      val matched = m.matched
      if (matched.length <= maxElement) {
        val ph = s"__CODE_BLOCK_${codeBlocks.length}__"
        codeBlocks += ph -> matched
        Regex.quoteReplacement(ph)
      } else Regex.quoteReplacement(matched)
    })

    val cleaned = withPlaceholders
      .replaceAll("[ \\t]+", " ")
      .replaceAll("\\n{3,}", "\n\n")
      .trim

    def restore(chunk: String): String =
      codeBlocks.foldLeft(chunk) { case (acc, (ph, content)) =>
        replaceFirstLiteral(acc, ph, content)
      }

    if (cleaned.length <= chunkSize) {
      val restored = restore(cleaned)
      if (restored.isEmpty) Nil else Seq(restored)
    } else {
      splitCascade(cleaned, chunkSize, overlap)
        .map(restore)
        .filter(_.length > MinChunkChars)
    }
  }

  /** Paragraph -> sentence -> hard-split cascade (shared by both paths). */
  private def splitCascade(cleaned: String, chunkSize: Int, overlap: Int): Seq[String] = {
    val chunks = ArrayBuffer.empty[String]
    val paragraphs = cleaned.split("\\n\\n+")
    var current = ""

    for (para <- paragraphs) {
      if (current.length + para.length + 2 <= chunkSize) {
        current = if (current.isEmpty) para else s"$current\n\n$para"
      } else {
        if (current.nonEmpty) chunks += current
        if (para.length > chunkSize) {
          val sentences = {
            val ms = sentenceRe.findAllIn(para).toSeq
            if (ms.isEmpty) Seq(para) else ms
          }
          current = ""
          for (sentence <- sentences) {
            if (current.length + sentence.length <= chunkSize) {
              current += sentence
            } else {
              if (current.nonEmpty) chunks += current.trim
              if (sentence.length > chunkSize) {
                var i = 0
                while (i < sentence.length) {
                  chunks += sentence.slice(i, i + chunkSize).trim
                  i += chunkSize - overlap
                }
                current = ""
              } else current = sentence
            }
          }
        } else current = para
      }
    }
    if (current.nonEmpty) chunks += current
    chunks.toSeq
  }

  /** Split fenced code blocks larger than maxSize into re-fenced pieces
    * along line boundaries (MarkdownExtractor.ts:248-300). */
  private[sources] def preprocessCodeBlocks(text: String, maxSize: Int): String =
    fencedBlockRe.replaceAllIn(text, m => {
      if (m.matched.length <= maxSize) Regex.quoteReplacement(m.matched)
      else {
        val lang = m.group(1)
        val code = m.group(2).trim
        val overhead = lang.length + 8
        val effectiveMax = maxSize - overhead
        val pieces = ArrayBuffer.empty[String]
        var cur = ArrayBuffer.empty[String]
        var len = 0
        for (line <- code.split("\n", -1)) {
          if (len + line.length + 1 > effectiveMax && cur.nonEmpty) {
            pieces += s"```$lang\n${cur.mkString("\n")}\n```"
            cur = ArrayBuffer.empty[String]
            len = 0
          }
          cur += line
          len += line.length + 1
        }
        if (cur.nonEmpty) pieces += s"```$lang\n${cur.mkString("\n")}\n```"
        Regex.quoteReplacement(pieces.mkString("\n\n"))
      }
    })

  /** Split oversized markdown tables, re-attaching header+separator to
    * each piece (MarkdownExtractor.ts:303-356). */
  private[sources] def preprocessTables(text: String, maxSize: Int): String =
    tableRe.replaceAllIn(text, m => {
      if (m.matched.length <= maxSize) Regex.quoteReplacement(m.matched)
      else {
        val lines = m.matched.trim.split("\n")
        if (lines.length < 3) Regex.quoteReplacement(m.matched)
        else {
          val header = lines(0); val sep = lines(1)
          val effectiveMax = maxSize - (header.length + sep.length + 2)
          val pieces = ArrayBuffer.empty[String]
          var cur = ArrayBuffer.empty[String]
          var len = 0
          for (row <- lines.drop(2)) {
            if (len + row.length + 1 > effectiveMax && cur.nonEmpty) {
              pieces += (Seq(header, sep) ++ cur).mkString("\n")
              cur = ArrayBuffer.empty[String]
              len = 0
            }
            cur += row
            len += row.length + 1
          }
          if (cur.nonEmpty) pieces += (Seq(header, sep) ++ cur).mkString("\n")
          Regex.quoteReplacement(pieces.mkString("\n\n"))
        }
      }
    })

  private def replaceFirstLiteral(s: String, target: String, replacement: String): String = {
    val i = s.indexOf(target)
    if (i < 0) s
    else s.substring(0, i) + replacement + s.substring(i + target.length)
  }
}
