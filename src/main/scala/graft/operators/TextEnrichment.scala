package graft.operators

import graft.functions.TextFunctions
import scala.util.matching.Regex

/** Heuristic enrichment — the reference AutoTagger's fully-native
  * fallback path (E6/E9), which is the part of enrichment that is engine
  * semantics rather than an external LLM call
  * (/root/reference/src/services/AutoTagger.ts:383-520,1327-1421).
  * Pure functions, usable directly or inside UDF/flatMap stages.
  */
object TextEnrichment {

  private val extRe = "(?i)\\.(pdf|epub|md|markdown|txt)$"

  /** X15 normalizeTag: lowercase, non-alnum -> '-', collapse, trim. */
  def normalizeTag(tag: String): String =
    tag.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9-]", "-")
      .replaceAll("-+", "-")
      .replaceAll("^-|-$", "")

  /** X13 cleanTitle: strip extension, decode URI escapes, separators to
    * spaces, drop edition/isbn parentheticals, title-case preserving
    * short acronyms. */
  def cleanTitle(filename: String): String = {
    var title = filename.replaceAll(extRe, "")
    title = try java.net.URLDecoder.decode(title, "UTF-8") catch { case _: Exception => title }
    title = title.replaceAll("[-_+]+", " ")
    title = title.replaceAll("(?i)\\([^)]*(?:edition|ed\\.|vol\\.|volume|isbn)[^)]*\\)", "")
    title = title.replaceAll("\\s+", " ").trim
    title.split(" ").map { word =>
      if (word == word.toUpperCase(java.util.Locale.ROOT) && word.length <= 4) word // acronym
      else if (word.length <= 2) word.toLowerCase(java.util.Locale.ROOT)           // articles
      else word.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + word.substring(1).toLowerCase(java.util.Locale.ROOT)
    }.mkString(" ")
  }

  /** X14 extractAuthor: three filename patterns (dash-suffix, "by X",
    * parenthesized) — reference AUTHOR_PATTERNS. */
  private val authorPatterns: Seq[Regex] = Seq(
    "(?i)[-–—]\\s*([A-Z][a-z]+(?:\\s+[A-Z]\\.?\\s*)?(?:[A-Z][a-z]+)?)\\s*\\.(?:pdf|epub|md)$".r,
    "(?i)by\\s+([A-Z][a-z]+(?:\\s+[A-Z]\\.?\\s*)?(?:[A-Z][a-z]+)?)".r,
    "(?i)\\(([A-Z][a-z]+(?:\\s+[A-Z]\\.?\\s*)?(?:[A-Z][a-z]+)?)\\)\\s*\\.(?:pdf|epub|md)$".r)

  def extractAuthor(filename: String): Option[String] =
    authorPatterns.view.flatMap(_.findFirstMatchIn(filename))
      .map(_.group(1).trim).headOption

  /** X16 path-noise patterns (numbers, UUIDs, download dirs, hidden,
    * bundle ids...). */
  private val ignorePathPatterns: Seq[Regex] = Seq(
    "^\\d+$".r,
    "(?i)^[a-f0-9-]{36}$".r,
    "(?i)^(downloads?|documents?|files?|temp|tmp|cache)$".r,
    "(?i)^(users?|home|library|mobile documents)$".r,
    "^[._]".r,
    "(?i)^com\\.[a-z]+\\.[a-z]+$".r)

  /** X16 extractPathTags: path segments minus noise, normalized. */
  def extractPathTags(filePath: String, basePath: Option[String] = None): Seq[String] = {
    val p = basePath.filter(filePath.startsWith).map(b => filePath.drop(b.length))
      .getOrElse(filePath)
    p.split("/")
      .filter(s => s.nonEmpty && !s.contains("."))
      .filter(_.length >= 2)
      .filter(s => !ignorePathPatterns.exists(_.findFirstIn(s).isDefined))
      .map(normalizeTag)
      .filter(_.length >= 2)
      .distinct.toSeq
  }

  /** X17 extractFilenameTags: cleaned filename words minus stop words
    * and pure numbers, max 3. */
  def extractFilenameTags(filename: String): Seq[String] = {
    val cleaned = filename.replaceAll(extRe, "")
      .replaceAll("[-_+]+", " ")
      .replaceAll("\\([^)]*\\)", " ")
      .replaceAll("\\[[^\\]]*\\]", " ")
      .replaceAll("\\s+", " ").trim
    cleaned.split("\\s+")
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .filter(_.length >= 3)
      .filterNot(TextFunctions.StopWords.contains)
      .filterNot(_.matches("^\\d+$"))
      .map(normalizeTag)
      .filter(_.length >= 3)
      .distinct.take(3).toSeq
  }

  /** Content keyword extraction (AutoTagger.ts:463-495): frequency ×
    * length-bonus scoring over stop-word-filtered words >= 4 chars; words
    * above 10% of the text are discounted (boilerplate). Stable sort, so
    * score ties keep first-occurrence order — same as the reference's
    * insertion-ordered Map + stable JS sort. */
  def extractContentKeywords(content: String, maxKeywords: Int = 5): Seq[String] = {
    val words = content.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9\\s]", " ")
      .split("\\s+")
      .filter(w => w.length >= 4 &&
        !TextFunctions.StopWords.contains(w) && !w.matches("^\\d+$"))
    val freq = scala.collection.mutable.LinkedHashMap[String, Int]()
    words.foreach(w => freq.update(w, freq.getOrElse(w, 0) + 1))
    val total = math.max(1, words.length).toDouble
    freq.toSeq
      .map { case (w, c) =>
        (w, c * (if (c / total > 0.1) 0.5 else 1.0) * math.min(w.length / 8.0, 1.5))
      }
      .sortBy(-_._2)
      .take(maxKeywords)
      .map(t => normalizeTag(t._1))
      .filter(_.length >= 4)
  }

  /** E9 merge: precedence LLM > path > filename > content, dedup, drop
    * short tags, cap 10 (AutoTagger.ts:1400-1410). */
  def mergeTags(llmTags: Seq[String], pathTags: Seq[String],
                filenameTags: Seq[String], contentTags: Seq[String]): Seq[String] =
    (llmTags ++ pathTags ++ filenameTags ++ contentTags)
      .distinct.filter(_.length >= 2).take(10)

  /** X22 concept-id validator: "parent/child", whitelisted parent,
    * lowercase, hyphenated child <= 4 words (AutoTagger.ts:977-1008). */
  private val validParents = Set("programming", "education", "design",
    "business", "meta", "psychology", "research", "writing")

  def isValidConceptId(id: String): Boolean = {
    val parts = id.split("/", -1)
    if (parts.length != 2) return false
    val Array(parent, child) = parts
    validParents.contains(parent) &&
      !child.contains(" ") &&
      child.length <= 30 &&
      child != "concept" && child != "new" &&
      id == id.toLowerCase(java.util.Locale.ROOT) &&
      child.split("-").length <= 4
  }

  /** X21 LLM-JSON repair: extract from code fences, drop trailing
    * commas, single->double quotes, quote bare keys; last resort pulls a
    * "tags" array (AutoTagger.ts:530-568). Returns the repaired JSON
    * text (parseable by any JSON reader) or the extracted tag list. */
  def repairLlmJson(text: String): Either[Seq[String], String] = {
    val codeBlock = "(?s)```(?:json)?\\s*(.*?)```".r.findFirstMatchIn(text)
      .map(_.group(1).trim).getOrElse(text)
    "(?s)\\{.*\\}".r.findFirstIn(codeBlock) match {
      case None => Left(Nil)
      case Some(obj) =>
        var cleaned = obj
        cleaned = cleaned.replaceAll(",\\s*([}\\]])", "$1")
        cleaned = cleaned.replace('\'', '"')
        cleaned = cleaned.replaceAll("(\\{|,)\\s*([a-zA-Z_][a-zA-Z0-9_]*)\\s*:", "$1\"$2\":")
        if (parses(cleaned)) Right(cleaned)
        else {
          // last resort: extract just the tags array (reference behavior)
          val tags = "(?s)\"tags\"\\s*:\\s*\\[(.*?)\\]".r
            .findFirstMatchIn(cleaned).map(_.group(1)).getOrElse("")
          Left(tags.split(",").map(_.trim.replaceAll("^[\"']|[\"']$", ""))
            .filter(_.nonEmpty).toSeq)
        }
    }
  }

  private def parses(s: String): Boolean =
    try {
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      true
    } catch { case _: Exception => false }
}
