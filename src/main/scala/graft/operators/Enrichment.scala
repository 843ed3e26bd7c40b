package graft.operators

import com.fasterxml.jackson.databind.JsonNode
import graft.model.{EnrichmentResult, ProposedConcept}
import scala.jdk.CollectionConverters._

/** E6 enrichment mechanics — prompt assembly, LLM-response parsing with
  * reference defaults, proposal validation, judge protocol — as pure
  * functions (reference /root/reference/src/services/AutoTagger.ts:
  * 560-595 prompt formatting, 808-970 enrichWithLLM, 1013-1035
  * validateProposedConcepts, 597-620 judge prompt). The orchestration
  * (RAG lookup, fallback wiring, auto-accept loop) lives in
  * [[graft.AutoEnricher]]; everything here is deterministic and
  * executor-safe. */
object Enrichment {

  /** Reference DocumentType union (src/types.ts). The reference's text
    * path casts unchecked; we enforce the schema path's enum on both. */
  val DocumentTypes: Set[String] = Set("book", "paper", "tutorial",
    "reference", "guide", "article", "report", "presentation", "notes",
    "other")

  /** E6 heuristic result — the fully-native fallback tier
    * (AutoTagger.ts:1158-1188): X13 title, X14 author, leading-text
    * summary, path/filename/content tag union capped at 10,
    * confidence 0.3. */
  def heuristic(filePath: String, content: String,
                basePath: Option[String] = None): EnrichmentResult = {
    val filename = filePath.split("/").last
    val pathTags = TextEnrichment.extractPathTags(filePath, basePath)
    val filenameTags = TextEnrichment.extractFilenameTags(filename)
    val contentTags = TextEnrichment.extractContentKeywords(content, 5)
    EnrichmentResult(
      title = TextEnrichment.cleanTitle(filename),
      author = TextEnrichment.extractAuthor(filename),
      summary = content.take(200).replaceAll("\\s+", " ").trim + "...",
      documentType = "other",
      category = pathTags.headOption.getOrElse("uncategorized"),
      tags = (pathTags ++ filenameTags ++ contentTags).distinct.take(10),
      concepts = Nil,
      proposedConcepts = Nil,
      confidence = 0.3,
      provider = "heuristic")
  }

  /** Taxonomy block of the enrichment prompt (AutoTagger.ts:573-587). */
  def formatConcepts(concepts: Seq[(String, String)]): String =
    if (concepts.isEmpty) "No taxonomy concepts available yet."
    else "Available concepts (use these IDs when applicable):\n" +
      concepts.map { case (id, label) => s"- $id: $label" }.mkString("\n")

  /** The librarian prompt (text-model path, AutoTagger.ts:862-960):
    * instructions + taxonomy + document, asking for one JSON object with
    * the EnrichmentResult fields. Content truncates at 6000 chars. */
  def enrichPrompt(filename: String, content: String,
                   concepts: Seq[(String, String)]): String = {
    val truncated = content.take(6000)
    s"""You are a librarian cataloging a document for a personal knowledge library.
       |
       |${formatConcepts(concepts)}
       |
       |Analyze the document below and return ONLY a JSON object with these fields:
       |- "title": clean, properly formatted title
       |- "author": author name if identifiable, else null
       |- "summary": 2-3 sentences on the document's content and significance
       |- "documentType": one of book|paper|tutorial|reference|guide|article|report|presentation|notes|other
       |- "category": primary category, lowercase-hyphenated
       |- "tags": 5-10 specific lowercase-hyphenated tags (no generic terms like "document")
       |- "concepts": IDs from the taxonomy list above that apply (only those IDs)
       |- "proposedConcepts": array of {"id","prefLabel","definition"} ONLY for topics truly missing from the taxonomy; "id" must be "parent/short-name" (valid parents: programming, education, design, business, meta, psychology, research, writing); empty array if the taxonomy covers the topics
       |
       |Filename: $filename
       |Content (excerpt):
       |$truncated
       |
       |Return ONLY the JSON object:""".stripMargin
  }

  /** The duplicate-judge prompt (AutoTagger.ts:604-618): the model must
    * answer with one word, DUPLICATE or DISTINCT. */
  def judgePrompt(proposedLabel: String, proposedDef: Option[String],
                  existingLabel: String, existingDef: Option[String]): String =
    s"""You are a taxonomy curator. Decide whether these two concepts are the SAME concept (duplicates to merge) or DISTINCT concepts that both belong in a knowledge taxonomy.
       |
       |PROPOSED CONCEPT:
       |Name: $proposedLabel
       |Definition: ${proposedDef.getOrElse("(no definition)")}
       |
       |EXISTING CONCEPT:
       |Name: $existingLabel
       |Definition: ${existingDef.getOrElse("(no definition)")}
       |
       |Synonyms or alternate names for one thing are DUPLICATE; related but different ideas, theories or domains are DISTINCT.
       |Reply with ONLY one word: DUPLICATE or DISTINCT""".stripMargin

  /** Judge-answer protocol (AutoTagger.ts:636-638): any answer
    * containing DUPLICATE (case-insensitive) rejects the proposal. */
  def isDuplicateAnswer(answer: String): Boolean =
    answer.trim.toUpperCase(java.util.Locale.ROOT).contains("DUPLICATE")

  /** Proposal validation (AutoTagger.ts:1013-1035): id and prefLabel
    * required, X22 id format, prefLabel at most 5 words. */
  def validateProposedConcepts(ps: Seq[ProposedConcept]): Seq[ProposedConcept] =
    ps.filter { p =>
      p.id.nonEmpty && p.prefLabel.nonEmpty &&
        TextEnrichment.isValidConceptId(p.id) &&
        p.prefLabel.trim.split("\\s+").length <= 5
    }

  private def textOpt(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(_.isTextual).map(_.asText).filter(_.nonEmpty)

  private def strArray(n: JsonNode, field: String): Seq[String] =
    Option(n.get(field)).filter(_.isArray)
      .map(_.elements().asScala.toSeq.filter(_.isTextual).map(_.asText))
      .getOrElse(Nil)

  /** Parse an LLM enrichment response into a result with the reference's
    * per-field defaults (AutoTagger.ts:946-960): X21 code-fence/JSON
    * repair first, then field extraction — missing title falls back to
    * X13, tags normalize and drop short ones, proposals validate. An
    * unparseable object whose tags array is still salvageable yields
    * tags + defaults (the reference's parseJSONFromText salvage tier,
    * AutoTagger.ts:545-568); None means nothing was salvageable and the
    * caller falls back to [[heuristic]]. confidence/provider are the
    * caller's to fill. */
  def parseEnrichment(raw: String, filename: String): Option[EnrichmentResult] =
    (TextEnrichment.repairLlmJson(raw) match {
      case Right(json) => Some(json)
      case Left(salvagedTags) if salvagedTags.nonEmpty =>
        return Some(EnrichmentResult(
          title = TextEnrichment.cleanTitle(filename),
          author = None, summary = "", documentType = "other",
          category = "uncategorized",
          tags = salvagedTags.map(TextEnrichment.normalizeTag)
            .filter(_.length >= 2),
          concepts = Nil, proposedConcepts = Nil,
          confidence = 0.0, provider = ""))
      case _ => None
    }).flatMap { json =>
      val node = try new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json) catch { case _: Exception => null }
      Option(node).filter(_.isObject).map { n =>
        val proposals = Option(n.get("proposedConcepts")).filter(_.isArray)
          .map(_.elements().asScala.toSeq.filter(_.isObject).flatMap { p =>
            textOpt(p, "id").map { id =>
              ProposedConcept(id,
                textOpt(p, "prefLabel").getOrElse(""),
                strArray(p, "altLabels"),
                textOpt(p, "definition"))
            }
          }).getOrElse(Nil)
        EnrichmentResult(
          title = textOpt(n, "title")
            .getOrElse(TextEnrichment.cleanTitle(filename)),
          author = textOpt(n, "author"),
          summary = textOpt(n, "summary").getOrElse(""),
          documentType = textOpt(n, "documentType")
            .filter(DocumentTypes.contains).getOrElse("other"),
          category = TextEnrichment.normalizeTag(
            textOpt(n, "category").getOrElse("uncategorized")),
          tags = strArray(n, "tags")
            .map(TextEnrichment.normalizeTag).filter(_.length >= 2),
          concepts = strArray(n, "concepts"),
          proposedConcepts = validateProposedConcepts(proposals),
          confidence = 0.0,
          provider = "")
      }
    }
}
