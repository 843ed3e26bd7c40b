package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference AutoTagger heuristic fixtures (SURVEY.md §5 /
  * FIXTURES.md §7). */
class TextEnrichmentSpec extends AnyFunSuite {
  import TextEnrichment._

  test("cleanTitle: separators, extension, title case, acronyms") {
    assert(cleanTitle("cognitive_load_theory_sweller.pdf") ===
      "Cognitive Load Theory Sweller")
    assert(cleanTitle("react-server-components.md") === "React Server Components")
    assert(cleanTitle("HTTP-api-design.pdf") === "HTTP Api Design") // acronym kept
    assert(cleanTitle("a-tale-of-two-cities.pdf") === "a Tale of Two Cities")
  }

  test("cleanTitle: drops edition/isbn parentheticals, decodes URI escapes") {
    assert(cleanTitle("rust-book (2nd edition).pdf") === "Rust Book")
    assert(cleanTitle("some%20book%20title.pdf") === "Some Book Title")
  }

  test("extractAuthor: dash, by, parenthesized patterns") {
    assert(extractAuthor("Paper - Jane Doe.pdf") === Some("Jane Doe"))
    assert(extractAuthor("thinking fast by Daniel Kahneman") === Some("Daniel Kahneman"))
    assert(extractAuthor("deep-work (Cal Newport).pdf") === Some("Cal Newport"))
    assert(extractAuthor("no_author_here.pdf") === None)
  }

  test("normalizeTag: lowercase, punctuation to dashes, collapse/trim") {
    assert(normalizeTag("Machine Learning!") === "machine-learning")
    assert(normalizeTag("--c++--") === "c")
    assert(normalizeTag("API_v2") === "api-v2")
  }

  test("extractPathTags drops noise segments and normalizes") {
    val tags = extractPathTags("/Users/x/Downloads/machine-learning/papers2024/attention.pdf")
    assert(!tags.exists(t => t.contains("users") || t.contains("downloads")))
    assert(tags.contains("machine-learning"))
    assert(tags.contains("papers2024"))
    // UUID and numeric segments are dropped
    assert(extractPathTags("/123/6f1b0c1a-2222-4444-8888-aaaaaaaaaaaa/ai/x.pdf") === Seq("ai"))
  }

  test("extractFilenameTags: stop words and numbers removed, max 3") {
    val tags = extractFilenameTags("the-pragmatic-programmer-2019-edition.pdf")
    assert(tags === Seq("pragmatic", "programmer"))
    assert(extractFilenameTags("designing-data-intensive-applications.pdf").size === 3)
  }

  test("mergeTags: precedence order, dedup, cap 10") {
    val merged = mergeTags(
      llmTags = Seq("ml", "ai"),
      pathTags = Seq("ai", "papers"),
      filenameTags = Seq("attention"),
      contentTags = (1 to 10).map(i => s"kw$i"))
    assert(merged.take(4) === Seq("ml", "ai", "papers", "attention"))
    assert(merged.size === 10)
  }

  test("concept-id validator: shape, whitelist, word count, case") {
    assert(isValidConceptId("programming/rust"))
    assert(isValidConceptId("design/design-systems"))
    assert(!isValidConceptId("new/concept"))          // unknown parent
    assert(!isValidConceptId("programming/new"))      // generic child
    assert(!isValidConceptId("programming/Rust"))     // uppercase
    assert(!isValidConceptId("programming/a b"))      // space
    assert(!isValidConceptId("programming/a-b-c-d-e")) // >4 words
    assert(!isValidConceptId("programming"))          // no slash
  }

  test("LLM JSON repair: code fences, trailing commas, quotes, bare keys") {
    val messy = "Here you go:\n```json\n{tags: ['ai', 'ml',], \"title\": 'X',}\n```"
    repairLlmJson(messy) match {
      case Right(json) =>
        assert(json.contains("\"tags\""))
        assert(json.contains("\"ai\""))
        assert(!json.contains("',"))
      case Left(_) => fail("should repair to full JSON")
    }
    // last-resort tags extraction from unparseable JSON
    repairLlmJson("{\"tags\": [\"a\", \"b\"], \"broken\": }") match {
      case Left(tags) => assert(tags === Seq("a", "b"))
      case Right(j) => fail(s"should not parse: $j")
    }
  }
}
