package graft.model

import java.sql.Timestamp

/** Core domain model — Spark-native restatement of the reference schema
  * (/root/reference/src/services/LibSQLDatabase.ts:675-914, src/types.ts:16-108).
  * JSON-in-TEXT columns become native ArrayType/MapType; F32_BLOB becomes
  * Array[Float]; ISO-8601 text timestamps become TimestampType.
  */
case class Document(
    id: String,
    title: String,
    path: String,
    addedAt: Timestamp,
    pageCount: Int,
    sizeBytes: Long,
    tags: Seq[String],
    fileType: String, // "pdf" | "markdown"
    metadata: Map[String, String])

case class Chunk(
    id: String,      // "{docId}-{chunkIndex}" (reference src/index.ts:221-227)
    docId: String,
    page: Int,       // page for PDFs, section ordinal for markdown
    chunkIndex: Int,
    content: String)

case class Embedding(chunkId: String, embedding: Array[Float])

case class SearchResult(
    docId: String,
    title: String,
    page: Int,
    chunkIndex: Int,
    content: String,
    score: Double,
    matchType: String) // "vector" | "fts" | "hybrid"

case class SearchOptions(
    limit: Int = 10,
    hybrid: Boolean = true,
    tags: Seq[String] = Nil,
    threshold: Option[Double] = None,
    expandContext: Option[Int] = None) // maxChars budget

case class Concept(
    id: String,
    prefLabel: String,
    altLabels: Seq[String],
    definition: Option[String],
    createdAt: Timestamp)

case class HierarchyEdge(conceptId: String, broaderId: String)
case class RelatedEdge(conceptId: String, relatedId: String, relationType: String)
case class DocConcept(docId: String, conceptId: String, confidence: Double, source: String)

case class ClusterAssignment(chunkId: String, clusterId: Int, distance: Double)

/** E6/E8: a concept the LLM proposes adding to the taxonomy
  * (reference src/services/AutoTagger.ts ProposedConcept). */
case class ProposedConcept(
    id: String, // "parent/short-name" SKOS-style
    prefLabel: String,
    altLabels: Seq[String] = Nil,
    definition: Option[String] = None)

/** E6: full document enrichment (reference EnrichmentResult,
  * src/types.ts). `confidence` is 0.3 for the pure-heuristic path, 0.7
  * (local model) / 0.9 (gateway) for LLM-backed enrichment. */
case class EnrichmentResult(
    title: String,
    author: Option[String],
    summary: String,
    documentType: String, // book|paper|tutorial|reference|guide|article|report|presentation|notes|other
    category: String,
    tags: Seq[String],
    concepts: Seq[String],
    proposedConcepts: Seq[ProposedConcept],
    confidence: Double,
    provider: String)

case class ClusterSummary(
    id: Int,
    centroid: Array[Float],
    summary: String,
    embedding: Array[Float],
    conceptId: Option[String],
    conceptConfidence: Option[Double],
    chunkCount: Long)
