package graft.model

/** Enum-like string domains + validation clamps of the enrichment
  * result (reference: scripts/llm_enricher.py:179-195). Pure
  * functions — unit-testable without Spark; the same logic is also
  * expressible as a `when(col.isin(...))` column expression.
  */
object Domains {
  val Error = "Erro"

  val sentiments: Seq[String] = Seq("Positiva", "Negativa", "Neutra")

  /** 12 categories (reference: scripts/llm_enricher.py:186-188). */
  val categories: Seq[String] = Seq(
    "Política", "Economia", "Esportes", "Tecnologia", "Cultura",
    "Saúde", "Internacional", "Justiça", "Educação", "Meio Ambiente",
    "Segurança", "Outros")

  private val sentimentSet = sentiments.toSet
  private val categorySet = categories.toSet

  def clampSentiment(s: String): String =
    if (s != null && sentimentSet(s.trim)) s.trim else Error

  def clampCategory(c: String): String =
    if (c != null && categorySet(c.trim)) c.trim else Error

  /** Confidence clamped to [0,1], else 0.0
    * (reference: scripts/llm_enricher.py:194-195). */
  def clampConfidence(c: Double): Double =
    if (c.isNaN || c < 0.0 || c > 1.0) 0.0 else c
}
