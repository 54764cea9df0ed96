package graft

/** The full query catalog: every implemented operator surfaces here as a
  * named query (SURVEY.md §2 inventory). Assembled from per-domain modules.
  */
object Catalog {
  def all: Seq[QueryDef] =
    operators.Relational.entries ++
      operators.Events.entries ++
      operators.Documents.entries ++
      operators.Embeddings.entries ++
      operators.Multimodal.entries

  lazy val byName: Map[String, QueryDef] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in catalog")
    m
  }
}
