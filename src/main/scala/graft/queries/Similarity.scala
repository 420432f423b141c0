package graft.queries
import graft.{QueryDef, QueryGroup}
object Similarity extends QueryGroup {
  override def defs: Map[String, QueryDef] = Map()
}
