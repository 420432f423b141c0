package graft.queries
import graft.{QueryDef, QueryGroup}
object Sketches extends QueryGroup {
  override def defs: Map[String, QueryDef] = Map()
}
