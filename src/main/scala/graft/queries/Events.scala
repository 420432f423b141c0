package graft.queries
import graft.{QueryDef, QueryGroup}
object Events extends QueryGroup {
  override def defs: Map[String, QueryDef] = Map()
}
