package graft.queries
import graft.{QueryDef, QueryGroup}
object Collections extends QueryGroup {
  override def defs: Map[String, QueryDef] = Map()
}
