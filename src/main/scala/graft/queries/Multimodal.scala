package graft.queries
import graft.{QueryDef, QueryGroup}
object Multimodal extends QueryGroup {
  override def defs: Map[String, QueryDef] = Map()
}
