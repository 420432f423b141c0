package graft.queries
import graft.{QueryDef, QueryGroup}
object TextPipeline extends QueryGroup {
  override def defs: Map[String, QueryDef] = Map()
}
