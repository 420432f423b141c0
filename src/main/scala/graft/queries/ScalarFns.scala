package graft.queries
import graft.{QueryDef, QueryGroup}
object ScalarFns extends QueryGroup {
  override def defs: Map[String, QueryDef] = Map()
}
