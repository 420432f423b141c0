package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Concat, ExprId, Expression, Literal, RegExpExtract}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Optimizer rule cancelling the WKT point codec round-trip.
  *
  * The geometry surface models POINT as WKT text (GeoCatalog macros):
  * `st_point(x, y)` formats `concat('POINT (', x, ' ', y, ')')` and
  * `st_x`/`st_y` parse it back with `regexp_extract`. When a query
  * composes them — every `st_distance(st_point(a, b), st_point(c, d))`
  * refine step in a spatial join does — the inlined plan formats two
  * doubles to text and regex-parses them back PER ROW. Catalyst cannot
  * see through the regex, so this rule restores the raw coordinate:
  *
  * `cast(regexp_extract(<st_point form>, <x-pat>, 1) AS DOUBLE)` → `x`
  *
  * Two shapes are handled: the point expression inline under the
  * extract, and the shape SQL-macro inlining actually produces — the
  * point bound to an Alias in the child Project (CollapseProject keeps
  * it there because the concat is non-cheap and referenced four
  * times). In the alias case the substituted coordinates are
  * passthrough columns of the same Project, and codec aliases left
  * dead by the substitution are pruned.
  *
  * Safe because Spark's double→string cast is the shortest
  * round-trippable form (Java Double.toString semantics), so
  * format-then-parse is the identity, including NaN/Infinity/-0.0 and
  * null (null coordinate nulls the concat, the extract, and the cast
  * alike). Measured on the KDB-partitioned distance join at sf0.1:
  * 5.9 s → 1.4 s (the refine step dominates; see PlanShapeSpec).
  */
object PointCodecSimplification extends Rule[LogicalPlan] {
  private val XPattern = "POINT \\(([^ ]+) "
  private val YPattern = " ([^ )]+)\\)"

  private object Str {
    def unapply(e: Expression): Option[String] = e match {
      case Literal(v, StringType) if v != null => Some(v.toString)
      case _ => None
    }
  }

  /** concat('POINT (', cast(x AS STRING), ' ', cast(y AS STRING), ')') */
  private def pointParts(e: Expression): Option[(Expression, Expression)] = e match {
    case Concat(Seq(Str("POINT ("), Cast(x, StringType, _, _), Str(" "),
        Cast(y, StringType, _, _), Str(")")))
        if x.dataType == DoubleType && y.dataType == DoubleType =>
      Some((x, y))
    case _ => None
  }

  private def pickCoord(parts: (Expression, Expression), pattern: String,
      orElse: Expression): Expression =
    if (pattern == XPattern) parts._1
    else if (pattern == YPattern) parts._2
    else orElse

  /** Cheap read-only gate: the rule sits in the operator-optimization
    * fixed point, so EVERY plan pays its two rewrite traversals on each
    * iteration — measured as a 1.4-1.5x tail on the big TPC-H
    * multi-join plans (r4 bench q2/q18/q22), which contain no geometry
    * at all. A codec round-trip requires a RegExpExtract whose pattern
    * is literally the st_x/st_y pattern; one allocation-free exists()
    * scan (early exit on first hit) decides whether rewriting can
    * possibly apply.
    */
  private def hasCodecExtract(plan: LogicalPlan): Boolean =
    plan.exists(_.expressions.exists(_.exists {
      case RegExpExtract(_, Literal(p, StringType), _) if p != null =>
        val s = p.toString
        s == XPattern || s == YPattern
      case _ => false
    }))

  override def apply(plan: LogicalPlan): LogicalPlan = if (!hasCodecExtract(plan)) plan else {
    // Shape 1: the st_point concat is directly under the extract.
    val inlined = plan.transformAllExpressions {
      case c @ Cast(RegExpExtract(subject, Str(pattern), Literal(1, _)),
          DoubleType, _, _) =>
        pointParts(subject).map(pickCoord(_, pattern, c)).getOrElse(c)
    }
    // Shape 2: the concat is an Alias in the child Project and the
    // extract references it. The coordinate expressions reference the
    // Project's INPUT; substitution is legal when those inputs are
    // passed through, or (parent-is-Project case) can be added as
    // passthrough columns without changing any schema above.
    inlined.transformUp {
      case u: UnaryNode if u.child.isInstanceOf[Project] =>
        val proj = u.child.asInstanceOf[Project]
        val codecAliases: Map[ExprId, (Expression, Expression)] =
          proj.projectList.flatMap {
            case a: Alias =>
              pointParts(a.child)
                .filter { case (x, y) =>
                  val refs = x.references ++ y.references
                  // visible already, or addable (only a Project parent
                  // tolerates a widened child output)
                  refs.forall(proj.outputSet.contains) ||
                    (u.isInstanceOf[Project] &&
                      refs.forall(proj.child.outputSet.contains))
                }
                .map(a.exprId -> _)
            case _ => None
          }.toMap
        if (codecAliases.isEmpty) u
        else {
          var usedParts = List.empty[(Expression, Expression)]
          val rewritten = u.mapExpressions(_.transformDown {
            case c @ Cast(RegExpExtract(ar: AttributeReference, Str(pattern),
                Literal(1, _)), DoubleType, _, _)
                if codecAliases.contains(ar.exprId) =>
              usedParts ::= codecAliases(ar.exprId)
              pickCoord(codecAliases(ar.exprId), pattern, c)
          })
          if (rewritten.fastEquals(u)) u
          else rewritten match {
            // prune codec aliases the substitution left dead and pass
            // through any coordinate columns the rewrite now needs
            case p: Project =>
              // identity by exprId — attribute object equality can
              // differ in qualifier/nullability across use sites
              val stillReferenced =
                p.expressions.flatMap(_.references).map(_.exprId).toSet
              val pruned = proj.projectList.filter {
                case a: Alias if codecAliases.contains(a.exprId) =>
                  stillReferenced.contains(a.exprId)
                case _ => true
              }
              val have = pruned.map(_.exprId).toSet
              val missing = usedParts
                .flatMap { case (x, y) => (x.references ++ y.references).toSeq }
                .groupBy(_.exprId).map(_._2.head).toSeq
                .filterNot(a => have.contains(a.exprId))
              p.withNewChildren(Seq(proj.copy(projectList = pruned ++ missing)))
            case other => other
          }
        }
    }
  }
}
