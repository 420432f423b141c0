package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ORDER BY totality gate (r12; VERDICT r11 "next round" #3).
  *
  * The driver's correctness hash normalizes row order, but an
  * under-specified ORDER BY is still a latent coin flip: rows tied on
  * the sort key permute engine-dependently (observed live on
  * tpcds_q36/q67 window-rank ties and on the duplicate
  * (l_orderkey, l_linenumber) pairs the driver testdata contains).
  * This spec asserts, for every gate query whose oracle SQL carries a
  * top-level ORDER BY:
  *
  *  1. every ORDER BY key resolves to a PROJECTED column (possibly
  *     table-qualified) — a key outside the projection can't make the
  *     hashed output deterministic;
  *  2. empirically at sf0.001: rows sharing the full key tuple are
  *     identical in every projected column (ties between identical
  *     rows are harmless; ties between differing rows are not).
  *
  * scripts/order_audit.py runs the same check over the sf0.01/sf1
  * Verify dumps, where more collisions materialize.
  */
class OrderTotalitySpec extends AnyFunSuite with SparkFixture with Matchers {

  /** ORDER BY keys of the outermost query, or None. Heuristic shared
    * with scripts/order_audit.py: the last ORDER BY occurrence is
    * top-level iff no ')' follows it (subquery/OVER ones are closed). */
  private def topLevelOrderBy(sql: String): Option[Seq[String]] = {
    val i = sql.toUpperCase.lastIndexOf("ORDER BY")
    if (i < 0 || sql.substring(i).contains(")")) None
    else {
      val tail = sql.substring(i + "ORDER BY".length)
        .split("(?i)\\bLIMIT\\b")(0)
      Some(tail.split(",").toSeq.map { item =>
        item.trim
          .replaceAll("(?i)\\s+(ASC|DESC)\\b", "")
          .replaceAll("(?i)\\s+NULLS\\s+(FIRST|LAST)\\b", "")
          .trim
      })
    }
  }

  test("every ordered gate query sorts on a key total over its projection") {
    val ordered = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => topLevelOrderBy(sql).map(keys => (name, keys))
    }
    ordered.size should be > 100 // sanity: the parser finds the suite
    val bad = ordered.flatMap { case (name, rawKeys) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val cols = df.columns.toSeq
      // resolve `a.x` to projected `x`
      val keys = rawKeys.map { k =>
        val base = k.split('.').last
        if (cols.contains(base)) base else k
      }
      val unresolved = keys.filterNot(cols.contains)
      if (unresolved.nonEmpty)
        Some(s"$name: ORDER BY keys $unresolved not in projection $cols")
      else {
        // ties on the full key tuple must be identical rows
        val ties = df.dropDuplicates()
          .groupBy(keys.map(df.col): _*).count()
          .filter("count > 1").limit(3).collect()
        if (ties.nonEmpty)
          Some(s"$name: non-identical rows tied on ORDER BY " +
            s"(${keys.mkString(", ")}): ${ties.mkString("; ")}")
        else None
      }
    }
    withClue(bad.mkString("\n")) { bad shouldBe empty }
  }
}
