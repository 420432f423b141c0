package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Gate-output-schema contract (r15 VERDICT wrong #2).
  *
  * The driver's correctness harness compares every `SparkEntry.queries`
  * result to its DuckDB oracle by sorting/factorizing the pandas frame
  * column-by-column — a top-level array/map/struct column is unhashable
  * there and errs the gate even when the values are identical (the
  * `pipeline_bpe_encode` casualty in CORRECTNESS_r15.json). This spec
  * pins the rule structurally: every gate row's output schema must be
  * flat, AtomicType-only. A future row that genuinely needs a nested
  * top-level column must instead fold it to a scalar projection
  * (array_join / to_json / element aggregation — the discipline every
  * other row already follows, e.g. sketch_approx_percentile_array), or
  * be added to the documented allowlist below with a rationale.
  */
class GateSchemaSpec extends AnyFunSuite with SparkFixture with Matchers {

  /** Rows permitted a non-atomic top-level column. Empty by design —
    * any addition needs a written rationale AND driver-gate evidence
    * that the harness can hash the type. */
  private val allowlist: Set[String] = Set.empty

  // NullType never appears either: the oracle compare needs a concrete
  // dtype on both sides. CalendarInterval / UDTs are equally
  // non-hashable driver-side.
  private def driverHashable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType   => false
    case NullType | CalendarIntervalType             => false
    case _: UserDefinedType[_]                       => false
    case _                                           => true
  }

  test("every gate row's output schema is flat AtomicType-only") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if allowlist(name) => Nil
      case (name, build) =>
        // analysis only — .schema resolves the plan without running a job
        val bad = build(spark, sfDir).schema.fields
          .filterNot(f => driverHashable(f.dataType))
        if (bad.isEmpty) Nil
        else Seq(s"$name: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    withClue(
      "non-scalar top-level gate columns (fold to array_join/to_json " +
        "or allowlist with rationale):\n" + offenders.mkString("\n")) {
      offenders shouldBe empty
    }
  }
}
