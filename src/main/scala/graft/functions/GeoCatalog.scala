package graft.functions

import org.apache.spark.sql.SparkSession

/** Minimal geospatial ST_* tier (reference: presto-geospatial/.../
  * GeoFunctions.java — planar geometry over WKT). Round-2 decision per
  * SURVEY §7.2: implement the core point/polygon surface as SQL macros
  * (analyzer-inlined, fully codegen'd — no geometry library, no UDF);
  * the 53 remaining ST_ functions stay declared out of scope.
  *
  * Geometries are WKT strings ('POINT (x y)',
  * 'POLYGON ((x1 y1, …, x1 y1))', single ring, planar coordinates —
  * Presto's geometry type is also WKT-constructed). The let-binding
  * trick `transform(array(parsed), p -> body)[0]` evaluates the parse
  * exactly once per row despite macro substitution being textual.
  *
  * st_contains uses ray casting (odd crossings = inside; boundary
  * points are implementation-defined, as in any float geometry);
  * st_area is the shoelace formula. Both are O(ring length) per row
  * and stay inside whole-stage codegen.
  */
object GeoCatalog {

  /** Expression fragment: WKT polygon ring → array<struct<x,y>>. */
  private def ring(poly: String): String =
    s"""transform(split(regexp_extract($poly, '\\\\(\\\\(([^)]+)\\\\)\\\\)', 1), ','),
       |  c -> named_struct(
       |    'x', cast(split(trim(c), ' ')[0] AS DOUBLE),
       |    'y', cast(split(trim(c), ' ')[1] AS DOUBLE)))""".stripMargin

  private val macros: Seq[(String, String, String)] = Seq(
    ("st_point", "(x DOUBLE, y DOUBLE) RETURNS STRING",
      "concat('POINT (', cast(x AS STRING), ' ', cast(y AS STRING), ')')"),
    ("st_x", "(p STRING) RETURNS DOUBLE",
      "cast(regexp_extract(p, 'POINT \\\\(([^ ]+) ', 1) AS DOUBLE)"),
    ("st_y", "(p STRING) RETURNS DOUBLE",
      "cast(regexp_extract(p, ' ([^ )]+)\\\\)', 1) AS DOUBLE)"),
    ("st_distance", "(a STRING, b STRING) RETURNS DOUBLE",
      "sqrt(power(st_x(a) - st_x(b), 2) + power(st_y(a) - st_y(b), 2))"),
    ("st_area", "(poly STRING) RETURNS DOUBLE",
      s"""transform(array(${ring("poly")}), r ->
         |  abs(aggregate(sequence(0, size(r) - 2), 0.0D,
         |    (acc, i) -> acc + r[i].x * r[i + 1].y - r[i + 1].x * r[i].y)) / 2.0D
         |)[0]""".stripMargin),
    ("st_contains", "(poly STRING, pt STRING) RETURNS BOOLEAN",
      s"""transform(array(named_struct(
         |    'r', ${ring("poly")}, 'px', st_x(pt), 'py', st_y(pt))), e ->
         |  (aggregate(sequence(0, size(e.r) - 2), 0,
         |    (acc, i) -> acc + IF(
         |      ((e.r[i].y > e.py) != (e.r[i + 1].y > e.py)) AND
         |      (e.px < (e.r[i + 1].x - e.r[i].x) * (e.py - e.r[i].y)
         |        / (e.r[i + 1].y - e.r[i].y) + e.r[i].x), 1, 0)) % 2) = 1
         |)[0]""".stripMargin),
    ("st_within", "(pt STRING, poly STRING) RETURNS BOOLEAN",
      "st_contains(poly, pt)")
  )

  def register(spark: SparkSession): Unit =
    macros.foreach { case (name, sig, body) =>
      spark.sql(s"CREATE OR REPLACE TEMPORARY FUNCTION $name $sig RETURN $body")
    }
}
