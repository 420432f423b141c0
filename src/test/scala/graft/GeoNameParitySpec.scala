package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.scalatest.funsuite.AnyFunSuite

/** Name-surface parity against the reference's geospatial catalog.
  *
  * The list below is every `@ScalarFunction`/`@AggregationFunction` name
  * annotated in presto-geospatial (GeoFunctions.java, BingTileFunctions
  * .java, SpatialPartitioningAggregateFunction.java, GeometryUnionAgg
  * .java, ConvexHullAggregation.java). Presto resolves identifiers
  * case-insensitively, so the SQL-surface name of `ST_IsEmpty` is the
  * case-collapsed `st_isempty` — this spec asserts exactly those
  * spellings resolve, which is what a Presto user's query text needs.
  * (The engine additionally registers readability snake_case spellings
  * like `st_is_empty`; those are extras, not the parity surface.)
  */
class GeoNameParitySpec extends AnyFunSuite with SparkFixture {

  private val referenceNames: Seq[String] = Seq(
    // GeoFunctions.java:136-1119
    "ST_Area", "ST_AsBinary", "ST_AsText", "ST_Boundary", "ST_Buffer",
    "ST_Centroid", "ST_Contains", "ST_ConvexHull", "ST_CoordDim",
    "ST_Crosses", "ST_Difference", "ST_Dimension", "ST_Disjoint",
    "ST_Distance", "ST_EndPoint", "ST_Envelope", "ST_EnvelopeAsPts",
    "ST_Equals", "ST_ExteriorRing", "ST_GeomFromBinary", "ST_Geometries",
    "ST_GeometryFromText", "ST_GeometryN", "ST_GeometryType",
    "ST_InteriorRingN", "ST_InteriorRings", "ST_Intersection",
    "ST_Intersects", "ST_IsClosed", "ST_IsEmpty", "ST_IsRing",
    "ST_IsSimple", "ST_IsValid", "ST_Length", "ST_LineFromText",
    "ST_LineString", "ST_MultiPoint", "ST_NumGeometries",
    "ST_NumInteriorRing", "ST_NumPoints", "ST_Overlaps", "ST_Point",
    "ST_PointN", "ST_Polygon", "ST_Relate", "ST_StartPoint",
    "ST_SymDifference", "ST_Touches", "ST_Union", "ST_Within",
    "ST_X", "ST_XMax", "ST_XMin", "ST_Y", "ST_YMax", "ST_YMin",
    // GeoFunctions.java misc scalars
    "geometry_invalid_reason", "geometry_union", "line_locate_point",
    "simplify_geometry", "geometry_to_bing_tiles",
    // BingTileFunctions.java
    "bing_tile", "bing_tile_at", "bing_tile_coordinates",
    "bing_tile_polygon", "bing_tile_quadkey", "bing_tile_zoom_level",
    "bing_tiles_around",
    // aggregates + partitioning
    "convex_hull_agg", "geometry_union_agg",
    "spatial_partitioning", "spatial_partitions")

  test("every reference geospatial name resolves under its case-collapsed spelling") {
    val catalog = spark.sessionState.catalog
    val missing = referenceNames.filterNot { refName =>
      val collapsed = refName.toLowerCase
      try { catalog.lookupFunctionInfo(FunctionIdentifier(collapsed)); true }
      catch { case _: Exception => false }
    }
    assert(missing.isEmpty,
      s"reference geo names that do not resolve: ${missing.mkString(", ")}")
  }

  test("aliased names compute the same values as the snake_case spellings") {
    val rows = spark.sql(
      """SELECT
        |  st_isempty('POLYGON EMPTY')           = st_is_empty('POLYGON EMPTY')          AS a,
        |  st_numpoints('LINESTRING (0 0, 1 1)') = st_npoints('LINESTRING (0 0, 1 1)')   AS b,
        |  st_geometryfromtext('POINT (1 2)')    = st_geometry_from_text('POINT (1 2)')  AS c,
        |  st_geometrytype('POINT (1 2)')        = st_geometry_type('POINT (1 2)')       AS d,
        |  st_exteriorring('POLYGON ((0 0, 2 0, 2 2, 0 0))')
        |    = st_exterior_ring('POLYGON ((0 0, 2 0, 2 2, 0 0))')                        AS e,
        |  st_numgeometries('MULTIPOINT (1 1, 2 2)')
        |    = st_num_geometries('MULTIPOINT (1 1, 2 2)')                                AS f,
        |  st_isvalid('POLYGON ((0 0, 2 0, 2 2, 0 0))')
        |    = st_is_valid('POLYGON ((0 0, 2 0, 2 2, 0 0))')                             AS g,
        |  st_symdifference('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))',
        |                   'POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))')
        |    = st_sym_difference('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))',
        |                        'POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))')                  AS h,
        |  st_coorddim('POINT (1 2)') = st_coord_dim('POINT (1 2)')                      AS i,
        |  st_isring('LINESTRING (0 0, 1 0, 1 1, 0 0)')
        |    = st_is_ring('LINESTRING (0 0, 1 0, 1 1, 0 0)')                             AS j
        |""".stripMargin).collect()
    val r = rows.head
    (0 until r.length).foreach { i =>
      assert(r.getBoolean(i), s"alias/original mismatch at column $i")
    }
  }
}
