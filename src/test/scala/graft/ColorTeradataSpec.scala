package graft

import graft.functions.{ColorOps, TeradataDatetime}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Reference-vector tests for the color tier (ColorFunctions.java) and
  * the Teradata compat tier (presto-teradata-functions). */
class ColorTeradataSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("color parse: #rgb css short form replicates nibbles") {
    ColorOps.parse("#fff") shouldBe 0xffffffL
    ColorOps.parse("#f00") shouldBe 0xff0000L
    ColorOps.parse("#4a4") shouldBe ((0x44L << 16) | (0xaaL << 8) | 0x44L)
  }

  test("color parse: system colors are -(index+1)") {
    ColorOps.parse("black") shouldBe -1L
    ColorOps.parse("red") shouldBe -2L
    ColorOps.parse("CYAN") shouldBe -7L
    an[IllegalArgumentException] should be thrownBy ColorOps.parse("mauve")
    // 6-digit hex is NOT the css short form — Presto rejects it too
    an[IllegalArgumentException] should be thrownBy ColorOps.parse("#ff0000")
  }

  test("rgb packs and range-checks") {
    ColorOps.rgb(255, 0, 0) shouldBe 0xff0000L
    ColorOps.rgb(1, 2, 3) shouldBe 0x010203L
    an[IllegalArgumentException] should be thrownBy ColorOps.rgb(256, 0, 0)
    an[IllegalArgumentException] should be thrownBy ColorOps.rgb(0, -1, 0)
  }

  test("interpolate endpoints are exact (HSB round-trip identity)") {
    for (c <- Seq(0xff0000L, 0x00ff00L, 0x123456L, 0x44aa44L, 0L, 0xffffffL)) {
      ColorOps.interpolate(0.0, c, 0xffffffL - c) shouldBe c
      ColorOps.interpolate(1.0, 0xffffffL - c, c) shouldBe c
      // equal endpoints: every fraction returns the color itself
      ColorOps.interpolate(0.37, c, c) shouldBe c
    }
    // fraction clamps to [0, 1]
    ColorOps.interpolate(-5.0, 0x123456L, 0xffffffL) shouldBe 0x123456L
    ColorOps.interpolate(9.0, 0L, 0x123456L) shouldBe 0x123456L
  }

  test("ansi escape: rgb rescales to the 6x6x6 cube, system colors raw") {
    ColorOps.ansiEscape(0xff0000L) shouldBe "\u001b[38;5;196m"
    ColorOps.ansiEscape(0x00ff00L) shouldBe "\u001b[38;5;46m"
    ColorOps.ansiEscape(-1L) shouldBe "\u001b[38;5;0m" // black
    ColorOps.ansiEscape(-8L) shouldBe "\u001b[38;5;7m" // white
  }

  test("bar clamps, gradients, resets once, pads to width") {
    val full = ColorOps.bar(1.0, 4, 0xff0000L, 0xff0000L)
    full shouldBe ("\u001b[38;5;196m█" * 4) + "\u001b[0m"
    val empty = ColorOps.bar(0.0, 4, 0xff0000L, 0x00ff00L)
    empty shouldBe "\u001b[0m    "
    val half = ColorOps.bar(0.5, 4, 0xff0000L, 0xff0000L)
    half shouldBe ("\u001b[38;5;196m█" * 2) + "\u001b[0m  "
    // over-100% clamps to width
    ColorOps.bar(7.0, 3, 0xff0000L, 0xff0000L) shouldBe
      ("\u001b[38;5;196m█" * 3) + "\u001b[0m"
  }

  test("render wraps value in escape + reset") {
    ColorOps.render("hi", 0x00ff00L) shouldBe "\u001b[38;5;46mhi\u001b[0m"
  }

  test("sql surface: color/rgb/render/bar resolve and agree with ColorOps") {
    // bare decimal literals (0.5, not 0.5D) must coerce like Presto's
    // signature casts — the builders cast every numeric child
    val row = spark.sql(
      """SELECT color('#f00') AS a, rgb(18, 52, 86) AS b,
        |  color(0.5, color('#4a4'), color('#4a4')) AS c,
        |  render('x', color('blue')) AS r, render(true) AS rt,
        |  bar(0.5, 4) AS br""".stripMargin).head()
    row.getLong(0) shouldBe 0xff0000L
    row.getLong(1) shouldBe 0x123456L
    row.getLong(2) shouldBe ColorOps.parse("#4a4")
    row.getString(3) shouldBe "\u001b[38;5;4mx\u001b[0m"
    row.getString(4) shouldBe ColorOps.render("✓", -3L)
    // default bar gradient is red → green
    row.getString(5) shouldBe ColorOps.bar(0.5, 4, 0xff0000L, 0x00ff00L)
  }

  test("teradata format translation") {
    TeradataDatetime.translateFormat("yyyy-mm-dd") shouldBe "yyyy-MM-dd"
    TeradataDatetime.translateFormat("yyyy/mm/dd hh24:mi:ss") shouldBe "yyyy/MM/dd HH:mm:ss"
    TeradataDatetime.translateFormat("dd.mm.yy hh:mi") shouldBe "dd.MM.yy KK:mm"
    an[IllegalArgumentException] should be thrownBy
      TeradataDatetime.translateFormat("yyyy-qq")
  }

  test("sql surface: teradata functions") {
    val row = spark.sql(
      """SELECT index('hello world', 'wor') AS i1, index('hello', 'z') AS i0,
        |  char2hexint('AB') AS hx,
        |  teradata_to_char(timestamp'2001-08-22 03:04:05', 'yyyy/mm/dd hh24:mi:ss') AS c1,
        |  teradata_to_char(timestamp'2001-08-22 00:30:00', 'hh:mi') AS halfday,
        |  cast(teradata_to_date('1988/04/08', 'yyyy/mm/dd') AS STRING) AS d1,
        |  cast(teradata_to_timestamp('1988/04/08 02:03:04',
        |    'yyyy/mm/dd hh24:mi:ss') AS STRING) AS t1""".stripMargin).head()
    row.getLong(0) shouldBe 7L
    row.getLong(1) shouldBe 0L
    row.getString(2) shouldBe "00410042" // UTF-16BE of "AB"
    row.getString(3) shouldBe "2001/08/22 03:04:05"
    // joda hourOfHalfday renders midnight-hour as 00, not 12
    row.getString(4) shouldBe "00:30"
    row.getString(5) shouldBe "1988-04-08"
    row.getString(6) shouldBe "1988-04-08 02:03:04"
  }

  test("sql surface: features constructs the indexed feature map") {
    val row = spark.sql(
      "SELECT features(1.5D, 2.5D, 3.5D) AS f, features(9) AS f1").head()
    row.getMap[Long, Double](0) shouldBe Map(0L -> 1.5, 1L -> 2.5, 2L -> 3.5)
    row.getMap[Long, Double](1) shouldBe Map(0L -> 9.0)
  }

  test("geometry_to_bing_tiles covers the envelope tile range") {
    // bbox [10,20]x[10,20] at zoom 6: x in [33,35], y in [28,30] → 9 tiles
    val row = spark.sql(
      """SELECT geometry_to_bing_tiles(
        |  'POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))', 6) AS t""".stripMargin).head()
    val tiles = row.getSeq[String](0)
    tiles.length shouldBe 9
    tiles.foreach(_.length shouldBe 6)
    tiles.distinct.length shouldBe 9
    // a point tile cover is the single tile containing the point
    val one = spark.sql(
      """SELECT geometry_to_bing_tiles(st_point(13.0, 52.0), 8) AS t,
        |  bing_tile_at(52.0, 13.0, 8) AS at""".stripMargin).head()
    one.getSeq[String](0) shouldBe Seq(one.getString(1))
    // zoom 0 is the root tile: empty quadkey, never a sequence error
    val root = spark.sql(
      """SELECT bing_tile(0, 0, 0) AS t0,
        |  geometry_to_bing_tiles('POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))', 0)
        |    AS cover0,
        |  size(bing_tiles_around(52.0, 13.0, 0)) AS around0""".stripMargin).head()
    root.getString(0) shouldBe ""
    root.getSeq[String](1) shouldBe Seq("")
    root.getInt(2) shouldBe 1
  }
}
