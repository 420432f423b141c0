package graft

import graft.functions.PrestoDatetime.translateFormat
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class PrestoDatetimeSpec extends AnyFunSuite with Matchers {
  test("core MySQL patterns translate to java.time") {
    translateFormat("%Y-%m-%d") shouldBe "yyyy-MM-dd"
    translateFormat("%H:%i:%s") shouldBe "HH:mm:ss"
    translateFormat("%d/%c/%y") shouldBe "dd/M/yy"
    translateFormat("%j") shouldBe "DDD"
    translateFormat("%T") shouldBe "HH:mm:ss"
  }

  test("literal text is quoted so pattern letters pass through") {
    translateFormat("%Y-%m-%dT%H") shouldBe "yyyy-MM-dd'T'HH"
  }

  test("%% emits a literal percent") {
    translateFormat("%Y%%") shouldBe "yyyy%"
  }

  test("month and weekday names") {
    translateFormat("%W %M %b %a") shouldBe "EEEE MMMM MMM EEE"
  }
}
