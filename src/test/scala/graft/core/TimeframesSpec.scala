package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TimeframesSpec extends AnyFunSuite {
  test("toMillis parses both reference spellings") {
    assert(Timeframes.toMillis("1m") == 60000L)
    assert(Timeframes.toMillis("15min") == 900000L)
    assert(Timeframes.toMillis("1h") == 3600000L)
    assert(Timeframes.toMillis("4h") == 14400000L)
    assert(Timeframes.toMillis("1d") == 86400000L)
    assert(Timeframes.toMillis("30s") == 30000L)
  }

  test("toMillis rejects junk") {
    intercept[IllegalArgumentException](Timeframes.toMillis("tick"))
    intercept[IllegalArgumentException](Timeframes.toMillis(""))
  }

  test("toSparkInterval") {
    assert(Timeframes.toSparkInterval("15min") == "15 minutes")
    assert(Timeframes.toSparkInterval("1h") == "1 hours")
    assert(Timeframes.toSparkInterval("2mo") == "60 days")
  }

  test("canonical matches the reference's 15min→15m remap") {
    assert(Timeframes.canonical("15min") == "15m")
    assert(Timeframes.canonical("1h") == "1h")
  }

  test("symbol sanitizer uppercases and maps /: and space to _") {
    assert(Symbols.sanitize("btc/usdt") == "BTC_USDT")
    assert(Symbols.sanitize("BTC USDT:perp") == "BTC_USDT_PERP")
  }
}
