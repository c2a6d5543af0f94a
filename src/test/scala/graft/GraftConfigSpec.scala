package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {
  test("defaults mirror the reference's config.toml values") {
    val c = GraftConfig.default
    assert(c.resolutions === Seq((200, 150), (120, 90)))
    assert(c.daemonTtlSeconds === 21600)
    assert(c.daemonUpdatePercent === 20)
    assert(c.fetchTimeoutMs === 15000)
    assert(c.maxFilesPerTrigger === 1)
    assert(c.maxPriority === 10)
  }

  test("fromMap parses overrides and defaults the rest") {
    val c = GraftConfig.fromMap(Map(
      "resolutions" -> "64x48; 32x24",
      "daemon_update_percent" -> "50",
      "bogus_key" -> "ignored"))
    assert(c.resolutions === Seq((64, 48), (32, 24)))
    assert(c.daemonUpdatePercent === 50)
    assert(c.daemonTtlSeconds === 21600)
  }
}
