package graft.session

import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite {

  test("size matrix matches the reference presets") {
    assert(Sessions.Small.executorMemory == "1g" && Sessions.Small.shufflePartitions == 12)
    assert(Sessions.Medium.executorMemory == "6g" && Sessions.Medium.executorCores == 3)
    assert(Sessions.Large.executorMemory == "10g" &&
      Sessions.Large.memoryOverhead.contains("1g") &&
      Sessions.Large.shufflePartitions == 200)
    assert(Sessions.ExtraLarge.maxExecutors == 12 &&
      Sessions.ExtraLarge.memoryOverhead.contains("2g"))
  }

  test("sizeFromString parses all names, rejects unknown") {
    assert(Sessions.sizeFromString("small") == Sessions.Small)
    assert(Sessions.sizeFromString("MEDIUM") == Sessions.Medium)
    assert(Sessions.sizeFromString("extra-large") == Sessions.ExtraLarge)
    assert(Sessions.sizeFromString("xl") == Sessions.ExtraLarge)
    assertThrows[IllegalArgumentException](Sessions.sizeFromString("giant"))
  }

  test("createSparkSession applies preset + extra configs (against running session)") {
    // getOrCreate reuses the shared test session; config application is
    // verified through the builder path on the existing session conf
    val s = Sessions.createSparkSession(
      appName = "graft-test-session",
      size = Sessions.Small,
      master = Some("local[2]"),
      extraConfigs = Map("spark.graft.marker" -> "on"))
    assert(s.conf.get("spark.graft.marker") == "on")
  }

  test("stateStore knob pins the RocksDB provider conf (and rejects unknown values)") {
    val s = Sessions.createSparkSession(
      appName = "graft-test-session",
      master = Some("local[2]"),
      stateStore = "rocksdb")
    try
      assert(s.conf.get("spark.sql.streaming.stateStore.providerClass") ==
        Sessions.RocksDbProviderClass)
    finally
      // getOrCreate shares the suite-wide session: restore the default
      // provider so later streaming suites choose it deliberately
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assertThrows[IllegalArgumentException](
      Sessions.createSparkSession(stateStore = "hdfs"))
  }
}
