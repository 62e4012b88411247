package graft.observability

import org.scalatest.funsuite.AnyFunSuite

/** Fixture mirrors the reference doctest (parser.py:106-140) and the
  * cost example (ec2_pricing.py:80-115). */
class EventLogSpec extends AnyFunSuite {

  private val fixture = Seq(
    """{"Event":"SparkListenerApplicationStart","Timestamp":1739793526775,"App Name":"ExamplePipeline"}""",
    """{"Event":"SparkListenerExecutorAdded","Executor Info":{"Total Cores":4}}""",
    """{"Event":"SparkListenerExecutorAdded","Executor Info":{"Total Cores":4}}""",
    """{"Event":"SparkListenerStageSubmitted","Properties":{"spark.executor.memory":"4g","spark.yarn.executor.memoryOverhead":"2g","spark.executor.cores":"4"}}""",
    """{"Event":"SparkListenerApplicationEnd","Timestamp":1739793626775}""")

  test("parseEvents folds the reference summary metrics") {
    val s = EventLogParser.parseEvents(fixture.iterator)
    assert(s.pipelineName.contains("ExamplePipeline"))
    assert(s.startTime.contains(1739793526775L))
    assert(s.endTime.contains(1739793626775L))
    assert(s.totalTimeMs == 100000L)
    assert(s.totalExecutors == 2)
    assert(s.totalCores == 8)             // 4 cores/executor × 2 executors
    assert(s.memoryPerExecutorGb == 6)    // 4g + 2g overhead
    assert(s.totalMemoryGb == 12)
  }

  test("parseEvents requires start and end times") {
    assertThrows[IllegalArgumentException](
      EventLogParser.parseEvents(Seq(fixture.head).iterator))
  }

  test("convertValue units match reference doctests") {
    assert(EventLogParser.convertValue(60000, "ms") == 1.0)
    assert(EventLogParser.convertValue(6e10, "ns") == 1.0)
    assert(EventLogParser.convertValue(1048576, "bytes") == 1.0)
    assert(EventLogParser.convertValue(5, "count") == 5.0)
  }

  test("extractInstanceSpecs derives vcpu/memory/family from the type name") {
    val m5 = Ec2Pricing.extractInstanceSpecs("m5.2xlarge").get
    assert(m5.vcpu == 8 && m5.memoryGb == 32 && m5.family == "General Purpose")
    assert(math.abs(m5.ec2Price - 0.384) < 1e-9) // public on-demand rate
    val r5 = Ec2Pricing.extractInstanceSpecs("r5a.xlarge").get
    assert(r5.vcpu == 4 && r5.memoryGb == 32 && r5.family == "Memory optimised")
    assert(Ec2Pricing.extractInstanceSpecs("not-an-instance").isEmpty)
    assert(Ec2Pricing.extractInstanceSpecs("zz9.mega").isEmpty)
  }

  test("emrSurcharge adds the flat 25%") {
    assert(Ec2Pricing.emrSurcharge(0.384) == 0.48)
  }

  test("matchingInstance returns the cheapest fit; impossible asks raise") {
    val inst = Ec2Pricing.matchingInstance(memoryGb = 12, cores = 8)
    assert(inst.memoryGb >= 12 && inst.vcpu >= 8)
    // cheapest valid must not be beaten by any other valid entry
    val cheaper = Ec2Pricing.catalog
      .filter(i => i.memoryGb >= 12 && i.vcpu >= 8 && i.ec2Price < inst.ec2Price)
    assert(cheaper.isEmpty)
    assertThrows[IllegalArgumentException](
      Ec2Pricing.matchingInstance(memoryGb = 100000, cores = 8))
  }

  test("pipelineCost composes runtime × hourly with surcharge split") {
    val summary = EventLogParser.parseEvents(fixture.iterator)
    val report = Ec2Pricing.pipelineCost(summary)
    assert(report.runtimeMs == 100000L)
    assert(math.abs(report.runtimeHours - 0.0278) < 1e-3)
    assert(report.surchargeApplied)
    assert(math.abs(report.pipelineCost - (report.ec2Cost + report.emrSurcharge)) < 1e-3)
    val noSurcharge = Ec2Pricing.pipelineCost(summary, applyEmrSurcharge = false)
    assert(noSurcharge.pipelineCost == noSurcharge.ec2Cost)
  }

  test("loadRates reads a user rates CSV and drives cheapest-fit matching") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("loadrates-test").getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("rates").toFile
    val f = new java.io.File(dir, "rates.csv")
    java.nio.file.Files.writeString(f.toPath,
      """instance_type,hourly_usd,vcpu,memory_gb
        |m5.xlarge,0.0100,,
        |r5.2xlarge,9.9900,,
        |custom1.big,0.0050,8,64
        |""".stripMargin)
    val rates = Ec2Pricing.loadRates(spark, f.getAbsolutePath)
    assert(rates.map(_.instanceType) == Seq("custom1.big", "m5.xlarge", "r5.2xlarge"))
    // inferred specs keep the name-derived vcpu/memory, price overridden
    val m5 = rates.find(_.instanceType == "m5.xlarge").get
    assert(m5.vcpu == 4 && m5.memoryGb == 16 && m5.ec2Price == 0.01)
    // explicit specs win for un-inferable names
    val custom = rates.find(_.instanceType == "custom1.big").get
    assert(custom.vcpu == 8 && custom.memoryGb == 64 && custom.family == "Custom")
    // the custom catalog is honored end-to-end by cheapest-fit matching
    assert(Ec2Pricing.matchingInstance(memoryGb = 32, cores = 6, rates)
      .instanceType == "custom1.big")
    val summary = EventLogParser.parseEvents(fixture.iterator)
    val report = Ec2Pricing.pipelineCost(summary, instances = rates)
    assert(rates.map(_.instanceType).contains(report.instance.instanceType))
    // an un-inferable row without explicit specs fails loudly
    val bad = new java.io.File(dir, "bad.csv")
    java.nio.file.Files.writeString(bad.toPath,
      "instance_type,hourly_usd\nmystery9.mega,1.0\n")
    assertThrows[IllegalArgumentException](
      Ec2Pricing.loadRates(spark, bad.getAbsolutePath))
  }

  test("loadRates: extensionless parquet dir, fractional specs, explicit format") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("loadrates-test").getOrCreate()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rates2").toFile
    // extensionless parquet DIRECTORY must be read as parquet (never
    // silently mis-parsed as CSV) by the try-parquet-first inference
    val pq = new java.io.File(dir, "rates_dir").getAbsolutePath
    Seq(("custom1.big", 0.005, 8, 64))
      .toDF("instance_type", "hourly_usd", "vcpu", "memory_gb")
      .coalesce(1).write.parquet(pq)
    val inferred = Ec2Pricing.loadRates(spark, pq)
    assert(inferred.map(_.instanceType) == Seq("custom1.big"))
    assert(inferred.head.vcpu == 8 && inferred.head.memoryGb == 64)
    assert(Ec2Pricing.loadRates(spark, pq, format = "parquet") == inferred)
    // fractional spec strings ("8.0"/"64.0") parse via Double
    val f = new java.io.File(dir, "frac.csv")
    java.nio.file.Files.writeString(f.toPath,
      "instance_type,hourly_usd,vcpu,memory_gb\ncustom2.big,0.01,8.0,64.0\n")
    val frac = Ec2Pricing.loadRates(spark, f.getAbsolutePath)
    assert(frac.head.vcpu == 8 && frac.head.memoryGb == 64)
    // junk specs fail with a descriptive error, not a bare NumberFormat
    val junk = new java.io.File(dir, "junk.csv")
    java.nio.file.Files.writeString(junk.toPath,
      "instance_type,hourly_usd,vcpu,memory_gb\ncustom3.big,0.01,eight,64\n")
    val e = intercept[IllegalArgumentException](
      Ec2Pricing.loadRates(spark, junk.getAbsolutePath))
    assert(e.getMessage.contains("vcpu") && e.getMessage.contains("custom3.big"))
    // explicit csv format still honored; bad format name refused
    assert(Ec2Pricing.loadRates(spark, f.getAbsolutePath, format = "csv") == frac)
    assertThrows[IllegalArgumentException](
      Ec2Pricing.loadRates(spark, f.getAbsolutePath, format = "orc"))
  }
}
