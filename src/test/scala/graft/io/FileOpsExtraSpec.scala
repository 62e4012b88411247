package graft.io

import java.nio.file.Files

import graft.{PipelineError, SparkTestBase}

class FileOpsExtraSpec extends SparkTestBase {

  private def tmpDir(): String = Files.createTempDirectory("graft_fx").toString

  test("copyFolder and moveFolder replicate a tree") {
    val dir = tmpDir()
    FileOps.writeTextFile(spark, s"$dir/src/a.txt", "a")
    FileOps.writeTextFile(spark, s"$dir/src/sub/b.txt", "b")
    FileOps.copyFolder(spark, s"$dir/src", s"$dir/copy")
    assert(FileOps.readTextFile(spark, s"$dir/copy/a.txt") == "a")
    assert(FileOps.readTextFile(spark, s"$dir/copy/sub/b.txt") == "b")
    FileOps.moveFolder(spark, s"$dir/copy", s"$dir/moved")
    assert(!FileOps.fileExists(spark, s"$dir/copy"))
    assert(FileOps.readTextFile(spark, s"$dir/moved/sub/b.txt") == "b")
  }

  test("uploadFile / downloadFile between local paths and FileSystem") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Paths.get(s"$dir/local.txt"), "payload")
    FileOps.uploadFile(spark, s"$dir/local.txt", s"$dir/up/remote.txt")
    assert(FileOps.readTextFile(spark, s"$dir/up/remote.txt") == "payload")
    assertThrows[PipelineError](
      FileOps.uploadFile(spark, s"$dir/local.txt", s"$dir/up/remote.txt",
        overwrite = false))
    FileOps.downloadFile(spark, s"$dir/up/remote.txt", s"$dir/down.txt")
    assert(Files.readString(java.nio.file.Paths.get(s"$dir/down.txt")) == "payload")
    assertThrows[PipelineError](
      FileOps.downloadFile(spark, s"$dir/up/remote.txt", s"$dir/down.txt",
        overwrite = false))
  }

  test("readHeader returns only the first line") {
    val dir = tmpDir()
    FileOps.writeTextFile(spark, s"$dir/h.csv", "col_a,col_b\n1,2\n3,4")
    assert(FileOps.readHeader(spark, s"$dir/h.csv") == "col_a,col_b")
  }

  test("fileCountInFolder counts direct files only") {
    val dir = tmpDir()
    FileOps.writeTextFile(spark, s"$dir/d/one.txt", "1")
    FileOps.writeTextFile(spark, s"$dir/d/two.txt", "2")
    FileOps.writeTextFile(spark, s"$dir/d/sub/three.txt", "3")
    assert(FileOps.fileCountInFolder(spark, s"$dir/d") == 2)
  }

  test("deleteOldObjects removes files older than the cutoff") {
    val dir = tmpDir()
    FileOps.writeTextFile(spark, s"$dir/g/old.txt", "old")
    FileOps.writeTextFile(spark, s"$dir/g/new.txt", "new")
    // age the first file artificially
    new java.io.File(s"$dir/g/old.txt").setLastModified(1000L)
    val deleted = FileOps.deleteOldObjects(spark, s"$dir/g",
      cutoffMillis = System.currentTimeMillis() - 60000)
    assert(deleted.size == 1 && deleted.head.endsWith("old.txt"))
    assert(FileOps.fileExists(spark, s"$dir/g/new.txt"))
    assert(!FileOps.fileExists(spark, s"$dir/g/old.txt"))
  }

  test("walk yields os.walk-style (dir, subdirs, files) triples top-down") {
    val dir = tmpDir()
    FileOps.writeTextFile(spark, s"$dir/a.txt", "x")
    FileOps.createDir(spark, s"$dir/sub")
    FileOps.writeTextFile(spark, s"$dir/sub/b.txt", "y")
    val triples = FileOps.walk(spark, dir)
      .map { case (d, ds, fs_) => (d.split('/').last, ds.sorted, fs_.sorted) }
    assert(triples.head._2 == Seq("sub") && triples.head._3 == Seq("a.txt"))
    assert(triples.tail == Seq(("sub", Nil, Seq("b.txt"))))
  }

  test("changePermissions applies an octal mode, optionally recursively") {
    val dir = tmpDir()
    FileOps.writeTextFile(spark, s"$dir/f.txt", "x")
    FileOps.changePermissions(spark, dir, "700", recursive = true)
    val st = FileOps.fs(spark, dir)
      .getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/f.txt"))
    assert(st.getPermission.toString == "rwx------")
  }

  test("createS3Uri composes and validates; removeLeadingSlash strips") {
    assert(FileOps.removeLeadingSlash("//a/b") == "a/b")
    assert(FileOps.createS3Uri("my-bucket", "/data/x.csv") == "s3a://my-bucket/data/x.csv")
    assertThrows[graft.InvalidBucketNameError](FileOps.createS3Uri("BAD_BUCKET", "k"))
  }

  test("runSqlQuery runs SQL against the session") {
    assert(Tables.runSqlQuery(spark, "SELECT 1 + 1 AS two").head().getInt(0) == 2)
  }
}

class LogInitSpec extends SparkTestBase {
  import graft.logging.Log

  test("DEV level registers between DEBUG and INFO (log4j2 ordering)") {
    assert(Log.DevLevel.intLevel() == 450)
    assert(Log.DevLevel.intLevel() < org.apache.logging.log4j.Level.DEBUG.intLevel())
    assert(Log.DevLevel.intLevel() > org.apache.logging.log4j.Level.INFO.intLevel())
  }

  test("initLoggerBasic and initLoggerAdvanced run and set levels") {
    Log.initLoggerBasic("warn")
    Log.initLoggerAdvanced("warn", Map("graft.test" -> "dev"))
    val cfg = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      .getConfiguration
    assert(cfg.getLoggerConfig("graft.test").getLevel == Log.DevLevel)
    Log.dev("dev-level message emits without error")
  }

  test("timed returns the block value; humanise formats") {
    assert(Log.timed("t")(41 + 1) == 42)
    assert(Log.humanise(0.5).endsWith("ms"))
    assert(Log.humanise(5.0).endsWith("s"))
    assert(Log.humanise(65.0).startsWith("1m"))
  }

  test("withSchemaLogging and withRowCountLogging pass the frame through") {
    import spark.implicits._
    val d = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val f = (x: org.apache.spark.sql.DataFrame) => x.filter($"id" === 1)
    val viaSchema = Log.withSchemaLogging("t")(f)(d)
    assert(viaSchema.count() == 1)
    val viaRows = Log.withRowCountLogging("t")(f)(d)
    assert(viaRows.count() == 1)
    viaRows.unpersist()
  }

  test("printFullTableAndRaiseError renders and optionally raises") {
    import spark.implicits._
    val d = Seq((1, "bad")).toDF("id", "v")
    Log.printFullTableAndRaiseError(d, "context only") // no throw
    assertThrows[graft.PipelineError](
      Log.printFullTableAndRaiseError(d, "fatal", stopPipeline = true))
  }

  test("withWarning wraps a function and still applies it") {
    val f = Log.withWarning[Int, Int]("beware")(_ + 1)
    assert(f(41) == 42)
  }

  test("cacheTimeDf caches and counts") {
    import spark.implicits._
    val d = Seq(1, 2, 3).toDF("x")
    Log.cacheTimeDf(d)
    assert(d.storageLevel.useMemory)
    d.unpersist()
  }
}
