package graft.io

import java.nio.file.Files

import graft.{InvalidBucketNameError, InvalidS3FilePathError, PipelineError, SparkTestBase}

class FileOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_fileops").toString

  test("write/read/exists/size/delete round-trip on local FileSystem") {
    val dir = tmpDir()
    val p = s"$dir/hello.txt"
    FileOps.writeTextFile(spark, p, "hello world")
    assert(FileOps.fileExists(spark, p))
    assert(FileOps.readTextFile(spark, p) == "hello world")
    assert(FileOps.fileSize(spark, p) == 11)
    assert(FileOps.deleteFile(spark, p))
    assert(!FileOps.fileExists(spark, p))
  }

  test("isDirectory, lastModified, renameFile") {
    val dir = tmpDir()
    FileOps.writeTextFile(spark, s"$dir/f.txt", "x")
    assert(FileOps.isDirectory(spark, dir))
    assert(!FileOps.isDirectory(spark, s"$dir/f.txt"))
    assert(!FileOps.isDirectory(spark, s"$dir/nope"))
    assert(FileOps.lastModified(spark, s"$dir/f.txt") > 0)
    assert(FileOps.renameFile(spark, s"$dir/f.txt", s"$dir/g.txt"))
    assert(FileOps.fileExists(spark, s"$dir/g.txt"))
  }

  test("copyFile and moveFile") {
    val dir = tmpDir()
    FileOps.writeTextFile(spark, s"$dir/a.txt", "data")
    FileOps.copyFile(spark, s"$dir/a.txt", s"$dir/b.txt")
    assert(FileOps.readTextFile(spark, s"$dir/b.txt") == "data")
    assert(FileOps.fileExists(spark, s"$dir/a.txt"))
    FileOps.moveFile(spark, s"$dir/a.txt", s"$dir/c.txt")
    assert(!FileOps.fileExists(spark, s"$dir/a.txt"))
    assert(FileOps.readTextFile(spark, s"$dir/c.txt") == "data")
  }

  test("listDir and walkFiles") {
    val dir = tmpDir()
    FileOps.writeTextFile(spark, s"$dir/one.txt", "1")
    FileOps.createDir(spark, s"$dir/sub")
    FileOps.writeTextFile(spark, s"$dir/sub/two.txt", "2")
    assert(FileOps.listDir(spark, dir).size == 2)
    val walked = FileOps.walkFiles(spark, dir)
    assert(walked.size == 2 && walked.exists(_.endsWith("two.txt")))
  }

  test("fileDigest computes stable md5") {
    val dir = tmpDir()
    FileOps.writeTextFile(spark, s"$dir/d.txt", "abc")
    assert(FileOps.fileDigest(spark, s"$dir/d.txt") ==
      "900150983cd24fb0d6963f7d28e17f72")
  }

  test("validateBucketName enforces S3 rules") {
    assert(FileOps.validateBucketName("my-bucket.01") == "my-bucket.01")
    assertThrows[InvalidBucketNameError](FileOps.validateBucketName("ab"))
    assertThrows[InvalidBucketNameError](FileOps.validateBucketName("Has-Upper"))
    assertThrows[InvalidBucketNameError](FileOps.validateBucketName("double..dot"))
    assertThrows[InvalidBucketNameError](FileOps.validateBucketName("-leading"))
    assertThrows[InvalidBucketNameError](FileOps.validateBucketName("10.1.2.3"))
  }

  test("validateS3FilePath and splitS3Uri") {
    assert(FileOps.validateS3FilePath("path/to/file.csv") == "path/to/file.csv")
    assertThrows[InvalidS3FilePathError](FileOps.validateS3FilePath("/leading"))
    assertThrows[InvalidS3FilePathError](FileOps.validateS3FilePath("a//b"))
    assert(FileOps.splitS3Uri("s3a://bucket/key/file.txt") == ("bucket", "key/file.txt"))
    assertThrows[InvalidS3FilePathError](FileOps.splitS3Uri("not-a-uri"))
  }

  test("saveSingleCsv writes exactly one file with header") {
    val dir = tmpDir()
    val target = s"$dir/out.csv"
    FileOps.saveSingleCsv(spark, Seq((1, "a"), (2, "b")).toDF("id", "name"), target)
    val content = FileOps.readTextFile(spark, target)
    assert(content.startsWith("id,name"))
    assert(content.linesIterator.size == 3)
  }

  test("saveSingleCsv overwrite=false on existing target raises instead of silently losing data") {
    // regression: rename() returns false, round-1 code discarded the CSV (ADVICE #2)
    val dir = tmpDir()
    val target = s"$dir/out.csv"
    FileOps.writeTextFile(spark, target, "pre-existing")
    assertThrows[PipelineError](
      FileOps.saveSingleCsv(spark, Seq((1, "a")).toDF("id", "name"), target,
        overwrite = false))
    assert(FileOps.readTextFile(spark, target) == "pre-existing")
  }

  test("zipFolder zips a directory tree") {
    // plain-nio writes: the Hadoop local FS would add .crc siblings
    val dir = tmpDir()
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/src/sub"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/src/a.txt"), "aaa")
    Files.writeString(java.nio.file.Paths.get(s"$dir/src/sub/b.txt"), "bbb")
    val zipPath = s"$dir/out.zip"
    FileOps.zipFolder(s"$dir/src", zipPath)
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      val names = zf.entries().asIterator()
      val set = scala.jdk.CollectionConverters.IteratorHasAsScala(names)
        .asScala.map(_.getName).toSet
      assert(set == Set("a.txt", "sub/b.txt"))
    } finally zf.close()
  }

  test("zipDirectoryToRemote streams a FileSystem dir into a FileSystem zip") {
    // both ends through the Hadoop FS (file:// stands in for s3a/gs) —
    // remote-dir -> remote-zip with no local staging dir in between
    val dir = tmpDir()
    FileOps.writeTextFile(spark, s"$dir/src/a.txt", "alpha")
    FileOps.writeTextFile(spark, s"$dir/src/sub/b.txt", "beta")
    val zipPath = s"$dir/out/archive.zip"
    FileOps.zipDirectoryToRemote(spark, s"$dir/src", zipPath)
    assert(FileOps.fileExists(spark, zipPath))
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      val entries = scala.jdk.CollectionConverters.IteratorHasAsScala(
        zf.entries().asIterator()).asScala.map(_.getName).toSet
      // the Hadoop RawLocalFileSystem writes .crc siblings; real object
      // stores don't — accept them but require the payload entries
      assert(Set("a.txt", "sub/b.txt").subsetOf(entries.filterNot(_.contains(".crc"))))
      def read(name: String): String = {
        val in = zf.getInputStream(zf.getEntry(name))
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      assert(read("a.txt") == "alpha" && read("sub/b.txt") == "beta")
    } finally zf.close()
  }
}
