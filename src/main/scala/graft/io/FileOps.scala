package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.security.MessageDigest
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{InvalidBucketNameError, InvalidS3FilePathError}

/** Unified file operations over org.apache.hadoop.fs.FileSystem.
  *
  * One implementation replaces the reference's three backends — boto3 S3
  * ops (rdsa_utils/cdp/helpers/s3_utils.py:43-2045), `hadoop fs`
  * subprocess HDFS ops (cdp/helpers/hdfs_utils.py:8-458) and
  * google-cloud-storage GCS ops (gcp/helpers/gcp_utils.py:102-848):
  * the FileSystem API dispatches on the path scheme (s3a://, hdfs://,
  * gs://, file://), in-process, no subprocess, no per-cloud SDK.
  */
object FileOps {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(hadoopConf(spark))

  private def hadoopConf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  def fileExists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  def isDirectory(spark: SparkSession, path: String): Boolean = {
    val f = fs(spark, path)
    f.exists(new Path(path)) && f.getFileStatus(new Path(path)).isDirectory
  }

  def fileSize(spark: SparkSession, path: String): Long =
    fs(spark, path).getFileStatus(new Path(path)).getLen

  def lastModified(spark: SparkSession, path: String): Long =
    fs(spark, path).getFileStatus(new Path(path)).getModificationTime

  def deleteFile(spark: SparkSession, path: String, recursive: Boolean = false): Boolean =
    fs(spark, path).delete(new Path(path), recursive)

  def createDir(spark: SparkSession, path: String): Boolean =
    fs(spark, path).mkdirs(new Path(path))

  def renameFile(spark: SparkSession, from: String, to: String): Boolean =
    fs(spark, from).rename(new Path(from), new Path(to))

  def copyFile(spark: SparkSession, from: String, to: String): Unit = {
    val srcFs = fs(spark, from)
    val dstFs = fs(spark, to)
    val in = srcFs.open(new Path(from))
    try {
      val out = dstFs.create(new Path(to), true)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536)
      finally out.close()
    } finally in.close()
  }

  def moveFile(spark: SparkSession, from: String, to: String): Unit = {
    copyFile(spark, from, to)
    deleteFile(spark, from)
  }

  /** Non-recursive children of a directory. */
  def listDir(spark: SparkSession, path: String): Seq[String] =
    fs(spark, path).listStatus(new Path(path)).map(_.getPath.toString).toSeq

  /** Recursive file walk. */
  def walkFiles(spark: SparkSession, path: String): Seq[String] = {
    val it = fs(spark, path).listFiles(new Path(path), true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) buf += it.next().getPath.toString
    buf.toSeq
  }

  /** chmod with an octal string (e.g. "755"), optionally recursive —
    * reference cdp/helpers/hdfs_utils.py change_permissions. */
  def changePermissions(
      spark: SparkSession,
      path: String,
      octal: String,
      recursive: Boolean = false): Unit = {
    val f = fs(spark, path)
    val perm = new org.apache.hadoop.fs.permission.FsPermission(
      Integer.parseInt(octal, 8).toShort)
    def apply(p: Path): Unit = {
      f.setPermission(p, perm)
      if (recursive && f.getFileStatus(p).isDirectory)
        f.listStatus(p).foreach(st => apply(st.getPath))
    }
    apply(new Path(path))
  }

  /** os.walk-style traversal: (directory, subdirectories, files)
    * triples, top-down — reference s3_utils.py s3_walk. */
  def walk(spark: SparkSession, path: String): Seq[(String, Seq[String], Seq[String])] = {
    val f = fs(spark, path)
    def go(p: Path): Seq[(String, Seq[String], Seq[String])] = {
      val (dirs, files) = f.listStatus(p).toSeq.partition(_.isDirectory)
      (p.toString, dirs.map(_.getPath.getName), files.map(_.getPath.getName)) +:
        dirs.flatMap(d => go(d.getPath))
    }
    go(new Path(path))
  }

  /** Reference s3_utils.py remove_leading_slash. */
  def removeLeadingSlash(key: String): String = key.dropWhile(_ == '/')

  /** Reference s3_utils.py create_s3_uri — s3a:// scheme (the Hadoop
    * connector), bucket validated. */
  def createS3Uri(bucket: String, key: String = ""): String =
    s"s3a://${validateBucketName(bucket)}/${removeLeadingSlash(key)}"

  def readTextFile(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new Path(path))
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  def writeTextFile(spark: SparkSession, path: String, content: String): Unit = {
    val out = fs(spark, path).create(new Path(path), true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readBinaryFile(spark: SparkSession, path: String): Array[Byte] = {
    val in = fs(spark, path).open(new Path(path))
    try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
    finally in.close()
  }

  def writeBinaryFile(spark: SparkSession, path: String, content: Array[Byte]): Unit = {
    val out = fs(spark, path).create(new Path(path), true)
    try out.write(content)
    finally out.close()
  }

  /** Streaming digest of a file (md5 / sha256), hex-encoded. */
  def fileDigest(spark: SparkSession, path: String, algorithm: String = "MD5"): String = {
    val md = MessageDigest.getInstance(algorithm)
    val in = new BufferedInputStream(fs(spark, path).open(new Path(path)))
    try {
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Recursive folder copy (reference s3_utils.py copy_folder /
    * gcp_utils copy_folder — one FileSystem version serves every
    * scheme). */
  def copyFolder(spark: SparkSession, from: String, to: String): Unit = {
    val srcFs = fs(spark, from)
    // qualify so relativize works against the scheme-full listing URIs
    val base = srcFs.makeQualified(new Path(from))
    val it = srcFs.listFiles(base, true)
    while (it.hasNext) {
      val f = it.next()
      val rel = base.toUri.relativize(f.getPath.toUri).getPath
      copyFile(spark, f.getPath.toString, s"$to/$rel")
    }
  }

  /** Recursive folder move = copy + delete source. */
  def moveFolder(spark: SparkSession, from: String, to: String): Unit = {
    copyFolder(spark, from, to)
    deleteFile(spark, from, recursive = true)
  }

  /** Local file → any FileSystem (reference upload_file,
    * s3_utils.py:586-700). `overwrite=false` refuses existing
    * destinations. */
  def uploadFile(
      spark: SparkSession,
      localPath: String,
      destPath: String,
      overwrite: Boolean = true): Unit = {
    if (!overwrite && fileExists(spark, destPath))
      throw new graft.PipelineError(s"uploadFile: $destPath already exists")
    fs(spark, destPath).copyFromLocalFile(false, overwrite,
      new Path(localPath), new Path(destPath))
  }

  /** Any FileSystem → local file (reference download_file). */
  def downloadFile(
      spark: SparkSession,
      srcPath: String,
      localPath: String,
      overwrite: Boolean = true): Unit = {
    if (!overwrite && java.nio.file.Files.exists(java.nio.file.Paths.get(localPath)))
      throw new graft.PipelineError(s"downloadFile: $localPath already exists")
    fs(spark, srcPath).copyToLocalFile(false, new Path(srcPath),
      new Path(localPath), true)
  }

  /** First line of a file without reading the rest — the reference's
    * CSV header probe (s3_utils.py read header / file_utils). */
  def readHeader(spark: SparkSession, path: String): String = {
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs(spark, path).open(new Path(path)), java.nio.charset.StandardCharsets.UTF_8))
    try Option(in.readLine()).getOrElse("")
    finally in.close()
  }

  /** Number of files directly under a directory. */
  def fileCountInFolder(spark: SparkSession, path: String): Int =
    fs(spark, path).listStatus(new Path(path)).count(_.isFile)

  /** Delete objects older than `cutoffMillis` (modification time) under
    * `path`, recursively — the reference's old-object GC
    * (s3_utils.py:1068-1166 delete_old_objects_and_folders). Returns
    * the deleted paths. */
  def deleteOldObjects(
      spark: SparkSession,
      path: String,
      cutoffMillis: Long): Seq[String] = {
    val f = fs(spark, path)
    val it = f.listFiles(new Path(path), true)
    val old = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getModificationTime < cutoffMillis)
        old += st.getPath.toString
    }
    old.foreach(p => f.delete(new Path(p), false))
    old.toSeq
  }

  /** Zip a local directory (reference: rdsa_utils/io/output.py:10-66). */
  def zipFolder(sourceDir: String, outputZip: String): Unit = {
    val src = java.nio.file.Paths.get(sourceDir)
    val zos = new ZipOutputStream(new BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(outputZip))))
    try {
      java.nio.file.Files.walk(src).filter(java.nio.file.Files.isRegularFile(_))
        .forEach { p =>
          zos.putNextEntry(new ZipEntry(src.relativize(p).toString))
          java.nio.file.Files.copy(p, zos)
          zos.closeEntry()
        }
    } finally zos.close()
  }

  /** Zip a (possibly remote) directory into a (possibly remote) zip in
    * ONE streaming pass — reference cdp/helpers/s3_utils.py:1838
    * (zip_s3_directory_to_s3), scheme-generic: both sides go through
    * the Hadoop FileSystem (file://, hdfs://, s3a://, gs://), no local
    * staging, memory O(copy buffer) regardless of directory size.
    * Entry names are source-relative; files stream in sorted order so
    * the archive layout is deterministic. */
  def zipDirectoryToRemote(
      spark: SparkSession,
      sourceDir: String,
      outputZip: String): Unit = {
    val srcFs = fs(spark, sourceDir)
    val qualifiedSrc = srcFs.makeQualified(new Path(sourceDir)).toString
    val out = fs(spark, outputZip).create(new Path(outputZip), true)
    val zos = new ZipOutputStream(new BufferedOutputStream(out))
    try {
      walkFiles(spark, sourceDir).sorted.foreach { p =>
        val rel = p.stripPrefix(qualifiedSrc).dropWhile(_ == '/')
        zos.putNextEntry(new ZipEntry(rel))
        val in = srcFs.open(new Path(p))
        try org.apache.hadoop.io.IOUtils.copyBytes(in, zos, 65536, false)
        finally in.close()
        zos.closeEntry()
      }
    } finally zos.close()
  }

  // ------------------------------------------------- path validation
  // Bucket-name / S3-path validation rules are pure string logic in the
  // reference (cdp/helpers/s3_utils.py:64-176) — ported semantics.

  def validateBucketName(name: String): String = {
    def fail(reason: String) =
      throw new InvalidBucketNameError(s"Invalid bucket name '$name': $reason")
    if (name.length < 3 || name.length > 63) fail("length must be 3-63")
    if (!name.matches("[a-z0-9.-]+")) fail("only lowercase letters, digits, dots, hyphens")
    if (!name.head.isLetterOrDigit || !name.last.isLetterOrDigit)
      fail("must start and end with a letter or digit")
    if (name.contains("..")) fail("must not contain consecutive dots")
    if (name.matches("\\d+\\.\\d+\\.\\d+\\.\\d+")) fail("must not look like an IP address")
    name
  }

  def validateS3FilePath(path: String): String = {
    if (path.isEmpty || path.startsWith("/") || path.contains("//"))
      throw new InvalidS3FilePathError(s"Invalid S3 key '$path'")
    path
  }

  /** Split "s3a://bucket/key" into (bucket, key). */
  def splitS3Uri(uri: String): (String, String) = {
    val m = "^(?:s3a?|s3n)://([^/]+)/?(.*)$".r
    uri match {
      case m(bucket, key) => (bucket, key)
      case _ => throw new InvalidS3FilePathError(s"Cannot parse S3 URI '$uri'")
    }
  }

  // ------------------------------------------------- single-file CSV

  /** Write a DataFrame as ONE csv file: coalesce(1) into a temp dir,
    * rename the part file to the target, clean up. The reference does
    * this twice (HDFS via subprocess, S3 via boto3,
    * cdp/io/output.py:334-569); the FileSystem API needs one version.
    *
    * Deliberately an anti-pattern beyond ~1 GB (single writer task) —
    * kept for parity because single-file CSV handoff is a hard
    * requirement of the reference's consumers.
    */
  def saveSingleCsv(
      spark: SparkSession,
      df: DataFrame,
      targetPath: String,
      header: Boolean = true,
      overwrite: Boolean = true): Unit = {
    val tmp = targetPath + "_tmp_" + java.util.UUID.randomUUID().toString.take(8)
    df.coalesce(1).write
      .option("header", header.toString)
      .mode(if (overwrite) "overwrite" else "error")
      .csv(tmp)
    val f = fs(spark, targetPath)
    val part = f.globStatus(new Path(tmp, "part-*"))
      .headOption
      .getOrElse(throw new graft.PipelineError(s"no part file produced under $tmp"))
    if (overwrite && f.exists(new Path(targetPath))) f.delete(new Path(targetPath), false)
    // FileSystem.rename signals failure (e.g. existing destination) by
    // returning false, not by throwing — deleting tmp without checking
    // would silently discard the written CSV.
    if (!f.rename(part.getPath, new Path(targetPath)))
      throw new graft.PipelineError(
        s"saveSingleCsv: rename ${part.getPath} -> $targetPath failed " +
          "(destination may already exist)")
    f.delete(new Path(tmp), true)
  }
}
