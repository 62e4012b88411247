package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def snapshot = Seq(
    (1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0))
    .toDF("id", "name", "price")

  test("insert, update, delete, and untouched rows") {
    val changes = Seq(
      (2L, "U", 1L, "beta2", 25.0),
      (3L, "D", 1L, "gamma", 30.0),
      (9L, "I", 1L, "iota", 90.0))
      .toDF("id", "op", "seq", "name", "price")
    val out = Cdc.applyChangeSet(snapshot, changes, "id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map(
      1L -> ("alpha", 10.0),    // untouched
      2L -> ("beta2", 25.0),    // updated
      9L -> ("iota", 90.0)))    // inserted; 3 deleted
  }

  test("latest event per key wins: upsert-then-delete deletes, delete-then-reinsert lives") {
    val changes = Seq(
      (2L, "U", 1L, "beta2", 25.0), (2L, "D", 2L, "x", 0.0),
      (3L, "D", 1L, "x", 0.0), (3L, "I", 2L, "gamma2", 33.0))
      .toDF("id", "op", "seq", "name", "price")
    val out = Cdc.applyChangeSet(snapshot, changes, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!out.contains(2L), "U then D must delete")
    assert(out(3L) == "gamma2", "D then I must re-insert")
    assert(out(1L) == "alpha")
  }

  test("unknown op codes fail loudly; missing columns throw") {
    val bad = Seq((2L, "Z", 1L, "b", 0.0)).toDF("id", "op", "seq", "name", "price")
    val e = intercept[Exception](
      Cdc.applyChangeSet(snapshot, bad, "id").collect())
    assert(e.getMessage.contains("unknown op code") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown op code")))
    intercept[graft.ColumnNotInDataframeError](
      Cdc.applyChangeSet(snapshot, bad.drop("seq"), "id"))
  }

  test("scale shape: changeset reduces via max_by before the join — no window") {
    val changes = Seq((2L, "U", 1L, "b", 1.0)).toDF("id", "op", "seq", "name", "price")
    val plan = Cdc.applyChangeSet(snapshot, changes, "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window leaked:\n$plan")
  }
}
