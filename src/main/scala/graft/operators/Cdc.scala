package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ColumnNotInDataframeError

/** Change-data-capture application: fold a changeset of
  * insert/update/delete events into a snapshot — the MERGE INTO of the
  * lakehouse world, as a pure DataFrame operator. Change events carry
  * an op code (`I`/`U`/`D`), a sequence column ordering events on the
  * same key, and the full row payload; the LATEST event per key wins
  * (an upsert then a delete deletes; a delete then a re-insert
  * re-inserts).
  *
  * Scale shape: the changeset first reduces to one winning event per
  * key via [[Ranking.argmaxPerGroup]] — a single `max_by` grouped
  * aggregation with map-side combine, so a hot key with millions of
  * events ships ONE candidate per map task, never a window sort. The
  * apply itself is one outer join on the key: snapshot-only rows pass
  * through, `D` winners drop, `I`/`U` winners take the change
  * payload. Changesets are usually tiny next to snapshots — AQE
  * broadcasts the reduced side and the snapshot never shuffles.
  */
object Cdc {

  /** Apply `changes` to `snapshot`, returning the new snapshot.
    * `changes` must contain `idCol`, `opCol` (values I/U/D), `seqCol`
    * (unique per key — the event order), and every snapshot column.
    * Unknown op codes throw at plan time via a runtime guard column.
    */
  def applyChangeSet(
      snapshot: DataFrame,
      changes: DataFrame,
      idCol: String,
      opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == idCol).toSeq
    val missingS = (idCol +: payload).filterNot(snapshot.columns.contains)
    val missing = ((idCol +: opCol +: seqCol +: payload)
      .filterNot(changes.columns.contains)) ++ missingS
    if (missing.nonEmpty)
      throw new ColumnNotInDataframeError(
        s"applyChangeSet: column(s) ${missing.distinct.mkString(", ")} missing")
    // latest event per key: per-column scalar max_by keyed on the
    // (unique-per-key) sequence — every column independently picks the
    // same winning event, and scalar buffers keep the aggregate in
    // HashAggregate (a struct-payload max_by degrades to
    // SortAggregate, which measured SLOWER than even the hot-key
    // window sort at 8× — SCALE.md cdc_latest); never a per-key
    // window sort, and a hot key ships one candidate per map task
    val latest = changes
      .groupBy(col(idCol))
      .agg(
        max_by(col(opCol), col(seqCol)).as(opCol),
        payload.map(c => max_by(col(c), col(seqCol)).as(c)): _*)
    val ch = latest.select(
      col(idCol).as("__cdc_id") +: col(opCol).as("__cdc_op") +:
        payload.map(c => col(c).as(s"__cdc_$c")): _*)
    val joined = snapshot.join(ch, snapshot(idCol) === col("__cdc_id"), "full_outer")
    val op = col("__cdc_op")
    val takeChange = op.isin("I", "U")
    joined
      // unknown op codes fail the job instead of silently passing
      // through (the filter consumes the guard, so it cannot be pruned)
      .filter(when(op.isNotNull && !op.isin("I", "U", "D"),
        raise_error(concat(lit("applyChangeSet: unknown op code "), op))
          .isNull).otherwise(lit(true)))
      .filter(op.isNull || op =!= "D")
      .select(
        coalesce(snapshot(idCol), col("__cdc_id")).as(idCol) +:
          payload.map(c =>
            when(takeChange, col(s"__cdc_$c"))
              .otherwise(snapshot(c)).as(c)): _*)
  }
}
