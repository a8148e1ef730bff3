package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) left join — the canonical time-series
  * join Spark has no native operator for.
  *
  * Implemented as the union + running-window trick, NOT a theta join:
  * probe and build rows are unioned, sorted once per key by (ts, side)
  * with build-before-probe on ties, and each probe row picks up the
  * latest non-null build payload via `last(ignoreNulls) OVER rows
  * unbounded-preceding`. Cost at 100 TB: ONE shuffle on the key and one
  * sort — compare a `probe.ts >= build.ts` range join, which Spark plans
  * as a broadcast-nested-loop or a cartesian per key. This is the same
  * shape Flink/KDB use for temporal joins.
  *
  * Build rows must be unique per (key, ts) — pre-aggregate the build side
  * (e.g. `groupBy(key, ts).agg(max(...))`) so tie order cannot make the
  * result nondeterministic.
  */
object AsOfJoin {

  /** @param probe   left side; all its columns are preserved
    * @param build   right side; must contain `key`, `ts`, and `payload`
    * @param key     equi-join key column name (same name both sides)
    * @param ts      event-time column name (same name both sides)
    * @param payload build columns carried onto each probe row (null when
    *                no build row is at-or-before the probe row)
    */
  def asOfLeft(probe: DataFrame, build: DataFrame, key: String, ts: String,
               payload: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    // collision-proof temp names (the WindowOps.preferenceFirst pattern):
    // fixed "__side"/"__b"/"__m" would duplicate or shadow a caller's
    // columns of those names and break the union/window resolution
    def temp(base: String): String = Iterator.from(0)
      .map(i => s"__graft_$base$i")
      .find(c => !probeCols.contains(c) && !build.columns.contains(c)).get
    val (sideC, bC, mC) = (temp("side"), temp("b"), temp("m"))
    // the payload travels as ONE struct per build row: `last(ignoreNulls)`
    // then picks whole build rows, never mixing columns from different
    // rows when an individual payload VALUE is null (a per-column last
    // would treat that null as "absent" and reach back to an older row)
    val payloadStruct = struct(payload.map(col): _*)
    val structType = {
      import org.apache.spark.sql.types.{StructField, StructType}
      StructType(payload.map(c => StructField(c, build.schema(c).dataType)))
    }
    val pSide = probe.select(
      probeCols.map(col) ++ Seq(lit(1).as(sideC),
        lit(null).cast(structType).as(bC)): _*)
    // null-key build rows can never match under equi-join semantics
    // (NULL = NULL is not true), and null-TS build rows never satisfy
    // `probe.ts >= build.ts` in SQL ASOF — but under Spark's nulls-first
    // ascending sort a null-ts row would order before every probe row in
    // its partition and attach its payload. Drop both.
    val bSide = build.filter(col(key).isNotNull && col(ts).isNotNull).select(
      probeCols.map {
        case c if c == key || c == ts => col(c)
        case c => lit(null).cast(probe.schema(c).dataType).as(c)
      } ++ Seq(lit(0).as(sideC), payloadStruct.as(bC)): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col(sideC))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pSide.unionByName(bSide)
      .withColumn(mC, last(col(bC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
      .select(probeCols.map(col) ++
        payload.map(c => col(s"$mC.$c").as(c)): _*)
  }
}
