package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Temporal join operators Spark lacks as built-ins, composed from
  * primitives per the preference order (compose > custom Expression >
  * custom plan): as-of join and bucketed time-band join.
  */
object TemporalOps {

  /** As-of join: for every left row, attach the latest right row with
    * `rightTs <= leftTs` for the same key (NULLs when none). The union +
    * last_value(ignoreNulls) window form: ONE shuffle on the key and an
    * in-partition sort — no per-row correlated subquery, no row explosion;
    * the shape that survives a 100 TB left side.
    *
    * `valueCols` are the right-side columns to carry, attached ATOMICALLY
    * (one struct per right row): per-column fills would stitch together a
    * right row that never existed whenever value columns contain nulls.
    * Right rows sort before left rows at equal timestamps (inclusive
    * as-of). Right rows with a null timestamp or null key are excluded up
    * front — equi/correlated semantics never match them, but the window
    * partition otherwise would (nulls group together and sort first).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               valueCols: Seq[String],
               direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward | forward | nearest, got '$direction'")
    val leftCols = left.columns.toSeq
    // The matched right timestamp rides inside the struct (__rts): forward
    // needs its own traversal, nearest needs both distances — and backward
    // projections never surface it, so the q15 semantics is unchanged.
    val vStruct = struct(col(rightTs).as("__rts") +: valueCols.map(col): _*)
    val vType = right.select(vStruct).schema.head.dataType
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side")) ++
        leftCols.map(col) :+ lit(null).cast(vType).as("__vrow"): _*)
    val rTagged = right
      .where(col(rightTs).isNotNull && col(key).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side")) ++
        leftCols.map(c => lit(null).as(c)) :+ vStruct.as("__vrow"): _*)
    // Backward: ascending traversal, right rows first at equal instants
    // (inclusive as-of). Forward: DESCENDING traversal — the last non-null
    // right seen before a left row is then the EARLIEST right at/after it;
    // __side still ascends so an equal-instant right stays visible. Both
    // windows share the partitioning, so "nearest" (both fills) still
    // costs ONE shuffle — just a second in-partition sort.
    val base = Window.partitionBy(col("__key"))
    val wBack = base.orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = base.orderBy(col("__ts").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val unioned = lTagged.unionAll(rTagged)
    def micros(ts: Column): Column = unix_micros(ts.cast(TimestampType))
    val fill = direction match {
      case "backward" => last(col("__vrow"), ignoreNulls = true).over(wBack)
      case "forward"  => last(col("__vrow"), ignoreNulls = true).over(wFwd)
      case "nearest" =>
        val b = last(col("__vrow"), ignoreNulls = true).over(wBack)
        val f = last(col("__vrow"), ignoreNulls = true).over(wFwd)
        // Ties go backward (the pandas/polars convention).
        when(f.isNull, b).when(b.isNull, f)
          .when(micros(col("__ts")) - micros(b("__rts")) <=
                micros(f("__rts")) - micros(col("__ts")), b)
          .otherwise(f)
    }
    val filled = unioned
      .select(Seq(col("__side")) ++ leftCols.map(col) :+ fill.as("__fill"): _*)
    filled.where(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__fill.$c").as(c)): _*)
  }

  /** Epoch seconds of an NTZ timestamp under the UTC session zone. */
  private def epochSec(ts: Column): Column =
    ts.cast(TimestampType).cast("long")

  /** Time-band join: pairs (l, r) with the same key and
    * `rightTs ∈ (leftTs, leftTs + band]`. Instead of joining on the key
    * alone and filtering (quadratic in events-per-key), both sides are
    * bucketed to `band`-wide time bins and joined on (key, bucket) — the
    * left side probes its own bin and the next one, so each row meets only
    * a ~2-bin neighborhood. The residual range predicate stays exact.
    *
    * Right-side columns whose names collide with a left column come out
    * prefixed `__r_` (the right key, a pure duplicate of the left's, is
    * dropped) — so `leftTs == rightTs == "ts"` works instead of failing
    * analysis with AMBIGUOUS_REFERENCE.
    */
  def timeBandJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   bandSeconds: Long): DataFrame = {
    require(bandSeconds > 0,
      s"bandSeconds must be positive, got $bandSeconds (zero divides by " +
        "zero under ANSI; negative silently matches nothing)")
    val collide = right.columns.toSet.intersect(left.columns.toSet)
    def rName(c: String): String = if (collide(c)) s"__r_$c" else c
    val rb = collide.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"__r_$c"))
      .withColumn("__bk2", floor(epochSec(col(rName(rightTs))) / bandSeconds))
    val lb = left.withColumn("__bk",
      explode(array(floor(epochSec(col(leftTs)) / bandSeconds),
        floor(epochSec(col(leftTs)) / bandSeconds) + 1)))
    lb.join(rb,
        col(key) === col(rName(key)) && col("__bk") === col("__bk2") &&
          col(rName(rightTs)) > col(leftTs) &&
          col(rName(rightTs)) <= col(leftTs) + expr(s"interval $bandSeconds second"))
      .drop("__bk", "__bk2", rName(key))
  }
}
