package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join.
  *
  * For each left row, attach the values of the latest right row with
  * `right.ts < left.ts` (or `<=` when `strict = false`), matching on the
  * equi-keys. The reference pipeline has no as-of operator (SURVEY.md §2B);
  * this is the standard union + single-window formulation chosen for scale:
  * one shuffle on the key columns and one sort per partition, instead of an
  * inequality join that Spark would plan as an O(n·m) broadcast
  * nested-loop. At 100 TB the key-partitioned sort is the only strategy
  * that doesn't blow up: it is the same plan shape as a sort-merge join.
  */
object AsofJoin {

  /** @param rightVals right columns to carry over, as (srcCol -> outName) */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[(String, String)],
      strict: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    // Sides are interleaved by (__ts, __pri): with strict semantics a right
    // row at the same ts as a left row must NOT be visible to it, so right
    // sorts after left (pri 1 > 0); with <= semantics it sorts before.
    val (lPri, rPri) = if (strict) (0, 1) else (1, 0)

    val lTagged = rightVals.foldLeft(
      left
        .withColumn("__ts", col(leftTs))
        .withColumn("__pri", lit(lPri))
        .withColumn("__left", lit(true))) { case (df, (src, out)) =>
      df.withColumn(s"__v_$out",
        lit(null).cast(right.schema(src).dataType))
    }
    val rTagged = leftCols.foldLeft(
      rightVals.foldLeft(
        right
          .withColumn("__ts", col(rightTs))
          .withColumn("__pri", lit(rPri))
          .withColumn("__left", lit(false))) { case (df, (src, out)) =>
        df.withColumn(s"__v_$out", col(src))
      }.select((keys.map(col) ++ Seq(col("__ts"), col("__pri"), col("__left")) ++
        rightVals.map { case (_, out) => col(s"__v_$out") }): _*)
    ) { case (df, c) =>
      if (keys.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val unionCols = keys ++ leftCols.filterNot(keys.contains) ++
      Seq("__ts", "__pri", "__left") ++ rightVals.map { case (_, o) => s"__v_$o" }
    val unioned = lTagged.select(unionCols.map(col): _*)
      .unionByName(rTagged.select(unionCols.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__pri"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withVals = rightVals.foldLeft(unioned) { case (df, (_, out)) =>
      df.withColumn(out,
        last(when(!col("__left"), col(s"__v_$out")), ignoreNulls = true).over(w))
    }
    withVals
      .filter(col("__left"))
      .select((leftCols.map(col) ++ rightVals.map { case (_, o) => col(o) }): _*)
  }
}
