package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (interval) equi-join.
  *
  * Joins `left` rows whose scalar `leftVal` falls in the right-side band
  * `[rightLo, rightHi]`. A naive `ON v BETWEEN lo AND hi` has no equi-key,
  * so Spark plans a broadcast nested-loop join — O(|L|·|R|) comparisons,
  * hopeless at scale. Instead both sides are mapped onto fixed-width
  * buckets of the value domain: the left row lands in one bucket, the
  * right interval is exploded onto every bucket it overlaps, and the join
  * becomes a shuffle/broadcast HASH join on the bucket id with the exact
  * band predicate re-applied as a post-filter. With bands much narrower
  * than `bucketWidth`, each right row explodes to ≤ 2 buckets, so the
  * plan stays linear in input size and shuffles on a proper key.
  */
object RangeJoin {

  def banded(
      left: DataFrame,
      leftVal: Column,
      right: DataFrame,
      rightLo: Column,
      rightHi: Column,
      bucketWidth: Double): DataFrame = {
    val lb = left.withColumn("__bucket",
      floor(leftVal / bucketWidth).cast("long"))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        floor(rightLo / bucketWidth).cast("long"),
        floor(rightHi / bucketWidth).cast("long"))))
    lb.join(rb, Seq("__bucket"))
      .filter(leftVal.between(rightLo, rightHi))
      .drop("__bucket")
  }
}
