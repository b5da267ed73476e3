package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Tables

/** Testdata-drift tripwire (round-7 driver finding): when the driver
  * regenerated events.parquet with TIMESTAMP(MICROS) instead of
  * TIMESTAMP(NANOS), every events query died with the same opaque
  * AnalysisException — 31 red rows that took an artifact diff to trace
  * to one reader. This spec pins the ENGINE-side schema of every table
  * as seen through [[graft.util.Tables]] (the view all queries consume,
  * after any reader normalization), so the next regeneration fails as
  * ONE readable line naming the table, column, and type delta.
  *
  * Physical-format changes that Tables absorbs (e.g. ns-long vs µs
  * timestamps, both normalized to timestamp_ntz) intentionally do NOT
  * fail — queries are unaffected by what the reader hides.
  */
class SchemaProbeSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp_ntz",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("every testdata table reads with the engine-contract schema") {
    val deltas = Tables.all.flatMap { t =>
      try {
        val got = Tables(spark, sfDir, t).schema.fields
          .map(f => f.name -> f.dataType.simpleString).toSeq
        val want = expected(t)
        if (got == want) Nil
        else {
          val missing = want.filterNot(got.contains)
            .map { case (c, ty) => s"$t.$c: expected $ty, got " +
              got.collectFirst { case (`c`, a) => a }.getOrElse("ABSENT") }
          val extra = got.map(_._1).diff(want.map(_._1))
            .map(c => s"$t.$c: unexpected new column")
          val reordered =
            if (missing.isEmpty && extra.isEmpty)
              Seq(s"$t: columns reordered — got ${got.map(_._1).mkString(",")}")
            else Nil
          missing ++ extra ++ reordered
        }
      } catch {
        case e: Exception =>
          Seq(s"$t: READ FAILED — ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString)
      }
    }
    assert(deltas.isEmpty,
      "\nTESTDATA DRIFT — regenerate broke the engine contract:\n  " +
        deltas.mkString("\n  ") +
        "\n(update graft.util.Tables readers or this spec's expectations)")
  }
}
