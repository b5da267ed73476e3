package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Compaction, GraftDataSource}

/** The DSv2 face of the generational layout (r15 verdict #1):
  * `spark.read.format("graft")` must be bit-equal to
  * [[Compaction.readTable]]/[[Compaction.readTableAt]], keep the
  * parquet scan's pushdown/pruning intact through the manifest
  * indirection, surface retention violations loudly at resolution,
  * and close the write path (published generations are immutable).
  */
class GraftDataSourceSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, i * 2L, s"s$i")).toDF("k", "v", "s")

  test("format(\"graft\") == readTable; generation/asOfGen == readTableAt; retention errors are loud") {
    val t = tmp("graft_dsv2") + "/tbl"
    Compaction.writeGen(rows(0, 10), t) // g1
    Compaction.writeGen(rows(0, 15), t) // g2
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().toSeq
    // current
    assert(collect(spark.read.format("graft").load(t)) ==
      collect(Compaction.readTable(spark, t)))
    // exact pin
    assert(collect(spark.read.format("graft")
        .option(GraftDataSource.GenerationOption, "1").load(t)) ==
      collect(Compaction.readTableAt(spark, t, 1L)))
    // as-of floor: <= 1 -> g1; far future -> current
    assert(spark.read.format("graft")
      .option(GraftDataSource.AsOfGenOption, "1").load(t).count() == 10L)
    assert(spark.read.format("graft")
      .option(GraftDataSource.AsOfGenOption, "999").load(t).count() == 15L)
    // option casing is insensitive (CaseInsensitiveStringMap contract)
    assert(spark.read.format("graft")
      .option("ASOFGEN", "1").load(t).count() == 10L)
    // loud: unpublished generation names the readable window
    val e1 = intercept[Exception](spark.read.format("graft")
      .option(GraftDataSource.GenerationOption, "7").load(t))
    assert(e1.getMessage.contains("not readable") &&
      e1.getMessage.contains("1,2"), e1.getMessage)
    // loud: nothing at or below the as-of floor
    val e2 = intercept[Exception](spark.read.format("graft")
      .option(GraftDataSource.AsOfGenOption, "0").load(t))
    assert(e2.getMessage.contains("no published generation"), e2.getMessage)
    // loud: both pins at once
    val e3 = intercept[Exception](spark.read.format("graft")
      .option(GraftDataSource.GenerationOption, "1")
      .option(GraftDataSource.AsOfGenOption, "1").load(t))
    assert(e3.getMessage.contains("at most one"), e3.getMessage)
    // loud: non-numeric pin
    val e4 = intercept[Exception](spark.read.format("graft")
      .option(GraftDataSource.GenerationOption, "current").load(t))
    assert(e4.getMessage.contains("generation number"), e4.getMessage)
    // a PRUNED generation fails the same way a never-published one
    // does (readTableAt's message contract)
    Compaction.writeGen(rows(0, 20), t) // g3: g1 leaves the window
    val e5 = intercept[Exception](spark.read.format("graft")
      .option(GraftDataSource.GenerationOption, "1").load(t))
    assert(e5.getMessage.contains("not readable") &&
      e5.getMessage.contains("2,3"), e5.getMessage)
  }

  test("plan: PushedFilters, PartitionFilters, and column pruning survive the graft indirection") {
    val t = tmp("graft_dsv2p") + "/tbl"
    (0 until 200).map(i => (i % 4, i.toLong, s"pad$i"))
      .toDF("part", "v", "s")
      .write.partitionBy("part").parquet(t)
    Compaction.toGenerational(spark, t)
    assert(Compaction.generations(spark, t) == Seq(1L))
    val q = spark.read.format("graft").load(t)
      .filter(col("part") === 1 && col("v") > 100L)
      .select("v")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,100)"),
      s"data filter must reach the parquet scan:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("part"),
      s"partition filter must prune directories:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("pad"),
      s"unprojected column must not be read:\n$plan")
    assert(q.count() == (101 until 200).count(_ % 4 == 1))
    // the same shape through Compaction.readTable for parity
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
      Compaction.readTable(spark, t)
        .filter(col("part") === 1 && col("v") > 100L)
        .select("v").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("df.write.format(\"graft\") publishes generations; flat dirs write-guarded, read as plain parquet") {
    val t = tmp("graft_dsv2w") + "/tbl"
    Compaction.writeGen(rows(0, 5), t) // g1
    // append = a NEW generation holding old + new (never loose files)
    rows(5, 8).write.format("graft").mode("append").save(t)
    assert(Compaction.generations(spark, t) == Seq(1L, 2L))
    assert(Compaction.readTable(spark, t).count() == 8L)
    // overwrite = the replacement snapshot
    rows(0, 3).write.format("graft").mode("overwrite").save(t)
    assert(Compaction.readTable(spark, t).count() == 3L)
    // a pinned snapshot is never writable
    val ep = intercept[Throwable] {
      rows(0, 1).write.format("graft").mode("append")
        .option(GraftDataSource.GenerationOption, "2").save(t)
    }
    def chain(x: Throwable): Seq[Throwable] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(ep).exists(c => Option(c.getMessage)
        .exists(m => m.contains("pinned") || m.contains("immutable"))),
      s"pinned write must fail loudly, got: $ep")
    // flat (non-generational) parquet: format("graft") == plain parquet
    val flat = tmp("graft_dsv2f") + "/flat"
    rows(0, 7).write.parquet(flat)
    assert(spark.read.format("graft").load(flat).count() == 7L)
    // ... but WRITES refuse to shadow flat data with a generation
    val ef = intercept[Throwable] {
      rows(7, 9).write.format("graft").mode("append").save(flat)
    }
    assert(chain(ef).exists(c => Option(c.getMessage)
        .exists(_.contains("toGenerational"))), s"got: $ef")
    assert(spark.read.parquet(flat).count() == 7L,
      "the refused write must not have touched the flat dir")
  }

  test("GraftCatalog: VERSION AS OF / TIMESTAMP AS OF SQL time travel, path addressing, writes closed") {
    spark.conf.set("spark.sql.catalog.gct", "graft.sources.GraftCatalog")
    val t = tmp("graft_cat") + "/tbl"
    Compaction.writeGen(rows(0, 10), t) // g1
    Compaction.writeGen(rows(0, 15), t) // g2
    // age g1's publish instant so a wall-clock between the two
    // publishes is expressible: the instant lives in the marker
    // PAYLOAD (publishedAtMs=), so the test rewrites that line —
    // test-only surgery on an otherwise immutable marker
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val g1Marker = new Path(t, "_graft_gen.g000000001")
    val t1 = System.currentTimeMillis() - 3600000L
    val out = fs.create(g1Marker, true)
    out.write(s"g000000001\npublishedAtMs=$t1".getBytes("UTF-8"))
    out.close()
    // a restore/copy/rsync rewrites mtimes; the payload instant must
    // win — perturb BOTH markers' mtimes to nonsense and expect no
    // timestamp-travel shift anywhere below
    fs.setTimes(g1Marker, System.currentTimeMillis() + 86400000L, -1L)
    fs.setTimes(new Path(t, "_graft_gen.g000000002"),
      System.currentTimeMillis() - 7200000L, -1L)
    // current / VERSION AS OF through plain SQL
    assert(spark.sql(s"SELECT count(*) FROM gct.`$t`").head().getLong(0) == 15L)
    assert(spark.sql(s"SELECT count(*) FROM gct.`$t` VERSION AS OF 1")
      .head().getLong(0) == 10L)
    assert(spark.sql(s"SELECT count(*) FROM gct.`$t` VERSION AS OF 2")
      .head().getLong(0) == 15L)
    // TIMESTAMP AS OF between the publishes -> the g1 snapshot
    val mid = java.time.Instant.ofEpochMilli(t1 + 600000L).toString
      .replace("T", " ").stripSuffix("Z")
    assert(spark.sql(
      s"SELECT count(*) FROM gct.`$t` TIMESTAMP AS OF '$mid'")
      .head().getLong(0) == 10L)
    // after the latest publish -> current
    val late = java.time.Instant.ofEpochMilli(
        System.currentTimeMillis() + 60000L).toString
      .replace("T", " ").stripSuffix("Z")
    assert(spark.sql(
      s"SELECT count(*) FROM gct.`$t` TIMESTAMP AS OF '$late'")
      .head().getLong(0) == 15L)
    // pushdown survives the catalog face
    val p = spark.sql(s"SELECT v FROM gct.`$t` WHERE v > 10")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,10)"),
      s"catalog face must push filters:\n$p")
    // loud errors: unreadable version, timestamp before retention
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM gct.`$t` VERSION AS OF 9").collect())
    assert(e1.getMessage.contains("not readable"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM gct.`$t` TIMESTAMP AS OF '1990-01-01 00:00:00'")
      .collect())
    assert(e2.getMessage.contains("predates retention"), e2.getMessage)
    // catalog DDL stays closed (the table IS its directory)
    val e3 = intercept[Throwable](spark.sql(
      s"DROP TABLE gct.`$t`"))
    def chain(x: Throwable): Seq[Throwable] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(e3).exists(c => Option(c.getMessage).exists(m =>
        m.contains("path-addressed") || m.contains("deleting the table") ||
          m.contains("read-only"))), s"got: $e3")
    assert(Compaction.readTable(spark, t).count() == 15L)
  }

  test("SQL faces: CREATE TEMP VIEW USING graft (with a generation pin) and SELECT FROM graft.`path`") {
    val t = tmp("graft_dsv2s") + "/tbl"
    Compaction.writeGen(rows(0, 10), t) // g1
    Compaction.writeGen(rows(0, 15), t) // g2
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_sql_cur " +
      s"USING graft OPTIONS (path '$t')")
    assert(spark.sql("SELECT count(*) FROM graft_sql_cur").head().getLong(0) == 15L)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_sql_g1 " +
      s"USING graft OPTIONS (path '$t', generation '1')")
    assert(spark.sql("SELECT count(*) FROM graft_sql_g1").head().getLong(0) == 10L)
    // predicate pushdown survives the V1 relation face too
    val p = spark.sql("SELECT v FROM graft_sql_cur WHERE v > 10")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,10)"),
      s"V1 face must push filters:\n$p")
    // SQL-on-file is a platform restriction: ResolveSQLOnFile only
    // accepts FileFormat-backed sources, and a FileDataSourceV2 face
    // would silently scan the table ROOT as parquet (the worse
    // failure). Pin the LOUD analysis error; the temp-view face above
    // is the SQL route.
    val ef = intercept[Exception](spark.sql(s"SELECT count(*) FROM graft.`$t`"))
    assert(ef.getMessage.contains("UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY"),
      ef.getMessage)
    // a pinned view names the window loudly when its generation prunes
    Compaction.writeGen(rows(0, 20), t) // g3: g1 leaves the window
    val e = intercept[Exception](spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW graft_sql_gone " +
        s"USING graft OPTIONS (path '$t', generation '1')"))
    assert(e.getMessage.contains("not readable"), e.getMessage)
  }
}
