package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{Det, GQuery, Tables}
import Det._

/** Data-quality surface: generic per-column table profiling and
  * statistical outlier detection — the audit passes a pipeline runs
  * before trusting a new ingest (the reference's replication story has
  * no validation at all; its only check is the PK conflict skip,
  * transaction_consumer.py:88).
  */
object ProfileQueries {

  /** One profile row per column: count / nulls / exact distinct /
    * min / max (stringified). ONE aggregation pass computes every
    * metric (multiple count-distincts expand map-side in a single
    * plan); the row-per-column shape comes from exploding a built
    * struct array — no second scan, no per-column jobs.
    *
    * Cross-engine string discipline: min/max aggregate the NATIVE
    * column type first and only the aggregated extreme is stringified
    * (min(CAST(x AS STRING)) is the lexicographic extreme — for
    * numeric columns that reports e.g. '99996' > '600000', wrong for
    * an audit). Doubles go through DECIMAL(18,2) before the string
    * cast (double→string rendering is engine-specific; decimal
    * rendering is not), timestamps through the µs string form both
    * engines share.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Column
    def strify(c: String, e: Column) = df.schema(c).dataType match {
      case org.apache.spark.sql.types.DoubleType => dec(e).cast("string")
      case _ => e.cast("string")
    }
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__cnt"),
        countDistinct(col(c)).as(s"${c}__dst"),
        strify(c, min(col(c))).as(s"${c}__min"),
        strify(c, max(col(c))).as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = array(cols.map { c =>
      struct(lit(c).as("column"),
        lit(df.schema(c).dataType.simpleString).as("dtype"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__cnt")).as("n_null"),
        col(s"${c}__dst").as("n_distinct"),
        col(s"${c}__min").as("min_str"),
        col(s"${c}__max").as("max_str"))
    }: _*)
    one.select(explode(rows).as("p")).select("p.*").orderBy("column")
  }

  /** Heavy-key skew diagnostics for one key column: the numbers a
    * partitioning decision (salt? broadcast? AQE skew join?) actually
    * needs — total rows, distinct keys, the hottest key's count and
    * identity, and the imbalance factor max_cnt/(n_rows/n_keys) in
    * floor-micro units (1e6 = perfectly uniform; the salted-join
    * threshold in this repo's q44 regime is ~10e6). Everything is one
    * partial-agg'd groupBy on the key plus two one-row aggregates —
    * the grouped counts subtree feeds both, ReuseExchange shares the
    * shuffle; nothing is ever sorted or collected. The hottest-key
    * argmax is the two-level max + filter form (max_by's tie behavior
    * is engine-specific; max(k) FILTER c = max_cnt is not).
    */
  def keySkew(df: DataFrame, keyCol: String, label: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("c"))
    val m = counts.agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
      max(col("c")).as("max_cnt"))
    val top = counts.join(broadcast(m.select(col("max_cnt").as("__mc"))),
        col("c") === col("__mc"))
      .agg(max(col("k")).as("top_key"))
    m.crossJoin(broadcast(top))
      .select(lit(label).as("key_label"), col("n_rows"), col("n_keys"),
        col("max_cnt"), col("top_key"),
        floor(col("max_cnt").cast("double") * col("n_keys") / col("n_rows") * 1e6)
          .cast("long").as("imbalance_u"))
  }

  private def skewSql(table: String, c: String) =
    s"""SELECT '$table.$c' AS key_label, m.n_rows, m.n_keys, m.max_cnt,
        (SELECT max(k) FROM (SELECT CAST($c AS VARCHAR) k, count(*) c
            FROM $table GROUP BY 1) cc WHERE cc.c = m.max_cnt) AS top_key,
        CAST(floor(CAST(m.max_cnt AS DOUBLE) * m.n_keys / m.n_rows * 1e6)
          AS BIGINT) AS imbalance_u
      FROM (SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
            max(c) AS max_cnt
        FROM (SELECT CAST($c AS VARCHAR) k, count(*) c
              FROM $table GROUP BY 1) c1) m"""

  val queries: Seq[GQuery] = Seq(

    // The pre-shuffle audit a 100 TB join plan starts from: per key
    // column, how hot is the hottest key relative to uniform. The q44
    // salted join and the AQE skew-join spec are the mitigations this
    // report decides between.
    GQuery("profile_skew",
      (s, d) => Seq(
          keySkew(Tables(s, d, "lineitem"), "l_suppkey", "lineitem.l_suppkey"),
          keySkew(Tables(s, d, "lineitem"), "l_partkey", "lineitem.l_partkey"),
          keySkew(Tables(s, d, "events"), "event_type", "events.event_type"),
          keySkew(Tables(s, d, "orders"), "o_orderpriority",
            "orders.o_orderpriority"))
        .reduce(_.unionByName(_)).orderBy(col("key_label")),
      Some(s"""${skewSql("lineitem", "l_suppkey")}
        UNION ALL ${skewSql("lineitem", "l_partkey")}
        UNION ALL ${skewSql("events", "event_type")}
        UNION ALL ${skewSql("orders", "o_orderpriority")}
        ORDER BY key_label""")),

    // Modality-alignment audit: a multimodal pipeline joins documents
    // to their embeddings by id — this reports how many ids are
    // aligned, text-only (embedding job behind/failed) or
    // embedding-only (orphans surviving a text delete, an RTBF smell).
    // Planted misalignment (doc_id%11 / vec_id%13 drops) exercises all
    // three classes. One full outer join on the id — each side
    // shuffles once — plus a partial-agg'd class count.
    GQuery("profile_align_audit",
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .filter(col("doc_id") % 11 =!= 0)
          .select(col("doc_id").as("id")).withColumn("has_doc", lit(1))
        val emb = Tables(s, d, "embeddings")
          .filter(col("vec_id") % 13 =!= 0)
          .select(col("vec_id").as("id")).withColumn("has_vec", lit(1))
        docs.join(emb, Seq("id"), "full_outer")
          .withColumn("align_class",
            when(col("has_doc").isNotNull && col("has_vec").isNotNull,
              "aligned")
              .when(col("has_doc").isNotNull, "missing_embedding")
              .otherwise("orphan_embedding"))
          .groupBy("align_class").agg(count(lit(1)).as("n"))
          .orderBy("align_class")
      },
      Some("""WITH d AS (
          SELECT doc_id AS id FROM documents WHERE doc_id % 11 <> 0),
        e AS (SELECT vec_id AS id FROM embeddings WHERE vec_id % 13 <> 0),
        j AS (
          SELECT d.id IS NOT NULL AS hd, e.id IS NOT NULL AS he
          FROM d FULL OUTER JOIN e ON d.id = e.id)
        SELECT CASE WHEN hd AND he THEN 'aligned'
                    WHEN hd THEN 'missing_embedding'
                    ELSE 'orphan_embedding' END AS align_class,
          count(*) AS n
        FROM j GROUP BY 1 ORDER BY align_class""")),

    GQuery("profile_orders",
      (s, d) => profile(Tables(s, d, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")),
      Some {
        // aggregate the native type, stringify the extreme (mirrors
        // profile()'s strify-of-min, not min-of-strify)
        val cols = Seq(
          ("o_orderkey", "bigint", "CAST(%s AS VARCHAR)"),
          ("o_custkey", "bigint", "CAST(%s AS VARCHAR)"),
          ("o_orderstatus", "string", "%s"),
          ("o_totalprice", "double",
            "CAST(CAST(%s AS DECIMAL(18,2)) AS VARCHAR)"),
          ("o_orderdate", "timestamp_ntz", "CAST(%s AS VARCHAR)"),
          ("o_orderpriority", "string", "%s"))
        cols.map { case (c, t, wrap) =>
          s"""SELECT '$c' AS "column", '$t' AS dtype,
              COUNT(*) AS n_rows,
              COUNT(*) - COUNT($c) AS n_null,
              COUNT(DISTINCT $c) AS n_distinct,
              ${wrap.format(s"min($c)")} AS min_str,
              ${wrap.format(s"max($c)")} AS max_str
            FROM orders"""
        }.mkString("", "\n          UNION ALL ",
          "\n          ORDER BY \"column\"")
      }),

    // 3-sigma outliers per group on the heavy-tailed events value
    // column (lineitem prices are bounded — max |z| < 2 — which is
    // itself a finding q80's moments expose), with mean/stddev from
    // the exact DECIMAL power sums so the cut line is bit-identical on
    // both engines. One pass for the moments (tiny, broadcast back),
    // one pass for the flagging — scanned twice, shuffled never.
    GQuery("q88_outliers_3sigma",
      (s, d) => {
        val y = dec(col("value"))
        val ev = Tables(s, d, "events")
        val m = ev.groupBy(col("event_type").as("et"))
          .agg(count(lit(1)).as("n"),
            sum(y).cast("double").as("sy"),
            sum(y * y).cast("double").as("syy"))
          .select(col("et"),
            (col("sy") / col("n")).as("mean"),
            sqrt((col("syy") - col("sy") * col("sy") / col("n")) /
              (col("n") - 1)).as("sd"))
        ev.join(broadcast(m), col("event_type") === col("et"))
          .filter(abs(col("value") - col("mean")) > col("sd") * 3.0)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_outliers"),
            min(col("value")).as("lo"),
            max(col("value")).as("hi"))
          .orderBy(col("event_type"))
      },
      Some("""WITH m AS (
          SELECT event_type AS et,
            CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean,
            sqrt((CAST(SUM(CAST("value" AS DECIMAL(18,2)) * CAST("value" AS DECIMAL(18,2))) AS DOUBLE)
                  - CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE)
                    * CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                 / (COUNT(*) - 1)) AS sd
          FROM events GROUP BY event_type)
        SELECT event_type, COUNT(*) AS n_outliers,
          min("value") AS lo, max("value") AS hi
        FROM events JOIN m ON event_type = et
        WHERE abs("value" - mean) > sd * 3.0
        GROUP BY event_type ORDER BY event_type""")),

    // Winsorization (clip at the 5th/95th percentile per group) — the
    // standard robust-preprocessing step before training on noisy
    // numerics. Exact percentile cuts (q42's quantile_cont pairing)
    // broadcast back; the clip is map-side. The winsorized sum goes
    // through floor-quantized micro-units: clipped boundary values are
    // interpolated doubles, and a DECIMAL(18,2) cast would round them
    // by engine-specific rules.
    GQuery("q89_winsorize",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val m = ev.groupBy(col("event_type").as("et"))
          .agg(percentile(col("value"), lit(0.05)).as("lo"),
            percentile(col("value"), lit(0.95)).as("hi"))
        ev.join(broadcast(m), col("event_type") === col("et"))
          .withColumn("w", least(greatest(col("value"), col("lo")), col("hi")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
            sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
            (sum(floor(col("w") * 1e6).cast("long")).cast("double") / 1e6)
              .as("winsorized_sum"))
          .orderBy(col("event_type"))
      },
      Some("""WITH m AS (
          SELECT event_type AS et,
                 quantile_cont("value", 0.05) AS lo,
                 quantile_cont("value", 0.95) AS hi
          FROM events GROUP BY event_type)
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CASE WHEN "value" < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
          CAST(SUM(CASE WHEN "value" > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
          CAST(SUM(CAST(floor(least(greatest("value", lo), hi) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
            AS winsorized_sum
        FROM events JOIN m ON event_type = et
        GROUP BY event_type ORDER BY event_type""")),

    // Production twin of q89: per-group cut points from
    // approx_percentile (mergeable GK sketch, bounded memory) instead
    // of exact percentile() (buffers all values per group). The clip
    // and the winsorized sum are unchanged map-side work. Sketch cuts
    // are engine-specific → rows-only; tolerance vs the exact cuts is
    // spec-asserted (ApproxPercentileSpec). m stays broadcast: its
    // cardinality is the EVENT-TYPE domain (bounded), not a key table.
    GQuery("q89_winsorize_approx",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val m = ev.groupBy(col("event_type").as("et"))
          .agg(approx_percentile(col("value"), lit(0.05), lit(10000)).as("lo"),
            approx_percentile(col("value"), lit(0.95), lit(10000)).as("hi"))
        ev.join(broadcast(m), col("event_type") === col("et"))
          .withColumn("w", least(greatest(col("value"), col("lo")), col("hi")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
            sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
            (sum(floor(col("w") * 1e6).cast("long")).cast("double") / 1e6)
              .as("winsorized_sum"))
          .orderBy(col("event_type"))
      },
      None))
}