package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink adapter (SURVEY.md §2A O5 + O14).
  *
  * The reference's ONLY query is a JDBC scan with a bound LIMIT —
  * `select * from transactions limit %s` (transaction_producer.py:33-39)
  * — and its sink is a per-message `INSERT ... ON CONFLICT (pk) DO
  * NOTHING` into Postgres (transaction_consumer.py:85-103). This adapter
  * reproduces both against any JDBC database:
  *
  *  - Reads go through Spark's DSv2 `JDBCTableCatalog` so Catalyst pushes
  *    predicates AND the limit into the remote engine's SQL — the scan
  *    ships `WHERE`/`LIMIT` to the database instead of fetching the table
  *    (asserted against a live embedded Derby in JdbcSpec: the physical
  *    plan shows `PushedFilters` and `PushedLimit`). At 100 TB of source
  *    table, pushdown is the difference between a bounded fetch and a
  *    full-table exfiltration per batch.
  *  - Writes are an executor-side batched idempotent insert for
  *    `foreachBatch`, batched via `PreparedStatement.addBatch` — NOT the
  *    reference's one statement + commit per message
  *    (transaction_consumer.py:103). Postgres URLs use the native
  *    `INSERT ... ON CONFLICT (keys) DO NOTHING` (the reference's exact
  *    statement — requires the key columns to carry a unique
  *    constraint, as the reference's PRIMARY KEY does); every other
  *    database gets a portable set-based `INSERT ... WHERE NOT EXISTS`.
  */
object Jdbc {

  /** Spark's built-in DerbyDialect defines the ANSI `FETCH NEXT n ROWS
    * ONLY` limit clause but does not opt into DSv2 limit pushdown, so a
    * `.limit(n)` on a Derby scan fetches the whole table and truncates in
    * Spark — exactly the O(table) fetch the reference's bounded
    * `select ... limit %s` avoids. This dialect delegates everything to
    * the stock Derby dialect and flips `supportsLimit` on; registered
    * (once) by [[registerCatalog]], it takes priority over the built-in.
    */
  private class DerbyLimitDialect(derby: org.apache.spark.sql.jdbc.JdbcDialect)
    extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def supportsLimit: Boolean = true
    override def getLimitClause(limit: Integer): String =
      if (limit > 0) s"FETCH NEXT $limit ROWS ONLY" else ""
    override def getCatalystType(sqlType: Int, typeName: String, size: Int,
        md: org.apache.spark.sql.types.MetadataBuilder) =
      derby.getCatalystType(sqlType, typeName, size, md)
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType) =
      derby.getJDBCType(dt)
    override def quoteIdentifier(colName: String): String =
      derby.quoteIdentifier(colName)
    override def isCascadingTruncateTable(): Option[Boolean] =
      derby.isCascadingTruncateTable()
  }

  @volatile private var dialectRegistered = false
  private def ensureDialect(): Unit = if (!dialectRegistered) synchronized {
    if (!dialectRegistered) {
      // leaving the stock dialect registered would pair it with ours in
      // an AggregatedDialect, which does NOT aggregate supportsLimit —
      // replace it outright (we delegate to it for everything else)
      val stock = org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:derby:memory:probe")
      org.apache.spark.sql.jdbc.JdbcDialects.unregisterDialect(stock)
      org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(new DerbyLimitDialect(stock))
      dialectRegistered = true
    }
  }

  /** Register a DSv2 JDBC catalog named `name`; tables then resolve as
    * `spark.table(s"$name.<schema>.<table>")` with predicate/limit (and
    * where the dialect supports it, aggregate) pushdown.
    */
  def registerCatalog(spark: SparkSession, name: String, url: String): Unit = {
    ensureDialect()
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.url", url)
    spark.conf.set(s"spark.sql.catalog.$name.pushDownLimit", "true")
    spark.conf.set(s"spark.sql.catalog.$name.pushDownAggregate", "true")
  }

  /** V1-style read for callers that want a plain DataFrame handle. */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .load()

  /** O5 faithful form: `select * from <table> limit n`. Prefer the
    * catalog route ([[registerCatalog]] + `spark.table(...).limit(n)`)
    * where the limit is pushed into the remote SQL.
    */
  def scanLimit(spark: SparkSession, url: String, table: String, n: Int): DataFrame =
    read(spark, url, table).limit(n)

  /** Idempotent keyed insert of one micro-batch, executed on the
    * executors with statement batching (dialect-aware SQL — see
    * [[insertIgnoreSql]]; on Postgres the key columns must carry a
    * unique constraint, which the reference sink's PRIMARY KEY does).
    * Duplicate keys WITHIN the batch are pre-resolved (smallest-hash row
    * wins, replay-stable — same contract as
    * CdcPipeline.idempotentParquetUpsert); keys already in the table win
    * unconditionally.
    */
  def upsertBatch(batch: DataFrame, url: String, table: String,
                  keys: Seq[String], batchSize: Int = 500): Unit = {
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    val cols = batch.columns.toSeq
    val valueCols = cols.filterNot(keys.contains)
    // all-columns-are-keys ⇒ same-key rows are identical; no tiebreak
    val tie = if (valueCols.isEmpty) lit(0)
              else xxhash64(valueCols.map(col): _*)
    val deduped = graft.operators.Materialize.firstByKey(batch, keys, Seq(tie))
    val sql = insertIgnoreSql(url, table, keys, batch.schema)
    val schema = deduped.schema
    deduped.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps: PreparedStatement = conn.prepareStatement(sql)
          try {
            var n = 0
            rows.foreach { row =>
              var i = 0
              while (i < schema.length) {
                ps.setObject(i + 1, row.get(i))
                i += 1
              }
              ps.addBatch()
              n += 1
              if (n % batchSize == 0) { ps.executeBatch(); conn.commit() }
            }
            ps.executeBatch()
            conn.commit()
          } finally ps.close()
        } finally conn.close()
      }
    }
  }

  /** The idempotent-insert statement, dialect-aware: Postgres (the
    * reference's actual sink, transaction_consumer.py:85-88) gets the
    * native `ON CONFLICT (keys) DO NOTHING` — one round trip, race-free
    * under concurrent writers; everything else gets the portable
    * set-based `INSERT ... WHERE NOT EXISTS` (exposed for the JdbcSpec
    * assertion — no Postgres runs in this environment, so the pg text is
    * checked as text while the portable form runs live on Derby).
    */
  def insertIgnoreSql(url: String, table: String, keys: Seq[String],
                      schema: org.apache.spark.sql.types.StructType): String = {
    // column names AND placeholder types both derive from the schema so
    // they cannot drift out of order
    val cols = schema.fieldNames.toSeq
    val colList = cols.mkString(", ")
    if (url.startsWith("jdbc:postgresql")) {
      val placeholders = cols.map(_ => "?").mkString(", ")
      s"""INSERT INTO $table ($colList) VALUES ($placeholders)
         |ON CONFLICT (${keys.mkString(", ")}) DO NOTHING""".stripMargin
    } else {
      // VALUES over bare ? parameters has no type context (Derby rejects
      // it outright) — cast each placeholder to the column's SQL type
      val placeholders = schema.fields
        .map(f => s"CAST(? AS ${sqlTypeName(f.dataType)})").mkString(", ")
      val keyMatch = keys.map(k => s"t.$k = v.$k").mkString(" AND ")
      s"""INSERT INTO $table ($colList)
         |SELECT ${cols.map(c => s"v.$c").mkString(", ")}
         |FROM (VALUES ($placeholders)) AS v($colList)
         |WHERE NOT EXISTS (SELECT 1 FROM $table t WHERE $keyMatch)""".stripMargin
    }
  }

  /** Portable ANSI SQL type for a CAST target in the VALUES row. */
  private def sqlTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => "VARCHAR(4000)"
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case _: TimestampType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case other => throw new IllegalArgumentException(
        s"unsupported JDBC sink type: ${other.simpleString}")
    }
  }

  /** `writeStream.foreachBatch` adapter for [[upsertBatch]] — O14 wired
    * into Structured Streaming; checkpoint + idempotent insert =
    * effectively-once, the reference's end-to-end contract.
    */
  def foreachBatchSink(url: String, table: String, keys: Seq[String])
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => upsertBatch(batch, url, table, keys)
}
