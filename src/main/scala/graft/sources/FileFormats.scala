package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** File source/sink surface (SURVEY.md §2B "File sources/sinks"): the
  * reference moves rows only as JSON-over-Kafka (O7/O13); a complete
  * engine reads and writes the standard columnar/row formats. Each query
  * round-trips a testdata table through one format with an explicit
  * schema on re-read (no inference drift) and is oracle-checked against
  * the original table — proving write fidelity and read fidelity in one
  * pass. Writes go to a fresh temp dir per invocation; at scale these
  * are the same `df.write.format(...)` calls against object storage.
  */
object FileFormats {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/data"

  val queries: Seq[GQuery] = Seq(

    GQuery("fmt_csv_roundtrip",
      (s, d) => {
        val nation = Tables(s, d, "nation")
        val path = tmp("graft_csv")
        nation.write.mode("overwrite").option("header", "true").csv(path)
        s.read.schema(nation.schema).option("header", "true").csv(path)
          .orderBy(col("n_nationkey"))
      },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    GQuery("fmt_json_roundtrip",
      (s, d) => {
        val part = Tables(s, d, "part")
        val path = tmp("graft_json")
        part.write.mode("overwrite").json(path)
        s.read.schema(part.schema).json(path)
          .orderBy(col("p_partkey"))
      },
      Some("SELECT * FROM part ORDER BY p_partkey")),

    GQuery("fmt_orc_roundtrip",
      (s, d) => {
        val supplier = Tables(s, d, "supplier")
        val path = tmp("graft_orc")
        supplier.write.mode("overwrite").orc(path)
        s.read.schema(supplier.schema).orc(path)
          .orderBy(col("s_suppkey"))
      },
      Some("SELECT * FROM supplier ORDER BY s_suppkey"))
  )
}
