package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{DataSource, FileFormat}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft")` — the DSv2 face of the generational
  * table layout (r15 verdict #1): until now generations, time travel,
  * and pinned reads were reachable only through the
  * [[Compaction.readTable]]/[[Compaction.readTableAt]] Scala API, so
  * SQL and DataFrame-reader users got nothing. This source is the
  * MANIFEST-RESOLUTION layer and nothing more: it resolves the graft
  * table root (+ optional time-travel option) to the one immutable
  * generation directory a reader should scan, then delegates the
  * entire scan to Spark's built-in parquet DSv2 table — schema
  * inference, vectorized reading, filter pushdown, column pruning,
  * and partition pruning are the battle-tested parquet paths, not a
  * re-implementation (GraftDataSourceSpec asserts PushedFilters /
  * PartitionFilters / ReadSchema survive the indirection verbatim).
  *
  * Options:
  *  - `generation` — pin an exact published generation (the
  *    [[Compaction.readTableAt]] contract: a number outside the
  *    retention window fails LOUDLY at resolution, never a silent
  *    fallback to current);
  *  - `asOfGen` — the highest published generation <= the given
  *    number (snapshot-floor semantics; loud when nothing qualifies);
  *  - neither — the current generation ([[Compaction.resolve]]; a
  *    flat non-generational directory reads as plain parquet, so
  *    `format("graft")` is safe on both layouts).
  *
  * Deliberately a PLAIN [[TableProvider]], NOT a `FileDataSourceV2`:
  * Spark special-cases `FileDataSourceV2` on every V1 code path
  * (`DataSource.providingClass` maps the class straight to its
  * fallback `FileFormat`, and `DataFrameWriter` filters such
  * providers out of the V2 write path) — as a `FileDataSourceV2`
  * this source's SQL face would be bypassed for a raw parquet scan
  * of the table ROOT, and `df.write.format("graft")` would SILENTLY
  * land loose parquet files next to the generation dirs (observed
  * before this design; the spec pins both). As a plain provider the
  * V1 paths resolve through [[RelationProvider]] below and writes
  * fail loudly on both engines' routes.
  *
  * READ-ONLY by design: published generations are immutable, so both
  * write routes throw with a pointer to [[Compaction.writeGen]]
  * (which publishes a NEW generation atomically) — a write into a
  * resolved generation dir would mutate a published snapshot under
  * concurrent readers and break every retention/lease/RTBF invariant.
  *
  * SQL users: `CREATE TEMPORARY VIEW t USING graft OPTIONS (path
  * '...', generation '...')` resolves through the V1
  * [[RelationProvider]] face — the same resolution, then the plain
  * parquet relation (pushdown intact; spec-asserted). Direct
  * SQL-on-file (`FROM graft.`/path``) is a PLATFORM restriction:
  * Spark's ResolveSQLOnFile only accepts FileFormat-backed sources,
  * so it fails with a loud UNSUPPORTED_DATASOURCE analysis error
  * (spec-pinned) — never a silent root scan.
  *
  * Scale: resolution is one directory listing of manifest markers —
  * O(retained generations) metadata on the driver, nothing
  * data-sized; the scan itself plans/executes exactly as
  * `spark.read.parquet(<resolved dir>)` would at any table size.
  */
class GraftDataSource extends TableProvider with DataSourceRegister
    with RelationProvider with CreatableRelationProvider {

  import GraftDataSource._

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graftTable(options, None).schema()

  override def inferPartitioning(options: CaseInsensitiveStringMap): Array[Transform] =
    graftTable(options, None).partitioning()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    graftTable(new CaseInsensitiveStringMap(properties), Option(schema))

  private def graftTable(options: CaseInsensitiveStringMap,
                         schema: Option[StructType]): Table = {
    val spark = SparkSession.active
    val paths = pathsOf(options)
    require(paths.nonEmpty,
      "graft: no path given — load(<table root>) or option(\"path\", ...)")
    val pin = genOptions(Option(options.get(GenerationOption)),
      Option(options.get(AsOfGenOption)))
    val resolved = paths.map(p => resolveGenDir(spark, p, pin))
    new GraftReadOnlyTable(s"graft ${paths.mkString(",")}", spark,
      withoutResolutionKeys(options), resolved, schema,
      classOf[ParquetFileFormat])
  }

  /** The V1 face: SQL-on-file (`FROM graft.`path``) and
    * `CREATE [TEMP] VIEW/TABLE ... USING graft` resolve relations
    * through this interface — same generation resolution, then the
    * built-in parquet relation over the resolved dir.
    */
  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val lower = parameters.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }
    val path = lower.getOrElse("path",
      sys.error("graft: OPTIONS must carry 'path' (the table root)"))
    val pin = genOptions(
      lower.get(GenerationOption.toLowerCase(java.util.Locale.ROOT)),
      lower.get(AsOfGenOption.toLowerCase(java.util.Locale.ROOT)))
    val passThrough = parameters.filterNot { case (k, _) =>
      val lk = k.toLowerCase(java.util.Locale.ROOT)
      ResolutionKeys(lk)
    }
    DataSource(spark, className = "parquet",
      paths = Seq(resolveGenDir(spark, path, pin)),
      options = passThrough).resolveRelation()
  }

  /** The V1 write face exists only to fail loudly:
    * `df.write.format("graft")` must never land loose part-files in a
    * table root (what the FileDataSourceV2 fallback silently did).
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation =
    throw new UnsupportedOperationException(ReadOnlyMessage)
}

object GraftDataSource {
  /** Option: exact published generation to read (readTableAt). */
  val GenerationOption = "generation"
  /** Option: highest published generation <= this number. */
  val AsOfGenOption = "asOfGen"

  private[sources] val ReadOnlyMessage =
    "graft tables are READ-ONLY through the DSv2 source: published " +
      "generations are immutable. Write with " +
      "graft.sources.Compaction.writeGen (publishes a NEW generation " +
      "atomically) or the streaming sinks — a write into a resolved " +
      "generation dir would mutate a published snapshot under " +
      "concurrent readers"

  private val ResolutionKeys: Set[String] = Set("path", "paths",
    GenerationOption.toLowerCase(java.util.Locale.ROOT),
    AsOfGenOption.toLowerCase(java.util.Locale.ROOT))

  /** `load(a, b)` arrives as a JSON-encoded `paths` array plus the
    * single `path` option — the same contract the built-in file
    * sources parse.
    */
  private def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val many = Option(options.get("paths")).map { json =>
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      om.readValue(json, classOf[Array[String]]).toSeq
    }.getOrElse(Seq.empty)
    many ++ Option(options.get("path")).toSeq
  }

  private def withoutResolutionKeys(options: CaseInsensitiveStringMap): CaseInsensitiveStringMap = {
    val m = new java.util.HashMap[String, String]()
    options.entrySet().forEach { e =>
      if (!ResolutionKeys(e.getKey)) m.put(e.getKey, e.getValue)
    }
    new CaseInsensitiveStringMap(m)
  }

  private[sources] def genOptions(gen: Option[String],
                                  asOf: Option[String]): (Option[Long], Option[Long]) = {
    def num(name: String, v: String): Long =
      try v.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"graft: option '$name' must be a generation number, got '$v'")
      }
    require(gen.isEmpty || asOf.isEmpty,
      s"graft: set at most one of '$GenerationOption' / '$AsOfGenOption'")
    (gen.map(num(GenerationOption, _)), asOf.map(num(AsOfGenOption, _)))
  }

  /** Resolve the directory a scan should read: the pinned, the
    * as-of-floored, or the current generation — with
    * [[Compaction.readTableAt]]'s loud-not-silent retention contract.
    */
  private[sources] def resolveGenDir(spark: SparkSession, path: String,
                                     pin: (Option[Long], Option[Long])): String = {
    val main = new Path(path)
    val fs = main.getFileSystem(spark.sparkContext.hadoopConfiguration)
    pin match {
      case (Some(g), _) =>
        val gens = Compaction.generations(spark, path)
        require(gens.contains(g),
          s"generation $g at $path is not readable — never published, " +
            "in flight, or outside the retention window (readable: " +
            s"${gens.mkString(",")})")
        new Path(main, Compaction.genName(g)).toString
      case (None, Some(a)) =>
        val gens = Compaction.generations(spark, path)
        require(gens.nonEmpty,
          s"$path is not a generational graft table (no published " +
            s"generations) — '$AsOfGenOption' has nothing to resolve")
        val ok = gens.filter(_ <= a)
        require(ok.nonEmpty,
          s"no published generation <= $a at $path (readable: " +
            s"${gens.mkString(",")})")
        new Path(main, Compaction.genName(ok.max)).toString
      case _ =>
        Compaction.resolve(fs, main).toString
    }
  }
}

/** The resolved-generation table: DELEGATES every read-side method to
  * the built-in parquet DSv2 table (scan/pushdown/pruning untouched)
  * while being structurally read-only. Deliberately a WRAPPER, not a
  * `ParquetTable` subclass: Spark's `FallBackFileSourceV2` analyzer
  * rule rewrites ANY insert on a `FileTable` into a V1
  * InsertIntoHadoopFsRelationCommand on the table's paths — bypassing
  * `newWriteBuilder` entirely, so a subclass's throwing override never
  * runs and an `INSERT INTO` SILENTLY lands part-files inside a
  * published generation dir (observed; spec pins it). As a plain
  * `SupportsRead` table, batch inserts fail analysis loudly (no
  * BATCH_WRITE capability) and `df.write.format("graft")` falls to the
  * V1 route, where [[GraftDataSource.createRelation]] throws.
  */
private[sources] class GraftReadOnlyTable(
    tableName: String, spark: SparkSession,
    options: CaseInsensitiveStringMap,
    paths: Seq[String], userSpecifiedSchema: Option[StructType],
    fallback: Class[_ <: FileFormat])
  extends org.apache.spark.sql.connector.catalog.Table
  with org.apache.spark.sql.connector.catalog.SupportsRead {

  private val delegate = ParquetTable(tableName, spark, options, paths,
    userSpecifiedSchema, fallback)

  override def name(): String = tableName
  override def schema(): StructType = delegate.schema
  override def partitioning(): Array[org.apache.spark.sql.connector.expressions.Transform] =
    delegate.partitioning()
  override def properties(): java.util.Map[String, String] =
    delegate.properties()
  override def capabilities(): java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveStringMap: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
    delegate.newScanBuilder(caseInsensitiveStringMap)
}
