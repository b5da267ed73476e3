package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Compaction
import graft.util.{GQuery, Tables, TempFixtures}

/** Declarative data-quality validation — the admission gate a training
  * corpus runs before new data enters the pipeline (the reference has
  * no validation surface at all; its only integrity check is the PK
  * conflict skip, transaction_consumer.py:88 — everything here is the
  * missing production half of that story).
  *
  * Design: a `Check` is a declarative constraint; `report` compiles
  * every ROW-LEVEL check into ONE aggregation pass over the table —
  * N checks cost one scan, one map-side-combined partial aggregate and
  * a single-row reduce, never N jobs (the Deequ execution model,
  * re-expressed as a plain Catalyst aggregate so it stays inside
  * whole-stage codegen). Key-level checks (`Unique`) each add exactly
  * one hash exchange on their key; referential integrity is one join
  * whose parent side AQE broadcasts when bounded. Row-level
  * enforcement (`quarantine`/`clean`) is map-only — no shuffle, no
  * driver round-trip — so it composes with ingest at any scale.
  *
  * NULL semantics follow SQL CHECK constraints: a NULL value SATISFIES
  * `InRange`/`InSet`/`MatchesRegex`/`Satisfies` (unknown is not a
  * violation); policing nulls is `NotNull`/`Completeness`'s job. This
  * keeps every constraint independently composable — a nullable column
  * with a range check never double-counts its nulls.
  */
object Validate {

  /** One declarative constraint. `name` is the stable identity used in
    * reports and quarantine reasons — derived from the constraint so
    * the same sheet produces the same report rows everywhere.
    */
  sealed trait Check { def name: String; def kind: String }

  final case class NotNull(column: String) extends Check {
    val name = s"not_null:$column"; val kind = "not_null"
  }

  /** Inclusive numeric bounds; NULLs pass (see object doc). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check {
    // an inverted or NaN bound makes every row a violation (NaN
    // comparisons are engine-ordering-dependent on top) — always a
    // caller bug, never a sheet
    require(!lo.isNaN && !hi.isNaN && lo <= hi,
      s"in_range:$column bounds must satisfy lo <= hi (non-NaN): [$lo, $hi]")
    val name = s"in_range:$column"; val kind = "in_range"
  }

  final case class InSet(column: String, allowed: Seq[Any]) extends Check {
    // a JVM null in the allow-list turns isin() three-valued: every
    // non-member row evaluates to NULL instead of false and the
    // violation silently counts ZERO — reject it loudly (SQL-side
    // NULLs already pass every membership check by the object doc)
    require(allowed.forall(_ != null),
      s"in_set:$column allow-list must not contain null " +
        "(NULL values already pass; see the NULL-semantics doc)")
    val name = s"in_set:$column"; val kind = "in_set"
  }

  /** Partial-match regex (Spark `rlike` / DuckDB `regexp_matches`
    * semantics — anchor with ^...$ for a full match). NULLs pass.
    */
  final case class MatchesRegex(column: String, regex: String)
      extends Check {
    val name = s"regex:$column"; val kind = "regex"
  }

  /** The NEGATIVE regex check: a row violates when the column
    * CONTAINS a match (partial, rlike semantics); NULLs pass. The
    * contract form of a scrub guarantee — `NoMatch(text, emailRe)` in
    * a [[graft.ops.TrainExport]] contract means a shipped export
    * provably carries no email-shaped span ([[graft.ops.Redact]]'s
    * rule regexes slot in directly).
    */
  final case class NoMatch(column: String, regex: String,
                           label: String = "")
      extends Check {
    // a sheet often bans SEVERAL patterns on one column — the label
    // keys them apart in report names (and quarantine reasons)
    // without leaking a whole regex into every report row
    val name = if (label.isEmpty) s"no_match:$column"
               else s"no_match:$column:$label"
    val kind = "no_match"
  }

  /** Escape hatch: any boolean Column; a row violates when the
    * predicate is FALSE (NULL passes, per SQL CHECK).
    */
  final case class Satisfies(checkName: String, predicate: Column)
      extends Check {
    val name = s"satisfies:$checkName"; val kind = "satisfies"
  }

  /** Table-level completeness threshold in basis points: fails when
    * non-null rows fall below `minBps`/10000 of the table. Violations
    * in the report are the null rows themselves, so the count stays
    * meaningful even when the check passes.
    */
  final case class Completeness(column: String, minBps: Int) extends Check {
    require(minBps >= 0 && minBps <= 10000, s"minBps out of range: $minBps")
    val name = s"completeness:$column"; val kind = "completeness"
  }

  /** Key uniqueness; violations = rows belonging to a key that occurs
    * more than once (both copies of a duplicate count — the rows an
    * operator would have to adjudicate). NULL keys group together like
    * GROUP BY; exclude them with a NotNull check if they are invalid.
    */
  final case class Unique(columns: Seq[String]) extends Check {
    require(columns.nonEmpty, "Unique needs at least one column")
    val name = s"unique:${columns.mkString(",")}"; val kind = "unique"
  }

  /** The boolean "this row violates `c`" expression — the compilation
    * unit `report`/`quarantine` share, so a report count and the
    * quarantined row set can never disagree.
    */
  private def violation(c: Check): Column = c match {
    case NotNull(cn) => col(cn).isNull
    case InRange(cn, lo, hi) =>
      col(cn).isNotNull && (col(cn) < lo || col(cn) > hi)
    case InSet(cn, allowed) => col(cn).isNotNull && !col(cn).isin(allowed: _*)
    case MatchesRegex(cn, re) => col(cn).isNotNull && !col(cn).rlike(re)
    case NoMatch(cn, re, _) => col(cn).isNotNull && col(cn).rlike(re)
    case Satisfies(_, p) => !coalesce(p, lit(true))
    case Completeness(cn, _) => col(cn).isNull
    case u: Unique => throw new IllegalArgumentException(
      s"${u.name} is key-level — it cannot be evaluated per row")
  }

  private def isRowLevel(c: Check): Boolean = !c.isInstanceOf[Unique]

  /** Guard the OTHER silent-pass membership trap: the [[InSet]]
    * constructor rejects JVM nulls, but a persisted contract's values
    * are canonicalized to STRINGS ([[serialize]]), and when such a
    * sheet lands on a numeric column Spark coerces the comparison —
    * an unparseable value casts to NULL, `isin` turns three-valued,
    * and every violation silently counts ZERO. Verified here, where
    * the sheet first meets the frame's schema: every string allow-list
    * value on a non-string column must cast non-null to the column
    * type (driver-side Catalyst literal eval — zero jobs), or the
    * sheet fails loudly. Non-string values keep Spark's ordinary
    * literal coercion (an Int against a double column is fine).
    */
  private def requireSetsApplicable(df: DataFrame, checks: Seq[Check]): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
    import org.apache.spark.sql.types.StringType
    checks.foreach {
      case InSet(cn, allowed) =>
        df.schema.fields.find(_.name == cn).foreach { f =>
          if (f.dataType != StringType &&
              Cast.canCast(StringType, f.dataType)) {
            // TRY mode: unparseable evals to null instead of the ANSI
            // throw — WE own the diagnosis (the ANSI message would
            // point at a cast, not at the sheet)
            val bad = allowed.collect {
              case v: String if Cast(Literal(v), f.dataType, Some("UTC"),
                EvalMode.TRY).eval(null) == null => v
            }
            require(bad.isEmpty,
              s"in_set:$cn allow-list value(s) ${bad.mkString("'", "', '", "'")} " +
                s"do not cast to the column's ${f.dataType.simpleString} — " +
                "membership would be three-valued and violations would " +
                "silently count zero; fix the sheet's values or check a " +
                "string column")
          }
        }
      case _ => ()
    }
  }

  /** floor-micro-unit ratio (1e6 = every row violates) — BIGINT on
    * both engines, so report hashes replay cross-engine.
    */
  private def ratioU(v: Column, n: Column): Column =
    when(n === 0L, 0L).otherwise(
      floor(v.cast("double") * 1e6 / n.cast("double")))

  private def statusCol(c: Check, v: Column, n: Column): Column = c match {
    case Completeness(_, minBps) =>
      // integer arithmetic: non-null * 10000 >= minBps * rows
      when((n - v) * 10000L >= lit(minBps.toLong) * n, "pass")
        .otherwise("fail")
    case _ => when(v === 0L, "pass").otherwise("fail")
  }

  /** Evaluate a constraint sheet: one report row per check —
    * `(check_name, kind, n_rows, n_violations, violation_u, status)`,
    * ordered by check_name. All row-level checks share ONE aggregation
    * pass; each `Unique` adds one more (column-pruned) scan plus one
    * partial-agg'd exchange on its key — ValidateSpec pins both plan
    * shapes. The report is O(#checks) rows — safe to collect, join, or
    * persist as an audit artifact.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty constraint sheet")
    require(checks.map(_.name).distinct.length == checks.length,
      s"duplicate check names: ${checks.map(_.name)}")
    requireSetsApplicable(df, checks)
    val (rowChecks, keyChecks) = checks.partition(isRowLevel)

    val parts = Seq.newBuilder[DataFrame]
    if (rowChecks.nonEmpty) {
      val aggs = rowChecks.zipWithIndex.map { case (c, i) =>
        coalesce(sum(when(violation(c), 1L).otherwise(0L)), lit(0L))
          .as(s"__v$i")
      }
      val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
      val rows = array(rowChecks.zipWithIndex.map { case (c, i) =>
        val v = col(s"__v$i"); val n = col("__n")
        struct(lit(c.name).as("check_name"), lit(c.kind).as("kind"),
          n.as("n_rows"), v.as("n_violations"),
          ratioU(v, n).as("violation_u"), statusCol(c, v, n).as("status"))
      }: _*)
      parts += one.select(explode(rows).as("r")).select("r.*")
    }
    keyChecks.collect { case u: Unique => u }.foreach { u =>
      val counts = df.groupBy(u.columns.map(col): _*)
        .agg(count(lit(1)).as("__c"))
      val one = counts.agg(
        coalesce(sum(col("__c")), lit(0L)).as("__n"),
        coalesce(sum(when(col("__c") > 1L, col("__c")).otherwise(0L)),
          lit(0L)).as("__v"))
      val v = col("__v"); val n = col("__n")
      parts += one.select(lit(u.name).as("check_name"),
        lit(u.kind).as("kind"), n.as("n_rows"), v.as("n_violations"),
        ratioU(v, n).as("violation_u"), statusCol(u, v, n).as("status"))
    }
    parts.result().reduce(_.unionByName(_)).orderBy(col("check_name"))
  }

  /** Referential integrity as one report row: child rows whose key is
    * fully non-null and matches no parent key are violations (SQL FK
    * semantics — a NULL anywhere in the key passes). One scan of the
    * child + one left join against the DISTINCT parent keys; AQE
    * broadcasts the parent side when it is dimension-sized, and a
    * fact-sized parent degrades to an ordinary shuffled join — never a
    * driver collect.
    */
  def foreignKey(child: DataFrame, childCols: Seq[String],
                 parent: DataFrame, parentCols: Seq[String]): DataFrame = {
    require(childCols.nonEmpty && childCols.length == parentCols.length,
      s"key arity mismatch: $childCols vs $parentCols")
    requireColumnsFree(child, "foreignKey",
      parentCols.indices.map(i => s"__pk$i") :+ "__hit": _*)
    val name = s"fk:${childCols.mkString(",")}->${parentCols.mkString(",")}"
    val pk = parent.select(parentCols.zipWithIndex.map { case (c, i) =>
      col(c).as(s"__pk$i")
    }: _*).distinct().withColumn("__hit", lit(1))
    val cond = childCols.zipWithIndex.map { case (c, i) =>
      col(c) === col(s"__pk$i")
    }.reduce(_ && _)
    val nonNullKey = childCols.map(col(_).isNotNull).reduce(_ && _)
    val joined = child.join(pk, cond, "left")
    val one = joined.agg(count(lit(1)).as("__n"),
      coalesce(sum(when(nonNullKey && col("__hit").isNull, 1L)
        .otherwise(0L)), lit(0L)).as("__v"))
    val v = col("__v"); val n = col("__n")
    one.select(lit(name).as("check_name"), lit("foreign_key").as("kind"),
      n.as("n_rows"), v.as("n_violations"), ratioU(v, n).as("violation_u"),
      when(v === 0L, "pass").otherwise("fail").as("status"))
  }

  /** Tag every row with the names of the row-level checks it violates
    * (`violations: array<string>`, in sheet declaration order — empty
    * array = clean). Map-only: the enforcement path adds zero
    * shuffles to an ingest job.
    */
  def withViolations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty && checks.forall(isRowLevel),
      "withViolations takes row-level checks only (Unique needs report)")
    requireSetsApplicable(df, checks)
    requireColumnsFree(df, "withViolations", "violations")
    val none = array().cast("array<string>")
    val reasons = concat(checks.map { c =>
      when(violation(c), array(lit(c.name))).otherwise(none)
    }: _*)
    df.withColumn("violations", reasons)
  }

  /** The violating rows, with reasons — route to a quarantine sink. */
  def quarantine(df: DataFrame, checks: Seq[Check]): DataFrame =
    withViolations(df, checks).filter(size(col("violations")) > 0)

  /** The complement of [[quarantine]]: rows passing every check, with
    * the scratch column dropped — the frame an ingest keeps.
    */
  def clean(df: DataFrame, checks: Seq[Check]): DataFrame =
    withViolations(df, checks).filter(size(col("violations")) === 0)
      .drop("violations")

  /** Hard admission gate: throw (listing every failing check) unless
    * the whole sheet passes. The collect is the O(#checks) report —
    * bounded metadata, never data rows.
    */
  def requireValid(df: DataFrame, checks: Seq[Check], label: String): Unit = {
    val bad = report(df, checks).filter(col("status") === "fail")
      .select("check_name", "n_violations").collect()
    if (bad.nonEmpty) {
      val detail = bad.map(r => s"${r.getString(0)} (${r.getLong(1)} rows)")
        .mkString("; ")
      throw new IllegalStateException(
        s"validation failed for $label: $detail")
    }
  }

  /** Persist a [[report]] as the validation HISTORY rows for
    * `generation` of a monitored table (r13 verdict #4): the audit
    * trail a pipeline appends on every publish so quality regressions
    * show up as TRAJECTORIES ([[historyTrend]]), not just as the
    * newest-vs-previous snapshot [[generationDrift]] sees. The history
    * is itself a [[Compaction]] generational table — each publish
    * rewrites the full accumulated trail as the next generation, so
    * readers get atomic snapshots, a crashed write never corrupts the
    * trail, and the write inherits the doctrine's fencing. IDEMPOTENT
    * on republish: rows for `generation` are replaced, so a re-run
    * publish hook converges byte-for-byte instead of duplicating.
    *
    * Scale: the trail is O(#checks × #generations) rows — bounded
    * metadata; the rewrite-the-trail-per-publish cost is a few KB, the
    * price of atomic snapshots without a second storage doctrine.
    */
  def publishReport(spark: SparkSession, historyPath: String,
                    generation: Long, report: DataFrame): Unit = {
    val want = Seq("check_name", "kind", "n_rows", "n_violations",
      "violation_u", "status")
    require(want.forall(report.columns.contains),
      s"publishReport wants a Validate.report frame " +
        s"(${want.mkString(",")}); got ${report.columns.mkString(",")}")
    requireColumnsFree(report, "publishReport", "generation")
    // the report is tiny but its plan may be expensive (a full corpus
    // agg) — materialize ONCE outside the fenced retry loop below, or
    // every lost race re-runs the whole scan
    val reportRows = report.select(want.map(col): _*).collect().toSeq
    import spark.implicits._
    val tagged = reportRows.map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toDF(want: _*)
      .withColumn("generation", lit(generation))
    // READ-MODIFY-WRITE fencing (the Materialize.maintainAggregate
    // discipline): two hooks publishing different generations
    // concurrently each read the trail, merge their own rows, and
    // write — without the expectGen fence the later writeGen would
    // silently roll back the earlier one's rows. Fenced losers re-read
    // and retry; the loop is bounded because each retry starts from a
    // strictly newer trail generation.
    var attempts = 0
    while (attempts < 16) {
      val gens = Compaction.generations(spark, historyPath)
      val merged =
        if (gens.isEmpty) tagged
        else Compaction.readTable(spark, historyPath)
          .filter(col("generation") =!= generation)
          .unionByName(tagged)
      try {
        // Some(0) on an empty trail: two concurrent FIRST publishes
        // must fence too (None would disable the read-snapshot check
        // and the loser would silently drop the winner's rows)
        Compaction.writeGen(merged, historyPath,
          expectGen = Some(gens.maxOption.getOrElse(0L)))
        return
      } catch {
        case _: Compaction.FencedWriteException => attempts += 1
      }
    }
    sys.error(s"publishReport at $historyPath: lost the publish race " +
      "16 times — a writer is republishing in a tight loop; serialize " +
      "the publish hooks")
  }

  /** Violation trajectories over the last `k` recorded generations of
    * a [[publishReport]] trail: one row per (check, generation) with
    * the micro-ratio, its delta vs the previous recorded generation
    * IN the window (null for the window's first), and the recorded
    * status — the feed a quality dashboard plots and an alerting rule
    * thresholds on `delta_u`. Tiny frames throughout (the trail is
    * bounded metadata), but the plan stays distributed: one window
    * per check partition, one broadcast semi-join for the last-k cut.
    */
  def historyTrend(spark: SparkSession, historyPath: String,
                   k: Int = 5): DataFrame =
    trendOver(Compaction.readTable(spark, historyPath), "generation", k)

  /** The same trajectory view over a STREAMING admission gate's
    * per-batch report feed
    * ([[graft.streaming.StreamingDedup.attachValidated]]'s
    * `reportDir`): the micro-batch id is the time axis — last `k`
    * batches, per-check violation trajectories with lag deltas. The
    * alerting rule that thresholds `delta_u` works identically on the
    * batch feed and the publish trail.
    */
  def batchTrend(spark: SparkSession, reportDir: String,
                 k: Int = 5): DataFrame =
    trendOver(spark.read.parquet(reportDir)
        .withColumn("batch", col("batch").cast("long")),
      "batch", k)

  private def trendOver(h: DataFrame, timeCol: String, k: Int): DataFrame = {
    require(k >= 1, s"trend window must be >= 1 steps, got $k")
    val lastK = h.select(timeCol).distinct()
      .orderBy(col(timeCol).desc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("check_name").orderBy(timeCol)
    // lag over the FULL history, THEN filter to the window (the
    // Redact.batchTrend r15-ADVICE fix, applied to both trends):
    // filtering first made the earliest in-window step report
    // delta_u = null even when the feed held its predecessor. The
    // feed is O(#checks) rows per step — bounded metadata.
    h.withColumn("delta_u",
        col("violation_u") - lag(col("violation_u"), 1).over(w))
      .join(broadcast(lastK), Seq(timeCol))
      .select(col("check_name"), col("kind"), col(timeCol),
        col("n_rows"), col("n_violations"), col("violation_u"),
        col("delta_u"), col("status"))
      .orderBy(col("check_name"), col(timeCol))
  }

  /** Cross-generation drift audit over a [[Compaction]] generational
    * table: compare the two most recent retained snapshots column by
    * column — row count, null micro-ratio, exact distinct — and flag
    * `drift` when the null ratio jumps more than `nullJumpU` micro
    * units or the row count leaves [countLoBps, countHiBps]/10000 of
    * the previous generation. This is the "did the new ingest silently
    * degrade?" check a pipeline runs between publish and promote.
    *
    * Scale: one single-row aggregate per generation (all columns in
    * one pass each, like the profiler) joined by broadcast — two scans
    * total, no per-column jobs. Exact countDistinct is one expanded
    * aggregate; swap columns to approx_count_distinct at extreme
    * cardinalities if ±2% suffices (the report shape is unchanged).
    */
  def generationDrift(spark: SparkSession, path: String, cols: Seq[String],
                      nullJumpU: Long = 1000L, countLoBps: Int = 9900,
                      countHiBps: Int = 10100): DataFrame = {
    require(cols.nonEmpty, "no columns to audit")
    val gens = Compaction.generations(spark, path).sorted
    require(gens.length >= 2,
      s"drift audit needs two retained generations, found $gens at $path")
    def metrics(g: Long, sfx: String): DataFrame = {
      val dfg = Compaction.readTableAt(spark, path, g)
      val aggs = cols.flatMap { c =>
        Seq(coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__null_$sfx"),
          countDistinct(col(c)).as(s"${c}__dst_$sfx"))
      }
      dfg.agg(count(lit(1)).as(s"__n_$sfx"), aggs: _*)
    }
    val one = metrics(gens(gens.length - 2), "old")
      .crossJoin(broadcast(metrics(gens.last, "new")))
    val rows = array(cols.map { c =>
      val nOld = col("__n_old"); val nNew = col("__n_new")
      val nullUOld = ratioU(col(s"${c}__null_old"), nOld)
      val nullUNew = ratioU(col(s"${c}__null_new"), nNew)
      val countDrift = nNew * 10000L < lit(countLoBps.toLong) * nOld ||
        nNew * 10000L > lit(countHiBps.toLong) * nOld
      val nullDrift = abs(nullUNew - nullUOld) > nullJumpU
      struct(lit(c).as("col_name"), nOld.as("n_old"), nNew.as("n_new"),
        nullUOld.as("null_u_old"), nullUNew.as("null_u_new"),
        col(s"${c}__dst_old").as("distinct_old"),
        col(s"${c}__dst_new").as("distinct_new"),
        when(countDrift || nullDrift, "drift").otherwise("stable")
          .as("status"))
    }: _*)
    one.select(explode(rows).as("r")).select("r.*").orderBy(col("col_name"))
  }

  /** Constraint INFERENCE: derive a candidate sheet from a healthy
    * corpus — the bootstrap for [[TrainExport]] data contracts and
    * admission gates when nobody has written one yet (the Deequ
    * suggestion story). AT MOST TWO jobs at any column count
    * (spec-pinned): ONE profile aggregation pass (count / nulls /
    * exact distinct / numeric min-max for all columns together), then
    * driver-side rule application on that single row — plus, when any
    * string column qualifies for a set, ONE bounded values job shared
    * by every qualifying column (explode the (column, value) pairs
    * from the same scan, distinct, collect ≤ maxSetSize × #qualifying
    * rows — gated by the cardinalities the profile pass already
    * proved):
    *
    *  - zero nulls → `NotNull`; some nulls → `Completeness` at the
    *    observed floor (never tighter than the data it came from);
    *  - string column with ≤ `maxSetSize` distinct values covering at
    *    most 1/20 of the rows → `InSet` over the sorted value list;
    *  - numeric column → `InRange` at the observed [min, max];
    *  - non-null column whose values are all distinct → `Unique`.
    *
    * NaN discipline (float/double columns): min/max profile over the
    * non-NaN values (Spark orders NaN ABOVE every double, so one NaN
    * value would otherwise make the max NaN — a bound [[InRange]]
    * loudly rejects), and a column that contains ANY NaN gets no
    * range suggestion at all: NaN compares greater than every finite
    * hi bound, so no finite range can pass on that data — suggesting
    * one would break self-consistency. The column's other rules
    * (completeness, distinctness) still fire.
    *
    * SELF-CONSISTENCY (spec-pinned): every suggested check PASSES on
    * the frame it was inferred from. Suggestions are a starting point —
    * tighten bounds/slack by policy before committing them as a
    * contract; observed min-max in particular only describes the
    * corpus seen so far.
    */
  def suggest(df: DataFrame, cols: Seq[String],
              maxSetSize: Int = 20): Seq[Check] = {
    require(cols.nonEmpty, "no columns to profile")
    import org.apache.spark.sql.types._
    def isNum(dt: DataType) = dt match {
      case _: NumericType => true
      case _ => false
    }
    // isnan only types on float/double; every other numeric type has
    // no NaN to guard against
    def isFloating(dt: DataType) = dt == DoubleType || dt == FloatType
    val aggs = cols.flatMap { c =>
      val dt = df.schema(c).dataType
      val base = Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__null"),
        countDistinct(col(c)).as(s"${c}__dst"))
      if (isNum(dt)) {
        val clean = if (isFloating(dt)) when(!isnan(col(c)), col(c))
                    else col(c)
        val nanCnt = if (isFloating(dt))
          coalesce(sum(when(isnan(col(c)), 1L).otherwise(0L)), lit(0L))
        else lit(0L)
        base ++ Seq(min(clean).cast("double").as(s"${c}__min"),
          max(clean).cast("double").as(s"${c}__max"),
          nanCnt.as(s"${c}__nan"))
      } else base
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    def nulls(c: String) = row.getAs[Long](s"${c}__null")
    def dst(c: String) = row.getAs[Long](s"${c}__dst")
    // one shared values job for EVERY qualifying set column — the
    // per-column distinct-collect this replaces cost N extra corpus
    // scans on an N-column sheet (r13 verdict #6)
    val setQualified = cols.filter { c =>
      df.schema(c).dataType == StringType && dst(c) > 0 &&
        dst(c) <= maxSetSize && dst(c) * 20 <= n - nulls(c)
    }
    val setValues: Map[String, Seq[String]] =
      if (setQualified.isEmpty) Map.empty
      else df.select(explode(array(setQualified.map(c =>
          struct(lit(c).as("c"), col(c).as("v"))): _*)).as("p"))
        .select(col("p.c").as("c"), col("p.v").as("v"))
        .filter(col("v").isNotNull).distinct()
        .collect()
        .groupBy(_.getString(0))
        .map { case (k, rs) => k -> rs.map(_.getString(1)).sorted.toSeq }
    cols.flatMap { c =>
      val dt = df.schema(c).dataType
      val nullCheck: Seq[Check] =
        if (n == 0L) Nil
        else if (nulls(c) == 0L) Seq(NotNull(c))
        else Seq(Completeness(c, ((n - nulls(c)) * 10000L / n).toInt))
      val setCheck: Seq[Check] =
        setValues.get(c).map(vs => InSet(c, vs)).toSeq
      val rangeCheck: Seq[Check] = {
        val loIdx = if (isNum(dt)) Some(row.fieldIndex(s"${c}__min")) else None
        val hasNan = isNum(dt) && row.getAs[Long](s"${c}__nan") > 0L
        if (isNum(dt) && n - nulls(c) > 0 && !hasNan &&
            !row.isNullAt(loIdx.get))
          Seq(InRange(c, row.getAs[Double](s"${c}__min"),
            row.getAs[Double](s"${c}__max")))
        else Nil
      }
      val uniqueCheck: Seq[Check] =
        if (n > 0 && nulls(c) == 0L && dst(c) == n) Seq(Unique(Seq(c)))
        else Nil
      nullCheck ++ setCheck ++ rangeCheck ++ uniqueCheck
    }
  }

  /** [[suggest]] rendered as a cross-engine-hashable report:
    * `(col_name, kind, detail)` ordered by (col_name, kind). Numeric
    * bounds render as floor-micro BIGINTs, set values as the sorted
    * comma-joined list — integers and plain strings, so a DuckDB
    * oracle replays the inference rules exactly.
    */
  def suggestReport(df: DataFrame, cols: Seq[String],
                    maxSetSize: Int = 20): DataFrame = {
    val rows = suggest(df, cols, maxSetSize).map {
      case NotNull(c) => (c, "not_null", "")
      case Completeness(c, bps) => (c, "completeness", s"min_bps=$bps")
      case InSet(c, vs) => (c, "in_set", vs.map(String.valueOf).mkString(","))
      case InRange(c, lo, hi) => (c, "in_range",
        s"lo_u=${math.floor(lo * 1e6).toLong},hi_u=${math.floor(hi * 1e6).toLong}")
      case Unique(cs) => (cs.mkString(","), "unique", "")
      case other => (other.name, other.kind, "")
    }
    import df.sparkSession.implicits._
    rows.toDF("col_name", "kind", "detail")
      .orderBy(col("col_name"), col("kind"))
  }

  /** Schema drift between the two most recent retained generations of
    * a [[Compaction]] generational table: one row per column in either
    * snapshot — `added` / `dropped` / `type_changed` / `unchanged` —
    * the companion audit to [[generationDrift]]'s value-level checks
    * (a silently widened or vanished column is the ingest failure the
    * value metrics can't see). Driver-side METADATA only: one parquet
    * footer read per generation, zero data jobs at any scale.
    */
  def generationSchemaDrift(spark: SparkSession, path: String): DataFrame = {
    val gens = Compaction.generations(spark, path).sorted
    require(gens.length >= 2,
      s"schema-drift audit needs two retained generations, found $gens " +
        s"at $path")
    def types(g: Long): Map[String, String] =
      Compaction.readTableAt(spark, path, g).schema.fields
        .map(f => f.name -> f.dataType.simpleString).toMap
    val (oldT, newT) = (types(gens(gens.length - 2)), types(gens.last))
    val rows = (oldT.keySet ++ newT.keySet).toSeq.sorted.map { c =>
      val change = (oldT.get(c), newT.get(c)) match {
        case (Some(a), Some(b)) if a == b => "unchanged"
        case (Some(_), Some(_)) => "type_changed"
        case (None, _) => "added"
        case _ => "dropped"
      }
      (c, oldT.get(c).orNull, newT.get(c).orNull, change)
    }
    import spark.implicits._
    rows.toDF("col_name", "dtype_old", "dtype_new", "change")
  }

  /** Serialize a DATA-ONLY check to one single-line token for a
    * persisted contract (the [[TrainExport]] manifest): fields joined
    * with '|', free-text fields (column names, set values, regexes)
    * URL-encoded so any legal value — including '|', '=', and control
    * characters — round-trips. `Satisfies` wraps an arbitrary JVM
    * Column and is rejected: a persisted contract must be replayable
    * in a fresh process from the manifest alone.
    *
    * `InSet` values round-trip as STRINGS (`String.valueOf` at
    * serialize). Callers that persist contracts get the canonicalized
    * semantics on BOTH sides (commit canonicalizes through a
    * round-trip before validating), so commit and replay can never
    * disagree on a numeric-vs-string comparison.
    */
  def serialize(c: Check): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    c match {
      case NotNull(cn) => s"not_null|${enc(cn)}"
      case InRange(cn, lo, hi) => s"in_range|${enc(cn)}|$lo|$hi"
      case InSet(cn, allowed) =>
        (Seq("in_set", enc(cn)) ++
          allowed.map(v => enc(String.valueOf(v)))).mkString("|")
      case MatchesRegex(cn, re) => s"regex|${enc(cn)}|${enc(re)}"
      case NoMatch(cn, re, label) =>
        s"no_match|${enc(cn)}|${enc(re)}|${enc(label)}"
      case Completeness(cn, bps) => s"completeness|${enc(cn)}|$bps"
      case Unique(cols) => ("unique" +: cols.map(enc)).mkString("|")
      case s: Satisfies => throw new IllegalArgumentException(
        s"${s.name} cannot be persisted in a contract — Satisfies wraps " +
          "an arbitrary Column; express it as a data-only check")
    }
  }

  /** Inverse of [[serialize]]; fails loudly on unparseable tokens. */
  def deserialize(s: String): Check = {
    def dec(x: String) = java.net.URLDecoder.decode(x, "UTF-8")
    val parts = s.split("\\|", -1).toSeq
    parts.head match {
      case "not_null" if parts.length == 2 => NotNull(dec(parts(1)))
      case "in_range" if parts.length == 4 =>
        InRange(dec(parts(1)), parts(2).toDouble, parts(3).toDouble)
      case "in_set" if parts.length >= 2 =>
        InSet(dec(parts(1)), parts.drop(2).map(dec))
      case "regex" if parts.length == 3 =>
        MatchesRegex(dec(parts(1)), dec(parts(2)))
      case "no_match" if parts.length == 3 || parts.length == 4 =>
        NoMatch(dec(parts(1)), dec(parts(2)),
          if (parts.length == 4) dec(parts(3)) else "")
      case "completeness" if parts.length == 3 =>
        Completeness(dec(parts(1)), parts(2).toInt)
      case "unique" if parts.length >= 2 => Unique(parts.tail.map(dec))
      case _ => throw new IllegalArgumentException(
        s"unparseable contract check: '$s'")
    }
  }

  /** Output/scratch column names are claimed via `withColumn`, which
    * REPLACES an existing column of the same name — checked loudly
    * instead (the [[Sampling]] discipline).
    */
  private def requireColumnsFree(df: DataFrame, ctx: String,
                                 names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"$ctx writes column(s) ${clash.mkString(", ")} — rename them in " +
        "the input (they would be silently overwritten)")
  }

  // --------------------------------------------------------------------
  // Driver registry
  // --------------------------------------------------------------------

  /** The streaming admission sheet: three row-level checks that really
    * bite on the synthetic corpus (n_chars tails past 500, zh is
    * outside the allow-list) plus a per-batch Unique for the report.
    */
  private def streamingSheet: Seq[Check] = Seq(
    InRange("n_chars", 0.0, 500.0),
    InSet("lang", Seq("en", "fr", "de", "es")),
    MatchesRegex("source", "^src[0-9]+$"),
    Unique(Seq("doc_id")))

  /** Streaming-gate fixture: two MemoryStream micro-batches of
    * document metadata (doc_id%20==0, then %20==10 with its MIN-id row
    * duplicated so Unique bites) through
    * [[graft.streaming.StreamingDedup.attachValidated]]. Memoized per
    * dataset dir; the registered query times the report read — the
    * per-trigger gate cost is the map-only routing + one tiny
    * aggregate, benched by validate_constraints/validate_quarantine.
    */
  private def streamingValidateFor(s: SparkSession, d: String): String =
    TempFixtures.dir(s"svalidate:$d") { root =>
      val docs = Tables(s, d, "documents")
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, String, String, Long)]
      val q = graft.streaming.StreamingDedup.attachValidated(
          input.toDS().toDF("doc_id", "lang", "source", "n_chars"),
          streamingSheet,
          root + "/clean", root + "/quarantine", root + "/report")
        .option("checkpointLocation", root + "/ckpt")
        .start()
      try {
        // MemoryStream TRANSPORT harness collect (LlmShared doctrine):
        // a real deployment's batches arrive via readStream and never
        // touch the driver; the gate itself is fully distributed
        def slice(m: Long) = docs.filter(col("doc_id") % 20 === m)
          .select("doc_id", "lang", "source", "n_chars").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getLong(3))).toSeq
        input.addData(slice(0): _*)
        q.processAllAvailable()
        val b1 = slice(10)
        input.addData((b1 :+ b1.minBy(_._1)): _*)
        q.processAllAvailable()
      } finally q.stop()
    }

  /** The history-trail sheet: one threshold check, one range check,
    * one hard null check — three kinds so the trend query's status
    * and delta columns are proven on mixed check semantics.
    */
  private def historySheet: Seq[Check] = Seq(
    Completeness("o_orderdate", 9990),
    InRange("o_totalprice", 1000.0, 400000.0),
    NotNull("o_custkey"))

  /** Three publishes of a deliberately degrading orders table, each
    * report recorded via [[publishReport]] — generation 2 drops ~0.5%
    * of rows and nulls 2% of dates, generation 3 nulls 4% and pushes
    * some prices past the range cap. Memoized per dataset dir; the
    * registered query replays the whole trail through
    * [[historyTrend]].
    */
  private def historyFixtureFor(s: SparkSession, d: String): String =
    TempFixtures.dir(s"valhist:$d") { p =>
      val orders = Tables(s, d, "orders")
      def pub(g: Long, df: DataFrame): Unit =
        publishReport(s, p, g, report(df, historySheet))
      pub(1L, orders)
      pub(2L, orders.filter(col("o_orderkey") % 199 =!= 0)
        .withColumn("o_orderdate",
          when(col("o_orderkey") % 50 === 0, lit(null))
            .otherwise(col("o_orderdate"))))
      pub(3L, orders.filter(col("o_orderkey") % 101 =!= 0)
        .withColumn("o_orderdate",
          when(col("o_orderkey") % 25 === 0, lit(null))
            .otherwise(col("o_orderdate")))
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 3)
            .otherwise(col("o_totalprice"))))
    }

  /** The [[historySheet]] replayed per generation CTE in DuckDB —
    * same check shapes as the validate_constraints oracle.
    */
  private def histSql(g: Int, src: String): String = s"""
    SELECT CAST($g AS BIGINT) AS generation,
           'completeness:o_orderdate' AS check_name,
           'completeness' AS kind,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      FROM $src
    UNION ALL
    SELECT CAST($g AS BIGINT), 'in_range:o_totalprice', 'in_range',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                 AND (o_totalprice < 1000.0 OR o_totalprice > 400000.0)
                 THEN 1 ELSE 0 END) AS BIGINT)
      FROM $src
    UNION ALL
    SELECT CAST($g AS BIGINT), 'not_null:o_custkey', 'not_null',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM $src"""

  /** The [[suggestReport]] inference rules replayed in DuckDB for one
    * `orders` column — each rule is a HAVING-gated aggregate row, so
    * the oracle derives the SAME conditional suggestions from the data
    * rather than hardcoding an expected sheet (SF-independent).
    */
  private def suggSqlBase(c: String): String = s"""
    SELECT '$c' AS col_name, 'not_null' AS kind, '' AS detail FROM orders
      HAVING count(*) > 0 AND count(*) = count($c)
    UNION ALL
    SELECT '$c', 'completeness',
      'min_bps=' || CAST(count($c) * 10000 // count(*) AS BIGINT)
      FROM orders HAVING count(*) > count($c)
    UNION ALL
    SELECT '$c', 'unique', '' FROM orders
      HAVING count(*) > 0 AND count(*) = count($c)
         AND count(DISTINCT $c) = count(*)"""

  private def suggSqlNum(c: String): String = s"""${suggSqlBase(c)}
    UNION ALL
    SELECT '$c', 'in_range',
      'lo_u=' || CAST(floor(CAST(min($c) AS DOUBLE) * 1e6) AS BIGINT) ||
      ',hi_u=' || CAST(floor(CAST(max($c) AS DOUBLE) * 1e6) AS BIGINT)
      FROM orders HAVING count($c) > 0"""

  private def suggSqlStr(c: String): String = s"""${suggSqlBase(c)}
    UNION ALL
    SELECT '$c', 'in_set', string_agg(DISTINCT $c, ',' ORDER BY $c)
      FROM orders WHERE $c IS NOT NULL
      HAVING count(DISTINCT $c) BETWEEN 1 AND 20
         AND count(DISTINCT $c) * 20 <= count($c)"""

  val queries: Seq[GQuery] = Seq(
    // Mixed constraint sheet over orders: every row-level kind plus a
    // key-level Unique, all in one report — two checks fail by
    // construction (the range cap excludes the price tail; O/F
    // excludes status P; the priority regex excludes classes 4-5) so
    // the counting path is proven, not just the all-green path.
    GQuery("validate_constraints",
      (s, d) => {
        val orders = Tables(s, d, "orders")
        report(orders, Seq(
          NotNull("o_custkey"),
          InRange("o_totalprice", 1000.0, 400000.0),
          InSet("o_orderstatus", Seq("O", "F")),
          MatchesRegex("o_orderpriority", "^[1-3]-"),
          Completeness("o_orderdate", 9990),
          Satisfies("price_positive", col("o_totalprice") > 0),
          Unique(Seq("o_orderkey"))))
      },
      Some("""WITH n AS (SELECT count(*) AS n FROM orders),
        rows0 AS (
          SELECT 'completeness:o_orderdate' AS check_name,
                 'completeness' AS kind,
                 CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
            FROM orders
          UNION ALL
          SELECT 'in_range:o_totalprice', 'in_range',
                 CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                       AND (o_totalprice < 1000.0 OR o_totalprice > 400000.0)
                       THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
          UNION ALL
          SELECT 'in_set:o_orderstatus', 'in_set',
                 CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('O','F')
                       THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
          UNION ALL
          SELECT 'not_null:o_custkey', 'not_null',
                 CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
          UNION ALL
          SELECT 'regex:o_orderpriority', 'regex',
                 CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                       AND NOT regexp_matches(o_orderpriority, '^[1-3]-')
                       THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
          UNION ALL
          SELECT 'satisfies:price_positive', 'satisfies',
                 CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, TRUE)
                       THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
          UNION ALL
          SELECT 'unique:o_orderkey', 'unique',
                 CAST(coalesce((SELECT sum(c) FROM (
                     SELECT count(*) AS c FROM orders GROUP BY o_orderkey
                   ) g WHERE c > 1), 0) AS BIGINT))
        SELECT check_name, kind, n.n AS n_rows, n_violations,
               CAST(floor(n_violations * 1000000.0 / n.n) AS BIGINT) AS violation_u,
               CASE WHEN check_name = 'completeness:o_orderdate'
                    THEN CASE WHEN (n.n - n_violations) * 10000 >= 9990 * n.n
                              THEN 'pass' ELSE 'fail' END
                    WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        FROM rows0, n ORDER BY check_name""")),

    // Uniqueness across two tables and key widths: the single-column
    // order key is genuinely duplicated in lineitem (multi-line
    // orders) while the composite (orderkey, linenumber) is the true
    // PK — the report must separate the two, and orders' customer key
    // duplicates because customers reorder.
    GQuery("validate_unique",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val orders = Tables(s, d, "orders")
        report(li, Seq(Unique(Seq("l_orderkey")),
            Unique(Seq("l_orderkey", "l_linenumber"))))
          .unionByName(report(orders, Seq(Unique(Seq("o_custkey")))))
          .orderBy(col("check_name"))
      },
      Some("""WITH u AS (
          SELECT 'unique:l_orderkey' AS check_name,
                 CAST(sum(c) AS BIGINT) AS n_rows,
                 CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS n_violations
            FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey) g
          UNION ALL
          SELECT 'unique:l_orderkey,l_linenumber', CAST(sum(c) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
            FROM (SELECT count(*) AS c FROM lineitem
                  GROUP BY l_orderkey, l_linenumber) g
          UNION ALL
          SELECT 'unique:o_custkey', CAST(sum(c) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
            FROM (SELECT count(*) AS c FROM orders GROUP BY o_custkey) g)
        SELECT check_name, 'unique' AS kind, n_rows, n_violations,
               CAST(floor(n_violations * 1000000.0 / n_rows) AS BIGINT) AS violation_u,
               CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        FROM u ORDER BY check_name""")),

    // Referential integrity both ways: lineitem→orders holds by
    // construction; orders→(even-keyed customers) fails on every
    // odd-keyed customer's orders — the failing row proves orphan
    // counting through the left join, not just the green path.
    GQuery("validate_fk",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val orders = Tables(s, d, "orders")
        val evenCust = Tables(s, d, "customer")
          .filter(col("c_custkey") % 2 === 0)
        foreignKey(li, Seq("l_orderkey"), orders, Seq("o_orderkey"))
          .unionByName(
            foreignKey(orders, Seq("o_custkey"), evenCust, Seq("c_custkey")))
          .orderBy(col("check_name"))
      },
      Some("""WITH f AS (
          SELECT 'fk:l_orderkey->o_orderkey' AS check_name,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN l_orderkey IS NOT NULL AND NOT EXISTS (
                     SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
            FROM lineitem
          UNION ALL
          SELECT 'fk:o_custkey->c_custkey', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN o_custkey IS NOT NULL AND NOT EXISTS (
                     SELECT 1 FROM customer
                     WHERE c_custkey = o_custkey AND c_custkey % 2 = 0)
                   THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders)
        SELECT check_name, 'foreign_key' AS kind, n_rows, n_violations,
               CAST(floor(n_violations * 1000000.0 / n_rows) AS BIGINT) AS violation_u,
               CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        FROM f ORDER BY check_name""")),

    // Row-level enforcement: quarantined documents with their reasons
    // (declaration order), rendered as a comma string for the
    // cross-engine hash. Both checks really bite on the synthetic
    // corpus (n_chars tails past 500; zh is outside the allow-list)
    // and some rows violate both — the multi-reason path is covered.
    GQuery("validate_quarantine",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        quarantine(docs, Seq(
            InRange("n_chars", 0.0, 500.0),
            InSet("lang", Seq("en", "fr", "de", "es"))))
          .select(col("doc_id"), col("lang"), col("n_chars"),
            concat_ws(",", col("violations")).as("reasons"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, n_chars,
               concat_ws(',',
                 CASE WHEN n_chars IS NOT NULL
                       AND (n_chars < 0.0 OR n_chars > 500.0)
                      THEN 'in_range:n_chars' END,
                 CASE WHEN lang IS NOT NULL
                       AND lang NOT IN ('en','fr','de','es')
                      THEN 'in_set:lang' END) AS reasons
        FROM documents
        WHERE (n_chars IS NOT NULL AND (n_chars < 0.0 OR n_chars > 500.0))
           OR (lang IS NOT NULL AND lang NOT IN ('en','fr','de','es'))
        ORDER BY doc_id""")),

    // Generation-over-generation drift on a generational table: g2
    // drops 1 row in 199 (inside the ±1% count band) and nulls
    // o_orderdate on every 50th key (a 2% null jump, far over the
    // 0.1% alarm) — exactly one column must flag drift. The fixture
    // is memoized per dataset dir; the timed path is the audit a
    // pipeline runs between publish and promote: two single-pass
    // profile aggregates + a broadcast join.
    GQuery("validate_generation_drift",
      (s, d) => {
        val path = TempFixtures.dir(s"valdrift:$d") { p =>
          val orders = Tables(s, d, "orders")
          Compaction.writeGen(orders, p)
          val degraded = orders.filter(col("o_orderkey") % 199 =!= 0)
            .withColumn("o_orderdate",
              when(col("o_orderkey") % 50 === 0, lit(null).cast("timestamp"))
                .otherwise(col("o_orderdate")))
          Compaction.writeGen(degraded, p)
        }
        generationDrift(s, path,
          Seq("o_custkey", "o_totalprice", "o_orderdate"))
      },
      Some("""WITH gnew AS (
          SELECT o_custkey, o_totalprice,
                 CASE WHEN o_orderkey % 50 = 0 THEN NULL
                      ELSE o_orderdate END AS o_orderdate
            FROM orders WHERE o_orderkey % 199 <> 0),
        old_m AS (
          SELECT count(*) AS n,
                 CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl1,
                 CAST(count(DISTINCT o_custkey) AS BIGINT) AS d1,
                 CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl2,
                 CAST(count(DISTINCT o_totalprice) AS BIGINT) AS d2,
                 CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl3,
                 CAST(count(DISTINCT o_orderdate) AS BIGINT) AS d3
            FROM orders),
        new_m AS (
          SELECT count(*) AS n,
                 CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl1,
                 CAST(count(DISTINCT o_custkey) AS BIGINT) AS d1,
                 CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl2,
                 CAST(count(DISTINCT o_totalprice) AS BIGINT) AS d2,
                 CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl3,
                 CAST(count(DISTINCT o_orderdate) AS BIGINT) AS d3
            FROM gnew),
        cols AS (
          SELECT 'o_custkey' AS col_name, o.n AS n_old, w.n AS n_new,
                 o.nl1 AS nulls_old, w.nl1 AS nulls_new,
                 o.d1 AS distinct_old, w.d1 AS distinct_new
            FROM old_m o, new_m w
          UNION ALL
          SELECT 'o_totalprice', o.n, w.n, o.nl2, w.nl2, o.d2, w.d2
            FROM old_m o, new_m w
          UNION ALL
          SELECT 'o_orderdate', o.n, w.n, o.nl3, w.nl3, o.d3, w.d3
            FROM old_m o, new_m w)
        SELECT col_name, CAST(n_old AS BIGINT) AS n_old,
               CAST(n_new AS BIGINT) AS n_new,
               CAST(floor(nulls_old * 1000000.0 / n_old) AS BIGINT) AS null_u_old,
               CAST(floor(nulls_new * 1000000.0 / n_new) AS BIGINT) AS null_u_new,
               distinct_old, distinct_new,
               CASE WHEN n_new * 10000 < 9900 * n_old
                      OR n_new * 10000 > 10100 * n_old
                      OR abs(CAST(floor(nulls_new * 1000000.0 / n_new) AS BIGINT)
                           - CAST(floor(nulls_old * 1000000.0 / n_old) AS BIGINT)) > 1000
                    THEN 'drift' ELSE 'stable' END AS status
        FROM cols ORDER BY col_name""")),

    // Constraint INFERENCE over orders: the suggestion rules (not a
    // hardcoded expected sheet) replayed conditionally in DuckDB —
    // each rule is a HAVING-gated aggregate, so both engines derive
    // the same suggestions from the same stats at any SF. On this
    // corpus that means NotNull everywhere, InRange on the three
    // numeric columns, InSet on the two low-cardinality strings, and
    // Unique on the order key.
    GQuery("validate_suggest",
      (s, d) => suggestReport(Tables(s, d, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")),
      Some(s"""WITH sugg AS (${suggSqlNum("o_orderkey")}
          UNION ALL ${suggSqlNum("o_custkey")}
          UNION ALL ${suggSqlStr("o_orderstatus")}
          UNION ALL ${suggSqlNum("o_totalprice")}
          UNION ALL ${suggSqlBase("o_orderdate")}
          UNION ALL ${suggSqlStr("o_orderpriority")})
        SELECT col_name, kind, detail FROM sugg
        ORDER BY col_name, kind""")),

    // Schema drift between two publishes: g2 drops a column, adds one,
    // and narrows a double to decimal — the audit must name all three
    // alongside the unchanged columns. The Spark side reads real
    // generational parquet footers; the oracle enumerates the expected
    // verdict (the fixture's construction is the specification).
    GQuery("validate_schema_drift",
      (s, d) => {
        val path = TempFixtures.dir(s"valschema:$d") { p =>
          val orders = Tables(s, d, "orders")
          Compaction.writeGen(orders, p)
          Compaction.writeGen(orders
            .drop("o_orderpriority")
            .withColumn("o_comment", concat(lit("c"), col("o_orderkey")))
            .withColumn("o_totalprice",
              col("o_totalprice").cast("decimal(12,2)")), p)
        }
        generationSchemaDrift(s, path)
      },
      Some("""SELECT * FROM (VALUES
          ('o_comment', NULL, 'string', 'added'),
          ('o_custkey', 'bigint', 'bigint', 'unchanged'),
          ('o_orderdate', 'timestamp_ntz', 'timestamp_ntz', 'unchanged'),
          ('o_orderkey', 'bigint', 'bigint', 'unchanged'),
          ('o_orderpriority', 'string', NULL, 'dropped'),
          ('o_orderstatus', 'string', 'string', 'unchanged'),
          ('o_totalprice', 'double', 'decimal(12,2)', 'type_changed'))
        AS t(col_name, dtype_old, dtype_new, change)
        ORDER BY col_name""")),

    // VALIDATION HISTORY: three publishes of a degrading table, each
    // report persisted per generation (publishReport, idempotence
    // spec-pinned), replayed as violation trajectories with per-check
    // deltas. The oracle recomputes each generation's report
    // closed-form from the fixture's construction and applies the
    // same lag window — both engines derive the whole trail from the
    // data, at any SF.
    GQuery("validate_history",
      (s, d) => historyTrend(s, historyFixtureFor(s, d), k = 3),
      Some(s"""WITH g1 AS (SELECT o_custkey, o_totalprice, o_orderdate
            FROM orders),
        g2 AS (
          SELECT o_custkey, o_totalprice,
                 CASE WHEN o_orderkey % 50 = 0 THEN NULL
                      ELSE o_orderdate END AS o_orderdate
            FROM orders WHERE o_orderkey % 199 <> 0),
        g3 AS (
          SELECT o_custkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 3
                      ELSE o_totalprice END AS o_totalprice,
                 CASE WHEN o_orderkey % 25 = 0 THEN NULL
                      ELSE o_orderdate END AS o_orderdate
            FROM orders WHERE o_orderkey % 101 <> 0),
        rep AS (${histSql(1, "g1")}
          UNION ALL ${histSql(2, "g2")}
          UNION ALL ${histSql(3, "g3")}),
        scored AS (
          SELECT check_name, kind, generation, n_rows, n_violations,
                 CASE WHEN n_rows = 0 THEN 0
                      ELSE CAST(floor(n_violations * 1000000.0 / n_rows)
                                AS BIGINT) END AS violation_u,
                 CASE WHEN kind = 'completeness'
                      THEN CASE WHEN (n_rows - n_violations) * 10000
                                     >= 9990 * n_rows
                                THEN 'pass' ELSE 'fail' END
                      ELSE CASE WHEN n_violations = 0
                                THEN 'pass' ELSE 'fail' END
                 END AS status
            FROM rep)
        SELECT check_name, kind, generation, n_rows, n_violations,
               violation_u,
               violation_u - lag(violation_u) OVER (
                 PARTITION BY check_name ORDER BY generation) AS delta_u,
               status
        FROM scored ORDER BY check_name, generation""")),

    // STREAMING ADMISSION GATE: per-micro-batch constraint reports
    // from StreamingDedup.attachValidated — batch 1 carries a
    // deliberately duplicated row, so the per-batch Unique fails in
    // exactly one batch while the row-level checks bite in both. The
    // oracle rebuilds each batch's slice (including the duplicate)
    // and replays all four checks per batch.
    GQuery("streaming_validate",
      (s, d) => {
        val p = streamingValidateFor(s, d)
        s.read.parquet(p + "/report")
          .select(col("batch").cast("int").as("batch"), col("check_name"),
            col("kind"), col("n_rows"), col("n_violations"),
            col("violation_u"), col("status"))
          .orderBy(col("batch"), col("check_name"))
      },
      Some(SvRepSql + """
        SELECT batch, check_name, kind, n_rows, n_violations,
               CAST(floor(n_violations * 1000000.0 / n_rows) AS BIGINT) AS violation_u,
               CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        FROM rep ORDER BY batch, check_name""")),

    // Trend over the STREAMING gate's report feed: the same fixture's
    // two batches as violation trajectories with per-check lag deltas
    // — the alerting view. Oracle = the same per-batch report CTEs
    // plus the identical lag window.
    GQuery("streaming_validate_trend",
      (s, d) => {
        val p = streamingValidateFor(s, d)
        batchTrend(s, p + "/report", k = 2)
      },
      Some(SvRepSql + """,
        scored AS (
          SELECT check_name, kind, CAST(batch AS BIGINT) AS batch,
                 n_rows, n_violations,
                 CAST(floor(n_violations * 1000000.0 / n_rows) AS BIGINT) AS violation_u,
                 CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
            FROM rep)
        SELECT check_name, kind, batch, n_rows, n_violations, violation_u,
               violation_u - lag(violation_u) OVER (
                 PARTITION BY check_name ORDER BY batch) AS delta_u,
               status
        FROM scored ORDER BY check_name, batch"""))
  )

  /** The streaming-gate fixture's per-batch reports, replayed as
    * DuckDB CTEs — shared by the streaming_validate row and its trend
    * twin so the two oracles can never drift apart.
    */
  // lazy: declared below `queries`, which references it — object vals
  // initialize in declaration order and an eager val here would be
  // null inside the query literals at class-init time
  private lazy val SvRepSql = """WITH b0 AS (
          SELECT doc_id, lang, source, n_chars FROM documents
          WHERE doc_id % 20 = 0),
        b1 AS (
          SELECT doc_id, lang, source, n_chars FROM documents
          WHERE doc_id % 20 = 10
          UNION ALL
          SELECT doc_id, lang, source, n_chars FROM documents
          WHERE doc_id = (SELECT min(doc_id) FROM documents
                          WHERE doc_id % 20 = 10)),
        rep AS (
          SELECT 0 AS batch, 'in_range:n_chars' AS check_name,
                 'in_range' AS kind, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN n_chars IS NOT NULL
                       AND (n_chars < 0.0 OR n_chars > 500.0)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
            FROM b0
          UNION ALL
          SELECT 0, 'in_set:lang', 'in_set', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN lang IS NOT NULL
                       AND lang NOT IN ('en','fr','de','es')
                       THEN 1 ELSE 0 END) AS BIGINT)
            FROM b0
          UNION ALL
          SELECT 0, 'regex:source', 'regex', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN source IS NOT NULL
                       AND NOT regexp_matches(source, '^src[0-9]+$')
                       THEN 1 ELSE 0 END) AS BIGINT)
            FROM b0
          UNION ALL
          SELECT 0, 'unique:doc_id', 'unique', CAST(sum(c) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
            FROM (SELECT count(*) AS c FROM b0 GROUP BY doc_id) g
          UNION ALL
          SELECT 1, 'in_range:n_chars', 'in_range', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN n_chars IS NOT NULL
                       AND (n_chars < 0.0 OR n_chars > 500.0)
                       THEN 1 ELSE 0 END) AS BIGINT)
            FROM b1
          UNION ALL
          SELECT 1, 'in_set:lang', 'in_set', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN lang IS NOT NULL
                       AND lang NOT IN ('en','fr','de','es')
                       THEN 1 ELSE 0 END) AS BIGINT)
            FROM b1
          UNION ALL
          SELECT 1, 'regex:source', 'regex', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN source IS NOT NULL
                       AND NOT regexp_matches(source, '^src[0-9]+$')
                       THEN 1 ELSE 0 END) AS BIGINT)
            FROM b1
          UNION ALL
          SELECT 1, 'unique:doc_id', 'unique', CAST(sum(c) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
            FROM (SELECT count(*) AS c FROM b1 GROUP BY doc_id) g)"""
}
