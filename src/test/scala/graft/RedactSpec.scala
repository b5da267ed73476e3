package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Redact
import graft.ops.Redact.Rule

/** PII span redaction semantics on hand-built rows: replacement
  * parity-critical behaviors (all-occurrence replace, sheet-order
  * chaining, boundary anchoring), the pre-scrub hit counting, the
  * one-pass report, and the rule-sheet guards — the paths the planted
  * oracle fixture exercises only at its own data shape.
  */
class RedactSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  test("apply scrubs every occurrence of every class; unmatched text is untouched") {
    val df = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org twice"),
      (2L, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1"),
      (3L, "clean text, nothing to scrub"),
      (4L, "versions 1.2.3.4.5 are not a full ip boundary test")
    ).toDF("id", "text")
    val out = Redact.apply(df, "text").orderBy("id")
      .select("text").as[String].collect()
    assert(out(0) == "mail <EMAIL> and <EMAIL> twice",
      s"all occurrences must replace: ${out(0)}")
    assert(out(1) == "ssn <SSN> phone <PHONE> ip <IP>", out(1))
    assert(out(2) == "clean text, nothing to scrub")
    // 1.2.3.4.5: the ipv4 rule is \b-anchored on digit runs — the
    // leading 1.2.3.4 matches (the .5 tail starts after the \b);
    // pinning the actual behavior here keeps parity observable
    assert(out(3) == "versions <IP>.5 are not a full ip boundary test",
      out(3))
  }

  test("redacted counts hits on the ORIGINAL text, then scrubs; report is one pass with per-rule rows") {
    val df = Seq(
      (1L, "a@b.co and 10.0.0.1 and 10.0.0.2"),
      (2L, "no pii here"),
      (3L, "123-45-6789")
    ).toDF("id", "text")
    val r = Redact.redacted(df, "text").orderBy("id")
      .select("text", "pii_hits").as[(String, Long)].collect()
    assert(r(0) == (("<EMAIL> and <IP> and <IP>", 3L)), r(0).toString)
    assert(r(1) == (("no pii here", 0L)))
    assert(r(2) == (("<SSN>", 1L)))
    val rep = Redact.report(df, "text").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3)))).toMap
    assert(rep("email") == ((3L, 1L, 1L)))
    assert(rep("ipv4") == ((3L, 1L, 2L)), "2 matches in 1 doc")
    assert(rep("ssn") == ((3L, 1L, 1L)))
    assert(rep("phone") == ((3L, 0L, 0L)))
  }

  test("sheet order chains: specific rules must come before general ones, and do in StandardRules") {
    // SSN is declared before phone; a 3-2-4 shape must land as <SSN>,
    // never be half-eaten by the 3-3-4 phone rule
    val df = Seq((1L, "id 123-45-6789 then 555-123-4567")).toDF("id", "text")
    val out = Redact.apply(df, "text").select("text").as[String].head()
    assert(out == "id <SSN> then <PHONE>")
    // a custom sheet where a GENERAL rule precedes shows the chaining
    // hazard the scaladoc warns about — pinned so the contract is real
    val general = Seq(
      Rule("digits", "[0-9]+", "<N>"),
      Rule("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"))
    val out2 = Redact.apply(df, "text", general)
      .select("text").as[String].head()
    assert(out2 == "id <N>-<N>-<N> then <N>-<N>-<N>",
      s"general-first eats the specific match: $out2")
  }

  test("noPiiContract gates an export: raw text never commits, the redaction recipe does") {
    import graft.ops.TrainExport
    import graft.sources.Compaction
    val root = java.nio.file.Files.createTempDirectory("graft_redexp").toString
    val docs = Seq((1L, "mail a@b.co now"), (2L, "clean row"))
      .toDF("doc_id", "text")
    Compaction.writeGen(docs, s"$root/docs")
    // a pass-through recipe ships the PII — the contract aborts the
    // commit BEFORE the manifest CAS
    TrainExport.registerRecipe("spec_raw_export") { (s, in, p) =>
      in.table("docs").select("doc_id", "text")
    }
    val e = intercept[RuntimeException](
      TrainExport.commit(spark, s"$root/bad", "spec_raw_export",
        params = Map.empty, tables = Map("docs" -> s"$root/docs"),
        indexes = Map.empty, contract = Redact.noPiiContract()))
    assert(e.getMessage.contains("no_match:text:email"), e.getMessage)
    intercept[RuntimeException](TrainExport.manifest(spark, s"$root/bad"))
    // the redaction recipe under the SAME contract commits — the
    // shipped bytes provably carry no rule-matching span
    val m = TrainExport.commit(spark, s"$root/good", Redact.RedactRecipe,
      params = Map.empty, tables = Map("docs" -> s"$root/docs"),
      indexes = Map.empty, contract = Redact.noPiiContract())
    assert(m.contract.length == Redact.StandardRules.length)
    val out = spark.read.parquet(s"$root/good/data").orderBy("doc_id")
      .select("text").as[String].collect()
    assert(out.toSeq == Seq("mail <EMAIL> now", "clean row"))
    // and the consumer-side audit over the shipped data stays green
    assert(TrainExport.auditContract(spark, s"$root/good")
      .filter(col("status") === "fail").count() == 0)
  }

  test("attachRedacted: per-batch scrubbed rows and audit report") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_redstr").toString
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup.attachRedacted(
        input.toDS().toDF("doc_id", "text"), "text",
        Redact.StandardRules, root + "/out", root + "/report")
      .option("checkpointLocation", root + "/ckpt")
      .start()
    try {
      input.addData((1L, "a@b.co here"), (2L, "clean"))
      q.processAllAvailable()
      input.addData((3L, "ip 10.0.0.1 and 10.0.0.2"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(root + "/out")
      .select("batch", "doc_id", "text", "pii_hits")
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      (0L, 1L, "<EMAIL> here", 1L),
      (0L, 2L, "clean", 0L),
      (1L, 3L, "ip <IP> and <IP>", 2L)), out.mkString(","))
    val rep = spark.read.parquet(root + "/report")
      .filter(col("batch") === 1L && col("rule_name") === "ipv4")
      .select("docs_hit", "total_matches").as[(Long, Long)].head()
    assert(rep == ((1L, 2L)))
    // claimed-column guard
    intercept[IllegalArgumentException](
      graft.streaming.StreamingDedup.attachRedacted(
        input.toDS().toDF("doc_id", "pii_hits"), "pii_hits",
        Redact.StandardRules, root + "/x", root + "/y"))
  }

  test("pii_hits semantics pinned: independent per-rule counts on the original text, NOT replacement counts (overlapping custom sheets double-count)") {
    // StandardRules are constructed NOT to overlap: the email rule
    // requires a letter TLD, so an @-glued ipv4 is ONE ipv4 hit
    val std = Redact.redacted(Seq((1L, "ping user@10.0.0.1 ok"))
      .toDF("id", "text"), "text")
    val r = std.select("text", "pii_hits").as[(String, Long)].head()
    assert(r == ("ping user@<IP> ok", 1L), s"got $r")
    // an OVERLAPPING custom sheet: ipv4 then bare digit runs — the
    // one span "1.2.3.4" counts 1 (ipv4) + 4 (digit runs) = 5 hits on
    // the original text while the chain performs ONE replacement (the
    // digit rule sees "<IP>", which carries no digits). This is the
    // documented density-not-replacement contract; a sheet author who
    // needs replacement counts diffs report(apply(df)) instead.
    val overlapping = Seq(
      Rule("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
        "<IP>"),
      Rule("digits", "[0-9]+", "<NUM>"))
    val o = Redact.redacted(Seq((1L, "from 1.2.3.4 end"))
        .toDF("id", "text"), "text", overlapping)
      .select("text", "pii_hits").as[(String, Long)].head()
    assert(o == ("from <IP> end", 5L),
      s"overlap must double-count hits yet scrub once: $o")
    // and the ipv4 rule's documented false-positive class: a dotted
    // version string in prose is indistinguishable from an address
    val v = Redact.apply(Seq((1L, "since v 10.0.3.77 shipped"))
        .toDF("id", "text"), "text")
      .select("text").as[String].head()
    assert(v == "since v <IP> shipped",
      s"dotted version strings scrub as ipv4 (documented tradeoff): $v")
  }

  test("batchTrend over attachRedacted's report feed: per-rule hit trajectories with lag deltas") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files
      .createTempDirectory("graft_redtrend").toString
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup.attachRedacted(
        input.toDF().toDF("doc_id", "text"), "text",
        Redact.StandardRules, root + "/out", root + "/report")
      .option("checkpointLocation", root + "/ckpt")
      .start()
    try {
      // batch 0: 1 of 2 docs carries an email; batch 1: 2 of 2 do —
      // the email hit ratio jumps 500000 -> 1000000 micro-units
      input.addData((1L, "write a@b.co now"), (2L, "clean"))
      q.processAllAvailable()
      input.addData((3L, "c@d.org"), (4L, "e@f.org and g@h.org"))
      q.processAllAvailable()
    } finally q.stop()
    val t = Redact.batchTrend(spark, root + "/report", k = 2)
      .filter(col("rule_name") === "email")
      .select("batch", "docs_hit", "total_matches", "hit_u", "delta_u")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) null else r.getLong(4)))
    assert(t.toSeq == Seq((0L, 1L, 1L, 500000L, null),
      (1L, 2L, 3L, 1000000L, 500000L)), s"trend: ${t.toSeq}")
  }

  test("requireStableSheet: rejects rules that match any replacement token; StandardRules pass") {
    Redact.requireStableSheet(Redact.StandardRules) // the shipped sheet
    // a rule matching its OWN replacement breaks scrub idempotence
    val selfEating = Seq(Rule("num", "[0-9]+", "<NUM1>"))
    val e1 = intercept[IllegalArgumentException](
      Redact.requireStableSheet(selfEating))
    assert(e1.getMessage.contains("unstable rule sheet") &&
      e1.getMessage.contains("not be idempotent"), e1.getMessage)
    // a rule matching ANOTHER rule's replacement rewrites its sentinel
    val crossEating = Seq(
      Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
        "<EMAIL>"),
      Rule("angle", "<[A-Z]+>", "X"))
    val e2 = intercept[IllegalArgumentException](
      Redact.requireStableSheet(crossEating))
    assert(e2.getMessage.contains("'angle'") &&
      e2.getMessage.contains("<EMAIL>"), e2.getMessage)
  }

  test("requireStableSheet catches boundary-spanning rules (r15 ADVICE): a rule matching a span straddling a sentinel and adjacent text") {
    // '>a' never matches the bare token '<S>' — only the embedded
    // probe 'a<S>a' exposes the straddle (the scrub would rewrite the
    // sentinel's closing bracket together with surviving text)
    val straddling = Seq(
      Rule("secret", "secret", "<S>"),
      Rule("bad", ">a", "!"))
    val e = intercept[IllegalArgumentException](
      Redact.requireStableSheet(straddling))
    assert(e.getMessage.contains("'bad'") &&
      e.getMessage.contains("embedded in surviving text"), e.getMessage)
    // a rule matching ONLY the context padding must NOT be flagged —
    // 'aa' appears in no probe ('a<S>a' has single a's on each side)
    Redact.requireStableSheet(Seq(
      Rule("secret", "secret", "<S>"),
      Rule("fine", "aa", "<AA>")))
  }

  test("batchTrend lags over the FULL report history (r15 ADVICE): the earliest in-window batch keeps its true delta") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_redtrend2").toString
    // a hand-landed 3-batch report feed (the attachRedacted layout)
    Seq((0L, "email", 4L, 1L, 1L), (1L, "email", 4L, 2L, 2L),
        (2L, "email", 4L, 4L, 5L))
      .toDF("batch", "rule_name", "n_rows", "docs_hit", "total_matches")
      .write.partitionBy("batch").parquet(root + "/report")
    val t = Redact.batchTrend(spark, root + "/report", k = 2)
      .select("batch", "hit_u", "delta_u")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
    // window = batches {1, 2}; batch 1's delta vs batch 0 (OUTSIDE the
    // window but INSIDE the feed) must be carried — on r15 code it was
    // silently null
    assert(t.toSeq == Seq((1L, 500000L, 250000L), (2L, 1000000L, 500000L)),
      s"trend: ${t.toSeq}")
  }

  test("rule-sheet guards fail loudly") {
    val df = Seq((1L, "x")).toDF("id", "text")
    intercept[IllegalArgumentException](Redact.apply(df, "text", Nil))
    intercept[IllegalArgumentException](Redact.apply(df, "text",
      Seq(Rule("a", "x", "y"), Rule("a", "z", "w"))))
    intercept[IllegalArgumentException](Rule("bad name", "x", "y"))
    intercept[IllegalArgumentException](Rule("grp", "(x)", "$1"))
    intercept[IllegalArgumentException](
      Redact.redacted(df.withColumn("pii_hits", lit(1L)), "text"))
  }
}
