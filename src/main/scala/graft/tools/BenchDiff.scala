package graft.tools

/** Self-diffing bench triage — compares two `Bench` full artifacts and
  * separates plan regressions from host noise, the adjudication that
  * previously needed manual TimeQ forensics every round (r8 "+30%
  * drift", r10 steal episodes, r11's degraded-host artifact).
  *
  * Usage: `runMain graft.tools.BenchDiff [current] [prior]`
  * Defaults: `bench_full_latest.json` vs the highest-numbered committed
  * `bench_full_r*.json` in the working directory.
  *
  * Interpretation rules (the round workflow's, made executable):
  *  - steal_pct > 0.5 in EITHER artifact → per-query flags are
  *    UNRELIABLE; re-run on an idle box before reading them (a steal
  *    episode inflates all queries ~uniformly — median ratio >> 1 with
  *    flat spread is host noise, not a regression);
  *  - flags are ratio > 1.5 with the prior ≥ 0.05 s (sub-50 ms rows
  *    are pure jitter at local[32]);
  *  - a missing steal_pct (pre-round-12 artifact) reads as unknown.
  */
object BenchDiff {

  private val Pair = """"([^"]+)":(-?[0-9][0-9.eE+\-]*)""".r

  private def mapOf(json: String, name: String): Map[String, Double] = {
    val key = "\"" + name + "\":{"
    val i = json.indexOf(key)
    if (i < 0) return Map.empty
    val start = i + key.length
    val end = json.indexOf('}', start)
    Pair.findAllMatchIn(json.substring(start, end))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  private def queriesOf(json: String): Map[String, Double] =
    mapOf(json, "queries")

  private def scalarOf(json: String, name: String): Option[Double] = {
    val key = s""""$name":"""
    val i = json.indexOf(key)
    if (i < 0) None
    else """-?[0-9][0-9.eE+\-]*""".r
      .findPrefixOf(json.substring(i + key.length)).map(_.toDouble)
  }

  def main(args: Array[String]): Unit = {
    val curPath = args.headOption.getOrElse("bench_full_latest.json")
    val priorPath = args.lift(1).getOrElse {
      // order by the ROUND NUMBER, not lexicographically — "r9" sorts
      // after "r12" as a string and would silently pick a stale prior
      val RName = """bench_full_r(\d+)\.json""".r
      val rs = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .map(_.getName).collect { case n @ RName(num) => (num.toInt, n) }
        .sorted
      require(rs.nonEmpty, "no committed bench_full_r*.json to diff against")
      rs.last._2
    }
    def read(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    val (cur, prior) = (read(curPath), read(priorPath))
    val (cq, pq) = (queriesOf(cur), queriesOf(prior))
    val (cSteal, pSteal) = (scalarOf(cur, "steal_pct"),
      scalarOf(prior, "steal_pct"))
    println(f"current  $curPath%s  total=${scalarOf(cur, "value").getOrElse(-1.0)}%.1f s  " +
      s"queries=${cq.size}  steal_pct=${cSteal.map(_.toString).getOrElse("unknown")}")
    println(f"prior    $priorPath%s  total=${scalarOf(prior, "value").getOrElse(-1.0)}%.1f s  " +
      s"queries=${pq.size}  steal_pct=${pSteal.map(_.toString).getOrElse("unknown")}")
    val added = (cq.keySet -- pq.keySet).toSeq.sorted
    val removed = (pq.keySet -- cq.keySet).toSeq.sorted
    if (added.nonEmpty) println(s"new queries (${added.size}): ${added.mkString(", ")}")
    if (removed.nonEmpty) println(s"REMOVED queries (${removed.size}): ${removed.mkString(", ")}")
    val ratios = cq.keySet.intersect(pq.keySet).toSeq
      .filter(k => cq(k) >= 0 && pq(k) > 0)
      .map(k => (k, cq(k), pq(k), cq(k) / pq(k)))
      .sortBy(-_._4)
    require(ratios.nonEmpty, "no comparable queries between the artifacts")
    val median = ratios.map(_._4).sorted.apply(ratios.size / 2)
    println(f"median ratio ${median}%.3f over ${ratios.size} comparable queries")
    // flags are trustworthy only when BOTH artifacts are measured AND
    // clean: a steal-inflated PRIOR hides a real current regression
    // behind a <1.5 ratio just as a steal-inflated CURRENT fakes one;
    // a missing/unreadable steal_pct (pre-round-12 artifact, non-Linux)
    // reads as unknown, not clean
    val cClean = cSteal.exists(s => s >= 0 && s <= 0.5)
    val pClean = pSteal.exists(s => s >= 0 && s <= 0.5)
    val stealClean = cClean && pClean
    if (cClean && !pClean)
      println("note: prior artifact's steal_pct is high or unknown — " +
        "ratios may UNDERSTATE regressions (inflated baseline)")
    val flagged = ratios.filter(r => r._4 > 1.5 && r._3 >= 0.05)
    if (flagged.isEmpty)
      println("no query regressed past 1.5x (prior >= 0.05 s)")
    else {
      val tag = if (stealClean) "REGRESSION CANDIDATES (steal clean — investigate plans)"
        else "flagged >1.5x, but steal_pct is high/unknown — RE-RUN ON AN IDLE BOX before believing these"
      println(s"$tag:")
      flagged.take(20).foreach { case (k, c, p, r) =>
        println(f"  $k%-40s ${p}%8.2f -> ${c}%8.2f  (${r}%.2fx)")
      }
    }
    // STEAL-IMMUNE channels (r16/r17): per-query executor CPU time
    // ("cpu", the task-metrics listener) and per-query PROCESS CPU
    // ("pcpu", /proc/self/stat — covers driver-side work the listener
    // can't see; in local mode it is a superset of "cpu"). Host steal
    // stretches wall clocks, not burned cycles, so a CPU flag is a
    // real compute regression regardless of steal. PER-QUERY rule
    // (r16 ADVICE): a wall flag is downgraded to host noise ONLY when
    // THAT query has a comparable, flat CPU ratio in some channel —
    // a wall-flagged query with no CPU coverage (tiny prior cpu,
    // absent from the maps) keeps its explain-or-fix status; blanket
    // "CPU flags nothing, all wall flags are noise" cleared
    // driver-heavy and IO-bound regressions with no evidence.
    // NOISE BOUND (measured r16, four windows): cpu_total agrees ~1%
    // across quiet windows but inflates up to ~6% under cache
    // contention (stall cycles count as CPU) — totals within ±6% are
    // within noise; the 1.5x per-query flag threshold is far outside.
    def channelRatios(name: String): Seq[(String, Double, Double, Double)] = {
      val (c, p) = (mapOf(cur, name), mapOf(prior, name))
      c.keySet.intersect(p.keySet).toSeq
        .filter(k => c(k) >= 0 && p(k) > 0)
        .map(k => (k, c(k), p(k), c(k) / p(k)))
        .sortBy(-_._4)
    }
    val cpuRatios = channelRatios("cpu")
    val pcpuRatios = channelRatios("pcpu")
    val cpuBoth = cpuRatios.nonEmpty
    def describeChannel(tag: String, rs: Seq[(String, Double, Double, Double)],
                        totalKey: String): Unit = if (rs.nonEmpty) {
      val m = rs.map(_._4).sorted.apply(rs.size / 2)
      println(f"$tag channel: median ratio ${m}%.3f over ${rs.size} queries " +
        f"(${totalKey} ${scalarOf(prior, totalKey).getOrElse(-1.0)}%.1f -> " +
        f"${scalarOf(cur, totalKey).getOrElse(-1.0)}%.1f s; " +
        "totals within ±6% are window noise)")
    } else println(s"$tag channel absent in one artifact")
    describeChannel("CPU", cpuRatios, "cpu_total")
    describeChannel("PCPU", pcpuRatios, "pcpu_total")
    val cpuFlagged = (cpuRatios.filter(r => r._4 > 1.5 && r._3 >= 0.05) ++
      pcpuRatios.filter(r => r._4 > 1.5 && r._3 >= 0.05))
      .groupBy(_._1).map(_._2.head).toSeq.sortBy(-_._4)
    if (cpuFlagged.nonEmpty) {
      println("CPU REGRESSIONS (steal-immune — these are real):")
      cpuFlagged.take(20).foreach { case (k, c, p, r) =>
        println(f"  $k%-40s ${p}%8.2f -> ${c}%8.2f cpu-s  (${r}%.2fx)")
      }
    }
    // per-query adjudication of the wall flags
    def cpuRatioOf(k: String): Option[Double] =
      cpuRatios.find(t => t._1 == k && t._3 >= 0.05).map(_._4)
        .orElse(pcpuRatios.find(t => t._1 == k && t._3 >= 0.05).map(_._4))
    val (wallNoise, wallUnresolved) = flagged.partition { case (k, _, _, _) =>
      cpuRatioOf(k).exists(_ <= 1.25) }
    if (flagged.nonEmpty && cpuBoth) {
      if (wallNoise.nonEmpty)
        println(s"wall flags with FLAT per-query CPU (host noise): " +
          wallNoise.map(_._1).mkString(", "))
      if (wallUnresolved.nonEmpty)
        println(s"wall flags WITHOUT flat CPU evidence (uncovered or " +
          s"CPU-elevated) — explain or fix: " +
          wallUnresolved.map(f => f._1 + cpuRatioOf(f._1)
            .map(r => f" (cpu ${r}%.2fx)").getOrElse(" (no cpu coverage)"))
            .mkString(", "))
    }
    val errs = """"errors":\[([^\]]*)\]""".r.findFirstMatchIn(cur)
      .map(_.group(1)).getOrElse("")
    if (errs.nonEmpty) println(s"ERRORS in current artifact: $errs")
    val verdict =
      if (errs.nonEmpty) "VERDICT: current run has errors — fix before committing"
      else if (cpuFlagged.nonEmpty)
        "VERDICT: CPU-channel regressions (steal-immune) — fix or explain before committing"
      else if (cpuBoth && flagged.nonEmpty && wallUnresolved.nonEmpty)
        "VERDICT: wall flags without per-query CPU evidence — explain or fix before committing"
      else if (cpuBoth && cSteal.exists(s => s > 0.5))
        // wall totals are contaminated but the CPU trend is clean —
        // committable for the CPU channel; note the wall caveat
        "VERDICT: CPU channel clean; wall numbers steal-contaminated — committable for the CPU trend, re-run for a clean wall total"
      else if (cSteal.exists(s => s > 0.5))
        "VERDICT: current run is steal-contaminated — not committable, re-run"
      else if (flagged.isEmpty) "VERDICT: clean — committable"
      else if (cpuBoth)
        "VERDICT: every wall flag has a flat per-query CPU ratio — host noise; committable, cite the CPU medians"
      else "VERDICT: clean host but flagged queries — explain or fix before committing"
    println(verdict)
  }
}
