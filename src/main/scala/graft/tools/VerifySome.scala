package graft.tools

/** Dev-only: Verify for a subset of queries — the same dump path as
  * [[graft.Verify]] (shared session, canonicalization and oracle-json
  * helpers, so subset runs can never hash differently from full runs),
  * restricted to the names given on the command line (prefix match): a
  * new query batch iterates in seconds instead of re-dumping every
  * registered query.
  *
  * Usage: runMain graft.tools.VerifySome <sfDir> <outDir> <name...>
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val wanted = args.drop(2)
    val spark = graft.Verify.session()
    new java.io.File(outDir).mkdirs()
    val selected = graft.SparkEntry.queries.filter { case (n, _) =>
      wanted.exists(n.startsWith)
    }
    selected.foreach { case (name, fn) =>
      if (graft.Verify.dumpQuery(spark, sfDir, outDir, name, fn))
        println(s"[verify-some] dumped $name")
    }
    graft.Verify.writeOracleJson(outDir,
      graft.SparkEntry.oracleSql.filter { case (k, _) => selected.contains(k) })
    spark.stop()
  }
}
