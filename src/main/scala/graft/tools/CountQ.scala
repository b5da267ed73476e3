package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    println("QUERIES=" + graft.SparkEntry.queries.size +
      " ORACLES=" + graft.SparkEntry.oracleSql.size)
  }
}
