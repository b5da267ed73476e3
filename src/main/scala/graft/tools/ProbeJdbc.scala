package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
/** Scratch diagnostic: what does the Derby DSv2 scan actually push? */
object ProbeJdbc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config(graft.util.Tuning.sqlDefaults.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val url = "jdbc:derby:memory:limdb;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE T (A INT, B VARCHAR(10))")
    (1 to 20).foreach(i => c.createStatement().execute(s"INSERT INTO T VALUES ($i, 'x$i')"))
    c.close()
    graft.sources.Jdbc.registerCatalog(spark, "jd", url)
    println("dialect = " + org.apache.spark.sql.jdbc.JdbcDialects.get(url).getClass)
    println("supportsLimit = " + org.apache.spark.sql.jdbc.JdbcDialects.get(url).supportsLimit)
    val df = spark.table("jd.APP.T").filter(col("A") > 5).limit(3)
    println("=== PLAN ===")
    println(df.queryExecution.executedPlan.toString)
    println("=== ROWS === " + df.collect().length)
    spark.stop()
  }
}
