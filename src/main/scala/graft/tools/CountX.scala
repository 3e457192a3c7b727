package graft.tools
import org.apache.spark.sql.SparkSession
object CountX {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val out = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(out))(df.explain("formatted"))
        val plan = out.toString
        val shuffles = "\\(\\d+\\) Exchange\\b".r.findAllIn(plan).size
        println(s"XCOUNT $name $shuffles")
      } catch { case e: Throwable => println(s"XCOUNT $name ERR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
