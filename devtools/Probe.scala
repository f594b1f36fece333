package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      ev.printSchema()
      ev.show(3, false)
    } catch { case e: Throwable => println("EVENTS READ FAILED: " + e) }
    try {
      val em = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      em.printSchema()
      em.selectExpr("vec_id", "size(embedding) as dim", "label").show(3)
    } catch { case e: Throwable => println("EMB READ FAILED: " + e) }
    spark.stop()
  }
}
