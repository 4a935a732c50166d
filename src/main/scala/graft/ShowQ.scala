package graft
import org.apache.spark.sql.SparkSession
object ShowQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SHOWQ_LOG","ERROR"))
    val d = sys.env.getOrElse("SHOWQ_SF","/root/testdata/sf0.001")
    for (q <- sys.env.getOrElse("SHOWQ_QS","q202_charset_decode").split(",").toSeq) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, d).show(50, false)
    }
    spark.stop()
  }
}
