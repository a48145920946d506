package graft
import org.apache.spark.sql.SparkSession
object CharsetScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").appName("scratch")
      .config("spark.sql.shuffle.partitions", "2").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def show(q: String): Unit =
      try println(q + "  =>  " + spark.sql("select " + q).head().toSeq.mkString(" | "))
      catch { case e: Exception => println(q + "  =>  ERROR " + e.getMessage.take(200)) }
    show("hex(encode('café', 'ISO-8859-1'))")
    show("hex(encode('Brand#13', 'UTF-16BE'))")
    show("decode(encode('café', 'ISO-8859-1'), 'ISO-8859-1')")
    show("decode(unhex('6880'), 'utf-8')")
    show("is_valid_utf8(cast(unhex('6880') as string))")
    show("make_valid_utf8(cast(unhex('688069') as string))")
    show("hex(cast('café' as binary))")
    show("cast(cast(unhex('636166E9') as string) as binary) is null")
    show("hex(cast(cast(unhex('636166E9') as string) as binary))")
    spark.stop()
  }
}
