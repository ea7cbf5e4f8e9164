package graft
import org.apache.spark.sql.SparkSession
object ProfExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = graft.sources.DocStore.ensure(spark, 4.0)
    val docs = graft.sources.DocStore.readDf(spark, p)
    println(s"[prof] defaultParallelism=${spark.sparkContext.defaultParallelism}")
    println(s"[prof] scanPartitions=${docs.rdd.getNumPartitions}")
    println(s"[prof] leafConf=${spark.conf.getOption("spark.sql.leafNodeDefaultParallelism")}")
    println(s"[prof] maxPartitionBytes=${spark.conf.get("spark.sql.files.maxPartitionBytes")}")
    spark.stop()
  }
}
