package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory. Mirrors the reference's session discipline
  * (UTC-locked timezone, explicit shuffle parallelism — reference
  * spark-defaults.conf:14-29) but sized for local[32] and with AQE
  * ON for batch work (the reference disables it only because its
  * jobs are pure streaming).
  */
object Sessions {
  def local(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
