package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DenseMicro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("micro")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    val df = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select("l_orderkey","l_linenumber")
    def time(tag:String)(f: => Unit): Unit = { val t0=System.nanoTime; f; println(f"MICRO $tag%-10s ${(System.nanoTime-t0)/1e9}%.2f s") }
    df.count()
    time("warmscan"){ df.count() }
    locally {
      import org.apache.spark.sql.expressions.Window
      time("warmwin"){ df.withColumn("rid", row_number().over(Window.partitionBy("l_linenumber").orderBy("l_orderkey"))).write.format("noop").mode("overwrite").save() }
      time("warmbjoin"){ df.join(broadcast(df.groupBy("l_linenumber").count()), Seq("l_linenumber")).write.format("noop").mode("overwrite").save() }
    }
    locally {
      var out: org.apache.spark.sql.DataFrame = null
      time("build"){ out = graft.ops.GlobalOrder.denseIds(df, Seq(col("l_orderkey"),col("l_linenumber")), "rid").orderBy("rid") }
      time("plan"){ out.queryExecution.executedPlan }
      time("exec"){ out.write.format("noop").mode("overwrite").save() }
    }
    locally {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val out = graft.ops.GlobalOrder.denseIds(df, Seq(col("l_orderkey"),col("l_linenumber")), "rid2", base = 1L).orderBy("rid2")
      time("noaqe"){ out.write.format("noop").mode("overwrite").save() }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val out8 = graft.ops.GlobalOrder.denseIds(df, Seq(col("l_orderkey"),col("l_linenumber")), "rid3", base = 2L, numPartitions = Some(8)).orderBy("rid3")
      time("nb8"){ out8.write.format("noop").mode("overwrite").save() }
    }
    def runNew(): Unit = graft.ops.GlobalOrder.denseIds(df, Seq(col("l_orderkey"),col("l_linenumber")), "rid").orderBy("rid").write.format("noop").mode("overwrite").save()
    time("new1")(runNew()); time("new2")(runNew())
    import org.apache.spark.sql.expressions.Window
    time("window1"){ df.withColumn("rid", row_number().over(Window.orderBy("l_orderkey","l_linenumber"))).orderBy("rid").write.format("noop").mode("overwrite").save() }
    locally {
      import spark.implicits._
      time("zip1"){
        val sorted = df.orderBy("l_orderkey","l_linenumber")
        sorted.rdd.zipWithIndex.map{case(r,i)=>(r.getLong(0), i+1)}.toDF("k","rid").orderBy("rid").write.format("noop").mode("overwrite").save()
      }
    }
    time("new3")(runNew())
    spark.stop()
  }
}
