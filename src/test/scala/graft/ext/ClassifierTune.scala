package graft.ext

import org.apache.spark.sql.functions._

/** Scratch tuning main (test scope, not shipped): run the
  * pipeline_quality_classifier gate shape in a Bench-like local[32]
  * session with a job-time listener, to see where the wall goes. */
object ClassifierTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.io.Sessions.builder("local[32]", 32).appName("clf-tune").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.put(j.jobId, j.time - starts.getOrDefault(j.jobId, j.time))
    })
    val doc = spark.read.parquet(s"$sfDir/documents.parquet").filter(col("text").isNotNull)
    def cnt(t: String) = size(filter(split(col("text"), "\\s+"), w => w === t))
    def runOnce(tag: String): Unit = {
      val t0 = System.nanoTime()
      val labeled = doc.select(col("doc_id"),
        (cnt("table") > cnt("row")).cast("int").as("label"))
      val feats = Classifier.hashedFeatures(doc, "doc_id", "text", 128)
        .join(labeled, Seq("doc_id"))
      val t1 = System.nanoTime()
      val pm = 0 // auto — the gate's setting
      val t2 = System.nanoTime()
      for ((steps, opt) <- Seq((40, "adam"), (8, "newton"), (6, "newton"), (4, "newton"));
           lr <- Seq(0.3)) {
        val ts = System.nanoTime()
        val m = Classifier.trainLogistic(feats, "label", steps = steps,
          learningRate = lr, samplePermille = pm, optimizer = opt)
        println(f"[tune:$tag] steps=$steps opt=$opt lr=$lr%.2f pm=$pm train=${(System.nanoTime() - ts) / 1e9}%.2f acc=${m.trainAccuracy}%.4f loss=${m.trainLogLoss}%.4f")
      }
      val t3 = System.nanoTime()
      Dedup.unpersistAll()
      import scala.jdk.CollectionConverters._
      val times = jobs.asScala.toSeq.sortBy(_._1).map { case (id, ms) => f"$id:${ms / 1000.0}%.2f" }
      println("[tune:jobs] " + times.mkString(" "))
      jobs.clear()
    }
    runOnce("cold")
    runOnce("warm")
  }
}
