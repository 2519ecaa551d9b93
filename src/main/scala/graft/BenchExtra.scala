package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmark harness for optimization work (guide §1.4): isolates
  * individual declared queries with the noop sink, optionally repeats them,
  * attaches a per-stage wall/task-time listener, and can dump
  * `.explain("formatted")` plans to a directory.
  *
  * This main is SEPARATE from the frozen `graft.Bench` driver contract —
  * it exists so per-query numbers and plan shapes can be measured without
  * touching the graded harness.
  *
  * Env:
  *   SPARK_GRAFT_SF_DIR     data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS       cores (default 32)
  *   GRAFT_EXTRA_QUERIES    comma list of query names, or "all" (default all)
  *   GRAFT_EXTRA_REPEATS    runs per query in the same session (default 1)
  *   GRAFT_EXTRA_PLAN_DIR   if set, write <name>.txt explain(formatted) there
  *   GRAFT_EXTRA_STAGES     "1" = print per-stage timing lines
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val which = sys.env.getOrElse("GRAFT_EXTRA_QUERIES", "all")
    val repeats = sys.env.getOrElse("GRAFT_EXTRA_REPEATS", "1").toInt
    val planDir = sys.env.get("GRAFT_EXTRA_PLAN_DIR")
    val stages = sys.env.getOrElse("GRAFT_EXTRA_STAGES", "0") == "1"

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (stages) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
          val run = si.taskMetrics.executorRunTime / 1e3
          val cpu = si.taskMetrics.executorCpuTime / 1e9
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d wall=$wall%6.2fs " +
            f"taskSum=$run%7.2fs cpuSum=$cpu%7.2fs ${si.name.take(70)}")
        }
      })
    }

    val names: Seq[String] =
      if (which == "all") SparkEntry.queries.keys.toSeq.sorted
      else which.split(",").map(_.trim).filter(_.nonEmpty).toSeq

    val results = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val times = (1 to repeats).map { i =>
        spark.sparkContext.setJobDescription(s"$name#$i")
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          if (i == 1) planDir.foreach { d =>
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(java.nio.file.Paths.get(d, s"$name.txt"), plan)
          }
        } catch { case e: Throwable =>
          System.err.println(s"[extra] $name failed: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[extra] $name run$i: $t%.3f s")
        t
      }
      name -> times
    }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    println(s"""{"extra_queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
