package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.{Sessions, SparkEntry}

/** Per-stage spill/shuffle attribution for one query — the
  * measure-first instrument for locating WHICH operator pays under a
  * constrained heap (guide §1/§5): runs the query through the noop
  * sink and prints, per stage, tasks / shuffle read+write / mem+disk
  * spill / peak exec memory, plus the EXECUTED (AQE-final) plan.
  *
  * Usage: SPARK_DRIVER_MEM=2g runMain graft.tools.StageProbe <sfDir> <query>
  */
object StageProbe {
  private final class Acc {
    var tasks = 0
    var shuffleRead = 0L
    var shuffleWrite = 0L
    var memSpill = 0L
    var diskSpill = 0L
    var peakMem = 0L
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: StageProbe <sfDir> <queryName>")
    val Array(sfDir, name) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt, "graft-stageprobe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new ConcurrentHashMap[Int, Acc]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val a = stages.computeIfAbsent(t.stageId, _ => new Acc)
          a.synchronized {
            a.tasks += 1
            a.shuffleRead += m.shuffleReadMetrics.totalBytesRead
            a.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
            a.memSpill += m.memoryBytesSpilled
            a.diskSpill += m.diskBytesSpilled
            a.peakMem = math.max(a.peakMem, m.peakExecutionMemory)
          }
        }
      }
    })
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    val df = fn(spark, sfDir)
    spark.sparkContext.setJobDescription(s"stageprobe:$name")
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener-bus events drain
    println(f"[stageprobe] $name total ${sec}%.2f s")
    def mb(b: Long) = f"${b / 1048576.0}%9.1f"
    println("[stageprobe] stage tasks    shRdMB    shWrMB   memSpMB  diskSpMB  peakMB")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (id, a) =>
      println(f"[stageprobe] $id%5d ${a.tasks}%5d ${mb(a.shuffleRead)} " +
        f"${mb(a.shuffleWrite)} ${mb(a.memSpill)} ${mb(a.diskSpill)} ${mb(a.peakMem)}")
    }
    println("[stageprobe] === executed plan ===")
    println(df.queryExecution.executedPlan.toString.take(20000))
    spark.stop()
  }
}
