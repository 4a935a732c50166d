package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/** External-processor stage (SURVEY.md X1/X2): the reference shells out to
  * dockerized Sen2Cor/LaSRC per scene with a hard timeout
  * (celery/processor.py:27–101: 5400 s, container stopped on expiry;
  * tasks.py:282–323). Spark's role is the same as Celery's — scheduling and
  * supervision — so this runs the command per scene inside `mapPartitions`:
  * one task = one scene = one subprocess, `spark.task.cpus` caps
  * per-executor concurrency exactly like `--concurrency 2` did.
  */
object ExternalProcessor {

  final case class ProcJob(sceneid: String, args: Seq[String])
  final case class ProcResult(sceneid: String, exit_code: Int, timed_out: Boolean,
                              stdout: String, status: String)

  /** Run `command args... <scene args...>` per scene with a timeout.
    * SUCCESS on exit 0; RETRY otherwise (the reference's
    * `assert returncode == 0` + Celery autoretry, tasks.py:321–323). */
  def runPerScene(jobs: Dataset[ProcJob], command: Seq[String],
                  timeoutSeconds: Long = 5400L)
                 (implicit spark: SparkSession): Dataset[ProcResult] = {
    import spark.implicits._
    jobs.mapPartitions { it =>
      it.map { job =>
        val cmd = (command ++ job.args).toArray
        try {
          val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
          val p = pb.start()
          val outReader = new java.io.BufferedReader(
            new java.io.InputStreamReader(p.getInputStream))
          val sb = new StringBuilder
          val drain = new Thread(() => {
            var line = outReader.readLine()
            while (line != null) {
              if (sb.length < 65536) sb.append(line).append('\n')
              line = outReader.readLine()
            }
          })
          drain.setDaemon(true); drain.start()
          val finished = p.waitFor(timeoutSeconds, java.util.concurrent.TimeUnit.SECONDS)
          if (!finished) {
            p.destroyForcibly() // processor.py:96–99 stops the container
            ProcResult(job.sceneid, -1, timed_out = true, sb.toString, "RETRY")
          } else {
            val code = p.exitValue()
            ProcResult(job.sceneid, code, timed_out = false, sb.toString,
              if (code == 0) "SUCCESS" else "RETRY")
          }
        } catch {
          case e: Exception =>
            ProcResult(job.sceneid, -2, timed_out = false, e.getMessage, "RETRY")
        }
      }
    }
  }
}
