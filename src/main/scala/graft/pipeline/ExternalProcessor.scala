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
  /** [[runPerSceneWithFallback]] result: `attempt` is the 0-based index of
    * the candidate command that produced this outcome (the version that
    * won, or the LAST one tried when all fail). */
  final case class ChainResult(sceneid: String, attempt: Int, exit_code: Int,
                               timed_out: Boolean, stdout: String, status: String)

  /** One subprocess run: (exit code, timed out, captured output). Exit −1
    * = timeout (process force-killed, the reference's `docker stop`),
    * −2 = spawn failure. */
  private def runOne(cmd: Array[String], timeoutSeconds: Long): (Int, Boolean, String) =
    try {
      val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      val p = pb.start()
      val outReader = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      // The drain thread and this thread share `sb`: all appends happen on
      // the drain thread, reads happen here only AFTER join() (or, on
      // timeout, a bounded join attempt), with the lock making the final
      // read safe even when the drain is still mid-append at kill time.
      val sb = new StringBuilder
      val drain = new Thread(() => {
        var line = outReader.readLine()
        while (line != null) {
          sb.synchronized { if (sb.length < 65536) sb.append(line).append('\n') }
          line = outReader.readLine()
        }
      })
      drain.setDaemon(true); drain.start()
      val finished = p.waitFor(timeoutSeconds, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) {
        p.destroyForcibly() // processor.py:82–85 stops the container
        drain.join(2000) // bounded: a wedged pipe must not extend the timeout
        (-1, true, sb.synchronized(sb.toString))
      } else {
        // Exit observed, but the pipe may still hold buffered output the
        // drain thread has not consumed — wait for EOF before reading.
        drain.join(10000)
        (p.exitValue(), false, sb.synchronized(sb.toString))
      }
    } catch {
      case e: Exception => (-2, false, String.valueOf(e.getMessage))
    }

  /** Run `command args... <scene args...>` per scene with a timeout.
    * SUCCESS on exit 0; RETRY otherwise (the reference's
    * `assert returncode == 0` + Celery autoretry, tasks.py:321–323). */
  def runPerScene(jobs: Dataset[ProcJob], command: Seq[String],
                  timeoutSeconds: Long = 5400L)
                 (implicit spark: SparkSession): Dataset[ProcResult] = {
    import spark.implicits._
    jobs.mapPartitions { it =>
      it.map { job =>
        val (code, timedOut, out) = runOne((command ++ job.args).toArray,
          timeoutSeconds)
        ProcResult(job.sceneid, code, timedOut, out,
          if (code == 0) "SUCCESS" else "RETRY")
      }
    }
  }

  /** Version-fallback chain: try each candidate command in order, first
    * exit-0 wins — the reference's Sen2Cor operational reality, where a
    * scene is attempted with each supported processor version
    * ('2.10.0' → '2.8.0' → '2.5.5') until one succeeds
    * (collections/processor.py:88–101: `for version in versions_supported`,
    * return on first success, raise carrying the LAST error when all
    * fail). A timeout on one candidate kills that subprocess and moves to
    * the next (processor.py:82–85); only when every candidate fails does
    * the scene route to RETRY, exactly like the single-command path. */
  def runPerSceneWithFallback(jobs: Dataset[ProcJob], commands: Seq[Seq[String]],
                              timeoutSeconds: Long = 5400L)
                             (implicit spark: SparkSession): Dataset[ChainResult] = {
    require(commands.nonEmpty, "need at least one candidate command")
    import spark.implicits._
    jobs.mapPartitions { it =>
      it.map { job =>
        var last: ChainResult = null
        var i = 0
        while (i < commands.length && (last == null || last.status != "SUCCESS")) {
          val (code, timedOut, out) = runOne((commands(i) ++ job.args).toArray,
            timeoutSeconds)
          last = ChainResult(job.sceneid, i, code, timedOut, out,
            if (code == 0) "SUCCESS" else "RETRY")
          i += 1
        }
        last
      }
    }
  }
}
