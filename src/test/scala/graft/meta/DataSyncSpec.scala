package graft.meta

import graft.SparkSpec
import java.nio.file.{Files, Path, Paths}

/** [[DataSync.execute]] — the apply half of the sync story (the reference's
  * DataSynchronizer moves bytes file-by-file from the driver, sync.py:
  * 103–116/131–152; here the plan rows drive a distributed Hadoop-FS
  * copy/delete). The defining invariant: plan → execute → re-plan reports
  * nothing left to do. */
class DataSyncSpec extends SparkSpec {
  import spark.implicits._

  private def write(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
  }

  /** Local listing shaped like an S3 inventory: (path, size), relative. */
  private def listing(root: Path) = {
    import scala.jdk.CollectionConverters._
    val rows = Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      // hidden files = Hadoop LocalFileSystem's .crc checksum twins; a
      // real inventory never lists them and the Hadoop convention is to
      // skip '.'/'_' names
      .filter(!_.getFileName.toString.startsWith("."))
      .map(p => (root.relativize(p).toString, Files.size(p)))
      .toSeq
    rows.toDF("path", "size")
  }

  test("plan → execute → re-plan = all SKIP (copy, overwrite-differing, mirror-remove; idempotent)") {
    val src = Files.createTempDirectory("graft-sync-src")
    val dst = Files.createTempDirectory("graft-sync-dst")
    write(src, "a/keep.bin", "identical")
    write(dst, "a/keep.bin", "identical")
    write(src, "a/new.bin", "only at source")
    write(src, "b/differs.bin", "source version, longer")
    write(dst, "b/differs.bin", "dest ver")
    write(dst, "c/stale.bin", "source no longer has this")

    val plan1 = DataSync.plan(listing(src), listing(dst), "path", "size")
    val actions1 = plan1.collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(actions1 === Map("a/keep.bin" -> "SKIP", "a/new.bin" -> "COPY",
      "b/differs.bin" -> "COPY", "c/stale.bin" -> "REMOVE"))

    val results = DataSync.execute(plan1, src.toString, dst.toString)
      .collect().map(r => r.path -> r).toMap
    assert(results.values.forall(_.ok), results.values.filterNot(_.ok).toSeq.toString)
    assert(results("a/keep.bin").action === "SKIP")

    // bytes actually moved, dest mirrors source
    assert(Files.readAllBytes(dst.resolve("a/new.bin")).sameElements(
      "only at source".getBytes("UTF-8")))
    assert(Files.readAllBytes(dst.resolve("b/differs.bin")).sameElements(
      "source version, longer".getBytes("UTF-8")))
    assert(!Files.exists(dst.resolve("c/stale.bin")))

    // re-plan: nothing left to do
    val plan2 = DataSync.plan(listing(src), listing(dst), "path", "size")
    assert(plan2.collect().map(_.getString(3)).toSet === Set("SKIP"))

    // idempotence: re-running the ORIGINAL plan converges to the same
    // state (COPY overwrites equal bytes, REMOVE of the absent file is ok)
    val again = DataSync.execute(plan1, src.toString, dst.toString).collect()
    assert(again.forall(_.ok), "re-running a plan must not fail")
    val plan3 = DataSync.plan(listing(src), listing(dst), "path", "size")
    assert(plan3.collect().map(_.getString(3)).toSet === Set("SKIP"))
  }

  test("a failing row reports ok=false with the error; the job survives") {
    val src = Files.createTempDirectory("graft-sync-src2")
    val dst = Files.createTempDirectory("graft-sync-dst2")
    write(src, "good.bin", "fine")
    // a COPY whose source vanished between plan and execute — the
    // plan-is-stale race every long sync hits
    val plan = Seq(("good.bin", Some(4L), None: Option[Long], "COPY"),
        ("vanished.bin", Some(9L), None: Option[Long], "COPY"))
      .toDF("path", "src_size", "dst_size", "action")
    val res = DataSync.execute(plan, src.toString, dst.toString)
      .collect().map(r => r.path -> r).toMap
    assert(res("good.bin").ok)
    assert(!res("vanished.bin").ok && res("vanished.bin").error != null,
      "a missing source must report, not abort the sync")
    assert(Files.exists(dst.resolve("good.bin")))
  }
}
