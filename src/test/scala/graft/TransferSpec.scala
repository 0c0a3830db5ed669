package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{TaskRegistry, Transfer}
import graft.pipeline.Transfer.{CommandResult, CommandRunner}

/** K12 transfer shim: argument grammar, direction, excludes, modtime,
  * timeouts (reference rclone_transfer.py:218-294), with the process
  * seam mocked — no real rclone anywhere. */
class TransferSpec extends AnyFunSuite {

  /** Records every command; scripted failures by predicate. */
  private class RecordingRunner(
      fail: Seq[String] => Option[String] = _ => None)
      extends CommandRunner {
    var calls: Vector[(Seq[String], Int)] = Vector.empty
    def run(cmd: Seq[String], timeoutSec: Int): CommandResult = {
      calls :+= (cmd, timeoutSec)
      fail(cmd) match {
        case Some(err) => CommandResult(1, "", err)
        case None      => CommandResult(0, "ok", "")
      }
    }
  }

  private def tmpLocal(): String =
    Files.createTempDirectory("xfer").toString

  test("to_remote move: exact rclone argument grammar and timeout") {
    val runner = new RecordingRunner()
    val local = tmpLocal()
    Transfer.genericMove(runner, local, "remote:bucket/site",
      excludeDirs = Seq("TMP", "10Hz"), timeoutSec = 600)
    // first call is the 30 s remote probe
    assert(runner.calls(0) ==
      ((Seq("rclone", "lsd", "remote:bucket/site"), 30)))
    val (cmd, t) = runner.calls(1)
    assert(cmd == Seq("rclone", "copy", "--transfers", "10",
      "--progress", "--checksum", "--timeout", "0",
      "--exclude", "TMP/**", "--exclude", "10Hz/**",
      local, "remote:bucket/site"))
    assert(t == 600)
  }

  test("from_remote swaps endpoints; modtime flag appended when off") {
    val runner = new RecordingRunner()
    val local = tmpLocal()
    Transfer.genericMove(runner, local, "remote:x",
      whichWay = "from_remote")
    assert(runner.calls(1)._1.takeRight(2) == Seq("remote:x", local))

    Transfer.pushStatusArtifact(runner, local, "remote:web/status")
    val cmd = runner.calls(3)._1
    assert(cmd.contains("--sftp-set-modtime=false"))
    assert(cmd.takeRight(2) == Seq(local, "remote:web/status"))
  }

  test("guards: bad direction, missing local, unreachable remote, copy fail") {
    val runner = new RecordingRunner()
    val local = tmpLocal()
    intercept[NoSuchElementException] {
      Transfer.genericMove(runner, local, "r:", whichWay = "sideways")
    }
    intercept[java.io.FileNotFoundException] {
      Transfer.genericMove(runner, s"$local/nope", "r:")
    }
    val badRemote = new RecordingRunner(
      cmd => if (cmd.take(2) == Seq("rclone", "lsd"))
        Some("no such remote") else None)
    intercept[Transfer.TransferException] {
      Transfer.genericMove(badRemote, local, "r:gone")
    }
    val badCopy = new RecordingRunner(
      cmd => if (cmd.contains("copy")) Some("io error") else None)
    intercept[Transfer.TransferException] {
      Transfer.genericMove(badCopy, local, "r:ok")
    }
  }

  test("site stream move normalizes windows separators") {
    val runner = new RecordingRunner()
    val local = tmpLocal()
    Transfer.moveSiteDataStream(runner, "Calperum", "flux_slow",
      localPathOf = (_, _) => local.replace("/", "\\"),
      remotePathOf = (s, st) => s"remote:data\\$s\\$st")
    val cmd = runner.calls(1)._1
    assert(cmd.last == "remote:data/Calperum/flux_slow")
    assert(!cmd.exists(_.contains("\\")))
  }

  test("TaskRegistry dispatch: transfer failures become Outcome rows") {
    val local = tmpLocal()
    val flaky = new RecordingRunner(cmd =>
      if (cmd.contains("copy") && cmd.last.contains("BadSite"))
        Some("boom") else None)
    val matrix = TaskRegistry.fromCsv(
      "Site,move_fast\nCalperum,True\nBadSite,True\n")
    val outcomes = TaskRegistry.runTask(matrix, "move_fast",
      siteTasks = Map("move_fast" -> Transfer.siteMoveTask(
        flaky, "fast", (_, _) => local,
        (s, st) => s"remote:$s/$st", timeoutSec = 1200)))
    assert(outcomes.map(o => (o.site, o.ok)) ==
      Seq((Some("Calperum"), true), (Some("BadSite"), false)))
    assert(outcomes(1).error.exists(_.contains("copy failed")))
    // the caller's timeout reached the runner
    assert(flaky.calls.collect {
      case (cmd, t) if cmd.contains("copy") => t }.forall(_ == 1200))
  }
}
