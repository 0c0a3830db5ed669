package graft.pipeline

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

/** K12 file-transfer shim (reference:
  * code/file_transfers/rclone_transfer.py:218-294 `generic_move` and
  * its task wrappers). Orchestration, not engine: the data plane
  * never routes bytes through the driver — this is the reference's
  * rclone/sftp dispatch re-expressed with the exact argument grammar,
  * direction semantics, exclude expansion, modtime flag, and timeout
  * discipline, behind a swappable [[Transfer.CommandRunner]] so tests
  * (and air-gapped environments) never fork a real process.
  */
object Transfer {

  /** rclone's fixed argument list (rclone_transfer.py:31-33). */
  val AppPath = "rclone"
  val BaseArgs: Seq[String] = Seq(
    "copy", "--transfers", "10", "--progress", "--checksum",
    "--timeout", "0")

  final case class CommandResult(exitCode: Int, stdout: String,
      stderr: String)

  final class TransferException(msg: String) extends Exception(msg)
  final class TransferTimeout(msg: String) extends Exception(msg)

  /** The subprocess seam (_run_subprocess, rclone_transfer.py:349+).
    * Implementations must raise [[TransferTimeout]] on expiry. */
  trait CommandRunner {
    def run(cmd: Seq[String], timeoutSec: Int): CommandResult
  }

  /** Real runner: fork, wait up to the timeout, kill on expiry. */
  object ProcessRunner extends CommandRunner {
    def run(cmd: Seq[String], timeoutSec: Int): CommandResult = {
      val pb = new ProcessBuilder(cmd: _*)
      val p = pb.start()
      val done = p.waitFor(timeoutSec.toLong, TimeUnit.SECONDS)
      if (!done) {
        p.destroyForcibly()
        throw new TransferTimeout(
          s"command ${cmd.mkString(" ")} timed out after ${timeoutSec}s")
      }
      def drain(in: java.io.InputStream) =
        new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
      CommandResult(p.exitValue(), drain(p.getInputStream),
        drain(p.getErrorStream))
    }
  }

  /** Backslash-to-slash path normalization (_reformat_path_str). */
  def reformatPath(p: String): String = p.replace("\\", "/")

  /** One `--exclude` + `dir/` + double-star pair per directory
    * (_add_rclone_exclude, rclone_transfer.py:315-332). */
  def excludeArgs(excludeDirs: Seq[String]): Seq[String] =
    excludeDirs.flatMap(d => Seq("--exclude", s"$d/**"))

  /** Remote reachability probe: `rclone lsd <remote>` with the
    * reference's hard 30 s bound (rclone_transfer.py:299-312). */
  def checkRemoteAvailable(runner: CommandRunner,
      remotePath: String): Unit = {
    val r = runner.run(Seq(AppPath, "lsd", remotePath), timeoutSec = 30)
    if (r.exitCode != 0)
      throw new TransferException(
        s"remote location $remotePath is not valid! ${r.stderr}")
  }

  /** The reference's generic_move (rclone_transfer.py:218-294):
    * validate direction, local path, and remote reachability; swap
    * from/to for `from_remote`; expand excludes; append
    * `--sftp-set-modtime=false` when `modTime` is off (required for
    * the DSA web-site destination); then run with the caller's
    * timeout (600 s default; status pushes use shorter ones). */
  def genericMove(runner: CommandRunner, localLocation: String,
      remoteLocation: String, whichWay: String = "to_remote",
      excludeDirs: Seq[String] = Nil, modTime: Boolean = true,
      timeoutSec: Int = 600): CommandResult = {
    if (whichWay != "to_remote" && whichWay != "from_remote")
      throw new NoSuchElementException(
        "arg \"which_way\" must be \"to_remote\" or \"from_remote\"")
    if (!Files.exists(Paths.get(localLocation)))
      throw new java.io.FileNotFoundException(
        s"local file $localLocation is not valid!")
    checkRemoteAvailable(runner, remoteLocation)
    val (from, to) =
      if (whichWay == "to_remote") (localLocation, remoteLocation)
      else (remoteLocation, localLocation)
    val args = BaseArgs ++ excludeArgs(excludeDirs) ++
      (if (modTime) Nil else Seq("--sftp-set-modtime=false"))
    val r = runner.run(AppPath +: args :+ from :+ to, timeoutSec)
    if (r.exitCode != 0)
      throw new TransferException(s"copy failed! ${r.stderr}")
    r
  }

  /** Per-site raw-data stream move (move_site_data_stream,
    * rclone_transfer.py:46-80): resolve local/remote through the
    * caller's path scheme, normalize separators, delegate. */
  def moveSiteDataStream(runner: CommandRunner, site: String,
      stream: String, localPathOf: (String, String) => String,
      remotePathOf: (String, String) => String,
      excludeDirs: Seq[String] = Nil, whichWay: String = "to_remote",
      timeoutSec: Int = 600): CommandResult =
    genericMove(runner,
      reformatPath(localPathOf(site, stream)),
      reformatPath(remotePathOf(site, stream)),
      whichWay, excludeDirs, modTime = true, timeoutSec)

  /** Status-artifact push (push_status_file / push_details_json):
    * modtime off for the web-site destination. */
  def pushStatusArtifact(runner: CommandRunner, localLocation: String,
      remoteLocation: String, timeoutSec: Int = 600): CommandResult =
    genericMove(runner, localLocation, remoteLocation,
      whichWay = "to_remote", modTime = false, timeoutSec = timeoutSec)

  /** A TaskRegistry-pluggable site task: site => move its stream
    * (tasks.py wiring — failures surface as Outcome rows, not
    * exceptions, via TaskRegistry.runTask). */
  def siteMoveTask(runner: CommandRunner, stream: String,
      localPathOf: (String, String) => String,
      remotePathOf: (String, String) => String,
      excludeDirs: Seq[String] = Nil,
      timeoutSec: Int = 600): String => Unit =
    site => {
      moveSiteDataStream(runner, site, stream, localPathOf,
        remotePathOf, excludeDirs, timeoutSec = timeoutSec)
      ()
    }
}
