package graft.store

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.store.HoardStore.ManifestEntry

/** The store's commit-protocol seam: everything [[HoardStore]]'s
  * optimistic transactions need from a catalog, and nothing else —
  * version listing, manifest content, and one compare-and-swap publish.
  *
  * [[FileManifestCatalog]] is the default (hard-link CAS on a local
  * filesystem). On an object store the same trait is where a remote
  * commit service plugs in (a DynamoDB conditional put, an Iceberg/HMS
  * catalog CAS, …): `tryPublish` is the ONLY mutation, and its
  * claim-exactly-once contract is all the optimistic-commit loop
  * relies on. `ExternalCatalogSpec` proves the protocol against an
  * injected in-memory CAS service with the same race battery the
  * file-backed path gets.
  */
trait ManifestCatalog {

  /** Highest published version, 0 if none. */
  def latestVersion: Long

  /** Entries of version `ver`; ver 0 is the empty pre-creation state. */
  def entries(ver: Long): Seq[ManifestEntry]

  /** Atomically claim `ver` with `entries`. Returns false iff `ver`
    * was already claimed by anyone (including a concurrent caller —
    * the claim must be exactly-once across processes). Implementations
    * must never expose a torn manifest: a version is invisible until
    * its full content is readable.
    */
  def tryPublish(ver: Long, entries: Seq[ManifestEntry]): Boolean

  /** All published versions, ascending. */
  def versions: Seq[Long]

  /** Drop a version's manifest (snapshot expiry). Data files are the
    * store's concern, not the catalog's.
    */
  def deleteVersion(ver: Long): Unit
}

/** Hard-link CAS on the local/shared filesystem: full content to a
  * temp file, then a hard link at the version name — the link either
  * appears complete or fails if the version was claimed.
  */
final class FileManifestCatalog(root: String) extends ManifestCatalog {

  private def dir = Paths.get(root, "_manifests")

  def latestVersion: Long =
    if (!Files.exists(dir)) 0L
    else {
      val st = Files.list(dir)
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("v\\d{12}"))
        .foldLeft(0L)((m, f) => math.max(m, f.stripPrefix("v").toLong))
      finally st.close()
    }

  def entries(ver: Long): Seq[ManifestEntry] =
    if (ver == 0L) Seq.empty
    else Files.readString(dir.resolve(f"v$ver%012d"))
      .linesIterator.filter(_.nonEmpty).map { line =>
        val Array(step, month, rel) = line.split("\\|", 3)
        ManifestEntry(step.toLong, month, rel)
      }.toSeq

  def tryPublish(ver: Long, entries: Seq[ManifestEntry]): Boolean = {
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, entries.distinct
      .map(e => s"${e.step}|${e.month}|${e.rel}").mkString("\n"))
    try { Files.createLink(dir.resolve(f"v$ver%012d"), tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  def versions: Seq[Long] =
    if (!Files.exists(dir)) Seq.empty
    else {
      val st = Files.list(dir)
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("v\\d{12}"))
        .map(_.stripPrefix("v").toLong).toSeq.sorted
      finally st.close()
    }

  def deleteVersion(ver: Long): Unit =
    Files.deleteIfExists(dir.resolve(f"v$ver%012d"))
}

/** Remote-CAS-style catalog simulated in memory: one atomic map CAS
  * per publish — the shape of a conditional-put commit service. Used
  * by tests to prove the optimistic-commit protocol independent of
  * filesystem semantics (no hard links, no directory listings).
  */
final class InMemoryManifestCatalog extends ManifestCatalog {

  private val state =
    new java.util.concurrent.atomic.AtomicReference[Map[Long, Seq[ManifestEntry]]](Map.empty)

  /** Publishes observed (for test assertions on retry behavior). */
  val publishAttempts = new java.util.concurrent.atomic.AtomicLong(0)

  def latestVersion: Long = state.get().keySet.maxOption.getOrElse(0L)

  def entries(ver: Long): Seq[ManifestEntry] =
    if (ver == 0L) Seq.empty
    else state.get().getOrElse(ver,
      throw new java.util.NoSuchElementException(s"manifest v$ver"))

  def tryPublish(ver: Long, entries: Seq[ManifestEntry]): Boolean = {
    publishAttempts.incrementAndGet()
    val dedup = entries.distinct
    var cur = state.get()
    while (!cur.contains(ver)) {
      if (state.compareAndSet(cur, cur.updated(ver, dedup))) return true
      cur = state.get()
    }
    false
  }

  def versions: Seq[Long] = state.get().keySet.toSeq.sorted

  def deleteVersion(ver: Long): Unit = {
    var cur = state.get()
    while (cur.contains(ver) && !state.compareAndSet(cur, cur - ver))
      cur = state.get()
  }
}
