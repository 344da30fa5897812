package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}

/** Ingestion utility (reference S1/S2, notebook.py:41–64): fetch source
  * archives over HTTP into a local/staging directory. Kept OUT of the
  * query engine on purpose — ingestion is a driver-side setup step, and
  * Spark's CSV reader consumes `.bz2` directly (splittable codec), so
  * the reference's shell `bzip2 -d` loop (S2) has no in-engine
  * equivalent to build.
  */
object Ingest {

  private lazy val client: HttpClient =
    HttpClient.newBuilder().followRedirects(HttpClient.Redirect.NORMAL).build()

  /** Download one URL to `destDir/<fileName>`; returns the target path.
    * Idempotent: an existing non-empty target is kept (the reference
    * re-downloads unconditionally; skipping is strictly safer for a
    * re-runnable pipeline).
    */
  def fetch(url: String, destDir: String, fileName: String): Path = {
    val dir = Paths.get(destDir)
    Files.createDirectories(dir)
    val target = dir.resolve(fileName)
    if (Files.exists(target) && Files.size(target) > 0) return target
    // Download to a temp name and move into place: an interrupted body
    // must never leave a truncated file that the idempotence check
    // would treat as complete on the next run.
    val tmp = Files.createTempFile(dir, s".$fileName.", ".part")
    try {
      val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(tmp))
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"GET $url -> HTTP ${resp.statusCode()}")
      Files.move(tmp, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      target
    } finally Files.deleteIfExists(tmp)
  }

  /** Fetch a set of (url, fileName) pairs sequentially (the reference's
    * wget loop). Returns the fetched paths. */
  def fetchAll(urls: Seq[(String, String)], destDir: String): Seq[Path] =
    urls.map { case (u, f) => fetch(u, destDir, f) }
}
