package graft.sources

import java.io.InputStream
import java.net.{URI, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S10: HTTP download + local cache (SURVEY §2.1 S10).
  *
  * The reference front-loads every granule fetch through fsspec's
  * `simplecache::` protocol — `atlas_catalog.yaml:9-18` declares
  * `simplecache::https://n5eil01u.ecs.nsidc.org/...` urlpaths and
  * `atl06_play.py:128-137` reads through them — so a granule is
  * downloaded once into a local cache directory and every later open
  * is a local-file open. The engine consumes LOCAL files (the scan
  * operators never see a URL), so this is the same driver-side fetch
  * utility: resolve URL → cached local path, downloading only on
  * miss.
  *
  * Semantics matched to fsspec's simplecache (all public behavior):
  *   - cache key is a digest of the full URL, so distinct query
  *     strings cache separately; the basename is kept in the cached
  *     filename for human inspection,
  *   - a hit never touches the network (or source file) again,
  *   - downloads are atomic (temp file + rename), so a killed fetch
  *     never leaves a half-written file that a later run would trust,
  *   - no TTL: granule archives are immutable-by-version upstream.
  *
  * Scale shape: fetching is a driver-side, once-per-granule step —
  * the cluster-side work (the scans) runs on the resolved local
  * paths. `resolveAll` fans fetches over a small thread pool the way
  * `nsidc-download-ATL11.py` batches its requests; at 100 TB the
  * cache directory would live on shared storage and this utility
  * simply becomes the manifest-builder for `spark.read.parquet(paths)`.
  *
  * `http(s)://` fetches use the JDK's URL stream (no extra
  * dependency); `file://` URLs and bare paths copy through the same
  * code path, which is what the offline test fixtures exercise.
  */
object CachedFetch {

  /** fsspec chained-protocol prefix, accepted and stripped so catalog
    * urlpaths can be passed verbatim. */
  private val ChainPrefix = "simplecache::"

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private def basenameOf(url: String): String = {
    val noQuery = url.takeWhile(c => c != '?' && c != '#')
    val base = noQuery.substring(noQuery.lastIndexOf('/') + 1)
    // keep it filesystem-safe and non-empty
    val safe = base.filter(c => c.isLetterOrDigit || c == '.' || c == '-' || c == '_')
    if (safe.isEmpty) "download" else safe.takeRight(80)
  }

  /** The cached path a URL maps to (whether or not it exists yet):
    * `<cacheDir>/<sha256(url) take 16>-<basename>`. */
  def cachedPath(url: String, cacheDir: String): Path = {
    val u = url.stripPrefix(ChainPrefix)
    Paths.get(cacheDir, sha256Hex(u).take(16) + "-" + basenameOf(u))
  }

  /** Stream plus the declared byte count when the source knows it
    * (HTTP Content-Length, local file size); -1 when unknown. */
  private def openStream(url: String): (InputStream, Long) = {
    val uri = URI.create(url)
    uri.getScheme match {
      case "http" | "https" =>
        val conn = new URL(url).openConnection()
        (conn.getInputStream, conn.getContentLengthLong)
      case "file" =>
        val p = Paths.get(uri)
        (Files.newInputStream(p), Files.size(p))
      case null =>
        val p = Paths.get(url)
        (Files.newInputStream(p), Files.size(p))
      case other =>
        throw new IllegalArgumentException(
          s"CachedFetch: unsupported scheme '$other' in $url")
    }
  }

  /** Resolve one URL to its local cached file, fetching on miss.
    * Returns the cached path. Atomic: concurrent resolvers of the
    * same URL race only on the final rename, and both observe a
    * complete file. */
  def resolve(url: String, cacheDir: String): Path = {
    val target = cachedPath(url, cacheDir)
    if (Files.exists(target)) return target
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, target.getFileName.toString, ".part")
    try {
      val (in, declaredLen) = openStream(url.stripPrefix(ChainPrefix))
      val copied =
        try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
      // A server-side connection close mid-transfer ends the stream
      // without error and Files.copy returns normally — without this
      // check the truncated file would be cached and trusted forever
      // (the cache has no TTL by design).
      if (declaredLen >= 0 && copied != declaredLen)
        throw new java.io.IOException(
          s"CachedFetch: truncated download of $url " +
            s"($copied of $declaredLen bytes); not caching")
      try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // lost the rename race to a concurrent fetch of the same URL:
        // the winner's complete file is already in place
        case _: java.nio.file.FileAlreadyExistsException => ()
      }
      target
    } finally {
      Files.deleteIfExists(tmp)
    }
  }

  /** Resolve a batch of URLs (misses fetched on a bounded pool, the
    * way the reference's bulk downloader batches granules). Order of
    * results matches the input order. */
  def resolveAll(urls: Seq[String], cacheDir: String, parallelism: Int = 8): Seq[Path] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, urls.length max 1)))
    try {
      val futures = urls.map(u => pool.submit(
        new java.util.concurrent.Callable[Path] { def call(): Path = resolve(u, cacheDir) }))
      futures.map(_.get())
    } finally pool.shutdown()
  }

  /** The reference's end shape: catalog urlpaths → cached local files
    * → one DataFrame (`atl06_play.py:128-137`). */
  def readParquet(spark: SparkSession, urls: Seq[String], cacheDir: String): DataFrame = {
    val paths = resolveAll(urls, cacheDir).map(_.toString)
    spark.read.parquet(paths: _*)
  }

  /** True if the URL is already cached (no fetch attempted). */
  def isCached(url: String, cacheDir: String): Boolean =
    Files.exists(cachedPath(url, cacheDir))
}
