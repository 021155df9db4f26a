package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.CachedFetch

/** S10 cached-fetch semantics (the offline-testable contract of the
  * reference's simplecache:: granule layer, atlas_catalog.yaml:9-18).
  * file:// and bare-path URLs drive the same resolve/copy/rename code
  * path the http(s) branch uses; only the stream-open differs.
  */
class CachedFetchSpec extends SparkSpec {

  private def freshDirs(): (String, java.nio.file.Path) = {
    val cache = Files.createTempDirectory("graft_cache_spec").toString
    val src = Files.createTempDirectory("graft_cache_src")
    (cache, src)
  }

  test("miss fetches and preserves content; hit never re-reads the source") {
    val (cache, srcDir) = freshDirs()
    val src = srcDir.resolve("granule_a.h5")
    Files.write(src, "payload-v1".getBytes(StandardCharsets.UTF_8))
    val url = s"file://$src"

    assert(!CachedFetch.isCached(url, cache))
    val p1 = CachedFetch.resolve(url, cache)
    assert(Files.readAllLines(p1).get(0) == "payload-v1")
    assert(CachedFetch.isCached(url, cache))

    // mutate the source AFTER caching: a hit must keep serving the
    // cached bytes (fsspec simplecache has no TTL)
    Files.write(src, "payload-v2-corrupted".getBytes(StandardCharsets.UTF_8))
    val p2 = CachedFetch.resolve(url, cache)
    assert(p2 == p1)
    assert(Files.readAllLines(p2).get(0) == "payload-v1")
  }

  test("simplecache:: catalog prefix is accepted verbatim and keys identically") {
    val (cache, srcDir) = freshDirs()
    val src = srcDir.resolve("granule_b.h5")
    Files.write(src, "bb".getBytes(StandardCharsets.UTF_8))
    val bare = s"file://$src"
    val chained = s"simplecache::$bare"
    val p1 = CachedFetch.resolve(chained, cache)
    // the chained and bare spellings are the SAME cache entry
    assert(CachedFetch.cachedPath(bare, cache) == p1)
    assert(CachedFetch.isCached(bare, cache))
  }

  test("distinct URLs (including query strings) cache separately, basenames readable") {
    val (cache, _) = freshDirs()
    val a = CachedFetch.cachedPath("https://host/path/ATL11_054411_0306_03_vU07.h5", cache)
    val b = CachedFetch.cachedPath("https://host/path/ATL11_054411_0306_03_vU07.h5?rev=2", cache)
    assert(a != b)
    assert(a.getFileName.toString.endsWith("-ATL11_054411_0306_03_vU07.h5"))
    assert(b.getFileName.toString.endsWith("-ATL11_054411_0306_03_vU07.h5"))
  }

  test("resolveAll fans out, keeps input order, and is idempotent") {
    val (cache, srcDir) = freshDirs()
    val urls = (0 until 12).map { i =>
      val f = srcDir.resolve(s"part_$i.bin")
      Files.write(f, Array.fill(i + 1)(i.toByte))
      s"file://$f"
    }
    val paths = CachedFetch.resolveAll(urls, cache, parallelism = 4)
    assert(paths.length == 12)
    paths.zipWithIndex.foreach { case (p, i) =>
      assert(Files.size(p) == i + 1, s"url $i")
    }
    // second pass: all hits, same paths
    assert(CachedFetch.resolveAll(urls, cache, parallelism = 4) == paths)
  }

  test("unsupported scheme is rejected, nothing left behind in the cache") {
    val (cache, _) = freshDirs()
    intercept[IllegalArgumentException] {
      CachedFetch.resolve("ftp://host/file", cache)
    }
    assert(Files.list(Paths.get(cache)).count() == 0)
  }

  test("end shape: catalog urlpaths -> cache -> one DataFrame") {
    val (cache, _) = freshDirs()
    val url = s"simplecache::file://$sf001/nation.parquet"
    val df = CachedFetch.readParquet(spark, Seq(url), cache)
    assert(df.count() == 25)
    assert(df.columns.contains("n_nationkey"))
  }
}
