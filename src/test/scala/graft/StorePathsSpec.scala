package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.model.StorePaths

/** The shared store-key discipline: the hash-suffixed key plus the
  * one-shot garbage collection of pre-suffix legacy store directories
  * (which the suffix upgrade orphaned under the shared root).
  */
class StorePathsSpec extends AnyFunSuite {

  private def sanitized(p: String) = p.replaceAll("[^A-Za-z0-9._-]", "_")

  test("key gc-collects a legacy store dir that carries our fingerprint marker") {
    val fake = s"/graft-test/legacy-gc-${System.nanoTime()}"
    val legacy = Paths.get(StorePaths.root, sanitized(fake))
    val store = legacy.resolve("cells_site_p6")
    Files.createDirectories(store)
    Files.write(store.resolve("_SOURCE_FINGERPRINT"), "1_2_3".getBytes)
    val k = StorePaths.key(fake)
    assert(k == s"${sanitized(fake)}-" + k.split("-").last)
    assert(!Files.exists(legacy), "fingerprint-stamped legacy dir must be collected")
  }

  test("key leaves a legacy-named dir without our marker untouched") {
    val fake = s"/graft-test/legacy-keep-${System.nanoTime()}"
    val legacy = Paths.get(StorePaths.root, sanitized(fake))
    Files.createDirectories(legacy.resolve("user-data"))
    StorePaths.key(fake)
    assert(Files.exists(legacy.resolve("user-data")),
      "a dir that only shares the sanitized name is not ours to delete")
    // cleanup of the fixture itself
    Files.delete(legacy.resolve("user-data")); Files.delete(legacy)
  }
}
