package graft

import java.nio.file.Files

/** Shared spec-side manifest introspection: reads the highest-numbered
  * manifest's raw JSON (the naming contract: `_manifest-` prefix,
  * `%016d` zero-padded version ⇒ lexicographic max = newest) without
  * opening the private Manifest type. One copy — the naming contract
  * lives here, not in every spec.
  */
trait ManifestSpecHelpers {

  def manifestText(dir: String): String = {
    val d = new java.io.File(dir)
    val last = d.listFiles().filter(_.getName.startsWith("_manifest-"))
      .map(_.getName).sorted.last
    new String(Files.readAllBytes(new java.io.File(d, last).toPath), "UTF-8")
  }

  /** The serialized `"epochs"` object — pointer-movement assertions. */
  def epochPointers(manifest: String): String = {
    val i = manifest.indexOf("\"epochs\":{")
    manifest.substring(i, manifest.indexOf("}", i) + 1)
  }
}
