package graft.catalog

/** Shared spec helpers for byte-level catalog layout assertions — one
  * definition of what "untouched" means (path + size + content hash), so
  * the delete/update specs can never silently diverge on it. */
object CatalogTestIO {

  /** (relative path → (size, contentHash)) for every file under a dir. */
  def fileState(dir: java.io.File): Map[String, (Long, Int)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    if (!dir.exists) Map.empty
    else walk(dir).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      (f.getPath.stripPrefix(dir.getPath),
        (f.length(), java.util.Arrays.hashCode(bytes)))
    }.toMap
  }

  /** Staging/park residue for a table: any sibling of `<root>/<table>`
    * left behind by the swap machinery (`<table>.bswap*`, `.bold*`,
    * `.bappend*`, `.swap*`, `.old`) — empty after every completed op. */
  def swapResidue(root: String, table: String): Seq[String] =
    Option(new java.io.File(root).listFiles).getOrElse(Array.empty)
      .map(_.getName).filter(n => n != table && n.startsWith(table + "."))
      .toSeq.sorted

  def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rm)
    f.delete(): Unit
  }
}
