package graft.core

/** Shared local-filesystem helpers for test-fixture and standing-table
  * directory management. */
object Fs {

  /** Recursively delete `p` WITHOUT following symlinks: fixture dirs
    * may symlink real source data (StreamReplay's legacy single-file
    * path did), so cleanup must treat a symlink as a leaf —
    * NOFOLLOW_LINKS — or it would recurse into and delete the SOURCE
    * data. Every Files.list stream is closed. Single definition:
    * StreamReplay and StandingTable both delete through here so a fix
    * to the symlink handling can never drift between copies. */
  def rmTreeNoFollow(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = java.nio.file.Files.list(p)
      try s.forEach(rmTreeNoFollow(_)) finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }
}
