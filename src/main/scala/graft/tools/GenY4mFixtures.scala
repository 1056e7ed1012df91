package graft.tools

/** One-shot generator for the committed `fixtures/y4m/` set (see
  * [[graft.pipeline.Y4mFixtures]]). Rerun after changing the fixture
  * specs; MultimodalSpec asserts the committed bytes match. */
object GenY4mFixtures {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args.headOption.getOrElse("fixtures/y4m"))
    graft.pipeline.Y4mFixtures.writeAll(dir)
    println(s"wrote ${graft.pipeline.Y4mFixtures.specs.size} fixtures to ${dir.toAbsolutePath}")
  }
}
