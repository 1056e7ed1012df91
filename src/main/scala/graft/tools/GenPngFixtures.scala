package graft.tools

/** One-shot generator for the committed `fixtures/png/` set (see
  * [[graft.pipeline.PngFixtures]]). Rerun after changing the fixture
  * specs; MultimodalSpec asserts the committed bytes match. */
object GenPngFixtures {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args.headOption.getOrElse("fixtures/png"))
    graft.pipeline.PngFixtures.writeAll(dir)
    println(s"wrote ${graft.pipeline.PngFixtures.specs.size} fixtures to ${dir.toAbsolutePath}")
  }
}
