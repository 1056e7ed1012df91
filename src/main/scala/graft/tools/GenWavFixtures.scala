package graft.tools

/** One-shot generator for the committed `fixtures/wav/` set (see
  * [[graft.pipeline.WavFixtures]]). Rerun after changing the fixture
  * specs; MultimodalSpec asserts the committed bytes match. */
object GenWavFixtures {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args.headOption.getOrElse("fixtures/wav"))
    graft.pipeline.WavFixtures.writeAll(dir)
    println(s"wrote ${graft.pipeline.WavFixtures.specs.size} fixtures to ${dir.toAbsolutePath}")
  }
}
