package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.operators.TextMR

/** Byte-for-byte parity with the reference framework's own test
  * suite: every input under /root/reference/input/mr-wordc must
  * produce exactly /root/reference/output_compare/mr-wordc (the same
  * diff test.sh runs against the C implementation). */
class ReferenceParitySpec extends SparkSpecBase {

  private val inDir = Paths.get("/root/reference/input/mr-wordc")
  private val cmpDir = Paths.get("/root/reference/output_compare/mr-wordc")

  test("wordcount matches the reference expected output for every test file") {
    assume(Files.isDirectory(inDir), "reference checkout not present")
    val files = Files.list(inDir).iterator().asScala.toSeq
      .map(_.getFileName.toString).sorted
    assert(files.nonEmpty)
    files.foreach { f =>
      val got = TextMR.referenceFormat(
          TextMR.wordcountFile(spark, inDir.resolve(f).toString))
        .collect().map(_.getString(0)).toSeq
      val want = Files.readAllLines(cmpDir.resolve(f)).asScala.toSeq
      assert(got == want,
        s"$f: ${got.size} lines vs expected ${want.size}; " +
          s"first diff: ${got.zipAll(want, "<EOF>", "<EOF>").find(p => p._1 != p._2)}")
    }
  }
}
