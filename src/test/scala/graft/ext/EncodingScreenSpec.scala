package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class EncodingScreenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def screen(rows: Seq[(Long, String)], maxSignals: Int = 0) =
    TextAnalysis.encodingScreen(rows.toDF("doc_id", "text"), maxSignals = maxSignals)
      .as[(Long, Option[Int], Option[Long], Option[Long], Option[Long], Option[Boolean])]
      .collect().toList.sortBy(_._1)

  test("clean prose keeps; whitespace controls (tab, newline, CR) never count") {
    val out = screen(Seq(
      1L -> "Perfectly ordinary prose survives.",
      2L -> "tabs\tand\nnewlines\rare\twhitespace, not damage."))
    assert(out.forall { case (_, _, r, c, m, keep) =>
      r.contains(0L) && c.contains(0L) && m.contains(0L) && keep.contains(true)
    })
  }

  test("replacement chars and C0/C1 boundary chars each count exactly") {
    val c0 = "\u0001\u0005\u0008\u000B\u000C\u000E" // 6 in-class C0 chars
    val c1 = "\u001F\u007F\u009F" // unit-sep + DEL + C1 range end
    val out = screen(Seq(
      1L -> "bad \uFFFD decode \uFFFD here",
      2L -> s"x${c0}y${c1}z"))
    assert(out(0)._3.contains(2L) && out(0)._4.contains(0L) && out(0)._6.contains(false))
    assert(out(1)._3.contains(0L) && out(1)._4.contains(9L) && out(1)._6.contains(false))
  }

  test("mojibake signatures count per occurrence; bare Ã/Â/â do not") {
    val out = screen(Seq(
      1L -> "CafÃ© rÃ©sumÃ© â€” naÃ¯ve Â· text",   // 3×Ã© + â€” + Ã¯ + Â· = 6
      2L -> "Ã alone, Â alone, â alone: no pair")) // prefixes without a signature pair
    assert(out(0)._5.contains(6L) && out(0)._6.contains(false))
    assert(out(1)._5.contains(0L) && out(1)._6.contains(true))
  }

  test("NULL text yields NULL metrics and a NULL verdict") {
    val out = screen(Seq(1L -> null.asInstanceOf[String]))
    assert(out == List((1L, None, None, None, None, None)))
  }

  test("maxSignals is an inclusive budget on the exact integer sum") {
    val rows = Seq(1L -> "one \uFFFD and one Ã© make two signals")
    assert(screen(rows, maxSignals = 1).head._6.contains(false))
    assert(screen(rows, maxSignals = 2).head._6.contains(true))
    assertThrows[IllegalArgumentException](screen(rows, maxSignals = -1))
  }

  test("signature set is substring-free (counts add without overlap)") {
    TextAnalysis.MojibakeSignatures.combinations(2).foreach { case Seq(a, b) =>
      assert(!a.contains(b) && !b.contains(a), s"overlap: '$a' vs '$b'")
    }
    // and none contains a control-class char, so the two counts are disjoint
    val ctl = TextAnalysis.MojibakeSignatures.mkString
      .exists(ch => ch < ' ' && ch != '\t' && ch != '\n' && ch != '\r' ||
        ch >= '\u007F' && ch <= '\u009F')
    assert(!ctl)
  }
}
