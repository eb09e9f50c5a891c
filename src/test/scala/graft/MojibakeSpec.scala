package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mojibake

/** The ftfy-style repair chain: corrupt-then-fix round trips, ordering of
  * the 3-char sequences ahead of the accent pairs, idempotence, and null
  * safety. All literals \uXXXX-escaped (pure-ASCII source).
  */
class MojibakeSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def fixOne(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(Mojibake.fixMojibake(org.apache.spark.sql.functions.col("t")))
      .collect()(0).getString(0)

  test("corrupt -> fix round-trips every mapped character") {
    val clean = Mojibake.table.map(_._2).mkString("x", "y", "z")
    val bad = Mojibake.corrupt(clean)
    assert(bad != clean)
    assert(fixOne(bad) == clean)
  }

  test("the 0x9d-hole right quote and dashes repair before accent rules fire") {
    // "â€" must map to a right double quote as a unit; if
    // the 2-char accent table ran first nothing would match and the control
    // char would survive.
    assert(fixOne("aâ€b") == "a”b")
    assert(fixOne("â€“aâ€”") == "–a—")
  }

  test("accents, nbsp pair, euro; clean and ASCII text pass through") {
    assert(fixOne("cafÃ© dÃ©jÃ  vu") ==
      "café déjà vu")
    assert(fixOne("Â 5â‚¬") == " 5€")
    assert(fixOne("plain ascii 123") == "plain ascii 123")
    assert(fixOne("already fixed é—”") == "already fixed é—”")
  }

  test("repair is idempotent and null-safe") {
    val once = fixOne(Mojibake.corrupt("café … “ok”"))
    assert(fixOne(once) == once)
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(Mojibake.fixMojibake(org.apache.spark.sql.functions.col("t")))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("table invariants: longest-first, unique sources, cp1252 fidelity") {
    val lens = Mojibake.table.map(_._1.length)
    assert(lens.sorted.reverse == lens, "3-char sequences must precede 2-char")
    assert(Mojibake.table.map(_._1).distinct.size == Mojibake.table.size)
    // Each left side really is the cp1252/latin-1 rendering of the right
    // side's UTF-8 bytes — recompute from first principles.
    val cp1252Holes = Map(0x80 -> 0x20ac, 0x82 -> 0x201a, 0x84 -> 0x201e,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02c6,
      0x89 -> 0x2030, 0x8a -> 0x0160, 0x8b -> 0x2039, 0x8c -> 0x0152,
      0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201c, 0x94 -> 0x201d,
      0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014, 0x98 -> 0x02dc,
      0x99 -> 0x2122, 0x9a -> 0x0161, 0x9b -> 0x203a, 0x9c -> 0x0153,
      0x9e -> 0x017e, 0x9f -> 0x0178, 0x83 -> 0x0192, 0x8e -> 0x017d)
    Mojibake.table.foreach { case (from, to) =>
      val expect = to.getBytes("UTF-8").map { b =>
        val u = b & 0xff
        cp1252Holes.getOrElse(u, u).toChar
      }.mkString
      assert(from == expect, s"mapping for ${to.map(c => f"\\u${c.toInt}%04x")}")
    }
  }
}
