package graft

import graft.operators.HtmlExtract

import org.apache.spark.sql.functions._

/** Golden + fuzz coverage for the HTML extraction pipeline (the codec
  * contract: a deterministic walker, fuzzed for robustness, plus a
  * pure-Scala reference differential proving the Column pipeline wires
  * the shared step list faithfully). The cross-engine (DuckDB) replay
  * of the same steps is gated by the driver's `html_extract` /
  * `html_boilerplate` oracles.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def ex(s: String): String = HtmlExtract.extractString(s)

  test("golden: tags, blocks, script/style/comment payloads, entities") {
    assert(ex("<p>hello</p><p>world</p>") == "hello\nworld")
    assert(ex("a<b>bold</b>c") == "a bold c")
    assert(ex("<script>var x = 1 < 2; alert(\"hi\")</script>after") == "after")
    assert(ex("<style type=\"text/css\">body { color: red; }</style>after") == "after")
    assert(ex("keep<!-- <p>dropped</p> -->also") == "keep also")
    assert(ex("<SCRIPT SRC=\"x.js\">payload</SCRIPT>ok") == "ok")
    assert(ex("<div>a<br/>b</div>") == "a\nb")
    assert(ex("x &amp; y &lt;tag&gt; &quot;q&quot; &#39;a&#39; &nbsp;z")
      == "x & y <tag> \"q\" 'a' z")
    // &amp; decodes LAST: &amp;lt; is the TEXT "&lt;", not a tag char
    assert(ex("&amp;lt;") == "&lt;")
    assert(ex("") == "")
    assert(ex("plain text, no markup.") == "plain text, no markup.")
    // unknown entities pass through verbatim
    assert(ex("<p>&copy; 2026</p>") == "&copy; 2026")
    // whitespace assembly: runs collapse, blank lines vanish, ends trim
    assert(ex("  <p>  a   b  </p>\n\n<p>c</p>  ") == "a b\nc")
  }

  test("fuzz: deterministic random markup — structural invariants hold") {
    val rnd = new scala.util.Random(20260816L)
    val words = Vector("alpha", "beta", "gamma", "delta", "x1", "tok", "Zz")
    val inline = Vector("b", "i", "em", "span", "a href=\"/x\"", "strong")
    val block = Vector("p", "div", "li", "h2", "td", "blockquote")
    def doc(): String = {
      val sb = new StringBuilder
      (0 until (rnd.nextInt(40) + 1)).foreach { _ =>
        rnd.nextInt(10) match {
          case 0 => sb.append(s"<script>var ${words(rnd.nextInt(words.size))} = 1 < 2;</script>")
          case 1 => sb.append(s"<style>.c${rnd.nextInt(9)} { margin: 0; }</style>")
          case 2 => sb.append(s"<!-- ${words(rnd.nextInt(words.size))} <p>x</p> -->")
          case 3 =>
            val t = block(rnd.nextInt(block.size))
            sb.append(s"<$t>").append(words(rnd.nextInt(words.size))).append(s"</$t>")
          case 4 =>
            val t = inline(rnd.nextInt(inline.size))
            sb.append(s"<$t>").append(words(rnd.nextInt(words.size)))
              .append(s"</${t.takeWhile(_ != ' ')}>")
          case 5 => sb.append("&amp; ").append("&quot;q&quot;")
          case 6 => sb.append("<br/>")
          case 7 => sb.append("   \t ")
          case _ => sb.append(words(rnd.nextInt(words.size))).append(' ')
        }
      }
      sb.toString
    }
    val docs = (1 to 300).map(_ => doc())
    docs.foreach { h =>
      val t = ex(h)
      // no markup survives (the fuzz alphabet has no &lt;/&gt;, so any
      // angle bracket in the output is a stripping failure)
      assert(!t.contains('<') && !t.contains('>'), s"markup survived: $t\nfrom: $h")
      // script/style payloads are dropped, not flattened into text
      assert(!t.contains("var ") && !t.contains("margin:"), s"payload survived: $t")
      assert(!t.contains("  "), s"double space: '$t'")
      assert(!t.contains("\n\n") && !t.contains(" \n") && !t.contains("\n "),
        s"loose line break: '$t'")
      assert(t == t.trim, s"untrimmed: '$t'")
    }
  }

  test("differential: the Column pipeline equals the string reference") {
    val rnd = new scala.util.Random(99L)
    val cases = (1 to 60).map { i =>
      val bits = Vector(
        s"<p>par$i</p>", "<script>drop() < 1;</script>", "&amp;lt;", "&nbsp;x",
        s"<div class='c$i'>d</div>", "<!-- c -->", "plain", "<br>", "  sp   ace  ")
      (1 to (rnd.nextInt(6) + 1)).map(_ => bits(rnd.nextInt(bits.size))).mkString(" ")
    }
    val got = cases.toDF("html")
      .select(HtmlExtract.extract(col("html")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(ex), "Column pipeline diverged from the shared step list")
  }

  test("boilerplate: keywords, short fragments, and repeated template lines drop") {
    val docs = Seq(
      (1L, "Home | About\nThis is a real sentence with enough words to keep.\nCopyright 2026 Example"),
      (2L, "Home | About\nAnother long informative sentence that clearly stays in.\nsubscribe now"),
      (3L, "Home | About\nShort frag\nA third full sentence with terminal punctuation stays."),
      (4L, "Home | About\nunique four word line."),
      (5L, "Home | About\nFifth doc body sentence long enough to be content.")
    ).toDF("doc_id", "text")
    val out = HtmlExtract.removeBoilerplate(docs, "doc_id", "text", minDocs = 5L)
      .orderBy(col("doc_id")).collect()
    // "Home | About" appears in 5 docs -> frequency boilerplate; the
    // keyword lines and the 2-word fragment drop; real sentences stay
    assert(out.map(_.getLong(3)).toSeq == Seq(2L, 2L, 2L, 1L, 1L))
    assert(out(0).getString(1) == "This is a real sentence with enough words to keep.")
    assert(out(2).getString(1) == "A third full sentence with terminal punctuation stays.")
    assert(out(3).getString(1) == "unique four word line.")
    // n_lines counts ALL lines pre-removal
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 3L, 3L, 2L, 2L))
  }

  test("links: hrefs then srcs in document order, host only for absolute URLs") {
    val docs = Seq(
      (1L, "<a href=\"https://example.com/a?x=1\">x</a><img src=\"/rel/i.png\"><a href=\"/c\">y</a>"),
      (2L, "no links here")).toDF("doc_id", "html")
    val out = HtmlExtract.links(docs, "doc_id", "html")
      .orderBy(col("doc_id"), col("link_no")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3))).toSeq
    assert(out == Seq(
      (1L, 0, "https://example.com/a?x=1", "example.com"),
      (1L, 1, "/c", ""),
      (1L, 2, "/rel/i.png", "")))
  }

  test("extraction is a single codegen'd projection (no UDF, no shuffle)") {
    // derive from range(): a local literal corpus constant-folds into
    // a LocalTableScan and the projection vanishes from the plan
    val df = spark.range(10)
      .select(concat(lit("<p>x"), col("id"), lit("</p>")).as("html"))
      .select(HtmlExtract.extract(col("html")).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction shuffled:\n$plan")
    // the `*(n)` prefix is the whole-stage-codegen marker in simpleString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }
}
