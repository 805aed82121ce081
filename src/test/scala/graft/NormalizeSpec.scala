package graft

import org.apache.spark.sql.functions._

import graft.normalize.Normalize

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("text").select(Normalize.normText($"text")).as[String].collect()(0)

  test("golden: punctuation padded, lowered, whitespace collapsed") {
    assert(norm("Hello,World!  Great") == "hello , world ! great")
    assert(norm("a(b)c") == "a ( b ) c")
    assert(norm("  many   spaces\t\tand\ntabs ") == "many spaces and tabs")
  }

  test("golden: html entities unescaped (clean_text semantics)") {
    assert(norm("a &amp; b") == "a & b")
    assert(norm("x &lt;tag&gt;") == "x < tag >")
    assert(norm("it&#39;s") == "it 's")
  }

  test("golden: possessive 's split like the reference") {
    assert(norm("John's book") == "john 's book")
    // reference rule (conver_test.py:85): lowercase s only, no boundary
    assert(norm("JOHN'S BOOK") == "john's book") // uppercase S: no split
    assert(norm("its'stuff") == "its 'stuff") // mid-word: splits, no space after s
    assert(norm("dogs' toys") == "dogs' toys") // trailing apostrophe: untouched
  }

  test("golden: full numeric + named entity unescape (html.unescape parity)") {
    // Cyrillic decimal references (ubiquitous in the reference's Avito corpus)
    assert(norm("&#1090;&#1077;&#1089;&#1090;") == "тест")
    assert(norm("&#x27;s") == "'s") // hex apostrophe + possessive interaction
    assert(norm("A&#x2014;B") == "a—b") // em-dash via hex (non-ASCII: not padded)
    assert(norm("caf&eacute;") == "café") // HTML4 named beyond the basic set
    assert(norm("B&auml;r &szlig;") == "bär ß")
    assert(norm("1&frac12;") == "1½")
    assert(norm("x&mdash;y") == "x—y")
    // astral plane (surrogate pair)
    assert(norm("&#128512;") == "😀")
    // unknown / malformed pass through with & padded as punctuation
    assert(norm("&notanentity;") == "& notanentity ;")
    assert(norm("a&b") == "a & b")
    assert(norm("&#xZZ;") == "& # xzz ;")
    // digit-less numeric refs: html.unescape's charref regex requires ≥1
    // digit, so these pass through UNCHANGED (round-3 ADVICE parity pin)
    assert(norm("&#x;") == "& # x ;")
    assert(norm("&#;") == "& # ;")
    assert(norm("a&#X;b") == "a & # x ; b")
    // double-escaped: ONE unescape pass, like html.unescape
    assert(norm("&amp;amp;") == "& amp ;")
  }

  test("golden: invalid/control numeric refs follow html.unescape's tables") {
    assert(norm("a&#0;b") == "a�b") // NUL → U+FFFD, not a raw NUL
    assert(norm("x&#128;y") == "x€y") // windows-1252 remap
    assert(norm("&#146;s") == "’s") // ’ is not ASCII "'": possessive must NOT fire
    assert(norm("q&#x81;w") == "q\u0081w") // 0x81 maps to itself
    assert(norm("a&#1;b") == "ab") // C0 control → deleted
    assert(norm("a&#11;b") == "ab") // VT → deleted
    assert(norm("a&#13;b") == "a b") // CR → real CR → whitespace collapse
    assert(norm("a&#xD800;b") == "a�b") // lone surrogate → U+FFFD
    assert(norm("a&#1114112;b") == "a�b") // > 0x10FFFF → U+FFFD
    assert(norm("a&#99999999999999;b") == "a�b") // arbitrarily large too
    assert(norm("a&#x1FFFF;b") == "ab") // noncharacter → deleted
  }

  test("idempotence: normalizing twice equals once") {
    val samples = Seq("Hello, World!", "a&amp;b (c)", "John's  dog&#39;s", "x.y.z;q",
      "price $1,234.56 usd", "ALL CAPS!!!")
    val once = samples.toDF("text").select(Normalize.normText($"text").as("n")).as[String].collect()
    val twice = once.toSeq.toDF("text").select(Normalize.normText($"text").as("n")).as[String].collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("price extraction: dirty numeric formats parse to the same value") {
    val df = Seq("xx price $1,234.56", "yy price 1,234.56", "zz price 1234.56 usd",
      "no price here at all", "price garbage").toDF("text")
    val got = df.select(Normalize.price($"text")).as[Double].collect().toSeq
    assert(got == Seq(1234.56, 1234.56, 1234.56, 0.0, 0.0))
  }

  test("invariant: normalization never mutates the raw text column") {
    val pages = graft.fixtures.Fixture.pages(spark, 500)
    val before = pages.agg(expr("bit_xor(xxhash64(sha2(text, 256)))")).as[Long].collect()(0)
    val derived = pages.withColumn("norm", Normalize.normText($"text"))
      .withColumn("toks", Normalize.tokens($"text"))
      .withColumn("price", Normalize.price($"text"))
    val after = derived.agg(expr("bit_xor(xxhash64(sha2(text, 256)))")).as[Long].collect()(0)
    assert(before == after)
  }

  test("single-pass norm expression ≡ the regex-chain form on fixture corpus") {
    val pages = graft.fixtures.Fixture.pages(spark, 2000)
    val diff = pages.select(
        Normalize.normText($"text").as("fast"),
        Normalize.normTextRegex($"text").as("ref"))
      .where($"fast" =!= $"ref")
    assert(diff.count() == 0)
  }

  test("single-pass norm ≡ regex chain on case/boundary/entity-subset edge cases") {
    val samples = Seq(
      "John's book", "JOHN'S BOOK", "its'stuff", "dogs' toys", "O'Sullivan's",
      "it&#39;s", "a &amp; b", "x &lt;tag&gt;", "A'sB", "'s leading",
      "trailing's", "s's's", "Mixed CASE with 'S and 's tokens")
    val diff = samples.toDF("text").select(
        Normalize.normText($"text").as("fast"),
        Normalize.normTextRegex($"text").as("ref"))
      .where($"fast" =!= $"ref")
    assert(diff.count() == 0)
  }

  test("domain: normalized url host") {
    val got = Seq("https://Site3.Example.com/p/x?q=1").toDF("url")
      .select(Normalize.domain($"url")).as[String].collect()(0)
    assert(got == "site3.example.com")
  }
}
