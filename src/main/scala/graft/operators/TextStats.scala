package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation, all pure Column
  * expressions (codegen'd, pushdown-friendly, oracle-reproducible):
  * language-ID heuristic, quality scoring, token counting, fingerprinting. */
object TextStats {

  /** Stopword-hit language heuristic: count marker-word occurrences per
    * language, pick the max (ties → 'und' = undetermined unless English
    * markers hit). Deterministic n-gram/stopword heuristic, no model. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "es" -> Seq(" el ", " la ", " los ", " es "),
    "fr" -> Seq(" le ", " la ", " les ", " est "),
    "ru" -> Seq(" и ", " в ", " не ", " на "))

  private def hits(c: Column, markers: Seq[String]): Column =
    markers.map(m => size(split(c, java.util.regex.Pattern.quote(m))) - 1)
      .reduce(_ + _)

  /** Predicted language code. Wrap text in spaces so boundary words count. */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      (lang, hits(padded, ms))
    }
    // argmax with deterministic tie-break on language code order
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  def tokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish subword count proxy: words + digit runs + punctuation marks
    * (a deterministic stand-in for a tokenizer's piece count). */
  def subwordCount(text: Column): Column =
    size(split(text, "\\s+")) +
      size(split(text, "[0-9]+")) - 1 +
      length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))

  def punctRatio(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))
    when(length(text) === 0, 0.0).otherwise(punct.cast("double") / length(text))
  }

  def stopwordRatio(text: Column, stopwords: Seq[String] = Seq("the", "a", "of", "and", "or")): Column = {
    val toks = split(lower(text), "\\s+")
    val stops = filter(toks, t => stopwords.map(s => t === s).reduce(_ || _))
    when(size(toks) === 0, 0.0).otherwise(size(stops).cast("double") / size(toks))
  }

  def avgTokenLen(text: Column): Column = {
    val toks = split(text, "\\s+")
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: length sweet-spot × low punctuation ×
    * some stopword mass (the classic web-text quality heuristics). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = least(n / 50.0, lit(1.0)) * when(n > 5000, 0.5).otherwise(1.0)
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    round(lenScore * (punctScore * 0.5 + stopScore * 0.5), 6)
  }

  /** Content fingerprint: md5 over the sorted distinct lowercase token set
    * (order/duplication-insensitive — catches shuffled near-copies). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(lower(text), "\\s+")))))

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1, public):
    * the mass of the single most frequent bigram and the mass of trigrams
    * occurring more than once — high values mark boilerplate/spam.
    *
    * SHUFFLE-FREE (guide §2.4 "remove shuffles outright"): these are
    * per-DOCUMENT statistics, so the old explode → groupBy(doc, gram) →
    * groupBy(doc) → join pipeline shipped every gram string through two
    * corpus shuffles to compute numbers derivable where the row already is.
    * One codegen kernel pass per gram width now computes (total, max count,
    * duplicate mass) row-locally; the output row set is identical — docs
    * with fewer than 3 tokens have no trigram row and drop out of the old
    * inner join, reproduced by the filter below. */
  def repetitionStats(df0: org.apache.spark.sql.DataFrame,
                      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    import graft.functions.GraftFunctions.ngram_rep_stats
    val df = graft.operators.Dedup.spread(df0)
    // the row gate is the CHEAP equivalent predicate (≥3 tokens ⟺ at least
    // one trigram AND one bigram — exactly the old inner join's row set):
    // filtering on the kernel struct instead gets predicate-pushed below
    // the spread exchange with the kernel expression SUBSTITUTED into the
    // condition, re-running the expensive pass per struct field on the
    // pre-spread single task (observed in the committed q35 after-plan v1)
    df.where(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).as("id"),
        ngram_rep_stats(col(textCol), 2).as("b"),
        ngram_rep_stats(col(textCol), 3).as("t"))
      .select(col("id"),
        col("b.total").as("n_2grams"),
        (col("b.max_c").cast("double") / col("b.total")).as("top_bigram_frac"),
        (col("t.dup_mass").cast("double") / col("t.total")).as("dup_trigram_frac"))
  }
}
