package graft

import org.apache.spark.sql.functions._

import graft.datapipe.BpeTokenizer

/** Hand-verified BPE training on the classic low/lower/lowest corpus
  * (Sennrich et al.'s running example shape), plus the greedy-fold
  * edge cases that make merge application exact.
  */
class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "low low lower lowest"),
    (2L, "new newer newest new")).toDF("doc_id", "text")

  test("merges replay the weighted-argmax training rounds in rank order") {
    // With the end-of-word marker, word-final symbols are distinct:
    // round-1 pair counts tie at 4 for (l,o), (n,e), (w,e) — (o,w) and
    // (e,w) split into marked/unmarked variants of 2 each — and the
    // UTF-8 tie-break takes them in that order. Rounds 4-6 are all
    // 2-count ties where Eow (U+0002) sorts before every letter, so
    // the word-final merges (lo,w␂) and (ne,w␂) win their rows.
    val E = BpeTokenizer.Eow
    val merges = BpeTokenizer.trainMerges(corpus, "text", 6)
    assert(merges === Seq(("l", "o"), ("n", "e"), ("w", "e"),
      ("lo", "w" + E), ("lo", "we"), ("ne", "w" + E)))
  }

  test("encoding counts symbols per word through the learned merges") {
    // after 6 merges: low=[low␂], lower=[lowe,r␂], lowest=[lowe,s,t␂],
    // new=[new␂], newer=[ne,we,r␂], newest=[ne,we,s,t␂]
    val merges = BpeTokenizer.trainMerges(corpus, "text", 6)
    val out = BpeTokenizer.encode(corpus, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((4L, 1 + 1 + 2 + 3)), "low low lower lowest")
    assert(out(2L) === ((4L, 1 + 3 + 4 + 1)), "new newer newest new")
  }

  test("merge application is greedy left-to-right non-overlapping") {
    val S = BpeTokenizer.Sep
    val df = Seq(Seq("a", "a", "a", "a"), Seq("a", "a", "a"))
      .map(_.mkString(S)).toDF("syms")
    val merged = df.select(
      BpeTokenizer.applyMerge(col("syms"), "a", "a").as("m")).as[String]
      .collect().map(_.split(S).toSeq)
    assert(merged(0) === Seq("aa", "aa"), "aaaa -> [aa, aa]")
    assert(merged(1) === Seq("aa", "a"), "aaa -> [aa, a]")
  }

  test("a longer symbol merely ending in the left part never matches") {
    // symbols [xa, b]: merging (a, b) must NOT fire on the 'a' inside 'xa'
    val S = BpeTokenizer.Sep
    val df = Seq(Seq("xa", "b").mkString(S)).toDF("syms")
    val out = df.select(BpeTokenizer.applyMerge(col("syms"), "a", "b"))
      .as[String].collect().head
    assert(out.split(S).toSeq === Seq("xa", "b"))
  }

  test("in-memory and distributed training agree on merges and vocab state") {
    val mem = BpeTokenizer.train(corpus, "text", 6)
    val dist = BpeTokenizer.trainDistributed(corpus, "text", 6)
    assert(mem.merges === dist.merges)
    def state(m: BpeTokenizer.BpeModel) = m.vocab
      .select(col("w"), col("cnt"), col("syms")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(state(mem) === state(dist))
  }

  test("a trained model encodes unseen words through the merge chain") {
    val model = BpeTokenizer.train(corpus, "text", 6)
    // "slow" was never seen: s·l·o·w␂ → (l,o) → (lo,w␂) → [s, low␂]
    val other = Seq((9L, "low slow")).toDF("doc_id", "text")
    val out = BpeTokenizer.encode(other, "doc_id", "text", model).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 2L, "n_words")
    assert(out.head.getLong(2) === 1L + 2L, "low=[low␂], slow=[s,low␂]")
  }

  test("training stops early once the vocabulary is fully merged") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // round 1 merges (a,b␂); afterwards every word is one symbol
    val merges = BpeTokenizer.trainMerges(tiny, "text", 10)
    assert(merges === Seq(("a", "b" + BpeTokenizer.Eow)))
  }
}
