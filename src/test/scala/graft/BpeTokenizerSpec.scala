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

  test("wordpiece greedy kernel: longest match first, closure fallback") {
    import graft.datapipe.WordPiece.greedyCount
    val vocab = Set("abcd", "ab", "cd", "x")
    assert(greedyCount("abcd", vocab, 4) === 1L, "whole-word piece wins")
    assert(greedyCount("abcd", vocab, 2) === 2L, "cap limits probe length")
    assert(greedyCount("abcx", vocab, 4) === 3L, "ab + c(fallback) + x")
    assert(greedyCount("zzz", vocab, 4) === 3L,
      "absent chars consume one position each")
    // greedy is NOT optimal: vocab {aa, ab, b} on 'aab' → aa + b = 2,
    // but greedy from the left also finds aa first — use 'aab' with
    // {a, ab} instead: greedy a + ab = 2 pieces (optimal here too);
    // the pinned property is determinism of the left-greedy rule
    assert(greedyCount("aab", Set("a", "ab"), 4) === 2L)
  }

  test("wordpiece vocab: deterministic weighted cut; encode matches kernel") {
    val docs = Seq((1L, "abab abab cd"), (2L, "abab")).toDF("doc_id", "text")
    val v = graft.datapipe.WordPiece.vocabTable(docs, "text", 4, 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // 'abab' freq 3, 'cd' freq 1; windows of 'abab' len<=4:
    // a×2,b×2,ab×2,ba,aba,bab,abab per occurrence → ab cnt 6, a cnt 6...
    // cut is (cnt desc, piece asc) — top-5 must start with the cnt-6 ties
    assert(v.length === 5)
    assert(v.head._1 === "a" && v.head._2 === 6L,
      s"tie at 6 breaks on piece asc: ${v.toSeq}")
    val enc = graft.datapipe.WordPiece.encodeCounts(docs, "doc_id", "text", 4, 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // vocab top-5 ∪ chars decides the piece counts; cross-check with
    // the kernel on the same set
    val top = v.map(_._1).toSet ++ Set("a", "b", "c", "d")
    val expAbab = graft.datapipe.WordPiece.greedyCount("abab", top, 4)
    val expCd = graft.datapipe.WordPiece.greedyCount("cd", top, 4)
    assert(enc(1L) === ((3L, 2 * expAbab + expCd)))
    assert(enc(2L) === ((1L, expAbab)))
  }
}
