package graft.operators

import graft.SparkSpec

class UnigramLmOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent plain-Scala mirror of the trainer (same fixed-point
    * arithmetic, same tie rules) — validates the unrolled SQL DP against
    * a direct recursive implementation.
    */
  private def refTrain(docs: Seq[String])
      : Map[String, (Long, Long, Long, Long)] = {
    val words = docs
      .flatMap(_.trim.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty))
      .filter(w => w.length >= 1 && w.length <= UnigramLmOps.MaxWordLen)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sub = {
      val m = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, n) <- words; j <- 1 to w.length;
           l <- 1 to math.min(UnigramLmOps.MaxPieceLen, j))
        m(w.substring(j - l, j)) += n
      m.toMap
    }
    val vocab = sub.filter(_._1.length == 1).toSeq ++
      sub.filter(_._1.length >= 2).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(UnigramLmOps.VocabMulti)
    val vocabSet = vocab.map(_._1).toSet
    def probs(cs: Map[String, Long]): Map[String, Long] = {
      val tot = cs.values.sum
      cs.map { case (p, c) =>
        p -> math.max(1L, (BigInt(c) * 1000000000L / tot).toLong) }
    }
    def viterbi(w: String, p: Map[String, Long]): Seq[String] = {
      val L = w.length
      val b = Array.fill(L + 1)(0.0); b(0) = 1.0
      val bp = Array.fill(L + 1)(1)
      for (j <- 1 to L) {
        var best = -1.0; var bl = 1
        for (l <- 1 to math.min(UnigramLmOps.MaxPieceLen, j)) {
          val cand = b(j - l) *
            (p.getOrElse(w.substring(j - l, j), 0L).toDouble / 1000000000.0)
          if (cand > best) { best = cand; bl = l }
          else if (cand == best && l > bl) bl = l // longest piece wins ties
        }
        b(j) = best; bp(j) = bl
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = L
      while (pos >= 1) { val l = bp(pos); out += w.substring(pos - l, pos); pos -= l }
      out.toSeq
    }
    def eStep(p: Map[String, Long]): Map[String, Long] = {
      val m = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, n) <- words; piece <- viterbi(w, p)) m(piece) += n
      vocabSet.map(v => v -> m(v)).toMap
    }
    val p0 = probs(vocab.toMap)
    val c1 = eStep(p0)
    val c2 = eStep(probs(c1))
    val p2 = probs(c2)
    vocab.map { case (piece, c0) =>
      piece -> (c0, c1(piece), c2(piece), p2(piece)) }.toMap
  }

  private def run(docs: Seq[String]) = {
    val df = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    UnigramLmOps.unigramLmVocab(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
  }

  test("unigramLmVocab matches the independent Scala Viterbi-EM reference") {
    val docs = Seq(
      "abab abab ab ababab",
      "baba ab abab aa bb",
      "xyz xyz xyzzy",
      "hello hello help yell")
    assert(run(docs) == refTrain(docs))
  }

  test("unigramLmVocab segments conserve characters: sum(count·len) = corpus chars") {
    val docs = Seq("mississippi mississippi miss sip",
      "pip pip pips mississippi")
    val out = run(docs)
    val charMass = docs
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .filter(_.length <= UnigramLmOps.MaxWordLen).map(_.length.toLong).sum
    for (round <- Seq(1, 2)) {
      val mass = out.map { case (piece, v) =>
        piece.length.toLong * (if (round == 1) v._2 else v._3) }.sum
      assert(mass == charMass, s"round $round segment mass $mass != $charMass")
    }
  }

  test("unigramLmVocab keeps every observed character and caps multi-char pieces") {
    val docs = Seq("qwe rty qwe", "rty rty qwerty")
    val out = run(docs)
    for (c <- "qwerty") assert(out.contains(c.toString), s"char $c missing")
    assert(out.keys.count(_.length >= 2) <= UnigramLmOps.VocabMulti)
    assert(out.values.forall(_._4 >= 1L), "likelihood floor-at-1")
  }

  test("unigramEncode's corpus piece mass equals the trainer's round-2 counts") {
    val docs = Seq("abab abab ab ababab", "hello hello help yell", "miss sip")
    val df = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val enc = UnigramLmOps.unigramEncode(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // every doc with eligible words reports; fertility is the exact ratio
    assert(enc.keySet == docs.indices.map(_.toLong).toSet)
    for ((_, (nw, np, fert)) <- enc) {
      assert(nw >= 1L && np >= nw, "at least one piece per word")
      assert(fert == np * 1000000L / nw)
    }
    // conservation: total encoded pieces == the trainer's em2 mass
    val em2Total = run(docs).values.map(_._3).sum
    assert(enc.values.map(_._2).sum == em2Total)
  }

  test("EM moves mass onto consistent pieces: a repeated bigram dominates") {
    // 'ab' repeated: the whole-word piece 'abab' and the bigram 'ab'
    // both exist; whichever Viterbi picks, its round-2 count is
    // consistent (no split mass between overlapping pieces of one word)
    val out = run(Seq("abab abab abab abab"))
    val ab = out("ab"); val abab = out("abab")
    assert(ab._3 == 0L || abab._3 == 0L,
      s"overlapping pieces must not share one word's mass: $out")
    assert(ab._3 > 0L || abab._3 > 0L)
  }
}
