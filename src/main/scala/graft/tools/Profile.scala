package graft.tools

import graft.{GraftSession, Tables}
import graft.operators._

/** Scratch profiler for operator stages (dev only). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    val vecs = Tables.embeddings(spark, dir)
    time("minhash signatures") { DedupOps.withMinhashSignature(docs).count() }
    time("minhash full") { DedupOps.dedupMinhashLsh(docs).count() }
    time("simhash signatures") { DedupOps.withSimhash(docs).count() }
    time("simhash full") { DedupOps.dedupSimhash(docs).count() }
    time("jaccard full") { DedupOps.dedupNgramJaccard(docs).count() }
    time("cosine topk") { SimilarityOps.bruteCosineTopK(vecs).count() }
    time("lsh ann") { SimilarityOps.lshAnn(vecs).count() }
    time("doc_fingerprint") { TextOps.docFingerprint(docs).count() }
    spark.stop()
  }
}
