package graft.functions

import graft.SparkSpec
import graft.operators.BloomOps
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val bloomAgg = udaf(new BloomFilterAgg(1 << 17, 5),
    Encoders.scalaLong)

  test("no false negatives: every inserted key probes true") {
    val keys = (1L to 5000L).map(_ * 7919L)
    val bloom = keys.toDF("k").repartition(7)
      .agg(bloomAgg(col("k")).as("bloom_words"))
    val misses = keys.toDF("k").join(broadcast(bloom))
      .filter(!BloomFilter.mightContain(col("bloom_words"), col("k")))
      .count()
    assert(misses == 0L)
  }

  test("false-positive rate stays below 1% at designed load") {
    val inserted = (1L to 3000L).map(_ * 7919L)
    val bloom = inserted.toDF("k").agg(bloomAgg(col("k")).as("bloom_words"))
    // absent keys: odd offsets never hit the inserted multiples
    val absent = (1L to 20000L).map(_ * 7919L + 3L)
    val fp = absent.toDF("k").join(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("bloom_words"), col("k")))
      .count()
    assert(fp.toDouble / absent.size < 0.01, s"fp=$fp")
  }

  test("partitioned build ORs to the same filter as a single-partition build") {
    val keys = (1L to 2000L).map(_ * 31L)
    val a = keys.toDF("k").repartition(8)
      .agg(bloomAgg(col("k")).as("w")).collect()(0).getSeq[Long](0)
    val b = keys.toDF("k").coalesce(1)
      .agg(bloomAgg(col("k")).as("w")).collect()(0).getSeq[Long](0)
    assert(a == b)
  }

  test("bloomPrunedJoin equals the plain join") {
    val fact = (1L to 2000L).map(k => (k % 97L, k)).toDF("fk", "v")
    val dim = (0L to 96L by 3L).map(k => (k, s"d$k")).toDF("dk", "name")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .orderBy("fk", "v").collect().map(_.toString).toSeq
    val pruned = BloomOps.bloomPrunedJoin(fact, dim, "fk", "dk")
      .orderBy("fk", "v").collect().map(_.toString).toSeq
    assert(pruned == plain && plain.nonEmpty)
  }

  test("empty dim yields an all-zero filter that rejects everything") {
    val fact = (1L to 50L).toDF("fk")
    val dim = Seq.empty[Long].toDF("dk")
    assert(BloomOps.bloomPrunedJoin(fact, dim, "fk", "dk").count() == 0L)
  }
}
