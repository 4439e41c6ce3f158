package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class BloomPruneSpec extends SparkSpec {

  test("q88 equals the unpruned join exactly") {
    val pruned = BloomPrune.q88BloomPrune(spark, sfDir).collect()
    val plain = Tables
      .lineitem(spark, sfDir)
      .join(
        Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")
      )
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue")
      )
      .orderBy(col("l_returnflag"))
      .collect()
    assert(pruned.nonEmpty && pruned.length === plain.length)
    pruned.zip(plain).foreach { case (p, q) =>
      assert(p.getString(0) === q.getString(0))
      assert(p.getLong(1) === q.getLong(1))
      assert(p.getDouble(2) === q.getDouble(2))
    }
  }

  test("the bloom actually prunes: surviving scan rows shrink toward join selectivity") {
    val urgent = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    val bits = BloomPrune.buildBloom(spark, urgent.select(col("o_orderkey")))
    val fn = BloomPrune.installBloom(spark, bits)

    val li = Tables.lineitem(spark, sfDir)
    val total = li.count()
    val survived = li.filter(expr(s"$fn(l_orderkey)")).count()
    val trueMatch = li
      .join(urgent.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()

    // no false negatives: every true match survives
    assert(survived >= trueMatch)
    // pruning is real: survivors ≈ true matches + fpp·rest, way below total
    assert(survived <= trueMatch + math.ceil(0.03 * (total - trueMatch)).toLong, s"$survived vs $trueMatch/$total")
    assert(survived < total, "bloom pruned nothing")
  }

  test("installBloom is idempotent per bitset and fresh per distinct bitset") {
    val b1 = Array(1L, 2L, 3L)
    val b2 = Array(9L, 9L, 9L)
    val n1 = BloomPrune.installBloom(spark, b1)
    val n1b = BloomPrune.installBloom(spark, b1.clone()) // content-equal ⇒ same binding
    val n2 = BloomPrune.installBloom(spark, b2)
    assert(n1 === n1b)
    assert(n1 !== n2)
  }
}
