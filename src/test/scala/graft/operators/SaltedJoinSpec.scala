package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salted join must be result-identical to the plain equi-join — the
  * salt only changes the physical distribution.
  */
class SaltedJoinSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("salted inner join equals the plain inner join") {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, "o_custkey")
      .select("o_orderkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = SaltedJoin.inner(orders, customer, "o_custkey", salts = 8)
      .select("o_orderkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("every salt bucket receives rows (the key actually spreads)") {
    val orders = Tables.orders(spark, dir)
    val buckets = orders.withColumn("_salt",
      pmod(hash(orders.columns.map(col): _*), lit(8)))
      .groupBy("_salt").count().count()
    assert(buckets === 8)
  }
}
