package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StorageAndSkewSpec extends SparkSpec {

  test("partitioned write + partition-pruned read") {
    val dir = Files.createTempDirectory("graft-part").toString + "/orders"
    val orders = Tables.orders(spark, Sf0001)
      .withColumn("status", col("o_orderstatus"))
    StorageOps.writePartitioned(orders, dir, "status")

    val pruned = StorageOps.readPartition(spark, dir, "status", "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "scan must list PartitionFilters")
    assert(plan.contains("isnotnull(status") || plan.contains("status#"),
      s"partition predicate missing from scan: $plan")
    // pruning correctness: same rows as a plain filter
    val expected = orders.filter(col("status") === "F").count()
    assert(pruned.count() == expected && expected > 0)
    // and the data-level PushedFilters must NOT contain the partition
    // predicate (it is resolved at listing time)
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(scanLine.nonEmpty)
  }

  test("bucketed table joins without a shuffle on the bucket key") {
    // warehouse + metastore live in /tmp via build.sbt javaOptions
    // (static confs); a fresh derby metastore does not know about
    // leftover table dirs from previous JVMs — clear them first
    Seq("orders_b", "lineitem_b").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val dir = new java.io.File(s"/tmp/graft-warehouse/$tbl")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val orders = Tables.orders(spark, Sf0001)
    StorageOps.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    val li = Tables.lineitem(spark, Sf0001)
    StorageOps.writeBucketed(
      li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
      "o_orderkey", 4)
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-bucketed sort-merge join: no Exchange on either side
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
  }

  test("q_bucketed_join plan: zero hash exchanges, bucketed scans, oracle-equal result") {
    // clear leftovers from previous JVMs (fresh derby metastore does
    // not know about stale table dirs)
    val tbls = Seq("customer", "orders")
      .map(n => s"graft_bkt_${n}_${math.abs(Sf0001.hashCode.toLong)}")
    tbls.foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val dir = new java.io.File(s"/tmp/graft-warehouse/$tbl")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val df = graft.SparkEntry.queries("q_bucketed_join")(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join/agg must not hash-shuffle:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"scans must consume the bucket layout:\n$plan")
    // layout must not change results: compare to the plain-parquet join
    val plain = Tables.customer(spark, Sf0001)
      .join(Tables.orders(spark, Sf0001),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n_orders"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bucketed = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bucketed == plain && plain.nonEmpty)
  }

  test("salted aggregation equals plain aggregation") {
    val li = Tables.lineitem(spark, Sf0001)
    val plain = li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).toString)).toSet
    val salted = SkewOps.saltedAgg(li, "l_suppkey",
      saltFrom = col("l_orderkey") * 10 + col("l_linenumber"), salts = 8,
      aggs = Seq(
        (count(lit(1)).as("pn"), sum(col("pn")).as("n")),
        (sum(col("l_quantity").cast("decimal(18,2)")).as("pq"),
          sum(col("pq")).as("q"))))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).toString)).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, Sf0001).limit(2000)
    val supp = Tables.supplier(spark, Sf0001)
    val plain = li.join(supp, li("l_suppkey") === supp("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewOps.saltedJoin(li, supp, "l_suppkey", "s_suppkey",
        saltFrom = li("l_orderkey") * 10 + li("l_linenumber"), salts = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(plain.toSeq == salted.toSeq)
  }
}
