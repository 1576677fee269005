package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Q286–Q288 model pins: the fixtures are clean by construction, so the
  * audits' clean verdicts alone would prove nothing about the counting.
  * These tests PERTURB a copy of sf0.001 — an orphan lineitem row, a
  * duplicated customer key, out-of-domain values — and assert each
  * violation surfaces in exactly the right audit row with exact counts.
  */
class QualitySpec extends SparkSpec {

  /** Copy every sf0.001 table into a temp dir, applying per-table edits. */
  private def stagePerturbed(): String = {
    val dir = Files.createTempDirectory("graft-quality").toString
    val src = sf("sf0.001")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = t match {
        case "lineitem" =>
          // one orphan row (no such order/part/supplier) that also
          // violates the quantity and discount rules; PK stays unique
          val bad = df.limit(1)
            .withColumn("l_orderkey", lit(-999L))
            .withColumn("l_partkey", lit(-999L))
            .withColumn("l_suppkey", lit(-999L))
            .withColumn("l_linenumber", lit(1))
            .withColumn("l_quantity", lit(0.0))
            .withColumn("l_discount", lit(0.9))
          df.unionByName(bad)
        case "customer" =>
          // duplicate one key
          df.unionByName(df.limit(1))
        case "documents" =>
          // break the n_chars = length(text) consistency on one row
          val w = org.apache.spark.sql.expressions.Window
            .orderBy(col("doc_id"))
          df.withColumn("rn", row_number().over(w))
            .withColumn("n_chars",
              when(col("rn") === 1, col("n_chars") + 5L)
                .otherwise(col("n_chars")))
            .drop("rn")
        case _ => df
      }
      out.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val dir = stagePerturbed()

  test("Q286 RI audit: the injected orphan surfaces on exactly its three edges") {
    val rows = Quality.q286(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    Seq("lineitem.l_orderkey->orders", "lineitem.l_partkey->part",
      "lineitem.l_suppkey->supplier").foreach { e =>
      assert(rows(e).getAs[Long]("orphan_rows") == 1, s"$e orphan_rows")
      assert(rows(e).getAs[Long]("orphan_keys") == 1, s"$e orphan_keys")
      assert(rows(e).getAs[String]("verdict") == "orphaned", s"$e verdict")
    }
    Seq("customer.c_nationkey->nation", "events.user_id->customer",
      "nation.n_regionkey->region", "orders.o_custkey->customer",
      "supplier.s_nationkey->nation").foreach { e =>
      assert(rows(e).getAs[Long]("orphan_rows") == 0, s"$e should be clean")
      assert(rows(e).getAs[String]("verdict") == "clean")
    }
    // and on the pristine fixtures everything is clean
    val clean = Quality.q286(spark, sf("sf0.001")).collect()
    assert(clean.forall(_.getAs[String]("verdict") == "clean"))
    assert(clean.length == 8)
  }

  test("Q287 uniqueness audit: the duplicated customer key is counted once at multiplicity 2") {
    val rows = Quality.q287(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val cust = rows("customer(c_custkey)")
    assert(cust.getAs[Long]("n_dup_keys") == 1)
    assert(cust.getAs[Long]("max_multiplicity") == 2)
    assert(cust.getAs[Long]("n_rows") == cust.getAs[Long]("n_keys") + 1)
    assert(cust.getAs[String]("verdict") == "duplicated")
    // the synthetic lineitem GENUINELY duplicates its composite key (the
    // generator draws linenumbers randomly) — the audit must report that
    // true fact with exact counts, recomputed here independently
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_orderkey"), col("l_linenumber")).count()
    val expDup = li.filter(col("count") > 1).count()
    val expMax = li.agg(max(col("count"))).head().getLong(0)
    val lrow = rows("lineitem(l_orderkey,l_linenumber)")
    assert(lrow.getAs[Long]("n_dup_keys") == expDup)
    assert(lrow.getAs[Long]("max_multiplicity") == expMax)
    assert(lrow.getAs[String]("verdict") == "duplicated")
    (rows - "customer(c_custkey)" - "lineitem(l_orderkey,l_linenumber)")
      .values.foreach { r =>
        assert(r.getAs[String]("verdict") == "unique",
          s"${r.getString(0)} should be unique")
      }
  }

  test("Q288 conformance audit: each injected domain violation lands in its own rule row") {
    val rows = Quality.q288(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("lineitem: l_quantity >= 1").getAs[Long]("n_violations") == 1)
    assert(rows("lineitem: 0 <= l_discount <= 0.5")
      .getAs[Long]("n_violations") == 1)
    assert(rows("documents: n_chars = length(text)")
      .getAs[Long]("n_violations") == 1)
    assert(rows("lineitem: l_quantity >= 1").getAs[String]("verdict")
      == "violations")
    Seq("lineitem: l_tax >= 0", "lineitem: l_extendedprice > 0",
      "orders: o_orderstatus in (O,F,P)",
      "orders: o_orderpriority like [1-5]-*", "part: 1 <= p_size <= 50",
      "embeddings: 0 <= label <= 9", "events: value > 0").foreach { rule =>
      assert(rows(rule).getAs[Long]("n_violations") == 0, s"$rule")
      assert(rows(rule).getAs[String]("verdict") == "conforming")
    }
    assert(rows.size == 10)
  }
}
