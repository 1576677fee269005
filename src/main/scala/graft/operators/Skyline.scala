package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** Skyline (Pareto frontier) operator (SURVEY.md §2.13 build addendum;
  * reference checkout is empty, SURVEY.md §0.1 — the algorithm is the
  * published distributed two-phase skyline: per-partition local skyline,
  * then skyline-of-candidates, per Börzsönyi et al. "The Skyline
  * Operator" / the MR-skyline family).
  *
  * Dominance (minimize price, maximize size): q dominates p iff
  * q.price ≤ p.price ∧ q.size ≥ p.size ∧ (q.price < p.price ∨ q.size > p.size).
  * Incomparable duplicates (equal in both dims) do NOT dominate each
  * other — both survive, matching the NOT EXISTS oracle exactly.
  *
  * Why not the naive NOT EXISTS anti-join: that is an O(n²) theta
  * self-join — unusable at 100 TB. The 2-D skyline is computable in one
  * LINEAR pass over a price-sorted order: a point survives iff its size
  * beats the max size of everything strictly cheaper (and the max of its
  * own price group). Distribution: `sortWithinPartitions` (spill-safe) +
  * an O(1)-state partition-local sweep gives each partition's skyline —
  * a superset of the global one, typically O(log n) points per partition
  * — then the tiny candidate union is swept once more on one partition.
  * No shuffle of the big table at all; dominated rows die in place.
  */
object Skyline {

  /** Streaming sweep over rows pre-sorted by (price asc, size desc,
    * key asc): emits the rows not dominated within this iterator.
    * State: the running max size over strictly-cheaper groups + the
    * current price group's max (its first row, given the sort).
    */
  private def sweep(it: Iterator[(Long, Int, Double)]): Iterator[(Long, Int, Double)] = {
    var bestCheaper = Int.MinValue // max size over price groups strictly before this one
    var curPrice = Double.NaN
    var groupMax = Int.MinValue    // max size within the current price group
    it.flatMap { case row @ (_, size, price) =>
      if (price != curPrice) {           // entering a new price group
        bestCheaper = math.max(bestCheaper, groupMax)
        curPrice = price
        groupMax = size                  // sorted size-desc ⇒ first row is the group max
      }
      // survives iff nothing strictly cheaper has size ≥ it, and nothing
      // at the same price has size > it
      if (size > bestCheaper && size == groupMax) Iterator.single(row)
      else Iterator.empty
    }
  }

  private def sweepPhase(ds: Dataset[(Long, Int, Double)]): Dataset[(Long, Int, Double)] = {
    import ds.sparkSession.implicits._
    ds.toDF("k", "s", "p").as[(Long, Int, Double)]
      .sortWithinPartitions(asc("p"), desc("s"), asc("k"))
      .mapPartitions(sweep)
  }

  /** Skyline of (key, gainDim, costDim) rows: local sweep per partition,
    * then one sweep over the candidate union. Column names follow the
    * part-table use; semantics are generic min-cost/max-gain.
    */
  def skyline(points: DataFrame): DataFrame = {
    import points.sparkSession.implicits._
    val ds = points.select(
      col("p_partkey").cast("long").as("p_partkey"),
      col("p_size").cast("int").as("p_size"),
      col("p_retailprice").cast("double").as("p_retailprice")).as[(Long, Int, Double)]
    val local = sweepPhase(ds)                    // big data: dies in place
    val global = sweepPhase(local.repartition(1)) // tiny candidate set
    global.toDF("p_partkey", "p_size", "p_retailprice")
  }

  /** Q105 — skyline of the part table: parts where no other part is at
    * most as expensive AND at least as large with one strict inequality
    * ("best value per size").
    */
  def q105(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    skyline(c.part)
      .select(col("p_partkey"), col("p_size"),
        round(col("p_retailprice"), 4).as("p_price"))
      .orderBy(asc_nulls_first("p_partkey"))
  }

  val q105Oracle: String =
    """SELECT p_partkey, p_size, ROUND(p_retailprice, 4) AS p_price
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice
      |    AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p_partkey NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q105" -> (q105 _))

  def oracles: Map[String, String] = Map(
    "Q105" -> q105Oracle)
}
