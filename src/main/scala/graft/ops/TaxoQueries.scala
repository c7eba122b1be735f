package graft.ops

import graft.spark.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable distributed taxonomy queries.
  *
  * The driver's correctness gate runs DuckDB SQL over the same parquet
  * tables, so these queries derive a deterministic concept taxonomy from the
  * region → nation → customer star schema (root 0; region = 1+r_regionkey;
  * nation = 100+n_nationkey; customer = 1000+c_custkey; plus deterministic
  * redundant customer→region skip edges for every 10th customer so that
  * transitive reduction has work to do). The DataFrame side exercises the
  * distributed GraphOps fixpoints; the oracle side is a recursive CTE.
  */
object TaxoQueries {

  def edges(spark: SparkSession, dir: String): DataFrame = {
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val region = spark.read.parquet(s"$dir/region.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val e1 = region.select((col("r_regionkey").cast("long") + 1).as("src"), lit(0L).as("dst"))
    val e2 = nation.select((col("n_nationkey").cast("long") + 100).as("src"),
      (col("n_regionkey").cast("long") + 1).as("dst"))
    val e3 = customer.select((col("c_custkey").cast("long") + 1000).as("src"),
      (col("c_nationkey").cast("long") + 100).as("dst"))
    // redundant skip edges: customer -> region for custkey % 10 == 0
    val skip = customer.filter(col("c_custkey") % 10 === 0)
      .join(nation, customer("c_nationkey") === nation("n_nationkey"))
      .select((col("c_custkey").cast("long") + 1000).as("src"),
        (col("n_regionkey").cast("long") + 1).as("dst"))
    e1.union(e2).union(e3).union(skip)
  }

  def nodes(spark: SparkSession, dir: String): DataFrame =
    nodesOf(edges(spark, dir))

  private def nodesOf(e: DataFrame): DataFrame =
    e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()

  /** Full (node, ancestor) closure — distributed G5. */
  def ancestors(spark: SparkSession, dir: String): DataFrame =
    GraphOps.ancestorClosure(edges(spark, dir)).orderBy("node", "anc")

  /** Leaves (no children) — G10 empty-input semantics. The node set here
    * is exactly distinct(src ∪ dst), so the edge-node driver fast path
    * applies (one raw collect under the cap; distributed anti-join with a
    * single edge materialization beyond it). */
  def leafNodes(spark: SparkSession, dir: String): DataFrame =
    GraphOps.leavesOfEdgeNodes(edges(spark, dir)).orderBy("id")

  /** Node depths (min distance from the root set) — G13. Same edge-node
    * specialization as [[leafNodes]]. */
  def nodeDepths(spark: SparkSession, dir: String): DataFrame =
    GraphOps.depthsOfEdgeNodes(edges(spark, dir))
      .select(col("id"), col("depth").cast("long").as("depth")).orderBy("id")

  /** Edges surviving transitive reduction — G18 (drops the skip edges). */
  def transitiveReductionEdges(spark: SparkSession, dir: String): DataFrame =
    GraphOps.transitiveReduction(edges(spark, dir)).orderBy("src", "dst")

  /** The DuckDB oracle SQL snippets (same node-id arithmetic). */
  val edgesCte: String =
    """WITH RECURSIVE edges AS (
      |  SELECT CAST(r_regionkey + 1 AS BIGINT) AS src, CAST(0 AS BIGINT) AS dst FROM region
      |  UNION ALL
      |  SELECT CAST(n_nationkey + 100 AS BIGINT), CAST(n_regionkey + 1 AS BIGINT) FROM nation
      |  UNION ALL
      |  SELECT CAST(c_custkey + 1000 AS BIGINT), CAST(c_nationkey + 100 AS BIGINT) FROM customer
      |  UNION ALL
      |  SELECT CAST(c_custkey + 1000 AS BIGINT), CAST(n_regionkey + 1 AS BIGINT)
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  WHERE c_custkey % 10 = 0
      |)""".stripMargin

  val ancestorsSql: String =
    s"""$edgesCte,
       |closure(node, anc) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT c.node, e.dst FROM closure c JOIN edges e ON c.anc = e.src
       |)
       |SELECT node, anc FROM closure ORDER BY node, anc""".stripMargin

  // NOTE: under WITH RECURSIVE, DuckDB treats a CTE whose top level is
  // `a UNION b` as a recursive seed/step pair even without self-reference,
  // which re-introduces duplicates — dedupe inside a subquery instead.
  val leavesSql: String =
    s"""$edgesCte,
       |nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges))
       |SELECT id FROM nodes WHERE id NOT IN (SELECT dst FROM edges) ORDER BY id""".stripMargin

  val depthsSql: String =
    s"""$edgesCte,
       |nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
       |paths(id, depth) AS (
       |  SELECT id, 0 FROM nodes WHERE id NOT IN (SELECT src FROM edges)
       |  UNION
       |  SELECT e.src, p.depth + 1 FROM paths p JOIN edges e ON e.dst = p.id
       |)
       |SELECT id, CAST(MIN(depth) AS BIGINT) AS depth FROM paths GROUP BY id ORDER BY id""".stripMargin

  val trSql: String =
    s"""$edgesCte,
       |closure(node, anc) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT c.node, e.dst FROM closure c JOIN edges e ON c.anc = e.src
       |)
       |SELECT e.src, e.dst FROM edges e
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM edges p JOIN closure c ON c.node = p.dst AND c.anc = e.dst
       |  WHERE p.src = e.src AND p.dst <> e.dst
       |)
       |ORDER BY e.src, e.dst""".stripMargin
}
