package graft.taxo

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Taxonomy JSON interchange (reference format, docs/taxonomy-format.md:7-38):
  * `{"nodes":[{id,label,...}], "edges":[{src,tgt,label?,...}]}` where
  * src = child and tgt = parent.
  *
  * Load semantics follow `from_json` (/root/reference/src/icon/core/taxonomy.py:686-739):
  * mandatory id/label on nodes and src/tgt on edges; extra fields round-trip
  * as attributes; root-synthesis — if the top nodes are not exactly [0],
  * node 0 "Root Concept" is (re)created and every top node is attached under
  * it with edge label `auto` (taxonomy.py:730-736).
  */
object TaxoJson {

  private val mapper = new ObjectMapper()

  /** Driver-local load for broadcast-sized taxonomies (<= ~10^6 nodes). */
  def load(path: String, asTree: Boolean = false): MutableTaxo = {
    val rootNode = mapper.readTree(Files.readAllBytes(Paths.get(path)))
    fromJsonNode(rootNode, asTree)
  }

  def loadString(json: String, asTree: Boolean = false): MutableTaxo =
    fromJsonNode(mapper.readTree(json), asTree)

  private def fromJsonNode(obj: JsonNode, asTree: Boolean): MutableTaxo = {
    val taxo = new MutableTaxo
    val nodesArr = obj.get("nodes")
    require(nodesArr != null, "Missing nodes array")
    for (n <- nodesArr.elements().asScala) {
      require(n.has("id"), "Missing node id")
      val id = n.get("id").asLong()
      require(n.has("label"), s"Missing node label for node $id")
      val label = n.get("label").asText()
      val attrs = n.properties().asScala.iterator
        .filter { e => e.getKey != "id" && e.getKey != "label" }
        .map { e => e.getKey -> e.getValue.toString }.toSeq
      taxo.addNode(id, Some(label), attrs)
    }
    val edgesArr = obj.get("edges")
    require(edgesArr != null, "Missing edges array")
    for (e <- edgesArr.elements().asScala) {
      require(e.has("src"), "Missing edge source")
      require(e.has("tgt"), "Missing edge target")
      val label = if (e.has("label")) e.get("label").asText() else null
      taxo.addEdge(e.get("src").asLong(), e.get("tgt").asLong(), label)
    }
    synthesizeRoot(taxo)
    if (asTree) TreeTaxo.fromTaxo(taxo) else taxo
  }

  /** taxonomy.py:730-736, applied bit-exact (SURVEY.md S1). */
  def synthesizeRoot(taxo: MutableTaxo): Unit = {
    val topNodes = taxo.getGCD(Nil)
    if (topNodes != Seq(0L)) {
      if (taxo.containsNode(0L)) taxo.removeNode(0L)
      taxo.addNode(0L, Some("Root Concept"))
      for (t <- topNodes if t != 0L) taxo.addEdge(t, 0L, "auto")
    }
  }

  /** taxonomy.py:643-684. Driver-local writer (golden fixtures). */
  def write(taxo: MutableTaxo, path: String): Unit =
    Files.writeString(Paths.get(path), toJsonString(taxo))

  def toJsonString(taxo: MutableTaxo): String = {
    val root: ObjectNode = mapper.createObjectNode()
    val nodes: ArrayNode = root.putArray("nodes")
    for (n <- taxo.nodes) {
      val o = nodes.addObject()
      o.put("id", n)
      taxo.nodeLabel(n).foreach(o.put("label", _))
      for ((k, v) <- taxo.nodeAttrs.getOrElse(n, Nil)) o.set(k, mapper.readTree(v)): Unit
    }
    val edges: ArrayNode = root.putArray("edges")
    for ((u, v, l) <- taxo.edges) {
      val o = edges.addObject()
      o.put("src", u); o.put("tgt", v)
      if (l != null) o.put("label", l): Unit
    }
    mapper.writeValueAsString(root)
  }

  /** Distributed load: two DataFrames (nodes(id,label), edges(src,dst,label))
    * for graphs too large to hold on the driver. Root synthesis is expressed
    * relationally: top nodes = anti-join of nodes vs edge children. */
  def loadDF(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val raw = spark.read.option("multiLine", true).json(path)
    // schema inference drops `label` entirely when NO element carries it —
    // col("e.label") would then fail analysis, so probe the struct first
    def fieldNames(arrCol: String): Set[String] = raw.schema(arrCol).dataType match {
      case ArrayType(s: StructType, _) => s.fieldNames.toSet
      case _ => Set.empty
    }
    val nLabel = if (fieldNames("nodes").contains("label")) col("n.label")
                 else lit(null).cast("string")
    val eLabel = if (fieldNames("edges").contains("label")) col("e.label")
                 else lit(null).cast("string")
    val nodes = raw.select(explode(col("nodes")).as("n"))
      .select(col("n.id").cast("long").as("id"), nLabel.as("label"))
    val edges = raw.select(explode(col("edges")).as("e"))
      .select(col("e.src").cast("long").as("src"), col("e.tgt").cast("long").as("dst"),
        eLabel.cast("string").as("label"))
    val tops = nodes.join(edges.select(col("src")), nodes("id") === edges("src"), "left_anti")
    val needsRoot = tops.count() != 1 || tops.agg(min("id")).head.getLong(0) != 0L
    if (!needsRoot) (nodes, edges)
    else {
      import spark.implicits._
      val rootRow = Seq((0L, "Root Concept")).toDF("id", "label")
      val nodes2 = nodes.filter(col("id") =!= 0L).union(rootRow)
      val autoEdges = tops.filter(col("id") =!= 0L)
        .select(col("id").as("src"), lit(0L).as("dst"), lit("auto").as("label"))
      // the driver twin's removeNode(0) CASCADES: every edge incident to
      // the displaced node 0 goes with it (an input edge 0->x kept here
      // would turn into a cycle root->x->root once x gets its auto edge;
      // an input x->0 would silently re-parent x onto the synthesized
      // root where the driver leaves x parentless). tops is computed
      // BEFORE the drop, exactly like the driver's getGCD-then-remove.
      val cleaned = edges.filter(col("src") =!= 0L && col("dst") =!= 0L)
      (nodes2, cleaned.union(autoEdges))
    }
  }

  /** Convert a driver-local taxonomy to (nodes, edges) DataFrames. */
  def toDF(spark: SparkSession, taxo: MutableTaxo): (DataFrame, DataFrame) = {
    import spark.implicits._
    val nodes = taxo.nodes.map(n => (n, taxo.getLabel(n))).toDF("id", "label")
    val edges = taxo.edges.toDF("src", "dst", "label")
    (nodes, edges)
  }
}
