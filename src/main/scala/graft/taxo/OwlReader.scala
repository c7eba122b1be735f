package graft.taxo

import javax.xml.parsers.DocumentBuilderFactory
import scala.collection.mutable

/** OWL/RDF-XML taxonomy reader (S3 — /root/reference/src/icon/core/taxonomy.py:741-801):
  * extracts owl:Class labels and rdfs:subClassOf relations between named
  * classes, resolves ids from IRI fragments `#<int>`, maps owl:Thing to node
  * 0 "Root Concept", labels edges `original`, BFS from owl:Thing, and
  * applies transitive reduction before returning. Pure JDK DOM — no rdflib
  * equivalent needed.
  */
object OwlReader {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val RdfsNs = "http://www.w3.org/2000/01/rdf-schema#"
  private val OwlNs = "http://www.w3.org/2002/07/owl#"
  private val OwlThing = OwlNs + "Thing"

  def fromOwl(path: String): MutableTaxo = {
    val factory = DocumentBuilderFactory.newInstance()
    factory.setNamespaceAware(true)
    val doc = factory.newDocumentBuilder().parse(new java.io.File(path))

    val labels = mutable.HashMap.empty[String, String] // class IRI -> label
    val children = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]] // parent -> kids

    // DIRECT children only: getElementsByTagNameNS returns ALL descendants,
    // so a label or subClassOf inside a NESTED owl:Class axiom would be
    // mis-attributed to the outer class (rdflib, the reference's parser,
    // scopes each property to its own subject node)
    def direct(e: org.w3c.dom.Element, ns: String, local: String): Seq[org.w3c.dom.Element] = {
      val out = mutable.ArrayBuffer.empty[org.w3c.dom.Element]
      var c = e.getFirstChild
      while (c != null) {
        c match {
          case el: org.w3c.dom.Element
            if ns == el.getNamespaceURI && el.getLocalName == local => out += el
          case _ =>
        }
        c = c.getNextSibling
      }
      out.toSeq
    }
    def classIri(e: org.w3c.dom.Element): String =
      Option(e.getAttributeNS(RdfNs, "about")).filter(_.nonEmpty)
        .orElse(Option(e.getAttributeNS(RdfNs, "ID")).filter(_.nonEmpty).map("#" + _))
        .getOrElse("")

    val classes = doc.getElementsByTagNameNS(OwlNs, "Class")
    for (i <- 0 until classes.getLength) {
      val cls = classes.item(i).asInstanceOf[org.w3c.dom.Element]
      val iri = classIri(cls)
      if (iri.nonEmpty) {
        for (lbl <- direct(cls, RdfsNs, "label").headOption if !labels.contains(iri))
          labels(iri) = lbl.getTextContent
        for (sub <- direct(cls, RdfsNs, "subClassOf")) {
          // the object is either an rdf:resource attribute or a nested
          // NAMED class node (<owl:Class rdf:about=.../>), which RDF/XML
          // parses to the identical subClassOf triple; genuinely blank
          // nodes (restrictions, anonymous classes) are skipped as before
          val res = sub.getAttributeNS(RdfNs, "resource")
          val parent =
            if (res != null && res.nonEmpty) res
            else direct(sub, OwlNs, "Class").map(classIri).find(_.nonEmpty).getOrElse("")
          if (parent.nonEmpty)
            children.getOrElseUpdate(parent, mutable.ArrayBuffer.empty) += iri
        }
      }
    }

    def fragId(iri: String): Option[Long] =
      "#(\\d+)$".r.findFirstMatchIn(iri).map(_.group(1).toLong)

    val taxo = new MutableTaxo
    taxo.addNode(0L, Some("Root Concept"))
    val queue = mutable.Queue(OwlThing)
    val visited = mutable.HashSet(OwlThing)
    while (queue.nonEmpty) {
      val parentIri = queue.dequeue()
      val parentId = if (parentIri == OwlThing) Some(0L) else fragId(parentIri)
      for (pid <- parentId; childIri <- children.getOrElse(parentIri, Nil)) {
        fragId(childIri).foreach { cid =>
          val lbl = labels.getOrElse(childIri, cid.toString)
          taxo.addNode(cid, Some(lbl))
          taxo.addEdge(cid, pid, "original")
          if (visited.add(childIri)) queue.enqueue(childIri)
        }
      }
    }
    taxo.transitiveReduction()
  }
}
