package graft.io

import com.fasterxml.jackson.databind.ObjectMapper
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

/** Parse JSON into plain Scala values (ListMap/List/String/Number/Boolean),
  * preserving object key order — the reference's recursive `sections` dict
  * (SURVEY.md §1.1) iterates in insertion order, and chunk indexes depend on
  * it. Jackson ships with Spark; no extra dependency. */
object JsonTree {
  private val mapper = new ObjectMapper()

  def parse(s: String): Any = convert(mapper.readValue(s, classOf[Object]))

  def parseList(s: String): List[Any] = parse(s) match {
    case l: List[_] => l
    case m => List(m)
  }

  private def convert(o: Any): Any = o match {
    case m: java.util.Map[_, _] =>
      ListMap(m.asScala.toSeq.map { case (k, v) => (k.toString, convert(v)) }: _*)
    case l: java.util.List[_] => l.asScala.toList.map(convert)
    case other => other
  }
}
