package graft.kg

import scala.collection.mutable

/** Raised when no dependency path exists between the entity pair, or the
  * spans overlap (reference: data/dependency.py:6-7, data/featurizers.py:175-177). */
final class NoPathException(msg: String) extends Exception(msg)

/**
 * Per-sentence dependency digraph + undirected shortest path between entity
 * head tokens (reference: data/dependency.py:10-85).
 *
 * Deliberately NOT GraphX: each graph has ≤ ~100 nodes and lives entirely
 * inside one row of a `map` — a distributed graph framework here would add
 * two shuffles to replace a 30-line BFS.
 *
 * Fidelity notes vs the reference:
 *  - node/edge creation order follows parse-row order; each edge is appended
 *    to both endpoints' incidence lists (pattern.graph semantics).
 *  - `root` is the child of the arc=="root" row; that row ALSO contributes a
 *    real edge when parent != child (data/dependency.py:21-33).
 *  - shortest path is computed undirected; the reference uses
 *    pattern.graph's unit-weight dijkstra — BFS in incidence order gives the
 *    same lengths and the same tie-breaks on the pinned fixtures.
 */
final class DependencyParse(parse: Seq[DepEdge], enhanced: Boolean = true) extends Serializable {
  // incidence list per node id, in edge-insertion order; edges as (node1=parent, node2=child, arc)
  private val incidence = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[(Int, Int, String)]]
  private var rootId: Int = Int.MinValue

  parse.foreach { case DepEdge(child, parent, arc0) =>
    if (arc0 == "root") rootId = child
    val arc = if (enhanced) arc0 else arc0.split(':')(0)
    incidence.getOrElseUpdate(child, mutable.ArrayBuffer.empty)
    incidence.getOrElseUpdate(parent, mutable.ArrayBuffer.empty)
    if (parent != child) {
      val e = (parent, child, arc)
      incidence(parent) += e
      incidence(child) += e
    }
  }

  private def parentOf(node: Int): Option[Int] =
    incidence.get(node).flatMap(_.collectFirst { case (p, c, _) if c == node => p })

  /** Walk parent links while they stay inside [start, end)
    * (reference: data/dependency.py:42-52). */
  def getHead(entTail: Int, entStart: Int, entEnd: Int): Int = {
    val seen = mutable.Set.empty[Int]
    var tail = entTail
    var done = false
    while (!done) {
      parentOf(tail) match {
        case Some(p) if seen.contains(p) => throw new IllegalStateException("found cycle!")
        case Some(p) if p < entEnd && p >= entStart => seen += p; tail = p
        case _ => done = true
      }
    }
    tail
  }

  /** First incident edge of `node1` touching `node2`, direction-suffixed
    * (reference: data/dependency.py:54-62). */
  private def edgeBetween(node1: Int, node2: Int): String = {
    incidence(node1).collectFirst {
      case (p, _, arc) if p == node2 => arc + "_from"
      case (_, c, arc) if c == node2 => arc + "_to"
    }.getOrElse(throw new NoPathException(s"no edge between $node1 and $node2"))
  }

  /** Undirected BFS shortest path node sequence, neighbor order = incidence order. */
  private def bfsPath(src: Int, dst: Int): Option[List[Int]] = {
    if (src == dst) return Some(List(src))
    val prev = mutable.HashMap.empty[Int, Int]
    val queue = mutable.Queue(src)
    prev(src) = src
    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      incidence.getOrElse(cur, mutable.ArrayBuffer.empty).foreach { case (p, c, _) =>
        val nxt = if (p == cur) c else p
        if (!prev.contains(nxt)) {
          prev(nxt) = cur
          if (nxt == dst) {
            var path = List(dst)
            while (path.head != src) path = prev(path.head) :: path
            return Some(path)
          }
          queue.enqueue(nxt)
        }
      }
    }
    None
  }

  /** Edge list along the shortest path with `_from`/`_to` suffixes and a
    * root-marker edge (reference: data/dependency.py:64-76). */
  def getPath(node1: Int, node2: Int): List[PathEdge] = {
    val path = bfsPath(node1, node2)
      .getOrElse(throw new NoPathException("cannot find path between entities!"))
    val edges = mutable.ListBuffer.empty[PathEdge]
    var curr = node1
    path.tail.foreach { node =>
      if (curr == rootId) edges += PathEdge(curr, -1, "root")
      edges += PathEdge(curr, node, edgeBetween(curr, node))
      curr = node
    }
    edges.toList
  }

  /** Path from object head to subject head — note the reference's direction
    * (reference: data/dependency.py:78-85 passes object first). */
  def getPathFromParse(subjectStart: Int, subjectEnd: Int, objectStart: Int, objectEnd: Int): List[PathEdge] = {
    val subjectHead = getHead(subjectEnd - 1, subjectStart, subjectEnd)
    val objectHead = getHead(objectEnd - 1, objectStart, objectEnd)
    getPath(objectHead, subjectHead)
  }
}
