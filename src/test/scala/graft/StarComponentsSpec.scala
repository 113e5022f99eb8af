package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

/** Alternating large-star/small-star connected components: exactness vs an
  * in-memory union-find on adversarial topologies, agreement with the
  * label-propagation operator, and the property that motivates it —
  * convergence on a LONG CHAIN, where diameter-bound propagation would
  * need one round per hop.
  */
class StarComponentsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Similarity.connectedComponentsStar(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  /** Reference union-find over the same pairs. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // min-id labeling: path compression to the root, root is the min
    // because unions always hang the larger root under the smaller
    nodes.map(n => n -> find(n)).toMap
  }

  test("long chain collapses to one component (diameter >> round count)") {
    // a 400-hop path: label propagation would need 400 rounds; the star
    // alternation's O(log n) bound must finish inside the default 25
    val n = 400L
    val pairs = (0L until n).map(i => (i, i + 1))
    val got = cc(pairs)
    assert(got.size === n + 1)
    assert(got.values.toSet === Set(0L))
  }

  test("matches union-find on a deterministic random multigraph") {
    // fixed-seed graph: hubs, chains, isolated pairs, duplicate and
    // reversed edges all present
    val rnd = new scala.util.Random(42)
    val pairs = Seq.tabulate(600) { _ =>
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong)
    }.filter(p => p._1 != p._2) ++ Seq((1000L, 1001L), (1003L, 1002L))
    val got = cc(pairs)
    val want = unionFind(pairs)
    assert(got === want)
  }

  test("agrees with label-propagation CC on a shallow dense graph") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (20L, 21L),
      (21L, 22L), (22L, 20L))
    val star = cc(pairs)
    val prop = Similarity.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(star === prop)
  }

  test("self-pairs name their node; output space matches label-prop") {
    val pairs = Seq((5L, 5L), (7L, 8L))
    assert(cc(pairs) === Map(5L -> 5L, 7L -> 7L, 8L -> 7L))
  }

  test("one-sided-null pairs keep their non-null endpoint as an isolated node") {
    // least/greatest skip nulls, so (5, null) canonicalizes to u = v = 5
    // — before the fix the node vanished entirely. It must surface as an
    // isolated self-labeled node; null ids are never nodes; a node that
    // ALSO has real edges is labeled by them, not by the null pair.
    val pairs = Seq[(java.lang.Long, java.lang.Long)](
      (5L, null), (null, 9L), (null, null), (7L, 8L), (8L, null))
      .toDF("id_a", "id_b")
    val got = Similarity.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(5L -> 5L, 9L -> 9L, 7L -> 7L, 8L -> 7L))
  }
}
