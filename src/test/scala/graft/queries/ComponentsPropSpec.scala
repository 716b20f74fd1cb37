package graft.queries

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property coverage for the two connected-components strategies on
  * ScalaCheck-generated random graphs (fixed seed — reproducible): both
  * must agree with an independent driver-side union-find model, and with
  * each other, on every graph — cliques, chains, and the braided shapes
  * the fixed-fixture specs enumerate are all just points in this space.
  * Graphs are small (Spark jobs run per case, label-prop rounds = graph
  * diameter) but the properties are shape-complete.
  */
class ComponentsPropSpec extends SparkSpec {
  import spark.implicits._

  /** A random graph: n nodes (ids offset to catch 0-based assumptions),
    * m edges sampled with replacement (duplicates + both orders allowed —
    * the operators promise duplicate-insensitivity). */
  private case class G(n: Int, edges: List[(Long, Long)])

  private val graphGen: Gen[G] = for {
    n <- Gen.choose(2, 14)
    m <- Gen.choose(1, 24)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1)
      if a != b
    } yield (a.toLong + 5, b.toLong + 5))
    if edges.nonEmpty
  } yield G(n, edges)

  private val graphs =
    Gen.listOfN(10, graphGen).pureApply(Gen.Parameters.default, Seed(11L))

  /** Driver-side union-find: the independent oracle. */
  private def model(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // root of each set is its minimum by construction (union by min)
    nodes.map(x => x -> find(x)).toMap
  }

  test("components == componentsStar == union-find on random graphs") {
    graphs.foreach { g =>
      val pairs = g.edges.toDF("doc_a", "doc_b")
      val expected = model(g.edges)
      val prop = DedupOps.components(pairs, maxIter = 100)
        .as[(Long, Long)].collect().toMap
      val star = DedupOps.componentsStar(pairs)
        .as[(Long, Long)].collect().toMap
      assert(prop == expected, s"label-prop diverged on ${g.edges}")
      assert(star == expected, s"star diverged on ${g.edges}")
    }
  }
}
