package graft

import scala.util.Random


import graft.operators.{Dedup, Graph}

/** Randomized cross-checks of the iterative graph operators against
  * independent in-memory reference implementations (union-find,
  * synchronous peel, brute-force triple scan, a scalar fixed-point
  * fold). The closed-form specs pin known graphs; these catch the
  * structural bug classes hand-picked fixtures miss — convergence
  * edge cases on awkward random topologies, orientation mistakes
  * that only fire on specific degree ties, dangling-mass slips on
  * digraphs where sinks arise by chance. Seeded, so failures replay. */
class RandomGraphSpec extends SparkSpecBase {
  import spark.implicits._

  /** Random undirected edge set, canonical (u < v), no self-loops. */
  private def randomUndirected(rnd: Random, n: Int, m: Int): Seq[(Long, Long)] =
    Iterator.continually {
      val a = rnd.nextInt(n); val b = rnd.nextInt(n)
      (math.min(a, b).toLong, math.max(a, b).toLong)
    }.filter(p => p._1 != p._2).take(m).toSeq.distinct

  test("components match union-find min-labels on random graphs") {
    val rnd = new Random(4242)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 5
      val edges = randomUndirected(rnd, n, n + trial * 3)
      // reference: union-find, component label = min member id
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val got = Dedup.components(edges.toDF("d1", "d2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: $edges")
    }
  }

  test("kcore matches a synchronous sequential peel on random graphs") {
    val rnd = new Random(7777)
    for (trial <- 1 to 3) {
      val n = 18 + trial * 4
      val k = 3
      val edges = randomUndirected(rnd, n, 2 * n)
      // reference: remove ALL below-k nodes simultaneously per round
      var live = edges
      var stable = false
      while (!stable && live.nonEmpty) {
        val deg = live.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val bad = deg.filter(_._2 < k).keySet
        if (bad.isEmpty) stable = true
        else live = live.filter(e => !bad(e._1) && !bad(e._2))
      }
      val expected = live.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = Graph.kcoreOf(edges.toDF("a", "b"), k, maxRounds = 30)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial k=$k: $edges")
    }
  }

  test("ktruss matches a synchronous sequential support peel on random graphs") {
    val rnd = new Random(9191)
    def support(live: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
      val es = live.toSet
      live.map { case (u, v) =>
        val sup = live.flatMap(e => Seq(e._1, e._2)).distinct.count(w =>
          w != u && w != v &&
            es((math.min(u, w), math.max(u, w))) &&
            es((math.min(v, w), math.max(v, w))))
        (u, v) -> sup.toLong
      }.toMap
    }
    for (trial <- 1 to 3) {
      val n = 14 + trial * 3
      val k = 3 + (trial % 2) // alternate k=4/k=3
      val edges = randomUndirected(rnd, n, 3 * n)
      // reference: remove ALL below-support edges simultaneously
      var live = edges
      var stable = false
      while (!stable && live.nonEmpty) {
        val sup = support(live)
        val bad = live.filter(e => sup(e) < k - 2)
        if (bad.isEmpty) stable = true
        else { val bs = bad.toSet; live = live.filterNot(bs) }
      }
      val expected = support(live)
      val got = Graph.ktrussOf(edges.toDF("u", "v"), k, maxRounds = 30)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expected, s"trial $trial k=$k: $edges")
    }
  }

  test("backbone keeps exactly the mutual top-m edges on random weighted graphs") {
    val rnd = new Random(5656)
    for (trial <- 1 to 3) {
      val n = 16 + trial * 4
      val m = 2 + trial % 3
      val edges = randomUndirected(rnd, n, 3 * n)
        .map { case (u, v) => (u, v, 1L + rnd.nextInt(50).toLong) }
      // reference: per-node (w desc, id asc) top-m keep lists,
      // mutual intersection
      val sym = edges.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
      val kept = sym.groupBy(_._1).view.mapValues(
        _.sortBy(e => (-e._3, e._2)).take(m).map(_._2).toSet).toMap
      val expected = edges.collect {
        case (u, v, w) if kept(u)(v) && kept(v)(u) => (u, v, w)
      }.toSet
      val got = Graph.backboneOf(edges.toDF("u", "v", "w"), m)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"trial $trial m=$m")
    }
  }

  test("triangle census matches the brute-force triple scan on random graphs") {
    val rnd = new Random(99123)
    for (trial <- 1 to 3) {
      val n = 16 + trial * 4
      val edges = randomUndirected(rnd, n, (2.5 * n).toInt)
      val es = edges.toSet
      def conn(a: Long, b: Long) = es((math.min(a, b), math.max(a, b)))
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val counts = scala.collection.mutable.Map[Long, Long]()
      for {
        i <- nodes.indices; j <- (i + 1) until nodes.size
        l <- (j + 1) until nodes.size
        (a, b, c) = (nodes(i), nodes(j), nodes(l))
        if conn(a, b) && conn(b, c) && conn(a, c)
      } Seq(a, b, c).foreach(x => counts(x) = counts.getOrElse(x, 0L) + 1L)
      val got = Graph.trianglesOf(edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == counts.toMap, s"trial $trial: $edges")
    }
  }

  test("generic pagerank matches a scalar integer fold on random digraphs") {
    val rnd = new Random(31337)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 3
      // directed, possibly with chance sinks/sources — the dangling path
      val edges = Iterator.continually {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(p => p._1 != p._2).take(2 * n).toSeq.distinct
      val iters = 5
      // reference: the exact integer recurrence of Graph.roundDangling,
      // folded with plain Long arithmetic
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val sinks = nodes.filterNot(outdeg.contains).toSet
      val nn = nodes.size.toLong
      val base = (Graph.Scale * 15 / 100) / nn
      var pr = nodes.map(_ -> Graph.Scale / nn).toMap
      for (_ <- 1 to iters) {
        val contribs = scala.collection.mutable.Map[Long, Long]()
        edges.foreach { case (s, d) =>
          contribs(d) = contribs.getOrElse(d, 0L) + pr(s) / outdeg(s)
        }
        val dang = sinks.iterator.map(pr).sum
        pr = nodes.map { x =>
          val c = contribs.getOrElse(x, 0L) +
            (if (sinks.nonEmpty) dang / nn else 0L)
          x -> (base + Graph.Damping * c / 100)
        }.toMap
      }
      val got = Graph.pagerankOf(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == pr, s"trial $trial sinks=${sinks.size}: $edges")
    }
  }
}
