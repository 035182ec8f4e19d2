package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based algebraic laws over generated tables (SURVEY.md §5.2):
  * the operator library must satisfy relational identities regardless of
  * data. ScalaCheck generators with fixed seeds (deterministic in CI);
  * the scalatest-scalacheck bridge isn't among the pinned deps, so
  * sampling is explicit. */
class PropertySpec extends GraftSuite {
  import spark.implicits._

  private val rowsGen = Gen.listOfN(40,
    Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(-100, 100),
      Gen.oneOf("x", "y", "z")))

  private def samples(n: Int): Seq[List[(Long, Int, String)]] =
    (1 to n).map { i =>
      rowsGen.apply(Gen.Parameters.default, rng.Seed(42L + i))
        .getOrElse(List.empty)
    }

  test("filter pushdown through join preserves results") {
    for (Seq(l, r) <- samples(6).grouped(2)) {
      val left = l.toDF("k", "v", "tag")
      val right = r.toDF("k", "w", "tag2").drop("tag2")
      val pushed = left.filter($"v" > 0).join(right, "k")
      val late = left.join(right, "k").filter($"v" > 0)
      assert(pushed.exceptAll(late).count() === 0)
      assert(late.exceptAll(pushed).count() === 0)
    }
  }

  test("union-all cardinality is additive; union-distinct bounded") {
    for (Seq(a, b) <- samples(6).grouped(2)) {
      val da = a.toDF("k", "v", "tag")
      val db = b.toDF("k", "v", "tag")
      assert(da.union(db).count() === da.count() + db.count())
      val d = da.union(db).distinct().count()
      assert(d <= da.distinct().count() + db.distinct().count())
      assert(d >= math.max(da.distinct().count(), db.distinct().count()))
    }
  }

  test("sort is a permutation: same multiset before and after") {
    for (a <- samples(4)) {
      val df = a.toDF("k", "v", "tag")
      val sorted = df.orderBy($"k".desc, $"v".asc)
      assert(sorted.exceptAll(df).count() === 0)
      assert(df.exceptAll(sorted).count() === 0)
    }
  }

  test("groupBy sum equals local fold") {
    for (a <- samples(4)) {
      val df = a.toDF("k", "v", "tag")
      val viaSpark = df.groupBy("k").agg(sum($"v").as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = a.groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2.toLong).sum }
      assert(viaSpark === local)
    }
  }

  test("semi and anti join partition the left relation") {
    for (Seq(l, r) <- samples(6).grouped(2)) {
      val left = l.toDF("k", "v", "tag")
      val right = r.toDF("k", "w", "tag2")
      val semi = left.join(right, Seq("k"), "left_semi")
      val anti = left.join(right, Seq("k"), "left_anti")
      assert(semi.count() + anti.count() === left.count())
      assert(semi.intersect(anti).count() === 0)
    }
  }

  test("bin-bucketed range join equals the theta join for any bin size") {
    // bin-edge fuzz: points/intervals land on and around bin boundaries
    // for wildly different bin sizes — every (binSize, data) draw must
    // reproduce the naive BETWEEN join exactly.
    val pointGen = Gen.listOfN(120, Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(0L, 1000L)))
    val ivGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(100L, 140L), Gen.chooseNum(0L, 1000L), Gen.chooseNum(0L, 150L)))
    for ((seed, binSize) <- Seq((1L, 1L), (2L, 7L), (3L, 64L), (4L, 1000L), (5L, 3L))) {
      val pts = pointGen(Gen.Parameters.default, rng.Seed(seed)).get
        .toDF("pid", "p")
      val ivs = ivGen(Gen.Parameters.default, rng.Seed(seed + 100)).get
        .map { case (id, s, len) => (id, s, s + len) }
        .toDF("iid", "s", "e")
      val binned = graft.ops.Joins.rangeJoin(pts, ivs,
        $"p", $"s", $"e", binSize)
      val naive = pts.join(ivs, $"p".between($"s", $"e"))
      assert(binned.exceptAll(naive).count() === 0, s"binSize=$binSize extra rows")
      assert(naive.exceptAll(binned).count() === 0, s"binSize=$binSize missing rows")
    }
  }

  test("misra-gries bound holds on random skewed streams") {
    val k = 4
    val tokenGen = Gen.listOfN(800, Gen.frequency(
      8 -> Gen.const("heavy_a"), 5 -> Gen.const("heavy_b"),
      3 -> Gen.oneOf("mid_a", "mid_b", "mid_c"),
      4 -> Gen.chooseNum(0, 200).map(i => s"tail_$i")))
    for (seed <- 1L to 4L) {
      val toks = tokenGen(Gen.Parameters.default, rng.Seed(seed)).get
      val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      val n = toks.length.toLong
      val bound = n / (k + 1)
      val sketch = toks.toDF("tok")
        .agg(graft.ops.Aggregates.heavyHitters($"tok", k))
        .collect().head.getMap[String, Long](0).toMap
      assert(sketch.size <= k)
      exact.filter(_._2 > bound).keySet.foreach { t =>
        assert(sketch.contains(t), s"seed=$seed lost heavy hitter $t")
      }
      sketch.foreach { case (t, est) =>
        assert(est <= exact(t) && est >= exact(t) - bound,
          s"seed=$seed $t est=$est true=${exact(t)} bound=$bound")
      }
    }
  }

  test("word n-grams match a local reference fold on random texts") {
    val wordGen = Gen.oneOf("a", "bb", "ccc", "a", "dd")
    val textGen = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, wordGen))
    val texts = (1L to 8L).map { seed =>
      textGen(Gen.Parameters.default, rng.Seed(seed)).get.mkString(" ")
    } :+ "single" :+ "two words"
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(2, 3, 5)) {
      val got = df.select($"doc_id",
          graft.ops.TextAnalysis.wordNgrams(split($"text", " "), n).as("g"),
          graft.ops.TextAnalysis.dupNgramFrac(split($"text", " "), n).as("f"))
        .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getDouble(2)))
        .toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.split(" ", -1)
        val expected = toks.sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSeq
        val (grams, frac) = got(i.toLong)
        assert(grams === expected, s"n=$n doc $i")
        val expFrac =
          if (expected.isEmpty) 0.0
          else (expected.size - expected.distinct.size).toDouble / expected.size
        assert(frac === expFrac, s"n=$n doc $i frac")
      }
    }
  }

  test("sessionize matches a local fold on random event streams") {
    // random (user, minute) events incl. duplicate timestamps; the
    // distributed gaps-and-islands labeling must equal a sequential
    // per-user fold with the same strict >30-min boundary
    val evGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0, 600)))
    (1L to 6L).foreach { seed =>
      val events = evGen(Gen.Parameters.default, rng.Seed(seed)).get
        .zipWithIndex
        .map { case ((u, min), i) =>
          (i.toLong, u, new java.sql.Timestamp(1700000000000L + min * 60000L))
        }
      val df = events.toDF("event_id", "user_id", "ts")
      val got = graft.streaming.EventStreams.sessionize(df).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      val expected = events.groupBy(_._2).flatMap { case (_, evs) =>
        val ordered = evs.sortBy(e => (e._3.getTime, e._1))
        var idx = 0L
        var prev = Long.MinValue
        ordered.map { e =>
          if (prev == Long.MinValue || e._3.getTime - prev > 30 * 60000L)
            idx += 1
          prev = e._3.getTime
          e._1 -> idx
        }
      }
      assert(got === expected, s"seed $seed")
    }
  }

  test("token chunks reconstruct the exact expected slices on random texts") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val wordGen = Gen.oneOf("alpha", "beta", "g", "", "dd", "eee")
    val textGen = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, wordGen))
    val texts = (1L to 8L).map { seed =>
      textGen(Gen.Parameters.default, rng.Seed(seed)).get.mkString(" ")
    } :+ "" :+ "single"
    val (size, stride) = (5, 3)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.ops.Pipeline.chunkByTokens(df, $"doc_id", $"text", size, stride)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getString(3)))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ", -1) // keep empty tokens, like Spark's split
      val nChunks = (toks.length - 1) / stride + 1
      (0 until nChunks).foreach { c =>
        val slice = toks.slice(c * stride, math.min(c * stride + size, toks.length))
        val (nt, h) = got((i.toLong, c))
        assert(nt === slice.length, s"doc $i chunk $c size")
        assert(h === md5hex(slice.mkString(" ")), s"doc $i chunk $c hash")
      }
      assert(!got.contains((i.toLong, nChunks)), s"doc $i has extra chunk")
    }
  }

  test("shardPlan conservation laws: totals, contiguity, target bound") {
    // on any generated (id, tokens) table: shard token counts sum to the
    // corpus total, doc counts sum to the corpus size, shard id ranges
    // are disjoint and ordered, and every shard except possibly the one
    // holding an oversize doc stays under target + its last doc.
    for ((a, i) <- samples(4).zipWithIndex) {
      val docs = a.map { case (k, v, _) => (k, math.abs(v).toLong + 1L) }
        .groupBy(_._1).map { case (k, vs) => (k, vs.head._2) }.toSeq
      if (docs.nonEmpty) {
        val df = docs.toDF("doc_id", "tok")
        val target = 17L + i
        val got = graft.ops.Pipeline
          .shardPlan(df, $"doc_id", $"tok", target)
          .orderBy("shard_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
        assert(got.map(_._3).sum === docs.map(_._2).sum, "token total")
        assert(got.map(_._2).sum === docs.size.toLong, "doc total")
        // id ranges are disjoint + ordered shard by shard
        got.sliding(2).foreach {
          case Array(p, n) => assert(p._5 < n._4, s"overlap: $p vs $n")
          case _ =>
        }
        // a multi-doc shard never opens at or past the target boundary
        // having already exceeded it: n_tokens − last-doc tokens < target
        val toks = docs.toMap
        got.foreach { case (_, nDocs, nTok, _, last) =>
          if (nDocs > 1) assert(nTok - toks(last) < target,
            s"shard overshot before its last doc: $nTok vs $target")
        }
      }
    }
  }

  test("signalAgreement bounds: jaccard in [0,1], n_common <= min sides") {
    for (Seq(a, b) <- samples(6).grouped(2)) {
      val pa = a.map { case (k, v, _) => (k, k + math.abs(v) + 1L) }
        .distinct.toDF("id_a", "id_b")
      val pb = b.map { case (k, v, _) => (k, k + math.abs(v) + 1L) }
        .distinct.toDF("id_a", "id_b")
      val got = graft.ops.Dedup
        .signalAgreement(Seq("p" -> pa, "q" -> pb)).collect()
      assert(got.length === 1)
      val r = got.head
      val (na, nb, nc) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nc <= math.min(na, nb))
      if (na + nb > 0) {
        val j = r.getDouble(5)
        assert(j >= 0.0 && j <= 1.0)
        assert(j === nc.toDouble / (na + nb - nc))
      }
    }
  }

  test("duplicateSpans invariants: disjoint, in-bounds, k-floored spans") {
    // On generated corpora (short token alphabets force heavy gram
    // collisions), every emitted span must: start >= 1, fit the doc's
    // token count, be at least k tokens (a span is a union of k-gram
    // hits), and spans of one doc must be disjoint AND non-adjacent
    // (adjacency would mean an unmerged union — the merge is maximal).
    // lengths span 0..30 so sub-k docs (the sequence(1,0) crash class)
    // are always in the corpus
    val textGen = Gen.choose(0, 30)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")))
      .map(_.mkString(" "))
    val k = 3
    for (seed <- 1 to 4) {
      val texts = (0 until 12).map { i =>
        (i.toLong, textGen.apply(Gen.Parameters.default,
          rng.Seed(seed * 100L + i)).getOrElse("a b c"))
      }
      val docs = texts.toDF("doc_id", "text")
      val nTokens = texts.map { case (id, t) =>
        id -> t.split(" ").length.toLong }.toMap
      val spans = graft.ops.Dedup.duplicateSpans(
          docs, col("doc_id"), col("text"), k)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      spans.foreach { case (id, s, e) =>
        assert(s >= 1L && e <= nTokens(id), s"span [$s,$e] outside doc $id")
        assert(e - s + 1 >= k, s"span [$s,$e] shorter than a $k-gram")
      }
      spans.groupBy(_._1).foreach { case (id, ss) =>
        ss.sortBy(_._2).sliding(2).foreach {
          case Array((_, _, e1), (_, s2, _)) =>
            assert(s2 > e1 + 1, s"doc $id spans [$e1] and [$s2] not merged")
          case _ =>
        }
      }
    }
  }

  test("contributionCap conservation: kept + clipped = events, kept <= k*days") {
    for (a <- samples(4)) {
      // reuse the generated (k, v, tag) rows as (user, minute-offset)
      val events = a.zipWithIndex.map { case ((u, v, _), i) =>
        (u, new java.sql.Timestamp(1700000000000L + v.toLong * 3600000L),
          i.toLong)
      }.toDF("user_id", "ts", "event_id")
      val res = graft.ops.EventAnalytics.contributionCap(
          events, "user_id", "ts", "event_id", maxPerDay = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      val totalIn = events.count()
      assert(res.map(_._2).sum === totalIn, "every event accounted for")
      res.foreach { case (u, n, kept, clipped, days) =>
        assert(kept + clipped === n, s"user $u: kept+clipped != n")
        assert(kept <= 2L * days, s"user $u: cap exceeded")
        assert(clipped === 0L || kept === 2L * days ||
          // clipping on SOME day while another day is under cap is fine;
          // but a user with clipped > 0 must have at least one full day
          kept >= 2L, s"user $u: clipped without a full day")
      }
    }
  }
}
