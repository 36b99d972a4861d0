package graft

import java.sql.Timestamp

import graft.operators.{AsofJoin, Dedup, Snapshots}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY.md §5.3): diff-join, ranking, and rollup
  * invariants over generated event logs. Uses raw ScalaCheck generators
  * with deterministic seeds (the scalatest bridge isn't in the offline
  * dependency cache; Spark jobs per case are slow anyway, so a small
  * fixed sample per property is the right budget). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](g: Gen[T], n: Int = 8)(body: T => Unit): Unit =
    Iterator.iterate(Seed(42L))(_.next).take(n).foreach { seed =>
      body(g.pureApply(Gen.Parameters.default, seed))
    }

  private val eventsGen: Gen[List[(Long, Int, Long, Double)]] = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      day <- Gen.chooseNum(1, 5)
      user <- Gen.chooseNum(1L, 8L)
      value <- Gen.chooseNum(0, 10000).map(_ / 100.0)
    } yield (user, day, 0L, value))
  } yield rows.zipWithIndex.map { case ((u, d, _, v), i) => (u, d, i.toLong, v) }

  private def toDf(rows: List[(Long, Int, Long, Double)]) =
    rows.map { case (u, d, id, v) =>
      (id, Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), u, v)
    }.toDF("event_id", "ts", "user_id", "value")

  private val rangeJoinGen: Gen[(List[Int], List[(Int, Int)])] = for {
    np <- Gen.chooseNum(1, 40)
    points <- Gen.listOfN(np, Gen.chooseNum(0, 120))
    ni <- Gen.chooseNum(1, 15)
    ivals <- Gen.listOfN(ni, for {
      start <- Gen.chooseNum(0, 120)
      len <- Gen.chooseNum(0, 45)
    } yield (start, start + len))
  } yield (points, ivals)

  test("asof property: native exec ≡ composed window on random NULL-bearing streams") {
    // Non-null keys only — on NULL keys the two formulations legitimately
    // differ (the composed window groups NULLs like Window.partitionBy;
    // the native exec follows SQL join semantics), a difference documented
    // on AsofJoinNode. NULL VALUES, tied timestamps, and keys missing on
    // either side are all generated.
    val asofGen: Gen[(List[(Long, Long, Int)], List[(Long, Int, Option[Double])])] = for {
      nl <- Gen.chooseNum(1, 40)
      left <- Gen.listOfN(nl, for {
        k <- Gen.chooseNum(1L, 5L)
        ts <- Gen.chooseNum(0, 50)
      } yield (k, 0L, ts))
      nr <- Gen.chooseNum(0, 30)
      right <- Gen.listOfN(nr, for {
        k <- Gen.chooseNum(1L, 6L)
        ts <- Gen.chooseNum(0, 50)
        v <- Gen.option(Gen.chooseNum(1, 999).map(_.toDouble))
      } yield (k, ts, v))
    } yield (left.zipWithIndex.map { case ((k, _, ts), i) => (k, i.toLong, ts) }, right)

    forAll(asofGen, n = 6) { case (lRows, rRows) =>
      val l = lRows.map { case (k, id, ts) =>
        (k, id, Timestamp.valueOf(f"2024-01-01 00:${ts / 60}%02d:${ts % 60}%02d"))
      }.toDF("k", "lid", "ts")
      val r = rRows.map { case (k, ts, v) =>
        (k, Timestamp.valueOf(f"2024-01-01 00:${ts / 60}%02d:${ts % 60}%02d"), v)
      }.toDF("k", "rts", "v")
        // uniqueness requirement: one row per (k, rts), deterministically
        .groupBy("k", "rts")
        .agg(org.apache.spark.sql.functions.max("v").as("v"))
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(x => x.getLong(1) -> Option(x.get(3))).toMap
      val composed = asMap(AsofJoin.asofJoin(l, r, "k", "ts", "rts", Seq("v")))
      val native = asMap(AsofJoin.asofJoinNative(l, r, "k", "ts", "rts", Seq("v")))
      assert(native === composed)
    }
  }

  test("range join property: bucketized result equals naive for random intervals/granularities") {
    import org.apache.spark.sql.functions.{col, date_add, lit, to_date}
    forAll(rangeJoinGen, n = 6) { case (pointOffsets, ivalOffsets) =>
      val epoch = to_date(lit("2024-01-01"))
      val pts = pointOffsets.zipWithIndex.toDF("off", "pid")
        .select(col("pid"), date_add(epoch, col("off")).as("p"))
      val ivs = ivalOffsets.zipWithIndex.map { case ((s, e), i) => (i, s, e) }
        .toDF("iv_id", "s_off", "e_off")
        .select(col("iv_id"), date_add(epoch, col("s_off")).as("start_day"),
          date_add(epoch, col("e_off")).as("end_day"))
      val naive = pts.crossJoin(ivs)
        .filter(col("p").between(col("start_day"), col("end_day")))
        .select("pid", "iv_id").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      for (g <- Seq(1, 7, 30)) {
        val fast = graft.operators.RangeJoin
          .pointInInterval(pts, "p", ivs, "start_day", "end_day", g)
          .select("pid", "iv_id").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
        assert(fast === naive, s"granularity $g diverged from naive join")
      }
    }
  }

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(2, 20)
    docs <- Gen.listOfN(n, Gen.chooseNum(0, 30).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
        .map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("packing property: total, token-conserving, per-chunk docs contiguous in id order") {
    forAll(corpusGen, n = 6) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val packed = graft.operators.Packing.packDocuments(docs, budget = 7, shards = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(packed.map(_._1).toSet === rows.map(_._1).toSet, "every doc packed exactly once")
      // within a shard, chunk ids are non-decreasing in doc_id order
      packed.groupBy(_._2).foreach { case (_, rs) =>
        val chunks = rs.sortBy(_._1).map(_._3)
        assert(chunks.zip(chunks.drop(1)).forall { case (a, b) => a <= b })
      }
    }
  }

  test("contamination property: an eval doc equal to a train doc is always flagged in full") {
    forAll(corpusGen.suchThat(_.exists(_._2.split("\\s+").length >= 5)), n = 4) { rows =>
      val candidates = rows.filter(_._2.split("\\s+").count(_.nonEmpty) >= 5)
      val train = candidates.take(1).toDF("doc_id", "text")
      val eval = candidates.take(1).map { case (_, t) => (999L, t) }.toDF("doc_id", "text")
      val out = graft.operators.DataHygiene.contamination(train, eval, minCommon = 1).collect()
      assert(out.length === 1)
      assert(out.head.getDouble(3) === 1.0, "identical doc must be fully contaminated")
    }
  }

  test("gain invariants: positive gains, output users ⊆ both snapshots, dense ranks") {
    forAll(eventsGen) { rows =>
      val df = toDf(rows)
      val out = Snapshots.gainAllTime(df).collect()
      val gains = out.map(_.getDouble(2))
      assert(gains.forall(_ > 0))
      assert(out.map(_.getLong(0)).toSeq === (1 to out.length).map(_.toLong))
      // ranks ordered by gain desc
      assert(gains.sameElements(gains.sortBy(-(_: Double))))
      val snap = Snapshots.dailySnapshot(df)
      val days = snap.select("day").distinct().count()
      if (days == 1) assert(out.isEmpty, "diff of a snapshot with itself is empty")
    }
  }

  test("leaderboard invariants: dense ranks follow value order, points mirror rank") {
    forAll(eventsGen) { rows =>
      val out = Snapshots.leaderboard(toDf(rows)).collect()
      assert(out.map(_.getLong(0)).toSeq === (1 to out.length).map(_.toLong))
      val values = out.map(_.getDouble(2))
      assert(values.sameElements(values.sortBy(-(_: Double))))
      assert(out.forall(r => r.getLong(3) === 1001L - r.getLong(0)))
    }
  }

  test("rookmaster total equals the sum of per-category points") {
    forAll(eventsGen) { rows =>
      val df = toDf(rows).withColumn("event_type",
        org.apache.spark.sql.functions.expr("CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END"))
      val out = Snapshots.rookmaster(df).collect()
      val total = out.map(_.getLong(2)).sum
      val users = df.select("event_type", "user_id").distinct().count()
      // each (category, user) contributes 1001 - rank; sum over a category
      // of k users = k*1001 - k(k+1)/2
      val perCat = df.select("event_type", "user_id").distinct()
        .groupBy("event_type").count().collect().map(_.getLong(1))
      val expected = perCat.map(k => k * 1001L - k * (k + 1) / 2).sum
      assert(total === expected)
      assert(out.map(_.getLong(3)).sum === users)
    }
  }

  test("jaccard is symmetric-safe and bounded; exact dup pairs always found") {
    val docGen = for {
      base <- Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
      n <- Gen.chooseNum(3, 6)
    } yield (base.mkString(" "), n)
    forAll(docGen) { case (text, n) =>
      val docs = (0L until n.toLong).map(i => (i, text)).toDF("doc_id", "text")
      val pairs = Dedup.minhashPairs(docs, threshold = 0.99).collect()
      // all docs identical -> every pair found with jaccard 1.0
      assert(pairs.length === n * (n - 1) / 2)
      assert(pairs.forall(_.getDouble(3) === 1.0))
    }
  }

  test("min-k property: the aggregate equals sort-distinct-take-k for random multisets") {
    val gen = for {
      n <- Gen.chooseNum(0, 400)
      k <- Gen.chooseNum(1, 32)
      vs <- Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))
    } yield (k, vs)
    forAll(gen) { case (k, vs) =>
      import graft.functions.MinKAgg.min_k_distinct
      val got =
        if (vs.isEmpty) Seq.empty[Long]
        else vs.toDF("v").repartition(5)
          .agg(min_k_distinct(org.apache.spark.sql.functions.col("v"), k))
          .collect()(0).getSeq[Long](0)
      assert(got === vs.distinct.sorted.take(k))
    }
  }

  test("min-k property: streaming-style sequential offers equal the aggregate (shared definition)") {
    val gen = for {
      k <- Gen.chooseNum(1, 24)
      chunks <- Gen.listOfN(4, Gen.listOfN(60, Gen.chooseNum(0L, 300L)))
    } yield (k, chunks)
    forAll(gen, n = 6) { case (k, chunks) =>
      val buf = new java.util.TreeSet[java.lang.Long]()
      chunks.foreach(_.foreach(v => graft.functions.MinKAgg.offer(buf, v, k)))
      val seq = {
        val out = collection.mutable.ArrayBuffer[Long]()
        buf.forEach(v => out += v.longValue())
        out.toSeq
      }
      assert(seq === chunks.flatten.distinct.sorted.take(k))
    }
  }

  test("dup-span property: spans cover exactly the positions whose gram is cross-document") {
    // Random docs over a tiny alphabet force heavy gram sharing; the span
    // table must reproduce the definitional per-position shared set.
    val gen = for {
      nd <- Gen.chooseNum(2, 5)
      docs <- Gen.listOfN(nd, Gen.listOfN(18, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    } yield docs
    forAll(gen, n = 6) { docTexts =>
      val docs = docTexts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
        .toDF("doc_id", "text")
      val spans = graft.operators.DupSpans.spans(docs, n = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) - 2, r.getLong(3)))
      // definitional recompute: per doc, 3-gram list; shared = in ≥2 docs
      val grams = docTexts.zipWithIndex.map { case (t, i) =>
        val w = t.split("\\s+")
        (i + 1).toLong -> w.sliding(3).map(_.mkString(" ")).toVector
      }
      val byGram = grams.flatMap { case (id, gs) => gs.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      for ((id, gs) <- grams) {
        val sharedPos = gs.zipWithIndex.collect {
          case (g, p) if byGram(g) >= 2 => p.toLong
        }.toSet
        val fromSpans = spans.filter(_._1 == id)
          .flatMap { case (_, a, bGram, _) => (a to bGram) }.toSet
        assert(fromSpans === sharedPos, s"doc $id shared-gram positions")
        // maximality: spans don't touch or overlap
        val ss = spans.filter(_._1 == id).sortBy(_._2)
        ss.sliding(2).foreach {
          case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1 + 1, "maximal runs")
          case _ =>
        }
      }
    }
  }
}
