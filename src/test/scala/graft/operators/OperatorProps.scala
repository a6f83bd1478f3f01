package graft.operators

import graft.SparkTestSession
import graft.dedup.Clusters
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import java.sql.Timestamp

/** Property-based invariants of the temporal-join and clustering
  * operators over random inputs: each scalable formulation must agree
  * exactly with its naive reference implementation (driver-side or
  * theta-join), across random keys, times, ties and graph shapes.
  */
object OperatorProps extends Properties("Operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  private def ts(s: Long): Timestamp = new Timestamp(1700000000000L + s * 1000)

  // ---- as-of join vs naive per-row argmax --------------------------------

  private val genEvents: Gen[(Seq[(String, Long, Long)], Seq[(String, Long, Double)])] =
    for {
      nl <- Gen.choose(1, 20)
      nr <- Gen.choose(0, 20)
      keys = Seq("a", "b", "c")
      left <- Gen.listOfN(nl, for {
        k <- Gen.oneOf(keys); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      right <- Gen.listOfN(nr, for {
        k <- Gen.oneOf(keys); t <- Gen.choose(0L, 50L)
        v <- Gen.choose(1, 9)
      } yield (k, t, v.toDouble))
    } yield (left.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
      // dedup right to unique (key, time): max value, mirroring the
      // pre-aggregation every caller does for deterministic ties
      right.groupBy(r => (r._1, r._2)).map { case ((k, t), rs) =>
        (k, t, rs.map(_._3).max)
      }.toSeq)

  property("asOfJoin == naive latest-at-or-before per left row") =
    forAll(genEvents) { case (left, right) =>
      import spark.implicits._
      val l = left.map { case (k, t, id) => (k, ts(t), id) }.toDF("k", "t", "row_id")
      val r = right.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "rt", "v")
      val got = AsOfJoin.joinAsOf(l, r, Seq("k"), "t", "rt", Seq("v"))
        .select("row_id", "asof_v").collect()
        .map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
      val want = left.map { case (k, t, id) =>
        id -> right.filter(e => e._1 == k && e._2 <= t)
          .sortBy(e => (e._2, e._3)).lastOption.map(_._3)
      }.toMap
      got == want
    }

  property("joinAsOfBucketed == joinAsOf (bucketing only moves partitions)") =
    forAll(genEvents) { case (left, right) =>
      import spark.implicits._
      // times span multiple 1-minute buckets (0..50s steps of 1s scaled
      // to minutes) so seeds genuinely cross bucket boundaries
      def mts(s: Long) = new Timestamp(1700000000000L + s * 90 * 1000)
      val l = left.map { case (k, t, id) => (k, mts(t), id) }.toDF("k", "t", "row_id")
      val r = right.map { case (k, t, v) => (k, mts(t), v) }.toDF("k", "rt", "v")
      def res(df: org.apache.spark.sql.DataFrame) =
        df.select("row_id", "asof_rt", "asof_v").collect()
          .map(x => x.getLong(0) -> (Option(x.getTimestamp(1)),
            if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
      res(AsOfJoin.joinAsOfBucketed(l, r, Seq("k"), "t", "rt", Seq("v"),
          bucket = "minute")) ==
        res(AsOfJoin.joinAsOf(l, r, Seq("k"), "t", "rt", Seq("v")))
    }

  // ---- range join vs naive theta join ------------------------------------

  property("joinRange == naive theta join, any window length incl. empty") =
    forAll(for {
      nl <- Gen.choose(1, 10); nr <- Gen.choose(0, 30)
      left <- Gen.listOfN(nl, for {
        k <- Gen.oneOf("a", "b"); s <- Gen.choose(0L, 100L)
        len <- Gen.choose(0L, 30000L) // up to ~8 hours in seconds
      } yield (k, s, s + len))
      right <- Gen.listOfN(nr, for {
        k <- Gen.oneOf("a", "b"); t <- Gen.choose(0L, 40000L)
      } yield (k, t))
    } yield (left, right)) { case (left, right) =>
      import spark.implicits._
      val l = left.zipWithIndex
        .map { case ((k, s, e), i) => (k, ts(s), ts(e), i.toLong) }
        .toDF("k", "s", "e", "lid")
      val r = right.map { case (k, t) => (k, ts(t)) }.toDF("k", "rt")
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "rt").collect()
          .map(x => (x.getLong(0), x.getTimestamp(1).getTime)).sorted.toSeq
      val bucketed = pairs(RangeJoin.joinRange(l, r, Seq("k"), "s", "e", "rt"))
      val naive = pairs(l.join(r,
        l("k") === r("k") && col("rt") >= col("s") && col("rt") <= col("e")))
      bucketed == naive
    }

  property("joinOverlap == naive theta join, exactly once per pair") =
    forAll(for {
      nl <- Gen.choose(1, 10); nr <- Gen.choose(0, 15)
      left <- Gen.listOfN(nl, for {
        k <- Gen.oneOf("a", "b"); s <- Gen.choose(0L, 100L)
        len <- Gen.choose(0L, 30000L) // up to ~8 hours
      } yield (k, s, s + len))
      right <- Gen.listOfN(nr, for {
        k <- Gen.oneOf("a", "b"); s <- Gen.choose(0L, 40000L)
        len <- Gen.choose(0L, 10000L)
      } yield (k, s, s + len))
    } yield (left, right)) { case (left, right) =>
      import spark.implicits._
      val l = left.zipWithIndex
        .map { case ((k, s, e), i) => (k, ts(s), ts(e), i.toLong) }
        .toDF("k", "ls", "le", "lid")
      val r = right.zipWithIndex
        .map { case ((k, s, e), i) => (k, ts(s), ts(e), i.toLong) }
        .toDF("k", "rs", "re", "rid")
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val bucketed =
        pairs(RangeJoin.joinOverlap(l, r, Seq("k"), "ls", "le", "rs", "re"))
      val naive = pairs(l.join(r,
        l("k") === r("k") && col("ls") <= col("re") && col("rs") <= col("le")))
      // sorted (not set) comparison: a pair emitted twice would differ
      bucketed == naive
    }

  // ---- stream-join batch face vs driver-side interval scan ---------------

  property("StreamJoin.withinHorizon == driver-side interval match") =
    forAll(for {
      nl <- Gen.choose(1, 15); nr <- Gen.choose(0, 30)
      left <- Gen.listOfN(nl, for {
        k <- Gen.oneOf("a", "b"); t <- Gen.choose(0L, 7200L)
      } yield (k, t))
      right <- Gen.listOfN(nr, for {
        k <- Gen.oneOf("a", "b"); t <- Gen.choose(0L, 10800L)
      } yield (k, t))
    } yield (left, right)) { case (left, right) =>
      import spark.implicits._
      val l = left.zipWithIndex.map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("k", "t", "lid")
      val r = right.zipWithIndex.map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("k", "rt", "rid")
      val got = graft.streaming.StreamJoin
        .withinHorizon(l, r, "k", "t", "rt", "1 HOUR")
        .select(col("lid"), col("rid")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      // independent arithmetic: millis bound computed driver-side
      val want = (for {
        ((lk, lt), li) <- left.zipWithIndex
        ((rk, rt), ri) <- right.zipWithIndex
        if rk == lk && rt >= lt && rt <= lt + 3600L
      } yield (li.toLong, ri.toLong)).sorted
      got == want
    }

  // ---- quota cap vs driver-side rank ------------------------------------

  property("capPerStratum == driver-side md5-rank take(cap)") =
    forAll(for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 1000L); s <- Gen.oneOf("x", "y", "z")
      } yield (id, s))
      cap <- Gen.choose(1, 8)
    } yield (rows.distinctBy(_._1), cap)) { case (rows, cap) =>
      import spark.implicits._
      val df = rows.toDF("id", "src")
      val got = graft.operators.Sampling.capPerStratum(df, "id", "src", cap)
        .select("id").collect().map(_.getLong(0)).toSet
      // independent ranking: same md5 coordinate computed via MessageDigest
      def coord(id: Long): Double = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"quota:$id".getBytes("UTF-8"))
        java.lang.Long.parseLong(
          d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
          .toDouble / (1L << 32)
      }
      val want = rows.groupBy(_._2).values.flatMap(g =>
        g.sortBy(r => (coord(r._1), r._1)).take(cap).map(_._1)).toSet
      got == want
    }

  // ---- column profile vs driver-side scan --------------------------------

  property("ColumnProfile == driver-side profile on random string frames") =
    forAll(for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        a <- Gen.option(Gen.oneOf("p", "q", "r", ""))
        b <- Gen.choose(0L, 5L)
      } yield (a, b))
    } yield rows) { rows =>
      import spark.implicits._
      val df = rows.toDF("a", "b")
      val got = graft.operators.ColumnProfile.profile(df)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            Option(r.getString(4)), Option(r.getString(5))))).toMap
      def prof(vs: Seq[Option[String]]) = {
        val nn = vs.flatten
        (vs.size.toLong, (vs.size - nn.size).toLong,
          nn.distinct.size.toLong,
          if (nn.isEmpty) None else Some(nn.min),
          if (nn.isEmpty) None else Some(nn.max))
      }
      val want = Map(
        "a" -> prof(rows.map(_._1)),
        "b" -> prof(rows.map(r => Some(r._2.toString))))
      got == want
    }

  // ---- connected components vs driver-side union-find --------------------

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  property("connectedComponents == union-find on random graphs") =
    forAll(for {
      n <- Gen.choose(1, 15)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 12L); b <- Gen.choose(0L, 12L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct) { edges =>
      edges.isEmpty || {
        import spark.implicits._
        val got = Clusters
          .connectedComponents(edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == unionFind(edges)
      }
    }

  property("two-star CC == union-find on random graphs") =
    forAll(for {
      n <- Gen.choose(1, 15)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 12L); b <- Gen.choose(0L, 12L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct) { edges =>
      edges.isEmpty || {
        import spark.implicits._
        val got = Clusters
          .connectedComponentsTwoStar(
            edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == unionFind(edges)
      }
    }

  // ---- equi-depth histogram vs flat sorted reference ---------------------

  private val genDoubles: Gen[(Seq[Double], Int)] = for {
    n <- Gen.choose(1, 80)
    k <- Gen.choose(1, 7)
    vals <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(-50, 50).map(_.toDouble),    // ties likely
      Gen.choose(-1e6, 1e6).map(_ / 1000.0))) // spread
  } yield (vals, k)

  property("EquiDepth == flat sorted bucketing, any k / ties / skew") =
    forAll(genDoubles) { case (vals, k) =>
      import spark.implicits._
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v").repartition(5)
      val got = EquiDepth.histogram(df, "v", "id", k, nSub = 4)
        .orderBy("bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSeq
      val want = vals.sorted.zipWithIndex
        .groupBy { case (_, i) => i.toLong * k / vals.size }
        .toSeq.sortBy(_._1)
        .map { case (b, g) =>
          (b, g.size.toLong, g.map(_._1).min, g.map(_._1).max) }
      got == want
    }

  // ---- curriculum order vs global sorted rank ----------------------------

  property("CorpusOrder == global row_number over (stage, md5, id)") =
    forAll(for {
      n <- Gen.choose(1, 60)
      ids <- Gen.listOfN(n, Gen.choose(0L, 1000L))
    } yield ids.distinct) { ids =>
      ids.isEmpty || {
        import spark.implicits._
        val df = ids.map(i => (i, (i % 4).toInt)).toDF("id", "st")
          .repartition(3)
        val got = CorpusOrder.orderPlan(df, "id", col("st"), nSub = 8)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
        def h(id: Long): Long = {
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(s"order:$id".getBytes("UTF-8"))
          java.lang.Long.parseLong(
            md5.take(4).map(b => f"$b%02x").mkString, 16)
        }
        val want = ids.sortBy(i => (i % 4, h(i), i)).zipWithIndex
          .map { case (i, p) => i -> p.toLong }.toMap
        got == want
      }
    }

  // ---- spread robust outliers vs windowed form ---------------------------

  property("RobustOutliers spread == windowed, random shapes") =
    forAll(for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("x", "y", "z")
        v <- Gen.oneOf(Gen.choose(-9, 9).map(_.toDouble), Gen.const(1e5))
      } yield (g, v))
    } yield rows) { rows =>
      import spark.implicits._
      val df = rows.toDF("grp", "v").repartition(4)
      def norm(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("grp").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
            r.getDouble(3), r.getLong(4))).toSeq
      norm(RobustOutliers.summarySpread(df, "grp", "v", nSub = 3)) ==
        norm(RobustOutliers.summary(df, "grp", "v"))
    }
}
