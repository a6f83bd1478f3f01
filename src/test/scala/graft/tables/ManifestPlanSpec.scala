package graft.tables

import graft.SparkTestSession
import graft.tables.TxLog.{AddFile, ColStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ManifestPlan]]: distributed scan planning off the checkpoint
  * sidecar. Two pins:
  *
  *   1. the Column-form predicate twins answer EXACTLY what the
  *      driver-side rules answer, over randomized stats (longs,
  *      doubles incl. NaN, strings incl. non-BMP code points, null
  *      flags, missing keys, opaque kinds) — the drift hazard the
  *      ColStats scaladoc warns about, pinned;
  *   2. a sidecar-backed table behaves IDENTICALLY to an inline twin
  *      through real merge / delete / reads, and a torn sidecar
  *      degrades to the commit fold instead of failing.
  */
class ManifestPlanSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withDir(f: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("graft_mp_").toFile
    try f(d.getAbsolutePath) finally rmrf(d)
  }
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }
  private def withThreshold[A](n: Int)(f: => A): A = {
    sys.props("graft.txlog.parquetCheckpointThreshold") = n.toString
    try f finally {
      sys.props.remove("graft.txlog.parquetCheckpointThreshold"); ()
    }
  }

  // ---- randomized manifest: per-key homogeneous kinds (a real
  // column has one kind across a table), mixed null flags, files
  // missing stats entirely, opaque entries
  private val rnd = new scala.util.Random(4242)
  private val Strings = Vector("", "a", "ab", "m", "z",
    "éclair", "😀", "😀z", "zzé")
  private def genFiles(n: Int): Seq[AddFile] = (0 until n).map { i =>
    def flag() = rnd.nextInt(3) match {
      case 0 => None
      case 1 => Some(true)
      case 2 => Some(false)
    }
    val stats = scala.collection.mutable.Map[String, ColStats]()
    if (rnd.nextInt(10) > 0) {
      val a = rnd.nextInt(200) - 100; val b = rnd.nextInt(200) - 100
      stats("k") = ColStats("long", math.min(a, b).toString,
        math.max(a, b).toString, flag())
    }
    if (rnd.nextInt(10) > 0) {
      if (rnd.nextInt(8) == 0)
        stats("d") = ColStats("double", "NaN", "NaN", flag())
      else {
        val a = (rnd.nextInt(200) - 100) / 4.0
        val b = (rnd.nextInt(200) - 100) / 4.0
        stats("d") = ColStats("double", math.min(a, b).toString,
          math.max(a, b).toString, flag())
      }
    }
    if (rnd.nextInt(10) > 0) {
      val a = Strings(rnd.nextInt(Strings.size))
      val b = Strings(rnd.nextInt(Strings.size))
      val (lo, hi) =
        if (TxLog.utf8Compare(a, b) <= 0) (a, b) else (b, a)
      stats("s") = ColStats("string", lo, hi, flag())
    }
    if (rnd.nextInt(4) == 0)
      stats("o") = ColStats("opaque", "", "", flag())
    AddFile(s"data/f$i.parquet", rnd.nextInt(1000).toLong + 1,
      stats.toMap)
  }

  private def manifestDf(files: Seq[AddFile]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(TxLog.manifestRows(files), 4),
      TxLog.FilesParquetSchema)

  /** Evaluate many predicates over the manifest frame in ONE job. */
  private def evalAll(files: Seq[AddFile],
      preds: Seq[org.apache.spark.sql.Column]): Seq[Set[String]] = {
    val cols = col("path") +: preds.zipWithIndex.map { case (p, i) =>
      p.as(s"p$i")
    }
    val rows = manifestDf(files).select(cols: _*).collect()
    preds.indices.map(i => rows.filter(r => r.getBoolean(i + 1))
      .map(_.getString(0)).toSet)
  }

  test("Column twins ≡ driver rules: mayOverlap / merge candidates " +
      "over randomized stats (NaN, non-BMP strings, null flags)") {
    val files = genFiles(150)
    // kind-consistent bound pairs, as every caller guarantees
    def longBounds() = {
      val a = rnd.nextInt(240) - 120; val b = rnd.nextInt(240) - 120
      (math.min(a, b).toString, math.max(a, b).toString)
    }
    def dblBounds() =
      if (rnd.nextInt(6) == 0) ("NaN", "NaN")
      else {
        val a = (rnd.nextInt(240) - 120) / 4.0
        val b = (rnd.nextInt(240) - 120) / 4.0
        (math.min(a, b).toString, math.max(a, b).toString)
      }
    def strBounds() = {
      val a = Strings(rnd.nextInt(Strings.size))
      val b = Strings(rnd.nextInt(Strings.size))
      if (TxLog.utf8Compare(a, b) <= 0) (a, b) else (b, a)
    }
    val cases = (0 until 30).map { _ =>
      rnd.nextInt(3) match {
        case 0 => ("k", longBounds())
        case 1 => ("d", dblBounds())
        case 2 => ("s", strBounds())
      }
    } :+ (("o", ("x", "y")))
    val overlapPreds = cases.map { case (k, (lo, hi)) =>
      ManifestPlan.mayOverlap(k, lo, hi)
    }
    val overlapGot = evalAll(files, overlapPreds)
    cases.zip(overlapGot).foreach { case ((k, (lo, hi)), got) =>
      val want = files.filter(
        _.stats.get(k).forall(_.mayOverlap(lo, hi)))
        .map(_.path).toSet
      assert(got === want, s"mayOverlap($k, $lo, $hi) drifted")
    }

    // merge candidates: multi-key bounds with null-flag branches
    val kbCases = (0 until 20).map { _ =>
      Map(
        "k" -> ((if (rnd.nextInt(5) == 0) None else Some(longBounds()),
          rnd.nextBoolean())),
        "s" -> ((if (rnd.nextInt(5) == 0) None else Some(strBounds()),
          rnd.nextBoolean())))
    }
    val kbPreds = kbCases.map(kb =>
      ManifestPlan.mergeCandidate(kb, identity))
    val kbGot = evalAll(files, kbPreds)
    kbCases.zip(kbGot).foreach { case (kb, got) =>
      val want = files.filter { f =>
        kb.forall { case (k, (range, batchNull)) =>
          f.stats.get(k).forall { s =>
            range.exists { case (lo, hi) => s.mayOverlap(lo, hi) } ||
              (batchNull && s.mayHaveNulls)
          }
        }
      }.map(_.path).toSet
      assert(got === want, s"mergeCandidate($kb) drifted")
    }
  }

  test("Column twins ≡ driver rules: matchesAny point sets and " +
      "StatsPredicate conjunct ranges") {
    val files = genFiles(150)
    // point sets with junk values mixed in (driver drops them)
    val valueCases = (0 until 15).map { _ =>
      val k = Seq("k", "d", "s")(rnd.nextInt(3))
      val vals = (0 until rnd.nextInt(6) + 1).map(_ => rnd.nextInt(4) match {
        case 0 => (rnd.nextInt(240) - 120).toString
        case 1 => ((rnd.nextInt(240) - 120) / 4.0).toString
        case 2 => Strings(rnd.nextInt(Strings.size))
        case 3 => if (rnd.nextBoolean()) "NaN" else "junk!"
      })
      (k, vals)
    }
    val vGot = evalAll(files,
      valueCases.map { case (k, vs) => ManifestPlan.matchesAny(k, vs) })
    valueCases.zip(vGot).foreach { case ((k, vs), got) =>
      def t[A](f: => A): Option[A] = scala.util.Try(f).toOption
      val want = files.filter(_.stats.get(k).forall { s =>
        s.kind match {
          case "long" => vs.flatMap(v => t(v.toLong))
            .exists(v => s.min.toLong <= v && v <= s.max.toLong)
          case "double" =>
            val (mn, mx) = (s.min.toDouble, s.max.toDouble)
            mn.isNaN || mx.isNaN ||
              vs.exists(v => t(v.toDouble).exists(_.isNaN)) ||
              vs.flatMap(v => t(v.toDouble)).filterNot(_.isNaN)
                .exists(v => mn <= v && v <= mx)
          case "string" => vs.exists(v =>
            TxLog.utf8Compare(s.min, v) <= 0 &&
              TxLog.utf8Compare(v, s.max) <= 0)
          case _ => true
        }
      }).map(_.path).toSet
      assert(got === want, s"matchesAny($k, $vs) drifted")
    }

    // predicate conjuncts: the StatsPredicate range extraction twin
    val conds = Seq(
      col("k") >= 5L && col("k") < 40L,
      col("k") === 7,
      col("d") > -3.5 && col("s") <= "m",
      col("s") > "é" && col("k") <= 90L,
      col("d") === Double.NaN,
      col("k") > lit("junk"), // wrong literal family: never prunes
      abs(col("k")) > 5 // unanalyzable: no pruning
    )
    conds.foreach { cond =>
      val want = StatsPredicate.prune(files, cond).map(_.path).toSet
      val got = ManifestPlan.prunePredicate(cond, identity) match {
        case None => files.map(_.path).toSet
        case Some(p) => evalAll(files, Seq(p)).head
      }
      assert(got === want, s"prunePredicate($cond) drifted")
      val wantRw = StatsPredicate.pruneForRewrite(files, cond)
        .map(_.path).toSet
      val gotRw = ManifestPlan.rewritePredicate(cond, identity) match {
        case None => files.map(_.path).toSet
        case Some(p) => evalAll(files, Seq(p)).head
      }
      assert(gotRw === wantRw, s"rewritePredicate($cond) drifted")
    }
  }

  test("sidecar-backed table ≡ inline twin through real ops; merge " +
      "plans distributed and prunes") {
    def drive(root: String, threshold: Int): (Seq[Long], Long, Long) =
      withThreshold(threshold) {
        val t = s"$root/t"
        // 21+ commits so a checkpoint lands; 8 files over k-ranges
        CowTable.create(spark, t,
          spark.range(400).select(col("id").as("k"),
            (col("id") % 7).cast("double").as("d"),
            concat(lit("s"), col("id")).as("s"))
            .repartitionByRange(8, col("k")),
          Seq("k", "s"))
        (1 to 20).foreach { i =>
          CowTable.append(spark, t,
            Seq((400L + i, i.toDouble, s"w$i")).toDF("k", "d", "s"))
        }
        // sanity: with threshold 3 the checkpoint went sidecar
        val planned = TxLog.snapshotPlanned(spark, t)
        assert(planned.isDistributed === (threshold == 3))
        // narrow merge first: batch bounds [5, 7] overlap ONE of the
        // 8 range files and none of the singles — the distributed
        // candidate plan must prune like the driver one
        val m = CowTable.merge(spark, t,
          Seq((5L, 99.0, "UPD"), (7L, 98.0, "UPD7")).toDF("k", "d", "s"),
          Seq("k"))
        assert(m.prunedFiles >= 20,
          s"merge must prune by zone maps, got ${m.prunedFiles}")
        assert(m.touchedFiles === 1L)
        // wide merge with an insert: no prune expected, semantics only
        CowTable.merge(spark, t,
          Seq((999L, 1.0, "NEW")).toDF("k", "d", "s"), Seq("k"))
        CowTable.deleteWhere(spark, t, col("k") >= 410L && col("k") <= 412L)
        val read1 = CowTable.readWhere(spark, t, col("k") < 10L)
          .select("k").collect().map(_.getLong(0)).sorted.toSeq
        val read2 = CowTable.readMatchingAny(spark, t, "s",
          Seq("UPD", "w7", "nope"))
          .filter(col("s").isin("UPD", "w7", "nope"))
          .select("k").collect().map(_.getLong(0)).sorted.toSeq
        val read3 = CowTable.readOverlapping(spark, t, "k", "415", "420")
          .filter(col("k").between(415L, 420L))
          .select("k").collect().map(_.getLong(0)).sorted.toSeq
        ((read1 ++ read2 ++ read3),
          CowTable.read(spark, t).count(),
          CowTable.read(spark, t).agg(sum("k")).collect()(0).getLong(0))
      }
    withDir { a => withDir { b =>
      val dist = drive(a, 3)         // sidecar-backed → distributed
      val inline = drive(b, 1000000) // inline → driver path
      assert(dist === inline)
    } }
  }

  test("mis-typed caller bounds fail loudly in BOTH paths (driver " +
      "NumberFormatException ≡ distributed raise_error), and only on " +
      "files of the mis-matched kind") {
    // driver twin: parsing "5.5" as the long kind throws
    intercept[NumberFormatException] {
      ColStats("long", "1", "9", None).mayOverlap("5.5", "9.5")
    }
    val longFile = AddFile("data/long.parquet", 1,
      Map("k" -> ColStats("long", "1", "9", None)))
    val strFile = AddFile("data/str.parquet", 1,
      Map("k" -> ColStats("string", "a", "z", None)))
    // distributed twin: a long-kind file under unparseable-as-long
    // bounds raises at evaluation (not silent lit(true) over-selection)
    val e = intercept[Exception] {
      evalAll(Seq(longFile), Seq(ManifestPlan.mayOverlap("k", "5.5", "9.5")))
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(12)
      .exists(t => Option(t.getMessage)
        .exists(_.contains("do not parse as the file's stats kind"))),
      s"expected the mis-typed-bounds raise, got: $e")
    // ...but a file of ANOTHER kind never evaluates the raising branch
    // (the driver dispatches per file kind the same way): bounds that
    // can't parse as long still answer the STRING compare for a
    // string-kind file ("5.5" < "a" ≤ "zzz" → overlaps)
    assert(evalAll(Seq(strFile),
      Seq(ManifestPlan.mayOverlap("k", "5.5", "zzz"))).head ===
      Set("data/str.parquet"))
    assert(strFile.stats("k").mayOverlap("5.5", "zzz"))
  }

  test("large point sets take the broadcast semi-join form and answer " +
      "exactly what the literal matchesAny answers") {
    val files = genFiles(150)
    val rnd2 = new scala.util.Random(77)
    // well above MatchesAnyLiteralCap, all kinds + junk + NaN mixed
    val values = (0 until ManifestPlan.MatchesAnyLiteralCap + 100)
      .map(_ => rnd2.nextInt(5) match {
        case 0 => (rnd2.nextInt(240) - 120).toString
        case 1 => ((rnd2.nextInt(240) - 120) / 4.0).toString
        case 2 => Strings(rnd2.nextInt(Strings.size))
        case 3 => "junk!" + rnd2.nextInt(10)
        case 4 => "NaN"
      })
    Seq("k", "d", "s", "o").foreach { key =>
      val literal = evalAll(files,
        Seq(ManifestPlan.matchesAny(key, values))).head
      val joined = ManifestPlan.anyOfJoin(spark, key, values)(
        manifestDf(files)).select("path").collect()
        .map(_.getString(0)).toSet
      assert(joined === literal, s"anyOfJoin($key) drifted")
    }
    // ...and the narrow-NaN case: a NaN in the set keeps every
    // double-kind file (value-independent survival through the join)
    val nanVals = (0 until ManifestPlan.MatchesAnyLiteralCap + 1)
      .map(_.toString) :+ "NaN"
    assert(ManifestPlan.anyOfJoin(spark, "d", nanVals)(manifestDf(files))
      .select("path").collect().map(_.getString(0)).toSet ===
      evalAll(files, Seq(ManifestPlan.matchesAny("d", nanVals))).head)
  }

  test("provablyAllMatch is sound-polarity: TRUE only when the driver " +
      "containment math holds (never wrongly true over randomized " +
      "stats)") {
    val files = genFiles(200)
    val rnd2 = new scala.util.Random(99)
    def t[A](f: => A): Option[A] = scala.util.Try(f).toOption
    val cases: Seq[Seq[(String, Option[Any], Option[Any])]] =
      (0 until 25).map { _ =>
        (0 until rnd2.nextInt(2) + 1).map { _ =>
          rnd2.nextInt(3) match {
            case 0 => ("k", Some(rnd2.nextInt(200) - 100),
              Some(rnd2.nextInt(200) - 100 + rnd2.nextInt(50)))
            case 1 => ("d", Some((rnd2.nextInt(200) - 100) / 4.0),
              Some((rnd2.nextInt(200) - 100 + rnd2.nextInt(40)) / 4.0))
            case 2 => ("s", Some(Strings(rnd2.nextInt(Strings.size))),
              Some(Strings(rnd2.nextInt(Strings.size))))
          }
        }.map { case (n, lo, hi) =>
          (n, lo: Option[Any], hi: Option[Any]) }
      }
    // driver twin of the containment rule, written independently
    def driverProvable(f: AddFile,
        ranges: Seq[(String, Option[Any], Option[Any])]): Boolean =
      f.rows > 0 && ranges.forall { case (n, lo, hi) =>
        f.stats.get(n).exists { s =>
          s.nulls.contains(false) && (s.kind match {
            case "long" =>
              val mn = t(s.min.toLong); val mx = t(s.max.toLong)
              def asL(v: Any) = v match {
                case i: Int => Some(i.toLong); case l: Long => Some(l)
                case _ => None }
              mn.isDefined && mx.isDefined &&
                lo.forall(v => asL(v).exists(mn.get >= _)) &&
                hi.forall(v => asL(v).exists(mx.get <= _)) &&
                lo.forall(v => asL(v).isDefined) &&
                hi.forall(v => asL(v).isDefined)
            case "double" =>
              def asD(v: Any) = v match {
                case d: Double => Some(d); case fl: Float => Some(fl.toDouble)
                case _ => None }
              val mn = s.min.toDouble; val mx = s.max.toDouble
              !mn.isNaN && !mx.isNaN &&
                lo.forall(v => asD(v).exists(x => !x.isNaN && mn >= x)) &&
                hi.forall(v => asD(v).exists(x => !x.isNaN && mx <= x))
            case "string" =>
              def asS(v: Any) = v match {
                case str: String => Some(str); case _ => None }
              lo.forall(v => asS(v).exists(x =>
                TxLog.utf8Compare(s.min, x) >= 0)) &&
                hi.forall(v => asS(v).exists(x =>
                  TxLog.utf8Compare(s.max, x) <= 0))
            case _ => false
          })
        }
      }
    val got = evalAll(files,
      cases.map(r => ManifestPlan.provablyAllMatch(r, identity)))
    cases.zip(got).foreach { case (ranges, hits) =>
      val want = files.filter(driverProvable(_, ranges)).map(_.path).toSet
      assert(hits === want, s"provablyAllMatch($ranges) drifted")
    }
  }

  test("resolved-expression range extraction prunes exactly like the " +
      "Column form (the FileIndex's pushed-filter path)") {
    val files = genFiles(150)
    val conds = Seq(
      col("k") >= 5L && col("k") < 40L,
      col("k") === 7L,
      col("d") > -3.5 && col("s") <= "m",
      col("s") > "é" && col("k") <= 90L,
      lit(12L) <= col("k"))
    conds.foreach { cond =>
      // resolve the Column against a frame whose SOURCE attributes
      // carry the relation names (a projection probe would let the
      // optimizer rewrite the pushed filter to the underlying ids),
      // then pull the catalyst Filter condition — exactly what
      // listFiles receives as a pushed data filter
      val probe = Seq((1L, 1.0d, "a")).toDF("k", "d", "s")
      // ANALYZED (not optimized — the optimizer constant-folds a
      // local-relation filter away entirely): resolved attributes,
      // Filter intact — the shape the scan planner pushes down
      val resolved = probe.filter(cond).queryExecution.analyzed
        .collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }.getOrElse(fail(s"no Filter for $cond"))
      val viaExpr = ManifestPlan.rangesPredicate(
        org.apache.spark.sql.graft.ColumnBridge
          .simpleRangesResolved(Seq(resolved)), identity)
      val viaCol = ManifestPlan.prunePredicate(cond, identity)
      (viaExpr, viaCol) match {
        case (Some(a), Some(b)) =>
          val Seq(ga, gb) = evalAll(files, Seq(a, b))
          assert(ga === gb, s"pushed-filter pruning drifted for $cond")
          assert(ga.size < files.size,
            s"$cond should prune something on this manifest")
        case other => fail(s"extraction shape drifted for $cond: $other")
      }
    }
  }

  test("the degrade catch is NARROW: a non-sidecar failure propagates " +
      "out of collectSurvivors instead of silently re-materializing") {
    withThreshold(3) {
      withDir { root =>
        val t = s"$root/t"
        CowTable.create(spark, t,
          spark.range(100).select(col("id").as("k")), Seq("k"))
        (1 to 20).foreach(i => CowTable.append(spark, t,
          Seq(100L + i).toDF("k")))
        val planned = TxLog.snapshotPlanned(spark, t)
        assert(planned.isDistributed)
        // a predicate that raises is an EXECUTION failure, not a torn
        // sidecar: it must rethrow (classified by sidecarDegrade),
        // never fall back to the driver fold (which would evaluate the
        // same raising predicate anyway — but the hazard is masking a
        // genuine failure as an unlogged 300x slowdown)
        val e = intercept[Exception] {
          ManifestPlan.collectSurvivors(spark, t, planned,
            raise_error(lit("genuine execution failure")).isNull)
        }
        assert(Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).take(12)
          .exists(t0 => Option(t0.getMessage)
            .exists(_.contains("genuine execution failure"))))
        assert(!ManifestPlan.sidecarDegrade(e),
          "a user-raised execution failure must not classify as a " +
            "sidecar degrade")
        // whereas the torn-sidecar case (the sibling spec drives it
        // end-to-end) classifies as degrade-able
        assert(ManifestPlan.sidecarDegrade(
          new java.io.FileNotFoundException("gone.parquet")))
      }
    }
  }

  test("a torn/vacuumed sidecar degrades to the commit fold — reads " +
      "and merges keep working") {
    withThreshold(3) {
      withDir { root =>
        val t = s"$root/t"
        CowTable.create(spark, t,
          spark.range(200).select(col("id").as("k"),
            col("id").cast("double").as("d"))
            .repartitionByRange(4, col("k")), Seq("k"))
        (1 to 20).foreach { i =>
          CowTable.append(spark, t,
            Seq((200L + i, i.toDouble)).toDF("k", "d"))
        }
        val planned = TxLog.snapshotPlanned(spark, t)
        assert(planned.isDistributed)
        // tear the sidecar out from under the checkpoint
        val f = TxLog.fs(spark, t)
        val logDir = new org.apache.hadoop.fs.Path(t, TxLog.LogDir)
        f.listStatus(logDir).map(_.getPath)
          .filter(_.getName.endsWith(".checkpoint.files.parquet"))
          .foreach(p => f.delete(p, true))
        // reads, pruned reads, merges: all degrade to the commit fold
        assert(CowTable.read(spark, t).count() === 220L)
        assert(CowTable.readWhere(spark, t, col("k") === 5L)
          .count() === 1L)
        val m = CowTable.merge(spark, t,
          Seq((5L, 99.0)).toDF("k", "d"), Seq("k"))
        assert(m.touchedFiles === 1L)
        assert(CowTable.readWhere(spark, t, col("k") === 5L)
          .select("d").collect()(0).getDouble(0) === 99.0)
      }
    }
  }
}
