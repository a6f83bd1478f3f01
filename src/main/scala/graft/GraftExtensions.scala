package graft

import graft.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.unsafe.types.UTF8String

/** Session extension wiring — `.config("spark.sql.extensions",
  * "graft.GraftExtensions")` makes the engine's native expressions
  * available to plain `spark.sql(...)` text, not just the Column API:
  *
  * {{{ SELECT dot_product(a.embedding, b.embedding) FROM ... }}}
  * {{{ SELECT word_shingles(text, 3), token_runs(text) FROM docs }}}
  *
  * and installs the [[graft.expressions.RewriteDotProduct]] optimizer
  * rule, which upgrades the equivalent built-in
  * `aggregate(zip_with(...))` fold to the native expression
  * automatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Extract a required constant argument (the scan expressions take
    * their parameters at plan build, like every SQL function with a
    * static shape argument). Any FOLDABLE expression is accepted and
    * evaluated here — `word_shingles(t, 1+1)` and `CAST(2 AS INT)`
    * work like they do for Spark's own literal-arg builtins, instead
    * of being rejected before constant folding would have reduced
    * them.
    */
  private def constVal(e: Expression, fn: String, pos: Int): Any = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn argument $pos must be a constant expression, got $e")
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
  }

  private def intLit(e: Expression, fn: String, pos: Int): Int =
    constVal(e, fn, pos) match {
      case v: Int => v
      case v: Short => v.toInt
      case v: Byte => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn argument $pos must be an integer constant, got $other")
    }

  private def strLit(e: Expression, fn: String, pos: Int): String =
    constVal(e, fn, pos) match {
      case v: UTF8String => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn argument $pos must be a string constant, got $other")
    }

  /** Constant numeric-array argument (codebook ids/components for the
    * ANN expressions) — any foldable array of integral or floating
    * elements, evaluated at plan build.
    */
  private def numArr(e: Expression, fn: String, pos: Int): Seq[Double] = {
    import org.apache.spark.sql.types._
    val data = constVal(e, fn, pos) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a
      case other => throw new IllegalArgumentException(
        s"$fn argument $pos must be a constant array, got $other")
    }
    e.dataType match {
      case ArrayType(IntegerType, _) => data.toIntArray().toSeq.map(_.toDouble)
      case ArrayType(LongType, _) => data.toLongArray().toSeq.map(_.toDouble)
      case ArrayType(DoubleType, _) => data.toDoubleArray().toSeq
      case ArrayType(FloatType, _) => data.toFloatArray().toSeq.map(_.toDouble)
      case other => throw new IllegalArgumentException(
        s"$fn argument $pos must be a numeric array, got ${other.sql}")
    }
  }

  private def longArr(e: Expression, fn: String, pos: Int): Seq[Long] =
    numArr(e, fn, pos).map(_.toLong)

  /** Constant string-array argument (lexicons, stopword sets). */
  private def strArr(e: Expression, fn: String, pos: Int): Seq[String] = {
    import org.apache.spark.sql.types._
    val data = constVal(e, fn, pos) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a
      case other => throw new IllegalArgumentException(
        s"$fn argument $pos must be a constant array, got $other")
    }
    e.dataType match {
      case ArrayType(StringType, _) =>
        (0 until data.numElements()).map { i =>
          if (data.isNullAt(i)) throw new IllegalArgumentException(
            s"$fn argument $pos must not contain NULL elements " +
              s"(element $i is NULL)")
          data.getUTF8String(i).toString
        }
      case other => throw new IllegalArgumentException(
        s"$fn argument $pos must be a string array, got ${other.sql}")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit = {
      // ExpressionInfo className is DESCRIBE-FUNCTION metadata only; the
      // snake_case name maps to the CamelCase expression class
      val className = "graft.expressions." +
        name.split('_').map(_.capitalize).mkString
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }

    inject("dot_product", { args =>
      require(args.length == 2,
        s"dot_product takes 2 arguments, got ${args.length}")
      DotProduct(args.head, args(1))
    })
    inject("token_runs", { args =>
      require(args.length == 1,
        s"token_runs takes 1 argument, got ${args.length}")
      TokenRuns(args.head)
    })
    inject("token_runs_unicode", { args =>
      require(args.length == 1,
        s"token_runs_unicode takes 1 argument, got ${args.length}")
      TokenRunsUnicode(args.head)
    })
    inject("script_counts", { args =>
      require(args.length == 1,
        s"script_counts takes 1 argument, got ${args.length}")
      ScriptCounts(args.head)
    })
    inject("word_shingles", { args =>
      require(args.length == 2 || args.length == 3,
        s"word_shingles takes (text, n [, distinct]), got ${args.length}")
      val distinct = args.length < 3 || (constVal(args(2), "word_shingles", 3) match {
        case b: Boolean => b
        case other => throw new IllegalArgumentException(
          s"word_shingles argument 3 must be a boolean constant, got $other")
      })
      WordShingles(args.head, intLit(args(1), "word_shingles", 2), distinct)
    })
    inject("char_shingles", { args =>
      require(args.length == 2,
        s"char_shingles takes (text, n), got ${args.length}")
      CharShingles(args.head, intLit(args(1), "char_shingles", 2))
    })
    inject("md5_prefix_long", { args =>
      require(args.length == 2,
        s"md5_prefix_long takes (s, digits), got ${args.length}")
      Md5PrefixLong(args.head, intLit(args(1), "md5_prefix_long", 2))
    })
    inject("minhash_bands", { args =>
      require(args.length == 3,
        s"minhash_bands takes (shingles, numBands, rowsPerBand), " +
          s"got ${args.length}")
      val nb = intLit(args(1), "minhash_bands", 2)
      val rpb = intLit(args(2), "minhash_bands", 3)
      val (as, bs) = (0 until nb * rpb)
        .map(graft.dedup.MinHashLSH.coeffs).unzip
      MinHashBands(args.head, as, bs, nb, rpb)
    })
    inject("simhash_sig", { args =>
      require(args.length == 1,
        s"simhash_sig takes 1 argument, got ${args.length}")
      SimHashSig(args.head)
    })
    inject("hilbert_index", { args =>
      require(args.length == 2,
        s"hilbert_index takes (x, y), got ${args.length}")
      HilbertIndex(args.head, args(1))
    })
    inject("char_entropy", { args =>
      require(args.length == 1,
        s"char_entropy takes 1 argument, got ${args.length}")
      CharEntropy(args.head)
    })
    inject("rolling_fingerprint", { args =>
      require(args.length == 1,
        s"rolling_fingerprint takes 1 argument, got ${args.length}")
      RollingFingerprint(args.head, graft.text.Fingerprint.Mod)
    })
    inject("apply_merge", { args =>
      require(args.length == 3,
        s"apply_merge takes (seq, left, right), got ${args.length}")
      ApplyMerge(args.head, strLit(args(1), "apply_merge", 2),
        strLit(args(2), "apply_merge", 3))
    })
    // the ANN codebook primitives: the codebook rides as constant
    // array arguments (ids, norms, k×dim components flattened
    // row-major), evaluated at plan build — plain SQL reaches the
    // same codegen'd argmin/residual loops the Column API uses
    inject("nearest_centroid", { args =>
      require(args.length == 5,
        s"nearest_centroid takes (q, qn, cids, cns, flat), got ${args.length}")
      NearestCentroid(args.head, args(1),
        longArr(args(2), "nearest_centroid", 3),
        numArr(args(3), "nearest_centroid", 4),
        numArr(args(4), "nearest_centroid", 5))
    })
    inject("floor_residual", { args =>
      require(args.length == 4,
        s"floor_residual takes (q, cell, cids, flat), got ${args.length}")
      FloorResidual(args.head, args(1),
        longArr(args(2), "floor_residual", 3),
        numArr(args(3), "floor_residual", 4))
    })
    inject("sign_pack_words", { args =>
      require(args.length == 3,
        s"sign_pack_words takes (vec, flat_planes, bits), got ${args.length}")
      SignPackWords(args.head, numArr(args(1), "sign_pack_words", 2),
        intLit(args(2), "sign_pack_words", 3))
    })
    inject("deflate_length", { args =>
      require(args.length == 1,
        s"deflate_length takes 1 argument, got ${args.length}")
      DeflateLength(args.head)
    })
    inject("count_in_set", { args =>
      require(args.length == 2,
        s"count_in_set takes (arr, items), got ${args.length}")
      CountInSet(args.head, strArr(args(1), "count_in_set", 2))
    })
    inject("deletion_neighborhood", { args =>
      require(args.length == 2,
        s"deletion_neighborhood takes (s, max_del), got ${args.length}")
      DeletionNeighborhood(args.head,
        intLit(args(1), "deletion_neighborhood", 2))
    })
    // Table-valued functions: the table format as plain SQL text —
    // `SELECT * FROM cow_table('/path/t')`, time travel via the second
    // argument, and the commit history as a queryable relation. The
    // builder returns the READ's logical plan; both args must be
    // foldable (evaluated at resolution, like every TVF with static
    // shape). SparkSession.active is the resolving session — TVF
    // builders get no session handle by design.
    def injectTvf(name: String,
        builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans
          .logical.LogicalPlan): Unit =
      ext.injectTableFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.tables.CowTable", name),
        builder))
    def constStr(e: Expression, fn: String): String =
      constVal(e, fn, 1) match {
        case s: UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"$fn argument 1 must be a constant string path, got $other")
      }
    def constLong(e: Expression, fn: String): Long =
      constVal(e, fn, 2) match {
        case i: Int  => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"$fn argument 2 must be a constant version, got $other")
      }

    injectTvf("cow_table", { args =>
      require(args.nonEmpty && args.length <= 2,
        s"cow_table(path[, asOfVersion | 'ts']) — got ${args.length} args")
      val spark = org.apache.spark.sql.SparkSession.active
      val path = constStr(args.head, "cow_table")
      // second arg: an integer = version; a string = AS OF TIMESTAMP,
      // 'yyyy-MM-dd HH:mm:ss[.SSS]' interpreted as UTC (the session's
      // pinned zone) and resolved via the commit audit stamps
      val asOf = args.lift(1).map(e => constVal(e, "cow_table", 2) match {
        case i: Int  => i.toLong
        case l: Long => l
        case s: UTF8String =>
          val ts = java.time.LocalDateTime
            .parse(s.toString.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          graft.tables.TxLog.versionAtTimestamp(spark, path, ts)
        case other => throw new IllegalArgumentException(
          "cow_table argument 2 must be a constant version or " +
            s"'yyyy-MM-dd HH:mm:ss' timestamp, got $other")
      })
      graft.tables.CowTable.read(spark, path, asOf)
        .queryExecution.logical
    })
    injectTvf("cow_table_files", { args =>
      require(args.nonEmpty && args.length <= 2,
        s"cow_table_files(path[, asOfVersion]) — got ${args.length} args")
      val spark = org.apache.spark.sql.SparkSession.active
      graft.tables.TxLog.filesAsDf(spark,
          constStr(args.head, "cow_table_files"),
          args.lift(1).map(constLong(_, "cow_table_files")))
        .queryExecution.logical
    })
    injectTvf("cow_table_history", { args =>
      // (path[, fromVersion[, toVersion]]) — the paged audit face:
      // only the requested page's commit files are read (round 16)
      require(args.nonEmpty && args.length <= 3,
        s"cow_table_history(path[, from[, to]]) — got ${args.length} " +
          "arguments")
      val spark = org.apache.spark.sql.SparkSession.active
      graft.tables.TxLog.describeHistory(spark,
          constStr(args.head, "cow_table_history"),
          args.lift(1).map(constLong(_, "cow_table_history")),
          args.lift(2).map(constLong(_, "cow_table_history")))
        .queryExecution.logical
    })
    injectTvf("cow_table_changes", { args =>
      require(args.length == 2,
        s"cow_table_changes(path, version) — got ${args.length} arguments")
      val spark = org.apache.spark.sql.SparkSession.active
      graft.tables.CowTable.changesAt(spark,
          constStr(args.head, "cow_table_changes"),
          constLong(args(1), "cow_table_changes"))
        .queryExecution.logical
    })
    injectTvf("cow_table_provenance", { args =>
      require(args.nonEmpty && args.length <= 2,
        s"cow_table_provenance(path[, asOfVersion]) — got ${args.length}")
      val spark = org.apache.spark.sql.SparkSession.active
      graft.tables.CowTable.readWithProvenance(spark,
          constStr(args.head, "cow_table_provenance"),
          args.lift(1).map(constLong(_, "cow_table_provenance")))
        .queryExecution.logical
    })

    ext.injectOptimizerRule(_ => RewriteDotProduct)
    // materialized-summary routing (graft.plans.SummaryCatalog): route
    // covered aggregates over a base table to its registered rollup
    ext.injectOptimizerRule(session => graft.plans.SummaryRewrite(session))
  }
}
