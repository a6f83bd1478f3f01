package graft.tables

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Model-based property for column mapping: a RANDOM sequence of
  * append / rename / drop / re-add(evolve) operations runs against
  * BOTH a CowTable and a trivial in-memory reference model that tracks
  * (schema, rows) per version; afterwards EVERY recorded version's
  * read (time travel through arbitrary rename/drop/re-add chains) must
  * equal the model's state at that version — contents AND logical
  * column names. This is the property the example-based
  * ColumnMappingSpec can't cover: interleavings like
  * rename(a→b); drop(b); re-add(b); rename(b→a) where the original
  * name returns bound to a THIRD physical column, and any resurrect /
  * mis-mapping / stale-stats bug shows up as a mismatch at some
  * historical version.
  */
object ColumnMappingProps extends Properties("ColumnMapping") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withWorkers(1)

  private lazy val spark = SparkTestSession.spark

  // reference model: ordered logical schema + rows as name->value maps
  private final case class Model(schema: Vector[String],
      rows: Vector[Map[String, Option[Long]]])

  private sealed trait Op
  private case class Append(seed: Long, n: Int) extends Op
  private case class Rename(fromIdx: Int, toName: String) extends Op
  private case class Drop(idx: Int) extends Op
  private case class ReAdd(name: String, seed: Long, n: Int) extends Op

  private val namePool =
    Vector("c_a", "c_b", "c_c", "c_d", "c_e")

  private val genOps: Gen[List[Op]] =
    Gen.choose(4, 9).flatMap(n => Gen.listOfN(n, Gen.frequency(
      3 -> (for {
        s <- Gen.choose(0L, 1000000L); m <- Gen.choose(1, 4)
      } yield Append(s, m)),
      3 -> (for {
        i <- Gen.choose(0, 100); t <- Gen.oneOf(namePool)
      } yield Rename(i, t)),
      2 -> Gen.choose(0, 100).map(Drop(_)),
      2 -> (for {
        t <- Gen.oneOf(namePool); s <- Gen.choose(0L, 1000000L)
        m <- Gen.choose(1, 3)
      } yield ReAdd(t, s, m)))))

  private def df(schema: Vector[String],
      rows: Seq[Map[String, Option[Long]]]) = {
    val st = StructType(schema.map(c =>
      StructField(c, LongType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(m => Row(schema.map(c =>
          m(c).map(Long.box).orNull): _*)), 1), st)
  }

  private def rowsFor(schema: Vector[String], seed: Long,
      n: Int): Vector[Map[String, Option[Long]]] =
    (0 until n).toVector.map(i => schema.zipWithIndex.map {
      case (c, j) => c -> Some(seed + i * 31L + j * 7L)
    }.toMap)

  property("every version reads as the model state at that version — " +
      "names and contents, through arbitrary rename/drop/re-add chains") =
    forAll(genOps) { ops =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_cmprop_").toFile
      try {
        val t = dir.getAbsolutePath + "/t"
        var m = Model(Vector("k", "c_a"),
          rowsFor(Vector("k", "c_a"), 7L, 3))
        CowTable.create(spark, t, df(m.schema, m.rows), Seq("k"))
        val history = scala.collection.mutable.ArrayBuffer(
          (1L, m))
        ops.foreach { op =>
          val before = TxLog.latestVersion(spark, t)
          op match {
            case Append(seed, n) =>
              val fresh = rowsFor(m.schema, seed, n)
              CowTable.append(spark, t, df(m.schema, fresh))
              m = m.copy(rows = m.rows ++ fresh)
            case Rename(fromIdx, toName) =>
              // only non-key columns rename; skip no-op/conflicts
              val cands = m.schema.drop(1)
              if (cands.nonEmpty && !m.schema.contains(toName)) {
                val from = cands(fromIdx % cands.size)
                CowTable.renameColumn(spark, t, from, toName)
                m = Model(m.schema.map(c => if (c == from) toName else c),
                  m.rows.map(r => r.map { case (c, v) =>
                    (if (c == from) toName else c) -> v }))
              }
            case Drop(idx) =>
              val cands = m.schema.drop(1)
              if (cands.size >= 2) {
                val c = cands(idx % cands.size)
                CowTable.dropColumn(spark, t, c)
                m = Model(m.schema.filterNot(_ == c),
                  m.rows.map(_ - c))
              }
            case ReAdd(name, seed, n) =>
              if (!m.schema.contains(name)) {
                val ns = m.schema :+ name
                val fresh = rowsFor(ns, seed, n)
                CowTable.append(spark, t, df(ns, fresh),
                  mergeSchema = true)
                m = Model(ns,
                  m.rows.map(_ + (name -> None)) ++ fresh)
              }
          }
          val after = TxLog.latestVersion(spark, t)
          if (after > before) history += ((after, m))
        }
        // EVERY recorded version must read back as its model state
        history.forall { case (v, mv) =>
          val got = CowTable.read(spark, t, Some(v))
          val namesOk = got.columns.toSeq == mv.schema
          val gotRows = got.collect().map(r =>
            mv.schema.zipWithIndex.map { case (c, i) =>
              c -> (if (r.isNullAt(i)) None else Some(r.getLong(i)))
            }.toMap).toVector
          def multi(x: Vector[Map[String, Option[Long]]]) =
            x.groupBy(identity).map { case (k2, v2) => k2 -> v2.size }
          namesOk && multi(gotRows) == multi(mv.rows)
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(dir)
      }
    }
}
