package graft.operators

import graft.SparkTestSession
import graft.expressions.HilbertIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HilbertSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Canonical INVERSE walk (d → xy, Hamilton's d2xy) — an independent
    * reference: if index() inverts it over the whole domain, index()
    * is the true curve.
    */
  private def d2xy(d0: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var t = d0
    var s = 1L
    while (s < (1L << HilbertIndex.Bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("index inverts the canonical d2xy over the full 32-bit range") {
    val rnd = new scala.util.Random(7)
    val ds = (0 until 2000).map(_ => rnd.nextLong() & 0xFFFFFFFFL) ++
      Seq(0L, 1L, 2L, 3L, 0xFFFFFFFFL, (1L << 31) - 1, 1L << 31)
    ds.foreach { d =>
      val (x, y) = d2xy(d)
      assert(HilbertIndex.index(x, y) === d, s"round trip broke at d=$d")
    }
  }

  test("consecutive indexes are adjacent cells (the locality property)") {
    val rnd = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      val d = rnd.nextLong() & 0xFFFFFFFEL
      val (x0, y0) = d2xy(d)
      val (x1, y1) = d2xy(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1L,
        s"curve jumped between d=$d and ${d + 1}")
    }
  }

  test("expression evaluates through codegen identically to the static walk") {
    val pts = (0L until 1000L).map(i => (i, (i * 2654435761L) & 0xFFFFL,
      (i * 40503L) & 0xFFFFL)).toDF("id", "x", "y")
    val got = pts.select($"id", HilbertIndex($"x", $"y").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pts.collect().foreach { r =>
      assert(got(r.getLong(0)) ===
        HilbertIndex.index(r.getLong(1), r.getLong(2)))
    }
    // null propagates
    val n = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(HilbertIndex($"x", $"y")).collect().head
    assert(n.isNullAt(0))
  }

  test("files of consecutive Hilbert keys have tighter boxes than Z-order") {
    // every cell of a 64x64 grid, cut into 100-cell "files" by each
    // curve's order: total bounding-box area measures how much a
    // min/max-pruned reader over-reads. Deterministic, whole-grid —
    // not a sampled claim. 100 is deliberately NOT a power of two:
    // ALIGNED 2^k runs are tight rectangles for BOTH curves (measured
    // equal at 32/64), but real files cut at arbitrary row counts —
    // and unaligned Morton runs straddle the curve's diagonal jumps
    // (measured 10752 vs Hilbert's 5472 here), while Hilbert's
    // step-adjacency keeps every run connected.
    def boxesTotal(order: (Long, Long) => Long): Long = {
      val cells = for (x <- 0L until 64L; y <- 0L until 64L)
        yield (order(x, y), x, y)
      cells.sortBy(_._1).grouped(100).map { file =>
        val (xs, ys) = (file.map(_._2), file.map(_._3))
        (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
      }.sum
    }
    def zvalue(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))
      }.sum
    val hilbert = boxesTotal(HilbertIndex.index)
    val zorder = boxesTotal(zvalue)
    assert(hilbert < zorder,
      s"hilbert total box area $hilbert must beat z-order $zorder")
    // and not marginally: a ~2x over-read gap
    assert(hilbert * 3 < zorder * 2,
      s"expected a decisive locality win, got $hilbert vs $zorder")
  }
}
