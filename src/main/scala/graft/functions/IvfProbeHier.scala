package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Two-level (hierarchical) IVF coarse-quantizer probe — the
  * assignment-cost escape hatch for [[IvfProbe]].
  *
  * Flat assignment prices nlist dot products per vector. With nlist
  * grown ∝ n to keep cell sizes constant (the standard IVF scaling
  * rule), that term turns the per-vector cost linear in corpus size —
  * at 10⁹ vectors with nlist ≈ 4M it dominates everything else. The
  * standard fix (FAISS-style two-level quantizers, IMI): cluster the
  * CENTROIDS into ~√nlist super-cells at build time (driver-side
  * k-means over nlist tiny points), then per vector (1) rank the
  * √nlist super-centroids, (2) scan only the centroids inside the
  * `superProbe` nearest super-cells — ≈ (1 + superProbe)·√nlist dots
  * instead of nlist.
  *
  * Output contract matches [[IvfProbe]]: the `nprobe` nearest SCANNED
  * centroid ids by cosine, nearest first. Hierarchical probing is an
  * approximation of the flat ranking — a centroid whose super-cell is
  * not probed is invisible, which can flip a boundary vector into its
  * second-best cell; recall effects are measured, not assumed
  * (OpsSpec: planted-pair recall unchanged at superProbe = 2;
  * ScaleBench: assignment-time drop at 200k vectors). If the probed
  * super-cells hold fewer than nprobe centroids the scan falls back to
  * all centroids — correctness over speed on degenerate clusterings.
  * Fully deterministic: fixed scan order, ties break to the earlier
  * scanned (super-selection: lower id) candidate.
  */
case class IvfProbeHier(child: Expression, centroids: Seq[Seq[Double]],
                        nprobe: Int, superProbe: Int)
  extends UnaryExpression {

  private val nlist = centroids.length
  require(nprobe >= 1 && nprobe <= nlist, s"nprobe $nprobe out of [1, $nlist]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ivf_probe_hier requires array<float|double> input, got $other")
    }

  private def dims: Int = centroids.head.length

  /** nlist × dims unit-normalized centroid matrix, row-major (global
    * centroid-id order — ids in the output index THIS array). */
  @transient lazy val flat: Array[Double] = {
    val out = new Array[Double](nlist * dims)
    var c = 0
    while (c < nlist) {
      val row = centroids(c)
      val nrm = math.sqrt(row.map(x => x * x).sum) max 1e-12
      var i = 0
      while (i < dims) { out(c * dims + i) = row(i) / nrm; i += 1 }
      c += 1
    }
    out
  }

  /** Driver-side deterministic k-means over the (tiny) centroid set:
    * ⌈√nlist⌉ super-cells, init = first k centroids, 3 Lloyd rounds
    * with cosine assignment (ties to the lower super id), renormalized
    * means, empty supers keep their previous point. Returns
    * (superFlat, memberOff, memberIdx): unit super-centroids row-major,
    * CSR offsets, and centroid ids grouped by super-cell. */
  @transient lazy val grouping: (Array[Double], Array[Int], Array[Int]) = {
    val k = math.max(1, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    var sup = new Array[Double](k * dims)
    System.arraycopy(flat, 0, sup, 0, k * dims)
    val assign = new Array[Int](nlist)
    def assignAll(): Unit = {
      var c = 0
      while (c < nlist) {
        var best = 0; var bestDot = Double.NegativeInfinity
        var s = 0
        while (s < k) {
          var d = 0.0; var i = 0
          while (i < dims) { d += flat(c * dims + i) * sup(s * dims + i); i += 1 }
          if (d > bestDot) { best = s; bestDot = d }
          s += 1
        }
        assign(c) = best
        c += 1
      }
    }
    var round = 0
    while (round < 3) {
      assignAll()
      val next = new Array[Double](k * dims)
      val counts = new Array[Int](k)
      var c = 0
      while (c < nlist) {
        val s = assign(c); counts(s) += 1
        var i = 0
        while (i < dims) { next(s * dims + i) += flat(c * dims + i); i += 1 }
        c += 1
      }
      var s = 0
      while (s < k) {
        if (counts(s) == 0) System.arraycopy(sup, s * dims, next, s * dims, dims)
        else {
          var nrm = 0.0; var i = 0
          while (i < dims) { val x = next(s * dims + i); nrm += x * x; i += 1 }
          nrm = math.sqrt(nrm) max 1e-12
          i = 0
          while (i < dims) { next(s * dims + i) /= nrm; i += 1 }
        }
        s += 1
      }
      sup = next
      round += 1
    }
    assignAll()
    val off = new Array[Int](k + 1)
    var c = 0
    while (c < nlist) { off(assign(c) + 1) += 1; c += 1 }
    var s = 0
    while (s < k) { off(s + 1) += off(s); s += 1 }
    val idx = new Array[Int](nlist)
    val cur = off.clone()
    c = 0
    while (c < nlist) { idx(cur(assign(c))) = c; cur(assign(c)) += 1; c += 1 }
    (sup, off, idx)
  }

  private def nsuper: Int = grouping._2.length - 1

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"ivf_probe_hier: vector has ${v.numElements()} dims, expected $dims")
    val (sup, off, idx) = grouping
    val k = nsuper
    val sp = math.min(superProbe max 1, k)
    val fl = isFloat
    val x = new Array[Double](dims)
    var i = 0
    while (i < dims) {
      x(i) = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    // level 1: rank super-centroids
    val sDots = new Array[Double](k)
    var s = 0
    while (s < k) {
      var d = 0.0; i = 0
      while (i < dims) { d += sup(s * dims + i) * x(i); i += 1 }
      sDots(s) = d
      s += 1
    }
    val selSup = new Array[Int](sp)
    val usedSup = new Array[Boolean](k)
    var j = 0
    while (j < sp) {
      var best = -1; var bestDot = Double.NegativeInfinity
      s = 0
      while (s < k) {
        if (!usedSup(s) && (best == -1 || sDots(s) > bestDot)) { best = s; bestDot = sDots(s) }
        s += 1
      }
      usedSup(best) = true; selSup(j) = best
      j += 1
    }
    // level 2: scan members of the selected super-cells
    var candN = 0
    j = 0
    while (j < sp) { candN += off(selSup(j) + 1) - off(selSup(j)); j += 1 }
    val (candIds, candDots) =
      if (candN < nprobe) {
        // degenerate clustering: fall back to a full scan
        val ids = Array.tabulate(nlist)(identity)
        val ds = new Array[Double](nlist)
        var c = 0
        while (c < nlist) {
          var d = 0.0; i = 0
          while (i < dims) { d += flat(c * dims + i) * x(i); i += 1 }
          ds(c) = d
          c += 1
        }
        (ids, ds)
      } else {
        val ids = new Array[Int](candN)
        val ds = new Array[Double](candN)
        var p = 0
        j = 0
        while (j < sp) {
          var m = off(selSup(j))
          val end = off(selSup(j) + 1)
          while (m < end) {
            val c = idx(m)
            var d = 0.0; i = 0
            while (i < dims) { d += flat(c * dims + i) * x(i); i += 1 }
            ids(p) = c; ds(p) = d; p += 1
            m += 1
          }
          j += 1
        }
        (ids, ds)
      }
    val out = new Array[Int](nprobe)
    val used = new Array[Boolean](candIds.length)
    j = 0
    while (j < nprobe) {
      var best = -1; var bestDot = Double.NegativeInfinity
      var p = 0
      while (p < candIds.length) {
        if (!used(p) && (best == -1 || candDots(p) > bestDot)) { best = p; bestDot = candDots(p) }
        p += 1
      }
      used(best) = true; out(j) = candIds(best)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val (sup, off, idx) = grouping
    val centRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val supRef = ctx.addReferenceObj("superCents", sup, "double[]")
    val offRef = ctx.addReferenceObj("memberOff", off, "int[]")
    val idxRef = ctx.addReferenceObj("memberIdx", idx, "int[]")
    val k = nsuper
    val sp = math.min(superProbe max 1, k)
    nullSafeCodeGen(ctx, ev, v => {
      // every local freshName'd — non-whole-stage projections name the
      // input ROW parameter `i`, so a bare loop variable is a Janino
      // compile error that silently drops to interpreted eval (the
      // PqCodec.normalizeGen convention)
      val x = ctx.freshName("hierX")
      val i = ctx.freshName("hierI")
      val sDots = ctx.freshName("hierSDots")
      val s = ctx.freshName("hierS")
      val d = ctx.freshName("hierD")
      val soff = ctx.freshName("hierSoff")
      val selSup = ctx.freshName("hierSelSup")
      val usedSup = ctx.freshName("hierUsedSup")
      val j = ctx.freshName("hierJ")
      val best = ctx.freshName("hierBest")
      val bestDot = ctx.freshName("hierBestDot")
      val candN = ctx.freshName("hierCandN")
      val candIds = ctx.freshName("hierCandIds")
      val candDots = ctx.freshName("hierCandDots")
      val c = ctx.freshName("hierC")
      val coff = ctx.freshName("hierCoff")
      val p = ctx.freshName("hierP")
      val mm = ctx.freshName("hierM")
      val sel = ctx.freshName("hierSel")
      val used = ctx.freshName("hierUsed")
      s"""
         |if ($v.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "ivf_probe_hier: vector has " + $v.numElements() + " dims, expected $dims");
         |}
         |double[] $x = new double[$dims];
         |for (int $i = 0; $i < $dims; $i++) { $x[$i] = (double) $v.$get($i); }
         |double[] $sDots = new double[$k];
         |for (int $s = 0; $s < $k; $s++) {
         |  double $d = 0.0; int $soff = $s * $dims;
         |  for (int $i = 0; $i < $dims; $i++) { $d += $supRef[$soff + $i] * $x[$i]; }
         |  $sDots[$s] = $d;
         |}
         |int[] $selSup = new int[$sp];
         |boolean[] $usedSup = new boolean[$k];
         |for (int $j = 0; $j < $sp; $j++) {
         |  int $best = -1; double $bestDot = Double.NEGATIVE_INFINITY;
         |  for (int $s = 0; $s < $k; $s++) {
         |    if (!$usedSup[$s] && ($best == -1 || $sDots[$s] > $bestDot)) { $best = $s; $bestDot = $sDots[$s]; }
         |  }
         |  $usedSup[$best] = true; $selSup[$j] = $best;
         |}
         |int $candN = 0;
         |for (int $j = 0; $j < $sp; $j++) { $candN += $offRef[$selSup[$j] + 1] - $offRef[$selSup[$j]]; }
         |int[] $candIds; double[] $candDots;
         |if ($candN < $nprobe) {
         |  $candIds = new int[$nlist]; $candDots = new double[$nlist];
         |  for (int $c = 0; $c < $nlist; $c++) {
         |    double $d = 0.0; int $coff = $c * $dims;
         |    for (int $i = 0; $i < $dims; $i++) { $d += $centRef[$coff + $i] * $x[$i]; }
         |    $candIds[$c] = $c; $candDots[$c] = $d;
         |  }
         |} else {
         |  $candIds = new int[$candN]; $candDots = new double[$candN];
         |  int $p = 0;
         |  for (int $j = 0; $j < $sp; $j++) {
         |    for (int $mm = $offRef[$selSup[$j]]; $mm < $offRef[$selSup[$j] + 1]; $mm++) {
         |      int $c = $idxRef[$mm];
         |      double $d = 0.0; int $coff = $c * $dims;
         |      for (int $i = 0; $i < $dims; $i++) { $d += $centRef[$coff + $i] * $x[$i]; }
         |      $candIds[$p] = $c; $candDots[$p] = $d; $p++;
         |    }
         |  }
         |}
         |int[] $sel = new int[$nprobe];
         |boolean[] $used = new boolean[$candIds.length];
         |for (int $j = 0; $j < $nprobe; $j++) {
         |  int $best = -1; double $bestDot = Double.NEGATIVE_INFINITY;
         |  for (int $p = 0; $p < $candIds.length; $p++) {
         |    if (!$used[$p] && ($best == -1 || $candDots[$p] > $bestDot)) { $best = $p; $bestDot = $candDots[$p]; }
         |  }
         |  $used[$best] = true; $sel[$j] = $candIds[$best];
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sel);
       """.stripMargin
    })
  }

  override def prettyName: String = "ivf_probe_hier"
  override protected def withNewChildInternal(c: Expression): IvfProbeHier = copy(child = c)
}
