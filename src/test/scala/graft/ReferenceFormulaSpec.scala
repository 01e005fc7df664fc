package graft

import graft.indicators.Indicators

/** Independent cross-check: the DuckDB oracles are engineered to mirror
  * the engine's expression trees, so a systematic translation error
  * could pass both. This spec recomputes indicators with plain Scala
  * loops written directly from the REFERENCE formulas
  * (/root/reference/indicators.py) and compares. 40-bar fixture covers
  * the default windows' non-null tails.
  */
class ReferenceFormulaSpec extends SparkSpec {

  // 90 bars so even ichimoku's 52-window + 26-shift tail is exercised
  private val closes: Vector[Double] =
    Vector.tabulate(90)(i => 100.0 + 15 * math.sin(i / 3.0) + (i % 7) - 3)

  private def frame = bars("x", closes.map(java.lang.Double.valueOf))
  // bars() derives high = close + 1, low = close - 1, volume = 100*(i+1);
  // the loop expectations use those shapes:
  private val H = closes.map(_ + 1.0)
  private val L = closes.map(_ - 1.0)
  private val V = Vector.tabulate(90)(i => 100.0 * (i + 1))

  // polars ewm_mean(alpha, adjust=False, ignore_nulls=False), no nulls
  private def emaRef(xs: Seq[Double], span: Int): Vector[Double] = {
    val a = 2.0 / (span + 1)
    xs.tail.scanLeft(xs.head) { (y, x) => ((1 - a) * y + a * x) / ((1 - a) + a) }.toVector
  }

  // polars ewm_mean(span, adjust=True)
  private def ewmAdjRef(xs: Seq[Double], span: Int): Vector[Double] = {
    val a = 2.0 / (span + 1)
    var num = 0.0; var den = 0.0
    xs.map { x => num = (1 - a) * num + x; den = (1 - a) * den + 1.0; num / den }.toVector
  }

  private def rollMeanRef(xs: Seq[Option[Double]], n: Int): Vector[Option[Double]] =
    xs.indices.map { i =>
      if (i + 1 < n) None
      else {
        val w = xs.slice(i - n + 1, i + 1)
        if (w.exists(_.isEmpty)) None else Some(w.flatten.sum / n)
      }
    }.toVector

  private def close(a: Option[Double], b: Option[Double], tol: Double = 1e-9): Boolean =
    (a, b) match {
      case (None, None) => true
      case (Some(x), Some(y)) => math.abs(x - y) <= tol * math.max(1.0, math.abs(y))
      case _ => false
    }

  private def check(colName: String, expected: Seq[Option[Double]], out: org.apache.spark.sql.DataFrame): Unit = {
    val got = doubles(out, colName)
    assert(got.length == expected.length)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(close(g, e), s"$colName row $i: engine=$g reference=$e")
    }
  }

  test("ema matches the loop recursion") {
    val out = Indicators(frame).ema(Seq("close"), 9).toDF
    check("close_ema_9", emaRef(closes, 9).map(Some(_)), out)
  }

  test("macd signal line matches chained loop recursions") {
    val e12 = emaRef(closes, 12)
    val e26 = emaRef(closes, 26)
    val macd = e12.zip(e26).map { case (a, b) => a - b }
    val signal = emaRef(macd, 9)
    val out = Indicators(frame).macd(Seq("close")).toDF
    check("close_signal_line", signal.map(Some(_)), out)
  }

  test("keltner channel matches loop (adjust=true middle + SMA atr)") {
    val middle = ewmAdjRef(closes, 20)
    // max/min_horizontal ignore nulls: row 0's TR is high - low
    val tr = closes.indices.map { i =>
      if (i == 0) Some(H(0) - L(0))
      else Some(math.max(H(i), closes(i - 1)) - math.min(L(i), closes(i - 1)))
    }
    val atr = rollMeanRef(tr, 14)
    val upper = closes.indices.map(i => atr(i).map(a => middle(i) + a * 2))
    val out = Indicators(frame).keltner_channel().toDF
    check("KC_Upper_Band_20_14_2", upper, out)
  }

  test("ultimate oscillator matches loop (max-max TR quirk, 4/2/2 weights)") {
    // max/min_horizontal ignore nulls: row 0 uses bare low/high
    val bp = closes.indices.map { i =>
      if (i == 0) Some(closes(0) - L(0))
      else Some(closes(i) - math.min(L(i), closes(i - 1)))
    }
    val tr = closes.indices.map { i =>
      if (i == 0) Some(H(0) - L(0))
      else Some(math.max(H(i), closes(i - 1)) - math.max(L(i), closes(i - 1)))
    }
    def ratio(n: Int, wt: Int) = {
      val b = rollMeanRef(bp, n); val t = rollMeanRef(tr, n)
      closes.indices.map(i => (b(i), t(i)) match {
        case (Some(x), Some(y)) => Some(x / y * wt)
        case _ => None
      })
    }
    val r7 = ratio(7, 4); val r14 = ratio(14, 2); val r28 = ratio(28, 2)
    val uo = closes.indices.map { i =>
      val s = r7(i).getOrElse(0.0) + r14(i).getOrElse(0.0) + r28(i).getOrElse(0.0)
      Some(s * 100 / 8)
    }
    val out = Indicators(frame).ultimate_oscillator().toDF
    check("UO_7_14_28_4_2_2", uo, out)
  }

  test("tsi matches double adjust=true smoothing, short-then-long") {
    val delta = closes.indices.map(i => if (i == 0) None else Some(closes(i) - closes(i - 1)))
    def ewmOpt(xs: Seq[Option[Double]], span: Int): Vector[Option[Double]] = {
      val a = 2.0 / (span + 1)
      var num = 0.0; var den = 0.0
      xs.map {
        case Some(x) =>
          num = (1 - a) * num + x; den = (1 - a) * den + 1.0; Some(num / den)
        case None =>
          num = (1 - a) * num; den = (1 - a) * den
          if (den == 0.0) None else Some(num / den)
      }.toVector
    }
    val sm = ewmOpt(ewmOpt(delta, 13), 25)
    val smAbs = ewmOpt(ewmOpt(delta.map(_.map(math.abs)), 13), 25)
    val tsi = sm.zip(smAbs).map {
      case (Some(a), Some(b)) => Some(100 * a / b)
      case _ => None
    }
    val out = Indicators(frame).true_strength_index(Seq("close"), 13, 25).toDF
    check("close_tsi_13_25", tsi, out)
  }

  test("kama matches the variable-alpha loop") {
    val n = 10
    val er = closes.indices.map { i =>
      if (i < n) None
      else {
        val num = math.abs(closes(i) - closes(i - n))
        val den = (i - n + 1 to i).map(j => math.abs(closes(j) - closes(j - 1))).sum
        Some(num / den)
      }
    }
    val fast = 2.0 / 3; val slow = 2.0 / 31
    val sc = er.map(_.map { e => val b = e * (fast - slow) + slow; b * b })
    var y: Option[Double] = None
    val kama = closes.indices.map { i =>
      sc(i) match {
        case Some(a) =>
          y = Some(y match {
            case None => closes(i)
            case Some(prev) => prev + a * (closes(i) - prev)
          })
          y
        case None => y
      }
    }
    val out = Indicators(frame).kama().toDF
    check("KAMA_close", kama, out)
  }

  test("rsi matches the loop incl. Kleene-null head") {
    val delta = closes.indices.map(i => if (i == 0) None else Some(closes(i) - closes(i - 1)))
    val gain = delta.map(_.map(d => if (d > 0) d else 0.0))
    val loss = delta.map(_.map(d => if (d < 0) math.abs(d) else 0.0))
    val ag = rollMeanRef(gain, 14)
    val al = rollMeanRef(loss, 14)
    val rsi = closes.indices.map { i =>
      (ag(i), al(i)) match {
        case (Some(g), Some(l)) => Some(100.0 - 100.0 / (1.0 + g / l))
        case _ => None
      }
    }
    val out = Indicators(frame).rsi(Seq("close")).toDF
    check("close_rsi_14", rsi, out)
  }

  test("vwap matches the running loop") {
    var num = 0.0; var den = 0.0
    val vwap = closes.indices.map { i =>
      num += (H(i) + L(i) + closes(i)) / 3 * V(i)
      den += V(i)
      Some(num / den)
    }
    val out = Indicators(frame).vwap().toDF
    check("vwap", vwap, out)
  }

  test("stochastic oscillator matches the loop (rolling_min(close-low) quirk)") {
    val so = closes.indices.map { i =>
      if (i + 1 < 14) None
      else {
        val numW = (i - 13 to i).map(j => closes(j) - L(j)).min
        val den = (i - 13 to i).map(H(_)).max - (i - 13 to i).map(L(_)).min
        Some(numW / den * 100)
      }
    }
    val out = Indicators(frame).stochastic_oscillator().toDF
    check("stochastic_oscillator_14", so, out)
  }

  test("ichimoku senkou spans match the loop (hard-coded shift 26)") {
    def channel(i: Int, n: Int): Option[Double] =
      if (i + 1 < n) None
      else Some(((i - n + 1 to i).map(H(_)).max + (i - n + 1 to i).map(L(_)).min) / 2)
    val tenkan = closes.indices.map(channel(_, 9))
    val kijun = closes.indices.map(channel(_, 26))
    val sbRaw = closes.indices.map(channel(_, 52))
    val senkouA = closes.indices.map { i =>
      if (i < 26) None
      else (tenkan(i - 26), kijun(i - 26)) match {
        case (Some(t), Some(k)) => Some((t + k) / 2)
        case _ => None
      }
    }
    val senkouB = closes.indices.map(i => if (i < 26) None else sbRaw(i - 26))
    // chikou = close.shift(-26): a LEAD — the reference's future-value
    // quirk kept verbatim (indicators.py:816).
    val chikou = closes.indices.map(i =>
      if (i + 26 < closes.length) Some(closes(i + 26)) else None)
    val out = Indicators(frame).ichimoku().toDF
    check("senkou_span_a", senkouA, out)
    check("senkou_span_b", senkouB, out)
    check("tenkan_sen", tenkan, out)
    check("kijun_sen", kijun, out)
    check("chikou_span", chikou, out)
  }

  test("psar matches the state-machine loop") {
    var trend = 0; var sar = 0.0; var ep = 0.0; var af = 0.0
    val afS = 0.02; val afI = 0.02; val afM = 0.02
    var init = false
    val expected = closes.indices.map { i =>
      if (i == 0) None
      else if (!init) {
        init = true
        trend = if (H(i) >= H(i - 1)) 1 else -1
        sar = if (trend == 1) L(i - 1) else H(i - 1)
        ep = if (trend == 1) H(i) else L(i)
        af = afS
        Some(sar)
      } else {
        val cand = sar + af * (ep - sar)
        if (trend == 1) {
          val clamped = math.min(cand, L(i - 1))
          if (L(i) < clamped) {
            trend = -1; sar = ep; ep = L(i); af = afS
          } else {
            sar = clamped
            if (H(i) > ep) { af = math.min(af + afI, afM); ep = math.max(ep, H(i)) }
          }
        } else {
          val clamped = math.max(cand, H(i - 1))
          if (H(i) > clamped) {
            trend = 1; sar = ep; ep = H(i); af = afS
          } else {
            sar = clamped
            if (L(i) < ep) { af = math.min(af + afI, afM); ep = math.min(ep, L(i)) }
          }
        }
        Some(sar)
      }
    }
    val out = Indicators(frame).psar().toDF
    check("psar", expected, out)
  }

  test("trix matches the triple-EMA pct-change loop (no x100 quirk)") {
    // indicators.py:855-875: three chained ema(span) cascades
    // (adjust=False), then pct_change(1) — NOT scaled by 100.
    val e3 = emaRef(emaRef(emaRef(closes, 15), 15), 15)
    val expected = None +: e3.indices.tail.map(i => Some(e3(i) / e3(i - 1) - 1))
    val out = Indicators(frame).trix().toDF
    check("trix_15", expected, out)
  }

  test("mass index matches the adjust=true double-EWM ratio-sum loop") {
    // indicators.py:877-898: ewm_mean(span=9) with polars' DEFAULT
    // adjust=True on high-low, ewm of that, ratio, rolling_sum(26).
    val e1 = ewmAdjRef(H.zip(L).map { case (h, l) => h - l }, 9)
    val e2 = ewmAdjRef(e1, 9)
    val ratio = e1.zip(e2).map { case (a, b) => a / b }
    val expected = ratio.indices.map { i =>
      if (i + 1 < 26) None else Some(ratio.slice(i - 25, i + 1).sum)
    }
    val out = Indicators(frame).mass_index().toDF
    check("mass_index_9_26", expected, out)
  }

  test("adx matches the loop (high-close TR quirk, SMA smoothing, Kleene head)") {
    // indicators.py:602-663: TR first term is high - close (same row,
    // not high - low); +/-DM gate a NULL first diff (Kleene -> null);
    // ALL smoothing is rolling_mean(14), not Wilder's EWM.
    val C = closes
    val tr = C.indices.map { i =>
      if (i == 0) H(0) - C(0) // max_horizontal skips the null shift terms
      else Seq(H(i) - C(i), math.abs(H(i) - C(i - 1)), math.abs(L(i) - C(i - 1))).max
    }
    val dmP = C.indices.map { i =>
      if (i == 0) None else Some(if (H(i) - H(i - 1) > 0) H(i) - H(i - 1) else 0.0)
    }
    val dmM = C.indices.map { i =>
      if (i == 0) None else Some(if (L(i - 1) - L(i) > 0) L(i - 1) - L(i) else 0.0)
    }
    val sTr = rollMeanRef(tr.map(Some(_)), 14)
    val sP = rollMeanRef(dmP, 14)
    val sM = rollMeanRef(dmM, 14)
    val diP = sP.zip(sTr).map { case (p, t) => for { a <- p; b <- t } yield a / b * 100 }
    val diM = sM.zip(sTr).map { case (p, t) => for { a <- p; b <- t } yield a / b * 100 }
    val dx = diP.zip(diM).map {
      case (Some(p), Some(m)) => Some(math.abs(p - m) / (p + m) * 100)
      case _ => None
    }
    val expected = rollMeanRef(dx, 14)
    val out = Indicators(frame).adx().toDF
    check("adx", expected, out)
  }

  test("nvi matches the gated-global-cumsum loop (Kleene head)") {
    // indicators.py:943-956: cum_sum of pct-change computed over the
    // WHOLE column, then gated per row by volume < prev volume (the
    // reference quirk — not the standard recursive NVI); head row's
    // null comparison stays null.
    val vols = Vector.tabulate(40)(i => 100.0 * (1 + i % 3)) // decreases at i%3==0
    val cs = closes.take(40)
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val rows = cs.zipWithIndex.map { case (c, i) =>
      Row("x", new java.sql.Timestamp(i * 3600L * 1000), c, c + 1, c - 1, c, vols(i))
    }
    val custom = spark.createDataFrame(rows.asJava, barsSchema)
    val pct = cs.indices.map(i => if (i == 0) None else Some(cs(i) / cs(i - 1) - 1))
    val cum = pct.scanLeft(0.0)((acc, p) => acc + p.getOrElse(0.0)).tail
    val expected = cs.indices.map { i =>
      if (i == 0) None // volume.shift null -> Kleene null
      else if (vols(i) < vols(i - 1)) Some(cum(i))
      else Some(0.0)
    }
    val out = Indicators(custom).negative_volume_index().toDF
    check("nvi", expected, out)
  }

  test("cci matches the mean-deviation loop (uppercase CCI name)") {
    // indicators.py:672-703: tp, SMA(tp, 14), rolling_mean(|tp - sma|, 14),
    // (tp - sma) / (0.015 * mean_dev). Note mean_dev uses the CURRENT
    // row's sma inside each window element (as written: |tp_j - sma_j|).
    val C = closes
    val tp = C.indices.map(i => (H(i) + L(i) + C(i)) / 3)
    val sma = rollMeanRef(tp.map(Some(_)), 14)
    val dev = tp.indices.map(i => sma(i).map(s => math.abs(tp(i) - s)))
    val meanDev = rollMeanRef(dev, 14)
    val expected = tp.indices.map { i =>
      for { s <- sma(i); d <- meanDev(i) } yield (tp(i) - s) / (0.015 * d)
    }
    val out = Indicators(frame).cci().toDF
    check("CCI", expected, out)
  }

  test("vortex matches the rolling-sum loop (+VI/-VI)") {
    // indicators.py:824-853: TR = max_h(h-l, |h-c1|, |l-c1|) (skips the
    // null shift terms on row 0); VM+ = |h - l.shift|, VM- = |l - h.shift|
    // (null on row 0); rolling_sum(14) of each; VI = VM_sum / TR_sum.
    val C = closes
    def rollSum(xs: Seq[Option[Double]], n: Int): Seq[Option[Double]] =
      rollMeanRef(xs, n).map(_.map(_ * n))
    val tr = C.indices.map { i =>
      if (i == 0) Some(H(0) - L(0))
      else Some(Seq(H(i) - L(i), math.abs(H(i) - C(i - 1)), math.abs(L(i) - C(i - 1))).max)
    }
    val vmP = C.indices.map(i => if (i == 0) None else Some(math.abs(H(i) - L(i - 1))))
    val vmM = C.indices.map(i => if (i == 0) None else Some(math.abs(L(i) - H(i - 1))))
    val trS = rollSum(tr, 14)
    val expectedP = rollSum(vmP, 14).zip(trS).map { case (v, t) =>
      for { a <- v; b <- t } yield a / b
    }
    val expectedM = rollSum(vmM, 14).zip(trS).map { case (v, t) =>
      for { a <- v; b <- t } yield a / b
    }
    val out = Indicators(frame).vortex().toDF
    check("+VI", expectedP, out)
    check("-VI", expectedM, out)
  }

  test("chaikin money flow matches the ratio-of-rolling-sums loop") {
    // indicators.py:1041-1059: ((c-l-(h-c))/(h-l) * v) rolling_sum /
    // v rolling_sum, both window 14.
    val C = closes
    def rollSum(xs: Seq[Option[Double]], n: Int): Seq[Option[Double]] =
      rollMeanRef(xs, n).map(_.map(_ * n))
    val mfv = C.indices.map(i =>
      Some((C(i) - L(i) - (H(i) - C(i))) / (H(i) - L(i)) * V(i)))
    val volS = rollSum(V.map(Some(_)), 14)
    val expected = rollSum(mfv, 14).zip(volS).map { case (m, v) =>
      for { a <- m; b <- v } yield a / b
    }
    val out = Indicators(frame).chaikin_money_flow().toDF
    check("cmf_14", expected, out)
  }

  test("dpo matches the shifted-SMA loop") {
    // indicators.py:1086-1105: close - rolling_mean(close, 20).shift(11)
    // (offset = look_back/2 + 1).
    val sma = rollMeanRef(closes.map(Some(_)), 20)
    val expected = closes.indices.map { i =>
      if (i < 11) None else sma(i - 11).map(closes(i) - _)
    }
    val out = Indicators(frame).dpo(Seq("close")).toDF
    check("close_dpo_20", expected, out)
  }

  test("obv matches the gated-direction cumsum loop (Kleene head)") {
    // indicators.py:754-772: direction = sign(close.diff()) via nested
    // when (null head stays null), cum_sum of direction * volume.
    val C = closes
    val expected = C.indices.map { i =>
      if (i == 0) None
      else Some((1 to i).map { j =>
        val d = C(j) - C(j - 1)
        (if (d > 0) 1.0 else if (d < 0) -1.0 else 0.0) * V(j)
      }.sum)
    }
    val out = Indicators(frame).obv().toDF
    check("obv", expected, out)
  }

  test("vpt matches the pct-change cumsum loop") {
    // indicators.py:737-752: cum_sum(pct_change(close) * volume).
    val C = closes
    val expected = C.indices.map { i =>
      if (i == 0) None
      else Some((1 to i).map(j => (C(j) / C(j - 1) - 1) * V(j)).sum)
    }
    val out = Indicators(frame).vpt().toDF
    check("vpt", expected, out)
  }

  test("force index, roc and the returns family match their loops") {
    val C = closes
    val fi = C.indices.map(i => if (i == 0) None else Some((C(i) - C(i - 1)) * V(i)))
    val roc = C.indices.map(i =>
      if (i < 10) None else Some((C(i) - C(i - 10)) / C(i - 10) * 100))
    val dr = C.indices.map(i =>
      if (i == 0) None else Some((C(i) - C(i - 1)) / C(i - 1) * 100))
    val dlr = C.indices.map(i =>
      if (i == 0) None else Some(math.log(C(i) / C(i - 1))))
    // cumulative_returns quirk (indicators.py:985-1001): the +1 is
    // applied to the PERCENT daily return (x100), then cum_prod.
    val cr = C.indices.map { i =>
      if (i == 0) None
      else Some((1 to i).map(j => (C(j) - C(j - 1)) / C(j - 1) * 100 + 1).product)
    }
    val out = Indicators(frame)
      .force_index().roc(Seq("close")).daily_return(Seq("close"))
      .daily_log_return(Seq("close")).cumulative_returns(Seq("close"))
      .toDF
    check("force_index", fi, out)
    check("close_roc_10", roc, out)
    check("close_daily_return", dr, out)
    check("close_daily_log_return", dlr, out)
    check("close_cumulative_return", cr, out)
  }

  test("atr matches the rolling-mean-of-TR loop") {
    // indicators.py:530-556: TR = max_h(h-l, |h-c1|, |l-c1|), SMA(14)
    // — max_horizontal skips the null shift terms on row 0.
    val C = closes
    val tr = C.indices.map { i =>
      if (i == 0) Some(H(0) - L(0))
      else Some(Seq(H(i) - L(i), math.abs(H(i) - C(i - 1)), math.abs(L(i) - C(i - 1))).max)
    }
    val out = Indicators(frame).atr().toDF
    check("atr", rollMeanRef(tr, 14), out)
  }

  test("ppo and pvo match the chained-EMA loops (line, signal, histogram)") {
    // indicators.py:395-470: line = (ema12-ema26)/ema26*100, signal =
    // ema(line, 9), histogram = line - signal; same on volume for pvo.
    def triple(xs: Vector[Double]) = {
      val line = emaRef(xs, 12).zip(emaRef(xs, 26)).map { case (s, l) => (s - l) / l * 100 }
      val signal = emaRef(line, 9)
      (line, signal, line.zip(signal).map { case (a, b) => a - b })
    }
    val (pl_, ps, ph) = triple(closes)
    val (vl, vs, vh) = triple(V)
    val out = Indicators(frame).ppo().pvo().toDF
    check("ppo_12_26", pl_.map(Some(_)), out)
    check("ppo_signal_12_26", ps.map(Some(_)), out)
    check("ppo_histogram_12_26", ph.map(Some(_)), out)
    check("pvo_12_26", vl.map(Some(_)), out)
    check("pvo_signal_12_26", vs.map(Some(_)), out)
    check("pvo_histogram_12_26", vh.map(Some(_)), out)
  }

  test("donchian channel matches the staged-intent loop") {
    // indicators.py:981-1003 (BROKEN in the reference: mid references
    // same-projection columns; the staged intent): rolling max/min(20)
    // and their midpoint.
    val up = closes.indices.map(i =>
      if (i < 19) None else Some(H.slice(i - 19, i + 1).max))
    val lo = closes.indices.map(i =>
      if (i < 19) None else Some(L.slice(i - 19, i + 1).min))
    val mid = up.zip(lo).map { case (u, l) => for { a <- u; b <- l } yield (a + b) / 2 }
    val out = Indicators(frame).donchian_channel().toDF
    check("donchian_upper_20", up, out)
    check("donchian_lower_20", lo, out)
    check("donchian_mid_20", mid, out)
  }

  test("aroon matches the dead-code-intent loop") {
    // indicators.py:1005-1039 (dead rolling_apply code):
    // 100 * (n - (len - argmax)) / n over a trailing 14 window.
    val n = 14
    def aroonOf(xs: Vector[Double], maximize: Boolean): Seq[Option[Double]] =
      xs.indices.map { i =>
        if (i < n - 1) None
        else {
          val w = xs.slice(i - n + 1, i + 1)
          val target = if (maximize) w.max else w.min
          val jRel = w.lastIndexOf(target) // ties -> most recent extreme
          val since = (n - 1 - jRel) + 1
          Some(100.0 * (n - since) / n)
        }
      }
    val out = Indicators(frame).aroon().toDF
    check("aroon_up_14", aroonOf(H, maximize = true), out)
    check("aroon_down_14", aroonOf(L, maximize = false), out)
  }

  test("mfi matches the money-flow-ratio loop (Kleene head)") {
    // indicators.py (stub intent, engine Scaladoc): tp = (h+l+c)/3;
    // pmf/nmf gate on tp vs prev tp (null head -> null), MFI =
    // 100 - 100/(1 + sum(pmf,14)/sum(nmf,14)).
    val C = closes
    val tp = C.indices.map(i => (H(i) + L(i) + C(i)) / 3)
    val pmf = C.indices.map(i =>
      if (i == 0) None else Some(if (tp(i) > tp(i - 1)) tp(i) * V(i) else 0.0))
    val nmf = C.indices.map(i =>
      if (i == 0) None else Some(if (tp(i) <= tp(i - 1)) tp(i) * V(i) else 0.0))
    def rollSum(xs: Seq[Option[Double]], n: Int): Seq[Option[Double]] =
      rollMeanRef(xs, n).map(_.map(_ * n))
    val expected = rollSum(pmf, 14).zip(rollSum(nmf, 14)).map { case (p, m) =>
      for { a <- p; b <- m } yield 100.0 - 100.0 / (1 + a / b)
    }
    val out = Indicators(frame).mfi().toDF
    check("MFI", expected, out)
  }

  test("adi matches the CLV-volume cumsum loop") {
    // indicators.py:1416-1439 (dead-code intent): cum_sum of
    // ((c-l-(h-c))/(h-l)) * volume, no nulls anywhere.
    val C = closes
    val clv = C.indices.map(i => (C(i) - L(i) - (H(i) - C(i))) / (H(i) - L(i)) * V(i))
    val expected = clv.scanLeft(0.0)(_ + _).tail.map(Some(_))
    val out = Indicators(frame).adi().toDF
    check("ADI", expected, out)
  }

  test("kst matches the weighted SMA-of-ROC loop") {
    // indicators.py:1280-1328 (dead-code intent): sum over i of
    // w_i * SMA(ROC(close, p_i), s_i) with p = (10,15,20,30),
    // s = (10,10,10,15), w = (1,2,3,4).
    val C = closes
    val ps = Seq(10, 15, 20, 30); val ss = Seq(10, 10, 10, 15); val ws = Seq(1, 2, 3, 4)
    val terms = ps.zip(ss).map { case (p, s) =>
      val roc = C.indices.map(i =>
        if (i < p) None else Some((C(i) - C(i - p)) / C(i - p) * 100))
      rollMeanRef(roc, s)
    }
    val expected = C.indices.map { i =>
      val vals = terms.zip(ws).map { case (t, w) => t(i).map(_ * w) }
      if (vals.exists(_.isEmpty)) None else Some(vals.flatten.sum)
    }
    val out = Indicators(frame).kst(Seq("close")).toDF
    check("close_kst", expected, out)
  }

  test("williams %R, wma, ulcer index, and awesome oscillator match their loops") {
    val C = closes
    def rollMax(xs: Vector[Double], n: Int, i: Int): Option[Double] =
      if (i < n - 1) None else Some(xs.slice(i - n + 1, i + 1).max)
    def rollMin(xs: Vector[Double], n: Int, i: Int): Option[Double] =
      if (i < n - 1) None else Some(xs.slice(i - n + 1, i + 1).min)
    // williams_ri (indicators.py:900-926):
    // (rollmax(h,14) - c) / (rollmax(h,14) - rollmin(l,14)) * -100
    val wr = C.indices.map { i =>
      for { mx <- rollMax(H, 14, i); mn <- rollMin(L, 14, i) }
        yield (mx - C(i)) / (mx - mn) * -100
    }
    // wma (stub intent): dot(x, n..1 weights) / (n(n+1)/2), window 10
    val wma = C.indices.map { i =>
      if (i < 9) None
      else Some((0 until 10).map(k => C(i - k) * (10 - k)).sum / 55.0)
    }
    // unlcer_index (broken pl.col(col/...) -> evident intent):
    // sqrt(rolling_mean((c/rollmax(c,14) - 1)^2, 14))
    val dd = C.indices.map(i => rollMax(C, 14, i).map(m => math.pow(C(i) / m - 1, 2)))
    val ulcer = rollMeanRef(dd, 14).map(_.map(math.sqrt))
    // awesome_oscillator: SMA(mid,5) - SMA(mid,34), mid = (h+l)/2
    val mid = C.indices.map(i => Some((H(i) + L(i)) / 2)).toVector
    val ao = rollMeanRef(mid, 5).zip(rollMeanRef(mid, 34)).map { case (s, l) =>
      for { a <- s; b <- l } yield a - b
    }
    val out = Indicators(frame)
      .williams_ri().wma(Seq("close"), 10).unlcer_index(Seq("close"))
      .awesome_oscillator().toDF
    check("williams_%r_14", wr, out)
    check("close_wma_10", wma, out)
    check("close_ulcer_index_14", ulcer, out)
    check("ao_5_34", ao, out)
  }

  test("stochastic rsi and stc match their normalized-range loops") {
    val C = closes
    def rollMinOpt(xs: Seq[Option[Double]], n: Int): Seq[Option[Double]] =
      xs.indices.map { i =>
        if (i + 1 < n) None
        else {
          val w = xs.slice(i - n + 1, i + 1)
          if (w.exists(_.isEmpty)) None else Some(w.flatten.min)
        }
      }
    def rollMaxOpt(xs: Seq[Option[Double]], n: Int): Seq[Option[Double]] =
      xs.indices.map { i =>
        if (i + 1 < n) None
        else {
          val w = xs.slice(i - n + 1, i + 1)
          if (w.exists(_.isEmpty)) None else Some(w.flatten.max)
        }
      }
    // stochastic_rsi (BROKEN in the reference -> corrected intent,
    // SURVEY Q7): rsi per the reference loop (SMA smoothing, Kleene
    // head), then (r - rollmin(r,14)) / (rollmax - rollmin).
    val gain = C.indices.map(i =>
      if (i == 0) None else Some(math.max(C(i) - C(i - 1), 0.0)))
    val loss = C.indices.map(i =>
      if (i == 0) None else Some(math.max(C(i - 1) - C(i), 0.0)))
    val rsi = rollMeanRef(gain, 14).zip(rollMeanRef(loss, 14)).map { case (g_, l) =>
      for { a <- g_; b <- l } yield 100.0 - 100.0 / (1 + a / b)
    }
    val srsi = rsi.indices.map { i =>
      for { r <- rsi(i); lo <- rollMinOpt(rsi, 14)(i); hi <- rollMaxOpt(rsi, 14)(i) }
        yield (r - lo) / (hi - lo)
    }
    // stc (dead-code intent): macd line on adjust=TRUE EWMs, then the
    // stochastic normalization over a 10 window, x100.
    val ml = ewmAdjRef(C, 12).zip(ewmAdjRef(C, 26)).map { case (f, s) => f - s }
    val mlOpt = ml.map(Some(_))
    val stc = ml.indices.map { i =>
      for { lo <- rollMinOpt(mlOpt, 10)(i); hi <- rollMaxOpt(mlOpt, 10)(i) }
        yield (ml(i) - lo) / (hi - lo) * 100
    }
    val out = Indicators(frame).stochastic_rsi(Seq("close")).stc(Seq("close")).toDF
    check("close_stoch_rsi_14_14", srsi, out)
    check("close_stc_12_26_10", stc, out)
  }

  test("ease of movement matches the unscaled quirk loop") {
    // indicators.py:1124-1141: (h + l - h.shift - l.shift) / volume —
    // no box-ratio scaling, no rolling mean (the reference quirk).
    val expected = closes.indices.map { i =>
      if (i == 0) None else Some((H(i) + L(i) - H(i - 1) - L(i - 1)) / V(i))
    }
    val out = Indicators(frame).ease_of_movement().toDF
    check("ease_of_movement", expected, out)
  }
}
