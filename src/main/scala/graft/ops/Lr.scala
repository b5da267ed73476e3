package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge
import graft.util.{GQuery, Tables}

/** Distributed linear quality classifier — the "model-based filter"
  * step of an LLM data pipeline (a fastText/logistic-regression-style
  * scorer trained on labeled examples, then run over the corpus to
  * keep/drop documents; the CCNet → LLaMA lineage of quality filters).
  * Here the trainable kernel itself is the operator: full-batch
  * gradient descent for a linear classifier with a HARD sigmoid,
  * carried out in exact BIGINT fixed-point so every iteration replays
  * bit-for-bit in the DuckDB oracle — the first oracle-checked
  * TRAINING loop in the suite (k-means covers one unsupervised step;
  * this is supervised end to end: init → T updates → scoring).
  *
  * Why a hard sigmoid (σ(z) = clamp(½ + z/4, 0, 1)): the logistic
  * exp/(1+exp) would drag libm's `exp` into the update rule, and exp
  * is NOT correctly rounded — JVM StrictMath vs DuckDB's libm can
  * differ in the last ulp, which a threshold then amplifies into a
  * flipped row (the exact cross-engine bug class the floor-micro-unit
  * discipline exists to kill). The hard sigmoid is two comparisons and
  * one integer division — same gradient structure (p − y), exact in
  * fixed point, and a standard trick from binarized/quantized training.
  *
  * Fixed-point contract (all BIGINT, floor division throughout):
  *   x_qj = floor(x_j · 1e6)                 micro-unit features
  *   m_i  = Σ_j w_j · x_qij                  w in micro ⇒ m in 1e-12
  *   p_i  = clamp(5e5 + ⌊m_i / 4e6⌋, 0, 1e6) hard sigmoid, micro
  *   r_i  = p_i − 1e6·y_i                    signed residual, micro
  *   G_j  = Σ_i ⌊r_i · x_qij / 1e6⌋          gradient sum, micro
  *   w_j ← w_j − ⌊G_j / 2n⌋                  η = ½ on the MEAN gradient
  * Floor division on signed values is pinned to mathematical floor via
  * (a − pmod(a,b)) DIV b — pmod is nonnegative, the adjusted numerator
  * divides exactly, so Spark's truncating DIV and DuckDB's flooring //
  * agree. No double ever enters the loop; doubles appear only in the
  * one-way feature quantization (same parquet float → double cast both
  * engines) and the final rendering columns.
  *
  * int64 overflow bound (Spark non-ANSI wraps silently where DuckDB
  * raises, so the bound must be proven, not hoped): each gradient term
  * ⌊r·x_q/1e6⌋ has |term| ≤ |x_q| because |r| ≤ 1e6, so
  * |G_j| ≤ n · max|x_q| = n · 1e6 · max|x|. With features bounded
  * |x| ≤ 8 (these embeddings are unit-scale; components ≪ 1) the sum
  * stays inside int64 (9.22e18) for n up to ~1.1e12 rows — three
  * orders past the 1e9-document corpora this targets. Margins are
  * smaller: |m_i| ≤ dim · max|w| · max|x_q|, and |w| stays ≤ 1e6·η·T
  * micro for T iterations. Past 1e12 rows, shard the corpus and
  * average per-shard gradients.
  *
  * Scale shape (the point): one pass over the corpus PER ITERATION —
  * margins are map-only (the weight vector is a literal array, no join,
  * no shuffle), the gradient is one partial-agg'd groupBy on the
  * DIMENSION (64 keys, integer sums combine map-side), and the driver
  * holds only the dim-sized model between iterations (the same
  * driver-owns-the-model shape as MLlib's gradient loops; the collect
  * is `dim` rows — model-bounded metadata, not data). At 100 TB each
  * epoch is a single scan + a 64-key shuffle; nothing grows with n.
  * Reference analogue: the fraud-flag enrichment is a hand-written rule
  * (transaction_producer.py:36-38 `is_fraud`); this is the learned
  * version of that gate.
  */
object Lr {

  /** Mathematical floor division as a Column — see the contract above.
    * The IntegralDivide keeps the whole computation in BIGINT (a
    * double-typed `/` would silently lose ulps past 2^53, which a
    * 1e12-row gradient sum can reach).
    */
  private[ops] def fdiv(a: Column, b: Column): Column =
    Bridge.column(new IntegralDivide(
      Bridge.expression(a - pmod(a, b)), Bridge.expression(b)))

  /** (id, y ∈ {0,1}, xq array<long> micro-units) from the embeddings
    * table; binary label = (label ≥ `labelGe`).
    */
  private def quantized(emb: DataFrame, idCol: String, vecCol: String,
                        labelCol: String, labelGe: Int): DataFrame =
    emb.select(col(idCol).as("id"),
      (col(labelCol) >= labelGe).cast("int").as("y"),
      transform(col(vecCol),
        x => floor(x.cast("double") * 1e6).cast("long")).as("xq"))

  /** Margin + hard-sigmoid probability columns for a literal weight
    * vector (map-only — this is the whole scoring pass).
    */
  private def scoreCols(x: DataFrame, w: Array[Long]): DataFrame = {
    val wCol = array(w.map(lit(_)): _*)
    x.withColumn("margin_u",
        aggregate(zip_with(col("xq"), wCol, (a, b) => a * b),
          lit(0L), (acc, t) => acc + t))
      .withColumn("p_u",
        least(greatest(lit(500000L) + fdiv(col("margin_u"), lit(4000000L)),
          lit(0L)), lit(1000000L)))
  }

  /** T full-batch GD iterations; returns the micro-unit weight vector.
    * Each iteration is one distributed pass (margins map-side, gradient
    * a dim-key partial agg); the two up-front jobs (n, dim) and the
    * per-iteration dim-row collect are model-sized, never data-sized.
    */
  private[graft] def fit(x: DataFrame, iters: Int): Array[Long] = {
    val n = x.count()
    require(n > 0, "cannot fit on an empty dataset")
    // Uniform-length contract: scoreCols zips against a dim-length
    // literal, and zip_with null-pads a shorter vector (margin goes
    // NULL) while the oracle's posexplode+join just sums fewer terms —
    // a silent cross-engine divergence. Refuse ragged input outright.
    val dims = x.select(size(col("xq")).as("d"))
      .agg(min(col("d")).as("lo"), max(col("d")).as("hi")).first
    val (lo, dim) = (dims.getInt(0), dims.getInt(1))
    require(lo == dim,
      s"ragged embedding lengths: min=$lo max=$dim — fit requires uniform dim")
    val w = Array.fill(dim)(0L)
    for (_ <- 1 to iters) {
      val grads = scoreCols(x, w)
        .select((col("p_u") - col("y") * 1000000L).as("r"),
          posexplode(col("xq")).as(Seq("j", "xv")))
        .groupBy(col("j"))
        .agg(sum(fdiv(col("r") * col("xv"), lit(1000000L))).as("gj"))
        .collect()
      grads.foreach { row =>
        val j = row.getInt(0)
        w(j) = w(j) - Math.floorDiv(row.getLong(1), 2L * n)
      }
    }
    w
  }

  /** Train and emit the model: (j, w_u micro-units, weight rendering). */
  def train(spark: SparkSession, emb: DataFrame, idCol: String,
            vecCol: String, labelCol: String, labelGe: Int,
            iters: Int): DataFrame = {
    val w = fit(quantized(emb, idCol, vecCol, labelCol, labelGe), iters)
    import spark.implicits._
    w.zipWithIndex
      .map { case (wu, j) => (j, wu, wu.toDouble / 1e6) }
      .toSeq.toDF("j", "w_u", "weight")
  }

  /** Train, then score every vector: margin, hard-sigmoid probability,
    * predicted class (p ≥ ½), true label — the corpus-filter pass.
    */
  def trainAndScore(emb: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, labelGe: Int, iters: Int): DataFrame = {
    val x = quantized(emb, idCol, vecCol, labelCol, labelGe)
    val w = fit(x, iters)
    scoreCols(x, w)
      .select(col("id").as("vec_id"), col("y"), col("margin_u"), col("p_u"),
        (col("p_u") >= 500000L).cast("int").as("pred"),
        (col("p_u").cast("double") / 1e6).as("score"))
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB floor division on signed BIGINTs — the portable twin of
    * [[fdiv]] (`%` in DuckDB is C-signed; the double-mod makes it a
    * pmod, after which `//` on the exactly-divisible numerator is
    * mathematical floor).
    */
  private def fd(a: String, b: String): String =
    s"((($a) - (((($a) % ($b)) + ($b)) % ($b))) // ($b))"

  /** Unrolled training CTEs `x, nn, g1, w1, m2, p2, g2, w2, …, w$iters`
    * — the PageRank staging pattern; iteration 1 exploits w0 = 0
    * (margin 0 ⇒ p = 5e5 exactly).
    */
  private def fitCtes(iters: Int): String = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val head = Seq(
      s"""x AS (
        SELECT vec_id, CAST(label >= 5 AS INT) AS y, CAST(g.i - 1 AS INT) AS j,
          CAST(floor(CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) * 1e6)
            AS BIGINT) AS xq
        FROM embeddings,
          LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g)""",
      "nn AS (SELECT count(*) AS n FROM embeddings)",
      s"""g1 AS (
        SELECT j, SUM(${fd("(500000 - 1000000*y) * xq", "1000000")}) AS gj
        FROM x GROUP BY j)""",
      s"""w1 AS (SELECT j, 0 - (${fd("gj", "2*nn.n")}) AS w FROM g1, nn)""")
    val later = (2 to iters).map { k =>
      s"""m$k AS (
            SELECT x.vec_id, x.y, SUM(w.w * x.xq) AS m
            FROM x JOIN w${k - 1} w USING (j) GROUP BY x.vec_id, x.y),
          p$k AS (
            SELECT vec_id, y,
              LEAST(GREATEST(500000 + ${fd("m", "4000000")}, 0), 1000000) AS p
            FROM m$k),
          g$k AS (
            SELECT x.j, SUM(${fd("(p.p - 1000000*x.y) * x.xq", "1000000")}) AS gj
            FROM x JOIN p$k p USING (vec_id) GROUP BY x.j),
          w$k AS (
            SELECT w.j, w.w - (${fd("g.gj", "2*nn.n")}) AS w
            FROM w${k - 1} w JOIN g$k g USING (j), nn)"""
    }
    (head ++ later).mkString(",\n      ")
  }

  /** Test hook: expose the CTE generator so specs can pin its shape. */
  private[graft] def fitCtesForTest(iters: Int): String = fitCtes(iters)

  val Iters = 3

  /** Calibration shares the scorer's fit — on this near-orthogonal
    * corpus longer training does not spread the hard-sigmoid deciles
    * (measured at 8 iters: same two occupied bins), so the readout
    * reports the 2-bin reliability split with its monotone positive
    * rate rather than paying extra passes for nothing.
    */
  val CalIters = Iters

  val queries: Seq[GQuery] = Seq(
    GQuery("embed_lr_train",
      (s, d) => train(s, Tables(s, d, "embeddings"), "vec_id", "embedding",
        "label", labelGe = 5, iters = Iters).orderBy(col("j")),
      Some(s"""WITH ${fitCtes(Iters)}
        SELECT j, CAST(w AS BIGINT) AS w_u, CAST(w AS DOUBLE) / 1e6 AS weight
        FROM w$Iters ORDER BY j""")),

    GQuery("embed_lr_score",
      (s, d) => trainAndScore(Tables(s, d, "embeddings"), "vec_id",
        "embedding", "label", labelGe = 5, iters = Iters)
        .orderBy(col("vec_id")),
      Some(s"""WITH ${fitCtes(Iters)},
        mf AS (
          SELECT x.vec_id, x.y, SUM(w.w * x.xq) AS m
          FROM x JOIN w$Iters w USING (j) GROUP BY x.vec_id, x.y)
        SELECT vec_id, y, CAST(m AS BIGINT) AS margin_u,
          CAST(LEAST(GREATEST(500000 + ${fd("m", "4000000")}, 0), 1000000)
            AS BIGINT) AS p_u,
          CAST(LEAST(GREATEST(500000 + ${fd("m", "4000000")}, 0), 1000000)
            >= 500000 AS INT) AS pred,
          CAST(LEAST(GREATEST(500000 + ${fd("m", "4000000")}, 0), 1000000)
            AS DOUBLE) / 1e6 AS score
        FROM mf ORDER BY vec_id""")),

    // Discrimination readout: AUC via the tie-corrected rank-sum
    // (Mann–Whitney U) — the metric a quality-filter threshold is
    // tuned against; calibration bins without AUC can't tell a sharp
    // scorer from a constant one. Shape: one ≤|distinct p_u|-key
    // partial-agg groupBy (scores are integer micro-units, so at most
    // 1e6+1 groups REGARDLESS of corpus size), then a window over the
    // score GROUPS (bounded, never the data) for the cumulative
    // negative count, then one scalar agg. Exact integers end to end:
    // 2·AUC·n1·n0 = Σ_s n1(s)·(2·cum0(s) + n0(s)) handles ties as the
    // ½-credit average rank without ever leaving BIGINT; the one
    // double division is IEEE-exact on both engines.
    GQuery("embed_lr_auc",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val scored = trainAndScore(Tables(s, d, "embeddings"), "vec_id",
          "embedding", "label", labelGe = 5, iters = Iters)
        val grp = scored.groupBy(col("p_u"))
          .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("n1"))
          .withColumn("n0", col("n") - col("n1"))
        val w = Window.orderBy(col("p_u"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val cum = grp.withColumn("cum0",
          coalesce(sum(col("n0")).over(w), lit(0L)))
        cum.agg(
            sum(col("n1")).as("n_pos"),
            sum(col("n0")).as("n_neg"),
            sum(col("n1") * (lit(2L) * col("cum0") + col("n0")))
              .as("auc_num2"))
          .select(col("n_pos"), col("n_neg"), col("auc_num2"),
            (lit(2L) * col("n_pos") * col("n_neg")).as("auc_den2"),
            (floor(col("auc_num2").cast("double")
                / (lit(2L) * col("n_pos") * col("n_neg")).cast("double")
                * 1e6) / lit(1e6)).as("auc"))
      },
      Some(s"""WITH ${fitCtes(Iters)},
        mf AS (
          SELECT x.vec_id, x.y, SUM(w.w * x.xq) AS m
          FROM x JOIN w$Iters w USING (j) GROUP BY x.vec_id, x.y),
        sc AS (
          SELECT y, CAST(LEAST(GREATEST(500000 + ${fd("m", "4000000")},
            0), 1000000) AS BIGINT) AS p_u
          FROM mf),
        g AS (
          SELECT p_u, count(*) AS n, CAST(sum(y) AS BIGINT) AS n1
          FROM sc GROUP BY 1),
        c AS (
          SELECT p_u, n1, n - n1 AS n0,
            CAST(COALESCE(SUM(n - n1) OVER (ORDER BY p_u
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum0
          FROM g)
        SELECT CAST(sum(n1) AS BIGINT) AS n_pos,
          CAST(sum(n0) AS BIGINT) AS n_neg,
          CAST(sum(n1 * (2 * cum0 + n0)) AS BIGINT) AS auc_num2,
          CAST(2 * sum(n1) * sum(n0) AS BIGINT) AS auc_den2,
          floor(CAST(sum(n1 * (2 * cum0 + n0)) AS DOUBLE)
            / CAST(2 * sum(n1) * sum(n0) AS DOUBLE) * 1e6) / 1e6 AS auc
        FROM c""")),

    // Calibration readout (reliability-diagram bins): decile-bucket the
    // hard-sigmoid probability and report per-bin count, positives, and
    // the exact micro-unit mean score — how a scorer's threshold gets
    // picked in practice. Bin edges are integer micro-unit floors
    // (p_u = 1e6 lands in bin 9, not a phantom bin 10); one partial-agg
    // groupBy on ≤10 keys.
    GQuery("embed_lr_calibration",
      (s, d) => trainAndScore(Tables(s, d, "embeddings"), "vec_id",
          "embedding", "label", labelGe = 5, iters = CalIters)
        .withColumn("bin",
          least(floor(col("p_u") / 100000L), lit(9L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("y")).cast("long").as("n_pos"),
          sum(col("p_u")).as("sum_p_u"))
        .orderBy(col("bin")),
      Some(s"""WITH ${fitCtes(CalIters)},
        mf AS (
          SELECT x.vec_id, x.y, SUM(w.w * x.xq) AS m
          FROM x JOIN w$CalIters w USING (j) GROUP BY x.vec_id, x.y),
        sc AS (
          SELECT y, CAST(LEAST(GREATEST(500000 + ${fd("m", "4000000")},
            0), 1000000) AS BIGINT) AS p_u
          FROM mf)
        SELECT LEAST(CAST(floor(p_u / 100000.0) AS BIGINT), 9) AS bin,
          count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
          CAST(sum(p_u) AS BIGINT) AS sum_p_u
        FROM sc GROUP BY 1 ORDER BY bin"""))
  )
}
