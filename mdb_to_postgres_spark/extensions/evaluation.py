"""Model-evaluation operators (SURVEY.md §2.9 cont.) — the metrics a
training-data pipeline computes over held-out scores: ranking AUC and the
thresholded confusion-matrix report.

Both are exact-integer formulations: ranks and confusion cells accumulate
as BIGINTs, every ratio is ONE final IEEE divide of exact integers, so the
metrics are bit-reproducible at any parallelism on both engines (the
agg_corr_exact discipline applied to sklearn.metrics).

Score/label come from the embeddings table: score = the vector's second
component (a fixed, data-derived stand-in for a model logit), truth =
label parity. No randomness anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import T


@query(
    "x_eval_auc",
    oracle="""
    WITH scored AS (
      SELECT embedding[2] AS score, label % 2 AS y FROM embeddings
    ),
    ranked AS (
      SELECT y,
             RANK() OVER (ORDER BY score) AS r,
             COUNT(*) OVER (PARTITION BY score) AS t
      FROM scored
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN y = 1 THEN 2 * r + t - 1 ELSE 0 END) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      FROM ranked
    )
    SELECT n_pos, n_neg,
           CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE) / (2 * n_pos * n_neg) AS auc
    FROM agg
    """,
)
def x_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC via the Mann-Whitney U rank statistic — the ranking-quality
    metric for quality-classifier scores in a data pipeline.

    Tie-safe without any float accumulation: with avg-rank = rank +
    (ties-1)/2, twice the positive rank sum is SUM(2*rank + ties - 1),
    an exact BIGINT; AUC = (S2 - n_pos*(n_pos+1)) / (2*n_pos*n_neg) is
    one final divide.

    The rank statistic needs NO per-row global rank: every row at score s
    shares rank(s) and tie-count t(s), so the corpus first collapses to
    one row per DISTINCT score (groupBy — map-side combine), and rank(s)
    = 1 + exclusive running count over the distinct scores, computed
    clustered (deterministic quantile buckets + ONE hash exchange + local
    window + literal offsets, functions/global_order.py). No single-partition pass over data ever
    happens — the only global window runs over P rows."""
    from ..functions.global_order import global_cumsum

    e = T(spark, sf_dir, "embeddings")
    scored = e.select(
        F.element_at("embedding", 2).alias("score"), (F.col("label") % 2).alias("y")
    )
    per_score = scored.groupBy("score").agg(
        F.count("*").alias("t"), F.sum("y").cast("bigint").alias("pos")
    )
    ranked = global_cumsum(
        per_score, [("score", "asc")], F.col("t"), "cum_before"
    ).select("pos", "t", (F.col("cum_before") + 1).alias("r"))
    agg = ranked.agg(
        F.sum(F.col("pos") * (2 * F.col("r") + F.col("t") - 1))
        .cast("bigint")
        .alias("s2"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("t") - F.col("pos")).cast("bigint").alias("n_neg"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        (
            (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg"))
        ).alias("auc"),
    )


@query(
    "x_eval_classifier_report",
    oracle="""
    WITH scored AS (
      SELECT embedding[2] > 0 AS pred, label % 2 = 1 AS y FROM embeddings
    ),
    cm AS (
      SELECT
        CAST(SUM(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN NOT pred AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN NOT pred AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           CAST(tp AS DOUBLE) / (tp + fp) AS precision_1,
           CAST(tp AS DOUBLE) / (tp + fn) AS recall_1,
           CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) AS f1_1,
           CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy
    FROM cm
    """,
)
def x_eval_classifier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded binary-classifier report: confusion matrix +
    precision/recall/F1/accuracy in one aggregation pass (prediction =
    score > 0 at a fixed operating point).

    The four cells are parallel conditional counts (map-side partials,
    four integers per partition on the shuffle); each metric is one
    divide of exact integers — F1 spelled 2tp/(2tp+fp+fn) so it too is a
    single IEEE op rather than a float composition of precision and
    recall. Scales as a single scan at any corpus size."""
    e = T(spark, sf_dir, "embeddings")
    scored = e.select(
        (F.element_at("embedding", 2) > 0).alias("pred"),
        (F.col("label") % 2 == 1).alias("y"),
    )
    cm = scored.agg(
        F.sum(F.when(F.col("pred") & F.col("y"), 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("y"), 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("y"), 1).otherwise(0)).cast("bigint").alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("y"), 1).otherwise(0)).cast("bigint").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        (tp.cast("double") / (tp + fp)).alias("precision_1"),
        (tp.cast("double") / (tp + fn)).alias("recall_1"),
        ((2 * tp).cast("double") / (2 * tp + fp + fn)).alias("f1_1"),
        ((tp + tn).cast("double") / (tp + fp + fn + tn)).alias("accuracy"),
    )


# NDCG discount table, 1e6-scaled integers: round(1e6 / log2(rank+1)).
# Literal constants shared by both engines, so the gain sum is an exact
# BIGINT dot product — no transcendental, no float-summation order.
_NDCG_DISC = [1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465, 301030, 289065]


@query(
    "x_eval_ndcg",
    oracle="""
    WITH ranked AS (
      SELECT label % 4 AS rel,
             ROW_NUMBER() OVER (ORDER BY embedding[3] DESC, vec_id) AS rnk
      FROM embeddings
    ),
    ideal AS (
      SELECT label % 4 AS rel,
             ROW_NUMBER() OVER (ORDER BY label % 4 DESC, vec_id) AS rnk
      FROM embeddings
    ),
    dcg AS (
      SELECT CAST(SUM(rel * ([1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465, 301030, 289065])[rnk]) AS BIGINT) AS dcg_scaled
      FROM ranked WHERE rnk <= 10
    ),
    idcg AS (
      SELECT CAST(SUM(rel * ([1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465, 301030, 289065])[rnk]) AS BIGINT) AS idcg_scaled
      FROM ideal WHERE rnk <= 10
    )
    SELECT dcg_scaled, idcg_scaled,
           CAST(dcg_scaled AS DOUBLE) / idcg_scaled AS ndcg_at_10
    FROM dcg, idcg
    """,
)
def x_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 (#62 cont.): the graded ranking metric for the retrieval
    tier — documents ranked by a score column, gains discounted by
    1/log2(rank+1), normalized by the ideal ordering.

    The discount table is baked as 1e6-scaled INTEGER literals shared by
    both engines, so DCG is an exact BIGINT dot product (sum order free)
    and NDCG is one final divide — the transcendental never executes at
    query time. The only full-data steps are two global top-10s, shipped
    as orderBy+limit so they plan as TakeOrderedAndProject (per-partition
    top-k partials merged on the driver — a row_number<=10 over a global
    Window would funnel the corpus through ONE task instead); ranks are
    then assigned on the 10 surviving rows. Relevance = label %% 4
    (graded), score = the third embedding component, ties broken by
    vec_id on both engines."""
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "embeddings")
    disc = F.array(*[F.lit(d) for d in _NDCG_DISC])
    by_score = [F.desc("score"), F.asc("vec_id")]
    ranked = (
        e.select(
            (F.col("label") % 4).alias("rel"),
            F.element_at("embedding", 3).alias("score"),
            "vec_id",
        )
        .orderBy(*by_score)
        .limit(10)
        .select("rel", F.row_number().over(Window.orderBy(*by_score)).alias("rnk"))
    )
    by_rel = [F.desc("rel"), F.asc("vec_id")]
    ideal = (
        e.select((F.col("label") % 4).alias("rel"), "vec_id")
        .orderBy(*by_rel)
        .limit(10)
        .select("rel", F.row_number().over(Window.orderBy(*by_rel)).alias("rnk"))
    )
    dcg = ranked.agg(
        F.sum(F.col("rel") * F.element_at(disc, F.col("rnk"))).cast("bigint").alias("dcg_scaled")
    )
    idcg = ideal.agg(
        F.sum(F.col("rel") * F.element_at(disc, F.col("rnk"))).cast("bigint").alias("idcg_scaled")
    )
    return dcg.crossJoin(F.broadcast(idcg)).select(
        "dcg_scaled",
        "idcg_scaled",
        (F.col("dcg_scaled").cast("double") / F.col("idcg_scaled")).alias("ndcg_at_10"),
    )


@query(
    "x_eval_regression_report",
    oracle="""
    WITH pv AS (
      SELECT CAST(embedding[5] AS DOUBLE) AS y,
             CAST(embedding[6] AS DOUBLE) AS yhat
      FROM embeddings
    ),
    terms AS (
      SELECT y, yhat,
             CAST(ROUND(ABS(y - yhat), 12) AS DECIMAL(28,15)) AS ae,
             CAST(ROUND((y - yhat) * (y - yhat), 12) AS DECIMAL(28,15)) AS se,
             CAST(ROUND(y, 12) AS DECIMAL(28,15)) AS yd,
             CAST(ROUND(y * y, 12) AS DECIMAL(28,15)) AS yy
      FROM pv
    )
    SELECT COUNT(*) AS n,
           CAST(SUM(ae) AS DOUBLE) / COUNT(*) AS mae,
           SQRT(CAST(SUM(se) AS DOUBLE) / COUNT(*)) AS rmse,
           1.0 - CAST(SUM(se) AS DOUBLE)
             / (CAST(SUM(yy) AS DOUBLE)
                - CAST(SUM(yd) AS DOUBLE) * CAST(SUM(yd) AS DOUBLE) / COUNT(*)) AS r2
    FROM terms
    """,
)
def x_eval_regression_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-eval report (#62 cont.): MAE / RMSE / R² between a
    prediction column and its target — completing the eval triad
    beside classification (x_eval_classifier_report / AUC) and ranking
    (NDCG); here target and prediction are two fixed embedding
    components standing in for (label, model output).

    Absolute/squared errors are per-row ROUNDed then accumulated as
    exact DECIMAL (the MI discipline: float partial-sum order never
    reaches the metric), R² is the centered-moment identity over the
    same decimal sums, and RMSE/R² finish as fixed IEEE epilogues. One
    scan, map-side partials, 1-row output at any corpus size."""
    e = T(spark, sf_dir, "embeddings")
    pv = e.select(
        F.element_at("embedding", 5).cast("double").alias("y"),
        F.element_at("embedding", 6).cast("double").alias("yhat"),
    )
    terms = pv.select(
        F.round(F.abs(F.col("y") - F.col("yhat")), 12).cast("decimal(28,15)").alias("ae"),
        F.round((F.col("y") - F.col("yhat")) * (F.col("y") - F.col("yhat")), 12)
        .cast("decimal(28,15)")
        .alias("se"),
        F.round(F.col("y"), 12).cast("decimal(28,15)").alias("yd"),
        F.round(F.col("y") * F.col("y"), 12).cast("decimal(28,15)").alias("yy"),
    )
    n = F.count("*")
    return terms.agg(
        n.alias("n"),
        (F.sum("ae").cast("double") / n).alias("mae"),
        F.sqrt(F.sum("se").cast("double") / n).alias("rmse"),
        (
            F.lit(1.0)
            - F.sum("se").cast("double")
            / (
                F.sum("yy").cast("double")
                - F.sum("yd").cast("double") * F.sum("yd").cast("double") / n
            )
        ).alias("r2"),
    )


@query(
    "x_eval_decile_lift",
    oracle="""
    WITH scored AS (
      SELECT embedding[2] AS score, label % 2 AS y, vec_id FROM embeddings
    ),
    ranked AS (
      SELECT y, NTILE(10) OVER (ORDER BY score DESC, vec_id) AS decile
      FROM scored
    ),
    overall AS (
      SELECT CAST(SUM(y) AS BIGINT) AS tot_pos, COUNT(*) AS tot FROM ranked
    )
    SELECT decile,
           COUNT(*) AS n,
           CAST(SUM(y) AS BIGINT) AS positives,
           CAST(SUM(y) AS DOUBLE) / COUNT(*) AS response_rate,
           (CAST(SUM(y) AS DOUBLE) / COUNT(*))
             / (CAST(o.tot_pos AS DOUBLE) / o.tot) AS lift
    FROM ranked CROSS JOIN overall o
    GROUP BY decile, o.tot_pos, o.tot
    """,
)
def x_eval_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table (#62 cont.): population ranked by score into ten
    equal bins, per-decile response rate against the overall base rate —
    THE operating report for targeting/risk scores ('the top decile
    converts at 2.3x base'), reading model value in business units where
    AUC reads it in probability (same eval inputs as the AUC/report
    queries, so the triad + lift all describe one model).

    NTILE's equal-count binning is deterministic under the (score DESC,
    vec_id) total order — both engines split remainders identically
    (front-loaded) per the SQL standard; counts are exact integers and
    rate/lift are single divides. The NTILE is computed two-phase
    (global row number via deterministic buckets + one hash exchange +
    literal offsets, then the
    standard's front-loaded-remainder formula in exact integer
    arithmetic — functions/global_order.py), so no single-partition pass
    over the scored population exists in the plan."""
    from ..functions.global_order import global_row_number, ntile_from_rn

    e = T(spark, sf_dir, "embeddings")
    scored = e.select(
        F.element_at("embedding", 2).alias("score"),
        (F.col("label") % 2).alias("y"),
        "vec_id",
    )
    ranked = global_row_number(
        scored, [("score", "desc"), ("vec_id", "asc")], "rn", total_col="n_tot"
    ).select("y", ntile_from_rn("rn", "n_tot", 10).alias("decile"))
    overall = ranked.agg(
        F.sum("y").cast("bigint").alias("tot_pos"), F.count("*").alias("tot")
    )
    return (
        ranked.groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.sum("y").cast("bigint").alias("positives"),
        )
        .crossJoin(F.broadcast(overall))
        .select(
            "decile",
            "n",
            "positives",
            (F.col("positives").cast("double") / F.col("n")).alias("response_rate"),
            (
                (F.col("positives").cast("double") / F.col("n"))
                / (F.col("tot_pos").cast("double") / F.col("tot"))
            ).alias("lift"),
        )
    )


@query(
    "x_eval_calibration_bins",
    oracle="""
    WITH scored AS (
      SELECT vec_id,
             CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1000, 0) AS BIGINT)
               AS score_mil,
             label % 2 AS y
      FROM embeddings
    ),
    binned AS (
      SELECT CAST(NTILE(10) OVER (ORDER BY score_mil, vec_id) AS INTEGER)
               AS bin,
             score_mil, y
      FROM scored
    ),
    agg AS (
      SELECT bin, COUNT(*) AS n,
             CAST(SUM(score_mil) AS BIGINT) AS s_sum,
             CAST(SUM(y) AS BIGINT) AS n_pos
      FROM binned GROUP BY bin
    )
    SELECT bin, n, n_pos,
           CAST(s_sum AS DOUBLE) / (n * 1000.0) AS mean_score,
           CAST(n_pos AS DOUBLE) / n AS pos_rate
    FROM agg
    """,
)
def x_eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins: decile-bin the model score (embedding
    component 2, the corpus's stand-in logit), and report each bin's mean
    score against its observed positive rate — the calibration audit run
    on every quality-classifier before its scores gate corpus admission.

    Determinism discipline, integer-lattice edition: the score is
    quantized to milli-units FIRST (round(score*1000) — a float*1000 can
    never land exactly on .5, so the rounding direction is never
    engine-dependent; Spark's double->DECIMAL cast is NOT portable, it
    round-trips through the shortest string repr), bin mass accumulates as
    exact BIGINTs, and each reported ratio is ONE final IEEE divide. The
    NTILE runs under a total order (score_mil, vec_id) and is computed
    clustered (deterministic buckets + one hash exchange + literal
    offsets + the front-loaded remainder formula,
    functions/global_order.py) — no single-partition
    window over the scored population."""
    from ..functions.global_order import global_row_number, ntile_from_rn

    e = T(spark, sf_dir, "embeddings")
    scored = e.select(
        "vec_id",
        F.round(F.element_at("embedding", 2).cast("double") * 1000, 0)
        .cast("bigint")
        .alias("score_mil"),
        (F.col("label") % 2).alias("y"),
    )
    binned = global_row_number(
        scored, [("score_mil", "asc"), ("vec_id", "asc")], "rn", total_col="n_tot"
    ).select(ntile_from_rn("rn", "n_tot", 10).alias("bin"), "score_mil", "y")
    agg = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("score_mil").cast("bigint").alias("s_sum"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    return agg.select(
        "bin",
        "n",
        "n_pos",
        (F.col("s_sum").cast("double") / (F.col("n") * 1000.0)).alias("mean_score"),
        (F.col("n_pos").cast("double") / F.col("n")).alias("pos_rate"),
    )


# Deterministic Poisson(1) bootstrap: each (row, replicate) draws its
# resample multiplicity from the inverse CDF evaluated on a 32-bit
# md5-uniform lattice. The thresholds are FIXED integer constants
# (cumulative Poisson(1) probabilities scaled by 2^32, tail capped at 5)
# shared verbatim with the oracle — the approximation quality of the cap
# is statistically irrelevant and deterministically identical on both
# engines, which is the property that matters.
_BOOT_R = 100
_POIS_T = (1580030169, 3160060337, 3950075422, 4213413783, 4279249953)


def _pois_case_sql(h: str) -> str:
    return (
        f"CASE WHEN {h} < {_POIS_T[0]} THEN 0 WHEN {h} < {_POIS_T[1]} THEN 1 "
        f"WHEN {h} < {_POIS_T[2]} THEN 2 WHEN {h} < {_POIS_T[3]} THEN 3 "
        f"WHEN {h} < {_POIS_T[4]} THEN 4 ELSE 5 END"
    )


@query(
    "x_eval_bootstrap_ci",
    oracle=f"""
    WITH s AS (
      SELECT vec_id,
             CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1000000, 0) AS BIGINT)
               AS s_ppm
      FROM embeddings
    ),
    reps AS (
      SELECT vec_id, s_ppm, CAST(g.r AS INTEGER) AS r
      FROM s CROSS JOIN generate_series(1, {_BOOT_R}) g(r)
    ),
    weighted AS (
      SELECT r, s_ppm,
             {_pois_case_sql("('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '#' || CAST(r AS VARCHAR)), 1, 8))::BIGINT")}
               AS w
      FROM reps
    ),
    per AS (
      SELECT r, CAST(SUM(w * s_ppm) AS BIGINT) AS ws,
             CAST(SUM(w) AS BIGINT) AS nw
      FROM weighted GROUP BY r
    ),
    means AS (
      SELECT r, CAST(ws AS DOUBLE) / (nw * 1000000.0) AS m FROM per
    ),
    ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m, r) AS rk FROM means
    ),
    ci AS (
      SELECT MAX(CASE WHEN rk = 3 THEN m END) AS ci_lo,
             MAX(CASE WHEN rk = 98 THEN m END) AS ci_hi
      FROM ranked
    ),
    point AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s_ppm) AS BIGINT) AS ps
      FROM s
    )
    SELECT point.n, {_BOOT_R} AS n_replicates,
           CAST(point.ps AS DOUBLE) / (point.n * 1000000.0) AS point_mean,
           ci.ci_lo, ci.ci_hi, ci.ci_hi - ci.ci_lo AS ci_width
    FROM point CROSS JOIN ci
    """,
)
def x_eval_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for a corpus metric (mean
    model score), the MapReduce-era resampling scheme (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012):
    instead of materializing B resampled corpora, every row draws B
    independent Poisson(1) multiplicities, so ALL replicates accumulate
    in ONE pass with map-side partial aggregation — the shuffle carries
    B rows per partition, never the data.

    Determinism discipline: the multiplicity is the Poisson inverse CDF
    on a 32-bit md5 lattice (fixed integer thresholds, tail capped — the
    SAME constants in both engines, so every replicate is bit-identical
    and resume-identical); the score rides the ppm integer lattice, each
    replicate mean is ONE IEEE divide of exact BIGINTs, and the 95% CI
    is an exact order statistic (ranks 3/98 of the 100 replicate means
    under a total order), not an interpolated percentile — interpolation
    is where engines disagree. At 100 TB the explode is just a column
    macro: rows*B never hits the shuffle because the per-partition
    combine collapses to B partial sums."""
    e = T(spark, sf_dir, "embeddings")
    s = e.select(
        "vec_id",
        F.round(F.element_at("embedding", 2).cast("double") * 1000000, 0)
        .cast("bigint")
        .alias("s_ppm"),
    )
    reps = s.select(
        "vec_id",
        "s_ppm",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_R))).alias("r"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "#", F.col("vec_id").cast("string"), F.col("r").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    w = (
        F.when(h < _POIS_T[0], 0)
        .when(h < _POIS_T[1], 1)
        .when(h < _POIS_T[2], 2)
        .when(h < _POIS_T[3], 3)
        .when(h < _POIS_T[4], 4)
        .otherwise(5)
    )
    per = (
        reps.select("r", "s_ppm", w.alias("w"))
        .groupBy("r")
        .agg(
            F.sum(F.col("w") * F.col("s_ppm")).cast("bigint").alias("ws"),
            F.sum("w").cast("bigint").alias("nw"),
        )
    )
    means = per.select(
        "r", (F.col("ws").cast("double") / (F.col("nw") * 1000000.0)).alias("m")
    )
    ranked = means.select(
        "m", F.row_number().over(Window.orderBy("m", "r")).alias("rk")
    )
    ci = ranked.agg(
        F.max(F.when(F.col("rk") == 3, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rk") == 98, F.col("m"))).alias("ci_hi"),
    )
    point = s.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("s_ppm").cast("bigint").alias("ps"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n",
        F.lit(_BOOT_R).alias("n_replicates"),
        (F.col("ps").cast("double") / (F.col("n") * 1000000.0)).alias("point_mean"),
        "ci_lo",
        "ci_hi",
        (F.col("ci_hi") - F.col("ci_lo")).alias("ci_width"),
    )
