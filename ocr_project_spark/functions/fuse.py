"""Media-candidate fusion — the reference's multi-engine result merger
(/root/reference/src/advanced_ocr/core/engine_manager.py:219-312) as one
window pass + filter, entirely in built-in expressions.

Shape: input is the candidates table (doc_id, offset, engine, text,
confidence) — one row per (engine x media span), the columnar form of
the reference's ThreadPool fan-out dict (engine_manager.py:167-196).
One hash shuffle on (doc_id, offset) ranks candidates per span; the
best row (row_number == 1) carries the group's aggregates, so no second
shuffle and no self-join.

Semantics (constants in rules.py, matching the reference exactly):
  valid      = non-blank text AND conf > 0.1            (:238-239)
  winner     = best valid by (conf desc, engine priority asc); if none
               valid, best of failed by the same order   (:241-246, :262)
  consensus  = winner + every other *valid* row with conf > 0.7 and
               word-Jaccard(winner.text, text) > 0.8     (:272-279)
  fused conf = |consensus| > 1 and >= 2 valid:
                 min(1, avg(consensus conf) + min(0.05, 0.01*n))  (:281-287)
               else winner conf
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ocr_project_spark import rules
from ocr_project_spark.functions.classify import jaccard_expr


def _engine_enabled(conf) -> bool:
    """One engine's enabled flag: bare bools (yaml ``rec_a: true``) and
    mapping form (``rec_a: {enabled: false}``) both accepted; anything
    else (None, unknown shapes) means enabled — matching fusion itself,
    which tolerates unknown engines (DEFAULT_PRIORITY)."""
    if isinstance(conf, bool):
        return conf
    if isinstance(conf, dict):
        return bool(conf.get("enabled", True))
    return True


def enabled_engines(cfg) -> list[str]:
    """Configured engines whose flag is on (reference engines.yaml
    enabled map, utils/config.py:84-96 + engine_manager availability
    checks at engine_manager.py:68-84).  Only lists engines that appear
    in the config — absence from this list does NOT mean disabled."""
    engines = (cfg.get("engines") if cfg is not None else None) or {}
    return sorted(n for n, conf in engines.items() if _engine_enabled(conf))


def disabled_engines(cfg) -> list[str]:
    """Engines the config explicitly turns off."""
    engines = (cfg.get("engines") if cfg is not None else None) or {}
    return sorted(n for n, conf in engines.items() if not _engine_enabled(conf))


def filter_enabled_candidates(cands: DataFrame, cfg) -> DataFrame:
    """F6/F7 availability filter: drop candidate rows from explicitly
    DISABLED engines before fusion — the batch analog of the reference
    never invoking a disabled engine.  Engines absent from the config
    map pass through: fusion tolerates unknown engines (priority
    DEFAULT_PRIORITY), so an isin-whitelist here would silently drop a
    real engine's data whenever the config enumerates fewer engines
    than the candidates table contains.  The NOT-isin predicate is
    config-sized, so it still pushes down to the candidate scan."""
    dis = disabled_engines(cfg)
    if not dis:
        return cands
    return cands.where(~F.col("engine").isin(dis) | F.col("engine").isNull())


def priority_expr(engine: Column) -> Column:
    """Engine tie-break priority (rules.ENGINE_PRIORITY), small = wins."""
    mapping = F.create_map(
        *[F.lit(x) for kv in rules.ENGINE_PRIORITY.items() for x in kv]
    )
    return F.coalesce(mapping[engine], F.lit(rules.DEFAULT_PRIORITY))


def valid_expr(text: Column, conf: Column) -> Column:
    return (F.length(F.trim(F.coalesce(text, F.lit("")))) > 0) & (
        conf > F.lit(rules.VALID_CONF)
    )


def fuse_media_candidates(
    cands: DataFrame, early_termination: float | None = None
) -> DataFrame:
    """(doc_id, offset, engine, text, confidence) ->
    (doc_id, offset, text, confidence, method, n_consensus).

    ``early_termination`` mirrors the reference's high-confidence
    short-circuit (types.py:181-182 ``is_high_confidence`` at 0.95;
    examples/advanced_usage.py:200-220 stops the engine cascade once a
    result clears it): a span whose best valid candidate reaches the
    threshold resolves to that candidate as-is (method
    'early_termination', no consensus math) — the conditional is
    evaluated BEFORE the Jaccard expression, so the expensive word-set
    similarity never runs for early spans.  None disables the gate.
    """
    valid = valid_expr(F.col("text"), F.col("confidence"))

    # Total order: valid first, then conf desc, then priority asc, then
    # engine/text asc — pins the reference's unstable tie at
    # engine_manager.py:262 (SURVEY.md section 7.5 hard part #2).
    keyed = cands.select(
        "doc_id",
        "offset",
        "engine",
        "text",
        "confidence",
        valid.alias("is_valid"),
        F.when(valid, 0).otherwise(1).alias("k_invalid"),
        priority_expr(F.col("engine")).alias("k_priority"),
        F.coalesce(F.col("text"), F.lit("")).alias("k_text"),
    )
    order_cols = [
        F.col("k_invalid").asc(),
        F.col("confidence").desc(),
        F.col("k_priority").asc(),
        F.col("engine").asc(),
        F.col("k_text").asc(),
    ]
    w = Window.partitionBy("doc_id", "offset").orderBy(*order_cols)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    ranked = keyed.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.first("text").over(wall).alias("best_text"),
        F.first("confidence").over(wall).alias("best_conf"),
        F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).over(wall).alias("n_valid"),
        F.max(F.when(F.col("is_valid"), F.col("confidence")))
        .over(wall)
        .alias("max_valid_conf"),
    )
    early = (
        F.col("max_valid_conf") >= F.lit(float(early_termination))
        if early_termination is not None
        else F.lit(False)
    )

    # A non-best valid row joins the consensus iff high-confidence and
    # word-similar to the winner (engine_manager.py:272-279).  The
    # early gate comes first so the Jaccard never evaluates for spans
    # that short-circuit.
    agrees = F.when(early, F.lit(False)).otherwise(
        (F.col("rn") > 1)
        & F.col("is_valid")
        & (F.col("confidence") > F.lit(rules.CONSENSUS_CONF))
        & (jaccard_expr(F.col("best_text"), F.col("text")) > F.lit(rules.SIM_THRESHOLD))
    )
    scored = ranked.select(
        "*",
        F.sum(F.when(agrees, 1).otherwise(0)).over(wall).alias("n_agree"),
        F.sum(F.when(agrees, F.col("confidence")).otherwise(F.lit(0.0)))
        .over(wall)
        .alias("agree_conf_sum"),
    ).where(F.col("rn") == 1)

    n_consensus = F.lit(1) + F.col("n_agree")
    avg_conf = (F.col("best_conf") + F.col("agree_conf_sum")) / n_consensus
    boosted = F.least(
        F.lit(rules.CONF_CAP),
        avg_conf
        + F.least(
            F.lit(rules.BOOST_CAP), F.lit(rules.BOOST_PER_ENGINE) * n_consensus
        ),
    )
    multi_valid = F.col("n_valid") >= 2
    has_consensus = multi_valid & (F.col("n_agree") > 0)

    return scored.select(
        "doc_id",
        "offset",
        F.col("best_text").alias("text"),
        F.when(early, F.col("best_conf"))
        .when(has_consensus, boosted)
        .otherwise(F.col("best_conf"))
        .alias("confidence"),
        F.when(early, F.lit("early_termination"))
        .when(F.col("n_valid") == 0, F.lit("fallback_best_of_failed"))
        .when(F.col("n_valid") == 1, F.lit("single_valid"))
        .when(
            has_consensus,
            F.concat(F.lit("consensus_"), n_consensus, F.lit("_engines")),
        )
        .otherwise(F.lit("best_single"))
        .alias("method"),
        F.when(early, F.lit(1))
        .when(F.col("n_valid") == 0, F.lit(0))
        .when(has_consensus | (F.col("n_valid") >= 1), n_consensus)
        .cast("int")
        .alias("n_consensus"),
    )


def fuse_media_candidates_routed(
    cands: DataFrame, early_termination: float = 0.95
) -> DataFrame:
    """Early-termination as an explicit filter-split -> union plan.

    Stage 1 (cheap): ONE hash aggregate per span — min_by under the
    total fusion order picks the winner, max(valid conf) computes the
    route.  No window sort, no Jaccard.
    Stage 2: spans whose best valid candidate clears the threshold emit
    directly from the aggregate (method 'early_termination'); the rest
    are semi-joined back and run the full consensus machinery.

    Output is row-identical to
    ``fuse_media_candidates(cands, early_termination=...)`` (pinned by
    tests).  Plan tradeoff, measured: the split DAG consumes the
    candidate source and the route aggregate from two branches, which
    the static planner cannot dedupe across the union (AQE reuses the
    shuffle stages at runtime when plans canonicalize equal, but the
    scans still run per branch).  Prefer the single-pass
    ``early_termination=`` gate when candidates are a live subquery;
    prefer THIS shape when candidates are a materialized table (scans
    are cheap column-pruned re-reads) and most spans short-circuit, so
    the window+Jaccard stage runs over a small residue.  Both shuffles
    hash the same (doc_id, offset) key, so the split adds no new skew.
    """
    valid = valid_expr(F.col("text"), F.col("confidence"))
    # ascending-comparable total order (numeric fields negated for
    # desc): min_by == the window's rn=1 row
    ord_key = F.struct(
        F.when(valid, 0).otherwise(1).alias("k_invalid"),
        (-F.col("confidence")).alias("k_nconf"),
        priority_expr(F.col("engine")).alias("k_priority"),
        F.col("engine").alias("k_engine"),
        F.coalesce(F.col("text"), F.lit("")).alias("k_text"),
    )
    agg = cands.groupBy("doc_id", "offset").agg(
        F.min_by(
            F.struct(F.col("text").alias("t"), F.col("confidence").alias("c")),
            ord_key,
        ).alias("win"),
        F.max(F.when(valid, F.col("confidence"))).alias("mvc"),
    )
    is_early = F.col("mvc") >= F.lit(float(early_termination))
    early_out = agg.where(is_early).select(
        "doc_id",
        "offset",
        F.col("win.t").alias("text"),
        F.col("win.c").alias("confidence"),
        F.lit("early_termination").alias("method"),
        F.lit(1).cast("int").alias("n_consensus"),
    )
    # rest = everything NOT early, via an anti-join against the early
    # keys: the early_out aggregate subtree is then consumed twice with
    # an IDENTICAL shuffle, so Spark's ReuseExchange computes the route
    # aggregate once (a where(~early) semi-join variant would build a
    # second, different aggregate subtree and recompute it).  The join
    # must be NULL-SAFE: groupBy puts null doc_id/offset keys in a real
    # group, so an early null group's rows would otherwise also survive
    # the plain anti-join (null keys never equi-match) and be fused a
    # second time — duplicating output rows vs the single-pass form.
    e = early_out.select("doc_id", "offset")
    rest = cands.join(
        e,
        cands["doc_id"].eqNullSafe(e["doc_id"])
        & cands["offset"].eqNullSafe(e["offset"]),
        "left_anti",
    )
    return fuse_media_candidates(rest).unionByName(early_out)
