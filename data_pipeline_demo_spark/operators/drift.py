"""Distribution-drift monitoring between two dataset snapshots — the
data-quality gate a training/ingest pipeline runs before trusting a new
batch (public method: Population Stability Index, the standard
credit-scoring / ML-monitoring drift metric).

``PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)`` over a fixed
binning, with add-one (Laplace) smoothing so empty bins stay finite.
Rule-of-thumb thresholds: < 0.1 stable, 0.1–0.25 moderate shift,
> 0.25 action needed.

Scale shape: each snapshot collapses to ``groups × bins`` integer
counts in ONE map-side-combinable aggregation — the raw rows never
shuffle, the joined histogram relation is (groups × bins)-sized at any
snapshot scale, and the PSI fold is arithmetic over that tiny relation.
Fixed bin edges (not quantile edges) keep the binning deterministic and
engine-portable; exact quantile edges would themselves be a
full-snapshot sort (use q104 / the q90 sketches to CHOOSE edges, then
fix them here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _binned(df: DataFrame, group_col, value_col, lo, width, bins, label):
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("bigint")
    clamped = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.select(F.col(group_col).alias("grp"), clamped.alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias(f"c_{label}"))
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
) -> DataFrame:
    """Per-group PSI of ``value_col`` between a reference and a current
    snapshot over ``bins`` equal-width bins on [lo, hi) (values outside
    clamp to the edge bins, so no row is silently dropped). Returns
    ``(grp, psi, n_ref, n_cur)`` with psi rounded to 6 decimals."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / bins
    r = _binned(ref, group_col, value_col, lo, width, bins, "ref")
    c = _binned(cur, group_col, value_col, lo, width, bins, "cur")
    # dense (grp × bin) grid so bins empty on one side still contribute
    grid = (
        r.select("grp")
        .union(c.select("grp"))
        .distinct()
        .crossJoin(
            r.sparkSession.range(bins).select(F.col("id").alias("bin"))
        )
    )
    h = (
        grid.join(r, ["grp", "bin"], "left")
        .join(c, ["grp", "bin"], "left")
        .select(
            "grp",
            "bin",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
    )
    totals = h.groupBy("grp").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    # add-one smoothing: p = (c + 1) / (n + bins), same on both sides
    j = h.join(totals, "grp")
    p = (F.col("c_ref") + 1) / (F.col("n_ref") + F.lit(bins))
    q = (F.col("c_cur") + 1) / (F.col("n_cur") + F.lit(bins))
    term = (q - p) * F.log(q / p)
    return (
        j.select("grp", "n_ref", "n_cur", term.alias("term"))
        .groupBy("grp", "n_ref", "n_cur")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .select("grp", "psi", "n_ref", "n_cur")
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    k_sigmas: float = 0.5,
    h_sigmas: float = 5.0,
) -> DataFrame:
    """Per-key CUSUM change-point detection (Page 1954, the standard
    sequential mean-shift monitor): values standardize against the
    key's own mean/std, then the two-sided cumulative sums
    ``s⁺ = max(0, s⁺ + z − k)`` / ``s⁻ = max(0, s⁻ − z − k)`` raise an
    alarm row whenever either crosses ``h`` (statistics reset after an
    alarm — multiple shifts per key all surface). Output:
    ``(key, order value at alarm, direction 'up'|'down', statistic)``.

    Scale shape (the Holt-forecast pattern, `operators/forecast.py`):
    standardization is ONE combinable grouped aggregate broadcast back
    onto the scan; the inherently sequential fold runs as one
    Arrow-batched pass per key over that key's series — parallel
    across keys, series-length frames only, raw history never
    collected. The recursion has no SQL form (each step clamps at
    zero), hence rows-only certification + numpy parity tests.
    """
    import numpy as np
    import pandas as pd

    stats = df.groupBy(key_col).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_pop(value_col).alias("__sd"),
    )
    src = (
        df.join(F.broadcast(stats), key_col)
        .filter(F.col("__sd") > 0)
        .select(
            key_col,
            order_col,
            ((F.col(value_col) - F.col("__mu")) / F.col("__sd")).alias("__z"),
        )
    )
    out_schema = (
        f"{key_col} string, {order_col} string, direction string, "
        "statistic double"
    )
    kf, of = key_col, order_col

    def fold(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(of, kind="mergesort")
        z = pdf["__z"].to_numpy(dtype=np.float64)
        orders = pdf[of].to_numpy()
        sp = sn = 0.0
        rows = []
        for i in range(len(z)):
            sp = max(0.0, sp + z[i] - k_sigmas)
            sn = max(0.0, sn - z[i] - k_sigmas)
            if sp > h_sigmas:
                rows.append((str(key[0]), str(orders[i]), "up", float(sp)))
                sp = sn = 0.0
            elif sn > h_sigmas:
                rows.append((str(key[0]), str(orders[i]), "down", float(sn)))
                sp = sn = 0.0
        return pd.DataFrame(
            rows, columns=[kf, of, "direction", "statistic"]
        )

    return src.groupBy(key_col).applyInPandas(fold, out_schema)
