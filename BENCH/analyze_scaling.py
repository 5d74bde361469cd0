#!/usr/bin/env python3
"""Reproducible trend statistics for a `bench.py --scaling` artifact.

Every round so far the scaling record sections in BENCH/BASELINE.md
hand-computed the same quantities from the raw artifact: the time-ordered
pair-efficiency series, per-width leg drift, the narrow/wide divergence
that retake2 exposed, and (round-5 harvest protocol) the per-pair
ceiling-normalized efficiencies. This script computes them all from the
artifact JSON so a reader can go artifact -> claim without trusting prose:

    python BENCH/analyze_scaling.py BENCH/scaling_round5_harvest.json

Prints one human-readable block and one machine-readable JSON line.

Definitions
-----------
- efficiency        per pair: (t_lo / t_hi) / (n_hi / n_lo) from
                    time-adjacent legs (the ABBA design).
- drift             per width: last clean leg seconds / first clean leg
                    seconds. 1.0 = no session trend. Round 4's confounder
                    was lo-drift 0.83 with a fixed leg order.
- slope %/h         per width: OLS slope of leg seconds vs at_min,
                    expressed as percent of the width's median leg per
                    hour. Signed view of the same trend.
- divergence        lo_drift / hi_drift. ~1.0 when the host moves both
                    widths together (per-core frequency shifts cancel in
                    the ABBA median); far from 1.0 is the retake2 mode —
                    narrow and wide regimes moving in OPPOSITE directions
                    (1.179 / 0.889 = 1.33 there), which no same-width
                    interleaving cancels and steal stamps do not see.
- eff/ceiling       harvest protocol: each pair's efficiency divided by a
                    codegen scaling ceiling measured immediately before
                    its legs — the fraction of the platform's own
                    same-moment scaling the job achieved. This is the
                    quantity that stays put while the host's absolute
                    ceiling flaps.
"""

from __future__ import annotations

import json
import statistics
import sys


def _ols_slope(xs: list[float], ys: list[float]) -> float:
    """Least-squares slope of ys vs xs (units of y per unit of x)."""
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    den = sum((x - mx) ** 2 for x in xs)
    if den == 0:
        return 0.0
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den


def _width_trend(legs: list[dict], n: int) -> dict | None:
    """Drift + OLS slope for one leg width, clean legs only (warmup legs
    are deliberately slow — cold page cache — and excluded like polluted)."""
    ws = [l for l in legs if l.get("n") == n and not l.get("polluted")
          and not l.get("warmup")]
    if len(ws) < 2 or not all("at_min" in l for l in ws):
        return None
    ts = [l["t_spatial_sec"] for l in ws]
    slope = _ols_slope([l["at_min"] for l in ws], ts)  # sec per minute
    med = statistics.median(ts)
    return {
        "n": n,
        "legs": len(ws),
        "t_first_s": ts[0],
        "t_last_s": ts[-1],
        "drift_first_to_last": round(ts[-1] / ts[0], 3),
        "slope_pct_per_hour": round(slope * 60.0 / med * 100.0, 1),
        "t_median_s": round(med, 1),
        "steal_pct_range": [min(l.get("cpu_steal_pct", 0.0) for l in ws),
                            max(l.get("cpu_steal_pct", 0.0) for l in ws)],
    }


def analyze(rec: dict) -> dict:
    """All derived statistics for one scaling artifact (pure function)."""
    samples = rec.get("samples") or []
    legs = rec.get("legs") or []
    n_lo, n_hi = (int(x) for x in rec.get("headline_pair", "2,8").split(","))
    effs = [s["efficiency"] for s in samples]
    out: dict = {
        "pairs": len(samples),
        "pair_series": effs,
        "median_efficiency": rec.get("value"),
        "best_pair": max(effs) if effs else None,
        "pairs_at_or_above_0.8": sum(1 for e in effs if e >= 0.8),
    }
    normed = [s["efficiency_over_ceiling"] for s in samples
              if "efficiency_over_ceiling" in s]
    if normed:
        out["ceiling_series"] = [s["ceiling_same_moment"] for s in samples
                                 if "ceiling_same_moment" in s]
        out["eff_over_ceiling_series"] = normed
        out["median_eff_over_ceiling"] = rec.get(
            "value_over_ceiling", round(statistics.median(normed), 3))
    lo, hi = _width_trend(legs, n_lo), _width_trend(legs, n_hi)
    if lo:
        out["lo_leg"] = lo
    if hi:
        out["hi_leg"] = hi
    if lo and hi:
        out["divergence_lo_over_hi_drift"] = round(
            lo["drift_first_to_last"] / hi["drift_first_to_last"], 3)
    polluted = [l for l in legs if l.get("polluted")]
    if polluted:
        out["polluted_legs"] = len(polluted)
    for k in ("pairs_retried", "aborted", "stopped",
              "codegen_ceiling_same_day"):
        if rec.get(k) is not None:
            out[k] = rec[k]
    return out


def main() -> int:
    path = sys.argv[1]
    with open(path) as f:
        rec = json.loads(f.read().strip().splitlines()[-1])
    a = analyze(rec)
    w = sys.stdout.write
    w(f"scaling artifact: {path}\n")
    w(f"  pairs ({rec.get('headline_pair', '?')}): "
      f"{' '.join(f'{e:.3f}' for e in a['pair_series'])}"
      f"  -> median {a['median_efficiency']}"
      f" (best {a['best_pair']}, >=0.8: {a['pairs_at_or_above_0.8']})\n")
    if "median_eff_over_ceiling" in a:
        w(f"  same-moment ceilings: "
          f"{' '.join(f'{c:.3f}' for c in a['ceiling_series'])}\n")
        w(f"  eff/ceiling:          "
          f"{' '.join(f'{e:.3f}' for e in a['eff_over_ceiling_series'])}"
          f"  -> median {a['median_eff_over_ceiling']}\n")
    for key, label in (("lo_leg", "lo"), ("hi_leg", "hi")):
        if key in a:
            t = a[key]
            w(f"  {label} legs (n={t['n']}, {t['legs']} clean): "
              f"{t['t_first_s']:.0f}->{t['t_last_s']:.0f}s "
              f"drift {t['drift_first_to_last']} "
              f"slope {t['slope_pct_per_hour']:+.1f}%/h "
              f"steal {t['steal_pct_range'][0]:.1f}-"
              f"{t['steal_pct_range'][1]:.1f}%\n")
    if "divergence_lo_over_hi_drift" in a:
        w(f"  narrow/wide divergence (lo drift / hi drift): "
          f"{a['divergence_lo_over_hi_drift']}\n")
    for k in ("pairs_retried", "polluted_legs", "aborted", "stopped"):
        if k in a:
            w(f"  {k}: {a[k]}\n")
    print(json.dumps(a))
    return 0


if __name__ == "__main__":
    sys.exit(main())
