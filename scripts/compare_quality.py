"""Certify a fast operating point against the exact path (VERDICT r4 #1).

Both inputs are run_quality.py outputs over the SAME held-out windows and
per-window seeds (PRNGKey(i)), so the comparison is paired: for each
window we diff the fast pass's score against the exact pass's. The
certification rule from the round-4 verdict: the fast point's
distributions must sit within the exact path's p10-p90 band — plus the
paired view (mean delta vs the exact path's own window-to-window std),
which is the sharper test the shared seeds buy us.

  python scripts/compare_quality.py /tmp/chain/quality_exact_s500.json \
      /tmp/chain/quality_dpm25_s500.json
"""
import json
import sys

import numpy as np


def load(path):
    with open(path) as f:
        return json.load(f)


def compare(exact, fast):
    out = {}
    for key in ("clip_i", "clip_t", "pickscore"):
        ed, fd = exact[f"{key}_dist"], fast[f"{key}_dist"]
        row = {
            "exact_mean": ed["mean"], "fast_mean": fd["mean"],
            "exact_band": [ed["p10"], ed["p90"]],
            "fast_p50": fd["p50"],
            "p50_in_exact_band": ed["p10"] <= fd["p50"] <= ed["p90"],
            "mean_delta": fd["mean"] - ed["mean"],
            "mean_delta_over_exact_std":
                (fd["mean"] - ed["mean"]) / max(ed["std"], 1e-12),
        }
        pw_e = exact.get("per_window", {}).get(key)
        pw_f = fast.get("per_window", {}).get(key)
        if pw_e and pw_f and len(pw_e) == len(pw_f):
            d = np.asarray(pw_f, np.float64) - np.asarray(pw_e, np.float64)
            row["paired"] = {
                "mean": float(d.mean()), "std": float(d.std()),
                "p10": float(np.percentile(d, 10)),
                "p90": float(np.percentile(d, 90)),
                "frac_within_exact_band": float(np.mean(
                    (np.asarray(pw_f) >= ed["p10"])
                    & (np.asarray(pw_f) <= ed["p90"]))),
            }
        out[key] = row
    out["clip_fid"] = {"exact": exact["clip_fid"], "fast": fast["clip_fid"],
                       "delta": fast["clip_fid"] - exact["clip_fid"]}
    # certification rule: CLIP-I (the conditioning metric this corpus can
    # measure; clip_t is noise by construction under random-init towers,
    # QUALITY.md) p50 inside the exact band, and CLIP-FID not degraded by
    # more than the exact path's own rerun jitter envelope (10%).
    ci = out["clip_i"]
    out["certified"] = bool(
        ci["p50_in_exact_band"]
        and abs(ci["mean_delta_over_exact_std"]) <= 1.0
        and out["clip_fid"]["delta"] <= 0.1 * max(exact["clip_fid"], 1e-12))
    return out


def main():
    exact, fast = load(sys.argv[1]), load(sys.argv[2])
    res = compare(exact, fast)
    res["exact_config"] = {k: exact.get(k) for k in
                           ("sampler", "num_inference_steps",
                            "ref_feature_interval", "checkpoint")}
    res["fast_config"] = {k: fast.get(k) for k in
                          ("sampler", "num_inference_steps",
                           "ref_feature_interval", "checkpoint")}
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
