#!/usr/bin/env python3
"""Replay the bench sentinel's prior-ratchet triggers against a
committed (prior, measured) artifact pair — offline, no Spark.

Usage: tools/replay_sentinel.py [--verify] <prior.json> <measured.json>

Mirrors Bench.scala exactly:
  - ambient probe ratio = measured probe_median_ms / prior
    probe_median_ms (CPU flavor), clamped to [1.0, 1.25] — the r13
    machine-drift normalizer. Applied to the FLAG tier and the global
    gate; NOT to the requeue tier.
  - pass-1 median prior ratio over priors >= 0.3 s, clamped to >= 1.0;
    ratio votes and the histogram exclude pairs where BOTH sides sit
    under the 0.35 s noise floor (r14 — sub-0.35s wobble is absolute
    noise, not a ratio signal)
  - requeue, sub-second priors (< 1.0 s): normalized ratio > 2x and
    measured > 0.25 s
  - requeue, larger priors: pass-1-normalized ratio > 3x and measured
    > 0.6 s, OR the ambient-normalized flat 3x
  - flag: ambient-normalized ratio > 3x and measured > 0.6 s
  - global gate: median accepted/prior ratio / probe_ratio > 2x

--verify: re-derive the artifact's embedded `sentinel_audit` block
(probe ratios, per-tier requeue counts, normalized-ratio histogram)
from the pair and diff it field by field; exit 1 on any mismatch.
Window/spread tier counts are copied from the artifact's recorded
requeue reasons (they depend on probe timing the artifact summarizes),
while both prior tiers and the histogram are recomputed from scratch.

Built to prove two rounds of sentinel work: (r12) the r11 blind-band
clusters (q195-q198, q210-q215, up to 2.95x) must trip the tiered
trigger while a clean pair must not mass-requeue; (r13) the
(r11 committed, r12 committed) pair — carried median 1.070 riding on a
1.061x CPU-probe drift — must report ~1.00 after ambient
normalization, and a synthetic uniformly-5x pair must still flag
globally (the cap).
"""
import json
import re
import sys

SUB_SECOND_PRIOR = 1.0
SUB_SECOND_FACTOR = 2.0
SUB_SECOND_FLOOR = 0.25
HEAVY_PRIOR = 2.0   # round 15: >=2s priors requeue at a normalized 1.5x
HEAVY_FACTOR = 1.5
RATCHET_FACTOR = 3.0
RATCHET_FLOOR = 0.6
MIN_PRIOR_VOTE = 0.3
NOISE_FLOOR_VOTE = 0.35  # both sides under this -> no ratio vote
AMBIENT_CAP = 1.25
GLOBAL_LIMIT = 2.0
HIST_BOUNDS = [0.5, 0.8, 1.25, 2.0, 3.0]
HIST_KEYS = ["lt_0.5", "0.5_0.8", "0.8_1.25", "1.25_2", "2_3", "ge_3"]


def median(xs):
    """Bench.scala's convention: sorted(xs)[len // 2] (upper middle on
    even length) — statistics.median averages the middle pair and
    diverges from the artifact on even-sized vote sets."""
    s = sorted(xs)
    return s[len(s) // 2]


def load(path):
    with open(path) as f:
        return json.load(f)


def queries_of(d):
    """Accept either a bench_full.json artifact (full names, seconds)
    or a driver BENCH_rN.json capture (stdout tail, qNN keys, integer
    milliseconds)."""
    if "queries" in d:
        return d["queries"]
    pairs = re.findall(r'"(q\d+)":(\d+)', d["tail"])
    return {k: int(v) / 1000.0 for k, v in pairs}


def probe_ratio_of(prior_d, meas_d):
    pm = prior_d.get("probe_median_ms")
    mm = meas_d.get("probe_median_ms")
    if not pm or not mm:
        return 1.0, 1.0
    raw = mm / pm
    return raw, min(AMBIENT_CAP, max(1.0, raw))


def pass1_times(meas_d, measured):
    """Pass-1 time per query: the requeued map's pass1 where present,
    else the accepted time (non-requeued queries ran once)."""
    rq = meas_d.get("requeued", {}) if isinstance(meas_d, dict) else {}
    return {q: (rq[q]["pass1"] if q in rq else t) for q, t in measured.items()}


def replay(prior, measured, probe_ratio, t1s=None):
    # driver captures key by qNN prefix; fold the prior to match
    if measured and all(k.count("_") == 0 for k in measured):
        prior = {k.split("_")[0]: v for k, v in prior.items()}
    if t1s is None:
        t1s = measured
    ratios = [t1s[q] / prior[q] for q in t1s
              if q in prior and prior[q] >= MIN_PRIOR_VOTE
              and max(prior[q], t1s[q]) >= NOISE_FLOOR_VOTE]
    med = max(1.0, median(ratios)) if ratios else 1.0
    requeued, flagged = [], []
    tiers = {"prior_subsecond": 0, "prior_heavy": 0, "prior_large": 0}
    for q, t in sorted(t1s.items()):
        p = prior.get(q)
        if p is None or p <= 0:
            continue
        norm = t / med
        amb = t / probe_ratio
        if p < SUB_SECOND_PRIOR:
            trip = norm > SUB_SECOND_FACTOR * p and t > SUB_SECOND_FLOOR
            tier = "prior_subsecond"
        elif p >= HEAVY_PRIOR and norm > HEAVY_FACTOR * p:
            # round 15: a hot co-tenant window must never leave a
            # multi-second query at 2-3x in an accepted artifact
            trip = True
            tier = "prior_heavy"
        else:
            trip = (norm > RATCHET_FACTOR * p and t > RATCHET_FLOOR) or \
                   (amb > RATCHET_FACTOR * p and t > RATCHET_FLOOR)
            tier = "prior_large"
        if trip:
            requeued.append((q, p, t, t / p))
            tiers[tier] += 1
            # Flag check only on queries that would be REQUEUED: Bench
            # evaluates stillPrior on requeued queries alone, so a
            # never-requeued query satisfying the ambient 3x here would
            # over-report vs the artifact. (Bench can also requeue on
            # window_hot/spread, which replay cannot see — this list is
            # therefore a lower bound on probe-triggered paths.)
            acc = measured.get(q, t)
            if acc / probe_ratio > RATCHET_FACTOR * p and acc > RATCHET_FLOOR:
                flagged.append(q)
    acc_ratios = [measured[q] / prior[q] for q in measured
                  if q in prior and prior[q] >= MIN_PRIOR_VOTE
                  and max(prior[q], measured[q]) >= NOISE_FLOOR_VOTE]
    acc_med = median(acc_ratios) if acc_ratios else 1.0
    hist = {k: 0 for k in HIST_KEYS}
    for q in measured:
        p = prior.get(q)
        if p is None or p < MIN_PRIOR_VOTE or \
                max(p, measured[q]) < NOISE_FLOOR_VOTE:
            continue
        r = measured[q] / p / probe_ratio
        i = next((i for i, b in enumerate(HIST_BOUNDS) if r < b),
                 len(HIST_KEYS) - 1)
        hist[HIST_KEYS[i]] = hist[HIST_KEYS[i]] + 1
    return dict(pass1_median=med, requeued=requeued, tiers=tiers,
                flagged=flagged, accepted_median=acc_med,
                accepted_median_norm=acc_med / probe_ratio,
                globally_contended=acc_med / probe_ratio > GLOBAL_LIMIT,
                histogram=hist)


def verify(meas_d, rep, raw_ratio, probe_ratio):
    audit = meas_d.get("sentinel_audit")
    if audit is None:
        print("VERIFY: artifact carries no sentinel_audit block")
        return 1
    bad = 0

    def check(name, got, want, exact=True):
        nonlocal bad
        ok = got == want if exact else abs(got - want) < 5e-5
        print(f"  {'OK ' if ok else 'MISMATCH'} {name}: artifact={got} replay={want}")
        if not ok:
            bad += 1

    check("probe_ratio_cpu", audit["probe_ratio_cpu"], raw_ratio, exact=False)
    check("probe_ratio", audit["probe_ratio"], probe_ratio, exact=False)
    check("pass1_median_ratio", audit["pass1_median_ratio"],
          rep["pass1_median"], exact=False)
    check("median_prior_ratio_normalized",
          audit["median_prior_ratio_normalized"],
          rep["accepted_median_norm"], exact=False)
    for t in ("prior_subsecond", "prior_heavy", "prior_large"):
        check(f"tier_counts.{t}", audit["tier_counts"].get(t, 0),
              rep["tiers"][t])
    # window_hot/spread depend on probe timing: recorded, not recomputed —
    # cross-check them against the artifact's own requeue_reasons
    reasons = audit.get("requeue_reasons", {})
    for t in ("window_hot", "spread"):
        check(f"tier_counts.{t}", audit["tier_counts"][t],
              sum(1 for rs in reasons.values() if t in rs))
    check("ratio_histogram", audit["ratio_histogram"], rep["histogram"])
    print(f"VERIFY: {'PASS' if bad == 0 else f'{bad} mismatches'}")
    return 0 if bad == 0 else 1


def main():
    args = [a for a in sys.argv[1:] if a != "--verify"]
    do_verify = "--verify" in sys.argv[1:]
    prior_d, meas_d = load(args[0]), load(args[1])
    prior, measured = queries_of(prior_d), queries_of(meas_d)
    raw_ratio, probe_ratio = probe_ratio_of(prior_d, meas_d)
    t1s = pass1_times(meas_d, measured)
    rep = replay(prior, measured, probe_ratio, t1s)
    print(f"ambient probe ratio: raw {raw_ratio:.4f} clamped {probe_ratio:.4f}")
    print(f"pass-1 median prior ratio (clamped): {rep['pass1_median']:.3f}")
    print(f"accepted median prior ratio: raw {rep['accepted_median']:.3f} "
          f"normalized {rep['accepted_median_norm']:.3f} "
          f"globally_contended={rep['globally_contended']}")
    print(f"would requeue {len(rep['requeued'])} of {len(measured)} queries "
          f"(tiers {rep['tiers']}), flag {len(rep['flagged'])}:")
    for q, p, t, r in rep["requeued"]:
        print(f"  {q:32s} prior {p:7.3f}s  measured {t:7.3f}s  {r:5.2f}x")
    for q in rep["flagged"]:
        print(f"  FLAG {q}")
    if do_verify:
        sys.exit(verify(meas_d, rep, raw_ratio, probe_ratio))


if __name__ == "__main__":
    main()
