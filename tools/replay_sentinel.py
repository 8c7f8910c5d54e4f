#!/usr/bin/env python3
"""Replay the bench sentinel's prior-ratchet REQUEUE trigger against a
committed (prior, measured) artifact pair — offline, no Spark.

Usage: tools/replay_sentinel.py <prior.json> <measured.json>

Mirrors Bench.scala's tiered trigger exactly:
  - pass-1 median prior ratio over priors >= 0.3 s, clamped to >= 1.0
  - sub-second priors (< 1.0 s): requeue when normalized ratio > 2x
    and measured > 0.25 s
  - larger priors: requeue when normalized ratio > 3x and measured
    > 0.6 s (or the raw flat-3x ratchet trips)

Built to prove the round-12 fix: the r11 driver pass (BENCH_r11.json)
vs the committed prior let two consecutive-execution contention
clusters (q195-q198, q210-q215, up to 2.95x) through the flat-3x
trigger unflagged; the tiered trigger must catch them, and a
clean-weather pair must not mass-requeue.
"""
import json
import statistics
import sys

SUB_SECOND_PRIOR = 1.0
SUB_SECOND_FACTOR = 2.0
SUB_SECOND_FLOOR = 0.25
RATCHET_FACTOR = 3.0
RATCHET_FLOOR = 0.6
MIN_PRIOR_VOTE = 0.3


def load_queries(path):
    """Accept either a bench_full.json artifact (full names, seconds)
    or a driver BENCH_rN.json capture (stdout tail, qNN keys, integer
    milliseconds)."""
    import re
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    tail = d["tail"]
    pairs = re.findall(r'"(q\d+)":(\d+)', tail)
    return {k: int(v) / 1000.0 for k, v in pairs}


def replay(prior, measured):
    # driver captures key by qNN prefix; fold the prior to match
    if measured and all(k.count("_") == 0 for k in measured):
        prior = {k.split("_")[0]: v for k, v in prior.items()}
    ratios = [measured[q] / prior[q] for q in measured
              if q in prior and prior[q] >= MIN_PRIOR_VOTE]
    med = max(1.0, statistics.median(ratios)) if ratios else 1.0
    requeued = []
    for q, t in sorted(measured.items()):
        p = prior.get(q)
        if p is None or p <= 0:
            continue
        norm = t / med
        if p < SUB_SECOND_PRIOR:
            trip = norm > SUB_SECOND_FACTOR * p and t > SUB_SECOND_FLOOR
        else:
            trip = (norm > RATCHET_FACTOR * p and t > RATCHET_FLOOR) or \
                   (t > RATCHET_FACTOR * p and t > RATCHET_FLOOR)
        if trip:
            requeued.append((q, p, t, t / p))
    return med, requeued


def main():
    prior = load_queries(sys.argv[1])
    measured = load_queries(sys.argv[2])
    med, requeued = replay(prior, measured)
    print(f"pass-1 median prior ratio (clamped): {med:.3f}")
    print(f"would requeue {len(requeued)} of {len(measured)} queries:")
    for q, p, t, r in requeued:
        print(f"  {q:32s} prior {p:7.3f}s  measured {t:7.3f}s  {r:5.2f}x")


if __name__ == "__main__":
    main()
