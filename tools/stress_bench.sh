#!/bin/bash
# Live proof for Bench's noise sentinel v2 (see Bench.scala scaladoc).
# Two scenarios, run on demand (NOT part of the round bench):
#
#   tools/stress_bench.sh writeback   # dd-driven dirty-page squeeze:
#                                     # io probes must go hot and the
#                                     # bracketed queries must requeue
#   tools/stress_bench.sh global      # synthetic everything-5x-slower
#                                     # (priors divided by 5): the run
#                                     # must stamp globally_contended
#                                     # instead of accepting
#   tools/stress_bench.sh ambient     # offline replay proof of the r13
#                                     # ambient normalization: the
#                                     # (r11, r12) committed pair must
#                                     # read ~1.00 normalized (machine
#                                     # drift, not contention), while a
#                                     # uniformly-5x pair (queries AND
#                                     # probes scaled) must still stamp
#                                     # globally_contended (the cap)
#
# Both print the one-line artifact summary; inspect "contended"/
# "prior_exceeded"/"globally_contended" in the output.
#
# Measured results (round 11, 2026-08-15, this host):
#   writeback — pass-1 queries inflated 2-22x (q126 10.17s vs 0.55s
#     committed, q141 12.39s vs 3.4s, q38 5.35s vs 0.55s), io probes
#     2-18x hot (up to 18386 ms vs 590 ms quiet) while several cpu
#     probes stayed near-quiet; ALL five queries requeued; accepted
#     times recovered to committed magnitude (0.62/0.99/2.66/0.39/
#     0.69s) with the still-bracketed ones flagged contended.
#     hot_probes 15/34, requeued 5, contended 4.
#   global — all five queries flagged PRIOR>3x in pass 1 and pass 2,
#     prior_exceeded=5, contended=5, median prior ratio 3.93,
#     globally_contended=true.
set -e
cd "$(dirname "$0")/.."
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}

case "$1" in
  writeback)
    # phase 1 — quiet baseline: a short unstressed run records its probe
    # medians in bench_subset.json (an episode covering a WHOLE short run
    # would poison the run-local medians; the committed-prior baseline is
    # what catches it, and this bootstrap stands in for last round's
    # committed artifact)
    SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_ONLY=q36_,q38_ \
      tools/run.sh graft.Bench >/dev/null
    python3 - <<'EOF'
import json
base = json.load(open('bench_prior.json'))
quiet = json.load(open('bench_subset.json'))
base['probe_median_ms'] = quiet['probe_median_ms']
base['io_probe_median_ms'] = quiet['io_probe_median_ms']
json.dump(base, open('/tmp/stress_prior.json', 'w'))
print('quiet probe medians: cpu %s ms, io %s ms' %
      (quiet['probe_median_ms'], quiet['io_probe_median_ms']))
EOF
    # phase 2 — sustained writeback + page-cache pressure: four fdatasync
    # flush loops saturate device bandwidth, one dsync loop (sync per 64k
    # block) injects queue latency, and a drop_caches loop keeps evicting
    # the page cache so parquet reads hit the contended device repeatedly
    # (the round-10 episode's signature: I/O pressure, CPU idle). All in
    # THIS shell session — same-session contention is what reliably
    # squeezes the bench JVM (measured in round 10).
    PIDS=""
    for i in 1 2 3 4; do
      ( while :; do dd if=/dev/zero of=/tmp/ddstress$i bs=1M count=2048 conv=fdatasync 2>/dev/null; done ) &
      PIDS="$PIDS $!"
    done
    ( while :; do dd if=/dev/zero of=/tmp/ddstress5 bs=64k count=4096 oflag=dsync 2>/dev/null; done ) &
    PIDS="$PIDS $!"
    if [ -w /proc/sys/vm/drop_caches ]; then
      ( while :; do echo 1 > /proc/sys/vm/drop_caches; sleep 2; done ) &
      PIDS="$PIDS $!"
    fi
    trap "kill $PIDS 2>/dev/null; sleep 1; rm -f /tmp/ddstress*" EXIT
    sleep 5
    SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_PRIOR=/tmp/stress_prior.json \
      SPARK_GRAFT_BENCH_ONLY=q36_,q38_,q125,q126,q141 \
      tools/run.sh graft.Bench
    ;;
  global)
    # fake prior = committed prior / 5: every honest measurement now reads
    # as 5x its prior, the signature of a uniformly-contended host
    python3 - <<'EOF'
import json
d = json.load(open('bench_prior.json'))
d['queries'] = {k: v / 5.0 for k, v in d['queries'].items()}
json.dump(d, open('/tmp/fake_prior.json', 'w'))
EOF
    SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_PRIOR=/tmp/fake_prior.json \
      SPARK_GRAFT_BENCH_ONLY=q158,q78_,q60_,q73_,q21_ \
      tools/run.sh graft.Bench
    ;;
  ambient)
    # NOTE: the live `global` scenario above keeps the fake prior's probe
    # medians UNCHANGED, so its probe_ratio reads ~1.0 and the r13
    # normalization does not alter that proof. This scenario covers the
    # two new cases: genuine machine drift (probes and queries move
    # together, mildly) must normalize to ~1.00, and a whole-host squeeze
    # (probes and queries move together, 5x) must blow through the
    # AmbientRatioCap and still flag.
    git show 6b117e4:bench_prior.json > /tmp/ambient_r11.json
    git show 89e9006:bench_full.json > /tmp/ambient_r12.json
    echo "=== (r11, r12) committed pair: drift, must read ~1.00 normalized ==="
    python3 tools/replay_sentinel.py /tmp/ambient_r11.json /tmp/ambient_r12.json | head -4
    python3 - <<'EOF'
import json
d = json.load(open('/tmp/ambient_r12.json'))
d['queries'] = {k: v * 5 for k, v in d['queries'].items()}
d['probe_median_ms'] *= 5
d['io_probe_median_ms'] *= 5
d.pop('requeued', None); d.pop('sentinel_audit', None)
json.dump(d, open('/tmp/ambient_5x.json', 'w'))
EOF
    echo "=== uniformly-5x pair: squeeze, must stamp globally_contended ==="
    python3 tools/replay_sentinel.py /tmp/ambient_r12.json /tmp/ambient_5x.json | head -4
    ;;
  *)
    echo "usage: tools/stress_bench.sh {writeback|global|ambient}" >&2
    exit 1
    ;;
esac
