#!/usr/bin/env bash
# One-shot TPU re-validation runner (VERDICT r2 items #2 and #6).
#
# Run when the axon TPU tunnel is UP.  Probes the tunnel first and refuses
# to start if it is down (a dead tunnel makes jax backend init block
# indefinitely — see docs/performance.md and bench.py's probe).  Each stage
# is individually `timeout`-bounded so a mid-run tunnel flap cannot hang the
# whole sweep; stages log to $OUT/<stage>.log and the sweep keeps going on
# per-stage failure so one flaky stage doesn't zero the rest.
#
# Usage:  bash tools/tpu_revalidate.sh [outdir]     (default /tmp/tpu_reval)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_reval}"
mkdir -p "$OUT"

echo "== tunnel probe"
if ! timeout 120 python -c "import jax; print(jax.devices())"; then
    echo "TPU tunnel DOWN — aborting (re-run when it is back)." >&2
    exit 2
fi

run_stage() {  # name  timeout_s  cmd...
    local name="$1" tmo="$2"; shift 2
    echo "== $name (timeout ${tmo}s)"
    if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
        echo "   OK  — tail:"; tail -n 4 "$OUT/$name.log" | sed 's/^/   /'
    else
        echo "   FAILED (rc=$?) — tail:"; tail -n 8 "$OUT/$name.log" | sed 's/^/   /'
    fi
}

# 1. Headline benchmark (full 10k MC, self-tunes unroll, writes
#    PALLAS_VALIDATION.json as a side effect).
run_stage bench 2700 python bench.py

# 2. Study refreshes whose RESULTS.md wall-clocks are CPU-era (r2/r3 runs
#    with the tunnel down).  Scores are hardware-independent; what these
#    re-measure is the per-filter TPU wall-clock quoted in RESULTS.md.
run_stage icinco_ungm   2700 python experiments/icinco_ungm.py
run_stage tpq_cv        3600 python experiments/tpq_constant_velocity.py
run_stage tpq_ungm      3600 python experiments/tpq_ungm.py
run_stage gpqd_demo     1800 python experiments/gpqd_demo.py
run_stage marginal_ungm 2700 python experiments/marginal_ungm.py

# 3. Square-root / time-parallel / serving micro-benches
#    (docs/performance.md tables).
run_stage bench_sqrt    1800 python tools/bench_sqrt.py
run_stage bench_iplf    1800 python tools/bench_iplf.py
run_stage bench_serving 1800 python tools/bench_serving.py

echo "== done; logs in $OUT — fold the numbers into experiments/RESULTS.md"
echo "   and docs/performance.md, then commit."
