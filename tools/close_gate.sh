#!/usr/bin/env bash
# Round-close gate — ONE documented entry point that emits every close
# artifact the round's adjudication reads (VERDICT r13 item 8: the dual-SF
# oracle gate and the 4 GiB pressure rerun used to be separate hand-run
# steps; now one command produces all records side by side).
#
#   bash tools/close_gate.sh [outdir]        (default /tmp/close_gate)
#
# Emits under <outdir>:
#   gate_sf0.01.txt    oracle_check over EVERY registered query at sf0.01
#   gate_sf0.1.txt     same at sf0.1 (the dual-SF correctness gate)
#   pressure.txt       the scale-rehearsal subset re-run at a 4 GiB heap
#                      (SPARK_DRIVER_MEM=4g) — the memory-pressure record
#                      SCALE.md's per-round pressure sections quote
#   BENCH_FULL.json    full per-query bench record at sf0.1 (also the
#                      repo-root copy Bench writes by default), with the
#                      environment sentinel stamped in
#
# Exit status: nonzero if any oracle row fails; pressure/bench failures
# surface in their logs (a degraded-host bench is evidence, not a gate
# failure — the sentinel fields adjudicate it).
set -u
out="${1:-/tmp/close_gate}"
mkdir -p "$out"
cd "$(dirname "$0")/.."

fail=0
for sf in 0.01 0.1; do
  echo "== verify + oracle @ sf$sf"
  # fresh outdir + checked exit status: a stale parquet from a previous
  # run (Verify swallows per-query Throwables) or a mid-run JVM crash
  # must surface as missing output / a red gate, never as a green compare
  # against last round's results
  rm -rf "/tmp/close_verify_$sf"
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf /tmp/close_verify_$sf" >"$out/verify_sf$sf.log" 2>&1 \
    || fail=1
  python3 tools/oracle_check.py "/tmp/close_verify_$sf" "/root/testdata/sf$sf" >"$out/gate_sf$sf.txt" 2>&1 \
    || fail=1
  tail -1 "$out/gate_sf$sf.txt"
  grep -c '^ok' "$out/gate_sf$sf.txt" || true
done

echo "== pressure rerun (4 GiB heap, round14 rehearsal subset)"
SPARK_DRIVER_MEM=4g sbt -batch 'runMain graft.ScaleRehearsal round14' 2>&1 \
  | grep -E '\[round14\]|\[rehearsal\]|OutOfMemory' >"$out/pressure.txt" || true
cat "$out/pressure.txt"

# Full 10^6-hash row at the 4 GiB / 8-core executor geometry (round 18).
# Why 8 cores: the production claim this row models is "10^9 hashes /
# 1000 executors = 10^6 per 4 GiB executor", and a real 4 GiB executor
# carries 4-8 cores (512 MiB/core). local[32] at 4 GiB is 128 MiB/core —
# a 4x harsher shape than any deployment, and measured FLAKY there (2 of
# 3 runs pass after the round-18 walk_partitions + single-expansion
# fixes; the third dies in the verify pass's concurrent sort state). At
# the honest geometry the row is deterministic-clean: walk 105 s, n17
# exact 94 s, n21 capped 135 s, zero OOM. An OOM line here is a real
# regression, not boundary noise.
echo "== pressure rerun (4 GiB heap, 8 cores, round15 band-walk @ 10^6 near-unique hashes)"
SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM=4g sbt -batch 'runMain graft.ScaleRehearsal bandwalk 1000000' 2>&1 \
  | grep -E '\[round15\]|OutOfMemory' >"$out/pressure_bandwalk.txt" || true
cat "$out/pressure_bandwalk.txt"

# Bench with the SENTINEL GATE (VERDICT r17 item 1): Bench itself now
# backs off pre-run when its probes are out of the quiet band and stamps
# `degraded_host` when either the pre- or post-run probe stayed loaded.
# Here we ACT on that flag: a degraded record is retried (whole-bench,
# with a cool-down) up to 2 more times; the FIRST non-degraded record
# ships. If every attempt is degraded, the last record ships carrying its
# own degraded_host=true self-flag — evidence, honestly labeled, never a
# silently-inflated scoreboard number (the r17 325-vs-130 split).
echo "== bench @ sf0.1 (sentinel-gated, up to 3 attempts)"
# a stale record from a previous close run must never satisfy the probe
# when this run's bench crashes before writing (the verify section's
# rm -rf discipline applied here)
rm -f "$out/BENCH_FULL.json"
for attempt in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT="$out/BENCH_FULL.json" \
    sbt -batch 'runMain graft.Bench' >"$out/bench_attempt$attempt.log" 2>&1 || true
  cp "$out/bench_attempt$attempt.log" "$out/bench.log"
  degraded=$(python3 -c "
import json,sys
try: print(str(json.load(open('$out/BENCH_FULL.json')).get('degraded_host', True)).lower())
except Exception: print('true')")
  echo "bench attempt $attempt: degraded_host=$degraded"
  [ "$degraded" = "false" ] && break
  [ "$attempt" -lt 3 ] && { echo "degraded record — cooling down 120s before retry"; sleep 120; }
done
tail -c 2000 "$out/bench.log" | tail -2

# The bench digest as the LITERAL last stdout line (VERDICT r18 item 5):
# the driver parses the last line of its bench invocation; build.sbt now
# passes forked stdout through un-prefixed and suppresses the [success]
# epilogue, and this close path echoes the shipped record's headline so a
# consumer of close_gate output gets the same contract.
python3 - "$out/BENCH_FULL.json" <<'PYEOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    d.pop("queries", None); d.pop("layouts", None)
    print(json.dumps(d, separators=(",", ":")))
except Exception as e:
    print(json.dumps({"error": str(e)}))
PYEOF

exit $fail
