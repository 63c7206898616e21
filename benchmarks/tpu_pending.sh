#!/bin/bash
# TPU measurements pending from round 4 (blocked by the 11+ h tunnel
# outage, docs/perf_notes.md "Round 4 operations note"). Run each block
# ALONE (one process per TPU; one host core) with output redirected to a
# file — never into a session-owned pipe. Check the tunnel first:
#
#   timeout 150 python -c "import jax; print(jax.devices())" || exit 1
#
# 1. On-device parity suite (includes the two round-4 transport tests
#    that have only run CPU-side so far); ~1-2 min + compiles:
#      MOLAR_TPU_DEVICE_TESTS=1 timeout 3600 python -m pytest \
#        tests/test_tpu_parity.py -q > /tmp/parity_tpu.log 2>&1
#
# 2. Workload table with auto-windows (expect ca/com/contacts to roughly
#    double vs the round-4 w16 numbers 387/337/251 — they were
#    dispatch-bound; sasa/membrane rows unchanged). New window shapes
#    compile (~3-15 min each):
#      nohup python benchmarks/workloads.py > /tmp/wl_auto.log 2>&1 &
#    Then update the docs/perf_notes.md round-4 workload table + CHANGELOG.
#
# 3. 1M window re-tune legs (w8 measured: best 6.60 e2e / 12.72 compute /
#    native 8.71, reps 2.91/3.99/6.60). A/B/A with w2 (6 MB puts) and w4:
#      nohup python bench.py --atoms 1000000 --protein 20000 --frames 32 \
#        --box 21.544 --window 2 --repeats 3 --rep-gap 8 > /tmp/m1_w2.log 2>&1 &
#      # then --window 4, then --window 8 again as the control
#    Record the winner as a size-dependent default in bench.py (the w16
#    cliff lesson says smaller puts win; verify at 1M scale).
#
# 4. Fresh headline capture (defaults are already w16/delta/10 spaced
#    repeats):
#      nohup python bench.py > /tmp/bench_headline.log 2>&1 &
echo "This file is a checklist, not an executable pipeline; run blocks by hand." >&2
exit 1
