#!/bin/bash
# Serialized, wedge-hardened TPU job launcher.
#
# The tunneled device's compile service intermittently hangs an RPC forever
# (the client parks on a futex and never returns; ~50% incidence on big
# programs). Healthy compiles of the full scan pipeline finish in ~4-6 min,
# so the mitigation is a per-attempt timeout + retry with cooldown.
#
# Usage: tools/tpu_run.sh <attempt-timeout-seconds> <command...>

set -u
TMO=$1; shift

for attempt in 1 2 3; do
    # wait until no other python process is using the device
    for i in $(seq 1 90); do
        n=$(ps axo pid,cmd | awk '$2 ~ /python[0-9.]*$/' | grep -v grep \
            | grep -c -e bench.py -e sweep_geometry -e profile_stages \
                      -e fast_limo_tpu.cli || true)
        [ "$n" -eq 0 ] && break
        sleep 10
    done
    sleep 30

    timeout --kill-after=30 "$TMO" "$@"
    rc=$?
    [ $rc -eq 0 ] && exit 0
    echo "tpu_run: attempt $attempt exited rc=$rc, retrying after cooldown" >&2
    sleep 75
done
exit 1
