#!/bin/bash
# Calm-window bench trigger: probe the co-tenancy weather every ~5 min and
# fire ONE full bench run the moment two consecutive probes clear the calm
# floor (membw >= 0.58, alu in [0.85, 1.15]) — the repo's weather protocol
# (BENCH.md "Run-to-run variance"). Exits after the bench run, or after
# MAX_PROBES probes without a calm window.
set -u
cd "$(dirname "$0")/.."
MAX_PROBES=${CALM_MAX_PROBES:-36}
streak=0
for i in $(seq 1 "$MAX_PROBES"); do
  read -r alu membw < <(python3 -c "
import bench
hw = bench._hardware_scaling(1, 4, secs=2.0)
print(hw['alu'], hw['membw'])")
  echo "probe $i: alu=$alu membw=$membw streak=$streak"
  ok=$(python3 -c "print(1 if ($membw>=0.58 and 0.85<=$alu<=1.15) else 0)")
  if [ "$ok" = "1" ]; then
    streak=$((streak+1))
  else
    streak=0
  fi
  if [ "$streak" -ge 2 ]; then
    echo "calm window confirmed — launching bench"
    python3 bench.py
    exit $?
  fi
  sleep 240
done
echo "no calm window in $MAX_PROBES probes"
exit 3
