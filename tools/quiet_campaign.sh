#!/bin/bash
# Autonomous quiet-window bench campaign (r16; verdict #2/#8): turns sf1
# anchor maintenance from babysitting into one command. Loops attempts of
# the full suite from a scratch cwd with the preflight abort guard armed:
#   - guard-aborted attempt (exit 2, ~4 min: storm caught at warmup)
#       -> sleep a wave out, retry; nothing written anywhere.
#   - finished attempt -> its new history line is appended to the repo's
#       BENCH_HISTORY.jsonl REGARDLESS of flags (flagged lines are
#       auto-excluded from medians; the record must hold every run).
#   - QUIET attempt (contended:false AND steal_run+foreign_run under
#       ANCHOR_MAX_CONTENTION — the stamp can under-detect a storm the
#       sentinels dodge, so the anchor gate reads the affirmative
#       run-level counters too) -> BENCH_FULL.json installed as the
#       anchor file; campaign ends after TARGET quiet runs.
# The repo tree is never the bench cwd, so the committed anchor is never
# at risk mid-run. Do NOT run sbt compile while a campaign is active
# (jrun.sh reads target/scala-2.13/classes live).
#
# Usage: tools/quiet_campaign.sh <SF_DIR> <ANCHOR_FILE> [TARGET=3] [MAX_ATTEMPTS=12] [CAP=10000]
# Env:   SPARK_DRIVER_MEM (default 8g), ABORT_SLEEP (180s), FLAGGED_SLEEP (120s),
#        ANCHOR_MAX_CONTENTION (default 20000 jiffies across the run window)
set -u
REPO=/root/repo
HISTORY="$REPO/BENCH_HISTORY.jsonl"
LOCK="$REPO/.bench_history.lock"
SF_DIR=$1; ANCHOR=$2; TARGET=${3:-3}; MAX=${4:-12}; CAP=${5:-10000}
# Resolve ANCHOR: relative paths land in the repo; absolute paths are honored.
case "$ANCHOR" in /*) ANCHOR_PATH=$ANCHOR ;; *) ANCHOR_PATH=$REPO/$ANCHOR ;; esac
ANCHOR_MAX_CONTENTION=${ANCHOR_MAX_CONTENTION:-20000}
quiet=0
for a in $(seq 1 "$MAX"); do
  scratch=$(mktemp -d /tmp/bench_campaign.XXXXXX)
  cp "$HISTORY" "$scratch/"                    # gives the audits their medians
  base_lines=$(wc -l <"$scratch/BENCH_HISTORY.jsonl")  # count at ATTEMPT START:
  # tailing relative to the repo file's CURRENT length would pick wrong lines
  # if another campaign/bench appended to it while this attempt ran.
  echo "[campaign] $(date -u +%H:%M:%SZ) attempt $a/$MAX (quiet $quiet/$TARGET) scratch=$scratch"
  (cd "$scratch" && SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
    SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-8g}" \
    SPARK_GRAFT_MAX_PREFLIGHT_CONTENTION="$CAP" \
    "$REPO/tools/jrun.sh" graft.Bench >bench.out 2>&1)
  rc=$?
  line=$(grep -oE '\{"metric".*' "$scratch/bench.out" | tail -1)
  if [ $rc -eq 2 ]; then
    echo "[campaign] attempt $a guard-aborted: $line"
    rm -rf "$scratch"
    sleep "${ABORT_SLEEP:-180}"      # storms come in waves - wait one out
    continue
  fi
  if [ $rc -ne 0 ] || [ ! -s "$scratch/BENCH_FULL.json" ]; then
    echo "[campaign] attempt $a FAILED rc=$rc: $line"
    tail -5 "$scratch/bench.out"
    rm -rf "$scratch"; sleep 60; continue
  fi
  new=$(($(wc -l <"$scratch/BENCH_HISTORY.jsonl") - base_lines))
  # flock serializes concurrent campaigns' appends (verdict r16 #6);
  # the subshell holds fd 9 on the lockfile only for the append itself.
  [ "$new" -gt 0 ] && (
    flock -w 30 9 || { echo "[campaign] WARN: history lock timeout; append skipped" >&2; exit 1; }
    tail -n "$new" "$scratch/BENCH_HISTORY.jsonl" >>"$HISTORY"
  ) 9>"$LOCK"
  contention=0
  for j in $(echo "$line" | grep -oE '"(steal|foreign)_run":[0-9]+' | grep -oE '[0-9]+'); do
    contention=$((contention + j))
  done
  if echo "$line" | grep -q '"contended":false' \
      && [ "$contention" -lt "$ANCHOR_MAX_CONTENTION" ]; then
    quiet=$((quiet + 1))
    cp "$scratch/BENCH_FULL.json" "$ANCHOR_PATH"
    echo "[campaign] attempt $a QUIET ($quiet/$TARGET, contention=$contention): $line"
  else
    echo "[campaign] attempt $a flagged (contention=$contention): $line"
    sleep "${FLAGGED_SLEEP:-120}"
  fi
  rm -rf "$scratch"
  if [ "$quiet" -ge "$TARGET" ]; then
    echo "[campaign] done: $quiet quiet runs landed; anchor=$ANCHOR"
    exit 0
  fi
done
echo "[campaign] exhausted $MAX attempts with $quiet/$TARGET quiet runs"
exit 1
