#!/bin/bash
# Usage: record_tpu_run.sh <name> <cmd...>
# Runs <cmd>, captures the last JSON line of stdout, and writes
# docs/tpu_runs/<name>.json with git SHA + timestamp + rc (VERDICT r2 #3:
# every on-hardware result persists in-repo).
name=$1; shift
repo=$(cd "$(dirname "$0")/.." && pwd)
out=$("$@" 2>/tmp/record_${name}.err)
rc=$?
line=$(echo "$out" | grep '^{' | tail -1)
python - "$repo/docs/tpu_runs/${name}.json" "$rc" "$line" <<PY
import json, subprocess, sys, datetime
path, rc, line = sys.argv[1], int(sys.argv[2]), sys.argv[3]
sha = subprocess.run(["git", "-C", "$repo", "rev-parse", "--short", "HEAD"],
                     capture_output=True, text=True).stdout.strip()
try:
    parsed = json.loads(line) if line else None
except Exception:
    parsed = None
rec = {"git_sha": sha,
       "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
           timespec="seconds"),
       "cmd": " ".join(sys.argv[4:]) or "$*",
       "rc": rc, "result": parsed}
json.dump(rec, open(path, "w"), indent=1)
print(path, "rc=", rc)
PY
exit $rc
