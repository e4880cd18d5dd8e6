#!/bin/bash
# Memory-per-core ladder driver for graft.SpillBench (r11 verdict #5).
# One (query, rung) attempt per fresh JVM: a hard OOM kills only that
# attempt, and no attempt inherits another's heap/JIT/page-cache state.
# Usage: spill_census.sh SF_DIR OUT_JSON QUERY [QUERY...]
# Env: LADDER (default "32,16,8"), HEAP (default 8g), ATTEMPT_TIMEOUT
# (default 3600 s per attempt).
set -u
SF_DIR="$1"; OUT="$2"; shift 2
QUERIES=("$@")
LADDER="${LADDER:-32,16,8}"
HEAP="${HEAP:-8g}"
ATTEMPT_TIMEOUT="${ATTEMPT_TIMEOUT:-3600}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$REPO/target/scala-2.13/classes"
[ -d "$CLASSES" ] || { echo "compile first: sbt compile" >&2; exit 1; }
ROWS="$(mktemp /tmp/spill_rows.XXXXXX.jsonl)"
OOMS="$(mktemp /tmp/spill_ooms.XXXXXX.jsonl)"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

pending=("${QUERIES[@]}")
IFS=',' read -ra RUNGS <<< "$LADDER"
for cpus in "${RUNGS[@]}"; do
  [ "${#pending[@]}" -eq 0 ] && break
  next=()
  for q in "${pending[@]}"; do
    n_before=$(wc -l < "$ROWS")
    echo "[spill-census] $q at local[$cpus] on $SF_DIR ..." >&2
    SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_QUERY="$q" \
    SPARK_GRAFT_CPUS="$cpus" SPARK_GRAFT_SPILL_OUT="$ROWS" \
    timeout "$ATTEMPT_TIMEOUT" \
      java -Xmx"$HEAP" $ADD_OPENS \
        -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
        -cp "$CLASSES:/opt/spark/jars/*" graft.SpillBench \
        > /tmp/spill_attempt.log 2>&1
    rc=$?
    n_after=$(wc -l < "$ROWS")
    if [ "$rc" -eq 0 ] && [ "$n_after" -gt "$n_before" ]; then
      echo "[spill-census]   ok: $(tail -1 "$ROWS")" >&2
    else
      # heap/cpus in MB; mirrors SpillBench's mem_per_core_mb
      heap_mb=$(( $(echo "$HEAP" | sed 's/g/*1024/;s/m//' | bc) ))
      echo "{\"query\":\"$q\",\"oom_at_mb\":$(( heap_mb / cpus ))}" >> "$OOMS"
      echo "[spill-census]   FAILED (rc=$rc) at $(( heap_mb / cpus )) MB/core — will retry one rung down" >&2
      tail -3 /tmp/spill_attempt.log >&2
      next+=("$q")
    fi
  done
  pending=("${next[@]:-}")
  [ -n "${pending[0]:-}" ] || pending=()
done

python3 - "$SF_DIR" "$OUT" "$ROWS" "$OOMS" "$HEAP" "$LADDER" <<'EOF'
import json, sys
sf, out, rows_f, ooms_f, heap, ladder = sys.argv[1:7]
rows = [json.loads(l) for l in open(rows_f) if l.strip()]
ooms = [json.loads(l) for l in open(ooms_f) if l.strip()]
queries = {}
for r in rows:
    q = r.pop("query")
    r["oom_at_mb"] = [o["oom_at_mb"] for o in ooms if o["query"] == q]
    queries[q] = r
survived = set(queries)
for o in ooms:
    if o["query"] not in survived:
        e = queries.setdefault(o["query"], {"failed": True, "oom_at_mb": []})
        e["oom_at_mb"].append(o["oom_at_mb"])
doc = {"metric": "spill_census", "sf": sf, "heap": heap,
       "shuffle_partitions": 32, "cpu_ladder": [int(x) for x in ladder.split(",")],
       "queries": queries}
with open(out, "w") as f:
    f.write(json.dumps(doc) + "\n")
print(json.dumps(doc))
EOF
