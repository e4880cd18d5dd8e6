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
# SPILL_CLASSES pins the compiled-classes dir (e.g. a snapshot copy) so a
# long census run is immune to concurrent sbt recompiles of the live tree.
CLASSES="${SPILL_CLASSES:-$REPO/target/scala-2.13/classes}"
[ -d "$CLASSES" ] || { echo "compile first: sbt compile" >&2; exit 1; }
ROWS="$(mktemp /tmp/spill_rows.XXXXXX.jsonl)"
OOMS="$(mktemp /tmp/spill_ooms.XXXXXX.jsonl)"

# validate + parse HEAP up front, loudly (advice r12: a silent bc failure
# published oom_at_mb=0); accept e.g. 8g/8G/512m/512M. Anchored regex
# (advice r13): the old case patterns (*[0-9]g) accepted '1.5g'/'x8g',
# which then died mid-ladder under set -u instead of here.
HEAP_NORM="$(echo "$HEAP" | tr '[:upper:]' '[:lower:]')"
[[ "$HEAP_NORM" =~ ^[0-9]+[gm]$ ]] \
  || { echo "HEAP must match ^[0-9]+[gmGM]$ (got: $HEAP)" >&2; exit 1; }
if [ "${HEAP_NORM: -1}" = g ]; then
  heap_mb=$(( ${HEAP_NORM%g} * 1024 ))
else
  heap_mb=$(( ${HEAP_NORM%m} ))
fi

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
      # classify the death (advice r12): only a genuine OOM may be
      # published as a memory-per-core floor. rc=124 is the ladder
      # timeout, and any other non-OOM failure (bad query name, missing
      # fixture) is recorded under failed_at_mb with its rc so a
      # persistent non-OOM failure can't masquerade as an OOM rung.
      mbc=$(( heap_mb / cpus ))
      # rc=134 (SIGABRT) counts as OOM only when the attempt log carries a
      # memory message (advice r13): a native assertion abort at a rung
      # must not publish a memory floor. rc=137 (SIGKILL) stays
      # unconditional — the kernel OOM-killer leaves no JVM log line.
      oom_msg=0
      grep -q "OutOfMemoryError\|java.lang.OutOfMemory\|Java heap space\|Direct buffer memory\|GC overhead limit\|Native memory allocation\|insufficient memory" /tmp/spill_attempt.log \
        && oom_msg=1
      if [ "$oom_msg" -eq 1 ] || [ "$rc" -eq 137 ]; then
        echo "{\"query\":\"$q\",\"oom_at_mb\":$mbc}" >> "$OOMS"
        echo "[spill-census]   OOM (rc=$rc) at $mbc MB/core — will retry one rung down" >&2
      else
        kind="error"; [ "$rc" -eq 124 ] && kind="timeout"
        echo "{\"query\":\"$q\",\"failed_at_mb\":$mbc,\"rc\":$rc,\"kind\":\"$kind\"}" >> "$OOMS"
        echo "[spill-census]   FAILED non-OOM (rc=$rc, $kind) at $mbc MB/core — will retry one rung down" >&2
      fi
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
deaths = [json.loads(l) for l in open(ooms_f) if l.strip()]
queries = {}
for r in rows:
    q = r.pop("query")
    r["oom_at_mb"] = [d["oom_at_mb"] for d in deaths
                      if d["query"] == q and "oom_at_mb" in d]
    fails = [d for d in deaths if d["query"] == q and "failed_at_mb" in d]
    if fails:  # non-OOM deaths kept separate from the memory floor
        r["failed_at_mb"] = [{"mb": d["failed_at_mb"], "rc": d["rc"],
                              "kind": d["kind"]} for d in fails]
    queries[q] = r
survived = set(queries)
for d in deaths:
    if d["query"] not in survived:
        e = queries.setdefault(d["query"], {"failed": True, "oom_at_mb": []})
        if "oom_at_mb" in d:
            e["oom_at_mb"].append(d["oom_at_mb"])
        else:
            e.setdefault("failed_at_mb", []).append(
                {"mb": d["failed_at_mb"], "rc": d["rc"], "kind": d["kind"]})
doc = {"metric": "spill_census", "sf": sf, "heap": heap,
       "shuffle_partitions": 32, "cpu_ladder": [int(x) for x in ladder.split(",")],
       "queries": queries}
with open(out, "w") as f:
    f.write(json.dumps(doc) + "\n")
print(json.dumps(doc))
EOF
