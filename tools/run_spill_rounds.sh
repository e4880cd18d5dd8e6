#!/bin/bash
# Round ritual driver for the three-ladder spill census: sf5@8g, sf10@8g,
# sf10@4g over the containment/warehouse heavyweights plus the round's
# new join-bearing operators, merged into SPILL_CENSUS.json.
# Usage: run_spill_rounds.sh  (expects /tmp/sf5, /tmp/sf10 fixtures and
# SPILL_CLASSES or a compiled target/scala-2.13/classes)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
QUERIES=(d11_lsh_neardup d23_dedup_clusters d35_span_dedup
  d40b_containment_kmv d42_incremental_containment
  d44_cross_source_containment q01_sales_overview q09_supplier_scorecard
  q18_dedup_map d45_syndication_ingest a09_knn_join d46_inverted_index
  a10_ann_incremental q51_copurchase_rank q52_scd2_history
  q53_small_qty_revenue q52b_scd2_merge q52c_scd2_lake a12_mmr_rerank)
HEAP=8g tools/spill_census.sh /tmp/sf5 /tmp/spill_sf5_8g.json "${QUERIES[@]}" \
  > /tmp/spill_sf5_8g.log 2>&1 || exit 1
HEAP=8g tools/spill_census.sh /tmp/sf10 /tmp/spill_sf10_8g.json "${QUERIES[@]}" \
  > /tmp/spill_sf10_8g.log 2>&1 || exit 1
HEAP=4g tools/spill_census.sh /tmp/sf10 /tmp/spill_sf10_4g.json "${QUERIES[@]}" \
  > /tmp/spill_sf10_4g.log 2>&1 || exit 1
python3 - <<'EOF'
import json
runs = [json.load(open(p)) for p in
        ("/tmp/spill_sf5_8g.json", "/tmp/spill_sf10_8g.json",
         "/tmp/spill_sf10_4g.json")]
with open("SPILL_CENSUS.json", "w") as f:
    f.write(json.dumps({"metric": "spill_census", "runs": runs}) + "\n")
print("merged", sum(len(r["queries"]) for r in runs), "query rows")
EOF
