#!/usr/bin/env bash
# Widen the 100x correctness envelope from 13 invariant rows to the full
# DuckDB-oracle hash gate for every family whose oracle fits a time
# budget (VERDICT r14 #6). The relational / pixel / event / geo / meta /
# quality / stats / media families and the per-doc text queries are
# LINEAR oracles — DuckDB runs them at sf10 in seconds-to-minutes. The
# textdup-chain (t06-t08, t11-t13, t17, t19), the n-gram explodes
# (t14, t15) and the v-family k-means/rerank chains stay invariant-only
# at this point (CORRECTNESS_SCALE100.txt's 13 rows): their oracles are
# pair- or gram-quadratic in DuckDB — this script MEASURES one excluded
# representative (t06) and records the cost so the exclusion is
# accounted, not assumed.
#
# Usage: devtools/scale100oracle.sh [corpus_dir] [work_dir]
#   corpus_dir  default /tmp/graft-sf10/sf10 (sf10probe.sh's corpus —
#               run that first; this script reuses it)
#   work_dir    default /tmp/graft-sf10oracle
# Output: oracle rows appended to CORRECTNESS_SCALE100.txt.
set -euo pipefail
cd "$(dirname "$0")/.."

CORPUS="${1:-/tmp/graft-sf10/sf10}"
WORK="${2:-/tmp/graft-sf10oracle}"
OUT="$WORK/verify_out"
[ -f "$CORPUS/documents.parquet" ] || {
  echo "no corpus at $CORPUS — run devtools/sf10probe.sh first"; exit 1; }
mkdir -p "$WORK"
rm -rf "$OUT"

ADDOPENS="-XX:ReservedCodeCacheSize=512m --add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

# linear-oracle families: everything except the textdup chain, the
# n-gram explodes and the v-family model chains
QUERIES=$(python3 - <<'EOF'
skip_prefix = ('v',)
skip = {'t06_dedup_minhash','t07_dedup_simhash','t08_ngram_jaccard',
        't11_dedup_components','t12_bucket_audit','t13_component_audit',
        't14_decontaminate','t15_sequence_pack','t17_curation_funnel',
        't19_curated_docs'}
import glob, json
# the newest round's correctness artifact is the declared-query universe;
# round-15 additions not yet in any artifact are unioned in explicitly
latest = sorted(glob.glob('CORRECTNESS_r*.json'))[-1]
names = sorted(set(json.load(open(latest))) |
               {'t22_chunk_windows', 't23_doc_keywords',
                't24_mixture_rebalance', 't25_chunk_pack',
                't26_quota_sample'})
print(' '.join(n for n in names
               if n not in skip and not n.startswith(skip_prefix)))
EOF
)
echo "== Verify at 100x ($(echo $QUERIES | wc -w) linear-oracle queries)"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" java $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx96g -cp "$CP" graft.Verify "$CORPUS" "$OUT" $QUERIES \
  2>"$WORK/verify.log"

echo "== DuckDB oracle cross-check at 100x"
{ echo "== 100x oracle rows ($(date -u +%F)): linear-oracle families at the sf10 corpus"
  python3 devtools/check.py "$CORPUS" "$OUT" $QUERIES
} | tee -a CORRECTNESS_SCALE100.txt

# price ONE excluded oracle so the t/v exclusion is a measured budget
# decision: t06's DuckDB side (banding self-join + Jaccard verify)
echo "== pricing the excluded t06 oracle (timeout 1800s)"
T0=$(date +%s)
if timeout 1800 python3 - "$CORPUS" "$OUT" <<'EOF' 2>"$WORK/t06_oracle.log"
import sys, json, duckdb
sf, out = sys.argv[1], sys.argv[2]
sql = json.load(open(f'{out}/oracle_sql.json'))['t06_dedup_minhash']
con = duckdb.connect()
for t in ['documents']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
print(len(con.execute(sql).fetchall()), "rows")
EOF
then
  echo "   t06 oracle completed in $(( $(date +%s) - T0 )) s" | tee -a CORRECTNESS_SCALE100.txt
else
  echo "   t06 oracle DNF in $(( $(date +%s) - T0 )) s (killed at 1800 s)" | tee -a CORRECTNESS_SCALE100.txt
fi
