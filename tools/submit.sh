#!/usr/bin/env bash
# spark-submit --py-files launcher (BASELINE.json north_rule: "run via
# spark-submit --py-files on a multi-executor cluster").
#
# Usage: tools/submit.sh [--master spark://host:7077] -- <cli args...>
# Local default: --master local[$SPARK_GRAFT_CPUS:-32]
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="local[${SPARK_GRAFT_CPUS:-32}]"
if [[ "${1:-}" == "--master" ]]; then MASTER="$2"; shift 2; fi
[[ "${1:-}" == "--" ]] && shift

ZIP=/tmp/pagerank_project_spark.zip
rm -f "$ZIP"
python -c "
import zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, fns in os.walk('pagerank_project_spark'):
        if '__pycache__' in root: continue
        for fn in fns:
            if fn.endswith('.py'):
                p = os.path.join(root, fn)
                z.write(p, p)
"

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  tools/run_cli.py "$@"
