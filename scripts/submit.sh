#!/usr/bin/env bash
# Package dug_spark and run the pipeline via spark-submit --py-files —
# the BASELINE north_rule's deployment shape.  MASTER defaults to a local
# stand-in; on a real cluster pass MASTER=yarn / k8s://... and executor
# sizing flags through SPARK_SUBMIT_ARGS.
#
#   scripts/submit.sh --input /root/testdata/sf0.001 --output /tmp/kg_out
#   MASTER='local[8]' scripts/submit.sh ...
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${MASTER:-local[8]}"
ZIP="$(mktemp -d)/dug_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" dug_spark -x '*__pycache__*')
exec "$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')" \
  --master "$MASTER" \
  --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-32}" \
  ${SPARK_SUBMIT_ARGS:-} \
  --py-files "$ZIP" \
  "$REPO/jobs/run_pipeline.py" "$@"
