#!/bin/sh
# Build the --py-files artifact for spark-submit deployment.
# Produces /tmp/tweetf0rm_spark.zip containing the package at zip root
# (import tweetf0rm_spark works on driver and executors).
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-/tmp/tweetf0rm_spark.zip}"
rm -f "$OUT"
cd "$REPO"
python -c "
import zipfile, pathlib
out = zipfile.ZipFile('$OUT', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('tweetf0rm_spark').rglob('*.py')):
    out.write(p, str(p))
out.close()
print('wrote $OUT')
"
