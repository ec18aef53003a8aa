#!/usr/bin/env bash
# Build the spark-submit --py-files artifact.
#   ./scripts/package.sh  ->  dist/logpipe.zip
# Run on a cluster (logpipe/cli.py is the driver script; the zip makes
# the package importable on executors):
#   spark-submit --py-files dist/logpipe.zip \
#     --conf spark.sql.adaptive.enabled=true \
#     logpipe/cli.py --transcripts ... --out ... --manifest ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/logpipe.zip
python - <<'EOF'
import zipfile, pathlib
z = zipfile.ZipFile("dist/logpipe.zip", "w", zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path("logpipe").rglob("*.py")):
    z.write(p, p.as_posix())
z.close()
print("wrote dist/logpipe.zip")
EOF
